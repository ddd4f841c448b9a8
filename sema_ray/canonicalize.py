"""Entity canonicalization: normalization, MinHash/LSH blocking, union-find.

North-star stage (BASELINE.json): canonicalization runs as a groupby-aggregate
over surface-form clusters — MinHash/LSH blocking + cosine/Jaccard merge into
a union-find canonical-entity table. The *candidate-pair* generation is fully
distributed (signatures per batch -> explode to band rows -> groupby(band));
only the union-find reduction runs on a single reducer, over the pair list,
which LSH blocking keeps ≪ the number of rows (SURVEY §2 "Aggregations").

The exact-surface-form fast path mirrors the reference's exact text lookup
idea (``/root/reference/src/storage/text_indexer.rs`` used for exact match;
here: equality on the normalized key always merges).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .embed import HashEmbedder, cosine_matrix
from .hashing import stable_id64

NUM_PERMS = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERMS // BANDS
_MERSENNE = (1 << 61) - 1

_SUFFIXES = frozenset(
    "corp corporation inc incorporated ltd limited llc gmbh co company labs "
    "systems group holdings".split()
)
_NON_ALNUM = re.compile(r"[^a-z0-9]+")

# Fixed universal-hash parameters for the minhash permutations (seeded once,
# identical everywhere — determinism under repartitioning).
_rng = np.random.default_rng(0xC0FFEE)
_A = _rng.integers(1, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)


def normalize_surface(surface: str) -> str:
    """Casing/punctuation/corporate-suffix-insensitive key.

    "ACME corp." / "Acme Corp" / "Acme Corporation" -> "acme".
    """
    toks = [t for t in _NON_ALNUM.split(surface.lower()) if t]
    while len(toks) > 1 and toks[-1] in _SUFFIXES:
        toks.pop()
    return " ".join(toks)


# memoized per process: char-shingle -> uint64 (the vocabulary of 3-char
# shingles is tiny, so blake2b runs once per distinct shingle ever seen —
# this path is driver-serial in canonical_entities, so it is on the
# pipeline's serial fraction)
_shingle_cache: dict[str, int] = {}
# the 3-char-shingle vocabulary is bounded (~alphabet³) in practice, but cap
# anyway so a pathological unicode vocabulary can't grow a long-lived worker
# without limit (same guard as dedup._tok_cache / textops._md5_cache)
_SHINGLE_CACHE_MAX = 4_000_000


def char_shingle_hashes(key: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-char shingles of ``key`` (padded)."""
    s = f"^{key}$"
    if len(s) < k:
        s = s.ljust(k, "$")
    shingles = {s[i : i + k] for i in range(len(s) - k + 1)}
    cache = _shingle_cache
    if len(cache) > _SHINGLE_CACHE_MAX:
        cache.clear()
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, sh in enumerate(sorted(shingles)):
        v = cache.get(sh)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(sh.encode("utf-8"), digest_size=8).digest(),
                "big")
            cache[sh] = v
        out[i] = v
    return out


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """NUM_PERMS-wide minhash signature via universal hashing (vectorized)."""
    x = (shingle_hashes % _MERSENNE)[:, None]  # [n_shingles, 1]
    hashed = (x * _A[None, :] + _B[None, :]) % _MERSENNE
    return hashed.min(axis=0).astype(np.uint64)


def band_hashes(sig: np.ndarray) -> list[int]:
    """One uint64 bucket hash per LSH band."""
    out = []
    for b in range(BANDS):
        seg = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        d = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
        out.append(int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF)
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class UnionFind:
    """Path-compressing union-find over hashable keys (single-reducer state).

    Used only on the candidate-pair list, which LSH keeps small relative to
    the corpus (SURVEY §7 hard part (b)).
    """

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            p = self.parent[x] = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # Deterministic orientation: smaller key becomes the root.
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def groups(self) -> dict:
        out: dict = {}
        for k in list(self.parent):
            out.setdefault(self.find(k), []).append(k)
        return out


def local_lsh_pairs(norm_keys: list[str], max_bucket: int = 1000) -> list[tuple[str, str]]:
    """Driver-side LSH blocking over a *small* vocabulary of normalized keys.

    Identical banding scheme to the distributed path
    (:func:`sema_ray.pipelines.kg.lsh_candidate_pairs`) — same signatures,
    same star pairing — but computed locally: the canonicalization input is
    the entity vocabulary, which is collected to the driver for union-find
    anyway, so shuffling it through a distributed groupby is pure overhead
    below ~100k keys. Deterministic; returns sorted unique (a, b) pairs.
    """
    buckets: dict[tuple[int, int], list[str]] = {}
    for k in sorted(set(norm_keys)):
        if not k:
            continue
        sig = minhash_signature(char_shingle_hashes(k))
        for b, h in enumerate(band_hashes(sig)):
            buckets.setdefault((b, h), []).append(k)
    pairs: set[tuple[str, str]] = set()
    for members in buckets.values():
        members = members[:max_bucket]
        if len(members) < 2:
            continue
        rep = members[0]
        for other in members[1:]:
            pairs.add((rep, other))
    return sorted(pairs)


def verify_pair(key_a: str, key_b: str, embedder: HashEmbedder,
                jaccard_threshold: float = 0.4,
                cosine_threshold: float = 0.6) -> bool:
    """Merge decision for one candidate pair of *normalized* keys.

    Exact key equality always merges; otherwise 3-gram Jaccard OR embedding
    cosine (north-star "cosine merge") over the threshold.
    """
    if key_a == key_b:
        return True
    ja = jaccard(char_shingle_hashes(key_a), char_shingle_hashes(key_b))
    if ja >= jaccard_threshold:
        return True
    va = embedder.embed_one(key_a)
    vb = embedder.embed_one(key_b)
    return float(cosine_matrix(va[None, :], vb[None, :])[0, 0]) >= cosine_threshold


def build_canonical_map(
    surface_counts: list[tuple[str, int]],
    candidate_pairs: list[tuple[str, str]],
    jaccard_threshold: float = 0.4,
    cosine_threshold: float = 0.6,
) -> dict[str, tuple[int, str]]:
    """surface -> (entity_id, canonical_surface) from verified pair merges.

    ``surface_counts``: all distinct surfaces with occurrence counts.
    ``candidate_pairs``: LSH-blocked candidate pairs of *normalized keys*.
    Canonical surface of a cluster = highest count, ties by lexicographic
    order (deterministic); entity_id = stable_id64 of the canonical surface.
    """
    embedder = HashEmbedder()
    uf = UnionFind()
    norm_of: dict[str, str] = {}
    for s, _c in surface_counts:
        k = normalize_surface(s)
        norm_of[s] = k
        uf.union(("k", k), ("s", s))  # same normalized key => same cluster
    for ka, kb in candidate_pairs:
        if ka == kb:
            continue
        if verify_pair(ka, kb, embedder, jaccard_threshold, cosine_threshold):
            uf.union(("k", ka), ("k", kb))

    count_of = dict(surface_counts)
    clusters: dict = {}
    for s in norm_of:
        clusters.setdefault(uf.find(("s", s)), []).append(s)
    out: dict[str, tuple[int, str]] = {}
    for members in clusters.values():
        rep = sorted(members, key=lambda s: (-count_of.get(s, 0), s))[0]
        eid = stable_id64(normalize_surface(rep) or rep)
        for s in members:
            out[s] = (eid, rep)
    return out
