"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Pipeline shapes (all Ray-Data-first, SURVEY §2 "Set ops / dedup"):

- **exact**: content-hash per row (reference T4 fingerprint idea,
  ``src/storage/mod.rs:72-94``) -> groupby(hash) -> keep min id. The shuffle
  moves 16-byte hashes, never the text.
- **MinHash/LSH**: per-batch word-shingle minhash signatures -> explode to
  (band, bucket) rows -> groupby(bucket) -> star candidate pairs verified by
  signature agreement inside the group -> union-find (driver; pairs ≪ rows
  by LSH construction) -> broadcast cluster map.
- **SimHash**: 64-bit weighted token fingerprint; hamming ≤ ``max_hamming``
  via pigeonhole band blocking (split 64 bits into ``max_hamming+1`` bands:
  any pair within the hamming budget shares ≥1 exact band) -> verify
  hamming in-group.
- **n-gram Jaccard**: LSH candidates + *exact* Jaccard verification as a
  distributed join of the pair list against the shingle-set table (no driver
  text processing) — the scale path for precise thresholds.

Only the union-find reduction is centralized, over verified pairs (bounded:
LSH emits pairs only for colliding docs).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .canonicalize import UnionFind
from .util import collect_table
from .hashing import content_hash, stable_id64

NUM_PERMS = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERMS // BANDS
_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile("[a-z0-9]+")

_rng = np.random.default_rng(0x5EED)
_A = _rng.integers(1, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)
_SIMHASH_MASKS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _load_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique uint64 hashes of the k-word shingles of ``text``."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.unique(np.array([stable_id64(g) for g in grams], dtype=np.uint64))
    return out


def minhash_sig(shingles: np.ndarray) -> np.ndarray:
    """NUM_PERMS minhash signature (vectorized universal hashing)."""
    if len(shingles) == 0:
        return np.full(NUM_PERMS, _MERSENNE, dtype=np.uint64)
    x = (shingles % _MERSENNE)[:, None]
    return ((x * _A[None, :] + _B[None, :]) % _MERSENNE).min(axis=0).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (unweighted tokens, deterministic)."""
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    hs = np.array([stable_id64(t) for t in toks], dtype=np.uint64)
    bits = ((hs[:, None] & _SIMHASH_MASKS[None, :]) != 0)
    votes = bits.sum(axis=0) * 2 - len(hs)  # +1 / -1 votes per bit
    out = np.uint64(0)
    for b in np.nonzero(votes > 0)[0]:
        out |= _SIMHASH_MASKS[b]
    return int(out)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Keep min doc_id per exact text; report copy count.

    groupby runs on the 128-bit content hash, so the all-to-all moves 32-byte
    keys + ids — never document bodies.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def hashed(t: pa.Table) -> pa.Table:
        h = pa.array([content_hash(x) for x in t["text"].to_pylist()],
                     pa.string())
        return pa.table({"h": h, "doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    partials = ds.map_batches(hashed, batch_format="pyarrow").map_batches(
        lambda t: (lambda g: pa.table({
            "h": g["h"], "doc_id": g["doc_id_min"], "n": g["one_sum"]}))(
            t.group_by(["h"]).aggregate([("doc_id", "min"), ("one", "sum")])),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Min
    out = partials.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Sum("n", alias_name="n_copies"),
    )
    return out.select_columns(["doc_id", "n_copies"])


# ---------------------------------------------------------------------------
# LSH machinery (shared by minhash / ngram-jaccard)
# ---------------------------------------------------------------------------

class MinHashBandStage:
    """Per-batch: text -> minhash signature -> one row per LSH band.

    Carries the signature on each band row so candidate verification happens
    *inside* the bucket group with no extra join (tradeoff: BANDS× signature
    shuffle volume ≈ ``BANDS*NUM_PERMS*8`` B/doc; the join-based alternative
    used by :func:`ngram_jaccard_pairs` avoids it when precision matters).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, bands, buckets, sigs = [], [], [], []
        for i, text in zip(t[self.id_col].to_pylist(),
                           t[self.text_col].to_pylist()):
            sig = minhash_sig(word_shingles(text))
            sig_list = sig.astype(np.int64)
            for b in range(BANDS):
                seg = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
                bucket = stable_id64(f"{b}:{seg.tobytes().hex()}")
                ids.append(i)
                bands.append(b)
                buckets.append(bucket)
                sigs.append(sig_list)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "bucket": pa.array(buckets, pa.int64()),
            "sig": pa.array(sigs, pa.list_(pa.int64(), NUM_PERMS)),
        })


def _star_pairs_verified(threshold: float):
    """Group fn: star pairs (min-id rep vs rest) with signature-agreement
    Jaccard estimate; emits only pairs over ``threshold``."""

    def pairs(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False))
        order = np.argsort(ids, kind="stable")
        uniq, first_idx = np.unique(ids[order], return_index=True)
        if len(uniq) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        sigs = np.asarray(g["sig"].to_pylist(), dtype=np.int64)[order][first_idx]
        rep_sig = sigs[0]
        est = (sigs[1:] == rep_sig[None, :]).mean(axis=1)
        keep = est >= threshold
        bs = uniq[1:][keep]
        return pa.table({
            "a": pa.array(np.full(len(bs), uniq[0]), pa.int64()),
            "b": pa.array(bs, pa.int64()),
        })

    return pairs


def _all_pairs_verified(threshold: float, max_bucket: int = 256):
    """Group fn: ALL in-bucket (i < j) pairs with signature-estimate filter.

    Used when the op's contract is a complete pair *listing* (star pairs
    only guarantee cluster connectivity). ``max_bucket`` caps the quadratic
    blowup on hot buckets — a bucket that large at band width 4 is
    near-identical content whose pairs the clustering path already covers.
    """

    def pairs(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False))
        order = np.argsort(ids, kind="stable")
        uniq, first_idx = np.unique(ids[order], return_index=True)
        if len(uniq) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        uniq = uniq[:max_bucket]
        sigs = np.asarray(g["sig"].to_pylist(),
                          dtype=np.int64)[order][first_idx][:max_bucket]
        n = len(uniq)
        ii, jj = np.triu_indices(n, k=1)
        est = (sigs[ii] == sigs[jj]).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "a": pa.array(uniq[ii[keep]], pa.int64()),
            "b": pa.array(uniq[jj[keep]], pa.int64()),
        })

    return pairs


def minhash_candidate_pairs(ds: rd.Dataset, threshold: float = 0.7,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            all_pairs: bool = False) -> rd.Dataset:
    band_rows = ds.map_batches(
        MinHashBandStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 8),
    )
    group_fn = (_all_pairs_verified(threshold) if all_pairs
                else _star_pairs_verified(threshold))
    return band_rows.groupby(["band", "bucket"]).map_groups(
        group_fn, batch_format="pyarrow")


def _clusters_table(ids: list[int], pairs: list[tuple[int, int]]) -> pa.Table:
    """Union-find over verified pairs -> (doc_id, rep_id) with min-id reps."""
    uf = UnionFind()
    for i in ids:
        uf.find(i)
    for a, b in pairs:
        uf.union(int(a), int(b))
    groups = uf.groups()
    rep_of: dict[int, int] = {}
    for members in groups.values():
        rep = min(members)
        for m in members:
            rep_of[m] = rep
    sids = sorted(ids)
    return pa.table({
        "doc_id": pa.array(sids, pa.int64()),
        "rep_id": pa.array([rep_of[i] for i in sids], pa.int64()),
    })


def minhash_near_dup(sf_dir: str, threshold: float = 0.7) -> pa.Table:
    """MinHash/LSH near-duplicate clusters: doc_id -> cluster representative.

    Pairs (small, post-LSH) come back to the driver for the union-find
    reduction only; all text/signature work is distributed.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])
    ids = [r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()]
    pair_tbl = collect_table(minhash_candidate_pairs(ds, threshold))
    pairs = sorted(set(zip(pair_tbl["a"].to_pylist(),
                           pair_tbl["b"].to_pylist())))
    return _clusters_table(ids, pairs)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_dup(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup clusters via pigeonhole banding.

    64 bits split into ``max_hamming+1`` bands: any pair within the hamming
    budget collides on ≥1 exact band (pigeonhole), so candidate generation is
    a plain groupby(band, band_bits); verification checks true hamming
    distance inside the group. Only verified pairs reach the driver.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def band_rows(t: pa.Table) -> pa.Table:
        ids, bands, keys, hashes = [], [], [], []
        for i, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            h = simhash64(text)
            for b in range(n_bands):
                lo = b * width
                hi = 64 if b == n_bands - 1 else lo + width
                seg = (h >> lo) & ((1 << (hi - lo)) - 1)
                ids.append(i)
                bands.append(b)
                keys.append(seg)
                hashes.append(h)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band": pa.array(bands, pa.int32()),
            "key": pa.array(keys, pa.int64()),
            "simhash": pa.array([x - (1 << 64) if x >= (1 << 63) else x
                                 for x in hashes], pa.int64()),
        })

    def verified_pairs(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False))
        hs = np.asarray(g["simhash"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        uniq, first_idx = np.unique(ids[order], return_index=True)
        if len(uniq) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        hs = hs[order][first_idx]
        x = hs[1:] ^ hs[0]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pa.table({
            "a": pa.array(np.full(int(keep.sum()), uniq[0]), pa.int64()),
            "b": pa.array(uniq[1:][keep], pa.int64()),
        })

    ds = _load_docs(sf_dir, ["doc_id", "text"])
    ids = [r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all()]
    pair_ds = ds.map_batches(band_rows, batch_format="pyarrow") \
        .groupby(["band", "key"]).map_groups(verified_pairs,
                                             batch_format="pyarrow")
    pair_tbl = collect_table(pair_ds)
    pairs = sorted(set(zip(pair_tbl["a"].to_pylist(),
                           pair_tbl["b"].to_pylist())))
    return _clusters_table(ids, pairs)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via distributed pair join
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        lsh_estimate_threshold: float = 0.35,
                        num_partitions: int = 8) -> rd.Dataset:
    """Pairs with *exact* word-3-gram Jaccard ≥ threshold.

    Candidates from LSH (loose estimate threshold to keep recall), then exact
    verification as two hash joins of the pair list against the distributed
    (doc_id, shingles) table — no document text ever reaches the driver.
    Output: a, b, jac (rounded to 4).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])
    # complete pair listing => all in-bucket pairs, deduped across bands
    raw = minhash_candidate_pairs(ds, lsh_estimate_threshold, all_pairs=True)
    cands = raw.groupby(["a", "b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")

    def shingle_rows(t: pa.Table) -> pa.Table:
        # shingle sets travel as binary blobs (uint64 little-endian bytes):
        # Arrow hash joins don't support list-typed payload columns.
        ids, sets_ = [], []
        for i, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ids.append(i)
            sets_.append(word_shingles(text).tobytes())
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shingles": pa.array(sets_, pa.binary())})

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow")
    # fractional-CPU aggregators: hash-join shuffle actors must never
    # reserve whole cores, or back-to-back joins deadlock on small clusters
    agg_args = {"num_cpus": 0.05}
    j1 = cands.join(shingles, join_type="inner",
                    num_partitions=num_partitions,
                    on=("a",), right_on=("doc_id",),
                    aggregator_ray_remote_args=agg_args)
    sh_b = shingles.map_batches(
        lambda t: t.rename_columns(["doc_id", "shingles_b"]),
        batch_format="pyarrow")
    j2 = j1.join(sh_b, join_type="inner", num_partitions=num_partitions,
                 on=("b",), right_on=("doc_id",),
                 aggregator_ray_remote_args=agg_args)

    def verify(t: pa.Table) -> pa.Table:
        a_ids, b_ids, jacs = [], [], []
        for a, b, sa, sb in zip(t["a"].to_pylist(), t["b"].to_pylist(),
                                t["shingles"].to_pylist(),
                                t["shingles_b"].to_pylist()):
            xa = set(np.frombuffer(sa, dtype=np.uint64).tolist())
            xb = set(np.frombuffer(sb, dtype=np.uint64).tolist())
            union = len(xa | xb)
            jac = (len(xa & xb) / union) if union else 1.0
            if jac >= threshold:
                a_ids.append(a)
                b_ids.append(b)
                jacs.append(round(jac, 4))
        return pa.table({"a": pa.array(a_ids, pa.int64()),
                         "b": pa.array(b_ids, pa.int64()),
                         "jac": pa.array(jacs, pa.float64())})

    return j2.map_batches(verify, batch_format="pyarrow")
