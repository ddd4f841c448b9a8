"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Pipeline shapes (all Ray-Data-first, SURVEY §2 "Set ops / dedup"):

- **exact**: content-hash per row (reference T4 fingerprint idea,
  ``src/storage/mod.rs:72-94``) -> groupby(hash) -> keep min id. The shuffle
  moves 16-byte hashes, never the text.
- **MinHash/LSH**: two-pass hot-bucket blocking. Pass 1 shuffles only
  ``(bucket, doc_id)`` (16 B/row) into a fully vectorized bucket-size
  aggregate; buckets with ≥2 members — the duplicate families plus LSH
  false positives, ≪ corpus by construction — are broadcast back, and pass
  2 collects just those members (with signatures) for verification.
  Round 1 instead carried 512-B signatures through the shuffle and ran one
  Python ``map_groups`` call per bucket; with 99% singleton buckets the
  per-group overhead dominated end to end.
- **SimHash**: 64-bit weighted token fingerprint; hamming ≤ ``max_hamming``
  via pigeonhole band blocking (split 64 bits into ``max_hamming+1`` bands:
  any pair within the hamming budget shares ≥1 exact band) -> same two-pass
  hot-bucket shape.
- **n-gram Jaccard**: LSH candidates + *exact* Jaccard verification as a
  distributed join of the pair list against the shingle-set table (no driver
  text processing) — the scale path for precise thresholds.

Only the union-find reduction is centralized, and it sees only the verified
pair list (bounded: LSH emits pairs only for colliding docs) — above
``DISTRIBUTED_REDUCE_MIN_PAIRS`` even that list is first star-compressed by
distributed connected components (:mod:`sema_ray.graph`), so the driver
holds a label-table-sized pair set on any dup rate. Cluster *assignment* is
distributed: the member->rep map (pair members only, ≪ corpus) is broadcast
and applied in ``map_batches`` with default rep=self — no full-id-column
driver materialization anywhere.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .canonicalize import UnionFind
from .util import collect_table, lower_utf8
from .hashing import content_hash

NUM_PERMS = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERMS // BANDS
_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile("[a-z0-9]+")

_rng = np.random.default_rng(0x5EED)
_A = _rng.integers(1, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=NUM_PERMS, dtype=np.uint64)
_SIMHASH_MASKS = (np.uint64(1) << np.arange(64, dtype=np.uint64))

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _pos_mults(width: int) -> np.ndarray:
    """One DISTINCT odd multiplier per window position for combining token
    ids into shingle/span hashes numerically (one vectorized pass instead
    of a blake2b call per shingle). Cycling a short constant table (the
    old 5-entry ``_C[j % len(_C)]``) made the weighted sum invariant under
    rotations of identical-token runs — "zz zz zz zz zz alpha beta gamma"
    and "alpha beta gamma zz zz zz zz zz" summed EQUAL, a structural (not
    chance) collision found by oracle fuzzing on repetitive documents.
    Derived via splitmix on the position index, forced odd."""
    return _mix64(np.arange(1, width + 1, dtype=np.uint64) * _GOLDEN) \
        | np.uint64(1)

# token -> uint64 hash, cached per worker process (blake2b runs once per
# distinct token ever seen by the worker, not once per occurrence). Bounded:
# open-vocabulary corpora (ids, typos, hashes) would otherwise grow a
# long-lived Ray worker's cache without limit (ADVICE r2).
_TOK_CACHE_MAX = 4_000_000
_tok_cache: dict[str, np.uint64] = {}


# splitmix64 finalizer (vectorized) — shared with the relational part-key
# machinery; identical constants to the former local definition
from .hashing import splitmix64 as _mix64  # noqa: E402


def _token_ids(toks: list[str]) -> np.ndarray:
    """uint64 hash per token (blake2b, memoized at module scope)."""
    cache = _tok_cache
    if len(cache) > _TOK_CACHE_MAX:
        cache.clear()
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        v = cache.get(t)
        if v is None:
            v = np.uint64(int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(),
                "big"))
            cache[t] = v
        out[i] = v
    return out


def _load_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _doc_count(sf_dir: str) -> int:
    """Row count from parquet metadata (no read) — drives the adaptive
    local-vs-distributed choice in :func:`_hot_buckets`."""
    import pyarrow.parquet as pq_mod
    return pq_mod.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def _prefix_rows_estimate(sf_dir: str, threshold: float) -> int:
    """Upper-ish estimate of total prefix-filter rows, from parquet
    metadata alone: prefix length per doc is ``(1-t)·|shingles| + 1`` and
    shingles are bounded by word count ≈ text bytes / 5 (ADVICE r4: the
    old fixed 64-per-doc constant undershoots on long-document corpora and
    kept the count pass driver-local past its memory intent)."""
    import pyarrow.parquet as pq_mod
    md = pq_mod.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata
    text_bytes = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            if col.path_in_schema == "text":
                text_bytes += col.total_uncompressed_size
    words = text_bytes // 5
    return md.num_rows + int(words * max(0.0, 1.0 - threshold))


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Sorted unique uint64 hashes of the k-word shingles of ``text``.

    Fully vectorized: token ids (cached blake2b) combined per window with
    position-dependent odd multipliers, then a splitmix64 finalizer — no
    per-shingle digest calls (VERDICT r1 "What's wrong" #7). Lowercasing
    uses Arrow (utf8proc) semantics so tokenization matches _word_stream
    and the DuckDB twins on non-ASCII text. NULL text has no shingles,
    like '' (near-dup blocking only — exact identity stays distinct via
    _content_h).
    """
    text = text or ""
    toks = _TOKEN_RE.findall(lower_utf8(text))
    if not toks:
        return np.empty(0, dtype=np.uint64)
    ids = _token_ids(toks)
    kk = min(k, len(ids))  # short texts collapse to one whole-text shingle
    n = len(ids) - kk + 1
    acc = np.full(n, kk, dtype=np.uint64)  # fold window width into the seed
    mult = _pos_mults(kk)
    for j in range(kk):
        acc += ids[j:j + n] * mult[j]
    return np.unique(_mix64(acc))


def minhash_sig(shingles: np.ndarray) -> np.ndarray:
    """NUM_PERMS minhash signature (vectorized universal hashing)."""
    if len(shingles) == 0:
        return np.full(NUM_PERMS, _MERSENNE, dtype=np.uint64)
    x = (shingles % _MERSENNE)[:, None]
    return ((x * _A[None, :] + _B[None, :]) % _MERSENNE).min(axis=0).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over token hashes (unweighted tokens, deterministic;
    NULL text hashes like '')."""
    toks = _TOKEN_RE.findall(lower_utf8(text or ""))
    if not toks:
        return 0
    hs = _token_ids(toks)
    bits = ((hs[:, None] & _SIMHASH_MASKS[None, :]) != 0)
    votes = bits.sum(axis=0) * 2 - len(hs)  # +1 / -1 votes per bit
    return int(np.where(votes > 0, _SIMHASH_MASKS, np.uint64(0)).sum())


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> rd.Dataset:
    """Keep min doc_id per exact text; report copy count.

    Two-pass hot-bucket shape (VERDICT r2 minor: the former version ran one
    Python blake2b per row over the WHOLE corpus). Pass 1 aggregates
    vectorized 64-bit text buckets (Rust xxhash kernel, no per-row Python)
    into (bucket, min_id, n) — buckets with n == 1 are unique texts and are
    emitted directly; only rows in n ≥ 2 buckets (duplicate families plus
    64-bit collisions, ≪ corpus) are re-read in pass 2 with the full
    128-bit content hash, which disambiguates any bucket collision. The
    shuffle moves 24-byte partials, never text.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def bucket_partial(t: pa.Table) -> pa.Table:
        b = _text_bucket64(t["text"]).view(np.int64)
        g = pa.table({"bucket": pa.array(b, pa.int64()),
                      "doc_id": pc.cast(t["doc_id"], pa.int64()),
                      "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}) \
            .group_by(["bucket"]) \
            .aggregate([("doc_id", "min"), ("one", "sum")])
        return g.rename_columns(["bucket", "min_id", "n"])

    partials = ds.map_batches(bucket_partial, batch_format="pyarrow",
                              batch_size=None)

    def verified_families(hot: np.ndarray) -> pa.Table:
        """Pass 2: 128-bit verification over hot-bucket members only —
        bounded by duplicate-family volume, never the corpus."""
        hot_ref = ray.put(hot)

        def family_partial(t: pa.Table) -> pa.Table:
            b = _text_bucket64(t["text"]).view(np.int64)
            keep = np.isin(b, ray.get(hot_ref))
            t = t.filter(pa.array(keep))
            h = pa.array([_content_h(x)
                          for x in t["text"].to_pylist()], pa.string())
            g = pa.table({"h": h,
                          "doc_id": pc.cast(t["doc_id"], pa.int64()),
                          "one": pa.array(np.ones(t.num_rows,
                                                  dtype=np.int64))}) \
                .group_by(["h"]) \
                .aggregate([("doc_id", "min"), ("one", "sum")])
            return g.rename_columns(["h", "min_id", "n"])

        ft = collect_table(ds.map_batches(family_partial,
                                          batch_format="pyarrow",
                                          batch_size=None))
        if ft.num_rows == 0 or "h" not in ft.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_copies": pa.array([], pa.int64())})
        fam = ft.group_by("h").aggregate([("min_id", "min"), ("n", "sum")])
        return pa.table({"doc_id": fam["min_id_min"],
                         "n_copies": fam["n_sum"]})

    if _doc_count(sf_dir) <= LOCAL_COUNT_MAX_ROWS:
        # small input: one driver combine of the per-block bucket partials
        # (the adaptive _hot_buckets pattern — distributed groupbys carry
        # seconds of fixed shuffle-actor cost at this size)
        bt = collect_table(partials)
        if "bucket" not in bt.column_names or bt.num_rows == 0:
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_copies": pa.array([], pa.int64())}))
        bt = bt.group_by("bucket").aggregate(
            [("min_id", "min"), ("n", "sum")]) \
            .rename_columns(["bucket", "min_id", "n"])
        hot_mask = pc.greater(bt["n"], 1)
        uniques = bt.filter(pc.invert(hot_mask))
        out = pa.table({"doc_id": uniques["min_id"],
                        "n_copies": uniques["n"]})
        hot = np.sort(bt.filter(hot_mask)["bucket"]
                      .to_numpy(zero_copy_only=False))
        if len(hot):
            out = pa.concat_tables([out, verified_families(hot)])
        return rd.from_arrow(out)

    # scale path: the bucket table (≈ distinct texts, corpus-sized) NEVER
    # centralizes — distributed groupby, hot slice collected (bounded by
    # duplicate families), unique slice streamed straight to the output
    from ray.data.aggregate import Min
    bt_ds = partials.groupby("bucket").aggregate(
        Min("min_id", alias_name="min_id"),
        Sum("n", alias_name="n")).materialize()  # two consumers below
    hot_tbl = collect_table(bt_ds.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["bucket"]),
        batch_format="pyarrow"))
    uniques_ds = bt_ds.map_batches(
        lambda t: (lambda u: pa.table({"doc_id": u["min_id"],
                                       "n_copies": u["n"]}))(
            t.filter(pc.equal(t["n"], 1))),
        batch_format="pyarrow")
    if hot_tbl.num_rows == 0 or "bucket" not in hot_tbl.column_names:
        return uniques_ds
    fam = verified_families(
        np.sort(hot_tbl["bucket"].to_numpy(zero_copy_only=False)))
    return uniques_ds.union(rd.from_arrow(fam))


# NULL text carries its own content identity: the twins' GROUP BY /
# PARTITION BY text keep one NULL group, distinct from '' (SQL NULL is not
# the empty string). The sentinel cannot collide with content_hash's hex
# output alphabet.
_NULL_TEXT_H = "\x00null"


def _content_h(x) -> str:
    return content_hash(x) if x is not None else _NULL_TEXT_H


def _text_bucket64(col) -> np.ndarray:
    """Vectorized 64-bit text bucket (polars xxhash — Rust kernel, no
    per-row Python). Only a BLOCKING key: full 128-bit blake2b identity is
    re-checked inside the duplicate families, so a 64-bit collision can
    never merge distinct texts. Falls back to truncated blake2b per row if
    polars is unavailable."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        import polars as pl
        return pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)
    except ImportError:
        # all-or-nothing fallback: polars ABSENT is consistent across every
        # worker, so blocking keys stay comparable. (A per-call exception
        # fallback would NOT be: mixed hash families across blocks would
        # silently split duplicate families.)
        out = np.empty(len(col), dtype=np.uint64)
        for i, t in enumerate(col.to_pylist()):
            out[i] = np.uint64(int(content_hash(
                t if t is not None else _NULL_TEXT_H)[:16], 16))
        return out
    except AttributeError:
        # transient half-initialized polars in a freshly forked worker
        # (observed: polars._reexport missing Series during concurrent
        # first-imports) — purge and re-import once; if it fails again the
        # task error propagates rather than silently switching hashes
        import sys as _sys
        for m in [m for m in _sys.modules
                  if m == "polars" or m.startswith("polars.")]:
            del _sys.modules[m]
        import polars as pl
        return pl.from_arrow(col).hash(seed=0).to_numpy().astype(np.uint64)


def exact_rep_map(sf_dir: str) -> dict[int, int]:
    """member doc_id -> min doc_id sharing its text, for NON-reps only —
    bounded by duplicate-family volume (the two-pass hot-bucket shape;
    uniques never enter the map). Shared by :func:`exact_dup_clusters` and
    the corpus-curation pipeline (:mod:`sema_ray.curate`)."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    class TextBuckets:
        def __init__(self, hot: np.ndarray | None = None):
            self.hot = np.sort(hot) if hot is not None else None

        def __call__(self, t: pa.Table) -> pa.Table:
            b = _text_bucket64(t["text"]).view(np.int64)
            if self.hot is None:
                return pa.table({"bucket": pa.array(b, pa.int64())})
            keep = np.isin(b, self.hot)
            t = t.filter(pa.array(keep))
            h = pa.array([_content_h(x)
                          for x in t["text"].to_pylist()], pa.string())
            return pa.table({"bucket": pa.array(b[keep], pa.int64()),
                             "doc_id": pc.cast(t["doc_id"], pa.int64()),
                             "h": h})

    light = ds.map_batches(TextBuckets(), batch_format="pyarrow",
                           batch_size=None)
    hot, member_rows = _hot_buckets(light, _doc_count(sf_dir))
    if len(hot) == 0:
        return {}
    members = ds.map_batches(TextBuckets(hot=hot),
                             batch_format="pyarrow", batch_size=None)
    pair_tbl = _verified_pairs(members, _exact_members_to_pairs,
                               member_rows)
    return rep_map_from_pairs(pair_tbl)


def exact_dup_clusters(sf_dir: str) -> rd.Dataset:
    """Cluster-assignment form of exact dedup: every doc_id -> min doc_id
    sharing its text (rep=self for uniques).

    Round 2 ran ``groupby(hash).map_groups`` with mostly-singleton groups —
    the one-Python-call-per-group anti-pattern (ADVICE r2). Now the same
    two-pass hot-bucket shape as the near-dup family: pass 1 counts
    vectorized 64-bit text buckets (no blake2b, no shuffle of hashes for
    unique docs); only duplicate-family members flow into pass 2, which
    carries the full 128-bit content hash and emits (min-id, member) pairs
    via an Arrow hash join inside the verification kernel. Cluster
    assignment is the standard broadcast pass (default rep=self).
    DuckDB-oracle-checked (``MIN(doc_id) OVER (PARTITION BY text)``).
    """
    return assign_reps(_load_docs(sf_dir, ["doc_id"]), exact_rep_map(sf_dir),
                       rep_col="rep_id")


def _exact_members_to_pairs(mt: pa.Table) -> pa.Table:
    """Hot-bucket member rows (bucket, doc_id, h) -> (min-id, member) pairs
    per exact-text family (the full 128-bit hash disambiguates any 64-bit
    bucket collisions). Vectorized: one Arrow group_by + one hash join."""
    if mt.num_rows == 0 or "h" not in mt.column_names:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    reps = mt.group_by("h").aggregate([("doc_id", "min")])
    j = mt.select(["h", "doc_id"]).join(reps, keys="h")
    mask = pc.not_equal(j["doc_id"], j["doc_id_min"])
    j = j.filter(mask)
    return pa.table({"a": pc.cast(j["doc_id_min"], pa.int64()),
                     "b": pc.cast(j["doc_id"], pa.int64())})


# ---------------------------------------------------------------------------
# LSH machinery (shared by minhash / ngram-jaccard)
# ---------------------------------------------------------------------------

class MinHashBandStage:
    """Per-batch: text -> minhash signature -> one row per LSH band.

    The bucket id folds the band index into the band-segment hash, so a
    single int64 column is the full blocking key. Two modes:

    - ``carry_sig=False`` (pass 1): emit only ``(bucket, doc_id)`` — the
      counting shuffle moves 16 B/doc/band, never signatures.
    - ``carry_sig=True`` + ``hot_ref`` (pass 2): recompute, keep only rows
      whose bucket is in the broadcast hot-bucket set, and attach the
      signature for verification. Rows that survive ≈ members of duplicate
      families — tiny by LSH construction.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 carry_sig: bool = False, hot: np.ndarray | None = None):
        self.id_col = id_col
        self.text_col = text_col
        self.carry_sig = carry_sig
        self.hot = np.sort(hot) if hot is not None else None

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        n = len(texts)
        cols: dict = {}
        if n == 0:
            cols["bucket"] = pa.array([], pa.int64())
            cols["doc_id"] = pa.array([], pa.int64())
            if self.carry_sig:
                cols["sig"] = pa.array([], pa.list_(pa.int64(), NUM_PERMS))
            return pa.table(cols)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = np.empty((n, NUM_PERMS), dtype=np.uint64)
        for i, text in enumerate(texts):
            # NULL text has no shingles, like '' (near-dup blocking only;
            # exact-dedup identity keeps NULL distinct via _content_h)
            sigs[i] = minhash_sig(word_shingles(text or ""))
        # bucket per (doc, band): vectorized fold of the band's signature
        # segment + the band index, one _mix64 pass for the whole batch
        seg = sigs.reshape(n, BANDS, ROWS_PER_BAND)
        mult = _pos_mults(ROWS_PER_BAND)
        buckets = _mix64((seg * mult[None, None, :]).sum(axis=2)
                         + np.arange(BANDS, dtype=np.uint64)[None, :] * _GOLDEN)
        flat_bucket = buckets.reshape(-1).view(np.int64)  # doc-major
        flat_doc = np.repeat(ids, BANDS)
        keep = (np.isin(flat_bucket, self.hot) if self.hot is not None
                else slice(None))
        cols["bucket"] = pa.array(flat_bucket[keep], pa.int64())
        cols["doc_id"] = pa.array(flat_doc[keep], pa.int64())
        if self.carry_sig:
            sig_rows = np.repeat(sigs.view(np.int64), BANDS,
                                 axis=0)[keep]
            cols["sig"] = pa.FixedSizeListArray.from_arrays(
                pa.array(sig_rows.reshape(-1)), NUM_PERMS)
        return pa.table(cols)


# Below this many band rows the bucket count combines on the driver (the
# per-block partials are a few MB); above it, the proper distributed
# groupby-sum runs — its hash-shuffle setup costs seconds of fixed overhead,
# which would dominate any small input.
LOCAL_COUNT_MAX_ROWS = 4_000_000


def _hot_buckets(light: rd.Dataset,
                 approx_rows: int | None = None
                 ) -> tuple[np.ndarray, int]:
    """Bucket-size count -> (buckets with ≥2 members, total member rows).

    Per-batch ``value_counts`` partials feed a vectorized global sum — no
    per-group Python anywhere. Execution is adaptive: driver combine for
    small inputs, distributed groupby-sum at scale (see
    ``LOCAL_COUNT_MAX_ROWS``). The member-row total (sum of sizes of the hot
    buckets) drives the local-vs-distributed verification choice in
    :func:`_verified_pairs`."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t["bucket"].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"bucket": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = light.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None)
    if approx_rows is not None and approx_rows <= LOCAL_COUNT_MAX_ROWS:
        tbl = collect_table(partials)
        if "bucket" not in tbl.column_names or tbl.num_rows == 0:
            return np.empty(0, dtype=np.int64), 0
        counts = tbl.group_by("bucket").aggregate([("n", "sum")])
        hot_tbl = counts.filter(pc.greater(counts["n_sum"], 1))
        return (hot_tbl["bucket"].to_numpy(zero_copy_only=False),
                int(pc.sum(hot_tbl["n_sum"]).as_py() or 0))
    counts = partials.groupby("bucket").aggregate(Sum("n", alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)),
        batch_format="pyarrow")
    tbl = collect_table(hot)
    if "bucket" not in tbl.column_names:
        return np.empty(0, dtype=np.int64), 0
    return (tbl["bucket"].to_numpy(zero_copy_only=False),
            int(pc.sum(tbl["n"]).as_py() or 0))


# Verification placement (VERDICT r2 #1): below this many colliding-member
# rows the members are collected and the vectorized kernel runs on the
# driver (one task round-trip, no shuffle — fastest at bench scale). Above
# it — a heavily duplicated corpus, where the member set is a large fraction
# of the input — members are hash-partitioned on their bucket and the SAME
# kernel runs inside a ``groupby("part").map_groups`` with a bounded number
# of groups (`VERIFY_PARTS`, so no per-singleton-group Python overhead),
# and only verified (a, b) pairs ever reach the driver.
LOCAL_VERIFY_MAX_ROWS = 2_000_000
VERIFY_PARTS = 64
# On the distributed-verification path, pair lists at or above this size
# are first reduced by DISTRIBUTED connected components (alternating star
# rounds, sema_ray.graph) into equivalent (component-min, node) star pairs
# — strictly label-table-sized — before the driver sees anything. The raw
# pair list (all in-bucket pairs on a heavily duplicated corpus) can be
# quadratically larger than the node set; the star form feeds the same
# union-find to the same rep map.
DISTRIBUTED_REDUCE_MIN_PAIRS = 5_000_000


def _verified_pairs(member_ds: rd.Dataset, kernel, member_rows: int,
                    local_max_rows: int | None = None,
                    n_parts: int = VERIFY_PARTS,
                    compress_reduction: bool = True) -> pa.Table:
    """Run a per-bucket verification ``kernel`` over colliding-member rows.

    ``kernel`` takes a table of complete buckets (every row of any bucket it
    sees) and returns verified pair rows; it must be correct on any union of
    whole buckets, so the same function serves both placements. The part key
    is the bucket's low bits (buckets are splitmix64 outputs — low bits are
    uniform), which keeps every bucket intact inside exactly one group.

    ``compress_reduction`` (cluster-forming callers only — callers that need
    the literal pair listing pass False) enables the star-pair compression
    above ``DISTRIBUTED_REDUCE_MIN_PAIRS``.
    """
    if local_max_rows is None:
        local_max_rows = LOCAL_VERIFY_MAX_ROWS
    if member_rows <= local_max_rows:
        return kernel(collect_table(member_ds))
    out = _verified_pairs_ds(member_ds, kernel, n_parts)
    if compress_reduction:
        out = out.materialize()
        if out.count() >= DISTRIBUTED_REDUCE_MIN_PAIRS:
            from .graph import connected_components
            labels = connected_components(out, a_col="a", b_col="b")
            out = labels.map_batches(
                lambda t: (lambda m: pa.table(
                    {"a": t["component"].filter(m),
                     "b": t["node"].filter(m)}))(
                    pc.not_equal(t["node"], t["component"])),
                batch_format="pyarrow", batch_size=None)
    return collect_table(out)


def _verified_pairs_ds(member_ds: rd.Dataset, kernel,
                       n_parts: int = VERIFY_PARTS) -> rd.Dataset:
    """The distributed placement of :func:`_verified_pairs` as a LAZY
    Dataset — for callers that keep the pair list distributed downstream
    (the ngram join path, connected components)."""

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.bit_wise_and(t["bucket"],
                                       pa.scalar(n_parts - 1, pa.int64())),
                       pa.int32())
        return t.append_column("part", part)

    def verify_group(g: pa.Table) -> pa.Table:
        return kernel(g.drop_columns(["part"]))

    return (member_ds.map_batches(add_part, batch_format="pyarrow",
                                  batch_size=None)
            .groupby("part")
            .map_groups(verify_group, batch_format="pyarrow"))


def _members_to_pairs(mt: pa.Table, threshold: float, all_pairs: bool,
                      max_bucket: int) -> pa.Table:
    """Colliding-bucket member rows -> verified (a < b) pairs.

    Star pairing (min-id rep vs rest) for clustering; ``all_pairs`` for a
    complete listing. Verification = signature-agreement Jaccard estimate,
    identical math to the round-1 in-group version. ``max_bucket`` caps the
    quadratic blowup on hot buckets."""
    if mt.num_rows == 0 or "bucket" not in mt.column_names:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    buckets = mt["bucket"].to_numpy(zero_copy_only=False)
    ids = mt["doc_id"].to_numpy(zero_copy_only=False)
    sig_col = mt["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    sigs = sig_col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(-1, NUM_PERMS)
    order = np.lexsort((ids, buckets))
    buckets, ids, sigs = buckets[order], ids[order], sigs[order]
    starts = np.nonzero(np.r_[True, buckets[1:] != buckets[:-1]])[0]
    ends = np.r_[starts[1:], len(buckets)]
    out_a: list[int] = []
    out_b: list[int] = []
    for s, e in zip(starts, ends):
        uniq, first = np.unique(ids[s:e], return_index=True)
        if len(uniq) < 2:
            continue
        uniq = uniq[:max_bucket]
        sg = sigs[s:e][first][:max_bucket]
        if all_pairs:
            ii, jj = np.triu_indices(len(uniq), k=1)
            est = (sg[ii] == sg[jj]).mean(axis=1)
            kp = est >= threshold
            out_a.extend(uniq[ii[kp]].tolist())
            out_b.extend(uniq[jj[kp]].tolist())
        else:
            est = (sg[1:] == sg[0][None, :]).mean(axis=1)
            kp = est >= threshold
            out_a.extend([int(uniq[0])] * int(kp.sum()))
            out_b.extend(uniq[1:][kp].tolist())
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64())})


def _simhash_members_to_pairs(mt: pa.Table, max_hamming: int) -> pa.Table:
    """Colliding-bucket member rows (bucket, doc_id, simhash) -> verified
    star pairs with true hamming distance ≤ ``max_hamming``. Correct on any
    union of whole buckets (the :func:`_verified_pairs` kernel contract)."""
    if mt.num_rows == 0 or "bucket" not in mt.column_names:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    buckets = mt["bucket"].to_numpy(zero_copy_only=False)
    ids = mt["doc_id"].to_numpy(zero_copy_only=False)
    hs = mt["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.lexsort((ids, buckets))
    buckets, ids, hs = buckets[order], ids[order], hs[order]
    starts = np.nonzero(np.r_[True, buckets[1:] != buckets[:-1]])[0]
    ends = np.r_[starts[1:], len(buckets)]
    out_a: list[int] = []
    out_b: list[int] = []
    for s, e in zip(starts, ends):
        uniq, first = np.unique(ids[s:e], return_index=True)
        if len(uniq) < 2:
            continue
        seg = hs[s:e][first]
        x = seg[1:] ^ seg[0]
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                            axis=1).sum(axis=1)
        kp = uniq[1:][ham <= max_hamming]
        out_a.extend([int(uniq[0])] * len(kp))
        out_b.extend(kp.tolist())
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64())})


def minhash_candidate_pairs(ds: rd.Dataset, threshold: float = 0.7,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            all_pairs: bool = False,
                            max_bucket: int = 256,
                            approx_rows: int | None = None) -> pa.Table:
    """Verified LSH candidate pairs, two-pass (scale notes in module doc):

    1. light band rows -> bucket-size aggregate -> hot buckets;
    2. recompute with the hot set shipped in the (worker-cached) task
       closure, keep only colliding members (bounded by duplicate
       families), verify with the vectorized signature kernel — on the
       driver below ``LOCAL_VERIFY_MAX_ROWS`` member rows, else inside a
       bounded-group-count ``groupby("part")`` so member signatures never
       centralize (VERDICT r2 #1).

    Replaces the round-1 shape (signatures carried through the shuffle +
    one Python ``map_groups`` call per bucket — 80k buckets at sf0.1 made
    per-group overhead the bottleneck, and 99% of groups were singletons).
    Band stages run as task pools — their only state is the compiled hash
    tables cached per worker process (CLAUDE.md: task pools beat actor
    pools for light state).
    """
    light = ds.map_batches(MinHashBandStage(id_col, text_col),
                           batch_format="pyarrow")
    hot, member_rows = _hot_buckets(light, approx_rows)
    if len(hot) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    full = ds.map_batches(
        MinHashBandStage(id_col, text_col, carry_sig=True, hot=hot),
        batch_format="pyarrow")

    def kernel(mt: pa.Table) -> pa.Table:
        return _members_to_pairs(mt, threshold, all_pairs, max_bucket)

    # a complete pair listing (all_pairs — the ngram verification feed)
    # must not be star-compressed; cluster-forming callers may be
    return _verified_pairs(full, kernel, member_rows,
                           compress_reduction=not all_pairs)


SMALL_REP_MAP = 100_000


def rep_map_from_pairs(pair_tbl: pa.Table) -> dict[int, int]:
    """Union-find over PAIR MEMBERS only -> member -> min-id representative.

    Identity entries are dropped, so the map's size is bounded by the number
    of docs that actually collided — never the corpus.
    """
    uf = UnionFind()
    if "a" in pair_tbl.column_names and pair_tbl.num_rows:
        for a, b in zip(pair_tbl["a"].to_pylist(), pair_tbl["b"].to_pylist()):
            uf.union(int(a), int(b))
    rep_of: dict[int, int] = {}
    for members in uf.groups().values():
        rep = min(members)
        for m in members:
            if m != rep:
                rep_of[m] = rep
    return rep_of


def assign_reps(ds: rd.Dataset, rep_of: dict[int, int],
                id_col: str = "doc_id",
                rep_col: str = "rep_id") -> rd.Dataset:
    """Distributed cluster assignment: broadcast the (small) member->rep map,
    default rep=self in ``map_batches`` — replaces the round-1 driver
    ``take_all()`` of the full id column (VERDICT r1 "What's wrong" #2).

    The map ships as two sorted int64 arrays and the full-corpus pass is one
    ``np.searchsorted`` gather per batch — no per-row Python (VERDICT r2 #3).
    Small maps ship in the task closure (serialized function is cached per
    worker process); large ones go through ``ray.put`` + an actor pool so
    the arrays deserialize once per actor.
    """
    members = np.fromiter(rep_of.keys(), dtype=np.int64, count=len(rep_of))
    reps = np.fromiter(rep_of.values(), dtype=np.int64, count=len(rep_of))
    order = np.argsort(members)
    members, reps = members[order], reps[order]

    def assign_fn(mem: np.ndarray, rp: np.ndarray):
        def assign(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out = ids.copy()
            if len(mem):
                pos = np.searchsorted(mem, ids)
                pos[pos == len(mem)] = 0
                hit = mem[pos] == ids
                out[hit] = rp[pos[hit]]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             rep_col: pa.array(out, pa.int64())})
        return assign

    if len(members) <= SMALL_REP_MAP:
        return ds.map_batches(assign_fn(members, reps),
                              batch_format="pyarrow", batch_size=None)
    arrs_ref = ray.put((members, reps))

    class AssignStage:
        def __init__(self):
            self.fn = assign_fn(*ray.get(arrs_ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            return self.fn(t)

    return ds.map_batches(AssignStage, batch_format="pyarrow",
                          batch_size=None, concurrency=(1, 8))


def minhash_signatures(sf_dir: str) -> rd.Dataset:
    """(doc_id, sig int64[NUM_PERMS]) — the STORABLE near-dup signature
    table: the artifact a 100-TB pipeline persists once so later
    incremental passes band/bucket against it without re-reading text
    (the dedup-family counterpart of ``quantize_embeddings`` /
    ``pq_encode_embeddings``). Deterministic given the corpus; uint64
    lanes stored as int64 bit patterns."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def sigs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64())
        texts = t["text"].to_pylist()
        if not texts:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "sig": pa.array([], pa.list_(pa.int64(), NUM_PERMS))})
        m = np.stack([minhash_sig(word_shingles(x or "")) for x in texts])
        return pa.table({
            "doc_id": ids,
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(m.view(np.int64).reshape(-1), pa.int64()),
                NUM_PERMS)})

    return ds.map_batches(sigs, batch_format="pyarrow")


def minhash_near_dup(sf_dir: str, threshold: float = 0.7) -> rd.Dataset:
    """MinHash/LSH near-duplicate clusters: doc_id -> cluster representative.

    Only the verified pair list (small, post-LSH) reaches the driver; the
    union-find runs over pair members only and the member->rep map is
    broadcast back for a distributed assignment pass (default rep=self).
    """
    return assign_reps(_load_docs(sf_dir, ["doc_id"]),
                       _minhash_rep_map(sf_dir, threshold))


def _minhash_rep_map(sf_dir: str, threshold: float = 0.7) -> dict[int, int]:
    """member doc_id -> cluster rep for the minhash family (shared by the
    cluster output and the ``cluster_ok`` validity twin)."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])
    pair_tbl = minhash_candidate_pairs(
        ds, threshold, approx_rows=_doc_count(sf_dir) * BANDS)
    return rep_map_from_pairs(pair_tbl)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_dup(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """SimHash near-dup clusters via pigeonhole banding.

    64 bits split into ``max_hamming+1`` bands: any pair within the hamming
    budget collides on ≥1 exact band (pigeonhole), so candidate generation is
    a plain groupby(band, band_bits); verification checks true hamming
    distance inside the group. Only verified pairs reach the driver; cluster
    assignment is distributed (:func:`assign_reps`).
    """
    rep_of = _simhash_rep_map(sf_dir, max_hamming)
    return assign_reps(_load_docs(sf_dir, ["doc_id"]), rep_of)


def _simhash_rep_map(sf_dir: str, max_hamming: int = 3) -> dict[int, int]:
    """member doc_id -> cluster rep for the simhash family (shared by the
    cluster output and the ``cluster_ok`` validity twin)."""
    n_bands = max_hamming + 1
    width = 64 // n_bands

    band_seed = np.arange(n_bands, dtype=np.uint64) * _GOLDEN  # wraps (array)

    def _band_buckets(hs: np.ndarray) -> np.ndarray:
        """[n] simhashes -> [n, n_bands] folded (band, segment) buckets.
        The int64 reinterpret wraps the unsigned fold — safe even at band
        width 64 (max_hamming=0), where int64() would overflow."""
        n = len(hs)
        keys = np.empty((n, n_bands), dtype=np.uint64)
        for b in range(n_bands):
            lo = b * width
            hi = 64 if b == n_bands - 1 else lo + width
            mask = np.uint64((1 << (hi - lo)) - 1)
            keys[:, b] = _mix64(((hs >> np.uint64(lo)) & mask) + band_seed[b])
        return keys

    class SimBandStage:
        def __init__(self, carry_hash: bool = False,
                     hot: np.ndarray | None = None):
            self.carry_hash = carry_hash
            self.hot = np.sort(hot) if hot is not None else None

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t["text"].to_pylist()
            n = len(texts)
            cols: dict = {}
            if n == 0:
                cols["bucket"] = pa.array([], pa.int64())
                cols["doc_id"] = pa.array([], pa.int64())
                if self.carry_hash:
                    cols["simhash"] = pa.array([], pa.int64())
                return pa.table(cols)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            hs = np.fromiter((simhash64(x or "") for x in texts),
                             dtype=np.uint64,
                             count=n)
            flat_bucket = _band_buckets(hs).reshape(-1).view(np.int64)
            flat_doc = np.repeat(ids, n_bands)
            keep = (np.isin(flat_bucket, self.hot)
                    if self.hot is not None else slice(None))
            cols["bucket"] = pa.array(flat_bucket[keep], pa.int64())
            cols["doc_id"] = pa.array(flat_doc[keep], pa.int64())
            if self.carry_hash:
                cols["simhash"] = pa.array(
                    np.repeat(hs.view(np.int64), n_bands)[keep], pa.int64())
            return pa.table(cols)

    ds = _load_docs(sf_dir, ["doc_id", "text"])
    light = ds.map_batches(SimBandStage(), batch_format="pyarrow")
    hot, member_rows = _hot_buckets(light, _doc_count(sf_dir) * n_bands)
    rep_of: dict[int, int] = {}
    if len(hot):
        members = ds.map_batches(SimBandStage(carry_hash=True, hot=hot),
                                 batch_format="pyarrow")

        def kernel(mt: pa.Table) -> pa.Table:
            return _simhash_members_to_pairs(mt, max_hamming)

        rep_of = rep_map_from_pairs(_verified_pairs(members, kernel,
                                                    member_rows))
    return rep_of


# ---------------------------------------------------------------------------
# Cluster-validity twins (VERDICT r3 item 6)
# ---------------------------------------------------------------------------
# Near-dup CLUSTERS are permutation-dependent (rows-only by design), but
# cluster VALIDITY is oracle-checkable: every member of a non-singleton
# cluster must have at least one OTHER member of its cluster within the
# similarity budget, recomputed EXACTLY from text (not from the sketch that
# formed the cluster). The Ray side emits (doc_id, cluster_ok) for every
# document; the SQL twin pins cluster_ok=1 for all rows. Chain-safe: a
# transitive a-b-c merge keeps a valid via b even when sim(a, c) is low.
#
# MinHash needs a tolerance below the clustering threshold: pair
# verification is signature-estimated (NUM_PERMS=64 perms, std ~0.06 at
# J=0.7), so a genuinely verified pair's EXACT Jaccard can sit a few sigma
# under the threshold. SimHash verification is exact, so no tolerance.
MINHASH_OK_TOLERANCE = 0.25
CLUSTER_OK_PARTS = 64


def _cluster_invalid_ids(member_rows: rd.Dataset, rep_of: dict[int, int],
                         sig_col: str, decode, pair_ok) -> np.ndarray:
    """Doc ids of members with NO in-cluster neighbor passing ``pair_ok``.

    ``member_rows`` holds (doc_id, <sig_col>) for every member (reps
    included). Clusters are gathered whole via a bounded-part shuffle on
    rep_id (the :func:`_verified_pairs` placement), one segmented kernel per
    part; only failing ids (normally zero) reach the driver.
    """
    mem = np.fromiter(rep_of.keys(), np.int64, count=len(rep_of))
    rep = np.fromiter(rep_of.values(), np.int64, count=len(rep_of))
    reps_u = np.unique(rep)
    mem_all = np.r_[mem, reps_u]          # identity rows complete clusters
    rep_all = np.r_[rep, reps_u]
    order = np.argsort(mem_all)
    map_ref = ray.put((mem_all[order], rep_all[order]))
    pmask = np.uint64(CLUSTER_OK_PARTS - 1)

    def add_part(t: pa.Table) -> pa.Table:
        m, r = ray.get(map_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        rp = r[np.searchsorted(m, ids)]   # every row IS a member
        part = (_mix64(rp.astype(np.uint64)) & pmask).astype(np.int32)
        t = t.append_column("rep_id", pa.array(rp, pa.int64()))
        return t.append_column("part", pa.array(part, pa.int32()))

    def kern(g: pa.Table) -> pa.Table:
        g = g.sort_by([("rep_id", "ascending"), ("doc_id", "ascending")])
        reps_np = g["rep_id"].to_numpy(zero_copy_only=False)
        ids_np = g["doc_id"].to_numpy(zero_copy_only=False)
        raw = g[sig_col].to_pylist()
        starts = np.nonzero(np.r_[True, reps_np[1:] != reps_np[:-1]])[0]
        ends = np.r_[starts[1:], len(reps_np)]
        bad: list[int] = []
        for s, e in zip(starts, ends):
            seg = [decode(x) for x in raw[s:e]]
            for i in range(e - s):
                if not any(i != j and pair_ok(seg[i], seg[j])
                           for j in range(e - s)):
                    bad.append(int(ids_np[s + i]))
        return pa.table({"doc_id": pa.array(bad, pa.int64())})

    out = (member_rows.map_batches(add_part, batch_format="pyarrow",
                                   batch_size=None)
           .groupby("part").map_groups(kern, batch_format="pyarrow"))
    tbl = collect_table(out)
    if "doc_id" not in tbl.column_names or tbl.num_rows == 0:
        return np.empty(0, dtype=np.int64)
    return tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)


def _cluster_ok_dataset(sf_dir: str, bad_ids: np.ndarray) -> rd.Dataset:
    """(doc_id, cluster_ok) over ALL documents; singleton docs are trivially
    ok, members flagged by ``bad_ids`` (tiny; broadcast in the closure)."""
    bad_sorted = np.sort(bad_ids)

    def flag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        okv = ~np.isin(ids, bad_sorted)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "cluster_ok": pa.array(okv.astype(np.int64),
                                                pa.int64())})

    return _load_docs(sf_dir, ["doc_id"]).map_batches(
        flag, batch_format="pyarrow", batch_size=None)


def minhash_cluster_ok(sf_dir: str, threshold: float = 0.7,
                       tolerance: float = MINHASH_OK_TOLERANCE) -> rd.Dataset:
    """(doc_id, cluster_ok): every minhash-cluster member has an in-cluster
    neighbor with EXACT word-3-gram Jaccard ≥ threshold - tolerance."""
    rep_of = _minhash_rep_map(sf_dir, threshold)
    bad = np.empty(0, dtype=np.int64)
    if rep_of:
        ds = _load_docs(sf_dir, ["doc_id", "text"])
        members = np.unique(np.r_[
            np.fromiter(rep_of.keys(), np.int64, count=len(rep_of)),
            np.fromiter(rep_of.values(), np.int64, count=len(rep_of))])
        srows = _member_shingle_rows(ds, members)
        min_j = threshold - tolerance

        def decode(blob: bytes) -> np.ndarray:
            return np.frombuffer(blob, dtype=np.uint64)

        def ok(xa: np.ndarray, xb: np.ndarray) -> bool:
            inter = len(np.intersect1d(xa, xb, assume_unique=True))
            union = len(xa) + len(xb) - inter
            return (inter / union if union else 1.0) >= min_j

        bad = _cluster_invalid_ids(srows, rep_of, "shingles", decode, ok)
    return _cluster_ok_dataset(sf_dir, bad)


def simhash_cluster_ok(sf_dir: str, max_hamming: int = 3) -> rd.Dataset:
    """(doc_id, cluster_ok): every simhash-cluster member has an in-cluster
    neighbor within EXACT hamming ≤ max_hamming (recomputed from text)."""
    rep_of = _simhash_rep_map(sf_dir, max_hamming)
    bad = np.empty(0, dtype=np.int64)
    if rep_of:
        ds = _load_docs(sf_dir, ["doc_id", "text"])
        members = np.unique(np.r_[
            np.fromiter(rep_of.keys(), np.int64, count=len(rep_of)),
            np.fromiter(rep_of.values(), np.int64, count=len(rep_of))])
        members_ref = ray.put(np.sort(members))

        def sim_rows(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(np.isin(ids, ray.get(members_ref))))
            hs = np.fromiter((simhash64(x) for x in t["text"].to_pylist()),
                             dtype=np.uint64, count=t.num_rows)
            return pa.table({"doc_id": t["doc_id"],
                             "simhash": pa.array(hs.view(np.int64),
                                                 pa.int64())})

        hrows = ds.map_batches(sim_rows, batch_format="pyarrow")

        def decode(h: int) -> int:
            return h

        def ok(ha: int, hb: int) -> bool:
            return bin((ha ^ hb) & 0xFFFF_FFFF_FFFF_FFFF).count("1") \
                <= max_hamming

        bad = _cluster_invalid_ids(hrows, rep_of, "simhash", decode, ok)
    return _cluster_ok_dataset(sf_dir, bad)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via distributed pair join
# ---------------------------------------------------------------------------

# Above this many colliding members the exact-Jaccard verification runs as
# two partitioned hash joins of the pair list against the distributed
# member-shingle table (shingle sets never centralize); below it the member
# shingles are collected and verified on the driver (one task round-trip —
# each join's shuffle setup costs seconds on inputs whose pair list fits in
# one block).
NGRAM_LOCAL_VERIFY_MAX_MEMBERS = 100_000


def _member_shingle_rows(ds: rd.Dataset, members: np.ndarray) -> rd.Dataset:
    """(doc_id, shingles) for just the candidate members — one distributed
    filter pass; shingle sets travel as binary blobs (uint64 LE bytes)
    because Arrow hash joins don't support list-typed payload columns."""
    members_ref = ray.put(np.sort(members))

    def shingle_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(ids, ray.get(members_ref))))
        out_ids, sets_ = [], []
        for i, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            out_ids.append(i)
            sets_.append(word_shingles(text or "").tobytes())
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "shingles": pa.array(sets_, pa.binary())})

    return ds.map_batches(shingle_rows, batch_format="pyarrow")


def _jaccard_of_blobs(sa: bytes, sb: bytes, threshold: float):
    """Exact Jaccard of two binary shingle blobs; None when below threshold.
    Half-up rounding — same IEEE ops as the DuckDB oracle's
    ``FLOOR(x*1e4+0.5)/1e4``."""
    import math
    xa = set(np.frombuffer(sa, dtype=np.uint64).tolist())
    xb = set(np.frombuffer(sb, dtype=np.uint64).tolist())
    union = len(xa | xb)
    jac = (len(xa & xb) / union) if union else 1.0
    if jac < threshold:
        return None
    return math.floor(jac * 10000.0 + 0.5) / 10000.0


def _ngram_verify_join(ds: rd.Dataset, pair_ds: rd.Dataset,
                       members: np.ndarray, threshold: float,
                       num_partitions: int = 16) -> rd.Dataset:
    """Scale-path verification: pair list ⋈ member shingles twice, then a
    per-row exact-Jaccard filter — shingle sets AND the pair list stay
    distributed end to end (VERDICT r2 #1; the r1 join shape, restored
    above the member threshold). ``members`` (distinct pair endpoints,
    node-sized) is the one broadcast array.
    """
    shingles = _member_shingle_rows(ds, members)
    # fractional-CPU aggregators: hash-join shuffle actors must never
    # reserve whole cores, or back-to-back joins deadlock (CLAUDE.md)
    agg_args = {"num_cpus": 0.05}
    j1 = pair_ds.join(shingles, join_type="inner",
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
            jac = _jaccard_of_blobs(sa, sb, threshold)
            if jac is not None:
                a_ids.append(a)
                b_ids.append(b)
                jacs.append(jac)
        return pa.table({"a": pa.array(a_ids, pa.int64()),
                         "b": pa.array(b_ids, pa.int64()),
                         "jac": pa.array(jacs, pa.float64())})

    return j2.map_batches(verify, batch_format="pyarrow")


# reserved candidate bucket for token-less documents (a real-hash
# coincidence is ~2^-64 and harmless — candidates are verified exactly)
_EMPTY_SHINGLE_BUCKET = np.int64(-0x7FFFFFFFFFFFFFF7)


def _shingle_prefix_stage(threshold: float, hot: np.ndarray | None = None):
    """(bucket, doc_id) rows keyed by PREFIX shingle hashes — prefix
    filtering (Bayardo, Ma & Srikant 2007): for Jaccard ≥ t, a qualifying
    pair must share a shingle inside BOTH docs' prefixes of length
    ``|S| - ceil(t*|S|) + 1`` under a global order (the hash order here),
    so candidate recall is EXACT — unlike minhash banding, which misses a
    J≈t pair with probability (1-t^r)^b (found by oracle fuzzing on a
    near-threshold-heavy corpus). Hash order approximates the random
    tie-break of classic prefix filtering; frequency-ascending order would
    shrink hot buckets further at web scale."""
    import math as _math
    hot_sorted = np.sort(hot) if hot is not None else None

    def stage(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_b: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for i, text in enumerate(t["text"].to_pylist()):
            sh = word_shingles(text or "")  # sorted unique uint64
            if len(sh) == 0:
                # token-less docs are pairwise J=1.0 duplicates (the twin's
                # nu=0 -> 1.0 rule): co-locate them in one reserved bucket
                out_b.append(np.array([_EMPTY_SHINGLE_BUCKET],
                                      dtype=np.int64))
                out_d.append(np.array([ids[i]], dtype=np.int64))
                continue
            ln = len(sh) - _math.ceil(threshold * len(sh)) + 1
            pref = sh[:ln].view(np.int64)
            out_b.append(pref)
            out_d.append(np.full(len(pref), ids[i], dtype=np.int64))
        if not out_b:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        b, d = np.concatenate(out_b), np.concatenate(out_d)
        if hot_sorted is not None:
            m = np.isin(b, hot_sorted)
            b, d = b[m], d[m]
        return pa.table({"bucket": pa.array(b, pa.int64()),
                         "doc_id": pa.array(d, pa.int64())})

    return stage


def _bucket_all_pairs(mt: pa.Table) -> pa.Table:
    """Colliding-bucket member rows -> ALL distinct (a < b) in-bucket
    pairs, vectorized (segmented pair expansion, no per-bucket Python, no
    quadratic cap — exactness requires the complete listing)."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if mt.num_rows == 0 or "bucket" not in mt.column_names:
        return empty
    from .graph import _segmented_pairs
    b = mt["bucket"].to_numpy(zero_copy_only=False)
    d = mt["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, b))
    b, d = b[order], d[order]
    first = np.r_[True, (b[1:] != b[:-1]) | (d[1:] != d[:-1])]
    b, d = b[first], d[first]
    seg_lens = np.diff(np.r_[
        np.nonzero(np.r_[True, b[1:] != b[:-1]])[0], len(b)])
    lo, hi = _segmented_pairs(d, seg_lens)
    if len(lo) == 0:
        return empty
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    return pa.table({"a": pa.array(pairs[:, 0], pa.int64()),
                     "b": pa.array(pairs[:, 1], pa.int64())})


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> rd.Dataset:
    """Pairs with *exact* word-3-gram Jaccard ≥ threshold.

    Candidates from PREFIX FILTERING over the shingle hashes
    (:func:`_shingle_prefix_stage` — exact recall by construction; the
    earlier minhash-banding candidates missed near-threshold pairs with
    probability (1-t^r)^b), then exact verification over just the
    candidate members' shingle sets. Placement is adaptive, three regimes:

    - colliding-member band rows > ``LOCAL_VERIFY_MAX_ROWS``: FULLY
      distributed — candidate pairs are generated inside the bounded-part
      shuffle, deduplicated with a distributed groupby, and verified via
      the two-join path; only the distinct-endpoint array (node-sized)
      ever reaches the driver.
    - members > ``NGRAM_LOCAL_VERIFY_MAX_MEMBERS``: candidate pairs fit on
      the driver but shingle sets do not — driver pair list, distributed
      join verification.
    - otherwise: member shingles are gathered with one distributed filter
      pass and verified on the driver (fastest at bench scale).

    Output: a, b, jac (rounded half-up to 4, same IEEE ops as the DuckDB
    oracle). NULL-text documents have no shingles and no candidacy — they
    are excluded outright (the twin filters them the same way; raw SQL
    NULL propagation would pair NULL docs with empty docs but not with
    each other, which is not a usable dedup semantic).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["text"])),
        batch_format="pyarrow")
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jac": pa.array([], pa.float64())})
    light = ds.map_batches(_shingle_prefix_stage(threshold),
                           batch_format="pyarrow")
    hot, member_rows = _hot_buckets(
        light, _prefix_rows_estimate(sf_dir, threshold))
    if len(hot) == 0:
        return rd.from_arrow(empty)
    full = ds.map_batches(_shingle_prefix_stage(threshold, hot=hot),
                          batch_format="pyarrow")

    def kernel(mt: pa.Table) -> pa.Table:
        # complete pair listing: all in-bucket pairs, deduped across
        # buckets downstream
        return _bucket_all_pairs(mt)

    if member_rows > LOCAL_VERIFY_MAX_ROWS:
        raw_ds = _verified_pairs_ds(full, kernel)
        # cross-part dedup (bands of one pair can land in different parts)
        pair_ds = raw_ds.groupby(["a", "b"]).count() \
            .select_columns(["a", "b"])

        def endpoint_partial(t: pa.Table) -> pa.Table:
            u = np.unique(np.concatenate(
                [t["a"].to_numpy(zero_copy_only=False),
                 t["b"].to_numpy(zero_copy_only=False)]))
            return pa.table({"m": pa.array(u, pa.int64())})

        et = collect_table(pair_ds.map_batches(endpoint_partial,
                                               batch_format="pyarrow",
                                               batch_size=None))
        if et.num_rows == 0 or "m" not in et.column_names:
            return rd.from_arrow(empty)
        members = np.unique(et["m"].to_numpy(zero_copy_only=False))
        return _ngram_verify_join(ds, pair_ds, members, threshold)

    raw = kernel(collect_table(full))
    if raw.num_rows == 0:
        return rd.from_arrow(empty)
    pairs = np.unique(np.stack([raw["a"].to_numpy(zero_copy_only=False),
                                raw["b"].to_numpy(zero_copy_only=False)],
                               axis=1), axis=0)
    members = np.unique(pairs)
    if len(members) > NGRAM_LOCAL_VERIFY_MAX_MEMBERS:
        pair_ds = rd.from_arrow(pa.table({
            "a": pa.array(pairs[:, 0], pa.int64()),
            "b": pa.array(pairs[:, 1], pa.int64())}))
        return _ngram_verify_join(ds, pair_ds, members, threshold)

    mt = collect_table(_member_shingle_rows(ds, members))
    sh_of = {int(i): s for i, s in zip(mt["doc_id"].to_pylist(),
                                       mt["shingles"].to_pylist())}
    a_ids, b_ids, jacs = [], [], []
    for a, b in pairs:
        jac = _jaccard_of_blobs(sh_of[int(a)], sh_of[int(b)], threshold)
        if jac is not None:
            a_ids.append(int(a))
            b_ids.append(int(b))
            jacs.append(jac)
    return rd.from_arrow(pa.table({"a": pa.array(a_ids, pa.int64()),
                                   "b": pa.array(b_ids, pa.int64()),
                                   "jac": pa.array(jacs, pa.float64())}))


# ---------------------------------------------------------------------------
# Incremental dedup against a prior corpus snapshot (Bloom prefilter +
# exact verification) — the crawl-over-crawl pattern: dedup today's shard
# against yesterday's corpus WITHOUT joining the two corpora.
# ---------------------------------------------------------------------------

def incremental_dedup(sf_dir: str) -> rd.Dataset:
    """Flag each NEW document as a duplicate of the PRIOR snapshot or novel.

    Snapshots are carved deterministically from the documents table (prior =
    even doc_id, new = odd) so the operator is self-contained on testdata;
    real deployments pass two corpus paths through the same three passes:

    1. prior pass: per-block partial Bloom adds over 64-bit text hashes,
       shipped as NONZERO words only (k x block-rows words max); driver ORs
       into one filter, broadcast once. The prior corpus text never moves.
    2. new pass: Bloom probe per row. Bloom-negative rows are PROVABLY novel
       (no false negatives) and never re-checked; only bloom-positive rows
       (true dups + ~1% FP) emit (doc_id, h64, full 128-bit hash) candidate
       rows — the collect is bounded by dup_rate x new + FP x new, never
       the corpus.
    3. prior verification pass: gather the distinct 128-bit hashes of prior
       rows whose h64 is in the (broadcast) candidate h64 set; a candidate
       is a duplicate iff its 128-bit hash is among them — exactness does
       not rest on the sketch (same premise as :func:`exact_dedup`).
    4. assignment pass over the new snapshot's doc_id column ONLY (8 B/row
       read): is_dup = membership in the broadcast verified-dup id array —
       the :func:`assign_reps` broadcast shape, nothing corpus-sized on the
       driver.

    Output: (doc_id, is_dup) for every new doc. DuckDB twin: EXISTS over
    text equality.
    """
    from .sketches import BloomFilter

    def parity_filter(parity: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(
                pc.bit_wise_and(pc.cast(t["doc_id"], pa.int64()),
                                pa.scalar(1, pa.int64())),
                pa.scalar(parity, pa.int64())))
        return f

    prior = _load_docs(sf_dir, ["doc_id", "text"]).map_batches(
        parity_filter(0), batch_format="pyarrow", batch_size=None)
    new = _load_docs(sf_dir, ["doc_id", "text"]).map_batches(
        parity_filter(1), batch_format="pyarrow", batch_size=None)
    n_prior = _doc_count(sf_dir) // 2 + 1

    def bloom_partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter.for_keys(n_prior)
        bf.add_hashes(_text_bucket64(t["text"]))
        idx, words = bf.sparse_words()
        return pa.table({"idx": pa.array(idx, pa.int64()),
                         "word": pa.array(words.view(np.int64), pa.int64())})

    parts = collect_table(prior.map_batches(bloom_partial,
                                            batch_format="pyarrow",
                                            batch_size=None))
    bloom = BloomFilter.for_keys(n_prior)
    if parts.num_rows and "idx" in parts.column_names:
        bloom.or_sparse(parts["idx"].to_numpy(zero_copy_only=False),
                        parts["word"].to_numpy(zero_copy_only=False)
                        .view(np.uint64))
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        h64 = _text_bucket64(t["text"])
        keep = bf.contains(h64)
        t = t.filter(pa.array(keep))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "h64": pa.array(h64[keep].view(np.int64), pa.int64()),
            "h128": pa.array([_content_h(x)
                              for x in t["text"].to_pylist()], pa.string()),
        })

    cands = collect_table(new.map_batches(probe, batch_format="pyarrow",
                                          batch_size=None))
    dup_ids = np.empty(0, dtype=np.int64)
    if cands.num_rows and "doc_id" in cands.column_names:
        cand_ref = ray.put(np.unique(
            cands["h64"].to_numpy(zero_copy_only=False)))

        def verify_rows(t: pa.Table) -> pa.Table:
            hit = np.isin(_text_bucket64(t["text"]).view(np.int64),
                          ray.get(cand_ref))
            t = t.filter(pa.array(hit))
            return pa.table({"h128": pa.array(
                [_content_h(x) for x in t["text"].to_pylist()],
                pa.string())})

        vt = collect_table(prior.map_batches(verify_rows,
                                             batch_format="pyarrow",
                                             batch_size=None))
        prior_h128: set[str] = (set(vt["h128"].to_pylist())
                                if vt.num_rows and "h128" in vt.column_names
                                else set())
        if prior_h128:
            mask = np.array([h in prior_h128
                             for h in cands["h128"].to_pylist()], dtype=bool)
            dup_ids = np.sort(
                cands["doc_id"].to_numpy(zero_copy_only=False)[mask])

    new_ids = _load_docs(sf_dir, ["doc_id"]).map_batches(
        parity_filter(1), batch_format="pyarrow", batch_size=None)

    def assign(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "is_dup": pa.array(np.isin(ids, dup_ids))})

    return new_ids.map_batches(assign, batch_format="pyarrow",
                               batch_size=None)


# ---------------------------------------------------------------------------
# Cross-document duplicated n-gram spans (substring-level dedup signal —
# the Lee et al. "Deduplicating Training Data" idea at word-n-gram
# granularity: how much of each document is text that also appears
# verbatim elsewhere in the corpus)
# ---------------------------------------------------------------------------

def _window_hash_stream(
        t: pa.Table, window: int
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Token + window-hash stream for the span ops, fully vectorized:
    split -> flatten -> dictionary-encode, token ids via the memoized
    blake2b cache ONCE PER DISTINCT TOKEN, positional odd-multiplier
    combine + splitmix64 (same hash family as :func:`word_shingles`), row
    boundaries respected via parent indices.

    Returns ``(tok_par, toks, win_rows, win_starts, win_hashes)``:
    ``tok_par[i]`` is the batch row of kept (non-empty, lowercased) token
    ``toks[i]``; each window is identified by its start index into that
    kept-token stream (windows crossing a document boundary are dropped).
    """
    low = pc.utf8_lower(t["text"])
    parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    empty = np.empty(0, dtype=np.int64)
    empty_s = pa.array([], pa.string())
    if len(flat) == 0:
        return empty, empty_s, empty, empty, empty
    parents = pc.list_parent_indices(parts) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.nonzero(pc.not_equal(flat, "")
                      .to_numpy(zero_copy_only=False))[0]
    if len(keep) == 0:
        return empty, empty_s, empty, empty, empty
    toks = flat.take(pa.array(keep, pa.int64()))
    par = parents[keep]
    if len(keep) < window:
        return par, toks, empty, empty, empty
    enc = toks.dictionary_encode()
    vocab_ids = _token_ids(enc.dictionary.to_pylist())
    ids = vocab_ids[enc.indices.to_numpy(zero_copy_only=False)]
    n = len(ids) - window + 1
    acc = np.full(n, window, dtype=np.uint64)
    mult = _pos_mults(window)
    for j in range(window):
        acc += ids[j:j + n] * mult[j]
    hashes = (_mix64(acc)
              & np.uint64(0x7FFF_FFFF_FFFF_FFFF)).astype(np.int64)
    valid = par[:n] == par[window - 1:]  # window inside one document
    starts = np.nonzero(valid)[0].astype(np.int64)
    return par, toks, par[starts], starts, hashes[valid]


def _window_hashes_batch(t: pa.Table, window: int
                         ) -> tuple[np.ndarray, np.ndarray]:
    """(row_index, hash) per ``window``-token span (see
    :func:`_window_hash_stream`)."""
    _par, _toks, win_rows, _starts, win_hashes = \
        _window_hash_stream(t, window)
    return win_rows, win_hashes


def _distinct_span_buckets(t: pa.Table, window: int) -> pa.Table:
    """Pass-1 light partial shared by the span ops: one ``bucket`` row per
    per-document-DISTINCT window hash, so the downstream count aggregate
    is distinct-documents-per-span (a doc is never split across batches)."""
    win_rows, win_hash = _window_hashes_batch(t, window)
    if len(win_hash) == 0:
        return pa.table({"bucket": pa.array([], pa.int64())})
    order = np.lexsort((win_hash, win_rows))
    r, h = win_rows[order], win_hash[order]
    first = np.r_[True, (r[1:] != r[:-1]) | (h[1:] != h[:-1])]
    return pa.table({"bucket": pa.array(h[first], pa.int64())})


def dup_span_counts(sf_dir: str, window: int = 8) -> rd.Dataset:
    """Per-document count of ``window``-token spans that also occur in at
    least one OTHER document: (doc_id, n_dup_windows), every doc included.

    Two-pass hot-bucket shape (the dedup family's scale pattern): pass 1
    shuffles only 8-byte span hashes, deduplicated per document inside the
    batch so the count aggregate IS distinct-documents-per-span; only spans
    hot across ≥2 docs are broadcast; pass 2 re-derives each doc's window
    hashes and counts membership with one ``np.isin``. Span identity is the
    64-bit hash of the token sequence — cross-engine-equal to the DuckDB
    string-gram twin up to hash collisions (~n²/2⁶³, negligible below
    ~10⁹ distinct spans; the twin is exact strings).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    class SpanStage:
        def __init__(self, hot: np.ndarray | None = None):
            self.hot = np.sort(hot) if hot is not None else None

        def __call__(self, t: pa.Table) -> pa.Table:
            if self.hot is None:
                return _distinct_span_buckets(t, window)
            rows, hashes = _window_hashes_batch(t, window)
            hit = np.isin(hashes, self.hot)
            n = np.zeros(t.num_rows, dtype=np.int64)
            if hit.any():
                np.add.at(n, rows[hit], 1)
            return pa.table({"doc_id": t["doc_id"],
                             "n_dup_windows": pa.array(n, pa.int64())})

    light = ds.map_batches(SpanStage(), batch_format="pyarrow",
                           batch_size=None)
    hot, _member_rows = _hot_buckets(
        light, _prefix_rows_estimate(sf_dir, 0.0))
    return ds.map_batches(SpanStage(hot=hot), batch_format="pyarrow",
                          batch_size=None)


def remove_dup_spans(sf_dir: str, window: int = 8) -> rd.Dataset:
    """Substring-level dedup REWRITE (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", 2022 — at word-n-gram granularity):
    (doc_id, kept_text), where kept_text is the normalized token stream
    with every token covered by a cross-document duplicated ``window``-span
    removed (a span is duplicated iff its exact token sequence occurs in
    ≥ 2 distinct documents).

    Same two-pass hot-bucket shape as :func:`dup_span_counts` — pass 1
    shuffles only per-doc-distinct 8-byte span hashes, pass 2 re-derives
    each doc's windows, marks coverage with one difference-array cumsum
    (union of overlapping hit windows, no per-span Python), and rebuilds
    the surviving text with Arrow list offsets + ``binary_join``. Span
    identity is the 64-bit token-sequence hash (collision odds ~n²/2⁶³ —
    negligible below ~10⁹ distinct spans; the DuckDB twin is exact
    strings)."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    light_ds = ds.map_batches(lambda t: _distinct_span_buckets(t, window),
                              batch_format="pyarrow", batch_size=None)
    hot, _ = _hot_buckets(light_ds, _prefix_rows_estimate(sf_dir, 0.0))
    hot = np.sort(hot)

    class Rewrite:
        """Sorted hot-span array rides in the task closure (cached per
        worker — the small-broadcast task-pool pattern)."""

        def __init__(self, hot_: np.ndarray):
            self.hot = hot_

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            par, toks, _win_rows, starts, win_hash = \
                _window_hash_stream(t, window)
            n_tok = len(par)
            if n_tok == 0:
                return pa.table({
                    "doc_id": ids,
                    "kept_text": pa.array([""] * t.num_rows, pa.string())})
            hit = starts[np.isin(win_hash, self.hot)]
            diff = np.zeros(n_tok + window + 1, dtype=np.int64)
            if len(hit):
                np.add.at(diff, hit, 1)
                np.add.at(diff, hit + window, -1)
            keep_mask = np.cumsum(diff[:n_tok]) == 0
            kept = toks.filter(pa.array(keep_mask))
            counts = np.bincount(par[keep_mask], minlength=t.num_rows)
            offsets = np.r_[0, np.cumsum(counts)]
            la = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), kept)
            return pa.table({
                "doc_id": ids,
                "kept_text": pc.cast(pc.binary_join(la, " "), pa.string())})

    return ds.map_batches(Rewrite(hot), batch_format="pyarrow",
                          batch_size=None)
