"""Distributed sketches: HyperLogLog approximate distinct counting.

The reference has no approximate aggregates (SURVEY §2 "Aggregations"); this
adds the sketch family a 100 TB pipeline needs: per-batch partial sketches
(tiny fixed-size register arrays) merged by element-wise max — the shuffle
moves 2^p bytes per batch instead of one row per distinct value. Plain HLL
with the standard bias-corrected estimator (Flajolet et al., public
algorithm), hashes via blake2b so results are deterministic everywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _hash64(values) -> np.ndarray:
    # integer keys (the common case: user/doc ids) take the vectorized
    # splitmix64 path — the per-value Python blake2b loop below would be
    # the hot cost of every HLL partial at corpus scale; estimates stay
    # inside the sketch's accuracy envelope under either hash family
    arr = np.asarray(values)
    if arr.dtype.kind in "iu" and len(arr):
        from .hashing import splitmix64
        return splitmix64(arr.astype(np.uint64))
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


class HLL:
    """HyperLogLog registers (p bits of bucket index, 64-p of rank)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hs: np.ndarray) -> None:
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hs << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        ranks = np.zeros(len(hs), dtype=np.uint8)
        probe = np.uint64(1) << np.uint64(63)
        rem = rest.copy()
        rank = np.ones(len(hs), dtype=np.uint8)
        alive = np.ones(len(hs), dtype=bool)
        for _ in range(64 - self.p):
            zero_top = (rem & probe) == 0
            step = alive & zero_top
            rank[step] += 1
            alive &= zero_top
            rem = rem << np.uint64(1)
            if not alive.any():
                break
        ranks = rank
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) via distributed HLL partials."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash64(t[column].to_pylist()))
        return pa.table({"registers": pa.array([h.registers.tobytes()],
                                               pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    acc = HLL(p)
    for row in parts:  # tiny: one 2^p-byte row per block
        other = HLL(p)
        other.registers = np.frombuffer(row["registers"], dtype=np.uint8).copy()
        acc.merge(other)
    return acc.estimate()


# ---------------------------------------------------------------------------
# Bloom filter (membership sketch for incremental / cross-snapshot dedup)
# ---------------------------------------------------------------------------

from .hashing import splitmix64 as _mix64  # noqa: E402


class BloomFilter:
    """Standard Bloom filter over uint64 key hashes, double hashing
    (Kirsch-Mitzenmacher: bit_i = h1 + i*h2), vectorized adds/probes.

    Distributed build protocol: per-block partials emit only the NONZERO
    words (``sparse_words``) — bounded by k x block-rows words, never the
    full bit array — and the driver ORs them into one filter that is then
    broadcast once (``ray.put``). At ~10^9 keys the dense array is ~1 GB;
    beyond that, shard the key space by hash prefix and build one filter
    per shard (each pass below is unchanged per shard).
    """

    K = 7  # hash probes -> ~1% FP at 9.6 bits/key

    def __init__(self, m_bits: int):
        self.m_bits = max(64, (m_bits + 63) // 64 * 64)
        self.words = np.zeros(self.m_bits // 64, dtype=np.uint64)

    @classmethod
    def for_keys(cls, n_keys: int) -> "BloomFilter":
        return cls(max(1024, int(n_keys * 9.6)))

    def _positions(self, hs: np.ndarray) -> np.ndarray:
        """[n, K] bit positions per key hash."""
        h1 = hs.astype(np.uint64)
        h2 = _mix64(h1) | np.uint64(1)
        i = np.arange(self.K, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None])
                % np.uint64(self.m_bits)).astype(np.int64)

    def add_hashes(self, hs: np.ndarray) -> None:
        if len(hs) == 0:
            return
        pos = self._positions(hs).reshape(-1)
        np.bitwise_or.at(self.words, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64)
                                          & np.uint64(63)))

    def contains(self, hs: np.ndarray) -> np.ndarray:
        """[n] bool — no false negatives, ~1% false positives at sizing."""
        if len(hs) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hs)
        bits = (self.words[pos >> 6]
                >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=1)

    def sparse_words(self) -> tuple[np.ndarray, np.ndarray]:
        nz = np.nonzero(self.words)[0]
        return nz, self.words[nz]

    def or_sparse(self, idx: np.ndarray, words: np.ndarray) -> None:
        np.bitwise_or.at(self.words, idx, words.astype(np.uint64))


# ---------------------------------------------------------------------------
# Count-Min Sketch (frequency sketch — completes the triad with HLL
# [distinct] and Bloom [membership]): linear, so per-block partial sketches
# merge by elementwise SUM, exactly like HLL's register max-merge.
# ---------------------------------------------------------------------------

class CountMinSketch:
    """Standard CMS over uint64 key hashes: ``depth`` rows of ``width``
    counters; row r indexes by a splitmix64 re-hash with seed r. Estimates
    never undercount; overcount ≤ ~2N/width per row w.h.p. (classic bound),
    and the min over rows tightens it."""

    def __init__(self, width: int = 8192, depth: int = 4):
        self.width, self.depth = width, depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _indices(self, hs: np.ndarray) -> np.ndarray:
        """[n, depth] counter indices per key hash."""
        seeds = (np.arange(self.depth, dtype=np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15))
        return (_mix64(hs.astype(np.uint64)[:, None] + seeds[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, hs: np.ndarray,
                   weights: np.ndarray | None = None) -> None:
        if len(hs) == 0:
            return
        idx = self._indices(hs)
        w = (weights.astype(np.int64) if weights is not None
             else np.ones(len(hs), dtype=np.int64))
        for r in range(self.depth):
            np.add.at(self.counts[r], idx[:, r], w)

    def estimate(self, hs: np.ndarray) -> np.ndarray:
        if len(hs) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(hs)
        ests = np.stack([self.counts[r][idx[:, r]]
                         for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.counts += other.counts
        return self

    @property
    def total(self) -> int:
        """Total inserted weight (every row sums to it)."""
        return int(self.counts[0].sum())


def cms_heavy_hitters(sf_dir: str, k: int = 20,
                      width: int = 8192, depth: int = 4):
    """Top-k bigrams with their exact counts PLUS a CMS-accuracy flag.

    The sketch is built distributed — one CMS partial per block (a
    depth x width int64 grid, fixed size like an HLL register array),
    summed on the driver (CMS is linear) — over EVERY bigram occurrence.
    The exact top-k comes from the existing bounded top-k path
    (:func:`sema_ray.textops.ngram_counts`); ``cms_ok`` asserts the sketch
    estimate brackets the exact count (never under; over by ≤ 2N·depth/width
    — deterministic here, so the DuckDB twin pins it TRUE and any sketch
    regression becomes a value-hash mismatch, the ``approx_distinct`` HLL
    shape). Output: (ngram, n, cms_ok), n desc then ngram asc.
    """
    import pyarrow.compute as pc

    from .textops import ngram_counts, _load_docs
    from .util import collect_table

    ds = _load_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        cms = CountMinSketch(width, depth)
        if len(flat):
            parents = pc.list_parent_indices(parts) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.nonzero(pc.not_equal(flat, "")
                              .to_numpy(zero_copy_only=False))[0]
            if len(keep) >= 2:
                toks = flat.take(pa.array(keep, pa.int64()))
                par = parents[keep]
                left = np.nonzero(par[1:] == par[:-1])[0]
                if len(left):
                    a = toks.take(pa.array(left, pa.int64()))
                    b = toks.take(pa.array(left + 1, pa.int64()))
                    grams = pc.binary_join_element_wise(a, b, " ")
                    vc = grams.value_counts()
                    if isinstance(vc, pa.ChunkedArray):
                        vc = vc.combine_chunks()
                    cms.add_hashes(
                        _hash64(vc.field("values").to_pylist()),
                        vc.field("counts").to_numpy(zero_copy_only=False))
        return pa.table({"counts": pa.array([cms.counts.tobytes()],
                                            pa.binary())})

    parts_tbl = collect_table(ds.map_batches(partial,
                                             batch_format="pyarrow",
                                             batch_size=None))
    acc = CountMinSketch(width, depth)
    if parts_tbl.num_rows and "counts" in parts_tbl.column_names:
        for blob in parts_tbl["counts"].to_pylist():
            other = CountMinSketch(width, depth)
            other.counts = np.frombuffer(blob, dtype=np.int64) \
                .reshape(depth, width).copy()
            acc.merge(other)
    top = ngram_counts(sf_dir, k=k)
    grams = top["ngram"].to_pylist()
    exact = top["n"].to_numpy(zero_copy_only=False)
    est = acc.estimate(_hash64(grams))
    bound = 2.0 * acc.total * depth / width
    ok = (est >= exact) & (est <= exact + bound)
    return pa.table({"ngram": top["ngram"],
                     "n": pa.array(exact, pa.int64()),
                     "cms_ok": pa.array(ok)})


# ---------------------------------------------------------------------------
# Distributed exact quantiles via histogram-guided selection
# ---------------------------------------------------------------------------

def quantiles_value(sf_dir: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                    bins: int = 4096) -> pa.Table:
    """Exact ``quantile_cont`` over events.value, computed distributed —
    plus a histogram-sketch accuracy flag.

    Never sorts the dataset. Three bounded passes:

    1. per-block (min, max, count) partials — three numbers per block;
    2. per-block fixed-width histogram — the shuffle moves at most ``bins``
       (bin, count) rows per block, merged by summation on the driver
       (blocks x bins is the classic mergeable-sketch size, like HLL);
    3. the cumulative histogram locates the one bin holding each needed
       order statistic, and a filter pass collects ONLY values inside those
       bins (~n/bins rows each) for a local sort + exact rank pick.

    The interpolated exact value matches DuckDB's ``quantile_cont`` (rank
    q*(n-1), linear interpolation); ``est_ok`` asserts the pure-histogram
    estimate (no pass 3) lands within one bin width — the estimator a real
    100 TB run would use when a third pass is too expensive.

    Output: (q, exact_q, est_ok) per requested quantile.
    """
    import os

    import pyarrow.compute as pc

    from .util import collect_table, round_half_up

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["value"])

    def minmax(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([float(v.min())], pa.float64()),
                         "mx": pa.array([float(v.max())], pa.float64()),
                         "n": pa.array([len(v)], pa.int64())})

    mm = collect_table(ds.map_batches(minmax, batch_format="pyarrow",
                                      batch_size=None))
    if mm.num_rows == 0 or "n" not in mm.column_names:
        return pa.table({"q": pa.array([], pa.float64()),
                         "exact_q": pa.array([], pa.float64()),
                         "est_ok": pa.array([], pa.bool_())})
    lo = min(mm["mn"].to_pylist())
    hi = max(mm["mx"].to_pylist())
    n = sum(mm["n"].to_pylist())
    width = (hi - lo) / bins if hi > lo else 1.0

    def to_bin(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)

    def hist(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        counts = np.bincount(to_bin(v), minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(counts[nz], pa.int64())})

    ht = collect_table(ds.map_batches(hist, batch_format="pyarrow",
                                      batch_size=None))
    counts = np.zeros(bins, dtype=np.int64)
    np.add.at(counts, ht["bin"].to_numpy(zero_copy_only=False),
              ht["cnt"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(counts)          # cum[b] = # values in bins <= b
    below = cum - counts             # values strictly before bin b

    # order statistics needed for quantile_cont: floor and ceil of q*(n-1)
    needed: set[int] = set()
    for q in qs:
        r = q * (n - 1)
        needed.add(int(np.floor(r)))
        needed.add(min(int(np.floor(r)) + 1, n - 1))
    kbins = {int(np.searchsorted(cum, k, side="right")) for k in needed}
    kb_arr = np.array(sorted(kbins), dtype=np.int64)

    def in_kbins(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = to_bin(v)
        keep = np.isin(b, kb_arr)
        return pa.table({"value": pa.array(v[keep], pa.float64()),
                         "bin": pa.array(b[keep], pa.int64())})

    sel = collect_table(ds.map_batches(in_kbins, batch_format="pyarrow",
                                       batch_size=None))
    by_bin: dict[int, np.ndarray] = {}
    if sel.num_rows and "bin" in sel.column_names:
        sb = sel["bin"].to_numpy(zero_copy_only=False)
        sv = sel["value"].to_numpy(zero_copy_only=False)
        for b in kb_arr:
            by_bin[int(b)] = np.sort(sv[sb == b])

    def kth(k: int) -> float:
        b = int(np.searchsorted(cum, k, side="right"))
        return float(by_bin[b][k - below[b]])

    out_q, out_v, out_ok = [], [], []
    for q in qs:
        r = q * (n - 1)
        k0 = int(np.floor(r))
        k1 = min(k0 + 1, n - 1)
        f = r - k0
        v0, v1 = kth(k0), kth(k1)
        exact = v0 + (v1 - v0) * f
        # histogram-only estimate: interpolate between the MIDPOINTS of the
        # bins holding the two bracketing order statistics — each true order
        # stat is within width/2 of its bin midpoint, so the estimate error
        # is ≤ width/2 by construction (a within-one-bin interpolation has
        # no such bound on sparse histograms, where adjacent order stats
        # can sit bins apart)
        b0 = int(np.searchsorted(cum, k0, side="right"))
        b1 = int(np.searchsorted(cum, k1, side="right"))
        est = (1 - f) * (lo + width * (b0 + 0.5)) \
            + f * (lo + width * (b1 + 0.5))
        out_q.append(q)
        out_v.append(round_half_up(exact, 6))
        out_ok.append(bool(abs(est - exact) <= width))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "exact_q": pa.array(out_v, pa.float64()),
                     "est_ok": pa.array(out_ok, pa.bool_())})
