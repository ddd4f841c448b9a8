"""Relational operators over Ray Data, each with a DuckDB-oracle twin.

This layer supplies the query capabilities the reference exposes through its
storage/search path — predicate filters (``src/crawler/mod.rs:73-103``),
projections, group-by + count + top-1-per-group (``src/tui/engine.rs:156-174``),
global rank/sort (``engine.rs:176-181``), limits (``engine.rs:11``), exact
point lookups (``src/storage/lance_indexer.rs:165-189``) — generalized into a
proper relational toolbox over ``ray.data.Dataset``, plus the joins the graft
needs (the reference has none; SURVEY §2 "Joins").

Design rules (100 TB discipline):

- column pruning pushed into ``read_parquet(columns=...)``;
- every aggregation pre-combines inside ``map_batches`` (one partial row per
  group per batch) before the global ``groupby`` — shuffles move partials;
- small dimension tables are broadcast (``ray.put`` + dict lookup inside
  ``map_batches``), never shuffled;
- large-large joins use Ray Data's hash ``Dataset.join`` (all-to-all is
  explicit and partitioned, not accidental);
- floats that cross the oracle boundary are rounded identically on both
  sides (parallel partial sums are not associative in IEEE754).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum
from .util import (NULL_KEY, collect_table, fill_null_key,
                   restore_null_key, round_half_up)


def load(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    """Source with column pruning pushed into the parquet read."""
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _round_cols(batch: pa.Table, cols: dict[str, int]) -> pa.Table:
    for col, nd in cols.items():
        i = batch.schema.get_field_index(col)
        batch = batch.set_column(i, col, round_half_up(batch[col], nd))
    return batch


def round_result(ds: rd.Dataset, cols: dict[str, int]) -> rd.Dataset:
    """Round float columns so Ray partial-sum order and DuckDB agree."""
    return ds.map_batches(lambda t: _round_cols(t, cols), batch_format="pyarrow")


def partial_groupby(ds: rd.Dataset, keys: list[str],
                    batch_aggs: list[tuple[str, str]],
                    rename: list[str]) -> rd.Dataset:
    """Per-batch partial aggregation before the shuffle.

    ``batch_aggs`` are Arrow ``Table.group_by(...).aggregate`` specs applied
    inside each batch; the output columns are renamed to ``rename`` and the
    caller runs the (now tiny) global ``groupby`` over the partials. The
    all-to-all moves one row per (group, batch) — not one per input row.
    """

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys).aggregate(batch_aggs)
        # arrow puts aggregate cols first or last depending on version; select
        # explicitly: keys keep names, agg cols are "{col}_{fn}".
        cols = {k: g[k] for k in keys}
        for (col, fn), new in zip(batch_aggs, rename):
            src = f"{col}_{fn}" if fn != "count_all" else "count_all"
            cols[new] = g[src]
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Scans / filters / projections / sorts / limits
# ---------------------------------------------------------------------------

def filter_high_quantity(sf_dir: str) -> rd.Dataset:
    """Predicate filter + projection (reference M1 idea on relational data)."""
    ds = load(sf_dir, "lineitem",
              columns=["l_orderkey", "l_partkey", "l_quantity"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t["l_quantity"], 45.0)),
        batch_format="pyarrow",
    )


def topk_orders(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Global rank + limit (reference A2+K1: sort desc, take k)."""
    ds = load(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


def distinct_segments(sf_dir: str) -> rd.Dataset:
    """DISTINCT via groupby (exact dedup of a key column). A NULL segment
    is a distinct value (SQL DISTINCT keeps it; sentinel-encoded around
    the shuffle)."""
    ds = load(sf_dir, "customer", columns=["c_mktsegment"])
    # pre-combine per batch: distinct inside the batch, then global groupby
    partials = ds.map_batches(
        lambda t: pa.table({"c_mktsegment": fill_null_key(t["c_mktsegment"])}
                           ).group_by(["c_mktsegment"]).aggregate([]),
        batch_format="pyarrow",
    )
    return partials.groupby("c_mktsegment").aggregate(Count(alias_name="_n")) \
        .select_columns(["c_mktsegment"]) \
        .map_batches(lambda t: restore_null_key(t, "c_mktsegment"),
                     batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def _exact_cents_sums(code: np.ndarray, c: np.ndarray,
                      k: int) -> list[int]:
    """Per-code EXACT sums of int64 cents as Python ints (factor-guarded:
    the vectorized path only runs when the block sum provably fits int64,
    else a bigint fold over distinct (code, value) pairs)."""
    if len(c) == 0:
        return [0] * k
    if int(np.abs(c).max()) * len(c) < (1 << 62):
        s = np.zeros(k, np.int64)
        np.add.at(s, code, c)
        return [int(x) for x in s]
    out = [0] * k
    pairs, cnt = np.unique(np.stack([code, c]), axis=1, return_counts=True)
    for ki, ci, n_ in zip(pairs[0].tolist(), pairs[1].tolist(),
                          cnt.tolist()):
        out[int(ki)] += int(n_) * int(ci)
    return out


def q1_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped groupby aggregate over lineitem.

    All three money sums fold EXACT integer cents (the revenue_by_priority
    shape; hostile fuzz: a plain float SUM at 1e9 magnitudes is
    association-dependent, so the two engines' summation orders disagree by
    an ULP and the 2-digit rounding lands on different cents). Per-block
    partials carry Python-bigint totals as (hi, lo) int64 limbs; one float
    op per OUTPUT value at the end — identical IEEE ops on both engines.
    NULL measures are skipped by the sums but counted by COUNT(*); an
    all-NULL group's sum is NULL like SQL's.
    """
    ds = load(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount"])

    def _vc(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray,
                                                      np.ndarray]:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        return valid, np.where(valid, cents64(pc.fill_null(col, 0.0)), 0)

    def partial(t: pa.Table) -> pa.Table:
        # per-column NULL sentinels BEFORE the composite join: a null in
        # either flag would otherwise null the whole key and merge
        # distinct groups
        key = pc.binary_join_element_wise(
            fill_null_key(pc.cast(t["l_returnflag"], pa.string())),
            fill_null_key(pc.cast(t["l_linestatus"], pa.string())), "\x1f")
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        enc = pc.dictionary_encode(key)
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        n = np.bincount(code, minlength=k).astype(np.int64)
        vq, qc = _vc(t["l_quantity"])
        vp, pcent = _vc(t["l_extendedprice"])
        vd, d100 = _vc(t["l_discount"])
        # disc product is NULL if either factor is — zeroed terms drop out
        vpd = vp & vd
        qs = _exact_cents_sums(code, qc, k)
        ps = _exact_cents_sums(code, pcent, k)
        dn = _exact_prio_sums(code, np.where(vpd, pcent, 0),
                              np.where(vpd, d100, 0), k)
        cols = {"key": enc.dictionary,
                "n": pa.array(n, pa.int64())}
        for nm, v in (("nq", vq), ("np", vp), ("nd", vpd)):
            cnt = np.zeros(k, np.int64)
            np.add.at(cnt, code[v], 1)
            cols[nm] = pa.array(cnt, pa.int64())
        for nm, sints in (("q", qs), ("p", ps), ("d", dn)):
            cols[f"{nm}_hi"] = pa.array([x >> 62 for x in sints],
                                        pa.int64())
            cols[f"{nm}_lo"] = pa.array([x & ((1 << 62) - 1)
                                         for x in sints], pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)

    def _fold(t: pa.Table) -> dict[str, list[int]]:
        acc: dict[str, list[int]] = {}
        cols = [t[c].to_pylist() for c in
                ("key", "n", "nq", "np", "nd", "q_hi", "q_lo",
                 "p_hi", "p_lo", "d_hi", "d_lo")]
        for key, n, nq, np_, nd, qh, ql, ph, pl, dh, dl in zip(*cols):
            a = acc.setdefault(key, [0] * 7)
            a[0] += n
            a[1] += nq
            a[2] += np_
            a[3] += nd
            a[4] += (qh << 62) + ql
            a[5] += (ph << 62) + pl
            a[6] += (dh << 62) + dl
        return acc

    def recombine(t: pa.Table) -> pa.Table:
        acc = _fold(t)  # <= a handful of (flag, status) groups
        keys = sorted(acc)
        cols = {"key": pa.array(keys, pa.string()),
                "n": pa.array([acc[x][0] for x in keys], pa.int64()),
                "nq": pa.array([acc[x][1] for x in keys], pa.int64()),
                "np": pa.array([acc[x][2] for x in keys], pa.int64()),
                "nd": pa.array([acc[x][3] for x in keys], pa.int64())}
        for i, nm in ((4, "q"), (5, "p"), (6, "d")):
            cols[f"{nm}_hi"] = pa.array([acc[x][i] >> 62 for x in keys],
                                        pa.int64())
            cols[f"{nm}_lo"] = pa.array(
                [acc[x][i] & ((1 << 62) - 1) for x in keys], pa.int64())
        return pa.table(cols)

    import math
    final = _fold(collect_table(
        partials.map_batches(recombine, batch_format="pyarrow",
                             batch_size=1 << 21)))
    keys = sorted(final)

    def rh(x: float, digits: int) -> float:
        p = float(10 ** digits)
        return math.floor(x * p + 0.5) / p

    rows = {"l_returnflag": [], "l_linestatus": [], "sum_qty": [],
            "sum_base_price": [], "sum_disc_price": [], "count_order": [],
            "avg_qty": [], "avg_price": []}
    for key in keys:
        n, nq, np_, nd, q, p, dn = final[key]
        flag, status = key.split("\x1f")
        rows["l_returnflag"].append(None if flag == NULL_KEY else flag)
        rows["l_linestatus"].append(None if status == NULL_KEY else status)
        rows["sum_qty"].append(float(q) / 100.0 if nq else None)
        rows["sum_base_price"].append(float(p) / 100.0 if np_ else None)
        rows["sum_disc_price"].append(
            rh(float(dn) / 10000.0, 2) if nd else None)
        rows["count_order"].append(n)
        rows["avg_qty"].append(
            rh(float(q) / 100.0 / n, 4) if nq else None)
        rows["avg_price"].append(
            rh(float(p) / 100.0 / n, 4) if np_ else None)
    return rd.from_arrow(pa.table({
        "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
        "l_linestatus": pa.array(rows["l_linestatus"], pa.string()),
        "sum_qty": pa.array(rows["sum_qty"], pa.float64()),
        "sum_base_price": pa.array(rows["sum_base_price"], pa.float64()),
        "sum_disc_price": pa.array(rows["sum_disc_price"], pa.float64()),
        "count_order": pa.array(rows["count_order"], pa.int64()),
        "avg_qty": pa.array(rows["avg_qty"], pa.float64()),
        "avg_price": pa.array(rows["avg_price"], pa.float64()),
    }))


def brand_price_stats(sf_dir: str) -> rd.Dataset:
    """Min/max/mean/count per group (native Ray Data aggregate path).
    A NULL brand is a real group (SQL GROUP BY; sentinel-encoded)."""
    ds = load(sf_dir, "part", columns=["p_brand", "p_retailprice"]) \
        .map_batches(lambda t: t.set_column(
            t.schema.get_field_index("p_brand"), "p_brand",
            fill_null_key(t["p_brand"])), batch_format="pyarrow")
    out = ds.groupby("p_brand").aggregate(
        Min("p_retailprice", alias_name="min_price"),
        Max("p_retailprice", alias_name="max_price"),
        Mean("p_retailprice", alias_name="avg_price"),
        Count(alias_name="n_parts"),
    )
    return round_result(out, {"avg_price": 4, "min_price": 2,
                              "max_price": 2}).map_batches(
        lambda t: restore_null_key(t, "p_brand"), batch_format="pyarrow")


def hourly_event_stats(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate: events per (hour, type).

    The window key is computed vectorized (``floor_temporal``) and carried as
    int64 epoch-seconds — a dense shuffle-friendly key.
    """
    ds = load(sf_dir, "events", columns=["ts", "event_type", "value"])

    def keyed(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        hour_s = pc.divide(pc.cast(hour, pa.int64()), 1_000_000)
        return pa.table({
            "hour_ts": hour_s,
            # NULL event_type forms its own group (SQL GROUP BY keeps it;
            # the raw shuffle would crash on a None key — util.NULL_KEY)
            "event_type": fill_null_key(t["event_type"]),
            "value": t["value"],
            # COUNT(*) counts rows with NULL value too — a plain ones sum,
            # not Arrow's non-null ("value", "count")
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })

    partials = partial_groupby(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["hour_ts", "event_type"],
        [("value", "sum"), ("one", "sum")],
        ["sum_value", "n"],
    )
    out = partials.groupby(["hour_ts", "event_type"]).aggregate(
        Sum("sum_value", alias_name="sum_value"),
        Sum("n", alias_name="n_events"),
    )
    return round_result(out, {"sum_value": 2}).map_batches(
        lambda t: restore_null_key(t, "event_type"), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Per-group top-1 / ordered per-group computation
# ---------------------------------------------------------------------------

def top_event_per_user(sf_dir: str) -> rd.Dataset:
    """Reference A1 semantics on relational data: group, count, top-1.

    Mirrors ``src/tui/engine.rs:156-174`` — group hits by key, per group sort
    and keep the first row, carry the group size (``total_matches_in_file``).
    """
    ds = load(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def kern(t: pa.Table) -> pa.Table:
        t, starts, seg_len = sorted_segments(
            t, "user_id", [("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "user_id": t["user_id"].take(idx),
            "event_id": t["event_id"].take(idx),
            "n_events": pa.array(seg_len.astype(np.int64), pa.int64()),
        })

    return keyed_part_kernel(ds, "user_id", kern)


def sessionize_users(sf_dir: str, gap_us: int = 1_800_000_000) -> rd.Dataset:
    """Per-user session count with a 30-min inactivity gap.

    Ordered-per-group stateful computation: the only stage needing user
    locality, expressed as groupby + map_groups (SURVEY K4 pattern). Exact
    integer microsecond arithmetic so the DuckDB oracle matches bit-for-bit.
    """
    ds = load(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def kern(t: pa.Table) -> pa.Table:
        t, starts, seg_len = sorted_segments(
            t, "user_id", [("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        brk = np.zeros(len(us), dtype=np.int64)
        if len(us) > 1:
            brk[1:] = (np.diff(us) > gap_us).astype(np.int64)
            brk[starts] = 0  # a user's first event never breaks a session
        n_sessions = (1 + np.add.reduceat(brk, starts) if len(starts)
                      else np.zeros(0, dtype=np.int64))
        return pa.table({
            "user_id": t["user_id"].take(pa.array(starts, pa.int64())),
            "n_sessions": pa.array(n_sessions.astype(np.int64), pa.int64()),
        })

    return keyed_part_kernel(ds, "user_id", kern)


# ---------------------------------------------------------------------------
# Ordered-per-key kernels over a bounded-group-count shuffle
# ---------------------------------------------------------------------------

# groupby(key).map_groups costs one Python call per key (CLAUDE.md sharp
# edge) — ruinous with millions of keys. These ops instead shuffle on a
# BOUNDED part key (hash(key) & (ORDERED_PARTS-1)): every key's rows land
# wholly in one part, the kernel runs ORDERED_PARTS times total, and the
# per-part work is one vectorized segmented pass over many keys at once.
ORDERED_PARTS = 64


def keyed_part_kernel(ds: rd.Dataset, key_col: str, kernel,
                      n_parts: int = ORDERED_PARTS) -> rd.Dataset:
    """Run ``kernel`` over tables holding COMPLETE ``key_col`` groups.

    ``kernel(table) -> table`` must be correct on any union of whole key
    groups (the same contract as dedup's ``_verified_pairs``). Int64 keys
    hash with splitmix64; string keys dictionary-encode per block and hash
    only the dictionary.
    """
    from .hashing import splitmix64, stable_u64_array

    mask = np.uint64(n_parts - 1)

    def add_part(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            k = col.to_numpy(zero_copy_only=False).astype(np.int64)
            part = (splitmix64(k.view(np.uint64)) & mask).astype(np.int32)
        else:
            enc = pc.dictionary_encode(col.combine_chunks()
                                       if isinstance(col, pa.ChunkedArray)
                                       else col)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            dict_parts = (stable_u64_array(enc.dictionary.to_pylist())
                          & mask).astype(np.int32)
            part = dict_parts[
                enc.indices.to_numpy(zero_copy_only=False)]
        return t.append_column("part", pa.array(part, pa.int32()))

    def run(g: pa.Table) -> pa.Table:
        return kernel(g.drop_columns(["part"]))

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=None)
            .groupby("part").map_groups(run, batch_format="pyarrow"))


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a sorted key array starts a new segment."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    return np.r_[True, keys[1:] != keys[:-1]]


def sorted_segments(t: pa.Table, key_col: str,
                    order: list[tuple[str, str]]
                    ) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Shared prelude for segmented per-key kernels (VERDICT r3 item 8).

    Sorts ``t`` by ``order`` (which must lead with ``key_col`` ascending so
    key groups are contiguous) and returns ``(sorted_table, starts,
    seg_len)`` — the run-start indices and run lengths of each key segment.
    String keys are dictionary-encoded so the adjacent-unequal scan compares
    int32 codes, never Python strings.
    """
    assert order and order[0] == (key_col, "ascending"), order
    t = t.sort_by(order)
    col = t[key_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        k = col.to_numpy(zero_copy_only=False)
    else:
        k = col.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    starts = np.nonzero(_segment_starts(k))[0]
    seg_len = np.diff(np.r_[starts, len(k)])
    return t, starts, seg_len


def cents64(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """floor(value*100 + 0.5) as int64 — the fixed-point bridge that makes
    running/variance arithmetic EXACT (association-independent), so the
    DuckDB twin matches bit-for-bit no matter how either engine orders its
    partial sums. Same IEEE ops as ``CAST(FLOOR(value*100+0.5) AS BIGINT)``.
    """
    v = pc.cast(values, pa.float64())
    return pc.cast(pc.floor(pc.add(pc.multiply(v, 100.0), 0.5)),
                   pa.int64()).to_numpy(zero_copy_only=False)


def running_user_totals(sf_dir: str) -> rd.Dataset:
    """Cumulative per-user aggregate in (ts, event_id) order: running event
    count and running value total (exact integer cents).

    The cumulative frame is the one windowed shape that needs whole-key
    locality AND order; expressed as a bounded-part shuffle + one segmented
    vectorized cumsum per part (no per-key Python, no global sort).
    """
    ds = load(sf_dir, "events", columns=["user_id", "event_id", "ts",
                                         "value"])

    def kern(t: pa.Table) -> pa.Table:
        t, starts, seg_len = sorted_segments(
            t, "user_id", [("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        n_rows = t.num_rows
        va = t["value"]
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        # SQL window SUM skips NULL values and stays NULL until the
        # partition's first non-null row: nulls add 0 to the cumsum, and
        # rows whose prefix has no non-null value emit NULL
        valid = pc.is_valid(va).to_numpy(zero_copy_only=False)
        cents = cents64(pc.fill_null(va, 0.0))
        cs = np.cumsum(cents)
        off = np.where(starts > 0, cs[starts - 1], 0)
        run_cents = cs - np.repeat(off, seg_len)  # exact: int arithmetic
        nn = np.cumsum(valid.astype(np.int64))
        nn_off = np.where(starts > 0, nn[starts - 1], 0)
        no_value_yet = (nn - np.repeat(nn_off, seg_len)) == 0
        run_n = np.arange(n_rows, dtype=np.int64) \
            - np.repeat(starts, seg_len) + 1
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "running_n": pa.array(run_n, pa.int64()),
            "running_cents": pa.array(run_cents, pa.int64(),
                                      mask=no_value_yet),
        })

    return keyed_part_kernel(ds, "user_id", kern)


def event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-event inter-arrival gap (µs) to the user's previous event —
    LAG over (PARTITION BY user ORDER BY ts, event_id). Exact integer
    microseconds end-to-end; a user's first event gets the -1 sentinel
    (NULL would surface as float64+NaN after to_pandas on both engines —
    the sentinel keeps the checked column exact int64)."""
    ds = load(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def kern(t: pa.Table) -> pa.Table:
        t, starts, _seg_len = sorted_segments(
            t, "user_id", [("user_id", "ascending"), ("ts", "ascending"),
                           ("event_id", "ascending")])
        arr = pc.cast(t["ts"], pa.int64())
        us = pc.fill_null(arr, 0).to_numpy(zero_copy_only=False)
        gap = np.empty(len(us), dtype=np.int64)
        if len(us):
            gap[1:] = us[1:] - us[:-1]
            gap[starts] = -1
            if arr.null_count:
                # LAG arithmetic over a NULL ts is NULL on either side of
                # the pair; the twin's COALESCE maps it to the -1 sentinel
                # (NULL ts rows sort last within the partition on both
                # engines, so the pairing is identical)
                nn = pc.is_valid(arr).to_numpy(zero_copy_only=False)
                bad = ~nn
                bad[1:] |= ~nn[:-1]
                gap[bad] = -1
        return pa.table({
            "event_id": t["event_id"],
            "gap_us": pa.array(gap, pa.int64()),
        })

    return keyed_part_kernel(ds, "user_id", kern)


def zscore_by_type(sf_dir: str) -> rd.Dataset:
    """Per-event z-score of value within its event_type (population std).

    Two-pass group normalization: per-block integer-cents partials
    (n, Σc, Σc²) combine on the driver EXACTLY (Python bigints), then the
    tiny moment table broadcasts into a stateless map — no shuffle touches
    the fact table. Because the moments are exact integers, the float ops
    that follow are identical on both engines, so the oracle matches at
    full precision (rounded to 6 only for display stability).
    """
    ds = load(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        # rows with NULL event_type never join the stats table in the SQL
        # twin (JOIN USING drops NULL keys) — exclude them here too; rows
        # with NULL value count toward n (COUNT(*)) but add nothing to the
        # moment sums (SQL SUM skips NULLs)
        t = t.filter(pc.is_valid(t["event_type"]))
        va = t["value"]
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        valid = pc.is_valid(va).to_numpy(zero_copy_only=False)
        c = np.where(valid, cents64(pc.fill_null(va, 0.0)), 0)
        et = pc.dictionary_encode(t["event_type"].combine_chunks()
                                  if isinstance(t["event_type"],
                                                pa.ChunkedArray)
                                  else t["event_type"])
        idx = et.indices.to_numpy(zero_copy_only=False)
        k = len(et.dictionary)
        n = np.bincount(idx, minlength=k).astype(np.int64)
        # int64 scatter-adds keep the partials EXACT (float64 bincount
        # weights would round above 2^53)
        s = np.zeros(k, np.int64)
        np.add.at(s, idx, c)
        amax = int(np.abs(c).max()) if len(c) else 0
        if amax * amax * max(len(c), 1) < (1 << 62):
            # vectorized fast path: every per-element square AND the block
            # sum provably fit int64 (typical money-like magnitudes)
            q = np.zeros(k, np.int64)
            np.add.at(q, idx, c * c)
            qints = [int(x) for x in q]
        else:
            # exact fallback (oracle fuzz: a single |value| > ~$3e7 makes
            # c*c wrap int64 PER ELEMENT — the twin's HUGEINT does not):
            # fold squares over DISTINCT (type, cent) pairs with Python
            # bigints, O(distinct values) Python
            qints = [0] * k
            pairs, cnt = np.unique(np.stack([idx, c]), axis=1,
                                   return_counts=True)
            for ki, vi, n_ in zip(pairs[0].tolist(), pairs[1].tolist(),
                                  cnt.tolist()):
                qints[int(ki)] += int(n_) * int(vi) * int(vi)
        # Σc² can exceed int64 — ship as (hi, lo) limbs of the exact sum
        return pa.table({
            "event_type": et.dictionary,
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "q_hi": pa.array([x >> 62 for x in qints], pa.int64()),
            "q_lo": pa.array([x & ((1 << 62) - 1) for x in qints],
                             pa.int64()),
        })

    parts = collect_table(ds.map_batches(moments, batch_format="pyarrow",
                                         batch_size=None))
    acc: dict[str, list[int]] = {}
    for et, n, s, qh, ql in zip(parts["event_type"].to_pylist(),
                                parts["n"].to_pylist(),
                                parts["s"].to_pylist(),
                                parts["q_hi"].to_pylist(),
                                parts["q_lo"].to_pylist()):
        a = acc.setdefault(et, [0, 0, 0])
        a[0] += n
        a[1] += s
        a[2] += (qh << 62) + ql  # Python ints: exact at any corpus size
    stats = {et: (float(a[1]) / a[0],
                  (float(a[2]) / a[0]) - (float(a[1]) / a[0]) ** 2)
             for et, a in acc.items()}

    def zmap(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["event_type"]))  # JOIN USING semantics
        va = t["value"]
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        valid = pc.is_valid(va).to_numpy(zero_copy_only=False)
        c = cents64(pc.fill_null(va, 0.0)).astype(np.float64)
        et = pc.dictionary_encode(t["event_type"].combine_chunks()
                                  if isinstance(t["event_type"],
                                                pa.ChunkedArray)
                                  else t["event_type"])
        mean = np.array([stats[x][0] for x in et.dictionary.to_pylist()])
        var = np.array([stats[x][1] for x in et.dictionary.to_pylist()])
        idx = et.indices.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (c - mean[idx]) / np.sqrt(var[idx])
        # NULL value -> NULL z (the row still appears, as in the twin)
        return pa.table({"event_id": t["event_id"],
                         "z": round_half_up(
                             pa.array(z, pa.float64(), mask=~valid), 6)})

    return ds.map_batches(zmap, batch_format="pyarrow")

def _table_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata — no data read."""
    import pyarrow.parquet as pq_mod
    return pq_mod.ParquetFile(
        os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def compile_int_lookup(keys: pa.ChunkedArray | pa.Array, vals):
    """Small-dim int64-key -> value lookup with NO per-row Python.

    The dim side compiles once into (sorted int64 keys, int32 value codes,
    value dictionary); the returned ``gather(fact_keys) -> (codes, hit)``
    does one ``np.searchsorted`` per batch. Misses get code -1 / hit=False
    (callers choose inner/left semantics). Values dictionary-encode so a
    string dim column ships as one small dictionary, not a per-row copy.
    """
    k = pa.chunked_array([keys]) if isinstance(keys, pa.Array) else keys
    k = k.combine_chunks()
    v = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
    if k.null_count:  # a NULL join key matches nothing (ANSI) — drop it
        ok = pc.is_valid(k)
        k, v = k.filter(ok), v.filter(ok)
    knp = k.to_numpy(zero_copy_only=False).astype(np.int64)
    enc = pc.dictionary_encode(v)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    dictionary = enc.dictionary
    idx = enc.indices
    if idx.null_count:
        # NULL dim VALUES get a real dictionary slot so decoders emit a
        # real NULL (SQL: the joined row exists, its projected column is
        # NULL) instead of crashing on a null index
        idx = pc.fill_null(idx, len(dictionary))
        dictionary = pa.concat_arrays(
            [dictionary, pa.array([None], dictionary.type)])
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int32)
    order = np.argsort(knp, kind="stable")
    knp, codes = knp[order], codes[order]

    def gather(fact_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        fk = np.asarray(fact_keys)
        if fk.dtype.kind == "f":
            # Arrow's to_numpy surfaces NULL int keys as NaN floats; a
            # NULL fact key never matches (ANSI join semantics)
            okm = ~np.isnan(fk)
            fk = np.where(okm, fk, 0).astype(np.int64)
        else:
            okm = None
            fk = fk.astype(np.int64, copy=False)
        if len(knp) == 0:
            return (np.full(len(fk), -1, np.int32),
                    np.zeros(len(fk), dtype=bool))
        pos = np.searchsorted(knp, fk)
        pos[pos == len(knp)] = 0
        hit = knp[pos] == fk
        if okm is not None:
            hit &= okm
        out = np.where(hit, codes[pos], np.int32(-1)).astype(np.int32)
        return out, hit

    return gather, dictionary


def orders_per_segment(sf_dir: str) -> rd.Dataset:
    """Broadcast hash join (small dim side) + aggregate.

    ``customer`` is the small side: compiled once into sorted keys + a
    segment dictionary (the reference's point-lookup idea,
    ``lance_indexer.rs:165-189``, done as a real map-side join). The
    per-batch partials aggregate on the int32 segment CODE, so neither the
    fact pass nor the shuffle ever materializes a per-row string.
    """
    cust_tbl = collect_table(
        load(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]))
    gather, seg_dict = compile_int_lookup(cust_tbl["c_custkey"],
                                          cust_tbl["c_mktsegment"])

    def join_partial(t: pa.Table) -> pa.Table:
        codes, hit = gather(t["o_custkey"].to_numpy(zero_copy_only=False))
        hm = pa.array(hit)
        part = pa.table({"code": pa.array(codes[hit], pa.int32()),
                         "price": pc.cast(t["o_totalprice"],
                                          pa.float64()).filter(hm),
                         "one": pa.array(np.ones(int(hit.sum()),
                                                 dtype=np.int64))})
        g = part.group_by(["code"]).aggregate(
            [("price", "sum"), ("one", "sum")])
        return g.rename_columns(["code", "sum_price", "n"])

    partials = load(sf_dir, "orders",
                    columns=["o_custkey", "o_totalprice"]) \
        .map_batches(join_partial, batch_format="pyarrow")
    out = partials.groupby("code").aggregate(
        Sum("n", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_totalprice"),
    )

    def decode(t: pa.Table) -> pa.Table:
        seg = pc.take(seg_dict, pc.cast(t["code"], pa.int32()))
        return pa.table({"c_mktsegment": seg,
                         "n_orders": t["n_orders"],
                         "sum_totalprice": t["sum_totalprice"]})

    return round_result(out.map_batches(decode, batch_format="pyarrow"),
                        {"sum_totalprice": 2})


# Dim sides at or below this many rows broadcast (a few tens of MB in the
# object store); above it the partitioned hash Dataset.join runs. 100 TB
# fact tables keep their dimension tables broadcastable far past TPC-H
# shapes — the shuffle join is the escape hatch, not the default.
BROADCAST_JOIN_MAX_ROWS = 2_000_000
# Below this the compiled lookup rides in the task closure (cached per
# worker process); above, ray.put + an actor pool so it deserializes once
# per actor rather than once per worker-task-spec fetch.
BROADCAST_CLOSURE_MAX_ROWS = 500_000


def _exact_prio_sums(code: np.ndarray, c: np.ndarray, d100: np.ndarray,
                     k: int) -> list[int]:
    """Per-code EXACT sums of ``c * (100 - d100)`` as Python ints.

    The overflow guard runs on the FACTORS, before multiplying (ADVICE r4:
    a post-product ``abs(num).max()`` check never sees a wrapped product —
    the per-element-product trap in CLAUDE.md). Fast path: both the
    per-element product and the block sum provably fit int64; otherwise a
    Python-bigint fold over distinct (code, c, d100) triples.
    """
    sints = [0] * k
    if len(c) == 0:
        return sints
    cmax = int(np.abs(c).max())
    # |num| <= cmax * 200 (d100 in cents of a discount fraction can be
    # negative on hostile data, so the multiplier bound is 100 + |d100|max)
    dmax = int(np.abs(d100).max())
    nmax = cmax * (100 + dmax)
    if nmax * len(c) < (1 << 62):
        num = c * (100 - d100)
        s = np.zeros(k, np.int64)
        np.add.at(s, code, num)
        return [int(x) for x in s]
    trips, cnt = np.unique(np.stack([code, c, d100]), axis=1,
                           return_counts=True)
    for ki, ci, di, n_ in zip(trips[0].tolist(), trips[1].tolist(),
                              trips[2].tolist(), cnt.tolist()):
        sints[int(ki)] += int(n_) * int(ci) * (100 - int(di))
    return sints


def revenue_by_priority(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """lineitem ⋈ orders + aggregate, size-adaptive join placement.

    orders is fact-sized relative to lineitem but tiny in absolute terms
    (≤ ``BROADCAST_JOIN_MAX_ROWS``): the default path compiles
    (o_orderkey -> priority code) once and streams lineitem through a
    map-side gather with per-batch partial aggregation on the int code —
    zero shuffle, the only all-to-all is the 5-row final combine. Above the
    threshold it falls back to Ray Data's partitioned hash ``Dataset.join``
    (fractional-CPU aggregators — CLAUDE.md join-deadlock rule).
    """
    li = load(sf_dir, "lineitem",
              columns=["l_orderkey", "l_extendedprice", "l_discount"])
    if _table_rows(sf_dir, "orders") <= BROADCAST_JOIN_MAX_ROWS:
        orders_tbl = collect_table(
            load(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderpriority"]))
        gather, prio_dict = compile_int_lookup(orders_tbl["o_orderkey"],
                                               orders_tbl["o_orderpriority"])

        def join_partial_fn(get_gather):
            def join_partial(t: pa.Table) -> pa.Table:
                codes, hit = get_gather()(
                    t["l_orderkey"].to_numpy(zero_copy_only=False))
                # EXACT integer numerator (oracle fuzz: float partial sums
                # of ext*(1-disc) are association-dependent — at extreme
                # magnitudes the two engines' summation orders disagree by
                # an ULP and the 2-digit rounding lands on different
                # cents): num = cents(ext) * (100 - cents(disc)); value =
                # Σnum / 10000, divided ONCE at the end on both engines.
                # SQL SUM skips rows where EITHER factor is NULL (the
                # product is NULL) while COUNT(*) keeps them — zeroed
                # terms drop out of the sum, and nv tracks the valid count
                # so an all-NULL group emits a NULL revenue like SQL's
                v = (pc.is_valid(t["l_extendedprice"]).to_numpy(
                        zero_copy_only=False)
                     & pc.is_valid(t["l_discount"]).to_numpy(
                        zero_copy_only=False))[hit]
                c = np.where(
                    v, cents64(pc.fill_null(t["l_extendedprice"], 0.0))[hit],
                    0)
                d100 = np.where(
                    v, cents64(pc.fill_null(t["l_discount"], 0.0))[hit], 0)
                code_hit = codes[hit]
                k = int(code_hit.max()) + 1 if len(code_hit) else 0
                n = np.bincount(code_hit, minlength=k).astype(np.int64)
                nv = np.bincount(code_hit[v], minlength=k).astype(np.int64)
                sints = _exact_prio_sums(code_hit, c, d100, k)
                keep = np.nonzero(n)[0]
                return pa.table({
                    "code": pa.array(keep.astype(np.int32), pa.int32()),
                    "n": pa.array(n[keep], pa.int64()),
                    "nv": pa.array(nv[keep], pa.int64()),
                    "s_hi": pa.array([sints[i] >> 62 for i in keep],
                                     pa.int64()),
                    "s_lo": pa.array([sints[i] & ((1 << 62) - 1)
                                      for i in keep], pa.int64()),
                })
            return join_partial

        if len(orders_tbl) <= BROADCAST_CLOSURE_MAX_ROWS:
            # task pool: the lookup ships in the (worker-cached) task closure
            # — no actor-pool spin-up (CLAUDE.md: task pools for light state)
            partials = li.map_batches(join_partial_fn(lambda: gather),
                                      batch_format="pyarrow",
                                      batch_size=None)
        else:
            gather_ref = ray.put(gather)

            class JoinPartial:
                """Actor pool: a big broadcast lookup deserializes once per
                actor (ray.get in __init__), not once per task round."""

                def __init__(self):
                    g = ray.get(gather_ref)
                    self.fn = join_partial_fn(lambda: g)

                def __call__(self, t: pa.Table) -> pa.Table:
                    return self.fn(t)

            partials = li.map_batches(JoinPartial, batch_format="pyarrow",
                                      batch_size=None, concurrency=(1, 8))

        def _fold(t: pa.Table) -> dict[int, list[int]]:
            acc: dict[int, list[int]] = {}
            for code, n, nv, hi, lo in zip(t["code"].to_pylist(),
                                           t["n"].to_pylist(),
                                           t["nv"].to_pylist(),
                                           t["s_hi"].to_pylist(),
                                           t["s_lo"].to_pylist()):
                a = acc.setdefault(int(code), [0, 0, 0])
                a[0] += n
                a[1] += nv
                a[2] += (hi << 62) + lo  # Python ints: exact at any scale
            return acc

        def recombine(t: pa.Table) -> pa.Table:
            acc = _fold(t)  # a handful of priority codes — trivial Python
            codes = sorted(acc)
            return pa.table({
                "code": pa.array(codes, pa.int32()),
                "n": pa.array([acc[c][0] for c in codes], pa.int64()),
                "nv": pa.array([acc[c][1] for c in codes], pa.int64()),
                "s_hi": pa.array([acc[c][2] >> 62 for c in codes],
                                 pa.int64()),
                "s_lo": pa.array([acc[c][2] & ((1 << 62) - 1)
                                  for c in codes], pa.int64()),
            })

        # coalescing no-shuffle combine (many partial blocks per task), then
        # the <= n_groups-per-task residue folds on the driver
        final = _fold(collect_table(
            partials.map_batches(recombine, batch_format="pyarrow",
                                 batch_size=1 << 21)))
        codes = sorted(final)
        out_tbl = pa.table({
            "o_orderpriority": pc.take(
                prio_dict, pa.array(codes, pa.int32())),
            "n_items": pa.array([final[c][0] for c in codes], pa.int64()),
            # ONE float op from the exact integer total — identical on
            # both engines regardless of summation order; a group with no
            # valid (ext, disc) pair sums to SQL NULL
            "revenue": pa.array([float(final[c][2]) / 10000.0
                                 if final[c][1] else None
                                 for c in codes], pa.float64()),
        })
        return round_result(rd.from_arrow(out_tbl), {"revenue": 2})
    return _revenue_by_priority_shuffle(li, sf_dir, num_partitions)


def _revenue_by_priority_shuffle(li: rd.Dataset, sf_dir: str,
                                 num_partitions: int) -> rd.Dataset:
    """Large-large path: partitioned hash ``Dataset.join`` + partial-agg
    groupby — the explicit all-to-all for dim sides too big to broadcast."""
    orders = load(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",),
                     aggregator_ray_remote_args={"num_cpus": 0.05})

    def derive(t: pa.Table) -> pa.Table:
        # per-block EXACT partial, keyed by priority string: the same
        # factor-guarded bigint sums as the broadcast path (ADVICE r4: a
        # per-row int64 `num` column wraps silently past |price| ~ $4.6e14
        # while the HUGEINT oracle stays exact), split hi/lo so the partial
        # rides an int64 Arrow column. NULL-measure rows count in n but
        # contribute a zeroed term to the sum (SQL SUM skips them); nv
        # tracks valid pairs so all-NULL groups emit NULL revenue
        v = (pc.is_valid(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
             & pc.is_valid(t["l_discount"]).to_numpy(zero_copy_only=False))
        c = np.where(v, cents64(pc.fill_null(t["l_extendedprice"], 0.0)), 0)
        d100 = np.where(v, cents64(pc.fill_null(t["l_discount"], 0.0)), 0)
        col = t["o_orderpriority"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        idx = enc.indices
        dictionary = enc.dictionary
        if idx.null_count:  # GROUP BY keeps the NULL priority group
            idx = pc.fill_null(idx, len(dictionary))
            dictionary = pa.concat_arrays(
                [dictionary, pa.array([None], dictionary.type)])
        code = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(dictionary)
        n = np.bincount(code, minlength=k).astype(np.int64)
        nv = np.bincount(code[v], minlength=k).astype(np.int64)
        sints = _exact_prio_sums(code, c, d100, k)
        keep = np.nonzero(n)[0]
        return pa.table({
            "o_orderpriority": pc.cast(
                dictionary.take(pa.array(keep, pa.int64())),
                pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "nv": pa.array(nv[keep], pa.int64()),
            "s_hi": pa.array([sints[i] >> 62 for i in keep], pa.int64()),
            "s_lo": pa.array([sints[i] & ((1 << 62) - 1) for i in keep],
                             pa.int64()),
        })

    partials = joined.map_batches(derive, batch_format="pyarrow",
                                  batch_size=None)

    # handful of priorities × blocks — fold exactly on the driver with
    # Python ints (no Ray Sum: hi/lo halves cannot be summed independently
    # without losing carries)
    acc: dict[str, list[int]] = {}
    tbl = collect_table(partials)
    if tbl.num_rows:
        for p, n_, nv_, hi, lo in zip(tbl["o_orderpriority"].to_pylist(),
                                      tbl["n"].to_pylist(),
                                      tbl["nv"].to_pylist(),
                                      tbl["s_hi"].to_pylist(),
                                      tbl["s_lo"].to_pylist()):
            a = acc.setdefault(p, [0, 0, 0])
            a[0] += n_
            a[1] += nv_
            a[2] += (hi << 62) + lo
    prios = sorted(acc, key=lambda x: (x is None, x))  # None sorts last
    out_tbl = pa.table({
        "o_orderpriority": pa.array(prios, pa.string()),
        "n_items": pa.array([acc[p][0] for p in prios], pa.int64()),
        "revenue": pa.array([float(acc[p][2]) / 10000.0
                             if acc[p][1] else None for p in prios],
                            pa.float64()),
    })
    return round_result(rd.from_arrow(out_tbl), {"revenue": 2})


def union_key_counts(sf_dir: str) -> rd.Dataset:
    """UNION ALL of two projections + groupby count."""
    def proj(col):
        # the ones column makes the count COUNT(*): Arrow's ("key",
        # "count") would count a NULL key group as zero
        return lambda t: pa.table({
            "key": pc.cast(t[col], pa.int64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64))})

    o = load(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        proj("o_custkey"), batch_format="pyarrow")
    c = load(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        proj("c_custkey"), batch_format="pyarrow")
    u = o.union(c)
    partials = partial_groupby(u, ["key"], [("one", "sum")], ["n"])
    return partials.groupby("key").aggregate(Sum("n", alias_name="n"))


def exact_text_search(sf_dir: str, pattern: str = "data") -> rd.Dataset:
    """Exact-text search path (reference M4 `'`-prefix + T3 idea).

    Substring match + per-document occurrence count, vectorized with Arrow
    kernels — no inverted index needed when the scan is the pipeline.
    """
    ds = load(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring(t["text"], pattern=pattern), pa.int64())
        out = pa.table({"doc_id": t["doc_id"], "n_matches": n})
        return out.filter(pc.greater(out["n_matches"], 0))

    return ds.map_batches(scan, batch_format="pyarrow")


def asof_join(left: rd.Dataset, right: rd.Dataset, *, key: str,
              left_ts: str, right_ts: str, value_cols: list[str],
              n_parts: int = ORDERED_PARTS) -> rd.Dataset:
    """Generic partitioned as-of join: for every left row, the latest right
    row with the same ``key`` and ``right_ts`` <= ``left_ts``.

    Ray Data has no native as-of join, so it is composed (SURVEY §2 "Custom
    operators" path (a)): tag both sides, union, hash-partition on a
    BOUNDED part key (``keyed_part_kernel`` — one Python call per part,
    never per key), and merge each part's many keys in one vectorized pass:
    lexsort every row by (key, ts, right-before-left), then a single
    ``np.maximum.accumulate`` hands each left row the latest preceding
    right row (a same-key check drops cross-key carryover). Null
    timestamps never match (ANSI ASOF semantics). Partitioning assumption:
    one part (≈ rows/``n_parts``) fits in one task — raise ``n_parts`` for
    bigger inputs.
    Output: left rows (inner join) + ``value_cols`` from the matched right
    row.
    """
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    l_names = [n for n in l_schema.names]
    r_only = [n for n in r_schema.names if n not in set(l_names)]
    out_names = l_names + value_cols
    all_fields = ([l_schema.field(n) for n in l_names]
                  + [r_schema.field(n) for n in r_only]
                  + [pa.field("_side", pa.string())])
    union_schema = pa.schema(all_fields)
    out_schema = pa.schema(
        [union_schema.field(n) for n in out_names])
    # timestamps compare in one numpy dtype: float64 when either side is
    # floating (fractional epoch seconds are a legal ts type for the
    # generic operator — a safe int64 cast would raise on them), int64
    # otherwise (covers ints and pa.timestamp units exactly)
    _ts_float = (pa.types.is_floating(l_schema.field(left_ts).type)
                 or pa.types.is_floating(r_schema.field(right_ts).type))
    _ts_type = pa.float64() if _ts_float else pa.int64()
    # mixed float/int timestamps: the integer side is about to be compared
    # in float64, which is exact only up to 2^53 — beyond that (e.g. int64
    # epoch NANOseconds) the cast can reorder near-tie timestamps and flip
    # which right row the inclusive `<=` rule matches. Fail loudly instead
    # of silently mismatching (ADVICE r4); callers with ns-int + float
    # sides must cast one side explicitly.
    _int_sides = [nm for nm, sch, f in ((left_ts, l_schema, left_ts),
                                        (right_ts, r_schema, right_ts))
                  if _ts_float and pa.types.is_integer(sch.field(nm).type)]

    def _check_f64_exact(col: pa.ChunkedArray | pa.Array, name: str):
        m = pc.max(pc.abs(pc.cast(col, pa.int64()))).as_py()
        if m is not None and int(m) >= (1 << 53):
            raise ValueError(
                f"asof_join: integer timestamp column {name!r} has values "
                f">= 2^53 but the other side is floating — the float64 "
                f"comparison domain would lose precision; cast one side "
                f"explicitly")

    def _tag(side: str):
        def tag(t: pa.Table) -> pa.Table:
            cols = {}
            for f in union_schema:
                if f.name == "_side":
                    cols[f.name] = pa.array([side] * t.num_rows, pa.string())
                elif f.name in t.schema.names:
                    cols[f.name] = pc.cast(t[f.name], f.type)
                else:
                    cols[f.name] = pa.nulls(t.num_rows, f.type)
            return pa.table(cols, schema=union_schema)
        return tag

    def merge(g: pa.Table) -> pa.Table:
        """Vectorized multi-key as-of merge over whole key groups."""
        is_l = pc.equal(g["_side"], "L").to_numpy(zero_copy_only=False)
        # null timestamps on a row's own side never match — drop up front
        lt_ok = pc.is_valid(g[left_ts]).to_numpy(zero_copy_only=False)
        rt_ok = pc.is_valid(g[right_ts]).to_numpy(zero_copy_only=False)
        keep = np.where(is_l, lt_ok, rt_ok)
        if not keep.all():
            g = g.filter(pa.array(keep))
            is_l = is_l[keep]
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        kcol = g[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = pc.dictionary_encode(kcol)
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        for _nm in set(_int_sides):  # mixed float/int: see entry guard
            _check_f64_exact(g[_nm], _nm)
        lt = pc.fill_null(pc.cast(g[left_ts], _ts_type), 0) \
            .to_numpy(zero_copy_only=False)
        rt = pc.fill_null(pc.cast(g[right_ts], _ts_type), 0) \
            .to_numpy(zero_copy_only=False)
        ts = np.where(is_l, lt, rt)
        # key-major order; equal (key, ts) puts R before L (<= is inclusive)
        order = np.lexsort((is_l, ts, code))
        code_s, is_l_s = code[order], is_l[order]
        marker = np.where(is_l_s, -1, np.arange(n))
        latest_r = np.maximum.accumulate(marker)
        lpos = np.nonzero(is_l_s)[0]
        m = latest_r[lpos]
        ok = m >= 0
        ok &= code_s[np.maximum(m, 0)] == code_s[lpos]  # same key only
        lpos, m = lpos[ok], m[ok]
        if len(lpos) == 0:
            return out_schema.empty_table()
        l_rows = pa.array(order[lpos], pa.int64())
        r_rows = pa.array(order[m], pa.int64())
        cols = {nm: g[nm].take(l_rows) for nm in l_names}
        for c in value_cols:
            cols[c] = g[c].take(r_rows)
        return pa.table(cols, schema=out_schema)

    tag_l = left.map_batches(_tag("L"), batch_format="pyarrow")
    tag_r = right.map_batches(_tag("R"), batch_format="pyarrow")
    return keyed_part_kernel(tag_l.union(tag_r), key, merge,
                             n_parts=n_parts)


def latest_order_before_event(sf_dir: str) -> rd.Dataset:
    """As-of join demo with a DuckDB ``ASOF JOIN`` oracle: for each event,
    the customer's (user_id+1) latest order at or before the event time.

    Orders are pre-deduplicated to one row per (custkey, orderdate) — max
    orderkey — so the as-of pick is unambiguous on both engines.
    """
    ev = load(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def ev_key(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "k": pc.cast(pc.add(t["user_id"], 1), pa.int64()),
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    orders = load(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate", "o_orderkey"])

    def o_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey", "o_orderdate"]).aggregate(
            [("o_orderkey", "max")])
        return pa.table({
            "k": pc.cast(g["o_custkey"], pa.int64()),
            "od_us": pc.cast(g["o_orderdate"], pa.int64()),
            "o_orderkey": g["o_orderkey_max"],
        })

    o_part = orders.map_batches(o_partial, batch_format="pyarrow",
                                batch_size=None)
    o_dedup = o_part.groupby(["k", "od_us"]).aggregate(
        Max("o_orderkey", alias_name="o_orderkey"))
    joined = asof_join(ev.map_batches(ev_key, batch_format="pyarrow"),
                       o_dedup, key="k", left_ts="ts_us", right_ts="od_us",
                       value_cols=["o_orderkey"])
    return joined.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        }) if t.num_rows else pa.table({
            "event_id": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64())}),
        batch_format="pyarrow")


def sliding_window_counts(sf_dir: str, window_s: int = 3600,
                          slide_s: int = 900) -> rd.Dataset:
    """Sliding-window aggregate: event count + rounded value sum per
    (window_start, event_type), windows of ``window_s`` sliding ``slide_s``.

    Each event replicates into ``window_s / slide_s`` window keys inside
    ``map_batches`` (vectorized repeat), then a partial-aggregated groupby —
    the streaming-window shape expressed as flat-map + shuffle-of-partials.
    """
    n_rep = window_s // slide_s
    ds = load(sf_dir, "events", columns=["ts", "event_type", "value"])

    def explode(t: pa.Table) -> pa.Table:
        ts_s = pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()), 1_000_000),
                       pa.int64()).to_numpy(zero_copy_only=False)
        # windows containing ts: starts in (ts - window, ts], on slide grid
        last_start = (ts_s // slide_s) * slide_s
        starts = last_start[:, None] - np.arange(n_rep)[None, :] * slide_s
        keepf = (starts > (ts_s[:, None] - window_s)).reshape(-1)
        # NULL event_type groups (sentinel) and NULL values (validity mask
        # survives the repeat; SQL SUM skips them, COUNT(*) doesn't) both
        # replicate into their windows like any other row
        etype = np.repeat(np.asarray(
            fill_null_key(t["event_type"]).to_pylist(), object),
            n_rep)[keepf]
        va = t["value"]
        if isinstance(va, pa.ChunkedArray):
            va = va.combine_chunks()
        valid = np.repeat(pc.is_valid(va).to_numpy(zero_copy_only=False),
                          n_rep)[keepf]
        vals = np.repeat(pc.fill_null(va, 0.0)
                         .to_numpy(zero_copy_only=False), n_rep)[keepf]
        return pa.table({
            "win_start": pa.array(starts.reshape(-1)[keepf], pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(vals, pa.float64(), mask=~valid),
            "one": pa.array(np.ones(int(keepf.sum()), dtype=np.int64)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              batch_size=None)
    partials = partial_groupby(
        exploded, ["win_start", "event_type"],
        [("value", "sum"), ("one", "sum")],
        ["sum_value", "n"],
    )
    out = partials.groupby(["win_start", "event_type"]).aggregate(
        Sum("n", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )
    return round_result(out, {"sum_value": 2}).map_batches(
        lambda t: restore_null_key(t, "event_type"), batch_format="pyarrow")


def value_band_counts(sf_dir: str, band_width: float = 5.0,
                      band_step: float = 2.0, n_bands: int = 10) -> rd.Dataset:
    """Broadcast range join: events against OVERLAPPING value bands
    [i*step, i*step + width); an event matches every band containing its
    value. The band table is the tiny side (broadcast as a constant into the
    batch fn); matching is one vectorized comparison per batch — the
    banded-range-join pattern (SURVEY §2 "Custom operators" path (a)).
    Output: band_id, n_events.
    """
    lo = np.arange(n_bands) * band_step
    hi = lo + band_width
    ds = load(sf_dir, "events", columns=["value"])

    def match(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        inside = (v[:, None] >= lo[None, :]) & (v[:, None] < hi[None, :])
        band_ids, counts = np.nonzero(inside)[1], None
        uniq, n = np.unique(band_ids, return_counts=True)  # per-batch partial
        return pa.table({"band_id": pa.array(uniq, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    partials = ds.map_batches(match, batch_format="pyarrow", batch_size=None)
    return partials.groupby("band_id").aggregate(Sum("n", alias_name="n_events"))


def median_value_by_type(sf_dir: str) -> rd.Dataset:
    """Exact per-group discrete median (lower middle): deterministic on both
    engines — sort the group, take the element at (n-1)//2."""
    ds = load(sf_dir, "events", columns=["event_type", "value"])

    def kern(t: pa.Table) -> pa.Table:
        # Arrow sort places NULL values at the end — the same order as
        # DuckDB's list_sort, so the (n-1)//2 pick (n = COUNT(*), nulls
        # included) lands on the identical element, NULL when more than
        # half the group's values are NULL
        t, starts, seg_len = sorted_segments(
            t, "event_type", [("event_type", "ascending"),
                              ("value", "ascending")])
        mids = pa.array(starts + (seg_len - 1) // 2, pa.int64())
        return restore_null_key(pa.table({
            "event_type": t["event_type"].take(pa.array(starts, pa.int64())),
            "median_value": pc.cast(t["value"].take(mids), pa.float64()),
            "n": pa.array(seg_len.astype(np.int64), pa.int64()),
        }), "event_type")

    def fill(t: pa.Table) -> pa.Table:
        # NULL event_type is a real group (SQL GROUP BY); the part hash
        # and the segment sort both need a non-null key
        return t.set_column(t.schema.get_field_index("event_type"),
                            "event_type", fill_null_key(t["event_type"]))

    return keyed_part_kernel(ds.map_batches(fill, batch_format="pyarrow"),
                             "event_type", kern)


def grouped_search(sf_dir: str, pattern: str = "vector") -> rd.Dataset:
    """Reference A1 end-to-end: search → group by container → top-1 + count.

    The exact shape of ``engine.rs:156-182``: hits grouped by ``source``
    (≙ file), each group contributes its best-scoring doc (ties → smallest
    doc_id) plus the group's match count (≙ total_matches_in_file).
    """
    ds = load(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def scan(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring(pc.fill_null(t["text"], ""),
                                       pattern=pattern), pa.int64())
        # NULL source is a real group (SQL PARTITION BY; sentinel-encoded)
        out = pa.table({"doc_id": t["doc_id"],
                        "source": fill_null_key(t["source"]),
                        "score": n})
        return out.filter(pc.greater(out["score"], 0))

    def top1(t: pa.Table) -> pa.Table:
        t, starts, seg_len = sorted_segments(
            t, "source", [("source", "ascending"), ("score", "descending"),
                          ("doc_id", "ascending")])
        idx = pa.array(starts, pa.int64())
        return restore_null_key(pa.table({
            "source": t["source"].take(idx),
            "doc_id": t["doc_id"].take(idx),
            "score": t["score"].take(idx),
            "n_docs_matched": pa.array(seg_len.astype(np.int64), pa.int64()),
        }), "source")

    hits = ds.map_batches(scan, batch_format="pyarrow")
    return keyed_part_kernel(hits, "source", top1)


def customers_without_orders(sf_dir: str,
                             num_partitions: int = 8) -> rd.Dataset:
    """Anti-join: customers with no order.

    Distinct order custkeys first (per-batch partial distinct, then a
    key-only groupby — the shuffle moves one row per key per batch), then a
    partitioned ``left_outer`` hash join and a null filter. No driver-side
    key set, so both sides stay fact-scale-safe.
    """
    cust = load(sf_dir, "customer", columns=["c_custkey"])
    okeys = load(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        lambda t: t.group_by(["o_custkey"]).aggregate([]),
        batch_format="pyarrow",
    ).groupby("o_custkey").aggregate(Count(alias_name="_n"))
    joined = cust.join(okeys, join_type="left_outer",
                       num_partitions=num_partitions,
                       on=("c_custkey",), right_on=("o_custkey",),
                       aggregator_ray_remote_args={"num_cpus": 0.05})
    return joined.map_batches(
        lambda t: pa.table({"c_custkey": t.filter(
            pc.is_null(t["_n"]))["c_custkey"]}),
        batch_format="pyarrow",
    )


def top3_orders_per_customer(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Per-group top-k (reference K1-K3 generalized): each customer's k
    highest-value orders.

    Per-batch local top-k partials shrink the shuffle to ≤k rows per
    (customer, batch) before the per-customer merge.
    """
    ds = load(sf_dir, "orders",
              columns=["o_custkey", "o_orderkey", "o_totalprice"])
    # SQL PARTITION BY puts all NULL custkeys in ONE partition; numpy key
    # scans would see NaN != NaN and split every null row into its own
    # segment — sentinel-encode through the kernel, restore at output
    null_int = np.iinfo(np.int64).min

    def fill(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("o_custkey"), "o_custkey",
            pc.fill_null(pc.cast(t["o_custkey"], pa.int64()), null_int))

    def restore(t: pa.Table) -> pa.Table:
        col = t["o_custkey"]
        return t.set_column(
            t.schema.get_field_index("o_custkey"), "o_custkey",
            pc.if_else(pc.equal(col, null_int),
                       pa.scalar(None, pa.int64()),
                       pc.cast(col, pa.int64())))

    ds = ds.map_batches(fill, batch_format="pyarrow")

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.sort_by([("o_custkey", "ascending"),
                       ("o_totalprice", "descending"),
                       ("o_orderkey", "ascending")])
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(keys)
        first = np.ones(n, dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        # rank within run: position minus the run-start offset
        run_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        rank = np.arange(n) - run_start
        return t.filter(pa.array(rank < k))

    def merge(t: pa.Table) -> pa.Table:
        t, starts, seg_len = sorted_segments(
            t, "o_custkey", [("o_custkey", "ascending"),
                             ("o_totalprice", "descending"),
                             ("o_orderkey", "ascending")])
        rank = (np.arange(t.num_rows, dtype=np.int64)
                - np.repeat(starts, seg_len))
        return restore(t.filter(pa.array(rank < k)))

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return keyed_part_kernel(partials, "o_custkey", merge)

def orders_segment_left_outer(sf_dir: str,
                              min_acctbal: float = 5000.0) -> rd.Dataset:
    """LEFT OUTER broadcast join + aggregate: every order survives.

    The dim side is customer FILTERED to ``c_acctbal > min_acctbal`` so real
    misses exist; orders whose customer falls outside the dim land in the
    ``(none)`` group instead of being dropped (the inner-join
    ``orders_per_segment`` semantics) or emitted as nulls (which the oracle
    hash compare cannot canonicalize). Same broadcast shape as the inner
    variant: the compiled lookup's miss code (-1) IS the outer row marker,
    so outer semantics cost nothing over inner.
    """
    cust_tbl = collect_table(
        load(sf_dir, "customer", columns=["c_custkey", "c_acctbal",
                                          "c_mktsegment"]))
    cust_tbl = cust_tbl.filter(pc.greater(cust_tbl["c_acctbal"],
                                          min_acctbal))
    gather, seg_dict = compile_int_lookup(cust_tbl["c_custkey"],
                                          cust_tbl["c_mktsegment"])
    # a matched customer whose segment is NULL shares the '(none)' COALESCE
    # bucket with unmatched orders (the twin groups by the coalesced label)
    # — fold its dictionary slot into the miss code before the shuffle
    null_code = (len(seg_dict) - 1
                 if len(seg_dict) and not seg_dict[-1].is_valid else -2)

    def join_partial(t: pa.Table) -> pa.Table:
        codes, _hit = gather(t["o_custkey"].to_numpy(zero_copy_only=False))
        codes = np.where(codes == null_code, np.int32(-1), codes)
        part = pa.table({
            "code": pa.array(codes, pa.int32()),  # -1 == outer (no match)
            "price": pc.cast(t["o_totalprice"], pa.float64()),
            "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
        })
        g = part.group_by(["code"]).aggregate(
            [("price", "sum"), ("one", "sum")])
        return g.rename_columns(["code", "sum_price", "n"])

    partials = load(sf_dir, "orders",
                    columns=["o_custkey", "o_totalprice"]) \
        .map_batches(join_partial, batch_format="pyarrow")
    out = partials.groupby("code").aggregate(
        Sum("n", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_totalprice"),
    )

    def decode(t: pa.Table) -> pa.Table:
        codes = t["code"].to_numpy(zero_copy_only=False)
        # a matched customer whose segment is NULL lands in the same
        # COALESCE bucket as an unmatched order (twin: COALESCE(..,
        # '(none)') cannot tell the two apart)
        seg = np.asarray([s if s is not None else "(none)"
                          for s in seg_dict.to_pylist()], dtype=object)
        names = np.where(codes >= 0, seg[np.clip(codes, 0, None)], "(none)")
        return pa.table({"c_mktsegment": pa.array(names, pa.string()),
                         "n_orders": t["n_orders"],
                         "sum_totalprice": t["sum_totalprice"]})

    return round_result(out.map_batches(decode, batch_format="pyarrow"),
                        {"sum_totalprice": 2})


def key_set_op(a: rd.Dataset, a_col: str, b: rd.Dataset, b_col: str,
               op: str, out_col: str) -> rd.Dataset:
    """Distinct-key INTERSECT / EXCEPT between two datasets.

    Shape: per-block distinct + a presence bitmap per side, one union, one
    key groupby over the (distinct-per-block, so already shrunk) partials
    with MAX bitmaps, then a bitmap filter. The shuffle moves one row per
    (key, block) — never one per input row — and no side is collected.
    """
    if op not in ("intersect", "except"):
        raise ValueError(op)

    def tag(col: str, is_a: bool):
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by([col]).aggregate([])
            n = g.num_rows
            ones = np.ones(n, dtype=np.int8)
            zeros = np.zeros(n, dtype=np.int8)
            return pa.table({
                "key": pc.cast(g[col], pa.int64()),
                "in_a": pa.array(ones if is_a else zeros, pa.int8()),
                "in_b": pa.array(zeros if is_a else ones, pa.int8()),
            })
        return f

    u = a.map_batches(tag(a_col, True), batch_format="pyarrow").union(
        b.map_batches(tag(b_col, False), batch_format="pyarrow"))
    g = u.groupby("key").aggregate(Max("in_a", alias_name="in_a"),
                                   Max("in_b", alias_name="in_b"))

    def pick(t: pa.Table) -> pa.Table:
        in_a = pc.equal(t["in_a"], 1)
        in_b = pc.equal(t["in_b"], 1)
        keep = pc.and_(in_a, in_b) if op == "intersect" \
            else pc.and_(in_a, pc.invert(in_b))
        return pa.table({out_col: t.filter(keep)["key"]})

    return g.map_batches(pick, batch_format="pyarrow")


def active_customer_keys(sf_dir: str) -> rd.Dataset:
    """INTERSECT: order custkeys that also appear as event user ids."""
    return key_set_op(load(sf_dir, "orders", columns=["o_custkey"]),
                      "o_custkey",
                      load(sf_dir, "events", columns=["user_id"]),
                      "user_id", "intersect", "o_custkey")


def inactive_customer_keys(sf_dir: str) -> rd.Dataset:
    """EXCEPT: order custkeys with no event activity."""
    return key_set_op(load(sf_dir, "orders", columns=["o_custkey"]),
                      "o_custkey",
                      load(sf_dir, "events", columns=["user_id"]),
                      "user_id", "except", "o_custkey")


# The pivot's column set must be static (it IS the output schema); the
# events generator emits exactly these types at every scale factor.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_hour_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot / crosstab: hour-of-day rows x one count column per event type.

    The wide form is produced INSIDE each block (group (hour, type), then
    scatter counts into the fixed type columns), so the global shuffle is a
    plain per-hour SUM over <=24 x blocks partial rows — the pivot itself
    never shuffles strings and needs no per-group Python.
    """
    type_idx = {t: i for i, t in enumerate(EVENT_TYPES)}
    k = len(EVENT_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        # a NULL ts groups as a NULL hour in SQL; -1 is the shuffle-safe
        # stand-in (real hours are 0..23), decoded after the aggregate
        hour = pc.fill_null(pc.cast(pc.hour(t["ts"]), pa.int64()), -1)
        g = pa.table({"hour": hour, "event_type": t["event_type"]}) \
            .group_by(["hour", "event_type"]).aggregate([([], "count_all")])
        hours = g["hour"].to_numpy(zero_copy_only=False)
        uniq_hours = np.unique(hours)
        row_of = {int(h): i for i, h in enumerate(uniq_hours)}
        wide = np.zeros((len(uniq_hours), k), dtype=np.int64)
        types = g["event_type"].to_pylist()  # <= 24*k rows: already grouped
        counts = g["count_all"].to_numpy(zero_copy_only=False)
        for h, ty, c in zip(hours, types, counts):
            # NULL or unknown event_type counts in no pivot column (the
            # twin's FILTER clauses match none) but its hour row remains
            j = type_idx.get(ty)
            if j is not None:
                wide[row_of[int(h)], j] = c
        cols = {"hour": pa.array(uniq_hours, pa.int64())}
        for i, ty in enumerate(EVENT_TYPES):
            cols[f"{ty}_n"] = pa.array(wide[:, i], pa.int64())
        return pa.table(cols)

    def restore_hour(t: pa.Table) -> pa.Table:
        col = t["hour"]
        return t.set_column(
            t.schema.get_field_index("hour"), "hour",
            pc.if_else(pc.equal(col, -1), pa.scalar(None, pa.int64()),
                       pc.cast(col, pa.int64())))

    aggs = [Sum(f"{ty}_n", alias_name=f"{ty}_n") for ty in EVENT_TYPES]
    return load(sf_dir, "events", columns=["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("hour").aggregate(*aggs) \
        .map_batches(restore_hour, batch_format="pyarrow")


def segment_priority_rollup(sf_dir: str) -> rd.Dataset:
    """GROUP BY ROLLUP(segment, priority): leaf groups + per-segment
    subtotals + a grand total, subtotal levels labelled ``(all)``.

    ONE pass over the fact table produces (segment-code, priority)
    partials; all three rollup levels aggregate those same partials (the
    input is never re-read), so the extra levels cost two tiny shuffles
    over per-block partial rows. Sums round once per OUTPUT row, after
    each level's fold — same order as the SQL twin's FLOOR.
    """
    cust_tbl = collect_table(
        load(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]))
    gather, seg_dict = compile_int_lookup(cust_tbl["c_custkey"],
                                          cust_tbl["c_mktsegment"])
    seg_names = np.asarray(seg_dict.to_pylist(), dtype=object)

    def join_partial(t: pa.Table) -> pa.Table:
        codes, hit = gather(t["o_custkey"].to_numpy(zero_copy_only=False))
        hm = pa.array(hit)
        part = pa.table({
            "code": pa.array(codes[hit], pa.int32()),
            # sentinel-encode NULL priorities: a real GROUP BY value (the
            # twin labels it '(all)' via COALESCE), but the distributed
            # groupby cannot sort a None key
            "prio": fill_null_key(pc.cast(t["o_orderpriority"],
                                          pa.string())).filter(hm),
            "price": pc.cast(t["o_totalprice"], pa.float64()).filter(hm),
            "one": pa.array(np.ones(int(hit.sum()), dtype=np.int64)),
        })
        g = part.group_by(["code", "prio"]).aggregate(
            [("price", "sum"), ("one", "sum")])
        return g.rename_columns(["code", "prio", "sum_price", "n"])

    partials = load(sf_dir, "orders",
                    columns=["o_custkey", "o_orderpriority",
                             "o_totalprice"]) \
        .map_batches(join_partial, batch_format="pyarrow").materialize()

    def decode(t: pa.Table, with_prio: bool) -> pa.Table:
        codes = t["code"].to_numpy(zero_copy_only=False)
        # data-NULL segments/priorities take the same '(all)' COALESCE
        # label as rollup subtotal rows — they remain SEPARATE rows, as in
        # GROUP BY ROLLUP (grouping is on the raw values)
        labels = np.asarray([s if s is not None else "(all)"
                             for s in seg_names], dtype=object)
        seg = pa.array(labels[codes], pa.string())
        if with_prio:
            prio = pc.if_else(pc.equal(t["prio"], NULL_KEY),
                              pa.scalar("(all)"),
                              pc.cast(t["prio"], pa.string()))
        else:
            prio = pa.array(np.full(t.num_rows, "(all)", dtype=object),
                            pa.string())
        return pa.table({"c_mktsegment": seg, "o_orderpriority": prio,
                         "n_orders": t["n_orders"],
                         "sum_totalprice": t["sum_totalprice"]})

    leaf = partials.groupby(["code", "prio"]).aggregate(
        Sum("n", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_totalprice")) \
        .map_batches(lambda t: decode(t, True), batch_format="pyarrow")
    per_seg = partials.groupby("code").aggregate(
        Sum("n", alias_name="n_orders"),
        Sum("sum_price", alias_name="sum_totalprice")) \
        .map_batches(lambda t: decode(t, False), batch_format="pyarrow")

    tot = collect_table(partials)
    grand = rd.from_arrow(pa.table({
        "c_mktsegment": pa.array(["(all)"], pa.string()),
        "o_orderpriority": pa.array(["(all)"], pa.string()),
        "n_orders": pa.array([int(pc.sum(tot["n"]).as_py() or 0)],
                             pa.int64()),
        "sum_totalprice": pa.array(
            [float(pc.sum(tot["sum_price"]).as_py() or 0.0)], pa.float64()),
    }))
    return round_result(leaf.union(per_seg).union(grand),
                        {"sum_totalprice": 2})
