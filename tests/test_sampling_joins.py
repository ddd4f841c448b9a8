"""Fixture-based tests for the round-2 relational additions: deterministic
hash-mod sampling, the anti-join (non-empty case — the driver testdata has no
customer without orders), and per-group top-k vs a pandas oracle."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from sema_ray.sampling import hash_mod_sample, sample_events
from sema_ray.relational import customers_without_orders, top3_orders_per_customer

SF_DIR = "/root/testdata/sf0.001"


def test_hash_mod_sample_deterministic_and_partition_invariant(ray_session):
    ds = rd.read_parquet(os.path.join(SF_DIR, "events.parquet"),
                         columns=["event_id", "user_id"])
    a = sample_events(SF_DIR, rate=0.25).to_pandas().sort_values("event_id")
    b = sample_events(SF_DIR, rate=0.25).to_pandas().sort_values("event_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    n = ds.count()
    # Knuth multiplicative hash on sequential ids: rate within loose bounds
    assert 0.15 * n < len(a) < 0.35 * n, (len(a), n)
    # invariant under repartitioning (pure per-row predicate)
    c = hash_mod_sample(ds.repartition(7), "event_id", 0.25) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert a.reset_index(drop=True).equals(c)
    # monotone: a lower rate's sample is a subset
    d = sample_events(SF_DIR, rate=0.1).to_pandas()
    assert set(d["event_id"]) <= set(a["event_id"])


def test_customers_without_orders_nonempty(ray_session, tmp_path):
    cust = pa.table({"c_custkey": pa.array(list(range(1, 21)), pa.int64())})
    # orders reference only even custkeys (with repeats)
    okeys = [k for k in range(2, 21, 2) for _ in range(3)]
    orders = pa.table({"o_custkey": pa.array(okeys, pa.int64())})
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = customers_without_orders(str(tmp_path)).to_pandas()
    assert sorted(got["c_custkey"]) == list(range(1, 21, 2))


def test_top3_orders_per_customer_vs_pandas(ray_session):
    got = top3_orders_per_customer(SF_DIR).to_pandas()
    df = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"),
                         columns=["o_custkey", "o_orderkey", "o_totalprice"])
    want = (df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                           ascending=[True, False, True])
            .groupby("o_custkey").head(3))
    cols = ["o_custkey", "o_orderkey", "o_totalprice"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


def test_revenue_join_paths_agree(ray_session, monkeypatch):
    """Broadcast (closure), broadcast (actor-pool) and partitioned-shuffle
    join placements must produce identical aggregates; the lookup gather
    must be miss-safe (inner-join semantics on unmatched fact keys)."""
    import sema_ray.relational as rel

    def run():
        df = rel.revenue_by_priority(SF_DIR).to_pandas()
        return df.sort_values("o_orderpriority").reset_index(drop=True)

    closure = run()
    monkeypatch.setattr(rel, "BROADCAST_CLOSURE_MAX_ROWS", 0)
    actor_pool = run()
    monkeypatch.setattr(rel, "BROADCAST_JOIN_MAX_ROWS", 0)
    shuffle = run()
    pd.testing.assert_frame_equal(closure, actor_pool)
    pd.testing.assert_frame_equal(closure, shuffle)


def test_revenue_null_measures_match_sql(ray_session, tmp_path, monkeypatch):
    """SUM(ext*(1-disc)) skips rows where EITHER factor is NULL while
    COUNT(*) keeps them, and a group whose every pair is NULL emits a NULL
    revenue — on BOTH join placements (round-5 review: the broadcast and
    shuffle paths fed NaN cents into the exact-sum fold and crashed)."""
    import duckdb
    import sema_ray.relational as rel

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, 11, 11], pa.int64()),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH", "2-HIGH", "3-MEDIUM"], pa.string()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4, 4], pa.int64()),
        # priority 3-MEDIUM (orderkey 4): every pair has a NULL factor ->
        # SQL SUM is NULL; 1-URGENT mixes one valid and one NULL-ext row
        "l_extendedprice": pa.array(
            [100.0, None, 50.0, 60.0, None, 70.0], pa.float64()),
        "l_discount": pa.array(
            [0.1, 0.05, 0.0, None, 0.2, None], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))

    con = duckdb.connect()
    for tname in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{tname}.parquet')")
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = (con.execute(mod.oracle_sql()["revenue_by_priority"]).df()
            .sort_values("o_orderpriority").reset_index(drop=True))
    assert want["revenue"].isna().any()  # the corpus exercises NULL SUM

    def run():
        df = rel.revenue_by_priority(str(tmp_path)).to_pandas()
        return df.sort_values("o_orderpriority").reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(rel, "BROADCAST_JOIN_MAX_ROWS", 0)
    shuffle = run()
    for got in (broadcast, shuffle):
        pd.testing.assert_frame_equal(
            got[["o_orderpriority", "n_items", "revenue"]],
            want[["o_orderpriority", "n_items", "revenue"]],
            check_dtype=False)


def test_compile_int_lookup_misses_and_dictionary():
    from sema_ray.relational import compile_int_lookup
    keys = pa.chunked_array([pa.array([7, 3, 11], pa.int64())])
    vals = pa.chunked_array([pa.array(["a", "b", "a"], pa.string())])
    gather, d = compile_int_lookup(keys, vals)
    codes, hit = gather(np.array([3, 4, 11, 99, 7], dtype=np.int64))
    assert hit.tolist() == [True, False, True, False, True]
    got = [d[c].as_py() if h else None for c, h in zip(codes, hit)]
    assert got == ["b", None, "a", None, "a"]
    # empty dim side: everything misses
    g2, _ = compile_int_lookup(pa.array([], pa.int64()),
                               pa.array([], pa.string()))
    codes2, hit2 = g2(np.array([1, 2], dtype=np.int64))
    assert not hit2.any()


def test_key_set_op_semantics(ray_session):
    """INTERSECT keeps only keys on both sides; EXCEPT keeps a-only keys;
    b-only keys never appear in either output; duplicates collapse."""
    from sema_ray.relational import key_set_op
    a = rd.from_arrow(pa.table({"k": pa.array([1, 1, 2, 3, 5], pa.int64())}))
    b = rd.from_arrow(pa.table({"j": pa.array([2, 2, 3, 9], pa.int64())}))
    inter = key_set_op(a, "k", b, "j", "intersect", "k").to_pandas()
    exc = key_set_op(a, "k", b, "j", "except", "k").to_pandas()
    assert sorted(inter["k"]) == [2, 3]
    assert sorted(exc["k"]) == [1, 5]


def test_left_outer_join_keeps_all_orders(ray_session):
    """Outer group + inner groups together must account for every order."""
    from sema_ray.relational import orders_segment_left_outer
    out = orders_segment_left_outer(SF_DIR).to_pandas()
    n_orders = pq.ParquetFile(
        os.path.join(SF_DIR, "orders.parquet")).metadata.num_rows
    assert out["n_orders"].sum() == n_orders
    assert "(none)" in set(out["c_mktsegment"])


def test_event_pivot_row_sums_match_totals(ray_session):
    """Pivoted per-hour counts sum back to the raw event count."""
    from sema_ray.relational import event_type_hour_pivot, EVENT_TYPES
    out = event_type_hour_pivot(SF_DIR).to_pandas()
    n_events = pq.ParquetFile(
        os.path.join(SF_DIR, "events.parquet")).metadata.num_rows
    assert sum(out[f"{t}_n"].sum() for t in EVENT_TYPES) == n_events


def test_rollup_levels_consistent(ray_session):
    """Each rollup level must re-aggregate to the same totals: the grand
    total equals the sum of per-segment subtotals equals the sum of leaves."""
    from sema_ray.relational import segment_priority_rollup
    out = segment_priority_rollup(SF_DIR).to_pandas()
    leaf = out[(out.c_mktsegment != "(all)") & (out.o_orderpriority != "(all)")]
    seg = out[(out.c_mktsegment != "(all)") & (out.o_orderpriority == "(all)")]
    grand = out[(out.c_mktsegment == "(all)")]
    assert len(grand) == 1
    assert leaf["n_orders"].sum() == seg["n_orders"].sum() \
        == grand["n_orders"].iloc[0]
    assert abs(leaf["sum_totalprice"].sum()
               - grand["sum_totalprice"].iloc[0]) < 0.05


def test_assign_splits_partition_and_leakage_properties(ray_session):
    """Every doc in exactly one split, deterministic across runs and
    repartitioning, ratios near 0.9/0.05/0.05."""
    from sema_ray.sampling import assign_splits
    a = assign_splits(SF_DIR).to_pandas().sort_values("doc_id",
                                                      ignore_index=True)
    b = assign_splits(SF_DIR).to_pandas().sort_values("doc_id",
                                                      ignore_index=True)
    assert a.equals(b)
    docs = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id"])
    assert sorted(a["doc_id"]) == sorted(docs["doc_id"])
    frac = a["split"].value_counts(normalize=True)
    assert frac["train"] > 0.8
    assert frac.get("val", 0) < 0.15 and frac.get("test", 0) < 0.15
    assert set(a["split"]) <= {"train", "val", "test"}


def test_asof_join_segmented_semantics(ray_session):
    """Direct contract check of the generic as-of join (now a bounded-part
    segmented kernel, not per-key map_groups): latest right row with
    right_ts <= left_ts per key, inclusive ties, null timestamps never
    match, keys with no right rows drop (inner join)."""
    import pyarrow as pa
    import ray.data as rd

    from sema_ray.relational import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "lts": pa.array([5, 10, 2, 7, None, 6, 1], pa.int64()),
        "lid": pa.array(list(range(7)), pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "rts": pa.array([3, 10, 8, None, 9], pa.int64()),
        "val": pa.array([30, 100, 80, 999, 90], pa.int64()),
    }))
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"], n_parts=4).to_pandas() \
        .sort_values("lid", ignore_index=True)
    got = {(r.k, r.lid): r.val for r in out.itertuples()}
    # k=1: lts=5 -> rts=3; lts=10 -> rts=10 (inclusive); lts=2 -> no match
    # k=2: lts=7 -> none (rts=8 too late, null never matches); null lts drops
    # k=3: lts=6 < 9 -> none; k=4: no right rows -> drops
    assert got == {(1, 0): 30, (1, 1): 100}
    assert list(out.columns) == ["k", "lts", "lid", "val"]


def test_asof_join_float_timestamps(ray_session):
    """The generic operator accepts float timestamps (fractional epoch
    seconds); the int64 fast path must not force an unsafe cast."""
    import pyarrow as pa
    import ray.data as rd

    from sema_ray.relational import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lts": pa.array([5.5, 2.25, 7.0], pa.float64()),
        "lid": pa.array([0, 1, 2], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "rts": pa.array([5.5, 3.0, 6.75], pa.float64()),
        "val": pa.array([55, 30, 67], pa.int64()),
    }))
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"], n_parts=2).to_pandas() \
        .sort_values("lid", ignore_index=True)
    got = {(r.k, r.lid): r.val for r in out.itertuples()}
    # k=1: 5.5 matches rts=5.5 inclusively; 2.25 precedes every right row
    assert got == {(1, 0): 55, (2, 2): 67}


def test_asof_join_mixed_int_float_guard(ray_session):
    """Mixed float/int timestamp sides: int values >= 2^53 would silently
    lose precision in the float64 comparison domain — the operator must
    raise instead (ADVICE r4). Small mixed values still work exactly."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from sema_ray.relational import asof_join

    big = (1 << 53) + 1  # not float64-representable
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "lts": pa.array([big, 10], pa.int64()),
        "lid": pa.array([0, 1], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rts": pa.array([9.5], pa.float64()),
        "val": pa.array([95], pa.int64()),
    }))
    with pytest.raises((ValueError, Exception)) as ei:
        asof_join(left, right, key="k", left_ts="lts", right_ts="rts",
                  value_cols=["val"], n_parts=1).to_pandas()
    assert "2^53" in str(ei.value)

    # small mixed int/float values: exact and inclusive as usual
    left2 = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "lts": pa.array([10, 5], pa.int64()),
        "lid": pa.array([0, 1], pa.int64()),
    }))
    out = asof_join(left2, right, key="k", left_ts="lts", right_ts="rts",
                    value_cols=["val"], n_parts=1).to_pandas()
    got = {r.lid: r.val for r in out.itertuples()}
    assert got == {0: 95}  # lts=5 precedes rts=9.5 -> dropped (inner)


def test_exact_prio_sums_factor_overflow():
    """The overflow guard must fire on the FACTORS, pre-product: a cents
    value whose product with (100 - d100) wraps int64 must still sum
    exactly via the bigint fold (ADVICE r4)."""
    import numpy as np

    from sema_ray.relational import _exact_prio_sums

    c = np.array([1 << 60, -(1 << 60), 7], dtype=np.int64)
    d100 = np.array([0, 5, 10], dtype=np.int64)
    code = np.array([0, 0, 1], dtype=np.int64)
    got = _exact_prio_sums(code, c, d100, 2)
    want0 = (1 << 60) * 100 + (-(1 << 60)) * 95  # exact Python ints
    assert got == [want0, 7 * 90]
    # fast path agrees with the exact path on small values
    c2 = np.array([123456, -999], dtype=np.int64)
    d2 = np.array([3, 7], dtype=np.int64)
    assert _exact_prio_sums(np.array([0, 0]), c2, d2, 1) \
        == [123456 * 97 + (-999) * 93]
