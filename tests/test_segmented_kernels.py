"""Scale-shape guard for the segmented per-key kernels (VERDICT r3 item 1).

`groupby(key).map_groups` costs one Python call per key; the migrated ops
run ONE vectorized kernel per bounded part instead. These tests pin both
properties:

* correctness on a synthetic table with ~10^6 DISTINCT keys against a
  pandas oracle, and
* the no-per-key-Python shape: the kernel body runs at most ORDERED_PARTS
  times (counted via a side-channel column), which is what makes the op
  viable at 10^8-10^9 keys — a wall-time bound would be flaky on this
  co-tenant host, the call count is deterministic.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from sema_ray.relational import (ORDERED_PARTS, keyed_part_kernel,
                                 sorted_segments)

N_KEYS = 1_000_000


@pytest.fixture(scope="module")
def million_key_table():
    rng = np.random.default_rng(7)
    # ~1M distinct int keys, 1-3 rows each, shuffled
    reps = rng.integers(1, 4, size=N_KEYS)
    keys = np.repeat(np.arange(N_KEYS, dtype=np.int64) * 7 + 13, reps)
    order = rng.permutation(len(keys))
    keys = keys[order]
    vals = rng.integers(0, 1 << 30, size=len(keys)).astype(np.int64)
    return pa.table({"k": keys, "v": vals})


def test_million_key_top1_completes_with_bounded_kernel_calls(
        ray_session, million_key_table):
    t = million_key_table

    def kern(g: pa.Table) -> pa.Table:
        g, starts, seg_len = sorted_segments(
            g, "k", [("k", "ascending"), ("v", "ascending")])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            "k": g["k"].take(idx),
            "min_v": g["v"].take(idx),
            "n": pa.array(seg_len.astype(np.int64), pa.int64()),
            # every row emitted by one kernel INVOCATION carries the same
            # marker (the part's first key — parts are disjoint, so markers
            # are distinct across invocations): distinct markers == calls
            "call_marker": pa.array(
                np.full(len(starts), g["k"][0].as_py(), np.int64),
                pa.int64()),
        })

    ds = rd.from_arrow(t).repartition(16)
    out = keyed_part_kernel(ds, "k", kern).to_pandas()

    assert len(out) == N_KEYS
    # ≤ ORDERED_PARTS kernel invocations total (each invocation stamps every
    # row it emits with the same marker value)
    n_calls = out.groupby("call_marker").ngroups
    assert n_calls <= ORDERED_PARTS

    # correctness vs pandas on the full table
    df = t.to_pandas()
    want = df.sort_values(["k", "v"]).groupby("k", as_index=False).agg(
        min_v=("v", "first"), n=("v", "size"))
    got = out[["k", "min_v", "n"]].sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_string_key_segments_match_pandas(ray_session):
    rng = np.random.default_rng(3)
    keys = [f"src_{i % 997}" for i in rng.integers(0, 5000, size=20000)]
    vals = rng.integers(0, 1000, size=20000).astype(np.int64)
    t = pa.table({"k": pa.array(keys, pa.string()), "v": vals})

    def kern(g: pa.Table) -> pa.Table:
        g, starts, seg_len = sorted_segments(
            g, "k", [("k", "ascending"), ("v", "descending")])
        idx = pa.array(starts, pa.int64())
        return pa.table({"k": g["k"].take(idx), "max_v": g["v"].take(idx),
                         "n": pa.array(seg_len.astype(np.int64), pa.int64())})

    out = keyed_part_kernel(rd.from_arrow(t).repartition(8), "k", kern) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    df = pd.DataFrame({"k": keys, "v": vals})
    want = df.groupby("k", as_index=False).agg(max_v=("v", "max"),
                                               n=("v", "size"))
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
