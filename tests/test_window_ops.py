"""Ordered-per-key window ops (running totals, gaps, z-scores, source cap):
pandas oracles + partition invariance of the bounded-part shuffle shape."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from sema_ray.relational import (cents64, event_gaps, keyed_part_kernel,
                                 running_user_totals, zscore_by_type)
from sema_ray.sampling import docs_per_source_cap

SF_DIR = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "events.parquet"),
                           columns=["event_id", "user_id", "ts", "value"])


def test_running_user_totals_vs_pandas(ray_session):
    got = running_user_totals(SF_DIR).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = _events().sort_values(["user_id", "ts", "event_id"])
    df["cents"] = cents64(pa.array(df["value"]))
    df["running_n"] = df.groupby("user_id").cumcount() + 1
    df["running_cents"] = df.groupby("user_id")["cents"].cumsum()
    want = df[["event_id", "user_id", "running_n", "running_cents"]] \
        .sort_values("event_id").reset_index(drop=True)
    want["running_n"] = want["running_n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_event_gaps_vs_pandas(ray_session):
    got = event_gaps(SF_DIR).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    df = _events().sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].astype("int64")
    gap = us - us.shift(1)
    gap[df["user_id"] != df["user_id"].shift(1)] = -1
    want = pd.DataFrame({"event_id": df["event_id"],
                         "gap_us": gap.astype("int64")}) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_zscore_by_type_moments(ray_session):
    got = zscore_by_type(SF_DIR).to_pandas()
    df = _events()
    et = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"),
                         columns=["event_id", "event_type"])
    df = df.merge(et, on="event_id")
    df["cents"] = cents64(pa.array(df["value"])).astype(float)
    g = df.groupby("event_type")["cents"]
    mean = g.transform("mean")
    std = np.sqrt(g.transform(lambda s: ((s - s.mean()) ** 2).mean()))
    want_z = (df["cents"] - mean) / std
    j = got.merge(pd.DataFrame({"event_id": df["event_id"], "w": want_z}),
                  on="event_id")
    assert np.allclose(j["z"], j["w"], atol=2e-6)
    # z-scores are standardized within each type
    jj = j.merge(et, on="event_id")
    for _, grp in jj.groupby("event_type"):
        assert abs(grp["z"].mean()) < 1e-3
        assert abs(grp["z"].std(ddof=0) - 1.0) < 1e-3


def test_docs_per_source_cap(ray_session):
    got = docs_per_source_cap(SF_DIR, cap=20).to_pandas()
    df = pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "source"])
    want = (df.sort_values(["source", "doc_id"]).groupby("source").head(20))
    cols = ["doc_id", "source"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))
    assert (got.groupby("source").size() <= 20).all()


def test_keyed_part_kernel_partition_invariance(ray_session, tmp_path):
    """Repartitioning the input must not change any ordered-kernel output,
    and every key's rows must arrive in ONE kernel call (whole groups)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n), pa.int64()),
        "v": pa.array(rng.standard_normal(n), pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "t.parquet"))

    def kern(g: pa.Table) -> pa.Table:
        # per-key count — correct ONLY if groups arrive whole
        gg = g.group_by(["k"]).aggregate([("v", "count")])
        return gg.rename_columns(["k", "n"])

    def run(blocks: int) -> pd.DataFrame:
        ds = rd.read_parquet(str(tmp_path / "t.parquet")) \
            .repartition(blocks)
        return keyed_part_kernel(ds, "k", kern, n_parts=8).to_pandas() \
            .sort_values("k").reset_index(drop=True)

    a, b = run(1), run(13)
    pd.testing.assert_frame_equal(a, b)
    want = pd.DataFrame(
        {"k": t["k"].to_numpy()}).groupby("k").size().rename("n")
    assert dict(zip(a["k"], a["n"])) == dict(want)
