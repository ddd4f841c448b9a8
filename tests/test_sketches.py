"""HyperLogLog sketch: accuracy vs exact distinct, merge semantics,
determinism under repartitioning."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from sema_ray.sketches import HLL, _hash64, approx_distinct


def test_hll_accuracy_single():
    h = HLL(p=12)
    n = 50_000
    h.add_hashes(_hash64([f"user-{i}" for i in range(n)]))
    est = h.estimate()
    assert abs(est - n) / n < 0.05, est


def test_hll_merge_equals_union():
    a, b, u = HLL(), HLL(), HLL()
    xs = [f"x{i}" for i in range(10_000)]
    ys = [f"y{i}" for i in range(5_000)] + xs[:2_000]  # overlap
    a.add_hashes(_hash64(xs))
    b.add_hashes(_hash64(ys))
    u.add_hashes(_hash64(list(set(xs) | set(ys))))
    assert a.merge(b).estimate() == u.estimate()


def test_approx_distinct_distributed(ray_session):
    vals = [i % 1234 for i in range(30_000)]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds, "v")
    assert abs(est - 1234) / 1234 < 0.05, est
    # invariant under block structure
    ds2 = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})) \
        .repartition(13)
    assert approx_distinct(ds2, "v") == est


def test_cms_never_undercounts_and_merge_is_linear():
    from sema_ray.sketches import CountMinSketch, _hash64
    rng = np.random.default_rng(23)
    keys = [f"k{i}" for i in range(5000)]
    weights = rng.integers(1, 50, size=5000)
    hs = _hash64(keys)
    full = CountMinSketch(width=4096, depth=4)
    full.add_hashes(hs, weights)
    est = full.estimate(hs)
    assert (est >= weights).all()                 # CMS never undercounts
    n = int(weights.sum())
    assert (est <= weights + 2.0 * n * 4 / 4096).all()
    assert full.total == n
    # linearity: sum of split partials == one-shot build
    a, b = CountMinSketch(4096, 4), CountMinSketch(4096, 4)
    a.add_hashes(hs[:2500], weights[:2500])
    b.add_hashes(hs[2500:], weights[2500:])
    assert (a.merge(b).counts == full.counts).all()


def test_cms_heavy_hitters_flags_ok(ray_session):
    from sema_ray.sketches import cms_heavy_hitters
    t = cms_heavy_hitters("/root/testdata/sf0.001", k=10)
    df = t.to_pandas()
    assert len(df) == 10
    assert df["cms_ok"].all()
    assert (df["n"].values[:-1] >= df["n"].values[1:]).all()
