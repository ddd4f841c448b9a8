"""Distributed k-means + cluster-balanced sampling.

The testdata embeddings are isotropic noise (no cluster structure), so
mixture-recovery runs on a synthesized well-separated Gaussian mixture
written with the exact embeddings.parquet schema (vec_id, embedding,
label); the public-surface checks run on the real testdata.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from sema_ray import clustering

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def mixture_dir(tmp_path_factory):
    """6 well-separated unit-mean Gaussian clusters, 600 vectors, dim 32."""
    rng = np.random.default_rng(7)
    k, per, d = 6, 100, 32
    means = rng.normal(size=(k, d))
    means /= np.linalg.norm(means, axis=1, keepdims=True)
    vecs = np.repeat(means, per, axis=0) + 0.05 * rng.normal(
        size=(k * per, d))
    labels = np.repeat(np.arange(k, dtype=np.int32), per)
    perm = rng.permutation(k * per)
    vecs, labels = vecs[perm], labels[perm]
    d_dir = tmp_path_factory.mktemp("mixture")
    tbl = pa.table({
        "vec_id": pa.array(np.arange(k * per, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1).astype(np.float32)), d).cast(
                pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, os.path.join(str(d_dir), "embeddings.parquet"),
                   row_group_size=64)  # several blocks -> real partials
    return str(d_dir)


def _purity(assign: dict[int, int], labels: np.ndarray) -> float:
    """Fraction of points whose cluster's majority label is their label."""
    from collections import Counter, defaultdict
    by_cluster = defaultdict(list)
    for vid, cl in assign.items():
        by_cluster[cl].append(labels[vid])
    hit = sum(Counter(v).most_common(1)[0][1] for v in by_cluster.values())
    return hit / len(assign)


def test_kmeans_recovers_mixture(ray_session, mixture_dir):
    out = clustering.kmeans_clusters(mixture_dir, k=6, n_iter=12).to_pandas()
    labels = pq.read_table(
        os.path.join(mixture_dir, "embeddings.parquet"))["label"].to_numpy()
    assert len(out) == 600
    assign = dict(zip(out["vec_id"], out["cluster"]))
    assert _purity(assign, labels) >= 0.95


def test_kmeans_deterministic_on_same_layout(ray_session, mixture_dir):
    a = clustering.kmeans_clusters(mixture_dir, k=6).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    b = clustering.kmeans_clusters(mixture_dir, k=6).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    assert a.equals(b)


def test_kmeans_runs_on_testdata(ray_session):
    out = clustering.kmeans_clusters(SF_DIR, k=4, n_iter=4).to_pandas()
    n = pq.ParquetFile(
        os.path.join(SF_DIR, "embeddings.parquet")).metadata.num_rows
    assert len(out) == n
    assert set(out.columns) == {"vec_id", "cluster"}
    assert out["cluster"].between(0, 3).all()


def test_balanced_sample_caps_and_is_deterministic(ray_session, mixture_dir):
    cap = 10
    s1 = clustering.cluster_balanced_sample(mixture_dir, k=6, cap=cap) \
        .to_pandas()
    s2 = clustering.cluster_balanced_sample(mixture_dir, k=6, cap=cap) \
        .to_pandas()
    assert s1.equals(s2)
    sizes = s1.groupby("cluster").size()
    assert (sizes <= cap).all()
    # 600 points over 6 recovered clusters: every cluster is full
    assert sizes.sum() == 6 * cap
    # the sample is a subset of the full assignment
    full = clustering.kmeans_clusters(mixture_dir, k=6).to_pandas()
    merged = s1.merge(full, on="vec_id", suffixes=("_s", "_f"))
    assert (merged["cluster_s"] == merged["cluster_f"]).all()


def test_kmeans_needs_enough_vectors(ray_session, mixture_dir):
    ds = rd.read_parquet(
        os.path.join(mixture_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).limit(3)
    with pytest.raises(ValueError):
        clustering.kmeans_fit(ds, k=6)


def test_pca_matches_numpy_reference(ray_session, mixture_dir):
    from sema_ray.clustering import pca_embeddings, _load_embeddings
    from sema_ray.simsearch import _batch_matrix
    from sema_ray.util import collect_table
    out_dim = 4
    got = pca_embeddings(mixture_dir, out_dim=out_dim).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    full = collect_table(_load_embeddings(mixture_dir)).sort_by("vec_id")
    m = _batch_matrix(full)
    mean = m.mean(axis=0)
    cov = np.cov(m.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:out_dim]
    comps = evecs[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(out_dim)])
    flip[flip == 0] = 1.0
    want = (m - mean[None, :]) @ (comps * flip[None, :])
    got_m = np.array(got["proj"].tolist())
    assert np.allclose(got_m, want, atol=1e-8)
    # captured variance is non-increasing across components
    var = got_m.var(axis=0)
    assert (np.diff(var) <= 1e-9).all()


def test_pca_projection_shape_on_testdata(ray_session):
    from sema_ray.clustering import pca_embeddings
    out = pca_embeddings(SF_DIR, out_dim=8).to_pandas()
    assert len(out) > 0
    assert all(len(p) == 8 for p in out["proj"])


def test_semdedup_planted_near_dups(ray_session, tmp_path):
    """SemDeDup: planted near-copies (cos ~0.999) drop, the lowest id of
    each group survives, distinct vectors all keep."""
    rng = np.random.default_rng(17)
    base = rng.standard_normal((30, 24)).astype(np.float32)
    ids = list(range(30))
    vecs = [base[i] for i in range(30)]
    for j in range(6):  # 100+j: near-copy of j
        ids.append(100 + j)
        vecs.append(base[j]
                    + 0.005 * rng.standard_normal(24).astype(np.float32))
    d = str(tmp_path / "sem")
    os.makedirs(d)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}),
        os.path.join(d, "embeddings.parquet"))
    out = clustering.semdedup(d, k=3, threshold=0.95).to_pandas()
    assert len(out) == 36
    keep = dict(zip(out["vec_id"], out["keep"]))
    for j in range(6):
        assert keep[j] is True or keep[j] == True  # noqa: E712
        assert not keep[100 + j], (j, keep)
    dropped = [i for i, kp in keep.items() if not kp]
    assert sorted(dropped) == [100 + j for j in range(6)]
    # deterministic
    out2 = clustering.semdedup(d, k=3, threshold=0.95).to_pandas()
    assert out.sort_values("vec_id", ignore_index=True).equals(
        out2.sort_values("vec_id", ignore_index=True))


def test_semdedup_ok_validity_twin(ray_session, tmp_path):
    """The validity summary pins TRUE: dropped vectors must have a
    smaller-id exact near-dup; a corrupted keep column would flip it."""
    rng = np.random.default_rng(23)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    ids = list(range(20)) + [100, 101]
    vecs = [base[i] for i in range(20)]
    vecs.append(base[0] + 0.004 * rng.standard_normal(16).astype(np.float32))
    vecs.append(base[1] + 0.004 * rng.standard_normal(16).astype(np.float32))
    d = str(tmp_path / "semok")
    os.makedirs(d)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}),
        os.path.join(d, "embeddings.parquet"))
    out = clustering.semdedup_ok(d, k=3, threshold=0.95).to_pandas()
    assert len(out) == 22
    assert (out["dedup_ok"] == 1).all()
    assert str(out["dedup_ok"].dtype) == "int64"
