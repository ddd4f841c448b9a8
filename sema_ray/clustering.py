"""Distributed k-means over an embedding corpus (Lloyd's algorithm) and
cluster-balanced sampling on top of it.

The *iterative-algorithm* class of the training-data toolkit — clustering a
100 TB embedding table for curation: topic/domain discovery, diversity caps,
cluster-balanced subset selection (the "SemDeDup / density sampling" family
of recipes). Reference role parity: the reference keeps one vector table and
scans it per query (``src/vector_indexer.rs``); clustering is the
corpus-level organization of the same column.

Shapes (all Ray-Data-first, no shuffle anywhere):

- **fit**: each Lloyd iteration is ONE ``map_batches`` pass over the corpus
  emitting per-batch partial ``(cluster, count, sum-vector)`` rows — at most
  k rows of d+2 numbers per block, never raw vectors — reduced on the
  driver (centroids are the small side by construction) and shipped back in
  the next pass's task closure (cached per worker process; CLAUDE.md: task
  pools for light state).
- **assign / sample**: stateless task-pool passes with the centroid matrix
  in the closure. The balanced sampler is a bounded scatter-gather: each
  batch emits its local per-cluster top-``cap`` by a deterministic hash
  rank, the driver merges ≤ k x cap x blocks candidate rows.

Distance is cosine (vectors and centroids unit-normalized), matching the
ANN operators in :mod:`sema_ray.simsearch`; assignment ties break to the
lowest cluster id.

Determinism: init is the k lowest-``vec_id`` vectors; the driver reduce
sorts partial rows by (cluster, batch-min-vec_id) before summing, so
repeated runs over the same parquet layout are bit-identical. Across
*different* partitionings the float sums can differ in the last ulp (the
usual non-associativity), which can only flip points sitting exactly on a
Voronoi boundary — the pytest oracle asserts layout-level determinism and
mixture recovery, not cross-layout bit equality.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from .sampling import _KNUTH  # Knuth multiplicative constant (uint64)
from .simsearch import _batch_matrix, _normalize_rows
from .util import collect_table

DEFAULT_K = 8
DEFAULT_ITERS = 8


def _load_embeddings(sf_dir: str, columns=("vec_id", "embedding")
                     ) -> rd.Dataset:
    """Rows whose embedding is NULL or contains a non-finite element are
    excluded whenever the vector column is read (the simsearch loader
    contract — see :func:`sema_ray.util.valid_vector_mask`)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=list(columns))
    if "embedding" in columns:
        from .util import valid_vector_mask
        ds = ds.map_batches(
            lambda t: t.filter(valid_vector_mask(t["embedding"])),
            batch_format="pyarrow")
    return ds


INIT_SAMPLE = 4096


def _init_centroids(ds: rd.Dataset, k: int,
                    sample_rows: int = INIT_SAMPLE) -> np.ndarray:
    """Deterministic farthest-point (k-center) seeding on a bounded driver
    sample — the greedy derandomization of k-means++ (no RNG anywhere).

    The sample is the ``sample_rows`` lowest-vec_id vectors, gathered with a
    bounded scatter-gather (each batch contributes its local lowest); seeds
    start from the lowest vec_id and repeatedly take the sample point
    farthest (in cosine) from its nearest chosen seed, so no two seeds land
    inside one tight cluster — naive lowest-id seeding merged adjacent
    mixture components whenever two low ids shared a component.
    """

    def local_min(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "embedding": t["embedding"]})
        take = np.argsort(ids)[:sample_rows]
        return t.take(pa.array(np.sort(take)))

    tbl = collect_table(ds.map_batches(local_min, batch_format="pyarrow",
                                       batch_size=None))
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids)[:sample_rows]
    m = _normalize_rows(_batch_matrix(tbl)[order])
    if len(m) < k:
        raise ValueError(f"need >= {k} vectors to seed {k} clusters, "
                         f"got {len(m)}")
    seeds = [0]
    best = m @ m[0]  # similarity to nearest chosen seed, per sample point
    for _ in range(1, k):
        nxt = int(np.argmin(best))  # farthest point (lowest index on ties)
        seeds.append(nxt)
        best = np.maximum(best, m @ m[nxt])
    return m[seeds]


class _PartialSums:
    """One Lloyd half-step as a task-pool stage: assign each vector of the
    batch to its nearest centroid, emit per-cluster (count, sum) partials.
    The centroid matrix rides in the serialized callable (worker-cached)."""

    def __init__(self, cents: np.ndarray):
        self.cents = cents  # [k, d], unit rows

    def __call__(self, t: pa.Table) -> pa.Table:
        k, d = self.cents.shape
        m = _batch_matrix(t)
        if m.shape[0] == 0:
            return pa.table({
                "cluster": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
                "vsum": pa.array([], pa.list_(pa.float64(), d)),
                "order_key": pa.array([], pa.int64()),
            })
        mn = _normalize_rows(m)
        assign = np.argmax(mn @ self.cents.T, axis=1)  # ties -> lowest id
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, mn)
        present = np.nonzero(counts)[0]
        okey = int(t["vec_id"].to_numpy(zero_copy_only=False).min())
        return pa.table({
            "cluster": pa.array(present.astype(np.int32), pa.int32()),
            "n": pa.array(counts[present], pa.int64()),
            "vsum": pa.FixedSizeListArray.from_arrays(
                pa.array(sums[present].reshape(-1)), d),
            "order_key": pa.array(np.full(len(present), okey), pa.int64()),
        })


def kmeans_fit(ds: rd.Dataset, k: int = DEFAULT_K,
               n_iter: int = DEFAULT_ITERS, tol: float = 1e-6
               ) -> np.ndarray:
    """Lloyd's k-means in cosine space; returns [k, d] unit centroids.

    Per iteration the corpus is read once; the all-reduce is k x blocks
    partial rows collected on the driver (d+2 numbers each — the one piece
    of genuinely shared mutable state, far too small to shuffle for).
    Early-stops when every centroid moves < ``tol`` (cosine distance).
    Empty clusters keep their previous centroid.
    """
    cents = _init_centroids(ds, k)
    for _ in range(n_iter):
        partials = ds.map_batches(_PartialSums(cents),
                                  batch_format="pyarrow", batch_size=None)
        tbl = collect_table(partials)
        if tbl.num_rows == 0 or "cluster" not in tbl.column_names:
            break
        cl = tbl["cluster"].to_numpy(zero_copy_only=False)
        nn = tbl["n"].to_numpy(zero_copy_only=False)
        okey = tbl["order_key"].to_numpy(zero_copy_only=False)
        d = cents.shape[1]
        vs = _batch_matrix(tbl, "vsum")
        # stable reduce order -> bit-identical refits on the same layout
        order = np.lexsort((okey, cl))
        cl, nn, vs = cl[order], nn[order], vs[order]
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        np.add.at(sums, cl, vs)
        np.add.at(counts, cl, nn)
        new = cents.copy()
        live = counts > 0
        new[live] = _normalize_rows(sums[live] / counts[live, None])
        shift = 1.0 - np.einsum("ij,ij->i", new, cents)
        cents = new
        if shift.max() < tol:
            break
    return cents


def kmeans_assign(ds: rd.Dataset, cents: np.ndarray) -> rd.Dataset:
    """(vec_id, cluster, score): nearest centroid per vector, cosine score.
    Stateless task-pool pass; centroids ship in the closure."""

    class Assign:
        def __init__(self, c: np.ndarray):
            self.c = c

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({"vec_id": pa.array([], pa.int64()),
                                 "cluster": pa.array([], pa.int32()),
                                 "score": pa.array([], pa.float64())})
            sims = _normalize_rows(_batch_matrix(t)) @ self.c.T
            a = np.argmax(sims, axis=1)
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster": pa.array(a.astype(np.int32), pa.int32()),
                "score": pa.array(sims[np.arange(len(a)), a], pa.float64()),
            })

    return ds.map_batches(Assign(cents), batch_format="pyarrow",
                          batch_size=None)


def kmeans_clusters(sf_dir: str, k: int = DEFAULT_K,
                    n_iter: int = DEFAULT_ITERS) -> rd.Dataset:
    """Fit + assign over the embeddings table: (vec_id, cluster)."""
    ds = _load_embeddings(sf_dir)
    cents = kmeans_fit(ds, k=k, n_iter=n_iter)
    return kmeans_assign(ds, cents).select_columns(["vec_id", "cluster"])


def pca_fit(ds: rd.Dataset, out_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(mean[d], components[d, out_dim]) from ONE pass of per-block moment
    partials — each block contributes (n, sum[d], X'X[d*d]) as a single row
    of numbers (d=384 -> ~1.2 MB/block), folded on the driver where the
    d x d eigendecomposition is trivial. No iteration, no shuffle.

    Deterministic: eigenvectors ordered by descending eigenvalue and
    sign-fixed so each component's largest-magnitude coordinate is
    positive (the usual convention; removes the sign ambiguity)."""

    def partial(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        if m.shape[0] == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.list_(pa.float64())),
                             "xx": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "n": pa.array([m.shape[0]], pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()]),
            "xx": pa.array([(m.T @ m).reshape(-1).tolist()]),
        })

    tbl = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None))
    n = sum(tbl["n"].to_pylist())
    if n == 0:
        raise ValueError("no vectors to fit PCA on")
    s = np.sum([np.asarray(r) for r in tbl["s"].to_pylist()], axis=0)
    xx = np.sum([np.asarray(r) for r in tbl["xx"].to_pylist()], axis=0)
    d = len(s)
    mean = s / n
    cov = xx.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:out_dim]
    comps = evecs[:, order]
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip[None, :]


def pca_embeddings(sf_dir: str, out_dim: int = 16) -> rd.Dataset:
    """(vec_id, proj float64[out_dim]) — mean-centered projection onto the
    top principal components; the standard reduction before quantization /
    IVF at scale. Stateless projection pass (mean + components in the task
    closure, a few hundred KB)."""
    ds = _load_embeddings(sf_dir)
    mean, comps = pca_fit(ds, out_dim)

    class Project:
        def __init__(self, mean_: np.ndarray, comps_: np.ndarray):
            self.mean, self.comps = mean_, comps_

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({
                    "vec_id": pa.array([], pa.int64()),
                    "proj": pa.array([], pa.list_(pa.float64()))})
            p = (_batch_matrix(t) - self.mean[None, :]) @ self.comps
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "proj": pa.FixedSizeListArray.from_arrays(
                    pa.array(p.reshape(-1), pa.float64()), p.shape[1]),
            })

    return ds.map_batches(Project(mean, comps), batch_format="pyarrow",
                          batch_size=None)


def cluster_balanced_sample(sf_dir: str, k: int = DEFAULT_K,
                            cap: int = 32,
                            n_iter: int = DEFAULT_ITERS) -> rd.Dataset:
    """Diversity subset: at most ``cap`` vectors per k-means cluster, chosen
    by a deterministic Knuth-hash rank of vec_id (partition-independent
    given the assignment) — the cluster-balanced counterpart of
    :func:`sema_ray.sampling.sample_events`.

    Bounded scatter-gather tail: each batch emits its local per-cluster
    top-``cap`` (k x cap rows max), the driver merges and re-slices. Output:
    (vec_id, cluster), sorted by (cluster, hash rank) — stable.
    """
    ds = _load_embeddings(sf_dir)
    cents = kmeans_fit(ds, k=k, n_iter=n_iter)
    assigned = kmeans_assign(ds, cents)

    def local_top(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int32()),
                             "rank_key": pa.array([], pa.int64())})
        rk = (ids.view(np.uint64) * _KNUTH).view(np.int64)
        order = np.lexsort((rk, cl))
        cl_s = cl[order]
        starts = np.r_[True, cl_s[1:] != cl_s[:-1]]
        run_start = np.maximum.accumulate(
            np.where(starts, np.arange(len(cl_s)), 0))
        keep = (np.arange(len(cl_s)) - run_start) < cap
        sel = order[keep]
        return pa.table({
            "vec_id": pa.array(ids[sel], pa.int64()),
            "cluster": pa.array(cl[sel].astype(np.int32), pa.int32()),
            "rank_key": pa.array(rk[sel], pa.int64()),
        })

    tbl = collect_table(assigned.map_batches(local_top,
                                             batch_format="pyarrow",
                                             batch_size=None))
    if tbl.num_rows == 0 or "vec_id" not in tbl.column_names:
        return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                       "cluster": pa.array([], pa.int32())}))
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    cl = tbl["cluster"].to_numpy(zero_copy_only=False)
    rk = tbl["rank_key"].to_numpy(zero_copy_only=False)
    order = np.lexsort((rk, cl))
    cl_s = cl[order]
    starts = np.r_[True, cl_s[1:] != cl_s[:-1]]
    run_start = np.maximum.accumulate(
        np.where(starts, np.arange(len(cl_s)), 0))
    keep = (np.arange(len(cl_s)) - run_start) < cap
    sel = order[keep]
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids[sel], pa.int64()),
        "cluster": pa.array(cl[sel].astype(np.int32), pa.int32()),
    }))


def semdedup(sf_dir: str, k: int = DEFAULT_K, threshold: float = 0.95,
             n_iter: int = DEFAULT_ITERS, n_parts: int = 64) -> rd.Dataset:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): k-means clusters make
    the pairwise-cosine pass tractable — near-duplicate pairs are only
    sought INSIDE a cluster, so the quadratic work is n²/k per cluster
    instead of n² corpus-wide.

    Output (vec_id, keep): keep[i] is False iff some SAME-CLUSTER member
    with a smaller vec_id has cosine >= threshold (deterministic: the
    lowest id of every near-dup group survives). One keyed shuffle
    co-locates each cluster's members (whole clusters per part — cluster
    sizes are the documented memory bound, controlled by ``k``); the
    per-cluster work is one gram matrix + a strict-upper-triangle max,
    one vectorized step per CLUSTER (bounded by k), never per vector."""
    from .relational import keyed_part_kernel

    ds = _load_embeddings(sf_dir)
    cents = kmeans_fit(ds, k=k, n_iter=n_iter)

    class AssignEmb:
        def __init__(self, c: np.ndarray):
            self.c = c

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({
                    "vec_id": pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "embedding": t["embedding"]})
            m = _normalize_rows(_batch_matrix(t))
            a = np.argmax(m @ self.c.T, axis=1)
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64), pa.int64()),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "embedding": t["embedding"]})

    assigned = ds.map_batches(AssignEmb(cents), batch_format="pyarrow",
                              batch_size=None)

    def dedup_kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "keep": pa.array([], pa.bool_())})
        if t.num_rows == 0:
            return empty
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        m = _normalize_rows(_batch_matrix(t))
        order = np.lexsort((ids, cl))
        ids, cl, m = ids[order], cl[order], m[order]
        bounds = np.r_[0, np.nonzero(cl[1:] != cl[:-1])[0] + 1, len(cl)]
        keep = np.ones(len(ids), dtype=bool)
        for s, e in zip(bounds[:-1], bounds[1:]):  # one step per CLUSTER
            if e - s < 2:
                continue
            g = m[s:e] @ m[s:e].T
            # max cosine to any smaller-id member of the same cluster
            max_prev = np.where(np.triu(np.ones_like(g, dtype=bool), 1),
                                g, -np.inf).max(axis=0)
            keep[s:e] = max_prev < threshold
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "keep": pa.array(keep, pa.bool_())})

    return keyed_part_kernel(assigned, "cluster", dedup_kernel,
                             n_parts=n_parts)


SEMDEDUP_OK_TOL = 1e-6  # witness threshold slack: the per-cluster gram and
# the brute-force pass accumulate the same cosine in different BLAS orders,
# so a pair landing exactly on the float boundary could otherwise flap the
# pinned-TRUE oracle (the CLAUDE.md oracle-boundary rule).


def semdedup_ok(sf_dir: str, k: int = DEFAULT_K,
                threshold: float = 0.95) -> pa.Table:
    """SemDeDup validity summary (the dedup_minhash/simhash twin shape):
    (vec_id, dedup_ok) with dedup_ok recomputed via an INDEPENDENT exact
    brute-force cosine pass — every DROPPED vector must have a smaller-id
    near-duplicate (cosine >= threshold - tol) somewhere in the corpus.
    SQL pins dedup_ok TRUE. Scope: this catches OVER-dropping (a drop
    without a global witness — normalization bugs, wrong gram, corrupted
    keep column); under-dropping (e.g. a co-location regression that
    splits a cluster and misses pairs) keeps dedup_ok trivially true and
    is covered by the planted-dup pytest instead."""
    from .simsearch import embedding_dup_pairs

    sd = collect_table(semdedup(sf_dir, k=k, threshold=threshold)) \
        .sort_by("vec_id")
    ids = sd["vec_id"].to_numpy(zero_copy_only=False)
    keep = sd["keep"].to_numpy(zero_copy_only=False)
    pairs = collect_table(embedding_dup_pairs(
        sf_dir, threshold=threshold - SEMDEDUP_OK_TOL))
    has_smaller = np.zeros(len(ids), dtype=bool)
    if pairs.num_rows and "b" in pairs.column_names:
        b = np.unique(pairs["b"].to_numpy(zero_copy_only=False))
        has_smaller = np.isin(ids, b)
    ok = keep | has_smaller
    # int64 on both sides (driver-contract rule; SQL pins CAST(1 AS BIGINT))
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "dedup_ok": pa.array(ok.astype(np.int64), pa.int64())})
