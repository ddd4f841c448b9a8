"""Distributed connected components over an edge list — alternating
large-star / small-star rounds (Kiveris et al., "Connected Components in
MapReduce and Beyond", public algorithm).

This is the scale path for the dedup family's single-reducer union-find:
the driver union-find is bounded by the verified pair list, which is fine
until the duplicate graph itself outgrows one machine (pathological crawl
corpora where most documents collide). Every round here is a bounded-part
shuffle (:func:`sema_ray.relational.keyed_part_kernel`) + segmented numpy
kernels — complete neighborhoods per key, no per-group Python — and the
algorithm converges in O(log n) rounds to stars centered on each
component's minimum node.

Round shapes:

- **large-star** (keyed on the SMALLER endpoint's neighborhoods): for each
  node u, m = min(neighborhood ∪ {u}); re-point every neighbor v > u at m.
- **small-star** (keyed on the LARGER endpoint): m = min(neighborhood);
  re-point every smaller neighbor (and u itself) at m.

Convergence is detected by an order-independent edge-set signature
(count + sum + xor of per-edge splitmix64 hashes) computed as per-block
partials — never by collecting edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .hashing import splitmix64
from .relational import keyed_part_kernel


def _dedup_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unique (u, v) rows, dropping self loops — one lexsort, no Python."""
    keep = u != v
    u, v = u[keep], v[keep]
    if len(u) == 0:
        return u, v
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    first = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return u[first], v[first]


def _star_kernel(large: bool):
    """Segmented star round over complete key-u neighborhoods.

    Input table: (u, v) with every row of any key u it sees (the
    keyed_part_kernel contract). Emits the re-pointed edges as (u, v)."""

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64())})
        t = t.sort_by([("u", "ascending"), ("v", "ascending")])
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        # per-segment min neighbor (v is sorted within segment -> first row)
        m = np.minimum(v[starts], u[starts])  # min(Γ(u) ∪ {u})
        seg_len = np.diff(np.r_[starts, len(u)])
        m_rep = np.repeat(m, seg_len)
        if large:
            # re-point neighbors bigger than u: (v, m) for v > u
            mask = v > u
            out_u, out_v = v[mask], m_rep[mask]
        else:
            # all neighbors here are < u (keyed on the larger endpoint):
            # point them and u itself at m
            out_u = np.concatenate([v, u[starts]])
            out_v = np.concatenate([m_rep, m])
        out_u, out_v = _dedup_pairs(out_u, out_v)
        return pa.table({"u": pa.array(out_u, pa.int64()),
                         "v": pa.array(out_v, pa.int64())})

    return kern


def _both_directions(t: pa.Table) -> pa.Table:
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    ou, ov = _dedup_pairs(np.concatenate([u, v]), np.concatenate([v, u]))
    return pa.table({"u": pa.array(ou, pa.int64()),
                     "v": pa.array(ov, pa.int64())})


def _larger_keyed(t: pa.Table) -> pa.Table:
    u = t["u"].to_numpy(zero_copy_only=False)
    v = t["v"].to_numpy(zero_copy_only=False)
    ou, ov = _dedup_pairs(np.maximum(u, v), np.minimum(u, v))
    return pa.table({"u": pa.array(ou, pa.int64()),
                     "v": pa.array(ov, pa.int64())})


def _signature(edges: rd.Dataset) -> tuple[int, int, int]:
    """Order/partition-independent edge-set signature from per-block
    partials: (count, sum, xor) of canonical per-edge hashes. Edges are
    unique-per-block but may repeat across blocks after a round; the
    canonical (min, max) hash makes cross-block duplicates visible in the
    xor (they cancel pairwise) and the driver fold needs three ints per
    block either way — collisions across ALL THREE folds at once are not a
    realistic stopping risk, and stopping is re-checked next round anyway."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        h = splitmix64(splitmix64(lo) + hi)
        return pa.table({
            "n": pa.array([len(h)], pa.int64()),
            "s": pa.array([int(h.sum(dtype=np.uint64) >> np.uint64(1))],
                          pa.int64()),
            "x": pa.array([int(np.bitwise_xor.reduce(h)
                               & np.uint64(0x7FFF_FFFF_FFFF_FFFF))],
                          pa.int64()),
        })

    from .util import collect_table
    tbl = collect_table(edges.map_batches(partial, batch_format="pyarrow",
                                          batch_size=None))
    if tbl.num_rows == 0 or "n" not in tbl.column_names:
        return (0, 0, 0)
    xs = tbl["x"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return (int(pc.sum(tbl["n"]).as_py() or 0),
            int(pc.sum(tbl["s"]).as_py() or 0) & 0x7FFF_FFFF_FFFF_FFFF,
            int(np.bitwise_xor.reduce(xs)) if len(xs) else 0)


def pagerank(edges: rd.Dataset, src_col: str = "a", dst_col: str = "b",
             damping: float = 0.85, n_iter: int = 20,
             tol: float = 1e-9) -> rd.Dataset:
    """PageRank over a directed edge list — the link-graph quality signal
    web-crawl curation pipelines attach to documents/entities.

    Shape: the node vocabulary and rank vector live on the driver (entity /
    host vocabularies are the small side by construction — same boundary
    as the canonicalization union-find); every iteration is ONE
    ``map_batches`` pass over the (distributed, never-collected) edge list
    emitting per-block partial contribution sums as (node-index, sum) rows,
    folded on the driver. Dangling-node mass is redistributed uniformly
    (standard). For node sets past driver memory the same update runs as a
    ``groupby(dst)`` sum with ranks broadcast per iteration — the edge-pass
    structure is unchanged.

    Output: (node, rank) with ranks summing to 1, rank rounded half-up to
    9 digits for cross-run determinism.
    """
    from .util import round_half_up as _rhu

    def to_uv(t: pa.Table) -> pa.Table:
        return pa.table({"u": pc.cast(t[src_col], pa.int64()),
                         "v": pc.cast(t[dst_col], pa.int64())})

    e = edges.map_batches(to_uv, batch_format="pyarrow",
                          batch_size=None).materialize()

    def node_partial(t: pa.Table) -> pa.Table:
        uniq = np.unique(np.concatenate(
            [t["u"].to_numpy(zero_copy_only=False),
             t["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"n": pa.array(uniq, pa.int64())})

    from .util import collect_table
    nt = collect_table(e.map_batches(node_partial, batch_format="pyarrow",
                                     batch_size=None))
    if nt.num_rows == 0 or "n" not in nt.column_names:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))
    nodes = np.unique(nt["n"].to_numpy(zero_copy_only=False))
    n = len(nodes)

    def deg_partial(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(nodes, u)
        d = np.zeros(n, dtype=np.int64)
        np.add.at(d, idx, 1)
        nz = np.nonzero(d)[0]
        return pa.table({"i": pa.array(nz, pa.int64()),
                         "d": pa.array(d[nz], pa.int64())})

    dt = collect_table(e.map_batches(deg_partial, batch_format="pyarrow",
                                     batch_size=None))
    out_deg = np.zeros(n, dtype=np.int64)
    np.add.at(out_deg, dt["i"].to_numpy(zero_copy_only=False),
              dt["d"].to_numpy(zero_copy_only=False))

    rank = np.full(n, 1.0 / n)
    safe_deg = np.maximum(out_deg, 1)
    for _ in range(n_iter):
        share = rank / safe_deg  # per-out-edge contribution of each node

        class Contrib:
            def __init__(self, share_: np.ndarray):
                self.share = share_

            def __call__(self, t: pa.Table) -> pa.Table:
                u = np.searchsorted(nodes, t["u"]
                                    .to_numpy(zero_copy_only=False))
                v = np.searchsorted(nodes, t["v"]
                                    .to_numpy(zero_copy_only=False))
                acc = np.zeros(n, dtype=np.float64)
                np.add.at(acc, v, self.share[u])
                nz = np.nonzero(acc)[0]
                return pa.table({"i": pa.array(nz, pa.int64()),
                                 "s": pa.array(acc[nz], pa.float64())})

        ct = collect_table(e.map_batches(Contrib(share),
                                         batch_format="pyarrow",
                                         batch_size=None))
        inbound = np.zeros(n, dtype=np.float64)
        if ct.num_rows and "i" in ct.column_names:
            # deterministic fold order: sum per index over sorted partials
            ii = ct["i"].to_numpy(zero_copy_only=False)
            ss = ct["s"].to_numpy(zero_copy_only=False)
            order = np.argsort(ii, kind="stable")
            np.add.at(inbound, ii[order], ss[order])
        dangling = rank[out_deg == 0].sum()
        new = (1.0 - damping) / n + damping * (inbound + dangling / n)
        delta = np.abs(new - rank).sum()
        rank = new
        if delta < tol:
            break
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "rank": pa.array([_rhu(float(r), 9) for r in rank], pa.float64()),
    }))


def connected_components(edges: rd.Dataset, a_col: str = "a",
                         b_col: str = "b", max_rounds: int = 30,
                         n_parts: int = 64) -> rd.Dataset:
    """(node, component) for every node in the edge list; component = the
    minimum node id reachable from it. Fully distributed: each round is one
    bounded-part shuffle; the driver only ever folds three-int signatures.

    At the alternating-star fixpoint the edge set is a union of stars
    centered on component minima, so the label table falls out of the final
    edges directly: (v -> root) per edge plus (root -> root).
    """
    cur = edges.map_batches(
        lambda t: pa.table({
            "u": pc.cast(t[a_col], pa.int64()),
            "v": pc.cast(t[b_col], pa.int64())}),
        batch_format="pyarrow", batch_size=None).materialize()
    prev_sig = None
    for _ in range(max_rounds):
        big = cur.map_batches(_both_directions, batch_format="pyarrow",
                              batch_size=None)
        after_large = keyed_part_kernel(big, "u", _star_kernel(large=True),
                                        n_parts=n_parts)
        small_in = after_large.map_batches(_larger_keyed,
                                           batch_format="pyarrow",
                                           batch_size=None)
        cur = keyed_part_kernel(small_in, "u", _star_kernel(large=False),
                                n_parts=n_parts).materialize()
        sig = _signature(cur)
        if sig == prev_sig or sig[0] == 0:
            break
        prev_sig = sig

    def labels(t: pa.Table) -> pa.Table:
        # fixpoint edges are (bigger-node, root) stars
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        root = np.concatenate([v, v])
        return pa.table({"node": pa.array(node, pa.int64()),
                         "component": pa.array(root, pa.int64())})

    out = cur.map_batches(labels, batch_format="pyarrow", batch_size=None)
    # cross-block dedup of (root, root) self rows and repeated stars: one
    # tiny groupby-min over (node) — the label table is nodes-in-edges sized
    from ray.data.aggregate import Min
    return out.groupby("node").aggregate(Min("component",
                                             alias_name="component"))
