"""Distributed connected components (alternating star rounds) vs a
driver union-find reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from sema_ray.canonicalize import UnionFind
from sema_ray.graph import connected_components


def _reference(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = UnionFind()
    nodes = set()
    for a, b in edges:
        uf.union(a, b)
        nodes.update((a, b))
    return {n: min(uf.groups()[uf.find(n)]) for n in nodes}


def _run(edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    tbl = pa.table({"a": pa.array([a for a, _ in edges], pa.int64()),
                    "b": pa.array([b for _, b in edges], pa.int64())})
    out = connected_components(rd.from_arrow(tbl), **kw).to_pandas()
    return dict(zip(out["node"], out["component"]))


def test_cc_random_graph_matches_union_find(ray_session):
    rng = np.random.default_rng(17)
    n = 2000
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(3000, 2))
             if a != b]
    assert _run(edges) == _reference(edges)


def test_cc_long_chain_converges(ray_session):
    # a path graph is the classic worst case for naive label propagation;
    # alternating stars need O(log n) rounds
    edges = [(i, i + 1) for i in range(999)]
    got = _run(edges)
    assert set(got.values()) == {0}
    assert len(got) == 1000


def test_cc_disjoint_cliques_and_determinism(ray_session):
    edges = []
    for base in (0, 100, 200, 300):
        members = list(range(base + 1, base + 8))
        edges += [(base, m) for m in members]
        edges += [(members[0], members[-1])]
    g1, g2 = _run(edges), _run(edges)
    assert g1 == g2 == _reference(edges)


def test_cc_empty_edges(ray_session):
    tbl = pa.table({"a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64())})
    out = connected_components(rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 0


def test_cc_property_random_graphs(ray_session):
    """Hypothesis-style sweep without per-example Ray overhead: a batch of
    adversarial edge lists (negative ids, dup edges, self loops, multiple
    shapes) checked against union-find in one session."""
    rng = np.random.default_rng(29)
    cases = []
    cases.append([(-5, -9), (-9, 3), (7, 7), (3, -5)])       # negatives+loop
    cases.append([(0, 1)] * 6 + [(1, 2), (2, 0)])             # dup edges
    cases.append([(i, (i * 7919) % 50) for i in range(50)])   # mod graph
    for n, m in ((10, 40), (64, 64), (200, 100)):
        e = rng.integers(-n, n, size=(m, 2))
        cases.append([(int(a), int(b)) for a, b in e])
    for edges in cases:
        clean = [(a, b) for a, b in edges if a != b]
        if not clean:
            continue
        assert _run(edges) == _reference(clean), edges[:5]
