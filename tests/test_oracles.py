"""Driver-contract mirror: every queries() entry runs; every oracle_sql()
entry matches DuckDB exactly (row count + column names + order-insensitive
values) — the same comparison the driver applies at sf=0.01.

Runs at sf0.001 for speed; the logic is scale-independent.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalized(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')")
    return con


def _entry_module():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def contract(monkeypatch_module):
    # the kg_* oracles read the derived corpus parquet directly; point them
    # at the sf0.001 corpus this mirror runs the queries against
    monkeypatch_module.setenv("SEMA_RAY_ORACLE_SF", SF_DIR)
    mod = _entry_module()
    return mod.queries(), mod.oracle_sql()


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch
    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_all_queries_run_and_oracles_match(ray_session, contract, oracle_con):
    queries, oracles = contract
    assert set(oracles) <= set(queries), "oracle without a query impl"
    failures = []
    for name, fn in queries.items():
        got = _to_df(fn(SF_DIR))
        assert got is not None, name
        if name not in oracles:
            # rows-only check, like the driver's weaker path
            assert len(got.columns) > 0, name
            continue
        want = oracle_con.execute(oracles[name]).df()
        g, w = _normalized(got), _normalized(want)
        if list(g.columns) != list(w.columns):
            failures.append(f"{name}: columns {list(g.columns)} != {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(f"{name}: rows {len(g)} != {len(w)}")
            continue
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = all(
                    (math.isnan(a) and math.isnan(b)) or a == b
                    for a, b in zip(g[c], w[c]))
            else:
                ok = g[c].equals(w[c])
            if not ok:
                mism = (g[c] != w[c])
                failures.append(
                    f"{name}.{c}: {int(mism.sum())} mismatches, e.g. "
                    f"{g[c][mism].head(3).tolist()} vs {w[c][mism].head(3).tolist()}")
    assert not failures, "\n".join(failures)
