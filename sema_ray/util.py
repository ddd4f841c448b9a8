"""Small shared helpers for driver-side collection of *small* results.

``collect_table`` is the one sanctioned way to materialize a Dataset that is
known-small (top-k merges, candidate-pair lists, dimension tables): it pulls
Arrow block refs zero-copy and drops the empty zero-column blocks that Ray's
hash-shuffle operators emit for unused partitions (which would otherwise make
``pa.concat_tables`` fail on schema mismatch).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


def round_half_up(arr, digits: int):
    """Bit-reproducible rounding shared with the DuckDB oracles.

    Engine round() implementations differ at the ULP (Arrow uses
    round-to-multiple with an inexact 10^-d; DuckDB scales then std::round),
    so oracle-checked outputs round via ``floor(x * 10^d + 0.5) / 10^d`` —
    every step is an exactly-specified IEEE754 op, so Arrow here and
    ``FLOOR(x * 10^d + 0.5) / 10^d`` in SQL produce identical doubles.
    """
    p = float(10 ** digits)
    x = pc.cast(arr, pa.float64())
    return pc.divide(pc.floor(pc.add(pc.multiply(x, p), 0.5)), p)


def warm_workers() -> None:
    """Spin up the session's worker pool and pay import costs before timing.

    A fresh ``ray.init`` has zero Python workers; the first pipeline's wall
    time otherwise includes process spawn + heavy imports per worker. A real
    long-running cluster is warm, so benchmarks call this first to measure
    the engine rather than session bring-up.
    """
    import ray.data as rd

    n = int(ray.cluster_resources().get("CPU", 8))

    def w(b):
        import sema_ray.extract  # noqa: F401  (forces worker-side imports)
        import sema_ray.golden  # noqa: F401
        return b

    rd.range(n * 16, override_num_blocks=n * 4).map_batches(
        w, batch_size=4).count()


def collect_table(ds) -> pa.Table:
    """Materialize a small Dataset to one pyarrow Table on the driver."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns > 0]
    if not tables:
        return pa.table({})
    if len(tables) == 1:
        return tables[0]
    return pa.concat_tables(tables, promote_options="default")


def lower_utf8(text: str) -> str:
    """Lowercase with Arrow/DuckDB (utf8proc) semantics. Python's
    ``str.lower()`` diverges on some codepoints — e.g. U+0130 İ becomes
    ``'i' + COMBINING DOT`` in Python but plain ``'i'`` under utf8proc —
    which silently SPLITS TOKENIZATION between a Python-side kernel and
    the engine's Arrow/DuckDB twins (found by oracle fuzzing: a shingle
    set built with Python lower disagreed with the SQL twin's gram set on
    'İstanbul'). ASCII fast path; kernel call only on non-ASCII text."""
    if text.isascii():
        return text.lower()
    import pyarrow as pa
    import pyarrow.compute as pc
    return pc.utf8_lower(pa.scalar(text)).as_py()


# NULL-group-key sentinel: Ray's sort-based groupby shuffle cannot order a
# string key column containing None (numpy searchsorted raises None < str
# at shuffle-boundary computation), while SQL GROUP BY keeps a NULL group.
# Encode null keys as a NUL-prefixed sentinel before the shuffle and decode
# after — real categorical codes (lang, event_type, ...) never contain NUL.
NULL_KEY = "\x00\x00null"


def fill_null_key(col):
    """String key column -> same column with nulls as :data:`NULL_KEY`."""
    return pc.fill_null(col, NULL_KEY)


def restore_null_key(t: pa.Table, col: str) -> pa.Table:
    """Decode :data:`NULL_KEY` back to a real NULL after the shuffle."""
    c = t[col]
    restored = pc.if_else(pc.equal(c, NULL_KEY),
                          pa.scalar(None, pa.string()),
                          pc.cast(c, pa.string()))
    return t.set_column(t.schema.get_field_index(col), col, restored)


def valid_vector_mask(arr) -> "np.ndarray":
    """Per-row validity of a ``list<float>`` column: non-NULL and every
    element finite.

    A row without a usable vector cannot participate in vector search —
    NULL rows crash the flattened ``[n, d]`` reshape (fewer values than
    rows x dim) and a single NaN/inf element poisons every cosine it
    touches with engine-divergent NaN ordering (numpy sorts NaN last,
    DuckDB first). Both engines therefore EXCLUDE such rows: this mask in
    every embedding loader, and the matching SQL predicate
    ``embedding IS NOT NULL AND COALESCE(list_aggregate(list_transform(
    CAST(embedding AS DOUBLE[]), x -> CAST(isfinite(x) AS INT)), 'min'),
    1) = 1`` in the oracle twins. Vectorized: one ``np.isfinite`` over the
    flat values + a cumsum segment fold; no per-row Python.
    """
    import numpy as np
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if len(flat) == 0:
        return valid  # no elements anywhere -> nothing non-finite
    bad = (~np.isfinite(flat)).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(bad)])
    ends = np.cumsum(lens)
    starts = ends - lens
    return valid & ((cs[ends] - cs[starts]) == 0)
