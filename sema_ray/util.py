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
