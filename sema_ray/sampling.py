"""Deterministic hash-mod sampling (SURVEY §2 "Sorts/sampling" note).

The reference has no sampling; large-scale pipelines need a *deterministic*,
partition-invariant sample (same rows on every run / cluster size) for test
corpora and presampling — ``ds.random_sample`` is seed-per-task and not
reproducible across executions. Here: keep a row iff
``((key mod 2^32) * 2654435761) mod 2^32 < rate * 2^32`` (Knuth
multiplicative hash). Every op is exact integer arithmetic, expressible
identically in DuckDB HUGEINT (the oracle twin in ``__ray_entry__``), and
key-wraparound-safe at any id magnitude.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def sample_threshold(rate: float) -> int:
    """Bucket threshold for a sampling rate (truncating, like the SQL twin)."""
    return int(rate * (1 << 32))


def hash_mod_sample(ds: rd.Dataset, key_col: str, rate: float,
                    columns: list[str] | None = None) -> rd.Dataset:
    """Deterministic sample of ``ds`` on an integer key column.

    A pure per-batch filter: no shuffle, no state, invariant under any
    repartitioning — the 100 TB-safe way to cut a reproducible slice.
    """
    thr = np.uint64(sample_threshold(rate))

    def keep(t: pa.Table) -> pa.Table:
        ids = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        mask = ((ids % _MOD32) * _KNUTH) % _MOD32 < thr
        out = t.filter(pa.array(mask))
        return out.select(columns) if columns else out

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_events(sf_dir: str, rate: float = 0.25) -> rd.Dataset:
    """Driver-contract entry: deterministic 25% sample of the events table."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "user_id"])
    return hash_mod_sample(ds, "event_id", rate)
