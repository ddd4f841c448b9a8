"""Transient-failure resilience: a stage whose first attempts die must
complete via Ray task retries (the policy `pipelines.kg.RETRY_ARGS` applies
to the long extraction stages), and a poison row must fail LOUDLY after the
retry budget — never be silently dropped (the reference skips failed files
via `.ok()`, processor.rs:18; we deliberately do not)."""

from __future__ import annotations

import fcntl
import os
import uuid

import pyarrow as pa
import pytest
import ray.data as rd

from sema_ray.pipelines.kg import RETRY_ARGS


def _flaky_fn(counter_path: str, n_failures: int):
    def fn(t: pa.Table) -> pa.Table:
        with open(counter_path, "a+") as f:
            fcntl.flock(f, fcntl.LOCK_EX)
            f.seek(0)
            n = int(f.read() or 0)
            f.seek(0)
            f.truncate()
            f.write(str(n + 1))
        if n < n_failures:
            raise RuntimeError(f"injected transient failure #{n}")
        return t
    return fn


def test_map_batches_survives_transient_failures(ray_session, tmp_path):
    counter = str(tmp_path / f"attempts-{uuid.uuid4().hex}")
    ds = rd.range(1000, override_num_blocks=2)
    out = ds.map_batches(_flaky_fn(counter, 2), batch_format="pyarrow",
                         batch_size=None,
                         **RETRY_ARGS)
    assert out.count() == 1000  # first two attempts died, retries finished
    assert int(open(counter).read()) >= 4  # 2 failures + ≥2 successes


def test_poison_row_fails_loudly(ray_session, tmp_path):
    counter = str(tmp_path / f"attempts-{uuid.uuid4().hex}")
    ds = rd.range(100, override_num_blocks=1)
    out = ds.map_batches(_flaky_fn(counter, 10**6), batch_format="pyarrow",
                         **RETRY_ARGS)
    with pytest.raises(Exception):
        out.count()


def test_extraction_stage_carries_retry_policy(ray_session):
    # the flagship extraction datasets are built with the retry policy
    assert RETRY_ARGS["retry_exceptions"] is True
    assert RETRY_ARGS["max_retries"] >= 1
