"""Session-scoped Ray fixture: one ray.init for the whole pytest run."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Sharded deterministic template corpus (~100 convs) on disk."""
    from sema_ray.sources.transcripts import generate_transcripts, write_sharded

    d = tmp_path_factory.mktemp("corpus")
    t = generate_transcripts(n_convs=60, seed=7)
    write_sharded(t, str(d), num_shards=4)
    return str(d), t
