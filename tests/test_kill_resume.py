"""SURVEY §5.4: kill a run mid-flight, rerun, assert finished partitions are
skipped and the final output is identical to an uninterrupted run.

The victim runs in a subprocess with its own Ray session; the test polls its
`_manifest/` directory and SIGKILLs the process after the first shard
manifest lands.
"""

from __future__ import annotations

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pytest

VICTIM = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from sema_ray.pipelines import kg
kg.run_kg({corpus!r}, {out!r}, shards_per_wave=1)
"""


@pytest.mark.timeout(300)
def test_kill_mid_run_then_resume(ray_session, tmp_path):
    from sema_ray.pipelines import kg
    from sema_ray.sources.transcripts import generate_transcripts, write_sharded

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    t = generate_transcripts(n_convs=60, seed=23)
    write_sharded(t, corpus, num_shards=8)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = VICTIM.format(repo=repo_root, corpus=corpus, out=out)
    proc = subprocess.Popen([sys.executable, "-c", script],
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    manifest_glob = os.path.join(out, "_manifest", "part=*.json")
    deadline = time.time() + 180
    try:
        while time.time() < deadline:
            if glob.glob(manifest_glob):
                break
            if proc.poll() is not None:
                break
            time.sleep(0.2)
        else:
            pytest.fail("victim produced no manifest within deadline")
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)

    done_before = sorted(glob.glob(manifest_glob))
    assert done_before, "at least one shard must have finished before kill"
    assert len(done_before) < 8, "kill landed too late to exercise resume"
    stamps = {p: json.load(open(p))["written_unix"] for p in done_before}

    # resume in-process: finished shards skipped, the rest completed
    m = kg.run_kg(corpus, out, shards_per_wave=1)
    assert m["shards_total"] == 8
    assert m["shards_skipped"] >= len(done_before)
    assert m["shards_skipped"] + m["shards_processed"] == 8
    for p, stamp in stamps.items():  # skipped shards were not rewritten
        assert json.load(open(p))["written_unix"] == stamp

    # output equals an uninterrupted run
    import pyarrow.parquet as pq
    got = pq.read_table(os.path.join(out, "triples"))
    clean_out = str(tmp_path / "clean")
    kg.run_kg(corpus, clean_out, shards_per_wave=8)
    want = pq.read_table(os.path.join(clean_out, "triples"))
    key = lambda tbl: sorted(zip(tbl["conv_id"].to_pylist(),
                                 tbl["turn_idx"].to_pylist(),
                                 tbl["subj"].to_pylist(),
                                 tbl["pred"].to_pylist(),
                                 tbl["obj"].to_pylist()))
    assert key(got) == key(want)
