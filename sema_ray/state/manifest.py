"""Per-partition lineage manifests: checkpoint/resume for batch pipelines.

Lifts the reference's file-granular incremental-skip state
(``/root/reference/src/storage/mod.rs:30-70`` — hash file, compare with the
stored ``file_index`` row, skip unchanged) to *partition* granularity
(SURVEY §4.3): the unit of work is an input shard (parquet file); a finished
shard gets ``_manifest/part=<shard>.json`` recording the input fingerprint,
row counts, wall time and stage metrics. A rerun skips shards whose manifest
exists and whose input fingerprint still matches; outputs are laid out one
directory per shard so recompute = overwrite that directory (the reference's
delete-then-reindex, ``lance_indexer.rs:234-250``, without row-level deletes).

Manifests are written atomically (tmp + rename). Unlike the reference — which
re-hashes the file *after* processing (TOCTOU, ``storage/mod.rs:62-66``) —
the fingerprint is computed once, before processing, and carried through.
"""

from __future__ import annotations

import json
import os
import time


def shard_fingerprint(path: str) -> str:
    """Cheap input fingerprint: (basename, size, mtime_ns) — no full read.

    At 100 TB a content hash per resume check would re-read the corpus;
    size+mtime is the same key every /tmp cache in this repo uses and
    catches a same-size regeneration (size alone missed it). A copied
    file with fresh mtime recomputes spuriously — the safe direction.
    Callers needing content identity use :func:`sema_ray.hashing.file_hash`.
    """
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def manifest_path(out_dir: str, shard: str) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part={shard}.json")


def write_manifest(out_dir: str, shard: str, record: dict) -> str:
    """Atomic (tmp+rename) manifest write for one finished shard."""
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    path = manifest_path(out_dir, shard)
    tmp = path + f".tmp.{os.getpid()}"
    record = dict(record)
    record.setdefault("written_unix", time.time())
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1, default=str)
    os.replace(tmp, path)
    return path


def load_manifests(out_dir: str) -> dict[str, dict]:
    d = _manifest_dir(out_dir)
    out: dict[str, dict] = {}
    if not os.path.isdir(d):
        return out
    for name in os.listdir(d):
        if name.startswith("part=") and name.endswith(".json"):
            shard = name[len("part=") : -len(".json")]
            try:
                with open(os.path.join(d, name)) as f:
                    out[shard] = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # torn/corrupt manifest => treat shard as unfinished
    return out


def shard_is_done(out_dir: str, shard: str, fingerprint: str,
                  manifests: dict[str, dict] | None = None) -> bool:
    m = (manifests or load_manifests(out_dir)).get(shard)
    return bool(m) and m.get("input_fingerprint") == fingerprint
