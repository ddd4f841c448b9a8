"""File-format sources: JSONL and CSV corpora as first-class inputs.

The reference ingests a directory tree of whole files (crawler, S1/S2 —
``crawler.rs``); large training-data pipelines equally ingest JSONL shards
and CSV exports. These wrappers keep the Ray-Data-native path —
``ray.data.read_json`` / ``read_csv`` stream shards as Arrow blocks with
the same backpressure as the parquet reads — and add the repo conventions:
prune columns AT the read, and synthesize deterministic sharded fixtures
from the testdata parquet (cache under ``/tmp/sema_ray_files`` keyed by
source size+mtime, crash-safe ``_COMPLETE`` marker) so tests and oracles
need no external data.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd

_CACHE_ROOT = "/tmp/sema_ray_files"


def _cache_dir(sf_dir: str, table: str, kind: str) -> str:
    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    base = (f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"-{table}-{st.st_size}-{int(st.st_mtime)}-{kind}")
    return os.path.join(_CACHE_ROOT, base)


def ensure_jsonl(sf_dir: str, num_shards: int = 8) -> str:
    """documents.parquet -> sharded ``part-K.jsonl`` fixture (one JSON
    object per line: doc_id, lang, text), deterministic by doc_id mod."""
    import pyarrow.parquet as pq

    root = _cache_dir(sf_dir, "documents", f"jsonl-sh{num_shards}")
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "lang", "text"])
    shards = [open(os.path.join(root, f"part-{k}.jsonl"), "w")
              for k in range(num_shards)]
    try:
        for doc_id, lang, text in zip(t["doc_id"].to_pylist(),
                                      t["lang"].to_pylist(),
                                      t["text"].to_pylist()):
            shards[doc_id % num_shards].write(
                json.dumps({"doc_id": doc_id, "lang": lang, "text": text})
                + "\n")
    finally:
        for f in shards:
            f.close()
    with open(marker, "w") as f:
        f.write("ok")
    return root


def _csv_field(v) -> str:
    """RFC-4180 field with a NULL convention both engines share: None ->
    UNQUOTED empty, '' -> QUOTED empty, specials (comma/quote/newline)
    quoted with doubled quotes. Round-trips exactly under Arrow
    ``strings_can_be_null=True, quoted_strings_can_be_null=False`` and
    DuckDB ``allow_quoted_nulls=false`` (pinned by experiment — the two
    defaults DISAGREE on quoted empties)."""
    if v is None:
        return ""
    s = str(v)
    if s == "" or any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def ensure_csv(sf_dir: str, num_shards: int = 8) -> str:
    """events.parquet -> sharded ``part-K.csv`` fixture (event_id, user_id,
    event_type, ts_us as int64 microseconds), deterministic by id mod.
    Fields are RFC-4180 quoted (``_csv_field``) so NULLs, empty strings,
    and embedded commas/quotes/newlines survive the round trip."""
    import pyarrow.parquet as pq

    # kind bumped csv->csvq when quoting landed (cache dirs are content-
    # addressed by SOURCE size+mtime only, not writer version)
    root = _cache_dir(sf_dir, "events", f"csvq-sh{num_shards}")
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    os.makedirs(root, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "user_id", "event_type", "ts"])
    ts_us = t["ts"].cast(pa.int64()).to_pylist()
    shards = [open(os.path.join(root, f"part-{k}.csv"), "w")
              for k in range(num_shards)]
    try:
        for f in shards:
            f.write("event_id,user_id,event_type,ts_us\n")
        for eid, uid, et, ts in zip(t["event_id"].to_pylist(),
                                    t["user_id"].to_pylist(),
                                    t["event_type"].to_pylist(), ts_us):
            shards[eid % num_shards].write(
                ",".join(_csv_field(x) for x in (eid, uid, et, ts)) + "\n")
    finally:
        for f in shards:
            f.close()
    with open(marker, "w") as f:
        f.write("ok")
    return root


def read_jsonl(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Streaming JSONL read (one Arrow block per shard group); ``columns``
    prunes immediately after parse (JSON has no column projection at the
    byte level — prune-at-read here means dropping columns before the
    first shuffle/materialization, inside the read task)."""
    ds = rd.read_json(path, file_extensions=["jsonl", "json"])
    if columns:
        ds = ds.select_columns(columns)
    return ds


def read_csv_dir(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Streaming CSV read; Arrow's CSV reader DOES support true column
    projection, so ``columns`` never materializes the rest. NULL policy
    matches the writer: unquoted empty -> NULL, quoted empty -> ''."""
    import pyarrow.csv as pacsv

    convert = pacsv.ConvertOptions(
        include_columns=columns or None,
        strings_can_be_null=True, quoted_strings_can_be_null=False)
    return rd.read_csv(path, convert_options=convert,
                       file_extensions=["csv"])
