"""CLI entry point: ``python -m sema_ray {index,search,kg} ...``.

``kg`` is the job entry the north rule names: submit with
``ray job submit -- python -m sema_ray kg INPUT_DIR --out OUT_DIR`` —
RAY_ADDRESS (exported by the job runtime) routes ``ray.init`` at the
cluster; the run checkpoints per shard and resumes by manifest
fingerprint, so a killed job re-submitted with the same arguments skips
every finished partition.

The argument surface mirrors the reference CLI (``/root/reference/src/cli/
args.rs:10-46``: directory, --max-file-size, --include-hidden,
--follow-symlinks, --extensions, --exclude, gitignore toggle) on top of the
TOML config (:mod:`sema_ray.config`), with the reference's override-merge
rules. The TUI itself is out of scope (SURVEY.md intro); ``search`` prints
the grouped/ranked results the TUI would render.

This module OWNS a Ray session (the one place besides bench.py and the test
fixture allowed to call ``ray.init``).
"""

from __future__ import annotations

import argparse
import os
import sys


def _split(v: str | None) -> list[str] | None:
    return None if v is None else [x for x in v.split(",") if x]


def main(argv: list[str] | None = None) -> int:
    from .config import apply_overrides, load_config

    p = argparse.ArgumentParser(prog="sema_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("index", help="crawl + chunk + embed + index a tree")
    pi.add_argument("directory")
    pi.add_argument("--index-dir", required=True)
    pi.add_argument("--config", default=None, help="TOML config path")
    pi.add_argument("--max-file-size", type=int, default=None)
    pi.add_argument("--include-hidden", action="store_true")
    pi.add_argument("--follow-symlinks", action="store_true")
    pi.add_argument("--respect-gitignore", action="store_true")
    pi.add_argument("--extensions", default=None,
                    help="comma-separated; REPLACES configured list")
    pi.add_argument("--exclude", default=None,
                    help="comma-separated; APPENDED to configured patterns")

    ps = sub.add_parser("search", help="query a built index")
    ps.add_argument("query", help="'-prefix for exact text search")
    ps.add_argument("--index-dir", required=True)
    ps.add_argument("--k", type=int, default=50)

    pk = sub.add_parser(
        "kg",
        help="checkpointed KG construction over transcript parquet shards "
             "(the `ray job submit` entry point: resumes by skipping shards "
             "whose manifest fingerprint matches)")
    pk.add_argument("input_dir",
                    help="directory of transcript .parquet shards "
                         "(conv_id, turn_idx, role, text, tool, ts)")
    pk.add_argument("--out", required=True, help="output/checkpoint dir")
    pk.add_argument("--shards-per-wave", type=int, default=4)

    args = p.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        # Under `ray job submit` the runtime exports RAY_ADDRESS pointing at
        # the cluster; standalone runs fall back to a local session.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False,
                 logging_level="ERROR")
    try:
        from .pipelines.search import build_index, display_path, search
        if args.cmd == "index":
            cfg = apply_overrides(
                load_config(args.config),
                max_file_size=args.max_file_size,
                include_hidden=args.include_hidden,
                follow_symlinks=args.follow_symlinks,
                respect_gitignore=args.respect_gitignore,
                extensions=_split(args.extensions),
                exclude=_split(args.exclude),
            )
            stats = build_index(os.path.abspath(args.directory),
                                args.index_dir, config=cfg)
            print(stats)
        elif args.cmd == "kg":
            import json
            from .pipelines.kg import run_kg
            stats = run_kg(os.path.abspath(args.input_dir),
                           os.path.abspath(args.out),
                           shards_per_wave=args.shards_per_wave)
            print(json.dumps(stats))
        else:
            results = search(args.index_dir, args.query, k=args.k)
            for row in results.to_pylist():
                print(f"{row['score']:10.4f}  "
                      f"{display_path(row['file_path'])}"
                      f":{row['start_line']}-{row['end_line']}  "
                      f"({row['total_matches_in_file']} matches)")
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
