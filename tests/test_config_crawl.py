"""Crawler-parity tests (gitignore / exclude patterns / symlinks /
same-filesystem — reference ``src/crawler/mod.rs:44-55``), the TOML config +
CLI override merge (``src/config/mod.rs``, ``src/main.rs:31-59``), and the
embedder backend flag (SURVEY §2 T1)."""

from __future__ import annotations

import os

import pytest

from sema_ray.config import (DEFAULT_EXCLUDE, GeneralConfig, apply_overrides,
                             load_config)
from sema_ray.embed import HashEmbedder, make_embedder
from sema_ray.pipelines.search import crawl


def _mk(root, rel, content="x"):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write(content)
    return p


def _names(paths, root):
    return sorted(os.path.relpath(p, root) for p in paths)


def test_crawl_gitignore(tmp_path):
    root = str(tmp_path)
    _mk(root, "a.txt")
    _mk(root, "debug.log")
    _mk(root, "keep.log")
    _mk(root, "build/out.txt")
    _mk(root, "src/main.py")
    _mk(root, "src/scratch.txt")
    _mk(root, ".gitignore", "*.log\nbuild/\n!keep.log\n")
    _mk(root, "src/.gitignore", "scratch.txt\n")
    exts = ("txt", "log", "py")
    got = _names(crawl(root, extensions=exts), root)
    assert got == ["a.txt", "keep.log", "src/main.py"]
    # gitignore off: everything (except the .gitignore files: no extension
    # match needed — they're hidden files, dropped anyway)
    got_all = _names(crawl(root, extensions=exts, respect_gitignore=False),
                     root)
    assert got_all == ["a.txt", "build/out.txt", "debug.log", "keep.log",
                      "src/main.py", "src/scratch.txt"]


def test_crawl_exclude_patterns(tmp_path):
    root = str(tmp_path)
    _mk(root, "a.txt")
    _mk(root, "x.tmp.txt")
    _mk(root, "node_modules/dep/lib.txt")
    _mk(root, "deep/node_modules/d/m.txt")
    got = _names(crawl(root, extensions=("txt",),
                       exclude_patterns=("node_modules", "x.*")), root)
    assert got == ["a.txt"]


def test_crawl_follow_symlinks(tmp_path):
    root = str(tmp_path / "root")
    other = str(tmp_path / "other")
    _mk(root, "real.txt")
    _mk(other, "linked.txt")
    os.symlink(os.path.join(other, "linked.txt"),
               os.path.join(root, "link.txt"))
    os.symlink(other, os.path.join(root, "linkdir"))
    no_follow = _names(crawl(root, extensions=("txt",)), root)
    assert no_follow == ["real.txt"]
    follow = _names(crawl(root, extensions=("txt",), follow_symlinks=True,
                          same_file_system=False), root)
    assert follow == ["link.txt", "linkdir/linked.txt", "real.txt"]


def test_crawl_symlink_cycle_terminates(tmp_path):
    """A directory symlink cycle must not hang the crawl (ADVICE r2): the
    walker prunes any directory whose (dev, ino) was already visited."""
    root = str(tmp_path / "root")
    _mk(root, "a/deep/file.txt")
    os.symlink(root, os.path.join(root, "a", "deep", "loop"))
    os.symlink(os.path.join(root, "a"), os.path.join(root, "selfa"))
    got = _names(crawl(root, extensions=("txt",), follow_symlinks=True,
                       same_file_system=False), root)
    # the cycle edge is pruned; the real file is found exactly once (under
    # whichever alias of the directory the walker reached first)
    assert got in (["a/deep/file.txt"], ["selfa/deep/file.txt"])


def test_config_load_and_overrides(tmp_path):
    toml = tmp_path / "config.toml"
    toml.write_text(
        "[general]\n"
        "max_file_size = 1234\n"
        'file_extensions = ["py", "txt"]\n'
        'exclude_patterns = ["vendor"]\n'
        "follow_symlinks = false\n"
        "include_hidden = false\n"
        "ignore_gitignore = true\n")
    cfg = load_config(str(toml))
    assert cfg.max_file_size == 1234
    assert cfg.file_extensions == ["py", "txt"]
    assert cfg.exclude_patterns == ["vendor"]
    assert cfg.respect_gitignore is True
    # CLI merge: extensions REPLACE, excludes APPEND-dedup, flags only set
    cfg = apply_overrides(cfg, max_file_size=99, include_hidden=True,
                          extensions=["md"], exclude=["vendor", "dist"])
    assert cfg.max_file_size == 99
    assert cfg.include_hidden is True
    assert cfg.file_extensions == ["md"]
    assert cfg.exclude_patterns == ["vendor", "dist"]
    # defaults (missing file) mirror the reference's GeneralConfig::default
    d = load_config(None)
    assert d.max_file_size == 10_485_760
    assert d.exclude_patterns == DEFAULT_EXCLUDE
    assert d.follow_symlinks is False and d.include_hidden is False


def test_build_index_with_config(ray_session, tmp_path):
    root = str(tmp_path / "tree")
    _mk(root, "a.txt", "alpha beta gamma " * 10)
    _mk(root, "skip.log", "log line " * 10)
    _mk(root, ".gitignore", "*.log\n")
    from sema_ray.pipelines.search import build_index
    cfg = GeneralConfig(file_extensions=["txt", "log"])
    stats = build_index(root, str(tmp_path / "idx"), config=cfg)
    assert stats["files_indexed"] == 1  # skip.log gitignored
    assert stats["chunks_written"] >= 1


def test_build_index_all_files_below_min_chunk(ray_session, tmp_path):
    """Sub-50-byte files chunk to nothing (processor.rs:34-36) — the build
    must record them as indexed-with-0-chunks, not crash."""
    root = str(tmp_path / "tree")
    _mk(root, "tiny.txt", "short")
    from sema_ray.pipelines.search import build_index
    stats = build_index(root, str(tmp_path / "idx"))
    assert stats["files_indexed"] == 1
    assert stats["chunks_written"] == 0


def test_embedder_backend_flag():
    assert isinstance(make_embedder(), HashEmbedder)
    assert isinstance(make_embedder("hash"), HashEmbedder)
    with pytest.raises(RuntimeError, match="model_dir"):
        make_embedder("onnx")
    with pytest.raises(RuntimeError, match="onnxruntime"):
        make_embedder("onnx", model_dir="/tmp/nonexistent-model")
    with pytest.raises(ValueError, match="backend"):
        make_embedder("bogus")


def test_cli_index_and_search(ray_session, tmp_path, capsys):
    root = str(tmp_path / "tree")
    _mk(root, "a.txt", "the quick brown fox jumps over the lazy dog " * 4)
    _mk(root, "b.txt", "vector table scan performance notes " * 4)
    idx = str(tmp_path / "idx")
    from sema_ray.__main__ import main
    assert main(["index", root, "--index-dir", idx,
                 "--extensions", "txt"]) == 0
    assert main(["search", "'vector", "--index-dir", idx]) == 0
    out = capsys.readouterr().out
    assert "b.txt" in out


def test_cli_kg_job_entry(ray_session, tmp_path, capsys):
    """`python -m sema_ray kg` — the `ray job submit` entry: runs the
    checkpointed KG pipeline and prints the lineage/metrics JSON; a second
    invocation resumes by skipping every finished shard."""
    import json
    from sema_ray.sources.transcripts import generate_transcripts, \
        write_sharded
    d = str(tmp_path / "shards")
    write_sharded(generate_transcripts(n_convs=12, seed=3), d, num_shards=2)
    out = str(tmp_path / "kg_out")
    from sema_ray.__main__ import main
    assert main(["kg", d, "--out", out, "--shards-per-wave", "1"]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["shards_processed"] == m1["shards_total"] == 2
    assert m1["triples_out"] > 0
    assert main(["kg", d, "--out", out]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["shards_skipped"] == 2 and m2["shards_processed"] == 0


def test_crawl_doublestar_grammar(tmp_path):
    """Full ``**`` semantics (reference gets these from the ignore crate):
    ``a/**/b`` spans zero or more directories, leading ``**/`` matches at
    any depth, trailing ``/**`` matches everything inside, and ``*`` never
    crosses a slash."""
    root = str(tmp_path)
    for rel in ["a/b/x.txt", "a/m/b/x.txt", "a/m/n/b/x.txt", "a/c/x.txt",
                "top.txt", "d/top.txt", "d/e/top.txt",
                "logs/x.txt", "logs/sub/y.txt", "logs.txt",
                "s/one.txt", "s/deep/two.txt"]:
        _mk(root, rel)
    _mk(root, ".gitignore",
        "a/**/b/\n"      # dirs named b under a, any depth (incl. a/b)
        "**/top.txt\n"   # top.txt at any depth
        "logs/**\n"      # everything inside logs/, not logs.txt
        "s/*.txt\n")     # only directly inside s/ — '*' must not cross '/'
    got = _names(crawl(root, extensions=("txt",)), root)
    assert got == ["a/c/x.txt", "logs.txt", "s/deep/two.txt"]


def test_crawl_gitignore_matches_git_check_ignore(tmp_path):
    """Authoritative cross-check: the same tree + .gitignore evaluated by
    ``git check-ignore`` must keep exactly the files our crawl keeps."""
    import shutil
    import subprocess
    if shutil.which("git") is None:
        pytest.skip("git not available")
    root = str(tmp_path)
    files = ["a/b/x.txt", "a/m/b/y.txt", "a/m/n/b/z.txt", "a/keep.txt",
             "v/w.txt", "v/sub/w.txt", "deep/er/est/n.txt", "deep/n.txt",
             "q/one.txt", "q/r/two.txt", "top.txt", "e/f/g.txt",
             "cls/ab.txt", "cls/cb.txt", "neg/drop.txt", "neg/keep.txt"]
    for rel in files:
        _mk(root, rel)
    _mk(root, ".gitignore",
        "a/**/b/\n**/w.txt\ndeep/**\nq/*.txt\ne/f\ncls/[ac]b.txt\n"
        "neg/*\n!neg/keep.txt\n")
    subprocess.run(["git", "init", "-q", root], check=True,
                   env={**os.environ, "HOME": root})
    proc = subprocess.run(
        ["git", "-C", root, "check-ignore", "--no-index", "--stdin"],
        input="\n".join(files), capture_output=True, text=True)
    git_ignored = set(proc.stdout.split())
    expected = sorted(f for f in files if f not in git_ignored)
    got = _names(crawl(root, extensions=("txt",)), root)
    assert got == expected, (got, expected, sorted(git_ignored))
