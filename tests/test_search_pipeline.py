"""End-to-end tests for the semantic file-search pipeline (reference parity:
crawl/chunk/embed/index/query lifecycle, incremental skip, result shaping)."""

from __future__ import annotations

import os

import pytest

from sema_ray.chunker import chunk_text
from sema_ray.pipelines import search as sp


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "proj"
    (root / "src").mkdir(parents=True)
    (root / ".git").mkdir()
    files = {
        "notes.md": "alpha beta gamma. " * 20 + "\nthe vector index is fast\n",
        "src/main.py": "def main():\n    return 'hello world'\n" * 10,
        "src/data.csv": "a,b,c\n1,2,3\n" * 5,
        "src/binary.txt": None,  # non-UTF8
        ".hidden.md": "should not be crawled",
        ".git/config.txt": "also hidden dir",
        "big.log": "x" * (11 * 1024 * 1024),  # over max size
        "empty.txt": "",
        "skip.exe": "wrong extension",
    }
    for rel, content in files.items():
        p = root / rel
        if content is None:
            p.write_bytes(b"\xff\xfe\x00i nvalid \xff utf8 bytes" * 10)
        else:
            p.write_text(content)
    return str(root)


def test_crawl_filters(tree):
    paths = sp.crawl(tree)
    rels = {os.path.relpath(p, tree) for p in paths}
    assert rels == {"notes.md", "src/main.py", "src/data.csv",
                    "src/binary.txt"}


def test_normalize_extensions():
    assert sp.normalize_extensions(["*.TXT", ".Md", "py"]) == {"txt", "md", "py"}


def test_build_index_and_incremental_skip(ray_session, tree, tmp_path):
    idx = str(tmp_path / "idx")
    m1 = sp.build_index(tree, idx)
    assert m1["files_total"] == 4
    assert m1["files_indexed"] == 4 and m1["files_skipped"] == 0
    assert m1["chunks_written"] > 0

    # chunks match the bit-exact chunker on the raw text
    import pyarrow.parquet as pq
    notes = os.path.join(tree, "notes.md")
    part = pq.read_table(os.path.join(
        idx, "chunks", f"file_key={sp.stable_id64(notes)}"))
    want = chunk_text(open(notes, encoding="utf-8").read())
    assert part.num_rows == len(want)
    got_contents = part.sort_by("ordinal")["content"].to_pylist()
    assert got_contents == [c.content for c in want]
    # id format parity: "{path}:{ordinal}" (processor.rs:62)
    assert part.sort_by("ordinal")["id"][0].as_py() == f"{notes}:0"
    # vectors present, dim 384
    assert len(part["vector"][0]) == 384

    # rebuild: everything skipped (T4)
    m2 = sp.build_index(tree, idx)
    assert m2["files_skipped"] == 4 and m2["files_indexed"] == 0

    # touch one file -> only it reindexed
    with open(notes, "a", encoding="utf-8") as f:
        f.write("\nnew appended line about vectors\n")
    m3 = sp.build_index(tree, idx)
    assert m3["files_indexed"] == 1 and m3["files_skipped"] == 3

    # deleted file -> partition dropped from index
    os.remove(os.path.join(tree, "src", "data.csv"))
    m4 = sp.build_index(tree, idx)
    assert m4["files_removed"] == 1
    assert not os.path.exists(os.path.join(
        idx, "chunks", f"file_key={sp.stable_id64(os.path.join(tree, 'src', 'data.csv'))}"))


def test_search_modes_and_grouping(ray_session, tree, tmp_path):
    idx = str(tmp_path / "idx2")
    sp.build_index(tree, idx)

    # M5: short queries cleared
    assert sp.search(idx, "ab").num_rows == 0
    assert sp.search(idx, "'a").num_rows == 0

    # exact mode: 'hello appears in main.py chunks
    hits = sp.search(idx, "'hello")
    assert hits.num_rows >= 1
    paths = hits["file_path"].to_pylist()
    assert any(p.endswith("main.py") for p in paths)
    # A1: one row per file with total_matches_in_file = group size
    assert len(paths) == len(set(paths))
    tm = hits["total_matches_in_file"].to_pylist()
    assert all(t >= 1 for t in tm)

    # semantic mode returns ranked real scores (documented deviation)
    sem = sp.search(idx, "vector index fast")
    assert sem.num_rows >= 1
    scores = sem["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)
    assert sem["file_path"][0].as_py().endswith("notes.md")


def test_display_path_and_highlight():
    assert sp.display_path("/a/b/c/d.txt", root="/a") == "b/c/d.txt"
    long = "/x/" + "y" * 60 + "/file.txt"
    d = sp.display_path(long)
    assert len(d) <= 50 and d.startswith("...")
    spans = sp.highlight_spans("Hello hello world", "hello wor")
    assert spans == [(0, 5), (6, 11), (12, 15)]


def test_search_empty_and_unmatched_schema(ray_session, tmp_path):
    """Empty / unmatched / chunk-less searches all return the same typed
    7-column schema (never a crash or a 6-column table)."""
    root = tmp_path / "only_bin"
    root.mkdir()
    (root / "data.txt").write_bytes(b"\xff\xfe invalid \xff" * 20)
    idx = str(tmp_path / "binidx")
    m = sp.build_index(str(root), idx)
    assert m["files_dropped_non_utf8"] == 1 and m["chunks_written"] == 0
    for q in ("hello world", "'zzz-not-there", "ab"):
        res = sp.search(idx, q)
        assert res.num_rows == 0
        assert res.schema.equals(sp.RESULT_SCHEMA), q
    # an indexed tree where the exact query matches nothing
    (root / "ok.txt").write_text("plain words here " * 20)
    sp.build_index(str(root), idx)
    res = sp.search(idx, "'qqqqzzz")
    assert res.num_rows == 0 and res.schema.equals(sp.RESULT_SCHEMA)


def test_neighbors_missing_bucket_empty(ray_session, tmp_path):
    from sema_ray.pipelines import kg
    import pyarrow as pa
    import ray.data as rd
    adj = rd.from_arrow(pa.table({
        "subj_id": pa.array([5], pa.int64()),
        "pred": pa.array(["works_at"], pa.string()),
        "obj_id": pa.array([9], pa.int64()),
        "subj_canonical": pa.array(["A"], pa.string()),
        "obj_canonical": pa.array(["B"], pa.string()),
        "support": pa.array([1], pa.int64()),
    }))
    out = str(tmp_path / "adj")
    kg.write_adjacency(adj, out, num_buckets=8)
    # id hashing to a bucket that was never written -> empty, no crash
    missing = 6  # 5 & 7 == 5 is the only written bucket
    got = kg.neighbors(out, missing, num_buckets=8)
    assert got.num_rows == 0
