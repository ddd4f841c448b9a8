"""Compaction of the stored format-2 index artifacts: fold accumulated
upsert tombstones into the partitioned data, touching only partitions
that can hold dead rows (parquet-footer pruning + hard links for clean
files), with the atomic stats.json swap as the commit point. The bar:
queries answer bit-identical before/after compaction, dead rows are
physically gone, clean files move zero bytes, and the upsert lifecycle
keeps working on the compacted artifact."""
import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from sema_ray import simsearch
from tests.test_index_upsert import (QUERIES, _apply_change, _corpus_a,
                                     _write_docs, _write_vecs)


def _post_root(idx: str) -> str:
    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    return os.path.join(idx, stats.get("postings_dir", "postings"))


def _all_postings(idx: str) -> pa.Table:
    files = glob.glob(os.path.join(_post_root(idx), "**", "*.parquet"),
                      recursive=True)
    return pa.concat_tables([pq.read_table(f) for f in sorted(files)])


@pytest.fixture(scope="module")
def compact_env(tmp_path_factory, ray_session):
    """Corpus A -> upsert to corpus B -> compact, plus a fresh index over
    B; records the pre-compact file inodes and tombstone kill set."""
    root = tmp_path_factory.mktemp("tix_compact")
    a_ids, a_texts = _corpus_a()
    b_ids, b_texts = _apply_change(a_ids, a_texts)
    dir_a, dir_b = str(root / "a"), str(root / "b")
    _write_docs(dir_a, a_ids, a_texts)
    _write_docs(dir_b, b_ids, b_texts)
    idx, fresh_idx = str(root / "idx"), str(root / "fresh")
    simsearch.build_text_index(dir_a, idx)
    changed = pa.table({
        "doc_id": pa.array([5, 999], pa.int64()),
        "text": pa.array([b_texts[b_ids.index(5)],
                          b_texts[b_ids.index(999)]], pa.string())})
    stats_up = simsearch.upsert_text_index(idx, rd.from_arrow(changed),
                                           removed_ids=[7])
    kids, kgens = simsearch._load_kill(idx)
    pre_answers = {q: simsearch.bm25_search_indexed(idx, query=q,
                                                    k=8).to_pandas()
                   for q in QUERIES}
    pre_root = os.path.join(idx, "postings")
    pre_inodes = {os.path.relpath(f, pre_root): os.stat(f).st_ino
                  for f in glob.glob(os.path.join(pre_root, "**",
                                                  "*.parquet"),
                                     recursive=True)}
    stats_c = simsearch.compact_text_index(idx)
    stats_fresh = simsearch.build_text_index(dir_b, fresh_idx)
    return dict(dir_b=dir_b, idx=idx, fresh_idx=fresh_idx,
                stats_up=stats_up, stats_c=stats_c,
                stats_fresh=stats_fresh, kids=kids, kgens=kgens,
                pre_answers=pre_answers, pre_inodes=pre_inodes,
                b_ids=b_ids, b_texts=b_texts)


def test_text_compact_queries_bit_identical(compact_env):
    """Every query answers bit-identical on the compacted artifact, the
    pre-compact artifact, and a fresh build over the updated corpus."""
    for q in QUERIES:
        got = simsearch.bm25_search_indexed(compact_env["idx"], query=q,
                                            k=8).to_pandas()
        fresh = simsearch.bm25_search_indexed(compact_env["fresh_idx"],
                                              query=q, k=8).to_pandas()
        assert got.reset_index(drop=True).equals(
            compact_env["pre_answers"][q].reset_index(drop=True)), q
        assert got.reset_index(drop=True).equals(
            fresh.reset_index(drop=True)), q


def test_text_compact_dead_rows_physically_gone(compact_env):
    """After compaction the partitioned data holds NO tombstone-killed
    row — removed doc 7 is gone entirely, changed doc 5 keeps only its
    newest generation — and the tombstone set is empty."""
    t = _all_postings(compact_env["idx"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    gens = t["gen"].to_numpy(zero_copy_only=False)
    kids, kgens = compact_env["kids"], compact_env["kgens"]
    idx = np.minimum(np.searchsorted(kids, ids), len(kids) - 1)
    assert not ((kids[idx] == ids) & (gens < kgens[idx])).any()
    assert 7 not in set(ids.tolist())
    assert set(gens[ids == 5].tolist()) == {1}
    nk, _ = simsearch._load_kill(compact_env["idx"])
    assert len(nk) == 0
    # old epoch dirs are gone; the new tombstone dir is empty
    assert not os.path.exists(os.path.join(compact_env["idx"],
                                           "postings"))
    assert not os.path.exists(os.path.join(compact_env["idx"],
                                           "tombstones"))


def test_text_compact_hard_links_clean_files(compact_env):
    """Files whose footer proves them clean are hard-linked (same inode),
    not copied or rewritten — compaction I/O scales with the dirty set,
    not the index."""
    root = _post_root(compact_env["idx"])
    post = glob.glob(os.path.join(root, "**", "*.parquet"),
                     recursive=True)
    linked = [f for f in post
              if os.path.relpath(f, root) in compact_env["pre_inodes"]
              and os.stat(f).st_ino
              == compact_env["pre_inodes"][os.path.relpath(f, root)]]
    rewritten = [f for f in post if os.path.basename(f).startswith(
        "compact-e")]
    assert linked, "no clean file was hard-linked"
    assert rewritten, "no dirty file was rewritten"
    # every surviving file is one or the other
    assert len(linked) + len(rewritten) == len(post)


def test_text_compact_stats_and_totals_preserved(compact_env):
    up, c = compact_env["stats_up"], compact_env["stats_c"]
    fresh = compact_env["stats_fresh"]
    assert c["n_docs"] == up["n_docs"] == fresh["n_docs"]
    assert c["total_len"] == up["total_len"] == fresh["total_len"]
    assert c["gen"] == up["gen"]  # generations keep counting
    assert c["epoch"] == 1


def test_text_upsert_after_compact(compact_env, tmp_path):
    """The lifecycle continues on the compacted artifact: a further
    generation upserts into the epoch directories and matches a fresh
    build of the final corpus bit-identically."""
    idx = compact_env["idx"]
    b_ids, b_texts = compact_env["b_ids"], compact_env["b_texts"]
    final5 = "alpha alpha post compact version of doc five"
    stats = simsearch.upsert_text_index(
        idx, rd.from_arrow(pa.table({
            "doc_id": pa.array([5], pa.int64()),
            "text": pa.array([final5], pa.string())})))
    assert stats["gen"] == 2
    c_ids, c_texts = list(b_ids), list(b_texts)
    c_texts[c_ids.index(5)] = final5
    dir_c, fresh = str(tmp_path / "c"), str(tmp_path / "fresh")
    _write_docs(dir_c, c_ids, c_texts)
    fstats = simsearch.build_text_index(dir_c, fresh)
    assert stats["n_docs"] == fstats["n_docs"]
    assert stats["total_len"] == fstats["total_len"]
    for q in QUERIES + ["post compact"]:
        up = simsearch.bm25_search_indexed(idx, query=q, k=8).to_pandas()
        fr = simsearch.bm25_search_indexed(fresh, query=q,
                                           k=8).to_pandas()
        assert up.reset_index(drop=True).equals(
            fr.reset_index(drop=True)), q
    # and a SECOND compaction folds the new tombstone in
    stats2 = simsearch.compact_text_index(idx)
    assert stats2["epoch"] == 2
    got = simsearch.bm25_search_indexed(idx, query="post compact",
                                        k=8).to_pandas()
    fr = simsearch.bm25_search_indexed(fresh, query="post compact",
                                       k=8).to_pandas()
    assert got.reset_index(drop=True).equals(fr.reset_index(drop=True))


def test_text_compact_noop_without_tombstones(ray_session, tmp_path):
    a_ids, a_texts = _corpus_a()
    dir_a = str(tmp_path / "a")
    _write_docs(dir_a, a_ids, a_texts)
    idx = str(tmp_path / "idx")
    before = simsearch.build_text_index(dir_a, idx)
    after = simsearch.compact_text_index(idx)
    assert after == before  # no tombstones -> no new epoch, dirs intact
    assert os.path.isdir(os.path.join(idx, "postings"))


def test_footer_prune_is_exact_on_planted_files(tmp_path):
    """Unit check of the parquet-footer dirty test: a file whose id range
    misses every killed id — or whose generations all postdate the kill —
    is provably clean; a file holding a killed old-generation row is
    flagged."""
    kids = np.array([10, 50], np.int64)
    kgens = np.array([2, 1], np.int64)

    def write(name, ids, gens):
        p = str(tmp_path / name)
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "gen": pa.array(gens, pa.int64())}), p)
        return p

    clean_range = write("a.parquet", [1, 2, 3], [0, 0, 0])
    # provably clean by generation: min gen (2) >= every kill gen in the
    # id range — a mixed file like gens [2, 1] is NOT provable from the
    # footer alone and must stay conservatively dirty
    clean_gen = write("b.parquet", [10, 50], [2, 2])
    dirty = write("c.parquet", [9, 10, 11], [1, 1, 1])
    assert not simsearch._file_may_hold_dead(clean_range, "doc_id",
                                             kids, kgens)
    assert not simsearch._file_may_hold_dead(clean_gen, "doc_id",
                                             kids, kgens)
    assert simsearch._file_may_hold_dead(dirty, "doc_id", kids, kgens)


def test_text_compact_distributed_path_identical(ray_session, tmp_path,
                                                 monkeypatch):
    """Force the distributed rewrite (COMPACT_LOCAL_MAX_BYTES=0): the
    streaming include_paths -> kill-filter -> partitioned-write pass must
    leave the artifact answering bit-identically, with the partition
    column in the PATH only (same file schema as the driver path)."""
    a_ids, a_texts = _corpus_a()
    b_ids, b_texts = _apply_change(a_ids, a_texts)
    dir_a = str(tmp_path / "a")
    _write_docs(dir_a, a_ids, a_texts)
    idx = str(tmp_path / "idx")
    simsearch.build_text_index(dir_a, idx)
    simsearch.upsert_text_index(
        idx, rd.from_arrow(pa.table({
            "doc_id": pa.array([5, 999], pa.int64()),
            "text": pa.array([b_texts[b_ids.index(5)],
                              b_texts[b_ids.index(999)]], pa.string())})),
        removed_ids=[7])
    pre = {q: simsearch.bm25_search_indexed(idx, query=q, k=8).to_pandas()
           for q in QUERIES}
    monkeypatch.setattr(simsearch, "COMPACT_LOCAL_MAX_BYTES", 0)
    simsearch.compact_text_index(idx)
    files = glob.glob(os.path.join(_post_root(idx), "**", "*.parquet"),
                      recursive=True)
    for f in files:
        assert "bucket" not in pq.read_schema(f).names
    t = _all_postings(idx)
    assert 7 not in set(t["doc_id"].to_numpy(zero_copy_only=False)
                        .tolist())
    for q in QUERIES:
        got = simsearch.bm25_search_indexed(idx, query=q,
                                            k=8).to_pandas()
        assert got.reset_index(drop=True).equals(
            pre[q].reset_index(drop=True)), q


def test_vector_compact_matches_fresh_and_prunes(ray_session, tmp_path):
    """Vector artifact: upsert (change vec 6, add 500, remove 9), then
    compact — the pruned-read query is unchanged, dead rows leave the
    list partitions, centroids stay byte-identical, and a further upsert
    still works."""
    rng = np.random.default_rng(23)
    ids = list(range(30))
    vecs = [rng.standard_normal(16).astype(np.float32) for _ in ids]
    dir_a = str(tmp_path / "a")
    _write_vecs(dir_a, ids, vecs)
    idx = str(tmp_path / "vix")
    simsearch.build_vector_index(dir_a, idx, n_lists=4)
    new6 = rng.standard_normal(16).astype(np.float32)
    new500 = (vecs[0] + 0.01 * rng.standard_normal(16)).astype(np.float32)
    simsearch.upsert_vector_index(
        idx,
        rd.from_arrow(pa.table({
            "vec_id": pa.array([6, 500], pa.int64()),
            "embedding": pa.array([new6.tolist(), new500.tolist()],
                                  pa.list_(pa.float32()))})),
        removed_ids=[9])
    cents_before = pq.read_table(os.path.join(idx, "centroids.parquet"))
    pre = simsearch.knn_ivf_indexed(idx, dir_a, k=5, n_queries=3,
                                    n_probe=2).to_pandas()
    stats = simsearch.compact_vector_index(idx)
    assert stats["epoch"] == 1
    assert pq.read_table(os.path.join(idx, "centroids.parquet")).equals(
        cents_before)
    post = simsearch.knn_ivf_indexed(idx, dir_a, k=5, n_queries=3,
                                     n_probe=2).to_pandas()
    assert post.reset_index(drop=True).equals(pre.reset_index(drop=True))
    with open(os.path.join(idx, "stats.json")) as f:
        st = json.load(f)
    lists = glob.glob(os.path.join(idx, st["lists_dir"], "**",
                                   "*.parquet"), recursive=True)
    t = pa.concat_tables([pq.read_table(
        f, columns=["vec_id", "gen"]) for f in sorted(lists)])
    vid = t["vec_id"].to_numpy(zero_copy_only=False)
    assert 9 not in set(vid.tolist())
    assert set(t["gen"].to_numpy(zero_copy_only=False)[
        vid == 6].tolist()) == {1}
    nk, _ = simsearch._load_kill(idx, id_col="vec_id")
    assert len(nk) == 0
    # lifecycle continues: remove vec 500 again post-compaction
    stats2 = simsearch.upsert_vector_index(
        idx, rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32()))})),
        removed_ids=[500])
    assert stats2["gen"] == 2
    got = simsearch.knn_ivf_indexed(idx, dir_a, k=5, n_queries=3,
                                    n_probe=2).to_pandas()
    assert 500 not in set(got["neighbor_id"].tolist())
