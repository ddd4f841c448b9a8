"""Incremental stored-index maintenance (VERDICT r4 missing #1): the
delete-then-add upsert of the reference's hash-diff indexing loop
(/root/reference/src/storage/mod.rs:38-52 driving create-or-append +
delete+add at lance_indexer.rs:92-102,215-229), lifted to the format-2
text and vector artifacts. The bar (set by the verdict): a 1-doc change
must touch only its own buckets, and the upserted index must answer
queries BIT-IDENTICAL to a fresh build over the updated corpus."""
import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from sema_ray import simsearch


def _write_docs(path: str, ids, texts) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": pa.array(list(ids), pa.int64()),
                  "text": pa.array(list(texts), pa.string())}),
        os.path.join(path, "documents.parquet"))


def _corpus_a():
    rng = np.random.default_rng(17)
    words = [f"w{i}" for i in range(40)] + ["alpha", "beta", "gamma"]
    ids = list(range(20))
    texts = [" ".join(rng.choice(words, size=30)) for _ in ids]
    texts[5] = "alpha beta " + texts[5]
    texts[7] = "gamma gamma " + texts[7]
    return ids, texts


def _apply_change(ids, texts):
    """Corpus B = A with doc 5 rewritten, doc 7 removed, doc 999 added."""
    ids, texts = list(ids), list(texts)
    texts[5] = "alpha rewritten completely different text now"
    del ids[7], texts[7]
    ids.append(999)
    texts.append("beta gamma fresh document about alpha things")
    return ids, texts


QUERIES = ["alpha", "alpha beta", "beta gamma w3", "gamma^2 alpha",
           "doesnotexistterm"]


@pytest.fixture(scope="module")
def upsert_env(tmp_path_factory, ray_session):
    """One format-2 index built over corpus A, upserted to corpus B, plus
    a fresh index over corpus B and the raw corpus-B docs dir."""
    root = tmp_path_factory.mktemp("tix_upsert")
    a_ids, a_texts = _corpus_a()
    b_ids, b_texts = _apply_change(a_ids, a_texts)
    dir_a, dir_b = str(root / "a"), str(root / "b")
    _write_docs(dir_a, a_ids, a_texts)
    _write_docs(dir_b, b_ids, b_texts)
    up_idx, fresh_idx = str(root / "up"), str(root / "fresh")
    stats_a = simsearch.build_text_index(dir_a, up_idx)
    pre_files = set(glob.glob(os.path.join(up_idx, "postings", "**",
                                           "*.parquet"), recursive=True))
    pre_sizes = {f: os.path.getsize(f) for f in pre_files}
    changed = pa.table({
        "doc_id": pa.array([5, 999], pa.int64()),
        "text": pa.array([b_texts[b_ids.index(5)],
                          b_texts[b_ids.index(999)]], pa.string())})
    stats_up = simsearch.upsert_text_index(up_idx, rd.from_arrow(changed),
                                           removed_ids=[7])
    stats_fresh = simsearch.build_text_index(dir_b, fresh_idx)
    return dict(dir_a=dir_a, dir_b=dir_b, up_idx=up_idx,
                fresh_idx=fresh_idx, stats_a=stats_a, stats_up=stats_up,
                stats_fresh=stats_fresh, pre_files=pre_files,
                pre_sizes=pre_sizes,
                changed_texts=changed["text"].to_pylist())


def test_text_upsert_stats_match_fresh(upsert_env):
    """n_docs/total_len adjust incrementally to EXACTLY the fresh-build
    values (the avg_len input to every future BM25 score)."""
    up, fresh = upsert_env["stats_up"], upsert_env["stats_fresh"]
    assert up["n_docs"] == fresh["n_docs"] == 20  # 20 - 1 removed + 1 new
    assert up["total_len"] == fresh["total_len"]
    assert up["gen"] == 1 and fresh["gen"] == 0
    assert up["format"] == simsearch.TEXT_INDEX_FORMAT


def test_text_upsert_queries_bit_identical(upsert_env):
    """Every query answers bit-identical on the upserted artifact, the
    fresh artifact, and the scan path over the updated corpus."""
    for q in QUERIES:
        scan = simsearch.bm25_search(upsert_env["dir_b"], query=q,
                                     k=8).to_pandas()
        up = simsearch.bm25_search_indexed(upsert_env["up_idx"], query=q,
                                           k=8).to_pandas()
        fresh = simsearch.bm25_search_indexed(upsert_env["fresh_idx"],
                                              query=q, k=8).to_pandas()
        assert up.reset_index(drop=True).equals(
            fresh.reset_index(drop=True)), q
        assert up.reset_index(drop=True).equals(
            scan.reset_index(drop=True)), q


def test_text_upsert_removed_and_stale_gone(upsert_env):
    """Doc 7 (removed) and doc 5's OLD terms must be unreachable; doc 5's
    new text and doc 999 must rank."""
    got = simsearch.bm25_search_indexed(upsert_env["up_idx"],
                                        query="gamma", k=20).to_pandas()
    assert 7 not in set(got["doc_id"])
    assert 999 in set(got["doc_id"])
    got5 = simsearch.bm25_search_indexed(upsert_env["up_idx"],
                                         query="rewritten", k=5).to_pandas()
    assert set(got5["doc_id"]) == {5}


def test_text_upsert_touches_only_affected_buckets(upsert_env):
    """The verdict's bar: a small upsert appends files ONLY under the
    buckets the changed docs' terms hash into (plus the affected ids'
    doclen partitions and one tombstone file); every pre-existing file is
    byte-untouched."""
    up_idx = upsert_env["up_idx"]
    post = set(glob.glob(os.path.join(up_idx, "postings", "**",
                                      "*.parquet"), recursive=True))
    # nothing rewritten in place
    for f in upsert_env["pre_files"]:
        assert f in post
        assert os.path.getsize(f) == upsert_env["pre_sizes"][f]
    new_files = post - upsert_env["pre_files"]
    n_buckets = upsert_env["stats_up"]["n_buckets"]
    # expected term buckets: the changed docs' distinct terms only
    terms = sorted({w for txt in upsert_env["changed_texts"]
                    for w in txt.split()})
    term_buckets = set(simsearch._term_buckets(
        pa.array(terms, pa.string()), n_buckets).tolist())
    doclen_buckets = set(simsearch._doclen_buckets(
        np.array([5, 999], np.int64)).tolist())
    allowed = {f"bucket={b}" for b in term_buckets | doclen_buckets}
    got_dirs = {os.path.basename(os.path.dirname(f)) for f in new_files}
    assert got_dirs <= allowed
    assert got_dirs & {f"bucket={b}" for b in term_buckets}
    tombs = glob.glob(os.path.join(up_idx, "tombstones", "*.parquet"))
    assert len(tombs) == 1
    tt = pq.read_table(tombs[0])
    assert sorted(tt["doc_id"].to_pylist()) == [5, 7, 999]


def test_text_upsert_sequential_rechange_and_readd(ray_session, tmp_path):
    """Two further generations: re-change doc 5 again, then re-ADD doc 7
    after its removal — latest generation must win and match a fresh
    build of the final corpus bit-identically."""
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
    # gen 2: doc 5 changes AGAIN; doc 7 comes back with new text
    final5 = "alpha alpha third version of doc five"
    final7 = "gamma returns to the corpus with beta"
    stats = simsearch.upsert_text_index(
        idx, rd.from_arrow(pa.table({
            "doc_id": pa.array([5, 7], pa.int64()),
            "text": pa.array([final5, final7], pa.string())})))
    assert stats["gen"] == 2
    c_ids, c_texts = list(b_ids), list(b_texts)
    c_texts[c_ids.index(5)] = final5
    c_ids.append(7)
    c_texts.append(final7)
    dir_c, fresh = str(tmp_path / "c"), str(tmp_path / "fresh")
    _write_docs(dir_c, c_ids, c_texts)
    fstats = simsearch.build_text_index(dir_c, fresh)
    assert stats["n_docs"] == fstats["n_docs"]
    assert stats["total_len"] == fstats["total_len"]
    for q in QUERIES + ["third version", "returns"]:
        up = simsearch.bm25_search_indexed(idx, query=q, k=8).to_pandas()
        fr = simsearch.bm25_search_indexed(fresh, query=q,
                                           k=8).to_pandas()
        assert up.reset_index(drop=True).equals(
            fr.reset_index(drop=True)), q


def test_text_upsert_rejects_preformat_and_dup_ids(ray_session, tmp_path):
    a_ids, a_texts = _corpus_a()
    dir_a = str(tmp_path / "a")
    _write_docs(dir_a, a_ids, a_texts)
    idx = str(tmp_path / "idx")
    simsearch.build_text_index(dir_a, idx)
    dup = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 3], pa.int64()),
        "text": pa.array(["x", "y"], pa.string())}))
    with pytest.raises(ValueError, match="one row per doc_id"):
        simsearch.upsert_text_index(idx, dup)
    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    del stats["format"]
    with open(os.path.join(idx, "stats.json"), "w") as f:
        json.dump(stats, f)
    one = rd.from_arrow(pa.table({"doc_id": pa.array([3], pa.int64()),
                                  "text": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError, match="format 2"):
        simsearch.upsert_text_index(idx, one)


def _write_vecs(path: str, ids, vecs) -> None:
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table({"vec_id": pa.array(list(ids), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))}),
        os.path.join(path, "embeddings.parquet"))


def test_vector_upsert_matches_numpy_with_stored_centroids(ray_session,
                                                           tmp_path):
    """Upsert the stored IVF artifact (change vec 6, add vec 500, remove
    vec 9), then check the pruned-read query equals a whole-matrix numpy
    recomputation over the UPDATED vector set using the centroids read
    back from the artifact (which the upsert must NOT retrain)."""
    rng = np.random.default_rng(23)
    ids = list(range(30))
    vecs = [rng.standard_normal(16).astype(np.float32) for _ in ids]
    dir_a = str(tmp_path / "a")
    _write_vecs(dir_a, ids, vecs)
    idx = str(tmp_path / "vix")
    simsearch.build_vector_index(dir_a, idx, n_lists=4)
    cents_before = pq.read_table(
        os.path.join(idx, "centroids.parquet"))
    new6 = rng.standard_normal(16).astype(np.float32)
    new500 = (vecs[0] + 0.01 * rng.standard_normal(16)).astype(np.float32)
    stats = simsearch.upsert_vector_index(
        idx,
        rd.from_arrow(pa.table({
            "vec_id": pa.array([6, 500], pa.int64()),
            "embedding": pa.array([new6.tolist(), new500.tolist()],
                                  pa.list_(pa.float32()))})),
        removed_ids=[9])
    assert stats["gen"] == 1
    assert pq.read_table(os.path.join(idx, "centroids.parquet")).equals(
        cents_before)  # frozen coarse quantizer
    # updated corpus (queries still read qvecs from the original dir, so
    # the query set 0..2 is unchanged)
    upd = {i: v for i, v in zip(ids, vecs)}
    upd[6] = new6
    upd[500] = new500
    del upd[9]
    out = simsearch.knn_ivf_indexed(idx, dir_a, k=5, n_queries=3,
                                    n_probe=2).to_pandas()
    order = np.argsort(
        cents_before["list_id"].to_numpy(zero_copy_only=False))
    cents = np.array(cents_before["centroid"].to_pylist(),
                     dtype=np.float64)[order]
    uids = np.array(sorted(upd), np.int64)
    m = np.array([upd[i] for i in uids], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = (m @ cents.T).argmax(axis=1)
    qt = pq.read_table(os.path.join(dir_a, "embeddings.parquet"))
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    for q in range(3):
        qv = qm[q_ids == q][0]
        probes = set(np.argsort(-(qv @ cents.T))[:2].tolist())
        cand = [(int(i), float(v @ qv))
                for i, v, a in zip(uids, m, assign)
                if a in probes and i != q]
        expect = [i for i, _ in sorted(cand,
                                       key=lambda x: (-x[1], x[0]))[:5]]
        got = out[out.query_id == q]["neighbor_id"].tolist()
        assert got == expect, q
        assert 9 not in got
