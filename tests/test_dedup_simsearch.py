"""Unit + oracle tests for the dedup family and similarity search, on
synthetic fixtures with *known* duplicate structure (the driver testdata has
no near-dups, so these fixtures are where recall/precision are actually
exercised).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sema_ray import dedup, simsearch

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
         "nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def _doc(rng, n=60):
    return " ".join(WORDS[rng.integers(len(WORDS))] for _ in range(n))


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    """documents.parquet with known exact + near duplicates.

    Layout: 30 base docs (ids 0..29); ids 100..109 exact copies of 0..9;
    ids 200..209 near copies of 0..9 (3 words changed of 60).
    """
    rng = np.random.default_rng(5)
    base = [_doc(rng) for _ in range(30)]
    ids, texts = list(range(30)), list(base)
    for j in range(10):
        ids.append(100 + j)
        texts.append(base[j])
    for j in range(10):
        words = base[j].split()
        for pos in (5, 25, 45):
            words[pos] = "zzz" + str(j)
        ids.append(200 + j)
        texts.append(" ".join(words))
    d = tmp_path_factory.mktemp("dup")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def vec_dir(tmp_path_factory):
    """embeddings.parquet with planted near-duplicate vectors."""
    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 32)).astype(np.float32)
    vecs = [base[i] for i in range(40)]
    ids = list(range(40))
    for j in range(8):  # ids 100+j: tiny perturbations of 0..7 (cos ~ 0.999)
        ids.append(100 + j)
        vecs.append(base[j] + 0.01 * rng.standard_normal(32).astype(np.float32))
    d = tmp_path_factory.mktemp("vec")
    pq.write_table(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))}),
        os.path.join(str(d), "embeddings.parquet"))
    return str(d)


def test_exact_dedup(ray_session, dup_dir):
    out = dedup.exact_dedup(dup_dir).to_pandas()
    survivors = dict(zip(out["doc_id"], out["n_copies"]))
    assert len(survivors) == 40  # 50 docs - 10 exact copies
    for j in range(10):
        assert survivors[j] == 2      # base + exact copy
        assert 100 + j not in survivors
    for j in range(10, 30):
        assert survivors[j] == 1


def test_exact_dup_clusters(ray_session, dup_dir):
    out = dedup.exact_dup_clusters(dup_dir).to_pandas()
    rep = dict(zip(out["doc_id"], out["rep_id"]))
    assert len(rep) == 50
    for j in range(10):
        assert rep[100 + j] == j        # exact copy -> base doc
        assert rep[200 + j] == 200 + j  # near copy is NOT an exact dup
    for j in range(30):
        assert rep[j] == j


def test_minhash_near_dup_clusters(ray_session, dup_dir):
    tbl = dedup.minhash_near_dup(dup_dir, threshold=0.5).to_pandas()
    rep = dict(zip(tbl["doc_id"], tbl["rep_id"]))
    for j in range(10):
        assert rep[100 + j] == j, "exact copy must join base cluster"
        assert rep[200 + j] == j, "near copy (3/60 words) must join base"
    # distinct random docs stay separate
    reps = {rep[j] for j in range(10, 30)}
    assert len(reps) == 20


def test_cluster_ok_twins_true_on_valid_clusters(ray_session, dup_dir):
    """The validity twins must pass every doc on genuinely valid clusters."""
    mh = dedup.minhash_cluster_ok(dup_dir, threshold=0.5).to_pandas()
    assert (mh["cluster_ok"] == 1).all()
    sh = dedup.simhash_cluster_ok(dup_dir, max_hamming=3).to_pandas()
    assert (sh["cluster_ok"] == 1).all()


def test_cluster_ok_detects_planted_invalid_merge(ray_session, dup_dir,
                                                  monkeypatch):
    """Force two dissimilar docs (10 and 11) into one cluster: the exact
    recomputation must flag BOTH (neither has a valid in-cluster neighbor),
    and leave every genuinely clustered doc ok."""
    real = dedup._minhash_rep_map

    def rigged(sf_dir, threshold=0.7):
        rep_of = real(sf_dir, threshold)
        rep_of[11] = 10  # 10 and 11 are distinct random docs
        return rep_of

    monkeypatch.setattr(dedup, "_minhash_rep_map", rigged)
    df = dedup.minhash_cluster_ok(dup_dir, threshold=0.5).to_pandas()
    flags = dict(zip(df["doc_id"], df["cluster_ok"]))
    assert flags[10] == 0 and flags[11] == 0
    assert sum(1 for v in flags.values() if v == 0) == 2


def test_simhash_near_dup_exact_copies(ray_session, dup_dir):
    tbl = dedup.simhash_near_dup(dup_dir, max_hamming=3).to_pandas()
    rep = dict(zip(tbl["doc_id"], tbl["rep_id"]))
    for j in range(10):
        assert rep[100 + j] == rep[j], "identical text ⇒ identical simhash"


def test_simhash64_properties():
    a = dedup.simhash64("alpha beta gamma delta")
    assert a == dedup.simhash64("alpha beta gamma delta")
    b = dedup.simhash64("alpha beta gamma epsilon")
    ham = bin(a ^ b).count("1")
    assert 0 < ham <= 24, "small edit ⇒ small hamming distance"


def test_ngram_jaccard_pairs_vs_bruteforce(ray_session, dup_dir):
    got = dedup.ngram_jaccard_pairs(dup_dir, threshold=0.5).to_pandas()
    got_pairs = {(a, b) for a, b in zip(got["a"], got["b"])}
    # brute-force oracle over all pairs
    t = pq.read_table(os.path.join(dup_dir, "documents.parquet"))
    ids = t["doc_id"].to_pylist()
    sh = [set(dedup.word_shingles(x).tolist()) for x in t["text"].to_pylist()]
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            u = len(sh[i] | sh[j])
            if u and len(sh[i] & sh[j]) / u >= 0.5:
                want.add((a, b))
    assert want, "fixture must contain qualifying pairs"
    # prefix-filtered candidates + exact verify: EXACT precision and recall
    assert got_pairs == want
    # exact jaccard values correct
    jac = dict(((a, b), v) for a, b, v in zip(got["a"], got["b"], got["jac"]))
    for (a, b), v in jac.items():
        ia, ib = ids.index(a), ids.index(b)
        truth = len(sh[ia] & sh[ib]) / len(sh[ia] | sh[ib])
        assert abs(v - truth) < 1e-3


def test_embedding_dup_pairs_and_near_dup(ray_session, vec_dir):
    pairs = simsearch.embedding_dup_pairs(vec_dir, threshold=0.97).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    want = {(j, 100 + j) for j in range(8)}
    assert want <= got
    clusters = simsearch.embedding_near_dup(vec_dir, threshold=0.97).to_pandas()
    rep = dict(zip(clusters["vec_id"], clusters["rep_id"]))
    for j in range(8):
        assert rep[100 + j] == j


def test_knn_lsh_recall_vs_bruteforce(ray_session, vec_dir):
    exact = simsearch.knn_bruteforce(vec_dir, k=5, n_queries=4).to_pandas()
    approx = simsearch.knn_lsh(vec_dir, k=5, n_queries=4,
                               n_planes=6, n_tables=8).to_pandas()
    recalls = []
    for q in range(4):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_knn_ivf_recall_vs_bruteforce(ray_session, vec_dir):
    exact = simsearch.knn_bruteforce(vec_dir, k=5, n_queries=4).to_pandas()
    approx = simsearch.knn_ivf(vec_dir, k=5, n_queries=4,
                               n_lists=8, n_probe=4).to_pandas()
    recalls = []
    for q in range(4):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # the planted near-duplicate (cos ~0.999) must always be found
    for q in range(4):
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        assert 100 + q in a


def test_remove_dup_spans_planted(ray_session, tmp_path):
    """Planted shared 8+-token span: removed from BOTH docs (coverage =
    union of overlapping hit windows), unique text kept verbatim."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, f"unique zero words here {shared} trailing tail zero"),
        (1, f"{shared} other one text entirely different from zero"),
        (2, "totally novel document with no duplicated span at all ok"),
    ]
    import os as _os
    d = str(tmp_path / "spans")
    _os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}),
        _os.path.join(d, "documents.parquet"))
    got = dedup.remove_dup_spans(d).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    kept = dict(zip(got["doc_id"], got["kept_text"]))
    # every token of the 10-token shared run is covered by some dup window
    for tok in shared.split():
        assert tok not in kept[0].split(), (tok, kept[0])
        assert tok not in kept[1].split(), (tok, kept[1])
    assert kept[0] == "unique zero words here trailing tail zero"
    assert kept[1] == "other one text entirely different from zero"
    assert kept[2] == rows[2][1]  # untouched (already normalized form)


def test_knn_ivfpq_recall_and_code_shape(ray_session, vec_dir):
    """IVF-PQ: ADC candidate selection + exact rescore must find the planted
    near-duplicate for every query, and the storable PQ codes are one uint8
    per subspace."""
    exact = simsearch.knn_bruteforce(vec_dir, k=5, n_queries=4).to_pandas()
    approx = simsearch.knn_ivfpq(vec_dir, k=5, n_queries=4,
                                 n_lists=8, n_probe=6, m_sub=4).to_pandas()
    recalls = []
    for q in range(4):
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
        assert 100 + q in a  # planted near-dup (cos ~0.999) always found
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    codes = simsearch.pq_encode_embeddings(vec_dir, m_sub=4).to_pandas()
    assert len(codes) == 48
    assert all(len(c) == 4 for c in codes["pq_code"])
    # deterministic: same corpus -> same codes
    codes2 = simsearch.pq_encode_embeddings(vec_dir, m_sub=4).to_pandas()
    a1 = codes.sort_values("vec_id").reset_index(drop=True)
    a2 = codes2.sort_values("vec_id").reset_index(drop=True)
    assert a1["vec_id"].equals(a2["vec_id"])
    assert all((x == y).all() for x, y in zip(a1["pq_code"], a2["pq_code"]))


def test_semantic_and_bm25_deterministic(ray_session, dup_dir):
    s1 = simsearch.semantic_search(dup_dir, query="alpha beta", k=5).to_pandas()
    s2 = simsearch.semantic_search(dup_dir, query="alpha beta", k=5).to_pandas()
    assert s1.equals(s2)
    b1 = simsearch.bm25_search(dup_dir, query="alpha zzz0", k=5).to_pandas()
    assert len(b1) == 5
    # doc 200 (the only one containing zzz0, rare term) must rank first
    assert b1.iloc[0]["doc_id"] == 200


def test_hot_buckets_distributed_path_matches_local(ray_session, dup_dir):
    """The distributed groupby branch of the bucket count (taken above
    LOCAL_COUNT_MAX_ROWS) must find the same pairs as the driver-combine
    branch — forced here by omitting the row hint."""
    ds = dedup._load_docs(dup_dir, ["doc_id", "text"])
    local = dedup.minhash_candidate_pairs(
        ds, 0.5, approx_rows=50 * dedup.BANDS)
    dist = dedup.minhash_candidate_pairs(ds, 0.5, approx_rows=None)
    as_set = lambda t: set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    assert as_set(local) == as_set(dist) and local.num_rows > 0


def test_assign_reps_actor_pool_path(ray_session, dup_dir, monkeypatch):
    """Force the large-map (ray.put + actor pool) branch of assign_reps and
    check it matches the closure branch."""
    ds = dedup._load_docs(dup_dir, ["doc_id"])
    rep_of = {100 + j: j for j in range(10)}
    small = dedup.assign_reps(ds, dict(rep_of)).to_pandas()
    monkeypatch.setattr(dedup, "SMALL_REP_MAP", 0)
    big = dedup.assign_reps(dedup._load_docs(dup_dir, ["doc_id"]),
                            dict(rep_of)).to_pandas()
    s = small.sort_values("doc_id").reset_index(drop=True)
    b = big.sort_values("doc_id").reset_index(drop=True)
    assert s.equals(b)
    assert (s.set_index("doc_id").loc[105, "rep_id"] == 5)


def test_query_parser():
    from sema_ray import queryparse as qp
    p = qp.parse('alpha "beta gamma" +delta -"epsilon zeta" -eta')
    assert [c.terms for c in p.should] == [("alpha",), ("beta", "gamma")]
    assert [c.terms for c in p.must] == [("delta",)]
    assert [c.terms for c in p.must_not] == [("epsilon", "zeta"), ("eta",)]
    assert p.scoring_terms == ("alpha", "beta", "delta", "gamma")
    assert qp.clause_pattern(qp.Clause("should", ("beta", "gamma"))) \
        == " beta  gamma "
    # punctuation-only / empty clauses vanish
    assert qp.parse('"" ... +').should == ()


def test_query_parser_field_and_boost():
    from sema_ray import queryparse as qp
    # content: addresses the single indexed field — identical to bare form
    p = qp.parse('content:alpha +content:"beta gamma" -content:eta')
    assert [c.terms for c in p.should] == [("alpha",)]
    assert [c.terms for c in p.must] == [("beta", "gamma")]
    assert [c.terms for c in p.must_not] == [("eta",)]
    # unknown field -> Tantivy FieldDoesNotExist analogue
    with pytest.raises(ValueError, match="field does not exist"):
        qp.parse("title:alpha")
    # ^boost on words and phrases
    p2 = qp.parse('alpha^2 "beta gamma"^1.5 delta')
    boosts = {c.terms: c.boost for c in p2.should}
    assert boosts[("alpha",)] == 2.0
    assert boosts[("beta", "gamma")] == 1.5
    assert boosts[("delta",)] == 1.0


def test_bm25_boost_reorders(ray_session, dup_dir):
    """A large boost on a rarer term must outrank the unboosted ordering
    where both terms match distinct docs."""
    base = simsearch.bm25_search(dup_dir, query="zzz0 zzz1",
                                 k=5).to_pandas()
    assert {200, 201} <= set(base["doc_id"])
    boosted = simsearch.bm25_search(dup_dir, query="zzz0 zzz1^8",
                                    k=5).to_pandas()
    assert boosted.iloc[0]["doc_id"] == 201  # zzz1's doc wins under ^8
    # boost of 1.0 is a bit-exact no-op
    one = simsearch.bm25_search(dup_dir, query="zzz0^1 zzz1",
                                k=5).to_pandas()
    assert one.equals(base)


def test_query_parser_ranges():
    from sema_ray import queryparse as qp
    p = qp.parse('content:[a TO b]^2 -{c TO *} alpha')
    (r,) = [c for c in p.should if c.is_range]
    assert (r.lo, r.hi, r.lo_incl, r.hi_incl, r.boost) == \
        ("a", "b", True, True, 2.0)
    (rn,) = p.must_not
    assert (rn.lo, rn.hi, rn.lo_incl) == ("c", None, False)
    assert [c.terms for c in p.should if c.terms] == [("alpha",)]
    # [* TO *] matches everything -> parsed away as a no-op clause
    assert qp.parse("[* TO *]").should == ()
    with pytest.raises(ValueError):
        qp.clause_pattern(r)


def test_bm25_range_queries(ray_session, dup_dir):
    """Term ranges are constant-scored (Lucene/Tantivy rewrite) and
    participate in MUST/MUST_NOT/SHOULD like any clause."""
    r = simsearch.bm25_search(dup_dir, query="[zzz0 TO zzz4]",
                              k=50).to_pandas()
    assert set(r["doc_id"]) == {200, 201, 202, 203, 204}
    assert (r["score"] == 1.0).all()
    # exclusive bounds
    r2 = simsearch.bm25_search(dup_dir, query="{zzz0 TO zzz4}",
                               k=50).to_pandas()
    assert set(r2["doc_id"]) == {201, 202, 203}
    # open upper end
    r3 = simsearch.bm25_search(dup_dir, query="[zzz5 TO *]",
                               k=50).to_pandas()
    assert set(r3["doc_id"]) == {205, 206, 207, 208, 209}
    # MUST range anchors the match; ^boost scales the constant score
    r4 = simsearch.bm25_search(dup_dir, query="+[zzz0 TO zzz0]^3",
                               k=50).to_pandas()
    assert list(r4["doc_id"]) == [200] and r4.iloc[0]["score"] == 3.0
    # MUST_NOT range excludes its matches from a scored query
    r5 = simsearch.bm25_search(dup_dir, query="zzz0 zzz1 -[zzz1 TO zzz9]",
                               k=50).to_pandas()
    assert set(r5["doc_id"]) == {200}


def test_bm25_query_language(ray_session, dup_dir):
    # doc 200 is the only one containing zzz0 -> MUST excludes all others
    r = simsearch.bm25_search(dup_dir, query="+zzz0 alpha", k=10).to_pandas()
    assert list(r["doc_id"]) == [200]
    # MUST_NOT removes it even though it scores highest on zzz0
    r2 = simsearch.bm25_search(dup_dir, query="zzz0 -zzz0", k=10).to_pandas()
    assert len(r2) == 0
    # phrase must-match: only docs with the adjacent sequence survive
    t = pq.read_table(os.path.join(dup_dir, "documents.parquet"))
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    two = [i for i, x in texts.items() if "alpha beta" in x]
    r3 = simsearch.bm25_search(dup_dir, query='+"alpha beta"', k=60).to_pandas()
    assert set(r3["doc_id"]) == set(two)
    # only matching docs are returned (Tantivy semantics)
    r4 = simsearch.bm25_search(dup_dir, query="doesnotexistterm", k=10).to_pandas()
    assert len(r4) == 0


def test_bm25_phrase_positional_tf(ray_session, tmp_path):
    """Phrase tf is Tantivy's position intersection: self-overlapping
    occurrences all count ("a a" occurs TWICE in "a a a"), unlike a
    non-overlapping substring count."""
    import math

    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a a a", "a b a", "b b b"],
                                   pa.string())}),
        os.path.join(d, "documents.parquet"))
    r = simsearch.bm25_search(d, query='"a a"', k=10).to_pandas()
    # only doc 1 contains the adjacent sequence
    assert list(r["doc_id"]) == [1]
    # expected BM25 with positional tf = 2 (NOT the substring count 1):
    # df(a)=2, n_docs=3, dl=avg_len=3 -> denom_len = 1.0
    idf_a = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    tf = 2.0
    want = (idf_a + idf_a) * (tf * 2.2) / (tf + 1.2 * 1.0)
    assert r.iloc[0]["score"] == math.floor(want * 1e6 + 0.5) / 1e6


def test_distributed_verification_matches_local(ray_session, dup_dir,
                                                vec_dir, monkeypatch):
    """Scale-path guarantee (VERDICT r2 #1): with the local-verification
    thresholds forced to 0 every near-dup operator must (a) produce exactly
    the local path's output and (b) never materialize member payload
    columns (signatures / simhashes / vectors / shingle sets / hashes) on
    the driver. The fixtures are ~40%-duplicate — the heavily-duplicated
    regime where the old driver collect was the scale-killer."""
    import pandas as pd

    from sema_ray.util import collect_table as real_collect

    def run_all():
        return {
            "minhash": dedup.minhash_near_dup(dup_dir, threshold=0.5),
            "simhash": dedup.simhash_near_dup(dup_dir, max_hamming=3),
            "ngram": dedup.ngram_jaccard_pairs(dup_dir),
            "exact": dedup.exact_dup_clusters(dup_dir),
            "emb": simsearch.embedding_near_dup(vec_dir, threshold=0.9),
        }

    def norm(ds) -> pd.DataFrame:
        df = ds.to_pandas()
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    local = {k: norm(v) for k, v in run_all().items()}

    payload_cols = {"sig", "simhash", "embedding", "shingles", "shingles_b",
                    "h", "text"}

    def guarded(ds):
        t = real_collect(ds)
        heavy = payload_cols & set(t.column_names)
        # the 1-row dimension probe in embedding_near_dup is the only
        # permitted vector on the driver
        assert not heavy or t.num_rows <= 2, (
            f"driver materialized member payloads {heavy} "
            f"({t.num_rows} rows)")
        return t

    monkeypatch.setattr(dedup, "collect_table", guarded)
    monkeypatch.setattr(simsearch, "collect_table", guarded)
    monkeypatch.setattr(dedup, "LOCAL_VERIFY_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "LOCAL_COUNT_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "NGRAM_LOCAL_VERIFY_MAX_MEMBERS", 0)
    monkeypatch.setattr(simsearch, "EMB_LOCAL_VERIFY_MAX_ROWS", 0)

    dist = {k: norm(v) for k, v in run_all().items()}
    for k in local:
        pd.testing.assert_frame_equal(local[k], dist[k]), k


def test_bloom_filter_membership():
    from sema_ray.sketches import BloomFilter
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 1 << 63, size=20_000, dtype=np.uint64)
    probes = rng.integers(0, 1 << 63, size=20_000, dtype=np.uint64)
    probes = probes[~np.isin(probes, keys)]
    bf = BloomFilter.for_keys(len(keys))
    bf.add_hashes(keys)
    assert bf.contains(keys).all()  # Bloom invariant: no false negatives
    assert bf.contains(probes).mean() < 0.05  # sized for ~1% FP
    # sparse OR-merge (the distributed build protocol) == direct build
    half_a, half_b = keys[:10_000], keys[10_000:]
    pa_, pb = BloomFilter.for_keys(len(keys)), BloomFilter.for_keys(len(keys))
    pa_.add_hashes(half_a)
    pb.add_hashes(half_b)
    merged = BloomFilter.for_keys(len(keys))
    for part in (pa_, pb):
        merged.or_sparse(*part.sparse_words())
    assert (merged.words == bf.words).all()


@pytest.fixture(scope="module")
def snapshot_dir(tmp_path_factory):
    """documents.parquet with CROSS-PARITY planted dups: even ids are the
    prior snapshot, odd ids the new one; odd ids 101/103 duplicate prior
    texts, the rest of the odd ids are novel."""
    rng = np.random.default_rng(11)
    base = [_doc(rng) for _ in range(40)]
    ids = list(range(40))          # ids 0..39, text base[i]
    texts = list(base)
    ids += [101, 103, 105, 107]
    texts += [base[2], base[4],    # dups of even (prior) docs
              base[3], _doc(rng)]  # base[3] is odd->new: NOT a prior dup
    d = tmp_path_factory.mktemp("snap")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(str(d), "documents.parquet"), row_group_size=16)
    return str(d)


def test_incremental_dedup_exact_vs_reference(ray_session, snapshot_dir):
    out = dedup.incremental_dedup(snapshot_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    tbl = pq.read_table(os.path.join(snapshot_dir, "documents.parquet"))
    ids, texts = tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()
    prior = {t for i, t in zip(ids, texts) if i % 2 == 0}
    want = {i: (t in prior) for i, t in zip(ids, texts) if i % 2 == 1}
    got = dict(zip(out["doc_id"], out["is_dup"]))
    assert got == want
    assert got[101] and got[103] and not got[105] and not got[107]


def test_star_compressed_reduction_matches_union_find(ray_session, dup_dir,
                                                      monkeypatch):
    """Forcing the distributed-verification + connected-components pair
    compression must produce the identical cluster assignment the default
    (driver union-find over raw pairs) path produces."""
    base = dedup.minhash_near_dup(dup_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    monkeypatch.setattr(dedup, "LOCAL_VERIFY_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "LOCAL_COUNT_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "DISTRIBUTED_REDUCE_MIN_PAIRS", 0)
    comp = dedup.minhash_near_dup(dup_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert base.equals(comp)


def test_sq8_quantize_roundtrip_bound(ray_session, vec_dir):
    from sema_ray.simsearch import (_batch_matrix, _normalize_rows,
                                    _sq8_params, _load_embeddings,
                                    quantize_embeddings)
    ds = _load_embeddings(vec_dir)
    lo, scale = _sq8_params(ds)
    qt = simsearch.collect_table(quantize_embeddings(vec_dir)) \
        .sort_by("vec_id")
    ot = simsearch.collect_table(ds).sort_by("vec_id")
    orig = _normalize_rows(_batch_matrix(ot))
    codes = np.array(qt["qvec"].to_pylist(), dtype=np.float64)
    recon = (codes + 128) * scale[None, :] + lo[None, :]
    assert np.abs(recon - orig).max() <= scale.max() / 2 + 1e-9


def test_knn_sq8_recall_vs_bruteforce(ray_session, vec_dir):
    k = 10
    exact = simsearch.knn_bruteforce(vec_dir, k=k).to_pandas()
    approx = simsearch.knn_sq8(vec_dir, k=k).to_pandas()
    e_of, a_of = {}, {}
    for df, d in ((exact, e_of), (approx, a_of)):
        for q, n in zip(df["query_id"], df["neighbor_id"]):
            d.setdefault(q, set()).add(n)
    recalls = [len(e_of[q] & a_of.get(q, set())) / len(e_of[q])
               for q in e_of]
    assert min(recalls) >= 0.8, recalls


def test_minhash_signatures_storable(ray_session, dup_dir):
    """Signature table: deterministic, NUM_PERMS lanes, exact copies share
    the signature, near copies agree on most lanes."""
    s1 = dedup.minhash_signatures(dup_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    s2 = dedup.minhash_signatures(dup_dir).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert s1["doc_id"].equals(s2["doc_id"])
    assert all((a == b).all() for a, b in zip(s1["sig"], s2["sig"]))
    sig = {i: np.asarray(s) for i, s in zip(s1["doc_id"], s1["sig"])}
    assert all(len(s) == dedup.NUM_PERMS for s in sig.values())
    for j in range(10):  # 100+j is an exact copy of j
        assert (sig[j] == sig[100 + j]).all()
    for j in range(10):  # 200+j is a near copy: most lanes agree
        agree = (sig[j] == sig[200 + j]).mean()
        assert agree >= 0.5, (j, agree)


def test_bm25_zero_boost_and_pure_negative(ray_session, dup_dir):
    """Tantivy boolean matching is score-independent: a ^0-boosted clause
    still MATCHES (returned with score 0), and a query with only MUST_NOT
    clauses matches nothing."""
    r = simsearch.bm25_search(dup_dir, query="zzz0^0", k=5).to_pandas()
    assert list(r["doc_id"]) == [200] and r.iloc[0]["score"] == 0.0
    r2 = simsearch.bm25_search(dup_dir, query="+zzz0^0", k=5).to_pandas()
    assert list(r2["doc_id"]) == [200] and r2.iloc[0]["score"] == 0.0
    r3 = simsearch.bm25_search(dup_dir, query="-zzz0", k=5).to_pandas()
    assert len(r3) == 0


def test_hybrid_search_rrf(ray_session, tmp_path):
    """RRF fusion: planted doc 7 tops BOTH ranked lists -> fused rank 1;
    every emitted rrf_score equals its reciprocal-rank recomputation; the
    vector ranks match a whole-matrix numpy brute force."""
    rng = np.random.default_rng(21)
    texts = [f"filler words about nothing {i} " * 8 for i in range(12)]
    texts[7] = "scan table vector " * 10
    texts[3] = "one scan appears here " + "pad words " * 20
    vecs = rng.standard_normal((12, 16)).astype(np.float32)
    vecs[7] = vecs[0] + 0.001 * rng.standard_normal(16).astype(np.float32)
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(12)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(d, "documents.parquet"))
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(12)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    }), os.path.join(d, "embeddings.parquet"))

    out = simsearch.hybrid_search_rrf(
        d, query="scan table vector", qvec_id=0, k=5, pool=10).to_pandas()
    assert out.iloc[0]["doc_id"] == 7  # top of both lists
    assert list(out["rrf_score"]) == sorted(out["rrf_score"], reverse=True)
    for r in out.itertuples():  # reciprocal-rank recomputation, exact
        exp = (1.0 / (60 + r.r_text) if r.r_text else 0.0) \
            + (1.0 / (60 + r.r_vec) if r.r_vec else 0.0)
        assert r.rrf_score == np.floor(exp * 1e9 + 0.5) / 1e9
    # vector ranks vs whole-matrix brute force (query vec 0, self excluded)
    m = vecs.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m[0]
    order = sorted((i for i in range(12) if i != 0),
                   key=lambda i: (-cos[i], i))
    expect_rank = {i: r + 1 for r, i in enumerate(order[:10])}
    for r in out.itertuples():
        if r.r_vec:
            assert expect_rank[r.doc_id] == r.r_vec


def test_bm25_indexed_matches_scan(ray_session, dup_dir, tmp_path):
    """The stored posting-list index answers term queries with scores
    bit-identical to the scan path (same tokenization, idf, IEEE order,
    rounded-rank tail), and rejects clause types posting lists cannot
    express."""
    idx = str(tmp_path / "tix")
    stats = simsearch.build_text_index(dup_dir, idx)
    assert stats["n_docs"] == 50
    for q in ["alpha zzz0", "zzz0^2 alpha", "alpha beta gamma",
              "doesnotexistterm"]:
        a = simsearch.bm25_search(dup_dir, query=q, k=7).to_pandas()
        b = simsearch.bm25_search_indexed(idx, query=q, k=7).to_pandas()
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True)), q
    with pytest.raises(ValueError, match="scan path"):
        simsearch.bm25_search_indexed(idx, query='"alpha beta"')
    with pytest.raises(ValueError, match="scan path"):
        simsearch.bm25_search_indexed(idx, query="+alpha beta")
    with pytest.raises(ValueError, match="scan path"):
        simsearch.bm25_search_indexed(idx, query="[a TO c]")


def test_bm25_indexed_both_scoring_paths_agree(ray_session, dup_dir,
                                               tmp_path, monkeypatch):
    """The driver-local and keyed-shuffle scoring paths of the indexed
    query must be bit-equal (forced by zeroing the size threshold)."""
    idx = str(tmp_path / "tix2")
    simsearch.build_text_index(dup_dir, idx)
    a = simsearch.bm25_search_indexed(idx, query="alpha zzz0",
                                      k=7).to_pandas()
    monkeypatch.setattr(simsearch, "INDEX_LOCAL_SCORE_MAX_ROWS", 0)
    b = simsearch.bm25_search_indexed(idx, query="alpha zzz0",
                                      k=7).to_pandas()
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_vector_index_stored_matches_numpy_probe(ray_session, vec_dir,
                                                 tmp_path):
    """The stored-IVF query path equals a whole-matrix numpy recomputation
    of the same probe rule using the centroids READ BACK from the
    artifact — exercising the partition pruning, the path->list recovery
    and the scoring tail end to end."""
    import pyarrow.parquet as pq2
    idx = str(tmp_path / "vix")
    simsearch.build_vector_index(vec_dir, idx, n_lists=4)
    out = simsearch.knn_ivf_indexed(idx, vec_dir, k=5, n_queries=3,
                                    n_probe=2).to_pandas()
    ct = pq2.read_table(idx + "/centroids.parquet")
    order = np.argsort(ct["list_id"].to_numpy(zero_copy_only=False))
    cents = np.array(ct["centroid"].to_pylist(), dtype=np.float64)[order]
    t = pq2.read_table(vec_dir + "/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assign = (m @ cents.T).argmax(axis=1)
    for q in range(3):
        qv = m[ids == q][0]
        probes = set(np.argsort(-(qv @ cents.T))[:2].tolist())
        cand = [(int(i), float(v @ qv)) for i, v, a in zip(ids, m, assign)
                if a in probes and i != q]
        expect = [i for i, _ in sorted(cand,
                                       key=lambda x: (-x[1], x[0]))[:5]]
        got = out[out.query_id == q]["neighbor_id"].tolist()
        assert got == expect, q


def test_vector_index_layout_canary_raises(ray_session, vec_dir,
                                            tmp_path):
    """A stored centroid artifact whose layout drifted from its stats.json
    canary must fail LOUDLY at query time, not with wrong probes."""
    import json

    import pytest

    idx = str(tmp_path / "vix_bad")
    simsearch.build_vector_index(vec_dir, idx, n_lists=4)
    with open(idx + "/stats.json") as f:
        stats = json.load(f)
    stats["dim"] = stats["dim"] + 1  # simulate layout drift
    with open(idx + "/stats.json", "w") as f:
        json.dump(stats, f)
    with pytest.raises(ValueError, match="canary"):
        simsearch.knn_ivf_indexed(idx, vec_dir, k=5, n_queries=1,
                                  n_probe=2).to_pandas()


def test_span_hash_no_rotation_collision(ray_session, tmp_path):
    """Regression (oracle fuzz): cycling 5 multipliers across an 8-token
    window made 'zz x5 + tail' hash equal to 'tail + zz x5' — rotated
    windows must NOT count as duplicated spans."""
    d = _docs_dir_pair(tmp_path, [
        "zz zz zz zz zz zz alpha beta gamma one two three four",
        "alpha beta gamma zz zz zz zz zz zz five six seven eight",
    ])
    out = dedup.dup_span_counts(d).to_pandas()
    assert (out["n_dup_windows"] == 0).all()


def _docs_dir_pair(tmp_path, texts):
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_word_shingles_utf8proc_lowercase():
    """Regression (oracle fuzz): Python str.lower() maps U+0130 to
    'i'+combining-dot while Arrow/DuckDB map it to plain 'i' — shingles
    must tokenize like the SQL twins."""
    a = dedup.word_shingles("İstanbul merkez park")
    b = dedup.word_shingles("istanbul merkez park")
    assert np.array_equal(a, b)
    assert dedup.simhash64("İstanbul merkez") == \
        dedup.simhash64("istanbul merkez")


def test_ngram_jaccard_exact_recall_near_threshold(ray_session, tmp_path):
    """Regression (oracle fuzz): minhash-banding candidates missed
    near-threshold pairs with probability (1-t^r)^b; prefix filtering
    must find EVERY pair with exact J >= t, checked against a
    whole-corpus brute force, including token-less docs (pairwise
    J=1.0 by the twin's nu=0 rule)."""
    import itertools
    import re

    rng = np.random.default_rng(33)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 14))))
             for _ in range(40)]
    texts += ["", "   ", "..."]  # token-less family
    d = _docs_dir_pair(tmp_path, texts)
    got = dedup.ngram_jaccard_pairs(d, threshold=0.5).to_pandas()
    gs = {(a, b): j for a, b, j in zip(got.a, got.b, got.jac)}

    def grams(txt):
        toks = re.findall("[a-z0-9]+", txt.lower())
        if not toks:
            return set()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        ga, gb = grams(texts[i]), grams(texts[j])
        u = len(ga | gb)
        jac = (len(ga & gb) / u) if u else 1.0
        if jac >= 0.5:
            want[(i, j)] = np.floor(jac * 1e4 + 0.5) / 1e4
    assert gs == want
