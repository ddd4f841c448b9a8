"""Unit tests: golden extractor, hash embedder, canonicalization (no Ray)."""

import numpy as np

from sema_ray.canonicalize import (UnionFind, build_canonical_map,
                                   char_shingle_hashes, jaccard,
                                   minhash_signature, normalize_surface)
from sema_ray.embed import HashEmbedder, cosine_matrix
from sema_ray.golden import (Triple, detect_mentions, extract_triples,
                             golden_triples, merge_intervals)


def test_detect_mentions_basic():
    ms = detect_mentions("Alice Chen works at Acme Corp in Berlin.")
    assert [m.surface for m in ms] == ["Alice Chen", "Acme Corp", "Berlin"]
    assert ms[0].start == 0 and ms[0].end == len("Alice Chen")


def test_mentions_skip_cap_stopwords():
    assert [m.surface for m in detect_mentions("The pipeline ran. It works.")] == []
    ms = detect_mentions("The Acme Corp office.")
    # "The Acme Corp" is one capitalized run — kept as a multiword mention.
    assert ms[0].surface == "The Acme Corp"


def test_extract_triples_patterns():
    t = extract_triples("Alice Chen works at Acme Corp. Acme Corp is based in Berlin.")
    assert Triple("Alice Chen", "works_at", "Acme Corp", 0.95) in t
    assert any(x.pred == "based_in" and x.obj == "Berlin" for x in t)


def test_extract_triples_dedup_within_turn():
    t = extract_triples("Bob Smith uses Hooli API. Bob Smith uses Hooli API.")
    assert len([x for x in t if x.pred == "uses"]) == 1


def test_golden_triples_stable_order():
    rows = [
        {"conv_id": "b", "turn_idx": 0, "text": "Lena Rossi works at Globex Inc."},
        {"conv_id": "a", "turn_idx": 1, "text": "Omar Silva lives in Oslo."},
        {"conv_id": "a", "turn_idx": 0, "text": "Nina Kumar founded Initech Ltd."},
    ]
    out = golden_triples(rows)
    assert [(r["conv_id"], r["turn_idx"]) for r in out] == [("a", 0), ("a", 1), ("b", 0)]


def test_merge_intervals():
    assert merge_intervals([(5, 9), (0, 3), (2, 6)]) == [(0, 9)]
    assert merge_intervals([(0, 1), (2, 3)]) == [(0, 1), (2, 3)]


def test_embedder_deterministic_unit_norm():
    e1, e2 = HashEmbedder(), HashEmbedder()
    v1 = e1.embed_one("Alice Chen works at Acme Corp")
    v2 = e2.embed_one("Alice Chen works at Acme Corp")
    np.testing.assert_array_equal(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-5
    assert v1.dtype == np.float32 and v1.shape == (384,)


def test_embedder_similarity_ordering():
    e = HashEmbedder()
    a = e.embed_one("acme corp berlin office")
    b = e.embed_one("acme corp berlin")
    c = e.embed_one("完全に unrelated テキスト zq")
    sim = cosine_matrix(np.stack([a]), np.stack([b, c]))[0]
    assert sim[0] > sim[1]
    assert sim[0] > 0.7


def test_embedder_empty_and_batch():
    e = HashEmbedder()
    assert np.all(e.embed_one("") == 0)
    out = e.embed_batch(["a b c", "", "a b c"])
    np.testing.assert_array_equal(out[0], out[2])


def test_normalize_surface():
    assert normalize_surface("ACME corp.") == "acme"
    assert normalize_surface("Acme Corporation") == "acme"
    assert normalize_surface("Acme Corp") == "acme"
    assert normalize_surface("Alice Chen") == "alice chen"
    assert normalize_surface("Stark Labs GmbH") == "stark"


def test_minhash_similar_keys_collide_in_some_band():
    a = minhash_signature(char_shingle_hashes("acme corporation"))
    b = minhash_signature(char_shingle_hashes("acme corp"))
    c = minhash_signature(char_shingle_hashes("zzz totally different"))
    assert (a == b).mean() > (a == c).mean()
    assert jaccard(char_shingle_hashes("acme"), char_shingle_hashes("acme")) == 1.0


def test_minhash_deterministic():
    s1 = minhash_signature(char_shingle_hashes("alice chen"))
    s2 = minhash_signature(char_shingle_hashes("alice chen"))
    np.testing.assert_array_equal(s1, s2)


def test_union_find_deterministic_groups():
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(3, 4)
    uf.union(2, 3)
    assert uf.find(4) == uf.find(1) == 1
    assert len(uf.groups()) == 1


def test_build_canonical_map_merges_variants():
    counts = [("Acme Corp", 10), ("ACME corp.", 2), ("Acme Corporation", 3),
              ("Berlin", 5), ("Alice Chen", 4)]
    cmap = build_canonical_map(counts, [])
    eid_a = {cmap[s][0] for s in ["Acme Corp", "ACME corp.", "Acme Corporation"]}
    assert len(eid_a) == 1  # all three one entity (normalized-key path)
    assert cmap["Acme Corp"][1] == "Acme Corp"  # most frequent is canonical
    assert cmap["Berlin"][0] != cmap["Alice Chen"][0]


def test_build_canonical_map_pair_merge():
    counts = [("Acme Corpp", 1), ("Acme Corp", 9)]
    cmap = build_canonical_map(counts, [("acme corpp", "acme")])
    assert cmap["Acme Corpp"][0] == cmap["Acme Corp"][0]
    assert cmap["Acme Corpp"][1] == "Acme Corp"
