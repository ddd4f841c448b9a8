"""Adversarial oracle fuzz (the harness that caught the span-hash rotation
collision, the minhash-banding recall gap, and the Python-vs-utf8proc
lowercase divergence): a hostile generated documents table — unicode edge
cases, empty/whitespace docs, repeated-token runs, planted exact copies —
run through the bug-prone oracle pairs and compared against DuckDB with
the driver's comparison."""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# widen the sweep without editing the file: every fixture offsets its rng
# seed by this (CI default 0 keeps the checked-in corpora byte-stable)
_SEED = int(os.environ.get("SEMA_RAY_FUZZ_SEED", "0"))

FRAGS = [
    "", " ", "the of and that", "#### ### ##", "... .. ....",
    "ALPHA Beta gamma", "123 456 7890 00", "ÄÖÜ ß İstanbul ĲĳǱǲǳ",
    "日本語のテキスト and english", "a", "zz zz zz zz zz zz",
    "word " * 200, "x" * 5000, "mail a@b.co ph +1 (415) 555-0000",
    "\t\n\r  \x0b", "ΣΙΣΥΦΟΣ σίσυφος", "🎉 emoji 🎊 text",
    "the quick brown fox of note with have be to and that",
    "'s 't 're n123n456", "a0b1c2 d3e4f5", "MiXeD CaSe ToKeNs",
    "table hash scan vector index merge join",
]

FUZZ_QUERIES = [
    "dedup_ngram_jaccard", "dup_components", "dup_span_counts",
    "remove_dup_spans", "doc_fingerprints", "lang_id",
    "gopher_quality_filter", "ngram_decontaminate",
    "temperature_sample_by_lang", "unigram_surprisal", "word_counts",
    "dedup_exact_clusters", "repetition_stats",
    # round-5 additions (the NULL-lang group crashed the raw Ray groupby
    # in token_count_by_lang before the sentinel fix)
    "token_count_by_lang", "doc_stats", "dedup_exact", "dedup_minhash",
    "dedup_simhash", "dedup_incremental", "curate_corpus", "bm25_search",
    "grouped_search", "docs_per_source_cap", "sample_docs_by_lang",
    # round-5 session-2 additions: every remaining documents-family
    # oracle pair, incl. the stored-index and phrase/range query paths
    # and the two operators that join documents with embeddings
    "exact_text_search", "pii_scrub", "benchmark_contamination",
    "assign_splits", "ngram_counts", "tfidf_top_terms", "quality_scores",
    "quality_gate", "bpe_token_counts", "cms_heavy_hitters",
    "pack_sequences", "bm25_phrase_search", "bm25_range_search",
    "bm25_indexed", "hybrid_search_rrf", "semdedup",
    # the full source-file parse paths: hostile documents become hostile
    # JSONL shards; hostile events (commas/quotes/newlines/NULL/'' in
    # event_type, NULL ts) become hostile CSV shards
    "jsonl_lang_stats", "csv_event_type_hours",
    # the flagship KG stage oracles over a corpus DERIVED from the
    # hostile documents (NUL bytes, 5000-char runs, unicode İ/ß, NULL
    # text -> synthetic turn): queries take sf_dir, the twins follow via
    # SEMA_RAY_ORACLE_SF. kg_chunks is absent on purpose: its twin is
    # regime-guarded (single-chunk texts only) and the hostile corpus has
    # a 5000-byte turn; multi-chunk arithmetic is golden-tested instead.
    "kg_normalized", "kg_mentions", "kg_triples",
    "conv_stats", "assistant_latency", "tool_usage",
    "kg_entities_valid", "kg_linked_valid",
    # surface-keyed exact graph ops over the same derived corpus —
    # hostile surfaces (unicode İ/ß fragments) exercise the cross-engine
    # collation identity the LPA tie-break depends on
    "kg_surface_pagerank", "kg_surface_communities",
    "kg_surface_clustering",
    # opaque-binary metadata over the hostile documents (NULL payloads);
    # frame_sample_meta is left out because its fixture is self-
    # synthesized — input-independent, nothing for a fuzzer to vary
    "binary_meta",
]


@pytest.fixture(scope="module")
def hostile_dir(tmp_path_factory):
    rng = np.random.default_rng(1 + _SEED)
    n = 150
    texts = []
    for _ in range(n):
        k = int(rng.integers(1, 6))
        texts.append(" ".join(str(FRAGS[int(rng.integers(0, len(FRAGS)))])
                              for _ in range(k)))
    for j in range(8):  # planted exact copies
        texts[100 + j] = texts[j]
    # real NULL texts (round-5 fuzz: SQL NULL is not '' — NULL docs form
    # their own dedup group, get NULL fingerprints/predictions/metrics,
    # and have no near-dup candidacy)
    for j in range(5, n, 43):
        texts[j] = None
    d = str(tmp_path_factory.mktemp("hostile"))
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        # one real NULL every 29 rows (not just "" — the NULL-lang group
        # must be excluded from temperature-sample denominators on BOTH
        # engines; ADVICE r4 found the twin silently including it)
        "lang": pa.array([None if i % 29 == 7
                          else ["en", "de", "fr", "xx", ""][i % 5]
                          for i in range(n)], pa.string()),
        "source": pa.array([None if i % 31 == 3 else f"s{i % 3}"
                            for i in range(n)], pa.string()),
        "n_chars": pa.array([len(x) if x is not None else 0
                             for x in texts], pa.int64()),
    }), os.path.join(d, "documents.parquet"))
    # a small hostile embeddings table so the doc↔vector operators
    # (hybrid_search_rrf, semdedup) fuzz too: planted near-dup pairs, a
    # zero vector, and whole-row NULLs
    nv, dim = 60, 16
    vecs = rng.standard_normal((nv, dim)).astype(np.float32)
    vecs[7] = 0.0
    for j in range(4):
        vecs[30 + j] = (vecs[20 + j]
                        + rng.standard_normal(dim).astype(np.float32)
                        * 0.005)
    vrows = [list(map(float, v)) for v in vecs]
    vrows[11] = None
    vrows[41] = None
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(nv)), pa.int64()),
        "embedding": pa.array(vrows, pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(nv)], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    # hostile events for the CSV source path: every value class the
    # RFC-4180 writer must round-trip (embedded comma/quote/newline,
    # quoted-empty vs NULL distinction, NULL ts)
    from datetime import datetime, timedelta
    ne = 120
    et = ["click", "a,b", 'say "hi"', "line1\nline2", "", None,
          "tab\there", "ÄÖÜ, ß"] * (ne // 8)
    ev_ts = [datetime(2024, 1, 1) + timedelta(hours=int(rng.integers(0, 72)))
             for _ in range(ne)]
    ev_ts[0] = datetime(1970, 1, 1)  # epoch zero (ts_us == 0)
    for j in range(9, ne, 31):
        ev_ts[j] = None
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(ne)), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array([i % 11 for i in range(ne)], pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array([1.5] * ne, pa.float64()),
        "props": pa.array(["{}"] * ne, pa.string()),
    }), os.path.join(d, "events.parquet"))
    return d


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            # nullable int64 arrives as object ints+None from Ray's
            # to_pandas but float64+NaN from DuckDB's — coerce numeric
            # object columns so the two spellings compare equal
            coerced = pd.to_numeric(df[c], errors="coerce")
            if coerced.notna().equals(df[c].notna()):
                df[c] = coerced
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_hostile_corpus_oracles_match(ray_session, hostile_dir,
                                      monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # the source twins bake their fixture-file paths in at oracle_sql()
    # time — point them at the hostile tables
    monkeypatch.setenv("SEMA_RAY_ORACLE_SF", hostile_dir)
    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{hostile_dir}/documents.parquet')")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{hostile_dir}/embeddings.parquet')")
    failures = []
    for name in FUZZ_QUERIES:
        got = queries[name](hostile_dir)
        got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
        want = con.execute(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        if len(g) == 0 and len(w) == 0:
            continue
        if list(g.columns) != list(w.columns) or len(g) != len(w):
            failures.append(f"{name}: shape {g.shape} vs {w.shape}")
            continue
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = all((math.isnan(a) and math.isnan(b)) or a == b
                         for a, b in zip(g[c], w[c]))
            else:
                ok = g[c].equals(w[c])
            if not ok:
                failures.append(f"{name}.{c}")
    assert not failures, failures


EV_QUERIES = [
    "sessionize_users", "event_gaps", "running_user_totals",
    "hourly_event_stats", "top_event_per_user", "event_type_hour_pivot",
    "sliding_window_counts", "zscore_by_type", "median_value_by_type",
    "value_quantiles", "sample_events", "approx_distinct_users",
    "user_cooccurrence_triangles",
    # integer-exact PageRank over the co-occurrence graph (bit-exact
    # int64 fixed-point twin; round-5 session-2)
    "user_cooccurrence_pagerank",
    # fixed-round LPA over the co-occurrence graph (all-integer update,
    # bit-exact unrolled-CTE twin; round-5 session-3)
    "user_cooccurrence_communities_exact",
    # per-node triangle participation (exact integer counts)
    "user_cooccurrence_node_triangles",
    # clustering coefficient (integer counts + one shared-form float op)
    "user_cooccurrence_clustering",
    # degree assortativity (symmetric form: one division of exact sums)
    "user_cooccurrence_assortativity",
]


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    """Hostile events table: exact ts ties, one heavy user, single-event
    users, and extreme values (1e9 overflows int64 cents-squared — the
    zscore_by_type regression)."""
    from datetime import datetime, timedelta
    rng = np.random.default_rng(1 + _SEED)
    n = 400
    base = datetime(2024, 1, 1)
    users = np.concatenate([
        np.zeros(120, dtype=np.int64),
        rng.integers(1, 12, 240),
        np.arange(1000, 1040),
    ]).astype(np.int64)
    rng.shuffle(users)
    ts = [base + timedelta(minutes=int(rng.integers(0, 240)))
          for _ in range(n)]
    for j in range(0, 60, 2):
        ts[j + 1] = ts[j]
    # NULL timestamps (LAG/window/hour arithmetic must coalesce exactly
    # like the twins) and epoch extremes
    for j in range(63, n, 53):
        ts[j] = None
    ts[61] = datetime(1970, 1, 1)
    ts[62] = datetime(2200, 1, 1)
    d = str(tmp_path_factory.mktemp("hostile_ev"))
    # real NULLs in the group key and the measure (round-5 fuzz: six
    # event queries crashed on None keys / None values before the
    # sentinel-key and validity-mask fixes)
    et = rng.choice(["click", "purchase", "error", "signup"],
                    size=n).tolist()
    vals = rng.choice([0.0, -5.25, 1e9, 0.01, 185.22, 9.64],
                      size=n).tolist()
    for i in range(0, n, 37):
        et[i] = None
    for i in range(0, n, 41):
        vals[i] = None
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(n)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_hostile_events_oracles_match(ray_session, hostile_events_dir):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{hostile_events_dir}/events.parquet')")
    failures = []
    for name in EV_QUERIES:
        got = queries[name](hostile_events_dir)
        got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
        want = con.execute(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        if len(g) == 0 and len(w) == 0:
            continue
        if list(g.columns) != list(w.columns) or len(g) != len(w):
            failures.append(f"{name}: shape {g.shape} vs {w.shape}")
            continue
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = all((math.isnan(a) and math.isnan(b)) or a == b
                         for a, b in zip(g[c], w[c]))
            else:
                ok = g[c].equals(w[c])
            if not ok:
                failures.append(f"{name}.{c}")
    assert not failures, failures


JOIN_QUERIES = [
    "filter_high_quantity", "topk_orders", "q1_pricing_summary",
    "brand_price_stats", "orders_per_segment", "orders_segment_left_outer",
    "revenue_by_priority", "segment_priority_rollup",
    "customers_without_orders", "asof_latest_order", "value_band_counts",
    "top3_orders_per_customer", "union_key_counts",
    "active_customer_keys", "inactive_customer_keys",
    "distinct_segments",
]


@pytest.fixture(scope="module")
def hostile_joins_dir(tmp_path_factory):
    """Hostile TPC-H-ish tables: orphan custkeys both directions, one
    heavy customer with duplicate orderdates, extreme prices (1e9 — the
    revenue_by_priority float-association regression), zero quantities."""
    from datetime import datetime, timedelta
    rng = np.random.default_rng(3 + _SEED)
    d = str(tmp_path_factory.mktemp("hostile_j"))
    nc, no, nl, npart = 60, 200, 500, 40
    base = datetime(1995, 1, 1)
    # NULLs everywhere SQL allows them (round-5 fuzz: NULL join keys must
    # match nothing, NULL group columns form real groups, COUNT(*) counts
    # NULL-measure rows, matched-NULL segments share the left-outer
    # COALESCE bucket, window partitions keep one NULL-key group)
    seg = [["AUTOMOBILE", "BUILDING", "MACHINERY",
            "HOUSEHOLD", "FURNITURE"][i % 5] for i in range(nc)]
    for i in range(0, nc, 13):
        seg[i] = None
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(nc)), pa.int64()),
        "c_name": pa.array([f"cust{i}" for i in range(nc)], pa.string()),
        "c_nationkey": pa.array([i % 5 for i in range(nc)], pa.int32()),
        "c_acctbal": pa.array(rng.choice([0.0, -999.99, 1e8, 10.5],
                                         nc).tolist(), pa.float64()),
        "c_mktsegment": pa.array(seg, pa.string()),
    }), os.path.join(d, "customer.parquet"))
    cust = rng.integers(0, nc + 10, no).astype("int64").tolist()
    cust[:20] = [7] * 20
    for i in range(0, no, 17):
        cust[i] = None
    dates = [base + timedelta(days=int(rng.integers(0, 1000)))
             for _ in range(no)]
    for j in range(10):
        dates[j] = dates[0]
    prio = rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                       "5-LOW"], no).tolist()
    for i in range(0, no, 23):
        prio[i] = None
    tp = rng.choice([0.01, 1e9, 144449.04, 5.0], no).tolist()
    for i in range(0, no, 29):
        tp[i] = None
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(no)), pa.int64()),
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], no).tolist(),
                                  pa.string()),
        "o_totalprice": pa.array(tp, pa.float64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(prio, pa.string()),
    }), os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array(rng.integers(0, no + 20, nl)
                               .astype("int64"), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, npart + 5, nl)
                              .astype("int64"), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 10, nl).astype("int64"),
                              pa.int64()),
        "l_linenumber": pa.array((np.arange(nl) % 7 + 1).astype("int64"),
                                 pa.int64()),
        "l_quantity": pa.array(
            [None if i % 31 == 0 else q for i, q in enumerate(
                rng.choice([0.0, 1.0, 50.0, 49.99], nl).tolist())],
            pa.float64()),
        # NULL measures in the revenue columns: SUM(ext*(1-disc)) skips a
        # row when EITHER factor is NULL while COUNT(*) keeps it (round-5
        # review: revenue_by_priority crashed on the NaN cents before the
        # validity-mask fix q1 already had)
        "l_extendedprice": pa.array(
            [None if i % 43 == 1 else x for i, x in enumerate(
                rng.choice([0.01, 1e9, 44473.56], nl).tolist())],
            pa.float64()),
        "l_discount": pa.array(
            [None if i % 47 == 5 else x for i, x in enumerate(
                rng.choice([0.0, 0.05, 0.1], nl).tolist())],
            pa.float64()),
        "l_tax": pa.array(rng.choice([0.0, 0.08], nl).tolist(),
                          pa.float64()),
        "l_returnflag": pa.array(
            [None if i % 37 == 2 else f for i, f in enumerate(
                rng.choice(["A", "N", "R"], nl).tolist())], pa.string()),
        "l_linestatus": pa.array(
            [None if i % 41 == 3 else f for i, f in enumerate(
                rng.choice(["F", "O"], nl).tolist())], pa.string()),
        "l_shipdate": pa.array(
            [base + timedelta(days=int(rng.integers(0, 2000)))
             for _ in range(nl)], pa.timestamp("us")),
    }), os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array(list(range(npart)), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(npart)],
                           pa.string()),
        "p_brand": pa.array([None if i % 9 == 4 else f"Brand#{i % 4}"
                             for i in range(npart)], pa.string()),
        "p_type": pa.array([f"TYPE {i % 3}" for i in range(npart)],
                           pa.string()),
        "p_size": pa.array([(i % 9) + 1 for i in range(npart)],
                           pa.int32()),
        "p_retailprice": pa.array(rng.choice([1.0, 1e7, 901.0],
                                             npart).tolist(), pa.float64()),
    }), os.path.join(d, "part.parquet"))
    nev = 150
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(nev)), pa.int64()),
        "ts": pa.array([base + timedelta(days=int(rng.integers(0, 1200)))
                        for _ in range(nev)], pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, nc, nev).astype("int64"),
                            pa.int64()),
        "event_type": pa.array(rng.choice(["click", "purchase"],
                                          nev).tolist(), pa.string()),
        "value": pa.array(rng.choice([5.0, 77.25], nev).tolist(),
                          pa.float64()),
        "props": pa.array(["{}"] * nev, pa.string()),
    }), os.path.join(d, "events.parquet"))
    return d


def test_hostile_joins_oracles_match(ray_session, hostile_joins_dir):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for tb in ["customer", "orders", "lineitem", "part", "events"]:
        con.execute(f"CREATE VIEW {tb} AS SELECT * FROM "
                    f"read_parquet('{hostile_joins_dir}/{tb}.parquet')")
    failures = []
    for name in JOIN_QUERIES:
        got = queries[name](hostile_joins_dir)
        got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
        want = con.execute(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        if len(g) == 0 and len(w) == 0:
            continue
        if list(g.columns) != list(w.columns) or len(g) != len(w):
            failures.append(f"{name}: shape {g.shape} vs {w.shape}")
            continue
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = all((math.isnan(a) and math.isnan(b)) or a == b
                         for a, b in zip(g[c], w[c]))
            else:
                ok = g[c].equals(w[c])
            if not ok:
                failures.append(f"{name}.{c}")
    assert not failures, failures


EMB_QUERIES = [
    "knn_bruteforce", "knn_lsh", "knn_ivf", "knn_sq8",
    "embedding_near_dup", "embedding_dup_pairs",
    # round-5 session-2 additions: the PQ-ADC path and the stored-IVF
    # artifact's pruned-read query path
    "knn_ivfpq", "knn_ivf_stored",
]


@pytest.fixture(scope="module")
def hostile_embeddings_dir(tmp_path_factory):
    """Hostile embeddings table: a zero-norm vector (the real 'empty doc'
    embedding — DuckDB's raw list_cosine_similarity yields NULL for it
    while the Ray side's _normalize_rows maps it to similarity 0; the
    _KNN_CHECK_SQL zero-guard must keep the twins aligned), a denormal-
    norm vector, ±1e18 magnitudes, exact and 1e-7-perturbed duplicates,
    and planted near-duplicates. Round-5 additions: whole-row NULL
    embeddings (one of them a QUERY id — every vector operator crashed on
    the short flattened reshape before the valid_vector_mask loader
    filter) and a NaN element (engine-divergent NaN ordering — excluded
    on both engines by the same mask / SQL predicate)."""
    rng = np.random.default_rng(1 + _SEED)
    n, dim = 120, 16
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[0] = 0.0
    vecs[1] = 0.0
    vecs[1][0] = 1e-30
    vecs[2] = 1e18
    vecs[3] = -1e18
    vecs[10] = vecs[11]
    vecs[12] = vecs[13] * (1 + 1e-7)
    for j in range(5):
        vecs[50 + j] = (vecs[40 + j]
                        + rng.standard_normal(dim).astype(np.float32) * 0.01)
    rows = [list(map(float, v)) for v in vecs]
    for i in (4, 17, 63):  # 4 is a query id (vec_id < 5)
        rows[i] = None
    rows[29][3] = float("nan")
    d = str(tmp_path_factory.mktemp("hostile_emb"))
    pq.write_table(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array(rows, pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(n)], pa.int32()),
    }), os.path.join(d, "embeddings.parquet"))
    return d


def test_hostile_embeddings_oracles_match(ray_session,
                                          hostile_embeddings_dir):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    queries, oracles = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{hostile_embeddings_dir}/"
                f"embeddings.parquet')")
    failures = []
    for name in EMB_QUERIES:
        got = queries[name](hostile_embeddings_dir)
        got = got if isinstance(got, pd.DataFrame) else got.to_pandas()
        want = con.execute(oracles[name]).df()
        g, w = _norm(got), _norm(want)
        if len(g) == 0 and len(w) == 0:
            continue
        if list(g.columns) != list(w.columns) or len(g) != len(w):
            failures.append(f"{name}: shape {g.shape} vs {w.shape}")
            continue
        for c in g.columns:
            if pd.api.types.is_float_dtype(g[c]):
                ok = all((math.isnan(a) and math.isnan(b)) or a == b
                         for a, b in zip(g[c], w[c]))
            else:
                ok = g[c].equals(w[c])
            if not ok:
                failures.append(f"{name}.{c}")
    assert not failures, failures
