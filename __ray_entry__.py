"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on a transcript corpus derived
deterministically from /root/testdata/sf0.001. ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data-pipeline additions); ``oracle_sql()`` gives the DuckDB twin
for every SQL-expressible one (identical output column names on both sides).

Ray is initialised by the driver before this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:  # make sema_ray importable however we're loaded
    sys.path.insert(0, _REPO_DIR)

TOKEN_RE = "[A-Za-z0-9]+"

# xor-fold of 8 consecutive rolling-window token hashes (doc_fingerprints)
_XOR8 = "h[i]"
for _k in range(1, 8):
    _XOR8 = f"xor({_XOR8}, h[i+{_k}])"
del _k


def _bm25_sql(clauses: list[tuple[str, ...]], k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of ``simsearch.bm25_search`` (identical IEEE754 op order:
    clause summands appear in the same sorted-pattern order the Ray scorer
    uses, phrase idfs sum left-associatively over component terms, and every
    constant here equals its Python counterpart bit-for-bit). A clause is a
    tuple of tokens; len > 1 means a phrase scored positionally — tf is the
    Tantivy/Lucene position-intersection count (every token position
    starting an adjacent occurrence, so self-overlapping occurrences all
    count), idf sums the terms'."""
    def lit(c: tuple[str, ...]) -> str:
        return " " + "  ".join(c) + " "

    clauses = sorted(clauses, key=lit)
    terms = sorted({w for c in clauses for w in c})
    dfs = ",\n               ".join(
        f"SUM(CASE WHEN contains(norm, ' {w} ') THEN 1 ELSE 0 END)"
        f" AS df_{w}" for w in terms)

    def tf(c: tuple[str, ...]) -> str:
        if len(c) == 1:
            s = lit(c)
            return (f"((length(norm) - length(replace(norm, '{s}', '')))"
                    f" / {len(s)})")
        cond = " AND ".join(f"l[i+{j}] = '{w}'" for j, w in enumerate(c))
        return (f"CAST(len([i for i in range(1, len(l) - {len(c) - 2})"
                f" if {cond}]) AS DOUBLE)")

    def idf(c: tuple[str, ...]) -> str:
        return " + ".join(
            f"ln(1 + (n_docs - df_{w} + 0.5) / (df_{w} + 0.5))" for w in c)

    summands = "\n          + ".join(
        f"(({idf(c)})"
        f" * ({tf(c)} * {k1 + 1!r})"
        f" / ({tf(c)} + {k1!r} * ({1 - b!r} + ({b!r} * dl) / avg_len)))"
        for c in clauses)
    match_pred = " OR ".join(
        f"contains(norm, '{lit(c)}')" for c in clauses)
    return f"""
        WITH d AS (
          SELECT doc_id,
                 ' ' || regexp_replace(lower(text), '[^a-z0-9]+', '  ', 'g')
                     || ' ' AS norm,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS l,
                 CAST(length(regexp_extract_all(lower(text), '[a-z0-9]+'))
                      AS DOUBLE) AS dl
          FROM documents
        ), s AS (
          SELECT GREATEST(1, COUNT(*)) AS n_docs,
                 GREATEST(1.0, SUM(dl) / GREATEST(1, COUNT(*))) AS avg_len,
               {dfs}
          FROM d
        ), scored AS (
          SELECT doc_id,
            {summands} AS score,
            ({match_pred}) AS matched
          FROM d, s
        )
        SELECT doc_id, FLOOR(score * 1000000 + 0.5) / 1000000 AS score
        FROM scored
        -- Tantivy boolean matching: ≥1 SHOULD clause present (the Ray
        -- scorer tests the same contains() predicates, independent of the
        -- score — a ^0-boosted match is returned with score 0); both
        -- engines rank on the ROUNDED score (Ray rounds before top-k)
        WHERE matched
        ORDER BY score DESC, doc_id LIMIT {k}
    """


def _kg_corpus(sf_dir: str) -> str:
    from sema_ray.sources.transcripts import ensure_corpus
    return ensure_corpus(kind="docs", sf_dir=sf_dir, variants=1, num_shards=8)


def _kg_oracle_sqls() -> dict[str, str]:
    """DuckDB twins of the KG extraction stages, built from the golden
    extractor's OWN constants (sema_ray/golden.py) so rule changes can never
    desynchronize the oracle. The driver checks at sf0.01, so the SQL reads
    the deterministic sf0.01-derived corpus parquet directly (generated
    on demand, cached under /tmp keyed by source size+mtime).

    Expressibility notes: the golden rules are RE2 regexes + literal
    stoplists, and DuckDB's regexp_extract_all has the same non-overlapping
    leftmost-match semantics as Python re.finditer, so mention surfaces AND
    char offsets (via split-piece window cumsums) and per-pattern triples
    (group lists align by match index) are exactly reproducible in SQL.
    In-turn triple dedup keeps the first conf per (s, pred, o) key — conf is
    a function of pred alone, so DISTINCT is exact.
    """
    from sema_ray import golden

    # the driver compares Ray vs oracle at sf0.01; the pytest mirror
    # (tests/test_oracles.py) runs the same contract at sf0.001 and points
    # the oracle at the matching corpus via this env var
    corpus = _kg_corpus(os.environ.get("SEMA_RAY_ORACLE_SF",
                                       "/root/testdata/sf0.01"))
    turns = (f"SELECT conv_id, turn_idx, text "
             f"FROM read_parquet('{corpus}/*.parquet')")
    ent = golden.ENTITY_RE.pattern
    stop = ",".join(f"'{w}'" for w in sorted(golden._CAP_STOP))

    def valid(col: str) -> str:
        return (f"length({col}) >= 2 AND NOT (strpos({col}, ' ') = 0 "
                f"AND {col} IN ({stop}))")

    mentions = f"""
        WITH turns AS ({turns}),
        pieces AS (
          SELECT conv_id, turn_idx,
                 regexp_split_to_array(text, '{ent}') AS gaps,
                 regexp_extract_all(text, '{ent}') AS ms
          FROM turns
        ), pos AS (
          SELECT conv_id, turn_idx, ms[i] AS surface,
                 SUM(length(gaps[i]) + length(ms[i])) OVER (
                     PARTITION BY conv_id, turn_idx ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - length(ms[i]) AS m_start
          FROM pieces, UNNEST(generate_series(1, len(ms))) AS t(i)
        )
        SELECT conv_id, turn_idx,
               CAST(m_start AS INT) AS m_start,
               CAST(m_start + length(surface) AS INT) AS m_end,
               surface
        FROM pos WHERE {valid("surface")}
    """

    vals = ",".join(f"('{p}','{v}',CAST({c} AS FLOAT))"
                    for p, v, c in golden._P)
    triples = f"""
        WITH turns AS ({turns}),
        pats(pred, verb, conf) AS (VALUES {vals}),
        m AS (
          SELECT conv_id, turn_idx, pred, conf,
                 regexp_extract_all(text, '({ent})' || verb || '({ent})', 1)
                     AS ss,
                 regexp_extract_all(text, '({ent})' || verb || '({ent})', 2)
                     AS os
          FROM turns, pats
        ), x AS (
          SELECT conv_id, turn_idx, pred, conf, ss[i] AS subj, os[i] AS obj
          FROM m, UNNEST(generate_series(1, len(ss))) AS t(i)
        )
        SELECT DISTINCT conv_id, turn_idx, subj, pred, obj,
               FLOOR(CAST(conf AS DOUBLE) * 100 + 0.5) / 100 AS conf
        FROM x
        WHERE {valid("subj")} AND {valid("obj")}
    """

    normalized = f"""
        WITH turns AS ({turns})
        SELECT conv_id, turn_idx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM turns
    """
    conv_stats = f"""
        SELECT conv_id,
               CAST(COUNT(*) AS BIGINT) AS n_turns,
               CAST(SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_user,
               CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_assistant,
               CAST(SUM(CASE WHEN tool <> '' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_tool_calls,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(date_diff('microsecond', MIN(ts), MAX(ts))
                    AS BIGINT) AS span_us
        FROM read_parquet('{corpus}/*.parquet')
        GROUP BY conv_id
    """
    assistant_latency = f"""
        WITH w AS (
          SELECT conv_id, turn_idx, role, ts,
                 LAG(role) OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx) AS prev_role,
                 LAG(ts) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS prev_ts
          FROM read_parquet('{corpus}/*.parquet')
        )
        SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
               CAST(date_diff('microsecond', prev_ts, ts) AS BIGINT)
                   AS latency_us
        FROM w WHERE role = 'assistant' AND prev_role = 'user'
    """
    tool_usage = f"""
        SELECT tool, CAST(COUNT(*) AS BIGINT) AS n_calls,
               CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
        FROM read_parquet('{corpus}/*.parquet')
        WHERE tool <> ''
        GROUP BY tool
    """
    out = {"kg_normalized": normalized, "kg_mentions": mentions,
           "kg_triples": triples, "conv_stats": conv_stats,
           "assistant_latency": assistant_latency,
           "tool_usage": tool_usage}
    # canonicalization validity twins (the dedup_minhash pinned-TRUE
    # shape): SQL re-derives the surface vocabulary / triple rows, the Ray
    # side recomputes the cluster contract exactly (kg.entity_validity /
    # kg.linked_triple_validity) and must flag every row ok
    out["kg_entities_valid"] = (
        f"WITH m AS ({mentions}) SELECT DISTINCT surface, "
        f"CAST(1 AS BIGINT) AS entity_ok FROM m")
    out["kg_linked_valid"] = (
        f"WITH t AS ({triples}) SELECT DISTINCT conv_id, turn_idx, subj, "
        f"pred, obj, CAST(1 AS BIGINT) AS link_ok FROM t")

    # Integer-exact PageRank over the surface-level triple graph: PageRank
    # is invariant under node relabeling, so the twin assigns its own dense
    # ids (ROW_NUMBER over sorted surfaces) while the Ray side uses the
    # sorted-vocabulary index — the per-surface ranks agree bit-exactly
    # (the _pagerank_exact_sql shape over a directed string-keyed graph).
    from sema_ray.graph import (LPA_EXACT_ROUNDS, PR_EXACT_ROUNDS,
                                PR_EXACT_SCALE)
    pr_scale = PR_EXACT_SCALE
    pr_parts = [f"""
        WITH t AS ({triples}),
        ed AS (SELECT DISTINCT subj AS su, obj AS ov FROM t),
        nodes AS (SELECT su AS surface FROM ed UNION SELECT ov FROM ed),
        ids AS (SELECT surface, ROW_NUMBER() OVER (ORDER BY surface) AS nid
                FROM nodes),
        e AS (SELECT a.nid AS u, b.nid AS v FROM ed
              JOIN ids a ON a.surface = ed.su
              JOIN ids b ON b.surface = ed.ov),
        deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY u),
        nn AS (SELECT COUNT(*) AS n FROM ids),
        r0 AS (SELECT nid AS node, CAST({pr_scale} // nn.n AS BIGINT) AS r
               FROM ids, nn)"""]
    for k in range(1, PR_EXACT_ROUNDS + 1):
        pr_parts.append(f""",
        c{k} AS (SELECT e.v AS node,
                        SUM((r{k - 1}.r * 85) // (100 * d.d)) AS s
                 FROM e JOIN r{k - 1} ON r{k - 1}.node = e.u
                        JOIN deg d ON d.u = e.u
                 GROUP BY e.v),
        r{k} AS (SELECT r{k - 1}.node,
                        CAST((15 * {pr_scale}) // (100 * nn.n)
                             + COALESCE(c{k}.s, 0) AS BIGINT) AS r
                 FROM r{k - 1} LEFT JOIN c{k} USING (node), nn)""")
    pr_parts.append(f"""
        SELECT ids.surface, r{PR_EXACT_ROUNDS}.r AS rank_units
        FROM r{PR_EXACT_ROUNDS} JOIN ids
          ON ids.nid = r{PR_EXACT_ROUNDS}.node""")
    out["kg_surface_pagerank"] = "".join(pr_parts)

    # Fixed-round LPA over the same surface graph. LPA's smallest-label
    # tie-break is an id ORDER comparison, so unlike PageRank it is NOT
    # relabeling-invariant — exactness rests on ROW_NUMBER(ORDER BY
    # surface) (binary UTF-8) equaling the Ray side's Python code-point
    # sort, which UTF-8's order-preservation guarantees. Canonical
    # undirected edges (LEAST/GREATEST, self-loops dropped) mirror
    # graph._canonical_edges.
    lpa_parts = [f"""
        WITH t AS ({triples}),
        rawed AS (SELECT DISTINCT subj AS su, obj AS ov FROM t),
        nodes0 AS (SELECT su AS surface FROM rawed
                   UNION SELECT ov FROM rawed),
        ids AS (SELECT surface, ROW_NUMBER() OVER (ORDER BY surface) AS nid
                FROM nodes0),
        ed AS (SELECT DISTINCT LEAST(a.nid, b.nid) AS lo,
                               GREATEST(a.nid, b.nid) AS hi
               FROM rawed JOIN ids a ON a.surface = rawed.su
                          JOIN ids b ON b.surface = rawed.ov
               WHERE a.nid <> b.nid),
        e AS (SELECT lo AS u, hi AS v FROM ed
              UNION ALL SELECT hi, lo FROM ed),
        l0 AS (SELECT DISTINCT u AS node, u AS lab FROM e)"""]
    for k in range(1, LPA_EXACT_ROUNDS + 1):
        lpa_parts.append(f""",
        v{k} AS (SELECT e.u AS node, l{k - 1}.lab AS lab,
                        COUNT(*) AS c
                 FROM e JOIN l{k - 1} ON l{k - 1}.node = e.v
                 GROUP BY 1, 2),
        l{k} AS (SELECT node, lab FROM (
                   SELECT node, lab,
                          ROW_NUMBER() OVER (PARTITION BY node
                                             ORDER BY c DESC, lab ASC)
                              AS rn
                   FROM v{k}) WHERE rn = 1)""")
    lpa_parts.append(f"""
        SELECT i1.surface AS surface, i2.surface AS community
        FROM l{LPA_EXACT_ROUNDS} JOIN ids i1
          ON i1.nid = l{LPA_EXACT_ROUNDS}.node
        JOIN ids i2 ON i2.nid = l{LPA_EXACT_ROUNDS}.lab""")
    out["kg_surface_communities"] = "".join(lpa_parts)

    # Clustering coefficient over the same surface graph. Relabeling-
    # invariant, and the vocabulary encode is order-preserving, so the
    # canonical undirected dedup (LEAST/GREATEST) can run on raw
    # VARCHAR surfaces — no ids CTE. Integer degree/triangle counts,
    # ONE shared-form float op (the user_cooccurrence_clustering shape).
    out["kg_surface_clustering"] = f"""
        WITH t AS ({triples}),
        ed AS (SELECT DISTINCT LEAST(subj, obj) AS lo,
                               GREATEST(subj, obj) AS hi
               FROM t WHERE subj <> obj),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT lo AS node FROM ed UNION ALL SELECT hi FROM ed)
          GROUP BY node),
        tri AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n
          FROM (SELECT e1.lo AS node FROM ed e1
                  JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                  JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
                UNION ALL
                SELECT e1.hi FROM ed e1
                  JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                  JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
                UNION ALL
                SELECT e2.hi FROM ed e1
                  JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                  JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
          GROUP BY node)
        SELECT d.node AS surface, d.degree,
               COALESCE(t2.n, 0) AS n_triangles,
               CASE WHEN d.degree < 2 THEN 0.0
                    ELSE FLOOR(CAST(2 * COALESCE(t2.n, 0) AS DOUBLE)
                               / CAST(d.degree * (d.degree - 1)
                                      AS DOUBLE)
                               * 1000000 + 0.5) / 1000000
               END AS clustering
        FROM deg d LEFT JOIN tri t2 ON t2.node = d.node
    """

    # The chunker (chunker.py, bit-exact reference port) emits exactly one
    # whole-text chunk per turn when every text is under OVERLAP_SIZE+1
    # bytes (no window split, no tail-overlap quirk, no mid-text newline
    # backoff) and none for texts under MIN_CHUNK_SIZE. The derived corpus
    # sits in that regime, so kg_chunks gets an exact SQL twin — guarded by
    # a max-bytes probe so a future longer-text corpus falls back to the
    # driver's rows-only check instead of a wrong oracle (multi-chunk byte
    # arithmetic is covered by the golden chunker tests).
    import duckdb as _duck
    max_bytes = _duck.sql(
        f"SELECT COALESCE(MAX(octet_length(encode(text))), 0) "
        f"FROM read_parquet('{corpus}/*.parquet')").fetchone()[0]
    if max_bytes <= 100:
        out["kg_chunks"] = f"""
            WITH turns AS ({turns})
            SELECT conv_id || '/' || turn_idx || ':0' AS id,
                   conv_id, turn_idx,
                   CAST(0 AS INT) AS ordinal,
                   CAST(0 AS BIGINT) AS start_byte,
                   CAST(octet_length(encode(text)) AS BIGINT) AS end_byte,
                   CAST(1 AS BIGINT) AS start_line,
                   CAST(1 + length(text) - length(replace(text, chr(10), ''))
                        AS BIGINT) AS end_line,
                   text AS content
            FROM turns
            WHERE octet_length(encode(text)) >= 50
        """
    return out


def entry() -> Any:
    """Flagship KG pipeline on a corpus derived from sf0.001 documents."""
    from sema_ray.pipelines.kg import kg_flagship
    return kg_flagship(_kg_corpus("/root/testdata/sf0.001"))


def _kg_triples(sf_dir: str):
    from sema_ray.pipelines.kg import read_transcripts, triples_dataset
    from sema_ray.util import round_half_up

    def round_conf(t):
        # conf is float32 in TRIPLE_SCHEMA; the DuckDB twin works in DOUBLE,
        # so the checked column rounds half-up to 2 digits on both sides
        # (identical IEEE ops — CLAUDE.md oracle-rounding rule)
        return t.set_column(t.schema.get_field_index("conf"), "conf",
                            round_half_up(t["conf"], 2))

    return triples_dataset(
        read_transcripts(_kg_corpus(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])) \
        .map_batches(round_conf, batch_format="pyarrow")


def _kg_mentions(sf_dir: str):
    from sema_ray.pipelines.kg import mentions_dataset, read_transcripts
    return mentions_dataset(
        read_transcripts(_kg_corpus(sf_dir),
                         columns=["conv_id", "turn_idx", "text"]))


def _kg_entities(sf_dir: str):
    from sema_ray.pipelines.kg import canonical_entities
    _cmap, ent = canonical_entities(_kg_mentions(sf_dir))
    return ent


def _kg_linked(sf_dir: str):
    from sema_ray.pipelines.kg import kg_flagship
    return kg_flagship(_kg_corpus(sf_dir))


def _kg_entities_valid(sf_dir: str):
    from sema_ray.pipelines.kg import entity_validity
    return entity_validity(_kg_mentions(sf_dir))


def _kg_linked_valid(sf_dir: str):
    from sema_ray.pipelines.kg import kg_flagship, linked_triple_validity
    return linked_triple_validity(kg_flagship(_kg_corpus(sf_dir)))


def _kg_adjacency(sf_dir: str):
    from sema_ray.pipelines.kg import adjacency, kg_flagship
    return adjacency(kg_flagship(_kg_corpus(sf_dir)))


def _kg_entity_degrees(sf_dir: str):
    from sema_ray.pipelines.kg import adjacency, entity_degrees, kg_flagship
    return entity_degrees(adjacency(kg_flagship(_kg_corpus(sf_dir))))


def _kg_surface_pagerank(sf_dir: str):
    """Integer-exact PageRank over the SURFACE-level triple graph
    (distinct (subj, obj) pairs from the extraction stage). Unlike
    kg_entity_pagerank — whose entity ids are permutation-dependent —
    this is keyed by surface, and PageRank is invariant under node
    relabeling, so the query has a bit-exact unrolled-CTE twin built on
    the kg_triples SQL (each engine assigns its own dense ids; see
    sema_ray.graph.surface_pagerank_exact)."""
    from sema_ray.graph import surface_pagerank_exact
    from sema_ray.pipelines.kg import read_transcripts, triples_dataset
    t = triples_dataset(read_transcripts(
        _kg_corpus(sf_dir), columns=["conv_id", "turn_idx", "text"]))
    return surface_pagerank_exact(t, src_col="subj", dst_col="obj")


def _kg_surface_communities(sf_dir: str):
    """Fixed-round label propagation over the surface-level triple graph.
    LPA is NOT relabeling-invariant (smallest-label tie-break is an id
    ORDER comparison), but Python's code-point sort equals DuckDB's
    binary UTF-8 collation, so "smallest label" means "lexicographically
    smallest surface" on both engines and the unrolled-CTE twin is
    bit-exact (see sema_ray.graph.surface_communities_exact)."""
    from sema_ray.graph import surface_communities_exact
    from sema_ray.pipelines.kg import read_transcripts, triples_dataset
    t = triples_dataset(read_transcripts(
        _kg_corpus(sf_dir), columns=["conv_id", "turn_idx", "text"]))
    return surface_communities_exact(t, src_col="subj", dst_col="obj")


def _kg_surface_clustering(sf_dir: str):
    """Local clustering coefficient over the surface-level triple graph —
    how clique-like each entity's link neighborhood is (over-merged
    canonicalization shows up as clustering spikes). Relabeling-invariant
    and order-preserving encode, so the twin runs on raw surfaces."""
    from sema_ray.graph import surface_clustering_exact
    from sema_ray.pipelines.kg import read_transcripts, triples_dataset
    t = triples_dataset(read_transcripts(
        _kg_corpus(sf_dir), columns=["conv_id", "turn_idx", "text"]))
    return surface_clustering_exact(t, src_col="subj", dst_col="obj")


def _kg_entity_pagerank(sf_dir: str):
    """Link-graph quality signal over canonical entities: PageRank on the
    subj_id -> obj_id adjacency (one edge-pass per iteration, node-sized
    driver state — the web-crawl centrality recipe at entity granularity)."""
    from sema_ray.graph import pagerank
    from sema_ray.pipelines.kg import adjacency, kg_flagship
    adj = adjacency(kg_flagship(_kg_corpus(sf_dir)))
    return pagerank(adj, src_col="subj_id", dst_col="obj_id")


def _kg_triangle_count(sf_dir: str):
    """Triangle count over the undirected canonical-entity graph — the
    clustering-coefficient raw material for KG quality monitoring (a
    spike in triangles = over-merged entities after canonicalization)."""
    from sema_ray.graph import triangle_count
    from sema_ray.pipelines.kg import adjacency, kg_flagship
    adj = adjacency(kg_flagship(_kg_corpus(sf_dir)))
    return triangle_count(adj, a_col="subj_id", b_col="obj_id")


def _conv_stats(sf_dir: str):
    from sema_ray.pipelines.kg import conv_stats
    return conv_stats(_kg_corpus(sf_dir))


def _assistant_latency(sf_dir: str):
    from sema_ray.pipelines.kg import assistant_latency
    return assistant_latency(_kg_corpus(sf_dir))


def _tool_usage(sf_dir: str):
    from sema_ray.pipelines.kg import tool_usage
    return tool_usage(_kg_corpus(sf_dir))


def _kg_normalized(sf_dir: str):
    """Normalize stage (derived cols only).

    Projects (conv_id, turn_idx, n_bytes) for the DuckDB hash check;
    text_hash is the vectorized polars-xxhash kernel (not SQL-expressible,
    and not stable across polars versions — see ``normalize_batch``) and is
    covered by determinism tests instead; durable resume state hashes with
    version-stable blake2b (``hashing.py``), not this column.
    """
    from sema_ray.extract import normalize_batch
    from sema_ray.pipelines.kg import read_transcripts
    ds = read_transcripts(_kg_corpus(sf_dir),
                          columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(normalize_batch, batch_format="pyarrow") \
        .select_columns(["conv_id", "turn_idx", "n_bytes"])


def _kg_chunks(sf_dir: str):
    from sema_ray.extract import chunk_batch
    from sema_ray.pipelines.kg import read_transcripts
    ds = read_transcripts(_kg_corpus(sf_dir),
                          columns=["conv_id", "turn_idx", "text"])
    return ds.map_batches(chunk_batch, batch_format="pyarrow")


def _file_tree(sf_dir: str) -> tuple[str, str]:
    """Materialize documents as .txt files + a built search index.

    Cache key includes the source parquet's size+mtime fingerprint so a
    regenerated corpus (or a different dir with the same basename) never
    serves stale files.
    """
    import pyarrow.parquet as pq
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    base = (f"{os.path.basename(os.path.normpath(sf_dir))}"
            f"-{st.st_size}-{int(st.st_mtime)}")
    root = f"/tmp/sema_ray_files/{base}"
    idx = f"/tmp/sema_ray_files/{base}-idx"
    marker = os.path.join(root, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(root, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "source", "text"])
        for doc_id, src, text in zip(t["doc_id"].to_pylist(),
                                     t["source"].to_pylist(),
                                     t["text"].to_pylist()):
            d = os.path.join(root, src)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"doc-{doc_id:06d}.txt"), "w") as f:
                f.write(text)
        with open(marker, "w") as f:
            f.write("ok")
    from sema_ray.pipelines.search import build_index
    build_index(root, idx)  # incremental: no-op when already built
    return root, idx


def _jsonl_lang_stats(sf_dir: str):
    """JSONL source end-to-end: stream the sharded fixture through
    ray.data.read_json (column-pruned immediately), per-block partial
    (lang, n, chars), driver fold over the bounded language set. The twin
    reads the SAME files with DuckDB read_json_auto."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from sema_ray.sources.files import ensure_jsonl, read_jsonl
    from sema_ray.util import collect_table

    root = ensure_jsonl(sf_dir)
    ds = read_jsonl(os.path.join(root), columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "lang": t["lang"],
            "n_docs": pa.array([1] * t.num_rows, pa.int64()),
            "total_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        }).group_by("lang").aggregate([("n_docs", "sum"),
                                       ("total_chars", "sum")])
        return g.rename_columns(["lang", "n_docs", "total_chars"])

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=None))
    out = parts.group_by("lang").aggregate([("n_docs", "sum"),
                                            ("total_chars", "sum")])
    return out.rename_columns(["lang", "n_docs", "total_chars"])


def _csv_event_type_hours(sf_dir: str):
    """CSV source end-to-end: Arrow CSV reader with TRUE column projection
    (event_type, ts_us only), vectorized hour bucketing, bounded-key fold.
    The twin reads the SAME files with DuckDB read_csv."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from sema_ray.sources.files import ensure_csv, read_csv_dir
    from sema_ray.util import collect_table

    root = ensure_csv(sf_dir)
    ds = read_csv_dir(root, columns=["event_type", "ts_us"])

    def partial(t: pa.Table) -> pa.Table:
        # (ts_us // 1h) % 24 — integer kernels only, ts_us is nonnegative
        h = pc.divide(t["ts_us"], pa.scalar(3_600_000_000, pa.int64()))
        hour = pc.subtract(h, pc.multiply(
            pc.divide(h, pa.scalar(24, pa.int64())),
            pa.scalar(24, pa.int64())))
        g = pa.table({
            "event_type": t["event_type"],
            "hour": hour,
            "n": pa.array([1] * t.num_rows, pa.int64()),
        }).group_by(["event_type", "hour"]).aggregate([("n", "sum")])
        return g.rename_columns(["event_type", "hour", "n"])

    parts = collect_table(ds.map_batches(partial, batch_format="pyarrow",
                                         batch_size=None))
    out = parts.group_by(["event_type", "hour"]).aggregate([("n", "sum")])
    return out.rename_columns(["event_type", "hour", "n"])


def _file_search_semantic(sf_dir: str):
    from sema_ray.pipelines.search import search
    _root, idx = _file_tree(sf_dir)
    return search(idx, "fast vector table scan")


def _file_search_exact(sf_dir: str):
    from sema_ray.pipelines.search import search
    _root, idx = _file_tree(sf_dir)
    return search(idx, "'spark")


def _embed_documents(sf_dir: str):
    """T1 embedder as a standalone stage over documents (rows-only check:
    vectors are checksummed via their rounded norm per row)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from sema_ray.embed import EmbedStage
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    emb = ds.map_batches(EmbedStage,
                         fn_constructor_kwargs={"text_col": "text"},
                         batch_format="pyarrow", batch_size=128,
                         concurrency=(1, 4))

    def norm_row(t: pa.Table) -> pa.Table:
        import numpy as np
        vec = t["vector"]
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        m = vec.flatten().to_numpy(zero_copy_only=False).reshape(len(vec), -1)
        n = np.sqrt((m.astype(np.float64) ** 2).sum(axis=1))
        return pa.table({"doc_id": t["doc_id"],
                         "vec_norm_q": pa.array((n * 1000).round().astype("int64"))})

    return emb.map_batches(norm_row, batch_format="pyarrow")


def _approx_distinct_users(sf_dir: str):
    """HLL estimate checked against the exact distributed distinct count.

    Output: ``(exact_users, est_ok)`` — the exact count is real distributed
    work the DuckDB twin recomputes (COUNT(DISTINCT)); ``est_ok`` asserts
    the HLL estimate lands within the p=12 sketch's ~3*1.04/sqrt(2^12)
    ≈ 5% envelope, so an estimator regression becomes a hash mismatch
    (same check shape as knn_lsh/knn_ivf)."""
    import pyarrow as pa
    import ray.data as rd
    from sema_ray.sketches import approx_distinct
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = ds.groupby("user_id").count().count()
    ok = abs(est - exact) <= 0.05 * exact
    return pa.table({"exact_users": pa.array([exact], pa.int64()),
                     "est_ok": pa.array([ok], pa.bool_())})


def _customers_without_orders(sf_dir: str):
    """Collected to a Table so an empty result keeps its schema (the anti-
    join is legitimately empty on the driver testdata: every customer has
    orders)."""
    import pyarrow as pa
    from sema_ray import relational
    from sema_ray.util import collect_table
    tbl = collect_table(relational.customers_without_orders(sf_dir))
    if tbl.num_columns == 0:
        tbl = pa.table({"c_custkey": pa.array([], pa.int64())})
    return tbl


def _sample_events(sf_dir: str):
    from sema_ray.sampling import sample_events
    return sample_events(sf_dir, rate=0.25)


def _sample_docs_by_lang(sf_dir: str):
    from sema_ray.sampling import sample_docs_by_lang
    return sample_docs_by_lang(sf_dir)


def _docs_per_source_cap(sf_dir: str):
    from sema_ray.sampling import docs_per_source_cap
    return docs_per_source_cap(sf_dir)


def _pack_sequences(sf_dir: str):
    from sema_ray.packing import pack_sequences
    return pack_sequences(sf_dir)


def _dup_components(sf_dir: str):
    """Connected components of the exact-Jaccard near-dup graph, computed
    by DISTRIBUTED alternating star rounds (sema_ray.graph) instead of the
    driver union-find — the scale path for duplicate graphs too large to
    centralize. Every doc gets a component (isolated -> self)."""
    from sema_ray.dedup import _load_docs, assign_reps, ngram_jaccard_pairs
    from sema_ray.graph import connected_components
    from sema_ray.util import collect_table

    pairs = ngram_jaccard_pairs(sf_dir)
    labels = collect_table(connected_components(pairs))
    rep_of = {}
    if labels.num_rows and "node" in labels.column_names:
        rep_of = {int(n): int(c)
                  for n, c in zip(labels["node"].to_pylist(),
                                  labels["component"].to_pylist())
                  if int(n) != int(c)}
    return assign_reps(_load_docs(sf_dir, ["doc_id"]), rep_of,
                       rep_col="component")


def _cms_heavy_hitters(sf_dir: str):
    """Count-Min Sketch heavy hitters (exact counts + in-bound flag — the
    approx_distinct HLL oracle shape)."""
    from sema_ray.sketches import cms_heavy_hitters
    return cms_heavy_hitters(sf_dir)


def _curate_corpus(sf_dir: str):
    from sema_ray.curate import curate_corpus
    return curate_corpus(sf_dir)


def _kmeans_clusters(sf_dir: str):
    from sema_ray.clustering import kmeans_clusters
    return kmeans_clusters(sf_dir)


def _cluster_balanced_sample(sf_dir: str):
    from sema_ray.clustering import cluster_balanced_sample
    return cluster_balanced_sample(sf_dir)


def _semdedup(sf_dir: str):
    from sema_ray.clustering import semdedup
    return semdedup(sf_dir)


def _semdedup_ok(sf_dir: str):
    from sema_ray.clustering import semdedup_ok
    return semdedup_ok(sf_dir)


def _pca_embeddings(sf_dir: str):
    """Distributed PCA: one moment-partials pass -> driver eigh -> project
    (numpy whole-matrix oracle in pytest; non-SQL by nature)."""
    from sema_ray.clustering import pca_embeddings
    return pca_embeddings(sf_dir)


def _value_quantiles(sf_dir: str):
    """Distributed exact quantile_cont via histogram-guided selection."""
    from sema_ray.sketches import quantiles_value
    return quantiles_value(sf_dir)


def _bm25_phrase_search(sf_dir: str):
    """BM25 with a quoted phrase clause — positional phrase scoring."""
    from sema_ray import simsearch
    return simsearch.bm25_search(sf_dir, query='"table hash" scan')


def _embedding_dup_pairs(sf_dir: str):
    """Collected to a Table so an empty result keeps its (a, b) schema."""
    import pyarrow as pa
    from sema_ray import simsearch
    from sema_ray.util import collect_table
    tbl = collect_table(simsearch.embedding_dup_pairs(sf_dir, threshold=0.5))
    if tbl.num_columns == 0:
        tbl = pa.table({"a": pa.array([], pa.int64()),
                        "b": pa.array([], pa.int64())})
    return tbl


# SQL mirror of sema_ray.util.valid_vector_mask: rows whose embedding is
# NULL or contains a non-finite element are excluded from vector search on
# BOTH engines (a NULL row crashes the [n, d] reshape; a NaN poisons every
# cosine it touches with engine-divergent NaN ordering).
def _emb_valid_sql(col: str = "embedding") -> str:
    return (f"{col} IS NOT NULL AND COALESCE(list_aggregate(list_transform("
            f"CAST({col} AS DOUBLE[]), x -> CAST(isfinite(x) AS INT)), "
            f"'min'), 1) = 1")


_EMB_VALID_SQL = _emb_valid_sql()

# Exact k-th cosine per query (score desc, vec_id asc tie-break — the same
# ordering as simsearch._gather_topk) with the recall flag as a constant:
# the Ray side sets recall_ok=False when the ANN path misses its threshold,
# which then hash-mismatches against this TRUE.
_KNN_CHECK_SQL = f"""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings
                 WHERE {_EMB_VALID_SQL})
    SELECT query_id,
           FLOOR(s * 1000000 + 0.5) / 1000000 AS kth_score,
           TRUE AS recall_ok
    FROM (
        SELECT query_id, s,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY s DESC, neighbor_id) AS rn
        FROM (
            -- zero-norm guard: the Ray side's _normalize_rows maps a
            -- zero vector to similarity 0 everywhere; DuckDB's
            -- list_cosine_similarity would emit NULL/NaN and desync
            -- the k-th score (same latent-twin class as the r4
            -- NULL-lang finding)
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   CASE WHEN list_dot_product(
                             CAST(a.embedding AS DOUBLE[]),
                             CAST(a.embedding AS DOUBLE[])) = 0
                         OR list_dot_product(
                             CAST(b.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) = 0
                        THEN 0.0
                        ELSE list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[]))
                   END AS s
            FROM emb a JOIN emb b ON b.vec_id != a.vec_id
            WHERE a.vec_id < 5) p) t
    WHERE rn = 10
"""


def _lang_id_sql() -> str:
    """DuckDB twin of ``textops.lang_id`` — script detection by codepoint-
    class counts over the first 2000 chars, then stopword votes with the
    marker-order-then-en tie break (first lang reaching the max wins)."""
    from sema_ray.textops import _LANG_MARKERS
    langs = list(_LANG_MARKERS)
    vote_cols = ",\n            ".join(
        "len(list_filter(words, w -> list_contains([{}], w))) AS v_{}".format(
            ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])), lang)
        for lang in langs)
    first_wins = " ".join(f"WHEN v_{lang} = vmax THEN '{lang}'"
                          for lang in langs)
    vmax = ", ".join(f"v_{lang}" for lang in langs)
    return f"""
        WITH s AS (
          SELECT doc_id, text, substr(text, 1, 2000) AS head FROM documents
        ), counts AS (
          SELECT doc_id, text,
            len(regexp_extract_all(head,
                '[\\x{{4E00}}-\\x{{9FFF}}\\x{{3040}}-\\x{{30FF}}]')) AS cjk,
            len(regexp_extract_all(head, '[\\x{{0400}}-\\x{{04FF}}]')) AS cyr,
            len(regexp_extract_all(head, '[\\x{{0370}}-\\x{{03FF}}]')) AS grk,
            len(regexp_extract_all(head,
                '[\\x{{41}}-\\x{{7A}}\\x{{C0}}-\\x{{17F}}]')) AS lat
          FROM s
        ), voted AS (
          SELECT doc_id, cjk, cyr, grk, lat, cjk+cyr+grk+lat AS tot,
            {vote_cols}
          FROM (SELECT doc_id, cjk, cyr, grk, lat,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   w -> w != '')[1:400] AS words
                FROM counts) t
        )
        SELECT doc_id,
          CASE WHEN tot = 0 THEN 'und'
               WHEN CAST(cjk AS DOUBLE) / tot > 0.25 THEN 'zh'
               WHEN CAST(cyr AS DOUBLE) / tot > 0.25 THEN 'ru'
               WHEN CAST(grk AS DOUBLE) / tot > 0.25 THEN 'el'
               ELSE (CASE WHEN vmax = 0 THEN 'und' {first_wins} END)
          END AS pred_lang
        FROM (SELECT *, GREATEST({vmax}) AS vmax FROM voted) z
    """


def _contamination_sql() -> str:
    from sema_ray.textops import DEFAULT_PROBES
    hits = " + ".join(
        f"CASE WHEN contains(lower(text), '{p}') THEN 1 ELSE 0 END"
        for p in DEFAULT_PROBES)
    # NULL text -> NULL hits/flag (the Ray side's match_substring(NULL)
    # propagation; the bare CASE would coerce NULL contains() to 0)
    return f"""
        SELECT doc_id,
               CAST(CASE WHEN text IS NULL THEN NULL ELSE {hits} END
                    AS BIGINT) AS n_probe_hits,
               CAST(CASE WHEN text IS NULL THEN NULL
                         WHEN ({hits}) > 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS contaminated
        FROM documents
    """


def _pagerank_exact_sql(n_iter: int | None = None,
                        scale: int | None = None) -> str:
    """Unrolled per-round CTEs for :func:`sema_ray.graph.pagerank_exact`
    over the purchase co-occurrence graph — every op is int64 floor
    arithmetic (``//``), so the ranks match the Ray side bit-exactly (the
    float pagerank's sums are association-dependent and can never have
    this twin; CLAUDE.md cross-engine trap #2). Recursive CTEs can't
    aggregate over their own recursive reference, hence the unroll."""
    from sema_ray.graph import PR_EXACT_ROUNDS, PR_EXACT_SCALE
    n_iter = PR_EXACT_ROUNDS if n_iter is None else n_iter
    scale = PR_EXACT_SCALE if scale is None else scale
    base = f"(15 * {scale}) // (100 * nn.n)"
    parts = [f"""
        WITH ed AS (
          SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                          GREATEST(a.user_id, b.user_id) AS hi
          FROM events a JOIN events b
            ON a.event_type = b.event_type
           AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
           AND a.user_id < b.user_id
          WHERE a.event_type = 'purchase'),
        e AS (SELECT lo AS u, hi AS v FROM ed
              UNION ALL SELECT hi, lo FROM ed),
        deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY u),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        r0 AS (SELECT u AS node, CAST({scale} // nn.n AS BIGINT) AS r
               FROM deg, nn)"""]
    for k in range(1, n_iter + 1):
        parts.append(f""",
        c{k} AS (SELECT e.v AS node,
                        SUM((r{k - 1}.r * 85) // (100 * d.d)) AS s
                 FROM e JOIN r{k - 1} ON r{k - 1}.node = e.u
                        JOIN deg d ON d.u = e.u
                 GROUP BY e.v),
        r{k} AS (SELECT r{k - 1}.node,
                        CAST({base} + COALESCE(c{k}.s, 0) AS BIGINT) AS r
                 FROM r{k - 1} LEFT JOIN c{k} USING (node), nn)""")
    parts.append(f"""
        SELECT node, r AS rank_units FROM r{n_iter}""")
    return "".join(parts)


def _lpa_exact_sql(n_iter: int | None = None) -> str:
    """Unrolled per-round CTEs for fixed-round label propagation
    (:func:`sema_ray.graph.user_cooccurrence_communities_exact`) over the
    purchase co-occurrence graph. LPA is all-integer by construction —
    labels are node ids, each round every node adopts the most frequent
    label among its neighbors with smallest-label tie-break — so a fixed
    round count (``early_stop=False``) makes the assignment bit-exact
    across engines; only the early-stop oscillation detection of the
    default variant is SQL-inexpressible, not the update itself."""
    from sema_ray.graph import LPA_EXACT_ROUNDS
    n_iter = LPA_EXACT_ROUNDS if n_iter is None else n_iter
    parts = ["""
        WITH ed AS (
          SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                          GREATEST(a.user_id, b.user_id) AS hi
          FROM events a JOIN events b
            ON a.event_type = b.event_type
           AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
           AND a.user_id < b.user_id
          WHERE a.event_type = 'purchase'),
        e AS (SELECT lo AS u, hi AS v FROM ed
              UNION ALL SELECT hi, lo FROM ed),
        l0 AS (SELECT DISTINCT u AS node, u AS lab FROM e)"""]
    for k in range(1, n_iter + 1):
        parts.append(f""",
        v{k} AS (SELECT e.u AS node, l{k - 1}.lab AS lab,
                        COUNT(*) AS c
                 FROM e JOIN l{k - 1} ON l{k - 1}.node = e.v
                 GROUP BY 1, 2),
        l{k} AS (SELECT node, lab FROM (
                   SELECT node, lab,
                          ROW_NUMBER() OVER (PARTITION BY node
                                             ORDER BY c DESC, lab ASC)
                              AS rn
                   FROM v{k}) WHERE rn = 1)""")
    parts.append(f"""
        SELECT CAST(node AS BIGINT) AS node,
               CAST(lab AS BIGINT) AS community FROM l{n_iter}""")
    return "".join(parts)


def _source_oracle_sqls() -> dict[str, str]:
    """Twins for the JSONL/CSV source queries: DuckDB reads the SAME
    fixture files the Ray pipelines stream (generated on demand, cached
    under /tmp keyed by source parquet size+mtime — the _kg_oracle_sqls
    pattern), so the comparison covers the full parse path, not just the
    aggregate."""
    from sema_ray.sources.files import ensure_csv, ensure_jsonl
    sf = os.environ.get("SEMA_RAY_ORACLE_SF", "/root/testdata/sf0.01")
    jr, cr = ensure_jsonl(sf), ensure_csv(sf)
    return {
        "jsonl_lang_stats": f"""
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM read_json_auto('{jr}/*.jsonl', format='newline_delimited')
            GROUP BY lang
        """,
        "csv_event_type_hours": f"""
            SELECT event_type,
                   (ts_us // 3600000000) % 24 AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            -- allow_quoted_nulls=false: quoted empty is '', unquoted
            -- empty is NULL — the writer's convention and Arrow's
            -- strings_can_be_null/quoted_strings_can_be_null pairing
            FROM read_csv('{cr}/*.csv', allow_quoted_nulls=false)
            GROUP BY 1, 2
        """,
    }


def queries() -> dict[str, Callable[[str], Any]]:
    from sema_ray import (dedup, graph, multimodal, relational, sampling,
                          simsearch, textops)

    # Dict order matters: the driver checks the FIRST 50 entries against
    # oracle_sql(). Every oracle-backed query must sort inside that window;
    # already-proven redundant rows (green in CORRECTNESS_r03) and
    # rows-only/pytest-oracled pipelines sort after position 50.
    return {
        # --- KG construction stage oracles (flagship; VERDICT r3 item 2) --
        "kg_normalized": _kg_normalized,
        "kg_chunks": _kg_chunks,
        "kg_mentions": _kg_mentions,
        "kg_triples": _kg_triples,
        # --- similarity search (brute oracle + recall-checked ANN) ---------
        "knn_bruteforce": simsearch.knn_bruteforce,
        "knn_lsh": simsearch.knn_lsh_checked,
        "knn_ivf": simsearch.knn_ivf_checked,
        "knn_sq8": simsearch.knn_sq8_checked,
        "bm25_search": simsearch.bm25_search,
        "bm25_phrase_search": _bm25_phrase_search,
        # stored-index path: build-once posting-list parquet (partitioned
        # by term bucket), query reads ONLY its terms' buckets — score-
        # identical to the scan path, same full-BM25 SQL twin
        "bm25_indexed": simsearch.bm25_indexed_query,
        "embedding_dup_pairs": _embedding_dup_pairs,
        "embedding_near_dup": simsearch.embedding_near_dup,
        # --- dedup family -------------------------------------------------
        "dedup_exact": dedup.exact_dedup,
        "dedup_exact_clusters": dedup.exact_dup_clusters,
        # cluster-validity twins: clusters themselves are permutation-
        # dependent (rows-only), but every member must have an in-cluster
        # neighbor within the recomputed-exact similarity budget — pinned
        # TRUE in SQL (VERDICT r3 item 6)
        "dedup_minhash": dedup.minhash_cluster_ok,
        "dedup_simhash": dedup.simhash_cluster_ok,
        "dedup_ngram_jaccard": dedup.ngram_jaccard_pairs,
        "dedup_incremental": dedup.incremental_dedup,
        "dup_components": _dup_components,
        # end-to-end curation: dedup reps -> quality gate -> stratified
        # sample, one streaming pass (sema_ray.curate)
        "curate_corpus": _curate_corpus,
        # --- multimodal / graph -------------------------------------------
        "binary_meta": multimodal.binary_meta,
        "frame_sample_meta": multimodal.frame_sample_meta,
        "user_cooccurrence_triangles":
            graph.purchase_cooccurrence_triangles,
        # per-node triangle participation over the same graph (exact
        # integer counts — the local-clustering-coefficient numerator)
        "user_cooccurrence_node_triangles":
            graph.user_cooccurrence_node_triangles,
        # the coefficient itself: two exact-integer operators composed,
        # ONE shared-form float op (bit-exact; CLAUDE.md trap #2 shape)
        "user_cooccurrence_clustering":
            graph.user_cooccurrence_clustering,
        # degree assortativity: the symmetric form collapses the sqrt
        # denominator, leaving one float division of exact bigint sums
        "user_cooccurrence_assortativity":
            graph.user_cooccurrence_assortativity,
        # --- file-format sources (JSONL / CSV shards, sources/files.py) ---
        "jsonl_lang_stats": _jsonl_lang_stats,
        "csv_event_type_hours": _csv_event_type_hours,
        # --- relational layer (SURVEY §2 M1/A1/A2/K1 + joins) -------------
        "filter_high_quantity": relational.filter_high_quantity,
        "topk_orders": relational.topk_orders,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "brand_price_stats": relational.brand_price_stats,
        "hourly_event_stats": relational.hourly_event_stats,
        "top_event_per_user": relational.top_event_per_user,
        "sessionize_users": relational.sessionize_users,
        "orders_per_segment": relational.orders_per_segment,
        "orders_segment_left_outer": relational.orders_segment_left_outer,
        "segment_priority_rollup": relational.segment_priority_rollup,
        "revenue_by_priority": relational.revenue_by_priority,
        "exact_text_search": relational.exact_text_search,
        "asof_latest_order": relational.latest_order_before_event,
        "value_band_counts": relational.value_band_counts,
        "running_user_totals": relational.running_user_totals,
        "approx_distinct_users": _approx_distinct_users,
        "value_quantiles": _value_quantiles,
        "customers_without_orders": _customers_without_orders,
        "top3_orders_per_customer": relational.top3_orders_per_customer,
        # --- text analysis / training-data hygiene ------------------------
        "lang_id": textops.lang_id,
        # round-4 marquee families pulled inside the window (displacing
        # union_key_counts / grouped_search / median_value_by_type /
        # event_gaps, which are redundant with in-window siblings and keep
        # their oracle twins in tests/test_oracles.py below)
        "hybrid_search_rrf": simsearch.hybrid_search_rrf,
        "temperature_sample_by_lang": sampling.temperature_sample_by_lang,
        "gopher_quality_filter": textops.gopher_quality_filter,
        "ngram_decontaminate": textops.ngram_decontaminate,
        # ================= driver window boundary (50) =====================
        # Everything below is either green in CORRECTNESS_r03/r04, redundant
        # with an in-window row, or rows-only/pytest-oracled by design.
        "union_key_counts": relational.union_key_counts,
        "grouped_search": relational.grouped_search,
        "median_value_by_type": relational.median_value_by_type,
        "event_gaps": relational.event_gaps,
        "event_type_hour_pivot": relational.event_type_hour_pivot,
        "doc_fingerprints": textops.doc_fingerprints,
        "distinct_segments": relational.distinct_segments,
        "active_customer_keys": relational.active_customer_keys,
        "zscore_by_type": relational.zscore_by_type,
        "sliding_window_counts": relational.sliding_window_counts,
        "inactive_customer_keys": relational.inactive_customer_keys,
        "sample_events": _sample_events,
        "doc_stats": textops.doc_stats,
        "token_count_by_lang": textops.token_count_by_lang,
        "bpe_token_counts": textops.bpe_token_counts,
        "cms_heavy_hitters": _cms_heavy_hitters,
        "quality_scores": textops.quality_scores,
        # quantile-gated quality filter (exact discrete order statistic
        # from bounded value_counts partials — no interpolation)
        "quality_gate": textops.quality_gate,
        # CCNet-style unigram-LM perplexity signal, quantized to whole
        # bits so the twin is exact integer arithmetic
        "unigram_surprisal": textops.unigram_surprisal,
        "pii_scrub": textops.pii_scrub,
        "benchmark_contamination": textops.benchmark_contamination,
        "sample_docs_by_lang": _sample_docs_by_lang,
        # deterministic leakage-free train/val/test assignment (hash-mod
        # thresholds — pure per-batch map, partition-invariant)
        "assign_splits": sampling.assign_splits,
        "docs_per_source_cap": _docs_per_source_cap,
        "ngram_counts": textops.ngram_counts,
        # distributed word-count (the corpus-sized half of BPE training)
        "word_counts": lambda sf: textops.word_counts(sf, min_freq=2),
        # per-doc tf-idf top-terms featurization (df map broadcast, fully
        # vectorized per-block scoring; rounded-score ranking both engines)
        "tfidf_top_terms": textops.tfidf_top_terms,
        # BPE tokenizer-vocabulary training: one distributed word-count
        # shuffle + vocabulary-bounded merge loop (iterative — pure-Python
        # Sennrich-2016 oracle in pytest)
        "bpe_vocab": textops.bpe_train_vocab,
        # distributed encoding pass under the trained vocab: per-doc
        # subword totals, greedy encoder once per DISTINCT word
        # (iterative — bpe_apply oracle in pytest)
        "bpe_subword_counts": textops.bpe_encode_counts,
        "repetition_stats": textops.repetition_stats,
        "dup_span_counts": dedup.dup_span_counts,
        # substring-level dedup REWRITE (Lee et al. 2022): drop every token
        # covered by a cross-document duplicated 8-token span
        "remove_dup_spans": dedup.remove_dup_spans,
        "pack_sequences": _pack_sequences,
        # raw near-dup cluster assignments (rows-only: reps depend on the
        # permutation seeds; validity is oracle-checked in-window above)
        "dedup_minhash_clusters": dedup.minhash_near_dup,
        "dedup_simhash_clusters": dedup.simhash_near_dup,
        # storable minhash signature table (the persisted artifact later
        # incremental passes band against; deterministic)
        "minhash_signatures": dedup.minhash_signatures,
        "quantize_embeddings": simsearch.quantize_embeddings,
        # IVF-PQ (Jégou et al. 2011): coarse-list pruning + ADC lookup-table
        # candidate selection + exact rescore; same recall-check oracle
        # shape as knn_lsh/knn_ivf/knn_sq8 (outside the 50-row driver
        # window — test_oracles.py runs the twin)
        "knn_ivfpq": simsearch.knn_ivfpq_checked,
        # stored IVF artifact (centroids.parquet + list-partitioned
        # assignments): queries read ONLY probed lists' partitions; same
        # recall-check oracle shape as the in-memory ANN family
        "knn_ivf_stored": simsearch.knn_ivf_stored_checked,
        "pq_encode_embeddings": simsearch.pq_encode_embeddings,
        # iterative: distributed Lloyd's k-means (per-iteration partial-sum
        # reduce; non-SQL by nature — mixture-recovery oracle in pytest)
        "kmeans_clusters": _kmeans_clusters,
        "cluster_balanced_sample": _cluster_balanced_sample,
        # SemDeDup (Abbas et al. 2023): k-means blocks the pairwise-cosine
        # near-dup pass to n^2/k per cluster. The checked form recomputes
        # validity via an independent exact brute-force pass (every DROPPED
        # vector has a smaller-id near-dup; pinned TRUE in SQL — catches
        # over-dropping; under-dropping is covered by the planted-dup
        # pytest); raw keep flags stay rows-only.
        "semdedup": _semdedup_ok,
        "semdedup_keep": _semdedup,
        "pca_embeddings": _pca_embeddings,
        "semantic_search": simsearch.semantic_search,
        # --- reference file-search lifecycle (crawl/chunk/embed/index/query)
        "file_search_semantic": _file_search_semantic,
        "file_search_exact": _file_search_exact,
        "embed_documents": _embed_documents,
        # per-conversation profile over the FULL input-hint schema
        # (role / tool / ts) — exact-integer DuckDB twin
        "conv_stats": _conv_stats,
        # role-aware LAG over conversations: assistant response latency
        "assistant_latency": _assistant_latency,
        # per-tool call + distinct-conversation counts (scale-safe
        # COUNT DISTINCT: per-block distinct pairs, one pair groupby)
        "tool_usage": _tool_usage,
        # --- KG tail stages (golden-oracle in pytest) ----------------------
        "kg_entities": _kg_entities,
        "kg_linked_triples": _kg_linked,
        # canonicalization validity twins (VERDICT r4 next-#6): entity ids
        # are permutation-dependent, but the cluster CONTRACT is exactly
        # recomputable — rep rule, id rule, exact-key merge, connectivity
        # under the pairwise merge budget with NO LSH — pinned TRUE in SQL
        # over the re-derived surface/triple sets
        "kg_entities_valid": _kg_entities_valid,
        "kg_linked_valid": _kg_linked_valid,
        "kg_adjacency": _kg_adjacency,
        "kg_entity_degrees": _kg_entity_degrees,
        # PageRank over the entity adjacency (iterative; dense-matrix
        # power-iteration oracle in pytest)
        "kg_entity_pagerank": _kg_entity_pagerank,
        # surface-keyed integer-exact PageRank over the triple graph —
        # relabeling invariance gives it the bit-exact twin the
        # permutation-dependent entity-id variant can't have
        "kg_surface_pagerank": _kg_surface_pagerank,
        # fixed-round LPA over the same surface graph — order-preserving
        # UTF-8 collation makes the smallest-label tie-break cross-engine
        # exact even though LPA is not relabeling-invariant
        "kg_surface_communities": _kg_surface_communities,
        # clustering coefficient over the same surface graph (integer
        # counts + one shared-form float op; twin on raw surfaces)
        "kg_surface_clustering": _kg_surface_clustering,
        "kg_triangle_count": _kg_triangle_count,
        # k-core decomposition of the purchase co-occurrence graph
        # (iterative peel — pure-Python Seidman oracle in pytest)
        "user_cooccurrence_cores": graph.user_cooccurrence_cores,
        # label-propagation communities over the same graph (iterative —
        # pure-Python synchronous-LPA oracle in pytest)
        "user_cooccurrence_communities":
            graph.purchase_cooccurrence_communities,
        # integer-exact PageRank over the same graph: int64 fixed-point
        # makes the per-round sums associative, so unlike the float
        # pagerank this one has a BIT-EXACT DuckDB twin (unrolled
        # per-round CTEs, identical floor divisions)
        "user_cooccurrence_pagerank": graph.user_cooccurrence_pagerank,
        # fixed-round label propagation over the same graph: LPA's update
        # (neighbor-label vote counts, max count then smallest label) is
        # all-integer, so with early_stop=False it too has a bit-exact
        # unrolled-CTE twin — see _lpa_exact_sql
        "user_cooccurrence_communities_exact":
            graph.user_cooccurrence_communities_exact,
        # Tantivy term-range query: [sa TO sz] is constant-scored
        # (Lucene range rewrite — every matching doc scores 1.0)
        "bm25_range_search": lambda sf: simsearch.bm25_search(
            sf, query="[sa TO sz]"),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "filter_high_quantity": """
            SELECT l_orderkey, l_partkey, l_quantity
            FROM lineitem WHERE l_quantity > 45
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
        "q1_pricing_summary": """
            -- exact integer-cents folds (the revenue_by_priority shape):
            -- float SUMs at 1e9 magnitudes are association-dependent, so
            -- both engines sum exact ints and do ONE float op per output
            WITH c AS (
              SELECT l_returnflag, l_linestatus,
                     CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5)
                          AS BIGINT) AS pc,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5)
                                     AS BIGINT)) AS dn
              FROM lineitem
            )
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(qc) AS DOUBLE) / 100.0 AS sum_qty,
                   CAST(SUM(pc) AS DOUBLE) / 100.0 AS sum_base_price,
                   FLOOR(CAST(SUM(dn) AS DOUBLE) / 10000.0 * 100 + 0.5)
                       / 100 AS sum_disc_price,
                   COUNT(*) AS count_order,
                   FLOOR(CAST(SUM(qc) AS DOUBLE) / 100.0 / COUNT(*)
                         * 10000 + 0.5) / 10000 AS avg_qty,
                   FLOOR(CAST(SUM(pc) AS DOUBLE) / 100.0 / COUNT(*)
                         * 10000 + 0.5) / 10000 AS avg_price
            FROM c GROUP BY l_returnflag, l_linestatus
        """,
        "brand_price_stats": """
            SELECT p_brand,
                   FLOOR(MIN(p_retailprice) * 100 + 0.5) / 100 AS min_price,
                   FLOOR(MAX(p_retailprice) * 100 + 0.5) / 100 AS max_price,
                   FLOOR(SUM(p_retailprice) / COUNT(*) * 10000 + 0.5) / 10000 AS avg_price,
                   COUNT(*) AS n_parts
            FROM part GROUP BY p_brand
        """,
        "hourly_event_stats": """
            SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_ts,
                   event_type,
                   FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value,
                   COUNT(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "top_event_per_user": """
            SELECT user_id, event_id, n_events FROM (
                SELECT user_id, event_id,
                       COUNT(*) OVER (PARTITION BY user_id) AS n_events,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events) t
            WHERE rn = 1
        """,
        "sessionize_users": """
            SELECT user_id,
                   CAST(1 + SUM(CASE WHEN gap > 1800000000 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_sessions
            FROM (SELECT user_id,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id) AS gap
                  FROM events) t
            GROUP BY user_id
        """,
        "running_user_totals": """
            SELECT event_id, user_id,
                   CAST(COUNT(*) OVER w AS BIGINT) AS running_n,
                   CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                        OVER w AS BIGINT) AS running_cents
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "event_gaps": """
            SELECT event_id,
                   COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id),
                       -1) AS gap_us
            FROM events
        """,
        # exact integer moments (cents, cents^2) make the float tail
        # identical-op-order on both engines — see relational.zscore_by_type
        "zscore_by_type": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
              FROM events
            ), s AS (
              SELECT event_type, COUNT(*) AS n, SUM(cents) AS sc,
                     SUM(CAST(cents AS HUGEINT) * cents) AS sq
              FROM c GROUP BY 1
            )
            SELECT event_id,
                   FLOOR(((CAST(cents AS DOUBLE) - CAST(sc AS DOUBLE) / n)
                          / sqrt(CAST(sq AS DOUBLE) / n
                                 - (CAST(sc AS DOUBLE) / n)
                                   * (CAST(sc AS DOUBLE) / n)))
                         * 1000000 + 0.5) / 1000000 AS z
            FROM c JOIN s USING (event_type)
        """,
        "docs_per_source_cap": """
            SELECT doc_id, source FROM documents
            QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY doc_id) <= 20
        """,
        # greedy next-fit packing as a recursive CTE: each iteration advances
        # every bucket by one in-bucket rank, threading (seq, room) exactly
        # like packing.pack_greedy's forward fold
        "pack_sequences": """
            WITH RECURSIVE counted AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CAST(length(regexp_extract_all(text, '[A-Za-z0-9]+'))
                          AS BIGINT) AS n_tokens,
                     CAST(doc_id // 4096 AS BIGINT) AS bucket
              FROM documents WHERE text IS NOT NULL
            ), c AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
                                           ORDER BY doc_id) AS rn
              FROM counted
            ), r AS (
              SELECT bucket, rn, doc_id, n_tokens,
                     CAST(0 AS BIGINT) AS seq,
                     CAST(512 - n_tokens AS BIGINT) AS room
              FROM c WHERE rn = 1
              UNION ALL
              SELECT c.bucket, c.rn, c.doc_id, c.n_tokens,
                     CASE WHEN c.n_tokens > r.room THEN r.seq + 1
                          ELSE r.seq END,
                     CASE WHEN c.n_tokens > r.room THEN 512 - c.n_tokens
                          ELSE r.room - c.n_tokens END
              FROM r JOIN c ON c.bucket = r.bucket AND c.rn = r.rn + 1
            )
            SELECT doc_id, n_tokens, bucket * 1048576 + seq AS pack_id FROM r
        """,
        "orders_per_segment": """
            SELECT c_mktsegment,
                   COUNT(*) AS n_orders,
                   FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS sum_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        # COALESCE instead of NULL group: the hash compare cannot
        # canonicalize nulls, so the outer rows get an explicit label
        "orders_segment_left_outer": """
            SELECT COALESCE(c.c_mktsegment, '(none)') AS c_mktsegment,
                   COUNT(*) AS n_orders,
                   FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100
                       AS sum_totalprice
            FROM orders o
            LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        # COALESCE labels the subtotal levels; the base data has no NULLs
        # so the label cannot collide with a real group
        "segment_priority_rollup": """
            SELECT COALESCE(c_mktsegment, '(all)') AS c_mktsegment,
                   COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
                   COUNT(*) AS n_orders,
                   FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100
                       AS sum_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY ROLLUP(c_mktsegment, o_orderpriority)
        """,
        "active_customer_keys": """
            SELECT DISTINCT o_custkey FROM orders
            INTERSECT
            SELECT DISTINCT user_id FROM events
        """,
        "inactive_customer_keys": """
            SELECT DISTINCT o_custkey FROM orders
            EXCEPT
            SELECT DISTINCT user_id FROM events
        """,
        "event_type_hour_pivot": """
            SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
              CAST(COUNT(*) FILTER (WHERE event_type='click') AS BIGINT)
                  AS click_n,
              CAST(COUNT(*) FILTER (WHERE event_type='error') AS BIGINT)
                  AS error_n,
              CAST(COUNT(*) FILTER (WHERE event_type='purchase') AS BIGINT)
                  AS purchase_n,
              CAST(COUNT(*) FILTER (WHERE event_type='signup') AS BIGINT)
                  AS signup_n,
              CAST(COUNT(*) FILTER (WHERE event_type='view') AS BIGINT)
                  AS view_n
            FROM events GROUP BY 1
        """,
        # exact triangle count via the oriented-edge triple join; the Ray
        # side orients by (degree, id) instead of (lo, hi) but counts the
        # same undirected triangles
        "user_cooccurrence_triangles": """
            WITH ed AS (
              SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                              GREATEST(a.user_id, b.user_id) AS hi
              FROM events a JOIN events b
                ON a.event_type = b.event_type
               AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
               AND a.user_id < b.user_id
              WHERE a.event_type = 'purchase')
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM ed e1
            JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
            JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
        """,
        # per-node triangle participation: each triangle from the same
        # oriented triple join credits all three corners (UNION ALL),
        # grouped per node — only nodes in >= 1 triangle appear, matching
        # the Ray side's convention
        "user_cooccurrence_node_triangles": """
            WITH ed AS (
              SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                              GREATEST(a.user_id, b.user_id) AS hi
              FROM events a JOIN events b
                ON a.event_type = b.event_type
               AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
               AND a.user_id < b.user_id
              WHERE a.event_type = 'purchase'),
            tri AS (
              SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
              FROM ed e1
              JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
              JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
            SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM (SELECT a AS node FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
            GROUP BY node
        """,
        # local clustering coefficient: integer degree + triangle counts,
        # then ONE float division of exact ints and the shared
        # FLOOR(x*10^6 + 0.5)/10^6 rounding — identical IEEE ops to the
        # Ray side (degree counts BOTH endpoints of each deduped edge)
        "user_cooccurrence_clustering": """
            WITH ed AS (
              SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                              GREATEST(a.user_id, b.user_id) AS hi
              FROM events a JOIN events b
                ON a.event_type = b.event_type
               AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
               AND a.user_id < b.user_id
              WHERE a.event_type = 'purchase'),
            deg AS (
              SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
              FROM (SELECT lo AS node FROM ed
                    UNION ALL SELECT hi FROM ed)
              GROUP BY node),
            tri AS (
              SELECT node, CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT e1.lo AS node FROM ed e1
                      JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                      JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
                    UNION ALL
                    SELECT e1.hi FROM ed e1
                      JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                      JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
                    UNION ALL
                    SELECT e2.hi FROM ed e1
                      JOIN ed e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                      JOIN ed e3 ON e3.lo = e1.hi AND e3.hi = e2.hi)
              GROUP BY node)
            SELECT d.node, d.degree,
                   COALESCE(t.n, 0) AS n_triangles,
                   CASE WHEN d.degree < 2 THEN 0.0
                        ELSE FLOOR(CAST(2 * COALESCE(t.n, 0) AS DOUBLE)
                                   / CAST(d.degree * (d.degree - 1)
                                          AS DOUBLE)
                                   * 1000000 + 0.5) / 1000000
                   END AS clustering
            FROM deg d LEFT JOIN tri t USING (node)
        """,
        # degree assortativity over the same edges: counting BOTH
        # orientations makes Sx==Sy and Sxx==Syy, so Newman's sqrt*sqrt
        # denominator collapses to one integer and r is ONE float
        # division of exact HUGEINT sums plus the shared rounding —
        # NULL for a degree-regular graph, zero rows for an edgeless one
        "user_cooccurrence_assortativity": """
            WITH ed AS (
              SELECT DISTINCT LEAST(a.user_id, b.user_id) AS lo,
                              GREATEST(a.user_id, b.user_id) AS hi
              FROM events a JOIN events b
                ON a.event_type = b.event_type
               AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
               AND a.user_id < b.user_id
              WHERE a.event_type = 'purchase'),
            e AS (SELECT lo AS u, hi AS v FROM ed
                  UNION ALL SELECT hi, lo FROM ed),
            deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
                    FROM e GROUP BY u),
            s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
                         SUM(CAST(du.d AS HUGEINT)) AS sx,
                         SUM(CAST(du.d AS HUGEINT) * dv.d) AS sxy,
                         SUM(CAST(du.d AS HUGEINT) * du.d) AS sxx
                  FROM e JOIN deg du ON du.u = e.u
                         JOIN deg dv ON dv.u = e.v
                  HAVING COUNT(*) > 0)
            SELECT CAST(m // 2 AS BIGINT) AS n_edges,
                   CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                        ELSE FLOOR(CAST(m * sxy - sx * sx AS DOUBLE)
                                   / CAST(m * sxx - sx * sx AS DOUBLE)
                                   * 1000000 + 0.5) / 1000000
                   END AS assortativity
            FROM s
        """,
        # bit-exact integer PageRank over the same co-occurrence edges
        # (unrolled rounds; associativity of int64 sums is what makes a
        # value-hash twin possible at all — see _pagerank_exact_sql)
        "user_cooccurrence_pagerank": _pagerank_exact_sql(),
        # fixed-round LPA over the same edges (all-integer update; only
        # early stopping is SQL-inexpressible — see _lpa_exact_sql)
        "user_cooccurrence_communities_exact": _lpa_exact_sql(),
        # exact integer numerator cents(ext)*(100-cents(disc)): the float
        # SUM form was association-dependent (oracle fuzz found a 1-cent
        # divergence at extreme magnitudes); ONE double division from the
        # exact HUGEINT total, identical op order to the Ray side
        "revenue_by_priority": """
            SELECT o_orderpriority,
                   COUNT(*) AS n_items,
                   FLOOR(CAST(SUM(
                       CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT)
                       * (100 - CAST(FLOOR(l_discount * 100 + 0.5)
                                     AS BIGINT))) AS DOUBLE)
                     / 10000.0 * 100 + 0.5) / 100 AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        # list-comprehension bigrams; total order (n desc, ngram asc) makes
        # the k-boundary deterministic on both engines
        "ngram_counts": """
            SELECT u.bg AS ngram, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT unnest([l[i] || ' ' || l[i+1]
                               for i in range(1, len(l))]) AS bg
                FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')
                          AS l
                      FROM documents)
            ) u
            GROUP BY 1
            ORDER BY n DESC, ngram
            LIMIT 20
        """,
        # the distributed half of BPE training: exact corpus word counts
        # above the min_freq threshold (Ray side: per-block value_counts
        # partials -> one groupby Sum shuffle -> bounded top-cap merge)
        "word_counts": """
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text),
                                                   '[a-z0-9]+')) AS w
                  FROM documents)
            GROUP BY 1
            HAVING COUNT(*) >= 2
            ORDER BY n DESC, word
        """,
        # per-doc top-5 tf-idf terms; ranking on the ROUNDED score (the
        # half-up floor form) so the k-boundary is engine-exact
        "tfidf_top_terms": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS l
              FROM documents
            ),
            tp AS (SELECT doc_id, unnest(l) AS term FROM toks),
            tfc AS (SELECT doc_id, term, COUNT(*) AS tf
                    FROM tp GROUP BY 1, 2),
            dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df
                    FROM tp GROUP BY 1),
            nd AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT doc_id, term,
                     FLOOR(tf * ln(CAST(n AS DOUBLE) / df)
                           * 1000000 + 0.5) / 1000000 AS tfidf
              FROM tfc JOIN dfc USING (term), nd
            )
            SELECT doc_id, term, tfidf FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY doc_id
                  ORDER BY tfidf DESC, term) AS r
              FROM scored)
            WHERE r <= 5
        """,
        # same exact counts as ngram_counts; cms_ok pinned TRUE (any sketch
        # regression becomes a value-hash mismatch — the HLL oracle shape)
        "cms_heavy_hitters": """
            SELECT u.bg AS ngram, CAST(COUNT(*) AS BIGINT) AS n,
                   TRUE AS cms_ok
            FROM (
                SELECT unnest([l[i] || ' ' || l[i+1]
                               for i in range(1, len(l))]) AS bg
                FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')
                          AS l
                      FROM documents)
            ) u
            GROUP BY 1
            ORDER BY n DESC, ngram
            LIMIT 20
        """,
        # Gopher-style within-doc repetition signals — all-integer outputs
        "repetition_stats": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS l
                       FROM documents)
            SELECT doc_id,
                   CAST(len(l) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(l)) AS BIGINT)
                       AS n_distinct_tokens,
                   CAST(GREATEST(len(l) - 1, 0) AS BIGINT) AS n_bigrams,
                   CAST(len(list_distinct(
                       [l[i] || ' ' || l[i+1] for i in range(1, len(l))]))
                       AS BIGINT) AS n_distinct_bigrams
            FROM t
        """,
        # cross-doc duplicated 8-token spans (substring-dedup signal); the
        # Ray side groups spans by 64-bit sequence hash, the twin by the
        # literal string — equal up to ~n^2/2^63 hash collisions
        "dup_span_counts": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS l
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest([{joins}
                                 for i in range(1, len(l) - 6)]) AS gram
                  FROM t),
            d AS (SELECT gram FROM g
                  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2)
            SELECT t.doc_id,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n_dup_windows
            FROM t LEFT JOIN (
                SELECT g.doc_id, COUNT(*) AS n
                FROM g JOIN d USING (gram)
                GROUP BY g.doc_id) c
            ON t.doc_id = c.doc_id
        """.format(joins=" || ' ' || ".join(
            f"l[i+{j}]" for j in range(8))),
        # substring-dedup rewrite: kept_text drops every token position
        # covered by a cross-doc duplicated 8-token span (union of
        # overlapping hit windows); same hash-vs-literal-string equivalence
        # as dup_span_counts
        "remove_dup_spans": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS l
              FROM documents
            ),
            wins AS (
              SELECT doc_id,
                     unnest([i for i in range(1, len(l) - 6)]) AS i,
                     unnest([array_to_string(l[i:i+7], ' ')
                             for i in range(1, len(l) - 6)]) AS w
              FROM toks
            ),
            dup AS (
              SELECT w FROM wins GROUP BY w
              HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            cov AS (
              SELECT DISTINCT doc_id, p FROM (
                SELECT wins.doc_id, unnest(range(wins.i, wins.i + 8)) AS p
                FROM wins JOIN dup USING (w))
            ),
            tok_pos AS (
              SELECT doc_id, unnest(l) AS tok,
                     unnest(range(1, len(l) + 1)) AS p
              FROM toks
            ),
            kept AS (
              SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p)
                         AS kept_text
              FROM tok_pos t
              LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.p
              WHERE c.p IS NULL
              GROUP BY t.doc_id
            )
            SELECT d.doc_id, COALESCE(k.kept_text, '') AS kept_text
            FROM documents d LEFT JOIN kept k USING (doc_id)
        """,
        # exact quantile_cont recomputed by SQL; est_ok is the Ray-side
        # histogram-sketch accuracy assertion (constant TRUE here)
        "value_quantiles": " UNION ALL ".join(
            f"""SELECT {q} AS q,
                   FLOOR(quantile_cont(value, {q}) * 1000000 + 0.5)
                       / 1000000 AS exact_q,
                   TRUE AS est_ok
                FROM events"""
            for q in (0.25, 0.5, 0.75, 0.95)),
        # exact side recomputed by SQL; est_ok is the Ray-side HLL-accuracy
        # assertion (constant TRUE here — see _approx_distinct_users)
        "approx_distinct_users": """
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                   TRUE AS est_ok
            FROM events
        """,
        "union_key_counts": """
            SELECT key, COUNT(*) AS n FROM (
                SELECT o_custkey AS key FROM orders
                UNION ALL
                SELECT c_custkey AS key FROM customer) t
            GROUP BY key
        """,
        "asof_latest_order": """
            -- NULL timestamps never match (the engine's documented ANSI
            -- semantics); DuckDB's ASOF JOIN would otherwise pair a NULL
            -- event ts with a NULL orderdate (both sort as greatest — an
            -- implementation quirk found by the NULL fuzz), so both sides
            -- filter nulls explicitly
            WITH o AS (SELECT o_custkey, o_orderdate,
                              MAX(o_orderkey) AS o_orderkey
                       FROM orders WHERE o_orderdate IS NOT NULL
                       GROUP BY 1, 2)
            SELECT e.event_id, o.o_orderkey
            FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
            ASOF JOIN o
              ON e.user_id + 1 = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "value_band_counts": """
            SELECT i AS band_id, COUNT(*) AS n_events
            FROM events e CROSS JOIN (SELECT unnest(range(10)) AS i) b
            WHERE e.value >= i * 2.0 AND e.value < i * 2.0 + 5.0
            GROUP BY i
        """,
        "median_value_by_type": """
            SELECT event_type,
                   list_sort(list(value))[CAST((COUNT(*) - 1) // 2 + 1
                                               AS BIGINT)] AS median_value,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "sliding_window_counts": """
            WITH e AS (SELECT event_type, value,
                              epoch_us(ts) // 1000000 AS ts_s FROM events),
                 w AS (SELECT event_type, value,
                              ((ts_s // 900) * 900 - 900 * i) AS win_start
                       FROM e CROSS JOIN (SELECT unnest(range(4)) AS i) r
                       WHERE ((ts_s // 900) * 900 - 900 * i) > ts_s - 3600)
            SELECT win_start, event_type,
                   COUNT(*) AS n_events,
                   FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
            FROM w GROUP BY 1, 2
        """,
        "exact_text_search": """
            SELECT doc_id,
                   CAST(length(regexp_extract_all(text, 'data')) AS BIGINT)
                       AS n_matches
            FROM documents WHERE text LIKE '%data%'
        """,
        "grouped_search": """
            SELECT source, doc_id, score, n_docs_matched FROM (
                SELECT source, doc_id, score,
                       COUNT(*) OVER (PARTITION BY source) AS n_docs_matched,
                       ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY score DESC, doc_id) AS rn
                FROM (SELECT source, doc_id,
                             CAST(length(regexp_extract_all(text, 'vector'))
                                  AS BIGINT) AS score
                      FROM documents) s
                WHERE score > 0) t
            WHERE rn = 1
        """,
        "doc_stats": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_extract_all(text, '{TOKEN_RE}'))
                        AS BIGINT) AS n_tokens,
                   CAST(length(regexp_extract_all(text, '[0-9]'))
                        AS BIGINT) AS n_digits,
                   CAST(length(regexp_extract_all(text, ' '))
                        AS BIGINT) AS n_spaces
            FROM documents
        """,
        "token_count_by_lang": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(length(regexp_extract_all(text, '{TOKEN_RE}')))
                        AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang
        """,
        # same RE2 engine + pattern string on both sides -> exact counts
        "bpe_token_counts": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        '''(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))
                        AS BIGINT) AS n_tokens_bpe
            FROM documents
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   FLOOR(na / GREATEST(nc, 1.0) * 10000 + 0.5) / 10000 AS alpha_ratio,
                   FLOOR(nd / GREATEST(nc, 1.0) * 10000 + 0.5) / 10000 AS digit_ratio,
                   FLOOR(np / GREATEST(nc, 1.0) * 10000 + 0.5) / 10000 AS punct_ratio,
                   FLOOR(na / GREATEST(nt, 1.0) * 10000 + 0.5) / 10000 AS mean_token_len
            FROM (SELECT doc_id,
                    CAST(length(text) AS DOUBLE) AS nc,
                    CAST(length(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS na,
                    CAST(length(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS nd,
                    CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS np,
                    CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS DOUBLE) AS nt
                  FROM documents) t
        """,
        # quantile gate: threshold = exact k-th smallest rounded
        # alpha_ratio (k = floor((n-1)*0.5) + 1) — a discrete order
        # statistic on identical rounded values, no interpolation
        "quality_gate": f"""
            WITH s AS (
              SELECT doc_id,
                     FLOOR(CAST(length(regexp_extract_all(text, '[A-Za-z]'))
                                AS DOUBLE)
                           / GREATEST(CAST(length(text) AS DOUBLE), 1.0)
                           * 10000 + 0.5) / 10000 AS alpha_ratio
              FROM documents),
            ordered AS (
              SELECT alpha_ratio,
                     ROW_NUMBER() OVER (ORDER BY alpha_ratio) AS r,
                     COUNT(*) OVER () AS n
              FROM s),
            thr AS (
              SELECT alpha_ratio AS v FROM ordered
              WHERE r = CAST(FLOOR((n - 1) * 0.5) AS BIGINT) + 1)
            SELECT doc_id, alpha_ratio FROM s
            WHERE alpha_ratio >= (SELECT v FROM thr)
        """,
        # unigram surprisal: token self-information in whole bits is
        # floor(log2(N // c)) = length(bin(N // c)) - 1 — all-integer until
        # the one rounded mean division (identical IEEE ops both engines)
        "unigram_surprisal": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS w
              FROM documents),
            cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
            tot AS (SELECT COUNT(*) AS n FROM tok),
            per AS (
              SELECT t.doc_id,
                     CAST(SUM(length(bin((SELECT n FROM tot) // c.c)) - 1)
                          AS BIGINT) AS bits,
                     CAST(COUNT(*) AS BIGINT) AS n_tok
              FROM tok t JOIN cnt c ON t.w = c.w
              GROUP BY t.doc_id)
            SELECT doc_id, n_tok, bits,
                   FLOOR(CAST(bits AS DOUBLE) / n_tok * 10000 + 0.5)
                       / 10000 AS mean_bits
            FROM per
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM documents GROUP BY text
        """,
        # the composition twin: window-function dedup + the quality_scores
        # alpha form + the sample_docs_by_lang hash-mod rule, end to end
        "curate_corpus": """
            WITH reps AS (
                SELECT doc_id, lang, text,
                       MIN(doc_id) OVER (PARTITION BY text) AS rep
                FROM documents),
            q AS (SELECT doc_id, lang,
                     FLOOR(CAST(length(regexp_extract_all(text, '[A-Za-z]'))
                                AS DOUBLE)
                           / GREATEST(CAST(length(text) AS DOUBLE), 1.0)
                           * 10000 + 0.5) / 10000 AS ar
                  FROM reps WHERE doc_id = rep)
            SELECT doc_id, lang FROM q
            WHERE ar >= 0.6
              AND (((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
                  % 4294967296 * 2654435761) % 4294967296 <
                  CASE lang WHEN 'en' THEN 2147483648
                            WHEN 'de' THEN 1073741824
                            WHEN 'fr' THEN 1073741824
                            ELSE 536870912 END
        """,
        "dedup_exact_clusters": """
            SELECT doc_id,
                   MIN(doc_id) OVER (PARTITION BY text) AS rep_id
            FROM documents
        """,
        # cluster-validity twins: the Ray side recomputes, exactly from
        # text, that every near-dup-cluster member has an in-cluster
        # neighbor within the similarity budget (Jaccard ≥ thr - tol /
        # hamming ≤ k) and emits cluster_ok per doc; SQL pins it TRUE.
        "dedup_minhash": """
            SELECT doc_id, CAST(1 AS BIGINT) AS cluster_ok FROM documents
        """,
        "dedup_simhash": """
            SELECT doc_id, CAST(1 AS BIGINT) AS cluster_ok FROM documents
        """,
        # SemDeDup validity (same pinned-TRUE shape): the Ray side
        # recomputes, via an independent exact brute-force cosine pass,
        # that every dropped vector has a smaller-id near-duplicate
        "semdedup": f"""
            SELECT vec_id, CAST(1 AS BIGINT) AS dedup_ok FROM embeddings
            WHERE {_EMB_VALID_SQL}
        """,
        # snapshot-over-snapshot dedup: odd-id docs checked against even-id
        # docs; Ray side is Bloom-prefiltered but exact (128-bit verify)
        "dedup_incremental": """
            -- IS NOT DISTINCT FROM: NULL text is ONE identity group across
            -- the whole dedup family (matching dedup_exact's GROUP BY
            -- semantics), so a NULL new doc IS a dup of a NULL prior doc
            SELECT d.doc_id,
                   EXISTS (SELECT 1 FROM documents p
                           WHERE p.doc_id % 2 = 0
                             AND p.text IS NOT DISTINCT FROM d.text)
                       AS is_dup
            FROM documents d WHERE d.doc_id % 2 = 1
        """,
        "dedup_ngram_jaccard": """
            -- NULL-text docs have no shingles and no candidacy (raw NULL
            -- propagation would pair NULL docs with empty docs but not
            -- with each other — not a usable dedup semantic)
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS toks
                       FROM documents WHERE text IS NOT NULL),
            s AS (SELECT doc_id,
                     CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                          WHEN len(toks) < 3
                              THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(
                              [array_to_string(toks[i:i+2], ' ')
                               FOR i IN generate_series(1, len(toks) - 2)])
                     END AS sh
                  FROM t),
            p AS (SELECT a.doc_id AS a, b.doc_id AS b,
                         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS ni,
                         CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) AS nu
                  FROM s a JOIN s b ON a.doc_id < b.doc_id),
            j AS (SELECT a, b,
                         CASE WHEN nu = 0 THEN 1.0 ELSE ni / nu END AS raw
                  FROM p)
            SELECT a, b, FLOOR(raw * 10000 + 0.5) / 10000 AS jac
            FROM j WHERE raw >= 0.5
        """,
        # closure of the same pair graph dedup_ngram_jaccard checks, seeded
        # with every doc (isolated -> self); Ray side runs distributed
        # alternating star rounds instead of the driver union-find
        "dup_components": """
            -- edges exclude NULL-text docs (no shingles, no candidacy —
            -- the ngram_jaccard semantics); the reach seed keeps every
            -- document, so NULL docs stay singleton components
            WITH RECURSIVE t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS toks
                       FROM documents WHERE text IS NOT NULL),
            s AS (SELECT doc_id,
                     CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
                          WHEN len(toks) < 3
                              THEN [array_to_string(toks, ' ')]
                          ELSE list_distinct(
                              [array_to_string(toks[i:i+2], ' ')
                               FOR i IN generate_series(1, len(toks) - 2)])
                     END AS sh
                  FROM t),
            p AS (SELECT a.doc_id AS a, b.doc_id AS b,
                         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS ni,
                         CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) AS nu
                  FROM s a JOIN s b ON a.doc_id < b.doc_id),
            e AS (SELECT a, b FROM p
                  WHERE (CASE WHEN nu = 0 THEN 1.0 ELSE ni / nu END) >= 0.5),
            ed AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
            reach(v, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a)
            SELECT v AS doc_id, MIN(r) AS component FROM reach GROUP BY v
        """,
        "embedding_near_dup": """
            WITH RECURSIVE e AS (
                SELECT a.vec_id AS a, b.vec_id AS b
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) >= 0.935),
            ed AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
            reach(v, r) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT reach.v, ed.b FROM reach JOIN ed ON reach.r = ed.a)
            SELECT v AS vec_id, MIN(r) AS rep_id FROM reach GROUP BY v
        """,
        "customers_without_orders": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "top3_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC,
                                                   o_orderkey) AS rn
                FROM orders) t
            WHERE rn <= 3
        """,
        # the inner ((k % m + m) % m) matches numpy's unsigned wrap for
        # negative keys (HUGEINT % alone returns a negative remainder)
        "sample_events": """
            SELECT event_id, user_id FROM events
            WHERE (((CAST(event_id AS HUGEINT) % 4294967296) + 4294967296)
                  % 4294967296 * 2654435761)
                  % 4294967296 < 1073741824
        """,
        "sample_docs_by_lang": """
            SELECT doc_id, lang FROM documents
            WHERE (((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
                  % 4294967296 * 2654435761)
                  % 4294967296 <
                  CASE lang WHEN 'en' THEN 2147483648
                            WHEN 'de' THEN 1073741824
                            WHEN 'fr' THEN 1073741824
                            ELSE 536870912 END
        """,
        # train/val/test assignment at 0.9/0.05/0.05 cumulative thresholds
        # (int(0.9 * 2^32) = 3865470566; int((0.9 + 0.05) * 2^32) =
        # 4080218931 — the float sum, matching the Ray side exactly)
        "assign_splits": """
            SELECT doc_id,
                   CASE WHEN b < 3865470566 THEN 'train'
                        WHEN b < 4080218931 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         (((CAST(doc_id AS HUGEINT) % 4294967296)
                           + 4294967296) % 4294967296 * 2654435761)
                         % 4294967296 AS b
                  FROM documents)
        """,
        "lang_id": _lang_id_sql(),
        # winnowing fingerprint: md5-low8 token hashes, XOR-combined rolling
        # 8-token windows, min — exact integer twin of textops.md5_u64 +
        # FingerprintStage (the xor fold mirrors the numpy roll loop)
        "doc_fingerprints": f"""
            WITH d AS (
              SELECT doc_id, text,
                     [('0x' || substr(md5(t), 17, 16))::UBIGINT
                      for t in regexp_extract_all(lower(text),
                                                  '[A-Za-z0-9]+')] AS h
              FROM documents
            )
            SELECT doc_id,
              CAST(CASE
                WHEN len(h) = 0 THEN
                  CASE WHEN text IS NULL OR text = '' THEN 0
                       ELSE ('0x' || substr(md5(text), 17, 16))::UBIGINT
                            & 9223372036854775807 END
                WHEN len(h) < 8 THEN list_min(h) & 9223372036854775807
                ELSE list_min(
                    [{_XOR8} for i in range(1, len(h) - 6)])
                    & 9223372036854775807
              END AS BIGINT) AS fingerprint
            FROM d
        """,
        "benchmark_contamination": _contamination_sql(),
        "pii_scrub": r"""
            WITH e AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text,
                         '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                         AS BIGINT) AS n_emails,
                     regexp_replace(text,
                         '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                         '[EMAIL]', 'g') AS t1
              FROM documents)
            SELECT doc_id, n_emails,
                   CAST(len(regexp_extract_all(t1,
                       '\+?[0-9][0-9\-() ]{7,}[0-9]')) AS BIGINT) AS n_phones,
                   regexp_replace(t1, '\+?[0-9][0-9\-() ]{7,}[0-9]',
                                  '[PHONE]', 'g') AS text_clean
            FROM e
        """,
        "knn_bruteforce": f"""
            WITH emb AS (SELECT vec_id, embedding FROM embeddings
                         WHERE {_EMB_VALID_SQL})
            SELECT query_id, neighbor_id FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])) DESC,
                           b.vec_id) AS rn
                FROM emb a JOIN emb b ON b.vec_id != a.vec_id
                WHERE a.vec_id < 5) t
            WHERE rn <= 10
        """,
        # knn_lsh / knn_ivf return a per-query recall summary: the exact
        # k-th cosine (a real distributed scan, recomputed here via
        # ROW_NUMBER) plus a recall-≥-threshold boolean the Ray side
        # computes against its own exact pass (TRUE here, so any recall
        # regression becomes a hash mismatch).
        "knn_lsh": _KNN_CHECK_SQL,
        "knn_ivf": _KNN_CHECK_SQL,
        "knn_sq8": _KNN_CHECK_SQL,
        "knn_ivfpq": _KNN_CHECK_SQL,
        "knn_ivf_stored": _KNN_CHECK_SQL,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.5
        """,
        "bm25_search": _bm25_sql([("scan",), ("table",), ("vector",)]),
        # the indexed path reproduces the scan path's scores bit-for-bit,
        # so its twin is the same full-BM25 SQL over its own term set
        "bm25_indexed": _bm25_sql([("hash",), ("join",), ("merge",)]),
        # phrase variant: '"table hash" scan' — the quoted clause scores
        # positionally (tf = adjacent-bigram count, idf = sum of the two
        # terms' idfs), exercising the Tantivy phrase-scoring semantics
        "bm25_phrase_search": _bm25_sql([("scan",), ("table", "hash")]),
        # term-range query '[sa TO sz]': any token BETWEEN the bounds
        # matches; constant score 1.0 (ties break on doc_id in the merge)
        "bm25_range_search": """
            SELECT doc_id, 1.0 AS score
            FROM documents
            WHERE EXISTS (
              SELECT 1 FROM unnest(
                  regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(w)
              WHERE w BETWEEN 'sa' AND 'sz')
            ORDER BY doc_id
            LIMIT 20
        """,
        "binary_meta": """
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
            FROM documents
        """,
        # MP4 demux roundtrip: the Ray side muxes real ISO BMFF containers
        # and REAL-demuxes frames back through the sample tables; the twin
        # recomputes the expected (frame_idx, pts, size) table from the
        # closed-form synthesis rule alone (sizes 64 + (i*37+j*11) % 100,
        # 40 ms/frame, 4 evenly spaced picks over 9 + i%5 samples) — a
        # box-parsing bug on either side breaks the value hash
        "frame_sample_meta": """
            WITH items AS (
              SELECT CAST(i AS BIGINT) AS item_id, 9 + (i % 5) AS n
              FROM range(0, 32) t(i)
            ), picks AS (
              SELECT item_id,
                     unnest([CAST(round(j * (n - 1) / 3.0) AS INTEGER)
                             for j in range(0, 4)]) AS frame_idx
              FROM items
            )
            SELECT item_id,
                   frame_idx,
                   CAST(frame_idx * 40 AS BIGINT) AS pts_ms,
                   CAST(64 + ((item_id * 37 + frame_idx * 11) % 100)
                        AS BIGINT) AS n_bytes
            FROM picks
        """,
        # RRF hybrid: both half-twins already exist (the bm25 SQL and the
        # knn list_cosine_similarity ranking); fusion adds COALESCEd
        # reciprocal terms in the same IEEE order the Ray side sums
        "hybrid_search_rrf": """
            WITH bm AS (
              SELECT doc_id,
                     ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r
              FROM ({bm_inner})
            ), vs AS (
              SELECT doc_id, r FROM (
                -- zero-norm guard: the Ray side's _normalize_rows maps a
                -- zero vector to similarity 0; DuckDB's raw
                -- list_cosine_similarity emits -1 for it (the
                -- _KNN_CHECK_SQL guard, same latent-twin class)
                SELECT b.vec_id AS doc_id,
                       ROW_NUMBER() OVER (ORDER BY
                           CASE WHEN list_dot_product(
                                    CAST(b.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) = 0
                                 OR list_dot_product(
                                    CAST(q.embedding AS DOUBLE[]),
                                    CAST(q.embedding AS DOUBLE[])) = 0
                                THEN 0.0
                                ELSE list_cosine_similarity(
                                    CAST(q.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[]))
                           END DESC,
                           b.vec_id) AS r
                -- q must be the FIRST table of the cross product: with b
                -- first, DuckDB 1.0's cross-product executor runs the
                -- cosine's NULL-element scan over b's unfiltered chunk
                -- slots and rejects rows the WHERE already excluded
                FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) q,
                     embeddings b
                WHERE b.vec_id <> 0
                  AND b.embedding IS NOT NULL
                  AND COALESCE(list_aggregate(list_transform(
                      CAST(b.embedding AS DOUBLE[]),
                      x -> CAST(isfinite(x) AS INT)), 'min'), 1) = 1) t
              WHERE r <= 50
            ), f AS (
              SELECT COALESCE(bm.doc_id, vs.doc_id) AS doc_id,
                     COALESCE(1.0 / (60 + bm.r), 0.0)
                     + COALESCE(1.0 / (60 + vs.r), 0.0) AS s,
                     COALESCE(bm.r, 0) AS r_text,
                     COALESCE(vs.r, 0) AS r_vec
              FROM bm FULL OUTER JOIN vs ON bm.doc_id = vs.doc_id
            )
            SELECT doc_id,
                   FLOOR(s * 1000000000 + 0.5) / 1000000000 AS rrf_score,
                   CAST(r_text AS BIGINT) AS r_text,
                   CAST(r_vec AS BIGINT) AS r_vec
            FROM f ORDER BY rrf_score DESC, doc_id LIMIT 20
        """.format(bm_inner=_bm25_sql(
            [("scan",), ("table",), ("vector",)], k=50)),
        # temperature resampling: integer sqrt weights (float sqrt corrected
        # by one ULP step), integer quota m = min(c, target*w // W), keep
        # iff knuth_bucket(doc_id) % c < m — all-integer on both engines
        "temperature_sample_by_lang": """
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
                       WHERE lang IS NOT NULL
                       GROUP BY lang),
            w0 AS (SELECT lang, n,
                          CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS r
                   FROM c),
            w AS (SELECT lang, n,
                         CASE WHEN (r + 1) * (r + 1) <= n THEN r + 1
                              WHEN r * r > n THEN r - 1
                              ELSE r END AS w
                  FROM w0),
            s AS (SELECT SUM(w) AS tw, SUM(n) // 2 AS target FROM w),
            m AS (SELECT lang, n,
                         LEAST(n, (s.target * w.w) // s.tw) AS m
                  FROM w, s)
            SELECT d.doc_id, d.lang
            FROM documents d JOIN m USING (lang)
            WHERE (((CAST(d.doc_id AS HUGEINT) % 4294967296) + 4294967296)
                  % 4294967296 * 2654435761) % 4294967296 % m.n < m.m
        """,
        # n-gram decontamination: benchmark slice = doc_id % 97 == 0; a
        # training doc's n_hits counts every (overlapping) 5-gram position
        # matching any distinct benchmark 5-gram
        "ngram_decontaminate": """
            WITH t AS (SELECT doc_id,
                              regexp_extract_all(lower(text), '[a-z0-9]+')
                                  AS l
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest([{gram5}
                                 for i in range(1, len(l) - 3)]) AS gram
                  FROM t),
            b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
            h AS (SELECT g.doc_id, COUNT(*) AS n
                  FROM g JOIN b USING (gram)
                  WHERE g.doc_id % 97 <> 0
                  GROUP BY g.doc_id)
            SELECT t.doc_id,
                   CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
                   CAST(COALESCE(h.n, 0) > 0 AS BIGINT) AS contaminated
            FROM t LEFT JOIN h USING (doc_id)
            WHERE t.doc_id % 97 <> 0
        """.format(gram5=" || ' ' || ".join(f"l[i+{j}]" for j in range(5))),
        # Gopher A1.1 rules — every ratio as exact integer arithmetic
        "gopher_quality_filter": """
            WITH d AS (
              SELECT doc_id, text, lower(text) AS low,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS l,
                     ' ' || regexp_replace(lower(text), '[^a-z0-9]+', '  ',
                                           'g') || ' ' AS norm
              FROM documents
            ), f AS (
              SELECT doc_id,
                CAST(len(l) AS BIGINT) AS n_words,
                CAST(length(regexp_replace(low, '[^a-z0-9]', '', 'g'))
                     AS BIGINT) AS n_tokchars,
                CAST(length(text) - length(replace(text, '#', ''))
                     AS BIGINT) AS n_hash,
                CAST((length(text) - length(replace(text, '...', ''))) // 3
                     AS BIGINT) AS n_ell,
                CAST(len([x for x in l
                          if regexp_full_match(x, '[0-9]+')]) AS BIGINT)
                    AS n_digit_tok,
                CAST({stop_sum} AS BIGINT) AS n_stop
              FROM d
            )
            SELECT doc_id, n_words,
              CAST(n_words >= 50 AND n_words <= 100000 AS BIGINT)
                  AS ok_word_count,
              CAST(3 * n_words <= n_tokchars
                   AND n_tokchars <= 10 * n_words AS BIGINT)
                  AS ok_mean_word_len,
              CAST(10 * n_hash <= n_words
                   AND 10 * n_ell <= n_words AS BIGINT)
                  AS ok_symbol_ratio,
              CAST(5 * (n_words - n_digit_tok) >= 4 * n_words AS BIGINT)
                  AS ok_alpha_words,
              CAST(n_stop >= 2 AS BIGINT) AS ok_stopwords,
              CAST(n_words >= 50 AND n_words <= 100000
                   AND 3 * n_words <= n_tokchars
                   AND n_tokchars <= 10 * n_words
                   AND 10 * n_hash <= n_words
                   AND 10 * n_ell <= n_words
                   AND 5 * (n_words - n_digit_tok) >= 4 * n_words
                   AND n_stop >= 2 AS BIGINT) AS pass
            FROM f
        """.format(stop_sum=" + ".join(
            f"CASE WHEN contains(norm, ' {w} ') THEN 1 ELSE 0 END"
            for w in ("the", "be", "to", "of", "and", "that", "have",
                      "with"))),
        # KG extraction stages: the golden rules are RE2 + literals, so
        # normalize/mentions/triples have exact DuckDB twins over the derived
        # corpus parquet (built from golden.py's own constants).
        **_kg_oracle_sqls(),
        # JSONL/CSV source paths — both engines parse the same shard files
        **_source_oracle_sqls(),
        # doc_fingerprints, dedup_minhash/simhash, semantic_search and the
        # remaining kg_* pipelines (chunker byte arithmetic, LSH/embedding
        # canonicalization, linked/adjacency/degrees downstream of it) are
        # non-SQL-expressible: driver records rows-only checks; their
        # correctness oracles are pure-Python goldens in tests/.
    }
