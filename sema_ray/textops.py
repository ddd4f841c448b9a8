"""Text-analysis operators for training-data pipelines over the documents table.

Vectorized Arrow kernels wherever the computation is expressible with
``pyarrow.compute`` (counts, lengths, regex occurrence counts — Arrow and
DuckDB both run RE2, so the oracle semantics match exactly); compiled-once
per-actor state for the heuristic stages (language profiles), following the
reference's stateful-stage pattern (``src/semantic/embeddings.rs`` model held
for the worker's lifetime — here: profile tables built in ``__init__``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

from .util import round_half_up

TOKEN_RE = "[A-Za-z0-9]+"


def _load_docs(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def _word_stream(t: pa.Table):
    """Shared token-stream prelude: lowercase -> split on non-alnum ->
    flatten with row parent indices, empty pieces removed. Returns
    ``(toks, par)`` or ``(None, None)`` when the batch has no tokens.

    Every token-granular textop tokenizes through here — the semantics
    are pinned to the DuckDB twins'
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``, so a change in one
    place cannot desynchronize the others."""
    low = pc.utf8_lower(t["text"])
    parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    if len(flat) == 0:
        return None, None
    parents = pc.list_parent_indices(parts) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = np.nonzero(pc.not_equal(flat, "")
                      .to_numpy(zero_copy_only=False))[0]
    if len(keep) == 0:
        return None, None
    return flat.take(pa.array(keep, pa.int64())), parents[keep]


def doc_stats(sf_dir: str) -> rd.Dataset:
    """Per-document integer stats: chars, tokens, digits, spaces, lines.

    All exact integers ⇒ bit-identical to the DuckDB oracle.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = t["text"]
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(text, pattern=TOKEN_RE), pa.int64()),
            "n_digits": pc.cast(
                pc.count_substring_regex(text, pattern="[0-9]"), pa.int64()),
            "n_spaces": pc.cast(
                pc.count_substring(text, pattern=" "), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def token_count_by_lang(sf_dir: str) -> rd.Dataset:
    """Corpus token budget per language: lang, n_docs, n_tokens.

    Partial-aggregated per batch before the (tiny) global groupby. A NULL
    lang forms its own group, matching SQL GROUP BY semantics (hostile-
    corpus fuzz: the raw Ray groupby crashes on a None key).
    """
    ds = _load_docs(sf_dir, ["lang", "text"])

    from .util import fill_null_key, restore_null_key

    def partial(t: pa.Table) -> pa.Table:
        tok = pc.cast(pc.count_substring_regex(t["text"], pattern=TOKEN_RE),
                      pa.int64())
        g = pa.table({"lang": fill_null_key(t["lang"]),
                      "tok": tok, "one": pa.array(
                          np.ones(t.num_rows, dtype=np.int64))})
        a = g.group_by(["lang"]).aggregate([("tok", "sum"), ("one", "sum")])
        return pa.table({"lang": a["lang"], "n_tokens": a["tok_sum"],
                         "n_docs": a["one_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
    ).map_batches(lambda t: restore_null_key(t, "lang"),
                  batch_format="pyarrow")


# GPT-2-style pretokenizer (the "BPE-ish" token estimate): contraction
# suffixes, space-prefixed letter/digit/punctuation runs, whitespace runs.
# The upstream pattern's trailing-whitespace lookahead is dropped — RE2 (the
# engine in BOTH Arrow and DuckDB) has no lookahead, and for counting it
# only re-splits a doc's final whitespace run, a ≤1-token difference the
# two engines agree on anyway.
BPE_TOKEN_RE = (r"'(?:s|t|re|ve|m|ll|d)"
                r"| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+")


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """Per-document BPE-ish token estimate: (doc_id, n_tokens_bpe).

    Counts GPT-2 pretokenizer matches with one RE2 kernel pass — the
    standard "how many tokens will the tokenizer produce" budget estimate
    when running the real BPE merge table is too expensive for a corpus
    sweep (merges only ever split pretokens further, so this lower-bounds
    and tightly tracks true BPE counts on natural text). Exact twin in
    DuckDB: ``len(regexp_extract_all(text, pattern))`` — same RE2 engine,
    same pattern string.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        # NULL text -> NULL count (the twin's regexp_extract_all(NULL)
        # propagation; fill_null(0) would claim an empty doc)
        n = pc.cast(pc.count_substring_regex(t["text"],
                                             pattern=BPE_TOKEN_RE),
                    pa.int64())
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_tokens_bpe": n})

    return ds.map_batches(count, batch_format="pyarrow", batch_size=None)


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Heuristic quality features: ratios of exact integer counts.

    Each ratio divides two integers computed identically in Arrow and DuckDB,
    then rounds to 4 digits — deterministic across engines.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        denom = pc.max_element_wise(n_chars, pa.scalar(1.0))
        n_alpha = pc.cast(
            pc.count_substring_regex(text, pattern="[A-Za-z]"), pa.float64())
        n_digit = pc.cast(
            pc.count_substring_regex(text, pattern="[0-9]"), pa.float64())
        n_punct = pc.cast(
            pc.count_substring_regex(text, pattern="[.,;:!?]"), pa.float64())
        n_tok = pc.cast(
            pc.count_substring_regex(text, pattern=TOKEN_RE), pa.float64())
        mean_tok_len = round_half_up(
            pc.divide(n_alpha, pc.max_element_wise(n_tok, pa.scalar(1.0))), 4)
        return pa.table({
            "doc_id": t["doc_id"],
            "alpha_ratio": round_half_up(pc.divide(n_alpha, denom), 4),
            "digit_ratio": round_half_up(pc.divide(n_digit, denom), 4),
            "punct_ratio": round_half_up(pc.divide(n_punct, denom), 4),
            "mean_token_len": mean_tok_len,
        })

    return ds.map_batches(score, batch_format="pyarrow")


def quality_gate(sf_dir: str, q: float = 0.5) -> rd.Dataset:
    """Quantile-gated quality filter — the Gopher-style "drop the worst
    half" pass: (doc_id, alpha_ratio) for documents whose alpha_ratio is
    at or above the corpus q-th ORDER STATISTIC (the k-th smallest value,
    k = floor((n-1) * q) + 1).

    Exact and scale-safe by construction: the 4-digit-rounded ratios live
    on a <= 10001-value grid, so the threshold comes from per-block
    ``value_counts`` partials folded on the driver (bounded by the grid,
    never the corpus) — a discrete order statistic, identical on both
    engines (no quantile interpolation, no float-boundary risk), followed
    by one stateless filter pass."""
    from .util import collect_table
    scores = quality_scores(sf_dir) \
        .select_columns(["doc_id", "alpha_ratio"]).materialize()

    def vc_partial(t: pa.Table) -> pa.Table:
        vc = t["alpha_ratio"].combine_chunks().value_counts() \
            if isinstance(t["alpha_ratio"], pa.ChunkedArray) \
            else t["alpha_ratio"].value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"v": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    tbl = collect_table(scores.map_batches(vc_partial,
                                           batch_format="pyarrow",
                                           batch_size=None))
    if tbl.num_rows == 0 or "v" not in tbl.column_names:
        return scores
    raw_v = tbl["v"].to_numpy(zero_copy_only=False)
    vals = np.unique(raw_v)
    counts = np.zeros(len(vals), dtype=np.int64)
    np.add.at(counts, np.searchsorted(vals, raw_v),
              tbl["n"].to_numpy(zero_copy_only=False))
    n = int(counts.sum())
    k = int(np.floor((n - 1) * q)) + 1  # 1-based k-th smallest
    thr = float(vals[np.searchsorted(np.cumsum(counts), k)])

    def gate(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["alpha_ratio"], thr))

    return scores.map_batches(gate, batch_format="pyarrow",
                              batch_size=None)


# Language profiles: tiny per-language marker sets (public linguistic facts).
# A real deployment would load fastText lid vectors in ``__init__``; the
# heuristic keeps the stage dependency-free while exercising the identical
# actor-pool plumbing.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and is of to in that it with for was on are this".split()),
    "de": frozenset("der die das und ist nicht ein eine mit für von zu im den".split()),
    "fr": frozenset("le la les et est une des dans pour que qui pas sur".split()),
    "es": frozenset("el la los las y es una en que por con para del se".split()),
    "pt": frozenset("o os uma em que não por com para do da um".split()),
    "it": frozenset("il lo la gli e è una che per non con del in di".split()),
}


# RE2 codepoint-class patterns — identical classes to the DuckDB twin
# (__ray_entry__._lang_id_sql); script counts run over the first 2000 chars.
_SCRIPT_PATTERNS = (
    ("cjk", "[一-鿿぀-ヿ]"),
    ("cyr", "[Ѐ-ӿ]"),
    ("grk", "[Ͱ-Ͽ]"),
    ("lat", "[\x41-\x7A\xC0-ſ]"),
)
_MAX_VOTE_WORDS = 400


def classify_langs_batch(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized language-ID (VERDICT r3 item 4): Arrow
    ``count_substring_regex`` per script class, then stopword votes computed
    over the dictionary-encoded flattened word stream — the marker lookup
    runs once per DISTINCT word per block, the per-row work is bincounts.
    Decision rule is bit-identical to the r3 per-row classify (script
    thresholds first, then first-lang-reaching-max vote tie-break, 'und' on
    zero votes) — the DuckDB twin is the spec.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    head = pc.utf8_slice_codeunits(text, 0, 2000)
    counts = {
        name: pc.cast(pc.count_substring_regex(head, pattern=pat),
                      pa.int64()).to_numpy(zero_copy_only=False)
        for name, pat in _SCRIPT_PATTERNS
    }
    tot = counts["cjk"] + counts["cyr"] + counts["grk"] + counts["lat"]
    safe = np.maximum(tot, 1).astype(np.float64)

    # stopword votes over the first 400 whitespace words of lower(text)
    lists = pc.split_pattern_regex(pc.utf8_lower(text), pattern=r"\s+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parents = parents[keep.to_numpy(zero_copy_only=False)]
    if len(parents):
        new = np.r_[True, parents[1:] != parents[:-1]]
        run_start = np.maximum.accumulate(
            np.where(new, np.arange(len(parents)), 0))
        rank = np.arange(len(parents)) - run_start
        cap = rank < _MAX_VOTE_WORDS
        flat = flat.filter(pa.array(cap))
        parents = parents[cap]
    langs = list(_LANG_MARKERS)
    votes = np.zeros((n, len(langs)), dtype=np.int64)
    if len(parents):
        enc = flat.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        for j, lang in enumerate(langs):
            marks = _LANG_MARKERS[lang]
            memb = np.fromiter((w in marks for w in vocab), dtype=bool,
                               count=len(vocab))
            hit = memb[idx]
            if hit.any():
                votes[:, j] = np.bincount(parents[hit], minlength=n)
    vmax = votes.max(axis=1)
    # np.argmax returns the FIRST index attaining the max == the r3
    # marker-order tie break (first lang reaching best_votes wins)
    first_win = np.asarray(langs, dtype=object)[votes.argmax(axis=1)]
    latin_pred = np.where(vmax > 0, first_win, "und")
    pred = np.where(
        tot == 0, "und",
        np.where(counts["cjk"] / safe > 0.25, "zh",
                 np.where(counts["cyr"] / safe > 0.25, "ru",
                          np.where(counts["grk"] / safe > 0.25, "el",
                                   latin_pred))))
    return pa.array(pred.astype(object), pa.string())


def lang_id(sf_dir: str) -> rd.Dataset:
    """doc_id -> predicted language (full DuckDB value oracle)."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def batch(t: pa.Table) -> pa.Table:
        # NULL text -> NULL prediction (the twin's NULL propagation);
        # '' -> 'und' like any other token-free text
        valid = pc.is_valid(t["text"])
        preds = classify_langs_batch(pc.fill_null(t["text"], ""))
        return pa.table({"doc_id": t["doc_id"],
                         "pred_lang": pc.if_else(
                             valid, preds, pa.scalar(None, pa.string()))})

    return ds.map_batches(batch, batch_format="pyarrow")


# token -> md5-low-8-bytes hash, memoized per worker, bounded (ADVICE r2:
# open vocabularies must not grow a long-lived worker cache without limit).
# md5 (not blake2b) so the DuckDB twin can compute the identical value:
# ('0x' || substr(md5(t), 17, 16))::UBIGINT.
_MD5_CACHE_MAX = 4_000_000
_md5_cache: dict[str, int] = {}


def md5_u64(s: str) -> int:
    """Low 8 bytes of md5 as uint64 — the SQL-reproducible token hash."""
    import hashlib
    cache = _md5_cache
    if len(cache) > _MD5_CACHE_MAX:
        cache.clear()
    v = cache.get(s)
    if v is None:
        v = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16],
                           "big")
        cache[s] = v
    return v


def doc_fingerprints(sf_dir: str, window: int = 8) -> rd.Dataset:
    """Rolling-hash document fingerprint (winnowing-style, deterministic).

    Token stream -> md5-low8 token hashes -> rolling window of ``window``
    tokens XOR-combined -> fingerprint = min windowed hash (robust to small
    edits at the ends). Reuses the reference's content-fingerprint role
    (``src/storage/mod.rs:72-94``) at document granularity. Every step is
    exact integer arithmetic DuckDB can replicate, so the driver gets a
    full value-hash oracle.

    Vectorized (VERDICT r3 item 3): the whole batch's token stream is
    flattened once with Arrow kernels and dictionary-encoded, so md5 runs
    once per DISTINCT token per block (memoized across blocks in the
    per-worker cache) instead of once per token occurrence; the rolling XOR
    and per-document min are segmented numpy over the flat stream. Task
    pool, no fixed concurrency cap (the r3 ``concurrency=(1, 4)`` starved a
    32-CPU session).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])
    mask = np.uint64(0x7FFF_FFFF_FFFF_FFFF)

    def batch_fp(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lower = pc.utf8_lower(text)
        # findall(TOKEN_RE) == split on the complement and drop empties
        lists = pc.split_pattern_regex(lower, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists).to_numpy(
            zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parents = parents[keep.to_numpy(zero_copy_only=False)]

        # md5 once per distinct token in this block (memoized per worker)
        enc = flat.dictionary_encode()
        vocab_h = np.array([md5_u64(s) for s in enc.dictionary.to_pylist()],
                           dtype=np.uint64)
        hs = (vocab_h[enc.indices.to_numpy(zero_copy_only=False)]
              if len(vocab_h) else np.zeros(0, np.uint64))

        # segment geometry over the flat token stream (parents are sorted)
        tok_counts = np.bincount(parents, minlength=n_docs).astype(np.int64)
        starts_all = np.nonzero(np.r_[True, parents[1:] != parents[:-1]])[0] \
            if len(parents) else np.zeros(0, np.int64)
        seg_len = tok_counts[tok_counts > 0]
        rank = (np.arange(len(hs), dtype=np.int64)
                - np.repeat(starts_all, seg_len)) if len(hs) else \
            np.zeros(0, np.int64)

        # rolling XOR of `window` consecutive hashes (global; windows that
        # would cross a document boundary are exactly the masked tail ranks)
        combined = hs.copy()
        for off in range(1, window):
            if off < len(hs):
                combined[:-off] ^= hs[off:]
        umax = np.uint64(0xFFFF_FFFF_FFFF_FFFF)
        tail = rank > np.repeat(seg_len, seg_len) - window
        combined[tail] = umax

        fp = np.zeros(n_docs, dtype=np.uint64)
        if len(hs):
            docs_with_toks = parents[starts_all]
            min_hs = np.minimum.reduceat(hs, starts_all)
            min_comb = np.minimum.reduceat(combined, starts_all)
            short = seg_len < window  # all-masked: fall back to min token
            fp[docs_with_toks] = np.where(short, min_hs, min_comb)
        # tokenless docs: whole-text hash (non-empty) or 0 (empty);
        # NULL text -> NULL fingerprint (the twin's NULL propagation)
        no_tok = tok_counts == 0
        if no_tok.any():
            texts = text.to_pylist()
            for i in np.nonzero(no_tok)[0]:
                s = texts[i]
                fp[i] = np.uint64(md5_u64(s)) if s else np.uint64(0)
        nullm = pc.invert(pc.is_valid(text)).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "fingerprint": pa.array((fp & mask).astype(np.int64),
                                    pa.int64(), mask=nullm),
        })

    return ds.map_batches(batch_fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Training-data hygiene ops (PII scrub, benchmark decontamination)
# ---------------------------------------------------------------------------

# RE2-compatible patterns (identical semantics in Arrow and DuckDB):
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9\-() ]{7,}[0-9]"


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """Redact emails/phone-shaped spans; report per-doc hit counts.

    A pure vectorized RE2 pass (count + global replace) — the shape of a
    real pre-training PII pass. Both kernels run the same RE2 engine DuckDB
    uses, so the op is oracle-checked end to end including the rewritten
    text. Output: doc_id, n_emails, n_phones, text_clean.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        text = t["text"]
        n_email = pc.cast(pc.count_substring_regex(text, pattern=EMAIL_RE),
                          pa.int64())
        cleaned = pc.replace_substring_regex(text, pattern=EMAIL_RE,
                                             replacement="[EMAIL]")
        n_phone = pc.cast(pc.count_substring_regex(cleaned, pattern=PHONE_RE),
                          pa.int64())
        cleaned = pc.replace_substring_regex(cleaned, pattern=PHONE_RE,
                                             replacement="[PHONE]")
        return pa.table({"doc_id": t["doc_id"], "n_emails": n_email,
                         "n_phones": n_phone, "text_clean": cleaned})

    return ds.map_batches(scrub, batch_format="pyarrow")


DEFAULT_PROBES = ("vector database", "query plan", "machine learning",
                  "data pipeline", "neural network")


def benchmark_contamination(sf_dir: str,
                            probes: tuple[str, ...] = DEFAULT_PROBES
                            ) -> rd.Dataset:
    """Benchmark-decontamination check: per-doc hit count against a probe
    phrase set (the eval-set n-grams you must not train on).

    The probe set is the broadcast small side (here literal constants); each
    probe is one vectorized substring containment over the lowercased text.
    Output: doc_id, n_probe_hits, contaminated (0/1).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def check(t: pa.Table) -> pa.Table:
        low = pc.utf8_lower(t["text"])
        hits = None
        for p in probes:
            h = pc.cast(pc.match_substring(low, pattern=p), pa.int64())
            hits = h if hits is None else pc.add(hits, h)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_probe_hits": pc.cast(hits, pa.int64()),
            "contaminated": pc.cast(pc.greater(hits, 0), pa.int64()),
        })

    return ds.map_batches(check, batch_format="pyarrow")


def ngram_counts(sf_dir: str, k: int = 20) -> pa.Table:
    """Corpus-wide top-k word bigrams: (ngram, n), n desc then ngram asc.

    The canonical partial-aggregation shape for an unbounded key space:
    bigram formation and per-block counting are fully vectorized (split ->
    flatten -> adjacent-pair join inside each row via parent indices — the
    same zero-Python "findall" machinery as
    :func:`sema_ray.extract.detect_mentions_batch`), the shuffle moves one
    row per distinct bigram per block, and the top-k tail is a per-block
    local top-k + bounded driver merge, never a global sort. Deterministic
    total order (n desc, ngram asc) keeps the k-boundary oracle-exact.
    """
    from .util import collect_table
    ds = _load_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"ngram": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        # empty pieces sit at row edges only, so after _word_stream drops
        # them, adjacency within a row is adjacency in the filtered arrays
        toks, par = _word_stream(t)
        if toks is None or len(par) < 2:
            return empty
        left = np.nonzero(par[1:] == par[:-1])[0]
        if len(left) == 0:
            return empty
        a = toks.take(pa.array(left, pa.int64()))
        b = toks.take(pa.array(left + 1, pa.int64()))
        grams = pc.binary_join_element_wise(a, b, " ")
        vc = grams.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"ngram": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    agg = partials.groupby("ngram").aggregate(Sum("n", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        return t.sort_by([("n", "descending"),
                          ("ngram", "ascending")]).slice(0, k)

    tbl = collect_table(agg.map_batches(local_topk, batch_format="pyarrow",
                                        batch_size=None))
    if tbl.num_rows == 0 or "ngram" not in tbl.column_names:
        return pa.table({"ngram": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    tbl = tbl.sort_by([("n", "descending"), ("ngram", "ascending")]) \
        .slice(0, k)
    return pa.table({"ngram": pc.cast(tbl["ngram"], pa.string()),
                     "n": pc.cast(tbl["n"], pa.int64())})


def word_counts(sf_dir: str, min_freq: int = 1,
                max_words: int = 1 << 20) -> pa.Table:
    """Corpus-wide word frequencies: (word, n), n desc then word asc.

    The distributed half of BPE training (and a useful operator on its
    own): per-block ``value_counts`` partials -> one groupby Sum shuffle ->
    per-block local top-``max_words`` -> bounded driver merge. The driver
    never sees more than ``max_words`` rows per block, so the collect is
    bounded even on an open-vocabulary corpus (the tail below ``min_freq``
    can't win a merge anyway — the standard frequency-threshold cap)."""
    from .util import collect_table
    ds = _load_docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"word": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        toks, _par = _word_stream(t)
        if toks is None:
            return empty
        vc = toks.value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    def recombine(t: pa.Table) -> pa.Table:
        # coalescing no-shuffle combine: every natural-language block emits
        # most of the common vocabulary, so without this the sort-shuffle
        # sees O(blocks x vocab) rows (CLAUDE.md partial-aggregation edge)
        g = t.group_by(["word"]).aggregate([("n", "sum")])
        return g.rename_columns(["word", "n"])

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None) \
        .map_batches(recombine, batch_format="pyarrow",
                     batch_size=1 << 21) \
        .groupby("word").aggregate(Sum("n", alias_name="n"))

    def local_cap(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n"], min_freq))
        return t.sort_by([("n", "descending"),
                          ("word", "ascending")]).slice(0, max_words)

    tbl = collect_table(agg.map_batches(local_cap, batch_format="pyarrow",
                                        batch_size=None))
    if tbl.num_rows == 0 or "word" not in tbl.column_names:
        return pa.table({"word": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    tbl = tbl.sort_by([("n", "descending"), ("word", "ascending")]) \
        .slice(0, max_words)
    return pa.table({"word": pc.cast(tbl["word"], pa.string()),
                     "n": pc.cast(tbl["n"], pa.int64())})


def tfidf_top_terms(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Per-document tf-idf featurization: (doc_id, term, tfidf) for each
    document's top-``k`` terms (tfidf = tf x ln(N/df); rank by rounded
    score desc then term asc — deterministic, oracle-exact k-boundary).

    Two passes, both corpus-sized work vectorized:

    1. document frequencies: per-block doc-distinct term partials -> one
       groupby Sum shuffle (term-vocabulary sized); the (term, df) map
       broadcasts as sorted arrays in the task closure (the
       ``assign_reps`` shape — same documented small-side boundary as the
       flagship's canonical vocabulary).
    2. per-block scoring: (row, term) counts via one np.unique over packed
       keys, df lookup via searchsorted, segmented per-row top-k (the
       distributed-top-k run-start trick) — no per-doc Python.

    The score crosses the DuckDB-oracle boundary, so it rounds via the
    half-up floor form (ties at the k-boundary rank on the ROUNDED value
    on both engines)."""
    from .util import collect_table
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    _tok = _word_stream

    def df_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"term": pa.array([], pa.string()),
                          "df": pa.array([], pa.int64())})
        toks, par = _tok(t)
        if toks is None:
            return empty
        enc = toks.dictionary_encode()
        tid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nv = len(enc.dictionary)
        uniq = np.unique(par * nv + tid)
        vals, counts = np.unique(uniq % nv, return_counts=True)
        return pa.table({
            "term": enc.dictionary.take(pa.array(vals, pa.int64())),
            "df": pa.array(counts, pa.int64())})

    def df_recombine(t: pa.Table) -> pa.Table:
        # coalescing combine before the term shuffle (same vocabulary-
        # cardinality edge as word_counts)
        g = t.group_by(["term"]).aggregate([("df", "sum")])
        return g.rename_columns(["term", "df"])

    dft = collect_table(
        ds.map_batches(df_partial, batch_format="pyarrow",
                       batch_size=None)
        .map_batches(df_recombine, batch_format="pyarrow",
                     batch_size=1 << 21)
        .groupby("term").aggregate(Sum("df", alias_name="df")))
    empty_out = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string()),
                          "tfidf": pa.array([], pa.float64())})
    if dft.num_rows == 0 or "term" not in dft.column_names:
        return rd.from_arrow(empty_out)
    df_term_arr = pc.cast(dft["term"], pa.string()).combine_chunks()
    df_vals = dft["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    n_docs = float(_load_docs(sf_dir, ["doc_id"]).count())

    class Score:
        """The (term, df) map rides in the task closure — cached per
        worker (the cheap small-broadcast task-pool pattern). All
        per-batch string work (df lookup, lexicographic tie-rank) runs on
        the BATCH VOCABULARY via Arrow hash/sort kernels, never per token
        or per (doc, term)."""

        def __init__(self, terms_: pa.Array, dfs_: np.ndarray, n_: float):
            self.terms, self.dfs, self.n = terms_, dfs_, n_

        def __call__(self, t: pa.Table) -> pa.Table:
            toks, par = _tok(t)
            if toks is None:
                return empty_out
            ids = pc.cast(t["doc_id"], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            enc = toks.dictionary_encode()
            tid = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            nv = len(enc.dictionary)
            keys, tf = np.unique(par * nv + tid, return_counts=True)
            row, term_i = keys // nv, keys % nv
            # per-vocab df via one hash lookup; per-vocab lexicographic
            # rank via one C++ sort — both nv-sized
            pos = pc.index_in(enc.dictionary, value_set=self.terms) \
                .to_numpy(zero_copy_only=False)
            df_of_vocab = self.dfs[pos]
            dfv = df_of_vocab[term_i]
            # numpy form of util.round_half_up — identical IEEE op order
            # to the DuckDB twin's FLOOR(x * 1e6 + 0.5) / 1e6
            score = np.floor(tf.astype(np.float64) * np.log(self.n / dfv)
                             * 1e6 + 0.5) / 1e6
            term_rank = np.empty(nv, dtype=np.int64)
            term_rank[pc.sort_indices(enc.dictionary)
                      .to_numpy(zero_copy_only=False)] = np.arange(nv)
            order = np.lexsort((term_rank[term_i], -score, row))
            row_o = row[order]
            starts = np.r_[True, row_o[1:] != row_o[:-1]]
            run_start = np.maximum.accumulate(
                np.where(starts, np.arange(len(row_o)), 0))
            keep = (np.arange(len(row_o)) - run_start) < k
            sel = order[keep]
            return pa.table({
                "doc_id": pa.array(ids[row[sel]], pa.int64()),
                "term": pc.cast(enc.dictionary.take(
                    pa.array(term_i[sel], pa.int64())), pa.string()),
                "tfidf": pa.array(score[sel], pa.float64())})

    return ds.map_batches(Score(df_term_arr, df_vals, n_docs),
                          batch_format="pyarrow", batch_size=None)


def unigram_surprisal(sf_dir: str,
                      max_words: int = 1 << 22) -> rd.Dataset:
    """Per-document unigram-LM surprisal in whole bits — the CCNet-style
    perplexity quality signal (Wenzek et al. 2020) with the LM quantized
    so both engines do exact integer arithmetic: each token contributes
    its self-information ``floor(log2(N / c_w))`` bits (``c_w`` = the
    token's corpus count, ``N`` = corpus token total; for real x >= 1,
    ``floor(log2(x)) == floor(log2(floor(x)))``, so ``N // c_w`` keeps it
    integral — ``length(bin(N // c)) - 1`` in the DuckDB twin). Returns
    ``(doc_id, n_tok, bits, mean_bits)`` for documents with >= 1 token;
    low mean bits = predictable/repetitive text, high = rare-token text.

    Two passes: the bounded :func:`word_counts` shuffle builds the LM
    (a vocabulary-sized artifact, like CCNet's KenLM model — tokens past
    the ``max_words`` cap fall back to count 1, the OOV convention); then
    one stateless scoring pass with the model riding in the task closure.
    Per-block work is one ``index_in`` over the block vocabulary + two
    segmented bincounts — no per-token Python. Bit values are exact while
    ``N // c < 2**53`` (float64-exact integers, ~9e15 tokens)."""
    wc = word_counts(sf_dir, min_freq=1, max_words=max_words)
    empty_out = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tok": pa.array([], pa.int64()),
                          "bits": pa.array([], pa.int64()),
                          "mean_bits": pa.array([], pa.float64())})
    n_total = int(pc.sum(wc["n"]).as_py() or 0)
    if n_total == 0:
        return rd.from_arrow(empty_out)
    words = pc.cast(wc["word"], pa.string()).combine_chunks()
    counts = wc["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    # self-information per vocabulary entry, once on the driver:
    # floor(log2(v)) == frexp exponent - 1 for float64-exact integers
    bits_vocab = (np.frexp((n_total // counts).astype(np.float64))[1] - 1) \
        .astype(np.int64)
    oov_bits = np.int64(np.frexp(float(n_total))[1] - 1)  # count-1 fallback
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    class Score:
        def __init__(self, words_: pa.Array, bits_: np.ndarray):
            self.words, self.bits = words_, bits_

        def __call__(self, t: pa.Table) -> pa.Table:
            toks, par = _word_stream(t)
            if toks is None:
                return empty_out
            ids = pc.cast(t["doc_id"], pa.int64()) \
                .to_numpy(zero_copy_only=False)
            enc = toks.dictionary_encode()
            pos = pc.fill_null(
                pc.index_in(enc.dictionary, value_set=self.words), -1) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            vb = np.where(pos >= 0, self.bits[pos], oov_bits)
            tok_bits = vb[enc.indices.to_numpy(zero_copy_only=False)]
            n_docs = t.num_rows
            bits_doc = np.bincount(
                par, weights=tok_bits.astype(np.float64),
                minlength=n_docs).astype(np.int64)
            ntok_doc = np.bincount(par, minlength=n_docs).astype(np.int64)
            keep = ntok_doc > 0
            # numpy form of util.round_half_up — same IEEE op order as the
            # twin's FLOOR(CAST(bits AS DOUBLE) / n_tok * 1e4 + 0.5) / 1e4
            mean = np.floor(bits_doc[keep].astype(np.float64)
                            / ntok_doc[keep] * 1e4 + 0.5) / 1e4
            return pa.table({
                "doc_id": pa.array(ids[keep], pa.int64()),
                "n_tok": pa.array(ntok_doc[keep], pa.int64()),
                "bits": pa.array(bits_doc[keep], pa.int64()),
                "mean_bits": pa.array(mean, pa.float64())})

    return ds.map_batches(Score(words, bits_vocab),
                          batch_format="pyarrow", batch_size=None)


END_OF_WORD = "</w>"


def bpe_train_reference(word_freq: list[tuple[str, int]],
                        num_merges: int) -> list[tuple[str, str, int]]:
    """Pure-Python BPE merge loop (Sennrich, Haddow & Birch 2016) over a
    word-frequency table: repeatedly merge the most frequent adjacent
    symbol pair (ties broken lexicographically — deterministic).

    This IS the production tail of :func:`bpe_train_vocab`, not just a test
    oracle: after the distributed word count collapses the corpus to its
    frequency-weighted distinct-word table, the merge loop's cost is
    bounded by vocabulary size, not corpus size — the same small-side
    driver fold as the flagship's canonical vocabulary."""
    words: list[list[str]] = [list(w) + [END_OF_WORD] for w, _ in word_freq]
    freqs = [n for _, n in word_freq]
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in zip(words, freqs):
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                counts[pr] = counts.get(pr, 0) + n
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, best))
        joined = left + right
        for syms in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == left and syms[i + 1] == right:
                    syms[i:i + 2] = [joined]
                else:
                    i += 1
    return merges


def bpe_train_vocab(sf_dir: str, num_merges: int = 40,
                    min_freq: int = 2) -> pa.Table:
    """Distributed BPE tokenizer-vocabulary training over the documents
    table: (rank, left, right, freq) — the ordered merge list that defines
    the learned subword vocabulary.

    Standard two-phase shape (subword-nmt / HF trainers do the same): the
    corpus-sized work is ONE distributed word-count
    (:func:`word_counts` — per-block partials, one shuffle), and the
    iterative merge loop runs over the vocabulary-bounded frequency table.
    Deterministic: ties on pair frequency break lexicographically, so the
    merge list is a pure function of the corpus."""
    wc = word_counts(sf_dir, min_freq=min_freq)
    merges = bpe_train_reference(
        list(zip(wc["word"].to_pylist(),
                 wc["n"].to_pylist())), num_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "freq": pa.array([m[2] for m in merges], pa.int64()),
    })


def _bpe_segment_word(w: str,
                      rank_of: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-merge-first segmentation of one word (the
    reference BPE encoder loop)."""
    syms = list(w) + [END_OF_WORD]
    while len(syms) > 1:
        best_i, best_rank = -1, len(rank_of)
        for i in range(len(syms) - 1):
            r = rank_of.get((syms[i], syms[i + 1]))
            if r is not None and r < best_rank:
                best_i, best_rank = i, r
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_apply(texts: list[str], merges: list[tuple[str, str]]) -> list[list[str]]:
    """Segment texts with a trained merge list (rank order = priority),
    mirroring the reference encoder loop — used by the round-trip test."""
    import re as _re

    from .util import lower_utf8
    rank_of = {(l, r): i for i, (l, r) in enumerate(merges)}
    out = []
    for text in texts:
        toks: list[str] = []
        for w in _re.findall("[a-z0-9]+", lower_utf8(text)):
            toks.extend(_bpe_segment_word(w, rank_of))
        out.append(toks)
    return out


def bpe_encode_counts(sf_dir: str, num_merges: int = 40,
                      min_freq: int = 2) -> rd.Dataset:
    """Distributed BPE encoding pass: (doc_id, n_subwords) under the vocab
    trained by :func:`bpe_train_vocab` — the token-budget accounting a
    training pipeline runs after learning its tokenizer.

    The merge list is the broadcast small side (task closure). Per batch,
    the greedy encoder runs ONCE PER DISTINCT WORD (dictionary-encode,
    memoized per worker via a bounded cache); per-document subword totals
    are one ``np.bincount`` over the encoded indices — never per-token
    Python."""
    vocab_tbl = bpe_train_vocab(sf_dir, num_merges=num_merges,
                                min_freq=min_freq)
    merges = list(zip(vocab_tbl["left"].to_pylist(),
                      vocab_tbl["right"].to_pylist()))
    rank_of = {pair: i for i, pair in enumerate(merges)}

    class Encode:
        """rank_of rides in the task closure (cached per worker); the
        per-distinct-word segment cache is per-instance and bounded by
        the batch vocabulary."""

        def __init__(self, rank_of_: dict):
            self.rank_of = rank_of_
            self.cache: dict[str, int] = {}

        def _n_subwords(self, w: str) -> int:
            n = self.cache.get(w)
            if n is None:
                n = len(_bpe_segment_word(w, self.rank_of))
                if len(self.cache) < (1 << 20):
                    self.cache[w] = n
            return n

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = pc.cast(t["doc_id"], pa.int64())
            toks, par = _word_stream(t)
            n = np.zeros(t.num_rows, dtype=np.int64)
            if toks is not None:
                enc = toks.dictionary_encode()
                per_word = np.fromiter(
                    (self._n_subwords(w)
                     for w in enc.dictionary.to_pylist()),
                    dtype=np.int64, count=len(enc.dictionary))
                weights = per_word[
                    enc.indices.to_numpy(zero_copy_only=False)]
                np.add.at(n, par, weights)
            return pa.table({"doc_id": ids,
                             "n_subwords": pa.array(n, pa.int64())})

    ds = _load_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(Encode(rank_of), batch_format="pyarrow",
                          batch_size=None)


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Within-document repetition signals (Gopher-style quality rules):
    (doc_id, n_tokens, n_distinct_tokens, n_bigrams, n_distinct_bigrams).

    All-integer outputs (the duplicate-token/-bigram FRACTIONS the filter
    thresholds use are ratios of these), so the DuckDB twin is bit-exact.
    Fully vectorized per batch: split -> flatten -> dictionary-encode, then
    distinct counting is a lexsort + adjacent-dedup over (row, code) pairs
    and bigrams pack two 32-bit codes into one int64 key — no Python loop.
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        rows = t.num_rows
        toks, par = _word_stream(t)
        n_tok = np.zeros(rows, dtype=np.int64)
        n_dtok = np.zeros(rows, dtype=np.int64)
        n_big = np.zeros(rows, dtype=np.int64)
        n_dbig = np.zeros(rows, dtype=np.int64)
        if toks is not None:
            enc = toks.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            np.add.at(n_tok, par, 1)

            def distinct_per_row(keys: np.ndarray,
                                 rows_of: np.ndarray) -> np.ndarray:
                order = np.lexsort((keys, rows_of))
                r, k = rows_of[order], keys[order]
                first = np.r_[True, (r[1:] != r[:-1]) | (k[1:] != k[:-1])]
                out = np.zeros(rows, dtype=np.int64)
                np.add.at(out, r[first], 1)
                return out

            n_dtok = distinct_per_row(codes, par)
            left = np.nonzero(par[1:] == par[:-1])[0]
            if len(left):
                big = (codes[left] << np.int64(32)) | codes[left + 1]
                np.add.at(n_big, par[left], 1)
                n_dbig = distinct_per_row(big, par[left])
        # NULL text: the twin's list kernels propagate NULL into every
        # count except n_bigrams, whose GREATEST(len-1, 0) ignores the
        # NULL operand and yields 0
        nt = pc.invert(pc.is_valid(t["text"])).to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64(), mask=nt),
            "n_distinct_tokens": pa.array(n_dtok, pa.int64(), mask=nt),
            "n_bigrams": pa.array(n_big, pa.int64()),
            "n_distinct_bigrams": pa.array(n_dbig, pa.int64(), mask=nt),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def _gram_strings(t: pa.Table, n: int):
    """Vectorized word n-grams over a batch: ``(grams, gram_parents)`` —
    one space-joined string per token position that starts an n-run inside
    a single document — or ``(None, None)`` when the batch has none. Built
    from :func:`_word_stream` (the pinned tokenization) with n shifted
    takes + one ``binary_join_element_wise``; zero per-row Python."""
    toks, par = _word_stream(t)
    if toks is None or len(par) < n:
        return None, None
    starts = np.nonzero(par[:len(par) - n + 1] == par[n - 1:])[0]
    if len(starts) == 0:
        return None, None
    parts = [toks.take(pa.array(starts + j, pa.int64())) for j in range(n)]
    return pc.binary_join_element_wise(*parts, " "), par[starts]


def ngram_decontaminate(sf_dir: str, n: int = 5,
                        bench_mod: int = 97) -> rd.Dataset:
    """Benchmark decontamination by n-gram overlap (the GPT-3 rule, Brown
    et al. 2020 appendix C — 13-grams there, ``n`` here): flag every
    training document sharing any word n-gram with the held-out benchmark
    slice (``doc_id % bench_mod == 0`` stands in for the eval corpus).

    Pass 1 extracts the benchmark's DISTINCT n-grams — the small side by
    definition (eval sets are fixed-size; the gram set is bounded by
    benchmark tokens, never corpus tokens) — via per-block vectorized gram
    partials folded on the driver. The set ships in the task closure
    (cached per worker process); pass 2 is one stateless vectorized
    ``is_in`` + bincount per batch over the training side. Output
    (non-benchmark docs only): doc_id, n_hits (overlapping gram positions
    matching the benchmark set), contaminated (0/1).
    """
    from .util import collect_table
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def bench_partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"gram": pa.array([], pa.string())})
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % bench_mod == 0)[0]
        if len(sel) == 0:
            return empty
        grams, _ = _gram_strings(t.take(pa.array(sel, pa.int64())), n)
        if grams is None:
            return empty
        return pa.table({"gram": pc.unique(grams)})

    bench_tbl = collect_table(ds.map_batches(
        bench_partial, batch_format="pyarrow", batch_size=None))
    bench = (pc.unique(bench_tbl["gram"]) if bench_tbl.num_rows
             else pa.array([], pa.string()))

    def flag(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t2 = t.take(pa.array(np.nonzero(ids % bench_mod != 0)[0], pa.int64()))
        nh = np.zeros(t2.num_rows, dtype=np.int64)
        if t2.num_rows and len(bench):
            grams, gpar = _gram_strings(t2, n)
            if grams is not None:
                hit = pc.is_in(grams, value_set=bench) \
                    .to_numpy(zero_copy_only=False)
                nh = np.bincount(gpar[hit],
                                 minlength=t2.num_rows).astype(np.int64)
        return pa.table({
            "doc_id": t2["doc_id"],
            "n_hits": pa.array(nh, pa.int64()),
            "contaminated": pa.array((nh > 0).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(sf_dir: str, min_words: int = 50,
                          max_words: int = 100_000) -> rd.Dataset:
    """The Gopher document-quality rules (Rae et al. 2021, appendix A1.1)
    as one stateless vectorized pass, each rule recast as EXACT integer
    arithmetic so the DuckDB twin is bit-identical (no float ratios):

    - word count in [min_words, max_words];
    - mean word length in [3, 10]   -> 3*n_words <= n_token_chars <= 10*n_words;
    - hash-to-word ratio <= 0.1 AND ellipsis-to-word ratio <= 0.1 (each
      symbol tested separately, as in the paper) -> 10*n_hash <= n_words
      AND 10*n_ellipsis <= n_words;
    - >= 80% words contain a letter -> 5*n_letter_words >= 4*n_words
      (letter words = tokens that are not all-digit);
    - >= 2 distinct Gopher stopwords present.

    Output: doc_id, n_words, one 0/1 column per rule, pass (AND of all).
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    def rules(t: pa.Table) -> pa.Table:
        return _gopher_rules_batch(t, min_words, max_words)

    return ds.map_batches(rules, batch_format="pyarrow")


def _gopher_rules_batch(t: pa.Table, min_words: int,
                        max_words: int) -> pa.Table:
    """Per-batch kernel of :func:`gopher_quality_filter` (module-level so
    the hypothesis property test can drive it directly)."""
    text = t["text"]
    # NULL text: counts run over '' but the twin's NULL propagation marks
    # the metric columns NULL; ok_stopwords and pass stay 0 (n_stop is 0
    # and NULL AND FALSE = FALSE in SQL)
    tvalid = pc.is_valid(text).to_numpy(zero_copy_only=False)
    text = pc.fill_null(text, "")
    low = pc.utf8_lower(text)
    n_hash = pc.count_substring(text, pattern="#") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_ell = pc.count_substring(text, pattern="...") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    # one tokenization pass feeds word count, token-char total and the
    # digit-token count (no second full-text RE2 scan for any of them)
    n_words = np.zeros(t.num_rows, dtype=np.int64)
    n_tokchars = np.zeros(t.num_rows, dtype=np.int64)
    n_digit_tok = np.zeros(t.num_rows, dtype=np.int64)
    toks, par = _word_stream(t)
    if toks is not None:
        n_words = np.bincount(par, minlength=t.num_rows) \
            .astype(np.int64)
        tok_len = pc.utf8_length(toks).to_numpy(zero_copy_only=False)
        n_tokchars = np.bincount(par, weights=tok_len,
                                 minlength=t.num_rows).astype(np.int64)
        dig = pc.match_substring_regex(toks, pattern="^[0-9]+$") \
            .to_numpy(zero_copy_only=False)
        n_digit_tok = np.bincount(par[dig], minlength=t.num_rows) \
            .astype(np.int64)
    norm = pc.binary_join_element_wise(
        " ", pc.replace_substring_regex(low, pattern="[^a-z0-9]+",
                                        replacement="  "), " ", "")
    n_stop = np.zeros(t.num_rows, dtype=np.int64)
    for w in GOPHER_STOPWORDS:
        n_stop += pc.match_substring(norm, pattern=f" {w} ") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_mean = (3 * n_words <= n_tokchars) & (n_tokchars <= 10 * n_words)
    ok_sym = (10 * n_hash <= n_words) & (10 * n_ell <= n_words)
    ok_alpha = 5 * (n_words - n_digit_tok) >= 4 * n_words
    ok_stop = n_stop >= 2
    ok = ok_wc & ok_mean & ok_sym & ok_alpha & ok_stop

    def i64(a):
        return pa.array(a.astype(np.int64), pa.int64())

    def i64m(a):  # NULL for NULL-text rows (twin NULL propagation)
        return pa.array(a.astype(np.int64), pa.int64(), mask=~tvalid)

    return pa.table({
        "doc_id": t["doc_id"],
        "n_words": i64m(n_words),
        "ok_word_count": i64m(ok_wc),
        "ok_mean_word_len": i64m(ok_mean),
        "ok_symbol_ratio": i64m(ok_sym),
        "ok_alpha_words": i64m(ok_alpha),
        "ok_stopwords": i64(ok_stop),
        "pass": i64(ok & tvalid),
    })
