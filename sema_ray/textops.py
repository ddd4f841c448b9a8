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

    Partial-aggregated per batch before the (tiny) global groupby.
    """
    ds = _load_docs(sf_dir, ["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        tok = pc.cast(pc.count_substring_regex(t["text"], pattern=TOKEN_RE),
                      pa.int64())
        g = pa.table({"lang": t["lang"], "tok": tok, "one": pa.array(
            np.ones(t.num_rows, dtype=np.int64))})
        a = g.group_by(["lang"]).aggregate([("tok", "sum"), ("one", "sum")])
        return pa.table({"lang": a["lang"], "n_tokens": a["tok_sum"],
                         "n_docs": a["one_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
    )


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
        n = pc.cast(pc.count_substring_regex(t["text"],
                                             pattern=BPE_TOKEN_RE),
                    pa.int64())
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_tokens_bpe": pc.fill_null(n, 0)})

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


class LangIdStage:
    """Actor-pool language identifier (n-gram/stopword heuristic + script).

    Profiles are built once per actor in ``__init__`` (reference stateful-
    stage pattern, SURVEY §2 T1). CJK / Cyrillic / Greek scripts are decided
    by codepoint ranges; Latin-script languages by stopword votes with a
    deterministic tie-break (marker order, then "en").
    """

    def __init__(self):
        self.markers = {lang: set(words) for lang, words in _LANG_MARKERS.items()}

    @staticmethod
    def _script(text: str) -> str | None:
        cjk = cyr = greek = latin = 0
        for ch in text[:2000]:
            o = ord(ch)
            if 0x4E00 <= o <= 0x9FFF or 0x3040 <= o <= 0x30FF:
                cjk += 1
            elif 0x0400 <= o <= 0x04FF:
                cyr += 1
            elif 0x0370 <= o <= 0x03FF:
                greek += 1
            elif (0x41 <= o <= 0x7A) or (0xC0 <= o <= 0x17F):
                latin += 1
        total = cjk + cyr + greek + latin
        if total == 0:
            return "und"
        if cjk / total > 0.25:
            return "zh"
        if cyr / total > 0.25:
            return "ru"
        if greek / total > 0.25:
            return "el"
        return None  # latin: decide by stopwords

    def classify(self, text: str) -> str:
        s = self._script(text)
        if s is not None:
            return s
        words = text.lower().split()[:400]
        best_lang, best_votes = "en", -1
        for lang, marks in self.markers.items():
            votes = sum(1 for w in words if w in marks)
            if votes > best_votes:
                best_lang, best_votes = lang, votes
        return best_lang if best_votes > 0 else "und"

    def __call__(self, t: pa.Table) -> pa.Table:
        preds = pa.array([self.classify(x) for x in t["text"].to_pylist()],
                         pa.string())
        return pa.table({"doc_id": t["doc_id"], "pred_lang": preds})


def lang_id(sf_dir: str) -> rd.Dataset:
    """doc_id -> predicted language (heuristic; rows-only driver check)."""
    ds = _load_docs(sf_dir, ["doc_id", "text"])
    return ds.map_batches(LangIdStage, batch_format="pyarrow",
                          concurrency=(1, 4))


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
    """
    ds = _load_docs(sf_dir, ["doc_id", "text"])

    class FingerprintStage:
        def __init__(self):
            import re
            self.tok = re.compile(TOKEN_RE)

        def fingerprint(self, text: str) -> int:
            toks = self.tok.findall(text.lower())
            if not toks:
                # non-ASCII-token text (CJK, Cyrillic, ...): whole-text hash
                # so distinct documents keep distinct fingerprints
                return md5_u64(text) & 0x7FFF_FFFF_FFFF_FFFF if text else 0
            hs = np.array([md5_u64(t) for t in toks], dtype=np.uint64)
            if len(hs) < window:
                acc = int(hs.min())
            else:
                # rolling min over XOR-combined windows, vectorized
                combined = hs.copy()
                for off in range(1, window):
                    combined[:-off] ^= np.roll(hs, -off)[:-off]
                acc = int(combined[: len(hs) - window + 1].min())
            return acc & 0x7FFF_FFFF_FFFF_FFFF

        def __call__(self, t: pa.Table) -> pa.Table:
            fps = pa.array([self.fingerprint(x) for x in t["text"].to_pylist()],
                           pa.int64())
            return pa.table({"doc_id": t["doc_id"], "fingerprint": fps})

    return ds.map_batches(FingerprintStage, batch_format="pyarrow",
                          concurrency=(1, 4))


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
        low = pc.utf8_lower(t["text"])
        parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        if len(flat) == 0:
            return empty
        parents = pc.list_parent_indices(parts) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # splitting leaves empty pieces at row edges only — drop them, then
        # adjacency within a row is adjacency in the filtered arrays
        keep = np.nonzero(pc.not_equal(flat, "")
                          .to_numpy(zero_copy_only=False))[0]
        if len(keep) < 2:
            return empty
        toks = flat.take(pa.array(keep, pa.int64()))
        par = parents[keep]
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
        low = pc.utf8_lower(t["text"])
        parts = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parents = pc.list_parent_indices(parts) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.nonzero(pc.not_equal(flat, "")
                          .to_numpy(zero_copy_only=False))[0]
        n_tok = np.zeros(rows, dtype=np.int64)
        n_dtok = np.zeros(rows, dtype=np.int64)
        n_big = np.zeros(rows, dtype=np.int64)
        n_dbig = np.zeros(rows, dtype=np.int64)
        if len(keep):
            toks = flat.take(pa.array(keep, pa.int64()))
            par = parents[keep]
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
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct_tokens": pa.array(n_dtok, pa.int64()),
            "n_bigrams": pa.array(n_big, pa.int64()),
            "n_distinct_bigrams": pa.array(n_dbig, pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")
