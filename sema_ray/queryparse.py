"""Text-query language: the subset of Tantivy's QueryParser the reference
exposes through its BM25 path (``/root/reference/src/storage/
text_indexer.rs:78-82`` — Tantivy ``QueryParser::parse_query`` over the
content field).

Supported grammar (Tantivy's default-field semantics):

- bare terms          -> SHOULD clauses, BM25-scored;
- ``"quoted phrase"`` -> phrase clause: the exact token sequence must occur
  (adjacent, in order) — scored like its terms;
- ``+term`` / ``+"p"``-> MUST clause (document filtered out unless present);
- ``-term`` / ``-"p"``-> MUST_NOT clause (document filtered out if present);
- ``content:term`` / ``content:"p"`` -> explicit field addressing of the
  single indexed field (identical to the bare form — the reference indexes
  one content field); any OTHER field name raises ``ValueError``, matching
  Tantivy's ``FieldDoesNotExist`` parse error;
- ``term^2`` / ``"p"^1.5`` -> clause boost (Tantivy/Lucene: the clause's
  score contribution is multiplied by the boost);
- ``[a TO b]`` / ``{a TO b}`` -> term range clause: matches documents
  containing any token lexicographically within the bounds (``[``/``]``
  inclusive, ``{``/``}`` exclusive, ``*`` = open end). Like
  Lucene/Tantivy range queries it is CONSTANT-scored: a matching document
  gains ``boost * 1.0``, term statistics don't apply.

Like Tantivy, a query with only MUST/MUST_NOT clauses matches on the
filters alone, and a term appearing in several scoring clauses
contributes one summand per clause — duplicate clauses SUM (Lucene
``BooleanQuery`` semantics; ``alpha alpha^2`` scores with effective
boost 3.0).
"""

from __future__ import annotations

import re
from typing import NamedTuple

CONTENT_FIELD = "content"  # the reference's single indexed field

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# +/- prefix, optional field:, then a [a TO b] range, a quoted phrase, or
# a bare word (ranges/phrases take their ^boost in-pattern; word boosts
# split in post-processing)
_CLAUSE_RE = re.compile(
    r'([+-]?)(?:([A-Za-z_][A-Za-z0-9_]*):)?'
    r'(?:([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])(?:\^([0-9]+(?:\.[0-9]+)?))?'
    r'|"([^"]*)"(?:\^([0-9]+(?:\.[0-9]+)?))?'
    r'|(\S+))')
_WORD_BOOST_RE = re.compile(r'^(.*?)\^([0-9]+(?:\.[0-9]+)?)$')


class Clause(NamedTuple):
    occur: str            # "should" | "must" | "must_not"
    terms: tuple[str, ...]  # tokenized; len > 1 => phrase (adjacent, in order)
    boost: float = 1.0
    # term-range clauses: terms == () and (lo, hi) bound the token range
    # (None = open end); *_incl distinguishes [inclusive] from {exclusive}
    lo: str | None = None
    hi: str | None = None
    lo_incl: bool = True
    hi_incl: bool = True

    @property
    def is_range(self) -> bool:
        return not self.terms and (self.lo is not None
                                   or self.hi is not None)


class ParsedQuery(NamedTuple):
    should: tuple[Clause, ...]
    must: tuple[Clause, ...]
    must_not: tuple[Clause, ...]

    @property
    def scoring_terms(self) -> tuple[str, ...]:
        """Distinct sorted terms that contribute to the BM25 score
        (Tantivy scores SHOULD and MUST clauses, never MUST_NOT)."""
        out = set()
        for c in self.should + self.must:
            out.update(c.terms)
        return tuple(sorted(out))


def parse(query: str) -> ParsedQuery:
    should: list[Clause] = []
    must: list[Clause] = []
    must_not: list[Clause] = []
    for (sign, field, lbr, rlo, rhi, rbr, rboost,
         phrase, pboost, word) in _CLAUSE_RE.findall(query):
        if field and field != CONTENT_FIELD:
            raise ValueError(
                f"field does not exist: '{field}' (the index has one "
                f"field: '{CONTENT_FIELD}')")
        boost = 1.0
        if lbr:

            def bound(raw: str) -> str | None:
                toks = _TOKEN_RE.findall(raw.lower())
                return toks[0] if toks else None  # '*' / empty = open end

            lo, hi = bound(rlo), bound(rhi)
            if lo is None and hi is None:
                continue  # [* TO *] matches everything — a no-op clause
            clause = Clause("should", (), float(rboost) if rboost else 1.0,
                            lo=lo, hi=hi, lo_incl=(lbr == "["),
                            hi_incl=(rbr == "]"))
            if sign == "+":
                must.append(clause._replace(occur="must"))
            elif sign == "-":
                must_not.append(clause._replace(occur="must_not"))
            else:
                should.append(clause)
            continue
        if phrase:
            raw = phrase
            if pboost:
                boost = float(pboost)
        else:
            raw = word
            m = _WORD_BOOST_RE.match(raw)
            if m:
                raw, boost = m.group(1), float(m.group(2))
        terms = tuple(_TOKEN_RE.findall(raw.lower()))
        if not terms:
            continue
        if sign == "+":
            must.append(Clause("must", terms, boost))
        elif sign == "-":
            must_not.append(Clause("must_not", terms, boost))
        else:
            should.append(Clause("should", terms, boost))
    return ParsedQuery(tuple(should), tuple(must), tuple(must_not))


def clause_pattern(clause: Clause) -> str:
    """The literal a clause matches in double-space-normalized text (see
    ``simsearch.bm25_search``): tokens joined by the two-space separator.
    Range clauses have no literal — match them on the token stream."""
    if not clause.terms:
        raise ValueError("range/empty clause has no literal pattern")
    return " " + "  ".join(clause.terms) + " "
