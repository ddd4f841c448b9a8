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
  score contribution is multiplied by the boost).

Term ranges ("[a TO b]") remain out of scope: unreachable through the
reference UI. Like Tantivy, a query with only MUST/MUST_NOT clauses
matches on the filters alone. One documented deviation: a term appearing
in several scoring clauses is scored once with the MAX clause boost (this
engine scores per distinct term; Tantivy would sum the duplicate clauses).
"""

from __future__ import annotations

import re
from typing import NamedTuple

CONTENT_FIELD = "content"  # the reference's single indexed field

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# +/- prefix, optional field:, then a quoted phrase (optionally ^boosted)
# or a bare word (word boosts split in post-processing)
_CLAUSE_RE = re.compile(
    r'([+-]?)(?:([A-Za-z_][A-Za-z0-9_]*):)?'
    r'(?:"([^"]*)"(?:\^([0-9]+(?:\.[0-9]+)?))?|(\S+))')
_WORD_BOOST_RE = re.compile(r'^(.*?)\^([0-9]+(?:\.[0-9]+)?)$')


class Clause(NamedTuple):
    occur: str            # "should" | "must" | "must_not"
    terms: tuple[str, ...]  # tokenized; len > 1 => phrase (adjacent, in order)
    boost: float = 1.0


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
    for sign, field, phrase, pboost, word in _CLAUSE_RE.findall(query):
        if field and field != CONTENT_FIELD:
            raise ValueError(
                f"field does not exist: '{field}' (the index has one "
                f"field: '{CONTENT_FIELD}')")
        boost = 1.0
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
    ``simsearch.bm25_search``): tokens joined by the two-space separator."""
    return " " + "  ".join(clause.terms) + " "
