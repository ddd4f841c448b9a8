"""Text-query language: the subset of Tantivy's QueryParser the reference
exposes through its BM25 path (``/root/reference/src/storage/
text_indexer.rs:78-82`` — Tantivy ``QueryParser::parse_query`` over the
content field).

Supported grammar (Tantivy's default-field semantics):

- bare terms          -> SHOULD clauses, BM25-scored;
- ``"quoted phrase"`` -> phrase clause: the exact token sequence must occur
  (adjacent, in order) — scored like its terms;
- ``+term`` / ``+"p"``-> MUST clause (document filtered out unless present);
- ``-term`` / ``-"p"``-> MUST_NOT clause (document filtered out if present).

Tantivy's field:term / ranges / boosts are out of scope: the reference only
ever queries one field (``content``), never uses boosts, so those
productions are unreachable reference behavior. Like Tantivy, a query with
only MUST/MUST_NOT clauses matches on the filters alone.
"""

from __future__ import annotations

import re
from typing import NamedTuple

_TOKEN_RE = re.compile(r"[a-z0-9]+")
# +/- prefix, then either a quoted phrase or a bare word
_CLAUSE_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


class Clause(NamedTuple):
    occur: str            # "should" | "must" | "must_not"
    terms: tuple[str, ...]  # tokenized; len > 1 => phrase (adjacent, in order)


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
    for sign, phrase, word in _CLAUSE_RE.findall(query):
        raw = phrase if phrase else word
        terms = tuple(_TOKEN_RE.findall(raw.lower()))
        if not terms:
            continue
        if sign == "+":
            must.append(Clause("must", terms))
        elif sign == "-":
            must_not.append(Clause("must_not", terms))
        else:
            should.append(Clause("should", terms))
    return ParsedQuery(tuple(should), tuple(must), tuple(must_not))


def clause_pattern(clause: Clause) -> str:
    """The literal a clause matches in double-space-normalized text (see
    ``simsearch.bm25_search``): tokens joined by the two-space separator."""
    return " " + "  ".join(clause.terms) + " "
