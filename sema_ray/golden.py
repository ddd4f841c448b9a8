"""Pure-Python reference triple extractor (the P/R >= 0.95 oracle).

The reference repo has no extraction logic (it is a semantic *search* tool),
so per SURVEY.md §5.3 this module defines the deterministic rule-based
extractor that serves as the golden standard: it is run row-by-row, with no
Ray, over a transcript table, and the distributed pipeline
(:mod:`sema_ray.pipelines.kg`) must reproduce its (conv_id, turn_idx, subj,
pred, obj) triples.

The distributed stages import and apply these *same* pure functions per turn;
the P/R gate therefore verifies that the Ray plumbing (partitioning, shuffles,
ordering, dedup) neither drops nor duplicates nor reorders work — which is the
actual risk at 10^12-turn scale — rather than NLP quality.

Mention-span overlap resolution reuses the interval-merge idea of the
reference's highlighter (``/root/reference/src/tui/ui.rs:548-566``).
"""

from __future__ import annotations

import re
from typing import Iterable, NamedTuple

# A mention is a maximal run of Capitalized tokens (optionally containing
# digits/&/-), e.g. "Alice Chen", "ACME Corp", "Berlin". Dots are token
# breaks, so "Acme Corp." surfaces as "Acme Corp" (sentence-final periods
# never attach; the dotted spelling collapses at detection time and the
# casing/suffix variants are left for canonicalization).
_ENT = r"[A-Z][A-Za-z0-9&\-]*(?:[ ][A-Z][A-Za-z0-9&\-]*)*"
ENTITY_RE = re.compile(_ENT)

# Single capitalized words that are sentence-initial noise, never entities.
_CAP_STOP = frozenset(
    "The A An In On At It He She They We You I This That These Those "
    "Then So But And Or If When While Also Yes No OK Please Meanwhile "
    "However Next First Second Finally Now Here There What Why How Who".split()
)

# Relation patterns: (predicate, verb literal, regex with groups subj/obj,
# conf). The verb phrases are lowercase literals so the entity groups stay
# anchored; the literal doubles as a cheap containment pre-check (a pattern
# cannot match unless its verb literal occurs, since ENT never contains a
# space-adjacent boundary) — a pure optimization with identical output.
_P = [
    ("works_at", " works at ", 0.95),
    ("ceo_of", " is the CEO of ", 0.95),
    ("based_in", " is based in ", 0.9),
    ("located_in", " is located in ", 0.9),
    ("lives_in", " lives in ", 0.9),
    ("acquired", " acquired ", 0.9),
    ("founded", " founded ", 0.9),
    ("partnered_with", " partnered with ", 0.85),
    ("reports_to", " reports to ", 0.85),
    ("met_with", " met with ", 0.8),
    ("uses", " uses ", 0.7),
]
PATTERNS: list[tuple[str, str, re.Pattern[str], float]] = [
    (pred, verb,
     re.compile(rf"(?P<s>{_ENT}){verb}(?P<o>{_ENT})"), conf)
    for pred, verb, conf in _P
]


class Mention(NamedTuple):
    start: int  # char offset in the turn text
    end: int
    surface: str


class Triple(NamedTuple):
    subj: str
    pred: str
    obj: str
    conf: float


def _valid_mention(surface: str) -> bool:
    if " " not in surface and surface in _CAP_STOP:
        return False
    return len(surface) >= 2


def merge_intervals(spans: Iterable[tuple[int, int]]) -> list[tuple[int, int]]:
    """Merge overlapping [start, end) intervals (ref ``ui.rs:548-566``)."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


def detect_mentions(text: str) -> list[Mention]:
    """All entity mentions in one turn's text, in document order."""
    return [
        Mention(m.start(), m.end(), m.group())
        for m in ENTITY_RE.finditer(text)
        if _valid_mention(m.group())
    ]


def extract_triples(text: str) -> list[Triple]:
    """All (subj, pred, obj) relations in one turn's text.

    Deterministic: patterns are tried in fixed order; matches in document
    order; duplicates within one turn are deduplicated keeping the highest
    confidence (first occurrence wins on ties).
    """
    seen: dict[tuple[str, str, str], float] = {}
    order: list[tuple[str, str, str]] = []
    for pred, verb, rx, conf in PATTERNS:
        if verb not in text:  # literal pre-check; regex only on candidates
            continue
        for m in rx.finditer(text):
            s, o = m.group("s"), m.group("o")
            if not (_valid_mention(s) and _valid_mention(o)):
                continue
            key = (s, pred, o)
            if key not in seen:
                seen[key] = conf
                order.append(key)
    return [Triple(s, p, o, seen[(s, p, o)]) for s, p, o in order]


def golden_triples(rows: Iterable[dict]) -> list[dict]:
    """Run the reference extractor row-by-row over transcript rows.

    ``rows`` must have conv_id, turn_idx, text. Output rows carry
    (conv_id, turn_idx, subj, pred, obj, conf) in stable
    (conv_id, turn_idx, pattern/document) order.
    """
    out: list[dict] = []
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        for t in extract_triples(r["text"]):
            out.append(
                {
                    "conv_id": r["conv_id"],
                    "turn_idx": r["turn_idx"],
                    "subj": t.subj,
                    "pred": t.pred,
                    "obj": t.obj,
                    "conf": t.conf,
                }
            )
    return out
