"""Distributed extraction stages (map_batches callables / actor classes).

Each stage is Arrow-in / Arrow-out (``batch_format="pyarrow"``) and applies
the *same pure functions* as the golden extractor (:mod:`sema_ray.golden`)
per turn, so pipeline output parity with the oracle depends only on the Ray
plumbing — the property the P/R gate checks (SURVEY §5.3, §7(c)).

Stateful stages (compiled pattern sets) are callable classes meant for actor
pools: regex compilation happens once per actor in ``__init__`` (fixing the
reference's per-call model rebuild, ``lance_indexer.rs:61,115``), batches in
``__call__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import golden
from .chunker import chunk_text
from .hashing import content_hash

TRIPLE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
    ]
)

MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("m_start", pa.int32()),
        ("m_end", pa.int32()),
        ("surface", pa.string()),
    ]
)

CHUNK_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("ordinal", pa.int32()),
        ("start_byte", pa.int64()),
        ("end_byte", pa.int64()),
        ("start_line", pa.int64()),
        ("end_line", pa.int64()),
        ("content", pa.string()),
    ]
)


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Parse/normalize stage: derived columns only — ``text`` itself is never
    rewritten (per-turn text-equality invariant, BASELINE.json input_hint).

    Adds ``n_bytes`` (UTF-8 length) and ``text_hash`` (content fingerprint,
    reference T4 idea at row granularity). Null text rows get n_bytes=0 and
    the empty-content hash (tagged, not dropped — SURVEY S2 note).
    """
    n_bytes = pc.fill_null(
        pc.binary_length(pc.cast(batch["text"], pa.binary())), 0)
    hashes = pa.array(
        [content_hash(t if t is not None else "")
         for t in batch["text"].to_pylist()], pa.string()
    )
    out = batch.append_column("n_bytes", pc.cast(n_bytes, pa.int64()))
    return out.append_column("text_hash", hashes)


def detect_mentions_batch(batch: pa.Table) -> pa.Table:
    """1->N flat map: transcript turns -> entity mentions (MENTION_SCHEMA).

    A plain function, not an actor: its only state is the module-level
    compiled regex (``golden.ENTITY_RE``), which Ray worker processes compile
    once at import — the actor pattern at process granularity without actor
    startup cost. Measured on this corpus the task pool is ~3x faster than
    an autoscaling actor pool for this stage (see BASELINE.md).
    """
    conv_ids, turn_idxs, starts, ends, surfaces = [], [], [], [], []
    for cid, tid, text in zip(
        batch["conv_id"].to_pylist(),
        batch["turn_idx"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        if text is None:  # malformed row: contributes nothing, never crashes
            continue
        for m in golden.detect_mentions(text):
            conv_ids.append(cid)
            turn_idxs.append(tid)
            starts.append(m.start)
            ends.append(m.end)
            surfaces.append(m.surface)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "m_start": pa.array(starts, pa.int32()),
            "m_end": pa.array(ends, pa.int32()),
            "surface": pa.array(surfaces, pa.string()),
        },
        schema=MENTION_SCHEMA,
    )


# Vectorized prefilter: a turn can only yield a triple if it contains one of
# the relation verb literals, so the (C++ RE2) kernel prunes the Python loop
# to candidate rows. The alternation must stay in sync with golden._P.
_VERB_ALTERNATION = "|".join([
    "works at", "is the CEO of", "is based in", "is located in", "lives in",
    "acquired", "founded", "partnered with", "reports to", "met with", "uses",
])


_CAP_STOP_ARR = pa.array(sorted(golden._CAP_STOP), pa.string())


def _valid_mention_vec(col: pa.Array) -> pa.Array:
    """Vectorized ``golden._valid_mention``: len >= 2 and not a single-word
    capitalized stopword. Null-safe (null -> false)."""
    long_enough = pc.greater_equal(pc.utf8_length(col), 2)
    single = pc.equal(pc.count_substring(col, pattern=" "), 0)
    stop = pc.is_in(col, value_set=_CAP_STOP_ARR)
    ok = pc.and_(long_enough, pc.invert(pc.and_(single, stop)))
    return pc.fill_null(ok, False)


def _extract_python(batch: pa.Table) -> tuple[list, list, list, list, list,
                                              list]:
    """Exact golden path for rows that need finditer + in-turn dedup."""
    conv_ids, turn_idxs, subjs, preds, objs, confs = [], [], [], [], [], []
    for cid, tid, text in zip(
        batch["conv_id"].to_pylist(),
        batch["turn_idx"].to_pylist(),
        batch["text"].to_pylist(),
    ):
        for t in golden.extract_triples(text):
            conv_ids.append(cid)
            turn_idxs.append(tid)
            subjs.append(t.subj)
            preds.append(t.pred)
            objs.append(t.obj)
            confs.append(t.conf)
    return conv_ids, turn_idxs, subjs, preds, objs, confs


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    """1->N flat map: transcript turns -> (subj, pred, obj, conf) triples.

    Vectorized fast path (one RE2 ``extract_regex`` per pattern over the
    whole batch) for turns where every verb literal occurs at most once —
    there a pattern can yield at most one match, every predicate is
    distinct, so ``finditer`` + in-turn dedup degenerate to "first match,
    validity-checked", which IS ``extract_regex``. Turns with a repeated
    verb literal (rare) take the exact golden Python path. Output rows per
    turn are identical to :func:`golden.extract_triples` as a set (order
    across rows is pattern-major, not turn-major — the Dataset is unordered
    anyway).
    """
    # null text never matches -> malformed rows are filtered here, counted
    # implicitly by rows_in - rows_out in the shard manifests
    mask = pc.fill_null(
        pc.match_substring_regex(batch["text"], _VERB_ALTERNATION), False)
    batch = batch.filter(mask)
    if batch.num_rows == 0:
        return TRIPLE_SCHEMA.empty_table()
    text = batch["text"]
    counts = [pc.count_substring(text, pattern=verb).to_numpy(
        zero_copy_only=False) for _pred, verb, _rx, _conf in golden.PATTERNS]
    multi = np.zeros(batch.num_rows, dtype=bool)
    for c in counts:
        multi |= c >= 2
    simple = batch.filter(pa.array(~multi))
    stext = simple["text"]
    pieces: list[pa.Table] = []
    for (pred, _verb, rx, conf), cnt in zip(golden.PATTERNS, counts):
        has = cnt[~multi] == 1
        if not has.any():
            continue
        ext = pc.extract_regex(stext, pattern=rx.pattern)
        s = pc.struct_field(ext, "s")
        o = pc.struct_field(ext, "o")
        ok = pc.and_(pc.is_valid(ext),
                     pc.and_(_valid_mention_vec(s), _valid_mention_vec(o)))
        ok = pc.and_(ok, pa.array(has))
        idx = pa.array(np.nonzero(
            ok.to_numpy(zero_copy_only=False))[0], pa.int64())
        if len(idx) == 0:
            continue
        pieces.append(pa.table({
            "conv_id": pc.cast(simple["conv_id"].take(idx), pa.string()),
            "turn_idx": pc.cast(simple["turn_idx"].take(idx), pa.int32()),
            "subj": s.take(idx),
            "pred": pa.array([pred] * len(idx), pa.string()),
            "obj": o.take(idx),
            "conf": pa.array(np.full(len(idx), conf, dtype=np.float32)),
        }, schema=TRIPLE_SCHEMA))
    if multi.any():
        conv_ids, turn_idxs, subjs, preds, objs, confs = _extract_python(
            batch.filter(pa.array(multi)))
        pieces.append(pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array(turn_idxs, pa.int32()),
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "conf": pa.array(confs, pa.float32()),
            },
            schema=TRIPLE_SCHEMA,
        ))
    if not pieces:
        return TRIPLE_SCHEMA.empty_table()
    return pa.concat_tables(pieces)


class MentionDetectStage:
    """Actor-pool form of :func:`detect_mentions_batch` — for deployments
    where the detector holds real model state in ``__init__`` (the hash-regex
    default has none, so the task form is the fast path)."""

    def __init__(self):
        self.entity_re = golden.ENTITY_RE  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        return detect_mentions_batch(batch)


class TripleExtractStage:
    """Actor-pool form of :func:`extract_triples_batch` (see above)."""

    def __init__(self):
        self.patterns = golden.PATTERNS  # compiled once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_triples_batch(batch)


def chunk_batch(batch: pa.Table, *, id_cols: tuple[str, str] = ("conv_id", "turn_idx"),
                text_col: str = "text") -> pa.Table:
    """1->N flat map applying the reference chunker (M2) per turn.

    Chunk ids follow the reference's ``{source}:{ordinal}`` format
    (``processor.rs:62``) with source = ``conv_id/turn_idx``.
    """
    key_a, key_b = id_cols
    ids, convs, tids, ords_, sb, eb, sl, el, contents = ([] for _ in range(9))
    for cid, tid, text in zip(
        batch[key_a].to_pylist(), batch[key_b].to_pylist(),
        batch[text_col].to_pylist(),
    ):
        for ch in chunk_text(text):
            ids.append(f"{cid}/{tid}:{ch.ordinal}")
            convs.append(cid)
            tids.append(tid)
            ords_.append(ch.ordinal)
            sb.append(ch.start_byte)
            eb.append(ch.end_byte)
            sl.append(ch.start_line)
            el.append(ch.end_line)
            contents.append(ch.content)
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(tids, pa.int32()),
            "ordinal": pa.array(ords_, pa.int32()),
            "start_byte": pa.array(sb, pa.int64()),
            "end_byte": pa.array(eb, pa.int64()),
            "start_line": pa.array(sl, pa.int64()),
            "end_line": pa.array(el, pa.int64()),
            "content": pa.array(contents, pa.string()),
        },
        schema=CHUNK_SCHEMA,
    )
