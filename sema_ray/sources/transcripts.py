"""Deterministic synthetic transcript corpora (FIXTURES.md F1).

Input schema per BASELINE.json input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``.

Two corpora, both fully deterministic (fixed seeds, no wall clock):

- :func:`generate_transcripts` — template corpus with known entity surface
  forms + relation sentences (exercises extraction, canonicalization of
  casing/suffix/typo variants, the >1000-byte chunker path incl. multi-byte
  UTF-8), with Zipf-skewed conversation sizes (skew fixtures, SURVEY §4.3).
- :func:`transcripts_from_documents` — derives a transcript table from the
  driver's ``documents.parquet`` (each doc -> one conversation; the doc text
  split into turns, plus deterministic entity sentences seeded by doc_id),
  anchoring ``entry()``/bench on /root/testdata without external data.

Writers shard the corpus into multiple parquet files — the unit of
checkpoint/resume lineage (SURVEY §4.3; partition == input shard).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_BASE_TS_US = 1_700_000_000_000_000  # fixed epoch (us)

FIRST = ["Alice", "Bob", "Carol", "David", "Elena", "Frank", "Grace", "Hiro",
         "Ivan", "Julia", "Kenji", "Lena", "Marco", "Nina", "Omar", "Priya"]
LAST = ["Chen", "Novak", "Garcia", "Smith", "Tanaka", "Müller", "Okafor",
        "Silva", "Kumar", "Rossi", "Ivanov", "Dubois"]
ORG_STEM = ["Acme", "Globex", "Initech", "Umbrella", "Stark", "Wayne",
            "Hooli", "Vandelay", "Cyberdyne", "Tyrell", "Aperture", "Wonka"]
ORG_SUFFIX = ["Corp", "Corporation", "Inc", "Ltd", "GmbH", "Labs", "Systems"]
CITY = ["Berlin", "Tokyo", "Lagos", "Austin", "Zurich", "Mumbai", "Oslo",
        "Seoul", "Lima", "Porto", "Kyoto", "Denver"]
TOOLS = ["search", "calculator", "browser", "python", "sql"]

# (template, needs) — templates align with golden.PATTERNS verb phrases.
_REL_TEMPLATES = [
    ("{p} works at {o}.", "po"),
    ("{p} is the CEO of {o}.", "po"),
    ("{o} is based in {c}.", "oc"),
    ("{p} lives in {c}.", "pc"),
    ("{o} acquired {o2}.", "oo"),
    ("{p} founded {o}.", "po"),
    ("{o} partnered with {o2}.", "oo"),
    ("{p} reports to {p2}.", "pp"),
    ("{p} met with {p2}.", "pp"),
    ("{p} uses {t}.", "pt"),
]

_FILLER = [
    "the pipeline ran without errors and produced the expected output",
    "let me check the logs for more context on that failure",
    "再現手順を確認してから、もう一度実行してみてください",  # multi-byte fixtures
    "célèbre façade naïve — déjà vu in the café",
    "ok, proceeding with the next step of the plan",
    "the batch job finished after the retry with backoff",
]


def _person(rng: np.random.Generator) -> str:
    return f"{FIRST[rng.integers(len(FIRST))]} {LAST[rng.integers(len(LAST))]}"


def _org(rng: np.random.Generator) -> str:
    stem = ORG_STEM[rng.integers(len(ORG_STEM))]
    # Surface-form variants of the same logical org, to exercise
    # canonicalization: suffix choice, casing, trailing dot, rare typo.
    suffix = ORG_SUFFIX[rng.integers(len(ORG_SUFFIX))]
    s = f"{stem} {suffix}"
    r = rng.random()
    if r < 0.10:
        s = s.upper()
    if rng.random() < 0.10:
        s += "."
    return s


def _sentence(rng: np.random.Generator) -> str:
    tpl, _need = _REL_TEMPLATES[rng.integers(len(_REL_TEMPLATES))]
    return tpl.format(
        p=_person(rng), p2=_person(rng), o=_org(rng), o2=_org(rng),
        c=CITY[rng.integers(len(CITY))], t=f"{ORG_STEM[rng.integers(len(ORG_STEM))]} API",
    )


def _turn_text(rng: np.random.Generator) -> str:
    # ~60% short filler-ish, ~30% entity sentences, ~10% long (>1000B) text
    # exercising the sliding-window chunker with multi-byte chars.
    r = rng.random()
    if r < 0.6:
        n = int(rng.integers(1, 3))
        parts = [_FILLER[rng.integers(len(_FILLER))] for _ in range(n)]
        if rng.random() < 0.3:
            parts.append(_sentence(rng))
        return " ".join(parts)
    if r < 0.9:
        n = int(rng.integers(1, 4))
        return " ".join(_sentence(rng) for _ in range(n))
    parts = []
    size = 0
    target = int(rng.integers(1100, 3000))
    while size < target:
        s = (_sentence(rng) if rng.random() < 0.3
             else _FILLER[rng.integers(len(_FILLER))])
        parts.append(s)
        size += len(s.encode("utf-8")) + 1
        if rng.random() < 0.2:
            parts.append("\n")
    return " ".join(parts)


def _conv_sizes(rng: np.random.Generator, n_convs: int) -> np.ndarray:
    """Zipf-skewed turn counts: median 5-20, a heavy tail of 100-5000."""
    base = rng.integers(5, 21, size=n_convs)
    heavy = rng.random(n_convs) < 0.01
    base = base.astype(np.int64)
    base[heavy] = rng.integers(100, 1200, size=int(heavy.sum()))
    if n_convs >= 200:  # one guaranteed whale for skew tests
        base[0] = 3000
    return base


def generate_transcripts(n_convs: int = 100, seed: int = 42) -> pa.Table:
    """Template transcript corpus; deterministic in (n_convs, seed)."""
    rng = np.random.default_rng(seed)
    sizes = _conv_sizes(rng, n_convs)
    conv_ids: list[str] = []
    turn_idx: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    ts: list[int] = []
    role_cycle = ["user", "assistant", "tool"]
    for i in range(n_convs):
        cid = f"conv-{i:08d}"
        delta = int(rng.integers(1_000_000, 60_000_000))
        for j in range(int(sizes[i])):
            role = role_cycle[j % 3]
            conv_ids.append(cid)
            turn_idx.append(j)
            roles.append(role)
            texts.append(_turn_text(rng))
            tools.append(TOOLS[int(rng.integers(len(TOOLS)))] if role == "tool" else "")
            ts.append(_BASE_TS_US + i * 86_400_000_000 + j * delta)
    t = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    # Shuffle rows across conversations: stable ordering must be *recovered*
    # by the pipeline, never assumed from storage order (FIXTURES F1).
    perm = np.random.default_rng(seed + 1).permutation(t.num_rows)
    return t.take(pa.array(perm))


def _doc_conversation(doc_id: int, text: str, v: int):
    """One (doc, variant) -> one conversation's rows (deterministic in
    (doc_id, v) only — independent of batching/partitioning)."""
    rng = np.random.default_rng(100_000 * (v + 1) + int(doc_id))
    cid = f"doc-{int(doc_id):08d}-v{v}"
    # a NULL-text document still yields one (synthetic) turn, like an
    # empty one — the derived corpus itself never carries NULL turns
    words = text.split() if text is not None else []
    turns: list[str] = []
    for w0 in range(0, len(words), 12):
        turns.append(" ".join(words[w0 : w0 + 12]))
        if rng.random() < 0.5:
            turns.append(_sentence(rng))
    if not turns:
        turns = [_sentence(rng)]
    role_cycle = ["user", "assistant", "tool"]
    rows = []
    for j, turn_text in enumerate(turns):
        role = role_cycle[j % 3]
        rows.append((
            cid, j, role, turn_text,
            TOOLS[int(rng.integers(len(TOOLS)))] if role == "tool" else "",
            _BASE_TS_US + int(doc_id) * 3_600_000_000 + j * 30_000_000,
        ))
    return rows


def _rows_to_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    return pa.table(
        {
            "conv_id": pa.array(cols[0], pa.string()),
            "turn_idx": pa.array(cols[1], pa.int32()),
            "role": pa.array(cols[2], pa.string()),
            "text": pa.array(cols[3], pa.string()),
            "tool": pa.array(cols[4], pa.string()),
            "ts": pa.array(cols[5], pa.timestamp("us")),
        }
    )


def transcripts_from_documents(sf_dir: str, variants: int = 1) -> pa.Table:
    """Derive a transcript table from ``{sf_dir}/documents.parquet``.

    Each (doc, variant) becomes one conversation: the doc text is split into
    word-window turns, interleaved with deterministic entity sentences seeded
    by (doc_id, variant). Purely a reshaping of driver testdata + seeded
    templates — no external data.
    """
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    rows: list[tuple] = []
    for v in range(variants):
        for doc_id, text in zip(docs["doc_id"].to_pylist(),
                                docs["text"].to_pylist()):
            rows.extend(_doc_conversation(doc_id, text, v))
    return _rows_to_table(rows)


def generate_corpus_ray(sf_dir: str, out_dir: str, variants: int = 1) -> None:
    """Distributed corpus generation: documents -> transcript shards via Ray.

    Per-conversation rows are seeded by (doc_id, variant) only, so output
    content is identical to :func:`transcripts_from_documents` regardless of
    batching (file layout may differ — callers treat the directory as one
    corpus). Used by bench for multi-million-turn corpora where driver-side
    generation would serialize.
    """
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[tuple] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for v in range(variants):
                rows.extend(_doc_conversation(doc_id, text, v))
        return _rows_to_table(rows)

    docs.map_batches(gen, batch_format="pyarrow",
                     batch_size=64).write_parquet(out_dir)


def write_sharded(table: pa.Table, out_dir: str, num_shards: int = 8) -> list[str]:
    """Write a transcript table as ``shard-XXXX.parquet`` files.

    Shards are the lineage/checkpoint unit: a resumable run fingerprints and
    processes whole shards (SURVEY §4.3). Rows land in shards by position
    (the table is already conv-shuffled), so shard sizes are balanced.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    paths = []
    per = (n + num_shards - 1) // num_shards
    for s in range(num_shards):
        lo = s * per
        if lo >= n:
            break
        part = table.slice(lo, min(per, n - lo))
        path = os.path.join(out_dir, f"shard-{s:04d}.parquet")
        pq.write_table(part, path)
        paths.append(path)
    return paths


def corpus_dir(kind: str, key: str, root: str = "/tmp/sema_ray_corpus") -> str:
    """Cache directory for a generated corpus, keyed by parameters."""
    return os.path.join(root, f"{kind}-{key}")


def ensure_corpus(kind: str = "template", *, n_convs: int = 100, seed: int = 42,
                  sf_dir: str | None = None, variants: int = 1,
                  num_shards: int = 8, use_ray: bool = False,
                  root: str = "/tmp/sema_ray_corpus") -> str:
    """Generate-and-cache a sharded corpus; returns its directory.

    A ``_COMPLETE`` marker makes the cache crash-safe: partial generations
    are regenerated. ``use_ray=True`` (docs kind only) generates the shards
    distributed — required for multi-million-turn bench corpora.
    """
    if kind == "template":
        key = f"c{n_convs}-s{seed}-sh{num_shards}"
    else:
        # source fingerprint in the key: a regenerated documents.parquet
        # (or same-basename different dir) never reuses a stale cache
        st = os.stat(os.path.join(sf_dir or "", "documents.parquet"))
        key = (f"{os.path.basename(os.path.normpath(sf_dir or ''))}"
               f"-{st.st_size}-{int(st.st_mtime)}-v{variants}-sh{num_shards}")
    d = corpus_dir(kind, key, root)
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    import shutil
    shutil.rmtree(d, ignore_errors=True)  # drop partial generations
    if kind == "template":
        write_sharded(generate_transcripts(n_convs=n_convs, seed=seed), d,
                      num_shards=num_shards)
    else:
        assert sf_dir is not None
        if use_ray:
            generate_corpus_ray(sf_dir, d, variants=variants)
        else:
            write_sharded(transcripts_from_documents(sf_dir, variants=variants),
                          d, num_shards=num_shards)
    with open(marker, "w") as f:
        f.write("ok")
    return d
