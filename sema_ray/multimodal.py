"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages (small ``batch_size`` — payloads are big).
The actual codec libraries are not in this container, so the decode kernel is
STUBBED: ``DecodeStage(fake=True)`` produces a deterministic fake decode
(seeded by content hash) so the Ray-side plumbing — schema, batch sizing,
actor signature, output layout — is real and tested; ``fake=False`` raises
``NotImplementedError`` unless PIL/soundfile are importable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

BINARY_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("modality", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),        # opaque encoded bytes
    ("mime", pa.string()),
    ("meta_json", pa.string()),      # typed metadata as JSON (w/h, sr, fps…)
])

# Decoded-feature layout: fixed-size float vector per item (image embedding,
# audio MFCC mean, video frame-sample embedding) + shape metadata.
FEATURE_DIM = 64


def _try_import_codecs() -> bool:
    try:  # pragma: no cover - container has no codec libs
        import PIL.Image  # noqa: F401
        return True
    except Exception:
        return False


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic decode stand-in: feature vector seeded by content hash."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


class DecodeStage:
    """Actor-pool decode/feature stage over binary payload batches.

    ``__init__`` holds the (stub) codec state once per actor; ``__call__``
    decodes a batch. Use small ``batch_size`` (payloads are large) — e.g.
    ``ds.map_batches(DecodeStage, batch_size=16, concurrency=(2, N),
    batch_format="pyarrow")``.
    """

    def __init__(self, fake: bool = True, dim: int = FEATURE_DIM):
        self.dim = dim
        self.fake = fake
        if not fake and not _try_import_codecs():
            raise NotImplementedError(
                "real image/audio decode requires PIL/soundfile, which are "
                "not available in this container; use DecodeStage(fake=True)")

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            _fake_decode(p, self.dim)
            for p in t["payload"].to_pylist()
        ]
        flat = (np.concatenate(feats) if feats
                else np.empty(0, dtype=np.float32))
        fa = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.float32()), self.dim)
        return pa.table({
            "item_id": t["item_id"],
            "modality": t["modality"],
            "n_bytes": pc.cast(pc.binary_length(t["payload"]), pa.int64()),
            "feature": fa,
        })


def synthesize_binary_items(n: int = 64, seed: int = 3) -> pa.Table:
    """Deterministic fake multimodal table (test asset; no external data)."""
    rng = np.random.default_rng(seed)
    mods = ["image", "audio", "video"]
    rows = {k: [] for k in ("item_id", "modality", "payload", "mime",
                            "meta_json")}
    for i in range(n):
        m = mods[i % 3]
        size = int(rng.integers(200, 4000))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows["item_id"].append(i)
        rows["modality"].append(m)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[m])
        rows["meta_json"].append('{"w": 64, "h": 64}' if m == "image"
                                 else '{"sr": 16000}')
    return pa.table(
        {k: pa.array(v, BINARY_SCHEMA.field(k).type) for k, v in rows.items()},
        schema=BINARY_SCHEMA)


def decode_features(items: rd.Dataset, batch_size: int = 16,
                    concurrency: tuple[int, int] = (1, 4)) -> rd.Dataset:
    """items (BINARY_SCHEMA) -> decoded feature table via the actor pool."""
    return items.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def binary_meta(sf_dir: str) -> rd.Dataset:
    """Opaque-binary metadata pass over the documents table (payload = the
    UTF-8 bytes): item byte length without decoding. Oracle-checkable."""
    import os
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])

    def meta(t: pa.Table) -> pa.Table:
        payload = pc.cast(t["text"], pa.binary())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
        })

    return ds.map_batches(meta, batch_format="pyarrow")
