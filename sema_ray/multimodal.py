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


class ResizeStage:
    """Actor-pool image-resize stage (payload -> payload).

    Stub decode/encode (deterministic: output payload is a content-hash-
    seeded byte string of ``out_w*out_h*3 // 8`` bytes standing in for the
    re-encoded image); the Ray-side contract — binary in/binary out, small
    batches, metadata update — is real. ``fake=False`` requires PIL.
    """

    def __init__(self, out_w: int = 224, out_h: int = 224, fake: bool = True):
        self.out_w, self.out_h = out_w, out_h
        if not fake and not _try_import_codecs():
            raise NotImplementedError("real resize requires PIL")

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads = []
        n_bytes = (self.out_w * self.out_h * 3) // 8
        for p in t["payload"].to_pylist():
            seed = int.from_bytes(
                hashlib.blake2b(p, digest_size=8).digest(), "big")
            out_payloads.append(np.random.default_rng(seed).integers(
                0, 256, size=n_bytes, dtype=np.uint8).tobytes())
        meta = pa.array([f'{{"w": {self.out_w}, "h": {self.out_h}}}'] *
                        t.num_rows, pa.string())
        out = t.set_column(t.schema.get_field_index("payload"), "payload",
                           pa.array(out_payloads, pa.binary()))
        return out.set_column(out.schema.get_field_index("meta_json"),
                              "meta_json", meta)


class FrameSampleStage:
    """Actor-pool video frame sampler (1 -> N flat map).

    Emits ``n_frames`` rows per video item, each with a frame feature vector
    (stub-decoded deterministically from (payload, frame_idx)) — the
    schema/flat-map plumbing for a real ffmpeg-backed sampler.
    """

    def __init__(self, n_frames: int = 4, dim: int = FEATURE_DIM,
                 fake: bool = True):
        self.n_frames = n_frames
        self.dim = dim
        if not fake and not _try_import_codecs():
            raise NotImplementedError("real frame sampling requires av/ffmpeg")

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, feats = [], [], []
        for item_id, payload in zip(t["item_id"].to_pylist(),
                                    t["payload"].to_pylist()):
            for f in range(self.n_frames):
                ids.append(item_id)
                frames.append(f)
                feats.append(_fake_decode(payload + f.to_bytes(4, "big"),
                                          self.dim))
        flat = (np.concatenate(feats) if feats
                else np.empty(0, dtype=np.float32))
        fa = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.float32()), self.dim)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
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
