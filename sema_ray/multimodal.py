"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as Arrow ``binary`` columns with metadata
columns alongside; decode / feature-extract / resize / frame-sample are
actor-pool ``map_batches`` stages (small ``batch_size`` — payloads are big).

Two decode paths:

- ``fake=True`` (default): deterministic content-hash-seeded stand-in, so
  the Ray-side plumbing — schema, batch sizing, actor signature, output
  layout — is exercised for ANY mime type without codec libraries.
- ``fake=False``: REAL pure-stdlib/NumPy kernels — PPM (P6) images
  (:func:`decode_ppm`), PNG images (:func:`decode_png` — stdlib ``zlib``
  inflate + full filter reconstruction per the PNG spec §9, color types
  0/2/3/4/6 at bit depth 8), baseline JPEG (:mod:`sema_ray.jpeg` —
  full T.81 baseline Huffman/DCT codec, 4:4:4 / 4:2:0, restart markers),
  and PCM WAV audio (:func:`decode_wav`, stdlib ``wave``) — with real
  resize and real feature extraction. MP4 frame SAMPLING is real too
  (:mod:`sema_ray.mp4` demuxes the ISO BMFF sample tables in
  :class:`FrameSampleStage`); only frame-PIXEL decode still raises
  ``NotImplementedError`` in :func:`real_decode` — the one seam an
  ffmpeg codec would plug into.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib

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


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic decode stand-in: feature vector seeded by content hash."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


# ---------------------------------------------------------------------------
# Real codecs (pure stdlib/NumPy): PPM P6 images, PCM WAV audio
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> uint8 array [h, w, 3]."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            nl = payload.find(b"\n", i)
            i = (nl + 1) if nl != -1 else len(payload)
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    if toks[0] != b"P6":
        raise ValueError(f"not a binary PPM (magic {toks[0]!r})")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = payload[i + 1:i + 1 + w * h * 3]  # exactly one ws after maxval
    if len(raster) < w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    """uint8 [h, w, 3] -> binary PPM (P6) bytes."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (type 3 is palette indices, 1 sample)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (chunk_type, data) pairs; validates each CRC (PNG spec §5.3)."""
    i = len(_PNG_SIG)
    while i + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + length]
        if len(data) < length or i + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[i + 8 + length:i + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        i += 12 + length
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filters (spec §9) -> uint8 [h, stride]."""
    lines = np.frombuffer(raw, dtype=np.uint8)
    if len(lines) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    lines = lines.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        f, line = int(lines[r, 0]), lines[r, 1:]
        if f == 0:                          # None
            rec = line.copy()
        elif f == 1:                        # Sub: per-lane prefix sum mod 256
            rec = line.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(
                    rec[lane::bpp], dtype=np.uint64) & 0xFF
        elif f == 2:                        # Up
            rec = line + prev               # uint8 wraps mod 256
        elif f in (3, 4):                   # Average / Paeth: left-dependent
            rec = np.empty(stride, dtype=np.uint8)
            li, pr = line.astype(np.int32), prev.astype(np.int32)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(pr[i])
                if f == 3:
                    rec[i] = (li[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(pr[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc_) else \
                        (b if pb <= pc_ else c)
                    rec[i] = (li[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = rec
        prev = rec
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array [h, w, channels] (pure stdlib zlib + NumPy).

    Supports bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette ->
    expanded to RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Adam7
    interlacing and 1/2/4/16-bit depths raise ``ValueError`` (the
    reference's indexable image set is 8-bit; see PNG spec §8.2).
    """
    if payload[:len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (8 only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    ch = _PNG_CHANNELS[color]
    img = _png_unfilter(zlib.decompress(bytes(idat)), h, w * ch, ch)
    img = img.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]            # -> [h, w, 3]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """uint8 [h, w] or [h, w, {1,2,3,4}] -> PNG bytes (filter 0, one IDAT)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raster = np.ascontiguousarray(img, dtype=np.uint8).reshape(h, w * ch)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raster], axis=1).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float32 [n, channels] in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(payload)) as f:
        ch, sw, sr = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    return x.reshape(-1, ch), sr


def encode_wav(x: np.ndarray, sample_rate: int) -> bytes:
    """float array in [-1, 1] (mono or [n, ch]) -> 16-bit PCM WAV bytes."""
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def _grid_indices(n_src: int, n_dst: int) -> np.ndarray:
    """Nearest-sample index grid (deterministic resize/resample)."""
    return np.minimum((np.arange(n_dst) * n_src) // max(n_dst, 1),
                      max(n_src - 1, 0)).astype(np.int64)


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """8x8 grayscale intensity grid in [0, 1] (dim must be a square)."""
    side = int(np.sqrt(dim))
    gray = img.astype(np.float32).mean(axis=2)
    ri = _grid_indices(gray.shape[0], side)
    ci = _grid_indices(gray.shape[1], side)
    return (gray[np.ix_(ri, ci)] / 255.0).reshape(-1).astype(np.float32)


_N_FFT = 512
_HOP = 256
_MEL_CACHE: dict[tuple, np.ndarray] = {}


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Triangular mel filterbank over rFFT bins (HTK scale:
    mel = 2595 log10(1 + f/700)); cached per (sr, n_fft, n_mels)."""
    key = (sr, n_fft, n_mels)
    fb = _MEL_CACHE.get(key)
    if fb is not None:
        return fb
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(0.0, mel(sr / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            fb[m - 1, k] = (k - lo) / max(c - lo, 1)
        for k in range(c, hi):
            fb[m - 1, k] = (hi - k) / max(hi - c, 1)
    _MEL_CACHE[key] = fb
    return fb


def audio_features(x: np.ndarray, sr: int = 8000,
                   dim: int = FEATURE_DIM) -> np.ndarray:
    """Mean log-mel spectrogram (the MFCC front end, pure NumPy): mono
    mix, Hann-windowed 512-point frames at hop 256, power rFFT, ``dim``
    triangular HTK mel bands, log10, mean over time -> [dim] float32.
    All-vectorized; replaces the round-3 segment-RMS stand-in."""
    mono = x.mean(axis=1) if x.ndim == 2 else x
    mono = np.asarray(mono, dtype=np.float64)
    if len(mono) < _N_FFT:
        mono = np.pad(mono, (0, _N_FFT - len(mono)))
    frames = np.lib.stride_tricks.sliding_window_view(
        mono, _N_FFT)[::_HOP] * np.hanning(_N_FFT)
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    mel_energy = power @ _mel_filterbank(sr, _N_FFT, dim).T
    return np.log10(mel_energy + 1e-10).mean(axis=0).astype(np.float32)


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Any decoded image layout -> uint8 [h, w, 3] (alpha dropped)."""
    if img.ndim == 2:
        img = img[:, :, None]
    ch = img.shape[2]
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 2:                       # gray + alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]              # RGB / RGBA


def real_decode(payload: bytes, mime: str, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real decode+featurize for the formats a bare container can handle."""
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        return image_features(decode_ppm(payload), dim)
    if mime == "image/png":
        return image_features(_to_rgb(decode_png(payload)), dim)
    if mime == "image/jpeg":
        from .jpeg import decode_jpeg
        return image_features(_to_rgb(decode_jpeg(payload)), dim)
    if mime in ("audio/wav", "audio/x-wav"):
        samples, sr = decode_wav(payload)
        return audio_features(samples, sr, dim)
    raise NotImplementedError(
        f"no codec for {mime!r} in this container — MP4 frames need "
        "ffmpeg; PPM, PNG, JPEG and WAV decode natively")


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

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.fake:
            feats = [_fake_decode(p, self.dim)
                     for p in t["payload"].to_pylist()]
        else:
            feats = [real_decode(p, m, self.dim)
                     for p, m in zip(t["payload"].to_pylist(),
                                     t["mime"].to_pylist())]
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

    ``fake=False`` does a REAL nearest-neighbor resize for PPM and PNG
    payloads (decode -> index-grid resample -> re-encode in the same
    format); JPEG would need PIL. The fake path emits a deterministic
    content-hash-seeded byte string, keeping the binary-in/binary-out
    contract testable for any mime.
    """

    def __init__(self, out_w: int = 224, out_h: int = 224, fake: bool = True):
        self.out_w, self.out_h = out_w, out_h
        self.fake = fake

    def _resize_real(self, p: bytes) -> bytes:
        if p[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg, encode_jpeg
            img = decode_jpeg(p)
            codec = lambda o: encode_jpeg(o, quality=90)  # noqa: E731
        elif p[:len(_PNG_SIG)] == _PNG_SIG:
            img, codec = decode_png(p), encode_png
        else:
            img, codec = decode_ppm(p), encode_ppm
        ri = _grid_indices(img.shape[0], self.out_h)
        ci = _grid_indices(img.shape[1], self.out_w)
        return codec(img[np.ix_(ri, ci)])

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads = []
        n_bytes = (self.out_w * self.out_h * 3) // 8
        for p in t["payload"].to_pylist():
            if not self.fake:
                out_payloads.append(self._resize_real(p))
                continue
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

    ``fake=False`` does REAL frame sampling: :mod:`sema_ray.mp4` demuxes
    the container's sample tables and extracts ``n_frames`` evenly-spaced
    frames — real byte ranges, real timestamps, optional sync-only picks.
    Frame-PIXEL decode would need an external codec (ffmpeg), so the
    per-frame feature is a content-addressed stand-in over the REAL frame
    bytes — that is the one seam a codec plugs into. The fake path
    stub-samples deterministically from (payload, frame_idx) for any mime.
    """

    def __init__(self, n_frames: int = 4, dim: int = FEATURE_DIM,
                 fake: bool = True, sync_only: bool = False):
        self.n_frames = n_frames
        self.dim = dim
        self.fake = fake
        self.sync_only = sync_only

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, frames, pts, nbytes, feats = [], [], [], [], []
        for item_id, payload in zip(t["item_id"].to_pylist(),
                                    t["payload"].to_pylist()):
            if self.fake:
                for f in range(self.n_frames):
                    ids.append(item_id)
                    frames.append(f)
                    pts.append(f * 40)  # 25 fps stand-in
                    nbytes.append(len(payload))
                    feats.append(_fake_decode(payload + f.to_bytes(4, "big"),
                                              self.dim))
            else:
                from .mp4 import sample_frames
                for idx, pts_s, frame in sample_frames(
                        payload, self.n_frames, sync_only=self.sync_only):
                    ids.append(item_id)
                    frames.append(idx)
                    # half-up, not Python half-even round(): keeps pts_ms
                    # reproducible against DuckDB-round() oracle arithmetic
                    pts.append(math.floor(pts_s * 1000 + 0.5))
                    nbytes.append(len(frame))
                    feats.append(_fake_decode(frame, self.dim))
        flat = (np.concatenate(feats) if feats
                else np.empty(0, dtype=np.float32))
        fa = pa.FixedSizeListArray.from_arrays(
            pa.array(flat, type=pa.float32()), self.dim)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frames, pa.int32()),
            "pts_ms": pa.array(pts, pa.int64()),
            "n_bytes": pa.array(nbytes, pa.int64()),
            "feature": fa,
        })


def synthesize_real_items(n: int = 12, seed: int = 7) -> pa.Table:
    """Deterministic REAL-codec multimodal table: PPM + PNG images and PCM
    WAVs (decodable by :func:`real_decode` with no external libraries)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("item_id", "modality", "payload", "mime",
                            "meta_json")}
    from .jpeg import encode_jpeg
    for i in range(n):
        if i % 2 == 0:
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["modality"].append("image")
            kind = (i // 2) % 3
            if kind == 0:
                rows["payload"].append(encode_ppm(img))
                rows["mime"].append("image/x-portable-pixmap")
            elif kind == 1:
                rows["payload"].append(encode_png(img))
                rows["mime"].append("image/png")
            else:
                # alternate baseline / progressive (SOF2) streams so the
                # decode stages exercise both T.81 entropy layouts
                rows["payload"].append(encode_jpeg(
                    img, quality=90, progressive=(i // 2) % 2 == 1))
                rows["mime"].append("image/jpeg")
            rows["meta_json"].append(f'{{"w": {w}, "h": {h}}}')
        else:
            sr = 8000
            x = rng.standard_normal(int(rng.integers(800, 4000))) * 0.2
            rows["modality"].append("audio")
            rows["payload"].append(encode_wav(x, sr))
            rows["mime"].append("audio/wav")
            rows["meta_json"].append(f'{{"sr": {sr}}}')
        rows["item_id"].append(i)
    return pa.table(
        {k: pa.array(v, BINARY_SCHEMA.field(k).type) for k, v in rows.items()},
        schema=BINARY_SCHEMA)


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


def synthesize_mp4_items(n_items: int = 32, n_samples_mod: int = 5,
                         base_samples: int = 9) -> pa.Table:
    """Deterministic MP4 table for the oracle-checked demux roundtrip:
    item ``i`` has ``base_samples + (i % n_samples_mod)`` video samples and
    sample ``j``'s size is the CLOSED FORM ``64 + ((i*37 + j*11) % 100)`` —
    a SQL oracle can recompute every byte count without running a demuxer.
    40 ms per frame at timescale 1000; multi-chunk layout + stss exercise
    the full sample-table paths."""
    from .mp4 import mux_mp4
    rows = {k: [] for k in ("item_id", "modality", "payload", "mime",
                            "meta_json")}
    for i in range(n_items):
        n = base_samples + (i % n_samples_mod)
        samples = [bytes([(i + j) % 256]) * (64 + ((i * 37 + j * 11) % 100))
                   for j in range(n)]
        rows["item_id"].append(i)
        rows["modality"].append("video")
        rows["payload"].append(mux_mp4(samples, sample_duration=40,
                                       samples_per_chunk=4, sync_every=3))
        rows["mime"].append("video/mp4")
        rows["meta_json"].append('{"fps": 25}')
    return pa.table(
        {k: pa.array(v, BINARY_SCHEMA.field(k).type) for k, v in rows.items()},
        schema=BINARY_SCHEMA)


def frame_sample_meta(sf_dir: str, n_items: int = 32,
                      n_frames: int = 4) -> rd.Dataset:
    """Oracle-checked MP4 roundtrip: synthesize deterministic single-track
    MP4s (:func:`synthesize_mp4_items`), REAL-demux ``n_frames`` evenly
    spaced frames per item through the actor-pool
    :class:`FrameSampleStage`, and emit (item_id, frame_idx, pts_ms,
    n_bytes). The SQL twin recomputes the identical table from the size
    formula and the even-spacing pick rule alone — any mux/demux
    sample-table bug breaks the value hash. ``sf_dir`` is unused (the
    fixture is self-synthesized; no external data)."""
    del sf_dir
    items = synthesize_mp4_items(n_items=n_items)
    out = rd.from_arrow(items).map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 4),
        fn_constructor_kwargs={"n_frames": n_frames, "fake": False})
    return out.map_batches(
        lambda t: t.select(["item_id", "frame_idx", "pts_ms", "n_bytes"]),
        batch_format="pyarrow")


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
