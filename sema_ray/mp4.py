"""Minimal ISO BMFF (MP4, ISO/IEC 14496-12) demuxer + muxer, pure stdlib.

Completes the multimodal video path as far as a codec-less container can
go (reference treats media as opaque bytes): :func:`demux_mp4` walks the
box tree (``moov/trak/mdia/minf/stbl``) and reconstructs the exact
per-sample byte ranges and timestamps from the sample tables — ``stts``
(decode deltas), ``stsc`` (sample-to-chunk runs), ``stsz`` (sizes),
``stco``/``co64`` (chunk offsets), ``stss`` (sync samples). Frame
SAMPLING (which bytes are frame N, at what time) is therefore real;
only frame-pixel DECODE still needs an external codec (ffmpeg) and stays
gated in :mod:`sema_ray.multimodal`.

:func:`mux_mp4` writes a self-contained single-video-track file
(``ftyp | mdat | moov``) used to synthesize deterministic test/bench
fixtures — no external data.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf",
               b"edts", b"udta"}


def _boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in buf[start:end]."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", buf[i:i + 4])[0]
        typ = buf[i + 4:i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                raise ValueError("malformed MP4 box")
            size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, body, i + size
        i += size


def _find(buf: bytes, start: int, end: int, typ: bytes):
    for t, b, e in _boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


@dataclass
class Mp4Sample:
    index: int
    offset: int
    size: int
    dts: int          # in track timescale units
    duration: int
    sync: bool


@dataclass
class Mp4Track:
    timescale: int
    width: int
    height: int
    codec: str
    samples: list


def demux_mp4(payload: bytes) -> Mp4Track:
    """Parse the first video track's sample tables -> :class:`Mp4Track`."""
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("not an MP4 (no moov box)")
    for t, b, e in _boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, b, e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        return _parse_video_trak(payload, mdia)
    raise ValueError("MP4 has no video track")


def _u32s(body: bytes, off: int, n: int) -> list[int]:
    return list(struct.unpack(f">{n}I", body[off:off + 4 * n]))


def _parse_video_trak(buf: bytes, mdia: tuple) -> Mp4Track:
    mdhd = _find(buf, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("MP4 track missing mdhd")
    ver = buf[mdhd[0]]
    timescale = struct.unpack(
        ">I", buf[mdhd[0] + (20 if ver == 1 else 12):][:4])[0]
    minf = _find(buf, *mdia, b"minf")
    stbl = minf and _find(buf, *minf, b"stbl")
    if not stbl:
        raise ValueError("MP4 track missing stbl")
    tabs = {t: (b, e) for t, b, e in _boxes(buf, *stbl)}

    def body(t: bytes) -> bytes:
        if t not in tabs:
            raise ValueError(f"MP4 missing {t.decode()} box")
        b, e = tabs[t]
        return buf[b:e]

    # stsd: codec fourcc + dimensions from the first sample entry
    sd = body(b"stsd")
    codec, width, height = "????", 0, 0
    if struct.unpack(">I", sd[4:8])[0] >= 1:
        codec = sd[12:16].decode("latin1")
        width, height = struct.unpack(">HH", sd[8 + 32:8 + 36])

    # stts -> per-sample dts/duration
    tt = body(b"stts")
    n_runs = struct.unpack(">I", tt[4:8])[0]
    counts, deltas, dts, durs = [], [], [], []
    for r in range(n_runs):
        c, d = struct.unpack(">II", tt[8 + 8 * r:16 + 8 * r])
        counts.append(c)
        deltas.append(d)
    t = 0
    for c, d in zip(counts, deltas):
        for _ in range(c):
            dts.append(t)
            durs.append(d)
            t += d
    n_samples_tt = len(dts)

    # stsz -> sizes
    sz = body(b"stsz")
    fixed, n_samples = struct.unpack(">II", sz[4:12])
    sizes = [fixed] * n_samples if fixed else _u32s(sz, 12, n_samples)
    if n_samples_tt != n_samples:
        raise ValueError("MP4 stts/stsz sample-count mismatch")

    # stco / co64 -> chunk offsets
    if b"stco" in tabs:
        co = body(b"stco")
        n_chunks = struct.unpack(">I", co[4:8])[0]
        offsets = _u32s(co, 8, n_chunks)
    else:
        co = body(b"co64")
        n_chunks = struct.unpack(">I", co[4:8])[0]
        offsets = list(struct.unpack(f">{n_chunks}Q", co[8:8 + 8 * n_chunks]))

    # stsc runs -> samples per chunk
    sc = body(b"stsc")
    n_sc = struct.unpack(">I", sc[4:8])[0]
    runs = [struct.unpack(">III", sc[8 + 12 * r:20 + 12 * r])
            for r in range(n_sc)]
    per_chunk = []
    for ri, (first, spc, _desc) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        per_chunk += [spc] * (last - first + 1)
    if len(per_chunk) != n_chunks:
        raise ValueError("MP4 stsc does not cover every chunk")

    # stss -> sync (key) samples; absent = every sample is sync
    sync: set[int] | None = None
    if b"stss" in tabs:
        ss = body(b"stss")
        n_ss = struct.unpack(">I", ss[4:8])[0]
        sync = {i - 1 for i in _u32s(ss, 8, n_ss)}  # 1-based in the file

    samples, si = [], 0
    for ci, base in enumerate(offsets):
        off = base
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            if off + sizes[si] > len(buf):
                raise ValueError("MP4 sample range beyond file end")
            samples.append(Mp4Sample(
                index=si, offset=off, size=sizes[si], dts=dts[si],
                duration=durs[si],
                sync=(sync is None or si in sync)))
            off += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("MP4 chunk map covers fewer samples than stsz")
    return Mp4Track(timescale=timescale, width=width, height=height,
                    codec=codec, samples=samples)


def sample_frames(payload: bytes, n_frames: int,
                  sync_only: bool = False) -> list[tuple[int, float, bytes]]:
    """Evenly-spaced real frame extraction: ``n_frames`` (frame_idx,
    pts_seconds, frame_bytes) tuples across the video's sample list
    (sync samples only when asked and the file marks them)."""
    trk = demux_mp4(payload)
    pool = [s for s in trk.samples if s.sync] if sync_only else trk.samples
    if not pool:
        raise ValueError("MP4 has no samples")
    k = min(n_frames, len(pool))
    # evenly spaced, first and last included, no duplicates. Half-UP
    # rounding (floor(x + 0.5)), NOT Python's half-even round(): the
    # frame_sample_meta DuckDB twin recomputes the pick index with
    # DuckDB round() (half-away-from-zero), and a .5 midpoint — e.g.
    # n_frames=5 over 11 samples, i=1 -> 10/4 = 2.5 — must pick the
    # same frame on both engines (CLAUDE.md oracle-rounding rule).
    picks = sorted({math.floor(i * (len(pool) - 1) / max(k - 1, 1) + 0.5)
                    for i in range(k)})
    out = []
    for p in picks:
        s = pool[p]
        out.append((s.index, s.dts / trk.timescale,
                    payload[s.offset:s.offset + s.size]))
    return out


# ---------------------------------------------------------------------------
# Muxer (test/bench fixture writer)
# ---------------------------------------------------------------------------

def _box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + typ + body


def _full(typ: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(typ, struct.pack(">B", version)
                + flags.to_bytes(3, "big") + body)


def mux_mp4(samples: list[bytes], timescale: int = 1000,
            sample_duration: int = 40, width: int = 64, height: int = 48,
            samples_per_chunk: int = 3,
            sync_every: int = 0) -> bytes:
    """Single-video-track MP4: ``ftyp | mdat | moov`` (offsets independent
    of moov size). ``sync_every`` > 0 writes an stss marking every k-th
    sample as a keyframe."""
    if not samples:
        raise ValueError("need at least one sample")
    n = len(samples)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp42")
    mdat = _box(b"mdat", b"".join(samples))
    mdat_base = len(ftyp) + 8

    spc = max(1, samples_per_chunk)
    chunk_sizes = [spc] * (n // spc) + ([n % spc] if n % spc else [])
    offsets, si, off = [], 0, mdat_base
    for cs in chunk_sizes:
        offsets.append(off)
        off += sum(len(samples[si + j]) for j in range(cs))
        si += cs

    stsd_entry = (b"\x00" * 6 + struct.pack(">H", 1)      # data_ref_idx
                  + b"\x00" * 16
                  + struct.pack(">HH", width, height)
                  + struct.pack(">II", 0x00480000, 0x00480000)
                  + b"\x00" * 4 + struct.pack(">H", 1)    # frame_count
                  + b"\x00" * 32                          # compressorname
                  + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0,
                 struct.pack(">I", 1) + _box(b"mp4v", stsd_entry))
    stts = _full(b"stts", 0, 0,
                 struct.pack(">III", 1, n, sample_duration))
    # stsc runs: full chunks, plus a second run if the tail chunk is short
    runs = [(1, spc, 1)]
    if n % spc and len(chunk_sizes) > 1:
        runs.append((len(chunk_sizes), n % spc, 1))
    elif n % spc:                       # single short chunk
        runs = [(1, n % spc, 1)]
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(runs))
                 + b"".join(struct.pack(">III", *r) for r in runs))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(offsets))
                 + b"".join(struct.pack(">I", o) for o in offsets))
    stbl_kids = stsd + stts + stsc + stsz + stco
    if sync_every:
        ks = list(range(1, n + 1, sync_every))
        stbl_kids += _full(b"stss", 0, 0, struct.pack(">I", len(ks))
                           + b"".join(struct.pack(">I", k) for k in ks))
    stbl = _box(b"stbl", stbl_kids)

    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    dur = n * sample_duration
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale,
                                            dur, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"sema_ray\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">IIIII", 0, 0, 1, 0, dur)
                 + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale, dur)
                 + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
