"""JPEG codec (ITU-T T.81 / JFIF), pure stdlib + NumPy.

Replaces the round-3 ``NotImplementedError`` gate for ``image/jpeg`` in
:mod:`sema_ray.multimodal` (the reference treats media as opaque bytes; a
100-TB curation pipeline needs at least decode-for-features, reference
``processor.rs`` reads bytes only). Scope:

- :func:`decode_jpeg`: baseline sequential DCT (SOF0; SOF1 accepted —
  same entropy coding at 8-bit precision) AND progressive DCT (SOF2,
  T.81 Annex G: spectral selection + successive approximation, DC/AC
  first and refinement scans, EOB runs), interleaved or per-component
  scans, restart markers, any sampling factors 1-2 (4:4:4 / 4:2:2 /
  4:2:0), grayscale or YCbCr. Lossless/hierarchical/arithmetic frames
  raise ``ValueError`` — honestly out of scope, not silently wrong.
- :func:`encode_jpeg`: JFIF writer — Annex K quantization tables with
  IJG quality scaling, optional 4:2:0 subsampling. Baseline mode uses
  the Annex K Huffman tables; ``progressive=True`` emits the standard
  10-scan (color) / 6-scan (gray) successive-approximation script with
  per-scan optimal Huffman tables built by the Annex K.2 procedure.
  All tables ship inside DQT/DHT segments, so the output is
  self-describing valid JPEG for any decoder. Both modes quantize the
  same coefficients, so baseline and progressive decode bit-identically.

Entropy (de)coding is a per-block Python loop (inherently sequential bit
I/O); DCT/IDCT, color transforms, (de)quantization and upsampling are
vectorized over all blocks at once. Codec work runs inside multimodal
actor-pool stages — per-item cost parallelizes across the pool.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """zigzag index k -> natural (row-major) index, per T.81 Figure A.6."""
    out = np.empty(64, dtype=np.int64)
    k = 0
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1) if s % 2 else \
            range(min(s, 7), max(0, s - 7) - 1, -1)
        for r in rows:
            out[k] = r * 8 + (s - r)
            k += 1
    return out


_ZZ = _zigzag()

# Annex K.1/K.2 quantization tables (natural order)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], huffval)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (T.81 A.3.3 up to scale)."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] = np.sqrt(1.0 / 8)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """T.81 C.2: symbol -> (code, length)."""
    out, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            i += 1
            code += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> symbol, for incremental Huffman decoding."""
    return {(ln, code): sym
            for sym, (code, ln) in _canonical_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# Bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        pad = (-self.n) % 8
        if pad:
            self.write((1 << pad) - 1, pad)  # pad with 1 bits (F.1.2.3)
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    __slots__ = ("data", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.i >= len(self.data):
                raise ValueError("truncated JPEG entropy segment")
            self.acc = (self.acc << 8) | self.data[self.i]
            self.i += 1
            self.n += 8

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill(length)
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple, int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.receive(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _split_scan(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Destuff the entropy-coded data from ``start``: returns the restart
    segments (0xFF00 unstuffed, split at RSTn) and the next-marker offset."""
    segs, cur = [], bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG (baseline or progressive) -> uint8 [h, w, 3] or [h, w, 1].

    Malformed input raises ``ValueError`` — corrupted streams can hit
    internal index/overflow errors at any marker or entropy site, so the
    contract is enforced here once rather than at every parse site."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, OverflowError, struct.error) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    buf = payload
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple, dict] = {}   # (class, id) -> decode map
    comps = None                    # [(cid, h, v, tq)]
    size = None                     # (h, w)
    restart = 0
    frame_marker = None
    progressive = False
    pstate = None                   # progressive coefficient state
    while i + 2 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("JPEG marker desync")
        m = buf[i + 1]
        if m == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            i += 1
            continue
        if m == 0xD9:  # EOI
            if pstate is not None and pstate["scans"]:
                return _reconstruct_progressive(pstate, qtabs)
            raise ValueError("JPEG has no scan data")
        if i + 4 > len(buf):
            break
        seglen = struct.unpack(">H", buf[i + 2:i + 4])[0]
        seg = buf[i + 4:i + 2 + seglen]
        i += 2 + seglen
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j:j + 128],
                                         dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j:j + 64],
                                         dtype=np.uint8).astype(np.int64)
                    j += 64
                qtabs[tq] = vals          # zigzag order, as stored
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                htabs[(tc, th)] = _decode_map(bits, vals)
                j += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
            frame_marker = m
            progressive = m == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                ch, cv = hv >> 4, hv & 15
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {ch}x{cv} "
                        f"for component {cid} (this decoder handles 1-2)")
                comps.append((cid, ch, cv, tq))
            size = (h, w)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential and progressive JPEG are "
                f"supported (SOF marker 0xFF{m:02X})")
        elif m == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            if comps is None or frame_marker is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                match = [x for x in comps if x[0] == cs]
                if not match:
                    raise ValueError(f"JPEG SOS references unknown "
                                     f"component {cs}")
                (cid, ch, cv, tq) = match[0]
                scan.append((cid, ch, cv, tq, tt >> 4, tt & 15))
            segs, i = _split_scan(buf, i)
            if not progressive:
                if ns == len(comps) and pstate is None:
                    return _decode_scan(size, scan, qtabs, htabs, segs,
                                        restart)
                # sequential frame split across non-interleaved scans
                if pstate is None:
                    pstate = _init_progressive(size, comps)
                _decode_sequential_scan(pstate, scan, htabs, segs, restart)
                continue
            if pstate is None:
                pstate = _init_progressive(size, comps)
            ss, se, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            _decode_progressive_scan(pstate, scan, htabs, segs, restart,
                                     ss, se, aa >> 4, aa & 15)
        # else: APPn/COM/etc — skipped
    if pstate is not None and pstate["scans"]:
        # every scan decoded but the trailing EOI is missing (a common
        # partial-download shape) — the coefficients are complete
        return _reconstruct_progressive(pstate, qtabs)
    raise ValueError("truncated JPEG (no SOS)")


def _decode_block(rd: _BitReader, vec: np.ndarray, pred: int,
                  dc: dict, ac: dict) -> int:
    """Full-band sequential block decode (T.81 F.2.2): DC diff + AC runs
    into ``vec`` (zigzag int32). Returns the updated DC predictor. Shared
    by the interleaved fast path and the multi-scan sequential path."""
    s = rd.huff(dc)
    pred += _extend(rd.receive(s), s)
    vec[0] = pred
    k = 1
    while k < 64:
        rs = rd.huff(ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if rs != 0xF0:
                break      # EOB
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overflow")
        vec[k] = _extend(rd.receive(s), s)
        k += 1
    return pred


def _decode_scan(size, scan, qtabs, htabs, segs, restart) -> np.ndarray:
    h, w = size
    hmax = max(c[1] for c in scan)
    vmax = max(c[2] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    per_comp = []
    for (cid, ch, cv, tq, td, ta) in scan:
        if tq not in qtabs:
            raise ValueError(f"JPEG component {cid} references "
                             f"undeclared quantization table {tq}")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError(f"JPEG component {cid} references "
                             f"undeclared Huffman table (dc={td}, ac={ta})")
        per_comp.append({
            "h": ch, "v": cv, "q": qtabs[tq],
            "dc": htabs[(0, td)], "ac": htabs[(1, ta)],
            "blocks": np.zeros((mcus_y * cv, mcus_x * ch, 64),
                               dtype=np.int32),
        })
    if len(scan) == 1:
        # non-interleaved single-component scan: MCU = one block over the
        # component's own 8x8 grid (T.81 A.2.2)
        c = per_comp[0]
        c["h"] = c["v"] = 1
        c["blocks"] = np.zeros((-(-h // 8), -(-w // 8), 64), dtype=np.int32)
        mcus_y, mcus_x = c["blocks"].shape[:2]
        n_mcus = mcus_y * mcus_x
        hmax = vmax = 1

    mcu = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = [0] * len(per_comp)
        end = min(n_mcus, mcu + restart) if restart else n_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcus_x)
            for ci, c in enumerate(per_comp):
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        vec = np.zeros(64, dtype=np.int32)
                        pred[ci] = _decode_block(rd, vec, pred[ci],
                                                 c["dc"], c["ac"])
                        c["blocks"][my * c["v"] + bv,
                                    mx * c["h"] + bh] = vec
            mcu += 1
        if mcu >= n_mcus:
            break
    if mcu < n_mcus:
        raise ValueError("truncated JPEG scan")
    return _reconstruct(per_comp, h, w, hmax, vmax)


def _reconstruct(per_comp, h, w, hmax, vmax) -> np.ndarray:
    """Dequantize + IDCT + upsample + color transform (shared by the
    baseline and progressive paths; both store zigzag int32 coefficients)."""
    planes = []
    for c in per_comp:
        by, bx, _ = c["blocks"].shape
        coef = c["blocks"].reshape(-1, 64).astype(np.float64)
        deq = np.empty_like(coef)
        deq[:, _ZZ] = coef * c["q"][None, :].astype(np.float64)
        blocks = deq.reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", _C.T, blocks, _C) + 128.0
        plane = pix.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(by * 8, bx * 8)
        ry, rx = vmax // max(c["v"], 1), hmax // max(c["h"], 1)
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return out[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G.2)
# ---------------------------------------------------------------------------

def _init_progressive(size, comps) -> dict:
    """Allocate the cross-scan coefficient state for an SOF2 frame."""
    h, w = size
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    state = {"size": size, "hmax": hmax, "vmax": vmax,
             "mcus_x": mcus_x, "mcus_y": mcus_y,
             "comps": {}, "order": [c[0] for c in comps], "scans": 0,
             # component ids whose coefficient DATA actually arrived
             # (sequential: any scan; progressive: the mandatory first
             # DC scan, T.81 G.1.1.1.1) — reconstruction refuses to
             # fabricate a plane for an uncovered component
             "covered": set()}
    for (cid, ch, cv, tq) in comps:
        state["comps"][cid] = {
            "h": ch, "v": cv, "tq": tq,
            # MCU-padded storage; non-interleaved scans touch only the
            # component's true block grid (A.2.2): ceil(ceil(dim*f/fmax)/8)
            "blocks": np.zeros((mcus_y * cv, mcus_x * ch, 64),
                               dtype=np.int32),
            "th": -(-(-(-h * cv // vmax)) // 8),
            "tw": -(-(-(-w * ch // hmax)) // 8),
        }
    return state


def _scan_groups(mcus_y: int, mcus_x: int, comps) -> list[tuple]:
    """Restart-interval groups for one scan: MCUs when interleaved,
    single data units over the component's true block grid otherwise
    (T.81 A.2.2/A.2.3). ``comps`` entries need keys h, v, th, tw; units
    are labeled (scan-component-index, block_y, block_x). The SAME
    geometry drives the decoder and the progressive encoder — one
    implementation so they cannot desynchronize."""
    if len(comps) == 1:
        c = comps[0]
        return [((0, by, bx),)
                for by in range(c["th"]) for bx in range(c["tw"])]
    groups = []
    for mcu in range(mcus_y * mcus_x):
        my, mx = divmod(mcu, mcus_x)
        g = []
        for ci, c in enumerate(comps):
            for bv in range(c["v"]):
                for bh in range(c["h"]):
                    g.append((ci, my * c["v"] + bv, mx * c["h"] + bh))
        groups.append(tuple(g))
    return groups


def _decode_sequential_scan(st, scan, htabs, segs, restart) -> None:
    """One scan of a MULTI-scan sequential (SOF0/SOF1) frame — T.81 lets
    a baseline frame split its components across non-interleaved scans
    (each carrying full-band DC+AC); accumulate into the shared
    coefficient state and reconstruct at EOI, like the progressive path."""
    comps = []
    for (cid, ch, cv, tq, td, ta) in scan:
        c = st["comps"][cid]
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError(f"JPEG component {cid} references "
                             f"undeclared Huffman table (dc={td}, ac={ta})")
        comps.append({"blocks": c["blocks"], "h": c["h"], "v": c["v"],
                      "th": c["th"], "tw": c["tw"],
                      "dc": htabs[(0, td)], "ac": htabs[(1, ta)]})
        st["covered"].add(cid)
    st["scans"] += 1
    groups = _scan_groups(st["mcus_y"], st["mcus_x"], comps)
    n_groups = len(groups)
    done = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = [0] * len(comps)
        end = min(n_groups, done + restart) if restart else n_groups
        while done < end:
            for (ci, by, bx) in groups[done]:
                c = comps[ci]
                pred[ci] = _decode_block(rd, c["blocks"][by, bx],
                                         pred[ci], c["dc"], c["ac"])
            done += 1
        if done >= n_groups:
            break
    if done < n_groups:
        raise ValueError("truncated JPEG scan")


def _decode_progressive_scan(st, scan, htabs, segs, restart,
                             ss, se, ah, al) -> None:
    """Decode one progressive scan into the persistent coefficient state.

    ``ss``/``se`` select the spectral band, ``ah``/``al`` the successive-
    approximation bit position (T.81 G.1.1.1). Restart markers reset the
    DC predictors and the EOB run, exactly as in sequential mode.
    """
    if ss == 0 and se != 0:
        raise ValueError("invalid progressive JPEG scan: DC scan "
                         f"with Se={se}")
    if ss > 0 and len(scan) != 1:
        raise ValueError("invalid progressive JPEG scan: interleaved "
                         "AC scan")
    if not (0 <= ss <= se <= 63):
        raise ValueError(f"invalid progressive JPEG band {ss}..{se}")
    comps = []
    for (cid, ch, cv, tq, td, ta) in scan:
        c = st["comps"][cid]
        ent = {"blocks": c["blocks"], "h": c["h"], "v": c["v"],
               "th": c["th"], "tw": c["tw"], "dc": None, "ac": None}
        if ss == 0 and ah == 0:
            if (0, td) not in htabs:
                raise ValueError(f"JPEG component {cid} references "
                                 f"undeclared Huffman table (dc={td})")
            ent["dc"] = htabs[(0, td)]
            st["covered"].add(cid)
        if ss > 0:
            if (1, ta) not in htabs:
                raise ValueError(f"JPEG component {cid} references "
                                 f"undeclared Huffman table (ac={ta})")
            ent["ac"] = htabs[(1, ta)]
        comps.append(ent)
    st["scans"] += 1
    groups = _scan_groups(st["mcus_y"], st["mcus_x"], comps)
    n_groups = len(groups)
    done = 0
    for seg in segs:
        rd = _BitReader(seg)
        pred = [0] * len(comps)
        eobrun = 0
        end = min(n_groups, done + restart) if restart else n_groups
        while done < end:
            for (ci, by, bx) in groups[done]:
                c = comps[ci]
                vec = c["blocks"][by, bx]
                if ss == 0:
                    if ah == 0:  # DC first: diffs in the shifted domain
                        s = rd.huff(c["dc"])
                        pred[ci] += _extend(rd.receive(s), s)
                        vec[0] = pred[ci] << al
                    elif rd.receive(1):  # DC refinement: one raw bit
                        vec[0] = int(vec[0]) | (1 << al)
                elif ah == 0:
                    eobrun = _ac_first(rd, vec, ss, se, al, c["ac"], eobrun)
                else:
                    eobrun = _ac_refine(rd, vec, ss, se, al, c["ac"], eobrun)
            done += 1
        if done >= n_groups:
            break
    if done < n_groups:
        raise ValueError("truncated JPEG scan")


def _ac_first(rd, vec, ss, se, al, ac, eobrun) -> int:
    """First AC scan of a band for one block (T.81 G.2.2, Figure G.3)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.huff(ac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:  # EOBn: run of (1<<r)-1 more all-zero-band blocks
                return (1 << r) - 1 + (rd.receive(r) if r else 0)
            k += 16      # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        vec[k] = _extend(rd.receive(s), s) << al
        k += 1
    return 0


def _ac_refine(rd, vec, ss, se, al, ac, eobrun) -> int:
    """AC refinement scan for one block (T.81 G.2.2, Figures G.7/G.10):
    newly-significant coefficients arrive as (run, 1) symbols + sign bit;
    already-nonzero coefficients consume one correction bit each as the
    run passes over them; EOB runs carry the remaining correction bits."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.huff(ac)
            r, s = rs >> 4, rs & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("invalid JPEG refinement code")
                newval = p1 if rd.receive(1) else m1
            elif r != 15:
                eobrun = (1 << r) + (rd.receive(r) if r else 0)
                break
            # advance over r zero-history positions; nonzero-history
            # positions are skipped and take a correction bit instead
            while k <= se:
                cur = int(vec[k])
                if cur != 0:
                    if rd.receive(1) and (cur & p1) == 0:
                        vec[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval and k <= se:
                vec[k] = newval
            k += 1
    if eobrun > 0:
        # block ends inside an EOB run: correction bits only
        while k <= se:
            cur = int(vec[k])
            if cur != 0:
                if rd.receive(1) and (cur & p1) == 0:
                    vec[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(st, qtabs) -> np.ndarray:
    h, w = st["size"]
    missing = [cid for cid in st["order"] if cid not in st["covered"]]
    if missing:
        # a frame component no scan ever carried (sequential) or whose
        # mandatory first DC scan is absent (progressive): its plane would
        # be fabricated neutral gray — malformed, not merely coarse
        raise ValueError("JPEG scans never covered frame component(s) "
                         f"{missing}")
    per_comp = []
    for cid in st["order"]:
        c = st["comps"][cid]
        if c["tq"] not in qtabs:
            raise ValueError(f"JPEG component {cid} references "
                             f"undeclared quantization table {c['tq']}")
        per_comp.append({"h": c["h"], "v": c["v"], "q": qtabs[c["tq"]],
                         "blocks": c["blocks"]})
    return _reconstruct(per_comp, h, w, st["hmax"], st["vmax"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _optimal_table(freq: list[int]) -> tuple[list[int], list[int]]:
    """Huffman table generation per T.81 Annex K.2 (Figures K.1-K.4):
    merge the two least-frequent symbols tracking code sizes through the
    ``others`` chain, limit code lengths to 16, and list symbols in
    (code size, symbol value) order. Symbol 256 is the reserved filler
    that guarantees no code is all one-bits."""
    freq = list(freq) + [1]
    others = [-1] * 257
    codesize = [0] * 257
    while True:
        c1 = c2 = -1
        v = None
        for j in range(257):
            if freq[j] and (v is None or freq[j] <= v):
                v = freq[j]
                c1 = j
        v = None
        for j in range(257):
            if freq[j] and j != c1 and (v is None or freq[j] <= v):
                v = freq[j]
                c2 = j
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for j in range(257):
        if codesize[j] > 32:  # needs Fibonacci-like counts ~F(34); explicit
            raise ValueError("JPEG Huffman code length overflow")
        if codesize[j]:
            bits[codesize[j]] += 1
    i = 32
    while i > 16:  # Figure K.3 ADJUST_BITS
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved symbol's code
    vals = [j for sz in range(1, 33)
            for j in range(256) if codesize[j] == sz]
    return bits[1:17], vals


class _SymCounter:
    """Counting sink for the first (statistics) pass of a scan."""

    def __init__(self):
        self.freq = [0] * 256

    def sym(self, s: int) -> None:
        self.freq[s] += 1

    def bits(self, v: int, n: int) -> None:
        pass


class _SymEmitter:
    """Huffman-coding sink for the second (emission) pass of a scan."""

    def __init__(self, bw: _BitWriter, codes: dict):
        self.bw = bw
        self.codes = codes

    def sym(self, s: int) -> None:
        code, ln = self.codes[s]
        self.bw.write(code, ln)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(base):
        return np.clip((base * scale + 50) // 100, 1, 255)
    return sc(_Q_LUM), sc(_Q_CHROM)


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _block_quant(plane: np.ndarray, qtab_zz: np.ndarray) -> np.ndarray:
    """float plane (multiple-of-8 dims) -> int32 [by, bx, 64] zigzag coefs."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ij,njk,kl->nil", _C, blocks, _C.T).reshape(-1, 64)
    zz = coef[:, _ZZ]
    q = np.floor(zz / qtab_zz[None, :].astype(np.float64) + 0.5) \
        .astype(np.int32)
    return q.reshape(by, bx, 64)


def _encode_block(bw: _BitWriter, vec: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(vec[0]) - pred
    s = int(abs(diff)).bit_length()
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(vec[1:])[0]
    k = 0
    for idx in nz:
        pos = int(idx) + 1
        run = pos - 1 - k
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        v = int(vec[pos])
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k = pos
    if k < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(vec[0])


def _frame_header(gray: bool, h: int, w: int, samp, qlum_zz, qchrom_zz,
                  sof_marker: int) -> bytearray:
    """SOI + JFIF APP0 + DQT(s) + SOF, shared by both encoder modes."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qlum_zz.astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([0x01]) + bytes(qchrom_zz.astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += _seg(sof_marker, sof)
    return out


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = False,
                restart_interval: int = 0,
                progressive: bool = False) -> bytes:
    """uint8 [h, w], [h, w, 1] or [h, w, 3] -> JFIF bytes.

    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (T.81 F.1.2.3) — resynchronization points a parallel decoder can split
    on. ``progressive=True`` writes an SOF2 successive-approximation
    stream carrying the SAME quantized coefficients as baseline mode, so
    the two decode bit-identically."""
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum, qchrom = _quality_tables(quality)
    qlum_zz, qchrom_zz = qlum[_ZZ], qchrom[_ZZ]

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qzz = [qlum_zz]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            y = _pad_to(y, 16, 16)
            cbp = _pad_to(cb, 16, 16)
            crp = _pad_to(cr, 16, 16)
            cb = cbp.reshape(cbp.shape[0] // 2, 2,
                             cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2,
                             crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            y, cb, cr = (_pad_to(p, 8, 8) for p in (y, cb, cr))
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qzz = [qlum_zz, qchrom_zz, qchrom_zz]

    blocks = [_block_quant(_pad_to(p, 8, 8), q)
              for p, q in zip(planes, qzz)]

    if progressive:
        if restart_interval:
            raise ValueError("restart markers are not supported by the "
                             "progressive encoder")
        return _encode_progressive(blocks, samp, h, w, gray,
                                   qlum_zz, qchrom_zz)

    dc_lum = _canonical_codes(*_DC_LUM)
    ac_lum = _canonical_codes(*_AC_LUM)
    dc_chrom = _canonical_codes(*_DC_CHROM)
    ac_chrom = _canonical_codes(*_AC_CHROM)
    codes = [(dc_lum, ac_lum)] + [(dc_chrom, ac_chrom)] * (len(planes) - 1)

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bw = _BitWriter()
    pred = [0] * len(planes)
    entropy = bytearray()
    rst = 0
    for mcu in range(mcus_y * mcus_x):
        if restart_interval and mcu and mcu % restart_interval == 0:
            entropy += bw.flush()
            entropy += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            bw = _BitWriter()
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (sh, sv) in enumerate(samp):
            for bv in range(sv):
                for bh in range(sh):
                    vec = blocks[ci][my * sv + bv, mx * sh + bh]
                    pred[ci] = _encode_block(
                        bw, vec, pred[ci], *codes[ci])
    entropy += bw.flush()
    entropy = bytes(entropy)

    out = _frame_header(gray, h, w, samp, qlum_zz, qchrom_zz, 0xC0)
    ncomp = 1 if gray else 3
    for (tc, th, spec) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM)):
        out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(spec[0])
                    + bytes(spec[1]))
    if not gray:
        for (tc, th, spec) in ((0, 1, _DC_CHROM), (1, 1, _AC_CHROM)):
            out += _seg(0xC4, bytes([(tc << 4) | th]) + bytes(spec[0])
                        + bytes(spec[1]))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (T.81 Annex G.1)
# ---------------------------------------------------------------------------

def _enc_dc_first(groups, blocks, al, em) -> None:
    """First DC scan: Huffman-coded diffs of the point-transformed
    (arithmetic-shift, G.1.2.1) DC coefficients."""
    pred = {}
    for g in groups:
        for (ci, by, bx) in g:
            v = int(blocks[ci][by, bx, 0]) >> al
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s = abs(diff).bit_length()
            em.sym(s)
            em.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(groups, blocks, al, em) -> None:
    """DC refinement: one raw bit per block, no Huffman coding."""
    for g in groups:
        for (ci, by, bx) in g:
            em.bits((int(blocks[ci][by, bx, 0]) >> al) & 1, 1)


def _enc_ac_first(groups, blocks, ss, se, al, em) -> None:
    """First AC scan of a band (G.1.2.2): runs, ZRL, and EOBn codes whose
    appended bits carry the low bits of the end-of-band run length."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(nb << 4)
            em.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    for g in groups:
        for (ci, by, bx) in g:
            vec = blocks[ci][by, bx]
            r = 0
            for k in range(ss, se + 1):
                t = int(vec[k])
                a = (t if t >= 0 else -t) >> al  # AC point transform: /2^Al
                if a == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    em.sym(0xF0)
                    r -= 16
                s = a.bit_length()
                em.sym((r << 4) | s)
                em.bits(a if t >= 0 else -a + (1 << s) - 1, s)
                r = 0
            if r:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def _enc_ac_refine(groups, blocks, ss, se, al, em) -> None:
    """AC refinement scan (G.1.2.3): newly-significant coefficients
    (|coef| >> Al == 1) emit (run, 1) + a sign bit; coefficients already
    significant emit buffered correction bits; trailing zero runs fold
    into an EOB run that carries its buffered bits."""
    eobrun = 0
    pend: list[int] = []  # correction bits deferred across the EOB run

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(nb << 4)
            em.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0
        for b in pend:
            em.bits(b, 1)
        pend = []

    for g in groups:
        for (ci, by, bx) in g:
            vec = blocks[ci][by, bx]
            band = [int(vec[k]) for k in range(ss, se + 1)]
            a = [(t if t >= 0 else -t) >> al for t in band]
            eob = -1  # position of the last newly-significant coefficient
            for j, av in enumerate(a):
                if av == 1:
                    eob = j
            r = 0
            br: list[int] = []  # correction bits within the current block
            for j, av in enumerate(a):
                if av == 0:
                    r += 1
                    continue
                # ZRLs are due at EVERY nonzero position (history ones
                # included) so the buffered correction bits stay aligned
                # with the decoder's positional walk — but never past the
                # last new coefficient, where zeros fold into the EOB run
                while r > 15 and j <= eob:
                    flush_eob()
                    em.sym(0xF0)
                    r -= 16
                    for b in br:
                        em.bits(b, 1)
                    br = []
                if av > 1:  # history coefficient: defer its correction bit
                    br.append(av & 1)
                    continue
                flush_eob()
                em.sym((r << 4) | 1)
                em.bits(1 if band[j] >= 0 else 0, 1)
                for b in br:
                    em.bits(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pend.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


# the standard IJG progressive scan scripts (spectral selection bands and
# successive-approximation schedule), expressed as (comps, Ss, Se, Ah, Al)
_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1), ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1), ((0,), 0, 0, 1, 0), ((0,), 1, 63, 1, 0))
_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2), ((2,), 1, 63, 0, 1), ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2), ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((0,), 1, 63, 1, 0))


def _encode_progressive(blocks, samp, h, w, gray,
                        qlum_zz, qchrom_zz) -> bytes:
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # true per-component block grids (A.2.2) — may be smaller than the
    # MCU-padded coefficient arrays for non-interleaved scans
    dims = [(-(-(-(-h * sv // vmax)) // 8), -(-(-(-w * sh // hmax)) // 8))
            for (sh, sv) in samp]

    out = _frame_header(gray, h, w, samp, qlum_zz, qchrom_zz, 0xC2)
    for (cis, ss, se, ah, al) in (_SCRIPT_GRAY if gray else _SCRIPT_COLOR):
        # the decoder's own unit geometry, with scan-local component
        # labels mapped back to global block-array indices
        ents = [{"h": samp[ci][0], "v": samp[ci][1],
                 "th": dims[ci][0], "tw": dims[ci][1]} for ci in cis]
        groups = [tuple((cis[ci], by, bx) for (ci, by, bx) in g)
                  for g in _scan_groups(mcus_y, mcus_x, ents)]

        def run(em):
            if ss == 0 and ah == 0:
                _enc_dc_first(groups, blocks, al, em)
            elif ss == 0:
                _enc_dc_refine(groups, blocks, al, em)
            elif ah == 0:
                _enc_ac_first(groups, blocks, ss, se, al, em)
            else:
                _enc_ac_refine(groups, blocks, ss, se, al, em)

        counter = _SymCounter()
        run(counter)
        codes = {}
        if any(counter.freq):  # DC refinement scans code no symbols
            bits, vals = _optimal_table(counter.freq)
            codes = _canonical_codes(bits, vals)
            tc = 0 if ss == 0 else 1
            out += _seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(vals))
        bw = _BitWriter()
        run(_SymEmitter(bw, codes))
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
