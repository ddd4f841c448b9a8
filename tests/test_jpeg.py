"""Baseline JPEG codec tests (sema_ray.jpeg).

The hand-built fixtures below are derived byte-by-byte from ITU-T T.81
(markers, canonical Huffman, EXTEND, IDCT scaling) — an INDEPENDENT spec
oracle, not produced by the encoder under test, so an encoder/decoder bug
pair cannot cancel out.
"""

import struct

import numpy as np
import pytest

from sema_ray.jpeg import _C, _ZZ, decode_jpeg, encode_jpeg


def test_dct_matrix_orthonormal_and_zigzag_spec_prefix():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)
    # T.81 Figure A.6 natural-index order, first 10 entries
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZZ) == list(range(64))


def _dc_only_gray_jpeg(dc_code_bits: str) -> bytes:
    """Hand-assembled 8x8 grayscale JPEG: quant table all ones, one-code
    Huffman tables (DC: category 7 -> code '0'; AC: EOB -> code '0'),
    entropy segment = '0' + 7 magnitude bits + '0' EOB, padded with 1s."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x07]))
    out += seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bits = "0" + dc_code_bits + "0"
    bits += "1" * (-len(bits) % 8)
    out += int(bits, 2).to_bytes(len(bits) // 8, "big")
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_hand_built_spec_fixture():
    # DC diff +80 (category 7, magnitude bits 1010000):
    # pixel = IDCT(dc-only 80) + 128 = 80/8 + 128 = 138 everywhere
    img = decode_jpeg(_dc_only_gray_jpeg(format(80, "07b")))
    assert img.shape == (8, 8, 1)
    assert (img == 138).all()
    # DC diff -80: EXTEND(47, 7) = -80 -> 118 everywhere
    img2 = decode_jpeg(_dc_only_gray_jpeg(format(-80 + 127, "07b")))
    assert (img2 == 118).all()


def test_roundtrip_color_and_gray():
    rng = np.random.default_rng(3)
    y, x = np.mgrid[0:45, 0:61]
    img = np.stack([np.minimum(x * 4, 255), np.minimum(y * 5, 255),
                    (x + y)], axis=2)
    img = np.clip(img + rng.integers(-3, 4, img.shape), 0,
                  255).astype(np.uint8)
    for q, sub in ((95, False), (90, True), (70, False)):
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 6.0, (q, sub, err.mean())
    gray = np.minimum(x * 4, 255).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(gray, quality=95))
    assert dg.shape == (45, 61, 1)
    assert np.abs(dg[:, :, 0].astype(int) - gray.astype(int)).mean() < 2.0


def test_solid_color_exact_and_single_pixel():
    solid = np.full((24, 40, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(solid, quality=95)) == 77).all()
    one = np.full((1, 1, 3), 200, np.uint8)
    dec = decode_jpeg(encode_jpeg(one, quality=95))
    assert dec.shape == (1, 1, 3)
    assert np.abs(dec.astype(int) - 200).max() <= 1


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(33, 50, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    for ri in (1, 2, 5):
        enc = encode_jpeg(img, quality=85, restart_interval=ri)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        # restart segmentation must not change the decoded pixels at all
        assert (decode_jpeg(enc) == base).all()


def test_rejects_lossless_invalid_scan_truncated_and_garbage():
    img = np.full((8, 8), 100, np.uint8)
    enc = bytearray(encode_jpeg(img))
    i = enc.index(b"\xff\xc0")
    enc[i + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless, unsupported)
    with pytest.raises(ValueError, match="SOF marker"):
        decode_jpeg(bytes(enc))
    # SOF0 -> SOF2 turns the baseline full-band scan into an invalid
    # progressive scan (a DC scan must have Se == 0, T.81 G.1.1.1)
    enc[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(img)[:20])
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_rejects_undeclared_tables_and_bad_sampling():
    """Scans naming tables or components never declared must raise the
    module's ValueError contract (not KeyError/StopIteration), and
    sampling factors outside the supported 1-2 range are rejected at SOF
    parse instead of crashing in numpy."""
    img = np.full((8, 8), 100, np.uint8)
    base = encode_jpeg(img)

    def mut(marker, off, value):
        enc = bytearray(base)
        i = enc.index(marker)
        enc[i + off] = value
        return bytes(enc)

    # SOS component-spec byte: cs at marker+5 (after len(2), ns(1))
    with pytest.raises(ValueError, match="unknown component"):
        decode_jpeg(mut(b"\xff\xda", 5, 9))
    # SOS table byte: dc/ac table 3 never sent in DHT
    with pytest.raises(ValueError, match="Huffman table"):
        decode_jpeg(mut(b"\xff\xda", 6, 0x33))
    # SOF comp0 tq at marker+12 (len 2, prec 1, h 2, w 2, nc 1, cid 1, hv 1)
    with pytest.raises(ValueError, match="quantization table"):
        decode_jpeg(mut(b"\xff\xc0", 12, 3))
    # SOF comp0 hv: h=3 is outside the documented 1-2 support
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(mut(b"\xff\xc0", 11, 0x31))


def _progressive_dc_fixture() -> bytes:
    """Hand-assembled 8x8 grayscale SOF2 JPEG, derived bit-by-bit from
    T.81 Annex G (independent of the encoder under test): quant all ones,
    scan 1 = DC first (Al=1) carrying diff -41 (category 6 -> huff '0',
    magnitude bits -41+63=22='010110'), scan 2 = DC refinement (one raw
    bit, 1). Decoder state: -41<<1 = -82, then -82|1 = -81; the dc-only
    IDCT gives round(128 - 81/8) = 118 everywhere."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x06]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
    out += bytes([0b00101101])           # '0' + '010110' + pad '1'
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
    out += bytes([0xFF, 0x00])           # '1' + pad '1111111', stuffed
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_hand_built_spec_fixture():
    img = decode_jpeg(_progressive_dc_fixture())
    assert img.shape == (8, 8, 1)
    assert (img == 118).all()


def test_progressive_roundtrip_bit_exact_vs_baseline():
    """Baseline and progressive modes quantize identical coefficients, so
    their decodes must agree EXACTLY — any asymmetric bug in the Annex G
    scan codecs (EOB runs, refinement bits, ZRL, point transforms) breaks
    this equality."""
    rng = np.random.default_rng(7)
    y, x = np.mgrid[0:33, 0:50]
    smooth = np.stack([np.minimum(x * 5, 255), np.minimum(y * 7, 255),
                       ((x + y) * 2) % 256], axis=2).astype(np.uint8)
    noisy = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    sparse = np.zeros((48, 64, 3), np.uint8)       # long EOB runs, EOBn>0
    sparse[20:28, 30:38] = 255
    for img in (smooth, noisy, sparse):
        for q, sub in ((95, False), (85, True), (60, True), (30, False)):
            enc = encode_jpeg(img, quality=q, subsample=sub,
                              progressive=True)
            assert b"\xff\xc2" in enc
            base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            assert (decode_jpeg(enc) == base).all(), (img.shape, q, sub)
    gray = np.minimum(x * 5, 255).astype(np.uint8)
    for q in (95, 40):
        enc = encode_jpeg(gray, quality=q, progressive=True)
        assert (decode_jpeg(enc)
                == decode_jpeg(encode_jpeg(gray, quality=q))).all()


def test_progressive_rejects_restart_encoding():
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(np.full((8, 8), 9, np.uint8), progressive=True,
                    restart_interval=2)


def test_progressive_restart_interval_decode():
    """Hand-assembled 8x16 gray SOF2 stream with DRI=1: a DC-first scan
    split by RST0 must reset the DC predictor per restart segment (T.81
    F.1.2.3 applies to progressive scans too). Both blocks carry diff +80
    (category 7 -> huff '0', bits 1010000) -> 138 everywhere; a decoder
    that failed to reset the predictor would render block 2 at 148."""
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0x07]))
    out += seg(0xDD, struct.pack(">H", 1))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    unit = bytes([0b01010000])           # '0' + '1010000' (+0 pad)
    out += unit + b"\xff\xd0" + unit     # RST0 between the two data units
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img.shape == (8, 16, 1)
    assert (img == 138).all()


def _build_multiscan_sequential(img, q, scan_comps):
    """Assemble a non-interleaved multi-scan SOF0 stream from the encoder's
    own primitives, emitting one scan per component index in
    ``scan_comps`` (the full stream is ``(0, 1, 2)``)."""
    from sema_ray.jpeg import (_AC_CHROM, _AC_LUM, _BitWriter, _DC_CHROM,
                               _DC_LUM, _ZZ, _block_quant, _canonical_codes,
                               _encode_block, _pad_to, _quality_tables)

    qlum, qchrom = _quality_tables(q)
    qlum_zz, qchrom_zz = qlum[_ZZ], qchrom[_ZZ]
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    planes = [0.299 * r + 0.587 * g + 0.114 * b,
              128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
              128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    qzz = [qlum_zz, qchrom_zz, qchrom_zz]
    blocks = [_block_quant(_pad_to(p, 8, 8), z)
              for p, z in zip(planes, qzz)]

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(qlum_zz.astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qchrom_zz.astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, img.shape[0], img.shape[1], 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for (tc, th, spec) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM),
                           (0, 1, _DC_CHROM), (1, 1, _AC_CHROM)):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(spec[0])
                   + bytes(spec[1]))
    codes = [( _canonical_codes(*_DC_LUM), _canonical_codes(*_AC_LUM)),
             (_canonical_codes(*_DC_CHROM), _canonical_codes(*_AC_CHROM)),
             (_canonical_codes(*_DC_CHROM), _canonical_codes(*_AC_CHROM))]
    for ci in scan_comps:  # one non-interleaved scan per component
        out += seg(0xDA, bytes([1, ci + 1,
                                0x00 if ci == 0 else 0x11, 0, 63, 0]))
        bw = _BitWriter()
        pred = 0
        by, bx, _ = blocks[ci].shape
        for yy in range(by):
            for xx in range(bx):
                pred = _encode_block(bw, blocks[ci][yy, xx], pred,
                                     *codes[ci])
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_multiscan_sequential_baseline_decode():
    """T.81 lets a sequential (SOF0) frame split its components across
    non-interleaved scans; the decode must be bit-identical to the
    interleaved decode of the same quantized coefficients."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(21, 34, 3), dtype=np.uint8)
    q = 90
    dec = decode_jpeg(_build_multiscan_sequential(img, q, (0, 1, 2)))
    base = decode_jpeg(encode_jpeg(img, quality=q))
    assert dec.shape == base.shape == (21, 34, 3)
    assert (dec == base).all()


def test_multiscan_missing_component_rejected():
    """A sequential frame whose scans never cover some component must raise
    (round-5 review: it previously decoded with the missing planes silently
    defaulted to neutral gray — fabricated color, not a coarse preview).
    Same for a progressive stream whose DC scan is absent for a component."""
    import pytest
    from sema_ray.jpeg import _split_scan

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(21, 34, 3), dtype=np.uint8)
    for comps in ((0,), (0, 1), (1, 2)):
        with pytest.raises(ValueError, match="never covered"):
            decode_jpeg(_build_multiscan_sequential(img, 90, comps))
    # progressive: drop the first (DC, all-components) scan so only AC
    # scans remain — every component then lacks its mandatory DC scan
    enc = encode_jpeg(img, quality=80, progressive=True)
    first_sos = enc.index(b"\xff\xda")
    seglen = struct.unpack(">H", enc[first_sos + 2:first_sos + 4])[0]
    _, after_scan = _split_scan(enc, first_sos + 2 + seglen)
    with pytest.raises(ValueError, match="never covered"):
        decode_jpeg(enc[:first_sos] + enc[after_scan:])


def test_malformed_streams_raise_valueerror_and_missing_eoi_decodes():
    """Corrupted streams must surface as the module's ValueError contract
    (never raw IndexError/OverflowError from parse internals), and a
    progressive stream missing only its trailing EOI — the common
    partial-download shape — still decodes: every scan is complete."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    for prog in (False, True):
        enc = bytearray(encode_jpeg(img, quality=80, progressive=prog))
        for t in range(150):
            e2 = bytearray(enc)
            pos = int(rng.integers(2, len(e2)))
            e2[pos] ^= 1 << int(rng.integers(0, 8))
            try:
                decode_jpeg(bytes(e2))
            except ValueError:
                pass  # the only acceptable failure type
    full = encode_jpeg(img, quality=80, progressive=True)
    assert (decode_jpeg(full[:-2]) == decode_jpeg(full)).all()
