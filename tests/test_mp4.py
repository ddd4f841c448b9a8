"""ISO BMFF demuxer tests (sema_ray.mp4).

``_hand_built_mp4`` is assembled field-by-field from ISO/IEC 14496-12
(box sizes, full-box version/flags, 1-based stss/stsc indices, co64) —
an INDEPENDENT spec oracle, not produced by mux_mp4, so a muxer/demuxer
bug pair cannot cancel out. It deliberately uses the code paths the muxer
does not emit: co64 offsets, a two-run stsc with different
samples-per-chunk, and a version-1 mdhd.
"""

import struct

import numpy as np
import pytest

from sema_ray.mp4 import demux_mp4, mux_mp4, sample_frames


def _box(t, body):
    return struct.pack(">I", len(body) + 8) + t + body


def _full(t, ver, flags, body):
    return _box(t, bytes([ver]) + flags.to_bytes(3, "big") + body)


def _hand_built_mp4():
    """5 samples (sizes 10,20,30,40,50), chunks of (2,2,1) via a 2-run
    stsc, co64 offsets, stts runs (3 x 100, 2 x 200), stss = {1, 4}."""
    payload = b"".join(bytes([i + 1]) * sz
                       for i, sz in enumerate([10, 20, 30, 40, 50]))
    ftyp = _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isom")
    mdat = _box(b"mdat", payload)
    base = len(ftyp) + 8
    # chunk starts: s0, s2, s4
    co = [base, base + 30, base + 100]
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(
        b"mp4v", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 32, 24) + b"\x00" * 50))
    stts = _full(b"stts", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">II", 3, 100) + struct.pack(">II", 2, 200))
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">III", 1, 2, 1)
                 + struct.pack(">III", 3, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, 5)
                 + struct.pack(">5I", 10, 20, 30, 40, 50))
    co64 = _full(b"co64", 0, 0, struct.pack(">I", 3)
                 + struct.pack(">3Q", *co))
    stss = _full(b"stss", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">2I", 1, 4))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64 + stss)
    minf = _box(b"minf", stbl)
    # version-1 mdhd: 64-bit times, timescale at offset 20
    mdhd = _full(b"mdhd", 1, 0, struct.pack(">QQIQHH", 0, 0, 600, 700,
                                            0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov, payload, co


def test_demux_hand_built_spec_fixture():
    buf, payload, co = _hand_built_mp4()
    trk = demux_mp4(buf)
    assert trk.timescale == 600
    assert trk.codec == "mp4v" and (trk.width, trk.height) == (32, 24)
    assert [s.size for s in trk.samples] == [10, 20, 30, 40, 50]
    assert [s.dts for s in trk.samples] == [0, 100, 200, 300, 500]
    assert [s.duration for s in trk.samples] == [100, 100, 100, 200, 200]
    assert [s.offset for s in trk.samples] == \
        [co[0], co[0] + 10, co[1], co[1] + 30, co[2]]
    assert [s.sync for s in trk.samples] == [True, False, False, True, False]
    for i, s in enumerate(trk.samples):
        assert buf[s.offset:s.offset + s.size] == bytes([i + 1]) * s.size


def test_mux_demux_roundtrip_and_sampling():
    rng = np.random.default_rng(2)
    samples = [rng.integers(0, 256, int(rng.integers(40, 200)),
                            dtype=np.uint8).tobytes() for _ in range(13)]
    buf = mux_mp4(samples, timescale=90000, sample_duration=3000,
                  samples_per_chunk=5, sync_every=4)
    trk = demux_mp4(buf)
    assert len(trk.samples) == 13
    assert all(buf[s.offset:s.offset + s.size] == samples[s.index]
               for s in trk.samples)
    assert [s.index for s in trk.samples if s.sync] == [0, 4, 8, 12]
    # evenly spaced picks include first and last; pts in track seconds
    fr = sample_frames(buf, 5)
    assert fr[0][0] == 0 and fr[-1][0] == 12
    assert all(abs(t - i * 3000 / 90000) < 1e-9 for i, t, _ in fr)
    assert all(b == samples[i] for i, b, in
               [(i, b) for i, _, b in fr])
    # asking for more frames than exist returns each sample once
    assert [i for i, _, _ in sample_frames(buf, 99)] == list(range(13))


def test_demux_rejects_malformed():
    with pytest.raises(ValueError, match="moov"):
        demux_mp4(b"\x00\x00\x00\x10ftypisomisom")
    buf, _, _ = _hand_built_mp4()
    with pytest.raises(ValueError):
        demux_mp4(buf[:len(buf) // 2])  # moov truncated away / malformed
    # sample range beyond file end: truncate mdat but keep moov intact
    trk = demux_mp4(buf)
    cut = trk.samples[-1].offset + 10
    bad = buf[:cut] + buf[trk.samples[-1].offset + trk.samples[-1].size:]
    with pytest.raises(ValueError):
        demux_mp4(bad)


def test_sample_frames_rounds_half_up():
    """Pick indices round half-UP (the DuckDB-oracle convention), not
    Python's half-even round(): 5 picks over 11 samples hit the 2.5 and
    7.5 midpoints, which must land on frames 3 and 8."""
    samples = [bytes([i]) * 10 for i in range(11)]
    buf = mux_mp4(samples, timescale=1000, sample_duration=40)
    assert [i for i, _, _ in sample_frames(buf, 5)] == [0, 3, 5, 8, 10]


def test_truncated_largesize_box_raises_valueerror():
    # a size==1 (64-bit largesize) header cut off mid-field must raise the
    # module's ValueError contract, not a bare struct.error
    with pytest.raises(ValueError, match="malformed"):
        demux_mp4(b"\x00\x00\x00\x01moov" + b"\x00" * 4)
