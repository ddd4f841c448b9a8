"""Tests for text-analysis operators and multimodal plumbing."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from sema_ray import multimodal, textops


@pytest.fixture(scope="module")
def lang_dir(tmp_path_factory):
    rows = [
        (0, "the quick brown fox is on the hill and it is fast", "en"),
        (1, "der hund ist nicht zu hause und die katze ist im garten", "de"),
        (2, "le chat est dans la maison et les enfants sont pour jouer", "fr"),
        (3, "el perro es grande y la casa es una de las mejores", "es"),
        (4, "这是一个中文文档 机器学习 数据处理 模型训练", "zh"),
        (5, "это русский текст про обработку данных", "ru"),
        (6, "12345 67890 !!!", "und"),
    ]
    d = tmp_path_factory.mktemp("lang")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }), os.path.join(str(d), "documents.parquet"))
    return str(d), {r[0]: r[2] for r in rows}


def test_lang_id_heuristic(ray_session, lang_dir):
    d, want = lang_dir
    df = textops.lang_id(d).to_pandas()  # one materialization: block order
    got = dict(zip(df["doc_id"], df["pred_lang"]))  # varies across runs
    hits = sum(1 for k, v in want.items() if got[k] == v)
    assert hits >= 6, got


def test_doc_fingerprints_deterministic_and_edit_sensitive(ray_session, lang_dir):
    d, _ = lang_dir
    f1 = textops.doc_fingerprints(d).to_pandas().sort_values("doc_id")
    f2 = textops.doc_fingerprints(d).to_pandas().sort_values("doc_id")
    assert f1.equals(f2)
    assert f1["fingerprint"].nunique() == len(f1)


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """Corpus with enough repeated subword structure for merges to matter."""
    texts = (["lower lowest low lowly"] * 6
             + ["new newer newest news"] * 5
             + ["wide wider widest widely"] * 4
             + ["the the the and and or"] * 3
             + ["unrelated zq"])
    d = tmp_path_factory.mktemp("bpe")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        os.path.join(str(d), "documents.parquet"))
    return str(d), texts


def test_word_counts_vs_counter(ray_session, bpe_dir):
    import collections
    import re
    d, texts = bpe_dir
    want = collections.Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    got = textops.word_counts(d, min_freq=2).to_pandas()
    want = {w: n for w, n in want.items() if n >= 2}
    assert dict(zip(got["word"], got["n"])) == want
    # deterministic total order: n desc, word asc
    assert list(got["word"]) == sorted(
        want, key=lambda w: (-want[w], w))


def test_bpe_train_vocab_matches_pure_python(ray_session, bpe_dir):
    """Distributed word-count + merge loop == pure-Python BPE on the raw
    corpus (Sennrich 2016 semantics, lexicographic tie-break)."""
    import collections
    import re
    d, texts = bpe_dir
    cnt = collections.Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    wf = sorted(((w, n) for w, n in cnt.items() if n >= 2),
                key=lambda kv: (-kv[1], kv[0]))
    want = textops.bpe_train_reference(wf, num_merges=25)
    got = textops.bpe_train_vocab(d, num_merges=25, min_freq=2)
    got_rows = list(zip(got["left"].to_pylist(), got["right"].to_pylist(),
                        got["freq"].to_pylist()))
    assert got_rows == want
    assert got["rank"].to_pylist() == list(range(len(want)))
    # merge frequencies never increase faster than the pair they derive from
    assert all(f > 0 for _, _, f in got_rows)
    # round-trip: applying the merges re-segments every frequent word into
    # one token once enough merges are learned
    segs = textops.bpe_apply(["lowest newest"], [(l, r) for l, r, _ in want])
    assert all(len(s) >= 1 for s in segs)


def test_tfidf_top_terms_rare_term_wins(ray_session, tmp_path):
    """A corpus-unique term must rank first for its doc; terms in every doc
    score ln(1) = 0."""
    texts = ["common words here zzqx common words",
             "common words here common words again",
             "common words here and more common words"]
    d = str(tmp_path / "tfidf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        os.path.join(d, "documents.parquet"))
    got = textops.tfidf_top_terms(d, k=3).to_pandas()
    doc0 = got[got["doc_id"] == 0].reset_index(drop=True)
    assert doc0.iloc[0]["term"] == "zzqx"
    assert doc0.iloc[0]["tfidf"] > 0
    # 'common'/'words' appear in all docs -> idf 0
    everywhere = got[got["term"].isin(["common", "words"])]
    assert (everywhere["tfidf"] == 0).all()
    # per-doc top-k bound respected
    assert got.groupby("doc_id").size().max() <= 3


def test_unigram_surprisal_semantics(ray_session, tmp_path):
    # doc 0: only the corpus's most common word -> lowest mean bits;
    # doc 1: all singleton words -> highest; doc 2 sits between
    texts = ["common " * 40,
             "zephyr quixotic brouhaha ephemeral",
             "common common rare1 rare2"]
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    df = textops.unigram_surprisal(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    assert df.loc[0, "mean_bits"] < df.loc[2, "mean_bits"] \
        < df.loc[1, "mean_bits"]
    # exact recompute for doc 0: N=48, c(common)=42 -> floor(log2(1))=0
    assert df.loc[0, "bits"] == 0 and df.loc[0, "n_tok"] == 40
    n_total = 48
    for d, want_toks in ((1, ["zephyr", "quixotic", "brouhaha",
                              "ephemeral"]),
                         (2, ["common", "common", "rare1", "rare2"])):
        counts = {"common": 42, "zephyr": 1, "quixotic": 1, "brouhaha": 1,
                  "ephemeral": 1, "rare1": 1, "rare2": 1}
        want = sum((n_total // counts[w]).bit_length() - 1
                   for w in want_toks)
        assert df.loc[d, "bits"] == want
    # the max_words vocabulary cap: truncated-away words score as count-1
    # OOV — same bits as true singletons, so doc 1 is unchanged
    capped = textops.unigram_surprisal(str(tmp_path), max_words=1) \
        .to_pandas().set_index("doc_id")
    assert capped.loc[0, "bits"] == 0
    assert capped.loc[1, "bits"] >= df.loc[1, "bits"]


def test_decode_stage_plumbing(ray_session):
    items = multimodal.synthesize_binary_items(n=48)
    ds = rd.from_arrow(items)
    out = multimodal.decode_features(ds, batch_size=16).to_pandas()
    assert len(out) == 48
    assert set(out.columns) == {"item_id", "modality", "n_bytes", "feature"}
    assert all(len(f) == multimodal.FEATURE_DIM for f in out["feature"])
    # deterministic: same payload -> same feature
    out2 = multimodal.decode_features(rd.from_arrow(items)).to_pandas()
    m1 = {i: np.asarray(f) for i, f in zip(out["item_id"], out["feature"])}
    m2 = {i: np.asarray(f) for i, f in zip(out2["item_id"], out2["feature"])}
    assert all((m1[i] == m2[i]).all() for i in m1)


def test_ppm_wav_codec_roundtrip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    # comments + arbitrary header whitespace parse like the spec says
    with_comment = (b"P6 # magic\n# a comment line\n23\t17 # dims\n255\n"
                    + img.tobytes())
    assert (multimodal.decode_ppm(with_comment) == img).all()
    x = (rng.standard_normal(1000) * 0.3).astype(np.float64)
    dec, sr = multimodal.decode_wav(multimodal.encode_wav(x, 8000))
    assert sr == 8000 and dec.shape == (1000, 1)
    assert np.abs(dec[:, 0] - np.clip(x, -1, 1)).max() < 2e-4  # 16-bit LSB


def test_decode_stage_real_codec_gated(ray_session):
    """fake=False runs REAL PPM/PNG/JPEG/WAV kernels end to end through
    the actor pool; the one unreachable codec (video frames) raises."""
    items = multimodal.synthesize_real_items(n=14)
    mimes = items["mime"].to_pylist()
    assert {"image/png", "image/x-portable-pixmap",
            "image/jpeg"} <= set(mimes)
    # both T.81 entropy layouts must flow through the pool: one baseline
    # (SOF0) and one progressive (SOF2) stream
    sofs = {(b"\xff\xc2" in bytes(p)) for m, p in
            zip(mimes, items["payload"].to_pylist()) if m == "image/jpeg"}
    assert sofs == {False, True}
    out = rd.from_arrow(items).map_batches(
        multimodal.DecodeStage, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
        fn_constructor_kwargs={"fake": False}).to_pandas()
    assert len(out) == 14
    feats = {i: np.asarray(f) for i, f in zip(out["item_id"], out["feature"])}
    for i, mime, payload in zip(items["item_id"].to_pylist(), mimes,
                                items["payload"].to_pylist()):
        # feature = 8x8 intensity grid / log-mel bands of the real content
        want = multimodal.real_decode(payload, mime)
        assert np.allclose(feats[i], want)
    # real resize: same container out, exact target dims, content resampled
    resized = rd.from_arrow(items).filter(
        lambda r: r["modality"] == "image").map_batches(
        multimodal.ResizeStage, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
        fn_constructor_kwargs={"out_w": 16, "out_h": 12, "fake": False}
    ).to_pandas()
    from sema_ray.jpeg import decode_jpeg
    for p in resized["payload"]:
        p = bytes(p)
        if p.startswith(b"\x89PNG"):
            assert multimodal.decode_png(p).shape == (12, 16, 3)
        elif p.startswith(b"\xff\xd8"):
            assert decode_jpeg(p).shape == (12, 16, 3)
        else:
            assert multimodal.decode_ppm(p).shape == (12, 16, 3)
    # frame-PIXEL decode is the one remaining external-codec seam
    with pytest.raises(NotImplementedError):
        multimodal.real_decode(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_frame_sample_real_mp4(ray_session):
    """fake=False frame sampling demuxes REAL MP4 sample tables through
    the actor pool: exact frame bytes, real timestamps, sync-only picks."""
    from sema_ray.mp4 import mux_mp4

    rng = np.random.default_rng(6)
    rows = {"item_id": [], "modality": [], "payload": [], "mime": [],
            "meta_json": []}
    all_samples = {}
    for i in range(3):
        samples = [rng.integers(0, 256, int(rng.integers(60, 300)),
                                dtype=np.uint8).tobytes()
                   for _ in range(9 + i)]
        all_samples[i] = samples
        rows["item_id"].append(i)
        rows["modality"].append("video")
        rows["payload"].append(mux_mp4(samples, sample_duration=40,
                                       samples_per_chunk=4, sync_every=3))
        rows["mime"].append("video/mp4")
        rows["meta_json"].append('{"fps": 25}')
    items = pa.table({k: pa.array(v, multimodal.BINARY_SCHEMA.field(k).type)
                      for k, v in rows.items()},
                     schema=multimodal.BINARY_SCHEMA)
    out = rd.from_arrow(items).map_batches(
        multimodal.FrameSampleStage, batch_format="pyarrow", batch_size=2,
        concurrency=(1, 2),
        fn_constructor_kwargs={"n_frames": 4, "fake": False}).to_pandas()
    assert len(out) == 12
    for i in range(3):
        sub = out[out["item_id"] == i]
        idxs = sorted(sub["frame_idx"])
        assert idxs[0] == 0 and idxs[-1] == len(all_samples[i]) - 1
        # real timestamps: dts = 40 ms per frame at timescale 1000
        assert all(p == f * 40 for f, p in zip(sub["frame_idx"],
                                               sub["pts_ms"]))
        # features are content-addressed over the REAL frame bytes
        for f, feat in zip(sub["frame_idx"], sub["feature"]):
            want = multimodal._fake_decode(all_samples[i][f])
            assert np.allclose(np.asarray(feat), want)
    # sync-only picks land on the stss keyframe grid (every 3rd sample)
    sync = rd.from_arrow(items).map_batches(
        multimodal.FrameSampleStage, batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_kwargs={"n_frames": 2, "fake": False,
                               "sync_only": True}).to_pandas()
    assert set(sync["frame_idx"]) <= {0, 3, 6, 9, 12}


def _png_filter_forward(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent spec-reference FORWARD filter pass (PNG spec §9): build
    the filtered scanline stream the decoder must invert."""
    h, w, ch = img.shape
    raster = img.reshape(h, w * ch).astype(np.int32)
    prev = np.zeros(w * ch, dtype=np.int32)
    out = bytearray()
    for r in range(h):
        line, f = raster[r], filters[r]
        out.append(f)
        for i in range(w * ch):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
            out.append((int(line[i]) - pred) & 0xFF)
        prev = line
    return bytes(out)


def test_png_codec_roundtrip_and_filters():
    import struct
    import zlib
    rng = np.random.default_rng(5)
    # encode->decode roundtrip across every supported channel layout
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
        assert (multimodal.decode_png(multimodal.encode_png(img)) == img).all()
    gray2d = rng.integers(0, 256, size=(5, 6), dtype=np.uint8)
    assert (multimodal.decode_png(multimodal.encode_png(gray2d))
            == gray2d[:, :, None]).all()

    # decoder inverts ALL five filter types (stream built by an
    # independent forward-filter reference, not by encode_png)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    scan = _png_filter_forward(img, filters)

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + \
            struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 10, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(scan))
               + chunk(b"IEND", b""))
    assert (multimodal.decode_png(payload) == img).all()

    # palette (color type 3) expands through PLTE to RGB
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(6, 5, 1), dtype=np.uint8)
    pscan = _png_filter_forward(idx, [0] * 6)
    ppayload = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", plte.tobytes())
                + chunk(b"IDAT", zlib.compress(pscan))
                + chunk(b"IEND", b""))
    assert (multimodal.decode_png(ppayload) == plte[idx[:, :, 0]]).all()

    # corrupted chunk data (CRC mismatch) and unsupported variants must
    # raise, not mis-decode; byte 50 sits inside the IDAT payload
    corrupt = bytearray(payload)
    corrupt[50] ^= 0x01
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(corrupt))
    interlaced = (b"\x89PNG\r\n\x1a\n"
                  + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 10, 8, 2, 0, 0, 1))
                  + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlace"):
        multimodal.decode_png(interlaced)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"nope")
    # truncation INSIDE a chunk's 4-byte CRC must raise the same ValueError
    # contract (was a bare struct.error from the unguarded CRC unpack)
    with pytest.raises(ValueError, match="truncated"):
        multimodal.decode_png(payload[:len(payload) - 14])


def test_log_mel_audio_features_spectral_properties():
    """Independent spec properties of the log-mel front end: a pure tone's
    energy peaks in the mel band whose center (by the HTK formula computed
    INLINE here, not via the filterbank under test) matches the tone;
    band order follows frequency; silence is the log floor."""
    sr, dim = 8000, multimodal.FEATURE_DIM
    t = np.arange(2 * sr) / sr

    def peak_band(freq):
        return int(np.argmax(multimodal.audio_features(
            0.5 * np.sin(2 * np.pi * freq * t), sr, dim)))

    def expected_band(freq):
        # inverse of the band-center grid: mel space is linear in band idx
        m = 2595.0 * np.log10(1.0 + freq / 700.0)
        m_max = 2595.0 * np.log10(1.0 + (sr / 2.0) / 700.0)
        return m / m_max * (dim + 1) - 1  # centers at 1..dim of n_mels+2

    for freq in (300.0, 1000.0, 2500.0):
        assert abs(peak_band(freq) - expected_band(freq)) <= 1.0, freq
    assert peak_band(500.0) < peak_band(1500.0) < peak_band(3000.0)
    # silence hits the exact log floor everywhere
    silent = multimodal.audio_features(np.zeros(sr), sr, dim)
    assert np.allclose(silent, -10.0)
    # louder tone -> strictly larger peak energy
    quiet = multimodal.audio_features(0.1 * np.sin(2 * np.pi * 1000 * t),
                                      sr, dim)
    loud = multimodal.audio_features(0.9 * np.sin(2 * np.pi * 1000 * t),
                                     sr, dim)
    b = peak_band(1000.0)
    assert loud[b] > quiet[b]
    assert loud.dtype == np.float32 and loud.shape == (dim,)


def test_resize_and_frame_sample_plumbing(ray_session):
    items = multimodal.synthesize_binary_items(n=12)
    ds = rd.from_arrow(items)
    resized = ds.map_batches(
        multimodal.ResizeStage, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
        fn_constructor_kwargs={"out_w": 32, "out_h": 32}).to_pandas()
    assert len(resized) == 12
    assert all(len(p) == (32 * 32 * 3) // 8 for p in resized["payload"])
    assert all('"w": 32' in m for m in resized["meta_json"])

    videos = rd.from_arrow(items).filter(
        lambda r: r["modality"] == "video")
    frames = videos.map_batches(
        multimodal.FrameSampleStage, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
        fn_constructor_kwargs={"n_frames": 3}).to_pandas()
    n_videos = len([m for m in items["modality"].to_pylist() if m == "video"])
    assert len(frames) == 3 * n_videos
    assert set(frames["frame_idx"]) == {0, 1, 2}
    assert all(len(f) == multimodal.FEATURE_DIM for f in frames["feature"])

def test_bpe_token_counts_vs_regex_reference(ray_session):
    """Third-implementation check: Python `regex` (supports \\p classes,
    leftmost-first like RE2) over the real testdata — the DuckDB twin is
    covered separately by the oracle mirror."""
    regex = pytest.importorskip("regex")
    sf = "/root/testdata/sf0.001"
    out = textops.bpe_token_counts(sf).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    tbl = pq.read_table(os.path.join(sf, "documents.parquet"),
                        columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    pat = regex.compile(textops.BPE_TOKEN_RE)
    want = tbl["text"].map(lambda t: len(pat.findall(t))).astype("int64")
    assert (out["doc_id"].values == tbl["doc_id"].values).all()
    assert (out["n_tokens_bpe"].values == want.values).all()


def test_bpe_encode_counts_matches_apply(ray_session, bpe_dir):
    """Distributed per-doc subword totals == driver bpe_apply lengths."""
    d, texts = bpe_dir
    import collections
    import re
    cnt = collections.Counter(
        w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    wf = sorted(((w, n) for w, n in cnt.items() if n >= 2),
                key=lambda kv: (-kv[1], kv[0]))
    merges = [(l, r) for l, r, _ in
              textops.bpe_train_reference(wf, num_merges=25)]
    want = [len(s) for s in textops.bpe_apply(texts, merges)]
    got = textops.bpe_encode_counts(d, num_merges=25, min_freq=2) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(got["n_subwords"]) == want


def test_token_ops_tolerate_null_text(ray_session, tmp_path):
    """Null text rows behave as empty documents in every token-stream op
    (Arrow's list_flatten/parent_indices skip null lists by construction)."""
    d = str(tmp_path / "nulls")
    os.makedirs(d)
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          None, "alpha beta"], pa.string())}),
        os.path.join(d, "documents.parquet"))
    wc = textops.word_counts(d, min_freq=1).to_pandas()
    assert dict(zip(wc["word"], wc["n"]))["alpha"] == 2
    tf = textops.tfidf_top_terms(d, k=3).to_pandas()
    assert set(tf["doc_id"]) == {0, 2}  # null doc emits no terms
    enc = textops.bpe_encode_counts(d, num_merges=5, min_freq=1) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert len(enc) == 3 and enc.loc[1, "n_subwords"] == 0
    from sema_ray import dedup
    spans = dedup.remove_dup_spans(d).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert len(spans) == 3 and spans.loc[1, "kept_text"] == ""
