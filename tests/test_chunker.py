"""Chunker golden cases — every edge of reference processor.rs:31-85."""

import pytest

from sema_ray.chunker import (CHUNK_SIZE, MIN_CHUNK_SIZE, OVERLAP_SIZE,
                              chunk_text)


def test_short_text_no_chunks():
    assert chunk_text("x" * (MIN_CHUNK_SIZE - 1)) == []


def test_min_size_single_chunk():
    chunks = chunk_text("x" * MIN_CHUNK_SIZE)
    assert len(chunks) == 1
    assert chunks[0].content == "x" * MIN_CHUNK_SIZE
    assert chunks[0].start_line == 1 and chunks[0].end_line == 1


def test_exactly_window_size():
    # Reference quirk (processor.rs:72-78): for text of exactly CHUNK_SIZE
    # bytes the overlap step re-enters at 900 and emits a second, 100-byte
    # chunk. Preserved bit-for-bit.
    chunks = chunk_text("a" * CHUNK_SIZE)
    assert [(c.start_byte, c.end_byte) for c in chunks] == [(0, CHUNK_SIZE),
                                                            (900, CHUNK_SIZE)]


def test_window_plus_one_no_newline():
    # 1001 bytes, no newline. Reference trace (processor.rs:40-78): chunks at
    # [0,1000), then overlap re-entry [900,1001), then once more [901,1001)
    # before the forward-progress guard fires. Preserved bit-for-bit.
    chunks = chunk_text("a" * (CHUNK_SIZE + 1))
    assert [(c.start_byte, c.end_byte) for c in chunks] == [
        (0, 1000), (900, 1001), (901, 1001)]


def test_newline_backoff():
    # newline at byte 500 inside the first window: chunk ends after it.
    text = "a" * 500 + "\n" + "b" * 1500
    chunks = chunk_text(text)
    assert chunks[0].end_byte == 501
    assert chunks[0].content.endswith("\n")
    assert chunks[0].start_line == 1 and chunks[0].end_line == 2
    # next starts at 501-100=401 (overlap)
    assert chunks[1].start_byte == 401


def test_chunk_id_zero_escape_small_first_window():
    # Text long enough that the first window doesn't reach EOF, with an
    # early newline: backoff shrinks the first chunk below MIN, and the
    # chunk_id==0 escape (processor.rs:57) keeps it anyway.
    text = "ab\n" + "c" * 1100
    chunks = chunk_text(text)
    assert chunks[0].content == "ab\n"
    assert len(chunks[0].content) < MIN_CHUNK_SIZE


def test_forward_progress_guard():
    # Newline such that safe_end - OVERLAP <= start repeatedly: start jumps
    # to safe_end instead of looping.
    text = ("x" * 30 + "\n") * 100
    chunks = chunk_text(text)
    starts = [c.start_byte for c in chunks]
    assert starts == sorted(set(starts))  # strictly advancing
    assert chunks[-1].end_byte == len(text.encode())


def test_multibyte_boundary():
    # 3-byte chars: byte 1000 falls mid-char; boundary backoff must keep
    # valid UTF-8 in every chunk.
    text = "日" * 400  # 1200 bytes
    chunks = chunk_text(text)
    for c in chunks:
        c.content.encode("utf-8")  # round-trips
    assert chunks[0].end_byte % 3 == 0


def test_multibyte_overlap_start_boundary():
    # Our documented deviation: overlap step lands mid-char -> backed off.
    text = "é" * 800  # 2-byte chars, 1600 bytes
    chunks = chunk_text(text)
    assert len(chunks) >= 2
    for c in chunks:
        c.content.encode("utf-8")


def test_coverage_reassembly():
    # Concatenating chunks with overlaps removed reconstructs the text for
    # texts without the min-size tail-drop (property test, SURVEY §5.5).
    text = "word " * 1000  # 5000 bytes, ASCII
    chunks = chunk_text(text)
    data = text.encode()
    covered = bytearray(len(data))
    for c in chunks:
        for i in range(c.start_byte, c.end_byte):
            covered[i] = 1
    assert all(covered)


def test_line_numbers_cumulative():
    text = ("line with some padding to make it longer than usual\n" * 60)
    chunks = chunk_text(text)
    assert chunks[0].start_line == 1
    for a, b in zip(chunks, chunks[1:]):
        assert b.start_line <= b.end_line
        assert b.start_line >= a.start_line
