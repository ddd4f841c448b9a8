"""Sliding-window text chunker — bit-exact semantics of the reference.

Reference: ``/root/reference/src/storage/processor.rs:6-85``. Constants
1000-byte window / 100-byte overlap / 50-byte minimum. The reference operates
on UTF-8 **bytes** (Rust ``str::len``/slicing); we therefore chunk the UTF-8
encoding and decode back, reproducing:

- char-boundary backoff at the window end (``processor.rs:44-47``),
- last-``\\n`` backoff when the window does not end the text
  (``processor.rs:49-53``),
- the ``chunk_id == 0`` escape that guarantees >=1 chunk for any text with
  ``len >= MIN`` even when the first window is short (``processor.rs:57``),
- 1-based start/end line numbers (``processor.rs:57-59``),
- the forward-progress guard on the overlap step (``processor.rs:72-78``),
- texts shorter than MIN produce no chunks at all (``processor.rs:34-36``).
"""

from __future__ import annotations

from typing import NamedTuple

CHUNK_SIZE = 1000
OVERLAP_SIZE = 100
MIN_CHUNK_SIZE = 50


class Chunk(NamedTuple):
    ordinal: int
    start_byte: int
    end_byte: int
    start_line: int  # 1-based, parity with reference
    end_line: int
    content: str


def _is_char_boundary(data: bytes, idx: int) -> bool:
    """UTF-8 char boundary test, same as Rust ``str::is_char_boundary``."""
    if idx == 0 or idx >= len(data):
        return True
    return (data[idx] & 0xC0) != 0x80


def chunk_text(text: str) -> list[Chunk]:
    """Split ``text`` into overlapping chunks with the reference's semantics."""
    data = text.encode("utf-8")
    n = len(data)
    chunks: list[Chunk] = []
    if n < MIN_CHUNK_SIZE:
        return chunks

    start = 0
    chunk_id = 0
    while start < n:
        end = min(start + CHUNK_SIZE, n)

        safe_end = end
        while safe_end > start and not _is_char_boundary(data, safe_end):
            safe_end -= 1

        if safe_end < n:
            nl = data.rfind(b"\n", start, safe_end)
            if nl != -1:
                safe_end = nl + 1

        piece = data[start:safe_end]
        if len(piece) >= MIN_CHUNK_SIZE or chunk_id == 0:
            start_line = data.count(b"\n", 0, start) + 1
            end_line = start_line + piece.count(b"\n")
            chunks.append(
                Chunk(
                    ordinal=chunk_id,
                    start_byte=start,
                    end_byte=safe_end,
                    start_line=start_line,
                    end_line=end_line,
                    content=piece.decode("utf-8"),
                )
            )
            chunk_id += 1

        next_start = max(safe_end - OVERLAP_SIZE, 0)
        # Deviation from the reference (documented): ``safe_end - 100`` can
        # land inside a multi-byte UTF-8 char, which would panic in the Rust
        # slicing at processor.rs:42; we back off to the previous char
        # boundary instead. Identical behavior for ASCII content.
        while next_start > 0 and not _is_char_boundary(data, next_start):
            next_start -= 1
        start = safe_end if next_start <= start else next_start
        if start >= n:
            break

    return chunks


def chunk_count(text: str) -> int:
    return len(chunk_text(text))
