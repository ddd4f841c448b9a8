"""Content fingerprints and stable 64-bit ids.

The reference fingerprints file content with xxh3-128
(``/root/reference/src/storage/mod.rs:72-94``) to drive skip-unchanged /
reprocess-changed incremental indexing. xxhash is not available in this
environment, so we use blake2b (stdlib, deterministic, fast) with the same
role: a hex content hash compared against a stored manifest. The streamed
>1 MiB path of the reference collapses into blake2b's own streaming update.
"""

from __future__ import annotations

import hashlib

import numpy as np


def content_hash(data: bytes | str) -> str:
    """Hex content fingerprint (stand-in for the reference's xxh3-128)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return hashlib.blake2b(data, digest_size=16).hexdigest()


def file_hash(path: str, bufsize: int = 128 * 1024) -> str:
    """Streamed file fingerprint (reference streams 128 KiB for >1 MiB files)."""
    h = hashlib.blake2b(digest_size=16)
    with open(path, "rb") as f:
        while True:
            buf = f.read(bufsize)
            if not buf:
                break
            h.update(buf)
    return h.hexdigest()


def stable_id64(key: str) -> int:
    """Deterministic non-negative int64 id for a string key.

    Used for canonical entity ids: parallel-safe (no counter), collision
    probability ~n^2/2^63.
    """
    d = hashlib.blake2b(key.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big") & 0x7FFF_FFFF_FFFF_FFFF


_SPLITMIX_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (uint64 wraparound semantics).

    Shared mixing primitive for shuffle part keys and LSH bucket ids.
    """
    x = x + _SPLITMIX_GOLDEN
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def stable_u64_array(strings: list[str] | np.ndarray) -> np.ndarray:
    """Vector of stable uint64 hashes for minhash seeding / bucketing."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out
