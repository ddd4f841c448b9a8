"""Distributed sketches: HyperLogLog approximate distinct counting.

The reference has no approximate aggregates (SURVEY §2 "Aggregations"); this
adds the sketch family a 100 TB pipeline needs: per-batch partial sketches
(tiny fixed-size register arrays) merged by element-wise max — the shuffle
moves 2^p bytes per batch instead of one row per distinct value. Plain HLL
with the standard bias-corrected estimator (Flajolet et al., public
algorithm), hashes via blake2b so results are deterministic everywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


class HLL:
    """HyperLogLog registers (p bits of bucket index, 64-p of rank)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hs: np.ndarray) -> None:
        idx = (hs >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hs << np.uint64(self.p)
        # rank = leading zeros of the remaining bits + 1 (capped)
        ranks = np.zeros(len(hs), dtype=np.uint8)
        probe = np.uint64(1) << np.uint64(63)
        rem = rest.copy()
        rank = np.ones(len(hs), dtype=np.uint8)
        alive = np.ones(len(hs), dtype=bool)
        for _ in range(64 - self.p):
            zero_top = (rem & probe) == 0
            step = alive & zero_top
            rank[step] += 1
            alive &= zero_top
            rem = rem << np.uint64(1)
            if not alive.any():
                break
        ranks = rank
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / inv.sum()
        if e <= 2.5 * m:  # small-range correction
            zeros = int((self.registers == 0).sum())
            if zeros:
                e = m * np.log(m / zeros)
        return float(e)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) via distributed HLL partials."""

    def partial(t: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash64(t[column].to_pylist()))
        return pa.table({"registers": pa.array([h.registers.tobytes()],
                                               pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    acc = HLL(p)
    for row in parts:  # tiny: one 2^p-byte row per block
        other = HLL(p)
        other.registers = np.frombuffer(row["registers"], dtype=np.uint8).copy()
        acc.merge(other)
    return acc.estimate()
