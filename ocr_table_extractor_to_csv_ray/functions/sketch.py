"""Mergeable sketches + exact distinct counts over token streams.

The aggregation-at-scale pattern (ray_guide: "for sketches emit one
serialized sketch per batch and merge them in a second, tiny stage"):

- :func:`exact_vocab_size` — exact distinct tokens: per-batch LOCAL
  dedup first (shrinks the shuffle to unique-per-batch tokens), then a
  global ``unique`` count.
- :class:`HyperLogLog` — classic HLL (Flajolet et al., public
  algorithm) with the standard bias corrections; one sketch per batch,
  merged on the driver (register-wise max — associative, so a tree
  merge on a cluster is the same code).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import token_hash64


class HyperLogLog:
    """HLL with ``2**p`` registers (p=12 → ~1.6 % relative error)."""

    def __init__(self, p: int = 12) -> None:
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining 64-p bits, +1
        lz = np.zeros(len(h), dtype=np.uint8)
        cur = rest.copy()
        mask = np.uint64(1) << np.uint64(63)
        for r in range(64 - self.p + 1):
            top = (cur & mask) == 0
            lz = np.where(top & (lz == r), r + 1, lz)
            cur = cur << np.uint64(1)
            if not top.any():
                break
        rank = lz + 1
        np.maximum.at(self.registers, idx, rank.astype(np.uint8))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def cardinality(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)      # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def _batch_token_hashes(batch: pa.Table, column: str) -> np.ndarray:
    trimmed = pc.utf8_trim_whitespace(batch[column])
    words = pc.split_pattern_regex(trimmed, r"\s+").combine_chunks()
    uniq = pc.unique(words.flatten()).to_pylist()
    return np.array([token_hash64(w) for w in uniq if w is not None],
                    dtype=np.uint64)


def hll_vocab_sketch(ds, column: str = "text", p: int = 12):
    """One serialized HLL per batch → driver merge → estimate.

    Returns ``(estimate, merged_sketch)``. The per-batch stage streams;
    only ``4 KiB × n_batches`` reaches the driver.
    """
    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_hashes(_batch_token_hashes(t, column))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_rows():
        merged = merged.merge(HyperLogLog.from_bytes(row["sketch"], p))
    return merged.cardinality(), merged


def exact_vocab_size(ds, column: str = "text") -> int:
    """Exact distinct whitespace tokens: per-batch local dedup, then a
    global distinct over the (much smaller) per-batch-unique stream."""
    def uniq_batch(t: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(t[column])
        words = pc.split_pattern_regex(trimmed, r"\s+").combine_chunks()
        return pa.table({"token": pc.unique(words.flatten())})

    tokens = ds.map_batches(uniq_batch, batch_format="pyarrow")
    return len(tokens.unique("token"))
