"""Bloom-filter membership against an EXISTING corpus snapshot — the
incremental-ingest dedup primitive: when yesterday's 100 TB corpus can't
be re-shuffled against today's delta, build a mergeable Bloom filter
over the old content hashes once, broadcast it, and probe the new
stream with zero shuffle.

Determinism contract: double hashing ``h_i = h1 + i*h2 (mod m)`` with
``h1``/``h2`` taken from the two halves of ``md5(text)`` — no RNG, no
seed state — so the filter (and its false positives) are bit-exactly
reproducible by an independent sequential implementation, which is how
the driver oracle checks this operator end to end.

Scale shape: the BUILD is one streaming ``map_batches`` emitting one
``m/8``-byte filter per batch, then ONE bounded-fan-in merge round
(``groupby(bucket).map_groups`` OR-merging each bucket with O(m/8)
memory) so the driver receives at most ``merge_fan`` filters no matter
how many blocks the corpus has — at 10^6 blocks the old driver-serial
OR-loop pulled ~128 GB through one process; this shape moves the same
bytes once, in parallel, through the cluster. The PROBE is one
broadcast (``ray.put``) + vectorized bit tests per batch, no shuffle.
OR is commutative/associative/idempotent, so the merged bits are
bit-identical regardless of grouping — the sequential driver oracle
still reproduces the filter exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


DEFAULT_M_BITS = 1 << 20          # 128 KiB filter
DEFAULT_K = 4


def _text_hash_pair(text: str) -> tuple[int, int]:
    """(h1, h2) from the two md5 halves; h2 forced odd so the double-hash
    probe sequence spans the (power-of-two) bit space."""
    d = hashlib.md5((text or "").encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1
    return h1, h2


class BloomFilter:
    """Fixed-size Bloom filter over text content, mergeable by OR."""

    def __init__(self, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K):
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        self.m_bits, self.k = m_bits, k
        self.bits = np.zeros(m_bits // 8, np.uint8)

    def _positions(self, texts) -> np.ndarray:
        """(n, k) bit positions via double hashing."""
        pairs = np.array([_text_hash_pair(t) for t in texts], np.uint64)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            pos = pairs[:, 0:1] + i * pairs[:, 1:2]
        return (pos & np.uint64(self.m_bits - 1)).astype(np.int64)

    def add(self, texts) -> None:
        if len(texts) == 0:
            return
        pos = self._positions(texts).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3,
                         (1 << (pos & 7)).astype(np.uint8))

    def contains(self, texts) -> np.ndarray:
        if len(texts) == 0:
            return np.zeros(0, bool)
        pos = self._positions(texts)
        bits = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return bits.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.m_bits, self.k) == (other.m_bits, other.k)
        out = BloomFilter(self.m_bits, self.k)
        out.bits = self.bits | other.bits
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, m_bits: int = DEFAULT_M_BITS,
                   k: int = DEFAULT_K) -> "BloomFilter":
        f = cls(m_bits, k)
        f.bits = np.frombuffer(data, np.uint8).copy()
        return f


DEFAULT_MERGE_FAN = 64            # max filters the driver ever sees


def _bloom_partials(ds, column: str, m_bits: int, k: int,
                    merge_fan: int, batch_size=None):
    """Dataset of ≤ ``merge_fan`` pre-merged filters: one filter per
    batch, bucketed by a content hash of its bytes (any deterministic
    spread works — OR makes the result grouping-invariant), each bucket
    OR-reduced inside ``map_groups`` with a single ``m_bits/8``-byte
    accumulator (never stacking the group in memory)."""
    def per_batch(t: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits, k)
        f.add([x if x is not None else "" for x in t[column].to_pylist()])
        raw = f.to_bytes()
        bucket = int.from_bytes(hashlib.md5(raw).digest()[:4], "little")
        return pa.table({
            "bucket": pa.array([bucket % merge_fan], pa.int64()),
            "bloom": pa.array([raw], pa.binary()),
        })

    def or_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(m_bits // 8, np.uint8)
        for buf in t["bloom"]:
            acc |= np.frombuffer(buf.as_py(), np.uint8)
        return pa.table({"bloom": pa.array([acc.tobytes()], pa.binary())})

    kw = {} if batch_size is None else {"batch_size": batch_size}
    return (ds.map_batches(per_batch, batch_format="pyarrow", **kw)
              .groupby("bucket")
              .map_groups(or_group, batch_format="pyarrow"))


def build_bloom(ds, column: str = "text", m_bits: int = DEFAULT_M_BITS,
                k: int = DEFAULT_K,
                merge_fan: int = DEFAULT_MERGE_FAN,
                batch_size=None) -> BloomFilter:
    """One filter per batch (streaming), tree-merged in the cluster —
    the driver OR-merges at most ``merge_fan`` filters (O(1) in corpus
    size) instead of one per block."""
    merged = BloomFilter(m_bits, k)
    parts = _bloom_partials(ds, column, m_bits, k, merge_fan, batch_size)
    for row in parts.iter_rows():
        merged = merged.merge(BloomFilter.from_bytes(row["bloom"], m_bits, k))
    return merged


def bloom_flag(ds, bloom: BloomFilter, column: str = "text"):
    """Broadcast the filter once; per batch, a vectorized probe adds a
    ``maybe_seen`` column (false → DEFINITELY new; true → seen before or
    a deterministic false positive at the filter's design rate)."""
    import ray

    ref = ray.put(bloom.to_bytes())
    m_bits, k = bloom.m_bits, bloom.k

    def probe(t: pa.Table) -> pa.Table:
        f = BloomFilter.from_bytes(ray.get(ref), m_bits, k)
        hits = f.contains([x if x is not None else ""
                           for x in t[column].to_pylist()])
        return t.append_column("maybe_seen", pa.array(hits))

    return ds.map_batches(probe, batch_format="pyarrow")
