"""Train/eval corpus split (O6, reference ``train_layoutlm.py:125-139``).

The reference shuffles example indices with a seeded RNG and slices by
ratio. At corpus scale a global shuffle just to split is wasted motion,
so the default here is a DETERMINISTIC HASH SPLIT: crc32(doc_id, seed)
mod 10^6 < ratio — stable under repartitioning, restarts and cluster
size, no shuffle at all. ``seeded_shuffle_split`` reproduces the
reference's exact sampling model (global ``random_shuffle(seed)`` +
proportional split) when bit-compatible sampling matters more than
cost.
"""

from __future__ import annotations

import zlib
from typing import Tuple

import numpy as np
import pyarrow as pa


def _hash_bucket(doc_id: str, seed: int) -> int:
    return zlib.crc32(f"{seed}:{doc_id}".encode()) % 1_000_000


def hash_split(ds, eval_ratio: float = 0.2, seed: int = 42,
               id_column: str = "doc_id") -> Tuple:
    """(train_ds, eval_ds) by stable content hash — no shuffle."""
    cut = int(eval_ratio * 1_000_000)

    def mask(t: pa.Table, keep_eval: bool) -> pa.Table:
        ids = t[id_column].to_pylist()
        m = np.array([_hash_bucket(str(i), seed) < cut for i in ids])
        return t.filter(pa.array(m if keep_eval else ~m))

    train = ds.map_batches(lambda t: mask(t, False), batch_format="pyarrow")
    evals = ds.map_batches(lambda t: mask(t, True), batch_format="pyarrow")
    return train, evals


def seeded_shuffle_split(ds, eval_ratio: float = 0.2, seed: int = 42) -> Tuple:
    """Reference-style split: global seeded shuffle then proportional
    slice (this IS a full shuffle — use :func:`hash_split` at scale)."""
    shuffled = ds.random_shuffle(seed=seed)
    return tuple(shuffled.split_proportionately([1.0 - eval_ratio]))
