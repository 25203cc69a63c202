"""Z-order (Morton) clustering for multi-column data layout (beyond-
reference; the write-side locality tool — SURVEY.md §2.13).

A 100 TB table queried by rectangles over two columns (time × user,
lat × lon) wants files whose row ranges are LOCAL in both columns at
once; sorting by either column alone scatters the other. Z-ordering
interleaves the bits of the per-column ranks so one ``Dataset.sort``
on a single int64 key yields files compact in every dimension.

Pipeline shape: one cheap global (min, max) aggregate per column →
broadcast ranges → vectorized per-batch bit-interleave (magic-number
spreads, no Python per row) → ``ds.sort`` on the key — the sort is the
only all-to-all, exactly as wide as any single-column sort-based write.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MAGIC = (
    (0x0000_03FF_0000_FFFF, 32),
    (0x003F_0000_FF00_00FF, 16),
    (0x300F_00F0_0F00_F00F, 8),
    (0x30C3_0C30_C30C_30C3, 4),
    (0x9249_2492_4924_9249, 2),
)


def _spread2(x: np.ndarray) -> np.ndarray:
    """Insert one zero bit between each of the low 32 bits (uint64)."""
    x = x.astype(np.uint64) & np.uint64(0xFFFF_FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000_FFFF_0000_FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF_00FF_00FF_00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F_0F0F_0F0F_0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333_3333_3333_3333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555_5555_5555_5555)
    return x


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave two ≤31-bit non-negative int arrays into one int64
    Morton key (x in even bits, y in odd). Vectorized."""
    for name, a in (("x", x), ("y", y)):
        if a.size and (a.min() < 0 or a.max() >= (1 << 31)):
            raise ValueError(f"morton2: {name} outside [0, 2^31)")
    return (_spread2(x) | (_spread2(y) << np.uint64(1))).astype(np.int64)


def _column_ranges(ds, cols: Sequence[str]):
    """One streaming aggregate: global (min, max) per column."""
    from ray.data.aggregate import Max, Min
    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"__min_{c}"),
                 Max(c, alias_name=f"__max_{c}")]
    r = ds.aggregate(*aggs)
    return {c: (int(r[f"__min_{c}"]), int(r[f"__max_{c}"])) for c in cols}


def zorder_sorted(ds, cols: Sequence[str], bits: int = 20):
    """Append ``__zkey`` (Morton interleave of the two columns' scaled
    ranks, ``bits`` bits each) and globally sort by it. Columns must be
    integer-valued (cast floats to fixed-point first — the engine's
    standard cents idiom). Two-column form; compose keys pairwise for
    more dimensions.

    Returns the sorted Dataset (``__zkey`` retained so a partitioned
    writer can split on key ranges and record per-file key bounds for
    scan pruning)."""
    if len(cols) != 2:
        raise ValueError(f"zorder_sorted expects exactly 2 columns, "
                         f"got {list(cols)}")
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    ranges = _column_ranges(ds, cols)

    def add_key(t: pa.Table) -> pa.Table:
        scaled = []
        for c in cols:
            lo, hi = ranges[c]
            v = pc.cast(t[c], pa.int64()).to_numpy(zero_copy_only=False)
            span = max(1, hi - lo)
            d = v - lo                      # ≥ 0, ≤ span
            if span < (1 << (62 - bits)):   # d * (2^bits - 1) fits int64
                s = d * ((1 << bits) - 1) // span
            else:                           # arbitrary-precision fallback
                s = np.array(
                    (d.astype(object) * ((1 << bits) - 1)) // span,
                    dtype=np.int64)
            scaled.append(s.astype(np.int64))
        key = morton2(scaled[0], scaled[1])
        return t.append_column("__zkey", pa.array(key))

    return ds.map_batches(add_key, batch_format="pyarrow").sort("__zkey")
