"""Bucketed vectorized grouped aggregation — the high-cardinality
replacement for ``Dataset.groupby().aggregate()``.

WHY THIS EXISTS (measured, Ray 2.49.2, 32 CPUs):

Ray's sort-based ``groupby().aggregate()`` combines groups with a
per-ROW Python loop (``table_block.py:301`` ``_aggregate`` →
``iter_rows``) on BOTH the map side (cost ∝ input rows) and the reduce
side (cost ∝ group count). The per-row cost is ~5 µs on Arrow blocks
and ~100 µs on pandas blocks, so:

- 3M rows / 10k groups, pandas blocks: **119.6 s**; same data as Arrow
  blocks: **5.1 s** (~24×).
- ONE empty pandas block unioned into an all-Arrow 1.2M-row input:
  **9.9 s → 118.9 s** — the reduce normalizes every pre-aggregated
  block to the detected batch format (``aggregate_task_spec.py:81``),
  and the shuffle itself emits schema-less empty PANDAS blocks for
  empty partitions, which map UDFs cannot repair because all-empty
  task inputs BYPASS the UDF (``plan_udf_map_op.py:452``). Any
  pipeline with a ``groupby().map_groups`` stage (joins, windows)
  upstream of an aggregate is therefore stuck on the slow path no
  matter what its own UDFs return.

This operator replaces the row loop entirely with the repo's bucket
idiom: per-batch vectorized pandas partial → ONE shuffle on
``hash(key) % num_buckets`` (≤ ``num_buckets`` groups, so the sort
machinery touches blocks, not rows) → vectorized pandas aggregation
per bucket. Measured on the triangle query's 3M-pair projection at
sf0.1: 156 s (sort-aggregate, Arrow partials) → ~8 s.

Scale shape: the partial shrink bounds shuffle volume by the number of
DISTINCT keys per batch (not batch rows); one bucket (~1/B of the key
space) must fit a worker's heap — the same contract as
:func:`ocr_table_extractor_to_csv_ray.functions.join.hash_join`.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd
import pyarrow as pa


_AGG_FUNCS = ("sum", "min", "max")


def grouped_agg(ds, keys: Union[str, Sequence[str]],
                aggs: Dict[str, tuple], num_buckets: int = 64,
                count: Optional[str] = None):
    """Distributed ``SELECT keys, agg(col)... GROUP BY keys`` for
    HIGH-cardinality key spaces.

    ``aggs``: output column → ``(input column, fn)`` with fn ∈
    {sum, min, max}. ``count="n"`` adds a COUNT(*) column named ``n``.
    Associative only (mean = sum/count at the call site).

    Two-level: per-batch pandas partial (C groupby) shrinks each batch
    to its distinct keys; the single shuffle groups by a bucket hash of
    the key (≤ ``num_buckets`` Ray-level groups); each bucket re-runs
    the same vectorized aggregation (sum-of-sums, min-of-mins, ...).
    Output blocks are Arrow; dtypes follow pandas aggregation rules
    (int64 sums stay int64).

    NOTE: like every ``groupby().map_groups`` stage, empty buckets emit
    Ray's schema-less empty pandas blocks — if you chain the OUTPUT of
    this into ``Dataset.groupby().aggregate()``, that aggregate takes
    the slow pandas reduce path. Chain into another :func:`grouped_agg`
    (or a map_groups) instead, or keep ``num_buckets`` ≤ the expected
    distinct-key count so no bucket is empty.
    """
    key_cols: List[str] = [keys] if isinstance(keys, str) else list(keys)
    for out_col, (in_col, fn) in aggs.items():
        if fn not in _AGG_FUNCS:
            raise ValueError(
                f"grouped_agg supports {_AGG_FUNCS}, got {fn!r} for "
                f"{out_col!r} (non-associative aggregates can't two-level)")
    if count is not None and count in aggs:
        raise ValueError(f"count column {count!r} collides with an agg")

    # pandas named-agg spec for the partial; the bucket-level re-agg
    # applies the same fn to the PARTIAL column (sum-of-sums etc.)
    partial_spec = {out: (in_col, fn) for out, (in_col, fn) in aggs.items()}
    if count is not None:
        any_col = key_cols[0]
        partial_spec[count] = (any_col, "size")
    final_spec = {out: (out, fn) for out, (_, fn) in aggs.items()}
    if count is not None:
        final_spec[count] = (count, "sum")

    def partial(b: pd.DataFrame):
        g = b.groupby(key_cols, as_index=False, sort=False,
                      dropna=False).agg(**partial_spec)
        if count is not None:
            g[count] = g[count].astype("int64")
        h = pd.util.hash_pandas_object(g[key_cols], index=False).to_numpy()
        g["__b"] = (h % np.uint64(num_buckets)).astype(np.int64)
        try:
            return pa.Table.from_pandas(g, preserve_index=False)
        except (pa.ArrowInvalid, pa.ArrowTypeError,
                pa.ArrowNotImplementedError):
            return g

    def per_bucket(g: pd.DataFrame):
        out = (g.drop(columns="__b")
               .groupby(key_cols, as_index=False, sort=False, dropna=False)
               .agg(**final_spec))
        if count is not None:
            out[count] = out[count].astype("int64")
        try:
            return pa.Table.from_pandas(out, preserve_index=False)
        except (pa.ArrowInvalid, pa.ArrowTypeError,
                pa.ArrowNotImplementedError):
            return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("__b").map_groups(per_bucket, batch_format="pandas"))


def grouped_sum(ds, keys: Union[str, Sequence[str]],
                sums: Union[Dict[str, str], Sequence[str]],
                num_buckets: int = 64, count: Optional[str] = None):
    """Sugar for the common all-sums case. ``sums`` is either
    {input column → output name} or a list of columns summed under
    their own names."""
    if not isinstance(sums, dict):
        sums = {c: c for c in sums}
    return grouped_agg(ds, keys,
                       {out: (in_col, "sum") for in_col, out in sums.items()},
                       num_buckets=num_buckets, count=count)
