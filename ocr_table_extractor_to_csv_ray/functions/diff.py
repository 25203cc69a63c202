"""Distributed dataset diff (beyond-reference; the migration-validation
tool a 100 TB engine swap needs — SURVEY.md §2.13).

Semantics: multiset symmetric difference by row CONTENT. Each side is
reduced per batch to (row_hash, n) partial counts (the local combine —
a block of a million identical rows leaves as one row), the tagged
partials meet in ONE key shuffle, and only hashes whose per-side counts
disagree come out. Nothing row-proportional visits the driver; the
output is itself a Dataset sized by the disagreement, not the input.

Hashes are ``pd.util.hash_pandas_object`` over the selected columns —
the repo's standard vectorized row-hash idiom (stable within a pandas
version, which is the contract a same-session A/B diff needs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _hash_counts(side: str, columns: Optional[Sequence[str]]):
    def f(b: pd.DataFrame) -> pd.DataFrame:
        cols = list(columns) if columns is not None else list(b.columns)
        h = pd.util.hash_pandas_object(b[cols], index=False).to_numpy()
        hv, n = np.unique(h, return_counts=True)
        out = pd.DataFrame({"row_hash": hv.astype(np.uint64).view(np.int64)})
        out["n_left"] = n.astype(np.int64) if side == "l" else np.int64(0)
        out["n_right"] = n.astype(np.int64) if side == "r" else np.int64(0)
        return out

    return f


def dataset_diff(left, right, columns: Optional[Sequence[str]] = None):
    """Rows where ``left`` and ``right`` disagree as multisets of the
    selected ``columns`` (default: all of left's). Returns a Dataset
    (row_hash:int64, n_left:int64, n_right:int64) with one row per
    hash whose counts differ — empty ⇔ the tables are content-equal.

    Hash collisions (~2⁻⁶⁴ per pair) can only HIDE a difference, never
    invent one — acceptable for validation sweeps; re-run with an
    explicit key column list for forensics on a hit."""
    from ray.data.aggregate import Sum

    lt = left.map_batches(_hash_counts("l", columns), batch_format="pandas")
    rt = right.map_batches(_hash_counts("r", columns), batch_format="pandas")
    agg = (lt.union(rt).groupby("row_hash")
           .aggregate(Sum("n_left", alias_name="n_left"),
                      Sum("n_right", alias_name="n_right")))

    def only_diffs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["n_left"], t["n_right"]))
        return pa.table({"row_hash": pc.cast(t["row_hash"], pa.int64()),
                         "n_left": pc.cast(t["n_left"], pa.int64()),
                         "n_right": pc.cast(t["n_right"], pa.int64())})

    return agg.map_batches(only_diffs, batch_format="pyarrow")


def diff_summary(left, right,
                 columns: Optional[Sequence[str]] = None) -> dict:
    """Scalar roll-up of :func:`dataset_diff`: rows only-in-left /
    only-in-right (multiset excess). The per-batch partial on the diff
    stream keeps the driver traffic at one row per block."""
    diffs = dataset_diff(left, right, columns)

    def partial(t: pa.Table) -> pa.Table:
        d = pc.subtract(t["n_left"], t["n_right"]).to_numpy()
        return pa.table({
            "only_left": pa.array([int(d[d > 0].sum())], pa.int64()),
            "only_right": pa.array([int(-d[d < 0].sum())], pa.int64()),
        })

    from ray.data.aggregate import Sum
    agg = diffs.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("only_left", alias_name="only_left"),
        Sum("only_right", alias_name="only_right"))
    if not agg:          # zero-block inputs (both sides empty datasets)
        return {"only_left": 0, "only_right": 0}
    return {"only_left": int(agg["only_left"] or 0),
            "only_right": int(agg["only_right"] or 0)}
