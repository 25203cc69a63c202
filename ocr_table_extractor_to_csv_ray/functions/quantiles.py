"""Exact grouped quantiles at corpus scale (beyond-reference).

Low-cardinality groups (a handful of flags over 10^12 rows) make
``groupby(flag).map_groups`` over raw rows a non-starter — one group IS
a third of the table. For discrete domains (integer cents here) the
exact quantile reduces to a weighted quantile over the DISTINCT-value
table instead:

    map_batches: per-batch (group, value) counts      # local combine
      └─ groupby(group, value).sum                    # shuffle of
         #   distinct-(group,value) pairs, not rows
      └─ groupby(group).map_groups                    # ≤ |domain| rows
         #   per group: cumulative counts → quantiles

Quantile contract (type-1 / lower): the smallest value whose cumulative
count reaches ``ceil(q · n)`` — reproducible bit-exactly in ANSI SQL
with a window cumsum, which is how the driver oracle checks it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def grouped_discrete_quantiles(ds, group_col: str, value_col: str,
                               qs: Sequence[float] = (0.5, 0.95),
                               cents: bool = True):
    """Per ``group_col``: type-1 quantiles of ``value_col``.

    ``cents=True`` maps a float column to ``floor(value·100)`` int64
    first (deterministic IEEE op, engine-portable); the output columns
    are ``p{q*100:g}_cents``. Exact for any distribution — no sketch
    error — as long as the distinct-value set per group is task-sized
    (true for prices/counts/scores; NOT for continuous uniques, where a
    KLL/t-digest sketch is the right tool instead).
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if cents:
            v = pc.cast(pc.floor(pc.multiply(v, pa.scalar(100.0))), pa.int64())
        g = (pa.table({group_col: t[group_col], "__v": v})
             .group_by([group_col, "__v"]).aggregate([("__v", "count")]))
        return pa.table({group_col: g[group_col], "__v": g["__v"],
                         "c": pc.cast(g["__v_count"], pa.int64())})

    vc = (ds.select_columns([group_col, value_col])
          .map_batches(partial, batch_format="pyarrow")
          .groupby([group_col, "__v"]).aggregate(Sum("c", alias_name="c")))

    names = [f"p{q * 100:g}_cents" if cents else f"p{q * 100:g}"
             for q in qs]

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("__v", kind="mergesort")
        cum = g["c"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])
        vals = g["__v"].to_numpy()
        out = {group_col: [g[group_col].iloc[0]]}
        for q, name in zip(qs, names):
            rank = int(np.ceil(q * n))
            out[name] = [int(vals[int(np.searchsorted(cum, max(rank, 1)))])]
        return pd.DataFrame(out)

    return vc.groupby(group_col).map_groups(per_group, batch_format="pandas")
