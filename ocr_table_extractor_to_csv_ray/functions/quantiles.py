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
    from .agg import grouped_sum

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col]
        if cents:
            v = pc.cast(pc.floor(pc.multiply(v, pa.scalar(100.0))), pa.int64())
        g = (pa.table({group_col: t[group_col], "__v": v})
             .group_by([group_col, "__v"]).aggregate([("__v", "count")]))
        return pa.table({group_col: g[group_col], "__v": g["__v"],
                         "c": pc.cast(g["__v_count"], pa.int64())})

    # (group, value) key space = sum of per-group distinct values —
    # grouped_sum, not the native per-row combine (functions/agg.py)
    vc = grouped_sum(ds.select_columns([group_col, value_col])
                     .map_batches(partial, batch_format="pyarrow"),
                     [group_col, "__v"], ["c"], num_buckets=16)

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


# ---------------------------------------------------------------------------
# t-digest sketch quantiles — the CONTINUOUS-domain path
#
# When the value domain is continuous (distinct-value count ~ row
# count), the histogram shuffle above degenerates to an all-rows
# shuffle. The mergeable-sketch shape fixes it:
#
#     map_batches: one t-digest per (batch, group)     # local combine,
#       #   O(delta) centroids each — constant size
#       └─ groupby(group).map_groups: merge digests    # shuffle moves
#          #   sketches (KBs/group), never rows
#       └─ quantile interpolation per group
#
# Dunning's merging t-digest with the arcsine scale function: centroid
# weight near the tails is forced small, so tail quantiles stay sharp.
# Rank error is bounded empirically (< 1/delta interior; tested in
# tests/test_quantile_sketch.py); estimates are NOT bit-reproducible
# under different block layouts (merge order matters) — the driver
# check for the query entry is rows-only, and the error-bound test is
# the correctness contract.

class TDigest:
    """Merging t-digest (Dunning & Ertl, "Computing extremely accurate
    quantiles using t-digests", arXiv:1902.04023). ``delta`` ≈ max
    centroid count scale; memory O(delta)."""

    __slots__ = ("delta", "means", "weights", "_buf")

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None) -> None:
        self.delta = delta
        self.means = np.empty(0) if means is None else np.asarray(means, float)
        self.weights = (np.empty(0) if weights is None
                        else np.asarray(weights, float))
        self._buf: list = []

    # -- scale function k(q) = δ/(2π)·asin(2q−1): tail-accurate
    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))

    def update(self, values: np.ndarray) -> None:
        v = np.asarray(values, float)
        v = v[~np.isnan(v)]
        if len(v):
            self._buf.append(v)
        if sum(len(b) for b in self._buf) >= 4 * self.delta:
            self._compress()

    def merge(self, other: "TDigest") -> None:
        if len(other.means):
            self.means = np.concatenate([self.means, other.means])
            self.weights = np.concatenate([self.weights, other.weights])
        self._compress()

    def _compress(self) -> None:
        if self._buf:
            newv = np.concatenate(self._buf)
            self._buf = []
            self.means = np.concatenate([self.means, newv])
            self.weights = np.concatenate([self.weights, np.ones(len(newv))])
        if len(self.means) == 0:
            return
        order = np.argsort(self.means, kind="mergesort")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        out_m: list = []
        out_w: list = []
        acc_m, acc_w = m[0], w[0]
        q_left = 0.0
        k_left = float(self._k(np.array([0.0]))[0])
        for i in range(1, len(m)):
            q_right = (acc_w + w[i] + q_left * total) / total
            if float(self._k(np.array([q_right]))[0]) - k_left <= 1.0:
                # weighted-mean absorb
                acc_m = (acc_m * acc_w + m[i] * w[i]) / (acc_w + w[i])
                acc_w += w[i]
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                q_left += acc_w / total
                k_left = float(self._k(np.array([q_left]))[0])
                acc_m, acc_w = m[i], w[i]
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        w = self.weights
        total = w.sum()
        # centroid "centers" in cumulative-rank space
        centers = np.cumsum(w) - w / 2
        rank = q * total
        if rank <= centers[0]:
            return float(self.means[0])
        if rank >= centers[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(centers, rank) - 1)
        span = centers[i + 1] - centers[i]
        frac = (rank - centers[i]) / span if span > 0 else 0.0
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))


def grouped_sketch_quantiles(ds, group_col: str, value_col: str,
                             qs: Sequence[float] = (0.5, 0.95),
                             delta: int = 200):
    """Per ``group_col``: t-digest quantile ESTIMATES of a continuous
    ``value_col`` (output columns ``p{q*100:g}_est``). The shuffle
    moves O(delta) centroids per (block, group), never rows."""

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pa.table({group_col: t[group_col],
                       "__v": t[value_col]}).to_pandas()
        rows = []
        for gval, sub in df.groupby(group_col, sort=False):
            td = TDigest(delta)
            td.update(sub["__v"].to_numpy(dtype=float))
            td._compress()
            rows.append({group_col: gval,
                         "means": td.means.tolist(),
                         "weights": td.weights.tolist()})
        return pd.DataFrame(rows,
                            columns=[group_col, "means", "weights"])

    sketches = (ds.select_columns([group_col, value_col])
                .map_batches(partial, batch_format="pyarrow"))

    names = [f"p{q * 100:g}_est" for q in qs]

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        td = TDigest(delta)
        for m, w in zip(g["means"], g["weights"]):
            td.merge(TDigest(delta, np.asarray(m), np.asarray(w)))
        out = {group_col: [g[group_col].iloc[0]]}
        for q, name in zip(qs, names):
            out[name] = [td.quantile(q)]
        return pd.DataFrame(out)

    return sketches.groupby(group_col).map_groups(merge_group,
                                                  batch_format="pandas")


def equidepth_buckets(ds, value_col: str, id_col: str = "doc_id",
                      n_buckets: int = 4):
    """Global equi-depth (quantile) bucketing — the curriculum/binning
    primitive: boundaries are the exact type-1 quantiles at i/n_buckets
    (i = 1..n_buckets−1) of the integer ``value_col``, computed over the
    DISTINCT-VALUE weighted histogram (one shuffle of distinct values,
    never rows — the same discrete-domain contract as
    ``grouped_discrete_quantiles``); rows are then assigned
    ``bucket = 1 + #(boundaries < value)`` in a broadcast searchsorted
    pass, so ties share a bucket deterministically (value-based, unlike
    SQL NTILE's arbitrary row split).

    All threshold math is integer (``ceil(i·n / n_buckets)`` as
    ``(i·n + n_buckets − 1) // n_buckets``) — engine-portable. Skewed
    data can collapse adjacent boundaries; duplicates are kept so the
    bucket ids still match the SQL count-of-boundaries-below contract.

    Returns a Dataset (id_col, bucket:int64).
    """
    import ray
    from ray.data.aggregate import Sum

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"__v": pc.cast(t[value_col], pa.int64())})
             .group_by("__v").aggregate([("__v", "count")]))
        return pa.table({"__v": g["__v"],
                         "c": pc.cast(g["__v_count"], pa.int64())})

    from .agg import grouped_sum
    hist = (grouped_sum(ds.select_columns([value_col])
                        .map_batches(hist_partial, batch_format="pyarrow"),
                        "__v", ["c"], num_buckets=16)
            .to_pandas())                      # ≤ |distinct values| rows
    hist = hist.sort_values("__v", kind="mergesort")
    vals = hist["__v"].to_numpy(np.int64)
    cum = hist["c"].to_numpy(np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        raise ValueError("equidepth_buckets: empty input")
    # type-1 quantile: smallest v with cumulative count >= ceil(i*n/k)
    thresholds = [(i * n + n_buckets - 1) // n_buckets
                  for i in range(1, n_buckets)]
    bnd = np.array([vals[np.searchsorted(cum, t, side="left")]
                    for t in thresholds], dtype=np.int64)
    bnd_ref = ray.put(np.sort(bnd))

    def assign(t: pa.Table) -> pa.Table:
        b = ray.get(bnd_ref)
        v = pc.cast(t[value_col], pa.int64()).to_numpy()
        return pa.table({
            id_col: t[id_col],
            "bucket": pa.array(
                1 + np.searchsorted(b, v, side="left").astype(np.int64)),
        })

    return ds.select_columns([id_col, value_col]).map_batches(
        assign, batch_format="pyarrow")
