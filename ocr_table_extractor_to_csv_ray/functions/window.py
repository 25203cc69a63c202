"""Time-ordered per-key operators the Dataset API lacks: as-of join and
sliding-window aggregates (beyond-reference; standard large-pipeline
primitives — see SURVEY.md §2.13).

Both are expressed as ``groupby(key).map_groups`` with a fully
vectorized (``np.searchsorted``) kernel per group — the documented
partitioning assumption is that ONE KEY's rows fit one task (same
contract as ``join.py::sessionize``). For a key whose history outgrows
a task, the 100 TB path is range-partitioning the timeline per key with
one window of overlap, which preserves both semantics below because
each output row depends only on input rows within the window/horizon
behind it.

Timestamps must be a timestamp dtype (epoch-µs under Arrow); plain ints
are rejected rather than guessed (same rule as ``sessionize``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us(col: pa.ChunkedArray | pa.Array, what: str) -> pa.Array:
    t = col.type
    if not pa.types.is_timestamp(t):
        raise TypeError(
            f"{what} must be a timestamp column, got {t}; cast explicitly "
            "(epoch-second/ms ints would silently mis-scale the window)")
    return pc.cast(col, pa.timestamp("us"))


def asof_join(left_ds, right_ds, key: str = "user_id", ts: str = "ts",
              out_ts: str = "asof_ts"):
    """For every left row, the greatest right ``ts`` at-or-before the
    left ``ts`` within the same key (NULL when no prior right row) —
    the classic point-in-time / as-of join.

    Implementation: tag both sides, union (no co-materialization), one
    ``groupby(key)`` shuffle, then a per-group sorted merge via
    ``searchsorted`` — O(n log n) per key, vectorized.
    Returns ``(left columns…, asof_ts)``. Both sides must share a
    schema (``select_columns``/rename before joining) — the union
    requires it.
    """
    def _tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            _ts_us(t[ts], f"{side}.{ts}")
            return t.append_column("__side", pa.array([side] * t.num_rows))
        return f

    tagged = (left_ds.map_batches(_tag("l"), batch_format="pyarrow")
              .union(right_ds.map_batches(_tag("r"), batch_format="pyarrow")))

    def merge(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"].to_numpy(zero_copy_only=False))
        tsv = pc.cast(g[ts], pa.timestamp("us")).combine_chunks()
        tsv = tsv.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        l_mask = side == "l"
        lt = g.filter(pa.array(l_mask)).drop_columns(["__side"])
        if lt.num_rows == 0:
            return lt.append_column(out_ts, pa.array([], pa.timestamp("us")))
        r_ts = np.sort(tsv[~l_mask], kind="mergesort")
        l_ts = tsv[l_mask]
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        matched = np.where(idx >= 0, r_ts[np.maximum(idx, 0)], 0)
        vals = pa.array(matched.astype("datetime64[us]"),
                        pa.timestamp("us"),
                        mask=(idx < 0))
        return lt.append_column(out_ts, vals)

    return tagged.groupby(key).map_groups(merge, batch_format="pyarrow")


def range_join(points_ds, intervals_ds, point_id: str = "point_id",
               interval_id: str = "interval_id", ts: str = "ts",
               start: str = "start", end: str = "end",
               bucket_seconds: float = 600.0):
    """Non-equi interval containment join: every (point, interval) pair
    with ``start ≤ point.ts ≤ end``. Returns ``(point_id, interval_id)``.

    Shuffle shape: time is bucketized (``bucket_seconds``); each
    interval row replicates to every bucket it overlaps, each point
    goes to exactly one bucket, and ONE ``groupby(bucket)`` co-locates
    candidates — pairs form only in the point's own bucket, so no
    dedup pass is needed. Partitioning assumption: one bucket's rows
    fit one task — size ``bucket_seconds`` to the data's time density
    (same contract class as ``sessionize``); intervals much wider than
    the bucket multiply replication, so pick the bucket near the median
    interval width. The two id columns must share a dtype (they travel
    in one unified schema through the bucket shuffle).
    """
    def _pts(t: pa.Table) -> pa.Table:
        tsv = _ts_us(t[ts], f"points.{ts}")
        tsv = tsv.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = int(round(bucket_seconds * 1_000_000))
        return pa.table({
            "bucket": pa.array(tsv // w),
            "pid": t[point_id],
            "iid": pa.nulls(t.num_rows, pa.int64()),
            "p_ts": pa.array(tsv),
            "i_lo": pa.nulls(t.num_rows, pa.int64()),
            "i_hi": pa.nulls(t.num_rows, pa.int64()),
        })

    def _ivs(t: pa.Table) -> pa.Table:
        lo = _ts_us(t[start], f"intervals.{start}")
        hi = _ts_us(t[end], f"intervals.{end}")
        lo = lo.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hi = hi.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        w = int(round(bucket_seconds * 1_000_000))
        b_lo, b_hi = lo // w, hi // w
        reps = np.maximum(b_hi - b_lo + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) if len(idx) else np.empty(0, np.int64)
        ids = t[interval_id].combine_chunks() if isinstance(t[interval_id], pa.ChunkedArray) else t[interval_id]
        return pa.table({
            "bucket": pa.array(b_lo[idx] + offs),
            "pid": pa.nulls(len(idx), ids.type),
            "iid": ids.take(pa.array(idx)),
            "p_ts": pa.nulls(len(idx), pa.int64()),
            "i_lo": pa.array(lo[idx]),
            "i_hi": pa.array(hi[idx]),
        })

    tagged = (points_ds.map_batches(_pts, batch_format="pyarrow")
              .union(intervals_ds.map_batches(_ivs, batch_format="pyarrow")))

    def pair(g: pa.Table) -> pa.Table:
        is_pt = pc.is_valid(g["p_ts"]).to_numpy(zero_copy_only=False)
        pts_t = g.filter(pa.array(is_pt))
        ivs_t = g.filter(pa.array(~is_pt))
        if pts_t.num_rows == 0 or ivs_t.num_rows == 0:
            return pa.table({point_id: pa.chunked_array([], g["pid"].type),
                             interval_id: pa.chunked_array([], g["iid"].type)})
        p_ts = pts_t["p_ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = ivs_t["i_lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = ivs_t["i_hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (lo[None, :] <= p_ts[:, None]) & (p_ts[:, None] <= hi[None, :])
        pi, ii = np.nonzero(m)
        return pa.table({
            point_id: pts_t["pid"].take(pa.array(pi.astype(np.int64))),
            interval_id: ivs_t["iid"].take(pa.array(ii.astype(np.int64))),
        })

    return tagged.groupby("bucket").map_groups(pair, batch_format="pyarrow")


def sliding_window_agg(ds, key: str = "user_id", ts: str = "ts",
                       window_seconds: float = 600.0,
                       value_cents: Optional[str] = None):
    """Per row: aggregates over the key's rows with ``ts`` in
    ``[row.ts − window, row.ts]`` (value-RANGE frame, peers included —
    ANSI ``RANGE BETWEEN … PRECEDING AND CURRENT ROW`` semantics).

    Emits ``n_window`` (count) and, when ``value_cents`` names an int64
    column, ``sum_window_cents`` — integer sums so the result is
    order-independent and engine-portable (the float-sum trap).
    """
    w_us = int(round(window_seconds * 1_000_000))

    def per_key(g: pa.Table) -> pa.Table:
        tsv = pc.cast(g[ts], pa.timestamp("us")).combine_chunks()
        tsv = tsv.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.argsort(tsv, kind="mergesort")
        st = tsv[order]
        lo = np.searchsorted(st, st - w_us, side="left")
        hi = np.searchsorted(st, st, side="right")
        n_win = (hi - lo).astype(np.int64)
        out = g.take(pa.array(order.astype(np.int64)))
        cols = {c: out[c] for c in out.column_names}
        cols["n_window"] = pa.array(n_win)
        if value_cents is not None:
            cents = np.asarray(out[value_cents].to_numpy(zero_copy_only=False),
                               dtype=np.int64)
            csum = np.concatenate(([0], np.cumsum(cents)))
            cols["sum_window_cents"] = pa.array(csum[hi] - csum[lo])
        return pa.table(cols)

    def _check(t: pa.Table) -> pa.Table:
        _ts_us(t[ts], ts)
        return t

    return ds.map_batches(_check, batch_format="pyarrow") \
             .groupby(key).map_groups(per_key, batch_format="pyarrow")

def rows_window_agg(ds, key: str = "user_id", ts: str = "ts",
                    order_tiebreak: Optional[str] = None,
                    preceding_rows: int = 2,
                    value_cents: Optional[str] = None):
    """Per row: aggregates over the key's trailing ROWS frame — ANSI
    ``ROWS BETWEEN <preceding_rows> PRECEDING AND CURRENT ROW`` ordered
    by ``(ts, order_tiebreak)``. The physical-row frame complements
    ``sliding_window_agg``'s value-RANGE frame: a RANGE frame includes
    ts-peers, a ROWS frame includes exactly ``preceding_rows + 1`` rows
    (fewer at the head of the partition).

    Emits ``n_frame`` (frame row count) and, when ``value_cents`` names
    an int64 column, ``moving_sum_cents`` — an integer moving sum, NOT a
    float moving average, so the result is engine-portable bit-for-bit
    (callers divide at the edge if they want the average).

    ``order_tiebreak`` must make the sort order total when ts has
    duplicates per key, otherwise the frame assignment (and therefore
    the output) is nondeterministic — pass the row's unique id.

    Scale: same one-key-per-task ``groupby().map_groups`` contract as
    ``sliding_window_agg``; a ROWS frame is boundary-local (each output
    row reads ≤ ``preceding_rows`` rows behind it), so a mega-key can be
    range-split by time with ``preceding_rows`` rows of overlap, exactly
    like the ``sessionize`` hot-key guard (join.py:48).
    """
    k = int(preceding_rows)
    if k < 0:
        raise ValueError(f"preceding_rows must be >= 0, got {preceding_rows}")

    def per_key(g: pa.Table) -> pa.Table:
        tsv = _ts_us(g[ts].combine_chunks(), ts)
        tsv = tsv.to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        if order_tiebreak is not None:
            tie = g[order_tiebreak].to_numpy(zero_copy_only=False)
            order = np.lexsort((tie, tsv))       # ts major, tiebreak minor
        else:
            order = np.argsort(tsv, kind="mergesort")
        out = g.take(pa.array(order.astype(np.int64)))
        n = out.num_rows
        idx = np.arange(n, dtype=np.int64)
        lo = np.maximum(idx - k, 0)
        cols = {c: out[c] for c in out.column_names}
        cols["n_frame"] = pa.array(idx - lo + 1)
        if value_cents is not None:
            cents = np.asarray(out[value_cents].to_numpy(zero_copy_only=False),
                               dtype=np.int64)
            csum = np.concatenate(([0], np.cumsum(cents)))
            cols["moving_sum_cents"] = pa.array(csum[idx + 1] - csum[lo])
        return pa.table(cols)

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")
