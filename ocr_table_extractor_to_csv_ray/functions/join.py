"""Joins and windowed event aggregates.

The reference has no distributed joins (SURVEY.md §2.5) — these are the
engine-level operators a corpus pipeline needs around it:

- :func:`broadcast_join` — small side broadcast ONCE via ``ray.put``,
  vectorized hash lookup per batch. No shuffle; the pattern for every
  dimension/metadata enrichment (J2's image↔hocr stem pairing is the
  same join with ``key = stem``).
- :func:`sessionize` — event-time session windows per key: partition by
  key (one ``groupby`` shuffle), sort within group, split where the gap
  exceeds the timeout. The ordering assumption (events of one key fit a
  group and sort in memory) is the documented partitioning contract.
- :func:`pair_by_stem` — the reference's dataset-CLI discovery join
  (``dataset_cli.py:39-67``): filename-stem equijoin, first match wins.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd


def broadcast_join(ds, small_df: pd.DataFrame, key: str,
                   how: str = "inner", suffix: str = "_r"):
    """Join ``ds`` against a driver-side small table without a shuffle.

    ``small_df`` is put in the object store once; every batch does a
    vectorized pandas merge against it. ``how`` ∈ {inner, left}.
    """
    import ray

    ref = ray.put(small_df)

    def _join(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(ref)
        return batch.merge(right, on=key, how=how, suffixes=("", suffix))

    return ds.map_batches(_join, batch_format="pandas")


def sessionize(ds, key: str = "user_id", ts: str = "ts",
               gap_seconds: int = 1800):
    """Session windows: per key, sort by ``ts``; a new session starts
    where the gap from the previous event exceeds ``gap_seconds``.

    Returns one row per (key, session_id) with ``n_events``,
    ``session_start``, ``session_end`` (epoch microseconds, int64).
    SQL-equivalent: ``lag`` + cumulative sum of gap flags.
    """
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="mergesort")
        t = g[ts].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            t = t.astype("datetime64[us]").astype(np.int64)   # epoch us
        else:
            t = t.astype(np.int64)
        new_sess = np.ones(len(t), dtype=np.int64)
        if len(t) > 1:
            new_sess[1:] = (t[1:] - t[:-1] > gap_seconds * 1_000_000).astype(np.int64)
        sess_id = np.cumsum(new_sess)                  # 1-based per key
        out = pd.DataFrame({key: g[key].to_numpy(), "session_id": sess_id, "_t": t})
        agg = out.groupby([key, "session_id"], as_index=False).agg(
            n_events=("_t", "size"),
            session_start=("_t", "min"),
            session_end=("_t", "max"),
        )
        for c in ("n_events", "session_start", "session_end", "session_id"):
            agg[c] = agg[c].astype("int64")
        return agg

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def hash_join(left, right, key: str, num_buckets: int = 32,
              suffix: str = "_r", how: str = "inner"):
    """Explicit partitioned hash join for two LARGE datasets.

    Both sides get ``bucket = crc32(key) % B`` in a vectorized
    ``map_batches``; the tagged union shuffles ONCE on ``bucket``
    (``groupby``), and each bucket joins its two sides with a pandas
    merge inside ``map_groups``. B is the partitioning contract: one
    bucket (all rows of ~1/B of the key space, both sides) must fit a
    worker's heap — salt hot keys into sub-buckets if one key dominates.
    (Ray ≥ 2.46 also ships ``Dataset.join`` with the same
    hash-partitioned plan; this spells the pattern out explicitly.)
    """
    import zlib

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    all_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: str, own_cols):
        def _t(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            for c in all_cols:          # union needs one schema: pad with NA
                if c not in b.columns:
                    b[c] = pd.NA
            b = b[all_cols]
            b["__bucket"] = [zlib.crc32(str(k).encode()) % num_buckets
                             for k in b[key]]
            b["__side"] = side
            return b
        return _t

    lt = left.map_batches(tag("l", left_cols), batch_format="pandas")
    rt = right.map_batches(tag("r", right_cols), batch_format="pandas")
    both = lt.union(rt)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][left_cols]
        r = g[g["__side"] == "r"][right_cols]
        return l.merge(r, on=key, how=how, suffixes=("", suffix))

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def pair_by_stem(image_paths: Sequence[str], hocr_paths: Sequence[str]
                 ) -> List[Tuple[str, str]]:
    """J2 (``dataset_cli.py:39-67``): for each image, the hOCR file with
    the same stem; images without a partner are skipped. Deterministic:
    inputs scanned in sorted order, first stem occurrence wins."""
    by_stem: Dict[str, str] = {}
    for h in sorted(hocr_paths):
        stem = os.path.splitext(os.path.basename(h))[0]
        by_stem.setdefault(stem, h)
    out: List[Tuple[str, str]] = []
    for img in sorted(image_paths):
        stem = os.path.splitext(os.path.basename(img))[0]
        if stem in by_stem:
            out.append((img, by_stem[stem]))
    return out


def dedup_pairs(pairs: Sequence[Tuple[str, str]]) -> List[Tuple[str, str]]:
    """A4 (``dataset_cli.py:189-195``): drop already-seen resolved
    (image, hocr) pairs, preserving first occurrence order."""
    seen = set()
    out = []
    for img, hocr in pairs:
        k = (os.path.realpath(img), os.path.realpath(hocr))
        if k in seen:
            continue
        seen.add(k)
        out.append((img, hocr))
    return out
