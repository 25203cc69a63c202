"""Geometric primitives shared by every layout kernel.

The reference repeats the projection-profile valley algorithm five times
(``columns.py:21-41``, ``rows.py:26-47``, ``grid_builder.py:39-55``,
``layout_transformers.py:228-255,313-338``, ``dataset_builder.py:49-80``);
here it is ONE parameterized primitive (:func:`valley_cuts`) whose
per-call thresholds reproduce each call site exactly.  Interval coverage
is accumulated with a difference array + cumsum instead of the
reference's O(tokens × width) slice-adds — identical profile, linear
cost, which matters for very wide multi-page documents.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from .doc import TokenSOA


class Line(NamedTuple):
    """One visual line: page, bbox and x-sorted token indices into the doc."""

    page: int
    x1: int
    y1: int
    x2: int
    y2: int
    idx: np.ndarray          # token indices, sorted by token x1 (stable)


def _close_line(toks: TokenSOA, page: int, members: List[int],
                _x1=None, _y1=None, _x2=None, _y2=None) -> Line:
    """Lines are tiny (a handful of tokens): python sort/min/max over
    prefetched int lists beats numpy's per-call dispatch by ~3×. The
    ``_x1.._y2`` lists are per-doc prefetches (``tolist()`` once)."""
    if _x1 is None:
        _x1 = toks.x1.tolist(); _y1 = toks.y1.tolist()
        _x2 = toks.x2.tolist(); _y2 = toks.y2.tolist()
    members = sorted(members, key=lambda i: _x1[i])   # stable, like argsort
    return Line(
        page=page,
        x1=min(_x1[i] for i in members),
        y1=min(_y1[i] for i in members),
        x2=max(_x2[i] for i in members),
        y2=max(_y2[i] for i in members),
        idx=np.asarray(members, dtype=np.int64),
    )


def overlap_ratio(a1: int, a2: int, b1: int, b2: int) -> float:
    """Vertical overlap of two bands over the SHORTER band's length
    (reference ``structures.py:17-20`` — denominator is min length)."""
    inter = min(a2, b2) - max(a1, b1)
    if inter < 0:
        inter = 0
    denom = min(a2 - a1, b2 - b1)
    if denom < 1:
        denom = 1
    return inter / denom


def build_lines(toks: TokenSOA) -> List[Line]:
    """Group a document's tokens into visual lines (reference ``lines.py:6-63``).

    Two regimes, chosen exactly as the reference does:

    * if ANY token carries a truthy ``line_id``: group by
      ``(page, line_id or "inferred_<page>_<int(yc)>")`` (``lines.py:14-26``);
    * else: sort by ``(page, yc, x1)`` and sweep, merging a token into the
      open line iff its vertical overlap with the RUNNING band is >= 0.5,
      the band expanding as tokens join (``lines.py:28-60``); a page change
      always closes the line.

    Output sorted by ``(page, y1, x1)`` (``lines.py:25,62``).
    """
    n = len(toks)
    if n == 0:
        return []

    # per-doc prefetch: python-int lists once, loops never touch numpy
    x1_l = toks.x1.tolist(); y1_l = toks.y1.tolist()
    x2_l = toks.x2.tolist(); y2_l = toks.y2.tolist()
    page_l = toks.page.tolist()

    has_ids = toks.line_id is not None and any(bool(v) for v in toks.line_id)
    if has_ids:
        groups: dict = {}
        for i in range(n):
            lid = toks.line_id[i] or f"inferred_{page_l[i]}_{(y1_l[i] + y2_l[i]) // 2}"
            groups.setdefault((page_l[i], lid), []).append(i)
        lines = [_close_line(toks, page, members, x1_l, y1_l, x2_l, y2_l)
                 for (page, _), members in groups.items()]
        lines.sort(key=lambda L: (L.page, L.y1, L.x1))
        return lines

    order = sorted(range(n), key=lambda i: (page_l[i], y1_l[i] + y2_l[i], x1_l[i]))
    lines: List[Line] = []
    current: List[int] = []
    cur_page = page_l[order[0]]
    band_lo = y1_l[order[0]]
    band_hi = y2_l[order[0]]

    for i in order:
        pg = page_l[i]
        ty1, ty2 = y1_l[i], y2_l[i]
        if pg != cur_page:
            if current:
                lines.append(_close_line(toks, cur_page, current, x1_l, y1_l, x2_l, y2_l))
            current = [i]
            cur_page = pg
            band_lo, band_hi = ty1, ty2
            continue
        if overlap_ratio(band_lo, band_hi, ty1, ty2) >= 0.5:
            current.append(i)
            if ty1 < band_lo:
                band_lo = ty1
            if ty2 > band_hi:
                band_hi = ty2
        else:
            if current:
                lines.append(_close_line(toks, cur_page, current, x1_l, y1_l, x2_l, y2_l))
            current = [i]
            band_lo, band_hi = ty1, ty2

    if current:
        lines.append(_close_line(toks, cur_page, current, x1_l, y1_l, x2_l, y2_l))

    lines.sort(key=lambda L: (L.page, L.y1, L.x1))
    return lines


def valley_cuts(
    starts: np.ndarray,
    ends: np.ndarray,
    lo: int,
    hi: int,
    min_gap_len: int,
) -> Optional[List[int]]:
    """Zero-coverage valleys of the 1-D projection profile over ``[lo, hi)``.

    Returns the midpoints of every zero-run strictly longer than
    ``min_gap_len`` pixels, or ``None`` when the profile has no zero at
    all (the reference's "no gaps" branch — also taken when the profile
    is empty, i.e. ``hi <= lo``).
    """
    size = int(hi) - int(lo)
    if size <= 0:
        return None
    diff = np.zeros(size + 1, dtype=np.int64)
    np.add.at(diff, np.clip(np.asarray(starts, dtype=np.int64) - lo, 0, size), 1)
    np.add.at(diff, np.clip(np.asarray(ends, dtype=np.int64) - lo, 0, size), -1)
    profile = np.cumsum(diff[:-1])
    zeros = np.flatnonzero(profile == 0)
    if zeros.size == 0:
        return None
    breaks = np.flatnonzero(np.diff(zeros) != 1)
    run_first = np.concatenate(([0], breaks + 1))
    run_last = np.concatenate((breaks, [zeros.size - 1]))
    cuts: List[int] = []
    for a, b in zip(run_first, run_last):
        if (b - a + 1) > min_gap_len:
            # mean of a consecutive integer run == midpoint, truncated
            cuts.append(int(lo) + (int(zeros[a]) + int(zeros[b])) // 2)
    return cuts


def estimate_columns(
    lines: Sequence[Line],
    toks: TokenSOA,
    min_col_width: int = 25,
    col_valley_px: int = 5,
    expected_n_cols: Optional[int] = None,
) -> List[Tuple[int, int]]:
    """Column intervals from the vertical projection profile
    (reference ``columns.py:5-72``).

    Valleys longer than ``col_valley_px`` become cut points at the valley
    midpoint; intervals narrower than ``min_col_width`` are dropped; an
    ``expected_n_cols`` target merges the closest pair / splits the widest
    interval until satisfied (``columns.py:51-70``).
    """
    if not lines:
        return []
    idx = np.concatenate([ln.idx for ln in lines])
    idx = idx[toks.text[idx] != ""]
    if idx.size == 0:
        return []
    x1 = toks.x1[idx]
    x2 = toks.x2[idx]
    x_min = int(x1.min())
    x_max = int(x2.max())
    mids = valley_cuts(x1, x2, x_min, x_max, col_valley_px)
    if mids is None:
        return [(x_min, x_max)]
    cuts = sorted(set([x_min] + mids + [x_max]))
    intervals = [(l, r) for l, r in zip(cuts, cuts[1:]) if r - l >= min_col_width]

    if expected_n_cols and expected_n_cols > 0 and len(intervals) != expected_n_cols:
        while len(intervals) > expected_n_cols:
            dists = [intervals[i + 1][0] - intervals[i][1] for i in range(len(intervals) - 1)]
            if not dists:
                break
            j = int(np.argmin(dists))
            intervals = intervals[:j] + [(intervals[j][0], intervals[j + 1][1])] + intervals[j + 2:]
        while len(intervals) < expected_n_cols:
            widths = [r - l for l, r in intervals]
            if not widths:
                break
            j = int(np.argmax(widths))
            l, r = intervals[j]
            mid = l + widths[j] // 2
            intervals = intervals[:j] + [(l, mid), (mid, r)] + intervals[j + 1:]
    return intervals


def merge_token_spans(
    toks: TokenSOA, idx: np.ndarray, max_gap_px: int,
    assume_sorted: bool = False,
) -> List[Tuple[int, int, str]]:
    """Merge x-adjacent tokens of one line into spans ``(x1, x2, text)``
    while the inter-token gap is <= ``max_gap_px`` (the reference's
    thrice-duplicated ``_merge_adjacent`` — ``column_model.py:29-45``,
    ``assign_dynamic.py:21-36``, ``assign_financial.py:20-39`` — fused).

    ``assume_sorted=True`` skips the x-sort — valid for ``Line.idx``
    (``_close_line`` sorts members by x1)."""
    if idx.size == 0:
        return []
    if not assume_sorted:
        order = np.argsort(toks.x1[idx], kind="stable")
        idx = idx[order]
    spans: List[Tuple[int, int, str]] = []
    sx1 = int(toks.x1[idx[0]])
    sx2 = int(toks.x2[idx[0]])
    buf = [toks.text[idx[0]]]
    for i in idx[1:]:
        tx1, tx2 = int(toks.x1[i]), int(toks.x2[i])
        if tx1 - sx2 <= max_gap_px:
            buf.append(toks.text[i])
            if tx2 > sx2:
                sx2 = tx2
        else:
            spans.append((sx1, sx2, " ".join(buf).strip()))
            sx1, sx2, buf = tx1, tx2, [toks.text[i]]
    spans.append((sx1, sx2, " ".join(buf).strip()))
    return spans


def fast_percentile(a: np.ndarray, q: float) -> float:
    """Bit-exact ``np.percentile(a, q)`` (default 'linear' method) for
    small 1-D float arrays, without numpy's dispatch overhead — the
    kernel calls this once per LINE, and ``np.percentile``'s ~100 µs of
    Python machinery dominated the whole dynamic layout (profiled 68 %).

    Replicates numpy's lerp exactly, including the ``t >= 0.5`` branch
    that computes from the right endpoint (numpy ``_lerp``), so callers'
    ``int()`` truncation sees identical values.
    """
    a = np.sort(a)
    n = a.size
    vi = (q / 100.0) * (n - 1)
    lo = int(vi)
    t = vi - lo
    x = a[lo]
    if t == 0.0:
        return float(x)
    y = a[lo + 1 if lo + 1 < n else n - 1]
    d = y - x
    return float(x + d * t) if t < 0.5 else float(y - d * (1.0 - t))


def line_gap_quantile(toks: TokenSOA, idx: np.ndarray, q: float = 95.0,
                      assume_sorted: bool = False) -> int:
    """Per-line adaptive span gap: the q-th percentile of positive
    inter-token gaps, floored at 12, default 18 when there is no gap
    (reference ``column_model.py:18-27`` ≡ ``assign_dynamic.py:12-19``)."""
    if idx.size < 2:
        return 18
    if not assume_sorted:
        order = np.argsort(toks.x1[idx], kind="stable")
        idx = idx[order]
    gaps = toks.x1[idx][1:] - toks.x2[idx][:-1]
    gaps = gaps[gaps > 0]
    if gaps.size == 0:
        return 18
    return max(12, int(fast_percentile(gaps.astype(float), q)))


def adaptive_line_spans(lines: Sequence[Line], toks: TokenSOA
                        ) -> List[List[Tuple[int, int, str]]]:
    """Per-line spans with the per-line adaptive gap — computed ONCE and
    shared between the dynamic column model and the dynamic assigner
    (the reference recomputes the identical spans in both,
    ``column_model.py:110-117`` and ``assign_dynamic.py:50-55``).

    Fused pure-python path over doc-level prefetched lists (tiny-array
    numpy dispatch dominated otherwise); arithmetic is bit-identical to
    :func:`line_gap_quantile` + :func:`merge_token_spans`.
    """
    x1_l = toks.x1.tolist()
    x2_l = toks.x2.tolist()
    text_l = toks.text.tolist()
    out: List[List[Tuple[int, int, str]]] = []
    for ln in lines:
        ids = ln.idx.tolist()                     # already x-sorted
        # --- gap quantile (line_gap_quantile semantics) ---
        if len(ids) < 2:
            max_gap = 18
        else:
            gaps = [float(x1_l[b] - x2_l[a]) for a, b in zip(ids, ids[1:])
                    if x1_l[b] - x2_l[a] > 0]
            if not gaps:
                max_gap = 18
            else:
                gaps.sort()
                n_g = len(gaps)
                vi = 0.95 * (n_g - 1)
                lo = int(vi)
                t = vi - lo
                if t == 0.0:
                    pctl = gaps[lo]
                else:
                    x, y = gaps[lo], gaps[lo + 1 if lo + 1 < n_g else n_g - 1]
                    d = y - x
                    pctl = x + d * t if t < 0.5 else y - d * (1.0 - t)
                max_gap = max(12, int(pctl))
        # --- span merge (merge_token_spans semantics) ---
        if not ids:
            out.append([])
            continue
        spans: List[Tuple[int, int, str]] = []
        sx1 = x1_l[ids[0]]
        sx2 = x2_l[ids[0]]
        buf = [text_l[ids[0]]]
        for i in ids[1:]:
            tx1, tx2 = x1_l[i], x2_l[i]
            if tx1 - sx2 <= max_gap:
                buf.append(text_l[i])
                if tx2 > sx2:
                    sx2 = tx2
            else:
                spans.append((sx1, sx2, " ".join(buf).strip()))
                sx1, sx2, buf = tx1, tx2, [text_l[i]]
        spans.append((sx1, sx2, " ".join(buf).strip()))
        out.append(spans)
    return out


def nearest_interval(xc: float, intervals: Sequence[Tuple[int, int]]) -> int:
    """Containment first (inclusive ends), else nearest boundary
    (reference ``assign.py:17-24`` / ``assign_dynamic.py:62-67``)."""
    for i, (L, R) in enumerate(intervals):
        if L <= xc <= R:
            return i
    dists = [min(abs(xc - L), abs(xc - R)) for (L, R) in intervals]
    return int(np.argmin(dists))
