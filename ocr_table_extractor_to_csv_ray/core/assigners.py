"""Line → record assignment kernels, one per layout family.

* :func:`assign_words_to_columns` — generic layout (``assign.py:5-28``)
* :func:`assign_dynamic` — dynamic layout (``assign_dynamic.py:38-72``)
* :func:`assign_financial` — financial 3-column layout
  (``assign_financial.py:41-93``)
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .doc import TokenSOA
from .geometry import Line, merge_token_spans, nearest_interval
from .numeric import is_num_span, is_numeric_token
from .records import Record


def assign_words_to_columns(
    lines: Sequence[Line],
    toks: TokenSOA,
    columns: Sequence[Tuple[int, int]],
) -> List[Record]:
    """Token → containing column (inclusive), else nearest boundary;
    cells joined with a space in x-order (``assign.py:5-28``)."""
    records: List[Record] = []
    if not columns:
        return records
    for ln in lines:
        cells: List[List[str]] = [[] for _ in columns]
        for i in ln.idx:
            xc = (int(toks.x1[i]) + int(toks.x2[i])) / 2.0
            cells[nearest_interval(xc, columns)].append(toks.text[i])
        records.append(
            Record(
                page=ln.page,
                y_top=ln.y1,
                y_bot=ln.y2,
                cells=[" ".join(c).strip() for c in cells],
            )
        )
    return records


def assign_dynamic(
    lines: Sequence[Line],
    toks: TokenSOA,
    numeric_columns: Sequence[Tuple[int, int]],
    spans_per_line=None,
) -> List[Record]:
    """Label = text spans left of the first numeric column; numeric spans
    → nearest interval, first-wins per cell (``assign_dynamic.py:38-72``)."""
    records: List[Record] = []
    if not numeric_columns:
        for ln in lines:
            # ln.idx is already x-sorted
            label = " ".join(toks.text[i] for i in ln.idx)
            records.append(
                Record(page=ln.page, y_top=ln.y1, y_bot=ln.y2, cells=[label], num_count=0)
            )
        return records

    cols = sorted(numeric_columns, key=lambda ab: ab[0])
    first_left = cols[0][0]
    if spans_per_line is None:
        from .geometry import adaptive_line_spans
        spans_per_line = adaptive_line_spans(lines, toks)

    for ln, spans in zip(lines, spans_per_line):
        num_spans, txt_spans = [], []
        for s in spans:
            (num_spans if is_num_span(s[2]) else txt_spans).append(s)

        label = " ".join(txt for (x1, _, txt) in txt_spans if x1 < first_left).strip()
        values = [""] * len(cols)
        for (x1, x2, txt) in num_spans:
            j = nearest_interval((x1 + x2) / 2.0, cols)
            values[j] = values[j] or txt.strip()

        records.append(
            Record(
                page=ln.page,
                y_top=ln.y1,
                y_bot=ln.y2,
                cells=[label] + values,
                num_count=sum(1 for v in values if v),
            )
        )
    return records


def assign_financial(
    lines: Sequence[Line],
    toks: TokenSOA,
    span_gap_px: int = 18,
    newest_on_right: bool = True,
) -> List[Record]:
    """Two rightmost numeric spans become the value columns; everything
    textual joins into the label (``assign_financial.py:41-93``)."""
    records: List[Record] = []
    for ln in lines:
        spans = merge_token_spans(toks, ln.idx, span_gap_px, assume_sorted=True)
        if not spans:
            records.append(
                Record(page=ln.page, y_top=ln.y1, y_bot=ln.y2,
                       cells=["", "", ""], num_count=0, has_label=False)
            )
            continue
        numeric = [s for s in spans if is_numeric_token(s[2])]
        textual = [s for s in spans if not is_numeric_token(s[2])]
        num_sorted = sorted(numeric, key=lambda s: s[0])

        col_a = col_b = ""
        if len(num_sorted) >= 2:
            rightmost = num_sorted[-1][2]
            second = num_sorted[-2][2]
            col_a, col_b = (second, rightmost) if newest_on_right else (rightmost, second)
        elif len(num_sorted) == 1:
            col_a = num_sorted[0][2]

        label = " ".join(txt for (_, _, txt) in sorted(textual, key=lambda s: s[0])).strip()
        records.append(
            Record(
                page=ln.page,
                y_top=ln.y1,
                y_bot=ln.y2,
                cells=[label, col_a, col_b],
                num_count=len(num_sorted),
                has_label=bool(label),
            )
        )
    return records
