"""Span codec: the corpus schema (FIXTURES.md §1/§2) ↔ kernel types.

Input spans (one list per document row):
    ``kind ∈ {word, media, ...}``; ``kind="word"`` packs hOCR geometry as
    ``media_ref = "bbox://p{page}/{x1},{y1},{x2},{y2}[/{line_id}]"``
    (mirrors the hOCR ``title="bbox ..."`` attr, reference
    ``structures.py:6-15``).

Output spans (CSV reading order, reference ``exporters.py:7-12``):
    ``header_cell``* + ``row_end``, then per body row ``cell``* +
    ``row_end``; ``offset`` is the explicit order field so ordering
    survives any physical re-ordering of blocks.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

BBOX_PREFIX = "bbox://p"
# named-group regex for vectorized pyarrow.compute.extract_regex
BBOX_PATTERN = (
    r"^bbox://p(?P<page>\d+)/(?P<x1>\d+),(?P<y1>\d+),(?P<x2>\d+),(?P<y2>\d+)"
    r"(?:/(?P<line_id>.+))?$"
)

KIND_WORD = "word"
KIND_MEDIA = "media"
KIND_HEADER_CELL = "header_cell"
KIND_CELL = "cell"
KIND_ROW_END = "row_end"


def encode_bbox_ref(
    page: int, x1: int, y1: int, x2: int, y2: int, line_id: Optional[str] = None
) -> str:
    ref = f"{BBOX_PREFIX}{page}/{x1},{y1},{x2},{y2}"
    return f"{ref}/{line_id}" if line_id else ref


def grid_to_spans(
    header: Sequence[str], rows: Sequence[Sequence[str]]
) -> List[Tuple[str, str, str, int]]:
    """Serialize a (header, rows) grid into output span tuples
    ``(kind, text, media_ref, offset)`` in CSV reading order."""
    out: List[Tuple[str, str, str, int]] = []
    off = 0
    if header:
        for cell in header:
            out.append((KIND_HEADER_CELL, cell, "", off))
            off += 1
        out.append((KIND_ROW_END, "", "", off))
        off += 1
    for row in rows:
        for cell in row:
            out.append((KIND_CELL, cell, "", off))
            off += 1
        out.append((KIND_ROW_END, "", "", off))
        off += 1
    return out


def spans_to_grid(
    spans: Sequence[Tuple[str, str, str, int]],
) -> Tuple[List[str], List[List[str]]]:
    """Inverse of :func:`grid_to_spans` (used by tests / the evaluator)."""
    header: List[str] = []
    rows: List[List[str]] = []
    cur: List[str] = []
    cur_is_header = False
    for kind, text, _, _ in sorted(spans, key=lambda s: s[3]):
        if kind == KIND_HEADER_CELL:
            cur.append(text)
            cur_is_header = True
        elif kind == KIND_CELL:
            cur.append(text)
        elif kind == KIND_ROW_END:
            if cur_is_header:
                header = cur
            else:
                rows.append(cur)
            cur = []
            cur_is_header = False
    return header, rows
