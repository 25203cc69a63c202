"""Cell-text cleaning (reference ``cleaners.py:8-26``, M4/M5)."""

from __future__ import annotations

from typing import List, Sequence


def clean_cell_text(cell: str) -> str:
    """``str.strip()`` per cell (``cleaners.py:8-11``)."""
    return cell.strip() if isinstance(cell, str) else cell


def process_grid_data(rows: Sequence[Sequence[str]]) -> List[List[str]]:
    """Map :func:`clean_cell_text` over every cell (``cleaners.py:13-26``)."""
    return [[clean_cell_text(c) for c in row] for row in rows]
