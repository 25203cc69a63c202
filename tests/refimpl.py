"""Load the reference implementation (read-only, /root/reference) as the
test oracle.

TESTS ONLY — the shipped engine has zero dependency on this.  We import
the reference's geometry modules directly and drive them with Token
objects built from our span corpus, so golden tests compare the Ray
engine against the reference's *actual executed code*, not a rewrite.
``bs4`` / ``PIL`` (not installed here) are stubbed out — only the hOCR
file parser and image loader need them, and the oracle bypasses both.
"""

from __future__ import annotations

import sys
import types
from typing import List, Optional, Tuple

REF_SRC = "/root/reference/src"


def _stub(name: str, **attrs) -> None:
    if name not in sys.modules:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def load_ref():
    """Import and return the reference package's modules (cached)."""
    _stub("bs4", BeautifulSoup=object)
    _stub("PIL", Image=types.SimpleNamespace(open=None))
    _stub("PIL.Image", open=None)
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    import hocr_table_extractor as ref  # noqa: F401
    from hocr_table_extractor import (  # noqa: F401
        assign, assign_dynamic, assign_financial, cleaners, column_model,
        columns, exporters, grid_builder, lines, main, postprocess, rows,
        spatial, structures,
    )
    return sys.modules["hocr_table_extractor"]


def spans_to_ref_tokens(spans: List[dict], table_bbox=None):
    """Our corpus word spans → reference Token objects (parser.py output
    shape), honoring the parse-time bbox crop (parser.py:47-48)."""
    ref = load_ref()
    from hocr_table_extractor.structures import Token, within_bbox

    toks = []
    for s in spans:
        if s["kind"] != "word":
            continue
        ref_str = s["media_ref"]
        assert ref_str.startswith("bbox://p")
        rest = ref_str[len("bbox://p"):]
        page_s, coords = rest.split("/", 1)
        parts = coords.split("/", 1)
        x1, y1, x2, y2 = (int(v) for v in parts[0].split(","))
        line_id = parts[1] if len(parts) > 1 and parts[1] else None
        if table_bbox and not within_bbox(table_bbox, x1, y1, x2, y2):
            continue
        toks.append(Token(text=s["text"], page=int(page_s),
                          x1=x1, y1=y1, x2=x2, y2=y2, line_id=line_id))
    return toks


def ref_extract(
    spans: List[dict],
    layout: str,
    table_bbox=None,
    expected_n_cols: Optional[int] = None,
    header_regexes: Optional[List[str]] = None,
) -> Tuple[List[str], List[List[str]], Optional[List[List[str]]]]:
    """Replay the reference pipeline (main.py:57-163) for one document,
    returning (header, rows, numeric_rows) instead of writing CSVs."""
    load_ref()
    from hocr_table_extractor import (
        assign, assign_dynamic, assign_financial, column_model, columns,
        exporters, grid_builder, lines as ref_lines, main as ref_main,
        postprocess, rows as ref_rows, spatial,
    )

    tokens = spans_to_ref_tokens(spans, table_bbox=table_bbox)
    if not tokens:
        return [], [], None
    lns = ref_lines.build_lines(tokens)
    if not lns:
        return [], [], None

    if layout == "financial":
        records = assign_financial.assign_financial_three_columns(lns)
        rows = ref_rows.merge_financial_rows(records)
        rows = postprocess.fill_missing_labels_and_clean(rows)
        return ["Cuenta", "Valor_1", "Valor_2"], rows, None

    if layout == "dynamic":
        intervals, names = column_model.infer_numeric_columns_from_lines(lns)
        records = assign_dynamic.assign_dynamic(lns, intervals)
        rows = ref_rows.merge_financial_rows(records)
        if not rows:
            return [], [], None
        num_cols = max(len(r) for r in rows) - 1
        header = list(ref_main._resolve_header(max(num_cols, 0), names))
        numeric = []
        for r in rows:
            numeric.append(list(r) if not r else [r[0]] + [exporters._to_number(x) for x in r[1:]])
        return header, rows, numeric

    if layout == "generic":
        intervals = columns.estimate_columns(lns, expected_n_cols=expected_n_cols)
        records = assign.assign_words_to_columns(lns, intervals)
        grid_rows = ref_rows.merge_lines_into_rows(records, lns)
        header_row, body = ref_rows.detect_header_row(
            grid_rows, header_regexes=list(header_regexes) if header_regexes else None
        )
        return header_row or [], body, None

    if layout == "professional":
        words = [
            spatial.SpatialWord(text=t.text, bbox=spatial.BBox(t.x1, t.y1, t.x2, t.y2))
            for t in tokens
        ]
        grid = grid_builder.build_grid_from_words(words)
        from hocr_table_extractor.cleaners import process_grid_data
        return grid.header, process_grid_data(grid.rows), None

    raise ValueError(layout)
