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


# ---------------------------------------------------------------------------
# stage-2 oracles: transformers compose, dataset builder, evaluation

def ref_build_predictions(tokens, labels):
    """Reference M7/M8 over (Token, label) pairs."""
    load_ref()
    from hocr_table_extractor import layout_transformers as lt
    words = [t.text for t in tokens]
    boxes = [[t.x1, t.y1, t.x2, t.y2] for t in tokens]
    return lt._build_predictions(words, boxes, labels)


def ref_compose(tokens, labels, max_columns=6):
    """Reference G17-G21 `_compose_table_from_predictions`."""
    load_ref()
    from hocr_table_extractor import layout_transformers as lt
    preds = ref_build_predictions(tokens, labels)
    return lt._compose_table_from_predictions(preds, max_columns=max_columns)


def ref_transformers_extract(spans, labels, expected_n_cols=None,
                             header_regexes=None, max_columns=6):
    """Replay the 3-level fallback chain of extract_transformers_layout
    (layout_transformers.py:502-565) minus OCR/model, using the
    reference's own submodule code for each level."""
    load_ref()
    from hocr_table_extractor import (
        assign, columns, layout_transformers as lt, lines as ref_lines,
        rows as ref_rows, spatial, grid_builder, cleaners,
    )
    from hocr_table_extractor.structures import Token

    toks0 = spans_to_ref_tokens(spans)
    if not toks0:
        return [], []
    target_cols = expected_n_cols or max_columns
    preds = ref_build_predictions(toks0, labels)
    tokens_generic = []
    for p in preds:
        tokens_generic.append(Token(text=p.text, page=1, x1=p.bbox[0],
                                    y1=p.bbox[1], x2=p.bbox[2], y2=p.bbox[3]))
    try:
        lns = ref_lines.build_lines(tokens_generic)
        if lns:
            intervals = columns.estimate_columns(lns, expected_n_cols=target_cols)
            if intervals:
                records = assign.assign_words_to_columns(lns, intervals)
                grid_rows = ref_rows.merge_lines_into_rows(records, lns)
                if grid_rows:
                    header_row, body = ref_rows.detect_header_row(
                        grid_rows,
                        header_regexes=list(header_regexes) if header_regexes else None)
                    return header_row or [], cleaners.process_grid_data(body)
    except Exception:
        pass
    header, rows = lt._compose_table_from_predictions(preds, max_columns=target_cols or 6)
    if not rows:
        words = [spatial.SpatialWord(text=t.text,
                                     bbox=spatial.BBox(t.x1, t.y1, t.x2, t.y2))
                 for t in toks0]
        grid = grid_builder.build_grid_from_words(words)
        return grid.header, cleaners.process_grid_data(grid.rows)
    return header, cleaners.process_grid_data(rows)


def ref_build_example(spans, width=2000, height=2600, expected_n_cols=None,
                      header_regexes=None, max_columns=6):
    """Replay build_layoutlm_example (dataset_builder.py:167-265) with the
    reference's executed internals, bypassing only file/image I/O.
    Returns None where the reference raises."""
    load_ref()
    from hocr_table_extractor import columns, dataset_builder as db, lines as ref_lines

    tokens = spans_to_ref_tokens(spans)
    if not tokens:
        return None
    lns = ref_lines.build_lines(tokens)
    if not lns:
        return None
    column_intervals = columns.estimate_columns(lns, expected_n_cols=expected_n_cols)
    if not column_intervals:
        return None
    row_intervals = db._compute_row_intervals(lns)
    line_to_row = db._assign_lines_to_rows(lns, row_intervals)
    grid_rows, rows_tokens, token_records = db._aggregate_rows(
        lns, line_to_row, column_intervals)
    header_idx, header_row, body_rows = db._detect_header_index(
        grid_rows, header_regexes)

    words, boxes, labels, row_ids, col_ids, is_hdr = [], [], [], [], [], []
    for tok, row_idx, col_idx in token_records:
        words.append(tok.text)
        boxes.append(db._normalize_box([tok.x1, tok.y1, tok.x2, tok.y2], width, height))
        row_ids.append(row_idx if row_idx is not None else -1)
        col_ids.append(col_idx if col_idx is not None else -1)
        h = header_idx is not None and row_idx == header_idx
        is_hdr.append(h)
        if col_idx is None or col_idx < 0 or col_idx >= max_columns:
            labels.append("OTHER")
        else:
            labels.append(f"{'HEADER' if h else 'BODY'}_COL_{col_idx}")
    return {
        "words": words, "bboxes": boxes, "labels": labels,
        "row_ids": row_ids, "col_ids": col_ids, "is_header": is_hdr,
        "table_header": header_row or [], "table_rows": body_rows,
    }


def ref_evaluate(ref_grid, pred_grid, tmpdir):
    """Run the reference's evaluate_tables on two (header, rows) grids
    via real CSV round-trip (exporters.rows_to_csv)."""
    import os
    load_ref()
    from hocr_table_extractor import evaluation, exporters
    a = os.path.join(str(tmpdir), "ref.csv")
    b = os.path.join(str(tmpdir), "pred.csv")
    exporters.rows_to_csv(ref_grid[1], ref_grid[0], a)
    exporters.rows_to_csv(pred_grid[1], pred_grid[0], b)
    return evaluation.evaluate_tables(a, b)
