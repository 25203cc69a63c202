"""Plain-text → interleaved-span ingestion.

A text document entering the engine becomes the same
``(doc_id, spans)`` shape as OCR'd documents (the driver's
``input_hint``): words laid out in reading order on synthetic pages
(fixed char width, line wrap, page break). This is the text half of the
"interleaved text + media" corpus — media documents instead carry
``kind="media"`` refs and go through the OCR actor stage.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.spans import KIND_WORD, encode_bbox_ref

PAGE_W, PAGE_H = 2000, 2600
CHAR_W, LINE_H, GAP = 9, 24, 8
X0, Y0 = 100, 100


def render_text_to_spans(text: str) -> list:
    """Deterministic word layout: left-to-right, wrap, page-break."""
    spans = []
    x, y, page, off = X0, Y0, 1, 0
    for w in (text or "").split():
        w_px = CHAR_W * len(w) + 4
        if x + w_px > PAGE_W - X0:
            x = X0
            y += LINE_H + 12
            if y > PAGE_H - Y0:
                y = Y0
                page += 1
        spans.append({
            "kind": KIND_WORD, "text": w,
            "media_ref": encode_bbox_ref(page, x, y, x + w_px, y + 20),
            "offset": off,
        })
        x += w_px + GAP
        off += 1
    return spans


def render_documents_batch(batch: pa.Table, id_column: str = "doc_id",
                           text_column: str = "text") -> pa.Table:
    """``(doc_id, text)`` rows → corpus-schema ``(doc_id, spans)`` rows."""
    from ..sources.synthetic import SPAN_TYPE

    ids = batch[id_column].to_pylist()
    texts = batch[text_column].to_pylist()
    spans = [render_text_to_spans(t) for t in texts]
    return pa.table({
        "doc_id": pa.array([str(i) for i in ids], pa.string()),
        "spans": pa.array(spans, pa.list_(SPAN_TYPE)),
    })
