"""hOCR markup → word-token spans (S1-S3 + J1).

Reimplements the reference's parse path from scratch on the stdlib HTML
parser (no bs4/lxml here): ``parse_hocr_words`` (``parser.py:16-62``),
``parse_bbox`` (``structures.py:6-15``), the XML-then-HTML load fallback
(``parser.py:7-14`` — for us: strictness doesn't differ, we always run
one tolerant pass), and the word→line containment join — each word gets
the FIRST ``ocr_line`` (document order) whose bbox contains it
(``parser.py:33-58``, linear scan, first match).

Semantics preserved exactly:
- pages = elements whose class contains ``ocr_page``, numbered 1..n in
  document order; words = ``ocrx_word`` under that page.
- a word with no parsable ``title`` bbox is dropped; empty/whitespace
  text is dropped AFTER the bbox crop.
- line ids: the element ``id`` attr, else ``page_{pi}_line_{li+1}``;
  lines with no parsable bbox don't participate in the join.

Ray mapping: a stateless vectorized batch kernel over a ``hocr:string``
column → the corpus ``spans`` column. Per-row parse is pure Python
(DOM walking), so the batch fn is a task-pool stage that parallelizes
across documents.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

from ..core.spans import KIND_WORD, encode_bbox_ref

BBOX_RE = re.compile(r"bbox (\d+)\s+(\d+)\s+(\d+)\s+(\d+)")


def parse_bbox(title_attr: Optional[str]) -> Optional[Tuple[int, int, int, int]]:
    """``structures.py:6-15``: regex search over the title attribute."""
    if not title_attr:
        return None
    m = BBOX_RE.search(title_attr)
    if not m:
        return None
    x1, y1, x2, y2 = map(int, m.groups())
    return x1, y1, x2, y2


# HTML void elements never receive an end tag from html.parser; they
# must not participate in word-depth tracking or a single ``<br>``
# inside a word would unbalance the depth for the rest of the page
# (lxml/bs4 in the reference handle these natively).
VOID_ELEMENTS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class _HocrWalker(HTMLParser):
    """One pass: collect pages, and per page the ocr_lines (id, bbox)
    and ocrx_words (text, bbox) in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pages: List[Dict] = []
        self._word_depth = 0      # >0 → collecting text for current word
        self._cur_word: Optional[Dict] = None
        self._stack: List[str] = []

    @staticmethod
    def _classes(attrs) -> str:
        return dict(attrs).get("class") or ""

    def handle_starttag(self, tag, attrs):
        if tag in VOID_ELEMENTS:
            return  # no end tag ever comes; can't contain word text
        ad = dict(attrs)
        cls = ad.get("class") or ""
        if "ocr_page" in cls:
            self.pages.append({"lines": [], "words": []})
        elif "ocr_line" in cls and self.pages:
            self.pages[-1]["lines"].append(
                {"id": ad.get("id"), "bbox": parse_bbox(ad.get("title"))})
        if self._word_depth > 0:
            self._word_depth += 1
        elif "ocrx_word" in cls and self.pages:
            self._cur_word = {"bbox": parse_bbox(ad.get("title")), "text": []}
            self._word_depth = 1

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return  # e.g. a stray </br> — starttag didn't track it either
        if self._word_depth > 0:
            self._word_depth -= 1
            if self._word_depth == 0 and self._cur_word is not None:
                w = self._cur_word
                self.pages[-1]["words"].append(
                    {"bbox": w["bbox"], "text": "".join(w["text"])})
                self._cur_word = None

    def handle_data(self, data):
        if self._word_depth > 0 and self._cur_word is not None:
            self._cur_word["text"].append(data)

    def close(self):
        super().close()
        # truncated / unclosed markup: flush the pending word so a
        # missing close tag loses nothing (lenient-parse intent of the
        # reference's parser.py:7-14 fallback)
        if self._cur_word is not None and self.pages:
            w = self._cur_word
            self.pages[-1]["words"].append(
                {"bbox": w["bbox"], "text": "".join(w["text"])})
            self._cur_word = None
            self._word_depth = 0


def parse_hocr_tokens(hocr_text: str,
                      table_bbox: Optional[Tuple[int, int, int, int]] = None
                      ) -> List[Tuple[str, int, int, int, int, int, Optional[str]]]:
    """hOCR markup → ``(text, page, x1, y1, x2, y2, line_id)`` tuples,
    reference semantics (``parser.py:16-62``)."""
    walker = _HocrWalker()
    walker.feed(hocr_text or "")
    walker.close()
    out = []
    for pi, page in enumerate(walker.pages, start=1):
        line_boxes = []
        for li, line in enumerate(page["lines"]):
            lid = line["id"] or f"page_{pi}_line_{li + 1}"
            if line["bbox"]:
                line_boxes.append((lid, line["bbox"]))
        for w in page["words"]:
            if not w["bbox"]:
                continue
            x1, y1, x2, y2 = w["bbox"]
            if table_bbox and not (x1 >= table_bbox[0] and y1 >= table_bbox[1]
                                   and x2 <= table_bbox[2] and y2 <= table_bbox[3]):
                continue
            text = (w["text"] or "").strip()
            if not text:
                continue
            line_id = None
            for lid, (lx1, ly1, lx2, ly2) in line_boxes:
                if x1 >= lx1 and y1 >= ly1 and x2 <= lx2 and y2 <= ly2:
                    line_id = lid
                    break
            out.append((text, pi, x1, y1, x2, y2, line_id))
    return out


def parse_hocr_batch(batch: pa.Table, hocr_column: str = "hocr",
                     table_bbox: Optional[Tuple[int, int, int, int]] = None
                     ) -> pa.Table:
    """``(doc_id, hocr)`` rows → corpus ``(doc_id, spans)`` rows."""
    from .synthetic import SPAN_TYPE

    ids = batch["doc_id"].to_pylist()
    texts = batch[hocr_column].to_pylist()
    spans_rows = []
    for t in texts:
        spans = []
        for off, (text, page, x1, y1, x2, y2, lid) in enumerate(
                parse_hocr_tokens(t, table_bbox)):
            spans.append({"kind": KIND_WORD, "text": text,
                          "media_ref": encode_bbox_ref(page, x1, y1, x2, y2, lid),
                          "offset": off})
        spans_rows.append(spans)
    return pa.table({
        "doc_id": pa.array([str(i) for i in ids], pa.string()),
        "spans": pa.array(spans_rows, pa.list_(SPAN_TYPE)),
    })


def tokens_to_hocr(tokens, pages: Optional[Dict[int, Tuple[int, int]]] = None) -> str:
    """Inverse (test fixture generator): render token tuples
    ``(text, page, x1, y1, x2, y2, line_id)`` as hOCR markup, grouping
    tokens that share a line_id under an ``ocr_line`` element."""
    by_page: Dict[int, List] = {}
    for t in tokens:
        by_page.setdefault(t[1], []).append(t)
    parts = ["<html><body>"]
    for pi in sorted(by_page):
        pw, ph = (pages or {}).get(pi, (2000, 2600))
        parts.append(f'<div class="ocr_page" title="bbox 0 0 {pw} {ph}">')
        lines: Dict[str, List] = {}
        loose = []
        for t in by_page[pi]:
            if t[6]:
                lines.setdefault(t[6], []).append(t)
            else:
                loose.append(t)
        for lid, toks in lines.items():
            lx1 = min(t[2] for t in toks); ly1 = min(t[3] for t in toks)
            lx2 = max(t[4] for t in toks); ly2 = max(t[5] for t in toks)
            parts.append(f'<span class="ocr_line" id="{lid}" '
                         f'title="bbox {lx1} {ly1} {lx2} {ly2}">')
            for text, _p, x1, y1, x2, y2, _l in toks:
                parts.append(f'<span class="ocrx_word" '
                             f'title="bbox {x1} {y1} {x2} {y2}">{text}</span>')
            parts.append("</span>")
        for text, _p, x1, y1, x2, y2, _l in loose:
            parts.append(f'<span class="ocrx_word" '
                         f'title="bbox {x1} {y1} {x2} {y2}">{text}</span>')
        parts.append("</div>")
    parts.append("</body></html>")
    return "".join(parts)
