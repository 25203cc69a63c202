"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Every document is a pure function of ``(seed, doc_index)`` — no
wall-clock, no external data.  Archetypes exercise the reference
geometry paths listed in FIXTURES.md: financial 3-column balances,
generic 4-column grids, dynamic year-headed tables, indentation
hierarchies, multi-page documents, edge cases and media-interleaved
documents.

The emitted schema is exactly the driver's ``input_hint``:
``doc_id:string, spans:list<struct<kind,text,media_ref,offset:int32>>``,
with word geometry packed into ``media_ref`` (see ``core/spans.py``).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..core.spans import KIND_MEDIA, KIND_WORD, encode_bbox_ref

PAGE_W, PAGE_H = 2000, 2600
CHAR_W = 9          # rendered pixel width per character

# bump when make_doc's output changes for any (seed, index) — invalidates
# the /tmp corpus caches written by pipelines.extract.generate_corpus
GENERATOR_VERSION = 1

ARCHETYPES = (
    "balance3", "generic4", "dynamic_years", "hierarchy",
    "multipage", "edge", "media_interleaved",
)

_SECTIONS = [
    "Activo circulante", "Pasivo circulante", "Capital contable",
    "Activo fijo", "Otros activos",
]
_LABEL_WORDS = [
    "Efectivo", "equivalentes", "Cuentas", "por", "cobrar", "Inventarios",
    "Proveedores", "Impuestos", "diferidos", "Capital", "social",
    "Utilidades", "retenidas", "Documentos", "pagar", "neto", "Reserva",
    "legal", "Depreciacion", "acumulada", "Gastos", "anticipados",
]
_HEADER_WORDS = ["Concepto", "Nota", "Saldo", "Importe", "Total", "Descripcion"]


class _Scene:
    """Accumulates word tokens for one document in reading order."""

    def __init__(self) -> None:
        self.spans: List[Dict] = []
        self._off = 0

    def word(self, text: str, page: int, x1: int, y1: int, x2: int, y2: int,
             line_id: Optional[str] = None) -> None:
        self.spans.append({
            "kind": KIND_WORD,
            "text": text,
            "media_ref": encode_bbox_ref(page, x1, y1, x2, y2, line_id),
            "offset": self._off,
        })
        self._off += 1

    def media(self, ref: str) -> None:
        self.spans.append({"kind": KIND_MEDIA, "text": "", "media_ref": ref,
                           "offset": self._off})
        self._off += 1

    def words_at(self, text: str, page: int, x: int, y: int, h: int = 20,
                 gap: int = 8, line_id: Optional[str] = None) -> int:
        """Lay out a multi-word string left-to-right; returns the end x."""
        for w in text.split():
            w_px = CHAR_W * len(w) + 4
            self.word(w, page, x, y, x + w_px, y + h, line_id)
            x += w_px + gap
        return x


def _fmt_number(rng: np.random.Generator, style: int) -> str:
    v = int(rng.integers(1, 999_999))
    if style == 0:
        return f"{v:,}"
    if style == 1:
        return f"${v:,}"
    if style == 2:
        return f"({v:,})"
    if style == 3:
        return f"{v:,}.{int(rng.integers(0, 99)):02d}"
    return "-"


def _label(rng: np.random.Generator, n_words: int) -> str:
    k = rng.integers(0, len(_LABEL_WORDS), size=n_words)
    return " ".join(_LABEL_WORDS[i] for i in k)


def _balance3(rng: np.random.Generator, sc: _Scene) -> None:
    """Financial 3-column balance with sections, wraps, subtotals, footer."""
    y = 120
    page = 1
    # two year headers in the top band
    sc.words_at(str(int(rng.integers(2015, 2025))), page, 1300, y)
    sc.words_at(str(int(rng.integers(2015, 2025))), page, 1650, y)
    y += 60
    n_rows = int(rng.integers(6, 28))
    for _ in range(n_rows):
        r = rng.random()
        if r < 0.15:
            sc.words_at(_label(rng, 2) + ":", page, 100, y)
        elif r < 0.25:
            # wrapped label: first line text only, close below it
            sc.words_at(_label(rng, 3), page, 100, y)
            y += 24
            x = sc.words_at(_label(rng, 2), page, 130, y)
            sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1300, y)
            sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1650, y)
        elif r < 0.32:
            # value-only subtotal row
            sc.words_at(_fmt_number(rng, 0), page, 1300, y)
            sc.words_at(_fmt_number(rng, 0), page, 1650, y)
        else:
            sc.words_at(_label(rng, int(rng.integers(1, 4))), page, 100, y)
            sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1300, y)
            sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1650, y)
        y += int(rng.integers(28, 40))
    if rng.random() < 0.7:
        sc.words_at("Las notas adjuntas son parte de los estados", page, 100, y + 40)


def _generic4(rng: np.random.Generator, sc: _Scene, pages: int = 1) -> None:
    """4 well-separated columns; some docs carry explicit line ids."""
    use_line_ids = rng.random() < 0.5
    col_x = [100, 600, 1100, 1600]
    col_w = 420
    y = 100
    page = 1
    # header row
    hdr = rng.choice(_HEADER_WORDS, size=4, replace=False)
    lid = "l_hdr" if use_line_ids else None
    for cx, name in zip(col_x, hdr):
        sc.words_at(str(name), page, cx, y, line_id=lid)
    y += 44
    n_rows = int(rng.integers(4, 40)) * pages
    for ri in range(n_rows):
        lid = f"l_{page}_{ri}" if use_line_ids else None
        for ci, cx in enumerate(col_x):
            if rng.random() < 0.1:
                continue   # sparse cell
            if ci == 0:
                txt = _label(rng, int(rng.integers(1, 3)))
            else:
                txt = _fmt_number(rng, int(rng.integers(0, 4)))
            # clamp so the cell never bleeds into the inter-column valley
            txt = txt[: (col_w - 40) // CHAR_W]
            sc.words_at(txt, page, cx, y, line_id=lid)
        y += 40
        if pages > 1 and y > PAGE_H - 100:
            page += 1
            y = 100


def _dynamic_years(rng: np.random.Generator, sc: _Scene) -> None:
    """Year headers on top, label + two value columns below."""
    page = 1
    y = 100
    y1_, y2_ = int(rng.integers(2016, 2024)), int(rng.integers(2016, 2024))
    sc.words_at(str(y1_), page, 1280, y)
    sc.words_at(str(y2_), page, 1640, y)
    y += 70
    n_rows = int(rng.integers(8, 30))
    for _ in range(n_rows):
        r = rng.random()
        if r < 0.12:
            sc.words_at(_label(rng, 2) + ":", page, 100, y)
        else:
            sc.words_at(_label(rng, int(rng.integers(1, 4))), page, 100, y)
            sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1280, y)
            if r < 0.85:
                sc.words_at(_fmt_number(rng, int(rng.integers(0, 5))), page, 1640, y)
        y += int(rng.integers(30, 44))


def _hierarchy(rng: np.random.Generator, sc: _Scene) -> None:
    """Indented outline for the professional layout."""
    page = 1
    y = 100
    sc.words_at("Descripcion", page, 100, y)
    sc.words_at("Importe", page, 1500, y)
    y += 50
    indents = [100, 180, 260]
    for _ in range(int(rng.integers(6, 25))):
        depth = int(rng.integers(0, 3))
        if rng.random() < 0.3:
            sc.words_at(_label(rng, 2), page, indents[depth], y)     # parent row
        else:
            sc.words_at(_label(rng, int(rng.integers(1, 3))), page, indents[depth], y)
            sc.words_at(_fmt_number(rng, 0), page, 1500, y)
        y += 36


def _edge(rng: np.random.Generator, sc: _Scene, variant: int) -> None:
    page = 1
    if variant == 0:
        return                                   # empty document
    if variant == 1:
        # single giant row: vertically continuous tokens (no y valleys)
        y = 100
        for i in range(12):
            sc.words_at(_label(rng, 1), page, 100 + 60 * i, y, h=30)
            y += 10                              # overlapping bands
        return
    if variant == 2:
        # tokens far outside the main row band (dropped by rows.py:54-61)
        _generic4(rng, sc)
        sc.word("huerfano", page, 100, 2590, 160, 2596)   # 6px-tall outlier
        return
    # mixed line_id / no line_id tokens
    y = 100
    sc.words_at(_label(rng, 2), page, 100, y, line_id="lid_a")
    sc.words_at(_fmt_number(rng, 0), page, 1300, y)       # no line id
    y += 40
    sc.words_at(_label(rng, 1), page, 100, y, line_id="lid_b")
    sc.words_at(_fmt_number(rng, 1), page, 1300, y, line_id="lid_b")


def make_doc(doc_index: int, seed: int = 42,
             archetype: Optional[str] = None) -> Dict:
    """Pure function: one synthetic document row."""
    rng = np.random.default_rng([seed, doc_index])
    if archetype is None:
        archetype = ARCHETYPES[doc_index % len(ARCHETYPES)]
    sc = _Scene()
    doc_id = f"doc-{doc_index:06d}"

    if archetype == "balance3":
        _balance3(rng, sc)
    elif archetype == "generic4":
        _generic4(rng, sc)
    elif archetype == "dynamic_years":
        _dynamic_years(rng, sc)
    elif archetype == "hierarchy":
        _hierarchy(rng, sc)
    elif archetype == "multipage":
        _generic4(rng, sc, pages=int(rng.integers(2, 5)))
    elif archetype == "edge":
        _edge(rng, sc, variant=int(rng.integers(0, 4)))
    elif archetype == "media_interleaved":
        sc.media(f"img://{doc_id}/p1")
        _balance3(rng, sc)
        if rng.random() < 0.5:
            sc.media(f"img://{doc_id}/p2")
    else:
        raise ValueError(f"unknown archetype {archetype!r}")

    return {"doc_id": doc_id, "archetype": archetype, "spans": sc.spans}


SPAN_TYPE = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])
CORPUS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("archetype", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])


def corpus_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    """Materialize ``n_docs`` documents as one Arrow table."""
    docs = [make_doc(i, seed) for i in range(start, start + n_docs)]
    return pa.Table.from_pylist(docs, schema=CORPUS_SCHEMA)


def write_corpus(path: str, n_docs: int, seed: int = 42,
                 rows_per_file: int = 2000) -> None:
    """Write a parquet corpus directory, sharded for parallel reads."""
    import pyarrow.parquet as pq
    import os

    os.makedirs(path, exist_ok=True)
    for base in range(0, n_docs, rows_per_file):
        k = min(rows_per_file, n_docs - base)
        pq.write_table(corpus_table(k, seed, start=base),
                       f"{path}/part-{base:08d}.parquet")
