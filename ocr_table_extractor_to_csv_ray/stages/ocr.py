"""OCR actor-pool stage: media spans → word spans.

Mirrors the reference's Tesseract path (S4 ``ocr_utils.py:10-49``, S5
``layout_transformers.py:68-125``): per-word text + bbox + confidence,
words with confidence <= threshold dropped (M3), optional ``table_bbox``
containment crop, ``lang/psm/oem`` knobs.

Ray mapping (SURVEY.md §2.4 A2): a callable CLASS → actor pool via
``ds.map_batches(OcrStage, concurrency=N, batch_size=small)``. Engine
setup happens ONCE per actor in ``__init__``. The real Tesseract binary
is not present in this environment, so the engine resolves to a
DETERMINISTIC FAKE (seeded by the media ref) unless ``pytesseract`` is
importable — the Ray-side plumbing (schema, batching, actor signature,
output layout) is identical either way.
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..config import LayoutConfig
from ..core.spans import KIND_MEDIA, KIND_WORD, encode_bbox_ref

_FAKE_WORDS = [
    "Caja", "Bancos", "Clientes", "Inventario", "Proveedores", "Capital",
    "Total", "Nota", "Saldo", "Importe", "1,234", "56,780", "(9,012)",
    "$4,567", "-", "2021", "2022",
]


class _FakeTesseract:
    """Deterministic stand-in for ``pytesseract.image_to_data``.

    Emits a plausible 3-column page of (word, bbox, conf) tuples, a pure
    function of the media ref — same ref, same tokens, any process.
    """

    def image_to_words(self, media_ref: str) -> List[Tuple[str, int, int, int, int, int]]:
        rng = np.random.default_rng(zlib.crc32(media_ref.encode()))
        out = []
        y = 100
        n_rows = int(rng.integers(4, 12))
        for _ in range(n_rows):
            for cx in (100, 1200, 1600):
                if rng.random() < 0.2:
                    continue
                w = _FAKE_WORDS[int(rng.integers(0, len(_FAKE_WORDS)))]
                conf = int(rng.integers(30, 100))   # some fall under the threshold
                out.append((w, cx, y, cx + 9 * len(w) + 4, y + 20, conf))
            y += int(rng.integers(30, 44))
        return out


class PdfRasterizeStage:
    """``kind="media"`` spans whose ref is ``pdf://…`` → one ``img://``
    media span per page (the rasterize step in front of OCR).

    A real backend (pdfium/poppler) would decode page bitmaps here; this
    container has none, so the page COUNT is a deterministic fake
    (pure function of the ref) while the span fan-out, ordering and
    downstream OCR compatibility are real. Actor pool: rasterizers hold
    codec state; size ``batch_size`` to page-bitmap memory.
    """

    def __init__(self, max_pages: int = 16) -> None:
        self.max_pages = max_pages
        try:
            import pypdfium2  # noqa: F401
            self._backend = "pdfium"
        except ImportError:
            self._backend = "fake"

    def _pdfium_page_count(self, ref: str) -> int:
        """Real path: open the document, count pages."""
        import pypdfium2 as pdfium
        path = ref[len("pdf://"):] if ref.startswith("pdf://") else ref
        pdf = pdfium.PdfDocument(path)
        try:
            return max(1, len(pdf))
        finally:
            close = getattr(pdf, "close", None)
            if callable(close):
                close()

    def _page_count(self, ref: str) -> int:
        if self._backend == "pdfium":
            try:
                return self._pdfium_page_count(ref)
            except Exception:  # unreadable file must not poison the block
                import logging
                logging.getLogger(__name__).warning(
                    "pdfium failed on %s; falling back to synthetic page count", ref)
        return 1 + zlib.crc32(ref.encode()) % self.max_pages

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        spans_col = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        refs = spans_col.flatten().field("media_ref")
        has_pdf = pc.sum(pc.cast(pc.starts_with(refs, "pdf://"), pa.int64())).as_py()
        if not has_pdf:
            return batch
        rows = spans_col.to_pylist()
        new_rows = []
        for spans in rows:
            spans = spans or []
            out, off = [], 0
            for s in spans:
                if s["kind"] == KIND_MEDIA and s["media_ref"].startswith("pdf://"):
                    base = s["media_ref"][len("pdf://"):]
                    for p in range(1, self._page_count(s["media_ref"]) + 1):
                        out.append({"kind": KIND_MEDIA, "text": "",
                                    "media_ref": f"img://{base}/page{p}",
                                    "offset": off})
                        off += 1
                else:
                    out.append({**s, "offset": off})
                    off += 1
            new_rows.append(out)
        out_t = batch.drop_columns(["spans"])
        return out_t.append_column("spans", pa.array(new_rows, type=spans_col.type))


class OcrStage:
    """``map_batches`` actor: expands each ``kind="media"`` span of a
    document into word spans (appended after the existing spans, offsets
    continuing), leaving word spans untouched."""

    def __init__(self, cfg: Optional[LayoutConfig] = None,
                 media_loader=None) -> None:
        """``media_loader``: optional ``media_ref -> image`` resolver for
        the real engine (defaults to PIL-open of the ref as a file
        path, ``img://``/``file://`` prefixes stripped)."""
        self.cfg = cfg or LayoutConfig()
        self._media_loader = media_loader
        try:
            import pytesseract  # noqa: F401
            self._engine = "tesseract"
        except ImportError:
            self._engine = "fake"
        self._fake = _FakeTesseract()

    def _load_media(self, media_ref: str):
        """Resolve a media ref to an image for the real engine; None if
        unresolvable (the span is then skipped, not poisoned)."""
        if self._media_loader is not None:
            return self._media_loader(media_ref)
        try:
            from PIL import Image
            path = media_ref
            for prefix in ("img://", "file://"):
                if path.startswith(prefix):
                    path = path[len(prefix):]
            return Image.open(path).convert("RGB")
        except Exception:
            import logging
            logging.getLogger(__name__).warning(
                "cannot load media %s for OCR; span skipped", media_ref)
            return None

    def _words_tesseract(self, media_ref: str) -> List[Tuple[str, int, int, int, int, int]]:
        """Real engine: ``pytesseract.image_to_data`` with the
        reference's field handling (``layout_transformers.py:68-125``):
        conf parsed via int(float(.)), -1 on parse failure; bbox =
        (left, top, left+width, top+height)."""
        import pytesseract
        image = self._load_media(media_ref)
        if image is None:
            return []
        data = pytesseract.image_to_data(
            image, output_type=pytesseract.Output.DICT, lang=self.cfg.ocr_lang)
        out = []
        for i in range(len(data["level"])):
            try:
                conf = int(float(data["conf"][i]))
            except Exception:
                conf = -1
            x, y = data["left"][i], data["top"][i]
            w, h = data["width"][i], data["height"][i]
            out.append((data["text"][i] or "", x, y, x + w, y + h, conf))
        return out

    def _ocr_one(self, media_ref: str) -> List[Tuple[str, int, int, int, int]]:
        if self._engine == "tesseract":
            words = self._words_tesseract(media_ref)
        else:
            words = self._fake.image_to_words(media_ref)
        out = []
        bbox = self.cfg.table_bbox
        for text, x1, y1, x2, y2, conf in words:
            if conf <= self.cfg.ocr_min_confidence:   # layout_transformers.py:95-100
                continue
            text = text.strip()                       # ref strips BEFORE the empty check
            if not text:
                continue
            if bbox and not (x1 >= bbox[0] and y1 >= bbox[1]
                             and x2 <= bbox[2] and y2 <= bbox[3]):
                continue
            out.append((text, x1, y1, x2, y2))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        spans_col = batch["spans"].combine_chunks() if isinstance(batch["spans"], pa.ChunkedArray) else batch["spans"]
        # vectorized fast path: batches with no media rows pass through
        # untouched (most of an interleaved corpus is text-only)
        kinds = spans_col.flatten().field("kind")
        if pc.sum(pc.cast(pc.equal(kinds, KIND_MEDIA), pa.int64())).as_py() in (0, None):
            return batch
        rows = spans_col.to_pylist()
        # skew-guard shard rows carry media_base = number of media spans
        # in EARLIER shards of the same doc: page numbers stay GLOBAL to
        # the document across the split
        if "media_base" in batch.column_names:
            bases = batch["media_base"].to_pylist()
        else:
            bases = [0] * len(rows)
        new_rows = []
        for spans, base in zip(rows, bases):
            spans = spans or []
            media = [s for s in spans if s["kind"] == KIND_MEDIA]
            if not media:
                new_rows.append(spans)
                continue
            off = max((s["offset"] for s in spans), default=-1) + 1
            extra = []
            # enumerate, not .index(): duplicate media refs must still get
            # DISTINCT pages (and .index is O(m^2))
            for page, m in enumerate(media, start=1 + (base or 0)):
                for text, x1, y1, x2, y2 in self._ocr_one(m["media_ref"]):
                    extra.append({
                        "kind": KIND_WORD, "text": text,
                        "media_ref": encode_bbox_ref(page, x1, y1, x2, y2),
                        "offset": off,
                    })
                    off += 1
            new_rows.append(spans + extra)
        out = batch.drop_columns(["spans"])
        return out.append_column("spans", pa.array(new_rows, type=spans_col.type))
