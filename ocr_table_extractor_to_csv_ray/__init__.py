"""Ray-Data-native table-reconstruction engine.

A from-scratch reimplementation of the capabilities of
``luuuisc/ocr-table-extractor-to-csv`` (reference at ``/root/reference``)
as an idiomatic Ray Data pipeline: one row per document, Arrow batches,
stateless ``map_batches`` geometry kernels, actor pools for stateful
OCR / layout-model stages.

Public surface:

- :mod:`.core` — pure per-document kernels (no Ray imports).
- :mod:`.sources` — corpus readers / deterministic synthetic corpora.
- :mod:`.stages` — ``map_batches`` callables (stateless fns + actor classes).
- :mod:`.pipelines` — end-to-end ``ray.data.Dataset`` pipelines.
- :mod:`.state` — partition lineage / resumable-output bookkeeping.
"""

from .config import LayoutConfig, EngineConfig


def extract_corpus(input_path: str, output_path: str, layout: str = "dynamic",
                   resumable: bool = False, **layout_knobs):
    """One-call public API (parity with the reference's single exported
    symbol ``hocr_to_csv``, lifted from one file to a corpus).

    ``input_path``: parquet corpus of ``(doc_id, spans)``.
    ``layout_knobs``: any :class:`LayoutConfig` field
    (``table_bbox``, ``expected_n_cols``, ``header_regexes``, …).
    Requires an initialised Ray session (or lets Ray auto-init).
    """
    cfg = EngineConfig(layout=LayoutConfig(layout=layout, **layout_knobs))
    from .pipelines.extract import run_extraction, run_extraction_resumable
    if resumable:
        return run_extraction_resumable(input_path, output_path, cfg)
    return run_extraction(input_path, output_path, cfg)


__all__ = ["LayoutConfig", "EngineConfig", "extract_corpus"]
