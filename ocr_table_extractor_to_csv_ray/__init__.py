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

__all__ = ["LayoutConfig", "EngineConfig"]
