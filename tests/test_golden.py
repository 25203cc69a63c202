"""Golden span-equality: engine vs the reference's actual code.

Every synthetic document, every layout, compared for exact
(header, rows[, numeric rows]) equality — i.e. span-sequence equality
(kind, text, media_ref, order) after grid serialization.
"""

from __future__ import annotations

import pytest

from ocr_table_extractor_to_csv_ray.config import LayoutConfig
from ocr_table_extractor_to_csv_ray.core.spans import spans_to_grid
from ocr_table_extractor_to_csv_ray.stages.extract import extract_batch

from refimpl import ref_extract

LAYOUTS = ["generic", "dynamic", "financial", "professional"]


def _engine_grids(tbl, cfg):
    out = extract_batch(tbl, cfg)
    spans = out["spans"].to_pylist()
    numeric = (
        out["spans_numeric"].to_pylist()
        if "spans_numeric" in out.column_names
        else [None] * len(spans)
    )

    def grid(lst):
        if lst is None:
            return None
        return spans_to_grid([(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in lst])

    return [(grid(s), grid(n)) for s, n in zip(spans, numeric)]


@pytest.mark.parametrize("layout", LAYOUTS)
def test_layout_matches_reference(corpus_200, layout):
    cfg = LayoutConfig(layout=layout)
    results = _engine_grids(corpus_200, cfg)
    docs = corpus_200.to_pylist()
    for doc, ((eh, er), num) in zip(docs, results):
        rh, rr, rn = ref_extract(doc["spans"], layout)
        assert eh == list(rh), (layout, doc["doc_id"], "header")
        assert er == [list(r) for r in rr], (layout, doc["doc_id"], "rows")
        if layout == "dynamic":
            nh, nr = num
            expect = [] if rn is None else [list(r) for r in rn]
            assert nr == expect, (doc["doc_id"], "numeric rows")


def test_table_bbox_crop_matches_reference(corpus_200):
    bbox = (0, 0, 1400, 1500)
    cfg = LayoutConfig(layout="generic", table_bbox=bbox)
    results = _engine_grids(corpus_200, cfg)
    for doc, ((eh, er), _) in zip(corpus_200.to_pylist(), results):
        rh, rr, _ = ref_extract(doc["spans"], "generic", table_bbox=bbox)
        assert (eh, er) == (list(rh), [list(r) for r in rr]), doc["doc_id"]


@pytest.mark.parametrize("n_cols", [2, 3, 5])
def test_expected_n_cols_matches_reference(corpus_200, n_cols):
    cfg = LayoutConfig(layout="generic", expected_n_cols=n_cols)
    results = _engine_grids(corpus_200, cfg)
    for doc, ((eh, er), _) in zip(corpus_200.to_pylist(), results):
        rh, rr, _ = ref_extract(doc["spans"], "generic", expected_n_cols=n_cols)
        assert (eh, er) == (list(rh), [list(r) for r in rr]), doc["doc_id"]


def test_header_regexes_match_reference(corpus_200):
    rxs = ["concepto", "saldo", r"\b(19|20)\d{2}\b"]
    cfg = LayoutConfig(layout="generic", header_regexes=tuple(rxs))
    results = _engine_grids(corpus_200, cfg)
    for doc, ((eh, er), _) in zip(corpus_200.to_pylist(), results):
        rh, rr, _ = ref_extract(doc["spans"], "generic", header_regexes=rxs)
        assert (eh, er) == (list(rh), [list(r) for r in rr]), doc["doc_id"]


def test_oracle_expected_not_drifted():
    """oracle_expected/*.parquet are reference-derived checkpoints; if
    the synthetic generator or the reference pinning changes, they must
    be regenerated (tools/gen_oracle_expected.py). Spot-check a slice
    of the sf0.001 tier against freshly-executed reference code."""
    import pyarrow.parquet as pq
    from tools.gen_oracle_expected import (build_corpus, doc_sig,
                                           expected_extract, grid_shape)

    sig = doc_sig("/root/testdata/sf0.001")
    stored = pq.read_table("oracle_expected/extract_dynamic.parquet").to_pandas()
    stored = stored[stored["sig"] == sig].set_index("doc_id")
    assert len(stored) == 500
    corpus = build_corpus(500).slice(0, 25)
    fresh = expected_extract(corpus, "dynamic").set_index("doc_id")
    for doc_id, row in fresh.iterrows():
        assert (stored.loc[doc_id, "n_rows"], stored.loc[doc_id, "n_cols"]) == \
            (row["n_rows"], row["n_cols"]), doc_id
