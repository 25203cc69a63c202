"""Skew guard (oversized-doc split/reassemble) + per-doc error isolation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocr_table_extractor_to_csv_ray.config import LayoutConfig
from ocr_table_extractor_to_csv_ray.sources.synthetic import SPAN_TYPE, corpus_table
from ocr_table_extractor_to_csv_ray.stages.extract import extract_batch
from ocr_table_extractor_to_csv_ray.stages.skew import (
    reassemble_group, split_oversized_batch, with_skew_guard)


def test_split_passthrough_small_docs(corpus_200):
    out = split_oversized_batch(corpus_200, max_spans=50_000)
    assert out.num_rows == corpus_200.num_rows
    assert set(out["n_shards"].to_pylist()) == {1}
    assert out["spans"].to_pylist() == corpus_200["spans"].to_pylist()


def test_split_and_reassemble_roundtrip(corpus_200):
    small = corpus_200.slice(0, 20)
    split = split_oversized_batch(small, max_spans=30)
    assert split.num_rows > 20                      # something actually split
    assert max(split["n_shards"].to_pylist()) > 1
    # every shard respects the cap
    import pyarrow.compute as pc
    assert pc.max(pc.list_value_length(split["spans"])).as_py() <= 30

    # group rows by doc_id manually (what groupby.map_groups does)
    by_doc = {}
    for i, d in enumerate(split["doc_id"].to_pylist()):
        by_doc.setdefault(d, []).append(i)
    rebuilt = {}
    for d, idxs in by_doc.items():
        g = split.take(pa.array(idxs))
        rebuilt[d] = reassemble_group(g)["spans"].to_pylist()[0]
    for i, d in enumerate(small["doc_id"].to_pylist()):
        assert rebuilt[d] == small["spans"].to_pylist()[i], d


def test_with_skew_guard_identity(ray_session, corpus_dir):
    import ray.data as rd
    ds = rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
    guarded = with_skew_guard(ds, lambda d: d, max_spans=40)
    out = {r["doc_id"]: r["spans"] for r in guarded.take_all()}
    ref = {r["doc_id"]: r["spans"]
           for r in rd.read_parquet(corpus_dir, columns=["doc_id", "spans"]).take_all()}
    assert out == ref


def test_extract_after_guard_equals_direct(ray_session, corpus_dir):
    """Span-split + reassembly is invisible to the extraction kernel."""
    import functools
    import ray.data as rd
    cfg = LayoutConfig(layout="generic")
    direct = {
        r["doc_id"]: r["spans"]
        for r in rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
                   .map_batches(functools.partial(extract_batch, cfg=cfg),
                                batch_format="pyarrow").take_all()
    }
    guarded_ds = with_skew_guard(
        rd.read_parquet(corpus_dir, columns=["doc_id", "spans"]),
        lambda d: d, max_spans=40)
    guarded = {
        r["doc_id"]: r["spans"]
        for r in guarded_ds.map_batches(functools.partial(extract_batch, cfg=cfg),
                                        batch_format="pyarrow").take_all()
    }
    assert direct == guarded


def test_error_isolation():
    """A doc that crashes the kernel yields an error row, not a lost block."""
    bad = [{"kind": "word", "text": "x", "media_ref": "bbox://p1/5,5,9,9", "offset": 0}]
    tbl = pa.table({
        "doc_id": pa.array(["ok", "boom"]),
        "spans": pa.array([
            [{"kind": "word", "text": "a", "media_ref": "bbox://p1/1,1,20,20", "offset": 0}],
            bad,
        ], pa.list_(SPAN_TYPE)),
    })
    import ocr_table_extractor_to_csv_ray.core.layouts as L
    orig = L.extract_document

    def exploding(toks, cfg):
        if len(toks) and toks.text[0] == "x":
            raise RuntimeError("synthetic kernel crash")
        return orig(toks, cfg)

    L.extract_document = exploding
    try:
        import importlib
        import ocr_table_extractor_to_csv_ray.stages.extract as X
        importlib.reload(X)  # rebind the patched symbol
        out = X.extract_batch(tbl, LayoutConfig(layout="generic"))
    finally:
        L.extract_document = orig
        import importlib
        import ocr_table_extractor_to_csv_ray.stages.extract as X
        importlib.reload(X)
    assert out.num_rows == 2
    errs = out["error"].to_pylist()
    assert errs[0] == "" and "RuntimeError" in errs[1]
    assert out["spans"].to_pylist()[1] == []
