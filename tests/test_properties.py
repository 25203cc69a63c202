"""Pipeline-level invariants (SURVEY.md §5.2.3)."""

from __future__ import annotations

import functools

import pyarrow as pa

from ocr_table_extractor_to_csv_ray.config import EngineConfig, LayoutConfig
from ocr_table_extractor_to_csv_ray.stages.extract import extract_batch


def _spans_by_doc(ds):
    return {r["doc_id"]: r["spans"] for r in ds.take_all()}


def test_every_doc_appears_exactly_once(ray_session, corpus_dir):
    """Empty documents included (main.py:100-109: empty CSV, never a
    dropped file)."""
    import ray.data as rd
    ds = rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
    out = ds.map_batches(
        functools.partial(extract_batch, cfg=LayoutConfig(layout="generic")),
        batch_format="pyarrow")
    ids = [r["doc_id"] for r in out.select_columns(["doc_id"]).take_all()]
    assert len(ids) == 200 and len(set(ids)) == 200


def test_output_invariant_under_repartition(ray_session, corpus_dir):
    import ray.data as rd
    cfg = LayoutConfig(layout="dynamic")
    base = rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
    a = _spans_by_doc(base.map_batches(
        functools.partial(extract_batch, cfg=cfg), batch_format="pyarrow"))
    for nblocks in (1, 7, 64):
        b = _spans_by_doc(
            rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
              .repartition(nblocks)
              .map_batches(functools.partial(extract_batch, cfg=cfg),
                           batch_format="pyarrow", batch_size=13))
        assert a == b, nblocks


def test_output_invariant_under_shuffled_input(ray_session, corpus_dir):
    """Row order across the corpus is irrelevant — each document's span
    sequence carries its own explicit order field."""
    import ray.data as rd
    cfg = LayoutConfig(layout="financial")
    a = _spans_by_doc(
        rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
          .map_batches(functools.partial(extract_batch, cfg=cfg),
                       batch_format="pyarrow"))
    b = _spans_by_doc(
        rd.read_parquet(corpus_dir, columns=["doc_id", "spans"])
          .random_shuffle(seed=11)
          .map_batches(functools.partial(extract_batch, cfg=cfg),
                       batch_format="pyarrow"))
    assert a == b


def test_span_offsets_are_contiguous_reading_order(corpus_200):
    out = extract_batch(corpus_200, LayoutConfig(layout="generic"))
    for spans in out["spans"].to_pylist():
        offs = [s["offset"] for s in spans]
        assert offs == list(range(len(offs)))
        # rows terminate: last span (if any) is a row_end
        if spans:
            assert spans[-1]["kind"] == "row_end"


def test_per_row_layout_dispatch(corpus_200):
    """A `layout` column on the input overrides cfg per row and each
    row's output equals the whole-corpus run of that layout."""
    import pyarrow as pa
    n = 40
    sample = corpus_200.slice(0, n).select(["doc_id", "spans"])
    layouts = ["generic", "financial", "dynamic", "professional"] * (n // 4)
    mixed = sample.append_column("layout", pa.array(layouts))
    out = extract_batch(mixed, LayoutConfig(layout="generic"))
    assert out["layout"].to_pylist() == layouts
    assert "spans_numeric" in out.column_names      # dynamic rows present
    per_layout = {
        lay: extract_batch(sample, LayoutConfig(layout=lay))
        for lay in set(layouts)
    }
    for i, lay in enumerate(layouts):
        want = per_layout[lay]["spans"].to_pylist()[i]
        assert out["spans"].to_pylist()[i] == want, (i, lay)
        if lay == "dynamic":
            assert out["spans_numeric"].to_pylist()[i] == \
                per_layout[lay]["spans_numeric"].to_pylist()[i]

def test_layout_dispatch_schema_batch_invariant(corpus_200):
    """Output schema must not depend on a batch's row VALUES: with a
    `layout` column present, every batch emits `spans_numeric` (empty
    for non-dynamic rows) so blocks of one dataset unify."""
    import pyarrow as pa
    sample = corpus_200.slice(0, 8).select(["doc_id", "spans"])
    no_dyn = sample.append_column("layout", pa.array(["generic"] * 8))
    out = extract_batch(no_dyn, LayoutConfig(layout="generic"))
    assert "spans_numeric" in out.column_names
    assert all(v == [] for v in out["spans_numeric"].to_pylist())
    with_dyn = sample.append_column(
        "layout", pa.array(["dynamic"] * 4 + ["generic"] * 4))
    out2 = extract_batch(with_dyn, LayoutConfig(layout="generic"))
    assert out.schema == out2.schema
