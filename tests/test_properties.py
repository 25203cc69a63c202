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


def test_hash_semi_join_property_vs_pandas(ray_session):
    """Randomized semi/anti joins equal the pandas isin reference for
    any key overlap pattern and any bucket count."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ocr_table_extractor_to_csv_ray.functions.join import hash_semi_join

    rng = np.random.default_rng(23)
    for trial in range(5):
        nl, nr = rng.integers(1, 400, 2)
        left = pd.DataFrame({
            "k": rng.integers(0, 60, nl),
            "v": rng.integers(0, 1000, nl),
        })
        right = pd.DataFrame({"k": rng.integers(0, 60, nr)})
        buckets = int(rng.integers(1, 9))
        for anti in (False, True):
            got = (hash_semi_join(rd.from_pandas(left).repartition(3),
                                  rd.from_pandas(right).repartition(2),
                                  "k", num_buckets=buckets, anti=anti)
                   .to_pandas())
            mask = left["k"].isin(set(right["k"]))
            want = (left[~mask if anti else mask]
                    .sort_values(["k", "v"]).reset_index(drop=True))
            assert len(got) == len(want), (trial, anti)
            if not len(want):
                continue       # fully-empty result: row count is the check
            got = got.sort_values(["k", "v"]).reset_index(drop=True)
            assert (got["k"].to_numpy(dtype=np.int64)
                    == want["k"].to_numpy(dtype=np.int64)).all(), (trial, anti)
            assert (got["v"].to_numpy(dtype=np.int64)
                    == want["v"].to_numpy(dtype=np.int64)).all(), (trial, anti)


def test_latest_wins_property_vs_pandas(ray_session):
    """Randomized latest-wins compaction equals the pandas sort+tail
    reference; duplicates of (order_by, tiebreak) never occur by
    construction (unique tiebreak), so the winner is unique."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ocr_table_extractor_to_csv_ray.functions.compact import latest_wins

    rng = np.random.default_rng(29)
    for trial in range(5):
        n = int(rng.integers(1, 500))
        df = pd.DataFrame({
            "k1": rng.integers(0, 12, n),
            "k2": rng.integers(0, 3, n),
            "t": rng.integers(0, 40, n),          # heavy ts ties
            "ver": rng.permutation(n),            # unique tiebreak
            "payload": rng.integers(0, 10**6, n),
        })
        got = (latest_wins(rd.from_pandas(df).repartition(4),
                           keys=["k1", "k2"], order_by="t", tiebreak="ver")
               .to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True))
        want = (df.sort_values(["t", "ver"], kind="mergesort")
                .groupby(["k1", "k2"], as_index=False).tail(1)
                .sort_values(["k1", "k2"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["k1", "k2", "t", "ver", "payload"]].astype("int64"),
            want[["k1", "k2", "t", "ver", "payload"]].astype("int64"),
            check_exact=True)
