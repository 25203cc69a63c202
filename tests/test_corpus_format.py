"""Format dispatch for the corpus read/sink (north rule: Lance tables;
sandbox mirror: parquet with the identical Arrow schema)."""
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus(tmp_path, n=50):
    from ocr_table_extractor_to_csv_ray.sources.synthetic import corpus_table
    p = str(tmp_path / "c")
    os.makedirs(p)
    pq.write_table(corpus_table(n), os.path.join(p, "p0.parquet"))
    return p


def test_read_corpus_parquet_schema(ray_session, tmp_path):
    from ocr_table_extractor_to_csv_ray.pipelines.extract import (
        corpus_files, read_corpus)
    p = _corpus(tmp_path)
    ds = read_corpus(corpus_files(p))
    assert set(ds.schema().names) == {"doc_id", "spans"}


def test_read_corpus_lance_dispatch(ray_session, tmp_path, monkeypatch):
    """format='lance' must route through ray.data.read_lance with the
    SAME column pushdown, and yield a schema-identical Dataset. No
    lance package in-sandbox → the lance reader is faked with a
    parquet read of the same table."""
    import ray.data as rd
    from ocr_table_extractor_to_csv_ray.pipelines.extract import (
        corpus_files, read_corpus)

    p = _corpus(tmp_path)
    calls = {}

    def fake_read_lance(uri, *, columns=None, **kw):
        calls["uri"], calls["columns"] = uri, columns
        return rd.read_parquet(corpus_files(p), columns=columns)

    monkeypatch.setattr(rd, "read_lance", fake_read_lance)
    via_lance = read_corpus("lance://corpus", format="lance")
    via_parquet = read_corpus(corpus_files(p))
    assert calls["uri"] == "lance://corpus"
    assert calls["columns"] == ["doc_id", "spans"]     # pushdown preserved
    assert via_lance.schema() == via_parquet.schema()  # schema-identical
    assert via_lance.count() == via_parquet.count()

    with pytest.raises(ValueError, match="format"):
        read_corpus(corpus_files(p), format="orc")


def test_write_output_lance_dispatch(ray_session, tmp_path, monkeypatch):
    import ray.data as rd
    from ray.data import Dataset
    from ocr_table_extractor_to_csv_ray.pipelines.extract import write_output

    t = pa.table({"doc_id": pa.array(["a", "b"]), "n": pa.array([1, 2])})
    ds = rd.from_arrow(t)
    calls = {}
    monkeypatch.setattr(Dataset, "write_lance",
                        lambda self, path, **kw: calls.setdefault("path", path))
    write_output(ds, "/tmp/out.lance", format="lance")
    assert calls["path"] == "/tmp/out.lance"

    out = str(tmp_path / "pq")
    write_output(ds, out, format="parquet")
    assert pq.ParquetDataset(out).read().num_rows == 2
    with pytest.raises(ValueError, match="format"):
        write_output(ds, out, format="csvx")
