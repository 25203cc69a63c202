"""Generate ``oracle_expected/*.parquet`` — REFERENCE-DERIVED expected
results the driver's DuckDB oracle can join against.

The driver can only express oracles as SQL over the testdata views, and
geometry kernels are not SQL-expressible — but they ARE deterministic.
So this tool executes the reference repo's own code (``tests/refimpl``
imports ``/root/reference/src``) over the exact inputs the ``queries()``
entries consume and checkpoints the per-document expected
``(n_rows, n_cols)`` (plus deterministic hash fingerprints / split
labels recomputed from their spec, independent of the engine modules).

Keying: every row carries ``sig`` = ``"{count}-{sum_n_chars}"`` of the
sf tier's documents table (the tiers share neither content nor,
between 0.001 and 0.01, row count — the signature disambiguates), and
corpus-derived files also carry ``n_docs``. The oracle SQL filters on
the signature computed from the live ``documents`` view, so a
mismatched corpus yields 0 rows — a loud failure, never a silent pass.

Run from the repo root (no Ray needed — pure refimpl + pyarrow):

    python tools/gen_oracle_expected.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.refimpl import ref_extract  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "oracle_expected")
SF_DIRS = {
    "/root/testdata/sf0.001": 0.001,
    "/root/testdata/sf0.01": 0.01,
    "/root/testdata/sf0.1": 0.1,
}
LAYOUTS = ("generic", "dynamic", "financial", "professional")


def doc_sig(sf_dir: str) -> str:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["n_chars"])
    import pyarrow.compute as pc
    return f"{t.num_rows}-{pc.sum(t['n_chars']).as_py()}"


def corpus_n(sf: float) -> int:
    return max(500, int(100_000 * sf))


def build_corpus(n: int):
    """Replicates pipelines.extract.generate_corpus content (same
    corpus_table blocks, seed 42, 1000 docs/block) without Ray."""
    from ocr_table_extractor_to_csv_ray.sources.synthetic import corpus_table
    tables = []
    for s in range(0, n, 1000):
        tables.append(corpus_table(min(1000, n - s), 42, start=s))
    return pa.concat_tables(tables).select(["doc_id", "spans"])


def grid_shape(header, rows) -> tuple:
    widths = [len(r) for r in rows] + ([len(header)] if header else [])
    return len(rows), (max(widths) if widths else 0)


# ---------------------------------------------------------------------------
# corpus-based: the four layouts + the knobs config + the hOCR roundtrip

def expected_extract(corpus, layout: str, **knobs) -> pd.DataFrame:
    out = []
    spans_rows = corpus["spans"].to_pylist()
    ids = corpus["doc_id"].to_pylist()
    for doc_id, spans in zip(ids, spans_rows):
        header, rows, _num = ref_extract(spans, layout, **knobs)
        n_rows, n_cols = grid_shape(header, rows)
        out.append({"doc_id": str(doc_id), "n_rows": n_rows, "n_cols": n_cols})
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int32")
    df["n_cols"] = df["n_cols"].astype("int32")
    return df


def expected_hocr_roundtrip(corpus) -> pd.DataFrame:
    """hocr_parse_extract drops non-word spans and re-parses the rest
    through the hOCR markup roundtrip; expected = reference extraction
    over the roundtripped word tokens."""
    from ocr_table_extractor_to_csv_ray.sources.hocr import (
        parse_hocr_batch, tokens_to_hocr)
    out = []
    spans_rows = corpus["spans"].to_pylist()
    ids = corpus["doc_id"].to_pylist()
    for doc_id, spans in zip(ids, spans_rows):
        toks = []
        for s in spans or []:
            if s["kind"] != "word":
                continue
            ref = s["media_ref"][len("bbox://p"):]
            page_s, coords = ref.split("/", 1)
            parts = coords.split("/", 1)
            x1, y1, x2, y2 = (int(v) for v in parts[0].split(","))
            lid = parts[1] if len(parts) > 1 else None
            toks.append((s["text"], int(page_s), x1, y1, x2, y2, lid))
        rt = parse_hocr_batch(pa.table({
            "doc_id": pa.array([str(doc_id)]),
            "hocr": pa.array([tokens_to_hocr(toks)]),
        }))
        header, rows, _ = ref_extract(rt["spans"].to_pylist()[0], "generic")
        n_rows, n_cols = grid_shape(header, rows)
        out.append({"doc_id": str(doc_id), "n_rows": n_rows, "n_cols": n_cols})
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int32")
    df["n_cols"] = df["n_cols"].astype("int32")
    return df


# ---------------------------------------------------------------------------
# documents-based: text render, hash split, rolling fingerprint

def expected_text_render(sf_dir: str) -> pd.DataFrame:
    from ocr_table_extractor_to_csv_ray.sources.render import render_documents_batch
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    rendered = render_documents_batch(docs)
    return expected_extract(rendered, "generic")


def expected_split_hash(sf_dir: str, eval_ratio: float = 0.2,
                        seed: int = 42) -> pd.DataFrame:
    """Spec: crc32(f"{seed}:{doc_id}") % 1e6 < ratio*1e6 → eval."""
    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_pylist()
    cut = int(eval_ratio * 1_000_000)
    rows = [{"doc_id": i,
             "split": "eval" if zlib.crc32(f"{seed}:{i}".encode()) % 1_000_000 < cut
             else "train"} for i in ids]
    return pd.DataFrame(rows)


def expected_rolling_fp(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Spec (independent reimplementation — no engine imports):
    token hash = little-endian blake2b-64 of the lowercased token;
    shingle hash = golden-ratio positional mix over k-token windows
    (whole doc if < k tokens); fp_min = min over the unique shingle
    set, viewed as int64."""
    MIX = np.uint64(0x9E3779B97F4A7C15)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").lower().split()
        th = np.array([int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little")
            for w in toks], dtype=np.uint64)
        with np.errstate(over="ignore"):
            if len(th) == 0:
                continue  # list_element(…, 0) has no value — mirror absence
            if len(th) < k:
                sh = np.zeros(1, np.uint64)
                for j in range(len(th)):
                    sh = sh * MIX + th[j]
            else:
                sh = np.zeros(len(th) - k + 1, np.uint64)
                for j in range(k):
                    sh = sh * MIX + th[j: len(th) - k + 1 + j]
        fp_min = int(np.unique(sh)[0].astype(np.int64))
        rows.append({"doc_id": doc_id, "fp_min": fp_min})
    df = pd.DataFrame(rows)
    df["fp_min"] = df["fp_min"].astype("int64")
    return df


KNOBS = dict(expected_n_cols=4, table_bbox=(0, 0, 2000, 2400),
             header_regexes=["concepto", "descripcion"])


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    per_query: dict = {}

    for sf_dir, sf in SF_DIRS.items():
        sig = doc_sig(sf_dir)
        n = corpus_n(sf)
        print(f"{sf_dir}: sig={sig} corpus_n={n}", flush=True)
        corpus = build_corpus(n)

        for layout in LAYOUTS:
            df = expected_extract(corpus, layout)
            df.insert(0, "sig", sig)
            df.insert(1, "layout", layout)
            per_query.setdefault(f"extract_{layout}", []).append(df)
            print(f"  extract_{layout}: {len(df)} rows", flush=True)
        df = expected_extract(corpus, "generic", **KNOBS)
        df.insert(0, "sig", sig)
        per_query.setdefault("extract_knobs", []).append(df)
        df = expected_hocr_roundtrip(corpus)
        df.insert(0, "sig", sig)
        per_query.setdefault("hocr_parse_extract", []).append(df)
        print("  knobs + hocr roundtrip done", flush=True)

        for name, fn in (("extract_text_render", expected_text_render),
                         ("split_hash", expected_split_hash),
                         ("fingerprint_rolling", expected_rolling_fp)):
            df = fn(sf_dir)
            df.insert(0, "sig", sig)
            per_query.setdefault(name, []).append(df)
            print(f"  {name}: {len(df)} rows", flush=True)

    for name, dfs in per_query.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(pd.concat(dfs, ignore_index=True),
                                            preserve_index=False), path)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
