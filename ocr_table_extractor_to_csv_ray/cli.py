"""Command-line entry points (reference parity: ``run.py``,
``dataset_cli.py``, ``eval_cli.py`` — SURVEY.md §3), corpus-shaped.

The reference CLIs process ONE file per invocation; this engine's unit
is a corpus directory (parquet of ``doc_id, spans`` — or raw ``.hocr``
files, converted on the fly), so every subcommand is the corresponding
reference pipeline lifted to Ray Data:

    python -m ocr_table_extractor_to_csv_ray extract  IN OUT --layout dynamic
    python -m ocr_table_extractor_to_csv_ray dataset  IN OUT          # JSONL
    python -m ocr_table_extractor_to_csv_ray evaluate REF PRED --report r.csv
    python -m ocr_table_extractor_to_csv_ray csv-export IN OUT_DIR

Only CLI mains own a Ray session (guarded init; never in library code).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _read_corpus(path: str):
    """Parquet corpus dir/file, or a directory of raw ``.hocr`` /
    ``.txt`` / ``.html`` files (converted to the span schema on read)."""
    import ray.data as rd

    if os.path.isdir(path):
        import pyarrow as pa

        def _files(ext):
            return sorted(glob.glob(os.path.join(path, f"*.{ext}")))

        hocrs = _files("hocr")
        if hocrs:
            from .sources.hocr import parse_hocr_batch
            rows = [{"doc_id": os.path.splitext(os.path.basename(p))[0],
                     "hocr": open(p, encoding="utf-8").read()} for p in hocrs]
            return rd.from_arrow(pa.Table.from_pylist(rows)).map_batches(
                parse_hocr_batch, batch_format="pyarrow")
        txts = _files("txt")
        if txts:
            from .sources.render import render_documents_batch
            rows = [{"doc_id": os.path.splitext(os.path.basename(p))[0],
                     "text": open(p, encoding="utf-8").read()} for p in txts]
            return rd.from_arrow(pa.Table.from_pylist(rows)).map_batches(
                render_documents_batch, batch_format="pyarrow")
        htmls = _files("html")
        if htmls:
            # main-content strip → text → rendered spans
            from .sources.html import html_main_text_batch
            from .sources.render import render_documents_batch
            rows = [{"doc_id": os.path.splitext(os.path.basename(p))[0],
                     "html": open(p, encoding="utf-8").read()} for p in htmls]
            return (rd.from_arrow(pa.Table.from_pylist(rows))
                    .map_batches(html_main_text_batch, batch_format="pyarrow")
                    .map_batches(render_documents_batch, batch_format="pyarrow"))
    return rd.read_parquet(path, columns=["doc_id", "spans"])


def _layout_cfg(args):
    from .config import LayoutConfig
    return LayoutConfig(
        layout=args.layout,
        table_bbox=tuple(args.bbox) if args.bbox else None,
        expected_n_cols=args.expected_n_cols,
        header_regexes=tuple(args.header_regex) if args.header_regex else None,
    )


def cmd_extract(args) -> None:
    _ensure_ray()
    from .config import EngineConfig
    from .pipelines.extract import build_extraction_ds, run_extraction_resumable
    from .pipelines.transformers import build_transformers_ds

    cfg = EngineConfig(layout=_layout_cfg(args))
    if args.resumable:
        info = run_extraction_resumable(args.input, args.output, cfg,
                                        num_shards=args.num_shards)
        print(json.dumps(info))
        return
    ds = _read_corpus(args.input)
    if args.layout == "transformers":
        out = build_transformers_ds(ds, cfg)
    else:
        out = build_extraction_ds(ds, cfg)
    out.write_parquet(args.output)
    print(json.dumps({"output": args.output}))


def cmd_dataset(args) -> None:
    _ensure_ray()
    from .pipelines.databuild import build_dataset
    ds = _read_corpus(args.input)
    build_dataset(ds, out_dir=args.output,
                  expected_n_cols=args.expected_n_cols,
                  header_regexes=tuple(args.header_regex) if args.header_regex else None)
    print(json.dumps({"output": args.output}))


def cmd_evaluate(args) -> None:
    _ensure_ray()
    import ray.data as rd
    from .pipelines.evaluate import evaluate_corpus
    from .sinks.csv_sink import write_eval_report_csv
    ref = rd.read_parquet(args.reference, columns=["doc_id", "spans"])
    pred = rd.read_parquet(args.predicted, columns=["doc_id", "spans"])
    m = evaluate_corpus(ref, pred,
                        numeric_columns=getattr(args, "numeric_columns", None))
    if args.report:
        write_eval_report_csv(m, args.report)
    if args.json_report:
        with open(args.json_report, "w") as fh:
            json.dump(m, fh, indent=2, default=str)
    print(json.dumps({k: m[k] for k in ("text_accuracy", "matched_cells",
                                        "total_cells")}))


def cmd_finetune(args) -> None:
    """Reference entry point 4 (train_layoutlm.py::main): corpus →
    teacher-labeled examples → LayoutLMv3 fine-tune (torch hosts) or
    the linear-classifier fallback (this container)."""
    _ensure_ray()
    from .functions.finetune import finetune_layoutlm
    from .pipelines.databuild import build_dataset
    ds = _read_corpus(args.input)
    out = finetune_layoutlm(
        build_dataset(ds), model_id=args.model_id, n_rounds=args.num_epochs,
        lr=args.learning_rate, eval_ratio=args.eval_ratio, seed=args.seed,
        max_seq_length=args.max_seq_length, output_dir=args.output_dir)
    row = {k: (v.item() if hasattr(v, "item") else v)
           for k, v in out.iloc[0].items()}
    if args.metrics_json:
        with open(args.metrics_json, "w") as fh:
            json.dump(row, fh, indent=2)
    print(json.dumps(row))


def cmd_corpus_prep(args) -> None:
    """Composed training-data prep (pipelines/corpus_prep.py): a
    documents table (doc_id, lang, text) → PII scrub → quality gate →
    language temperature sample → per-language report parquet."""
    _ensure_ray()
    import pyarrow.parquet as pq
    import ray.data as rd
    from .pipelines.corpus_prep import prep_corpus
    ds = rd.read_parquet(args.input, columns=["doc_id", "lang", "text"])
    report = prep_corpus(ds, quality_min=args.quality_min, alpha=args.alpha,
                         checkpoint_dir=args.checkpoint_dir).to_pandas()
    if report.empty:                  # every doc gated out
        import pandas as pd
        report = pd.DataFrame({"lang": pd.array([], dtype="object"),
                               "n_docs": pd.array([], dtype="int64"),
                               "total_tokens": pd.array([], dtype="int64")})
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(report, preserve_index=False),
                   args.output)
    print(json.dumps({
        "languages": len(report),
        "n_docs": int(report["n_docs"].sum()),
        "total_tokens": int(report["total_tokens"].sum()),
        "output": args.output,
    }))


def cmd_csv_export(args) -> None:
    _ensure_ray()
    import ray.data as rd
    from .sinks.csv_sink import export_csvs
    ds = rd.read_parquet(args.input)
    n = export_csvs(ds, args.output, numeric=not args.no_numeric)
    print(json.dumps({"documents": n, "output": args.output}))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ocr_table_extractor_to_csv_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_layout_args(sp):
        sp.add_argument("--layout", default="dynamic",
                        choices=["financial", "dynamic", "generic",
                                 "professional", "transformers"])
        sp.add_argument("--bbox", type=int, nargs=4,
                        metavar=("X1", "Y1", "X2", "Y2"))
        sp.add_argument("--expected-n-cols", type=int)
        sp.add_argument("--header-regex", action="append")

    e = sub.add_parser("extract", help="corpus → extraction parquet")
    e.add_argument("input"); e.add_argument("output")
    add_layout_args(e)
    e.add_argument("--resumable", action="store_true",
                   help="sharded output with per-shard lineage records")
    e.add_argument("--num-shards", type=int, default=8)
    e.set_defaults(fn=cmd_extract)

    d = sub.add_parser("dataset", help="corpus → teacher-labeled JSONL")
    d.add_argument("input"); d.add_argument("output")
    d.add_argument("--expected-n-cols", type=int)
    d.add_argument("--header-regex", action="append")
    d.set_defaults(fn=cmd_dataset)

    v = sub.add_parser("evaluate", help="two extraction output DIRECTORIES "
                       "(corpus-vs-corpus) → streaming metrics")
    v.add_argument("reference"); v.add_argument("predicted")
    v.add_argument("--report", help="CSV report path (reference "
                   "eval_cli.py --report schema)")
    v.add_argument("--json-report", "--json", dest="json_report",
                   help="JSON metrics path (reference eval_cli.py --json)")
    v.add_argument("--numeric-columns", nargs="+",
                   help="restrict numeric metrics to these columns "
                   "(header names or col_N aliases); omitted → inferred")
    v.set_defaults(fn=cmd_evaluate)

    f = sub.add_parser("finetune",
                       help="corpus → LayoutLMv3 fine-tune (torch-optional)")
    f.add_argument("input")
    f.add_argument("--output-dir", help="checkpoint dir (torch hosts only)")
    f.add_argument("--model-id", default="microsoft/layoutlmv3-base")
    f.add_argument("--num-epochs", type=int, default=2)
    f.add_argument("--learning-rate", type=float, default=5e-5)
    f.add_argument("--eval-ratio", type=float, default=0.1)
    f.add_argument("--max-seq-length", type=int, default=512)
    f.add_argument("--seed", type=int, default=42)
    f.add_argument("--metrics-json")
    f.set_defaults(fn=cmd_finetune)

    cp = sub.add_parser("corpus-prep",
                        help="documents parquet → per-language prep report")
    cp.add_argument("input"); cp.add_argument("output")
    cp.add_argument("--quality-min", type=float, default=0.5)
    cp.add_argument("--alpha", type=float, default=0.5)
    cp.add_argument("--checkpoint-dir",
                    help="spill the gated projection to parquet so the "
                         "stratum-count pass re-reads it instead of "
                         "re-executing the chain")
    cp.set_defaults(fn=cmd_corpus_prep)

    c = sub.add_parser("csv-export", help="extraction parquet → per-doc CSVs")
    c.add_argument("input"); c.add_argument("output")
    c.add_argument("--no-numeric", action="store_true")
    c.set_defaults(fn=cmd_csv_export)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    try:
        args.fn(args)
    except FileNotFoundError as exc:       # run.py:60-64 error contract
        print(f"error: input not found: {exc}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
