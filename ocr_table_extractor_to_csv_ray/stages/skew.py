"""Skew guard: page-split oversized documents, reassemble after parse.

A 10^12-document corpus has a tail of multi-thousand-page documents;
one such row would pin a single worker for minutes (Ray blocks split
BETWEEN rows, never inside one). The guard:

    map_batches(split_oversized)        # flat-map: giant doc → per-page shard rows
      ... parse / OCR stages ...        # per-shard, embarrassingly parallel
    groupby(doc_id).map_groups(reassemble)   # restore one row per doc

Validity boundary (SURVEY.md §4.2): the geometry kernels compute the
column/row profiles across ALL pages jointly (``columns.py:14-27``,
``rows.py:18-30``), so the split may only cover parse/OCR stages —
``reassemble`` must run BEFORE the extraction kernel. Shard rows carry
``(doc_id, shard_no, n_shards)``; reassembly concatenates spans in
``shard_no`` order and re-bases offsets, so the output row is
byte-identical to the unsplit document.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def split_oversized_batch(batch: pa.Table, max_spans: int = 50_000) -> pa.Table:
    """Rows with more than ``max_spans`` spans become one row per page
    group of ~``max_spans`` spans (page boundaries are not required —
    shards cut on span index, which parse/OCR stages tolerate because
    they treat spans independently)."""
    lens = pc.list_value_length(batch["spans"]).to_numpy(zero_copy_only=False)
    if not (lens > max_spans).any():
        out = batch
        for name, typ, fill in (("shard_no", pa.int32(), 0),
                                ("n_shards", pa.int32(), 1)):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, pa.array([fill] * batch.num_rows, typ))
        return out

    ids = batch["doc_id"].to_pylist()
    spans = batch["spans"].to_pylist()
    o_ids: List[str] = []
    o_spans: List[List[Dict]] = []
    o_shard: List[int] = []
    o_n: List[int] = []
    for doc_id, ss in zip(ids, spans):
        ss = ss or []
        if len(ss) <= max_spans:
            o_ids.append(doc_id); o_spans.append(ss)
            o_shard.append(0); o_n.append(1)
            continue
        n_shards = (len(ss) + max_spans - 1) // max_spans
        for k in range(n_shards):
            o_ids.append(doc_id)
            o_spans.append(ss[k * max_spans:(k + 1) * max_spans])
            o_shard.append(k); o_n.append(n_shards)
    span_t = batch.schema.field("spans").type
    return pa.table({
        "doc_id": pa.array(o_ids, batch.schema.field("doc_id").type),
        "spans": pa.array(o_spans, span_t),
        "shard_no": pa.array(o_shard, pa.int32()),
        "n_shards": pa.array(o_n, pa.int32()),
    })


def reassemble_group(g: pa.Table) -> pa.Table:
    """One group = all shards of one doc_id → single row, spans
    concatenated in shard order with offsets re-based to one sequence."""
    n = g.num_rows
    if n == 1 and g["n_shards"][0].as_py() == 1:
        return g.drop_columns(["shard_no", "n_shards"])
    order = np.argsort(g["shard_no"].to_numpy(zero_copy_only=False), kind="stable")
    spans_rows = g["spans"].to_pylist()
    merged: List[Dict] = []
    off = 0
    for i in order:
        for s in spans_rows[i] or []:
            s = dict(s)
            s["offset"] = off
            off += 1
            merged.append(s)
    return pa.table({
        "doc_id": g["doc_id"].slice(0, 1),
        "spans": pa.array([merged], g.schema.field("spans").type),
    })


def with_skew_guard(ds, inner_stages, max_spans: int = 50_000):
    """``split → inner_stages(ds) → reassemble``. ``inner_stages`` is a
    callable Dataset → Dataset limited to per-span transforms (parse,
    OCR). The groupby is the price of the guard — only pay it for
    corpora that actually have oversized docs."""
    import functools
    ds = ds.map_batches(
        functools.partial(split_oversized_batch, max_spans=max_spans),
        batch_format="pyarrow")
    ds = inner_stages(ds)
    return ds.groupby("doc_id").map_groups(reassemble_group, batch_format="pyarrow")
