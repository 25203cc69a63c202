"""Skew guard: page-split oversized documents, reassemble after parse.

A 10^12-document corpus has a tail of multi-thousand-page documents;
one such row would pin a single worker for minutes (Ray blocks split
BETWEEN rows, never inside one). The guard:

    map_batches(split_oversized)        # flat-map: giant doc → per-page shard rows
      ... parse / OCR stages ...        # per-shard, embarrassingly parallel
    reassemble                          # restore one row per doc

Validity boundary (SURVEY.md §4.2): the geometry kernels compute the
column/row profiles across ALL pages jointly (``columns.py:14-27``,
``rows.py:18-30``), so the split may only cover parse/OCR stages —
``reassemble`` must run BEFORE the extraction kernel. Shard rows carry
``(doc_id, shard_no, n_shards, media_base)``; reassembly concatenates
spans in ``shard_no`` order and re-bases offsets, so the output row is
byte-identical to the unsplit document. ``media_base`` (count of media
spans in earlier shards) lets the OCR stage keep GLOBAL page numbers —
shard 2's first page image is page 17, not page 1.

Two reassembly strategies (``with_skew_guard(selective=...)``):

- ``selective=True`` — rows that were never split bypass the shuffle
  entirely; only oversized-doc shards go through the
  ``groupby(doc_id)`` reassembly. The price is that the input +
  ``inner_stages`` execute twice (two lazy consumers), so use it when
  ``inner_stages`` is cheap relative to an all-to-all of the corpus
  (the flagship: inner is identity, so the second pass is a re-read
  and the shuffle moves only the oversized tail).
- ``selective=False`` — one pass, one full ``groupby(doc_id)``
  shuffle. Use it when ``inner_stages`` is expensive (the OCR actor
  pool) and must not run twice.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.spans import KIND_MEDIA

GUARD_COLS = ("shard_no", "n_shards", "media_base")


def _append_guard_cols(batch: pa.Table, shard, n_shards, media_base) -> pa.Table:
    out = batch
    for name, arr in (("shard_no", shard), ("n_shards", n_shards),
                      ("media_base", media_base)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, arr)
    return out


def _cut_row(spans: List[Dict], max_spans: int,
             count_kind: Optional[str]) -> List[int]:
    """Cut indices (exclusive ends) so each shard holds ≤ ``max_spans``
    counted spans. ``count_kind=None`` counts every span; a kind (e.g.
    ``media``) counts only those — an OCR shard is then bounded by its
    page-image count, which is what its cost is proportional to."""
    cuts = []
    count = 0
    for i, s in enumerate(spans):
        if count_kind is None or s["kind"] == count_kind:
            count += 1
            if count > max_spans:
                cuts.append(i)
                count = 1
    cuts.append(len(spans))
    return cuts


def split_oversized_batch(batch: pa.Table, max_spans: int = 50_000,
                          count_kind: Optional[str] = None) -> pa.Table:
    """Rows with more than ``max_spans`` (counted) spans become one row
    per ~``max_spans``-span shard; every other column is replicated onto
    the shards. All rows gain ``(shard_no, n_shards, media_base)``."""
    spans_col = batch["spans"]
    if count_kind is None:
        counts = pc.list_value_length(spans_col).to_numpy(zero_copy_only=False)
    else:
        la = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
        kind_is = pc.equal(la.flatten().field("kind"), count_kind)
        flags = kind_is.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.fill_null(la.value_lengths(), 0).to_numpy(zero_copy_only=False)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        cum = np.concatenate(([0], np.cumsum(flags)))
        counts = cum[offsets[1:]] - cum[offsets[:-1]]
    if not (counts > max_spans).any():
        n = batch.num_rows
        return _append_guard_cols(
            batch,
            pa.array(np.zeros(n, np.int32)),
            pa.array(np.ones(n, np.int32)),
            pa.array(np.zeros(n, np.int32)),
        )

    spans_rows = spans_col.to_pylist()
    take_idx: List[int] = []
    o_spans: List[List[Dict]] = []
    o_shard: List[int] = []
    o_n: List[int] = []
    o_base: List[int] = []
    for ri, ss in enumerate(spans_rows):
        ss = ss or []
        if counts[ri] <= max_spans:
            take_idx.append(ri)
            o_spans.append(ss)
            o_shard.append(0); o_n.append(1); o_base.append(0)
            continue
        cuts = _cut_row(ss, max_spans, count_kind)
        lo = 0
        media_seen = 0
        for k, hi in enumerate(cuts):
            shard = ss[lo:hi]
            take_idx.append(ri)
            o_spans.append(shard)
            o_shard.append(k); o_n.append(len(cuts)); o_base.append(media_seen)
            media_seen += sum(1 for s in shard if s["kind"] == KIND_MEDIA)
            lo = hi
    out = batch.take(pa.array(take_idx, pa.int64()))
    span_t = batch.schema.field("spans").type
    out = out.set_column(out.schema.get_field_index("spans"), "spans",
                         pa.array(o_spans, span_t))
    return _append_guard_cols(
        out,
        pa.array(o_shard, pa.int32()),
        pa.array(o_n, pa.int32()),
        pa.array(o_base, pa.int32()),
    )


def reassemble_group(g: pa.Table) -> pa.Table:
    """One group = all shards of one doc_id → single row, spans
    concatenated in shard order with offsets re-based to one sequence.
    Doc-level columns (anything besides spans + guard cols) come from
    shard 0 — they were replicated identically onto every shard."""
    guard = [c for c in GUARD_COLS if c in g.column_names]
    if g.num_rows == 1 and g["n_shards"][0].as_py() == 1:
        return g.drop_columns(guard)
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
    row0 = g.take(pa.array([int(order[0])], pa.int64()))
    row0 = row0.set_column(row0.schema.get_field_index("spans"), "spans",
                           pa.array([merged], g.schema.field("spans").type))
    return row0.drop_columns(guard)


def _only_normal(t: pa.Table) -> pa.Table:
    keep = t.filter(pc.equal(t["n_shards"], pa.scalar(1, pa.int32())))
    return keep.drop_columns([c for c in GUARD_COLS if c in keep.column_names])


def _only_sharded(t: pa.Table) -> pa.Table:
    return t.filter(pc.greater(t["n_shards"], pa.scalar(1, pa.int32())))


def max_span_count(ds, count_kind: Optional[str] = None) -> int:
    """One streaming pass over the ``spans`` column computing the max
    per-row (counted) span count — zero-copy Arrow offset math, no
    Python span work. This is the stat a manifest layer (Iceberg/Delta
    file statistics) would carry for free; ``generate_corpus`` persists
    it as a ``_STATS.json`` sidecar so steady-state runs never pay this
    pass (see ``pipelines/extract.py::corpus_stats``)."""
    def _max_count(t: pa.Table) -> pa.Table:
        spans_col = t["spans"]
        if count_kind is None:
            counts = pc.list_value_length(spans_col)
            m = pc.max(counts).as_py() if t.num_rows else 0
        else:
            la = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
            flags = pc.equal(la.flatten().field("kind"), count_kind)
            f = flags.to_numpy(zero_copy_only=False).astype(np.int64)
            lens = pc.fill_null(la.value_lengths(), 0).to_numpy(zero_copy_only=False)
            offsets = np.concatenate(([0], np.cumsum(lens)))
            cum = np.concatenate(([0], np.cumsum(f)))
            per_row = cum[offsets[1:]] - cum[offsets[:-1]]
            m = int(per_row.max()) if len(per_row) else 0
        return pa.table({"m": pa.array([int(m or 0)], pa.int64())})

    mx = ds.select_columns(["spans"]).map_batches(
        _max_count, batch_format="pyarrow").max("m")
    return int(mx or 0)


def has_oversized(ds, max_spans: int, count_kind: Optional[str] = None) -> bool:
    """Probe: does ANY row exceed the shard threshold? Costs a full
    streaming pass — prefer a manifest stat (``known_max``) when one
    exists; the pass is still far cheaper than an unwarranted
    all-to-all reassembly shuffle."""
    return max_span_count(ds, count_kind) > max_spans


def media_probe(ds) -> tuple:
    """One streaming pass over raw spans → ``(max_media_per_row,
    has_pdf)``. Lets the transformers pipeline decide its guard from the
    PRE-rasterize stream — probing post-rasterize would execute the
    rasterizer twice. pdf media fan out to an unbounded page count, so
    ``has_pdf=True`` means the raw media count is not a sound
    post-rasterize bound and the guard must engage."""
    from ..core.spans import KIND_MEDIA

    def _m(t: pa.Table) -> pa.Table:
        spans_col = t["spans"]
        la = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) else spans_col
        flat = la.flatten()
        flags = pc.equal(flat.field("kind"), KIND_MEDIA)
        f = flags.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = pc.fill_null(la.value_lengths(), 0).to_numpy(zero_copy_only=False)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        cum = np.concatenate(([0], np.cumsum(f)))
        per_row = cum[offsets[1:]] - cum[offsets[:-1]]
        n_pdf = pc.sum(pc.cast(pc.and_(
            flags, pc.starts_with(flat.field("media_ref"), "pdf://")),
            pa.int64())).as_py() or 0
        return pa.table({
            "m": pa.array([int(per_row.max()) if len(per_row) else 0], pa.int64()),
            "pdf": pa.array([int(n_pdf)], pa.int64()),
        })

    parts = ds.select_columns(["spans"]).map_batches(
        _m, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return 0, False
    return int(parts["m"].max()), bool(parts["pdf"].sum() > 0)


def with_skew_guard(ds, inner_stages, max_spans: int = 50_000,
                    count_kind: Optional[str] = None,
                    selective: bool = False, probe: bool = False,
                    known_max: Optional[int] = None):
    """``split → inner_stages(ds) → reassemble``. ``inner_stages`` is a
    callable Dataset → Dataset limited to per-span transforms (parse,
    OCR). See the module docstring for the ``selective`` trade-off.

    ``known_max`` is the manifest stat (max counted spans per row, e.g.
    from ``corpus_stats``): when provided it decides instantly — no
    probe pass at all. Otherwise ``probe=True`` runs
    :func:`has_oversized` (one streaming pass). Either way, when
    nothing in the corpus crosses the threshold the guard vanishes
    entirely — ``inner_stages`` runs on the raw stream with no split
    columns, no second pass and no shuffle."""
    import functools

    if known_max is not None:
        if known_max <= max_spans:
            return inner_stages(ds)
    elif probe and not has_oversized(ds, max_spans, count_kind):
        return inner_stages(ds)

    ds = ds.map_batches(
        functools.partial(split_oversized_batch, max_spans=max_spans,
                          count_kind=count_kind),
        batch_format="pyarrow")
    ds = inner_stages(ds)
    if not selective:
        return ds.groupby("doc_id").map_groups(reassemble_group,
                                               batch_format="pyarrow")
    normal = ds.map_batches(_only_normal, batch_format="pyarrow")
    sharded = (ds.map_batches(_only_sharded, batch_format="pyarrow")
               .groupby("doc_id").map_groups(reassemble_group,
                                             batch_format="pyarrow"))
    return normal.union(sharded)
