"""Sequence packing for LLM pretraining: concatenate every document's
token stream (plus one EOS separator each) in ``doc_id`` order and chop
the stream into fixed-length context windows — each doc gets its global
token offset and the window range it lands in.

The core is a DISTRIBUTED PREFIX SUM (the classic two-level scan):

1. one streaming pass computes per-doc token counts and a RANGE bucket
   from ``doc_id`` (order-preserving, unlike a hash bucket);
2. per-bucket totals come from a tiny ``groupby(bucket)`` whose output
   is ``num_buckets`` rows — the driver turns them into bucket base
   offsets (the only driver-side state, KBs at any corpus size);
3. each bucket task sorts its own docs and adds a local cumsum to the
   broadcast base — no global sort, no all-to-all beyond the per-bucket
   ``map_groups``.

The result is bit-reproducible under any block layout (offsets depend
only on ``doc_id`` order) and SQL-mirrorable
(``sum(...) OVER (ORDER BY doc_id)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_offsets(ds, seq_len: int = 2048, id_column: str = "doc_id",
                 column: str = "text", num_buckets: int = 64):
    """Per-doc packing coordinates for windows of ``seq_len`` tokens.

    Returns ``(doc_id, n_tokens, start_tok, first_seq, last_seq)`` where
    ``start_tok`` is the doc's offset in the global concatenated stream
    (each doc contributes ``n_tokens + 1`` positions — its tokens plus
    one EOS), ``first_seq``/``last_seq`` the window indices of its first
    and last position. ``id_column`` must be integer-valued (the range
    bucketing contract; a lexicographic variant would range-partition on
    string boundaries the same way)."""
    from ray.data.aggregate import Max, Min, Sum

    # cheap id-range probe on the pruned column (metadata-sized result)
    rng = ds.select_columns([id_column]).aggregate(
        Min(id_column, alias_name="lo"), Max(id_column, alias_name="hi"))
    if rng["lo"] is None:        # empty corpus
        return ds.select_columns([id_column])
    lo, hi = int(rng["lo"]), int(rng["hi"])
    span = max(hi - lo + 1, 1)

    def counts(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t[column], "")
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        # trim+split yields [''] for empty text; python .split() yields
        # [] — align on the SQL contract (list_filter removes '')
        flat_empty = pc.equal(pc.list_element(toks, 0), "")
        one = pc.equal(n, 1)
        n = pc.if_else(pc.and_(one, flat_empty), pa.scalar(0, pa.int64()), n)
        ids = t[id_column]
        bucket = pc.cast(
            pc.divide(pc.multiply(pc.subtract(ids, pa.scalar(lo)),
                                  pa.scalar(num_buckets)),
                      pa.scalar(span)), pa.int64())
        return pa.table({id_column: ids, "n_tokens": n, "bucket": bucket})

    per_doc = ds.select_columns([id_column, column]).map_batches(
        counts, batch_format="pyarrow")

    # two-level scan, level 1: bucket totals (tiny), driver prefix sum
    totals = (per_doc.map_batches(
        lambda t: pa.table({
            "bucket": t["bucket"],
            "n1": pc.add(t["n_tokens"], pa.scalar(1, pa.int64())),
        }), batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("n1", alias_name="total"))
        .to_pandas().sort_values("bucket"))
    bases = dict(zip(totals["bucket"],
                     np.concatenate([[0], np.cumsum(totals["total"])[:-1]])))

    # level 2: in-bucket ordered cumsum on top of the broadcast base
    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_column, kind="mergesort").reset_index(drop=True)
        n1 = (g["n_tokens"] + 1).to_numpy()
        start = int(bases[g["bucket"].iloc[0]]) + np.concatenate(
            [[0], np.cumsum(n1)[:-1]])
        return pd.DataFrame({
            id_column: g[id_column],
            "n_tokens": g["n_tokens"],
            "start_tok": pd.array(start, dtype="int64"),
            "first_seq": pd.array(start // seq_len, dtype="int64"),
            "last_seq": pd.array((start + n1 - 1) // seq_len, dtype="int64"),
        })

    return per_doc.groupby("bucket").map_groups(scan_bucket,
                                                batch_format="pandas")


def pack_manifest(ds, seq_len: int = 2048, id_column: str = "doc_id",
                  column: str = "text", num_buckets: int = 64):
    """Window-side view of :func:`pack_offsets`: one row per context
    window ``(seq_id, n_docs, n_filled)`` — how many docs overlap the
    window and how many of its ``seq_len`` positions they fill (every
    window except the final one is exactly full; the property tests
    assert it). Docs explode to their overlapped windows (almost always
    1–2 rows each) in a vectorized ``map_batches``, then one small
    ``groupby(seq_id)`` sums the overlaps."""
    from ray.data.aggregate import Sum

    off = pack_offsets(ds, seq_len=seq_len, id_column=id_column,
                       column=column, num_buckets=num_buckets)

    def expand(t: pa.Table) -> pa.Table:
        start = t["start_tok"].to_numpy()
        n1 = t["n_tokens"].to_numpy() + 1
        first = t["first_seq"].to_numpy()
        last = t["last_seq"].to_numpy()
        counts = (last - first + 1).astype(np.int64)
        total = int(counts.sum())
        parent = np.repeat(np.arange(len(counts)), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        seq = first[parent] + (np.arange(total) - np.repeat(starts, counts))
        lo = np.maximum(seq * seq_len, start[parent])
        hi = np.minimum((seq + 1) * seq_len, (start + n1)[parent])
        return pa.table({
            "seq_id": pa.array(seq),
            "docs": pa.array(np.ones(total, np.int64)),
            "filled": pa.array(hi - lo),
        })

    return (off.map_batches(expand, batch_format="pyarrow")
            .groupby("seq_id")
            .aggregate(Sum("docs", alias_name="n_docs"),
                       Sum("filled", alias_name="n_filled")))
