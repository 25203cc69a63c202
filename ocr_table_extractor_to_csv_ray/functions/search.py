"""BM25 lexical search over a text column (beyond-reference — the
keyword-side retrieval primitive next to the embedding k-NN in
``similarity.py``; Robertson/Sparck-Jones BM25, public algorithm).

Three streaming passes, none materializing the corpus:

    1. corpus stats — (n_docs, total_tokens) partial sums → avgdl
    2. query-term document frequencies — the ``doc_freq`` kernel
       filtered to the query's terms (a handful of rows to the driver)
    3. scoring — per-batch vectorized term counts (dictionary-encode +
       bincount, no per-row Python), per-(doc,term) contribution
       QUANTIZED to int64 before the per-doc sum, per-batch partial
       top-k, one tiny final top-k group

The quantization makes the per-doc score an integer sum — associative,
so the result is independent of block layout AND bit-reproducible by
the driver's SQL oracle (floats summed in any order would not be). The
scoring formula is written with the exact same association order as
the oracle SQL: ``(((SCALE · idf) · tf) · (k1+1)) / (tf + k1·(1 − b +
b·(dl/avgdl)))``, floored.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SCALE = float(1 << 20)


def _split(text_col):
    trimmed = pc.utf8_trim_whitespace(text_col)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    return toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks


def _corpus_stats(ds, column: str):
    def partial(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(_split(t[column]))
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "tok": pa.array([pc.sum(lens).as_py() or 0], pa.int64())})
    parts = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()), int(parts["tok"].sum())


def _term_dfs(ds, column: str, terms: Sequence[str]) -> Dict[str, int]:
    from .textstats import doc_freq
    df_ds = doc_freq(ds, column=column, terms=terms)
    out = {t: 0 for t in terms}
    for row in df_ds.to_pandas().itertuples():
        out[row.token] = int(row.df)
    return out


def _score_batch(t: pa.Table, id_column: str, column: str,
                 terms: List[str], idf: np.ndarray, avgdl: float,
                 k1: float, b: float, k: int) -> pa.Table:
    toks = _split(t[column])
    n = len(toks)
    lens = pc.fill_null(toks.value_lengths(), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    term_arr = pa.array(terms)
    hit = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
    nt = len(terms)
    tf = np.zeros((n, nt), np.int64)
    if hit.any():
        hits = flat.filter(pa.array(hit))
        h_doc = doc_idx[hit]
        # map hit tokens to query-term index (tiny dictionary)
        t2i = {t: i for i, t in enumerate(terms)}
        h_term = np.fromiter((t2i[v] for v in hits.to_pylist()),
                             np.int64, count=len(hits))
        np.add.at(tf, (h_doc, h_term), 1)
    dl = lens.astype(np.float64)
    tfF = tf.astype(np.float64)
    denom = tfF + k1 * (1.0 - b + b * (dl[:, None] / avgdl))
    contrib = np.floor(((SCALE * idf[None, :]) * tfF) * (k1 + 1) / denom)
    score_q = np.where(tf > 0, contrib, 0.0).sum(axis=1).astype(np.int64)
    keep = score_q > 0
    ids = t[id_column].combine_chunks() if isinstance(t[id_column], pa.ChunkedArray) else t[id_column]
    kept_ids = ids.filter(pa.array(keep))
    kept_scores = score_q[keep]
    # per-batch partial top-k (score desc, id asc)
    if len(kept_scores) > k:
        kid = np.asarray(kept_ids.to_numpy(zero_copy_only=False))
        order = np.lexsort((kid, -kept_scores))[:k]
        kept_ids = kept_ids.take(pa.array(order.astype(np.int64)))
        kept_scores = kept_scores[order]
    return pa.table({
        "g": pa.array(np.zeros(len(kept_scores), np.int64)),
        id_column: kept_ids,
        "score_q": pa.array(kept_scores),
    })


def bm25_search(ds, terms: Sequence[str], k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                id_column: str = "doc_id", column: str = "text"):
    """Top-``k`` docs by BM25 over whitespace tokens; returns a Dataset
    ``(doc_id, score_q, rank)`` — ``score_q`` is the fixed-point
    integer score (scale 2^20). Ties break by ascending id."""
    import ray

    terms = list(dict.fromkeys(terms))      # dedupe, keep order
    n_docs, total = _corpus_stats(ds, column)
    avgdl = total / n_docs if n_docs else 1.0
    dfs = _term_dfs(ds, column, terms)
    idf = np.array([np.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                    for t in terms], np.float64)

    partial = ds.select_columns([id_column, column]).map_batches(
        functools.partial(_score_batch, id_column=id_column, column=column,
                          terms=terms, idf=idf, avgdl=avgdl,
                          k1=k1, b=b, k=k),
        batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_q", id_column], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[id_column, "score_q", "rank"]]

    return partial.groupby("g").map_groups(final, batch_format="pandas")
