"""Benchmark decontamination: drop (or flag) training documents that
share any k-token shingle with an evaluation set — the standard
eval-leakage guard in LLM training-data pipelines (the GPT-3/PaLM-style
n-gram overlap rule).

Scale contract: the eval set is SMALL relative to the corpus (benchmark
suites: 10^3–10^5 docs → 10^6–10^7 shingles), so its shingle set is
built once on the driver and broadcast via ``ray.put`` — each
``map_batches`` task reads the one object-store copy per node; the
corpus itself streams with ZERO shuffle. Membership tests are C-level
set probes per token window. When the eval set outgrows a broadcast,
:func:`decontaminate_joined` is the shuffle fallback — shingle-level
``hash_join``, equivalence-tested against the broadcast variant.

Tokenization is the whitespace contract shared with
``doc_token_stats``'s oracle (``regexp_split_to_array(trim(text),
'\\s+')``), so the operator is hash-exactly SQL-checkable.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np
import pyarrow as pa


def text_shingles(text: str, k: int = 5) -> List[str]:
    """Whitespace-token k-shingles as strings (< k tokens → none)."""
    toks = (text or "").split()
    return [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]


def eval_shingle_set(texts: Iterable[str], k: int = 5) -> frozenset:
    """Driver-side: the eval corpus' distinct k-shingle set."""
    out = set()
    for t in texts:
        out.update(text_shingles(t, k))
    return frozenset(out)


def decontaminate(ds, eval_shingles: frozenset, k: int = 5,
                  column: str = "text", id_column: str = "doc_id",
                  drop: bool = False):
    """Flag (or with ``drop=True`` remove) training docs sharing any
    k-shingle with the eval set. Adds ``contaminated`` (bool) and
    ``n_hits`` (int64 — number of shingle positions that hit)."""
    import ray

    ref = ray.put(eval_shingles)

    def _flag(t: pa.Table) -> pa.Table:
        sset = ray.get(ref)
        texts = t[column].to_pylist()
        hits = np.zeros(len(texts), np.int64)
        for i, txt in enumerate(texts):
            hits[i] = sum(1 for sh in text_shingles(txt, k) if sh in sset)
        out = (t.append_column("contaminated", pa.array(hits > 0))
                .append_column("n_hits", pa.array(hits)))
        if drop:
            out = out.filter(pa.array(hits == 0))
        return out

    return ds.map_batches(_flag, batch_format="pyarrow")


def _shingle_hash_batch(t: pa.Table, k: int, id_column: str,
                        column: str, distinct: bool) -> pa.Table:
    """Docs → (doc_id?, shash) shingle-hash rows (siphash64 of the
    shingle string — the same fixed-key family the line dedup uses)."""
    import pandas as pd

    ids, hashes = [], []
    for i, txt in zip(t[id_column].to_pylist() if id_column else
                      range(t.num_rows), t[column].to_pylist()):
        sh = text_shingles(txt, k)
        if distinct:
            sh = set(sh)
        h = pd.util.hash_pandas_object(pd.Series(list(sh)),
                                       index=False).to_numpy() \
            if sh else np.empty(0, np.uint64)
        hashes.append(h.view(np.int64))
        ids.extend([i] * len(h))
    flat = (np.concatenate(hashes) if hashes else np.empty(0, np.int64))
    cols = {"shash": pa.array(flat)}
    if id_column:
        cols = {id_column: pa.array(np.asarray(ids, dtype=np.int64)), **cols}
    return pa.table(cols)


def decontaminate_joined(train_ds, eval_ds, k: int = 5,
                         column: str = "text", id_column: str = "doc_id",
                         num_buckets: int = 32):
    """The SHUFFLE fallback for :func:`decontaminate` when the eval set
    outgrows a broadcast: both sides explode to shingle-hash rows
    (eval side distinct), a partitioned ``hash_join`` on the 64-bit
    shingle hash finds overlaps, and a tiny per-doc count groupby
    yields the same ``(doc_id, contaminated, n_hits)`` contract.

    64-bit shingle hashing makes a false hit ~2^-64 per pair — the same
    residual every LSH fused key in this repo documents. Position
    multiplicity is preserved on the train side (each shingle POSITION
    counts once, like the broadcast variant)."""
    import functools
    import pandas as pd
    from ray.data.aggregate import Sum
    from .join import hash_join

    train_sh = train_ds.map_batches(
        functools.partial(_shingle_hash_batch, k=k, id_column=id_column,
                          column=column, distinct=False),
        batch_format="pyarrow")
    eval_sh = (eval_ds.map_batches(
        functools.partial(_shingle_hash_batch, k=k, id_column=None,
                          column=column, distinct=True),
        batch_format="pyarrow")
        # distinct per batch above; global distinct so a shingle seen in
        # many eval docs still counts each train position exactly once
        .groupby("shash").count()
        .map_batches(lambda t: t.select(["shash"]), batch_format="pyarrow"))

    hits = hash_join(train_sh, eval_sh, key="shash",
                     num_buckets=num_buckets)

    def per_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        g = t.group_by(id_column).aggregate([(id_column, "count")])
        return pa.table({id_column: g[id_column],
                         "n_hits": pc.cast(g[f"{id_column}_count"],
                                           pa.int64())})

    counts_ds = (hits.map_batches(per_doc, batch_format="pyarrow")
                 .groupby(id_column)
                 .aggregate(Sum("n_hits", alias_name="n_hits")))

    # contaminated-doc count scales with the dup rate, so the counts go
    # back through a distributed LEFT join, never a driver-side lookup
    joined = hash_join(train_ds, counts_ds, key=id_column, how="left",
                       num_buckets=num_buckets)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_hits"].fillna(0).astype("int64")
        df = df.drop(columns=["n_hits"])
        df["contaminated"] = (n > 0).to_numpy()
        df["n_hits"] = n.to_numpy()
        return df

    return joined.map_batches(finish, batch_format="pandas")
