"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put``; each batch computes a numpy matmul
  and emits only its per-batch top-k candidates (k × n_queries rows per
  batch, not the batch itself), which a final tiny ``groupby(query_id)``
  reduces. Nothing materializes the corpus.
- :func:`knn_ivf` — IVF scale path: k-means centroids fit on a driver
  sample, broadcast; each batch keeps only vectors whose nearest
  centroid is among the queries' ``n_probe`` probed cells, then
  brute-forces that (much smaller) subset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _mat(col, dtype=np.float32) -> np.ndarray:
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(col)
    flat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=dtype)
    return flat.reshape(n, -1)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_batch(t: pa.Table, q_ref, k: int, id_column: str, vec_column: str) -> pa.Table:
    import ray
    if t.num_rows == 0:
        # empty block (e.g. knn_ivf filtered every row out): emit the
        # (query_id, id, score) schema so downstream unification holds
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            id_column: pa.chunked_array([], t.schema.field(id_column).type),
            "score": pa.array([], pa.float64()),
        })
    q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref  # (nq, dim) unit rows
    mat = _unit(_mat(t[vec_column]).astype(np.float64))
    sims = mat @ q.T                                  # (n, nq)
    n, nq = sims.shape
    kk = min(k, n)
    ids = t[id_column].combine_chunks() if isinstance(t[id_column], pa.ChunkedArray) else t[id_column]
    # per-query partial top-k within this batch
    part = np.argpartition(-sims, kk - 1, axis=0)[:kk]           # (kk, nq)
    qcol = np.repeat(np.arange(nq, dtype=np.int64), kk)
    vidx = part.T.reshape(-1)
    return pa.table({
        "query_id": pa.array(qcol),
        id_column: ids.take(pa.array(vidx)),
        "score": pa.array(sims[vidx, qcol]),
    })


def _final_topk(g: pd.DataFrame, k: int, id_column: str) -> pd.DataFrame:
    g = g.sort_values(["score", id_column], ascending=[False, True], kind="mergesort").head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g


def knn_bruteforce(ds, queries: np.ndarray, k: int = 10,
                   id_column: str = "vec_id", vec_column: str = "embedding"):
    """Exact cosine top-k of each query row against the whole dataset.

    Returns a Dataset ``(query_id, {id_column}, score, rank)``; ties
    broken by ascending id (deterministic).
    """
    import functools
    import ray

    qm = _unit(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qm)
    partial = ds.select_columns([id_column, vec_column]).map_batches(
        functools.partial(_topk_batch, q_ref=q_ref, k=k,
                          id_column=id_column, vec_column=vec_column),
        batch_format="pyarrow",
    )
    return partial.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k, id_column=id_column),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate variant

def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 3) -> np.ndarray:
    """Tiny Lloyd's k-means on a driver-side SAMPLE (unit vectors)."""
    rng = np.random.default_rng(seed)
    sample = _unit(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
            n_probe: int = 4, sample_size: int = 2000, seed: int = 3,
            id_column: str = "vec_id", vec_column: str = "embedding"):
    """IVF-flat ANN: probe ``n_probe`` nearest cells per query.

    The centroid model is fit on ``ds.random_sample`` (bounded driver
    memory) and broadcast; the filter runs inside ``map_batches`` so the
    corpus streams. Approximate: recall < 1 when a true neighbor lives
    in an unprobed cell.
    """
    import functools
    import ray
    import pandas as pd

    n_total = ds.count()
    frac = min(1.0, 1.25 * sample_size / max(n_total, 1))
    thr = np.uint64(int(frac * 2**64)) if frac < 1.0 else np.uint64(2**64 - 1)

    def _hash_sample(b: pd.DataFrame) -> pd.DataFrame:
        # CONTENT-hash sample (not random_sample): the kept set is a pure
        # function of the ids — same centroids on any block layout /
        # cluster size, and reproducible outside Ray for the oracle
        h = pd.util.hash_pandas_object(b[id_column], index=False).to_numpy()
        keep = h <= thr if frac < 1.0 else np.ones(len(b), bool)
        return b[keep]

    sample_df = (ds.select_columns([id_column, vec_column])
                 .map_batches(_hash_sample, batch_format="pandas")
                 .to_pandas())
    sample_df = sample_df.sort_values(id_column).head(sample_size)
    sample = np.stack([np.asarray(v, dtype=np.float64)
                       for v in sample_df[vec_column]])
    cent = kmeans_fit(sample, n_clusters, seed=seed)

    qm = _unit(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]      # (nq, n_probe)
    probe_set = np.unique(probed)
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe_set)
    q_ref = ray.put(qm)

    def _filter_probed(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ps = ray.get(probe_ref)
        mat = _unit(_mat(t[vec_column]).astype(np.float64))
        cell = np.argmax(mat @ c.T, axis=1)
        mask = np.isin(cell, ps)
        return t.filter(pa.array(mask))

    candidates = ds.select_columns([id_column, vec_column]).map_batches(
        _filter_probed, batch_format="pyarrow")
    partial = candidates.map_batches(
        functools.partial(_topk_batch, q_ref=q_ref, k=k,
                          id_column=id_column, vec_column=vec_column),
        batch_format="pyarrow",
    )
    return partial.groupby("query_id").map_groups(
        functools.partial(_final_topk, k=k, id_column=id_column),
        batch_format="pandas",
    )
