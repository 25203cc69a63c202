"""A5 — model fine-tuning, Ray-Data-native (reference
``train_layoutlm.py:212-321``).

The reference fine-tunes LayoutLMv3 with the HF Trainer on the
dataset-builder JSONL. This container has no torch, and a faithful port
would be Ray Train territory anyway — so the engine ships the same
*training pipeline shape* on a model it can own end-to-end: a linear
softmax token classifier over deterministic features (normalized bbox
geometry + hashed-token buckets — the same inputs LayoutLM embeds),
trained by synchronous data-parallel full-batch gradient descent:

    examples (materialized once; at 100 TB: checkpointed parquet)
      └─ per epoch: map_batches(per-doc gradients, QUANTIZED int64)
      └─ tiny partial-row reduce → driver updates W → ray.put(W)
      └─ final map_batches metrics pass → loss + token_accuracy

**Bit-exact determinism under any parallelism** is the design point:
per-document float64 gradients are quantized to int64 fixed-point
(``scale``) *before* summation, so the global sum is an integer sum —
associative and order-independent — no matter how Ray splits blocks.
The same property makes the result verifiable by a sequential oracle
(tools/gen_oracle_expected.py) and reproducible across cluster sizes,
which floating-point AllReduce is not.

The per-epoch driver step handles ~``C×d`` integers per block — KBs.
Everything heavy (features, matmuls) runs inside ``map_batches``.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import token_hash64

# fixed label vocabulary (reference label space, train_layoutlm.py /
# dataset_builder.py: OTHER + {HEADER,BODY}_COL_0..5)
LABEL2ID: Dict[str, int] = {"OTHER": 0}
for _p in ("HEADER", "BODY"):
    for _i in range(6):
        LABEL2ID[f"{_p}_COL_{_i}"] = len(LABEL2ID)
N_CLASSES = len(LABEL2ID)

N_GEOM = 7          # bias, x1, y1, x2, y2, w, h (bboxes are 0-1000)
DEFAULT_BUCKETS = 32
SCALE = float(1 << 20)          # fixed-point gradient quantization


def _doc_features(words: List[str], bboxes: List[List[int]],
                  n_buckets: int) -> np.ndarray:
    """(n_tokens × d) float64 feature matrix for one document."""
    n = len(words)
    d = N_GEOM + n_buckets
    X = np.zeros((n, d), np.float64)
    X[:, 0] = 1.0
    if n:
        bb = np.asarray(bboxes, np.float64).reshape(n, 4) / 1000.0
        X[:, 1:5] = bb
        X[:, 5] = bb[:, 2] - bb[:, 0]
        X[:, 6] = bb[:, 3] - bb[:, 1]
        for i, w in enumerate(words):
            X[i, N_GEOM + token_hash64((w or "").lower()) % n_buckets] = 1.0
    return X


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


def _doc_arrays(batch: pa.Table):
    words = batch["words"].to_pylist()
    bboxes = batch["bboxes"].to_pylist()
    labels = batch["labels"].to_pylist()
    return words, bboxes, labels


def grad_partials_batch(batch: pa.Table, w_ref, n_buckets: int) -> pa.Table:
    """One partial row per batch: int64 quantized (grad, loss, n).

    Quantization happens PER DOCUMENT, then integer-sums within the
    batch — the global epoch gradient is therefore identical for every
    possible block layout."""
    import ray
    W = ray.get(w_ref)                      # (C × d) float64
    gsum = np.zeros(W.size, np.int64)
    loss_q = 0
    n_tok = 0
    for words, bboxes, labels in zip(*_doc_arrays(batch)):
        if not words:
            continue
        X = _doc_features(words, bboxes, n_buckets)
        y = np.fromiter((LABEL2ID.get(l, 0) for l in labels),
                        np.int64, count=len(labels))
        P = _softmax(X @ W.T)
        loss = -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum()
        P[np.arange(len(y)), y] -= 1.0
        G = P.T @ X                          # (C × d)
        gsum += np.round(G.reshape(-1) * SCALE).astype(np.int64)
        loss_q += int(round(loss * SCALE))
        n_tok += len(y)
    return pa.table({
        "grad": pa.array([gsum], pa.list_(pa.int64(), W.size)),
        "loss_q": pa.array([loss_q], pa.int64()),
        "n_tokens": pa.array([n_tok], pa.int64()),
    })


def metrics_batch(batch: pa.Table, w_ref, n_buckets: int) -> pa.Table:
    """Final-weights metrics partial: (correct, loss_q, n)."""
    import ray
    W = ray.get(w_ref)
    correct = 0
    loss_q = 0
    n_tok = 0
    for words, bboxes, labels in zip(*_doc_arrays(batch)):
        if not words:
            continue
        X = _doc_features(words, bboxes, n_buckets)
        y = np.fromiter((LABEL2ID.get(l, 0) for l in labels),
                        np.int64, count=len(labels))
        P = _softmax(X @ W.T)
        loss = -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum()
        correct += int((P.argmax(axis=1) == y).sum())
        loss_q += int(round(loss * SCALE))
        n_tok += len(y)
    return pa.table({
        "correct": pa.array([correct], pa.int64()),
        "loss_q": pa.array([loss_q], pa.int64()),
        "n_tokens": pa.array([n_tok], pa.int64()),
    })


def _reduce_partials(parts: pd.DataFrame, grad_size: Optional[int] = None):
    if grad_size is not None:
        if len(parts) == 0:
            return np.zeros(grad_size, np.int64), 0, 0
        g = np.sum(np.stack([np.asarray(v, np.int64)
                             for v in parts["grad"]]), axis=0)
        return g, int(parts["loss_q"].sum()), int(parts["n_tokens"].sum())
    return int(parts["loss_q"].sum()), int(parts["n_tokens"].sum())


def adamw_step(W: np.ndarray, m: np.ndarray, v: np.ndarray, g: np.ndarray,
               t: int, lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
               weight_decay: float = 0.0):
    """One decoupled-weight-decay Adam update (torch.optim.AdamW
    semantics: decay applied to W directly, not through the moments).
    Pure numpy so the driver can own optimizer state for any backend."""
    b1, b2 = betas
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    mhat = m / (1.0 - b1 ** t)
    vhat = v / (1.0 - b2 ** t)
    W = W * (1.0 - lr * weight_decay) - lr * mhat / (np.sqrt(vhat) + eps)
    return W, m, v


class _LinearGradWorker:
    """Step-sync shard: holds its contiguous slice of the (sorted)
    example list IN THE WORKER (pulled from block ObjectRefs — never via
    the driver) and serves per-minibatch quantized gradients.

    Global minibatch step s covers global doc indexes
    ``[s·B, (s+1)·B)``; the worker contributes the intersection with its
    own ``[base, base+len)`` range, so summing the int64 partials across
    workers IS the all-reduce — bit-identical to a sequential pass over
    the same minibatch (quantization per document, integer sum)."""

    def __init__(self, table_refs, n_buckets: int) -> None:
        import ray
        self._n_buckets = n_buckets
        docs: List = []
        for t in ray.get(list(table_refs)):
            for w, bb, lb in zip(t["words"].to_pylist(),
                                 t["bboxes"].to_pylist(),
                                 t["labels"].to_pylist()):
                docs.append((w, bb, lb))
        self._docs = docs
        self._base = 0

    def count(self) -> int:
        return len(self._docs)

    def set_base(self, base: int) -> None:
        self._base = int(base)

    def grad(self, W: np.ndarray, lo: int, hi: int):
        """Quantized (grad, loss_q, n_tokens) over global idx ∩ shard."""
        d = W.shape[1]
        gsum = np.zeros(W.size, np.int64)
        loss_q = 0
        n_tok = 0
        i0 = max(lo - self._base, 0)
        i1 = min(hi - self._base, len(self._docs))
        for i in range(i0, i1):
            words, bboxes, labels = self._docs[i]
            if not words:
                continue
            X = _doc_features(words, bboxes, self._n_buckets)
            y = np.fromiter((LABEL2ID.get(l, 0) for l in labels),
                            np.int64, count=len(labels))
            P = _softmax(X @ W.T)
            loss = -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum()
            P[np.arange(len(y)), y] -= 1.0
            G = P.T @ X
            gsum += np.round(G.reshape(-1) * SCALE).astype(np.int64)
            loss_q += int(round(loss * SCALE))
            n_tok += len(y)
        return gsum, loss_q, n_tok


def train_token_classifier_stepsync(examples_ds, n_epochs: int = 2,
                                    lr: float = 0.05,
                                    global_batch_size: int = 32,
                                    n_shards: int = 4,
                                    n_buckets: int = DEFAULT_BUCKETS,
                                    weight_decay: float = 0.0,
                                    return_weights: bool = False):
    """Gradient-synchronous minibatch AdamW (HF-Trainer step semantics,
    reference ``train_layoutlm.py:284-298``), data-parallel.

    Unlike :func:`train_token_classifier` (full-batch GD) and FedAvg
    (``finetune.py`` — epochs-then-average, NOT step-equivalent), every
    optimizer step here sees the all-reduced gradient of ONE global
    minibatch: shards are contiguous slices of the doc_id-sorted example
    list held by persistent Ray actors (the Dataset API cannot express
    lockstep iteration — the one sanctioned raw-actor case); per step
    the driver sums the shards' int64 fixed-point partials (associative
    → bit-identical to a sequential pass over the same minibatches) and
    applies :func:`adamw_step`.

    Scale shape: per step the wire carries n_shards × |W| int64 up and
    |W| float64 down — independent of corpus size; documents never move
    after the initial shard assignment. At 10^9+ params swap the driver
    reduce for a tree/collective all-reduce; the quantization contract
    is unchanged.
    """
    import pyarrow.compute as pc
    import ray

    ex = (examples_ds
          .map_batches(lambda t: t.filter(pc.equal(t["error"], "")),
                       batch_format="pyarrow")
          .select_columns(["doc_id", "words", "bboxes", "labels"])
          .sort("doc_id")            # deterministic global minibatch order
          .materialize())
    n_total = ex.count()
    n_shards = max(1, min(int(n_shards), max(1, n_total)))
    Worker = ray.remote(_LinearGradWorker)
    actors = []
    for split in ex.split(n_shards, equal=False):
        refs = split.to_arrow_refs()      # block refs only — no driver pull
        actors.append(Worker.remote(refs, n_buckets))
    counts = ray.get([a.count.remote() for a in actors])
    base = 0
    for a, c in zip(actors, counts):
        ray.get(a.set_base.remote(base))
        base += c
    n_docs = base

    d = N_GEOM + n_buckets
    W = np.zeros((N_CLASSES, d), np.float64)
    m = np.zeros(W.size, np.float64)
    v = np.zeros(W.size, np.float64)
    B = max(1, int(global_batch_size))
    n_steps = (n_docs + B - 1) // B
    t = 0
    initial_loss = None
    for _ in range(max(1, int(n_epochs))):
        for s in range(n_steps):
            lo, hi = s * B, min((s + 1) * B, n_docs)
            w_step = ray.put(W)      # broadcast once per step, not per shard
            parts = ray.get([a.grad.remote(w_step, lo, hi) for a in actors])
            g_q = np.sum([p[0] for p in parts], axis=0)
            loss_q = sum(p[1] for p in parts)
            n_tok = sum(p[2] for p in parts)
            if n_tok == 0:
                continue
            if initial_loss is None:
                initial_loss = loss_q / SCALE / n_tok
            t += 1
            g = (g_q.astype(np.float64) / SCALE / n_tok)
            W_flat, m, v = adamw_step(W.reshape(-1), m, v, g, t, lr,
                                      weight_decay=weight_decay)
            W = W_flat.reshape(W.shape)

    w_ref = ray.put(W)
    mparts = ex.map_batches(
        functools.partial(metrics_batch, w_ref=w_ref, n_buckets=n_buckets),
        batch_format="pyarrow").to_pandas()
    correct = int(mparts["correct"].sum())
    loss_q, n_tok = _reduce_partials(mparts)
    out = pd.DataFrame({
        "n_examples": pd.array([n_docs], dtype="int64"),
        "n_tokens": pd.array([n_tok], dtype="int64"),
        "initial_loss": pd.array([initial_loss if initial_loss is not None
                                  else 0.0], dtype="float64"),
        "final_loss": pd.array([loss_q / SCALE / n_tok if n_tok else 0.0],
                               dtype="float64"),
        "token_accuracy": pd.array([correct / n_tok if n_tok else 0.0],
                                   dtype="float64"),
    })
    if return_weights:
        return out, W
    return out


def train_token_classifier(examples_ds, n_epochs: int = 4, lr: float = 2.0,
                           n_buckets: int = DEFAULT_BUCKETS) -> pd.DataFrame:
    """Synchronous data-parallel full-batch GD; returns one row
    ``(n_examples, n_tokens, initial_loss, final_loss, token_accuracy)``
    (losses/accuracy are per-token means at W₀ and W_final).

    ``examples_ds`` is the dataset-builder output; errored docs are
    dropped. The examples Dataset is materialized (consumed once per
    epoch + once for metrics); at corpus scale checkpoint it to parquet
    instead — the loop shape is unchanged."""
    import pyarrow.compute as pc
    import ray

    ex = (examples_ds
          .map_batches(lambda t: t.filter(pc.equal(t["error"], "")),
                       batch_format="pyarrow")
          .select_columns(["doc_id", "words", "bboxes", "labels"])
          .materialize())
    d = N_GEOM + n_buckets
    W = np.zeros((N_CLASSES, d), np.float64)
    initial_loss = None
    for _ in range(n_epochs):
        w_ref = ray.put(W)
        parts = ex.map_batches(
            functools.partial(grad_partials_batch, w_ref=w_ref,
                              n_buckets=n_buckets),
            batch_format="pyarrow").to_pandas()
        g_q, loss_q, n_tok = _reduce_partials(parts, grad_size=W.size)
        if n_tok == 0:
            break
        if initial_loss is None:
            initial_loss = loss_q / SCALE / n_tok
        W = W - lr * (g_q.astype(np.float64) / SCALE / n_tok).reshape(W.shape)
    w_ref = ray.put(W)
    mparts = ex.map_batches(
        functools.partial(metrics_batch, w_ref=w_ref, n_buckets=n_buckets),
        batch_format="pyarrow").to_pandas()
    correct = int(mparts["correct"].sum())
    loss_q, n_tok = _reduce_partials(mparts)
    n_examples = ex.count()
    return pd.DataFrame({
        "n_examples": pd.array([n_examples], dtype="int64"),
        "n_tokens": pd.array([n_tok], dtype="int64"),
        "initial_loss": pd.array([initial_loss if initial_loss is not None
                                  else 0.0], dtype="float64"),
        "final_loss": pd.array([loss_q / SCALE / n_tok if n_tok else 0.0],
                               dtype="float64"),
        "token_accuracy": pd.array([correct / n_tok if n_tok else 0.0],
                                   dtype="float64"),
    })
