"""Training-side metrics (AG7, reference ``train_layoutlm.py:167-183``).

``token_accuracy``: fraction of non-masked tokens whose predicted label
id equals the gold id; positions with gold ``-100`` are excluded (the
HF convention for padded / non-first subtokens). The reference computes
it inside the Trainer's eval loop over in-memory logits; here it is the
streaming corpus shape: a vectorized per-batch partial
``(correct, total)`` inside ``map_batches``, then one tiny global sum —
no logits matrix ever materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

IGNORE_INDEX = -100


def token_accuracy_partials(batch: pa.Table, labels_column: str = "labels",
                            preds_column: str = "predictions") -> pa.Table:
    """Per-batch partial: one row ``(correct, total)``."""
    lab = batch[labels_column].combine_chunks() if isinstance(batch[labels_column], pa.ChunkedArray) else batch[labels_column]
    pred = batch[preds_column].combine_chunks() if isinstance(batch[preds_column], pa.ChunkedArray) else batch[preds_column]
    lv = np.asarray(lab.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
    pv = np.asarray(pred.flatten().to_numpy(zero_copy_only=False), dtype=np.int64)
    if len(lv) != len(pv):
        raise ValueError(
            f"labels/predictions are misaligned: {len(lv)} vs {len(pv)} tokens")
    keep = lv != IGNORE_INDEX
    total = int(keep.sum())
    correct = int((lv[keep] == pv[keep]).sum())
    return pa.table({"correct": pa.array([correct], pa.int64()),
                     "total": pa.array([total], pa.int64())})


def token_accuracy(ds, labels_column: str = "labels",
                   preds_column: str = "predictions") -> pd.DataFrame:
    """Corpus token accuracy: ``{"token_accuracy": float, "n_tokens": int}``
    (one-row DataFrame). ``correct/total if total else 0.0`` exactly as
    the reference's ``_compute_metrics``."""
    import functools

    partials = ds.select_columns([labels_column, preds_column]).map_batches(
        functools.partial(token_accuracy_partials, labels_column=labels_column,
                          preds_column=preds_column),
        batch_format="pyarrow")
    agg = partials.sum(["correct", "total"])
    correct = agg["sum(correct)"] or 0
    total = agg["sum(total)"] or 0
    return pd.DataFrame({
        "token_accuracy": pd.array([correct / total if total else 0.0],
                                   dtype="float64"),
        "n_tokens": pd.array([total], dtype="int64"),
    })
