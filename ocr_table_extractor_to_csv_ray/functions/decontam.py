"""Benchmark decontamination: drop (or flag) training documents that
share any k-token shingle with an evaluation set — the standard
eval-leakage guard in LLM training-data pipelines (the GPT-3/PaLM-style
n-gram overlap rule).

Scale contract: the eval set is SMALL relative to the corpus (benchmark
suites: 10^3–10^5 docs → 10^6–10^7 shingles), so its shingle set is
built once on the driver and broadcast via ``ray.put`` — each
``map_batches`` task reads the one object-store copy per node; the
corpus itself streams with ZERO shuffle. Membership tests are C-level
set probes per token window. If the eval set ever outgrew a broadcast,
the fallback is a shingle-level ``hash_join`` — not needed at any sane
eval-set size.

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
