"""Distributed graph connectivity over edge Datasets.

:func:`connected_components` implements hash-min label propagation —
the standard distributed CC algorithm (HCC, Kang et al., ICDM'09;
Pregel-style min-label flooding). Each iteration joins the current
label table onto the doubled adjacency by node, floods every node's
label to its neighbors, and a groupby-min keeps the smallest label
ever seen per node. Labels are monotonically non-increasing and
bounded below by the component minimum, so the int64 *sum of labels*
is an exact fixpoint witness: iterate until the sum stops changing
(no float tolerance anywhere).

Why this shape at 100 TB:

- the adjacency is consumed once per iteration, streaming; it is never
  collected. The label table is O(n_nodes) rows and IS materialized
  between iterations — re-deriving it would replay the whole upstream
  chain each round (same checkpoint trade as functions/clustering.py).
- per iteration: one hash-partitioned join (functions.join.hash_join,
  the repo's explicit bucketed join) + one groupby-min whose shuffle is
  pre-shrunk by a per-batch partial min. Only two int64 scalars (label
  sum, node count) reach the driver per iteration.
- iteration count = O(graph diameter). Dedup/similarity graphs this
  engine feeds it (near-dup clusters, co-occurrence buckets) have small
  diameters; for adversarial long chains a pointer-jumping /
  large-star-small-star variant halves distances per round — documented
  here as the scale escape hatch, deliberately not the default because
  it doubles the per-round shuffles.

The reference has no graph operator; this is part of the
beyond-reference corpus layer (duplicate-cluster connectivity for
functions/dedup.py's pair output).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .join import hash_join


def _int64(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    arr = pc.cast(col, pa.int64())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def connected_components(edges, src: str = "src", dst: str = "dst",
                         max_iters: int = 64, num_buckets: int = 16):
    """Connected components of the undirected graph given by an edge
    Dataset. Returns a Dataset ``(node:int64, component:int64)`` where
    ``component`` is the minimum node id in the node's component.

    Nodes are exactly the ids appearing in ``edges`` (either endpoint);
    isolated nodes never enter the edge list, so callers who need them
    union ``(node, node)`` rows afterwards. Duplicate and self-loop
    edges are harmless (min is idempotent), so no global edge dedup is
    performed — per-batch dedup inside the adjacency kernel is a pure
    shuffle-size optimization.
    """
    from ray.data.aggregate import Min, Sum

    def to_adj(t: pa.Table) -> pa.Table:
        # doubled adjacency, deduped within the batch only
        s, d = _int64(t[src]), _int64(t[dst])
        node = pa.concat_arrays([s, d])
        nbr = pa.concat_arrays([d, s])
        both = pa.table({"node": node, "nbr": nbr})
        return both.group_by(["node", "nbr"]).aggregate([]).select(
            ["node", "nbr"])

    adj = edges.map_batches(to_adj, batch_format="pyarrow")

    def seed(t: pa.Table) -> pa.Table:
        # init fused with iteration 0: each endpoint proposes both ids
        node = pa.concat_arrays(
            [t["node"].combine_chunks(), t["node"].combine_chunks(),
             t["nbr"].combine_chunks()])
        lbl = pa.concat_arrays(
            [t["node"].combine_chunks(), t["nbr"].combine_chunks(),
             t["nbr"].combine_chunks()])
        g = pa.table({"node": node, "lbl": lbl}).group_by("node").aggregate(
            [("lbl", "min")])
        return pa.table({"node": g["node"], "lbl": g["lbl_min"]})

    def min_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("lbl", "min")])
        return pa.table({"node": g["node"], "lbl": g["lbl_min"]})

    labels = (adj.map_batches(seed, batch_format="pyarrow")
              .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
              .materialize())
    if labels.count() == 0:
        return labels
    prev_sum = labels.aggregate(Sum("lbl", alias_name="s"))["s"]

    for _ in range(max_iters):
        joined = hash_join(adj, labels, key="node",
                           num_buckets=num_buckets, how="inner")

        def flood(b) -> pa.Table:
            # label flows across the edge to the neighbor; keep the
            # node's own label too so min never regresses
            node = pa.concat_arrays(
                [pa.array(b["nbr"].to_numpy(), type=pa.int64()),
                 pa.array(b["node"].to_numpy(), type=pa.int64())])
            lbl_np = b["lbl"].to_numpy()
            lbl = pa.concat_arrays(
                [pa.array(lbl_np, type=pa.int64()),
                 pa.array(lbl_np, type=pa.int64())])
            return min_partial(pa.table({"node": node, "lbl": lbl}))

        labels = (joined.map_batches(flood, batch_format="pandas")
                  .groupby("node").aggregate(Min("lbl", alias_name="lbl"))
                  .materialize())
        cur_sum = labels.aggregate(Sum("lbl", alias_name="s"))["s"]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "iterations — graph diameter exceeds the bound; raise "
            "max_iters or switch to the pointer-jumping variant")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "component": t["lbl"]})

    return labels.map_batches(rename, batch_format="pyarrow")
