"""Distributed iterative graph computation: connected components by
min-label propagation with pointer jumping.

Dataflow per round: the EDGE LIST (the big side — it streams, never
materializes) goes through one ``map_batches`` that emits per-block
partial (node, min incoming label) rows against the broadcast label
array; the driver folds the bounded partials and then pointer-jumps
(label <- label[label], halving propagation depth each round, so
rounds ~ log(diameter) instead of diameter). State is the label
table only — bounded like the engine's other broadcast sides
(painted sets, centroids); for node sets too large to broadcast the
same rounds compose from ``joins.large_join`` at two shuffles per
round (documented trade).

Convergence is exact: the sum of labels strictly decreases until the
fixpoint, so the loop stops the first round nothing changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def connected_components(edges_ds, src_col: str = "u", dst_col: str = "v",
                         max_rounds: int = 64):
    """Edge Dataset (undirected; each edge once is fine) ->
    pyarrow Table (node, comp) where comp is the component's minimum
    node id. Node ids must be nonnegative int64."""
    import ray

    # node universe + initial labels (one distributed pass)
    def nodes_of(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False)
        v = batch[dst_col].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([u, v])))})

    nodes = np.unique(
        edges_ds.map_batches(nodes_of, batch_format="pyarrow").to_pandas()["node"].to_numpy()
    )
    labels = nodes.copy()

    for _ in range(max_rounds):
        ref = ray.put((nodes, labels))

        def propagate(batch: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)
            u = batch[src_col].to_numpy(zero_copy_only=False)
            v = batch[dst_col].to_numpy(zero_copy_only=False)
            # both directions: min(label[u]) -> v and min(label[v]) -> u
            tgt = np.concatenate([v, u])
            lab = lb[np.searchsorted(nd, np.concatenate([u, v]))]
            order = np.argsort(tgt, kind="stable")
            ts = tgt[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(ts)) + 1))
            return pa.table(
                {
                    "node": pa.array(ts[bounds]),
                    "lab": pa.array(np.minimum.reduceat(lab[order], bounds)),
                }
            )

        parts = edges_ds.map_batches(propagate, batch_format="pyarrow").to_pandas()
        new = labels.copy()
        idx = np.searchsorted(nodes, parts["node"].to_numpy())
        np.minimum.at(new, idx, parts["lab"].to_numpy())
        # pointer jumping: follow label -> label-of-label until stable
        # (labels are always node ids, so the lookup is an index map)
        while True:
            jumped = np.minimum(new, new[np.searchsorted(nodes, new)])
            if (jumped == new).all():
                break
            new = jumped
        if (new == labels).all():
            break
        labels = new
    return pa.table({"node": pa.array(nodes), "comp": pa.array(labels)})
