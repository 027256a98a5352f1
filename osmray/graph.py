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


def pagerank(edges_ds, src_col: str = "u", dst_col: str = "v",
             damping: float = 0.85, n_iters: int = 20):
    """PageRank by power iteration over a DIRECTED edge Dataset.

    Same shape as connected_components: the edge list streams through
    one ``map_batches`` per round emitting per-block partial
    contribution sums against the broadcast (nodes, rank, out-degree)
    arrays; the driver folds the bounded partials, adds the damping
    and dangling-mass terms, and iterates a fixed ``n_iters`` (the
    usual fixed-budget formulation). Returns (node, rank) as a
    pyarrow Table; ranks sum to 1 up to float round-off."""
    import ray

    def degs(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False)
        v = batch[dst_col].to_numpy(zero_copy_only=False)
        un, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "node": pa.array(np.concatenate([un, np.unique(v)])),
                "deg": pa.array(
                    np.concatenate([cnt, np.zeros(len(np.unique(v)), dtype=np.int64)])
                ),
            }
        )

    dd = edges_ds.map_batches(degs, batch_format="pyarrow").to_pandas()
    nodes, inv = np.unique(dd["node"].to_numpy(), return_inverse=True)
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, inv, dd["deg"].to_numpy())
    n = len(nodes)
    rank = np.full(n, 1.0 / n)

    for _ in range(n_iters):
        ref = ray.put((nodes, rank / np.maximum(deg, 1)))

        def contribs(batch: pa.Table) -> pa.Table:
            nd, share = ray.get(ref)
            u = batch[src_col].to_numpy(zero_copy_only=False)
            v = batch[dst_col].to_numpy(zero_copy_only=False)
            s = share[np.searchsorted(nd, u)]
            order = np.argsort(v, kind="stable")
            vs = v[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(vs)) + 1))
            return pa.table(
                {
                    "node": pa.array(vs[bounds]),
                    "c": pa.array(np.add.reduceat(s[order], bounds)),
                }
            )

        parts = edges_ds.map_batches(contribs, batch_format="pyarrow").to_pandas()
        acc = np.zeros(n)
        np.add.at(acc, np.searchsorted(nodes, parts["node"].to_numpy()), parts["c"].to_numpy())
        dangling = rank[deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    return pa.table({"node": pa.array(nodes), "rank": pa.array(rank)})
