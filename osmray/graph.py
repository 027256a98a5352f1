"""Distributed iterative graph computation (connected components by
min-label propagation, PageRank by power iteration) with TWO engines
behind one Dataset-returning API:

- ``broadcast`` — the edge list (the big side) streams through one
  ``map_batches`` per round emitting per-block partials against a
  broadcast O(V) label/rank array; the driver folds the bounded
  partials (CC additionally pointer-jumps: label <- label[label],
  halving propagation depth each round). State is one array of the
  node universe — right for graphs whose NODE table fits a broadcast
  (~1e8 ids), which is most derived graphs even at 100 TB of edges.
- ``shuffle`` — nothing O(V) ever lives on the driver: labels/ranks
  are themselves Datasets and every round composes from keyed
  ``Dataset.join`` + ``groupby().aggregate`` (hash-min with a
  self-join pointer jump for CC; join-share-sum rounds for PageRank).
  Per round the driver sees only O(1) scalars (the convergence
  witness / dangling mass). This is the 1e9+-node path; it costs
  2-3 shuffles per round, so prefer ``broadcast`` whenever V fits.

``mode="auto"`` picks by the node-universe bound (2 x edge count,
then the exact distinct count if that bound exceeds the cap) against
``broadcast_cap``. Both engines return ``(node, comp)`` /
``(node, rank)`` as a ``ray.data.Dataset`` so the result itself never
has to fit the driver.

CC convergence is exact under both engines: labels are elementwise
non-increasing, so the label SUM is a strictly decreasing witness
until fixpoint (the shuffle engine folds it as a per-round scalar
aggregate; the broadcast engine compares arrays directly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc


def _coalesce_edges(e, target_rows: int = 500_000):
    """Re-block a small materialized edge view into ~target_rows
    blocks. Block-LOCAL collapse (CC / DAG relaxation) only sees the
    chains a block actually holds: 64 blocks of ~100 edges each make
    every chain cross blocks once per hop and the round count
    degenerates back to the graph diameter (measured on the 120-task
    DAG demo: ~20 rounds of Ray job latency). At real scale blocks
    are already large, so this is a no-op there."""
    n = e.count()
    want = max(1, -(-n // target_rows))
    if e.num_blocks() > want * 2:
        return e.repartition(want).materialize()
    return e


def _edge_view(edges_ds, src_col: str, dst_col: str):
    """Normalize to int64 (u, v) columns."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": batch[src_col].cast(pa.int64()),
                "v": batch[dst_col].cast(pa.int64()),
            }
        )

    return edges_ds.map_batches(f, batch_format="pyarrow")


def _distinct_nodes(edges):
    """Dataset of distinct endpoint ids (per-block unique, then one
    keyed dedup shuffle via a vectorized Count aggregate)."""
    from ray.data.aggregate import Count

    def nodes_of(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([u, v])))})

    return (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["node"])
    )


def _pick_mode(edges, mode: str, broadcast_cap: int) -> str:
    if mode != "auto":
        return mode
    if 2 * edges.count() <= broadcast_cap:
        return "broadcast"
    if _distinct_nodes(edges).count() <= broadcast_cap:
        return "broadcast"
    return "shuffle"


def connected_components(edges_ds, src_col: str = "u", dst_col: str = "v",
                         max_rounds: int = 64, mode: str = "auto",
                         broadcast_cap: int = 50_000_000,
                         num_partitions: int = 16):
    """Edge Dataset (undirected; each edge once is fine) -> Dataset
    (node, comp) where comp is the component's minimum node id. Node
    ids must be nonnegative int64. ``mode``: "broadcast" | "shuffle" |
    "auto" (see module docstring)."""
    edges = _coalesce_edges(
        _edge_view(edges_ds, src_col, dst_col).materialize())
    eng = _pick_mode(edges, mode, broadcast_cap)
    if eng == "broadcast":
        return _cc_broadcast(edges, max_rounds)
    return _cc_shuffle(edges, max_rounds, num_partitions)


def _cc_broadcast(edges, max_rounds: int):
    import ray
    import ray.data

    def nodes_of(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([u, v])))})

    nodes = np.unique(
        edges.map_batches(nodes_of, batch_format="pyarrow").to_pandas()["node"].to_numpy()
    )
    labels = nodes.copy()

    converged = False
    for _ in range(max_rounds):
        ref = ray.put((nodes, labels))

        def propagate(batch: pa.Table) -> pa.Table:
            # collapse the block's LOCAL components in one shot
            # (vectorized fixpoint over local topology), then emit
            # each local component's min global label for every
            # member. One-hop-per-round propagation needs ~diameter
            # rounds — a Ray job each — on grid/snake graphs
            # (measured: >64 rounds, i.e. silent WRONG labels, on a
            # 207k-pixel blob canvas); local collapse cuts rounds to
            # the BLOCK-graph diameter.
            nd, lb = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            if len(u) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "lab": pa.array([], pa.int64())})
            ids, loc = _min_label_fixpoint(u, v)
            glb = lb[np.searchsorted(nd, ids)]
            order = np.argsort(loc, kind="stable")
            ls = loc[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(ls)) + 1))
            mins = np.minimum.reduceat(glb[order], bounds)
            # scatter each component's min back to every member
            comp_idx = np.cumsum(np.concatenate(
                ([0], (np.diff(ls) != 0).astype(np.int64))))
            out = np.empty(len(ids), glb.dtype)
            out[order] = mins[comp_idx]
            return pa.table({"node": pa.array(ids), "lab": pa.array(out)})

        parts = edges.map_batches(propagate, batch_format="pyarrow").to_pandas()
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
            converged = True
            break
        labels = new
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_rounds} rounds")
    import ray.data

    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "comp": pa.array(labels)})
    )


def _cc_shuffle(edges, max_rounds: int, num_partitions: int):
    """Hash-min rounds with a pointer-jump self-join; labels live as a
    Dataset end to end. Per round: 2 edge-label joins, one Min
    groupby, one label-label join, one O(1) scalar sum (the
    convergence witness)."""
    from ray.data.aggregate import Min

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"], "comp": batch["node"]})

    labels = (
        _distinct_nodes(edges)
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )
    prev_sum = None
    for _ in range(max_rounds):
        e1 = edges.join(labels, "inner", num_partitions, on=("u",), right_on=("node",))
        e2 = e1.join(
            labels, "inner", num_partitions, on=("v",), right_on=("node",),
            right_suffix="_v",
        )

        def candidates(batch: pa.Table) -> pa.Table:
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            m = np.minimum(
                batch["comp"].to_numpy(zero_copy_only=False),
                batch["comp_v"].to_numpy(zero_copy_only=False),
            )
            return pa.table(
                {
                    "node": pa.array(np.concatenate([u, v])),
                    "comp": pa.array(np.concatenate([m, m])),
                }
            )

        merged = (
            labels.union(e2.map_batches(candidates, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Min("comp", alias_name="comp"))
        )
        # pointer jump: comp <- comp[comp] (every comp value is a node
        # id, so the self-join is total under inner semantics)
        jumped = merged.join(
            merged, "inner", num_partitions, on=("comp",), right_on=("node",),
            right_suffix="_j",
        )

        def jump(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": batch["node"],
                    "comp": pa.array(
                        np.minimum(
                            batch["comp"].to_numpy(zero_copy_only=False),
                            batch["comp_j"].to_numpy(zero_copy_only=False),
                        )
                    ),
                }
            )

        labels = jumped.map_batches(jump, batch_format="pyarrow").materialize()
        s = labels.sum("comp")
        if s == prev_sum:
            return labels
        prev_sum = s
    raise RuntimeError(
        f"connected_components(shuffle): no fixpoint within {max_rounds} rounds")


def pagerank(edges_ds, src_col: str = "u", dst_col: str = "v",
             damping: float = 0.85, n_iters: int = 20, mode: str = "auto",
             broadcast_cap: int = 50_000_000, num_partitions: int = 16):
    """PageRank by power iteration over a DIRECTED edge Dataset ->
    Dataset (node, rank); ranks sum to 1 up to float round-off.
    Multi-edges contribute one share each (matching the dense
    adjacency-count formulation). ``mode`` as in
    ``connected_components``; the two engines agree to summation-order
    round-off (~1e-13)."""
    edges = _coalesce_edges(
        _edge_view(edges_ds, src_col, dst_col).materialize())
    eng = _pick_mode(edges, mode, broadcast_cap)
    if eng == "broadcast":
        return _pagerank_broadcast(edges, damping, n_iters)
    return _pagerank_shuffle(edges, damping, n_iters, num_partitions)


def _pagerank_broadcast(edges, damping: float, n_iters: int):
    import ray
    import ray.data

    def degs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        un, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {
                "node": pa.array(np.concatenate([un, np.unique(v)])),
                "deg": pa.array(
                    np.concatenate([cnt, np.zeros(len(np.unique(v)), dtype=np.int64)])
                ),
            }
        )

    dd = edges.map_batches(degs, batch_format="pyarrow").to_pandas()
    nodes, inv = np.unique(dd["node"].to_numpy(), return_inverse=True)
    deg = np.zeros(len(nodes), dtype=np.int64)
    np.add.at(deg, inv, dd["deg"].to_numpy())
    n = len(nodes)
    rank = np.full(n, 1.0 / n)

    for _ in range(n_iters):
        ref = ray.put((nodes, rank / np.maximum(deg, 1)))

        def contribs(batch: pa.Table) -> pa.Table:
            nd, share = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
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

        parts = edges.map_batches(contribs, batch_format="pyarrow").to_pandas()
        acc = np.zeros(n)
        np.add.at(acc, np.searchsorted(nodes, parts["node"].to_numpy()), parts["c"].to_numpy())
        dangling = rank[deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (acc + dangling / n)
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "rank": pa.array(rank)})
    )


def _pagerank_shuffle(edges, damping: float, n_iters: int, num_partitions: int):
    """Join-share-sum rounds; the (node, deg, rank) state is a Dataset
    end to end. Per round the driver sees one scalar (the dangling
    mass)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def deg_partials(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        un, cnt = np.unique(u, return_counts=True)
        return pa.table({"node": pa.array(un), "deg": pa.array(cnt)})

    def zero_deg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "deg": pa.array(np.zeros(len(batch), dtype=np.int64)),
            }
        )

    deg = (
        _distinct_nodes(edges)
        .map_batches(zero_deg, batch_format="pyarrow")
        .union(edges.map_batches(deg_partials, batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("deg", alias_name="deg"))
        .materialize()
    )
    n = deg.count()

    def init_rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.full(len(batch), 1.0 / n))
        )

    state = deg.map_batches(init_rank, batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        dangling = (
            state.map_batches(
                lambda t: t.filter(pc.equal(t["deg"], 0)), batch_format="pyarrow"
            ).sum("rank")
            or 0.0
        )
        joined = edges.join(
            state, "inner", num_partitions, on=("u",), right_on=("node",)
        )

        def share_partials(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False)
            s = batch["rank"].to_numpy(zero_copy_only=False) / np.maximum(
                batch["deg"].to_numpy(zero_copy_only=False), 1
            )
            order = np.argsort(v, kind="stable")
            vs = v[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(vs)) + 1))
            return pa.table(
                {
                    "node": pa.array(vs[bounds]),
                    "c": pa.array(np.add.reduceat(s[order], bounds)),
                }
            )

        def zero_c(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"node": batch["node"], "c": pa.array(np.zeros(len(batch)))}
            )

        acc = (
            state.map_batches(zero_c, batch_format="pyarrow")
            .union(joined.map_batches(share_partials, batch_format="pyarrow"))
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )
        rejoined = acc.join(
            deg, "inner", num_partitions, on=("node",), right_on=("node",)
        )

        def fold(batch: pa.Table) -> pa.Table:
            c = batch["c"].to_numpy(zero_copy_only=False)
            r = (1.0 - damping) / n + damping * (c + dangling / n)
            return pa.table(
                {"node": batch["node"], "deg": batch["deg"], "rank": pa.array(r)}
            )

        state = rejoined.map_batches(fold, batch_format="pyarrow").materialize()
    return state.select_columns(["node", "rank"])

def triangles(edges_ds, src_col: str = "u", dst_col: str = "v",
              num_buckets: int = 32, spill_root: str | None = None):
    """Exact triangle counting per minimum vertex — the classic
    two-join plan, fully distributed (no driver state):

    1. orient + dedup: every undirected edge becomes ``u < v`` exactly
       once (per-block unique packed keys, one keyed dedup shuffle);
       self-loops dropped. Vertex ids must fit int32.
    2. wedges: grace join E(a,b) x E(b,c) on the shared middle vertex
       -> ordered wedges a < b < c (osmray.joins.bucketed_join — the
       build side spills once, the probe shuffles once).
    3. close: grace SEMI join of wedge (a,c) keys against the edge
       key set; survivors are triangles, counted per ``a``.

    Each triangle a<b<c is counted exactly once (as the wedge through
    its middle vertex). Skew note: step 2's output is
    sum_b indeg(b)*outdeg(b); salt hot middle vertices upstream if a
    near-star graph must be processed. Returns (u, n_tri)."""
    from ray.data.aggregate import Count, Sum

    from osmray.joins import bucketed_join

    def orient(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = u != v
        u, v = u[sel], v[sel]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"ek": pa.array(np.unique((lo << 32) | hi))})

    # materialized: consumed four times (wedge build + probe via E,
    # close build, and schema resolution) — without this the dedup
    # groupby re-executes per consumer
    ekeys = (
        edges_ds.map_batches(orient, batch_format="pyarrow")
        .groupby("ek")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["ek"])
    ).materialize()

    def unpack(batch: pa.Table) -> pa.Table:
        ek = batch["ek"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(ek >> 32),
                         "b": pa.array(ek & 0xFFFFFFFF)})

    E = ekeys.map_batches(unpack, batch_format="pyarrow")
    # wedge join: left (a,b) probe on b against build (a,b) keyed by a
    wedges = bucketed_join(E, E, on="b", right_on="a",
                           num_buckets=num_buckets, spill_root=spill_root)
    # columns: a, b, a_r (== b), b_r (== c); wedge key (a, c)

    def wedge_key(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        c = batch["b_r"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(a), "ek": pa.array((a << 32) | c)})

    wk = wedges.map_batches(wedge_key, batch_format="pyarrow")
    closed = bucketed_join(wk, ekeys, on="ek", right_on="ek",
                           num_buckets=num_buckets, spill_root=spill_root)
    return (
        closed.map_batches(
            lambda t: pa.table({"u": t["a"],
                                "n": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow",
        )
        .groupby("u")
        .aggregate(Sum("n", alias_name="n_tri"))
    )


def bfs_hops(edges_ds, seeds_ds, src_col: str = "u", dst_col: str = "v",
             seed_col: str = "node", max_hops: int = 4,
             num_buckets: int = 16, broadcast_cap: int = 2_000_000):
    """Multi-source BFS: exact shortest hop count (<= max_hops) from
    any seed, over an undirected edge list. Pure shuffle engine — the
    frontier and distance tables are Datasets end-to-end, each round
    costs one grace semi-join (edges probed against the frontier, the
    keys-only side spilled) plus one keyed min-fold; the driver sees
    only the frontier count (early stop). BFS layering makes each
    node's hop final the round it is first discovered, so ``min`` is
    the fixpoint fold exactly as in the recursive-CTE SQL twin.

    Returns (node, hops) with hops in [0, max_hops]."""
    from ray.data.aggregate import Min

    from osmray.joins import bucketed_join

    e = _edge_view(edges_ds, src_col, dst_col)

    def undirect(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        keep = u != v
        return pa.table({
            "u": pa.array(np.concatenate((u[keep], v[keep]))),
            "v": pa.array(np.concatenate((v[keep], u[keep])))})

    e = e.map_batches(undirect, batch_format="pyarrow").materialize()

    def as_dist(hop: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch[seed_col if hop == 0 else "v"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            n = np.unique(n)
            return pa.table({"node": pa.array(n),
                             "hop": pa.array(np.full(len(n), hop,
                                                     dtype=np.int64))})
        return f

    dist = (seeds_ds.map_batches(as_dist(0), batch_format="pyarrow")
            .groupby("node").aggregate(Min("hop", alias_name="hop"))
            .materialize())

    for r in range(max_hops):
        frontier = dist.map_batches(
            lambda t, r=r: t.filter(_pc.equal(t["hop"], r)),
            batch_format="pyarrow").materialize()
        n_front = frontier.count()
        if n_front == 0:
            break
        if n_front <= broadcast_cap:
            # keys-only frontier fits a broadcast: ONE streaming
            # filter pass over the edges replaces the grace
            # semi-join's spill+probe jobs (same two-engine policy as
            # connected_components; the cap bounds driver memory)
            from osmray.joins import broadcast_filter

            keys = frontier.to_pandas()["node"].to_numpy()
            hit = broadcast_filter(e, "u", np.unique(keys))
        else:
            hit = bucketed_join(e, frontier.select_columns(["node"]),
                                on="u", right_on="node", how="semi",
                                num_buckets=num_buckets)
        nxt = hit.map_batches(as_dist(r + 1), batch_format="pyarrow")
        dist = (dist.union(nxt).groupby("node")
                .aggregate(Min("hop", alias_name="hop")).materialize())
    return dist


def sssp(edges_ds, seeds_ds, src_col: str = "u", dst_col: str = "v",
         w_col: str = "w", seed_col: str = "node", max_dist: int = 1 << 30,
         max_rounds: int = 256, num_buckets: int = 16,
         broadcast_cap: int = 2_000_000):
    """Weighted multi-source shortest paths over a DIRECTED edge list
    with positive integer weights — Bellman-Ford rounds as dataflow
    (the weighted sibling of ``bfs_hops``). Each round relaxes only
    edges leaving the frontier (nodes whose tentative distance
    improved last round): one frontier->edges join carrying the
    frontier distance (capped broadcast lookup under
    ``broadcast_cap``, grace ``bucketed_join`` above it — the same
    two-engine policy as CC/PageRank), then ONE keyed min-fold over
    union(dist, candidates). Improvement detection rides inside the
    fold: rows are packed as ``2*dist + tag`` (tag 1 = new candidate),
    so the per-node Min winner's low bit says whether a candidate
    STRICTLY beat the old distance (ties keep the old row, tag 0).
    Candidates above ``max_dist`` are dropped — the same bound that
    terminates the recursive-CTE SQL twin, and with weights >= 1 it
    also bounds the round count. Returns (node, dist), dist <=
    max_dist. The driver sees only the frontier count per round."""
    from ray.data.aggregate import Min

    from osmray.joins import bucketed_join

    import ray as _ray

    def eview(batch: pa.Table) -> pa.Table:
        return pa.table({"u": batch[src_col].cast(pa.int64()),
                         "v": batch[dst_col].cast(pa.int64()),
                         "w": batch[w_col].cast(pa.int64())})

    e = _coalesce_edges(
        edges_ds.map_batches(eview, batch_format="pyarrow").materialize())

    # broadcast-state engine when the NODE universe fits the cap:
    # ONE streaming edge pass per round (driver fold), vs ~4 keyed
    # jobs per round below — on bounded demo graphs the keyed loop is
    # pure Ray fixed-latency (measured: 90 s for a 4k-node graph at
    # ~24 rounds x 4 jobs; the broadcast engine runs it in ~1 job per
    # round). Same policy and cap semantics as CC/PageRank/bfs.
    if _pick_mode(e, "auto", broadcast_cap) == "broadcast":
        return _sssp_broadcast(e, seeds_ds, seed_col, max_dist, max_rounds)

    def seed_pack(batch: pa.Table) -> pa.Table:
        n = np.unique(batch[seed_col].to_numpy(
            zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(n),
                         "packed": pa.array(np.zeros(len(n), np.int64))})

    dist = (seeds_ds.map_batches(seed_pack, batch_format="pyarrow")
            .groupby("node").aggregate(Min("packed", alias_name="packed"))
            .materialize())
    frontier = dist  # round 0: every seed just "improved" (from inf)

    for _ in range(max_rounds):
        n_front = frontier.count()
        if n_front == 0:
            break
        if n_front <= broadcast_cap:
            # broadcast (node -> dist) as two sorted arrays; ONE
            # streaming pass over the edges does the lookup+relax
            fp = frontier.to_pandas()
            keys = fp["node"].to_numpy().astype(np.int64)
            vals = (fp["packed"].to_numpy().astype(np.int64) >> 1)
            order = np.argsort(keys)
            ref = _ray.put((keys[order], vals[order]))

            def relax_b(batch: pa.Table, *, _ref=ref) -> pa.Table:
                k, d = _ray.get(_ref)
                u = batch["u"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(k, u)
                pos_c = np.minimum(pos, len(k) - 1) if len(k) else pos
                hit = np.zeros(len(u), bool) if not len(k) else (
                    k[pos_c] == u)
                nd = np.where(hit, d[pos_c] if len(k) else 0, 0) + \
                    batch["w"].to_numpy(zero_copy_only=False)
                keep = hit & (nd <= max_dist)
                return pa.table({
                    "node": pa.array(batch["v"].to_numpy(
                        zero_copy_only=False)[keep]),
                    "packed": pa.array(2 * nd[keep] + 1)})

            cands = e.map_batches(relax_b, batch_format="pyarrow")
        else:
            j = bucketed_join(e, frontier, on="u", right_on="node",
                              num_buckets=num_buckets, how="inner")

            def relax_j(batch: pa.Table) -> pa.Table:
                nd = (batch["packed"].to_numpy(zero_copy_only=False) >> 1) \
                    + batch["w"].to_numpy(zero_copy_only=False)
                keep = nd <= max_dist
                return pa.table({
                    "node": pa.array(batch["v"].to_numpy(
                        zero_copy_only=False)[keep]),
                    "packed": pa.array(2 * nd[keep] + 1)})

            cands = j.map_batches(relax_j, batch_format="pyarrow")

        folded = (dist.union(cands).groupby("node")
                  .aggregate(Min("packed", alias_name="packed"))
                  .materialize())

        def strip(batch: pa.Table) -> pa.Table:
            p = batch["packed"].to_numpy(zero_copy_only=False)
            return pa.table({"node": batch["node"],
                             "packed": pa.array((p >> 1) * 2)})

        frontier = folded.map_batches(
            lambda t: t.filter(_pc.equal(
                _pc.bit_wise_and(t["packed"], 1), 1)),
            batch_format="pyarrow").materialize()
        dist = folded.map_batches(strip, batch_format="pyarrow").materialize()

    def unpack(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "dist": pa.array(batch["packed"].to_numpy(
                zero_copy_only=False) >> 1)})

    return dist.map_batches(unpack, batch_format="pyarrow")


def _sssp_broadcast(e, seeds_ds, seed_col: str, max_dist: int,
                    max_rounds: int):
    """Driver-state Bellman-Ford: the sorted node array + distance
    array broadcast each round; ONE map_batches pass over the edges
    emits per-block per-target min candidates; the driver folds and
    diffs for the next frontier. Output matches the keyed engine:
    only REACHED nodes, dist <= max_dist."""
    import ray
    import ray.data

    sp = seeds_ds.map_batches(
        lambda b: pa.table({"n": pa.array(np.unique(
            b[seed_col].to_numpy(zero_copy_only=False).astype(np.int64)))}),
        batch_format="pyarrow").to_pandas()["n"].to_numpy().astype(np.int64)
    # Union seeds into the node universe so an isolated seed (no
    # incident edges) is still emitted at dist 0, matching the keyed
    # engine, which returns the initial seed dataset as-is.
    nodes = np.unique(np.concatenate([
        e.map_batches(
            lambda b: pa.table({"n": pa.array(np.unique(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)])))}),
            batch_format="pyarrow").to_pandas()["n"].to_numpy(),
        sp])).astype(np.int64)
    INF = np.int64(1) << 60
    dist = np.full(len(nodes), INF, np.int64)
    spos = np.searchsorted(nodes, sp)
    dist[spos] = 0
    frontier = np.zeros(len(nodes), bool)
    frontier[spos] = True

    for _ in range(max_rounds):
        if not frontier.any():
            break
        ref = ray.put((nodes, dist, frontier))

        def relax(batch: pa.Table) -> pa.Table:
            nd_, d_, f_ = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            pu = np.searchsorted(nd_, u)
            keep = f_[pu]
            cand = d_[pu[keep]] + w[keep]
            sel = cand <= max_dist
            tgt = v[keep][sel]
            cand = cand[sel]
            if len(tgt) == 0:
                return pa.table({"n": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            order = np.argsort(tgt, kind="stable")
            ts = tgt[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(ts)) + 1))
            return pa.table({
                "n": pa.array(ts[bounds]),
                "d": pa.array(np.minimum.reduceat(cand[order], bounds))})

        parts = e.map_batches(relax, batch_format="pyarrow").to_pandas()
        new = dist.copy()
        if len(parts):
            np.minimum.at(new, np.searchsorted(nodes, parts["n"].to_numpy()),
                          parts["d"].to_numpy())
        frontier = new < dist
        dist = new

    reached = dist < INF
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes[reached]),
        "dist": pa.array(dist[reached])}))


def kcore(edges_ds, k: int = 2, src_col: str = "u", dst_col: str = "v",
          max_rounds: int = 12, mode: str = "auto",
          broadcast_cap: int = 50_000_000, num_partitions: int = 16):
    """k-core decomposition by iterative peeling: drop every node
    whose degree among SURVIVING nodes is < k, repeat to fixpoint;
    returns Dataset (node, deg) of the core with each node's degree
    inside it. Same two-engine policy as connected_components:
    ``broadcast`` streams edges against an O(V) alive/degree array
    per round; ``shuffle`` keeps the alive set as a Dataset and each
    round is two grace SEMI joins (both endpoints alive) + one keyed
    Count — nothing O(V) on the driver. Raises RuntimeError if the
    peeling hasn't converged in ``max_rounds`` (the SQL twins unroll
    a fixed round count, so non-convergence must be loud)."""
    edges = _coalesce_edges(
        _edge_view(edges_ds, src_col, dst_col).materialize())
    eng = _pick_mode(edges, mode, broadcast_cap)
    if eng == "broadcast":
        return _kcore_broadcast(edges, k, max_rounds)
    return _kcore_shuffle(edges, k, max_rounds, num_partitions)


def _kcore_broadcast(edges, k: int, max_rounds: int):
    import ray
    import ray.data

    def nodes_of(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.unique(np.concatenate([u, v])))})

    nodes = np.unique(
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .to_pandas()["node"].to_numpy())
    alive = np.ones(len(nodes), dtype=bool)

    for _ in range(max_rounds):
        ref = ray.put((nodes, alive))

        def degs(batch: pa.Table) -> pa.Table:
            nd, al = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            keep = al[np.searchsorted(nd, u)] & al[np.searchsorted(nd, v)]
            tgt = np.concatenate([u[keep], v[keep]])
            if len(tgt) == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())})
            order = np.argsort(tgt, kind="stable")
            ts = tgt[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(ts)) + 1))
            cnt = np.diff(np.concatenate((bounds, [len(ts)]))).astype(np.int64)
            return pa.table({"node": pa.array(ts[bounds]),
                             "cnt": pa.array(cnt)})

        parts = edges.map_batches(degs, batch_format="pyarrow").to_pandas()
        deg = np.zeros(len(nodes), dtype=np.int64)
        if len(parts):
            np.add.at(deg, np.searchsorted(nodes, parts["node"].to_numpy()),
                      parts["cnt"].to_numpy())
        new_alive = alive & (deg >= k)
        if (new_alive == alive).all():
            return ray.data.from_arrow(pa.table({
                "node": pa.array(nodes[alive]),
                "deg": pa.array(deg[alive])}))
        alive = new_alive
    raise RuntimeError(f"kcore: no fixpoint within {max_rounds} rounds")


def _kcore_shuffle(edges, k: int, max_rounds: int, num_partitions: int):
    import ray.data
    from ray.data.aggregate import Count

    from osmray.joins import bucketed_join

    def sym(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array(np.concatenate([u, v])),
                         "t": pa.array(np.concatenate([v, u]))})

    ee = edges.map_batches(sym, batch_format="pyarrow").materialize()
    alive = _distinct_nodes(edges).materialize()
    n_alive = alive.count()

    for _ in range(max_rounds):
        e1 = bucketed_join(ee, alive, on="s", right_on="node", how="semi")
        e2 = bucketed_join(e1, alive, on="t", right_on="node", how="semi")
        deg = e2.groupby("s").aggregate(Count(alias_name="deg"))

        def keep(batch: pa.Table) -> pa.Table:
            d = batch["deg"].to_numpy(zero_copy_only=False)
            sel = pa.array(d >= k)
            return pa.table({"node": batch["s"].filter(sel),
                             "deg": batch["deg"].filter(sel)})

        core = deg.map_batches(keep, batch_format="pyarrow").materialize()
        n_new = core.count()
        if n_new == n_alive:
            return core
        alive = core.select_columns(["node"]).materialize()
        n_alive = n_new
    raise RuntimeError(f"kcore: no fixpoint within {max_rounds} rounds")


# ---------------------------------------------------------------------------
# minimum spanning forest (Boruvka)
# ---------------------------------------------------------------------------

_WKEY_SHIFT = np.int64(1) << 32


def boruvka_mst(edges_ds, src_col: str = "u", dst_col: str = "v",
                w_col: str = "w", eid_col: str = "eid", mode: str = "auto",
                broadcast_cap: int = 2_000_000, max_rounds: int = 40,
                num_partitions: int = 16):
    """Minimum spanning forest by Boruvka rounds, under the module's
    two-engine policy. Edge weights are totally ordered by the packed
    key ``w * 2^32 + eid`` (requires 0 <= w < 2^30, 0 <= eid < 2^32),
    so the forest is UNIQUE and both engines — and a Kruskal replay,
    which the SQL twin uses — select the identical edge set. Returns
    the forest edges ``(eid, u, v, w)`` as a Dataset; self-loops are
    dropped.

    - broadcast: per round, the edge list streams through one
      map_batches emitting per-block per-component min-edge partials
      against the broadcast O(V) label array; the driver folds the
      bounded partials, merges components with vectorized min-label +
      pointer jumping, and accumulates the chosen edges (<= V-1
      total, bounded by the same cap that admitted the broadcast).
    - shuffle: nothing O(V) on the driver — labels are a Dataset;
      per round: two hash joins attach component labels, per-block
      partial min-edge candidates shuffle ONCE into a keyed Min, an
      equi-join on (comp, wkey) recovers the argmin payload, the
      chosen component graph contracts via the existing shuffle-mode
      connected_components, and a grace LEFT join relabels. Rounds
      <= log2(V) as always for Boruvka.
    """

    def view(batch: pa.Table) -> pa.Table:
        u = batch[src_col].cast(pa.int64())
        v = batch[dst_col].cast(pa.int64())
        keep = _pc.invert(_pc.equal(u, v))
        t = pa.table({
            "u": u, "v": v,
            "w": batch[w_col].cast(pa.int64()),
            "eid": batch[eid_col].cast(pa.int64()),
        }).filter(keep)
        wk = t["w"].to_numpy(zero_copy_only=False) * _WKEY_SHIFT + \
            t["eid"].to_numpy(zero_copy_only=False)
        return t.append_column("wkey", pa.array(wk))

    edges = edges_ds.map_batches(view, batch_format="pyarrow").materialize()
    if mode == "auto":
        mode = _pick_mode(edges, mode, broadcast_cap)
    if mode == "broadcast":
        return _mst_broadcast(edges, max_rounds)
    return _mst_shuffle(edges, max_rounds, num_partitions)


def _mst_partial_min(comp2, wk2, payload_cols):
    """First row per component by (comp, wkey) lexsort; payload_cols
    is a dict of equally-indexed arrays."""
    if len(comp2) == 0:
        out = {"c": comp2, "wkey": wk2}
        out.update(payload_cols)
        return pa.table({k: pa.array(np.asarray(v, np.int64))
                         for k, v in out.items()})
    order = np.lexsort((wk2, comp2))
    cs = comp2[order]
    bounds = np.concatenate(([0], np.flatnonzero(np.diff(cs)) + 1))
    sel = order[bounds]
    out = {"c": comp2[sel], "wkey": wk2[sel]}
    for name, arr in payload_cols.items():
        out[name] = arr[sel]
    return pa.table({k: pa.array(v) for k, v in out.items()})


def _mst_broadcast(edges, max_rounds: int):
    import ray
    import ray.data

    nodes = np.unique(
        edges.map_batches(
            lambda b: pa.table({"node": pa.array(np.unique(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)])))}),
            batch_format="pyarrow").to_pandas()["node"].to_numpy()
    )
    comp = nodes.copy()
    chosen = []

    for _ in range(max_rounds):
        ref = ray.put((nodes, comp))

        def cand(batch: pa.Table) -> pa.Table:
            nd, lb = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            cu = lb[np.searchsorted(nd, u)]
            cv = lb[np.searchsorted(nd, v)]
            keep = cu != cv
            if not keep.any():
                return pa.table({"c": pa.array([], pa.int64()),
                                 "wkey": pa.array([], pa.int64()),
                                 "eid": pa.array([], pa.int64()),
                                 "u": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "w": pa.array([], pa.int64()),
                                 "cu": pa.array([], pa.int64()),
                                 "cv": pa.array([], pa.int64())})
            wk = batch["wkey"].to_numpy(zero_copy_only=False)[keep]
            pay = {
                "eid": batch["eid"].to_numpy(zero_copy_only=False)[keep],
                "u": u[keep], "v": v[keep],
                "w": batch["w"].to_numpy(zero_copy_only=False)[keep],
                "cu": cu[keep], "cv": cv[keep],
            }
            comp2 = np.concatenate([cu[keep], cv[keep]])
            wk2 = np.concatenate([wk, wk])
            pay2 = {k: np.concatenate([a, a]) for k, a in pay.items()}
            return _mst_partial_min(comp2, wk2, pay2)

        parts = edges.map_batches(cand, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            break
        sel = _mst_partial_min(
            parts["c"].to_numpy(), parts["wkey"].to_numpy(),
            {k: parts[k].to_numpy() for k in ("eid", "u", "v", "w", "cu", "cv")})
        sp = sel.to_pandas()
        # distinct edges (an edge may be the min of both its sides)
        sp = sp.drop_duplicates("wkey")
        chosen.append(sp[["eid", "u", "v", "w", "cu", "cv"]])
        # merge: vectorized min-label union iterated with pointer
        # jumps to a WITHIN-round fixpoint. One minimum.at pass is
        # not enough: labels only flow downhill through pointers, so
        # a chain cu1-cv1-cu2 can leave the high endpoint stranded
        # (measured: re-chosen edges in the next round). The chosen
        # graph is a forest over <= #comps reps, driver-resident by
        # the same cap that admitted the broadcast engine.
        a = np.searchsorted(nodes, sp["cu"].to_numpy())
        b = np.searchsorted(nodes, sp["cv"].to_numpy())
        while True:
            m = np.minimum(comp[a], comp[b])
            before = comp.copy()
            np.minimum.at(comp, a, m)
            np.minimum.at(comp, b, m)
            while True:
                jumped = np.minimum(comp, comp[np.searchsorted(nodes, comp)])
                if (jumped == comp).all():
                    break
                comp = jumped
            if (comp == before).all():
                break

    import pandas as pd
    import ray.data

    if not chosen:
        return ray.data.from_arrow(pa.table({
            "eid": pa.array([], pa.int64()), "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}))
    out = pd.concat(chosen, ignore_index=True)[["eid", "u", "v", "w"]]
    return ray.data.from_pandas(out)


def _min_label_fixpoint(cu: np.ndarray, cv: np.ndarray):
    """Vectorized union of the (cu, cv) pair graph: min-label
    propagation iterated with pointer jumps to a fixpoint. Returns
    (ids, lab) — every distinct endpoint and its component's min id.
    Bounded by the pair-graph size, NOT the node universe."""
    ids = np.unique(np.concatenate([cu, cv]))
    lab = ids.copy()
    a = np.searchsorted(ids, cu)
    b = np.searchsorted(ids, cv)
    while True:
        before = lab.copy()
        m = np.minimum(lab[a], lab[b])
        np.minimum.at(lab, a, m)
        np.minimum.at(lab, b, m)
        while True:
            j = np.minimum(lab, lab[np.searchsorted(ids, lab)])
            if (j == lab).all():
                break
            lab = j
        if (lab == before).all():
            break
    return ids, lab


def _mst_shuffle(edges, max_rounds: int, num_partitions: int,
                 contract_cap: int = 200_000):
    """Keyed Boruvka rounds on grace joins (osmray.joins.bucketed_join)
    rather than Ray's native hash join: the chosen component graph
    SHRINKS geometrically, and native hash-join partitions that come
    up empty on the late small rounds crash pyarrow's join (zero-
    column left tables). The grace join is empty-safe at any size.
    Contraction of the per-round chosen graph (<= one edge per
    component, halving each round) runs driver-side under
    ``contract_cap`` and through the shuffle CC engine above it."""
    from ray.data.aggregate import Min

    from osmray.joins import bucketed_join

    labels = (
        _distinct_nodes(edges)
        .map_batches(lambda b: pa.table({"node": b["node"], "comp": b["node"]}),
                     batch_format="pyarrow")
        .materialize()
    )
    chosen_all = None

    for _ in range(max_rounds):
        e1 = bucketed_join(edges, labels, on="u", right_on="node",
                           num_buckets=num_partitions)
        lv = labels.map_batches(
            lambda b: pa.table({"nodev": b["node"], "compv": b["comp"]}),
            batch_format="pyarrow")
        e2 = bucketed_join(e1, lv, on="v", right_on="nodev",
                           num_buckets=num_partitions)

        def cand(batch: pa.Table) -> pa.Table:
            cu = batch["comp"].to_numpy(zero_copy_only=False)
            cv = batch["compv"].to_numpy(zero_copy_only=False)
            keep = cu != cv
            wk = batch["wkey"].to_numpy(zero_copy_only=False)[keep]
            pay = {k: batch[k].to_numpy(zero_copy_only=False)[keep]
                   for k in ("eid", "u", "v", "w")}
            pay["cu"] = cu[keep]
            pay["cv"] = cv[keep]
            comp2 = np.concatenate([cu[keep], cv[keep]])
            wk2 = np.concatenate([wk, wk])
            pay2 = {k: np.concatenate([a, a]) for k, a in pay.items()}
            return _mst_partial_min(comp2, wk2, pay2)

        cands = e2.map_batches(cand, batch_format="pyarrow").materialize()
        if cands.count() == 0:
            break
        mins = cands.groupby("c").aggregate(Min("wkey", alias_name="wkey"))
        mins2 = mins.map_batches(
            lambda b: pa.table({"mc": b["c"], "wkey": b["wkey"]}),
            batch_format="pyarrow")
        best = bucketed_join(mins2, cands, on="wkey", right_on="wkey",
                             num_buckets=num_partitions)

        def keep_argmin(batch: pa.Table) -> pa.Table:
            sel = _pc.equal(batch["mc"], batch["c"])
            return batch.filter(sel).select(
                ["wkey", "eid", "u", "v", "w", "cu", "cv"])

        def dedup(g: pa.Table) -> pa.Table:
            return g.slice(0, 1)

        this = (
            best.map_batches(keep_argmin, batch_format="pyarrow")
            .groupby("wkey").map_groups(dedup, batch_format="pyarrow")
            .select_columns(["eid", "u", "v", "w", "cu", "cv"])
            .materialize()
        )
        n_chosen = this.count()
        if n_chosen == 0:
            break
        picked = this.select_columns(["eid", "u", "v", "w"])
        chosen_all = picked if chosen_all is None else chosen_all.union(picked)
        chosen_all = chosen_all.materialize()

        if n_chosen <= contract_cap:
            pairs = this.select_columns(["cu", "cv"]).to_pandas()
            ids, lab = _min_label_fixpoint(pairs["cu"].to_numpy(),
                                           pairs["cv"].to_numpy())
            import ray.data
            mapping = ray.data.from_arrow(pa.table(
                {"old": pa.array(ids), "newc": pa.array(lab)}))
        else:
            mapping = _cc_shuffle(
                _edge_view(this.select_columns(["cu", "cv"]), "cu", "cv"),
                max_rounds, num_partitions,
            ).map_batches(
                lambda b: pa.table({"old": b["node"], "newc": b["comp"]}),
                batch_format="pyarrow")
        joined = bucketed_join(labels, mapping, on="comp", right_on="old",
                               how="left")

        def relabel(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"],
                "comp": _pc.coalesce(batch["newc"].cast(pa.int64()),
                                     batch["comp"]),
            })

        labels = joined.map_batches(relabel, batch_format="pyarrow").materialize()

    if chosen_all is None:
        import ray.data
        return ray.data.from_arrow(pa.table({
            "eid": pa.array([], pa.int64()), "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}))
    return chosen_all


def dag_longest_path(edges_ds, dur: np.ndarray, src_col: str = "u",
                     dst_col: str = "v", max_rounds: int = 10_000):
    """Critical-path analysis on a DAG (task scheduling): longest
    finish time per task, lp(v) = dur(v) + max over predecessors
    lp(u), sources at their own duration. Broadcast engine: the edge
    list streams once per round emitting per-block per-target MAX
    partials against the broadcast lp array; rounds are bounded by
    the longest chain (lp values are monotone non-decreasing and
    bounded, so the fixpoint is exact). ``dur`` indexes task id ->
    duration and must cover every endpoint; a shuffle variant would
    compose exactly like the CC rounds with Max in place of Min."""
    import ray
    import ray.data

    edges = _coalesce_edges(
        _edge_view(edges_ds, src_col, dst_col).materialize())
    dur = np.asarray(dur, np.int64)
    lp = dur.copy()

    for _ in range(max_rounds):
        ref = ray.put(lp)

        def prop(batch: pa.Table) -> pa.Table:
            l = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            if len(u) == 0:
                return pa.table({"v": pa.array([], pa.int64()),
                                 "lp": pa.array([], pa.int64())})
            # relax the block's OWN chains to a local fixpoint before
            # emitting (the CC lesson: one-hop-per-round costs a Ray
            # job per chain hop; local collapse cuts global rounds to
            # the block-graph diameter)
            ids = np.unique(np.concatenate([u, v]))
            cur = l[ids].copy()
            ui = np.searchsorted(ids, u)
            vi = np.searchsorted(ids, v)
            dv = dur[v]
            # Bound the local relaxation to len(ids) sweeps (the
            # longest simple chain): a positive cycle confined to one
            # block would otherwise spin forever here instead of
            # reaching the driver's max_rounds RuntimeError.
            for _ in range(len(ids)):
                before = cur.copy()
                np.maximum.at(cur, vi, cur[ui] + dv)
                if (cur == before).all():
                    break
            return pa.table({"v": pa.array(ids), "lp": pa.array(cur)})

        parts = edges.map_batches(prop, batch_format="pyarrow").to_pandas()
        new = lp.copy()
        if len(parts):
            np.maximum.at(new, parts["v"].to_numpy(), parts["lp"].to_numpy())
        if (new == lp).all():
            break
        lp = new
    else:
        raise RuntimeError("dag_longest_path: no fixpoint (cycle?)")

    return ray.data.from_arrow(pa.table({
        "task": pa.array(np.arange(len(dur), dtype=np.int64)),
        "lp": pa.array(lp)}))


def label_propagation(edges_ds, rounds: int = 3, src_col: str = "u",
                      dst_col: str = "v", mode: str = "auto",
                      broadcast_cap: int = 50_000_000,
                      num_partitions: int = 16):
    """Synchronous label-propagation community detection (LPA): every
    node starts labeled with its own id; each round every node takes
    the most frequent label among its neighbors, ties broken by the
    SMALLEST label — fully deterministic, and a fixed ``rounds``
    count so the SQL twin unrolls the identical computation. Edges
    are undirected and deduplicated first.

    Two engines behind one API (pinned equal in pytest):

    - ``broadcast``: labels live in an O(V) driver array shipped via
      ray.put; one map_batches per round emits per-block partial
      (target, label) counts and the driver folds + argmaxes. The
      fold is O(distinct (node, neighbor-label) pairs) <= 2|E| —
      fine under the cap, where edge blocks stream and only bounded
      partials return.
    - ``shuffle``: labels are a Dataset; each round is ONE grace join
      (attach the neighbor's current label) + ONE keyed groupby whose
      groups are exactly a node's neighbor multiset (bounded by max
      degree — a pathological hot node makes a fat group; salt-free
      by design because the argmax needs the full tally). Nothing
      O(V) on the driver.
    """
    import ray
    import ray.data

    # no materialize of the raw view: the block-dedup + packed-key
    # groupby below is the single full pass; only the (small) distinct
    # edge set materializes, re-blocked for the iterative engines
    e = _edge_view(edges_ds, src_col, dst_col)

    def undirect(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        keep = u != v
        a = np.minimum(u[keep], v[keep])
        b = np.maximum(u[keep], v[keep])
        pk = np.unique(a * (np.int64(1) << 32) + b)
        return pa.table({"u": pa.array(pk >> 32),
                         "v": pa.array(pk & ((np.int64(1) << 32) - 1))})

    # block-local dedup; exact global dedup happens on the packed key
    ded = e.map_batches(undirect, batch_format="pyarrow")
    from ray.data.aggregate import Count

    def pack(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(u * (np.int64(1) << 32) + v)})

    edges = (ded.map_batches(pack, batch_format="pyarrow")
             .groupby("pk").aggregate(Count(alias_name="_n"))
             .map_batches(lambda b: pa.table({
                 "u": pa.array(b["pk"].to_numpy(
                     zero_copy_only=False) >> 32),
                 "v": pa.array(b["pk"].to_numpy(
                     zero_copy_only=False) & ((np.int64(1) << 32) - 1))}),
                 batch_format="pyarrow")).materialize()
    edges = _coalesce_edges(edges)

    eng = _pick_mode(edges, mode, broadcast_cap)
    if eng in ("broadcast",):
        return _lpa_broadcast(edges, rounds)
    return _lpa_keyed(edges, rounds, num_partitions)


def _lpa_broadcast(edges, rounds: int):
    import ray
    import ray.data

    nodes = np.unique(np.concatenate([
        edges.map_batches(
            lambda b: pa.table({"n": pa.array(np.unique(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)])))}),
            batch_format="pyarrow").to_pandas()["n"].to_numpy()])).astype(
                np.int64)
    V = np.int64(len(nodes))
    labels = np.arange(V, dtype=np.int64)  # label INDEX into nodes

    for _ in range(rounds):
        ref = ray.put(labels)

        def tally(batch: pa.Table) -> pa.Table:
            lb = ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            ui = np.searchsorted(nodes, u)
            vi = np.searchsorted(nodes, v)
            tgt = np.concatenate([ui, vi])
            lbl = np.concatenate([lb[vi], lb[ui]])
            pk, cnt = np.unique(tgt * V + lbl, return_counts=True)
            return pa.table({"pk": pa.array(pk),
                             "c": pa.array(cnt.astype(np.int64))})

        parts = edges.map_batches(tally, batch_format="pyarrow").to_pandas()
        pk = parts["pk"].to_numpy()
        u, inv = np.unique(pk, return_inverse=True)
        cc = np.bincount(inv, weights=parts["c"].to_numpy()).astype(np.int64)
        ti, li = u // V, u % V
        order = np.lexsort((li, -cc, ti))
        ts = ti[order]
        first = np.concatenate(([True], ts[1:] != ts[:-1]))
        new = labels.copy()
        new[ts[first]] = li[order][first]
        labels = new

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes), "lbl": pa.array(nodes[labels])}))


def _lpa_keyed(edges, rounds: int, num_partitions: int):
    from osmray.joins import bucketed_join

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array(np.concatenate([u, v])),
                         "y": pa.array(np.concatenate([v, u]))})

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()
    labels = _distinct_nodes(edges).map_batches(
        lambda b: pa.table({"node": b["node"],
                            "lbl": b["node"].cast(pa.int64())}),
        batch_format="pyarrow").materialize()

    def new_label(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "lbl": pa.array([], pa.int64())})
        x = g["x"].to_numpy(zero_copy_only=False).astype(np.int64)[0]
        lb = g["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(lb, return_counts=True)
        win = u[np.lexsort((u, -cnt))[0]]
        return pa.table({"node": pa.array([x]),
                         "lbl": pa.array([int(win)], pa.int64())})

    for _ in range(rounds):
        j = bucketed_join(adj, labels, on="y", right_on="node",
                          num_buckets=num_partitions)
        labels = (j.groupby("x")
                  .map_groups(new_label, batch_format="pyarrow")
                  .materialize())

    return labels


_POP8 = None


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    """Per-row popcount of a (rows, words) uint64 matrix."""
    global _POP8
    if _POP8 is None:
        _POP8 = np.array([bin(i).count("1") for i in range(256)], np.uint16)
    return _POP8[x.view(np.uint8)].sum(axis=1).astype(np.int64)


def _ktruss_broadcast(eks: np.ndarray, k: int, rounds: int):
    """Driver-array k-truss peel for graphs under the broadcast cap:
    node-id remap + per-node neighbor BITSETS, support(a,b) =
    popcount(nbr[a] & nbr[b]) fully vectorized. O(V*V/8 + E*W) bytes;
    the auto policy bounds V so the mask matrix stays small."""
    a, b = eks >> 32, eks & np.int64(0xFFFFFFFF)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi = inv[: len(a)].astype(np.int64), inv[len(a):].astype(np.int64)
    n = len(nodes)
    W = max(1, (n + 63) // 64)
    sup = np.zeros(0, np.int64)
    for _ in range(rounds):
        if len(ai) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64), sup
        masks = np.zeros((n, W), np.uint64)
        np.bitwise_or.at(masks, (ai, bi >> 6),
                         np.uint64(1) << (bi & 63).astype(np.uint64))
        np.bitwise_or.at(masks, (bi, ai >> 6),
                         np.uint64(1) << (ai & 63).astype(np.uint64))
        sup = _popcount_rows(masks[ai] & masks[bi])
        keep = sup >= k - 2
        ai, bi, sup = ai[keep], bi[keep], sup[keep]
    return nodes[ai], nodes[bi], sup


def ktruss(edges_ds, k: int = 4, rounds: int = 2,
           src_col: str = "u", dst_col: str = "v",
           num_buckets: int = 8, spill_root: str | None = None,
           mode: str = "auto", broadcast_cap: int = 2_000_000,
           node_cap: int = 16384):
    """Bounded-round k-truss peeling — per-EDGE triangle support with
    iterative pruning (``rounds`` fixed peels, the bounded-round
    iterative contract of q_hits/q_lpa): each round recomputes every
    edge's support = #triangles containing it on the CURRENT edge set
    via the :func:`triangles` two-join plan (wedge grace join on the
    shared middle vertex, closing-edge grace join), then keeps edges
    with support >= k-2. Support counting is one high-cardinality
    ``sorted_fold_sums`` over packed edge keys — edges absent from
    any triangle never materialize a zero row, they are simply
    dropped by the filter (k >= 3). No driver state beyond O(1)
    scalars; the per-round working set is the surviving edge list.
    Returns (u, v, support) for the edges kept after the final peel,
    with the support that justified keeping them. Skew note: like
    triangle counting, wedge fan-out is sum_b deg(b)^2 — salt or cap
    hot middle vertices upstream for near-star graphs."""
    from ray.data.aggregate import Count

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    if k < 3:
        raise ValueError(f"ktruss: k must be >= 3, got {k}")

    def orient(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = u != v
        u, v = u[sel], v[sel]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"ek": pa.array(np.unique((lo << 32) | hi))})

    ekeys = (edges_ds.map_batches(orient, batch_format="pyarrow")
             .groupby("ek").aggregate(Count(alias_name="_n"))
             .select_columns(["ek"])).materialize()

    import ray.data as _rd

    if mode == "auto":
        n_e = ekeys.count()
        if n_e <= broadcast_cap:
            from ray.data.aggregate import Max

            mx = ekeys.map_batches(
                lambda t: pa.table({"m": pa.array(
                    [int(t["ek"].to_numpy(zero_copy_only=False)
                         .max() & 0xFFFFFFFF)] if len(t) else [],
                    pa.int64())}),
                batch_format="pyarrow").aggregate(Max("m", alias_name="m"))
            mode = ("broadcast"
                    if (mx["m"] or 0) < node_cap else "shuffle")
        else:
            mode = "shuffle"
    if mode == "broadcast":
        # O(E) driver arrays under the cap, O(V^2/8) bitset matrix
        # under node_cap — the small-graph fast path; the shuffle
        # engine below is the 1e9+-edge path (engines pinned equal
        # in tests/test_session4_ops.py)
        eks = np.sort(np.concatenate(
            [b["ek"].to_numpy(zero_copy_only=False)
             for b in ekeys.iter_batches(batch_format="pyarrow")]
            or [np.zeros(0, np.int64)])).astype(np.int64)
        u, v, sup = _ktruss_broadcast(eks, k, rounds)
        return _rd.from_arrow(pa.table({
            "u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64()),
            "support": pa.array(sup, pa.int64())}))

    def unpack(batch: pa.Table) -> pa.Table:
        ek = batch["ek"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(ek >> 32),
                         "b": pa.array(ek & 0xFFFFFFFF)})

    def _empty() -> pa.Table:
        return pa.table({"u": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())})

    kept = None
    for _ in range(rounds):
        if ekeys.count() == 0:  # fixpoint: peeled to the empty graph
            return _rd.from_arrow(_empty())
        E = ekeys.map_batches(unpack, batch_format="pyarrow")
        wedges = bucketed_join(E, E, on="b", right_on="a",
                               num_buckets=num_buckets,
                               spill_root=spill_root)
        # columns: a, b, a_r (== b), b_r (== c); keep all three ids

        def wedge_key(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            c = batch["b_r"].to_numpy(zero_copy_only=False)
            return pa.table({"ek": pa.array((a << 32) | c),
                             "a": pa.array(a), "b": pa.array(b),
                             "c": pa.array(c)})

        wk = wedges.map_batches(wedge_key, batch_format="pyarrow")
        closed = bucketed_join(wk, ekeys, on="ek", right_on="ek",
                               num_buckets=num_buckets,
                               spill_root=spill_root)

        def tri_edge_partials(batch: pa.Table) -> pa.Table:
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            eks = np.concatenate([(a << 32) | b, (b << 32) | c,
                                  (a << 32) | c])
            u, cnt = np.unique(eks, return_counts=True)
            return pa.table({"ek": pa.array(u),
                             "n": pa.array(cnt.astype(np.int64))})

        support = sorted_fold_sums(
            closed.map_batches(tri_edge_partials, batch_format="pyarrow"),
            "ek", ["n"])
        kept = support.map_batches(
            lambda t: t.filter(_pc.greater_equal(t["n"], k - 2)),
            batch_format="pyarrow").materialize()
        ekeys = kept.select_columns(["ek"]).materialize()

    if ekeys.count() == 0:  # final peel emptied the graph
        return _rd.from_arrow(_empty())

    def unpack_out(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return _empty()
        ek = batch["ek"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(ek >> 32),
                         "v": pa.array(ek & 0xFFFFFFFF),
                         "support": batch["n"].cast(pa.int64())})

    return kept.map_batches(unpack_out, batch_format="pyarrow")


def stitch_chains(segs_ds, id_col: str = "s", p1_col: str = "p1",
                  p2_col: str = "p2", len_col: str = "len",
                  num_buckets: int = 4096, mode: str = "auto"):
    """Polyline / way stitching — the OSM road-network conflation
    primitive: segments sharing an endpoint of TOTAL degree exactly 2
    (the unambiguous-continuation rule) merge into chains; junctions
    (degree >= 3) and dead ends break chains. Plan: explode endpoint
    rows, co-locate each endpoint's rows by a bounded hashed-bucket
    groupby (pt % num_buckets — per-group work is vectorized run
    detection, never per-endpoint task overhead), emit one segment-
    graph edge per degree-2 endpoint, run :func:`connected_components`
    over segment ids (components are paths/cycles, so min-label CC
    converges in O(log chain length) pointer-jumped rounds), LEFT-
    attach labels back so isolated segments keep their own id, and
    fold (count, total length, id min) per chain. Emits
    (chain_id, n_segs, total_len); chain_id = min segment id."""
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold

    def ends(batch: pa.Table) -> pa.Table:
        s = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p1 = batch[p1_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p2 = batch[p2_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pt": pa.array(np.concatenate([p1, p2])),
            "s": pa.array(np.concatenate([s, s])),
            "bk": pa.array(np.concatenate([p1, p2]) % num_buckets)})

    def deg2_pairs(g: pa.Table) -> pa.Table:
        pt = g["pt"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = g["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, pt))
        pt, s = pt[order], s[order]
        new = np.concatenate(([True], pt[1:] != pt[:-1]))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(pt)])))
        two = starts[cnt == 2]
        a, b = s[two], s[two + 1]
        keep = a != b
        return pa.table({"u": pa.array(a[keep]), "v": pa.array(b[keep])})

    edges = (segs_ds.map_batches(ends, batch_format="pyarrow")
             .groupby("bk").map_groups(deg2_pairs, batch_format="pyarrow"))
    comps = connected_components(edges, mode=mode)

    attach = bucketed_join(
        segs_ds.map_batches(
            lambda t: pa.table({
                "s": t[id_col].cast(pa.int64()),
                "len": t[len_col].cast(pa.int64()),
                "one": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        comps, on="s", right_on="node", how="left",
        num_buckets=max(8, num_buckets // 256))

    def resolve(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["comp"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        isnull = _pc.is_null(col).to_numpy(zero_copy_only=False)
        comp = _pc.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        comp = np.where(isnull, s, comp)
        return pa.table({"comp": pa.array(comp), "one": batch["one"],
                         "len": batch["len"], "s": batch["s"]})

    folded = sorted_fold(
        attach.map_batches(resolve, batch_format="pyarrow"),
        "comp", ["one", "len"], ["sum", "sum"])
    return folded.map_batches(
        lambda t: t.rename_columns(["chain_id", "n_segs", "total_len"]),
        batch_format="pyarrow")


def bipartite_audit(edges_ds, src_col: str = "u", dst_col: str = "v",
                    mode: str = "auto", max_hops: int = 16,
                    broadcast_cap: int = 2_000_000, num_buckets: int = 8):
    """Per-component bipartiteness audit (odd-cycle detection):
    components + parity 2-coloring (BFS hop parity from each
    component's min node) + equal-parity edge counts. TWO engines
    behind one API: ``broadcast`` (edge list under ``broadcast_cap``
    collects to driver arrays; vectorized scatter-min CC with pointer
    jumping, vectorized frontier BFS — one O(E) pass per round) and
    ``shuffle`` (connected_components + bfs_hops + grace joins —
    nothing O(V) on the driver; RAISES if BFS needs more than
    ``max_hops`` rounds). Emits (comp, n_nodes, n_conflicts);
    bipartite iff n_conflicts = 0. Engines pinned equal in
    tests/test_session4_ops.py."""
    import ray.data as _rd

    from ray.data.aggregate import Count

    def orient(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = u != v
        lo = np.minimum(u[sel], v[sel])
        hi = np.maximum(u[sel], v[sel])
        return pa.table({"ek": pa.array(np.unique((lo << 32) | hi))})

    ekeys = (edges_ds.map_batches(orient, batch_format="pyarrow")
             .groupby("ek").aggregate(Count(alias_name="_n"))
             .select_columns(["ek"])).materialize()
    if mode == "auto":
        mode = "broadcast" if ekeys.count() <= broadcast_cap else "shuffle"

    E = ekeys.map_batches(
        lambda t: pa.table({
            "u": pa.array(t["ek"].to_numpy(zero_copy_only=False) >> 32),
            "v": pa.array(t["ek"].to_numpy(
                zero_copy_only=False) & 0xFFFFFFFF)}),
        batch_format="pyarrow").materialize()

    if mode == "broadcast":
        eks = np.concatenate(
            [b["ek"].to_numpy(zero_copy_only=False)
             for b in ekeys.iter_batches(batch_format="pyarrow")]
            or [np.zeros(0, np.int64)]).astype(np.int64)
        a, b = eks >> 32, eks & np.int64(0xFFFFFFFF)
        nodes, inv = np.unique(np.concatenate([a, b]),
                               return_inverse=True)
        ui, vi = inv[: len(a)], inv[len(a):]
        n = len(nodes)
        lab = np.arange(n, dtype=np.int64)
        while True:
            prev = lab.copy()
            m = np.minimum(lab[ui], lab[vi])
            np.minimum.at(lab, ui, m)
            np.minimum.at(lab, vi, m)
            lab = lab[lab]
            if np.array_equal(lab, prev):
                break
        dist = np.full(n, -1, np.int64)
        dist[lab == np.arange(n)] = 0
        h = 0
        while True:
            fr = dist == h
            if not fr.any():
                break
            hit = np.zeros(n, bool)
            sel = fr[ui] & (dist[vi] < 0)
            hit[vi[sel]] = True
            sel = fr[vi] & (dist[ui] < 0)
            hit[ui[sel]] = True
            if not hit.any() and not (dist < 0).any():
                break
            dist[hit] = h + 1
            h += 1
        conf = (dist[ui] % 2) == (dist[vi] % 2)
        n_nodes = np.bincount(lab, minlength=n)
        n_conf = np.bincount(lab[ui], weights=conf, minlength=n)
        reps = np.flatnonzero(lab == np.arange(n))
        return _rd.from_arrow(pa.table({
            "comp": pa.array(nodes[reps].astype(np.int64)),
            "n_nodes": pa.array(n_nodes[reps].astype(np.int64)),
            "n_conflicts": pa.array(n_conf[reps].astype(np.int64))}))

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    comps = connected_components(E).materialize()
    seeds = comps.map_batches(
        lambda t: t.filter(_pc.equal(t["node"], t["comp"]))
        .select(["node"]), batch_format="pyarrow")
    hops = bfs_hops(E, seeds, max_hops=max_hops).materialize()
    n_nodes, n_hop = comps.count(), hops.count()
    if n_hop != n_nodes:
        raise RuntimeError(
            f"bfs did not cover the graph in {max_hops} hops "
            f"({n_hop}/{n_nodes}); raise max_hops")
    colors = hops.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "c": pa.array(t["hop"].to_numpy(
                zero_copy_only=False).astype(np.int64) % 2)}),
        batch_format="pyarrow")
    j1 = bucketed_join(E, colors, on="u", right_on="node",
                       num_buckets=num_buckets).map_batches(
        lambda t: t.select(["u", "v", "c"]), batch_format="pyarrow")
    j2 = bucketed_join(j1, colors, on="v", right_on="node",
                       num_buckets=num_buckets).map_batches(
        lambda t: pa.table({"u": t["u"], "cu": t["c"],
                            "cv": t["c_r"]}), batch_format="pyarrow")
    j3 = bucketed_join(j2, comps, on="u", right_on="node",
                       num_buckets=num_buckets)

    def conf_partials(batch: pa.Table) -> pa.Table:
        cu = batch["cu"].to_numpy(zero_copy_only=False).astype(np.int64)
        cv = batch["cv"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = batch["comp"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, inv2 = np.unique(comp, return_inverse=True)
        return pa.table({
            "comp": pa.array(u),
            "n_nodes": pa.array(np.zeros(len(u), np.int64)),
            "n_conflicts": pa.array(np.bincount(
                inv2, weights=(cu == cv).astype(np.int64)
            ).astype(np.int64))})

    sizes = comps.map_batches(
        lambda t: pa.table({
            "comp": t["comp"],
            "n_nodes": pa.array(np.ones(len(t), np.int64)),
            "n_conflicts": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow")
    return sorted_fold_sums(
        sizes.union(j3.map_batches(conf_partials,
                                   batch_format="pyarrow")),
        "comp", ["n_nodes", "n_conflicts"])


def triangles_per_vertex(edges_ds, src_col: str = "u", dst_col: str = "v",
                         num_buckets: int = 32,
                         spill_root: str | None = None):
    """Exact triangle counts per vertex with ALL-CORNER attribution
    (each triangle counts at a, b AND c — the local-clustering-
    coefficient numerator), vs :func:`triangles`' min-vertex
    attribution. Same two-grace-join plan; the close join keeps the
    middle vertex so each surviving wedge emits its three corners
    into one keyed count fold. Returns (u, n_tri)."""
    from ray.data.aggregate import Count

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    def orient(batch: pa.Table) -> pa.Table:
        u = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = u != v
        u, v = u[sel], v[sel]
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({"ek": pa.array(np.unique((lo << 32) | hi))})

    ekeys = (edges_ds.map_batches(orient, batch_format="pyarrow")
             .groupby("ek").aggregate(Count(alias_name="_n"))
             .select_columns(["ek"])).materialize()

    def unpack(batch: pa.Table) -> pa.Table:
        ek = batch["ek"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(ek >> 32),
                         "b": pa.array(ek & 0xFFFFFFFF)})

    E = ekeys.map_batches(unpack, batch_format="pyarrow")
    wedges = bucketed_join(E, E, on="b", right_on="a",
                           num_buckets=num_buckets, spill_root=spill_root)

    def wedge_key(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["b_r"].to_numpy(zero_copy_only=False)
        return pa.table({"ek": pa.array((a << 32) | c),
                         "a": pa.array(a), "b": pa.array(b),
                         "c": pa.array(c)})

    wk = wedges.map_batches(wedge_key, batch_format="pyarrow")
    closed = bucketed_join(wk, ekeys, on="ek", right_on="ek",
                           num_buckets=num_buckets, spill_root=spill_root)

    def corner_partials(batch: pa.Table) -> pa.Table:
        vs = np.concatenate([
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
            batch["c"].to_numpy(zero_copy_only=False)])
        u, cnt = np.unique(vs, return_counts=True)
        return pa.table({"u": pa.array(u.astype(np.int64)),
                         "n_tri": pa.array(cnt.astype(np.int64))})

    return sorted_fold_sums(
        closed.map_batches(corner_partials, batch_format="pyarrow"),
        "u", ["n_tri"])
