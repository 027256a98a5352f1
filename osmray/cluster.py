"""Density clustering (grid DBSCAN) as pure dataflow.

The classic DBSCAN definition (Ester et al., KDD'96) decomposes into
relational steps that Ray Data already has efficient shapes for — no
sequential region-growing loop, no shared visited set:

1. eps-neighbor pairs  = ``joins.distance_join`` (PBSM grid: features
   explode to covering cells, points live in one cell, one grace
   join, integer d^2 predicate) of the point set against itself;
2. core points         = keyed Count fold over pair keys
   (deg >= min_pts, self-pair included per the standard definition);
3. clusters            = connected components of the core-core
   eps-graph (``graph.connected_components`` — broadcast label vector
   under the cap, keyed-join rounds above it), cluster id = min pid;
4. border points       = non-core points with >= 1 core neighbor,
   assigned the MINIMUM adjacent core's cluster id (deterministic —
   plain DBSCAN leaves border assignment order-dependent, which can
   never hash-match; the min rule is the keyed fold Min);
5. noise               = everything else, cluster -1.

Every step is keys-only (pair tables carry ids + d^2, never
payloads); the two-engine policy (capped broadcast / grace join)
keeps the driver O(1) above ``broadcast_cap``. Semantics anchor: the
reference has no clustering, but its painted-set/complement machinery
(/root/reference/lib/helpers.py:109-215) is the same
membership-by-spatial-bucket shape; DBSCAN is the training-data-curation
add (spatial dedup pockets, POI grouping) the north rule's engine
needs at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dbscan_grid(points, eps: int, min_pts: int, id_col: str = "pid",
                x_col: str = "x", y_col: str = "y",
                cell_shift: int | None = None, num_buckets: int = 32,
                broadcast_cap: int = 2_000_000):
    """Grid DBSCAN over integer coordinates. Returns a Dataset
    (pid, cluster, role) — role 0 = core, 1 = border, 2 = noise;
    cluster = the component's minimum core pid (-1 for noise).
    ``eps`` is the (inclusive) euclidean radius; all predicates are
    exact integer d^2 comparisons."""
    import ray as _ray
    from ray.data.aggregate import Count, Min

    from osmray.graph import connected_components
    from osmray.joins import (broadcast_filter, bucketed_filter,
                              bucketed_join, distance_join)

    if cell_shift is None:
        cell_shift = max(2, int(eps).bit_length())

    def qview(batch: pa.Table) -> pa.Table:
        return pa.table({"qid": batch[id_col].cast(pa.int64()),
                         "px": batch[x_col].cast(pa.int64()),
                         "py": batch[y_col].cast(pa.int64())})

    def fview(batch: pa.Table) -> pa.Table:
        return pa.table({"fid": batch[id_col].cast(pa.int64()),
                         "fx": batch[x_col].cast(pa.int64()),
                         "fy": batch[y_col].cast(pa.int64())})

    pairs = distance_join(points.map_batches(qview, batch_format="pyarrow"),
                          points.map_batches(fview, batch_format="pyarrow"),
                          radius=eps, cell_shift=cell_shift,
                          num_buckets=num_buckets).materialize()

    deg = pairs.groupby("qid").aggregate(Count(alias_name="deg"))
    core = (deg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["deg"], min_pts))
        .select(["qid"]), batch_format="pyarrow").materialize())
    n_core = core.count()

    if n_core <= broadcast_cap:
        core_keys = np.unique(core.to_pandas()["qid"].to_numpy())
        cc_edges = broadcast_filter(
            broadcast_filter(pairs, "qid", core_keys), "fid", core_keys)
        border_pairs = broadcast_filter(
            broadcast_filter(pairs, "qid", core_keys, anti=True),
            "fid", core_keys)
    else:
        core_keys = None
        cc_edges = bucketed_filter(
            bucketed_filter(pairs, core, on="qid", right_on="qid",
                            num_buckets=num_buckets),
            core, on="fid", right_on="qid", num_buckets=num_buckets)
        border_pairs = bucketed_filter(
            bucketed_filter(pairs, core, on="qid", right_on="qid",
                            anti=True, num_buckets=num_buckets),
            core, on="fid", right_on="qid", num_buckets=num_buckets)

    import ray.data as _rd

    empty = _rd.from_arrow(pa.table({
        "pid": pa.array([], pa.int64()),
        "cluster": pa.array([], pa.int64()),
        "role": pa.array([], pa.int64())}))

    if n_core == 0:
        out_core = empty
        out_border = empty
        n_border = 0
        border = None
    else:
        comp = connected_components(
            cc_edges, src_col="qid", dst_col="fid",
            broadcast_cap=broadcast_cap).materialize()

        def core_rows(batch: pa.Table) -> pa.Table:
            return pa.table({
                "pid": batch["node"], "cluster": batch["comp"],
                "role": pa.array(np.zeros(len(batch), np.int64))})

        out_core = comp.map_batches(core_rows, batch_format="pyarrow")

        if n_core <= broadcast_cap:
            cp = comp.to_pandas()
            ck = cp["node"].to_numpy().astype(np.int64)
            cv = cp["comp"].to_numpy().astype(np.int64)
            o = np.argsort(ck)
            ref = _ray.put((ck[o], cv[o]))

            def attach(batch: pa.Table, *, _ref=ref) -> pa.Table:
                k, v = _ray.get(_ref)
                f = batch["fid"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(k, f)
                return pa.table({"qid": batch["qid"],
                                 "cluster": pa.array(v[pos])})

            blab = border_pairs.map_batches(attach, batch_format="pyarrow")
        else:
            j = bucketed_join(border_pairs, comp, on="fid", right_on="node",
                              num_buckets=num_buckets)
            blab = j.map_batches(
                lambda t: pa.table({"qid": t["qid"], "cluster": t["comp"]}),
                batch_format="pyarrow")

        border = (blab.groupby("qid").aggregate(Min("cluster",
                                                    alias_name="cluster"))
                  .materialize())
        n_border = border.count()

        def border_rows(batch: pa.Table) -> pa.Table:
            return pa.table({
                "pid": batch["qid"], "cluster": batch["cluster"],
                "role": pa.array(np.ones(len(batch), np.int64))})

        out_border = (border.map_batches(border_rows,
                                         batch_format="pyarrow")
                      if n_border else empty)

    ids = points.map_batches(
        lambda t: pa.table({"pid": t[id_col].cast(pa.int64())}),
        batch_format="pyarrow")
    if n_core == 0:
        noise_ids = ids
    elif n_core + n_border <= broadcast_cap and core_keys is not None:
        labeled = core_keys if n_border == 0 else np.concatenate(
            [core_keys, border.to_pandas()["qid"].to_numpy()])
        noise_ids = broadcast_filter(ids, "pid", np.unique(labeled),
                                     anti=True)
    else:
        labeled_ds = core if n_border == 0 else core.union(
            border.select_columns(["qid"]))
        noise_ids = bucketed_filter(ids, labeled_ds, on="pid",
                                    right_on="qid", anti=True,
                                    num_buckets=num_buckets)

    def noise_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "pid": batch["pid"],
            "cluster": pa.array(np.full(len(batch), -1, np.int64)),
            "role": pa.array(np.full(len(batch), 2, np.int64))})

    out_noise = noise_ids.map_batches(noise_rows, batch_format="pyarrow")
    return out_core.union(out_border).union(out_noise)


def grid_components(pixels, width: int, key_col: str = "key",
                    num_buckets: int = 32,
                    broadcast_cap: int = 50_000_000):
    """Connected-component labeling of a sparse raster (raster ->
    vector blob extraction): painted pixels keyed ``x * width + y``,
    4-adjacency. Adjacency needs NO pair join — a pixel's right/down
    neighbor is a pure key shift, so edges are two semi-joins of the
    shifted key set against the painted set (capped broadcast /
    grace filter), then ``graph.connected_components`` labels the
    blobs and isolated pixels fall back to their own key. Returns
    (key, comp). Blob stats are one keyed fold downstream."""
    import ray as _ray

    from osmray.graph import connected_components
    from osmray.joins import broadcast_filter, bucketed_filter, bucketed_join

    n_pix = pixels.count()

    def shifted(delta: int, guard):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False)
            ok = guard(k)
            return pa.table({"u": pa.array(k[ok]),
                             "v": pa.array(k[ok] + delta)})
        return f

    # right neighbor: x+1 (key + width), valid when x < width-1;
    # down neighbor: y+1 (key + 1), valid when y % width < width-1
    right = pixels.map_batches(
        shifted(width, lambda k: (k // width) < width - 1),
        batch_format="pyarrow")
    down = pixels.map_batches(
        shifted(1, lambda k: (k % width) < width - 1),
        batch_format="pyarrow")
    cand = right.union(down)

    if n_pix <= broadcast_cap:
        keys = np.unique(pixels.to_pandas()[key_col].to_numpy())
        edges = broadcast_filter(cand, "v", keys)
        # the adjacency is keys-only and bounded by 2x the painted
        # set, so label it with ONE collect + the vectorized driver
        # fixpoint instead of per-round Ray jobs: the dataflow CC's
        # ~log(diameter) rounds each pay full job latency (measured
        # 36 s for a 207k-pixel canvas; the fixpoint runs in <1 s)
        from osmray.graph import _min_label_fixpoint

        ep = edges.to_pandas()
        ids, lab = _min_label_fixpoint(ep["u"].to_numpy().astype(np.int64),
                                       ep["v"].to_numpy().astype(np.int64))
        import ray.data as _rd

        comp = _rd.from_arrow(pa.table({"node": pa.array(ids),
                                        "comp": pa.array(lab)})).materialize()
    else:
        edges = bucketed_filter(cand, pixels, on="v", right_on=key_col,
                                num_buckets=num_buckets)
        comp = connected_components(edges, broadcast_cap=broadcast_cap
                                    ).materialize()

    if n_pix <= broadcast_cap:
        cp = comp.to_pandas()
        ck = cp["node"].to_numpy().astype(np.int64)
        cv = cp["comp"].to_numpy().astype(np.int64)
        o = np.argsort(ck)
        ref = _ray.put((ck[o], cv[o]))

        def attach(batch: pa.Table, *, _ref=ref) -> pa.Table:
            k, v = _ray.get(_ref)
            p = batch[key_col].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(k, p)
            pos_c = np.minimum(pos, max(len(k) - 1, 0))
            hit = (k[pos_c] == p) if len(k) else np.zeros(len(p), bool)
            c = np.where(hit, v[pos_c] if len(k) else 0, p)
            return pa.table({"key": pa.array(p), "comp": pa.array(c)})

        return pixels.map_batches(attach, batch_format="pyarrow")

    j = bucketed_join(pixels, comp, on=key_col, right_on="node",
                      how="left", num_buckets=num_buckets)

    def fill(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        c = batch["comp"].to_numpy(zero_copy_only=False)
        c = np.where(np.isnan(c.astype(np.float64)), k, c).astype(np.int64) \
            if c.dtype != np.int64 else c
        return pa.table({"key": pa.array(k), "comp": pa.array(c)})

    return j.map_batches(fill, batch_format="pyarrow")
