"""Terrain / raster-DEM kernels over sparse integer cell grids.

The reusable core behind q_terrain / q_d8_flow / q_watershed
(osmray/queries.py): a DEM is any Dataset of integer cell coordinates
plus an integer value column; elevation is the per-cell SUM of values.
All kernels are scatter + sorted-scan folds — no all-to-all beyond the
one keyed sort each fold performs, no driver-side state, and every
intermediate is keys-only (int64 columns), so the shapes hold at
arbitrary scale.

Grid packing: cell = cx * GRID + cy + GRID // 2, which round-trips
negative-by-one coordinates (scatter targets one step outside the
occupied grid) through numpy floor division. Callers must keep
cx in [-1, GRID/2) and cy in [-GRID/2 + 1, GRID/2 - 1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

GRID = 8192
_OFF = GRID // 2

# D8 neighbor order; code = index + 1 (0 is reserved for "self/sink")
D8_DIRS = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
           (0, 1), (1, -1), (1, 0), (1, 1)]


def pack(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return cx * GRID + cy + _OFF


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return cell // GRID, cell % GRID - _OFF


def elevation_partials(ds, x_col: str, y_col: str, v_col: str):
    """Per-block per-cell elevation partials: (cell, z). Partials, not
    totals — linear consumers (the Horn gradient) scatter them
    directly; argmin consumers must total first (see d8_codes)."""

    def per_cell(batch: pa.Table) -> pa.Table:
        cx = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        key = pack(cx, cy)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "cell": pa.array(u),
            "z": pa.array(np.bincount(inv, weights=v, minlength=len(u))
                          .astype(np.int64))})

    return ds.map_batches(per_cell, batch_format="pyarrow")


def _combine_sums(keys: np.ndarray, cols: dict[str, np.ndarray],
                  key_name: str = "cell") -> pa.Table:
    """Block-local combiner: sum every column per distinct key. The
    scatters below emit up to 9 rows per source cell and neighbors
    inside one block mostly target the same receivers, so combining
    BEFORE the keyed sort cuts shuffle volume up to 9x; the downstream
    fold re-sums partials, which is exact."""
    u, inv = np.unique(keys, return_inverse=True)
    out = {key_name: pa.array(u)}
    for name, v in cols.items():
        out[name] = pa.array(
            np.bincount(inv, weights=v, minlength=len(u)).astype(np.int64))
    return pa.table(out)


def horn_gradient(partials):
    """Horn-style 3x3 gradient + trig-free 8-octant aspect:
    (cell, z) partials -> (cx, cy, gx, gy, slope_l1, aspect). The
    gradient is linear in z, so partials scatter signed weights
    directly and ONE sorted-scan fold sums gx/gy per receiving cell."""
    from osmray.tableops import sorted_fold_sums

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = unpack(c)
        ks, gxs, gys = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                gxw = 0 if dx == 0 else (1 if dx > 0 else -1) * (2 if dy == 0 else 1)
                gyw = 0 if dy == 0 else (1 if dy > 0 else -1) * (2 if dx == 0 else 1)
                ks.append(pack(cx - dx, cy - dy))
                gxs.append(gxw * z)
                gys.append(gyw * z)
        return _combine_sums(np.concatenate(ks),
                             {"gx": np.concatenate(gxs),
                              "gy": np.concatenate(gys)})

    folded = sorted_fold_sums(
        partials.map_batches(scatter, batch_format="pyarrow"),
        "cell", ["gx", "gy"])

    def finish(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = batch["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy = batch["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
        ax, ay = np.abs(gx), np.abs(gy)
        # priority chain == the SQL twin's CASE order (queries.py)
        aspect = np.select(
            [(gx == 0) & (gy == 0), ax >= 2 * ay, ay >= 2 * ax,
             (gx > 0) & (gy > 0), (gx < 0) & (gy > 0), (gx < 0) & (gy < 0)],
            [np.full_like(gx, -1), np.where(gx > 0, 0, 4),
             np.where(gy > 0, 2, 6), np.full_like(gx, 1),
             np.full_like(gx, 3), np.full_like(gx, 5)],
            default=7).astype(np.int64)
        cx, cy = unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "gx": pa.array(gx), "gy": pa.array(gy),
            "slope_l1": pa.array(ax + ay), "aspect": pa.array(aspect)})

    return folded.map_batches(finish, batch_format="pyarrow")


def d8_codes(partials):
    """D8 steepest-descent drain codes: (cell, z) partials ->
    (cell, code), code = 0 for a sink else 1-based index into
    D8_DIRS. Argmin is NOT additive over partials, so elevations
    first total through a sum fold; totals scatter (z*16 + code)
    candidates plus a (z*16 + 0) self row — self wins exact-z ties,
    which IS the strictly-lower drain rule — and a MIN fold picks the
    winner; phantom receivers (named only by neighbors) drop out via
    a max-fold presence flag."""
    from osmray.tableops import sorted_fold, sorted_fold_sums

    totals = sorted_fold_sums(partials, "cell", ["z"])

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = unpack(c)
        ks = [c]
        ps = [z * 16]
        fs = [np.ones_like(z)]
        for code, (dx, dy) in enumerate(D8_DIRS, start=1):
            ks.append(pack(cx - dx, cy - dy))
            ps.append(z * 16 + code)
            fs.append(np.zeros_like(z))
        # block-local combine (min packed / max selfflag per key):
        # exact for extrema folds, cuts the keyed sort input up to 9x
        k = np.concatenate(ks)
        p = np.concatenate(ps)
        f = np.concatenate(fs)
        u, inv = np.unique(k, return_inverse=True)
        pmin = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(pmin, inv, p)
        fmax = np.zeros(len(u), np.int64)
        np.maximum.at(fmax, inv, f)
        return pa.table({"cell": pa.array(u), "packed": pa.array(pmin),
                         "selfflag": pa.array(fmax)})

    folded = sorted_fold(
        totals.map_batches(scatter, batch_format="pyarrow"),
        "cell", ["packed", "selfflag"], ["min", "max"])

    def finish(batch: pa.Table) -> pa.Table:
        hs = batch["selfflag"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = hs == 1
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        mp = batch["packed"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return pa.table({"cell": pa.array(c), "code": pa.array(mp % 16)})

    return folded.map_batches(finish, batch_format="pyarrow")


def watershed(codes):
    """Basin labeling over the D8 drain forest: (cell, code) ->
    (cell, sink). Strictly-lower drains make every basin exactly one
    tree of the (cell -> drain) forest, so basins ARE connected
    components: CC over drain edges (two-engine graph policy), one
    bucketed join names each component by its sink, one attaches the
    sink to every member, and an anti join restores isolated sinks
    (no in-edges, so no CC row)."""
    from osmray.graph import connected_components
    from osmray.joins import bucketed_join

    d8 = codes.materialize()  # keys-only; read three times
    # keys-only joins on a counted input: size the grace buckets to
    # ~250k rows each so small DEMs run one merge task per join
    # instead of 64 near-empty ones (measured: q_basin_boundary
    # 33 s -> the join overhead, not compute, at sf0.1)
    nb = max(1, min(64, d8.count() // 250_000 + 1))
    dirs = np.asarray(D8_DIRS, dtype=np.int64)

    def edges(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = code > 0
        d = dirs[code[m] - 1]
        cx, cy = unpack(c[m])
        return pa.table({
            "u": pa.array(c[m]),
            "v": pa.array(pack(cx + d[:, 0], cy + d[:, 1]))})

    def sinks_only(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node": pa.array(c[code == 0])})

    cc = connected_components(
        d8.map_batches(edges, batch_format="pyarrow")).materialize()
    sinks = d8.map_batches(sinks_only, batch_format="pyarrow")

    sink_map = bucketed_join(cc, sinks, on="node",
                             num_buckets=nb).map_batches(
        lambda t: pa.table({"comp": t["comp"], "sink": t["node"]}),
        batch_format="pyarrow")
    members = bucketed_join(cc, sink_map, on="comp", num_buckets=nb)
    iso = bucketed_join(sinks, cc.select_columns(["node"]),
                        on="node", how="anti", num_buckets=nb).map_batches(
        lambda t: pa.table({"node": t["node"], "sink": t["node"]}),
        batch_format="pyarrow")

    return members.select_columns(["node", "sink"]).union(iso).map_batches(
        lambda t: pa.table({"cell": t["node"], "sink": t["sink"]}),
        batch_format="pyarrow")


def flow_accumulation(codes, mode: str = "auto",
                      broadcast_cap: int = 50_000_000,
                      max_rounds: int = 4096):
    """D8 flow accumulation: (cell, code) -> (cell, accum), accum =
    number of cells whose drain path passes through the cell,
    INCLUDING itself (so a ridge cell has accum 1 and a sink has its
    whole basin). Two engines behind one Dataset API, mirroring
    osmray/graph.py:

    - ``broadcast`` (cell count <= broadcast_cap): the codes table is
      bounded, so one driver-side vectorized mass-push loop over the
      successor array computes accum in O(depth) numpy rounds with no
      Ray jobs at all.
    - ``shuffle``: mass is itself a Dataset; each round one bucketed
      join attaches drains and one sorted-scan fold sums the moved
      mass (the driver sees only the O(1) active-row count); the
      final accum is ONE fold over all per-round mass views. Rounds =
      max drain-path depth — the honest cost of the recurrence.

    The strictly-lower drain rule guarantees termination; exceeding
    ``max_rounds`` raises loudly rather than returning partial
    counts."""
    import ray.data

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    codes = codes.materialize()
    n = codes.count()
    eng = mode if mode != "auto" else (
        "broadcast" if n <= broadcast_cap else "shuffle")

    if eng == "broadcast":
        df = codes.to_pandas()
        cells = df["cell"].to_numpy().astype(np.int64)
        code = df["code"].to_numpy().astype(np.int64)
        order = np.argsort(cells)
        cells, code = cells[order], code[order]
        dirs = np.asarray(D8_DIRS, dtype=np.int64)
        cx, cy = unpack(cells)
        succ = np.full(len(cells), -1, dtype=np.int64)
        m = code > 0
        drain = pack(cx[m] + dirs[code[m] - 1, 0],
                     cy[m] + dirs[code[m] - 1, 1])
        pos = np.searchsorted(cells, drain)
        if not np.array_equal(cells[pos], drain):
            raise ValueError(
                "flow accumulation: a cell drains to a coordinate "
                "absent from the DEM — the D8 codes are inconsistent "
                "with the cell set (typed so python -O cannot skip it)")
        succ[m] = pos
        acc = np.ones(len(cells), dtype=np.int64)
        mass = np.ones(len(cells), dtype=np.int64)
        for _ in range(max_rounds):
            live = (mass > 0) & (succ >= 0)
            if not live.any():
                return ray.data.from_arrow(pa.table({
                    "cell": pa.array(cells), "accum": pa.array(acc)}))
            nxt = np.zeros(len(cells), dtype=np.int64)
            np.add.at(nxt, succ[live], mass[live])
            acc += nxt
            mass = nxt
        raise RuntimeError(
            f"flow_accumulation: no fixpoint in {max_rounds} rounds "
            "(cycle? drains must be strictly descending)")

    dirs = np.asarray(D8_DIRS, dtype=np.int64)

    def drains(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = k > 0
        cx, cy = unpack(c[m])
        d = dirs[k[m] - 1]
        return pa.table({"cell": pa.array(c[m]),
                         "drain": pa.array(pack(cx + d[:, 0],
                                                cy + d[:, 1]))})

    drain_map = codes.map_batches(drains, batch_format="pyarrow").materialize()
    nb = max(1, min(64, n // 250_000 + 1))
    mass = codes.map_batches(
        lambda t: pa.table({"cell": t["cell"],
                            "m": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow").materialize()
    views = [mass]
    for _ in range(max_rounds):
        moved = bucketed_join(mass, drain_map, on="cell",
                              num_buckets=nb).map_batches(
            lambda t: pa.table({"cell": t["drain"], "m": t["m"]}),
            batch_format="pyarrow")
        mass = sorted_fold_sums(moved, "cell", ["m"]).materialize()
        if mass.count() == 0:
            break
        views.append(mass)
    else:
        raise RuntimeError(
            f"flow_accumulation: no fixpoint in {max_rounds} rounds "
            "(cycle? drains must be strictly descending)")
    acc = views[0]
    for v in views[1:]:
        acc = acc.union(v)
    return sorted_fold_sums(acc, "cell", ["m"]).map_batches(
        lambda t: pa.table({"cell": t["cell"], "accum": t["m"]}),
        batch_format="pyarrow")


def ruggedness(partials):
    """Terrain Ruggedness Index: (cell, z) partials -> (cx, cy, tri,
    n_nbr) where tri = sum of |z_neighbor - z_center| over existing
    8-neighbors. UNLIKE the gradient, the absolute value is nonlinear
    in z, so partials must total first; each total then scatters its
    raw z to its neighbors, one bucketed join attaches the receiving
    cell's own z (inner: phantom receivers and isolated cells drop
    out on both sides), and one sorted fold sums |z_n - z_c| and the
    neighbor count."""
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    totals = sorted_fold_sums(partials, "cell", ["z"]).materialize()

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = unpack(c)
        outs = []
        for dx, dy in D8_DIRS:
            outs.append(pa.table({
                "cell": pa.array(pack(cx - dx, cy - dy)),
                "zn": pa.array(z)}))
        return pa.concat_tables(outs)

    nb = max(1, min(64, totals.count() // 250_000 + 1))
    joined = bucketed_join(
        totals.map_batches(scatter, batch_format="pyarrow"),
        totals, on="cell", num_buckets=nb)

    def diff(batch: pa.Table) -> pa.Table:
        zn = batch["zn"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cell": batch["cell"],
            "tri": pa.array(np.abs(zn - z)),
            "n_nbr": pa.array(np.ones(len(zn), np.int64))})

    folded = sorted_fold_sums(
        joined.map_batches(diff, batch_format="pyarrow"),
        "cell", ["tri", "n_nbr"])

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "tri": batch["tri"].cast(pa.int64()),
            "n_nbr": batch["n_nbr"].cast(pa.int64())})

    return folded.map_batches(fmt, batch_format="pyarrow")


def lbp_histogram(partials):
    """Local Binary Patterns over the cell DEM — the classic texture
    descriptor: per cell with >=1 occupied D8 neighbor,
    code = sum over D8_DIRS index i of 2^i * [z(neighbor_i) > z(c)]
    (an ABSENT neighbor contributes bit 0 — the standard sparse-raster
    padding; isolated cells drop out, as in :func:`ruggedness`);
    output is the corpus histogram keyed by (n_nbr, code) so the
    support is explicit. Same scatter + one-bucketed-join + fold
    shape as ruggedness (the comparison is nonlinear, so totals
    scatter raw z), plus one more keyed fold for the histogram."""
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    totals = sorted_fold_sums(partials, "cell", ["z"]).materialize()

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = unpack(c)
        outs = []
        for i, (dx, dy) in enumerate(D8_DIRS):
            # receiver r = s - d_i: from r's view the source sits at
            # offset +d_i, i.e. it IS r's neighbor i
            outs.append(pa.table({
                "cell": pa.array(pack(cx - dx, cy - dy)),
                "zn": pa.array(z),
                "w": pa.array(np.full(len(z), 1 << i, np.int64))}))
        return pa.concat_tables(outs)

    nb = max(1, min(64, totals.count() // 250_000 + 1))
    joined = bucketed_join(
        totals.map_batches(scatter, batch_format="pyarrow"),
        totals, on="cell", num_buckets=nb)

    def bits(batch: pa.Table) -> pa.Table:
        zn = batch["zn"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cell": batch["cell"],
            "code": pa.array(np.where(zn > z, w, 0)),
            "sup": pa.array(np.ones(len(z), np.int64))})

    folded = sorted_fold_sums(
        joined.map_batches(bits, batch_format="pyarrow"),
        "cell", ["code", "sup"])

    def hist_partial(batch: pa.Table) -> pa.Table:
        sup = batch["sup"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(sup * 256 + code, return_counts=True)
        return pa.table({"sc": pa.array(u),
                         "n_cells": pa.array(cnt.astype(np.int64))})

    hist = sorted_fold_sums(
        folded.map_batches(hist_partial, batch_format="pyarrow"),
        "sc", ["n_cells"])

    def fmt(batch: pa.Table) -> pa.Table:
        sc = batch["sc"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_nbr": pa.array(sc // 256), "code": pa.array(sc % 256),
            "n_cells": batch["n_cells"].cast(pa.int64())})

    return hist.map_batches(fmt, batch_format="pyarrow")


def laplacian_levels(partials, n_levels: int = 2):
    """Laplacian-pyramid band energies over the cell DEM (domain:
    non-negative cell coords): level l+1 = 2x2 SUM pooling of level l
    (linear — partials commute with pooling), band residual at an
    occupied level-l cell = 4*z_l(c) - z_{l+1}(parent(c)) (nearest
    reconstruction; exact integers). Emits one row per band:
    (level, n_cells, sum_abs_lap, sum_z) plus the coarsest base row
    where the "residual" is the signal itself. Pooling is a keyed
    fold per level; the parent attach is one bucketed join; the three
    per-band scalars reduce via O(#blocks) partials."""
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    levels = [sorted_fold_sums(partials, "cell", ["z"]).materialize()]
    for _ in range(n_levels):
        def to_parent(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
            cx, cy = unpack(c)
            return pa.table({"cell": pa.array(pack(cx // 2, cy // 2)),
                             "z": batch["z"]})

        levels.append(sorted_fold_sums(
            levels[-1].map_batches(to_parent, batch_format="pyarrow"),
            "cell", ["z"]).materialize())

    rows = []
    broadcast_cap = 4_000_000
    for lvl in range(n_levels):
        def child_key(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
            cx, cy = unpack(c)
            return pa.table({"pkey": pa.array(pack(cx // 2, cy // 2)),
                             "z": batch["z"]})

        children = levels[lvl].map_batches(child_key,
                                           batch_format="pyarrow")
        # two-engine parent attach: the parent level is 4x smaller, so
        # up to the cap it broadcasts as sorted arrays (one searchsorted
        # per child batch, no shuffle); above it, one grace join
        if levels[lvl + 1].count() <= broadcast_cap:
            import ray as _ray

            # driver-local argsort of the <=cap parent table — cheaper
            # than a distributed sort job at this size
            pt = levels[lvl + 1].to_pandas()
            pk = pt["cell"].to_numpy().astype(np.int64)
            pz = pt["z"].to_numpy().astype(np.int64)
            order = np.argsort(pk, kind="stable")
            pref = _ray.put((pk[order], pz[order]))

            def attach(batch: pa.Table, pref=pref) -> pa.Table:
                pk, pz = _ray.get(pref)
                key = batch["pkey"].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return batch.append_column(
                    "z_r", pa.array(pz[np.searchsorted(pk, key)]))

            joined = children.map_batches(attach, batch_format="pyarrow")
        else:
            joined = bucketed_join(children, levels[lvl + 1], on="pkey",
                                   right_on="cell", num_buckets=8)

        def band_partial(batch: pa.Table) -> pa.Table:
            zc = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
            zp = batch["z_r"].to_numpy(zero_copy_only=False).astype(np.int64)
            lap = np.abs(4 * zc - zp)
            return pa.table({
                "n_cells": pa.array([len(zc)], pa.int64()),
                "sum_abs_lap": pa.array([int(lap.sum())], pa.int64()),
                "sum_z": pa.array([int(zc.sum())], pa.int64())})

        parts = joined.map_batches(band_partial, batch_format="pyarrow",
                                   batch_size=None).take_all()
        rows.append((lvl, sum(r["n_cells"] for r in parts),
                     sum(r["sum_abs_lap"] for r in parts),
                     sum(r["sum_z"] for r in parts)))

    def base_partial(batch: pa.Table) -> pa.Table:
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "n_cells": pa.array([len(z)], pa.int64()),
            "sum_abs_lap": pa.array([int(np.abs(z).sum())], pa.int64()),
            "sum_z": pa.array([int(z.sum())], pa.int64())})

    parts = levels[n_levels].map_batches(
        base_partial, batch_format="pyarrow", batch_size=None).take_all()
    rows.append((n_levels, sum(r["n_cells"] for r in parts),
                 sum(r["sum_abs_lap"] for r in parts),
                 sum(r["sum_z"] for r in parts)))
    lv, nc, sa, sz = zip(*rows)
    return pa.table({
        "level": pa.array(lv, pa.int64()),
        "n_cells": pa.array(nc, pa.int64()),
        "sum_abs_lap": pa.array(sa, pa.int64()),
        "sum_z": pa.array(sz, pa.int64())})
