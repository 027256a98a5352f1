"""From-scratch hierarchical cell index (H3/S2-style int64 ids).

The reference's only hierarchy is the z18/z19 tile pyramid itself
(parent tile = ``tx >> 1``; ``scale = 1 << z`` at lib/layers.py:34).
The engine generalizes that into a proper cell index on the Mercator
lattice, pure numpy, no h3/s2 dependency:

- a cell at resolution ``r`` is the slippy tile ``(x, y)`` at zoom
  ``r`` on the PLAIN scheme (no provider offsets — cells are a
  partitioning construct, not an imagery construct);
- packed id layout (int64): ``res`` in bits 58..63, ``x`` in bits
  29..57, ``y`` in bits 0..28 — the same packing as tile keys but
  without the negative-index bias (cells are always in range);
- ``parent / children`` walk the quadtree; ``k_ring`` returns the
  Chebyshev-distance-<=k neighborhood with x wrapped modulo 2^res
  (antimeridian) and y clipped (poles).

Cells are the engine's partition / shuffle / salt key: features and
images are co-bucketed by a coarse cell (default ``COARSE_RES`` = 12)
for spatial joins, and hot cells are salted for skew control.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 29
COARSE_RES = 12  # default co-partitioning resolution for spatial joins

_XY_MASK = (1 << 29) - 1


def pack(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (np.int64(res) << 58) | (x << 29) | y


def unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    return (cell >> 29) & _XY_MASK, cell & _XY_MASK, cell >> 58


def cell_at(lat: np.ndarray, lng: np.ndarray, res: int) -> np.ndarray:
    """WGS84 point -> containing cell id at resolution ``res``."""
    from osmray.tilemath import tile_at_wgs

    tx, ty, _, _ = tile_at_wgs(lat, lng, res)
    n = np.int64(1) << res
    tx = np.mod(tx, n)  # wrap antimeridian
    ty = np.clip(ty, 0, n - 1)
    return pack(tx, ty, res)


def cell_of_tile(tx: np.ndarray, ty: np.ndarray, z: int, res: int) -> np.ndarray:
    """Containing cell (res <= z) of a tile at zoom z — pure bit math,
    the scale-out generalization of parent = tx >> 1."""
    if res > z:
        raise ValueError(f"cell res {res} finer than tile zoom {z}")
    tx = np.asarray(tx, dtype=np.int64) >> (z - res)
    ty = np.asarray(ty, dtype=np.int64) >> (z - res)
    n = np.int64(1) << res
    return pack(np.mod(tx, n), np.clip(ty, 0, n - 1), res)


def parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    x, y, res = unpack(cell)
    new_res = res - steps
    if np.any(new_res < 0):
        raise ValueError("parent below resolution 0")
    return (new_res << 58) | ((x >> steps) << 29) | (y >> steps)


def children(cell: int) -> np.ndarray:
    """The 4 direct children of a single cell."""
    x, y, res = (int(v[0]) for v in unpack(np.asarray([cell])))
    xs = np.array([2 * x, 2 * x + 1, 2 * x, 2 * x + 1], dtype=np.int64)
    ys = np.array([2 * y, 2 * y, 2 * y + 1, 2 * y + 1], dtype=np.int64)
    return pack(xs, ys, res + 1)


def k_ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 block),
    x wrapped, y clipped; sorted, deduplicated."""
    x, y, res = (int(v[0]) for v in unpack(np.asarray([cell])))
    n = 1 << res
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = np.mod(x + dx.ravel(), n)
    ys = y + dy.ravel()
    keep = (ys >= 0) & (ys < n)
    return np.unique(pack(xs[keep], ys[keep], res))


def ring(cell: int, k: int) -> np.ndarray:
    """The hollow ring at exactly Chebyshev distance k (k=0 -> the cell
    itself) — the expansion unit for kNN search."""
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    x, y, res = (int(v[0]) for v in unpack(np.asarray([cell])))
    n = 1 << res
    offs = []
    for d in range(-k, k + 1):
        offs.append((d, -k))
        offs.append((d, k))
    for d in range(-k + 1, k):
        offs.append((-k, d))
        offs.append((k, d))
    arr = np.array(offs, dtype=np.int64)
    xs = np.mod(x + arr[:, 0], n)
    ys = y + arr[:, 1]
    keep = (ys >= 0) & (ys < n)
    return np.unique(pack(xs[keep], ys[keep], res))


def salted(cell: np.ndarray, salt_src: np.ndarray, num_salts: int) -> np.ndarray:
    """Skew control: spread one hot cell over ``num_salts`` sub-keys.

    ``salt_src`` is any int64 column (e.g. hashed image_id); the salt
    only balances map-side work — ``unsalt`` before any per-cell
    aggregate.  Compact reversible layout (requires the coarse-cell
    regime, res <= 24 and num_salts <= 1024, which partition keys
    always satisfy): ``((x * 2^res + y) * num_salts + salt) * 32 + res``.
    """
    x, y, res = unpack(cell)
    if np.any(res > 24) or num_salts > 1024:
        raise ValueError("salted keys are for coarse partition cells (res<=24, salts<=1024)")
    mixed = np.asarray(salt_src, dtype=np.int64).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )
    salt = (mixed % np.uint64(num_salts)).astype(np.int64)
    flat = (x << res) + y
    return (flat * np.int64(num_salts) + salt) * np.int64(32) + res


def unsalt(key: np.ndarray, num_salts: int) -> np.ndarray:
    """Recover the unsalted cell id from a ``salted`` key."""
    key = np.asarray(key, dtype=np.int64)
    res = key % 32
    flat = (key // 32) // np.int64(num_salts)
    y = flat & ((np.int64(1) << res) - 1)
    x = flat >> res
    return (res << 58) | (x << 29) | y


def polyfill_box(x0: int, y0: int, x1: int, y1: int, res: int) -> np.ndarray:
    """All cells at ``res`` in the inclusive coordinate box — the
    H3-polyfill analog for the quadtree lattice (bbox covering set)."""
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return pack(xs.ravel(), ys.ravel(), res)


def uncompact(cells: np.ndarray, res: int) -> np.ndarray:
    """Expand a mixed-resolution cell set to its full descendant set
    at ``res`` (inverse of ``compact_array``); vectorized per
    resolution level."""
    cells = np.asarray(cells, dtype=np.int64)
    x, y, r = unpack(cells)
    if np.any(r > res):
        raise ValueError("uncompact target res coarser than an input cell")
    out = []
    for rv in np.unique(r):
        k = int(res - rv)
        sel = r == rv
        side = 1 << k
        dx, dy = np.meshgrid(np.arange(side), np.arange(side))
        dx, dy = dx.ravel(), dy.ravel()
        ox = (x[sel, None] << k) + dx[None, :]
        oy = (y[sel, None] << k) + dy[None, :]
        out.append(pack(ox.ravel(), oy.ravel(), res))
    return np.unique(np.concatenate(out)) if out else cells


def compact_array(cells: np.ndarray, stop_res: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """In-memory H3-style compact of a UNIFORM-resolution cell set:
    every complete sibling quad is replaced by its parent, recursively,
    until ``stop_res``. Returns ``(final, promoted)`` — ``final`` are
    cells (res > stop_res) that can never promote further; ``promoted``
    are the survivors AT ``stop_res`` (may promote further globally).
    Pure numpy: one unique+counts pass per level."""
    cur = np.unique(np.asarray(cells, dtype=np.int64))
    if len(cur) == 0:
        return cur, cur
    res = int(cur[0] >> 58)
    if np.any(cur >> 58 != res):
        raise ValueError("compact_array requires a uniform-resolution input")
    out = []
    while res > stop_res and len(cur):
        par = parent(cur)
        u, inv, counts = np.unique(par, return_inverse=True, return_counts=True)
        promoted = counts == 4
        out.append(cur[~promoted[inv]])
        cur = u[promoted]
        res -= 1
    final = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return np.sort(final), cur


def compact_cells(cells_ds, cell_col: str = "cell", coarse_res: int = 4):
    """Distributed compact of a Dataset of same-res cells — TWO
    shuffles at ANY depth/scale.

    Promotion can never cross a cell's res-``coarse_res`` ancestor
    boundary (siblings share their parent, hence every coarser
    ancestor), so pass 1 groups by that ancestor and compacts each
    group in memory down to ``coarse_res``. Pass 2 finishes the
    ≤ 4^coarse_res survivors AT ``coarse_res`` in one bounded task
    (256 cells worldwide at the default res 4). Output: (cell, res),
    mixed resolutions, disjoint, union-equivalent to the input."""
    import pyarrow as pa

    def keyed(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        res = c >> 58
        if np.any(res <= coarse_res):
            raise ValueError("compact_cells input must be finer than coarse_res")
        anc = (np.int64(coarse_res) << 58) | (
            (((c >> 29) & _XY_MASK) >> (res - coarse_res)) << 29
        ) | ((c & _XY_MASK) >> (res - coarse_res))
        return pa.table({cell_col: pa.array(c), "__anc": pa.array(anc)})

    def per_group(g: pa.Table) -> pa.Table:
        final, promoted = compact_array(
            g[cell_col].to_numpy(zero_copy_only=False), stop_res=coarse_res
        )
        cells = np.concatenate((final, promoted))
        return pa.table({cell_col: pa.array(cells),
                         "__final": pa.array(cells >> 58 > coarse_res)})

    pass1 = (
        cells_ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("__anc")
        .map_groups(per_group, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        fin = batch["__final"].to_numpy(zero_copy_only=False)
        done = c[fin]
        rest = c[~fin]  # survivors at coarse_res: bounded by 4^coarse_res
        f2, p2 = compact_array(rest, stop_res=0) if len(rest) else (rest, rest)
        cells = np.concatenate((done, f2, p2))
        return pa.table({cell_col: pa.array(cells),
                         "res": pa.array((cells >> 58).astype(np.int64))})

    # repartition(1): the finish task is bounded by construction —
    # pass-1 finals pass through untouched; only the ≤ 4^coarse_res
    # coarse survivors are re-compacted.
    return pass1.repartition(1).map_batches(finish, batch_format="pyarrow",
                                            batch_size=None)

def rollup_cells(points_cells_ds, cell_col: str = "cell",
                 levels: tuple = (8, 6, 4, 2, 0)):
    """Hierarchical ROLLUP: occupancy counts of the input cells at
    EVERY listed ancestor resolution, in ONE pass + ONE shuffle of
    bounded partials. The map side emits, per block, a partial count
    per (ancestor cell) for all levels at once (the ancestor of a
    res-r cell at res-a is a pure bit shift), so the groupby shuffles
    at most ``levels x distinct-cells-per-block`` pre-aggregated rows
    — never the input points. Output: (cell, res, n)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch[cell_col].to_numpy(zero_copy_only=False),
                       dtype=np.int64)
        res = c >> 58
        out_c, out_n = [], []
        for a in levels:
            if np.any(res < a):
                raise ValueError("rollup_cells: input coarser than a level")
            anc = (np.int64(a) << 58) | (
                (((c >> 29) & _XY_MASK) >> (res - a)) << 29
            ) | ((c & _XY_MASK) >> (res - a))
            u, n = np.unique(anc, return_counts=True)
            out_c.append(u)
            out_n.append(n.astype(np.int64))
        cc = np.concatenate(out_c)
        return pa.table({cell_col: pa.array(cc),
                         "n": pa.array(np.concatenate(out_n))})

    agg = (
        points_cells_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(cell_col)
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("res", pa.array((c >> 58).astype(np.int64)))

    return agg.map_batches(finish, batch_format="pyarrow")


def quadtree_leaves(cells_ds, cell_col: str = "cell", max_res: int = 6,
                    cap: int = 64):
    """Adaptive quadtree refinement — the data-dependent spatial
    partitioner: starting from the root cell, split every cell holding
    more than ``cap`` points until ``max_res``. Input: a Dataset of
    res-``max_res`` point cells. Output: the occupied LEAF cells as
    ``(res, cx, cy, n)`` — a cell is a leaf iff its every ancestor
    holds > ``cap`` points and it holds <= ``cap`` (or it sits at
    ``max_res``, the forced-leaf floor).

    Scale shape: ONE bounded keyed shuffle (the ``rollup_cells``
    pyramid counts — map-side partials per block, never the points)
    followed by one finish task whose input is bounded by the
    occupied-cell pyramid (<= sum_k 4^k rows, already aggregated).
    The leaf rule needs only each cell's own count and its parent's:
    parent > cap implies every higher ancestor > cap (counts are
    monotone up the pyramid), so a single parent lookup suffices.
    """
    levels = tuple(range(max_res, -1, -1))
    roll = rollup_cells(cells_ds, cell_col=cell_col, levels=levels)

    def finish(batch):
        import pyarrow as pa

        c = batch[cell_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        res = c >> 58
        x = (c >> 29) & _XY_MASK
        y = c & _XY_MASK
        order = np.argsort(c, kind="stable")
        cs, ns = c[order], n[order]
        parent = ((res - 1) << 58) | ((x >> 1) << 29) | (y >> 1)
        pos = np.searchsorted(cs, parent)
        # every non-root occupied cell's parent is occupied, so the
        # lookup always hits; guard anyway for the root rows
        pos = np.clip(pos, 0, len(cs) - 1)
        pn = np.where(res == 0, np.int64(cap) + 1, ns[pos])
        leaf = (pn > cap) & ((n <= cap) | (res == max_res))
        return pa.table({
            "res": pa.array(res[leaf]),
            "cx": pa.array(x[leaf]),
            "cy": pa.array(y[leaf]),
            "n": pa.array(n[leaf]),
        })

    # bounded by construction: the rollup output is aggregated cells,
    # not points, and the parent rule needs the whole pyramid at once
    return roll.repartition(1).map_batches(finish, batch_format="pyarrow",
                                           batch_size=None)


GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(x: np.ndarray, y: np.ndarray, chars: int = 6) -> np.ndarray:
    """Vectorized geohash of integer grid coordinates: interleave
    ``chars*5 // 2 + chars*5 % 2`` bits of x (even positions, MSB
    first) with bits of y (odd positions) — the standard geohash bit
    order with x playing longitude — then emit ``chars`` base32
    characters. Input coordinates must already be scaled to the
    geohash lattice (x in [0, 2^ceil(5c/2)), y in [0, 2^floor(5c/2))):
    this engine's world is an integer web-mercator grid, so the
    lat/lng -> lattice step is the caller's dyadic shift, keeping the
    whole path exact (and SQL-replayable). Returns a numpy array of
    ``chars``-byte ASCII strings; purely elementwise — no shuffle."""
    return geohash_str(geohash_code(x, y, chars), chars)


def geohash_code(x: np.ndarray, y: np.ndarray, chars: int = 6) -> np.ndarray:
    """The integer half of geohash_encode: the ``chars*5``-bit
    interleaved code, MSB-aligned (bit nbits-1 is x's top bit). Keys
    for aggregation/shuffle stay integer; stringify post-aggregate
    with geohash_str."""
    nbits = chars * 5
    nx = (nbits + 1) // 2
    ny = nbits // 2
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    code = np.zeros(len(x), dtype=np.int64)
    for i in range(nx):  # x bit i (from MSB) -> code bit nbits-1-2i
        code |= ((x >> (nx - 1 - i)) & 1) << (nbits - 1 - 2 * i)
    for i in range(ny):
        code |= ((y >> (ny - 1 - i)) & 1) << (nbits - 2 - 2 * i)
    return code


def geohash_str(code: np.ndarray, chars: int) -> np.ndarray:
    """Base32 rendering of a ``chars*5``-bit geohash code (or any
    5*chars-bit prefix of one)."""
    code = np.asarray(code, dtype=np.int64)
    out = np.empty((len(code), chars), dtype=np.uint8)
    alphabet = np.frombuffer(GEOHASH32.encode(), dtype=np.uint8)
    for c in range(chars):
        out[:, c] = alphabet[(code >> (5 * (chars - 1 - c))) & 31]
    return out.view(f"S{chars}").ravel().astype(str)


# --- hexagonal cell index (H3-style topology, exact integer math) ---

HEX_W = 4096   # horizontal center pitch (odd rows offset HEX_W/2)
HEX_H = 3547   # row pitch ~ HEX_W*sqrt(3)/2 -> near-regular hexagons


def hex_at(x: np.ndarray, y: np.ndarray,
           w: int = HEX_W, h: int = HEX_H) -> np.ndarray:
    """Hexagonal cell assignment: nearest center of the staggered
    lattice (even rows at x = i*w, odd rows offset w/2, row pitch h)
    under the exact integer Euclidean metric — the Voronoi regions
    are hexagons (regular up to the lattice aspect; h = w*sqrt(3)/2
    rounded). Only the two rows bounding y can host the nearest
    center (exact for w <= h*sqrt(3), which holds here), so the
    assignment is two candidate evaluations, all-integer and
    SQL-replayable; a row tie breaks to the smaller row, a column
    midpoint rounds half-up to the larger col. Requires
    x, y >= 0. Returns packed ``row * 32768 + col``."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    j1 = y // h
    best_d = None
    best_key = None
    for j in (j1, j1 + 1):
        off = (j % 2) * (w // 2)
        i = (2 * (x - off) + w) // (2 * w)
        d = (x - (i * w + off)) ** 2 + (y - j * h) ** 2
        key = j * 32768 + i
        if best_d is None:
            best_d, best_key = d, key
        else:
            take = d < best_d
            best_key = np.where(take, key, best_key)
            best_d = np.where(take, d, best_d)
    return best_key


def hex_neighbors(cell: np.ndarray) -> np.ndarray:
    """The 6 hex neighbors of each packed cell (offset-coordinate
    adjacency on the staggered lattice), shape (n, 6). Neighbors
    falling off the lattice (col < 0, col >= 32768, or row < 0) are
    -1, never a wrapped-around valid-looking key — boundary cells of
    a wide grid must not silently connect to the opposite edge."""
    cell = np.asarray(cell, dtype=np.int64)
    j = cell // 32768
    i = cell % 32768
    odd = j % 2
    di = np.stack([np.full_like(i, -1), np.full_like(i, 1),
                   odd - 1, odd, odd - 1, odd], axis=1)
    dj = np.stack([np.zeros_like(j), np.zeros_like(j),
                   np.full_like(j, -1), np.full_like(j, -1),
                   np.full_like(j, 1), np.full_like(j, 1)], axis=1)
    ni = i[:, None] + di
    nj = j[:, None] + dj
    out = nj * 32768 + ni
    out[(ni < 0) | (ni >= 32768) | (nj < 0)] = -1
    return out


# --- Hilbert curve index (S2-style locality key) ---


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized Hilbert-curve index of (x, y) on a 2^order lattice
    (the S2-style locality key: unlike Morton, every curve step is a
    unit grid step, so 1-D ranges are tighter 2-D regions). Standard
    xy2d bit walk with quadrant rotations, pure numpy; the curve is
    pinned by the unit-step + bijectivity tests, which are the
    defining Hilbert properties (orientation is a fixed variant).
    The recurrence keeps x, y masked to [0, 2s) at every step (the
    top bit is consumed, then the flip operates on the masked value),
    so every intermediate is non-negative — the property that lets
    the unrolled SQL twin use plain // and % (DuckDB truncates
    negative division, so a signed recurrence would diverge)."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = 1 << (order - 1)
    while s > 0:
        rx = (x >= s).astype(np.int64)  # x, y in [0, 2s) by invariant
        ry = (y >= s).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        x = x - rx * s
        y = y - ry * s
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = np.where(flip, s - 1 - x, x)
        yf = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hrw_shard(keys: np.ndarray, n_shards: int) -> np.ndarray:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to argmax over shards of a keyed hash — the consistent
    partitioner whose resize guarantee is structural: growing from N
    to N+1 shards moves ONLY the keys that win on the new shard (an
    expected 1/(N+1) fraction), never between old shards. Purely
    elementwise (a (n, n_shards) hash matrix argmax), SQL-replayable;
    ties break to the smaller shard. The per-shard multiplier is a
    cubic mix of the shard id — a LINEAR mix of s makes h(k, .) an
    arithmetic progression mod p whose argmax is badly skewed (2x
    measured imbalance); the cubic gives each shard an independent
    multiplier and measured balance within 2% of ideal."""
    k = np.asarray(keys, dtype=np.int64)[:, None]
    s = np.arange(n_shards, dtype=np.int64)[None, :]
    ms = ((s + 1) ** 3 * 2654435761 + (s + 1) * 40503) % 1048573
    hv = (k * ms + ms * ms) % 1048573
    return np.argmax(hv, axis=1).astype(np.int64)
