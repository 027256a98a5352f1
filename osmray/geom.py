"""Vector geometry: bbox aggregates, analytic point-in-polygon,
point-segment distances, and the cell-bucketed feature index used by
the stateful join/mask/kNN actors.

The reference had no analytic PIP (polygon membership existed only via
the cv2 raster path, lib/helpers.py:90-94); the north_rule adds it:
"prepared-geometry point-in-polygon (ray-casting over STRtree-bucketed
cells)" and "cell-ring-expansion kNN for nearest-feature lookup".

Design notes for scale:
- The index buckets features by coarse cell (osmray.cells.COARSE_RES)
  — the STRtree role is played by the cell grid itself, which is also
  the shuffle/partition key, so an actor can hold ONLY the buckets its
  partition needs.
- "Prepared" means per-polygon edge tables are precomputed as numpy
  arrays once (at index build), so each PIP probe is a vectorized
  crossing count, not a Python loop over vertices.
- All candidate lookups are half-open even-odd semantics identical to
  ``oracle.point_in_polygon``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from osmray import cells as cellmod
from osmray.tilemath import project2web


def latlngs_from_wkt(string: str) -> list[list[tuple[float, float]]]:
    """Parse one WKT POLYGON per line into rings of (lat, lng) —
    preserving the reference's quirks (regex float extraction; WKT's
    lon-lat order swapped into lat-lng; lib/helpers.py:217-226)."""
    import re

    out = []
    for line in string.splitlines():
        nums = [float(s) for s in re.findall(r"[-]?\d*\.\d+|\d+", line)]
        out.append(list(zip(nums[1::2], nums[::2])))
    return out


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    """(W, S, E, N) of an (n, 2) [lat, lng] ring — the reference's
    min/max window aggregate (lib/layers.py:249-256)."""
    lat = ring[:, 0]
    lng = ring[:, 1]
    return float(lng.min()), float(lat.min()), float(lng.max()), float(lat.max())


def points_in_ring(lat: np.ndarray, lng: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-cast: which of the points fall inside
    the (n, 2) [lat, lng] ring. Horizontal ray towards +lng; half-open
    edge rule (la0 <= lat < la1), matching oracle.point_in_polygon."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    la0 = ring[:, 0]
    ln0 = ring[:, 1]
    la1 = np.roll(la0, -1)
    ln1 = np.roll(ln0, -1)
    keep = la0 != la1
    la0, ln0, la1, ln1 = la0[keep], ln0[keep], la1[keep], ln1[keep]
    if len(la0) == 0:
        return np.zeros(lat.shape, dtype=bool)
    # (points, edges) crossing matrix
    lo = np.minimum(la0, la1)
    hi = np.maximum(la0, la1)
    spans = (lat[:, None] >= lo[None, :]) & (lat[:, None] < hi[None, :])
    t = (lat[:, None] - la0[None, :]) / (la1 - la0)[None, :]
    xcross = ln0[None, :] + t * (ln1 - ln0)[None, :]
    crossings = (spans & (xcross > lng[:, None])).sum(axis=1)
    return (crossings % 2).astype(bool)


def point_segment_dist2_web(
    pwx: float, pwy: float, swx: np.ndarray, swy: np.ndarray, ewx: np.ndarray, ewy: np.ndarray
) -> np.ndarray:
    """Squared distance (in unscaled web units) from one point to each
    of N segments — the exact-ranking kernel behind kNN."""
    dx = ewx - swx
    dy = ewy - swy
    len2 = dx * dx + dy * dy
    t = np.where(len2 > 0, ((pwx - swx) * dx + (pwy - swy) * dy) / np.where(len2 > 0, len2, 1), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx = swx + t * dx
    cy = swy + t * dy
    return (pwx - cx) ** 2 + (pwy - cy) ** 2


@dataclass
class _Bucket:
    feature_ids: list = field(default_factory=list)
    kinds: list = field(default_factory=list)
    geoms_web: list = field(default_factory=list)  # (n, 2) [wx, wy]
    geoms_wgs: list = field(default_factory=list)  # (n, 2) [lat, lng]


class FeatureIndex:
    """Cell-bucketed prepared feature index.

    Built ONCE (driver side or actor ``__init__`` from a broadcast
    ref); each feature is registered in every coarse cell its bbox
    touches, with geometry pre-projected to web coordinates. Probes:

    - ``pip(lat, lng)``      -> polygon feature_ids containing each point
    - ``knn(lat, lng, k)``   -> k nearest features by exact
      web-coordinate distance, found by expanding cell rings until
      the ring lower-bound exceeds the current k-th best (so results
      equal brute force).
    """

    def __init__(self, res: int = cellmod.COARSE_RES):
        self.res = res
        self.buckets: dict[int, _Bucket] = {}
        self.n_features = 0

    def add(self, feature_id: int, kind: str, geom_latlng: np.ndarray) -> None:
        geom_latlng = np.asarray(geom_latlng, dtype=np.float64).reshape(-1, 2)
        wx, wy = project2web(geom_latlng[:, 0], geom_latlng[:, 1])
        web = np.stack([wx, wy], axis=1)
        W, S, E, N = ring_bbox(geom_latlng)
        c0 = cellmod.cell_at(np.array([N]), np.array([W]), self.res)
        c1 = cellmod.cell_at(np.array([S]), np.array([E]), self.res)
        x0, y0, _ = cellmod.unpack(c0)
        x1, y1, _ = cellmod.unpack(c1)
        # cell_at wraps x modulo 2^res: a bbox crossing the
        # antimeridian yields x0 > x1 — split the x range (same fix
        # as from_table) so wrap-spanning features register everywhere
        if int(x0[0]) <= int(x1[0]):
            xrange = range(int(x0[0]), int(x1[0]) + 1)
        else:
            xrange = list(range(int(x0[0]), 1 << self.res)) + list(range(0, int(x1[0]) + 1))
        for cx in xrange:
            for cy in range(int(y0[0]), int(y1[0]) + 1):
                key = int(cellmod.pack(np.array([cx]), np.array([cy]), self.res)[0])
                b = self.buckets.setdefault(key, _Bucket())
                b.feature_ids.append(feature_id)
                b.kinds.append(kind)
                b.geoms_web.append(web)
                b.geoms_wgs.append(geom_latlng)
        self.n_features += 1

    @classmethod
    def from_table(cls, feats: "object", res: int = cellmod.COARSE_RES) -> "FeatureIndex":
        """Build from an Arrow table / dict-of-arrays with columns
        (feature_id, kind, geom_lat: list<f64>, geom_lng: list<f64>).
        Vertex projection and bbox/cell math are ONE vectorized pass
        over all features (the per-feature Python work is only the
        bucket appends)."""
        idx = cls(res)
        fid = np.asarray(feats["feature_id"])
        kind = feats["kind"]
        kind = kind.to_pylist() if hasattr(kind, "to_pylist") else list(kind)
        glat = feats["geom_lat"]
        glng = feats["geom_lng"]
        glat = glat.to_pylist() if hasattr(glat, "to_pylist") else list(glat)
        glng = glng.to_pylist() if hasattr(glng, "to_pylist") else list(glng)
        n = len(fid)
        if n == 0:
            return idx
        lens = np.asarray([len(g) for g in glat], dtype=np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        flat_lat = np.concatenate([np.asarray(g, dtype=np.float64) for g in glat])
        flat_lng = np.concatenate([np.asarray(g, dtype=np.float64) for g in glng])
        wx, wy = project2web(flat_lat, flat_lng)
        # per-feature bbox via reduceat (empty geoms impossible: lens>=1)
        la_min = np.minimum.reduceat(flat_lat, offs[:-1])
        la_max = np.maximum.reduceat(flat_lat, offs[:-1])
        ln_min = np.minimum.reduceat(flat_lng, offs[:-1])
        ln_max = np.maximum.reduceat(flat_lng, offs[:-1])
        c0 = cellmod.cell_at(la_max, ln_min, res)  # NW corner
        c1 = cellmod.cell_at(la_min, ln_max, res)  # SE corner
        x0, y0, _ = cellmod.unpack(c0)
        x1, y1, _ = cellmod.unpack(c1)
        for i in range(n):
            web = np.stack([wx[offs[i] : offs[i + 1]], wy[offs[i] : offs[i + 1]]], axis=1)
            wgs = np.stack(
                [flat_lat[offs[i] : offs[i + 1]], flat_lng[offs[i] : offs[i + 1]]], axis=1
            )
            f = int(fid[i])
            k = kind[i]
            base = res << 58
            # cell_at wraps x modulo 2^res: a bbox crossing the
            # antimeridian yields x0 > x1 — split the x range so
            # wrap-spanning features register in every touched cell
            if int(x0[i]) <= int(x1[i]):
                xrange = range(int(x0[i]), int(x1[i]) + 1)
            else:
                xrange = list(range(int(x0[i]), 1 << res)) + list(range(0, int(x1[i]) + 1))
            for cx in xrange:
                for cy in range(int(y0[i]), int(y1[i]) + 1):
                    key = base | (cx << 29) | cy
                    b = idx.buckets.setdefault(key, _Bucket())
                    b.feature_ids.append(f)
                    b.kinds.append(k)
                    b.geoms_web.append(web)
                    b.geoms_wgs.append(wgs)
        idx.n_features = n
        return idx

    def candidates(self, cell_keys: np.ndarray) -> tuple[np.ndarray, list]:
        """Distinct features registered in any of the given cells."""
        seen: dict[int, tuple] = {}
        for key in np.unique(np.asarray(cell_keys, dtype=np.int64)):
            b = self.buckets.get(int(key))
            if b is None:
                continue
            for i, f in enumerate(b.feature_ids):
                if f not in seen:
                    seen[f] = (b.kinds[i], b.geoms_web[i], b.geoms_wgs[i])
        ids = np.asarray(sorted(seen), dtype=np.int64)
        return ids, [seen[int(f)] for f in ids]

    def pip(self, lat: np.ndarray, lng: np.ndarray, kinds=("polygon",)) -> list[np.ndarray]:
        """For each point, the sorted feature_ids of polygons containing
        it. Points are grouped by coarse cell so each polygon's
        crossing test runs once per (cell, polygon) pair, vectorized
        over the cell's points."""
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        out: list[list[int]] = [[] for _ in range(len(lat))]
        cell = cellmod.cell_at(lat, lng, self.res)
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        bounds = np.flatnonzero(np.diff(sorted_cells)) + 1
        for grp in np.split(order, bounds):
            key = int(cell[grp[0]])
            b = self.buckets.get(key)
            if b is None:
                continue
            done: set[int] = set()
            for i, fid in enumerate(b.feature_ids):
                if b.kinds[i] not in kinds or fid in done:
                    continue
                done.add(fid)
                hit = points_in_ring(lat[grp], lng[grp], b.geoms_wgs[i])
                for j in np.flatnonzero(hit):
                    out[grp[j]].append(fid)
        return [np.asarray(sorted(o), dtype=np.int64) for o in out]

    def knn(self, lat: float, lng: float, k: int, max_ring: int = 64):
        """k nearest features to one point: expand cell rings; stop
        when the ring's guaranteed minimum distance exceeds the k-th
        best found. Returns (feature_ids, dist2_web) sorted ascending,
        ties broken by feature_id."""
        pwx, pwy = project2web(np.array([lat]), np.array([lng]))
        pwx, pwy = float(pwx[0]), float(pwy[0])
        cell = int(cellmod.cell_at(np.array([lat]), np.array([lng]), self.res)[0])
        cell_w = 256.0 / (1 << self.res)  # cell edge length in web units
        best: dict[int, float] = {}
        for r in range(max_ring + 1):
            if len(best) >= k:
                # lower bound on any feature in ring r: (r-1) cells away
                lb = ((r - 1) * cell_w) ** 2 if r >= 1 else 0.0
                kth = sorted(best.values())[k - 1]
                if lb > kth:
                    break
            ids, geoms = self.candidates(cellmod.ring(cell, r))
            for fid, (_kind, web, _wgs) in zip(ids, geoms):
                fid = int(fid)
                if fid in best:
                    continue
                if len(web) == 1:
                    d2 = float((pwx - web[0, 0]) ** 2 + (pwy - web[0, 1]) ** 2)
                else:
                    d2 = float(
                        point_segment_dist2_web(
                            pwx, pwy, web[:-1, 0], web[:-1, 1], web[1:, 0], web[1:, 1]
                        ).min()
                    )
                best[fid] = d2
        items = sorted(best.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        return (
            np.asarray([f for f, _ in items], dtype=np.int64),
            np.asarray([d for _, d in items], dtype=np.float64),
        )

    def knn_batch(self, lat: np.ndarray, lng: np.ndarray, k: int, max_ring: int = 64):
        """Vectorized kNN for a batch of points: points sharing a cell
        expand rings TOGETHER (one candidate fetch per (cell, ring))
        and distances are computed as (points x segments) matrix ops.
        The ring stops when the ring lower bound exceeds the GROUP's
        worst kth-best — a superset of each point's scalar expansion,
        so results are identical to ``knn`` (pytest-pinned).

        Returns (list of id arrays, list of d2 arrays), row-aligned."""
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        pwx, pwy = project2web(lat, lng)
        cells = cellmod.cell_at(lat, lng, self.res)
        cell_w = 256.0 / (1 << self.res)
        out_ids: list = [None] * len(lat)
        out_d2: list = [None] * len(lat)
        order = np.argsort(cells, kind="stable")
        cs = cells[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(cs)) + 1, [len(cs)]))
        for gi in range(len(bounds) - 1):
            idx = order[int(bounds[gi]) : int(bounds[gi + 1])]
            cell = int(cells[idx[0]])
            px = pwx[idx][:, None]
            py = pwy[idx][:, None]
            fids: list[int] = []
            dcols: list[np.ndarray] = []
            seen: set[int] = set()
            for r in range(max_ring + 1):
                if len(fids) >= k:
                    lb = ((r - 1) * cell_w) ** 2 if r >= 1 else 0.0
                    D = np.stack(dcols, axis=1)
                    kth = np.partition(D, k - 1, axis=1)[:, k - 1].max()
                    if lb > kth:
                        break
                ids, geoms = self.candidates(cellmod.ring(cell, r))
                for fid, (_kind, web, _wgs) in zip(ids, geoms):
                    fid = int(fid)
                    if fid in seen:
                        continue
                    seen.add(fid)
                    if len(web) == 1:
                        d2 = (px[:, 0] - web[0, 0]) ** 2 + (py[:, 0] - web[0, 1]) ** 2
                    else:
                        d2 = point_segment_dist2_web(
                            px, py, web[:-1, 0], web[:-1, 1], web[1:, 0], web[1:, 1]
                        ).min(axis=1)
                    fids.append(fid)
                    dcols.append(d2)
            if not fids:
                for i in idx:
                    out_ids[i] = np.zeros(0, dtype=np.int64)
                    out_d2[i] = np.zeros(0, dtype=np.float64)
                continue
            D = np.stack(dcols, axis=1)
            fid_arr = np.asarray(fids, dtype=np.int64)
            for li, i in enumerate(idx):
                o = np.lexsort((fid_arr, D[li]))[:k]
                out_ids[i] = fid_arr[o]
                out_d2[i] = D[li][o]
        return out_ids, out_d2

    def brute_knn(self, lat: float, lng: float, k: int):
        """Brute force over every feature — oracle for knn tests."""
        pwx, pwy = project2web(np.array([lat]), np.array([lng]))
        pwx, pwy = float(pwx[0]), float(pwy[0])
        seen: dict[int, float] = {}
        for b in self.buckets.values():
            for i, fid in enumerate(b.feature_ids):
                if fid in seen:
                    continue
                web = b.geoms_web[i]
                if len(web) == 1:
                    d2 = float((pwx - web[0, 0]) ** 2 + (pwy - web[0, 1]) ** 2)
                else:
                    d2 = float(
                        point_segment_dist2_web(
                            pwx, pwy, web[:-1, 0], web[:-1, 1], web[1:, 0], web[1:, 1]
                        ).min()
                    )
                seen[fid] = d2
        items = sorted(seen.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        return (
            np.asarray([f for f, _ in items], dtype=np.int64),
            np.asarray([d for _, d in items], dtype=np.float64),
        )

def ring_stats(xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray):
    """Vectorized shoelace statistics for MANY rings at once (closed
    implicitly: last vertex connects to first). ``offsets`` delimits
    rings in the flat coordinate arrays, ``len(offsets) == n_rings+1``.

    Returns (area2, perim2, cx_num, cy_num, n_vertices):
      area2   = signed 2x area  (shoelace sum; CCW positive)
      perim2  = sum of squared edge lengths (exact in integers,
                unlike the perimeter itself)
      c*_num  = centroid numerators; centroid = num / (3 * area2)

    Integer inputs stay integer (exact) — with |coord| < 2^19 the
    worst intermediate is ~2^62, inside int64. One pass, no Python
    loop over rings: the wraparound successor index is built once,
    then everything is elementwise + one reduceat per statistic."""
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(xs)
    if n == 0:
        z = np.zeros(0, dtype=xs.dtype if xs.dtype.kind in "iu" else np.float64)
        return z, z.copy(), z.copy(), z.copy(), np.zeros(0, np.int64)
    starts, ends = offsets[:-1], offsets[1:]
    nxt = np.arange(1, n + 1)
    nxt[ends - 1] = starts  # close each ring
    xn, yn = xs[nxt], ys[nxt]
    cross = xs * yn - xn * ys
    dx, dy = xn - xs, yn - ys
    area2 = np.add.reduceat(cross, starts)
    perim2 = np.add.reduceat(dx * dx + dy * dy, starts)
    cx_num = np.add.reduceat((xs + xn) * cross, starts)
    cy_num = np.add.reduceat((ys + yn) * cross, starts)
    # reduceat on an empty slice (degenerate offsets) returns the
    # element AT the start index; zero those out explicitly
    empty = ends == starts
    if np.any(empty):
        for a in (area2, perim2, cx_num, cy_num):
            a[empty] = 0
    return area2, perim2, cx_num, cy_num, (ends - starts).astype(np.int64)

def _clip_one_line(xs, ys, offsets, axis: int, c: float, keep_ge: bool):
    """One Sutherland-Hodgman pass against the line {coord[axis]=c},
    keeping the >= side (or <=), vectorized across ALL rings: every
    directed edge P->Q emits (intersection if P/Q straddle) then
    (Q if Q inside), order-preserving within the ring."""
    n = len(xs)
    if n == 0:
        return xs, ys, offsets
    starts, ends = offsets[:-1], offsets[1:]
    nxt = np.arange(1, n + 1)
    ne = ends > starts  # an EMPTY ring's ends-1 indexes the previous
    nxt[ends[ne] - 1] = starts[ne]  # ring's last edge — skip it
    xn, yn = xs[nxt], ys[nxt]
    p = xs if axis == 0 else ys
    q = xn if axis == 0 else yn
    pin = (p >= c) if keep_ge else (p <= c)
    qin = (q >= c) if keep_ge else (q <= c)
    emit_i = pin != qin
    emit_q = qin
    cnt = emit_i.astype(np.int64) + emit_q.astype(np.int64)
    # per-ring output sizes -> new offsets (cumsum differencing —
    # immune to reduceat's empty-slice and out-of-range quirks)
    csum = np.concatenate(([0], np.cumsum(cnt)))
    ring_cnt = csum[ends] - csum[starts]
    new_offsets = np.concatenate(([0], np.cumsum(ring_cnt)))
    total = int(new_offsets[-1])
    out_x = np.empty(total, dtype=np.float64)
    out_y = np.empty(total, dtype=np.float64)
    pos = np.concatenate(([0], np.cumsum(cnt)[:-1]))  # edge slot start
    # intersection first (when emitted), Q after
    ii = np.flatnonzero(emit_i)
    if len(ii):
        x1, y1, x2, y2 = xs[ii], ys[ii], xn[ii], yn[ii]
        if axis == 0:
            out_x[pos[ii]] = c
            out_y[pos[ii]] = y1 + (y2 - y1) * (c - x1) / (x2 - x1)
        else:
            out_y[pos[ii]] = c
            out_x[pos[ii]] = x1 + (x2 - x1) * (c - y1) / (y2 - y1)
    qi = np.flatnonzero(emit_q)
    qpos = pos[qi] + emit_i[qi].astype(np.int64)
    out_x[qpos] = xn[qi]
    out_y[qpos] = yn[qi]
    return out_x, out_y, new_offsets


def clip_rings_box(xs, ys, offsets, box):
    """Sutherland-Hodgman clip of MANY rings to an axis-aligned box
    (x0, y0, x1, y1), closed on all edges — 4 vectorized passes, no
    Python loop over rings. Inputs may be integer (cast to float64:
    intersection points are fractional); every arithmetic step is a
    fixed IEEE-double expression tree, so a replay in any engine with
    the same formulas is bit-exact. Returns (xs, ys, offsets);
    fully-outside rings come back empty (offsets stay monotone)."""
    x0, y0, x1, y1 = box
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    for axis, c, keep_ge in ((0, float(x0), True), (0, float(x1), False),
                             (1, float(y0), True), (1, float(y1), False)):
        xs, ys, offsets = _clip_one_line(xs, ys, offsets, axis, c, keep_ge)
    return xs, ys, offsets

def simplify_polyline(xs: np.ndarray, ys: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification -> boolean keep-mask.
    Exact arithmetic form: a vertex splits a segment when its squared
    perpendicular distance exceeds eps^2, compared as
    cross^2 > eps^2 * len2 (no division; integer inputs stay exact in
    float64 up to 2^26 coords). Iterative stack, vectorized distance
    scan per segment; endpoints always kept. Degenerate segments
    (identical endpoints) fall back to point distance."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    e2 = float(eps) * float(eps)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        sx, sy = xs[a], ys[a]
        dx, dy = xs[b] - sx, ys[b] - sy
        px, py = xs[a + 1:b] - sx, ys[a + 1:b] - sy
        len2 = dx * dx + dy * dy
        if len2 == 0.0:
            d2 = (px * px + py * py)
            thresh = e2
        else:
            cr = px * dy - py * dx
            d2 = cr * cr
            thresh = e2 * len2
        m = int(np.argmax(d2))
        if d2[m] > thresh:
            mid = a + 1 + m
            keep[mid] = True
            stack.append((a, mid))
            stack.append((mid, b))
    return keep


def simplify_rings(xs, ys, offsets, eps: float):
    """Douglas-Peucker over MANY polylines/rings: applies
    ``simplify_polyline`` per ring (outer loop is per ring — DP's
    recursion is inherently sequential — but each distance scan is a
    vectorized numpy pass). Returns (xs, ys, offsets) of survivors."""
    offsets = np.asarray(offsets, dtype=np.int64)
    keep = np.zeros(len(xs), dtype=bool)
    for i in range(len(offsets) - 1):
        lo, hi = int(offsets[i]), int(offsets[i + 1])
        keep[lo:hi] = simplify_polyline(xs[lo:hi], ys[lo:hi], eps)
    csum = np.concatenate(([0], np.cumsum(keep.astype(np.int64))))
    ring_cnt = csum[offsets[1:]] - csum[offsets[:-1]]
    return xs[keep], ys[keep], np.concatenate(([0], np.cumsum(ring_cnt)))


def monotone_chain_hull(x: np.ndarray, y: np.ndarray):
    """Strict convex hull (extreme vertices only — collinear boundary
    points dropped) of integer points via Andrew's monotone chain,
    returned in CCW order starting from the lexicographically
    smallest vertex. Exact: all turns are int64 cross products.
    Duplicates are deduped first; < 2 distinct points return the
    distinct set unchanged (degenerate hull)."""
    pts = np.unique(np.stack([x.astype(np.int64), y.astype(np.int64)],
                             axis=1), axis=0)  # lexsorted (x, y)
    n = len(pts)
    if n <= 2:
        return pts

    def half(p):
        out = []
        for i in range(len(p)):
            while len(out) >= 2:
                ox0, oy0 = out[-2]
                ox1, oy1 = out[-1]
                if ((ox1 - ox0) * (p[i, 1] - oy0)
                        - (oy1 - oy0) * (p[i, 0] - ox0)) <= 0:
                    out.pop()
                else:
                    break
            out.append((int(p[i, 0]), int(p[i, 1])))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    if len(ring) < 2:  # all points collinear -> the two extremes
        ring = [tuple(pts[0]), tuple(pts[-1])]
    return np.asarray(ring, dtype=np.int64)


def hull_diameter_sq(x: np.ndarray, y: np.ndarray) -> int:
    """Squared diameter (farthest point pair) of an integer point set
    via ROTATING CALIPERS over the strict convex hull: for each hull
    edge, the antipodal vertex advances monotonically (triangle-area
    comparison, exact int64 cross products), so the scan is O(h)
    after the O(n log n) hull — never the O(n^2) all-pairs. The
    farthest pair is always hull-antipodal, which the brute-force
    pin test exercises on raw (non-hull) inputs."""
    ring = monotone_chain_hull(np.asarray(x), np.asarray(y))
    n = len(ring)
    if n < 2:
        return 0

    def d2(i: int, j: int) -> int:
        dx = int(ring[i, 0] - ring[j, 0])
        dy = int(ring[i, 1] - ring[j, 1])
        return dx * dx + dy * dy

    if n == 2:
        return d2(0, 1)

    def a2(i: int, k: int, j: int) -> int:  # 2x area of (ring_i, ring_k, ring_j)
        return int((ring[k, 0] - ring[i, 0]) * (ring[j, 1] - ring[i, 1])
                   - (ring[k, 1] - ring[i, 1]) * (ring[j, 0] - ring[i, 0]))

    best = 0
    j = 1
    for i in range(n):
        k = (i + 1) % n
        while a2(i, k, (j + 1) % n) > a2(i, k, j):
            j = (j + 1) % n
        best = max(best, d2(i, j), d2(k, j))
    return best


def hull_area2(ring: np.ndarray) -> int:
    """Twice the signed shoelace area of an ordered integer ring."""
    if len(ring) < 3:
        return 0
    x = ring[:, 0]
    y = ring[:, 1]
    return int(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def nms_boxes(score: np.ndarray, x0: np.ndarray, y0: np.ndarray,
              x1: np.ndarray, y1: np.ndarray, iou_num: int, iou_den: int,
              tie: np.ndarray | None = None) -> np.ndarray:
    """Greedy non-maximum suppression over one group's integer boxes
    (the detection post-processing step): repeatedly keep the highest
    ``score`` (ties by ascending ``tie``) survivor, then drop every
    remaining box whose IoU with it meets ``iou_num/iou_den`` — exact
    integer test ``inter * den >= num * union`` over the box
    coordinates (scores may be float: they only order, never enter
    the IoU arithmetic). Zero-union pairs (both boxes degenerate)
    never suppress: IoU is defined as 0 when the union is empty. A
    box suppressed earlier cannot suppress later (the chain-rescue
    property that separates greedy NMS from the one-shot
    "overlapped-by-any-better-box" filter). Returns the kept row
    indices in pick order.

    O(k * n) per group for k keeps — groups are per-image detection
    sets, bounded by the detector's output cap, never corpus-sized;
    the grouping shuffle outside this kernel is the scale step."""
    n = len(score)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    tie = np.arange(n, dtype=np.int64) if tie is None else np.asarray(tie)
    s = np.asarray(score)
    if s.dtype.kind == "u":  # unsigned would wrap under negation
        s = s.astype(np.int64)
    order = np.lexsort((tie, -s))
    x0, y0 = x0[order].astype(np.int64), y0[order].astype(np.int64)
    x1, y1 = x1[order].astype(np.int64), y1[order].astype(np.int64)
    area = (x1 - x0) * (y1 - y0)
    alive = np.ones(n, dtype=bool)
    kept = []
    while True:
        rem = np.flatnonzero(alive)
        if len(rem) == 0:
            break
        i = rem[0]
        kept.append(order[i])
        alive[i] = False
        rem = rem[1:]
        iw = np.minimum(x1[i], x1[rem]) - np.maximum(x0[i], x0[rem])
        ih = np.minimum(y1[i], y1[rem]) - np.maximum(y0[i], y0[rem])
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        uni = area[i] + area[rem] - inter
        alive[rem[(inter * iou_den >= iou_num * uni) & (uni > 0)]] = False
    return np.asarray(kept, dtype=np.int64)


def union_area_boxes(x0: np.ndarray, y0: np.ndarray,
                     x1: np.ndarray, y1: np.ndarray) -> int:
    """Exact area of the union of half-open integer boxes
    [x0,x1) x [y0,y1) — the coverage measure (how much of a tile do
    the detected footprints cover, double-counting overlaps never):
    coordinate-compressed x slabs, and per slab the union length of
    the spanning boxes' y intervals via the sorted running-max
    (gaps-and-islands) scan. All integers; degenerate boxes
    contribute nothing. O(n^2) per call — callers group first
    (per-image / per-tile sets, bounded), the grouping shuffle is
    the scale step."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    ok = (x1 > x0) & (y1 > y0)
    x0, y0, x1, y1 = x0[ok], y0[ok], x1[ok], y1[ok]
    if len(x0) == 0:
        return 0
    xs = np.unique(np.concatenate((x0, x1)))
    area = 0
    for k in range(len(xs) - 1):
        xa, xb = xs[k], xs[k + 1]
        m = (x0 <= xa) & (x1 >= xb)
        if not m.any():
            continue
        o = np.lexsort((y1[m], y0[m]))
        ys0, ys1 = y0[m][o], y1[m][o]
        run_end = np.maximum.accumulate(ys1)
        new_isl = np.concatenate(([True], ys0[1:] > run_end[:-1]))
        starts = ys0[new_isl]
        ends = np.maximum.reduceat(ys1, np.flatnonzero(new_isl))
        area += int(xb - xa) * int((ends - starts).sum())
    return area


def hausdorff_directed_sq(ax: np.ndarray, ay: np.ndarray,
                          bx: np.ndarray, by: np.ndarray) -> int:
    """Directed Hausdorff distance SQUARED between two integer point
    sets: max over a in A of min over b in B of |a-b|^2 — exact
    integers, so the nested min/max SQL twin hash-matches. Vectorized
    O(|A|*|B|) in blocks of A to bound the temporary; per-trajectory
    point counts are bounded, the pair-grouping shuffle outside is
    the scale step."""
    ax = np.asarray(ax, dtype=np.int64)
    ay = np.asarray(ay, dtype=np.int64)
    bx = np.asarray(bx, dtype=np.int64)
    by = np.asarray(by, dtype=np.int64)
    worst = 0
    for s in range(0, len(ax), 512):
        dx = ax[s:s + 512, None] - bx[None, :]
        dy = ay[s:s + 512, None] - by[None, :]
        worst = max(worst, int((dx * dx + dy * dy).min(axis=1).max()))
    return worst


def frechet_sq(ax: np.ndarray, ay: np.ndarray,
               bx: np.ndarray, by: np.ndarray) -> int:
    """Discrete Frechet distance SQUARED between two ordered integer
    polylines (the coupled 'dog walk' measure — order-aware where
    Hausdorff is not): dp[i,j] = max(d2[i,j], min(dp[i-1,j],
    dp[i,j-1], dp[i-1,j-1])), exact integers throughout. O(|A|*|B|)
    per pair; trajectory lengths are bounded upstream (the engine
    caps them per key before the pair shuffle), so the DP never
    leaves a group."""
    ax = np.asarray(ax, dtype=np.int64)
    ay = np.asarray(ay, dtype=np.int64)
    d2 = ((ax[:, None] - np.asarray(bx, dtype=np.int64)[None, :]) ** 2
          + (ay[:, None] - np.asarray(by, dtype=np.int64)[None, :]) ** 2)
    na, nb = d2.shape
    dp = np.empty_like(d2)
    dp[0, 0] = d2[0, 0]
    for j in range(1, nb):
        dp[0, j] = max(d2[0, j], dp[0, j - 1])
    for i in range(1, na):
        dp[i, 0] = max(d2[i, 0], dp[i - 1, 0])
        for j in range(1, nb):
            dp[i, j] = max(d2[i, j],
                           min(dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]))
    return int(dp[na - 1, nb - 1])


def dda_cells(x0: np.ndarray, y0: np.ndarray, x1: np.ndarray,
              y1: np.ndarray, shift: int):
    """Integer DDA traversal: each segment sampled at n+1 evenly
    spaced points, n = max(|dx|, |dy|) // 2^shift + 1, so t=0 / t=n
    land exactly on the endpoints and consecutive samples move at
    most one cell (edge 2^shift) per axis. Round-half-up arithmetic
    only, every numerator non-negative (requires coords >= 0), so
    the cell list is SQL-replayable (join with range(0, n+1)). A
    sampling traversal at cell granularity: adequate for visibility
    tests against cell-resolution obstacle sets (the contract is
    'the same cells on both engines', not exact Bresenham).
    Returns (seg_index, cx, cy) arrays."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    n = (np.maximum(np.abs(x1 - x0), np.abs(y1 - y0)) >> shift) + 1
    rep = n + 1
    ri = np.repeat(np.arange(len(x0)), rep)
    t = np.arange(int(rep.sum())) - np.repeat(
        np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
    nn = n[ri]
    # round-half-up of x0 + (x1-x0) * t / n, kept in floor form with a
    # non-negative numerator
    px = (2 * (x0[ri] * nn + (x1 - x0)[ri] * t) + nn) // (2 * nn)
    py = (2 * (y0[ri] * nn + (y1 - y0)[ri] * t) + nn) // (2 * nn)
    return ri, px >> shift, py >> shift
