"""Tests for the session-5 operators: weighted SSSP, grid DBSCAN,
raster blob CC, map-matching snap — each pinned against a naive
driver-side reference on randomized fixtures."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_sssp(edges, seeds, max_dist):
    """Dijkstra-free Bellman-Ford reference over (u, v, w) triples."""
    import collections

    adj = collections.defaultdict(list)
    nodes = set()
    for u, v, w in edges:
        adj[u].append((v, w))
        nodes.add(u)
        nodes.add(v)
    dist = {s: 0 for s in seeds}
    changed = True
    while changed:
        changed = False
        for u, d in list(dist.items()):
            for v, w in adj[u]:
                nd = d + w
                if nd <= max_dist and nd < dist.get(v, 1 << 60):
                    dist[v] = nd
                    changed = True
    return dist


@pytest.mark.usefixtures("ray_session")
def test_sssp_matches_bruteforce():
    import ray.data

    from osmray.graph import sssp

    rng = np.random.default_rng(7)
    n, m = 120, 500
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 9, m).astype(np.int64)
    seeds = np.unique(rng.integers(0, n, 5).astype(np.int64))
    e = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v),
                                      "w": pa.array(w)}))
    s = ray.data.from_arrow(pa.table({"node": pa.array(seeds)}))
    got = sssp(e, s, max_dist=20).to_pandas()
    want = _brute_sssp(zip(u, v, w), seeds, max_dist=20)
    got_d = dict(zip(got["node"], got["dist"]))
    assert got_d == want


@pytest.mark.usefixtures("ray_session")
def test_sssp_shuffle_engine_matches_broadcast():
    import ray.data

    from osmray.graph import sssp

    rng = np.random.default_rng(11)
    n, m = 80, 300
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(1, 6, m).astype(np.int64)
    seeds = np.unique(rng.integers(0, n, 3).astype(np.int64))
    e = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v),
                                      "w": pa.array(w)})).repartition(4)
    s = ray.data.from_arrow(pa.table({"node": pa.array(seeds)}))
    a = (sssp(e, s, max_dist=15).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (sssp(e, s, max_dist=15, broadcast_cap=0).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert a.equals(b)


def _brute_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with min-pid cluster ids and min-core border
    assignment (the engine's deterministic spec)."""
    ids = sorted(pts)
    eps2 = eps * eps

    def near(a, b):
        (x1, y1), (x2, y2) = pts[a], pts[b]
        return (x1 - x2) ** 2 + (y1 - y2) ** 2 <= eps2

    neigh = {a: [b for b in ids if near(a, b)] for a in ids}
    core = {a for a in ids if len(neigh[a]) >= min_pts}
    # CC over core-core adjacency
    label = {a: a for a in core}

    def find(a):
        while label[a] != a:
            label[a] = label[label[a]]
            a = label[a]
        return a

    for a in core:
        for b in neigh[a]:
            if b in core:
                ra, rb = find(a), find(b)
                if ra != rb:
                    label[max(ra, rb)] = min(ra, rb)
    comp = {a: find(a) for a in core}
    out = {}
    for a in ids:
        if a in core:
            out[a] = (comp[a], 0)
        else:
            cores = [comp[b] for b in neigh[a] if b in core]
            out[a] = (min(cores), 1) if cores else (-1, 2)
    return out


@pytest.mark.usefixtures("ray_session")
def test_dbscan_matches_bruteforce():
    import ray.data

    from osmray.cluster import dbscan_grid

    rng = np.random.default_rng(3)
    n = 200
    x = rng.integers(0, 400, n).astype(np.int64)
    y = rng.integers(0, 400, n).astype(np.int64)
    pid = np.arange(n, dtype=np.int64) * 3 + 1
    ds = ray.data.from_arrow(pa.table({"pid": pa.array(pid),
                                       "x": pa.array(x),
                                       "y": pa.array(y)})).repartition(3)
    got = dbscan_grid(ds, eps=30, min_pts=4).to_pandas()
    pts = {int(p): (int(a), int(b)) for p, a, b in zip(pid, x, y)}
    want = _brute_dbscan(pts, eps=30, min_pts=4)
    got_m = {int(r.pid): (int(r.cluster), int(r.role))
             for r in got.itertuples()}
    assert got_m == want


@pytest.mark.usefixtures("ray_session")
def test_grid_components_matches_bruteforce():
    import ray.data

    from osmray.cluster import grid_components

    rng = np.random.default_rng(5)
    W = 32
    keys = np.unique(rng.integers(0, W * W, 300).astype(np.int64))
    ds = ray.data.from_arrow(pa.table({"key": pa.array(keys)})).repartition(3)
    got = grid_components(ds, width=W).to_pandas()

    # brute union-find over 4-adjacency
    parent = {int(k): int(k) for k in keys}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ks = set(int(k) for k in keys)
    for k in ks:
        x, y = k // W, k % W
        for nk in ((k + W) if x < W - 1 else None,
                   (k + 1) if y < W - 1 else None):
            if nk in ks:
                ra, rb = find(k), find(nk)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    want = {k: find(k) for k in ks}
    got_m = dict(zip(got["key"].astype(int), got["comp"].astype(int)))
    assert got_m == want


@pytest.mark.usefixtures("ray_session")
def test_snap_join_matches_bruteforce():
    import ray.data

    from osmray.joins import snap_join

    rng = np.random.default_rng(9)
    npts, nsegs = 150, 60
    px = rng.integers(0, 1000, npts).astype(np.int64)
    py = rng.integers(0, 1000, npts).astype(np.int64)
    pid = np.arange(npts, dtype=np.int64)
    x1 = rng.integers(0, 1000, nsegs).astype(np.int64)
    y1 = rng.integers(0, 1000, nsegs).astype(np.int64)
    x2 = x1 + rng.integers(-80, 81, nsegs)
    y2 = y1 + rng.integers(-80, 81, nsegs)
    sid = np.arange(nsegs, dtype=np.int64) * 7

    P = ray.data.from_arrow(pa.table({"pid": pa.array(pid),
                                      "px": pa.array(px),
                                      "py": pa.array(py)})).repartition(3)
    S = ray.data.from_arrow(pa.table(
        {"sid": pa.array(sid), "x1": pa.array(x1), "y1": pa.array(y1),
         "x2": pa.array(x2), "y2": pa.array(y2)})).repartition(2)
    R = 70
    got = snap_join(P, S, radius=R).to_pandas()

    from fractions import Fraction

    want = {}
    for i in range(npts):
        best = None
        for j in range(nsegs):
            dx, dy = int(x2[j] - x1[j]), int(y2[j] - y1[j])
            ax, ay = int(px[i] - x1[j]), int(py[i] - y1[j])
            len2 = dx * dx + dy * dy
            tnum = ax * dx + ay * dy
            if len2 > 0 and 0 < tnum < len2:
                cr = dx * ay - dy * ax
                num, den = cr * cr, len2
            elif len2 == 0 or tnum <= 0:
                num, den = ax * ax + ay * ay, 1
            else:
                bx, by = int(px[i] - x2[j]), int(py[i] - y2[j])
                num, den = bx * bx + by * by, 1
            if num > R * R * den:
                continue
            cand = (Fraction(num, den), int(sid[j]), num, den)
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is not None:
            want[int(pid[i])] = (best[1], best[2], best[3])
    got_m = {int(r.pid): (int(r.sid), int(r.d2_num), int(r.d2_den))
             for r in got.itertuples()}
    assert got_m == want


def test_sssp_broadcast_equals_grace_engine(ray_session):
    """The driver-state broadcast engine (one edge pass per round)
    must match the keyed grace-join engine row-for-row."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.graph import _pick_mode, sssp

    rng = np.random.RandomState(11)
    m = 600
    u = rng.randint(0, 200, m).astype(np.int64)
    v = rng.randint(0, 200, m).astype(np.int64)
    w = rng.randint(1, 8, m).astype(np.int64)
    e = ray.data.from_arrow(pa.table({"u": u, "v": v, "w": w})).repartition(4)
    seeds = ray.data.from_arrow(pa.table({"node": pa.array([2, 36, 70],
                                                           pa.int64())}))
    a = sssp(e, seeds, max_dist=20, broadcast_cap=10 ** 9) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    b = sssp(e, seeds, max_dist=20, broadcast_cap=0) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert a["node"].tolist() == b["node"].tolist()
    assert a["dist"].tolist() == b["dist"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_sssp_isolated_seed_both_engines():
    """ADVICE r3: a seed with no incident edges must still be emitted
    at dist 0 by the broadcast engine (it already was by the keyed
    engine), so results do not change with broadcast_cap."""
    import pyarrow as pa
    import ray.data

    from osmray.graph import sssp

    e = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 2], pa.int64()),
        "v": pa.array([2, 3], pa.int64()),
        "w": pa.array([1, 1], pa.int64())}))
    # seed 99 has no incident edges at all
    seeds = ray.data.from_arrow(pa.table({"node": pa.array([1, 99],
                                                           pa.int64())}))
    a = (sssp(e, seeds, max_dist=10, broadcast_cap=10 ** 9).to_pandas()
         .sort_values("node").reset_index(drop=True))
    b = (sssp(e, seeds, max_dist=10, broadcast_cap=0).to_pandas()
         .sort_values("node").reset_index(drop=True))
    assert a["node"].tolist() == [1, 2, 3, 99]
    assert a["dist"].tolist() == [0, 1, 2, 0]
    assert a["node"].tolist() == b["node"].tolist()
    assert a["dist"].tolist() == b["dist"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_dag_longest_path_cycle_raises():
    """ADVICE r3: a positive cycle confined to one block must reach
    the driver's RuntimeError, not spin in the worker's local
    relaxation loop."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.graph import dag_longest_path

    # 0 -> 1 -> 2 -> 0 cycle, all in one block
    e = ray.data.from_arrow(pa.table({
        "u": pa.array([0, 1, 2], pa.int64()),
        "v": pa.array([1, 2, 0], pa.int64())}))
    dur = np.array([1, 1, 1], np.int64)
    with pytest.raises(RuntimeError, match="cycle"):
        dag_longest_path(e, dur, max_rounds=6)


@pytest.mark.usefixtures("ray_session")
def test_dag_longest_path_acyclic_still_exact():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.graph import dag_longest_path

    # chain 0->1->2->3 plus shortcut 0->2; dur = [2,3,4,5]
    e = ray.data.from_arrow(pa.table({
        "u": pa.array([0, 1, 2, 0], pa.int64()),
        "v": pa.array([1, 2, 3, 2], pa.int64())}))
    dur = np.array([2, 3, 4, 5], np.int64)
    got = (dag_longest_path(e, dur).to_pandas()
           .sort_values("task")["lp"].tolist())
    assert got == [2, 5, 9, 14]
