"""Tests for triangle counting, the grid box-overlap join, and the
vectorized shoelace kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmray.geom import ring_stats


def test_ring_stats_matches_scalar():
    rng = np.random.default_rng(17)
    xs_all, ys_all, offs = [], [], [0]
    for _ in range(50):
        k = int(rng.integers(3, 9))
        # star-shaped simple polygon around a center: sort by angle
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.integers(5, 100, k)
        xs = np.floor(1000 + r * np.cos(ang)).astype(np.int64)
        ys = np.floor(1000 + r * np.sin(ang)).astype(np.int64)
        xs_all.append(xs)
        ys_all.append(ys)
        offs.append(offs[-1] + k)
    X = np.concatenate(xs_all)
    Y = np.concatenate(ys_all)
    a2, p2, cxn, cyn, nv = ring_stats(X, Y, np.asarray(offs))
    for i in range(50):
        xs, ys = xs_all[i], ys_all[i]
        k = len(xs)
        sa = sp = sx = sy = 0
        for j in range(k):
            x1, y1 = int(xs[j]), int(ys[j])
            x2, y2 = int(xs[(j + 1) % k]), int(ys[(j + 1) % k])
            c = x1 * y2 - x2 * y1
            sa += c
            sp += (x2 - x1) ** 2 + (y2 - y1) ** 2
            sx += (x1 + x2) * c
            sy += (y1 + y2) * c
        assert a2[i] == sa and p2[i] == sp and cxn[i] == sx and cyn[i] == sy
        assert nv[i] == k


def test_triangles_matches_bruteforce(ray_session):
    import ray.data

    from osmray.graph import triangles

    rng = np.random.default_rng(23)
    V, E = 60, 400
    u = rng.integers(0, V, E).astype(np.int64)
    v = rng.integers(0, V, E).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)})).repartition(5)
    got = triangles(ds, num_buckets=4).to_pandas().set_index("u")["n_tri"].to_dict()

    adj = np.zeros((V, V), dtype=bool)
    sel = u != v
    adj[u[sel], v[sel]] = True
    adj |= adj.T
    exp: dict[int, int] = {}
    for a in range(V):
        for b in range(a + 1, V):
            if not adj[a, b]:
                continue
            for c in range(b + 1, V):
                if adj[a, c] and adj[b, c]:
                    exp[a] = exp.get(a, 0) + 1
    assert got == exp


def test_box_overlap_join_matches_bruteforce(ray_session):
    import ray.data

    from osmray.joins import box_overlap_join

    rng = np.random.default_rng(31)

    def boxes(n, seed_shift):
        cx = rng.integers(64, 4000, n)
        cy = rng.integers(64, 4000, n)
        w = rng.integers(1, 60, n)
        h = rng.integers(1, 60, n)
        return pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64) + seed_shift,
             "x0": cx - w, "y0": cy - h, "x1": cx + w, "y1": cy + h}
        ).astype(np.int64)

    A, B = boxes(300, 0), boxes(500, 10_000)
    ds_a = ray.data.from_pandas(A).repartition(3)
    ds_b = ray.data.from_pandas(B).repartition(4)
    got = box_overlap_join(ds_a, ds_b, cell_shift=7, num_buckets=4).to_pandas()
    got_pairs = set(zip(got["a_id"], got["b_id"]))

    exp_pairs = set()
    for _, a in A.iterrows():
        sel = (
            (a.x0 < B.x1) & (B.x0 < a.x1) & (a.y0 < B.y1) & (B.y0 < a.y1)
        )
        for bid in B.loc[sel, "id"]:
            exp_pairs.add((a.id, bid))
    assert got_pairs == exp_pairs
    assert len(got) == len(got_pairs)  # reporting-cell dedup: no dupes


def test_segment_intersection_join_bruteforce(ray_session):
    import ray.data

    from osmray.joins import segment_intersection_join

    rng = np.random.default_rng(67)

    def segs(n, shift):
        x1 = rng.integers(100, 3900, n)
        y1 = rng.integers(100, 3900, n)
        return pd.DataFrame(
            {"id": np.arange(n, dtype=np.int64) + shift,
             "x1": x1, "y1": y1,
             "x2": x1 + rng.integers(-90, 91, n),
             "y2": y1 + rng.integers(-90, 91, n)}
        ).astype(np.int64)

    A, B = segs(250, 0), segs(400, 10_000)
    got = segment_intersection_join(
        ray.data.from_arrow(pa.Table.from_pandas(A)).repartition(3),
        ray.data.from_arrow(pa.Table.from_pandas(B)).repartition(4),
        cell_shift=6, num_buckets=4,
    ).to_pandas()
    got_pairs = set(zip(got["a_id"], got["b_id"]))

    def cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    exp = set()
    for _, a in A.iterrows():
        for _, b in B.iterrows():
            d1 = cross(b.x1, b.y1, b.x2, b.y2, a.x1, a.y1)
            d2 = cross(b.x1, b.y1, b.x2, b.y2, a.x2, a.y2)
            d3 = cross(a.x1, a.y1, a.x2, a.y2, b.x1, b.y1)
            d4 = cross(a.x1, a.y1, a.x2, a.y2, b.x2, b.y2)
            if ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
                    and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0):
                exp.add((a.id, b.id))
    assert got_pairs == exp
    assert len(got) == len(got_pairs)


def test_pip_cell_join_matches_points_in_ring(ray_session):
    import ray.data

    from osmray.geom import points_in_ring
    from osmray.joins import pip_cell_join

    rng = np.random.default_rng(71)
    n_pts, n_polys = 600, 80
    px = rng.integers(0, 4000, n_pts).astype(np.int64)
    py = rng.integers(0, 4000, n_pts).astype(np.int64)
    pts = pd.DataFrame({"qid": np.arange(n_pts, dtype=np.int64),
                        "px": px, "py": py})
    # random star-shaped simple polygons
    rings = []
    for i in range(n_polys):
        k = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        r = rng.integers(50, 400, k)
        cx, cy = rng.uniform(200, 3800), rng.uniform(200, 3800)
        rings.append((np.floor(cx + r * np.cos(ang)),
                      np.floor(cy + r * np.sin(ang))))
    offs = np.concatenate(([0], np.cumsum([len(x) for x, _ in rings]))).astype(np.int32)
    polys_tbl = pa.table({
        "pid": pa.array(np.arange(n_polys, dtype=np.int64)),
        "xs": pa.ListArray.from_arrays(pa.array(offs),
                                       pa.array(np.concatenate([x for x, _ in rings]))),
        "ys": pa.ListArray.from_arrays(pa.array(offs),
                                       pa.array(np.concatenate([y for _, y in rings]))),
    })
    got = pip_cell_join(
        ray.data.from_pandas(pts).repartition(4),
        ray.data.from_arrow(polys_tbl).repartition(3),
        cell_shift=8, num_buckets=4,
    ).to_pandas()
    got_pairs = set(zip(got["qid"], got["pid"]))
    exp = set()
    for i, (xs, ys) in enumerate(rings):
        # points_in_ring works in (lat, lng) = (y, x) with ray toward +lng
        ring = np.stack([ys, xs], axis=1)
        ins = points_in_ring(py.astype(float), px.astype(float), ring)
        for q in np.flatnonzero(ins):
            exp.add((q, i))
    assert got_pairs == exp


def test_distance_join_bruteforce(ray_session):
    import ray.data

    from osmray.joins import distance_join

    rng = np.random.default_rng(73)
    pts = pd.DataFrame({"qid": np.arange(300, dtype=np.int64),
                        "px": rng.integers(0, 4000, 300).astype(np.int64),
                        "py": rng.integers(0, 4000, 300).astype(np.int64)})
    fts = pd.DataFrame({"fid": np.arange(200, dtype=np.int64),
                        "fx": rng.integers(0, 4000, 200).astype(np.int64),
                        "fy": rng.integers(0, 4000, 200).astype(np.int64)})
    r = 250
    got = distance_join(
        ray.data.from_pandas(pts).repartition(4),
        ray.data.from_pandas(fts).repartition(3),
        radius=r, cell_shift=7, num_buckets=4,
    ).to_pandas()
    got_pairs = set(zip(got["qid"], got["fid"]))
    exp = set()
    for _, p in pts.iterrows():
        d2 = (p.px - fts["fx"]) ** 2 + (p.py - fts["fy"]) ** 2
        for fid in fts.loc[d2 <= r * r, "fid"]:
            exp.add((p.qid, fid))
    assert got_pairs == exp
    assert len(got) == len(got_pairs)


def test_knn_join_bruteforce(ray_session):
    import ray.data

    from osmray.joins import knn_join

    rng = np.random.default_rng(79)
    pts = pd.DataFrame({"qid": np.arange(150, dtype=np.int64),
                        "px": rng.integers(0, 4000, 150).astype(np.int64),
                        "py": rng.integers(0, 4000, 150).astype(np.int64)})
    fts = pd.DataFrame({"fid": np.arange(120, dtype=np.int64),
                        "fx": rng.integers(0, 4000, 120).astype(np.int64),
                        "fy": rng.integers(0, 4000, 120).astype(np.int64)})
    k = 3
    got = knn_join(
        ray.data.from_pandas(pts).repartition(4),
        ray.data.from_pandas(fts).repartition(3),
        k=k, radius0=64, cell_shift=7, num_buckets=4,  # tiny r0: force rounds
    ).to_pandas()
    exp = set()
    for _, p in pts.iterrows():
        d2 = ((p.px - fts["fx"]) ** 2 + (p.py - fts["fy"]) ** 2).to_numpy()
        order = np.lexsort((fts["fid"].to_numpy(), d2))[:k]
        for j in order:
            exp.add((p.qid, fts["fid"].iloc[j], int(d2[j])))
    got_set = set(zip(got["qid"], got["fid"], got["d2"]))
    assert got_set == exp


def test_kcore_broadcast_equals_shuffle_and_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.graph import kcore

    rng = np.random.RandomState(6)
    u = rng.randint(0, 60, 300).astype(np.int64)
    v = rng.randint(0, 60, 300).astype(np.int64)
    keep = u != v
    # dedup undirected pairs for degree correctness
    a, b = np.minimum(u[keep], v[keep]), np.maximum(u[keep], v[keep])
    pairs = np.unique(a * 1000 + b)
    u, v = pairs // 1000, pairs % 1000
    edges = pa.table({"u": pa.array(u), "v": pa.array(v)})

    def run(mode):
        ds = ray.data.from_arrow(edges).repartition(4)
        df = kcore(ds, k=3, mode=mode, max_rounds=30).to_pandas()
        return sorted(map(tuple, df[["node", "deg"]].to_numpy()))

    got_b = run("broadcast")
    got_s = run("shuffle")
    assert got_b == got_s

    # brute peel
    import collections
    adj = collections.defaultdict(set)
    for x, y in zip(u, v):
        adj[x].add(y)
        adj[y].add(x)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < 3}
        if not drop:
            break
        alive -= drop
    want = sorted((n, len(adj[n] & alive)) for n in alive)
    assert got_b == want


def test_boruvka_mst_engines_match_brute_kruskal(ray_session):
    """Both MST engines must select the exact brute-Kruskal edge set
    (unique under the (w, eid) total order), including w-ties,
    multi-edges, self-loops and forests (disconnected graphs)."""
    import ray.data

    from osmray.graph import boruvka_mst

    def brute_kruskal(u, v, w, eid):
        order = np.lexsort((eid, w))
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        chosen = []
        for i in order:
            if u[i] == v[i]:
                continue
            ru, rv = find(u[i]), find(v[i])
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                chosen.append((int(eid[i]), int(u[i]), int(v[i]), int(w[i])))
        return sorted(chosen)

    rng = np.random.RandomState(42)
    for n_nodes, n_edges in ((50, 30), (64, 300), (200, 1000)):
        u = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        v = rng.randint(0, n_nodes, n_edges).astype(np.int64)
        w = rng.randint(0, 50, n_edges).astype(np.int64)  # deliberate ties
        eid = np.arange(n_edges, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table(
            {"u": u, "v": v, "w": w, "eid": eid})).repartition(4)
        exp = brute_kruskal(u, v, w, eid)
        for mode in ("broadcast", "shuffle"):
            got = boruvka_mst(ds, mode=mode, num_partitions=4).to_pandas()
            got = sorted(map(tuple, got[["eid", "u", "v", "w"]].to_numpy()))
            assert got == exp, (mode, n_nodes, n_edges)


def test_random_walks_engines_agree(ray_session):
    """The broadcast-CSR walk engine and the keyed two-join-per-step
    engine must emit identical (walk_id, step, node) sets."""
    from osmray.queries import _random_walks

    def key(res):
        return sorted((r["walk_id"], r["step"], r["node"])
                      for r in res.to_pandas().to_dict("records"))

    bc = key(_random_walks("/root/testdata/sf0.001"))
    keyed = key(_random_walks("/root/testdata/sf0.001", broadcast_cap=0))
    assert bc == keyed and len(bc) == 20


def test_graph_voronoi_packed_state(ray_session):
    """The packed (dist, seed) lexicographic trick through graph.sssp
    equals brute multi-source Dijkstra with min-seed tie-break."""
    import heapq

    import numpy as np
    import ray.data

    from osmray.graph import sssp

    rng = np.random.RandomState(11)
    n = 40
    edges = sorted({(int(a), int(b)) for a, b in rng.randint(1, n, (120, 2))
                    if a != b})
    w = {e: int(rng.randint(1, 6)) for e in edges}
    seeds = [1, 5, 9]
    SHIFT = 1 << 32

    # brute: Dijkstra over (dist, seed) pairs
    best = {s: (0, s) for s in seeds}
    pq = [(0, s, s) for s in seeds]
    heapq.heapify(pq)
    adj = {}
    for (a, b), ww in w.items():
        adj.setdefault(a, []).append((b, ww))
    while pq:
        d, sd, u = heapq.heappop(pq)
        if best.get(u, (1 << 60, 0)) < (d, sd):
            continue
        for v, ww in adj.get(u, []):
            cand = (d + ww, sd)
            if cand < best.get(v, (1 << 60, 0)) and d + ww <= 24:
                best[v] = cand
                heapq.heappush(pq, (d + ww, sd, v))

    rows = ([{"u": 0, "v": s, "w": s} for s in seeds] +
            [{"u": a, "v": b, "w": ww * SHIFT} for (a, b), ww in w.items()])
    out = sssp(ray.data.from_items(rows).repartition(4),
               ray.data.from_items([{"node": 0}]),
               max_dist=25 * SHIFT - 1)
    got = {int(r["node"]): (int(r["dist"]) // SHIFT, int(r["dist"]) % SHIFT)
           for r in out.take_all() if r["node"] != 0}
    assert got == best


def test_two_hop_engines_agree(ray_session):
    """Broadcast-CSR and keyed grace-join 2-hop engines emit the same
    (node, n1, n2) rows."""
    from osmray.queries import _two_hop

    def key(res):
        return sorted((r["node"], r["n1"], r["n2"])
                      for r in res.to_pandas().to_dict("records"))

    bc = key(_two_hop("/root/testdata/sf0.001"))
    keyed = key(_two_hop("/root/testdata/sf0.001", broadcast_cap=0))
    assert bc == keyed and len(bc) > 0


def test_label_propagation_two_engines_scalar(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from osmray.graph import label_propagation

    rng = np.random.default_rng(7)
    edges = []
    for base in (0, 50):  # two planted communities + a bridge
        for _ in range(80):
            a, b = rng.integers(0, 20, 2) + base
            if a != b:
                edges.append((int(a), int(b)))
    edges.append((3, 53))
    ds = ray.data.from_items(
        [{"u": a, "v": b} for a, b in edges]).repartition(4)

    gb = (label_propagation(ds, rounds=3, mode="broadcast")
          .to_pandas().sort_values("node").reset_index(drop=True))
    gk = (label_propagation(ds, rounds=3, mode="shuffle",
                            num_partitions=5)
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert gb.equals(gk)

    from collections import Counter
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in nbrs}
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            c = Counter(lbl[m] for m in ns)
            mx = max(c.values())
            new[n] = min(l for l, k in c.items() if k == mx)
        lbl = new
    ref = pd.DataFrame(sorted(lbl.items()), columns=["node", "lbl"])
    assert gb.astype(np.int64).equals(ref.astype(np.int64))
    # the planted structure is recovered: few communities, none
    # spanning both blocks of nodes
    assert gb["lbl"].nunique() <= 6


def test_ppr_two_engines_equal(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.queries import ppr_mass

    rng = np.random.default_rng(13)
    u = rng.integers(0, 40, 300).astype(np.int64) * 1009 // 17  # mix of
    v = rng.integers(0, 40, 300).astype(np.int64) * 31          # seeds+not
    keep = u != v
    pk = (u[keep] * 65536 + v[keep])
    ds = ray.data.from_arrow(pa.table({"pk": pa.array(pk)})).repartition(4)

    gb = (ppr_mass(ds, mode="broadcast")
          .to_pandas().sort_values("node").reset_index(drop=True))
    gk = (ppr_mass(ds, mode="keyed")
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert gb.equals(gk)
    assert (gb["mass"] >= 0).all() and gb["mass"].max() >= 1_000_000_000


def test_hits_assortativity_two_engines(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.queries import assortativity_sums, hits_scores

    rng = np.random.default_rng(17)
    u = rng.integers(0, 60, 400).astype(np.int64)
    v = rng.integers(0, 60, 400).astype(np.int64)
    keep = u != v
    pk = u[keep] * 65536 + v[keep]
    ds = ray.data.from_arrow(pa.table({"pk": pa.array(pk)})).repartition(4)

    hb = (hits_scores(ds, mode="broadcast")
          .to_pandas().sort_values("node").reset_index(drop=True))
    hk = (hits_scores(ds, mode="keyed")
          .to_pandas().sort_values("node").reset_index(drop=True))
    assert hb.equals(hk)

    a = np.minimum(u[keep], v[keep])
    b = np.maximum(u[keep], v[keep])
    und = ray.data.from_arrow(pa.table(
        {"pk": pa.array(a * 65536 + b)})).repartition(4)
    sb = assortativity_sums(und, mode="broadcast").to_pandas()
    sk = assortativity_sums(und, mode="keyed").to_pandas()
    assert sb.equals(sk)


def test_li_hash_edges_cached_and_distinct(ray_session):
    from osmray import queries as Q

    Q._EDGE_CACHE.clear()
    e1 = Q._li_hash_edges("/root/testdata/sf0.001")
    e2 = Q._li_hash_edges("/root/testdata/sf0.001")
    assert e1 is e2  # session cache hit
    df = e1.to_pandas()
    assert not df.duplicated(["u", "v"]).any()
    assert (df["u"] != df["v"]).all()
    eu = Q._li_hash_edges("/root/testdata/sf0.001", undirected=True)
    du = eu.to_pandas()
    assert (du["u"] <= du["v"]).all()
    assert not du.duplicated(["u", "v"]).any()
