"""Scalar-reference parity tests for the vector-geometry kernels
added this round: Sutherland-Hodgman box clip and Douglas-Peucker
simplification."""

import numpy as np

from osmray.geom import clip_rings_box, simplify_polyline, simplify_rings


def _scalar_sh(poly, box):
    x0, y0, x1, y1 = box

    def clip(poly, inside, inter):
        out = []
        n = len(poly)
        for i in range(n):
            P, Q = poly[i], poly[(i + 1) % n]
            pi, qi = inside(P), inside(Q)
            if pi != qi:
                out.append(inter(P, Q))
            if qi:
                out.append(Q)
        return out

    for c, ax, ge in ((x0, 0, True), (x1, 0, False), (y0, 1, True), (y1, 1, False)):
        if ax == 0:
            poly = clip(
                poly,
                lambda P: (P[0] >= c if ge else P[0] <= c),
                lambda P, Q: (c, P[1] + (Q[1] - P[1]) * (c - P[0]) / (Q[0] - P[0])),
            )
        else:
            poly = clip(
                poly,
                lambda P: (P[1] >= c if ge else P[1] <= c),
                lambda P, Q: (P[0] + (Q[0] - P[0]) * (c - P[1]) / (Q[1] - P[1]), c),
            )
        if not poly:
            return []
    return poly


def test_clip_rings_box_matches_scalar():
    box = (10.0, 10.0, 50.0, 50.0)
    for seed in range(4):
        rng = np.random.default_rng(seed)
        allx, ally, offs, polys = [], [], [0], []
        for _ in range(300):
            k = int(rng.integers(3, 8))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            r = rng.uniform(2, 80, k)
            cx, cy = rng.uniform(-20, 80), rng.uniform(-20, 80)
            xs = np.floor(cx + r * np.cos(ang))
            ys = np.floor(cy + r * np.sin(ang))
            polys.append(list(zip(xs.tolist(), ys.tolist())))
            allx.append(xs)
            ally.append(ys)
            offs.append(offs[-1] + k)
        X, Y, O = clip_rings_box(
            np.concatenate(allx), np.concatenate(ally), np.asarray(offs), box
        )
        for i, poly in enumerate(polys):
            exp = _scalar_sh(poly, box)
            got = list(zip(X[O[i]:O[i + 1]].tolist(), Y[O[i]:O[i + 1]].tolist()))
            assert got == [(float(a), float(b)) for a, b in exp]


def test_clip_empty_ring_isolated():
    # an empty (fully outside) ring between two live rings must not
    # corrupt its neighbors (regression: wraparound index overwrite)
    xs = np.array([0.0, 4, 4, 0, 100, 104, 104, 0.0, 4, 4, 0])
    ys = np.array([0.0, 0, 4, 4, 100, 100, 104, 0.0, 0, 4, 4])
    offs = np.array([0, 4, 7, 11])
    X, Y, O = clip_rings_box(xs, ys, offs, (1.0, 1.0, 50.0, 50.0))
    assert O.tolist()[0] == 0 and O[1] == O[2]  # middle ring empty? no:
    # ring order: [0..4) live, [4..7) outside, [7..11) live
    n0, n1, n2 = O[1] - O[0], O[2] - O[1], O[3] - O[2]
    assert n1 == 0 and n0 > 0 and n2 > 0
    # both live rings clip to the same square [1,4]^2
    a = set(zip(X[O[0]:O[1]].tolist(), Y[O[0]:O[1]].tolist()))
    b = set(zip(X[O[2]:O[3]].tolist(), Y[O[2]:O[3]].tolist()))
    assert a == b == {(1.0, 1.0), (4.0, 1.0), (4.0, 4.0), (1.0, 4.0)}


def _scalar_dp(pts, eps):
    def rec(a, b, keep):
        if b - a < 2:
            return
        ax, ay = pts[a]
        bx, by = pts[b]
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, bi = -1.0, -1
        for i in range(a + 1, b):
            px, py = pts[i][0] - ax, pts[i][1] - ay
            if len2 == 0:
                d2, thr = px * px + py * py, eps * eps
            else:
                cr = px * dy - py * dx
                d2, thr = cr * cr, eps * eps * len2
            if d2 > best:
                best, bi = d2, i
        if best > (eps * eps if len2 == 0 else eps * eps * len2):
            keep[bi] = True
            rec(a, bi, keep)
            rec(bi, b, keep)

    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    rec(0, len(pts) - 1, keep)
    return keep


def test_simplify_matches_scalar():
    rng = np.random.default_rng(9)
    for _ in range(50):
        n = int(rng.integers(2, 40))
        xs = np.cumsum(rng.integers(-5, 6, n)).astype(np.float64)
        ys = np.cumsum(rng.integers(-5, 6, n)).astype(np.float64)
        eps = float(rng.uniform(0.5, 5))
        got = simplify_polyline(xs, ys, eps)
        exp = _scalar_dp(list(zip(xs.tolist(), ys.tolist())), eps)
        assert got.tolist() == exp


def test_simplify_rings_structure():
    # collinear points collapse to endpoints; offsets stay consistent
    xs = np.array([0.0, 1, 2, 3, 4, 0, 5, 5, 10])
    ys = np.array([0.0, 0, 0, 0, 0, 0, 8, 0, 0])
    offs = np.array([0, 5, 9])
    X, Y, O = simplify_rings(xs, ys, offs, eps=0.5)
    assert O.tolist() == [0, 2, 6]
    assert X[:2].tolist() == [0.0, 4.0]  # line collapsed
    assert len(X) == 6
