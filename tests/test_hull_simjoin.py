"""Convex hull kernel properties + similarity-join operators."""

import numpy as np
import pandas as pd

from osmray.geom import hull_area2, monotone_chain_hull


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_hull_properties():
    rng = np.random.default_rng(23)
    for trial in range(30):
        n = int(rng.integers(3, 120))
        x = rng.integers(0, 60, n)
        y = rng.integers(0, 60, n)
        ring = monotone_chain_hull(x, y)
        pts = set(zip(x.tolist(), y.tolist()))
        # hull vertices are input points
        assert all((int(a), int(b)) in pts for a, b in ring)
        if len(ring) < 3:
            assert hull_area2(ring) == 0
            continue
        m = len(ring)
        for i in range(m):
            o, a = ring[i], ring[(i + 1) % m]
            # strictly convex at every vertex (no collinear kept)
            b = ring[(i + 2) % m]
            assert _cross(o, a, b) > 0
            # every input point is left of or on every edge
            for p in pts:
                assert _cross(o, a, p) >= 0
        assert hull_area2(ring) > 0


def test_hull_degenerate():
    ring = monotone_chain_hull(np.array([5]), np.array([7]))
    assert ring.tolist() == [[5, 7]]
    ring = monotone_chain_hull(np.array([1, 1, 1]), np.array([9, 2, 5]))
    assert ring.tolist() == [[1, 2], [1, 9]] and hull_area2(ring) == 0
