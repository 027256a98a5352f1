"""Engine raster kernels vs the scalar oracle (frozen semantics)."""

import numpy as np

from osmray import oracle, raster


def _oracle_canvas(h, w):
    return [[0] * w for _ in range(h)]


def _np(canvas):
    return np.asarray(canvas, dtype=np.uint8)


def test_line4_matches_oracle_exhaustive():
    # all segments within a 9x9 grid from a fixed start — covers every
    # octant, steep/shallow, degenerate
    for x1 in range(9):
        for y1 in range(9):
            for x0, y0 in ((4, 4), (0, 0), (8, 3)):
                got = np.zeros((9, 9), dtype=np.uint8)
                xs, ys = raster.line4_pixels(x0, y0, x1, y1)
                raster.stamp(got, xs, ys, 1)
                ref = _oracle_canvas(9, 9)
                oracle.draw_line4(ref, x0, y0, x1, y1, 1)
                np.testing.assert_array_equal(got, _np(ref), err_msg=f"{(x0,y0,x1,y1)}")


def test_line4_is_4_connected_and_complete():
    rng = np.random.default_rng(42)
    for _ in range(200):
        x0, y0, x1, y1 = rng.integers(-50, 50, 4)
        xs, ys = raster.line4_pixels(int(x0), int(y0), int(x1), int(y1))
        assert len(xs) == abs(x1 - x0) + abs(y1 - y0) + 1
        assert (xs[0], ys[0]) == (x0, y0) and (xs[-1], ys[-1]) == (x1, y1)
        steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
        assert (steps == 1).all()  # one axis per step == 4-connected


def test_polyline_closed_matches_oracle():
    pts = [(2, 3), (17, 5), (12, 18), (3, 14)]
    for width in (1, 2):
        got = np.zeros((21, 21), dtype=np.uint8)
        raster.draw_polyline(got, np.array(pts), width=width, closed=True)
        ref = _oracle_canvas(21, 21)
        oracle.draw_polyline(ref, pts, width=width, closed=True)
        np.testing.assert_array_equal(got, _np(ref))


def test_fill_poly_matches_oracle():
    cases = [
        [(2, 2), (18, 4), (16, 17), (4, 15)],            # convex quad
        [(1, 1), (19, 1), (10, 19)],                      # triangle
        [(2, 10), (10, 2), (18, 10), (10, 18), (2, 10)],  # diamond w/ dup last
        [(0, 0), (20, 0), (20, 20), (0, 20)],             # full-canvas box
        [(5, 5), (15, 5), (5, 15), (15, 15)],             # self-intersecting bowtie
    ]
    for pts in cases:
        got = np.zeros((21, 21), dtype=np.uint8)
        raster.fill_poly(got, np.array(pts, dtype=float))
        ref = _oracle_canvas(21, 21)
        oracle.fill_poly(ref, pts)
        np.testing.assert_array_equal(got, _np(ref), err_msg=str(pts))


def test_fill_poly_interior_filled():
    got = np.zeros((21, 21), dtype=np.uint8)
    raster.fill_poly(got, np.array([(2, 2), (18, 2), (18, 18), (2, 18)]))
    assert got[10, 10] == 255 and got[2, 2] == 255 and got[0, 0] == 0
    # bowtie (even-odd): crossing point region differs from winding fill
    bow = np.zeros((21, 21), dtype=np.uint8)
    raster.fill_poly(bow, np.array([(2, 2), (18, 18), (18, 2), (2, 18)]))
    assert bow[10, 4] == 255  # inside left lobe... (x=4, y=10)


def test_painted_tile_keys_kinds():
    # node dot, way polyline w2, polygon outline w1, exclusion filled
    out = raster.painted_tile_keys(
        ["node"], [np.array([[5, 7]])], x_off=100, y_off=200, width=20, height=20
    )
    assert out.tolist() == [[105, 207]]

    sq = np.array([[2, 2], [10, 2], [10, 10], [2, 10]])
    outline = raster.painted_tile_keys(["polygon"], [sq], 0, 0, 20, 20)
    filled = raster.painted_tile_keys(["exclusion"], [sq], 0, 0, 20, 20)
    assert len(filled) > len(outline)
    assert {tuple(p) for p in outline} <= {tuple(p) for p in filled}
    # interior pixel only in filled
    assert (6, 6) in {tuple(p) for p in filled}
    assert (6, 6) not in {tuple(p) for p in outline}

    # clipping: far-outside geometry paints nothing
    far = raster.painted_tile_keys(["node"], [np.array([[500, 500]])], 0, 0, 20, 20)
    assert len(far) == 0


def test_stamp_width2_anchor():
    got = np.zeros((5, 5), dtype=np.uint8)
    raster.stamp(got, np.array([1]), np.array([1]), width=2)
    assert got.sum() == 4 * 255
    assert got[1, 1] and got[1, 2] and got[2, 1] and got[2, 2]


def test_lines4_batch_equals_scalar():
    """lines4_pixels (batch, no window) == per-segment line4_pixels."""
    import numpy as np

    from osmray import raster

    rng = np.random.default_rng(3)
    x0 = rng.integers(-200, 200, 200)
    y0 = rng.integers(-200, 200, 200)
    x1 = rng.integers(-200, 200, 200)
    y1 = rng.integers(-200, 200, 200)
    x1[:5] = x0[:5]  # verticals
    y1[5:10] = y0[5:10]  # horizontals
    x1[10] = x0[10]; y1[10] = y0[10]  # degenerate
    bx, by = raster.lines4_pixels(x0, y0, x1, y1)
    ax, ay = [], []
    for i in range(200):
        xs, ys = raster.line4_pixels(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        ax.append(xs)
        ay.append(ys)
    np.testing.assert_array_equal(bx, np.concatenate(ax))
    np.testing.assert_array_equal(by, np.concatenate(ay))


def test_clipped_walks_canvas_equality():
    """clipped_segment_walks + stamp == unclipped walk + stamp on the
    canvas, over randomized long polylines (the exactness contract of
    the window clip)."""
    import numpy as np

    from osmray import raster

    rng = np.random.default_rng(17)
    for trial in range(60):
        h, w = int(rng.integers(16, 200)), int(rng.integers(16, 200))
        n = int(rng.integers(2, 7))
        pts = np.stack(
            [rng.integers(-2500, 2500, n), rng.integers(-2500, 2500, n)], axis=1
        )
        if trial % 2 == 0:
            pts[0] = [rng.integers(0, w), rng.integers(0, h)]
        if trial % 3 == 0:
            pts[1][0] = pts[0][0]
        width = int(rng.choice([1, 2]))
        a = np.zeros((h, w), dtype=np.uint8)
        b = np.zeros((h, w), dtype=np.uint8)
        raster.draw_polyline(a, pts, width=width, closed=True)
        x0 = pts[:, 0]; y0 = pts[:, 1]
        x1 = np.concatenate((x0[1:], x0[:1])); y1 = np.concatenate((y0[1:], y0[:1]))
        for i in range(n):
            xs, ys = raster.line4_pixels(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
            raster.stamp(b, xs, ys, width)
        np.testing.assert_array_equal(a, b)


def test_binary_morphology_bruteforce():
    import numpy as np

    from osmray.raster import binary_dilate, binary_erode

    rng = np.random.default_rng(3)
    for _ in range(10):
        m = (rng.random((24, 24)) < 0.2).astype(np.uint8) * 255
        r = int(rng.integers(1, 3))
        ref_d = np.zeros_like(m)
        ref_e = np.zeros_like(m)
        for y in range(24):
            for x in range(24):
                y0, y1 = max(0, y - r), min(24, y + r + 1)
                x0, x1 = max(0, x - r), min(24, x + r + 1)
                win = m[y0:y1, x0:x1] > 0
                ref_d[y, x] = 255 if win.any() else 0
                full = (y1 - y0) == 2 * r + 1 and (x1 - x0) == 2 * r + 1
                ref_e[y, x] = 255 if (full and win.all()) else 0
        assert (binary_dilate(m, r) == ref_d).all()
        assert (binary_erode(m, r) == ref_e).all()
