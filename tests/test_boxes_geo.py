"""Detection-box + trajectory geometry operators: greedy NMS, IoU
join, geohash encode, Hausdorff distance — kernels pinned against
brute-force references, the distributed plans against in-process
recomputation."""

import numpy as np
import pyarrow as pa
import pytest

from osmray.cells import GEOHASH32, geohash_encode
from osmray.geom import hausdorff_directed_sq, nms_boxes


def _brute_nms(sc, x0, y0, x1, y1, num, den):
    alive = sorted(range(len(sc)), key=lambda i: (-sc[i], i))
    out = []
    while alive:
        i = alive.pop(0)
        out.append(i)

        def suppressed(j):
            iw = min(x1[i], x1[j]) - max(x0[i], x0[j])
            ih = min(y1[i], y1[j]) - max(y0[i], y0[j])
            inter = max(iw, 0) * max(ih, 0)
            uni = ((x1[i] - x0[i]) * (y1[i] - y0[i])
                   + (x1[j] - x0[j]) * (y1[j] - y0[j]) - inter)
            return inter * den >= num * uni

        alive = [j for j in alive if not suppressed(j)]
    return out


def test_nms_matches_brute_greedy():
    rng = np.random.RandomState(7)
    for _ in range(100):
        n = rng.randint(1, 14)
        x0 = rng.randint(0, 90, n).astype(np.int64)
        y0 = rng.randint(0, 90, n).astype(np.int64)
        x1 = x0 + rng.randint(1, 50, n)
        y1 = y0 + rng.randint(1, 50, n)
        sc = rng.randint(0, 25, n).astype(np.int64)  # many score ties
        kept = nms_boxes(sc, x0, y0, x1, y1, 1, 4)
        assert list(kept) == _brute_nms(sc, x0, y0, x1, y1, 1, 4)


def test_nms_chain_rescue():
    # B suppressed by A; C overlaps B but not A -> greedy keeps C
    # (a one-shot "overlapped by any better box" filter would drop it)
    x0 = np.array([0, 8, 16], dtype=np.int64)
    x1 = x0 + 10
    y0 = np.zeros(3, dtype=np.int64)
    y1 = y0 + 10
    sc = np.array([30, 20, 10], dtype=np.int64)
    kept = nms_boxes(sc, x0, y0, x1, y1, 1, 10)
    assert list(kept) == [0, 2]


def test_nms_float_scores_order_correctly():
    # fractional detector confidences must not be truncated to int:
    # 0.9 beats 0.1 even though both truncate to 0
    x0 = np.array([0, 0], dtype=np.int64)
    x1 = np.array([10, 10], dtype=np.int64)
    y0 = np.zeros(2, dtype=np.int64)
    y1 = y0 + 10
    sc = np.array([0.1, 0.9])
    kept = nms_boxes(sc, x0, y0, x1, y1, 1, 4)
    assert list(kept) == [1]  # the 0.9 box wins, not row order


def test_nms_degenerate_boxes_do_not_suppress():
    # two zero-area boxes far apart: union 0 must read as IoU 0,
    # never 0 >= 0 "full overlap" — both survive
    sc = np.array([5, 4], dtype=np.int64)
    x0 = np.array([0, 1000], dtype=np.int64)
    y0 = np.array([0, 1000], dtype=np.int64)
    kept = nms_boxes(sc, x0, y0, x0.copy(), y0.copy(), 1, 2)
    assert sorted(kept) == [0, 1]


def test_hex_neighbors_boundary_is_sentinel_not_wrap():
    from osmray.cells import hex_neighbors

    nb = hex_neighbors(np.array([0], dtype=np.int64))[0]  # row 0, col 0
    assert -1 in nb  # off-lattice marked, and never a wrapped key
    assert all(v == -1 or (v >= 0 and v % 32768 < 32768) for v in nb)
    assert 32767 not in nb and (32768 * 1 - 1) not in nb


def test_union_area_matches_raster_count():
    from osmray.geom import union_area_boxes

    rng = np.random.RandomState(3)
    for _ in range(40):
        n = rng.randint(1, 12)
        x0 = rng.randint(0, 60, n).astype(np.int64)
        y0 = rng.randint(0, 60, n).astype(np.int64)
        x1 = x0 + rng.randint(0, 30, n)  # some degenerate (zero width)
        y1 = y0 + rng.randint(0, 30, n)
        grid = np.zeros((100, 100), dtype=bool)
        for i in range(n):
            grid[x0[i]:x1[i], y0[i]:y1[i]] = True
        assert union_area_boxes(x0, y0, x1, y1) == int(grid.sum())
    assert union_area_boxes(np.array([5]), np.array([5]),
                            np.array([5]), np.array([9])) == 0


def test_hull_diameter_matches_brute_all_pairs():
    from osmray.geom import hull_diameter_sq

    rng = np.random.RandomState(17)
    for _ in range(60):
        n = rng.randint(1, 40)
        x = rng.randint(0, 1000, n).astype(np.int64)
        y = rng.randint(0, 1000, n).astype(np.int64)
        brute = 0
        for i in range(n):
            for j in range(i + 1, n):
                brute = max(brute, int((x[i] - x[j]) ** 2
                                       + (y[i] - y[j]) ** 2))
        assert hull_diameter_sq(x, y) == brute
    # collinear and duplicate degenerate sets
    assert hull_diameter_sq(np.array([3, 3, 3]), np.array([1, 5, 9])) == 64
    assert hull_diameter_sq(np.array([7]), np.array([7])) == 0
    assert hull_diameter_sq(np.array([2, 2]), np.array([4, 4])) == 0


def test_hausdorff_matches_brute():
    rng = np.random.RandomState(11)
    for _ in range(60):
        a = rng.randint(0, 2000, (rng.randint(1, 30), 2)).astype(np.int64)
        b = rng.randint(0, 2000, (rng.randint(1, 30), 2)).astype(np.int64)
        got = hausdorff_directed_sq(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
        brute = max(min(int((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2)
                        for q in b) for p in a)
        assert got == brute


def _canonical_geohash(lat, lon, chars):
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    bits, even = [], True
    while len(bits) < chars * 5:
        if even:
            mid = sum(lon_i) / 2
            bits.append(1 if lon > mid else 0)
            lon_i = (mid, lon_i[1]) if lon > mid else (lon_i[0], mid)
        else:
            mid = sum(lat_i) / 2
            bits.append(1 if lat > mid else 0)
            lat_i = (mid, lat_i[1]) if lat > mid else (lat_i[0], mid)
        even = not even
    out = ""
    for i in range(chars):
        v = 0
        for b in bits[5 * i:5 * i + 5]:
            v = v * 2 + b
        out += GEOHASH32[v]
    return out


def test_geohash_matches_canonical_algorithm():
    rng = np.random.RandomState(3)
    lats = rng.uniform(-89, 89, 100)
    lons = rng.uniform(-179, 179, 100)
    xi = ((lons + 180.0) / 360.0 * (1 << 15)).astype(np.int64)
    yi = ((lats + 90.0) / 180.0 * (1 << 15)).astype(np.int64)
    got = geohash_encode(xi, yi, 6)
    for g, lat, lon in zip(got, lats, lons):
        assert g == _canonical_geohash(lat, lon, 6)
    # 4-char variant uses a 10+10-bit lattice
    got4 = geohash_encode(xi >> 5, yi >> 5, 4)
    for g, lat, lon in zip(got4, lats, lons):
        assert g == _canonical_geohash(lat, lon, 4)


@pytest.mark.usefixtures("ray_session")
def test_box_iou_join_matches_brute():
    import ray.data

    from osmray.joins import box_overlap_join

    rng = np.random.RandomState(5)

    def mk(n, seed):
        r = np.random.RandomState(seed)
        x0 = r.randint(0, 4000, n).astype(np.int64)
        y0 = r.randint(0, 4000, n).astype(np.int64)
        return pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "x0": pa.array(x0), "y0": pa.array(y0),
            "x1": pa.array(x0 + r.randint(1, 300, n)),
            "y1": pa.array(y0 + r.randint(1, 300, n))})

    ta, tb = mk(300, 1), mk(300, 2)
    got = (box_overlap_join(
        ray.data.from_arrow(ta).repartition(4),
        ray.data.from_arrow(tb).repartition(4),
        cell_shift=7, min_iou=(1, 4))
        .to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True))

    A, B = ta.to_pandas(), tb.to_pandas()
    rows = []
    for a in A.itertuples():
        iw = np.minimum(a.x1, B.x1) - np.maximum(a.x0, B.x0)
        ih = np.minimum(a.y1, B.y1) - np.maximum(a.y0, B.y0)
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        uni = ((a.x1 - a.x0) * (a.y1 - a.y0)
               + (B.x1 - B.x0) * (B.y1 - B.y0) - inter)
        for j in np.flatnonzero((inter > 0) & (inter * 4 >= uni)):
            rows.append((a.id, int(B.id[j]), int(inter[j]), int(uni[j])))
    rows.sort()
    assert [tuple(r) for r in got.itertuples(index=False)] == rows


def test_frechet_matches_brute_dp_and_dominates_hausdorff():
    import functools

    from osmray.geom import frechet_sq

    def brute(a, b):
        @functools.lru_cache(None)
        def c(i, j):
            d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                return d
            if i == 0:
                return max(d, c(0, j - 1))
            if j == 0:
                return max(d, c(i - 1, 0))
            return max(d, min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)))
        return c(len(a) - 1, len(b) - 1)

    rng = np.random.RandomState(4)
    for _ in range(50):
        a = rng.randint(0, 800, (rng.randint(1, 12), 2))
        b = rng.randint(0, 800, (rng.randint(1, 12), 2))
        got = frechet_sq(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
        assert got == brute(tuple(map(tuple, a)), tuple(map(tuple, b)))
        assert got >= max(
            hausdorff_directed_sq(a[:, 0], a[:, 1], b[:, 0], b[:, 1]),
            hausdorff_directed_sq(b[:, 0], b[:, 1], a[:, 0], a[:, 1]))


def test_dda_cells_endpoints_and_adjacency():
    from osmray.geom import dda_cells

    rng = np.random.RandomState(6)
    x0 = rng.randint(0, 60000, 200).astype(np.int64)
    y0 = rng.randint(0, 60000, 200).astype(np.int64)
    x1 = rng.randint(0, 60000, 200).astype(np.int64)
    y1 = rng.randint(0, 60000, 200).astype(np.int64)
    ri, cx, cy = dda_cells(x0, y0, x1, y1, shift=8)
    for s in range(200):
        m = ri == s
        # first/last samples are exactly the endpoints' cells
        assert cx[m][0] == x0[s] >> 8 and cy[m][0] == y0[s] >> 8
        assert cx[m][-1] == x1[s] >> 8 and cy[m][-1] == y1[s] >> 8
        # consecutive samples move at most one cell per axis
        assert np.abs(np.diff(cx[m])).max(initial=0) <= 1
        assert np.abs(np.diff(cy[m])).max(initial=0) <= 1
