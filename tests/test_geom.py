import numpy as np

from osmray import geom, oracle, synth


def test_points_in_ring_matches_oracle():
    rng = np.random.default_rng(42)
    for _ in range(20):
        k = int(rng.integers(3, 9))
        ring = np.stack(
            [53.9 + rng.uniform(-0.01, 0.01, k), 27.5 + rng.uniform(-0.01, 0.01, k)], axis=1
        )
        lat = 53.9 + rng.uniform(-0.012, 0.012, 200)
        lng = 27.5 + rng.uniform(-0.012, 0.012, 200)
        got = geom.points_in_ring(lat, lng, ring)
        for i in range(len(lat)):
            assert got[i] == oracle.point_in_polygon(lat[i], lng[i], ring.tolist()), i


def test_pip_vertices_on_grid():
    # grid-aligned sample points on a square: half-open edge rule
    ring = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0]])
    lat = np.array([5.0, 0.0, 10.0, 5.0, -1.0])
    lng = np.array([5.0, 5.0, 5.0, 10.0, 5.0])
    got = geom.points_in_ring(lat, lng, ring)
    ref = [oracle.point_in_polygon(lat[i], lng[i], ring.tolist()) for i in range(len(lat))]
    assert got.tolist() == ref


def _index():
    feats = synth.make_features(50, 20, 60)
    return geom.FeatureIndex.from_table(
        {
            "feature_id": feats["feature_id"].to_numpy(),
            "kind": feats["kind"],
            "geom_lat": feats["geom_lat"],
            "geom_lng": feats["geom_lng"],
        }
    ), feats


def test_index_pip_matches_scalar():
    idx, feats = _index()
    rng = np.random.default_rng(7)
    # probe near polygon centroids to get hits
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    kinds = feats["kind"].to_pylist()
    lat, lng, expected = [], [], []
    for i in range(len(kinds)):
        if kinds[i] != "polygon":
            continue
        la = float(np.mean(glat[i]))
        ln = float(np.mean(glng[i]))
        for dla, dln in [(0, 0), (0.01, 0.01), (1e-5, -1e-5)]:
            lat.append(la + dla)
            lng.append(ln + dln)
    lat = np.asarray(lat)
    lng = np.asarray(lng)
    got = idx.pip(lat, lng)
    hits = 0
    for j in range(len(lat)):
        want = []
        for i in range(len(kinds)):
            if kinds[i] != "polygon":
                continue
            ring = list(zip(glat[i], glng[i]))
            if oracle.point_in_polygon(lat[j], lng[j], ring):
                want.append(i)
        assert got[j].tolist() == want, j
        hits += len(want)
    assert hits > 0  # the probe set actually exercises hits


def test_knn_matches_brute_force():
    idx, _ = _index()
    rng = np.random.default_rng(3)
    for _ in range(25):
        la = rng.uniform(53.83, 53.97)
        ln = rng.uniform(27.41, 27.70)
        ids, d2 = idx.knn(la, ln, 3)
        bids, bd2 = idx.brute_knn(la, ln, 3)
        np.testing.assert_array_equal(ids, bids, err_msg=f"{la},{ln}")
        np.testing.assert_allclose(d2, bd2, rtol=1e-12)


def test_ring_bbox():
    ring = np.array([[53.9, 27.5], [53.95, 27.45], [53.85, 27.6]])
    assert geom.ring_bbox(ring) == (27.45, 53.85, 27.6, 53.95)


def test_point_segment_dist():
    d2 = geom.point_segment_dist2_web(
        0.0, 1.0, np.array([-1.0, 5.0]), np.array([0.0, 5.0]), np.array([1.0, 6.0]), np.array([0.0, 5.0])
    )
    assert d2[0] == 1.0  # perpendicular onto segment interior
    assert d2[1] == 25.0 + 16.0  # degenerate/far segment -> endpoint distance


def test_index_registers_antimeridian_wrapping_feature():
    # a polygon touching lng=180: cell_at wraps x modulo 2^res, so the
    # bbox x-range comes back x0 > x1; both add() and from_table()
    # must split the range instead of registering zero buckets
    ring_lat = [10.0, 10.0, 12.0, 12.0]
    ring_lng = [179.5, 180.0, 180.0, 179.5]
    via_add = geom.FeatureIndex()
    via_add.add(7, "polygon", np.stack([ring_lat, ring_lng], axis=1))
    via_tab = geom.FeatureIndex.from_table(
        {
            "feature_id": np.array([7], dtype=np.int64),
            "kind": ["polygon"],
            "geom_lat": [ring_lat],
            "geom_lng": [ring_lng],
        }
    )
    for idx in (via_add, via_tab):
        assert len(idx.buckets) > 0
        hits = idx.pip(np.array([11.0]), np.array([179.7]))
        assert hits[0].tolist() == [7]
    assert sorted(via_add.buckets) == sorted(via_tab.buckets)
