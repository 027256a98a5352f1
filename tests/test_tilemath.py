"""Vectorized tilemath vs the scalar oracle — the exact-match contract
(north_rule: tile assignments must match the reference semantics
exactly)."""

import numpy as np
import pytest

from osmray import oracle, tilemath
from osmray.tilemath import MAXAR, PLAIN, TileScheme

BOX = (27.4026, 53.8306, 27.7003, 53.9739)  # reference whole-city bbox
RNG = np.random.default_rng(42)


def _random_points(n=5000):
    W, S, E, N = BOX
    lat = RNG.uniform(S, N, n)
    lng = RNG.uniform(W, E, n)
    # sprinkle global extremes incl. beyond the siny clamp
    lat = np.concatenate([lat, [-89.9, -85.0511, 0.0, 85.0511, 89.9, 53.9]])
    lng = np.concatenate([lng, [-179.99, -180.0, 0.0, 179.99, 27.5, -27.5]])
    return lat, lng


def test_project2web_matches_oracle():
    lat, lng = _random_points()
    wx, wy = tilemath.project2web(lat, lng)
    for i in range(len(lat)):
        ox, oy = oracle.project2web(lat[i], lng[i])
        assert wx[i] == pytest.approx(ox, abs=1e-12)
        assert wy[i] == pytest.approx(oy, abs=1e-12)


@pytest.mark.parametrize("scheme", [PLAIN, MAXAR])
@pytest.mark.parametrize("z", [12, 18, 19])
def test_tile_at_wgs_matches_oracle_exactly(scheme, z):
    lat, lng = _random_points()
    tx, ty, rx, ry = tilemath.tile_at_wgs(lat, lng, z, scheme)
    for i in range(len(lat)):
        otx, oty, orx, ory = oracle.tile_at_wgs(lat[i], lng[i], z, scheme.offsetx, scheme.offsety)
        assert (tx[i], ty[i]) == (otx, oty), (lat[i], lng[i])
        assert rx[i] == pytest.approx(orx, abs=1e-6)
        assert ry[i] == pytest.approx(ory, abs=1e-6)


def test_edge_ok_matches_oracle():
    lat, lng = _random_points()
    _, _, rx, ry = tilemath.tile_at_wgs(lat, lng, 19, MAXAR)
    for edge in (16, 24):
        got = tilemath.edge_ok(rx, ry, edge)
        for i in range(len(lat)):
            assert got[i] == oracle.edge_ok(rx[i], ry[i], edge)


def test_edge_boundary_exact():
    # residuals exactly at the boundary: rx = edge is kept, rx = 256-edge dropped
    rx = np.array([15.999, 16.0, 240.0 - 1e-9, 240.0, 0.0])
    ry = np.full_like(rx, 128.0)
    got = tilemath.edge_ok(rx, ry, 16)
    assert got.tolist() == [False, True, True, False, False]


def test_wgs_at_tile_center_roundtrip():
    # tile -> wgs (center) -> tile is identity on the PLAIN scheme
    txs = np.array([0, 1, 100_000, 154_000, (1 << 19) - 1])
    tys = np.array([0, 5, 90_000, 170_000, (1 << 19) - 1])
    lat, lng = tilemath.wgs_at_tile(txs, tys, 19)
    tx2, ty2, rx, ry = tilemath.tile_at_wgs(lat, lng, 19, PLAIN)
    np.testing.assert_array_equal(tx2, txs)
    np.testing.assert_array_equal(ty2, tys)
    # and the point is the tile center (128, 128) within float error
    assert np.allclose(rx, 128.0, atol=1e-3)
    assert np.allclose(ry, 128.0, atol=1e-3)
    for i in range(len(txs)):
        ola, oln = oracle.wgs_at_tile(int(txs[i]), int(tys[i]), 19)
        assert lat[i] == pytest.approx(ola, abs=1e-12)
        assert lng[i] == pytest.approx(oln, abs=1e-12)


def test_offset_roundtrip_is_shifted():
    """The reference's wgs_at_tile does NOT undo provider offsets, so
    tile -> wgs -> tile on an offset scheme shifts near tile borders —
    a preserved semantic (lib/layers.py:32-39, make_expand.py:80)."""
    # Maxar x offset is -30px at z19: points within 30px of the right
    # tile edge come back in the next tile over.
    lat, lng = tilemath.wgs_at_tile(np.array([300000]), np.array([160000]), 19)
    tx, ty, _, _ = tilemath.tile_at_wgs(lat, lng, 19, MAXAR)
    # center (128 px) shifted by -30 px stays in-tile for x
    assert tx[0] == 300000 and ty[0] == 160000
    # but a point 110 px right of center crosses: 238 - 30 = 208 < 256 stays;
    # construct one at 250 px -> 220 stays; the shift shows via residual
    _, _, rx, ry = tilemath.tile_at_wgs(lat, lng, 19, MAXAR)
    assert rx[0] == pytest.approx(128 - 30, abs=1e-3)
    assert ry[0] == pytest.approx(128 + 10, abs=1e-3)


def test_flip_y_and_path_codecs():
    assert MAXAR.flip_y(np.array([5]), 19)[0] == (1 << 19) - 6 == oracle.flip_y(5, 19)
    assert PLAIN.flip_y(np.array([5]), 19)[0] == 5
    p = tilemath.tile_path(302304, 168755, 19, PLAIN)
    assert p == "z19/x302304y168755.png"
    assert tilemath.xy_from_path(p) == (302304, 168755)
    # flipped provider writes the flipped y into the name
    pf = tilemath.tile_path(10, 5, 19, MAXAR)
    assert tilemath.xy_from_path(pf) == (10, (1 << 19) - 6)


def test_pack_unpack_tile_roundtrip():
    tx = np.array([-1, 0, 1, 154_860, (1 << 19) - 1, 302304])
    ty = np.array([0, -1, 170_000, 5, (1 << 19) - 1, 168755])
    for z in (0, 12, 19):
        key = tilemath.pack_tile(tx, ty, z)
        tx2, ty2, z2 = tilemath.unpack_tile(key)
        np.testing.assert_array_equal(tx2, tx)
        np.testing.assert_array_equal(ty2, ty)
        assert (z2 == z).all()
    # keys are unique across distinct (tx, ty, z)
    keys = np.concatenate(
        [tilemath.pack_tile(tx, ty, 18), tilemath.pack_tile(tx, ty, 19)]
    )
    assert len(np.unique(keys)) == len(keys)


def test_tiles_near_web_matches_reference_shape():
    """Viewport cover reproduces the reference's tiles_near_wgs grid +
    center-point semantics (lib/layers.py:145-178), including the
    quirk that the x-extent also uses h."""
    lat, lng = 53.9, 27.55
    wx, wy = oracle.project2web(lat, lng)
    box, (rx, ry) = tilemath.tiles_near_web(wx, wy, 18, 256, 256, MAXAR)
    (txmin, txmax), (tymin, tymax) = box
    # 256px viewport straddles 2x2 tiles unless perfectly aligned
    assert txmax - txmin in (0, 1) and tymax - tymin in (0, 1)
    scale = 1 << 18
    px = (wx + MAXAR.offsetx) * scale
    py = (wy + MAXAR.offsety) * scale
    assert rx == round(px - txmin * 256)
    assert ry == round(py - tymin * 256)


def test_bbox_tiles_counts_match_survey():
    """The whole-city bbox covers 154,860 z19 tiles / 39,022 z18 tiles
    (computed from reference formulas; see BASELINE.md)."""
    W, S, E, N = BOX
    for z, expect in ((19, 154_860), (18, 39_022)):
        txmin, tymin, txmax, tymax = tilemath.bbox_tiles(W, S, E, N, z, MAXAR)
        assert (txmax - txmin + 1) * (tymax - tymin + 1) == expect


def test_scheme_is_immutable_value():
    s = TileScheme("t", flipy=True, offsetx=0.5)
    with pytest.raises(Exception):
        s.offsetx = 1.0


def test_quadkey_canonical_and_prefix_property():
    import numpy as np

    from osmray.tilemath import quadkey_str

    # the canonical Bing tile-system example: (3, 5) at z3 -> "213"
    assert list(quadkey_str(np.array([3]), np.array([5]), 3)) == ["213"]
    assert list(quadkey_str(np.array([0]), np.array([0]), 1)) == ["0"]
    # prefix property: a child's quadkey extends its parent's
    rng = np.random.RandomState(3)
    tx = rng.randint(0, 1 << 12, 50).astype(np.int64)
    ty = rng.randint(0, 1 << 12, 50).astype(np.int64)
    q12 = quadkey_str(tx, ty, 12)
    q6 = quadkey_str(tx >> 6, ty >> 6, 6)
    assert all(a.startswith(b) for a, b in zip(q12, q6))
