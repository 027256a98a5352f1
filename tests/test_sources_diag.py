import numpy as np
import pytest

from osmray import codecs, diagnostics, geom, oracle, sources, tilemath


def test_mil_matches_reference_semantics():
    x = np.array([53.123456789, -27.000000501, 0.0, -0.1])
    got = tilemath.mil(x)
    import math

    want = [math.floor(v * 1e6) for v in x]
    np.testing.assert_array_equal(got, want)


def test_osm_edit_url():
    u = tilemath.osm_edit_url(302304, 168755, 19)
    assert u.startswith("https://www.openstreetmap.org/edit#map=19/")


def test_wkt_parser_matches_oracle_and_reference_file():
    s = 'POLYGON ((1.1 .2, 1 2.2, 1 -2.2))\n  POLYGON ((27.5 53.9, 27.6 53.95))'
    got = geom.latlngs_from_wkt(s)
    assert got == oracle.latlngs_from_wkt(s)
    assert got[0][0] == (0.2, 1.1)  # lon-lat swapped to lat-lng
    import os

    wkt_path = "/root/reference/make_buildings_except.wkt"
    if os.path.exists(wkt_path):
        with open(wkt_path) as fh:
            rings = geom.latlngs_from_wkt(fh.read())
        assert len(rings) >= 1
        assert all(len(r) >= 3 for r in rings if r)


def test_resolve_ways(ray_session):
    import ray.data

    node_ids = np.array([10, 20, 30, 40], dtype=np.int64)
    lat = np.array([1.0, 2.0, 3.0, 4.0])
    lng = np.array([-1.0, -2.0, -3.0, -4.0])
    ways = ray.data.from_items(
        [
            {"way_id": 100, "refs": [10, 20, 99]},  # 99 missing -> dropped
            {"way_id": 200, "refs": [40, 40, 30]},
        ]
    )
    out = sources.resolve_ways(ways, node_ids, lat, lng).to_pandas()
    w100 = out[out["way_id"] == 100]
    assert w100["node_id"].tolist() == [10, 20]
    assert w100["lat"].tolist() == [1.0, 2.0]
    w200 = out[out["way_id"] == 200].sort_values("seq")
    assert w200["node_id"].tolist() == [40, 40, 30]  # dup refs preserved


def test_marker_and_frames(ray_session):
    import ray.data

    from osmray import synth

    imgs = synth.make_images(6)
    ds = ray.data.from_arrow(imgs)
    frames = diagnostics.marked_frames(ds, limit=4).to_pandas()
    assert len(frames) == 4
    assert frames["image_id"].is_monotonic_increasing
    f = codecs.decode(frames.iloc[0]["frame"], "png")
    assert f.shape == (256, 256, 3)
    # marker: center pixel forced to pure red (BGR 0,0,255)
    assert tuple(f[128, 128]) == (0, 0, 255)
    # and differs from the un-marked source
    src = codecs.decode(imgs["bytes"][0].as_py(), imgs["fmt"][0].as_py())
    assert (f != src).any()


def test_minimap_canvas():
    keys = tilemath.pack_tile(np.array([5, 6]), np.array([7, 7]), 19)
    means = {"tile_key": keys, "b": [10, 20], "g": [30, 40], "r": [50, 60]}
    canvas = diagnostics.minimap_canvas(means, (5, 7, 6, 7))
    assert canvas.shape == (1, 2, 3)
    assert tuple(canvas[0, 0]) == (10, 30, 50)
    assert tuple(canvas[0, 1]) == (20, 40, 60)


def test_avi_roundtrip(ray_session, tmp_path):
    """MJPG-AVI container: structural roundtrip + decodable frames."""
    import numpy as np

    from osmray import avi, codecs, synth
    from osmray.diagnostics import marked_frames
    from osmray.jpeg import jpeg_decode

    # container-level roundtrip
    x, y = np.meshgrid(np.arange(64), np.arange(48))
    frames = []
    from osmray.jpeg import jpeg_encode

    for i in range(5):
        img = ((x + y * 2 + i * 11) % 200).astype(np.uint8)[..., None].repeat(3, axis=2)
        frames.append(jpeg_encode(img, 90))
    blob = avi.avi_write(frames, fps=60, w=64, h=48)
    got, fps, w, h = avi.avi_read(blob)
    assert (fps, w, h) == (60, 64, 48)
    assert got == frames
    dec = jpeg_decode(got[2])
    assert dec.shape == (48, 64, 3)

    # end-to-end: marked frames dataset -> one AVI file
    import ray.data

    t = synth.make_images(6)
    ds = ray.data.from_arrow(t)
    info = avi.pack_marked_frames(marked_frames(ds, limit=4), str(tmp_path / "review.avi"))
    assert info["n_frames"] == 4 and info["w"] == 256 and info["h"] == 256
    fr2, fps2, w2, h2 = avi.avi_read((tmp_path / "review.avi").read_bytes())
    assert len(fr2) == 4 and (w2, h2) == (256, 256) and fps2 == 60
    img = jpeg_decode(fr2[0])
    # the red X marker survives the jpeg trip (center pixel strongly red)
    c = img[128, 128].astype(int)
    assert c[2] > 150 and c[0] < 120 and c[1] < 120
