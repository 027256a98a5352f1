"""Mosaic/crop gather vs scalar assembly from the fixture tiles."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmray import codecs, mosaic, oracle, pipeline, synth, tilemath
from osmray.pipeline import LabelJobConfig


@pytest.fixture(scope="module")
def CFG(fixture_dir):
    return LabelJobConfig(bbox=synth.fixture_bbox(fixture_dir), limit=40)


@pytest.fixture(scope="module")
def images_ds(ray_session, fixture_dir):
    import ray.data

    return ray.data.read_parquet(
        sorted(glob.glob(os.path.join(fixture_dir, "images", "*.parquet")))
    )


@pytest.fixture(scope="module")
def img_lut(fixture_dir):
    """tile_key -> (winner image_id, decoded pixels) from the fixture."""
    tabs = [
        pq.read_table(f)
        for f in sorted(glob.glob(os.path.join(fixture_dir, "images", "*.parquet")))
    ]
    import pyarrow as pa

    t = pa.concat_tables(tabs)
    lat = t["lat"].to_numpy()
    lng = t["lng"].to_numpy()
    tx, ty, _, _ = tilemath.tile_at_wgs(lat, lng, 19, tilemath.MAXAR)
    keys = tilemath.pack_tile(tx, ty, 19)
    lut = {}
    ids = t["image_id"].to_pylist()
    blobs = t["bytes"].to_pylist()
    fmts = t["fmt"].to_pylist()
    for i in np.argsort(np.asarray(ids)):
        k = int(keys[i])
        if k not in lut:
            lut[k] = (ids[i], codecs.decode(blobs[i], fmts[i]))
    return lut


def test_tile_window_crop_equals_tile_image(ray_session, images_ds, img_lut, CFG):
    # pick 3 points at tile centers -> full-tile crops == winner pixels
    some_keys = sorted(img_lut)[:3]
    tx, ty, _ = tilemath.unpack_tile(np.asarray(some_keys))
    lat, lng = tilemath.wgs_at_tile(tx, ty, 19)
    # wgs_at_tile doesn't undo MAXAR offsets; centers stay inside (128-30, 128+10)
    rid = np.arange(3)
    win = mosaic.tile_windows(rid, lat, lng, 19, CFG.scheme)
    assign = pipeline.make_assign_tiles(19, CFG.scheme)
    out = (
        mosaic.gather_crops(images_ds.map_batches(assign, batch_format="pyarrow"), win, 19, CFG.scheme)
        .to_pandas()
        .set_index("req_id")
    )
    assert len(out) == 3
    for i, key in enumerate(some_keys):
        crop = codecs.decode(out.loc[i, "crop"], "png")
        np.testing.assert_array_equal(crop, img_lut[key][1], err_msg=str(key))
        assert out.loc[i, "n_missing"] == 0


def test_point_crop_matches_scalar_assembly(ray_session, images_ds, img_lut, CFG):
    W, S, E, N = CFG.bbox
    lat = np.array([(S + N) / 2 + 1e-4])
    lng = np.array([(W + E) / 2 + 1e-4])
    rid = np.array([7])
    win = mosaic.point_windows(rid, lat, lng, 256, 256, 19, CFG.scheme)
    assign = pipeline.make_assign_tiles(19, CFG.scheme)
    out = mosaic.gather_crops(
        images_ds.map_batches(assign, batch_format="pyarrow"), win, 19, CFG.scheme
    ).to_pandas()
    assert len(out) == 1
    crop = codecs.decode(out.iloc[0]["crop"], "png")
    assert crop.shape == (256, 256, 3)

    # scalar assembly (reference formulas)
    wx, wy = oracle.project2web(lat[0], lng[0])
    scale = 1 << 19
    px = (wx + CFG.scheme.offsetx) * scale
    py = (wy + CFG.scheme.offsety) * scale
    import math

    txmin = math.floor((px - 128) / 256)
    txmax = math.floor((px + 128) / 256)
    tymin = math.floor((py - 128) / 256)
    tymax = math.floor((py + 128) / 256)
    H = (tymax - tymin + 1) * 256
    Wd = (txmax - txmin + 1) * 256
    canvas = np.zeros((H, Wd, 3), dtype=np.uint8)
    for ty in range(tymin, tymax + 1):
        for tx in range(txmin, txmax + 1):
            key = int(tilemath.pack_tile(np.array([tx]), np.array([ty]), 19)[0])
            if key in img_lut:
                canvas[
                    (ty - tymin) * 256 : (ty - tymin + 1) * 256,
                    (tx - txmin) * 256 : (tx - txmin + 1) * 256,
                ] = img_lut[key][1]
    cx = round(px - txmin * 256)
    cy = round(py - tymin * 256)
    ref = canvas[cy - 128 : cy + 128, cx - 128 : cx + 128, :]
    np.testing.assert_array_equal(crop, ref)


def test_expand_job_shapes_and_lanes(ray_session, images_ds, fixture_dir, CFG):
    import pyarrow.parquet as pq2

    feats = pq2.read_table(os.path.join(fixture_dir, "features.parquet"))
    ds = pipeline.run_expand_job(images_ds, feats, CFG, train=20, valid=10)
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df["label"].unique()) <= {"lamp", "nolamp"}
    assert set(df["kind"].unique()) <= {"crop", "tile"}
    crops = df[df["kind"] == "crop"]
    assert (crops["crop_h"] == 256).all() and (crops["crop_w"] == 256).all()
    tiles = df[df["kind"] == "tile"]
    assert (tiles["crop_h"] == 256).all()
    # train/valid asymmetry preserved
    assert (df[df["split"] == "train"]["kind"] == "crop").all()
    assert (df[df["split"] == "valid"]["kind"] == "tile").all()


def test_roofshapes_job(ray_session, images_ds, fixture_dir, CFG):
    import pyarrow.parquet as pq2

    feats = pq2.read_table(os.path.join(fixture_dir, "features.parquet"))
    ds, counts = pipeline.run_roofshapes_job(images_ds, feats, CFG)
    df = ds.to_pandas()
    assert set(counts["label"]) <= {"flat", "hipped", "gabled"}
    assert len(df) > 0
    assert set(df["label"].unique()) <= {"flat", "hipped", "gabled"}
    # size gate: all crops within [128, 1024)
    assert ((df["crop_h"] >= 128) & (df["crop_h"] < 1024)).all()
    assert ((df["crop_w"] >= 128) & (df["crop_w"] < 1024)).all()


def test_way_window_formula():
    """Window math matches the reference's tiles_way padding + wrap
    (lib/layers.py:245-272) on a hand-computed case."""
    g = np.array([[53.9, 27.55], [53.901, 27.552]])
    win = mosaic.way_windows([1], [g], 18, tilemath.MAXAR, pad_pct=0.25, pad_px=48)
    r = {k: win[k][0].as_py() for k in win.schema.names}
    wx, wy = tilemath.project2web(g[:, 0], g[:, 1])
    W, E = wx.min(), wx.max()
    N, S = wy.min(), wy.max()
    scale = 1 << 18
    pad_WE = max((E - W) * 0.25, 48 / scale)
    pad_NS = max((S - N) * 0.25, 48 / scale)
    import math

    Wp = (W - pad_WE) % 256
    Np = (N - pad_NS) % 256
    assert r["txmin"] == math.floor((Wp + tilemath.MAXAR.offsetx) * scale / 256)
    assert r["tymin"] == math.floor((Np + tilemath.MAXAR.offsety) * scale / 256)
    assert r["x1"] - r["x0"] >= 96  # padded window is at least ~2*48px wide
