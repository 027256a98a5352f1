"""make_buildings variant: polygon positives (every vertex, edge=24),
outline painting, filled exclusions removed from the negative pool."""

import dataclasses
import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmray import oracle, pipeline, synth, tilemath
from osmray.pipeline import BUILDINGS


@pytest.fixture(scope="module")
def CFG(fixture_dir):
    # buildings config at the fixture's z19 window (the reference used
    # z18; zoom is a config knob, semantics identical)
    return dataclasses.replace(
        BUILDINGS, z=19, bbox=synth.fixture_bbox(fixture_dir), limit=40, mask_concurrency=2
    )


@pytest.fixture(scope="module")
def feats(fixture_dir):
    return pq.read_table(os.path.join(fixture_dir, "features.parquet"))


@pytest.fixture(scope="module")
def images_ds(ray_session, fixture_dir):
    import ray.data

    return ray.data.read_parquet(
        sorted(glob.glob(os.path.join(fixture_dir, "images", "*.parquet")))
    )


def test_positive_vertex_tiles_edge24(feats, CFG):
    _, pos_keys = pipeline.positive_feature_tiles(feats, CFG)
    kinds = feats["kind"].to_pylist()
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    want = set()
    for i in range(len(kinds)):
        if kinds[i] != "polygon":
            continue
        for la, ln in zip(glat[i], glng[i]):
            tx, ty, rx, ry = oracle.tile_at_wgs(la, ln, CFG.z, CFG.scheme.offsetx, CFG.scheme.offsety)
            if oracle.edge_ok(rx, ry, 24):  # make_buildings.py:40
                want.add(int(tilemath.pack_tile(np.array([tx]), np.array([ty]), CFG.z)[0]))
    sampled = pipeline.sample_smallest(np.asarray(sorted(want), dtype=np.int64), CFG.limit, CFG.seed)
    assert set(pos_keys.tolist()) == set(sampled.tolist())
    assert len(pos_keys) <= CFG.limit


def test_exclusions_removed_from_negatives(ray_session, feats, CFG):
    """Exclusion polygons are FILLED into the painter, so no negative
    tile falls inside them (make_buildings.py:58-59)."""
    painted = pipeline.painted_tile_set(feats, CFG)
    neg = pipeline.sample_negative_tiles(painted, CFG)
    # oracle painter: outlines for polygons + filled exclusions
    mp = oracle.PainterOracle(*CFG.bbox, CFG.z, CFG.scheme.offsetx, CFG.scheme.offsety)
    kinds = feats["kind"].to_pylist()
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    for i in range(len(kinds)):
        if kinds[i] == "polygon":
            mp.add_polyline(list(zip(glat[i], glng[i])), width=1)
        elif kinds[i] == "exclusion":
            mp.add_fillpoly(list(zip(glat[i], glng[i])))
    want = {
        int(tilemath.pack_tile(np.array([tx]), np.array([ty]), CFG.z)[0])
        for tx, ty in mp.painted_tiles()
    }
    assert set(painted.tolist()) == want
    assert not set(neg.tolist()) & want


def test_buildings_end_to_end(ray_session, images_ds, feats, CFG):
    ds, _ = pipeline.run_label_job(images_ds, feats, CFG, mask=False, roundtrip=False)
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df["label"].unique()) <= {"yes", "no"}
    assert df["tile_key"].is_unique
