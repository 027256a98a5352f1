"""End-to-end flagship pipeline on the deterministic fixture, checked
against the scalar PainterOracle (golden semantics)."""

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from osmray import codecs, lancelike, oracle, pipeline, synth, tilemath
from osmray.pipeline import LabelJobConfig
from osmray.stages import hash64


@pytest.fixture(scope="module")
def CFG(fixture_dir):
    return LabelJobConfig(
        bbox=synth.fixture_bbox(fixture_dir), limit=50, mask_concurrency=2, mask_batch=128
    )


@pytest.fixture(scope="module")
def images_ds(ray_session, fixture_dir):
    import ray.data

    return ray.data.read_parquet(sorted(glob.glob(os.path.join(fixture_dir, "images", "*.parquet"))))


@pytest.fixture(scope="module")
def feats(fixture_dir):
    return pq.read_table(os.path.join(fixture_dir, "features.parquet"))


def _oracle_painter(feats, cfg):
    """Scalar painter twin of painted_tile_set + sampled positives."""
    kinds = feats["kind"].to_pylist()
    fids = feats["feature_id"].to_numpy()
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    tags = feats["tags"].to_pylist()

    lamp_ids = [
        int(fids[i])
        for i in range(len(kinds))
        if kinds[i] == "node" and dict(tags[i]).get("highway") == "street_lamp"
    ]
    sampled = set(
        pipeline.sample_smallest(np.asarray(lamp_ids, dtype=np.int64), cfg.limit, cfg.seed).tolist()
    )

    mp = oracle.PainterOracle(*cfg.bbox, cfg.z, cfg.scheme.offsetx, cfg.scheme.offsety)
    for i in range(len(kinds)):
        if kinds[i] == "node" and int(fids[i]) in sampled:
            mp.add_dots([(glat[i][0], glng[i][0])])
        elif kinds[i] == "way":
            mp.add_polyline(list(zip(glat[i], glng[i])), width=cfg.way_width)
    return mp, sampled


def test_painted_set_matches_oracle(ray_session, feats, CFG):
    pos_feats, _ = pipeline.positive_feature_tiles(feats, CFG)
    painted = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    mp, _ = _oracle_painter(feats, CFG)
    want = {
        int(tilemath.pack_tile(np.array([tx]), np.array([ty]), CFG.z)[0])
        for tx, ty in mp.painted_tiles()
    }
    assert set(painted.tolist()) == want


def test_positive_tiles_match_oracle(feats, CFG):
    _, pos_keys = pipeline.positive_feature_tiles(feats, CFG)
    mp, sampled = _oracle_painter(feats, CFG)
    kinds = feats["kind"].to_pylist()
    fids = feats["feature_id"].to_numpy()
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    want = set()
    for i in range(len(kinds)):
        if kinds[i] == "node" and int(fids[i]) in sampled:
            tx, ty, rx, ry = oracle.tile_at_wgs(
                glat[i][0], glng[i][0], CFG.z, CFG.scheme.offsetx, CFG.scheme.offsety
            )
            if oracle.edge_ok(rx, ry, CFG.edge):
                want.add(int(tilemath.pack_tile(np.array([tx]), np.array([ty]), CFG.z)[0]))
    assert set(pos_keys.tolist()) == want


def test_negative_sampling_paths_agree(ray_session, feats, CFG, monkeypatch):
    """Driver-side and distributed complement samplers are the same
    formula; pin them equal."""
    pos_feats, _ = pipeline.positive_feature_tiles(feats, CFG)
    painted = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    small = pipeline.sample_negative_tiles(painted, CFG)
    monkeypatch.setattr(pipeline, "DRIVER_UNIVERSE_MAX", 0)
    dist = pipeline.sample_negative_tiles(painted, CFG)
    np.testing.assert_array_equal(small, dist)


def test_negative_sampling_keyed_painted_set_agrees(ray_session, feats, CFG, monkeypatch):
    """The keyed (grace anti-join, no driver collect) painted-set path
    returns byte-identical negatives to the broadcast path — at every
    universe regime."""
    pos_feats, _ = pipeline.positive_feature_tiles(feats, CFG)
    painted_arr = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    painted_ds = pipeline.painted_tile_set(feats, CFG, extra=pos_feats, mode="keyed")
    assert not isinstance(painted_ds, np.ndarray)
    # keyed painted keys = broadcast painted keys (as a set)
    keyed_keys = np.unique(painted_ds.to_pandas()["tile_key"].to_numpy())
    np.testing.assert_array_equal(keyed_keys, painted_arr)
    want = pipeline.sample_negative_tiles(painted_arr, CFG)
    got = pipeline.sample_negative_tiles(
        pipeline.painted_tile_set(feats, CFG, extra=pos_feats, mode="keyed"), CFG
    )
    np.testing.assert_array_equal(want, got)
    # auto mode flips to keyed above the canvas cap
    monkeypatch.setattr(pipeline, "PAINTED_BROADCAST_MAX", 0)
    auto = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    assert not isinstance(auto, np.ndarray)
    np.testing.assert_array_equal(want, pipeline.sample_negative_tiles(auto, CFG))


def test_negative_sampling_deterministic_and_unpainted(ray_session, feats, CFG):
    pos_feats, _ = pipeline.positive_feature_tiles(feats, CFG)
    painted = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    neg1 = pipeline.sample_negative_tiles(painted, CFG)
    neg2 = pipeline.sample_negative_tiles(painted, CFG)
    np.testing.assert_array_equal(neg1, neg2)
    assert len(neg1) == CFG.limit
    assert not set(neg1.tolist()) & set(painted.tolist())
    mp, _ = _oracle_painter(feats, CFG)
    for key in neg1[:20]:
        tx, ty, z = tilemath.unpack_tile(np.array([key]))
        assert not mp.contains(int(tx[0]), int(ty[0]), result_outside=True)
    # and it is the exact smallest-hash subset of the free universe
    h = hash64(neg1, CFG.seed)
    txmin, tymin, txmax, tymax = tilemath.bbox_tiles(*CFG.bbox, CFG.z, CFG.scheme)
    # (spot: every sampled key lies within the canvas window)
    tx, ty, _ = tilemath.unpack_tile(neg1)
    assert (tx >= txmin).all() and (tx <= txmax).all()
    assert (ty >= tymin).all() and (ty <= tymax).all()


def test_end_to_end_labels_masks_roundtrip(ray_session, images_ds, feats, tmp_path, CFG):
    out = str(tmp_path / "labeled")
    ds, lineage = pipeline.run_label_job(images_ds, feats, CFG, out_dir=out)
    df = ds.to_pandas()
    assert len(df) > 0
    assert set(df["label"].unique()) <= {"lamp", "nolamp"}
    assert set(df["split"].unique()) <= {"train", "valid"}
    # per-row invariants (input_hint): caption survives, psnr gate, phash
    assert df["psnr_ok"].all()
    assert df["phash_ok"].all()
    for _, row in df.head(20).iterrows():
        assert row["caption"].startswith("tile at lat=")
        img = codecs.decode(row["bytes"], row["fmt"])
        assert img.shape == (256, 256, 3)
    # one image per tile after dedup
    assert df["tile_key"].is_unique
    # lineage: one record per partition, counts match
    assert lineage is not None
    assert (lineage.groupby("part_id").size() == 1).all()
    assert lineage["rows_out"].sum() == len(df)
    assert os.path.exists(os.path.join(out, "manifest.json"))

    # masks: positives must contain painted pixels from their features;
    # oracle cross-check one positive tile's lamp dot
    pos = df[df["label"] == "lamp"]
    assert len(pos) > 0
    checked = 0
    for _, row in pos.head(10).iterrows():
        mask = codecs.png_decode(row["mask"])
        assert mask.shape == (256, 256)
        if mask.any():
            checked += 1
    assert checked > 0

    # negatives: mask has no lamp-dot at tile granularity by
    # construction (tile was unpainted at 1px/tile)


def test_mask_attach_join_equals_broadcast(ray_session, images_ds, feats, CFG):
    a = pipeline.run_label_job(images_ds, feats, CFG, roundtrip=False)[0].to_pandas()
    b = pipeline.run_label_job(images_ds, feats, CFG, roundtrip=False, mask_attach="join")[0].to_pandas()
    cols = ["image_id", "tile_key", "label", "mask"]
    a = a[cols].sort_values("image_id").reset_index(drop=True)
    b = b[cols].sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)


def test_winner_tasks_path_equals_dataset_path(ray_session, images_ds, feats, fixture_dir, CFG):
    """Phase-1 plain-task regime (image_files given) is pinned
    byte-equal to the Ray Data winner scan, at both the winner-set and
    the end-to-end output level."""
    files = sorted(glob.glob(os.path.join(fixture_dir, "images", "*.parquet")))
    assign = pipeline.make_assign_tiles(CFG.z, CFG.scheme, CFG.edge)
    pos_feats, pos_keys = pipeline.positive_feature_tiles(feats, CFG)
    painted = pipeline.painted_tile_set(feats, CFG, extra=pos_feats)
    neg_keys = pipeline.sample_negative_tiles(painted, CFG)
    wk_a, wh_a = pipeline.winner_keys(images_ds, assign, pos_keys, neg_keys, CFG)
    wk_b, wh_b = pipeline.winner_keys_tasks(files, assign, pos_keys, neg_keys, CFG)
    np.testing.assert_array_equal(wk_a, wk_b)
    np.testing.assert_array_equal(wh_a, wh_b)

    a = pipeline.run_label_job(images_ds, feats, CFG, roundtrip=False, mask=False)[0].to_pandas()
    b = pipeline.run_label_job(
        images_ds, feats, CFG, roundtrip=False, mask=False, image_files=files
    )[0].to_pandas()
    cols = ["image_id", "tile_key", "label", "split", "part_id"]
    a = a[cols].sort_values("image_id").reset_index(drop=True)
    b = b[cols].sort_values("image_id").reset_index(drop=True)
    assert a.equals(b)


def test_resume_skips_completed(ray_session, images_ds, feats, tmp_path, CFG):
    out = str(tmp_path / "labeled2")
    ds1, lin1 = pipeline.run_label_job(images_ds, feats, CFG, out_dir=out, mask=False, roundtrip=False)
    df1 = ds1.to_pandas().sort_values("image_id").reset_index(drop=True)
    assert not lin1["skipped"].any()

    # delete one block of one partition, rerun: only that partition is
    # rewritten (part-granular resume; a partially-present part is
    # cleaned and fully rewritten)
    parts = sorted(lancelike.completed_parts(out))
    victim = parts[0]
    os.remove(lancelike.part_files(out, victim)[0])
    ds2, lin2 = pipeline.run_label_job(images_ds, feats, CFG, out_dir=out, mask=False, roundtrip=False)
    lin2 = lin2.set_index("part_id")
    assert not lin2.loc[victim, "skipped"]
    assert lin2.drop(index=victim)["skipped"].all()
    df2 = ds2.to_pandas().sort_values("image_id").reset_index(drop=True)
    # identical final table (checksums too)
    assert (
        lin1.set_index("part_id")["checksum"].sort_index() == lin2["checksum"].sort_index()
    ).all()
    assert df1[["image_id", "tile_key", "label"]].equals(df2[["image_id", "tile_key", "label"]])


def test_mask_oracle_parity_single_tile(ray_session, feats, CFG):
    """Rasterize one positive tile's mask via MaskStage and via the
    scalar oracle directly; byte-equal canvases."""
    import ray

    from osmray.stages import MaskStage

    _, pos_keys = pipeline.positive_feature_tiles(feats, CFG)
    key = pos_keys[0]
    tx, ty, z = (int(v[0]) for v in tilemath.unpack_tile(np.asarray([key])))
    mask_feats = feats
    stage = MaskStage(mask_feats, z=CFG.z, scheme=CFG.scheme)
    canvas = stage._mask_for_tile(tx, ty)

    # oracle: all features rasterized in tile-pixel space
    ref = [[0] * 256 for _ in range(256)]
    kinds = feats["kind"].to_pylist()
    glat = feats["geom_lat"].to_pylist()
    glng = feats["geom_lng"].to_pylist()
    scale = 1 << CFG.z
    for i in range(len(kinds)):
        pts = []
        for la, ln in zip(glat[i], glng[i]):
            wx, wy = oracle.project2web(la, ln)
            px = (wx + CFG.scheme.offsetx) * scale - tx * 256
            py = (wy + CFG.scheme.offsety) * scale - ty * 256
            pts.append((int(np.floor(px)), int(np.floor(py))))
        arr = np.array(pts)
        if (arr[:, 0].max() < -2 or arr[:, 0].min() > 258
                or arr[:, 1].max() < -2 or arr[:, 1].min() > 258):
            continue
        if kinds[i] == "node":
            oracle.draw_dot(ref, pts[0][0], pts[0][1], 1)
        elif kinds[i] == "way":
            oracle.draw_polyline(ref, pts, width=2, closed=True)
        elif kinds[i] == "polygon":
            oracle.draw_polyline(ref, pts, width=1, closed=True)
        elif kinds[i] == "exclusion":
            oracle.fill_poly(ref, pts)
    np.testing.assert_array_equal(canvas, np.asarray(ref, dtype=np.uint8))


def test_versioned_manifests_time_travel_and_vacuum(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    root = str(tmp_path / "vds")

    def ds_of(rows):
        return ray.data.from_arrow(pa.table({
            "part_id": pa.array([r[0] for r in rows], pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64())}))

    v1_rows = [(0, 10), (0, 11), (1, 20), (2, 30)]
    lancelike.write_dataset(ds_of(v1_rows), root, sort_key="k")
    assert lancelike.versions(root) == [1]

    # identical resume: all parts skipped, NO new version
    lancelike.write_dataset(ds_of(v1_rows), root, sort_key="k")
    assert lancelike.versions(root) == [1]

    # logically invalidate part 1 (drop its manifest entry — an
    # overwrite request) and rewrite it with different rows -> v2;
    # the old block stays on disk, pinned by version 1
    import json
    import os

    mpath = os.path.join(root, lancelike.MANIFEST)
    m = json.load(open(mpath))
    m["partitions"] = [r for r in m["partitions"] if r["part_id"] != 1]
    json.dump(m, open(mpath, "w"))
    v2_rows = [(0, 10), (0, 11), (1, 21), (1, 22), (2, 30)]
    lancelike.write_dataset(ds_of(v2_rows), root, sort_key="k")
    assert lancelike.versions(root) == [1, 2]

    latest = sorted(lancelike.read_dataset(root).to_pandas()["k"])
    assert latest == [10, 11, 21, 22, 30]
    old = sorted(lancelike.read_dataset(root, version=1).to_pandas()["k"])
    assert old == [10, 11, 20, 30]  # time travel sees the original part 1

    # vacuum keeps only the newest snapshot and deletes v1's orphan block
    res = lancelike.vacuum(root, keep_last=1)
    assert res["versions_dropped"] == 1 and res["blocks_deleted"] >= 1
    assert lancelike.versions(root) == [2]
    assert sorted(lancelike.read_dataset(root).to_pandas()["k"]) == latest
    with pytest.raises(FileNotFoundError):
        lancelike.read_dataset(root, version=1)


def test_read_json_and_csv_steps(ray_session, tmp_path):
    import json

    from osmray.pipelines.declarative import run_pipeline

    jp = tmp_path / "rows.jsonl"
    jp.write_text("\n".join(json.dumps({"a": i, "b": i * 2})
                            for i in range(10)) + "\n")
    out = run_pipeline([
        {"op": "read_json", "path": str(jp)},
        {"op": "filter", "column": "a", "cmp": ">=", "value": 5},
    ]).to_pandas()
    assert len(out) == 5 and (out["b"] == out["a"] * 2).all()

    cp = tmp_path / "rows.csv"
    cp.write_text("a,b\n" + "\n".join(f"{i},{i*3}" for i in range(8)) + "\n")
    out = run_pipeline([
        {"op": "read_csv", "path": str(cp)},
        {"op": "filter", "column": "a", "cmp": "<", "value": 3},
    ]).to_pandas()
    assert len(out) == 3 and (out["b"] == out["a"] * 3).all()


def test_compact_merges_fragments_and_time_travels(ray_session, tmp_path):
    """lancelike.compact: many fragments per part -> one, content and
    per-part checksums unchanged, old version still readable until
    vacuum, corruption refuses to commit."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    import ray.data

    from osmray import lancelike

    root = str(tmp_path / "ds")
    rng = np.random.default_rng(5)
    t = pa.table({
        "k": pa.array(np.arange(600, dtype=np.int64)),
        "part_id": pa.array(rng.integers(0, 4, 600).astype(np.int64)),
        "v": pa.array(rng.integers(0, 1000, 600).astype(np.int64))})
    ds = ray.data.from_arrow(t).repartition(6)
    lancelike.write_dataset(ds, root, sort_key="k", batch_rows=None)
    before = lancelike.read_dataset(root).to_pandas().sort_values("k")
    m1 = lancelike.read_manifest(root)
    assert sum(len(r["blocks"]) for r in m1["partitions"]) > 4  # fragmented

    ldf = lancelike.compact(root, sort_key="k")
    assert ldf["compacted"].any()
    m2 = lancelike.read_manifest(root)
    assert all(len(r["blocks"]) == 1 for r in m2["partitions"])
    # checksums invariant per part
    c1 = {r["part_id"]: r["checksum"] for r in m1["partitions"]}
    c2 = {r["part_id"]: r["checksum"] for r in m2["partitions"]}
    assert c1 == c2
    after = lancelike.read_dataset(root).to_pandas().sort_values("k")
    assert after.reset_index(drop=True).equals(before.reset_index(drop=True))
    # time travel: version 1 (pre-compaction) still readable
    vs = lancelike.versions(root)
    assert len(vs) == 2
    old = lancelike.read_dataset(root, version=vs[0]).to_pandas().sort_values("k")
    assert old.reset_index(drop=True).equals(before.reset_index(drop=True))
    # vacuum reclaims the old fragments; latest still reads
    rep = lancelike.vacuum(root, keep_last=1)
    assert rep["blocks_deleted"] > 0
    again = lancelike.read_dataset(root).to_pandas().sort_values("k")
    assert again.reset_index(drop=True).equals(before.reset_index(drop=True))

    # idempotence: a second compact commits nothing new
    lancelike.compact(root, sort_key="k")
    assert len(lancelike.versions(root)) == 1  # vacuumed to 1, unchanged

    # corruption: tamper one fragment in a fresh fragmented dataset
    root2 = str(tmp_path / "ds2")
    lancelike.write_dataset(ray.data.from_arrow(t).repartition(6), root2,
                            sort_key="k", batch_rows=None)
    m = lancelike.read_manifest(root2)
    rec = next(r for r in m["partitions"] if len(r["blocks"]) >= 2)
    victim = os.path.join(root2, f"part={rec['part_id']}", rec["blocks"][0])
    bad = pa.table({
        "k": pa.array([999_999], pa.int64()),
        "part_id": pa.array([int(rec["part_id"])], pa.int64()),
        "v": pa.array([0], pa.int64())})
    pq.write_table(bad, victim)  # same name, different content
    with pytest.raises(Exception, match="checksum|corrupt"):
        lancelike.compact(root2, sort_key="k")


def test_read_dataset_bulk_matches_default_read(ray_session, tmp_path):
    """The metadata-skipping bulk re-open must return exactly the
    rows/schema the default read_parquet would (it only skips footer
    prefetch, not data)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray import lancelike

    root = str(tmp_path / "ds")
    t = pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "part_id": pa.array((np.arange(100) % 3).astype(np.int64)),
        "s": pa.array([f"r{i}" for i in range(100)])})
    lancelike.write_dataset(ray.data.from_arrow(t).repartition(4), root,
                            sort_key="k", batch_rows=None)
    got = lancelike.read_dataset(root).to_pandas().sort_values("k").reset_index(drop=True)
    m = lancelike.read_manifest(root)
    frags = sorted(
        os.path.join(root, f"part={int(r['part_id'])}", b)
        for r in m["partitions"] for b in r["blocks"])
    want = (ray.data.read_parquet(frags).to_pandas()
            .sort_values("k").reset_index(drop=True))
    # the default reader invents a hive "part" column from the
    # part=<id> directory names; the bulk path does not (part_id is a
    # real column — the invented one was never part of the contract)
    want = want.drop(columns=["part"])
    assert got.equals(want)
    # column projection works through the bulk path too
    sub = lancelike.read_dataset(root, columns=["k"]).to_pandas()
    assert list(sub.columns) == ["k"] and len(sub) == 100
