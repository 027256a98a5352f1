import glob
import json
import os

import numpy as np

from osmray import synth


def test_cli_label_and_resume(ray_session, fixture_dir, tmp_path, capsys):
    from osmray.__main__ import main

    bbox = ",".join(str(v) for v in synth.fixture_bbox(fixture_dir))
    out = str(tmp_path / "cli_out")
    args = [
        "label",
        "--images", os.path.join(fixture_dir, "images", "*.parquet"),
        "--features", os.path.join(fixture_dir, "features.parquet"),
        "--bbox", bbox,
        "--limit", "40",
        "--out", out,
    ]
    assert main(args) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["rows_out"] > 0 and s1["skipped"] == 0
    # resume: everything skipped, same rows
    assert main(args) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["skipped"] == s2["partitions"] and s2["rows_out"] == s1["rows_out"]


def test_cli_bad_glob(ray_session, capsys):
    from osmray.__main__ import main

    rc = main(
        ["label", "--images", "/nope/*.parquet", "--features", "/x", "--bbox",
         "0,0,1,1", "--out", "/tmp/never"]
    )
    assert rc == 2


def test_declarative_pipeline_equals_direct(ray_session, fixture_dir, tmp_path):
    """A JSON step spec must produce exactly what the direct chained
    calls produce (the §2.10 user-extension surface)."""
    import json
    import os

    import ray.data

    from osmray.pipelines import run_pipeline
    from osmray.stages import make_assign_tiles
    from osmray.tilemath import PLAIN

    pat = os.path.join(fixture_dir, "images", "*.parquet")
    steps = [
        {"op": "read_parquet", "path": pat, "columns": ["image_id", "lat", "lng"]},
        {"op": "assign_tiles", "z": 19, "provider": "plain"},
        {"op": "edge_filter", "edge": 16},
        {"op": "add_cell", "z": 19, "res": 8, "as": "cell8"},
        {"op": "groupby_agg", "key": "cell8",
         "aggs": [{"fn": "count", "as": "n"}]},
        {"op": "sort", "keys": "cell8"},
    ]
    got = run_pipeline(steps).to_pandas()

    # direct twin
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from osmray import cells as cellmod

    ds = ray.data.read_parquet(sorted(glob.glob(pat)), columns=["image_id", "lat", "lng"])
    ds = ds.map_batches(make_assign_tiles(19, PLAIN, 16), batch_format="pyarrow")

    def edge(b):
        ok = pc.and_(
            pc.and_(pc.greater_equal(b["rx"], 16), pc.less(b["rx"], 240)),
            pc.and_(pc.greater_equal(b["ry"], 16), pc.less(b["ry"], 240)),
        )
        return b.filter(ok)

    def cell(b):
        c = cellmod.cell_of_tile(
            b["tx"].to_numpy(zero_copy_only=False),
            b["ty"].to_numpy(zero_copy_only=False), 19, 8,
        )
        return b.append_column("cell8", pa.array(c.astype(np.int64)))

    from ray.data.aggregate import Count

    want = (
        ds.map_batches(edge, batch_format="pyarrow")
        .map_batches(cell, batch_format="pyarrow")
        .groupby("cell8").aggregate(Count(alias_name="n"))
        .sort("cell8").to_pandas()
    )
    assert got.equals(want)

    # spec roundtrips through JSON (ships as config)
    spec_file = tmp_path / "job.json"
    spec_file.write_text(json.dumps(steps))
    again = run_pipeline(json.loads(spec_file.read_text())).to_pandas()
    assert again.equals(want)


def test_declarative_text_dedup_steps(ray_session):
    """The text/dedup stage specs equal the direct kernel calls."""
    import numpy as np

    from osmray import dedup, text
    from osmray.pipelines import run_pipeline

    out = run_pipeline(
        [
            {"op": "read_parquet", "path": "/root/testdata/sf0.001/documents.parquet",
             "columns": ["doc_id", "text"]},
            {"op": "quality_stats"},
            {"op": "simhash"},
            {"op": "fingerprint"},
        ]
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    texts = out["text"].tolist()
    assert (out["simhash"].to_numpy() == dedup.simhash64_batch(texts)).all()
    assert (out["fingerprint"].to_numpy() == text.rolling_fingerprint(texts)).all()
    assert (out["n_tokens"].to_numpy() == text.ws_token_count(texts)).all()

    pairs = run_pipeline(
        [
            {"op": "read_parquet", "path": "/root/testdata/sf0.001/documents.parquet",
             "columns": ["doc_id", "text"]},
            {"op": "simhash"},
            {"op": "hamming_pairs", "max_hamming": 4},
        ]
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want = (
        dedup.simhash_hamming_pairs(
            run_pipeline([{"op": "read_parquet",
                           "path": "/root/testdata/sf0.001/documents.parquet",
                           "columns": ["doc_id", "text"]}]),
            max_hamming=4,
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert pairs[["a", "b", "hamming"]].to_numpy().tolist() == want[
        ["a", "b", "hamming"]
    ].to_numpy().tolist()


def test_declarative_asof_and_hll_steps(ray_session):
    from osmray.pipelines import run_pipeline

    out = run_pipeline(
        [
            {"op": "read_parquet", "path": "/root/testdata/sf0.001/events.parquet",
             "columns": ["event_id", "ts", "user_id", "event_type"]},
            {"op": "filter", "column": "event_type", "cmp": "!=", "value": "purchase"},
            {"op": "asof_join", "right_path": "/root/testdata/sf0.001/events.parquet",
             "right_columns": ["event_id", "ts", "user_id"],
             "left_cols": ["event_id"], "right_cols": ["event_id"]},
        ]
    ).to_pandas()
    assert len(out) > 0 and {"event_id", "state_event_id", "gap_us"} <= set(out.columns)
    assert (out["gap_us"] >= 0).all()

    regs = run_pipeline(
        [
            {"op": "read_parquet", "path": "/root/testdata/sf0.001/events.parquet",
             "columns": ["event_type", "user_id"]},
            {"op": "hll", "group_col": "event_type", "value_col": "user_id"},
        ]
    ).to_pandas()
    assert {"event_type", "bucket", "rho_max"} <= set(regs.columns)
    assert regs["rho_max"].min() >= 1


def test_declarative_media_steps(ray_session):
    from osmray import codecs, oraclefix
    from osmray.pipelines import run_pipeline

    root = oraclefix.write_phash()
    out = run_pipeline(
        [
            {"op": "read_parquet", "path": root + "/part-*.parquet",
             "columns": ["image_id", "bytes", "fmt", "idx", "phash"]},
            {"op": "limit", "n": 32},
            {"op": "image_resize", "h": 64, "w": 64},
        ]
    ).to_pandas()
    assert len(out) == 32 and (out["w"] == 64).all() and (out["h"] == 64).all()
    assert "idx" in out.columns  # passthrough
    # resized phash still reads the planted pattern
    row = out.iloc[0]
    got = int(np.uint64(np.int64(codecs.phash(codecs.png_decode(row["bytes"])))))
    assert got == oraclefix.ph_pattern(int(row["idx"]))

    aug = run_pipeline(
        [
            {"op": "read_parquet", "path": root + "/part-*.parquet",
             "columns": ["image_id", "bytes", "fmt", "idx"]},
            {"op": "limit", "n": 8},
            {"op": "augment", "aug": "hflip"},
        ]
    ).to_pandas()
    assert (aug["aug"] == "hflip").all() and "idx" in aug.columns


def test_new_declarative_steps_registered():
    from osmray.pipelines.declarative import STAGES

    for op in ("box_iou_join", "box_nms", "hex_agg", "hist_eq"):
        assert op in STAGES
        stage = STAGES[op]({"op": op, "right_path": "/tmp/x", "x": "x",
                            "y": "y"})
        assert callable(stage)


def test_declarative_image_chain_composes(ray_session):
    """Composition check for the image-op steps: a declarative
    hist_eq -> rle_mask chain must emit the same RLE observables as
    the direct stage over the RAW images — hist-eq's remap is
    monotone around the threshold (40 -> 0, 200 -> 255, degenerate
    single-level images pass through), so the mask is invariant."""
    from osmray import oraclefix
    from osmray.multimodal import RleMaskStage
    from osmray.pipelines import run_pipeline

    oraclefix.write_phash()
    steps = [
        {"op": "read_parquet", "path": "/tmp/osmray_phash_fx/part-*.parquet",
         "columns": ["image_id", "bytes", "fmt", "w", "h", "idx"]},
        {"op": "hist_eq", "concurrency": 1},
        {"op": "rle_mask", "concurrency": 1},
    ]
    got = (run_pipeline(steps).to_pandas()
           .sort_values("idx").reset_index(drop=True))
    want = (oraclefix.load_phash()
            .map_batches(lambda b: b.select(["image_id", "bytes", "fmt",
                                             "idx"]),
                         batch_format="pyarrow")
            .map_batches(RleMaskStage, batch_format="pyarrow", concurrency=1)
            .to_pandas().sort_values("idx").reset_index(drop=True))
    assert got["roundtrip_ok"].all()
    for col in ("n_fg_runs", "fg_area", "first_fg"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_declarative_session8_steps(ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from osmray.pipelines.declarative import run_pipeline

    rng = np.random.RandomState(5)
    t = pa.table({"u": pa.array(rng.randint(0, 40, 200), pa.int64()),
                  "v": pa.array(rng.randint(0, 40, 200), pa.int64()),
                  "w": pa.array(rng.randint(0, 30, 200), pa.int64()),
                  "eid": pa.array(np.arange(200), pa.int64())})
    pq.write_table(t, "/tmp/d8_edges.parquet")
    mst = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/d8_edges.parquet"},
        {"op": "mst"},
    ]).to_pandas()
    # forest: fewer edges than nodes, no duplicate eids
    assert 0 < len(mst) < 40
    assert mst["eid"].is_unique

    ev = pa.table({"g": pa.array([1] * 8 + [2] * 6, pa.int64()),
                   "t": pa.array(list(range(8)) + list(range(6)), pa.int64()),
                   "x": pa.array([5, 9, 1, 7, 3, 8, 2, 6, 4, 4, 4, 9, 9, 9],
                                 pa.int64())})
    pq.write_table(ev, "/tmp/d8_ev.parquet")
    mm = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/d8_ev.parquet"},
        {"op": "moving_median", "group": "g", "order": ["t"], "value": "x",
         "width": 3},
    ]).to_pandas().sort_values(["g", "t"]).reset_index(drop=True)
    g1 = mm[mm["g"] == 1]["m2"].tolist()
    # brute trailing-3 medians of [5,9,1,7,3,8,2,6] doubled
    exp = []
    xs = [5, 9, 1, 7, 3, 8, 2, 6]
    for i in range(len(xs)):
        w = sorted(xs[max(0, i - 2):i + 1])
        exp.append(2 * w[len(w) // 2] if len(w) % 2 else w[0] + w[1])
    assert g1 == exp


def test_declarative_round4_steps(ray_session, tmp_path):
    """Round-4 step wave (spatial joins, sketches, order-stats): each
    spec equals the direct kernel call on the same inputs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from osmray import joins, sketch, tableops
    from osmray.pipelines import run_pipeline

    rng = np.random.RandomState(11)

    def rp(name: str, t: pa.Table) -> str:
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(t, path)
        return path

    def norm(df, by):
        return df.sort_values(by).reset_index(drop=True)

    # --- order_stats / grouped_order_stats
    vals = pa.table({"k": pa.array(rng.randint(0, 5, 500), pa.int64()),
                     "x": pa.array(rng.randint(0, 10_000, 500), pa.int64())})
    vp = rp("vals", vals)
    got = run_pipeline([{"op": "read_parquet", "path": vp},
                        {"op": "order_stats", "col": "x",
                         "percents": [50, 90, 99]}]).to_pandas()
    want = tableops.exact_order_stats(
        ray.data.read_parquet(vp), "x", [50, 90, 99]).to_pandas()
    assert norm(got, list(got.columns)).equals(norm(want, list(got.columns)))

    gg = run_pipeline([{"op": "read_parquet", "path": vp},
                       {"op": "grouped_order_stats", "key": "k", "col": "x",
                        "percents": [50]}]).to_pandas()
    gw = tableops.grouped_order_stats(
        ray.data.read_parquet(vp), "k", "x", [50]).to_pandas()
    assert norm(gg, list(gg.columns)).equals(norm(gw, list(gg.columns)))

    # --- kmv / count_min
    got = run_pipeline([{"op": "read_parquet", "path": vp},
                        {"op": "kmv", "col": "x", "k": 64}]).to_pandas()
    want = sketch.kmv_bottom_k(
        ray.data.read_parquet(vp), "x", k=64).to_pandas()
    assert norm(got, ["rank"]).equals(norm(want, ["rank"]))

    got = run_pipeline([{"op": "read_parquet", "path": vp},
                        {"op": "count_min", "col": "x", "depth": 2,
                         "width": 128}]).to_pandas()
    want = sketch.count_min(
        ray.data.read_parquet(vp), "x", depth=2, width=128).to_pandas()
    assert norm(got, ["d", "col"]).equals(norm(want, ["d", "col"]))

    # --- skew_join / bloom_semi_join
    left = pa.table({"k": pa.array(np.concatenate(
        [np.zeros(150, np.int64), rng.randint(1, 30, 100)])),
        "lv": pa.array(np.arange(250), pa.int64())})
    right = pa.table({"k": pa.array(np.arange(0, 30), pa.int64()),
                      "rv": pa.array(np.arange(0, 30) * 7, pa.int64())})
    lp, rpth = rp("l", left), rp("r", right)
    got = run_pipeline([{"op": "read_parquet", "path": lp},
                        {"op": "skew_join", "right_path": rpth, "on": "k",
                         "hot_threshold": 50}]).to_pandas()
    want = joins.bucketed_join(ray.data.read_parquet(lp),
                               ray.data.read_parquet(rpth), on="k").to_pandas()
    cols = sorted(got.columns)
    assert norm(got[cols], cols).equals(norm(want[cols], cols))

    got = run_pipeline([{"op": "read_parquet", "path": lp},
                        {"op": "bloom_semi_join", "right_path": rpth,
                         "on": "k"}]).to_pandas()
    want = joins.bucketed_join(ray.data.read_parquet(lp),
                               ray.data.read_parquet(rpth), on="k",
                               how="semi").to_pandas()
    cols = sorted(got.columns)
    assert norm(got[cols], cols).equals(norm(want[cols], cols))

    # --- pip_cell_join: rectangles as rings
    pts = pa.table({"qid": pa.array(np.arange(80), pa.int64()),
                    "px": pa.array(rng.uniform(0, 100, 80)),
                    "py": pa.array(rng.uniform(0, 100, 80))})
    x0 = rng.uniform(0, 80, 12); y0 = rng.uniform(0, 80, 12)
    w = rng.uniform(5, 20, 12); h = rng.uniform(5, 20, 12)
    polys = pa.table({
        "pid": pa.array(np.arange(12), pa.int64()),
        "xs": pa.array([[a, a + b, a + b, a] for a, b in zip(x0, w)],
                       pa.list_(pa.float64())),
        "ys": pa.array([[c, c, c + d, c + d] for c, d in zip(y0, h)],
                       pa.list_(pa.float64()))})
    pp, gp = rp("pts", pts), rp("polys", polys)
    got = run_pipeline([{"op": "read_parquet", "path": pp},
                        {"op": "pip_cell_join", "polys_path": gp,
                         "cell_shift": 5}]).to_pandas()
    want = joins.pip_cell_join(ray.data.read_parquet(pp),
                               ray.data.read_parquet(gp),
                               cell_shift=5).to_pandas()
    assert norm(got, ["qid", "pid"]).equals(norm(want, ["qid", "pid"]))
    assert len(got) > 0

    # --- segment_intersection_join
    seg_a = pa.table({"id": pa.array(np.arange(40), pa.int64()),
                      "x1": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "y1": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "x2": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "y2": pa.array(rng.randint(0, 500, 40), pa.int64())})
    seg_b = pa.table({"id": pa.array(np.arange(40), pa.int64()),
                      "x1": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "y1": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "x2": pa.array(rng.randint(0, 500, 40), pa.int64()),
                      "y2": pa.array(rng.randint(0, 500, 40), pa.int64())})
    sa, sb = rp("sa", seg_a), rp("sb", seg_b)
    got = run_pipeline([{"op": "read_parquet", "path": sa},
                        {"op": "segment_intersection_join",
                         "right_path": sb}]).to_pandas()
    want = joins.segment_intersection_join(
        ray.data.read_parquet(sa), ray.data.read_parquet(sb)).to_pandas()
    assert norm(got, ["a_id", "b_id"]).equals(norm(want, ["a_id", "b_id"]))
    assert len(got) > 0


def test_declarative_terrain_steps(ray_session, tmp_path):
    """terrain / d8_flow / watershed steps equal the direct kernel
    calls; watershed sinks are reachable fixed points (every cell's
    sink exists and is itself a sink)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from osmray import terrain
    from osmray.pipelines import run_pipeline

    rng = np.random.RandomState(5)
    pts = pa.table({
        "cx": pa.array(rng.randint(0, 40, 4000), pa.int64()),
        "cy": pa.array(rng.randint(0, 40, 4000), pa.int64()),
        "v": pa.array(rng.randint(0, 100, 4000), pa.int64())})
    path = str(tmp_path / "dem.parquet")
    pq.write_table(pts, path)

    def norm(df):
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    got = run_pipeline([{"op": "read_parquet", "path": path},
                        {"op": "terrain", "x": "cx", "y": "cy",
                         "v": "v"}]).to_pandas()
    want = terrain.horn_gradient(terrain.elevation_partials(
        ray.data.read_parquet(path), "cx", "cy", "v")).to_pandas()
    assert norm(got).equals(norm(want))

    rg = run_pipeline([{"op": "read_parquet", "path": path},
                       {"op": "ruggedness", "x": "cx", "y": "cy",
                        "v": "v"}]).to_pandas()
    rw = terrain.ruggedness(terrain.elevation_partials(
        ray.data.read_parquet(path), "cx", "cy", "v")).to_pandas()
    assert norm(rg).equals(norm(rw))

    flow = run_pipeline([{"op": "read_parquet", "path": path},
                         {"op": "d8_flow", "x": "cx", "y": "cy",
                          "v": "v"}]).to_pandas()
    ws = run_pipeline([{"op": "read_parquet", "path": path},
                       {"op": "watershed", "x": "cx", "y": "cy",
                        "v": "v"}]).to_pandas()
    assert len(flow) == len(ws)  # every existing cell labeled once
    sinks = {(r.cx, r.cy) for r in flow.itertuples() if r.flow_dir == -1}
    assert sinks  # a finite strictly-descending flow always has sinks
    assert {(r.sink_cx, r.sink_cy) for r in ws.itertuples()} <= sinks
    # sinks label themselves
    own = ws[(ws.cx == ws.sink_cx) & (ws.cy == ws.sink_cy)]
    assert len(own) == len(sinks)


def test_sobel_nms_stage_vs_brute(ray_session):
    """SobelNmsStage equals a per-image brute-force numpy reference
    on random piecewise-constant images (block_px=8, 5x6 grid)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray import codecs
    from osmray.multimodal import SobelNmsStage

    rng = np.random.RandomState(9)
    rows = []
    mats = {}
    for i in range(6):
        grid = rng.randint(0, 256, (5, 6)).astype(np.int64)
        img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        img3 = np.stack([img, img, img], axis=2).astype(np.uint8)
        rows.append({"idx": i, "bytes": codecs.png_encode(img3, level=1)})
        mats[i] = grid
    ds = ray.data.from_items(rows)
    got = ds.map_batches(
        SobelNmsStage, fn_constructor_kwargs={"block_px": 8},
        batch_format="pyarrow", concurrency=2, num_cpus=1).to_pandas()

    exp_rows = []
    for i, bm in mats.items():
        gh, gw = bm.shape
        gx = np.zeros_like(bm)
        gy = np.zeros_like(bm)
        for r in range(1, gh - 1):
            for c in range(1, gw - 1):
                gx[r, c] = (bm[r - 1, c + 1] + 2 * bm[r, c + 1]
                            + bm[r + 1, c + 1] - bm[r - 1, c - 1]
                            - 2 * bm[r, c - 1] - bm[r + 1, c - 1])
                gy[r, c] = (bm[r + 1, c - 1] + 2 * bm[r + 1, c]
                            + bm[r + 1, c + 1] - bm[r - 1, c - 1]
                            - 2 * bm[r - 1, c] - bm[r - 1, c + 1])
        m2 = gx * gx + gy * gy
        for r in range(1, gh - 1):
            for c in range(1, gw - 1):
                if m2[r, c] == 0:
                    continue
                ax, ay = abs(gx[r, c]), abs(gy[r, c])
                if ax >= 2 * ay:
                    dy1, dx1 = 0, 1
                elif ay >= 2 * ax:
                    dy1, dx1 = 1, 0
                elif gx[r, c] * gy[r, c] > 0:
                    dy1, dx1 = 1, 1
                else:
                    dy1, dx1 = 1, -1
                if (m2[r, c] >= m2[r + dy1, c + dx1]
                        and m2[r, c] >= m2[r - dy1, c - dx1]):
                    exp_rows.append((i, r, c, gx[r, c], gy[r, c], m2[r, c]))
    exp = sorted(exp_rows)
    gotl = sorted(zip(got["idx"], got["rb"], got["cb"],
                      got["gx"], got["gy"], got["m2"]))
    assert gotl == exp


def test_flow_accumulation_engines_agree(ray_session):
    """flow_accumulation broadcast == shuffle on a random DEM, and
    accum sums to total path length + n (every cell contributes one
    count per path node)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray import terrain

    rng = np.random.RandomState(13)
    pts = pa.table({
        "cx": pa.array(rng.randint(0, 10, 600), pa.int64()),
        "cy": pa.array(rng.randint(0, 10, 600), pa.int64()),
        "v": pa.array(rng.randint(0, 50, 600), pa.int64())})
    codes = terrain.d8_codes(terrain.elevation_partials(
        ray.data.from_arrow(pts).repartition(4), "cx", "cy", "v"))
    a = (terrain.flow_accumulation(codes, mode="broadcast")
         .to_pandas().sort_values("cell").reset_index(drop=True))
    b = (terrain.flow_accumulation(codes, mode="shuffle")
         .to_pandas().sort_values("cell").reset_index(drop=True))
    assert a.equals(b)
    assert (a["accum"] >= 1).all()

    # the declarative step equals the direct kernel composition
    import pyarrow.parquet as pq
    from osmray.pipelines import run_pipeline
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(pts, os.path.join(d, "dem.parquet"))
    got = (run_pipeline([
        {"op": "read_parquet", "path": os.path.join(d, "dem.parquet")},
        {"op": "flow_accum", "x": "cx", "y": "cy", "v": "v"}])
        .to_pandas().sort_values(["cx", "cy"]).reset_index(drop=True))
    from osmray import terrain as T
    import numpy as _np
    cells = a["cell"].to_numpy()
    cx, cy = T.unpack(cells)
    want = (a.assign(cx=cx, cy=cy)[["cx", "cy", "accum"]]
            .sort_values(["cx", "cy"]).reset_index(drop=True))
    assert got.equals(want)


def test_declarative_curation_graph_steps(ray_session):
    """gopher_rules / boilerplate / cdc_chunks / label_prop steps
    equal their direct kernel calls."""
    import ray.data

    from osmray import dedup, text
    from osmray.graph import label_propagation
    from osmray.pipelines import run_pipeline

    doc_steps = [{"op": "read_parquet",
                  "path": "/root/testdata/sf0.001/documents.parquet",
                  "columns": ["doc_id", "text"]}]
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])

    for extra, direct in [
        ([{"op": "gopher_rules"}], text.gopher_repetition(docs)),
        ([{"op": "boilerplate", "n": 3, "min_docs": 2}],
         text.boilerplate_coverage(docs, n=3, min_docs=2)),
        ([{"op": "cdc_chunks"}], dedup.cdc_chunk_dups(docs)),
    ]:
        got = (run_pipeline(doc_steps + extra)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        want = (direct.to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        assert got.equals(want)

    edges = ray.data.from_items(
        [{"u": i % 7, "v": (i * 3 + 1) % 7} for i in range(30)])
    got = (run_pipeline([{"op": "label_prop", "rounds": 2}], ds=edges)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = (label_propagation(edges, rounds=2)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert got.equals(want)


def test_declarative_graph_score_steps(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.pipelines import run_pipeline
    from osmray.queries import hits_scores, ppr_mass

    rng = np.random.default_rng(23)
    u = rng.integers(0, 30, 200).astype(np.int64)
    v = rng.integers(0, 30, 200).astype(np.int64)
    pk = (u[u != v] * 65536 + v[u != v])
    ds = ray.data.from_arrow(pa.table({"pk": pa.array(pk)})).repartition(3)

    got = (run_pipeline([{"op": "hits"}], ds=ds)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = (hits_scores(ds).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert got.equals(want)

    got = (run_pipeline([{"op": "ppr", "rounds": 3, "seed_mod": 7}], ds=ds)
           .to_pandas().sort_values("node").reset_index(drop=True))
    want = (ppr_mass(ds, rounds=3, seed_mod=7).to_pandas()
            .sort_values("node").reset_index(drop=True))
    assert got.equals(want)

    got = run_pipeline([{"op": "assortativity"}], ds=ds).to_pandas()
    assert list(got.columns) == ["m", "sx", "sxx", "sxy"]


def test_declarative_stream_steps(ray_session):
    import ray.data

    from osmray.pipelines import run_pipeline
    from osmray.windows import (cusum_alarms, geofence_transitions,
                                stay_points)

    base = [{"op": "read_parquet",
             "path": "/root/testdata/sf0.001/events.parquet"}]
    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")

    for extra, direct in [
        ([{"op": "cusum"}], cusum_alarms(ds)),
        ([{"op": "stay_points"}], stay_points(ds)),
        ([{"op": "geofence", "box": 12}],
         geofence_transitions(ds, box=12)),
    ]:
        got = (run_pipeline(base + extra)
               .to_pandas().sort_values("user_id").reset_index(drop=True))
        want = (direct.to_pandas()
                .sort_values("user_id").reset_index(drop=True))
        assert got.equals(want)


def test_curation_pipeline_composes(ray_session):
    """A full text-curation pipeline as ONE declarative spec:
    read -> quality stats -> length gate -> repetition scoring (and
    the dedup branch of the same prefix). Each hop's schema feeds
    the next; the end-to-end result equals running the final kernel
    on the gated subset."""
    import ray.data

    from osmray import text
    from osmray.pipelines import run_pipeline

    base = [
        {"op": "read_parquet",
         "path": "/root/testdata/sf0.001/documents.parquet",
         "columns": ["doc_id", "text"]},
        {"op": "quality_stats"},
        {"op": "filter", "column": "n_tokens", "cmp": ">=", "value": 10},
    ]
    gated = (run_pipeline(base)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (gated["n_tokens"] >= 10).all() and len(gated) > 0

    scored = (run_pipeline(base + [{"op": "gopher_rules"}])
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert set(scored["doc_id"]) == set(gated["doc_id"])
    direct = (text.gopher_repetition(
        ray.data.from_pandas(gated[["doc_id", "text"]]))
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert scored.equals(direct)

    deduped = (run_pipeline(base + [{"op": "exact_dedup"}])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert deduped["doc_id"].is_unique
    assert set(deduped["doc_id"]) <= set(gated["doc_id"])
    assert (deduped["n_dups"] >= 1).all()

    # determinism: the whole spec replays identically
    again = (run_pipeline(base + [{"op": "gopher_rules"}])
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert scored.equals(again)


def test_declarative_mutual_nn_step(ray_session):
    import ray.data

    from osmray.ann import mutual_nn
    from osmray.pipelines import run_pipeline

    got = (run_pipeline([
        {"op": "read_parquet",
         "path": "/root/testdata/sf0.001/embeddings.parquet",
         "columns": ["vec_id", "embedding"]},
        {"op": "mutual_nn"},
    ]).to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    want = (mutual_nn(ds).to_pandas()
            .sort_values(["a", "b"]).reset_index(drop=True))
    assert got.equals(want) and len(got) > 0
    # mutual-NN is symmetric by construction: no id repeats side-swapped
    assert (got["a"] < got["b"]).all()


def test_declarative_round5_analytics_steps(ray_session):
    """r4 verdict #5: step parity for the analytics tail — profile /
    assoc_rules / substring_dups / link_predict / containment_join
    steps equal their direct kernel calls."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.pipelines import run_pipeline
    from osmray.queries import link_predict_topk
    from osmray.simjoin import containment_join
    from osmray.tableops import assoc_rules, profile_columns
    from osmray.text import substring_dups

    li = [{"op": "read_parquet",
           "path": "/root/testdata/sf0.001/lineitem.parquet",
           "columns": ["l_orderkey", "l_partkey"]}]
    li_ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_partkey"])

    got = (run_pipeline(li + [{"op": "profile",
                               "columns": ["l_orderkey", "l_partkey"]}])
           .to_pandas().sort_values("col_name").reset_index(drop=True))
    want = (profile_columns(li_ds, ["l_orderkey", "l_partkey"])
            .to_pandas().sort_values("col_name").reset_index(drop=True))
    assert got.equals(want) and len(got) == 2

    key = ["lhs", "rhs"]
    got = (run_pipeline(li + [{"op": "assoc_rules", "key": "l_orderkey",
                               "item": "l_partkey"}])
           .to_pandas().sort_values(key).reset_index(drop=True))
    want = (assoc_rules(li_ds, "l_orderkey", "l_partkey")
            .to_pandas().sort_values(key).reset_index(drop=True))
    assert got.equals(want)

    docs = [{"op": "read_parquet",
             "path": "/root/testdata/sf0.001/documents.parquet",
             "columns": ["doc_id", "text"]}]
    docs_ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])
    got = (run_pipeline(docs + [{"op": "substring_dups"}])
           .to_pandas().sort_values("gram").reset_index(drop=True))
    want = (substring_dups(docs_ds)
            .to_pandas().sort_values("gram").reset_index(drop=True))
    assert got.equals(want)

    edges = ray.data.from_items(
        [{"u": i % 9, "v": (i * 5 + 2) % 9} for i in range(40)
         if i % 9 != (i * 5 + 2) % 9])
    got = (run_pipeline([{"op": "link_predict", "k": 10}], ds=edges)
           .to_pandas().reset_index(drop=True))

    def sym(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"via": pa.array(np.concatenate((u, v))),
                         "nb": pa.array(np.concatenate((v, u)))})

    want = (link_predict_topk(edges.map_batches(sym, batch_format="pyarrow"),
                              k=10).to_pandas().reset_index(drop=True))
    assert got.equals(want)

    toks = ray.data.from_items([
        {"doc_id": 1, "toks": ["a", "b", "c", "d", "e"]},
        {"doc_id": 2, "toks": ["a", "b", "c", "d"]},  # contained in 1
        {"doc_id": 3, "toks": ["x", "y"]}])
    got = (run_pipeline([{"op": "containment_join"}], ds=toks)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = (containment_join(toks, "doc_id", "toks", t_num=4, t_den=5)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    assert got.equals(want) and len(got) >= 1
