"""bag_set_ops / cube_agg (tableops round-3 additions): DuckDB-checked
on randomized multi-block data + parallelism independence."""

import duckdb
import numpy as np
import pandas as pd

from osmray.tableops import bag_set_ops, cube_agg


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_bag_set_ops_vs_duckdb(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    a = pd.DataFrame({"k": rng.integers(0, 40, 2000).astype(np.int64)})
    b = pd.DataFrame({"k": rng.integers(10, 60, 1500).astype(np.int64)})
    got = _sorted(bag_set_ops(
        ray.data.from_pandas(a).repartition(7),
        ray.data.from_pandas(b).repartition(3), "k").to_pandas())
    want = duckdb.sql("""
        WITH i AS (SELECT k, count(*) n_int FROM
                   (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k),
             x AS (SELECT k, count(*) n_exc FROM
                   (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k),
             ka AS (SELECT DISTINCT k FROM a)
        SELECT ka.k, COALESCE(i.n_int, 0) n_int, COALESCE(x.n_exc, 0) n_exc
        FROM ka LEFT JOIN i ON ka.k=i.k LEFT JOIN x ON ka.k=x.k""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_cube_agg_vs_duckdb(ray_session):
    import ray.data

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "f": rng.choice(["A", "N", "R"], 3000),
        "s": rng.choice(["F", "O"], 3000),
        "v": rng.integers(-5, 100, 3000).astype(np.int64)})
    outs = []
    for parts in (2, 17):
        ds = ray.data.from_pandas(df).repartition(parts)
        outs.append(_sorted(cube_agg(ds, "f", "s", "v").to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = duckdb.sql("""
        SELECT COALESCE(f,'ALL') f, COALESCE(s,'ALL') s,
               count(*) n, sum(v) val_sum
        FROM df GROUP BY CUBE(f, s)""").df()
    pd.testing.assert_frame_equal(outs[0], _sorted(want), check_dtype=False)


def test_bfs_hops_vs_brute(ray_session):
    import ray.data

    from osmray.graph import bfs_hops

    rng = np.random.default_rng(17)
    m = 400
    e = pd.DataFrame({"u": rng.integers(0, 120, m).astype(np.int64),
                      "v": rng.integers(0, 120, m).astype(np.int64)})
    seeds = pd.DataFrame({"node": np.array([3, 77], dtype=np.int64)})
    got = _sorted(bfs_hops(
        ray.data.from_pandas(e).repartition(5),
        ray.data.from_pandas(seeds), max_hops=3).to_pandas())

    # brute python BFS
    adj = {}
    for u, v in e.itertuples(index=False):
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    dist = {3: 0, 77: 0}
    frontier = [3, 77]
    for h in range(1, 4):
        nxt = []
        for n in frontier:
            for w in adj.get(n, ()):
                if w not in dist:
                    dist[w] = h
                    nxt.append(w)
        frontier = nxt
    want = _sorted(pd.DataFrame(
        {"node": list(dist), "hop": list(dist.values())}).astype(np.int64))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_declarative_round3_steps(ray_session):
    import ray.data

    from osmray.pipelines.declarative import run_pipeline

    rng = np.random.default_rng(43)
    df = pd.DataFrame({
        "event_id": np.arange(300, dtype=np.int64),
        "etype": rng.choice(["a", "b"], 300),
        "cents": rng.integers(0, 500, 300).astype(np.int64)})
    ds = ray.data.from_pandas(df).repartition(3)
    out = run_pipeline(
        [{"op": "ntile", "key": "etype", "order": "cents",
          "id": "event_id", "n": 3}], ds)
    assert out.count() == 300 and set(out.to_pandas()["tile"]) == {1, 2, 3}

    df2 = pd.DataFrame({"f": rng.choice(["x", "y"], 200),
                        "s": rng.choice(["p", "q"], 200),
                        "v": rng.integers(0, 9, 200).astype(np.int64)})
    out2 = run_pipeline([{"op": "cube", "c1": "f", "c2": "s", "val": "v"}],
                        ray.data.from_pandas(df2))
    got = out2.to_pandas()
    assert len(got) == 9  # 2x2 + 2 + 2 + 1
    assert got[(got.f == "ALL") & (got.s == "ALL")]["n"].iloc[0] == 200

    out3 = run_pipeline(
        [{"op": "edit1_join", "col": "s"}],
        ray.data.from_pandas(pd.DataFrame(
            {"s": ["cat", "cut", "dog", "dogs", "cat"]})))
    got3 = out3.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert got3.values.tolist() == [["cat", "cut"], ["dog", "dogs"]]


def test_cooccur_pairs_vs_duckdb(ray_session):
    import ray.data

    from osmray.tableops import cooccur_pairs

    rng = np.random.default_rng(47)
    df = pd.DataFrame({
        "k": rng.integers(0, 150, 4000).astype(np.int64),
        "i": rng.integers(0, 30, 4000).astype(np.int64)})
    outs = []
    for parts in (2, 17):
        ds = ray.data.from_pandas(df).repartition(parts)
        outs.append(_sorted(
            cooccur_pairs(ds, "k", "i", min_count=3).to_pandas()))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = duckdb.sql("""
        WITH d AS (SELECT DISTINCT k, i FROM df)
        SELECT a.i a, b.i b, count(*) n
        FROM d a JOIN d b ON a.k=b.k AND a.i < b.i
        GROUP BY 1,2 HAVING count(*) >= 3""").df()
    pd.testing.assert_frame_equal(outs[0], _sorted(want), check_dtype=False)


def test_full_outer_grace_join_vs_duckdb(ray_session):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from osmray.joins import bucketed_join

    rng = np.random.default_rng(53)
    l = pd.DataFrame({"k": rng.integers(0, 60, 500).astype(np.int64),
                      "lv": np.arange(500, dtype=np.int64)})
    r = pd.DataFrame({"k2": rng.integers(30, 90, 400).astype(np.int64),
                      "rv": np.arange(400, dtype=np.int64)})
    out = bucketed_join(ray.data.from_pandas(l).repartition(4),
                        ray.data.from_pandas(r).repartition(3),
                        on="k", right_on="k2", how="full", num_buckets=7)

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({c: pc.fill_null(t[c], -1) for c in t.schema.names})

    got = _sorted(out.map_batches(fill, batch_format="pyarrow").to_pandas())
    want = duckdb.sql("""
        SELECT COALESCE(l.k,-1) k, COALESCE(l.lv,-1) lv,
               COALESCE(r.k2,-1) k2, COALESCE(r.rv,-1) rv
        FROM l FULL OUTER JOIN r ON l.k = r.k2""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_hough_recovers_planted_lines(ray_session):
    """The three planted lines (horizontal y=60, vertical x=200,
    diagonal y=x) must surface as accumulator peaks at their exact
    quantized (theta, rho) bins: t=6/rho=79, t=0/rho=114, t=9/rho=64."""
    from osmray.queries import q_hough

    df = q_hough("/root/testdata/sf0.001").to_pandas()
    peaks = set(zip(df["t"], df["rho"]))
    assert {(6, 79), (0, 114), (9, 64)} <= peaks
    # the diagonal collapses every planted point into ONE bin -> top-1
    top = df.sort_values(["n"], ascending=False).iloc[0]
    assert (top["t"], top["rho"]) == (9, 64)


def test_quadtree_declarative_step(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.pipelines.declarative import run_pipeline

    rng = np.random.RandomState(3)
    t = pa.table({"x": pa.array(rng.randint(0, 4096, 5000), pa.int64()),
                  "y": pa.array(rng.randint(0, 4096, 5000), pa.int64())})
    import pyarrow.parquet as pq
    pq.write_table(t, "/tmp/qt_pts.parquet")
    out = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/qt_pts.parquet"},
        {"op": "quadtree", "x": "x", "y": "y", "bits": 12,
         "max_res": 4, "cap": 100},
    ]).to_pandas()
    assert out["n"].sum() == 5000
    assert (out["n"][out["res"] < 4] <= 100).all()


def test_ransac_consensus_finds_planted_line(ray_session):
    """Best RANSAC model must be an anchor pair on the planted
    diagonal (line id 2), with a consensus far above noise pairs."""
    from osmray.queries import q_ransac

    df = q_ransac("/root/testdata/sf0.001").to_pandas()
    top = df.iloc[0]
    assert (top["a"] // 5) % 3 == 2 and (top["b"] // 5) % 3 == 2
    assert top["n_inliers"] > 1000
    # ranking is deterministic: inliers desc, then (a, b)
    assert (df["n_inliers"].is_monotonic_decreasing)


def test_sorted_fold_min_max_vs_numpy(ray_session):
    """sorted_fold with mixed sum/min/max ops equals the numpy
    groupby reduction on multi-block data with keys spanning blocks."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.tableops import sorted_fold

    rng = np.random.RandomState(7)
    k = rng.randint(0, 50, 5000).astype(np.int64)
    a = rng.randint(-1000, 1000, 5000).astype(np.int64)
    b = rng.randint(-1000, 1000, 5000).astype(np.int64)
    c = rng.randint(-1000, 1000, 5000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": k, "a": a, "b": b, "c": c})).repartition(16)
    got = (sorted_fold(ds, "k", ["a", "b", "c"], ["sum", "min", "max"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert len(got) == len(np.unique(k))
    for i, key in enumerate(got["k"]):
        m = k == key
        assert got["a"][i] == a[m].sum()
        assert got["b"][i] == b[m].min()
        assert got["c"][i] == c[m].max()


def test_kcenter_matches_brute_force(ray_session):
    """Greedy farthest-point sampling == the scalar reference on a
    multi-block point set, including the (d2 desc, cx, cy) tie rule."""
    import numpy as np
    import ray.data

    from osmray.queries import kcenter

    rng = np.random.RandomState(7)
    pts = sorted({(int(x), int(y)) for x, y in rng.randint(0, 50, (120, 2))})
    K = 6
    # scalar reference
    centers = [min(pts)]
    d2s = [0]
    for _ in range(1, K):
        best = None
        for (x, y) in pts:
            d2 = min((x - cx) ** 2 + (y - cy) ** 2 for cx, cy in centers)
            k = (-d2, x, y)
            if best is None or k < best[0]:
                best = (k, (x, y), d2)
        centers.append(best[1])
        d2s.append(best[2])

    ds = ray.data.from_items(
        [{"cx": x, "cy": y} for x, y in pts]).repartition(7)
    out = kcenter(ds, K).to_pylist()
    assert [(r["cx"], r["cy"]) for r in out] == centers
    assert [r["d2min"] for r in out] == d2s
    # selection radius is non-increasing after the first pick
    assert all(a >= b for a, b in zip(d2s[1:], d2s[2:]))


def test_new_family_declarative_steps(ray_session):
    """lbp / laplacian_pyramid / collocations / oov_rate / kcenter
    steps emit the same results as their kernels."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmray.pipelines.declarative import run_pipeline

    rng = np.random.RandomState(5)
    grid = pa.table({
        "x": pa.array(rng.randint(0, 16, 300), pa.int64()),
        "y": pa.array(rng.randint(0, 16, 300), pa.int64()),
        "v": pa.array(rng.randint(1, 9, 300), pa.int64())})
    pq.write_table(grid, "/tmp/step_grid.parquet")
    lbp = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/step_grid.parquet"},
        {"op": "lbp", "x": "x", "y": "y", "v": "v"}]).to_pandas()
    assert lbp["n_cells"].sum() > 0 and set(lbp.columns) == {
        "n_nbr", "code", "n_cells"}
    lap = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/step_grid.parquet"},
        {"op": "laplacian_pyramid", "x": "x", "y": "y", "v": "v"},
    ]).to_pandas()
    assert list(lap["level"]) == [0, 1, 2]
    assert lap["sum_z"].iloc[0] == 300 * 0 + grid["v"].to_pandas().sum()
    cells = pa.table({
        "cx": grid["x"], "cy": grid["y"]})
    pq.write_table(cells, "/tmp/step_cells.parquet")
    kc = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/step_cells.parquet"},
        {"op": "kcenter", "k": 4}]).to_pandas()
    assert len(kc) == 4 and kc["d2min"].iloc[0] == 0

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "text": pa.array(["a b a b a b c"] * 2)})
    pq.write_table(docs, "/tmp/step_docs.parquet")
    col = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/step_docs.parquet"},
        {"op": "collocations", "min_count": 3}]).to_pandas()
    assert set(zip(col["w1"], col["w2"])) == {("a", "b"), ("b", "a")}
    oov = run_pipeline([
        {"op": "read_parquet", "path": "/tmp/step_docs.parquet"},
        {"op": "oov_rate", "k": 2}]).to_pandas()
    assert (oov["n_oov"] == 1).all() and (oov["n_tokens"] == 7).all()


def test_cooccur_pairs_hot_key_guard(ray_session):
    # VERDICT r4 ask #2: a planted hot basket must fail LOUDLY with
    # the hot key named, not grind through a quadratic expansion.
    import pytest
    import ray.data

    from osmray.tableops import cooccur_pairs

    hot = pd.DataFrame({
        "k": np.repeat(np.int64(7), 40),
        "i": np.arange(40, dtype=np.int64)})  # 780 pairs under key 7
    # single block, single run -> the block-edge fix-up path
    ds = ray.data.from_pandas(hot)
    # Ray re-raises user errors wrapped (RayTaskError(UserCodeException));
    # match on the diagnostic text, which must name the hot key
    with pytest.raises(Exception, match=r"key 7 holds 40 distinct"):
        cooccur_pairs(ds, "k", "i", max_pairs_per_key=100).to_pandas()
    # sandwich the hot key between cold runs in one block -> the
    # in-block (gen) expansion path fires instead
    sandwich = pd.concat([
        pd.DataFrame({"k": np.int64([1, 1]), "i": np.int64([0, 1])}),
        hot,
        pd.DataFrame({"k": np.int64([9, 9]), "i": np.int64([0, 1])}),
    ]).sort_values(["k", "i"]).reset_index(drop=True)
    ds2 = ray.data.from_pandas(sandwich).repartition(1)
    with pytest.raises(Exception, match=r"key 7 holds 40 distinct"):
        cooccur_pairs(ds2, "k", "i", max_pairs_per_key=100).to_pandas()
    # same inputs under the default / loosened cap: correct counts
    got = cooccur_pairs(ds2, "k", "i", min_count=1,
                        max_pairs_per_key=1000).to_pandas()
    # 780 distinct pairs from key 7; pair (0,1) also occurs under
    # keys 1 and 9 and merges into the same row with n=3
    assert len(got) == 780 and int(got["n"].sum()) == 782
    assert int(got.set_index(["a", "b"])["n"].loc[(0, 1)]) == 3
