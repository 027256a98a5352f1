"""Tests for the relational reshaping / window-navigation / rollup
operators added this round (tableops, windows.lag_lead_sorted,
cells.rollup_cells, text.regex_extract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from osmray import cells


def _events_df(n=4000, users=37, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 10**9, n) * 1000, unit="us"
            ),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.uniform(0, 100, n),
        }
    )


def test_lag_lead_multiblock(ray_session):
    import ray.data

    from osmray.windows import lag_lead_sorted

    df = _events_df()
    ds = ray.data.from_pandas(df).repartition(13)
    got = (
        lag_lead_sorted(ds, key="user_id", ts="ts", id_col="event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    sdf = df.sort_values(["user_id", "ts", "event_id"]).copy()
    # the kernel normalizes ts to MICROseconds (the lag_us contract);
    # pandas Timestamps are ns, so the expectation divides
    us = sdf["ts"].astype("int64") // 1000
    g = sdf.groupby("user_id")
    exp = pd.DataFrame(
        {
            "event_id": sdf["event_id"],
            "lag_us": (us - us.groupby(sdf["user_id"]).shift(1)).fillna(
                us - us + np.nan
            ),
            "lead_us": (us.groupby(sdf["user_id"]).shift(-1) - us),
        }
    )
    exp["lag_us"] = exp["lag_us"].fillna(-1).astype(np.int64)
    exp["lead_us"] = exp["lead_us"].fillna(-1).astype(np.int64)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["lag_us"].to_numpy() == exp["lag_us"].to_numpy()).all()
    assert (got["lead_us"].to_numpy() == exp["lead_us"].to_numpy()).all()


def test_pivot_counts(ray_session):
    import ray.data

    from osmray.tableops import pivot_counts

    df = _events_df(n=2000, users=11)
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        pivot_counts(ds, "user_id", "event_type", ["a", "b", "c"], val_col="value")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    for c in ["a", "b", "c"]:
        sel = df["event_type"] == c
        expect_n = df[sel].groupby("user_id").size()
        expect_c = pd.Series(cents[sel]).groupby(df.loc[sel, "user_id"].values).sum()
        for _, row in got.iterrows():
            u = row["user_id"]
            assert row[f"n_{c}"] == int(expect_n.get(u, 0))
            assert row[f"cents_{c}"] == int(expect_c.get(u, 0))


def test_heavy_hitters_exact(ray_session):
    import ray.data

    from osmray.tableops import heavy_hitters

    rng = np.random.default_rng(3)
    # zipf-ish: value i appears ~ n/(i+1) times
    vals = np.repeat(np.arange(200), (4000 / (np.arange(200) + 1)).astype(int))
    rng.shuffle(vals)
    df = pd.DataFrame({"v": [f"tok{int(x):03d}" for x in vals]})
    ds = ray.data.from_pandas(df).repartition(9)
    got = heavy_hitters(ds, "v", k=10, capacity=64).to_pandas()
    vc = df["v"].value_counts()
    exp = (
        pd.DataFrame({"value": vc.index, "n": vc.values})
        .sort_values(["n", "value"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got["value"].tolist() == exp["value"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["rank"].tolist() == list(range(1, 11))


def test_heavy_hitters_tiny_capacity_still_exact(ray_session):
    import ray.data

    from osmray.tableops import heavy_hitters

    # capacity far below cardinality: candidate set grows but result
    # stays exact (or raises if the cap would flood the driver)
    rng = np.random.default_rng(5)
    vals = rng.zipf(1.5, 3000) % 500
    df = pd.DataFrame({"v": [f"t{int(x)}" for x in vals]})
    ds = ray.data.from_pandas(df).repartition(5)
    got = heavy_hitters(ds, "v", k=5, capacity=16).to_pandas()
    vc = df["v"].value_counts()
    exp = (
        pd.DataFrame({"value": vc.index, "n": vc.values})
        .sort_values(["n", "value"], ascending=[False, True])
        .head(5)
    )
    assert got["value"].tolist() == exp["value"].tolist()


def test_rollup_cells(ray_session):
    import ray.data

    from osmray.cells import rollup_cells

    rng = np.random.default_rng(11)
    x = rng.integers(0, 256, 5000).astype(np.int64)
    y = rng.integers(0, 256, 5000).astype(np.int64)
    c8 = cells.pack(x, y, 8)
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(c8)})).repartition(6)
    got = rollup_cells(ds, levels=(8, 4, 0)).to_pandas()
    for a, sh in ((8, 1), (4, 16), (0, 256)):
        sub = got[got["res"] == a]
        anc = cells.pack(x // sh, y // sh, a)
        u, n = np.unique(anc, return_counts=True)
        exp = dict(zip(u.tolist(), n.tolist()))
        assert len(sub) == len(exp)
        for _, row in sub.iterrows():
            assert exp[row["cell"]] == row["n"]
    # level sums all equal the row count
    assert (got.groupby("res")["n"].sum() == 5000).all()


def test_regex_extract(ray_session):
    import ray.data

    from osmray.text import regex_extract

    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "text": ["alpha table scan", "nothing here!", "x table"],
        }
    )
    ds = ray.data.from_pandas(df)
    got = (
        regex_extract(ds, "text", r"(?P<w>[a-z]+) table", ["w"], keep=["id"])
        .to_pandas()
        .sort_values("id")
    )
    assert got["w"].tolist() == ["alpha", "", "x"]


def test_pps_sample(ray_session):
    import ray.data

    from osmray.tableops import pps_sample

    rng = np.random.default_rng(13)
    n_rows = 3000
    df = pd.DataFrame(
        {"oid": np.arange(n_rows, dtype=np.int64),
         "w": rng.integers(1, 100, n_rows).astype(np.int64)}
    )
    ds = ray.data.from_pandas(df).repartition(11)
    got = pps_sample(ds, "oid", "w", n=50).to_pandas().sort_values("oid")
    # scalar reference
    W = int(df["w"].sum())
    cum = np.cumsum(df["w"].to_numpy())
    sel = (cum * 50) // W > ((cum - df["w"].to_numpy()) * 50) // W
    exp = df[sel]
    assert got["oid"].tolist() == exp["oid"].tolist()
    assert len(got) == 50  # no item heavier than W/n in this data
    # equal weights -> exact even spacing
    df2 = pd.DataFrame({"oid": np.arange(1000, dtype=np.int64),
                        "w": np.ones(1000, dtype=np.int64)})
    got2 = pps_sample(ray.data.from_pandas(df2).repartition(7), "oid", "w", n=10).to_pandas()
    assert got2["oid"].tolist() == [99, 199, 299, 399, 499, 599, 699, 799, 899, 999]


def test_interval_islands(ray_session):
    import ray.data

    from osmray.windows import interval_islands

    rng = np.random.default_rng(19)
    n = 3000
    df = pd.DataFrame(
        {"user_id": rng.integers(0, 23, n).astype(np.int64),
         "s": rng.integers(0, 5000, n).astype(np.int64)}
    )
    df["e"] = df["s"] + rng.integers(1, 200, n)
    ds = ray.data.from_pandas(df).repartition(9)
    got = (
        interval_islands(ds, key="user_id", start="s", end="e")
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    for u, g in df.groupby("user_id"):
        g = g.sort_values(["s", "e"])
        islands, cur_s, cur_e = [], None, None
        for _, r in g.iterrows():
            if cur_e is None or r.s > cur_e:
                if cur_e is not None:
                    islands.append((cur_s, cur_e))
                cur_s, cur_e = r.s, r.e
            else:
                cur_e = max(cur_e, r.e)
        islands.append((cur_s, cur_e))
        row = got[got["user_id"] == u].iloc[0]
        assert row["n_intervals"] == len(g)
        assert row["n_islands"] == len(islands)
        assert row["covered"] == sum(e - s for s, e in islands)


def test_grouped_moments(ray_session):
    import ray.data

    from osmray.tableops import grouped_moments

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {"k": rng.integers(0, 5, 2000).astype(np.int64),
         "x": rng.integers(0, 100, 2000).astype(np.int64),
         "y": rng.integers(0, 1000, 2000).astype(np.int64)}
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = grouped_moments(ds, "k", "x", "y").to_pandas().set_index("k")
    for k, g in df.groupby("k"):
        r = got.loc[k]
        assert r["n"] == len(g)
        assert r["sum_x"] == g["x"].sum() and r["sum_y"] == g["y"].sum()
        assert r["sum_xx"] == (g["x"] ** 2).sum()
        assert r["sum_yy"] == (g["y"] ** 2).sum()
        assert r["sum_xy"] == (g["x"] * g["y"]).sum()


def test_skyline2d(ray_session):
    import ray.data

    from osmray.tableops import skyline2d

    rng = np.random.default_rng(37)
    n = 4000
    x = rng.permutation(n).astype(np.int64)  # distinct
    y = rng.integers(0, 10**6, n).astype(np.int64)
    df = pd.DataFrame({"oid": np.arange(n, dtype=np.int64), "x": x, "y": y})
    ds = ray.data.from_pandas(df).repartition(13)
    got = skyline2d(ds, "oid", "x", "y").to_pandas().sort_values("x")
    o = np.argsort(x)
    ys = y[o]
    runmin = np.minimum.accumulate(ys)
    sky = np.concatenate(([True], ys[1:] < runmin[:-1]))
    exp = df.iloc[o[sky]].sort_values("x")
    assert got["oid"].tolist() == exp["oid"].tolist()


def test_exact_order_stats(ray_session):
    import ray.data

    from osmray.tableops import exact_order_stats

    rng = np.random.default_rng(41)
    v = rng.integers(0, 10**7, 5000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"cents": v})).repartition(9)
    got = exact_order_stats(ds, "cents", [1, 50, 99]).to_pandas().set_index("p")
    sv = np.sort(v)
    for p in (1, 50, 99):
        r = max(1, len(v) * p // 100)
        assert got.loc[p, "rank"] == r
        assert got.loc[p, "value"] == sv[r - 1]


def test_exact_order_stats_all_ties(ray_session):
    import ray.data

    from osmray.tableops import exact_order_stats

    # degenerate: one constant value across many equal blocks (the
    # colliding-key union-span path)
    ds = ray.data.from_pandas(
        pd.DataFrame({"cents": np.full(900, 7, dtype=np.int64)})
    ).repartition(9)
    got = exact_order_stats(ds, "cents", [1, 50, 99]).to_pandas()
    assert sorted(got["value"].tolist()) == [7, 7, 7]
    assert sorted(got["rank"].tolist()) == [9, 450, 891]


def test_declarative_new_steps(ray_session):
    import pyarrow as pa
    import ray.data

    from osmray.pipelines.declarative import run_pipeline

    df = _events_df(n=500, users=7)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    out = run_pipeline(
        [{"op": "pivot", "key_col": "user_id", "cat_col": "event_type",
          "categories": ["a", "b", "c"]}], ds=ds)
    t = out.to_pandas()
    assert set(t.columns) == {"user_id", "n_a", "n_b", "n_c"}
    assert t[["n_a", "n_b", "n_c"]].to_numpy().sum() == 500

    out2 = run_pipeline(
        [{"op": "lag_lead", "key": "user_id"}], ds=ds)
    assert out2.count() == 500

    pts = ray.data.from_arrow(pa.table({
        "oid": pa.array(np.arange(100, dtype=np.int64)),
        "x": pa.array(np.random.default_rng(1).permutation(100).astype(np.int64)),
        "y": pa.array(np.random.default_rng(2).integers(0, 1000, 100).astype(np.int64)),
    }))
    sky = run_pipeline([{"op": "skyline", "id_col": "oid", "x_col": "x",
                         "y_col": "y"}], ds=pts)
    assert 1 <= sky.count() <= 100


def test_interval_islands_empty_blocks(ray_session):
    import ray.data

    from osmray.windows import interval_islands

    # more partitions than rows -> empty blocks must not crash
    df = pd.DataFrame({"user_id": np.array([1, 1, 2], dtype=np.int64),
                       "s": np.array([0, 5, 100], dtype=np.int64),
                       "e": np.array([10, 20, 110], dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(16)
    got = interval_islands(ds).to_pandas().sort_values("user_id")
    assert got["n_islands"].tolist() == [1, 1]
    assert got["covered"].tolist() == [20, 10]


def test_scan_ops_empty_blocks(ray_session):
    import ray.data

    from osmray.tableops import exact_order_stats, pps_sample, skyline2d
    from osmray.windows import lag_lead_sorted

    df = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "ts": pd.to_datetime([1_000_000, 2_000_000, 3_000_000], unit="us"),
        "w": np.array([5, 5, 5], dtype=np.int64),
        "x": np.array([3, 1, 2], dtype=np.int64),
        "y": np.array([7, 9, 8], dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(16)
    assert lag_lead_sorted(ds).count() == 3
    assert pps_sample(ds, "event_id", "w", n=2).count() == 2
    assert skyline2d(ds, "event_id", "x", "y").count() >= 1
    assert exact_order_stats(ds, "w", [50]).count() == 1


def test_kmv_sketch(ray_session):
    import pyarrow as pa
    import ray.data

    from osmray.sketch import hll_hash62, kmv_bottom_k

    rng = np.random.default_rng(53)
    vals = rng.integers(0, 50_000, 30_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(9)
    got = kmv_bottom_k(ds, "v", k=128).to_pandas()
    exp_h = np.sort(hll_hash62(np.unique(vals)))[:128]
    assert (got["h"].to_numpy() == exp_h).all()
    true = len(np.unique(vals))
    est = int(got["est_distinct"].iloc[0])
    assert abs(est - true) / true < 0.25  # k=128 -> ~9% expected error
    # sparse case: fewer distincts than k -> exact
    small = ray.data.from_arrow(pa.table({"v": pa.array(np.arange(50, dtype=np.int64))}))
    got2 = kmv_bottom_k(small, "v", k=128).to_pandas()
    assert int(got2["est_distinct"].iloc[0]) == 50 and len(got2) == 50


def test_count_min_point_estimates(ray_session):
    import pyarrow as pa
    import ray.data

    from osmray.sketch import count_min

    rng = np.random.default_rng(59)
    vals = rng.zipf(1.3, 20_000).astype(np.int64) % 3000
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(7)
    cm = count_min(ds, "v", depth=4, width=1024).to_pandas()
    grid = np.zeros((4, 1024), dtype=np.int64)
    grid[cm["d"], cm["col"]] = cm["n"]
    params = [(2147483647, 48271), (2147483629, 16807),
              (2147483563, 40692), (2147483423, 69621)]
    u, true = np.unique(vals, return_counts=True)
    # CM point estimate is an upper bound; tight for heavy items
    for x, t in sorted(zip(u.tolist(), true.tolist()), key=lambda z: -z[1])[:10]:
        est = min(grid[j][((abs(x) % p) * a % p) % 1024] for j, (p, a) in enumerate(params))
        assert est >= t
        assert est - t <= len(vals) // 256  # well inside the eps*N bound


def test_parallelism_independence(ray_session):
    """North-rule property: identical results at any partitioning."""
    import pyarrow as pa
    import ray.data

    from osmray.tableops import exact_order_stats, pps_sample, skyline2d
    from osmray.windows import interval_islands, lag_lead_sorted

    rng = np.random.default_rng(61)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 19, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**8, n) * 1000, unit="us"),
        "s": rng.integers(0, 4000, n).astype(np.int64),
        "w": rng.integers(1, 50, n).astype(np.int64),
        "x": rng.permutation(n).astype(np.int64),
        "y": rng.integers(0, 10**6, n).astype(np.int64),
    })
    df["e"] = df["s"] + rng.integers(1, 150, n)

    def runs(op):
        outs = []
        for parts in (2, 17):
            ds = ray.data.from_pandas(df).repartition(parts)
            outs.append(op(ds).to_pandas().sort_values(
                list(op(ds).schema().names)[:2]).reset_index(drop=True))
        return outs

    for op in (
        lambda d: lag_lead_sorted(d),
        lambda d: interval_islands(d),
        lambda d: pps_sample(d, "event_id", "w", n=40),
        lambda d: skyline2d(d, "event_id", "x", "y"),
        lambda d: exact_order_stats(d, "w", [10, 90]),
    ):
        a, b = runs(op)
        pd.testing.assert_frame_equal(a, b)


def test_grouped_order_stats_multiblock(ray_session):
    import pandas as pd
    import ray.data

    from osmray.tableops import grouped_order_stats

    rng = np.random.default_rng(7)
    # skewed group sizes: one giant spanning group, several small
    # ones, one all-tie group (exercises the union-span collapse)
    keys = (["big"] * 5000 + ["s1"] * 7 + ["s2"] * 31 + ["tie"] * 900
            + ["edge"] * 1)
    vals = np.concatenate([
        rng.integers(0, 1000, 5000),
        rng.integers(0, 50, 7),
        rng.integers(0, 50, 31),
        np.full(900, 42),
        [5],
    ]).astype(np.int64)
    df = pd.DataFrame({"k": keys, "v": vals})
    ds = ray.data.from_pandas(df).repartition(17)
    got = (grouped_order_stats(ds, "k", "v", [50, 90])
           .to_pandas().sort_values(["k", "p"]).reset_index(drop=True))
    # brute-force oracle: percentile_disc rank = ceil(p*n/100)
    rows = []
    for k, g in df.groupby("k"):
        v = np.sort(g["v"].to_numpy())
        n = len(v)
        for p in (50, 90):
            r = max(1, -((-n * p) // 100))
            rows.append((k, p, r, int(v[r - 1]), n))
    exp = (pd.DataFrame(rows, columns=["k", "p", "rank", "value", "n"])
           .sort_values(["k", "p"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "p", "rank", "value", "n"]].astype({"p": np.int64}), exp,
        check_dtype=False)
