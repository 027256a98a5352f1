import numpy as np
import pyarrow as pa
import pytest

from osmray import joins


@pytest.fixture()
def sides(ray_session):
    import ray.data

    left = ray.data.from_items(
        [{"k": i % 7, "lv": i} for i in range(50)]
    )
    right = ray.data.from_items(
        [{"rk": i, "rv": i * 10} for i in range(5)]  # keys 0..4 (5,6 unmatched)
    )
    return left, right


def _expect(how="inner"):
    rows = []
    for i in range(50):
        k = i % 7
        if k < 5:
            rows.append((k, i, k * 10))
    return sorted(rows)


def test_large_join_matches_bucketed(sides):
    left, right = sides
    a = joins.large_join(left, right, on="k", right_on="rk", num_partitions=4).to_pandas()
    b = joins.bucketed_join(left, right, on="k", right_on="rk", num_buckets=4).to_pandas()
    got_a = sorted(zip(a["k"], a["lv"], a["rv"]))
    got_b = sorted(zip(b["k"], b["lv"], b["rv"]))
    assert got_a == _expect()
    assert got_b == _expect()


def test_broadcast_filter_semi_anti(ray_session):
    import ray.data

    ds = ray.data.from_items([{"tile_key": i, "v": i} for i in range(20)])
    keys = np.array([3, 5, 7])
    semi = joins.broadcast_filter(ds, "tile_key", keys).to_pandas()
    anti = joins.broadcast_filter(ds, "tile_key", keys, anti=True).to_pandas()
    assert sorted(semi["tile_key"]) == [3, 5, 7]
    assert len(anti) == 17 and not set(anti["tile_key"]) & {3, 5, 7}


def test_asof_join_matches_scalar(ray_session):
    import pandas as pd
    import ray.data

    from osmray.joins import asof_join

    rng = np.random.default_rng(9)
    n = 400
    ts = np.sort(rng.integers(0, 10_000_000, n)) * 1000  # us
    users = rng.integers(0, 7, n)
    side = rng.random(n) < 0.3  # ~30% state rows
    base = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": users.astype(np.int64),
        }
    )
    left_df = base[~side]
    right_df = base[side]
    left = ray.data.from_pandas(left_df).repartition(3)
    right = ray.data.from_pandas(right_df).repartition(2)
    got = (
        asof_join(left, right, left_cols=["event_id"], right_cols=["event_id"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # scalar oracle
    rows = []
    for _, lr in left_df.iterrows():
        cand = right_df[(right_df["user_id"] == lr["user_id"]) & (right_df["ts"] <= lr["ts"])]
        if len(cand):
            best = cand.sort_values("ts").iloc[-1]
            rows.append(
                (lr["event_id"], best["event_id"], (lr["ts"] - best["ts"]).value // 1000)
            )
    want = pd.DataFrame(rows, columns=["event_id", "state_event_id", "gap_us"]).sort_values(
        "event_id"
    ).reset_index(drop=True)
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["state_event_id"].tolist() == want["state_event_id"].tolist()
    assert got["gap_us"].tolist() == want["gap_us"].tolist()


def test_asof_join_asymmetric_columns(ray_session):
    """left/right keep DIFFERENT payload columns: the tagged sides
    must null-pad to a unified schema before the union, and output
    dtypes must survive the pandas round-trip (int64 stays int64)."""
    import pandas as pd
    import ray.data

    from osmray.joins import asof_join

    left_df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
            "ts": pd.to_datetime([100, 250, 120, 400], unit="us"),
            "event_id": np.arange(4, dtype=np.int64),
            "amount": np.array([10.5, 20.5, 30.5, 40.5]),
        }
    )
    right_df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime([50, 200, 300], unit="us"),
            "plan": ["a", "b", "c"],
            "tier": np.array([7, 8, 9], dtype=np.int64),
        }
    )
    left = ray.data.from_pandas(left_df).repartition(2)
    right = ray.data.from_pandas(right_df).repartition(2)
    got = (
        asof_join(left, right, left_cols=["event_id", "amount"],
                  right_cols=["plan", "tier"])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # events: (u1,100)->(u1,50)=a/7 gap 50; (u1,250)->(u1,200)=b/8 gap 50;
    # (u2,120)-> no state <=120 -> dropped; (u2,400)->(u2,300)=c/9 gap 100
    assert got["event_id"].tolist() == [0, 1, 3]
    assert got["state_plan"].tolist() == ["a", "b", "c"]
    assert got["state_tier"].tolist() == [7, 8, 9]
    assert got["gap_us"].tolist() == [50, 50, 100]
    assert got["amount"].tolist() == [10.5, 20.5, 40.5]
    assert str(got["state_tier"].dtype) == "int64"
    assert str(got["event_id"].dtype) == "int64"


def test_asof_join_shared_column_type_mismatch(ray_session):
    import pandas as pd
    import pytest
    import ray.data

    from osmray.joins import asof_join

    left = ray.data.from_pandas(pd.DataFrame(
        {"user_id": np.array([1], dtype=np.int64),
         "ts": pd.to_datetime([100], unit="us"),
         "v": np.array([1], dtype=np.int64)}
    ))
    right = ray.data.from_pandas(pd.DataFrame(
        {"user_id": np.array([1], dtype=np.int64),
         "ts": pd.to_datetime([50], unit="us"),
         "v": np.array([1.5])}
    ))
    with pytest.raises(ValueError, match="mismatched types"):
        asof_join(left, right, left_cols=["v"], right_cols=["v"])


def test_connected_components_matches_union_find(ray_session):
    import ray.data

    from osmray.graph import connected_components

    rng = np.random.default_rng(11)
    n, m = 300, 380
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    ds = ray.data.from_items(
        [{"u": int(a), "v": int(b)} for a, b in zip(u, v)]
    ).repartition(4)
    t = connected_components(ds).sort("node").to_pandas()
    got = dict(zip(t["node"].tolist(), t["comp"].tolist()))
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(u, v):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    comp: dict[int, list[int]] = {}
    for x in set(u.tolist()) | set(v.tolist()):
        comp.setdefault(find(x), []).append(x)
    want = {}
    for mem in comp.values():
        mn = min(mem)
        for x in mem:
            want[x] = mn
    assert got == want


def test_pagerank_matches_dense_reference(ray_session):
    import ray.data

    from osmray.graph import pagerank

    rng = np.random.default_rng(13)
    n, m = 60, 200
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    ds = ray.data.from_items(
        [{"u": int(a), "v": int(b)} for a, b in zip(u, v)]
    ).repartition(3)
    t = pagerank(ds, n_iters=25).sort("node").to_pandas()
    nodes = t["node"].to_numpy()
    got = t["rank"].to_numpy()
    # dense numpy reference over the SAME node universe
    idx = {int(x): i for i, x in enumerate(nodes)}
    nn = len(nodes)
    A = np.zeros((nn, nn))
    for a, b in zip(u, v):
        A[idx[int(b)], idx[int(a)]] += 1.0
    deg = np.zeros(nn)
    for a in u:
        deg[idx[int(a)]] += 1.0
    share = np.divide(A, np.maximum(deg, 1.0)[None, :])
    r = np.full(nn, 1.0 / nn)
    for _ in range(25):
        dangling = r[deg == 0].sum()
        r = (1.0 - 0.85) / nn + 0.85 * (share @ r + dangling / nn)
    np.testing.assert_allclose(got, r, atol=1e-12)
    assert abs(got.sum() - 1.0) < 1e-9


def test_cc_shuffle_engine_matches_broadcast(ray_session):
    """The keyed-join CC engine (nothing O(V) on the driver) must be
    row-identical to the broadcast engine on a multi-block fixture."""
    import ray.data

    from osmray.graph import connected_components

    rng = np.random.default_rng(17)
    n, m = 400, 460
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    ds = ray.data.from_items(
        [{"u": int(a), "v": int(b)} for a, b in zip(u, v)]
    ).repartition(5)
    a = connected_components(ds, mode="broadcast").sort("node").to_pandas()
    b = connected_components(ds, mode="shuffle", num_partitions=4).sort("node").to_pandas()
    assert a["node"].tolist() == b["node"].tolist()
    assert a["comp"].tolist() == b["comp"].tolist()


def test_pagerank_shuffle_engine_matches_broadcast(ray_session):
    """Keyed-join PageRank rounds vs broadcast rounds: equal to
    summation-order round-off."""
    import ray.data

    from osmray.graph import pagerank

    rng = np.random.default_rng(19)
    n, m = 80, 260
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    ds = ray.data.from_items(
        [{"u": int(a), "v": int(b)} for a, b in zip(u, v)]
    ).repartition(3)
    a = pagerank(ds, n_iters=10, mode="broadcast").sort("node").to_pandas()
    b = pagerank(ds, n_iters=10, mode="shuffle", num_partitions=4).sort("node").to_pandas()
    assert a["node"].tolist() == b["node"].tolist()
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=1e-12, atol=1e-15
    )


def test_bloom_build_bitmap_is_exact_union(ray_session):
    import ray.data

    from osmray.sketch import bloom_build, bloom_positions

    keys = np.arange(1000, 2000, 3, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"k": keys})).repartition(4)
    bm = bloom_build(ds, "k", m_bits=4096)
    h1, h2 = bloom_positions(keys, 4096)
    want = np.zeros(4096, dtype=bool)
    want[h1] = True
    want[h2] = True
    np.testing.assert_array_equal(bm, want)


def test_bloom_semi_join_equals_exact_semi_join(ray_session):
    import ray.data

    from osmray.joins import bloom_semi_join

    rng = np.random.default_rng(11)
    left_keys = rng.integers(0, 5000, 4000).astype(np.int64)
    right_keys = np.unique(rng.integers(0, 5000, 150).astype(np.int64))
    left = ray.data.from_arrow(
        pa.table({"k": left_keys, "v": np.arange(4000, dtype=np.int64)})
    ).repartition(4)
    right = ray.data.from_arrow(pa.table({"k": right_keys})).repartition(2)

    # tight bitmap so false positives actually occur and get verified away
    out = bloom_semi_join(left, right, on="k", m_bits=512).to_pandas()
    want = np.isin(left_keys, right_keys)
    assert sorted(out["v"]) == sorted(np.arange(4000)[want].tolist())

    marked = bloom_semi_join(left, right, on="k", m_bits=512, mark="hit").to_pandas()
    # bloom survivors are a superset of true matches; mark is exact
    assert len(marked) >= int(want.sum())
    assert sorted(marked.loc[marked["hit"], "v"]) == sorted(
        np.arange(4000)[want].tolist()
    )
    assert not np.isin(
        marked.loc[~marked["hit"], "k"].to_numpy(), right_keys
    ).any()


def test_bucketed_join_left_outer(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from osmray.joins import bucketed_join

    rng = np.random.default_rng(43)
    left = pd.DataFrame({"k": rng.integers(0, 50, 400).astype(np.int64),
                         "lid": np.arange(400, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 50, 3, dtype=np.int64)})
    right["payload"] = right["k"] * 10
    import pyarrow as pa

    got = bucketed_join(
        ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5),
        ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(3),
        on="k", num_buckets=4, how="left",
    ).to_pandas()
    exp = left.merge(right, on="k", how="left", suffixes=("", "_r"))
    assert len(got) == len(exp) == 400
    g = got.sort_values("lid").reset_index(drop=True)
    e = exp.sort_values("lid").reset_index(drop=True)
    gm = g["payload"].fillna(-1).astype(np.int64)
    em = e["payload"].fillna(-1).astype(np.int64)
    assert (gm.to_numpy() == em.to_numpy()).all()


def test_bucketed_join_semi_anti(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from osmray.joins import bucketed_join

    rng = np.random.default_rng(47)
    left = pd.DataFrame({"k": rng.integers(0, 40, 300).astype(np.int64),
                         "lid": np.arange(300, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 40, 4, dtype=np.int64)})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(5)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(2)
    semi = bucketed_join(lds, rds, on="k", num_buckets=4, how="semi").to_pandas()
    anti = bucketed_join(lds, rds, on="k", num_buckets=4, how="anti").to_pandas()
    in_r = left["k"].isin(right["k"])
    assert sorted(semi["lid"]) == sorted(left.loc[in_r, "lid"])
    assert sorted(anti["lid"]) == sorted(left.loc[~in_r, "lid"])
    assert set(semi.columns) == {"k", "lid"}  # probe columns only


def test_skew_join_matches_grace_join(ray_session):
    """Hot-key broadcast path + cold grace path must together equal a
    plain grace join row-for-row on a zipfian key set, including the
    no-hot-keys fallback."""
    import ray.data

    from osmray.joins import bucketed_join, skew_join

    rng = np.random.RandomState(0)
    n = 20000
    keys = np.where(rng.rand(n) < 0.5, 7,
                    rng.randint(0, 300, n)).astype(np.int64)
    left = ray.data.from_arrow(pa.table(
        {"k": keys, "lv": rng.randint(0, 50, n).astype(np.int64)}
    )).repartition(6)
    rk = np.arange(300, dtype=np.int64)
    right = ray.data.from_arrow(pa.table({"k": rk, "rv": rk * 3 + 1}))

    def norm(df):
        return df.sort_values(list(sorted(df.columns)))[
            sorted(df.columns)].reset_index(drop=True)

    exp = norm(bucketed_join(left, right, on="k").to_pandas())
    got = norm(skew_join(left, right, on="k", hot_threshold=2000).to_pandas())
    assert got.equals(exp)
    # threshold nobody reaches -> pure grace fallback, same rows
    got2 = norm(skew_join(left, right, on="k",
                          hot_threshold=10 ** 9).to_pandas())
    assert got2.equals(exp)


def test_asof_join_sorted_engine_parity(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from osmray.joins import asof_join

    rng = np.random.default_rng(3)
    # hot key spanning many blocks with sparse rights; keys with no
    # rights; a right-only key; left-only key 99
    lk = np.concatenate([np.full(4000, 7), rng.integers(0, 20, 800), [99] * 5])
    lt = rng.integers(0, 100000, len(lk))
    left = pd.DataFrame({"user_id": lk, "ts": pd.to_datetime(lt, unit="s"),
                         "event_id": np.arange(len(lk))})
    rk = np.concatenate([np.full(6, 7), rng.integers(0, 15, 60), [55] * 3])
    rt = rng.integers(0, 100000, len(rk))
    right = pd.DataFrame({"user_id": rk, "ts": pd.to_datetime(rt, unit="s"),
                          "event_id": 100000 + np.arange(len(rk))})
    left = left.drop_duplicates(["user_id", "ts"])
    right = right.drop_duplicates(["user_id", "ts"])

    lds = ray.data.from_pandas(left).repartition(11)
    rds = ray.data.from_pandas(right).repartition(5)
    kw = dict(left_cols=["event_id"], right_cols=["event_id"])
    g = asof_join(lds, rds, engine="grouped", **kw).to_pandas()
    s = asof_join(lds, rds, engine="sorted", **kw).to_pandas()
    a = asof_join(lds, rds, engine="auto", max_group_rows=100, **kw).to_pandas()
    cols = ["event_id", "state_event_id", "gap_us"]
    for df in (g, s, a):
        df.sort_values("event_id", inplace=True)
        df.reset_index(drop=True, inplace=True)
    pd.testing.assert_frame_equal(g[cols], s[cols])
    pd.testing.assert_frame_equal(g[cols], a[cols])
    # brute pandas oracle
    m = (pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"),
                       on="ts", by="user_id", suffixes=("", "_r"))
         .dropna(subset=["event_id_r"]).sort_values("event_id")
         .reset_index(drop=True))
    assert len(m) == len(g)
    assert (m["event_id_r"].astype(np.int64).to_numpy()
            == g["state_event_id"].to_numpy()).all()
