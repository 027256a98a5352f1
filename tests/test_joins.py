import numpy as np
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
