"""Rank-family / RANGE-frame / funnel / resample operators
(osmray/windows.py round-3 additions): DuckDB-checked on randomized
multi-block data plus the north-rule parallelism-independence
property."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmray.windows import (funnel, ntile_ranks, range_window_sum,
                            resample_fill)


@pytest.fixture(scope="module")
def events_df():
    rng = np.random.default_rng(7)
    n = 3000
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "etype": rng.choice(["view", "click", "purchase"], n),
        "ts": pd.to_datetime(rng.integers(0, 40 * 86400, n) * 10**6
                             + rng.integers(0, 10**6, n), unit="us"),
        "cents": rng.integers(-50, 5000, n).astype(np.int64),
    })


def _sorted(df):
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _ray_df(op, df, parts=5):
    import ray.data

    out = op(ray.data.from_pandas(df).repartition(parts)).to_pandas()
    return _sorted(out)


def test_ntile_ranks_vs_duckdb(ray_session, events_df):
    got = _ray_df(lambda d: ntile_ranks(d, "etype", "cents", "event_id",
                                        n_tiles=7), events_df)
    want = duckdb.sql("""
        SELECT event_id, etype,
          CAST(ntile(7) OVER (PARTITION BY etype ORDER BY cents, event_id)
               AS BIGINT) AS tile,
          percent_rank() OVER (PARTITION BY etype ORDER BY cents) AS prank,
          cume_dist() OVER (PARTITION BY etype ORDER BY cents) AS cdist
        FROM events_df""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_ntile_tiny_groups(ray_session, events_df):
    df = events_df.head(3)  # n < n_tiles
    got = _ray_df(lambda d: ntile_ranks(d, "etype", "cents", "event_id",
                                        n_tiles=7), df, parts=2)
    assert (got["tile"] >= 1).all() and len(got) == 3


def test_range_window_vs_duckdb(ray_session, events_df):
    got = _ray_df(lambda d: range_window_sum(d, "user_id", "ts",
                                             "event_id", "cents"),
                  events_df)
    want = duckdb.sql("""
        SELECT event_id, user_id,
          CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
               AS BIGINT) AS win_sum
        FROM events_df""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_funnel_vs_duckdb(ray_session, events_df):
    got = _ray_df(lambda d: funnel(d, "user_id", "ts", "etype",
                                   ["view", "click", "purchase"]),
                  events_df)
    want = duckdb.sql("""
        WITH a AS (SELECT user_id, min(ts) t1 FROM events_df
                   WHERE etype='view' GROUP BY 1),
        b AS (SELECT e.user_id, min(e.ts) t2 FROM events_df e
              JOIN a ON e.user_id=a.user_id AND e.ts > a.t1
              WHERE etype='click' GROUP BY 1),
        c AS (SELECT e.user_id, min(e.ts) t3 FROM events_df e
              JOIN b ON e.user_id=b.user_id AND e.ts > b.t2
              WHERE etype='purchase' GROUP BY 1)
        SELECT a.user_id, CAST(epoch_us(a.t1) AS BIGINT) t1,
               CAST(epoch_us(b.t2) AS BIGINT) t2,
               CAST(epoch_us(c.t3) AS BIGINT) t3
        FROM a JOIN b ON a.user_id=b.user_id
               JOIN c ON a.user_id=c.user_id""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_resample_fill_vs_duckdb(ray_session, events_df):
    got = _ray_df(lambda d: resample_fill(d, "user_id", "ts", "cents"),
                  events_df)
    want = duckdb.sql("""
        WITH t AS (SELECT user_id, epoch_us(ts) // 86400000000 AS d,
                          cents FROM events_df),
        s AS (SELECT user_id, d, sum(cents) cents FROM t GROUP BY 1, 2),
        r AS (SELECT user_id, min(d) dmin, max(d) dmax FROM t GROUP BY 1),
        g AS (SELECT r.user_id, gs.d FROM r,
              LATERAL (SELECT unnest(generate_series(r.dmin, r.dmax)) d) gs)
        SELECT g.user_id, CAST(g.d AS BIGINT) bucket,
               CAST(COALESCE(s.cents, 0) AS BIGINT) val_sum,
               s.user_id IS NULL filled
        FROM g LEFT JOIN s ON s.user_id = g.user_id AND s.d = g.d""").df()
    pd.testing.assert_frame_equal(got, _sorted(want), check_dtype=False)


def test_parallelism_independence(ray_session, events_df):
    import ray.data

    for op in (
        lambda d: ntile_ranks(d, "etype", "cents", "event_id"),
        lambda d: range_window_sum(d, "user_id", "ts", "event_id", "cents"),
        lambda d: funnel(d, "user_id", "ts", "etype", ["view", "click"]),
        lambda d: resample_fill(d, "user_id", "ts", "cents"),
    ):
        outs = []
        for parts in (2, 17):
            ds = ray.data.from_pandas(events_df).repartition(parts)
            outs.append(_sorted(op(ds).to_pandas()))
        pd.testing.assert_frame_equal(outs[0], outs[1])


def test_viterbi_decode_vs_scalar(ray_session):
    """The vectorized 4-state Viterbi must match a scalar
    full-trellis decode (cost, final state, AND the base-31 path
    hash, i.e. the entire argmin chain)."""
    import numpy as np

    from osmray.queries import _VIT_MOD, _VIT_ROADS, _VIT_SWITCH, q_viterbi

    df = q_viterbi("/root/testdata/sf0.001").to_pandas()

    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["event_id", "user_id", "ts"])
    pdf = t.to_pandas()
    pdf["tsv"] = pdf["ts"].astype("int64")
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["tsv", "event_id"])
        y = (g["event_id"].to_numpy().astype(np.int64) * 69621 + 3) % 256
        K = len(_VIT_ROADS)
        d = [abs(int(y[0]) - r) for r in _VIT_ROADS]
        paths = [[k] for k in range(K)]
        for tt in range(1, len(y)):
            nd, np_ = [], []
            for k in range(K):
                best_j, best_c = 0, None
                for j in range(K):
                    c = d[j] + (0 if j == k else _VIT_SWITCH)
                    if best_c is None or c < best_c:
                        best_j, best_c = j, c
                nd.append(abs(int(y[tt]) - _VIT_ROADS[k]) + best_c)
                np_.append(paths[best_j] + [k])
            d, paths = nd, np_
        k = int(np.argmin(d))
        h = 0
        for s in paths[k]:
            h = (h * 31 + s) % _VIT_MOD
        row = df[df["user_id"] == uid].iloc[0]
        assert row["viterbi_cost"] == d[k]
        assert row["final_road"] == k
        assert row["path_hash"] == h


def test_debounce_matches_scalar(ray_session, tmp_path):
    """q_debounce == the scalar reset-on-keep scan on synthetic
    bursty events."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmray import queries as Q

    rng = np.random.RandomState(6)
    rows = []
    eid = 0
    for u in range(4):
        t = 0
        for _ in range(60):
            t += int(rng.randint(1, 400))  # bursts under the 600s gap
            rows.append((eid, u, ["view", "click"][rng.randint(2)], t))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "ts": pa.array([r[3] * 1_000_000 for r in rows],
                       pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))
    got = sorted(r["event_id"] for r in
                 Q.q_debounce(str(tmp_path)).to_pandas().to_dict("records"))
    # scalar reference
    keep = []
    import collections
    streams = collections.defaultdict(list)
    for e, u, et, t in rows:
        streams[(u, et)].append((t, e))
    for (u, et), evs in streams.items():
        evs.sort()
        last = None
        for t, e in evs:
            if last is None or t - last >= 600:
                keep.append(e)
                last = t
    assert got == sorted(keep)
    assert len(got) < len(rows)  # bursts actually collapsed


def test_token_bucket_matches_scalar(ray_session, tmp_path):
    """q_token_bucket == the scalar bucket scan (capacity 3, one
    token per full 300 s on the aligned refill clock) on synthetic
    bursty events, including the burst-exhaustion + refill cases."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmray import queries as Q

    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    for u in range(4):
        t = 0
        for _ in range(60):
            # mix sub-period bursts (drain the bucket) with long gaps
            t += int(rng.choice([5, 40, 150, 700, 1300]))
            rows.append((eid, u, t))
            eid += 1
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * 1_000_000 for r in rows],
                       pa.timestamp("us"))}),
        str(tmp_path / "events.parquet"))
    got = sorted(r["event_id"] for r in
                 Q.q_token_bucket(str(tmp_path)).to_pandas()
                 .to_dict("records"))
    # scalar reference
    import collections
    streams = collections.defaultdict(list)
    for e, u, t in rows:
        streams[u].append((t, e))
    keep = []
    for u, evs in streams.items():
        evs.sort()
        tokens, last = 3, evs[0][0]
        for t, e in evs:
            refills = (t - last) // 300
            tokens = min(3, tokens + refills)
            last += refills * 300
            if tokens > 0:
                keep.append(e)
                tokens -= 1
    assert got == sorted(keep)
    assert 0 < len(got) < len(rows)  # bucket actually throttled
