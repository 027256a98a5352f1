"""Driver-facing query registry: one Ray Data pipeline per implemented
operator (SURVEY.md §2 + the training-data extras), each with an
ANSI-SQL twin that DuckDB runs on the same parquet tables.

Cross-engine exactness design: the geospatial queries derive synthetic
web-mercator coordinates from integer keys with ONLY dyadic-rational
arithmetic (``m / 2^18`` style), so every projected coordinate, tile
index, residual and squared distance is bit-exact in both numpy and
DuckDB — no trig in any SQL-checked value (the trig path is verified
against the scalar oracle in pytest instead). Aggregates are integer
(counts, int-cast cents) so summation order cannot perturb hashes.

Derivations (the "footprint" of row ``pid``):
    m1 = (key1 % 2^26);  wx = m1 / 2^18   in [0, 256)
    m2 = (key2 % 2^26);  wy = m2 / 2^18
    z18 PLAIN : px = m1        -> tx = m1 // 256, rx = m1 % 256
    z19 MAXAR : px = 2*m1 - 30 -> tx = floor(px/256), rx = px - 256*tx
                py = 2*m2 + 10    (offsets -30/+10 px @ z19,
                                   reference lib/layers.py:277-278)
"""

from __future__ import annotations

import re as _re

import numpy as np
import pyarrow as pa

from osmray import cells as cellmod
from osmray.tilemath import MAXAR, PLAIN, tile_at_web, edge_ok as edge_ok_fn

_WORD_RE = _re.compile(r"[a-z]+")
M26 = 67108864  # 2^26
W18 = 262144.0  # 2^18


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _li_points(batch: pa.Table) -> dict:
    ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
    pid = ok * 10 + ln
    m1 = (ok * 7919 + ln * 104729) % M26
    m2 = (ok * 6151 + ln * 99991) % M26
    return {"pid": pid, "m1": m1, "m2": m2, "wx": m1 / W18, "wy": m2 / W18}

_LI_SQL = (
    "SELECT l_orderkey * 10 + l_linenumber AS pid, "
    "(l_orderkey * 7919 + l_linenumber * 104729) % 67108864 AS m1, "
    "(l_orderkey * 6151 + l_linenumber * 99991) % 67108864 AS m2, "
    "l_quantity, l_extendedprice, l_discount, l_returnflag FROM lineitem"
)


def _keyed_sums(keys: np.ndarray, vals: dict[str, np.ndarray], key_name: str,
                cnt: np.ndarray | None = None) -> pa.Table:
    """Map-side partial aggregation: per distinct key, count (or the
    sum of an existing ``cnt`` partial) + the sum of each value column
    — one argsort + reduceat, no pandas."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    bounds = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
    if cnt is None:
        counts = np.diff(np.concatenate((bounds, [len(ks)]))).astype(np.int64)
    else:
        counts = np.add.reduceat(cnt[order], bounds).astype(np.int64)
    cols = {key_name: pa.array(ks[bounds]), "cnt": pa.array(counts)}
    for name, v in vals.items():
        cols[name] = pa.array(np.add.reduceat(v[order], bounds).astype(np.int64))
    return pa.table(cols)


def _combine_tree(parts, key_name: str, val_names: list[str], n_mid: int = 8):
    """Combiner tree over keyed partials for BOUNDED key spaces (e.g.
    res-8 cells: <= 4^8 keys): a mid-level combine over ``n_mid``
    coalesced blocks, then a root combine — two cheap repartitions of
    already-aggregated rows instead of Ray's full sort-based groupby
    of every partial row. Each combined block is bounded by the key
    space, so the root task is bounded too; for UNBOUNDED key spaces
    use groupby().aggregate() instead."""

    def comb(batch: pa.Table) -> pa.Table:
        keys = batch[key_name].to_numpy(zero_copy_only=False)
        vals = {n: batch[n].to_numpy(zero_copy_only=False) for n in val_names}
        return _keyed_sums(keys, vals, key_name,
                           cnt=batch["cnt"].to_numpy(zero_copy_only=False))

    mid = parts.repartition(n_mid).map_batches(comb, batch_format="pyarrow", batch_size=None)
    return mid.repartition(1).map_batches(comb, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# geospatial queries
# ---------------------------------------------------------------------------


def q_tile_assign(sf_dir: str):
    """Core op: point -> z18 PLAIN and z19 MAXAR tile assignment +
    residuals + edge predicates, via the engine's vectorized kernels
    (semantics of lib/layers.py:107-143)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def assign(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        tx18, ty18, rx18, ry18 = tile_at_web(p["wx"], p["wy"], 18, PLAIN)
        tx19, ty19, rx19, ry19 = tile_at_web(p["wx"], p["wy"], 19, MAXAR)
        return pa.table(
            {
                "pid": pa.array(p["pid"]),
                "tx18": pa.array(tx18),
                "ty18": pa.array(ty18),
                "rx18": pa.array(rx18),
                "tx19": pa.array(tx19),
                "ty19": pa.array(ty19),
                "rx19": pa.array(rx19),
                "ry19": pa.array(ry19),
                "edge_ok16": pa.array(edge_ok_fn(rx19, ry19, 16)),
                "edge_ok24": pa.array(edge_ok_fn(rx19, ry19, 24)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


Q_TILE_ASSIGN_SQL = f"""
WITH p AS ({_LI_SQL})
SELECT pid,
  m1 // 256 AS tx18, m2 // 256 AS ty18, CAST(m1 % 256 AS DOUBLE) AS rx18,
  CAST(floor((2*m1 - 30) / 256.0) AS BIGINT) AS tx19,
  CAST(floor((2*m2 + 10) / 256.0) AS BIGINT) AS ty19,
  (2*m1 - 30) - 256.0 * floor((2*m1 - 30) / 256.0) AS rx19,
  (2*m2 + 10) - 256.0 * floor((2*m2 + 10) / 256.0) AS ry19,
  ((2*m1 - 30) - 256 * floor((2*m1 - 30) / 256.0)) BETWEEN 16 AND 239
    AND ((2*m2 + 10) - 256 * floor((2*m2 + 10) / 256.0)) BETWEEN 16 AND 239 AS edge_ok16,
  ((2*m1 - 30) - 256 * floor((2*m1 - 30) / 256.0)) BETWEEN 24 AND 231
    AND ((2*m2 + 10) - 256 * floor((2*m2 + 10) / 256.0)) BETWEEN 24 AND 231 AS edge_ok24
FROM p
"""


def q_cell_agg(sf_dir: str):
    """Shuffle/aggregate: group points by packed res-8 cell id,
    integer aggregates only (count, qty, revenue cents). Pre-aggregates
    inside map_batches (partial) before the small groupby — the
    at-scale pattern."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        tx18 = p["m1"] // 256
        ty18 = p["m2"] // 256
        cell = cellmod.pack(tx18 >> 10, ty18 >> 10, 8)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        return _keyed_sums(cell, {"sum_qty": qty, "rev_cents": rev}, "cell8")

    # batch_size=None: one numpy partial per BLOCK, not per 1024 rows;
    # the res-8 key space is bounded, so a combiner tree replaces the
    # full sort-based groupby of every partial row
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    return _combine_tree(partials, "cell8", ["sum_qty", "rev_cents"])


Q_CELL_AGG_SQL = f"""
WITH p AS ({_LI_SQL})
SELECT 8 * 288230376151711744 + (m1 // 256 // 1024) * 536870912 + (m2 // 256 // 1024) AS cell8,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
FROM p GROUP BY 1
"""


def q_cell_agg_salted(sf_dir: str):
    """Skew-handled variant of q_cell_agg (north_rule: 'salted H3-cell
    repartitioning'): phase 1 groups by the SALTED cell key (hot cells
    spread over up to 8 sub-keys, so no single reducer owns a dense
    urban cell), phase 2 unsalts and combines. Must equal the plain
    aggregate bit-for-bit (same SQL oracle)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from osmray import cells as cm

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        cell = cm.pack((p["m1"] // 256) >> 10, (p["m2"] // 256) >> 10, 8)
        skey = cm.salted(cell, p["pid"], 8)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1 - batch["l_discount"].to_numpy(zero_copy_only=False))
            * 100
            + 0.5
        ).astype(np.int64)
        return _keyed_sums(skey, {"sum_qty": qty, "rev_cents": rev}, "skey")

    phase1 = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("skey")
        .aggregate(
            Sum("cnt", alias_name="cnt"),
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("rev_cents", alias_name="rev_cents"),
        )
    )

    def unsalt(batch: pa.Table) -> pa.Table:
        cell = cm.unsalt(batch["skey"].to_numpy(zero_copy_only=False), 8)
        return pa.table(
            {
                "cell8": pa.array(cell),
                "cnt": batch["cnt"],
                "sum_qty": batch["sum_qty"],
                "rev_cents": batch["rev_cents"],
            }
        )

    # phase 2: unsalt and combine. The salted-shuffle demo is phase 1
    # (groupby(skey) — no single reducer owns a hot cell); phase 2's
    # input is already aggregated (<= 8 rows per cell), so the bounded
    # combiner tree replaces a second full groupby
    return _combine_tree(
        phase1.map_batches(unsalt, batch_format="pyarrow"),
        "cell8",
        ["sum_qty", "rev_cents"],
    )


def q_edge_filter(sf_dir: str):
    """Filter + count by flag: the skipedge drop rate per returnflag."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])

    def flag(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        rx19 = (2 * p["m1"] - 30) - 256 * np.floor((2 * p["m1"] - 30) / 256.0)
        ry19 = (2 * p["m2"] + 10) - 256 * np.floor((2 * p["m2"] + 10) / 256.0)
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "edge_ok16": pa.array(edge_ok_fn(rx19, ry19, 16)),
            }
        )

    return (
        ds.map_batches(flag, batch_format="pyarrow")
        .groupby(["l_returnflag", "edge_ok16"])
        .aggregate(Count(alias_name="cnt"))
    )


Q_EDGE_FILTER_SQL = f"""
WITH p AS ({_LI_SQL})
SELECT l_returnflag,
  ((2*m1 - 30) - 256 * floor((2*m1 - 30) / 256.0)) BETWEEN 16 AND 239
    AND ((2*m2 + 10) - 256 * floor((2*m2 + 10) / 256.0)) BETWEEN 16 AND 239 AS edge_ok16,
  CAST(COUNT(*) AS BIGINT) AS cnt
FROM p GROUP BY 1, 2
"""


def _part_points(sf_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = t["p_partkey"].to_numpy().astype(np.int64)
    fx = ((pk * 48271) % M26) / W18
    fy = ((pk * 16807) % M26) / W18
    return pk, fx, fy

_PART_SQL = (
    "SELECT p_partkey, ((p_partkey * 48271) % 67108864) / 262144.0 AS fx, "
    "((p_partkey * 16807) % 67108864) / 262144.0 AS fy FROM part"
)


def q_knn(sf_dir: str):
    """Brute-force-exact kNN (k=3) of a query subset against the
    broadcast feature points; squared web distances are dyadic ->
    bit-exact ranking in both engines. (The cell-ring-expansion kNN
    actor is equivalence-tested against brute force in pytest.)"""
    import pandas as pd
    import ray

    pk, fx, fy = _part_points(sf_dir)
    ref = ray.put((pk, fx, fy))
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def subset(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 97 == 0
        return pa.table(
            {"pid": pa.array(p["pid"][sel]), "wx": pa.array(p["wx"][sel]),
             "wy": pa.array(p["wy"][sel])}
        )

    # (orderkey, linenumber) is NOT unique in the synthetic lineitem:
    # dedup pids before the kNN. pid determines (wx, wy), so dedup is a
    # NATIVE aggregate (Min of identical values) — no per-group Python
    from ray.data.aggregate import Min

    queries = (
        ds.map_batches(subset, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Min("wx", alias_name="wx"), Min("wy", alias_name="wy"))
    )

    def knn(batch: pa.Table) -> pa.Table:
        fpk, fwx, fwy = ray.get(ref)
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        wx = batch["wx"].to_numpy(zero_copy_only=False)
        wy = batch["wy"].to_numpy(zero_copy_only=False)
        if len(pid) == 0:
            return pa.table(
                {"pid": pa.array([], pa.int64()), "rank": pa.array([], pa.int64()),
                 "p_partkey": pa.array([], pa.int64()), "d2": pa.array([], pa.float64())}
            )
        d2 = (wx[:, None] - fwx[None, :]) ** 2 + (wy[:, None] - fwy[None, :]) ** 2
        # top-3 by (d2, p_partkey)
        order = np.lexsort((np.broadcast_to(fpk, d2.shape), d2), axis=1)[:, :3]
        rows = len(pid)
        return pa.table(
            {
                "pid": pa.array(np.repeat(pid, 3)),
                "rank": pa.array(np.tile(np.arange(1, 4, dtype=np.int64), rows)),
                "p_partkey": pa.array(fpk[order].ravel()),
                "d2": pa.array(np.take_along_axis(d2, order, axis=1).ravel()),
            }
        )

    return queries.map_batches(knn, batch_format="pyarrow")


Q_KNN_SQL = f"""
WITH p AS ({_LI_SQL}), f AS ({_PART_SQL}),
q AS (SELECT DISTINCT pid, m1 / 262144.0 AS wx, m2 / 262144.0 AS wy FROM p WHERE pid % 97 = 0),
d AS (
  SELECT q.pid, f.p_partkey,
    (q.wx - f.fx) * (q.wx - f.fx) + (q.wy - f.fy) * (q.wy - f.fy) AS d2,
    ROW_NUMBER() OVER (PARTITION BY q.pid ORDER BY
      (q.wx - f.fx) * (q.wx - f.fx) + (q.wy - f.fy) * (q.wy - f.fy), f.p_partkey) AS rank
  FROM q CROSS JOIN f
)
SELECT pid, CAST(rank AS BIGINT) AS rank, p_partkey, d2 FROM d WHERE rank <= 3
"""


def q_range_join(sf_dir: str):
    """Spatial range join: query points vs broadcast feature boxes
    (half-open containment), all comparisons dyadic-exact."""
    import ray

    pk, fx, fy = _part_points(sf_dir)
    h = (1 + pk % 8).astype(np.float64)
    ref = ray.put((pk, fx, fy, h))
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def subset(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 13 == 0
        return pa.table(
            {"pid": pa.array(p["pid"][sel]), "wx": pa.array(p["wx"][sel]),
             "wy": pa.array(p["wy"][sel])}
        )

    from ray.data.aggregate import Min

    queries = (
        ds.map_batches(subset, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Min("wx", alias_name="wx"), Min("wy", alias_name="wy"))
    )

    def join(batch: pa.Table) -> pa.Table:
        fpk, bx, by, bh = ray.get(ref)
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        wx = batch["wx"].to_numpy(zero_copy_only=False)
        wy = batch["wy"].to_numpy(zero_copy_only=False)
        hit = (
            (wx[:, None] >= bx[None, :] - bh[None, :])
            & (wx[:, None] < bx[None, :] + bh[None, :])
            & (wy[:, None] >= by[None, :] - bh[None, :])
            & (wy[:, None] < by[None, :] + bh[None, :])
        )
        qi, fi = np.nonzero(hit)
        return pa.table({"pid": pa.array(pid[qi]), "p_partkey": pa.array(fpk[fi])})

    return queries.map_batches(join, batch_format="pyarrow")


Q_RANGE_JOIN_SQL = f"""
WITH p AS ({_LI_SQL}), f AS ({_PART_SQL}),
q AS (SELECT DISTINCT pid, m1 / 262144.0 AS wx, m2 / 262144.0 AS wy FROM p WHERE pid % 13 = 0),
b AS (SELECT p_partkey, fx, fy, CAST(1 + p_partkey % 8 AS DOUBLE) AS h FROM f)
SELECT q.pid, b.p_partkey
FROM q, b
WHERE q.wx >= b.fx - b.h AND q.wx < b.fx + b.h
  AND q.wy >= b.fy - b.h AND q.wy < b.fy + b.h
"""


def q_negative_pool(sf_dir: str):
    """Complement sampling as dataflow: res-9 cell universe minus
    occupied cells, 200 hash-smallest survivors (the engine's seeded
    replacement for MercatorPainter.random_negative,
    lib/helpers.py:157-215)."""
    import ray
    import ray.data

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def occ(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        key = (p["m1"] >> 17) * 512 + (p["m2"] >> 17)
        return pa.table({"key": pa.array(np.unique(key))})

    occupied = np.unique(
        ds.map_batches(occ, batch_format="pyarrow").to_pandas()["key"].to_numpy()
    )
    occ_ref = ray.put(occupied)

    def free_keys(batch: pa.Table) -> pa.Table:
        k = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[~np.isin(k, ray.get(occ_ref))]
        return pa.table({"key": pa.array(k), "h": pa.array((k * 2654435761) % 1000000007)})

    sample = (
        ray.data.range(512 * 512)
        .map_batches(free_keys, batch_format="pyarrow")
        .sort(["h", "key"])
        .limit(200)
    )
    return sample


Q_NEGATIVE_POOL_SQL = f"""
WITH p AS ({_LI_SQL}),
occ AS (SELECT DISTINCT (m1 // 131072) * 512 + (m2 // 131072) AS key FROM p),
u AS (SELECT range AS key FROM range(262144)),
free AS (SELECT key, (key * 2654435761) % 1000000007 AS h FROM u
         WHERE key NOT IN (SELECT key FROM occ))
SELECT key, h FROM free ORDER BY h, key LIMIT 200
"""


# ---------------------------------------------------------------------------
# documents / text queries
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    from osmray.dedup import exact_dedup

    return exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))


Q_DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_md5, CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY 1
"""


def q_doc_stats(sf_dir: str):
    from osmray.text import quality_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_stats, batch_format="pyarrow").select_columns(
        ["doc_id", "n_tokens", "n_punct", "n_chars_actual"]
    )


Q_DOC_STATS_SQL = """
SELECT doc_id,
  CAST(len(list_filter(str_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
  CAST(length(text) - length(regexp_replace(text, '[.,!?]', '', 'g')) AS BIGINT) AS n_punct,
  CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents
"""


def q_lang_count(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="cnt"), Sum("n_chars", alias_name="sum_chars")
    )


Q_LANG_COUNT_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


def q_top_docs(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars", "lang"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


Q_TOP_DOCS_SQL = """
SELECT doc_id, n_chars, lang FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# events / orders queries
# ---------------------------------------------------------------------------


def q_events_window(sf_dir: str):
    """Tumbling 1-hour window aggregate (streaming-shaped workload:
    event-time bucketing via integer arithmetic)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = (us // 1_000_000) // 3600
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
            np.int64
        )
        return pa.table(
            {"event_type": batch["event_type"], "bucket": pa.array(b), "cents": pa.array(cents)}
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .aggregate(Count(alias_name="cnt"), Sum("cents", alias_name="sum_cents"))
    )


Q_EVENTS_WINDOW_SQL = """
SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS bucket,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def q_distinct_count(sf_dir: str):
    """Exact distinct count per group, hash-partitioned: (flag, pid)
    pairs are locally deduped, then spilled into hash(pid) buckets
    straight from ``map_batches`` (the grace pattern — NO Ray shuffle
    of the pair table); one task per bucket counts its exact distinct
    pids per flag (buckets partition pids, so per-flag counts sum);
    a tiny per-flag combine finishes. Replaces a full sort-based
    groupby over every pair."""
    import glob as _glob
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])
    from osmray.joins import _resolve_spill

    spill = _resolve_spill(None, "distinct")
    n_buckets = 32

    def spill_pairs(batch: pa.Table) -> pa.Table:
        import pandas as pd

        p = _li_points(batch)
        df = pd.DataFrame(
            {"l_returnflag": batch["l_returnflag"].to_pylist(), "pid": p["pid"]}
        ).drop_duplicates()
        b = (df["pid"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        t = pa.Table.from_pandas(df, preserve_index=False)
        order = np.argsort(b, kind="stable")
        t = t.take(pa.array(order))
        bs = b[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(bs)) + 1, [len(bs)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"b={int(bs[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"block-{uuid.uuid4().hex}.parquet")
            pq.write_table(t.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"b": int(bs[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    ds.map_batches(spill_pairs, batch_format="pyarrow", batch_size=None).count()

    def count_bucket(batch: pa.Table) -> pa.Table:
        flags, counts = [], []
        for b in batch["b"].to_pylist():
            files = sorted(_glob.glob(os.path.join(spill, f"b={b}", "block-*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            fl = np.asarray(t["l_returnflag"].to_pylist())
            pid = t["pid"].to_numpy(zero_copy_only=False)
            for f in np.unique(fl):
                flags.append(str(f))
                counts.append(int(np.unique(pid[fl == f]).size))
        return pa.table(
            {
                "l_returnflag": pa.array(flags, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    buckets = ray.data.from_items([{"b": b} for b in range(n_buckets)])
    per_bucket = buckets.map_batches(count_bucket, batch_format="pyarrow", batch_size=1)
    return per_bucket.groupby("l_returnflag").aggregate(
        Sum("n", alias_name="n_distinct_pids")
    )


Q_DISTINCT_COUNT_SQL = """
SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey * 10 + l_linenumber) AS BIGINT)
  AS n_distinct_pids
FROM lineitem GROUP BY 1
"""


def q_events_hop(sf_dir: str):
    """Hopping-window aggregate (size 1 h, hop 15 min): each event
    explodes into exactly size/hop = 4 overlapping windows (the 1->k
    flat-map form of windowing), then one keyed aggregate. Window ids
    are integer hop starts — exact in both engines."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        sec = us // 1_000_000
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(
            np.int64
        )
        k = np.arange(4, dtype=np.int64)
        wstart = ((sec // 900)[:, None] - k[None, :]) * 900  # (n, 4)
        n = len(sec)
        idx = np.repeat(np.arange(n), 4)
        et = batch["event_type"].take(pa.array(idx))
        return pa.table(
            {
                "event_type": et,
                "wstart": pa.array(wstart.ravel()),
                "cents": pa.array(np.repeat(cents, 4)),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "wstart"])
        .aggregate(Count(alias_name="cnt"), Sum("cents", alias_name="sum_cents"))
    )


Q_EVENTS_HOP_SQL = """
SELECT event_type,
  (CAST(floor(epoch(ts)) AS BIGINT) // 900 - k.k) * 900 AS wstart,
  CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3])::BIGINT AS k) k
GROUP BY 1, 2
"""


def q_hll(sf_dir: str):
    """HyperLogLog registers for distinct users per event_type: the
    distributed cardinality sketch (map-side partial registers, one
    keyed Max groupby — at most groups x 1024 tiny int rows shuffle).
    The register table is hash-checked bit-exact vs SQL (the 62-bit
    avalanche mixer runs identically in both engines); the ESTIMATE
    accuracy (0.5-2 %) is pytest-pinned."""
    from osmray.sketch import hll_registers

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_registers(ds, "event_type", "user_id")


def _hll_sql() -> str:
    from osmray.sketch import HLL_C1, HLL_C2, HLL_P

    m62 = 1 << 62
    return f"""
WITH s1 AS (
  SELECT event_type, CAST((CAST(xor(user_id, user_id >> 31) AS HUGEINT) * {HLL_C1}) % {m62} AS BIGINT) AS h
  FROM events
),
s2 AS (SELECT event_type, CAST((CAST(xor(h, h >> 29) AS HUGEINT) * {HLL_C2}) % {m62} AS BIGINT) AS h FROM s1),
hx AS (SELECT event_type, xor(h, h >> 32) AS h FROM s2),
br AS (
  SELECT event_type, h & {(1 << HLL_P) - 1} AS bucket, h >> {HLL_P} AS rest FROM hx
),
p2 AS (SELECT unnest(generate_series(0, 51))::BIGINT AS k,
              unnest(list_transform(generate_series(0, 51), x -> 1::BIGINT << x)) AS v),
rho_t AS (
  SELECT event_type, bucket,
    CASE WHEN rest = 0 THEN {62 - HLL_P + 1} ELSE p2.k + 1 END AS rho
  FROM br LEFT JOIN p2 ON (rest & (-rest)) = p2.v
)
SELECT event_type, bucket, max(rho) AS rho_max FROM rho_t GROUP BY event_type, bucket
"""


Q_HLL_SQL = _hll_sql()


def q_stratified_sample(sf_dir: str):
    """Stratified sampling: a deterministic fixed-size sample (k=20)
    PER GROUP (returnflag), ranked by a salted hash of the row key —
    the per-group analogue of q_sample_hash (no RNG, rerun-stable,
    one keyed shuffle of key+hash rows only)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_returnflag"])

    def keyed(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        h = (p["pid"] * 2654435761 + 97) % 2147483647
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "pid": pa.array(p["pid"]),
                "h": pa.array(h),
            }
        )

    def pick(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), ("pid", "ascending")])
        return g.take(idx[:20]).select(["l_returnflag", "pid", "h"])

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("l_returnflag")
        .map_groups(pick, batch_format="pyarrow")
    )


Q_STRATIFIED_SAMPLE_SQL = """
WITH p AS (
  SELECT l_returnflag, l_orderkey * 10 + l_linenumber AS pid,
    ((l_orderkey * 10 + l_linenumber) * 2654435761 + 97) % 2147483647 AS h
  FROM lineitem
),
r AS (
  SELECT l_returnflag, pid, h,
    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h, pid) AS rn
  FROM p
)
SELECT l_returnflag, pid, h FROM r WHERE rn <= 20
"""


def q_group_median(sf_dir: str):
    """Exact per-group quantiles (median + p90 of l_quantity per
    returnflag) — discrete quantiles pick an ACTUAL element (rank
    ceil(q*n) of the sorted run), so both engines agree exactly.
    Scale path: ``tableops.grouped_order_stats`` (one distributed
    sort by (flag, qty); interior key-runs resolve in-block, edge
    runs via O(#blocks) driver offsets) — no task holds a whole
    group, so a 3-value flag over 100 TB never lands in one sort."""
    import pandas as pd

    from osmray.tableops import grouped_order_stats

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    st = grouped_order_stats(ds, "l_returnflag", "l_quantity", [50, 90]).to_pandas()
    wide = st.pivot(index="l_returnflag", columns="p", values="value")
    n = st.groupby("l_returnflag")["n"].max()
    return pd.DataFrame({
        "l_returnflag": wide.index,
        "median_qty": wide[50].astype(np.int64).to_numpy(),
        "p90_qty": wide[90].astype(np.int64).to_numpy(),
        "n": n.loc[wide.index].astype(np.int64).to_numpy(),
    }).reset_index(drop=True)


Q_GROUP_MEDIAN_SQL = """
SELECT l_returnflag,
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS median_qty,
  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS p90_qty,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
"""


def q_mad(sf_dir: str):
    """Robust outlier scale: per-group MAD (median absolute deviation
    from the median), the two-pass exact-order-statistic composition —
    pass 1 computes each group's discrete median (an actual element,
    so integer-exact), pass 2 re-scans with the medians attached and
    takes the discrete median of |x - med|. Medians are one tiny row
    per group, broadcast into pass 2. Both passes run through
    ``tableops.grouped_order_stats`` (distributed sort + in-block
    interior runs + O(#blocks) edge offsets) so no task ever holds a
    whole group. The SQL twin is percentile_disc over the same
    join."""
    import pandas as pd

    from osmray.tableops import grouped_order_stats

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    m1 = grouped_order_stats(ds, "l_returnflag", "l_quantity", [50]).to_pandas()
    meds = dict(zip(m1["l_returnflag"], m1["value"].astype(int)))

    def dev(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = batch["l_returnflag"].to_pylist()
        m = np.array([meds[x] for x in f], np.int64)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "dev": pa.array(np.abs(q - m))})

    devs = ds.map_batches(dev, batch_format="pyarrow")
    m2 = grouped_order_stats(devs, "l_returnflag", "dev", [50]).to_pandas()
    return pd.DataFrame({
        "l_returnflag": m2["l_returnflag"],
        "median_qty": m2["l_returnflag"].map(meds).astype(np.int64),
        "mad_qty": m2["value"].astype(np.int64),
        "n": m2["n"].astype(np.int64),
    }).reset_index(drop=True)


Q_MAD_SQL = """
WITH m AS (
  SELECT l_returnflag, percentile_disc(0.5) WITHIN GROUP (
    ORDER BY CAST(l_quantity AS BIGINT)) AS med
  FROM lineitem GROUP BY 1
),
d AS (
  SELECT l.l_returnflag, m.med,
         abs(CAST(l.l_quantity AS BIGINT) - m.med) AS dev
  FROM lineitem l JOIN m USING (l_returnflag)
)
SELECT l_returnflag, CAST(max(med) AS BIGINT) AS median_qty,
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS BIGINT)
    AS mad_qty,
  CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY l_returnflag
"""


def q_inverted_index(sf_dir: str):
    """Inverted-index build over documents: exploded postings
    (term, doc_id, tf) + per-term document frequency — the text-index
    primitive (token explode is the flat-map, df is the keyed
    aggregate; at scale the posting shuffle is keys+counts only)."""
    from ray.data.aggregate import Count, Sum

    from osmray.dedup import _TOKEN

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_t, out_d, out_c = [], [], []
        for i, t in enumerate(batch["text"].to_pylist()):
            toks = _TOKEN.findall(t.lower())
            if not toks:
                continue
            u, c = np.unique(toks, return_counts=True)
            out_t.append(u)
            out_d.append(np.full(len(u), ids[i], dtype=np.int64))
            out_c.append(c.astype(np.int64))
        if not out_t:
            return pa.table(
                {"term": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "term": pa.array(np.concatenate(out_t)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "tf": pa.array(np.concatenate(out_c)),
            }
        )

    posts = ds.map_batches(postings, batch_format="pyarrow")
    return posts.groupby("term").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="total_tf")
    )


Q_INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS total_tf
FROM tf GROUP BY term
"""


def q_sample_hash(sf_dir: str):
    """Deterministic ~5 % sample (seeded-hash filter — reproducible at
    any parallelism, the engine's random_sample)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def f(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((k * 2654435761) % 1000000 < 50000))

    return ds.map_batches(f, batch_format="pyarrow")


Q_SAMPLE_HASH_SQL = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE (o_orderkey * 2654435761) % 1000000 < 50000
"""


def q_split_counts(sf_dir: str):
    """Deterministic train/valid split sizes (make_expand's 4000/1000
    protocol as hash dataflow)."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def f(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = np.where((k * 2654435761) % 1000 < 800, "train", "valid")
        return pa.table({"split": pa.array(split, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow").groupby("split").aggregate(
        Count(alias_name="cnt")
    )


Q_SPLIT_COUNTS_SQL = """
SELECT CASE WHEN (o_orderkey * 2654435761) % 1000 < 800 THEN 'train' ELSE 'valid' END AS split,
  CAST(COUNT(*) AS BIGINT) AS cnt
FROM orders GROUP BY 1
"""


def q_union_distinct(sf_dir: str):
    """Union + distinct (make_roofshapes' two-city union,
    make_roofshapes.py:22-24)."""
    import pyarrow.compute as pc

    high = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 150000.0)).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    pri = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count

    return (
        high.union(pri).groupby("o_orderkey").aggregate(Count(alias_name="n_sources"))
    )


Q_UNION_DISTINCT_SQL = """
SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_sources FROM (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
) GROUP BY 1
"""


def q_hash_join(sf_dir: str):
    """Broadcast hash join (the reference's node-id->coords dict join,
    lib/loaders.py:52-61, as dataflow): orders x customer nation key."""
    import ray
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    lut_ref = ray.put(
        dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    )
    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def join(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        ck = batch["o_custkey"].to_pylist()
        nk = np.asarray([lut.get(c, -1) for c in ck], dtype=np.int64)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        t = pa.table({"c_nationkey": pa.array(nk), "cents": pa.array(cents)})
        return t.filter(pa.array(nk >= 0))

    return (
        ds.map_batches(join, batch_format="pyarrow")
        .groupby("c_nationkey")
        .aggregate(Count(alias_name="cnt"), Sum("cents", alias_name="sum_cents"))
    )


Q_HASH_JOIN_SQL = """
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_large_join(sf_dir: str):
    """Both-sides-large hash join: lineitem x orders on orderkey via
    Ray's hash-partitioned Dataset.join, then an integer aggregate per
    order status."""
    from ray.data.aggregate import Count, Sum

    from osmray.joins import large_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "qty": pa.array(
                    batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = large_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_partitions=8,
    )
    return joined.groupby("o_orderstatus").aggregate(
        Count(alias_name="cnt"), Sum("qty", alias_name="sum_qty")
    )


Q_LARGE_JOIN_SQL = """
SELECT o.o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


def q_bucketed_join(sf_dir: str):
    """The explicit portable hash join (bucket + cogroup + per-bucket
    merge) over the same inputs — must agree with q_large_join's SQL."""
    from ray.data.aggregate import Count, Sum

    from osmray.joins import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "qty": pa.array(
                    batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = bucketed_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        num_buckets=64,
    )
    return joined.groupby("o_orderstatus").aggregate(
        Count(alias_name="cnt"), Sum("qty", alias_name="sum_qty")
    )


def q_semi_join_large(sf_dir: str):
    """Unbounded tile semi-join: image points whose z18 tile contains
    ANY feature point — both sides as Datasets through the
    hash-partitioned join (the non-broadcast path for when the painted
    set is not collectible). Emits distinct matching pids."""
    from ray.data.aggregate import Count

    from osmray.joins import large_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def img_tiles(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        # coarse cells (res-8-equivalent grid) so the join has hits
        tile = (p["m1"] >> 18) * 100_000 + (p["m2"] >> 18)
        return pa.table({"pid": pa.array(p["pid"]), "tile": pa.array(tile)})

    part = _read(sf_dir, "part", ["p_partkey"])

    def feat_tiles(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        fx = (pk * 48271) % M26
        fy = (pk * 16807) % M26
        tile = (fx >> 18) * 100_000 + (fy >> 18)
        return pa.table({"ftile": pa.array(np.unique(tile))})

    feats = (
        part.map_batches(feat_tiles, batch_format="pyarrow")
        .groupby("ftile")
        .aggregate(Count(alias_name="nf"))
    )
    joined = large_join(
        li.map_batches(img_tiles, batch_format="pyarrow"),
        feats,
        on="tile",
        right_on="ftile",
        num_partitions=8,
    )
    return joined.groupby("pid").aggregate(Count(alias_name="n_hits"))


Q_SEMI_JOIN_LARGE_SQL = f"""
WITH p AS ({_LI_SQL}),
img AS (SELECT pid, (m1 // 262144) * 100000 + (m2 // 262144) AS tile FROM p),
f AS (SELECT DISTINCT ((p_partkey * 48271) % 67108864 // 262144) * 100000
        + ((p_partkey * 16807) % 67108864 // 262144) AS tile FROM part)
SELECT img.pid, CAST(COUNT(*) AS BIGINT) AS n_hits
FROM img JOIN f ON img.tile = f.tile
GROUP BY img.pid
"""


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for 5 query vectors (ANN baseline);
    output ranks only (integers) — similarity VALUES may differ by ulps
    between summation orders, ranks must not."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    import pyarrow.compute as pc

    qdf = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    queries = np.asarray(qdf["embedding"].tolist(), dtype=np.float64)

    from osmray.ann import cosine_topk

    out = cosine_topk(emb, queries, k=10)

    def clean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "rank": batch["rank"].cast(pa.int64()),
            }
        )

    return out.map_batches(clean, batch_format="pyarrow")


Q_ANN_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
d AS (
  SELECT q.query_id, e.vec_id,
    ROW_NUMBER() OVER (PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) DESC, e.vec_id) AS rank
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank FROM d WHERE rank <= 10
"""


def q_way_resolve(sf_dir: str):
    """The OSM node-id -> coords resolve join (lib/loaders.py:52-61)
    as dataflow: synthetic ways (refs derived from orders keys) probed
    against the broadcast lineitem-derived node table; inner-join
    semantics, exploded (way_id, seq, node_id, wx, wy)."""
    import ray

    # node table: distinct pid -> (wx, wy)
    nds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def nodes(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"pid": pa.array(p["pid"]), "wx": pa.array(p["wx"]), "wy": pa.array(p["wy"])})

    # NO groupby dedup here: (wx, wy) is a pure function of pid, so
    # the duplicate (orderkey, linenumber) pairs in the testdata are
    # eliminated per bucket inside the grace join (right_dedup) —
    # zero extra shuffles instead of a ~600k-group aggregate
    node_ds = nds.map_batches(nodes, batch_format="pyarrow")

    ways = _read(sf_dir, "orders", ["o_orderkey"])

    def explode(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # each way references 4 candidate node ids: orderkey*10 + 1..4
        refs = (ok[:, None] * 10 + np.arange(1, 5)[None, :]).ravel()
        return pa.table(
            {
                "way_id": pa.array(np.repeat(ok, 4)),
                "seq": pa.array(np.tile(np.arange(1, 5, dtype=np.int64), len(ok))),
                "node_id": pa.array(refs),
            }
        )

    # refs exploded as a Dataset, resolved via the grace hash join —
    # the node table spills per-bucket from map_batches (no shuffle)
    # and only the exploded refs shuffle once; neither side is
    # materialized on the driver (the round-1 broadcast-array variant
    # lives on in sources.resolve_ways for genuinely small node tables)
    from osmray.joins import bucketed_join

    joined = bucketed_join(
        ways.map_batches(explode, batch_format="pyarrow"),
        node_ds,
        on="node_id",
        right_on="pid",
        num_buckets=64,
        right_dedup=True,
    )
    return joined.select_columns(["way_id", "seq", "node_id", "wx", "wy"])


Q_WAY_RESOLVE_SQL = f"""
WITH p AS ({_LI_SQL}),
n AS (SELECT DISTINCT pid, m1 / 262144.0 AS wx, m2 / 262144.0 AS wy FROM p),
w AS (SELECT o_orderkey AS way_id, i.range AS seq, o_orderkey * 10 + i.range AS node_id
      FROM orders CROSS JOIN range(1, 5) i)
SELECT w.way_id, w.seq, w.node_id, n.wx, n.wy
FROM w JOIN n ON w.node_id = n.pid
"""


def q_sessionize(sf_dir: str):
    """Session windows over the events stream: a new session starts
    after a >30 min gap per user; emits per-user session counts +
    event counts (ordered, partitioned window — the streaming-shaped
    op, SURVEY §2.9 note). Uses the map_groups path: the events table
    has FEW fat keys (~1.5k users at sf1), where per-group Python
    beats a global sort (measured 1.55s vs 3.48s at sf0.1). The
    sort-based option for many-small-keys regimes is
    ``windows.sessionize_sorted`` — same oracle, pytest-pinned equal
    to ``sessionize_groups`` below."""
    return sessionize_groups(_read(sf_dir, "events", ["user_id", "ts"]))


def sessionize_groups(ds):
    """map_groups reference twin of windows.sessionize_sorted."""

    def per_user(g: pa.Table) -> pa.Table:
        us = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        us.sort()
        n_sessions = 1 + int((np.diff(us) > 1800).sum())
        return pa.table(
            {
                "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
                "n_sessions": pa.array([n_sessions], pa.int64()),
                "n_events": pa.array([len(us)], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


_SCD2_SENTINEL = 32503680000000000  # year ~3000 in microseconds


def q_scd2(sf_dir: str):
    """SCD type-2 dimension build from a change stream: per user, the
    event_type history collapses into validity intervals
    (value, valid_from, valid_to), current rows closed by a fixed far-
    future sentinel — the warehouse dimension-table primitive. Same
    few-fat-keys regime as q_sessionize, so the map_groups path: one
    keyed shuffle, a vectorized per-group change-point scan, O(group)
    state. The SQL twin is lag-compare segment starts + lead close."""
    def per_user(g: pa.Table) -> pa.Table:
        us = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((eid, us))
        us, eid, et = us[order], eid[order], et[order]
        change = np.concatenate(([True], et[1:] != et[:-1]))
        starts = us[change]
        ends = np.concatenate((starts[1:],
                               [np.int64(_SCD2_SENTINEL)])).astype(np.int64)
        n = int(change.sum())
        return pa.table({
            "user_id": pa.array(np.repeat(
                g["user_id"][0].as_py(), n).astype(np.int64)),
            "event_type": pa.array(et[change], pa.string()),
            "valid_from_us": pa.array(starts),
            "valid_to_us": pa.array(ends)})

    return (_read(sf_dir, "events", ["user_id", "event_id", "ts",
                                     "event_type"])
            .groupby("user_id").map_groups(per_user, batch_format="pyarrow"))


Q_SCD2_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
    CAST(epoch_us(ts) AS BIGINT) AS us,
    lag(event_type) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS prev
  FROM events
),
seg AS (
  SELECT user_id, event_id, event_type, us
  FROM e WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, us AS valid_from_us,
  coalesce(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id),
           {_SCD2_SENTINEL}) AS valid_to_us
FROM seg
"""


def q_late_events(sf_dir: str):
    """Streaming watermark accounting: replaying the stream in
    arrival order (event_id), an event is LATE if its timestamp falls
    behind the high-water mark (max ts seen so far) by more than the
    allowed lateness (300 s) — the at-ingest bookkeeping every
    event-time window needs. Distributed prefix-max: sort by arrival,
    one row of (first_id, max_ts) per block, an O(#blocks) driver
    fold of incoming offsets, then a per-block vectorized prefix max;
    per-type late/total counts. The SQL twin is a running-max window
    over arrival order."""
    from ray.data.aggregate import Sum

    lateness_us = 300_000_000
    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    sds = ds.sort("event_id").materialize()

    def block_head(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "max_ts": pa.array([], pa.int64())})
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"first_id": pa.array([int(eid[0])]),
                         "max_ts": pa.array([int(us.max())])})

    heads = sds.map_batches(block_head, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    heads = heads.sort_values("first_id").reset_index(drop=True)
    incoming = {}
    run = None
    for _, row in heads.iterrows():
        incoming[int(row["first_id"])] = run
        run = int(row["max_ts"]) if run is None else max(
            run, int(row["max_ts"]))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "late": pa.array([], pa.int64()),
                             "one": pa.array([], pa.int64())})
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        inc = incoming.get(int(eid[0]))
        # watermark BEFORE each event: shift the prefix max by one
        pm = np.maximum.accumulate(us)
        # -(1<<62): "no watermark yet" — still safe to subtract the
        # lateness from without int64 wraparound
        before = np.concatenate((
            [-(1 << 62) if inc is None else inc], pm[:-1]))
        if inc is not None:
            before = np.maximum(before, inc)
        late = (us < before - lateness_us).astype(np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "late": pa.array(late),
                         "one": pa.array(np.ones(len(us), np.int64))})

    return (sds.map_batches(score, batch_format="pyarrow", batch_size=None)
            .groupby("event_type")
            .aggregate(Sum("late", alias_name="n_late"),
                       Sum("one", alias_name="n_total")))


def q_dod_stats(sf_dir: str):
    """Gorilla-style timestamp compression planning: per user the
    delta-of-delta of the sorted event times buckets into the
    published bit classes (0 -> 1 bit, |dod| in (0, 64) -> 9,
    < 256 -> 12, < 2048 -> 16, else 36), and the op reports per-user
    bucket counts + the exact compressed bit total — the storage
    estimate a time-series engine needs before choosing a codec.
    Few-fat-keys regime: one keyed shuffle, vectorized double-diff
    per group. The SQL twin double-lags in seconds."""
    def per_user(g: pa.Table) -> pa.Table:
        us = np.sort(g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        sec = us // 1_000_000
        dod = np.diff(sec, n=2) if len(sec) >= 3 else np.empty(0, np.int64)
        a = np.abs(dod)
        b0 = int((a == 0).sum())
        b1 = int(((a > 0) & (a < 64)).sum())
        b2 = int(((a >= 64) & (a < 256)).sum())
        b3 = int(((a >= 256) & (a < 2048)).sum())
        b4 = int((a >= 2048).sum())
        bits = b0 * 1 + b1 * 9 + b2 * 12 + b3 * 16 + b4 * 36
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "b_zero": pa.array([b0], pa.int64()),
            "b_small": pa.array([b1], pa.int64()),
            "b_med": pa.array([b2], pa.int64()),
            "b_large": pa.array([b3], pa.int64()),
            "b_huge": pa.array([b4], pa.int64()),
            "total_bits": pa.array([bits], pa.int64())})

    return (_read(sf_dir, "events", ["user_id", "ts"])
            .groupby("user_id").map_groups(per_user, batch_format="pyarrow"))


Q_DOD_STATS_SQL = """
WITH e AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) // 1000000 AS sec,
         CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events
),
d AS (
  SELECT user_id,
    sec - 2 * lag(sec, 1) OVER w + lag(sec, 2) OVER w AS dod,
    lag(sec, 2) OVER w AS ok
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, sec)
),
b AS (
  SELECT user_id, abs(dod) AS a FROM d WHERE ok IS NOT NULL
),
agg AS (
  SELECT user_id,
    sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS b_zero,
    sum(CASE WHEN a > 0 AND a < 64 THEN 1 ELSE 0 END) AS b_small,
    sum(CASE WHEN a >= 64 AND a < 256 THEN 1 ELSE 0 END) AS b_med,
    sum(CASE WHEN a >= 256 AND a < 2048 THEN 1 ELSE 0 END) AS b_large,
    sum(CASE WHEN a >= 2048 THEN 1 ELSE 0 END) AS b_huge
  FROM b GROUP BY user_id
)
SELECT u.user_id, CAST(coalesce(b_zero, 0) AS BIGINT) AS b_zero,
  CAST(coalesce(b_small, 0) AS BIGINT) AS b_small,
  CAST(coalesce(b_med, 0) AS BIGINT) AS b_med,
  CAST(coalesce(b_large, 0) AS BIGINT) AS b_large,
  CAST(coalesce(b_huge, 0) AS BIGINT) AS b_huge,
  CAST(coalesce(b_zero * 1 + b_small * 9 + b_med * 12 + b_large * 16
                + b_huge * 36, 0) AS BIGINT) AS total_bits
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN agg ON agg.user_id = u.user_id
"""


Q_LATE_EVENTS_SQL = """
WITH e AS (
  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
    max(CAST(epoch_us(ts) AS BIGINT)) OVER (
      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS wm
  FROM events
)
SELECT event_type,
  CAST(sum(CASE WHEN wm IS NOT NULL AND us < wm - 300000000
           THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
  CAST(count(*) AS BIGINT) AS n_total
FROM e GROUP BY event_type
"""


Q_SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
            - LAG(CAST(floor(epoch(ts)) AS BIGINT), 1, -10000000000)
              OVER (PARTITION BY user_id ORDER BY ts) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id
"""


def q_running_sum(sf_dir: str):
    """Cumulative per-key window: running event-count and value-cents
    per user in ts order (first 3 events per user emitted). Uses the
    map_groups path (few fat keys — measured 0.95s vs the sorted
    path's 1.91s at sf0.1); ``windows.running_sum_sorted`` is the
    many-small-keys option, pytest-pinned equal."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return running_sum_groups(ds).select_columns(
        ["event_id", "user_id", "row_n", "running_cents"]
    )


def running_sum_groups(ds):
    """map_groups reference twin of windows.running_sum_sorted."""
    import pyarrow.compute as pc

    def per_user(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])
        g = g.take(idx)
        cents = np.floor(
            g["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        run = np.cumsum(cents)
        n = min(3, len(g))
        return pa.table(
            {
                "event_id": g["event_id"].slice(0, n),
                "user_id": g["user_id"].slice(0, n),
                "row_n": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "running_cents": pa.array(run[:n], pa.int64()),
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


Q_RUNNING_SUM_SQL = """
WITH e AS (
  SELECT event_id, user_id,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS row_n,
    SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS running_cents
  FROM events
)
SELECT event_id, user_id, CAST(row_n AS BIGINT) AS row_n,
       CAST(running_cents AS BIGINT) AS running_cents
FROM e WHERE row_n <= 3
"""


def q_topk_per_group(sf_dir: str):
    """Top-2 orders per customer by (totalprice desc, orderkey) — the
    grouped top-k window. Sort-based (windows.grouped_topk_sorted):
    complete in-block runs emit vectorized, only block-boundary keys
    hit the per-key fix-up, so merge group count is O(#blocks) not
    O(#customers) — measured 1.9s vs 2.9s (map_groups) at sf0.1."""
    from osmray.windows import grouped_topk_sorted

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return grouped_topk_sorted(
        ds, key="o_custkey", val="o_totalprice", tiebreak="o_orderkey", k=2
    )


Q_TOPK_PER_GROUP_SQL = """
WITH r AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 2
"""


def q_pip_grid(sf_dir: str):
    """SQL-checkable point-in-polygon join through the REAL ray-cast
    kernel (geom.points_in_ring): lineitem-derived integer points vs
    diamond polygons derived from part keys.

    Exactness across engines is BY CONSTRUCTION: diamond vertices have
    all-even coordinates and every point has odd (x+y) parity, so no
    point ever lies on an edge line; with unit-slope edges the
    kernel's float crossing abscissa is within 1 ulp of an integer
    whose distance to the point is >= 1, so the float comparison
    equals exact arithmetic. The DuckDB twin uses the diamond's
    interior metric |dx| + |dy| < a (equivalent to even-odd ray-cast
    off the boundary) in pure integers."""
    import ray

    from osmray.geom import points_in_ring

    part = _read(sf_dir, "part", ["p_partkey"])

    def diamonds(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = pk[pk % 100 == 1]
        cx = 2 * ((pk * 48271) % (M26 // 2))
        cy = 2 * ((pk * 16807) % (M26 // 2))
        a = 2 * (500_000 + (pk % 5) * 200_000)
        return pa.table(
            {
                "poly_id": pa.array(pk),
                "cx": pa.array(cx),
                "cy": pa.array(cy),
                "a": pa.array(a),
            }
        )

    dtab = (
        part.map_batches(diamonds, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("poly_id")
    )  # bounded small side (p%100==1): broadcast
    ref = ray.put(
        (
            dtab["poly_id"].to_numpy(),
            dtab["cx"].to_numpy(),
            dtab["cy"].to_numpy(),
            dtab["a"].to_numpy(),
        )
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pip(batch: pa.Table) -> pa.Table:
        pid_, cx, cy, aa = ray.get(ref)
        p = _li_points(batch)
        px = 2 * (p["m1"] // 2) + 1  # odd
        py = 2 * (p["m2"] // 2)  # even -> x+y odd: never on an edge
        out_p, out_poly = [], []
        for j in range(len(pid_)):
            sel = np.flatnonzero(
                (np.abs(px - cx[j]) <= aa[j]) & (np.abs(py - cy[j]) <= aa[j])
            )
            if not len(sel):
                continue
            ring = np.array(
                [
                    [cy[j] + aa[j], cx[j]],
                    [cy[j], cx[j] + aa[j]],
                    [cy[j] - aa[j], cx[j]],
                    [cy[j], cx[j] - aa[j]],
                ],
                dtype=np.float64,
            )  # [lat, lng] = [y, x]
            hit = points_in_ring(
                py[sel].astype(np.float64), px[sel].astype(np.float64), ring
            )
            hs = sel[hit]
            out_p.append(p["pid"][hs])
            out_poly.append(np.full(len(hs), pid_[j], dtype=np.int64))
        if not out_p:
            return pa.table(
                {"pid": pa.array([], pa.int64()), "poly_id": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "pid": pa.array(np.concatenate(out_p)),
                "poly_id": pa.array(np.concatenate(out_poly)),
            }
        )

    return li.map_batches(pip, batch_format="pyarrow")


Q_PIP_GRID_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (SELECT pid, 2 * (m1 // 2) + 1 AS px, 2 * (m2 // 2) AS py FROM p),
d AS (SELECT p_partkey AS poly_id,
             2 * ((p_partkey * 48271) % 33554432) AS cx,
             2 * ((p_partkey * 16807) % 33554432) AS cy,
             2 * (500000 + (p_partkey % 5) * 200000) AS a
      FROM part WHERE p_partkey % 100 = 1)
SELECT pts.pid, d.poly_id
FROM pts JOIN d ON abs(pts.px - d.cx) + abs(pts.py - d.cy) < d.a
"""


def q_mosaic_parity(sf_dir: str):
    """The multi-tile mosaic gather/assemble/crop dataflow
    (mosaic.gather_crops — §2.3's viewport glue) hash-checked vs SQL:
    windows derived from orders keys are assembled from REAL
    PNG-encoded gradient tiles whose pixel value is a separable
    integer function v(X,Y,c) = A(tile,c) + f(X%%256) + g(Y%%256)
    with v < 256 (no wrap), so the decoded crop's pixel sum has a
    closed form DuckDB evaluates from tile-overlap areas plus two
    1-D generate_series sums."""
    import pyarrow.parquet as pq
    import ray.data

    from osmray import codecs
    from osmray.mosaic import gather_crops
    from osmray.tilemath import PLAIN

    t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    k = np.sort(t["o_orderkey"].to_numpy().astype(np.int64))
    k = k[k % 500 == 1]  # bounded request side
    w = 1 + k % 3
    h = 1 + (k // 3) % 3
    txmin = (k * 13) % 64
    tymin = (k * 17) % 64
    x0 = (k * 5) % 128
    y0 = (k * 7) % 128
    x1 = np.minimum(x0 + 64 + (k % 64) * w, 256 * w)
    y1 = np.minimum(y0 + 48 + (k % 48) * h, 256 * h)
    windows = pa.table(
        {
            "req_id": pa.array(k), "txmin": pa.array(txmin),
            "txmax": pa.array(txmin + w - 1), "tymin": pa.array(tymin),
            "tymax": pa.array(tymin + h - 1), "x0": pa.array(x0),
            "x1": pa.array(x1), "y0": pa.array(y0), "y1": pa.array(y1),
        }
    )
    tiles = sorted(
        {
            (int(txmin[i] + a), int(tymin[i] + b))
            for i in range(len(k))
            for a in range(int(w[i]))
            for b in range(int(h[i]))
        }
    )
    tiles_ds = ray.data.from_items([{"tx": tx, "ty": ty} for tx, ty in tiles])

    def render(batch: pa.Table) -> pa.Table:
        xs = np.arange(256)
        f = (xs // 64) * 4
        g = xs // 64
        out_id, out_b, out_key = [], [], []
        from osmray.tilemath import pack_tile

        for tx, ty in zip(batch["tx"].to_pylist(), batch["ty"].to_pylist()):
            base = ((tx * 7 + ty * 11 + np.arange(3)) % 8) * 16
            img = (
                base[None, None, :] + f[None, :, None] + g[:, None, None]
            ).astype(np.uint8)
            out_id.append(f"t{tx}_{ty}")
            out_b.append(codecs.encode(img, "png"))
            out_key.append(int(pack_tile(np.array([tx]), np.array([ty]), 10)[0]))
        return pa.table(
            {
                "image_id": pa.array(out_id, pa.string()),
                "tile_key": pa.array(out_key, pa.int64()),
                "bytes": pa.array(out_b, pa.binary()),
                "fmt": pa.array(["png"] * len(out_id), pa.string()),
            }
        )

    images_ds = tiles_ds.map_batches(render, batch_format="pyarrow")
    crops = gather_crops(images_ds, windows, z=10, scheme=PLAIN)

    def summarize(batch: pa.Table) -> pa.Table:
        sums = []
        for blob in batch["crop"].to_pylist():
            sums.append(int(codecs.png_decode(blob).astype(np.int64).sum()))
        return pa.table(
            {
                "req_id": batch["req_id"],
                "crop_h": batch["crop_h"].cast(pa.int64()),
                "crop_w": batch["crop_w"].cast(pa.int64()),
                "n_tiles": batch["n_tiles"].cast(pa.int64()),
                "pix_sum": pa.array(sums, pa.int64()),
            }
        )

    return crops.map_batches(summarize, batch_format="pyarrow")


Q_MOSAIC_PARITY_SQL = """
WITH kk AS (SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 500 = 1),
spec AS (
  SELECT k, 1 + k % 3 AS w, 1 + (k // 3) % 3 AS h,
         (k * 13) % 64 AS txmin, (k * 17) % 64 AS tymin,
         (k * 5) % 128 AS x0, (k * 7) % 128 AS y0
  FROM kk
),
spec2 AS (
  SELECT *, least(x0 + 64 + (k % 64) * w, 256 * w) AS x1,
         least(y0 + 48 + (k % 48) * h, 256 * h) AS y1
  FROM spec
),
ij AS (
  SELECT s.*, i.i, j.j,
    greatest(256 * i.i, s.x0) AS cx0, least(256 * (i.i + 1), s.x1) AS cx1,
    greatest(256 * j.j, s.y0) AS cy0, least(256 * (j.j + 1), s.y1) AS cy1
  FROM spec2 s,
  LATERAL (SELECT unnest(generate_series(0, s.w - 1)) AS i) i,
  LATERAL (SELECT unnest(generate_series(0, s.h - 1)) AS j) j
),
tilesum AS (
  SELECT k, sum((cx1 - cx0) * (cy1 - cy0) * (
    (((txmin + i) * 7 + (tymin + j) * 11 + 0) % 8) * 16 +
    (((txmin + i) * 7 + (tymin + j) * 11 + 1) % 8) * 16 +
    (((txmin + i) * 7 + (tymin + j) * 11 + 2) % 8) * 16)) AS s_base
  FROM ij WHERE cx1 > cx0 AND cy1 > cy0 GROUP BY k
),
fx AS (
  SELECT s.k, sum(((xx.x % 256) // 64) * 4) AS sf
  FROM spec2 s, LATERAL (SELECT unnest(generate_series(s.x0, s.x1 - 1)) AS x) xx
  GROUP BY s.k
),
gy AS (
  SELECT s.k, sum((yy.y % 256) // 64) AS sg
  FROM spec2 s, LATERAL (SELECT unnest(generate_series(s.y0, s.y1 - 1)) AS y) yy
  GROUP BY s.k
)
SELECT s.k AS req_id, (s.y1 - s.y0)::BIGINT AS crop_h, (s.x1 - s.x0)::BIGINT AS crop_w,
  (s.w * s.h)::BIGINT AS n_tiles,
  (t.s_base + 3 * (s.y1 - s.y0) * fx.sf + 3 * (s.x1 - s.x0) * gy.sg)::BIGINT AS pix_sum
FROM spec2 s JOIN tilesum t ON t.k = s.k JOIN fx ON fx.k = s.k JOIN gy ON gy.k = s.k
"""


def q_raster_parity(sf_dir: str):
    """The rasterizer itself hash-checked vs SQL: horizontal,
    vertical and unit-diagonal width-2 strokes derived from orders
    keys are drawn through the REAL pipeline kernels
    (raster.draw_polylines -> clipped_segment_walks -> stamp) onto
    256x256 canvases, and the distinct painted pixels are compared to
    a DuckDB closed form (a 4-connected walk of an axis-aligned
    stroke is a generate_series run; of a unit diagonal it alternates
    x-then-y — x wins ties — so pixel t is
    (x0 + ceil(t/2), y0 + floor(t/2)); the width-2 stamp is the
    cross-joined 2x2 offset, clipped to the canvas)."""
    from ray.data.aggregate import Count

    from osmray import raster

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def paint(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = ok[ok % 500 == 1]
        canvas = np.zeros((256, 256), dtype=np.uint8)
        polys = []
        for k in ok:
            x0 = int((k * 131) % 260) - 2  # slightly off-canvas too
            y0 = int((k * 173) % 260) - 2
            ln = int(40 + k % 97)
            kind = k % 3
            if kind == 0:  # horizontal
                polys.append(np.array([[x0, y0], [x0 + ln, y0]]))
            elif kind == 1:  # vertical
                polys.append(np.array([[x0, y0], [x0, y0 + ln]]))
            else:  # unit diagonal
                polys.append(np.array([[x0, y0], [x0 + ln, y0 + ln]]))
        raster.draw_polylines(canvas, polys, width=2, closed=False)
        ys, xs = np.nonzero(canvas)
        return pa.table(
            {"x": pa.array(xs.astype(np.int64)), "y": pa.array(ys.astype(np.int64))}
        )

    return (
        orders.map_batches(paint, batch_format="pyarrow", batch_size=None)
        .groupby(["x", "y"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["x", "y"])
    )


Q_RASTER_PARITY_SQL = """
WITH s AS (
  SELECT o_orderkey AS k,
         (o_orderkey * 131) % 260 - 2 AS x0,
         (o_orderkey * 173) % 260 - 2 AS y0,
         40 + o_orderkey % 97 AS ln,
         o_orderkey % 3 AS kind
  FROM orders WHERE o_orderkey % 500 = 1
),
walk AS (
  SELECT s.k,
    CASE WHEN kind = 0 THEN x0 + t.range
         WHEN kind = 1 THEN x0
         ELSE x0 + (t.range + 1) // 2 END AS wx,
    CASE WHEN kind = 0 THEN y0
         WHEN kind = 1 THEN y0 + t.range
         ELSE y0 + t.range // 2 END AS wy
  FROM s CROSS JOIN range(0, 280) t
  WHERE t.range <= CASE WHEN kind = 2 THEN 2 * ln ELSE ln END
),
stamped AS (
  SELECT DISTINCT wx + dx.range AS x, wy + dy.range AS y
  FROM walk CROSS JOIN range(0, 2) dx CROSS JOIN range(0, 2) dy
)
SELECT x, y FROM stamped WHERE x BETWEEN 0 AND 255 AND y BETWEEN 0 AND 255
"""


def q_asof_join(sf_dir: str):
    """As-of join (SURVEY custom-operator family): every non-purchase
    event matched to the user's LATEST purchase at or before it, via
    joins.asof_join (one keyed shuffle + vectorized searchsorted per
    group). Hash-checked against DuckDB's native ASOF JOIN; the gap
    is exact integer microseconds."""
    import pyarrow.compute as pc

    from osmray.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    left = ev.map_batches(
        lambda t: t.filter(pc.not_equal(t["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    right = ev.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow",
    )
    return asof_join(left, right, on="user_id", ts_col="ts",
                     left_cols=["event_id"], right_cols=["event_id"])


Q_ASOF_JOIN_SQL = """
WITH l AS (SELECT event_id, ts, user_id FROM events WHERE event_type <> 'purchase'),
r AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase')
SELECT l.event_id, r.event_id AS state_event_id,
       epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_connected_components(sf_dir: str):
    """Distributed iterative graph computation: connected components
    of the bipartite order-part co-purchase graph (graph.py: min-label
    propagation over the streaming edge list + pointer jumping, so
    rounds ~ log(diameter); exact fixpoint convergence). Hash-checked
    against a DuckDB recursive-CTE twin (the bounded edge filter keeps
    components small (max ~46 nodes at sf0.1) and the closure ~3k
    pairs at sf0.01)."""
    import ray.data

    from osmray.graph import connected_components

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        return pa.table(
            {"u": pa.array(2 * o[sel]), "v": pa.array(2 * p[sel] + 1)}
        )

    out = connected_components(ds.map_batches(edges, batch_format="pyarrow"))

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array(np.where(node % 2 == 0, "o", "p")),
                "key": pa.array(node // 2),
                "comp": batch["comp"],
            }
        )

    return out.map_batches(decode, batch_format="pyarrow")


Q_CONNECTED_COMPONENTS_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
ee AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
r AS (
  SELECT u AS node, u AS label FROM (SELECT u FROM ee UNION SELECT v FROM ee)
  UNION
  SELECT ee.v AS node, r.label FROM r JOIN ee ON ee.u = r.node WHERE r.label < ee.v
)
SELECT CASE WHEN node % 2 = 0 THEN 'o' ELSE 'p' END AS kind,
       node // 2 AS key, CAST(min(label) AS BIGINT) AS comp
FROM r GROUP BY node
"""


def q_kcore(sf_dir: str):
    """2-core of the bounded order->part purchase graph (the
    degeneracy peel: drop degree<2 nodes among survivors to
    fixpoint) — graph.kcore, same two-engine policy as CC/PageRank
    (broadcast alive/degree arrays under the cap; grace-semi-join
    rounds above it, nothing O(V) on the driver). The kernel RAISES
    if peeling needs more rounds than the SQL twin unrolls (13), so
    twin truncation can never silently pass; emits each core node
    with its in-core degree."""
    from ray.data.aggregate import Count

    from osmray.graph import kcore

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    # k-core DEGREES are duplicate-sensitive (unlike CC's min-label),
    # so the edge set must be distinct: one keyed dedup shuffle on the
    # packed pair, matching the twin's DISTINCT
    def ekeys(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = o % 10 == 1
        # fold parts into 256 hub nodes so the 2-core is non-trivial
        key = (2 * o[sel]) * (np.int64(1) << 32) + (2 * (p[sel] % 256) + 1)
        return pa.table({"ek": pa.array(np.unique(key))})

    ded = (ds.map_batches(ekeys, batch_format="pyarrow")
           .groupby("ek").aggregate(Count(alias_name="_n")))

    def unpack_e(batch: pa.Table) -> pa.Table:
        ek = batch["ek"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(ek >> 32),
                         "v": pa.array(ek & ((np.int64(1) << 32) - 1))})

    out = kcore(ded.map_batches(unpack_e, batch_format="pyarrow"),
                k=2, max_rounds=12)

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "kind": pa.array(np.where(node % 2 == 0, "o", "p")),
            "key": pa.array(node // 2),
            "deg": batch["deg"]})

    return out.map_batches(decode, batch_format="pyarrow")


def _kcore_sql(rounds: int = 13) -> str:
    # AS MATERIALIZED is load-bearing: each round references the
    # previous CTE twice, so un-materialized inlining is exponential
    # in the round count (and re-opens the parquet per copy)
    parts = ["""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * (l_partkey % 256) + 1 AS v
  FROM lineitem WHERE l_orderkey % 10 = 1
),
ee AS MATERIALIZED (
  SELECT u AS s, v AS t FROM e0 UNION ALL SELECT v, u FROM e0),
a0 AS MATERIALIZED (SELECT DISTINCT s AS node FROM ee)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT ee.s AS node, count(*) AS deg
  FROM ee
  JOIN a{r - 1} x ON x.node = ee.s
  JOIN a{r - 1} y ON y.node = ee.t
  GROUP BY ee.s HAVING count(*) >= 2
)""")
    parts.append(f"""
SELECT CASE WHEN node % 2 = 0 THEN 'o' ELSE 'p' END AS kind,
       node // 2 AS key, CAST(deg AS BIGINT) AS deg
FROM a{rounds}
""")
    return "".join(parts)


def q_pagerank(sf_dir: str):
    """PageRank over the directed order->part purchase graph (same
    bounded edge filter as q_connected_components): power iteration
    with streaming edge passes (graph.py; broadcast rank vector at
    this V, keyed-join rounds above the cap). Hash-checked against a
    DuckDB twin that unrolls the same 15 fixed iterations as plain
    CTEs with bit-matching float op order; ranks are quantized to
    integer micro-rank (floor(rank*1e6+0.5)) so summation-order
    round-off (~1e-13 relative) cannot flip the compared value."""
    from osmray.graph import pagerank

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        return pa.table(
            {"u": pa.array(2 * o[sel]), "v": pa.array(2 * p[sel] + 1)}
        )

    out = pagerank(ds.map_batches(edges, batch_format="pyarrow"), n_iters=15)

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        rank = batch["rank"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "kind": pa.array(np.where(node % 2 == 0, "o", "p")),
                "key": pa.array(node // 2),
                "microrank": pa.array(np.floor(rank * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return out.map_batches(decode, batch_format="pyarrow")


def _pagerank_sql(n_iters: int = 15) -> str:
    """DuckDB twin of q_pagerank: the 15 fixed power iterations
    unrolled as a plain CTE chain (portable — no aggregate-in-
    recursive-CTE dependence), every float literal cast to DOUBLE so
    the per-element op sequence matches numpy bit-for-bit up to SUM
    order."""
    d = "CAST(0.85 AS DOUBLE)"
    one = "CAST(1 AS DOUBLE)"
    parts = [
        """WITH e AS MATERIALIZED (
  SELECT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
nodes AS MATERIALIZED (SELECT u AS node FROM e UNION SELECT v FROM e),
cnt AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
deg AS MATERIALIZED (
  SELECT nd.node, COALESCE(o.d, 0) AS deg
  FROM nodes nd
  LEFT JOIN (SELECT u AS node, COUNT(*) AS d FROM e GROUP BY u) o
  ON o.node = nd.node
),
r0 AS MATERIALIZED (SELECT node, """ + one + """ / (SELECT n FROM cnt) AS rank FROM nodes)"""
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(r.rank), 0) AS dang
  FROM r{p} r JOIN deg ON deg.node = r.node WHERE deg.deg = 0
),
a{i} AS MATERIALIZED (
  SELECT e.v AS node, SUM(r.rank / deg.deg) AS c
  FROM e JOIN r{p} r ON r.node = e.u JOIN deg ON deg.node = e.u
  GROUP BY e.v
),
r{i} AS MATERIALIZED (
  SELECT nd.node,
         ({one} - {d}) / (SELECT n FROM cnt)
         + {d} * (COALESCE(a.c, 0) + (SELECT dang FROM d{i}) / (SELECT n FROM cnt)) AS rank
  FROM nodes nd LEFT JOIN a{i} a ON a.node = nd.node
)""")
    body = ",\n".join(parts)
    return body + f"""
SELECT CASE WHEN node % 2 = 0 THEN 'o' ELSE 'p' END AS kind,
       node // 2 AS key,
       CAST(FLOOR(rank * 1000000 + 0.5) AS BIGINT) AS microrank
FROM r{n_iters}
"""


Q_PAGERANK_SQL = _pagerank_sql(15)


def q_jpeg_roundtrip(sf_dir: str):
    """Codec gate as a SQL-checkable pipeline: deterministic 32x32
    gradient tiles derived from part keys (pure integer ramps, no
    wraps — so the pixel sum has a DuckDB-expressible closed form) are
    encoded+decoded through BOTH codecs per row:

    - ``pix_sum`` is computed from the PNG-DECODED pixels, so the
      hash-checked value proves the lossless path round-trips
      bit-exact;
    - ``jpeg_ok`` is the input_hint's lossy acceptance gate (decoded
      PSNR >= 40 dB through the from-scratch baseline JPEG,
      osmray/jpeg.py; reference format: lib/layers.py:13,196).
    """
    from osmray import codecs

    part = _read(sf_dir, "part", ["p_partkey"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = pk[pk % 20 == 1]
        x = np.arange(32)
        xx, yy = np.meshgrid(x, x)
        sums, png_ok, jpeg_ok = [], [], []
        for k in pk:
            a = 1 + int(k) % 2
            b = 1 + int(k) % 3
            img = np.stack(
                [(a * xx + b * yy + (int(k) * (c + 7)) % 64) for c in range(3)], axis=2
            ).astype(np.uint8)
            dec = codecs.png_decode(codecs.png_encode(img))
            png_ok.append(int(np.array_equal(dec, img)))
            sums.append(int(dec.astype(np.int64).sum()))
            jdec = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
            jpeg_ok.append(int(codecs.psnr(img, jdec) >= 40.0))
        return pa.table(
            {
                "pid": pa.array(pk),
                "pix_sum": pa.array(sums, pa.int64()),
                "png_ok": pa.array(png_ok, pa.int64()),
                "jpeg_ok": pa.array(jpeg_ok, pa.int64()),
            }
        )

    return part.map_batches(roundtrip, batch_format="pyarrow")


Q_JPEG_ROUNDTRIP_SQL = """
SELECT p_partkey AS pid,
  CAST(3 * 32 * 496 * ((1 + p_partkey % 2) + (1 + p_partkey % 3))
       + 1024 * ((p_partkey * 7) % 64 + (p_partkey * 8) % 64 + (p_partkey * 9) % 64)
       AS BIGINT) AS pix_sum,
  CAST(1 AS BIGINT) AS png_ok,
  CAST(1 AS BIGINT) AS jpeg_ok
FROM part WHERE p_partkey % 20 = 1
"""


# ---------------------------------------------------------------------------
# rows-only pipelines (no SQL twin: heuristic / sketch / image ops)
# ---------------------------------------------------------------------------


def q_minhash_lsh(sf_dir: str):
    """MinHash-LSH near-dup candidates over documents, verified with
    exact n-gram Jaccard (threshold 0.5). Fully distributed: candidate
    generation shuffles (band, bucket, id) triples only, and
    verification joins the pair table back to the documents via the
    grace hash join — no driver id->text materialization."""
    from osmray.dedup import minhash_lsh_candidates, verify_pairs_joined

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    cands = minhash_lsh_candidates(ds)
    return verify_pairs_joined(cands, ds, threshold=0.5)


def q_simhash(sf_dir: str):
    """62-bit simhash signatures per document, hash-checked: the
    token hash is a dual 31-bit polynomial (dedup.HASH_*) that DuckDB
    recomputes with list_reduce, and the bit-majority vote is an
    integer groupby — bit-exact across engines for ASCII corpora."""
    from osmray.dedup import simhash64_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        sigs = simhash64_batch(batch["text"].to_pylist())
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(sigs)})

    return ds.map_batches(f, batch_format="pyarrow")


def _h1_sql(col: str, base: int) -> str:
    """The SQL twin of a dedup.py polynomial token hash: forward
    (acc * base + ord(char)) %% HASH_MOD over the clipped token."""
    from osmray.dedup import HASH_MOD, TOKEN_CLIP

    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform("
        f"regexp_extract_all(substr({col}, 1, {TOKEN_CLIP}), '.'), c -> ord(c)::BIGINT)), "
        f"(acc, c) -> (acc * {base} + c) % {HASH_MOD})"
    )


_TOK_SQL = (
    "SELECT x.doc_id, u.i, u.tok FROM "
    "(SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS lst FROM documents) x, "
    "LATERAL (SELECT unnest(lst) AS tok, unnest(generate_series(1, len(lst))) AS i) u"
)


def _simhash_sig_ctes() -> str:
    """The shared CTE chain computing every document's 62-bit simhash
    (ends with ``sigall(doc_id, simhash)``; empty-token docs get 0)."""
    from osmray.dedup import HASH_B1, HASH_B2

    bits = list(range(62))
    blist = ", ".join(str(b) for b in bits)
    plist = ", ".join(str(1 << b) for b in bits)
    return f"""tok AS ({_TOK_SQL}),
h AS (
  SELECT doc_id,
    {_h1_sql('tok', HASH_B1)} * 2147483648 + {_h1_sql('tok', HASH_B2)} AS h62
  FROM tok
),
bt AS (SELECT unnest([{blist}])::BIGINT AS b, unnest([{plist}])::BIGINT AS p),
votes AS (
  SELECT h.doc_id, bt.b, bt.p,
    sum(CASE WHEN (h.h62 // bt.p) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM h, bt GROUP BY h.doc_id, bt.b, bt.p
),
sig AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN p ELSE 0 END) AS simhash FROM votes GROUP BY doc_id),
sigall AS (
  SELECT d.doc_id, coalesce(sig.simhash, 0)::BIGINT AS simhash
  FROM documents d LEFT JOIN sig ON sig.doc_id = d.doc_id
)"""


Q_SIMHASH_SQL = f"""
WITH {_simhash_sig_ctes()}
SELECT doc_id, simhash FROM sigall
"""


def q_redact(sf_dir: str):
    """PII redaction pass (emails then long number runs replaced with
    placeholder tokens), verified by md5 of every redacted document —
    the patterns are RE2-safe so DuckDB's regexp_replace reproduces
    the bytes exactly."""
    from osmray.text import md5_hex, redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        red = redact_pii(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "red_md5": pa.array(md5_hex(red), pa.string()),
                "n_chars_red": pa.array(
                    np.asarray([len(r) for r in red], dtype=np.int64)
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _redact_sql() -> str:
    from osmray.text import REDACT_EMAIL, REDACT_LONGNUM

    e = REDACT_EMAIL.replace("\\", "\\\\").replace("'", "''")
    p = REDACT_LONGNUM.replace("\\", "\\\\").replace("'", "''")
    return f"""
WITH red AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'), '{p}', '<NUM>', 'g') AS r
  FROM documents
)
SELECT doc_id, md5(r) AS red_md5, length(r)::BIGINT AS n_chars_red FROM red
"""


Q_REDACT_SQL = _redact_sql()


def q_decontaminate(sf_dir: str):
    """Train/test decontamination via ``dedup.decontaminate_counts``:
    documents with doc_id %% 10 == 0 play the held-out set; every
    remaining (train) document reports how many of its DISTINCT
    3-token shingles appear anywhere in the held-out set. The regime
    is auto-selected by held-out distinct-shingle count: bounded
    (benchmark-sized) sides broadcast once and the overlap is one
    vectorized lexsort+isin+bincount per batch; corpus-shaped sides
    route through the grace semi-join with NO driver collect (pinned
    equal in tests/test_text_dedup_ann.py). Shingle hashing is the
    SQL-expressible dedup.py scheme, so the counts hash-match
    DuckDB."""
    from osmray.dedup import decontaminate_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return decontaminate_counts(ds, held_mod=10)


def _decontaminate_sql() -> str:
    from osmray.dedup import HASH_B1, HASH_MOD, _SHINGLE_MIX

    mix = [_SHINGLE_MIX[j % 5] for j in range(3)]
    sh_terms = " + ".join(f"(t{j}.h1 * {mix[j]}) % {HASH_MOD}" for j in range(3))
    sh_joins = " ".join(
        f"JOIN tokh t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.i = t0.i + {j}"
        for j in range(1, 3)
    )
    return f"""
WITH tok AS ({_TOK_SQL}),
tokh AS (SELECT doc_id, i, {_h1_sql('tok', HASH_B1)} AS h1 FROM tok),
sh AS (
  SELECT t0.doc_id, ({sh_terms}) % {HASH_MOD} AS sh
  FROM tokh t0 {sh_joins}
),
held AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
train AS (SELECT DISTINCT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
hits AS (
  SELECT train.doc_id, count(*) AS n FROM train JOIN held ON held.sh = train.sh
  GROUP BY train.doc_id
)
SELECT d.doc_id, coalesce(hits.n, 0)::BIGINT AS n_hits
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
WHERE d.doc_id % 10 <> 0
"""


Q_DECONTAMINATE_SQL = _decontaminate_sql()




def _minhash_lsh_sql(n_hashes: int = 64, n_bands: int = 16, k: int = 3,
                     max_bucket: int = 64, threshold: float = 0.5) -> str:
    """DuckDB twin of the FULL minhash-LSH near-dup pipeline
    (dedup.minhash_lsh_candidates -> verify_pairs_joined): token
    hashes, k-token shingles, the 64 seeded universal-hash
    permutations as literal columns, banded bucket polynomials, the
    max_bucket degenerate-bucket drop, band-hit counts, and exact
    shingle-set Jaccard verification. Docs with < k tokens produce no
    shingles here (the engine pads; absent from the testdata)."""
    from osmray.dedup import (
        HASH_B1,
        HASH_MOD,
        _BAND_R,
        _mh_coeffs,
        _SHINGLE_MIX,
    )

    a, b = _mh_coeffs(n_hashes)
    rows = n_hashes // n_bands
    rp = [pow(_BAND_R, rows - 1 - r, HASH_MOD) for r in range(rows)]
    rp_case = " ".join(
        f"WHEN {r} THEN {rp[r]}" for r in range(rows)
    )
    mix = [_SHINGLE_MIX[j % 5] for j in range(k)]
    sh_terms = " + ".join(
        f"(t{j}.h1 * {mix[j]}) % {HASH_MOD}" for j in range(k)
    )
    sh_joins = " ".join(
        f"JOIN tokh t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.i = t0.i + {j}"
        for j in range(1, k)
    )
    return f"""
WITH tok AS ({_TOK_SQL}),
tokh AS (SELECT doc_id, i, {_h1_sql('tok', HASH_B1)} AS h1 FROM tok),
sh AS (
  SELECT t0.doc_id, ({sh_terms}) % {HASH_MOD} AS sh
  FROM tokh t0 {sh_joins}
),
ds AS (SELECT DISTINCT doc_id, sh FROM sh),
perm AS (SELECT unnest([{', '.join(str(x) for x in a.tolist())}])::BIGINT AS pa,
                unnest([{', '.join(str(x) for x in b.tolist())}])::BIGINT AS pb,
                unnest(generate_series(0, {n_hashes - 1}))::BIGINT AS pi),
mh AS (
  SELECT ds.doc_id, perm.pi, min((ds.sh * perm.pa + perm.pb) % {HASH_MOD}) AS m
  FROM ds, perm GROUP BY ds.doc_id, perm.pi
),
band AS (
  SELECT doc_id, pi // {rows} AS band,
    sum((m * CASE pi % {rows} {rp_case} END) % {HASH_MOD}) % {HASH_MOD} AS bucket
  FROM mh GROUP BY doc_id, pi // {rows}
),
bsz AS (SELECT band, bucket, count(DISTINCT doc_id) AS n FROM band GROUP BY band, bucket),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.band
  FROM band x JOIN band y ON y.band = x.band AND y.bucket = x.bucket AND x.doc_id < y.doc_id
  JOIN bsz ON bsz.band = x.band AND bsz.bucket = x.bucket AND bsz.n <= {max_bucket}
),
pairs AS (SELECT a, b, count(*) AS n_bands_hit FROM cand GROUP BY a, b),
inter AS (
  SELECT p.a, p.b, count(*) AS ni
  FROM pairs p JOIN ds da ON da.doc_id = p.a JOIN ds db ON db.doc_id = p.b AND db.sh = da.sh
  GROUP BY p.a, p.b
),
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id)
SELECT p.a, p.b, p.n_bands_hit,
  CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS jaccard
FROM pairs p JOIN inter i ON i.a = p.a AND i.b = p.b
JOIN sizes sa ON sa.doc_id = p.a JOIN sizes sb ON sb.doc_id = p.b
WHERE CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) >= {threshold}
"""


Q_MINHASH_LSH_SQL = _minhash_lsh_sql()


def q_simhash_pairs(sf_dir: str):
    """EXACT hamming near-dup pairs (<= 4 bits apart) via pigeonhole
    multi-index banding over the 62-bit simhash: 5 disjoint bit bands,
    banded bucket groupby (keys-only shuffle), grace-join signature
    verification. Recall is 1.0 BY CONSTRUCTION (a pair differing in
    <= 4 bits must agree on one whole band), so the distributed
    banding pipeline hash-matches DuckDB's brute-force all-pairs
    bit_count(xor) twin."""
    from osmray.dedup import simhash_hamming_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_hamming_pairs(ds, max_hamming=4)


Q_SIMHASH_PAIRS_SQL = f"""
WITH {_simhash_sig_ctes()}
SELECT x.doc_id AS a, y.doc_id AS b,
  bit_count(xor(x.simhash, y.simhash))::BIGINT AS hamming
FROM sigall x JOIN sigall y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 4
"""


def q_lang_id(sf_dir: str):
    """Heuristic n-gram language ID vs the labeled lang column,
    hash-checked: Python's non-overlapping substring count equals
    DuckDB's (length - length(replace)) / length(gram), and the
    first-max-wins tie rule unrolls to an ordered CASE."""
    from ray.data.aggregate import Count

    from osmray.text import lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def f(batch: pa.Table) -> pa.Table:
        pred = lang_id(batch["text"].to_pylist())
        return pa.table(
            {"lang": batch["lang"], "pred": pa.array(pred, pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow").groupby(["lang", "pred"]).aggregate(
        Count(alias_name="cnt")
    )


def _lang_id_sql() -> str:
    """DuckDB twin of text.lang_id: per-language trigram-count score
    columns, then the dict-iteration-order tie rule (a language wins
    only with score > 0 and strictly more than every EARLIER language,
    at least as much as every later one)."""
    from osmray.text import _LANG_TRIGRAMS

    langs = list(_LANG_TRIGRAMS)
    scores = []
    for lang, grams in _LANG_TRIGRAMS.items():
        terms = " + ".join(
            f"(length(low) - length(replace(low, '{g}', ''))) // {len(g)}" for g in grams
        )
        scores.append(f"({terms}) AS s_{lang}")
    branches = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} > s_{e}" for e in langs[:i]]
        conds += [f"s_{lang} >= s_{l}" for l in langs[i + 1 :]]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH low_t AS (SELECT doc_id, lang, lower(text) AS low FROM documents),
sc AS (SELECT doc_id, lang, {', '.join(scores)} FROM low_t),
pred_t AS (SELECT lang, CASE {' '.join(branches)} ELSE 'und' END AS pred FROM sc)
SELECT lang, pred, count(*) AS cnt FROM pred_t GROUP BY lang, pred
"""


Q_LANG_ID_SQL = _lang_id_sql()


def q_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprints (winnowing-lite sketch),
    hash-checked: the dual mod-(2^31-1) Rabin-Karp scheme keeps every
    intermediate in int64 in both numpy and DuckDB (text.py FP_*)."""
    from osmray.text import rolling_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        fp = rolling_fingerprint(batch["text"].to_pylist())
        return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fp)})

    return ds.map_batches(f, batch_format="pyarrow")


def _fingerprint_sql() -> str:
    """DuckDB twin of text.rolling_fingerprint for ASCII corpora
    (ord == utf-8 byte; testdata min doc length 47 >= the 16-byte
    window, so the short-doc fallback never fires)."""
    from osmray.text import FP_B1, FP_B2, FP_MOD, FP_WINDOW

    def poly(base: int) -> str:
        return " + ".join(
            f"ord(substr(text, p + {t}, 1))::BIGINT * {pow(base, FP_WINDOW - 1 - t, FP_MOD)}"
            for t in range(FP_WINDOW)
        )

    return f"""
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text) - {FP_WINDOW - 1}))::BIGINT AS p
  FROM documents
),
win AS (
  SELECT doc_id,
    ({poly(FP_B1)}) % {FP_MOD} AS h1,
    ({poly(FP_B2)}) % {FP_MOD} AS h2
  FROM pos
)
SELECT doc_id, min(h1 * {1 << 31} + h2) AS fingerprint FROM win GROUP BY doc_id
"""


Q_FINGERPRINT_SQL = _fingerprint_sql()


def q_embedding_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs, hash-checked vs a DuckDB
    list_cosine_similarity twin. The synthetic embeddings have no
    true dups (max pairwise cosine ~0.6), so the demo threshold is
    0.45, which routes to the exact distributed grid mode (spilled
    hash groups + one task per group-pair, no driver materialization);
    production dedup at ~0.95 routes to the LSH-bucketed mode
    (exercised with injected dups in pytest).

    Cross-engine exactness: the engines sum the 64-dim dot products
    in different orders (~1e-16 divergence), so the query emits the
    cosine quantized to milli-units (floor(c*1000 + 0.5)); on this
    data the nearest output pair is 4.9e-7 cosine from a quantization
    boundary and 1e-4 from the threshold — 9+ orders above the noise."""
    from osmray.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.45
    )

    def quant(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "cos_mil": pa.array(np.floor(c * 1000.0 + 0.5).astype(np.int64)),
            }
        )

    return pairs.map_batches(quant, batch_format="pyarrow")


Q_EMBEDDING_DUPS_SQL = """
WITH p AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_cosine_similarity(x.embedding, y.embedding) AS c
  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
)
SELECT a, b, CAST(floor(c * 1000 + 0.5) AS BIGINT) AS cos_mil FROM p WHERE c >= 0.45
"""


def q_lsh_ann(sf_dir: str):
    """LSH-bucketed ANN (scale path) for the same 5 queries: the
    corpus STREAMS through signature-filtered partial top-k tasks —
    only the 5-vector query matrix + probe table are broadcast; the
    corpus is never collected to the driver or into any actor.

    Hash-checked: the DuckDB twin recomputes the seeded hyperplanes
    as literal lists (sign bits via list_dot_product — norm-invariant),
    the multi-probe as an xor-mask IN-list, and the ranked cosines via
    list_cosine_similarity. Only integers reach the output (rank +
    milli-quantized cosine); measured margins on this data: adjacent
    top-11 cosine gaps >= 4e-5, quantization-boundary distance
    >= 1.4e-4, plane-dot magnitude >= 3.5e-5 — all many orders above
    the ~1e-13 cross-engine float noise, so the output is bit-stable."""
    import pyarrow.compute as pc

    from osmray.ann import lsh_ann_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qt = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
        ).to_pandas()
    )  # bounded: exactly the 5 query rows
    qids = qt["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.asarray(qt["embedding"].tolist(), dtype=np.float64)
    out = lsh_ann_topk(emb, qids, qmat, k=10)

    def quant(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cos_mil": pa.array(np.floor(c * 1000.0 + 0.5).astype(np.int64)),
                "rank": batch["rank"],
            }
        )

    return out.map_batches(quant, batch_format="pyarrow")


def _lsh_ann_sql(n_planes: int = 10, seed: int = 7, probe_bits: int = 2,
                 k: int = 10, dim: int = 64) -> str:
    """DuckDB twin of ann.lsh_ann_topk over the embeddings table:
    same seeded hyperplanes (literal float lists), same multi-probe
    bucket set, same (cosine desc, vec_id asc) ranking."""
    import itertools

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    sig_terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(float(v)) for v in planes[p])}]) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )
    masks = [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_bits + 1)
        for combo in itertools.combinations(range(n_planes), r)
    ]
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding AS e, ({sig_terms}) AS sig FROM embeddings
),
q AS (SELECT vec_id AS qid, e AS qe, sig AS qsig FROM sigs WHERE vec_id < 5),
cand AS (
  SELECT q.qid, s.vec_id, list_cosine_similarity(s.e, q.qe) AS c
  FROM q JOIN sigs s ON xor(q.qsig, s.sig) IN ({', '.join(str(m) for m in masks)})
),
r AS (
  SELECT qid, vec_id, c,
    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY c DESC, vec_id) AS rank
  FROM cand
)
SELECT qid AS query_id, vec_id,
  CAST(floor(c * 1000 + 0.5) AS BIGINT) AS cos_mil, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


Q_LSH_ANN_SQL = _lsh_ann_sql()


def q_ivf_ann(sf_dir: str):
    """IVF ANN for the same 5 queries as q_ann_topk/q_lsh_ann: a
    distributed spherical k-means fits the coarse quantizer (one
    streaming pass per iteration, only O(centroids x dim) partial
    sums cross the wire), then the corpus streams through
    list-routed partial top-k tasks.

    Hash-checked: the DuckDB twin replays the ENTIRE fit — the
    (hash, id)-selected init seeds and all 3 Lloyd iterations
    (cross-join argmax assignment with the same (sim desc, list
    asc) tie-break, per-dimension AVG update, renormalize,
    empty-cluster keep) — then the probed search, all as one
    MATERIALIZED-CTE chain. Only integers reach the output (rank +
    milli-quantized cosine); summation-order float noise (~1e-15)
    is many orders below the assignment/ranking margins on this
    data, which the sf0.1 scale-stability run re-checks."""
    import pyarrow.compute as pc

    from osmray.ann import ivf_ann_topk, kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qt = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t["vec_id"], 5)), batch_format="pyarrow"
        ).to_pandas()
    )  # bounded: exactly the 5 query rows
    qids = qt["vec_id"].to_numpy(dtype=np.int64)
    qmat = np.asarray(qt["embedding"].tolist(), dtype=np.float64)
    cent = kmeans_fit(emb, n_centroids=16, n_iters=3)
    out = ivf_ann_topk(emb, qids, qmat, cent, k=10, n_probe=4)

    def quant(batch: pa.Table) -> pa.Table:
        c = batch["cosine"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "query_id": batch["query_id"],
                "vec_id": batch["vec_id"],
                "cos_mil": pa.array(np.floor(c * 1000.0 + 0.5).astype(np.int64)),
                "rank": batch["rank"],
            }
        )

    return out.map_batches(quant, batch_format="pyarrow")


def _ivf_fit_ctes(n_centroids: int = 16, n_iters: int = 3,
                  dim: int = 64) -> list[str]:
    """The kmeans_fit replay shared by q_ivf_ann and q_semdedup: CTE
    chain from norm0 through cent{n_iters} and the final ``assign``
    (vec_id, e, list_id)."""
    nrm = ("list_transform({v}, x -> x / greatest(sqrt("
           "list_dot_product({v}, {v})), 1e-12))")
    parts = [f"""WITH norm0 AS MATERIALIZED (
  SELECT vec_id, {nrm.format(v='embedding')} AS e FROM embeddings
),
cent0 AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS list_id, e AS c
  FROM (SELECT vec_id, e, (vec_id * 2654435761) % 4294967296 AS h
        FROM norm0 ORDER BY h, vec_id LIMIT {n_centroids})
)"""]
    for i in range(1, n_iters + 1):
        p = i - 1
        parts.append(f"""a{i} AS MATERIALIZED (
  SELECT vec_id, e, list_id FROM (
    SELECT n.vec_id, n.e, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY n.vec_id
                         ORDER BY list_dot_product(n.e, c.c) DESC, c.list_id) AS rn
    FROM norm0 n CROSS JOIN cent{p} c
  ) WHERE rn = 1
),
raw{i} AS MATERIALIZED (
  SELECT list_id, list(m ORDER BY pos) AS c FROM (
    SELECT a.list_id, g.pos, AVG(a.e[g.pos]) AS m
    FROM a{i} a CROSS JOIN (SELECT range AS pos FROM range(1, {dim + 1})) g
    GROUP BY a.list_id, g.pos
  ) GROUP BY list_id
),
cent{i} AS MATERIALIZED (
  SELECT list_id, {nrm.format(v='cc')} AS c
  FROM (SELECT p.list_id, COALESCE(r.c, p.c) AS cc
        FROM cent{p} p LEFT JOIN raw{i} r USING (list_id))
)""")
    n = n_iters
    parts.append(f"""assign AS MATERIALIZED (
  SELECT vec_id, e, list_id FROM (
    SELECT n.vec_id, n.e, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY n.vec_id
                         ORDER BY list_dot_product(n.e, c.c) DESC, c.list_id) AS rn
    FROM norm0 n CROSS JOIN cent{n} c
  ) WHERE rn = 1
)""")
    return parts


def _ivf_ann_sql(n_centroids: int = 16, n_iters: int = 3, n_probe: int = 4,
                 k: int = 10, dim: int = 64) -> str:
    """DuckDB twin of kmeans_fit + ivf_ann_topk (see q_ivf_ann)."""
    parts = _ivf_fit_ctes(n_centroids, n_iters, dim)
    n = n_iters
    parts.append(f"""qv AS MATERIALIZED (SELECT vec_id AS qid, e AS qe FROM norm0 WHERE vec_id < 5),
probes AS MATERIALIZED (
  SELECT qid, list_id FROM (
    SELECT q.qid, c.list_id,
      ROW_NUMBER() OVER (PARTITION BY q.qid
                         ORDER BY list_dot_product(q.qe, c.c) DESC, c.list_id) AS rn
    FROM qv q CROSS JOIN cent{n} c
  ) WHERE rn <= {n_probe}
),
r AS (
  SELECT p.qid, a.vec_id, list_dot_product(a.e, q.qe) AS cos,
    ROW_NUMBER() OVER (PARTITION BY p.qid
                       ORDER BY list_dot_product(a.e, q.qe) DESC, a.vec_id) AS rank
  FROM assign a JOIN probes p ON p.list_id = a.list_id
  JOIN qv q ON q.qid = p.qid
)""")
    return ",\n".join(parts) + f"""
SELECT qid AS query_id, vec_id,
  CAST(floor(cos * 1000 + 0.5) AS BIGINT) AS cos_mil, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


Q_IVF_ANN_SQL = _ivf_ann_sql()


def hash64_ctes(prefix: str, src: str, cols: str, expr: str, seed: int) -> str:
    """SQL CTE chain reproducing stages.hash64 BIT-EXACTLY in DuckDB:
    the splitmix64-style mix runs in HUGEINT with 32-bit-limb wrapping
    multiplies (UBIGINT would overflow; HUGEINT products of two 64-bit
    values would too, limbs keep every intermediate < 2^96). The final
    CTE ``{prefix}5`` carries ``cols`` plus signed-int64 ``h``.
    ``expr`` must be non-negative (every engine use hashes positive
    keys)."""
    M = 18446744073709551616  # 2^64
    S = (seed * 0x9E3779B97F4A7C15) % M
    H1 = 0xBF58476D1CE4E5B9
    H2 = 0x94D049BB133111EB

    def mul(a: str, c: int) -> str:
        ch, cl = c >> 32, c & 0xFFFFFFFF
        return (
            f"((({a}) % 4294967296) * {cl} + (((({a}) % 4294967296) * {ch} "
            f"+ (({a}) // 4294967296) * {cl}) % 4294967296) * 4294967296) % {M}"
        )

    p = prefix
    return f"""
{p}0 AS (SELECT {cols}, (CAST({expr} AS HUGEINT) + {S}) % {M} AS hh FROM {src}),
{p}1 AS (SELECT {cols}, xor(hh, hh >> 30) AS hh FROM {p}0),
{p}2 AS (SELECT {cols}, {mul('hh', H1)} AS hh FROM {p}1),
{p}3 AS (SELECT {cols}, xor(hh, hh >> 27) AS hh FROM {p}2),
{p}4 AS (SELECT {cols}, {mul('hh', H2)} AS hh FROM {p}3),
{p}5 AS (SELECT {cols}, CAST(CASE WHEN xor(hh, hh >> 31) >= 9223372036854775808
  THEN xor(hh, hh >> 31) - {M} ELSE xor(hh, hh >> 31) END AS BIGINT) AS h FROM {p}4)"""


# shared SQL fragments for the oracle-fixture pipelines (see
# osmray/oraclefix.py for the construction and exactness argument).
# nodes / ways / polygons / the canvas universe as pure generate_series
# derivations — the same integer formulas oraclefix.py uses.
_OFX_BASE = """
nd AS (SELECT t.range AS k, 1000 + t.range AS fid,
              (t.range*37)%64 AS un, (t.range*59)%64 AS vn,
              (t.range*13)%240 + 8 AS rxn, (t.range*29)%240 + 8 AS ryn,
              (t.range % 5 <> 0) AS lamp
       FROM range(0, 600) t),
wy AS (SELECT t.range AS m, (t.range*7)%48 AS gx0,
              (t.range*7)%48 + 4 + t.range%11 AS gx1, (t.range*23)%63 AS gy
       FROM range(0, 80) t),
univ AS (SELECT t.range % 64 AS u, t.range // 64 AS v FROM range(0, 4096) t),
pha AS (SELECT aa.range AS a,
  CAST(SUM(CASE WHEN 2*(4*aa.range*(jj.range//2) + (ii.range//2)) > 3*(4*aa.range+1)
      THEN (CAST(1 AS BIGINT) << (63 - (8*ii.range + jj.range))) ELSE 0 END) AS BIGINT) AS ph
  FROM range(1, 5) aa CROSS JOIN range(0, 8) ii CROSS JOIN range(0, 8) jj
  GROUP BY aa.range)"""

# per-tile image attributes: amplitude a, base-sum, phash, pixel sum
_OFX_IMG = """
img AS (SELECT u, v, 1 + (u*3 + v*5) % 4 AS a,
  (((u*7 + v*11) % 8) + ((u*7 + v*11 + 1) % 8) + ((u*7 + v*11 + 2) % 8)) * 16 AS sbase
  FROM univ),
imgp AS (SELECT img.*, pha.ph,
  65536*sbase + 768*(a*1536) + 768*384 AS pix_sum FROM img JOIN pha USING (a))"""


def q_image_label_job(sf_dir: str):
    """The flagship label job (make_original semantics,
    /root/reference/make_original.py:26-62) run END TO END over the
    oracle fixture and hash-checked against a DuckDB closed form:
    seeded positive sampling (hash64 in SQL), skipedge, the distributed
    painter (way strokes + sampled-lamp dots), complement negative
    sampling, the label semi/anti join, per-tile 256x256 mask
    rasterization (checked as exact popcounts), decode->re-encode
    roundtrip (checked as decoded-pixel sums + psnr/phash gates), the
    cell/partition key derivations, and the tile-key hash64 train/valid
    split (seed+1, replayed via hash64_ctes — closing the last
    un-oracled flagship output)."""
    from osmray import codecs, oraclefix, pipeline

    images, feats = oraclefix.load()
    cfg = pipeline.LabelJobConfig(bbox=oraclefix.bbox(), limit=200)
    ds, _ = pipeline.run_label_job(images, feats, cfg)

    def summarize(batch: pa.Table) -> pa.Table:
        pix = [
            int(codecs.png_decode(b).astype(np.int64).sum())
            for b in batch["bytes"].to_pylist()
        ]
        pop = [
            int((codecs.png_decode(m) > 0).sum()) for m in batch["mask"].to_pylist()
        ]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "tx": batch["tx"],
                "ty": batch["ty"],
                "tile_key": batch["tile_key"],
                "cell": batch["cell"],
                "part_id": batch["part_id"],
                "label": batch["label"],
                "split": batch["split"],
                "caption": batch["caption"],
                "phash": batch["phash"],
                "pix_sum": pa.array(pix, pa.int64()),
                "mask_pop": pa.array(pop, pa.int64()),
                "mask_any": batch["mask_any"],
                "psnr_ok": batch["psnr_ok"],
                "phash_ok": batch["phash_ok"],
                "decode_ok": batch["decode_ok"],
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


Q_IMAGE_LABEL_JOB_SQL = f"""
WITH {_OFX_BASE},
{_OFX_IMG},
lamps AS (SELECT * FROM nd WHERE lamp),
{hash64_ctes('lh', 'lamps', 'fid, un, vn, rxn, ryn', 'fid', 42)},
samp AS (SELECT * FROM lh5 ORDER BY h, fid LIMIT 200),
pos AS (SELECT DISTINCT un AS u, vn AS v FROM samp
        WHERE rxn BETWEEN 16 AND 239 AND ryn BETWEEN 16 AND 239),
wt AS (SELECT DISTINCT gx0 + xx.range AS u, gy + yy.range AS v
       FROM wy CROSS JOIN range(0, 2) yy CROSS JOIN range(0, 16) xx
       WHERE xx.range <= gx1 + 1 - gx0),
dots AS (SELECT DISTINCT un AS u, vn AS v FROM samp),
painted AS (SELECT u, v FROM wt UNION SELECT u, v FROM dots),
freek AS (SELECT u, v,
    19*288230376151711744 + (290000 + u + 268435456)*536870912
      + (170000 + v + 268435456) AS key
    FROM univ ANTI JOIN painted USING (u, v)),
{hash64_ctes('nh', 'freek', 'u, v, key', 'key', 42)},
negs AS (SELECT u, v FROM nh5 ORDER BY h, key LIMIT 200),
labeled AS (SELECT u, v, 'lamp' AS label FROM pos
            UNION ALL SELECT u, v, 'nolamp' FROM negs),
{hash64_ctes('sh', 'labeled', 'u, v, label',
             '19*288230376151711744 + (290000 + u + 268435456)*536870912'
             ' + (170000 + v + 268435456)', 43)},
spl AS (SELECT u, v, label,
  CASE WHEN (CAST(h AS HUGEINT)
             + CASE WHEN h < 0 THEN 18446744073709551616 ELSE 0 END) % 1000 < 800
       THEN 'train' ELSE 'valid' END AS split FROM sh5),
npx AS (SELECT c.u, c.v, n.rxn + 256*n.ryn AS pxl
        FROM nd n JOIN labeled c ON c.u = n.un AND c.v = n.vn),
wpx AS (SELECT c.u, c.v, (xs.x - 256*c.u) + 256*(128 + yy.range) AS pxl
        FROM wy w JOIN labeled c ON c.v = w.gy AND c.u BETWEEN w.gx0 AND w.gx1
        CROSS JOIN range(0, 2) yy,
        LATERAL (SELECT unnest(generate_series(greatest(w.gx0*256 + 128, c.u*256),
                 least(w.gx1*256 + 129, c.u*256 + 255))) AS x) xs),
mp AS (SELECT u, v, CAST(COUNT(DISTINCT pxl) AS BIGINT) AS mask_pop
       FROM (SELECT * FROM npx UNION ALL SELECT * FROM wpx) GROUP BY u, v)
SELECT
  'im' || CAST(10000 + l.v*100 + l.u AS VARCHAR) AS image_id,
  290000 + l.u AS tx, 170000 + l.v AS ty,
  19*288230376151711744 + (290000 + l.u + 268435456)*536870912
    + (170000 + l.v + 268435456) AS tile_key,
  12*288230376151711744 + (((290000 + l.u) // 128) % 4096)*536870912
    + ((170000 + l.v) // 128) AS cell,
  15*288230376151711744 + (((290000 + l.u) // 16) % 32768)*536870912
    + ((170000 + l.v) // 16) AS part_id,
  l.label, l.split,
  'cap ' || (290000 + l.u) || ' ' || (170000 + l.v) AS caption,
  i.ph AS phash, i.pix_sum,
  COALESCE(mp.mask_pop, 0) AS mask_pop,
  COALESCE(mp.mask_pop, 0) > 0 AS mask_any,
  true AS psnr_ok, true AS phash_ok, true AS decode_ok
FROM spl l
JOIN imgp i USING (u, v)
LEFT JOIN mp USING (u, v)
"""


def _fixture(sf_dir: str):
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    from osmray import pipeline, synth

    n = 512 if "0.001" in sf_dir else 2048
    root = f"/tmp/osmray_fixture_{n}"
    synth.write_fixture(root, n_images=n, n_nodes=max(100, n // 4), n_ways=n // 16,
                        n_polygons=n // 8)
    cfg = pipeline.LabelJobConfig(bbox=synth.fixture_bbox(root))
    images = ray.data.read_parquet(sorted(glob.glob(os.path.join(root, "images", "*.parquet"))))
    feats = pq.read_table(os.path.join(root, "features.parquet"))
    return images, feats, cfg


_PIP_U = 1.0 / 8192.0  # dyadic degree-lattice unit (2^-13)


def q_pip(sf_dir: str):
    """Analytic point-in-polygon join through the REAL cell-bucketed
    index actor pool (stages.PipStage -> geom.FeatureIndex.pip),
    hash-checked vs a DuckDB integer twin.

    Parity-safe construction (as q_pip_grid, lifted onto a dyadic
    DEGREE lattice, unit 2^-13 deg, so every lat/lng float is exactly
    an integer times U): diamond vertices have all-even lattice
    coordinates and every point odd (x+y) parity, so no point is ever
    on an edge line; with unit-slope edges the ray-cast crossing
    abscissa is EXACT dyadic arithmetic (the edge slope divides out to
    +-1), so the float kernel equals integer math. DuckDB decides
    containment with the diamond interior metric |dx| + |dy| < a in
    pure integers (|dx|+|dy| is odd, a even: never equal). The
    fixture-feature PIP parity vs the scalar oracle stays pytest-locked
    (tests/test_geom.py)."""
    import pyarrow.parquet as pq
    import ray

    from osmray.stages import PipStage

    t = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = t["p_partkey"].to_numpy().astype(np.int64)
    pk = np.sort(pk[pk % 100 == 1])  # bounded small side
    cx = 2 * ((pk * 48271) % (1 << 20)) - (1 << 20)
    cy = 2 * ((pk * 16807) % (1 << 18)) - (1 << 18)
    a = 2 * (20000 + (pk % 5) * 8000)
    feats = pa.table(
        {
            "feature_id": pa.array(pk),
            "kind": pa.array(["polygon"] * len(pk)),
            "geom_lat": pa.array(
                [
                    [(y + h) * _PIP_U, y * _PIP_U, (y - h) * _PIP_U, y * _PIP_U]
                    for y, h in zip(cy.tolist(), a.tolist())
                ],
                pa.list_(pa.float64()),
            ),
            "geom_lng": pa.array(
                [
                    [x * _PIP_U, (x + h) * _PIP_U, x * _PIP_U, (x - h) * _PIP_U]
                    for x, h in zip(cx.tolist(), a.tolist())
                ],
                pa.list_(pa.float64()),
            ),
        }
    )
    feats_ref = ray.put(feats)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        px = 2 * (p["m1"] % (1 << 20)) - (1 << 20) + 1  # odd
        py = 2 * (p["m2"] % (1 << 18)) - (1 << 18)  # even -> x+y odd
        return pa.table(
            {
                "pid": pa.array(p["pid"]),
                "lat": pa.array(py * _PIP_U),
                "lng": pa.array(px * _PIP_U),
            }
        )

    # clamp the pool UNDER the cluster CPUs: reserving every CPU for
    # the actor pool starves the upstream read/pts tasks
    n_act = max(2, int(ray.cluster_resources().get("CPU", 8)) * 3 // 4)
    out = li.map_batches(pts, batch_format="pyarrow").map_batches(
        PipStage,
        fn_constructor_kwargs={"features_ref": feats_ref, "res": 6},
        batch_format="pyarrow",
        concurrency=n_act,
        num_cpus=1,
    )

    def explode(batch: pa.Table) -> pa.Table:
        hits = batch["pip_ids"]
        lens = np.asarray([len(h) for h in hits.to_pylist()], dtype=np.int64)
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        flat = pa.compute.list_flatten(hits)
        return pa.table(
            {
                "pid": pa.array(np.repeat(pid, lens)),
                "poly_id": flat.combine_chunks()
                if hasattr(flat, "combine_chunks")
                else flat,
            }
        )

    return out.map_batches(explode, batch_format="pyarrow")


Q_PIP_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (SELECT pid, 2 * (m1 % 1048576) - 1048576 + 1 AS px,
               2 * (m2 % 262144) - 262144 AS py FROM p),
d AS (SELECT p_partkey AS poly_id,
             2 * ((p_partkey * 48271) % 1048576) - 1048576 AS cx,
             2 * ((p_partkey * 16807) % 262144) - 262144 AS cy,
             2 * (20000 + (p_partkey % 5) * 8000) AS a
      FROM part WHERE p_partkey % 100 = 1)
SELECT pts.pid, d.poly_id
FROM pts JOIN d ON abs(pts.px - d.cx) + abs(pts.py - d.cy) < d.a
"""


def q_knn_cells(sf_dir: str):
    """Cell-ring-expansion kNN (k=3) through the REAL stateful index
    actor (stages.KnnStage -> FeatureIndex.knn_batch), hash-checked vs
    a DuckDB brute-force twin.

    Cross-engine exactness: features and query points sit at dyadic
    web coordinates (m / 2^18). The engine round-trips them through
    web2wgs -> project2web (trig), perturbing each coordinate by
    O(ulp) ~ 1e-13; only the rank order reaches the output
    (pid, rank, feature_id), and the minimum adjacent top-4 distance
    gap is >= 7.6e-5 web^2 (measured at sf0.001/0.01), ~8 orders above
    the perturbation, so ranks are bit-stable. The SQL twin ranks with
    exact dyadic arithmetic and computes no trig. Ring-expansion ==
    brute-force equivalence is separately pytest-locked
    (tests/test_geom.py)."""
    import ray
    from ray.data.aggregate import Min

    from osmray.stages import KnnStage
    from osmray.tilemath import web2wgs

    pk, fx, fy = _part_points(sf_dir)
    flat_, flng_ = web2wgs(fx, fy)
    feats = pa.table(
        {
            "feature_id": pa.array(pk),
            "kind": pa.array(["node"] * len(pk)),
            "geom_lat": pa.array([[v] for v in flat_.tolist()], pa.list_(pa.float64())),
            "geom_lng": pa.array([[v] for v in flng_.tolist()], pa.list_(pa.float64())),
        }
    )
    feats_ref = ray.put(feats)
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def subset(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 7 == 0
        return pa.table(
            {
                "pid": pa.array(p["pid"][sel]),
                "wx": pa.array(p["wx"][sel]),
                "wy": pa.array(p["wy"][sel]),
            }
        )

    # (orderkey, linenumber) repeats in the synthetic lineitem: dedup
    # pids first (pid determines (wx, wy) -> Min is a no-op value-wise)
    pts = (
        ds.map_batches(subset, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Min("wx", alias_name="wx"), Min("wy", alias_name="wy"))
    )

    def to_wgs(batch: pa.Table) -> pa.Table:
        la, ln = web2wgs(
            batch["wx"].to_numpy(zero_copy_only=False),
            batch["wy"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"pid": batch["pid"], "lat": pa.array(la), "lng": pa.array(ln)}
        )

    n_act = max(2, int(ray.cluster_resources().get("CPU", 8)) * 3 // 4)
    out = pts.map_batches(to_wgs, batch_format="pyarrow").map_batches(
        KnnStage,
        fn_constructor_kwargs={"features_ref": feats_ref, "k": 3, "res": 6},
        batch_format="pyarrow",
        concurrency=n_act,
        num_cpus=1,
    )

    def explode(batch: pa.Table) -> pa.Table:
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        ids = np.asarray(batch["knn_ids"].to_pylist(), dtype=np.int64)  # (n, 3)
        n = len(pid)
        return pa.table(
            {
                "pid": pa.array(np.repeat(pid, 3)),
                "rank": pa.array(np.tile(np.arange(1, 4, dtype=np.int64), n)),
                "feature_id": pa.array(ids.ravel()),
            }
        )

    return out.map_batches(explode, batch_format="pyarrow")


Q_KNN_CELLS_SQL = f"""
WITH p AS ({_LI_SQL}), f AS ({_PART_SQL}),
q AS (SELECT DISTINCT pid, m1 / 262144.0 AS wx, m2 / 262144.0 AS wy FROM p WHERE pid % 7 = 0),
-- banded candidate pass (IEJoin, not a cross join): a query whose
-- 3rd-nearest CIRCLE distance is <= R is guaranteed its true top-3
-- inside the R-box; the rare unsatisfied queries fall back to the
-- exact cross join below, so results are IDENTICAL to the naive
-- twin at a fraction of the intermediate size
near AS (
  SELECT q.pid, q.wx, q.wy, f.p_partkey AS feature_id,
    (q.wx - f.fx) * (q.wx - f.fx) + (q.wy - f.fy) * (q.wy - f.fy) AS d2
  FROM q JOIN f ON f.fx BETWEEN q.wx - 5.0 AND q.wx + 5.0
               AND f.fy BETWEEN q.wy - 5.0 AND q.wy + 5.0),
nr AS (SELECT pid, feature_id, d2,
         ROW_NUMBER() OVER (PARTITION BY pid
           ORDER BY d2, feature_id) AS rank
       FROM near),
ok AS (SELECT pid FROM nr WHERE rank = 3 AND d2 <= 25.0),
good AS (SELECT nr.pid, nr.rank, nr.feature_id FROM nr
         JOIN ok ON ok.pid = nr.pid WHERE nr.rank <= 3),
rest AS (SELECT * FROM q WHERE pid NOT IN (SELECT pid FROM ok)),
d AS (
  SELECT rest.pid, f.p_partkey AS feature_id,
    ROW_NUMBER() OVER (PARTITION BY rest.pid ORDER BY
      (rest.wx - f.fx) * (rest.wx - f.fx)
      + (rest.wy - f.fy) * (rest.wy - f.fy), f.p_partkey) AS rank
  FROM rest CROSS JOIN f
)
SELECT pid, CAST(rank AS BIGINT) AS rank, feature_id FROM good
UNION ALL
SELECT pid, CAST(rank AS BIGINT) AS rank, feature_id FROM d
WHERE rank <= 3
"""


def _phash_reps(sf_dir: str):
    """decode -> phash -> exact groupby dedup over the planted-phash
    fixture (osmray/oraclefix.py ph_image/ph_pattern): the signature is
    computed IN the dataflow from decoded pixels, and the fixture
    construction makes every signature a SQL closed form."""
    from ray.data.aggregate import Count, Min

    from osmray import codecs, oraclefix

    images = oraclefix.load_phash()

    def sig(batch: pa.Table) -> pa.Table:
        ph = np.asarray(
            [int(codecs.phash(codecs.png_decode(b))) for b in batch["bytes"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table({"phash": pa.array(ph), "idx": batch["idx"]})

    return (
        images.select_columns(["bytes", "idx"])
        .map_batches(sig, batch_format="pyarrow")
        .groupby("phash")
        .aggregate(Min("idx", alias_name="survivor_idx"), Count(alias_name="n_images"))
    )


def q_phash_dedup(sf_dir: str):
    """Exact image dedup: decode -> 8x8 block-mean phash -> groupby
    signature -> (first survivor, duplicate count). The planted
    fixture makes the decoded-pixel hash itself oracle-checkable."""
    return _phash_reps(sf_dir)


# bit replay of oraclefix.ph_pattern: base bit + XOR-parity flips,
# packed MSB-first with the signed-int64 wraparound
_PH_CTES = """
phb AS (SELECT ii.range AS i, ii.range // 4 AS g, ii.range % 4 AS t, jj.range AS j
        FROM range(0, 1024) ii CROSS JOIN range(0, 64) jj),
phbits AS (SELECT i, j, xor(((g*2654435761 + j*40503) // 128) % 2,
    CASE WHEN t = 2 THEN (CASE WHEN (g*17)%64 = j THEN 1 ELSE 0 END)
         WHEN t = 3 THEN (  (CASE WHEN (g*17)%64 = j THEN 1 ELSE 0 END)
                          + (CASE WHEN (g*29+13)%64 = j THEN 1 ELSE 0 END)
                          + (CASE WHEN (g*41+7)%64 = j THEN 1 ELSE 0 END)
                          + (CASE WHEN (g*53+3)%64 = j THEN 1 ELSE 0 END)) % 2
         ELSE 0 END) AS bit FROM phb),
phv AS (SELECT i, SUM(CASE WHEN bit = 1 THEN CAST(1 AS HUGEINT) << (63 - j)
                      ELSE CAST(0 AS HUGEINT) END) AS pv FROM phbits GROUP BY i),
phx AS (SELECT i, CAST(CASE WHEN pv >= 9223372036854775808
    THEN pv - 18446744073709551616 ELSE pv END AS BIGINT) AS phash FROM phv)"""

Q_PHASH_DEDUP_SQL = f"""
WITH {_PH_CTES}
SELECT phash, MIN(i) AS survivor_idx, COUNT(*) AS n_images
FROM phx GROUP BY phash
"""


def q_phash_near_dup(sf_dir: str):
    """Image NEAR-dup pairs — the realistic two-stage image-dedup
    pipeline over the planted-phash fixture: decode -> phash -> exact
    dedup (q_phash_dedup), then the generic pigeonhole hamming_pairs
    operator over the DISTINCT signatures (recall 1.0 by construction,
    in-task popcount verification) at 1 <= hamming <= 6; the fixture
    plants 1-bit and 4-bit neighbors per pattern group. The SQL twin
    replays the planted patterns and brute-forces bit_count(xor)."""
    import pyarrow.compute as pc

    from osmray.dedup import hamming_pairs

    reps = _phash_reps(sf_dir)
    pairs = hamming_pairs(
        reps, max_hamming=6, id_col="survivor_idx", sig_col="phash", n_bits=64
    )
    return pairs.map_batches(
        lambda t: t.filter(pc.greater(t["hamming"], 0)), batch_format="pyarrow"
    )


Q_PHASH_NEAR_DUP_SQL = f"""
WITH {_PH_CTES},
reps AS (SELECT phash, MIN(i) AS sid FROM phx GROUP BY phash)
SELECT LEAST(r1.sid, r2.sid) AS a, GREATEST(r1.sid, r2.sid) AS b,
       bit_count(xor(r1.phash, r2.phash)) AS hamming
FROM reps r1 JOIN reps r2 ON r1.sid < r2.sid
WHERE bit_count(xor(r1.phash, r2.phash)) BETWEEN 1 AND 6
"""


def q_minimap(sf_dir: str):
    """Diagnostic: mean color per tile (minimap.py:25-33 as an
    aggregate over decoded pixels), over the oracle fixture so the
    means have a DuckDB closed form: the separable gradient's
    per-channel mean is base_c + 6*a + 1.5 EXACTLY (the pixel sum is
    an integer and 65536 divides to a dyadic float; PNG is
    lossless)."""
    from osmray import codecs, oraclefix
    from osmray.pipeline import LabelJobConfig, make_assign_tiles
    from osmray.tilemath import MAXAR

    images, _feats = oraclefix.load()
    cfg = LabelJobConfig(bbox=oraclefix.bbox())
    assign = make_assign_tiles(cfg.z, MAXAR)

    def mean_color(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        means = np.asarray(
            [codecs.decode(b, f).mean(axis=(0, 1)) for b, f in zip(blobs, fmts)]
        )
        return pa.table(
            {
                "tile_key": batch["tile_key"],
                "mean_b": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_r": pa.array(means[:, 2]),
            }
        )

    from ray.data.aggregate import Mean

    return (
        images.map_batches(assign, batch_format="pyarrow")
        .map_batches(mean_color, batch_format="pyarrow")
        .groupby("tile_key")
        .aggregate(Mean("mean_b", alias_name="b"), Mean("mean_g", alias_name="g"),
                   Mean("mean_r", alias_name="r"))
    )


Q_MINIMAP_SQL = f"""
WITH {_OFX_BASE}
SELECT
  19*288230376151711744 + (290000 + u + 268435456)*536870912
    + (170000 + v + 268435456) AS tile_key,
  ((u*7 + v*11) % 8)*16 + 6*(1 + (u*3 + v*5) % 4) + 1.5 AS b,
  ((u*7 + v*11 + 1) % 8)*16 + 6*(1 + (u*3 + v*5) % 4) + 1.5 AS g,
  ((u*7 + v*11 + 2) % 8)*16 + 6*(1 + (u*3 + v*5) % 4) + 1.5 AS r
FROM univ
"""


def q_buildings_label_job(sf_dir: str):
    """make_buildings (reference make_buildings.py:20-59) run END TO
    END over the oracle fixture and hash-checked against a DuckDB
    closed form: polygon-VERTEX positives with skipedge(24)
    (make_buildings.py:36-47), seeded key sampling, the distributed
    painter drawing width-1 CLOSED OUTLINES of every building polygon
    (make_buildings.py:52-59; the oracle polygons are axis-aligned
    rectangles, so the outline tile set is the exact perimeter),
    complement negative sampling, yes/no labels, the decode->re-encode
    roundtrip (decoded-pixel sums + psnr/phash gates), and the tile-key
    hash64 train/valid split (seed+1, replayed via hash64_ctes), as in
    q_image_label_job."""
    import dataclasses

    from osmray import codecs, oraclefix, pipeline

    images, feats = oraclefix.load()
    bcfg = dataclasses.replace(pipeline.BUILDINGS, z=19, bbox=oraclefix.bbox(), limit=200)
    ds, _ = pipeline.run_label_job(images, feats, bcfg, mask=False, roundtrip=True)

    def summarize(batch: pa.Table) -> pa.Table:
        pix = [
            int(codecs.png_decode(b).astype(np.int64).sum())
            for b in batch["bytes"].to_pylist()
        ]
        return pa.table(
            {
                "image_id": batch["image_id"],
                "tx": batch["tx"],
                "ty": batch["ty"],
                "tile_key": batch["tile_key"],
                "cell": batch["cell"],
                "part_id": batch["part_id"],
                "label": batch["label"],
                "split": batch["split"],
                "caption": batch["caption"],
                "phash": batch["phash"],
                "pix_sum": pa.array(pix, pa.int64()),
                "psnr_ok": batch["psnr_ok"],
                "phash_ok": batch["phash_ok"],
                "decode_ok": batch["decode_ok"],
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


# The buildings twin replays: polygon rectangles from the oraclefix
# integer generators; vertex tiles passing skipedge(24); seeded
# hash-smallest key sampling (hash64 in HUGEINT limbs); the painted
# set as the exact rectangle-perimeter tile union (width-1 closed
# outline of an axis-aligned rectangle in 1px-per-tile canvas space);
# complement negatives; and the per-tile image attribute closed forms
# shared with Q_IMAGE_LABEL_JOB_SQL. 14336 = (64*256 - 2048); spans
# are < 8 tiles (dx,dy <= 1600 px), hence range(0, 8).
Q_BUILDINGS_LABEL_JOB_SQL = f"""
WITH {_OFX_BASE},
{_OFX_IMG},
pg AS (SELECT t.range AS r,
  (t.range*1117)%14336 AS ax, (t.range*2003)%14336 AS ay,
  128 + (t.range%24)*64 AS dx, 128 + ((t.range*5)%24)*64 AS dy
  FROM range(0, 240) t),
vtx AS (SELECT DISTINCT px // 256 AS u, py // 256 AS v FROM (
    SELECT ax AS px, ay AS py FROM pg
    UNION ALL SELECT ax + dx, ay FROM pg
    UNION ALL SELECT ax + dx, ay + dy FROM pg
    UNION ALL SELECT ax, ay + dy FROM pg)
  WHERE px % 256 BETWEEN 24 AND 231 AND py % 256 BETWEEN 24 AND 231),
vk AS (SELECT u, v,
  19*288230376151711744 + (290000 + u + 268435456)*536870912
    + (170000 + v + 268435456) AS key FROM vtx),
{hash64_ctes('ph', 'vk', 'u, v, key', 'key', 42)},
pos AS (SELECT u, v FROM ph5 ORDER BY h, key LIMIT 200),
otl AS (SELECT DISTINCT u, v FROM (
    SELECT ax//256 + s.range AS u, ay//256 AS v
      FROM pg CROSS JOIN range(0, 8) s WHERE ax//256 + s.range <= (ax+dx)//256
    UNION ALL
    SELECT ax//256 + s.range, (ay+dy)//256
      FROM pg CROSS JOIN range(0, 8) s WHERE ax//256 + s.range <= (ax+dx)//256
    UNION ALL
    SELECT ax//256, ay//256 + s.range
      FROM pg CROSS JOIN range(0, 8) s WHERE ay//256 + s.range <= (ay+dy)//256
    UNION ALL
    SELECT (ax+dx)//256, ay//256 + s.range
      FROM pg CROSS JOIN range(0, 8) s WHERE ay//256 + s.range <= (ay+dy)//256)),
freek AS (SELECT u, v,
    19*288230376151711744 + (290000 + u + 268435456)*536870912
      + (170000 + v + 268435456) AS key
    FROM univ ANTI JOIN otl USING (u, v)),
{hash64_ctes('nh', 'freek', 'u, v, key', 'key', 42)},
negs AS (SELECT u, v FROM nh5 ORDER BY h, key LIMIT 200),
labeled AS (SELECT u, v, 'yes' AS label FROM pos
            UNION ALL SELECT u, v, 'no' FROM negs),
{hash64_ctes('sh', 'labeled', 'u, v, label',
             '19*288230376151711744 + (290000 + u + 268435456)*536870912'
             ' + (170000 + v + 268435456)', 43)},
spl AS (SELECT u, v, label,
  CASE WHEN (CAST(h AS HUGEINT)
             + CASE WHEN h < 0 THEN 18446744073709551616 ELSE 0 END) % 1000 < 800
       THEN 'train' ELSE 'valid' END AS split FROM sh5)
SELECT
  'im' || CAST(10000 + l.v*100 + l.u AS VARCHAR) AS image_id,
  290000 + l.u AS tx, 170000 + l.v AS ty,
  19*288230376151711744 + (290000 + l.u + 268435456)*536870912
    + (170000 + l.v + 268435456) AS tile_key,
  12*288230376151711744 + (((290000 + l.u) // 128) % 4096)*536870912
    + ((170000 + l.v) // 128) AS cell,
  15*288230376151711744 + (((290000 + l.u) // 16) % 32768)*536870912
    + ((170000 + l.v) // 16) AS part_id,
  l.label, l.split,
  'cap ' || (290000 + l.u) || ' ' || (170000 + l.v) AS caption,
  i.ph AS phash, i.pix_sum,
  true AS psnr_ok, true AS phash_ok, true AS decode_ok
FROM spl l
JOIN imgp i USING (u, v)
"""


def q_expand_crops(sf_dir: str):
    """make_expand (/root/reference/make_expand.py:36-102) over the
    oracle fixture, fully hash-checked: the hash-ordered train/valid
    lamp split, skipedge on valid positives, the painter complement
    negative sample (key-sorted, positionally split), the re-centered
    ``wgs_at_tile`` negative crops (offset shift preserved), and the
    assembled mosaic crops themselves — checked as decoded-pixel sums
    with missing (off-canvas) slots black, plus n_missing counts."""
    from osmray import codecs, oraclefix, pipeline

    images, feats = oraclefix.load()
    cfg = pipeline.LabelJobConfig(bbox=oraclefix.bbox(), limit=400)
    ds = pipeline.run_expand_job(images, feats, cfg, train=300, valid=100)

    def summarize(batch: pa.Table) -> pa.Table:
        pix = [
            int(codecs.png_decode(b).astype(np.int64).sum())
            for b in batch["crop"].to_pylist()
        ]
        return pa.table(
            {
                "req_id": batch["req_id"],
                "label": batch["label"],
                "split": batch["split"],
                "kind": batch["kind"],
                "crop_h": batch["crop_h"].cast(pa.int64()),
                "crop_w": batch["crop_w"].cast(pa.int64()),
                "n_missing": batch["n_missing"].cast(pa.int64()),
                "pix_sum": pa.array(pix, pa.int64()),
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


# Sf(n) = sum_{x<n} x//64 for 0 <= n <= 256 (the separable-gradient
# 1-D prefix sum; t = n//64): 32*t*(t-1) + (n - 64*t)*t
def _sf(n: str) -> str:
    return (
        f"(32*(({n})//64)*((({n})//64) - 1) + (({n}) - 64*(({n})//64))*(({n})//64))"
    )


# pixel-sum contribution of canvas tile (tu, tv) to the crop rect
# [ax0, ax1) x [ay0, ay1) in canvas-local pixels: clip to the tile,
# then Sbase*area + 3a*dy*4*SumF + 3*dx*SumG (tiles outside the canvas
# contribute 0 — missing slots stay black)
_OFX_REGION = f"""
reg AS (
  SELECT rid, tu AS u, tv AS v,
    greatest(ax0, tu*256) - tu*256 AS xl, least(ax1, tu*256 + 256) - tu*256 AS xh,
    greatest(ay0, tv*256) - tv*256 AS yl, least(ay1, tv*256 + 256) - tv*256 AS yh
  FROM cover
  WHERE tu BETWEEN 0 AND 63 AND tv BETWEEN 0 AND 63
    AND greatest(ax0, tu*256) < least(ax1, tu*256 + 256)
    AND greatest(ay0, tv*256) < least(ay1, tv*256 + 256)),
regsum AS (
  SELECT rid, CAST(SUM(
      i.sbase * (xh - xl) * (yh - yl)
      + 3 * i.a * (yh - yl) * 4 * ({_sf('xh')} - {_sf('xl')})
      + 3 * (xh - xl) * ({_sf('yh')} - {_sf('yl')})
    ) AS BIGINT) AS pix_sum
  FROM reg JOIN imgp i USING (u, v) GROUP BY rid)"""


Q_EXPAND_CROPS_SQL = f"""
WITH {_OFX_BASE},
{_OFX_IMG},
lamps AS (SELECT * FROM nd WHERE lamp),
{hash64_ctes('lh', 'lamps', 'fid, un, vn, rxn, ryn', 'fid', 42)},
lrank AS (SELECT *, ROW_NUMBER() OVER (ORDER BY h, fid) - 1 AS rnk FROM lh5),
wt AS (SELECT DISTINCT gx0 + xx.range AS u, gy + yy.range AS v
       FROM wy CROSS JOIN range(0, 2) yy CROSS JOIN range(0, 16) xx
       WHERE xx.range <= gx1 + 1 - gx0),
dots AS (SELECT DISTINCT un AS u, vn AS v FROM nd WHERE lamp),
painted AS (SELECT u, v FROM wt UNION SELECT u, v FROM dots),
freek AS (SELECT u, v,
    19*288230376151711744 + (290000 + u + 268435456)*536870912
      + (170000 + v + 268435456) AS key
    FROM univ ANTI JOIN painted USING (u, v)),
{hash64_ctes('nh', 'freek', 'u, v, key', 'key', 42)},
neg400 AS (SELECT u, v, key FROM nh5 ORDER BY h, key LIMIT 400),
negr AS (SELECT u, v, ROW_NUMBER() OVER (ORDER BY key) - 1 AS i FROM neg400),
-- request windows: crop rect [ax0, ax1) x [ay0, ay1) in canvas-local px
reqs AS (
  SELECT rnk*4 + 0 AS rid, 'lamp' AS label, 'train' AS split, 'crop' AS kind,
         un*256 + rxn - 128 AS ax0, un*256 + rxn + 128 AS ax1,
         vn*256 + ryn - 128 AS ay0, vn*256 + ryn + 128 AS ay1
  FROM lrank WHERE rnk < 300
  UNION ALL
  SELECT (rnk - 300)*4 + 1, 'lamp', 'valid', 'tile',
         un*256, un*256 + 256, vn*256, vn*256 + 256
  FROM lrank WHERE rnk >= 300 AND rnk < 400
    AND rxn BETWEEN 16 AND 239 AND ryn BETWEEN 16 AND 239
  UNION ALL
  SELECT i*4 + 2, 'nolamp', 'train', 'crop',
         u*256 - 30, u*256 + 226, v*256 + 10, v*256 + 266
  FROM negr WHERE i < 300
  UNION ALL
  SELECT (i - 300)*4 + 3, 'nolamp', 'valid', 'tile',
         u*256, u*256 + 256, v*256, v*256 + 256
  FROM negr WHERE i >= 300),
-- tile cover of each crop rect (floor division on possibly-negative
-- coordinates must floor, not truncate)
cover AS (
  SELECT r.*, CAST(floor(ax0 / 256.0) AS BIGINT) + dx.range AS tu,
         CAST(floor(ay0 / 256.0) AS BIGINT) + dy.range AS tv
  FROM reqs r CROSS JOIN range(0, 2) dx CROSS JOIN range(0, 2) dy
  WHERE CAST(floor(ax0 / 256.0) AS BIGINT) + dx.range
          <= CAST(floor((ax1 - 1) / 256.0) AS BIGINT)
    AND CAST(floor(ay0 / 256.0) AS BIGINT) + dy.range
          <= CAST(floor((ay1 - 1) / 256.0) AS BIGINT)),
{_OFX_REGION},
nmiss AS (
  SELECT rid, CAST(COUNT(*) FILTER (WHERE tu < 0 OR tu > 63 OR tv < 0 OR tv > 63)
    AS BIGINT) AS n_missing
  FROM cover GROUP BY rid)
SELECT r.rid AS req_id, r.label, r.split, r.kind,
  (r.ay1 - r.ay0) AS crop_h, (r.ax1 - r.ax0) AS crop_w,
  COALESCE(nm.n_missing, 0) AS n_missing,
  COALESCE(rs.pix_sum, 0) AS pix_sum
FROM reqs r
LEFT JOIN nmiss nm ON nm.rid = r.rid
LEFT JOIN regsum rs ON rs.rid = r.rid
"""


def q_roofshapes(sf_dir: str):
    """make_roofshapes (/root/reference/make_roofshapes.py:20-53) over
    the oracle fixture, fully hash-checked: per-polygon padded mosaic
    windows (tiles_way pad = max(side/4, 48px), the boundary-tile
    inclusion when a padded edge lands on a tile seam), the
    128<=h,w<1024 size gate, missing-tile black fill, and the
    assembled crops themselves as decoded-pixel sums."""
    from osmray import codecs, oraclefix, pipeline

    images, feats = oraclefix.load()
    cfg = pipeline.LabelJobConfig(bbox=oraclefix.bbox())
    ds, _counts = pipeline.run_roofshapes_job(images, feats, cfg)

    def summarize(batch: pa.Table) -> pa.Table:
        pix = [
            int(codecs.png_decode(b).astype(np.int64).sum())
            for b in batch["crop"].to_pylist()
        ]
        return pa.table(
            {
                "req_id": batch["req_id"],
                "label": batch["label"],
                "crop_h": batch["crop_h"].cast(pa.int64()),
                "crop_w": batch["crop_w"].cast(pa.int64()),
                "n_tiles": batch["n_tiles"].cast(pa.int64()),
                "n_missing": batch["n_missing"].cast(pa.int64()),
                "pix_sum": pa.array(pix, pa.int64()),
            }
        )

    return ds.map_batches(summarize, batch_format="pyarrow")


Q_ROOFSHAPES_SQL = f"""
WITH {_OFX_BASE},
{_OFX_IMG},
poly AS (SELECT t.range AS r, 9000 + t.range AS req_id,
    (t.range*1117) % 14336 AS ax, (t.range*2003) % 14336 AS ay,
    128 + (t.range % 24)*64 AS dx, 128 + ((t.range*5) % 24)*64 AS dy
  FROM range(0, 240) t),
pp AS (SELECT *, greatest(dx // 4, 48) AS padx, greatest(dy // 4, 48) AS pady,
    CASE r % 3 WHEN 0 THEN 'flat' WHEN 1 THEN 'gabled' ELSE 'hipped' END AS label
  FROM poly),
win AS (SELECT *, ax - padx AS cx0, ax + dx + padx AS cx1,
    ay - pady AS cy0, ay + dy + pady AS cy1,
    dx + 2*padx AS crop_w, dy + 2*pady AS crop_h FROM pp),
kept AS (SELECT * FROM win WHERE crop_w < 1024 AND crop_h < 1024),
-- window tile grid: INCLUDES the boundary tile when a padded east or
-- south edge lands exactly on a tile seam (tiles_way counts it with a
-- zero-width residual), hence floor(cx1/256), not floor((cx1-1)/256)
wcov AS (SELECT req_id,
    CAST(floor(cx0 / 256.0) AS BIGINT) + du.range AS tu,
    CAST(floor(cy0 / 256.0) AS BIGINT) + dv.range AS tv
  FROM kept CROSS JOIN range(0, 7) du CROSS JOIN range(0, 7) dv
  WHERE CAST(floor(cx0 / 256.0) AS BIGINT) + du.range
          <= CAST(floor(cx1 / 256.0) AS BIGINT)
    AND CAST(floor(cy0 / 256.0) AS BIGINT) + dv.range
          <= CAST(floor(cy1 / 256.0) AS BIGINT)),
miss AS (SELECT req_id, CAST(COUNT(*) AS BIGINT) AS n_tiles,
    CAST(COUNT(*) FILTER (WHERE tu < 0 OR tu > 63 OR tv < 0 OR tv > 63)
      AS BIGINT) AS n_missing
  FROM wcov GROUP BY req_id),
cover AS (SELECT req_id AS rid, cx0 AS ax0, cx1 AS ax1, cy0 AS ay0, cy1 AS ay1,
    CAST(floor(cx0 / 256.0) AS BIGINT) + du.range AS tu,
    CAST(floor(cy0 / 256.0) AS BIGINT) + dv.range AS tv
  FROM kept CROSS JOIN range(0, 6) du CROSS JOIN range(0, 6) dv
  WHERE CAST(floor(cx0 / 256.0) AS BIGINT) + du.range
          <= CAST(floor((cx1 - 1) / 256.0) AS BIGINT)
    AND CAST(floor(cy0 / 256.0) AS BIGINT) + dv.range
          <= CAST(floor((cy1 - 1) / 256.0) AS BIGINT)),
{_OFX_REGION}
SELECT k.req_id, k.label, k.crop_h, k.crop_w,
  m.n_tiles, m.n_missing,
  COALESCE(rs.pix_sum, 0) AS pix_sum
FROM kept k JOIN miss m USING (req_id)
LEFT JOIN regsum rs ON rs.rid = k.req_id
"""


def _media_summary(batch: pa.Table, extra: tuple[str, ...] = ()) -> pa.Table:
    """decode -> (pix_sum, phash) of the stage's OUTPUT bytes: the
    integer-exact observables the SQL twins replay."""
    from osmray import codecs

    pix, ph = [], []
    for b in batch["bytes"].to_pylist():
        img = codecs.png_decode(b)
        pix.append(int(img.astype(np.int64).sum()))
        ph.append(int(codecs.phash(img)))
    cols = {
        "idx": batch["idx"],
        "w": batch["w"],
        "h": batch["h"],
        "pix_sum": pa.array(pix, pa.int64()),
        "phash": pa.array(ph, pa.int64()),
    }
    for c in extra:
        cols[c] = batch[c]
    return pa.table(cols)


def q_image_resize(sf_dir: str):
    """Multimodal: decode -> block-mean resize -> re-encode actor
    stage, over the planted-phash fixture so the resized output has a
    DuckDB closed form: 4x4 block means of constant 32x32 blocks are
    the block values themselves, so the 64x64 result is the 8x8
    pattern at 8 px/cell — pix_sum = 3*64*(160*popcount + 2560) and
    the resized phash equals the planted pattern."""
    from osmray import oraclefix
    from osmray.multimodal import ImageResizeStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    out = images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        ImageResizeStage,
        fn_constructor_kwargs={"out_h": 64, "out_w": 64},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )
    return out.map_batches(_media_summary, batch_format="pyarrow")


Q_IMAGE_RESIZE_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS n1 FROM phbits GROUP BY i)
SELECT phx.i AS idx, 64 AS w, 64 AS h,
       CAST(3*64*(160*pc.n1 + 2560) AS BIGINT) AS pix_sum, phx.phash
FROM phx JOIN pc USING (i)
"""


def q_image_augment(sf_dir: str):
    """Deterministic image augmentation (decode -> hflip/vflip/rot90/
    brightness/identity -> re-encode) as an actor-pool stage over the
    planted-phash fixture, the op picked per row as idx % 5 (carried
    in a column — AugmentStage op_col). Every op has a closed form on
    constant-block images: flips/rot90 permute the 8x8 bit grid,
    brightness(+24) shifts the pixel sum by 3*65536*24 and leaves the
    pattern; the SQL twin replays the bit permutations."""
    from osmray import oraclefix
    from osmray.multimodal import AUGMENT_OPS, AugmentStage

    images = oraclefix.load_phash()

    def with_op(batch: pa.Table) -> pa.Table:
        idx = batch["idx"].to_numpy(zero_copy_only=False)
        ops = [AUGMENT_OPS[int(i) % 5] for i in idx]
        return batch.select(["image_id", "bytes", "fmt", "idx"]).append_column(
            "op", pa.array(ops, pa.string())
        )

    out = images.map_batches(with_op, batch_format="pyarrow").map_batches(
        AugmentStage,
        fn_constructor_kwargs={"op_col": "op"},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )
    return out.map_batches(
        lambda t: _media_summary(t, extra=("aug",)), batch_format="pyarrow"
    )


# AUGMENT_OPS order: identity, hflip, vflip, rot90, brightness.
# Bit j = 8*r + c of the AUGMENTED pattern reads source bit jo:
# hflip (r, 7-c); vflip (7-r, c); rot90 ccw new(r,c) = old(c, 7-r).
Q_IMAGE_AUGMENT_SQL = f"""
WITH {_PH_CTES},
ops AS (SELECT i,
    CASE i % 5 WHEN 0 THEN 'identity' WHEN 1 THEN 'hflip'
      WHEN 2 THEN 'vflip' WHEN 3 THEN 'rot90' ELSE 'brightness' END AS aug
    FROM range(0, 1024) t(i)),
src AS (SELECT o.i, o.aug, jn.range AS jn,
    CASE o.aug
      WHEN 'hflip' THEN 8*(jn.range//8) + (7 - jn.range%8)
      WHEN 'vflip' THEN 8*(7 - jn.range//8) + jn.range%8
      WHEN 'rot90' THEN 8*(jn.range%8) + (7 - jn.range//8)
      ELSE jn.range END AS jo
    FROM ops o CROSS JOIN range(0, 64) jn),
av AS (SELECT s.i, s.aug,
    SUM(CASE WHEN pb.bit = 1 THEN CAST(1 AS HUGEINT) << (63 - s.jn)
        ELSE CAST(0 AS HUGEINT) END) AS pv,
    CAST(SUM(pb.bit) AS BIGINT) AS n1
    FROM src s JOIN phbits pb ON pb.i = s.i AND pb.j = s.jo
    GROUP BY s.i, s.aug)
SELECT i AS idx, 256 AS w, 256 AS h,
    CAST(CASE WHEN aug = 'brightness'
      THEN 3*1024*(160*n1 + 2560) + 3*65536*24
      ELSE 3*1024*(160*n1 + 2560) END AS BIGINT) AS pix_sum,
    CAST(CASE WHEN pv >= 9223372036854775808
      THEN pv - 18446744073709551616 ELSE pv END AS BIGINT) AS phash,
    aug
FROM av
"""


def _planted_pcm(i: int, n: int) -> np.ndarray:
    """Integer sawtooth pcm[t] = ((t*a + b) % 4096) - 2048 with
    a = 3 + 2*(i%5), b = (i*17) % 4096: int16-exact, and every audio
    feature has a bit-exact SQL form (frame sums of squares are
    integers < 2^53, /1024 is dyadic, sqrt and /1023.0 are single
    correctly-rounded IEEE ops in both engines)."""
    a = 3 + 2 * (i % 5)
    b = (i * 17) % 4096
    t = np.arange(n, dtype=np.int64)
    return (((t * a + b) % 4096) - 2048).astype(np.int16)


def q_audio_features(sf_dir: str):
    """Multimodal audio: REAL RIFF/PCM16 wav bytes (from-scratch
    wav_encode/wav_decode, no audio library) -> per-frame RMS/ZCR via
    an actor pool; allow_fake is OFF. The planted integer sawtooth
    makes the decoded features a DuckDB closed form (flattened to one
    row per frame — scalar columns hash deterministically). Compressed
    codecs (flac/mp3) remain the documented env stub."""
    import ray.data

    from osmray.multimodal import AudioFeatureStage, wav_encode

    n = 128
    rows = [
        {
            "media_id": f"aud{i:05d}",
            "bytes": wav_encode(
                _planted_pcm(i, 16384 + (i % 7) * 1000), 16000
            ),
            "fmt": "wav",
            "sample_rate": 16000,
            "n_samples": 16384 + (i % 7) * 1000,
        }
        for i in range(n)
    ]

    def flat(batch: pa.Table) -> pa.Table:
        mids, frs, rms, zcr = [], [], [], []
        for mid, fv in zip(batch["media_id"].to_pylist(), batch["features"].to_pylist()):
            k = len(fv) // 2
            for f in range(k):
                mids.append(mid)
                frs.append(f)
                rms.append(fv[f])
                zcr.append(fv[k + f])
        return pa.table(
            {
                "media_id": pa.array(mids, pa.string()),
                "frame_no": pa.array(frs, pa.int64()),
                "rms": pa.array(rms, pa.float64()),
                "zcr": pa.array(zcr, pa.float64()),
            }
        )

    return (
        ray.data.from_items(rows)
        .map_batches(AudioFeatureStage, batch_format="pyarrow", concurrency=2, num_cpus=1)
        .map_batches(flat, batch_format="pyarrow")
    )


Q_AUDIO_FEATURES_SQL = """
WITH au AS (SELECT ii.range AS i, 3 + 2*(ii.range % 5) AS a,
                   (ii.range*17) % 4096 AS b FROM range(0, 128) ii),
smp AS (SELECT i, tt.range AS t, ((tt.range * a + b) % 4096) - 2048 AS v
        FROM au CROSS JOIN range(0, 16384) tt),
fr AS (SELECT i, t // 1024 AS frame_no, t % 1024 AS ti, v FROM smp),
rmsq AS (SELECT i, frame_no,
         sqrt(CAST(SUM(CAST(v AS BIGINT)*v) AS BIGINT) / 1024.0) AS rms
         FROM fr GROUP BY i, frame_no),
flips AS (SELECT i, frame_no,
          (v < 0) <> lead(v < 0) OVER (PARTITION BY i, frame_no ORDER BY ti) AS flip
          FROM fr),
zq AS (SELECT i, frame_no,
       CAST(SUM(CASE WHEN flip THEN 1 ELSE 0 END) AS BIGINT) / 1023.0 AS zcr
       FROM flips WHERE flip IS NOT NULL GROUP BY i, frame_no)
SELECT 'aud' || lpad(CAST(r.i AS VARCHAR), 5, '0') AS media_id,
       r.frame_no, r.rms, z.zcr
FROM rmsq r JOIN zq z ON z.i = r.i AND z.frame_no = r.frame_no
"""


def q_frame_sample(sf_dir: str):
    """Multimodal plumbing: video binary column -> k sampled frames
    (decode is the documented deterministic STUB). The sampled index
    set is pure integer stride math, so it carries a SQL twin even
    though the frame bytes themselves are env-stubbed."""
    import ray.data

    from osmray.multimodal import FrameSampleStage

    rows = [
        {
            "media_id": f"vid{i:04d}",
            "bytes": b"\x00",
            "fmt": "mp4",
            "n_frames": 60 + i % 40,
            "fps": 30.0,
            "w": 64,
            "h": 48,
        }
        for i in range(64)
    ]
    return ray.data.from_items(rows).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"k": 4, "allow_fake": True},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    ).select_columns(["media_id", "frame_idx"])


Q_FRAME_SAMPLE_SQL = """
WITH v AS (SELECT ii.range AS i, 60 + ii.range % 40 AS nf FROM range(0, 64) ii),
s AS (SELECT i, nf, GREATEST(1, nf // 4) AS step FROM v)
SELECT 'vid' || lpad(CAST(i AS VARCHAR), 4, '0') AS media_id,
       CAST(jj.range AS INTEGER) AS frame_idx
FROM s CROSS JOIN range(0, 128) jj
WHERE jj.range % step = 0 AND jj.range < LEAST(nf, 4*step)
"""


def q_bloom_semi_join(sf_dir: str):
    """Bloom-pre-filtered semi join: lineitem probed against a ~3 %
    hash-sampled orders key set. The ENTIRE sketch is SQL-replayed —
    the twin rebuilds the same bit set from the same mod-prime hashes,
    so the output (Bloom survivors INCLUDING false positives, with
    exact membership marked by the grace verify) hash-checks the
    bitmap bit-for-bit, not just the final join result."""
    from osmray.joins import bloom_semi_join

    small = _read(sf_dir, "orders", ["o_orderkey"])

    def pred(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((k * 2654435761) % 100 < 3))

    small = small.map_batches(pred, batch_format="pyarrow")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def proj(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pid": pa.array(ok * 10 + ln), "l_orderkey": pa.array(ok)})

    left = li.map_batches(proj, batch_format="pyarrow")
    return bloom_semi_join(left, small, on="l_orderkey", right_on="o_orderkey",
                           m_bits=65536, mark="is_match")


Q_BLOOM_SEMI_JOIN_SQL = """
WITH small AS (
  SELECT o_orderkey AS k FROM orders WHERE (o_orderkey * 2654435761) % 100 < 3
),
bits AS (
  SELECT ((abs(k) % 2147483647) * 48271 % 2147483647) % 65536 AS b FROM small
  UNION
  SELECT ((abs(k) % 2147483629) * 16807 % 2147483629) % 65536 FROM small
),
l AS (SELECT l_orderkey * 10 + l_linenumber AS pid, l_orderkey FROM lineitem)
SELECT pid, l_orderkey, l_orderkey IN (SELECT k FROM small) AS is_match
FROM l
WHERE ((abs(l_orderkey) % 2147483647) * 48271 % 2147483647) % 65536 IN (SELECT b FROM bits)
  AND ((abs(l_orderkey) % 2147483629) * 16807 % 2147483629) % 65536 IN (SELECT b FROM bits)
"""


def q_cell_compact(sf_dir: str):
    """Hierarchical-index compact (the H3-compact analog): the set of
    res-8 cells occupied by lineitem points, with every complete
    sibling quad recursively replaced by its parent — two shuffles at
    any scale (group by res-4 ancestor, in-memory per-group compact,
    bounded finish task). The SQL twin unrolls the promotion levels."""
    from osmray.cells import compact_cells

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def occupied(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        cell = (np.int64(8) << 58) | ((p["m1"] >> 18) << 29) | (p["m2"] >> 18)
        return pa.table({"cell": pa.array(np.unique(cell))})

    cells = ds.map_batches(occupied, batch_format="pyarrow")
    return compact_cells(cells, coarse_res=4)


def _cell_compact_sql() -> str:
    """Unrolled compact levels 8 -> 0. Cell ids are pure arithmetic
    (res*2^58 + x*2^29 + y); parent(cell at res r) =
    (r-1)*2^58 + (x//2)*2^29 + y//2."""
    R58, R29 = 1 << 58, 1 << 29
    parts = [
        f"WITH p AS ({_LI_SQL}),",
        f"c8 AS (SELECT DISTINCT 8*{R58} + (m1 // 262144)*{R29} + (m2 // 262144) AS cell FROM p)",
    ]
    for r in range(8, 0, -1):
        par = (f"({r - 1})*{R58} + (((cell - {r}*{R58}) // {R29}) // 2)*{R29}"
               f" + ((cell % {R29}) // 2)")
        parts.append(
            f", g{r} AS (SELECT {par} AS par, count(*) AS n FROM c{r} GROUP BY 1)"
        )
        parts.append(f", c{r - 1} AS (SELECT par AS cell FROM g{r} WHERE n = 4)")
        parts.append(
            f", f{r} AS (SELECT cell FROM c{r} WHERE {par} NOT IN (SELECT cell FROM c{r - 1}))"
        )
    selects = [f"SELECT cell FROM f{r}" for r in range(8, 0, -1)]
    selects.append("SELECT cell FROM c0")
    union = " UNION ALL ".join(selects)
    return "\n".join(parts) + f"\nSELECT cell, cell // {R58} AS res FROM ({union})"


Q_CELL_COMPACT_SQL = _cell_compact_sql()


def q_bm25(sf_dir: str):
    """BM25 top-20 retrieval for a fixed 4-term query over documents —
    the ranked-search op on top of the inverted-index stats. Scores
    are quantized to integer millis per term BEFORE summing (order-
    free), idf is floor(1e6*ln) on both engines, and every other float
    op is the identical IEEE expression tree, so the ranking is
    hash-exact in SQL."""
    from osmray.text import bm25_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(ds, ["hash", "join", "stream", "vector"], k=20)


Q_BM25_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ('hash', 'join', 'stream', 'vector') GROUP BY doc_id, term
),
g AS (SELECT (SELECT count(*) FROM documents) AS n,
             (SELECT sum(dl) FROM dl) AS sum_dl),
idf AS (
  SELECT term, FLOOR(1000000 * LN((g.n - count(*) + 0.5) / (count(*) + 0.5) + 1.0)) AS idf_i
  FROM tf, g GROUP BY term, g.n
),
sc AS (
  SELECT tf.doc_id,
    CAST(SUM(CAST(FLOOR(idf.idf_i * (tf.tf * 2.25)
      / (tf.tf + 1.25 * ((1.0 - 0.75) + 0.75 * ((dl.dl * g.n) / g.sum_dl)))
      / 1000.0) AS BIGINT)) AS BIGINT) AS score_milli
  FROM tf JOIN dl USING (doc_id) JOIN idf USING (term), g
  GROUP BY tf.doc_id
)
SELECT doc_id, score_milli,
  CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rank
FROM sc WHERE score_milli > 0
QUALIFY rank <= 20
"""


def q_lag_lead(sf_dir: str):
    """Per-user LAG/LEAD timestamp deltas over events — the window-
    navigation op (reference has no equivalent; engine add for the
    events table). Sort-based: interior rows emit vectorized diffs,
    only the two edge rows of each block hit the per-key fix-up
    (windows.lag_lead_sorted). All values are integer microseconds,
    so the SQL window twin is hash-exact."""
    from osmray.windows import lag_lead_sorted

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return lag_lead_sorted(ds, key="user_id", ts="ts", id_col="event_id")


Q_LAG_LEAD_SQL = """
SELECT event_id, user_id,
  CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1) AS BIGINT) AS lag_us,
  CAST(coalesce(lead(epoch_us(ts)) OVER w - epoch_us(ts), -1) AS BIGINT) AS lead_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_pivot(sf_dir: str):
    """PIVOT events long -> wide: per user, count + cents sum per
    event_type as columns (tableops.pivot_counts). The shuffle moves
    one pre-aggregated wide row per (block, user), never raw events;
    integer cents keep the FILTER-aggregate SQL twin hash-exact."""
    from osmray.tableops import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])
    return pivot_counts(ds, "user_id", "event_type",
                        ["click", "view", "signup", "purchase", "error"],
                        val_col="value")


def _pivot_sql() -> str:
    parts = ["SELECT user_id"]
    for c in ["click", "view", "signup", "purchase", "error"]:
        parts.append(
            f", CAST(count(*) FILTER (event_type = '{c}') AS BIGINT) AS n_{c}"
        )
        parts.append(
            f", CAST(coalesce(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) "
            f"FILTER (event_type = '{c}'), 0) AS BIGINT) AS cents_{c}"
        )
    parts.append(" FROM events GROUP BY user_id")
    return "".join(parts)


Q_PIVOT_SQL = _pivot_sql()


def q_heavy_hitters(sf_dir: str):
    """Exact top-25 most frequent tokens of the document corpus via
    mergeable Misra-Gries candidate summaries + one exact recount of
    the surviving candidates (tableops.heavy_hitters) — raw tokens
    never shuffle; the groupby sees only capped per-block summaries."""
    from osmray.tableops import heavy_hitters

    ds = _read(sf_dir, "documents", ["text"])
    return heavy_hitters(ds, "text", k=25, capacity=512, tokens=True)


Q_HEAVY_HITTERS_SQL = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS value
  FROM documents
),
c AS (SELECT value, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY value)
SELECT value, n,
  CAST(row_number() OVER (ORDER BY n DESC, value) AS BIGINT) AS rank
FROM c ORDER BY n DESC, value LIMIT 25
"""


def q_rollup_cells(sf_dir: str):
    """Hierarchical ROLLUP (GROUPING SETS over the cell pyramid):
    lineitem point counts at res 8/6/4/2/0 in one pass — per-block
    partials for every level at once, one bounded shuffle
    (cells.rollup_cells)."""
    from osmray.cells import rollup_cells

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def to_cells(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        cell = (np.int64(8) << 58) | ((p["m1"] >> 18) << 29) | (p["m2"] >> 18)
        return pa.table({"cell": pa.array(cell)})

    return rollup_cells(ds.map_batches(to_cells, batch_format="pyarrow"),
                        levels=(8, 6, 4, 2, 0))


def _rollup_cells_sql() -> str:
    R58, R29 = 1 << 58, 1 << 29
    sels = []
    for a in (8, 6, 4, 2, 0):
        sh = 1 << (8 - a)
        sels.append(
            f"SELECT {a}*{R58} + ((m1 // 262144) // {sh})*{R29}"
            f" + ((m2 // 262144) // {sh}) AS cell,"
            f" CAST(count(*) AS BIGINT) AS n, CAST({a} AS BIGINT) AS res"
            f" FROM p GROUP BY 1"
        )
    return f"WITH p AS ({_LI_SQL})\n" + "\nUNION ALL\n".join(sels)


Q_ROLLUP_CELLS_SQL = _rollup_cells_sql()


def q_regex_extract(sf_dir: str):
    """Structured-field extraction: named-group regex capture over the
    documents text (word before ' table', first word pair) — RE2 on
    both engines (pyarrow extract_regex / DuckDB regexp_extract), ''
    on no match, so values are hash-exact."""
    from osmray.text import regex_extract

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = regex_extract(ds, "text",
                       r"(?P<w1>[a-z0-9_]+) (?P<w2>[a-z0-9_]+)",
                       ["w1", "w2"], keep=["doc_id", "text"])
    return regex_extract(ds, "text", r"(?P<before_table>[a-z0-9_]+) table",
                         ["before_table"], keep=["doc_id", "w1", "w2"])


Q_REGEX_EXTRACT_SQL = """
SELECT doc_id,
  regexp_extract(text, '([a-z0-9_]+) ([a-z0-9_]+)', 1) AS w1,
  regexp_extract(text, '([a-z0-9_]+) ([a-z0-9_]+)', 2) AS w2,
  regexp_extract(text, '([a-z0-9_]+) table', 1) AS before_table
FROM documents
"""


def q_triangles(sf_dir: str):
    """Exact per-vertex triangle counts on a synthesized 4096-node
    graph (graph.triangles): orient/dedup -> wedge grace join ->
    closing-edge grace semi join -> keyed count. No driver state at
    any step; the SQL twin is the textbook three-way self-join."""
    from osmray.graph import triangles

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def edges(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"u": pa.array(p["m1"] % 4096),
                         "v": pa.array(p["m2"] % 4096)})

    return triangles(ds.map_batches(edges, batch_format="pyarrow"), num_buckets=8)


Q_TRIANGLES_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 4096 AS u, m2 % 4096 AS v FROM p WHERE m1 % 4096 <> m2 % 4096),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw)
SELECT e1.a AS u, CAST(count(*) AS BIGINT) AS n_tri
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
GROUP BY e1.a
"""


def q_bbox_join(sf_dir: str):
    """Large-x-large box-overlap spatial join (part boxes x orders
    boxes in a 65536^2 integer world) via the PBSM grid plan
    (joins.box_overlap_join): explode to covering cells, ONE grace
    join, exact predicate + reporting-cell dedup — no distinct
    shuffle, no broadcast side. All-integer, so the cross-join SQL
    twin is hash-exact."""
    from osmray.joins import box_overlap_join

    def part_boxes(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 128 + (k * 7919) % 65280
        cy = 128 + (k * 6151) % 65280
        w = 1 + k % 64
        h = 1 + (k * 31) % 64
        return pa.table({"id": pa.array(k), "x0": pa.array(cx - w),
                         "y0": pa.array(cy - h), "x1": pa.array(cx + w),
                         "y1": pa.array(cy + h)})

    def order_boxes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 128 + (k * 104729) % 65280
        cy = 128 + (k * 99991) % 65280
        w = 1 + k % 48
        h = 1 + (k * 17) % 48
        return pa.table({"id": pa.array(k), "x0": pa.array(cx - w),
                         "y0": pa.array(cy - h), "x1": pa.array(cx + w),
                         "y1": pa.array(cy + h)})

    left = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        part_boxes, batch_format="pyarrow")
    right = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        order_boxes, batch_format="pyarrow")
    return box_overlap_join(left, right, cell_shift=8)


Q_BBOX_JOIN_SQL = """
WITH a AS (
  SELECT p_partkey AS id,
    128 + (p_partkey * 7919) % 65280 AS cx, 128 + (p_partkey * 6151) % 65280 AS cy,
    1 + p_partkey % 64 AS w, 1 + (p_partkey * 31) % 64 AS h
  FROM part
),
b AS (
  SELECT o_orderkey AS id,
    128 + (o_orderkey * 104729) % 65280 AS cx, 128 + (o_orderkey * 99991) % 65280 AS cy,
    1 + o_orderkey % 48 AS w, 1 + (o_orderkey * 17) % 48 AS h
  FROM orders
)
SELECT a.id AS a_id, b.id AS b_id
FROM a, b
WHERE a.cx - a.w < b.cx + b.w AND b.cx - b.w < a.cx + a.w
  AND a.cy - a.h < b.cy + b.h AND b.cy - b.h < a.cy + a.h
"""


def q_polygon_stats(sf_dir: str):
    """Polygon geometry kernel under the oracle: per-order L-shaped
    rings (6 integer vertices) -> signed shoelace area2, sum of
    squared edge lengths, centroid numerators (geom.ring_stats — one
    vectorized pass over ALL rings, no per-ring Python). The SQL twin
    replays the generic shoelace over exploded vertices with a
    wraparound window."""
    from osmray.geom import ring_stats

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def stats(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = (k * 7) % 1000
        x1 = 1100 + (k * 13) % 1000
        x2 = 2200 + (k * 17) % 1000
        y0 = (k * 19) % 1000
        y1 = 1100 + (k * 23) % 1000
        y2 = 2200 + (k * 29) % 1000
        # L-shape (CCW): (x0,y0)(x2,y0)(x2,y1)(x1,y1)(x1,y2)(x0,y2)
        xs = np.stack([x0, x2, x2, x1, x1, x0], axis=1).ravel()
        ys = np.stack([y0, y0, y1, y1, y2, y2], axis=1).ravel()
        offsets = np.arange(len(k) + 1, dtype=np.int64) * 6
        a2, p2, cxn, cyn, nv = ring_stats(xs, ys, offsets)
        return pa.table(
            {"oid": pa.array(k), "area2": pa.array(a2), "perim2": pa.array(p2),
             "cx_num": pa.array(cxn), "cy_num": pa.array(cyn),
             "n_vertices": pa.array(nv)}
        )

    return ds.map_batches(stats, batch_format="pyarrow")


Q_POLYGON_STATS_SQL = """
WITH o AS (
  SELECT o_orderkey AS k,
    (o_orderkey * 7) % 1000 AS x0, 1100 + (o_orderkey * 13) % 1000 AS x1,
    2200 + (o_orderkey * 17) % 1000 AS x2,
    (o_orderkey * 19) % 1000 AS y0, 1100 + (o_orderkey * 23) % 1000 AS y1,
    2200 + (o_orderkey * 29) % 1000 AS y2
  FROM orders
),
v AS (
  SELECT k, 0 AS i, x0 AS x, y0 AS y FROM o UNION ALL
  SELECT k, 1, x2, y0 FROM o UNION ALL
  SELECT k, 2, x2, y1 FROM o UNION ALL
  SELECT k, 3, x1, y1 FROM o UNION ALL
  SELECT k, 4, x1, y2 FROM o UNION ALL
  SELECT k, 5, x0, y2 FROM o
),
nx AS (
  SELECT k, x, y,
    coalesce(lead(x) OVER w, first_value(x) OVER w) AS xn,
    coalesce(lead(y) OVER w, first_value(y) OVER w) AS yn
  FROM v WINDOW w AS (PARTITION BY k ORDER BY i)
)
SELECT k AS oid,
  CAST(sum(x * yn - xn * y) AS BIGINT) AS area2,
  CAST(sum((xn - x) * (xn - x) + (yn - y) * (yn - y)) AS BIGINT) AS perim2,
  CAST(sum((x + xn) * (x * yn - xn * y)) AS BIGINT) AS cx_num,
  CAST(sum((y + yn) * (x * yn - xn * y)) AS BIGINT) AS cy_num,
  CAST(count(*) AS BIGINT) AS n_vertices
FROM nx GROUP BY k
"""


def q_clip(sf_dir: str):
    """Sutherland-Hodgman polygon clipping under the oracle: per-order
    L-shaped rings (1/7 of them translated fully outside) clipped to
    the box (500,500,2500,2500) via geom.clip_rings_box — 4 vectorized
    passes across ALL rings at once, no per-ring Python. Every
    intersection is the same IEEE-double expression tree the SQL twin
    unrolls (4 window passes), so vertices hash bit-exact."""
    from osmray.geom import clip_rings_box

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def clip(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        shift = 4000 * (k % 7 == 0)
        x0 = (k * 7) % 1000 + shift
        x1 = 1100 + (k * 13) % 1000 + shift
        x2 = 2200 + (k * 17) % 1000 + shift
        y0 = (k * 19) % 1000
        y1 = 1100 + (k * 23) % 1000
        y2 = 2200 + (k * 29) % 1000
        xs = np.stack([x0, x2, x2, x1, x1, x0], axis=1).ravel()
        ys = np.stack([y0, y0, y1, y1, y2, y2], axis=1).ravel()
        offsets = np.arange(len(k) + 1, dtype=np.int64) * 6
        cx, cy, co = clip_rings_box(xs, ys, offsets, (500.0, 500.0, 2500.0, 2500.0))
        nv = np.diff(co)
        oid = np.repeat(k, nv)
        i = np.arange(len(cx)) - np.repeat(co[:-1], nv)
        return pa.table({"oid": pa.array(oid), "i": pa.array(i.astype(np.int64)),
                         "x": pa.array(cx), "y": pa.array(cy)})

    return ds.map_batches(clip, batch_format="pyarrow")


def _clip_sql() -> str:
    head = """
WITH o AS (
  SELECT o_orderkey AS k, 4000 * CAST(o_orderkey % 7 = 0 AS BIGINT) AS sh
  FROM orders
),
g AS (
  SELECT k,
    (k * 7) % 1000 + sh AS x0, 1100 + (k * 13) % 1000 + sh AS x1,
    2200 + (k * 17) % 1000 + sh AS x2,
    (k * 19) % 1000 AS y0, 1100 + (k * 23) % 1000 AS y1,
    2200 + (k * 29) % 1000 AS y2
  FROM o
),
v0 AS (
  SELECT k, i, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM (
    SELECT k, 0 AS i, x0 AS x, y0 AS y FROM g UNION ALL
    SELECT k, 1, x2, y0 FROM g UNION ALL
    SELECT k, 2, x2, y1 FROM g UNION ALL
    SELECT k, 3, x1, y1 FROM g UNION ALL
    SELECT k, 4, x1, y2 FROM g UNION ALL
    SELECT k, 5, x0, y2 FROM g
  )
)"""
    parts = [head]
    passes = [("x", 500.0, ">="), ("x", 2500.0, "<="),
              ("y", 500.0, ">="), ("y", 2500.0, "<=")]
    for p, (ax, c, op) in enumerate(passes):
        a, an = (("x", "xn") if ax == "x" else ("y", "yn"))
        if ax == "x":
            ix, iy = f"{c}", f"y + (yn - y) * ({c} - x) / (xn - x)"
        else:
            ix, iy = f"x + (xn - x) * ({c} - y) / (yn - y)", f"{c}"
        parts.append(f""",
e{p} AS (
  SELECT k, i, x, y,
    coalesce(lead(x) OVER w, first_value(x) OVER w) AS xn,
    coalesce(lead(y) OVER w, first_value(y) OVER w) AS yn
  FROM v{p} WINDOW w AS (PARTITION BY k ORDER BY i)
),
m{p} AS (
  SELECT k, i, 0 AS sub, {ix} AS x, {iy} AS y
  FROM e{p} WHERE ({a} {op} {c}) <> ({an} {op} {c})
  UNION ALL
  SELECT k, i, 1, xn, yn FROM e{p} WHERE {an} {op} {c}
),
v{p + 1} AS (
  SELECT k, row_number() OVER (PARTITION BY k ORDER BY i, sub) - 1 AS i, x, y
  FROM m{p}
)""")
    parts.append(
        "\nSELECT k AS oid, CAST(i AS BIGINT) AS i, x, y FROM v4"
    )
    return "".join(parts)


Q_CLIP_SQL = _clip_sql()


def q_pps_sample(sf_dir: str):
    """Systematic weighted (PPS) sampling of orders by integer price
    cents, n=200 (tableops.pps_sample): a distributed prefix-sum scan
    whose driver state is one row per BLOCK; all-integer pick
    predicate, so the window-SQL twin is hash-exact."""
    from osmray.tableops import pps_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({"oid": pa.array(k), "w": pa.array(cents)})

    return pps_sample(ds.map_batches(prep, batch_format="pyarrow"),
                      "oid", "w", n=200)


Q_PPS_SAMPLE_SQL = """
WITH t AS (
  SELECT o_orderkey AS oid,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS w
  FROM orders
),
c AS (
  SELECT oid, w,
    sum(w) OVER (ORDER BY oid ROWS UNBOUNDED PRECEDING) AS cum,
    (SELECT sum(w) FROM t) AS tot
  FROM t
)
SELECT oid, w FROM c
WHERE (cum * 200) // tot > ((cum - w) * 200) // tot
"""


def q_interval_islands(sf_dir: str):
    """Gaps-and-islands: merge overlapping per-user activity windows
    (event second .. +60+id%600) into islands; per user the interval
    count, island count and total covered seconds
    (windows.interval_islands — sort once, vectorized local merges,
    fix-up only for block-edge runs). Identical island rule to the
    window-SQL twin (touching merges), all integer."""
    from osmray.windows import interval_islands

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def iv(batch: pa.Table) -> pa.Table:
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1_000_000
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"user_id": batch["user_id"], "s": pa.array(s),
                         "e": pa.array(s + 60 + eid % 600)})

    return interval_islands(ds.map_batches(iv, batch_format="pyarrow"),
                            key="user_id", start="s", end="e")


Q_INTERVAL_ISLANDS_SQL = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) // 1000000 AS s,
         epoch_us(ts) // 1000000 + 60 + event_id % 600 AS e
  FROM events
),
m AS (
  SELECT user_id, s, e,
    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY user_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1
         ELSE 0 END AS new_isl
  FROM iv
),
g AS (
  SELECT user_id, s, e,
    sum(new_isl) OVER (PARTITION BY user_id ORDER BY s, e
        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
),
i AS (SELECT user_id, isl, min(s) AS s0, max(e) AS e1, count(*) AS n
      FROM g GROUP BY user_id, isl)
SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(e1 - s0) AS BIGINT) AS covered
FROM i GROUP BY user_id
"""


def q_grouped_moments(sf_dir: str):
    """Exact per-returnflag second-moment sums of (quantity, floor
    dollars) — the variance/covariance/correlation building block
    (tableops.grouped_moments): integer partials per block, one
    bounded shuffle."""
    from osmray.tableops import grouped_moments

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_returnflag": batch["l_returnflag"],
             "x": pa.array(np.floor(q).astype(np.int64)),
             "y": pa.array(np.floor(p).astype(np.int64))}
        )

    return grouped_moments(ds.map_batches(prep, batch_format="pyarrow"),
                           "l_returnflag", "x", "y")


Q_GROUPED_MOMENTS_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
  CAST(sum(x * x) AS BIGINT) AS sum_xx, CAST(sum(y * y) AS BIGINT) AS sum_yy,
  CAST(sum(x * y) AS BIGINT) AS sum_xy
FROM t GROUP BY l_returnflag
"""


def q_skyline(sf_dir: str):
    """Global 2-D Pareto front over hash-scattered (x, y) points with
    distinct x (tableops.skyline2d): distributed prefix-min scan with
    O(#blocks) driver state; strict dominance, window-SQL twin."""
    from osmray.tableops import skyline2d

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct x: orderkeys are distinct and < 2^26 at any sf
        # here; +1 keeps key 0 off the (0, 0) corner
        x = ((k + 1) * 2654435761) % 67108864 * 67108864 + k
        y = ((k + 1) * 2246822519) % 9999991
        return pa.table({"oid": pa.array(k), "x": pa.array(x), "y": pa.array(y)})

    return skyline2d(ds.map_batches(pts, batch_format="pyarrow"),
                     "oid", "x", "y")


Q_SKYLINE_SQL = """
WITH t AS (
  SELECT o_orderkey AS oid,
    ((o_orderkey + 1) * 2654435761) % 67108864 * 67108864 + o_orderkey AS x,
    ((o_orderkey + 1) * 2246822519) % 9999991 AS y
  FROM orders
)
SELECT oid, x, y FROM (
  SELECT oid, x, y,
    min(y) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS pmin
  FROM t
) WHERE pmin IS NULL OR y < pmin
"""


def q_order_stats(sf_dir: str):
    """EXACT global percentiles by rank (p1/p25/p50/p75/p99 of price
    cents) — no sketch: distributed sort + per-block rank-offset scan,
    O(#blocks) driver state (tableops.exact_order_stats)."""
    from osmray.tableops import exact_order_stats

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def cents(batch: pa.Table) -> pa.Table:
        c = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({"cents": pa.array(c)})

    return exact_order_stats(ds.map_batches(cents, batch_format="pyarrow"),
                             "cents", [1, 25, 50, 75, 99])


Q_ORDER_STATS_SQL = """
WITH t AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders
),
o AS (SELECT cents, row_number() OVER (ORDER BY cents) AS rn FROM t),
sel AS (
  SELECT p, greatest(1, (SELECT count(*) FROM t) * p // 100) AS r
  FROM (VALUES (1), (25), (50), (75), (99)) AS v(p)
)
SELECT CAST(p AS BIGINT) AS p, r AS rank,
       (SELECT min(cents) FROM o WHERE rn = sel.r) AS value
FROM sel
"""


def q_left_join(sf_dir: str):
    """LEFT OUTER grace join: every lineitem keeps its row even when
    the (hash-sampled 10%) orders build side has no match — unmatched
    rows carry NULL build columns (joins.bucketed_join how='left';
    same spill/probe plan as the inner join, null-masked take)."""
    from osmray.joins import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def proj(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pid": pa.array(ok * 10 + ln), "l_orderkey": pa.array(ok)})

    left = li.map_batches(proj, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def sample(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((k * 2654435761) % 10 == 0))

    right = orders.map_batches(sample, batch_format="pyarrow")
    out = bucketed_join(left, right, on="l_orderkey", right_on="o_orderkey",
                        how="left")

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"pid": batch["pid"],
             "o_custkey": pa.array(
                 pc.fill_null(batch["o_custkey"], -1).to_numpy(zero_copy_only=False).astype(np.int64)),
             "matched": pc.is_valid(batch["o_orderkey"])}
        )

    return out.map_batches(fin, batch_format="pyarrow")


Q_LEFT_JOIN_SQL = """
WITH r AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE (o_orderkey * 2654435761) % 10 = 0
)
SELECT l_orderkey * 10 + l_linenumber AS pid,
  CAST(coalesce(r.o_custkey, -1) AS BIGINT) AS o_custkey,
  r.o_orderkey IS NOT NULL AS matched
FROM lineitem LEFT JOIN r ON l_orderkey = r.o_orderkey
"""


def q_anti_join_large(sf_dir: str):
    """Large-x-large ANTI join (lineitem rows whose order key is NOT
    in the 10% hash-sampled orders set) via the grace plan
    (joins.bucketed_join how='anti') — both sides stream, probe rows
    filtered per bucket, no row multiplication, no broadcast."""
    from osmray.joins import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def proj(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pid": pa.array(ok * 10 + ln), "l_orderkey": pa.array(ok)})

    left = li.map_batches(proj, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def sample(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((k * 2654435761) % 10 == 0))

    right = orders.map_batches(sample, batch_format="pyarrow")
    return bucketed_join(left, right, on="l_orderkey", right_on="o_orderkey",
                         how="anti")


Q_ANTI_JOIN_LARGE_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS pid, l_orderkey
FROM lineitem
WHERE l_orderkey NOT IN (
  SELECT o_orderkey FROM orders WHERE (o_orderkey * 2654435761) % 10 = 0
)
"""


def q_kmv(sf_dir: str):
    """KMV bottom-k distinct sketch of lineitem order keys (k=256):
    the k smallest 62-bit hashes of the distinct values + the
    (k-1)*2^62/h_k estimator (sketch.kmv_bottom_k). The SQL twin
    replays the avalanche hash in HUGEINT and ranks — the ENTIRE
    sketch hash-checks, not just the estimate."""
    from osmray.sketch import kmv_bottom_k

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    return kmv_bottom_k(ds, "l_orderkey", k=256)


def _kmv_sql() -> str:
    from osmray.sketch import HLL_C1, HLL_C2

    m62 = 1 << 62
    return f"""
WITH v AS (SELECT DISTINCT l_orderkey AS x FROM lineitem),
s1 AS (SELECT CAST((CAST(xor(x, x >> 31) AS HUGEINT) * {HLL_C1}) % {m62} AS BIGINT) AS h FROM v),
s2 AS (SELECT CAST((CAST(xor(h, h >> 29) AS HUGEINT) * {HLL_C2}) % {m62} AS BIGINT) AS h FROM s1),
hx AS (SELECT DISTINCT xor(h, h >> 32) AS h FROM s2),
b AS (
  SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank FROM hx
  QUALIFY rank <= 256
),
g AS (SELECT count(*) AS nk, max(h) AS hk FROM b)
SELECT rank, h,
  CAST(CASE WHEN g.nk = 256
       THEN floor(255 * 4611686018427387904.0 / hk)
       ELSE g.nk END AS BIGINT) AS est_distinct
FROM b, g
"""


Q_KMV_SQL = _kmv_sql()


def q_count_min(sf_dir: str):
    """Count-Min frequency sketch of lineitem order keys (4 x 1024):
    per-block partials bounded at depth*width rows, one bounded
    groupby — the raw stream never shuffles (sketch.count_min). The
    SQL twin rebuilds every counter from the same mod-prime hashes."""
    from osmray.sketch import count_min

    ds = _read(sf_dir, "lineitem", ["l_orderkey"])
    return count_min(ds, "l_orderkey", depth=4, width=1024)


def _count_min_sql() -> str:
    rows = []
    for j, (p, a) in enumerate([(2147483647, 48271), (2147483629, 16807),
                                (2147483563, 40692), (2147483423, 69621)]):
        rows.append(
            f"SELECT {j} AS d, ((abs(l_orderkey) % {p}) * {a} % {p}) % 1024 AS col"
            f" FROM lineitem"
        )
    u = " UNION ALL ".join(rows)
    return (f"SELECT CAST(d AS BIGINT) AS d, CAST(col AS BIGINT) AS col, "
            f"CAST(count(*) AS BIGINT) AS n FROM ({u}) GROUP BY d, col")


Q_COUNT_MIN_SQL = _count_min_sql()


def q_seg_join(sf_dir: str):
    """Large-x-large PROPER segment-intersection join (roads-crossing):
    part segments x orders segments in a 65536^2 integer world via the
    PBSM grid plan (joins.segment_intersection_join) — covering-cell
    explode, one grace join, exact integer orientation tests,
    reporting-cell dedup. The cross-join SQL twin replays the same
    cross products."""
    from osmray.joins import segment_intersection_join

    def part_segs(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = 640 + (k * 7919) % 64000
        y1 = 640 + (k * 6151) % 64000
        return pa.table({"id": pa.array(k), "x1": pa.array(x1),
                         "y1": pa.array(y1),
                         "x2": pa.array(x1 + (k * 31) % 1025 - 512),
                         "y2": pa.array(y1 + (k * 37) % 1025 - 512)})

    def order_segs(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = 640 + (k * 104729) % 64000
        y1 = 640 + (k * 99991) % 64000
        return pa.table({"id": pa.array(k), "x1": pa.array(x1),
                         "y1": pa.array(y1),
                         "x2": pa.array(x1 + (k * 41) % 1025 - 512),
                         "y2": pa.array(y1 + (k * 43) % 1025 - 512)})

    left = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        part_segs, batch_format="pyarrow")
    right = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        order_segs, batch_format="pyarrow")
    return segment_intersection_join(left, right, cell_shift=8)


Q_SEG_JOIN_SQL = """
WITH a0 AS (
  SELECT p_partkey AS id,
    640 + (p_partkey * 7919) % 64000 AS x1, 640 + (p_partkey * 6151) % 64000 AS y1,
    640 + (p_partkey * 7919) % 64000 + (p_partkey * 31) % 1025 - 512 AS x2,
    640 + (p_partkey * 6151) % 64000 + (p_partkey * 37) % 1025 - 512 AS y2
  FROM part
),
a AS (SELECT id, x1, y1, x2, y2, least(x1, x2) AS lx, greatest(x1, x2) AS gx,
             least(y1, y2) AS ly, greatest(y1, y2) AS gy FROM a0),
b0 AS (
  SELECT o_orderkey AS id,
    640 + (o_orderkey * 104729) % 64000 AS x1, 640 + (o_orderkey * 99991) % 64000 AS y1,
    640 + (o_orderkey * 104729) % 64000 + (o_orderkey * 41) % 1025 - 512 AS x2,
    640 + (o_orderkey * 99991) % 64000 + (o_orderkey * 43) % 1025 - 512 AS y2
  FROM orders
),
b AS (SELECT id, x1, y1, x2, y2, least(x1, x2) AS lx, greatest(x1, x2) AS gx,
             least(y1, y2) AS ly, greatest(y1, y2) AS gy FROM b0)
SELECT a_id, b_id FROM (
  SELECT a.id AS a_id, b.id AS b_id,
    (b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1) AS d1,
    (b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1) AS d2,
    (a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1) AS d3,
    (a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1) AS d4
  FROM a, b
  WHERE a.lx <= b.gx AND b.lx <= a.gx AND a.ly <= b.gy AND b.ly <= a.gy
)
WHERE ((d1 > 0 AND d2 < 0) OR (d1 < 0 AND d2 > 0))
  AND ((d3 > 0 AND d4 < 0) OR (d3 < 0 AND d4 > 0))
"""


def q_pip_join(sf_dir: str):
    """Large-x-large point-in-polygon JOIN (joins.pip_cell_join) — the
    unbounded-features regime the broadcast FeatureIndex can't serve:
    polygons (per-order L-shaped rings, ~1500 units in a 65536 world)
    explode to covering grid cells and ride a grace join as
    list<float64> vertex columns; the exact even-odd ray cast (same
    half-open semantics as geom.points_in_ring) runs vectorized over
    all candidate pairs. Points live in one cell each, so pairs are
    born deduplicated. The SQL twin uses the rectilinear closed form
    of the same crossing count."""
    from osmray.joins import pip_cell_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 53 == 0
        return pa.table({"qid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 10),
                         "py": pa.array(p["m2"][sel] >> 10)})

    def polys(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = (k * 7919) % 63000
        by = (k * 6151) % 63000
        x0 = bx + (k * 31) % 500
        x1 = bx + 600 + (k * 37) % 400
        x2 = bx + 1100 + (k * 41) % 400
        y0 = by + (k * 43) % 500
        y1 = by + 600 + (k * 47) % 400
        y2 = by + 1100 + (k * 53) % 400
        xs = np.stack([x0, x2, x2, x1, x1, x0], axis=1).ravel().astype(np.float64)
        ys = np.stack([y0, y0, y1, y1, y2, y2], axis=1).ravel().astype(np.float64)
        offs = np.arange(len(k) + 1, dtype=np.int32) * 6
        return pa.table(
            {"pid": pa.array(k),
             "xs": pa.ListArray.from_arrays(pa.array(offs), pa.array(xs)),
             "ys": pa.ListArray.from_arrays(pa.array(offs), pa.array(ys))}
        )

    points = li.map_batches(pts, batch_format="pyarrow")
    polygons = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        polys, batch_format="pyarrow")
    return pip_cell_join(points, polygons, cell_shift=12)


Q_PIP_JOIN_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (
  SELECT pid AS qid, m1 // 1024 AS px, m2 // 1024 AS py FROM p WHERE pid % 53 = 0
),
g AS (
  SELECT o_orderkey AS pid,
    (o_orderkey * 7919) % 63000 + (o_orderkey * 31) % 500 AS x0,
    (o_orderkey * 7919) % 63000 + 600 + (o_orderkey * 37) % 400 AS x1,
    (o_orderkey * 7919) % 63000 + 1100 + (o_orderkey * 41) % 400 AS x2,
    (o_orderkey * 6151) % 63000 + (o_orderkey * 43) % 500 AS y0,
    (o_orderkey * 6151) % 63000 + 600 + (o_orderkey * 47) % 400 AS y1,
    (o_orderkey * 6151) % 63000 + 1100 + (o_orderkey * 53) % 400 AS y2
  FROM orders
)
SELECT qid, pid FROM pts, g
WHERE px >= x0 - 1500 AND px <= x2 AND py >= y0 - 1500 AND py <= y2
  AND ((CASE WHEN x0 > px AND py >= y0 AND py < y2 THEN 1 ELSE 0 END
      + CASE WHEN x1 > px AND py >= y1 AND py < y2 THEN 1 ELSE 0 END
      + CASE WHEN x2 > px AND py >= y0 AND py < y1 THEN 1 ELSE 0 END) % 2) = 1
"""


def q_morphology(sf_dir: str):
    """Mask morphology under the oracle: per order, a REAL rasterized
    rectangle mask (raster.fill_poly — inclusive edges, the engine's
    frozen scanline semantics), box dilation/erosion
    (raster.binary_dilate/erode, O(H*W) integral-image passes) and the
    IoU popcount core vs a second shifted rectangle
    (raster.mask_iou_popcounts). Every output is an integer popcount
    whose closed form the SQL twin computes from the rectangle
    arithmetic — the raster path itself is what is being checked."""
    from osmray.raster import binary_dilate, binary_erode, fill_poly, mask_iou_popcounts

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def morph(batch: pa.Table) -> pa.Table:
        ks = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = ks[ks % 7 == 0]  # sampled: the raster path is per-row Python
        out = {"oid": [], "pop_a": [], "pop_dil": [], "pop_ero": [],
               "pop_b": [], "inter_ab": []}
        for k in ks.tolist():
            # popcounts are translation-invariant: rasterize in a local
            # window instead of the full 256^2 tile (same raster path,
            # ~16x less canvas work per row)
            x0, y0 = 24, 24
            w = 8 + (k * 13) % 56
            h = 8 + (k * 23) % 56
            r = 1 + k % 3
            canvas = np.zeros((132, 132), np.uint8)
            fill_poly(canvas, np.array(
                [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]))
            dil = binary_dilate(canvas, r)
            ero = binary_erode(canvas, r)
            bx0, by0 = x0 + (k % 31) - 15, y0 + (k % 37) - 18
            canvas_b = np.zeros((132, 132), np.uint8)
            fill_poly(canvas_b, np.array(
                [[bx0, by0], [bx0 + w, by0], [bx0 + w, by0 + h], [bx0, by0 + h]]))
            pa_, pb_, inter = mask_iou_popcounts(canvas, canvas_b)
            out["oid"].append(k)
            out["pop_a"].append(pa_)
            out["pop_dil"].append(int((dil > 0).sum()))
            out["pop_ero"].append(int((ero > 0).sum()))
            out["pop_b"].append(pb_)
            out["inter_ab"].append(inter)
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    return ds.map_batches(morph, batch_format="pyarrow")


Q_MORPHOLOGY_SQL = """
WITH g AS (
  SELECT o_orderkey AS oid,
    24 + (o_orderkey * 7) % 140 AS x0, 24 + (o_orderkey * 19) % 140 AS y0,
    8 + (o_orderkey * 13) % 56 AS w, 8 + (o_orderkey * 23) % 56 AS h,
    1 + o_orderkey % 3 AS r,
    (o_orderkey % 31) - 15 AS dx, (o_orderkey % 37) - 18 AS dy
  FROM orders WHERE o_orderkey % 7 = 0
)
SELECT oid,
  (w + 1) * (h + 1) AS pop_a,
  (w + 1 + 2 * r) * (h + 1 + 2 * r) AS pop_dil,
  greatest(w + 1 - 2 * r, 0) * greatest(h + 1 - 2 * r, 0) AS pop_ero,
  (w + 1) * (h + 1) AS pop_b,
  greatest(w + 1 - abs(dx), 0) * greatest(h + 1 - abs(dy), 0) AS inter_ab
FROM g
"""


def q_simplify(sf_dir: str):
    """Douglas-Peucker under the oracle: per-order 4-point integer
    polylines through the REAL recursive kernel
    (geom.simplify_polyline — division-free cross^2 > eps^2*len2
    tests, argmax-first tie rule); the keep-mask is emitted as a
    4-bit integer. On 4 points the recursion is a finite decision
    tree, which the SQL twin replays with CASE expressions — the
    general recursion stays pytest-locked, this pins the kernel's
    exact comparisons and tie-breaks cross-engine."""
    from osmray.geom import simplify_polyline

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def simp(batch: pa.Table) -> pa.Table:
        ks = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        eps = 8.0
        out_mask = np.empty(len(ks), dtype=np.int64)
        for i, k in enumerate(ks.tolist()):
            xs = np.array([0, 100 + (k * 7) % 50, 200 + (k * 13) % 50, 300],
                          dtype=np.float64)
            ys = np.array([0, (k * 19) % 41 - 20, (k * 23) % 41 - 20,
                           (k * 29) % 21 - 10], dtype=np.float64)
            keep = simplify_polyline(xs, ys, eps)
            out_mask[i] = int(np.packbits(keep, bitorder="little")[0])
        return pa.table({"oid": pa.array(ks), "keep_mask": pa.array(out_mask)})

    return ds.map_batches(simp, batch_format="pyarrow")


def _simplify_sql() -> str:
    # cross^2 of point (px,py) vs segment (ax,ay)-(bx,by), and len2 —
    # explicit multiplication (power() is not guaranteed bit-exact)
    def c2(ax, ay, bx, by, px, py):
        cr = (f"(({px} - {ax}) * ({by} - {ay}) - "
              f"({py} - {ay}) * ({bx} - {ax}))")
        return f"({cr} * {cr})"

    def l2(ax, ay, bx, by):
        return (f"(({bx} - {ax}) * ({bx} - {ax}) + "
                f"({by} - {ay}) * ({by} - {ay}))")

    e2 = "64.0"  # eps^2
    return f"""
WITH g AS (
  SELECT o_orderkey AS oid,
    0.0 AS x0, 0.0 AS y0,
    CAST(100 + (o_orderkey * 7) % 50 AS DOUBLE) AS x1,
    CAST((o_orderkey * 19) % 41 - 20 AS DOUBLE) AS y1,
    CAST(200 + (o_orderkey * 13) % 50 AS DOUBLE) AS x2,
    CAST((o_orderkey * 23) % 41 - 20 AS DOUBLE) AS y2,
    300.0 AS x3, CAST((o_orderkey * 29) % 21 - 10 AS DOUBLE) AS y3
  FROM orders
),
d AS (
  SELECT oid, x0, y0, x1, y1, x2, y2, x3, y3,
    {c2('x0', 'y0', 'x3', 'y3', 'x1', 'y1')} AS c1,
    {c2('x0', 'y0', 'x3', 'y3', 'x2', 'y2')} AS c2,
    {e2} * {l2('x0', 'y0', 'x3', 'y3')} AS thr
  FROM g
),
k AS (
  SELECT oid,
    CASE
      WHEN c1 <= thr AND c2 <= thr THEN 0  -- both interior dropped
      WHEN c1 >= c2 THEN  -- split at P1 (argmax-first tie rule)
        2 + CASE WHEN {c2('x1', 'y1', 'x3', 'y3', 'x2', 'y2')}
                   > {e2} * {l2('x1', 'y1', 'x3', 'y3')}
                 THEN 4 ELSE 0 END
      ELSE  -- split at P2
        4 + CASE WHEN {c2('x0', 'y0', 'x2', 'y2', 'x1', 'y1')}
                   > {e2} * {l2('x0', 'y0', 'x2', 'y2')}
                 THEN 2 ELSE 0 END
    END AS inner_bits
  FROM d
)
SELECT oid, CAST(9 + inner_bits AS BIGINT) AS keep_mask FROM k
"""


Q_SIMPLIFY_SQL = _simplify_sql()


def q_zonal_stats(sf_dir: str):
    """Zonal statistics — the canonical vector/raster aggregate: point
    count + integer weight sum per polygon zone, composed from the
    large-x-large PIP join (joins.pip_cell_join) and one keyed
    aggregate of pre-reduced partials. Zones with no points are
    absent (inner semantics), matching the SQL twin's GROUP BY."""
    from ray.data.aggregate import Sum

    from osmray.joins import pip_cell_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 53 == 0
        return pa.table({"qid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 10),
                         "py": pa.array(p["m2"][sel] >> 10)})

    def polys(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        bx = (k * 7919) % 63000
        by = (k * 6151) % 63000
        x0 = bx + (k * 31) % 500
        x1 = bx + 600 + (k * 37) % 400
        x2 = bx + 1100 + (k * 41) % 400
        y0 = by + (k * 43) % 500
        y1 = by + 600 + (k * 47) % 400
        y2 = by + 1100 + (k * 53) % 400
        xs = np.stack([x0, x2, x2, x1, x1, x0], axis=1).ravel().astype(np.float64)
        ys = np.stack([y0, y0, y1, y1, y2, y2], axis=1).ravel().astype(np.float64)
        offs = np.arange(len(k) + 1, dtype=np.int32) * 6
        return pa.table(
            {"pid": pa.array(k),
             "xs": pa.ListArray.from_arrays(pa.array(offs), pa.array(xs)),
             "ys": pa.ListArray.from_arrays(pa.array(offs), pa.array(ys))}
        )

    points = li.map_batches(pts, batch_format="pyarrow")
    polygons = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        polys, batch_format="pyarrow")
    pairs = pip_cell_join(points, polygons, cell_shift=12)

    def partial(batch: pa.Table) -> pa.Table:
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        qid = batch["qid"].to_numpy(zero_copy_only=False)
        w = qid % 1000  # integer point weight, replayable in SQL
        return _keyed_sums(pid, {"w_sum": w}, "pid")

    return (
        pairs.map_batches(partial, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Sum("cnt", alias_name="n_points"),
                   Sum("w_sum", alias_name="w_sum"))
    )


Q_ZONAL_STATS_SQL = (
    Q_PIP_JOIN_SQL.rstrip()
    .replace("SELECT qid, pid FROM pts, g",
             "SELECT pid, CAST(count(*) AS BIGINT) AS n_points, "
             "CAST(sum(qid % 1000) AS BIGINT) AS w_sum FROM pts, g")
    + "\nGROUP BY pid\n"
)


def q_distance_join(sf_dir: str):
    """Exact distance join (all point-feature pairs within radius 400
    in a 65536 world) — the radius-bounded kNN cousin with no
    broadcast side and no iteration (joins.distance_join): features
    explode to the cells covering their radius box, points live in
    one cell each, one grace join, integer d^2 predicate."""
    from osmray.joins import distance_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 19 == 0
        return pa.table({"qid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 10),
                         "py": pa.array(p["m2"][sel] >> 10)})

    def feats(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"fid": pa.array(k),
                         "fx": pa.array(512 + (k * 104723) % 64512),
                         "fy": pa.array(512 + (k * 99989) % 64512)})

    points = li.map_batches(pts, batch_format="pyarrow")
    features = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        feats, batch_format="pyarrow")
    return distance_join(points, features, radius=400, cell_shift=10)


Q_DISTANCE_JOIN_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (
  SELECT pid AS qid, m1 // 1024 AS px, m2 // 1024 AS py FROM p WHERE pid % 19 = 0
),
f AS (
  SELECT p_partkey AS fid,
    512 + (p_partkey * 104723) % 64512 AS fx,
    512 + (p_partkey * 99989) % 64512 AS fy
  FROM part
)
SELECT qid, fid,
  (px - fx) * (px - fx) + (py - fy) * (py - fy) AS d2
FROM pts, f
WHERE (px - fx) * (px - fx) + (py - fy) * (py - fy) <= 160000
"""


def q_knn_join(sf_dir: str):
    """EXACT kNN JOIN with an unbounded feature side (joins.knn_join):
    adaptive-radius distance-join rounds — a point with >= k matches
    inside radius r is provably complete, the rest retry at 2r via
    grace anti filters (no driver state). k=3 over hash-scattered
    part features; ties (d2, fid) match the window twin."""
    from osmray.joins import knn_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 19 == 0
        return pa.table({"qid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 10),
                         "py": pa.array(p["m2"][sel] >> 10)})

    def feats(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"fid": pa.array(k),
                         "fx": pa.array(512 + (k * 104723) % 64512),
                         "fy": pa.array(512 + (k * 99989) % 64512)})

    points = li.map_batches(pts, batch_format="pyarrow")
    features = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        feats, batch_format="pyarrow")
    # density-adaptive initial radius: ~sqrt(2k/n) of the world edge
    # finishes ~all points in round 1 without flooding round-1 pairs
    n_feat = max(features.count(), 1)
    r0 = int(65536 * np.sqrt(2 * 3 / n_feat)) + 64
    return knn_join(points, features, k=3, radius0=r0, cell_shift=11)


Q_KNN_JOIN_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (
  SELECT pid AS qid, m1 // 1024 AS px, m2 // 1024 AS py FROM p WHERE pid % 19 = 0
),
f AS (
  SELECT p_partkey AS fid,
    512 + (p_partkey * 104723) % 64512 AS fx,
    512 + (p_partkey * 99989) % 64512 AS fy
  FROM part
),
d AS (
  SELECT qid, fid,
    (px - fx) * (px - fx) + (py - fy) * (py - fy) AS d2,
    row_number() OVER (PARTITION BY qid
                       ORDER BY (px - fx) * (px - fx) + (py - fy) * (py - fy),
                                fid) AS rn
  FROM pts, f
)
SELECT qid, fid, d2 FROM d WHERE rn <= 3
"""


def q_ntile(sf_dir: str):
    """Rank-family window functions per event_type — ntile(4) over
    (cents, event_id), percent_rank and cume_dist over cents with SQL
    peer semantics (windows.ntile_ranks): one shuffle, vectorized
    rank/peer computation per group. The float columns are single
    IEEE divisions of the same integers on both sides, so the value
    hash is bit-exact."""
    from osmray.windows import ntile_ranks

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    return ntile_ranks(ds.map_batches(prep, batch_format="pyarrow"),
                       "event_type", "cents", "event_id", n_tiles=4)


Q_NTILE_SQL = """
WITH t AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, event_type,
  CAST(ntile(4) OVER (PARTITION BY event_type
                      ORDER BY cents, event_id) AS BIGINT) AS tile,
  percent_rank() OVER (PARTITION BY event_type ORDER BY cents) AS prank,
  cume_dist() OVER (PARTITION BY event_type ORDER BY cents) AS cdist
FROM t
"""


def q_range_window(sf_dir: str):
    """Time-RANGE-frame windowed aggregate: per user, the sum of
    cents over events in the trailing 1-hour window (peers of the
    current ts included — exact SQL RANGE frame semantics;
    windows.range_window_sum): prefix sums + two searchsorted calls
    per group, one shuffle."""
    from osmray.windows import range_window_sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    return range_window_sum(ds.map_batches(prep, batch_format="pyarrow"),
                            "user_id", "ts", "event_id", "cents",
                            range_us=3_600_000_000)


Q_RANGE_WINDOW_SQL = """
WITH t AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts
       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
       AS BIGINT) AS win_sum
FROM t
"""


def q_funnel(sf_dir: str):
    """Ordered event-sequence (funnel) matching: users whose first
    view is strictly followed by a click which is strictly followed
    by a purchase, with the three first-match timestamps
    (windows.funnel). One shuffle + vectorized per-user scan vs the
    SQL chain of min-filter joins."""
    from osmray.windows import funnel

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel(ds, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"])


Q_FUNNEL_SQL = """
WITH a AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
b AS (
  SELECT e.user_id, min(e.ts) AS t2 FROM events e
  JOIN a ON e.user_id = a.user_id AND e.ts > a.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t3 FROM events e
  JOIN b ON e.user_id = b.user_id AND e.ts > b.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT a.user_id, CAST(epoch_us(a.t1) AS BIGINT) AS t1,
       CAST(epoch_us(b.t2) AS BIGINT) AS t2,
       CAST(epoch_us(c.t3) AS BIGINT) AS t3
FROM a JOIN b ON a.user_id = b.user_id JOIN c ON a.user_id = c.user_id
"""


def q_resample(sf_dir: str):
    """Time-series resample with gap fill: per user, daily cents
    totals between the user's first and last active day, missing days
    emitted as 0 with filled=true (windows.resample_fill — bincount
    over the bucket span). The SQL twin materializes the calendar via
    a correlated generate_series."""
    from osmray.windows import resample_fill

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "ts": batch["ts"],
            "cents": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
        })

    out = resample_fill(ds.map_batches(prep, batch_format="pyarrow"),
                        "user_id", "ts", "cents",
                        bucket_us=86_400_000_000)
    return out.map_batches(
        lambda t: t.rename_columns(["user_id", "day", "cents", "filled"]),
        batch_format="pyarrow")


Q_RESAMPLE_SQL = """
WITH t AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
s AS (SELECT user_id, d, sum(cents) AS cents FROM t GROUP BY user_id, d),
r AS (SELECT user_id, min(d) AS dmin, max(d) AS dmax FROM t GROUP BY user_id),
g AS (
  SELECT r.user_id, gs.d
  FROM r, LATERAL (SELECT unnest(generate_series(r.dmin, r.dmax)) AS d) gs
)
SELECT g.user_id, CAST(g.d AS BIGINT) AS day,
       CAST(COALESCE(s.cents, 0) AS BIGINT) AS cents,
       s.user_id IS NULL AS filled
FROM g LEFT JOIN s ON s.user_id = g.user_id AND s.d = g.d
"""


def q_set_ops(sf_dir: str):
    """Multiset INTERSECT ALL / EXCEPT ALL between the pre- and
    post-1998 shipment bags of supplier keys (tableops.bag_set_ops):
    bag semantics reduce to keyed counts, so each side pre-aggregates
    per block and one keyed groupby folds both — raw rows never
    shuffle. The SQL twin runs the real INTERSECT ALL / EXCEPT ALL
    set operators and counts the surviving duplicates."""
    from osmray.tableops import bag_set_ops

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate"])
    cut = 883612800000000  # 1998-01-01 in epoch micros

    def side(before: bool):
        def f(batch: pa.Table) -> pa.Table:
            t = batch["l_shipdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            m = t < cut if before else t >= cut
            return pa.table({"k": batch["l_suppkey"].filter(pa.array(m))})
        return f

    a = ds.map_batches(side(True), batch_format="pyarrow")
    b = ds.map_batches(side(False), batch_format="pyarrow")
    return bag_set_ops(a, b, "k")


Q_SET_OPS_SQL = """
WITH a AS (SELECT l_suppkey AS k FROM lineitem
           WHERE l_shipdate < TIMESTAMP '1998-01-01'),
     b AS (SELECT l_suppkey AS k FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1998-01-01'),
     i AS (SELECT k, CAST(count(*) AS BIGINT) AS n_int
           FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
           GROUP BY k),
     x AS (SELECT k, CAST(count(*) AS BIGINT) AS n_exc
           FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
           GROUP BY k),
     ka AS (SELECT DISTINCT k FROM a)
SELECT ka.k, COALESCE(i.n_int, 0) AS n_int, COALESCE(x.n_exc, 0) AS n_exc
FROM ka LEFT JOIN i ON ka.k = i.k LEFT JOIN x ON ka.k = x.k
"""


def q_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) with count and
    floor-quantity sums (tableops.cube_agg): every block collapses to
    its distinct pairs, expands into the 4-level cube lattice
    (collapsing each level locally — ALL/ALL is ONE row per block),
    and a single keyed groupby folds the partials."""
    from osmray.tableops import cube_agg

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": pa.array(np.floor(q).astype(np.int64))})

    return cube_agg(ds.map_batches(prep, batch_format="pyarrow"),
                    "l_returnflag", "l_linestatus", "qty")


Q_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS val_sum
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_bfs(sf_dir: str):
    """Multi-source BFS shortest hop counts (<= 4) on the bounded
    order-part co-purchase graph (graph.bfs_hops): frontier and
    distance tables are Datasets end-to-end, one grace semi-join +
    one keyed min-fold per round, driver sees only the frontier
    count. Hash-checked against the recursive-CTE twin."""
    from osmray.graph import bfs_hops

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        return pa.table(
            {"u": pa.array(2 * o[sel]), "v": pa.array(2 * p[sel] + 1)})

    e = ds.map_batches(edges, batch_format="pyarrow")

    def seeds(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(u[u % 34 == 2])})

    s = e.map_batches(seeds, batch_format="pyarrow")
    return bfs_hops(e, s, max_hops=4)


Q_BFS_SQL = """
WITH RECURSIVE raw AS (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
e AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),
r(node, h) AS (
  SELECT DISTINCT u AS node, 0 AS h FROM raw WHERE u % 34 = 2
  UNION
  SELECT e.v, r.h + 1 FROM r JOIN e ON e.u = r.node WHERE r.h < 4
)
SELECT node, CAST(min(h) AS BIGINT) AS hop FROM r GROUP BY node
"""


def q_convex_hull(sf_dir: str):
    """Per-group strict convex hull over hashed integer point clouds
    (geom.monotone_chain_hull): exact int64 cross-product turns,
    collinear boundary points dropped, plus the hull size and twice
    the signed area per group. The SQL twin characterizes extreme
    edges directly (edge (a,b) is on the hull iff every other point
    is strictly left or collinear strictly between) and reorders the
    vertex set by atan2 around the centroid for the shoelace —
    convexity makes the angular order the boundary order, so both
    sides sum the identical integer area."""
    from osmray.geom import hull_area2, monotone_chain_hull

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    # the O(n^3)-per-group SQL twin needs bounded groups: keep ~2500
    # points total at ANY sf (deterministic modulus subsample)
    m = max(1, ds.count() // 2500)

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = k % m == 0
        k = k[sel]
        return pa.table({
            "brand": batch["p_brand"].filter(pa.array(sel)),
            "x": pa.array((k * 7919 + 11) % 1048573),
            "y": pa.array((k * 6151 + 29) % 1048573)})

    def hull(g: pa.Table) -> pa.Table:
        ring = monotone_chain_hull(
            g["x"].to_numpy(zero_copy_only=False),
            g["y"].to_numpy(zero_copy_only=False))
        a2 = hull_area2(ring)
        n = len(ring)
        return pa.table({
            "brand": pa.array(np.repeat(g["brand"][0].as_py(), n),
                              pa.string()),
            "x": pa.array(ring[:, 0]), "y": pa.array(ring[:, 1]),
            "n_hull": pa.array(np.full(n, n, dtype=np.int64)),
            "area2": pa.array(np.full(n, a2, dtype=np.int64))})

    return (ds.map_batches(pts, batch_format="pyarrow")
            .groupby("brand").map_groups(hull, batch_format="pyarrow"))


def q_emd_hist(sf_dir: str):
    """1-D Earth Mover's Distance between per-group histograms (the
    distribution-shift measure between two populations sharing a key):
    each side bins a hashed value into 16 buckets per nation, and the
    EMD is the exact cross-scaled CDF gap sum(|cumA*NB - cumB*NA|) —
    all integers, no normalization floats. Plan: map-side _keyed_sums
    partials on a packed (nation, side, bin) key -> one small keyed
    Sum -> per-nation fold of the 32 bin rows. The SQL twin replays
    the CDFs with window cumsums over a dense nation x bin grid."""
    from ray.data.aggregate import Sum

    def cust(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = nk * 32 + 0 * 16 + (k * 2654435761) % 16
        return _keyed_sums(key, {}, "key")

    def supp(batch: pa.Table) -> pa.Table:
        k = batch["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = nk * 32 + 1 * 16 + (k * 2654435761) % 16
        return _keyed_sums(key, {}, "key")

    a = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust, batch_format="pyarrow")
    b = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        supp, batch_format="pyarrow")
    agg = a.union(b).groupby("key").aggregate(Sum("cnt", alias_name="n"))

    def unpack(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({"nationkey": pa.array(key // 32),
                         "sb": pa.array(key % 32), "n": batch["n"]})

    def emd(g: pa.Table) -> pa.Table:
        sb = g["sb"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ha = np.zeros(16, np.int64)
        hb = np.zeros(16, np.int64)
        ha[sb[sb < 16]] = n[sb < 16]
        hb[sb[sb >= 16] - 16] = n[sb >= 16]
        ca, cb = np.cumsum(ha), np.cumsum(hb)
        val = int(np.abs(ca * cb[-1] - cb * ca[-1]).sum())
        return pa.table({"nationkey": g["nationkey"][:1],
                         "emd": pa.array([val], pa.int64())})

    return (agg.map_batches(unpack, batch_format="pyarrow")
            .groupby("nationkey").map_groups(emd, batch_format="pyarrow"))


Q_EMD_HIST_SQL = """
WITH h AS (
  SELECT c_nationkey AS nk, 0 AS side,
         (c_custkey * 2654435761) % 16 AS b, count(*) AS n
  FROM customer GROUP BY 1, 2, 3
  UNION ALL
  SELECT s_nationkey, 1, (s_suppkey * 2654435761) % 16, count(*)
  FROM supplier GROUP BY 1, 2, 3
),
grid AS (
  SELECT n_nationkey AS nk, s.side, r.range AS b
  FROM nation, (SELECT 0 AS side UNION ALL SELECT 1) s, range(16) r
),
d AS (
  SELECT g.nk, g.side, g.b, coalesce(h.n, 0) AS n
  FROM grid g LEFT JOIN h ON h.nk = g.nk AND h.side = g.side AND h.b = g.b
),
ca AS (
  SELECT nk, b, sum(n) OVER (PARTITION BY nk ORDER BY b) AS cum,
         sum(n) OVER (PARTITION BY nk) AS tot
  FROM d WHERE side = 0
),
cb AS (
  SELECT nk, b, sum(n) OVER (PARTITION BY nk ORDER BY b) AS cum,
         sum(n) OVER (PARTITION BY nk) AS tot
  FROM d WHERE side = 1
)
SELECT CAST(ca.nk AS BIGINT) AS nationkey,
       CAST(sum(abs(ca.cum * cb.tot - cb.cum * ca.tot)) AS BIGINT) AS emd
FROM ca JOIN cb ON ca.nk = cb.nk AND ca.b = cb.b
GROUP BY ca.nk
"""


def q_hull_diameter(sf_dir: str):
    """Per-group point-set diameter (farthest pair, squared): rotating
    calipers over the strict convex hull (geom.hull_diameter_sq) —
    O(h) after the hull, never the all-pairs scan the SQL twin does.
    Same hashed point fixture + bounded-group subsample as
    q_convex_hull; ONE keyed shuffle, O(group) state."""
    from osmray.geom import hull_diameter_sq

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    m = max(1, ds.count() // 2500)

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = k % m == 0
        k = k[sel]
        return pa.table({
            "brand": batch["p_brand"].filter(pa.array(sel)),
            "x": pa.array((k * 7919 + 11) % 1048573),
            "y": pa.array((k * 6151 + 29) % 1048573)})

    def diam(g: pa.Table) -> pa.Table:
        d = hull_diameter_sq(
            g["x"].to_numpy(zero_copy_only=False),
            g["y"].to_numpy(zero_copy_only=False))
        return pa.table({"brand": g["brand"][:1],
                         "diam_sq": pa.array([d], pa.int64())})

    return (ds.map_batches(pts, batch_format="pyarrow")
            .groupby("brand").map_groups(diam, batch_format="pyarrow"))


Q_HULL_DIAMETER_SQL = """
WITH p0 AS (
  SELECT p_brand AS g,
         (p_partkey * 7919 + 11) % 1048573 AS x,
         (p_partkey * 6151 + 29) % 1048573 AS y
  FROM part
  WHERE p_partkey % (SELECT greatest(1, count(*) // 2500) FROM part) = 0
)
SELECT a.g AS brand,
       CAST(max((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y)) AS BIGINT) AS diam_sq
FROM p0 a JOIN p0 b ON b.g = a.g
GROUP BY a.g
"""


Q_CONVEX_HULL_SQL = """
WITH p0 AS (
  SELECT DISTINCT p_brand AS g,
         (p_partkey * 7919 + 11) % 1048573 AS x,
         (p_partkey * 6151 + 29) % 1048573 AS y
  FROM part
  WHERE p_partkey % (SELECT greatest(1, count(*) // 2500) FROM part) = 0
),
e AS (
  SELECT a.g, a.x AS ax, a.y AS ay
  FROM p0 a
  JOIN p0 b ON b.g = a.g AND (b.x <> a.x OR b.y <> a.y)
  JOIN p0 c ON c.g = a.g
  GROUP BY a.g, a.x, a.y, b.x, b.y
  HAVING min(CASE
    WHEN (c.x = a.x AND c.y = a.y) OR (c.x = b.x AND c.y = b.y) THEN 1
    WHEN (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) > 0 THEN 1
    WHEN (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) = 0
         AND (c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y) > 0
         AND (c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y) <
             (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) THEN 1
    ELSE 0 END) = 1
),
v AS (SELECT DISTINCT g, ax AS x, ay AS y FROM e),
cent AS (SELECT g, avg(x) AS cx, avg(y) AS cy, count(*) AS n
         FROM v GROUP BY g),
o AS (
  SELECT v.g, v.x, v.y, cent.n,
         atan2(v.y - cent.cy, v.x - cent.cx) AS ang
  FROM v JOIN cent ON v.g = cent.g
),
w AS (
  SELECT g, x, y, n,
         COALESCE(LEAD(x) OVER win, FIRST_VALUE(x) OVER win) AS nx,
         COALESCE(LEAD(y) OVER win, FIRST_VALUE(y) OVER win) AS ny
  FROM o WINDOW win AS (PARTITION BY g ORDER BY ang)
),
a2 AS (SELECT g, CAST(CASE WHEN min(n) >= 3
                      THEN sum(x * ny - nx * y) ELSE 0 END AS BIGINT) AS area2
       FROM w GROUP BY g)
SELECT w.g AS brand, w.x, w.y, CAST(w.n AS BIGINT) AS n_hull, a2.area2
FROM w JOIN a2 ON w.g = a2.g
"""


def q_edit_join(sf_dir: str):
    """Exact edit-distance-1 self-join over distinct part name
    variants (simjoin.edit1_join — PassJoin segment blocking): each
    string meets its candidates through O(1) half-segment keys in a
    keyed groupby, verification is the vectorized distance-1 byte
    check; nothing is all-pairs. The SQL twin IS all-pairs
    (levenshtein over the distinct cross join) — tractable because
    the variant universe is bounded (names x 20 suffixes) at any
    sf."""
    from osmray.simjoin import edit1_join

    ds = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def names(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nm = batch["p_name"].to_pylist()
        return pa.table({"s": pa.array(
            [f"{n}-{int(x) % 20}" for n, x in zip(nm, k)], pa.string())})

    return edit1_join(ds.map_batches(names, batch_format="pyarrow"), "s")


Q_EDIT_JOIN_SQL = """
WITH n AS (
  SELECT DISTINCT p_name || '-' || CAST(p_partkey % 20 AS VARCHAR) AS s
  FROM part
)
SELECT a.s AS a, b.s AS b
FROM n a JOIN n b
  ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 1
WHERE levenshtein(a.s, b.s) = 1
"""


def q_jaccard_join(sf_dir: str):
    """Exact set-similarity self-join (Jaccard >= 1/2) over word-
    trigram shingle sets of documents (simjoin.jaccard_join — prefix
    filtering under a hashed global token order): candidates meet in
    a per-token groupby bounded by the prefix pigeonhole, token sets
    come back through two grace joins, and the threshold test is
    all-integer. Docs are modulus-capped (~700) at any sf because the
    SQL twin intersects every pair of list columns."""
    from osmray.simjoin import jaccard_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    m = max(1, ds.count() // 700)

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = ids % m == 0
        ids = ids[sel]
        texts = [t for t, s in zip(batch["text"].to_pylist(), sel) if s]
        out = []
        for t in texts:
            ws = _WORD_RE.findall(t.lower())
            out.append(sorted({f"{ws[i]}_{ws[i + 1]}_{ws[i + 2]}"
                               for i in range(len(ws) - 2)}))
        return pa.table({"doc_id": pa.array(ids),
                         "toks": pa.array(out, pa.list_(pa.string()))})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    return jaccard_join(tok_ds, "doc_id", "toks", t_num=1, t_den=2)


Q_JACCARD_JOIN_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % (SELECT greatest(1, count(*) // 700) FROM documents) = 0
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM d
),
big AS (
  SELECT doc_id,
         list_distinct([ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2]
                        FOR i IN range(1, len(ws) - 1)]) AS toks
  FROM w
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM big WHERE len(toks) > 0),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
         CAST(a.n + b.n - len(list_intersect(a.toks, b.toks)) AS BIGINT)
           AS uni
  FROM s a JOIN s b ON a.doc_id < b.doc_id
)
SELECT a, b, inter, uni FROM p WHERE 2 * inter >= uni
"""


def q_focal_stats(sf_dir: str):
    """Focal (neighborhood) statistics over a sparse integer cell
    grid — the raster convolution shape: every block pre-aggregates
    its points per cell, each cell partial then scatters to its 3x3
    Chebyshev neighborhood, and ONE keyed groupby folds the focal
    count + sum per receiving cell (contribution scatter is additive,
    so block partials sum exactly; no wrap at grid borders on either
    side)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def per_cell(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        cx = (p["m1"] >> 18).astype(np.int64)
        cy = (p["m2"] >> 18).astype(np.int64)
        v = (p["pid"] % 1000).astype(np.int64)
        key = cx * 4096 + cy
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "cell0": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=v, minlength=len(u))
                          .astype(np.int64))})

    from osmray.tableops import sorted_fold_sums

    # block partials scatter directly (9 x per-block distinct cells)
    # and ONE sorted-scan fold sums them: fewest Ray jobs (the
    # scatter is additive, so partial-then-fold is exact; Ray's
    # generic aggregate at 66k groups measured 14.8s, two-stage
    # folds 8s, this single fold ~5s at sf0.1)
    cells_tot = ds.map_batches(per_cell, batch_format="pyarrow")

    def scatter(batch: pa.Table) -> pa.Table:
        u = batch["cell0"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        ucx, ucy = u // 4096, u % 4096
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({
                    "cx": pa.array(ucx + dx), "cy": pa.array(ucy + dy),
                    "focal_n": pa.array(n), "focal_sum": pa.array(s)}))
        t = pa.concat_tables(outs)
        return t.append_column(
            "cell", pa.array(t["cx"].to_numpy(zero_copy_only=False) * 8192
                             + t["cy"].to_numpy(zero_copy_only=False) + 4096))

    folded = sorted_fold_sums(
        cells_tot.map_batches(scatter, batch_format="pyarrow")
                 .select_columns(["cell", "focal_n", "focal_sum"]),
        "cell", ["focal_n", "focal_sum"])

    def unpack(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cx": pa.array(c // 8192),
            "cy": pa.array(c % 8192 - 4096),
            "focal_n": batch["focal_n"].cast(pa.int64()),
            "focal_sum": batch["focal_sum"].cast(pa.int64())})

    return folded.map_batches(unpack, batch_format="pyarrow")


Q_FOCAL_STATS_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (
  SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
  FROM pts
),
c AS (SELECT cx, cy, count(*) AS n, sum(v) AS s FROM p GROUP BY cx, cy),
d AS (SELECT a.dx, b.dy
      FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
           (SELECT unnest([-1, 0, 1]) AS dy) b)
SELECT c.cx + d.dx AS cx, c.cy + d.dy AS cy,
       CAST(sum(c.n) AS BIGINT) AS focal_n,
       CAST(sum(c.s) AS BIGINT) AS focal_sum
FROM c, d
GROUP BY c.cx + d.dx, c.cy + d.dy
"""


def q_interval_join(sf_dir: str):
    """Temporal interval join: for each purchase, the count of the
    same user's views in the preceding 30 minutes [ts-30m, ts). One
    keyed shuffle; per group both event streams sort once and two
    searchsorted calls answer every purchase (no pair expansion —
    the SQL twin's LEFT JOIN materializes the pairs)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def win(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = g["event_type"].to_numpy(zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        isp = et == "purchase"
        vts = np.sort(tv[et == "view"])
        pts = tv[isp]
        lo = np.searchsorted(vts, pts - 1_800_000_000, side="left")
        hi = np.searchsorted(vts, pts, side="left")
        return pa.table({
            "event_id": pa.array(ii[isp]),
            "user_id": pa.array(np.repeat(g["user_id"][0].as_py(),
                                          int(isp.sum())).astype(np.int64)),
            "n_views": pa.array((hi - lo).astype(np.int64))})

    return ds.groupby("user_id").map_groups(win, batch_format="pyarrow")


Q_INTERVAL_JOIN_SQL = """
SELECT p.event_id, p.user_id, CAST(count(v.event_id) AS BIGINT) AS n_views
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
"""


def q_group_regression(sf_dir: str):
    """Exact grouped least-squares slope as an integer rational:
    slope_num = n*Sxy - Sx*Sy, slope_den = n*Sxx - Sx^2 per
    returnflag over (floor qty, floor price%1000) — built on the
    grouped_moments partials (integer partials per block, one
    bounded shuffle), so the regression coefficient is hash-exact
    instead of a float regr_slope."""
    from osmray.tableops import grouped_moments

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_returnflag": batch["l_returnflag"],
             "x": pa.array(np.floor(q).astype(np.int64)),
             "y": pa.array(np.floor(p).astype(np.int64) % 1000)})

    m = grouped_moments(ds.map_batches(prep, batch_format="pyarrow"),
                        "l_returnflag", "x", "y")

    def slope(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = batch["sum_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        sy = batch["sum_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxx = batch["sum_xx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sxy = batch["sum_xy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "n": pa.array(n),
            "slope_num": pa.array(n * sxy - sx * sy),
            "slope_den": pa.array(n * sxx - sx * sx)})

    return m.map_batches(slope, batch_format="pyarrow")


Q_GROUP_REGRESSION_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(floor(l_quantity) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) % 1000 AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM t GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den
FROM m
"""


def q_mode(sf_dir: str):
    """Deterministic grouped MODE (most frequent cents value per
    event_type, smallest value on count ties): per-block partial
    counts shuffle once into global (group, value) counts, then the
    existing grouped_topk map-side-combined argmax picks the winner
    — raw rows never shuffle."""
    from ray.data.aggregate import Sum

    from osmray.windows import grouped_topk

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(et.astype("U"), "|"),
                          v.astype("U"))
        u, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        et_u = np.array([s.split("|", 1)[0] for s in u.tolist()])
        v_u = np.array([int(s.split("|", 1)[1]) for s in u.tolist()],
                       dtype=np.int64)
        return pa.table({"k": pa.array(u), "event_type": pa.array(et_u),
                         "cents": pa.array(v_u), "n": pa.array(cnt)})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("n", alias_name="n")))

    def unkey(batch: pa.Table) -> pa.Table:
        ks = batch["k"].to_pylist()
        return pa.table({
            "event_type": pa.array([s.split("|", 1)[0] for s in ks]),
            "cents": pa.array([int(s.split("|", 1)[1]) for s in ks],
                              pa.int64()),
            "n": batch["n"].cast(pa.int64())})

    top = grouped_topk(counts.map_batches(unkey, batch_format="pyarrow"),
                       "event_type", "n", "cents", k=1)

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "mode_cents": batch["cents"].cast(pa.int64()),
            "n": batch["n"].cast(pa.int64())})

    return top.map_batches(emit, batch_format="pyarrow")


Q_MODE_SQL = """
WITH t AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
c AS (SELECT event_type, cents, CAST(count(*) AS BIGINT) AS n
      FROM t GROUP BY event_type, cents),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, cents) AS rn
      FROM c)
SELECT event_type, cents AS mode_cents, n FROM r WHERE rn = 1
"""


def q_item_pairs(sf_dir: str):
    """Market-basket co-occurrence counts: distinct part pairs
    appearing in >= 2 common orders (tableops.cooccur_pairs). The
    group-local self-join is vectorized over sorted key runs
    (complete in-block runs expand by index arithmetic; only
    block-edge runs hit the per-key fix-up), pair counts fold in one
    keyed groupby over packed keys. The SQL twin is the textbook
    distinct self-join."""
    from osmray.tableops import cooccur_pairs

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    return cooccur_pairs(ds, "l_orderkey", "l_partkey", min_count=2)


Q_ITEM_PAIRS_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS a, b.l_partkey AS b, CAST(count(*) AS BIGINT) AS n
FROM d a
JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY a.l_partkey, b.l_partkey
HAVING count(*) >= 2
"""


def q_trajectory(sf_dir: str):
    """Per-user trajectory statistics over the ts-ordered event
    sequence (hashed synthetic waypoints): move count, total squared
    step length, and net squared displacement — the ordered
    geospatial scan (one keyed shuffle, vectorized diff per group;
    all-integer so the lag-window SQL twin is hash-exact)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def traj(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        k = ii[order]
        x = (k * 48271 + 7) % 1048573
        y = (k * 69621 + 3) % 1048573
        dx = np.diff(x)
        dy = np.diff(y)
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_moves": pa.array([len(k) - 1], pa.int64()),
            "path_sq": pa.array([int(np.sum(dx * dx + dy * dy))],
                                pa.int64()),
            "net_sq": pa.array([int((x[-1] - x[0]) ** 2
                                    + (y[-1] - y[0]) ** 2)], pa.int64())})

    return ds.groupby("user_id").map_groups(traj, batch_format="pyarrow")


Q_TRAJECTORY_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + 7) % 1048573 AS x,
         (event_id * 69621 + 3) % 1048573 AS y
  FROM events
),
d AS (
  SELECT user_id, x, y,
         lag(x) OVER w AS px, lag(y) OVER w AS py,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
agg AS (
  SELECT user_id,
         CAST(sum(CASE WHEN px IS NULL THEN 0
                  ELSE (x - px) * (x - px) + (y - py) * (y - py) END)
              AS BIGINT) AS path_sq,
         CAST(max(n) - 1 AS BIGINT) AS n_moves
  FROM d GROUP BY user_id
),
ends AS (
  SELECT f.user_id,
         CAST((l.x - f.x) * (l.x - f.x) + (l.y - f.y) * (l.y - f.y)
              AS BIGINT) AS net_sq
  FROM (SELECT user_id, x, y FROM d WHERE rn = 1) f
  JOIN (SELECT user_id, x, y FROM d WHERE rn = n) l
    ON f.user_id = l.user_id
)
SELECT agg.user_id, agg.n_moves, agg.path_sq, ends.net_sq
FROM agg JOIN ends ON agg.user_id = ends.user_id
"""


def q_full_join(sf_dir: str):
    """FULL OUTER grace join (joins.bucketed_join how='full'):
    unmatched probe rows carry null build columns AND unmatched build
    rows carry null probe columns — per-bucket hit-range marking
    finds the latter with no extra pass, and sentinel probe rows
    guarantee buckets that only the build side populates still merge.
    Nulls are coalesced to -1 for the hash compare, as in
    q_left_join."""
    from osmray.joins import bucketed_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def lproj(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = k % 3 == 0
        return pa.table({
            "o_orderkey": pa.array(k[sel]),
            "o_custkey": pa.array(batch["o_custkey"].to_numpy(
                zero_copy_only=False).astype(np.int64)[sel])})

    left = orders.map_batches(lproj, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def rproj(batch: pa.Table) -> pa.Table:
        k = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (k * 2654435761) % 4 == 0
        bal = np.floor(batch["c_acctbal"].to_numpy(zero_copy_only=False)
                       * 100 + 0.5).astype(np.int64)
        return pa.table({"c_custkey": pa.array(k[sel]),
                         "bal_cents": pa.array(bal[sel])})

    right = cust.map_batches(rproj, batch_format="pyarrow")
    out = bucketed_join(left, right, on="o_custkey", right_on="c_custkey",
                        how="full")

    def fin(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "okey": pa.array(pc.fill_null(batch["o_orderkey"], -1)
                             .to_numpy(zero_copy_only=False).astype(np.int64)),
            "lkey": pa.array(pc.fill_null(batch["o_custkey"], -1)
                             .to_numpy(zero_copy_only=False).astype(np.int64)),
            "rkey": pa.array(pc.fill_null(batch["c_custkey"], -1)
                             .to_numpy(zero_copy_only=False).astype(np.int64)),
            "bal_cents": pa.array(pc.fill_null(batch["bal_cents"], -1)
                                  .to_numpy(zero_copy_only=False)
                                  .astype(np.int64))})

    return out.map_batches(fin, batch_format="pyarrow")


Q_FULL_JOIN_SQL = """
WITH l AS (
  SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 3 = 0
),
r AS (
  SELECT c_custkey, CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
  FROM customer WHERE (c_custkey * 2654435761) % 4 = 0
)
SELECT COALESCE(l.o_orderkey, -1) AS okey,
       COALESCE(l.o_custkey, -1) AS lkey,
       COALESCE(r.c_custkey, -1) AS rkey,
       COALESCE(r.bal, -1) AS bal_cents
FROM l FULL OUTER JOIN r ON l.o_custkey = r.c_custkey
"""


def q_json_extract(sf_dir: str):
    """JSON field extraction + aggregate: parse the events.props JSON
    column, pull the integer ``k`` field, and fold per-event_type
    stats of it (vectorized batch parse; the scalar-library JSON op
    the reference's config loaders imply). DuckDB twin uses native
    json_extract."""
    import json

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        ks = np.array([int(json.loads(p)["k"])
                       for p in batch["props"].to_pylist()], dtype=np.int64)
        u, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(u),
            "n": pa.array(np.bincount(inv, minlength=len(u))
                          .astype(np.int64)),
            "k_sum": pa.array(np.bincount(inv, weights=ks,
                                          minlength=len(u))
                              .astype(np.int64)),
            "k_sq_sum": pa.array(np.bincount(inv, weights=ks * ks,
                                             minlength=len(u))
                                 .astype(np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("k_sum", alias_name="k_sum"),
                       Sum("k_sq_sum", alias_name="k_sq_sum")))


Q_JSON_EXTRACT_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)
                * CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sq_sum
FROM events
GROUP BY event_type
"""


def q_unpivot(sf_dir: str):
    """UNPIVOT (wide -> long melt): the per-part (size, retail cents)
    attribute pair becomes (p_partkey, attr, val) rows — a pure
    map-side reshape, no shuffle at all."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def melt(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sz = batch["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        rp = np.floor(batch["p_retailprice"].to_numpy(zero_copy_only=False)
                      * 100 + 0.5).astype(np.int64)
        n = len(k)
        return pa.table({
            "p_partkey": pa.array(np.concatenate((k, k))),
            "attr": pa.array(["size"] * n + ["retail_cents"] * n),
            "val": pa.array(np.concatenate((sz, rp)))})

    return ds.map_batches(melt, batch_format="pyarrow")


Q_UNPIVOT_SQL = """
SELECT p_partkey, attr, val FROM (
  SELECT p_partkey, 'size' AS attr, CAST(p_size AS BIGINT) AS val
  FROM part
  UNION ALL
  SELECT p_partkey, 'retail_cents' AS attr,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS val
  FROM part
)
"""


def q_dedup_clusters(sf_dir: str):
    """End-to-end near-dup clustering — the canonicalization step of
    a corpus dedup pipeline: exact Jaccard>=1/2 trigram pairs
    (simjoin.jaccard_join, prefix-filtered) feed connected components
    (graph.connected_components), and every clustered doc maps to its
    component's minimum doc_id as the canonical survivor. The SQL
    twin recomputes the pairs brute-force and closes them with a
    recursive CTE."""
    from osmray.graph import connected_components
    from osmray.simjoin import jaccard_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    m = max(1, ds.count() // 700)

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = ids % m == 0
        ids = ids[sel]
        texts = [t for t, s in zip(batch["text"].to_pylist(), sel) if s]
        out = []
        for t in texts:
            ws = _WORD_RE.findall(t.lower())
            out.append(sorted({f"{ws[i]}_{ws[i + 1]}_{ws[i + 2]}"
                               for i in range(len(ws) - 2)}))
        return pa.table({"doc_id": pa.array(ids),
                         "toks": pa.array(out, pa.list_(pa.string()))})

    pairs = jaccard_join(ds.map_batches(toks, batch_format="pyarrow"),
                         "doc_id", "toks", t_num=1, t_den=2)
    comps = connected_components(
        pairs.map_batches(
            lambda t: t.select(["a", "b"]).rename_columns(["u", "v"]),
            batch_format="pyarrow"))
    return comps.map_batches(
        lambda t: t.rename_columns(["doc_id", "canon"]),
        batch_format="pyarrow")


Q_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % (SELECT greatest(1, count(*) // 700) FROM documents) = 0
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM d
),
big AS (
  SELECT doc_id,
         list_distinct([ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2]
                        FOR i IN range(1, len(ws) - 1)]) AS toks
  FROM w
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM big WHERE len(toks) > 0),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE 2 * len(list_intersect(a.toks, b.toks))
        >= a.n + b.n - len(list_intersect(a.toks, b.toks))
),
e AS (SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p),
r(node, lbl) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.v, r.lbl FROM r JOIN e ON e.u = r.node WHERE r.lbl < e.v
)
SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS canon
FROM r GROUP BY node
"""


def q_idw(sf_dir: str):
    """Inverse-distance-weighted spatial interpolation at query
    points — raster-from-scattered-samples, composed from the PBSM
    distance join + one keyed integer fold: weight = R^2 // (1 + d^2)
    (integer, so the interpolated numerator/denominator sums are
    hash-exact; the caller divides at the edge). Points with no
    sample inside R are absent on both sides."""
    from osmray.joins import distance_join
    from osmray.tableops import sorted_fold_sums

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 23 == 0
        return pa.table({"qid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 10),
                         "py": pa.array(p["m2"][sel] >> 10)})

    def feats(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"fid": pa.array(k),
                         "fx": pa.array(512 + (k * 104723) % 64512),
                         "fy": pa.array(512 + (k * 99989) % 64512),
                         "fv": pa.array((k * 37) % 5000)})

    points = li.map_batches(pts, batch_format="pyarrow")
    features = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        feats, batch_format="pyarrow")
    R = 800
    pairs = distance_join(points, features, radius=R, cell_shift=10,
                          feat_cols=("fid", "fx", "fy"))

    # distance_join returns (qid, fid, d2); re-derive fv from fid (a
    # pure function here; a payload-carrying variant would ride the
    # spill like pip_cell_join's vertices)
    def weigh(batch: pa.Table) -> pa.Table:
        fid = batch["fid"].to_numpy(zero_copy_only=False).astype(np.int64)
        d2 = batch["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = (R * R) // (1 + d2)
        fv = (fid * 37) % 5000
        return pa.table({"qid": batch["qid"],
                         "w_sum": pa.array(w),
                         "wv_sum": pa.array(w * fv),
                         "n_samples": pa.array(np.ones(len(w), np.int64))})

    return sorted_fold_sums(pairs.map_batches(weigh, batch_format="pyarrow"),
                            "qid", ["w_sum", "wv_sum", "n_samples"])


Q_IDW_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (
  SELECT pid AS qid, m1 // 1024 AS px, m2 // 1024 AS py FROM p
  WHERE pid % 23 = 0
),
f AS (
  SELECT p_partkey AS fid,
         512 + (p_partkey * 104723) % 64512 AS fx,
         512 + (p_partkey * 99989) % 64512 AS fy,
         (p_partkey * 37) % 5000 AS fv
  FROM part
),
j AS (
  SELECT qid,
         640000 // (1 + (px - fx) * (px - fx) + (py - fy) * (py - fy))
           AS w,
         fv
  FROM pts, f
  WHERE (px - fx) * (px - fx) + (py - fy) * (py - fy) <= 640000
)
SELECT qid, CAST(sum(w) AS BIGINT) AS w_sum,
       CAST(sum(w * fv) AS BIGINT) AS wv_sum,
       CAST(count(*) AS BIGINT) AS n_samples
FROM j GROUP BY qid
"""


def q_cum_users(sf_dir: str):
    """Exact cumulative distinct users by day — the streaming
    cardinality curve: distinct-by-min (keyed min fold gives each
    user's first day), per-day new-user counts, then the distributed
    prefix scan (per-block sums -> O(#blocks) driver offsets ->
    local cumsum) for the running total. No window shuffle, no
    driver-resident user set."""
    import ray
    from ray.data.aggregate import Min, Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False) // 86_400_000_000)
        return pa.table({"user_id": batch["user_id"],
                         "d": pa.array(d.astype(np.int64))})

    first = (ds.map_batches(prep, batch_format="pyarrow")
             .groupby("user_id").aggregate(Min("d", alias_name="d")))

    def cnt(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pa.table({"day": pa.array(u),
                         "new_users": pa.array(c.astype(np.int64))})

    per_day = (first.map_batches(cnt, batch_format="pyarrow")
               .groupby("day").aggregate(Sum("new_users",
                                             alias_name="new_users"))
               .sort("day").materialize())

    # distributed prefix scan over the (bounded, time-span-sized)
    # day table: one block-sum row per block to the driver
    blocks = per_day.map_batches(
        lambda t: pa.table({
            "d0": pa.array([int(t["day"][0].as_py())
                            if len(t) else 1 << 62], pa.int64()),
            "s": pa.array([int(np.sum(t["new_users"].to_numpy(
                zero_copy_only=False)))], pa.int64())}),
        batch_format="pyarrow", batch_size=None).to_pandas()
    blocks = blocks.sort_values("d0").reset_index(drop=True)
    offs = dict(zip(blocks["d0"],
                    np.concatenate(([0], np.cumsum(blocks["s"])[:-1]))))

    def scan(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "new_users": pa.array([], pa.int64()),
                             "cum_users": pa.array([], pa.int64())})
        n = batch["new_users"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = offs[int(batch["day"][0].as_py())]
        return pa.table({"day": batch["day"].cast(pa.int64()),
                         "new_users": pa.array(n),
                         "cum_users": pa.array(base + np.cumsum(n))})

    return per_day.map_batches(scan, batch_format="pyarrow",
                               batch_size=None)


Q_CUM_USERS_SQL = """
WITH f AS (
  SELECT user_id, min(epoch_us(ts) // 86400000000) AS d
  FROM events GROUP BY user_id
),
c AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY d)
SELECT CAST(d AS BIGINT) AS day, n AS new_users,
       CAST(sum(n) OVER (ORDER BY d) AS BIGINT) AS cum_users
FROM c
"""


def q_retention(sf_dir: str):
    """Cohort retention triangle: users bucket into their first-day
    cohort, every (user, active day) pair counts once, and the keyed
    fold yields (cohort_day, day_offset, n_users). Two bounded
    shuffles (distinct activity via per-block dedup + keyed min for
    the cohort), then a grace join of activity against cohorts —
    user rows never collect on the driver."""
    from ray.data.aggregate import Min, Sum

    from osmray.joins import bucketed_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        d = (batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
             .to_numpy(zero_copy_only=False) // 86_400_000_000)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = u * 65536 + (d - 19000)
        uk = np.unique(key)
        return pa.table({"user_id": pa.array(uk // 65536),
                         "d": pa.array(uk % 65536 + 19000)})

    raw = ds.map_batches(prep, batch_format="pyarrow")
    # exact global distinct of (user, day): block-local dedup in prep
    # bounds rows, the sorted fold finishes it (cross-block
    # duplicates of the same activity day must collapse BEFORE the
    # retention count or they overcount)
    from osmray.tableops import sorted_fold_sums

    def pack(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"uk": pa.array(u * 65536 + (d - 19000)),
                         "one": pa.array(np.ones(len(u), np.int64))})

    def unpack(batch: pa.Table) -> pa.Table:
        uk = batch["uk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"user_id": pa.array(uk // 65536),
                         "d": pa.array(uk % 65536 + 19000)})

    acts = sorted_fold_sums(
        raw.map_batches(pack, batch_format="pyarrow"), "uk", ["one"]
    ).map_batches(unpack, batch_format="pyarrow").materialize()
    cohort = acts.groupby("user_id").aggregate(Min("d", alias_name="d0"))

    j = bucketed_join(acts, cohort, on="user_id", right_on="user_id",
                      num_buckets=16)

    def offsets(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        d0 = batch["d0"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = d0 * 65536 + (d - d0)
        # activity rows are globally distinct already, so a plain
        # per-block count partial is exact
        del u
        u2, inv2 = np.unique(key, return_inverse=True)
        c = np.bincount(inv2, minlength=len(u2)).astype(np.int64)
        return pa.table({"k": pa.array(u2.astype(np.int64)),
                         "n_users": pa.array(c)})

    folded = (j.map_batches(offsets, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("n_users",
                                          alias_name="n_users")))

    def emit(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cohort_day": pa.array(k // 65536),
                         "day_offset": pa.array(k % 65536),
                         "n_users": batch["n_users"].cast(pa.int64())})

    return folded.map_batches(emit, batch_format="pyarrow")


Q_RETENTION_SQL = """
WITH a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d FROM events
),
c AS (SELECT user_id, min(d) AS d0 FROM a GROUP BY user_id)
SELECT CAST(c.d0 AS BIGINT) AS cohort_day,
       CAST(a.d - c.d0 AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM a JOIN c ON a.user_id = c.user_id
GROUP BY c.d0, a.d - c.d0
"""


def q_string_agg(sf_dir: str):
    """Grouped ordered string aggregation (LISTAGG / collect_list):
    per nation, its customer market segments concatenated in
    (segment, custkey) order — the ordered-collect shape. Partial
    lists CANNOT pre-aggregate (order is global), so a key's rows
    co-locate through one groupby and each group joins its sorted
    slice vectorized."""
    ds = _read(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_mktsegment"])

    def agg(g: pa.Table) -> pa.Table:
        k = g["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = np.asarray(g["c_mktsegment"].to_pylist(), dtype=object)
        order = np.lexsort((k, seg))
        return pa.table({
            "c_nationkey": pa.array(
                [int(g["c_nationkey"][0].as_py())], pa.int64()),
            "segs": pa.array([",".join(seg[order].tolist())], pa.string()),
            "n": pa.array([len(k)], pa.int64())})

    return ds.groupby("c_nationkey").map_groups(agg, batch_format="pyarrow")


Q_STRING_AGG_SQL = """
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey)
         AS segs,
       CAST(count(*) AS BIGINT) AS n
FROM customer
GROUP BY c_nationkey
"""


def q_bearing_bins(sf_dir: str):
    """Per-user compass histogram of trajectory steps: each ts-ordered
    move bins into one of 8 sectors by PURE INTEGER sign/majority
    tests (E when dx>0, |dx|>|dy| ...), so the histogram is hash-exact
    with no atan2 on either side. Zero-length moves are dropped. One
    keyed shuffle, vectorized per group."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bins(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        k = ii[order]
        x = (k * 48271 + 7) % 1048573
        y = (k * 69621 + 3) % 1048573
        dx = np.diff(x)
        dy = np.diff(y)
        nz = (dx != 0) | (dy != 0)
        dx, dy = dx[nz], dy[nz]
        ax, ay = np.abs(dx), np.abs(dy)
        # octant: 0=E 1=NE 2=N 3=NW 4=W 5=SW 6=S 7=SE (diagonal ties
        # |dx| == |dy| fold into the diagonal sectors)
        b = np.where(
            ax > ay,
            np.where(dx > 0, 0, 4),
            np.where(
                ay > ax,
                np.where(dy > 0, 2, 6),
                np.where(dy > 0, np.where(dx > 0, 1, 3),
                         np.where(dx > 0, 7, 5)))).astype(np.int64)
        cnt = np.bincount(b, minlength=8).astype(np.int64)
        sector = np.flatnonzero(cnt)
        return pa.table({
            "user_id": pa.array(np.repeat(g["user_id"][0].as_py(),
                                          len(sector)).astype(np.int64)),
            "sector": pa.array(sector.astype(np.int64)),
            "n": pa.array(cnt[sector])})

    return ds.groupby("user_id").map_groups(bins, batch_format="pyarrow")


Q_BEARING_BINS_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
         (event_id * 48271 + 7) % 1048573 AS x,
         (event_id * 69621 + 3) % 1048573 AS y
  FROM events
),
d AS (
  SELECT user_id, x - lag(x) OVER w AS dx, y - lag(y) OVER w AS dy
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
    CASE
      WHEN abs(dx) > abs(dy) THEN CASE WHEN dx > 0 THEN 0 ELSE 4 END
      WHEN abs(dy) > abs(dx) THEN CASE WHEN dy > 0 THEN 2 ELSE 6 END
      WHEN dy > 0 THEN CASE WHEN dx > 0 THEN 1 ELSE 3 END
      ELSE CASE WHEN dx > 0 THEN 7 ELSE 5 END
    END AS sector
  FROM d WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)
)
SELECT user_id, CAST(sector AS BIGINT) AS sector,
       CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY user_id, sector
"""


def q_percentile_cont(sf_dir: str):
    """Interpolated percentiles (percentile_cont) as EXACT integer
    rationals: pos = (n-1)*p/100, emitted as (p, lo_val, hi_val,
    frac_num) with value = lo + (hi-lo)*frac_num/100 left to the
    caller — no float leaves the engine, so the hash compare is
    exact. Reuses the exact_order_stats distributed rank machinery
    (one sort; O(#blocks) driver state) with both bracketing ranks
    requested per percentile."""
    from osmray.tableops import exact_order_stats

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def prep(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({"cents": pa.array(v)})

    pcts = [10, 50, 90]
    # label encoding: p*10 + (0=lo bracket, 1=hi bracket)
    labels = [p * 10 + s for p in pcts for s in (0, 1)]

    def rank_of(label: int, n: int) -> int:
        p, side = label // 10, label % 10
        lo = ((n - 1) * p) // 100 + 1
        return lo if side == 0 else min(lo + 1, n)

    stats = exact_order_stats(ds.map_batches(prep, batch_format="pyarrow"),
                              "cents", labels, rank_fn=rank_of)

    def assemble(g: pa.Table) -> pa.Table:
        # g holds one percentile's lo/hi rows after the keyed regroup
        lab = g["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = g["value"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = int(lab[0] // 10)
        lo = int(val[lab % 10 == 0][0])
        hi = int(val[lab % 10 == 1][0])
        return pa.table({"p": pa.array([p], pa.int64()),
                         "lo_val": pa.array([lo], pa.int64()),
                         "hi_val": pa.array([hi], pa.int64()),
                         "frac_num": pa.array([0], pa.int64())})

    def regroup(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pp", pa.array(batch["p"].to_numpy(
                zero_copy_only=False).astype(np.int64) // 10))

    halves = stats.map_batches(regroup, batch_format="pyarrow")
    out = halves.groupby("pp").map_groups(assemble, batch_format="pyarrow")

    # frac_num is a pure function of (p, n): fill it in one pass
    n_total = ds.count()

    def fill_frac(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "p": pa.array(p),
            "lo_val": batch["lo_val"].cast(pa.int64()),
            "hi_val": batch["hi_val"].cast(pa.int64()),
            "frac_num": pa.array(((n_total - 1) * p) % 100)})

    return out.map_batches(fill_frac, batch_format="pyarrow")


Q_PERCENTILE_CONT_SQL = """
WITH t AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
r AS (
  SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
         count(*) OVER () AS n
  FROM t
),
ps AS (SELECT unnest([10, 50, 90]) AS p)
SELECT CAST(ps.p AS BIGINT) AS p,
       CAST(max(CASE WHEN rn = ((n - 1) * p) // 100 + 1
                THEN cents END) AS BIGINT) AS lo_val,
       CAST(max(CASE WHEN rn = least(((n - 1) * p) // 100 + 2, n)
                THEN cents END) AS BIGINT) AS hi_val,
       CAST(max(((n - 1) * p) % 100) AS BIGINT) AS frac_num
FROM r, ps
GROUP BY ps.p
"""


def q_locf(sf_dir: str):
    """Forward-fill (last observation carried forward) over the
    per-user daily calendar: days with no events repeat the most
    recent day's cents total (the imputation scan that pairs with
    q_resample). Vectorized per group: bincount the observed days,
    then one cummax of observation indices gathers the carried
    values. The SQL twin uses last_value(...IGNORE NULLS)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def fill(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.floor(g["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        d = tv // 86_400_000_000
        b0, b1 = int(d.min()), int(d.max())
        span = b1 - b0 + 1
        sums = np.bincount(d - b0, weights=cents,
                           minlength=span).astype(np.int64)
        hit = np.bincount(d - b0, minlength=span) > 0
        # index of the last observed day at or before each day
        idx = np.maximum.accumulate(
            np.where(hit, np.arange(span), -1))
        days = np.arange(b0, b1 + 1, dtype=np.int64)
        return pa.table({
            "user_id": pa.array(np.repeat(g["user_id"][0].as_py(),
                                          span).astype(np.int64)),
            "day": pa.array(days),
            "cents": pa.array(sums[idx]),
            "carried": pa.array(~hit)})

    return ds.groupby("user_id").map_groups(fill, batch_format="pyarrow")


Q_LOCF_SQL = """
WITH t AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS d,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
s AS (SELECT user_id, d, sum(cents) AS cents FROM t GROUP BY user_id, d),
r AS (SELECT user_id, min(d) AS dmin, max(d) AS dmax FROM t
      GROUP BY user_id),
g AS (
  SELECT r.user_id, gs.d
  FROM r, LATERAL (SELECT unnest(generate_series(r.dmin, r.dmax)) AS d) gs
),
j AS (
  SELECT g.user_id, g.d, s.cents, s.user_id IS NULL AS carried
  FROM g LEFT JOIN s ON s.user_id = g.user_id AND s.d = g.d
)
SELECT user_id, CAST(d AS BIGINT) AS day,
       CAST(last_value(cents IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY d) AS BIGINT) AS cents,
       carried
FROM j
"""


def q_weighted_median(sf_dir: str):
    """Exact grouped WEIGHTED median: per returnflag, the smallest
    cents value whose running quantity-weight reaches half the total
    (lower weighted median — deterministic, integer). One keyed
    shuffle, sort + cumsum per group; the SQL twin is the cumulative
    window definition."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        w = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"l_returnflag": batch["l_returnflag"],
                         "cents": pa.array(v), "w": pa.array(w)})

    def wmed(g: pa.Table) -> pa.Table:
        v = g["cents"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        cw = np.cumsum(w[order])
        tot = int(cw[-1])
        i = int(np.searchsorted(cw, (tot + 1) // 2))
        return pa.table({
            "l_returnflag": pa.array([g["l_returnflag"][0].as_py()],
                                     pa.string()),
            "wmedian_cents": pa.array([int(v[order][i])], pa.int64()),
            "total_w": pa.array([tot], pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("l_returnflag").map_groups(wmed,
                                                batch_format="pyarrow"))


Q_WEIGHTED_MEDIAN_SQL = """
WITH t AS (
  SELECT l_returnflag,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(floor(l_quantity) AS BIGINT) AS w
  FROM lineitem
),
c AS (
  SELECT l_returnflag, cents,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cw,
         sum(w) OVER (PARTITION BY l_returnflag) AS tot
  FROM t
)
SELECT l_returnflag,
       CAST(min(CASE WHEN 2 * cw >= tot + (tot % 2)
                THEN cents END) AS BIGINT) AS wmedian_cents,
       CAST(max(tot) AS BIGINT) AS total_w
FROM c GROUP BY l_returnflag
"""


def q_sssp(sf_dir: str):
    """Weighted multi-source shortest paths (graph.sssp) on the
    bounded order-part co-purchase graph with deterministic positive
    integer edge weights — Bellman-Ford rounds as dataflow: frontier
    relax (capped broadcast lookup / grace join) + ONE keyed min-fold
    per round, improvement detection packed into the fold's low bit.
    Distance cap 24 matches the recursive-CTE twin's bound."""
    from osmray.graph import sssp

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        u, v = 2 * o[sel], 2 * p[sel] + 1
        return pa.table({
            "u": pa.array(np.concatenate((u, v))),
            "v": pa.array(np.concatenate((v, u))),
            "w": pa.array(1 + (np.concatenate((u * 3 + v * 5,
                                               v * 3 + u * 5))) % 7)})

    e = ds.map_batches(edges, batch_format="pyarrow")

    def seeds(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(u[u % 34 == 2])})

    s = e.map_batches(seeds, batch_format="pyarrow")
    return sssp(e, s, max_dist=24)


Q_SSSP_SQL = """
WITH RECURSIVE raw AS (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
e AS (
  SELECT u, v, 1 + (u * 3 + v * 5) % 7 AS w FROM raw
  UNION SELECT v, u, 1 + (v * 3 + u * 5) % 7 FROM raw
),
r(node, d) AS (
  SELECT DISTINCT u AS node, 0 AS d FROM raw WHERE u % 34 = 2
  UNION
  SELECT e.v, r.d + e.w FROM r JOIN e ON e.u = r.node
  WHERE r.d + e.w <= 24
)
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM r GROUP BY node
"""


def q_dbscan(sf_dir: str):
    """Grid DBSCAN (cluster.dbscan_grid) over hashed integer points in
    a 4096^2 world: eps-pairs via the PBSM distance join, core points
    via a keyed Count fold, clusters as connected components of the
    core-core eps-graph, border points folded to the MIN adjacent
    core's cluster (deterministic), noise -1. The SQL twin replays the
    full definition: cross-join pairs + degree + recursive-CTE
    min-label CC + border min."""
    from osmray.cluster import dbscan_grid

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 19 == 0
        return pa.table({"pid": pa.array(p["pid"][sel]),
                         "x": pa.array(p["m1"][sel] >> 14),
                         "y": pa.array(p["m2"][sel] >> 14)})

    points = li.map_batches(pts, batch_format="pyarrow")
    return dbscan_grid(points, eps=120, min_pts=4)


Q_DBSCAN_SQL = f"""
WITH RECURSIVE p AS (
  SELECT pid, m1 // 16384 AS x, m2 // 16384 AS y FROM ({_LI_SQL})
  WHERE pid % 19 = 0
),
pr AS MATERIALIZED (
  -- banded IEJoin, not a cross join: the box |dx|,|dy| <= 120
  -- SUPERSET of the eps-circle is joined first, the exact circle
  -- predicate filters inside — identical pairs, ~300x smaller
  -- intermediate at sf0.1
  SELECT a.pid AS qid, b.pid AS fid
  FROM p a JOIN p b
    ON b.x BETWEEN a.x - 120 AND a.x + 120
   AND b.y BETWEEN a.y - 120 AND a.y + 120
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 14400
),
deg AS MATERIALIZED (SELECT qid, count(*) AS deg FROM pr GROUP BY qid),
core AS MATERIALIZED (SELECT qid FROM deg WHERE deg >= 4),
ce AS MATERIALIZED (
  SELECT pr.qid AS u, pr.fid AS v FROM pr
  WHERE pr.qid IN (SELECT qid FROM core)
    AND pr.fid IN (SELECT qid FROM core)
),
-- unrolled Shiloach-Vishkin min-label rounds (hook = min over
-- self+neighbors, jump = lbl <- lbl[lbl]) replacing the quadratic
-- recursive closure: O(V+E) per round, 20 rounds; the oracle hash
-- check certifies convergence on each dataset
l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM ce),
h0 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l0 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l0 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l1 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h0 a JOIN h0 b ON b.node = a.lbl),
h1 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l1 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l1 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l2 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h1 a JOIN h1 b ON b.node = a.lbl),
h2 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l2 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l2 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l3 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h2 a JOIN h2 b ON b.node = a.lbl),
h3 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l3 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l3 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l4 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h3 a JOIN h3 b ON b.node = a.lbl),
h4 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l4 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l4 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l5 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h4 a JOIN h4 b ON b.node = a.lbl),
h5 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l5 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l5 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l6 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h5 a JOIN h5 b ON b.node = a.lbl),
h6 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l6 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l6 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l7 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h6 a JOIN h6 b ON b.node = a.lbl),
h7 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l7 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l7 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l8 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h7 a JOIN h7 b ON b.node = a.lbl),
h8 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l8 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l8 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l9 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h8 a JOIN h8 b ON b.node = a.lbl),
h9 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l9 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l9 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l10 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h9 a JOIN h9 b ON b.node = a.lbl),
h10 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l10 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l10 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l11 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h10 a JOIN h10 b ON b.node = a.lbl),
h11 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l11 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l11 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l12 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h11 a JOIN h11 b ON b.node = a.lbl),
h12 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l12 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l12 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l13 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h12 a JOIN h12 b ON b.node = a.lbl),
h13 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l13 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l13 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l14 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h13 a JOIN h13 b ON b.node = a.lbl),
h14 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l14 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l14 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l15 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h14 a JOIN h14 b ON b.node = a.lbl),
h15 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l15 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l15 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l16 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h15 a JOIN h15 b ON b.node = a.lbl),
h16 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l16 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l16 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l17 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h16 a JOIN h16 b ON b.node = a.lbl),
h17 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l17 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l17 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l18 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h17 a JOIN h17 b ON b.node = a.lbl),
h18 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l18 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l18 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l19 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h18 a JOIN h18 b ON b.node = a.lbl),
h19 AS MATERIALIZED (
  SELECT n.node, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
  FROM l19 n LEFT JOIN (
    SELECT ce.v AS node, min(l.lbl) AS mn
    FROM ce JOIN l19 l ON l.node = ce.u GROUP BY ce.v) m
  ON m.node = n.node),
l20 AS MATERIALIZED (
  SELECT a.node, b.lbl AS lbl FROM h19 a JOIN h19 b ON b.node = a.lbl),
comp AS MATERIALIZED (SELECT node, lbl AS comp FROM l20),
corerows AS (SELECT node AS pid, comp AS cluster, 0 AS role FROM comp),
border AS (
  SELECT pr.qid AS pid, min(c.comp) AS cluster, 1 AS role
  FROM pr JOIN comp c ON c.node = pr.fid
  WHERE pr.qid NOT IN (SELECT qid FROM core)
  GROUP BY pr.qid
),
noise AS (
  SELECT pid, -1 AS cluster, 2 AS role FROM p
  WHERE pid NOT IN (SELECT pid FROM corerows)
    AND pid NOT IN (SELECT pid FROM border)
)
SELECT pid, CAST(cluster AS BIGINT) AS cluster, CAST(role AS BIGINT) AS role
FROM (SELECT * FROM corerows UNION ALL SELECT * FROM border
      UNION ALL SELECT * FROM noise)
"""


def q_snap_roads(sf_dir: str):
    """Map-matching (joins.snap_join): every hashed point snaps to
    its NEAREST road segment within radius 64 in a 4096^2 world —
    PBSM candidates, point-segment distance kept as an exact integer
    rational (num, den; den = |b-a|^2 for interior projections, 1 at
    endpoint clamps), per-point argmin via the sort-based top-k fold
    ordered by the exactly-rounded double num/den with segment-id
    tiebreak. The SQL twin replays the identical CASE arithmetic."""
    from osmray.joins import snap_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        sel = p["pid"] % 19 == 0
        return pa.table({"pid": pa.array(p["pid"][sel]),
                         "px": pa.array(p["m1"][sel] >> 14),
                         "py": pa.array(p["m2"][sel] >> 14)})

    def segs(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k % 3 == 0]
        x1 = 64 + (k * 7919) % 3900
        y1 = 64 + (k * 6151) % 3900
        return pa.table({"sid": pa.array(k), "x1": pa.array(x1),
                         "y1": pa.array(y1),
                         "x2": pa.array(x1 + (k * 31) % 257 - 128),
                         "y2": pa.array(y1 + (k * 37) % 257 - 128)})

    points = li.map_batches(pts, batch_format="pyarrow")
    segments = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        segs, batch_format="pyarrow")
    return snap_join(points, segments, radius=64)


Q_SNAP_ROADS_SQL = f"""
WITH p AS (
  SELECT pid, m1 // 16384 AS px, m2 // 16384 AS py FROM ({_LI_SQL})
  WHERE pid % 19 = 0
),
s AS (
  SELECT p_partkey AS sid,
    64 + (p_partkey * 7919) % 3900 AS x1,
    64 + (p_partkey * 6151) % 3900 AS y1,
    64 + (p_partkey * 7919) % 3900 + (p_partkey * 31) % 257 - 128 AS x2,
    64 + (p_partkey * 6151) % 3900 + (p_partkey * 37) % 257 - 128 AS y2
  FROM part WHERE p_partkey % 3 = 0
),
cand AS (
  SELECT pid, sid,
    CASE WHEN len2 > 0 AND tnum > 0 AND tnum < len2 THEN cross2
         WHEN len2 = 0 OR tnum <= 0 THEN d_a ELSE d_b END AS d2_num,
    CASE WHEN len2 > 0 AND tnum > 0 AND tnum < len2 THEN len2
         ELSE 1 END AS d2_den
  FROM (
    SELECT pid, sid,
      (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1) AS len2,
      (px - x1) * (x2 - x1) + (py - y1) * (y2 - y1) AS tnum,
      (px - x1) * (px - x1) + (py - y1) * (py - y1) AS d_a,
      (px - x2) * (px - x2) + (py - y2) * (py - y2) AS d_b,
      ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1))
        * ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) AS cross2
    FROM p JOIN s
      ON px BETWEEN least(x1, x2) - 64 AND greatest(x1, x2) + 64
     AND py BETWEEN least(y1, y2) - 64 AND greatest(y1, y2) + 64
  )
),
kept AS (
  SELECT pid, sid, d2_num, d2_den,
         row_number() OVER (
           PARTITION BY pid
           ORDER BY d2_num * 1.0 / d2_den ASC, sid ASC) AS rn
  FROM cand WHERE d2_num <= 4096 * d2_den
)
SELECT pid, sid, CAST(d2_num AS BIGINT) AS d2_num,
       CAST(d2_den AS BIGINT) AS d2_den
FROM kept WHERE rn = 1
"""


def q_zorder_parts(sf_dir: str):
    """Z-order (Morton) range partitioner — the locality-clustering
    layout primitive for spatial data at scale: interleave 13-bit
    (x, y) into a Morton code, find the EXACT balanced 8-way range
    bounds via the distributed rank machinery (exact_order_stats with
    octile ranks — one sort, O(#blocks) driver state), assign each
    point its contiguous code-range partition, emit per-partition
    occupancy (count, min/max code). Points in the same partition are
    spatially contiguous along the curve — the standing layout that
    makes later range reads/joins selective. The SQL twin unrolls the
    same 26-term bit interleave and octile ranks."""
    from ray.data.aggregate import Count, Max, Min

    from osmray.tableops import exact_order_stats

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def morton(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        x = p["m1"] >> 13
        y = p["m2"] >> 13
        code = np.zeros(len(x), np.int64)
        for i in range(13):
            code |= ((x >> i) & 1) << (2 * i)
            code |= ((y >> i) & 1) << (2 * i + 1)
        return pa.table({"code": pa.array(code)})

    codes = li.map_batches(morton, batch_format="pyarrow").materialize()
    bounds_ds = exact_order_stats(
        codes, "code", list(range(1, 8)),
        rank_fn=lambda k, n: max(1, n * k // 8))
    bounds = np.sort(bounds_ds.to_pandas()["value"].to_numpy())

    def assign(batch: pa.Table) -> pa.Table:
        c = batch["code"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(np.searchsorted(bounds, c, side="right")),
            "code": pa.array(c)})

    return (codes.map_batches(assign, batch_format="pyarrow")
            .groupby("part")
            .aggregate(Count(alias_name="n"),
                       Min("code", alias_name="mn"),
                       Max("code", alias_name="mx")))


_MORTON_EXPR = " + ".join(
    f"((x // {1 << i}) % 2) * {1 << (2 * i)}"
    f" + ((y // {1 << i}) % 2) * {1 << (2 * i + 1)}"
    for i in range(13))

Q_ZORDER_PARTS_SQL = f"""
WITH pts AS (
  SELECT pid, m1 // 8192 AS x, m2 // 8192 AS y FROM ({_LI_SQL})
),
m AS (SELECT pid, {_MORTON_EXPR} AS code FROM pts),
o AS (SELECT code, row_number() OVER (ORDER BY code) AS rn FROM m),
b AS (
  SELECT k, (SELECT min(code) FROM o
             WHERE rn = greatest(1, (SELECT count(*) FROM m) * k // 8)) AS bv
  FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS v(k)
),
asgn AS (
  SELECT code, (SELECT count(*) FROM b WHERE bv <= code) AS part FROM m
)
SELECT part, CAST(count(*) AS BIGINT) AS n,
       CAST(min(code) AS BIGINT) AS mn, CAST(max(code) AS BIGINT) AS mx
FROM asgn GROUP BY part
"""


def q_upsert_latest(sf_dir: str):
    """CDC upsert compaction (merge-on-read, latest-writer-wins):
    events are an update stream keyed by (user_id, event_type); the
    compacted view keeps each key's newest row — ORDER BY ts DESC
    with event_id DESC as the deterministic tiebreak — via the
    sort-based top-1 fold (grouped_topk_sorted: one global sort,
    in-block runs emit directly, merge group count O(#blocks)). The
    shape every mutable-table layer (Lance/Delta/Hudi-style) needs
    at compaction time."""
    from osmray.windows import grouped_topk_sorted

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        # pack the composite key into one int64 via a per-batch
        # category code (event_type values are a tiny closed set)
        cats = {"click": 0, "view": 1, "purchase": 2, "signup": 3,
                "error": 4}
        code = np.array([cats.get(t, 5) for t in et], np.int64)
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        cents = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(uid * 8 + code), "ts_us": ts,
            "neg_eid": pa.array(-eid), "event_id": pa.array(eid),
            "cents": pa.array(cents)})

    rows = ds.map_batches(prep, batch_format="pyarrow")
    best = grouped_topk_sorted(rows, key="k", val="ts_us",
                               tiebreak="neg_eid", k=1)
    return best.map_batches(
        lambda t: t.select(["k", "ts_us", "event_id", "cents"]),
        batch_format="pyarrow")


Q_UPSERT_LATEST_SQL = """
WITH t AS (
  SELECT user_id * 8 + CASE event_type
           WHEN 'click' THEN 0 WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
           WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 5 END AS k,
         epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY user_id * 8 + CASE event_type
             WHEN 'click' THEN 0 WHEN 'view' THEN 1 WHEN 'purchase' THEN 2
             WHEN 'signup' THEN 3 WHEN 'error' THEN 4 ELSE 5 END
           ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT k, ts_us, event_id, cents FROM t WHERE rn = 1
"""


def q_tfidf(sf_dir: str):
    """Per-document TF-IDF keyword extraction (text.tfidf_topk): the
    top-3 terms per doc by the EXACT integer score
    (tf * N * 1000) // df — rational idf instead of log, so the
    ranking is integer-exact and hash-checkable. Postings explode,
    one keyed df fold, two-engine df attach, sort-based per-doc
    top-k with ASCII term tiebreak."""
    from osmray.text import tfidf_topk

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_topk(ds, k=3)


Q_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * n.n * 1000 // df.df AS score_milli,
         row_number() OVER (PARTITION BY tf.doc_id
           ORDER BY tf.tf * n.n * 1000 // df.df DESC, tf.term ASC) AS rn
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_milli AS BIGINT) AS score_milli
FROM s WHERE rn <= 3
"""


def q_seq_pattern(sf_dir: str):
    """MATCH_RECOGNIZE-lite sequence detection: per user, count the
    strictly-consecutive V-shapes (value drops, then rises) in
    (ts, event_id) order, plus the first V's middle event id — the
    event-pattern scan (fraud dips, retry storms) as one keyed
    shuffle + vectorized per-group triple test. SQL twin via
    lag/lead windows."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "cents": pa.array(np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
            ).astype(np.int64))})

    def vshapes(g: pa.Table) -> pa.Table:
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, ts))
        c, eid = c[o], eid[o]
        if len(c) < 3:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_v": pa.array([], pa.int64()),
                             "first_v_eid": pa.array([], pa.int64())})
        mid = (c[1:-1] < c[:-2]) & (c[2:] > c[1:-1])
        if not mid.any():
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_v": pa.array([], pa.int64()),
                             "first_v_eid": pa.array([], pa.int64())})
        mids = eid[1:-1][mid]
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_v": pa.array([int(mid.sum())], pa.int64()),
            "first_v_eid": pa.array([int(mids.min())], pa.int64())})

    return (ds.map_batches(prep, batch_format="pyarrow")
            .groupby("user_id").map_groups(vshapes, batch_format="pyarrow"))


Q_SEQ_PATTERN_SQL = """
WITH t AS (
  SELECT user_id, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         lag(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS prev,
         lead(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w AS nxt
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_v,
       CAST(min(event_id) AS BIGINT) AS first_v_eid
FROM t
WHERE prev IS NOT NULL AND nxt IS NOT NULL
  AND cents < prev AND nxt > cents
GROUP BY user_id
"""


def q_blob_extract(sf_dir: str):
    """Raster -> vector blob extraction: deterministic disks paint a
    shared 512^2 canvas; the painted-pixel set is labeled by
    4-adjacency connected components (cluster.grid_components — edges
    are pure key shifts semi-joined against the painted set, NO pair
    join), then one keyed fold emits each blob's pixel count and
    bbox. The vector side of the engine's raster<->vector pair
    (MercatorPainter's canvas -> per-blob geometry). SQL twin:
    generate_series disk explode + recursive-CTE min-label CC."""
    from ray.data.aggregate import Count, Max, Min

    from osmray.cluster import grid_components

    W = 512
    parts = _read(sf_dir, "part", ["p_partkey"])

    def pixels(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k % 5 == 0]
        h = (k * 2654435761) % 4294967296
        cx = 8 + h % 496
        cy = 8 + (h // 496) % 496
        r = 3 + k % 6
        dx, dy = np.meshgrid(np.arange(-8, 9), np.arange(-8, 9),
                             indexing="ij")
        dx, dy = dx.ravel(), dy.ravel()
        # explode: every disk x every offset, keep in-radius
        n, m = len(k), len(dx)
        X = (cx[:, None] + dx[None, :])
        Y = (cy[:, None] + dy[None, :])
        keep = (dx[None, :] ** 2 + dy[None, :] ** 2) <= (r ** 2)[:, None]
        key = (X * W + Y)[keep]
        return pa.table({"key": pa.array(np.unique(key))})

    px = (parts.map_batches(pixels, batch_format="pyarrow")
          .groupby("key").aggregate(Count(alias_name="_n"))
          .select_columns(["key"]).materialize())

    lab = grid_components(px, width=W)

    def decode(batch: pa.Table) -> pa.Table:
        kk = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({"comp": batch["comp"],
                         "x": pa.array(kk // W), "y": pa.array(kk % W)})

    return (lab.map_batches(decode, batch_format="pyarrow")
            .groupby("comp")
            .aggregate(Count(alias_name="n"),
                       Min("x", alias_name="x0"),
                       Max("x", alias_name="x1"),
                       Min("y", alias_name="y0"),
                       Max("y", alias_name="y1")))


Q_BLOB_EXTRACT_SQL = """
WITH d AS (
  SELECT 8 + ((p_partkey * 2654435761) % 4294967296) % 496 AS cx,
         8 + (((p_partkey * 2654435761) % 4294967296) // 496) % 496 AS cy,
         3 + p_partkey % 6 AS r
  FROM part WHERE p_partkey % 5 = 0
),
off AS (
  SELECT a.dx, b.dy
  FROM (SELECT unnest(generate_series(-8, 8)) AS dx) a,
       (SELECT unnest(generate_series(-8, 8)) AS dy) b
),
px AS MATERIALIZED (
  SELECT DISTINCT (cx + dx) * 512 + (cy + dy) AS key
  FROM d, off WHERE dx * dx + dy * dy <= r * r
),
-- grid CC by ALTERNATING run-min floods (gaps-and-islands window
-- per axis: one sweep floods a whole horizontal run, the next a
-- whole vertical run) — pure window functions, no joins, no
-- recursion; 48 sweeps converge with wide margin on this fixture
-- (32 suffice at sf0.1; the oracle hash certifies convergence)
l0 AS MATERIALIZED (SELECT key, key AS lbl FROM px),
a0 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l0)),
l1 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a0)),
a1 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l1)),
l2 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a1)),
a2 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l2)),
l3 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a2)),
a3 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l3)),
l4 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a3)),
a4 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l4)),
l5 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a4)),
a5 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l5)),
l6 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a5)),
a6 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l6)),
l7 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a6)),
a7 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l7)),
l8 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a7)),
a8 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l8)),
l9 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a8)),
a9 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l9)),
l10 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a9)),
a10 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l10)),
l11 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a10)),
a11 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l11)),
l12 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a11)),
a12 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l12)),
l13 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a12)),
a13 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l13)),
l14 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a13)),
a14 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l14)),
l15 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a14)),
a15 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l15)),
l16 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a15)),
a16 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l16)),
l17 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a16)),
a17 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l17)),
l18 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a17)),
a18 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l18)),
l19 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a18)),
a19 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l19)),
l20 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a19)),
a20 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l20)),
l21 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a20)),
a21 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l21)),
l22 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a21)),
a22 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l22)),
l23 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a22)),
a23 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l23)),
l24 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a23)),
a24 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l24)),
l25 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a24)),
a25 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l25)),
l26 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a25)),
a26 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l26)),
l27 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a26)),
a27 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l27)),
l28 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a27)),
a28 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l28)),
l29 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a28)),
a29 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l29)),
l30 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a29)),
a30 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l30)),
l31 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a30)),
a31 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l31)),
l32 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a31)),
a32 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l32)),
l33 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a32)),
a33 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l33)),
l34 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a33)),
a34 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l34)),
l35 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a34)),
a35 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l35)),
l36 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a35)),
a36 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l36)),
l37 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a36)),
a37 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l37)),
l38 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a37)),
a38 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l38)),
l39 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a38)),
a39 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l39)),
l40 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a39)),
a40 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l40)),
l41 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a40)),
a41 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l41)),
l42 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a41)),
a42 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l42)),
l43 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a42)),
a43 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l43)),
l44 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a43)),
a44 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l44)),
l45 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a44)),
a45 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l45)),
l46 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a45)),
a46 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l46)),
l47 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a46)),
a47 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key % 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key // 512 - ROW_NUMBER() OVER (PARTITION BY key % 512
            ORDER BY key // 512) AS isl
        FROM l47)),
l48 AS MATERIALIZED (
  SELECT key, min(lbl) OVER (PARTITION BY key // 512, isl) AS lbl
  FROM (SELECT key, lbl,
          key % 512 - ROW_NUMBER() OVER (PARTITION BY key // 512
            ORDER BY key % 512) AS isl
        FROM a47)),
lab AS (SELECT key, lbl AS comp FROM l48)
SELECT comp, CAST(count(*) AS BIGINT) AS n,
       CAST(min(key // 512) AS BIGINT) AS x0,
       CAST(max(key // 512) AS BIGINT) AS x1,
       CAST(min(key % 512) AS BIGINT) AS y0,
       CAST(max(key % 512) AS BIGINT) AS y1
FROM lab GROUP BY comp
"""


def q_morans(sf_dir: str):
    """Global spatial autocorrelation (Moran's I) over a 64x64 cell
    grid with rook adjacency, as EXACT integers: with z_i = n*x_i - s
    (scaled deviations stay integral), the I numerator/denominator
    components (directed cross-sum, squared-sum, weight count) are
    pure keyed folds — each occupied cell SCATTERS z to its 4
    neighbor keys and one keyed sum produces every neighbor total, no
    self-join, no broadcast. Emits ONE row
    (n_cells, total, w, cross_sum, sq_sum); I = n*cross/(w*sq)
    downstream. SQL twin joins the cell table to itself."""
    from ray.data.aggregate import Sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def cells(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        key = (p["m1"] >> 20) * 256 + (p["m2"] >> 20)
        u, c = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u), "x": pa.array(c.astype(np.int64))})

    cellcounts = (li.map_batches(cells, batch_format="pyarrow")
                  .groupby("key").aggregate(Sum("x", alias_name="x"))
                  .materialize())
    n = cellcounts.count()
    s = int(cellcounts.sum("x"))

    def scatter(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        z = n * x - s
        cx, cy = key // 256, key % 256
        outs = [pa.table({"key": pa.array(key), "z": pa.array(z),
                          "self": pa.array(np.ones(len(key), np.int64)),
                          "sz": pa.array(np.zeros(len(key), np.int64)),
                          "cnt": pa.array(np.zeros(len(key), np.int64))})]
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            ok = ((cx + dx >= 0) & (cx + dx < 64)
                  & (cy + dy >= 0) & (cy + dy < 64))
            tk = (cx[ok] + dx) * 256 + (cy[ok] + dy)
            outs.append(pa.table({
                "key": pa.array(tk),
                "z": pa.array(np.zeros(len(tk), np.int64)),
                "self": pa.array(np.zeros(len(tk), np.int64)),
                "sz": pa.array(z[ok]),
                "cnt": pa.array(np.ones(len(tk), np.int64))}))
        return pa.concat_tables(outs)

    folded = (cellcounts.map_batches(scatter, batch_format="pyarrow")
              .groupby("key")
              .aggregate(Sum("z", alias_name="z"),
                         Sum("self", alias_name="self"),
                         Sum("sz", alias_name="sz"),
                         Sum("cnt", alias_name="cnt")))

    def parts(batch: pa.Table) -> pa.Table:
        sel = batch["self"].to_numpy(zero_copy_only=False) >= 1
        z = batch["z"].to_numpy(zero_copy_only=False)[sel]
        sz = batch["sz"].to_numpy(zero_copy_only=False)[sel]
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)[sel]
        return pa.table({"cross": pa.array(z * sz),
                         "sq": pa.array(z * z), "w": pa.array(cnt)})

    sums = folded.map_batches(parts, batch_format="pyarrow").sum(
        ["cross", "sq", "w"])
    return pa.table({
        "n_cells": pa.array([n], pa.int64()),
        "total": pa.array([s], pa.int64()),
        "w": pa.array([int(sums["sum(w)"])], pa.int64()),
        "cross_sum": pa.array([int(sums["sum(cross)"])], pa.int64()),
        "sq_sum": pa.array([int(sums["sum(sq)"])], pa.int64())})


Q_MORANS_SQL = f"""
WITH pts AS (
  SELECT m1 // 1048576 AS cx, m2 // 1048576 AS cy FROM ({_LI_SQL})
),
c AS (SELECT cx, cy, count(*) AS x FROM pts GROUP BY cx, cy),
st AS (SELECT count(*) AS n, sum(x) AS s FROM c),
z AS (SELECT cx, cy, st.n * c.x - st.s AS z FROM c, st),
e AS (
  SELECT a.z AS za, b.z AS zb FROM z a JOIN z b
    ON b.cx = a.cx + 1 AND b.cy = a.cy
  UNION ALL
  SELECT a.z, b.z FROM z a JOIN z b
    ON b.cx = a.cx AND b.cy = a.cy + 1
)
SELECT (SELECT n FROM st) AS n_cells,
       CAST((SELECT s FROM st) AS BIGINT) AS total,
       CAST(2 * (SELECT count(*) FROM e) AS BIGINT) AS w,
       CAST(2 * (SELECT coalesce(sum(za * zb), 0) FROM e) AS BIGINT)
         AS cross_sum,
       CAST((SELECT sum(z * z) FROM z) AS BIGINT) AS sq_sum
"""


def q_patch_grid(sf_dir: str):
    """ViT-style patch extraction (multimodal.PatchStage actor pool):
    decode each 256^2 fixture image, split into a 4x4 grid of 64^2
    patches, re-encode each patch, then decode the OUTPUT bytes for
    the integer pixel sum — 16 real crops+encodes per image. Constant
    32px blocks give every patch a closed form: pix_sum =
    3*1024*(160*nb + 160) with nb = planted bits inside the patch."""
    from osmray import codecs, oraclefix
    from osmray.multimodal import PatchStage

    images = oraclefix.load_phash()

    out = images.map_batches(
        lambda t: t.select(["idx", "bytes", "fmt"]),
        batch_format="pyarrow").map_batches(
        PatchStage,
        fn_constructor_kwargs={"ph": 64, "pw": 64},
        batch_format="pyarrow", concurrency=4, num_cpus=1)

    def summary(batch: pa.Table) -> pa.Table:
        pix = [int(codecs.png_decode(b).astype(np.int64).sum())
               for b in batch["bytes"].to_pylist()]
        return pa.table({"idx": batch["idx"], "pr": batch["pr"],
                         "pc": batch["pc"],
                         "pix_sum": pa.array(pix, pa.int64())})

    return out.map_batches(summary, batch_format="pyarrow")


Q_PATCH_GRID_SQL = f"""
WITH {_PH_CTES},
pgrid AS (
  SELECT pr.range AS pr, pc.range AS pc
  FROM range(0, 4) pr CROSS JOIN range(0, 4) pc
),
nb AS (
  SELECT b.i, g.pr, g.pc, SUM(b.bit) AS nb
  FROM phbits b, pgrid g
  WHERE b.j // 8 IN (2 * g.pr, 2 * g.pr + 1)
    AND b.j % 8 IN (2 * g.pc, 2 * g.pc + 1)
  GROUP BY b.i, g.pr, g.pc
)
SELECT i AS idx, pr, pc,
       CAST(3 * 1024 * (160 * nb + 160) AS BIGINT) AS pix_sum
FROM nb
"""


def q_gini(sf_dir: str):
    """EXACT integer Gini components over quantities — the
    inequality/concentration profile of a column at scale: with
    global rank i, gini_num = sum((2i - n - 1) * x_(i)) and
    gini_den = n * sum(x). One distributed sort, a per-block
    (min, max, count, sum, local rank-weighted sum) stats pass, then
    an O(#blocks) driver fold turns block offsets into the global
    rank contributions (the same prefix-scan shape as
    exact_order_stats). Tie runs make rank assignment ambiguous but
    (2i - n - 1) summed over a tie run is permutation-invariant, so
    the total is exact regardless of block-boundary tie placement."""
    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        q = np.floor(batch["l_quantity"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"q": pa.array(q)})

    sds = ds.map_batches(prep, batch_format="pyarrow").sort("q").materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b2": pa.array([], pa.int64())})
        v = batch["q"].to_numpy(zero_copy_only=False)
        j = np.arange(1, len(v) + 1, dtype=np.int64)
        return pa.table({"mn": pa.array([int(v[0])]),
                         "mx": pa.array([int(v[-1])]),
                         "n": pa.array([len(v)]),
                         "a": pa.array([int(v.sum())]),
                         "b2": pa.array([int(2 * (j * v).sum())])})

    st = (sds.map_batches(block_stats, batch_format="pyarrow",
                          batch_size=None)
          .to_pandas().sort_values(["mn", "mx"]).reset_index(drop=True))
    n_total = int(st["n"].sum())
    sum_q = int(st["a"].sum())
    offs = np.concatenate(([0], np.cumsum(st["n"].to_numpy())[:-1]))
    # contribution of a block at offset o: 2*o*A + B2 - (n+1)*A; blocks
    # sharing (mn, mx, n) are all-tie twins — permutation invariance
    # makes the sum over their offsets exact without disambiguation
    gini_num = int(sum(2 * int(o) * int(r.a) + int(r.b2)
                       - (n_total + 1) * int(r.a)
                       for o, (_, r) in zip(offs.tolist(), st.iterrows())))
    return pa.table({
        "n": pa.array([n_total], pa.int64()),
        "sum_q": pa.array([sum_q], pa.int64()),
        "gini_num": pa.array([gini_num], pa.int64()),
        "gini_den": pa.array([n_total * sum_q], pa.int64())})


Q_GINI_SQL = """
WITH t AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS q FROM lineitem
),
r AS (SELECT q, row_number() OVER (ORDER BY q) AS rn,
             count(*) OVER () AS n FROM t)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum((2 * rn - n - 1) * q) AS BIGINT) AS gini_num,
       CAST(max(n) * sum(q) AS BIGINT) AS gini_den
FROM r
"""


def q_kmv_intersect(sf_dir: str):
    """KMV set-operation sketch (sketch.kmv_intersect): bottom-256
    hashes of (lineitem part keys) UNION (even part keys) with
    membership flags — estimates |A INTERSECT B| and Jaccard without
    co-shuffling the sets; the whole flagged sketch hash-checks
    against the HUGEINT SQL replay."""
    from osmray.sketch import kmv_intersect

    a = _read(sf_dir, "lineitem", ["l_partkey"])

    def evens(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table({"p_partkey": pa.array(k[k % 2 == 0])})

    b = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        evens, batch_format="pyarrow")
    return kmv_intersect(a, b, "l_partkey", "p_partkey", k=256)


def _kmv_intersect_sql() -> str:
    from osmray.sketch import HLL_C1, HLL_C2

    m62 = 1 << 62

    def chain(src: str) -> str:
        return (f"SELECT DISTINCT xor(h2, h2 >> 32) AS h FROM ("
                f"SELECT CAST((CAST(xor(h1, h1 >> 29) AS HUGEINT) * {HLL_C2})"
                f" % {m62} AS BIGINT) AS h2 FROM ("
                f"SELECT CAST((CAST(xor(x, x >> 31) AS HUGEINT) * {HLL_C1})"
                f" % {m62} AS BIGINT) AS h1 FROM ({src})))")

    a_src = "SELECT DISTINCT l_partkey AS x FROM lineitem"
    b_src = "SELECT DISTINCT p_partkey AS x FROM part WHERE p_partkey % 2 = 0"
    return f"""
WITH ha AS ({chain(a_src)}),
hb AS ({chain(b_src)}),
u AS (
  SELECT h, max(ina) AS in_a, max(inb) AS in_b FROM (
    SELECT h, 1 AS ina, 0 AS inb FROM ha
    UNION ALL SELECT h, 0, 1 FROM hb)
  GROUP BY h
),
b AS (
  SELECT h, in_a, in_b,
         CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank
  FROM u QUALIFY rank <= 256
),
g AS (
  SELECT count(*) AS nk, max(h) AS hk,
         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS nb
  FROM b
)
SELECT rank, h, CAST(in_a AS BIGINT) AS in_a, CAST(in_b AS BIGINT) AS in_b,
  CAST(CASE WHEN g.nk = 256
       THEN floor(255 * 4611686018427387904.0 / hk) ELSE g.nk END
       AS BIGINT) AS est_union,
  CAST(g.nb AS BIGINT) AS n_both,
  CAST(g.nb * (CASE WHEN g.nk = 256
       THEN CAST(floor(255 * 4611686018427387904.0 / hk) AS BIGINT)
       ELSE g.nk END) // g.nk AS BIGINT) AS est_intersect
FROM b, g
"""


def q_max_concurrency(sf_dir: str):
    """Peak concurrency sweep: each event opens a 5-minute interval;
    the answer is the maximum number of simultaneously open intervals
    and the first instant it is reached. Classic +1/-1 sweep as ONE
    distributed pass: sort the 2n boundary events by (t, delta, eid)
    — ends exclusive, so -1 sorts before +1 at equal t — then a
    single per-block stats pass (total delta, local prefix max, ts at
    its first attainment) and an O(#blocks) driver fold turn block
    offsets into the global running maximum; no second pass, no
    per-row driver state."""
    import ray.data

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def boundaries(batch: pa.Table) -> pa.Table:
        t = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "t": pa.array(np.concatenate((t, t + 300_000_000))),
            "d": pa.array(np.concatenate((np.ones(len(t), np.int64),
                                          -np.ones(len(t), np.int64)))),
            "eid": pa.array(np.concatenate((eid, eid)))})

    sds = (ds.map_batches(boundaries, batch_format="pyarrow")
           .sort(["t", "d", "eid"]).materialize())

    def block_stats(batch: pa.Table) -> pa.Table:
        empty = pa.table({"ft": pa.array([], pa.int64()),
                          "fd": pa.array([], pa.int64()),
                          "fe": pa.array([], pa.int64()),
                          "total": pa.array([], pa.int64()),
                          "lmax": pa.array([], pa.int64()),
                          "tmax": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        d = batch["d"].to_numpy(zero_copy_only=False)
        t = batch["t"].to_numpy(zero_copy_only=False)
        pref = np.cumsum(d)
        i = int(np.argmax(pref))
        return pa.table({
            "ft": pa.array([int(t[0])]),
            "fd": pa.array([int(d[0])]),
            "fe": pa.array([int(batch["eid"][0].as_py())]),
            "total": pa.array([int(pref[-1])]),
            "lmax": pa.array([int(pref[i])]),
            "tmax": pa.array([int(t[i])])})

    st = (sds.map_batches(block_stats, batch_format="pyarrow",
                          batch_size=None)
          .to_pandas().sort_values(["ft", "fd", "fe"])
          .reset_index(drop=True))
    offs = np.concatenate(([0], np.cumsum(st["total"].to_numpy())[:-1]))
    cand = offs + st["lmax"].to_numpy()
    gmax = int(cand.max())
    first_ts = int(st["tmax"].to_numpy()[cand == gmax].min())
    return pa.table({"max_conc": pa.array([gmax], pa.int64()),
                     "first_ts_us": pa.array([first_ts], pa.int64())})


Q_MAX_CONCURRENCY_SQL = """
WITH ev AS (
  SELECT epoch_us(ts) AS t, 1 AS d, event_id AS eid FROM events
  UNION ALL
  SELECT epoch_us(ts) + 300000000, -1, event_id FROM events
),
r AS (
  SELECT t, sum(d) OVER (ORDER BY t, d, eid
                         ROWS UNBOUNDED PRECEDING) AS run
  FROM ev
),
m AS (SELECT max(run) AS mx FROM r)
SELECT CAST((SELECT mx FROM m) AS BIGINT) AS max_conc,
       CAST(min(t) AS BIGINT) AS first_ts_us
FROM r WHERE run = (SELECT mx FROM m)
"""


def q_box_iou_join(sf_dir: str):
    """Detection-box ASSOCIATION join: all cross-set box pairs with
    IoU >= 0.2 (exact integer test inter*5 >= 1*union), the
    prediction-vs-ground-truth matching primitive — the same PBSM
    grid plan as q_bbox_join (joins.box_overlap_join) with the IoU
    refinement folded into the per-candidate predicate: no extra
    shuffle over the plain overlap join, and the integer inter/union
    areas ride along for downstream mAP-style scoring."""
    from osmray.joins import box_overlap_join

    def part_boxes(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 128 + (k * 7919) % 65280
        cy = 128 + (k * 6151) % 65280
        w = 8 + k % 56
        h = 8 + (k * 31) % 56
        return pa.table({"id": pa.array(k), "x0": pa.array(cx - w),
                         "y0": pa.array(cy - h), "x1": pa.array(cx + w),
                         "y1": pa.array(cy + h)})

    def order_boxes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 128 + (k * 104729) % 65280
        cy = 128 + (k * 99991) % 65280
        w = 8 + k % 48
        h = 8 + (k * 17) % 48
        return pa.table({"id": pa.array(k), "x0": pa.array(cx - w),
                         "y0": pa.array(cy - h), "x1": pa.array(cx + w),
                         "y1": pa.array(cy + h)})

    left = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        part_boxes, batch_format="pyarrow")
    right = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        order_boxes, batch_format="pyarrow")
    return box_overlap_join(left, right, cell_shift=8, min_iou=(1, 5))


Q_BOX_IOU_JOIN_SQL = """
WITH a AS (
  SELECT p_partkey AS id,
    128 + (p_partkey * 7919) % 65280 AS cx, 128 + (p_partkey * 6151) % 65280 AS cy,
    8 + p_partkey % 56 AS w, 8 + (p_partkey * 31) % 56 AS h
  FROM part
),
b AS (
  SELECT o_orderkey AS id,
    128 + (o_orderkey * 104729) % 65280 AS cx, 128 + (o_orderkey * 99991) % 65280 AS cy,
    8 + o_orderkey % 48 AS w, 8 + (o_orderkey * 17) % 48 AS h
  FROM orders
),
cand AS (
  SELECT a.id AS a_id, b.id AS b_id,
    greatest(least(a.cx + a.w, b.cx + b.w) - greatest(a.cx - a.w, b.cx - b.w), 0)
      * greatest(least(a.cy + a.h, b.cy + b.h) - greatest(a.cy - a.h, b.cy - b.h), 0)
      AS inter,
    4 * a.w * a.h + 4 * b.w * b.h AS asum
  FROM a, b
  WHERE a.cx - a.w < b.cx + b.w AND b.cx - b.w < a.cx + a.w
    AND a.cy - a.h < b.cy + b.h AND b.cy - b.h < a.cy + a.h
)
SELECT a_id, b_id, CAST(inter AS BIGINT) AS inter,
       CAST(asum - inter AS BIGINT) AS uni
FROM cand
WHERE inter * 5 >= 1 * (asum - inter)
"""


def q_box_nms(sf_dir: str):
    """Greedy non-maximum suppression per image (the detection
    post-processing step): boxes grouped by image, highest-score
    survivor kept, overlaps (IoU >= 0.2, exact integer test)
    suppressed, repeat — geom.nms_boxes per group after ONE keyed
    shuffle. Groups are per-image detection sets (<= 8 boxes by
    construction here; bounded by the detector cap in general), so
    map_groups holds O(group) state only. The SQL twin unrolls the
    greedy rounds: round r keeps each image's best remaining box
    (row_number window) and deletes what it suppresses — 8 unrolled
    rounds == the max group size, so the twin is exact, including
    the chain-rescue property one-shot suppression filters miss."""
    from osmray.geom import nms_boxes

    def mk_boxes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 40 + (k * 7919) % 120
        cy = 40 + (k * 6151) % 120
        w = 20 + k % 30
        h = 20 + (k * 31) % 30
        return pa.table({
            "img": pa.array(k // 8), "id": pa.array(k),
            "score": pa.array((k * 37) % 1000),
            "x0": pa.array(cx - w), "y0": pa.array(cy - h),
            "x1": pa.array(cx + w), "y1": pa.array(cy + h)})

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        mk_boxes, batch_format="pyarrow")

    def group_nms(g: pa.Table) -> pa.Table:
        bid = g["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = nms_boxes(
            g["score"].to_numpy(zero_copy_only=False),
            g["x0"].to_numpy(zero_copy_only=False),
            g["y0"].to_numpy(zero_copy_only=False),
            g["x1"].to_numpy(zero_copy_only=False),
            g["y1"].to_numpy(zero_copy_only=False),
            1, 5, tie=bid)
        sel = pa.array(kept)
        return pa.table({"img": g["img"].take(sel), "id": g["id"].take(sel),
                         "score": g["score"].take(sel)})

    return ds.groupby("img").map_groups(group_nms, batch_format="pyarrow")


def _box_nms_sql() -> str:
    inter = ("greatest(least(r.x1, k.x1) - greatest(r.x0, k.x0), 0) * "
             "greatest(least(r.y1, k.y1) - greatest(r.y0, k.y0), 0)")
    uni = ("(r.x1 - r.x0) * (r.y1 - r.y0) + "
           "(k.x1 - k.x0) * (k.y1 - k.y0) - " + inter)
    parts = ["""
WITH b AS (
  SELECT o_orderkey // 8 AS img, o_orderkey AS id,
    (o_orderkey * 37) % 1000 AS score,
    40 + (o_orderkey * 7919) % 120 - (20 + o_orderkey % 30) AS x0,
    40 + (o_orderkey * 6151) % 120 - (20 + (o_orderkey * 31) % 30) AS y0,
    40 + (o_orderkey * 7919) % 120 + (20 + o_orderkey % 30) AS x1,
    40 + (o_orderkey * 6151) % 120 + (20 + (o_orderkey * 31) % 30) AS y1
  FROM orders
),
r0 AS (SELECT * FROM b)"""]
    for r in range(1, 9):
        parts.append(f""",
k{r} AS (
  SELECT img, id, score, x0, y0, x1, y1 FROM (
    SELECT *, row_number() OVER (PARTITION BY img ORDER BY score DESC, id) AS rn
    FROM r{r - 1}
  ) WHERE rn = 1
),
r{r} AS (
  SELECT r.* FROM r{r - 1} r JOIN k{r} k USING (img)
  WHERE ({inter}) * 5 < ({uni})
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT img, id, score FROM k{r}" for r in range(1, 9))
    return "".join(parts) + "\n" + union + "\n"


_DICT_PATTERNS = ("table", "spark", "merge", "scan", "fast table")


def q_dict_match(sf_dir: str):
    """Multi-pattern dictionary matching over the corpus (the
    keyword / PII-scan primitive): text.dict_count concatenates each
    batch into one 0-separated byte buffer and matches every pattern
    as a shifted-slice equality reduction — all positional
    occurrences, no per-character Python loop — then per-pattern
    (match, doc) totals fold through one tiny keyed Sum. The SQL twin
    uses the replace-length count, which equals the all-occurrence
    count because every pattern here is border-free (occurrences
    cannot overlap themselves)."""
    from ray.data.aggregate import Sum

    from osmray.text import dict_count

    pats = list(_DICT_PATTERNS)

    def part(batch: pa.Table) -> pa.Table:
        nm, nd = dict_count(batch["text"].to_pylist(), pats)
        return pa.table({
            "pid": pa.array(np.arange(len(pats), dtype=np.int64)),
            "n_matches": pa.array(nm), "n_docs": pa.array(nd)})

    agg = (_read(sf_dir, "documents", ["text"])
           .map_batches(part, batch_format="pyarrow")
           .groupby("pid")
           .aggregate(Sum("n_matches", alias_name="n_matches"),
                      Sum("n_docs", alias_name="n_docs")))

    def name(batch: pa.Table) -> pa.Table:
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pattern": pa.array([pats[i] for i in pid], pa.string()),
            "n_matches": batch["n_matches"], "n_docs": batch["n_docs"]})

    return agg.map_batches(name, batch_format="pyarrow")


def _dict_match_sql() -> str:
    parts = []
    for p in _DICT_PATTERNS:
        parts.append(f"""
SELECT '{p}' AS pattern,
  CAST(sum((length(text) - length(replace(text, '{p}', ''))) // {len(p)})
       AS BIGINT) AS n_matches,
  CAST(sum(CASE WHEN position('{p}' IN text) > 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_docs
FROM documents""")
    return "\nUNION ALL\n".join(parts)


def q_roaring_layout(sf_dir: str):
    """Roaring-bitmap-style container layout planning over the key
    space (the compressed-posting-list storage decision): keys group
    into 1024-wide containers; per container the run structure
    (gaps-and-islands over sorted keys) picks run / array / bitmap
    encoding by exact serialized-size comparison (4*n_runs vs
    min(2n, 8192)). ONE keyed shuffle, vectorized per-group diff
    scan. The SQL twin replays islands with lag and the same rule."""
    def per_container(g: pa.Table) -> pa.Table:
        k = np.sort(np.unique(
            g["key"].to_numpy(zero_copy_only=False).astype(np.int64)))
        n = len(k)
        n_runs = 1 + int((np.diff(k) > 1).sum()) if n else 0
        if 4 * n_runs < min(2 * n, 8192):
            layout = "run"
        elif n < 4096:
            layout = "array"
        else:
            layout = "bitmap"
        return pa.table({
            "container": pa.array([int(k[0] >> 10)], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "n_runs": pa.array([n_runs], pa.int64()),
            "layout": pa.array([layout], pa.string())})

    def keys(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"container": pa.array(k >> 10), "key": pa.array(k)})

    return (_read(sf_dir, "orders", ["o_orderkey"])
            .map_batches(keys, batch_format="pyarrow")
            .groupby("container")
            .map_groups(per_container, batch_format="pyarrow"))


Q_ROARING_LAYOUT_SQL = """
WITH k AS (SELECT DISTINCT o_orderkey AS key FROM orders),
e AS (
  SELECT key // 1024 AS c, key,
    lag(key) OVER (PARTITION BY key // 1024 ORDER BY key) AS prev
  FROM k
),
agg AS (
  SELECT c, count(*) AS n,
    sum(CASE WHEN prev IS NULL OR key - prev > 1 THEN 1 ELSE 0 END) AS n_runs
  FROM e GROUP BY c
)
SELECT c AS container, CAST(n AS BIGINT) AS n,
  CAST(n_runs AS BIGINT) AS n_runs,
  CASE WHEN 4 * n_runs < least(2 * n, 8192) THEN 'run'
       WHEN n < 4096 THEN 'array' ELSE 'bitmap' END AS layout
FROM agg
"""


def q_hrw_parts(sf_dir: str):
    """Rendezvous (HRW) consistent partitioning — the cluster-resize
    primitive: every key hashes once per shard and goes to the argmax
    (cells.hrw_shard). The op emits per-shard occupancy AND the
    resize evidence: n_moved counts keys whose shard changes when an
    8-shard layout grows to 9, n_moved_wrong counts moves to any shard
    OTHER than the new one — structurally zero (the HRW guarantee:
    old shards' relative order is untouched by adding a shard).
    Map-side keyed-sum partials, one small Sum shuffle. The SQL twin
    replays the hash matrix with range(9) + row_number argmax."""
    from ray.data.aggregate import Sum

    from osmray.cells import hrw_shard

    def assign(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s8 = hrw_shard(k, 8)
        s9 = hrw_shard(k, 9)
        moved = (s9 != s8).astype(np.int64)
        wrong = (moved & (s9 != 8)).astype(np.int64)
        return _keyed_sums(s8, {"n_moved": moved, "n_moved_wrong": wrong},
                           "shard")

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        assign, batch_format="pyarrow")
    return ds.groupby("shard").aggregate(
        Sum("cnt", alias_name="cnt"),
        Sum("n_moved", alias_name="n_moved"),
        Sum("n_moved_wrong", alias_name="n_moved_wrong"))


Q_HRW_PARTS_SQL = """
WITH h AS (
  SELECT o_orderkey AS key, r.range AS s,
    (o_orderkey * (((r.range + 1) * (r.range + 1) * (r.range + 1)
                    * 2654435761 + (r.range + 1) * 40503) % 1048573)
     + (((r.range + 1) * (r.range + 1) * (r.range + 1) * 2654435761
         + (r.range + 1) * 40503) % 1048573)
       * (((r.range + 1) * (r.range + 1) * (r.range + 1) * 2654435761
           + (r.range + 1) * 40503) % 1048573)) % 1048573 AS hv
  FROM orders CROSS JOIN range(9) r
),
s8 AS (
  SELECT key, s AS shard8 FROM (
    SELECT key, s, row_number() OVER (
      PARTITION BY key ORDER BY hv DESC, s) AS rn
    FROM h WHERE s < 8) WHERE rn = 1
),
s9 AS (
  SELECT key, s AS shard9 FROM (
    SELECT key, s, row_number() OVER (
      PARTITION BY key ORDER BY hv DESC, s) AS rn
    FROM h) WHERE rn = 1
)
SELECT shard8 AS shard, CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CASE WHEN shard9 <> shard8 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_moved,
  CAST(sum(CASE WHEN shard9 <> shard8 AND shard9 <> 8 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_moved_wrong
FROM s8 JOIN s9 USING (key)
GROUP BY shard8
"""


def q_box_union_area(sf_dir: str):
    """Union area of each image's detection boxes (the coverage
    measure: how much of the frame the detections cover, overlaps
    counted once) — geom.union_area_boxes per group after ONE keyed
    shuffle; groups are per-image detection sets (<= 8 boxes here,
    detector-capped in general). The SQL twin is the same sweep in
    closed form: coordinate-compressed x slabs (lead window), then
    gaps-and-islands over the spanning boxes' y intervals (running
    max + island sum) — exact integers end to end."""
    from osmray.geom import union_area_boxes

    def mk_boxes(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = 40 + (k * 7919) % 120
        cy = 40 + (k * 6151) % 120
        w = 20 + k % 30
        h = 20 + (k * 31) % 30
        return pa.table({
            "img": pa.array(k // 8),
            "x0": pa.array(cx - w), "y0": pa.array(cy - h),
            "x1": pa.array(cx + w), "y1": pa.array(cy + h)})

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        mk_boxes, batch_format="pyarrow")

    def group_area(g: pa.Table) -> pa.Table:
        area = union_area_boxes(
            g["x0"].to_numpy(zero_copy_only=False),
            g["y0"].to_numpy(zero_copy_only=False),
            g["x1"].to_numpy(zero_copy_only=False),
            g["y1"].to_numpy(zero_copy_only=False))
        return pa.table({"img": g["img"][:1],
                         "n_boxes": pa.array([len(g)], pa.int64()),
                         "union_area": pa.array([area], pa.int64())})

    return ds.groupby("img").map_groups(group_area, batch_format="pyarrow")


Q_BOX_UNION_AREA_SQL = """
WITH b AS (
  SELECT o_orderkey // 8 AS img,
    40 + (o_orderkey * 7919) % 120 - (20 + o_orderkey % 30) AS x0,
    40 + (o_orderkey * 6151) % 120 - (20 + (o_orderkey * 31) % 30) AS y0,
    40 + (o_orderkey * 7919) % 120 + (20 + o_orderkey % 30) AS x1,
    40 + (o_orderkey * 6151) % 120 + (20 + (o_orderkey * 31) % 30) AS y1
  FROM orders
),
xs AS (
  SELECT DISTINCT img, x0 AS x FROM b
  UNION SELECT DISTINCT img, x1 FROM b
),
sl AS (
  SELECT img, x AS xa,
         lead(x) OVER (PARTITION BY img ORDER BY x) AS xb
  FROM xs
),
cov AS (
  SELECT s.img, s.xa, s.xb, b.y0, b.y1
  FROM sl s JOIN b ON b.img = s.img AND b.x0 <= s.xa AND b.x1 >= s.xb
  WHERE s.xb IS NOT NULL
),
mk AS (
  SELECT img, xa, xb, y0, y1,
    CASE WHEN y0 > coalesce(max(y1) OVER (
        PARTITION BY img, xa ORDER BY y0, y1
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1000000)
      THEN 1 ELSE 0 END AS ni
  FROM cov
),
isl AS (
  SELECT img, xa, xb, y0, y1,
    sum(ni) OVER (PARTITION BY img, xa ORDER BY y0, y1
                  ROWS UNBOUNDED PRECEDING) AS grp
  FROM mk
),
ln AS (
  SELECT img, xa, xb, grp, max(y1) - min(y0) AS ylen
  FROM isl GROUP BY img, xa, xb, grp
),
cnt AS (SELECT img, CAST(count(*) AS BIGINT) AS n_boxes FROM b GROUP BY img)
SELECT c.img, c.n_boxes,
       CAST(sum((l.xb - l.xa) * l.ylen) AS BIGINT) AS union_area
FROM ln l JOIN cnt c USING (img)
GROUP BY c.img, c.n_boxes
"""


def q_geohash(sf_dir: str):
    """Geohash cell aggregation: each point encodes to a 6-char
    geohash (cells.geohash_encode — exact bit-interleave + base32,
    verified against the canonical algorithm), aggregated per 4-char
    prefix. Aggregation runs entirely on INTEGER codes (20-bit prefix
    key, Sum/Min folds of per-block partials via _keyed_sums); the
    base32 strings materialize only in the final, already-aggregated
    rows — strings never enter the shuffle."""
    from ray.data.aggregate import Min, Sum

    from osmray.cells import geohash_code, geohash_str

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def encode(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        # 15-bit lattice (6-char geohash: 15+15 bits)
        code = geohash_code(p["m1"] >> 11, p["m2"] >> 11, 6)
        return pa.table({"pfx": pa.array(code >> 10), "code": pa.array(code)})

    def partial(batch: pa.Table) -> pa.Table:
        pfx = batch["pfx"].to_numpy(zero_copy_only=False)
        code = batch["code"].to_numpy(zero_copy_only=False)
        order = np.argsort(pfx, kind="stable")
        ks = pfx[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
        counts = np.diff(np.concatenate((bounds, [len(ks)]))).astype(np.int64)
        cmin = np.minimum.reduceat(code[order], bounds)
        return pa.table({"pfx": pa.array(ks[bounds]), "cnt": pa.array(counts),
                         "code_min": pa.array(cmin)})

    agg = (ds.map_batches(encode, batch_format="pyarrow")
           .map_batches(partial, batch_format="pyarrow")
           .groupby("pfx")
           .aggregate(Sum("cnt", alias_name="n"),
                      Min("code_min", alias_name="code_min")))

    def to_strings(batch: pa.Table) -> pa.Table:
        pfx = batch["pfx"].to_numpy(zero_copy_only=False)
        cmin = batch["code_min"].to_numpy(zero_copy_only=False)
        return pa.table({
            "gh4": pa.array(geohash_str(pfx, 4)),
            "n": batch["n"],
            "first_gh6": pa.array(geohash_str(cmin, 6))})

    return agg.map_batches(to_strings, batch_format="pyarrow")


def _geohash_sql() -> str:
    from osmray.cells import GEOHASH32

    bits = " + ".join(
        f"(((m1 // 2048) // {1 << (14 - i)}) % 2) * {1 << (29 - 2 * i)} + "
        f"(((m2 // 2048) // {1 << (14 - i)}) % 2) * {1 << (28 - 2 * i)}"
        for i in range(15))
    gh4 = " || ".join(
        f"substr('{GEOHASH32}', 1 + CAST((pfx // {1 << (5 * (3 - c))}) % 32 AS INT), 1)"
        for c in range(4))
    gh6 = " || ".join(
        f"substr('{GEOHASH32}', 1 + CAST((code_min // {1 << (5 * (5 - c))}) % 32 AS INT), 1)"
        for c in range(6))
    return f"""
WITH p AS ({_LI_SQL}),
enc AS (SELECT {bits} AS code FROM p),
agg AS (
  SELECT code // 1024 AS pfx, CAST(count(*) AS BIGINT) AS n,
         min(code) AS code_min
  FROM enc GROUP BY 1
)
SELECT {gh4} AS gh4, n, {gh6} AS first_gh6 FROM agg
"""


def q_quadkey(sf_dir: str):
    """Quadkey tile naming (tilemath.quadkey_str — the Bing-style
    base-4 string whose prefixes name ancestor tiles): points tile at
    z12, aggregate per 6-digit prefix (= the z6 ancestor). Like
    q_geohash the shuffle runs entirely on INTEGER Morton codes
    (Sum/Min of per-block partials); strings materialize only on the
    final aggregated rows. The twin rebuilds each digit with // and %
    and concatenates."""
    from ray.data.aggregate import Min, Sum

    from osmray.tilemath import quadkey_str

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def encode(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        tx = p["m1"] >> 14  # z12 tiles of the 26-bit lattice
        ty = p["m2"] >> 14
        code = np.zeros(len(tx), np.int64)
        for i in range(12):
            code |= ((tx >> i) & 1) << (2 * i)
            code |= ((ty >> i) & 1) << (2 * i + 1)
        return pa.table({"pfx": pa.array(code >> 12), "code": pa.array(code)})

    def partial(batch: pa.Table) -> pa.Table:
        pfx = batch["pfx"].to_numpy(zero_copy_only=False)
        code = batch["code"].to_numpy(zero_copy_only=False)
        order = np.argsort(pfx, kind="stable")
        ks = pfx[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
        counts = np.diff(np.concatenate((bounds, [len(ks)]))).astype(np.int64)
        cmin = np.minimum.reduceat(code[order], bounds)
        return pa.table({"pfx": pa.array(ks[bounds]), "cnt": pa.array(counts),
                         "code_min": pa.array(cmin)})

    agg = (ds.map_batches(encode, batch_format="pyarrow")
           .map_batches(partial, batch_format="pyarrow")
           .groupby("pfx")
           .aggregate(Sum("cnt", alias_name="n"),
                      Min("code_min", alias_name="code_min")))

    def to_strings(batch: pa.Table) -> pa.Table:
        pfx = batch["pfx"].to_numpy(zero_copy_only=False)
        cmin = batch["code_min"].to_numpy(zero_copy_only=False)
        # unpack morton -> (tx, ty) then render; prefix code is z6
        def unpack(code, z):
            tx = np.zeros(len(code), np.int64)
            ty = np.zeros(len(code), np.int64)
            for i in range(z):
                tx |= ((code >> (2 * i)) & 1) << i
                ty |= ((code >> (2 * i + 1)) & 1) << i
            return tx, ty

        tx6, ty6 = unpack(pfx, 6)
        tx12, ty12 = unpack(cmin, 12)
        return pa.table({
            "qk6": pa.array(quadkey_str(tx6, ty6, 6)),
            "n": batch["n"],
            "first_qk12": pa.array(quadkey_str(tx12, ty12, 12))})

    return agg.map_batches(to_strings, batch_format="pyarrow")


def _quadkey_sql() -> str:
    code = " + ".join(
        f"(((m1 // 16384) // {1 << i}) % 2) * {1 << (2 * i)} + "
        f"(((m2 // 16384) // {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(12))
    qk6 = " || ".join(
        f"CAST((pfx // {1 << (2 * (5 - i))}) % 4 AS VARCHAR)"
        for i in range(6))
    qk12 = " || ".join(
        f"CAST((code_min // {1 << (2 * (11 - i))}) % 4 AS VARCHAR)"
        for i in range(12))
    return f"""
WITH p AS ({_LI_SQL}),
enc AS (SELECT {code} AS code FROM p),
agg AS (
  SELECT code // 4096 AS pfx, CAST(count(*) AS BIGINT) AS n,
         min(code) AS code_min
  FROM enc GROUP BY 1
)
SELECT {qk6} AS qk6, n, {qk12} AS first_qk12 FROM agg
"""


def q_hist_eq(sf_dir: str):
    """Photometric normalization: decode -> per-channel histogram
    equalization -> re-encode as an actor-pool stage
    (multimodal.HistEqStage), over the planted-phash fixture whose
    two-level images give the remap a DuckDB closed form: cdf_min is
    the dark level's count, so dark pixels map to 0 and bright to
    255 — pix_sum = 3*255*1024*n1 (degenerate single-level images
    pass through) and the phash is preserved (the remap is
    monotone)."""
    from osmray import oraclefix
    from osmray.multimodal import HistEqStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "w", "h", "idx"])

    out = images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        HistEqStage,
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )
    return out.map_batches(_media_summary, batch_format="pyarrow")


Q_HIST_EQ_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS n1 FROM phbits GROUP BY i)
SELECT phx.i AS idx, 256 AS w, 256 AS h,
  CAST(CASE WHEN pc.n1 = 0 THEN 3 * 65536 * 40
            WHEN pc.n1 = 64 THEN 3 * 65536 * 200
            ELSE 3 * 255 * 1024 * pc.n1 END AS BIGINT) AS pix_sum,
  phx.phash
FROM phx JOIN pc USING (i)
"""


def q_rle_mask(sf_dir: str):
    """COCO-style column-major RLE of each image's thresholded mask
    (multimodal.RleMaskStage -> raster.rle_encode): the wire format
    that ships a label mask as O(#boundary) ints instead of 64 Ki
    pixels. Emits exact RLE observables (foreground run count, area,
    leading-background length) plus an in-stage decode roundtrip
    check. The SQL twin derives the run count in closed form from the
    planted 8x8 bit grid: 32 image columns per block column, so
    n_fg_runs = 32*(vertical 1-islands) - 31*(bottom&top self-merges)
    - (bottom&next-top block-boundary merges); first_fg is the min
    Fortran index 8192*cb + 32*rb over set bits."""
    from osmray import oraclefix
    from osmray.multimodal import RleMaskStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        RleMaskStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


Q_RLE_MASK_SQL = f"""
WITH {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
isl0 AS (
  SELECT i, cb, rb, bit,
         coalesce(lag(bit) OVER (PARTITION BY i, cb ORDER BY rb), 0) AS up
  FROM pb
),
isl AS (SELECT i, SUM(CASE WHEN bit = 1 AND up = 0 THEN 1 ELSE 0 END) AS n
        FROM isl0 GROUP BY i),
vm AS (SELECT a.i, SUM(a.bit * b.bit) AS n
       FROM pb a JOIN pb b ON b.i = a.i AND b.cb = a.cb
       WHERE a.rb = 7 AND b.rb = 0 GROUP BY a.i),
hm AS (SELECT a.i, SUM(a.bit * b.bit) AS n
       FROM pb a JOIN pb b ON b.i = a.i AND b.cb = a.cb + 1
       WHERE a.rb = 7 AND b.rb = 0 GROUP BY a.i),
ar AS (SELECT i, SUM(bit) AS n1,
              MIN(CASE WHEN bit = 1 THEN 8192 * cb + 32 * rb END) AS ff
       FROM pb GROUP BY i)
SELECT isl.i AS idx,
  CAST(32 * isl.n - 31 * vm.n - hm.n AS BIGINT) AS n_fg_runs,
  CAST(1024 * ar.n1 AS BIGINT) AS fg_area,
  CAST(coalesce(ar.ff, 65536) AS BIGINT) AS first_fg,
  TRUE AS roundtrip_ok
FROM isl JOIN vm USING (i) JOIN hm USING (i) JOIN ar USING (i)
"""


def q_distance_transform(sf_dir: str):
    """Proximity raster: decode -> coarse occupancy grid -> EXACT L1
    distance transform (raster.l1_distance_transform — the separable
    four-scan minimum.accumulate pass, no per-pixel loop) as an
    actor-pool stage, emitting integer distance-sum/max per image.
    On the planted fixture the 8x8 coarse grid IS the bit grid, so
    the SQL twin brute-forces min(|dr|+|dc|) over the set bits
    (capped at 16 for empty masks — unreachable otherwise, the 8x8
    diameter is 14)."""
    from osmray import oraclefix
    from osmray.multimodal import DistanceTransformStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        DistanceTransformStage, batch_format="pyarrow",
        concurrency=2, num_cpus=1)


Q_DISTANCE_TRANSFORM_SQL = f"""
WITH {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
fg AS (SELECT i, rb, cb FROM pb WHERE bit = 1),
dt AS (
  SELECT p.i, p.rb, p.cb,
         coalesce(min(abs(p.rb - f.rb) + abs(p.cb - f.cb)), 16) AS d
  FROM pb p LEFT JOIN fg f ON f.i = p.i
  GROUP BY p.i, p.rb, p.cb
)
SELECT i AS idx, CAST(sum(d) AS BIGINT) AS dt_sum,
       CAST(max(d) AS BIGINT) AS dt_max
FROM dt GROUP BY i
"""


def q_contours(sf_dir: str):
    """Raster -> vector: marching squares over each image's coarse
    occupancy grid (multimodal.MarchingSquaresStage), emitting exact
    integer contour observables (segment count with the standard
    two-segment saddle rule, crossed-cell count, case checksum). The
    SQL twin rebuilds every 2x2 case code from the planted bit grid
    with three self-joins and replays the per-case segment counts."""
    from osmray import oraclefix
    from osmray.multimodal import MarchingSquaresStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        MarchingSquaresStage, batch_format="pyarrow",
        concurrency=2, num_cpus=1)


Q_CONTOURS_SQL = f"""
WITH {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
c2 AS (
  SELECT a.i,
         8 * a.bit + 4 * b.bit + 2 * d.bit + 1 * c.bit AS cs
  FROM pb a
  JOIN pb b ON b.i = a.i AND b.rb = a.rb AND b.cb = a.cb + 1
  JOIN pb c ON c.i = a.i AND c.rb = a.rb + 1 AND c.cb = a.cb
  JOIN pb d ON d.i = a.i AND d.rb = a.rb + 1 AND d.cb = a.cb + 1
)
SELECT i AS idx,
  CAST(SUM(CASE WHEN cs IN (0, 15) THEN 0
                WHEN cs IN (5, 10) THEN 2 ELSE 1 END) AS BIGINT) AS n_segments,
  CAST(SUM(CASE WHEN cs IN (0, 15) THEN 0 ELSE 1 END) AS BIGINT) AS n_crossed,
  CAST(SUM(cs) AS BIGINT) AS case_sum
FROM c2 GROUP BY i
"""


def q_contour_rings(sf_dir: str):
    """Vectorize completion: marching-squares segments chained into
    RINGS per image (multimodal.ContourRingsStage -> union-find over
    segment endpoints), emitting ring count, vertex count, and the
    sum of per-ring minimum vertex ids. The SQL twin rebuilds the
    segments from the case table (emitted from the same _MS_SEGS
    source as the kernel), then converges the identical checksum by
    recursive min-label propagation — the q_connected_components
    twin pattern, per image over bounded contour graphs."""
    from osmray import oraclefix
    from osmray.multimodal import ContourRingsStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        ContourRingsStage, batch_format="pyarrow",
        concurrency=2, num_cpus=1)


def _contour_rings_sql() -> str:
    from osmray.raster import _MS_SEGS

    vals = ", ".join(
        f"({cs}, {r0}, {c0}, {r1}, {c1})"
        for cs in sorted(_MS_SEGS)
        for (r0, c0, r1, c1) in _MS_SEGS[cs])
    return f"""
WITH RECURSIVE {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
c2 AS (
  SELECT a.i, a.rb, a.cb,
         8 * a.bit + 4 * b.bit + 2 * d.bit + 1 * c.bit AS cs
  FROM pb a
  JOIN pb b ON b.i = a.i AND b.rb = a.rb AND b.cb = a.cb + 1
  JOIN pb c ON c.i = a.i AND c.rb = a.rb + 1 AND c.cb = a.cb
  JOIN pb d ON d.i = a.i AND d.rb = a.rb + 1 AND d.cb = a.cb + 1
),
segs(cs, r0, c0, r1, c1) AS (VALUES {vals}),
e0 AS (
  SELECT c2.i,
         (2 * c2.rb + s.r0) * 256 + (2 * c2.cb + s.c0) AS u,
         (2 * c2.rb + s.r1) * 256 + (2 * c2.cb + s.c1) AS v
  FROM c2 JOIN segs s ON s.cs = c2.cs
),
ee AS (SELECT i, u, v FROM e0 UNION SELECT i, v AS u, u AS v FROM e0),
r AS (
  SELECT i, u AS node, u AS label
  FROM (SELECT i, u FROM ee UNION SELECT i, v FROM ee)
  UNION
  SELECT ee.i, ee.v AS node, r.label
  FROM r JOIN ee ON ee.i = r.i AND ee.u = r.node WHERE r.label < ee.v
),
comp AS (SELECT i, node, min(label) AS l FROM r GROUP BY i, node),
agg AS (
  SELECT i, count(DISTINCT l) AS n_rings, count(*) AS n_vertices,
         sum(DISTINCT l) AS ck
  FROM comp GROUP BY i
)
SELECT ii.range AS idx,
  CAST(coalesce(agg.n_rings, 0) AS BIGINT) AS n_rings,
  CAST(coalesce(agg.n_vertices, 0) AS BIGINT) AS n_vertices,
  CAST(coalesce(agg.ck, 0) AS BIGINT) AS ring_checksum
FROM range(0, 1024) ii LEFT JOIN agg ON agg.i = ii.range
"""


def q_largest_square(sf_dir: str):
    """Largest all-foreground square per image (the free-space
    placement primitive): the classic min-of-three DP
    (raster.largest_square) over the coarse occupancy grid, emitting
    side + number of achieving positions. The SQL twin enumerates all
    204 (size, position) squares of the 8x8 grid and keeps those
    whose bit sum fills the region — the DP must agree with brute
    enumeration exactly."""
    from osmray import oraclefix
    from osmray.multimodal import LargestSquareStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        LargestSquareStage, batch_format="pyarrow",
        concurrency=2, num_cpus=1)


Q_LARGEST_SQUARE_SQL = f"""
WITH {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
pos AS (
  SELECT s.range + 1 AS s, r.range AS r0, c.range AS c0
  FROM range(8) s, range(8) r, range(8) c
  WHERE r.range + s.range + 1 <= 8 AND c.range + s.range + 1 <= 8
),
full_sq AS (
  SELECT pb.i, p.s, p.r0, p.c0
  FROM pos p JOIN pb ON pb.rb >= p.r0 AND pb.rb < p.r0 + p.s
                    AND pb.cb >= p.c0 AND pb.cb < p.c0 + p.s
  GROUP BY pb.i, p.s, p.r0, p.c0
  HAVING sum(pb.bit) = p.s * p.s
),
mx AS (SELECT i, max(s) AS side FROM full_sq GROUP BY i),
cnt AS (
  SELECT f.i, count(*) AS n
  FROM full_sq f JOIN mx ON mx.i = f.i AND mx.side = f.s
  GROUP BY f.i
)
SELECT ii.range AS idx,
  CAST(coalesce(mx.side, 0) AS BIGINT) AS side,
  CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_max
FROM range(0, 1024) ii
LEFT JOIN mx ON mx.i = ii.range
LEFT JOIN cnt ON cnt.i = ii.range
"""


def q_otsu(sf_dir: str):
    """Automatic binarization threshold per image: exact integer Otsu
    (multimodal.otsu_threshold — between-class variance compared as
    cross-multiplied rationals, smallest-t tie-break) over the coarse
    grid. On the planted two-level fixture the argmax has a closed
    form the SQL twin replays: every t in (40, 200] ties, so t = 41,
    with objective numerator 25600*a^2*b^2 and denominator a*b for
    dark/bright counts (a, b); single-level images yield (0, 0, 0)."""
    from osmray import oraclefix
    from osmray.multimodal import OtsuStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        OtsuStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


Q_OTSU_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS b FROM phbits GROUP BY i)
SELECT i AS idx,
  CAST(CASE WHEN b IN (0, 64) THEN 0 ELSE 41 END AS BIGINT) AS otsu_t,
  CAST(CASE WHEN b IN (0, 64) THEN 0
       ELSE 25600 * (64 - b) * (64 - b) * b * b END AS BIGINT) AS obj_num,
  CAST(CASE WHEN b IN (0, 64) THEN 0
       ELSE (64 - b) * b END AS BIGINT) AS obj_den
FROM pc
"""


def q_grid_path(sf_dir: str):
    """Free-space navigation per image: vectorized BFS wavefront over
    the coarse occupancy grid (foreground = obstacle,
    raster.bfs_grid_distance — four boolean shifts per round, rounds
    bounded by the grid diameter), emitting the corner-to-corner
    shortest free-space distance (255 = unreachable) and the
    reachable-cell count. The SQL twin is recursive BFS label
    propagation over the background cells with a d < 64 walk cap
    (any 8x8 shortest path is <= 63), min(d) per cell."""
    from osmray import oraclefix
    from osmray.multimodal import GridPathStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        GridPathStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


Q_GRID_PATH_SQL = f"""
WITH RECURSIVE {_PH_CTES},
pb AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
bg AS (SELECT i, rb, cb FROM pb WHERE bit = 0),
rch AS (
  SELECT i, rb, cb, 0 AS d FROM bg WHERE rb = 0 AND cb = 0
  UNION
  SELECT b.i, b.rb, b.cb, r.d + 1
  FROM rch r JOIN bg b ON b.i = r.i
    AND abs(b.rb - r.rb) + abs(b.cb - r.cb) = 1
  WHERE r.d < 64
),
m AS (SELECT i, rb, cb, min(d) AS d FROM rch GROUP BY i, rb, cb),
agg AS (SELECT i, count(*) AS n_reach FROM m GROUP BY i),
tgt AS (SELECT i, d FROM m WHERE rb = 7 AND cb = 7)
SELECT ii.range AS idx,
  CAST(coalesce(tgt.d, 255) AS BIGINT) AS dist,
  CAST(coalesce(agg.n_reach, 0) AS BIGINT) AS n_reachable
FROM range(0, 1024) ii
LEFT JOIN agg ON agg.i = ii.range
LEFT JOIN tgt ON tgt.i = ii.range
"""


_INTEGRAL_RECTS = ((17, 9, 201, 155), (40, 40, 72, 72), (3, 229, 250, 256))


def q_integral_rects(sf_dir: str):
    """Box features via summed-area tables (the Viola-Jones
    primitive): decode -> integral image -> O(1) rect sums for a
    fixed, deliberately cell-UNaligned rect list
    (multimodal.IntegralRectStage). On the planted fixture a rect's
    sum is sum over 8x8 cells of (40 + 160*bit) * overlap_area, so
    the SQL twin replays every rect from the bit table and integer
    overlap arithmetic — the integral-image path itself is what is
    being checked."""
    from osmray import oraclefix
    from osmray.multimodal import IntegralRectStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        IntegralRectStage,
        fn_constructor_kwargs={"rects": _INTEGRAL_RECTS},
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=1,
    )


def _integral_rects_sql() -> str:
    vals = ", ".join(f"({rid}, {x0}, {y0}, {x1}, {y1})"
                     for rid, (x0, y0, x1, y1) in enumerate(_INTEGRAL_RECTS))
    return f"""
WITH {_PH_CTES},
rects(rid, x0, y0, x1, y1) AS (VALUES {vals}),
ov AS (
  SELECT b.i, r.rid,
    greatest(least(32 * (b.j % 8) + 32, r.x1) - greatest(32 * (b.j % 8), r.x0), 0)
    * greatest(least(32 * (b.j // 8) + 32, r.y1) - greatest(32 * (b.j // 8), r.y0), 0)
    AS area, b.bit
  FROM phbits b, rects r
)
SELECT i AS idx, rid,
  CAST(3 * SUM((40 + 160 * bit) * area) AS BIGINT) AS rect_sum
FROM ov GROUP BY i, rid
"""


def q_hex_agg(sf_dir: str):
    """Hexagonal cell aggregation (the H3-style index named in the
    north star): exact integer nearest-staggered-center assignment
    (cells.hex_at — Voronoi hexagons, two candidate rows, ties to the
    smaller row), then count + integer weight per hex via map-side
    _keyed_sums partials and ONE keyed aggregate. The SQL twin
    replays both candidate evaluations; every operand stays
    non-negative so DuckDB's truncating division agrees with numpy's
    floor."""
    from ray.data.aggregate import Sum

    from osmray.cells import hex_at

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def assign(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        cell = hex_at(p["m1"] >> 8, p["m2"] >> 8)
        return _keyed_sums(cell, {"w_sum": p["pid"] % 1000}, "cell")

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cell")
            .aggregate(Sum("cnt", alias_name="n"),
                       Sum("w_sum", alias_name="w_sum")))


Q_HEX_AGG_SQL = f"""
WITH p AS ({_LI_SQL}),
pts AS (SELECT pid, m1 // 256 AS px, m2 // 256 AS py FROM p),
c1 AS (SELECT pid, px, py, py // 3547 AS j1 FROM pts),
c2 AS (SELECT *, (j1 % 2) * 2048 AS off1, ((j1 + 1) % 2) * 2048 AS off2 FROM c1),
c3 AS (SELECT *, (2 * (px - off1) + 4096) // 8192 AS i1,
                 (2 * (px - off2) + 4096) // 8192 AS i2 FROM c2),
c4 AS (SELECT *,
  (px - (i1 * 4096 + off1)) * (px - (i1 * 4096 + off1))
    + (py - j1 * 3547) * (py - j1 * 3547) AS d1,
  (px - (i2 * 4096 + off2)) * (px - (i2 * 4096 + off2))
    + (py - (j1 + 1) * 3547) * (py - (j1 + 1) * 3547) AS d2
  FROM c3),
cell AS (SELECT pid,
  CASE WHEN d2 < d1 THEN (j1 + 1) * 32768 + i2 ELSE j1 * 32768 + i1 END AS cell
  FROM c4)
SELECT cell, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pid % 1000) AS BIGINT) AS w_sum
FROM cell GROUP BY cell
"""


def q_hilbert_parts(sf_dir: str):
    """Hilbert-curve range partitioning (the S2-style locality
    layout): 13-bit coords -> cells.hilbert_d (unit-step bijective
    curve — measured ~28% tighter 64-row range bboxes than the Morton
    layout of q_zorder_parts on the same points), EXACT octile bounds
    via exact_order_stats, per-partition occupancy + code range. The
    SQL twin unrolls the 13 masked rotation steps (every intermediate
    non-negative by construction)."""
    from ray.data.aggregate import Count, Max, Min

    from osmray.cells import hilbert_d
    from osmray.tableops import exact_order_stats

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def enc(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"code": pa.array(
            hilbert_d(p["m1"] >> 13, p["m2"] >> 13, 13))})

    codes = li.map_batches(enc, batch_format="pyarrow").materialize()
    bounds_ds = exact_order_stats(
        codes, "code", list(range(1, 8)),
        rank_fn=lambda k, n: max(1, n * k // 8))
    bounds = np.sort(bounds_ds.to_pandas()["value"].to_numpy())

    def assign(batch: pa.Table) -> pa.Table:
        c = batch["code"].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array(np.searchsorted(bounds, c, side="right")),
            "code": pa.array(c)})

    return (codes.map_batches(assign, batch_format="pyarrow")
            .groupby("part")
            .aggregate(Count(alias_name="n"),
                       Min("code", alias_name="mn"),
                       Max("code", alias_name="mx")))


def _hilbert_sql_ctes(src: str, order: int = 13) -> str:
    """Chained CTEs h1..h{order} replaying cells.hilbert_d's masked
    recurrence from CTE ``src`` (columns pid, x, y); the result CTE
    h{order} carries (pid, d)."""
    out = [f"h0 AS (SELECT pid, x, y, 0 AS d FROM {src})"]
    for k in range(order):
        s = 1 << (order - 1 - k)
        out.append(f"""
h{k + 1} AS (
  SELECT pid,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - ym ELSE ym END)
         ELSE xm END AS x,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s} - 1 - xm ELSE xm END)
         ELSE ym END AS y,
    d + {s * s} * (CASE WHEN ry = 1 THEN (CASE WHEN rx = 1 THEN 2 ELSE 1 END)
                        ELSE 3 * rx END) AS d
  FROM (SELECT pid, x // {s} AS rx, y // {s} AS ry,
               x % {s} AS xm, y % {s} AS ym, d FROM h{k})
)""")
    return ",\n".join(out)


def _hilbert_parts_sql() -> str:
    return f"""
WITH pts AS (
  SELECT pid, m1 // 8192 AS x, m2 // 8192 AS y FROM ({_LI_SQL})
),
{_hilbert_sql_ctes("pts")},
m AS (SELECT pid, d AS code FROM h13),
o AS (SELECT code, row_number() OVER (ORDER BY code) AS rn FROM m),
b AS (
  SELECT k, (SELECT min(code) FROM o
             WHERE rn = greatest(1, (SELECT count(*) FROM m) * k // 8)) AS bv
  FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) AS v(k)
),
asgn AS (
  SELECT code, (SELECT count(*) FROM b WHERE bv <= code) AS part FROM m
)
SELECT part, CAST(count(*) AS BIGINT) AS n,
       CAST(min(code) AS BIGINT) AS mn, CAST(max(code) AS BIGINT) AS mx
FROM asgn GROUP BY part
"""


def q_hausdorff(sf_dir: str):
    """Trajectory-similarity join: directed and symmetric Hausdorff
    distance (squared, exact integers) between paired point sets —
    users 2u / 2u+1 play the pair's two trajectories. ONE keyed
    shuffle co-locates a pair's points; geom.hausdorff_directed_sq
    runs the blocked O(|A|*|B|) kernel per group (per-trajectory
    point counts are bounded; the quadratic term never leaves a
    group). Pairs missing a side are absent (inner semantics,
    matching the twin's join)."""
    from osmray.geom import hausdorff_directed_sq

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "pair": pa.array(uid // 2), "side": pa.array(uid % 2),
            "x": pa.array((eid * 48271 + 7) % 65536),
            "y": pa.array((eid * 69621 + 3) % 65536)})

    def group_h(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        a = side == 0
        b = side == 1
        if not a.any() or not b.any():
            return pa.table({"pair": pa.array([], pa.int64()),
                             "h_ab": pa.array([], pa.int64()),
                             "h_ba": pa.array([], pa.int64()),
                             "h_max": pa.array([], pa.int64())})
        h_ab = hausdorff_directed_sq(x[a], y[a], x[b], y[b])
        h_ba = hausdorff_directed_sq(x[b], y[b], x[a], y[a])
        return pa.table({
            "pair": pa.array([g["pair"][0].as_py()], pa.int64()),
            "h_ab": pa.array([h_ab], pa.int64()),
            "h_ba": pa.array([h_ba], pa.int64()),
            "h_max": pa.array([max(h_ab, h_ba)], pa.int64())})

    return (ds.map_batches(pts, batch_format="pyarrow")
            .groupby("pair").map_groups(group_h, batch_format="pyarrow"))


Q_HAUSDORFF_SQL = """
WITH p AS (
  SELECT user_id // 2 AS pair, user_id % 2 AS side,
    (event_id * 48271 + 7) % 65536 AS x,
    (event_id * 69621 + 3) % 65536 AS y
  FROM events
),
a AS (SELECT pair, x, y FROM p WHERE side = 0),
b AS (SELECT pair, x, y FROM p WHERE side = 1),
dab AS (
  SELECT a.pair, a.x, a.y,
    min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS m
  FROM a JOIN b USING (pair) GROUP BY a.pair, a.x, a.y
),
dba AS (
  SELECT b.pair, b.x, b.y,
    min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS m
  FROM b JOIN a USING (pair) GROUP BY b.pair, b.x, b.y
),
hab AS (SELECT pair, max(m) AS h_ab FROM dab GROUP BY pair),
hba AS (SELECT pair, max(m) AS h_ba FROM dba GROUP BY pair)
SELECT pair, h_ab, h_ba, greatest(h_ab, h_ba) AS h_max
FROM hab JOIN hba USING (pair)
"""


def q_tile_pyramid(sf_dir: str):
    """Tile-pyramid build (the z -> z-1 mipmap step of a slippy
    stack): the planted fixture's 1024 images play a 32x32 tile grid;
    each parent assembles its <= 4 children — decode, exact 2x
    block-mean downsample (multimodal.resize_block_mean), quadrant
    placement, re-encode — after ONE keyed shuffle on the parent key
    (the classic reduce-by-parent pyramid pass; each level quarters
    the data, so the whole stack is a geometric series of this job).
    Constant 32px cells make the downsample exact, so parent pixel
    sums have the closed form sum(child pix_sum) / 4 in the twin."""
    from osmray import codecs, oraclefix
    from osmray.multimodal import resize_block_mean

    images = oraclefix.load_phash()

    def with_parent(batch: pa.Table) -> pa.Table:
        idx = batch["idx"].to_numpy(zero_copy_only=False)
        tx, ty = idx % 32, idx // 32
        return pa.table({
            "pkey": pa.array((ty // 2) * 16 + tx // 2),
            "qx": pa.array(tx % 2), "qy": pa.array(ty % 2),
            "bytes": batch["bytes"], "fmt": batch["fmt"]})

    def build_parent(g: pa.Table) -> pa.Table:
        canvas = np.zeros((256, 256, 3), np.uint8)
        for r in range(g.num_rows):
            img = codecs.decode(g["bytes"][r].as_py(), g["fmt"][r].as_py())
            small = resize_block_mean(img, 128, 128)
            qx = int(g["qx"][r].as_py())
            qy = int(g["qy"][r].as_py())
            canvas[qy * 128:(qy + 1) * 128, qx * 128:(qx + 1) * 128] = small
        blob = codecs.png_encode(canvas, level=1)
        pk = int(g["pkey"][0].as_py())
        return pa.table({
            "ptx": pa.array([pk % 16], pa.int64()),
            "pty": pa.array([pk // 16], pa.int64()),
            "w": pa.array([256], pa.int64()),
            "h": pa.array([256], pa.int64()),
            "n_children": pa.array([g.num_rows], pa.int64()),
            "pix_sum": pa.array(
                [int(codecs.png_decode(blob).astype(np.int64).sum())],
                pa.int64())})

    return (images.map_batches(with_parent, batch_format="pyarrow")
            .groupby("pkey").map_groups(build_parent, batch_format="pyarrow"))


Q_TILE_PYRAMID_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS n1 FROM phbits GROUP BY i)
SELECT (i % 32) // 2 AS ptx, (i // 32) // 2 AS pty,
  256 AS w, 256 AS h, CAST(count(*) AS BIGINT) AS n_children,
  CAST(SUM(3 * 1024 * (160 * n1 + 2560)) // 4 AS BIGINT) AS pix_sum
FROM pc GROUP BY 1, 2
"""


def q_frechet(sf_dir: str):
    """Order-aware trajectory similarity: discrete Frechet distance
    squared (geom.frechet_sq — the coupled-walk DP, exact integers)
    between paired trajectories, each capped to its first 10 points
    by (ts, event_id). ONE keyed shuffle co-locates a pair; the
    O(L^2) DP runs on the capped group and never leaves it. The SQL
    twin unrolls the DP by anti-diagonal: d_k joins the cost
    rectangle's k-th diagonal against d_{k-1} (left/up) and d_{k-2}
    (diagonal) — 2L-1 generated CTEs, missing predecessors
    sentineled high so edges reduce to running maxima."""
    from osmray.geom import frechet_sq

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pts(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tsu = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "pair": pa.array(uid // 2), "side": pa.array(uid % 2),
            "tsu": pa.array(tsu), "eid": pa.array(eid),
            "x": pa.array((eid * 48271 + 7) % 65536),
            "y": pa.array((eid * 69621 + 3) % 65536)})

    def group_f(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        tsu = g["tsu"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        tracks = []
        for s in (0, 1):
            m = np.flatnonzero(side == s)
            order = m[np.lexsort((eid[m], tsu[m]))][:10]
            tracks.append(order)
        a, b = tracks
        if len(a) == 0 or len(b) == 0:
            return pa.table({"pair": pa.array([], pa.int64()),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64()),
                             "frechet_sq": pa.array([], pa.int64())})
        f = frechet_sq(x[a], y[a], x[b], y[b])
        return pa.table({
            "pair": pa.array([g["pair"][0].as_py()], pa.int64()),
            "n_a": pa.array([len(a)], pa.int64()),
            "n_b": pa.array([len(b)], pa.int64()),
            "frechet_sq": pa.array([f], pa.int64())})

    return (ds.map_batches(pts, batch_format="pyarrow")
            .groupby("pair").map_groups(group_f, batch_format="pyarrow"))


def _frechet_sql(cap: int = 10) -> str:
    big = 1 << 62
    dk = []
    for k in range(1, 2 * cap - 1):
        dk.append(f"""
d{k} AS MATERIALIZED (
  SELECT c.pair, c.i, c.j, greatest(c.d, least(
      coalesce(p1.v, {big}), coalesce(p2.v, {big}),
      coalesce(p3.v, {big}))) AS v
  FROM c
  LEFT JOIN d{k - 1} p1 ON p1.pair = c.pair AND p1.i = c.i - 1 AND p1.j = c.j
  LEFT JOIN d{k - 1} p2 ON p2.pair = c.pair AND p2.i = c.i AND p2.j = c.j - 1
  {"LEFT JOIN d" + str(k - 2) + " p3 ON p3.pair = c.pair AND p3.i = c.i - 1 AND p3.j = c.j - 1"
   if k >= 2 else "LEFT JOIN d0 p3 ON FALSE"}
  WHERE c.i + c.j = {k})""")
    union = "\nUNION ALL\n".join(f"SELECT * FROM d{k}"
                                 for k in range(2 * cap - 1))
    return f"""
WITH p AS (
  SELECT user_id // 2 AS pair, user_id % 2 AS side,
    epoch_us(ts) AS tsu, event_id AS eid,
    (event_id * 48271 + 7) % 65536 AS x,
    (event_id * 69621 + 3) % 65536 AS y
  FROM events
),
r AS (SELECT *, row_number() OVER (PARTITION BY pair, side
                                   ORDER BY tsu, eid) - 1 AS s FROM p),
a AS (SELECT pair, s AS i, x, y FROM r WHERE side = 0 AND s < {cap}),
b AS (SELECT pair, s AS j, x, y FROM r WHERE side = 1 AND s < {cap}),
c AS MATERIALIZED (
  SELECT a.pair, a.i, b.j,
    (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d
  FROM a JOIN b USING (pair)
),
d0 AS MATERIALIZED (SELECT pair, i, j, d AS v FROM c WHERE i = 0 AND j = 0),
{",".join(dk)},
alld AS ({union}),
mx AS (SELECT pair, max(i) AS mi, max(j) AS mj FROM c GROUP BY pair)
SELECT alld.pair, mx.mi + 1 AS n_a, mx.mj + 1 AS n_b, alld.v AS frechet_sq
FROM alld JOIN mx ON alld.pair = mx.pair AND alld.i = mx.mi AND alld.j = mx.mj
"""


def q_los(sf_dir: str):
    """Line-of-sight visibility join (the viewshed primitive): each
    sight line DDA-samples its traversal cells (geom.dda_cells,
    per-segment in-batch dedup — a segment's cells never leave the
    batch that generated them), obstacle membership is tagged by the
    grace MARK join (joins.bucketed_filter — keys-only spill, one
    shuffle, no driver set), and one keyed aggregate scores each
    segment: visible = no obstacle cell on the path."""
    from ray.data.aggregate import Count, Sum

    from osmray.geom import dda_cells
    from osmray.joins import bucketed_filter

    ev = _read(sf_dir, "events", ["event_id"])

    def segs(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = eid[eid % 16 == 0]
        ri, cx, cy = dda_cells((eid * 48271 + 7) % 65536,
                               (eid * 69621 + 3) % 65536,
                               (eid * 24693 + 11) % 65536,
                               (eid * 37309 + 5) % 65536, shift=8)
        seg = eid[ri]
        cell = cx * 65536 + cy
        packed = seg * 65536 * 256 + cell  # in-batch per-seg dedup
        _, keep = np.unique(packed, return_index=True)
        return pa.table({"seg": pa.array(seg[keep]),
                         "cell": pa.array(cell[keep])})

    def obstacles(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = (((k * 104723) % 65536) >> 8) * 65536 + (((k * 99989) % 65536) >> 8)
        return pa.table({"cell": pa.array(np.unique(cell))})

    cells = ev.map_batches(segs, batch_format="pyarrow")
    obs = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        obstacles, batch_format="pyarrow")
    marked = bucketed_filter(cells, obs, on="cell", mark="hit")

    def to_int(batch: pa.Table) -> pa.Table:
        hit = batch["hit"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"seg": batch["seg"], "hit": pa.array(hit)})

    return (marked.map_batches(to_int, batch_format="pyarrow")
            .groupby("seg")
            .aggregate(Count(alias_name="n_cells"),
                       Sum("hit", alias_name="n_hits")))


Q_LOS_SQL = """
WITH ev AS (
  SELECT event_id AS eid,
    (event_id * 48271 + 7) % 65536 AS x0, (event_id * 69621 + 3) % 65536 AS y0,
    (event_id * 24693 + 11) % 65536 AS x1, (event_id * 37309 + 5) % 65536 AS y1
  FROM events WHERE event_id % 16 = 0
),
n AS (SELECT *, greatest(abs(x1 - x0), abs(y1 - y0)) // 256 + 1 AS nn FROM ev),
samp AS (
  SELECT eid,
    ((2 * (x0 * nn + (x1 - x0) * t.range) + nn) // (2 * nn)) // 256 * 65536
    + ((2 * (y0 * nn + (y1 - y0) * t.range) + nn) // (2 * nn)) // 256 AS cell
  FROM n, range(0, 258) t WHERE t.range <= nn
),
cells AS (SELECT DISTINCT eid, cell FROM samp),
obs AS (
  SELECT DISTINCT (((p_partkey * 104723) % 65536) // 256) * 65536
                  + (((p_partkey * 99989) % 65536) // 256) AS cell
  FROM part
)
SELECT eid AS seg, CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN obs.cell IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hits
FROM cells LEFT JOIN obs USING (cell)
GROUP BY eid
"""


def q_quadtree(sf_dir: str):
    """Adaptive quadtree refinement — the data-DEPENDENT spatial
    partitioner (the skew answer when a fixed-res grid under/over
    splits): derive res-6 cells from the dyadic point footprint, then
    split every cell holding > 64 points until res 6
    (cells.quadtree_leaves: ONE bounded rollup shuffle of map-side
    pyramid partials + one bounded finish task — the points never
    re-shuffle). Output: occupied leaf cells (res, cx, cy, n). The
    SQL twin unrolls the 7 pyramid levels as grouped counts and
    replays the leaf rule with a parent join."""
    from osmray.cells import quadtree_leaves

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def assign(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        x = p["m1"] >> 20
        y = p["m2"] >> 20
        cell = (np.int64(6) << 58) | (x << 29) | y
        return pa.table({"cell": pa.array(cell)})

    return quadtree_leaves(ds.map_batches(assign, batch_format="pyarrow"),
                           max_res=6, cap=64)


Q_QUADTREE_SQL = """
WITH pts AS (
  SELECT (l_orderkey * 7919 + l_linenumber * 104729) % 67108864 // 1048576 AS x6,
         (l_orderkey * 6151 + l_linenumber * 99991) % 67108864 // 1048576 AS y6
  FROM lineitem
),
counts AS (
  SELECT 6 AS res, x6 AS cx, y6 AS cy, count(*) AS n FROM pts GROUP BY 2, 3
  UNION ALL SELECT 5, x6 // 2, y6 // 2, count(*) FROM pts GROUP BY 2, 3
  UNION ALL SELECT 4, x6 // 4, y6 // 4, count(*) FROM pts GROUP BY 2, 3
  UNION ALL SELECT 3, x6 // 8, y6 // 8, count(*) FROM pts GROUP BY 2, 3
  UNION ALL SELECT 2, x6 // 16, y6 // 16, count(*) FROM pts GROUP BY 2, 3
  UNION ALL SELECT 1, x6 // 32, y6 // 32, count(*) FROM pts GROUP BY 2, 3
  UNION ALL SELECT 0, x6 // 64, y6 // 64, count(*) FROM pts GROUP BY 2, 3
)
SELECT CAST(c.res AS BIGINT) AS res, CAST(c.cx AS BIGINT) AS cx,
       CAST(c.cy AS BIGINT) AS cy, CAST(c.n AS BIGINT) AS n
FROM counts c
LEFT JOIN counts p
  ON p.res = c.res - 1 AND p.cx = c.cx // 2 AND p.cy = c.cy // 2
WHERE (c.res = 0 OR p.n > 64) AND (c.n <= 64 OR c.res = 6)
"""


def _planted_xy(pid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Point cloud with three planted lines (horizontal y=60,
    vertical x=200, diagonal y=x) over an xor-fold-hashed background.
    NOT the affine m1/m2 footprint: an affine derivation puts every
    background point on an LCG lattice whose wrapped lines Hough
    happily detects (measured: 2,600 votes in one (theta, rho) bin at
    t ~ atan(6151/7919)); the xor fold breaks the lattice so only the
    planted structure peaks. Shared by q_hough / q_ransac."""
    a = (pid * 2654435761) % 4294967296
    x = ((a >> 16) ^ (a & 65535)) % 256
    b = (pid * 40503 + 99991) % 4294967296
    y = ((b >> 16) ^ (b & 65535)) % 256
    planted = pid % 5 == 0
    line = (pid // 5) % 3
    y = np.where(planted & (line == 0), 60, y)
    x = np.where(planted & (line == 1), 200, x)
    y = np.where(planted & (line == 2), x, y)
    return x, y


# the same derivation as SQL text (shared CTE prefix for the twins)
_PLANTED_XY_CTES = """
ids AS (SELECT l_orderkey * 10 + l_linenumber AS pid FROM lineitem),
hs AS (
  SELECT pid, (pid * 2654435761) % 4294967296 AS a,
         (pid * 40503 + 99991) % 4294967296 AS b
  FROM ids
),
raw AS (
  SELECT pid, xor(a // 65536, a % 65536) % 256 AS x0,
         xor(b // 65536, b % 65536) % 256 AS y0
  FROM hs
),
pts AS (
  SELECT pid,
         CASE WHEN pid % 5 = 0 AND (pid // 5) % 3 = 1 THEN 200 ELSE x0 END AS x,
         CASE WHEN pid % 5 = 0 AND (pid // 5) % 3 = 0 THEN 60
              WHEN pid % 5 = 0 AND (pid // 5) % 3 = 2 THEN x0
              ELSE y0 END AS y
  FROM raw
)"""


# fixed-point Hough angle table: theta = t*pi/12, cos/sin scaled by
# 4096 and rounded — hardcoded so BOTH engines use identical integers
# (no trig in any SQL-checked value, per the module-header contract)
_HOUGH_COS = (4096, 3956, 3547, 2896, 2048, 1060, 0,
              -1060, -2048, -2896, -3547, -3956)
_HOUGH_SIN = (0, 1060, 2048, 2896, 3547, 3956, 4096,
              3956, 3547, 2896, 2048, 1060)


def q_hough(sf_dir: str):
    """Hough line detection over a point cloud: plant three lines
    (horizontal / vertical / diagonal) into 20% of the dyadic point
    footprint, then vote every point into a quantized (theta, rho)
    accumulator — 12 fixed-point angles, 4-px rho bins, all-integer
    arithmetic — and return the top-10 peaks. Scale shape: map-side
    _keyed_sums partials over the BOUNDED accumulator key space
    (12 x ~128 bins) -> _combine_tree -> one bounded top-k task; the
    points themselves never shuffle. The SQL twin replays the vote
    with the same hardcoded integer trig table as a VALUES list."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def vote(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        x, y = _planted_xy(p["pid"])
        keys = []
        for t in range(12):
            rho = (x * _HOUGH_COS[t] + y * _HOUGH_SIN[t] + 1048576) >> 14
            keys.append(np.int64(t) * 65536 + rho)
        k = np.concatenate(keys)
        return _keyed_sums(k, {}, "hk")

    parts = ds.map_batches(vote, batch_format="pyarrow")
    root = _combine_tree(parts, "hk", [])

    def topk(batch: pa.Table) -> pa.Table:
        hk = batch["hk"].to_numpy(zero_copy_only=False)
        n = batch["cnt"].to_numpy(zero_copy_only=False)
        # deterministic total order: votes desc, then theta, then rho
        order = np.lexsort((hk, -n))[:10]
        return pa.table({
            "t": pa.array((hk[order] // 65536).astype(np.int64)),
            "rho": pa.array((hk[order] % 65536).astype(np.int64)),
            "n": pa.array(n[order].astype(np.int64)),
        })

    return root.map_batches(topk, batch_format="pyarrow", batch_size=None)


def _hough_sql() -> str:
    ang = ", ".join(f"({t}, {_HOUGH_COS[t]}, {_HOUGH_SIN[t]})"
                    for t in range(12))
    return f"""
WITH {_PLANTED_XY_CTES},
ang(t, c, s) AS (VALUES {ang}),
acc AS (
  SELECT t, (x * c + y * s + 1048576) // 16384 AS rho, count(*) AS n
  FROM pts CROSS JOIN ang GROUP BY 1, 2
),
rk AS (SELECT *, row_number() OVER (ORDER BY n DESC, t, rho) AS r FROM acc)
SELECT CAST(t AS BIGINT) AS t, CAST(rho AS BIGINT) AS rho,
       CAST(n AS BIGINT) AS n
FROM rk WHERE r <= 10
"""


def q_ransac(sf_dir: str):
    """Deterministic RANSAC line fit (consensus maximization): seed
    16 anchor points from a fixed stratum (the 16 smallest planted
    pids — the stratum guarantees same-line anchor pairs so the
    consensus step has real structure to find), form all
    non-degenerate anchor pairs as candidate lines, then count each
    model's inliers (squared point-line distance <= 2 px, compared as
    cross-multiplied integers — no division or sqrt anywhere) over
    the full cloud. Top-5 models by (inliers desc, a, b).

    Scale shape: anchor selection is per-block partial min-k then one
    bounded combine (never a full sort); the ~120 models are captured
    in the closure (broadcast once per task); inlier counting is one
    vectorized N x M pass per batch folded by _keyed_sums over the
    BOUNDED model space + _combine_tree. Points never shuffle."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def planted_pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        x, y = _planted_xy(p["pid"])
        keep = p["pid"] % 5 == 0
        return pa.table({"pid": pa.array(p["pid"][keep]),
                         "x": pa.array(x[keep]), "y": pa.array(y[keep])})

    def min16(batch: pa.Table) -> pa.Table:
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        keep = np.argsort(pid, kind="stable")[:16]
        return batch.take(keep)

    anchors = (
        ds.map_batches(planted_pts, batch_format="pyarrow")
        .map_batches(min16, batch_format="pyarrow")
        .repartition(1)
        .map_batches(min16, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    anchors = sorted((int(r["pid"]), int(r["x"]), int(r["y"])) for r in anchors)
    models = []
    for i in range(len(anchors)):
        for j in range(i + 1, len(anchors)):
            (pa_, ax, ay), (pb_, bx, by) = anchors[i], anchors[j]
            if (bx - ax) ** 2 + (by - ay) ** 2 > 0:
                models.append((pa_, pb_, ax, ay, bx, by))
    ma = np.array(models, np.int64)  # (M, 6)

    def count_inliers(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        x, y = _planted_xy(p["pid"])
        dx = (ma[:, 4] - ma[:, 2])[None, :]
        dy = (ma[:, 5] - ma[:, 3])[None, :]
        cross = dx * (y[:, None] - ma[:, 3][None, :]) - \
            dy * (x[:, None] - ma[:, 2][None, :])
        d2 = dx * dx + dy * dy
        inl = (cross * cross <= 4 * d2).sum(axis=0).astype(np.int64)
        # anchors are the 16 smallest planted pids, so pa/pb stay far
        # below the 1e9 packing radix at any scale factor
        mid = ma[:, 0] * 1000000000 + ma[:, 1]
        return _keyed_sums(mid, {"n_inliers": inl}, "mid",
                           cnt=np.ones(len(mid), np.int64))

    parts = ds.map_batches(count_inliers, batch_format="pyarrow")
    root = _combine_tree(parts, "mid", ["n_inliers"])

    def top5(batch: pa.Table) -> pa.Table:
        mid = batch["mid"].to_numpy(zero_copy_only=False)
        n = batch["n_inliers"].to_numpy(zero_copy_only=False)
        order = np.lexsort((mid, -n))[:5]
        return pa.table({
            "a": pa.array((mid[order] // 1000000000).astype(np.int64)),
            "b": pa.array((mid[order] % 1000000000).astype(np.int64)),
            "n_inliers": pa.array(n[order].astype(np.int64)),
        })

    return root.map_batches(top5, batch_format="pyarrow", batch_size=None)


Q_RANSAC_SQL = f"""
WITH {_PLANTED_XY_CTES},
anch AS (SELECT pid, x, y FROM pts WHERE pid % 5 = 0 ORDER BY pid LIMIT 16),
models AS (
  SELECT a.pid AS pa, a.x AS ax, a.y AS ay, b.pid AS pb, b.x AS bx, b.y AS by2
  FROM anch a JOIN anch b ON a.pid < b.pid
  WHERE (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y) > 0
),
cnt AS (
  SELECT m.pa, m.pb, count(*) AS n
  FROM models m CROSS JOIN pts p
  WHERE ((m.bx - m.ax) * (p.y - m.ay) - (m.by2 - m.ay) * (p.x - m.ax))
      * ((m.bx - m.ax) * (p.y - m.ay) - (m.by2 - m.ay) * (p.x - m.ax))
     <= 4 * ((m.bx - m.ax) * (m.bx - m.ax) + (m.by2 - m.ay) * (m.by2 - m.ay))
  GROUP BY m.pa, m.pb
),
rk AS (SELECT *, row_number() OVER (ORDER BY n DESC, pa, pb) AS r FROM cnt)
SELECT CAST(pa AS BIGINT) AS a, CAST(pb AS BIGINT) AS b,
       CAST(n AS BIGINT) AS n_inliers
FROM rk WHERE r <= 5
"""


def q_template_match(sf_dir: str):
    """Sliding-window SAD template matching (the block-matching
    primitive behind motion search / patch retrieval): decode ->
    scan a fixed 64x64 piecewise-constant template at stride-16
    offsets -> best (oy, ox, sad) per image (ties -> smallest oy
    then ox), over a deterministic quarter of the planted-phash
    fixture. Both the image and the template are piecewise constant
    on 32-px cells, so the SQL twin replays every offset's SAD from
    the bit table with integer overlap arithmetic (|imgval - tval| =
    160*|bit - tbit|; the 40-gray base cancels) — the actual pixel
    scan is what is being checked."""
    from osmray import oraclefix
    from osmray.multimodal import TemplateMatchStage

    images = oraclefix.load_phash()

    def keep(batch: pa.Table) -> pa.Table:
        t = batch.select(["image_id", "bytes", "fmt", "idx"])
        idx = t["idx"].to_numpy(zero_copy_only=False)
        return t.take(np.flatnonzero(idx % 4 == 0))

    return images.map_batches(keep, batch_format="pyarrow").map_batches(
        TemplateMatchStage, batch_format="pyarrow", concurrency=4, num_cpus=1)


def _template_match_sql() -> str:
    from osmray.multimodal import TEMPLATE_BITS

    tvals = ", ".join(f"({u}, {v}, {TEMPLATE_BITS[v][u]})"
                      for v in range(2) for u in range(2))
    return f"""
WITH {_PH_CTES},
cells AS (SELECT i, j % 8 AS cb, j // 8 AS rb, bit FROM phbits WHERE i % 4 = 0),
tc(u, v, tbit) AS (VALUES {tvals}),
off AS (SELECT 16 * a.range AS ox, 16 * b.range AS oy
        FROM range(0, 13) a CROSS JOIN range(0, 13) b),
sadt AS (
  SELECT c.i, o.oy, o.ox,
    480 * SUM(abs(c.bit - t.tbit)
      * greatest(least(32*c.cb+32, o.ox+32*t.u+32)
                 - greatest(32*c.cb, o.ox+32*t.u), 0)
      * greatest(least(32*c.rb+32, o.oy+32*t.v+32)
                 - greatest(32*c.rb, o.oy+32*t.v), 0)) AS sad
  FROM cells c CROSS JOIN off o CROSS JOIN tc t
  GROUP BY c.i, o.oy, o.ox
),
rk AS (SELECT *, row_number() OVER (PARTITION BY i ORDER BY sad, oy, ox) AS r
       FROM sadt)
SELECT i AS idx, CAST(oy AS BIGINT) AS oy, CAST(ox AS BIGINT) AS ox,
       CAST(sad AS BIGINT) AS sad
FROM rk WHERE r = 1
"""


def q_mst(sf_dir: str):
    """Minimum spanning forest (graph.boruvka_mst): Boruvka rounds
    under the graph module's two-engine policy, on a 256-node
    multigraph derived from the lineitem stream (xor-fold endpoint
    hashes, weight = pid*7919 % 1000, eid = pid). Weights are totally
    ordered by (w, eid) so the forest is UNIQUE, which lets the SQL
    twin replay KRUSKAL instead — a recursive CTE carrying the
    union-find label state as a LIST column, one edge per step in
    (w, eid) order — and still select the identical edge set. The
    shuffle engine is pinned equal to broadcast (and both to brute
    Kruskal) in pytest on multi-block random graphs."""
    from osmray.graph import boruvka_mst

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def mk(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        # the pid window bounds the demo graph (~180 edges) at every
        # scale factor: the SQL twin replays Kruskal one edge per
        # recursion step at a fixed ~15 ms/step DuckDB overhead, so
        # the edge count must not scale with sf (the ENGINE has no
        # such limit — the pytest pins it on larger random graphs)
        pid = p["pid"][(p["pid"] % 37 == 0) & (p["pid"] < 65536)]
        a = (pid * 2654435761) % 4294967296
        u = ((a >> 16) ^ (a & 65535)) % 256
        b = (pid * 48271 + 12345) % 4294967296
        v = ((b >> 16) ^ (b & 65535)) % 256
        w = (pid * 7919) % 1000
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "w": pa.array(w), "eid": pa.array(pid)})

    return boruvka_mst(ds.map_batches(mk, batch_format="pyarrow"))


# Kruskal replay notes: (1) every base CTE the recursion touches is
# MATERIALIZED and, more importantly, the edge/position lists are
# PACKED INTO the recursion state — a recursive member that re-reads
# an outer CTE (even a materialized one) pays ~0.3 s/iteration in
# DuckDB, vs ~15 ms/iteration for a self-contained working table;
# (2) the union step rewrites every occurrence of the losing root in
# the label list, so labels are always fully-compressed roots.
Q_MST_SQL = """
WITH RECURSIVE ids AS MATERIALIZED (
  SELECT l_orderkey * 10 + l_linenumber AS pid FROM lineitem),
sel AS MATERIALIZED (SELECT pid FROM ids
                     WHERE pid % 37 = 0 AND pid < 65536),
hs AS MATERIALIZED (SELECT pid, (pid * 2654435761) % 4294967296 AS a,
              (pid * 48271 + 12345) % 4294967296 AS b FROM sel),
g0 AS MATERIALIZED (SELECT pid AS eid, xor(a // 65536, a % 65536) % 256 AS u,
              xor(b // 65536, b % 65536) % 256 AS v,
              (pid * 7919) % 1000 AS w FROM hs),
-- DISTINCT: the synthetic lineitem carries duplicate (orderkey,
-- linenumber) rows, i.e. identical duplicate edges; the engine
-- dedups them implicitly through the wkey-keyed chosen set
g AS MATERIALIZED (SELECT DISTINCT * FROM g0 WHERE u <> v),
e AS MATERIALIZED (SELECT *, row_number() OVER (ORDER BY w, eid) AS rn FROM g),
nd AS MATERIALIZED (SELECT DISTINCT n FROM
  (SELECT u AS n FROM g UNION ALL SELECT v FROM g)),
nn AS MATERIALIZED (SELECT n, row_number() OVER (ORDER BY n) AS p FROM nd),
e2 AS MATERIALIZED (SELECT e.rn, e.eid, pu.p AS pu, pv.p AS pv
       FROM e JOIN nn pu ON pu.n = e.u JOIN nn pv ON pv.n = e.v),
packed AS MATERIALIZED (
  SELECT coalesce((SELECT list(pu ORDER BY rn) FROM e2), []) AS pus,
         coalesce((SELECT list(pv ORDER BY rn) FROM e2), []) AS pvs,
         coalesce((SELECT list(eid ORDER BY rn) FROM e2), []) AS eids,
         coalesce((SELECT list(n ORDER BY n) FROM nn), []) AS lab0,
         (SELECT count(*) FROM e2) AS n
),
kr AS (
  SELECT 0 AS step, pus, pvs, eids, lab0 AS lab,
         CAST([] AS BIGINT[]) AS chosen, n
  FROM packed
  UNION ALL
  SELECT step + 1, pus, pvs, eids,
    CASE WHEN lab[pus[step + 1]] <> lab[pvs[step + 1]] THEN
      list_transform(lab, x ->
        CASE WHEN x = greatest(lab[pus[step + 1]], lab[pvs[step + 1]])
        THEN least(lab[pus[step + 1]], lab[pvs[step + 1]]) ELSE x END)
    ELSE lab END,
    CASE WHEN lab[pus[step + 1]] <> lab[pvs[step + 1]]
    THEN list_append(chosen, eids[step + 1]) ELSE chosen END,
    n
  FROM kr WHERE step < n
),
fin AS (SELECT chosen FROM kr ORDER BY step DESC LIMIT 1),
ch AS (SELECT unnest(chosen) AS eid FROM fin)
SELECT g.eid, CAST(g.u AS BIGINT) AS u, CAST(g.v AS BIGINT) AS v,
       CAST(g.w AS BIGINT) AS w
FROM g JOIN ch USING (eid)
"""


def q_seam(sf_dir: str):
    """Seam carving (content-aware resize primitive): decode ->
    coarse grid -> replicate-border gradient energy -> vertical-seam
    DP with three-predecessor minima -> backtrack with ties toward
    the smaller column (multimodal.SeamStage). Emits seam cost and
    the path packed as sum(col_r * 8^r). The SQL twin unrolls the 8
    DP rows as grouped-min CTEs and the backtrack as 8 QUALIFY
    argmin picks over the planted bit grid."""
    from osmray import oraclefix
    from osmray.multimodal import SeamStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        SeamStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


def _seam_sql() -> str:
    dps = []
    for r in range(1, 8):
        dps.append(
            f"dp{r} AS (SELECT e.i, e.cb, e.e + min(p.dp) AS dp FROM en e "
            f"JOIN dp{r-1} p ON p.i = e.i AND abs(p.cb - e.cb) <= 1 "
            f"WHERE e.rb = {r} GROUP BY e.i, e.cb, e.e)")
    bts = ["b7 AS (SELECT i, cb AS c, dp FROM dp7 "
           "QUALIFY row_number() OVER (PARTITION BY i ORDER BY dp, cb) = 1)"]
    for r in range(6, -1, -1):
        bts.append(
            f"b{r} AS (SELECT d.i, d.cb AS c FROM dp{r} d "
            f"JOIN b{r+1} b ON b.i = d.i AND abs(d.cb - b.c) <= 1 "
            f"QUALIFY row_number() OVER (PARTITION BY d.i ORDER BY d.dp, d.cb) = 1)")
    path = " + ".join(f"{8 ** r} * b{r}.c" for r in range(8))
    joins = " ".join(f"JOIN b{r} ON b{r}.i = b7.i" for r in range(7))
    return f"""
WITH {_PH_CTES},
gr AS (SELECT i, j // 8 AS rb, j % 8 AS cb, 40 + 160 * bit AS val FROM phbits),
en AS (
  SELECT g.i, g.rb, g.cb,
    abs(xp.val - xm.val) + abs(yp.val - ym.val) AS e
  FROM gr g
  JOIN gr xp ON xp.i = g.i AND xp.rb = g.rb AND xp.cb = least(g.cb + 1, 7)
  JOIN gr xm ON xm.i = g.i AND xm.rb = g.rb AND xm.cb = greatest(g.cb - 1, 0)
  JOIN gr yp ON yp.i = g.i AND yp.cb = g.cb AND yp.rb = least(g.rb + 1, 7)
  JOIN gr ym ON ym.i = g.i AND ym.cb = g.cb AND ym.rb = greatest(g.rb - 1, 0)
),
dp0 AS (SELECT i, cb, e AS dp FROM en WHERE rb = 0),
{", ".join(dps)},
{", ".join(bts)}
SELECT b7.i AS idx, CAST(b7.dp AS BIGINT) AS seam_cost,
       CAST({path} AS BIGINT) AS seam_path
FROM b7 {joins}
"""


_VIT_ROADS = (40, 100, 160, 220)
_VIT_SWITCH = 25
_VIT_MOD = 1 << 40


def q_viterbi(sf_dir: str):
    """HMM map-matching decode (the Viterbi step real map-matchers
    run after the candidate snap): per user, observations are the
    ts-ordered hashed waypoint stream; states are 4 fixed roads;
    emission cost |y - road|, switch penalty 25; ties break toward
    the smaller predecessor state. Emits per user the min total cost,
    the final matched road, and a base-31 rolling hash of the WHOLE
    decoded path (each state carries its best-predecessor path hash,
    so the argmin chain is verified end-to-end without emitting T
    rows). One keyed shuffle (groupby user), vectorized 4-state DP
    inside the group. The SQL twin runs the same DP as a recursive
    CTE with one row per user carrying (d0..d3, h0..h3) and the
    packed observation list."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    R = np.array(_VIT_ROADS, np.int64)
    P = _VIT_SWITCH
    ks = np.arange(4)
    trans = P * (1 - np.eye(4, dtype=np.int64))

    def decode(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        y = (ii[order] * 69621 + 3) % 256
        d = np.abs(y[0] - R)
        h = ks.astype(np.int64).copy()
        for t in range(1, len(y)):
            cand = d[:, None] + trans  # (from j, to k)
            jmin = np.argmin(cand, axis=0)  # first min = smallest j
            d = np.abs(y[t] - R) + cand[jmin, ks]
            h = (h[jmin] * 31 + ks) % _VIT_MOD
        k = int(np.argmin(d))
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_obs": pa.array([len(y)], pa.int64()),
            "viterbi_cost": pa.array([int(d[k])], pa.int64()),
            "final_road": pa.array([k], pa.int64()),
            "path_hash": pa.array([int(h[k])], pa.int64())})

    return ds.groupby("user_id").map_groups(decode, batch_format="pyarrow")


def _viterbi_sql() -> str:
    R, P, MOD = _VIT_ROADS, _VIT_SWITCH, _VIT_MOD

    def cost(j, k, ds="d"):
        pen = 0 if j == k else P
        return f"{ds}{j} + {pen}" if pen else f"{ds}{j}"

    d_new, h_new = [], []
    for k in range(4):
        d_new.append(
            f"abs(ys[t + 1] - {R[k]}) + least({', '.join(cost(j, k) for j in range(4))}) AS d{k}")
        # argmin chain in j order: <= against the least of the rest
        # picks the SMALLEST j on ties
        chain = []
        for j in range(3):
            rest = ", ".join(cost(jj, k) for jj in range(j + 1, 4))
            chain.append(f"WHEN {cost(j, k)} <= least({rest}) "
                         f"THEN (h{j} * 31 + {k}) % {MOD}")
        h_new.append("CASE " + " ".join(chain) +
                     f" ELSE (h3 * 31 + {k}) % {MOD} END AS h{k}")
    anchor_d = ", ".join(f"CAST(abs(ys[1] - {R[k]}) AS BIGINT) AS d{k}"
                         for k in range(4))
    anchor_h = ", ".join(f"CAST({k} AS BIGINT) AS h{k}" for k in range(4))
    fin_chain_road, fin_chain_hash = [], []
    for k in range(3):
        rest = ", ".join(f"d{j}" for j in range(k + 1, 4))
        fin_chain_road.append(f"WHEN d{k} <= least({rest}) THEN {k}")
        fin_chain_hash.append(f"WHEN d{k} <= least({rest}) THEN h{k}")
    return f"""
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, ts, event_id, (event_id * 69621 + 3) % 256 AS y
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(y ORDER BY ts, event_id) AS ys,
         count(*) AS n
  FROM p GROUP BY user_id
),
vt AS (
  SELECT user_id, ys, n, 1 AS t, {anchor_d}, {anchor_h}
  FROM ob
  UNION ALL
  SELECT user_id, ys, n, t + 1,
    {", ".join(d_new)},
    {", ".join(h_new)}
  FROM vt WHERE t < n
),
fin AS (SELECT * FROM vt WHERE t = n)
SELECT user_id, CAST(n AS BIGINT) AS n_obs,
  CAST(least(d0, d1, d2, d3) AS BIGINT) AS viterbi_cost,
  CAST(CASE {" ".join(fin_chain_road)} ELSE 3 END AS BIGINT) AS final_road,
  CAST(CASE {" ".join(fin_chain_hash)} ELSE h3 END AS BIGINT) AS path_hash
FROM fin
"""


def q_moving_median(sf_dir: str):
    """Moving MEDIAN (robust rolling statistic, the outlier-immune
    twin of the existing running sums): per user, the exact median of
    the trailing 5-row window over the ts-ordered value stream,
    emitted as 2*median so even-width head windows (median = mean of
    the two middle values) stay integral. One keyed shuffle; full
    windows are one vectorized sort over a sliding-window view, the
    <=4-row heads a tiny per-group loop. The twin is DuckDB's native
    windowed median over the same frame."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def roll(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        eid = ii[order]
        v = (eid * 40503) % 1000
        n = len(v)
        m2 = np.empty(n, np.int64)
        for t in range(min(4, n)):
            s = np.sort(v[:t + 1])
            m2[t] = 2 * s[t // 2] if (t + 1) % 2 else s[t // 2] + s[t // 2 + 1]
        if n >= 5:
            win = np.lib.stride_tricks.sliding_window_view(v, 5)
            m2[4:] = 2 * np.sort(win, axis=1)[:, 2]
        return pa.table({
            "user_id": pa.array(np.full(n, g["user_id"][0].as_py(), np.int64)),
            "event_id": pa.array(eid),
            "m2": pa.array(m2)})

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


Q_MOVING_MEDIAN_SQL = """
WITH p AS (SELECT user_id, event_id, ts, (event_id * 40503) % 1000 AS v
           FROM events)
SELECT user_id, event_id,
  CAST(2 * median(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS m2
FROM p
"""


def q_matmul(sf_dir: str):
    """Blocked distributed matrix multiply — the canonical dataflow
    GEMM: A (96x96) and B (96x96) live as Datasets of 32x32 BLOCKS
    (list<int64> payloads), the k-dimension pairs via a grace join on
    the block-k key, each pair runs one vectorized np.dot, and the
    partial products fold with a keyed groupby on the packed (bi,bj)
    output-block key before unpacking to (i, j, v) cells. At any
    matrix size the same plan shuffles only fixed-size block partials
    (O(blocks^3) of them), never scalar cells. The SQL twin is the
    scalar 3-way join + grouped sum over the same closed-form
    entries."""
    import ray.data

    from osmray.joins import bucketed_join

    nb, bs = 3, 32

    def a_blocks(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch["id"].to_pylist():
            bi, bk = divmod(int(r), nb)
            i = bi * bs + np.arange(bs)[:, None]
            k = bk * bs + np.arange(bs)[None, :]
            blk = (i * 7919 + k * 104729 + 13) % 97
            rows.append({"bi": bi, "bk": bk,
                         "a": blk.astype(np.int64).ravel().tolist()})
        return pa.Table.from_pylist(rows)

    def b_blocks(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch["id"].to_pylist():
            bk, bj = divmod(int(r), nb)
            k = bk * bs + np.arange(bs)[:, None]
            j = bj * bs + np.arange(bs)[None, :]
            blk = (k * 6151 + j * 99991 + 7) % 89
            rows.append({"bk2": bk, "bj": bj,
                         "b": blk.astype(np.int64).ravel().tolist()})
        return pa.Table.from_pylist(rows)

    ads = ray.data.range(nb * nb).map_batches(a_blocks, batch_format="pyarrow")
    bds = ray.data.range(nb * nb).map_batches(b_blocks, batch_format="pyarrow")
    pairs = bucketed_join(ads, bds, on="bk", right_on="bk2", num_buckets=4)

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for r in batch.to_pylist():
            av = np.array(r["a"], np.int64).reshape(bs, bs)
            bv = np.array(r["b"], np.int64).reshape(bs, bs)
            rows.append({"cell": r["bi"] * nb + r["bj"],
                         "p": (av @ bv).ravel().tolist()})
        return pa.Table.from_pylist(rows)

    def fold(g: pa.Table) -> pa.Table:
        cell = int(g["cell"][0].as_py())
        acc = np.zeros(bs * bs, np.int64)
        for p in g["p"].to_pylist():
            acc += np.array(p, np.int64)
        bi, bj = divmod(cell, nb)
        blk = acc.reshape(bs, bs)
        i = bi * bs + np.arange(bs)[:, None] + np.zeros((1, bs), np.int64)
        j = bj * bs + np.arange(bs)[None, :] + np.zeros((bs, 1), np.int64)
        return pa.table({"i": pa.array(i.ravel()), "j": pa.array(j.ravel()),
                         "v": pa.array(blk.ravel())})

    return (pairs.map_batches(partial, batch_format="pyarrow")
            .groupby("cell").map_groups(fold, batch_format="pyarrow"))


Q_MATMUL_SQL = """
WITH ii AS (SELECT range AS i FROM range(0, 96)),
kk AS (SELECT range AS k FROM range(0, 96)),
jj AS (SELECT range AS j FROM range(0, 96)),
a AS (SELECT i, k, (i * 7919 + k * 104729 + 13) % 97 AS av
      FROM ii CROSS JOIN kk),
b AS (SELECT k, j, (k * 6151 + j * 99991 + 7) % 89 AS bv
      FROM kk CROSS JOIN jj)
SELECT a.i, b.j, CAST(SUM(av * bv) AS BIGINT) AS v
FROM a JOIN b USING (k) GROUP BY a.i, b.j
"""


def q_glcm(sf_dir: str):
    """Gray-level co-occurrence texture features (Haralick's GLCM):
    per image, the 2x2 co-occurrence counts of (level, right-neighbor
    level) over the coarse grid plus the derived contrast count —
    the classic texture descriptor, all integer. Emits one row per
    image: (idx, n00, n01, n10, n11, contrast)."""
    from osmray import oraclefix
    from osmray.multimodal import resize_block_mean

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    from osmray import codecs

    def glcm(batch: pa.Table) -> pa.Table:
        out = {"idx": [], "n00": [], "n01": [], "n10": [], "n11": [],
               "contrast": []}
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            g = (resize_block_mean(img, 8, 8)[:, :, 0] >= 128).astype(np.int64)
            a, b = g[:, :-1], g[:, 1:]
            out["idx"].append(idx)
            out["n00"].append(int(((a == 0) & (b == 0)).sum()))
            out["n01"].append(int(((a == 0) & (b == 1)).sum()))
            out["n10"].append(int(((a == 1) & (b == 0)).sum()))
            out["n11"].append(int(((a == 1) & (b == 1)).sum()))
            out["contrast"].append(int((a != b).sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        glcm, batch_format="pyarrow")


Q_GLCM_SQL = f"""
WITH {_PH_CTES},
gr AS (SELECT i, j // 8 AS rb, j % 8 AS cb, bit FROM phbits),
pr AS (
  SELECT a.i, a.bit AS ab, b.bit AS bb
  FROM gr a JOIN gr b ON b.i = a.i AND b.rb = a.rb AND b.cb = a.cb + 1
)
SELECT i AS idx,
  CAST(SUM(CASE WHEN ab = 0 AND bb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
  CAST(SUM(CASE WHEN ab = 0 AND bb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
  CAST(SUM(CASE WHEN ab = 1 AND bb = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
  CAST(SUM(CASE WHEN ab = 1 AND bb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
  CAST(SUM(CASE WHEN ab <> bb THEN 1 ELSE 0 END) AS BIGINT) AS contrast
FROM pr GROUP BY i
"""


def q_corners(sf_dir: str):
    """Harris corner response (the classic keypoint detector), exact
    in integers: replicate-border central gradients on the coarse
    grid, 3x3 structure-tensor sums, response R16 = 16*(Sxx*Syy -
    Sxy^2) - (Sxx+Syy)^2 (k = 1/16 cleared of the denominator), top-3
    cells per image by (R16 desc, r, c). The SQL twin replays
    gradients and window sums with neighbor joins."""
    from osmray import codecs, oraclefix
    from osmray.multimodal import resize_block_mean

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    def corners(batch: pa.Table) -> pa.Table:
        out = {"idx": [], "rank": [], "r": [], "c": [], "r16": []}
        cp = np.clip(np.arange(8) + 1, 0, 7)
        cm = np.clip(np.arange(8) - 1, 0, 7)
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            g = resize_block_mean(img, 8, 8)[:, :, 0].astype(np.int64)
            ix = g[:, cp] - g[:, cm]
            iy = g[cp, :] - g[cm, :]
            xx, yy, xy = ix * ix, iy * iy, ix * iy

            def wsum(m):
                p = np.zeros((10, 10), np.int64)
                p[1:9, 1:9] = m
                ii = np.zeros((11, 11), np.int64)
                ii[1:, 1:] = p.cumsum(0).cumsum(1)
                return (ii[3:11, 3:11] - ii[0:8, 3:11]
                        - ii[3:11, 0:8] + ii[0:8, 0:8])

            sxx, syy, sxy = wsum(xx), wsum(yy), wsum(xy)
            r16 = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
            flat = r16.ravel()
            rr, cc = np.divmod(np.arange(64), 8)
            order = np.lexsort((cc, rr, -flat))[:3]
            for rank, o in enumerate(order):
                out["idx"].append(idx)
                out["rank"].append(rank)
                out["r"].append(int(rr[o]))
                out["c"].append(int(cc[o]))
                out["r16"].append(int(flat[o]))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        corners, batch_format="pyarrow")


Q_CORNERS_SQL = f"""
WITH {_PH_CTES},
gr AS (SELECT i, j // 8 AS rb, j % 8 AS cb, 40 + 160 * bit AS val FROM phbits),
gd AS (
  SELECT g.i, g.rb, g.cb, xp.val - xm.val AS ix, yp.val - ym.val AS iy
  FROM gr g
  JOIN gr xp ON xp.i = g.i AND xp.rb = g.rb AND xp.cb = least(g.cb + 1, 7)
  JOIN gr xm ON xm.i = g.i AND xm.rb = g.rb AND xm.cb = greatest(g.cb - 1, 0)
  JOIN gr yp ON yp.i = g.i AND yp.cb = g.cb AND yp.rb = least(g.rb + 1, 7)
  JOIN gr ym ON ym.i = g.i AND ym.cb = g.cb AND ym.rb = greatest(g.rb - 1, 0)
),
st AS (
  SELECT a.i, a.rb, a.cb,
    SUM(n.ix * n.ix) AS sxx, SUM(n.iy * n.iy) AS syy,
    SUM(n.ix * n.iy) AS sxy
  FROM gd a JOIN gd n ON n.i = a.i
    AND abs(n.rb - a.rb) <= 1 AND abs(n.cb - a.cb) <= 1
  GROUP BY a.i, a.rb, a.cb
),
resp AS (
  SELECT i, rb, cb,
    16 * (sxx * syy - sxy * sxy) - (sxx + syy) * (sxx + syy) AS r16
  FROM st
),
rk AS (SELECT *, row_number() OVER (PARTITION BY i ORDER BY r16 DESC, rb, cb)
              AS rr FROM resp)
SELECT i AS idx, CAST(rr - 1 AS BIGINT) AS rank, CAST(rb AS BIGINT) AS r,
       CAST(cb AS BIGINT) AS c, CAST(r16 AS BIGINT) AS r16
FROM rk WHERE rr <= 3
"""


def q_warp(sf_dir: str):
    """Affine rotation warp (multimodal.WarpStage): full-image
    inverse-mapped nearest-neighbor rotation (~15 degrees, fixed-point
    3956/1060 over 4096) about the center, out-of-bounds -> 0;
    verified through a position-weighted checksum over a 16x16 sample
    lattice of the WARPED image plus the lattice OOB count. The SQL
    twin inverse-maps each lattice point analytically onto the
    planted bit grid; numerators carry a +2^22 bias because DuckDB's
    // truncates toward zero while numpy floors."""
    from osmray import oraclefix
    from osmray.multimodal import WarpStage

    images = oraclefix.load_phash()

    def keep_idx(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep_idx, batch_format="pyarrow").map_batches(
        WarpStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


Q_WARP_SQL = f"""
WITH {_PH_CTES},
ss AS (SELECT a.range AS sa, b.range AS sb,
              8 + 16 * b.range AS tx, 8 + 16 * a.range AS ty
       FROM range(0, 16) a CROSS JOIN range(0, 16) b),
m AS (SELECT sa, sb,
        ((tx - 128) * 3956 + (ty - 128) * 1060 + 4194304) // 4096 - 896 AS xs,
        ((ty - 128) * 3956 - (tx - 128) * 1060 + 4194304) // 4096 - 896 AS ys
      FROM ss),
mm AS (SELECT sa, sb, xs, ys,
              (xs BETWEEN 0 AND 255) AND (ys BETWEEN 0 AND 255) AS inb
       FROM m),
vals AS (
  SELECT ii.range AS i, mm.sb + 16 * mm.sa + 1 AS w,
         CASE WHEN mm.inb THEN 40 + 160 * pb.bit ELSE 0 END AS val,
         CASE WHEN mm.inb THEN 0 ELSE 1 END AS oob
  FROM mm CROSS JOIN range(0, 1024) ii
  LEFT JOIN phbits pb ON pb.i = ii.range
    AND pb.j = (mm.ys // 32) * 8 + (mm.xs // 32) AND mm.inb
)
SELECT i AS idx, CAST(SUM(val * w) AS BIGINT) AS warp_sum,
       CAST(SUM(oob) AS BIGINT) AS n_oob
FROM vals GROUP BY i
"""


def q_onion(sf_dir: str):
    """Convex LAYERS (onion peeling — the depth-ordering primitive
    behind robust location estimates): per brand group, the strict
    hull vertices are layer 1, the hull of the remainder layer 2,
    then layer 3. Strictly-between collinear points survive to the
    next layer (strict-hull semantics, same as q_convex_hull);
    2-point remainders are their own layer. The SQL twin applies the
    extreme-edge characterization three times with anti-join
    peeling between layers."""
    from osmray.geom import monotone_chain_hull

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand"])
    m = max(1, ds.count() // 2500)

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = k % m == 0
        k = k[sel]
        return pa.table({
            "brand": batch["p_brand"].filter(pa.array(sel)),
            "x": pa.array((k * 7919 + 11) % 1048573),
            "y": pa.array((k * 6151 + 29) % 1048573)})

    def layers(g: pa.Table) -> pa.Table:
        xy = np.unique(np.stack([
            g["x"].to_numpy(zero_copy_only=False),
            g["y"].to_numpy(zero_copy_only=False)], axis=1), axis=0)
        brand = g["brand"][0].as_py()
        out = {"brand": [], "layer": [], "x": [], "y": []}
        rem = xy
        for lay in (1, 2, 3):
            if len(rem) < 2:
                break
            if len(rem) == 2:
                verts = rem
            else:
                ring = monotone_chain_hull(rem[:, 0], rem[:, 1])
                verts = np.unique(ring, axis=0)
            for vx, vy in verts:
                out["brand"].append(brand)
                out["layer"].append(lay)
                out["x"].append(int(vx))
                out["y"].append(int(vy))
            vk = verts[:, 0] * 2097152 + verts[:, 1]
            rk = rem[:, 0] * 2097152 + rem[:, 1]
            rem = rem[~np.isin(rk, vk)]
        return pa.table({
            "brand": pa.array(out["brand"], pa.string()),
            "layer": pa.array(out["layer"], pa.int64()),
            "x": pa.array(out["x"], pa.int64()),
            "y": pa.array(out["y"], pa.int64())})

    return (ds.map_batches(pts, batch_format="pyarrow")
            .groupby("brand").map_groups(layers, batch_format="pyarrow"))


def _onion_sql() -> str:
    def layer(src, L):
        return f"""
e{L} AS (
  SELECT a.g, a.x AS ax, a.y AS ay
  FROM {src} a
  JOIN {src} b ON b.g = a.g AND (b.x <> a.x OR b.y <> a.y)
  JOIN {src} c ON c.g = a.g
  GROUP BY a.g, a.x, a.y, b.x, b.y
  HAVING min(CASE
    WHEN (c.x = a.x AND c.y = a.y) OR (c.x = b.x AND c.y = b.y) THEN 1
    WHEN (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) > 0 THEN 1
    WHEN (b.x-a.x)*(c.y-a.y) - (b.y-a.y)*(c.x-a.x) = 0
         AND (c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y) > 0
         AND (c.x-a.x)*(b.x-a.x) + (c.y-a.y)*(b.y-a.y) <
             (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y) THEN 1
    ELSE 0 END) = 1
),
v{L} AS (SELECT DISTINCT g, ax AS x, ay AS y FROM e{L}),
p{L} AS (SELECT p.* FROM {src} p LEFT JOIN v{L}
         ON v{L}.g = p.g AND v{L}.x = p.x AND v{L}.y = p.y
         WHERE v{L}.x IS NULL)"""

    return f"""
WITH p0 AS (
  SELECT DISTINCT p_brand AS g,
         (p_partkey * 7919 + 11) % 1048573 AS x,
         (p_partkey * 6151 + 29) % 1048573 AS y
  FROM part
  WHERE p_partkey % (SELECT greatest(1, count(*) // 2500) FROM part) = 0
),
{layer('p0', 1)},
{layer('p1', 2)},
{layer('p2', 3)}
SELECT g AS brand, CAST(1 AS BIGINT) AS layer, x, y FROM v1
UNION ALL SELECT g, 2, x, y FROM v2
UNION ALL SELECT g, 3, x, y FROM v3
"""


def q_critical_path(sf_dir: str):
    """Critical-path scheduling (graph.dag_longest_path): a 120-task
    precedence DAG (edges u < v by construction, so acyclic) with
    per-task durations; lp(v) = dur(v) + max over predecessors.
    Broadcast max-plus rounds, exact fixpoint. The SQL twin
    propagates (task, partial lp) states recursively — state count is
    bounded by tasks x the lp value range, which the small duration
    alphabet keeps tractable — and takes max(lp) per task."""
    from osmray.graph import dag_longest_path

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    N = 120
    dur = (np.arange(N, dtype=np.int64) * 7919) % 16 + 1

    def mk(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        pid = p["pid"][p["pid"] % 101 == 0]
        a = (pid * 2654435761) % 4294967296
        u = ((a >> 16) ^ (a & 65535)) % N
        b = (pid * 48271 + 99) % 4294967296
        v = ((b >> 16) ^ (b & 65535)) % N
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return pa.table({"u": pa.array(lo[keep]), "v": pa.array(hi[keep])})

    return dag_longest_path(ds.map_batches(mk, batch_format="pyarrow"),
                            dur, max_rounds=N + 2)


Q_CRITICAL_PATH_SQL = """
WITH RECURSIVE ids AS MATERIALIZED (
  SELECT l_orderkey * 10 + l_linenumber AS pid FROM lineitem),
sel AS MATERIALIZED (SELECT pid FROM ids WHERE pid % 101 = 0),
hs AS MATERIALIZED (SELECT pid, (pid * 2654435761) % 4294967296 AS a,
              (pid * 48271 + 99) % 4294967296 AS b FROM sel),
g0 AS MATERIALIZED (SELECT xor(a // 65536, a % 65536) % 120 AS u0,
              xor(b // 65536, b % 65536) % 120 AS v0 FROM hs),
e AS MATERIALIZED (SELECT DISTINCT least(u0, v0) AS u, greatest(u0, v0) AS v
                   FROM g0 WHERE u0 <> v0),
tasks AS MATERIALIZED (SELECT range AS task, (range * 7919) % 16 + 1 AS d
                       FROM range(0, 120)),
lp AS (
  SELECT task, d AS lp FROM tasks
  UNION
  SELECT e.v, lp.lp + t.d
  FROM lp JOIN e ON e.u = lp.task JOIN tasks t ON t.task = e.v
)
SELECT task, CAST(max(lp) AS BIGINT) AS lp FROM lp GROUP BY task
"""


def q_skew_join(sf_dir: str):
    """Skew-aware join (joins.skew_join) on a deliberately zipfian
    key set — HALF of all fact rows share key 7: frequencies are
    counted keys-only, hot keys' dimension rows broadcast and join
    in-task while the fact side streams (the hot key never enters a
    shuffle), the cold tail takes the grace join. Verified through
    the joined aggregate (count + sum of value products per key) so
    multiplicities are hash-checked."""
    from ray.data.aggregate import Count, Sum

    from osmray.joins import skew_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def fact(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        pid = p["pid"]
        k = np.where(pid % 2 == 0, 7, pid % 500)
        return pa.table({"k": pa.array(k.astype(np.int64)),
                         "lv": pa.array((pid % 100).astype(np.int64))})

    pt = _read(sf_dir, "part", ["p_partkey"])

    def dim(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = pk[pk < 500]
        return pa.table({"dk": pa.array(pk),
                         "rv": pa.array((pk * 3) % 97)})

    joined = skew_join(li.map_batches(fact, batch_format="pyarrow"),
                       pt.map_batches(dim, batch_format="pyarrow"),
                       on="k", right_on="dk", hot_threshold=1000)

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False)
        lv = batch["lv"].to_numpy(zero_copy_only=False)
        rv = batch["rv"].to_numpy(zero_copy_only=False)
        return _keyed_sums(k, {"s": lv * rv}, "k")

    agg = joined.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum as _S

    return (agg.groupby("k")
            .aggregate(_S("cnt", alias_name="n"), _S("s", alias_name="s")))


Q_SKEW_JOIN_SQL = """
WITH fact AS (
  SELECT CASE WHEN (l_orderkey * 10 + l_linenumber) % 2 = 0 THEN 7
         ELSE (l_orderkey * 10 + l_linenumber) % 500 END AS k,
         (l_orderkey * 10 + l_linenumber) % 100 AS lv
  FROM lineitem
),
dim AS (SELECT p_partkey AS dk, (p_partkey * 3) % 97 AS rv
        FROM part WHERE p_partkey < 500)
SELECT k, CAST(count(*) AS BIGINT) AS n, CAST(SUM(lv * rv) AS BIGINT) AS s
FROM fact JOIN dim ON dim.dk = fact.k
GROUP BY k
"""


def q_max_subarray(sf_dir: str):
    """Maximum-sum contiguous subarray per user (Kadane over the
    ts-ordered signed value stream — the burst-detection primitive):
    emitted via the prefix-sum identity max_subarray = max over t of
    (prefix(t) - min prefix before t), so the SQL twin is pure window
    functions (no recursion). Engine: one keyed shuffle, vectorized
    cumsum + running-min per group; also emits the subarray's end
    position (first maximum, ties to the earliest end)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def kad(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        v = ((ii[order] * 40503) % 201) - 100  # signed in [-100, 100]
        pref = np.cumsum(v)
        prev_min = np.minimum.accumulate(np.concatenate(([0], pref[:-1])))
        best_at = pref - prev_min
        end = int(np.argmax(best_at))  # first max = earliest end
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "best_sum": pa.array([int(best_at[end])], pa.int64()),
            "end_pos": pa.array([end + 1], pa.int64())})

    return ds.groupby("user_id").map_groups(kad, batch_format="pyarrow")


Q_MAX_SUBARRAY_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id, (event_id * 40503) % 201 - 100 AS v
  FROM events
),
pf0 AS (
  SELECT user_id, ts, event_id,
         sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pref,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM p
),
pf AS (
  SELECT user_id, rn, pref,
         coalesce(min(pref) OVER (PARTITION BY user_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_min
  FROM pf0
),
sc AS (SELECT user_id, rn, pref - least(prev_min, 0) AS cand FROM pf),
rk AS (SELECT user_id, cand, rn,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY cand DESC, rn) AS r
       FROM sc)
SELECT user_id, CAST(cand AS BIGINT) AS best_sum, CAST(rn AS BIGINT) AS end_pos
FROM rk WHERE r = 1
"""


def q_routes(sf_dir: str):
    """Greedy nearest-neighbor route construction (the VRP seed
    heuristic): per vehicle (user), start at the lowest-id stop and
    repeatedly drive to the nearest unvisited stop — squared integer
    distances, ties to the smaller stop position. Emits per vehicle
    the stop count, the tour's total SQUARED step length (exact in
    integers; distance comparisons are order-isomorphic to squared
    ones), and a base-31 hash of the visiting order, so the entire
    greedy sequence is verified. One keyed shuffle; O(n^2) vectorized
    scan inside each group. The SQL twin replays the greedy walk as a
    per-user recursion over (visited, cur, total, hash) with the
    coordinate lists packed into the state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])
    BIG = 2097152
    MOD = 1 << 40

    def tour(g: pa.Table) -> pa.Table:
        ii = np.sort(g["event_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        x = (ii * 48271 + 7) % 1024
        y = (ii * 69621 + 3) % 1024
        n = len(ii)
        visited = np.zeros(n, bool)
        visited[0] = True
        cur, total, h = 0, 0, 1
        for _ in range(n - 1):
            d = (x - x[cur]) ** 2 + (y - y[cur]) ** 2
            key = d * BIG + np.arange(1, n + 1)
            key[visited] = np.iinfo(np.int64).max
            pick = int(np.argmin(key))
            total += int(d[pick])
            h = (h * 31 + (pick + 1)) % MOD
            visited[pick] = True
            cur = pick
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_stops": pa.array([n], pa.int64()),
            "tour_sq": pa.array([total], pa.int64()),
            "tour_hash": pa.array([h], pa.int64())})

    return ds.groupby("user_id").map_groups(tour, batch_format="pyarrow")


Q_ROUTES_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, event_id, (event_id * 48271 + 7) % 1024 AS x,
         (event_id * 69621 + 3) % 1024 AS y
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(x ORDER BY event_id) AS xs,
         list(y ORDER BY event_id) AS ys, count(*) AS n
  FROM p GROUP BY user_id
),
tr AS (
  SELECT user_id, xs, ys, n, 1 AS step,
         list_transform(range(1, CAST(n AS INTEGER) + 1), i -> i = 1)
           AS visited,
         1 AS cur, CAST(0 AS BIGINT) AS total, CAST(1 AS BIGINT) AS h
  FROM ob
  UNION ALL
  SELECT user_id, xs, ys, n, step + 1,
    list_transform(range(1, CAST(n AS INTEGER) + 1),
                   i -> visited[i] OR i = CAST(pick AS INTEGER)),
    CAST(pick AS INTEGER),
    total + dmin,
    (h * 31 + pick) % 1099511627776
  FROM (
    SELECT *,
      list_min(list_transform(range(1, CAST(n AS INTEGER) + 1), i ->
        CASE WHEN visited[i] THEN NULL
        ELSE ((xs[i] - xs[cur]) * (xs[i] - xs[cur])
              + (ys[i] - ys[cur]) * (ys[i] - ys[cur])) * 2097152 + i
        END)) AS kmin
    FROM tr WHERE step < n
  )
  CROSS JOIN LATERAL (SELECT kmin % 2097152 AS pick,
                             kmin // 2097152 AS dmin) q
),
fin AS (SELECT * FROM tr WHERE step = n)
SELECT user_id, CAST(n AS BIGINT) AS n_stops, total AS tour_sq,
       h AS tour_hash
FROM fin
"""


def q_ewma(sf_dir: str):
    """Streaming exponential smoothing with an EXACT integer
    recurrence: s_t = s_{t-1} + floor((v_t - s_{t-1}) / 4) (alpha =
    1/4 with floor division toward minus infinity in both engines),
    seeded at the first value. Emits each user's final smoothed
    level, a checksum of the whole trajectory (sum of s_t), and the
    observation count — the full recurrence is verified, not just the
    endpoint. The SQL twin replays the recurrence per user with the
    value list packed into the recursion state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def smooth(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        v = (ii[order] * 40503) % 10000
        s = int(v[0])
        csum = s
        for t in range(1, len(v)):
            s = s + (int(v[t]) - s) // 4
            csum += s
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_obs": pa.array([len(v)], pa.int64()),
            "s_final": pa.array([s], pa.int64()),
            "s_sum": pa.array([csum], pa.int64())})

    return ds.groupby("user_id").map_groups(smooth, batch_format="pyarrow")


Q_EWMA_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, ts, event_id, (event_id * 40503) % 10000 AS v
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(v ORDER BY ts, event_id) AS vs, count(*) AS n
  FROM p GROUP BY user_id
),
ew AS (
  SELECT user_id, vs, n, 1 AS t, CAST(vs[1] AS BIGINT) AS s,
         CAST(vs[1] AS BIGINT) AS csum
  FROM ob
  UNION ALL
  SELECT user_id, vs, n, t + 1,
    s + CAST(floor((vs[t + 1] - s) / 4.0) AS BIGINT),
    csum + s + CAST(floor((vs[t + 1] - s) / 4.0) AS BIGINT)
  FROM ew WHERE t < n
),
fin AS (SELECT * FROM ew WHERE t = n)
SELECT user_id, CAST(n AS BIGINT) AS n_obs, s AS s_final, csum AS s_sum
FROM fin
"""


def q_binpack(sf_dir: str):
    """First-fit-decreasing bin packing per user (the scheduling /
    shard-packing heuristic): item sizes from the hashed event
    stream, sorted size-desc (ties by position asc), placed into the
    FIRST bin with room at capacity 1000. Emits per user the bin
    count, the max bin load, and a base-31 hash of each item's bin
    index in placement order — the entire packing is verified. The
    SQL twin replays FFD as a per-user recursion carrying the bin
    load LIST in the state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])
    CAP, MOD = 1000, 1 << 40

    def pack(g: pa.Table) -> pa.Table:
        ii = np.sort(g["event_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        sz = (ii * 48271) % 900 + 50  # sizes 50..949
        order = np.lexsort((np.arange(len(sz)), -sz))
        items = sz[order]
        loads: list[int] = []
        h = 0
        for it in items:
            for b, ld in enumerate(loads):
                if ld + it <= CAP:
                    loads[b] = ld + it
                    h = (h * 31 + (b + 1)) % MOD
                    break
            else:
                loads.append(int(it))
                h = (h * 31 + len(loads)) % MOD
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_items": pa.array([len(items)], pa.int64()),
            "n_bins": pa.array([len(loads)], pa.int64()),
            "max_load": pa.array([max(loads) if loads else 0], pa.int64()),
            "pack_hash": pa.array([h], pa.int64())})

    return ds.groupby("user_id").map_groups(pack, batch_format="pyarrow")


Q_BINPACK_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, event_id, (event_id * 48271) % 900 + 50 AS sz
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id,
         list(sz ORDER BY sz DESC, event_id ASC) AS szs,
         count(*) AS n
  FROM p GROUP BY user_id
),
bp AS (
  SELECT user_id, szs, n, 0 AS t, CAST([] AS BIGINT[]) AS loads,
         CAST(0 AS BIGINT) AS h
  FROM ob
  UNION ALL
  SELECT user_id, szs, n, t + 1,
    CASE WHEN fit IS NULL THEN list_append(loads, CAST(szs[t + 1] AS BIGINT))
         ELSE list_transform(range(1, CAST(len(loads) AS INTEGER) + 1),
                i -> CASE WHEN i = CAST(fit AS INTEGER)
                     THEN loads[i] + szs[t + 1] ELSE loads[i] END)
    END,
    (h * 31 + coalesce(fit, len(loads) + 1)) % 1099511627776
  FROM (
    SELECT *,
      -- list_position returns 0 (not NULL) on no match in DuckDB
      nullif(list_position(
        list_transform(range(1, CAST(len(loads) AS INTEGER) + 1),
                       i -> loads[i] + szs[t + 1] <= 1000), true), 0) AS fit
    FROM bp WHERE t < n
  )
),
fin AS (SELECT * FROM bp WHERE t = n)
SELECT user_id, CAST(n AS BIGINT) AS n_items,
       CAST(len(loads) AS BIGINT) AS n_bins,
       CAST(coalesce(list_max(loads), 0) AS BIGINT) AS max_load,
       h AS pack_hash
FROM fin
"""


def q_huffman(sf_dir: str):
    """Huffman code planning over the corpus (the compression-layout
    primitive): letter frequencies are counted DISTRIBUTED (per-block
    bincount partials over the raw bytes, one bounded combine), then
    the optimal prefix tree builds in a bounded finish step —
    repeatedly merge the two lightest nodes, total order (weight,
    node id), leaf ids 0..25, merged ids appended — and each letter's
    code LENGTH (its leaf depth) is emitted with its count. The SQL
    twin counts via replace() arithmetic and replays the merge loop
    as a recursion carrying (active nodes, per-leaf root, per-leaf
    depth) lists."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        buf = "".join(batch["text"].to_pylist()).encode()
        bc = np.bincount(np.frombuffer(buf, np.uint8), minlength=256)
        return pa.table({"sym": pa.array(np.arange(26, dtype=np.int64)),
                         "cnt": pa.array(bc[97:123].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    root = _combine_tree(parts.map_batches(
        lambda t: pa.table({"sym": t["sym"], "cnt": pa.array(
            np.ones(len(t), np.int64)), "c": t["cnt"]}),
        batch_format="pyarrow"), "sym", ["c"])

    def build(batch: pa.Table) -> pa.Table:
        sym = batch["sym"].to_numpy(zero_copy_only=False)
        cnt = batch["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(sym)
        sym, cnt = sym[order], cnt[order]
        alive = cnt > 0
        # nodes: (weight, id); leaves keep root pointers and depths
        nodes = {int(s): int(c) for s, c in zip(sym[alive], cnt[alive])}
        roots = {int(s): int(s) for s in sym[alive]}
        depth = {int(s): 0 for s in sym[alive]}
        nxt = 26
        while len(nodes) > 1:
            (i1, w1), (i2, w2) = sorted(nodes.items(),
                                        key=lambda kv: (kv[1], kv[0]))[:2]
            del nodes[i1], nodes[i2]
            for s, r in roots.items():
                if r == i1 or r == i2:
                    roots[s] = nxt
                    depth[s] += 1
            nodes[nxt] = w1 + w2
            nxt += 1
        return pa.table({
            "sym": pa.array(sorted(depth), pa.int64()),
            "cnt": pa.array([int(cnt[s]) for s in sorted(depth)], pa.int64()),
            "code_len": pa.array([depth[s] for s in sorted(depth)],
                                 pa.int64())})

    return root.map_batches(build, batch_format="pyarrow", batch_size=None)


Q_HUFFMAN_SQL = """
WITH RECURSIVE syms AS MATERIALIZED (
  SELECT range AS s FROM range(0, 26)
),
counts AS MATERIALIZED (
  SELECT s, CAST(coalesce(SUM(length(text)
              - length(replace(text, chr(97 + CAST(s AS INTEGER)), ''))), 0)
            AS BIGINT) AS c
  FROM syms CROSS JOIN documents GROUP BY s
),
base AS MATERIALIZED (
  SELECT coalesce(list(s ORDER BY s) FILTER (WHERE c > 0), []) AS lsyms,
         coalesce(list(c ORDER BY s) FILTER (WHERE c > 0), []) AS lcnts,
         coalesce(list(c * 64 + s ORDER BY s) FILTER (WHERE c > 0), [])
           AS nks0,
         count(*) FILTER (WHERE c > 0) AS nl
  FROM counts
),
hf AS (
  SELECT 0 AS step, nl, lsyms, lcnts,
         list_transform(lsyms, x -> CAST(x AS BIGINT)) AS roots,
         list_transform(lsyms, x -> CAST(0 AS BIGINT)) AS depths,
         list_transform(nks0, x -> CAST(x AS BIGINT)) AS nks
  FROM base
  UNION ALL
  SELECT step + 1, nl, lsyms, lcnts,
    list_transform(roots, r -> CASE WHEN r = k1 % 64 OR r = k2 % 64
                               THEN 25 + step + 1 ELSE r END),
    list_transform(range(1, CAST(len(roots) AS INTEGER) + 1),
      i -> depths[i] + CASE WHEN roots[i] = k1 % 64 OR roots[i] = k2 % 64
                       THEN 1 ELSE 0 END),
    list_append(list_filter(nks, x -> x <> k1 AND x <> k2),
                (k1 // 64 + k2 // 64) * 64 + 25 + step + 1)
  FROM (
    SELECT *, list_min(list_filter(nks, x -> x <> k1)) AS k2
    FROM (SELECT *, list_min(nks) AS k1 FROM hf WHERE step < nl - 1)
  )
),
fin AS (SELECT * FROM hf ORDER BY step DESC LIMIT 1)
SELECT CAST(unnest(lsyms) AS BIGINT) AS sym,
       CAST(unnest(lcnts) AS BIGINT) AS cnt,
       CAST(unnest(depths) AS BIGINT) AS code_len
FROM fin
"""


def q_knapsack(sf_dir: str):
    """0/1 knapsack per user (budgeted selection): items from the
    hashed event stream (weight 1..15, value 1..99), capacity 40,
    classic DP over the capacity axis. Emits the optimal value, plus
    the full DP-row checksum (sum over capacities of best value) so
    the whole frontier is verified, not just the optimum. One keyed
    shuffle; the per-group DP is one vectorized shift-and-max per
    item. The twin replays the DP as a recursion carrying the
    41-entry dp list."""
    ds = _read(sf_dir, "events", ["event_id", "user_id"])
    CAP = 40

    def knap(g: pa.Table) -> pa.Table:
        ii = np.sort(g["event_id"].to_numpy(zero_copy_only=False)
                     .astype(np.int64))
        w = (ii * 48271) % 15 + 1
        v = (ii * 40503) % 99 + 1
        dp = np.zeros(CAP + 1, np.int64)
        for wi, vi in zip(w.tolist(), v.tolist()):
            cand = np.concatenate((dp[:wi], dp[:CAP + 1 - wi] + vi))
            dp = np.maximum(dp, cand)
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_items": pa.array([len(ii)], pa.int64()),
            "best_value": pa.array([int(dp[CAP])], pa.int64()),
            "dp_sum": pa.array([int(dp.sum())], pa.int64())})

    return ds.groupby("user_id").map_groups(knap, batch_format="pyarrow")


Q_KNAPSACK_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, event_id, (event_id * 48271) % 15 + 1 AS w,
         (event_id * 40503) % 99 + 1 AS v
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(w ORDER BY event_id) AS ws,
         list(v ORDER BY event_id) AS vs, count(*) AS n
  FROM p GROUP BY user_id
),
kp AS (
  SELECT user_id, ws, vs, n, 0 AS t,
         list_transform(range(0, 41), c -> CAST(0 AS BIGINT)) AS dp
  FROM ob
  UNION ALL
  SELECT user_id, ws, vs, n, t + 1,
    list_transform(range(1, 42), ci ->
      CASE WHEN ci - 1 >= ws[t + 1]
      THEN greatest(dp[ci],
                    dp[CAST(ci - ws[t + 1] AS INTEGER)] + vs[t + 1])
      ELSE dp[ci] END)
  FROM kp WHERE t < n
),
fin AS (SELECT * FROM kp WHERE t = n)
SELECT user_id, CAST(n AS BIGINT) AS n_items,
       CAST(dp[41] AS BIGINT) AS best_value,
       CAST(list_sum(dp) AS BIGINT) AS dp_sum
FROM fin
"""


def q_levenshtein(sf_dir: str):
    """Full edit-distance kernel (the generalization of the existing
    PassJoin ed-1 blocking): deterministic sampled document pairs run
    the complete Wagner-Fischer DP, vectorized along the
    anti-diagonal-free row axis (one numpy minimum-chain per row).
    The twin is DuckDB's NATIVE levenshtein() over the same pairs —
    an independent implementation, not a replay."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    mat = ds.materialize()
    n_docs = mat.count()

    def pairs_of(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = did % 10 == 0
        did = did[keep]
        txt = [t[:160] for t, k in zip(batch["text"].to_pylist(), keep) if k]
        out_a, out_b, out_d = [], [], []
        for d, t in zip(did.tolist(), txt):
            partner = (d + 10) % (max(10, (n_docs // 10) * 10))
            out_a.append(d)
            out_b.append(partner)
            out_d.append(t)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "ta": pa.array(out_d, pa.string())})

    from osmray.joins import bucketed_join

    def btexts(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = did % 10 == 0
        return pa.table({
            "bid": pa.array(did[keep]),
            "tb": pa.array([t[:160] for t, k in
                            zip(batch["text"].to_pylist(), keep) if k],
                           pa.string())})

    lhs = mat.map_batches(pairs_of, batch_format="pyarrow")
    rhs = mat.map_batches(btexts, batch_format="pyarrow")
    joined = bucketed_join(lhs, rhs, on="b", right_on="bid", num_buckets=8)

    def lev(batch: pa.Table) -> pa.Table:
        out = []
        for a, b, ta, tb in zip(batch["a"].to_pylist(),
                                batch["b"].to_pylist(),
                                batch["ta"].to_pylist(),
                                batch["tb"].to_pylist()):
            sa = np.frombuffer(ta.encode(), np.uint8)
            sb = np.frombuffer(tb.encode(), np.uint8)
            prev = np.arange(len(sb) + 1, dtype=np.int64)
            ar = np.arange(len(sb), dtype=np.int64)
            for i, ca in enumerate(sa):
                cur = np.empty(len(sb) + 1, np.int64)
                cur[0] = i + 1
                sub = prev[:-1] + (sb != ca)
                np.minimum(sub, prev[1:] + 1, out=sub)
                # insertion chain cur[j+1] = min(sub[j], cur[j]+1)
                # vectorized via the prefix-min identity:
                # cur[j+1] = j + min(min_{k<=j}(sub[k]-k), cur[0]+1)
                cur[1:] = ar + np.minimum(
                    np.minimum.accumulate(sub - ar), i + 2)
                prev = cur
            out.append((a, b, int(prev[-1])))
        return pa.table({
            "a": pa.array([o[0] for o in out], pa.int64()),
            "b": pa.array([o[1] for o in out], pa.int64()),
            "dist": pa.array([o[2] for o in out], pa.int64())})

    return joined.map_batches(lev, batch_format="pyarrow")


Q_LEVENSHTEIN_SQL = """
WITH sel AS (SELECT doc_id, substr(text, 1, 160) AS t FROM documents
             WHERE doc_id % 10 = 0),
n AS (SELECT greatest(10, (count(*) // 10) * 10) AS m
      FROM (SELECT 1 FROM documents)),
prs AS (SELECT a.doc_id AS a, (a.doc_id + 10) % (SELECT m FROM n) AS b,
               a.t AS ta
        FROM sel a)
SELECT p.a, p.b, CAST(levenshtein(p.ta, s2.t) AS BIGINT) AS dist
FROM prs p JOIN sel s2 ON s2.doc_id = p.b
"""


def q_stable_match(sf_dir: str):
    """Gale-Shapley stable matching per market (assignment with
    two-sided preferences): 6 proposers x 6 acceptors per nation,
    preference orders from integer hashes (ties by id), smallest free
    proposer proposes next — the proposer-optimal matching, which is
    ORDER-INDEPENDENT, so the engine's per-market loop and the SQL
    twin's lockstep recursion must agree exactly. Emits (market,
    proposer, acceptor)."""
    ds = _read(sf_dir, "nation", ["n_nationkey"])
    K = 6

    def match(batch: pa.Table) -> pa.Table:
        out_m, out_p, out_a = [], [], []
        for m in batch["n_nationkey"].to_pylist():
            m = int(m)
            # prefs[p][r] = r-th choice acceptor of proposer p (1-based ids)
            prefs, arank = {}, {}
            for p in range(1, K + 1):
                h = [((m * 7919 + p * 104729 + a * 40503) % 997, a)
                     for a in range(1, K + 1)]
                prefs[p] = [a for _, a in sorted(h)]
            for a in range(1, K + 1):
                h = [((m * 6151 + p * 99991 + a * 48271) % 997, p)
                     for p in range(1, K + 1)]
                arank[a] = {p: r for r, (_, p) in enumerate(sorted(h), 1)}
            pm = {p: 0 for p in range(1, K + 1)}
            am = {a: 0 for a in range(1, K + 1)}
            nxt = {p: 0 for p in range(1, K + 1)}
            while True:
                free = [p for p in range(1, K + 1) if pm[p] == 0]
                if not free:
                    break
                p = free[0]
                a = prefs[p][nxt[p]]
                nxt[p] += 1
                inc = am[a]
                if inc == 0:
                    am[a] = p
                    pm[p] = a
                elif arank[a][p] < arank[a][inc]:
                    am[a] = p
                    pm[p] = a
                    pm[inc] = 0
            for p in range(1, K + 1):
                out_m.append(m)
                out_p.append(p)
                out_a.append(pm[p])
        return pa.table({"market": pa.array(out_m, pa.int64()),
                         "proposer": pa.array(out_p, pa.int64()),
                         "acceptor": pa.array(out_a, pa.int64())})

    return ds.map_batches(match, batch_format="pyarrow")


Q_STABLE_MATCH_SQL = """
WITH RECURSIVE mk AS MATERIALIZED (SELECT n_nationkey AS m FROM nation),
pa_ AS MATERIALIZED (
  SELECT m, p.range AS p, a.range AS a,
         (m * 7919 + p.range * 104729 + a.range * 40503) % 997 AS h1,
         (m * 6151 + p.range * 99991 + a.range * 48271) % 997 AS h2
  FROM mk CROSS JOIN range(1, 7) p CROSS JOIN range(1, 7) a
),
pr AS MATERIALIZED (
  SELECT m, p, a,
         row_number() OVER (PARTITION BY m, p ORDER BY h1, a) AS r
  FROM pa_
),
ar AS MATERIALIZED (
  SELECT m, p, a,
         row_number() OVER (PARTITION BY m, a ORDER BY h2, p) AS r
  FROM pa_
),
packed AS MATERIALIZED (
  SELECT m,
    (SELECT list(a ORDER BY p, r) FROM pr WHERE pr.m = mk2.m) AS prefs,
    (SELECT list(r ORDER BY a, p) FROM ar WHERE ar.m = mk2.m) AS aranks
  FROM mk mk2
),
gs AS (
  SELECT m, prefs, aranks, 0 AS step,
         list_transform(range(1, 7), x -> CAST(0 AS BIGINT)) AS pm,
         list_transform(range(1, 7), x -> CAST(0 AS BIGINT)) AS am,
         list_transform(range(1, 7), x -> CAST(0 AS BIGINT)) AS nxt
  FROM packed
  UNION ALL
  SELECT m, prefs, aranks, step + 1,
    list_transform(range(1, 7), i ->
      CASE WHEN i = fp THEN (CASE WHEN inc = 0 OR betters THEN tgt
                             ELSE CAST(0 AS BIGINT) END)
           WHEN inc <> 0 AND betters AND CAST(i AS BIGINT) = inc
             THEN CAST(0 AS BIGINT)
           ELSE pm[i] END),
    list_transform(range(1, 7), i ->
      CASE WHEN CAST(i AS BIGINT) = tgt AND (inc = 0 OR betters)
           THEN CAST(fp AS BIGINT) ELSE am[i] END),
    list_transform(range(1, 7), i ->
      CASE WHEN i = fp THEN nxt[i] + 1 ELSE nxt[i] END)
  FROM (
    SELECT *,
      am[CAST(tgt AS INTEGER)] AS inc,
      CASE WHEN am[CAST(tgt AS INTEGER)] = 0 THEN true
           ELSE aranks[CAST((tgt - 1) * 6 + fp AS INTEGER)]
              < aranks[CAST((tgt - 1) * 6 + am[CAST(tgt AS INTEGER)]
                            AS INTEGER)]
      END AS betters
    FROM (
      SELECT *,
        prefs[CAST((fp - 1) * 6 + nxt[CAST(fp AS INTEGER)] + 1
                   AS INTEGER)] AS tgt
      FROM (
        SELECT *, nullif(list_position(pm, 0), 0) AS fp
        FROM gs WHERE step < 36
      ) WHERE fp IS NOT NULL
    )
  )
),
fin AS (
  SELECT m, pm, row_number() OVER (PARTITION BY m ORDER BY step DESC) AS rr
  FROM gs
)
SELECT m AS market, CAST(unnest(range(1, 7)) AS BIGINT) AS proposer,
       CAST(unnest(pm) AS BIGINT) AS acceptor
FROM fin WHERE rr = 1
"""


def q_range_parts(sf_dir: str):
    """The sample-split-assign RANGE PARTITIONER every distributed
    sort rests on, surfaced as a query: a deterministic 1/101 key
    sample is folded once (bounded), its 15 evenly-spaced order
    statistics become the split points, every row assigns to a
    partition by binary search against the broadcast splits, and
    per-partition (count, min, max) come back through map-side keyed
    partials. Emits the 16 partitions' stats — the balance the
    sampled splits actually achieved is exactly what is verified.
    The SQL twin takes the same order statistics via row_number on
    the sample and assigns with a scalar list scan."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    NP = 16

    def keyvals(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        pid = p["pid"]
        a = (pid * 2654435761) % 4294967296
        v = (a >> 8) ^ (a & 255)
        return pa.table({"pid": pa.array(pid), "v": pa.array(v)})

    kv = ds.map_batches(keyvals, batch_format="pyarrow").materialize()

    def sample(batch: pa.Table) -> pa.Table:
        pid = batch["pid"].to_numpy(zero_copy_only=False)
        keep = pid % 101 == 0
        return pa.table({"v": batch["v"].filter(pa.array(keep))})

    sv = np.sort(kv.map_batches(sample, batch_format="pyarrow")
                 .to_pandas()["v"].to_numpy().astype(np.int64))
    ns = len(sv)
    # splits: the i*ns//NP-th order statistics, i = 1..NP-1 (1-based
    # ranks floor(i*ns/NP), clamped to >= 1)
    splits = sv[np.maximum((np.arange(1, NP) * ns) // NP, 1) - 1]

    def assign(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.searchsorted(splits, v, side="right")
        order = np.argsort(part, kind="stable")
        ps = part[order]
        vs = v[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ps)) + 1))
        return pa.table({
            "part": pa.array(ps[bounds].astype(np.int64)),
            "n": pa.array(np.diff(np.concatenate(
                (bounds, [len(ps)]))).astype(np.int64)),
            "vmin": pa.array(np.minimum.reduceat(vs, bounds)),
            "vmax": pa.array(np.maximum.reduceat(vs, bounds))})

    parts = kv.map_batches(assign, batch_format="pyarrow")

    def comb(batch: pa.Table) -> pa.Table:
        p = batch["part"].to_numpy(zero_copy_only=False)
        order = np.argsort(p, kind="stable")
        ps = p[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ps)) + 1))
        n = batch["n"].to_numpy(zero_copy_only=False)[order]
        vmin = batch["vmin"].to_numpy(zero_copy_only=False)[order]
        vmax = batch["vmax"].to_numpy(zero_copy_only=False)[order]
        return pa.table({
            "part": pa.array(ps[bounds]),
            "n": pa.array(np.add.reduceat(n, bounds)),
            "vmin": pa.array(np.minimum.reduceat(vmin, bounds)),
            "vmax": pa.array(np.maximum.reduceat(vmax, bounds))})

    mid = parts.repartition(4).map_batches(comb, batch_format="pyarrow",
                                           batch_size=None)
    return mid.repartition(1).map_batches(comb, batch_format="pyarrow",
                                          batch_size=None)


Q_RANGE_PARTS_SQL = """
WITH kv AS (
  SELECT pid, xor((pid * 2654435761) % 4294967296 // 256,
                  (pid * 2654435761) % 4294967296 % 256) AS v
  FROM (SELECT l_orderkey * 10 + l_linenumber AS pid FROM lineitem)
),
samp AS (
  SELECT list(v ORDER BY v) AS vs, count(*) AS ns
  FROM kv WHERE pid % 101 = 0
),
-- positional split list: one entry per i in 1..15, duplicates KEPT
-- (rank collisions on a small sample must not dedup — the engine's
-- splits array always has 15 entries)
sp AS (
  SELECT list_transform(range(1, 16),
                        i -> vs[greatest((i * ns) // 16, 1)]) AS splits
  FROM samp
),
asg AS (
  SELECT len(list_filter((SELECT splits FROM sp), s -> s <= kv.v)) AS part,
         v
  FROM kv
)
SELECT CAST(part AS BIGINT) AS part, CAST(count(*) AS BIGINT) AS n,
       CAST(min(v) AS BIGINT) AS vmin, CAST(max(v) AS BIGINT) AS vmax
FROM asg GROUP BY part
"""


def q_lis(sf_dir: str):
    """Longest STRICTLY increasing subsequence per user (patience
    algorithm): the tails array admits a binary-search update per
    element, making the per-group cost O(n log n) where the textbook
    DP is O(n^2). Emits the LIS length and the final tails-array
    checksum (sum), so the whole pile structure is verified. The SQL
    twin replays patience with the tails list in the recursion
    state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def lis(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        v = (ii[order] * 40503) % 100000
        tails: list[int] = []
        for x in v.tolist():
            k = int(np.searchsorted(np.asarray(tails), x))  # strict LIS
            if k == len(tails):
                tails.append(x)
            else:
                tails[k] = x
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "lis_len": pa.array([len(tails)], pa.int64()),
            "tails_sum": pa.array([int(sum(tails))], pa.int64())})

    return ds.groupby("user_id").map_groups(lis, batch_format="pyarrow")


Q_LIS_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, ts, event_id, (event_id * 40503) % 100000 AS v
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(v ORDER BY ts, event_id) AS vs, count(*) AS n
  FROM p GROUP BY user_id
),
ls AS (
  SELECT user_id, vs, n, 0 AS t, CAST([] AS BIGINT[]) AS tails
  FROM ob
  UNION ALL
  SELECT user_id, vs, n, t + 1,
    CASE WHEN k IS NULL THEN list_append(tails, CAST(vs[t + 1] AS BIGINT))
         ELSE list_transform(range(1, CAST(len(tails) AS INTEGER) + 1),
                i -> CASE WHEN i = CAST(k AS INTEGER)
                     THEN CAST(vs[t + 1] AS BIGINT) ELSE tails[i] END)
    END
  FROM (
    SELECT *,
      nullif(list_position(list_transform(tails, x -> x >= vs[t + 1]),
                           true), 0) AS k
    FROM ls WHERE t < n
  )
),
fin AS (SELECT * FROM ls WHERE t = n)
SELECT user_id, CAST(len(tails) AS BIGINT) AS lis_len,
       CAST(coalesce(list_sum(tails), 0) AS BIGINT) AS tails_sum
FROM fin
"""


def q_rainwater(sf_dir: str):
    """Trapping rain water per user over the hashed elevation stream
    (the two-sided prefix-max identity): trapped(t) = min(running max
    from the left, running max from the right) - height — entirely
    window-expressible, so the twin needs no recursion. Engine: one
    keyed shuffle, two vectorized accumulates per group."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def rain(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        h = (ii[order] * 48271) % 1000
        lm = np.maximum.accumulate(h)
        rm = np.maximum.accumulate(h[::-1])[::-1]
        trapped = np.minimum(lm, rm) - h
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_obs": pa.array([len(h)], pa.int64()),
            "water": pa.array([int(trapped.sum())], pa.int64()),
            "peak": pa.array([int(h.max())], pa.int64())})

    return ds.groupby("user_id").map_groups(rain, batch_format="pyarrow")


Q_RAINWATER_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id, (event_id * 48271) % 1000 AS h
  FROM events
),
mx AS (
  SELECT user_id, h,
    max(h) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lm,
    max(h) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS rm
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
       CAST(SUM(least(lm, rm) - h) AS BIGINT) AS water,
       CAST(max(h) AS BIGINT) AS peak
FROM mx GROUP BY user_id
"""


def q_markov(sf_dir: str):
    """Markov transition-matrix estimation over behavioral sequences
    (the session-model primitive): per user, consecutive event-type
    pairs in ts order; global (from_type, to_type) counts plus each
    cell's first-observing user. One keyed shuffle groups the
    sequences; transition pairs fold through map-side keyed partials
    and one bounded aggregate (the type alphabet bounds the matrix).
    The twin is a lag window + grouped count/min."""
    from ray.data.aggregate import Min, Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def pairs(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        et = np.asarray(g["event_type"].to_pylist(), object)[order]
        if len(et) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "first_user": pa.array([], pa.int64())})
        uid = int(g["user_id"][0].as_py())
        a, b = et[:-1], et[1:]
        keys = np.char.add(np.char.add(a.astype(str), "\x1f"), b.astype(str))
        u, c = np.unique(keys, return_counts=True)
        fr = [k.split("\x1f")[0] for k in u.tolist()]
        to = [k.split("\x1f")[1] for k in u.tolist()]
        return pa.table({"from_type": pa.array(fr, pa.string()),
                         "to_type": pa.array(to, pa.string()),
                         "cnt": pa.array(c.astype(np.int64)),
                         "first_user": pa.array(
                             np.full(len(u), uid, np.int64))})

    return (ds.groupby("user_id").map_groups(pairs, batch_format="pyarrow")
            .groupby(["from_type", "to_type"])
            .aggregate(Sum("cnt", alias_name="n"),
                       Min("first_user", alias_name="first_user")))


Q_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(user_id) AS BIGINT) AS first_user
FROM seq WHERE prev IS NOT NULL
GROUP BY prev, event_type
"""


def q_autocorr(sf_dir: str):
    """Lag-1 autocorrelation NUMERATORS per user (seasonality
    screening kept exact): n, sum v, sum v^2, and the lag-1
    cross-moment sum(v_t * v_{t+1}) over the ts-ordered stream — the
    correlation itself is a pure function of these integers, computed
    downstream where floats are acceptable. One keyed shuffle,
    vectorized shifted product; lag-window twin."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def mom(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        v = (ii[order] * 40503) % 1000
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n": pa.array([len(v)], pa.int64()),
            "s1": pa.array([int(v.sum())], pa.int64()),
            "s2": pa.array([int((v * v).sum())], pa.int64()),
            "cross1": pa.array([int((v[:-1] * v[1:]).sum())], pa.int64())})

    return ds.groupby("user_id").map_groups(mom, batch_format="pyarrow")


Q_AUTOCORR_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id, (event_id * 40503) % 1000 AS v
  FROM events
),
lagged AS (
  SELECT user_id, v,
         lead(v) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS s1, CAST(SUM(v * v) AS BIGINT) AS s2,
       CAST(coalesce(SUM(v * nxt), 0) AS BIGINT) AS cross1
FROM lagged GROUP BY user_id
"""


def q_terrain(sf_dir: str):
    """Terrain analysis over the sparse integer cell DEM — the GIS
    slope/aspect shape (Horn-style 3x3 gradient): per-block per-cell
    elevation partials SCATTER signed Horn weights to their 8
    neighbors (the gradient is linear in z, so block partials sum
    exactly — no pre-fold needed), and ONE sorted-scan fold sums
    gx/gy per receiving cell. Aspect is the trig-free 8-octant
    quantization: integer comparisons only, identical CASE-priority
    chain in the SQL twin, so the result is bit-exact."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return terrain.horn_gradient(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"))


def _li_cell_points(batch: pa.Table) -> pa.Table:
    """The shared sparse-DEM view of lineitem: 256x256 integer cells,
    elevation value = pid % 1000 (kernels: osmray/terrain.py)."""
    p = _li_points(batch)
    return pa.table({
        "cx": pa.array((p["m1"] >> 18).astype(np.int64)),
        "cy": pa.array((p["m2"] >> 18).astype(np.int64)),
        "v": pa.array((p["pid"] % 1000).astype(np.int64))})


Q_TERRAIN_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                         (SELECT unnest([-1, 0, 1]) AS dy) b
      WHERE NOT (dx = 0 AND dy = 0)),
g AS (
  SELECT c.cx - d.dx AS cx, c.cy - d.dy AS cy,
    sum(CASE WHEN d.dx = 0 THEN 0
             ELSE (CASE WHEN d.dx > 0 THEN 1 ELSE -1 END)
                  * (CASE WHEN d.dy = 0 THEN 2 ELSE 1 END) * c.z END) AS gx,
    sum(CASE WHEN d.dy = 0 THEN 0
             ELSE (CASE WHEN d.dy > 0 THEN 1 ELSE -1 END)
                  * (CASE WHEN d.dx = 0 THEN 2 ELSE 1 END) * c.z END) AS gy
  FROM c, d GROUP BY 1, 2
)
SELECT cx, cy, CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
  CAST(abs(gx) + abs(gy) AS BIGINT) AS slope_l1,
  CAST(CASE WHEN gx = 0 AND gy = 0 THEN -1
    WHEN abs(gx) >= 2 * abs(gy) THEN CASE WHEN gx > 0 THEN 0 ELSE 4 END
    WHEN abs(gy) >= 2 * abs(gx) THEN CASE WHEN gy > 0 THEN 2 ELSE 6 END
    WHEN gx > 0 AND gy > 0 THEN 1
    WHEN gx < 0 AND gy > 0 THEN 3
    WHEN gx < 0 AND gy < 0 THEN 5
    ELSE 7 END AS BIGINT) AS aspect
FROM g
"""


_WATERSHED_CACHE: dict = {}


def _watershed_cached(sf_dir: str):
    """Materialized watershed labeling, cached per sf_dir for the
    session — q_watershed and q_basin_boundary derive from the same
    D8 drain forest, so the iterative CC + sink joins run once per
    bench session instead of once per query (the _li_hash_edges
    pattern)."""
    from osmray import terrain

    if sf_dir not in _WATERSHED_CACHE:
        _WATERSHED_CACHE[sf_dir] = terrain.watershed(
            _d8_cells(sf_dir)).materialize()
    return _WATERSHED_CACHE[sf_dir]


def _d8_cells(sf_dir: str):
    """Shared D8 core: Dataset (cell, code) over the sparse cell DEM
    (terrain.pack packing; code = 0 for a sink else 1-based index
    into terrain.D8_DIRS of the steepest strictly-lower neighbor).
    Kernels: osmray/terrain.py (elevation totals -> packed-min
    candidate fold)."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return terrain.d8_codes(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"))


def q_d8_flow(sf_dir: str):
    """D8 flow direction — the hydrology primitive over the sparse
    cell DEM: each cell drains to its lowest EXISTING 8-neighbor if
    that neighbor is strictly lower (ties between equal neighbors
    break to the smallest direction code; a flat or pit cell is a
    sink, flow_dir = -1). Unlike the gradient, argmin is NOT additive
    over partials, so elevations first total through one sorted-scan
    sum fold; totals then scatter (z*16 + code) candidates to their
    neighbors plus a (z*16 + 0) self row — the self row wins exact-z
    ties, which IS the strictly-lower rule — and a second sorted-scan
    MIN fold picks the winner; receivers without a self row (phantom
    cells named only by neighbors) drop out via a max-fold presence
    flag."""
    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cx": pa.array(c // 8192), "cy": pa.array(c % 8192 - 4096),
            "flow_dir": pa.array(np.where(code == 0, -1, code - 1)
                                 .astype(np.int64))})

    return _d8_cells(sf_dir).map_batches(fmt, batch_format="pyarrow")


Q_D8_FLOW_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d(dx, dy, code) AS (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 3), (0, -1, 4),
                           (0, 1, 5), (1, -1, 6), (1, 0, 7), (1, 1, 8)),
cand AS (
  SELECT cx, cy, z * 16 AS packed, 1 AS selfflag FROM c
  UNION ALL
  SELECT c.cx - d.dx, c.cy - d.dy, c.z * 16 + d.code, 0 FROM c, d
),
f AS (SELECT cx, cy, min(packed) AS mp, max(selfflag) AS hs
      FROM cand GROUP BY cx, cy)
SELECT cx, cy,
  CAST(CASE WHEN mp % 16 = 0 THEN -1 ELSE mp % 16 - 1 END AS BIGINT)
    AS flow_dir
FROM f WHERE hs = 1
"""


def q_watershed(sf_dir: str):
    """Watershed segmentation over the D8 drain forest — label every
    cell with THE SINK it eventually drains to (the hydrology basin /
    image-watershed shape). Because the drain rule is strictly-lower,
    the (cell -> drain) edges form a forest with exactly one sink per
    tree, so basins ARE connected components: CC over the drain edges
    (two-engine graph policy), one bucketed join to name each
    component by its sink, one to attach that sink to every member,
    and an anti join to restore isolated sinks (no in-edges, so no CC
    row). The twin walks the drain pointers with a recursive CTE."""
    from osmray import terrain

    ws = _watershed_cached(sf_dir)

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sink"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        sx, sy = terrain.unpack(s)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "sink_cx": pa.array(sx), "sink_cy": pa.array(sy)})

    return ws.map_batches(fmt, batch_format="pyarrow")


Q_WATERSHED_SQL = f"""
WITH RECURSIVE pts AS MATERIALIZED ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS MATERIALIZED (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d(dx, dy, code) AS (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 3), (0, -1, 4),
                           (0, 1, 5), (1, -1, 6), (1, 0, 7), (1, 1, 8)),
cand AS (
  SELECT cx, cy, z * 16 AS packed, 1 AS selfflag FROM c
  UNION ALL
  SELECT c.cx - d.dx, c.cy - d.dy, c.z * 16 + d.code, 0 FROM c, d
),
d8 AS MATERIALIZED (
  SELECT cx, cy, min(packed) % 16 AS code
  FROM cand GROUP BY cx, cy
  HAVING max(selfflag) = 1),
r AS (
  SELECT cx, cy, cx AS px, cy AS py, code AS pcode FROM d8
  UNION ALL
  SELECT r.cx, r.cy, n.cx, n.cy, n.code
  FROM r
  JOIN d dd ON dd.code = r.pcode
  JOIN d8 n ON n.cx = r.px + dd.dx AND n.cy = r.py + dd.dy
  WHERE r.pcode <> 0
)
SELECT cx, cy, px AS sink_cx, py AS sink_cy
FROM r WHERE pcode = 0
"""


def q_substring_dups(sf_dir: str):
    """Exact repeated-substring detection over the corpus (32-char
    grams at stride 8, prefix-keyed shuffle, group summaries only —
    no pair expansion). ASCII corpus: character == byte offsets, so
    the twin's substr() replay is exact. Kernel lives in
    text.substring_dups (declarative step "substring_dups")."""
    from osmray.text import substring_dups

    return substring_dups(_read(sf_dir, "documents", ["doc_id", "text"]),
                          "doc_id", "text", gram_len=32, stride=8,
                          min_docs=2)


Q_SUBSTRING_DUPS_SQL = """
WITH off AS (
  SELECT unnest(generate_series(
    0, (SELECT COALESCE(max(length(text)), 32) - 32 FROM documents),
    8)) AS o),
w AS (
  SELECT d.doc_id, substr(d.text, off.o + 1, 32) AS gram
  FROM documents d JOIN off ON off.o + 32 <= length(d.text)
)
SELECT gram, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM w GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_morph_grid(sf_dir: str):
    """Binary morphology on the sparse occupancy grid — dilation
    membership, 3x3 support count, and erosion survival in one pass:
    every OCCUPIED cell scatters presence 1 to its full 3x3
    neighborhood (dilation = any support) and a selfflag to itself;
    one mixed sorted fold (sum support, max selfflag) finishes.
    eroded = occupied with all 9 supports present. Emits every cell
    of the DILATED set."""
    from osmray import terrain
    from osmray.tableops import sorted_fold, sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    totals = sorted_fold_sums(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"),
        "cell", ["z"])

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        one = np.ones(len(c), np.int64)
        ks, sups, flags = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ks.append(terrain.pack(cx + dx, cy + dy))
                sups.append(one)
                flags.append(one * (dx == 0 and dy == 0))
        # block-local combine (sum support / max selfflag): exact for
        # the downstream fold, cuts the keyed sort input up to 9x
        k = np.concatenate(ks)
        u, inv = np.unique(k, return_inverse=True)
        sup = np.bincount(inv, weights=np.concatenate(sups),
                          minlength=len(u)).astype(np.int64)
        fmax = np.zeros(len(u), np.int64)
        np.maximum.at(fmax, inv, np.concatenate(flags))
        return pa.table({"cell": pa.array(u), "support": pa.array(sup),
                         "selfflag": pa.array(fmax)})

    folded = sorted_fold(
        totals.map_batches(scatter, batch_format="pyarrow"),
        "cell", ["support", "selfflag"], ["sum", "max"])

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        sup = batch["support"].to_numpy(zero_copy_only=False).astype(np.int64)
        occ = batch["selfflag"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "n_support": pa.array(sup), "occupied": pa.array(occ),
            "eroded": pa.array(((occ == 1) & (sup == 9))
                               .astype(np.int64))})

    return folded.map_batches(fmt, batch_format="pyarrow")


Q_MORPH_GRID_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy FROM pts),
c AS (SELECT DISTINCT cx, cy FROM p),
d AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                         (SELECT unnest([-1, 0, 1]) AS dy) b),
s AS (
  SELECT c.cx + d.dx AS cx, c.cy + d.dy AS cy,
         count(*) AS n_support,
         max(CASE WHEN d.dx = 0 AND d.dy = 0 THEN 1 ELSE 0 END) AS occupied
  FROM c, d GROUP BY 1, 2
)
SELECT cx, cy, CAST(n_support AS BIGINT) AS n_support,
  CAST(occupied AS BIGINT) AS occupied,
  CAST(CASE WHEN occupied = 1 AND n_support = 9 THEN 1 ELSE 0 END
       AS BIGINT) AS eroded
FROM s
"""


def q_basin_boundary(sf_dir: str):
    """Watershed ridge extraction — the raster-to-vector step: a
    boundary cell is an occupied cell with at least one occupied
    4-neighbor in a DIFFERENT basin. Basins come from the D8
    watershed; each labeled cell scatters its sink to its 4
    neighbors, one bucketed join attaches the receiver's own sink,
    and a sum fold counts disagreeing neighbors. Emits boundary
    cells only."""
    from osmray import terrain
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    ws = _watershed_cached(sf_dir)
    nb = max(1, min(64, ws.count() // 250_000 + 1))

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sink"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        outs = []
        for dx, dy in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            outs.append(pa.table({
                "cell": pa.array(terrain.pack(cx + dx, cy + dy)),
                "nbr_sink": pa.array(s)}))
        return pa.concat_tables(outs)

    joined = bucketed_join(
        ws.map_batches(scatter, batch_format="pyarrow"), ws, on="cell",
        num_buckets=nb)

    def diff(batch: pa.Table) -> pa.Table:
        ns = batch["nbr_sink"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sink"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cell": batch["cell"],
            "n_diff": pa.array((ns != s).astype(np.int64))})

    folded = sorted_fold_sums(
        joined.map_batches(diff, batch_format="pyarrow"), "cell", ["n_diff"])

    def fmt(batch: pa.Table) -> pa.Table:
        nd = batch["n_diff"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = nd > 0
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        cx, cy = terrain.unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "n_diff_nbrs": pa.array(nd[m])})

    return folded.map_batches(fmt, batch_format="pyarrow")


Q_BASIN_BOUNDARY_SQL = f"""
WITH RECURSIVE pts AS MATERIALIZED ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS MATERIALIZED (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d(dx, dy, code) AS (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 3), (0, -1, 4),
                           (0, 1, 5), (1, -1, 6), (1, 0, 7), (1, 1, 8)),
cand AS (
  SELECT cx, cy, z * 16 AS packed, 1 AS selfflag FROM c
  UNION ALL
  SELECT c.cx - d.dx, c.cy - d.dy, c.z * 16 + d.code, 0 FROM c, d
),
d8 AS MATERIALIZED (
  SELECT cx, cy, min(packed) % 16 AS code
  FROM cand GROUP BY cx, cy
  HAVING max(selfflag) = 1),
r AS (
  SELECT cx, cy, cx AS px, cy AS py, code AS pcode FROM d8
  UNION ALL
  SELECT r.cx, r.cy, n.cx, n.cy, n.code
  FROM r
  JOIN d dd ON dd.code = r.pcode
  JOIN d8 n ON n.cx = r.px + dd.dx AND n.cy = r.py + dd.dy
  WHERE r.pcode <> 0
),
ws AS MATERIALIZED (
  SELECT cx, cy, px AS sx, py AS sy FROM r WHERE pcode = 0)
SELECT a.cx, a.cy, CAST(count(*) AS BIGINT) AS n_diff_nbrs
FROM ws a JOIN ws b
  ON abs(a.cx - b.cx) + abs(a.cy - b.cy) = 1
WHERE a.sx <> b.sx OR a.sy <> b.sy
GROUP BY a.cx, a.cy
"""


def q_hillshade(sf_dir: str):
    """Trig-free integer hillshade over the sparse cell DEM: the
    classic terrain-visualization op, expressed exactly — illumination
    score = -(gx*lx + gy*ly) for the fixed light vector (1, 1)
    (northwest light), emitted raw plus a 3-way lit/flat/shadow class
    (sign comparisons only, so the twin replays it with the identical
    CASE chain on the same Horn gradient)."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    g = terrain.horn_gradient(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"))

    def shade(batch: pa.Table) -> pa.Table:
        gx = batch["gx"].to_numpy(zero_copy_only=False).astype(np.int64)
        gy = batch["gy"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = -(gx + gy)
        cls = np.sign(s).astype(np.int64)
        return pa.table({
            "cx": batch["cx"], "cy": batch["cy"],
            "shade": pa.array(s), "lit_class": pa.array(cls)})

    return g.map_batches(shade, batch_format="pyarrow")


Q_HILLSHADE_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d AS (SELECT dx, dy FROM (SELECT unnest([-1, 0, 1]) AS dx) a,
                         (SELECT unnest([-1, 0, 1]) AS dy) b
      WHERE NOT (dx = 0 AND dy = 0)),
g AS (
  SELECT c.cx - d.dx AS cx, c.cy - d.dy AS cy,
    sum(CASE WHEN d.dx = 0 THEN 0
             ELSE (CASE WHEN d.dx > 0 THEN 1 ELSE -1 END)
                  * (CASE WHEN d.dy = 0 THEN 2 ELSE 1 END) * c.z END) AS gx,
    sum(CASE WHEN d.dy = 0 THEN 0
             ELSE (CASE WHEN d.dy > 0 THEN 1 ELSE -1 END)
                  * (CASE WHEN d.dx = 0 THEN 2 ELSE 1 END) * c.z END) AS gy
  FROM c, d GROUP BY 1, 2
)
SELECT cx, cy, CAST(-(gx + gy) AS BIGINT) AS shade,
  CAST(CASE WHEN -(gx + gy) > 0 THEN 1
            WHEN -(gx + gy) < 0 THEN -1 ELSE 0 END AS BIGINT) AS lit_class
FROM g
"""


def q_grid_pool(sf_dir: str):
    """2x2 max-pool over the sparse cell DEM — the CNN-pooling shape
    as keyed dataflow: elevations total (argmax is not additive),
    every cell re-keys to its 2x2 super-cell, and ONE packed-max
    sorted fold picks (z, then smaller cell id on ties) per pool;
    emits (px, py, max_z, argmax_cx, argmax_cy)."""
    from osmray import terrain
    from osmray.tableops import sorted_fold, sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    totals = sorted_fold_sums(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"),
        "cell", ["z"])

    def rekey(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        # pack (z, -cell) so max prefers higher z then the SMALLER
        # cell id; cell < 2^24 here so z*2^25 never collides
        return pa.table({
            "pool": pa.array((cx // 2) * 4096 + (cy // 2)),
            "packed": pa.array(z * (1 << 25) + ((1 << 25) - 1 - c))})

    folded = sorted_fold(
        totals.map_batches(rekey, batch_format="pyarrow"),
        "pool", ["packed"], ["max"])

    def fmt(batch: pa.Table) -> pa.Table:
        p = batch["pool"].to_numpy(zero_copy_only=False).astype(np.int64)
        mp = batch["packed"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (1 << 25) - 1 - mp % (1 << 25)
        cx, cy = terrain.unpack(c)
        return pa.table({
            "px": pa.array(p // 4096), "py": pa.array(p % 4096),
            "max_z": pa.array(mp >> 25),
            "argmax_cx": pa.array(cx), "argmax_cy": pa.array(cy)})

    return folded.map_batches(fmt, batch_format="pyarrow")


Q_GRID_POOL_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
rk AS (SELECT cx // 2 AS px, cy // 2 AS py, z, cx, cy,
         row_number() OVER (PARTITION BY cx // 2, cy // 2
                            ORDER BY z DESC, cx * 8192 + cy + 4096) AS r
       FROM c)
SELECT px, py, CAST(z AS BIGINT) AS max_z,
       cx AS argmax_cx, cy AS argmax_cy
FROM rk WHERE r = 1
"""


def q_tri(sf_dir: str):
    """Terrain Ruggedness Index over the sparse cell DEM
    (terrain.ruggedness): the NONLINEAR focal — |z_n - z_c| does not
    distribute over partials, so totals scatter raw z and ONE
    bucketed join + ONE sorted fold finish per receiving cell."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return terrain.ruggedness(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"))


Q_TRI_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy)
SELECT a.cx, a.cy, CAST(SUM(abs(b.z - a.z)) AS BIGINT) AS tri,
       CAST(count(*) AS BIGINT) AS n_nbr
FROM c a JOIN c b
  ON abs(b.cx - a.cx) <= 1 AND abs(b.cy - a.cy) <= 1
  AND NOT (b.cx = a.cx AND b.cy = a.cy)
GROUP BY a.cx, a.cy
"""


def q_motion_flow(sf_dir: str):
    """Block-matching motion estimation between frame pairs — the
    video-flow primitive: frame A is the decoded fixture image, frame
    B is A cyclically shifted by a PLANTED per-image motion (multiples
    of the 32-px block so the piecewise structure stays aligned; the
    shift is a pure function of idx, so the twin knows it too). The
    engine scans all 25 candidate shifts in [-2, 2]^2 cells on the
    exact block grid, scoring integer SAD with wraparound, and emits
    the argmin (ties -> smallest dy then dx). The planted shift is in
    the candidate set, so its SAD is 0 — but periodic patterns can
    have other zeros, which is exactly what the deterministic
    tie-break (and the twin's identical ORDER BY) resolves."""
    from osmray import codecs, oraclefix

    images = oraclefix.load_phash()

    def stage(batch: pa.Table) -> pa.Table:
        idx = batch["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        mats = np.stack([
            codecs.png_decode(b)[:, :, 0].astype(np.int64)
            for b in batch["bytes"].to_pylist()])
        bm = mats.reshape(-1, 8, 32, 8, 32).sum(axis=(2, 4)) // 1024
        n = bm.shape[0]
        sy = idx % 3 - 1
        sx = (idx // 3) % 3 - 1
        rows = np.arange(8)
        # frame B per image: A rolled by the planted (sy, sx)
        fb = bm[np.arange(n)[:, None, None],
                (rows[None, :, None] - sy[:, None, None]) % 8,
                (rows[None, None, :] - sx[:, None, None]) % 8]
        best = np.full(n, 1 << 62, dtype=np.int64)
        bdy = np.zeros(n, dtype=np.int64)
        bdx = np.zeros(n, dtype=np.int64)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                cand = bm[:, (rows[:, None] - dy) % 8,
                          (rows[None, :] - dx) % 8]
                sad = np.abs(cand - fb).sum(axis=(1, 2))
                win = sad < best  # strict: earlier (dy, dx) wins ties
                best = np.where(win, sad, best)
                bdy = np.where(win, dy, bdy)
                bdx = np.where(win, dx, bdx)
        return pa.table({
            "idx": pa.array(idx), "dy": pa.array(bdy),
            "dx": pa.array(bdx), "sad": pa.array(best)})

    return images.select_columns(["idx", "bytes"]).map_batches(
        stage, batch_format="pyarrow")


Q_MOTION_FLOW_SQL = f"""
WITH {_PH_CTES},
bm AS (SELECT i AS img, j // 8 AS rb, j % 8 AS cb, 40 + 160 * bit AS v
       FROM phbits),
sh AS (SELECT DISTINCT img, img % 3 - 1 AS sy, (img // 3) % 3 - 1 AS sx
       FROM bm),
cand AS (SELECT a.range - 2 AS dy, b.range - 2 AS dx
         FROM range(0, 5) a CROSS JOIN range(0, 5) b),
sad AS (
  SELECT a.img, c.dy, c.dx,
    SUM(abs(ac.v - fb.v)) AS sad
  FROM bm a
  JOIN sh ON sh.img = a.img
  CROSS JOIN cand c
  JOIN bm ac ON ac.img = a.img
    AND ac.rb = ((a.rb - c.dy) % 8 + 8) % 8
    AND ac.cb = ((a.cb - c.dx) % 8 + 8) % 8
  JOIN bm fb ON fb.img = a.img
    AND fb.rb = ((a.rb - sh.sy) % 8 + 8) % 8
    AND fb.cb = ((a.cb - sh.sx) % 8 + 8) % 8
  GROUP BY a.img, c.dy, c.dx
),
rk AS (SELECT *, row_number() OVER (PARTITION BY img
         ORDER BY sad, dy, dx) AS r FROM sad)
SELECT img AS idx, CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx,
       CAST(sad AS BIGINT) AS sad
FROM rk WHERE r = 1
"""


def q_image_moments(sf_dir: str):
    """Integer image moments over thresholded DECODED pixels — the
    shape-descriptor primitive (centroid / orientation feed): cells
    with block value > 100 (i.e. the bit=1 cells) contribute their
    (rb, cb); emits raw moments m00/m10/m01 and second moments
    mxx/myy/mxy per image, all exact int64."""
    from osmray import codecs, oraclefix

    images = oraclefix.load_phash()

    def stage(batch: pa.Table) -> pa.Table:
        idx = batch["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        mats = np.stack([
            codecs.png_decode(b)[:, :, 0].astype(np.int64)
            for b in batch["bytes"].to_pylist()])
        bm = mats.reshape(-1, 8, 32, 8, 32).sum(axis=(2, 4)) // 1024
        on = bm > 100
        rb = np.arange(8)[None, :, None]
        cb = np.arange(8)[None, None, :]
        z = np.zeros_like(bm)
        r = np.where(on, rb + z, 0)
        c = np.where(on, cb + z, 0)
        return pa.table({
            "idx": pa.array(idx),
            "m00": pa.array(on.sum(axis=(1, 2)).astype(np.int64)),
            "m10": pa.array(r.sum(axis=(1, 2))),
            "m01": pa.array(c.sum(axis=(1, 2))),
            "mxx": pa.array((r * r).sum(axis=(1, 2))),
            "myy": pa.array((c * c).sum(axis=(1, 2))),
            "mxy": pa.array((r * c).sum(axis=(1, 2)))})

    return images.select_columns(["idx", "bytes"]).map_batches(
        stage, batch_format="pyarrow")


Q_IMAGE_MOMENTS_SQL = f"""
WITH {_PH_CTES}
SELECT i AS idx,
  CAST(SUM(bit) AS BIGINT) AS m00,
  CAST(SUM(bit * (j // 8)) AS BIGINT) AS m10,
  CAST(SUM(bit * (j % 8)) AS BIGINT) AS m01,
  CAST(SUM(bit * (j // 8) * (j // 8)) AS BIGINT) AS mxx,
  CAST(SUM(bit * (j % 8) * (j % 8)) AS BIGINT) AS myy,
  CAST(SUM(bit * (j // 8) * (j % 8)) AS BIGINT) AS mxy
FROM phbits GROUP BY i
"""


def q_bilinear_zoom(sf_dir: str):
    """Fixed-point 2x bilinear upsampling (align_corners=False,
    replicate-border clamp) — the interpolation arithmetic the
    block-mean resize never exercises: the 8x8 block-mean grid of
    DECODED pixels upsamples to 16x16 with per-axis weights {1,3}/4,
    kept exact as v16 = 16x the interpolated value (one integer
    matmul W @ bm @ W.T per image). The twin replays every output
    cell from the bit table through an identical two-row-per-index
    weight relation, so clamping, parity weights, and the decode all
    get checked cell-by-cell."""
    from osmray import codecs, oraclefix

    images = oraclefix.load_phash()

    # W[i, k]: weight of input row/col k for output index i
    W = np.zeros((16, 8), dtype=np.int64)
    for i in range(16):
        if i % 2 == 0:
            lo, hi, wlo, whi = i // 2 - 1, i // 2, 1, 3
        else:
            lo, hi, wlo, whi = (i - 1) // 2, (i - 1) // 2 + 1, 3, 1
        W[i, min(max(lo, 0), 7)] += wlo
        W[i, min(max(hi, 0), 7)] += whi

    def stage(batch: pa.Table) -> pa.Table:
        idx = batch["idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        mats = np.stack([
            codecs.png_decode(b)[:, :, 0].astype(np.int64)
            for b in batch["bytes"].to_pylist()])
        bm = mats.reshape(-1, 8, 32, 8, 32).sum(axis=(2, 4)) // 1024
        out = np.einsum("ik,nkl,jl->nij", W, bm, W)  # (n, 16, 16)
        n = out.shape[0]
        r = np.tile(np.repeat(np.arange(16, dtype=np.int64), 16), n)
        c = np.tile(np.tile(np.arange(16, dtype=np.int64), 16), n)
        return pa.table({
            "idx": pa.array(np.repeat(idx, 256)),
            "r": pa.array(r), "c": pa.array(c),
            "v16": pa.array(out.reshape(-1))})

    return images.select_columns(["idx", "bytes"]).map_batches(
        stage, batch_format="pyarrow")


Q_BILINEAR_ZOOM_SQL = f"""
WITH {_PH_CTES},
ax AS (
  SELECT i, least(greatest(k, 0), 7) AS k, wt FROM (
    SELECT r.range AS i,
      CASE WHEN r.range % 2 = 0 THEN r.range // 2 - 1
           ELSE (r.range - 1) // 2 END AS k,
      CASE WHEN r.range % 2 = 0 THEN 1 ELSE 3 END AS wt
    FROM range(0, 16) r
    UNION ALL
    SELECT r.range,
      CASE WHEN r.range % 2 = 0 THEN r.range // 2
           ELSE (r.range - 1) // 2 + 1 END,
      CASE WHEN r.range % 2 = 0 THEN 3 ELSE 1 END
    FROM range(0, 16) r)
),
bm AS (SELECT i AS img, j // 8 AS rb, j % 8 AS cb, 40 + 160 * bit AS v
       FROM phbits)
SELECT bm.img AS idx, ar.i AS r, ac.i AS c,
       CAST(SUM(ar.wt * ac.wt * bm.v) AS BIGINT) AS v16
FROM bm
JOIN ax ar ON ar.k = bm.rb
JOIN ax ac ON ac.k = bm.cb
GROUP BY bm.img, ar.i, ac.i
"""


def q_flow_accum(sf_dir: str):
    """D8 flow accumulation — the hydrology upstream-area raster:
    accum(cell) = number of cells whose drain path passes through it,
    including itself (terrain.flow_accumulation; broadcast engine
    under the cap = one vectorized driver mass-push loop, shuffle
    engine = one bucketed join + one sorted fold per round with O(1)
    driver scalars; the strictly-lower drain rule bounds the rounds).
    The twin counts path memberships over the same recursive drain
    walk as q_watershed."""
    from osmray import terrain

    acc = terrain.flow_accumulation(_d8_cells(sf_dir))

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "accum": batch["accum"].cast(pa.int64())})

    return acc.map_batches(fmt, batch_format="pyarrow")


Q_FLOW_ACCUM_SQL = f"""
WITH RECURSIVE pts AS MATERIALIZED ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS MATERIALIZED (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
d(dx, dy, code) AS (VALUES (-1, -1, 1), (-1, 0, 2), (-1, 1, 3), (0, -1, 4),
                           (0, 1, 5), (1, -1, 6), (1, 0, 7), (1, 1, 8)),
cand AS (
  SELECT cx, cy, z * 16 AS packed, 1 AS selfflag FROM c
  UNION ALL
  SELECT c.cx - d.dx, c.cy - d.dy, c.z * 16 + d.code, 0 FROM c, d
),
d8 AS MATERIALIZED (
  SELECT cx, cy, min(packed) % 16 AS code
  FROM cand GROUP BY cx, cy
  HAVING max(selfflag) = 1),
r AS (
  SELECT cx, cy, cx AS px, cy AS py, code AS pcode FROM d8
  UNION ALL
  SELECT r.cx, r.cy, n.cx, n.cy, n.code
  FROM r
  JOIN d dd ON dd.code = r.pcode
  JOIN d8 n ON n.cx = r.px + dd.dx AND n.cy = r.py + dd.dy
  WHERE r.pcode <> 0
)
SELECT px AS cx, py AS cy, CAST(count(*) AS BIGINT) AS accum
FROM r GROUP BY px, py
"""


def q_sobel_nms(sf_dir: str):
    """Edge detection with non-max suppression (Canny minus the
    hysteresis pass) on DECODED pixels: decode -> exact 32x32
    block-mean grid (the fixture is piecewise constant per block, so
    integer pixel sums // 1024 are exact) -> Sobel gx/gy on the 6x6
    interior -> direction-quantized NMS on the squared magnitude
    (border magnitude = 0; plateau ties keep BOTH cells — non-strict
    compare, same rule in the twin). Actor stage:
    multimodal.SobelNmsStage."""
    from osmray import oraclefix
    from osmray.multimodal import SobelNmsStage

    images = oraclefix.load_phash()
    return images.select_columns(["idx", "bytes"]).map_batches(
        SobelNmsStage, fn_constructor_kwargs={"block_px": 32},
        batch_format="pyarrow", concurrency=4, num_cpus=1)


Q_SOBEL_NMS_SQL = f"""
WITH {_PH_CTES},
bm AS (SELECT i, j // 8 AS rb, j % 8 AS cb, 40 + 160 * bit AS v
       FROM phbits),
g AS (
  SELECT b.i, b.rb, b.cb,
    sum(CASE WHEN n.cb = b.cb + 1
             THEN (CASE WHEN n.rb = b.rb THEN 2 ELSE 1 END) * n.v
             WHEN n.cb = b.cb - 1
             THEN -(CASE WHEN n.rb = b.rb THEN 2 ELSE 1 END) * n.v
             ELSE 0 END) AS gx,
    sum(CASE WHEN n.rb = b.rb + 1
             THEN (CASE WHEN n.cb = b.cb THEN 2 ELSE 1 END) * n.v
             WHEN n.rb = b.rb - 1
             THEN -(CASE WHEN n.cb = b.cb THEN 2 ELSE 1 END) * n.v
             ELSE 0 END) AS gy
  FROM bm b JOIN bm n ON n.i = b.i
    AND abs(n.rb - b.rb) <= 1 AND abs(n.cb - b.cb) <= 1
    AND NOT (n.rb = b.rb AND n.cb = b.cb)
  WHERE b.rb BETWEEN 1 AND 6 AND b.cb BETWEEN 1 AND 6
  GROUP BY b.i, b.rb, b.cb
),
m AS (SELECT i, rb, cb, gx, gy, gx * gx + gy * gy AS m2,
        CASE WHEN abs(gx) >= 2 * abs(gy) THEN 0 ELSE 1 END AS dy1,
        CASE WHEN abs(gx) >= 2 * abs(gy) THEN 1
             WHEN abs(gy) >= 2 * abs(gx) THEN 0
             WHEN gx * gy > 0 THEN 1 ELSE -1 END AS dx1
      FROM g)
SELECT m.i AS idx, m.rb, m.cb,
  CAST(m.gx AS BIGINT) AS gx, CAST(m.gy AS BIGINT) AS gy,
  CAST(m.m2 AS BIGINT) AS m2
FROM m
LEFT JOIN m n1 ON n1.i = m.i AND n1.rb = m.rb + m.dy1
              AND n1.cb = m.cb + m.dx1
LEFT JOIN m n2 ON n2.i = m.i AND n2.rb = m.rb - m.dy1
              AND n2.cb = m.cb - m.dx1
WHERE m.m2 > 0 AND m.m2 >= coalesce(n1.m2, 0)
  AND m.m2 >= coalesce(n2.m2, 0)
"""


def _hashed_string_counts(rows, key_cols: list[str], num_buckets: int = 1024):
    """Exact counts per distinct string tuple at UNBOUNDED vocabulary:
    rows carry block-local pre-aggregated (``*key_cols``, ``cnt``)
    partials plus an int64 string hash ``k`` (stages.hash_str). The
    shuffle key is ``|k| % num_buckets`` — BOUNDED groups, so the
    per-group overhead of Ray's map_groups is paid 1024 times, not
    once per distinct string; each group counts by the FULL strings,
    so hash/bucket collisions only co-locate tuples (balance, never
    correctness). Emits (*key_cols, n). Raise ``num_buckets`` with
    corpus size to keep groups worker-sized."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.set_column(
            batch.schema.get_field_index("k"), "k",
            pa.array(np.abs(k) % num_buckets))

    rows = rows.map_batches(bucket, batch_format="pyarrow")

    def verify(g: pa.Table) -> pa.Table:
        parts = [np.asarray(g[c].to_pylist()) for c in key_cols]
        cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        packed = parts[0] if len(parts) == 1 else np.char.add(
            np.char.add(parts[0], "\x1f"), parts[1])
        order = np.argsort(packed, kind="stable")
        ps = packed[order]
        new = np.concatenate(([True], ps[1:] != ps[:-1]))
        gid = np.cumsum(new) - 1
        n = np.bincount(gid, weights=cnt[order]).astype(np.int64)
        cols = {c: pa.array(p[order][new]) for c, p in zip(key_cols, parts)}
        cols["n"] = pa.array(n)
        return pa.table(cols)

    return rows.groupby("k").map_groups(verify, batch_format="pyarrow")


def _token_block_partials(batch: pa.Table, bigrams: bool) -> pa.Table:
    """Block-local tokenize + pre-aggregate: distinct unigrams (or
    bigrams) with counts, hashed AFTER the local np.unique so the
    per-string Python hash runs on the (vocab-bounded) distinct set,
    never the per-token row stream."""
    from osmray.stages import hash_str

    toks = []
    for text in batch["text"].to_pylist():
        ws = text.split(" ")
        if bigrams:
            toks.extend(f"{a}\x1f{b}" for a, b in zip(ws, ws[1:]))
        else:
            toks.extend(ws)
    if not toks:
        cols = ({"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string())}
                if bigrams else {"w": pa.array([], pa.string())})
        cols["cnt"] = pa.array([], pa.int64())
        cols["k"] = pa.array([], pa.int64())
        return pa.table(cols)
    u, cnt = np.unique(np.asarray(toks), return_counts=True)
    if bigrams:
        sep = np.char.partition(u, "\x1f")
        cols = {"w1": pa.array(sep[:, 0]), "w2": pa.array(sep[:, 2])}
    else:
        cols = {"w": pa.array(u)}
    cols["cnt"] = pa.array(cnt.astype(np.int64))
    cols["k"] = pa.array(hash_str(list(u), 11))
    return pa.table(cols)


def q_collocations(sf_dir: str):
    """Bigram collocation extraction over the corpus — the
    phrase-mining / tokenizer-vocab primitive: exact bigram and
    unigram counts at unbounded vocabulary (block-local np.unique
    partials -> one hashed-key shuffle -> in-group exact string
    counts), unigram counts attached to each surviving bigram, and
    the lift>=2 test expressed as the cross-multiplied INTEGER
    predicate n_xy * N >= 2 * n_x * n_y (no float PMI anywhere, so
    the SQL twin is bit-exact). Unigram attach is two-engine: a
    broadcast dict under ``broadcast_cap`` distinct words, else two
    grace joins keyed by the same string hash with in-bucket
    full-string verification."""
    return _collocations(_read(sf_dir, "documents", ["text"]))


def _collocations(docs, min_count: int = 5, broadcast_cap: int = 2_000_000):
    import pyarrow.compute as pc
    import ray

    from osmray.joins import bucketed_join
    from osmray.stages import hash_str

    uni = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, False),
                         batch_format="pyarrow"), ["w"]).materialize()
    n_tokens = int(sum(r["n"] for r in uni.iter_rows()) or 0) \
        if uni.count() <= 4096 else int(uni.sum("n"))
    big = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, True),
                         batch_format="pyarrow"), ["w1", "w2"])
    big = big.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count))
        .rename_columns(["w1", "w2", "n_xy"]),
        batch_format="pyarrow")

    if uni.count() <= broadcast_cap:
        ref = ray.put({r["w"]: r["n"] for r in uni.iter_rows()})

        def attach(batch: pa.Table) -> pa.Table:
            lut = ray.get(ref)
            w1 = batch["w1"].to_pylist()
            w2 = batch["w2"].to_pylist()
            return batch.append_column(
                "n_x", pa.array([lut[w] for w in w1], pa.int64())
            ).append_column(
                "n_y", pa.array([lut[w] for w in w2], pa.int64()))

        out = big.map_batches(attach, batch_format="pyarrow")
    else:  # keyed path: grace join on the string hash + exact verify
        def key_on(col):
            def add(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "jk", pa.array(hash_str(batch[col].to_pylist(), 11)))
            return add

        uk = uni.map_batches(key_on("w"), batch_format="pyarrow")
        out = bucketed_join(
            big.map_batches(key_on("w1"), batch_format="pyarrow"),
            uk.rename_columns(["w", "n_x", "jk"]), on="jk")
        out = out.map_batches(
            lambda t: t.filter(pc.equal(t["w1"], t["w"]))
            .drop_columns(["w", "jk", "jk_r"]), batch_format="pyarrow")
        out = bucketed_join(
            out.map_batches(key_on("w2"), batch_format="pyarrow"),
            uk.rename_columns(["w", "n_y", "jk"]), on="jk")
        out = out.map_batches(
            lambda t: t.filter(pc.equal(t["w2"], t["w"]))
            .drop_columns(["w", "jk", "jk_r"]), batch_format="pyarrow")

    def finish(batch: pa.Table) -> pa.Table:
        nxy = batch["n_xy"].to_numpy(zero_copy_only=False).astype(np.int64)
        nx = batch["n_x"].to_numpy(zero_copy_only=False).astype(np.int64)
        ny = batch["n_y"].to_numpy(zero_copy_only=False).astype(np.int64)
        lift2 = (nxy * n_tokens >= 2 * nx * ny).astype(np.int64)
        return batch.select(["w1", "w2", "n_xy", "n_x", "n_y"]).append_column(
            "lift2", pa.array(lift2))

    return out.map_batches(finish, batch_format="pyarrow")


Q_COLLOCATIONS_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_tokens FROM uni),
big AS (SELECT ws[idx.i] AS w1, ws[idx.i + 1] AS w2
        FROM toks JOIN idx ON idx.i + 1 <= len(ws)),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy FROM big GROUP BY 1, 2)
SELECT bc.w1, bc.w2, bc.n_xy, u1.n AS n_x, u2.n AS n_y,
       CAST(CASE WHEN bc.n_xy * tot.n_tokens >= 2 * u1.n * u2.n
            THEN 1 ELSE 0 END AS BIGINT) AS lift2
FROM bc JOIN uni u1 ON u1.w = bc.w1 JOIN uni u2 ON u2.w = bc.w2 CROSS JOIN tot
WHERE bc.n_xy >= 5
"""


def q_oov_rate(sf_dir: str):
    """Vocabulary-coverage / UNK-rate screening — the tokenizer-budget
    question "what fraction of each document survives a top-K
    vocabulary": exact corpus word counts (same unbounded-vocab fold
    as q_collocations), top-K=20 by (count desc, word asc) via
    sort+limit (K rows of driver state, bounded by construction), the
    K-word set broadcast once, and one vectorized per-doc membership
    pass. oov_mil is the integer milli-rate floor(n_oov*1e6/n_tokens)
    so the twin compares integers."""
    return oov_rate(_read(sf_dir, "documents", ["doc_id", "text"]), K=20)


def oov_rate(docs, K: int = 20):
    uni = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, False),
                         batch_format="pyarrow"), ["w"])
    top = uni.sort(["n", "w"], descending=[True, False]).limit(K)
    vocab = frozenset(r["w"] for r in top.iter_rows())

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_tok, n_oov = [], []
        for text in batch["text"].to_pylist():
            ws = text.split(" ")
            n_tok.append(len(ws))
            n_oov.append(sum(1 for w in ws if w not in vocab))
        nt = np.asarray(n_tok, np.int64)
        no = np.asarray(n_oov, np.int64)
        return pa.table({
            "doc_id": pa.array(ids), "n_tokens": pa.array(nt),
            "n_oov": pa.array(no),
            "oov_mil": pa.array(no * 1_000_000 // nt)})

    return docs.map_batches(per_doc, batch_format="pyarrow")


Q_OOV_RATE_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
uni AS (SELECT w, count(*) AS n
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
topk AS (SELECT w FROM uni ORDER BY n DESC, w ASC LIMIT 20),
tw AS (SELECT doc_id, unnest(ws) AS w FROM toks),
agg AS (SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN topk.w IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM tw LEFT JOIN topk ON topk.w = tw.w GROUP BY 1)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_mil
FROM agg
"""


def q_kcenter(sf_dir: str):
    """Farthest-point sampling (greedy k-center) over the occupied
    cell set — the diversity-coreset selection primitive for training
    data curation: k=8 rounds, each one full scan computing every
    cell's min squared distance to the chosen set (vectorized against
    the <=k broadcast centers) with a per-block (max d2, then min
    (cx,cy)) partial and an O(#blocks) driver reduce. Driver state is
    the k centers — O(k) regardless of input size; the scan is k
    passes over a once-materialized distinct-cell set. Ties broken
    (d2 desc, cx asc, cy asc) in both engines; all distances are
    exact int64."""
    from osmray import terrain
    from osmray.tableops import sorted_fold_sums

    K = 8
    pts = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]) \
        .map_batches(_li_cell_points, batch_format="pyarrow")

    def block_cells(batch: pa.Table) -> pa.Table:
        cx = batch["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = batch["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(terrain.pack(cx, cy))
        return pa.table({"cell": pa.array(u),
                         "one": pa.array(np.ones(len(u), np.int64))})

    def to_xy(batch: pa.Table) -> pa.Table:
        cx, cy = terrain.unpack(
            batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    cells = (sorted_fold_sums(
        pts.map_batches(block_cells, batch_format="pyarrow"), "cell", ["one"])
        .map_batches(to_xy, batch_format="pyarrow"))
    return kcenter(cells, K)


def kcenter(cells, K: int) -> pa.Table:
    """Greedy k-center over a Dataset of distinct (cx, cy) int cells —
    see q_kcenter for the round structure and determinism rule."""
    cells = cells.materialize()

    def block_min(batch: pa.Table) -> pa.Table:
        cx = batch["cx"].to_numpy(zero_copy_only=False)
        cy = batch["cy"].to_numpy(zero_copy_only=False)
        i = int(np.argmin(cx * 4096 + cy))
        return pa.table({"cx": pa.array([cx[i]]), "cy": pa.array([cy[i]])})

    rows = cells.map_batches(block_min, batch_format="pyarrow",
                             batch_size=None).take_all()
    centers = [min((int(r["cx"]), int(r["cy"])) for r in rows)]
    d2s = [0]
    for _ in range(1, K):
        ccx = np.asarray([c[0] for c in centers], np.int64)
        ccy = np.asarray([c[1] for c in centers], np.int64)

        def block_far(batch: pa.Table, ccx=ccx, ccy=ccy) -> pa.Table:
            cx = batch["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
            cy = batch["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
            d2 = ((cx[:, None] - ccx) ** 2 +
                  (cy[:, None] - ccy) ** 2).min(axis=1)
            i = int(np.lexsort((cx * 4096 + cy, -d2))[0])
            return pa.table({"d2": pa.array([d2[i]]),
                             "cx": pa.array([cx[i]]), "cy": pa.array([cy[i]])})

        parts = cells.map_batches(block_far, batch_format="pyarrow",
                                  batch_size=None).take_all()
        best = min(parts, key=lambda r: (-int(r["d2"]),
                                         int(r["cx"]), int(r["cy"])))
        centers.append((int(best["cx"]), int(best["cy"])))
        d2s.append(int(best["d2"]))
    return pa.table({
        "rnk": pa.array(np.arange(K, dtype=np.int64)),
        "cx": pa.array([c[0] for c in centers], pa.int64()),
        "cy": pa.array([c[1] for c in centers], pa.int64()),
        "d2min": pa.array(d2s, pa.int64())})


def _kcenter_sql(k: int = 8) -> str:
    """Chained-CTE replay of the greedy k-center selection: ci = the
    argmax over cells of the min squared distance to c0..c{i-1},
    ties (d2 desc, cx, cy) — the same deterministic rule the engine
    applies."""
    parts = [
        f"pts AS ({_LI_SQL})",
        "cells AS (SELECT DISTINCT m1 // 262144 AS cx, m2 // 262144 AS cy "
        "FROM pts)",
        "c0 AS (SELECT cx, cy, CAST(0 AS BIGINT) AS d2 FROM cells "
        "ORDER BY cx, cy LIMIT 1)",
    ]
    for i in range(1, k):
        terms = ", ".join(
            f"(c.cx - s{j}.cx)*(c.cx - s{j}.cx) + "
            f"(c.cy - s{j}.cy)*(c.cy - s{j}.cy)" for j in range(i))
        expr = f"least({terms})" if i > 1 else terms
        joins = " ".join(f"CROSS JOIN c{j} s{j}" for j in range(i))
        parts.append(
            f"c{i} AS (SELECT c.cx, c.cy, CAST({expr} AS BIGINT) AS d2 "
            f"FROM cells c {joins} ORDER BY d2 DESC, c.cx, c.cy LIMIT 1)")
    sel = "\nUNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rnk, cx, cy, d2 AS d2min FROM c{i}"
        for i in range(k))
    return "WITH " + ",\n".join(parts) + "\n" + sel


def q_lbp(sf_dir: str):
    """Local-binary-pattern texture histogram over the sparse cell
    DEM (terrain.lbp_histogram): per cell an 8-bit code from sign
    comparisons with its EXISTING D8 neighbors (absent => bit 0),
    then the corpus histogram keyed by (n_nbr, code) — totals scatter
    raw z (the comparison is nonlinear), one bucketed join, two keyed
    folds."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return terrain.lbp_histogram(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"))


# D8_DIRS order with bit weights 2^i — must match terrain.D8_DIRS
_LBP_DIRS_SQL = ("(VALUES (-1,-1,1),(-1,0,2),(-1,1,4),(0,-1,8),"
                 "(0,1,16),(1,-1,32),(1,0,64),(1,1,128)) d(dx, dy, w)")

Q_LBP_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
codes AS (
  SELECT a.cx, a.cy, count(*) AS sup,
         SUM(CASE WHEN b.z > a.z THEN d.w ELSE 0 END) AS code
  FROM c a CROSS JOIN {_LBP_DIRS_SQL}
  JOIN c b ON b.cx = a.cx + d.dx AND b.cy = a.cy + d.dy
  GROUP BY a.cx, a.cy)
SELECT CAST(sup AS BIGINT) AS n_nbr, CAST(code AS BIGINT) AS code,
       CAST(count(*) AS BIGINT) AS n_cells
FROM codes GROUP BY sup, code
"""


def q_laplacian_pyramid(sf_dir: str):
    """Laplacian-pyramid band energies (terrain.laplacian_levels):
    2x2 SUM pooling per level (linear, so partials commute), band
    residual 4*z - z_parent via one bucketed join per level, and the
    per-band scalar triple (n_cells, sum_abs_lap, sum_z) reduced from
    O(#blocks) partials — the multi-scale detail-energy profile of
    the raster."""
    from osmray import terrain

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    return terrain.laplacian_levels(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"), n_levels=2)


Q_LAPLACIAN_PYRAMID_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c0 AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
c1 AS (SELECT cx // 2 AS cx, cy // 2 AS cy, sum(z) AS z FROM c0
       GROUP BY 1, 2),
c2 AS (SELECT cx // 2 AS cx, cy // 2 AS cy, sum(z) AS z FROM c1
       GROUP BY 1, 2),
l0 AS (SELECT CAST(0 AS BIGINT) AS level, count(*) AS n_cells,
              SUM(abs(4 * a.z - b.z)) AS sum_abs_lap, SUM(a.z) AS sum_z
       FROM c0 a JOIN c1 b ON b.cx = a.cx // 2 AND b.cy = a.cy // 2),
l1 AS (SELECT CAST(1 AS BIGINT) AS level, count(*) AS n_cells,
              SUM(abs(4 * a.z - b.z)) AS sum_abs_lap, SUM(a.z) AS sum_z
       FROM c1 a JOIN c2 b ON b.cx = a.cx // 2 AND b.cy = a.cy // 2),
l2 AS (SELECT CAST(2 AS BIGINT) AS level, count(*) AS n_cells,
              SUM(abs(z)) AS sum_abs_lap, SUM(z) AS sum_z FROM c2)
SELECT level, CAST(n_cells AS BIGINT) AS n_cells,
       CAST(sum_abs_lap AS BIGINT) AS sum_abs_lap,
       CAST(sum_z AS BIGINT) AS sum_z
FROM (SELECT * FROM l0 UNION ALL SELECT * FROM l1 UNION ALL
      SELECT * FROM l2)
"""


def q_random_walks(sf_dir: str):
    """Deterministic seeded random walks over the bipartite
    order<->part graph — the node2vec / DeepWalk corpus-generation
    primitive: L=4 steps, step choice = splitmix64(walk_id*1000003 +
    step) taken modulo the current node's degree, resolved against a
    RANKED adjacency (neighbors ordered by id). Ranked adjacency =
    one distinct-edge fold + degree-bounded map_groups; each step is
    two grace joins (frontier->degree, then (node, rank)->neighbor) —
    the frontier is the only thing that moves, O(1) driver state.
    The twin replays the same hash via hash64_ctes and the same
    pmod/rank picks as unrolled CTEs."""
    return _random_walks(sf_dir)


def _random_walks(sf_dir: str, broadcast_cap: int = 4_000_000):
    import pyarrow.compute as pc

    from osmray.joins import bucketed_join
    from osmray.stages import hash64
    from osmray.tableops import sorted_fold_sums

    L, SEED = 4, 5
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edge_partials(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        u = 2 * o[sel]
        v = 2 * p[sel] + 1
        uu = np.concatenate((u, v))
        vv = np.concatenate((v, u))
        k = np.unique(uu * (1 << 32) + vv)
        return pa.table({"k": pa.array(k),
                         "one": pa.array(np.ones(len(k), np.int64))})

    ek = sorted_fold_sums(
        ds.map_batches(edge_partials, batch_format="pyarrow"), "k", ["one"])

    def unpack_edges(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"u": pa.array(k >> 32),
                         "v": pa.array(k & 0xFFFFFFFF)})

    def rank_group(g: pa.Table) -> pa.Table:
        v = np.sort(g["v"].to_numpy(zero_copy_only=False).astype(np.int64))
        u = int(g["u"][0].as_py())
        deg = len(v)
        if deg >= 1 << 20:
            raise RuntimeError(f"degree {deg} exceeds the 2^20 rank-pack "
                               f"cap at node {u}; raise the pack width")
        r = np.arange(deg, dtype=np.int64)
        return pa.table({
            "ak": pa.array(u * (1 << 20) + r), "v": pa.array(v),
            "u": pa.array(np.full(deg, u, np.int64)),
            "r": pa.array(r),
            "deg": pa.array(np.full(deg, deg, np.int64))})

    adj = (ek.map_batches(unpack_edges, batch_format="pyarrow")
           .groupby("u").map_groups(rank_group, batch_format="pyarrow")
           .materialize())
    deg = adj.map_batches(
        lambda t: t.filter(pc.equal(t["r"], 0)).select(["u", "deg"]),
        batch_format="pyarrow")
    adj_kv = adj.select_columns(["ak", "v"])

    def seed_rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu = u[(u % 2 == 0) & ((u // 2) % 400 == 1)]
        return pa.table({"walk_id": pa.array(uu), "node": pa.array(uu)})

    seeds = deg.map_batches(seed_rows, batch_format="pyarrow")

    def step_table(ds_f, i: int) -> pa.Table:
        return ds_f.map_batches(
            lambda t, i=i: pa.table({
                "walk_id": t["walk_id"].cast(pa.int64()),
                "step": pa.array(np.full(len(t), i, np.int64)),
                "node": t["node"].cast(pa.int64())}),
            batch_format="pyarrow")

    # two-engine policy (as in osmray/graph.py): a bounded adjacency
    # broadcasts once as CSR arrays and every seed batch walks all L
    # steps vectorized in ONE task pass; above the cap the frontier
    # advances through two grace joins per step (O(1) driver state).
    if adj.count() <= broadcast_cap:
        import ray as _ray

        at = adj.sort("ak").select_columns(["ak", "v", "deg"]).to_pandas()
        ak = at["ak"].to_numpy().astype(np.int64)
        av = at["v"].to_numpy().astype(np.int64)
        adeg = at["deg"].to_numpy().astype(np.int64)
        ref = _ray.put((ak, av, adeg))

        def walk_all(batch: pa.Table) -> pa.Table:
            ak, av, adeg = _ray.get(ref)
            w = batch["walk_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            cur = batch["node"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            ws, ss, ns = [w], [np.zeros(len(w), np.int64)], [cur]
            for i in range(1, L + 1):
                base = np.searchsorted(ak, cur * (1 << 20))
                r = hash64(w * 1000003 + i, SEED) % adeg[base]
                cur = av[base + r]
                ws.append(w)
                ss.append(np.full(len(w), i, np.int64))
                ns.append(cur)
            return pa.table({
                "walk_id": pa.array(np.concatenate(ws)),
                "step": pa.array(np.concatenate(ss)),
                "node": pa.array(np.concatenate(ns))})

        return seeds.map_batches(walk_all, batch_format="pyarrow")

    outs = [step_table(seeds, 0)]
    frontier = seeds
    for i in range(1, L + 1):
        fd = bucketed_join(frontier, deg, on="node", right_on="u",
                           num_buckets=8)

        def pick(batch: pa.Table, i=i) -> pa.Table:
            w = batch["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            dg = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            r = hash64(w * 1000003 + i, SEED) % dg  # numpy %: pmod
            return pa.table({"walk_id": pa.array(w),
                             "ak": pa.array(n * (1 << 20) + r)})

        fn = bucketed_join(
            fd.map_batches(pick, batch_format="pyarrow"), adj_kv,
            on="ak", num_buckets=8)
        frontier = fn.map_batches(
            lambda t: pa.table({"walk_id": t["walk_id"].cast(pa.int64()),
                                "node": t["v"].cast(pa.int64())}),
            batch_format="pyarrow")
        outs.append(step_table(frontier, i))
    return outs[0].union(*outs[1:])


def _random_walks_sql(L: int = 4, seed: int = 5) -> str:
    parts = [
        "e0 AS (SELECT DISTINCT 2*l_orderkey AS u, 2*l_partkey+1 AS v "
        "FROM lineitem WHERE l_orderkey%40=1 AND l_partkey%5=0)",
        "ed AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0)",
        "adj AS (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v)"
        " - 1 AS r, count(*) OVER (PARTITION BY u) AS deg FROM ed)",
        "s0 AS (SELECT u AS walk_id, CAST(0 AS BIGINT) AS step, u AS node "
        "FROM (SELECT DISTINCT u FROM ed WHERE u % 2 = 0 "
        "AND (u // 2) % 400 = 1))",
    ]
    for i in range(1, L + 1):
        parts.append(hash64_ctes(
            f"h{i}", f"s{i-1}", "walk_id, node",
            f"walk_id * 1000003 + {i}", seed).strip())
        parts.append(
            f"s{i} AS (SELECT h.walk_id, CAST({i} AS BIGINT) AS step, "
            f"a.v AS node FROM h{i}5 h JOIN adj a ON a.u = h.node "
            f"AND a.r = ((h.h % a.deg) + a.deg) % a.deg)")
    sel = "\nUNION ALL ".join(
        f"SELECT walk_id, step, node FROM s{i}" for i in range(L + 1))
    return "WITH " + ",\n".join(parts) + "\n" + sel


def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty — the "how much of this doc is
    unique text" curation score: corpus-wide token-trigram counts,
    then per doc the number of its trigrams that occur EXACTLY ONCE
    in the whole corpus. The join back to documents is avoided by an
    owner trick: a count-1 trigram has exactly one occurrence, so the
    counting fold also carries min(doc_id) per gram and novel counts
    group directly by that owner — one hashed-key shuffle + one small
    keyed fold, no doc<->gram join anywhere. n_trigrams comes from a
    stateless per-doc pass; the two attach with one left grace join
    (docs with zero novel grams keep 0)."""
    from osmray.joins import bucketed_join
    from osmray.stages import hash_str

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gs, ds_ = [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            ws = text.split(" ")
            gs.extend(f"{a}\x1f{b}\x1f{c}"
                      for a, b, c in zip(ws, ws[1:], ws[2:]))
            ds_.extend([did] * max(len(ws) - 2, 0))
        if not gs:
            return pa.table({"k": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "mdoc": pa.array([], pa.int64())})
        garr = np.asarray(gs)
        darr = np.asarray(ds_, np.int64)
        order = np.argsort(garr, kind="stable")
        gsrt, dsrt = garr[order], darr[order]
        new = np.concatenate(([True], gsrt[1:] != gsrt[:-1]))
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid).astype(np.int64)
        mdoc = np.full(len(cnt), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mdoc, gid, dsrt)
        u = gsrt[new]
        return pa.table({"k": pa.array(hash_str(list(u), 13)),
                         "g": pa.array(u), "cnt": pa.array(cnt),
                         "mdoc": pa.array(mdoc)})

    def verify(g: pa.Table) -> pa.Table:
        gr = np.asarray(g["g"].to_pylist())
        cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        md = g["mdoc"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(gr, kind="stable")
        gs, cs, ms = gr[order], cnt[order], md[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        gid = np.cumsum(new) - 1
        n = np.bincount(gid, weights=cs).astype(np.int64)
        mm = np.full(len(n), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mm, gid, ms)
        novel = n == 1
        # per-owner novel-gram partial counts (gram strings stop here)
        u, inv = np.unique(mm[novel], return_inverse=True)
        return pa.table({
            "doc_id": pa.array(u),
            "novel": pa.array(np.bincount(inv).astype(np.int64))})

    from osmray.tableops import sorted_fold_sums

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.set_column(
            batch.schema.get_field_index("k"), "k",
            pa.array(np.abs(k) % 1024))

    # bucketed shuffle key (see _hashed_string_counts): bounded groups,
    # in-group exact full-string counting
    grams = docs.map_batches(gram_partials, batch_format="pyarrow") \
        .map_batches(bucket, batch_format="pyarrow")
    nov = sorted_fold_sums(
        grams.groupby("k").map_groups(verify, batch_format="pyarrow"),
        "doc_id", ["novel"])

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = np.asarray([max(len(t.split(" ")) - 2, 0)
                         for t in batch["text"].to_pylist()], np.int64)
        return pa.table({"doc_id": pa.array(ids), "n_trigrams": pa.array(nt)})

    base = docs.map_batches(per_doc, batch_format="pyarrow")
    joined = bucketed_join(base, nov, on="doc_id", num_buckets=8, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nt = batch["n_trigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nv = pc.fill_null(batch["novel"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_trigrams": pa.array(nt),
            "n_novel": pa.array(nv),
            "novel_mil": pa.array(
                np.where(nt > 0, nv * 1_000_000 // np.maximum(nt, 1), 0))})

    return joined.map_batches(finish, batch_format="pyarrow")


Q_NGRAM_NOVELTY_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
tg AS (SELECT doc_id, ws[idx.i] || chr(31) || ws[idx.i + 1] || chr(31) ||
              ws[idx.i + 2] AS g
       FROM toks JOIN idx ON idx.i + 2 <= len(ws)),
gc AS (SELECT g, count(*) AS n, min(doc_id) AS owner FROM tg GROUP BY g),
nov AS (SELECT owner AS doc_id, CAST(count(*) AS BIGINT) AS n_novel
        FROM gc WHERE n = 1 GROUP BY 1),
base AS (SELECT doc_id,
                CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_trigrams
         FROM toks)
SELECT b.doc_id, b.n_trigrams, COALESCE(nov.n_novel, 0) AS n_novel,
       CAST(CASE WHEN b.n_trigrams > 0
            THEN COALESCE(nov.n_novel, 0) * 1000000 // b.n_trigrams
            ELSE 0 END AS BIGINT) AS novel_mil
FROM base b LEFT JOIN nov ON nov.doc_id = b.doc_id
"""


def q_graph_voronoi(sf_dir: str):
    """Graph Voronoi / catchment assignment: every reachable node
    labeled with its NEAREST seed (weighted distance; ties -> the
    smaller seed id) — the isochrone-assignment primitive. Runs as
    plain ``graph.sssp`` on a packed lexicographic state: pd =
    dist * 2^32 + seed, a super-source node 0 feeding each seed s an
    edge of weight s (dist 0, seed s), and real edges re-weighted
    w * 2^32 — the min-fold over pd IS nearest-seed-then-min-id, so
    the whole op inherits sssp's two-engine policy and round bounds
    unchanged. Same bounded fixture graph and dist cap (24) as
    q_sssp."""
    from osmray.graph import sssp

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    SHIFT = 1 << 32

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        u = 2 * o[sel]
        v = 2 * p[sel] + 1
        k = np.unique(u * SHIFT + v)
        uu, vv = k // SHIFT, k % SHIFT
        us = np.concatenate((uu, vv))
        vs = np.concatenate((vv, uu))
        w = (1 + (us * 3 + vs * 5) % 7) * SHIFT
        # super-source 0 -> seed s with weight s packs (dist 0, seed s)
        seed_mask = (us % 34 == 2) & (us % 2 == 0)
        sv = np.unique(us[seed_mask])
        return pa.table({
            "u": pa.array(np.concatenate((us, np.zeros(len(sv), np.int64)))),
            "v": pa.array(np.concatenate((vs, sv))),
            "w": pa.array(np.concatenate((w, sv)))})

    import ray.data as _rd

    out = sssp(ds.map_batches(edges, batch_format="pyarrow"),
               _rd.from_items([{"node": 0}]),
               max_dist=25 * SHIFT - 1)

    def decode(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        pd_ = batch["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = node != 0
        return pa.table({
            "node": pa.array(node[keep]),
            "dist": pa.array(pd_[keep] // SHIFT),
            "seed": pa.array(pd_[keep] % SHIFT)})

    return out.map_batches(decode, batch_format="pyarrow")


Q_GRAPH_VORONOI_SQL = """
WITH RECURSIVE raw AS (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
e AS (
  SELECT u, v, 1 + (u * 3 + v * 5) % 7 AS w FROM raw
  UNION SELECT v, u, 1 + (v * 3 + u * 5) % 7 FROM raw
),
r(node, pd) AS (
  SELECT DISTINCT u AS node, CAST(u AS BIGINT) AS pd
  FROM raw WHERE u % 34 = 2
  UNION
  SELECT e.v, r.pd + e.w * 4294967296 FROM r JOIN e ON e.u = r.node
  WHERE r.pd // 4294967296 + e.w <= 24
)
SELECT node, CAST(min(pd) // 4294967296 AS BIGINT) AS dist,
       CAST(min(pd) % 4294967296 AS BIGINT) AS seed
FROM r GROUP BY node
"""


def q_semdedup(sf_dir: str):
    """SemDeDup-style semantic deduplication over embeddings: the
    spherical k-means quantizer (ann.kmeans_fit — the exact fit the
    q_ivf_ann twin replays) partitions the corpus; each cluster's
    REPRESENTATIVE is its max-cosine-to-centroid vector (ties -> min
    vec_id, via per-block partial argmax + an O(#blocks x k) driver
    reduce); every vector then scores against its cluster's broadcast
    representative and keep = (is-rep OR cos_rep_mil < 450). Driver
    state is k=16 reps; the corpus streams through two stateless
    passes. Float note: like q_ivf_ann/q_embedding_dups, cosines are
    milli-quantized and the ranking margins are re-checked at sf0.1."""
    import ray

    from osmray.ann import _norm_rows, kmeans_fit

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(emb, n_centroids=16, n_iters=3)
    cref = ray.put(cent)

    def block_best(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = _norm_rows(np.asarray(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        sims = E @ c.T
        lid = np.argmax(sims, axis=1)  # first max == smallest list_id
        s = sims[np.arange(len(ids)), lid]
        rows = []
        for li in np.unique(lid):
            m = lid == li
            # max sim, tie -> min vec_id
            order = np.lexsort((ids[m], -s[m]))
            j = np.flatnonzero(m)[order[0]]
            rows.append((int(li), int(ids[j]), float(s[j]), E[j].tolist()))
        li_, id_, s_, e_ = zip(*rows) if rows else ((), (), (), ())
        return pa.table({
            "list_id": pa.array(li_, pa.int64()),
            "vec_id": pa.array(id_, pa.int64()),
            "sim": pa.array(s_, pa.float64()),
            "e": pa.array(list(e_), pa.list_(pa.float64()))})

    parts = emb.map_batches(block_best, batch_format="pyarrow",
                            batch_size=None).take_all()
    best: dict[int, tuple] = {}
    for r in parts:
        key = (-r["sim"], r["vec_id"])
        if r["list_id"] not in best or key < best[r["list_id"]][0]:
            best[r["list_id"]] = (key, r["vec_id"], np.asarray(r["e"]))
    rep_id = {li: v[1] for li, v in best.items()}
    rep_vec = {li: v[2] for li, v in best.items()}
    rid_arr = np.full(16, -1, np.int64)
    rvec_arr = np.zeros((16, cent.shape[1]), np.float64)
    for li, rid in rep_id.items():
        rid_arr[li] = rid
        rvec_arr[li] = rep_vec[li]
    rref = ray.put((rid_arr, rvec_arr))

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        rid_arr, rvec_arr = ray.get(rref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        E = _norm_rows(np.asarray(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        lid = np.argmax(E @ c.T, axis=1).astype(np.int64)
        cosr = np.einsum("ij,ij->i", E, rvec_arr[lid])
        mil = np.floor(cosr * 1000.0 + 0.5).astype(np.int64)
        keep = ((ids == rid_arr[lid]) | (mil < 450)).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids), "list_id": pa.array(lid),
            "rep_id": pa.array(rid_arr[lid]),
            "cos_rep_mil": pa.array(mil), "keep": pa.array(keep)})

    return emb.map_batches(score, batch_format="pyarrow")


def _semdedup_sql(n_centroids: int = 16, n_iters: int = 3,
                  dim: int = 64, tau_mil: int = 450) -> str:
    parts = _ivf_fit_ctes(n_centroids, n_iters, dim)
    n = n_iters
    parts.append(f"""reps AS MATERIALIZED (
  SELECT list_id, vec_id AS rep_id, e AS re FROM (
    SELECT a.list_id, a.vec_id, a.e,
      ROW_NUMBER() OVER (PARTITION BY a.list_id
        ORDER BY list_dot_product(a.e, c.c) DESC, a.vec_id) AS rn
    FROM assign a JOIN cent{n} c USING (list_id)
  ) WHERE rn = 1
)""")
    return ",\n".join(parts) + f"""
SELECT a.vec_id, CAST(a.list_id AS BIGINT) AS list_id, r.rep_id,
  CAST(floor(list_dot_product(a.e, r.re) * 1000 + 0.5) AS BIGINT)
    AS cos_rep_mil,
  CAST(CASE WHEN a.vec_id = r.rep_id
       OR floor(list_dot_product(a.e, r.re) * 1000 + 0.5) < {tau_mil}
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM assign a JOIN reps r USING (list_id)
"""


def q_seq_packing(sf_dir: str):
    """Deterministic sequence packing for training shards: within
    each source (the natural shard key — the partition a real
    pipeline packs independently), docs in doc_id order fill
    128-token sequences greedily (next doc overflows -> new
    sequence); emits (doc_id, source, seq_id, off_tokens). The fold
    is a true reset-on-overflow scan (not associative, so no
    parallel prefix): one keyed shuffle, one vectorizable-order pass
    per group, O(group) state — per-shard packing is exactly how
    this runs at scale. The twin replays the scan as a recursive
    CTE stepping the per-source row index."""
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    C = 128

    def tok_counts(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "source": batch["source"],
            "t": pa.array([len(t.split(" "))
                           for t in batch["text"].to_pylist()], pa.int64())})

    def pack_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = g["t"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, t = ids[order], t[order]
        bins = np.empty(len(ids), np.int64)
        offs = np.empty(len(ids), np.int64)
        b, cur = 0, 0
        for i in range(len(ids)):
            if cur + t[i] > C:
                b += 1
                cur = 0
            offs[i] = cur
            bins[i] = b
            cur += t[i]
        return pa.table({
            "doc_id": pa.array(ids),
            "source": pa.array([g["source"][0].as_py()] * len(ids)),
            "seq_id": pa.array(bins), "off_tokens": pa.array(offs)})

    return (docs.map_batches(tok_counts, batch_format="pyarrow")
            .groupby("source").map_groups(pack_group,
                                          batch_format="pyarrow"))


Q_SEQ_PACKING_SQL = """
WITH RECURSIVE base AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS i
  FROM documents),
r(source, i, doc_id, t, bin, cur) AS (
  SELECT source, i, doc_id, t, CAST(0 AS BIGINT), t FROM base WHERE i = 1
  UNION ALL
  SELECT b.source, b.i, b.doc_id, b.t,
         CASE WHEN r.cur + b.t > 128 THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.cur + b.t > 128 THEN b.t ELSE r.cur + b.t END
  FROM r JOIN base b ON b.source = r.source AND b.i = r.i + 1
)
SELECT doc_id, source, CAST(bin AS BIGINT) AS seq_id,
       CAST(cur - t AS BIGINT) AS off_tokens
FROM r
"""


def q_embedding_stats(sf_dir: str):
    """Per-dimension feature statistics over the embedding corpus —
    the normalization/whitening profile a feature store computes:
    each element quantizes to milli-units FIRST (floor(x*1000+0.5) on
    the float32->float64 value, identical in both engines), then
    integer count/sum/sumsq/min/max fold per dimension — quantize-
    then-sum is order-independent, so the hash is exact with no float
    luck. One pass of 64-row per-block partials + one bounded fold."""
    from osmray.tableops import sorted_fold

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partials(batch: pa.Table) -> pa.Table:
        E = np.asarray(batch["embedding"].to_pylist(), dtype=np.float64)
        q = np.floor(E * 1000.0 + 0.5).astype(np.int64)
        dim = q.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, dim + 1, dtype=np.int64)),
            "n": pa.array(np.full(dim, q.shape[0], np.int64)),
            "sum_q": pa.array(q.sum(axis=0)),
            "sumsq_q": pa.array((q * q).sum(axis=0)),
            "min_q": pa.array(q.min(axis=0)),
            "max_q": pa.array(q.max(axis=0))})

    return sorted_fold(
        emb.map_batches(partials, batch_format="pyarrow"),
        "dim", ["n", "sum_q", "sumsq_q", "min_q", "max_q"],
        ["sum", "sum", "sum", "min", "max"])


Q_EMBEDDING_STATS_SQL = """
WITH el AS (
  SELECT g.pos AS dim,
         CAST(floor(CAST(e.embedding[g.pos] AS DOUBLE) * 1000 + 0.5)
              AS BIGINT) AS q
  FROM embeddings e
  CROSS JOIN (SELECT CAST(range AS INT) AS pos FROM range(1, 65)) g
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(q) AS BIGINT) AS sum_q,
       CAST(sum(q * q) AS BIGINT) AS sumsq_q,
       CAST(min(q) AS BIGINT) AS min_q, CAST(max(q) AS BIGINT) AS max_q
FROM el GROUP BY dim
"""


def q_containment(sf_dir: str):
    """Directional containment self-join (quote / excerpt detection —
    the asymmetric sibling of q_jaccard_join): pairs (a, b) whose
    word-trigram shingle sets satisfy |Ta ∩ Tb| >= 0.8|Ta|, via
    simjoin.containment_join (asymmetric prefix filter: probe-side
    prefixes vs full posting lists, all-integer verify). Random docs
    share almost no trigrams, so every doc_id % 10 == 0 doc also
    yields a PLANTED half-length snippet (id + 10_000_000) whose
    trigram set is contained in its source by construction — the
    derivation is pure SQL, so the twin plants the identical rows.
    Docs are modulus-capped like q_jaccard_join (quadratic twin)."""
    from osmray.simjoin import containment_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    m = max(1, ds.count() // 700)

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = ids % m == 0
        ids = ids[sel]
        texts = [t for t, s in zip(batch["text"].to_pylist(), sel) if s]
        out_id, out_t = [], []
        for did, t in zip(ids, texts):
            ws = _WORD_RE.findall(t.lower())
            out_id.append(int(did))
            out_t.append(sorted({f"{ws[i]}_{ws[i + 1]}_{ws[i + 2]}"
                                 for i in range(len(ws) - 2)}))
            if did % 10 == 0:
                half = ws[:(len(ws) + 1) // 2]
                out_id.append(int(did) + 10_000_000)
                out_t.append(sorted({
                    f"{half[i]}_{half[i + 1]}_{half[i + 2]}"
                    for i in range(len(half) - 2)}))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "toks": pa.array(out_t, pa.list_(pa.string()))})

    tok_ds = ds.map_batches(toks, batch_format="pyarrow")
    return containment_join(tok_ds, "doc_id", "toks", t_num=4, t_den=5)


Q_CONTAINMENT_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % (SELECT greatest(1, count(*) // 700) FROM documents) = 0
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM d
),
wu AS (
  SELECT doc_id, ws FROM w
  UNION ALL
  SELECT doc_id + 10000000, ws[1:(len(ws) + 1) // 2] FROM w
  WHERE doc_id % 10 = 0
),
big AS (
  SELECT doc_id,
         list_distinct([ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2]
                        FOR i IN range(1, len(ws) - 1)]) AS toks
  FROM wu
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM big WHERE len(toks) > 0),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter,
         CAST(a.n AS BIGINT) AS na, CAST(b.n AS BIGINT) AS nb
  FROM s a JOIN s b ON a.doc_id <> b.doc_id
)
SELECT a, b, inter, na, nb FROM p WHERE 5 * inter >= 4 * na
"""


def q_mixture(sf_dir: str):
    """Deterministic dataset-mixture rebalancing: every source
    downsamples toward the smallest source's count by hash
    thresholding — keep doc iff pmod(splitmix64(doc_id), 1e6) <
    n_min * 1e6 // n_s. Stateless given the per-source counts (one
    tiny aggregate, sources are few), repartition-independent,
    resumable (the keep decision is a pure function of the row), and
    the exact op a mixture-weighted training exporter runs. Twin
    replays the hash via hash64_ctes."""
    from osmray.stages import hash64

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    counts = {r["source"]: r["count()"]
              for r in docs.groupby("source").count().take_all()}
    n_min = min(counts.values())
    rate = {s: n_min * 1_000_000 // (2 * n) for s, n in counts.items()}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch["source"].to_pylist()
        h = hash64(ids, 21)
        r = ((h % 1_000_000) + 1_000_000) % 1_000_000
        thr = np.asarray([rate[s] for s in src], np.int64)
        m = r < thr
        return pa.table({
            "doc_id": pa.array(ids[m]),
            "source": pa.array([s for s, k in zip(src, m) if k])})

    return docs.map_batches(keep, batch_format="pyarrow")


def _mixture_sql(seed: int = 21) -> str:
    return f"""
WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
mn AS (SELECT min(n) AS n_min FROM counts),
rates AS (SELECT source, (SELECT n_min FROM mn) * 1000000 // (2 * n) AS rate
          FROM counts),
docs AS (SELECT doc_id, source FROM documents),
{hash64_ctes('mh', 'docs', 'doc_id, source', 'doc_id', seed).strip().lstrip(',')}
SELECT d.doc_id, d.source
FROM mh5 d JOIN rates r ON r.source = d.source
WHERE ((d.h % 1000000) + 1000000) % 1000000 < r.rate
"""


def q_interarrival(sf_dir: str):
    """Per-user inter-arrival burstiness moments — the bot/anomaly
    screening feature: per user the ts-ordered gaps (SECONDS —
    floor(us diff / 1e6); event_id tie-break), emitted as exact
    integer count/sum/sumsq/min/max so variance and CV derive at the
    edge without float order effects (second granularity keeps the
    squares inside int64 at any realistic fan-in). Few-fat-keys regime (same as q_sessionize): one
    keyed shuffle, vectorized per-group diff."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        gaps = np.diff(tv[order]) // 1_000_000
        if len(gaps) == 0:
            gaps = np.array([], np.int64)
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_gaps": pa.array([len(gaps)], pa.int64()),
            "sum_gap": pa.array([int(gaps.sum())], pa.int64()),
            "sumsq_gap": pa.array([int((gaps * gaps).sum())], pa.int64()),
            "min_gap": pa.array([int(gaps.min()) if len(gaps) else 0],
                                pa.int64()),
            "max_gap": pa.array([int(gaps.max()) if len(gaps) else 0],
                                pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


Q_INTERARRIVAL_SQL = """
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap
  FROM events
)
SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(COALESCE(sum(gap), 0) AS BIGINT) AS sum_gap,
       CAST(COALESCE(sum(gap * gap), 0) AS BIGINT) AS sumsq_gap,
       CAST(COALESCE(min(gap), 0) AS BIGINT) AS min_gap,
       CAST(COALESCE(max(gap), 0) AS BIGINT) AS max_gap
FROM e GROUP BY user_id
"""


def q_decayed_counts(sf_dir: str):
    """Time-decayed activity counts per (user, day-bucket recency):
    each event contributes weight 2^(40 - min(age_days, 40)) —
    EXACT integer exponential decay (half-life = one day),
    so the decayed scores fold additively in one keyed pass and the
    hash needs no float argument. The watermark (max ts) is one tiny
    aggregate; weights are pure functions of the row after it."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    DAY = 86_400_000_000

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"].cast(pa.int64()),
            "us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())})

    us_ds = ds.map_batches(to_us, batch_format="pyarrow").materialize()
    hi = us_ds.max("us")

    def weigh(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch["us"].to_numpy(zero_copy_only=False).astype(np.int64)
        age = (hi - us) // DAY
        K = 40  # cap: max weight 2^40, so ~8M max-weight
        # events per user still fit int64
        w = np.int64(1) << np.maximum(K - np.minimum(age, K), 0)
        from osmray.queries import _keyed_sums  # self-module partial
        return _keyed_sums(u, {"decayed": w, "n": np.ones(len(u), np.int64)},
                           "user_id")

    from osmray.tableops import sorted_fold_sums
    parts = us_ds.map_batches(weigh, batch_format="pyarrow")
    out = sorted_fold_sums(parts, "user_id", ["cnt", "decayed", "n"])
    return out.map_batches(
        lambda t: t.select(["user_id", "decayed", "n"]),
        batch_format="pyarrow")


Q_DECAYED_COUNTS_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
hi AS (SELECT max(us) AS hi FROM e),
w AS (
  SELECT user_id,
         CAST(1 AS BIGINT) << greatest(
           40 - least((hi.hi - us) // 86400000000, 40), 0) AS w
  FROM e CROSS JOIN hi
)
SELECT user_id, CAST(sum(w) AS BIGINT) AS decayed,
       CAST(count(*) AS BIGINT) AS n
FROM w GROUP BY user_id
"""


def q_two_hop(sf_dir: str):
    """Distinct 2-hop neighborhood size per node (friends-of-friends
    — the graph feature-engineering staple) over the bounded
    bipartite fixture graph: one grace self-join edge->edge, then a
    distinct (node, 2hop-neighbor) fold; self excluded, direct
    neighbors counted separately so the twin checks both rings."""
    return _two_hop(sf_dir)


def _two_hop(sf_dir: str, broadcast_cap: int = 4_000_000):
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def edges(batch: pa.Table) -> pa.Table:
        o = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (o % 40 == 1) & (p % 5 == 0)
        u = 2 * o[sel]
        v = 2 * p[sel] + 1
        k = np.unique(u * (1 << 32) + v)
        uu, vv = k >> 32, k & 0xFFFFFFFF
        return pa.table({"u": pa.array(np.concatenate((uu, vv))),
                         "v": pa.array(np.concatenate((vv, uu)))})

    e = ds.map_batches(edges, batch_format="pyarrow").materialize()

    # ring 2: e(u, m) x e(m, w), distinct (u, w), w != u, (u, w) not a
    # direct edge. Two-engine (the graph.py policy): bounded edge sets
    # broadcast as CSR arrays, each edge block expands its second hop
    # in-task, ring-1 counts come straight off the driver-held sorted
    # key set, and n2 attaches by dict (ONE keyed fold total); above
    # the cap: keyed folds + one grace self-join + anti-filter + left
    # grace join.
    if e.count() <= broadcast_cap:
        import ray as _ray

        et = e.to_pandas()
        eu = et["u"].to_numpy().astype(np.int64)
        ev = et["v"].to_numpy().astype(np.int64)
        order = np.lexsort((ev, eu))
        eu, ev = eu[order], ev[order]
        ek_sorted = np.unique(eu * (1 << 32) + ev)
        ref = _ray.put((eu, ev, ek_sorted))

        def pairs2_bc(batch: pa.Table) -> pa.Table:
            eu, ev, ek_sorted = _ray.get(ref)
            u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            lo = np.searchsorted(eu, m, "left")
            hi = np.searchsorted(eu, m, "right")
            cnt = hi - lo
            src = np.repeat(u, cnt)
            idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(lo, hi)]) \
                if len(lo) else np.array([], np.int64)
            w = ev[idx]
            keep = src != w
            k = np.unique(src[keep] * (1 << 32) + w[keep])
            pos = np.searchsorted(ek_sorted, k)
            direct = (pos < len(ek_sorted)) & (ek_sorted[
                np.minimum(pos, len(ek_sorted) - 1)] == k)
            k = k[~direct]
            return pa.table({"k": pa.array(k),
                             "one": pa.array(np.ones(len(k), np.int64))})

        ring2 = sorted_fold_sums(
            e.map_batches(pairs2_bc, batch_format="pyarrow"), "k", ["one"])

        def n2_partial(batch: pa.Table) -> pa.Table:
            k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
            uu, cnt = np.unique(k >> 32, return_counts=True)
            return pa.table({"node": pa.array(uu),
                             "n2": pa.array(cnt.astype(np.int64))})

        n2_rows = ring2.map_batches(
            n2_partial, batch_format="pyarrow").take_all()
        n2_map: dict[int, int] = {}
        for r in n2_rows:  # a node can appear in 2 adjacent partials
            n2_map[r["node"]] = n2_map.get(r["node"], 0) + r["n2"]
        nodes, n1c = np.unique(ek_sorted >> 32, return_counts=True)
        return pa.table({
            "node": pa.array(nodes),
            "n1": pa.array(n1c.astype(np.int64)),
            "n2": pa.array([n2_map.get(int(n), 0) for n in nodes],
                           pa.int64())})

    # keyed engine above the cap: distinct-edge fold for ring 1, one
    # grace self-join for ring 2, keyed anti-filter, left grace join
    def d1(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.unique(u * (1 << 32) + v)
        return pa.table({"k": pa.array(k),
                         "one": pa.array(np.ones(len(k), np.int64))})

    ring1 = sorted_fold_sums(
        e.map_batches(d1, batch_format="pyarrow"), "k", ["one"])

    def n1_counts(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(k >> 32, return_counts=True)
        return pa.table({"node": pa.array(uu),
                         "n1": pa.array(cnt.astype(np.int64))})

    n1 = sorted_fold_sums(
        ring1.map_batches(n1_counts, batch_format="pyarrow"),
        "node", ["n1"])

    j = bucketed_join(e, e.rename_columns(["m", "w"]), on="v",
                      right_on="m", num_buckets=8)

    def pairs2(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = u != w
        k = np.unique(u[m] * (1 << 32) + w[m])
        return pa.table({"k": pa.array(k),
                         "one": pa.array(np.ones(len(k), np.int64))})

    cand2 = sorted_fold_sums(
        j.map_batches(pairs2, batch_format="pyarrow"), "k", ["one"])
    from osmray.joins import bucketed_filter
    ring2 = bucketed_filter(cand2, ring1, on="k", anti=True)

    def n2_counts(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        uu, cnt = np.unique(k >> 32, return_counts=True)
        return pa.table({"node": pa.array(uu),
                         "n2": pa.array(cnt.astype(np.int64))})

    n2 = sorted_fold_sums(
        ring2.map_batches(n2_counts, batch_format="pyarrow"),
        "node", ["n2"])
    out = bucketed_join(n1, n2, on="node", num_buckets=8, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "node": batch["node"].cast(pa.int64()),
            "n1": batch["n1"].cast(pa.int64()),
            "n2": pc.fill_null(batch["n2"].combine_chunks().cast(pa.int64()),
                               0)})

    return out.map_batches(finish, batch_format="pyarrow")


Q_TWO_HOP_SQL = """
WITH raw AS (
  SELECT DISTINCT 2 * l_orderkey AS u, 2 * l_partkey + 1 AS v
  FROM lineitem WHERE l_orderkey % 40 = 1 AND l_partkey % 5 = 0
),
e AS (SELECT u, v FROM raw UNION SELECT v, u FROM raw),
n1 AS (SELECT u AS node, CAST(count(DISTINCT v) AS BIGINT) AS n1
       FROM e GROUP BY u),
r2 AS (
  SELECT DISTINCT a.u AS node, b.v AS w
  FROM e a JOIN e b ON b.u = a.v
  WHERE b.v <> a.u
    AND NOT EXISTS (SELECT 1 FROM e d WHERE d.u = a.u AND d.v = b.v)
),
n2 AS (SELECT node, CAST(count(*) AS BIGINT) AS n2 FROM r2 GROUP BY node)
SELECT n1.node, n1.n1, COALESCE(n2.n2, 0) AS n2
FROM n1 LEFT JOIN n2 ON n2.node = n1.node
"""


def q_reproject(sf_dir: str):
    """Raster reprojection (nearest-neighbor) under an integer
    fixed-point affine transform — the grid-to-grid resampling op a
    tile engine runs between CRS-aligned layouts: target cell =
    ((a*cx + b*cy + tx) >> 8, (c*cx + d*cy + ty) >> 8) with the
    rotation-ish matrix [[250,-60],[60,250]]/256 and a translation;
    colliding source cells SUM (mass-preserving). One stateless map
    over cell totals + one keyed fold; the twin replays the shifts
    (>> on non-negative ints == // 256 in DuckDB)."""
    from osmray import terrain
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    totals = sorted_fold_sums(
        terrain.elevation_partials(
            ds.map_batches(_li_cell_points, batch_format="pyarrow"),
            "cx", "cy", "v"), "cell", ["z"])
    A, B, C, D, TX, TY = 250, -60, 60, 250, 65536, 0

    def remap(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = batch["z"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        qx = (A * cx + B * cy + TX) >> 8
        qy = (C * cx + D * cy + TY) >> 8
        return pa.table({"cell": pa.array(terrain.pack(qx, qy)),
                         "z": pa.array(z)})

    out = sorted_fold_sums(
        totals.map_batches(remap, batch_format="pyarrow"), "cell", ["z"])

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        qx, qy = terrain.unpack(c)
        return pa.table({"qx": pa.array(qx), "qy": pa.array(qy),
                         "z": batch["z"].cast(pa.int64())})

    return out.map_batches(fmt, batch_format="pyarrow")


Q_REPROJECT_SQL = f"""
WITH pts AS ({_LI_SQL}),
p AS (SELECT m1 // 262144 AS cx, m2 // 262144 AS cy, pid % 1000 AS v
      FROM pts),
c AS (SELECT cx, cy, sum(v) AS z FROM p GROUP BY cx, cy),
r AS (SELECT (250 * cx - 60 * cy + 65536) // 256 AS qx,
             (60 * cx + 250 * cy) // 256 AS qy, z FROM c)
SELECT qx, qy, CAST(sum(z) AS BIGINT) AS z FROM r GROUP BY qx, qy
"""


def q_source_drift(sf_dir: str):
    """Distribution-drift screening between corpus shards: pairwise
    histogram intersection of per-source word distributions —
    inter(a,b) = sum over words of min(count_a, count_b), with the
    per-source totals alongside so overlap coefficients derive at
    the edge. The pairwise mins are computed PER WORD inside the
    count fold's groups (sources are few; words are many), so only
    (a, b, partial) triples leave the second fold — no driver
    vocabulary, no cross join."""
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        toks, tsrc = [], []
        for s, t in zip(srcs, batch["text"].to_pylist()):
            ws = t.split(" ")
            toks.extend(ws)
            tsrc.extend([s] * len(ws))
        key = np.asarray([f"{w}\x1f{s}" for w, s in zip(toks, tsrc)])
        u, cnt = np.unique(key, return_counts=True)
        sep = np.char.partition(u, "\x1f")
        return pa.table({
            "k": pa.array(hash_str(list(sep[:, 0]), 17) % 1024),
            "w": pa.array(sep[:, 0]), "src": pa.array(sep[:, 2]),
            "cnt": pa.array(cnt.astype(np.int64))})

    def per_word_pairs(g: pa.Table) -> pa.Table:
        w = np.asarray(g["w"].to_pylist())
        s = np.asarray(g["src"].to_pylist())
        c = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, w))
        w, s, c = w[order], s[order], c[order]
        # exact per (word, src) counts first
        key = np.char.add(np.char.add(w, "\x1f"), s)
        new = np.concatenate(([True], key[1:] != key[:-1]))
        gid = np.cumsum(new) - 1
        cc = np.bincount(gid, weights=c).astype(np.int64)
        ww, ss = w[new], s[new]
        pa_, pb_, pv_ = [], [], []
        tot_s, tot_c = [], []
        start = 0
        bounds = np.flatnonzero(
            np.concatenate(([True], ww[1:] != ww[:-1], [True])))
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            for x in range(lo, hi):
                tot_s.append(ss[x])
                tot_c.append(int(cc[x]))
                for y in range(x + 1, hi):
                    a, b = sorted((ss[x], ss[y]))
                    pa_.append(a)
                    pb_.append(b)
                    pv_.append(int(min(cc[x], cc[y])))
        return pa.table({
            "a": pa.array(pa_ + tot_s, pa.string()),
            "b": pa.array(pb_ + ["\x01TOT"] * len(tot_s), pa.string()),
            "v": pa.array(pv_ + tot_c, pa.int64())})

    rows = (docs.map_batches(partials, batch_format="pyarrow")
            .groupby("k").map_groups(per_word_pairs,
                                     batch_format="pyarrow"))

    def pack(batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str as hs
        key = [f"{a}\x1f{b}" for a, b in zip(batch["a"].to_pylist(),
                                             batch["b"].to_pylist())]
        return pa.table({"k": pa.array(hs(key, 19) % 64),
                         "a": batch["a"], "b": batch["b"],
                         "v": batch["v"]})

    def fold_pairs(g: pa.Table) -> pa.Table:
        a = np.asarray(g["a"].to_pylist())
        b = np.asarray(g["b"].to_pylist())
        v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.char.add(np.char.add(a, "\x1f"), b)
        order = np.argsort(key, kind="stable")
        ks, vs = key[order], v[order]
        new = np.concatenate(([True], ks[1:] != ks[:-1]))
        gid = np.cumsum(new) - 1
        tot = np.bincount(gid, weights=vs).astype(np.int64)
        sep = np.char.partition(ks[new], "\x1f")
        return pa.table({"a": pa.array(sep[:, 0]),
                         "b": pa.array(sep[:, 2]),
                         "v": pa.array(tot)})

    folded = (rows.map_batches(pack, batch_format="pyarrow")
              .groupby("k").map_groups(fold_pairs,
                                       batch_format="pyarrow")
              .materialize())
    tot = {r["a"]: r["v"] for r in folded.iter_rows()
           if r["b"] == "\x01TOT"}

    def finish(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = [x != "\x01TOT" for x in b]
        a = [x for x, k in zip(a, keep) if k]
        b = [x for x, k in zip(b, keep) if k]
        v = v[np.asarray(keep, bool)] if len(keep) else v
        return pa.table({
            "src_a": pa.array(a, pa.string()),
            "src_b": pa.array(b, pa.string()),
            "inter": pa.array(v),
            "tot_a": pa.array([tot[x] for x in a], pa.int64()),
            "tot_b": pa.array([tot[x] for x in b], pa.int64())})

    return folded.map_batches(finish, batch_format="pyarrow")


Q_SOURCE_DRIFT_SQL = """
WITH tw AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT source, w, count(*) AS n FROM tw GROUP BY 1, 2),
t AS (SELECT source, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1),
p AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(sum(least(a.n, b.n)) AS BIGINT) AS inter
  FROM c a JOIN c b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.inter, ta.tot AS tot_a, tb.tot AS tot_b
FROM p JOIN t ta ON ta.source = p.src_a JOIN t tb ON tb.source = p.src_b
"""


_PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def q_profile(sf_dir: str):
    """Table profiling — the per-column statistics pass a catalog /
    data-quality layer runs before anything else: for each integer
    column, (n, min, max) fold from per-block partials plus an EXACT
    distinct count per column via one keyed fold over (col_id <<
    48 | value) packed keys (values here fit 48 bits) — one shuffle
    profiles every column at once instead of one groupby per
    column. Kernel lives in tableops.profile_columns (declarative
    step "profile")."""
    from osmray.tableops import profile_columns

    return profile_columns(_read(sf_dir, "lineitem", _PROFILE_COLS),
                           _PROFILE_COLS)


Q_PROFILE_SQL = """
SELECT 'l_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n,
  CAST(min(l_orderkey) AS BIGINT) AS mn, CAST(max(l_orderkey) AS BIGINT) AS mx,
  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct FROM lineitem
UNION ALL
SELECT 'l_partkey', count(*), min(l_partkey), max(l_partkey),
  count(DISTINCT l_partkey) FROM lineitem
UNION ALL
SELECT 'l_suppkey', count(*), min(l_suppkey), max(l_suppkey),
  count(DISTINCT l_suppkey) FROM lineitem
UNION ALL
SELECT 'l_linenumber', count(*), min(l_linenumber), max(l_linenumber),
  count(DISTINCT l_linenumber) FROM lineitem
"""


def q_delta_encode(sf_dir: str):
    """Encoding-cost estimation for a timestamp column — the storage
    planner's question "how many bytes would delta+varint encoding
    take per user stream": per user the ts-ordered (event_id
    tie-break) second-granularity deltas, summed as exact varint
    byte widths (1 + floor(log128(delta)) bytes, computed by integer
    thresholds). Same few-fat-keys keyed shuffle as q_sessionize."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        gaps = np.diff(tv[order]) // 1_000_000
        bytes_ = np.ones(len(gaps), np.int64)
        b = 128
        while True:
            over = gaps >= b
            if not over.any():
                break
            bytes_ += over
            b *= 128
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_deltas": pa.array([len(gaps)], pa.int64()),
            "enc_bytes": pa.array([int(bytes_.sum())], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


Q_DELTA_ENCODE_SQL = """
WITH e AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap
  FROM events
)
SELECT user_id, CAST(count(gap) AS BIGINT) AS n_deltas,
  CAST(COALESCE(sum(CASE WHEN gap IS NULL THEN NULL ELSE
    1 + CASE WHEN gap >= 128 THEN 1 ELSE 0 END
      + CASE WHEN gap >= 16384 THEN 1 ELSE 0 END
      + CASE WHEN gap >= 2097152 THEN 1 ELSE 0 END
      + CASE WHEN gap >= 268435456 THEN 1 ELSE 0 END
      + CASE WHEN gap >= 34359738368 THEN 1 ELSE 0 END END), 0) AS BIGINT)
    AS enc_bytes
FROM e GROUP BY user_id
"""


def q_debounce(sf_dir: str):
    """Streaming throttle-dedup (debounce): per (user, event_type)
    stream in (ts, event_id) order, keep an event only if >= 600 s
    have passed since the LAST KEPT event — the burst-collapse rule
    real event pipelines run at ingest. The state resets on every
    keep, so the scan is non-associative (no parallel prefix; same
    class as q_seq_packing): one keyed shuffle, one O(group) pass.
    Emits kept event_ids; the twin replays the scan as a recursive
    CTE stepping the per-stream row index."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    G = 600

    def per_stream(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((ii, tv, et))
        tv, ii, et = tv[order], ii[order], et[order]
        keep = np.zeros(len(ii), bool)
        new_stream = np.concatenate(([True], et[1:] != et[:-1]))
        last = 0
        for i in range(len(ii)):
            if new_stream[i] or tv[i] - last >= G:
                keep[i] = True
                last = tv[i]
        return pa.table({
            "event_id": pa.array(np.sort(ii[keep]))})

    return ds.groupby("user_id").map_groups(per_stream,
                                            batch_format="pyarrow")


Q_DEBOUNCE_SQL = """
WITH RECURSIVE base AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) // 1000000 AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts) // 1000000, event_id)
           AS i
  FROM events),
r(user_id, event_type, i, event_id, s, last_kept, keep) AS (
  SELECT user_id, event_type, i, event_id, s, s, TRUE
  FROM base WHERE i = 1
  UNION ALL
  SELECT b.user_id, b.event_type, b.i, b.event_id, b.s,
         CASE WHEN b.s - r.last_kept >= 600 THEN b.s ELSE r.last_kept END,
         b.s - r.last_kept >= 600
  FROM r JOIN base b ON b.user_id = r.user_id
    AND b.event_type = r.event_type AND b.i = r.i + 1
)
SELECT event_id FROM r WHERE keep
"""


def q_dedup_sweep(sf_dir: str):
    """Dedup threshold-sensitivity sweep — the "how aggressive should
    the near-dup filter be" calibration curve: ONE prefix-filtered
    Jaccard pass at the loosest threshold (2/5), then every pair
    classifies into all five thresholds it clears (cross-multiplied
    integer tests), one tiny fold. Planted half-snippets (same
    pure-SQL derivation as q_containment) populate the high end on
    the otherwise overlap-free corpus."""
    from osmray.simjoin import jaccard_join
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    m = max(1, ds.count() // 700)

    def toks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = ids % m == 0
        ids = ids[sel]
        texts = [t for t, s in zip(batch["text"].to_pylist(), sel) if s]
        out_id, out_t = [], []
        for did, t in zip(ids, texts):
            ws = _WORD_RE.findall(t.lower())
            out_id.append(int(did))
            out_t.append(sorted({f"{ws[i]}_{ws[i + 1]}_{ws[i + 2]}"
                                 for i in range(len(ws) - 2)}))
            if did % 10 == 0:
                half = ws[:(len(ws) + 1) // 2]
                out_id.append(int(did) + 10_000_000)
                out_t.append(sorted({
                    f"{half[i]}_{half[i + 1]}_{half[i + 2]}"
                    for i in range(len(half) - 2)}))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "toks": pa.array(out_t, pa.list_(pa.string()))})

    pairs = jaccard_join(ds.map_batches(toks, batch_format="pyarrow"),
                         "doc_id", "toks", t_num=2, t_den=5)
    THRESH = [400, 500, 600, 700, 800]

    def classify(batch: pa.Table) -> pa.Table:
        inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = batch["uni"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts, ns = [], []
        for t in THRESH:
            ts.append(t)
            ns.append(int((inter * 1000 >= t * uni).sum()))
        return pa.table({"thr_mil": pa.array(ts, pa.int64()),
                         "n_pairs": pa.array(ns, pa.int64())})

    return sorted_fold_sums(
        pairs.map_batches(classify, batch_format="pyarrow"),
        "thr_mil", ["n_pairs"])


Q_DEDUP_SWEEP_SQL = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % (SELECT greatest(1, count(*) // 700) FROM documents) = 0
),
w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS ws
  FROM d
),
wu AS (
  SELECT doc_id, ws FROM w
  UNION ALL
  SELECT doc_id + 10000000, ws[1:(len(ws) + 1) // 2] FROM w
  WHERE doc_id % 10 = 0
),
big AS (
  SELECT doc_id,
         list_distinct([ws[i] || '_' || ws[i + 1] || '_' || ws[i + 2]
                        FOR i IN range(1, len(ws) - 1)]) AS toks
  FROM wu
),
s AS (SELECT doc_id, toks, len(toks) AS n FROM big WHERE len(toks) > 0),
p AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.toks, b.toks)) AS inter,
         a.n + b.n - len(list_intersect(a.toks, b.toks)) AS uni
  FROM s a JOIN s b ON a.doc_id < b.doc_id
),
t AS (SELECT unnest([400, 500, 600, 700, 800]) AS thr_mil)
SELECT CAST(t.thr_mil AS BIGINT) AS thr_mil,
       CAST(count_if(p.inter * 1000 >= t.thr_mil * p.uni) AS BIGINT)
         AS n_pairs
FROM t LEFT JOIN p ON TRUE
GROUP BY t.thr_mil
"""


_CF_MOD = 2147483647  # 2^31 - 1: char-fold word hash stays in int64
_CF_B = 131


def _char_fold_hash(words: np.ndarray) -> np.ndarray:
    """Per-word polynomial codepoint hash mod 2^31-1 (acc*131+c) —
    the SQL twin is a list_reduce over ord(substr(w, i, 1)), so the
    two sides agree bit-exactly for any unicode text. Callers hash
    the vocab-level np.unique set, never the per-token stream."""
    out = np.empty(len(words), np.int64)
    for k, w in enumerate(words):
        acc = 0
        for ch in w:
            acc = (acc * _CF_B + ord(ch)) % _CF_MOD
        out[k] = acc
    return out


def q_winnow(sf_dir: str):
    """Winnowing document fingerprints (the MOSS scheme): per doc,
    hash every word-3-gram (char-fold word hashes combined base
    524287 mod 2^31-1), slide a window of 4 gram hashes, select the
    RIGHTMOST minimum of each window (the robust-winnowing
    tie-break), and emit the distinct selected hashes as the doc's
    fingerprint set (count / min / sum — integer-exact). Guarantees
    every 4-gram-window of the doc shares a fingerprint with any
    copy, the property plagiarism/near-dup pipelines rely on. Docs
    shorter than one window contribute their global rightmost-min.
    Embarrassingly parallel (one map_batches, no shuffle)."""
    return winnow_fingerprints(_read(sf_dir, "documents",
                                     ["doc_id", "text"]))


def winnow_fingerprints(docs, w: int = 4, B: int = 524287):
    from numpy.lib.stride_tricks import sliding_window_view

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [wd for ws in toks for wd in ws]
        out = {"doc_id": [], "n_fp": [], "fp_min": [], "fp_sum": []}
        if flat:
            u = np.unique(np.asarray(flat))
            hu = _char_fold_hash(u)
            for did, ws in zip(ids, toks):
                hws = hu[np.searchsorted(u, np.asarray(ws))]
                if len(hws) < 3:
                    continue
                h = ((hws[:-2] * B + hws[1:-1]) % _CF_MOD * B
                     + hws[2:]) % _CF_MOD
                if len(h) < w:
                    pos = np.array([len(h) - 1 - int(np.argmin(h[::-1]))])
                else:
                    W = sliding_window_view(h, w)
                    pos = (np.arange(len(W))
                           + (w - 1 - np.argmin(W[:, ::-1], axis=1)))
                fps = np.unique(h[pos])
                out["doc_id"].append(int(did))
                out["n_fp"].append(len(fps))
                out["fp_min"].append(int(fps.min()))
                out["fp_sum"].append(int(fps.sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return docs.map_batches(per_batch, batch_format="pyarrow")


_CF_HASH_LAMBDA = """list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, length({w}) + 1),
            i -> CAST(ord(substr({w}, i, 1)) AS BIGINT))),
          (a, c) -> (a * 131 + c) % 2147483647)"""

Q_WINNOW_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
wh AS (SELECT doc_id, list_transform(ws, w ->
        {_CF_HASH_LAMBDA.format(w='w')}) AS hs
      FROM toks),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
g AS (SELECT doc_id, idx.i AS i,
        ((hs[idx.i] * 524287 + hs[idx.i + 1]) % 2147483647 * 524287
          + hs[idx.i + 2]) % 2147483647 AS h
      FROM wh JOIN idx ON idx.i + 2 <= len(hs)),
mg AS (SELECT doc_id, max(i) AS m FROM g GROUP BY doc_id),
wins AS (SELECT doc_id, i AS e FROM g WHERE i >= 4
         UNION ALL SELECT doc_id, m FROM mg WHERE m < 4),
cand AS (SELECT w.doc_id, w.e, b.i, b.h FROM wins w
         JOIN g b ON b.doc_id = w.doc_id AND b.i BETWEEN w.e - 3 AND w.e),
mins AS (SELECT doc_id, e, min(h) AS mh FROM cand GROUP BY 1, 2),
sel AS (SELECT c.doc_id, max(c.i) AS j FROM cand c
        JOIN mins m ON m.doc_id = c.doc_id AND m.e = c.e AND c.h = m.mh
        GROUP BY c.doc_id, c.e),
fp AS (SELECT DISTINCT s.doc_id, g.h FROM sel s
       JOIN g ON g.doc_id = s.doc_id AND g.i = s.j)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(min(h) AS BIGINT) AS fp_min,
       CAST(sum(h) AS BIGINT) AS fp_sum
FROM fp GROUP BY doc_id
"""


def q_quality_clf(sf_dir: str):
    """Model-based quality filtering, fastText-shaped: a hashed
    bag-of-words LINEAR classifier — each token hashes (char-fold)
    into one of 256 buckets whose fixed integer weight is the
    Knuth-mix formula (b * 2654435761) % 2^32 % 2001 - 1000, the doc
    score is the sum over tokens, keep = score >= 0. Deterministic
    stand-in for a trained quality model with the exact runtime
    shape (hash -> embed -> sum -> threshold); integer end to end.
    One vectorized map_batches, weights computed on the vocab-level
    unique set per block, no shuffle."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [wd for ws in toks for wd in ws]
        if not flat:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64()),
                             "keep": pa.array([], pa.int64())})
        u = np.unique(np.asarray(flat))
        wt = (_char_fold_hash(u) % 256) * 2654435761 % (1 << 32) % 2001 - 1000
        scores, n_tok = np.empty(len(ids), np.int64), np.empty(len(ids), np.int64)
        for k, ws in enumerate(toks):
            wts = wt[np.searchsorted(u, np.asarray(ws))]
            n_tok[k] = len(ws)
            scores[k] = int(wts.sum())
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n_tok),
                         "score": pa.array(scores),
                         "keep": pa.array((scores >= 0).astype(np.int64))})

    return docs.map_batches(per_batch, batch_format="pyarrow")


Q_QUALITY_CLF_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id,
        {_CF_HASH_LAMBDA.format(w='w')} % 256 AS b
      FROM toks),
s AS (SELECT doc_id, b * 2654435761 % 4294967296 % 2001 - 1000 AS wt FROM h)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(wt) AS BIGINT) AS score,
       CAST(CASE WHEN sum(wt) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s GROUP BY doc_id
"""


def q_token_bucket(sf_dir: str):
    """Token-bucket rate limiting (admission control) per user
    stream: capacity 3 tokens, one token refilled per FULL 300 s
    elapsed on the refill clock (the clock advances only in whole
    periods — the standard bucket discretization), bucket full at
    each user's first event. Non-associative reset scan (same class
    as q_debounce / q_seq_packing: state resets on every admit, so no
    parallel prefix exists): one keyed shuffle, one O(group) pass,
    emits admitted event_ids. The twin replays the scan as a
    recursive CTE carrying (post-admit tokens, refill clock)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    C, P = 3, 300

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        tv, ii = tv[order], ii[order]
        keep = np.zeros(len(ii), bool)
        tokens, last = C, int(tv[0]) if len(tv) else 0
        for i in range(len(ii)):
            refills = (int(tv[i]) - last) // P
            tokens = min(C, tokens + refills)
            last += refills * P
            if tokens > 0:
                keep[i] = True
                tokens -= 1
        return pa.table({"event_id": pa.array(np.sort(ii[keep]))})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


Q_TOKEN_BUCKET_SQL = """
WITH RECURSIVE base AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) // 1000000, event_id)
           AS i
  FROM events),
r(user_id, i, event_id, tokens, last_s, admit) AS (
  SELECT user_id, i, event_id, 2, s, TRUE FROM base WHERE i = 1
  UNION ALL
  SELECT b.user_id, b.i, b.event_id,
         least(3, r.tokens + (b.s - r.last_s) // 300)
           - CASE WHEN least(3, r.tokens + (b.s - r.last_s) // 300) > 0
                  THEN 1 ELSE 0 END,
         r.last_s + 300 * ((b.s - r.last_s) // 300),
         least(3, r.tokens + (b.s - r.last_s) // 300) > 0
  FROM r JOIN base b ON b.user_id = r.user_id AND b.i = r.i + 1
)
SELECT event_id FROM r WHERE admit
"""


def q_lm_score(sf_dir: str):
    """Bigram language-model commonness scoring — the n-gram-LM data
    quality filter shape (perplexity ranking without floats): exact
    global bigram counts (the same unbounded-vocab fold as
    q_collocations), attached back to each document's bigram
    occurrences two-engine (broadcast under cap / grace join keyed
    by the string hash with in-bucket exact-string verify), then
    score_mil = floor(1000 * sum(global count over the doc's bigram
    slots) / n_slots) — high = common/repetitive phrasing, low =
    novel text. All integers end to end."""
    return lm_score(_read(sf_dir, "documents", ["doc_id", "text"]))


def lm_score(docs, broadcast_cap: int = 2_000_000):
    import pyarrow.compute as pc
    import ray

    from osmray.joins import bucketed_join
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    counts = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, True),
                         batch_format="pyarrow"), ["w1", "w2"]).materialize()

    def doc_posts(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_d, out_g, out_tf = [], [], []
        for i, text in enumerate(batch["text"].to_pylist()):
            ws = text.split(" ")
            if len(ws) < 2:
                continue
            grams = np.asarray([f"{a}\x1f{b}" for a, b in zip(ws, ws[1:])])
            u, c = np.unique(grams, return_counts=True)
            out_d.append(np.full(len(u), ids[i], np.int64))
            out_g.append(u)
            out_tf.append(c.astype(np.int64))
        if not out_d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({"doc_id": pa.array(np.concatenate(out_d)),
                         "g": pa.array(np.concatenate(out_g)),
                         "tf": pa.array(np.concatenate(out_tf))})

    posts = docs.map_batches(doc_posts, batch_format="pyarrow")
    if counts.count() <= broadcast_cap:
        cp = counts.to_pandas()
        keys = (cp["w1"] + "\x1f" + cp["w2"]).to_numpy().astype(str)
        nv = cp["n"].to_numpy().astype(np.int64)
        o = np.argsort(keys)
        ref = ray.put((keys[o], nv[o]))

        def attach(batch: pa.Table, *, _ref=ref) -> pa.Table:
            ks, nv2 = ray.get(_ref)
            g = batch["g"].to_numpy(zero_copy_only=False).astype(str)
            pos = np.searchsorted(ks, g)
            return batch.append_column("n", pa.array(nv2[pos]))

        scored = posts.map_batches(attach, batch_format="pyarrow")
    else:  # grace join on the string hash + in-bucket exact verify
        def key_posts(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "jk", pa.array(hash_str(batch["g"].to_pylist(), 11)))

        def key_counts(batch: pa.Table) -> pa.Table:
            packed = [f"{a}\x1f{b}" for a, b in
                      zip(batch["w1"].to_pylist(), batch["w2"].to_pylist())]
            return pa.table({"g2": pa.array(packed, pa.string()),
                             "n": batch["n"],
                             "jk": pa.array(hash_str(packed, 11))})

        joined = bucketed_join(
            posts.map_batches(key_posts, batch_format="pyarrow"),
            counts.map_batches(key_counts, batch_format="pyarrow"), on="jk")
        scored = joined.map_batches(
            lambda t: t.filter(pc.equal(t["g"], t["g2"]))
            .drop_columns(["g2", "jk", "jk_r"]), batch_format="pyarrow")

    def partials(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return _keyed_sums(d, {"hits": tf * n, "slots": tf},
                           "doc_id").select(["doc_id", "hits", "slots"])

    folded = sorted_fold_sums(
        scored.map_batches(partials, batch_format="pyarrow"),
        "doc_id", ["hits", "slots"])

    def finish(batch: pa.Table) -> pa.Table:
        h = batch["hits"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["slots"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_slots": pa.array(s),
                         "score_mil": pa.array(1000 * h // s)})

    return folded.map_batches(finish, batch_format="pyarrow")


Q_LM_SCORE_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
big AS (SELECT doc_id, ws[idx.i] AS w1, ws[idx.i + 1] AS w2
        FROM toks JOIN idx ON idx.i + 1 <= len(ws)),
bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM big GROUP BY 1, 2),
per AS (SELECT b.doc_id, bc.n
        FROM big b JOIN bc ON bc.w1 = b.w1 AND bc.w2 = b.w2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_slots,
       CAST(1000 * sum(n) // count(*) AS BIGINT) AS score_mil
FROM per GROUP BY doc_id
"""


def q_link_predict(sf_dir: str):
    """Common-neighbor link prediction — the graph-ML candidate
    generator: on the synthesized 65536-node graph, score every
    non-adjacent pair (a, b) by |N(a) ∩ N(b)| and emit the top 50 by
    (score DESC, a, b). Common-neighbor counts are exactly the
    market-basket machinery (tableops.cooccur_pairs keyed by the
    shared neighbor: ONE sort shuffle + one packed-key fold, per-key
    duplicate-safe); existing edges leave via a grace ANTI join on
    the packed pair key (no broadcast edge set); the top-k is a
    distributed sort + limit with a fully deterministic tie-break."""
    def adj(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"via": pa.array(np.concatenate((u, v))),
                         "nb": pa.array(np.concatenate((v, u)))})

    # the session-cached DISTINCT undirected view: cooccur is
    # duplicate-safe either way, but deduped input skips that work
    adj_ds = _li_hash_edges(sf_dir, undirected=True).map_batches(
        adj, batch_format="pyarrow").materialize()
    return link_predict_topk(adj_ds, k=50)


def link_predict_topk(adj_ds, k: int = 50):
    """Top-k common-neighbor link prediction over a symmetric
    adjacency dataset (via, nb) — see q_link_predict."""
    from osmray.joins import bucketed_join
    from osmray.tableops import cooccur_pairs

    pairs = cooccur_pairs(adj_ds, "via", "nb", min_count=1)

    def pack_pairs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("pk", pa.array((a << 32) | b))

    def pack_edges(batch: pa.Table) -> pa.Table:
        x = batch["via"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(
            (np.minimum(x, y) << 32) | np.maximum(x, y))})

    cand = bucketed_join(
        pairs.map_batches(pack_pairs, batch_format="pyarrow"),
        adj_ds.map_batches(pack_edges, batch_format="pyarrow"),
        on="pk", how="anti", right_dedup=True)
    top = cand.sort(["n", "pk"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"],
                            "cn": t["n"].cast(pa.int64())}),
        batch_format="pyarrow")


Q_LINK_PREDICT_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 65536 AS u, m2 % 65536 AS v FROM p
        WHERE m1 % 65536 <> m2 % 65536),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
adj AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
w AS (SELECT n1.y AS a, n2.y AS b FROM adj n1
      JOIN adj n2 ON n1.x = n2.x AND n1.y < n2.y),
cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cn FROM w GROUP BY 1, 2),
cand AS (SELECT cn.a, cn.b, cn.cn FROM cn WHERE NOT EXISTS
         (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b))
SELECT a, b, cn FROM cand ORDER BY cn DESC, a, b LIMIT 50
"""


def q_gopher_rules(sf_dir: str):
    """Within-document repetition quality rules (the Gopher /
    MassiveText filters): per doc, the fraction of characters covered
    by word-bigrams that repeat WITHIN the doc (``dup2_mil``) and the
    fraction of characters attributable to the single most frequent
    bigram (``top2_mil``, ties broken by lexicographically smallest
    gram) — both integer milli-rates over the doc's non-space chars.
    Embarrassingly parallel: one map_batches, counts via block-local
    np.unique per doc, no shuffle — the cheapest possible shape at
    100 TB (pure scan). Kernel: text.gopher_repetition."""
    from osmray.text import gopher_repetition

    return gopher_repetition(_read(sf_dir, "documents",
                                   ["doc_id", "text"]))


Q_GOPHER_RULES_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws,
              greatest(length(replace(text, ' ', '')), 1) AS n_chars
              FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
g AS (SELECT doc_id, idx.i AS i, ws[idx.i] || chr(31) || ws[idx.i + 1] AS g
      FROM toks JOIN idx ON idx.i + 1 <= len(ws)),
cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
docc AS (SELECT g.doc_id, g.i FROM g JOIN cnt
         ON cnt.doc_id = g.doc_id AND cnt.g = g.g AND cnt.c >= 2),
cpos AS (SELECT DISTINCT doc_id, p FROM (
           SELECT doc_id, i AS p FROM docc
           UNION ALL SELECT doc_id, i + 1 FROM docc)),
cov AS (SELECT c.doc_id, sum(length(t.ws[c.p])) AS cchars
        FROM cpos c JOIN toks t ON t.doc_id = c.doc_id GROUP BY 1),
top AS (SELECT doc_id, c, g FROM (
          SELECT doc_id, c, g, row_number() OVER (PARTITION BY doc_id
            ORDER BY c DESC, g ASC) AS rn FROM cnt) WHERE rn = 1)
SELECT t.doc_id,
  CAST(len(t.ws) AS BIGINT) AS n_tokens,
  CAST(coalesce(cov.cchars, 0) * 1000000 // t.n_chars AS BIGINT)
    AS dup2_mil,
  CAST(coalesce(top.c * (length(top.g) - 1), 0) * 1000000 // t.n_chars
    AS BIGINT) AS top2_mil
FROM toks t LEFT JOIN cov ON cov.doc_id = t.doc_id
LEFT JOIN top ON top.doc_id = t.doc_id
"""


def q_boilerplate(sf_dir: str):
    """Corpus-level boilerplate coverage (CCNet / RefinedWeb shared-
    template removal): word-trigrams occurring in >= 2 DISTINCT docs
    are boilerplate; each doc reports covered token positions and the
    integer milli-rate. See text.boilerplate_coverage for the
    two-engine (broadcast gram set / keyed grace semi-join) scale
    design — this entry runs mode="auto"."""
    from osmray.text import boilerplate_coverage

    return boilerplate_coverage(
        _read(sf_dir, "documents", ["doc_id", "text"]), n=3, min_docs=2)


Q_BOILERPLATE_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
g AS (SELECT doc_id, idx.i AS i, ws[idx.i] || chr(31) || ws[idx.i + 1]
        || chr(31) || ws[idx.i + 2] AS g
      FROM toks JOIN idx ON idx.i + 2 <= len(ws)),
bp AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
                      FROM g GROUP BY g) WHERE nd >= 2),
occ AS (SELECT g.doc_id, g.i FROM g JOIN bp ON bp.g = g.g),
cpos AS (SELECT DISTINCT doc_id, i + o.k AS p FROM occ
         CROSS JOIN (SELECT CAST(t.range AS INT) AS k
                     FROM range(0, 3) t) o),
cov AS (SELECT doc_id, count(*) AS n_cov FROM cpos GROUP BY 1)
SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
  CAST(coalesce(cov.n_cov, 0) AS BIGINT) AS n_cov,
  CAST(coalesce(cov.n_cov, 0) * 1000000 // greatest(len(t.ws), 1)
    AS BIGINT) AS boiler_mil
FROM toks t LEFT JOIN cov ON cov.doc_id = t.doc_id
"""


def q_cdc_chunks(sf_dir: str):
    """Content-defined-chunking dedup (the rsync/LBFS/storage-dedup
    primitive, insertion-robust where fixed-stride grams shift):
    chunk boundaries where the 8-char rolling polynomial hash
    (base 131 mod 2^31-1) % 64 == 0; a chunk is duplicated when it
    occurs in >= 2 distinct docs; per-doc (n_chunks, n_dup, dup_mil).
    See dedup.cdc_chunk_dups for the bounded-bucket shuffle design."""
    from osmray.dedup import cdc_chunk_dups

    return cdc_chunk_dups(_read(sf_dir, "documents", ["doc_id", "text"]))


Q_CDC_CHUNKS_SQL = """
WITH d AS (SELECT doc_id, text, length(text) AS L FROM documents),
pos AS (SELECT CAST(t.range AS INT) AS j FROM range(8, 65536) t),
h AS (SELECT doc_id, pos.j,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
         list_transform(range(j - 7, j + 1),
           i -> CAST(ord(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
         (a, c) -> (a * 131 + c) % 2147483647) AS hv
      FROM d JOIN pos ON pos.j <= d.L),
cuts AS (SELECT DISTINCT doc_id, c FROM (
          SELECT doc_id, 0 AS c FROM d WHERE L > 0
          UNION ALL SELECT doc_id, j FROM h WHERE hv % 64 = 0
          UNION ALL SELECT doc_id, L FROM d WHERE L > 0)),
seg AS (SELECT doc_id, lag(c) OVER (PARTITION BY doc_id ORDER BY c) AS s,
               c AS e FROM cuts),
chunks AS (SELECT seg.doc_id,
             substr(d.text, CAST(seg.s + 1 AS INT),
                    CAST(seg.e - seg.s AS INT)) AS ch
           FROM seg JOIN d ON d.doc_id = seg.doc_id
           WHERE seg.s IS NOT NULL),
pc AS (SELECT doc_id, ch, count(*) AS c FROM chunks GROUP BY 1, 2),
ndk AS (SELECT ch, count(DISTINCT doc_id) AS nd FROM chunks GROUP BY ch),
dup AS (SELECT pc.doc_id, sum(pc.c) AS n_dup FROM pc
        JOIN ndk ON ndk.ch = pc.ch AND ndk.nd >= 2 GROUP BY 1),
nch AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(nch.n_chunks, 0) AS BIGINT) AS n_chunks,
  CAST(coalesce(dup.n_dup, 0) AS BIGINT) AS n_dup,
  CAST(coalesce(dup.n_dup, 0) * 1000000
    // greatest(coalesce(nch.n_chunks, 0), 1) AS BIGINT) AS dup_mil
FROM d LEFT JOIN nch ON nch.doc_id = d.doc_id
LEFT JOIN dup ON dup.doc_id = d.doc_id
"""


def q_label_prop(sf_dir: str):
    """Label-propagation community detection (synchronous LPA, 3
    fixed rounds, most-frequent-neighbor-label with smallest-label
    tie-break) on the synthesized 65536-node graph — deterministic
    end to end, so the DuckDB twin unrolls the identical 3 rounds.
    See graph.label_propagation for the broadcast/shuffle two-engine
    design (pinned equal in pytest)."""
    from osmray.graph import label_propagation

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def edges(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        u, v = p["m1"] % 65536, p["m2"] % 65536
        keep = u != v
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    return label_propagation(
        ds.map_batches(edges, batch_format="pyarrow"), rounds=3)


def _lpa_round_sql(prev: str, cur: str) -> str:
    return f"""c{cur} AS (SELECT a.x AS node, l.lbl, count(*) AS c
  FROM adj a JOIN l{prev} l ON l.node = a.y GROUP BY 1, 2),
l{cur} AS (SELECT node, lbl FROM (
  SELECT node, lbl, row_number() OVER (PARTITION BY node
    ORDER BY c DESC, lbl ASC) AS rn FROM c{cur}) WHERE rn = 1)"""


Q_LABEL_PROP_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 65536 AS u, m2 % 65536 AS v FROM p
        WHERE m1 % 65536 <> m2 % 65536),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
adj AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
l0 AS (SELECT DISTINCT x AS node, x AS lbl FROM adj),
{_lpa_round_sql('0', '1')},
{_lpa_round_sql('1', '2')},
{_lpa_round_sql('2', '3')}
SELECT CAST(node AS BIGINT) AS node, CAST(lbl AS BIGINT) AS lbl FROM l3
"""


def q_assortativity(sf_dir: str):
    """Degree-assortativity components of the undirected 65536-node
    graph — the graph-topology screen (hub-hub vs hub-leaf wiring):
    over all ORDERED endpoint pairs (x, y) of distinct undirected
    edges, the exact integer sums (m, sx, sxx, sxy) that determine
    Pearson's r = (m*sxy - sx^2) / (m*sxx - sx^2) — emitted as
    integers so the twin is bit-exact (no float correlation).
    Two engines (pinned equal in pytest): ``broadcast`` ships the
    O(V) degree array once and ONE edge pass tree-reduces the four
    scalars; ``keyed`` folds degrees, grace-joins them onto the edge
    endpoints and reduces — zero O(V) driver state."""
    return assortativity_sums(_li_hash_edges(sf_dir, undirected=True),
                              prededuped=True)


def assortativity_sums(packed_edges, mode: str = "auto",
                       broadcast_cap: int = 50_000_000,
                       prededuped: bool = False):
    """Integer degree-assortativity components — see q_assortativity.
    Input: packed DISTINCT-able undirected edges pk = a*65536 + b,
    or an already-distinct (u, v) dataset with ``prededuped``."""
    import ray

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    e = packed_edges if prededuped else _dedup_packed_edges(packed_edges)
    if mode == "auto":
        mode = "broadcast" if 2 * e.count() <= broadcast_cap else "keyed"

    if mode == "broadcast":
        nodes = _node_universe(e)
        deg = np.zeros(len(nodes), np.int64)

        def deg_part(b: pa.Table) -> pa.Table:
            u, cnt = np.unique(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)]),
                return_counts=True)
            return pa.table({"n": pa.array(u),
                             "c": pa.array(cnt.astype(np.int64))})

        dparts = e.map_batches(deg_part, batch_format="pyarrow").to_pandas()
        np.add.at(deg, np.searchsorted(nodes, dparts["n"].to_numpy()),
                  dparts["c"].to_numpy())
        ref = ray.put(deg)

        def sums(batch: pa.Table) -> pa.Table:
            d = ray.get(ref)
            du = d[np.searchsorted(
                nodes, batch["u"].to_numpy(zero_copy_only=False))]
            dv = d[np.searchsorted(
                nodes, batch["v"].to_numpy(zero_copy_only=False))]
            return pa.table({
                "m": pa.array([2 * len(du)], pa.int64()),
                "sx": pa.array([int((du + dv).sum())], pa.int64()),
                "sxx": pa.array([int((du * du + dv * dv).sum())],
                                pa.int64()),
                "sxy": pa.array([2 * int((du * dv).sum())], pa.int64())})

        parts = e.map_batches(sums, batch_format="pyarrow").to_pandas()
        return pa.table({k: pa.array([int(parts[k].sum())], pa.int64())
                         for k in ("m", "sx", "sxx", "sxy")})

    def deg_partials(batch: pa.Table) -> pa.Table:
        n = np.concatenate([batch["u"].to_numpy(zero_copy_only=False),
                            batch["v"].to_numpy(zero_copy_only=False)])
        u, cnt = np.unique(n, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "deg": pa.array(cnt.astype(np.int64))})

    deg = sorted_fold_sums(
        e.map_batches(deg_partials, batch_format="pyarrow"),
        "node", ["deg"])

    ju = bucketed_join(e, deg, on="u", right_on="node", num_buckets=16)
    jb = bucketed_join(ju.map_batches(
        lambda b: pa.table({"v": b["v"], "du": b["deg"]}),
        batch_format="pyarrow"), deg, on="v", right_on="node",
        num_buckets=16)

    def sums(batch: pa.Table) -> pa.Table:
        du = batch["du"].to_numpy(zero_copy_only=False).astype(np.int64)
        dv = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        # ordered pairs: (du, dv) and (dv, du) — symmetric sums fold
        return pa.table({
            "m": pa.array([2 * len(du)], pa.int64()),
            "sx": pa.array([int((du + dv).sum())], pa.int64()),
            "sxx": pa.array([int((du * du + dv * dv).sum())], pa.int64()),
            "sxy": pa.array([2 * int((du * dv).sum())], pa.int64())})

    parts = jb.map_batches(sums, batch_format="pyarrow").to_pandas()
    return pa.table({k: pa.array([int(parts[k].sum())], pa.int64())
                     for k in ("m", "sx", "sxx", "sxy")})


Q_ASSORTATIVITY_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 65536 AS u, m2 % 65536 AS v FROM p
        WHERE m1 % 65536 <> m2 % 65536),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
adj AS (SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT x AS node, count(*) AS d FROM adj GROUP BY 1),
pairs AS (SELECT dx.d AS du, dy.d AS dv FROM adj
          JOIN deg dx ON dx.node = adj.x JOIN deg dy ON dy.node = adj.y)
SELECT CAST(count(*) AS BIGINT) AS m,
       CAST(sum(du) AS BIGINT) AS sx,
       CAST(sum(du * du) AS BIGINT) AS sxx,
       CAST(sum(du * dv) AS BIGINT) AS sxy
FROM pairs
"""


def q_hits(sf_dir: str):
    """HITS hubs-and-authorities, two UNROLLED integer rounds (no
    float normalization — fixed round count keeps every score an
    exact int64, so the SQL twin replays it bit-exactly): hub0 = 1,
    auth1 = indegree, hub1 = sum of auth1 over out-neighbors,
    auth2 = sum of hub1 over in-neighbors, hub2 = sum of auth2 over
    out-neighbors. Two engines (hits_scores, pinned equal in pytest):
    ``broadcast`` (node universe under the cap) runs each round as
    one streaming edge pass against a ray.put score array with an
    O(V) driver fold; ``keyed`` runs ONE grace join (attach the
    previous score at the edge) + ONE keyed integer fold per round —
    the scatter/fold shape of the shuffle graph engines, zero driver
    state."""
    return hits_scores(_li_hash_edges(sf_dir), prededuped=True)


_EDGE_CACHE: dict = {}


def _li_hash_edges(sf_dir: str, undirected: bool = False):
    """Deduplicated materialized (u, v) edge view of the synthesized
    65536-node lineitem graph, cached per (sf_dir, undirected) for
    the session — q_hits / q_assortativity / q_ppr / q_link_predict
    all derive from the same graph, so the pack + dedup shuffle runs
    once per bench session instead of once per query."""
    key = (sf_dir, undirected)
    if key not in _EDGE_CACHE:
        ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

        def edges(batch: pa.Table) -> pa.Table:
            p = _li_points(batch)
            u, v = p["m1"] % 65536, p["m2"] % 65536
            keep = u != v
            u, v = u[keep], v[keep]
            if undirected:
                u, v = np.minimum(u, v), np.maximum(u, v)
            return pa.table({"pk": pa.array(np.unique(u * 65536 + v))})

        _EDGE_CACHE[key] = _dedup_packed_edges(
            ds.map_batches(edges, batch_format="pyarrow"))
    return _EDGE_CACHE[key]


def _dedup_packed_edges(packed_edges):
    """Exact distinct (u, v) from a packed pk = u*65536 + v stream
    (one keyed dedup shuffle), materialized."""
    from ray.data.aggregate import Count

    return (packed_edges.groupby("pk").aggregate(Count(alias_name="_n"))
            .map_batches(lambda b: pa.table({
                "u": pa.array(b["pk"].to_numpy(
                    zero_copy_only=False) // 65536),
                "v": pa.array(b["pk"].to_numpy(
                    zero_copy_only=False) % 65536)}),
                batch_format="pyarrow").materialize())


def _node_universe(e) -> np.ndarray:
    return np.unique(np.concatenate([
        e.map_batches(
            lambda b: pa.table({"n": pa.array(np.unique(np.concatenate(
                [b["u"].to_numpy(zero_copy_only=False),
                 b["v"].to_numpy(zero_copy_only=False)])))}),
            batch_format="pyarrow").to_pandas()["n"].to_numpy()])
    ).astype(np.int64)


def hits_scores(packed_edges, mode: str = "auto",
                broadcast_cap: int = 50_000_000,
                prededuped: bool = False):
    """Two-round integer HITS — see q_hits. ``prededuped`` skips the
    pack-key dedup when the caller passes an already-distinct (u, v)
    dataset (the _li_hash_edges session cache)."""
    import ray

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    e = packed_edges if prededuped else _dedup_packed_edges(packed_edges)
    if mode == "auto":
        mode = "broadcast" if 2 * e.count() <= broadcast_cap else "keyed"

    if mode == "broadcast":
        import ray.data

        nodes = _node_universe(e)

        def edge_pass(score: np.ndarray, src: str, dst: str) -> np.ndarray:
            ref = ray.put(score)

            def part(batch: pa.Table) -> pa.Table:
                sc = ray.get(ref)
                s = np.searchsorted(
                    nodes, batch[src].to_numpy(zero_copy_only=False))
                d = np.searchsorted(
                    nodes, batch[dst].to_numpy(zero_copy_only=False))
                t_, inv = np.unique(d, return_inverse=True)
                return pa.table({"i": pa.array(t_), "s": pa.array(
                    np.bincount(inv, weights=sc[s]).astype(np.int64))})

            parts = e.map_batches(part, batch_format="pyarrow").to_pandas()
            out = np.zeros(len(nodes), np.int64)
            if len(parts):
                np.add.at(out, parts["i"].to_numpy(),
                          parts["s"].to_numpy().astype(np.int64))
            return out

        ones = np.ones(len(nodes), np.int64)
        auth1 = edge_pass(ones, "u", "v")
        hub1 = edge_pass(auth1, "v", "u")
        auth2 = edge_pass(hub1, "u", "v")
        hub2 = edge_pass(auth2, "v", "u")
        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes), "auth2": pa.array(auth2),
            "hub2": pa.array(hub2)}))

    def fold_over(edge_key: str, score, score_col: str, out_key: str,
                  out_col: str):
        """attach score at edge_key, sum into out_key."""
        j = bucketed_join(e, score, on=edge_key, right_on="node",
                          num_buckets=16)

        def part(batch: pa.Table) -> pa.Table:
            k = batch[out_key].to_numpy(
                zero_copy_only=False).astype(np.int64)
            s = batch[score_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            u, inv = np.unique(k, return_inverse=True)
            return pa.table({"node": pa.array(u), out_col: pa.array(
                np.bincount(inv, weights=s).astype(np.int64))})

        return sorted_fold_sums(
            j.map_batches(part, batch_format="pyarrow"), "node", [out_col])

    def indeg(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"node": pa.array(u),
                         "a1": pa.array(cnt.astype(np.int64))})

    auth1 = sorted_fold_sums(
        e.map_batches(indeg, batch_format="pyarrow"), "node", ["a1"])
    hub1 = fold_over("v", auth1, "a1", "u", "h1")
    # auth2 feeds BOTH the hub2 round and the final attach — pin it
    auth2 = fold_over("u", hub1, "h1", "v", "a2").materialize()
    hub2 = fold_over("v", auth2, "a2", "u", "h2")

    def universe(batch: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate(
            [batch["u"].to_numpy(zero_copy_only=False),
             batch["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(n), "_one": pa.array(
            np.ones(len(n), np.int64))})

    uni = sorted_fold_sums(
        e.map_batches(universe, batch_format="pyarrow"), "node", ["_one"])
    j = bucketed_join(
        bucketed_join(uni, auth2, on="node", num_buckets=16, how="left"),
        hub2, on="node", num_buckets=16, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "node": batch["node"].cast(pa.int64()),
            "auth2": pc.fill_null(batch["a2"].combine_chunks(), 0).cast(
                pa.int64()),
            "hub2": pc.fill_null(batch["h2"].combine_chunks(), 0).cast(
                pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


Q_HITS_SQL = f"""
WITH p AS ({_LI_SQL}),
e AS (SELECT DISTINCT m1 % 65536 AS u, m2 % 65536 AS v FROM p
      WHERE m1 % 65536 <> m2 % 65536),
a1 AS (SELECT v AS node, count(*) AS a1 FROM e GROUP BY 1),
h1 AS (SELECT e.u AS node, sum(a1.a1) AS h1 FROM e
       JOIN a1 ON a1.node = e.v GROUP BY 1),
a2 AS (SELECT e.v AS node, sum(h1.h1) AS a2 FROM e
       JOIN h1 ON h1.node = e.u GROUP BY 1),
h2 AS (SELECT e.u AS node, sum(a2.a2) AS h2 FROM e
       JOIN a2 ON a2.node = e.v GROUP BY 1),
uni AS (SELECT DISTINCT u AS node FROM e
        UNION SELECT DISTINCT v FROM e)
SELECT CAST(uni.node AS BIGINT) AS node,
       CAST(coalesce(a2.a2, 0) AS BIGINT) AS auth2,
       CAST(coalesce(h2.h2, 0) AS BIGINT) AS hub2
FROM uni LEFT JOIN a2 ON a2.node = uni.node
LEFT JOIN h2 ON h2.node = uni.node
"""


def q_embed_infer(sf_dir: str):
    """Batched embedding "inference" over documents on an actor pool
    (text.HashedEncoderStage — weight table built once per actor in
    __init__, vectorized hashed-bag-of-words in __call__): the exact
    runtime shape of model scoring at scale, with a deterministic
    integer model so DuckDB replays every dimension bit-exactly."""
    from osmray.text import HashedEncoderStage

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        HashedEncoderStage, concurrency=2, batch_size=256,
        batch_format="pyarrow")


_EMBED_DIM_SQL = ",\n".join(
    f"  CAST(sum((b * 2654435761 + {d} * 40503) % 4294967296 % 2001 - 1000)"
    f" AS BIGINT) AS e{d}" for d in range(16))

Q_EMBED_INFER_SQL = f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id, {_CF_HASH_LAMBDA.format(w='w')} % 64 AS b FROM toks)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
{_EMBED_DIM_SQL}
FROM h GROUP BY doc_id
"""


def q_stay_points(sf_dir: str):
    """Stay-point detection (Li et al., GeoLife) over per-user
    trajectories: positions are a deterministic random walk (cumsum
    of hashed ±2 steps — a window SUM in SQL), and the classic
    anchor scan finds maximal runs staying within radius 5 of the
    run's FIRST point; a run lasting >= 900 s is a stay. The scan is
    non-associative (anchor resets on break — same class as
    q_debounce/q_seq_packing): one keyed shuffle, one O(group)
    anchor-jump pass (vectorized distance slice per anchor, loop
    over ANCHORS not points); the twin replays it as a recursive CTE
    carrying (anchor, anchor_x, anchor_y) and groups rows by their
    anchor."""
    from osmray.windows import stay_points

    return stay_points(_read(sf_dir, "events",
                             ["event_id", "user_id", "ts"]))


Q_STAY_POINTS_SQL = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) // 1000000, event_id) AS i,
         SUM(event_id * 7919 % 5 - 2) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) // 1000000, event_id) AS x,
         SUM(event_id * 104729 % 5 - 2) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) // 1000000, event_id) AS y
  FROM events),
r(user_id, i, event_id, s, ax, ay, anchor) AS (
  SELECT user_id, i, event_id, s, x, y, event_id
  FROM base WHERE i = 1
  UNION ALL
  SELECT b.user_id, b.i, b.event_id, b.s,
         CASE WHEN (b.x - r.ax) * (b.x - r.ax)
                 + (b.y - r.ay) * (b.y - r.ay) > 25
              THEN b.x ELSE r.ax END,
         CASE WHEN (b.x - r.ax) * (b.x - r.ax)
                 + (b.y - r.ay) * (b.y - r.ay) > 25
              THEN b.y ELSE r.ay END,
         CASE WHEN (b.x - r.ax) * (b.x - r.ax)
                 + (b.y - r.ay) * (b.y - r.ay) > 25
              THEN b.event_id ELSE r.anchor END
  FROM base b JOIN r ON b.user_id = r.user_id AND b.i = r.i + 1),
seg AS (SELECT user_id, anchor AS start_event, count(*) AS n_pts,
               max(s) - min(s) AS dur_s
        FROM r GROUP BY 1, 2)
SELECT user_id, start_event, CAST(n_pts AS BIGINT) AS n_pts,
       CAST(dur_s AS BIGINT) AS dur_s
FROM seg WHERE dur_s >= 900
"""


def q_dither(sf_dir: str):
    """Ordered 4x4 Bayer dithering (halftoning) as an actor-pool
    stage (multimodal.DitherStage — threshold matrix tiled once per
    actor) over the planted two-level fixture: a 40-gray pixel turns
    white under 2 of the 16 Bayer thresholds and a 200-gray pixel
    under 12, so per image n_white = 768*n1 + 128*(64 - n1) for n1
    bright 32x32 blocks — the closed form the twin replays from the
    planted bit pattern while the engine dithers real decoded
    pixels."""
    from osmray import oraclefix
    from osmray.multimodal import DitherStage

    images = oraclefix.load_phash()

    def keep(batch: pa.Table) -> pa.Table:
        return batch.select(["image_id", "bytes", "fmt", "idx"])

    return images.map_batches(keep, batch_format="pyarrow").map_batches(
        DitherStage, batch_format="pyarrow", concurrency=2, num_cpus=1)


Q_DITHER_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS n1 FROM phbits GROUP BY i)
SELECT i AS idx,
  CAST(768 * n1 + 128 * (64 - n1) AS BIGINT) AS n_white
FROM pc
"""


def q_wordpiece(sf_dir: str):
    """Subword tokenization cost under a learned vocabulary — the
    tokenizer-budget operator: the vocab is the exact top-20 corpus
    words (count desc, word asc — one distributed count + K rows of
    driver state, as q_oov_rate) plus implicit single characters;
    every word tokenizes by GREEDY LONGEST-MATCH (at each position
    take the longest vocab piece matching there, else one char) —
    the WordPiece/maximal-munch runtime. Per doc: n_tokens and total
    n_subtokens. Tokenization is per-word pure, computed once per
    block-distinct word; the twin replays the greedy scan as a
    recursive CTE stepping (word, pos) with a LEFT JOIN picking
    max(length(piece)) per step."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    uni = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, False),
                         batch_format="pyarrow"), ["w"])
    top = uni.sort(["n", "w"], descending=[True, False]).limit(20)
    vocab = sorted(r["w"] for r in top.iter_rows())

    def n_sub(word: str) -> int:
        pos, cnt = 0, 0
        while pos < len(word):
            step = 1
            for v in vocab:
                lv = len(v)
                if lv > step and word[pos:pos + lv] == v:
                    step = lv
            pos += step
            cnt += 1
        return cnt

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [w for ws in toks for w in ws]
        nt = np.asarray([len(ws) for ws in toks], np.int64)
        ns = np.zeros(len(ids), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            costs = np.asarray([n_sub(w) for w in u], np.int64)
            for k, ws in enumerate(toks):
                ns[k] = int(costs[np.searchsorted(u, np.asarray(ws))].sum())
        return pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(nt),
                         "n_subtokens": pa.array(ns)})

    return docs.map_batches(per_doc, batch_format="pyarrow")


Q_WORDPIECE_SQL = """
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS ws
                        FROM documents),
uni AS (SELECT w, count(*) AS n
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
vocab AS (SELECT w FROM uni ORDER BY n DESC, w ASC LIMIT 20),
words AS (SELECT DISTINCT unnest(ws) AS word FROM toks),
r(word, pos, nt) AS (
  SELECT word, CAST(1 AS BIGINT), CAST(0 AS BIGINT) FROM words
  UNION ALL
  SELECT r.word,
         r.pos + coalesce(max(CASE WHEN length(v.w) > 1
                               THEN length(v.w) END), 1),
         r.nt + 1
  FROM r LEFT JOIN vocab v
    ON substr(r.word, CAST(r.pos AS INT), length(v.w)) = v.w
  WHERE r.pos <= length(r.word)
  GROUP BY r.word, r.pos, r.nt),
done AS (SELECT word, nt AS n_sub FROM r WHERE pos > length(word)),
tw AS (SELECT doc_id, unnest(ws) AS w FROM toks)
SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(done.n_sub) AS BIGINT) AS n_subtokens
FROM tw JOIN done ON done.word = tw.w GROUP BY 1
"""


def q_st_join(sf_dir: str):
    """Spatio-temporal join — the incident-correlation primitive
    (events within 8 px Chebyshev AND 600 s of each incident): the
    PBSM distance-join pattern lifted to THREE dimensions — incidents
    (event_id % 97 == 0) replicate to the (16 px x 16 px x 1024 s)
    grid cells covering their space-time box (<= ~12 copies), points
    live in exactly ONE cell (pairs born deduplicated), one grace
    join on the packed (t, x, y) cell key, exact integer box verify
    in-task, keyed count fold, and a left join keeps zero-match
    incidents. No broadcast side, no driver state — the partitioning
    key is the composite space-time cell, the single key every stage
    reuses."""
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "events", ["event_id", "ts"])
    D, T = 48, 14400  # 64 px spatial cells, 16384 s time cells

    def pts(batch: pa.Table) -> pa.Table:
        ii = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        return pa.table({
            "pid": pa.array(ii),
            "x": pa.array(ii * 7919 % 256), "y": pa.array(ii * 104729 % 256),
            "s": pa.array(s),
            "cell": pa.array(((s >> 14) + 2) * 64
                             + (((ii * 7919 % 256) >> 6) + 1) * 8
                             + (((ii * 104729 % 256) >> 6) + 1))})

    points = ds.map_batches(pts, batch_format="pyarrow")

    def explode_inc(batch: pa.Table) -> pa.Table:
        ii = batch["pid"].to_numpy(zero_copy_only=False)
        keep = ii % 97 == 0
        ii = ii[keep]
        x = batch["x"].to_numpy(zero_copy_only=False)[keep]
        y = batch["y"].to_numpy(zero_copy_only=False)[keep]
        s = batch["s"].to_numpy(zero_copy_only=False)[keep]
        cx0, cx1 = (x - D) >> 6, (x + D) >> 6
        cy0, cy1 = (y - D) >> 6, (y + D) >> 6
        ct0, ct1 = (s - T) >> 14, (s + T) >> 14
        # vectorized variable-count replication (the distance_join
        # explode pattern lifted to 3-D): per incident the covering
        # box is (nt x nx x ny) cells; local offsets come from a
        # global arange minus each incident's start offset
        nt, nx, ny = ct1 - ct0 + 1, cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nt * nx * ny
        total = int(rep.sum())
        if total == 0:
            return pa.table({k: pa.array([], pa.int64())
                             for k in ("iid", "ix", "iy", "is_", "cell")})
        ri = np.repeat(np.arange(len(ii)), rep)
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        ct = ct0[ri] + off // (nx * ny)[ri]
        rem = off % (nx * ny)[ri]
        cx = cx0[ri] + rem // ny[ri]
        cy = cy0[ri] + rem % ny[ri]
        return pa.table({
            "iid": pa.array(ii[ri].astype(np.int64)),
            "ix": pa.array(x[ri].astype(np.int64)),
            "iy": pa.array(y[ri].astype(np.int64)),
            "is_": pa.array(s[ri].astype(np.int64)),
            "cell": pa.array(((ct + 2) * 64 + (cx + 1) * 8
                              + (cy + 1)).astype(np.int64))})

    inc = points.map_batches(explode_inc, batch_format="pyarrow")
    j = bucketed_join(points, inc, on="cell", num_buckets=32)

    def verify(batch: pa.Table) -> pa.Table:
        px = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        ps = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = batch["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = batch["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = batch["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_ = batch["is_"].to_numpy(zero_copy_only=False).astype(np.int64)
        iid = batch["iid"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = ((np.abs(px - ix) <= D) & (np.abs(py - iy) <= D)
              & (np.abs(ps - is_) <= T) & (pid != iid))
        u, cnt = np.unique(iid[ok], return_counts=True)
        return pa.table({"iid": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    matched = sorted_fold_sums(
        j.map_batches(verify, batch_format="pyarrow"), "iid", ["n"])

    def inc_ids(batch: pa.Table) -> pa.Table:
        ii = batch["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"iid": pa.array(ii[ii % 97 == 0])})

    base = points.map_batches(inc_ids, batch_format="pyarrow")
    out = bucketed_join(base, matched, on="iid", num_buckets=8, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "event_id": batch["iid"].cast(pa.int64()),
            "n_near": pc.fill_null(batch["n"].combine_chunks(), 0).cast(
                pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


Q_ST_JOIN_SQL = """
WITH pts AS (SELECT event_id, event_id * 7919 % 256 AS x,
                    event_id * 104729 % 256 AS y,
                    epoch_us(ts) // 1000000 AS s FROM events),
inc AS (SELECT * FROM pts WHERE event_id % 97 = 0),
m AS (SELECT i.event_id AS iid, count(*) AS n FROM inc i JOIN pts p
      ON abs(p.x - i.x) <= 48 AND abs(p.y - i.y) <= 48
         AND abs(p.s - i.s) <= 14400 AND p.event_id <> i.event_id
      GROUP BY 1)
SELECT inc.event_id, CAST(coalesce(m.n, 0) AS BIGINT) AS n_near
FROM inc LEFT JOIN m ON m.iid = inc.event_id
"""


def q_ppr(sf_dir: str):
    """Personalized PageRank as INTEGER mass diffusion (random walk
    with restart, floor-division arithmetic — no float op-order to
    match, every round bit-exact by construction): seeds (node %
    1009 == 0) get a restart injection of 1e9 every round; each round
    every node pushes floor(floor(m*85/100)/outdeg) along each
    out-edge; 6 unrolled rounds. Two engines (graph-engine policy,
    pinned equal in pytest): broadcast O(V) mass array + one edge
    pass per round under the cap; above it, per round ONE grace join
    (attach mass+outdeg at the source) + ONE keyed integer fold —
    the q_hits scatter/fold shape, zero driver state."""
    return ppr_mass(_li_hash_edges(sf_dir), prededuped=True)


def ppr_mass(packed_edges, rounds: int = 6, R: int = 1_000_000_000,
             seed_mod: int = 1009, mode: str = "auto",
             broadcast_cap: int = 50_000_000, prededuped: bool = False):
    """Integer personalized-PageRank diffusion — see q_ppr. Input:
    Dataset with a packed ``pk = u * 65536 + v`` edge column (may
    contain duplicates; deduplicated exactly here)."""
    import ray

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    e = (packed_edges if prededuped
         else _dedup_packed_edges(packed_edges))

    if mode == "auto":
        mode = "broadcast" if 2 * e.count() <= broadcast_cap else "keyed"

    if mode == "broadcast":
        nodes = np.unique(np.concatenate([
            e.map_batches(
                lambda b: pa.table({"n": pa.array(np.unique(np.concatenate(
                    [b["u"].to_numpy(zero_copy_only=False),
                     b["v"].to_numpy(zero_copy_only=False)])))}),
                batch_format="pyarrow").to_pandas()["n"].to_numpy()])
        ).astype(np.int64)
        deg = np.zeros(len(nodes), np.int64)
        dparts = e.map_batches(
            lambda b: pa.table({"n": pa.array(np.unique(
                b["u"].to_numpy(zero_copy_only=False),
                return_counts=True)[0]),
                "c": pa.array(np.unique(
                    b["u"].to_numpy(zero_copy_only=False),
                    return_counts=True)[1].astype(np.int64))}),
            batch_format="pyarrow").to_pandas()
        np.add.at(deg, np.searchsorted(nodes, dparts["n"].to_numpy()),
                  dparts["c"].to_numpy())
        seed = nodes % seed_mod == 0
        mass = np.where(seed, R, 0).astype(np.int64)
        # the keyed engine / SQL twin keep a row for every node that
        # was pushed to (even with floor-division mass 0) or seeded —
        # track that "touched" set exactly
        touched = seed.copy()
        for _ in range(rounds):
            ref = ray.put((mass, touched))

            def push(batch: pa.Table) -> pa.Table:
                m, tch = ray.get(ref)
                u = batch["u"].to_numpy(zero_copy_only=False)
                v = batch["v"].to_numpy(zero_copy_only=False)
                ui = np.searchsorted(nodes, u)
                sel = tch[ui]
                p = m[ui[sel]] * 85 // 100 // deg[ui[sel]]
                t, inv = np.unique(v[sel], return_inverse=True)
                return pa.table({"n": pa.array(t), "m": pa.array(
                    np.bincount(inv, weights=p).astype(np.int64))})

            parts = e.map_batches(push, batch_format="pyarrow").to_pandas()
            new = np.where(seed, R, 0).astype(np.int64)
            new_touched = seed.copy()
            if len(parts):
                ti = np.searchsorted(nodes, parts["n"].to_numpy())
                np.add.at(new, ti, parts["m"].to_numpy().astype(np.int64))
                new_touched[ti] = True
            mass, touched = new, new_touched
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array(nodes[touched]),
            "mass": pa.array(mass[touched])}))

    def outdeg(batch: pa.Table) -> pa.Table:
        u, cnt = np.unique(
            batch["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({"node": pa.array(u),
                         "deg": pa.array(cnt.astype(np.int64))})

    deg = sorted_fold_sums(
        e.map_batches(outdeg, batch_format="pyarrow"), "node", ["deg"])
    ed = bucketed_join(e, deg, on="u", right_on="node",
                       num_buckets=16).materialize()

    def seed_mass(batch: pa.Table) -> pa.Table:
        n = np.unique(np.concatenate(
            [batch["u"].to_numpy(zero_copy_only=False),
             batch["v"].to_numpy(zero_copy_only=False)]))
        s = n[n % seed_mod == 0]
        return pa.table({"node": pa.array(s),
                         "m": pa.array(np.full(len(s), 1, np.int64))})

    # block-partial seed emission folds to the exact seed set
    seeds = sorted_fold_sums(
        e.map_batches(seed_mass, batch_format="pyarrow"), "node", ["m"])

    def to_R(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "m": pa.array(
            np.full(b.num_rows, R, np.int64))})

    mass = seeds.map_batches(to_R, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        j = bucketed_join(ed, mass, on="u", right_on="node",
                          num_buckets=16)

        def push(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = batch["m"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = batch["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            p = m * 85 // 100 // d
            u, inv = np.unique(v, return_inverse=True)
            return pa.table({"node": pa.array(u), "m": pa.array(
                np.bincount(inv, weights=p).astype(np.int64))})

        pushed = sorted_fold_sums(
            j.map_batches(push, batch_format="pyarrow"), "node", ["m"])
        restart = seeds.map_batches(to_R, batch_format="pyarrow")
        mass = sorted_fold_sums(pushed.union(restart),
                                "node", ["m"]).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"].cast(pa.int64()),
                         "mass": batch["m"].cast(pa.int64())})

    return mass.map_batches(finish, batch_format="pyarrow")


def _ppr_round_sql(prev: str, cur: str) -> str:
    return f"""p{cur} AS (SELECT e.v AS node,
    sum(m{prev}.m * 85 // 100 // deg.d) AS m
  FROM e JOIN m{prev} ON m{prev}.node = e.u
  JOIN deg ON deg.node = e.u GROUP BY 1),
m{cur} AS (SELECT node, CAST(sum(m) AS BIGINT) AS m FROM (
  SELECT node, m FROM p{cur}
  UNION ALL SELECT node, 1000000000 AS m FROM seeds) GROUP BY 1)"""


Q_PPR_SQL = f"""
WITH p AS ({_LI_SQL}),
e AS (SELECT DISTINCT m1 % 65536 AS u, m2 % 65536 AS v FROM p
      WHERE m1 % 65536 <> m2 % 65536),
deg AS (SELECT u AS node, count(*) AS d FROM e GROUP BY 1),
uni AS (SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e),
seeds AS (SELECT node FROM uni WHERE node % 1009 = 0),
m0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS m FROM seeds),
{_ppr_round_sql('0', '1')},
{_ppr_round_sql('1', '2')},
{_ppr_round_sql('2', '3')},
{_ppr_round_sql('3', '4')},
{_ppr_round_sql('4', '5')},
{_ppr_round_sql('5', '6')}
SELECT CAST(node AS BIGINT) AS node, m AS mass FROM m6
"""


def q_dp_counts(sf_dir: str):
    """Noisy-histogram release, differential-privacy SHAPED (the
    aggregate -> per-cell seeded noise -> clamp pipeline a private
    telemetry release runs; the noise here is a DETERMINISTIC
    splitmix64 draw standing in for Laplace — same runtime shape, not
    a privacy guarantee): per user-bucket (user_id % 64) event
    counts, noise = pmod(hash64(bucket, seed 7), 21) - 10, released =
    max(count + noise, 0). One pre-aggregated keyed fold over 64
    bounded cells; the twin replays hash64 via the HUGEINT limb
    CTEs."""
    from osmray.stages import hash64
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "events", ["user_id"])

    def partials(batch: pa.Table) -> pa.Table:
        b = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64) % 64
        u, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = sorted_fold_sums(
        ds.map_batches(partials, batch_format="pyarrow"), "bucket", ["n"])

    def release(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        noise = hash64(b, 7) % 21 - 10  # numpy % is pmod
        return pa.table({
            "bucket": pa.array(b), "released": pa.array(
                np.maximum(n + noise, 0).astype(np.int64))})

    return counts.map_batches(release, batch_format="pyarrow")


Q_DP_COUNTS_SQL = f"""
WITH cnt AS (SELECT user_id % 64 AS bucket, count(*) AS n
             FROM events GROUP BY 1),
{hash64_ctes('dh', 'cnt', 'bucket, n', 'bucket', 7)}
SELECT bucket,
  CAST(greatest(n + ((h % 21) + 21) % 21 - 10, 0) AS BIGINT) AS released
FROM dh5
"""


def q_audio_pitch(sf_dir: str):
    """AMDF pitch tracking (integer average-magnitude-difference,
    the autocorrelation-family detector) over REAL RIFF/PCM16 wav
    bytes on an actor pool (multimodal.AudioPitchStage): pitch lag =
    argmin over lag L in [1, 128] of sum |pcm[t+L] - pcm[t]| on the
    first 2048 samples, ties to the smallest lag. The planted
    sawtooth makes every AMDF value a closed integer the twin
    recomputes from the same formula — the engine decodes real
    bytes, the oracle never sees them."""
    import ray.data

    from osmray.multimodal import AudioPitchStage, wav_encode

    n = 128
    rows = [
        {
            "media_id": f"aud{i:05d}",
            "bytes": wav_encode(_planted_pcm(i, 16384 + (i % 7) * 1000),
                                16000),
            "fmt": "wav",
        }
        for i in range(n)
    ]
    return ray.data.from_items(rows).map_batches(
        AudioPitchStage, batch_format="pyarrow", concurrency=2,
        num_cpus=1)


Q_AUDIO_PITCH_SQL = """
WITH au AS (SELECT CAST(t.range AS BIGINT) AS i,
                   3 + 2 * (t.range % 5) AS a,
                   (t.range * 17) % 4096 AS b
            FROM range(0, 128) t),
lag_t AS (SELECT CAST(t.range AS BIGINT) AS L FROM range(1, 129) t),
tt AS (SELECT CAST(t.range AS BIGINT) AS s FROM range(0, 2048) t),
d AS (SELECT au.i, lag_t.L,
        sum(abs((((tt.s + lag_t.L) * au.a + au.b) % 4096)
                - ((tt.s * au.a + au.b) % 4096))) AS amdf
      FROM au CROSS JOIN lag_t JOIN tt ON tt.s + lag_t.L <= 2047
      GROUP BY 1, 2),
best AS (SELECT i, L, amdf,
           row_number() OVER (PARTITION BY i ORDER BY amdf ASC, L ASC)
             AS rn FROM d)
SELECT printf('aud%05d', i) AS media_id,
       CAST(L AS BIGINT) AS pitch_lag, CAST(amdf AS BIGINT) AS amdf_min
FROM best WHERE rn = 1
"""


def q_cusum(sf_dir: str):
    """CUSUM changepoint / drift alarms per user value stream (the
    statistical-process-control detector): values quantize to integer
    centi-units (floor(value*100) — one IEEE op, bit-identical in
    both engines), the one-sided CUSUM statistic steps
    s = max(0, s + vi - 7500) in (ts, event_id) order, and an ALARM
    fires when s > 40000, resetting s to 0 (reset-on-alarm makes the
    scan non-associative — q_debounce's class: one keyed shuffle, one
    O(group) pass). Emits per user (n_alarms, max_s); the twin
    replays the scan as a recursive CTE."""
    from osmray.windows import cusum_alarms

    return cusum_alarms(_read(sf_dir, "events",
                              ["event_id", "user_id", "ts", "value"]))


Q_CUSUM_SQL = """
WITH RECURSIVE base AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vi,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id) AS i
  FROM events),
r(user_id, i, s, n_alarms, max_s) AS (
  SELECT user_id, i,
         CASE WHEN greatest(0, vi - 7500) > 40000 THEN 0
              ELSE greatest(0, vi - 7500) END,
         CASE WHEN greatest(0, vi - 7500) > 40000 THEN 1 ELSE 0 END,
         CASE WHEN greatest(0, vi - 7500) > 40000 THEN 0
              ELSE greatest(0, vi - 7500) END
  FROM base WHERE i = 1
  UNION ALL
  SELECT b.user_id, b.i,
         CASE WHEN greatest(0, r.s + b.vi - 7500) > 40000 THEN 0
              ELSE greatest(0, r.s + b.vi - 7500) END,
         r.n_alarms + CASE WHEN greatest(0, r.s + b.vi - 7500) > 40000
                           THEN 1 ELSE 0 END,
         greatest(r.max_s,
           CASE WHEN greatest(0, r.s + b.vi - 7500) > 40000 THEN 0
                ELSE greatest(0, r.s + b.vi - 7500) END)
  FROM base b JOIN r ON b.user_id = r.user_id AND b.i = r.i + 1)
SELECT user_id, CAST(max(n_alarms) AS BIGINT) AS n_alarms,
       CAST(max(max_s) AS BIGINT) AS max_s
FROM r GROUP BY user_id
"""


def q_sax(sf_dir: str):
    """SAX symbolization (PAA + breakpoint quantization — the
    time-series indexing/similarity primitive): each user's (ts,
    event_id)-ordered centi-unit value series splits into 8 PAA
    segments (element i -> segment i*8//n); the global breakpoints are
    the EXACT quartiles of all values (tableops.exact_order_stats —
    one distributed sort, O(#blocks) driver state, ranks
    max(1, n*p//100)); a segment's symbol is the count of
    breakpoints b with seg_sum > b*seg_len (cross-multiplied — no
    division, integer-exact), and the 8 symbols pack base-4 into one
    int64 SAX word. Output (user_id, sax); equal words = similarity
    buckets. The twin recomputes quartiles by rank and replays the
    same integer comparisons."""
    from osmray.tableops import exact_order_stats

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def vi_col(batch: pa.Table) -> pa.Table:
        return pa.table({"vi": pa.array(np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64))})

    qs = exact_order_stats(
        ds.map_batches(vi_col, batch_format="pyarrow"),
        "vi", [25, 50, 75]).to_pandas().sort_values("p")
    bks = qs["value"].to_numpy().astype(np.int64)  # q1, q2, q3

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.floor(g["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        order = np.lexsort((ii, tv))
        vi = vi[order]
        n = len(vi)
        uid = int(g["user_id"][0].as_py())
        seg_of = np.arange(n, dtype=np.int64) * 8 // n
        word = 0
        for k in range(8):
            m = seg_of == k
            seg_len = int(m.sum())
            seg_sum = int(vi[m].sum())
            sym = sum(1 for bk in bks
                      if seg_len > 0 and seg_sum > int(bk) * seg_len)
            word = word * 4 + sym
        return pa.table({"user_id": pa.array([uid], pa.int64()),
                         "sax": pa.array([word], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


Q_SAX_SQL = """
WITH v AS (SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vi,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) - 1 AS i,
                  count(*) OVER (PARTITION BY user_id) AS n
           FROM events),
allv AS (SELECT CAST(floor(value * 100) AS BIGINT) AS vi,
                ROW_NUMBER() OVER (ORDER BY floor(value * 100)) AS r,
                count(*) OVER () AS n
         FROM events),
bk AS (SELECT p.p AS p, a.vi AS b FROM (VALUES (25), (50), (75)) p(p)
       JOIN allv a ON a.r = greatest(1, a.n * p.p // 100)),
seg AS (SELECT user_id, CAST(i * 8 // n AS BIGINT) AS k,
               sum(vi) AS seg_sum, count(*) AS seg_len
        FROM v GROUP BY 1, 2),
sym AS (SELECT seg.user_id, seg.k,
               sum(CASE WHEN seg.seg_sum > bk.b * seg.seg_len
                        THEN 1 ELSE 0 END) AS s
        FROM seg CROSS JOIN bk GROUP BY 1, 2),
word AS (SELECT user_id,
                sum(s * CAST(pow(4, 7 - k) AS BIGINT)) AS sax
         FROM sym GROUP BY 1)
SELECT user_id, CAST(sax AS BIGINT) AS sax FROM word
"""


def q_auc(sf_dir: str):
    """Exact AUC (Mann-Whitney rank-sum with tie-averaged ranks) of
    the hashed-linear quality score predicting lang == 'en' — the
    classifier-evaluation primitive, in pure integers: per distinct
    score the fold carries (n, n_pos); the tie-corrected doubled
    positive rank-sum is sum over score groups of
    n_pos*(2*n_below + n + 1), and the emitted single row
    (n_pos, n_neg, u2 = 2R+ - P*(P+1)) determines
    AUC = u2 / (2*P*N) exactly. One keyed fold by score + a driver
    prefix over DISTINCT scores (bounded by the integer model's
    score range; swap in the distributed prefix-scan machinery if a
    model had unbounded outputs)."""
    from osmray.tableops import sorted_fold_sums

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def scored(batch: pa.Table) -> pa.Table:
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        lbl = np.asarray(
            [1 if l == "en" else 0 for l in batch["lang"].to_pylist()],
            np.int64)
        flat = [w for ws in toks for w in ws]
        sc = np.zeros(len(toks), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            wt = (_char_fold_hash(u) % 256) * 2654435761 % (1 << 32) \
                % 2001 - 1000
            for k, ws in enumerate(toks):
                sc[k] = int(wt[np.searchsorted(u, np.asarray(ws))].sum())
        # block partials per distinct score
        us, inv = np.unique(sc, return_inverse=True)
        return pa.table({
            "score": pa.array(us),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "npos": pa.array(np.bincount(
                inv, weights=lbl).astype(np.int64))})

    g = sorted_fold_sums(
        docs.map_batches(scored, batch_format="pyarrow"),
        "score", ["n", "npos"]).to_pandas().sort_values("score")
    n = g["n"].to_numpy().astype(np.int64)
    npos = g["npos"].to_numpy().astype(np.int64)
    below = np.concatenate(([0], np.cumsum(n)[:-1]))
    P = int(npos.sum())
    N = int(n.sum()) - P
    r2 = int((npos * (2 * below + n + 1)).sum())
    return pa.table({"n_pos": pa.array([P], pa.int64()),
                     "n_neg": pa.array([N], pa.int64()),
                     "u2": pa.array([r2 - P * (P + 1)], pa.int64())})


Q_AUC_SQL = f"""
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id, lang,
        {_CF_HASH_LAMBDA.format(w='w')} % 256 AS b FROM toks),
s AS (SELECT doc_id, max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS lbl,
        sum(b * 2654435761 % 4294967296 % 2001 - 1000) AS score
      FROM h GROUP BY doc_id),
g AS (SELECT score, count(*) AS n, sum(lbl) AS npos FROM s GROUP BY 1),
w AS (SELECT score, n, npos,
        coalesce(sum(n) OVER (ORDER BY score
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM g),
tot AS (SELECT sum(npos) AS p, sum(n) - sum(npos) AS nn FROM g),
r AS (SELECT sum(npos * (2 * below + n + 1)) AS r2 FROM w)
SELECT CAST(tot.p AS BIGINT) AS n_pos, CAST(tot.nn AS BIGINT) AS n_neg,
       CAST(r.r2 - tot.p * (tot.p + 1) AS BIGINT) AS u2
FROM r, tot
"""


def q_geofence(sf_dir: str):
    """Geofence transition counting (the enter/exit event stream a
    location platform derives per device): over the same
    deterministic random-walk trajectories as q_stay_points, the
    fence is the box |x| <= 10 AND |y| <= 10; per user emit counts of
    ENTER transitions (outside -> inside), EXIT transitions and
    total inside samples. One keyed shuffle, vectorized lag compare
    per group; lag-window SQL twin."""
    from osmray.windows import geofence_transitions

    return geofence_transitions(_read(sf_dir, "events",
                                      ["event_id", "user_id", "ts"]))


Q_GEOFENCE_SQL = """
WITH base AS (
  SELECT user_id,
         SUM(event_id * 7919 % 5 - 2) OVER w AS x,
         SUM(event_id * 104729 % 5 - 2) OVER w AS y,
         ROW_NUMBER() OVER w AS i
  FROM events
  WINDOW w AS (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id)),
f AS (SELECT user_id, i,
        CASE WHEN abs(x) <= 10 AND abs(y) <= 10 THEN 1 ELSE 0 END
          AS inside
      FROM base),
t AS (SELECT user_id, inside,
        coalesce(lag(inside) OVER (PARTITION BY user_id ORDER BY i), 0)
          AS prev
      FROM f)
SELECT user_id,
  CAST(sum(CASE WHEN inside = 1 AND prev = 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_enter,
  CAST(sum(CASE WHEN inside = 0 AND prev = 1 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_exit,
  CAST(sum(inside) AS BIGINT) AS n_inside
FROM t GROUP BY user_id
"""


def q_lpm(sf_dir: str):
    """Longest-prefix-match routing join (the IP-routing / CIDR
    lookup primitive): a route table of (length, prefix, route_id)
    entries at lengths {8, 12, 16} over 24-bit addresses, each
    address matches the LONGEST route whose prefix equals
    address >> (24 - L) (ties at equal length -> min route_id);
    unmatched addresses fall to route -1. Addresses probe exactly 3
    candidate keys each — the bounded-expansion trick that makes LPM
    a hash join instead of a scan. Route side broadcasts (route
    tables are small by nature — ray.put once, binary-searched per
    batch); output is the bounded per-route address count."""
    import ray

    from osmray.tableops import sorted_fold_sums

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    pt = _read(sf_dir, "part", ["p_partkey"])

    def routes(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = k[k % 50 == 0]
        L = 8 + 4 * (k % 3)
        pre = (k * 2654435761 % (1 << 24)) >> (24 - L)
        return pa.table({"L": pa.array(L), "pre": pa.array(pre),
                         "rid": pa.array(k)})

    # route side extracted distributed, only the route ENTRIES come
    # to the driver (route tables are small by nature)
    rt = pt.map_batches(routes, batch_format="pyarrow").to_pandas()
    # dedup (L, pre) -> min rid; sorted arrays for binary search
    L = rt["L"].to_numpy().astype(np.int64)
    pre = rt["pre"].to_numpy().astype(np.int64)
    rid = rt["rid"].to_numpy().astype(np.int64)
    key = L * (1 << 24) + pre
    order = np.lexsort((rid, key))
    ks, rs = key[order], rid[order]
    first = np.concatenate(([True], ks[1:] != ks[:-1]))
    route_keys, route_ids = ks[first], rs[first]
    ref = ray.put((route_keys, route_ids))

    def match(batch: pa.Table) -> pa.Table:
        rk, ri = ray.get(ref)
        p = _li_points(batch)
        a = p["m1"] % (1 << 24)
        out = np.full(len(a), -1, np.int64)
        for Lc in (8, 12, 16):  # ascending: longer match overwrites
            cand = np.int64(Lc) * (1 << 24) + (a >> (24 - Lc))
            pos = np.searchsorted(rk, cand)
            pos_c = np.minimum(pos, len(rk) - 1)
            hit = rk[pos_c] == cand if len(rk) else np.zeros(len(a), bool)
            out[hit] = ri[pos_c[hit]]
        u, cnt = np.unique(out, return_counts=True)
        return pa.table({"route_id": pa.array(u),
                         "n_addrs": pa.array(cnt.astype(np.int64))})

    return sorted_fold_sums(
        li.map_batches(match, batch_format="pyarrow"),
        "route_id", ["n_addrs"])


Q_LPM_SQL = f"""
WITH p AS ({_LI_SQL}),
a AS (SELECT m1 % 16777216 AS addr FROM p),
r0 AS (SELECT p_partkey AS rid, 8 + 4 * (p_partkey % 3) AS L,
              (p_partkey * 2654435761 % 16777216)
                >> CAST(24 - (8 + 4 * (p_partkey % 3)) AS INT) AS pre
       FROM part WHERE p_partkey % 50 = 0),
r AS (SELECT L, pre, min(rid) AS rid FROM r0 GROUP BY 1, 2),
ac AS (SELECT addr, count(*) AS c FROM a GROUP BY 1),
mm AS (SELECT ac.addr, max_by(r.rid, r.L) AS rid
       FROM ac JOIN r ON r.pre = ac.addr >> CAST(24 - r.L AS INT)
       GROUP BY ac.addr)
SELECT coalesce(mm.rid, -1) AS route_id,
       CAST(sum(ac.c) AS BIGINT) AS n_addrs
FROM ac LEFT JOIN mm ON mm.addr = ac.addr
GROUP BY 1
"""


def q_label_noise(sf_dir: str):
    """Noisy-label detection by k-NN label agreement (the Confident-
    Learning-style curation screen): embeddings quantize to integer
    milli-units (floor(x*1000) — IEEE-identical in both engines, and
    integer dot products < 2^53 are EXACT in DuckDB doubles, so the
    similarity order is bit-stable, unlike raw float cosine); each
    vector's 5 nearest neighbors by quantized dot product (self
    excluded, ties -> smaller vec_id) vote on its label, and a
    majority disagreement flags the row. Engine: one broadcast of
    the quantized matrix + vectorized int64 matmul per batch (the
    scale path is the IVF partition layout already standing in
    ann.py); emits (vec_id, label, n_agree, flagged)."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    # brute-force engine = broadcast matrix build: loud cap, not a
    # silent driver OOM — above it, route through ann.ivf_partition
    if emb.count() > 2_000_000:
        raise ValueError("label_noise brute engine caps at 2e6 vectors; "
                         "use the IVF-partitioned layout for more")
    all_df = emb.to_pandas()
    ids = all_df["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = all_df["label"].to_numpy().astype(np.int64)[order]
    M = np.floor(np.stack(all_df["embedding"].to_numpy()[order]
                          ).astype(np.float64) * 1000).astype(np.int64)
    ref = ray.put((ids, labels, M))
    K = 5

    def per_batch(batch: pa.Table) -> pa.Table:
        aids, albl, amat = ray.get(ref)
        vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(np.stack([np.asarray(e, np.float64)
                               for e in batch["embedding"].to_pylist()])
                     * 1000).astype(np.int64)
        dots = q @ amat.T  # int64-exact
        n_agree = np.zeros(len(vid), np.int64)
        for r in range(len(vid)):
            d = dots[r]
            # exclude self by id, order by (-dot, vec_id)
            sel = aids != vid[r]
            o = np.lexsort((aids[sel], -d[sel]))[:K]
            n_agree[r] = int((albl[sel][o] == lbl[r]).sum())
        return pa.table({
            "vec_id": pa.array(vid), "label": pa.array(lbl),
            "n_agree": pa.array(n_agree),
            "flagged": pa.array((2 * n_agree < K).astype(np.int64))})

    return emb.map_batches(per_batch, batch_format="pyarrow")


Q_LABEL_NOISE_SQL = """
WITH q AS (SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> floor(x * 1000)) AS v
           FROM embeddings),
d AS (SELECT a.vec_id, a.label, b.label AS nlbl,
        ROW_NUMBER() OVER (PARTITION BY a.vec_id
          ORDER BY list_dot_product(a.v, b.v) DESC, b.vec_id) AS rnk
      FROM q a JOIN q b ON b.vec_id <> a.vec_id)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       CAST(sum(CASE WHEN nlbl = label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST(CASE WHEN 2 * sum(CASE WHEN nlbl = label THEN 1 ELSE 0 END)
                 < 5 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM d WHERE rnk <= 5 GROUP BY vec_id, label
"""


def q_theil_sen(sf_dir: str):
    """Robust trend estimation (Theil-Sen over consecutive samples):
    per user the slopes of consecutive (ts, value) pairs as RATIONALS
    (dv centi-units, dt seconds — never divided into a lossy float
    for the result), the median slope picked at rank ceil(m/2) under
    the order (IEEE dv/dt, dv, dt) — the float is used for ORDERING
    only, where both engines compute the identical correctly-rounded
    quotient, and the lexicographic tail breaks float ties
    deterministically. Emits (user_id, n_slopes, med_dv, med_dt).
    One keyed shuffle, vectorized diff + argsort per group."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.floor(g["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        order = np.lexsort((ii, tv))
        tv, vi = tv[order], vi[order]
        uid = int(g["user_id"][0].as_py())
        dt = np.diff(tv)
        dv = np.diff(vi)
        keep = dt > 0  # coincident-second samples define no slope
        dv, dt = dv[keep], dt[keep]
        m = len(dv)
        if m == 0:
            return pa.table({"user_id": pa.array([uid], pa.int64()),
                             "n_slopes": pa.array([0], pa.int64()),
                             "med_dv": pa.array([0], pa.int64()),
                             "med_dt": pa.array([0], pa.int64())})
        o = np.lexsort((dt, dv, dv.astype(np.float64) / dt))
        k = (m + 1) // 2 - 1
        return pa.table({"user_id": pa.array([uid], pa.int64()),
                         "n_slopes": pa.array([m], pa.int64()),
                         "med_dv": pa.array([int(dv[o[k]])], pa.int64()),
                         "med_dt": pa.array([int(dt[o[k]])], pa.int64())})

    return ds.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


Q_THEIL_SEN_SQL = """
WITH base AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vi,
         epoch_us(ts) // 1000000 AS s,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) // 1000000, event_id) AS i
  FROM events),
sl AS (SELECT a.user_id, b.vi - a.vi AS dv, b.s - a.s AS dt
       FROM base a JOIN base b
         ON b.user_id = a.user_id AND b.i = a.i + 1
       WHERE b.s - a.s > 0),
rk AS (SELECT user_id, dv, dt,
         ROW_NUMBER() OVER (PARTITION BY user_id
           ORDER BY CAST(dv AS DOUBLE) / dt, dv, dt) AS r,
         count(*) OVER (PARTITION BY user_id) AS m
       FROM sl),
med AS (SELECT user_id, m AS n_slopes, dv AS med_dv, dt AS med_dt
        FROM rk WHERE r = (m + 1) // 2),
uni AS (SELECT DISTINCT user_id FROM events)
SELECT uni.user_id,
  CAST(coalesce(med.n_slopes, 0) AS BIGINT) AS n_slopes,
  CAST(coalesce(med.med_dv, 0) AS BIGINT) AS med_dv,
  CAST(coalesce(med.med_dt, 0) AS BIGINT) AS med_dt
FROM uni LEFT JOIN med ON med.user_id = uni.user_id
"""


def q_zonemap(sf_dir: str):
    """Zone-map pruning statistics (the min/max fragment-skipping
    analysis every columnar store runs at planning time): fragments
    are l_orderkey // 4096 ranges; each keeps (min, max, n) of the
    centi-quantized extendedprice; against the predicate
    1e6 <= price_centi <= 2e6 a fragment is SKIP (disjoint), FULL
    (contained) or PARTIAL, and the answer reports fragment counts
    plus exact matching rows — the number a zone-map-pruned scan must
    reproduce. One keyed (min/max/sum) fold over fragment partials,
    one O(#frags) classification pass."""
    from osmray.tableops import sorted_fold

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
    P1, P2 = 1_000_000, 2_000_000

    def partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        vi = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        frag = ok // 4096
        u, inv = np.unique(frag, return_inverse=True)
        lo = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        hi = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.minimum.at(lo, inv, vi)
        np.maximum.at(hi, inv, vi)
        nm = np.bincount(inv, weights=((vi >= P1) & (vi <= P2)).astype(
            np.int64)).astype(np.int64)
        return pa.table({"frag": pa.array(u), "lo": pa.array(lo),
                         "hi": pa.array(hi),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "nm": pa.array(nm)})

    folded = sorted_fold(
        ds.map_batches(partials, batch_format="pyarrow"),
        "frag", ["lo", "hi", "n", "nm"], ["min", "max", "sum", "sum"])

    def classify(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
        hi = batch["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
        nm = batch["nm"].to_numpy(zero_copy_only=False).astype(np.int64)
        skip = (hi < P1) | (lo > P2)
        full = (lo >= P1) & (hi <= P2)
        return pa.table({
            "n_frags": pa.array([len(lo)], pa.int64()),
            "n_skip": pa.array([int(skip.sum())], pa.int64()),
            "n_full": pa.array([int(full.sum())], pa.int64()),
            "n_partial": pa.array([int((~skip & ~full).sum())],
                                  pa.int64()),
            "n_match": pa.array([int(nm.sum())], pa.int64())})

    parts = folded.map_batches(classify, batch_format="pyarrow").to_pandas()
    return pa.table({c: pa.array([int(parts[c].sum())], pa.int64())
                     for c in ("n_frags", "n_skip", "n_full",
                               "n_partial", "n_match")})


Q_ZONEMAP_SQL = """
WITH v AS (SELECT l_orderkey // 4096 AS frag,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS vi
           FROM lineitem),
f AS (SELECT frag, min(vi) AS lo, max(vi) AS hi,
             sum(CASE WHEN vi BETWEEN 1000000 AND 2000000
                      THEN 1 ELSE 0 END) AS nm
      FROM v GROUP BY 1)
SELECT CAST(count(*) AS BIGINT) AS n_frags,
  CAST(sum(CASE WHEN hi < 1000000 OR lo > 2000000 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_skip,
  CAST(sum(CASE WHEN lo >= 1000000 AND hi <= 2000000 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_full,
  CAST(sum(CASE WHEN NOT (hi < 1000000 OR lo > 2000000)
                 AND NOT (lo >= 1000000 AND hi <= 2000000)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
  CAST(sum(nm) AS BIGINT) AS n_match
FROM f
"""


def q_cluster_quality(sf_dir: str):
    """Cluster-quality evaluation of the spherical k-means fit (the
    silhouette-style cohesion/separation screen run after any
    embedding clustering): per cluster — member count, summed
    milli-quantized cosine of members to their OWN centroid
    (cohesion), and the max milli-cosine of the centroid to any
    OTHER centroid (separation). Rides the exact kmeans_fit the
    q_ivf_ann twin replays; one streaming assignment pass with
    broadcast centroids + a k-group fold; the 16x16 separation
    matrix is driver-trivial. Float note: cosines milli-quantized
    like the other embedding twins."""
    import ray

    from osmray.ann import _norm_rows, kmeans_fit
    from osmray.tableops import sorted_fold_sums

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent = kmeans_fit(emb, n_centroids=16, n_iters=3)
    cref = ray.put(cent)

    def partials(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        E = _norm_rows(np.asarray(batch["embedding"].to_pylist(),
                                  dtype=np.float64))
        sims = E @ c.T
        lid = np.argmax(sims, axis=1).astype(np.int64)
        mil = np.floor(sims[np.arange(len(lid)), lid] * 1000
                       + 0.5).astype(np.int64)
        u, inv = np.unique(lid, return_inverse=True)
        return pa.table({
            "list_id": pa.array(u),
            "n_members": pa.array(np.bincount(inv).astype(np.int64)),
            "intra_mil_sum": pa.array(
                np.bincount(inv, weights=mil).astype(np.int64))})

    per = sorted_fold_sums(
        emb.map_batches(partials, batch_format="pyarrow"),
        "list_id", ["n_members", "intra_mil_sum"]).to_pandas()
    cc = cent @ cent.T
    np.fill_diagonal(cc, -np.inf)
    sep = np.floor(cc.max(axis=1) * 1000 + 0.5).astype(np.int64)
    per = per.sort_values("list_id")
    lids = per["list_id"].to_numpy().astype(np.int64)
    return pa.table({
        "list_id": pa.array(lids),
        "n_members": pa.array(per["n_members"].to_numpy().astype(
            np.int64)),
        "intra_mil_sum": pa.array(per["intra_mil_sum"].to_numpy().astype(
            np.int64)),
        "max_other_mil": pa.array(sep[lids])})


def _cluster_quality_sql(n_iters: int = 3) -> str:
    parts = _ivf_fit_ctes(16, n_iters, 64)
    n = n_iters
    parts.append(f"""per AS (
  SELECT a.list_id, count(*) AS n_members,
    sum(CAST(floor(list_dot_product(a.e, c.c) * 1000 + 0.5) AS BIGINT))
      AS intra_mil_sum
  FROM assign a JOIN cent{n} c USING (list_id) GROUP BY 1),
sep AS (
  SELECT c1.list_id,
    max(CAST(floor(list_dot_product(c1.c, c2.c) * 1000 + 0.5) AS BIGINT))
      AS max_other_mil
  FROM cent{n} c1 JOIN cent{n} c2 ON c2.list_id <> c1.list_id
  GROUP BY 1)""")
    return ",\n".join(parts) + """
SELECT per.list_id, CAST(per.n_members AS BIGINT) AS n_members,
       CAST(per.intra_mil_sum AS BIGINT) AS intra_mil_sum,
       CAST(sep.max_other_mil AS BIGINT) AS max_other_mil
FROM per JOIN sep ON sep.list_id = per.list_id
"""


Q_CLUSTER_QUALITY_SQL = _cluster_quality_sql()


_NDCG_DISC = [1_000_000 * 1000 // int(np.floor(np.log2(i + 1) * 1000))
              if i > 1 else 1_000_000 for i in range(1, 11)]
# D_i = floor(1e9 / floor(log2(i+1)*1000)): both engines use the same
# 10 precomputed integer literals, so no float log enters the compare


def q_ndcg(sf_dir: str):
    """Retrieval-quality NDCG@10 components (the ranking-evaluation
    primitive): queries are vec_id < 5; candidates rank by the
    MILLI-QUANTIZED integer dot product (bit-stable order, ties ->
    smaller vec_id, self excluded); relevance = label equality; DCG
    uses the 10 shared integer discount literals and IDCG re-sorts
    the retrieved relevance descending — emitted as exact integers
    (NDCG = dcg/idcg). Broadcast quantized matrix + one vectorized
    pass, like q_label_noise."""
    import ray

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    if emb.count() > 2_000_000:  # same loud cap as q_label_noise
        raise ValueError("ndcg brute ranking caps at 2e6 vectors; "
                         "use the IVF-partitioned layout for more")
    df = emb.to_pandas()
    ids = df["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = df["label"].to_numpy().astype(np.int64)[order]
    M = np.floor(np.stack(df["embedding"].to_numpy()[order]
                          ).astype(np.float64) * 1000).astype(np.int64)
    qsel = ids < 5
    disc = np.asarray(_NDCG_DISC, np.int64)
    rows = {"query_id": [], "dcg": [], "idcg": []}
    dots = M[qsel] @ M.T
    for r, qid in enumerate(ids[qsel]):
        d = dots[r]
        sel = ids != qid
        o = np.lexsort((ids[sel], -d[sel]))[:10]
        rel = (labels[sel][o] == labels[ids == qid][0]).astype(np.int64)
        rows["query_id"].append(int(qid))
        rows["dcg"].append(int((rel * disc[:len(rel)]).sum()))
        rows["idcg"].append(int((np.sort(rel)[::-1]
                                 * disc[:len(rel)]).sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


_NDCG_DISC_SQL = ", ".join(f"({i + 1}, {d})"
                           for i, d in enumerate(_NDCG_DISC))

Q_NDCG_SQL = f"""
WITH q AS (SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> floor(x * 1000)) AS v
           FROM embeddings),
qq AS (SELECT * FROM q WHERE vec_id < 5),
d AS (SELECT a.vec_id AS query_id, a.label AS qlbl, b.label AS nlbl,
        ROW_NUMBER() OVER (PARTITION BY a.vec_id
          ORDER BY list_dot_product(a.v, b.v) DESC, b.vec_id) AS rnk
      FROM qq a JOIN q b ON b.vec_id <> a.vec_id),
top AS (SELECT query_id,
          CASE WHEN nlbl = qlbl THEN 1 ELSE 0 END AS rel, rnk
        FROM d WHERE rnk <= 10),
disc(rnk, w) AS (VALUES {_NDCG_DISC_SQL}),
dcg AS (SELECT t.query_id, sum(t.rel * disc.w) AS dcg
        FROM top t JOIN disc ON disc.rnk = t.rnk GROUP BY 1),
ideal AS (SELECT query_id, rel,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rel DESC, rnk ASC) AS irnk
          FROM top),
idcg AS (SELECT i.query_id, sum(i.rel * disc.w) AS idcg
         FROM ideal i JOIN disc ON disc.rnk = i.irnk GROUP BY 1)
SELECT dcg.query_id, CAST(dcg.dcg AS BIGINT) AS dcg,
       CAST(idcg.idcg AS BIGINT) AS idcg
FROM dcg JOIN idcg ON idcg.query_id = dcg.query_id
"""


def q_text_aug(sf_dir: str):
    """Deterministic text augmentation (seeded token dropout — the
    EDA-style corpus-expansion op, with the hash playing the RNG so
    replays are exact): token at position i of doc d drops iff
    pmod(hash64(d * 100003 + i), 10) == 0; emits per doc the kept
    count and an order-sensitive integer checksum of the kept tokens
    (char-fold rolling combine mod 2^31-1) so the twin verifies the
    exact output sequence, not just counts. One vectorized
    map_batches, no shuffle."""
    from osmray.stages import hash64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [w for ws in toks for w in ws]
        n_in = np.asarray([len(ws) for ws in toks], np.int64)
        n_kept = np.zeros(len(ids), np.int64)
        csum = np.zeros(len(ids), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            hu = _char_fold_hash(u)
            for k, ws in enumerate(toks):
                pos = np.arange(len(ws), dtype=np.int64)
                keep = hash64(ids[k] * 100003 + pos, 0) % 10 != 0
                hws = hu[np.searchsorted(u, np.asarray(ws))][keep]
                acc = 0
                for hv in hws:
                    acc = (acc * 131 + int(hv)) % _CF_MOD
                n_kept[k] = int(keep.sum())
                csum[k] = acc
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(n_in),
                         "n_kept": pa.array(n_kept),
                         "kept_csum": pa.array(csum)})

    return docs.map_batches(per_batch, batch_format="pyarrow")


Q_TEXT_AUG_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws
              FROM documents),
idx AS (SELECT CAST(t.range AS INT) AS i FROM range(1, 4096) t),
tw AS (SELECT doc_id, idx.i AS i, ws[idx.i] AS w,
              doc_id * 100003 + (idx.i - 1) AS seedk
       FROM toks JOIN idx ON idx.i <= len(ws)),
{hash64_ctes('th', 'tw', 'doc_id, i, w', 'seedk', 0)},
kept AS (SELECT doc_id, i,
           {_CF_HASH_LAMBDA.format(w='w')} AS wh
         FROM th5 WHERE ((h % 10) + 10) % 10 <> 0),
cs AS (SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_kept,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
           list(wh ORDER BY i)),
           (a, c) -> (a * 131 + c) % 2147483647) AS kept_csum
       FROM kept GROUP BY doc_id),
nt AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM toks)
SELECT nt.doc_id, nt.n_tokens,
       CAST(coalesce(cs.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(cs.kept_csum, 0) AS BIGINT) AS kept_csum
FROM nt LEFT JOIN cs ON cs.doc_id = nt.doc_id
"""


def q_snapshot_diff(sf_dir: str):
    """Dataset-version diff (the table-format audit op: what changed
    between snapshot T1 and T2): each snapshot is the latest
    (ts, event_id)-ordered centi-value per user at its cutoff;
    users classify as added / removed /
    changed / same and the answer is the four counts — the audit
    summary a data-versioning layer prints per commit. One keyed
    pass computes BOTH snapshots (latest-at-cutoff is a per-group
    scan), then a driver-free classify fold."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    T1 = 1_704_088_800  # 2024-01-01 04:00 UTC — four classes at the
    T2 = 1_704_110_400  # test scales: added / none / changed / same

    def per_user(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.floor(g["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        order = np.lexsort((ii, tv))
        tv, vi = tv[order], vi[order]
        uid = int(g["user_id"][0].as_py())

        def latest(cut):
            k = np.searchsorted(tv, cut, side="right")
            return int(vi[k - 1]) if k > 0 else None

        v1, v2 = latest(T1), latest(T2)
        if v1 is None and v2 is None:
            st = "none"
        elif v1 is None:
            st = "added"
        elif v2 is None:
            st = "removed"
        else:
            st = "same" if v1 == v2 else "changed"
        return pa.table({"status": pa.array([st], pa.string()),
                         "n": pa.array([1], pa.int64())})

    per = ds.groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
    from ray.data.aggregate import Sum

    out = per.groupby("status").aggregate(Sum("n", alias_name="n_users"))
    return out.map_batches(
        lambda b: pa.table({
            "status": b["status"],
            "n_users": b["n_users"].cast(pa.int64())}),
        batch_format="pyarrow")


Q_SNAPSHOT_DIFF_SQL = """
WITH v AS (SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS vi,
                  epoch_us(ts) // 1000000 AS s, event_id
           FROM events),
s1 AS (SELECT user_id, vi FROM (
  SELECT user_id, vi, ROW_NUMBER() OVER (PARTITION BY user_id
    ORDER BY s DESC, event_id DESC) AS rn
  FROM v WHERE s <= 1704088800) WHERE rn = 1),
s2 AS (SELECT user_id, vi FROM (
  SELECT user_id, vi, ROW_NUMBER() OVER (PARTITION BY user_id
    ORDER BY s DESC, event_id DESC) AS rn
  FROM v WHERE s <= 1704110400) WHERE rn = 1),
uni AS (SELECT DISTINCT user_id FROM v),
cls AS (SELECT
    CASE WHEN s1.vi IS NULL AND s2.vi IS NULL THEN 'none'
         WHEN s1.vi IS NULL THEN 'added'
         WHEN s2.vi IS NULL THEN 'removed'
         WHEN s1.vi = s2.vi THEN 'same' ELSE 'changed' END AS status
  FROM uni LEFT JOIN s1 ON s1.user_id = uni.user_id
  LEFT JOIN s2 ON s2.user_id = uni.user_id)
SELECT status, CAST(count(*) AS BIGINT) AS n_users
FROM cls GROUP BY status
"""


def q_assoc_rules(sf_dir: str):
    """Association rules over the market baskets (the A-Priori
    completion of q_item_pairs) — directed rules a -> b from pair
    supports (>= 2 common orders) with the integer-exact confidence
    gate n_ab * 10 >= n_a (conf >= 0.1, no float division) plus the
    components (n_ab, n_a) so lift is derivable. Kernel lives in
    tableops.assoc_rules (declarative step "assoc_rules")."""
    from osmray.tableops import assoc_rules

    return assoc_rules(_read(sf_dir, "lineitem",
                             ["l_orderkey", "l_partkey"]),
                       "l_orderkey", "l_partkey", min_count=2,
                       conf_num=1, conf_den=10, item_bits=21)


Q_ASSOC_RULES_SQL = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pc AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS n
       FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING count(*) >= 2),
rules AS (SELECT a AS lhs, b AS rhs, n AS n_ab FROM pc
          UNION ALL SELECT b, a, n FROM pc),
supp AS (SELECT l_partkey AS item, count(*) AS n_a FROM d GROUP BY 1)
SELECT r.lhs, r.rhs, CAST(r.n_ab AS BIGINT) AS n_ab,
       CAST(s.n_a AS BIGINT) AS n_a
FROM rules r JOIN supp s ON s.item = r.lhs
WHERE r.n_ab * 10 >= s.n_a
"""


def q_kd_parts(sf_dir: str):
    """Adaptive kd-median spatial partitioning (the data-driven
    complement to the static z-order/Hilbert/range partitioners):
    split the point cloud at the EXACT global median x (rank
    max(1, n*50//100) — tableops.exact_order_stats, one distributed
    sort + O(#blocks) driver state), then each half at its exact
    median y, giving 4 balanced regions; emits per region the count
    and integer coordinate sums (the balance + centroid audit a
    spatial partitioner is judged by). Ties split LOW (x <= mx goes
    left) so both engines agree exactly."""
    from osmray.tableops import exact_order_stats

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def pts(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"x": pa.array(p["m1"] % 8192),
                         "y": pa.array(p["m2"] % 8192)})

    pds = ds.map_batches(pts, batch_format="pyarrow").materialize()
    mx = int(exact_order_stats(pds, "x", [50])
             .to_pandas()["value"].iloc[0])

    def side(lo: bool):
        def f(batch: pa.Table) -> pa.Table:
            x = batch["x"].to_numpy(zero_copy_only=False)
            keep = x <= mx if lo else x > mx
            return batch.filter(pa.array(keep))
        return f

    out = {"region": [], "n_pts": [], "sum_x": [], "sum_y": []}
    for li, lo in ((0, True), (1, False)):
        half = pds.map_batches(side(lo), batch_format="pyarrow") \
                  .materialize()
        my = int(exact_order_stats(half, "y", [50])
                 .to_pandas()["value"].iloc[0])

        def stats(batch: pa.Table, my=my) -> pa.Table:
            x = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            below = y <= my
            return pa.table({
                "q": pa.array([0, 1], pa.int64()),
                "n": pa.array([int(below.sum()),
                               int((~below).sum())], pa.int64()),
                "sx": pa.array([int(x[below].sum()),
                                int(x[~below].sum())], pa.int64()),
                "sy": pa.array([int(y[below].sum()),
                                int(y[~below].sum())], pa.int64())})

        parts = half.map_batches(stats, batch_format="pyarrow").to_pandas()
        for qy in (0, 1):
            sel = parts["q"] == qy
            out["region"].append(li * 2 + qy)
            out["n_pts"].append(int(parts["n"][sel].sum()))
            out["sum_x"].append(int(parts["sx"][sel].sum()))
            out["sum_y"].append(int(parts["sy"][sel].sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


Q_KD_PARTS_SQL = f"""
WITH p0 AS ({_LI_SQL}),
p AS (SELECT m1 % 8192 AS x, m2 % 8192 AS y FROM p0),
mx AS (SELECT x AS v FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS r,
         count(*) OVER () AS n FROM p)
       WHERE r = greatest(1, n * 50 // 100)),
lab AS (SELECT p.x, p.y,
          CASE WHEN p.x <= mx.v THEN 0 ELSE 1 END AS side
        FROM p, mx),
my AS (SELECT side, v FROM (SELECT side, y AS v,
         ROW_NUMBER() OVER (PARTITION BY side ORDER BY y) AS r,
         count(*) OVER (PARTITION BY side) AS n FROM lab)
       WHERE r = greatest(1, n * 50 // 100)),
q AS (SELECT lab.side * 2
        + CASE WHEN lab.y <= my.v THEN 0 ELSE 1 END AS region,
        lab.x, lab.y
      FROM lab JOIN my ON my.side = lab.side)
SELECT region, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y
FROM q GROUP BY region
"""


def q_winsorize(sf_dir: str):
    """Winsorized robust aggregation: clip centi-quantized event
    values at the EXACT global p5 / p95 (rank max(1, n*p//100) via
    the distributed order-stats sort), then per event_type emit
    (n, clipped sum, n_clipped_low, n_clipped_high) — the
    outlier-robust mean components. One sort for the two ranks + one
    pre-aggregated keyed fold."""
    from osmray.tableops import exact_order_stats, sorted_fold_sums

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def vi_col(batch: pa.Table) -> pa.Table:
        return pa.table({"vi": pa.array(np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64))})

    qs = exact_order_stats(
        ds.map_batches(vi_col, batch_format="pyarrow"),
        "vi", [5, 95]).to_pandas().sort_values("p")
    lo, hi = (int(v) for v in qs["value"].to_numpy())

    def partials(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        vi = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        clip = np.clip(vi, lo, hi)
        u, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(u.tolist(), pa.string()),
            "b": pa.array(np.zeros(len(u), np.int64)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "clip_sum": pa.array(np.bincount(
                inv, weights=clip).astype(np.int64)),
            "n_lo": pa.array(np.bincount(
                inv, weights=(vi < lo).astype(np.int64)).astype(np.int64)),
            "n_hi": pa.array(np.bincount(
                inv, weights=(vi > hi).astype(np.int64)).astype(np.int64))})

    # event_type cardinality is bounded; one tiny keyed groupby
    from ray.data.aggregate import Sum

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("clip_sum", alias_name="clip_sum"),
                      Sum("n_lo", alias_name="n_lo"),
                      Sum("n_hi", alias_name="n_hi")))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n": b["n"].cast(pa.int64()),
            "clip_sum": b["clip_sum"].cast(pa.int64()),
            "n_lo": b["n_lo"].cast(pa.int64()),
            "n_hi": b["n_hi"].cast(pa.int64())}),
        batch_format="pyarrow")


Q_WINSORIZE_SQL = """
WITH v AS (SELECT event_type,
                  CAST(floor(value * 100) AS BIGINT) AS vi FROM events),
r AS (SELECT vi, ROW_NUMBER() OVER (ORDER BY vi) AS rn,
             count(*) OVER () AS n FROM v),
lo AS (SELECT vi AS v FROM r WHERE rn = greatest(1, n * 5 // 100)),
hi AS (SELECT vi AS v FROM r WHERE rn = greatest(1, n * 95 // 100))
SELECT v.event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(least(greatest(v.vi, lo.v), hi.v)) AS BIGINT) AS clip_sum,
  CAST(sum(CASE WHEN v.vi < lo.v THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
  CAST(sum(CASE WHEN v.vi > hi.v THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
FROM v, lo, hi GROUP BY v.event_type
"""


def q_benford(sf_dir: str):
    """Benford first-digit audit (the classic numeric-fraud screen):
    leading decimal digit of the integer part of each positive
    extendedprice, counted per digit 1..9 — emitted as exact counts
    so any chi-square test downstream starts from the same integers.
    First digit by arithmetic (divide by 10 until < 10), not string
    ops — vectorized; pre-aggregated 9-cell fold."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])

    def partials(batch: pa.Table) -> pa.Table:
        v = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        v = v[v > 0]
        while (v >= 10).any():
            v = np.where(v >= 10, v // 10, v)
        u, cnt = np.unique(v, return_counts=True)
        return pa.table({"digit": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    from osmray.tableops import sorted_fold_sums

    return sorted_fold_sums(
        ds.map_batches(partials, batch_format="pyarrow"), "digit", ["n"])


Q_BENFORD_SQL = """
WITH v AS (SELECT CAST(floor(l_extendedprice) AS BIGINT) AS vi
           FROM lineitem WHERE floor(l_extendedprice) > 0),
d AS (SELECT CAST(substr(CAST(vi AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v)
SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
"""


def q_mutual_nn(sf_dir: str):
    """Mutual nearest neighbors over the embedding table (the
    dataset-alignment / batch-correction primitive: pairs (a, b)
    where each is the other's single nearest neighbor): similarity
    is the milli-quantized integer dot product (bit-stable order,
    ties -> smaller vec_id, self excluded), NN ids come from one
    broadcast-matrix pass (same engine shape and 2e6-vector loud cap
    as q_label_noise; IVF is the scale path), and the mutual filter
    is a vectorized involution check nn[nn[a]] == a, emitted once
    per pair with a < b."""
    from osmray.ann import mutual_nn

    return mutual_nn(_read(sf_dir, "embeddings",
                           ["vec_id", "embedding"]))


Q_MUTUAL_NN_SQL = """
WITH q AS (SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> floor(x * 1000)) AS v
           FROM embeddings),
r1 AS (SELECT a, b FROM (
  SELECT x.vec_id AS a, y.vec_id AS b,
    ROW_NUMBER() OVER (PARTITION BY x.vec_id
      ORDER BY list_dot_product(x.v, y.v) DESC, y.vec_id) AS rn
  FROM q x JOIN q y ON y.vec_id <> x.vec_id) WHERE rn = 1)
SELECT p.a, p.b FROM r1 p JOIN r1 r ON r.a = p.b AND r.b = p.a
WHERE p.a < p.b
"""


def q_calibration(sf_dir: str):
    """Calibration / reliability bins for the quality classifier
    (completing the eval suite with q_auc and q_ndcg): scores bin by
    the EXACT global deciles (9 cut points at ranks
    max(1, n*p//100), p = 10..90 — one distributed order-stats
    sort), bin id = number of cuts strictly below the score, and
    each bin reports (n, n_pos) — the integers a reliability diagram
    or ECE computation starts from. One pre-aggregated 10-cell
    fold."""
    from osmray.tableops import exact_order_stats, sorted_fold_sums

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def scored(batch: pa.Table) -> pa.Table:
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        lbl = np.asarray(
            [1 if l == "en" else 0 for l in batch["lang"].to_pylist()],
            np.int64)
        flat = [w for ws in toks for w in ws]
        sc = np.zeros(len(toks), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            wt = (_char_fold_hash(u) % 256) * 2654435761 % (1 << 32) \
                % 2001 - 1000
            for k, ws in enumerate(toks):
                sc[k] = int(wt[np.searchsorted(u, np.asarray(ws))].sum())
        return pa.table({"score": pa.array(sc), "lbl": pa.array(lbl)})

    sds = docs.map_batches(scored, batch_format="pyarrow").materialize()
    cuts = np.sort(exact_order_stats(
        sds, "score", [10, 20, 30, 40, 50, 60, 70, 80, 90]
    ).to_pandas()["value"].to_numpy().astype(np.int64))

    def partials(batch: pa.Table) -> pa.Table:
        sc = batch["score"].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch["lbl"].to_numpy(zero_copy_only=False).astype(np.int64)
        # bin = #cuts strictly below the score (score == cut lands in
        # the LOWER bin, matching the twin); duplicate cut values
        # count individually on both sides
        b = np.sum(sc[:, None] > cuts[None, :], axis=1)
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "bin": pa.array(u.astype(np.int64)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "n_pos": pa.array(np.bincount(
                inv, weights=lbl).astype(np.int64))})

    return sorted_fold_sums(
        sds.map_batches(partials, batch_format="pyarrow"),
        "bin", ["n", "n_pos"])


Q_CALIBRATION_SQL = f"""
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id, lang,
        {_CF_HASH_LAMBDA.format(w='w')} % 256 AS b FROM toks),
s AS (SELECT doc_id, max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS lbl,
        sum(b * 2654435761 % 4294967296 % 2001 - 1000) AS score
      FROM h GROUP BY doc_id),
r AS (SELECT score, ROW_NUMBER() OVER (ORDER BY score) AS rn,
             count(*) OVER () AS n FROM s),
cuts AS (SELECT p.p, r.score AS c FROM (VALUES (10), (20), (30), (40),
           (50), (60), (70), (80), (90)) p(p)
         JOIN r ON r.rn = greatest(1, r.n * p.p // 100)),
binned AS (SELECT s.doc_id, s.lbl,
             (SELECT count(*) FROM cuts WHERE s.score > cuts.c) AS bin
           FROM s)
SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(lbl) AS BIGINT) AS n_pos
FROM binned GROUP BY bin
"""


def q_bpe_train(sf_dir: str):
    """Byte-pair-encoding merge TRAINING over the corpus — the
    tokenizer-learning operator (q_wordpiece is the runtime side): 4
    greedy merge rounds, each = exact weighted adjacent-symbol-pair
    counts over the DISTINCT word vocabulary (corpus word counts come
    from ONE hashed-count shuffle up front; no round ever
    re-tokenizes the document stream), global argmax pair (count
    desc, pair asc — a keys-only sort+limit(1), O(1) driver state per
    round), then a LEFTMOST NON-OVERLAPPING merge applied over the
    vocab (text.bpe_train). The double-space pad trick makes python
    ``str.replace`` and DuckDB ``replace()`` the SAME scan (both
    replace non-overlapping occurrences left to right), so the SQL
    twin replays all 4 rounds bit-exactly, including the
    'a a a' -> 'aa a' overlap case. Emits (merge_rank, lhs, rhs, n).
    Scale: the per-round working set is the vocab (distinct words x
    counts), orders smaller than the corpus; pair counting re-buckets
    by hashed pair string so no round ships strings to the driver."""
    from osmray.text import bpe_train

    return bpe_train(_read(sf_dir, "documents", ["text"]), rounds=4)


def _bpe_round_sql(i: int, carry_w: bool = False) -> str:
    """One unrolled BPE round: pair counts over v{i}, argmax b{i+1},
    merged vocab v{i+1} (the same double-space replace as the
    engine). ``carry_w`` keeps the original word through the rounds
    (the apply twin needs the word -> merged-symbols mapping)."""
    j = i + 1
    w = "w, " if carry_w else ""
    return f"""
p{j} AS (SELECT ws[i] || ' ' || ws[i+1] AS pair, sum(n) AS cnt
       FROM (SELECT string_split(sym, ' ') AS ws, n FROM v{i}),
            unnest(generate_series(1, len(ws) - 1)) AS g(i)
       GROUP BY 1),
b{j} AS (SELECT pair, cnt FROM p{j} ORDER BY cnt DESC, pair ASC LIMIT 1),
v{j} AS (SELECT {w}trim(replace(replace(
           ' ' || replace(sym, ' ', '  ') || ' ',
           ' ' || replace(b{j}.pair, ' ', '  ') || ' ',
           ' ' || replace(b{j}.pair, ' ', '') || ' '),
           '  ', ' ')) AS sym, n
       FROM v{i} CROSS JOIN b{j})"""


Q_BPE_TRAIN_SQL = f"""
WITH w0 AS (SELECT w, count(*) AS n FROM (
         SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1),
v0 AS (SELECT array_to_string(string_split(w, ''), ' ') AS sym, n FROM w0),
{",".join(_bpe_round_sql(i) for i in range(4))}
SELECT * FROM (
  SELECT 1 AS merge_rank, string_split(pair, ' ')[1] AS lhs,
         string_split(pair, ' ')[2] AS rhs, CAST(cnt AS BIGINT) AS n FROM b1
  UNION ALL
  SELECT 2, string_split(pair, ' ')[1], string_split(pair, ' ')[2],
         CAST(cnt AS BIGINT) FROM b2
  UNION ALL
  SELECT 3, string_split(pair, ' ')[1], string_split(pair, ' ')[2],
         CAST(cnt AS BIGINT) FROM b3
  UNION ALL
  SELECT 4, string_split(pair, ' ')[1], string_split(pair, ' ')[2],
         CAST(cnt AS BIGINT) FROM b4)
"""


def q_ktruss(sf_dir: str):
    """4-truss peeling (2 bounded rounds) on the dense 512-node
    lineitem graph (denser sibling of the q_triangles graph): per-edge triangle
    support via the two-grace-join plan, keep support >= 2, recompute
    on the survivors (graph.ktruss). The cohesive-subgraph primitive
    community/spam detection runs at scale; the SQL twin unrolls both
    peels as chained three-way self-joins."""
    from osmray.graph import ktruss

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def edges(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"u": pa.array(p["m1"] % 512),
                         "v": pa.array(p["m2"] % 512)})

    return ktruss(ds.map_batches(edges, batch_format="pyarrow"),
                  k=4, rounds=2, num_buckets=8)


Q_KTRUSS_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 512 AS u, m2 % 512 AS v FROM p
        WHERE m1 % 512 <> m2 % 512),
e0 AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
t0 AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
       FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b
       JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b),
s0 AS (SELECT a, b, count(*) AS sup FROM (
         SELECT a, b FROM t0
         UNION ALL SELECT b, c FROM t0
         UNION ALL SELECT a, c FROM t0) GROUP BY 1, 2),
e1 AS (SELECT a, b FROM s0 WHERE sup >= 2),
t1 AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
       FROM e1 JOIN e1 e2 ON e2.a = e1.b
       JOIN e1 e3 ON e3.a = e1.a AND e3.b = e2.b),
s1 AS (SELECT a, b, count(*) AS sup FROM (
         SELECT a, b FROM t1
         UNION ALL SELECT b, c FROM t1
         UNION ALL SELECT a, c FROM t1) GROUP BY 1, 2)
SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v,
       CAST(sup AS BIGINT) AS support
FROM s1 WHERE sup >= 2
"""


def q_stump(sf_dir: str):
    """Exact best-split decision stump — the feature-screening /
    tree-induction primitive: over a 100k-cardinality hashed integer
    feature and a binary target, find the threshold t maximizing
    split ACCURACY max(posL, nL-posL) + max(posR, nR-posR) for the
    partition feat <= t (pure integers — no Gini floats, so the twin
    is bit-exact). Engine = tableops.best_split_stump: per-block
    (feat -> n, pos) partials, one high-cardinality sorted fold, a
    distributed prefix-scan over sorted distinct feats (block-local
    cumsum + O(#blocks) driver offsets), per-block argmax, keys-only
    global sort+limit(1). Tie-break: max acc, min threshold. Emits
    ONE row (threshold, acc, n_left, pos_left)."""
    from osmray.tableops import best_split_stump

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def featurize(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "feat": pa.array((ok * 7919 + ln) % 100000),
            "pos": pa.array((ok * 104729 % 7 < 3).astype(np.int64))})

    return best_split_stump(
        ds.map_batches(featurize, batch_format="pyarrow"), "feat", "pos")


Q_STUMP_SQL = """
WITH f AS (SELECT (l_orderkey * 7919 + l_linenumber) % 100000 AS feat,
                  CASE WHEN l_orderkey * 104729 % 7 < 3
                       THEN 1 ELSE 0 END AS pos
           FROM lineitem),
g AS (SELECT feat, count(*) AS n, sum(pos) AS p FROM f GROUP BY 1),
c AS (SELECT feat,
             SUM(n) OVER (ORDER BY feat ROWS UNBOUNDED PRECEDING) AS nl,
             SUM(p) OVER (ORDER BY feat ROWS UNBOUNDED PRECEDING) AS pl,
             (SELECT sum(n) FROM g) AS nt,
             (SELECT sum(p) FROM g) AS pt
      FROM g)
SELECT CAST(feat AS BIGINT) AS threshold,
       CAST(greatest(pl, nl - pl)
            + greatest(pt - pl, (nt - nl) - (pt - pl)) AS BIGINT) AS acc,
       CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left
FROM c ORDER BY acc DESC, threshold ASC LIMIT 1
"""


def q_url_canon(sf_dir: str):
    """URL canonicalization + dedup counting — the CommonCrawl-style
    frontier/dedup primitive: each doc carries a deterministically
    MESSY url (mixed-case scheme/host, default and non-default
    explicit ports, tracking params, fragments, two raw query-param
    orders), the engine REALLY parses it (text.canonicalize_urls —
    compiled regex, the same grammar the twin uses), canonicalizes —
    lowercase scheme+host, drop the scheme-default port only, drop
    the fragment, drop utm_* params, sort surviving params — and
    counts docs per canonical url through the unbounded-vocabulary
    hashed-count shuffle (text.url_canon_counts). The twin parses
    with regexp_extract + list_filter/list_sort over the SAME
    strings, so both sides are real parsers. Emits (url, n)."""
    from osmray.text import url_canon_counts

    docs = _read(sf_dir, "documents", ["doc_id"])

    def raw_urls(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = []
        for k in d.tolist():
            scheme = "HTTP" if k % 2 == 0 else "https"
            host = (f"WWW.Site{k % 7}.COM" if k % 3 == 0
                    else f"site{k % 7}.com")
            port = ":80" if k % 5 == 0 else (":8443" if k % 5 == 1 else "")
            qs = (f"?b={k % 3}&utm_source=feed&a={k % 4}" if k % 13 < 6
                  else f"?a={k % 4}&utm_medium=email&b={k % 3}")
            out.append(f"{scheme}://{host}{port}/p/{k % 11}{qs}#sec{k % 5}")
        return pa.table({"url": pa.array(out, pa.string())})

    return url_canon_counts(
        docs.map_batches(raw_urls, batch_format="pyarrow"), "url")


from osmray.text import URL_RE as _URL_RE  # noqa: E402  (twin shares the engine grammar)

Q_URL_CANON_SQL = rf"""
WITH raw AS (SELECT
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 3 = 0
          THEN 'WWW.Site' || (doc_id % 7) || '.COM'
          ELSE 'site' || (doc_id % 7) || '.com' END) ||
    (CASE WHEN doc_id % 5 = 0 THEN ':80'
          WHEN doc_id % 5 = 1 THEN ':8443' ELSE '' END) ||
    '/p/' || (doc_id % 11) ||
    (CASE WHEN doc_id % 13 < 6
          THEN '?b=' || (doc_id % 3) || '&utm_source=feed&a=' || (doc_id % 4)
          ELSE '?a=' || (doc_id % 4) || '&utm_medium=email&b=' || (doc_id % 3)
     END) || '#sec' || (doc_id % 5) AS u
  FROM documents),
parts AS (SELECT
    lower(regexp_extract(u, '{_URL_RE}', 1)) AS sch,
    lower(regexp_extract(u, '{_URL_RE}', 2)) AS hst,
    regexp_extract(u, '{_URL_RE}', 3) AS prt,
    regexp_extract(u, '{_URL_RE}', 4) AS pth,
    regexp_extract(u, '{_URL_RE}', 5) AS qs
  FROM raw),
canon AS (SELECT
    sch || '://' || hst ||
    (CASE WHEN (sch = 'http' AND prt = ':80')
            OR (sch = 'https' AND prt = ':443') THEN '' ELSE prt END) ||
    pth ||
    (CASE WHEN len(kept) > 0
          THEN '?' || array_to_string(kept, '&') ELSE '' END) AS url
  FROM (SELECT sch, hst, prt, pth,
          list_sort(list_filter(string_split(substr(qs, 2), '&'),
            x -> len(x) > 0 AND NOT starts_with(x, 'utm_'))) AS kept
        FROM parts))
SELECT url, CAST(count(*) AS BIGINT) AS n FROM canon GROUP BY url
"""


def q_polyline_stitch(sf_dir: str):
    """Polyline / way stitching — the OSM road-network conflation
    primitive (graph.stitch_chains): hashed segments over a 2^20
    endpoint universe merge wherever an endpoint has TOTAL degree
    exactly 2 (unambiguous continuation; junctions and dead ends
    break chains). Endpoint co-location is a bounded hashed-bucket
    groupby with vectorized run detection; chains are min-label CC
    over segment ids (paths/cycles only, so pointer-jumped rounds
    converge fast); isolated segments keep their own id via a LEFT
    grace join; one keyed fold emits (chain_id, n_segs, total_len).
    The twin replays the degree-2 rule + a recursive-CTE closure."""
    from osmray.graph import stitch_chains

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def segs(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        p1, p2 = p["m1"] % 1048576, p["m2"] % 1048576
        keep = p1 != p2
        s = p["pid"][keep]
        return pa.table({"s": pa.array(s), "p1": pa.array(p1[keep]),
                         "p2": pa.array(p2[keep]),
                         "len": pa.array(1 + s % 97)})

    return stitch_chains(ds.map_batches(segs, batch_format="pyarrow"))


Q_POLYLINE_STITCH_SQL = f"""
WITH RECURSIVE p AS ({_LI_SQL}),
seg AS (SELECT pid AS s, m1 % 1048576 AS p1, m2 % 1048576 AS p2,
               1 + pid % 97 AS len
        FROM p WHERE m1 % 1048576 <> m2 % 1048576),
ends AS (SELECT s, p1 AS pt FROM seg UNION ALL SELECT s, p2 AS pt FROM seg),
deg2 AS (SELECT pt, min(s) AS a, max(s) AS b FROM ends GROUP BY pt
         HAVING count(*) = 2 AND min(s) <> max(s)),
e0 AS (SELECT DISTINCT a AS u, b AS v FROM deg2),
ee AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
r AS (
  SELECT s AS node, s AS label FROM seg
  UNION
  SELECT ee.v AS node, r.label FROM r JOIN ee ON ee.u = r.node
  WHERE r.label < ee.v),
comp AS (SELECT node, min(label) AS c FROM r GROUP BY node)
SELECT CAST(c AS BIGINT) AS chain_id, CAST(count(*) AS BIGINT) AS n_segs,
       CAST(sum(seg.len) AS BIGINT) AS total_len
FROM comp JOIN seg ON seg.s = comp.node GROUP BY c
"""


def q_interleave(sf_dir: str):
    """Deterministic proportional source interleaving — the
    training-data MIXING-ORDER operator (windows.interleave_positions):
    per-source rank rk (ordered by doc_id, computed by the sorted-scan
    block-offset pattern — no task holds a whole source) and global
    stride position pos = ((2*rk - 1) * n_total) // (2 * n_source)
    (Bresenham midpoint: reading by pos interleaves every source
    evenly through one epoch at any mix skew). Pure-integer, so the
    ROW_NUMBER window twin is bit-exact."""
    from osmray.windows import interleave_positions

    return interleave_positions(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        key="source", id_col="doc_id")


Q_INTERLEAVE_SQL = """
WITH c AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
t AS (SELECT count(*) AS nt FROM documents),
r AS (SELECT doc_id, source,
        ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
      FROM documents)
SELECT r.doc_id, r.source, CAST(rk AS BIGINT) AS rk,
       CAST(((2 * rk - 1) * t.nt) // (2 * c.ns) AS BIGINT) AS pos
FROM r JOIN c USING(source) CROSS JOIN t
"""


def q_bpe_apply(sf_dir: str):
    """Tokenizer compression under the trained BPE vocabulary — the
    apply-side of q_bpe_train (text.bpe_apply): learn 4 merges on the
    corpus, then tokenize every doc with them. The merges are
    O(rounds) driver state, so the apply pass is one fully
    distributed map (merges replay per block-DISTINCT word, per-doc
    counts via searchsorted gather — the q_wordpiece shape). The twin
    carries the word through the same 4 unrolled merge rounds and
    joins costs back per doc. Emits (doc_id, n_tokens, n_subtokens)."""
    from osmray.text import bpe_apply

    return bpe_apply(_read(sf_dir, "documents", ["doc_id", "text"]),
                     rounds=4)


Q_BPE_APPLY_SQL = f"""
WITH w0 AS (SELECT w, count(*) AS n FROM (
         SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1),
v0 AS (SELECT w, array_to_string(string_split(w, ''), ' ') AS sym, n
       FROM w0),
{",".join(_bpe_round_sql(i, carry_w=True) for i in range(4))},
costs AS (SELECT w, len(string_split(sym, ' ')) AS ns FROM v4),
tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
SELECT tw.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(costs.ns) AS BIGINT) AS n_subtokens
FROM tw JOIN costs USING (w) GROUP BY 1
"""


def q_hard_negatives(sf_dir: str):
    """Hard-negative mining for contrastive training
    (ann.hard_negatives): per vector, the single most-similar vector
    with a DIFFERENT label — milli-quantized integer dot products
    (bit-stable order, exact in DuckDB doubles), ties -> smaller
    neighbor id, same broadcast-matrix engine shape and loud 2e6 cap
    as q_label_noise/q_mutual_nn (IVF partition is the scale path).
    Emits (vec_id, label, neg_id, neg_label, sim)."""
    from osmray.ann import hard_negatives

    return hard_negatives(_read(sf_dir, "embeddings",
                                ["vec_id", "embedding", "label"]))


Q_HARD_NEGATIVES_SQL = """
WITH q AS (SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> floor(x * 1000)) AS v
           FROM embeddings),
r1 AS (SELECT a, la, b, lb, s FROM (
  SELECT x.vec_id AS a, x.label AS la, y.vec_id AS b, y.label AS lb,
         list_dot_product(x.v, y.v) AS s,
         ROW_NUMBER() OVER (PARTITION BY x.vec_id
           ORDER BY list_dot_product(x.v, y.v) DESC, y.vec_id) AS rn
  FROM q x JOIN q y ON y.label <> x.label) WHERE rn = 1)
SELECT a AS vec_id, CAST(la AS BIGINT) AS label, b AS neg_id,
       CAST(lb AS BIGINT) AS neg_label, CAST(s AS BIGINT) AS sim
FROM r1
"""


def q_od_flows(sf_dir: str):
    """Origin-destination flow matrix over the per-user random-walk
    trajectories (windows.od_flows — the mobility-analytics
    primitive): walks coarsen to 8-unit grid cells and every
    consecutive cell CHANGE is one trip; flows are global (from, to)
    transition counts via block-partial + one packed-key fold. The
    twin is cumsum-window + LAG + group count."""
    from osmray.windows import od_flows

    return od_flows(_read(sf_dir, "events",
                          ["event_id", "user_id", "ts"]))


Q_OD_FLOWS_SQL = """
WITH base AS (SELECT user_id, event_id, epoch_us(ts) AS t,
    SUM(event_id * 7919 % 5 - 2) OVER w + 100000 AS x,
    SUM(event_id * 104729 % 5 - 2) OVER w + 100000 AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING)),
c AS (SELECT x // 8 AS cx, y // 8 AS cy,
    LAG(x // 8) OVER v AS px, LAG(y // 8) OVER v AS py
  FROM base WINDOW v AS (PARTITION BY user_id ORDER BY t, event_id))
SELECT CAST(px AS BIGINT) AS fx, CAST(py AS BIGINT) AS fy,
       CAST(cx AS BIGINT) AS tx, CAST(cy AS BIGINT) AS ty,
       CAST(count(*) AS BIGINT) AS n_trips
FROM c WHERE px IS NOT NULL AND (px <> cx OR py <> cy)
GROUP BY 1, 2, 3, 4
"""


def q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch shuffle (tableops.epoch_shuffle): rows
    rank by (hash64(doc_id, seed=17), doc_id) — a seeded, stable,
    cluster-size-independent permutation — and chunk into 1024-row
    shards with in-shard positions. One distributed sort + the
    block-offset prefix pattern; the twin replays hash64 bit-exactly
    via hash64_ctes + ROW_NUMBER."""
    from osmray.tableops import epoch_shuffle

    return epoch_shuffle(_read(sf_dir, "documents", ["doc_id"]),
                         id_col="doc_id", seed=17, shard_size=1024)


Q_EPOCH_SHUFFLE_SQL = f"""
WITH {hash64_ctes('eh', 'documents', 'doc_id', 'doc_id', 17)},
r AS (SELECT doc_id,
        ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS rk
      FROM eh5)
SELECT doc_id, CAST(rk // 1024 AS BIGINT) AS shard,
       CAST(rk % 1024 AS BIGINT) AS pos
FROM r
"""


def q_expectations(sf_dir: str):
    """Data-quality expectation suite (the Great-Expectations-style
    validation pass every ingest pipeline runs): four rule classes
    over lineitem, each a different engine shape — referential
    integrity (l_orderkey ∈ orders: grace ANTI join, no broadcast),
    range (1 <= l_quantity <= 50: block-local vectorized count),
    uniqueness ((l_orderkey, l_linenumber) appears once: packed-key
    count fold, violations = rows in groups > 1), and a skew-guard
    expectation (no single l_partkey holds > 0.1% of rows: the same
    fold, keyed by part). Emits (rule, n_violations) — tiny output,
    fully distributed checks."""
    import ray.data
    from ray.data.aggregate import Sum

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_linenumber", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])

    # r1: referential integrity via anti join (unmatched rows)
    anti = bucketed_join(
        li.map_batches(lambda t: t.select(["l_orderkey"]),
                       batch_format="pyarrow"),
        orders, on="l_orderkey", right_on="o_orderkey", how="anti",
        num_buckets=16, right_dedup=True)
    n_ref = anti.count()

    # r2: range violations, block-local vectorized
    def range_viol(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int(((q < 1) | (q > 50)).sum())], pa.int64())})

    n_range = li.map_batches(range_viol, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="s"))["s"]

    # r3: uniqueness of (orderkey, linenumber): packed-key fold
    def pk_partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(ok * 10 + ln, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    dup = sorted_fold_sums(
        li.map_batches(pk_partials, batch_format="pyarrow"), "pk", ["n"])

    def dup_viol(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(n[n > 1].sum())], pa.int64())})

    n_dup = dup.map_batches(dup_viol, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="s"))["s"]

    # r4: hot-key skew guard — parts holding > 0.1% of all rows
    n_total = li.count()

    def part_partials(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = sorted_fold_sums(
        li.map_batches(part_partials, batch_format="pyarrow"), "pk", ["n"])

    def hot_viol(batch: pa.Table, cap=n_total) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array(
            [int((n * 1000 > cap).sum())], pa.int64())})

    n_hot = parts.map_batches(hot_viol, batch_format="pyarrow") \
        .aggregate(Sum("n", alias_name="s"))["s"]

    return ray.data.from_arrow(pa.table({
        "rule": pa.array(["ref_integrity", "quantity_range",
                          "pk_unique", "hot_partkey"]),
        "n_violations": pa.array([int(n_ref), int(n_range or 0),
                                  int(n_dup or 0), int(n_hot or 0)],
                                 pa.int64())}))


Q_EXPECTATIONS_SQL = """
SELECT 'ref_integrity' AS rule, CAST((
    SELECT count(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
  ) AS BIGINT) AS n_violations
UNION ALL
SELECT 'quantity_range', CAST((
    SELECT count(*) FROM lineitem
    WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
UNION ALL
SELECT 'pk_unique', CAST((
    SELECT coalesce(sum(c), 0) FROM (
      SELECT count(*) AS c FROM lineitem
      GROUP BY l_orderkey * 10 + l_linenumber HAVING count(*) > 1)
  ) AS BIGINT)
UNION ALL
SELECT 'hot_partkey', CAST((
    SELECT count(*) FROM (
      SELECT count(*) AS c FROM lineitem GROUP BY l_partkey)
    WHERE c * 1000 > (SELECT count(*) FROM lineitem)) AS BIGINT)
"""


def q_star_revenue(sf_dir: str):
    """Multi-way star join (the TPC-H Q5 shape): lineitem ⋈ orders ⋈
    customer ⋈ nation -> revenue per nation. Join ORDER is the plan:
    revenue pre-aggregates per orderkey INSIDE the first map (one
    partial-sum pass collapses ~4 lineitems/order before any
    shuffle), two grace joins walk the key chain
    (orderkey -> custkey -> nationkey) with ``right_dedup`` on the
    dimension side, the 25-row nation table broadcasts, and the
    final fold groups by nationkey. Revenue is INTEGER micro-units
    cents(extprice) * (100 - cents_discount) so the sum is
    associative-exact and the twin hash-matches. Emits
    (n_name, revenue)."""
    import ray

    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nation["n_nationkey"].astype(int),
                    nation["n_name"]))
    nref = ray.put(nmap)

    def rev_partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        ep = np.floor(batch["l_extendedprice"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        dc = np.floor(batch["l_discount"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        rev = ep * (100 - dc)
        u, inv = np.unique(ok, return_inverse=True)
        return pa.table({"l_orderkey": pa.array(u),
                         "rev": pa.array(np.bincount(
                             inv, weights=rev).astype(np.int64))})

    li_agg = li.map_batches(rev_partials, batch_format="pyarrow")
    j1 = bucketed_join(li_agg, orders, on="l_orderkey",
                       right_on="o_orderkey", num_buckets=16,
                       right_dedup=True)
    j2 = bucketed_join(
        j1.map_batches(lambda t: t.select(["o_custkey", "rev"]),
                       batch_format="pyarrow"),
        cust, on="o_custkey", right_on="c_custkey", num_buckets=16,
        right_dedup=True)
    folded = sorted_fold_sums(
        j2.map_batches(lambda t: pa.table({
            "nk": t["c_nationkey"].cast(pa.int64()), "rev": t["rev"]}),
            batch_format="pyarrow"), "nk", ["rev"])

    def name(batch: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        nk = batch["nk"].to_numpy(zero_copy_only=False)
        return pa.table({"n_name": pa.array([nm[int(x)] for x in nk]),
                         "revenue": batch["rev"]})

    return folded.map_batches(name, batch_format="pyarrow")


Q_STAR_REVENUE_SQL = """
WITH r AS (SELECT l_orderkey,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
             AS rev
           FROM lineitem)
SELECT n.n_name, CAST(sum(r.rev) AS BIGINT) AS revenue
FROM r JOIN orders o ON o.o_orderkey = r.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


def q_confusion(sf_dir: str):
    """Confusion matrix for the hashed quality classifier against the
    lang=='en' labels — completing the eval suite (q_auc roc,
    q_calibration reliability, q_ndcg ranking, now the raw confusion
    counts precision/recall/F1 derive from): per block, score docs
    (the q_quality_clf kernel), pre-aggregate the four (pred, actual)
    cells, one bounded 4-cell fold. Emits (pred, actual, n)."""
    from osmray.tableops import sorted_fold_sums

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partials(batch: pa.Table) -> pa.Table:
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        lbl = np.asarray([1 if l == "en" else 0
                          for l in batch["lang"].to_pylist()], np.int64)
        flat = [wd for ws in toks for wd in ws]
        pred = np.zeros(len(toks), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            wt = (_char_fold_hash(u) % 256) * 2654435761 % (1 << 32) \
                % 2001 - 1000
            for k, ws in enumerate(toks):
                pred[k] = 1 if int(
                    wt[np.searchsorted(u, np.asarray(ws))].sum()) >= 0 else 0
        cell = pred * 2 + lbl
        u2, cnt = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u2.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    folded = sorted_fold_sums(
        docs.map_batches(partials, batch_format="pyarrow"), "cell", ["n"])
    return folded.map_batches(
        lambda t: pa.table({
            "pred": pa.array(t["cell"].to_numpy(
                zero_copy_only=False) // 2),
            "actual": pa.array(t["cell"].to_numpy(
                zero_copy_only=False) % 2),
            "n": t["n"]}), batch_format="pyarrow")


Q_CONFUSION_SQL = f"""
WITH toks AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id, lang,
        {_CF_HASH_LAMBDA.format(w='w')} % 256 AS b FROM toks),
s AS (SELECT doc_id,
        max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS actual,
        CASE WHEN sum(b * 2654435761 % 4294967296 % 2001 - 1000) >= 0
             THEN 1 ELSE 0 END AS pred
      FROM h GROUP BY doc_id)
SELECT CAST(pred AS BIGINT) AS pred, CAST(actual AS BIGINT) AS actual,
       CAST(count(*) AS BIGINT) AS n
FROM s GROUP BY 1, 2
"""


def q_ab_metrics(sf_dir: str):
    """Deterministic A/B experiment analysis — the
    experimentation-platform primitive: users bucket by
    hash64(user_id, seed=23) parity (stable, uncorrelated with
    anything), each arm reports users, events, and integer
    centi-value sums per event_type. One block-partial pass + a
    bounded (arm x type) fold; distinct users per arm via a packed
    dedup fold. Emits (arm, event_type, n_events, value_cents,
    n_users)."""
    from ray.data.aggregate import Count

    from osmray.stages import hash64
    from osmray.tableops import sorted_fold_sums

    ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        arm = (hash64(uid, 23) & 1).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist())
        cents = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        key = np.char.add(np.char.add(arm.astype("U1"), "\x1f"), et)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "k": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "cents": pa.array(np.bincount(
                inv, weights=cents).astype(np.int64))})

    def fold_groups(g: pa.Table) -> pa.Table:
        ks = np.asarray(g["k"].to_pylist())
        n = g["n"].to_numpy(zero_copy_only=False)
        c = g["cents"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ks, return_inverse=True)
        return pa.table({
            "k": pa.array(u),
            "n": pa.array(np.bincount(inv, weights=n).astype(np.int64)),
            "cents": pa.array(np.bincount(
                inv, weights=c).astype(np.int64))})

    def bucket(batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str

        return batch.append_column("g", pa.array(
            np.abs(hash_str(batch["k"].to_pylist(), 3)) % 64))

    per_cell = (ev.map_batches(partials, batch_format="pyarrow")
                .map_batches(bucket, batch_format="pyarrow")
                .groupby("g").map_groups(
                    lambda t: fold_groups(t.drop_columns(["g"])),
                    batch_format="pyarrow"))

    # distinct users per arm: keyed dedup on user, then a 2-cell fold
    users = (ev.map_batches(
        lambda t: pa.table({"u": pa.array(np.unique(t["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)))}),
        batch_format="pyarrow")
        .groupby("u").aggregate(Count(alias_name="_n")))
    arm_users = sorted_fold_sums(users.map_batches(
        lambda t: pa.table({
            "arm": pa.array((hash64(t["u"].to_numpy(
                zero_copy_only=False).astype(np.int64), 23) & 1
            ).astype(np.int64)),
            "n": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow"), "arm", ["n"]).take_all()
    au = {int(r["arm"]): int(r["n"]) for r in arm_users}

    def emit(batch: pa.Table) -> pa.Table:
        ks = [k.split("\x1f") for k in batch["k"].to_pylist()]
        arms = np.asarray([int(a) for a, _ in ks], np.int64)
        return pa.table({
            "arm": pa.array(arms),
            "event_type": pa.array([t for _, t in ks]),
            "n_events": batch["n"],
            "value_cents": batch["cents"],
            "n_users": pa.array([au.get(int(a), 0) for a in arms],
                                pa.int64())})

    return per_cell.map_batches(emit, batch_format="pyarrow")


Q_AB_METRICS_SQL = f"""
WITH {hash64_ctes('ab', 'events', 'user_id, event_type, value',
                  'user_id', 23)},
e AS (SELECT user_id, event_type,
        abs(h % 2) AS arm,
        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM ab5),
cells AS (SELECT arm, event_type, count(*) AS n_events,
                 sum(cents) AS value_cents
          FROM e GROUP BY 1, 2),
ua AS (SELECT arm, count(DISTINCT user_id) AS n_users
       FROM e GROUP BY 1)
SELECT CAST(cells.arm AS BIGINT) AS arm, cells.event_type,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(value_cents AS BIGINT) AS value_cents,
       CAST(ua.n_users AS BIGINT) AS n_users
FROM cells JOIN ua ON ua.arm = cells.arm
"""


def q_bipartite(sf_dir: str):
    """Bipartiteness audit per component — odd-cycle detection, the
    graph-quality screen (graph.bipartite_audit): components + parity
    2-coloring (BFS hop parity from each component's min node; an odd
    cycle exists iff some edge joins equal-parity endpoints) +
    per-component conflict counts. Two-engine: vectorized driver
    arrays under the broadcast cap (scatter-min CC + frontier BFS),
    CC + bfs_hops + grace joins above it (loud max_hops contract).
    Emits (comp, n_nodes, n_conflicts); bipartite iff
    n_conflicts = 0."""
    from osmray.graph import bipartite_audit

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def edges(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        keep = p["pid"] % 13 == 0
        u, v = p["m1"][keep] % 8192, p["m2"][keep] % 8192
        return pa.table({"u": pa.array(u), "v": pa.array(v)})

    return bipartite_audit(ds.map_batches(edges, batch_format="pyarrow"))


Q_BIPARTITE_SQL = f"""
WITH RECURSIVE p AS ({_LI_SQL}),
raw AS (SELECT m1 % 8192 AS u, m2 % 8192 AS v FROM p
        WHERE pid % 13 = 0 AND m1 % 8192 <> m2 % 8192),
e0 AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
ee AS (SELECT a AS u, b AS v FROM e0 UNION SELECT b, a FROM e0),
r AS (
  SELECT u AS node, u AS label FROM (SELECT u FROM ee UNION SELECT v FROM ee)
  UNION
  SELECT ee.v, r.label FROM r JOIN ee ON ee.u = r.node
  WHERE r.label < ee.v),
comp AS (SELECT node, min(label) AS c FROM r GROUP BY node),
bf AS (
  SELECT node AS n, CAST(0 AS BIGINT) AS hop FROM comp WHERE node = c
  UNION
  SELECT ee.v, bf.hop + 1 FROM bf JOIN ee ON ee.u = bf.n
  WHERE bf.hop < 16),
hops AS (SELECT n, min(hop) AS h FROM bf GROUP BY n),
conf AS (SELECT comp.c AS comp, count(*) AS n_conflicts
         FROM e0 JOIN hops h1 ON h1.n = e0.a
         JOIN hops h2 ON h2.n = e0.b
         JOIN comp ON comp.node = e0.a
         WHERE h1.h % 2 = h2.h % 2 GROUP BY 1)
SELECT CAST(comp.c AS BIGINT) AS comp,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(coalesce(max(conf.n_conflicts), 0) AS BIGINT) AS n_conflicts
FROM comp LEFT JOIN conf ON conf.comp = comp.c
GROUP BY comp.c
"""


def q_hist_match(sf_dir: str):
    """Histogram matching (specification) over the planted-phash
    fixture (multimodal.hist_match_metrics): each image's gray
    histogram maps onto its reference's (idx+1 mod 1024) by the
    inverse-CDF rule, computed GENERICALLY over 256 bins — decode
    once into histogram ROWS, one grace self-join, per-image
    vectorized searchsorted remap. The two-level fixture (dark 40 /
    bright 200, n1 bright blocks) collapses the rule to a closed
    form the twin replays from the planted bit pattern: match(40) =
    40 iff n1_ref <= n1_src else 200; match(200) = 200 iff
    n1_ref > 0. Emits (idx, remapped_sum)."""
    from osmray import oraclefix
    from osmray.multimodal import hist_match_metrics

    images = oraclefix.load_phash()
    keep = images.map_batches(
        lambda t: t.select(["bytes", "idx"]), batch_format="pyarrow")
    return hist_match_metrics(keep, n_total=1024)


Q_HIST_MATCH_SQL = f"""
WITH {_PH_CTES},
pc AS (SELECT i, CAST(SUM(bit) AS BIGINT) AS n1 FROM phbits GROUP BY i)
SELECT a.i AS idx,
  CAST((64 - a.n1) * 1024
         * (CASE WHEN b.n1 <= a.n1 THEN 40 ELSE 200 END)
     + a.n1 * 1024
         * (CASE WHEN b.n1 > 0 THEN 200 ELSE 40 END) AS BIGINT)
  AS remapped_sum
FROM pc a JOIN pc b ON b.i = (a.i + 1) % 1024
"""


def q_target_encode(sf_dir: str):
    """Smoothed target encoding — the categorical-feature-engineering
    primitive: per category (10k-cardinality hashed key), event count
    n, positive count pos, and the m-smoothed encoding in EXACT
    integer milli-units enc_milli = (pos*1000 + prior_milli*m) //
    (n + m) with prior 500, m = 20 (one integer division, identical
    both sides — no float means). One block-partial pass + a
    high-cardinality sorted fold. Emits (cat, n, pos, enc_milli)."""
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        pk = batch["l_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        cat = pk % 10000
        pos = (ok * 104729 % 7 < 3).astype(np.int64)
        u, inv = np.unique(cat, return_inverse=True)
        return pa.table({
            "cat": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "pos": pa.array(np.bincount(inv, weights=pos).astype(np.int64))})

    folded = sorted_fold_sums(
        ds.map_batches(partials, batch_format="pyarrow"),
        "cat", ["n", "pos"])
    return folded.map_batches(
        lambda t: t.append_column("enc_milli", pa.array(
            (t["pos"].to_numpy(zero_copy_only=False) * 1000 + 500 * 20)
            // (t["n"].to_numpy(zero_copy_only=False) + 20))),
        batch_format="pyarrow")


Q_TARGET_ENCODE_SQL = """
WITH f AS (SELECT l_partkey % 10000 AS cat,
                  CASE WHEN l_orderkey * 104729 % 7 < 3
                       THEN 1 ELSE 0 END AS pos
           FROM lineitem)
SELECT CAST(cat AS BIGINT) AS cat, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS pos,
       CAST((sum(pos) * 1000 + 500 * 20) // (count(*) + 20) AS BIGINT)
       AS enc_milli
FROM f GROUP BY cat
"""


def q_lru_hits(sf_dir: str):
    """Exact LRU cache hit-rate simulation per stream — the
    working-set / cache-sizing primitive: per user, items
    (event_id % 97) access in (ts, id) order; an access HITS an
    LRU(8) iff its STACK DISTANCE (# distinct items since the
    previous access of the same item, exclusive) is < 8 — the
    classic inclusion-property equivalence, which is also what makes
    the op SQL-expressible (the twin counts DISTINCT items in the
    (prev, cur) index range via a range join, no cache state). The
    engine computes stack distances per key stream in one
    sorted-group pass (the cusum/stay_points family shape). Emits
    (user_id, n_accesses, n_cold, n_hits)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_key(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        items = (ii[order] % 97)
        uid = int(g["user_id"][0].as_py())
        last: dict = {}
        n_cold = n_hits = 0
        for i, it in enumerate(items.tolist()):
            pi = last.get(it)
            if pi is None:
                n_cold += 1
            else:
                dist = len(set(items[pi + 1:i].tolist()))
                if dist < 8:
                    n_hits += 1
            last[it] = i
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "n_accesses": pa.array([len(items)], pa.int64()),
            "n_cold": pa.array([n_cold], pa.int64()),
            "n_hits": pa.array([n_hits], pa.int64())})

    return ds.groupby("user_id").map_groups(
        per_key, batch_format="pyarrow")


Q_LRU_HITS_SQL = """
WITH seq AS (SELECT user_id, event_id % 97 AS item,
        ROW_NUMBER() OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts), event_id) AS i
      FROM events),
prev AS (SELECT user_id, item, i,
           LAG(i) OVER (PARTITION BY user_id, item ORDER BY i) AS pi
         FROM seq),
sd AS (SELECT p.user_id, p.i,
         (SELECT count(DISTINCT s.item) FROM seq s
          WHERE s.user_id = p.user_id
            AND s.i > p.pi AND s.i < p.i) AS dist
       FROM prev p WHERE p.pi IS NOT NULL)
SELECT q.user_id,
       CAST(count(*) AS BIGINT) AS n_accesses,
       CAST(count(*) - count(p.pi) AS BIGINT) AS n_cold,
       CAST(coalesce(sum(CASE WHEN sd.dist < 8 THEN 1 END), 0)
            AS BIGINT) AS n_hits
FROM seq q
JOIN prev p ON p.user_id = q.user_id AND p.i = q.i
LEFT JOIN sd ON sd.user_id = q.user_id AND sd.i = q.i
GROUP BY q.user_id
"""


def q_clustering_coef(sf_dir: str):
    """Local clustering coefficient per vertex — the
    graph-cohesion metric: triangles through each vertex (NOT the
    min-vertex attribution of q_triangles — every triangle counts at
    ALL THREE corners) over possible wedges deg*(deg-1)/2, emitted
    as exact integer milli-units 2000*n_tri // (deg*(deg-1)).
    Composition: the two-grace-join triangle plan emitting per-CORNER
    partials + a distinct-edge degree fold + one grace join. Emits
    (u, deg, n_tri, coef_milli) for deg >= 2 vertices."""
    from ray.data.aggregate import Count

    from osmray.graph import triangles_per_vertex
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def edges(batch: pa.Table) -> pa.Table:
        p = _li_points(batch)
        return pa.table({"u": pa.array(p["m1"] % 1024),
                         "v": pa.array(p["m2"] % 1024)})

    E = ds.map_batches(edges, batch_format="pyarrow")
    tri = triangles_per_vertex(E, num_buckets=8).materialize()

    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = u != v
        lo, hi = np.minimum(u[sel], v[sel]), np.maximum(u[sel], v[sel])
        return pa.table({"ek": pa.array(np.unique(lo * 1024 + hi))})

    dedup = (E.map_batches(orient, batch_format="pyarrow")
             .groupby("ek").aggregate(Count(alias_name="_n")))
    deg = sorted_fold_sums(dedup.map_batches(
        lambda t: pa.table({
            "u": pa.array(np.concatenate([
                t["ek"].to_numpy(zero_copy_only=False) // 1024,
                t["ek"].to_numpy(zero_copy_only=False) % 1024])),
            "n": pa.array(np.ones(2 * len(t), np.int64))}),
        batch_format="pyarrow"), "u", ["n"])

    j = bucketed_join(deg, tri, on="u", right_on="u", num_buckets=8,
                      how="left")

    def emit(batch: pa.Table) -> pa.Table:
        d = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["n_tri"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        t = _pc2.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = d >= 2
        d, t = d[keep], t[keep]
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({
            "u": pa.array(u), "deg": pa.array(d), "n_tri": pa.array(t),
            "coef_milli": pa.array(2000 * t // (d * (d - 1)))})

    return j.map_batches(emit, batch_format="pyarrow")


import pyarrow.compute as _pc2  # noqa: E402


Q_CLUSTERING_COEF_SQL = f"""
WITH p AS ({_LI_SQL}),
raw AS (SELECT m1 % 1024 AS u, m2 % 1024 AS v FROM p
        WHERE m1 % 1024 <> m2 % 1024),
e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
t AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM e e1 JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
pt AS (SELECT u, count(*) AS n_tri FROM (
         SELECT a AS u FROM t UNION ALL SELECT b FROM t
         UNION ALL SELECT c FROM t) GROUP BY u),
deg AS (SELECT u, count(*) AS d FROM (
          SELECT a AS u FROM e UNION ALL SELECT b FROM e) GROUP BY u)
SELECT deg.u, CAST(deg.d AS BIGINT) AS deg,
       CAST(coalesce(pt.n_tri, 0) AS BIGINT) AS n_tri,
       CAST(2000 * coalesce(pt.n_tri, 0)
            // (deg.d * (deg.d - 1)) AS BIGINT) AS coef_milli
FROM deg LEFT JOIN pt ON pt.u = deg.u
WHERE deg.d >= 2
"""


def q_bootstrap(sf_dir: str):
    """Deterministic bootstrap replicates — uncertainty
    quantification in ONE pass: 8 half-sample replicates, replicate
    r keeping rows where bit r of hash64(event_id, 101) is set
    (one hash, 8 independent bits — stable, cluster-size-independent,
    resumable), each reporting per-event-type count and integer
    centi-value sum. Block partials compute all 8 replicates
    vectorized; one bounded (type x replicate) fold. The spread
    across replicates is the standard-error estimate a 1e12-row job
    cannot get from a second pass. Emits (event_type, rep, n,
    cents)."""
    from osmray.stages import hash64, hash_str
    from osmray.tableops import sorted_fold_sums

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist())
        cents = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        h = hash64(eid, 101)
        ks, ns, cs = [], [], []
        for r in range(8):
            keep = ((h >> r) & 1) == 1
            key = np.char.add(str(r) + "\x1f", et[keep])
            u, inv = np.unique(key, return_inverse=True)
            ks.append(u)
            ns.append(np.bincount(inv).astype(np.int64))
            cs.append(np.bincount(inv, weights=cents[keep]).astype(np.int64))
        ku = np.concatenate(ks) if ks else np.asarray([], "U")
        return pa.table({
            "k": pa.array(ku),
            "n": pa.array(np.concatenate(ns) if ns
                          else np.zeros(0, np.int64)),
            "cents": pa.array(np.concatenate(cs) if cs
                              else np.zeros(0, np.int64)),
            "bk": pa.array(np.abs(hash_str(list(ku), 7)) % 64)})

    per_cell = (ev.map_batches(partials, batch_format="pyarrow")
                .groupby("bk").map_groups(
                    lambda g: _fold_str_sums(g, ["n", "cents"]),
                    batch_format="pyarrow"))

    def emit(batch: pa.Table) -> pa.Table:
        ks = [k.split("\x1f") for k in batch["k"].to_pylist()]
        return pa.table({
            "event_type": pa.array([t for _, t in ks]),
            "rep": pa.array([int(r) for r, _ in ks], pa.int64()),
            "n": batch["n"], "cents": batch["cents"]})

    return per_cell.map_batches(emit, batch_format="pyarrow")


def _fold_str_sums(g: pa.Table, val_cols: list[str]) -> pa.Table:
    """In-group exact string-keyed integer sums (the
    _hashed_string_counts verify shape, for pre-aggregated
    partials)."""
    ks = np.asarray(g["k"].to_pylist())
    u, inv = np.unique(ks, return_inverse=True)
    cols = {"k": pa.array(u)}
    for c in val_cols:
        v = g[c].to_numpy(zero_copy_only=False)
        cols[c] = pa.array(np.bincount(inv, weights=v).astype(np.int64))
    return pa.table(cols)


Q_BOOTSTRAP_SQL = f"""
WITH {hash64_ctes('bs', 'events', 'event_id, event_type, value',
                  'event_id', 101)},
x AS (SELECT event_type, r.range AS rep,
        CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      FROM bs5 CROSS JOIN range(0, 8) r
      WHERE ((h >> CAST(r.range AS INT)) & 1) = 1)
SELECT event_type, CAST(rep AS BIGINT) AS rep,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents
FROM x GROUP BY 1, 2
"""


def q_attribution(sf_dir: str):
    """Linear multi-touch attribution — the marketing-analytics
    primitive: every 'purchase' conversion credits each NON-purchase
    touch by the same user in the preceding hour [t-3600s, t) with
    one integer credit. Per-user sorted scan (two-pointer window via
    searchsorted — the windows-family shape), per-type block
    partials, one bounded fold. The twin is the textbook interval
    self-join. Emits (event_type, n_credits, n_conversions_touched)
    where n_conversions_touched counts conversions with >= 1 credit
    to that type."""
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def per_key(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((ii, tv))
        tv, et = tv[order], et[order]
        conv = np.flatnonzero(et == "purchase")
        types = np.unique(et[et != "purchase"])
        credits = np.zeros(len(types), np.int64)
        convs = np.zeros(len(types), np.int64)
        lo_all = np.searchsorted(tv, tv[conv] - 3_600_000_000,
                                 side="left")
        hi_all = np.searchsorted(tv, tv[conv], side="left")
        for lo, hi in zip(lo_all.tolist(), hi_all.tolist()):
            w = et[lo:hi]
            w = w[w != "purchase"]
            if len(w) == 0:
                continue
            u, cnt = np.unique(w, return_counts=True)
            pos = np.searchsorted(types, u)
            credits[pos] += cnt
            convs[pos] += 1
        keep = credits > 0
        return pa.table({
            "t": pa.array(types[keep]),
            "credits": pa.array(credits[keep]),
            "convs": pa.array(convs[keep])})

    def bucket(batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str

        return batch.append_column("bk", pa.array(
            np.abs(hash_str(batch["t"].to_pylist(), 5)) % 16))

    folded = (ds.groupby("user_id")
              .map_groups(per_key, batch_format="pyarrow")
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("bk").map_groups(
                  lambda g: _fold_str_sums(
                      g.rename_columns(["k", "credits", "convs", "bk"])
                      .drop_columns(["bk"]), ["credits", "convs"]),
                  batch_format="pyarrow"))
    return folded.map_batches(
        lambda t: t.rename_columns(
            ["event_type", "n_credits", "n_conversions_touched"]),
        batch_format="pyarrow")


Q_ATTRIBUTION_SQL = """
WITH c AS (SELECT user_id, epoch_us(ts) AS ct, event_id
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id, epoch_us(ts) AS tt, event_type
      FROM events WHERE event_type <> 'purchase'),
j AS (SELECT c.event_id AS conv, t.event_type
      FROM c JOIN t ON t.user_id = c.user_id
       AND t.tt >= c.ct - 3600000000 AND t.tt < c.ct)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_credits,
       CAST(count(DISTINCT conv) AS BIGINT) AS n_conversions_touched
FROM j GROUP BY event_type
"""


def q_diversity(sf_dir: str):
    """Gini-Simpson diversity of the language mix per source — the
    corpus-composition health metric (probability two random docs of
    a source differ in language), in EXACT integers: per (source,
    lang) counts from one bounded fold, then per source
    div_micro = 1_000_000 * (N^2 - sum n_i^2) // N^2 (one integer
    division, no float probabilities). Emits (source, n_docs,
    n_langs, div_micro)."""
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    docs = _read(sf_dir, "documents", ["source", "lang"])

    def partials(batch: pa.Table) -> pa.Table:
        key = np.char.add(np.char.add(
            np.asarray(batch["source"].to_pylist()), "\x1f"),
            np.asarray(batch["lang"].to_pylist()))
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({"k": pa.array(u),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "bk": pa.array(np.abs(hash_str(
                             list(u), 9)) % 16)})

    cell = (docs.map_batches(partials, batch_format="pyarrow")
            .groupby("bk").map_groups(
                lambda g: _fold_str_sums(g.drop_columns(["bk"]), ["n"]),
                batch_format="pyarrow"))

    def per_source(batch: pa.Table) -> pa.Table:
        ks = [k.split("\x1f") for k in batch["k"].to_pylist()]
        src = np.asarray([s for s, _ in ks])
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(src, return_inverse=True)
        tot = np.bincount(inv, weights=n).astype(np.int64)
        sq = np.bincount(inv, weights=n * n).astype(np.int64)
        nl = np.bincount(inv).astype(np.int64)
        return pa.table({
            "source": pa.array(u),
            "n_docs": pa.array(tot),
            "n_langs": pa.array(nl),
            "div_micro": pa.array(
                1_000_000 * (tot * tot - sq) // (tot * tot))})

    # the (source, lang) cell table is tiny (sources x langs); one
    # driver-side-free coalesce into a single block finishes it
    return cell.repartition(1).map_batches(
        per_source, batch_format="pyarrow", batch_size=None)


Q_DIVERSITY_SQL = """
WITH c AS (SELECT source, lang, count(*) AS n FROM documents
           GROUP BY 1, 2),
s AS (SELECT source, sum(n) AS nd, count(*) AS nl,
             sum(n * n) AS sq
      FROM c GROUP BY source)
SELECT source, CAST(nd AS BIGINT) AS n_docs,
       CAST(nl AS BIGINT) AS n_langs,
       CAST(1000000 * (nd * nd - sq) // (nd * nd) AS BIGINT)
       AS div_micro
FROM s
"""


def q_quantile_normalize(sf_dir: str):
    """Quantile normalization of event values per type onto the
    pooled distribution (windows.quantile_normalize — the
    batch-effect-correction primitive): row value -> the GLOBAL value
    at rank max(1, rk*N//nt) where rk is its (cents, id) rank within
    its type. Integer centi-units, deterministic ties; per-type AND
    global ranks via the sorted-scan block-offset pattern; one grace
    join does the rank lookup. The twin is two ROW_NUMBER windows +
    a join."""
    from osmray.windows import quantile_normalize

    return quantile_normalize(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]))


Q_QUANTILE_NORMALIZE_SQL = """
WITH e AS (SELECT event_id, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
r AS (SELECT event_id, event_type, cents,
        ROW_NUMBER() OVER (PARTITION BY event_type
          ORDER BY cents, event_id) AS rk,
        count(*) OVER (PARTITION BY event_type) AS nt,
        count(*) OVER () AS n
      FROM e),
g AS (SELECT cents AS gval,
        ROW_NUMBER() OVER (ORDER BY cents, event_id) AS grank
      FROM e)
SELECT r.event_id, r.event_type, r.cents,
       CAST(g.gval AS BIGINT) AS qnorm_cents
FROM r JOIN g ON g.grank = greatest(1, (r.rk * r.n) // r.nt)
"""


def q_holt(sf_dir: str):
    """Holt double-exponential smoothing (level + TREND) with exact
    integer recurrences — the forecasting upgrade of q_ewma:
    l_t = l_{t-1} + b_{t-1} + floor((v_t - l_{t-1} - b_{t-1}) / 4)
    (alpha = 1/4) and
    b_t = b_{t-1} + floor((l_t - l_{t-1} - b_{t-1}) / 8)
    (beta = 1/8), both floor-division-exact in numpy and DuckDB,
    seeded l_1 = v_1, b_1 = 0. Emits per user the final level and
    trend, the 1-step-ahead forecast l+b, and a full-trajectory
    checksum (sum of l_t) — the whole recurrence is verified. The
    twin replays per user with the value list packed into the
    recursion state (the q_ewma pattern)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def smooth(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        v = (ii[order] * 48271) % 10000
        lv = int(v[0])
        b = 0
        csum = lv
        for t in range(1, len(v)):
            pred = lv + b
            nl = pred + (int(v[t]) - pred) // 4
            b = b + (nl - pred) // 8
            lv = nl
            csum += lv
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "n_obs": pa.array([len(v)], pa.int64()),
            "level": pa.array([lv], pa.int64()),
            "trend": pa.array([b], pa.int64()),
            "forecast": pa.array([lv + b], pa.int64()),
            "l_sum": pa.array([csum], pa.int64())})

    return ds.groupby("user_id").map_groups(smooth, batch_format="pyarrow")


Q_HOLT_SQL = """
WITH RECURSIVE p AS MATERIALIZED (
  SELECT user_id, ts, event_id, (event_id * 48271) % 10000 AS v
  FROM events
),
ob AS MATERIALIZED (
  SELECT user_id, list(v ORDER BY ts, event_id) AS vs, count(*) AS n
  FROM p GROUP BY user_id
),
hw AS (
  SELECT user_id, vs, n, 1 AS t, CAST(vs[1] AS BIGINT) AS l,
         CAST(0 AS BIGINT) AS b, CAST(vs[1] AS BIGINT) AS csum
  FROM ob
  UNION ALL
  SELECT user_id, vs, n, t + 1,
    (l + b) + CAST(floor((vs[t + 1] - l - b) / 4.0) AS BIGINT),
    b + CAST(floor(CAST(floor((vs[t + 1] - l - b) / 4.0) AS BIGINT)
                   / 8.0) AS BIGINT),
    csum + (l + b)
         + CAST(floor((vs[t + 1] - l - b) / 4.0) AS BIGINT)
  FROM hw WHERE t < n
),
fin AS (SELECT * FROM hw WHERE t = n)
SELECT user_id, CAST(n AS BIGINT) AS n_obs, l AS level, b AS trend,
       CAST(l + b AS BIGINT) AS forecast, csum AS l_sum
FROM fin
"""


def q_haar(sf_dir: str):
    """Haar wavelet band energies per user stream — the
    multiresolution time-series signature (complements q_autocorr /
    q_sax / q_ewma): each user's centi-value stream resamples onto 16
    equal time buckets over its own [t0, t_max] span (bucket =
    min(15, (ts-t0)*16 // span); degenerate spans land in bucket 0),
    then the UNNORMALIZED Haar pyramid (pairwise sums up, squared
    pairwise differences per level — pure integers) yields 4 detail
    energies + the total. One per-user sorted pass, vectorized
    bincount + reshape folds. The twin densifies the 16 buckets via
    generate_series and replays the pyramid as explicit arithmetic.
    Emits (user_id, e1, e2, e3, e4, total)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_key(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.floor(g["value"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        t0, t1 = int(tv.min()), int(tv.max())
        span = t1 - t0
        if span == 0:
            bkt = np.zeros(len(tv), np.int64)
        else:
            bkt = np.minimum(15, (tv - t0) * 16 // span)
        b = np.bincount(bkt, weights=cents, minlength=16).astype(np.int64)
        es = []
        cur = b
        while len(cur) > 1:
            pairs = cur.reshape(-1, 2)
            d = pairs[:, 0] - pairs[:, 1]
            es.append(int((d * d).sum()))
            cur = pairs.sum(axis=1)
        return pa.table({
            "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
            "e1": pa.array([es[0]], pa.int64()),
            "e2": pa.array([es[1]], pa.int64()),
            "e3": pa.array([es[2]], pa.int64()),
            "e4": pa.array([es[3]], pa.int64()),
            "total": pa.array([int(cur[0])], pa.int64())})

    return ds.groupby("user_id").map_groups(per_key,
                                            batch_format="pyarrow")


Q_HAAR_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS t,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
sp AS (SELECT user_id, min(t) AS t0, max(t) AS t1 FROM e GROUP BY 1),
bk AS (SELECT e.user_id, e.cents,
         CASE WHEN sp.t1 = sp.t0 THEN 0
              ELSE least(15, (e.t - sp.t0) * 16 // (sp.t1 - sp.t0))
         END AS bkt
       FROM e JOIN sp ON sp.user_id = e.user_id),
dense AS (SELECT user_id,
  coalesce(sum(CASE WHEN bkt = 0 THEN cents END), 0) AS b0,
  coalesce(sum(CASE WHEN bkt = 1 THEN cents END), 0) AS b1,
  coalesce(sum(CASE WHEN bkt = 2 THEN cents END), 0) AS b2,
  coalesce(sum(CASE WHEN bkt = 3 THEN cents END), 0) AS b3,
  coalesce(sum(CASE WHEN bkt = 4 THEN cents END), 0) AS b4,
  coalesce(sum(CASE WHEN bkt = 5 THEN cents END), 0) AS b5,
  coalesce(sum(CASE WHEN bkt = 6 THEN cents END), 0) AS b6,
  coalesce(sum(CASE WHEN bkt = 7 THEN cents END), 0) AS b7,
  coalesce(sum(CASE WHEN bkt = 8 THEN cents END), 0) AS b8,
  coalesce(sum(CASE WHEN bkt = 9 THEN cents END), 0) AS b9,
  coalesce(sum(CASE WHEN bkt = 10 THEN cents END), 0) AS b10,
  coalesce(sum(CASE WHEN bkt = 11 THEN cents END), 0) AS b11,
  coalesce(sum(CASE WHEN bkt = 12 THEN cents END), 0) AS b12,
  coalesce(sum(CASE WHEN bkt = 13 THEN cents END), 0) AS b13,
  coalesce(sum(CASE WHEN bkt = 14 THEN cents END), 0) AS b14,
  coalesce(sum(CASE WHEN bkt = 15 THEN cents END), 0) AS b15
  FROM bk GROUP BY user_id)
SELECT user_id,
  CAST((b0 - b1) * (b0 - b1) + (b2 - b3) * (b2 - b3) + (b4 - b5) * (b4 - b5) + (b6 - b7) * (b6 - b7) + (b8 - b9) * (b8 - b9) + (b10 - b11) * (b10 - b11) + (b12 - b13) * (b12 - b13) + (b14 - b15) * (b14 - b15) AS BIGINT) AS e1,
  CAST(((b0 + b1) - (b2 + b3)) * ((b0 + b1) - (b2 + b3)) + ((b4 + b5) - (b6 + b7)) * ((b4 + b5) - (b6 + b7)) + ((b8 + b9) - (b10 + b11)) * ((b8 + b9) - (b10 + b11)) + ((b12 + b13) - (b14 + b15)) * ((b12 + b13) - (b14 + b15)) AS BIGINT) AS e2,
  CAST((((b0 + b1) + (b2 + b3)) - ((b4 + b5) + (b6 + b7))) * (((b0 + b1) + (b2 + b3)) - ((b4 + b5) + (b6 + b7))) + (((b8 + b9) + (b10 + b11)) - ((b12 + b13) + (b14 + b15))) * (((b8 + b9) + (b10 + b11)) - ((b12 + b13) + (b14 + b15))) AS BIGINT) AS e3,
  CAST(((((b0 + b1) + (b2 + b3)) + ((b4 + b5) + (b6 + b7))) - (((b8 + b9) + (b10 + b11)) + ((b12 + b13) + (b14 + b15)))) * ((((b0 + b1) + (b2 + b3)) + ((b4 + b5) + (b6 + b7))) - (((b8 + b9) + (b10 + b11)) + ((b12 + b13) + (b14 + b15)))) AS BIGINT) AS e4,
  CAST(((((b0 + b1) + (b2 + b3)) + ((b4 + b5) + (b6 + b7))) + (((b8 + b9) + (b10 + b11)) + ((b12 + b13) + (b14 + b15)))) AS BIGINT) AS total
FROM dense
"""


def q_hll_union(sf_dir: str):
    """Sketch MERGEABILITY end to end — the property that makes
    sketches THE 100-TB cardinality tool: per-event_type HLL register
    tables (the q_hll sketch) union into ONE global register set by
    bucketwise max — computed here by merging the ALREADY-GROUPED
    per-type sketches (a second tiny Max fold over at most
    types x 1024 rows), NOT by re-scanning the input. The twin
    derives the same global registers directly from the raw rows, so
    the hash check certifies union(per-type sketches) == sketch(union
    of inputs) — the merge law itself. Emits (bucket, rho_max)."""
    from ray.data.aggregate import Max

    from osmray.sketch import hll_registers

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    per_type = hll_registers(ds, "event_type", "user_id")
    return (per_type.select_columns(["bucket", "rho_max"])
            .groupby("bucket").aggregate(Max("rho_max",
                                             alias_name="rho_max")))


def _hll_union_sql() -> str:
    from osmray.sketch import HLL_C1, HLL_C2, HLL_P

    m62 = 1 << 62
    return f"""
WITH s1 AS (
  SELECT CAST((CAST(xor(user_id, user_id >> 31) AS HUGEINT)
               * {HLL_C1}) % {m62} AS BIGINT) AS h
  FROM events
),
s2 AS (SELECT CAST((CAST(xor(h, h >> 29) AS HUGEINT) * {HLL_C2})
              % {m62} AS BIGINT) AS h FROM s1),
hx AS (SELECT xor(h, h >> 32) AS h FROM s2),
br AS (SELECT h & {(1 << HLL_P) - 1} AS bucket,
              h >> {HLL_P} AS rest FROM hx),
p2 AS (SELECT unnest(generate_series(0, 51))::BIGINT AS k,
              unnest(list_transform(generate_series(0, 51),
                                    x -> 1::BIGINT << x)) AS v),
rho_t AS (
  SELECT bucket,
    CASE WHEN rest = 0 THEN {62 - HLL_P + 1} ELSE p2.k + 1 END AS rho
  FROM br LEFT JOIN p2 ON (rest & (-rest)) = p2.v
)
SELECT bucket, max(rho) AS rho_max FROM rho_t GROUP BY bucket
"""


Q_HLL_UNION_SQL = _hll_union_sql()


def q_dissolve(sf_dir: str):
    """Dissolve — the classic GIS generalization op (merge touching
    same-attribute cells into regions): part-derived cells on a 256
    grid carry attribute p_partkey % 7 (cell collisions resolve to
    the MIN attribute — one keyed fold), 4-connected same-attribute
    adjacency edges feed connected_components (two-engine), isolated
    cells stay their own region, and one fold per (attr, region)
    rolls up. Emits per attribute (attr, n_regions, n_cells,
    max_region). The twin dissolves by alternating per-attribute
    run-min sweeps (the q_blob_extract technique, PARTITIONed by
    attr)."""
    from ray.data.aggregate import Count, Max

    from osmray.graph import connected_components
    from osmray.joins import bucketed_join
    from osmray.tableops import sorted_fold, sorted_fold_sums

    parts = _read(sf_dir, "part", ["p_partkey"])

    def cells(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761) % (1 << 32)
        cx, cy = h % 256, (h // 256) % 256
        attr = k % 7
        u, inv = np.unique(cx * 256 + cy, return_inverse=True)
        amin = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(amin, inv, attr)
        return pa.table({"cell": pa.array(u), "attr": pa.array(amin)})

    cell_attr = sorted_fold(
        parts.map_batches(cells, batch_format="pyarrow"),
        "cell", ["attr"], ["min"]).materialize()

    def nbr_edges(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = batch["attr"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c // 256, c % 256
        outs = []
        for dx, dy in ((1, 0), (0, 1)):
            nx, ny = cx + dx, cy + dy
            ok = (nx < 256) & (ny < 256)
            outs.append(pa.table({
                "u": pa.array(c[ok]),
                "v": pa.array(nx[ok] * 256 + ny[ok]),
                "au": pa.array(a[ok])}))
        return pa.concat_tables(outs)

    cand = bucketed_join(
        cell_attr.map_batches(nbr_edges, batch_format="pyarrow"),
        cell_attr, on="v", right_on="cell", num_buckets=8)
    same = cand.map_batches(
        lambda t: t.filter(_pc2.equal(t["au"], t["attr"]))
        .select(["u", "v"]), batch_format="pyarrow").materialize()
    if same.count() == 0:
        # no same-attribute adjacency anywhere: every cell is its
        # own region (sparse small-SF grids)
        att = cell_attr.map_batches(
            lambda t: t.append_column(
                "comp", t["cell"].cast(pa.int64())),
            batch_format="pyarrow")
    else:
        comps = connected_components(same).materialize()
        att = bucketed_join(cell_attr, comps, on="cell",
                            right_on="node", num_buckets=8, how="left")

    def region_partials(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = batch["attr"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["comp"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        isnull = _pc2.is_null(col).to_numpy(zero_copy_only=False)
        comp = _pc2.fill_null(col, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        comp = np.where(isnull, c, comp)
        pk = a * 65536 + comp
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    regions = sorted_fold_sums(
        att.map_batches(region_partials, batch_format="pyarrow"),
        "pk", ["n"])

    def attr_partials(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = pk // 65536
        u, inv = np.unique(a, return_inverse=True)
        mx = np.zeros(len(u), np.int64)
        np.maximum.at(mx, inv, n)
        return pa.table({
            "attr": pa.array(u),
            "n_regions": pa.array(np.bincount(inv).astype(np.int64)),
            "n_cells": pa.array(np.bincount(
                inv, weights=n).astype(np.int64)),
            "max_region": pa.array(mx)})

    folded = sorted_fold(
        regions.map_batches(attr_partials, batch_format="pyarrow"),
        "attr", ["n_regions", "n_cells", "max_region"],
        ["sum", "sum", "max"])
    return folded


def _dissolve_sql() -> str:
    R = 8
    sweeps = []
    for i in range(R):
        sweeps.append(f"""a{i} AS MATERIALIZED (
  SELECT attr, key, min(lbl) OVER (PARTITION BY attr, key % 256, isl)
         AS lbl
  FROM (SELECT attr, key, lbl,
          key // 256 - ROW_NUMBER() OVER (
            PARTITION BY attr, key % 256 ORDER BY key // 256) AS isl
        FROM l{i})),
l{i + 1} AS MATERIALIZED (
  SELECT attr, key, min(lbl) OVER (PARTITION BY attr, key // 256, isl)
         AS lbl
  FROM (SELECT attr, key, lbl,
          key % 256 - ROW_NUMBER() OVER (
            PARTITION BY attr, key // 256 ORDER BY key % 256) AS isl
        FROM a{i}))""")
    return f"""
WITH ca AS MATERIALIZED (
  SELECT cell AS key, min(attr) AS attr FROM (
    SELECT ((p_partkey * 2654435761) % 4294967296 % 256) * 256
           + ((p_partkey * 2654435761) % 4294967296 // 256 % 256)
           AS cell,
           p_partkey % 7 AS attr
    FROM part) GROUP BY cell),
l0 AS MATERIALIZED (SELECT attr, key, key AS lbl FROM ca),
{",".join(sweeps)},
reg AS (SELECT attr, lbl, count(*) AS n FROM l{R} GROUP BY 1, 2)
SELECT CAST(attr AS BIGINT) AS attr,
       CAST(count(*) AS BIGINT) AS n_regions,
       CAST(sum(n) AS BIGINT) AS n_cells,
       CAST(max(n) AS BIGINT) AS max_region
FROM reg GROUP BY attr
"""


Q_DISSOLVE_SQL = _dissolve_sql()


def q_kmv_union(sf_dir: str):
    """KMV merge law certified end to end (the q_hll_union story for
    bottom-k sketches): the input splits into two shards by
    l_linenumber parity, each builds its own bottom-256 sketch
    (sketch.kmv_bottom_k — fully distributed), and the two O(k)
    sketches merge on the driver (distinct union, keep the 256
    smallest, re-derive the estimator) — sketches being O(k) driver
    objects is their POINT. The twin computes the bottom-256 of the
    UNDIVIDED input, so the hash check certifies
    merge(sketch(A), sketch(B)) == sketch(A ∪ B). Emits
    (rank, h, est_distinct) — identical to q_kmv's output."""
    import pyarrow.compute as pc

    from osmray.sketch import kmv_bottom_k

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    parts = []
    for parity in (0, 1):
        shard = ds.map_batches(
            lambda t, par=parity: t.filter(pc.equal(
                pc.bit_wise_and(t["l_linenumber"].cast(pa.int64()), 1),
                par)).select(["l_orderkey"]),
            batch_format="pyarrow")
        parts.append(kmv_bottom_k(shard, "l_orderkey", k=256).to_pandas())
    hs = np.unique(np.concatenate(
        [p["h"].to_numpy().astype(np.int64) for p in parts]))[:256]
    nk = len(hs)
    est = int(255 * 4611686018427387904.0 // hs[-1]) if nk == 256 else nk
    import ray.data

    return ray.data.from_arrow(pa.table({
        "rank": pa.array(np.arange(1, nk + 1, dtype=np.int64)),
        "h": pa.array(hs),
        "est_distinct": pa.array(np.full(nk, est, np.int64))}))


Q_KMV_UNION_SQL = _kmv_sql()


def q_cms_union(sf_dir: str):
    """Count-Min merge law — the third sketch-merge certificate
    (with q_hll_union / q_kmv_union): the input splits by
    l_linenumber parity, each shard builds its own 4x1024 CMS
    (sketch.count_min, fully distributed), and the merged sketch is
    the ELEMENTWISE SUM of counters — one keyed sum fold over the
    two bounded counter tables, no raw-row rescan. The twin rebuilds
    every counter from the undivided input, so the hash check
    certifies merge(cms(A), cms(B)) == cms(A ∪ B). Emits
    (d, col, n)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from osmray.sketch import count_min

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    shards = []
    for parity in (0, 1):
        shard = ds.map_batches(
            lambda t, par=parity: t.filter(pc.equal(
                pc.bit_wise_and(t["l_linenumber"].cast(pa.int64()), 1),
                par)).select(["l_orderkey"]),
            batch_format="pyarrow")
        shards.append(count_min(shard, "l_orderkey",
                                depth=4, width=1024))
    merged = shards[0].union(shards[1])

    def pack(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["col"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"pk": pa.array(d * 1024 + c), "n": batch["n"]})

    summed = (merged.map_batches(pack, batch_format="pyarrow")
              .groupby("pk").aggregate(Sum("n", alias_name="n")))
    return summed.map_batches(
        lambda t: pa.table({
            "d": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) // 1024),
            "col": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) % 1024),
            "n": t["n"].cast(pa.int64())}),
        batch_format="pyarrow")


Q_CMS_UNION_SQL = _count_min_sql()


def q_str_pack(sf_dir: str):
    """STR (sort-tile-recursive) R-tree bulk-load packing — the
    spatial-index construction the north-star's STRtree bucketing
    rests on: N part points pack into leaf nodes of capacity 64 by
    the classic two-phase recipe — global x-rank slices into
    S = ceil(sqrt(ceil(N/64))) vertical strips of ceil(N/S) points,
    each strip y-sorts and chunks into nodes of 64 — and every leaf
    reports its MBR + count (the index statistics a query planner
    prunes with). Ranks by the sorted-scan block-offset pattern
    (both phases; ties (coord, key) deterministic), MBRs by one
    min/max fold. Emits (strip, node, n, x0, x1, y0, y1)."""
    import math

    import ray

    from osmray.tableops import sorted_fold

    ds = _read(sf_dir, "part", ["p_partkey"])

    def pts(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array(k),
                         "x": pa.array((k * 48271) % 67108864),
                         "y": pa.array((k * 16807) % 67108864)})

    base = ds.map_batches(pts, batch_format="pyarrow").materialize()
    n_total = base.count()
    m = (n_total + 63) // 64
    s0 = math.isqrt(m)
    S = s0 if s0 * s0 >= m else s0 + 1
    C = (n_total + S - 1) // S

    # phase 1: global x-rank -> strip
    xs = base.sort(["x", "k"]).materialize()

    def xblock(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"x0": pa.array([], pa.int64()),
                             "k0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "x0": pa.array([int(batch["x"][0].as_py())]),
            "k0": pa.array([int(batch["k"][0].as_py())]),
            "n": pa.array([len(batch)])})

    st = (xs.map_batches(xblock, batch_format="pyarrow",
                         batch_size=None)
          .to_pandas().sort_values(["x0", "k0"]))
    offs = np.concatenate(([0], np.cumsum(st["n"].to_numpy())[:-1]))
    off_ref = ray.put({(int(a), int(b)): int(o) for a, b, o in zip(
        st["x0"], st["k0"], offs)})

    def strip_of(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "strip": pa.array([], pa.int64())})
        base_off = ray.get(off_ref)[(int(batch["x"][0].as_py()),
                                     int(batch["k"][0].as_py()))]
        rk = np.arange(len(batch), dtype=np.int64) + base_off
        return pa.table({"k": batch["k"], "x": batch["x"],
                         "y": batch["y"],
                         "strip": pa.array(rk // C)})

    striped = xs.map_batches(strip_of, batch_format="pyarrow",
                             batch_size=None)

    # phase 2: per-strip y-rank -> node
    ys = striped.sort(["strip", "y", "k"]).materialize()

    def yruns(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"strip": pa.array([], pa.int64()),
                             "y0": pa.array([], pa.int64()),
                             "k0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        sp = batch["strip"].to_numpy(zero_copy_only=False)
        yy = batch["y"].to_numpy(zero_copy_only=False)
        kk = batch["k"].to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], sp[1:] != sp[:-1]))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(sp)])))
        return pa.table({"strip": pa.array(sp[starts].astype(np.int64)),
                         "y0": pa.array(yy[starts].astype(np.int64)),
                         "k0": pa.array(kk[starts].astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    st2 = (ys.map_batches(yruns, batch_format="pyarrow",
                          batch_size=None)
           .to_pandas().sort_values(["strip", "y0", "k0"]))
    run2: dict = {}
    offs2: dict = {}
    for _, r in st2.iterrows():
        bk = (int(r["strip"]), int(r["y0"]), int(r["k0"]))
        offs2[bk] = run2.get(int(r["strip"]), 0)
        run2[int(r["strip"])] = run2.get(int(r["strip"]), 0) + int(r["n"])
    off2_ref = ray.put(offs2)

    def node_partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "x0": pa.array([], pa.int64()),
                             "x1": pa.array([], pa.int64()),
                             "y0": pa.array([], pa.int64()),
                             "y1": pa.array([], pa.int64())})
        sp = batch["strip"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        yy = batch["y"].to_numpy(zero_copy_only=False).astype(np.int64)
        xx = batch["x"].to_numpy(zero_copy_only=False).astype(np.int64)
        kk = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        offs_d = ray.get(off2_ref)
        new = np.concatenate(([True], sp[1:] != sp[:-1]))
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        local = np.arange(len(sp), dtype=np.int64) - starts[gid]
        base_off = np.asarray(
            [offs_d[(int(sp[s]), int(yy[s]), int(kk[s]))]
             for s in starts], np.int64)
        node = (local + base_off[gid]) // 64
        pk = sp * 65536 + node
        u, inv = np.unique(pk, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        yn = mn.copy()
        yx = mx.copy()
        np.minimum.at(mn, inv, xx)
        np.maximum.at(mx, inv, xx)
        np.minimum.at(yn, inv, yy)
        np.maximum.at(yx, inv, yy)
        return pa.table({"pk": pa.array(u),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "x0": pa.array(mn), "x1": pa.array(mx),
                         "y0": pa.array(yn), "y1": pa.array(yx)})

    folded = sorted_fold(
        ys.map_batches(node_partials, batch_format="pyarrow",
                       batch_size=None),
        "pk", ["n", "x0", "x1", "y0", "y1"],
        ["sum", "min", "max", "min", "max"])
    return folded.map_batches(
        lambda t: pa.table({
            "strip": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) // 65536),
            "node": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) % 65536),
            "n": t["n"], "x0": t["x0"], "x1": t["x1"],
            "y0": t["y0"], "y1": t["y1"]}),
        batch_format="pyarrow")


Q_STR_PACK_SQL = """
WITH p AS (SELECT p_partkey AS k,
             (p_partkey * 48271) % 67108864 AS x,
             (p_partkey * 16807) % 67108864 AS y
           FROM part),
n AS (SELECT count(*) AS nt FROM p),
sz AS (SELECT nt, (nt + 63) // 64 AS m,
         (SELECT min(s.range) FROM range(1, 4096) s
          WHERE s.range * s.range >= (nt + 63) // 64) AS S
       FROM n),
xr AS (SELECT k, x, y,
         ROW_NUMBER() OVER (ORDER BY x, k) - 1 AS xrk
       FROM p),
sp AS (SELECT xr.*, xrk // ((sz.nt + sz.S - 1) // sz.S) AS strip
       FROM xr CROSS JOIN sz),
yr AS (SELECT strip, x, y,
         (ROW_NUMBER() OVER (PARTITION BY strip ORDER BY y, k) - 1)
         // 64 AS node
       FROM sp)
SELECT CAST(strip AS BIGINT) AS strip, CAST(node AS BIGINT) AS node,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(x) AS BIGINT) AS x0, CAST(max(x) AS BIGINT) AS x1,
       CAST(min(y) AS BIGINT) AS y0, CAST(max(y) AS BIGINT) AS y1
FROM yr GROUP BY 1, 2
"""


def q_rtree_probe(sf_dir: str):
    """Index-pruning selectivity — probe the STR-packed leaves
    (q_str_pack) with order-derived query boxes and count
    intersecting leaf MBRs per query: the number a planner uses to
    decide scan-vs-index, and the leaf-level I/O bound of the query.
    The leaf table is O(N/64) and BROADCASTS (one ray.put); probes
    stream through one vectorized map_batches — no shuffle at all.
    Emits (qid, n_leaves_hit, n_pts_bound) where n_pts_bound sums
    the hit leaves' counts (the I/O upper bound)."""
    import ray

    leaves = q_str_pack(sf_dir).to_pandas()
    lx0 = leaves["x0"].to_numpy().astype(np.int64)
    lx1 = leaves["x1"].to_numpy().astype(np.int64)
    ly0 = leaves["y0"].to_numpy().astype(np.int64)
    ly1 = leaves["y1"].to_numpy().astype(np.int64)
    ln = leaves["n"].to_numpy().astype(np.int64)
    ref = ray.put((lx0, lx1, ly0, ly1, ln))

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def probe(batch: pa.Table) -> pa.Table:
        ax0, ax1, ay0, ay1, an = ray.get(ref)
        k = batch["o_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        k = k[k % 199 == 0]
        cx = (k * 104729) % 67108864
        cy = (k * 99991) % 67108864
        h = 1 + k % 1048576
        qx0, qx1 = cx - h, cx + h
        qy0, qy1 = cy - h, cy + h
        hit = ((qx0[:, None] <= ax1[None, :])
               & (qx1[:, None] >= ax0[None, :])
               & (qy0[:, None] <= ay1[None, :])
               & (qy1[:, None] >= ay0[None, :]))
        return pa.table({
            "qid": pa.array(k),
            "n_leaves_hit": pa.array(hit.sum(axis=1).astype(np.int64)),
            "n_pts_bound": pa.array(
                (hit * an[None, :]).sum(axis=1).astype(np.int64))})

    return orders.map_batches(probe, batch_format="pyarrow")


Q_RTREE_PROBE_SQL = f"""
WITH leaves AS ({Q_STR_PACK_SQL}),
qb AS (SELECT o_orderkey AS qid,
         (o_orderkey * 104729) % 67108864 AS cx,
         (o_orderkey * 99991) % 67108864 AS cy,
         1 + o_orderkey % 1048576 AS h
       FROM orders WHERE o_orderkey % 199 = 0)
SELECT qb.qid, CAST(coalesce(count(l.n), 0) AS BIGINT) AS n_leaves_hit,
       CAST(coalesce(sum(l.n), 0) AS BIGINT) AS n_pts_bound
FROM qb LEFT JOIN leaves l
  ON qb.cx - qb.h <= l.x1 AND qb.cx + qb.h >= l.x0
 AND qb.cy - qb.h <= l.y1 AND qb.cy + qb.h >= l.y0
GROUP BY qb.qid
"""


def q_freq_spectrum(sf_dir: str):
    """Word frequency spectrum — the Zipf/Heaps corpus diagnostic
    (how many distinct words occur ~2^(b/4) times; hapax counts,
    tail mass): exact word counts at unbounded vocabulary (the hashed
    string-count shuffle), binned by floor(4*log2(count)) —
    quarter-log bins, the SAME IEEE double arithmetic on both sides,
    exact at the power-of-two boundaries — into one bounded fold.
    Emits (b, n_words, n_tokens)."""
    from osmray.tableops import sorted_fold_sums

    docs = _read(sf_dir, "documents", ["text"])
    counts = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, False),
                         batch_format="pyarrow"), ["w"])

    def bins(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.floor(4 * np.log2(n.astype(np.float64))).astype(np.int64)
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({
            "b": pa.array(u),
            "n_words": pa.array(np.bincount(inv).astype(np.int64)),
            "n_tokens": pa.array(np.bincount(
                inv, weights=n).astype(np.int64))})

    return sorted_fold_sums(
        counts.map_batches(bins, batch_format="pyarrow"),
        "b", ["n_words", "n_tokens"])


Q_FREQ_SPECTRUM_SQL = """
WITH c AS (SELECT w, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1)
SELECT CAST(floor(4 * log2(CAST(n AS DOUBLE))) AS BIGINT) AS b,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n) AS BIGINT) AS n_tokens
FROM c GROUP BY 1
"""


def q_rfm(sf_dir: str):
    """RFM customer segmentation — recency / frequency / monetary
    quintile scores, the classic lifecycle-marketing primitive: per
    user one fold gives (last_us, n_events, cents); each dimension
    cuts at the EXACT global quintile ranks max(1, n*p//100)
    (p = 20,40,60,80 — the distributed order-stats sort, as
    q_calibration), score = #cuts strictly below the value (ties
    land low, both sides), rfm = 100*r + 10*f + m. Emits
    (user_id, r_score, f_score, m_score, rfm)."""
    from osmray.tableops import exact_order_stats, sorted_fold

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        tv = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, tv)
        return pa.table({
            "user_id": pa.array(u),
            "last_us": pa.array(mx),
            "n_events": pa.array(np.bincount(inv).astype(np.int64)),
            "cents": pa.array(np.bincount(
                inv, weights=cents).astype(np.int64))})

    per_user = sorted_fold(
        ev.map_batches(partials, batch_format="pyarrow"),
        "user_id", ["last_us", "n_events", "cents"],
        ["max", "sum", "sum"]).materialize()

    cuts = {}
    for col in ("last_us", "n_events", "cents"):
        cuts[col] = np.sort(exact_order_stats(
            per_user, col, [20, 40, 60, 80]
        ).to_pandas()["value"].to_numpy().astype(np.int64))

    import ray

    cref = ray.put(cuts)

    def score(batch: pa.Table) -> pa.Table:
        cu = ray.get(cref)
        out = {"user_id": batch["user_id"]}
        sc = {}
        for col, nm in (("last_us", "r_score"), ("n_events", "f_score"),
                        ("cents", "m_score")):
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            sc[nm] = np.sum(v[:, None] > cu[col][None, :],
                            axis=1).astype(np.int64)
            out[nm] = pa.array(sc[nm])
        out["rfm"] = pa.array(100 * sc["r_score"] + 10 * sc["f_score"]
                              + sc["m_score"])
        return pa.table(out)

    return per_user.map_batches(score, batch_format="pyarrow")


Q_RFM_SQL = """
WITH pu AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
              count(*) AS n_events,
              sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY user_id),
n AS (SELECT count(*) AS nt FROM pu),
cr AS (SELECT p.p, r.v AS c FROM (VALUES (20), (40), (60), (80)) p(p)
       JOIN (SELECT last_us AS v,
               ROW_NUMBER() OVER (ORDER BY last_us) AS rn FROM pu) r
         ON r.rn = greatest(1, (SELECT nt FROM n) * p.p // 100)),
cf AS (SELECT p.p, r.v AS c FROM (VALUES (20), (40), (60), (80)) p(p)
       JOIN (SELECT n_events AS v,
               ROW_NUMBER() OVER (ORDER BY n_events) AS rn FROM pu) r
         ON r.rn = greatest(1, (SELECT nt FROM n) * p.p // 100)),
cm AS (SELECT p.p, r.v AS c FROM (VALUES (20), (40), (60), (80)) p(p)
       JOIN (SELECT cents AS v,
               ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM pu) r
         ON r.rn = greatest(1, (SELECT nt FROM n) * p.p // 100)),
sc AS (SELECT pu.user_id,
         (SELECT count(*) FROM cr WHERE pu.last_us > cr.c) AS r_score,
         (SELECT count(*) FROM cf WHERE pu.n_events > cf.c) AS f_score,
         (SELECT count(*) FROM cm WHERE pu.cents > cm.c) AS m_score
       FROM pu)
SELECT user_id, CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(100 * r_score + 10 * f_score + m_score AS BIGINT) AS rfm
FROM sc
"""


def q_dwell(sf_dir: str):
    """Dwell-time rollup — the TIME-WEIGHTED spatial aggregation
    (seconds spent per cell, not visit counts): per user, each
    event's dwell = gap to the NEXT event (last event contributes
    none), attributed to the random-walk cell occupied at the event
    (the od_flows walk, 8-unit cells). One per-user sorted pass
    emitting per-cell partials, one packed-key fold. The twin is
    cumsum-window + LEAD + group. Emits (cx, cy, n_visits,
    dwell_us)."""
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_key(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        tv, ii = tv[order], ii[order]
        x = np.cumsum(ii * 7919 % 5 - 2) + 100000
        y = np.cumsum(ii * 104729 % 5 - 2) + 100000
        cx, cy = (x >> 3)[:-1], (y >> 3)[:-1]
        dwell = np.diff(tv)
        pk = cx * 65536 + cy
        u, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "pk": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "us": pa.array(np.bincount(
                inv, weights=dwell).astype(np.int64))})

    folded = sorted_fold_sums(
        ds.groupby("user_id").map_groups(per_key,
                                         batch_format="pyarrow"),
        "pk", ["n", "us"])
    return folded.map_batches(
        lambda t: pa.table({
            "cx": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) // 65536),
            "cy": pa.array(t["pk"].to_numpy(
                zero_copy_only=False) % 65536),
            "n_visits": t["n"], "dwell_us": t["us"]}),
        batch_format="pyarrow")


Q_DWELL_SQL = """
WITH base AS (SELECT user_id, event_id, epoch_us(ts) AS t,
    SUM(event_id * 7919 % 5 - 2) OVER w + 100000 AS x,
    SUM(event_id * 104729 % 5 - 2) OVER w + 100000 AS y
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING)),
d AS (SELECT x // 8 AS cx, y // 8 AS cy,
        LEAD(t) OVER (PARTITION BY user_id
                      ORDER BY t, event_id) - t AS dwell
      FROM base)
SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
       CAST(count(*) AS BIGINT) AS n_visits,
       CAST(sum(dwell) AS BIGINT) AS dwell_us
FROM d WHERE dwell IS NOT NULL GROUP BY 1, 2
"""


def q_slack(sf_dir: str):
    """Critical-path SLACK per task — the scheduling metric that
    actually drives pipeline tuning (slack 0 = on the critical path;
    positive slack = free float): forward longest-finish f(v) and
    backward longest-tail b(v) from TWO runs of the
    graph.dag_longest_path broadcast kernel (the backward pass is
    the same kernel on reversed edges), then
    slack = L - (f + b - dur) with L = max f. Same 120-task DAG as
    q_critical_path; both per-task vectors are O(N) driver arrays by
    the kernel's design. Emits (task, f_lp, b_lp, slack)."""
    import ray.data

    from osmray.graph import dag_longest_path

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])
    N = 120
    dur = (np.arange(N, dtype=np.int64) * 7919) % 16 + 1

    def mk(batch: pa.Table, rev: bool = False) -> pa.Table:
        p = _li_points(batch)
        pid = p["pid"][p["pid"] % 101 == 0]
        a = (pid * 2654435761) % 4294967296
        u = ((a >> 16) ^ (a & 65535)) % N
        b = (pid * 48271 + 99) % 4294967296
        v = ((b >> 16) ^ (b & 65535)) % N
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        uu, vv = (hi, lo) if rev else (lo, hi)
        return pa.table({"u": pa.array(uu[keep]),
                         "v": pa.array(vv[keep])})

    fwd = dag_longest_path(
        ds.map_batches(mk, batch_format="pyarrow"),
        dur, max_rounds=N + 2).to_pandas().sort_values("task")
    bwd = dag_longest_path(
        ds.map_batches(lambda t: mk(t, rev=True),
                       batch_format="pyarrow"),
        dur, max_rounds=N + 2).to_pandas().sort_values("task")
    f = fwd["lp"].to_numpy().astype(np.int64)
    b = bwd["lp"].to_numpy().astype(np.int64)
    L = int(f.max())
    slack = L - (f + b - dur)
    return ray.data.from_arrow(pa.table({
        "task": pa.array(np.arange(N, dtype=np.int64)),
        "f_lp": pa.array(f), "b_lp": pa.array(b),
        "slack": pa.array(slack)}))


Q_SLACK_SQL = """
WITH RECURSIVE ids AS MATERIALIZED (
  SELECT l_orderkey * 10 + l_linenumber AS pid FROM lineitem),
sel AS MATERIALIZED (SELECT pid FROM ids WHERE pid % 101 = 0),
hs AS MATERIALIZED (SELECT pid, (pid * 2654435761) % 4294967296 AS a,
              (pid * 48271 + 99) % 4294967296 AS b FROM sel),
g0 AS MATERIALIZED (SELECT xor(a // 65536, a % 65536) % 120 AS u0,
              xor(b // 65536, b % 65536) % 120 AS v0 FROM hs),
e AS MATERIALIZED (SELECT DISTINCT least(u0, v0) AS u,
                     greatest(u0, v0) AS v
                   FROM g0 WHERE u0 <> v0),
tasks AS MATERIALIZED (SELECT range AS task, (range * 7919) % 16 + 1 AS d
                       FROM range(0, 120)),
lp AS (
  SELECT task, d AS lp FROM tasks
  UNION
  SELECT e.v, lp.lp + t.d
  FROM lp JOIN e ON e.u = lp.task JOIN tasks t ON t.task = e.v
),
bp AS (
  SELECT task, d AS bp FROM tasks
  UNION
  SELECT e.u, bp.bp + t.d
  FROM bp JOIN e ON e.v = bp.task JOIN tasks t ON t.task = e.u
),
f AS (SELECT task, max(lp) AS f FROM lp GROUP BY task),
bq AS (SELECT task, max(bp) AS b FROM bp GROUP BY task)
SELECT f.task, CAST(f.f AS BIGINT) AS f_lp, CAST(bq.b AS BIGINT) AS b_lp,
       CAST((SELECT max(f) FROM f) - (f.f + bq.b - t.d) AS BIGINT)
       AS slack
FROM f JOIN bq ON bq.task = f.task JOIN tasks t ON t.task = f.task
"""


def q_outliers(sf_dir: str):
    """Robust outlier screening with the MAD rule — the
    distribution-free anomaly gate (|x - median| > 3 * MAD), per
    event_type over integer centi-values: two grouped-order-stats
    passes give each type's exact discrete median and MAD
    (tableops.grouped_order_stats — no task holds a group), the tiny
    per-type (median, MAD) table broadcasts, one vectorized pass
    counts violations. Emits (event_type, n, med, mad, n_outliers)."""
    import ray

    from osmray.tableops import grouped_order_stats, sorted_fold_sums

    ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "c": pa.array(np.floor(batch["value"].to_numpy(
                zero_copy_only=False) * 100 + 0.5).astype(np.int64))})

    base = ev.map_batches(cents, batch_format="pyarrow").materialize()
    med = {r["event_type"]: int(r["value"]) for r in
           grouped_order_stats(base, "event_type", "c",
                               [50]).take_all()}
    mref = ray.put(med)

    def absdev(batch: pa.Table) -> pa.Table:
        m = ray.get(mref)
        et = np.asarray(batch["event_type"].to_pylist())
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        meds = np.asarray([m[t] for t in et], np.int64)
        return pa.table({"event_type": batch["event_type"],
                         "c": pa.array(np.abs(c - meds))})

    mad = {r["event_type"]: int(r["value"]) for r in
           grouped_order_stats(
               base.map_batches(absdev, batch_format="pyarrow"),
               "event_type", "c", [50]).take_all()}
    sref = ray.put((med, mad))

    def partials(batch: pa.Table) -> pa.Table:
        m, s = ray.get(sref)
        et = np.asarray(batch["event_type"].to_pylist())
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(et, return_inverse=True)
        meds = np.asarray([m[t] for t in u], np.int64)[inv]
        mads = np.asarray([s[t] for t in u], np.int64)[inv]
        out = (np.abs(c - meds) > 3 * mads).astype(np.int64)
        from osmray.stages import hash_str

        return pa.table({
            "k": pa.array(u[inv]),
            "n": pa.array(np.ones(len(c), np.int64)),
            "n_out": pa.array(out),
            "bk": pa.array(np.abs(hash_str(list(u[inv]), 3)) % 8)})

    # block-collapse then bounded fold
    def collapse(batch: pa.Table) -> pa.Table:
        ks = np.asarray(batch["k"].to_pylist())
        u, inv = np.unique(ks, return_inverse=True)
        from osmray.stages import hash_str

        return pa.table({
            "k": pa.array(u),
            "n": pa.array(np.bincount(
                inv, weights=batch["n"].to_numpy(
                    zero_copy_only=False)).astype(np.int64)),
            "n_out": pa.array(np.bincount(
                inv, weights=batch["n_out"].to_numpy(
                    zero_copy_only=False)).astype(np.int64)),
            "bk": pa.array(np.abs(hash_str(list(u), 3)) % 8)})

    folded = (base.map_batches(partials, batch_format="pyarrow")
              .map_batches(lambda t: collapse(t.drop_columns(["bk"])),
                           batch_format="pyarrow")
              .groupby("bk").map_groups(
                  lambda g: _fold_str_sums(g.drop_columns(["bk"]),
                                           ["n", "n_out"]),
                  batch_format="pyarrow"))

    def emit(batch: pa.Table) -> pa.Table:
        m, s = ray.get(sref)
        ks = batch["k"].to_pylist()
        return pa.table({
            "event_type": pa.array(ks),
            "n": batch["n"],
            "med": pa.array([m[t] for t in ks], pa.int64()),
            "mad": pa.array([s[t] for t in ks], pa.int64()),
            "n_outliers": batch["n_out"]})

    return folded.map_batches(emit, batch_format="pyarrow")


Q_OUTLIERS_SQL = """
WITH e AS (SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
m AS (SELECT event_type,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c)
             AS BIGINT) AS med
      FROM e GROUP BY 1),
a AS (SELECT e.event_type, abs(e.c - m.med) AS ad, e.c, m.med
      FROM e JOIN m USING (event_type)),
s AS (SELECT event_type,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)
             AS BIGINT) AS mad
      FROM a GROUP BY 1)
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(a.med) AS BIGINT) AS med,
       CAST(max(s.mad) AS BIGINT) AS mad,
       CAST(sum(CASE WHEN a.ad > 3 * s.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM a JOIN s USING (event_type) GROUP BY a.event_type
"""


def q_lorenz(sf_dir: str):
    """Lorenz curve deciles — the inequality-profile companion of
    q_gini (WHERE the concentration sits, not just how much): users
    rank by their centi-value totals (ties -> smaller user id), and
    each decile rank cut max(1, n*d//10) reports the cumulative
    share numerator (cum_cents at the cut; the denominator is the
    d=10 row). One per-user fold, one distributed sort with
    block-offset cumulative sums, O(#blocks) driver state. Emits
    (decile, rank, cum_cents)."""
    import ray

    from osmray.tableops import sorted_fold_sums

    ev = _read(sf_dir, "events", ["user_id", "value"])

    def partials(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = np.floor(batch["value"].to_numpy(
            zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        u, inv = np.unique(uid, return_inverse=True)
        return pa.table({"user_id": pa.array(u),
                         "cents": pa.array(np.bincount(
                             inv, weights=cents).astype(np.int64))})

    per_user = sorted_fold_sums(
        ev.map_batches(partials, batch_format="pyarrow"),
        "user_id", ["cents"])
    sds = per_user.sort(["cents", "user_id"]).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"c0": pa.array([], pa.int64()),
                             "u0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        c = batch["cents"].to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"c0": pa.array([int(c[0])]),
                         "u0": pa.array([int(u[0])]),
                         "n": pa.array([len(c)]),
                         "s": pa.array([int(c.sum())])})

    st = (sds.map_batches(block_stats, batch_format="pyarrow",
                          batch_size=None)
          .to_pandas().sort_values(["c0", "u0"]))
    n_total = int(st["n"].sum())
    offs_n = np.concatenate(([0], np.cumsum(st["n"].to_numpy())[:-1]))
    offs_s = np.concatenate(([0], np.cumsum(st["s"].to_numpy())[:-1]))
    cuts = {d: max(1, n_total * d // 10) for d in range(1, 11)}
    ref = ray.put(({(int(a), int(b)): (int(x), int(y)) for a, b, x, y
                    in zip(st["c0"], st["u0"], offs_n, offs_s)}, cuts))

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "cum_cents": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        offs_d, cuts_d = ray.get(ref)
        c = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        on, os_ = offs_d[(int(c[0]), int(u[0]))]
        cum = np.cumsum(c) + os_
        lo, hi = on + 1, on + len(c)
        out_d, out_r, out_c = [], [], []
        for d, r in cuts_d.items():
            if lo <= r <= hi:
                out_d.append(d)
                out_r.append(r)
                out_c.append(int(cum[r - on - 1]))
        if not out_d:
            return empty
        return pa.table({"decile": pa.array(out_d, pa.int64()),
                         "rank": pa.array(out_r, pa.int64()),
                         "cum_cents": pa.array(out_c, pa.int64())})

    return sds.map_batches(emit, batch_format="pyarrow",
                           batch_size=None)


Q_LORENZ_SQL = """
WITH pu AS (SELECT user_id,
              sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY user_id),
r AS (SELECT cents,
        ROW_NUMBER() OVER (ORDER BY cents, user_id) AS rn,
        SUM(cents) OVER (ORDER BY cents, user_id
                         ROWS UNBOUNDED PRECEDING) AS cum,
        count(*) OVER () AS n
      FROM pu)
SELECT CAST(d.d AS BIGINT) AS decile,
       CAST(r.rn AS BIGINT) AS rank,
       CAST(r.cum AS BIGINT) AS cum_cents
FROM (SELECT unnest(generate_series(1, 10)) AS d) d
JOIN r ON r.rn = greatest(1, r.n * d.d // 10)
"""


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth — distinct words seen after the
    first k docs, k at the powers-of-two checkpoints: per word ONE
    min fold finds its first doc (first_doc = min doc_id containing
    it), then |vocab at k| = #words with first_doc <= k — a second
    bounded fold over the checkpoint bins (no sequential scan over
    the corpus order anywhere). Emits (k, vocab)."""
    from osmray.tableops import sorted_fold, sorted_fold_sums

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def word_first(batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str

        ids = batch["doc_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        pairs = {}
        for did, text in zip(ids.tolist(), batch["text"].to_pylist()):
            for w in text.split(" "):
                if w not in pairs or did < pairs[w]:
                    pairs[w] = did
        ws = sorted(pairs)
        return pa.table({"w": pa.array(ws),
                         "cnt": pa.array([pairs[w] for w in ws],
                                         pa.int64()),
                         "k": pa.array(hash_str(ws, 11))})

    # reuse the hashed-count shuffle shape with a MIN fold in-group
    def verify_min(g: pa.Table) -> pa.Table:
        ws = np.asarray(g["w"].to_pylist())
        fd = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(ws, return_inverse=True)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, fd)
        return pa.table({"w": pa.array(u), "first_doc": pa.array(mn)})

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.set_column(
            batch.schema.get_field_index("k"), "k",
            pa.array(np.abs(k) % 1024))

    firsts = (docs.map_batches(word_first, batch_format="pyarrow")
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("k").map_groups(verify_min,
                                       batch_format="pyarrow"))

    def bins(batch: pa.Table) -> pa.Table:
        fd = batch["first_doc"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = np.floor(np.log2(np.maximum(fd, 1))).astype(np.int64)
        u, inv = np.unique(b, return_inverse=True)
        return pa.table({"b": pa.array(u),
                         "n": pa.array(np.bincount(inv).astype(np.int64))})

    binned = sorted_fold_sums(
        firsts.map_batches(bins, batch_format="pyarrow"), "b", ["n"])
    df = binned.to_pandas().sort_values("b")
    bs = df["b"].to_numpy().astype(np.int64)
    ns = df["n"].to_numpy().astype(np.int64)
    ks, vocab = [], []
    for b in range(int(bs.max()) + 1):
        ks.append(2 ** (b + 1) - 1)
        vocab.append(int(ns[bs <= b].sum()))
    import ray.data

    return ray.data.from_arrow(pa.table({
        "k": pa.array(ks, pa.int64()),
        "vocab": pa.array(vocab, pa.int64())}))


Q_VOCAB_GROWTH_SQL = """
WITH wf AS (SELECT w, min(doc_id) AS first_doc FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents) GROUP BY w),
mb AS (SELECT CAST(max(floor(log2(CAST(greatest(first_doc, 1)
        AS DOUBLE)))) AS BIGINT) AS bmax FROM wf),
ck AS (SELECT unnest(generate_series(0, (SELECT bmax FROM mb))) AS b)
SELECT CAST(power(2, b + 1) - 1 AS BIGINT) AS k,
       CAST((SELECT count(*) FROM wf
             WHERE floor(log2(CAST(greatest(first_doc, 1) AS DOUBLE)))
                   <= ck.b) AS BIGINT) AS vocab
FROM ck
"""


def q_first_touch(sf_dir: str):
    """First-touch attribution — the companion rule to q_attribution
    (linear): each 'purchase' credits ONLY the EARLIEST non-purchase
    touch in its preceding hour (ties -> smaller event_id). Same
    per-user two-pointer scan, but the window reduces to one argmin
    instead of a histogram. Emits (event_type, n_first_touch)."""
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def per_key(g: pa.Table) -> pa.Table:
        tv = g["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((ii, tv))
        tv, ii, et = tv[order], ii[order], et[order]
        conv = np.flatnonzero(et == "purchase")
        lo_all = np.searchsorted(tv, tv[conv] - 3_600_000_000,
                                 side="left")
        hi_all = np.searchsorted(tv, tv[conv], side="left")
        from collections import Counter

        cr: Counter = Counter()
        for lo, hi in zip(lo_all.tolist(), hi_all.tolist()):
            w = np.flatnonzero(et[lo:hi] != "purchase")
            if len(w) == 0:
                continue
            # earliest by (ts, id): the sort order IS (ts, id), so
            # the first non-purchase index wins
            cr[et[lo + w[0]]] += 1
        if not cr:
            return pa.table({"t": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ks = sorted(cr)
        return pa.table({"t": pa.array(ks),
                         "n": pa.array([cr[t] for t in ks], pa.int64())})

    def bucket(batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str

        return pa.table({
            "k": batch["t"], "n": batch["n"],
            "bk": pa.array(np.abs(hash_str(
                batch["t"].to_pylist(), 5)) % 8)})

    folded = (ds.groupby("user_id")
              .map_groups(per_key, batch_format="pyarrow")
              .map_batches(bucket, batch_format="pyarrow")
              .groupby("bk").map_groups(
                  lambda g: _fold_str_sums(g.drop_columns(["bk"]),
                                           ["n"]),
                  batch_format="pyarrow"))
    return folded.map_batches(
        lambda t: t.rename_columns(["event_type", "n_first_touch"]),
        batch_format="pyarrow")


Q_FIRST_TOUCH_SQL = """
WITH c AS (SELECT user_id, epoch_us(ts) AS ct, event_id
           FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id, epoch_us(ts) AS tt, event_id, event_type
      FROM events WHERE event_type <> 'purchase'),
j AS (SELECT c.event_id AS conv, t.event_type,
        ROW_NUMBER() OVER (PARTITION BY c.event_id
          ORDER BY t.tt, t.event_id) AS rn
      FROM c JOIN t ON t.user_id = c.user_id
       AND t.tt >= c.ct - 3600000000 AND t.tt < c.ct)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_first_touch
FROM j WHERE rn = 1 GROUP BY event_type
"""


def q_canonical_docs(sf_dir: str):
    """Quality-canonical dedup selection — 'keep the BEST duplicate,
    not the first': exact-duplicate groups (full-text fingerprint)
    each keep the doc with the highest quality score (the
    q_quality_clf linear scorer), ties -> smaller doc_id. One pass
    computes (fingerprint, score) per doc; a packed (score, doc_id)
    lexicographic max fold picks winners (no per-group map_groups).
    Emits per group (fp_bucket-free) the winner:
    (doc_id, n_dups, score). Scale note: the fold key is the 64-bit
    text fingerprint, high-cardinality by construction."""
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def scored(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        fp = hash_str(texts, 13)
        toks = [t.split(" ") for t in texts]
        flat = [w for ws in toks for w in ws]
        sc = np.zeros(len(ids), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            wt = (_char_fold_hash(u) % 256) * 2654435761 % (1 << 32) \
                % 2001 - 1000
            for k, ws in enumerate(toks):
                sc[k] = int(wt[np.searchsorted(u, np.asarray(ws))].sum())
        # pack (score, doc_id) so one int64 MAX picks (max score,
        # then MIN id): key = score * 2^32 + (2^32 - 1 - doc_id)
        if int(np.abs(sc).max(initial=0)) >= (1 << 20):
            raise ValueError(
                "canonical_docs: quality score exceeds the 20-bit "
                "packing budget — (score,id) lexicographic max would "
                "be wrong; rescale the score or widen the packing")
        packed = (sc + (1 << 20)) * (1 << 32) + ((1 << 32) - 1 - ids)
        u2, inv = np.unique(fp, return_inverse=True)
        mx = np.full(len(u2), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, packed)
        return pa.table({"fp": pa.array(u2),
                         "win": pa.array(mx),
                         "n": pa.array(np.bincount(inv).astype(np.int64))})

    folded = sorted_fold(
        docs.map_batches(scored, batch_format="pyarrow"),
        "fp", ["win", "n"], ["max", "sum"])

    def emit(batch: pa.Table) -> pa.Table:
        w = batch["win"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = (1 << 32) - 1 - (w % (1 << 32))
        sc = w // (1 << 32) - (1 << 20)
        return pa.table({"doc_id": pa.array(doc),
                         "n_dups": batch["n"],
                         "score": pa.array(sc)})

    return folded.map_batches(emit, batch_format="pyarrow")


Q_CANONICAL_DOCS_SQL = f"""
WITH toks AS (SELECT doc_id, text,
                unnest(string_split(text, ' ')) AS w
              FROM documents),
h AS (SELECT doc_id, text,
        {_CF_HASH_LAMBDA.format(w='w')} % 256 AS b FROM toks),
s AS (SELECT doc_id, max(text) AS text,
        sum(b * 2654435761 % 4294967296 % 2001 - 1000) AS score
      FROM h GROUP BY doc_id),
w AS (SELECT text, doc_id, score,
        ROW_NUMBER() OVER (PARTITION BY text
          ORDER BY score DESC, doc_id ASC) AS rn,
        count(*) OVER (PARTITION BY text) AS n
      FROM s)
SELECT doc_id, CAST(n AS BIGINT) AS n_dups,
       CAST(score AS BIGINT) AS score
FROM w WHERE rn = 1
"""


def q_change_pyramid(sf_dir: str):
    """Incremental re-render workload per zoom — after a change set
    touches base tiles, HOW MANY tiles at each pyramid level contain at
    least one change (the bill for updating a tile pyramid, the
    operation an incremental tiling service runs on every diff):
    changed base cells = occupied part cells passing a hash64 mask
    (1/8), each emits its 9 ancestors (z = 8 down to 0, one shift
    per level), one packed (level, parent) dedup + per-level count.
    Emits (z, n_tiles). The twin replays hash64 via hash64_ctes and
    counts DISTINCT parents per level."""
    from ray.data.aggregate import Count

    from osmray.stages import hash64
    from osmray.tableops import sorted_fold_sums

    parts = _read(sf_dir, "part", ["p_partkey"])

    def changed_cells(batch: pa.Table) -> pa.Table:
        k = batch["p_partkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = (k * 2654435761) % (1 << 32)
        cell = (h % 256) * 256 + (h // 256) % 256
        cell = np.unique(cell)
        keep = (hash64(cell, 31) & 7) == 0
        return pa.table({"cell": pa.array(cell[keep])})

    cells = (parts.map_batches(changed_cells, batch_format="pyarrow")
             .groupby("cell").aggregate(Count(alias_name="_n"))
             .select_columns(["cell"]))

    def ancestors(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c // 256, c % 256
        pks = []
        for z in range(9):
            sh = 8 - z
            pk = (np.int64(z) << 32) | ((cx >> sh) << 16) | (cy >> sh)
            pks.append(np.unique(pk))
        return pa.table({"pk": pa.array(np.concatenate(pks))})

    anc = (cells.map_batches(ancestors, batch_format="pyarrow")
           .groupby("pk").aggregate(Count(alias_name="_n"))
           .select_columns(["pk"]))

    def level_partials(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = pk >> 32
        u, inv = np.unique(z, return_inverse=True)
        return pa.table({"z": pa.array(u),
                         "n": pa.array(np.bincount(inv).astype(np.int64))})

    folded = sorted_fold_sums(
        anc.map_batches(level_partials, batch_format="pyarrow"),
        "z", ["n"])
    return folded.map_batches(
        lambda t: t.rename_columns(["z", "n_tiles"]),
        batch_format="pyarrow")


Q_CHANGE_PYRAMID_SQL = f"""
WITH occ AS (SELECT DISTINCT
    ((p_partkey * 2654435761) % 4294967296 % 256) * 256
    + ((p_partkey * 2654435761) % 4294967296 // 256 % 256) AS cell
  FROM part),
{hash64_ctes('cp', 'occ', 'cell', 'cell', 31)},
ch AS (SELECT cell FROM cp5 WHERE (h & 7) = 0),
lv AS (SELECT unnest(generate_series(0, 8)) AS z),
par AS (SELECT lv.z,
          (cell // 256) // power(2, 8 - lv.z)::BIGINT AS px,
          (cell % 256) // power(2, 8 - lv.z)::BIGINT AS py
        FROM ch CROSS JOIN lv)
SELECT CAST(z AS BIGINT) AS z,
       CAST(count(DISTINCT px * 65536 + py) AS BIGINT) AS n_tiles
FROM par GROUP BY z
"""


def q_merkle(sf_dir: str):
    """Content-addressed partition checksums + root — the
    dataset-integrity primitive (localize WHICH partition changed
    between versions without re-reading the data): every lineitem
    row hashes (hash64 of its pid, masked to 40 bits so per-partition
    integer sums cannot overflow), partitions = pid % 64, level-0 =
    per-partition (n_rows, csum) via one bounded fold, level-1 = the
    root over partition digests. Emits 64 partition rows + 1 root row
    as (level, part, n_rows, csum); hash64_ctes twin."""
    from osmray.stages import hash64
    from osmray.tableops import sorted_fold_sums

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"])

    def partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        pid = ok * 10 + ln
        h = hash64(pid, 41) & ((1 << 40) - 1)
        part = pid % 64
        u, inv = np.unique(part, return_inverse=True)
        return pa.table({
            "part": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "csum": pa.array(np.bincount(inv, weights=h).astype(np.int64))})

    lvl0 = sorted_fold_sums(
        ds.map_batches(partials, batch_format="pyarrow"),
        "part", ["n", "csum"]).materialize()

    def as_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "level": pa.array(np.zeros(len(batch), np.int64)),
            "part": batch["part"],
            "n_rows": batch["n"], "csum": batch["csum"]})

    # the root folds 64 tiny digests whose sum exceeds 2^53 — the
    # generic fold's float-weighted bincount would round it, so the
    # O(levels) root is EXACT python-int driver math over the
    # materialized 64-row digest table
    import ray.data

    l0df = lvl0.to_pandas()
    root = ray.data.from_arrow(pa.table({
        "level": pa.array([1], pa.int64()),
        "part": pa.array([-1], pa.int64()),
        "n_rows": pa.array([int(sum(int(x) for x in l0df["n"]))],
                           pa.int64()),
        "csum": pa.array([int(sum(int(x) for x in l0df["csum"]))],
                         pa.int64())}))
    return lvl0.map_batches(as_rows, batch_format="pyarrow").union(root)


Q_MERKLE_SQL = f"""
WITH ids AS (SELECT l_orderkey * 10 + l_linenumber AS pid
             FROM lineitem),
{hash64_ctes('mk', 'ids', 'pid', 'pid', 41)},
h40 AS (SELECT pid, h & {(1 << 40) - 1} AS h40 FROM mk5),
l0 AS (SELECT pid % 64 AS part, count(*) AS n, sum(h40) AS csum
       FROM h40 GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS level, CAST(part AS BIGINT) AS part,
       CAST(n AS BIGINT) AS n_rows, CAST(csum AS BIGINT) AS csum
FROM l0
UNION ALL
SELECT 1, -1, CAST(sum(n) AS BIGINT), CAST(sum(csum) AS BIGINT)
FROM l0
"""


def q_time_to_convert(sf_dir: str):
    """Time-to-convert survival quantiles — the onboarding-funnel
    latency profile: per user, delta = first 'purchase' AFTER the
    first 'signup' minus that signup (converted users only; one
    min-fold pass each), then the exact q25/q50/q75/q90 of the
    per-user deltas via the distributed order-stats sort. Emits
    (p, rank, delta_us) + one (p=0, rank=n_converted,
    delta_us=n_signup) cardinality row so conversion RATE is also
    checked."""
    import ray.data

    from osmray.tableops import exact_order_stats, sorted_fold

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])

    def partials(batch: pa.Table) -> pa.Table:
        tv = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist())
        BIG = np.int64(1) << 62
        u, inv = np.unique(uid, return_inverse=True)
        s = np.full(len(u), BIG, np.int64)
        sel = et == "signup"
        np.minimum.at(s, inv[sel], tv[sel])
        return pa.table({"user_id": pa.array(u), "s": pa.array(s)})

    signup = sorted_fold(
        ev.map_batches(partials, batch_format="pyarrow"),
        "user_id", ["s"], ["min"]).materialize()
    if signup.count() > 5_000_000:
        raise ValueError("time_to_convert broadcast signup map caps at "
                         "5e6 users; route the attach through "
                         "joins.bucketed_join beyond it")
    smap = {int(r["user_id"]): int(r["s"])
            for r in signup.take_all()}
    BIG = 1 << 62
    n_signup = sum(1 for v in smap.values() if v < BIG)
    import ray

    sref = ray.put(smap)

    def conv_partials(batch: pa.Table) -> pa.Table:
        m = ray.get(sref)
        tv = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist())
        sel = et == "purchase"
        uid, tv = uid[sel], tv[sel]
        su = np.asarray([m.get(int(x), BIG) for x in uid], np.int64)
        keep = tv >= su
        u, inv = np.unique(uid[keep], return_inverse=True)
        p = np.full(len(u), np.int64(BIG), np.int64)
        np.minimum.at(p, inv, tv[keep])
        return pa.table({"user_id": pa.array(u), "p": pa.array(p)})

    conv = sorted_fold(
        ev.map_batches(conv_partials, batch_format="pyarrow"),
        "user_id", ["p"], ["min"]).materialize()

    def deltas(batch: pa.Table) -> pa.Table:
        m = ray.get(sref)
        uid = batch["user_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        p = batch["p"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = p - np.asarray([m[int(x)] for x in uid], np.int64)
        return pa.table({"d": pa.array(d)})

    dds = conv.map_batches(deltas, batch_format="pyarrow").materialize()
    n_conv = dds.count()
    qs = exact_order_stats(dds, "d", [25, 50, 75, 90]).to_pandas()
    card = ray.data.from_arrow(pa.table({
        "p": pa.array([0], pa.int64()),
        "rank": pa.array([n_conv], pa.int64()),
        "value": pa.array([n_signup], pa.int64())}))
    return ray.data.from_pandas(qs).union(card).map_batches(
        lambda t: t.rename_columns(["p", "rank", "delta_us"]),
        batch_format="pyarrow")


Q_TIME_TO_CONVERT_SQL = """
WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
pu AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p
       FROM events e JOIN su ON su.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= su.s
       GROUP BY e.user_id),
d AS (SELECT pu.p - su.s AS delta FROM pu JOIN su USING (user_id)),
r AS (SELECT delta, ROW_NUMBER() OVER (ORDER BY delta) AS rn,
             count(*) OVER () AS n FROM d)
SELECT CAST(q.p AS BIGINT) AS p, CAST(r.rn AS BIGINT) AS rank,
       CAST(r.delta AS BIGINT) AS delta_us
FROM (VALUES (25), (50), (75), (90)) q(p)
JOIN r ON r.rn = greatest(1, r.n * q.p // 100)
UNION ALL
SELECT 0, (SELECT count(*) FROM d),
       (SELECT count(*) FROM su)
"""


def registry():
    """name -> (ray_fn, sql_or_None)"""
    return {
        "q_tile_assign": (q_tile_assign, Q_TILE_ASSIGN_SQL),
        "q_cell_agg": (q_cell_agg, Q_CELL_AGG_SQL),
        "q_cell_agg_salted": (q_cell_agg_salted, Q_CELL_AGG_SQL),
        "q_edge_filter": (q_edge_filter, Q_EDGE_FILTER_SQL),
        "q_knn": (q_knn, Q_KNN_SQL),
        "q_range_join": (q_range_join, Q_RANGE_JOIN_SQL),
        "q_negative_pool": (q_negative_pool, Q_NEGATIVE_POOL_SQL),
        "q_dedup_exact": (q_dedup_exact, Q_DEDUP_EXACT_SQL),
        "q_doc_stats": (q_doc_stats, Q_DOC_STATS_SQL),
        "q_lang_count": (q_lang_count, Q_LANG_COUNT_SQL),
        "q_top_docs": (q_top_docs, Q_TOP_DOCS_SQL),
        "q_events_window": (q_events_window, Q_EVENTS_WINDOW_SQL),
        "q_events_hop": (q_events_hop, Q_EVENTS_HOP_SQL),
        "q_hll": (q_hll, Q_HLL_SQL),
        "q_group_median": (q_group_median, Q_GROUP_MEDIAN_SQL),
        "q_stratified_sample": (q_stratified_sample, Q_STRATIFIED_SAMPLE_SQL),
        "q_inverted_index": (q_inverted_index, Q_INVERTED_INDEX_SQL),
        "q_sample_hash": (q_sample_hash, Q_SAMPLE_HASH_SQL),
        "q_distinct_count": (q_distinct_count, Q_DISTINCT_COUNT_SQL),
        "q_split_counts": (q_split_counts, Q_SPLIT_COUNTS_SQL),
        "q_union_distinct": (q_union_distinct, Q_UNION_DISTINCT_SQL),
        "q_hash_join": (q_hash_join, Q_HASH_JOIN_SQL),
        "q_ann_topk": (q_ann_topk, Q_ANN_TOPK_SQL),
        "q_way_resolve": (q_way_resolve, Q_WAY_RESOLVE_SQL),
        "q_large_join": (q_large_join, Q_LARGE_JOIN_SQL),
        "q_semi_join_large": (q_semi_join_large, Q_SEMI_JOIN_LARGE_SQL),
        "q_bucketed_join": (q_bucketed_join, Q_LARGE_JOIN_SQL),
        "q_sessionize": (q_sessionize, Q_SESSIONIZE_SQL),
        "q_running_sum": (q_running_sum, Q_RUNNING_SUM_SQL),
        "q_topk_per_group": (q_topk_per_group, Q_TOPK_PER_GROUP_SQL),
        "q_asof_join": (q_asof_join, Q_ASOF_JOIN_SQL),
        "q_connected_components": (q_connected_components, Q_CONNECTED_COMPONENTS_SQL),
        "q_pagerank": (q_pagerank, Q_PAGERANK_SQL),
        "q_jpeg_roundtrip": (q_jpeg_roundtrip, Q_JPEG_ROUNDTRIP_SQL),
        "q_pip_grid": (q_pip_grid, Q_PIP_GRID_SQL),
        "q_raster_parity": (q_raster_parity, Q_RASTER_PARITY_SQL),
        "q_mosaic_parity": (q_mosaic_parity, Q_MOSAIC_PARITY_SQL),
        "q_minhash_lsh": (q_minhash_lsh, Q_MINHASH_LSH_SQL),
        "q_redact": (q_redact, Q_REDACT_SQL),
        "q_decontaminate": (q_decontaminate, Q_DECONTAMINATE_SQL),
        "q_simhash": (q_simhash, Q_SIMHASH_SQL),
        "q_simhash_pairs": (q_simhash_pairs, Q_SIMHASH_PAIRS_SQL),
        "q_lang_id": (q_lang_id, Q_LANG_ID_SQL),
        "q_fingerprint": (q_fingerprint, Q_FINGERPRINT_SQL),
        "q_embedding_dups": (q_embedding_dups, Q_EMBEDDING_DUPS_SQL),
        "q_lsh_ann": (q_lsh_ann, Q_LSH_ANN_SQL),
        "q_ivf_ann": (q_ivf_ann, Q_IVF_ANN_SQL),
        "q_image_label_job": (q_image_label_job, Q_IMAGE_LABEL_JOB_SQL),
        "q_expand_crops": (q_expand_crops, Q_EXPAND_CROPS_SQL),
        "q_roofshapes": (q_roofshapes, Q_ROOFSHAPES_SQL),
        "q_buildings_label_job": (q_buildings_label_job, Q_BUILDINGS_LABEL_JOB_SQL),
        "q_pip": (q_pip, Q_PIP_SQL),
        "q_knn_cells": (q_knn_cells, Q_KNN_CELLS_SQL),
        "q_phash_dedup": (q_phash_dedup, Q_PHASH_DEDUP_SQL),
        "q_phash_near_dup": (q_phash_near_dup, Q_PHASH_NEAR_DUP_SQL),
        "q_minimap": (q_minimap, Q_MINIMAP_SQL),
        "q_image_resize": (q_image_resize, Q_IMAGE_RESIZE_SQL),
        "q_image_augment": (q_image_augment, Q_IMAGE_AUGMENT_SQL),
        "q_audio_features": (q_audio_features, Q_AUDIO_FEATURES_SQL),
        "q_frame_sample": (q_frame_sample, Q_FRAME_SAMPLE_SQL),
        "q_bloom_semi_join": (q_bloom_semi_join, Q_BLOOM_SEMI_JOIN_SQL),
        "q_cell_compact": (q_cell_compact, Q_CELL_COMPACT_SQL),
        "q_bm25": (q_bm25, Q_BM25_SQL),
        "q_lag_lead": (q_lag_lead, Q_LAG_LEAD_SQL),
        "q_pivot": (q_pivot, Q_PIVOT_SQL),
        "q_heavy_hitters": (q_heavy_hitters, Q_HEAVY_HITTERS_SQL),
        "q_rollup_cells": (q_rollup_cells, Q_ROLLUP_CELLS_SQL),
        "q_regex_extract": (q_regex_extract, Q_REGEX_EXTRACT_SQL),
        "q_triangles": (q_triangles, Q_TRIANGLES_SQL),
        "q_bbox_join": (q_bbox_join, Q_BBOX_JOIN_SQL),
        "q_polygon_stats": (q_polygon_stats, Q_POLYGON_STATS_SQL),
        "q_clip": (q_clip, Q_CLIP_SQL),
        "q_pps_sample": (q_pps_sample, Q_PPS_SAMPLE_SQL),
        "q_interval_islands": (q_interval_islands, Q_INTERVAL_ISLANDS_SQL),
        "q_grouped_moments": (q_grouped_moments, Q_GROUPED_MOMENTS_SQL),
        "q_skyline": (q_skyline, Q_SKYLINE_SQL),
        "q_order_stats": (q_order_stats, Q_ORDER_STATS_SQL),
        "q_left_join": (q_left_join, Q_LEFT_JOIN_SQL),
        "q_anti_join_large": (q_anti_join_large, Q_ANTI_JOIN_LARGE_SQL),
        "q_kmv": (q_kmv, Q_KMV_SQL),
        "q_count_min": (q_count_min, Q_COUNT_MIN_SQL),
        "q_seg_join": (q_seg_join, Q_SEG_JOIN_SQL),
        "q_pip_join": (q_pip_join, Q_PIP_JOIN_SQL),
        "q_morphology": (q_morphology, Q_MORPHOLOGY_SQL),
        "q_simplify": (q_simplify, Q_SIMPLIFY_SQL),
        "q_zonal_stats": (q_zonal_stats, Q_ZONAL_STATS_SQL),
        "q_distance_join": (q_distance_join, Q_DISTANCE_JOIN_SQL),
        "q_knn_join": (q_knn_join, Q_KNN_JOIN_SQL),
        "q_ntile": (q_ntile, Q_NTILE_SQL),
        "q_range_window": (q_range_window, Q_RANGE_WINDOW_SQL),
        "q_funnel": (q_funnel, Q_FUNNEL_SQL),
        "q_resample": (q_resample, Q_RESAMPLE_SQL),
        "q_set_ops": (q_set_ops, Q_SET_OPS_SQL),
        "q_cube": (q_cube, Q_CUBE_SQL),
        "q_bfs": (q_bfs, Q_BFS_SQL),
        "q_convex_hull": (q_convex_hull, Q_CONVEX_HULL_SQL),
        "q_hull_diameter": (q_hull_diameter, Q_HULL_DIAMETER_SQL),
        "q_emd_hist": (q_emd_hist, Q_EMD_HIST_SQL),
        "q_edit_join": (q_edit_join, Q_EDIT_JOIN_SQL),
        "q_jaccard_join": (q_jaccard_join, Q_JACCARD_JOIN_SQL),
        "q_focal_stats": (q_focal_stats, Q_FOCAL_STATS_SQL),
        "q_interval_join": (q_interval_join, Q_INTERVAL_JOIN_SQL),
        "q_group_regression": (q_group_regression, Q_GROUP_REGRESSION_SQL),
        "q_mode": (q_mode, Q_MODE_SQL),
        "q_item_pairs": (q_item_pairs, Q_ITEM_PAIRS_SQL),
        "q_trajectory": (q_trajectory, Q_TRAJECTORY_SQL),
        "q_full_join": (q_full_join, Q_FULL_JOIN_SQL),
        "q_json_extract": (q_json_extract, Q_JSON_EXTRACT_SQL),
        "q_unpivot": (q_unpivot, Q_UNPIVOT_SQL),
        "q_dedup_clusters": (q_dedup_clusters, Q_DEDUP_CLUSTERS_SQL),
        "q_idw": (q_idw, Q_IDW_SQL),
        "q_cum_users": (q_cum_users, Q_CUM_USERS_SQL),
        "q_retention": (q_retention, Q_RETENTION_SQL),
        "q_string_agg": (q_string_agg, Q_STRING_AGG_SQL),
        "q_bearing_bins": (q_bearing_bins, Q_BEARING_BINS_SQL),
        "q_percentile_cont": (q_percentile_cont, Q_PERCENTILE_CONT_SQL),
        "q_locf": (q_locf, Q_LOCF_SQL),
        "q_weighted_median": (q_weighted_median, Q_WEIGHTED_MEDIAN_SQL),
        "q_sssp": (q_sssp, Q_SSSP_SQL),
        "q_dbscan": (q_dbscan, Q_DBSCAN_SQL),
        "q_snap_roads": (q_snap_roads, Q_SNAP_ROADS_SQL),
        "q_zorder_parts": (q_zorder_parts, Q_ZORDER_PARTS_SQL),
        "q_upsert_latest": (q_upsert_latest, Q_UPSERT_LATEST_SQL),
        "q_tfidf": (q_tfidf, Q_TFIDF_SQL),
        "q_seq_pattern": (q_seq_pattern, Q_SEQ_PATTERN_SQL),
        "q_blob_extract": (q_blob_extract, Q_BLOB_EXTRACT_SQL),
        "q_morans": (q_morans, Q_MORANS_SQL),
        "q_patch_grid": (q_patch_grid, Q_PATCH_GRID_SQL),
        "q_gini": (q_gini, Q_GINI_SQL),
        "q_kmv_intersect": (q_kmv_intersect, _kmv_intersect_sql()),
        "q_max_concurrency": (q_max_concurrency, Q_MAX_CONCURRENCY_SQL),
        "q_box_iou_join": (q_box_iou_join, Q_BOX_IOU_JOIN_SQL),
        "q_box_nms": (q_box_nms, _box_nms_sql()),
        "q_box_union_area": (q_box_union_area, Q_BOX_UNION_AREA_SQL),
        "q_hrw_parts": (q_hrw_parts, Q_HRW_PARTS_SQL),
        "q_dict_match": (q_dict_match, _dict_match_sql()),
        "q_scd2": (q_scd2, Q_SCD2_SQL),
        "q_roaring_layout": (q_roaring_layout, Q_ROARING_LAYOUT_SQL),
        "q_quadkey": (q_quadkey, _quadkey_sql()),
        "q_late_events": (q_late_events, Q_LATE_EVENTS_SQL),
        "q_dod_stats": (q_dod_stats, Q_DOD_STATS_SQL),
        "q_mad": (q_mad, Q_MAD_SQL),
        "q_kcore": (q_kcore, _kcore_sql()),
        "q_geohash": (q_geohash, _geohash_sql()),
        "q_hausdorff": (q_hausdorff, Q_HAUSDORFF_SQL),
        "q_hist_eq": (q_hist_eq, Q_HIST_EQ_SQL),
        "q_rle_mask": (q_rle_mask, Q_RLE_MASK_SQL),
        "q_distance_transform": (q_distance_transform,
                                 Q_DISTANCE_TRANSFORM_SQL),
        "q_contours": (q_contours, Q_CONTOURS_SQL),
        "q_contour_rings": (q_contour_rings, _contour_rings_sql()),
        "q_largest_square": (q_largest_square, Q_LARGEST_SQUARE_SQL),
        "q_otsu": (q_otsu, Q_OTSU_SQL),
        "q_grid_path": (q_grid_path, Q_GRID_PATH_SQL),
        "q_integral_rects": (q_integral_rects, _integral_rects_sql()),
        "q_hex_agg": (q_hex_agg, Q_HEX_AGG_SQL),
        "q_hilbert_parts": (q_hilbert_parts, _hilbert_parts_sql()),
        "q_frechet": (q_frechet, _frechet_sql()),
        "q_los": (q_los, Q_LOS_SQL),
        "q_tile_pyramid": (q_tile_pyramid, Q_TILE_PYRAMID_SQL),
        "q_quadtree": (q_quadtree, Q_QUADTREE_SQL),
        "q_hough": (q_hough, _hough_sql()),
        "q_ransac": (q_ransac, Q_RANSAC_SQL),
        "q_template_match": (q_template_match, _template_match_sql()),
        "q_mst": (q_mst, Q_MST_SQL),
        "q_seam": (q_seam, _seam_sql()),
        "q_viterbi": (q_viterbi, _viterbi_sql()),
        "q_moving_median": (q_moving_median, Q_MOVING_MEDIAN_SQL),
        "q_matmul": (q_matmul, Q_MATMUL_SQL),
        "q_glcm": (q_glcm, Q_GLCM_SQL),
        "q_corners": (q_corners, Q_CORNERS_SQL),
        "q_warp": (q_warp, Q_WARP_SQL),
        "q_onion": (q_onion, _onion_sql()),
        "q_critical_path": (q_critical_path, Q_CRITICAL_PATH_SQL),
        "q_skew_join": (q_skew_join, Q_SKEW_JOIN_SQL),
        "q_max_subarray": (q_max_subarray, Q_MAX_SUBARRAY_SQL),
        "q_routes": (q_routes, Q_ROUTES_SQL),
        "q_ewma": (q_ewma, Q_EWMA_SQL),
        "q_binpack": (q_binpack, Q_BINPACK_SQL),
        "q_huffman": (q_huffman, Q_HUFFMAN_SQL),
        "q_knapsack": (q_knapsack, Q_KNAPSACK_SQL),
        "q_levenshtein": (q_levenshtein, Q_LEVENSHTEIN_SQL),
        "q_stable_match": (q_stable_match, Q_STABLE_MATCH_SQL),
        "q_range_parts": (q_range_parts, Q_RANGE_PARTS_SQL),
        "q_lis": (q_lis, Q_LIS_SQL),
        "q_rainwater": (q_rainwater, Q_RAINWATER_SQL),
        "q_markov": (q_markov, Q_MARKOV_SQL),
        "q_autocorr": (q_autocorr, Q_AUTOCORR_SQL),
        "q_terrain": (q_terrain, Q_TERRAIN_SQL),
        "q_d8_flow": (q_d8_flow, Q_D8_FLOW_SQL),
        "q_watershed": (q_watershed, Q_WATERSHED_SQL),
        "q_flow_accum": (q_flow_accum, Q_FLOW_ACCUM_SQL),
        "q_bilinear_zoom": (q_bilinear_zoom, Q_BILINEAR_ZOOM_SQL),
        "q_tri": (q_tri, Q_TRI_SQL),
        "q_hillshade": (q_hillshade, Q_HILLSHADE_SQL),
        "q_substring_dups": (q_substring_dups, Q_SUBSTRING_DUPS_SQL),
        "q_morph_grid": (q_morph_grid, Q_MORPH_GRID_SQL),
        "q_basin_boundary": (q_basin_boundary, Q_BASIN_BOUNDARY_SQL),
        "q_grid_pool": (q_grid_pool, Q_GRID_POOL_SQL),
        "q_motion_flow": (q_motion_flow, Q_MOTION_FLOW_SQL),
        "q_image_moments": (q_image_moments, Q_IMAGE_MOMENTS_SQL),
        "q_sobel_nms": (q_sobel_nms, Q_SOBEL_NMS_SQL),
        "q_collocations": (q_collocations, Q_COLLOCATIONS_SQL),
        "q_oov_rate": (q_oov_rate, Q_OOV_RATE_SQL),
        "q_kcenter": (q_kcenter, _kcenter_sql()),
        "q_lbp": (q_lbp, Q_LBP_SQL),
        "q_laplacian_pyramid": (q_laplacian_pyramid,
                                Q_LAPLACIAN_PYRAMID_SQL),
        "q_random_walks": (q_random_walks, _random_walks_sql()),
        "q_ngram_novelty": (q_ngram_novelty, Q_NGRAM_NOVELTY_SQL),
        "q_graph_voronoi": (q_graph_voronoi, Q_GRAPH_VORONOI_SQL),
        "q_semdedup": (q_semdedup, _semdedup_sql()),
        "q_seq_packing": (q_seq_packing, Q_SEQ_PACKING_SQL),
        "q_embedding_stats": (q_embedding_stats, Q_EMBEDDING_STATS_SQL),
        "q_containment": (q_containment, Q_CONTAINMENT_SQL),
        "q_mixture": (q_mixture, _mixture_sql()),
        "q_interarrival": (q_interarrival, Q_INTERARRIVAL_SQL),
        "q_decayed_counts": (q_decayed_counts, Q_DECAYED_COUNTS_SQL),
        "q_two_hop": (q_two_hop, Q_TWO_HOP_SQL),
        "q_reproject": (q_reproject, Q_REPROJECT_SQL),
        "q_source_drift": (q_source_drift, Q_SOURCE_DRIFT_SQL),
        "q_profile": (q_profile, Q_PROFILE_SQL),
        "q_delta_encode": (q_delta_encode, Q_DELTA_ENCODE_SQL),
        "q_debounce": (q_debounce, Q_DEBOUNCE_SQL),
        "q_token_bucket": (q_token_bucket, Q_TOKEN_BUCKET_SQL),
        "q_winnow": (q_winnow, Q_WINNOW_SQL),
        "q_quality_clf": (q_quality_clf, Q_QUALITY_CLF_SQL),
        "q_gopher_rules": (q_gopher_rules, Q_GOPHER_RULES_SQL),
        "q_boilerplate": (q_boilerplate, Q_BOILERPLATE_SQL),
        "q_cdc_chunks": (q_cdc_chunks, Q_CDC_CHUNKS_SQL),
        "q_label_prop": (q_label_prop, Q_LABEL_PROP_SQL),
        "q_assortativity": (q_assortativity, Q_ASSORTATIVITY_SQL),
        "q_hits": (q_hits, Q_HITS_SQL),
        "q_embed_infer": (q_embed_infer, Q_EMBED_INFER_SQL),
        "q_stay_points": (q_stay_points, Q_STAY_POINTS_SQL),
        "q_dither": (q_dither, Q_DITHER_SQL),
        "q_wordpiece": (q_wordpiece, Q_WORDPIECE_SQL),
        "q_st_join": (q_st_join, Q_ST_JOIN_SQL),
        "q_ppr": (q_ppr, Q_PPR_SQL),
        "q_dp_counts": (q_dp_counts, Q_DP_COUNTS_SQL),
        "q_audio_pitch": (q_audio_pitch, Q_AUDIO_PITCH_SQL),
        "q_cusum": (q_cusum, Q_CUSUM_SQL),
        "q_sax": (q_sax, Q_SAX_SQL),
        "q_auc": (q_auc, Q_AUC_SQL),
        "q_geofence": (q_geofence, Q_GEOFENCE_SQL),
        "q_lpm": (q_lpm, Q_LPM_SQL),
        "q_label_noise": (q_label_noise, Q_LABEL_NOISE_SQL),
        "q_theil_sen": (q_theil_sen, Q_THEIL_SEN_SQL),
        "q_zonemap": (q_zonemap, Q_ZONEMAP_SQL),
        "q_cluster_quality": (q_cluster_quality, Q_CLUSTER_QUALITY_SQL),
        "q_ndcg": (q_ndcg, Q_NDCG_SQL),
        "q_text_aug": (q_text_aug, Q_TEXT_AUG_SQL),
        "q_snapshot_diff": (q_snapshot_diff, Q_SNAPSHOT_DIFF_SQL),
        "q_assoc_rules": (q_assoc_rules, Q_ASSOC_RULES_SQL),
        "q_kd_parts": (q_kd_parts, Q_KD_PARTS_SQL),
        "q_winsorize": (q_winsorize, Q_WINSORIZE_SQL),
        "q_benford": (q_benford, Q_BENFORD_SQL),
        "q_mutual_nn": (q_mutual_nn, Q_MUTUAL_NN_SQL),
        "q_calibration": (q_calibration, Q_CALIBRATION_SQL),
        "q_lm_score": (q_lm_score, Q_LM_SCORE_SQL),
        "q_link_predict": (q_link_predict, Q_LINK_PREDICT_SQL),
        "q_dedup_sweep": (q_dedup_sweep, Q_DEDUP_SWEEP_SQL),
        "q_bpe_train": (q_bpe_train, Q_BPE_TRAIN_SQL),
        "q_ktruss": (q_ktruss, Q_KTRUSS_SQL),
        "q_stump": (q_stump, Q_STUMP_SQL),
        "q_url_canon": (q_url_canon, Q_URL_CANON_SQL),
        "q_polyline_stitch": (q_polyline_stitch, Q_POLYLINE_STITCH_SQL),
        "q_interleave": (q_interleave, Q_INTERLEAVE_SQL),
        "q_bpe_apply": (q_bpe_apply, Q_BPE_APPLY_SQL),
        "q_hard_negatives": (q_hard_negatives, Q_HARD_NEGATIVES_SQL),
        "q_od_flows": (q_od_flows, Q_OD_FLOWS_SQL),
        "q_epoch_shuffle": (q_epoch_shuffle, Q_EPOCH_SHUFFLE_SQL),
        "q_expectations": (q_expectations, Q_EXPECTATIONS_SQL),
        "q_star_revenue": (q_star_revenue, Q_STAR_REVENUE_SQL),
        "q_confusion": (q_confusion, Q_CONFUSION_SQL),
        "q_ab_metrics": (q_ab_metrics, Q_AB_METRICS_SQL),
        "q_bipartite": (q_bipartite, Q_BIPARTITE_SQL),
        "q_hist_match": (q_hist_match, Q_HIST_MATCH_SQL),
        "q_target_encode": (q_target_encode, Q_TARGET_ENCODE_SQL),
        "q_lru_hits": (q_lru_hits, Q_LRU_HITS_SQL),
        "q_clustering_coef": (q_clustering_coef, Q_CLUSTERING_COEF_SQL),
        "q_bootstrap": (q_bootstrap, Q_BOOTSTRAP_SQL),
        "q_attribution": (q_attribution, Q_ATTRIBUTION_SQL),
        "q_diversity": (q_diversity, Q_DIVERSITY_SQL),
        "q_quantile_normalize": (q_quantile_normalize,
                                 Q_QUANTILE_NORMALIZE_SQL),
        "q_holt": (q_holt, Q_HOLT_SQL),
        "q_haar": (q_haar, Q_HAAR_SQL),
        "q_hll_union": (q_hll_union, Q_HLL_UNION_SQL),
        "q_dissolve": (q_dissolve, Q_DISSOLVE_SQL),
        "q_kmv_union": (q_kmv_union, Q_KMV_UNION_SQL),
        "q_cms_union": (q_cms_union, Q_CMS_UNION_SQL),
        "q_str_pack": (q_str_pack, Q_STR_PACK_SQL),
        "q_rtree_probe": (q_rtree_probe, Q_RTREE_PROBE_SQL),
        "q_freq_spectrum": (q_freq_spectrum, Q_FREQ_SPECTRUM_SQL),
        "q_rfm": (q_rfm, Q_RFM_SQL),
        "q_dwell": (q_dwell, Q_DWELL_SQL),
        "q_slack": (q_slack, Q_SLACK_SQL),
        "q_outliers": (q_outliers, Q_OUTLIERS_SQL),
        "q_lorenz": (q_lorenz, Q_LORENZ_SQL),
        "q_vocab_growth": (q_vocab_growth, Q_VOCAB_GROWTH_SQL),
        "q_first_touch": (q_first_touch, Q_FIRST_TOUCH_SQL),
        "q_canonical_docs": (q_canonical_docs, Q_CANONICAL_DOCS_SQL),
        "q_change_pyramid": (q_change_pyramid, Q_CHANGE_PYRAMID_SQL),
        "q_merkle": (q_merkle, Q_MERKLE_SQL),
        "q_time_to_convert": (q_time_to_convert, Q_TIME_TO_CONVERT_SQL),
        "q_record_linkage": (q_record_linkage, Q_RECORD_LINKAGE_SQL),
        "q_pq_encode": (q_pq_encode, Q_PQ_ENCODE_SQL),
        "q_ivfpq_ann": (q_ivfpq_ann, Q_IVFPQ_ANN_SQL),
    }


# ---------------------------------------------------------------------------
# Round-5 additions: entity resolution (blocked record linkage) and
# product-quantization codes — two large-scale curation staples not yet
# in the registry. No counterpart in shrddr/osmml (engine adds).


def q_record_linkage(sf_dir: str):
    """Blocked record linkage (entity resolution): a dirty CLONE of the
    customer table (one hash-chosen digit of ``c_name`` rewritten,
    replayed identically in the twin) links back to its sources via
    interleaved-half blocking — two equality-join passes on
    (nationkey, odd-position digits) and (nationkey, even-position
    digits). Equal-length edit distance <= 1 is exactly ONE
    substitution, which leaves one interleaved half intact, so the two
    passes are a complete pigeonhole cover: no all-pairs comparison
    anywhere, candidate groups bounded by (nation x 4-5 specific
    digits). A verified pair agrees on exactly one half (both halves
    => identical names, impossible), so the pass union is
    duplicate-free without a dedup shuffle. Links include planted
    clone->source matches AND accidental near-collisions between
    sequential ids — both sides derive them identically."""
    from osmray.joins import bucketed_join
    from osmray.stages import hash64

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])

    def chars(names: list) -> np.ndarray:
        return np.frombuffer(
            np.array(names, dtype="S18").tobytes(), dtype=np.uint8
        ).reshape(-1, 18)

    def digits_int(ch: np.ndarray, cols: list[int]) -> np.ndarray:
        v = np.zeros(len(ch), dtype=np.int64)
        for c in cols:
            v = v * 10 + (ch[:, c].astype(np.int64) - 48)
        return v

    ODD = [9, 11, 13, 15, 17]   # 0-based digit positions (name[9:18])
    EVEN = [10, 12, 14, 16]

    def a_side(batch: pa.Table) -> pa.Table:
        ids = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = chars(batch["c_name"].to_pylist())
        k_odd = nat * 100000 + digits_int(ch, ODD)
        k_even = nat * 10000 + digits_int(ch, EVEN)
        names = batch["c_name"]
        return pa.table({
            "bk": pa.array(np.concatenate([k_odd * 2, k_even * 2 + 1])),
            "a_id": pa.array(np.concatenate([ids, ids])),
            "a_name": pa.concat_arrays([names.combine_chunks()] * 2),
            "nat": pa.array(np.concatenate([nat, nat]))})

    def b_side(batch: pa.Table) -> pa.Table:
        ids = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nat = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch = chars(batch["c_name"].to_pylist()).copy()
        # dirty clone: digit position 9 + h%9 rewritten to a FORCED
        # different digit (old + 1 + h2%9) % 10
        h = hash64(ids, seed=11)
        h2 = hash64(ids, seed=12)
        pos = (9 + (h % 9)).astype(np.int64)
        rows = np.arange(len(ids))
        old = ch[rows, pos].astype(np.int64) - 48
        ch[rows, pos] = (48 + (old + 1 + (h2 % 9)) % 10).astype(np.uint8)
        names = pa.array([b.decode() for b in
                          np.frombuffer(ch.tobytes(), dtype="S18")])
        k_odd = nat * 100000 + digits_int(ch, ODD)
        k_even = nat * 10000 + digits_int(ch, EVEN)
        return pa.table({
            "bk": pa.array(np.concatenate([k_odd * 2, k_even * 2 + 1])),
            "b_id": pa.array(np.concatenate([ids, ids]) + 1_000_000),
            "b_name": pa.concat_arrays([names] * 2)})

    a = ds.map_batches(a_side, batch_format="pyarrow")
    b = ds.map_batches(b_side, batch_format="pyarrow")
    j = bucketed_join(a, b, on="bk", num_buckets=16)

    def verify(batch: pa.Table) -> pa.Table:
        an = chars(batch["a_name"].to_pylist())
        bn = chars(batch["b_name"].to_pylist())
        ham = (an != bn).sum(axis=1).astype(np.int64)
        keep = ham <= 1
        aid = batch["a_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        bid = batch["b_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({
            "pk": pa.array((aid << 32) | bid),
            "nat": batch["nat"].filter(pa.array(keep)).cast(pa.int64()),
            "edits": pa.array(ham[keep])})

    # a lev-0 link (a clone colliding with a DIFFERENT original's
    # name) agrees on BOTH halves and surfaces in both passes — one
    # keyed min-fold dedups; (nat, edits) are constant per pair
    from osmray.tableops import sorted_fold

    u = sorted_fold(j.map_batches(verify, batch_format="pyarrow"),
                    "pk", ["nat", "edits"], ["min", "min"])

    def unpack(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "a_id": pa.array(pk >> 32),
            "b_id": pa.array(pk & 0xFFFFFFFF),
            "nat": batch["nat"].cast(pa.int64()),
            "edits": batch["edits"].cast(pa.int64())})

    return u.map_batches(unpack, batch_format="pyarrow")


def _record_linkage_sql() -> str:
    odd_sql = " || ".join(f"substr(c_name, {c + 1}, 1)" for c in (9, 11, 13, 15, 17))
    even_sql = " || ".join(f"substr(c_name, {c + 1}, 1)" for c in (10, 12, 14, 16))
    return f"""
WITH a0 AS (SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS nat
            FROM customer),
{hash64_ctes('rh', 'a0', 'c_custkey, c_name, nat', 'c_custkey', 11)},
{hash64_ctes('sh', 'a0', 'c_custkey', 'c_custkey', 12)},
b0 AS (
  SELECT r.c_custkey + 1000000 AS b_id, r.nat,
    substr(r.c_name, 1, CAST(9 + ((r.h % 9) + 9) % 9 AS BIGINT))
    || CAST((CAST(substr(r.c_name, CAST(10 + ((r.h % 9) + 9) % 9 AS BIGINT), 1) AS BIGINT)
             + 1 + ((s.h % 9) + 9) % 9) % 10 AS VARCHAR)
    || substr(r.c_name, CAST(11 + ((r.h % 9) + 9) % 9 AS BIGINT)) AS c_name
  FROM rh5 r JOIN sh5 s ON s.c_custkey = r.c_custkey),
ak AS (SELECT c_custkey AS a_id, c_name AS a_name, nat,
         (nat * 100000 + CAST({odd_sql} AS BIGINT)) * 2 AS bk FROM a0
       UNION ALL
       SELECT c_custkey, c_name, nat,
         (nat * 10000 + CAST({even_sql} AS BIGINT)) * 2 + 1 FROM a0),
bk AS (SELECT b_id, c_name AS b_name,
         (nat * 100000 + CAST({odd_sql} AS BIGINT)) * 2 AS bk FROM b0
       UNION ALL
       SELECT b_id, c_name,
         (nat * 10000 + CAST({even_sql} AS BIGINT)) * 2 + 1 FROM b0)
SELECT DISTINCT a.a_id, b.b_id, a.nat,
  CAST(levenshtein(a.a_name, b.b_name) AS BIGINT) AS edits
FROM ak a JOIN bk b ON b.bk = a.bk
WHERE levenshtein(a.a_name, b.b_name) <= 1
"""


Q_RECORD_LINKAGE_SQL = _record_linkage_sql()

_PQ_M, _PQ_K, _PQ_SD = 4, 16, 16  # subspaces x codes x dims-per-subspace


def _pq_codebook() -> np.ndarray:
    """Deterministic hash-derived codebook in milli-units, identical
    on both sides: c[sub, code, d] = hash64(gid, 7) mod 2001 - 1000."""
    from osmray.stages import hash64

    gid = np.arange(_PQ_M * _PQ_K * _PQ_SD, dtype=np.int64)
    return (hash64(gid, seed=7) % 2001 - 1000).reshape(_PQ_M, _PQ_K, _PQ_SD)


def pq_encode(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Product-quantization transform over any (id, vector) dataset —
    see q_pq_encode. Declarative step "pq_encode"."""
    C = _pq_codebook()  # (M, K, SD)

    def encode(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sub": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.int64())})
        emb = np.stack(batch[vec_col].to_numpy(zero_copy_only=False))
        e = np.floor(emb.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        e = e.reshape(len(ids), _PQ_M, 1, _PQ_SD)
        diff = e - C[None]                      # (n, M, K, SD)
        d2 = np.einsum("nmks,nmks->nmk", diff, diff)
        code = d2.argmin(axis=2)                # first min = smallest code
        best = np.take_along_axis(d2, code[:, :, None], 2)[:, :, 0]
        m = np.broadcast_to(np.arange(_PQ_M), code.shape)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, _PQ_M)),
            "sub": pa.array(m.ravel().astype(np.int64)),
            "code": pa.array(code.ravel().astype(np.int64)),
            "d2": pa.array(best.ravel().astype(np.int64))})

    return ds.map_batches(encode, batch_format="pyarrow")


def q_pq_encode(sf_dir: str):
    """Product-quantization encoding of the embeddings table — the
    memory-compression layer big ANN deployments put UNDER an IVF
    index (64-dim vector -> 4 bytes of codes): each 16-dim subvector
    maps to its nearest of 16 codebook centroids in EXACT integer
    milli-space (embedding quantized floor(1000 e + 0.5); hash-derived
    codebook, replayed bit-exactly in the twin). Emits (vec_id, sub,
    code, d2) with the argmin tie broken toward the smallest code.
    Scale design: the codebook is O(M K D) tiny and rides the closure;
    per batch the distance tensor (n, M, K) is one vectorized einsum —
    the corpus never shuffles at all."""
    return pq_encode(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))


def _pq_encode_sql() -> str:
    M, K, SD = _PQ_M, _PQ_K, _PQ_SD
    return f"""
WITH g AS (SELECT t.range AS gid FROM range({M * K * SD}) t),
{hash64_ctes('pq', 'g', 'gid', 'gid', 7)},
cent AS (SELECT gid // {K * SD} AS sub, (gid // {SD}) % {K} AS code,
                gid % {SD} AS d, ((h % 2001) + 2001) % 2001 - 1000 AS c
         FROM pq5),
e AS (SELECT vec_id, t.range AS d,
        CAST(floor(CAST(embedding[t.range + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS em
      FROM embeddings, range({M * SD}) t),
dist AS (
  SELECT e.vec_id, c.sub, c.code,
         sum((e.em - c.c) * (e.em - c.c)) AS d2
  FROM e JOIN cent c ON c.sub = e.d // {SD} AND c.d = e.d % {SD}
  GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, sub, code, d2,
    ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
  FROM dist)
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       CAST(d2 AS BIGINT) AS d2
FROM best WHERE rn = 1
"""


Q_PQ_ENCODE_SQL = _pq_encode_sql()


_IVFPQ_NC = 8  # coarse lists


def _ivfpq_coarse_mil() -> np.ndarray:
    """Hash-derived coarse quantizer in milli-units (integer-exact on
    both sides; a trained k-means coarse quantizer is q_ivf_ann's
    territory — here the MECHANISM under test is residual-PQ ADC)."""
    from osmray.stages import hash64

    gid = np.arange(_IVFPQ_NC * 64, dtype=np.int64)
    return (hash64(gid, seed=5) % 2001 - 1000).reshape(_IVFPQ_NC, 64)


def q_ivfpq_ann(sf_dir: str):
    """IVF-PQ approximate nearest neighbour — the FAISS-style memory-
    compressed index: quantize each vector to its nearest of 8 coarse
    cells (integer milli-space), PQ-encode the RESIDUAL (4 subspaces x
    16 codes, hash-derived codebook), then answer the first 5 vectors
    as queries by probing their 2 nearest coarse cells and ranking
    candidates by the ADC distance (query residual vs each
    candidate's RECONSTRUCTED residual centroid) — top 10 per query
    by (adc_d2, vec_id). Every step is integer-exact, so the twin
    replays it bit-for-bit.

    Scale design: both quantizers are O(KB) closure constants; the
    corpus maps once to (list_id, codes) — 4 bytes of codes per
    vector is what makes 10^12-vector indexes fit in RAM — and the
    search streams candidate lists through per-batch partial top-k;
    nothing shuffles but the bounded result."""
    import pyarrow.compute as _pc

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    CC = _ivfpq_coarse_mil()                      # (NC, 64)
    PQ = _pq_codebook()                           # (M, K, SD)

    def assign_codes(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "list_id": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.list_(pa.int64()))})
        emb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        e = np.floor(emb.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        d2c = ((e[:, None, :] - CC[None]) ** 2).sum(-1)     # (n, NC)
        lst = d2c.argmin(1)                                  # ties -> smallest
        r = (e - CC[lst]).reshape(len(ids), _PQ_M, 1, _PQ_SD)
        dd = ((r - PQ[None]) ** 2).sum(-1)                   # (n, M, K)
        codes = dd.argmin(2)
        return pa.table({
            "vec_id": pa.array(ids),
            "list_id": pa.array(lst.astype(np.int64)),
            "codes": pa.array(codes.tolist(), pa.list_(pa.int64()))})

    enc = ds.map_batches(assign_codes, batch_format="pyarrow").materialize()

    # queries: vec_id < 5, exact residuals against their 2 nearest lists
    import ray

    q_emb = (ds.filter(expr="vec_id < 5").to_pandas()
             .sort_values("vec_id").reset_index(drop=True))
    qe = np.floor(np.stack(q_emb["embedding"].to_numpy()).astype(np.float64)
                  * 1000 + 0.5).astype(np.int64)
    qd2 = ((qe[:, None, :] - CC[None]) ** 2).sum(-1)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :2]   # (nq, 2)
    qids = q_emb["vec_id"].to_numpy().astype(np.int64)

    # ADC lookup tables: for each (query, probed list): the query
    # residual in that list, expanded to per-(sub, code) distances
    luts = {}
    for qi, qid in enumerate(qids):
        for li in probes[qi]:
            r = (qe[qi] - CC[li]).reshape(_PQ_M, 1, _PQ_SD)
            luts[(int(qid), int(li))] = ((r - PQ) ** 2).sum(-1)  # (M, K)
    lut_ref = ray.put(luts)

    def search(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lst = batch["list_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = np.array(batch["codes"].to_pylist(), dtype=np.int64).reshape(
            len(ids), _PQ_M) if len(ids) else np.zeros((0, _PQ_M), np.int64)
        out_q, out_v, out_d = [], [], []
        for (qid, li), lut in lt.items():
            sel = lst == li
            if not sel.any():
                continue
            d = lut[np.arange(_PQ_M)[None, :], codes[sel]].sum(1)
            out_q.append(np.full(int(sel.sum()), qid, np.int64))
            out_v.append(ids[sel])
            out_d.append(d)
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "adc_d2": pa.array([], pa.int64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "vec_id": pa.array(np.concatenate(out_v)),
                         "adc_d2": pa.array(np.concatenate(out_d))})

    cand = enc.map_batches(search, batch_format="pyarrow")
    top = cand.sort(["query_id", "adc_d2", "vec_id"]).groupby(
        "query_id").map_groups(
        lambda g: g.slice(0, 10), batch_format="pyarrow")

    def rank(batch: pa.Table) -> pa.Table:
        q = batch["query_id"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(q)) + 1))
        rk = np.arange(len(q), dtype=np.int64) - np.repeat(
            starts, np.diff(np.concatenate((starts, [len(q)])))) + 1
        return batch.append_column("rank", pa.array(rk))

    return top.map_batches(rank, batch_format="pyarrow", batch_size=None)


def _ivfpq_sql() -> str:
    M, K, SD, NC = _PQ_M, _PQ_K, _PQ_SD, _IVFPQ_NC
    return f"""
WITH cg AS (SELECT t.range AS gid FROM range({NC * 64}) t),
{hash64_ctes('cq', 'cg', 'gid', 'gid', 5)},
coarse AS (SELECT gid // 64 AS list_id, gid % 64 AS d,
                  ((h % 2001) + 2001) % 2001 - 1000 AS c FROM cq5),
pg AS (SELECT t.range AS gid FROM range({M * K * SD}) t),
{hash64_ctes('pq', 'pg', 'gid', 'gid', 7)},
book AS (SELECT gid // {K * SD} AS sub, (gid // {SD}) % {K} AS code,
                gid % {SD} AS d, ((h % 2001) + 2001) % 2001 - 1000 AS c
         FROM pq5),
e AS (SELECT vec_id, t.range AS d,
        CAST(floor(CAST(embedding[t.range + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS em
      FROM embeddings, range({M * SD}) t),
cdist AS (SELECT e.vec_id, c.list_id, sum((e.em - c.c) * (e.em - c.c)) AS d2
          FROM e JOIN coarse c ON c.d = e.d GROUP BY 1, 2),
crank AS (SELECT vec_id, list_id, ROW_NUMBER() OVER (
            PARTITION BY vec_id ORDER BY d2, list_id) AS rn FROM cdist),
assign AS (SELECT vec_id, list_id FROM crank WHERE rn = 1),
res AS (SELECT e.vec_id, a.list_id, e.d, e.em - c.c AS r
        FROM e JOIN assign a ON a.vec_id = e.vec_id
        JOIN coarse c ON c.list_id = a.list_id AND c.d = e.d),
pdist AS (SELECT r.vec_id, b.sub, b.code, sum((r.r - b.c) * (r.r - b.c)) AS d2
          FROM res r JOIN book b ON b.sub = r.d // {SD} AND b.d = r.d % {SD}
          GROUP BY 1, 2, 3),
codes AS (SELECT vec_id, sub, code FROM (
            SELECT vec_id, sub, code, ROW_NUMBER() OVER (
              PARTITION BY vec_id, sub ORDER BY d2, code) AS rn FROM pdist)
          WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, list_id FROM crank
           WHERE vec_id < 5 AND rn <= 2),
qres AS (SELECT p.query_id, p.list_id, e.d, e.em - c.c AS r
         FROM probes p JOIN e ON e.vec_id = p.query_id
         JOIN coarse c ON c.list_id = p.list_id AND c.d = e.d),
lut AS (SELECT q.query_id, q.list_id, b.sub, b.code,
               sum((q.r - b.c) * (q.r - b.c)) AS d2
        FROM qres q JOIN book b ON b.sub = q.d // {SD} AND b.d = q.d % {SD}
        GROUP BY 1, 2, 3, 4),
adc AS (SELECT l.query_id, a.vec_id, sum(l.d2) AS adc_d2
        FROM assign a
        JOIN codes k ON k.vec_id = a.vec_id
        JOIN lut l ON l.list_id = a.list_id AND l.sub = k.sub
                   AND l.code = k.code
        GROUP BY 1, 2),
ranked AS (SELECT query_id, vec_id, adc_d2, ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc_d2, vec_id) AS rank
           FROM adc)
SELECT query_id, vec_id, CAST(adc_d2 AS BIGINT) AS adc_d2,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


Q_IVFPQ_ANN_SQL = _ivfpq_sql()
