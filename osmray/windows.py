"""Sort-based windowed operators (SURVEY §2.9 streaming-shaped ops).

``groupby(key).map_groups(fn)`` is the readable reference
implementation of a partitioned ordered window, but it pays one
Python call per group and shuffles whole rows into per-group tasks —
fine for hundreds of fat groups, hopeless for millions of small ones.

The operators here are the scale path: a global distributed
``sort(key, ...)`` (Ray's range sort keeps each key contiguous),
then VECTORIZED run detection inside ``map_batches`` over whole
blocks. A run that does not touch its block's edge contains EVERY row
of its key, so its result is emitted directly with no further
shuffle; only the ≤ 2 runs touching each block boundary forward
partials into a tiny fix-up ``groupby`` (group count = O(#blocks),
independent of key cardinality). Exactness across splits: a sorted
sequence's consecutive-gap multiset / prefix sums are preserved by
any split into contiguous ranges, and partials are re-ordered by
their first row's sort key.

- ``sessionize_sorted``   per-key session counts over a ts order
- ``running_sum_sorted``  first-k rows per key with running sums
- ``grouped_topk``        top-k per key with a map-side combiner
                          (no global sort: local top-k per batch)

The map_groups twins live in osmray/queries.py (``*_groups``),
pytest-pinned equal on randomized multi-block data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc


def _runs(keys: np.ndarray) -> np.ndarray:
    """Boundaries of equal-key runs in a sorted array: [0, ..., n].
    Works for any comparable dtype (strings included)."""
    return np.concatenate(
        ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1, [len(keys)]))


def sessionize_sorted(ds, key: str = "user_id", ts: str = "ts", gap_sec: int = 1800):
    """Per-key session counts: a new session starts after a > gap_sec
    gap in ts order. Returns (key, n_sessions, n_events)."""
    sds = ds.sort([key, ts])

    def partials(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        sec = batch[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        b = _runs(k)
        out = {key: [], "n_sess": [], "n_events": [], "first_sec": [], "last_sec": [],
               "complete": []}
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            s = sec[lo:hi]
            out[key].append(int(k[lo]))
            out["n_sess"].append(1 + int((np.diff(s) > gap_sec).sum()))
            out["n_events"].append(hi - lo)
            out["first_sec"].append(int(s[0]))
            out["last_sec"].append(int(s[-1]))
            # a run not touching the block edge holds its key entirely
            out["complete"].append(lo > 0 and hi < len(k))
        return pa.table(
            {
                key: pa.array(out[key], pa.int64()),
                "n_sess": pa.array(out["n_sess"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
                "first_sec": pa.array(out["first_sec"], pa.int64()),
                "last_sec": pa.array(out["last_sec"], pa.int64()),
                "complete": pa.array(out["complete"], pa.bool_()),
            }
        )

    # MATERIALIZED: both branches below consume this small table; a
    # lazy re-execution could split blocks differently between the
    # two runs and re-classify a run's completeness (dup/missing keys)
    parts = sds.map_batches(partials, batch_format="pyarrow", batch_size=None).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        done = batch.filter(batch["complete"])
        return pa.table(
            {
                key: done[key],
                "n_sessions": done["n_sess"],
                "n_events": done["n_events"],
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        first = g["first_sec"].to_numpy(zero_copy_only=False)
        last = g["last_sec"].to_numpy(zero_copy_only=False)
        order = np.argsort(first, kind="stable")
        first, last = first[order], last[order]
        # boundary between consecutive partials of one key: same
        # session unless the gap exceeds gap_sec
        joins = int((first[1:] - last[:-1] <= gap_sec).sum())
        n_sess = int(g["n_sess"].to_numpy(zero_copy_only=False).sum())
        n_ev = int(g["n_events"].to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                key: g[key].slice(0, 1),
                "n_sessions": pa.array([n_sess - joins], pa.int64()),
                "n_events": pa.array([n_ev], pa.int64()),
            }
        )

    fixup = (
        parts.map_batches(
            lambda t: t.filter(_pc.invert(t["complete"])), batch_format="pyarrow"
        )
        .groupby(key)
        .map_groups(merge, batch_format="pyarrow")
    )
    return parts.map_batches(finish, batch_format="pyarrow").union(fixup)


def running_sum_sorted(ds, key: str = "user_id", ts: str = "ts", id_col: str = "event_id",
                       val_col: str = "value", k: int = 3):
    """First-k rows per key in (ts, id) order with running cents.
    Returns (event_id, key, row_n, running_cents) like the
    window-function SQL twin."""
    sds = ds.sort([key, ts, id_col])

    def partials(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tsv = batch[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        cents = np.floor(
            batch[val_col].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        b = _runs(kk)
        rows = {c: [] for c in (key, "first_ts", "first_id", "n", "cents_sum",
                                 "cand_id", "cand_row", "cand_cents", "complete")}
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            c = np.cumsum(cents[lo:hi])
            take = min(k, hi - lo)
            rows[key].append(int(kk[lo]))
            rows["first_ts"].append(int(tsv[lo]))
            rows["first_id"].append(int(ids[lo]))
            rows["n"].append(hi - lo)
            rows["cents_sum"].append(int(c[-1]))
            rows["cand_id"].append(ids[lo : lo + take].tolist())
            rows["cand_row"].append(np.arange(1, take + 1, dtype=np.int64).tolist())
            rows["cand_cents"].append(c[:take].tolist())
            rows["complete"].append(lo > 0 and hi < len(kk))
        return pa.table(
            {
                key: pa.array(rows[key], pa.int64()),
                "first_ts": pa.array(rows["first_ts"], pa.int64()),
                "first_id": pa.array(rows["first_id"], pa.int64()),
                "n": pa.array(rows["n"], pa.int64()),
                "cents_sum": pa.array(rows["cents_sum"], pa.int64()),
                "cand_id": pa.array(rows["cand_id"], pa.list_(pa.int64())),
                "cand_row": pa.array(rows["cand_row"], pa.list_(pa.int64())),
                "cand_cents": pa.array(rows["cand_cents"], pa.list_(pa.int64())),
                "complete": pa.array(rows["complete"], pa.bool_()),
            }
        )

    # materialized: consumed by two branches (see sessionize_sorted)
    parts = sds.map_batches(partials, batch_format="pyarrow", batch_size=None).materialize()

    def emit(g: pa.Table) -> pa.Table:
        # partials of one key are contiguous slices of the global
        # (ts, id) order; their first row's (ts, id) orders them (the
        # id tiebreak matches the sort key, and ids are unique)
        ft = g["first_ts"].to_numpy(zero_copy_only=False)
        fi = g["first_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fi, ft))
        n = g["n"].to_numpy(zero_copy_only=False)[order]
        cs = g["cents_sum"].to_numpy(zero_copy_only=False)[order]
        n_off = np.concatenate(([0], np.cumsum(n)[:-1]))
        c_off = np.concatenate(([0], np.cumsum(cs)[:-1]))
        cand_id = g["cand_id"].to_pylist()
        cand_row = g["cand_row"].to_pylist()
        cand_cents = g["cand_cents"].to_pylist()
        out = {"event_id": [], key: [], "row_n": [], "running_cents": []}
        kv = g[key][0].as_py()
        for oi, i in enumerate(order.tolist()):
            if n_off[oi] >= k:
                break  # all candidates of later partials rank > k
            ids = cand_id[i]
            rws = cand_row[i]
            cts = cand_cents[i]
            for j in range(len(ids)):
                rn = int(rws[j]) + int(n_off[oi])
                if rn > k:
                    break
                out["event_id"].append(int(ids[j]))
                out[key].append(kv)
                out["row_n"].append(rn)
                out["running_cents"].append(int(cts[j]) + int(c_off[oi]))
        return pa.table(
            {
                "event_id": pa.array(out["event_id"], pa.int64()),
                key: pa.array(out[key], type=g.schema.field(key).type),
                "row_n": pa.array(out["row_n"], pa.int64()),
                "running_cents": pa.array(out["running_cents"], pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        done = batch.filter(batch["complete"])
        ids = done["cand_id"].to_pylist()
        rws = done["cand_row"].to_pylist()
        cts = done["cand_cents"].to_pylist()
        kv = done[key].to_numpy(zero_copy_only=False)
        lens = np.asarray([len(v) for v in ids], dtype=np.int64)
        return pa.table(
            {
                "event_id": pa.array(
                    [v for row in ids for v in row], pa.int64()
                ),
                key: pa.array(np.repeat(kv, lens)),
                "row_n": pa.array([v for row in rws for v in row], pa.int64()),
                "running_cents": pa.array(
                    [v for row in cts for v in row], pa.int64()
                ),
            }
        )

    fixup = (
        parts.map_batches(
            lambda t: t.filter(_pc.invert(t["complete"])), batch_format="pyarrow"
        )
        .groupby(key)
        .map_groups(emit, batch_format="pyarrow")
    )
    return parts.map_batches(finish, batch_format="pyarrow").union(fixup)


def grouped_topk(ds, key: str, val: str, tiebreak: str, k: int = 2):
    """Top-k rows per key by (val desc, tiebreak asc), with rank.
    Map-side combiner: each batch keeps its local top-k per key (one
    lexsort), so the per-key merge sees ≤ k rows per key per block."""

    def local_topk(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        vv = batch[val].to_numpy(zero_copy_only=False)
        tt = batch[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((tt, -vv, kk))  # key asc, val desc, tie asc
        ks = kk[order]
        b = _runs(ks)
        keep = []
        for i in range(len(b) - 1):
            lo = int(b[i])
            keep.extend(order[lo : min(lo + k, int(b[i + 1]))].tolist())
        return batch.take(pa.array(np.asarray(keep, dtype=np.int64)))

    def final(g: pa.Table) -> pa.Table:
        # numeric val/tiebreak (as every query using this op has)
        vv = g[val].to_numpy(zero_copy_only=False)
        tt = g[tiebreak].to_numpy(zero_copy_only=False)
        sel = np.lexsort((tt, -vv))[:k]
        out = g.take(pa.array(sel))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int64))
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_topk_sorted(ds, key: str, val: str, tiebreak: str, k: int = 2):
    """Sort-based top-k per key: global sort (key asc, val desc, tie
    asc); complete in-block runs emit their first k rows directly
    (vectorized), boundary runs go through a tiny per-key fix-up —
    merge group count is O(#blocks), not O(#keys). Preferable to
    ``grouped_topk`` when keys are numerous and small (the map_groups
    merge would pay one Python call per key)."""
    sds = ds.sort([key, val, tiebreak], descending=[False, True, False])

    def local(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        b = _runs(kk)
        n = len(kk)
        keep, ranks, complete = [], [], []
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            done = lo > 0 and hi < n
            # boundary runs forward their first <=k rows too: the key's
            # global top-k lie in its first parts of the global order
            take = min(k, hi - lo)
            keep.extend(range(lo, lo + take))
            ranks.extend(range(1, take + 1))
            complete.extend([done] * take)
        out = batch.take(pa.array(np.asarray(keep, dtype=np.int64)))
        return out.append_column("rank", pa.array(ranks, pa.int64())).append_column(
            "complete", pa.array(complete, pa.bool_())
        )

    # materialized: consumed by two branches (see sessionize_sorted);
    # bounded at <= k rows per key per block
    rows = sds.map_batches(local, batch_format="pyarrow", batch_size=None).materialize()

    def merge(g: pa.Table) -> pa.Table:
        vv = g[val].to_numpy(zero_copy_only=False)
        tt = g[tiebreak].to_numpy(zero_copy_only=False)
        sel = np.lexsort((tt, -vv))[:k]
        out = g.take(pa.array(sel)).drop_columns(["rank", "complete"])
        return out.append_column(
            "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int64))
        )

    done = rows.map_batches(
        lambda t: t.filter(t["complete"]).drop_columns(["complete"]),
        batch_format="pyarrow",
    )
    fixup = (
        rows.map_batches(
            lambda t: t.filter(_pc.invert(t["complete"])), batch_format="pyarrow"
        )
        .groupby(key)
        .map_groups(merge, batch_format="pyarrow")
    )
    return done.union(fixup)

def lag_lead_sorted(ds, key: str = "user_id", ts: str = "ts",
                    id_col: str = "event_id"):
    """Per-key LAG/LEAD timestamp deltas (the window-navigation op):
    for every row, microseconds since the previous and until the next
    row of the same key in (ts, id) order; -1 where no neighbor
    exists. Same shape as the other sort-based windows: one global
    sort, then every row whose neighbors are in-block emits directly
    (vectorized diff), and only the two edge rows of each block go to
    the fix-up. Exactness argument: a block-edge row's missing global
    neighbor is the adjacent block's edge row of the same key — also
    a fix-up row — and no fix-up row of the key lies strictly between
    two globally adjacent rows, so the per-group sorted predecessor/
    successor IS the global one whenever the in-block side is unknown.
    """
    sds = ds.sort([key, ts, id_col])

    def local(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        tsv = batch[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(kk)
        lag = np.full(n, -1, dtype=np.int64)
        lead = np.full(n, -1, dtype=np.int64)
        if n > 1:
            same_prev = kk[1:] == kk[:-1]
            d = tsv[1:] - tsv[:-1]
            lag[1:][same_prev] = d[same_prev]
            lead[:-1][same_prev] = d[same_prev]
        # only the block's first row's lag / last row's lead can be
        # wrong (their true neighbor may live in the adjacent block)
        known = np.ones(n, dtype=bool)
        if n:
            known[0] = False
            known[-1] = False
        return pa.table(
            {
                id_col: pa.array(ids),
                key: batch[key],
                "_ts": pa.array(tsv),
                "lag_us": pa.array(lag),
                "lead_us": pa.array(lead),
                "lag_known": pa.array(np.concatenate(([False], np.ones(n - 1, bool))) if n else np.zeros(0, bool)),
                "lead_known": pa.array(np.concatenate((np.ones(n - 1, bool), [False])) if n else np.zeros(0, bool)),
                "complete": pa.array(known),
            }
        )

    rows = sds.map_batches(local, batch_format="pyarrow", batch_size=None).materialize()

    def fix(g: pa.Table) -> pa.Table:
        tsv = g["_ts"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tsv))
        lag = g["lag_us"].to_numpy(zero_copy_only=False).copy()
        lead = g["lead_us"].to_numpy(zero_copy_only=False).copy()
        lagk = g["lag_known"].to_numpy(zero_copy_only=False)
        leadk = g["lead_known"].to_numpy(zero_copy_only=False)
        for pos, i in enumerate(order.tolist()):
            if not lagk[i] and pos > 0:
                lag[i] = tsv[i] - tsv[order[pos - 1]]
            if not leadk[i] and pos < len(order) - 1:
                lead[i] = tsv[order[pos + 1]] - tsv[i]
        return pa.table(
            {
                id_col: g[id_col],
                key: g[key],
                "lag_us": pa.array(lag),
                "lead_us": pa.array(lead),
            }
        )

    out_cols = [id_col, key, "lag_us", "lead_us"]
    done = rows.map_batches(
        lambda t: t.filter(t["complete"]).select(out_cols), batch_format="pyarrow"
    )
    fixup = (
        rows.map_batches(
            lambda t: t.filter(_pc.invert(t["complete"])), batch_format="pyarrow"
        )
        .groupby(key)
        .map_groups(fix, batch_format="pyarrow")
    )
    return done.union(fixup)

def interval_islands(ds, key: str = "user_id", start: str = "s", end: str = "e"):
    """Merge overlapping/touching half-open intervals per key (the
    gaps-and-islands op): returns (key, n_intervals, n_islands,
    covered) where ``covered`` is the total length of the union.
    An interval joins the current island iff its start <= the running
    max end (touching merges), identical to the window-SQL definition.

    Distribution: one global sort by (key, start, end); each block
    merges its key-runs locally (vectorized cummax + reduceat) and
    emits ISLAND rows, final for interior runs; only the islands of
    block-edge runs enter the per-key fix-up, which re-merges sorted
    islands the same vectorized way (correct because local islands of
    contiguous slices are themselves intervals of the key's line, and
    merging is associative over the sorted order)."""
    from ray.data.aggregate import Count, Sum

    sds = ds.sort([key, start, end])

    def local(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False)
        ss = batch[start].to_numpy(zero_copy_only=False).astype(np.int64)
        ee = batch[end].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(kk)
        b = _runs(kk)
        out = {key: [], "s0": [], "e1": [], "n": [], "complete": []}
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            if hi == lo:  # empty block -> _runs yields one empty run
                continue
            cm = np.maximum.accumulate(ee[lo:hi])
            new_isl = np.concatenate(([True], ss[lo + 1:hi] > cm[:-1]))
            isl_starts = np.flatnonzero(new_isl)
            isl_ends = np.concatenate((isl_starts[1:], [hi - lo]))
            done = lo > 0 and hi < n
            for a, z in zip(isl_starts.tolist(), isl_ends.tolist()):
                out[key].append(kk[lo])
                out["s0"].append(int(ss[lo + a]))
                out["e1"].append(int(cm[z - 1]))
                out["n"].append(z - a)
                out["complete"].append(done)
        return pa.table(
            {
                key: pa.array(out[key], type=batch.schema.field(key).type),
                "s0": pa.array(out["s0"], pa.int64()),
                "e1": pa.array(out["e1"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "complete": pa.array(out["complete"], pa.bool_()),
            }
        )

    rows = sds.map_batches(local, batch_format="pyarrow", batch_size=None).materialize()

    def summarize_islands(t: pa.Table, kv, ktype) -> pa.Table:
        s0 = t["s0"].to_numpy(zero_copy_only=False)
        e1 = t["e1"].to_numpy(zero_copy_only=False)
        nn = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e1, s0))
        s0, e1, nn = s0[order], e1[order], nn[order]
        cm = np.maximum.accumulate(e1)
        new_isl = np.concatenate(([True], s0[1:] > cm[:-1]))
        isl_id = np.cumsum(new_isl) - 1
        starts = np.flatnonzero(new_isl)
        isl_s = s0[starts]
        isl_e = np.maximum.reduceat(e1, starts)
        return pa.table(
            {
                key: pa.array([kv], type=ktype),
                "n_intervals": pa.array([int(nn.sum())], pa.int64()),
                "n_islands": pa.array([int(new_isl.sum())], pa.int64()),
                "covered": pa.array([int((isl_e - isl_s).sum())], pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        done = batch.filter(batch["complete"])
        if len(done) == 0:
            return pa.table(
                {key: pa.array([], type=batch.schema.field(key).type),
                 "n_intervals": pa.array([], pa.int64()),
                 "n_islands": pa.array([], pa.int64()),
                 "covered": pa.array([], pa.int64())}
            )
        kk = done[key].to_numpy(zero_copy_only=False)
        b = _runs(kk)
        parts = []
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            parts.append(summarize_islands(
                done.slice(lo, hi - lo), kk[lo], batch.schema.field(key).type))
        return pa.concat_tables(parts)

    def fix(g: pa.Table) -> pa.Table:
        return summarize_islands(g, g[key][0].as_py(), g.schema.field(key).type)

    fixup = (
        rows.map_batches(
            lambda t: t.filter(_pc.invert(t["complete"])), batch_format="pyarrow"
        )
        .groupby(key)
        .map_groups(fix, batch_format="pyarrow")
    )
    return rows.map_batches(finish, batch_format="pyarrow").union(fixup)


def ntile_ranks(ds, key: str, order_col: str, id_col: str, n_tiles: int = 4):
    """Per-key rank family in one pass: ntile(n) over (order, id),
    percent_rank and cume_dist over ``order`` alone (peer groups =
    equal order values), matching the SQL window functions exactly.

    percent_rank = (rank-1)/(n-1) and cume_dist = peers_cum/n are
    emitted as float64; both sides compute them as one IEEE double
    division of the same integers, so hashes are bit-exact.

    Distribution: ``groupby(key).map_groups`` — these ranks need the
    group's total count up front, so a key's rows must be co-located
    anyway; right for a bounded number of fat category keys (the
    millions-of-tiny-keys regime would use the sorted-scan pattern at
    the top of this module with a count-broadcast first pass)."""

    def ranks(g: pa.Table) -> pa.Table:
        vv = g[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(vv)
        order = np.lexsort((ii, vv))
        sv = vv[order]
        # min-rank / cumulative peers of each sorted position
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sv)) + 1))
        grp = np.cumsum(np.concatenate(([False], np.diff(sv) > 0)))
        rank = starts[grp] + 1
        ends = np.concatenate((starts[1:], [n]))
        peers_cum = ends[grp]
        # ntile: first n % t buckets get size q+1, rest q
        q, r = divmod(n, n_tiles)
        pos = np.arange(n, dtype=np.int64)
        cut = r * (q + 1)
        tile = np.where(pos < cut, pos // max(q + 1, 1),
                        r + (pos - cut) // max(q, 1)) + 1
        prank = (rank - 1) / max(n - 1, 1)
        cdist = peers_cum / n
        out = {
            id_col: pa.array(ii[order]),
            key: pa.array(np.repeat(g[key][0].as_py(), n),
                          type=g.schema.field(key).type),
            "tile": pa.array(tile.astype(np.int64)),
            "prank": pa.array(prank),
            "cdist": pa.array(cdist),
        }
        return pa.table(out)

    return ds.groupby(key).map_groups(ranks, batch_format="pyarrow")


def range_window_sum(ds, key: str, ts: str, id_col: str, val_col: str,
                     range_us: int = 3_600_000_000):
    """RANGE-frame windowed sum per key: for each row, the sum of
    ``val_col`` over rows with ts in [row.ts - range_us, row.ts]
    (peers of the current ts included, exactly the SQL
    ``RANGE BETWEEN ... PRECEDING AND CURRENT ROW`` frame).

    Vectorized per group: sort by ts, prefix-sum, two searchsorted
    calls give every row's frame bounds at once. Same co-location
    note as ``ntile_ranks``."""

    def win(g: pa.Table) -> pa.Table:
        tv = g[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(tv, kind="stable")
        st, sv = tv[order], vv[order]
        csum = np.concatenate(([0], np.cumsum(sv)))
        lo = np.searchsorted(st, st - range_us, side="left")
        hi = np.searchsorted(st, st, side="right")
        w = csum[hi] - csum[lo]
        return pa.table({
            id_col: pa.array(ii[order]),
            key: pa.array(np.repeat(g[key][0].as_py(), len(ii)),
                          type=g.schema.field(key).type),
            "win_sum": pa.array(w.astype(np.int64)),
        })

    return ds.groupby(key).map_groups(win, batch_format="pyarrow")


def funnel(ds, key: str, ts: str, type_col: str, steps: list[str]):
    """Ordered-sequence (funnel) match per key: the first occurrence
    of steps[0], then the first steps[1] STRICTLY after it, and so on;
    emits one row (key, t1..tk as int64 micros) per key completing
    every step. One shuffle; vectorized per group."""

    def match(g: pa.Table) -> pa.Table:
        tv = g[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = g[type_col].to_numpy(zero_copy_only=False)
        cur = np.int64(-(1 << 62))
        out_ts = []
        for s in steps:
            m = (et == s) & (tv > cur)
            if not m.any():
                return pa.table(
                    {key: pa.array([], type=g.schema.field(key).type),
                     **{f"t{i + 1}": pa.array([], pa.int64())
                        for i in range(len(steps))}})
            cur = tv[m].min()
            out_ts.append(int(cur))
        return pa.table(
            {key: pa.array([g[key][0].as_py()],
                           type=g.schema.field(key).type),
             **{f"t{i + 1}": pa.array([v], pa.int64())
                for i, v in enumerate(out_ts)}})

    return ds.groupby(key).map_groups(match, batch_format="pyarrow")


def resample_fill(ds, key: str, ts: str, val_col: str,
                  bucket_us: int = 86_400_000_000):
    """Per-key time-bucket resample with gap fill: sum of ``val_col``
    per bucket between the key's first and last bucket inclusive;
    missing buckets emit 0 with filled=True (the time-series
    gap-and-fill op). Vectorized per group via bincount over the
    bucket span; the span is bounded by the data's time range, not
    its row count."""

    def fill(g: pa.Table) -> pa.Table:
        tv = g[ts].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        vv = g[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = tv // bucket_us
        b0, b1 = int(b.min()), int(b.max())
        sums = np.bincount(b - b0, weights=vv, minlength=b1 - b0 + 1)
        hit = np.bincount(b - b0, minlength=b1 - b0 + 1) > 0
        days = np.arange(b0, b1 + 1, dtype=np.int64)
        return pa.table({
            key: pa.array(np.repeat(g[key][0].as_py(), len(days)),
                          type=g.schema.field(key).type),
            "bucket": pa.array(days),
            "val_sum": pa.array(sums.astype(np.int64)),
            "filled": pa.array(~hit),
        })

    return ds.groupby(key).map_groups(fill, batch_format="pyarrow")


def cusum_alarms(ds, k: int = 7500, h: int = 40000,
                 key: str = "user_id", ts_col: str = "ts",
                 val_col: str = "value", id_col: str = "event_id"):
    """One-sided CUSUM drift alarms per key stream — see
    queries.q_cusum (centi-unit quantization, reset-on-alarm scan)."""

    def per_key(g: pa.Table) -> pa.Table:
        tv = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.floor(g[val_col].to_numpy(
            zero_copy_only=False) * 100).astype(np.int64)
        order = np.lexsort((ii, tv))
        vi = vi[order]
        kid = int(g[key][0].as_py())
        s = n_alarms = max_s = 0
        for x in vi:
            s = max(0, s + int(x) - k)
            if s > h:
                n_alarms += 1
                s = 0
            max_s = max(max_s, s)
        return pa.table({key: pa.array([kid], pa.int64()),
                         "n_alarms": pa.array([n_alarms], pa.int64()),
                         "max_s": pa.array([max_s], pa.int64())})

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def stay_points(ds, d2: int = 25, t_min: int = 900,
                key: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id"):
    """Anchor-scan stay-point detection over the deterministic
    random-walk trajectories — see queries.q_stay_points."""

    def per_key(g: pa.Table) -> pa.Table:
        tv = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        tv, ii = tv[order], ii[order]
        x = np.cumsum(ii * 7919 % 5 - 2)
        y = np.cumsum(ii * 104729 % 5 - 2)
        kid = int(g[key][0].as_py())
        out = {key: [], "start_event": [], "n_pts": [], "dur_s": []}
        i, n = 0, len(ii)
        while i < n:
            dx, dy = x[i:] - x[i], y[i:] - y[i]
            far = dx * dx + dy * dy > d2
            j = i + (int(np.argmax(far)) if far.any() else n - i)
            dur = int(tv[j - 1] - tv[i])
            if dur >= t_min:
                out[key].append(kid)
                out["start_event"].append(int(ii[i]))
                out["n_pts"].append(j - i)
                out["dur_s"].append(dur)
            i = j
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in out.items()})

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def geofence_transitions(ds, box: int = 10, key: str = "user_id",
                         ts_col: str = "ts", id_col: str = "event_id"):
    """Geofence enter/exit counts per key over the random-walk
    trajectories — see queries.q_geofence."""

    def per_key(g: pa.Table) -> pa.Table:
        tv = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        ii = ii[order]
        x = np.cumsum(ii * 7919 % 5 - 2)
        y = np.cumsum(ii * 104729 % 5 - 2)
        inside = (np.abs(x) <= box) & (np.abs(y) <= box)
        prev = np.concatenate(([False], inside[:-1]))
        kid = int(g[key][0].as_py())
        return pa.table({
            key: pa.array([kid], pa.int64()),
            "n_enter": pa.array([int((inside & ~prev).sum())], pa.int64()),
            "n_exit": pa.array([int((~inside & prev).sum())], pa.int64()),
            "n_inside": pa.array([int(inside.sum())], pa.int64())})

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def interleave_positions(ds, key: str = "source", id_col: str = "doc_id"):
    """Deterministic proportional interleave of sources — the
    training-data MIXING-ORDER operator: each row gets its per-source
    rank ``rk`` (1-based, ordered by ``id_col``) and a global stride
    position ``pos = ((2*rk - 1) * n_total) // (2 * n_source)`` (the
    Bresenham / stride-scheduling midpoint: reading rows by pos
    interleaves every source evenly through one epoch, whatever the
    mix skew). Ranks come from the sorted-scan pattern, NOT a
    per-source map_groups: one sort by (key, id), block-local run
    positions, and O(#blocks x #key-runs-per-block) driver offsets —
    no task ever holds a whole source. Per-source totals are a
    bounded groupby (#sources is small; their SIZES are not).
    Overflow note: the product (2*rk-1)*n_total needs int128 beyond
    ~3e9 rows; swap in a per-source precomputed stride decomposition
    there. Emits (id, key, rk, pos)."""
    import ray
    from ray.data.aggregate import Count

    totals = {r[key]: r["count()"] for r in
              ds.groupby(key).aggregate(Count()).take_all()}
    n_total = int(sum(totals.values()))

    sds = (ds.select_columns([id_col, key])
           .sort([key, id_col]).materialize())

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"k0": pa.array([], pa.string()),
                             "i0": pa.array([], pa.int64()),
                             "src": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        ks = np.asarray(batch[key].to_pylist())
        ii = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(ks, return_counts=True)
        m = len(u)
        return pa.table({"k0": pa.array([str(ks[0])] * m),
                         "i0": pa.array([int(ii[0])] * m),
                         "src": pa.array(u),
                         "cnt": pa.array(cnt.astype(np.int64))})

    stats = (sds.map_batches(block_stats, batch_format="pyarrow",
                             batch_size=None)
             .to_pandas().sort_values(["k0", "i0"]))
    # running per-source offsets in global block order; blocks are
    # contiguous ranges of the (key, id) sort, identified by their
    # first row (id_col values are unique)
    run: dict = {}
    offsets: dict = {}
    for _, r in stats.iterrows():
        bk = (r["k0"], int(r["i0"]))
        offsets.setdefault(bk, {})[r["src"]] = run.get(r["src"], 0)
        run[r["src"]] = run.get(r["src"], 0) + int(r["cnt"])
    off_ref = ray.put((offsets, totals, n_total))

    def emit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], pa.string()),
                             "rk": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        offs, tot, nt = ray.get(off_ref)
        ks = np.asarray(batch[key].to_pylist())
        ii = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bk = (str(ks[0]), int(ii[0]))
        # local rank within each source run
        new = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        local = np.arange(len(ks), dtype=np.int64) - starts[gid]
        base = np.asarray([offs[bk][ks[s]] for s in starts], np.int64)
        rk = local + base[gid] + 1
        ns = np.asarray([tot[ks[s]] for s in starts], np.int64)[gid]
        pos = ((2 * rk - 1) * nt) // (2 * ns)
        return pa.table({id_col: batch[id_col], key: batch[key],
                         "rk": pa.array(rk), "pos": pa.array(pos)})

    return sds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def od_flows(ds, key: str = "user_id", ts_col: str = "ts",
             id_col: str = "event_id", cell_shift: int = 3,
             offset: int = 100000):
    """Origin-destination flow matrix over the deterministic
    random-walk trajectories (the mobility-analytics primitive):
    per key, the walk (cumsum of hashed ±2 steps, as stay_points /
    geofence) coarsens to 2^cell_shift-unit grid cells, and every
    consecutive CELL CHANGE emits one (from, to) transition; flows
    are the global transition counts. Per-key scan is the family's
    established map_groups shape (user streams are bounded; the
    walk's cumsum is order-dependent) with block-local pre-aggregated
    partials; the global count is one high-cardinality packed-key
    fold. ``offset`` keeps coordinates positive so >>shift and SQL
    // agree. Emits (fx, fy, tx, ty, n_trips)."""
    from osmray.tableops import sorted_fold_sums

    def per_key(g: pa.Table) -> pa.Table:
        tv = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ii = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ii, tv))
        ii = ii[order]
        x = np.cumsum(ii * 7919 % 5 - 2) + offset
        y = np.cumsum(ii * 104729 % 5 - 2) + offset
        cx, cy = x >> cell_shift, y >> cell_shift
        moved = (cx[1:] != cx[:-1]) | (cy[1:] != cy[:-1])
        pk = (((cx[:-1][moved] << 45) | (cy[:-1][moved] << 30))
              | (cx[1:][moved] << 15) | cy[1:][moved])
        u, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u),
                         "n": pa.array(cnt.astype(np.int64))})

    folded = sorted_fold_sums(
        ds.groupby(key).map_groups(per_key, batch_format="pyarrow"),
        "pk", ["n"])

    def unpack(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (1 << 15) - 1
        return pa.table({"fx": pa.array((pk >> 45) & m),
                         "fy": pa.array((pk >> 30) & m),
                         "tx": pa.array((pk >> 15) & m),
                         "ty": pa.array(pk & m),
                         "n_trips": batch["n"]})

    return folded.map_batches(unpack, batch_format="pyarrow")



def quantile_normalize(ds, key: str = "event_type", val_col: str = "value",
                       id_col: str = "event_id", num_buckets: int = 16):
    """Quantile normalization — the batch-effect-correction primitive
    (map every group's value DISTRIBUTION onto the pooled global
    distribution): each row's value becomes the GLOBAL value at rank
    max(1, rk * N_total // N_group), where rk is its (value, id) rank
    within its group. Exact integer centi-units, deterministic ties.
    Plan: per-group ranks AND global ranks both by the sorted-scan
    block-offset pattern (no task ever holds a whole group; runs are
    ordered by their head (cents, id) pair), then ONE grace join of
    requested global positions against the globally-ranked rows — no
    broadcast of either distribution. Emits
    (id, key, cents, qnorm_cents)."""
    import ray
    from ray.data.aggregate import Count

    from osmray.joins import bucketed_join

    totals = {r[key]: int(r["count()"]) for r in
              ds.groupby(key).aggregate(Count()).take_all()}
    n_total = int(sum(totals.values()))

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            key: batch[key],
            "cents": pa.array(np.floor(batch[val_col].to_numpy(
                zero_copy_only=False) * 100 + 0.5).astype(np.int64))})

    base = ds.map_batches(to_cents, batch_format="pyarrow").materialize()

    # --- per-group ranks ---
    sds = base.sort([key, "cents", id_col]).materialize()

    def run_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "c0": pa.array([], pa.int64()),
                             "i0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        ks = np.asarray(batch[key].to_pylist())
        cc = batch["cents"].to_numpy(zero_copy_only=False)
        ii = batch[id_col].to_numpy(zero_copy_only=False)
        new = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((starts, [len(ks)])))
        return pa.table({"src": pa.array(ks[starts]),
                         "c0": pa.array(cc[starts].astype(np.int64)),
                         "i0": pa.array(ii[starts].astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    stats = (sds.map_batches(run_stats, batch_format="pyarrow",
                             batch_size=None)
             .to_pandas().sort_values(["src", "c0", "i0"]))
    run: dict = {}
    offsets: dict = {}
    for _, r in stats.iterrows():
        bk = (r["src"], int(r["c0"]), int(r["i0"]))
        offsets[bk] = run.get(r["src"], 0)
        run[r["src"]] = run.get(r["src"], 0) + int(r["cnt"])
    off_ref = ray.put((offsets, totals, n_total))

    def want_pos(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             key: pa.array([], pa.string()),
                             "cents": pa.array([], pa.int64()),
                             "gpos": pa.array([], pa.int64())})
        offs, tot, nt = ray.get(off_ref)
        ks = np.asarray(batch[key].to_pylist())
        cc = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        ii = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new)
        gid = np.cumsum(new) - 1
        local = np.arange(len(ks), dtype=np.int64) - starts[gid]
        base_off = np.asarray([offs[(ks[s], int(cc[s]), int(ii[s]))]
                               for s in starts], np.int64)
        rk = local + base_off[gid] + 1
        ns = np.asarray([tot[ks[s]] for s in starts], np.int64)[gid]
        gpos = np.maximum(1, (rk * nt) // ns)
        return pa.table({id_col: pa.array(ii), key: batch[key],
                         "cents": pa.array(cc), "gpos": pa.array(gpos)})

    requests = sds.map_batches(want_pos, batch_format="pyarrow",
                               batch_size=None)

    # --- global ranks ---
    gds = base.sort(["cents", id_col]).materialize()

    def gblock_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"c0": pa.array([], pa.int64()),
                             "i0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        cc = batch["cents"].to_numpy(zero_copy_only=False)
        ii = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"c0": pa.array([int(cc[0])]),
                         "i0": pa.array([int(ii[0])]),
                         "n": pa.array([len(cc)])})

    gstats = (gds.map_batches(gblock_stats, batch_format="pyarrow",
                              batch_size=None)
              .to_pandas().sort_values(["c0", "i0"]))
    goffs = np.concatenate(([0], np.cumsum(gstats["n"].to_numpy())[:-1]))
    goff_ref = ray.put({(int(c), int(i)): int(o) for c, i, o in zip(
        gstats["c0"], gstats["i0"], goffs)})

    def granked(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"grank": pa.array([], pa.int64()),
                             "gval": pa.array([], pa.int64())})
        cc = batch["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        ii = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base_off = ray.get(goff_ref)[(int(cc[0]), int(ii[0]))]
        return pa.table({
            "grank": pa.array(np.arange(len(cc), dtype=np.int64)
                              + base_off + 1),
            "gval": pa.array(cc)})

    gtab = gds.map_batches(granked, batch_format="pyarrow",
                           batch_size=None)
    joined = bucketed_join(requests, gtab, on="gpos", right_on="grank",
                           num_buckets=num_buckets)
    return joined.map_batches(
        lambda t: pa.table({id_col: t[id_col], key: t[key],
                            "cents": t["cents"],
                            "qnorm_cents": t["gval"]}),
        batch_format="pyarrow")
