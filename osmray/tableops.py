"""Relational reshaping / frequency operators (engine adds beyond the
reference): PIVOT (long -> wide conditional aggregation) and exact
top-k heavy hitters via mergeable Misra-Gries candidate summaries.

Scale notes
-----------
- ``pivot_counts`` pre-aggregates the full wide row inside
  ``map_batches`` (C bincounts per block, C = #categories), so the
  groupby shuffles one already-wide partial row per (block, key) —
  never the input rows. Category set must be known and small (it
  becomes the column set); that is the PIVOT contract.
- ``heavy_hitters`` never shuffles raw values: per-block EXACT counts
  are truncated to a capacity-``m`` Misra-Gries summary (error per
  block <= block_n/(m+1)), summaries merge in a bounded combiner
  tree, and the surviving <= m candidates are broadcast for one exact
  recount pass. The result is EXACT top-k whenever the k-th true
  frequency exceeds N/(m+1) — verified at runtime from the recount
  (the MG deficit bound is tracked through every merge); below the
  bound the operator raises instead of silently returning
  approximations, and the caller can rerun with a larger ``m`` (cost
  is O(m) per block either way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(ds, key_col: str, cat_col: str, categories: list[str],
                 val_col: str | None = None):
    """Long -> wide: one row per key with ``n_<cat>`` counts (and
    ``cents_<cat>`` floor(100*val+0.5) sums when ``val_col`` given)
    per category. Rows whose category is not listed are ignored."""
    cats = list(categories)
    n_names = [f"n_{c}" for c in cats]
    c_names = [f"cents_{c}" for c in cats] if val_col else []

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        cv = batch[cat_col].to_numpy(zero_copy_only=False)
        u_keys, inv = np.unique(keys, return_inverse=True)
        cols: dict = {key_col: pa.array(u_keys)}
        if val_col:
            cents = np.floor(
                batch[val_col].to_numpy(zero_copy_only=False) * 100 + 0.5
            ).astype(np.int64)
        for j, c in enumerate(cats):
            sel = cv == c
            cols[n_names[j]] = pa.array(
                np.bincount(inv[sel], minlength=len(u_keys)).astype(np.int64)
            )
            if val_col:
                cols[c_names[j]] = pa.array(
                    np.bincount(
                        inv[sel], weights=cents[sel], minlength=len(u_keys)
                    ).astype(np.int64)
                )
        return pa.table(cols)

    from ray.data.aggregate import Sum

    aggs = [Sum(n, alias_name=n) for n in n_names + c_names]
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*aggs)
    )


def _mg_truncate(vals: np.ndarray, cnt: np.ndarray, m: int):
    """Truncate an exact/MG (value, count) summary to <= m entries the
    Misra-Gries way: subtract the (m+1)-th largest count from all and
    drop <= 0. Returns (vals, cnt, deficit) — ``deficit`` is the new
    per-item undercount bound added by this truncation."""
    if len(vals) <= m:
        return vals, cnt, 0
    # threshold = (m+1)-th largest count
    thr = np.partition(cnt, len(cnt) - (m + 1))[len(cnt) - (m + 1)]
    keep = cnt > thr
    return vals[keep], (cnt[keep] - thr), int(thr)


def heavy_hitters(ds, col: str, k: int = 25, capacity: int = 1024,
                  tokens: bool = False, max_candidates: int = 200_000):
    """Exact top-``k`` most frequent values of ``col`` (count desc,
    value asc). With ``tokens=True`` the column is tokenized to
    lowercase ``[a-z0-9_]+`` terms first (heavy hitters over words).

    Exactness argument: every value's merged MG count ``cnt_lo``
    satisfies ``cnt_lo <= true <= cnt_lo + D`` where ``D`` is the sum
    of per-block truncation deficits. Any true top-k value x has
    ``true_x >= kth_true >= kth_lo`` (true counts pointwise dominate
    lower bounds), so ``cnt_lo_x + D >= kth_lo`` — the candidate
    filter keeps it. Recounting the candidates exactly therefore
    yields the exact top-k UNCONDITIONALLY; ``capacity`` only affects
    the candidate-set size (raises above ``max_candidates`` instead
    of flooding the driver — rerun with larger ``capacity``)."""
    import re

    import ray
    from ray.data.aggregate import Sum

    tok_re = re.compile(r"[a-z0-9_]+")

    def values_of(batch: pa.Table) -> np.ndarray:
        if tokens:
            texts = batch[col].to_pylist()
            out: list[str] = []
            for t in texts:
                if t:
                    out.extend(tok_re.findall(t.lower()))
            return np.asarray(out, dtype=object)
        return batch[col].to_numpy(zero_copy_only=False)

    def summarize(batch: pa.Table) -> pa.Table:
        v = values_of(batch)
        u, c = np.unique(v, return_counts=True)
        u, c, d = _mg_truncate(u, c.astype(np.int64), capacity)
        return pa.table(
            {
                "value": pa.array(u.astype(str)),
                "cnt": pa.array(c),
                "deficit": pa.array(np.full(len(u), d, dtype=np.int64)),
                "total": pa.array(np.full(len(u), len(v), dtype=np.int64) if len(u) else np.zeros(0, np.int64)),
            }
        )

    # merge all block summaries into one candidate set. The summary
    # per block is <= capacity rows, so a groupby over (value) of the
    # partials is a small shuffle; the global deficit bound is the
    # SUM of per-block deficits plus, for values missing from some
    # block's summary, that block's deficit — bounded by the sum of
    # all per-block deficits, which is what we track.
    # materialized: consumed twice (merge groupby + scalar fold), and
    # bounded at <= capacity rows per input block
    parts = ds.map_batches(summarize, batch_format="pyarrow").materialize()
    merged = (
        parts.groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt_lo"))
    )
    # global scalars: total N and the total deficit bound
    tot = parts.map_batches(
        lambda t: pa.table({
            "n": pa.array([int(t["total"][0].as_py()) if len(t) else 0], pa.int64()),
            "d": pa.array([int(t["deficit"][0].as_py()) if len(t) else 0], pa.int64()),
        }),
        batch_format="pyarrow", batch_size=None,
    ).sum(["n", "d"])
    total_deficit = int(tot["sum(d)"])

    # candidate filter: every value whose UPPER bound (lo + D) reaches
    # the k-th largest LOWER bound can still be a true top-k member —
    # and (see docstring) every true top-k member passes it.
    top_lo = merged.sort("cnt_lo", descending=True).limit(k).to_pandas()
    if len(top_lo) == 0:
        return ray.data.from_arrow(pa.table({
            "value": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }))
    kth_lo = int(top_lo["cnt_lo"].iloc[-1])
    thr = kth_lo - total_deficit

    def passes(t: pa.Table) -> pa.Table:
        lo = t["cnt_lo"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(lo >= thr)).select(["value"])

    cand_ds = merged.map_batches(passes, batch_format="pyarrow")
    n_cand = cand_ds.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"heavy_hitters: {n_cand} candidates exceed max_candidates="
            f"{max_candidates}; rerun with larger capacity (deficit bound "
            f"{total_deficit} is too loose for this distribution)"
        )
    cand = np.sort(np.asarray(
        [r["value"] for r in cand_ds.take_all()], dtype=object
    ).astype(str))
    cand_ref = ray.put(cand)

    # exact recount of the candidates only (broadcast semi-join)
    def recount(batch: pa.Table) -> pa.Table:
        carr = ray.get(cand_ref)
        v = values_of(batch).astype(str)
        v = v[np.isin(v, carr)]
        u, c = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(u.astype(str)),
                         "n": pa.array(c.astype(np.int64))})

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
    )
    top = exact.sort(["n", "value"], descending=[True, False]).limit(k).to_pandas()
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["n"] = top["n"].astype(np.int64)
    return ray.data.from_pandas(top)

def pps_sample(ds, id_col: str, weight_col: str, n: int):
    """Systematic probability-proportional-to-size sampling: walk the
    id-ordered weight line W with ``n`` equally spaced picks — row r
    is selected iff an integer multiple of W/n lands inside its
    weight interval, i.e. floor(cum*n/W) > floor((cum-w)*n/W). All
    integer arithmetic (weights must be int64-safe with cum*n < 2^63):
    deterministic, exact, and expressible as one window-SQL twin.

    Distributed as a two-pass prefix-sum scan with O(#blocks) driver
    state: pass 1 collects per-block (first_id, weight_total) from the
    sorted, materialized dataset; the driver computes block prefix
    offsets (one row per BLOCK, never per row) and broadcasts them;
    pass 2 adds the block offset to each block-local cumsum and
    applies the pick predicate. Returns the selected rows (all input
    columns). Rows heavier than W/n are returned once (sample size
    can then be < n — the standard systematic-PPS convention)."""
    import ray

    sds = ds.sort(id_col).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(w) == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        return pa.table(
            {"first_id": pa.array([int(batch[id_col][0].as_py())]),
             "total": pa.array([int(w.sum())])}
        )

    stats = (
        sds.map_batches(block_stats, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("first_id")
    )
    totals = stats["total"].to_numpy()
    W = int(totals.sum())
    if W == 0:
        return sds.limit(0)
    offsets = dict(
        zip(stats["first_id"].tolist(),
            np.concatenate(([0], np.cumsum(totals)[:-1])).tolist())
    )
    off_ref = ray.put(offsets)

    def pick(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        off = ray.get(off_ref)[int(batch[id_col][0].as_py())]
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = off + np.cumsum(w)
        sel = (cum * n) // W > ((cum - w) * n) // W
        return batch.filter(pa.array(sel))

    return sds.map_batches(pick, batch_format="pyarrow", batch_size=None)

def grouped_moments(ds, key_col: str, x_col: str, y_col: str):
    """Exact per-group second-moment sums — the building block for
    mean/variance/covariance/correlation at scale: one map-side
    partial per (block, key) with (n, Sx, Sy, Sxx, Syy, Sxy) as
    int64, one bounded groupby. Inputs must be integer-valued (cast
    upstream, e.g. floor to dollars) so the sums are exact; callers
    derive corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))
    driver-side or in a finish map."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        bounds = np.concatenate(([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1))
        xo, yo = x[order], y[order]
        return pa.table(
            {
                key_col: pa.array(ks[bounds]),
                "n": pa.array(np.diff(np.concatenate((bounds, [len(ks)]))).astype(np.int64)),
                "sum_x": pa.array(np.add.reduceat(xo, bounds)),
                "sum_y": pa.array(np.add.reduceat(yo, bounds)),
                "sum_xx": pa.array(np.add.reduceat(xo * xo, bounds)),
                "sum_yy": pa.array(np.add.reduceat(yo * yo, bounds)),
                "sum_xy": pa.array(np.add.reduceat(xo * yo, bounds)),
            }
        )

    names = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(*[Sum(c, alias_name=c) for c in names])
    )


def skyline2d(ds, id_col: str, x_col: str, y_col: str):
    """Global 2-D skyline (Pareto front, minimize both axes) of points
    with DISTINCT x: a row survives iff its y is strictly below every
    y at smaller x. Same distributed prefix-scan shape as
    ``pps_sample``: sort by x, collect per-block (first_x, min_y) —
    O(#blocks) driver state — broadcast prefix minima, filter each
    block against its offset + local running min."""
    import ray

    sds = ds.sort(x_col).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"first_x": pa.array([], pa.int64()),
                             "min_y": pa.array([], pa.int64())})
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"first_x": pa.array([int(batch[x_col][0].as_py())]),
             "min_y": pa.array([int(y.min())])}
        )

    stats = (
        sds.map_batches(block_stats, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("first_x")
    )
    mins = stats["min_y"].to_numpy()
    prefix = np.concatenate(([np.iinfo(np.int64).max],
                             np.minimum.accumulate(mins)[:-1]))
    offsets = dict(zip(stats["first_x"].tolist(), prefix.tolist()))
    off_ref = ray.put(offsets)

    def pick(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        before = ray.get(off_ref)[int(batch[x_col][0].as_py())]
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        run = np.concatenate(([before], np.minimum.accumulate(y)[:-1]))
        run = np.minimum(run, before)
        return batch.filter(pa.array(y < run))

    return sds.map_batches(pick, batch_format="pyarrow", batch_size=None)

def exact_order_stats(ds, col: str, percents: list[int],
                      rank_fn=None):
    """EXACT global order statistics (p-th percentile by rank
    ``r = max(1, n*p // 100)``) of an integer column — no sketch, no
    approximation: one distributed sort, a per-block (min, max, n)
    stats pass (O(#blocks) driver state), then each block emits the
    requested ranks it owns by local position. Blocks are contiguous
    ranges of the sorted order, so ordering their stats by (min, max)
    reconstructs the global layout; when equal values straddle a
    block boundary the ambiguous ranks all carry the tie value, so
    duplicates (two identical all-tie blocks claiming one offset) are
    collapsed by a final Min groupby without affecting the value.
    Returns (p, rank, value)."""
    from ray.data.aggregate import Min

    import ray

    sds = ds.sort(col).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = batch[col].to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([int(v[0])]),
                         "mx": pa.array([int(v[-1])]),
                         "n": pa.array([len(v)])})

    stats = (
        sds.map_batches(block_stats, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["mn", "mx"])
    )
    n_total = int(stats["n"].sum())
    # rank_fn(label, n_total) -> 1-based rank; the default is the
    # percentile-disc rank. percentile_cont-style callers pass their
    # own labels + ranks (see queries.q_percentile_cont).
    if rank_fn is None:
        ranks = {p: max(1, n_total * p // 100) for p in percents}
    else:
        ranks = {p: rank_fn(p, n_total) for p in percents}
    offs = np.concatenate(([0], np.cumsum(stats["n"].to_numpy())[:-1]))
    # two blocks can only share (mn, mx, n) when they are all-tie
    # ranges (contiguity forces mn == mx); colliding blocks get the
    # UNION span so no rank is orphaned — every rank inside it carries
    # the tie value, and the final Min groupby collapses duplicates
    offsets: dict = {}
    for o, (_, r) in zip(offs.tolist(), stats.iterrows()):
        key = (int(r.mn), int(r.mx), int(r.n))
        lo_end = (int(o), int(o) + int(r.n))
        if key in offsets:
            prev = offsets[key]
            offsets[key] = (min(prev[0], lo_end[0]), max(prev[1], lo_end[1]))
        else:
            offsets[key] = lo_end
    off_ref = ray.put((offsets, ranks))

    def pick(batch: pa.Table) -> pa.Table:
        empty = pa.table({"p": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "value": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        offsets_d, ranks_d = ray.get(off_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        o, end = offsets_d[(int(v[0]), int(v[-1]), len(v))]
        tie_span = end - o != len(v)  # union of colliding all-tie blocks
        out_p, out_r, out_v = [], [], []
        for p, r in ranks_d.items():
            if o < r <= end:
                out_p.append(p)
                out_r.append(r)
                out_v.append(int(v[0]) if tie_span else int(v[r - o - 1]))
        if not out_p:
            return empty
        return pa.table({"p": pa.array(out_p, pa.int64()),
                         "rank": pa.array(out_r, pa.int64()),
                         "value": pa.array(out_v, pa.int64())})

    picked = sds.map_batches(pick, batch_format="pyarrow", batch_size=None)
    # collapse tie-block duplicates (values identical by construction)
    return (
        picked.groupby("p")
        .aggregate(Min("rank", alias_name="rank"), Min("value", alias_name="value"))
    )


def grouped_order_stats(ds, key_col: str, col: str, percents: list[int]):
    """EXACT per-group order statistics (percentile_disc rank
    ``r = max(1, ceil(n*p/100))`` of an integer column) — the
    per-group variant of ``exact_order_stats``, same distributed
    shape: ONE sort by ``[key_col, col]``, then each block resolves
    the key-runs strictly INTERIOR to it locally (a run bounded by
    other rows on both sides is a complete group: the global sort
    makes a key's rows contiguous), while runs touching a block edge
    (<= 2 per block, so O(#blocks) driver state regardless of group
    count) get their within-group offsets from a tiny driver pass and
    emit only the ranks they own. No task ever holds a whole
    spanning group; no group's raw rows ride through the driver.

    Tie ambiguity: two edge runs of one key sharing (mn, mx, n) must
    be all-tie ranges (contiguity in the sorted order forces
    mn == mx), so colliding runs take the UNION span and every
    ambiguous rank carries the tie value; a final Min groupby
    collapses the duplicates without affecting values (same argument
    as ``exact_order_stats``).

    Returns a Dataset of (``key_col``, p, rank, value, n)."""
    from ray.data.aggregate import Min

    import ray

    from osmray.windows import _runs

    sds = ds.sort([key_col, col]).materialize()

    def _ranks(n: int) -> dict:
        return {p: max(1, -((-n * p) // 100)) for p in percents}

    def edge_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                          "mn": pa.array([], pa.int64()),
                          "mx": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        kk = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[col].to_numpy(zero_copy_only=False)
        b = _runs(kk)
        rows = []
        for i in (0, len(b) - 2):  # first and last run of the block
            lo, hi = int(b[i]), int(b[i + 1])
            rows.append((lo, hi))
            if len(b) == 2:
                break  # single-run block: first IS last
        idx = sorted(set(rows))
        return pa.table({
            key_col: pa.array([kk[lo] for lo, _ in idx]),
            "mn": pa.array([int(v[lo]) for lo, _ in idx], pa.int64()),
            "mx": pa.array([int(v[hi - 1]) for _, hi in idx], pa.int64()),
            "n": pa.array([hi - lo for lo, hi in idx], pa.int64()),
        })

    stats = (
        sds.map_batches(edge_partials, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values([key_col, "mn", "mx"], kind="stable")
    )
    # per-key offsets: a key's edge runs, ordered by (mn, mx), are its
    # consecutive sorted slices; colliding signatures take union spans
    offsets: dict = {}
    totals: dict = {}
    for kv, g in stats.groupby(key_col, sort=False):
        ns = g["n"].to_numpy()
        offs = np.concatenate(([0], np.cumsum(ns)[:-1]))
        totals[kv] = int(ns.sum())
        for o, (_, r) in zip(offs.tolist(), g.iterrows()):
            sig = (kv, int(r.mn), int(r.mx), int(r.n))
            span = (int(o), int(o) + int(r.n))
            if sig in offsets:
                prev = offsets[sig]
                offsets[sig] = (min(prev[0], span[0]), max(prev[1], span[1]))
            else:
                offsets[sig] = span
    off_ref = ray.put((offsets, totals))

    def pick(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key_col).type if len(batch) else pa.int64()
        empty = pa.table({key_col: pa.array([], ktype),
                          "p": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "value": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        offsets_d, totals_d = ray.get(off_ref)
        kk = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[col].to_numpy(zero_copy_only=False)
        b = _runs(kk)
        out_k, out_p, out_r, out_v, out_n = [], [], [], [], []
        for i in range(len(b) - 1):
            lo, hi = int(b[i]), int(b[i + 1])
            kv = kk[lo]
            if lo > 0 and hi < len(kk):
                # interior run == complete group: resolve locally
                n = hi - lo
                for p, r in _ranks(n).items():
                    out_k.append(kv)
                    out_p.append(p)
                    out_r.append(r)
                    out_v.append(int(v[lo + r - 1]))
                    out_n.append(n)
                continue
            o, end = offsets_d[(kv, int(v[lo]), int(v[hi - 1]), hi - lo)]
            tie_span = end - o != hi - lo
            n = totals_d[kv]
            for p, r in _ranks(n).items():
                if o < r <= end:
                    out_k.append(kv)
                    out_p.append(p)
                    out_r.append(r)
                    out_v.append(int(v[lo]) if tie_span else int(v[lo + r - o - 1]))
                    out_n.append(n)
        return pa.table({key_col: pa.array(out_k, ktype),
                         "p": pa.array(out_p, pa.int64()),
                         "rank": pa.array(out_r, pa.int64()),
                         "value": pa.array(out_v, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    picked = sds.map_batches(pick, batch_format="pyarrow", batch_size=None)
    return picked.groupby([key_col, "p"]).aggregate(
        Min("rank", alias_name="rank"),
        Min("value", alias_name="value"),
        Min("n", alias_name="n"),
    )


def bag_set_ops(a_ds, b_ds, key: str):
    """Multiset INTERSECT ALL / EXCEPT ALL cardinalities per key:
    returns (key, n_int, n_exc) over the distinct keys of side A,
    where n_int = min(count_a, count_b) (the INTERSECT ALL
    multiplicity) and n_exc = count_a - n_int (the EXCEPT ALL
    multiplicity). Bag semantics reduce to keyed counts, so each side
    pre-aggregates per block (one np.unique per batch) and ONE keyed
    groupby folds both sides — raw rows never shuffle."""
    from ray.data.aggregate import Sum

    def partial(col_n: str):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            u, c = np.unique(k, return_counts=True)
            z = np.zeros(len(u), dtype=np.int64)
            na = c if col_n == "na" else z
            return pa.table({key: pa.array(u), "na": pa.array(na),
                             "nb": pa.array(c if col_n == "nb" else z)})
        return f

    both = (a_ds.map_batches(partial("na"), batch_format="pyarrow")
            .union(b_ds.map_batches(partial("nb"), batch_format="pyarrow")))
    sums = both.groupby(key).aggregate(Sum("na", alias_name="na"),
                                       Sum("nb", alias_name="nb"))

    def emit(batch: pa.Table) -> pa.Table:
        na = batch["na"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = batch["nb"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = na > 0
        ni = np.minimum(na, nb)[keep]
        return pa.table({key: batch[key].filter(pa.array(keep)),
                         "n_int": pa.array(ni),
                         "n_exc": pa.array(na[keep] - ni)})

    return sums.map_batches(emit, batch_format="pyarrow")


def cube_agg(ds, c1: str, c2: str, val_col: str, all_token: str = "ALL"):
    """GROUP BY CUBE(c1, c2) with count + sum(val): each block first
    collapses to its distinct (c1, c2) partial rows, THEN expands x4
    into the cube lattice (value/ALL x value/ALL), so the single keyed
    groupby shuffles 4 x (distinct pairs per block) rows — the
    pre-aggregated CUBE plan. NULL-free inputs; the rolled-up level is
    encoded as ``all_token`` exactly like COALESCE in the SQL twin."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        a = batch[c1].to_numpy(zero_copy_only=False)
        b = batch[c2].to_numpy(zero_copy_only=False)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pair = np.char.add(np.char.add(a.astype("U"), "|"), b.astype("U"))
        u, inv = np.unique(pair, return_inverse=True)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        sv = np.bincount(inv, weights=v, minlength=len(u)).astype(np.int64)
        ua = np.array([s.split("|", 1)[0] for s in u.tolist()])
        ub = np.array([s.split("|", 1)[1] for s in u.tolist()])
        allv = np.repeat(all_token, len(u)).astype("U")
        outs = []
        for va, vb in ((ua, ub), (ua, allv), (allv, ub), (allv, allv)):
            # collapse this lattice level within the block before
            # shuffling (the ALL/ALL level becomes one row per block)
            lk = np.char.add(np.char.add(va.astype("U"), "|"),
                             vb.astype("U"))
            lu, linv = np.unique(lk, return_inverse=True)
            outs.append(pa.table({
                "k": pa.array(lu),
                "n": pa.array(np.bincount(linv, weights=cnt,
                                          minlength=len(lu)).astype(np.int64)),
                "val_sum": pa.array(np.bincount(linv, weights=sv,
                                                minlength=len(lu)).astype(np.int64))}))
        return pa.concat_tables(outs)

    sums = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("n", alias_name="n"),
                                    Sum("val_sum", alias_name="val_sum")))

    def split(batch: pa.Table) -> pa.Table:
        ks = batch["k"].to_pylist()
        a = [s.split("|", 1)[0] for s in ks]
        b = [s.split("|", 1)[1] for s in ks]
        return pa.table({
            c1: pa.array(a, pa.string()), c2: pa.array(b, pa.string()),
            "n": batch["n"].cast(pa.int64()),
            "val_sum": batch["val_sum"].cast(pa.int64())})

    return sums.map_batches(split, batch_format="pyarrow")


def cooccur_pairs(ds, key: str, item: str, min_count: int = 2,
                  max_pairs_per_key: int | None = 20_000_000):
    """Market-basket co-occurrence: counts of unordered DISTINCT item
    pairs appearing under the same key (a < b), kept at
    count >= min_count. The group-local self-join is fully
    vectorized: one global sort by (key, item) makes every group a
    contiguous run with sorted, adjacent-deduped items; complete
    in-block runs expand to pair indices with pure index arithmetic
    (cnt = position-in-run; left = run_start + within), and only the
    <= 2 runs touching each block edge go through the per-key fix-up
    (group count O(#blocks)). Pair counts fold in ONE keyed groupby
    over packed (a << 32 | b) keys — raw rows shuffle once (the
    sort), pairs once.

    The expansion is inherently sum(n_k^2) over key group sizes: ONE
    hot key (a celebrity common-neighbor, a mega-basket) with 1e6
    distinct items would expand ~5e11 pair indexes inside a single
    task. ``max_pairs_per_key`` makes that fail LOUDLY (naming the
    hot key) instead of grinding the task to an OOM: pre-split the
    hot baskets, salt the key (pair counts then need a cross-salt
    fix-up, see the triangles docstring in graph.py for the recipe),
    or raise/None the cap if the blow-up is intended.
    """
    import pyarrow.compute as _pc

    def _guard(hot_key: int, k_items: int, where: str) -> None:
        raise RuntimeError(
            f"cooccur_pairs: key {hot_key} holds {k_items} distinct "
            f"items -> {k_items * (k_items - 1) // 2} pairs, over "
            f"max_pairs_per_key={max_pairs_per_key} (in {where}). "
            f"This single group would dominate the pair expansion "
            f"(sum n_k^2 pathology). Remedies: filter or split the "
            f"hot group upstream, salt the key and fix up cross-salt "
            f"pairs, or pass a larger / None cap if the cost is "
            f"intended.")

    def gen(kk, it):
        """Pairs within runs of kk (sorted, may contain dups)."""
        keep = np.concatenate(
            ([True], (kk[1:] != kk[:-1]) | (it[1:] != it[:-1])))
        kk, it = kk[keep], it[keep]
        b = np.concatenate(
            ([0], np.flatnonzero(kk[1:] != kk[:-1]) + 1, [len(kk)]))
        if max_pairs_per_key is not None and len(b) > 1:
            lens = np.diff(b)
            hot = int(lens.argmax())
            m = int(lens[hot])
            if m * (m - 1) // 2 > max_pairs_per_key:
                _guard(int(kk[b[hot]]), m, "in-block run expansion")
        starts = np.repeat(b[:-1], np.diff(b))
        pos = np.arange(len(kk), dtype=np.int64) - starts
        total = int(pos.sum())
        if total == 0:
            return (np.empty(0, dtype=np.int64),) * 2
        off = np.concatenate(([0], np.cumsum(pos)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(off, pos)
        left = np.repeat(starts, pos) + within
        right = np.repeat(np.arange(len(kk), dtype=np.int64), pos)
        return it[left], it[right]

    def local(batch: pa.Table) -> pa.Table:
        kk = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        it = batch[item].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(kk)
        if n == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "bk": pa.array([], pa.int64()),
                             "bi": pa.array([], pa.int64()),
                             "edge": pa.array([], pa.bool_())})
        b = np.concatenate(
            ([0], np.flatnonzero(kk[1:] != kk[:-1]) + 1, [n]))
        lo_c = int(b[1]) if len(b) > 2 else n  # first complete run start
        hi_c = int(b[-2]) if len(b) > 2 else 0
        out_pk = np.empty(0, dtype=np.int64)
        if hi_c > lo_c:
            a_it, b_it = gen(kk[lo_c:hi_c], it[lo_c:hi_c])
            out_pk = (a_it << 32) | b_it
        edge = (np.arange(n) < lo_c) | (np.arange(n) >= hi_c)
        return pa.table({
            "pk": pa.array(np.concatenate(
                (out_pk, np.zeros(int(edge.sum()), dtype=np.int64)))),
            "c": pa.array(np.concatenate(
                (np.ones(len(out_pk), dtype=np.int64),
                 np.zeros(int(edge.sum()), dtype=np.int64)))),
            "bk": pa.array(np.concatenate(
                (np.zeros(len(out_pk), dtype=np.int64), kk[edge]))),
            "bi": pa.array(np.concatenate(
                (np.zeros(len(out_pk), dtype=np.int64), it[edge]))),
            "edge": pa.array(np.concatenate(
                (np.zeros(len(out_pk), dtype=bool),
                 np.ones(int(edge.sum()), dtype=bool)))),
        })

    rows = ds.sort([key, item]).map_batches(
        local, batch_format="pyarrow", batch_size=None).materialize()

    direct = rows.map_batches(
        lambda t: t.filter(_pc.invert(t["edge"])).select(["pk", "c"]),
        batch_format="pyarrow")

    def fix(g: pa.Table) -> pa.Table:
        it = np.unique(g["bi"].to_numpy(zero_copy_only=False))
        k = len(it)
        if k < 2:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        if max_pairs_per_key is not None and k * (k - 1) // 2 > max_pairs_per_key:
            _guard(int(g["bk"][0].as_py()), k, "block-edge fix-up group")
        I, J = np.triu_indices(k, 1)
        pk = (it[I] << 32) | it[J]
        return pa.table({"pk": pa.array(pk),
                         "c": pa.array(np.ones(len(pk), dtype=np.int64))})

    fixup = (rows.map_batches(
        lambda t: t.filter(t["edge"]), batch_format="pyarrow")
        .groupby("bk").map_groups(fix, batch_format="pyarrow"))

    # pair-count fold: Ray's generic aggregate pays per-GROUP Python
    # overhead — ruinous at ~1 distinct pair per row (measured 37 s
    # for 1.2M pairs at sf0.1); the sorted-scan fold does it
    # vectorized (see sorted_fold_sums below).
    counts = sorted_fold_sums(direct.union(fixup), "pk", ["c"])

    def emit(batch: pa.Table) -> pa.Table:
        pk = batch["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nn >= min_count
        return pa.table({"a": pa.array(pk[keep] >> 32),
                         "b": pa.array(pk[keep] & 0xFFFFFFFF),
                         "n": pa.array(nn[keep])})

    return counts.map_batches(emit, batch_format="pyarrow")


def sorted_fold_sums(ds, key_col: str, val_cols: list[str]):
    """Keyed integer-sum fold for HIGH-CARDINALITY keys — see
    :func:`sorted_fold` (this is the all-``sum`` special case kept
    for the many existing call sites)."""
    return sorted_fold(ds, key_col, val_cols, ["sum"] * len(val_cols))


def _fold_col(inv: np.ndarray, nu: int, v: np.ndarray, op: str) -> np.ndarray:
    if op == "sum":
        # bincount accumulates in float64 — exact only while every
        # partial sum stays under 2^53. Large-magnitude values (e.g.
        # 40-bit content digests) take the slower int64 scatter-add,
        # which is exact at any magnitude (found via q_merkle: a
        # 3.3e16 root rounded by 8).
        if len(v) and int(np.abs(v).max()) > (1 << 36):
            out = np.zeros(nu, np.int64)
            np.add.at(out, inv, v)
            return out
        return np.bincount(inv, weights=v, minlength=nu).astype(np.int64)
    out = np.full(nu, np.iinfo(np.int64).max if op == "min"
                  else np.iinfo(np.int64).min, dtype=np.int64)
    (np.minimum if op == "min" else np.maximum).at(out, inv, v)
    return out


def sorted_fold(ds, key_col: str, val_cols: list[str], ops: list[str]):
    """Keyed integer fold (``sum`` / ``min`` / ``max`` per column) for
    HIGH-CARDINALITY keys: Ray's generic aggregate pays per-GROUP
    overhead, ruinous when groups approach row count. This is the
    vectorized alternative: sort by key, per-block np.unique + bincount
    (or ufunc.at extrema) partials (interior keys are final — a key
    spanning blocks is necessarily the first/last distinct key of
    each), and the two edge keys per block fold in an
    O(#blocks)-group fix-up. All folds are associative+commutative, so
    partial-then-refold is exact. Emits (key_col, *val_cols)."""
    import pyarrow.compute as _pc

    if len(ops) != len(val_cols) or any(
            o not in ("sum", "min", "max") for o in ops):
        raise ValueError(f"sorted_fold: ops {ops} must match "
                         f"{val_cols} 1:1 from sum/min/max")
    by_col = dict(zip(val_cols, ops))

    def fold(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0:
            cols = {key_col: pa.array([], pa.int64()),
                    **{c: pa.array([], pa.int64()) for c in val_cols}}
            cols["__edge"] = pa.array([], pa.bool_())
            return pa.table(cols)
        u, inv = np.unique(k, return_inverse=True)
        cols = {key_col: pa.array(u)}
        for c in val_cols:
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
            cols[c] = pa.array(_fold_col(inv, len(u), v, by_col[c]))
        edge = np.zeros(len(u), dtype=bool)
        edge[0] = True
        edge[-1] = True
        cols["__edge"] = pa.array(edge)
        return pa.table(cols)

    folded = ds.sort(key_col).map_batches(
        fold, batch_format="pyarrow", batch_size=None).materialize()

    interior = folded.map_batches(
        lambda t: t.filter(_pc.invert(t["__edge"])).drop_columns(["__edge"]),
        batch_format="pyarrow")

    _red = {"sum": np.sum, "min": np.min, "max": np.max}

    def fix(g: pa.Table) -> pa.Table:
        cols = {key_col: g[key_col].slice(0, 1)}
        for c in val_cols:
            cols[c] = pa.array(
                [int(_red[by_col[c]](g[c].to_numpy(zero_copy_only=False)))],
                pa.int64())
        return pa.table(cols)

    boundary = (folded.map_batches(
        lambda t: t.filter(t["__edge"]).drop_columns(["__edge"]),
        batch_format="pyarrow")
        .groupby(key_col).map_groups(fix, batch_format="pyarrow"))

    return interior.union(boundary)


def best_split_stump(ds, feat_col: str, label_col: str):
    """EXACT best-threshold decision stump over an integer feature
    and a 0/1 label — the feature-screening / tree-induction
    primitive. Maximizes split ACCURACY
    ``max(posL, nL-posL) + max(posR, nR-posR)`` for the partition
    ``feat <= t`` over every distinct feature value t (pure integers,
    no Gini floats). Plan: per-block (feat -> n, pos) partials, one
    high-cardinality ``sorted_fold`` (distinct feats thereafter
    globally unique), a distributed prefix-scan over the sorted feats
    (block-local cumsum + O(#blocks) driver offsets keyed by block
    min — unique feats mean block mins never collide), a per-block
    argmax, then a keys-only global sort+limit(1). Tie-break: max
    acc, then min threshold. Returns a 1-row Dataset
    (threshold, acc, n_left, pos_left)."""
    import ray

    def partials(batch: pa.Table) -> pa.Table:
        f = batch[feat_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u, inv = np.unique(f, return_inverse=True)
        return pa.table({
            "feat": pa.array(u),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "pos": pa.array(np.bincount(inv, weights=y).astype(np.int64))})

    agg = sorted_fold_sums(ds.map_batches(partials, batch_format="pyarrow"),
                           "feat", ["n", "pos"])
    sds = agg.sort("feat").materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        f = batch["feat"].to_numpy(zero_copy_only=False)
        return pa.table({
            "mn": pa.array([int(f[0])]),
            "n": pa.array([int(batch["n"].to_numpy(
                zero_copy_only=False).sum())]),
            "pos": pa.array([int(batch["pos"].to_numpy(
                zero_copy_only=False).sum())])})

    stats = (sds.map_batches(block_stats, batch_format="pyarrow",
                             batch_size=None)
             .to_pandas().sort_values("mn"))
    n_tot = int(stats["n"].sum())
    p_tot = int(stats["pos"].sum())
    offs_n = np.concatenate(([0], np.cumsum(stats["n"].to_numpy())[:-1]))
    offs_p = np.concatenate(([0], np.cumsum(stats["pos"].to_numpy())[:-1]))
    off_ref = ray.put({int(m): (int(a), int(b)) for m, a, b in zip(
        stats["mn"], offs_n, offs_p)})

    def block_best(batch: pa.Table) -> pa.Table:
        empty = pa.table({"threshold": pa.array([], pa.int64()),
                          "acc": pa.array([], pa.int64()),
                          "n_left": pa.array([], pa.int64()),
                          "pos_left": pa.array([], pa.int64())})
        if len(batch) == 0:
            return empty
        f = batch["feat"].to_numpy(zero_copy_only=False).astype(np.int64)
        on, op = ray.get(off_ref)[int(f[0])]
        nl = np.cumsum(batch["n"].to_numpy(zero_copy_only=False)) + on
        pl = np.cumsum(batch["pos"].to_numpy(zero_copy_only=False)) + op
        acc = (np.maximum(pl, nl - pl)
               + np.maximum(p_tot - pl, (n_tot - nl) - (p_tot - pl)))
        i = np.lexsort((f, -acc))[0]
        return pa.table({"threshold": pa.array([int(f[i])]),
                         "acc": pa.array([int(acc[i])]),
                         "n_left": pa.array([int(nl[i])]),
                         "pos_left": pa.array([int(pl[i])])})

    return (sds.map_batches(block_best, batch_format="pyarrow",
                            batch_size=None)
            .sort(["acc", "threshold"], descending=[True, False]).limit(1))


def epoch_shuffle(ds, id_col: str = "doc_id", seed: int = 17,
                  shard_size: int = 1024):
    """Deterministic epoch shuffle for training — the global-order
    primitive every 1e12-row dataloader needs: rows rank by
    (hash64(id, seed), id) — a seeded permutation that is stable,
    resumable, and reproducible across runs — then chunk into shards
    of ``shard_size`` with an in-shard position. One distributed sort
    + the block-offset prefix pattern (blocks are contiguous ranges
    of the hash order, identified by their first (h, id) pair — ids
    unique, so never colliding); O(#blocks) driver state. Emits
    (id, shard, pos); writing shard-partitioned output from it gives
    byte-identical epochs on any cluster size."""
    import ray

    from osmray.stages import hash64

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: pa.array(ids),
                         "h": pa.array(hash64(ids, seed))})

    sds = (ds.select_columns([id_col])
           .map_batches(hashed, batch_format="pyarrow")
           .sort(["h", id_col]).materialize())

    def block_stats(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"h0": pa.array([], pa.int64()),
                             "i0": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        h = batch["h"].to_numpy(zero_copy_only=False)
        ii = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"h0": pa.array([int(h[0])]),
                         "i0": pa.array([int(ii[0])]),
                         "n": pa.array([len(h)])})

    stats = (sds.map_batches(block_stats, batch_format="pyarrow",
                             batch_size=None)
             .to_pandas().sort_values(["h0", "i0"]))
    offs = np.concatenate(([0], np.cumsum(stats["n"].to_numpy())[:-1]))
    off_ref = ray.put({(int(h), int(i)): int(o) for h, i, o in zip(
        stats["h0"], stats["i0"], offs)})

    def emit(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        ii = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(off_ref)[(int(h[0]), int(ii[0]))]
        rk = np.arange(len(h), dtype=np.int64) + base
        return pa.table({id_col: pa.array(ii),
                         "shard": pa.array(rk // shard_size),
                         "pos": pa.array(rk % shard_size)})

    return sds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def profile_columns(ds, cols: list[str]):
    """Catalog-style profile of integer columns: per column (n, min,
    max) from per-block partials plus an EXACT distinct count, all
    columns in ONE keyed fold over (col_id << 48 | value) packed keys
    (values must fit 48 bits — typed error otherwise). The driver
    sees O(#columns) rows; nothing else leaves the shuffle. Extracted
    from q_profile for declarative-step reuse (reference parity:
    there is no profiling in shrddr/osmml; engine add)."""
    cols = list(cols)

    def stat_partials(batch: pa.Table) -> pa.Table:
        mins, maxs, ns = [], [], []
        for name in cols:
            v = batch[name].to_numpy(zero_copy_only=False).astype(np.int64)
            mins.append(v.min() if len(v) else 0)
            maxs.append(v.max() if len(v) else 0)
            ns.append(len(v))
        return pa.table({
            "col_id": pa.array(np.arange(len(cols), dtype=np.int64)),
            "n": pa.array(np.asarray(ns, np.int64)),
            "mn": pa.array(np.asarray(mins, np.int64)),
            "mx": pa.array(np.asarray(maxs, np.int64))})

    def key_partials(batch: pa.Table) -> pa.Table:
        kparts = []
        for ci, name in enumerate(cols):
            v = batch[name].to_numpy(zero_copy_only=False).astype(np.int64)
            # typed (survives python -O): out-of-range values would
            # silently alias packed (col_id << 48 | value) keys
            if len(v) and not ((v >= 0).all() and (v < 1 << 48).all()):
                raise ValueError(
                    f"profile_columns: column {name!r} has values outside "
                    f"[0, 2^48) — they would alias packed profile keys; "
                    f"widen the packing or pre-normalize the column")
            kparts.append(np.unique(v) | (np.int64(ci) << 48))
        k = np.concatenate(kparts) if kparts else np.array([], np.int64)
        return pa.table({"k": pa.array(k),
                         "one": pa.array(np.ones(len(k), np.int64))})

    stats = sorted_fold(
        ds.map_batches(stat_partials, batch_format="pyarrow"),
        "col_id", ["n", "mn", "mx"], ["sum", "min", "max"])
    dk = sorted_fold_sums(
        ds.map_batches(key_partials, batch_format="pyarrow"), "k", ["one"])

    def dist_partials(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci, cnt = np.unique(k >> 48, return_counts=True)
        return pa.table({"col_id": pa.array(ci),
                         "n_distinct": pa.array(cnt.astype(np.int64))})

    nd = sorted_fold_sums(
        dk.map_batches(dist_partials, batch_format="pyarrow"),
        "col_id", ["n_distinct"])
    nd_map = {r["col_id"]: r["n_distinct"] for r in nd.take_all()}

    def finish(batch: pa.Table) -> pa.Table:
        ci = batch["col_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "col_name": pa.array([cols[i] for i in ci]),
            "n": batch["n"].cast(pa.int64()),
            "mn": batch["mn"].cast(pa.int64()),
            "mx": batch["mx"].cast(pa.int64()),
            "n_distinct": pa.array([nd_map[int(i)] for i in ci],
                                   pa.int64())})

    return stats.map_batches(finish, batch_format="pyarrow")


def assoc_rules(ds, key: str, item: str, min_count: int = 2,
                conf_num: int = 1, conf_den: int = 10,
                item_bits: int = 21):
    """Association rules over (key, item) baskets — the A-Priori
    completion of :func:`cooccur_pairs`: from pair supports n_ab and
    item supports n_a, emit DIRECTED rules lhs -> rhs with the
    integer-exact confidence gate ``n_ab * conf_den >= n_a *
    conf_num`` (conf >= conf_num/conf_den, no float division) plus
    the components (n_ab, n_a) so lift is derivable. Item supports
    attach by one grace join per rule side — the bounded rule set,
    never the basket table, leaves the shuffle. ``item`` values must
    fit ``item_bits`` bits (packed (key << item_bits | item) distinct
    dedup)."""
    from osmray.joins import bucketed_join

    pairs = cooccur_pairs(ds, key, item, min_count=min_count)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"lhs": pa.array(np.concatenate([a, b])),
                         "rhs": pa.array(np.concatenate([b, a])),
                         "n_ab": pa.array(np.concatenate([n, n]))})

    rules = pairs.map_batches(both_dirs, batch_format="pyarrow")

    def pack(batch: pa.Table) -> pa.Table:
        o = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch[item].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(p) and int(p.max()) >= (1 << item_bits):
            raise ValueError(
                f"assoc_rules: item values exceed item_bits={item_bits} "
                f"— distinct (key,item) packing would alias; raise item_bits")
        return pa.table({"pk": pa.array(np.unique((o << item_bits) | p))})

    # distinct (key, item) via the sorted-fold idiom, NOT Ray's
    # generic groupby-Count: per-GROUP Python overhead at ~1 distinct
    # pk per row is the measured-ruinous pattern (see cooccur_pairs);
    # MIN over per-block-unique pks is a pure dedup, then one more
    # fold counts distinct keys per item
    dpk = sorted_fold(
        ds.map_batches(pack, batch_format="pyarrow").map_batches(
            lambda b: b.append_column(
                "one", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow"),
        "pk", ["one"], ["min"])
    supp = sorted_fold_sums(dpk.map_batches(
        lambda b: pa.table({
            "item": pa.array(b["pk"].to_numpy(
                zero_copy_only=False) & ((1 << item_bits) - 1)),
            "n_a": b["one"]}),
        batch_format="pyarrow"), "item", ["n_a"])

    j = bucketed_join(rules, supp, on="lhs", right_on="item",
                      num_buckets=16)

    def gate(batch: pa.Table) -> pa.Table:
        lhs = batch["lhs"].to_numpy(zero_copy_only=False).astype(np.int64)
        rhs = batch["rhs"].to_numpy(zero_copy_only=False).astype(np.int64)
        nab = batch["n_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = nab * conf_den >= na * conf_num
        return pa.table({"lhs": pa.array(lhs[keep]),
                         "rhs": pa.array(rhs[keep]),
                         "n_ab": pa.array(nab[keep]),
                         "n_a": pa.array(na[keep])})

    return j.map_batches(gate, batch_format="pyarrow")
