"""Join strategies, chosen by side size (SURVEY §2.5 + ray_guide):

- ``broadcast_filter``   — semi/anti join when one side is a bounded
  KEY SET (sampling limits, canvas-bounded painted sets): ``ray.put``
  the sorted key array once, ``np.isin`` inside ``map_batches``.
  No shuffle. (Used throughout pipeline.py.)
- ``large_join``         — both sides large: Ray's hash-partitioned
  ``Dataset.join`` (shuffles both sides on the key).
- ``bucketed_join``      — the portable explicit variant: a grace
  hash join. Build side spills per-bucket parquet blocks straight
  from ``map_batches`` (no shuffle); probe side shuffles once keyed
  by ``hash(key) % B``; per-bucket arrow-native merge. No dependence
  on Dataset.join; B and skew handling are explicit (split hot keys
  by raising B).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as _pc

from osmray.stages import hash64


_SPILL_STATE: dict = {}
_FAULT_TRIGGER = "/tmp/osmray_fault_spill_trigger"


def spill_block_name() -> str:
    """Deterministic spill-file stem, stable across Ray task RETRIES:
    keyed by the Ray task id plus a per-task call sequence (the seq
    resets when a new task id enters this worker). A worker-death
    retry re-executes the task with the SAME id on a fresh worker, so
    it re-writes the SAME file names via os.replace — idempotent —
    instead of duplicating build rows the way random names would.
    (uuid4 names made every spill writer unsafe under the exact
    failure the resilience suite injects.) Unique across tasks since
    distinct tasks have distinct ids."""
    import ray

    try:
        tid = ray.get_runtime_context().get_task_id() or "driver"
    except Exception:
        tid = "driver"
    if _SPILL_STATE.get("tid") != tid:
        _SPILL_STATE["tid"] = tid
        _SPILL_STATE["seq"] = 0
    else:
        _SPILL_STATE["seq"] += 1
    return f"block-{tid}-{_SPILL_STATE['seq']}"


def _cleanup_at_exit(path: str) -> None:
    """Remove a spill directory when the driver exits (grace-join
    staging is transient; long sessions otherwise accumulate spills)."""
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, True)


def broadcast_filter(ds, key_col: str, keys: np.ndarray, anti: bool = False):
    """Semi (or anti) join against a broadcast key set."""
    import ray

    ref = ray.put(np.sort(np.asarray(keys, dtype=np.int64)))

    def f(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        hit = np.isin(k, ray.get(ref))
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(f, batch_format="pyarrow")


def _resolve_spill(spill_root: str | None, prefix: str) -> str:
    """Resolve a grace-spill directory; a node-local tempdir default
    is only valid single-node (see bucketed_join docstring)."""
    import tempfile

    if spill_root is not None:
        return spill_root
    import ray

    alive = [n for n in ray.nodes() if n.get("Alive")] if ray.is_initialized() else []
    if len(alive) > 1:
        raise ValueError(
            f"{prefix}: cluster has multiple nodes but no spill_root was "
            "given; pass a spill_root visible to every node "
            "(shared filesystem or mounted object-store path)"
        )
    spill = tempfile.mkdtemp(prefix=f"osmray_{prefix}_")
    _cleanup_at_exit(spill)
    return spill


def bucketed_filter(left, right, on: str, right_on: str | None = None, anti: bool = False,
                    num_buckets: int = 64, spill_root: str | None = None,
                    mark: str | None = None):
    """Grace semi (or anti) join FILTER on int64 keys — the unbounded
    twin of ``broadcast_filter``: neither side is ever collected to
    the driver.  With ``mark=<col>`` no row is dropped; membership is
    appended as a boolean column instead (the "mark join" used to tag
    Bloom false positives without a second pass).

    The RIGHT side's key column spills keys-only parquet per hash
    bucket straight from ``map_batches`` (no shuffle); the LEFT side
    shuffles ONCE keyed by ``hash(key) % B``; each bucket group then
    filters with a sorted ``np.isin`` against its spilled key
    partition. Duplicate right-side keys are harmless (membership
    only). Left rows whose bucket has no spilled keys pass anti /
    drop semi wholesale.

    Partitioning assumption: same as ``bucketed_join`` —
    ``spill_root`` must be visible to every node on a multi-node
    cluster (enforced: the node-local default refuses multi-node)."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    right_on = right_on or on
    spill = _resolve_spill(spill_root, "gracefilter")

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return np.abs(hash64(keys.astype(np.int64), 77)) % num_buckets

    def spill_keys(batch: pa.Table) -> pa.Table:
        k = batch[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(k) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        b = bucket_of(k)
        order = np.argsort(b, kind="stable")
        k, b = k[order], b[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(b)) + 1, [len(b)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"bucket={int(b[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"{spill_block_name()}.parquet")
            pq.write_table(pa.table({right_on: pa.array(k[lo:hi])}), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"bucket": int(b[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    right.select_columns([right_on]).map_batches(
        spill_keys, batch_format="pyarrow", batch_size=None
    ).count()

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[on].to_numpy(zero_copy_only=False))
        return batch.append_column("__bucket", pa.array(b.astype(np.int64)))

    def filt(g: pa.Table) -> pa.Table:
        bucket = int(g["__bucket"][0].as_py())
        g = g.drop_columns(["__bucket"])
        files = sorted(_glob.glob(os.path.join(spill, f"bucket={bucket}", "block-*.parquet")))
        if not files:
            if mark is not None:
                return g.append_column(mark, pa.array(np.zeros(len(g), dtype=bool)))
            return g if anti else g.slice(0, 0)
        keys = np.sort(
            pa.concat_tables([pq.read_table(f) for f in files])[right_on]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        k = g[on].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = np.isin(k, keys)
        if mark is not None:
            return g.append_column(mark, pa.array(hit))
        return g.filter(pa.array(~hit if anti else hit))

    return (
        left.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(filt, batch_format="pyarrow")
    )


def large_join(left, right, on: str, right_on: str | None = None, how: str = "inner",
               num_partitions: int = 16):
    """Hash-partitioned join of two large Datasets (Ray-native)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucketed_join(left, right, on: str, right_on: str | None = None, num_buckets: int = 64,
                  spill_root: str | None = None, right_dedup: bool = False,
                  prebuilt: bool = False, how: str = "inner"):
    """Explicit partitioned (grace) hash join on int64 keys —
    ``how="inner"`` (default), ``"left"`` (unmatched probe rows kept
    with nulls in every build-side column), ``"full"`` (additionally
    keeps unmatched BUILD rows with nulls in every probe column —
    sentinel probe rows guarantee every build bucket gets a merge
    group, and per-bucket hit-range marking finds the unmatched build
    rows without a second pass), ``"semi"`` / ``"anti"`` (probe rows
    with / without a match, probe columns only, no row
    multiplication).

    The BUILD side (``right``) never enters a Ray shuffle: each
    ``map_batches`` task splits its batch by ``hash(key) % B`` and
    appends one parquet block per bucket to a spill directory (the
    same no-shuffle pattern as the lancelike sink). The PROBE side
    (``left``) shuffles once, keyed by bucket; each bucket group then
    loads its spilled build partition and merges arrow-native
    (argsort + searchsorted + vectorized pair expansion) — no pandas,
    no null-padding, int dtypes preserved.

    Partitioning assumption: ``spill_root`` must be visible to every
    node (shared FS or object-store URI) on a multi-node cluster —
    the standard grace-join staging requirement. Skew handling is
    explicit: raise ``num_buckets`` to split hot buckets.

    ``right_dedup=True`` keeps one row per build-side key, applied
    PER BUCKET (hash partitioning co-locates every row of a key, so
    bucket-local dedup is globally exact) — this replaces an upstream
    all-to-all ``groupby`` dedup with zero extra shuffles. Use when
    the non-key columns are functionally dependent on the key (any
    representative row is the same row); otherwise the winner among
    differing duplicates is unspecified.

    ``prebuilt=True`` skips the build-side spill and reuses the
    fragments already under ``spill_root`` from a prior call with the
    same ``right``/``num_buckets`` — e.g. joining a pair table's two
    id columns against the same dimension table spills it once.
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    right_on = right_on or on
    spill = _resolve_spill(spill_root, "grace")

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        return np.abs(hash64(keys.astype(np.int64), 77)) % num_buckets

    def spill_blocks(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[right_on].to_numpy(zero_copy_only=False))
        order = np.argsort(b, kind="stable")
        batch = batch.take(pa.array(order))
        bs = b[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(bs)) + 1, [len(bs)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"bucket={int(bs[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"{spill_block_name()}.parquet")
            pq.write_table(batch.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"bucket": int(bs[lo]), "rows": hi - lo})
            # fault-injection seam for the resilience suite: die
            # mid-spill (AFTER files hit disk) exactly once, so the
            # retry must overwrite — not duplicate — them. A trigger
            # FILE (not env) because live Ray workers don't see
            # driver env mutations; it names the once-marker path.
            if os.path.exists(_FAULT_TRIGGER):
                with open(_FAULT_TRIGGER) as fh:
                    _marker = fh.read().strip()
                try:
                    fd = os.open(_marker, os.O_CREAT | os.O_EXCL)
                    os.close(fd)
                    os._exit(1)
                except FileExistsError:
                    pass
        return pa.Table.from_pylist(recs)

    # materialize the build-side spill (barrier, like any hash-join
    # build); batch_size=None = one batch per block, so the spill
    # writes ≤ num_buckets files per BLOCK, not per 1024-row batch
    bs = right.schema(fetch_if_missing=True).base_schema
    if not isinstance(bs, pa.Schema):
        # pandas-backed inputs report a PandasBlockSchema; a
        # zero-copy arrow pass-through normalizes it
        right = right.map_batches(lambda t: t, batch_format="pyarrow")
        bs = right.schema(fetch_if_missing=True).base_schema
    if not prebuilt:
        right.map_batches(spill_blocks, batch_format="pyarrow", batch_size=None).count()
    r_schema = pa.schema([f for f in bs])

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[on].to_numpy(zero_copy_only=False))
        return batch.append_column("__bucket", pa.array(b.astype(np.int64)))

    # fetch_if_missing: an aggregate-output left side reports schema
    # None until its plan is partially resolved
    l_names = set(left.schema(fetch_if_missing=True).names)
    rename = {c: (c + "_r" if c in l_names else c) for c in r_schema.names}

    def merge(g: pa.Table) -> pa.Table:
        bucket = int(g["__bucket"][0].as_py())
        g = g.drop_columns(["__bucket"])
        if how == "full":
            g = g.filter(_pc.invert(g["__sent"])).drop_columns(["__sent"])
        files = sorted(_glob.glob(os.path.join(spill, f"bucket={bucket}", "block-*.parquet")))
        out_fields = [(f.name, f.type) for f in g.schema] + [
            (rename[f.name], f.type) for f in r_schema
        ]
        if not files:
            if how in ("left", "full"):
                cols = {n: g[n] for n in g.schema.names}
                for f in r_schema:
                    cols[rename[f.name]] = pa.nulls(len(g), type=f.type)
                return pa.table(cols)
            if how == "anti":
                return g
            if how == "semi":
                return g.slice(0, 0)
            return pa.table(
                {n: pa.array([], type=t) for n, t in out_fields}
            )
        r = pa.concat_tables([pq.read_table(f) for f in files])
        if right_dedup:
            rk0 = r[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
            srt = np.argsort(rk0, kind="stable")
            first = srt[np.unique(rk0[srt], return_index=True)[1]]
            r = r.take(pa.array(first))
        lk = g[on].to_numpy(zero_copy_only=False).astype(np.int64)
        rk = r[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(rk, kind="stable")
        rks = rk[order]
        lo = np.searchsorted(rks, lk, "left")
        hi = np.searchsorted(rks, lk, "right")
        cnt = hi - lo
        if how in ("semi", "anti"):
            keep = (cnt > 0) if how == "semi" else (cnt == 0)
            return g.filter(pa.array(keep))
        # left join: unmatched probe rows survive once, their build
        # row index masked null — Table.take(null) emits a null row
        cnt_eff = np.maximum(cnt, 1) if how in ("left", "full") else cnt
        total = int(cnt_eff.sum())
        li = np.repeat(np.arange(len(lk)), cnt_eff)
        offsets = np.concatenate(([0], np.cumsum(cnt_eff)))
        within = np.arange(total) - np.repeat(offsets[:-1], cnt_eff)
        lt = g.take(pa.array(li))
        if how in ("left", "full"):
            matched = np.repeat(cnt > 0, cnt_eff)
            idx = np.minimum(np.repeat(lo, cnt_eff) + within, max(len(rks) - 1, 0))
            rt = r.take(pa.array(order[idx], mask=~matched))
        else:
            rt = r.take(pa.array(order[np.repeat(lo, cnt) + within]))
        cols = {n: lt[n] for n in lt.schema.names}
        for n in rt.schema.names:
            cols[rename[n]] = rt[n]
        out = pa.table(cols)
        if how == "full":
            # unmatched build rows: mark every sorted build position
            # covered by some probe's [lo, hi) range, take the rest
            hitd = np.zeros(len(rks) + 1, dtype=np.int64)
            m = cnt > 0
            np.add.at(hitd, lo[m], 1)
            np.add.at(hitd, hi[m], -1)
            unhit = np.cumsum(hitd[:-1]) == 0
            if unhit.any():
                ru = r.take(pa.array(order[unhit]))
                ucols = {n: pa.nulls(len(ru), type=g.schema.field(n).type)
                         for n in g.schema.names}
                for n in ru.schema.names:
                    ucols[rename[n]] = ru[n]
                out = pa.concat_tables([out, pa.table(ucols)],
                                       promote_options="permissive")
        return out

    probe = left.map_batches(add_bucket, batch_format="pyarrow")
    if how == "full":
        import ray.data as _rd

        def tag_real(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__sent", pa.array(np.zeros(len(batch), dtype=bool)))

        # post-add_bucket blocks are arrow, so base_schema is a
        # pyarrow schema even for pandas-backed inputs
        pschema = probe.schema(fetch_if_missing=True).base_schema
        sent_cols = {
            f.name: (pa.array(np.arange(num_buckets, dtype=np.int64))
                     if f.name == "__bucket"
                     else pa.nulls(num_buckets, type=f.type))
            for f in pschema}
        sent_cols["__sent"] = pa.array(np.ones(num_buckets, dtype=bool))
        sentinels = _rd.from_arrow(pa.table(sent_cols))
        probe = probe.map_batches(tag_real, batch_format="pyarrow").union(
            sentinels)
    return (
        probe
        .groupby("__bucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def _asof_ts_us(col) -> np.ndarray:
    """Arrow ts column -> exact int64 microseconds."""
    if pa.types.is_timestamp(col.type):
        return col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _asof_sorted(both, on: str, ts_col: str, left_cols: list[str],
                 right_cols: list[str], col_type: dict):
    """Sorted-scan as-of engine (see ``asof_join``): one distributed
    sort by (key, ts, right-first), in-block prefix-max matching, and
    an O(#blocks) driver carry pass for rows before a block's first
    in-block right row (at most the block-opening key run; all its
    pending rows share ONE cross-block match because every earlier
    block's rows — hence every candidate carry — time at or before
    them)."""
    import ray

    from osmray.windows import _runs

    # right rows sort BEFORE left rows at equal (key, ts): a state row
    # stamped at t is visible to an event at t (<= semantics)
    sds = both.sort([on, ts_col, "__side"],
                    descending=[False, False, True]).materialize()

    def _pend_and_carry(batch: pa.Table):
        """(first-run pending prefix bounds, last-run carry index)."""
        n = len(batch)
        kk = batch[on].to_numpy(zero_copy_only=False)
        side = batch["__side"].to_numpy(zero_copy_only=False)
        b = _runs(kk)
        # first run: left rows before the run's first right row
        lo, hi = int(b[0]), int(b[1])
        rpos = np.flatnonzero(side[lo:hi] == 1)
        cut = int(rpos[0]) if len(rpos) else hi
        pend = np.flatnonzero(side[:cut] == 0)
        # last run: its last right row feeds later blocks of the key
        llo, lhi = int(b[-2]), int(b[-1])
        lr = np.flatnonzero(side[llo:lhi] == 1)
        carry = (llo + int(lr[-1])) if len(lr) else -1
        return pend, carry

    def edge_scan(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(on).type if len(batch) else pa.int64()
        cols = {on: pa.array([], ktype), "__ts": pa.array([], pa.int64()),
                "__kind": pa.array([], pa.int8()),
                **{c: pa.array([], col_type[c]) for c in right_cols}}
        if len(batch) == 0:
            return pa.table(cols)
        ts = _asof_ts_us(batch[ts_col].combine_chunks())
        pend, carry = _pend_and_carry(batch)
        rows_k, rows_t, rows_kind, rows_idx = [], [], [], []
        if len(pend):
            rows_k.append(batch[on][int(pend[0])].as_py())
            rows_t.append(int(ts[int(pend[0])]))
            rows_kind.append(1)
            rows_idx.append(None)
        if carry >= 0:
            rows_k.append(batch[on][carry].as_py())
            rows_t.append(int(ts[carry]))
            rows_kind.append(0)
            rows_idx.append(carry)
        out = {on: pa.array(rows_k, ktype),
               "__ts": pa.array(rows_t, pa.int64()),
               "__kind": pa.array(rows_kind, pa.int8())}
        for c in right_cols:
            out[c] = pa.array(
                [None if i is None else batch[c][i].as_py() for i in rows_idx],
                col_type[c])
        return pa.table(out)

    edges = (sds.map_batches(edge_scan, batch_format="pyarrow",
                             batch_size=None).to_pandas())
    # per key: carries sorted by ts; each pending (key, t_min) takes
    # the max-ts carry <= t_min (value-based, so equal signatures from
    # different blocks agree by construction)
    assign: dict = {}
    if len(edges):
        carries = edges[edges["__kind"] == 0]
        pends = edges[edges["__kind"] == 1]
        by_key: dict = {}
        for kv, g in carries.groupby(on, sort=False):
            g = g.sort_values("__ts", kind="stable")
            by_key[kv] = (g["__ts"].to_numpy(),
                          [tuple(r[c] for c in right_cols)
                           for _, r in g.iterrows()])
        for _, r in pends.iterrows():
            hit = by_key.get(r[on])
            if hit is None:
                continue
            cts, pays = hit
            j = int(np.searchsorted(cts, int(r["__ts"]), side="right")) - 1
            if j >= 0:
                assign[(r[on], int(r["__ts"]))] = (int(cts[j]), pays[j])
    assign_ref = ray.put(assign)

    def emit(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            **{c: pa.array([], col_type[c]) for c in left_cols},
            **{f"state_{c}": pa.array([], col_type[c]) for c in right_cols},
            "gap_us": pa.array([], pa.int64())})
        n = len(batch)
        if n == 0:
            return empty
        kk = batch[on].to_numpy(zero_copy_only=False)
        side = batch["__side"].to_numpy(zero_copy_only=False)
        ts = _asof_ts_us(batch[ts_col].combine_chunks())
        b = _runs(kk)
        run_start = np.repeat(b[:-1], np.diff(b))
        ridx = np.where(side == 1, np.arange(n), -1)
        f = np.maximum.accumulate(ridx)
        valid = (side == 0) & (f >= run_start)
        li = np.flatnonzero(valid)
        pieces = []
        if len(li):
            lt = batch.take(pa.array(li))
            rt = batch.take(pa.array(f[li]))
            cols = {c: lt[c] for c in left_cols}
            for c in right_cols:
                cols[f"state_{c}"] = rt[c]
            cols["gap_us"] = pa.array(ts[li] - ts[f[li]], pa.int64())
            pieces.append(pa.table(cols))
        pend, _ = _pend_and_carry(batch)
        if len(pend):
            hit = ray.get(assign_ref).get(
                (batch[on][int(pend[0])].as_py(), int(ts[int(pend[0])])))
            if hit is not None:
                cts, pay = hit
                lt = batch.take(pa.array(pend))
                cols = {c: lt[c] for c in left_cols}
                for c, v in zip(right_cols, pay):
                    cols[f"state_{c}"] = pa.array([v] * len(pend), col_type[c])
                cols["gap_us"] = pa.array(ts[pend] - cts, pa.int64())
                pieces.append(pa.table(cols))
        if not pieces:
            return empty
        out = pa.concat_tables(pieces) if len(pieces) > 1 else pieces[0]
        return out.combine_chunks()

    return sds.map_batches(emit, batch_format="pyarrow", batch_size=None)


def asof_join(left, right, on: str = "user_id", ts_col: str = "ts",
              left_cols: list[str] | None = None, right_cols: list[str] | None = None,
              engine: str = "auto", max_group_rows: int = 500_000):
    """As-of join (inner, backward): each left row matches the right
    row of the same key with the LARGEST ``ts_col`` <= the left row's
    — the standard event-to-latest-state lookup Ray Data lacks.

    Two engines (two-engine policy, as graph.py):

    - ``grouped`` (bounded keys): both sides tagged and unioned, ONE
      keyed shuffle (``groupby(on)``) co-locates each key, and the
      per-group merge is a vectorized two-sort + ``np.searchsorted``.
      One key's full history must fit one group task.
    - ``sorted`` (unbounded keys): ONE distributed sort of the tagged
      union by ``(key, ts, right-first)``; each block then matches
      its left rows against the nearest preceding in-block right row
      (vectorized prefix-max), and ONLY the rows before a block's
      first in-block right match — at most the block-opening key run,
      whose rows all share one cross-block match — resolve through an
      O(#blocks) driver carry pass (per-block last-right records).
      No task ever holds a whole key; a hot key spanning thousands of
      blocks costs thousands of O(1) carry records, not memory.

    ``engine="auto"`` runs a keys-only per-key count fold (ints only
    shuffle) and picks ``sorted`` when the hottest key exceeds
    ``max_group_rows``.

    Right-side columns come back prefixed ``state_``; the match gap
    is emitted as ``gap_us`` (int64 microseconds, exact). Unmatched
    left rows (no state row at or before them) are dropped (inner
    semantics, matching DuckDB's ASOF JOIN).

    ``left_cols`` / ``right_cols`` may be asymmetric: each tagged side
    is null-padded to the unified column set before the union, so the
    block schemas always line up. A column named on BOTH sides must
    have the same Arrow type (checked up front)."""

    def _arrow_schema(ds) -> pa.Schema:
        base = ds.schema(fetch_if_missing=True).base_schema
        if isinstance(base, pa.Schema):
            return base
        # pandas-block datasets report a PandasBlockSchema; route one
        # block through an Arrow identity map to get real Arrow types
        arrowed = ds.map_batches(lambda b: b, batch_format="pyarrow")
        return arrowed.schema(fetch_if_missing=True).base_schema

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_cols = left_cols or [c for c in lschema.names if c not in (on, ts_col)]
    right_cols = right_cols or [c for c in rschema.names if c not in (on, ts_col)]

    ltypes = {f.name: f.type for f in lschema}
    rtypes = {f.name: f.type for f in rschema}
    for c in set(left_cols) & set(right_cols):
        if ltypes[c] != rtypes[c]:
            raise ValueError(
                f"asof_join: column {c!r} kept from both sides with "
                f"mismatched types ({ltypes[c]} vs {rtypes[c]})"
            )
    # unified payload column order (left first, then right-only) so
    # both tagged sides emit byte-identical block schemas
    all_cols = list(left_cols) + [c for c in right_cols if c not in left_cols]
    col_type = {**rtypes, **ltypes}

    def tag(side: int, keep: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {on: batch[on], ts_col: batch[ts_col]}
            for c in all_cols:
                cols[c] = batch[c] if c in keep else pa.nulls(n, type=col_type[c])
            t = pa.table(cols)
            return t.append_column("__side", pa.array(np.full(n, side, dtype=np.int8)))

        return f

    lt = left.map_batches(tag(0, left_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_cols), batch_format="pyarrow")
    both = lt.union(rt)

    if engine == "auto":
        from ray.data.aggregate import Sum

        # keys-only partial count fold: per-block unique+counts, one
        # tiny keyed Sum, then a driver max — O(distinct keys) ints
        def partial(batch: pa.Table) -> pa.Table:
            import pandas as pd
            vc = pd.Series(batch[on].to_pandas()).value_counts()
            return pa.table({on: pa.array(vc.index.to_numpy()),
                             "c": pa.array(vc.to_numpy().astype(np.int64))})

        counts = (both.map_batches(partial, batch_format="pyarrow")
                  .groupby(on).aggregate(Sum("c", alias_name="c")))
        mx = counts.max("c")
        engine = "sorted" if (mx or 0) > max_group_rows else "grouped"

    if engine == "sorted":
        return _asof_sorted(both, on, ts_col, left_cols, right_cols, col_type)
    if engine != "grouped":
        raise ValueError(f"asof_join: unknown engine {engine!r}")

    def merge(g: pa.Table) -> pa.Table:
        # Arrow-native: take() preserves the declared column types, so
        # the pandas null-padding widen (int64 -> float64) can't happen
        ts = g[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        side = g["__side"].to_numpy(zero_copy_only=False)
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)
        if len(li) == 0 or len(ri) == 0:
            return pa.table(
                {
                    **{c: pa.array([], type=col_type[c]) for c in left_cols},
                    **{f"state_{c}": pa.array([], type=col_type[c])
                       for c in right_cols},
                    "gap_us": pa.array([], type=pa.int64()),
                }
            )
        rorder = ri[np.argsort(ts[ri], kind="stable")]
        rts = ts[rorder]
        idx = np.searchsorted(rts, ts[li], side="right") - 1
        ok = idx >= 0
        lm = li[ok]
        rm = rorder[idx[ok]]
        lmi, rmi = pa.array(lm), pa.array(rm)
        out = {c: g[c].take(lmi) for c in left_cols}
        for c in right_cols:
            out[f"state_{c}"] = g[c].take(rmi)
        out["gap_us"] = pa.array(ts[lm] - ts[rm], type=pa.int64())
        return pa.table(out)

    return both.groupby(on).map_groups(merge, batch_format="pyarrow")


def bloom_semi_join(left, right, on: str, right_on: str | None = None,
                    m_bits: int | None = None, num_buckets: int = 64,
                    spill_root: str | None = None, mark: str | None = None):
    """Semi join with a Bloom pre-filter: the shuffle-volume reducer
    for selective large-x-large semi joins.

    1. Build a fixed-size Bloom bitmap over the RIGHT keys
       (``sketch.bloom_build`` — mergeable per-block partials, only
       the ``m_bits/8``-byte sketch is ever broadcast).
    2. Filter the LEFT side against the broadcast bitmap inside
       ``map_batches`` — no shuffle; at a 1-5 % match rate this drops
       95+ % of probe rows before any exchange.
    3. Exact-verify the survivors with the grace ``bucketed_filter``
       (Bloom false positives are removed there; only survivors — not
       the whole probe side — pay the shuffle).

    ``mark=<col>`` keeps Bloom survivors and tags true membership in a
    boolean column instead of dropping false positives (diagnostics /
    oracle checking). Result equals the plain semi join exactly.
    """
    import ray

    from osmray.sketch import BLOOM_M_DEFAULT, bloom_build, bloom_positions

    right_on = right_on or on
    m = m_bits or BLOOM_M_DEFAULT
    bitmap_ref = ray.put(bloom_build(right, right_on, m_bits=m))

    def bloom_pass(batch: pa.Table) -> pa.Table:
        bm = ray.get(bitmap_ref)
        h1, h2 = bloom_positions(batch[on].to_numpy(zero_copy_only=False), m)
        return batch.filter(pa.array(bm[h1] & bm[h2]))

    survivors = left.map_batches(bloom_pass, batch_format="pyarrow")
    return bucketed_filter(survivors, right, on, right_on=right_on,
                           num_buckets=num_buckets, spill_root=spill_root,
                           mark=mark)

def box_overlap_join(left, right, cell_shift: int = 8, num_buckets: int = 64,
                     spill_root: str | None = None,
                     cols: tuple = ("id", "x0", "y0", "x1", "y1"),
                     min_iou: tuple[int, int] | None = None):
    """Large-x-large spatial overlap join of axis-aligned integer
    boxes (half-open [x0,x1) x [y0,y1)) — the PBSM/grid plan:

    1. each side explodes every box to its covering grid cells
       (cell edge = 2^cell_shift units); replication factor is
       box-diameter / cell-edge, pick ``cell_shift`` near the median
       box size,
    2. one grace join co-locates same-cell boxes
       (``bucketed_join`` on the packed cell key — build side spills
       once, probe shuffles once),
    3. the exact overlap predicate filters candidates, and each
       surviving pair is emitted ONLY by its reporting cell — the
       cell containing (max(ax0,bx0), max(ay0,by0)) — so duplicates
       are never produced and no distinct-shuffle is needed.

    Returns (a_id, b_id). Degenerate (empty) boxes never match.

    ``min_iou=(num, den)`` upgrades the predicate to an exact-integer
    IoU threshold (inter * den >= num * union — the detection-box
    association join); the output then also carries the integer
    ``inter`` and ``uni`` areas. Same plan, same cost: IoU is a
    per-candidate arithmetic refinement, not a new shuffle.
    """
    id_c, x0c, y0c, x1c, y1c = cols

    def explode(batch: pa.Table) -> pa.Table:
        bid = batch[id_c].to_numpy(zero_copy_only=False).astype(np.int64)
        x0 = batch[x0c].to_numpy(zero_copy_only=False).astype(np.int64)
        y0 = batch[y0c].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch[x1c].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch[y1c].to_numpy(zero_copy_only=False).astype(np.int64)
        cx0, cx1 = x0 >> cell_shift, (x1 - 1) >> cell_shift
        cy0, cy1 = y0 >> cell_shift, (y1 - 1) >> cell_shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        ri = np.repeat(np.arange(len(bid)), rep)
        total = int(rep.sum())
        off = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        cx = cx0[ri] + off // ny[ri]
        cy = cy0[ri] + off % ny[ri]
        return pa.table(
            {
                "cell": pa.array((cx << 32) | cy),
                id_c: pa.array(bid[ri]),
                x0c: pa.array(x0[ri]), y0c: pa.array(y0[ri]),
                x1c: pa.array(x1[ri]), y1c: pa.array(y1[ri]),
            }
        )

    L = left.map_batches(explode, batch_format="pyarrow")
    R = right.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_join(L, R, on="cell", right_on="cell",
                           num_buckets=num_buckets, spill_root=spill_root)

    def finish(batch: pa.Table) -> pa.Table:
        ax0 = batch[x0c].to_numpy(zero_copy_only=False)
        ay0 = batch[y0c].to_numpy(zero_copy_only=False)
        ax1 = batch[x1c].to_numpy(zero_copy_only=False)
        ay1 = batch[y1c].to_numpy(zero_copy_only=False)
        bx0 = batch[x0c + "_r"].to_numpy(zero_copy_only=False)
        by0 = batch[y0c + "_r"].to_numpy(zero_copy_only=False)
        bx1 = batch[x1c + "_r"].to_numpy(zero_copy_only=False)
        by1 = batch[y1c + "_r"].to_numpy(zero_copy_only=False)
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        overlap = (ax0 < bx1) & (bx0 < ax1) & (ay0 < by1) & (by0 < ay1)
        rcx = np.maximum(ax0, bx0) >> cell_shift
        rcy = np.maximum(ay0, by0) >> cell_shift
        report = ((rcx << 32) | rcy) == cell
        sel = overlap & report
        if min_iou is None:
            return pa.table(
                {
                    "a_id": batch[id_c].filter(pa.array(sel)),
                    "b_id": batch[id_c + "_r"].filter(pa.array(sel)),
                }
            )
        num, den = min_iou
        iw = np.minimum(ax1, bx1) - np.maximum(ax0, bx0)
        ih = np.minimum(ay1, by1) - np.maximum(ay0, by0)
        inter = np.where(sel, iw * ih, 0)
        uni = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
        sel &= inter * den >= num * uni
        keep = pa.array(sel)
        return pa.table(
            {
                "a_id": batch[id_c].filter(keep),
                "b_id": batch[id_c + "_r"].filter(keep),
                "inter": pa.array(inter[sel]),
                "uni": pa.array(uni[sel]),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")

def segment_intersection_join(left, right, cell_shift: int = 8,
                              num_buckets: int = 64,
                              spill_root: str | None = None,
                              cols: tuple = ("id", "x1", "y1", "x2", "y2")):
    """Large-x-large PROPER segment-intersection join (the
    roads-crossing spatial join): same PBSM grid plan as
    ``box_overlap_join`` — each segment explodes to the cells covering
    its bbox, one grace join co-locates candidates, and the exact
    predicate (integer cross-product orientation tests, strict signs:
    touching endpoints / collinear overlap do NOT count) filters them.
    Each surviving pair is reported only by the cell containing the
    bbox-intersection corner, so no distinct shuffle. Coordinates
    must be integers with |coord| < 2^20 (cross products stay in
    int64). Returns (a_id, b_id)."""
    id_c, x1c, y1c, x2c, y2c = cols

    def explode(batch: pa.Table) -> pa.Table:
        bid = batch[id_c].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch[x1c].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch[y1c].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch[x2c].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch[y2c].to_numpy(zero_copy_only=False).astype(np.int64)
        bx0, bx1 = np.minimum(x1, x2), np.maximum(x1, x2)
        by0, by1 = np.minimum(y1, y2), np.maximum(y1, y2)
        cx0, cx1 = bx0 >> cell_shift, bx1 >> cell_shift
        cy0, cy1 = by0 >> cell_shift, by1 >> cell_shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        ri = np.repeat(np.arange(len(bid)), rep)
        total = int(rep.sum())
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        cx = cx0[ri] + off // ny[ri]
        cy = cy0[ri] + off % ny[ri]
        return pa.table(
            {"cell": pa.array((cx << 32) | cy), id_c: pa.array(bid[ri]),
             x1c: pa.array(x1[ri]), y1c: pa.array(y1[ri]),
             x2c: pa.array(x2[ri]), y2c: pa.array(y2[ri])}
        )

    L = left.map_batches(explode, batch_format="pyarrow")
    R = right.map_batches(explode, batch_format="pyarrow")
    joined = bucketed_join(L, R, on="cell", right_on="cell",
                           num_buckets=num_buckets, spill_root=spill_root)

    def finish(batch: pa.Table) -> pa.Table:
        def col(n):
            return batch[n].to_numpy(zero_copy_only=False)

        ax1, ay1, ax2, ay2 = col(x1c), col(y1c), col(x2c), col(y2c)
        bx1, by1, bx2, by2 = (col(x1c + "_r"), col(y1c + "_r"),
                              col(x2c + "_r"), col(y2c + "_r"))
        d1 = (bx2 - bx1) * (ay1 - by1) - (by2 - by1) * (ax1 - bx1)
        d2 = (bx2 - bx1) * (ay2 - by1) - (by2 - by1) * (ax2 - bx1)
        d3 = (ax2 - ax1) * (by1 - ay1) - (ay2 - ay1) * (bx1 - ax1)
        d4 = (ax2 - ax1) * (by2 - ay1) - (ay2 - ay1) * (bx2 - ax1)
        proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
            ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
        )
        rcx = np.maximum(np.minimum(ax1, ax2), np.minimum(bx1, bx2)) >> cell_shift
        rcy = np.maximum(np.minimum(ay1, ay2), np.minimum(by1, by2)) >> cell_shift
        report = ((rcx << 32) | rcy) == batch["cell"].to_numpy(zero_copy_only=False)
        sel = proper & report
        return pa.table(
            {"a_id": batch[id_c].filter(pa.array(sel)),
             "b_id": batch[id_c + "_r"].filter(pa.array(sel))}
        )

    return joined.map_batches(finish, batch_format="pyarrow")

def pip_cell_join(points, polys, cell_shift: int = 12, num_buckets: int = 64,
                  spill_root: str | None = None,
                  point_cols: tuple = ("qid", "px", "py"),
                  poly_cols: tuple = ("pid", "xs", "ys")):
    """Large-x-large point-in-polygon JOIN — the regime where the
    feature table exceeds any broadcast index (the FeatureIndex /
    PipStage path covers the bounded-features regime): polygons
    explode to the grid cells covering their bbox, points live in
    exactly ONE cell (so results need no dedup), one grace join
    co-locates candidates, and the exact even-odd ray cast — the SAME
    half-open semantics as ``geom.points_in_ring`` (ray toward +x,
    min(y)<=py<max(y) edge span, horizontal edges skipped) — runs
    vectorized over ALL candidate pairs at once via ring offsets.
    Polygon vertices ride the spill as list<float64> columns.
    Returns (qid, pid) containment pairs."""
    qid_c, px_c, py_c = point_cols
    pid_c, xs_c, ys_c = poly_cols

    def explode_polys(batch: pa.Table) -> pa.Table:
        pid = batch[pid_c].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(batch) == 0:
            return pa.table(
                {"cell": pa.array([], pa.int64()), pid_c: pa.array([], pa.int64()),
                 xs_c: batch[xs_c], ys_c: batch[ys_c]}
            )
        xs = batch[xs_c].combine_chunks()
        ys = batch[ys_c].combine_chunks()
        offs = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        fx = xs.flatten().to_numpy(zero_copy_only=False)
        fy = ys.flatten().to_numpy(zero_copy_only=False)
        starts, ends = offs[:-1], offs[1:]
        x0 = np.minimum.reduceat(fx, starts).astype(np.int64)
        x1 = np.maximum.reduceat(fx, starts).astype(np.int64)
        y0 = np.minimum.reduceat(fy, starts).astype(np.int64)
        y1 = np.maximum.reduceat(fy, starts).astype(np.int64)
        cx0, cx1 = x0 >> cell_shift, x1 >> cell_shift
        cy0, cy1 = y0 >> cell_shift, y1 >> cell_shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        ri = np.repeat(np.arange(len(pid)), rep)
        total = int(rep.sum())
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        cx = cx0[ri] + off // ny[ri]
        cy = cy0[ri] + off % ny[ri]
        take = pa.array(ri)
        return pa.table(
            {"cell": pa.array((cx << 32) | cy),
             pid_c: pa.array(pid[ri]),
             xs_c: batch[xs_c].take(take), ys_c: batch[ys_c].take(take)}
        )

    def point_cells(batch: pa.Table) -> pa.Table:
        px = batch[px_c].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[py_c].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"cell": pa.array(((px >> cell_shift) << 32) | (py >> cell_shift)),
             qid_c: batch[qid_c], px_c: pa.array(px), py_c: pa.array(py)}
        )

    P = points.map_batches(point_cells, batch_format="pyarrow")
    G = polys.map_batches(explode_polys, batch_format="pyarrow")
    cand = bucketed_join(P, G, on="cell", right_on="cell",
                         num_buckets=num_buckets, spill_root=spill_root)

    def finish(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({qid_c: pa.array([], pa.int64()),
                             pid_c: pa.array([], pa.int64())})
        px = batch[px_c].to_numpy(zero_copy_only=False).astype(np.float64)
        py = batch[py_c].to_numpy(zero_copy_only=False).astype(np.float64)
        xs = batch[xs_c].combine_chunks()
        ys = batch[ys_c].combine_chunks()
        offs = xs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        fx = xs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        fy = ys.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(fx)
        starts, ends = offs[:-1], offs[1:]
        nxt = np.arange(1, n + 1)
        ne = ends > starts
        nxt[ends[ne] - 1] = starts[ne]
        x1e, y1e, x2e, y2e = fx, fy, fx[nxt], fy[nxt]
        lens = ends - starts
        pxe = np.repeat(px, lens)
        pye = np.repeat(py, lens)
        lo = np.minimum(y1e, y2e)
        hi = np.maximum(y1e, y2e)
        keep = y1e != y2e
        spans = (pye >= lo) & (pye < hi) & keep
        # identical expression tree to geom.points_in_ring
        t = np.where(keep, (pye - y1e) / np.where(keep, y2e - y1e, 1.0), 0.0)
        xcross = x1e + t * (x2e - x1e)
        crossing = (spans & (xcross > pxe)).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(crossing)))
        cnt = csum[ends] - csum[starts]
        inside = (cnt % 2).astype(bool)
        return pa.table(
            {qid_c: batch[qid_c].filter(pa.array(inside)),
             pid_c: batch[pid_c].filter(pa.array(inside))}
        )

    return cand.map_batches(finish, batch_format="pyarrow")

def distance_join(points, features, radius: int, cell_shift: int = 10,
                  num_buckets: int = 64, spill_root: str | None = None,
                  point_cols: tuple = ("qid", "px", "py"),
                  feat_cols: tuple = ("fid", "fx", "fy")):
    """Exact distance join: every (point, feature) pair with squared
    euclidean distance <= radius^2 — the radius-bounded cousin of kNN
    that needs NO broadcast side and NO iteration: features explode
    to the grid cells covering their radius box (replication
    (2r/cell+2)^2 — pick cell_shift ~ log2(radius)), points live in
    one cell each (pairs born deduplicated), one grace join, integer
    d^2 predicate. Returns (qid, fid, d2)."""
    qid_c, px_c, py_c = point_cols
    fid_c, fx_c, fy_c = feat_cols

    def explode_feats(batch: pa.Table) -> pa.Table:
        fid = batch[fid_c].to_numpy(zero_copy_only=False).astype(np.int64)
        fx = batch[fx_c].to_numpy(zero_copy_only=False).astype(np.int64)
        fy = batch[fy_c].to_numpy(zero_copy_only=False).astype(np.int64)
        cx0, cx1 = (fx - radius) >> cell_shift, (fx + radius) >> cell_shift
        cy0, cy1 = (fy - radius) >> cell_shift, (fy + radius) >> cell_shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        ri = np.repeat(np.arange(len(fid)), rep)
        total = int(rep.sum())
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        cx = cx0[ri] + off // ny[ri]
        cy = cy0[ri] + off % ny[ri]
        return pa.table(
            {"cell": pa.array((cx << 32) | cy), fid_c: pa.array(fid[ri]),
             fx_c: pa.array(fx[ri]), fy_c: pa.array(fy[ri])}
        )

    def point_cells(batch: pa.Table) -> pa.Table:
        px = batch[px_c].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[py_c].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"cell": pa.array(((px >> cell_shift) << 32) | (py >> cell_shift)),
             qid_c: batch[qid_c], px_c: pa.array(px), py_c: pa.array(py)}
        )

    P = points.map_batches(point_cells, batch_format="pyarrow")
    F = features.map_batches(explode_feats, batch_format="pyarrow")
    cand = bucketed_join(P, F, on="cell", right_on="cell",
                         num_buckets=num_buckets, spill_root=spill_root)
    r2 = radius * radius

    def finish(batch: pa.Table) -> pa.Table:
        px = batch[px_c].to_numpy(zero_copy_only=False)
        py = batch[py_c].to_numpy(zero_copy_only=False)
        fx = batch[fx_c].to_numpy(zero_copy_only=False)
        fy = batch[fy_c].to_numpy(zero_copy_only=False)
        d2 = (px - fx) ** 2 + (py - fy) ** 2
        sel = pa.array(d2 <= r2)
        return pa.table(
            {qid_c: batch[qid_c].filter(sel), fid_c: batch[fid_c].filter(sel),
             "d2": pa.array(d2[d2 <= r2])}
        )

    return cand.map_batches(finish, batch_format="pyarrow")

def knn_join(points, features, k: int = 3, radius0: int = 256,
             max_rounds: int = 8, cell_shift: int = 10,
             num_buckets: int = 64, spill_root: str | None = None,
             broadcast_cap: int = 2_000_000,
             point_cols: tuple = ("qid", "px", "py"),
             feat_cols: tuple = ("fid", "fx", "fy")):
    """EXACT k-nearest-neighbors JOIN with an UNBOUNDED feature side —
    the keyed twin of the broadcast FeatureIndex kNN: adaptive-radius
    rounds of :func:`distance_join`. A point that finds >= k features
    within radius r is provably done (its k-th nearest is <= r, so
    every nearer feature was also inside the radius box); unfinished
    points continue with r doubled. Driver state per round: NONE —
    finished/remaining sets are Datasets flowing through grace
    semi/anti filters; only the loop counter and per-round row counts
    (scalars) touch the driver. Ties broken by (d2, fid) ascending,
    identical to the window-SQL twin. Points with fewer than k
    features inside the max radius return what they found.

    Cost note: round i re-explodes features at radius r0*2^i for the
    remaining points only; with a sane r0 (the expected k-NN distance)
    almost everything finishes in round 1-2."""
    from osmray.windows import grouped_topk_sorted

    qid_c = point_cols[0]
    results = []
    remaining = points
    r = radius0
    for rnd in range(max_rounds):
        if remaining.count() == 0:
            break
        pairs = distance_join(remaining, features, radius=r,
                              cell_shift=cell_shift, num_buckets=num_buckets,
                              spill_root=spill_root, point_cols=point_cols,
                              feat_cols=feat_cols)

        def neg(batch: pa.Table) -> pa.Table:
            d2 = batch["d2"].to_numpy(zero_copy_only=False)
            return batch.append_column("neg_d2", pa.array(-d2))

        topk = grouped_topk_sorted(
            pairs.map_batches(neg, batch_format="pyarrow"),
            key=qid_c, val="neg_d2", tiebreak=feat_cols[0], k=k,
        ).materialize()

        from ray.data.aggregate import Count

        full = (
            topk.groupby(qid_c).aggregate(Count(alias_name="_n"))
        )

        def full_only(batch: pa.Table) -> pa.Table:
            n = batch["_n"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(n >= k)).select([qid_c])

        finished = full.map_batches(full_only, batch_format="pyarrow").materialize()
        last = rnd == max_rounds - 1
        # the finished set is qid keys only; when it fits the
        # broadcast cap (two-engine policy, as in graph.bfs_hops) one
        # ray.put'd array replaces BOTH grace filters' spill+probe
        # jobs — above the cap the keyed path keeps driver state at
        # zero
        n_fin = finished.count()
        if not last and n_fin == 0:
            # nobody finished this round: nothing to emit or filter
            r *= 2
            continue
        use_bcast = not last and n_fin <= broadcast_cap
        fin_keys = (np.sort(finished.to_pandas()[qid_c].to_numpy())
                    if use_bcast else None)
        if last:
            done_rows = topk
        elif use_bcast:
            done_rows = broadcast_filter(topk, qid_c, fin_keys)
        else:
            done_rows = bucketed_filter(
                topk, finished, on=qid_c, num_buckets=num_buckets,
                spill_root=None if spill_root is None else f"{spill_root}/semi{rnd}")
        results.append(done_rows.map_batches(
            lambda t: t.drop_columns(["neg_d2", "rank"]), batch_format="pyarrow"))
        if last:
            break
        if use_bcast:
            remaining = broadcast_filter(
                remaining, qid_c, fin_keys, anti=True).materialize()
        else:
            remaining = bucketed_filter(
                remaining, finished, on=qid_c, anti=True, num_buckets=num_buckets,
                spill_root=None if spill_root is None else f"{spill_root}/anti{rnd}",
            ).materialize()
        r *= 2
    out = results[0]
    for d in results[1:]:
        out = out.union(d)
    return out


def snap_join(points, segments, radius: int, cell_shift: int | None = None,
              num_buckets: int = 64, spill_root: str | None = None,
              point_cols: tuple = ("pid", "px", "py"),
              seg_cols: tuple = ("sid", "x1", "y1", "x2", "y2")):
    """Map-matching snap: each point -> its NEAREST segment within
    ``radius`` (euclidean, endpoints clamped), exact to the last bit.

    Same PBSM plan as ``distance_join``: segments explode to the grid
    cells covering their radius-padded bbox, points live in one cell
    each (pairs born deduplicated), one grace join. The point-segment
    squared distance is kept as an integer RATIONAL (num, den):
    den = |b-a|^2 for interior projections, 1 for endpoint clamps, so
    no precision is ever lost. The per-point argmin orders by
    num/den as an IEEE double (num < 2^53 so the division is exactly
    rounded — bit-identical in numpy and SQL) with the segment id as
    the deterministic tiebreak, via the sort-based top-k fold (merge
    group count O(#blocks)). Returns (pid, sid, d2_num, d2_den)."""
    from osmray.windows import grouped_topk_sorted

    if cell_shift is None:
        cell_shift = max(2, int(radius).bit_length() + 1)
    pid_c, px_c, py_c = point_cols
    sid_c, x1_c, y1_c, x2_c, y2_c = seg_cols
    r2 = radius * radius

    def explode_segs(batch: pa.Table) -> pa.Table:
        sid = batch[sid_c].to_numpy(zero_copy_only=False).astype(np.int64)
        x1 = batch[x1_c].to_numpy(zero_copy_only=False).astype(np.int64)
        y1 = batch[y1_c].to_numpy(zero_copy_only=False).astype(np.int64)
        x2 = batch[x2_c].to_numpy(zero_copy_only=False).astype(np.int64)
        y2 = batch[y2_c].to_numpy(zero_copy_only=False).astype(np.int64)
        cx0 = (np.minimum(x1, x2) - radius) >> cell_shift
        cx1 = (np.maximum(x1, x2) + radius) >> cell_shift
        cy0 = (np.minimum(y1, y2) - radius) >> cell_shift
        cy1 = (np.maximum(y1, y2) + radius) >> cell_shift
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        rep = nx * ny
        ri = np.repeat(np.arange(len(sid)), rep)
        total = int(rep.sum())
        off = np.arange(total) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)[:-1])), rep)
        cx = cx0[ri] + off // ny[ri]
        cy = cy0[ri] + off % ny[ri]
        return pa.table({"cell": pa.array((cx << 32) | cy),
                         sid_c: pa.array(sid[ri]),
                         x1_c: pa.array(x1[ri]), y1_c: pa.array(y1[ri]),
                         x2_c: pa.array(x2[ri]), y2_c: pa.array(y2[ri])})

    def cell_points(batch: pa.Table) -> pa.Table:
        px = batch[px_c].to_numpy(zero_copy_only=False).astype(np.int64)
        py = batch[py_c].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "cell": pa.array(((px >> cell_shift) << 32) | (py >> cell_shift)),
            pid_c: batch[pid_c].cast(pa.int64()),
            px_c: pa.array(px), py_c: pa.array(py)})

    P = points.map_batches(cell_points, batch_format="pyarrow")
    S = segments.map_batches(explode_segs, batch_format="pyarrow")
    joined = bucketed_join(P, S, on="cell", right_on="cell",
                           num_buckets=num_buckets, spill_root=spill_root)

    def dist2(batch: pa.Table) -> pa.Table:
        px = batch[px_c].to_numpy(zero_copy_only=False)
        py = batch[py_c].to_numpy(zero_copy_only=False)
        x1 = batch[x1_c].to_numpy(zero_copy_only=False)
        y1 = batch[y1_c].to_numpy(zero_copy_only=False)
        x2 = batch[x2_c].to_numpy(zero_copy_only=False)
        y2 = batch[y2_c].to_numpy(zero_copy_only=False)
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        tnum = (px - x1) * dx + (py - y1) * dy
        d_a = (px - x1) ** 2 + (py - y1) ** 2
        d_b = (px - x2) ** 2 + (py - y2) ** 2
        cross = dx * (py - y1) - dy * (px - x1)
        interior = (len2 > 0) & (tnum > 0) & (tnum < len2)
        num = np.where(interior, cross * cross,
                       np.where((len2 == 0) | (tnum <= 0), d_a, d_b))
        den = np.where(interior, len2, 1)
        keep = num <= r2 * den
        t = pa.table({pid_c: batch[pid_c].filter(pa.array(keep)),
                      sid_c: batch[sid_c].filter(pa.array(keep)),
                      "d2_num": pa.array(num[keep]),
                      "d2_den": pa.array(den[keep])})
        # exactly-rounded double of the rational: the global order key
        return t.append_column(
            "negd", pa.array(-(num[keep].astype(np.float64) / den[keep])))

    pairs = joined.map_batches(dist2, batch_format="pyarrow")
    best = grouped_topk_sorted(pairs, key=pid_c, val="negd",
                               tiebreak=sid_c, k=1)
    return best.map_batches(
        lambda t: t.select([pid_c, sid_c, "d2_num", "d2_den"]),
        batch_format="pyarrow")


def skew_join(left, right, on: str, right_on: str | None = None,
              hot_threshold: int = 100_000, num_buckets: int = 64,
              spill_root: str | None = None, hot_rows_cap: int = 5_000_000):
    """Skew-aware inner join — the hot-key answer for zipfian keys,
    where a plain hash/grace join sends every row of the hottest key
    to ONE bucket and that straggler holds the whole stage:

    1. one keys-only pass counts LEFT key frequencies (per-block
       partials, then a keyed Sum — never the payload);
    2. keys with frequency > ``hot_threshold`` are HOT; their count
       is bounded by ``n_left / hot_threshold``, so the hot-key set
       always fits a broadcast regardless of skew;
    3. the RIGHT rows of hot keys (dimension-like: few rows per key;
       ``hot_rows_cap`` guards the assumption loudly) broadcast via
       ``ray.put`` and hot LEFT rows join IN-TASK while streaming —
       the hottest keys never enter any shuffle;
    4. the cold remainder takes the grace ``bucketed_join``.

    Returns the union of both paths (same columns as bucketed_join's
    inner output). Left row order is not preserved (join outputs are
    set-semantics here, as with every shuffle join in this module).
    """
    import ray
    from ray.data.aggregate import Sum

    right_on = right_on or on

    def key_counts(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(u), "c": pa.array(c.astype(np.int64))})

    counts = (left.select_columns([on])
              .map_batches(key_counts, batch_format="pyarrow")
              .groupby("k").aggregate(Sum("c", alias_name="c")))
    hot_tbl = counts.filter(expr=f"c > {int(hot_threshold)}")\
        .select_columns(["k"]).to_pandas()
    # an empty filtered Dataset round-trips to a ZERO-COLUMN frame
    hot_keys = (np.sort(hot_tbl["k"].to_numpy().astype(np.int64))
                if "k" in hot_tbl.columns else np.array([], np.int64))

    if len(hot_keys) == 0:
        return bucketed_join(left, right, on=on, right_on=right_on,
                             num_buckets=num_buckets, spill_root=spill_root)

    # build-side rows of the hot keys: bounded by the dimension-like
    # assumption, guarded loudly
    r_hot = broadcast_filter(right, right_on, hot_keys).materialize()
    if r_hot.count() > hot_rows_cap:
        raise ValueError(
            f"skew_join: {r_hot.count()} right rows for {len(hot_keys)} hot "
            f"keys exceeds hot_rows_cap={hot_rows_cap}; the right side is "
            "not dimension-like for these keys — raise the cap or use "
            "bucketed_join with more buckets")
    r_tbl = pa.Table.from_pandas(r_hot.to_pandas(), preserve_index=False)
    l_names = set(left.schema(fetch_if_missing=True).names)
    rename = {c: (c + "_r" if c in l_names else c) for c in r_tbl.schema.names}
    r_tbl = r_tbl.rename_columns([rename[c] for c in r_tbl.schema.names])
    r_ref = ray.put(r_tbl)
    r_key = rename[right_on]

    def hot_join(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        is_hot = np.isin(k, hot_keys)
        g = batch.filter(pa.array(is_hot))
        if len(g) == 0:
            return None
        r = ray.get(r_ref)
        rk = r[r_key].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(rk, kind="stable")
        rks = rk[order]
        lk = g[on].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(rks, lk, "left")
        hi = np.searchsorted(rks, lk, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        li = np.repeat(np.arange(len(lk)), cnt)
        offs = np.concatenate(([0], np.cumsum(cnt)))
        within = np.arange(total) - np.repeat(offs[:-1], cnt)
        lt = g.take(pa.array(li))
        rt = r.take(pa.array(order[np.repeat(lo, cnt) + within]))
        for name in rt.schema.names:
            lt = lt.append_column(name, rt[name])
        return lt

    def hot_nonempty(batch: pa.Table) -> pa.Table:
        out = hot_join(batch)
        if out is None:
            # empty with the full joined schema
            r = ray.get(r_ref)
            cols = {n: batch[n].slice(0, 0) for n in batch.schema.names}
            for n in r.schema.names:
                cols[n] = r[n].slice(0, 0)
            return pa.table(cols)
        return out

    hot_out = left.map_batches(hot_nonempty, batch_format="pyarrow")

    def cold_only(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(k, hot_keys)))

    cold_left = left.map_batches(cold_only, batch_format="pyarrow")

    def cold_right(batch: pa.Table) -> pa.Table:
        k = batch[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(~np.isin(k, hot_keys)))

    cold_out = bucketed_join(cold_left,
                             right.map_batches(cold_right,
                                               batch_format="pyarrow"),
                             on=on, right_on=right_on,
                             num_buckets=num_buckets, spill_root=spill_root)
    return hot_out.union(cold_out)
