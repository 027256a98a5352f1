"""Flagship pipelines — the reference's make_* scripts re-expressed as
Ray Data dataflows over the images table.

The reference builds folder-labeled JPEG training sets one file at a
time (make_original.py / make_buildings.py traced in SURVEY §3). The
engine's equivalent contract: a labeled output TABLE
(image, tile key, cell, label, split, 256x256 label mask, round-tripped
bytes, caption, lineage partition), computed as:

  phase 1 (metadata only; projection pushed into the read):
    read (image_id, lat, lng)
      -> map_batches(assign_tiles)               [stateless, zero-copy]
      -> semi-join sampled pos/neg key sets      [broadcast key sets]
      -> winner per tile = hash-min image_id     [driver lexsort, tiny]
  concurrently: MaskStage actor pool rasterizes the sampled tiles and
  publishes the mask table through a future cell.
  phase 2 (ONE streaming payload job; never materialized):
    read images parquet (full columns)
      -> map_batches(assign_tiles)
      -> winner filter + label + hash split      [fused with the read:
         non-winning payload bytes never leave the read task]
      -> part_id + resume prune                  [manifest filter]
      -> map_batches(decode_roundtrip)           [psnr/caption gate]
      -> mask attach                             [blocks on the cell]
      -> lancelike.write_dataset(part_id = coarse cell) [resumable sink]

Scale notes (100 TB design intent, single-node tested):
- The images table is never materialized: it streams. Only key SETS
  (sampled positives/negatives, bounded by the sampling limits and the
  canvas size) and the features table are broadcast via ``ray.put``.
- The painted-tile canvas is bounded by geography (the job bbox), not
  by image count — the city canvas is ~155k z19 tiles (BASELINE.md).
  For planet-scale bboxes, partition the canvas by coarse cell and
  sample negatives per cell; the dataflow below keeps that seam
  explicit (painted keys / universe / sample are all keyed datasets).
- Sampling is the engine's seeded replacement for random.shuffle
  (documented divergence, SURVEY §7.5): order by splitmix64(key, seed)
  and take the LIMIT smallest — deterministic at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from osmray import cells as cellmod
from osmray import lancelike
from osmray.stages import (
    MaskStage,
    cached_index,
    decode_roundtrip,
    hash64,
    hash_str,
    make_assign_tiles,
    make_rasterize_painted,
)
from osmray.tilemath import MAXAR, TileScheme, bbox_tiles, pack_tile, tile_at_wgs, edge_ok as edge_ok_fn

BOX = (27.4026, 53.8306, 27.7003, 53.9739)  # the reference whole-city bbox

# canvases up to this many tiles sample negatives driver-side (same
# formula as the distributed path; tests pin the two paths equal)
DRIVER_UNIVERSE_MAX = 1 << 22
# canvases above this tile count keep the painted set as a keyed
# Dataset (grace anti-join) instead of a driver-collected broadcast
# array — the painted set is bounded by the canvas, so this caps the
# broadcast at ~128 MB of int64 keys
PAINTED_BROADCAST_MAX = 1 << 24
# sampled tile sets up to this size rasterize masks as plain tasks on
# warm workers (no actor-pool process ramp); above it, the actor pool
# amortizes per-actor index state over many batches
MASK_TASKS_MAX = 1 << 20


@dataclass
class LabelJobConfig:
    """One folder-labeled dataset job (make_original / make_buildings
    as config, not scripts — SURVEY §2.10 'script-per-task' replaced
    by a declarative surface)."""

    z: int = 19
    scheme: TileScheme = MAXAR
    bbox: tuple = BOX
    limit: int = 5000
    seed: int = 42
    edge: int = 16
    pos_label: str = "lamp"
    neg_label: str = "nolamp"
    positive_kind: str = "node"  # which feature kind yields positives
    positive_tag: tuple | None = ("highway", "street_lamp")
    # what the negative painter paints from the FULL features table;
    # sampled positives are painted via ``extra`` (the reference paints
    # the TRUNCATED lamp list + all ways, make_original.py:41-44)
    paint_kinds: tuple = ("way",)
    way_width: int = 2
    polygon_width: int = 1
    train_frac: float = 0.8  # hash split (make_expand's 4000/1000)
    mask_batch: int = 256
    mask_concurrency: int = 4
    # feature-index bucketing resolution for the mask stage: z-2 (a
    # cell = 4x4 tiles) keeps per-tile candidate lists ~O(local
    # features); None -> z-2
    mask_res: int | None = None
    # output partition resolution: fragments = cells at this res.
    # Finer than the join's COARSE_RES so the sink parallelizes and a
    # restart re-does small units; z-4 (16x16-tile cells) by default.
    part_res: int | None = None


BUILDINGS = LabelJobConfig(
    z=18,
    edge=24,  # make_buildings.py:40
    pos_label="yes",
    neg_label="no",
    positive_kind="polygon",
    positive_tag=None,
    paint_kinds=("polygon", "exclusion"),  # outlines + filled exclusions
)


def _tags_get(tags_col, key: str) -> list:
    """tags map column -> list of values for ``key`` (None if absent)."""
    out = []
    for row in tags_col.to_pylist():
        d = dict(row) if row is not None else {}
        out.append(d.get(key))
    return out


def filter_features(feats: pa.Table, kind: str | None = None, tag: tuple | None = None) -> pa.Table:
    """Predicate surface over the features table (the engine's version
    of the reference's Overpass query templates, lib/loaders.py:19,37-49)."""
    if kind is not None:
        feats = feats.filter(pc.equal(feats["kind"], kind))
    if tag is not None:
        key, val = tag
        vals = _tags_get(feats["tags"], key)
        feats = feats.filter(pa.array([v == val for v in vals], pa.bool_()))
    return feats


def _slices(table: pa.Table, n: int) -> list[pa.Table]:
    """Split a driver-resident arrow table into <= n slices (one Ray
    block each via ray.data.from_arrow(list)). Each slice is
    IPC-round-tripped: a plain ``Table.slice`` view SERIALIZES WITH
    ITS PARENT BUFFERS for list columns (measured 1.0 size ratio), so
    n un-compacted slices would ship n copies of the whole table into
    the object store."""
    import pyarrow.ipc as ipc

    n = max(1, min(n, table.num_rows or 1))
    step = -(-table.num_rows // n)

    def compact(t: pa.Table) -> pa.Table:
        sink = pa.BufferOutputStream()
        with ipc.new_stream(sink, t.schema) as w:
            w.write_table(t)
        return ipc.open_stream(sink.getvalue()).read_all()

    return [
        compact(table.slice(i, step))
        for i in range(0, max(1, table.num_rows), max(1, step))
    ]


def collect_columns(mds, cols: list[str]) -> pa.Table:
    """Driver-side column fetch from a MATERIALIZED dataset without
    launching another Ray job: pull the block refs straight from the
    object store (zero-copy mmap for Arrow blocks) and slice the
    wanted columns. Replaces ``select_columns(...).to_pandas()`` on
    the flagship's serial path — each such call was a full Ray job
    round-trip (~0.3-0.5 s of driver wall at 32 cpus)."""
    import ray

    refs = []
    for bundle in mds.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    tables = [t.select(cols) for t in ray.get(refs) if t.num_rows]
    if not tables:
        schema = pa.schema([mds.schema().base_schema.field(c) for c in cols])
        return schema.empty_table()
    return pa.concat_tables(tables)


_MASK_REMOTES: dict = {}


def _mask_remotes():
    """Lazily-decorated remote fns for the bounded mask regime: N
    rasterize tasks over zero-copy slices (warm workers, worker-cached
    broadcast index) under one num_cpus=0 coordinator whose ObjectRef
    doubles as the attach stage's future — consumers just ray.get it."""
    import ray

    if "all" not in _MASK_REMOTES:

        @ray.remote(num_cpus=1)
        def _mask_part(tbl: pa.Table, fref_l, z, scheme, res) -> pa.Table:
            st = MaskStage(cached_index(fref_l), z, scheme, res)
            return st(tbl).select(["tile_key", "mask", "mask_any"])

        @ray.remote(num_cpus=0)
        def _mask_all(tiles_tbl: pa.Table, fref_l, z, scheme, res, n_slices: int) -> pa.Table:
            parts = ray.get(
                [
                    _mask_part.remote(s, fref_l, z, scheme, res)
                    for s in _slices(tiles_tbl, n_slices)
                ]
            )
            mtbl = pa.concat_tables(parts)
            order = np.argsort(mtbl["tile_key"].to_numpy(zero_copy_only=False), kind="stable")
            return mtbl.take(pa.array(order)).combine_chunks()

        _MASK_REMOTES["all"] = _mask_all
    return _MASK_REMOTES["all"]


class _FutureCell:
    """A set-once async cell (wrapped with ``ray.remote(num_cpus=0)``
    at use sites). Lets a background-thread producer publish a value
    to map tasks of an ALREADY-RUNNING streaming job: consumers call
    ``get`` and await the event, so upstream stages keep working while
    the producer finishes. Values are passed as ``[ObjectRef]`` so the
    payload stays a shared plasma object."""

    def __init__(self):
        import asyncio

        self._ev = asyncio.Event()
        self._v = None

    async def set(self, v):
        self._v = v
        self._ev.set()

    async def get(self):
        await self._ev.wait()
        return self._v


def sample_smallest(keys: np.ndarray, limit: int, seed: int) -> np.ndarray:
    """Seeded deterministic 'shuffle + take limit': order by
    hash64(key, seed), break ties by key."""
    h = hash64(keys, seed)
    order = np.lexsort((keys, h))
    return keys[order[:limit]]


def positive_feature_tiles(
    feats: pa.Table, cfg: LabelJobConfig
) -> tuple[pa.Table, np.ndarray]:
    """Select + sample positive features; return (sampled features,
    their edge-passing tile keys).

    - nodes (make_original): one point each; sample LIMIT features,
      tile per node, skipedge filter (lib/layers.py:120-143).
    - polygons (make_buildings): EVERY vertex of every way emits its
      tile (make_buildings.py:36-47), skipedge(edge=24), dedup; the
      engine samples deterministically instead of the reference's
      order-dependent count>=LIMIT break (documented divergence).
    """
    pos = filter_features(feats, cfg.positive_kind, cfg.positive_tag)
    fid = pos["feature_id"].to_numpy(zero_copy_only=False)
    if cfg.positive_kind == "node":
        sampled_ids = sample_smallest(fid, cfg.limit, cfg.seed)
        pos = pos.filter(pc.is_in(pos["feature_id"], pa.array(sampled_ids)))
        lat = pc.list_element(pos["geom_lat"], 0).to_numpy(zero_copy_only=False)
        lng = pc.list_element(pos["geom_lng"], 0).to_numpy(zero_copy_only=False)
    else:
        lat = pc.list_flatten(pos["geom_lat"]).to_numpy(zero_copy_only=False)
        lng = pc.list_flatten(pos["geom_lng"]).to_numpy(zero_copy_only=False)
    tx, ty, rx, ry = tile_at_wgs(lat, lng, cfg.z, cfg.scheme)
    ok = edge_ok_fn(rx, ry, cfg.edge)
    keys = np.unique(pack_tile(tx[ok], ty[ok], cfg.z))
    if cfg.positive_kind != "node":
        keys = sample_smallest(keys, cfg.limit, cfg.seed)
    return pos, keys


def painted_tile_set(feats: pa.Table, cfg: LabelJobConfig, extra: pa.Table | None = None,
                     mode: str = "auto"):
    """The distributed painter: rasterize the paint features (sampled
    positives + the configured paint kinds) over the bbox canvas.

    Two regimes, mirroring the driver/distributed split in
    ``sample_negative_tiles``:

    - ``driver`` (canvas ≤ ``PAINTED_BROADCAST_MAX`` tiles): collect
      the unique painted keys to an ``np.ndarray`` — keys-only and
      bounded by the canvas, so a broadcast downstream is safe.
    - ``keyed`` (planet-scale canvas): NO driver collect — return the
      painted-keys ``Dataset`` as-is (possibly with duplicate keys
      across painter tasks; membership consumers don't care) for the
      grace anti-join path in ``sample_negative_tiles``.

    ``mode="auto"`` picks by canvas size; both paths are pinned equal
    by tests/test_pipeline.py."""
    import ray.data

    window = bbox_tiles(*cfg.bbox, cfg.z, cfg.scheme)
    txmin, tymin, txmax, tymax = window
    keyed = mode == "keyed" or (
        mode == "auto"
        and (txmax - txmin + 1) * (tymax - tymin + 1) > PAINTED_BROADCAST_MAX
    )
    paint = feats.filter(pc.is_in(feats["kind"], pa.array(list(cfg.paint_kinds))))
    if extra is not None and extra.num_rows:
        paint = pa.concat_tables([paint, extra.select(paint.schema.names)])
    if paint.num_rows == 0:
        empty = np.array([], dtype=np.int64)
        return ray.data.from_arrow(pa.table({"tile_key": pa.array(empty)})) if keyed else empty
    raster_fn = make_rasterize_painted(
        cfg.z,
        cfg.scheme,
        (txmin, tymin, txmax, tymax),
        kinds_widths={"node": 1, "way": cfg.way_width, "polygon": cfg.polygon_width},
    )
    import ray

    # work-proportional fan-out: painter tasks carry ~100-200 ms of
    # fixed dispatch cost each, so slicing a few-thousand-feature table
    # 32 ways is SLOWER than 8 ways (measured 0.91 s vs 0.29 s on the
    # 131k bench); scale tasks with rows, clamped to the CPUs
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_tasks = int(np.clip(paint.num_rows // 512, 4, min(32, cpus)))
    if keyed:
        # one block per zero-copy slice: parallelizes the painter
        # WITHOUT a repartition shuffle round-trip
        ds = ray.data.from_arrow(_slices(paint, n_tasks)).map_batches(
            raster_fn, batch_format="pyarrow"
        )
        return ds.select_columns(["tile_key"])

    # bounded regime: plain-task fan-out over the driver-resident
    # slices — same rasterize kernel, but skips the streaming-executor
    # job startup + collect machinery (~0.5-1 s of serial wall on the
    # flagship's critical path; the painter gates negative sampling)
    @ray.remote(num_cpus=1)
    def _paint(tbl: pa.Table) -> np.ndarray:
        return raster_fn(tbl)["tile_key"].to_numpy(zero_copy_only=False)

    parts = ray.get([_paint.remote(s) for s in _slices(paint, n_tasks)])
    return np.unique(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)


def sample_negative_tiles(
    painted, cfg: LabelJobConfig, n: int | None = None
) -> np.ndarray:
    """Complement sampling as dataflow (replaces the mutable
    busy/free-dict rejection sampler, lib/helpers.py:157-215): tile
    universe of the bbox canvas, anti-join the painted set, take the
    LIMIT hash-smallest. 'Without replacement' is free — each key
    appears once.

    ``painted`` is either a driver ``np.ndarray`` of keys (bounded
    canvas — broadcast anti-filter) or a keys ``Dataset`` from
    ``painted_tile_set(mode="keyed")`` (planet-scale canvas — grace
    anti-join via ``joins.bucketed_filter``; the painted set never
    touches the driver). All paths return the identical sorted
    key array: the n (hash, key)-smallest free tiles."""
    import ray
    import ray.data

    n = n or cfg.limit
    txmin, tymin, txmax, tymax = bbox_tiles(*cfg.bbox, cfg.z, cfg.scheme)
    width = txmax - txmin + 1
    height = tymax - tymin + 1
    seed = cfg.seed
    z = cfg.z

    if not isinstance(painted, np.ndarray):
        # keyed regime: anti-join universe ⟕̸ painted with the grace
        # filter, then the global (h, key)-smallest n — one keys-only
        # shuffle, one sort of the free set, no driver collect beyond
        # the n-row sample itself
        from osmray.joins import bucketed_filter

        def flat_key(batch: pa.Table) -> pa.Table:
            i = batch["id"].to_numpy(zero_copy_only=False)
            key = pack_tile(txmin + (i % width), tymin + (i // width), z)
            return pa.table({"tile_key": pa.array(key), "h": pa.array(hash64(key, seed))})

        universe = ray.data.range(width * height).map_batches(
            flat_key, batch_format="pyarrow"
        )
        free = bucketed_filter(universe, painted, on="tile_key", anti=True)
        sample = free.sort(["h", "tile_key"]).limit(n).to_pandas()
        return np.sort(sample["tile_key"].to_numpy())

    if width * height <= DRIVER_UNIVERSE_MAX:
        # small canvas: the whole universe fits trivially in driver
        # memory — identical formula, no Ray job round-trips. The
        # dataflow path below handles planet-scale canvases.
        i = np.arange(width * height, dtype=np.int64)
        key = pack_tile(txmin + (i % width), tymin + (i // width), z)
        key = key[~np.isin(key, np.sort(painted))]
        h = hash64(key, seed)
        order = np.lexsort((key, h))[:n]
        return np.sort(key[order])

    painted_ref = ray.put(np.sort(painted))

    def flat_to_key(batch: pa.Table) -> pa.Table:
        i = batch["id"].to_numpy(zero_copy_only=False)
        tx = txmin + (i % width)
        ty = tymin + (i // width)
        key = pack_tile(tx, ty, z)
        p = ray.get(painted_ref)
        free = ~np.isin(key, p, assume_unique=False)
        key = key[free]
        return pa.table({"tile_key": pa.array(key), "h": pa.array(hash64(key, seed))})

    universe = ray.data.range(width * height)
    free = universe.map_batches(flat_to_key, batch_format="pyarrow")
    # global smallest-n by (seeded hash, key) = deterministic uniform
    # sample, tie-broken identically to the driver path's lexsort
    sample = free.sort(["h", "tile_key"]).limit(n).to_pandas()
    return np.sort(sample["tile_key"].to_numpy())


def winner_keys(images_ds, assign, pos_keys: np.ndarray, neg_keys: np.ndarray,
                cfg: LabelJobConfig) -> tuple[np.ndarray, np.ndarray]:
    """Phase 1 of the two-phase label scan: a METADATA-ONLY pass.

    ``select_columns`` right after ``read_parquet`` is pushed into the
    scan (verified: same wall as an explicit ``columns=`` read), so
    this pass decompresses only (image_id, lat, lng) — ~0.1% of the
    table — never the image payload. The matched key pairs are bounded
    by the sampling limits (≤ a few rows per sampled tile), so the
    winner per tile (hash-smallest image_id — the engine's
    deterministic twin of the reference's order-dependent
    first-file-wins, make_buildings.py:45-46) is one driver-side
    lexsort over two int64 columns; swap for a distributed
    ``groupby().aggregate(Min)`` when the matched set is unbounded.

    Returns (sorted winner tile_keys, matching dedup hashes).
    """
    import ray

    cand = np.sort(np.concatenate([pos_keys, neg_keys]))
    cand_ref = ray.put(cand)
    seed = cfg.seed

    def match_batch(batch: pa.Table) -> pa.Table:
        ks = ray.get(cand_ref)
        key = batch["tile_key"].to_numpy(zero_copy_only=False)
        if ks.size:
            idx = np.clip(np.searchsorted(ks, key), 0, ks.size - 1)
            keep = ks[idx] == key
        else:
            keep = np.zeros(len(key), dtype=bool)
        sel = batch.filter(pa.array(keep))
        return pa.table(
            {
                "tile_key": sel["tile_key"],
                "dedup_h": pa.array(hash_str(sel["image_id"], seed + 2)),
            }
        )

    meta = images_ds.select_columns(["image_id", "lat", "lng"]).map_batches(
        assign, batch_format="pyarrow"
    )
    matched = meta.map_batches(match_batch, batch_format="pyarrow").materialize()
    if __import__("os").environ.get("OSMRAY_STATS"):
        import sys as _s

        print(matched.stats(), file=_s.stderr, flush=True)
    keys = collect_columns(matched, ["tile_key", "dedup_h"])
    tk = keys["tile_key"].to_numpy(zero_copy_only=False)
    dh = keys["dedup_h"].to_numpy(zero_copy_only=False)
    return _dedup_winners(tk, dh)


def _dedup_winners(tk: np.ndarray, dh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Reduce matched (tile_key, dedup_h) pairs to the hash-smallest
    winner per tile: one lexsort over two bounded int64 columns."""
    order = np.lexsort((dh, tk))
    tks, dhs = tk[order], dh[order]
    first = np.ones(len(tks), dtype=bool)
    first[1:] = tks[1:] != tks[:-1]
    return tks[first], dhs[first]


def _winner_remote():
    """Lazily-decorated remote fn for the plain-task phase-1 regime
    (module-level cache: one function export per process)."""
    import ray

    if "scan" not in _MASK_REMOTES:

        @ray.remote(num_cpus=1)
        def _scan_shard(shard, assign, cand: np.ndarray, seed: int):
            import pyarrow.parquet as pq

            tks, dhs = [], []
            for f in shard:
                t = assign(pq.read_table(f, columns=["image_id", "lat", "lng"]))
                key = t["tile_key"].to_numpy(zero_copy_only=False)
                if cand.size:
                    idx = np.clip(np.searchsorted(cand, key), 0, cand.size - 1)
                    keep = cand[idx] == key
                else:
                    keep = np.zeros(len(key), dtype=bool)
                sel = t.filter(pa.array(keep))
                tks.append(sel["tile_key"].to_numpy(zero_copy_only=False))
                dhs.append(hash_str(sel["image_id"], seed + 2))
            e = np.array([], dtype=np.int64)
            return (
                np.concatenate(tks) if tks else e,
                np.concatenate(dhs) if dhs else e,
            )

        _MASK_REMOTES["scan"] = _scan_shard
    return _MASK_REMOTES["scan"]


def _winner_merge_remote():
    """Lazily-decorated num_cpus=0 reducer for the async phase-1
    regime: waits on the shard scans and folds them with the same
    lexsort as the driver path."""
    import ray

    if "winmerge" not in _MASK_REMOTES:

        @ray.remote(num_cpus=0)
        def _merge(*parts):
            tk = np.concatenate([p[0] for p in parts])
            dh = np.concatenate([p[1] for p in parts])
            return _dedup_winners(tk, dh)

        _MASK_REMOTES["winmerge"] = _merge
    return _MASK_REMOTES["winmerge"]


def winner_keys_tasks_async(
    files, assign, pos_keys: np.ndarray, neg_keys: np.ndarray, cfg: LabelJobConfig
):
    """Plain-task phase-1 winner scan, launched WITHOUT blocking the
    driver: one num_cpus=1 task per file shard reads ONLY
    (image_id, lat, lng) via a direct column-pruned ``pq.read_table``
    (~5 ms warm per file, vs ~1 s/task of Ray Data job+datasource
    fixed costs measured for the same projected read), assigns tiles
    and matches the broadcast candidate set in-task; a num_cpus=0
    reducer folds the bounded match sets with one lexsort.

    Returns the reducer's ObjectRef (resolves to (wk, wh)). The
    payload job's winner-filter stage blocks on it per task, so the
    payload READ wave overlaps the metadata scan instead of waiting
    behind it — workers blocked in ``ray.get`` release their CPU, so
    the scan shards interleave with the read tasks without deadlock.
    """
    import ray

    cand = np.sort(np.concatenate([pos_keys, neg_keys]))
    cand_ref = ray.put(cand)
    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    n_shards = max(1, min(len(files), total_cpus * 2))
    shards = [list(files)[i::n_shards] for i in range(n_shards)]
    scan = _winner_remote()
    refs = [scan.remote(s, assign, cand_ref, cfg.seed) for s in shards]
    return _winner_merge_remote().remote(*refs)


def winner_keys_tasks(
    files, assign, pos_keys: np.ndarray, neg_keys: np.ndarray, cfg: LabelJobConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Blocking twin of :func:`winner_keys_tasks_async` (CLI paths and
    the parity pytest vs :func:`winner_keys`). Identical math."""
    import ray

    return ray.get(winner_keys_tasks_async(files, assign, pos_keys, neg_keys, cfg))


def make_label_winners(win_ref, pos_ref, cfg: LabelJobConfig):
    """Phase 2 stage factory: the payload pass. Filters the full
    images stream to the broadcast winner set (tile_key → winning
    dedup hash), then labels + hash-splits the survivors. The filter
    runs FUSED with the read task, so non-winning payload bytes
    (~80% of the table) are dropped in-process and never enter the
    object store; the winners flow straight into the mask/roundtrip/
    sink stages of the same streaming job — the payload is never
    materialized."""
    import ray

    pos_label, neg_label = cfg.pos_label, cfg.neg_label
    train_frac, seed = cfg.train_frac, cfg.seed

    def label_winners(batch: pa.Table) -> pa.Table:
        wk, wh = ray.get(win_ref)
        key = batch["tile_key"].to_numpy(zero_copy_only=False)
        if wk.size:
            idx = np.clip(np.searchsorted(wk, key), 0, wk.size - 1)
            cand = wk[idx] == key
        else:
            idx = np.zeros(len(key), dtype=np.int64)
            cand = np.zeros(len(key), dtype=bool)
        sel = batch.filter(pa.array(cand))
        # hash only the tile-matched survivors (~20% of rows)
        h = hash_str(sel["image_id"], seed + 2)
        keep = wh[idx[cand]] == h if wk.size else np.zeros(0, dtype=bool)
        sel = sel.filter(pa.array(keep))
        k2 = key[cand][keep]
        is_pos = np.isin(k2, ray.get(pos_ref))
        lab = np.where(is_pos, pos_label, neg_label)
        # tile-key splitmix64 split (seed+1): the same hash64 family as
        # the sampling passes, so the split column replays bit-exactly
        # in the SQL oracle (queries.hash64_ctes) — the crc32 string
        # hash it replaces had no DuckDB twin
        hs = hash64(k2, seed + 1)
        split = np.where(
            (hs.astype(np.uint64) % np.uint64(1000)) < np.uint64(int(train_frac * 1000)),
            "train",
            "valid",
        )
        return sel.append_column("label", pa.array(lab, pa.string())).append_column(
            "split", pa.array(split, pa.string())
        )

    return label_winners


def run_label_job(
    images_ds,
    feats: pa.Table,
    cfg: LabelJobConfig = LabelJobConfig(),
    out_dir: str | None = None,
    mask: bool = True,
    roundtrip: bool = True,
    mask_attach: str = "broadcast",  # "broadcast" (bounded) | "join" (unbounded)
    image_files: list[str] | None = None,
):
    """End-to-end flagship: returns (dataset, lineage_df_or_None).

    ``image_files``: optional parquet file list BEHIND ``images_ds``.
    When given, the metadata-only phase-1 winner scan runs as plain
    column-pruned tasks over file shards (see winner_keys_tasks)
    instead of a second Ray Data job — same math, less fixed cost.
    The payload phase always streams through ``images_ds``."""
    import os
    import time

    import ray

    prof = os.environ.get("OSMRAY_PROF")
    marks = [("start", time.perf_counter())]

    def mark(name):
        marks.append((name, time.perf_counter()))
        if prof:
            import sys

            print(
                f"[prof] {name}: {marks[-1][1] - marks[-2][1]:.2f}s", file=sys.stderr, flush=True
            )

    import threading

    mask_res = cfg.mask_res if cfg.mask_res is not None else cfg.z - 2
    feats_ref = None
    if mask:
        # launch the mask FeatureIndex build FIRST: it depends only on
        # the features table, so the build task overlaps the painter
        # job + sampling + label scan instead of sitting anywhere on
        # the critical path (the mask actors block on it in __init__)
        from osmray.geom import FeatureIndex

        mask_feats = feats.filter(
            pc.is_in(feats["kind"], pa.array(list(set(cfg.paint_kinds) | {cfg.positive_kind})))
        )

        # built in a RAY TASK (not on the driver: a driver-thread
        # build would steal the GIL from the streaming executor)
        @ray.remote(num_cpus=1)
        def _build_index(tbl: pa.Table, res: int):
            return FeatureIndex.from_table(tbl, res)

        feats_ref = _build_index.remote(mask_feats, mask_res)
        mark("mask-prep")

    txmin_c, tymin_c, txmax_c, tymax_c = bbox_tiles(*cfg.bbox, cfg.z, cfg.scheme)
    canvas_keyed = (txmax_c - txmin_c + 1) * (tymax_c - tymin_c + 1) > PAINTED_BROADCAST_MAX
    if not canvas_keyed:
        # overlap the painter Ray job (paint_kinds features only) with
        # the driver-side positive sampling: positive NODE dots paint
        # exactly their containing tile, so their painted keys are a
        # direct vectorized formula unioned in afterwards — no data
        # dependency between the painter job and the positives
        painter_box: dict = {}

        def _run_painter():
            try:
                painter_box["keys"] = painted_tile_set(feats, cfg)
            except BaseException as e:  # surfaced on join
                painter_box["err"] = e

        painter_thread = threading.Thread(target=_run_painter, daemon=True)
        painter_thread.start()
        pos_feats, pos_keys = positive_feature_tiles(feats, cfg)
        mark("positives")
        painter_thread.join()
        if "err" in painter_box:
            raise painter_box["err"]
        painted = painter_box["keys"]
        if cfg.positive_kind == "node" and pos_feats.num_rows:
            plat = pc.list_element(pos_feats["geom_lat"], 0).to_numpy(zero_copy_only=False)
            plng = pc.list_element(pos_feats["geom_lng"], 0).to_numpy(zero_copy_only=False)
            ptx, pty, _, _ = tile_at_wgs(plat, plng, cfg.z, cfg.scheme)
            inside = (ptx >= txmin_c) & (ptx <= txmax_c) & (pty >= tymin_c) & (pty <= tymax_c)
            painted = np.union1d(painted, pack_tile(ptx[inside], pty[inside], cfg.z))
    else:
        pos_feats, pos_keys = positive_feature_tiles(feats, cfg)
        mark("positives")
        painted = painted_tile_set(
            feats, cfg, extra=pos_feats if cfg.positive_kind == "node" else None
        )
    mark("painted")
    neg_keys = sample_negative_tiles(painted, cfg)
    mark("negatives")

    part_res = cfg.part_res if cfg.part_res is not None else cfg.z - 4
    done_parts = (
        np.sort(np.fromiter(lancelike.completed_parts(out_dir), dtype=np.int64))
        if out_dir is not None
        else np.array([], dtype=np.int64)
    )

    mask_thread = None
    mask_ref = None  # plasma ref to the sorted mask table (task regime)
    mask_cell = None  # future cell publishing the same (actor regime)
    mask_box: dict = {}
    if mask:
        # masks depend only on the tile key, and the candidate tile
        # universe is ALREADY ON THE DRIVER: the sampled positive +
        # negative key sets (every labeled image's tile is one of
        # them). Rasterizing from the key sets (a) avoids re-executing
        # the labeled pipeline just to list its distinct tiles and
        # (b) lets the mask actor pool run CONCURRENTLY with the label
        # scan (background thread below) instead of after it. Tiles
        # are sorted by mask cell so each actor's per-cell canvas is
        # rasterized once and sliced for all its tiles — image bytes
        # never pass through the mask stage.
        from osmray.tilemath import unpack_tile

        cand = np.unique(np.concatenate([pos_keys, neg_keys]))
        ctx, cty, _ = unpack_tile(cand)
        if len(done_parts):
            # resume: parts already on disk need no masks either
            cpart = cellmod.cell_of_tile(ctx, cty, cfg.z, part_res)
            keep = ~np.isin(cpart, done_parts)
            cand, ctx, cty = cand[keep], ctx[keep], cty[keep]
        if len(cand) == 0:
            mask = False  # fully-resumed run: nothing to rasterize
    if mask:
        mcell = cellmod.cell_of_tile(ctx, cty, cfg.z, mask_res)
        order = np.argsort(mcell, kind="stable")
        tiles_tbl = pa.table(
            {
                "tile_key": pa.array(cand[order]),
                "tx": pa.array(ctx[order]),
                "ty": pa.array(cty[order]),
            }
        )
        total_cpus = int(ray.cluster_resources().get("CPU", 4))

        # regime pick: bounded tile sets (the sampled pos+neg universe)
        # rasterize as PLAIN TASKS on warm workers, coordinated by one
        # num_cpus=0 task whose ObjectRef the payload job's attach
        # stage blocks on directly — no actor-pool process ramp, no
        # driver thread competing for the GIL with the streaming
        # executor (measured: the 16-actor pool spent ~20 s
        # spawning+importing for ~10 CPU-s of rasterization, and the
        # driver-thread publish added several more under GIL
        # contention). The actor-pool path remains for unbounded tile
        # universes, where per-actor index state amortizes over many
        # batches.
        if len(cand) <= MASK_TASKS_MAX:
            n_slices = max(4, min(64, (total_cpus - 2) * 2))
            mask_ref = _mask_remotes().remote(
                tiles_tbl, [feats_ref], cfg.z, cfg.scheme, mask_res, n_slices
            )
        else:
            mask_cell = ray.remote(num_cpus=0)(_FutureCell).remote()

            def _run_masks():
                try:
                    tiles_ds = ray.data.from_arrow(
                        _slices(tiles_tbl, max(2, cfg.mask_concurrency * 2))
                    )
                    # clamp the pool under the cluster CPUs: a pool
                    # that reserves every CPU starves producing stages
                    concurrency = max(1, min(cfg.mask_concurrency, total_cpus - 2))
                    mask_rows = tiles_ds.map_batches(
                        MaskStage,
                        fn_constructor_kwargs={
                            "features_ref": feats_ref,
                            "z": cfg.z,
                            "scheme": cfg.scheme,
                            "res": mask_res,
                        },
                        batch_format="pyarrow",
                        batch_size=cfg.mask_batch,
                        concurrency=concurrency,
                        num_cpus=1,
                    ).select_columns(["tile_key", "mask", "mask_any"])
                    mask_rows = mask_rows.materialize()
                    mask_box["rows"] = mask_rows
                    # sorted once, published as ONE plasma table every
                    # attach task maps in zero-copy
                    mtbl = collect_columns(mask_rows, ["tile_key", "mask", "mask_any"])
                    order = np.argsort(
                        mtbl["tile_key"].to_numpy(zero_copy_only=False), kind="stable"
                    )
                    ref = ray.put(mtbl.take(pa.array(order)).combine_chunks())
                    ray.get(mask_cell.set.remote([ref]))
                except BaseException as e:  # surfaced on join
                    mask_box["err"] = e
                    try:
                        ray.get(mask_cell.set.remote([ray.put(None)]))
                    except BaseException:
                        pass

            mask_thread = threading.Thread(target=_run_masks, daemon=True)
            mask_thread.start()

    assign = make_assign_tiles(cfg.z, cfg.scheme, cfg.edge)

    # ---- phase 1: metadata-only winner scan (no payload bytes) ----
    if image_files:
        # async regime: win_ref is the reducer task's future; phase 2
        # launches NOW and its winner-filter stage blocks on the ref,
        # overlapping the payload read wave with the metadata scan
        win_ref = winner_keys_tasks_async(image_files, assign, pos_keys, neg_keys, cfg)
    else:
        wk, wh = winner_keys(images_ds, assign, pos_keys, neg_keys, cfg)
        win_ref = ray.put((wk, wh))
    pos_ref = ray.put(np.sort(pos_keys))
    mark("label+dedup")

    # ---- phase 2: ONE streaming payload job ----
    # read (full columns) -> assign -> winner filter + label (fused
    # with the read task: losing payload rows never leave it) ->
    # part/resume prune -> decode/roundtrip -> mask attach -> sink.
    ds = images_ds.map_batches(assign, batch_format="pyarrow")
    ds = ds.map_batches(make_label_winners(win_ref, pos_ref, cfg), batch_format="pyarrow")

    # partition key for the sink: cell (at part_res) of the tile.
    # Added EARLY so resume (completed parts per the manifest) prunes
    # rows before the expensive mask/roundtrip stages, not after.
    def add_part(batch: pa.Table) -> pa.Table:
        tx = batch["tx"].to_numpy(zero_copy_only=False)
        ty = batch["ty"].to_numpy(zero_copy_only=False)
        part = cellmod.cell_of_tile(tx, ty, cfg.z, part_res)
        return batch.append_column("part_id", pa.array(part.astype(np.int64)))

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    if out_dir is not None:
        ds = lancelike.pending_filter(ds, out_dir)
    if roundtrip:
        # roundtrip BEFORE mask attach: it is the payload pass's CPU
        # hog, so it overlaps the tail of mask rasterization instead
        # of waiting behind it. num_cpus=0.99 BREAKS OPERATOR FUSION
        # with the read+filter stage on purpose: fused, the whole
        # chain runs as one coarse task per input file and the decode
        # work is straggler-bound (observed 4.6-12.5 s task walls);
        # unfused, the filter's fine (~16 MB) output blocks rebalance
        # the decode across every slot while still streaming.
        ds = ds.map_batches(decode_roundtrip, batch_format="pyarrow", num_cpus=0.99)

    if mask:
        if mask_attach == "join":
            # unbounded tile sets: hash-partitioned join instead of a
            # broadcast dict (both sides shuffle on tile_key) — the
            # join needs the materialized mask Dataset, so this regime
            # waits for the rasterizer here
            from osmray.joins import large_join

            if mask_ref is not None:
                mask_rows = ray.data.from_arrow(_slices(ray.get(mask_ref), 8))
            else:
                mask_thread.join()
                if "err" in mask_box:
                    raise mask_box["err"]
                mask_rows = mask_box["rows"]
            mark("masks")
            # join aggregators are actors: size them UNDER the
            # cluster's CPUs or they starve the producing stages
            n_parts = max(2, int(ray.cluster_resources().get("CPU", 8)) // 4)
            ds = large_join(ds, mask_rows, on="tile_key", num_partitions=n_parts)
        else:
            # broadcast regime: the sorted mask table arrives as a
            # plasma ObjectRef (task-regime coordinator return, or the
            # actor-regime future cell), so the payload job STARTS
            # immediately and only its attach stage blocks on the
            # masks — rasterization overlaps read/filter/roundtrip
            cell = mask_cell
            mref = mask_ref
            mark("masks")

            def attach(batch: pa.Table) -> pa.Table:
                # the cell's get() returns [ref]: the ref rides inside
                # a list so Ray hands back the small ref, not an inline
                # copy — every task then maps the SAME plasma Arrow
                # table zero-copy
                mtbl = ray.get(mref if mref is not None else ray.get(cell.get.remote())[0])
                if mtbl is None:
                    raise RuntimeError("mask rasterizer failed (see driver log)")
                skeys = mtbl["tile_key"].to_numpy()
                k = batch["tile_key"].to_numpy(zero_copy_only=False)
                taken = mtbl.take(pa.array(np.searchsorted(skeys, k)))
                return batch.append_column(
                    "mask", taken["mask"].combine_chunks()
                ).append_column("mask_any", taken["mask_any"].combine_chunks())

            ds = ds.map_batches(attach, batch_format="pyarrow")

    lineage = None
    if out_dir is not None:
        # dynamic sink sizing: bigger write batches on bigger clusters
        # coalesce each batch's per-part fragments (16-row fragments
        # observed at fixed 1024) without adding a shuffle; the part
        # remains the resume granule either way
        sink_rows = 1024 * max(1, int(ray.cluster_resources().get("CPU", 8)) // 8)
        try:
            lineage = lancelike.write_dataset(
                ds, out_dir, part_col="part_id", sort_key="tile_key",
                batch_rows=sink_rows)
        except BaseException:
            # a mask-thread failure surfaces in the sink as the cell's
            # generic error: prefer the real traceback
            if mask_thread is not None:
                mask_thread.join()
                if "err" in mask_box:
                    raise mask_box["err"] from None
            raise
        mark("sink")
        ds = lancelike.read_dataset(out_dir)
    if mask_thread is not None:
        # surface rasterizer errors for lazy consumers (out_dir=None
        # returns an unexecuted Dataset); masks are already published
        # through the cell, so this join costs nothing extra on the
        # sink path and bounds the no-sink path's error latency
        mask_thread.join()
        if "err" in mask_box:
            raise mask_box["err"]
    return ds, lineage


def run_expand_job(
    images_ds,
    feats: pa.Table,
    cfg: LabelJobConfig = LabelJobConfig(),
    train: int | None = None,
    valid: int | None = None,
):
    """make_expand re-expressed (SURVEY §3.2): hash-split lamps into
    train/valid; TRAIN positives/negatives become centered mosaic
    CROPS (256x256), VALID sets stay raw tiles — the train/valid
    asymmetry is part of the reference's output contract
    (make_expand.py:42-62,78-93).

    Returns a Dataset (req_id, label, split, kind, crop, crop_h,
    crop_w, n_missing).
    """
    import ray.data

    from osmray import mosaic
    from osmray.tilemath import wgs_at_tile

    train = train or int(cfg.limit * cfg.train_frac)
    valid = valid or cfg.limit - train

    # lamps: deterministic shuffle, first TRAIN are train, rest valid
    pos = filter_features(feats, "node", cfg.positive_tag)
    fid = pos["feature_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((fid, hash64(fid, cfg.seed)))
    lat_all = np.asarray([g[0] for g in pos["geom_lat"].to_pylist()])[order]
    lng_all = np.asarray([g[0] for g in pos["geom_lng"].to_pylist()])[order]
    fid = fid[order]
    t_lat, t_lng, t_id = lat_all[:train], lng_all[:train], fid[:train]
    v_lat, v_lng, v_id = lat_all[train : train + valid], lng_all[train : train + valid], fid[
        train : train + valid
    ]

    # negatives: painter complement, one sample split positionally into
    # the (disjoint) train then valid sets
    from osmray.tilemath import unpack_tile

    painted = painted_tile_set(feats, cfg, extra=pos)
    neg = sample_negative_tiles(painted, cfg, n=train + valid)
    ntx, nty, _ = unpack_tile(neg)
    n_lat, n_lng = wgs_at_tile(ntx, nty, cfg.z)  # tile-center re-centering

    # request table: req ids are small disjoint ranges (idx*4 + lane);
    # labels come from the config (not literals) so non-default
    # pos/neg labels keep the valid-positive skipedge branch working
    reqs = [
        (cfg.pos_label, "train", "crop", np.arange(len(t_id)) * 4 + 0, t_lat, t_lng),
        (cfg.pos_label, "valid", "tile", np.arange(len(v_id)) * 4 + 1, v_lat, v_lng),
        (cfg.neg_label, "train", "crop", np.arange(train) * 4 + 2, n_lat[:train], n_lng[:train]),
        (cfg.neg_label, "valid", "tile", np.arange(len(neg) - train) * 4 + 3, n_lat[train:], n_lng[train:]),
    ]

    assign = make_assign_tiles(cfg.z, cfg.scheme, cfg.edge)
    imgs = images_ds.map_batches(assign, batch_format="pyarrow")

    window_tables = []
    tags = {}
    for label, split, kind, rid, la, ln in reqs:
        if len(rid) == 0:
            continue
        if kind == "crop":
            windows = mosaic.point_windows(rid, la, ln, 256, 256, cfg.z, cfg.scheme)
        else:
            # raw containing tile; valid POSITIVES apply skipedge
            # (make_expand.py:55); valid negatives are raw downloads
            if label == cfg.pos_label:
                _, _, rx, ry = tile_at_wgs(la, ln, cfg.z, cfg.scheme)
                ok = edge_ok_fn(rx, ry, cfg.edge)
                rid, la, ln = rid[ok], la[ok], ln[ok]
            windows = mosaic.tile_windows(rid, la, ln, cfg.z, cfg.scheme)
        window_tables.append(windows)
        for r in rid.tolist():
            tags[int(r)] = (label, split, kind)

    # ONE gather over the streaming images table for all four lanes
    ds = mosaic.gather_crops(imgs, pa.concat_tables(window_tables), cfg.z, cfg.scheme)

    import ray

    tag_ref = ray.put(tags)

    def tag(batch: pa.Table) -> pa.Table:
        lut = ray.get(tag_ref)
        rids = batch["req_id"].to_pylist()
        labs, spls, kinds = zip(*(lut[int(r)] for r in rids))
        return (
            batch.append_column("label", pa.array(labs, pa.string()))
            .append_column("split", pa.array(spls, pa.string()))
            .append_column("kind", pa.array(kinds, pa.string()))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def run_roofshapes_job(
    images_ds,
    feats: pa.Table,
    cfg: LabelJobConfig | None = None,
    cap_to_min: bool = False,
):
    """make_roofshapes re-expressed (SURVEY §3.3 footnote): per-way
    padded mosaics for each roof:shape class, size-gated 128<=h,w<1024,
    with class counts (and optional balancing cap,
    make_roofshapes.py:27-43).

    Returns (crops_ds with label column, counts DataFrame).
    """
    import ray

    from osmray import mosaic
    from osmray.pipeline import filter_features

    cfg = cfg or LabelJobConfig()
    polys = filter_features(feats, "polygon")
    tags_col = _tags_get(polys["tags"], "roof:shape")
    keep = pa.array([t is not None for t in tags_col], pa.bool_())
    polys = polys.filter(keep)
    labels = [t for t in tags_col if t is not None]

    fid = polys["feature_id"].to_numpy(zero_copy_only=False)
    glat = polys["geom_lat"].to_pylist()
    glng = polys["geom_lng"].to_pylist()
    geoms = [np.stack([np.asarray(a), np.asarray(b)], axis=1) for a, b in zip(glat, glng)]

    import pandas as pd

    counts = (
        pd.Series(labels).value_counts().rename_axis("label").reset_index(name="n_ways")
    ).sort_values("n_ways")
    if cap_to_min and len(counts):
        cap = int(counts["n_ways"].min())
        sel_idx = []
        per: dict[str, int] = {}
        for i, lab in enumerate(labels):
            if per.get(lab, 0) < cap:
                per[lab] = per.get(lab, 0) + 1
                sel_idx.append(i)
        fid = fid[sel_idx]
        geoms = [geoms[i] for i in sel_idx]
        labels = [labels[i] for i in sel_idx]

    windows = mosaic.way_windows(fid.tolist(), geoms, cfg.z, cfg.scheme)
    assign = make_assign_tiles(cfg.z, cfg.scheme, cfg.edge)
    imgs = images_ds.map_batches(assign, batch_format="pyarrow")
    crops = mosaic.size_gate(mosaic.gather_crops(imgs, windows, cfg.z, cfg.scheme, max_grid=8))

    lab_ref = ray.put({int(f): l for f, l in zip(fid, labels)})

    def tag(batch: pa.Table) -> pa.Table:
        lut = ray.get(lab_ref)
        return batch.append_column(
            "label", pa.array([lut[int(r)] for r in batch["req_id"].to_pylist()], pa.string())
        )

    return crops.map_batches(tag, batch_format="pyarrow"), counts
