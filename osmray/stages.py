"""Ray Data stage kernels and actor classes.

Every per-record transform of the reference becomes a vectorized
``map_batches`` kernel over Arrow batches here; every stateful thing
(the reference's MercatorPainter canvas, lib/helpers.py:36-215) becomes
either a broadcast immutable index read in an actor pool's
``__init__`` or explicit keyed dataflow (groupby / anti-join /
deterministic sampling) — never shared mutable state.

Kernels (stateless tasks):
  assign_tiles        point -> (tx, ty, rx, ry, tile_key, cell, edge_ok)
                      (lib/layers.py:107-143 semantics)
  rasterize_painted   features batch -> painted tile keys
                      (the distributed MercatorPainter)
  decode_roundtrip    bytes -> pixels -> bytes (+ psnr / phash verify)

Actors (stateful pools):
  MaskStage           holds the broadcast FeatureIndex; emits per-tile
                      256x256 label masks + PIP / kNN columns
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmray import cells as cellmod
from osmray import codecs, raster
from osmray.geom import FeatureIndex
from osmray.tilemath import (
    TILESIZE,
    PLAIN,
    TileScheme,
    edge_ok,
    pack_tile,
    project2web,
    tile_at_wgs,
)

# splitmix64-style integer hash: the engine's deterministic stand-in for
# the reference's random.shuffle (seeded sampling must be reproducible
# across parallelism levels; SURVEY §2.7)
_H1 = np.uint64(0xBF58476D1CE4E5B9)
_H2 = np.uint64(0x94D049BB133111EB)


def hash64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    v = np.asarray(x, dtype=np.int64).astype(np.uint64) + np.uint64(
        (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    )
    v ^= v >> np.uint64(30)
    v *= _H1
    v ^= v >> np.uint64(27)
    v *= _H2
    v ^= v >> np.uint64(31)
    return v.astype(np.int64)


def hash_str(ids, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of a string column (crc32 pair mix —
    stable across processes, unlike Python's hash())."""
    import zlib

    vals = np.asarray(
        [
            (zlib.crc32(s.encode()) << 32) | zlib.crc32(s.encode()[::-1])
            for s in (ids.to_pylist() if hasattr(ids, "to_pylist") else ids)
        ],
        dtype=np.uint64,
    ).astype(np.int64)
    return hash64(vals, seed)


def make_assign_tiles(z: int, scheme: TileScheme = PLAIN, edge: int = 16, res: int = cellmod.COARSE_RES):
    """Stage factory: append tile-assignment columns to an images batch
    (requires lat/lng columns). Pure numpy; zero-copy Arrow in/out."""

    def assign(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        tx, ty, rx, ry = tile_at_wgs(lat, lng, z, scheme)
        cell = cellmod.cell_of_tile(tx, ty, z, res)
        return (
            batch.append_column("z", pa.array(np.full(len(tx), z, dtype=np.int8)))
            .append_column("tx", pa.array(tx))
            .append_column("ty", pa.array(ty))
            .append_column("rx", pa.array(rx))
            .append_column("ry", pa.array(ry))
            .append_column("tile_key", pa.array(pack_tile(tx, ty, z)))
            .append_column("cell", pa.array(cell))
            .append_column("edge_ok", pa.array(edge_ok(rx, ry, edge)))
        )

    return assign


def geom_arrays(batch: pa.Table) -> tuple[np.ndarray, list, list[np.ndarray]]:
    """Unpack a features batch into (feature_id, kind, [(n,2) latlng])."""
    fid = batch["feature_id"].to_numpy(zero_copy_only=False)
    kinds = batch["kind"].to_pylist()
    glat = batch["geom_lat"].to_pylist()
    glng = batch["geom_lng"].to_pylist()
    geoms = [np.stack([np.asarray(a), np.asarray(b)], axis=1) for a, b in zip(glat, glng)]
    return fid, kinds, geoms


def make_rasterize_painted(
    z: int,
    scheme: TileScheme,
    canvas_window: tuple[int, int, int, int],
    kinds_widths: dict[str, int] | None = None,
    fill_exclusions: bool = True,
):
    """Stage factory: features batch -> painted (tx, ty, tile_key) rows.

    The distributed MercatorPainter: each batch rasterizes its features
    onto a LOCAL canvas covering only the union bbox of the batch's
    geometry (clipped to the global canvas window), then emits painted
    tile keys; downstream dedups with a shuffle-free ``unique`` on the
    packed key. ``canvas_window`` = (txmin, tymin, txmax, tymax)
    inclusive, the reference's whole-bbox canvas (lib/helpers.py:42-55)
    — painting outside it is dropped, matching the canvas bounds.
    """
    kinds_widths = kinds_widths or {"node": 1, "way": 2, "polygon": 1}
    txmin, tymin, txmax, tymax = canvas_window

    def rasterize(batch: pa.Table) -> pa.Table:
        _, kinds, geoms = geom_arrays(batch)
        keep_kinds, tile_pts = [], []
        gxmin = gymin = 1 << 60
        gxmax = gymax = -(1 << 60)
        for kind, g in zip(kinds, geoms):
            if kind == "exclusion" and not fill_exclusions:
                continue
            if kind not in ("node", "way", "polygon", "exclusion"):
                continue
            tx, ty, _, _ = tile_at_wgs(g[:, 0], g[:, 1], z, scheme)
            pts = np.stack([tx, ty], axis=1)
            keep_kinds.append(kind)
            tile_pts.append(pts)
            gxmin = min(gxmin, int(tx.min()))
            gxmax = max(gxmax, int(tx.max()))
            gymin = min(gymin, int(ty.min()))
            gymax = max(gymax, int(ty.max()))
        if not keep_kinds:
            return pa.table({"tx": pa.array([], pa.int64()), "ty": pa.array([], pa.int64()),
                             "tile_key": pa.array([], pa.int64())})
        # local window = batch bbox (pad for stroke width) clipped to canvas
        pad = 2
        wx0 = max(txmin, gxmin - pad)
        wy0 = max(tymin, gymin - pad)
        wx1 = min(txmax, gxmax + pad)
        wy1 = min(tymax, gymax + pad)
        if wx1 < wx0 or wy1 < wy0:
            return pa.table({"tx": pa.array([], pa.int64()), "ty": pa.array([], pa.int64()),
                             "tile_key": pa.array([], pa.int64())})
        local = [p - np.array([wx0, wy0]) for p in tile_pts]
        painted = raster.painted_tile_keys(
            keep_kinds,
            local,
            x_off=wx0,
            y_off=wy0,
            width=wx1 - wx0 + 1,
            height=wy1 - wy0 + 1,
            line_width_ways=kinds_widths.get("way", 2),
            line_width_polygons=kinds_widths.get("polygon", 1),
        )
        tx = painted[:, 0]
        ty = painted[:, 1]
        return pa.table(
            {"tx": pa.array(tx), "ty": pa.array(ty), "tile_key": pa.array(pack_tile(tx, ty, z))}
        )

    return rasterize


def decode_roundtrip(batch: pa.Table, strict: bool = False, recompress: bool = True) -> pa.Table:
    """Decode -> verify phash -> re-encode. Appends ``psnr_ok`` (the
    >=40 dB input_hint gate; lossless formats round-trip bit-exact),
    ``phash_ok`` and ``decode_ok``; replaces ``bytes`` with the
    re-encoded pixels so the output provably went through the decoder.

    ``recompress`` (default on): uncompressed ``raw`` payloads are
    re-encoded as PNG deflate-level-1 and their ``fmt`` updated —
    pixels stay bit-exact (PNG is lossless; pinned by
    tests/test_codecs.py) while the encoded row shrinks ~190 KB ->
    ~6 KB, so every downstream hop (mask attach, object-store copy,
    sink write) moves ~30x fewer bytes. At 32 cores the payload chain
    is memory-bus-bound, so trading ~0.4 ms of deflate CPU per row
    for the byte cut is the right side of the trade. Pass
    ``recompress=False`` to preserve the input's storage format.

    Resilience: a 10^12-row job must not die on one corrupt blob —
    by default decode failures keep the row with ``decode_ok=False``
    and the ORIGINAL bytes (quarantine downstream on the flag);
    ``strict=True`` re-raises instead."""
    blobs = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    phs = batch["phash"].to_numpy(zero_copy_only=False)
    out_blobs, out_fmts, psnr_ok, phash_ok, dec_ok = [], [], [], [], []
    for blob, fmt, ph in zip(blobs, fmts, phs):
        try:
            img = codecs.decode(blob, fmt)
        except NotImplementedError:
            raise  # stubbed codecs are a configuration error, not data
        except Exception:
            if strict:
                raise
            out_blobs.append(blob)
            out_fmts.append(fmt)
            psnr_ok.append(False)
            phash_ok.append(False)
            dec_ok.append(False)
            continue
        ofmt = "png" if (recompress and fmt == "raw") else fmt
        # fast deflate + up filter: ~3x smaller PNG rows at the same
        # encode cost (decode has a vectorized all-up path)
        filt = 2 if ofmt == "png" else 0
        out = codecs.encode(img, ofmt, level=1, filt=filt)
        if ofmt in ("png", "raw"):
            # lossless codecs round-trip bit-exact by construction
            # (locked by tests/test_codecs.py); PSNR is trivially inf
            psnr_ok.append(True)
        else:
            psnr_ok.append(codecs.psnr(img, codecs.decode(out, ofmt)) >= 40.0)
        phash_ok.append(int(codecs.phash(img)) == int(ph))
        dec_ok.append(True)
        out_blobs.append(out)
        out_fmts.append(ofmt)
    i = batch.schema.get_field_index("bytes")
    out = batch.set_column(i, "bytes", pa.array(out_blobs, pa.binary()))
    j = out.schema.get_field_index("fmt")
    return (
        out.set_column(j, "fmt", pa.array(out_fmts, pa.string()))
        .append_column("psnr_ok", pa.array(psnr_ok, pa.bool_()))
        .append_column("phash_ok", pa.array(phash_ok, pa.bool_()))
        .append_column("decode_ok", pa.array(dec_ok, pa.bool_()))
    )


# worker-global cache for broadcast FeatureIndex objects: plain-task
# rasterization (pipeline.run_label_job's bounded regime) passes the
# index as [ObjectRef] so repeated tasks landing on the same warm
# worker deserialize it once, like an actor would
_INDEX_CACHE: dict[str, object] = {}


def cached_index(ref_list):
    """Resolve ``[ObjectRef]`` (or a bare index/table) to a
    FeatureIndex, memoized per worker process by ref id."""
    if not isinstance(ref_list, list):
        return ref_list
    import ray

    ref = ref_list[0]
    key = ref.hex()
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        if len(_INDEX_CACHE) > 4:  # bound worker memory across jobs
            _INDEX_CACHE.clear()
        idx = ray.get(ref)
        _INDEX_CACHE[key] = idx
    return idx


class MaskStage:
    """Actor-pool stage: per-tile 256x256 label masks.

    ``__init__`` runs once per actor: fetch the broadcast features
    table ref, build the cell-bucketed FeatureIndex (the prepared
    MercatorPainter successor). ``__call__`` runs per batch: for each
    image row, collect candidate features from the tile's coarse cell
    (k_ring(1) so strokes crossing cell borders aren't missed),
    project geometry to in-tile pixel coordinates at zoom z, rasterize
    (dots / width-2 ways / outline polygons / filled exclusions) and
    emit the PNG-encoded mask plus ``mask_any`` (tile touched by any
    feature).
    """

    def __init__(self, features_ref, z: int, scheme: TileScheme = PLAIN, res: int = cellmod.COARSE_RES):
        import ray

        obj = ray.get(features_ref) if not isinstance(features_ref, (pa.Table, FeatureIndex)) else features_ref
        if isinstance(obj, FeatureIndex):
            # prebuilt index broadcast from the driver: build once,
            # fetch per actor (cheaper ramp-up than rebuilding)
            self.index = obj
        else:
            self.index = FeatureIndex.from_table(obj, res)
        self.z = z
        self.scheme = scheme
        self.res = self.index.res if isinstance(obj, FeatureIndex) else res
        self._cell_cache: dict[int, tuple] = {}
        self._canvas_cache: dict[int, tuple] = {}

    # stroke widths are <= 2 px and stamps are <= 2x2: a feature whose
    # projected bbox misses the tile rect by more than this pad cannot
    # paint any tile pixel (draws clip; bbox of vertices contains every
    # segment and the fill interior)
    _BBOX_PAD = 4.0

    def _cell_candidates(self, cell: int):
        """Per-cell candidate prep, cached per actor: project every
        k_ring(1) candidate's geometry to GLOBAL z-pixels once, with a
        per-feature bbox. Each tile then draws only the features whose
        bbox intersects it (vectorized reject) — sampled tile sets are
        sparse, so most of a cell's candidates never touch a given
        tile."""
        hit = self._cell_cache.get(cell)
        if hit is None:
            ids, cands = self.index.candidates(cellmod.k_ring(cell, 1))
            scale = float(1 << self.z)
            kinds, pxs = [], []
            bb = np.empty((len(ids), 4), dtype=np.float64)
            for i, (_fid, (kind, web, _wgs)) in enumerate(zip(ids, cands)):
                px = (web[:, 0] + self.scheme.offsetx) * scale
                py = (web[:, 1] + self.scheme.offsety) * scale
                kinds.append(kind)
                pxs.append(np.stack([px, py], axis=1))
                bb[i] = (px.min(), py.min(), px.max(), py.max())
            if len(self._cell_cache) > 512:  # bound actor memory (entries
                self._cell_cache.clear()  # are small projected point lists)
            hit = (kinds, pxs, bb)
            self._cell_cache[cell] = hit
        return hit

    def _cell_canvas(self, cell: int) -> tuple[np.ndarray, int, int]:
        """Rasterize ALL candidate features of a cell ONCE onto a
        canvas covering the whole cell (cell_tiles x 256 px per side);
        every tile's mask is then a memcpy slice. Exact: the pixel walk
        and stamps are translation-invariant, and raster clipping means
        paint inside the cell can only come from k_ring(1) candidates.
        Used for cells DENSE in requested tiles (the canvas cost
        amortizes); sparse cells take the bbox-pruned per-tile path."""
        hit = self._canvas_cache.get(cell)
        if hit is None:
            x, y, res = (int(v[0]) for v in cellmod.unpack(np.asarray([cell])))
            span = 1 << (self.z - res)  # tiles per cell edge
            cx0 = x * span * TILESIZE  # global px of cell origin at z
            cy0 = y * span * TILESIZE
            size = span * TILESIZE
            canvas = np.zeros((size, size), dtype=np.uint8)
            kinds, pxs, _bb = self._cell_candidates(cell)
            # one batched draw per stroke width (all draws write the
            # same value, so cross-feature order is irrelevant)
            dots_x, dots_y, ways, polys = [], [], [], []
            for kind, p in zip(kinds, pxs):
                pts = np.stack(
                    [np.floor(p[:, 0]) - cx0, np.floor(p[:, 1]) - cy0], axis=1
                ).astype(np.int64)
                if kind == "node":
                    dots_x.append(pts[:, 0])
                    dots_y.append(pts[:, 1])
                elif kind == "way":
                    ways.append(pts)
                elif kind == "polygon":
                    polys.append(pts)
                elif kind == "exclusion":
                    raster.fill_poly(canvas, pts)
            if dots_x:
                raster.stamp(canvas, np.concatenate(dots_x), np.concatenate(dots_y), 1)
            raster.draw_polylines(canvas, ways, width=2, closed=True)
            raster.draw_polylines(canvas, polys, width=1, closed=True)
            if len(self._canvas_cache) > 32:  # bound actor memory (~32 MB)
                self._canvas_cache.clear()
            hit = (canvas, cx0, cy0)
            self._canvas_cache[cell] = hit
        return hit

    def _mask_for_tile(self, tx: int, ty: int, n_in_cell: int = 1) -> np.ndarray:
        cell = int(cellmod.cell_of_tile(np.array([tx]), np.array([ty]), self.z, self.res)[0])
        if n_in_cell >= 4 and self.z - self.res <= 4:
            canvas, cx0, cy0 = self._cell_canvas(cell)
            ox = tx * TILESIZE - cx0
            oy = ty * TILESIZE - cy0
            return canvas[oy : oy + TILESIZE, ox : ox + TILESIZE]
        kinds, pxs, bb = self._cell_candidates(cell)
        canvas = np.zeros((TILESIZE, TILESIZE), dtype=np.uint8)
        if not kinds:
            return canvas
        x0 = tx * TILESIZE
        y0 = ty * TILESIZE
        pad = self._BBOX_PAD
        keep = np.flatnonzero(
            (bb[:, 0] <= x0 + TILESIZE - 1 + pad)
            & (bb[:, 2] >= x0 - pad)
            & (bb[:, 1] <= y0 + TILESIZE - 1 + pad)
            & (bb[:, 3] >= y0 - pad)
        )
        for i in keep:
            p = pxs[i]
            # floor(global) - int origin == floor(global - origin)
            pts = np.stack(
                [np.floor(p[:, 0]) - x0, np.floor(p[:, 1]) - y0], axis=1
            ).astype(np.int64)
            kind = kinds[i]
            if kind == "node":
                raster.stamp(canvas, pts[:, 0], pts[:, 1], 1)
            elif kind == "way":
                raster.draw_polyline(canvas, pts, width=2, closed=True)
            elif kind == "polygon":
                raster.draw_polyline(canvas, pts, width=1, closed=True)
            elif kind == "exclusion":
                raster.fill_poly(canvas, pts)
        return canvas

    def __call__(self, batch: pa.Table) -> pa.Table:
        txs = batch["tx"].to_numpy(zero_copy_only=False)
        tys = batch["ty"].to_numpy(zero_copy_only=False)
        masks, any_flags = [], []
        cache: dict[tuple[int, int], tuple[bytes, bool]] = {}
        # visit tiles in cell order so the per-cell canvas cache hits;
        # emit in the batch's row order
        masks = [b""] * len(txs)
        any_flags = [False] * len(txs)
        cells = cellmod.cell_of_tile(txs, tys, self.z, self.res)
        order = np.argsort(cells, kind="stable")
        # per-cell batch density decides canvas-vs-pruned rasterization
        _, counts = np.unique(cells, return_counts=True)
        n_in_cell = dict(zip(np.unique(cells).tolist(), counts.tolist()))
        empty: tuple[bytes, bool] | None = None
        for j in order:
            key = (int(txs[j]), int(tys[j]))
            hit = cache.get(key)
            if hit is None:
                canvas = self._mask_for_tile(*key, n_in_cell=n_in_cell[int(cells[j])])
                if canvas.any():
                    hit = (codecs.png_encode(canvas, level=1), True)
                else:
                    # untouched tiles (most sampled negatives) share
                    # one encoded all-zero mask — skips the PNG encode
                    if empty is None:
                        empty = (codecs.png_encode(canvas, level=1), False)
                    hit = empty
                cache[key] = hit
            masks[j] = hit[0]
            any_flags[j] = hit[1]
        return batch.append_column("mask", pa.array(masks, pa.binary())).append_column(
            "mask_any", pa.array(any_flags, pa.bool_())
        )


class KnnStage:
    """Actor-pool stage: k nearest features per image point via cell
    ring expansion (north_rule's nearest-feature lookup). Emits
    ``knn_ids: list<int64>`` and ``knn_d2: list<float64>``."""

    def __init__(self, features_ref, k: int = 3, res: int = cellmod.COARSE_RES):
        import ray

        feats = ray.get(features_ref) if not isinstance(features_ref, pa.Table) else features_ref
        self.index = FeatureIndex.from_table(feats, res)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        # batched: points grouped per cell, one ring expansion per
        # group, (points x segments) vectorized distances
        ids, d2 = self.index.knn_batch(lat, lng, self.k)
        return batch.append_column(
            "knn_ids", pa.array([v.tolist() for v in ids], pa.list_(pa.int64()))
        ).append_column("knn_d2", pa.array([v.tolist() for v in d2], pa.list_(pa.float64())))


class PipStage:
    """Actor-pool stage: analytic point-in-polygon against the
    broadcast index; emits ``pip_ids: list<int64>`` of containing
    polygon features per image point."""

    def __init__(self, features_ref, res: int = cellmod.COARSE_RES):
        import ray

        feats = ray.get(features_ref) if not isinstance(features_ref, pa.Table) else features_ref
        self.index = FeatureIndex.from_table(feats, res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        hits = self.index.pip(lat, lng)
        return batch.append_column(
            "pip_ids", pa.array([h.tolist() for h in hits], pa.list_(pa.int64()))
        )
