"""Mosaic / crop gather: assemble multi-tile viewports around points
or bboxes from the images table and cut exact pixel windows — the Ray
dataflow replacement for the reference's tile-download mosaics
(gettiles_wgs/getcrop_wgs lib/layers.py:180-210, tiles_box_wc :212-243,
tiles_way :245-272).

Dataflow:
  requests (small, bounded by sampling limits)
    -> explode: one row per (req, grid slot) tile            [driver]
    -> broadcast {tile_key -> [(req, slot)]}; stream images,
       emit matched (req_id, slot, bytes, fmt)               [map_batches]
    -> groupby(req_id): assemble grid, exact crop, encode    [keyed shuffle
       bounded by requests x grid size]

Semantic parity notes (frozen against the reference):
- the viewport cover uses ``h`` for BOTH axes' half-extents
  (lib/layers.py:155-158) — preserved via tilemath.tiles_near_web;
- crop rect: ``[cy-h//2 : cy+h//2, cx-w//2 : cx+w//2]`` with the
  center rounded relative to the grid's top-left (lib/layers.py:175-176,
  203-210);
- way windows: web bbox + max(pct, px) padding then ``%= 256``
  wraparound (lib/layers.py:258-270) — correct only away from the
  antimeridian, preserved as documented reference behavior;
- missing tiles stay BLACK (np.zeros) — the reference guarantees tile
  presence by downloading; a table-input engine cannot, so absent
  imagery is zero-filled and flagged in ``n_missing``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmray import codecs
from osmray.tilemath import TILESIZE, PLAIN, TileScheme, pack_tile, project2web, tile_at_web


def point_windows(
    req_ids: np.ndarray, lat: np.ndarray, lng: np.ndarray, h: int, w: int, z: int,
    scheme: TileScheme = PLAIN,
) -> pa.Table:
    """Viewport windows around points: one row per request with the
    tile-grid extent and the crop rect (in grid pixels)."""
    wx, wy = project2web(lat, lng)
    scale = float(1 << z)
    px = (wx + scheme.offsetx) * scale
    py = (wy + scheme.offsety) * scale
    txmin = np.floor((px - h / 2) / TILESIZE).astype(np.int64)
    txmax = np.floor((px + h / 2) / TILESIZE).astype(np.int64)
    tymin = np.floor((py - h / 2) / TILESIZE).astype(np.int64)
    tymax = np.floor((py + h / 2) / TILESIZE).astype(np.int64)
    # center in grid pixels, then the reference's crop rect
    cx = np.asarray([round(v) for v in (px - txmin * TILESIZE)], dtype=np.int64)
    cy = np.asarray([round(v) for v in (py - tymin * TILESIZE)], dtype=np.int64)
    return pa.table(
        {
            "req_id": pa.array(np.asarray(req_ids, dtype=np.int64)),
            "txmin": pa.array(txmin),
            "txmax": pa.array(txmax),
            "tymin": pa.array(tymin),
            "tymax": pa.array(tymax),
            "x0": pa.array(cx - w // 2),
            "x1": pa.array(cx + w // 2),
            "y0": pa.array(cy - h // 2),
            "y1": pa.array(cy + h // 2),
        }
    )


def tile_windows(
    req_ids: np.ndarray, lat: np.ndarray, lng: np.ndarray, z: int,
    scheme: TileScheme = PLAIN,
) -> pa.Table:
    """Raw-tile windows: a 1x1 grid over the CONTAINING tile with a
    full-tile crop — the gettile_wgs path (lib/layers.py:120-143) for
    the reference's valid sets (make_expand.py:52-62,88-93)."""
    wx, wy = project2web(lat, lng)
    tx, ty, _, _ = tile_at_web(wx, wy, z, scheme)
    n = len(tx)
    return pa.table(
        {
            "req_id": pa.array(np.asarray(req_ids, dtype=np.int64)),
            "txmin": pa.array(tx),
            "txmax": pa.array(tx),
            "tymin": pa.array(ty),
            "tymax": pa.array(ty),
            "x0": pa.array(np.zeros(n, dtype=np.int64)),
            "x1": pa.array(np.full(n, TILESIZE, dtype=np.int64)),
            "y0": pa.array(np.zeros(n, dtype=np.int64)),
            "y1": pa.array(np.full(n, TILESIZE, dtype=np.int64)),
        }
    )


def way_windows(
    req_ids: list[int], geoms_latlng: list[np.ndarray], z: int,
    scheme: TileScheme = PLAIN, pad_pct: float = 0.25, pad_px: int = 48,
) -> pa.Table:
    """Per-way padded bbox windows (tiles_way semantics incl. the
    %=256 wrap and the min-pixel padding, lib/layers.py:245-272)."""
    rows = {k: [] for k in ("req_id", "txmin", "txmax", "tymin", "tymax", "x0", "x1", "y0", "y1")}
    scale = 1 << z
    for rid, g in zip(req_ids, geoms_latlng):
        wx, wy = project2web(g[:, 0], g[:, 1])
        W, E = float(wx.min()), float(wx.max())
        N, S = float(wy.min()), float(wy.max())
        pad_WE = max((E - W) * pad_pct, pad_px / scale)
        pad_NS = max((S - N) * pad_pct, pad_px / scale)
        W = (W - pad_WE) % 256
        E = (E + pad_WE) % 256
        N = (N - pad_NS) % 256
        S = (S + pad_NS) % 256
        txmin, tymin, pN, pW = (v[0] for v in tile_at_web(np.array([W]), np.array([N]), z, scheme))
        txmax, tymax, pS, pE = (v[0] for v in tile_at_web(np.array([E]), np.array([S]), z, scheme))
        wtiles = int(txmax - txmin + 1)
        htiles = int(tymax - tymin + 1)
        rows["req_id"].append(rid)
        rows["txmin"].append(int(txmin))
        rows["txmax"].append(int(txmax))
        rows["tymin"].append(int(tymin))
        rows["tymax"].append(int(tymax))
        # the reference's crop rect (incl. its rx/ry naming crossover,
        # lib/layers.py:215-216,232-235)
        rows["x0"].append(round(float(pN)))
        rows["y0"].append(round(float(pW)))
        rows["x1"].append(wtiles * TILESIZE - TILESIZE + round(float(pS)))
        rows["y1"].append(htiles * TILESIZE - TILESIZE + round(float(pE)))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})


def gather_crops(
    images_ds,
    windows: pa.Table,
    z: int,
    scheme: TileScheme = PLAIN,
    out_fmt: str = "png",
    max_grid: int = 16,
):
    """Assemble + crop every window from the streaming images table.

    Returns a Dataset (req_id, crop: binary, crop_h, crop_w,
    n_tiles, n_missing, rejected). Windows wider than ``max_grid``
    tiles per axis are rejected (guards runaway mosaics; the
    reference's roofshapes gate rejects big ones post-hoc,
    make_roofshapes.py:42) — each rejected request still emits a row
    (empty crop, n_tiles=0, rejected=True) so no req_id silently
    vanishes and downstream class counts reconcile.
    """
    import ray

    req = {k: windows[k].to_numpy() for k in windows.schema.names}
    want: dict[int, list[tuple[int, int, int]]] = {}
    meta: dict[int, tuple] = {}
    rejected_rids: list[int] = []
    for i in range(windows.num_rows):
        rid = int(req["req_id"][i])
        txmin, txmax = int(req["txmin"][i]), int(req["txmax"][i])
        tymin, tymax = int(req["tymin"][i]), int(req["tymax"][i])
        if txmax - txmin + 1 > max_grid or tymax - tymin + 1 > max_grid:
            rejected_rids.append(rid)
            continue
        meta[rid] = (
            txmin, tymin, txmax - txmin + 1, tymax - tymin + 1,
            int(req["x0"][i]), int(req["x1"][i]), int(req["y0"][i]), int(req["y1"][i]),
        )
        for ty in range(tymin, tymax + 1):
            for tx in range(txmin, txmax + 1):
                key = int(pack_tile(np.array([tx]), np.array([ty]), z)[0])
                want.setdefault(key, []).append((rid, tx - txmin, ty - tymin))
    want_ref = ray.put(want)
    meta_ref = ray.put(meta)

    def match(batch: pa.Table) -> pa.Table:
        lut = ray.get(want_ref)
        keys = batch["tile_key"].to_numpy(zero_copy_only=False)
        out = {"req_id": [], "col": [], "row": [], "bytes": [], "fmt": [], "image_id": []}
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        # per-BLOCK winner: smallest image_id; the cross-block winner
        # is resolved deterministically in assemble (same rule)
        order = np.argsort(np.asarray(ids))
        seen: set[int] = set()
        for j in order:
            k = int(keys[j])
            slots = lut.get(k)
            if slots is None or k in seen:
                continue
            seen.add(k)
            for rid, col, row in slots:
                out["req_id"].append(rid)
                out["col"].append(col)
                out["row"].append(row)
                out["bytes"].append(blobs[j])
                out["fmt"].append(fmts[j])
                out["image_id"].append(ids[j])
        return pa.table(
            {
                "req_id": pa.array(out["req_id"], pa.int64()),
                "col": pa.array(out["col"], pa.int32()),
                "row": pa.array(out["row"], pa.int32()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "image_id": pa.array(out["image_id"], pa.string()),
            }
        )

    def assemble(g: pa.Table) -> pa.Table:
        m = ray.get(meta_ref)
        rid = int(g["req_id"][0].as_py())
        txmin, tymin, wtiles, htiles, x0, x1, y0, y1 = m[rid]
        canvas = np.zeros((htiles * TILESIZE, wtiles * TILESIZE, 3), dtype=np.uint8)
        filled = set()
        # cross-block dedup must be DETERMINISTIC (group rows arrive in
        # arbitrary block order): smallest image_id wins per slot
        order = np.argsort(
            np.asarray(g["image_id"].to_pylist(), dtype=object), kind="stable"
        )
        rows = g["row"].to_numpy(zero_copy_only=False)
        cols = g["col"].to_numpy(zero_copy_only=False)
        byts = g["bytes"].to_pylist()
        fmts = g["fmt"].to_pylist()
        for i in order.tolist():
            slot = (int(rows[i]), int(cols[i]))
            if slot in filled:
                continue
            filled.add(slot)
            img = codecs.decode(byts[i], fmts[i])
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            yy, xx = slot[0] * TILESIZE, slot[1] * TILESIZE
            canvas[yy : yy + TILESIZE, xx : xx + TILESIZE, :] = img
        crop = canvas[max(0, y0) : max(0, y1), max(0, x0) : max(0, x1), :]
        return pa.table(
            {
                "req_id": pa.array([rid], pa.int64()),
                "crop": pa.array(
                    [codecs.encode(np.ascontiguousarray(crop), out_fmt, level=1)], pa.binary()  # fast deflate, lossless
                ),
                "crop_h": pa.array([crop.shape[0]], pa.int64()),
                "crop_w": pa.array([crop.shape[1]], pa.int64()),
                "n_tiles": pa.array([wtiles * htiles], pa.int64()),
                "n_missing": pa.array([wtiles * htiles - len(filled)], pa.int64()),
                "rejected": pa.array([False], pa.bool_()),
            }
        )

    matched = images_ds.map_batches(match, batch_format="pyarrow")
    out = matched.groupby("req_id").map_groups(assemble, batch_format="pyarrow")
    if rejected_rids:
        import ray.data

        nrej = len(rejected_rids)
        rej = pa.table(
            {
                "req_id": pa.array([int(r) for r in rejected_rids], pa.int64()),
                "crop": pa.array([b""] * nrej, pa.binary()),
                "crop_h": pa.array([0] * nrej, pa.int64()),
                "crop_w": pa.array([0] * nrej, pa.int64()),
                "n_tiles": pa.array([0] * nrej, pa.int64()),
                "n_missing": pa.array([0] * nrej, pa.int64()),
                "rejected": pa.array([True] * nrej, pa.bool_()),
            }
        )
        out = out.union(ray.data.from_arrow(rej))
    return out


def size_gate(ds, lo: int = 128, hi: int = 1024):
    """The roofshapes keep-gate: 128 <= h, w < 1024 (the inverse of
    helpers.outside, make_roofshapes.py:40-43)."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        h = batch["crop_h"]
        w = batch["crop_w"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(h, lo), pc.less(h, hi)),
            pc.and_(pc.greater_equal(w, lo), pc.less(w, hi)),
        )
        return batch.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")
