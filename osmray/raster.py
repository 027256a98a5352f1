"""Vectorized raster kernels: 4-connected polylines, even-odd scanline
fill, dots — the engine's replacement for the reference's cv2 calls
(cv2.polylines/fillPoly with ``lineType=4``, lib/helpers.py:67-94) and
the basis of both the 1-px-per-tile "painted tile set" and the per-tile
256x256 label masks (north_rule: "rasterizes matched polygons into
per-tile label masks via scanline fill").

Semantics are frozen by ``osmray.oracle`` golden parity tests:
- line pixels = grid-crossing walk of the center-to-center segment,
  one axis per step (4-connected), ties stepping x first;
- polylines are closed rings (the reference always passes closed=True,
  lib/helpers.py:88);
- polygon fill = even-odd scanline at integer row coordinates plus the
  width-1 closed outline (boundary included);
- thickness = square stamp per line pixel (top-left anchored for
  width 2, centered for odd widths).

Everything here operates on unbounded integer pixel coordinates and an
explicit canvas window ``(x_off, y_off, width, height)`` so the same
kernels serve whole-bbox tile canvases and single-tile pixel masks;
out-of-window pixels are clipped, never wrapped.
"""

from __future__ import annotations

import numpy as np


def line4_pixels(x0: int, y0: int, x1: int, y1: int) -> tuple[np.ndarray, np.ndarray]:
    """All pixels of the 4-connected segment, endpoints inclusive, in
    walk order — vectorized (no per-pixel Python loop).

    The walk takes exactly |dx|+|dy| steps; the k-th step's axis is
    found by merge-sorting the vertical crossings ((2i+1)*dy) and
    horizontal crossings ((2j+1)*dx) of the ideal segment, ties x
    first — identical pixel set to ``oracle.draw_line4``.
    """
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x1 >= x0 else -1
    sy = 1 if y1 >= y0 else -1
    if dx == 0 and dy == 0:
        return np.asarray([x0], dtype=np.int64), np.asarray([y0], dtype=np.int64)
    # crossing keys; doubling + parity encodes the "x wins ties" rule
    kx = (2 * np.arange(dx, dtype=np.int64) + 1) * dy * 2
    ky = (2 * np.arange(dy, dtype=np.int64) + 1) * dx * 2 + 1
    order = np.argsort(np.concatenate([kx, ky]), kind="stable")
    is_y = order >= dx
    xs = np.empty(dx + dy + 1, dtype=np.int64)
    ys = np.empty(dx + dy + 1, dtype=np.int64)
    xs[0], ys[0] = x0, y0
    xs[1:] = x0 + sx * np.cumsum(~is_y)
    ys[1:] = y0 + sy * np.cumsum(is_y)
    return xs, ys


def stamp(
    canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray, width: int = 1, value: int = 255
) -> None:
    """Paint a square ``width x width`` stamp at every (x, y), clipped
    to the canvas. width 2 anchors top-left, odd widths center —
    matching ``oracle.draw_dot``."""
    h, w = canvas.shape
    off = (width - 1) // 2
    for dy in range(width):
        for dx in range(width):
            px = xs + (dx - off)
            py = ys + (dy - off)
            keep = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            canvas[py[keep], px[keep]] = value


def draw_polyline(
    canvas: np.ndarray,
    pts: np.ndarray,
    width: int = 1,
    closed: bool = True,
    value: int = 255,
) -> None:
    """Closed/open polyline through int pixel points (N x 2 array).

    Segments whose bbox cannot touch the canvas are skipped before
    pixel generation — EXACT, because a 4-connected walk's pixels lie
    within the endpoints' bbox and a width-w stamp spills at most w
    pixels. A geometry many times larger than the canvas (a long way
    crossing one tile) costs O(segments near the tile), not O(total
    length)."""
    pts = np.asarray(pts, dtype=np.int64)
    n = len(pts)
    if n == 0:
        return
    if n == 1:
        stamp(canvas, pts[:1, 0], pts[:1, 1], width, value)
        return
    h, w = canvas.shape
    pad = width + 1
    x0 = pts[:, 0]
    y0 = pts[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    if not closed:
        x0, y0, x1, y1 = x0[:-1], y0[:-1], x1[:-1], y1[:-1]
    near = (
        (np.maximum(x0, x1) >= -pad)
        & (np.minimum(x0, x1) < w + pad)
        & (np.maximum(y0, y1) >= -pad)
        & (np.minimum(y0, y1) < h + pad)
    )
    idx = np.flatnonzero(near)
    if len(idx) == 0:
        return
    all_x, all_y = [], []
    for i in idx:
        xs, ys = line4_pixels(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        all_x.append(xs)
        all_y.append(ys)
    stamp(canvas, np.concatenate(all_x), np.concatenate(all_y), width, value)


def fill_poly(canvas: np.ndarray, pts: np.ndarray, value: int = 255) -> None:
    """Even-odd scanline fill at integer row coordinates + closed
    width-1 outline. Vectorized over scanlines: all edge/row
    intersections computed in one numpy pass."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n == 0:
        return
    h, w = canvas.shape
    x0 = pts[:, 0]
    y0 = pts[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    keep = y0 != y1
    x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
    if len(x0):
        # only rows the polygon can cross (clip to canvas)
        ylo = max(0, int(np.ceil(np.minimum(y0, y1).min())))
        yhi = min(h - 1, int(np.floor(np.maximum(y0, y1).max())))
        if yhi >= ylo:
            rows = np.arange(ylo, yhi + 1, dtype=np.float64)
            # edge e crosses row y iff min(y0,y1) <= y < max(y0,y1) (half-open)
            ymin = np.minimum(y0, y1)
            ymax = np.maximum(y0, y1)
            cross = (rows[:, None] >= ymin[None, :]) & (rows[:, None] < ymax[None, :])
            t = (rows[:, None] - y0[None, :]) / (y1 - y0)[None, :]
            xcross = x0[None, :] + t * (x1 - x0)[None, :]
            for ri, y in enumerate(range(ylo, yhi + 1)):
                xs = np.sort(xcross[ri][cross[ri]])
                for j in range(0, len(xs) - 1, 2):
                    xa = max(0, int(np.ceil(xs[j])))
                    xb = min(w - 1, int(np.floor(xs[j + 1])))
                    if xb >= xa:
                        canvas[y, xa : xb + 1] = value
    draw_polyline(canvas, np.asarray(pts, dtype=np.int64), width=1, closed=True, value=value)


def painted_tile_keys(
    kinds: list[str],
    geoms_px: list[np.ndarray],
    x_off: int,
    y_off: int,
    width: int,
    height: int,
    line_width_ways: int = 2,
    line_width_polygons: int = 1,
) -> np.ndarray:
    """Distributed-painter kernel: rasterize a batch of features onto a
    LOCAL window of the 1-px-per-tile canvas and return the painted
    (tx, ty) pairs packed as ``ty_local * width + tx_local`` offsets...

    Actually returns an (M, 2) int64 array of ABSOLUTE (tx, ty) painted
    within the window. Feature kinds follow the reference's painting
    rules (make_original.py:41-44, make_buildings.py:52-59):
      node      -> single dot
      way       -> closed polyline, width ``line_width_ways`` (=2)
      polygon   -> closed outline, width ``line_width_polygons`` (=1)
      exclusion -> even-odd filled polygon
    ``geoms_px`` are per-feature (K, 2) int arrays already converted to
    window-local tile coordinates (absolute tile index minus offset).
    """
    canvas = np.zeros((height, width), dtype=np.uint8)
    for kind, g in zip(kinds, geoms_px):
        if len(g) == 0:
            continue
        if kind == "node":
            stamp(canvas, g[:, 0], g[:, 1], 1)
        elif kind == "way":
            draw_polyline(canvas, g, width=line_width_ways, closed=True)
        elif kind == "polygon":
            draw_polyline(canvas, g, width=line_width_polygons, closed=True)
        elif kind == "exclusion":
            fill_poly(canvas, g)
        else:
            raise ValueError(f"unknown feature kind {kind!r}")
    ys, xs = np.nonzero(canvas)
    return np.stack([xs + x_off, ys + y_off], axis=1).astype(np.int64)
