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
    # crossing keys; doubling + parity encodes the "x wins ties" rule.
    # Both key arrays are already sorted, so the combined order is a
    # MERGE: each y-crossing's slot among the x-crossings comes from
    # one searchsorted (cheaper than argsort of the concatenation).
    kx = (2 * np.arange(dx, dtype=np.int64) + 1) * dy * 2
    ky = (2 * np.arange(dy, dtype=np.int64) + 1) * dx * 2 + 1
    is_y = np.zeros(dx + dy, dtype=bool)
    is_y[np.searchsorted(kx, ky) + np.arange(dy)] = True
    xs = np.empty(dx + dy + 1, dtype=np.int64)
    ys = np.empty(dx + dy + 1, dtype=np.int64)
    xs[0], ys[0] = x0, y0
    xs[1:] = x0 + sx * np.cumsum(~is_y)
    ys[1:] = y0 + sy * np.cumsum(is_y)
    return xs, ys


def _cumsum0(a: np.ndarray) -> np.ndarray:
    return np.concatenate(([0], np.cumsum(a)[:-1]))


def lines4_pixels(x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray):
    """Pixels of MANY 4-connected segments in one vectorized pass —
    identical to concatenating ``line4_pixels`` per segment (each
    segment's pixels in walk order, segments in input order). One
    lexsort over all crossings replaces one argsort per segment."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    m = len(x0)
    dx = np.abs(x1 - x0)
    dy = np.abs(y1 - y0)
    sx = np.where(x1 >= x0, 1, -1)
    sy = np.where(y1 >= y0, 1, -1)
    steps = dx + dy
    total = int(steps.sum())
    pstart = _cumsum0(steps + 1)
    npix = total + m
    out_x = np.empty(npix, dtype=np.int64)
    out_y = np.empty(npix, dtype=np.int64)
    out_x[pstart] = x0
    out_y[pstart] = y0
    if total == 0:
        return out_x, out_y
    # crossing keys per segment (x-crossings even, y-crossings odd —
    # unique within a segment, so ordering by (segment, key) is exact)
    segx = np.repeat(np.arange(m), dx)
    jx = np.arange(int(dx.sum())) - np.repeat(_cumsum0(dx), dx)
    kx = (2 * jx + 1) * dy[segx] * 2
    segy = np.repeat(np.arange(m), dy)
    jy = np.arange(int(dy.sum())) - np.repeat(_cumsum0(dy), dy)
    ky = (2 * jy + 1) * dx[segy] * 2 + 1
    K = np.concatenate((kx, ky))
    S = np.concatenate((segx, segy))
    T = np.concatenate((np.zeros(len(kx), dtype=bool), np.ones(len(ky), dtype=bool)))
    order = np.lexsort((K, S))
    is_y = T[order]
    seg = S[order]  # segment-major, crossing-ascending
    cx = np.cumsum(~is_y)
    cy = np.cumsum(is_y)
    starts = _cumsum0(steps)
    # cumulative counts just BEFORE each segment's first step
    cx_before = np.zeros(m, dtype=np.int64)
    cy_before = np.zeros(m, dtype=np.int64)
    nz = starts > 0
    cx_before[nz] = cx[starts[nz] - 1]
    cy_before[nz] = cy[starts[nz] - 1]
    pos = np.arange(total)
    out_idx = pstart[seg] + 1 + (pos - starts[seg])
    out_x[out_idx] = x0[seg] + sx[seg] * (cx - cx_before[seg])
    out_y[out_idx] = y0[seg] + sy[seg] * (cy - cy_before[seg])
    return out_x, out_y


def clipped_segment_walks(x0, y0, x1, y1, wx0: int, wx1: int, wy0: int, wy1: int):
    """Pixels of many 4-connected segment walks RESTRICTED to the
    window [wx0,wx1]x[wy0,wy1]: a segment thousands of px long that
    merely crosses a 256-px tile costs O(in-window steps), not
    O(length). EXACT for canvas drawing: the emitted pixel sequence
    equals the true walk over the key range where the walk can be
    inside the window (plus one boundary pixel per end, which the
    stamp's clip discards), derived in crossing-key space:

    x(k) and y(k) are monotone along the walk, so the in-window
    portion is one contiguous crossing-key interval (klo, khi);
    the counts of x/y-crossings with key <= K have closed forms, so
    the interval's crossing subranges and the entry pixel need no
    per-pixel work."""
    x0 = np.asarray(x0, dtype=np.int64)
    y0 = np.asarray(y0, dtype=np.int64)
    x1 = np.asarray(x1, dtype=np.int64)
    y1 = np.asarray(y1, dtype=np.int64)
    dx = np.abs(x1 - x0)
    dy = np.abs(y1 - y0)
    sx = np.where(x1 >= x0, 1, -1)
    sy = np.where(y1 >= y0, 1, -1)
    # cnt_x range where x is inside the window (monotone in cnt_x)
    axlo = np.where(sx > 0, wx0 - x0, x0 - wx1).clip(0, dx)
    axhi = np.where(sx > 0, wx1 - x0, x0 - wx0).clip(-1, dx)
    aylo = np.where(sy > 0, wy0 - y0, y0 - wy1).clip(0, dy)
    ayhi = np.where(sy > 0, wy1 - y0, y0 - wy0).clip(-1, dy)
    ok = (axlo <= axhi) & (aylo <= ayhi)

    INF = np.int64(1 << 62)
    tdx = 2 * dx
    tdy = 2 * dy
    # crossing keys: kx_j = (2j+1)*2*dy (even), ky_i = (2i+1)*2*dx + 1
    kx_at = lambda j: (2 * j + 1) * tdy  # noqa: E731
    ky_at = lambda i: (2 * i + 1) * tdx + 1  # noqa: E731
    klo = np.maximum(
        np.where(axlo > 0, kx_at(axlo - 1), -1),
        np.where(aylo > 0, ky_at(aylo - 1), -1),
    )
    khi = np.minimum(
        np.where(axhi < dx, kx_at(axhi), INF),
        np.where(ayhi < dy, ky_at(ayhi), INF),
    )

    def count_kx_le(K):
        # number of j in [0,dx) with (2j+1)*2*dy <= K
        with np.errstate(divide="ignore"):
            q = np.where(tdy > 0, K // np.where(tdy > 0, tdy, 1), INF)
        c = np.where(K < 0, 0, np.where(tdy > 0, (q - 1) // 2 + 1, dx))
        return c.clip(0, dx)

    def count_ky_le(K):
        with np.errstate(divide="ignore"):
            q = np.where(tdx > 0, (K - 1) // np.where(tdx > 0, tdx, 1), INF)
        c = np.where(K < 1, 0, np.where(tdx > 0, (q - 1) // 2 + 1, dy))
        return c.clip(0, dy)

    cx0 = count_kx_le(klo)
    cy0 = count_ky_le(klo)
    jx_hi = count_kx_le(khi - 1)
    jy_hi = count_ky_le(khi - 1)
    nxs = np.where(ok, x0 + sx * cx0, 0)
    nys = np.where(ok, y0 + sy * cy0, 0)
    ndx = np.where(ok, jx_hi - cx0, 0)
    ndy = np.where(ok, jy_hi - cy0, 0)
    # walk the ORIGINAL keys over the kept crossing subranges from the
    # entry pixel: every emitted pixel is a true walk pixel, and every
    # omitted one is provably outside the window (monotonicity)
    out_x, out_y = [], []
    for i in np.flatnonzero(ok):
        if dx[i] == 0 or dy[i] == 0:
            # axis-aligned: all crossing keys coincide (degenerate for
            # the key-space clip) — the clipped walk is a straight run
            if dy[i] == 0:
                run = np.arange(axlo[i], axhi[i] + 1, dtype=np.int64)
                out_x.append(x0[i] + sx[i] * run)
                out_y.append(np.full(len(run), y0[i], dtype=np.int64))
            else:
                run = np.arange(aylo[i], ayhi[i] + 1, dtype=np.int64)
                out_x.append(np.full(len(run), x0[i], dtype=np.int64))
                out_y.append(y0[i] + sy[i] * run)
            continue
        jx = np.arange(cx0[i], jx_hi[i], dtype=np.int64)
        jy = np.arange(cy0[i], jy_hi[i], dtype=np.int64)
        kx = (2 * jx + 1) * tdy[i]
        ky = (2 * jy + 1) * tdx[i] + 1
        is_y = np.zeros(len(kx) + len(ky), dtype=bool)
        is_y[np.searchsorted(kx, ky) + np.arange(len(ky))] = True
        xs = np.empty(len(is_y) + 1, dtype=np.int64)
        ys = np.empty(len(is_y) + 1, dtype=np.int64)
        xs[0], ys[0] = nxs[i], nys[i]
        xs[1:] = nxs[i] + sx[i] * np.cumsum(~is_y)
        ys[1:] = nys[i] + sy[i] * np.cumsum(is_y)
        out_x.append(xs)
        out_y.append(ys)
    if not out_x:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(out_x), np.concatenate(out_y)


def stamp(
    canvas: np.ndarray, xs: np.ndarray, ys: np.ndarray, width: int = 1, value: int = 255
) -> None:
    """Paint a square ``width x width`` stamp at every (x, y), clipped
    to the canvas. width 2 anchors top-left, odd widths center —
    matching ``oracle.draw_dot``."""
    h, w = canvas.shape
    off = (width - 1) // 2
    if width == 1:
        keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        canvas[ys[keep], xs[keep]] = value
        return
    if width == 2:  # hot path (way strokes): one assignment, no loop
        px = np.concatenate((xs, xs + 1, xs, xs + 1))
        py = np.concatenate((ys, ys, ys + 1, ys + 1))
        keep = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        canvas[py[keep], px[keep]] = value
        return
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
    x1 = np.concatenate((x0[1:], x0[:1]))  # np.roll is slow for this
    y1 = np.concatenate((y0[1:], y0[:1]))
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
    xs, ys = clipped_segment_walks(
        x0[idx], y0[idx], x1[idx], y1[idx], -pad, w - 1 + pad, -pad, h - 1 + pad
    )
    stamp(canvas, xs, ys, width, value)


def draw_polylines(
    canvas: np.ndarray,
    pts_list: list[np.ndarray],
    width: int = 1,
    closed: bool = True,
    value: int = 255,
) -> None:
    """Draw MANY polylines of one stroke width in a single pass: all
    segments concatenated, near-filtered, walked (``lines4_pixels``)
    and stamped together. Exact vs per-feature ``draw_polyline`` —
    every draw writes the same value, so order is irrelevant."""
    if not pts_list:
        return
    h, w = canvas.shape
    pad = width + 1
    ax0, ay0, ax1, ay1 = [], [], [], []
    for pts in pts_list:
        pts = np.asarray(pts, dtype=np.int64)
        n = len(pts)
        if n == 0:
            continue
        if n == 1:
            ax0.append(pts[:, 0]); ay0.append(pts[:, 1])
            ax1.append(pts[:, 0]); ay1.append(pts[:, 1])
            continue
        x0 = pts[:, 0]
        y0 = pts[:, 1]
        x1 = np.concatenate((x0[1:], x0[:1]))
        y1 = np.concatenate((y0[1:], y0[:1]))
        if not closed:
            x0, y0, x1, y1 = x0[:-1], y0[:-1], x1[:-1], y1[:-1]
        ax0.append(x0); ay0.append(y0); ax1.append(x1); ay1.append(y1)
    if not ax0:
        return
    x0 = np.concatenate(ax0)
    y0 = np.concatenate(ay0)
    x1 = np.concatenate(ax1)
    y1 = np.concatenate(ay1)
    near = (
        (np.maximum(x0, x1) >= -pad)
        & (np.minimum(x0, x1) < w + pad)
        & (np.maximum(y0, y1) >= -pad)
        & (np.minimum(y0, y1) < h + pad)
    )
    idx = np.flatnonzero(near)
    if len(idx) == 0:
        return
    xs, ys = clipped_segment_walks(
        x0[idx], y0[idx], x1[idx], y1[idx], -pad, w - 1 + pad, -pad, h - 1 + pad
    )
    stamp(canvas, xs, ys, width, value)


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
    x1 = np.concatenate((x0[1:], x0[:1]))
    y1 = np.concatenate((y0[1:], y0[:1]))
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

def binary_dilate(mask: np.ndarray, r: int = 1) -> np.ndarray:
    """Binary dilation with a (2r+1)x(2r+1) box structuring element —
    separable two-pass sliding-window OR via the summed-area trick
    (box sum > 0), O(H*W) independent of r. Returns uint8 {0,255}."""
    m = (np.asarray(mask) > 0).astype(np.int32)
    # integral image with a zero border of r on each side
    pad = np.zeros((m.shape[0] + 2 * r, m.shape[1] + 2 * r), dtype=np.int32)
    pad[r : r + m.shape[0], r : r + m.shape[1]] = m
    ii = pad.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    k = 2 * r + 1
    box = (
        ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
    )
    return np.where(box > 0, 255, 0).astype(np.uint8)


def binary_erode(mask: np.ndarray, r: int = 1) -> np.ndarray:
    """Binary erosion with a (2r+1)x(2r+1) box: the box sum must be
    full (pixels outside the canvas count as background, the standard
    border rule). Duality note: erode(m) == NOT dilate(NOT m) only
    without borders; this implementation keeps the explicit rule."""
    m = (np.asarray(mask) > 0).astype(np.int32)
    pad = np.zeros((m.shape[0] + 2 * r, m.shape[1] + 2 * r), dtype=np.int32)
    pad[r : r + m.shape[0], r : r + m.shape[1]] = m
    ii = pad.cumsum(0).cumsum(1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    k = 2 * r + 1
    box = ii[k:, k:] - ii[:-k, k:] - ii[k:, :-k] + ii[:-k, :-k]
    return np.where(box == k * k, 255, 0).astype(np.uint8)


def mask_iou_popcounts(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    """(popcount a, popcount b, popcount a&b) — the integer core of
    IoU/Dice so exactness survives any engine twin (divide outside)."""
    av = np.asarray(a) > 0
    bv = np.asarray(b) > 0
    return int(av.sum()), int(bv.sum()), int((av & bv).sum())


def rle_encode(mask: np.ndarray) -> np.ndarray:
    """COCO-style column-major run-length encoding of a binary mask:
    counts of alternating runs over the Fortran-flattened pixels,
    starting with background (a leading 0 count when pixel (0,0) is
    foreground) — the compact wire format for label masks at scale
    (a mask is O(#boundary) ints instead of H*W pixels). Vectorized:
    one diff + one flatnonzero, no Python per-pixel loop."""
    v = (np.asarray(mask) > 0).ravel(order="F").astype(np.int8)
    if len(v) == 0:
        return np.empty(0, dtype=np.int64)
    change = np.flatnonzero(np.diff(v)) + 1
    runs = np.diff(np.concatenate(([0], change, [len(v)]))).astype(np.int64)
    if v[0] == 1:
        runs = np.concatenate((np.zeros(1, np.int64), runs))
    return runs


def rle_decode(runs: np.ndarray, h: int, w: int) -> np.ndarray:
    """Inverse of rle_encode: alternating background/foreground
    counts (column-major) back to an (h, w) uint8 {0,255} mask."""
    runs = np.asarray(runs, dtype=np.int64)
    vals = (np.arange(len(runs), dtype=np.int64) % 2).astype(np.uint8) * 255
    v = np.repeat(vals, runs)
    return v.reshape((h, w), order="F")


def l1_distance_transform(mask: np.ndarray, cap: int | None = None) -> np.ndarray:
    """EXACT L1 (Manhattan) distance transform: each pixel's distance
    to the nearest foreground pixel — the proximity-raster primitive
    (buffer rings, nearest-road rasters). Separable and fully
    vectorized: along each axis, min over j<=i of d[j]+(i-j) is
    i + running-min of (d[j]-j), so the whole transform is four
    minimum.accumulate scans, no per-pixel loop; the column pass then
    the row pass compose to the exact 2-D L1 minimum. ``cap`` bounds
    the result (and is the value of an all-background mask)."""
    m = np.asarray(mask) > 0
    h, w = m.shape
    inf = np.int64(1) << 40
    d = np.where(m, 0, inf).astype(np.int64)
    for axis in (0, 1):
        n = d.shape[axis]
        ar = np.arange(n, dtype=np.int64)
        ar = ar[:, None] if axis == 0 else ar[None, :]
        d = np.minimum(d, np.minimum.accumulate(d - ar, axis=axis) + ar)
        rev = (slice(None, None, -1), slice(None)) if axis == 0 else (
            slice(None), slice(None, None, -1))
        dr = d[rev]
        d = np.minimum(d, (np.minimum.accumulate(dr - ar, axis=axis) + ar)[rev])
    if cap is not None:
        d = np.minimum(d, cap)
    return d


# marching-squares case tables: per 4-bit corner case (8*tl + 4*tr +
# 2*br + 1*bl), the contour segments as (r0, c0, r1, c1) in DOUBLED
# cell-local coordinates (edge midpoints: top=(0,1) bottom=(2,1)
# left=(1,0) right=(1,2)) — integers, so every emitted vertex is
# exact. Saddles (5, 10) take the standard two-segment resolution
# that keeps the set-corner pairs separated.
_MS_SEGS: dict[int, tuple] = {
    0: (), 15: (),
    1: ((1, 0, 2, 1),), 14: ((1, 0, 2, 1),),
    2: ((2, 1, 1, 2),), 13: ((2, 1, 1, 2),),
    4: ((0, 1, 1, 2),), 11: ((0, 1, 1, 2),),
    8: ((0, 1, 1, 0),), 7: ((0, 1, 1, 0),),
    3: ((1, 0, 1, 2),), 12: ((1, 0, 1, 2),),
    6: ((0, 1, 2, 1),), 9: ((0, 1, 2, 1),),
    5: ((0, 1, 1, 2), (1, 0, 2, 1)),
    10: ((0, 1, 1, 0), (2, 1, 1, 2)),
}


def marching_squares_cases(mask: np.ndarray) -> np.ndarray:
    """The (h-1, w-1) marching-squares case grid of a binary mask:
    4-bit corner code 8*tl + 4*tr + 2*br + 1*bl per 2x2 cell —
    the raster->vector isoline primitive, fully vectorized."""
    b = (np.asarray(mask) > 0).astype(np.int8)
    return (8 * b[:-1, :-1] + 4 * b[:-1, 1:]
            + 2 * b[1:, 1:] + b[1:, :-1]).astype(np.int8)


def marching_squares_segments(mask: np.ndarray) -> np.ndarray:
    """Contour segments of a binary mask via marching squares, as an
    (n, 4) int64 array of (r0, c0, r1, c1) in DOUBLED grid
    coordinates (so edge midpoints are exact integers). Segments are
    emitted per cell in row-major cell order; adjacent cells share
    midpoint vertices, so downstream chaining into rings is a pure
    integer hash-join on endpoints."""
    cases = marching_squares_cases(mask)
    out = []
    for cs in range(1, 15):
        rr, cc = np.nonzero(cases == cs)
        for (r0, c0, r1, c1) in _MS_SEGS[cs]:
            out.append(np.stack([2 * rr + r0, 2 * cc + c0,
                                 2 * rr + r1, 2 * cc + c1], axis=1))
    if not out:
        return np.empty((0, 4), dtype=np.int64)
    return np.concatenate(out).astype(np.int64)


def contour_ring_stats(mask: np.ndarray) -> tuple[int, int, int]:
    """(n_rings, n_vertices, ring_checksum) of a mask's marching-
    squares contour graph: rings are connected components of the
    segment graph (robust to degree-4 saddle touch points where a
    walk-based chainer would be ambiguous), the checksum is the sum
    of each component's minimum vertex id (vertex id = r*256 + c in
    doubled coordinates) — the exact value a min-label-propagation
    SQL twin converges to. Bounded per-image work: union-find over
    O(cells) segments."""
    segs = marching_squares_segments(mask)
    if len(segs) == 0:
        return 0, 0, 0
    u = segs[:, 0] * 256 + segs[:, 1]
    v = segs[:, 2] * 256 + segs[:, 3]
    verts = np.unique(np.concatenate((u, v)))
    idx = {int(x): i for i, x in enumerate(verts)}
    par = list(range(len(verts)))

    def find(a: int) -> int:
        while par[a] != a:
            par[a] = par[par[a]]
            a = par[a]
        return a

    for a, b in zip(u, v):
        ra, rb = find(idx[int(a)]), find(idx[int(b)])
        if ra != rb:
            par[ra] = rb
    roots = {}
    for i, x in enumerate(verts):
        r = find(i)
        roots[r] = min(roots.get(r, int(x)), int(x))
    return len(roots), len(verts), sum(roots.values())


def largest_square(mask: np.ndarray) -> tuple[int, int]:
    """(side, count) of the largest all-foreground square in a binary
    mask and how many positions achieve it — the classic DP
    d[r,c] = min(d[r-1,c], d[r,c-1], d[r-1,c-1]) + 1, vectorized
    across each row (one np.minimum reduction per row). The free-space
    placement primitive (largest clear patch for a label stamp)."""
    m = (np.asarray(mask) > 0).astype(np.int64)
    h, w = m.shape
    if h == 0 or w == 0 or m.sum() == 0:
        return 0, 0
    d = np.zeros((h, w), dtype=np.int64)
    d[0] = m[0]
    for r in range(1, h):
        # up/diag fold vectorizes; the left dependency is inherently
        # sequential within the row (w is the coarse-grid side, small)
        row = np.minimum(d[r - 1], np.concatenate(([0], d[r - 1, :-1])))
        for c in range(w):
            left_v = d[r, c - 1] if c else 0
            d[r, c] = m[r, c] * (min(row[c], left_v) + 1)
    best = int(d.max())
    return best, int((d == best).sum())


def bfs_grid_distance(obstacles: np.ndarray,
                      start: tuple[int, int] = (0, 0)) -> np.ndarray:
    """4-connected BFS distance field over a grid with obstacles (the
    navigation primitive: reachability and shortest path length
    through free space). Vectorized wavefront: each round expands the
    frontier by four boolean shifts — no per-cell loop; rounds are
    bounded by the grid diameter. Unreached (or obstacle) cells hold
    the sentinel 255."""
    obst = np.asarray(obstacles) > 0
    h, w = obst.shape
    dist = np.full((h, w), 255, dtype=np.int64)
    if obst[start]:
        return dist
    dist[start] = 0
    frontier = np.zeros((h, w), dtype=bool)
    frontier[start] = True
    d = 0
    while frontier.any():
        d += 1
        nxt = np.zeros_like(frontier)
        nxt[1:, :] |= frontier[:-1, :]
        nxt[:-1, :] |= frontier[1:, :]
        nxt[:, 1:] |= frontier[:, :-1]
        nxt[:, :-1] |= frontier[:, 1:]
        nxt &= ~obst & (dist == 255)
        dist[nxt] = d
        frontier = nxt
    return dist
