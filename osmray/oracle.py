"""Deliberately-naive SCALAR oracle of the reference semantics.

Used only by the conformance tests: every vectorized kernel in the
engine must agree with these loop-based formulas exactly (tile indices,
residuals, edge predicates, raster masks). The formulas mirror the
reference line-by-line in behavior (citations inline) but are written
independently — plain Python math, one point at a time.

Not imported by any pipeline code; tests only.
"""

from __future__ import annotations

import math

TILESIZE = 256


def project2web(lat: float, lng: float) -> tuple[float, float]:
    # lib/layers.py:24-30
    siny = math.sin(lat * math.pi / 180)
    siny = min(max(siny, -0.9999), 0.9999)
    x = TILESIZE * (0.5 + lng / 360)
    y = TILESIZE * (0.5 - math.log((1 + siny) / (1 - siny)) / (4 * math.pi))
    return x, y


def wgs_at_tile(tx: int, ty: int, z: int) -> tuple[float, float]:
    # lib/layers.py:32-39 — tile CENTER, offsets not undone
    scale = 1 << z
    x = (tx + 0.5) / scale
    y = (ty + 0.5) / scale
    lng = 180 * (2 * x - 1)
    lat = 180 / math.pi * (2 * math.atan(math.exp((1 - 2 * y) * math.pi)) - math.pi / 2)
    return lat, lng


def tile_at_wgs(
    lat: float, lng: float, z: int, offsetx: float = 0.0, offsety: float = 0.0
) -> tuple[int, int, float, float]:
    # lib/layers.py:107-118 + residuals from :91-105/:120-133
    scale = 1 << z
    wx, wy = project2web(lat, lng)
    px = (wx + offsetx) * scale
    py = (wy + offsety) * scale
    tx = math.floor(px / TILESIZE)
    ty = math.floor(py / TILESIZE)
    rx = px - tx * TILESIZE
    ry = py - ty * TILESIZE
    return tx, ty, rx, ry


def edge_ok(rx: float, ry: float, edge: int = 16) -> bool:
    # inverse of the "outlier" predicate at lib/layers.py:135-141
    outlier = (rx < edge) or (rx >= TILESIZE - edge) or (ry < edge) or (ry >= TILESIZE - edge)
    return not outlier


def flip_y(ty: int, z: int) -> int:
    # lib/layers.py:68-73
    return (1 << z) - ty - 1


def outside(point, lefttop, rightbot) -> bool:
    # lib/helpers.py:29-34 — half-open box predicate
    return (
        point[0] < lefttop[0]
        or point[1] < lefttop[1]
        or point[0] >= rightbot[0]
        or point[1] >= rightbot[1]
    )


def latlngs_from_wkt(string: str):
    # lib/helpers.py:217-226 — regex float extraction, lon/lat swapped to lat/lng
    import re

    out = []
    for line in string.splitlines():
        nums = [float(s) for s in re.findall(r"[-]?\d*\.\d+|\d+", line)]
        lngs = nums[::2]
        lats = nums[1::2]
        out.append(list(zip(lats, lngs)))
    return out


# ---------------------------------------------------------------------------
# Raster oracle: scalar Bresenham (4-connected) and even-odd scanline
# fill on a tiny canvas.  The reference delegated to cv2 (absent in
# this environment); these scalar routines DEFINE the engine's raster
# semantics and are frozen by golden-mask fixtures.
# ---------------------------------------------------------------------------


def draw_dot(canvas, x: int, y: int, width: int = 1) -> None:
    """Stamp a width x width square whose top-left is the point for
    width<=2, centered for larger widths (width 1 == the reference's
    single-pixel dot, lib/helpers.py:73-76)."""
    h = len(canvas)
    w = len(canvas[0])
    off = (width - 1) // 2
    for dy in range(width):
        for dx in range(width):
            yy, xx = y + dy - off, x + dx - off
            if 0 <= yy < h and 0 <= xx < w:
                canvas[yy][xx] = 255


def draw_line4(canvas, x0: int, y0: int, x1: int, y1: int, width: int = 1) -> None:
    """4-connected line segment, inclusive of both endpoints.

    4-connectedness == the reference's ``lineType=4``
    (lib/helpers.py:84-94): consecutive painted pixels share an edge,
    never only a corner.  The pixel sequence is DEFINED (cv2 being
    absent, our scalar spec is the frozen semantics) as the walk over
    grid-line crossings of the center-to-center segment in increasing
    parameter order, ties stepping x first; thickness is a square
    stamp per pixel.
    """
    dx = abs(x1 - x0)
    dy = abs(y1 - y0)
    sx = 1 if x1 > x0 else -1
    sy = 1 if y1 > y0 else -1
    x, y = x0, y0
    a = b = 0
    draw_dot(canvas, x, y, width)
    # walk grid-line crossings of the center-to-center segment in
    # parameter order; exactly dx+dy steps, one axis per step
    while a < dx or b < dy:
        if b >= dy or (a < dx and (2 * a + 1) * dy <= (2 * b + 1) * dx):
            a += 1
            x += sx
        else:
            b += 1
            y += sy
        draw_dot(canvas, x, y, width)


def draw_polyline(canvas, pts, width: int = 1, closed: bool = True) -> None:
    """Polyline through integer points; ``closed=True`` adds the last->
    first segment (reference always closes, lib/helpers.py:88)."""
    n = len(pts)
    if n == 0:
        return
    if n == 1:
        draw_dot(canvas, pts[0][0], pts[0][1], width)
        return
    last = n if closed else n - 1
    for i in range(last):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        draw_line4(canvas, x0, y0, x1, y1, width)


def fill_poly(canvas, pts) -> None:
    """Even-odd scanline polygon fill at pixel centers, plus the
    4-connected closed outline (so boundary pixels are painted, like
    cv2.fillPoly's filled-including-edge behavior,
    lib/helpers.py:90-94)."""
    h = len(canvas)
    w = len(canvas[0])
    n = len(pts)
    if n == 0:
        return
    for y in range(h):
        yc = y + 0.0  # sample at integer row coordinate
        xs = []
        for i in range(n):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % n]
            if y0 == y1:
                continue
            if (y0 <= yc < y1) or (y1 <= yc < y0):
                t = (yc - y0) / (y1 - y0)
                xs.append(x0 + t * (x1 - x0))
        xs.sort()
        for j in range(0, len(xs) - 1, 2):
            xa = math.ceil(xs[j])
            xb = math.floor(xs[j + 1])
            for x in range(max(0, xa), min(w - 1, xb) + 1):
                canvas[y][x] = 255
    draw_polyline(canvas, pts, width=1, closed=True)


# ---------------------------------------------------------------------------
# Painter oracle: 1-px-per-tile occupancy over a bbox, the scalar twin
# of the engine's distributed "painted tile set" (MercatorPainter,
# lib/helpers.py:36-155).
# ---------------------------------------------------------------------------


class PainterOracle:
    def __init__(self, W, S, E, N, z, offsetx=0.0, offsety=0.0):
        txmin, tymin, _, _ = tile_at_wgs(N, W, z, offsetx, offsety)
        txmax, tymax, _, _ = tile_at_wgs(S, E, z, offsetx, offsety)
        self.z, self.offsetx, self.offsety = z, offsetx, offsety
        self.txmin, self.tymin = txmin, tymin
        self.width = txmax - txmin + 1
        self.height = tymax - tymin + 1
        self.canvas = [[0] * self.width for _ in range(self.height)]

    def wgs2px(self, lat, lng):
        tx, ty, _, _ = tile_at_wgs(lat, lng, self.z, self.offsetx, self.offsety)
        return tx - self.txmin, ty - self.tymin

    def add_dots(self, latlngs):
        for lat, lng in latlngs:
            x, y = self.wgs2px(lat, lng)
            if 0 <= y < self.height and 0 <= x < self.width:
                self.canvas[y][x] = 255

    def add_polyline(self, latlngs, width=1):
        pts = [self.wgs2px(lat, lng) for lat, lng in latlngs]
        draw_polyline(self.canvas, pts, width=width, closed=True)

    def add_fillpoly(self, latlngs):
        pts = [self.wgs2px(lat, lng) for lat, lng in latlngs]
        fill_poly(self.canvas, pts)

    def painted_tiles(self) -> set[tuple[int, int]]:
        out = set()
        for y in range(self.height):
            for x in range(self.width):
                if self.canvas[y][x]:
                    out.add((self.txmin + x, self.tymin + y))
        return out

    def contains(self, tx, ty, result_outside=True) -> bool:
        # lib/helpers.py:139-155
        if tx < self.txmin or ty < self.tymin:
            return result_outside
        if tx >= self.txmin + self.width or ty >= self.tymin + self.height:
            return result_outside
        return self.canvas[ty - self.tymin][tx - self.txmin] != 0


def point_in_polygon(lat: float, lng: float, ring) -> bool:
    """Analytic even-odd ray-cast PIP in (lat, lng) space — scalar
    oracle for the engine's vectorized PIP (new capability; the
    reference only had the raster path via fillPoly)."""
    inside = False
    n = len(ring)
    for i in range(n):
        la0, ln0 = ring[i]
        la1, ln1 = ring[(i + 1) % n]
        if (la0 <= lat < la1) or (la1 <= lat < la0):
            t = (lat - la0) / (la1 - la0)
            xcross = ln0 + t * (ln1 - ln0)
            if xcross > lng:
                inside = not inside
    return inside
