"""Vectorized Web-Mercator / slippy-tile math.

Semantics are pinned to the reference engine's formulas (cited so the
conformance suite can check parity; see ``osmray.oracle`` for the
deliberately-naive scalar versions used as the test oracle):

- WGS84 -> unscaled EPSG:3857 in ``0..256`` world units with the siny
  clamp at +/-0.9999            (reference: lib/layers.py:24-30)
- tile containment via ``floor((w + offset) * 2^z / 256)`` where
  ``offset`` is a per-provider pixel offset expressed in unscaled world
  units                         (reference: lib/layers.py:107-118)
- in-tile pixel residual ``r = p - t*256``  (lib/layers.py:91-105)
- edge predicate: keep only ``edge <= r < 256 - edge``
                                 (reference: lib/layers.py:120-141)
- inverse map returns the TILE CENTER and does NOT undo provider
  offsets (the reference round-trips through this asymmetry,
  make_expand.py:80)            (reference: lib/layers.py:32-39)
- TMS y-flip ``y' = 2^z - y - 1`` applied only at the URL/filename
  boundary                      (reference: lib/layers.py:68-73)

All functions take/return numpy arrays (float64 / int64) and are safe
to call inside ``Dataset.map_batches`` on whole columns.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

TILESIZE = 256
_SINY_CLAMP = 0.9999


@dataclass(frozen=True)
class TileScheme:
    """Imagery-provider tile addressing scheme (the user-extension
    surface of the reference: Imagery instances with url/flipy/offsets,
    lib/layers.py:274-281). URL templates are irrelevant here — images
    arrive as table rows — but the geometric knobs are semantics."""

    name: str = "plain"
    flipy: bool = False
    offsetx: float = 0.0  # unscaled world units (px_at_z / 2^z)
    offsety: float = 0.0

    def flip_y(self, ty: np.ndarray, z: int) -> np.ndarray:
        """TMS y-flip for URL/filename codecs (lib/layers.py:68-73)."""
        if not self.flipy:
            return ty
        return (1 << z) - ty - 1


# The reference's Maxar provider: -30 px x, +10 px y at z19
# (lib/layers.py:277-278).
MAXAR = TileScheme("maxar", flipy=True, offsetx=-30 / (1 << 19), offsety=10 / (1 << 19))
PLAIN = TileScheme("plain")


def mil(x: np.ndarray) -> np.ndarray:
    """Quantize degrees to integer micro-degrees, ``floor(x * 1e6)`` —
    the reference's cache-key / filename quantizer (duplicated at
    lib/loaders.py:7-8, lib/helpers.py:13-14, make_buildings.py:13-14);
    the engine's basis for deterministic ids."""
    return np.floor(np.asarray(x, dtype=np.float64) * 1e6).astype(np.int64)


def osm_edit_url(tx: int, ty: int, z: int) -> str:
    """Lineage/debug helper: OSM iD-editor deep link for a tile
    (lib/helpers.py:16-19)."""
    lat, lng = wgs_at_tile(np.asarray([tx]), np.asarray([ty]), z)
    return f"https://www.openstreetmap.org/edit#map={z}/{lat[0]}/{lng[0]}"


def project2web(lat: np.ndarray, lng: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 degrees -> unscaled EPSG:3857 world units in 0..256.

    Matches lib/layers.py:24-30 including the siny clamp (lat beyond
    ~+/-89.19 deg saturates rather than diverging).
    """
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    siny = np.sin(lat * (np.pi / 180.0))
    siny = np.clip(siny, -_SINY_CLAMP, _SINY_CLAMP)
    wx = TILESIZE * (0.5 + lng / 360.0)
    wy = TILESIZE * (0.5 - np.log((1.0 + siny) / (1.0 - siny)) / (4.0 * np.pi))
    return wx, wy


def web2wgs(wx: np.ndarray, wy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of project2web (exact for |lat| below the siny clamp)."""
    wx = np.asarray(wx, dtype=np.float64)
    wy = np.asarray(wy, dtype=np.float64)
    lng = (wx / TILESIZE - 0.5) * 360.0
    lat = 180.0 / np.pi * (
        2.0 * np.arctan(np.exp((1.0 - 2.0 * (wy / TILESIZE)) * np.pi)) - np.pi / 2.0
    )
    return lat, lng


def wgs_at_tile(tx: np.ndarray, ty: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Tile index -> WGS84 of the tile CENTER (lib/layers.py:32-39).

    Deliberately does not undo provider offsets — the reference's
    negative-sample re-centering relies on this (make_expand.py:80).
    """
    scale = float(1 << z)
    x = (np.asarray(tx, dtype=np.float64) + 0.5) / scale
    y = (np.asarray(ty, dtype=np.float64) + 0.5) / scale
    lng = 180.0 * (2.0 * x - 1.0)
    lat = 180.0 / np.pi * (2.0 * np.arctan(np.exp((1.0 - 2.0 * y) * np.pi)) - np.pi / 2.0)
    return lat, lng


def tile_at_web(
    wx: np.ndarray,
    wy: np.ndarray,
    z: int,
    scheme: TileScheme = PLAIN,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Unscaled world coords -> (tx, ty, rx, ry).

    ``tx = floor((wx + offsetx) * 2^z / 256)``; the residual ``rx`` is
    the pixel position inside the tile. Matches lib/layers.py:107-118 /
    91-105 bit-for-bit (np.floor == math.floor on float64).
    """
    scale = float(1 << z)
    px = (np.asarray(wx, dtype=np.float64) + scheme.offsetx) * scale
    py = (np.asarray(wy, dtype=np.float64) + scheme.offsety) * scale
    tx = np.floor(px / TILESIZE)
    ty = np.floor(py / TILESIZE)
    rx = px - tx * TILESIZE
    ry = py - ty * TILESIZE
    return tx.astype(np.int64), ty.astype(np.int64), rx, ry


def tile_at_wgs(
    lat: np.ndarray,
    lng: np.ndarray,
    z: int,
    scheme: TileScheme = PLAIN,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """WGS84 point -> (tx, ty, rx, ry) for its containing tile."""
    wx, wy = project2web(lat, lng)
    return tile_at_web(wx, wy, z, scheme)


def edge_ok(rx: np.ndarray, ry: np.ndarray, edge: int = 16) -> np.ndarray:
    """The ``skipedge`` keep-predicate: True where the in-tile pixel is
    at least ``edge`` px from every tile border (lib/layers.py:135-141;
    edge=16 default, 24 for buildings per make_buildings.py:40).
    """
    return (rx >= edge) & (rx < TILESIZE - edge) & (ry >= edge) & (ry < TILESIZE - edge)


# ---------------------------------------------------------------------------
# Packed int64 tile keys — the shuffle / partition / join key everywhere.
# Layout: z in bits 58..63, x in bits 29..57, y in bits 0..28.  x and y
# are offset by 2^28 so slightly-negative indices (provider offsets can
# push tile 0 to -1) stay packable.
# ---------------------------------------------------------------------------

_XY_BIAS = 1 << 28
_XY_MASK = (1 << 29) - 1


def pack_tile(tx: np.ndarray, ty: np.ndarray, z: int) -> np.ndarray:
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    return (np.int64(z) << 58) | ((tx + _XY_BIAS) << 29) | (ty + _XY_BIAS)


def unpack_tile(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    key = np.asarray(key, dtype=np.int64)
    z = key >> 58
    tx = ((key >> 29) & _XY_MASK) - _XY_BIAS
    ty = (key & _XY_MASK) - _XY_BIAS
    return tx, ty, z


def tile_path(tx: int, ty: int, z: int, scheme: TileScheme = PLAIN, ext: str = "png") -> str:
    """Tile key -> deterministic relative file path (the sink layout;
    filename codec semantics of lib/layers.py:51-73, with the TMS
    y-flip applied exactly where the reference applies it)."""
    ty_out = int(scheme.flip_y(np.asarray([ty]), z)[0]) if scheme.flipy else ty
    return f"z{z}/x{tx}y{ty_out}.{ext}"


def xy_from_path(path: str) -> tuple[int, int]:
    """Parse ``x{tx}y{ty}.{ext}`` back to indices (lib/layers.py:58-66)."""
    f = path.rsplit("/", 1)[-1]
    xpos, ypos, dpos = f.index("x"), f.index("y"), f.index(".")
    return int(f[xpos + 1 : ypos]), int(f[ypos + 1 : dpos])


def tiles_near_web(
    wx: float, wy: float, z: int, h: int, w: int, scheme: TileScheme = PLAIN
) -> tuple[np.ndarray, tuple[int, int]]:
    """Viewport cover: point + (h, w) px viewport -> the inclusive tile
    index box covering it, plus the point's pixel position relative to
    the cover's top-left corner (lib/layers.py:145-178).

    NOTE: the reference computes BOTH the x and y half-extents from
    ``h`` (lib/layers.py:155-158) — a quirk we preserve: the cover is
    square-of-h regardless of ``w`` (the crop itself later uses w).

    Returns (array [[txmin, txmax], [tymin, tymax]], (rx, ry)).
    """
    scale = float(1 << z)
    px = (wx + scheme.offsetx) * scale
    py = (wy + scheme.offsety) * scale
    txmin = math.floor((px - h / 2) / TILESIZE)
    txmax = math.floor((px + h / 2) / TILESIZE)
    tymin = math.floor((py - h / 2) / TILESIZE)
    tymax = math.floor((py + h / 2) / TILESIZE)
    rx = round(px - txmin * TILESIZE)
    ry = round(py - tymin * TILESIZE)
    return np.array([[txmin, txmax], [tymin, tymax]], dtype=np.int64), (rx, ry)


def bbox_tiles(
    W: float, S: float, E: float, N: float, z: int, scheme: TileScheme = PLAIN
) -> tuple[int, int, int, int]:
    """Whole-bbox tile range (inclusive): the canvas extent the
    reference's painter uses (lib/helpers.py:42-54): txmin..txmax from
    the NW corner tile to the SE corner tile."""
    tx0, ty0, _, _ = tile_at_wgs(np.array([N]), np.array([W]), z, scheme)
    tx1, ty1, _, _ = tile_at_wgs(np.array([S]), np.array([E]), z, scheme)
    return int(tx0[0]), int(ty0[0]), int(tx1[0]), int(ty1[0])


def quadkey_str(tx: np.ndarray, ty: np.ndarray, z: int) -> np.ndarray:
    """Bing-style quadkey of slippy tiles: z base-4 digits, MSB first,
    digit = 2*y_bit + x_bit per zoom level — the string tile name
    whose lexicographic order IS the Morton order (a prefix names the
    ancestor tile). Vectorized digit assembly, no per-tile loop."""
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    out = np.empty((len(tx), z), dtype=np.uint8)
    for i in range(z):
        d = 2 * ((ty >> (z - 1 - i)) & 1) + ((tx >> (z - 1 - i)) & 1)
        out[:, i] = 48 + d
    return out.view(f"S{z}").ravel().astype(str)
