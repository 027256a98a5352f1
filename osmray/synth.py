"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md.

Generates the two input tables the engine consumes — ``images``
(input_hint shape) and ``features`` (OSM-style vectors) — as parquet
under a target directory. Byte-identical across runs and parallelism
levels: every random draw comes from one seeded generator, and
per-image pixels are a pure function of ``image_id``.

Geography: the reference's whole-city bbox, zooms z18/z19
(make_original.py:22, make_expand.py:21). Skew: half of all features
land inside one "urban" window covering ~2 % of the bbox (drives the
salted-repartition tests).
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from osmray import codecs

BOX = (27.4026, 53.8306, 27.7003, 53.9739)  # W, S, E, N
SEED = 42

HIGHWAY_CLASSES = [
    "trunk",
    "trunk_link",
    "primary",
    "primary_link",
    "secondary",
    "tertiary",
    "residential",
    "unclassified",
]  # the 8 classes the reference queries (lib/loaders.py:38-45)

ROOF_SHAPES = ["flat", "hipped", "gabled"]

# ~meters per degree at the bbox latitude
_M_PER_DEG_LAT = 111_320.0
_M_PER_DEG_LNG = 65_600.0

# the urban skew window: ~2 % of bbox area
_URBAN = (27.55, 53.89, 27.59, 53.905)


_TEMPLATE_CACHE: dict[tuple[int, int], np.ndarray] = {}


def image_pixels(image_id: str, h: int = 256, w: int = 256) -> np.ndarray:
    """pix[y,x,c] = (x*3 + y*5 + c*7 + crc32(image_id)) % 256."""
    tmpl = _TEMPLATE_CACHE.get((h, w))
    if tmpl is None:
        x = ((np.arange(w) * 3) % 256).astype(np.uint8)[None, :, None]
        y = ((np.arange(h) * 5) % 256).astype(np.uint8)[:, None, None]
        c = ((np.arange(3) * 7) % 256).astype(np.uint8)[None, None, :]
        tmpl = x + y + c  # uint8 arithmetic wraps mod 256 by construction
        _TEMPLATE_CACHE[(h, w)] = tmpl
    base = np.uint8(zlib.crc32(image_id.encode()) % 256)
    return tmpl + base


def _edge_snapped_points(rng: np.random.Generator, n: int):
    """Uniform points with ~5 % within 16 px and ~2 % within 24 px of a
    z19 tile edge (exercises skipedge, lib/layers.py:135-141)."""
    from osmray import tilemath

    W, S, E, N = BOX
    lat = rng.uniform(S, N, n)
    lng = rng.uniform(W, E, n)
    # snap a slice of points into edge bands by nudging their in-tile px
    wx, wy = tilemath.project2web(lat, lng)
    scale = float(1 << 19)
    px = wx * scale
    py = wy * scale
    u = rng.uniform(0, 1, n)
    band16 = u < 0.05
    band24 = (u >= 0.05) & (u < 0.07)
    off16 = rng.uniform(0, 16, n)
    off24 = rng.uniform(16, 24, n)
    tx = np.floor(px / 256)
    px = np.where(band16, tx * 256 + off16, px)
    px = np.where(band24, tx * 256 + off24, px)
    # invert back to lng (x only; y untouched keeps things simple)
    lng = (px / scale / 256.0 - 0.5) * 360.0
    return lat, lng


def make_images(n: int, rng: np.random.Generator | None = None) -> pa.Table:
    rng = rng or np.random.default_rng(SEED)
    lat, lng = _edge_snapped_points(rng, n)
    ids = [f"img{i:08d}" for i in range(n)]
    fmts = ["png" if i % 2 == 0 else "raw" for i in range(n)]
    # ~1 % exact duplicates: row i copies the pixels of row i-1
    dup = rng.uniform(0, 1, n) < 0.01
    dup[0] = False
    blobs: list[bytes] = []
    hashes = np.empty(n, dtype=np.int64)
    for i in range(n):
        src_id = ids[i - 1] if dup[i] else ids[i]
        img = image_pixels(src_id)
        blobs.append(codecs.encode(img, fmts[i]))
        hashes[i] = codecs.phash(img)
    captions = [f"tile at lat={lat[i]:.6f} lng={lng[i]:.6f} #{i}" for i in range(n)]
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([256] * n, pa.int32()),
            "h": pa.array([256] * n, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lng": pa.array(lng, pa.float64()),
        }
    )


def _skewed_center(rng: np.random.Generator):
    if rng.uniform() < 0.5:
        W, S, E, N = _URBAN
    else:
        W, S, E, N = BOX
    return rng.uniform(S, N), rng.uniform(W, E)


def _exclusion_rings() -> list[list[tuple[float, float]]]:
    """The reference's literal exclusion rings when available (pins WKT
    parsing parity, lib/helpers.py:217-226); synthetic boxes otherwise."""
    wkt_path = "/root/reference/make_buildings_except.wkt"
    if os.path.exists(wkt_path):
        from osmray.oracle import latlngs_from_wkt

        with open(wkt_path) as fh:
            return latlngs_from_wkt(fh.read())
    rng = np.random.default_rng(SEED + 7)
    out = []
    for _ in range(8):
        la, ln = _skewed_center(rng)
        d = 0.002
        out.append([(la, ln), (la, ln + d), (la + d, ln + d), (la + d, ln), (la, ln)])
    return out


def make_features(
    n_nodes: int, n_ways: int, n_polygons: int, rng: np.random.Generator | None = None
) -> pa.Table:
    rng = rng or np.random.default_rng(SEED + 1)
    rows = []

    def add(kind, tags, ring):
        rows.append(
            {
                "feature_id": len(rows),
                "kind": kind,
                "tags": list(tags.items()),
                "geom_lat": [p[0] for p in ring],
                "geom_lng": [p[1] for p in ring],
            }
        )

    for _ in range(n_nodes):
        la, ln = _skewed_center(rng)
        add("node", {"highway": "street_lamp"}, [(la, ln)])

    for i in range(n_ways):
        la, ln = _skewed_center(rng)
        k = int(rng.integers(3, 13))
        ring = [(la, ln)]
        for _ in range(k - 1):
            la = la + rng.uniform(-400, 400) / _M_PER_DEG_LAT
            ln = ln + rng.uniform(-400, 400) / _M_PER_DEG_LNG
            ring.append((la, ln))
        add("way", {"highway": HIGHWAY_CLASSES[i % len(HIGHWAY_CLASSES)]}, ring)

    for i in range(n_polygons):
        la, ln = _skewed_center(rng)
        k = int(rng.integers(4, 11))
        radius_m = rng.uniform(10, 100)
        angles = np.sort(rng.uniform(0, 2 * np.pi, k))
        ring = [
            (
                la + radius_m * np.sin(a) / _M_PER_DEG_LAT,
                ln + radius_m * np.cos(a) / _M_PER_DEG_LNG,
            )
            for a in angles
        ]
        ring.append(ring[0])  # closed: first == last
        tags = {"building": "yes"}
        if i % 3 != 2:
            tags["roof:shape"] = ROOF_SHAPES[i % 3]
        add("polygon", tags, ring)

    for ring in _exclusion_rings():
        add("exclusion", {}, ring)

    return pa.table(
        {
            "feature_id": pa.array([r["feature_id"] for r in rows], pa.int64()),
            "kind": pa.array([r["kind"] for r in rows], pa.string()),
            "tags": pa.array(
                [r["tags"] for r in rows], pa.map_(pa.string(), pa.string())
            ),
            "geom_lat": pa.array([r["geom_lat"] for r in rows], pa.list_(pa.float64())),
            "geom_lng": pa.array([r["geom_lng"] for r in rows], pa.list_(pa.float64())),
        }
    )


def write_fixture(
    out_dir: str,
    n_images: int = 2048,
    n_nodes: int = 2000,
    n_ways: int = 500,
    n_polygons: int = 800,
    n_image_files: int = 8,
) -> None:
    """Write images (sharded into ``n_image_files`` row-group-friendly
    parquet files so Ray reads parallelize) + features under out_dir.
    Idempotent: skips if the manifest marker matches the request."""
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".synth")
    want = f"{n_images},{n_nodes},{n_ways},{n_polygons},{n_image_files},v1"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == want:
                return
    images = make_images(n_images)
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    per = (n_images + n_image_files - 1) // n_image_files
    for s in range(n_image_files):
        part = images.slice(s * per, per)
        if len(part):
            pq.write_table(part, os.path.join(img_dir, f"part-{s:04d}.parquet"))
    pq.write_table(
        make_features(n_nodes, n_ways, n_polygons), os.path.join(out_dir, "features.parquet")
    )
    with open(marker, "w") as fh:
        fh.write(want)
