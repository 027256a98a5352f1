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


def dense_window(n_tiles: int, z: int = 19):
    """A rectangular tile window of ~``n_tiles`` z-level tiles centered
    in the city canvas, returned as a WGS bbox (W, S, E, N) whose
    corner points are TILE CENTERS — so ``bbox_tiles`` recovers exactly
    this window under the MAXAR scheme.

    The fixture is TILE-DENSE over this window (one image per tile,
    extras cycling) because that is the real input shape: the imagery
    table covers every tile of the job bbox; sampled positive /
    negative tiles must actually join against image rows.
    """
    from osmray import tilemath

    txmin, tymin, txmax, tymax = tilemath.bbox_tiles(*BOX, z, tilemath.MAXAR)
    w = int(np.ceil(np.sqrt(n_tiles)))
    h = int(np.ceil(n_tiles / w))
    cx, cy = (txmin + txmax) // 2, (tymin + tymax) // 2
    tx0, ty0 = cx - w // 2, cy - h // 2
    latN, lngW = tilemath.wgs_at_tile(np.array([tx0]), np.array([ty0]), z)
    latS, lngE = tilemath.wgs_at_tile(np.array([tx0 + w - 1]), np.array([ty0 + h - 1]), z)
    return (float(lngW[0]), float(latS[0]), float(lngE[0]), float(latN[0]))


def _u01(idx: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform [0,1) as a PURE function of row index —
    generation parallelizes across Ray tasks and stays byte-identical
    at any parallelism (no sequential RNG stream)."""
    from osmray.stages import hash64

    h = hash64(np.asarray(idx, dtype=np.int64), SEED * 1000 + salt).astype(np.uint64)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _tile_dense_points(idx: np.ndarray, bbox, z: int = 19):
    """One point per canvas tile of ``bbox`` (row-major by index,
    cycling when indices exceed the tile count -> exercises per-tile
    dedup), with the in-tile pixel uniform except ~5 % forced within
    16 px and ~2 % within 16-24 px of the tile's x-edge (exercises
    skipedge, lib/layers.py:135-141). Inverted through the MAXAR
    offsets so pipeline tile assignment lands on the intended tile."""
    from osmray import tilemath

    scheme = tilemath.MAXAR
    txmin, tymin, txmax, tymax = tilemath.bbox_tiles(*bbox, z, scheme)
    width = txmax - txmin + 1
    height = tymax - tymin + 1
    i = np.asarray(idx, dtype=np.int64) % (width * height)
    tx = txmin + (i % width)
    ty = tymin + (i // width)
    rx = 256.0 * _u01(idx, 1)
    ry = 256.0 * _u01(idx, 2)
    u = _u01(idx, 3)
    rx = np.where(u < 0.05, 16.0 * _u01(idx, 4), rx)
    rx = np.where((u >= 0.05) & (u < 0.07), 16.0 + 8.0 * _u01(idx, 4), rx)
    scale = float(1 << z)
    wx = (tx * 256.0 + rx) / scale - scheme.offsetx
    wy = (ty * 256.0 + ry) / scale - scheme.offsety
    return tilemath.web2wgs(wx, wy)


def image_rows(idx: np.ndarray, bbox) -> pa.Table:
    """The images table rows for the given indices — a pure function
    of (idx, bbox); the unit of parallel generation."""
    idx = np.asarray(idx, dtype=np.int64)
    n = len(idx)
    lat, lng = _tile_dense_points(idx, bbox)
    ids = [f"img{i:08d}" for i in idx]
    # lossless png/raw + the from-scratch LOSSY qzl (exercises the
    # PSNR>=40 gate with real loss)
    _FMTS = ["png", "raw", "png", "qzl"]
    fmts = [_FMTS[i % 4] for i in idx]
    # ~1 % exact duplicates: row i copies the pixels of row i-1
    dup = (_u01(idx, 5) < 0.01) & (idx > 0)
    blobs: list[bytes] = []
    hashes = np.empty(n, dtype=np.int64)
    for j in range(n):
        src_id = f"img{idx[j] - 1:08d}" if dup[j] else ids[j]
        img = image_pixels(src_id)
        blob = codecs.encode(img, fmts[j])
        blobs.append(blob)
        # phash describes the STORED image (what a consumer decodes),
        # so lossy rows hash the decoded pixels
        hashes[j] = codecs.phash(codecs.decode(blob, fmts[j]) if fmts[j] == "qzl" else img)
    captions = [f"tile at lat={lat[j]:.6f} lng={lng[j]:.6f} #{idx[j]}" for j in range(n)]
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


def make_images(n: int, bbox=None) -> pa.Table:
    bbox = bbox or dense_window(max(64, (n * 3) // 5))
    return image_rows(np.arange(n), bbox)


def _skewed_center(rng: np.random.Generator, bbox=None):
    W, S, E, N = bbox or BOX
    if rng.uniform() < 0.5:
        # urban skew window: central ~2 % of the bbox area
        cx, cy = (W + E) / 2, (S + N) / 2
        W, E = cx - (E - W) * 0.07, cx + (E - W) * 0.07
        S, N = cy - (N - S) * 0.07, cy + (N - S) * 0.07
    return rng.uniform(S, N), rng.uniform(W, E)


def _exclusion_rings(bbox=None) -> list[list[tuple[float, float]]]:
    """In-window synthetic exclusion boxes, plus (when available) the
    reference's literal WKT rings — pins WKT parsing parity with
    lib/helpers.py:217-226 even though those rings usually fall outside
    a small fixture window."""
    W, S, E, N = bbox or BOX
    rng = np.random.default_rng(SEED + 7)
    out = []
    for _ in range(4):
        la, ln = _skewed_center(rng, bbox)
        dla, dln = (N - S) * 0.03, (E - W) * 0.03
        out.append([(la, ln), (la, ln + dln), (la + dla, ln + dln), (la + dla, ln), (la, ln)])
    wkt_path = "/root/reference/make_buildings_except.wkt"
    if os.path.exists(wkt_path):
        from osmray.oracle import latlngs_from_wkt

        with open(wkt_path) as fh:
            out.extend(latlngs_from_wkt(fh.read()))
    return out


def make_features(
    n_nodes: int,
    n_ways: int,
    n_polygons: int,
    rng: np.random.Generator | None = None,
    bbox=None,
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

    W, S, E, N = bbox or BOX
    step_m = min(400.0, (N - S) * _M_PER_DEG_LAT / 8.0)

    for _ in range(n_nodes):
        la, ln = _skewed_center(rng, bbox)
        add("node", {"highway": "street_lamp"}, [(la, ln)])

    for i in range(n_ways):
        la, ln = _skewed_center(rng, bbox)
        k = int(rng.integers(3, 13))
        ring = [(la, ln)]
        for _ in range(k - 1):
            la = la + rng.uniform(-step_m, step_m) / _M_PER_DEG_LAT
            ln = ln + rng.uniform(-step_m, step_m) / _M_PER_DEG_LNG
            ring.append((la, ln))
        add("way", {"highway": HIGHWAY_CLASSES[i % len(HIGHWAY_CLASSES)]}, ring)

    for i in range(n_polygons):
        la, ln = _skewed_center(rng, bbox)
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

    for ring in _exclusion_rings(bbox):
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
    import json

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, ".synth")
    want = f"{n_images},{n_nodes},{n_ways},{n_polygons},{n_image_files},v4"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == want:
                return
    bbox = dense_window(max(64, (n_images * 3) // 5))
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    import ray

    if ray.is_initialized() and n_images >= 8192:
        # parallel generation: rows are pure functions of index, so any
        # task layout yields identical content
        import ray.data

        per = (n_images + n_image_files - 1) // n_image_files

        @ray.remote
        def gen_shard(s: int) -> None:
            lo = s * per
            hi = min(n_images, lo + per)
            if hi > lo:
                pq.write_table(
                    image_rows(np.arange(lo, hi), bbox),
                    os.path.join(img_dir, f"part-{s:04d}.parquet"),
                )

        ray.get([gen_shard.remote(s) for s in range(n_image_files)])
    else:
        per = (n_images + n_image_files - 1) // n_image_files
        for s in range(n_image_files):
            lo = s * per
            hi = min(n_images, lo + per)
            if hi > lo:
                pq.write_table(
                    image_rows(np.arange(lo, hi), bbox),
                    os.path.join(img_dir, f"part-{s:04d}.parquet"),
                )
    pq.write_table(
        make_features(n_nodes, n_ways, n_polygons, bbox=bbox),
        os.path.join(out_dir, "features.parquet"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump({"bbox": list(bbox), "z": 19, "n_images": n_images, "seed": SEED}, fh)
    with open(marker, "w") as fh:
        fh.write(want)


def fixture_bbox(out_dir: str) -> tuple[float, float, float, float]:
    import json

    with open(os.path.join(out_dir, "meta.json")) as fh:
        return tuple(json.load(fh)["bbox"])
