"""Oracle fixture: a deterministic flagship input whose EVERY derived
output has a DuckDB closed form — the q_mosaic_parity pattern applied
to the whole label-job / expand / roofshapes pipelines (reference
semantics anchors: /root/reference/make_original.py:26-62,
make_expand.py:36-102, make_roofshapes.py:20-53).

Construction rules (why the SQL twin is bit-exact):
- All geometry sits at GLOBAL z19 pixel anchors ``P + 0.25`` (dyadic):
  the WGS round trip web2wgs -> project2web perturbs a pixel coordinate
  by O(1e-6) px, and every consumer applies only ``floor`` (>= 0.25
  from a boundary) or ``round`` (0.25 from the .5 tie) — so tile
  indices, residuals, window rects and crop rects are EXACT integers
  in both engines. (Pixel CENTERS +0.5 would be floor-safe but
  round-UNSTABLE — mosaic's ``round(px - txmin*256)`` ties at .5.)
- Image pixels are the separable gradient v(X,Y,c) = base(u,v,c)
  + a(u,v)*(X//64)*4 + (Y//64) with v < 256, so decoded-crop pixel
  sums and the 8x8 block-mean phash have integer closed forms.
- The engine's splitmix64-style ``hash64`` is reproduced in SQL with
  HUGEINT 32-bit-limb wrapping multiplies (see ``queries.hash64_sql``),
  so the seeded positive sampling and the complement negative sampling
  are oracle-checked, not just row-counted.
- One image per canvas tile (the realistic shape: tile images ARE the
  table rows), so the first-writer dedup is deterministic without
  reproducing crc32 in SQL; the ``split`` column is a tile-key hash64
  at seed+1, so the train/valid assignment also replays bit-exactly.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa

from osmray import codecs
from osmray.tilemath import MAXAR, bbox_tiles, web2wgs

Z = 19
G = 64  # canvas tiles per side
TX0 = 290000
TY0 = 170000
N_NODE = 600
N_WAY = 80
N_POLY = 240
SEED = 42

_SCALE = float(1 << Z)


def pixel_wgs(px_i: np.ndarray, py_i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 of global z19 pixel anchor (px_i + 0.25, py_i + 0.25)
    under MAXAR offsets: tile_at_wgs will see px = px_i + 0.25."""
    wx = (np.asarray(px_i, np.float64) + 30.0 + 0.25) / _SCALE
    wy = (np.asarray(py_i, np.float64) - 10.0 + 0.25) / _SCALE
    return web2wgs(wx, wy)


def image_pixels(u: int, v: int) -> np.ndarray:
    """The gradient tile content for canvas tile (u, v)."""
    xs = np.arange(256)
    f = (xs // 64) * 4
    g = xs // 64
    a = 1 + (u * 3 + v * 5) % 4
    base = ((u * 7 + v * 11 + np.arange(3)) % 8) * 16
    return (base[None, None, :] + a * f[None, :, None] + g[:, None, None]).astype(
        np.uint8
    )


def image_pix_sum(u: int, v: int) -> int:
    """Closed form of image_pixels(u, v).sum() (the SQL twin's
    formula): 65536*Sbase + 768*a*1536 + 768*384."""
    a = 1 + (u * 3 + v * 5) % 4
    sbase = sum(((u * 7 + v * 11 + c) % 8) * 16 for c in range(3))
    return 65536 * sbase + 768 * (a * 1536) + 768 * 384


def image_phash(u: int, v: int) -> int:
    """Closed form of codecs.phash(image_pixels(u, v)): bit (i, j) set
    iff 2*(4*a*(j//2) + (i//2)) > 3*(4*a + 1); only j >= 4 bits can
    set, so the packed value stays positive."""
    a = 1 + (u * 3 + v * 5) % 4
    val = 0
    for i in range(8):
        for j in range(8):
            if 2 * (4 * a * (j // 2) + (i // 2)) > 3 * (4 * a + 1):
                val |= 1 << (63 - (8 * i + j))
    return val


def bbox() -> tuple[float, float, float, float]:
    """WGS bbox whose bbox_tiles canvas is exactly
    [TX0, TX0+G-1] x [TY0, TY0+G-1] (corner anchors at in-tile pixel
    128)."""
    latN, lngW = pixel_wgs(np.array([TX0 * 256 + 128]), np.array([TY0 * 256 + 128]))
    latS, lngE = pixel_wgs(
        np.array([(TX0 + G - 1) * 256 + 128]), np.array([(TY0 + G - 1) * 256 + 128])
    )
    return (float(lngW[0]), float(latS[0]), float(lngE[0]), float(latN[0]))


def image_table(idx: np.ndarray) -> pa.Table:
    """Images rows for canvas-tile indices (u = i % G, v = i // G) —
    a pure function of idx, the unit of parallel generation."""
    idx = np.asarray(idx, dtype=np.int64)
    u = idx % G
    v = idx // G
    px = (TX0 + u) * 256 + 77
    py = (TY0 + v) * 256 + 203
    lat, lng = pixel_wgs(px, py)
    ids, blobs, caps, hashes = [], [], [], np.empty(len(idx), dtype=np.int64)
    for j in range(len(idx)):
        uu, vv = int(u[j]), int(v[j])
        ids.append(f"im{10000 + vv * 100 + uu}")
        img = image_pixels(uu, vv)
        blobs.append(codecs.png_encode(img, level=1))
        caps.append(f"cap {TX0 + uu} {TY0 + vv}")
        hashes[j] = codecs.phash(img)
    n = len(idx)
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array([256] * n, pa.int32()),
            "h": pa.array([256] * n, pa.int32()),
            "fmt": pa.array(["png"] * n, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lng": pa.array(lng, pa.float64()),
        }
    )


def node_params(k: np.ndarray):
    """Node k: canvas tile (un, vn), in-tile pixel (rxn, ryn); lamp iff
    k % 5 != 0 (others carry a non-matching tag for the filter)."""
    k = np.asarray(k, dtype=np.int64)
    return (k * 37) % G, (k * 59) % G, (k * 13) % 240 + 8, (k * 29) % 240 + 8


def way_params(m: np.ndarray):
    """Way m: horizontal 2-vertex segment at tile centers, canvas tiles
    (gx0..gx1, gy)."""
    m = np.asarray(m, dtype=np.int64)
    gx0 = (m * 7) % 48
    return gx0, gx0 + 4 + m % 11, (m * 23) % (G - 1)


def poly_params(r: np.ndarray):
    """Polygon r: axis-aligned rectangle, top-left at canvas pixel
    (ax, ay), size (DX, DY); roof:shape label by r % 3."""
    r = np.asarray(r, dtype=np.int64)
    ax = (r * 1117) % (G * 256 - 2048)
    ay = (r * 2003) % (G * 256 - 2048)
    dx = 128 + (r % 24) * 64
    dy = 128 + ((r * 5) % 24) * 64
    return ax, ay, dx, dy


ROOF = ["flat", "gabled", "hipped"]


def feature_table() -> pa.Table:
    rows = {"feature_id": [], "kind": [], "tags": [], "geom_lat": [], "geom_lng": []}

    def add(fid, kind, tags, pxs, pys):
        lat, lng = pixel_wgs(np.asarray(pxs, np.int64), np.asarray(pys, np.int64))
        rows["feature_id"].append(fid)
        rows["kind"].append(kind)
        rows["tags"].append(tags)
        rows["geom_lat"].append(lat.tolist())
        rows["geom_lng"].append(lng.tolist())

    k = np.arange(N_NODE)
    un, vn, rxn, ryn = node_params(k)
    for i in range(N_NODE):
        tag = "street_lamp" if i % 5 != 0 else "stop"
        add(
            1000 + i,
            "node",
            {"highway": tag},
            [(TX0 + un[i]) * 256 + rxn[i]],
            [(TY0 + vn[i]) * 256 + ryn[i]],
        )
    m = np.arange(N_WAY)
    gx0, gx1, gy = way_params(m)
    for i in range(N_WAY):
        yy = (TY0 + gy[i]) * 256 + 128
        add(
            5000 + i,
            "way",
            {"highway": "residential"},
            [(TX0 + gx0[i]) * 256 + 128, (TX0 + gx1[i]) * 256 + 128],
            [yy, yy],
        )
    r = np.arange(N_POLY)
    ax, ay, dx, dy = poly_params(r)
    for i in range(N_POLY):
        x0 = TX0 * 256 + ax[i]
        y0 = TY0 * 256 + ay[i]
        add(
            9000 + i,
            "polygon",
            {"building": "yes", "roof:shape": ROOF[i % 3]},
            [x0, x0 + dx[i], x0 + dx[i], x0],
            [y0, y0, y0 + dy[i], y0 + dy[i]],
        )
    return pa.table(
        {
            "feature_id": pa.array(rows["feature_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "tags": pa.array(rows["tags"], pa.map_(pa.string(), pa.string())),
            "geom_lat": pa.array(rows["geom_lat"], pa.list_(pa.float64())),
            "geom_lng": pa.array(rows["geom_lng"], pa.list_(pa.float64())),
        }
    )


def write(root: str = "/tmp/osmray_oracle_fx", n_files: int = 8) -> str:
    """Idempotent fixture writer; returns root. Parallelizes image
    generation over Ray tasks when a session is up (rows are pure
    functions of index)."""
    import json

    import pyarrow.parquet as pq

    marker = os.path.join(root, ".oraclefix")
    want = f"{Z},{G},{TX0},{TY0},{N_NODE},{N_WAY},{N_POLY},v1"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == want:
                return root
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    win = bbox_tiles(*bbox(), Z, MAXAR)
    assert win == (TX0, TY0, TX0 + G - 1, TY0 + G - 1), win
    n = G * G
    per = (n + n_files - 1) // n_files
    import ray

    def shard(s: int) -> None:
        lo, hi = s * per, min(n, (s + 1) * per)
        if hi > lo:
            pq.write_table(
                image_table(np.arange(lo, hi)),
                os.path.join(root, "images", f"part-{s:04d}.parquet"),
            )

    if ray.is_initialized():
        rshard = ray.remote(shard)
        ray.get([rshard.remote(s) for s in range(n_files)])
    else:
        for s in range(n_files):
            shard(s)
    pq.write_table(feature_table(), os.path.join(root, "features.parquet"))
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump({"bbox": list(bbox()), "z": Z, "seed": SEED}, fh)
    with open(marker, "w") as fh:
        fh.write(want)
    return root


def load(root: str = "/tmp/osmray_oracle_fx"):
    """(images Dataset, features Table) over the written fixture."""
    import pyarrow.parquet as pq
    import ray.data

    write(root)
    images = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(root, "images", "*.parquet")))
    )
    feats = pq.read_table(os.path.join(root, "features.parquet"))
    return images, feats


# ---------------------------------------------------------------------------
# Planted-phash fixture: images whose codecs.phash is a CHOSEN 64-bit
# pattern, so decode -> phash -> dedup/near-dup pipelines have DuckDB
# closed forms. Construction: constant 32x32 blocks at gray 200 (bit
# set) / 40 (bit clear); channel-sum cell means strictly separate the
# two levels for any pattern except all-ones (never generated —
# asserted at write time), so the 8x8 block-mean hash reads the
# pattern back exactly.
# ---------------------------------------------------------------------------

PH_N = 1024


def _ph_flips(g: int, t: int) -> list[int]:
    """Variant t of group g flips these bit positions (XOR parity:
    coincident positions cancel, identically replayed in SQL)."""
    if t == 2:
        return [(g * 17) % 64]
    if t == 3:
        return [(g * 17) % 64, (g * 29 + 13) % 64, (g * 41 + 7) % 64, (g * 53 + 3) % 64]
    return []


def ph_pattern(i: int) -> int:
    """Planted 64-bit phash of fixture image i (MSB-first, j=0 is the
    MSB): base bit_j = ((g*2654435761 + j*40503) // 128) % 2 for group
    g = i // 4; variants t = i % 4 flip 0 / 0 / 1 / 4 positions — so
    (4k, 4k+1) are exact duplicates and (t=2, t=3) are near-dups of
    the base at small hamming distances."""
    g, t = i // 4, i % 4
    val = 0
    for j in range(64):
        b = ((g * 2654435761 + j * 40503) // 128) % 2
        for p in _ph_flips(g, t):
            if p == j:
                b ^= 1
        if b:
            val |= 1 << (63 - j)
    return val


def ph_image(i: int) -> np.ndarray:
    """256x256x3 image whose codecs.phash equals ph_pattern(i)."""
    pat = ph_pattern(i)
    bits = np.array([(pat >> (63 - j)) & 1 for j in range(64)], dtype=np.uint8)
    gray = np.where(bits.reshape(8, 8) == 1, 200, 40).astype(np.uint8)
    img = np.repeat(np.repeat(gray, 32, axis=0), 32, axis=1)
    return np.stack([img, img, img], axis=2)


def write_phash(root: str = "/tmp/osmray_phash_fx", n_files: int = 8) -> str:
    """Idempotent planted-phash fixture writer; returns root."""
    import pyarrow.parquet as pq

    marker = os.path.join(root, ".phashfix")
    want = f"{PH_N},v1"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == want:
                return root
    os.makedirs(root, exist_ok=True)
    per = (PH_N + n_files - 1) // n_files

    def shard(s: int) -> None:
        lo, hi = s * per, min(PH_N, (s + 1) * per)
        if hi <= lo:
            return
        idx, ids, blobs, planted = [], [], [], []
        for i in range(lo, hi):
            img = ph_image(i)
            pat = ph_pattern(i)
            got = int(np.uint64(np.int64(codecs.phash(img))).astype(np.uint64))
            assert got == pat, (i, got, pat)
            idx.append(i)
            ids.append(f"ph{i:05d}")
            blobs.append(codecs.png_encode(img, level=1))
            planted.append(np.uint64(pat).astype(np.int64))
        n = len(idx)
        pq.write_table(
            pa.table(
                {
                    "idx": pa.array(idx, pa.int64()),
                    "image_id": pa.array(ids, pa.string()),
                    "bytes": pa.array(blobs, pa.binary()),
                    "w": pa.array([256] * n, pa.int32()),
                    "h": pa.array([256] * n, pa.int32()),
                    "fmt": pa.array(["png"] * n, pa.string()),
                    "caption": pa.array([f"ph {i}" for i in idx], pa.string()),
                    "phash": pa.array(planted, pa.int64()),
                }
            ),
            os.path.join(root, f"part-{s:04d}.parquet"),
        )

    import ray

    if ray.is_initialized():
        rshard = ray.remote(shard)
        ray.get([rshard.remote(s) for s in range(n_files)])
    else:
        for s in range(n_files):
            shard(s)
    with open(marker, "w") as fh:
        fh.write(want)
    return root


def load_phash(root: str = "/tmp/osmray_phash_fx"):
    """Images Dataset over the planted-phash fixture."""
    import ray.data

    write_phash(root)
    return ray.data.read_parquet(sorted(glob.glob(os.path.join(root, "part-*.parquet"))))
