"""Diagnostics: the reference's minimap / video review tooling
(minimap.py, video.py) as table-producing dataflow (no AVI writer in
this environment — frames are rows; a sink can pack them).

- ``minimap``      mean color per tile painted onto a 1-px-per-tile
                   overview canvas (minimap.py:20-35)
- ``marked_frames`` dataset images with the reference's red-cross
                   marker drawn (video.py:15-18,36-39), capped at
                   ``limit`` frames (video.py:22-23); returns rows of
                   encoded frames in deterministic order
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmray import codecs
from osmray.tilemath import TILESIZE


def draw_marker(img: np.ndarray, cx: int = None, cy: int = None, arm: int = 6) -> np.ndarray:
    """The review marker: an X of two diagonal strokes in red (BGR
    255 on channel 2), centered (video.py:15-18)."""
    img = img.copy()
    h, w = img.shape[:2]
    cx = w // 2 if cx is None else cx
    cy = h // 2 if cy is None else cy
    for d in range(-arm, arm + 1):
        for dx, dy in ((d, d), (d, -d)):
            x, y = cx + dx, cy + dy
            if 0 <= x < w and 0 <= y < h:
                img[y, x, 0] = 0
                img[y, x, 1] = 0
                img[y, x, 2] = 255
    return img


def marked_frames(images_ds, limit: int = 10_000, out_fmt: str = "png"):
    """Frames with markers, deterministic order, frame cap."""

    def mark(batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        out = []
        for b, f in zip(blobs, fmts):
            img = codecs.decode(b, f)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            out.append(codecs.encode(draw_marker(img), out_fmt))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "frame": pa.array(out, pa.binary()),
                "fmt": pa.array([out_fmt] * len(out), pa.string()),
            }
        )

    return images_ds.sort("image_id").limit(limit).map_batches(mark, batch_format="pyarrow")


def minimap_canvas(tile_means, window: tuple[int, int, int, int]) -> np.ndarray:
    """Assemble the per-tile mean colors (tile_key, b, g, r rows) onto
    the 1-px-per-tile overview canvas for the window."""
    from osmray.tilemath import unpack_tile

    txmin, tymin, txmax, tymax = window
    canvas = np.zeros((tymax - tymin + 1, txmax - txmin + 1, 3), dtype=np.uint8)
    keys = np.asarray(tile_means["tile_key"], dtype=np.int64)
    tx, ty, _ = unpack_tile(keys)
    for i in range(len(keys)):
        x, y = int(tx[i] - txmin), int(ty[i] - tymin)
        if 0 <= y < canvas.shape[0] and 0 <= x < canvas.shape[1]:
            canvas[y, x] = (
                int(tile_means["b"][i]),
                int(tile_means["g"][i]),
                int(tile_means["r"][i]),
            )
    return canvas
