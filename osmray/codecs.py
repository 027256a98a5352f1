"""From-scratch image codecs (no cv2/Pillow in this environment).

The reference shells out to ``cv2.imread``/``imwrite`` for JPEG tiles
(lib/layers.py:196,227). Here images are opaque ``binary`` column
values inside Arrow batches (input_hint schema: ``bytes: binary, fmt:
string``); this module provides:

- ``raw``  — uninterpreted HWC uint8 buffer (zero transform), header
  carries shape;
- ``png``  — a real, standards-compliant subset of PNG: 8-bit RGB /
  grayscale, zlib DEFLATE, encode with per-row filter 0, decode
  handles all five filter types (so externally-produced baseline PNGs
  decode too);
- ``psnr`` — the >=40 dB acceptance metric (lossless codecs round-trip
  bit-exact -> inf);
- ``phash``— 8x8 block-mean hash packed to int64 (the input table's
  ``phash`` column; exact-dup detection key).

Lossy formats (JPEG) are NOT implemented from scratch in round 1; the
codec registry raises a clearly-marked NotImplementedError for them
while keeping the Ray-side plumbing (schema, batch shapes, actor
signatures) real — per the multimodal-stub guidance.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6, filt: int = 0) -> bytes:
    """Encode HWC uint8 (H, W, 3) or (H, W) to PNG bytes.

    ``filt`` 0 (none) or 2 (up, every row): the up filter turns
    smooth vertical content into near-zero residuals — on the bench
    imagery it shrinks the deflate-level-1 payload ~3x at the same
    encode cost, and decode stays vectorized (cumsum fast path in
    ``_unfilter``)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        h, w = img.shape
        color_type = 0
        rows = img.reshape(h, w)
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w, _ = img.shape
        color_type = 2
        rows = img.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    filtered = np.zeros((h, rows.shape[1] + 1), dtype=np.uint8)
    if filt == 2:
        filtered[:, 0] = 2
        filtered[0, 1:] = rows[0]
        # uint8 subtraction wraps mod 256 natively — exactly the up
        # filter's residual; no int16 promotion + cast-back copies
        filtered[1:, 1:] = rows[1:] - rows[:-1]
    elif filt == 0:
        filtered[:, 1:] = rows
    else:
        raise ValueError(f"unsupported PNG filter {filt} (0 or 2)")
    idat = zlib.compress(filtered.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(filtered: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG per-row filters (types 0-4). Row loop is over image
    height only; within-row recurrences (sub/paeth) loop in Python —
    acceptable because engine-written PNGs are filter 0 (pure reshape
    fast path)."""
    ftypes = filtered[:, 0]
    if not ftypes.any():
        return np.ascontiguousarray(filtered[:, 1:])
    if (ftypes == 2).all():
        # all-up fast path (what png_encode(filt=2) writes): the up
        # filter IS mod-256 column sums, which uint8 accumulate wraps
        # to natively — no 4x-traffic uint32 intermediate + cast copy
        # (measured 0.8 -> 0.6 ms per 256x256x3 image, bit-identical)
        return np.add.accumulate(filtered[:, 1:], axis=0, dtype=np.uint8)
    data = filtered[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        ft = ftypes[y]
        row = data[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            out[y] = row
        elif ft == 2:  # up
            out[y] = (row + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:  # paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    w = h = color_type = bit_depth = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bit_depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
                raise NotImplementedError(
                    f"PNG subset: 8-bit gray/RGB non-interlaced only "
                    f"(got depth={bit_depth} color={color_type} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    ch = 3 if color_type == 2 else 1
    stride = w * ch
    filtered = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    img = _unfilter(filtered, h, stride, ch)
    return img.reshape(h, w, 3) if ch == 3 else img.reshape(h, w)


def raw_encode(img: np.ndarray) -> bytes:
    """Header (h, w, c as >HHB) + C-order uint8 buffer."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    return struct.pack(">HHB", h, w, c) + img.tobytes()


def raw_decode(data: bytes) -> np.ndarray:
    h, w, c = struct.unpack(">HHB", data[:5])
    img = np.frombuffer(data[5:], dtype=np.uint8).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


_QZL_MAGIC = b"QZL1"


def qzl_encode(img: np.ndarray, q: int = 2, level: int = 6) -> bytes:
    """From-scratch LOSSY codec: integer luma + quantized full-res
    chroma differences, zlib-compressed planes. Error is bounded by
    the quantizers (luma step ``q``, chroma step ``2q``): PSNR ~44 dB
    at q=2 — gives the input_hint's PSNR>=40 acceptance gate a real
    lossy path while compressing ~4-8x on typical content."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, _ = img.shape
    r = img[:, :, 0].astype(np.int32)
    g = img[:, :, 1].astype(np.int32)
    b = img[:, :, 2].astype(np.int32)
    y = (77 * r + 150 * g + 29 * b) >> 8
    cq = 2 * q
    yq = (y // q).astype(np.uint8)
    dbq = ((b - y + 255) // cq).astype(np.uint8)  # [0, 510]//cq <= 255 for cq>=2
    drq = ((r - y + 255) // cq).astype(np.uint8)
    payload = zlib.compress(yq.tobytes() + dbq.tobytes() + drq.tobytes(), level)
    return _QZL_MAGIC + struct.pack(">HHB", h, w, q) + payload


def qzl_decode(data: bytes) -> np.ndarray:
    if data[:4] != _QZL_MAGIC:
        raise ValueError("not a QZL payload")
    h, w, q = struct.unpack(">HHB", data[4:9])
    raw = zlib.decompress(data[9:])
    n = h * w
    cq = 2 * q
    yq = np.frombuffer(raw[:n], dtype=np.uint8).reshape(h, w).astype(np.int32)
    dbq = np.frombuffer(raw[n : 2 * n], dtype=np.uint8).reshape(h, w).astype(np.int32)
    drq = np.frombuffer(raw[2 * n :], dtype=np.uint8).reshape(h, w).astype(np.int32)
    y = yq * q + q // 2
    b = np.clip(y + dbq * cq + cq // 2 - 255, 0, 255)
    r = np.clip(y + drq * cq + cq // 2 - 255, 0, 255)
    g = np.clip(((y << 8) - 77 * r - 29 * b) // 150, 0, 255)
    # channel writes into a preallocated HWC buffer skip the
    # stack+astype copies (values identical)
    out = np.empty((h, w, 3), dtype=np.uint8)
    out[:, :, 0] = r
    out[:, :, 1] = g
    out[:, :, 2] = b
    return out


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "raw":
        return raw_decode(data)
    if fmt == "qzl":
        return qzl_decode(data)
    if fmt in ("jpg", "jpeg"):
        from osmray.jpeg import jpeg_decode

        return jpeg_decode(data)
    if fmt == "webp":
        raise NotImplementedError(
            "webp is stubbed in this environment (no image libraries "
            "available); plumbing is real, decode is not"
        )
    raise ValueError(f"unknown image fmt {fmt!r}")


def encode(img: np.ndarray, fmt: str, level: int = 6, filt: int = 0) -> bytes:
    if fmt == "png":
        return png_encode(img, level, filt=filt)
    if fmt == "raw":
        return raw_encode(img)
    if fmt == "qzl":
        return qzl_encode(img, level=level)
    if fmt in ("jpg", "jpeg"):
        from osmray.jpeg import jpeg_encode

        return jpeg_encode(img)
    raise NotImplementedError(f"encoder for {fmt!r} not available")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images.
    The acceptance gate is >= 40 dB for lossy round-trips. uint8
    inputs take an exact integer path (float64 squaring of the full
    image is ~2 ms per 256x256x3 — this is hot in decode_roundtrip)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.dtype == np.uint8 and b.dtype == np.uint8:
        d = a.astype(np.int32) - b.astype(np.int32)
        sq = int((d * d).sum(dtype=np.int64))
        if sq == 0:
            return float("inf")
        return float(10.0 * np.log10(255.0 * 255.0 * a.size / sq))
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def phash(img: np.ndarray) -> np.int64:
    """8x8 block-mean hash -> int64. Grayscale by channel mean, reduce
    each (H/8, W/8) block to its mean, threshold at the global mean of
    the 64 cells, pack row-major MSB-first into an int64 (viewed
    signed so it fits the Arrow int64 column)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    bh, bw = h // 8, w // 8
    if bh == 0 or bw == 0:
        raise ValueError("image smaller than 8x8")
    if img.ndim == 3:
        # fold channels INSIDE the block reduction — no H x W int64
        # intermediate (1.5x over summing channels first; same values)
        cells = (
            img[: bh * 8, : bw * 8]
            .reshape(8, bh, 8, bw, img.shape[2])
            .sum(axis=(1, 3, 4), dtype=np.int64)
        )
    else:
        cells = img[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(axis=(1, 3), dtype=np.int64)
    bits = (cells > cells.mean()).ravel()
    packed = int.from_bytes(np.packbits(bits).tobytes(), "big")  # MSB-first
    return np.uint64(packed).astype(np.int64)


def phash_batch(imgs: list[np.ndarray]) -> np.ndarray:
    return np.asarray([phash(im) for im in imgs], dtype=np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-element Hamming distance between two int64 hash arrays
    (byte-view unpackbits — one pass, no 64-step shift loop)."""
    x = np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)
    flat = np.ascontiguousarray(x).reshape(-1).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(flat, axis=1).sum(axis=1).astype(np.int64).reshape(x.shape)
