"""From-scratch MJPEG-in-AVI container writer/reader (RIFF).

The reference's review tool writes a 60 fps DIVX AVI via
``cv2.VideoWriter`` (video.py:22-29). No video library exists in this
environment, but AVI is just a RIFF chunk list, and the engine has a
real JPEG codec (osmray/jpeg.py) — so the diagnostics surface can
emit a REAL, standards-compliant Motion-JPEG AVI: every player
understands fourcc 'MJPG' (frames are baseline JPEGs). The DIVX codec
itself is out of scope (patented DCT+MC bitstream); the divergence is
container-complete, codec-substituted, and documented.

Layout written (one video stream, no audio):

    RIFF('AVI ')
      LIST('hdrl') { avih, LIST('strl'){ strh, strf(BITMAPINFOHEADER) } }
      LIST('movi') { '00dc' <jpeg bytes> ... }
      idx1

The reader walks chunks (tolerating unknown ones) and returns the
frame JPEG payloads + (fps, w, h) so round-trips are testable.
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(tag: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", tag + payload)


def avi_write(frames: list[bytes], fps: int, w: int, h: int) -> bytes:
    """Pack JPEG-encoded frames into an MJPG AVI."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(1, fps),  # microseconds per frame
        max_bytes * fps,  # max bytes per sec (advisory)
        0,  # padding granularity
        0x10,  # flags: AVIF_HASINDEX
        n, 0,  # total frames, initial frames
        1,  # streams
        max_bytes,  # suggested buffer size
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0, 0, 0, 0,  # flags, priority, language, initial frames
        1, max(1, fps),  # scale, rate -> fps
        0, n,  # start, length (frames)
        max_bytes, 0xFFFFFFFF, 0,  # bufsize, quality, sample size
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: offsets are relative to the start of the 'movi' list data
    idx = []
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _chunk(b"RIFF", riff_payload)


def avi_read(blob: bytes) -> tuple[list[bytes], int, int, int]:
    """Walk an AVI's chunks; return (jpeg frames, fps, w, h).
    Only MJPG video streams are decodable by this engine; other
    fourccs still parse structurally (frames returned raw)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps = w = h = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int):
        nonlocal fps, w, h
        while pos + 8 <= end:
            tag = blob[pos : pos + 4]
            (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            body = pos + 8
            if tag == b"LIST":
                walk(body + 4, body + ln)
            elif tag == b"strh":
                typ, _handler = blob[body : body + 4], blob[body + 4 : body + 8]
                if typ == b"vids":
                    scale, rate = struct.unpack("<II", blob[body + 20 : body + 28])
                    fps = rate // max(1, scale)
            elif tag == b"strf" and w == 0:
                _sz, bw, bh = struct.unpack("<Iii", blob[body : body + 12])
                w, h = bw, abs(bh)
            elif tag[2:] == b"dc":
                frames.append(blob[body : body + ln])
            pos = body + ln + (ln & 1)

    walk(12, len(blob))
    return frames, fps, w, h


def pack_marked_frames(frames_ds, out_path: str, fps: int = 60, quality: int = 85) -> dict:
    """Sink: pack a ``marked_frames`` dataset (image_id, frame, fmt)
    into one MJPG AVI at ``out_path``. Frames are transcoded to JPEG
    per batch IN PARALLEL (actor-less map, the container assembly is
    the only driver-side step — frame bytes stream back ordered by
    image_id). Returns {n_frames, w, h, bytes}."""
    import numpy as np
    import pyarrow as pa

    from osmray import codecs

    def to_jpeg(batch: pa.Table) -> pa.Table:
        out = []
        dims = []
        for b, f in zip(batch["frame"].to_pylist(), batch["fmt"].to_pylist()):
            img = codecs.decode(b, f)
            if img.ndim == 2:
                img = np.repeat(img[:, :, None], 3, axis=2)
            dims.append(img.shape[:2])
            from osmray.jpeg import jpeg_encode

            out.append(jpeg_encode(img, quality))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "jpeg": pa.array(out, pa.binary()),
                "h": pa.array([d[0] for d in dims], pa.int32()),
                "w": pa.array([d[1] for d in dims], pa.int32()),
            }
        )

    rows = frames_ds.map_batches(to_jpeg, batch_format="pyarrow").sort("image_id")
    tbl = rows.to_arrow_refs()
    import ray

    frames, w, h = [], 0, 0
    for ref in tbl:
        t = ray.get(ref)
        frames.extend(t["jpeg"].to_pylist())
        if t.num_rows:
            h = int(t["h"][0].as_py())
            w = int(t["w"][0].as_py())
    blob = avi_write(frames, fps, w, h)
    with open(out_path, "wb") as fh:
        fh.write(blob)
    return {"n_frames": len(frames), "w": w, "h": h, "bytes": len(blob)}
