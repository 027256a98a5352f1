"""Multimodal columns: image / audio / video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Per the build brief: the image path is fully real (our own codecs);
audio/video DECODE is stubbed behind clearly-marked
``NotImplementedError`` (no media libraries exist in this container)
with a deterministic fake behind ``allow_fake=True`` so the Ray-side
plumbing — schema, batch shapes, actor signatures, output layout — is
real and tested end-to-end.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from osmray import codecs

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),  # 'wav' | 'flac' | ... (all stubbed)
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("fmt", pa.string()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
        ("w", pa.int32()),
        ("h", pa.int32()),
    ]
)


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact block-mean downscale when dimensions divide; otherwise
    nearest-neighbor index sampling. Pure numpy, deterministic."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        bh, bw = h // out_h, w // out_w
        if img.ndim == 3:
            return (
                img.reshape(out_h, bh, out_w, bw, img.shape[2])
                .mean(axis=(1, 3))
                .round()
                .astype(np.uint8)
            )
        return img.reshape(out_h, bh, out_w, bw).mean(axis=(1, 3)).round().astype(np.uint8)
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[yi][:, xi]


class ImageResizeStage:
    """Actor-pool stage: decode -> resize -> re-encode. Fully real."""

    def __init__(self, out_h: int = 64, out_w: int = 64, out_fmt: str = "png"):
        self.out_h, self.out_w, self.out_fmt = out_h, out_w, out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            img = codecs.decode(blob, fmt)
            out.append(codecs.encode(resize_block_mean(img, self.out_h, self.out_w), self.out_fmt))
        t = pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out, pa.binary()),
                "fmt": pa.array([self.out_fmt] * len(out), pa.string()),
                "w": pa.array([self.out_w] * len(out), pa.int32()),
                "h": pa.array([self.out_h] * len(out), pa.int32()),
            }
        )
        for name in batch.column_names:  # pass through extra columns
            if name not in t.column_names:
                t = t.append_column(name, batch[name])
        return t


AUGMENT_OPS = ("identity", "hflip", "vflip", "rot90", "brightness")


def augment_image(img: np.ndarray, op: str) -> np.ndarray:
    """Deterministic training augmentations, pure numpy."""
    if op == "identity":
        return img
    if op == "hflip":
        return img[:, ::-1]
    if op == "vflip":
        return img[::-1]
    if op == "rot90":
        return np.rot90(img)
    if op == "brightness":  # +24 clipped — a fixed photometric jitter
        return np.clip(img.astype(np.int16) + 24, 0, 255).astype(np.uint8)
    raise ValueError(f"unknown augment op {op!r}")


class AugmentStage:
    """Actor-pool stage: decode -> deterministic augmentation ->
    re-encode. The op is chosen per row from the image_id hash (so
    reruns reproduce byte-identical output; pass ``op`` to force one),
    and the emitted ``aug`` column records it."""

    def __init__(self, out_fmt: str = "png", op: str | None = None,
                 op_col: str | None = None):
        self.out_fmt = out_fmt
        self.op = op
        self.op_col = op_col  # per-row op from a column (declarative twin)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.stages import hash_str

        ids = batch["image_id"]
        if self.op_col is not None:
            ops = batch[self.op_col].to_pylist()
        elif self.op is None:
            sel = (hash_str(ids) % len(AUGMENT_OPS)).astype(np.int64)
            ops = [AUGMENT_OPS[i] for i in sel]
        else:
            ops = [self.op] * len(ids)
        blobs, ws, hs = [], [], []
        for blob, fmt, op in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist(), ops):
            img = augment_image(codecs.decode(blob, fmt), op)
            blobs.append(codecs.encode(np.ascontiguousarray(img), self.out_fmt))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
        t = pa.table(
            {
                "image_id": ids,
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array([self.out_fmt] * len(blobs), pa.string()),
                "w": pa.array(np.asarray(ws, dtype=np.int32)),
                "h": pa.array(np.asarray(hs, dtype=np.int32)),
                "aug": pa.array(ops, pa.string()),
            }
        )
        for name in batch.column_names:  # pass through extra columns
            if name not in t.column_names and name != self.op_col:
                t = t.append_column(name, batch[name])
        return t


def _fake_pcm(media_id: str, n: int) -> np.ndarray:
    """Deterministic stand-in decode: a seeded int16 waveform."""
    base = zlib.crc32(media_id.encode())
    t = np.arange(n, dtype=np.float64)
    wave = 3000 * np.sin(2 * np.pi * (220 + base % 200) * t / 16000)
    return wave.astype(np.int16)


def wav_encode(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono/stereo PCM16 -> RIFF/WAVE bytes. Pure struct+numpy —
    WAV is a trivial container (RIFF header + fmt + data chunks)."""
    import struct

    pcm = np.asarray(pcm, dtype=np.int16)
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    data = np.ascontiguousarray(pcm).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> (int16 array [(n,) mono or (n, ch)], rate).
    Walks the chunk list, so extra chunks (LIST/INFO/fact) are fine.
    Only uncompressed 16-bit PCM (audio format 1) is supported."""
    import struct

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    ch = rate = bits = None
    data = None
    while pos + 8 <= len(blob):
        tag = blob[pos : pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        payload = blob[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", payload[:16])
            if audio_fmt != 1:
                raise NotImplementedError(f"WAV audio format {audio_fmt} (not PCM)")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV (only PCM16 supported)")
        elif tag == b"data":
            data = payload
    if ch is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        pcm = pcm.reshape(-1, ch)
    return pcm, rate


class AudioFeatureStage:
    """Actor-pool stage: audio binary column -> fixed-length feature
    vector (frame RMS energies + zero-crossing rate).

    ``fmt='wav'`` decodes FOR REAL (RIFF/PCM16, ``wav_decode`` above —
    no library needed). Compressed codecs (flac/mp3/...) remain
    env-stubbed: NotImplementedError unless ``allow_fake=True``
    substitutes a deterministic seeded waveform so the dataflow
    (schema, batching, actor state, output layout) still runs for
    real. A wav blob that fails to parse falls back the same way.
    """

    def __init__(self, frame: int = 1024, n_frames: int = 16, allow_fake: bool = False):
        self.frame = frame
        self.n_frames = n_frames
        self.allow_fake = allow_fake

    def _decode(self, media_id: str, blob: bytes, fmt: str, n_samples: int) -> np.ndarray:
        if fmt == "wav" and blob[:4] == b"RIFF":
            pcm, _rate = wav_decode(blob)
            if pcm.ndim == 2:  # mixdown to mono
                pcm = pcm.mean(axis=1).astype(np.int16)
            return pcm
        if not self.allow_fake:
            raise NotImplementedError(
                f"audio codec {fmt!r} is stubbed in this environment "
                "(no audio libraries; real path exists for RIFF/PCM16 wav); "
                "pass allow_fake=True for the deterministic plumbing-test waveform"
            )
        return _fake_pcm(media_id, n_samples)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for mid, blob, fmt, n in zip(
            batch["media_id"].to_pylist(),
            batch["bytes"].to_pylist(),
            batch["fmt"].to_pylist(),
            batch["n_samples"].to_pylist(),
        ):
            pcm = self._decode(mid, blob, fmt, int(n)).astype(np.float64)
            need = self.frame * self.n_frames
            pcm = np.pad(pcm, (0, max(0, need - len(pcm))))[:need]
            frames = pcm.reshape(self.n_frames, self.frame)
            rms = np.sqrt((frames**2).mean(axis=1))
            zcr = (np.diff(np.signbit(frames), axis=1) != 0).mean(axis=1)
            feats.append(np.concatenate([rms, zcr]).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Actor-pool stage: video binary column -> k sampled frames as
    encoded images. DECODE IS A STUB (NotImplementedError without
    ``allow_fake=True``, which synthesizes deterministic frames)."""

    def __init__(self, k: int = 4, out_fmt: str = "png", allow_fake: bool = False):
        self.k = k
        self.out_fmt = out_fmt
        self.allow_fake = allow_fake

    def _decode_frame(self, media_id: str, idx: int, w: int, h: int) -> np.ndarray:
        if not self.allow_fake:
            raise NotImplementedError(
                "video decoding is stubbed in this environment (no video "
                "libraries); pass allow_fake=True for deterministic fake frames"
            )
        base = (zlib.crc32(media_id.encode()) + idx * 31) % 256
        y, x = np.mgrid[0:h, 0:w]
        return ((x + y * 2 + base) % 256).astype(np.uint8)[..., None].repeat(3, axis=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, nf, w, h in zip(
            batch["media_id"].to_pylist(),
            batch["n_frames"].to_pylist(),
            batch["w"].to_pylist(),
            batch["h"].to_pylist(),
        ):
            step = max(1, int(nf) // self.k)
            for j in range(0, min(int(nf), self.k * step), step):
                ids.append(mid)
                fidx.append(j)
                frames.append(
                    codecs.encode(self._decode_frame(mid, j, int(w), int(h)), self.out_fmt)
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


class PatchStage:
    """Actor-pool stage: decode -> split into an aligned grid of
    (ph x pw) patches -> re-encode each patch (1 row -> k rows; the
    ViT-style patch-extraction flat-map). Fully real: every patch is
    a fresh encode of the cropped pixels."""

    def __init__(self, ph: int = 64, pw: int = 64, out_fmt: str = "png"):
        self.ph, self.pw, self.out_fmt = ph, pw, out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, prs, pcs, blobs = [], [], [], []
        for idx, blob, fmt in zip(batch["idx"].to_pylist(),
                                  batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist()):
            img = codecs.decode(blob, fmt)
            H, W = img.shape[:2]
            for r in range(H // self.ph):
                for c in range(W // self.pw):
                    patch = img[r * self.ph:(r + 1) * self.ph,
                                c * self.pw:(c + 1) * self.pw]
                    idxs.append(idx)
                    prs.append(r)
                    pcs.append(c)
                    blobs.append(codecs.encode(patch, self.out_fmt))
        n = len(idxs)
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "pr": pa.array(prs, pa.int64()),
            "pc": pa.array(pcs, pa.int64()),
            "bytes": pa.array(blobs, pa.binary()),
            "fmt": pa.array([self.out_fmt] * n, pa.string()),
            "w": pa.array([self.pw] * n, pa.int32()),
            "h": pa.array([self.ph] * n, pa.int32())})


def hist_equalize(img: np.ndarray) -> np.ndarray:
    """Per-channel histogram equalization with the standard
    cdf-remap LUT, floor arithmetic only (lut(v) = (cdf(v)-cdf_min)
    * 255 // (N-cdf_min)) so outputs are integer-exact and SQL-
    replayable; a single-valued channel is left unchanged (the
    denominator would be 0)."""
    out = np.empty_like(img)
    n = img.shape[0] * img.shape[1]
    for c in range(img.shape[2]):
        ch = img[..., c]
        hist = np.bincount(ch.ravel(), minlength=256)
        cdf = hist.cumsum()
        cdf_min = int(cdf[np.flatnonzero(hist)[0]])
        denom = n - cdf_min
        if denom == 0:
            out[..., c] = ch
        else:
            lut = (np.maximum(cdf - cdf_min, 0) * 255 // denom).astype(np.uint8)
            out[..., c] = lut[ch]
    return out


class HistEqStage:
    """Actor-pool stage: decode -> per-channel histogram equalization
    -> re-encode (the photometric-normalization step of an image
    training pipeline). Fully real pixel work; stateless beyond the
    codec, so __init__ is trivial and the pool scales by CPU."""

    def __init__(self, out_fmt: str = "png"):
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for blob, fmt in zip(batch["bytes"].to_pylist(), batch["fmt"].to_pylist()):
            out.append(codecs.encode(hist_equalize(codecs.decode(blob, fmt)),
                                     self.out_fmt))
        t = pa.table({"image_id": batch["image_id"],
                      "bytes": pa.array(out, pa.binary()),
                      "fmt": pa.array([self.out_fmt] * len(out), pa.string())})
        for name in batch.column_names:
            if name not in t.column_names:
                t = t.append_column(name, batch[name])
        return t


class IntegralRectStage:
    """Actor-pool stage: decode -> integral image (summed-area table,
    one cumsum pass over all channels) -> O(1) box sums for a fixed
    rect list (the Viola-Jones / box-feature primitive). Emits one
    (idx, rid, rect_sum) row per image x rect; rects are closed-open
    [x0,x1) x [y0,y1) pixel boxes shared by every image (broadcast
    with the actor, not per batch)."""

    def __init__(self, rects: tuple[tuple[int, int, int, int], ...]):
        self.rects = tuple(rects)

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, rids, sums = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt).astype(np.int64).sum(axis=2)
            sat = np.zeros((img.shape[0] + 1, img.shape[1] + 1), np.int64)
            np.cumsum(np.cumsum(img, axis=0), axis=1, out=sat[1:, 1:])
            for rid, (x0, y0, x1, y1) in enumerate(self.rects):
                s = int(sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0])
                idxs.append(idx)
                rids.append(rid)
                sums.append(s)
        return pa.table({"idx": pa.array(idxs, pa.int64()),
                         "rid": pa.array(rids, pa.int64()),
                         "rect_sum": pa.array(sums, pa.int64())})


class RleMaskStage:
    """Actor-pool stage: decode -> threshold to binary mask -> COCO
    column-major RLE (raster.rle_encode) -> integer RLE observables
    (fg run count, fg area, leading-background length) plus an
    in-stage decode roundtrip check. The wire point of RLE at scale:
    a label mask travels as O(#boundary) ints, never H*W pixels."""

    def __init__(self, threshold: int = 128):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import rle_decode, rle_encode

        idxs, n_fg, area, first, ok = [], [], [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            mask = (img[:, :, 0] >= self.threshold).astype(np.uint8) * 255
            runs = rle_encode(mask)
            rt = rle_decode(runs, mask.shape[0], mask.shape[1])
            idxs.append(idx)
            n_fg.append(len(runs) // 2)
            area.append(int(runs[1::2].sum()))
            first.append(int(runs[0]) if len(runs) else 0)
            ok.append(bool((rt == mask).all()))
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "n_fg_runs": pa.array(n_fg, pa.int64()),
            "fg_area": pa.array(area, pa.int64()),
            "first_fg": pa.array(first, pa.int64()),
            "roundtrip_ok": pa.array(ok, pa.bool_())})


class DistanceTransformStage:
    """Actor-pool stage: decode -> block-mean reduce to a coarse
    occupancy grid -> EXACT L1 distance transform
    (raster.l1_distance_transform, the separable two-pass scan) ->
    integer proximity observables (sum and max distance). The coarse
    grid is the scale lever: the proximity raster a 100 TB pipeline
    ships downstream is cells, not pixels."""

    def __init__(self, grid: int = 8, threshold: int = 128, cap: int = 16):
        self.grid = grid
        self.threshold = threshold
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import l1_distance_transform

        idxs, sums, maxs = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            d = l1_distance_transform(coarse >= self.threshold, cap=self.cap)
            idxs.append(idx)
            sums.append(int(d.sum()))
            maxs.append(int(d.max()))
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "dt_sum": pa.array(sums, pa.int64()),
            "dt_max": pa.array(maxs, pa.int64())})


class MarchingSquaresStage:
    """Actor-pool stage: decode -> coarse occupancy grid -> marching
    squares (raster.marching_squares_cases/_segments) -> integer
    contour observables per image (segment count, crossed-cell count,
    case checksum). The raster->vector step of the tiling engine:
    label masks leave as exact integer contour segments, chainable
    into rings by an endpoint hash-join downstream."""

    def __init__(self, grid: int = 8, threshold: int = 128):
        self.grid = grid
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import (marching_squares_cases,
                                   marching_squares_segments)

        idxs, nseg, ncross, csum = [], [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            m = coarse >= self.threshold
            cases = marching_squares_cases(m)
            idxs.append(idx)
            nseg.append(len(marching_squares_segments(m)))
            ncross.append(int((~np.isin(cases, [0, 15])).sum()))
            csum.append(int(cases.astype(np.int64).sum()))
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "n_segments": pa.array(nseg, pa.int64()),
            "n_crossed": pa.array(ncross, pa.int64()),
            "case_sum": pa.array(csum, pa.int64())})


class ContourRingsStage:
    """Actor-pool stage completing the raster -> vector path: decode
    -> coarse grid -> marching-squares segments -> chain into RINGS
    (raster.contour_ring_stats: connected components of the segment
    graph), emitting per image the ring count, vertex count, and the
    min-vertex-per-ring checksum a label-propagation twin replays."""

    def __init__(self, grid: int = 8, threshold: int = 128):
        self.grid = grid
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import contour_ring_stats

        idxs, nr, nv, ck = [], [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            a, b, c = contour_ring_stats(coarse >= self.threshold)
            idxs.append(idx)
            nr.append(a)
            nv.append(b)
            ck.append(c)
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "n_rings": pa.array(nr, pa.int64()),
            "n_vertices": pa.array(nv, pa.int64()),
            "ring_checksum": pa.array(ck, pa.int64())})


class LargestSquareStage:
    """Actor-pool stage: decode -> coarse occupancy grid -> largest
    all-foreground square (raster.largest_square DP) — the free-space
    placement primitive; emits the side and the number of positions
    achieving it."""

    def __init__(self, grid: int = 8, threshold: int = 128):
        self.grid = grid
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import largest_square

        idxs, sides, cnts = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            s, n = largest_square(coarse >= self.threshold)
            idxs.append(idx)
            sides.append(s)
            cnts.append(n)
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "side": pa.array(sides, pa.int64()),
            "n_max": pa.array(cnts, pa.int64())})


def otsu_threshold(values: np.ndarray) -> tuple[int, int, int]:
    """Exact integer Otsu: the threshold t maximizing between-class
    variance over a 0..255 value set, compared as exact rationals —
    sigma_b^2(t) is proportional to (s0*n - S*n0)^2 / (n0*n1), so two
    thresholds compare by integer cross-multiplication, never floats.
    Ties keep the smallest t; returns (t, num^2, den) at the argmax
    ((0, 0, 0) when no threshold separates two non-empty classes).
    Class 0 is v < t. Intended for small per-image value sets (the
    coarse grid), keeping every product within int64."""
    v = np.asarray(values, dtype=np.int64).ravel()
    n = len(v)
    hist = np.bincount(v, minlength=256)
    cn = np.cumsum(hist)
    cs = np.cumsum(hist * np.arange(256, dtype=np.int64))
    s_tot = int(cs[-1])
    best = (0, 0, 0)
    for t in range(1, 256):
        n0 = int(cn[t - 1])
        n1 = n - n0
        if n0 == 0 or n1 == 0:
            continue
        num = int(cs[t - 1]) * n - s_tot * n0
        num2 = num * num
        den = n0 * n1
        if best[2] == 0 or num2 * best[2] > best[1] * den:
            best = (t, num2, den)
    return best


class OtsuStage:
    """Actor-pool stage: decode -> coarse grid -> exact integer Otsu
    threshold (the automatic binarization step ahead of any of the
    mask operators), emitting (t, objective numerator/denominator)."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, ts, nums, dens = [], [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            t, num2, den = otsu_threshold(coarse)
            idxs.append(idx)
            ts.append(t)
            nums.append(num2)
            dens.append(den)
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "otsu_t": pa.array(ts, pa.int64()),
            "obj_num": pa.array(nums, pa.int64()),
            "obj_den": pa.array(dens, pa.int64())})


class GridPathStage:
    """Actor-pool stage: decode -> coarse occupancy grid (foreground
    = obstacle) -> vectorized BFS wavefront
    (raster.bfs_grid_distance), emitting the corner-to-corner free-
    space distance (255 = unreachable) and the reachable-cell count."""

    def __init__(self, grid: int = 8, threshold: int = 128):
        self.grid = grid
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.raster import bfs_grid_distance

        idxs, ds_, nr = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            coarse = resize_block_mean(img, self.grid, self.grid)[:, :, 0]
            dist = bfs_grid_distance(coarse >= self.threshold)
            idxs.append(idx)
            ds_.append(int(dist[self.grid - 1, self.grid - 1]))
            nr.append(int((dist < 255).sum()))
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "dist": pa.array(ds_, pa.int64()),
            "n_reachable": pa.array(nr, pa.int64())})


# template: 2x2 cells of 32 px, bits ((1,0),(0,1)) -> values 200/40 —
# hardcoded so the SQL twin can replay it as literals
TEMPLATE_BITS = ((1, 0), (0, 1))


class TemplateMatchStage:
    """Actor-pool stage: decode -> sliding-window SAD template match
    (the classic block-matching primitive) of a fixed 64x64
    piecewise-constant template at stride-16 offsets over the 256x256
    image, emitting the best offset (min SAD; ties -> smallest oy
    then ox) and its SAD. The per-offset scan is a vectorized
    abs-diff reduction; the template is built once per actor."""

    def __init__(self, stride: int = 16):
        self.stride = stride
        t = np.empty((64, 64), np.int32)
        for v in range(2):
            for u in range(2):
                t[32 * v:32 * v + 32, 32 * u:32 * u + 32] = \
                    40 + 160 * TEMPLATE_BITS[v][u]
        self.template = t

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, oys, oxs, sads = [], [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt).astype(np.int32)
            best = (1 << 62, -1, -1)
            for oy in range(0, 256 - 64 + 1, self.stride):
                for ox in range(0, 256 - 64 + 1, self.stride):
                    win = img[oy:oy + 64, ox:ox + 64]
                    sad = int(np.abs(win - self.template[:, :, None]).sum())
                    if sad < best[0]:
                        best = (sad, oy, ox)
            idxs.append(idx)
            sads.append(best[0])
            oys.append(best[1])
            oxs.append(best[2])
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "oy": pa.array(oys, pa.int64()),
            "ox": pa.array(oxs, pa.int64()),
            "sad": pa.array(sads, pa.int64())})


class SeamStage:
    """Actor-pool stage: decode -> coarse grid -> replicate-border
    gradient energy -> vertical seam DP (the content-aware-resize
    primitive): dp(r,c) = e(r,c) + min of the three predecessors,
    then a backtrack with ties broken toward the smaller column.
    Emits the seam cost and the seam path packed as sum(col_r * 8^r)."""

    def __init__(self, grid: int = 8):
        self.grid = grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.grid
        idxs, costs, paths = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)
            g = resize_block_mean(img, n, n)[:, :, 0].astype(np.int64)
            cp = np.clip(np.arange(n) + 1, 0, n - 1)
            cm = np.clip(np.arange(n) - 1, 0, n - 1)
            e = np.abs(g[:, cp] - g[:, cm]) + np.abs(g[cp, :] - g[cm, :])
            dp = np.empty_like(e)
            dp[0] = e[0]
            big = np.int64(1) << 40
            for r in range(1, n):
                prev = dp[r - 1]
                left = np.concatenate(([big], prev[:-1]))
                right = np.concatenate((prev[1:], [big]))
                dp[r] = e[r] + np.minimum(np.minimum(left, prev), right)
            c = int(np.argmin(dp[n - 1]))  # first min = smallest col
            cost = int(dp[n - 1, c])
            cols = [c]
            for r in range(n - 2, -1, -1):
                lo, hi = max(0, c - 1), min(n - 1, c + 1)
                seg = dp[r, lo:hi + 1]
                c = lo + int(np.argmin(seg))
                cols.append(c)
            cols.reverse()  # cols[r] = seam column at row r
            path = sum(cols[r] * (8 ** r) for r in range(n))
            idxs.append(idx)
            costs.append(cost)
            paths.append(path)
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "seam_cost": pa.array(costs, pa.int64()),
            "seam_path": pa.array(paths, pa.int64())})


class WarpStage:
    """Actor-pool stage: decode -> full-image inverse-mapped affine
    rotation warp (fixed-point cos/sin 3956/1060 over 4096, ~15
    degrees about the image center, nearest-neighbor sampling,
    out-of-bounds -> 0) -> per-image observables: a position-weighted
    checksum over a 16x16 sample lattice of the WARPED image and the
    lattice's out-of-bounds count. Numerators carry a +2^22 bias so
    the floor division matches engines that truncate toward zero."""

    BIAS = 4194304  # 1024 * 4096

    def __call__(self, batch: pa.Table) -> pa.Table:
        ty, tx = np.mgrid[0:256, 0:256]
        xs = ((tx - 128) * 3956 + (ty - 128) * 1060 + self.BIAS) // 4096 \
            - 1024 + 128
        ys = ((ty - 128) * 3956 - (tx - 128) * 1060 + self.BIAS) // 4096 \
            - 1024 + 128
        inb = (xs >= 0) & (xs < 256) & (ys >= 0) & (ys < 256)
        xs_c = np.clip(xs, 0, 255)
        ys_c = np.clip(ys, 0, 255)
        si = (np.arange(16) * 16 + 8)
        wgt = (np.arange(16)[None, :] + 16 * np.arange(16)[:, None] + 1)
        idxs, sums, oobs = [], [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)[:, :, 0].astype(np.int64)
            warped = np.where(inb, img[ys_c, xs_c], 0)
            samp = warped[np.ix_(si, si)]
            idxs.append(idx)
            sums.append(int((samp * wgt).sum()))
            oobs.append(int((~inb[np.ix_(si, si)]).sum()))
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "warp_sum": pa.array(sums, pa.int64()),
            "n_oob": pa.array(oobs, pa.int64())})


class SobelNmsStage:
    """Actor-pool stage: decode -> exact block-mean grid (pixel sums
    // block area; exact when blocks are piecewise constant, a
    documented integer-mean policy otherwise) -> Sobel gx/gy on the
    grid interior -> direction-quantized non-max suppression on the
    squared magnitude (border magnitude 0; non-strict plateau ties
    keep BOTH cells). Emits one row per surviving edge cell:
    (idx, rb, cb, gx, gy, m2). The Canny front half as a dataflow
    stage; channel 0 only."""

    def __init__(self, block_px: int = 32):
        self.block_px = int(block_px)

    def __call__(self, batch: pa.Table) -> pa.Table:
        b = self.block_px
        out_idx, out_rb, out_cb, out_gx, out_gy, out_m2 = \
            [], [], [], [], [], []
        for blob, idx in zip(batch["bytes"].to_pylist(),
                             batch["idx"].to_pylist()):
            img = codecs.png_decode(blob)[:, :, 0].astype(np.int64)
            h, w = img.shape
            gh, gw = h // b, w // b
            bm = (img[:gh * b, :gw * b]
                  .reshape(gh, b, gw, b).sum(axis=(1, 3)) // (b * b))
            gx = np.zeros_like(bm)
            gy = np.zeros_like(bm)
            gx[1:-1, 1:-1] = (bm[:-2, 2:] + 2 * bm[1:-1, 2:] + bm[2:, 2:]
                              - bm[:-2, :-2] - 2 * bm[1:-1, :-2]
                              - bm[2:, :-2])
            gy[1:-1, 1:-1] = (bm[2:, :-2] + 2 * bm[2:, 1:-1] + bm[2:, 2:]
                              - bm[:-2, :-2] - 2 * bm[:-2, 1:-1]
                              - bm[:-2, 2:])
            m2 = gx * gx + gy * gy
            ax, ay = np.abs(gx), np.abs(gy)
            horiz = ax >= 2 * ay
            vert = (~horiz) & (ay >= 2 * ax)
            diag_dr = (~horiz) & (~vert) & (gx * gy > 0)
            dy1 = np.where(horiz, 0, 1)
            dx1 = np.where(horiz, 1,
                           np.where(vert, 0, np.where(diag_dr, 1, -1)))
            rb = np.arange(gh)[:, None]
            cb = np.arange(gw)[None, :]
            r1 = np.clip(rb + dy1, 0, gh - 1)
            c1 = np.clip(cb + dx1, 0, gw - 1)
            r2 = np.clip(rb - dy1, 0, gh - 1)
            c2 = np.clip(cb - dx1, 0, gw - 1)
            keep = (m2 > 0) & (m2 >= m2[r1, c1]) & (m2 >= m2[r2, c2])
            keep[0, :] = keep[-1, :] = False
            keep[:, 0] = keep[:, -1] = False
            wy, wx = np.nonzero(keep)
            out_idx.extend([idx] * len(wy))
            out_rb.extend(wy.tolist())
            out_cb.extend(wx.tolist())
            out_gx.extend(gx[keep].tolist())
            out_gy.extend(gy[keep].tolist())
            out_m2.extend(m2[keep].tolist())
        return pa.table({
            "idx": pa.array(out_idx, pa.int64()),
            "rb": pa.array(out_rb, pa.int64()),
            "cb": pa.array(out_cb, pa.int64()),
            "gx": pa.array(out_gx, pa.int64()),
            "gy": pa.array(out_gy, pa.int64()),
            "m2": pa.array(out_m2, pa.int64())})


_BAYER4 = np.array([[0, 8, 2, 10],
                    [12, 4, 14, 6],
                    [3, 11, 1, 9],
                    [15, 7, 13, 5]], np.int64)


class DitherStage:
    """Actor-pool stage: decode -> 4x4 Bayer ORDERED dithering of the
    gray channel (halftoning — the classic display/print raster op;
    ordered, not error-diffusing, so it is position-independent and
    fully vectorized): pixel white iff v > bayer[y%4, x%4]*16 + 8.
    Emits (idx, n_white). The threshold matrix tiles in __init__
    (state once per actor); __call__ is one broadcasted compare per
    image."""

    def __init__(self, h: int = 256, w: int = 256):
        self.thr = np.tile(_BAYER4 * 16 + 8,
                           (h // 4, w // 4))[:h, :w]

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, nw = [], []
        for blob, fmt, idx in zip(batch["bytes"].to_pylist(),
                                  batch["fmt"].to_pylist(),
                                  batch["idx"].to_pylist()):
            img = codecs.decode(blob, fmt)[:, :, 0].astype(np.int64)
            idxs.append(idx)
            nw.append(int((img > self.thr).sum()))
        return pa.table({"idx": pa.array(idxs, pa.int64()),
                         "n_white": pa.array(nw, pa.int64())})


class AudioPitchStage:
    """Actor-pool stage: audio binary -> integer AMDF pitch estimate
    (average-magnitude-difference pitch tracking, the classic
    autocorrelation-family detector in pure integers): over the first
    ``frame`` samples, amdf(L) = sum |pcm[t+L] - pcm[t]| for lag L in
    [1, max_lag]; the pitch lag is the argmin (ties -> smallest L).
    Real RIFF/PCM16 decode (wav_decode); vectorized — one shifted
    subtraction per lag."""

    def __init__(self, frame: int = 2048, max_lag: int = 128):
        self.frame = frame
        self.max_lag = max_lag

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, lags, mins = [], [], []
        for mid, blob in zip(batch["media_id"].to_pylist(),
                             batch["bytes"].to_pylist()):
            pcm, _rate = wav_decode(blob)
            if pcm.ndim == 2:
                pcm = pcm.mean(axis=1).astype(np.int16)
            x = pcm[:self.frame].astype(np.int64)
            best_l, best_v = 0, None
            for L in range(1, self.max_lag + 1):
                v = int(np.abs(x[L:] - x[:-L]).sum())
                if best_v is None or v < best_v:
                    best_l, best_v = L, v
            ids.append(mid)
            lags.append(best_l)
            mins.append(int(best_v))
        return pa.table({"media_id": pa.array(ids, pa.string()),
                         "pitch_lag": pa.array(lags, pa.int64()),
                         "amdf_min": pa.array(mins, pa.int64())})


def hist_match_metrics(images_ds, n_total: int, num_buckets: int = 8):
    """Histogram matching (specification) — the photometric
    normalization primitive: each image's gray histogram maps onto
    its REFERENCE image's histogram (ref = idx+1 mod n_total) by the
    classic inverse-CDF rule g' = min{g : CDF_ref(g) >= CDF_src(g)}.
    Distributed shape: decode ONCE into nonzero-bin histogram ROWS
    (idx, g, c) — histograms as first-class data, no image ever
    decoded twice and no broadcast — one grace self-join pairs each
    image's bins with its reference's bins, and a per-image
    map_groups computes the remap vectorized (searchsorted on the
    two CDFs). Emits (idx, remapped_sum) = sum over source pixels of
    their matched gray — the observable a planted two-level fixture
    turns into a closed form."""
    from osmray import codecs
    from osmray.joins import bucketed_join

    def hist_rows(batch: pa.Table) -> pa.Table:
        out_i, out_g, out_c = [], [], []
        for blob, idx in zip(batch["bytes"].to_pylist(),
                             batch["idx"].to_pylist()):
            img = codecs.decode(blob, "png")
            h = np.bincount(img[:, :, 0].reshape(-1), minlength=256)
            nz = np.flatnonzero(h)
            out_i.extend([int(idx)] * len(nz))
            out_g.extend(nz.tolist())
            out_c.extend(h[nz].tolist())
        return pa.table({"idx": pa.array(out_i, pa.int64()),
                         "g": pa.array(out_g, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    hists = images_ds.map_batches(
        hist_rows, batch_format="pyarrow").materialize()
    refs = hists.map_batches(
        lambda t: pa.table({
            "ridx": pa.array((t["idx"].to_numpy(zero_copy_only=False)
                              - 1) % n_total),
            "g_r": t["g"], "c_r": t["c"]}),
        batch_format="pyarrow")
    joined = bucketed_join(hists, refs, on="idx", right_on="ridx",
                           num_buckets=num_buckets)

    def remap(g: pa.Table) -> pa.Table:
        idx = int(g["idx"][0].as_py())
        src = {}
        ref = {}
        for gg, cc, gr, cr in zip(
                g["g"].to_numpy(zero_copy_only=False),
                g["c"].to_numpy(zero_copy_only=False),
                g["g_r"].to_numpy(zero_copy_only=False),
                g["c_r"].to_numpy(zero_copy_only=False)):
            src[int(gg)] = int(cc)
            ref[int(gr)] = int(cr)
        sg = np.asarray(sorted(src), np.int64)
        sc = np.asarray([src[int(x)] for x in sg], np.int64)
        rg = np.asarray(sorted(ref), np.int64)
        rc = np.asarray([ref[int(x)] for x in rg], np.int64)
        # the join replicates rows (src bins x ref bins); the dicts
        # above dedup back to the two true histograms
        cdf_s = np.cumsum(sc)
        cdf_r = np.cumsum(rc)
        # min ref gray whose CDF >= source CDF at each source bin
        pos = np.searchsorted(cdf_r, cdf_s, side="left")
        pos = np.minimum(pos, len(rg) - 1)
        matched = rg[pos]
        total = int((sc * matched).sum())
        return pa.table({"idx": pa.array([idx], pa.int64()),
                         "remapped_sum": pa.array([total], pa.int64())})

    return joined.groupby("idx").map_groups(remap, batch_format="pyarrow")
