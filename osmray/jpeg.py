"""From-scratch baseline JPEG (ITU-T T.81) codec in pure numpy.

The reference's tiles ARE 256x256 JPEGs — it shells out to
``cv2.imread``/``imwrite`` (lib/layers.py:13,196,227). No image
library exists in this environment, so this module implements the
baseline sequential DCT process directly:

- encoder: JFIF, 8-bit, 4:4:4 (no chroma subsampling — keeps the
  input_hint's PSNR >= 40 dB gate comfortably at quality ~90),
  standard Annex K quantization tables scaled by the libjpeg quality
  formula, standard Annex K Huffman tables, vectorized DCT/quant
  (one einsum over all blocks), vectorized bit-packing;
- decoder: baseline sequential only (SOF0), any sampling factors in
  {1,2} (so externally-produced 4:2:0 files decode too), arbitrary
  DHT/DQT tables, restart markers, fast Huffman decode via a 16-bit
  peek lookup table built per DHT.

Not supported (raises): progressive (SOF2), arithmetic coding,
12-bit, >2x sampling factors.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 quantization tables (luminance, chrominance)
QL_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QC_BASE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16] counts, values)
DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_L_VALS = list(range(12))
DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_VALS = list(range(12))
AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

_DCT = None


def _dct_matrix() -> np.ndarray:
    global _DCT
    if _DCT is None:
        k = np.arange(8)
        _DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
        _DCT[0] /= np.sqrt(2.0)
    return _DCT


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    ql = np.clip((QL_BASE * scale + 50) // 100, 1, 255)
    qc = np.clip((QC_BASE * scale + 50) // 100, 1, 255)
    return ql, qc


def _huff_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman (T.81 C.2): value -> (code, length) arrays."""
    code, k = 0, 0
    codes = np.zeros(256, dtype=np.int64)
    lengths = np.zeros(256, dtype=np.int64)
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = code
            lengths[vals[k]] = ln
            code += 1
            k += 1
        code <<= 1
    return codes, lengths


# --- encoder ---------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded-to-8 plane -> (n, 8, 8) blocks in raster order."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


class _BitSink:
    """Collects (value, n_bits) symbols; packs once, vectorized."""

    def __init__(self):
        self.vals: list[int] = []
        self.lens: list[int] = []

    def put(self, value: int, n: int):
        if n:
            self.vals.append(value & ((1 << n) - 1))
            self.lens.append(n)

    def tobytes(self) -> bytes:
        if not self.vals:
            return b""
        v = np.asarray(self.vals, dtype=np.uint64)
        n = np.asarray(self.lens, dtype=np.int64)
        total = int(n.sum())
        # bit offsets of each symbol's MSB
        ends = np.cumsum(n)
        starts = ends - n
        pos = np.arange(total)
        sym = np.searchsorted(ends, pos, side="right")
        bit_in_sym = pos - starts[sym]
        shift = (n[sym] - 1 - bit_in_sym).astype(np.uint64)
        bits = ((v[sym] >> shift) & np.uint64(1)).astype(np.uint8)
        pad = (-total) % 8
        if pad:
            bits = np.concatenate([bits, np.ones(pad, dtype=np.uint8)])  # 1-fill
        by = np.packbits(bits)
        # byte stuffing: 0xFF -> 0xFF 0x00
        ff = np.flatnonzero(by == 0xFF)
        if len(ff):
            by = np.insert(by, ff + 1, 0)
        return by.tobytes()


def jpeg_encode(img: np.ndarray, quality: int = 92) -> bytes:
    """Encode (H, W, 3) RGB or (H, W) grayscale uint8 to baseline
    JFIF bytes (4:4:4, two DQT + four DHT standard tables)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError(f"bad image shape {img.shape}")
    ql, qc = _quant_tables(quality)
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qts = [ql]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [ql, qc, qc]

    ph = -h % 8
    pw = -w % 8
    d = _dct_matrix()
    dc_specs = [(DC_L_BITS, DC_L_VALS), (DC_C_BITS, DC_C_VALS)]
    ac_specs = [(AC_L_BITS, AC_L_VALS), (AC_C_BITS, AC_C_VALS)]
    dc_tabs = [_huff_codes(*s) for s in dc_specs]
    ac_tabs = [_huff_codes(*s) for s in ac_specs]

    sink = _BitSink()
    comp_z = []
    for ci, plane in enumerate(planes):
        p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        blocks = _blocks_of(p)
        coef = np.einsum("ij,njk,lk->nil", d, blocks, d)
        qt = qts[ci].reshape(8, 8).astype(np.float64)
        quant = np.round(coef / qt).astype(np.int64)
        comp_z.append(quant.reshape(-1, 64)[:, ZIGZAG])

    # interleaved MCU order == raster block order for 4:4:4 (every
    # component has the same block grid)
    n_blocks = comp_z[0].shape[0]
    # precompute per-component symbol material
    dc_prev = [0] * len(planes)
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            z = comp_z[ci][bi]
            tid = 0 if ci == 0 else 1
            dcodes, dlens = dc_tabs[tid]
            acodes, alens = ac_tabs[tid]
            diff = int(z[0]) - dc_prev[ci]
            dc_prev[ci] = int(z[0])
            cat = int(diff).bit_length() if diff > 0 else int(-diff).bit_length()
            sink.put(int(dcodes[cat]), int(dlens[cat]))
            if cat:
                sink.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            nz = np.flatnonzero(z[1:]) + 1
            prev = 0
            for idx in nz:
                run = int(idx) - prev - 1
                prev = int(idx)
                while run > 15:
                    sink.put(int(acodes[0xF0]), int(alens[0xF0]))  # ZRL
                    run -= 16
                v = int(z[idx])
                cat = v.bit_length() if v > 0 else (-v).bit_length()
                sym = (run << 4) | cat
                sink.put(int(acodes[sym]), int(alens[sym]))
                sink.put(v if v > 0 else v + (1 << cat) - 1, cat)
            if prev != 63:
                sink.put(int(acodes[0x00]), int(alens[0x00]))  # EOB

    out = [b"\xff\xd8"]  # SOI
    out.append(b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" +
               struct.pack(">HHBB", 1, 1, 0, 0))
    out.append(b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(ql[ZIGZAG].tolist()))
    if not gray:
        out.append(b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(qc[ZIGZAG].tolist()))
    nc = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sof += struct.pack(">BBB", ci + 1, 0x11, 0 if ci == 0 else 1)
    out.append(b"\xff\xc0" + sof)
    specs = [(0x00, DC_L_BITS, DC_L_VALS), (0x10, AC_L_BITS, AC_L_VALS)]
    if not gray:
        specs += [(0x01, DC_C_BITS, DC_C_VALS), (0x11, AC_C_BITS, AC_C_VALS)]
    for tclass, bits, vals in specs:
        payload = bytes([tclass]) + bytes(bits) + bytes(vals)
        out.append(b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload)
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out.append(b"\xff\xda" + sos)
    out.append(sink.tobytes())
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --- decoder ---------------------------------------------------------------


class _HuffLut:
    """16-bit peek lookup: peek -> (value, code length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        sym = np.zeros(1 << 16, dtype=np.int16)
        ln = np.zeros(1 << 16, dtype=np.int8)
        code, k = 0, 0
        for L in range(1, 17):
            for _ in range(bits[L - 1]):
                lo = code << (16 - L)
                hi = lo + (1 << (16 - L))
                sym[lo:hi] = vals[k]
                ln[lo:hi] = L
                code += 1
                k += 1
            code <<= 1
        self.sym = sym
        self.len = ln


class _BitReader:
    """Bit reader over the de-stuffed entropy segment with a
    constant-time 16-bit peek (sliding 4-byte windows)."""

    def __init__(self, data: bytes):
        b = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8).astype(np.uint32)
        self.u32 = (b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]
        self.pos = 0
        self.nbits = 8 * len(data)

    def peek16(self) -> int:
        byte, off = self.pos >> 3, self.pos & 7
        if byte >= len(self.u32):
            return 0
        return (int(self.u32[byte]) >> (16 - off)) & 0xFFFF

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffLut] = {}
    comps = None  # list of (cid, h, v, tq)
    h = w = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[sp + 1 : sp + 65], dtype=np.uint8).astype(np.int64)
                qt[tq] = tbl[UNZIGZAG].reshape(8, 8)
                sp += 65
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 15
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                huff[(tc, th)] = _HuffLut(bits, vals)
                sp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq_ = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq_))
            if any(c[1] > 2 or c[2] > 2 for c in comps):
                raise NotImplementedError("sampling factors > 2 unsupported")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF marker {marker:#x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            pos += seglen
            break
        pos += seglen

    if comps is None or scan is None:
        raise ValueError("truncated JPEG (missing SOF/SOS)")

    # entropy segment: up to the next non-RST marker, with 0xFF00
    # de-stuffed and RSTn markers recorded as bit positions
    end = pos
    chunks = []
    rst_marks = []
    n_destuffed = 0
    i = pos
    while i < len(data) - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                chunks.append(data[end:i + 1])
                n_destuffed += i + 1 - end
                end = i + 2
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                chunks.append(data[end:i])
                n_destuffed += i - end
                rst_marks.append(n_destuffed)
                end = i + 2
                i += 2
                continue
            chunks.append(data[end:i])
            break
        i += 1
    else:
        chunks.append(data[end:])
    stream = b"".join(chunks)
    rdr = _BitReader(stream)
    rst_bitpos = [8 * m for m in rst_marks]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    scan_by_cid = {s[0]: s for s in scan}
    planes = {}
    nblk = {}
    for cid, ch, cv, tq_ in comps:
        bw = mcux * ch
        bh = mcuy * cv
        planes[cid] = np.zeros((bh * bw, 64), dtype=np.int64)
        nblk[cid] = (bw, bh)

    dc_prev = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    rst_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if rst_i < len(rst_bitpos):
                    rdr.pos = rst_bitpos[rst_i]
                    rst_i += 1
                dc_prev = {cid: 0 for cid, *_ in comps}
            for cid, ch, cv, _tq in comps:
                _cs, td, ta = scan_by_cid[cid]
                dlut = huff[(0, td)]
                alut = huff[(1, ta)]
                bw, _bh = nblk[cid]
                for by in range(cv):
                    for bx in range(ch):
                        z = planes[cid][(my * cv + by) * bw + mx * ch + bx]
                        pk = rdr.peek16()
                        cat = int(dlut.sym[pk])
                        rdr.pos += int(dlut.len[pk])
                        diff = _extend(rdr.read(cat), cat) if cat else 0
                        dc_prev[cid] += diff
                        z[0] = dc_prev[cid]
                        k = 1
                        while k < 64:
                            pk = rdr.peek16()
                            rs = int(alut.sym[pk])
                            rdr.pos += int(alut.len[pk])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            z[k] = _extend(rdr.read(s), s)
                            k += 1
            mcu_count += 1

    d = _dct_matrix()
    out_planes = {}
    for cid, ch, cv, tq_ in comps:
        bw, bh = nblk[cid]
        z = planes[cid][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        z *= qt[tq_][None, :, :]
        pix = np.einsum("ji,njk,kl->nil", d, z, d) + 128.0
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution
        if ch < hmax:
            plane = np.repeat(plane, hmax // ch, axis=1)
        if cv < vmax:
            plane = np.repeat(plane, vmax // cv, axis=0)
        out_planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return np.clip(np.round(out_planes[comps[0][0]]), 0, 255).astype(np.uint8)
    y, cb, cr = (out_planes[c[0]] for c in comps)
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
