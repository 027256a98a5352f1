import numpy as np
import pytest

from osmray import codecs


def _pattern(h=64, w=64, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 3 + y * 5 + c * 7 + seed) % 256 for c in range(3)], axis=2)
    return img.astype(np.uint8)


def test_png_roundtrip_rgb():
    img = _pattern()
    data = codecs.png_encode(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = codecs.png_decode(data)
    np.testing.assert_array_equal(out, img)
    assert codecs.psnr(img, out) == float("inf")


def test_png_roundtrip_gray():
    img = _pattern()[:, :, 0]
    out = codecs.png_decode(codecs.png_encode(img))
    np.testing.assert_array_equal(out, img)


def test_png_decode_all_filters():
    """Decode a PNG using filters 1-4 (as an external encoder would):
    build filtered scanlines by hand, verify unfilter reverses them."""
    import struct
    import zlib

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (16, 8, 3), dtype=np.uint8)
    h, w = 16, 8
    stride = w * 3
    rows = img.reshape(h, stride).astype(np.int32)
    filtered = np.zeros((h, stride + 1), dtype=np.uint8)
    for y in range(h):
        ft = y % 5
        filtered[y, 0] = ft
        prev = rows[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = rows[y, x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filtered[y, x + 1] = (rows[y, x] - pred) % 256

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(filtered.tobytes()))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(codecs.png_decode(data), img)


def test_raw_roundtrip():
    img = _pattern(31, 17)
    np.testing.assert_array_equal(codecs.raw_decode(codecs.raw_encode(img)), img)
    g = img[:, :, 2]
    np.testing.assert_array_equal(codecs.raw_decode(codecs.raw_encode(g)), g)


def test_decode_registry():
    img = _pattern()
    np.testing.assert_array_equal(codecs.decode(codecs.encode(img, "png"), "png"), img)
    with pytest.raises(NotImplementedError):
        codecs.decode(b"\xff\xd8\xff", "jpg")
    with pytest.raises(ValueError):
        codecs.decode(b"xx", "gif")


def test_psnr():
    img = _pattern()
    noisy = img.copy()
    noisy[0, 0, 0] ^= 4
    p = codecs.psnr(img, noisy)
    assert 40 < p < 100
    assert codecs.psnr(img, img) == float("inf")


def test_phash_properties():
    a = _pattern(256, 256, seed=1)
    b = _pattern(256, 256, seed=1)
    c = np.flipud(_pattern(256, 256, seed=77) + 31)
    ha, hb, hc = codecs.phash(a), codecs.phash(b), codecs.phash(c)
    assert ha == hb  # deterministic
    assert codecs.hamming64(np.array([ha]), np.array([hb]))[0] == 0
    assert ha.dtype == np.int64
    # gradient pattern phash differs from a shuffled pattern
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    assert codecs.hamming64(np.array([ha]), np.array([codecs.phash(noise)]))[0] > 0


def test_hamming64():
    a = np.array([0, -1, 0b1011], dtype=np.int64)
    b = np.array([0, 0, 0b0010], dtype=np.int64)
    np.testing.assert_array_equal(codecs.hamming64(a, b), [0, 64, 2])


def test_decode_roundtrip_resilient_to_corrupt_rows():
    import pyarrow as pa

    from osmray import synth
    from osmray.stages import decode_roundtrip

    t = synth.make_images(4)
    blobs = t["bytes"].to_pylist()
    blobs[2] = b"\x89PNG\r\n\x1a\nGARBAGE"  # corrupt
    t = t.set_column(t.schema.get_field_index("bytes"), "bytes", pa.array(blobs, pa.binary()))
    out = decode_roundtrip(t)
    ok = out["decode_ok"].to_pylist()
    assert ok == [True, True, False, True]
    assert out["bytes"][2].as_py() == blobs[2]  # original kept for quarantine
    assert not out["psnr_ok"][2].as_py()
    import pytest as _pt

    with _pt.raises(Exception):
        decode_roundtrip(t, strict=True)
