import numpy as np
import pyarrow as pa
import pytest

from osmray import codecs, multimodal, synth


def test_qzl_codec_psnr_gate():
    img = synth.image_pixels("img00000042")
    back = codecs.qzl_decode(codecs.qzl_encode(img))
    assert codecs.psnr(img, back) >= 40.0
    assert len(codecs.qzl_encode(img)) < img.nbytes // 4
    # registry path
    assert codecs.decode(codecs.encode(img, "qzl"), "qzl").shape == img.shape


def test_resize_block_mean():
    img = synth.image_pixels("img00000001")
    small = multimodal.resize_block_mean(img, 64, 64)
    assert small.shape == (64, 64, 3)
    # exact block mean for one block
    assert small[0, 0, 0] == round(img[:4, :4, 0].mean())
    odd = multimodal.resize_block_mean(img, 100, 60)
    assert odd.shape == (100, 60, 3)


def test_image_resize_stage(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth.make_images(8))
    out = ds.map_batches(
        multimodal.ImageResizeStage,
        fn_constructor_kwargs={"out_h": 32, "out_w": 32},
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    assert len(out) == 8
    img = codecs.decode(out.iloc[0]["bytes"], out.iloc[0]["fmt"])
    assert img.shape == (32, 32, 3)


def _audio_batch(n=3):
    return pa.table(
        {
            "media_id": pa.array([f"aud{i}" for i in range(n)], pa.string()),
            "bytes": pa.array([b"\x00" * 64] * n, pa.binary()),
            "fmt": pa.array(["wav"] * n, pa.string()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_samples": pa.array([20000] * n, pa.int64()),
        }
    )


def test_audio_stage_stub_and_fake():
    with pytest.raises(NotImplementedError):
        multimodal.AudioFeatureStage()( _audio_batch())
    out = multimodal.AudioFeatureStage(allow_fake=True)(_audio_batch())
    feats = out["features"].to_pylist()
    assert len(feats) == 3 and len(feats[0]) == 32
    # deterministic
    out2 = multimodal.AudioFeatureStage(allow_fake=True)(_audio_batch())
    assert feats == out2["features"].to_pylist()


def test_frame_sample_stage_stub_and_fake():
    batch = pa.table(
        {
            "media_id": pa.array(["vid0"], pa.string()),
            "bytes": pa.array([b"x"], pa.binary()),
            "fmt": pa.array(["mp4"], pa.string()),
            "n_frames": pa.array([100], pa.int32()),
            "fps": pa.array([30.0], pa.float32()),
            "w": pa.array([64], pa.int32()),
            "h": pa.array([48], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        multimodal.FrameSampleStage()(batch)
    out = multimodal.FrameSampleStage(k=4, allow_fake=True)(batch)
    assert out.num_rows == 4
    f = codecs.png_decode(out["frame"][0].as_py())
    assert f.shape == (48, 64, 3)
    assert out["frame_idx"].to_pylist() == [0, 25, 50, 75]


def test_schemas_declared():
    assert "sample_rate" in multimodal.AUDIO_SCHEMA.names
    assert "n_frames" in multimodal.VIDEO_SCHEMA.names


def test_wav_roundtrip_and_real_decode():
    import numpy as np

    from osmray.multimodal import AudioFeatureStage, _fake_pcm, wav_decode, wav_encode

    pcm = _fake_pcm("m1", 5000)
    blob = wav_encode(pcm, 22050)
    out, rate = wav_decode(blob)
    assert rate == 22050
    np.testing.assert_array_equal(out, pcm)
    # stereo mixdown path
    st = np.stack([pcm, -pcm], axis=1)
    out2, _ = wav_decode(wav_encode(st, 8000))
    assert out2.shape == (5000, 2)
    # stage decodes real wav with allow_fake OFF
    import pyarrow as pa

    stage = AudioFeatureStage()
    batch = pa.table(
        {
            "media_id": ["m1"],
            "bytes": [blob],
            "fmt": ["wav"],
            "sample_rate": pa.array([22050], pa.int32()),
            "n_samples": pa.array([5000], pa.int64()),
        }
    )
    feats = stage(batch)["features"][0].as_py()
    assert len(feats) == 32 and any(v > 0 for v in feats)
    # non-wav without allow_fake still raises the documented stub error
    import pytest as _pt

    bad = pa.table(
        {
            "media_id": ["m2"],
            "bytes": [b"fLaC...."],
            "fmt": ["flac"],
            "sample_rate": pa.array([22050], pa.int32()),
            "n_samples": pa.array([100], pa.int64()),
        }
    )
    with _pt.raises(NotImplementedError):
        stage(bad)
    # PCM-only contract: float wav rejected clearly
    import struct

    hdr = wav_encode(pcm[:10], 8000)
    broken = hdr[:20] + struct.pack("<H", 3) + hdr[22:]
    with _pt.raises(NotImplementedError):
        wav_decode(broken)


def test_augment_stage_exact(ray_session):
    import pyarrow as pa

    from osmray import codecs
    from osmray.multimodal import AUGMENT_OPS, AugmentStage, augment_image

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (16, 12, 3), dtype=np.uint8) for _ in range(6)]
    batch = pa.table(
        {
            "image_id": pa.array([f"im{i}" for i in range(6)]),
            "bytes": pa.array([codecs.encode(m, "png") for m in imgs], pa.binary()),
            "fmt": pa.array(["png"] * 6),
        }
    )
    # forced op: exact pixel math
    for op in AUGMENT_OPS:
        out = AugmentStage(op=op)(batch)
        for i in range(6):
            dec = codecs.decode(out["bytes"][i].as_py(), "png")
            np.testing.assert_array_equal(dec, augment_image(imgs[i], op))
            assert out["aug"][i].as_py() == op
    # hash-chosen op is deterministic across calls
    a = AugmentStage()(batch)
    b = AugmentStage()(batch)
    assert a["aug"].to_pylist() == b["aug"].to_pylist()
    assert a["bytes"].to_pylist() == b["bytes"].to_pylist()
    # rot90 swaps dimensions in the emitted schema
    got = {op: None for op in AUGMENT_OPS}
    out = AugmentStage(op="rot90")(batch)
    assert out["w"][0].as_py() == 16 and out["h"][0].as_py() == 12


def test_planted_phash_fixture_exact():
    """The planted-phash fixture (oraclefix.ph_*) is the SQL-oracle
    anchor for the media queries: engine phash must read back the
    planted pattern exactly, and the planted dup/near-dup structure
    must hold."""
    from osmray import codecs, oraclefix

    for i in [0, 1, 2, 3, 5, 64, 511, 1023]:
        img = oraclefix.ph_image(i)
        got = int(np.uint64(np.int64(codecs.phash(img))).astype(np.uint64))
        assert got == oraclefix.ph_pattern(i), i
        pc = bin(oraclefix.ph_pattern(i)).count("1")
        assert 0 < pc < 64
    p = oraclefix.ph_pattern
    for g in (0, 17, 255):
        assert p(4 * g) == p(4 * g + 1)  # exact dup pair
        assert bin(p(4 * g) ^ p(4 * g + 2)).count("1") == 1  # 1-bit neighbor
        assert bin(p(4 * g) ^ p(4 * g + 3)).count("1") <= 4  # ≤4-bit neighbor
    # resize 256->64 preserves the pattern (4x4 means of constant blocks)
    from osmray.multimodal import resize_block_mean

    img = oraclefix.ph_image(7)
    small = resize_block_mean(img, 64, 64)
    got = int(np.uint64(np.int64(codecs.phash(small))).astype(np.uint64))
    assert got == oraclefix.ph_pattern(7)


def test_planted_pcm_features_closed_form():
    """Audio oracle anchor: wav roundtrip of the integer sawtooth and
    the frame RMS/ZCR closed forms used by Q_AUDIO_FEATURES_SQL."""
    import math

    from osmray.multimodal import wav_decode, wav_encode
    from osmray.queries import _planted_pcm

    pcm = _planted_pcm(3, 16384)
    back, rate = wav_decode(wav_encode(pcm, 16000))
    np.testing.assert_array_equal(back, pcm)
    f0 = pcm[:1024].astype(np.int64)
    rms = math.sqrt(int((f0 * f0).sum()) / 1024.0)
    frames = pcm[:16384].astype(np.float64).reshape(16, 1024)
    np.testing.assert_equal(np.sqrt((frames**2).mean(axis=1))[0], rms)


def test_hist_equalize_matches_scalar_reference():
    import numpy as np

    from osmray.multimodal import hist_equalize

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    out = hist_equalize(img)
    for c in range(3):
        ch = img[..., c]
        n = ch.size
        hist = np.bincount(ch.ravel(), minlength=256)
        cdf = hist.cumsum()
        cmin = cdf[np.flatnonzero(hist)[0]]
        for v in np.unique(ch):
            expect = (cdf[v] - cmin) * 255 // (n - cmin)
            assert (out[..., c][ch == v] == expect).all()
    flat = np.full((8, 8, 3), 93, np.uint8)
    assert (hist_equalize(flat) == 93).all()  # degenerate passthrough


def test_integral_rect_stage_matches_direct_sums():
    import numpy as np
    import pyarrow as pa

    from osmray import codecs
    from osmray.multimodal import IntegralRectStage

    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 256, (64, 80, 3)).astype(np.uint8) for _ in range(3)]
    rects = ((0, 0, 80, 64), (5, 7, 33, 50), (79, 63, 80, 64))
    batch = pa.table({
        "image_id": pa.array([f"t{i}" for i in range(3)]),
        "bytes": pa.array([codecs.png_encode(im, level=1) for im in imgs]),
        "fmt": pa.array(["png"] * 3),
        "idx": pa.array(list(range(3)), pa.int64())})
    out = IntegralRectStage(rects=rects)(batch).to_pandas()
    for row in out.itertuples(index=False):
        x0, y0, x1, y1 = rects[row.rid]
        direct = int(imgs[row.idx][y0:y1, x0:x1].astype(np.int64).sum())
        assert row.rect_sum == direct


def test_tile_pyramid_parent_assembles_quadrants():
    import numpy as np

    from osmray import codecs, oraclefix
    from osmray.multimodal import resize_block_mean

    # parent (0,0) of the planted 32x32 tile grid: children 0,1,32,33
    canvas = np.zeros((256, 256, 3), np.uint8)
    for idx in (0, 1, 32, 33):
        img = oraclefix.ph_image(idx)
        qx, qy = (idx % 32) % 2, (idx // 32) % 2
        canvas[qy * 128:(qy + 1) * 128,
               qx * 128:(qx + 1) * 128] = resize_block_mean(img, 128, 128)
    # 2x2 block-mean of constant 32px cells is exact: quadrant sums
    # are exactly the child sums / 4, and the png roundtrip is lossless
    expect = sum(int(oraclefix.ph_image(i).astype(np.int64).sum())
                 for i in (0, 1, 32, 33)) // 4
    blob = codecs.png_encode(canvas, level=1)
    assert int(codecs.png_decode(blob).astype(np.int64).sum()) == expect


def test_rle_roundtrip_and_observables():
    import numpy as np

    from osmray.raster import rle_decode, rle_encode

    rng = np.random.RandomState(5)
    for _ in range(100):
        h, w = rng.randint(1, 24), rng.randint(1, 24)
        m = (rng.rand(h, w) < rng.rand()).astype(np.uint8) * 255
        runs = rle_encode(m)
        assert (rle_decode(runs, h, w) == m).all()
        assert int(runs.sum()) == h * w
        assert int(runs[1::2].sum()) == int((m > 0).sum())
        assert (runs[1:] > 0).all()  # only a leading 0 is allowed
    # all-background and all-foreground edges
    z = np.zeros((4, 6), np.uint8)
    assert list(rle_encode(z)) == [24]
    f = np.full((4, 6), 255, np.uint8)
    assert list(rle_encode(f)) == [0, 24]
    assert (rle_decode(rle_encode(f), 4, 6) == f).all()


def test_l1_distance_transform_exact_vs_brute():
    import numpy as np

    from osmray.raster import l1_distance_transform

    rng = np.random.RandomState(9)
    for _ in range(50):
        h, w = rng.randint(1, 14), rng.randint(1, 14)
        m = rng.rand(h, w) < 0.15
        d = l1_distance_transform(m, cap=99)
        fg = np.argwhere(m)
        for r in range(h):
            for c in range(w):
                brute = (99 if len(fg) == 0
                         else int(np.abs(fg - [r, c]).sum(1).min()))
                assert d[r, c] == brute


def test_marching_squares_contours_close_and_separate():
    import numpy as np
    from collections import Counter

    from osmray.raster import marching_squares_cases, marching_squares_segments

    rng = np.random.RandomState(21)
    for _ in range(60):
        h, w = rng.randint(2, 12), rng.randint(2, 12)
        m = rng.rand(h, w) < rng.rand()
        segs = marching_squares_segments(m)
        cases = marching_squares_cases(m)
        # count matches the case table (saddles contribute 2)
        want = int(np.isin(cases, [5, 10]).sum()) * 2 + int(
            (~np.isin(cases, [0, 5, 10, 15])).sum())
        assert len(segs) == want
        # interior vertices chain into loops: every edge-midpoint
        # vertex strictly inside the cell grid has even degree
        deg = Counter()
        for r0, c0, r1, c1 in segs:
            deg[(r0, c0)] += 1
            deg[(r1, c1)] += 1
        hc, wc = h - 1, w - 1
        for (r, c), n in deg.items():
            if 0 < r < 2 * hc and 0 < c < 2 * wc:
                assert n % 2 == 0, ((r, c), n)


def test_contour_ring_stats_counts_separate_loops():
    import numpy as np

    from osmray.raster import contour_ring_stats

    m = np.zeros((8, 8), bool)
    m[1:3, 1:3] = True   # one blob -> one ring
    assert contour_ring_stats(m)[0] == 1
    m[5:7, 4:7] = True   # second disjoint blob -> two rings
    assert contour_ring_stats(m)[0] == 2
    # a blob with a hole (not touching the border: marching squares
    # only sees interior 2x2 cells) -> outer + inner ring
    h = np.zeros((9, 9), bool)
    h[1:8, 1:8] = True
    h[4, 4] = False
    n_rings, n_vertices, ck = contour_ring_stats(h)
    assert n_rings == 2
    # an all-true grid has no interior transitions -> no rings
    assert contour_ring_stats(np.ones((7, 7), bool))[0] == 0
    assert contour_ring_stats(np.zeros((4, 4), bool)) == (0, 0, 0)


def test_largest_square_matches_brute():
    import numpy as np

    from osmray.raster import largest_square

    rng = np.random.RandomState(4)
    for _ in range(40):
        h, w = rng.randint(1, 11), rng.randint(1, 11)
        m = rng.rand(h, w) < 0.7
        best, n = 0, 0
        for s in range(1, min(h, w) + 1):
            for r in range(h - s + 1):
                for c in range(w - s + 1):
                    if m[r:r + s, c:c + s].all():
                        if s > best:
                            best, n = s, 0
                        if s == best:
                            n += 1
        assert largest_square(m) == (best, n)
    assert largest_square(np.zeros((5, 5), bool)) == (0, 0)


def test_otsu_exact_rational_argmax():
    import numpy as np

    from osmray.multimodal import otsu_threshold

    v = np.array([40] * 40 + [200] * 24)
    assert otsu_threshold(v) == (41, 25600 * 40 * 40 * 24 * 24, 40 * 24)
    assert otsu_threshold(np.full(64, 7)) == (0, 0, 0)
    rng = np.random.RandomState(1)
    for _ in range(30):
        v = rng.randint(0, 256, 64)
        t, num2, den = otsu_threshold(v)
        n, s_tot = len(v), v.sum()

        def obj(u):
            n0 = int((v < u).sum())
            n1 = n - n0
            if n0 == 0 or n1 == 0:
                return -1.0
            s0 = int(v[v < u].sum())
            return (s0 * n - s_tot * n0) ** 2 / (n0 * n1)

        assert abs(obj(t) - max(obj(u) for u in range(1, 256))) < 1e-9


def test_bfs_grid_distance_walls_and_sentinels():
    import numpy as np

    from osmray.raster import bfs_grid_distance

    m = np.zeros((8, 8), bool)
    d = bfs_grid_distance(m)
    assert d[7, 7] == 14 and (d < 255).sum() == 64
    m[1, 1:] = True  # wall with a gap at col 0: detour-free L1 path
    d = bfs_grid_distance(m)
    assert d[7, 7] == 14 and (d < 255).sum() == 64 - 7
    m2 = np.zeros((8, 8), bool)
    m2[:, 4] = True  # full wall: right half unreachable
    d2 = bfs_grid_distance(m2)
    assert d2[7, 7] == 255 and (d2 < 255).sum() == 32
    m3 = np.zeros((8, 8), bool)
    m3[0, 0] = True  # blocked start
    assert (bfs_grid_distance(m3) == 255).all()


def test_dict_count_matches_brute():
    import numpy as np

    from osmray.text import dict_count

    rng = np.random.RandomState(0)
    vocab = ["key", "table", "spark", "merge", "scan", "a"]
    for _ in range(15):
        docs = [" ".join(rng.choice(vocab, rng.randint(0, 30)))
                for _ in range(20)]
        pats = ["table", "spark", "merge scan", "e t"]
        nm, nd = dict_count(docs, pats)
        for i, p in enumerate(pats):
            want = sum(sum(1 for j in range(len(dd) - len(p) + 1)
                           if dd[j:j + len(p)] == p) for dd in docs)
            assert nm[i] == want
            assert nd[i] == sum(1 for dd in docs if p in dd)
    nm, nd = dict_count([], ["x"])
    assert list(nm) == [0] and list(nd) == [0]


def test_template_match_stage_vs_brute(ray_session):
    import numpy as np
    import pyarrow as pa

    from osmray import codecs, oraclefix
    from osmray.multimodal import TemplateMatchStage

    ds = oraclefix.load_phash()
    rows = ds.take(8)
    stage = TemplateMatchStage()
    out = stage(pa.Table.from_pylist(
        [{k: r[k] for k in ("image_id", "bytes", "fmt", "idx")} for r in rows]))
    for k in range(8):
        img = codecs.decode(rows[k]["bytes"], rows[k]["fmt"]).astype(np.int64)
        best = None
        for oy in range(0, 193, 16):
            for ox in range(0, 193, 16):
                sad = int(np.abs(img[oy:oy + 64, ox:ox + 64]
                                 - stage.template[:, :, None]).sum())
                if best is None or sad < best[0]:
                    best = (sad, oy, ox)
        assert (out["sad"][k].as_py(), out["oy"][k].as_py(),
                out["ox"][k].as_py()) == best


def test_seam_stage_vs_scalar_dp(ray_session):
    import numpy as np
    import pyarrow as pa

    from osmray import codecs, oraclefix
    from osmray.multimodal import SeamStage, resize_block_mean

    ds = oraclefix.load_phash()
    rows = ds.take(6)
    out = SeamStage()(pa.Table.from_pylist(
        [{k: r[k] for k in ("image_id", "bytes", "fmt", "idx")} for r in rows]))
    for k in range(6):
        img = codecs.decode(rows[k]["bytes"], rows[k]["fmt"])
        g = resize_block_mean(img, 8, 8)[:, :, 0].astype(int)
        e = [[abs(g[r][min(c + 1, 7)] - g[r][max(c - 1, 0)])
              + abs(g[min(r + 1, 7)][c] - g[max(r - 1, 0)][c])
              for c in range(8)] for r in range(8)]
        dp = [e[0][:]]
        for r in range(1, 8):
            dp.append([e[r][c] + min(dp[r - 1][max(0, c - 1):c + 2])
                       for c in range(8)])
        cost = min(dp[7])
        c = dp[7].index(cost)
        cols = [c]
        for r in range(6, -1, -1):
            lo = max(0, c - 1)
            seg = dp[r][lo:c + 2]
            c = lo + seg.index(min(seg))
            cols.append(c)
        cols.reverse()
        assert out["seam_cost"][k].as_py() == cost
        assert out["seam_path"][k].as_py() == sum(
            cols[r] * 8 ** r for r in range(8))


def test_dither_stage_brute(ray_session):
    """DitherStage equals a brute per-pixel ordered dither."""
    import numpy as np
    import pyarrow as pa

    from osmray import codecs
    from osmray.multimodal import _BAYER4, DitherStage

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (256, 256, 3)).astype(np.uint8)
    img[:, :, 1] = img[:, :, 0]
    img[:, :, 2] = img[:, :, 0]
    blob = codecs.png_encode(img, level=1)
    batch = pa.table({"bytes": pa.array([blob], pa.binary()),
                      "fmt": pa.array(["png"]),
                      "idx": pa.array([7], pa.int64())})
    got = DitherStage()(batch).to_pandas()
    brute = 0
    for y in range(256):
        for x in range(256):
            if img[y, x, 0] > _BAYER4[y % 4, x % 4] * 16 + 8:
                brute += 1
    assert got.iloc[0].idx == 7 and got.iloc[0].n_white == brute
