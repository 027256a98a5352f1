"""Property-based conformance (hypothesis): random inputs, engine ==
scalar oracle — SURVEY §5's property tier."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osmray import oracle, raster, tilemath
from osmray.tilemath import MAXAR, PLAIN


lat_st = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
lng_st = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lng=lng_st, z=st.integers(min_value=0, max_value=22),
       maxar=st.booleans())
def test_tile_assignment_matches_oracle(lat, lng, z, maxar):
    scheme = MAXAR if maxar else PLAIN
    tx, ty, rx, ry = tilemath.tile_at_wgs(np.array([lat]), np.array([lng]), z, scheme)
    otx, oty, orx, ory = oracle.tile_at_wgs(lat, lng, z, scheme.offsetx, scheme.offsety)
    assert (int(tx[0]), int(ty[0])) == (otx, oty)
    # rx/ry are the fractional part of a ~2^z*256-magnitude web pixel
    # coordinate, so engine-vs-oracle float noise scales with the ulp
    # at that magnitude (vectorized np vs scalar math evaluate log/tan
    # in different orders) — a fixed 1e-6 flakes near the poles at
    # high z (hypothesis found 1.07e-6 at lat 88.09, z=18)
    tol = max(1e-6, 4096 * np.spacing((1 << z) * 256.0))
    assert abs(rx[0] - orx) < tol and abs(ry[0] - ory) < tol
    for edge in (16, 24):
        assert bool(tilemath.edge_ok(rx, ry, edge)[0]) == oracle.edge_ok(orx, ory, edge)


@settings(max_examples=150, deadline=None)
@given(x0=st.integers(-40, 40), y0=st.integers(-40, 40),
       x1=st.integers(-40, 40), y1=st.integers(-40, 40))
def test_line_walk_matches_oracle(x0, y0, x1, y1):
    xs, ys = raster.line4_pixels(x0, y0, x1, y1)
    # 4-connected, complete, endpoint-inclusive
    assert len(xs) == abs(x1 - x0) + abs(y1 - y0) + 1
    assert (xs[0], ys[0]) == (x0, y0) and (xs[-1], ys[-1]) == (x1, y1)
    if len(xs) > 1:
        assert (np.abs(np.diff(xs)) + np.abs(np.diff(ys)) == 1).all()
    # oracle parity on a shifted canvas
    ox, oy = min(x0, x1), min(y0, y1)
    w, h = max(x0, x1) - ox + 1, max(y0, y1) - oy + 1
    got = np.zeros((h, w), dtype=np.uint8)
    raster.stamp(got, xs - ox, ys - oy, 1)
    ref = [[0] * w for _ in range(h)]
    oracle.draw_line4(ref, x0 - ox, y0 - oy, x1 - ox, y1 - oy, 1)
    np.testing.assert_array_equal(got, np.asarray(ref, dtype=np.uint8))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=3, max_size=8))
def test_fill_matches_oracle(pts):
    got = np.zeros((31, 31), dtype=np.uint8)
    raster.fill_poly(got, np.array(pts, dtype=float))
    ref = [[0] * 31 for _ in range(31)]
    oracle.fill_poly(ref, pts)
    np.testing.assert_array_equal(got, np.asarray(ref, dtype=np.uint8))


@settings(max_examples=100, deadline=None)
@given(lat=lat_st, lng=lng_st, res=st.integers(0, 24))
def test_cell_hierarchy_properties(lat, lng, res):
    from osmray import cells

    c = int(cells.cell_at(np.array([lat]), np.array([lng]), res)[0])
    if res > 0:
        p = int(cells.parent(np.array([c]))[0])
        kids = cells.children(p)
        assert c in set(kids.tolist())
        # the point's cell at res-1 IS the parent
        assert p == int(cells.cell_at(np.array([lat]), np.array([lng]), res - 1)[0])
    kr = cells.k_ring(c, 1)
    assert c in set(kr.tolist())
    assert len(kr) <= 9


@settings(max_examples=50, deadline=None)
@given(st.integers(0, 2**25), st.integers(1, 1 << 20))
def test_hash_sampling_deterministic_and_uniformish(seed, n):
    from osmray.stages import hash64

    keys = np.arange(min(n, 4096), dtype=np.int64)
    h1 = hash64(keys, seed)
    h2 = hash64(keys, seed)
    np.testing.assert_array_equal(h1, h2)
    assert len(np.unique(h1)) == len(keys)  # injective on small ranges


text_st = st.text(
    alphabet=st.sampled_from("abcdefghij XYZ_09.,!"), min_size=0, max_size=200
)


@settings(max_examples=100, deadline=None)
@given(texts=st.lists(text_st, min_size=0, max_size=8))
def test_text_hash_batch_kernels_equal_scalar(texts):
    from osmray import dedup, text

    # fingerprint: batch == per-item
    fb = text.rolling_fingerprint(texts)
    for i, t in enumerate(texts):
        assert fb[i] == text.rolling_fingerprint([t])[0]
    # simhash: batch == scalar
    sb = dedup.simhash64_batch(texts)
    for i, t in enumerate(texts):
        assert int(sb[i]) == int(dedup.simhash64(t))
        assert 0 <= int(sb[i]) < (1 << 62)
    # minhash: batch == scalar, values inside the prime field
    mb = dedup.minhash_signatures(texts)
    for i, t in enumerate(texts):
        si = dedup.minhash_signature(t)
        assert (mb[i] == si).all()
        assert (si >= 0).all() and (si < dedup.HASH_MOD).all()
    bands = dedup.minhash_bands_batch(mb) if len(texts) else None
    for i, t in enumerate(texts):
        assert (bands[i] == dedup.minhash_bands(mb[i])).all()


@settings(max_examples=100, deadline=None)
@given(a=text_st, b=text_st)
def test_jaccard_properties(a, b):
    from osmray import dedup

    j = dedup.ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == dedup.ngram_jaccard(b, a)  # symmetric
    assert dedup.ngram_jaccard(a, a) == 1.0


@settings(max_examples=60, deadline=None)
@given(x=st.lists(st.integers(0, (1 << 62) - 1), min_size=1, max_size=32))
def test_popcount_matches_python(x):
    from osmray.dedup import _popcount64

    arr = np.asarray(x, dtype=np.int64)
    got = _popcount64(arr)
    want = [bin(v).count("1") for v in x]
    assert got.tolist() == want


def _lev_dp(a: str, b: str) -> int:
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j]
        for i, ca in enumerate(a, 1):
            cur.append(min(prev[i] + 1, cur[-1] + 1,
                           prev[i - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_ascii_st = st.text(alphabet=st.characters(min_codepoint=97,
                                           max_codepoint=104),
                    min_size=1, max_size=9)


@settings(max_examples=150, deadline=None)
@given(a=_ascii_st, b=_ascii_st)
def test_edit1_verify_matches_dp(a, b):
    from osmray.simjoin import edit1_verify

    got = bool(edit1_verify([a], [b])[0])
    assert got == (_lev_dp(a, b) == 1)


@settings(max_examples=80, deadline=None)
@given(pts=st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                    min_size=1, max_size=60))
def test_hull_contains_all_points(pts):
    from osmray.geom import hull_area2, monotone_chain_hull

    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    ring = monotone_chain_hull(xs, ys)
    if len(ring) < 3:
        assert hull_area2(ring) == 0
        return
    m = len(ring)
    for i in range(m):
        ox, oy = ring[i]
        ax, ay = ring[(i + 1) % m]
        cr = (ax - ox) * (ys - oy) - (ay - oy) * (xs - ox)
        assert (cr >= 0).all()


@settings(max_examples=60, deadline=None)
@given(text=st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=400))
def test_cdc_chunks_partition_invariant(text):
    """CDC chunks partition the text exactly: concat == text, no
    empty chunks, and every chunk boundary is content-defined (the
    same text always re-chunks identically)."""
    from osmray.dedup import _cdc_chunks

    chunks = _cdc_chunks(text)
    assert "".join(chunks) == text
    assert all(chunks) or text == ""
    assert chunks == _cdc_chunks(text)


@settings(max_examples=40, deadline=None)
@given(words=st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=4, max_size=60))
def test_winnow_window_guarantee(words):
    """Robust winnowing guarantee: every window of 4 consecutive
    3-gram hashes contains at least one selected fingerprint."""
    import numpy as np
    import pyarrow as pa

    from osmray.queries import _CF_MOD, _char_fold_hash

    B = 524287
    hws = _char_fold_hash(np.asarray(words, dtype=object))
    if len(hws) < 3:
        return
    h = ((hws[:-2] * B + hws[1:-1]) % _CF_MOD * B + hws[2:]) % _CF_MOD
    # replicate the kernel's selection on one doc
    from numpy.lib.stride_tricks import sliding_window_view
    w = 4
    if len(h) < w:
        pos = np.array([len(h) - 1 - int(np.argmin(h[::-1]))])
    else:
        W = sliding_window_view(h, w)
        pos = np.arange(len(W)) + (w - 1 - np.argmin(W[:, ::-1], axis=1))
    sel = set(pos.tolist())
    if len(h) >= w:
        for s in range(len(h) - w + 1):
            assert sel & set(range(s, s + w))


@settings(max_examples=60, deadline=None)
@given(word=st.text(alphabet="abcdef", min_size=0, max_size=12),
       vocab=st.lists(st.text(alphabet="abcdef", min_size=2, max_size=4),
                      max_size=8))
def test_wordpiece_greedy_partition(word, vocab):
    """Greedy maximal-munch pieces concatenate back to the word and
    each step consumes the longest matching piece."""
    pos, pieces = 0, []
    vs = sorted(set(vocab))
    while pos < len(word):
        step = 1
        for v in vs:
            if len(v) > step and word[pos:pos + len(v)] == v:
                step = len(v)
        pieces.append(word[pos:pos + step])
        pos += step
    assert "".join(pieces) == word
    for p in pieces:
        assert len(p) == 1 or p in vs


@given(st.lists(st.text(alphabet="ab c", min_size=1, max_size=12),
                min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_bpe_merge_scan_equals_symbol_scan(texts):
    """The engine's double-space string-replace merge == the
    symbol-list leftmost non-overlapping scan, on arbitrary small
    corpora (the mechanism equivalence q_bpe_train rests on)."""
    from collections import Counter

    from osmray.text import bpe_apply_merges

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    if not wc:
        return
    # one deterministic merge: most frequent adjacent pair
    pc = Counter()
    for w, n in wc.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += n
    if not pc:
        return
    (lhs, rhs), _ = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
    for w in wc:
        # engine mechanism
        got = bpe_apply_merges(w, [(lhs, rhs)])
        # reference symbol scan
        syms, out, i = list(w), [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert got == len(out), (w, lhs, rhs)


@given(st.integers(0, 10**9))
@settings(max_examples=50, deadline=None)
def test_url_canonicalization_idempotent(k):
    """canon(canon(u)) == canon(u) for the messy-url family — the
    frontier-dedup invariant (a canonical url must map to itself)."""
    from osmray.text import canonicalize_urls

    scheme = "HTTP" if k % 2 == 0 else "https"
    host = f"WWW.Site{k % 7}.COM" if k % 3 == 0 else f"site{k % 7}.com"
    port = ":80" if k % 5 == 0 else (":8443" if k % 5 == 1 else "")
    qs = (f"?b={k % 3}&utm_source=feed&a={k % 4}" if k % 13 < 6
          else f"?a={k % 4}&utm_medium=email&b={k % 3}")
    raw = f"{scheme}://{host}{port}/p/{k % 11}{qs}#sec{k % 5}"
    c1 = canonicalize_urls([raw])
    assert canonicalize_urls(c1) == c1
