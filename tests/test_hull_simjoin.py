"""Convex hull kernel properties + similarity-join operators."""

import numpy as np
import pandas as pd

from osmray.geom import hull_area2, monotone_chain_hull


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_hull_properties():
    rng = np.random.default_rng(23)
    for trial in range(30):
        n = int(rng.integers(3, 120))
        x = rng.integers(0, 60, n)
        y = rng.integers(0, 60, n)
        ring = monotone_chain_hull(x, y)
        pts = set(zip(x.tolist(), y.tolist()))
        # hull vertices are input points
        assert all((int(a), int(b)) in pts for a, b in ring)
        if len(ring) < 3:
            assert hull_area2(ring) == 0
            continue
        m = len(ring)
        for i in range(m):
            o, a = ring[i], ring[(i + 1) % m]
            # strictly convex at every vertex (no collinear kept)
            b = ring[(i + 2) % m]
            assert _cross(o, a, b) > 0
            # every input point is left of or on every edge
            for p in pts:
                assert _cross(o, a, p) >= 0
        assert hull_area2(ring) > 0


def test_hull_degenerate():
    ring = monotone_chain_hull(np.array([5]), np.array([7]))
    assert ring.tolist() == [[5, 7]]
    ring = monotone_chain_hull(np.array([1, 1, 1]), np.array([9, 2, 5]))
    assert ring.tolist() == [[1, 2], [1, 9]] and hull_area2(ring) == 0


def _lev(a: str, b: str) -> int:
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


def _rand_strings(rng, n):
    base = ["ring", "widget", "bolt", "gear", "gizmo", "cog"]
    out = set()
    while len(out) < n:
        s = rng.choice(base) + "-" + str(rng.integers(0, 40))
        if rng.random() < 0.4:
            # mutate: substitution / deletion / insertion
            i = int(rng.integers(0, len(s)))
            op = rng.random()
            if op < 0.34:
                s = s[:i] + chr(97 + int(rng.integers(0, 26))) + s[i + 1:]
            elif op < 0.67:
                s = s[:i] + s[i + 1:]
            else:
                s = s[:i] + chr(97 + int(rng.integers(0, 26))) + s[i:]
        if s:
            out.add(s)
    return sorted(out)


def test_edit1_verify_vs_dp():
    from osmray.simjoin import edit1_verify

    rng = np.random.default_rng(31)
    ss = _rand_strings(rng, 60)
    pairs = [(a, b) for a in ss for b in ss if a < b
             and abs(len(a) - len(b)) <= 1]
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = edit1_verify(a, b)
    want = np.array([_lev(x, y) == 1 for x, y in pairs])
    assert (got == want).all()


def test_edit1_join_vs_brute(ray_session):
    import ray.data

    from osmray.simjoin import edit1_join

    rng = np.random.default_rng(37)
    ss = _rand_strings(rng, 120)
    # feed duplicates too: the operator dedups internally
    df = pd.DataFrame({"s": ss + ss[:30]})
    got = edit1_join(ray.data.from_pandas(df).repartition(5)).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = pd.DataFrame(
        [(a, b) for a in ss for b in ss
         if a < b and _lev(a, b) == 1], columns=["a", "b"])
    pd.testing.assert_frame_equal(got, want)


def test_jaccard_join_vs_brute(ray_session):
    import ray.data
    import pyarrow as pa

    from osmray.simjoin import jaccard_join

    rng = np.random.default_rng(41)
    vocab = [f"t{i}" for i in range(50)]
    docs = []
    for i in range(80):
        k = int(rng.integers(3, 12))
        docs.append(sorted(set(rng.choice(vocab, k).tolist())))
        if rng.random() < 0.3:  # planted near-dup of the previous doc
            d = list(docs[-1])
            if len(d) > 3:
                d = d[:-1]
            docs.append(sorted(set(d)))
    ids = np.arange(len(docs), dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids),
                    "toks": pa.array(docs, pa.list_(pa.string()))})
    got = jaccard_join(ray.data.from_arrow(tbl).repartition(4),
                       "doc_id", "toks", t_num=3, t_den=5).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    rows = []
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            si, sj = set(docs[i]), set(docs[j])
            inter = len(si & sj)
            uni = len(si | sj)
            if 5 * inter >= 3 * uni:
                rows.append((i, j, inter, uni))
    want = pd.DataFrame(rows, columns=["a", "b", "inter", "uni"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_containment_join_directional(ray_session):
    """Asymmetric containment: the snippet is reported contained in
    its source, the source is NOT contained in the snippet, and the
    prefix-filter path finds exactly the brute-force pairs."""
    import itertools

    import ray.data

    from osmray.simjoin import containment_join

    docs = {
        1: ["a", "b", "c", "d", "e", "f", "g", "h"],
        2: ["a", "b", "c", "d"],            # contained in 1
        3: ["a", "b", "x", "y"],            # 50% of 3 in 1 — below 0.8
        4: ["p", "q", "r"],                 # disjoint
        5: ["a", "b", "c", "d"],            # duplicate of 2 (mutual)
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "toks": v} for k, v in docs.items()]).repartition(3)
    out = containment_join(ds, "doc_id", "toks", t_num=4, t_den=5)
    got = {(r["a"], r["b"]) for r in out.to_pandas().to_dict("records")}
    brute = set()
    for a, b in itertools.permutations(docs, 2):
        inter = len(set(docs[a]) & set(docs[b]))
        if 5 * inter >= 4 * len(set(docs[a])):
            brute.add((a, b))
    assert got == brute
    assert (2, 1) in got and (1, 2) not in got
    assert (2, 5) in got and (5, 2) in got
