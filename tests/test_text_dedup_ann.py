import numpy as np
import pytest

from osmray import codecs, dedup, text


def test_md5_matches_duckdb():
    import duckdb

    texts = ["hello world", "héllo wörld", "", "a\nb\tc"]
    got = text.md5_hex(texts)
    con = duckdb.connect()
    for t, g in zip(texts, got):
        (want,) = con.execute("select md5(?)", [t]).fetchone()
        assert g == want


def test_token_counts():
    texts = ["a b  c", "", "  ", "one", "x y z w"]
    np.testing.assert_array_equal(text.ws_token_count(texts), [3, 0, 0, 1, 4])
    assert text.bpe_ish_token_count(["don't stop 123!"])[0] == 6  # don ' t stop 123 !


def test_punct_and_quality():
    import pyarrow as pa

    batch = pa.table({"doc_id": [1], "text": ["Hi, there! How are you?"]})
    out = text.quality_stats(batch)
    assert out["n_punct"][0].as_py() == 3
    assert out["n_tokens"][0].as_py() == 5
    assert out["n_chars_actual"][0].as_py() == 23


def test_lang_id_heuristic():
    preds = text.lang_id(
        [
            "the cat and the dog are in the house of the king",
            "der Hund und die Katze sind schön, ich liebe sie",
            "zzzz qqqq",
        ]
    )
    assert preds[0] == "en"
    assert preds[1] == "de"
    assert preds[2] == "und"


def _scalar_fingerprint(s: str) -> int:
    # deliberately naive per-window reference of the documented scheme
    b = s.encode("utf-8")
    w, M = text.FP_WINDOW, text.FP_MOD
    best = None
    for p in range(len(b) - w + 1):
        h1 = h2 = 0
        for c in b[p : p + w]:
            h1 = (h1 * text.FP_B1 + c) % M
            h2 = (h2 * text.FP_B2 + c) % M
        v = h1 * (1 << 31) + h2
        best = v if best is None or v < best else best
    return best


def test_fingerprint_properties():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = "PREFIX " + a  # windows(a) subset of windows(b)
    c = "completely different content with other words entirely"
    fa, fb, fc = text.rolling_fingerprint([a, b, c])
    assert fa == text.rolling_fingerprint([a])[0]  # deterministic
    assert fb <= fa  # min over a SUPERSET of windows can only drop
    assert fa != fc
    # the vectorized batch kernel equals the scalar definition
    assert fa == _scalar_fingerprint(a)
    assert fb == _scalar_fingerprint(b)
    assert fc == _scalar_fingerprint(c)
    # a shared min-window propagates: appending content that hashes
    # higher leaves the fingerprint unchanged
    assert text.rolling_fingerprint([a + " zz"])[0] <= fa
    short = text.rolling_fingerprint(["tiny"])[0]
    assert isinstance(int(short), int)


def test_minhash_jaccard_correlation():
    a = "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    b = "the quick brown fox jumps over the lazy cat and runs far away into the woods"
    c = "unrelated text about databases and distributed systems at scale"
    sa = dedup.minhash_signature(a)
    sb = dedup.minhash_signature(b)
    sc = dedup.minhash_signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    jac_ab = dedup.ngram_jaccard(a, b)
    assert sim_ab > 0.4 and sim_ac < 0.2
    assert 0.3 < jac_ab < 0.95
    assert dedup.ngram_jaccard(a, a) == 1.0
    # banding: near-dups share at least one band, far docs share none
    ba, bb, bc = (dedup.minhash_bands(s) for s in (sa, sb, sc))
    assert (ba == bb).any()
    assert not (ba == bc).any()


def test_simhash_hamming():
    a = dedup.simhash64("the quick brown fox jumps over the lazy dog " * 4)
    b = dedup.simhash64("the quick brown fox jumps over the lazy cat " * 4)
    c = dedup.simhash64("totally different words appear here instead now")
    h_ab = codecs.hamming64(np.array([a]), np.array([b]))[0]
    h_ac = codecs.hamming64(np.array([a]), np.array([c]))[0]
    assert h_ab < h_ac
    assert h_ab <= 16


def test_exact_dedup_ray(ray_session):
    import ray.data

    docs = ray.data.from_items(
        [
            {"doc_id": 3, "text": "same"},
            {"doc_id": 1, "text": "same"},
            {"doc_id": 2, "text": "other"},
        ]
    )
    out = dedup.exact_dedup(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out.set_index("doc_id")["n_dups"].to_dict() == {1: 2, 2: 1}


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data

    base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep woods tonight"
    docs = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("dog", "cat")},
        {"doc_id": 2, "text": "completely different material on another topic entirely with many words"},
        {"doc_id": 3, "text": base},
    ]
    ds = ray.data.from_items(docs)
    cands = dedup.minhash_lsh_candidates(ds)
    lut = {d["doc_id"]: d["text"] for d in docs}
    verified = dedup.verify_pairs(cands, lut, threshold=0.5).to_pandas()
    pairs = set(zip(verified["a"], verified["b"]))
    assert (0, 3) in pairs  # exact dup
    assert (0, 1) in pairs or (1, 3) in pairs  # near dup
    assert not any(2 in p for p in pairs)


def test_cosine_topk_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    mat = rng.standard_normal((200, 16)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(200)]
    )
    queries = mat[:3].astype(np.float64)
    from osmray.ann import cosine_topk

    out = cosine_topk(ds, queries, k=5).to_pandas()
    mn = mat.astype(np.float64)
    mn = mn / np.linalg.norm(mn, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ mn.T
    for q in range(3):
        want = np.argsort(-sims[q], kind="stable")[:5]
        got = out[out["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_lsh_ann_recall(ray_session):
    import ray

    from osmray.ann import LshIndexStage

    # clustered corpus: LSH's honest use case (isotropic gaussians
    # have no neighbor structure for ANY hashing scheme)
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((25, 32))
    mat = np.repeat(centers, 20, axis=0) + 0.15 * rng.standard_normal((500, 32))
    ids = np.arange(500, dtype=np.int64)
    stage = LshIndexStage(ray.put((ids, mat)), n_planes=8, k=10, probe_bits=2)
    import pyarrow as pa

    batch = pa.table({"vec_id": ids[:5], "embedding": [mat[i].tolist() for i in range(5)]})
    out = stage(batch).to_pandas()
    # self is always found at rank 1 (own bucket)
    r1 = out[out["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["query_id"].to_numpy()).all()
    # recall vs brute force: at least half the true top-10 found
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in range(5):
        true = set(np.argsort(-(mn @ mn[q]))[:10].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        assert len(true & got) >= 5, q


def test_lsh_ann_partitioned_matches_index_stage(ray_session):
    """The corpus-streaming lsh_ann_topk must produce the same results
    as the bounded-corpus LshIndexStage (same planes/probe logic)."""
    import ray
    import ray.data

    from osmray.ann import LshIndexStage, lsh_ann_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((25, 32))
    mat = np.repeat(centers, 20, axis=0) + 0.15 * rng.standard_normal((500, 32))
    ids = np.arange(500, dtype=np.int64)
    stage = LshIndexStage(ray.put((ids, mat)), n_planes=10, k=10, probe_bits=2)
    import pyarrow as pa

    batch = pa.table({"vec_id": ids[:5], "embedding": [mat[i].tolist() for i in range(5)]})
    want = stage(batch).to_pandas()

    ds = ray.data.from_items(
        [{"vec_id": int(i), "embedding": mat[i].tolist()} for i in range(500)]
    )
    got = lsh_ann_topk(ds, ids[:5], mat[:5], k=10).to_pandas()
    for q in range(5):
        w = want[want["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        g = got[got["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        np.testing.assert_array_equal(g, w)


def test_verify_pairs_joined_matches_dict_variant(ray_session):
    import ray.data

    base = "the quick brown fox jumps over the lazy dog and then runs far away into the deep woods tonight"
    docs = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("dog", "cat")},
        {"doc_id": 2, "text": "completely different material on another topic entirely with many words"},
        {"doc_id": 3, "text": base},
    ]
    ds = ray.data.from_items(docs)
    cands = dedup.minhash_lsh_candidates(ds)
    lut = {d["doc_id"]: d["text"] for d in docs}
    want = (
        dedup.verify_pairs(cands, lut, threshold=0.5)
        .to_pandas()[["a", "b", "jaccard"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    got = (
        dedup.verify_pairs_joined(cands, ds, threshold=0.5)
        .to_pandas()[["a", "b", "jaccard"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert want.equals(got)


def test_embedding_dup_pairs_lsh_and_exact_modes(ray_session):
    """LSH mode finds the injected high-cosine dups; exact grid mode
    equals the brute-force answer at a low threshold."""
    import ray.data

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 8))
    mat[7] = mat[3] * 2.0
    mat[9] = mat[3] + rng.standard_normal(8) * 0.01
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(50)]
    )
    out = dedup.embedding_dup_pairs(ds, threshold=0.6, mode="exact").to_pandas()
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    ai, bj = np.nonzero(np.triu(sims >= 0.6, k=1))
    assert set(zip(out["a"], out["b"])) == set(zip(ai, bj))


def test_embedding_dup_pairs(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((50, 8))
    mat[7] = mat[3] * 2.0  # same direction -> cosine 1
    mat[9] = mat[3] + rng.standard_normal(8) * 0.01  # near dup
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": mat[i].tolist()} for i in range(50)]
    )
    out = dedup.embedding_dup_pairs(ds, threshold=0.95).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (3, 7) in pairs and (3, 9) in pairs


def test_windowed_sorted_equals_groups(ray_session):
    """Sort-based windowing (windows.py) must equal the map_groups
    reference twins row for row."""
    import pandas as pd
    import ray.data

    from osmray import queries as Q
    from osmray.windows import running_sum_sorted, sessionize_sorted

    rng = np.random.default_rng(9)
    n = 5000
    rows = [
        {
            "event_id": int(i),
            "user_id": int(rng.integers(0, 40)),
            "ts": pd.Timestamp("2024-01-01")
            + pd.Timedelta(seconds=int(rng.integers(0, 400000))),
            "value": float(rng.uniform(0, 50)),
        }
        for i in range(n)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(7)

    a = (
        sessionize_sorted(ds.select_columns(["user_id", "ts"]))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    b = (
        Q.sessionize_groups(ds.select_columns(["user_id", "ts"]))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert a[["user_id", "n_sessions", "n_events"]].equals(
        b[["user_id", "n_sessions", "n_events"]]
    )

    cols = ["event_id", "user_id", "row_n", "running_cents"]
    c = (
        running_sum_sorted(ds).to_pandas()[cols]
        .sort_values(["user_id", "row_n"]).reset_index(drop=True)
    )
    d = (
        Q.running_sum_groups(ds).to_pandas()[cols]
        .sort_values(["user_id", "row_n"]).reset_index(drop=True)
    )
    assert c.astype("int64").equals(d.astype("int64"))


def test_grouped_topk_sorted_equals_combiner(ray_session):
    import pandas as pd
    import ray.data

    from osmray.windows import grouped_topk, grouped_topk_sorted

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(20000, dtype=np.int64),
            "o_custkey": rng.integers(0, 4000, 20000),
            "o_totalprice": np.round(rng.uniform(10, 1000, 20000), 2),
        }
    )
    ds = ray.data.from_pandas(df).repartition(9)
    cols = ["o_custkey", "rank", "o_orderkey", "o_totalprice"]
    a = (
        grouped_topk(ds, "o_custkey", "o_totalprice", "o_orderkey", k=2)
        .to_pandas()[cols].sort_values(["o_custkey", "rank"]).reset_index(drop=True)
    )
    b = (
        grouped_topk_sorted(ds, "o_custkey", "o_totalprice", "o_orderkey", k=2)
        .to_pandas()[cols].sort_values(["o_custkey", "rank"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_ivf_kmeans_and_search(ray_session):
    import ray.data

    from osmray.ann import ivf_ann_topk, ivf_partition, ivf_search_partitioned, kmeans_fit

    # clustered corpus (the regime IVF targets)
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((25, 32))
    mat = np.repeat(centers, 20, axis=0) + 0.15 * rng.standard_normal((500, 32))
    ids = np.arange(500, dtype=np.int64)
    items = [{"vec_id": int(i), "embedding": mat[i].tolist()} for i in ids]
    ds = ray.data.from_items(items).repartition(4)

    cent = kmeans_fit(ds, n_centroids=16, n_iters=4)
    assert cent.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, rtol=1e-9)
    # deterministic: the same partitioning reproduces the centroids
    # bit-exactly; a different partitioning only reorders float sums
    cent_same = kmeans_fit(ray.data.from_items(items).repartition(4), n_centroids=16, n_iters=4)
    np.testing.assert_array_equal(cent, cent_same)
    cent2 = kmeans_fit(ray.data.from_items(items).repartition(7), n_centroids=16, n_iters=4)
    np.testing.assert_allclose(cent, cent2, atol=1e-12)

    qids = ids[:5]
    qmat = mat[:5].astype(np.float64)
    out = ivf_ann_topk(ds, qids, qmat, cent, k=10, n_probe=4).to_pandas()
    # self found at rank 1 (its own list is always probed first)
    r1 = out[out["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["query_id"].to_numpy()).all()
    # recall vs brute force
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in range(5):
        true = set(np.argsort(-(mn @ mn[q]))[:10].tolist())
        got = set(out[out["query_id"] == q]["vec_id"].tolist())
        assert len(true & got) >= 8, q

    # the partitioned (standing-index) search returns identical rows
    root = ivf_partition(ds, cent)
    out2 = ivf_search_partitioned(root, qids, qmat, cent, k=10, n_probe=4).to_pandas()
    key = ["query_id", "rank"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_array_equal(a["cosine"].to_numpy(), b["cosine"].to_numpy())


def test_ivf_more_centroids_than_vectors(ray_session):
    import ray.data

    from osmray.ann import kmeans_fit

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((5, 8))
    ds = ray.data.from_items(
        [{"vec_id": int(i), "embedding": mat[i].tolist()} for i in range(5)]
    )
    cent = kmeans_fit(ds, n_centroids=8, n_iters=2)
    assert cent.shape[1] == 8 and len(cent) <= 8


def test_simhash_hamming_pairs_exact(ray_session):
    """Pigeonhole banding must find EXACTLY the brute-force pairs."""
    import ray.data

    from osmray import dedup

    texts = [f"alpha beta gamma delta epsilon zeta token{i % 7} tail{i % 3}" for i in range(60)]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    got = (
        dedup.simhash_hamming_pairs(ds, max_hamming=6)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    sigs = dedup.simhash64_batch(texts).astype(np.uint64)
    want = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            h = bin(int(sigs[i] ^ sigs[j])).count("1")
            if h <= 6:
                want.append((i, j, h))
    assert [tuple(r) for r in got[["a", "b", "hamming"]].to_numpy()] == want


def test_hamming_pairs_64bit_signatures(ray_session):
    """The generic operator on arbitrary (possibly negative) int64
    signatures must equal brute force."""
    import ray.data

    from osmray import dedup

    rng = np.random.default_rng(21)
    base = rng.integers(-(1 << 62), 1 << 62, 40, dtype=np.int64)
    # inject near-dups: flip <= 5 bits of some signatures
    sigs = base.copy()
    for i in range(0, 40, 4):
        v = np.uint64(sigs[i])
        for b in rng.integers(0, 64, rng.integers(1, 6)):
            v ^= np.uint64(1) << np.uint64(b)
        sigs[(i + 1) % 40] = np.int64(v)
    ds = ray.data.from_items(
        [{"img": int(i), "phash": int(sigs[i])} for i in range(40)]
    ).repartition(3)
    got = (
        dedup.hamming_pairs(ds, max_hamming=5, id_col="img", sig_col="phash", n_bits=64)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    u = sigs.view(np.uint64)
    want = []
    for i in range(40):
        for j in range(i + 1, 40):
            h = bin(int(u[i] ^ u[j])).count("1")
            if h <= 5:
                want.append((i, j, h))
    assert [tuple(r) for r in got[["a", "b", "hamming"]].to_numpy()] == want


def test_hll_estimate_accuracy(ray_session):
    """Registers from the distributed pipeline reproduce the scalar
    sketch, and the estimate lands within 5% of the exact count."""
    import ray.data

    from osmray import sketch

    rng = np.random.default_rng(17)
    users = rng.integers(0, 4000, 20000)
    kinds = np.array(["a", "b"])[rng.integers(0, 2, 20000)]
    ds = ray.data.from_items(
        [{"event_type": str(k), "user_id": int(u)} for k, u in zip(kinds, users)]
    ).repartition(5)
    regs = sketch.hll_registers(ds, "event_type", "user_id").to_pandas()
    for kind in ("a", "b"):
        g = regs[regs["event_type"] == kind]
        est = sketch.hll_estimate_sparse(g["bucket"].to_numpy(), g["rho_max"].to_numpy())
        exact = len(np.unique(users[kinds == kind]))
        assert abs(est - exact) / exact < 0.05, (kind, est, exact)
        # scalar reference: same registers from a flat numpy pass
        v = users[kinds == kind]
        b, r = sketch.hll_bucket_rho(sketch.hll_hash62(np.unique(v)))
        want = {}
        for bb, rr in zip(b, r):
            want[int(bb)] = max(want.get(int(bb), 0), int(rr))
        got = dict(zip(g["bucket"].astype(int), g["rho_max"].astype(int)))
        assert got == want


def test_decontaminate_modes_agree(ray_session):
    """broadcast and keyed (grace semi-join) decontamination regimes
    return identical (doc_id, n_hits) tables; a scalar per-doc set
    intersection is the oracle."""
    import ray.data

    from osmray import dedup

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        words = [vocab[j] for j in rng.integers(0, len(vocab), 30)]
        docs.append({"doc_id": int(i), "text": " ".join(words)})
    ds = ray.data.from_items(docs).repartition(4)

    got_b = (
        dedup.decontaminate_counts(ds, mode="broadcast")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got_k = (
        dedup.decontaminate_counts(ds, mode="keyed")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got_b.equals(got_k)

    # scalar oracle: per-doc distinct shingle sets
    held: set[int] = set()
    per_doc = {}
    for d in docs:
        sh = set(dedup._shingle_hashes(d["text"]).tolist())
        if d["doc_id"] % 10 == 0:
            held |= sh
        else:
            per_doc[d["doc_id"]] = sh
    want = {i: len(s & held) for i, s in per_doc.items()}
    assert dict(zip(got_b["doc_id"], got_b["n_hits"])) == want
    # zero-hit docs must still appear
    assert len(got_b) == len(per_doc)


def test_bm25_topk_ranking_properties(ray_session):
    import ray.data

    from osmray.text import bm25_topk

    # doc 0: query terms only; doc 1: one query term diluted;
    # doc 2: no query terms; doc 3: rarer term ("vector" appears once
    # in the corpus) must out-score a common one at equal tf/dl.
    docs = [
        (0, "hash join hash join"),
        (1, "hash filler filler filler filler filler filler filler"),
        (2, "nothing relevant here at all"),
        (3, "vector filler filler filler filler filler filler filler"),
        (4, "hash hash hash hash hash hash hash hash"),
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in docs]
    ).repartition(3)
    out = (
        bm25_topk(ds, ["hash", "join", "stream", "vector"], k=10)
        .to_pandas()
        .sort_values("rank")
    )
    assert 2 not in set(out["doc_id"])  # zero-score docs dropped
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    # rank order consistent with (score desc, doc_id asc)
    s = out["score_milli"].to_numpy()
    assert ((s[:-1] > s[1:]) | ((s[:-1] == s[1:]) & (out["doc_id"].to_numpy()[:-1] < out["doc_id"].to_numpy()[1:]))).all()
    score = dict(zip(out["doc_id"], out["score_milli"]))
    assert score[0] > score[1]  # two matching terms beat one diluted
    assert score[3] > score[1]  # rarer term out-scores common at same tf/dl


def test_spill_default_refuses_multi_node(ray_session, monkeypatch):
    """r3 verdict #1: dedup/ann/simjoin spill defaults must route
    through joins._resolve_spill, so a multi-node cluster with no
    explicit spill_root is refused loudly instead of silently reading
    empty fragments on remote nodes."""
    import ray

    import pyarrow as pa
    import ray.data

    from osmray import dedup

    monkeypatch.setattr(
        ray, "nodes",
        lambda: [{"Alive": True, "NodeID": "a"},
                 {"Alive": True, "NodeID": "b"}])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb cc", "aa bb cc"])}))
    with pytest.raises(ValueError, match="spill_root"):
        dedup.minhash_lsh_candidates(ds)


def test_hamming_pairs_loud_skew_guard(ray_session):
    """max_pairs_per_shard is a LOUD guard: a degenerate corpus of
    identical signatures raises with a skew diagnosis instead of
    grinding; a generous cap returns the exact (uncapped) result."""
    import pytest
    import ray.data

    from osmray import dedup

    n = 60  # all-identical sigs -> one bucket run of 60 -> 1770 pairs
    ds = ray.data.from_items(
        [{"doc_id": int(i), "simhash": 12345} for i in range(n)]
    ).repartition(2)
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="max_pairs_per_shard"):
        dedup.hamming_pairs(ds, max_hamming=2, max_pairs_per_shard=100).count()

    got = dedup.hamming_pairs(
        ds, max_hamming=2, max_pairs_per_shard=10_000
    ).to_pandas()
    assert len(got) == n * (n - 1) // 2
    assert (got["hamming"] == 0).all()


def test_collocations_keyed_equals_broadcast(ray_session):
    """The grace-join unigram attach (vocab above broadcast_cap) must
    emit exactly the broadcast path's rows."""
    import ray.data

    from osmray.queries import _collocations

    texts = [
        "a b a b a b c a b x",
        "a b a b q c c c c c",
        "b a b a b a b a b a",
    ] * 4
    docs = ray.data.from_items([{"text": t} for t in texts])

    def key(rows):
        return sorted(map(tuple, rows))

    bc = _collocations(docs, min_count=3).take_all()
    keyed = _collocations(docs, min_count=3, broadcast_cap=0).take_all()
    cols = ["w1", "w2", "n_xy", "n_x", "n_y", "lift2"]
    assert key([[r[c] for c in cols] for r in bc]) == \
        key([[r[c] for c in cols] for r in keyed])
    assert len(bc) > 0


def test_ngram_novelty_owner_trick(ray_session):
    """The min-owner trick equals the brute per-doc unique-trigram
    count on a corpus with planted shared and unique trigrams."""
    import ray.data

    from osmray.queries import q_ngram_novelty  # noqa: F401 (shape)
    from osmray import queries as Q

    texts = {
        1: "x y z a b c d",          # 'x y z' unique; others shared below
        2: "a b c d e f",
        3: "a b c d e f",            # doc2/doc3 trigrams all shared
        4: "p q",                    # too short: 0 trigrams
    }
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()))}),
        os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: (r["n_trigrams"], r["n_novel"])
           for r in Q.q_ngram_novelty(d).to_pandas().to_dict("records")}
    # brute
    from collections import Counter
    grams = Counter()
    per = {}
    for did, t in texts.items():
        ws = t.split(" ")
        gs = list(zip(ws, ws[1:], ws[2:]))
        per[did] = gs
        grams.update(gs)
    exp = {did: (len(gs), sum(1 for g in gs if grams[g] == 1))
           for did, gs in per.items()}
    assert out == exp


def test_semdedup_drops_planted_near_dups(ray_session):
    """Planted near-identical vectors land in one cluster and only
    the representative survives; orthogonal-ish vectors all keep."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmray import queries as Q

    rng = np.random.RandomState(2)
    base = rng.randn(100, 64)
    # a tight 30-copy bundle: it dominates its cluster, so the
    # cluster's representative must be a bundle member and the other
    # 29 near-copies (cos ~ 1 to the rep) are dropped
    bundle = base[0] + rng.randn(30, 64) * 1e-3
    vecs = np.vstack([base[1:], bundle])
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}),
        os.path.join(d, "embeddings.parquet"))
    out = Q.q_semdedup(d).to_pandas()
    bundle_ids = set(range(99, 129))
    br = out[out["vec_id"].isin(bundle_ids)]
    assert br["list_id"].nunique() == 1
    assert int(br["rep_id"].iloc[0]) in bundle_ids
    assert br["keep"].sum() == 1
    # every cluster's representative is kept
    reps = out.groupby("list_id")["rep_id"].first()
    kept = set(out[out["keep"] == 1]["vec_id"])
    assert set(reps) <= kept


def test_seq_packing_invariants(ray_session):
    """Packing never exceeds capacity (single-doc overflows aside),
    covers every doc exactly once, and offsets tile each sequence."""
    import os
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmray import queries as Q

    rng = np.random.RandomState(4)
    texts = [" ".join(["w"] * int(n)) for n in rng.randint(10, 90, 120)]
    d = tempfile.mkdtemp()
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(120), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(120)]),
        "text": pa.array(texts)}),
        os.path.join(d, "documents.parquet"))
    out = Q.q_seq_packing(d).to_pandas()
    assert len(out) == 120 and out["doc_id"].is_unique
    toks = {i: len(t.split(" ")) for i, t in enumerate(texts)}
    for (_, _), grp in out.groupby(["source", "seq_id"]):
        grp = grp.sort_values("doc_id")
        total = sum(toks[i] for i in grp["doc_id"])
        assert total <= 128
        # offsets are the running prefix within the sequence
        run = 0
        for _, r in grp.iterrows():
            assert r["off_tokens"] == run
            run += toks[r["doc_id"]]


def test_lm_score_two_engines_and_hand_check(ray_session):
    """lm_score broadcast == keyed-grace engines, and both equal the
    hand-computed bigram-commonness score on a tiny corpus."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from osmray.queries import lm_score

    texts = ["a b a b c", "a b x", "c a b", "z q"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts)}))
    want = {}
    from collections import Counter
    grams = Counter()
    for t in texts:
        ws = t.split(" ")
        grams.update(zip(ws, ws[1:]))
    for did, t in zip([1, 2, 3, 4], texts):
        ws = t.split(" ")
        slots = list(zip(ws, ws[1:]))
        want[did] = (len(slots),
                     1000 * sum(grams[s] for s in slots) // len(slots))
    for cap in (2_000_000, 0):  # broadcast / keyed-grace engines
        df = lm_score(ds, broadcast_cap=cap).to_pandas()
        got = {int(r.doc_id): (int(r.n_slots), int(r.score_mil))
               for r in df.itertuples()}
        assert got == want, cap


def test_link_predict_planted_graph(ray_session):
    """link_predict_topk on a planted graph: path a-b-c plus square
    1-2-3-4 — candidates (a,c) cn=1 and the two square diagonals
    cn=2, existing edges excluded, order (cn DESC, a, b)."""
    import pyarrow as pa
    import ray.data

    from osmray.queries import link_predict_topk

    edges = [(10, 11), (11, 12),            # path: candidate (10,12)
             (1, 2), (2, 3), (3, 4), (4, 1)]  # square: (1,3),(2,4) cn=2
    via = [u for u, v in edges] + [v for u, v in edges]
    nb = [v for u, v in edges] + [u for u, v in edges]
    adj = ray.data.from_arrow(pa.table({
        "via": pa.array(via, pa.int64()), "nb": pa.array(nb, pa.int64())}))
    df = link_predict_topk(adj, k=10).to_pandas()
    got = [(int(r.a), int(r.b), int(r.cn)) for r in df.itertuples()]
    assert got == [(1, 3, 2), (2, 4, 2), (10, 12, 1)]


def test_boilerplate_two_engines_and_scalar_oracle(ray_session):
    import ray.data

    from osmray import text as T

    rng = np.random.default_rng(11)
    vocab = [f"w{j}" for j in range(12)]
    docs = []
    for i in range(60):
        words = [vocab[j] for j in rng.integers(0, len(vocab), 25)]
        docs.append({"doc_id": int(i), "text": " ".join(words)})
    docs.append({"doc_id": 60, "text": "solo"})  # < n tokens: zero row
    ds = ray.data.from_items(docs).repartition(5)

    got_b = (T.boilerplate_coverage(ds, n=3, min_docs=2, mode="broadcast")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got_k = (T.boilerplate_coverage(ds, n=3, min_docs=2, mode="keyed",
                                    num_buckets=7)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got_b.equals(got_k)

    # scalar oracle: brute-force gram -> distinct docs -> coverage
    from collections import defaultdict
    owners = defaultdict(set)
    for d in docs:
        ws = d["text"].split(" ")
        for i in range(len(ws) - 2):
            owners["\x1f".join(ws[i:i + 3])].add(d["doc_id"])
    bp = {g for g, o in owners.items() if len(o) >= 2}
    for d in docs:
        ws = d["text"].split(" ")
        cov = [False] * len(ws)
        for i in range(len(ws) - 2):
            if "\x1f".join(ws[i:i + 3]) in bp:
                cov[i] = cov[i + 1] = cov[i + 2] = True
        row = got_b[got_b.doc_id == d["doc_id"]].iloc[0]
        assert row.n_tokens == len(ws)
        assert row.n_cov == sum(cov)
        assert row.boiler_mil == sum(cov) * 1_000_000 // max(len(ws), 1)


def test_cdc_chunks_resync_and_pipeline(ray_session):
    import ray.data

    from osmray import dedup

    # chunker invariants: concat of chunks == text, '' -> []
    rng = np.random.default_rng(5)
    alpha = "abcdefgh "
    text = "".join(alpha[j] for j in rng.integers(0, len(alpha), 800))
    chunks = dedup._cdc_chunks(text)
    assert "".join(chunks) == text and all(chunks)
    assert dedup._cdc_chunks("") == []
    assert dedup._cdc_chunks("short") == ["short"]

    # insertion robustness: one char inserted near the front changes
    # only a prefix of chunks — the boundary stream re-synchronizes,
    # so most chunk strings are shared (the property stride-grams lack)
    mutated = text[:5] + "X" + text[5:]
    shared = set(chunks) & set(dedup._cdc_chunks(mutated))
    assert len(shared) >= int(0.8 * len(chunks))

    # pipeline vs scalar oracle
    docs = [{"doc_id": 0, "text": text},
            {"doc_id": 1, "text": mutated},
            {"doc_id": 2, "text": "zzz unrelated content qqq"}]
    got = (dedup.cdc_chunk_dups(ray.data.from_items(docs).repartition(3),
                                num_buckets=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    from collections import Counter
    owners = {}
    per_doc = {}
    for d in docs:
        cs = dedup._cdc_chunks(d["text"])
        per_doc[d["doc_id"]] = Counter(cs)
        for c in set(cs):
            owners.setdefault(c, set()).add(d["doc_id"])
    for d in docs:
        cnt = per_doc[d["doc_id"]]
        n_dup = sum(c for ch, c in cnt.items() if len(owners[ch]) >= 2)
        row = got[got.doc_id == d["doc_id"]].iloc[0]
        assert row.n_chunks == sum(cnt.values())
        assert row.n_dup == n_dup
    assert got[got.doc_id == 2].iloc[0].n_dup == 0
    assert got[got.doc_id == 0].iloc[0].n_dup > 0


def test_session3_ops_block_invariant(ray_session):
    """Corpus-level session-3 kernels give identical results across
    block layouts (1 block vs many small blocks) — no block-local
    semantics leak into the answer."""
    import ray.data

    from osmray import dedup, text

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])

    for fn in (lambda d: text.boilerplate_coverage(d, n=3, min_docs=2),
               lambda d: dedup.cdc_chunk_dups(d, num_buckets=7),
               text.gopher_repetition):
        a = (fn(docs.repartition(1)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (fn(docs.repartition(13)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b)
