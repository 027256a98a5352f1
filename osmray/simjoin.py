"""Exact string / set similarity self-joins — the scalable near-dup
primitives that don't fit LSH (which is approximate; see
osmray/dedup.py for MinHash/SimHash):

- ``edit1_join``   all pairs at Levenshtein distance exactly 1, via
  PassJoin-style segment blocking (Li, Deng, Feng: "PassJoin", VLDB
  2011 — pigeonhole on k+1=2 segments): if edit(a,b) <= 1 then a's
  first or second half appears verbatim in b at an alignment shift
  bounded by the length difference. Each string emits O(1) index keys
  (its two halves) and O(1) probe keys (its halves re-cut at every
  partner length l' in [l-1, l+1]); candidates meet in a keyed
  groupby, so nothing is ever all-pairs. Verification is a fully
  vectorized distance-1 check (first-mismatch + shifted-suffix
  comparison over byte matrices). The k >= 2 generalization cuts k+1
  segments and probes a +-k position window; not needed by current
  callers, so only k=1 ships.

- ``jaccard_join`` all pairs with set-Jaccard >= t (exact, integer
  threshold test), via prefix filtering (Chaudhuri-Ganti-Kaushik
  SSJoin / Xiao et al. PPJoin): under ANY global token order, two
  sets with J >= t must share a token among each side's first
  n - ceil(t*n) + 1 tokens. The canonical order here is hashed-token
  (a df-ascending order is the classic candidate-minimizing
  refinement; it costs an extra token-frequency shuffle and does not
  change the result, so the cheap order is the default). Candidates
  meet in a per-token groupby with a length filter, pairs dedup in a
  keyed groupby, and token sets join back via TWO grace joins (the
  same verify pattern as dedup.minhash verification — the corpus is
  never driver-resident).

Both return Datasets and use one keyed shuffle per stage; skew is
bounded by the hottest half/prefix-token bucket (cap-and-spill as in
dedup.lsh applies if a real corpus produces a pathological token).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pack_bytes(strs: list[str], width: int) -> np.ndarray:
    """Fixed-width zero-padded uint8 matrix of UTF-8 encodings."""
    out = np.zeros((len(strs), width), dtype=np.uint8)
    for i, s in enumerate(strs):
        b = s.encode()
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


def edit1_verify(a: list[str], b: list[str]) -> np.ndarray:
    """Vectorized check: Levenshtein(a_i, b_i) == 1 (bytewise).
    Exact for any byte strings; callers pass UTF-8 of equal-or-
    adjacent byte lengths (other pairs are False by definition)."""
    la = np.array([len(s.encode()) for s in a], dtype=np.int64)
    lb = np.array([len(s.encode()) for s in b], dtype=np.int64)
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    w = int(max(la.max(), lb.max())) + 1
    A = _pack_bytes(a, w)
    B = _pack_bytes(b, w)
    ok = np.zeros(n, dtype=bool)

    # substitution case: equal lengths, exactly one mismatch
    eq_len = la == lb
    mism = (A != B).sum(axis=1)
    ok[eq_len & (mism == 1)] = True

    # insertion case: |la - lb| == 1; let S be the shorter, L longer.
    for sh, lg, ls, ll in ((A, B, la, lb), (B, A, lb, la)):
        m = ll == ls + 1
        if not m.any():
            continue
        S, L = sh[m], lg[m]
        lsm = ls[m]
        # first mismatch position (padded tails are equal-safe:
        # positions >= ls are masked into the "after" region)
        diff = S != L
        J = np.arange(w)[None, :]
        diff = diff & (J < lsm[:, None])
        f = np.where(diff.any(axis=1), diff.argmax(axis=1), lsm)
        # need S[f:ls] == L[f+1:ls+1]
        eq = S[:, : w - 1] == L[:, 1:]
        region = (J[:, : w - 1] >= f[:, None]) & (J[:, : w - 1] < lsm[:, None])
        ok[np.flatnonzero(m)] |= np.all(eq | ~region, axis=1)
    return ok


def _dedup_rows(ds, key_expr):
    """One row per key (keyed groupby, first row wins)."""
    def first(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    return ds.groupby(key_expr).map_groups(first, batch_format="pyarrow")


def edit1_join(ds, col: str = "s"):
    """All unordered pairs of DISTINCT strings in ``ds[col]`` at
    Levenshtein distance exactly 1. Returns columns (a, b), a < b."""

    distinct = _dedup_rows(ds.select_columns([col]), col)

    def keys(batch: pa.Table) -> pa.Table:
        out = {"part": [], "seg": [], "plen": [], "role": [], "s": []}
        for s in batch[col].to_pylist():
            e = s.encode()
            l = len(e)
            # index: my halves under my own length
            h = l // 2
            for part, seg in ((0, e[:h]), (1, e[h:])):
                out["part"].append(part)
                out["seg"].append(seg.decode("latin1"))
                out["plen"].append(l)
                out["role"].append(0)
                out["s"].append(s)
            # probe: my halves re-cut at every partner length
            for lp in (l - 1, l, l + 1):
                if lp < 1:
                    continue
                hp = lp // 2
                # partner's prefix seg (hp bytes at pos 0) must equal
                # my first hp bytes; partner's suffix seg (lp - hp
                # bytes ending at its end) must equal my last lp - hp
                # bytes
                cand = ((0, e[:hp]), (1, e[l - (lp - hp):] if lp - hp <= l
                                      else None))
                for part, seg in cand:
                    if seg is None or (part == 0 and hp > l):
                        continue
                    out["part"].append(part)
                    out["seg"].append(seg.decode("latin1"))
                    out["plen"].append(lp)
                    out["role"].append(1)
                    out["s"].append(s)
        return pa.table({
            "part": pa.array(out["part"], pa.int64()),
            "seg": pa.array(out["seg"], pa.string()),
            "plen": pa.array(out["plen"], pa.int64()),
            "role": pa.array(out["role"], pa.int64()),
            "s": pa.array(out["s"], pa.string()),
            "bkey": pa.array(
                [f"{p}|{l}|{g}" for p, l, g in
                 zip(out["part"], out["plen"], out["seg"])], pa.string()),
        })

    keyed = distinct.map_batches(keys, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        role = g["role"].to_numpy(zero_copy_only=False)
        s = np.asarray(g["s"].to_pylist(), dtype=object)
        idx = s[role == 0]
        prb = s[role == 1]
        if len(idx) == 0 or len(prb) == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        I, P = np.meshgrid(np.arange(len(idx)), np.arange(len(prb)),
                           indexing="ij")
        ai, bi = idx[I.ravel()], prb[P.ravel()]
        ne = ai != bi
        ai, bi = ai[ne], bi[ne]
        lo = np.minimum(ai, bi)
        hi = np.maximum(ai, bi)
        return pa.table({"a": pa.array(lo, pa.string()),
                         "b": pa.array(hi, pa.string())})

    cand = keyed.groupby("bkey").map_groups(pairs, batch_format="pyarrow")

    # verify BEFORE dedup: the distance-1 check is vectorized and
    # cheap, so duplicated candidates (a pair meeting under both its
    # halves) cost less than a candidate-scale keyed dedup; the final
    # dedup groupby runs on the output-sized verified set
    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        ok = edit1_verify(a, b)
        out = batch.filter(pa.array(ok))
        return out.append_column(
            "pk", pa.array([x + "\t" + y for x, y in
                            zip(out["a"].to_pylist(),
                                out["b"].to_pylist())]))

    verified = cand.map_batches(verify, batch_format="pyarrow")
    return _dedup_rows(verified, "pk").drop_columns(["pk"])


def jaccard_join(docs_ds, id_col: str, toks_col: str,
                 t_num: int = 1, t_den: int = 2, num_buckets: int = 16,
                 spill_root: str | None = None):
    """All pairs (a < b by id) with |Ta ∩ Tb| / |Ta ∪ Tb| >= t_num /
    t_den (token columns are list<string> SETS — deduped upstream).
    Returns (a, b, inter, uni); the threshold test is all-integer.
    Exactness: under the hashed-token global order, J(a,b) >= t
    implies the prefixes (first n - ceil(t*n) + 1 tokens) intersect
    — the standard prefix-filter pigeonhole."""
    from osmray.joins import bucketed_join

    def prefixes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = batch[toks_col].to_pylist()
        out_t, out_id, out_n = [], [], []
        for i, ts in enumerate(toks):
            n = len(ts)
            if n == 0:
                continue
            order = sorted(ts, key=lambda s: (hash64_str(s), s))
            # ceil(t*n) with integer arithmetic
            p = n - (t_num * n + t_den - 1) // t_den + 1
            for tok in order[:p]:
                out_t.append(tok)
                out_id.append(int(ids[i]))
                out_n.append(n)
        return pa.table({"tok": pa.array(out_t, pa.string()),
                         "id": pa.array(out_id, pa.int64()),
                         "n": pa.array(out_n, pa.int64())})

    pref = docs_ds.map_batches(prefixes, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        ns = g["n"].to_numpy(zero_copy_only=False)
        k = len(ids)
        if k < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        I, J = np.triu_indices(k, 1)
        a, b = ids[I], ids[J]
        na, nb = ns[I], ns[J]
        # length filter: J >= t needs t*max(na,nb) <= min(na,nb)
        m = (a != b) & (t_num * np.maximum(na, nb)
                        <= t_den * np.minimum(na, nb))
        lo = np.minimum(a[m], b[m])
        hi = np.maximum(a[m], b[m])
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    cand = pref.groupby("tok").map_groups(pairs, batch_format="pyarrow")

    def local_dedup(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        pk = a * (1 << 32) + b
        first = np.unique(pk, return_index=True)[1]
        return batch.take(pa.array(np.sort(first)))

    # duplicates (a pair sharing several prefix tokens) are only
    # block-locally deduped here; survivors re-verify identically and
    # the FINAL keyed dedup runs on the output-sized verified set —
    # one less corpus-scale sort than dedup-before-verify
    uniq = cand.map_batches(local_dedup, batch_format="pyarrow")

    # the token-set spill is built ONCE and probed by both pair ids

    from osmray.joins import _resolve_spill

    spill_root = _resolve_spill(spill_root, "simjoin")
    sets = docs_ds.select_columns([id_col, toks_col])
    j1 = bucketed_join(uniq.select_columns(["a", "b"]), sets, on="a",
                       right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill_root)
    j1 = j1.map_batches(
        lambda tbl: tbl.rename_columns(
            [n if n != toks_col else "toks_a" for n in tbl.schema.names]),
        batch_format="pyarrow")
    j2 = bucketed_join(j1, sets, on="b", right_on=id_col,
                       num_buckets=num_buckets, spill_root=spill_root,
                       prebuilt=True)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["toks_a"].to_pylist()
        tb = batch[toks_col].to_pylist()
        inter = np.array(
            [len(np.intersect1d(np.asarray(x, dtype=object),
                                np.asarray(y, dtype=object)))
             for x, y in zip(ta, tb)], dtype=np.int64)
        na = np.array([len(x) for x in ta], dtype=np.int64)
        nb = np.array([len(y) for y in tb], dtype=np.int64)
        uni = na + nb - inter
        keep = t_den * inter >= t_num * uni
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(a[keep]), "b": pa.array(b[keep]),
            "inter": pa.array(inter[keep]),
            "uni": pa.array(uni[keep]),
            "pk": pa.array(a[keep] * (1 << 32) + b[keep])})

    verified = j2.map_batches(verify, batch_format="pyarrow")
    return _dedup_rows(verified, "pk").drop_columns(["pk"])


def hash64_str(s: str) -> int:
    """Deterministic 64-bit FNV-1a of a string (stable across
    processes, unlike Python's salted hash())."""
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def containment_join(docs_ds, id_col: str, toks_col: str,
                     t_num: int = 4, t_den: int = 5, num_buckets: int = 16,
                     spill_root: str | None = None):
    """Directional set-containment self-join: ordered pairs (a, b),
    a != b, with |Ta ∩ Tb| >= (t_num/t_den) * |Ta| — the quote /
    excerpt-detection dedup (asymmetric, unlike :func:`jaccard_join`).
    Returns (a, b, inter, na, nb); all-integer threshold test.

    Candidate generation is the asymmetric prefix filter: under the
    hashed global token order, side A probes with its first
    n - ceil(t*n) + 1 tokens while side B indexes ALL its tokens
    (containment gives no prefix bound on the containing set), so a
    token group pairs its prefix rows against its full posting list.
    Hot tokens therefore bound candidates by their posting-list
    length - cap input cardinality or raise the threshold for
    pathological corpora (same honesty note as hamming_pairs)."""
    from osmray.joins import _resolve_spill, bucketed_join

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = batch[toks_col].to_pylist()
        out_t, out_id, out_n, out_p = [], [], [], []
        for i, ts in enumerate(toks):
            n = len(ts)
            if n == 0:
                continue
            order = sorted(ts, key=lambda s: (hash64_str(s), s))
            p = n - (t_num * n + t_den - 1) // t_den + 1
            for j, tok in enumerate(order):
                out_t.append(tok)
                out_id.append(int(ids[i]))
                out_n.append(n)
                out_p.append(j < p)
        return pa.table({"tok": pa.array(out_t, pa.string()),
                         "id": pa.array(out_id, pa.int64()),
                         "n": pa.array(out_n, pa.int64()),
                         "pref": pa.array(out_p, pa.bool_())})

    post = docs_ds.map_batches(postings, batch_format="pyarrow")

    def pairs(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        ns = g["n"].to_numpy(zero_copy_only=False)
        pf = g["pref"].to_numpy(zero_copy_only=False)
        pi = np.flatnonzero(pf)
        if len(pi) == 0 or len(ids) < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        A = np.repeat(pi, len(ids))
        B = np.tile(np.arange(len(ids)), len(pi))
        a, b = ids[A], ids[B]
        na, nb = ns[A], ns[B]
        # |A∩B| <= nb, so containment needs t*na <= t_den*nb
        m = (a != b) & (t_num * na <= t_den * nb)
        return pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})

    cand = post.groupby("tok").map_groups(pairs, batch_format="pyarrow")

    def local_dedup(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        pk = a * (1 << 32) + b
        first = np.unique(pk, return_index=True)[1]
        return batch.take(pa.array(np.sort(first)))

    uniq = cand.map_batches(local_dedup, batch_format="pyarrow")

    spill_root = _resolve_spill(spill_root, "containment")
    sets = docs_ds.select_columns([id_col, toks_col])
    j1 = bucketed_join(uniq.select_columns(["a", "b"]), sets, on="a",
                       right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill_root)
    j1 = j1.map_batches(
        lambda tbl: tbl.rename_columns(
            [n if n != toks_col else "toks_a" for n in tbl.schema.names]),
        batch_format="pyarrow")
    j2 = bucketed_join(j1, sets, on="b", right_on=id_col,
                       num_buckets=num_buckets, spill_root=spill_root,
                       prebuilt=True)

    def verify(batch: pa.Table) -> pa.Table:
        ta = batch["toks_a"].to_pylist()
        tb = batch[toks_col].to_pylist()
        inter = np.array(
            [len(np.intersect1d(np.asarray(x, dtype=object),
                                np.asarray(y, dtype=object)))
             for x, y in zip(ta, tb)], dtype=np.int64)
        na = np.array([len(x) for x in ta], dtype=np.int64)
        nb = np.array([len(y) for y in tb], dtype=np.int64)
        keep = t_den * inter >= t_num * na
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(a[keep]), "b": pa.array(b[keep]),
            "inter": pa.array(inter[keep]),
            "na": pa.array(na[keep]), "nb": pa.array(nb[keep]),
            "pk": pa.array(a[keep] * (1 << 32) + b[keep])})

    verified = j2.map_batches(verify, batch_format="pyarrow")
    return _dedup_rows(verified, "pk").drop_columns(["pk"])
