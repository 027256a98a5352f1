"""Text-analysis kernels for the documents table: token counting,
quality stats, n-gram language ID, rolling-hash fingerprints.

These are the large-scale-training-data operators the engine adds
beyond the reference (which has no text path); all are vectorized or
cheap-per-row map_batches kernels over Arrow batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_PUNCT = re.compile(r"[.,!?]")
_WORD = re.compile(r"[A-Za-z]+")

# tiny trigram profiles for a deterministic, dependency-free language
# heuristic (en/de/fr/es-ish); scores are counts of highly-indicative
# character trigrams. This is a heuristic — no SQL oracle.
_LANG_TRIGRAMS = {
    "en": (" th", "the", "ing", " an", "and", "ion", " of", "of "),
    "de": ("der", "ein", "sch", "ich", "und", " de", "die", "en "),
    "fr": (" le", "les", "que", " de", "ent", "tion", "é", "à "),
    "es": (" el", " de", "que", "ión", "los", "ar ", "o d", "a d"),
}


def md5_hex(texts: list[str]) -> list[str]:
    """Content hash matching DuckDB's md5() (utf-8, lowercase hex) —
    the exact-dedup key."""
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def ws_token_count(texts: list[str]) -> np.ndarray:
    """Non-empty chunks when splitting on single spaces (SQL-mirrorable:
    list_filter(str_split(text, ' '), x -> x <> ''))."""
    return np.asarray([sum(1 for t in s.split(" ") if t) for s in texts], dtype=np.int64)


def bpe_ish_token_count(texts: list[str]) -> np.ndarray:
    """A BPE-flavored token estimate: words + digits + punctuation
    runs, via one compiled regex (no SQL oracle — heuristic)."""
    pat = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
    return np.asarray([len(pat.findall(s)) for s in texts], dtype=np.int64)


def punct_count(texts: list[str]) -> np.ndarray:
    return np.asarray([len(_PUNCT.findall(s)) for s in texts], dtype=np.int64)


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_punct / n_chars_actual / mean_word_len-free
    integer quality columns (integers only: exact cross-engine)."""
    texts = batch[text_col].to_pylist()
    return (
        batch.append_column("n_tokens", pa.array(ws_token_count(texts)))
        .append_column("n_punct", pa.array(punct_count(texts)))
        .append_column(
            "n_chars_actual", pa.array(np.asarray([len(s) for s in texts], dtype=np.int64))
        )
    )


def lang_id(texts: list[str]) -> list[str]:
    """n-gram heuristic language ID; 'und' when nothing matches."""
    out = []
    for s in texts:
        low = s.lower()
        best, best_score = "und", 0
        for lang, grams in _LANG_TRIGRAMS.items():
            score = sum(low.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return out


# Rabin-Karp fingerprint parameters, shared with the DuckDB oracle
# (osmray/queries.py Q_FINGERPRINT_SQL): two independent polynomial
# hashes mod a 31-bit prime, combined into one 62-bit value, so every
# intermediate fits int64 in BOTH numpy and SQL (a 61-bit Mersenne
# modulus would overflow int64 under vectorized products).
FP_MOD = (1 << 31) - 1
FP_B1 = 257
FP_B2 = 263
FP_WINDOW = 16


def rolling_fingerprint(texts: list[str], window: int = FP_WINDOW) -> np.ndarray:
    """Document fingerprint: min over byte windows of a combined
    62-bit Rabin-Karp hash (a winnowing-lite sketch; equal for equal
    documents, robust to position shifts of shared substrings).

    combined(p) = h1(p) * 2^31 + h2(p), where
    hK(p) = sum_t byte[p+t] * B_K^(window-1-t)  mod (2^31 - 1);
    fingerprint = min_p combined(p). Vectorized: ONE set of shifted
    int64 products over the batch's concatenated byte stream. For
    ASCII text this equals the SQL twin exactly (ord == byte);
    documents shorter than the window fall back to hashing their
    full length (absent from the testdata: min doc length 47)."""
    n = len(texts)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    pw1 = np.array([pow(FP_B1, window - 1 - t, FP_MOD) for t in range(window)], dtype=np.int64)
    pw2 = np.array([pow(FP_B2, window - 1 - t, FP_MOD) for t in range(window)], dtype=np.int64)
    bufs = [s.encode("utf-8") for s in texts]
    lens = np.asarray([len(b) for b in bufs], dtype=np.int64)
    short = lens < window
    for i in np.flatnonzero(short):
        b = np.frombuffer(bufs[i], dtype=np.uint8).astype(np.int64)
        h1 = 0
        h2 = 0
        for c in b:
            h1 = (h1 * FP_B1 + int(c)) % FP_MOD
            h2 = (h2 * FP_B2 + int(c)) % FP_MOD
        out[i] = h1 * (1 << 31) + h2
    sel = np.flatnonzero(~short)
    if not len(sel):
        return out
    C = np.frombuffer(b"".join(bufs[i] for i in sel), dtype=np.uint8).astype(np.int64)
    slens = lens[sel]
    nw = slens - window + 1  # windows per doc
    # per-window sums via `window` shifted adds: max term 255 * 2^31,
    # summed over 16 taps < 2^43 — safely int64, one mod at the end
    m = len(C) - window + 1
    h1 = np.zeros(m, dtype=np.int64)
    h2 = np.zeros(m, dtype=np.int64)
    for t in range(window):
        seg = C[t : t + m]
        h1 += seg * pw1[t]
        h2 += seg * pw2[t]
    h1 %= FP_MOD
    h2 %= FP_MOD
    comb = h1 * (1 << 31) + h2
    # valid (non-boundary-crossing) window starts per doc
    starts = np.concatenate(([0], np.cumsum(slens)[:-1]))
    total = int(nw.sum())
    woff = np.concatenate(([0], np.cumsum(nw)[:-1]))
    pos = (np.arange(total) - np.repeat(woff, nw)) + np.repeat(starts, nw)
    out[sel] = np.minimum.reduceat(comb[pos], woff)
    return out


# RE2-compatible (no backrefs/lookarounds) so the DuckDB twin uses the
# IDENTICAL pattern strings
REDACT_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
REDACT_LONGNUM = r"[0-9][0-9 ()+.-]{6,}[0-9]"


def redact_pii(texts: list[str]) -> list[str]:
    """Scrub email addresses then long number runs (phone-ish) with
    fixed placeholder tokens — the training-data PII pass. Patterns
    are RE2-safe so DuckDB regexp_replace(..., 'g') reproduces the
    output byte-for-byte."""
    em = re.compile(REDACT_EMAIL)
    ph = re.compile(REDACT_LONGNUM)
    out = []
    for s in texts:
        s = em.sub("<EMAIL>", s)
        s = ph.sub("<NUM>", s)
        out.append(s)
    return out


# ---------------------------------------------------------------------------
# BM25 retrieval (the ranked-search primitive over the inverted-index
# statistics). Cross-engine exactness design: every float operation is
# an IEEE +,*,/ with the SAME expression tree in numpy and in the SQL
# twin (bit-deterministic), except ln — which is quantized to an
# integer idf (floor(1e6*ln)) before it enters the score, and the
# per-term score is itself quantized to integer millis BEFORE the
# per-doc sum, so summation order cannot perturb the result. k1/b are
# exactly binary-representable (5/4, 3/4).
# ---------------------------------------------------------------------------

BM25_K1 = 1.25
BM25_B = 0.75


def bm25_topk(docs_ds, query_terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents by quantized BM25 score for a fixed term
    set. Dataflow (no groupby shuffle at all):

    1. stats pass — per-doc (dl, tf_j, has_j) in ``map_batches``;
       materialized once (a narrow int table, orders of magnitude
       smaller than the corpus — the standard two-pass barrier).
    2. one global aggregate -> scalars N, sum_dl, df_j (tree reduce).
    3. scoring ``map_batches`` with the broadcast scalars, per-block
       partial top-k, then a single bounded merge task for the final
       ranking (ties broken by ``id_col`` ascending).
    """
    from ray.data.aggregate import Count, Sum

    from osmray.dedup import _TOKEN

    q = len(query_terms)
    tf_cols = [f"tf_{j}" for j in range(q)]
    has_cols = [f"has_{j}" for j in range(q)]

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        dl = np.zeros(n, dtype=np.int64)
        tf = np.zeros((q, n), dtype=np.int64)
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = _TOKEN.findall(t.lower())
            dl[i] = len(toks)
            if toks:
                u, c = np.unique(toks, return_counts=True)
                pos = np.searchsorted(u, query_terms)
                ok = (pos < len(u)) & (u[np.minimum(pos, len(u) - 1)] == query_terms)
                tf[ok, i] = c[pos[ok]]
        cols = {id_col: pa.array(ids), "dl": pa.array(dl)}
        for j in range(q):
            cols[tf_cols[j]] = pa.array(tf[j])
            cols[has_cols[j]] = pa.array((tf[j] > 0).astype(np.int64))
        return pa.table(cols)

    st = docs_ds.map_batches(stats, batch_format="pyarrow").materialize()
    aggs = [Count(alias_name="n"), Sum("dl", alias_name="sum_dl")]
    aggs += [Sum(c, alias_name=f"df_{j}") for j, c in enumerate(has_cols)]
    g = st.aggregate(*aggs)
    N, sum_dl = np.int64(g["n"]), np.int64(g["sum_dl"])
    df = np.array([g[f"df_{j}"] for j in range(q)], dtype=np.int64)
    idf_i = np.floor(1e6 * np.log((N - df + 0.5) / (df + 0.5) + 1.0))

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = np.zeros(len(dl), dtype=np.int64)
        for j in range(q):
            tf = batch[tf_cols[j]].to_numpy(zero_copy_only=False).astype(np.int64)
            denom = tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * ((dl * N) / sum_dl))
            milli = np.floor(idf_i[j] * (tf * (BM25_K1 + 1.0)) / denom / 1000.0)
            total += np.where(tf > 0, milli.astype(np.int64), 0)
        keep = total > 0
        out = pa.table({id_col: batch[id_col].filter(pa.array(keep)),
                        "score_milli": pa.array(total[keep])})
        # per-block partial top-k: only k rows per block reach the merge
        o = np.lexsort((out[id_col].to_numpy(zero_copy_only=False),
                        -out["score_milli"].to_numpy(zero_copy_only=False)))
        return out.take(pa.array(o[:k]))

    def rank_merge(batch: pa.Table) -> pa.Table:
        o = np.lexsort((batch[id_col].to_numpy(zero_copy_only=False),
                        -batch["score_milli"].to_numpy(zero_copy_only=False)))
        t = batch.take(pa.array(o[:k]))
        return t.append_column("rank", pa.array(np.arange(1, len(t) + 1)))

    return (st.map_batches(score, batch_format="pyarrow")
            .repartition(1)
            .map_batches(rank_merge, batch_format="pyarrow", batch_size=None))

def regex_extract(ds, col: str, pattern: str, out_cols: list[str],
                  keep: list[str] | None = None):
    """Vectorized regex capture-group extraction into new columns —
    the structured-field parser. Both this engine (pyarrow's
    ``extract_regex``) and the DuckDB twin run RE2 with
    first-match-anywhere semantics, so outputs are exact; non-matching
    rows get '' in every group (DuckDB's regexp_extract convention).
    The pattern must use named groups matching ``out_cols``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        r = pc.extract_regex(batch[col], pattern=pattern)
        cols = {k: batch[k] for k in (keep or [c for c in batch.column_names if c != col])}
        for name in out_cols:
            v = pc.struct_field(r, name)
            cols[name] = pc.fill_null(v, "")
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def tfidf_topk(ds, k: int = 3, doc_col: str = "doc_id",
               text_col: str = "text", broadcast_cap: int = 2_000_000):
    """Per-document TF-IDF keyword extraction with an EXACT integer
    score: score_milli = (tf * N * 1000) // df — rational idf (N/df)
    instead of the log form, so ranking is integer-exact and
    SQL-replayable. Postings explode per batch (vectorized unique),
    document frequency is one keyed Count fold, df attaches back via
    the two-engine policy (broadcast vocab under ``broadcast_cap``,
    grace join above), and the per-doc top-k is the sort-based fold
    (score DESC, term ASC tiebreak). Returns
    (doc_id, term, tf, df, score_milli), k rows per nonempty doc."""
    import pyarrow.compute as pc
    import ray as _ray
    from ray.data.aggregate import Count

    from osmray.dedup import _TOKEN
    from osmray.joins import bucketed_join
    from osmray.windows import grouped_topk_sorted

    n_docs = ds.count()

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch[doc_col].to_numpy(zero_copy_only=False)
        out_t, out_d, out_c = [], [], []
        for i, t in enumerate(batch[text_col].to_pylist()):
            toks = _TOKEN.findall(t.lower())
            if not toks:
                continue
            u, c = np.unique(toks, return_counts=True)
            out_t.append(u)
            out_d.append(np.full(len(u), ids[i], dtype=np.int64))
            out_c.append(c.astype(np.int64))
        if not out_t:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64())})
        return pa.table({
            "term": pa.array(np.concatenate(out_t).astype(str)),
            "doc_id": pa.array(np.concatenate(out_d)),
            "tf": pa.array(np.concatenate(out_c))})

    posts = ds.map_batches(postings, batch_format="pyarrow").materialize()
    df_tbl = posts.groupby("term").aggregate(
        Count(alias_name="df")).materialize()
    n_terms = df_tbl.count()

    if n_terms <= broadcast_cap:
        dfp = df_tbl.to_pandas()
        vocab = dfp["term"].to_numpy().astype(str)
        dfv = dfp["df"].to_numpy().astype(np.int64)
        o = np.argsort(vocab)
        ref = _ray.put((vocab[o], dfv[o]))

        def attach(batch: pa.Table, *, _ref=ref) -> pa.Table:
            voc, dv = _ray.get(_ref)
            t = batch["term"].to_numpy(zero_copy_only=False).astype(str)
            pos = np.searchsorted(voc, t)
            return batch.append_column("df", pa.array(dv[pos]))

        scored = posts.map_batches(attach, batch_format="pyarrow")
    else:
        # vocab beyond the broadcast cap: grace join on a 60-bit md5
        # key with an exact term-equality post-filter (collision-safe)
        def hkey(batch: pa.Table) -> pa.Table:
            h = np.array([int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
                          for s in batch["term"].to_pylist()], np.int64)
            return batch.append_column("tkey", pa.array(h))

        j = bucketed_join(posts.map_batches(hkey, batch_format="pyarrow"),
                          df_tbl.map_batches(hkey, batch_format="pyarrow"),
                          on="tkey", right_on="tkey")
        scored = j.map_batches(
            lambda t: t.filter(pc.equal(t["term"], t["term_r"]))
            .select(["term", "doc_id", "tf", "df"]),
            batch_format="pyarrow")

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        dfv = batch["df"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "score_milli", pa.array(tf * n_docs * 1000 // dfv))

    rows = scored.map_batches(score, batch_format="pyarrow")
    best = grouped_topk_sorted(rows, key="doc_id", val="score_milli",
                               tiebreak="term", k=k)
    return best.map_batches(
        lambda t: t.select(["doc_id", "term", "tf", "df", "score_milli"]),
        batch_format="pyarrow")


def dict_count(texts: list[str], patterns: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Multi-pattern dictionary matching over a batch of texts (the
    keyword/PII scan primitive): returns (n_matches, n_docs_with) per
    pattern, counting ALL positional occurrences. Vectorized — the
    batch concatenates into ONE byte buffer (0-separated, so matches
    never cross documents) and each pattern is a shifted-slice
    equality reduction, then per-doc sums via add.reduceat; no
    per-character Python loop. Patterns must not contain NUL."""
    bufs = [t.encode() for t in texts]
    if not bufs:
        z = np.zeros(len(patterns), np.int64)
        return z, z.copy()
    sep = b"\x00"
    joined = np.frombuffer(sep.join(bufs) + sep, dtype=np.uint8)
    # document start offsets in the joined buffer
    lens = np.array([len(b) + 1 for b in bufs], np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    n_matches = np.zeros(len(patterns), np.int64)
    n_docs = np.zeros(len(patterns), np.int64)
    for pi, p in enumerate(patterns):
        pb = np.frombuffer(p.encode(), dtype=np.uint8)
        m = len(pb)
        if m == 0 or m > len(joined):
            continue
        hit = joined[: len(joined) - m + 1] == pb[0]
        for k in range(1, m):
            hit &= joined[k: len(joined) - m + 1 + k] == pb[k]
        hits = hit.astype(np.int64)
        per_doc = np.add.reduceat(hits, np.minimum(starts, len(hits) - 1))
        per_doc[starts >= len(hits)] = 0
        n_matches[pi] = int(hits.sum())
        n_docs[pi] = int((per_doc > 0).sum())
    return n_matches, n_docs


def _doc_grams(text: str, n: int) -> np.ndarray:
    ws = text.split(" ")
    if len(ws) < n:
        return np.asarray([], dtype=object)
    return np.asarray(["\x1f".join(ws[i:i + n])
                       for i in range(len(ws) - n + 1)], dtype=object)


def boilerplate_coverage(docs, n: int = 3, min_docs: int = 2,
                         mode: str = "auto", broadcast_cap: int = 2_000_000,
                         num_buckets: int = 256):
    """Corpus-level boilerplate detection (the CCNet / RefinedWeb
    shared-template signal): a word-``n``-gram is *boilerplate* when
    it occurs in >= ``min_docs`` DISTINCT documents; each doc reports
    how many of its token positions are covered by at least one
    boilerplate-gram occurrence (``n_cov``) and the integer
    milli-rate ``boiler_mil``. Unlike n-gram novelty (count-1 grams,
    min-owner trick, no join) coverage needs the doc<->gram positions
    back, so this is the honest two-sided shape:

    - Phase 1 (both engines): block-distinct (gram, doc) pairs ->
      hashed-gram bucket shuffle -> in-group exact distinct-doc
      counts on FULL gram strings -> the boilerplate gram set.
    - Phase 2 ``broadcast``: the bp gram strings ship once via
      ray.put (sorted array, exact membership by searchsorted) and
      one per-doc pass unions the covered intervals — zero extra
      shuffles. Chosen when the bp set is <= ``broadcast_cap`` chars.
    - Phase 2 ``keyed``: occurrences (doc, pos, gram-hash) semi-join
      the bp hash set in ``num_buckets`` grace buckets, survivors
      expand to covered positions, and a packed (doc, pos) distinct
      fold counts coverage — nothing O(corpus) on the driver
      (64-bit-hash membership; collision odds ~2^-64 per pair,
      documented divergence from the string-exact broadcast path).

    Both engines are pinned equal in pytest."""
    import ray

    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    def pair_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gs, ds_ = [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            u = np.unique(_doc_grams(text, n))
            gs.extend(u.tolist())
            ds_.extend([int(did)] * len(u))
        if not gs:
            return pa.table({"b": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64())})
        h = hash_str(gs, 29)
        return pa.table({"b": pa.array(np.abs(h) % num_buckets),
                         "g": pa.array(gs, pa.string()),
                         "doc_id": pa.array(ds_, pa.int64())})

    def bp_in_group(g: pa.Table) -> pa.Table:
        gr = np.asarray(g["g"].to_pylist(), dtype=object)
        order = np.argsort(gr, kind="stable")
        gs = gr[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        gid = np.cumsum(new) - 1
        nd = np.bincount(gid).astype(np.int64)  # pairs are block-
        # distinct per doc already, but not globally — dedup exactly:
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(
            np.int64)[order]
        packed = np.stack([gid, did], axis=1)
        uniq = np.unique(packed, axis=0)
        nd = np.bincount(uniq[:, 0], minlength=len(nd)).astype(np.int64)
        keep = nd >= min_docs
        return pa.table({"g": pa.array(gs[new][keep], pa.string())})

    pairs = docs.map_batches(pair_partials, batch_format="pyarrow")
    # materialized: the auto-mode size probe and the chosen engine
    # both consume bp — without this the groupby would run twice
    bp = pairs.groupby("b").map_groups(
        bp_in_group, batch_format="pyarrow").materialize()

    eng = mode
    if mode == "auto":
        total = bp.map_batches(
            lambda b: pa.table({"c": pa.array(
                [sum(len(s) for s in b["g"].to_pylist())], pa.int64())}),
            batch_format="pyarrow").to_pandas()["c"].sum()
        eng = "broadcast" if total <= broadcast_cap else "keyed"

    def doc_base(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = np.asarray([len(t.split(" "))
                         for t in batch["text"].to_pylist()], np.int64)
        return pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(nt)})

    if eng == "broadcast":
        bps = np.sort(np.asarray(bp.to_pandas()["g"].to_numpy(),
                                 dtype=object))
        ref = ray.put(bps)

        def cover(batch: pa.Table) -> pa.Table:
            bpa = ray.get(ref)
            ids = batch["doc_id"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            nt, nc = [], []
            for text in batch["text"].to_pylist():
                ws = text.split(" ")
                grams = _doc_grams(text, n)
                cov = np.zeros(len(ws), bool)
                if len(grams) and len(bpa):
                    pos = np.searchsorted(bpa, grams)
                    pos_c = np.minimum(pos, len(bpa) - 1)
                    hit = np.flatnonzero(bpa[pos_c] == grams)
                    for k in range(n):
                        cov[hit + k] = True
                nt.append(len(ws))
                nc.append(int(cov.sum()))
            ntb = np.asarray(nt, np.int64)
            ncb = np.asarray(nc, np.int64)
            return pa.table({
                "doc_id": pa.array(ids), "n_tokens": pa.array(ntb),
                "n_cov": pa.array(ncb),
                "boiler_mil": pa.array(
                    ncb * 1_000_000 // np.maximum(ntb, 1))})

        return docs.map_batches(cover, batch_format="pyarrow")

    # keyed engine: occurrence rows (ghash bucket, ghash, doc, pos)
    # semi-join the bp hash set per bucket, survivors expand to the
    # n covered positions, distinct (doc, pos) fold, per-doc counts.
    from osmray.joins import bucketed_join

    def bp_keys(batch: pa.Table) -> pa.Table:
        h = hash_str(batch["g"].to_pylist(), 29)
        return pa.table({"gh": pa.array(h)})

    bpk = bp.map_batches(bp_keys, batch_format="pyarrow")

    def occs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gh, dd, pp = [], [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            grams = _doc_grams(text, n)
            if len(grams) == 0:
                continue
            gh.append(hash_str(grams.tolist(), 29))
            dd.append(np.full(len(grams), did, np.int64))
            pp.append(np.arange(len(grams), dtype=np.int64))
        if not gh:
            return pa.table({"gh": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        return pa.table({"gh": pa.array(np.concatenate(gh)),
                         "doc_id": pa.array(np.concatenate(dd)),
                         "pos": pa.array(np.concatenate(pp))})

    occ = docs.map_batches(occs, batch_format="pyarrow")
    hit = bucketed_join(occ, bpk, on="gh", num_buckets=num_buckets,
                        right_dedup=True, how="semi")

    def expand(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        dd = np.repeat(d, n)
        pp = (p[:, None] + np.arange(n, dtype=np.int64)).ravel()
        packed = np.unique(dd * (1 << 22) + pp)
        return pa.table({"b": pa.array(np.abs(packed) % num_buckets),
                         "pk": pa.array(packed)})

    def distinct_counts(g: pa.Table) -> pa.Table:
        pk = np.unique(g["pk"].to_numpy(zero_copy_only=False))
        d = pk >> 22
        u, cnt = np.unique(d, return_counts=True)
        return pa.table({"doc_id": pa.array(u),
                         "n_cov": pa.array(cnt.astype(np.int64))})

    cov = sorted_fold_sums(
        hit.map_batches(expand, batch_format="pyarrow")
           .groupby("b").map_groups(distinct_counts,
                                    batch_format="pyarrow"),
        "doc_id", ["n_cov"])
    base = docs.map_batches(doc_base, batch_format="pyarrow")
    joined = bucketed_join(base, cov, on="doc_id", num_buckets=8, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = pc.fill_null(batch["n_cov"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(nt), "n_cov": pa.array(nc),
            "boiler_mil": pa.array(nc * 1_000_000 // np.maximum(nt, 1))})

    return joined.map_batches(finish, batch_format="pyarrow")


def gopher_repetition(docs):
    """Within-doc repetition rules — see queries.q_gopher_rules."""

    def per_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = {"doc_id": [], "n_tokens": [], "dup2_mil": [], "top2_mil": []}
        for did, text in zip(ids, batch["text"].to_pylist()):
            ws = text.split(" ")
            lens = np.asarray([len(w) for w in ws], np.int64)
            n_chars = max(int(lens.sum()), 1)
            dup_mil = top_mil = 0
            if len(ws) >= 2:
                grams = np.asarray([f"{a}\x1f{b}"
                                    for a, b in zip(ws, ws[1:])])
                u, inv, cnt = np.unique(grams, return_inverse=True,
                                        return_counts=True)
                occ = np.flatnonzero(cnt[inv] >= 2)
                cover = np.zeros(len(ws), bool)
                cover[occ] = True
                cover[occ + 1] = True
                dup_mil = int(lens[cover].sum()) * 1_000_000 // n_chars
                cmax = int(cnt.max())
                # ties -> smallest gram: np.unique output is sorted
                g = u[np.flatnonzero(cnt == cmax)[0]]
                top_mil = cmax * (len(g) - 1) * 1_000_000 // n_chars
            out["doc_id"].append(int(did))
            out["n_tokens"].append(len(ws))
            out["dup2_mil"].append(dup_mil)
            out["top2_mil"].append(top_mil)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return docs.map_batches(per_batch, batch_format="pyarrow")


class HashedEncoderStage:
    """Batched "model inference" as a stateful actor-pool stage — the
    runtime shape of embedding-model scoring at 100 TB (model loaded
    ONCE per actor in __init__, vectorized batches in __call__), with
    a deterministic stand-in model so the result is integer-exact:
    a 64-bucket x dim weight table W[b, d] = (b * 2654435761 +
    d * 40503) % 2^32 % 2001 - 1000; token -> bucket by the char-fold
    hash; doc embedding = sum of token rows. Pass to
    ``docs.map_batches(HashedEncoderStage, concurrency=N,
    batch_size=B)``."""

    DIM = 16

    def __init__(self, dim: int = 16):
        self.dim = dim
        b = np.arange(64, dtype=np.int64)[:, None]
        d = np.arange(dim, dtype=np.int64)[None, :]
        self.W = (b * 2654435761 + d * 40503) % (1 << 32) % 2001 - 1000

    def __call__(self, batch: pa.Table) -> pa.Table:
        from osmray.queries import _char_fold_hash

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [w for ws in toks for w in ws]
        emb = np.zeros((len(ids), self.dim), np.int64)
        ntk = np.zeros(len(ids), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            rows = self.W[_char_fold_hash(u) % 64]
            for k, ws in enumerate(toks):
                ntk[k] = len(ws)
                emb[k] = rows[np.searchsorted(u, np.asarray(ws))].sum(axis=0)
        cols = {"doc_id": pa.array(ids), "n_tokens": pa.array(ntk)}
        for d in range(self.dim):
            cols[f"e{d}"] = pa.array(emb[:, d])
        return pa.table(cols)


def bpe_train(docs, rounds: int = 4):
    """Byte-pair-encoding merge training — see queries.q_bpe_train
    for the full contract (leftmost non-overlapping merges via the
    double-space replace trick, argmax tie-break count desc / pair
    asc). ``docs`` needs a ``text`` column. Returns a pyarrow Table
    (merge_rank, lhs, rhs, n) of the learned merges — O(rounds)
    rows. Scale: per-round working set is the distinct-word vocab;
    pair counts shuffle by hashed pair string, never to the driver."""
    from osmray.queries import _hashed_string_counts, _token_block_partials
    from osmray.stages import hash_str

    words = _hashed_string_counts(
        docs.map_batches(lambda b: _token_block_partials(b, False),
                         batch_format="pyarrow"), ["w"])

    def to_sym(batch: pa.Table) -> pa.Table:
        return pa.table({
            "sym": pa.array([" ".join(w) for w in batch["w"].to_pylist()]),
            "n": batch["n"]})

    vocab = words.map_batches(to_sym, batch_format="pyarrow").materialize()
    return _bpe_rounds(vocab, rounds)


def _bpe_rounds(vocab, rounds: int):
    """Shared BPE merge loop over a materialized (sym, n) vocab —
    see :func:`bpe_train`."""
    from osmray.queries import _hashed_string_counts
    from osmray.stages import hash_str
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, rounds + 1):

        def pair_partials(batch: pa.Table) -> pa.Table:
            nn = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            pairs: list[str] = []
            wts: list[int] = []
            for sym, n in zip(batch["sym"].to_pylist(), nn):
                ts = sym.split(" ")
                pairs.extend(f"{a} {b}" for a, b in zip(ts, ts[1:]))
                wts.extend([int(n)] * (len(ts) - 1))
            if not pairs:
                return pa.table({"w": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64()),
                                 "k": pa.array([], pa.int64())})
            u, inv = np.unique(np.asarray(pairs), return_inverse=True)
            cnt = np.bincount(inv, weights=np.asarray(wts, np.float64))
            return pa.table({"w": pa.array(u),
                             "cnt": pa.array(cnt.astype(np.int64)),
                             "k": pa.array(hash_str(list(u), 11))})

        pc_tab = _hashed_string_counts(
            vocab.map_batches(pair_partials, batch_format="pyarrow"), ["w"])
        best = pc_tab.sort(["n", "w"],
                           descending=[True, False]).limit(1).take(1)
        if not best:
            break
        lhs, rhs = best[0]["w"].split(" ")
        merges.append((rank, lhs, rhs, int(best[0]["n"])))
        pat, rep = f" {lhs}  {rhs} ", f" {lhs}{rhs} "

        def merge(batch: pa.Table, pat=pat, rep=rep) -> pa.Table:
            out = [(" " + s.replace(" ", "  ") + " ")
                   .replace(pat, rep).replace("  ", " ").strip()
                   for s in batch["sym"].to_pylist()]
            return pa.table({"sym": pa.array(out), "n": batch["n"]})

        vocab = vocab.map_batches(merge, batch_format="pyarrow").materialize()
    return pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "lhs": pa.array([m[1] for m in merges], pa.string()),
        "rhs": pa.array([m[2] for m in merges], pa.string()),
        "n": pa.array([m[3] for m in merges], pa.int64())})


URL_RE = (r"^([A-Za-z]+)://([^/:?#]+)(:[0-9]+)?([^?#]*)"
          r"(\?[^#]*)?(#.*)?$")

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_urls(urls: list[str]) -> list[str]:
    """Canonicalize raw URLs: lowercase scheme+host, drop the
    scheme-DEFAULT explicit port only, drop the fragment, drop
    ``utm_*`` tracking params, sort surviving params by their full
    ``k=v`` string. Unparseable strings pass through unchanged (the
    conservative frontier choice: never silently merge garbage)."""
    rx = re.compile(URL_RE)
    out = []
    for raw in urls:
        m = rx.match(raw)
        if m is None:
            out.append(raw)
            continue
        sch = m.group(1).lower()
        hst = m.group(2).lower()
        prt = m.group(3) or ""
        if _DEFAULT_PORTS.get(sch) == prt:
            prt = ""
        params = sorted(p for p in (m.group(5) or "?")[1:].split("&")
                        if p and not p.startswith("utm_"))
        q = "?" + "&".join(params) if params else ""
        out.append(f"{sch}://{hst}{prt}{m.group(4)}{q}")
    return out


def url_canon_counts(ds, url_col: str = "url"):
    """Canonicalize a URL column and count rows per canonical url —
    the crawl-dedup primitive: canonicalization is a pure per-row
    kernel (block-local, pre-aggregated per distinct canonical), the
    count is one unbounded-vocabulary hashed-string shuffle. Emits
    (url, n)."""
    from osmray.queries import _hashed_string_counts
    from osmray.stages import hash_str

    def canon(batch: pa.Table) -> pa.Table:
        out = canonicalize_urls(batch[url_col].to_pylist())
        u, inv = np.unique(np.asarray(out), return_inverse=True)
        return pa.table({"w": pa.array(u),
                         "cnt": pa.array(np.bincount(inv).astype(np.int64)),
                         "k": pa.array(hash_str(list(u), 11))})

    counted = _hashed_string_counts(
        ds.map_batches(canon, batch_format="pyarrow"), ["w"])
    return counted.map_batches(
        lambda t: t.rename_columns(["url", "n"]), batch_format="pyarrow")


def bpe_apply_merges(word: str, merges: list[tuple[str, str]]) -> int:
    """Subtoken count of ``word`` after applying learned BPE merges
    in rank order (same leftmost non-overlapping double-space scan
    the trainer used)."""
    s = " ".join(word)
    for lhs, rhs in merges:
        s = ((" " + s.replace(" ", "  ") + " ")
             .replace(f" {lhs}  {rhs} ", f" {lhs}{rhs} ")
             .replace("  ", " ").strip())
    return s.count(" ") + 1


def bpe_apply(docs, rounds: int = 4):
    """Tokenizer compression under a trained BPE vocabulary — the
    tokenizer-budget counterpart of :func:`bpe_train`: learn
    ``rounds`` merges on the corpus, then tokenize every doc with
    them. The learned merges are O(rounds) driver state, so the
    apply pass is a single fully-distributed map: per block, merges
    replay on the block-DISTINCT words only (np.unique first, like
    q_wordpiece), and per-doc counts come from a searchsorted
    gather. Emits (doc_id, n_tokens, n_subtokens)."""
    merges_tab = bpe_train(docs, rounds=rounds)
    merges = list(zip(merges_tab["lhs"].to_pylist(),
                      merges_tab["rhs"].to_pylist()))

    def per_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = [t.split(" ") for t in batch["text"].to_pylist()]
        flat = [w for ws in toks for w in ws]
        nt = np.asarray([len(ws) for ws in toks], np.int64)
        ns = np.zeros(len(ids), np.int64)
        if flat:
            u = np.unique(np.asarray(flat))
            costs = np.asarray([bpe_apply_merges(w, merges) for w in u],
                               np.int64)
            for k, ws in enumerate(toks):
                ns[k] = int(costs[np.searchsorted(u, np.asarray(ws))].sum())
        return pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(nt),
                         "n_subtokens": pa.array(ns)})

    return docs.map_batches(per_doc, batch_format="pyarrow")


def substring_dups(ds, id_col: str = "doc_id", text_col: str = "text",
                   gram_len: int = 32, stride: int = 8,
                   min_docs: int = 2):
    """Exact repeated-substring detection — the substring-level dedup
    signal ("train-data memorization" shape): every document emits
    its ``gram_len``-char grams at ``stride``; grams shuffle keyed by
    their FIRST-8-BYTES packed int64 (keys-only — the full gram rides
    as the verification payload), and one map_groups verifies
    full-gram equality per prefix group, emitting (gram, n_docs,
    n_occ) for grams shared by >= ``min_docs`` documents. No pair
    expansion anywhere — group summaries, not doc pairs, leave the
    shuffle. Extracted from q_substring_dups for declarative-step
    reuse (engine add; no counterpart in shrddr/osmml)."""
    import pyarrow as pa

    L, S = gram_len, stride

    def windows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ks, grams, docs = [], [], []
        for did, text in zip(ids, batch[text_col].to_pylist()):
            n = len(text)
            for off in range(0, n - L + 1, S):
                g = text[off:off + L]
                ks.append(int.from_bytes(g[:8].encode(), "big", signed=True))
                grams.append(g)
                docs.append(did)
        return pa.table({
            "k": pa.array(ks, pa.int64()),
            "gram": pa.array(grams, pa.string()),
            "doc_id": pa.array(docs, pa.int64())})

    def verify(g: pa.Table) -> pa.Table:
        grams = np.asarray(g["gram"].to_pylist())
        docs = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((docs, grams))
        gs, ds_ = grams[order], docs[order]
        new_gram = np.concatenate(([True], gs[1:] != gs[:-1]))
        gid = np.cumsum(new_gram) - 1
        n_occ = np.bincount(gid).astype(np.int64)
        new_pair = new_gram | np.concatenate(([True], ds_[1:] != ds_[:-1]))
        n_docs = np.bincount(gid[new_pair]).astype(np.int64)
        keep = n_docs >= min_docs
        return pa.table({
            "gram": pa.array(gs[new_gram][keep]),
            "n_docs": pa.array(n_docs[keep]),
            "n_occ": pa.array(n_occ[keep])})

    return (ds.map_batches(windows, batch_format="pyarrow")
            .groupby("k").map_groups(verify, batch_format="pyarrow"))
