"""Deduplication operators over documents / embeddings / images:

- exact          content-hash groupby, first-writer-wins
- minhash + LSH  shingle -> minhash -> banded bucket groupby -> verify
- simhash        64-bit near-dup signature + hamming bucketing
- ngram jaccard  exact verification kernel for candidate pairs
- embedding      cosine-threshold near-dup pairs
- phash          image exact/near dup on the input table's phash column

All are Ray-Data-first: signatures are computed in ``map_batches``
(vectorized / compiled-regex per batch), candidate generation is a
``groupby`` on (band, bucket) keys — the only shuffle — and the final
verification is per-group. Designed so the shuffle payload is keys +
signatures only, never the full text/image bytes.
"""

from __future__ import annotations

import re

import numpy as np

from osmray.joins import spill_block_name
import pyarrow as pa

# ---------------------------------------------------------------------------
# Hash kernels — every constant and every intermediate is chosen so the
# SAME arithmetic is expressible in int64 DuckDB SQL (Q_SIMHASH_SQL /
# Q_MINHASH_LSH_SQL in osmray/queries.py hash-check these end-to-end):
# ASCII tokenization (RE2-compatible), dual polynomial token hashes mod
# a 31-bit prime combined into one 62-bit value, shingle / permutation /
# band arithmetic all mod the same prime with products < 2^62.
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"[a-z0-9_]+")  # over lower(text); ASCII = RE2-safe

HASH_MOD = (1 << 31) - 1  # 31-bit prime: a*b < 2^62 stays in int64
HASH_B1 = 257
HASH_B2 = 263
TOKEN_CLIP = 64  # hash at most this many chars per token (SQL: substr)
_SHINGLE_MIX = (1000003, 999983, 999979, 999961, 999959)
_BAND_R = 1000033  # band-bucket polynomial base
_PAD_EMPTY = 1  # token-hash padding: no-token doc -> [1]
_PAD_SHORT = 17  # then pad to >= k with 17s (never hit on testdata)


def _tokens(text: str) -> list[str]:
    return [t[:TOKEN_CLIP] for t in _TOKEN.findall(text.lower())]


def _pow_table(base: int, n: int) -> np.ndarray:
    out = np.empty(max(n, 1), dtype=np.int64)
    out[0] = 1
    for i in range(1, len(out)):
        out[i] = (out[i - 1] * base) % HASH_MOD
    return out


def _token_hash_concat(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All texts' token hashes as ONE vectorized pass: returns
    (tokens-per-text, concat h1, concat h62) where
    h1 = polynomial hash of the token's chars base HASH_B1 mod
    HASH_MOD (== the SQL list_reduce (acc*B + ord) % M) and
    h62 = h1 * 2^31 + h2 (base HASH_B2) — a 62-bit combined hash."""
    tok_lists = [_tokens(t) for t in texts]
    lens = np.asarray([len(lst) for lst in tok_lists], dtype=np.int64)
    all_toks = [t for lst in tok_lists for t in lst]
    if not all_toks:
        z = np.zeros(0, dtype=np.int64)
        return lens, z, z
    bl = np.asarray([len(t) for t in all_toks], dtype=np.int64)
    C = np.frombuffer("".join(all_toks).encode("ascii"), dtype=np.uint8).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(bl)[:-1]))
    off = np.arange(len(C), dtype=np.int64) - np.repeat(starts, bl)
    pidx = np.repeat(bl, bl) - 1 - off  # power of the char's position
    mx = int(bl.max())
    pw1 = _pow_table(HASH_B1, mx)
    pw2 = _pow_table(HASH_B2, mx)
    # term < 255 * 2^31; per-token sum over <= TOKEN_CLIP taps < 2^45
    h1 = np.add.reduceat(C * pw1[pidx], starts) % HASH_MOD
    h2 = np.add.reduceat(C * pw2[pidx], starts) % HASH_MOD
    return lens, h1, h1 * (1 << 31) + h2


def _token_hashes(text: str) -> np.ndarray:
    """62-bit combined token hashes of one text."""
    _, _, h62 = _token_hash_concat([text])
    return h62


def _padded_h1(h1: np.ndarray, k: int) -> np.ndarray:
    if len(h1) == 0:
        h1 = np.asarray([_PAD_EMPTY], dtype=np.int64)
    if len(h1) < k:
        h1 = np.concatenate([h1, np.full(k - len(h1), _PAD_SHORT, dtype=np.int64)])
    return h1


def _shingles_from_h1(h1pad: np.ndarray, k: int) -> np.ndarray:
    """k-token shingle hashes from the padded h1 stream: sum of
    position-mixed products mod the prime (products < 2^51)."""
    acc = np.zeros(len(h1pad) - k + 1, dtype=np.int64)
    for j in range(k):
        acc = (acc + (h1pad[j : len(h1pad) - k + 1 + j] * _SHINGLE_MIX[j % 5]) % HASH_MOD) % HASH_MOD
    return acc


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    _, h1, _ = _token_hash_concat([text])
    return _shingles_from_h1(_padded_h1(h1, k), k)


_MH_A = None
_MH_B = None


def _mh_coeffs(n: int):
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) < n:
        rng = np.random.default_rng(2024)
        _MH_A = rng.integers(1, HASH_MOD, n, dtype=np.int64)
        _MH_B = rng.integers(0, HASH_MOD, n, dtype=np.int64)
    return _MH_A[:n], _MH_B[:n]


def minhash_signature(text: str, n_hashes: int = 64, k: int = 3) -> np.ndarray:
    """n-permutation minhash over k-token shingles: universal hashing
    (a*sh + b) mod the 31-bit prime (products < 2^62: int64-safe)."""
    sh = _shingle_hashes(text, k)
    a, b = _mh_coeffs(n_hashes)
    vals = (sh[:, None] * a[None, :] + b[None, :]) % HASH_MOD
    return vals.min(axis=0)


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Band the signature for LSH: one bucket value per band — the
    band's rows combined with a polynomial mod the prime."""
    rows = len(sig) // n_bands
    s = np.asarray(sig, dtype=np.int64)[: n_bands * rows].reshape(n_bands, rows)
    rp = _pow_table(_BAND_R, rows)[::-1].copy()  # R^(rows-1) .. R^0
    return ((s * rp[None, :]) % HASH_MOD).sum(axis=1) % HASH_MOD


def simhash64(text: str) -> np.int64:
    """62-bit simhash over word unigrams (bit-majority vote of the
    62-bit combined token hashes; name kept for API stability)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return np.int64(0)
    v = th.astype(np.uint64)
    bits = (v[:, None] >> np.arange(62, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    weights = np.uint64(1) << np.arange(62, dtype=np.uint64)
    return np.int64(((votes > 0).astype(np.uint64) * weights).sum(dtype=np.uint64))


def batch_shingles(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All texts' k-token shingle hashes as ONE set of vector ops
    over the concatenated (per-doc padded) token stream; returns
    (per-doc shingle counts, concatenated shingle values)."""
    if not len(texts):
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    lens, h1, _ = _token_hash_concat(texts)
    # per-doc padded h1 streams, concatenated (padding per doc keeps
    # shingles from crossing doc boundaries)
    parts = []
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    for i in range(len(lens)):
        parts.append(_padded_h1(h1[starts[i] : starts[i] + lens[i]], k))
    plens = np.asarray([len(p) for p in parts], dtype=np.int64)
    H = np.concatenate(parts)
    n = len(H)
    acc = np.zeros(n - k + 1, dtype=np.int64)
    for j in range(k):
        acc = (acc + (H[j : n - k + 1 + j] * _SHINGLE_MIX[j % 5]) % HASH_MOD) % HASH_MOD
    tok_starts = np.concatenate(([0], np.cumsum(plens)[:-1]))
    n_sh = plens - k + 1  # >= 1 by padding
    total = int(n_sh.sum())
    sh_off = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    pos = (np.arange(total) - np.repeat(sh_off, n_sh)) + np.repeat(tok_starts, n_sh)
    return n_sh, acc[pos]


def minhash_signatures(texts, n_hashes: int = 64, k: int = 3) -> np.ndarray:
    """Batch minhash: identical output to ``minhash_signature`` per
    text, computed as ONE set of vector ops over the concatenated
    token stream (reduceat per doc)."""
    if not len(texts):
        return np.zeros((0, n_hashes), dtype=np.int64)
    n_sh, sh = batch_shingles(texts, k)
    sh_off = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    a, b = _mh_coeffs(n_hashes)
    vals = (sh[:, None] * a[None, :] + b[None, :]) % HASH_MOD
    return np.minimum.reduceat(vals, sh_off, axis=0)


def minhash_bands_batch(sigs: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """(n, n_hashes) signatures -> (n, n_bands) bucket values;
    identical per row to ``minhash_bands``."""
    rows = sigs.shape[1] // n_bands
    s = np.asarray(sigs, dtype=np.int64)[:, : n_bands * rows].reshape(len(sigs), n_bands, rows)
    rp = _pow_table(_BAND_R, rows)[::-1].copy()
    return ((s * rp[None, None, :]) % HASH_MOD).sum(axis=2) % HASH_MOD


def simhash64_batch(texts) -> np.ndarray:
    """Batch simhash: identical per text to ``simhash64``, one
    reduceat over the concatenated token stream."""
    out = np.zeros(len(texts), dtype=np.int64)
    if not len(texts):
        return out
    lens, _, h62 = _token_hash_concat(texts)
    nonempty = np.flatnonzero(lens > 0)
    if len(nonempty) == 0:
        return out
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    keep = np.concatenate(
        [np.arange(starts[i], starts[i] + lens[i]) for i in nonempty]
    )
    v = h62[keep].astype(np.uint64)
    bits = ((v[:, None] >> np.arange(62, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    offs = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
    votes = 2 * np.add.reduceat(bits, offs, axis=0) - lens[nonempty][:, None]
    weights = np.uint64(1) << np.arange(62, dtype=np.uint64)
    sig = ((votes > 0).astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = sig.astype(np.int64)
    return out


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the verification kernel behind
    MinHash candidates."""
    sa = set(_shingle_hashes(a, k).tolist())
    sb = set(_shingle_hashes(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# Ray pipelines
# ---------------------------------------------------------------------------


def exact_dedup(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """groupby(md5(text)) -> min(id) survivor + duplicate count.
    Returns a Dataset with (doc_id, n_dups)."""
    from osmray.text import md5_hex

    def add_hash(batch: pa.Table) -> pa.Table:
        return batch.append_column("content_md5", pa.array(md5_hex(batch[text_col].to_pylist())))

    from ray.data.aggregate import Count, Min

    hashed = docs_ds.map_batches(add_hash, batch_format="pyarrow").select_columns(
        ["content_md5", id_col]
    )
    return hashed.groupby("content_md5").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


N_PAIR_SHARDS = 64


def _sharded_bucket_pairs(sig_ds, id_col: str, max_bucket: int):
    """(band, bucket, id) rows -> candidate pair Dataset (a, b).

    Buckets are hashes, so grouping directly on (band, bucket) makes
    one Ray group per mostly-singleton bucket (~1 Python call per
    group — the map_groups-per-tiny-group trap), and even a sharded
    ``groupby`` pays a full sort shuffle for what is mere hash
    repartitioning. Instead signature rows SPILL into
    ``bucket % N_PAIR_SHARDS`` shard files straight from
    ``map_batches`` (the grace pattern — no Ray shuffle), and one
    task per shard handles thousands of buckets at once with one
    lexsort + run detection; only runs of >= 2 ids emit pairs.
    Buckets larger than ``max_bucket`` are DROPPED (logged) — an
    uncapped hot bucket emits O(n^2) pairs in one task, the classic
    LSH skew failure."""
    import glob as _glob
    import logging
    import os

    import pyarrow.parquet as pq
    import ray.data

    from osmray.joins import _resolve_spill

    log = logging.getLogger("osmray.dedup")
    spill = _resolve_spill(None, "lshshard")

    def spill_shards(batch: pa.Table) -> pa.Table:
        sh = (
            batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
            % np.uint64(N_PAIR_SHARDS)
        ).astype(np.int64)
        order = np.argsort(sh, kind="stable")
        batch = batch.take(pa.array(order))
        ss = sh[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ss)) + 1, [len(ss)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"s={int(ss[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"{spill_block_name()}.parquet")
            pq.write_table(batch.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"s": int(ss[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    sig_ds.map_batches(spill_shards, batch_format="pyarrow", batch_size=None).count()

    def pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        for s in batch["s"].to_pylist():
            files = sorted(_glob.glob(os.path.join(spill, f"s={s}", "block-*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            band = t["band"].to_numpy(zero_copy_only=False)
            bucket = t["bucket"].to_numpy(zero_copy_only=False)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, bucket, band))
            band, bucket, ids = band[order], bucket[order], ids[order]
            new_run = np.concatenate(
                ([True], (np.diff(band.astype(np.int64)) != 0) | (np.diff(bucket) != 0))
            )
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.concatenate((starts, [len(ids)])))
            for st, n in zip(starts[lens >= 2], lens[lens >= 2]):
                run = np.unique(ids[st : st + n])
                if len(run) < 2:
                    continue
                if len(run) > max_bucket:
                    log.warning(
                        "dropping degenerate LSH bucket: %d ids > max_bucket=%d "
                        "(raise n_bands/band width or max_bucket)", len(run), max_bucket
                    )
                    continue
                ai, bi = np.triu_indices(len(run), k=1)
                out_a.append(run[ai])
                out_b.append(run[bi])
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
            }
        )

    shards = ray.data.from_items([{"s": s} for s in range(N_PAIR_SHARDS)])
    return shards.map_batches(pairs, batch_format="pyarrow", batch_size=4)


def minhash_lsh_candidates(docs_ds, text_col="text", id_col="doc_id", n_hashes=64,
                           n_bands=16, k=3, max_bucket=64):
    """shingle -> minhash -> band explode -> groupby(band, bucket) ->
    candidate pairs (a < b), deduplicated. The shuffle moves only
    (band, bucket, id) triples; buckets over ``max_bucket`` ids are
    dropped (logged) instead of exploding quadratically."""

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        bands = minhash_bands_batch(
            minhash_signatures(batch[text_col].to_pylist(), n_hashes, k), n_bands
        )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, n_bands)),
                "band": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), len(ids))
                ),
                "bucket": pa.array(bands.ravel()),
            }
        )

    cand = _sharded_bucket_pairs(
        docs_ds.map_batches(sig_rows, batch_format="pyarrow"), id_col, max_bucket
    )
    # dedup pairs discovered in multiple bands
    from ray.data.aggregate import Count

    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands_hit"))


def verify_pairs(pairs_ds, id_to_text: dict, threshold: float = 0.8, k: int = 3):
    """Exact-Jaccard verification of candidate pairs against a
    broadcast id->text lookup — the SMALL-corpus convenience variant
    (the dict must fit in the object store). For unbounded corpora use
    ``verify_pairs_joined``, which never materializes the documents."""
    import ray

    ref = ray.put(id_to_text)

    def check(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        jac = np.asarray([ngram_jaccard(lut[x], lut[y], k) for x, y in zip(a, b)])
        t = batch.append_column("jaccard", pa.array(jac))
        return t.filter(pa.array(jac >= threshold))

    return pairs_ds.map_batches(check, batch_format="pyarrow")


def verify_pairs_joined(pairs_ds, docs_ds, text_col="text", id_col="doc_id",
                        threshold: float = 0.8, k: int = 3, num_buckets: int = 16):
    """Distributed exact-Jaccard verification: the candidate pairs are
    joined back to the documents table on ``a`` then ``b`` (grace hash
    join — the documents spill bucketed from ``map_batches``, only the
    small pair table shuffles), then each joined row is verified.
    No driver-side id->text materialization anywhere."""

    from osmray.joins import bucketed_join

    if pairs_ds.schema(fetch_if_missing=True) is None:  # zero candidates
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "n_bands_hit": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        )
    docs = docs_ds.select_columns([id_col, text_col])

    def _rename(old: str, new: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [new if c == old else c for c in batch.schema.names]
            )

        return f

    # the docs spill is built ONCE and probed by both id columns
    from osmray.joins import _resolve_spill

    spill = _resolve_spill(None, "verify")
    j1 = bucketed_join(pairs_ds, docs, on="a", right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill)
    j1 = j1.map_batches(_rename(text_col, "__text_a"), batch_format="pyarrow").drop_columns(
        [id_col]
    )
    j2 = bucketed_join(j1, docs, on="b", right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill, prebuilt=True)

    def check(batch: pa.Table) -> pa.Table:
        ta = batch["__text_a"].to_pylist()
        tb = batch[text_col].to_pylist()
        jac = np.asarray([ngram_jaccard(x, y, k) for x, y in zip(ta, tb)])
        t = (
            batch.drop_columns(["__text_a", text_col, id_col])
            .append_column("jaccard", pa.array(jac))
        )
        return t.filter(pa.array(jac >= threshold))

    return j2.map_batches(check, batch_format="pyarrow")


def _srp_planes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Shared signed-random-projection hyperplanes (seeded, so every
    task derives the same planes without any broadcast)."""
    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def embedding_dup_pairs(emb_ds, threshold: float = 0.95, id_col="vec_id", vec_col="embedding",
                        mode: str = "auto", n_bands: int = 8, band_bits: int = 8,
                        seed: int = 7, n_groups: int = 16, max_bucket: int = 256):
    """Embedding-cosine near-dup: pairs (a < b) with cosine >=
    threshold, as (a, b, cosine). Two distributed modes, neither of
    which materializes the corpus on the driver or broadcasts it:

    - ``lsh`` (default for threshold >= 0.8, the 100-TB path):
      signed-random-projection band signatures per vector (seeded
      planes — computed in ``map_batches``, keys-only shuffle of
      (band, bucket, id)), capped bucket pair-gen, then the candidate
      pairs join their two vectors back via the grace hash join and
      verify exact cosine. Recall < 1 by LSH nature; tunable via
      (n_bands, band_bits).
    - ``exact`` (default below 0.8, where LSH prefilters pass almost
      nothing): distributed all-pairs grid — vectors spill into
      ``n_groups`` hash groups straight from ``map_batches`` (no
      shuffle) and one task per group-pair does the cross matmul.
      O(N^2 / n_groups) per task: exact, for bounded corpora only.
    """
    if mode == "auto":
        mode = "lsh" if threshold >= 0.8 else "exact"
    if mode == "exact":
        return _embedding_pairs_grid(emb_ds, threshold, id_col, vec_col, n_groups)

    n_bits = n_bands * band_bits

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        v = _to_matrix(batch[vec_col])
        planes = _srp_planes(v.shape[1], n_bits, seed)
        bits = (v @ planes.T) > 0  # (n, n_bits)
        w = (np.uint64(1) << np.arange(band_bits, dtype=np.uint64))[None, None, :]
        bucket = (
            (bits.reshape(len(ids), n_bands, band_bits).astype(np.uint64) * w)
            .sum(axis=2, dtype=np.uint64)
            .astype(np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, n_bands)),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), len(ids))),
                "bucket": pa.array(bucket.ravel()),
            }
        )

    cand = _sharded_bucket_pairs(
        emb_ds.map_batches(sig_rows, batch_format="pyarrow"), id_col, max_bucket
    )
    from ray.data.aggregate import Count

    cand = cand.groupby(["a", "b"]).aggregate(Count(alias_name="__nb"))
    return _verify_vector_pairs(cand, emb_ds, threshold, id_col, vec_col)


def _verify_vector_pairs(pairs_ds, emb_ds, threshold, id_col, vec_col, num_buckets: int = 32):
    """Join each candidate pair's two vectors back (grace hash join —
    vectors spill bucketed, only the pair table shuffles) and keep
    exact cosine >= threshold."""

    from osmray.joins import bucketed_join

    vecs = emb_ds.select_columns([id_col, vec_col])

    def _rename(old: str, new: str):
        def f(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [new if c == old else c for c in batch.schema.names]
            )

        return f

    # the vector spill is built ONCE and probed by both id columns
    from osmray.joins import _resolve_spill

    spill = _resolve_spill(None, "vverify")
    j1 = bucketed_join(pairs_ds, vecs, on="a", right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill)
    j1 = j1.map_batches(_rename(vec_col, "__vec_a"), batch_format="pyarrow").drop_columns(
        [id_col]
    )
    j2 = bucketed_join(j1, vecs, on="b", right_on=id_col, num_buckets=num_buckets,
                       spill_root=spill, prebuilt=True)

    def check(batch: pa.Table) -> pa.Table:
        va = _to_matrix(batch["__vec_a"])
        vb = _to_matrix(batch[vec_col])
        va = va / np.linalg.norm(va, axis=1, keepdims=True).clip(min=1e-12)
        vb = vb / np.linalg.norm(vb, axis=1, keepdims=True).clip(min=1e-12)
        cos = (va * vb).sum(axis=1)
        t = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "cosine": pa.array(cos, pa.float64()),
            }
        )
        return t.filter(pa.array(cos >= threshold))

    return j2.map_batches(check, batch_format="pyarrow")


def _embedding_pairs_grid(emb_ds, threshold, id_col, vec_col, n_groups):
    """Exact distributed all-pairs: spill vectors into hash groups
    from ``map_batches`` (no shuffle), then one task per group-pair
    (gi <= gj) cross-matmuls the two spilled groups."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    from osmray.joins import _resolve_spill

    spill = _resolve_spill(None, "embgrid")

    def spill_groups(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        g = (ids % n_groups).astype(np.int64)
        order = np.argsort(g, kind="stable")
        batch = batch.take(pa.array(order))
        gs = g[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(gs)) + 1, [len(gs)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"g={int(gs[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"{spill_block_name()}.parquet")
            pq.write_table(batch.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"g": int(gs[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    emb_ds.select_columns([id_col, vec_col]).map_batches(
        spill_groups, batch_format="pyarrow", batch_size=None
    ).count()

    def _load(g: int):
        files = sorted(glob.glob(os.path.join(spill, f"g={g}", "block-*.parquet")))
        if not files:
            return np.zeros(0, dtype=np.int64), np.zeros((0, 1))
        t = pa.concat_tables([pq.read_table(f) for f in files])
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        m = _to_matrix(t[vec_col])
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        return ids, m

    def cross(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for gi, gj in zip(batch["gi"].to_pylist(), batch["gj"].to_pylist()):
            ia, ma = _load(gi)
            ib, mb = (ia, ma) if gi == gj else _load(gj)
            if not len(ia) or not len(ib):
                continue
            sims = ma @ mb.T
            ai, bj = np.nonzero(sims >= threshold)
            a, b = ia[ai], ib[bj]
            c = sims[ai, bj]
            if gi == gj:
                keep = a < b  # upper triangle within a group
                a, b, c = a[keep], b[keep], c[keep]
            else:
                # cross-group: each unordered pair is seen exactly once
                # (in the task of its two groups) — normalize (a < b)
                a, b = np.minimum(a, b), np.maximum(a, b)
            out_a.append(a)
            out_b.append(b)
            out_c.append(c)
        if not out_a:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    grid = [
        {"gi": gi, "gj": gj}
        for gi in range(n_groups)
        for gj in range(gi, n_groups)
    ]
    return ray.data.from_items(grid).map_batches(
        cross, batch_format="pyarrow", batch_size=1
    )


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix, zero-copy
    flatten+reshape when rows are uniform (300x the to_pylist path);
    ragged input falls back to the slow path."""
    if not hasattr(col, "to_pylist"):
        return np.asarray(list(col), dtype=np.float64)
    import pyarrow.compute as pc

    try:
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        lens = pc.list_value_length(c).to_numpy(zero_copy_only=False)
        if len(lens) == 0:
            return np.zeros((0, 1))
        if (lens == lens[0]).all():
            flat = pc.list_flatten(c).to_numpy(zero_copy_only=False)
            return flat.reshape(len(lens), int(lens[0])).astype(np.float64, copy=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        pass
    return np.asarray(col.to_pylist(), dtype=np.float64)




def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of an int64 array."""
    b = np.ascontiguousarray(x.astype(np.int64)).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(b, axis=1).sum(axis=1).astype(np.int64)


SIMHASH_BITS = 62


def hamming_pairs(sigs_ds, max_hamming: int = 4, id_col: str = "doc_id",
                  sig_col: str = "simhash", n_bits: int = 62,
                  max_pairs_per_shard: int | None = None):
    """EXACT hamming near-dup pairs over ANY precomputed int64
    signature column (simhash, image phash, ...) by pigeonhole
    multi-index banding.

    The ``n_bits``-bit signature splits into ``max_hamming + 1``
    disjoint bit bands; a pair within ``max_hamming`` differing bits
    cannot differ in every band, so it MUST collide on at least one
    whole band — banded candidate generation therefore has recall 1.0
    and the operator is exact. Because the signature itself is only 8
    bytes, it travels WITH the (band, bucket, id) spill rows and the
    exact popcount verification happens INSIDE the pair-generation
    task — only true pairs (plus the tiny band-dedup groupby) ever
    shuffle, never the candidate set. On a low-diversity corpus whose
    bands collide heavily (the worst case), candidates stay local
    numpy xors instead of a cross-task join of millions of rows.

    No bucket-size cap: dropping a hot bucket would break exactness.
    A corpus of near-identical items degenerates to its honest
    all-pairs popcount cost inside the shard tasks. For such
    pathological corpora ``max_pairs_per_shard`` is a LOUD guard, not
    a silent drop: when any shard's candidate-pair count would exceed
    it, the task raises with a skew diagnosis (shard, hottest
    band/bucket run, projected pair count) instead of grinding —
    exactness is never traded for progress."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    from osmray.joins import _resolve_spill

    n_bands = max_hamming + 1
    base = n_bits // n_bands
    extra = n_bits % n_bands
    widths = [base + (1 if b < extra else 0) for b in range(n_bands)]
    offs = np.concatenate(([0], np.cumsum(widths)[:-1]))

    sigs_ds = sigs_ds.select_columns([id_col, sig_col])
    spill = _resolve_spill(None, "hampairs")

    def spill_shards(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"s": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        sg = batch[sig_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = sg.view(np.uint64)
        n = len(ids)
        band = np.tile(np.arange(n_bands, dtype=np.int64), n)
        bucket = np.stack(
            [
                ((u >> np.uint64(offs[b])) & np.uint64((1 << widths[b]) - 1)).astype(np.int64)
                for b in range(n_bands)
            ],
            axis=1,
        ).ravel()
        rid = np.repeat(ids, n_bands)
        rsig = np.repeat(sg, n_bands)
        # mix band in with a multiplier coprime to N_PAIR_SHARDS so
        # narrow bands (3-4 bits) still spread across all shards; the
        # key depends only on (band, bucket) so groups stay intact
        sh = (bucket + band * 2654435761) % N_PAIR_SHARDS
        order = np.argsort(sh, kind="stable")
        t = pa.table(
            {"band": pa.array(band[order]), "bucket": pa.array(bucket[order]),
             "id": pa.array(rid[order]), "sig": pa.array(rsig[order])}
        )
        ss = sh[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ss)) + 1, [len(ss)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(spill, f"s={int(ss[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"{spill_block_name()}.parquet")
            pq.write_table(t.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"s": int(ss[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    sigs_ds.map_batches(spill_shards, batch_format="pyarrow", batch_size=None).count()

    def pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_h = [], [], []
        cand_pairs = 0
        for sh in batch["s"].to_pylist():
            files = sorted(_glob.glob(os.path.join(spill, f"s={sh}", "block-*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            band = t["band"].to_numpy(zero_copy_only=False)
            bucket = t["bucket"].to_numpy(zero_copy_only=False)
            ids = t["id"].to_numpy(zero_copy_only=False)
            sig = t["sig"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, bucket, band))
            band, bucket, ids, sig = band[order], bucket[order], ids[order], sig[order]
            new_run = np.concatenate(
                ([True], (np.diff(band) != 0) | (np.diff(bucket) != 0))
            )
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.concatenate((starts, [len(ids)])))
            for st, n in zip(starts[lens >= 2], lens[lens >= 2]):
                rid = ids[st : st + n]
                rsig = sig[st : st + n]
                keep = np.concatenate(([True], np.diff(rid) != 0))  # ids sorted in run
                rid, rsig = rid[keep], rsig[keep]
                if len(rid) < 2:
                    continue
                m = len(rid)
                cand_pairs += m * (m - 1) // 2
                if max_pairs_per_shard is not None and cand_pairs > max_pairs_per_shard:
                    raise RuntimeError(
                        f"hamming_pairs: shard {sh} exceeds max_pairs_per_shard="
                        f"{max_pairs_per_shard} (>= {cand_pairs} candidate pairs; "
                        f"hottest run band={int(band[st])} bucket={int(bucket[st])} "
                        f"holds {m} distinct ids). The corpus is degenerate for "
                        f"banded hamming (near-identical signatures collapse into "
                        f"one bucket): dedup exact-equal signatures first, raise "
                        f"the cap, or accept the all-pairs cost with cap=None."
                    )
                ai, bi = np.triu_indices(len(rid), k=1)
                h = _popcount64(rsig[ai] ^ rsig[bi])
                ok = h <= max_hamming
                if ok.any():
                    out_a.append(rid[ai[ok]])
                    out_b.append(rid[bi[ok]])
                    out_h.append(h[ok])
        if not out_a:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_h)),
            }
        )

    shards = ray.data.from_items([{"s": x} for x in range(N_PAIR_SHARDS)])
    verified = shards.map_batches(pairs, batch_format="pyarrow", batch_size=4)
    # a qualifying pair can surface from several bands: dedup (tiny —
    # only true pairs reach here)
    from ray.data.aggregate import Min

    out = verified.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))
    if out.schema(fetch_if_missing=True) is None:  # zero pairs anywhere
        return ray.data.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "hamming": pa.array([], pa.int64())}
            )
        )
    return out


def simhash_hamming_pairs(docs_ds, max_hamming: int = 4, text_col: str = "text",
                          id_col: str = "doc_id"):
    """hamming_pairs over the 62-bit text simhash (hash-checked vs a
    DuckDB all-pairs bit_count(xor) twin, q_simhash_pairs)."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        sigs = simhash64_batch(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col], "simhash": pa.array(sigs)})

    sigs_ds = docs_ds.map_batches(sig_batch, batch_format="pyarrow")
    return hamming_pairs(sigs_ds, max_hamming, id_col=id_col, sig_col="simhash",
                         n_bits=SIMHASH_BITS)


def decontaminate_counts(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                         held_mod: int = 10, k: int = 3, mode: str = "auto",
                         broadcast_max: int = 50_000_000):
    """Train/test decontamination (reference has no counterpart; a
    core LLM-pipeline op): documents with ``id % held_mod == 0`` play
    the held-out set; every TRAIN document reports how many of its
    DISTINCT k-token shingles appear anywhere in the held-out set.
    Returns a Dataset of (id_col, n_hits) covering every train doc
    (zero-hit docs included).

    Two regimes, pinned equal by tests:

    - ``broadcast`` — collect the held-out DISTINCT shingle set to
      the driver once and ``ray.put`` it; right for benchmark-sized
      held-out sides (the real decontamination case: the held-out
      benchmark is tiny next to the training corpus). The per-batch
      overlap is fully vectorized: one lexsort makes the per-doc
      shingle streams unique, one ``np.isin`` + ``bincount`` counts
      hits — no per-doc Python loop.
    - ``keyed`` — corpus-shaped held-out sides: the held-out shingle
      stream spills keys-only via ``joins.bucketed_filter`` (grace
      semi-join, NO driver collect); surviving (doc, shingle) pairs
      reduce with one keyed ``groupby``. Two keys-only shuffles
      total, nothing unbounded on the driver.

    ``auto`` counts the held-out distinct shingles first (keys-only
    aggregate) and flips to ``keyed`` above ``broadcast_max``."""
    import ray

    def train_sel(ids: np.ndarray) -> np.ndarray:
        return np.flatnonzero(ids % held_mod != 0)

    def held_sel(ids: np.ndarray) -> np.ndarray:
        return np.flatnonzero(ids % held_mod == 0)

    def held_shingles(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = held_sel(ids)
        if not len(sel):
            return pa.table({"sh": pa.array([], pa.int64())})
        _, sh = batch_shingles(batch[text_col].take(pa.array(sel)).to_pylist(), k)
        return pa.table({"sh": pa.array(np.unique(sh))})

    held_ds = docs_ds.map_batches(held_shingles, batch_format="pyarrow")

    if mode == "auto":
        # keys-only distinct count decides the regime; cheap next to
        # the overlap pass it steers
        n_held = held_ds.groupby("sh").count().count()
        mode = "broadcast" if n_held <= broadcast_max else "keyed"

    def train_doc_shingles(batch: pa.Table):
        """(per-doc-unique shingle stream, doc index row map)."""
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = train_sel(ids)
        if not len(sel):
            return ids, sel, np.zeros(0, np.int64), np.zeros(0, np.int64)
        n_sh, sh = batch_shingles(batch[text_col].take(pa.array(sel)).to_pylist(), k)
        d = np.repeat(np.arange(len(sel)), n_sh)
        order = np.lexsort((sh, d))
        ds_, shs = d[order], sh[order]
        first = np.ones(len(shs), dtype=bool)
        first[1:] = (ds_[1:] != ds_[:-1]) | (shs[1:] != shs[:-1])
        return ids, sel, ds_[first], shs[first]

    if mode == "broadcast":
        held = np.unique(held_ds.to_pandas()["sh"].to_numpy())
        ref = ray.put(held)

        def overlap(batch: pa.Table) -> pa.Table:
            hs = ray.get(ref)
            ids, sel, du, shu = train_doc_shingles(batch)
            if not len(sel):
                return pa.table(
                    {id_col: pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
                )
            hit = np.isin(shu, hs, assume_unique=False)
            hits = np.bincount(du[hit], minlength=len(sel)).astype(np.int64)
            return pa.table({id_col: pa.array(ids[sel]), "n_hits": pa.array(hits)})

        return docs_ds.map_batches(overlap, batch_format="pyarrow")

    from osmray.joins import bucketed_filter

    def train_pairs(batch: pa.Table) -> pa.Table:
        ids, sel, du, shu = train_doc_shingles(batch)
        if not len(sel):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sh": pa.array([], pa.int64())}
            )
        return pa.table({id_col: pa.array(ids[sel][du]), "sh": pa.array(shu)})

    def zero_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sel = train_sel(ids)
        return pa.table(
            {id_col: pa.array(ids[sel]), "n": pa.array(np.zeros(len(sel), np.int64))}
        )

    pairs = docs_ds.map_batches(train_pairs, batch_format="pyarrow")
    hit = bucketed_filter(pairs, held_ds, on="sh")

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch[id_col], "n": pa.array(np.ones(len(batch), np.int64))}
        )

    # zero-hit train docs ride a column-pruned ids-only scan (cheap),
    # keeping the corpus text scan count at two (held spill + pairs)
    zero = docs_ds.select_columns([id_col]).map_batches(zero_rows, batch_format="pyarrow")
    counts = hit.map_batches(ones, batch_format="pyarrow").union(zero).groupby(id_col).sum("n")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hits": batch["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) dedup — the storage/corpus dedup
# primitive robust to insertions (fixed-stride grams shift, CDC
# boundaries re-synchronize): boundaries where an 8-char rolling
# polynomial hash (base 131 mod 2^31-1, the same char-fold family the
# SQL twins replay) satisfies h % mask_mod == 0.

_CDC_MOD = 2147483647
_CDC_B = 131


def _cdc_chunks(text: str, window: int = 8,
                mask_mod: int = 64) -> list[str]:
    """Split ``text`` at content-defined boundaries; '' -> []."""
    L = len(text)
    if L == 0:
        return []
    if L < window:
        return [text]
    cp = np.frombuffer(text.encode("utf-32-le"), np.uint32).astype(np.int64)
    h = np.zeros(L - window + 1, np.int64)
    for k in range(window):
        h = (h * _CDC_B + cp[k:L - window + 1 + k]) % _CDC_MOD
    # boundary AFTER 0-based end index j  ->  cut position j+1
    cuts = np.flatnonzero(h % mask_mod == 0) + window
    cuts = np.unique(np.concatenate(([0], cuts, [L])))
    return [text[a:b] for a, b in zip(cuts[:-1], cuts[1:])]


def cdc_chunk_dups(docs, window: int = 8, mask_mod: int = 64,
                   num_buckets: int = 256):
    """Per-doc CDC dedup stats: chunk the text content-defined, call a
    chunk *duplicated* when it occurs in >= 2 DISTINCT documents, and
    report (n_chunks, n_dup occurrences, dup_mil) per doc. Scale
    shape == the novelty fold: per-block per-doc chunk counts shuffle
    keyed by a bounded |hash| % num_buckets bucket (full chunk strings
    ride for EXACT equality), each group sees all occurrences of its
    chunks, emits per-doc dup partials — group summaries, never doc
    pairs — and a keyed integer fold + one grace left join attach the
    stateless per-doc totals. Nothing corpus-sized on the driver."""
    from osmray.joins import bucketed_join
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ch, dd, cc = [], [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            u, cnt = np.unique(np.asarray(
                _cdc_chunks(text, window, mask_mod), dtype=object),
                return_counts=True)
            ch.extend(u.tolist())
            dd.extend([int(did)] * len(u))
            cc.extend(cnt.astype(np.int64).tolist())
        if not ch:
            return pa.table({"b": pa.array([], pa.int64()),
                             "ch": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({
            "b": pa.array(np.abs(hash_str(ch, 41)) % num_buckets),
            "ch": pa.array(ch, pa.string()),
            "doc_id": pa.array(dd, pa.int64()),
            "c": pa.array(cc, pa.int64())})

    def dup_in_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_dup": pa.array([], pa.int64())})
        ch = np.asarray(g["ch"].to_pylist(), dtype=object)
        did = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ch, kind="stable")
        cs, ds_, cc = ch[order], did[order], c[order]
        new = np.concatenate(([True], cs[1:] != cs[:-1]))
        gid = np.cumsum(new) - 1
        # distinct docs per chunk (rows are per-block per-doc, so a
        # doc may appear twice per chunk — dedup exactly)
        pair = np.unique(np.stack([gid, ds_], axis=1), axis=0)
        nd = np.bincount(pair[:, 0], minlength=gid[-1] + 1)
        dup = nd[gid] >= 2
        u, inv = np.unique(ds_[dup], return_inverse=True)
        return pa.table({
            "doc_id": pa.array(u),
            "n_dup": pa.array(np.bincount(
                inv, weights=cc[dup]).astype(np.int64))})

    occ = docs.map_batches(partials, batch_format="pyarrow")
    dups = sorted_fold_sums(
        occ.groupby("b").map_groups(dup_in_group, batch_format="pyarrow"),
        "doc_id", ["n_dup"])

    def base(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = np.asarray([len(_cdc_chunks(t, window, mask_mod))
                         for t in batch["text"].to_pylist()], np.int64)
        return pa.table({"doc_id": pa.array(ids), "n_chunks": pa.array(nc)})

    joined = bucketed_join(
        docs.map_batches(base, batch_format="pyarrow"), dups,
        on="doc_id", num_buckets=8, how="left")

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nc = batch["n_chunks"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = pc.fill_null(batch["n_dup"].combine_chunks(), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_chunks": pa.array(nc), "n_dup": pa.array(nd),
            "dup_mil": pa.array(nd * 1_000_000 // np.maximum(nc, 1))})

    return joined.map_batches(finish, batch_format="pyarrow")
