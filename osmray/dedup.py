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
import pyarrow as pa

_WORDS = re.compile(r"\w+", re.UNICODE)

_MERSENNE = (1 << 61) - 1


_SHINGLE_MIX = (
    np.uint64(0x9E3779B97F4A7C15),
    np.uint64(0xC2B2AE3D27D4EB4F),
    np.uint64(0x165667B19E3779F9),
    np.uint64(0x27D4EB2F165667C5),
    np.uint64(0x85EBCA6B27D4EB4F),
)


def _token_hashes(text: str) -> np.ndarray:
    import zlib

    toks = _WORDS.findall(text.lower())
    return np.asarray(
        [zlib.crc32(t.encode()) * 2654435761 + len(t) for t in toks], dtype=np.uint64
    )


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashed k-word shingles, vectorized: per-token crc32 mixed with
    position-in-shingle constants and summed across the window."""
    th = _token_hashes(text)
    if len(th) == 0:
        th = np.asarray([np.uint64(1)], dtype=np.uint64)
    if len(th) < k:
        th = np.concatenate([th, np.full(k - len(th), np.uint64(17), dtype=np.uint64)])
    acc = np.zeros(len(th) - k + 1, dtype=np.uint64)
    for j in range(k):
        acc = acc * np.uint64(1099511628211) + th[j : len(th) - k + 1 + j] * _SHINGLE_MIX[j % 5]
    return acc


_MH_A = None
_MH_B = None


def _mh_coeffs(n: int):
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) < n:
        rng = np.random.default_rng(2024)
        _MH_A = rng.integers(1, _MERSENNE, n, dtype=np.int64).astype(np.uint64)
        _MH_B = rng.integers(0, _MERSENNE, n, dtype=np.int64).astype(np.uint64)
    return _MH_A[:n], _MH_B[:n]


def minhash_signature(text: str, n_hashes: int = 64, k: int = 3) -> np.ndarray:
    """n-permutation minhash over k-word shingles (uint64 stored as
    int64)."""
    sh = _shingle_hashes(text, k)
    a, b = _mh_coeffs(n_hashes)
    # (shingles, perms) universal hashing mod Mersenne prime
    vals = (sh[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    return vals.min(axis=0).astype(np.int64)


def minhash_bands(sig: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Band the signature for LSH: one bucket hash per band."""
    rows = len(sig) // n_bands
    s = np.asarray(sig, dtype=np.int64).astype(np.uint64)[: n_bands * rows].reshape(n_bands, rows)
    out = np.full(n_bands, 1469598103934665603, dtype=np.uint64)
    for j in range(rows):
        out = (out ^ s[:, j]) * np.uint64(1099511628211)
    return out.astype(np.int64)


def simhash64(text: str) -> np.int64:
    """64-bit simhash over word unigrams (vectorized bit voting)."""
    th = _token_hashes(text)
    if len(th) == 0:
        return np.int64(0)
    # spread crc-based token hashes across 64 bits via splitmix-ish mix
    v = th * np.uint64(0x9E3779B97F4A7C15)
    v ^= v >> np.uint64(29)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(32)
    bits = (v[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = np.uint64(0)
    sel = np.flatnonzero(votes > 0)
    for i in sel:
        out |= np.uint64(1) << np.uint64(i)
    return out.astype(np.int64)


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


def minhash_lsh_candidates(docs_ds, text_col="text", id_col="doc_id", n_hashes=64, n_bands=16, k=3):
    """shingle -> minhash -> band explode -> groupby(band, bucket) ->
    candidate pairs (a < b), deduplicated. The shuffle moves only
    (band, bucket, id) triples."""
    import pandas as pd

    def sig_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_band, out_bucket = [], [], []
        for i, t in zip(ids, texts):
            bands = minhash_bands(minhash_signature(t, n_hashes, k), n_bands)
            out_id.extend([i] * n_bands)
            out_band.extend(range(n_bands))
            out_bucket.extend(bands.tolist())
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "bucket": pa.array(out_bucket, pa.int64()),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    cand = (
        docs_ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(pairs, batch_format="pandas")
    )
    # dedup pairs discovered in multiple bands
    from ray.data.aggregate import Count

    return cand.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands_hit"))


def verify_pairs(pairs_ds, id_to_text: dict, threshold: float = 0.8, k: int = 3):
    """Exact-Jaccard verification of candidate pairs against a
    broadcast id->text lookup (small side)."""
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


def embedding_dup_pairs(emb_ds, threshold: float = 0.95, id_col="vec_id", vec_col="embedding"):
    """Embedding-cosine near-dup: all pairs (a < b) with cosine >=
    threshold. Small-side broadcast of the normalized matrix; each
    batch does one matmul against it (brute-force baseline — the
    LSH-bucketed variant is the scale path, see ann.py)."""
    import ray

    mat, ids = _normalized_matrix(emb_ds, id_col, vec_col)
    mat_ref = ray.put(mat)
    ids_ref = ray.put(ids)

    def pairs(batch: pa.Table) -> pa.Table:
        m = ray.get(mat_ref)
        all_ids = ray.get(ids_ref)
        bids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        v = _to_matrix(batch[vec_col])
        v = v / np.linalg.norm(v, axis=1, keepdims=True).clip(min=1e-12)
        sims = v @ m.T
        ai, bj = np.nonzero(sims >= threshold)
        a = bids[ai]
        b = all_ids[bj]
        keep = a < b
        return pa.table(
            {
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(sims[ai, bj][keep], pa.float64()),
            }
        )

    return emb_ds.map_batches(pairs, batch_format="pyarrow")


def _to_matrix(col) -> np.ndarray:
    lst = col.to_pylist() if hasattr(col, "to_pylist") else list(col)
    return np.asarray(lst, dtype=np.float64)


def _normalized_matrix(emb_ds, id_col, vec_col):
    df = emb_ds.select_columns([id_col, vec_col]).to_pandas()
    ids = df[id_col].to_numpy(dtype=np.int64)
    mat = np.asarray(df[vec_col].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    return mat, ids
