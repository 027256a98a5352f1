"""Approximate-nearest-neighbor over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``) and every batch does one numpy matmul against it
(vectorized, no per-row loop).

Scale path: LSH-bucketed search — random-hyperplane signatures
partition vectors into buckets; queries probe their own bucket plus
all buckets within ``probe_bits`` signature-bit flips (multi-probe),
so each query touches a small fraction of the corpus. Recall is
tunable via (n_planes, probe_bits); exactness is NOT guaranteed — the
documented trade (use brute force when k-exactness is required).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def cosine_topk(emb_ds, queries: np.ndarray, k: int = 10, id_col="vec_id", vec_col="embedding"):
    """Brute-force cosine top-k of each corpus batch against the
    (q, d) query matrix; per-batch partial top-k then a tiny global
    merge — the corpus streams, only (q * k) rows shuffle.

    Returns a Dataset of (query_id, vec_id, rank, cosine) after the
    global merge (driver-side merge of partials: q*k per block)."""
    import ray

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        sims = q @ m.T  # (q, batch)
        kk = min(k, sims.shape[1])
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        qi = np.repeat(np.arange(len(q)), kk)
        vi = top.ravel()
        return pa.table(
            {
                "query_id": pa.array(qi.astype(np.int64)),
                id_col: pa.array(ids[vi]),
                "cosine": pa.array(sims[qi, vi], pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")

    # global merge: q*k rows per block -> tiny; groupby query, take k
    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def _probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    import itertools

    masks = [0]
    for r in range(1, probe_bits + 1):
        for combo in itertools.combinations(range(n_planes), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_ann_topk(emb_ds, query_ids: np.ndarray, queries: np.ndarray, k: int = 10,
                 n_planes: int = 10, seed: int = 7, probe_bits: int = 2,
                 id_col="vec_id", vec_col="embedding"):
    """LSH-bucketed ANN, corpus-partitioned (the 100-TB path): the
    CORPUS STREAMS — each batch computes its own signatures from the
    seeded hyperplanes, keeps only vectors whose bucket is probed by
    some query (multi-probe: <= 1 + sum_{r<=probe_bits} C(n_planes, r)
    buckets per query), and emits per-batch partial top-k rows; a tiny
    (q x k per block) global merge follows. Only the QUERY matrix +
    probe table are broadcast; the corpus is never materialized or
    shipped to any single actor (contrast ``LshIndexStage``, the
    bounded-corpus variant that holds the whole index per actor).

    Candidate sets, similarities and tie-breaking match
    ``LshIndexStage`` exactly (same planes/seed/probe logic)."""
    import pandas as pd
    import ray

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, queries.shape[1]))
    qsigs = ((qn @ planes.T) > 0) @ (1 << np.arange(n_planes))
    masks = _probe_masks(n_planes, probe_bits)
    bucket2q: dict[int, list[int]] = {}
    for qi, s in enumerate(qsigs.astype(np.int64)):
        for m in masks:
            bucket2q.setdefault(int(s) ^ m, []).append(qi)
    ref = ray.put((qn, np.asarray(query_ids, dtype=np.int64), bucket2q))

    def partial(batch: pa.Table) -> pa.Table:
        q, qids, b2q = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        m = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        planes_l = np.random.default_rng(seed).standard_normal((n_planes, m.shape[1]))
        sigs = (((m @ planes_l.T) > 0) @ (1 << np.arange(n_planes))).astype(np.int64)
        out_q, out_v, out_c = [], [], []
        for sig in np.unique(sigs):
            probers = b2q.get(int(sig))
            if not probers:
                continue
            rows = np.flatnonzero(sigs == sig)
            sims = m[rows] @ q[probers].T  # (rows, probers)
            kk = min(k, len(rows))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, probers)
            for j, qi in enumerate(probers):
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_v.append(ids[rows[top[:, j]]])
                out_c.append(sims[top[:, j], j])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")

    qid_arr = np.asarray(query_ids, dtype=np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        g["query_id"] = qid_arr[g["query_id"].to_numpy()]
        return g[["query_id", id_col, "cosine", "rank"]]

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class LshIndexStage:
    """Actor-pool stage for bucketed ANN: holds hyperplanes + the
    bucketed corpus (built once per actor from a broadcast ref).
    BOUNDED-corpus variant — the whole index lives in each actor; use
    ``lsh_ann_topk`` when the corpus cannot be broadcast."""

    def __init__(self, corpus_ref, n_planes: int = 10, seed: int = 7, k: int = 10,
                 id_col="vec_id", vec_col="embedding", probe_bits: int = 2):
        import itertools

        import ray

        ids, mat = ray.get(corpus_ref)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        # multi-probe: all signature flips of <= probe_bits bits
        masks = [0]
        for r in range(1, probe_bits + 1):
            for combo in itertools.combinations(range(n_planes), r):
                m = 0
                for b in combo:
                    m |= 1 << b
                masks.append(m)
        self.probe_masks = masks
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, mat.shape[1]))
        self.norm = mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
        self.ids = ids
        sigs = self._sig(self.norm)
        order = np.argsort(sigs, kind="stable")
        self.sorted_sigs = sigs[order]
        self.order = order
        self.starts = np.searchsorted(self.sorted_sigs, np.arange(1 << n_planes))

    def _sig(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes.T) > 0
        return (bits @ (1 << np.arange(self.planes.shape[0]))).astype(np.int64)

    def _bucket(self, sig: int) -> np.ndarray:
        lo = np.searchsorted(self.sorted_sigs, sig, side="left")
        hi = np.searchsorted(self.sorted_sigs, sig, side="right")
        return self.order[lo:hi]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        q = np.asarray(batch[self.vec_col].to_pylist(), dtype=np.float64)
        q = q / np.linalg.norm(q, axis=1, keepdims=True).clip(min=1e-12)
        sigs = self._sig(q)
        out_q, out_v, out_c, out_r = [], [], [], []
        for i in range(len(q)):
            cand = [self._bucket(int(sigs[i]) ^ m) for m in self.probe_masks]
            cand = np.unique(np.concatenate(cand))
            if len(cand) == 0:
                continue
            sims = self.norm[cand] @ q[i]
            kk = min(self.k, len(cand))
            top = np.argpartition(-sims, kk - 1)[:kk]
            order = top[np.lexsort((self.ids[cand][top], -sims[top]))]
            out_q.extend([int(qids[i])] * len(order))
            out_v.extend(self.ids[cand][order].tolist())
            out_c.extend(sims[order].tolist())
            out_r.extend(range(1, len(order) + 1))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                self.id_col: pa.array(out_v, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
                "rank": pa.array(out_r, pa.int64()),
            }
        )
