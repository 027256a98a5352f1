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

from osmray.dedup import _to_matrix


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
        m = _to_matrix(batch[vec_col])
        m = m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        sims = q @ m.T  # (q, batch)
        kk = min(k, sims.shape[1])
        # deterministic (cosine desc, id asc) partial top-k: exact
        # boundary ties resolve the same way in every candidate pool,
        # so partials compose identically under repartitioning
        top = np.stack([np.lexsort((ids, -sims[i]))[:kk] for i in range(len(q))])
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
    return _merge_topk(partials, None, k, id_col)


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
        m = _to_matrix(batch[vec_col])
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
    return _merge_topk(partials, query_ids, k, id_col)


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
        q = _to_matrix(batch[self.vec_col])
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: distributed k-means -> coarse lists -> probe
# ---------------------------------------------------------------------------


def _merge_topk(partials, query_ids, k: int, id_col: str):
    """Tiny global merge shared by the ANN variants: per-block partial
    top-k rows (q * k per block) -> final (query_id, vec_id, cosine,
    rank) with (cosine desc, id asc) tie-breaking. Arrow-native —
    no pandas hop in the merge. ``query_ids`` of None keeps the
    positional query index; an array remaps it to caller ids."""
    qid_arr = None if query_ids is None else np.asarray(query_ids, dtype=np.int64)

    def merge(g: pa.Table) -> pa.Table:
        cos = g["cosine"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        sel = np.lexsort((ids, -cos))[:k]
        out = g.take(pa.array(sel))
        if qid_arr is not None:
            qi = qid_arr[out["query_id"].to_numpy(zero_copy_only=False)]
            out = out.set_column(
                out.schema.get_field_index("query_id"), "query_id", pa.array(qi)
            )
        return out.append_column(
            "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int64))
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)


def kmeans_fit(emb_ds, n_centroids: int = 16, n_iters: int = 5,
               id_col="vec_id", vec_col="embedding") -> np.ndarray:
    """Distributed spherical k-means (Lloyd's on the unit sphere) —
    the IVF coarse quantizer. Everything that crosses the wire is
    O(n_centroids * dim):

    - init: the ``n_centroids`` vectors with the smallest (mixed id
      hash, id) pair — per-block partial candidates (<= n_centroids
      rows each), one mid-level combine, tiny driver merge;
      deterministic and partition-independent (the id tie-break makes
      hash collisions immaterial), no RNG, no corpus pass beyond the
      streaming read;
    - each iteration: ONE streaming pass — ``map_batches`` emits
      per-centroid partial (count, sum-vector-bytes) rows, a bounded
      combine tree reduces them, the driver renormalizes. Empty
      clusters keep their previous centroid.

    Deterministic given the block partitioning (init is RNG-free and
    assignment ties break by centroid index); across DIFFERENT
    partitionings the centroids agree to summation-order float noise
    (~1e-15), which the pytest pins.

    Returns the (n_centroids, dim) unit-norm centroid matrix."""
    import ray

    def cand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"h": pa.array([], pa.int64()), "id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.binary())})
        m = _to_matrix(batch[vec_col])
        h = (ids * 2654435761) % (1 << 32)
        top = np.lexsort((ids, h))[:n_centroids]
        return pa.table(
            {
                "h": pa.array(h[top]),
                "id": pa.array(ids[top]),
                "vec": pa.array([m[i].tobytes() for i in top], pa.binary()),
            }
        )

    cands = emb_ds.map_batches(cand, batch_format="pyarrow").take_all()
    cands.sort(key=lambda r: (r["h"], r["id"]))
    seeds = cands[:n_centroids]
    cent = _norm_rows(np.stack([np.frombuffer(r["vec"], dtype=np.float64) for r in seeds]))
    dim = cent.shape[1]

    for _ in range(n_iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _to_matrix(batch[vec_col])
            if len(m) == 0:
                return pa.table(
                    {"list_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64()),
                     "acc": pa.array([], pa.binary())}
                )
            mn = _norm_rows(m)
            a = np.argmax(mn @ c.T, axis=1)
            order = np.argsort(a, kind="stable")
            asrt = a[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(asrt)) + 1, [len(asrt)]))
            lids, cnts, accs = [], [], []
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                lids.append(int(asrt[lo]))
                cnts.append(hi - lo)
                accs.append(mn[order[lo:hi]].sum(axis=0).tobytes())
            return pa.table(
                {"list_id": pa.array(lids, pa.int64()), "cnt": pa.array(cnts, pa.int64()),
                 "acc": pa.array(accs, pa.binary())}
            )

        def combine(batch: pa.Table) -> pa.Table:
            lid = batch["list_id"].to_numpy(zero_copy_only=False)
            cnt = batch["cnt"].to_numpy(zero_copy_only=False)
            if len(lid) == 0:
                return batch
            acc = np.stack(
                [np.frombuffer(b, dtype=np.float64) for b in batch["acc"].to_pylist()]
            )
            order = np.argsort(lid, kind="stable")
            ls = lid[order]
            bounds = np.concatenate(([0], np.flatnonzero(np.diff(ls)) + 1, [len(ls)]))
            lids, cnts, accs = [], [], []
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                lids.append(int(ls[lo]))
                cnts.append(int(cnt[order[lo:hi]].sum()))
                accs.append(acc[order[lo:hi]].sum(axis=0).tobytes())
            return pa.table(
                {"list_id": pa.array(lids, pa.int64()), "cnt": pa.array(cnts, pa.int64()),
                 "acc": pa.array(accs, pa.binary())}
            )

        parts = (
            emb_ds.map_batches(partial, batch_format="pyarrow")
            .repartition(4)
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        new = cent.copy()
        agg: dict[int, tuple[int, np.ndarray]] = {}
        for r in parts:
            n0, s0 = agg.get(r["list_id"], (0, np.zeros(dim)))
            agg[r["list_id"]] = (n0 + r["cnt"], s0 + np.frombuffer(r["acc"], dtype=np.float64))
        for lid, (n, s) in agg.items():
            if n > 0:
                new[lid] = s / n
        cent = _norm_rows(new)
    return cent


def ivf_ann_topk(emb_ds, query_ids: np.ndarray, queries: np.ndarray,
                 centroids: np.ndarray, k: int = 10, n_probe: int = 4,
                 id_col="vec_id", vec_col="embedding"):
    """IVF ANN, corpus-streaming: each batch assigns its vectors to
    coarse lists (one matmul against the broadcast centroids), keeps
    only vectors whose list is probed by some query (each query
    probes its ``n_probe`` nearest centroid lists), and emits partial
    top-k rows; a tiny global merge follows. Only the query matrix +
    centroid matrix + list->queries table are broadcast."""
    import ray

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    nprobe = min(n_probe, len(cn))
    qsims = qn @ cn.T
    probe = np.argsort(-qsims, axis=1, kind="stable")[:, :nprobe]
    list2q: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for lid in probe[qi]:
            list2q.setdefault(int(lid), []).append(qi)
    ref = ray.put((qn, cn, list2q))

    def partial(batch: pa.Table) -> pa.Table:
        q, c, l2q = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        empty = pa.table(
            {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
        if len(ids) == 0:
            return empty
        m = _norm_rows(_to_matrix(batch[vec_col]))
        a = np.argmax(m @ c.T, axis=1)
        out_q, out_v, out_c = [], [], []
        for lid in np.unique(a):
            probers = l2q.get(int(lid))
            if not probers:
                continue
            rows = np.flatnonzero(a == lid)
            sims = m[rows] @ q[probers].T
            kk = min(k, len(rows))
            rids = ids[rows]
            for j, qi in enumerate(probers):
                # deterministic (cosine desc, id asc) boundary ties
                sel = np.lexsort((rids, -sims[:, j]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_v.append(rids[sel])
                out_c.append(sims[sel, j])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial, batch_format="pyarrow")
    return _merge_topk(partials, query_ids, k, id_col)


def ivf_partition(emb_ds, centroids: np.ndarray, root: str | None = None,
                  id_col="vec_id", vec_col="embedding") -> str:
    """Materialize the IVF layout: vectors spill into one directory
    per coarse list straight from ``map_batches`` (the grace pattern —
    no shuffle), giving a STANDING index searches read selectively.
    Returns the layout root."""
    import os
    import uuid

    import pyarrow.parquet as pq
    import ray

    from osmray.joins import _resolve_spill

    root = _resolve_spill(root, "ivf")
    cref = ray.put(_norm_rows(np.asarray(centroids, dtype=np.float64)))

    def spill(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"list_id": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        m = _norm_rows(_to_matrix(batch[vec_col]))
        a = np.argmax(m @ c.T, axis=1)
        order = np.argsort(a, kind="stable")
        asrt = a[order]
        t = batch.take(pa.array(order))
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(asrt)) + 1, [len(asrt)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            d = os.path.join(root, f"list={int(asrt[lo])}")
            os.makedirs(d, exist_ok=True)
            dst = os.path.join(d, f"block-{uuid.uuid4().hex}.parquet")
            pq.write_table(t.slice(lo, hi - lo), dst + ".tmp")
            os.replace(dst + ".tmp", dst)
            recs.append({"list_id": int(asrt[lo]), "rows": hi - lo})
        return pa.Table.from_pylist(recs)

    emb_ds.map_batches(spill, batch_format="pyarrow", batch_size=None).count()
    return root


def ivf_search_partitioned(root: str, query_ids: np.ndarray, queries: np.ndarray,
                           centroids: np.ndarray, k: int = 10, n_probe: int = 4,
                           id_col="vec_id", vec_col="embedding"):
    """Search the materialized IVF layout: one task per PROBED list
    reads only that list's fragments (<= q * n_probe lists touched —
    the selective-read path a standing 100-TB index wants). Results
    match ``ivf_ann_topk`` exactly (same assignment, probes and
    tie-breaking)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    qn = _norm_rows(np.asarray(queries, dtype=np.float64))
    cn = _norm_rows(np.asarray(centroids, dtype=np.float64))
    nprobe = min(n_probe, len(cn))
    probe = np.argsort(-(qn @ cn.T), axis=1, kind="stable")[:, :nprobe]
    list2q: dict[int, list[int]] = {}
    for qi in range(len(qn)):
        for lid in probe[qi]:
            list2q.setdefault(int(lid), []).append(qi)
    qref = ray.put(qn)

    def search(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        out_q, out_v, out_c = [], [], []
        for lid, probers_json in zip(batch["list_id"].to_pylist(), batch["probers"].to_pylist()):
            probers = [int(x) for x in probers_json]
            files = sorted(glob.glob(os.path.join(root, f"list={lid}", "block-*.parquet")))
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f, columns=[id_col, vec_col]) for f in files])
            ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
            m = _norm_rows(_to_matrix(t[vec_col]))
            sims = m @ q[probers].T
            kk = min(k, len(ids))
            for j, qi in enumerate(probers):
                # deterministic (cosine desc, id asc) boundary ties —
                # matches ivf_ann_topk's in-task selection exactly
                sel = np.lexsort((ids, -sims[:, j]))[:kk]
                out_q.append(np.full(kk, qi, dtype=np.int64))
                out_v.append(ids[sel])
                out_c.append(sims[sel, j])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_v)),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )

    work = ray.data.from_items(
        [{"list_id": lid, "probers": qis} for lid, qis in sorted(list2q.items())]
    )
    partials = work.map_batches(search, batch_format="pyarrow", batch_size=1)
    return _merge_topk(partials, query_ids, k, id_col)


def mutual_nn(emb_ds, id_col: str = "vec_id", vec_col: str = "embedding",
              cap: int = 2_000_000):
    """Mutual nearest neighbors (see queries.q_mutual_nn): integer
    milli-quantized dot-product NN per vector from one broadcast-
    matrix pass (loud ``cap``; IVF is the scale path), then the
    vectorized involution filter nn[nn[a]] == a, emitted once per
    pair with a < b."""
    import ray

    import pyarrow as pa

    if emb_ds.count() > cap:
        raise ValueError(f"mutual_nn brute engine caps at {cap} vectors; "
                         "use the IVF-partitioned layout for more")
    df = emb_ds.to_pandas()
    ids = df[id_col].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    M = np.floor(np.stack(df[vec_col].to_numpy()[order]
                          ).astype(np.float64) * 1000).astype(np.int64)
    ref = ray.put((ids, M))

    def nn_of(batch: pa.Table) -> pa.Table:
        aids, amat = ray.get(ref)
        vid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        q = np.floor(np.stack([np.asarray(e, np.float64)
                               for e in batch[vec_col].to_pylist()])
                     * 1000).astype(np.int64)
        dots = q @ amat.T
        self_pos = np.searchsorted(aids, vid)
        dots[np.arange(len(vid)), self_pos] = -(np.int64(1) << 40)
        rank = np.arange(len(aids), dtype=np.int64)
        best = np.argmax(dots * np.int64(len(aids)) - rank, axis=1)
        return pa.table({"a": pa.array(vid), "nb": pa.array(aids[best])})

    nn = emb_ds.map_batches(nn_of, batch_format="pyarrow").to_pandas()
    a = nn["a"].to_numpy().astype(np.int64)
    nb = nn["nb"].to_numpy().astype(np.int64)
    o = np.argsort(a)
    a, nb = a[o], nb[o]
    pos = np.searchsorted(a, nb)
    mutual = (a[pos] == nb) & (nb[pos] == a) & (a < nb)
    import ray.data

    return ray.data.from_arrow(pa.table({"a": pa.array(a[mutual]),
                                         "b": pa.array(nb[mutual])}))


def hard_negatives(emb_ds, id_col: str = "vec_id",
                   vec_col: str = "embedding", label_col: str = "label",
                   cap: int = 2_000_000):
    """Hard-negative mining for contrastive training: for every
    vector, the single MOST-similar vector with a DIFFERENT label
    (milli-quantized integer dot product — bit-stable order, exact in
    DuckDB doubles below 2^53; ties -> smaller neighbor id). Engine:
    one broadcast of the quantized matrix + labels with a loud
    ``cap`` (the scale path is the ivf_partition layout), vectorized
    int64 matmul per batch, same-label entries masked before the
    rank-packed argmax. Emits (vec_id, label, neg_id, neg_label,
    sim)."""
    import ray
    import ray.data

    if emb_ds.count() > cap:
        raise ValueError(f"hard_negatives brute engine caps at {cap} "
                         "vectors; use the IVF-partitioned layout for more")
    df = emb_ds.to_pandas()
    ids = df[id_col].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    labels = df[label_col].to_numpy().astype(np.int64)[order]
    M = np.floor(np.stack(df[vec_col].to_numpy()[order]
                          ).astype(np.float64) * 1000).astype(np.int64)
    ref = ray.put((ids, labels, M))

    def per_batch(batch: pa.Table) -> pa.Table:
        aids, albl, amat = ray.get(ref)
        vid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lbl = batch[label_col].to_numpy(
            zero_copy_only=False).astype(np.int64)
        q = np.floor(np.stack([np.asarray(e, np.float64)
                               for e in batch[vec_col].to_pylist()])
                     * 1000).astype(np.int64)
        dots = q @ amat.T  # int64-exact
        sims = dots.copy()
        dots[lbl[:, None] == albl[None, :]] = -(np.int64(1) << 40)
        rank = np.arange(len(aids), dtype=np.int64)
        best = np.argmax(dots * np.int64(len(aids)) - rank, axis=1)
        rows = np.arange(len(vid))
        return pa.table({
            "vec_id": pa.array(vid),
            "label": pa.array(lbl),
            "neg_id": pa.array(aids[best]),
            "neg_label": pa.array(albl[best]),
            "sim": pa.array(sims[rows, best])})

    return emb_ds.map_batches(per_batch, batch_format="pyarrow")
