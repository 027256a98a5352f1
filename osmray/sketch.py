"""Distributed cardinality sketch: HyperLogLog over a keyed stream.

The register computation uses a 62-bit splitmix-style avalanche
mixer whose every step is expressible in both engines — xor/shift on
nonnegative BIGINTs, and multiply mod 2^62 (numpy: uint64 wrap then
mask, since 2^62 divides 2^64; DuckDB: HUGEINT product % 2^62) — so
the full register table, not just the estimate, is bit-exact
reproducible in SQL (Q_HLL_SQL): bucket = low p bits, rho =
trailing-zero count of the remaining 52 bits + 1 (via lowest-set-bit,
exact in both engines). Affine/polynomial mod-prime hashes were
measured too structured for HLL (20-90% error on sequential ids);
the mixer lands 0.5-2%.

Dataflow: per-block partial registers in ``map_batches`` (numpy
lexsort + reduceat max — the shuffle moves at most groups x 2^p
tiny int rows per block), then one keyed ``groupby().aggregate(Max)``.
The estimate itself is the classic bias-corrected harmonic mean,
evaluated from the final registers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HLL_P = 10  # 2^10 = 1024 registers


HLL_MASK62 = (1 << 62) - 1
HLL_C1 = 0x2545F4914F6CDD1D & HLL_MASK62
HLL_C2 = 0x27D4EB2F165667C5 & HLL_MASK62


def hll_hash62(v: np.ndarray) -> np.ndarray:
    """62-bit avalanche hash of int64 values (splitmix-style:
    xor-shift + multiply mod 2^62, twice, + final xor-shift)."""
    h = np.asarray(v, dtype=np.int64).astype(np.uint64)
    h = ((h ^ (h >> np.uint64(31))) * np.uint64(HLL_C1)) & np.uint64(HLL_MASK62)
    h = ((h ^ (h >> np.uint64(29))) * np.uint64(HLL_C2)) & np.uint64(HLL_MASK62)
    h = h ^ (h >> np.uint64(32))
    return h.astype(np.int64)


def hll_bucket_rho(h: np.ndarray, p: int = HLL_P) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho): bucket = low p bits; rho = trailing-zero count
    of the remaining bits + 1 (rest == 0 -> 62 - p + 1)."""
    bucket = h & ((1 << p) - 1)
    rest = h >> p
    low = rest & -rest  # lowest set bit (0 when rest == 0)
    # frexp exponent of an exact power of two is k+1 — exact in f64
    k = np.frexp(low.astype(np.float64))[1] - 1
    rho = np.where(rest == 0, 62 - p + 1, k + 1).astype(np.int64)
    return bucket, rho


def hll_registers(ds, group_col: str, value_col: str, p: int = HLL_P):
    """Dataset -> (group, bucket, rho_max) register rows."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col]
        v = batch[value_col].to_numpy(zero_copy_only=False)
        bucket, rho = hll_bucket_rho(hll_hash62(v), p)
        # per-(group, bucket) max within the block: one lexsort
        gcodes, ginv = np.unique(np.asarray(g.to_pylist()), return_inverse=True)
        key = ginv * (1 << p) + bucket
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
        rmax = np.maximum.reduceat(rho[order], bounds)
        kk = ks[bounds]
        return pa.table(
            {
                group_col: pa.array(gcodes[(kk >> p).astype(np.int64)]),
                "bucket": pa.array((kk & ((1 << p) - 1)).astype(np.int64)),
                "rho": pa.array(rmax),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .aggregate(Max("rho", alias_name="rho_max"))
    )


def hll_estimate_sparse(buckets: np.ndarray, rho_max: np.ndarray, p: int = HLL_P) -> float:
    m = 1 << p
    reg = np.zeros(m, dtype=np.float64)
    reg[np.asarray(buckets, dtype=np.int64)] = np.asarray(rho_max, dtype=np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -reg))
    zeros = int((reg == 0).sum())
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting for small range
    return float(e)


# ---------------------------------------------------------------------------
# Bloom filter: the OTHER mergeable set sketch — a fixed-size bitmap
# whose per-block partials OR together, used to pre-filter the probe
# side of a semi-join before any shuffle (joins.bloom_semi_join).
#
# k=2 affine mod-prime hashes chosen so every intermediate fits in
# int64 WITHOUT wraparound ((P-1) * A < 2^47): the identical
# expression runs in DuckDB BIGINT arithmetic, so the full bitmap —
# false positives included — is bit-exact reproducible in SQL
# (Q_BLOOM_SEMI_JOIN_SQL replays it as a distinct-positions set).
# ---------------------------------------------------------------------------

BLOOM_P1, BLOOM_A1 = 2147483647, 48271  # minstd primes/multipliers
BLOOM_P2, BLOOM_A2 = 2147483629, 16807
BLOOM_M_DEFAULT = 1 << 16


def bloom_positions(keys: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """The two bit positions of each int64 key (vectorized)."""
    k = np.abs(np.asarray(keys, dtype=np.int64))
    h1 = ((k % BLOOM_P1) * BLOOM_A1 % BLOOM_P1) % m_bits
    h2 = ((k % BLOOM_P2) * BLOOM_A2 % BLOOM_P2) % m_bits
    return h1, h2


def bloom_build(ds, key_col: str, m_bits: int = BLOOM_M_DEFAULT, n_mid: int = 8) -> np.ndarray:
    """Distributed Bloom build -> boolean bitmap of ``m_bits``.

    Per-block partial bitmaps (packed ``m_bits/8``-byte payloads) OR
    together through one mid-level combine, so the driver unions at
    most ``n_mid`` fixed-size rows no matter how large the build side
    is — the sketch itself is the only thing that is ever broadcast.
    """
    nbytes = m_bits // 8

    def partial(batch: pa.Table) -> pa.Table:
        h1, h2 = bloom_positions(batch[key_col].to_numpy(zero_copy_only=False), m_bits)
        bm = np.zeros(m_bits, dtype=bool)
        bm[h1] = True
        bm[h2] = True
        return pa.table({"bm": pa.array([np.packbits(bm).tobytes()], pa.binary())})

    def or_combine(batch: pa.Table) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for b in batch["bm"]:
            acc |= np.frombuffer(b.as_py(), dtype=np.uint8)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    mid = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(n_mid)
        .map_batches(or_combine, batch_format="pyarrow", batch_size=None)
    )
    acc = np.zeros(nbytes, dtype=np.uint8)
    for row in mid.take_all():
        acc |= np.frombuffer(row["bm"], dtype=np.uint8)
    return np.unpackbits(acc).astype(bool)

def kmv_bottom_k(ds, value_col: str, k: int = 256):
    """KMV (bottom-k / k-minimum-values) distinct sketch — the
    order-statistics cousin of HLL, mergeable and fully SQL-replayable
    because it is just "the k smallest 62-bit hashes of the distinct
    values": per block unique -> hash -> partial bottom-k (<= k rows
    per block on the wire), then one bounded merge task dedupes and
    ranks. Estimator: (k-1) * 2^62 / h_k when the sketch is full,
    exact count when not (fewer than k distinct hashes seen).
    Returns (rank, h, est_distinct) — est repeated per row so the
    whole sketch, not just the estimate, is hash-checkable."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        v = np.unique(
            batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        h = hll_hash62(v)
        if len(h) > k:
            h = np.partition(h, k - 1)[:k]
        return pa.table({"h": pa.array(np.sort(h))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        h = np.unique(batch["h"].to_numpy(zero_copy_only=False))[:k]
        if len(h) == k:
            # (k-1) * 2^62 exactly representable; int64 -> f64 cast and
            # division are the same IEEE ops in numpy and DuckDB
            est = int(np.floor((k - 1) * 4611686018427387904.0 / float(h[-1])))
        else:
            est = len(h)
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(h) + 1, dtype=np.int64)),
                "h": pa.array(h),
                "est_distinct": pa.array(np.full(len(h), est, dtype=np.int64)),
            }
        )

    # bounded: <= k rows per input block reach the single merge task
    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)

def count_min(ds, value_col: str, depth: int = 4, width: int = 1024):
    """Count-Min frequency sketch: ``depth`` rows of ``width``
    counters, row j counting values by an independent mod-prime hash.
    Mergeable by plain addition, so each block emits one partial
    (d, col, n) table (bounded at depth*width rows) and a single
    bounded groupby sums them — the raw stream never shuffles.
    Point estimate of a value's frequency = min over rows of its
    counter (upper bound with standard (eps, delta) guarantees).
    Returns (d, col, n) — the whole sketch, SQL-replayable with the
    same mod-prime hashes."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    # independent enough mod-prime row hashes, HUGEINT-safe in SQL
    params = [(2147483647, 48271), (2147483629, 16807),
              (2147483563, 40692), (2147483423, 69621)][:depth]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_, cols, ns = [], [], []
        for j, (p, a) in enumerate(params):
            c = ((np.abs(v) % p) * a % p) % width
            u, n = np.unique(c, return_counts=True)
            ds_.append(np.full(len(u), j, dtype=np.int64))
            cols.append(u)
            ns.append(n.astype(np.int64))
        return pa.table({"key": pa.array(np.concatenate(ds_) * width
                                         + np.concatenate(cols)),
                         "n": pa.array(np.concatenate(ns))})

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table({"d": pa.array(k // width),
                         "col": pa.array(k % width),
                         "n": batch["n"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def kmv_intersect(a_ds, b_ds, a_col: str, b_col: str, k: int = 256):
    """KMV set-operation sketch: the k smallest 62-bit hashes of
    A UNION B, each carrying (in_a, in_b) membership flags — the
    mergeable sketch that estimates |A ∩ B| and Jaccard between two
    key sets without co-shuffling them. A hash in the union's
    bottom-k is necessarily in its own block's bottom-k on EVERY side
    that contains it, so per-block partial bottom-k (+ flag) streams
    <= k rows per block to one bounded merge that ORs flags, ranks,
    and evaluates est_intersect = n_both * est_union // k. Fully
    SQL-replayable (same avalanche hash, same IEEE estimator)."""
    import pyarrow as pa

    def partial(col: str, ina: int, inb: int):
        def f(batch: pa.Table) -> pa.Table:
            v = np.unique(batch[col].to_numpy(
                zero_copy_only=False).astype(np.int64))
            h = hll_hash62(v)
            if len(h) > k:
                h = np.partition(h, k - 1)[:k]
            h = np.sort(h)
            n = len(h)
            return pa.table({
                "h": pa.array(h),
                "ina": pa.array(np.full(n, ina, np.int64)),
                "inb": pa.array(np.full(n, inb, np.int64))})
        return f

    parts = (a_ds.map_batches(partial(a_col, 1, 0), batch_format="pyarrow")
             .union(b_ds.map_batches(partial(b_col, 0, 1),
                                     batch_format="pyarrow")))

    def merge(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False)
        ina = batch["ina"].to_numpy(zero_copy_only=False)
        inb = batch["inb"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(hs)) + 1))
        fa = np.maximum.reduceat(ina[order], bounds)
        fb = np.maximum.reduceat(inb[order], bounds)
        hu = hs[bounds]
        if len(hu) > k:
            hu, fa, fb = hu[:k], fa[:k], fb[:k]
        n = len(hu)
        if n == k:
            est_u = int(np.floor(
                (k - 1) * 4611686018427387904.0 / float(hu[-1])))
        else:
            est_u = n
        n_both = int((fa & fb).sum())
        est_i = n_both * est_u // max(n, 1)
        return pa.table({
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "h": pa.array(hu),
            "in_a": pa.array(fa.astype(np.int64)),
            "in_b": pa.array(fb.astype(np.int64)),
            "est_union": pa.array(np.full(n, est_u, np.int64)),
            "n_both": pa.array(np.full(n, n_both, np.int64)),
            "est_intersect": pa.array(np.full(n, est_i, np.int64))})

    return parts.repartition(1).map_batches(merge, batch_format="pyarrow",
                                            batch_size=None)
