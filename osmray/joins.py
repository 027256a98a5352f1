"""Join strategies, chosen by side size (SURVEY §2.5 + ray_guide):

- ``broadcast_filter``   — semi/anti join when one side is a bounded
  KEY SET (sampling limits, canvas-bounded painted sets): ``ray.put``
  the sorted key array once, ``np.isin`` inside ``map_batches``.
  No shuffle. (Used throughout pipeline.py.)
- ``large_join``         — both sides large: Ray's hash-partitioned
  ``Dataset.join`` (shuffles both sides on the key).
- ``bucketed_join``      — the portable explicit variant: add
  ``bucket = hash(key) % B`` to both sides, tag, union, group by
  bucket, pandas-merge per bucket. Same shuffle shape, no dependence
  on Dataset.join; B and skew handling are explicit (salt hot keys by
  raising B).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from osmray.stages import hash64


def broadcast_filter(ds, key_col: str, keys: np.ndarray, anti: bool = False):
    """Semi (or anti) join against a broadcast key set."""
    import ray

    ref = ray.put(np.sort(np.asarray(keys, dtype=np.int64)))

    def f(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False)
        hit = np.isin(k, ray.get(ref))
        return batch.filter(pa.array(~hit if anti else hit))

    return ds.map_batches(f, batch_format="pyarrow")


def large_join(left, right, on: str, right_on: str | None = None, how: str = "inner",
               num_partitions: int = 16):
    """Hash-partitioned join of two large Datasets (Ray-native)."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucketed_join(left, right, on: str, right_on: str | None = None, num_buckets: int = 32):
    """Explicit partitioned hash join: bucket both sides, one keyed
    shuffle, vectorized pandas merge per bucket. Inner join."""
    import pandas as pd

    right_on = right_on or on

    def add_bucket(col):
        def f(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.append_column(
                "__bucket", pa.array(np.abs(hash64(k, 77)) % num_buckets)
            )

        return f

    lt = left.map_batches(add_bucket(on), batch_format="pyarrow").map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    # align schemas for union: rename the right key onto its own column set
    rt = right.map_batches(add_bucket(right_on), batch_format="pyarrow").map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )

    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]

    int_cols = set()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][lcols + ["__bucket"]].dropna(axis=1, how="all")
        rg = g[g["__side"] == 1][rcols].dropna(axis=1, how="all")
        if len(lg) == 0 or len(rg) == 0:
            return pd.DataFrame()
        out = lg.drop(columns="__bucket").merge(
            rg, left_on=on, right_on=right_on, how="inner", suffixes=("", "_r")
        )
        # null-padding for the union turns int columns float; restore
        for c in out.columns:
            if c in int_cols and str(out[c].dtype).startswith("float"):
                out[c] = out[c].astype(np.int64)
        return out

    # tag-and-union needs identical schemas: pad each side with the
    # other's columns as nulls
    def pad(cols_missing):
        def f(batch: pa.Table) -> pa.Table:
            for c, typ in cols_missing:
                batch = batch.append_column(c, pa.nulls(len(batch), typ))
            return batch

        return f

    lschema = {f.name: f.type for f in left.schema().base_schema}
    rschema = {f.name: f.type for f in right.schema().base_schema}
    for name, typ in list(lschema.items()) + list(rschema.items()):
        if pa.types.is_integer(typ):
            int_cols.add(name)
    lt = lt.map_batches(pad([(c, t) for c, t in rschema.items() if c not in lschema]),
                        batch_format="pyarrow")
    rt = rt.map_batches(pad([(c, t) for c, t in lschema.items() if c not in rschema]),
                        batch_format="pyarrow")
    # column order must match for union
    all_cols = sorted(set(lschema) | set(rschema)) + ["__bucket", "__side"]
    lt = lt.select_columns(all_cols)
    rt = rt.select_columns(all_cols)
    return lt.union(rt).groupby("__bucket").map_groups(merge, batch_format="pandas")
