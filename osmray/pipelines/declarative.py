"""Spec-driven pipelines: ``run_pipeline(steps)`` compiles a list of
plain dicts onto chained Ray Data operations (the engine twin of the
reference's script-per-task surface, make_*.py — SURVEY §2.10).

A step is ``{"op": <name>, ...params}``. Ops map 1:1 onto the
engine's existing kernels — this module adds NO new semantics, only
the declarative composition surface:

    [
      {"op": "read_parquet", "path": ".../images/*.parquet"},
      {"op": "assign_tiles", "z": 19, "provider": "maxar"},
      {"op": "edge_filter", "edge": 16},
      {"op": "select", "columns": ["image_id", "tile_key"]},
      {"op": "limit", "n": 1000},
      {"op": "write_lancelike", "out": "/data/out", "part_col": "part_id"},
    ]

``run_pipeline`` returns the final Dataset (or the lineage DataFrame
for a terminal write). Specs are JSON-serializable, so jobs can ship
as config — `python -m osmray pipeline --spec job.json`.
"""

from __future__ import annotations

import glob as _glob
from typing import Any, Callable

import numpy as np
import pyarrow as pa

Stage = Callable[[Any], Any]


def _read_parquet(p: dict) -> Stage:
    import ray.data

    def s(ds):
        assert ds is None, "read_parquet must be the first step"
        files = sorted(_glob.glob(p["path"]))
        if not files:
            raise FileNotFoundError(f"no files match {p['path']}")
        return ray.data.read_parquet(files, columns=p.get("columns"))

    return s


def _assign_tiles(p: dict) -> Stage:
    from osmray.stages import make_assign_tiles
    from osmray.tilemath import MAXAR, PLAIN

    scheme = {"plain": PLAIN, "maxar": MAXAR}[p.get("provider", "plain")]
    fn = make_assign_tiles(int(p.get("z", 19)), scheme, int(p.get("edge", 16)))

    def s(ds):
        return ds.map_batches(fn, batch_format="pyarrow")

    return s


def _edge_filter(p: dict) -> Stage:
    edge = int(p.get("edge", 16))

    def s(ds):
        import pyarrow.compute as pc

        def f(batch: pa.Table) -> pa.Table:
            ok = (
                pc.and_(
                    pc.and_(
                        pc.greater_equal(batch["rx"], edge),
                        pc.less(batch["rx"], 256 - edge),
                    ),
                    pc.and_(
                        pc.greater_equal(batch["ry"], edge),
                        pc.less(batch["ry"], 256 - edge),
                    ),
                )
            )
            return batch.filter(ok)

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _filter_compare(p: dict) -> Stage:
    """{"op": "filter", "column": c, "cmp": "==|!=|<|<=|>|>=", "value": v}"""
    import pyarrow.compute as pc

    ops = {
        "==": pc.equal, "!=": pc.not_equal, "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal,
    }
    cmp_fn = ops[p.get("cmp", "==")]
    col, val = p["column"], p["value"]

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            return batch.filter(cmp_fn(batch[col], val))

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _select(p: dict) -> Stage:
    cols = list(p["columns"])

    def s(ds):
        return ds.select_columns(cols)

    return s


def _limit(p: dict) -> Stage:
    n = int(p["n"])

    def s(ds):
        return ds.limit(n)

    return s


def _sort(p: dict) -> Stage:
    keys = p["keys"] if isinstance(p["keys"], list) else [p["keys"]]
    desc = p.get("descending", False)

    def s(ds):
        return ds.sort(keys, descending=desc)

    return s


def _groupby_agg(p: dict) -> Stage:
    """{"op": "groupby_agg", "key": k, "aggs": [{"fn": "sum|count|min|max",
    "column": c?, "as": name}]}"""
    from ray.data.aggregate import Count, Max, Min, Sum

    fns = {"sum": Sum, "count": Count, "min": Min, "max": Max}

    def s(ds):
        aggs = []
        for a in p["aggs"]:
            cls = fns[a["fn"]]
            if a["fn"] == "count":
                aggs.append(cls(alias_name=a["as"]))
            else:
                aggs.append(cls(a["column"], alias_name=a["as"]))
        return ds.groupby(p["key"]).aggregate(*aggs)

    return s


def _add_cell(p: dict) -> Stage:
    from osmray import cells as cellmod

    z = int(p.get("z", 19))
    res = int(p.get("res", 8))
    out = p.get("as", "cell")

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            tx = batch["tx"].to_numpy(zero_copy_only=False)
            ty = batch["ty"].to_numpy(zero_copy_only=False)
            c = cellmod.cell_of_tile(tx, ty, z, res)
            return batch.append_column(out, pa.array(c.astype(np.int64)))

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _write_lancelike(p: dict) -> Stage:
    from osmray import lancelike

    def s(ds):
        return lancelike.write_dataset(
            ds, p["out"], part_col=p.get("part_col", "part_id"),
            sort_key=p.get("sort_key"),
        )

    return s


STAGES: dict[str, Callable[[dict], Stage]] = {
    "read_parquet": _read_parquet,
    "assign_tiles": _assign_tiles,
    "edge_filter": _edge_filter,
    "filter": _filter_compare,
    "select": _select,
    "limit": _limit,
    "sort": _sort,
    "groupby_agg": _groupby_agg,
    "add_cell": _add_cell,
    "write_lancelike": _write_lancelike,
}


def run_pipeline(steps: list[dict], ds=None):
    """Compile + run a step list; returns the last step's result."""
    out = ds
    for i, step in enumerate(steps):
        op = step.get("op")
        if op not in STAGES:
            raise ValueError(f"step {i}: unknown op {op!r} (have {sorted(STAGES)})")
        out = STAGES[op](step)(out)
    return out
