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


def _quality_stats(p: dict) -> Stage:
    from osmray.text import quality_stats

    def s(ds):
        return ds.map_batches(
            lambda t: quality_stats(t, p.get("text_col", "text")),
            batch_format="pyarrow",
        )

    return s


def _lang_id(p: dict) -> Stage:
    from osmray.text import lang_id

    col = p.get("text_col", "text")

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "lang_pred", pa.array(lang_id(batch[col].to_pylist()), pa.string())
            )

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _fingerprint(p: dict) -> Stage:
    from osmray.text import rolling_fingerprint

    col = p.get("text_col", "text")

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "fingerprint", pa.array(rolling_fingerprint(batch[col].to_pylist()))
            )

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _simhash(p: dict) -> Stage:
    from osmray.dedup import simhash64_batch

    col = p.get("text_col", "text")

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "simhash", pa.array(simhash64_batch(batch[col].to_pylist()))
            )

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _redact(p: dict) -> Stage:
    from osmray.text import redact_pii

    col = p.get("text_col", "text")

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            red = redact_pii(batch[col].to_pylist())
            idx = batch.schema.get_field_index(col)
            return batch.set_column(idx, col, pa.array(red, pa.string()))

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _exact_dedup(p: dict) -> Stage:
    from osmray.dedup import exact_dedup

    def s(ds):
        return exact_dedup(ds, text_col=p.get("text_col", "text"),
                           id_col=p.get("id_col", "doc_id"))

    return s


def _minhash_lsh(p: dict) -> Stage:
    """Full near-dup pipeline over the stream: candidates + exact
    Jaccard verification (distributed, grace-join)."""
    from osmray.dedup import minhash_lsh_candidates, verify_pairs_joined

    def s(ds):
        cands = minhash_lsh_candidates(
            ds, text_col=p.get("text_col", "text"), id_col=p.get("id_col", "doc_id"),
            max_bucket=int(p.get("max_bucket", 64)),
        )
        return verify_pairs_joined(
            cands, ds, text_col=p.get("text_col", "text"),
            id_col=p.get("id_col", "doc_id"),
            threshold=float(p.get("threshold", 0.8)),
        )

    return s


def _asof_join(p: dict) -> Stage:
    """Right side comes from ``right_path`` parquet (as-of state
    table); left is the stream."""
    import glob as _g

    from osmray.joins import asof_join

    def s(ds):
        import ray.data

        files = sorted(_g.glob(p["right_path"]))
        right = ray.data.read_parquet(files, columns=p.get("right_columns"))
        return asof_join(
            ds, right, on=p.get("on", "user_id"), ts_col=p.get("ts_col", "ts"),
            left_cols=p.get("left_cols"), right_cols=p.get("right_cols"),
        )

    return s


def _hll(p: dict) -> Stage:
    from osmray.sketch import hll_registers

    def s(ds):
        return hll_registers(ds, p["group_col"], p["value_col"])

    return s


def _hamming_pairs(p: dict) -> Stage:
    from osmray.dedup import hamming_pairs

    def s(ds):
        return hamming_pairs(
            ds, max_hamming=int(p.get("max_hamming", 4)),
            id_col=p.get("id_col", "doc_id"), sig_col=p.get("sig_col", "simhash"),
            n_bits=int(p.get("n_bits", 62)),
        )

    return s


def _image_resize(p: dict) -> Stage:
    """{"op": "image_resize", "h": 64, "w": 64, "fmt": "png"?,
    "concurrency": 2?} — decode -> block-mean resize -> re-encode
    actor pool (extra columns pass through)."""
    from osmray.multimodal import ImageResizeStage

    def s(ds):
        return ds.map_batches(
            ImageResizeStage,
            fn_constructor_kwargs={
                "out_h": int(p.get("h", 64)),
                "out_w": int(p.get("w", 64)),
                "out_fmt": p.get("fmt", "png"),
            },
            batch_format="pyarrow",
            concurrency=int(p.get("concurrency", 2)),
            num_cpus=1,
        )

    return s


def _augment(p: dict) -> Stage:
    """{"op": "augment", "aug": fixed-op?, "op_col": column?,
    "concurrency": 2?} — deterministic augmentation actor pool; with
    neither ``aug`` nor ``op_col`` the op is the image_id-hash pick."""
    from osmray.multimodal import AugmentStage

    def s(ds):
        return ds.map_batches(
            AugmentStage,
            fn_constructor_kwargs={"op": p.get("aug"), "op_col": p.get("op_col")},
            batch_format="pyarrow",
            concurrency=int(p.get("concurrency", 2)),
            num_cpus=1,
        )

    return s


def _audio_features(p: dict) -> Stage:
    """{"op": "audio_features", "frame": 1024?, "n_frames": 16?,
    "allow_fake": false?} — RIFF/PCM16 decode -> RMS/ZCR vectors."""
    from osmray.multimodal import AudioFeatureStage

    def s(ds):
        return ds.map_batches(
            AudioFeatureStage,
            fn_constructor_kwargs={
                "frame": int(p.get("frame", 1024)),
                "n_frames": int(p.get("n_frames", 16)),
                "allow_fake": bool(p.get("allow_fake", False)),
            },
            batch_format="pyarrow",
            concurrency=int(p.get("concurrency", 2)),
            num_cpus=1,
        )

    return s


def _lag_lead(p: dict) -> Stage:
    from osmray.windows import lag_lead_sorted

    def s(ds):
        return lag_lead_sorted(
            ds, key=p.get("key", "user_id"), ts=p.get("ts", "ts"),
            id_col=p.get("id_col", "event_id"),
        )

    return s


def _pivot(p: dict) -> Stage:
    from osmray.tableops import pivot_counts

    def s(ds):
        return pivot_counts(
            ds, p["key_col"], p["cat_col"], p["categories"],
            val_col=p.get("val_col"),
        )

    return s


def _heavy_hitters(p: dict) -> Stage:
    from osmray.tableops import heavy_hitters

    def s(ds):
        return heavy_hitters(
            ds, p.get("col", "text"), k=int(p.get("k", 25)),
            capacity=int(p.get("capacity", 1024)),
            tokens=bool(p.get("tokens", False)),
        )

    return s


def _pps_sample(p: dict) -> Stage:
    from osmray.tableops import pps_sample

    def s(ds):
        return pps_sample(ds, p["id_col"], p["weight_col"], n=int(p["n"]))

    return s


def _regex_extract(p: dict) -> Stage:
    from osmray.text import regex_extract

    def s(ds):
        return regex_extract(ds, p.get("col", "text"), p["pattern"],
                             p["out_cols"], keep=p.get("keep"))

    return s


def _interval_islands(p: dict) -> Stage:
    from osmray.windows import interval_islands

    def s(ds):
        return interval_islands(ds, key=p.get("key", "user_id"),
                                start=p.get("start", "s"),
                                end=p.get("end", "e"))

    return s


def _grouped_moments(p: dict) -> Stage:
    from osmray.tableops import grouped_moments

    def s(ds):
        return grouped_moments(ds, p["key_col"], p["x_col"], p["y_col"])

    return s


def _skyline(p: dict) -> Stage:
    from osmray.tableops import skyline2d

    def s(ds):
        return skyline2d(ds, p["id_col"], p["x_col"], p["y_col"])

    return s


def _box_overlap_join(p: dict) -> Stage:
    """{"op": "box_overlap_join", "right_path": glob, "cell_shift": 8?,
    "iou": [num, den]?} — left = current stream of (id, x0, y0, x1,
    y1) boxes; with "iou" the join keeps only pairs meeting the
    IoU threshold (the box_iou_join step is this with "iou" set)."""
    import glob as _g

    import ray.data

    from osmray.joins import box_overlap_join

    def s(ds):
        files = sorted(_g.glob(p["right_path"]))
        right = ray.data.read_parquet(files, columns=p.get("right_columns"))
        iou = p.get("iou")
        return box_overlap_join(
            ds, right, cell_shift=int(p.get("cell_shift", 8)),
            min_iou=(int(iou[0]), int(iou[1])) if iou else None)

    return s


def _morphology(p: dict) -> Stage:
    """{"op": "morphology", "kind": "dilate"|"erode", "r": 1?,
    "mask_col": "mask"?} — decode PNG mask -> box morphology ->
    re-encode (in place)."""
    from osmray import codecs
    from osmray.raster import binary_dilate, binary_erode

    kind = p.get("kind", "dilate")
    r = int(p.get("r", 1))
    col = p.get("mask_col", "mask")
    fn = binary_dilate if kind == "dilate" else binary_erode

    def s(ds):
        def f(batch: pa.Table) -> pa.Table:
            out = [
                codecs.png_encode(fn(codecs.png_decode(m), r), level=1)
                for m in batch[col].to_pylist()
            ]
            idx = batch.schema.get_field_index(col)
            return batch.set_column(idx, col, pa.array(out, pa.binary()))

        return ds.map_batches(f, batch_format="pyarrow")

    return s


def _distance_join(p: dict) -> Stage:
    """{"op": "distance_join", "right_path": glob, "radius": 400,
    "cell_shift": 10?} — left = (qid, px, py) points stream."""
    import glob as _g

    import ray.data

    from osmray.joins import distance_join

    def s(ds):
        files = sorted(_g.glob(p["right_path"]))
        right = ray.data.read_parquet(files, columns=p.get("right_columns"))
        return distance_join(ds, right, radius=int(p["radius"]),
                             cell_shift=int(p.get("cell_shift", 10)))

    return s


def _knn_join(p: dict) -> Stage:
    """{"op": "knn_join", "right_path": glob, "k": 3, "radius0": 256}"""
    import glob as _g

    import ray.data

    from osmray.joins import knn_join

    def s(ds):
        files = sorted(_g.glob(p["right_path"]))
        right = ray.data.read_parquet(files, columns=p.get("right_columns"))
        return knn_join(ds, right, k=int(p.get("k", 3)),
                        radius0=int(p.get("radius0", 256)),
                        cell_shift=int(p.get("cell_shift", 10)))

    return s


def _rollup_cells(p: dict) -> Stage:
    from osmray.cells import rollup_cells

    def s(ds):
        return rollup_cells(ds, cell_col=p.get("cell_col", "cell"),
                            levels=tuple(p.get("levels", (8, 6, 4, 2, 0))))

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
    "quality_stats": _quality_stats,
    "lang_id": _lang_id,
    "fingerprint": _fingerprint,
    "simhash": _simhash,
    "redact": _redact,
    "exact_dedup": _exact_dedup,
    "minhash_lsh": _minhash_lsh,
    "hamming_pairs": _hamming_pairs,
    "asof_join": _asof_join,
    "hll": _hll,
    "image_resize": _image_resize,
    "augment": _augment,
    "audio_features": _audio_features,
    "lag_lead": _lag_lead,
    "pivot": _pivot,
    "heavy_hitters": _heavy_hitters,
    "pps_sample": _pps_sample,
    "regex_extract": _regex_extract,
    "rollup_cells": _rollup_cells,
    "interval_islands": _interval_islands,
    "grouped_moments": _grouped_moments,
    "skyline": _skyline,
    "box_overlap_join": _box_overlap_join,
    "morphology": _morphology,
    "distance_join": _distance_join,
    "knn_join": _knn_join,
}


def _ntile(p: dict) -> Stage:
    """{"op": "ntile", "key": col, "order": col, "id": col, "n": 4}"""
    from osmray.windows import ntile_ranks

    return lambda ds: ntile_ranks(ds, p["key"], p["order"], p["id"],
                                  n_tiles=int(p.get("n", 4)))


def _range_window(p: dict) -> Stage:
    """{"op": "range_window", "key": col, "ts": col, "id": col,
    "val": col, "range_us": 3600000000}"""
    from osmray.windows import range_window_sum

    return lambda ds: range_window_sum(
        ds, p["key"], p["ts"], p["id"], p["val"],
        range_us=int(p.get("range_us", 3_600_000_000)))


def _funnel(p: dict) -> Stage:
    """{"op": "funnel", "key": col, "ts": col, "type": col,
    "steps": [t1, t2, ...]}"""
    from osmray.windows import funnel

    return lambda ds: funnel(ds, p["key"], p["ts"], p["type"], p["steps"])


def _resample(p: dict) -> Stage:
    """{"op": "resample", "key": col, "ts": col, "val": col,
    "bucket_us": 86400000000}"""
    from osmray.windows import resample_fill

    return lambda ds: resample_fill(
        ds, p["key"], p["ts"], p["val"],
        bucket_us=int(p.get("bucket_us", 86_400_000_000)))


def _cube(p: dict) -> Stage:
    """{"op": "cube", "c1": col, "c2": col, "val": col}"""
    from osmray.tableops import cube_agg

    return lambda ds: cube_agg(ds, p["c1"], p["c2"], p["val"],
                               all_token=p.get("all_token", "ALL"))


def _edit1_join(p: dict) -> Stage:
    """{"op": "edit1_join", "col": "s"}"""
    from osmray.simjoin import edit1_join

    return lambda ds: edit1_join(ds, p.get("col", "s"))


def _jaccard_join(p: dict) -> Stage:
    """{"op": "jaccard_join", "id": col, "toks": col, "t_num": 1,
    "t_den": 2}"""
    from osmray.simjoin import jaccard_join

    return lambda ds: jaccard_join(ds, p["id"], p["toks"],
                                   t_num=int(p.get("t_num", 1)),
                                   t_den=int(p.get("t_den", 2)))


def _bfs(p: dict) -> Stage:
    """{"op": "bfs", "seeds_path": glob, "max_hops": 4} — edge stream
    (u, v) in; seeds parquet must have a node column."""
    import glob as _g

    import ray.data

    from osmray.graph import bfs_hops

    def s(ds):
        seeds = ray.data.read_parquet(sorted(_g.glob(p["seeds_path"])))
        return bfs_hops(ds, seeds, max_hops=int(p.get("max_hops", 4)))

    return s




def _grace_join(p: dict) -> Stage:
    """{"op": "grace_join", "right_path": glob, "on": col,
    "right_on": col?, "how": "inner|left|full|semi|anti",
    "num_buckets": 64?}"""
    import glob as _g

    import ray.data

    from osmray.joins import bucketed_join

    def s(ds):
        right = ray.data.read_parquet(
            sorted(_g.glob(p["right_path"])), columns=p.get("right_columns"))
        return bucketed_join(ds, right, on=p["on"],
                             right_on=p.get("right_on"),
                             how=p.get("how", "inner"),
                             num_buckets=int(p.get("num_buckets", 64)))

    return s


def _cooccur(p: dict) -> Stage:
    """{"op": "cooccur_pairs", "key": col, "item": col,
    "min_count": 2?}"""
    from osmray.tableops import cooccur_pairs

    return lambda ds: cooccur_pairs(ds, p["key"], p["item"],
                                    min_count=int(p.get("min_count", 2)))


def _focal(p: dict) -> Stage:
    """{"op": "keyed_sum", "key": col, "vals": [cols]} — the
    high-cardinality sorted-scan fold."""
    from osmray.tableops import sorted_fold_sums

    return lambda ds: sorted_fold_sums(ds, p["key"], list(p["vals"]))




def _mst(p: dict) -> Stage:
    """{"op": "mst", "src": "u"?, "dst": "v"?, "w": "w"?, "eid":
    "eid"?, "mode": "auto"?} — Boruvka minimum spanning forest of the
    upstream edge Dataset; emits the unique (eid, u, v, w) forest
    under the (w, eid) total order."""
    from osmray.graph import boruvka_mst

    def s(ds):
        return boruvka_mst(ds, src_col=p.get("src", "u"),
                           dst_col=p.get("dst", "v"),
                           w_col=p.get("w", "w"),
                           eid_col=p.get("eid", "eid"),
                           mode=p.get("mode", "auto"))

    return s


def _template_match(p: dict) -> Stage:
    """{"op": "template_match", "stride": 16?, "concurrency": 2?} —
    best SAD offset of the fixed template per image (actor pool)."""
    from osmray.multimodal import TemplateMatchStage

    def s(ds):
        return ds.map_batches(
            TemplateMatchStage,
            fn_constructor_kwargs={"stride": int(p.get("stride", 16))},
            batch_format="pyarrow",
            concurrency=int(p.get("concurrency", 2)), num_cpus=1)

    return s


def _seam(p: dict) -> Stage:
    """{"op": "seam", "concurrency": 2?} — vertical seam-carving DP
    per image (actor pool): seam cost + base-8 packed path."""
    from osmray.multimodal import SeamStage

    def s(ds):
        return ds.map_batches(
            SeamStage, batch_format="pyarrow",
            concurrency=int(p.get("concurrency", 2)), num_cpus=1)

    return s


def _moving_median(p: dict) -> Stage:
    """{"op": "moving_median", "group": col, "order": [cols], "value":
    col, "width": 5?} — exact trailing-window median per group,
    emitted as 2*median (integral for even head windows)."""

    def s(ds):
        width = int(p.get("width", 5))
        gcol, vcol = p["group"], p["value"]
        ocols = list(p["order"])

        def roll(g: pa.Table) -> pa.Table:
            ordv = [g[c].to_numpy(zero_copy_only=False) for c in ocols]
            order = np.lexsort(tuple(reversed(ordv)))
            v = g[vcol].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            n = len(v)
            m2 = np.empty(n, np.int64)
            for t in range(min(width - 1, n)):
                sarr = np.sort(v[:t + 1])
                m2[t] = (2 * sarr[t // 2] if (t + 1) % 2
                         else sarr[t // 2] + sarr[t // 2 + 1])
            if n >= width:
                win = np.lib.stride_tricks.sliding_window_view(v, width)
                sw = np.sort(win, axis=1)
                m2[width - 1:] = (2 * sw[:, width // 2] if width % 2
                                  else sw[:, width // 2 - 1]
                                  + sw[:, width // 2])
            cols = {gcol: pa.array(np.full(n, g[gcol][0].as_py(),
                                            np.int64)),
                    "m2": pa.array(m2)}
            for c in ocols:
                cols[c] = g[c].take(pa.array(order))
            return pa.table(cols)

        return ds.groupby(gcol).map_groups(roll, batch_format="pyarrow")

    return s


STAGES.update({
    "grace_join": _grace_join,
    "cooccur_pairs": _cooccur,
    "keyed_sum": _focal,
})


STAGES.update({
    "ntile": _ntile,
    "range_window": _range_window,
    "funnel": _funnel,
    "resample": _resample,
    "cube": _cube,
    "edit1_join": _edit1_join,
    "jaccard_join": _jaccard_join,
    "bfs": _bfs,
})


def run_pipeline(steps: list[dict], ds=None):
    """Compile + run a step list; returns the last step's result."""
    out = ds
    for i, step in enumerate(steps):
        op = step.get("op")
        if op not in STAGES:
            raise ValueError(f"step {i}: unknown op {op!r} (have {sorted(STAGES)})")
        out = STAGES[op](step)(out)
    return out


def _sssp(p: dict) -> Stage:
    """{"op": "sssp", "seeds_path": glob, "src": "u"?, "dst": "v"?,
    "w": "w"?, "seed_col": "node"?, "max_dist": int?}"""
    import glob as _g

    import ray.data

    from osmray.graph import sssp

    def s(ds):
        seeds = ray.data.read_parquet(sorted(_g.glob(p["seeds_path"])))
        return sssp(ds, seeds, src_col=p.get("src", "u"),
                    dst_col=p.get("dst", "v"), w_col=p.get("w", "w"),
                    seed_col=p.get("seed_col", "node"),
                    max_dist=int(p.get("max_dist", 1 << 30)))

    return s


def _dbscan(p: dict) -> Stage:
    """{"op": "dbscan", "eps": int, "min_pts": int, "id": "pid"?,
    "x": "x"?, "y": "y"?}"""
    from osmray.cluster import dbscan_grid

    return lambda ds: dbscan_grid(
        ds, eps=int(p["eps"]), min_pts=int(p["min_pts"]),
        id_col=p.get("id", "pid"), x_col=p.get("x", "x"),
        y_col=p.get("y", "y"))


def _snap(p: dict) -> Stage:
    """{"op": "snap_join", "segments_path": glob, "radius": int}"""
    import glob as _g

    import ray.data

    from osmray.joins import snap_join

    def s(ds):
        segs = ray.data.read_parquet(sorted(_g.glob(p["segments_path"])))
        return snap_join(ds, segs, radius=int(p["radius"]))

    return s


def _tfidf(p: dict) -> Stage:
    """{"op": "tfidf_topk", "k": 3?, "doc": "doc_id"?, "text": "text"?}"""
    from osmray.text import tfidf_topk

    return lambda ds: tfidf_topk(ds, k=int(p.get("k", 3)),
                                 doc_col=p.get("doc", "doc_id"),
                                 text_col=p.get("text", "text"))


def _grid_cc(p: dict) -> Stage:
    """{"op": "grid_components", "width": int, "key": "key"?}"""
    from osmray.cluster import grid_components

    return lambda ds: grid_components(ds, width=int(p["width"]),
                                      key_col=p.get("key", "key"))


STAGES.update({
    "sssp": _sssp,
    "dbscan": _dbscan,
    "snap_join": _snap,
    "tfidf_topk": _tfidf,
    "grid_components": _grid_cc,
})


def _box_iou_join(p: dict) -> Stage:
    """{"op": "box_iou_join", "right_path": glob, "iou": [1, 5],
    "cell_shift": 8?, "right_columns": [...]?} — IoU-thresholded box
    association join; box_overlap_join with a default "iou"."""
    return _box_overlap_join({**p, "iou": p.get("iou", [1, 5])})


def _box_nms(p: dict) -> Stage:
    """{"op": "box_nms", "group": "img", "iou": [1, 5]} — greedy NMS
    per group over (id, score, x0, y0, x1, y1) boxes."""
    import pyarrow as _pa

    from osmray.geom import nms_boxes

    def s(ds):
        num, den = p.get("iou", [1, 5])
        gcol = p.get("group", "img")

        def g_nms(g: pa.Table) -> pa.Table:
            import numpy as _np

            kept = nms_boxes(
                g["score"].to_numpy(zero_copy_only=False),
                g["x0"].to_numpy(zero_copy_only=False),
                g["y0"].to_numpy(zero_copy_only=False),
                g["x1"].to_numpy(zero_copy_only=False),
                g["y1"].to_numpy(zero_copy_only=False),
                int(num), int(den),
                tie=g["id"].to_numpy(zero_copy_only=False).astype(_np.int64))
            sel = pa.array(kept)
            return pa.table({gcol: g[gcol].take(sel), "id": g["id"].take(sel),
                              "score": g["score"].take(sel)})

        return ds.groupby(gcol).map_groups(g_nms, batch_format="pyarrow")

    return s


def _hex_agg(p: dict) -> Stage:
    """{"op": "hex_agg", "x": col, "y": col, "w": 4096?, "h": 3547?}
    — hexagonal cell counts of an (x, y) point stream."""
    import pyarrow as _pa
    from ray.data.aggregate import Count

    from osmray.cells import HEX_H, HEX_W, hex_at

    def s(ds):
        def assign(b: pa.Table) -> pa.Table:
            cell = hex_at(b[p["x"]].to_numpy(zero_copy_only=False),
                          b[p["y"]].to_numpy(zero_copy_only=False),
                          w=int(p.get("w", HEX_W)), h=int(p.get("h", HEX_H)))
            return pa.table({"cell": pa.array(cell)})

        return (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("cell").aggregate(Count(alias_name="n")))

    return s


def _quadtree(p: dict) -> Stage:
    """{"op": "quadtree", "x": col, "y": col, "bits": 26?, "max_res":
    6?, "cap": 64?} — adaptive quadtree leaf cells of an integer
    (x, y) point stream: split every cell holding > cap points until
    max_res. Emits (res, cx, cy, n)."""
    import pyarrow as _pa

    from osmray.cells import quadtree_leaves

    def s(ds):
        bits = int(p.get("bits", 26))
        max_res = int(p.get("max_res", 6))

        def assign(b: pa.Table) -> pa.Table:
            x = b[p["x"]].to_numpy(zero_copy_only=False).astype(np.int64)
            y = b[p["y"]].to_numpy(zero_copy_only=False).astype(np.int64)
            cell = (np.int64(max_res) << 58) | ((x >> (bits - max_res)) << 29) \
                | (y >> (bits - max_res))
            return pa.table({"cell": pa.array(cell)})

        return quadtree_leaves(ds.map_batches(assign, batch_format="pyarrow"),
                               max_res=max_res, cap=int(p.get("cap", 64)))

    return s


def _hist_eq(p: dict) -> Stage:
    """{"op": "hist_eq", "concurrency": 2?} — per-channel histogram
    equalization of the bytes column (decode -> remap -> re-encode)."""
    from osmray.multimodal import HistEqStage

    return lambda ds: ds.map_batches(
        HistEqStage, batch_format="pyarrow",
        concurrency=int(p.get("concurrency", 2)), num_cpus=1)


def _box_union_area(p: dict) -> Stage:
    """{"op": "box_union_area", "group": "img"} — exact union area of
    each group's (x0, y0, x1, y1) boxes (overlaps counted once)."""
    import pyarrow as _pa

    from osmray.geom import union_area_boxes

    gcol = p.get("group", "img")

    def s(ds):
        def g_area(g: _pa.Table) -> _pa.Table:
            area = union_area_boxes(
                g["x0"].to_numpy(zero_copy_only=False),
                g["y0"].to_numpy(zero_copy_only=False),
                g["x1"].to_numpy(zero_copy_only=False),
                g["y1"].to_numpy(zero_copy_only=False))
            return _pa.table({gcol: g[gcol][:1],
                              "n_boxes": _pa.array([len(g)], _pa.int64()),
                              "union_area": _pa.array([area], _pa.int64())})

        return ds.groupby(gcol).map_groups(g_area, batch_format="pyarrow")

    return s


def _rle_mask(p: dict) -> Stage:
    """{"op": "rle_mask", "threshold": 128?, "concurrency": 2?} —
    decode -> threshold -> COCO column-major RLE observables."""
    from osmray.multimodal import RleMaskStage

    return lambda ds: ds.map_batches(
        RleMaskStage,
        fn_constructor_kwargs={"threshold": int(p.get("threshold", 128))},
        batch_format="pyarrow",
        concurrency=int(p.get("concurrency", 2)), num_cpus=1)


def _hull_diameter(p: dict) -> Stage:
    """{"op": "hull_diameter", "group": col, "x": "x"?, "y": "y"?} —
    squared farthest-pair distance per group (rotating calipers)."""
    import pyarrow as _pa

    from osmray.geom import hull_diameter_sq

    gcol, xc, yc = p["group"], p.get("x", "x"), p.get("y", "y")

    def s(ds):
        def g_diam(g: _pa.Table) -> _pa.Table:
            d = hull_diameter_sq(g[xc].to_numpy(zero_copy_only=False),
                                 g[yc].to_numpy(zero_copy_only=False))
            return _pa.table({gcol: g[gcol][:1],
                              "diam_sq": _pa.array([d], _pa.int64())})

        return ds.groupby(gcol).map_groups(g_diam, batch_format="pyarrow")

    return s


STAGES.update({
    "box_iou_join": _box_iou_join,
    "box_nms": _box_nms,
    "hex_agg": _hex_agg,
    "hist_eq": _hist_eq,
    "box_union_area": _box_union_area,
    "hull_diameter": _hull_diameter,
    "rle_mask": _rle_mask,
    "quadtree": _quadtree,
    "mst": _mst,
    "template_match": _template_match,
    "seam": _seam,
    "moving_median": _moving_median,
})


def _pip_cell_join(p: dict) -> Stage:
    """{"op": "pip_cell_join", "polys_path": glob, "cell_shift": 12?,
    "num_buckets": 64?} — left = (qid, px, py) points stream; the
    polys parquet holds (pid, xs, ys) ring-vertex list columns. The
    large-x-large PIP regime (joins.pip_cell_join)."""
    import ray.data

    from osmray.joins import pip_cell_join

    def s(ds):
        polys = ray.data.read_parquet(
            sorted(_glob.glob(p["polys_path"])), columns=p.get("polys_columns"))
        return pip_cell_join(ds, polys,
                             cell_shift=int(p.get("cell_shift", 12)),
                             num_buckets=int(p.get("num_buckets", 64)))

    return s


def _segment_intersection_join(p: dict) -> Stage:
    """{"op": "segment_intersection_join", "right_path": glob,
    "cell_shift": 8?} — left/right = (id, x1, y1, x2, y2) segments."""
    import ray.data

    from osmray.joins import segment_intersection_join

    def s(ds):
        right = ray.data.read_parquet(
            sorted(_glob.glob(p["right_path"])), columns=p.get("right_columns"))
        return segment_intersection_join(
            ds, right, cell_shift=int(p.get("cell_shift", 8)),
            num_buckets=int(p.get("num_buckets", 64)))

    return s


def _skew_join(p: dict) -> Stage:
    """{"op": "skew_join", "right_path": glob, "on": col,
    "right_on": col?, "hot_threshold": 100000?} — zipfian-key inner
    join: hot keys broadcast, cold remainder takes the grace path."""
    import ray.data

    from osmray.joins import skew_join

    def s(ds):
        right = ray.data.read_parquet(
            sorted(_glob.glob(p["right_path"])), columns=p.get("right_columns"))
        return skew_join(ds, right, on=p["on"], right_on=p.get("right_on"),
                         hot_threshold=int(p.get("hot_threshold", 100_000)),
                         num_buckets=int(p.get("num_buckets", 64)))

    return s


def _bloom_semi_join(p: dict) -> Stage:
    """{"op": "bloom_semi_join", "right_path": glob, "on": col,
    "right_on": col?} — Bloom-prefiltered large-x-large semi join."""
    import ray.data

    from osmray.joins import bloom_semi_join

    def s(ds):
        right = ray.data.read_parquet(
            sorted(_glob.glob(p["right_path"])), columns=p.get("right_columns"))
        return bloom_semi_join(ds, right, on=p["on"],
                               right_on=p.get("right_on"),
                               num_buckets=int(p.get("num_buckets", 64)))

    return s


def _kmv(p: dict) -> Stage:
    """{"op": "kmv", "col": value_col, "k": 256?} — bottom-k distinct
    sketch (rank, h, est_distinct)."""
    from osmray.sketch import kmv_bottom_k

    return lambda ds: kmv_bottom_k(ds, p["col"], k=int(p.get("k", 256)))


def _count_min(p: dict) -> Stage:
    """{"op": "count_min", "col": value_col, "depth": 4?, "width":
    1024?} — mergeable Count-Min frequency sketch (d, col, n)."""
    from osmray.sketch import count_min

    return lambda ds: count_min(ds, p["col"], depth=int(p.get("depth", 4)),
                                width=int(p.get("width", 1024)))


def _order_stats(p: dict) -> Stage:
    """{"op": "order_stats", "col": int_col, "percents": [50, 90,
    99]} — EXACT global percentiles by distributed sort + rank
    offsets (tableops.exact_order_stats)."""
    from osmray.tableops import exact_order_stats

    return lambda ds: exact_order_stats(
        ds, p["col"], [int(x) for x in p["percents"]])


def _grouped_order_stats(p: dict) -> Stage:
    """{"op": "grouped_order_stats", "key": key_col, "col": int_col,
    "percents": [50]} — EXACT per-group percentiles; no task holds a
    whole spanning group (tableops.grouped_order_stats)."""
    from osmray.tableops import grouped_order_stats

    return lambda ds: grouped_order_stats(
        ds, p["key"], p["col"], [int(x) for x in p["percents"]])


STAGES.update({
    "pip_cell_join": _pip_cell_join,
    "segment_intersection_join": _segment_intersection_join,
    "skew_join": _skew_join,
    "bloom_semi_join": _bloom_semi_join,
    "kmv": _kmv,
    "count_min": _count_min,
    "order_stats": _order_stats,
    "grouped_order_stats": _grouped_order_stats,
})


def _terrain(p: dict) -> Stage:
    """{"op": "terrain", "x": col, "y": col, "v": col} — Horn
    slope/aspect over the sparse integer cell DEM (osmray/terrain.py);
    emits (cx, cy, gx, gy, slope_l1, aspect)."""
    from osmray import terrain

    return lambda ds: terrain.horn_gradient(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"]))


def _d8_flow(p: dict) -> Stage:
    """{"op": "d8_flow", "x": col, "y": col, "v": col} — D8 drain
    direction per cell; emits (cx, cy, flow_dir) with -1 = sink."""
    import numpy as np
    import pyarrow as pa

    from osmray import terrain

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        code = batch["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "flow_dir": pa.array(np.where(code == 0, -1, code - 1)
                                 .astype(np.int64))})

    return lambda ds: terrain.d8_codes(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"])).map_batches(
            fmt, batch_format="pyarrow")


def _watershed(p: dict) -> Stage:
    """{"op": "watershed", "x": col, "y": col, "v": col} — D8 basin
    labels; emits (cx, cy, sink_cx, sink_cy)."""
    import numpy as np
    import pyarrow as pa

    from osmray import terrain

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["sink"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        sx, sy = terrain.unpack(s)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "sink_cx": pa.array(sx), "sink_cy": pa.array(sy)})

    return lambda ds: terrain.watershed(terrain.d8_codes(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"]))).map_batches(
            fmt, batch_format="pyarrow")


def _sobel_nms(p: dict) -> Stage:
    """{"op": "sobel_nms", "block_px": 32?, "concurrency": 4?} —
    decode -> block-mean Sobel + direction-quantized NMS over an
    images dataset with (idx, bytes); emits surviving edge cells."""
    from osmray.multimodal import SobelNmsStage

    return lambda ds: ds.select_columns(["idx", "bytes"]).map_batches(
        SobelNmsStage,
        fn_constructor_kwargs={"block_px": int(p.get("block_px", 32))},
        batch_format="pyarrow",
        concurrency=int(p.get("concurrency", 4)), num_cpus=1)


STAGES.update({
    "terrain": _terrain,
    "d8_flow": _d8_flow,
    "watershed": _watershed,
    "sobel_nms": _sobel_nms,
})


def _flow_accum(p: dict) -> Stage:
    """{"op": "flow_accum", "x": col, "y": col, "v": col,
    "mode": "auto"?} — D8 upstream-area counts per cell; emits
    (cx, cy, accum)."""
    import numpy as np
    import pyarrow as pa

    from osmray import terrain

    def fmt(batch: pa.Table) -> pa.Table:
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = terrain.unpack(c)
        return pa.table({
            "cx": pa.array(cx), "cy": pa.array(cy),
            "accum": batch["accum"].cast(pa.int64())})

    return lambda ds: terrain.flow_accumulation(
        terrain.d8_codes(terrain.elevation_partials(
            ds, p["x"], p["y"], p["v"])),
        mode=p.get("mode", "auto")).map_batches(fmt, batch_format="pyarrow")


STAGES.update({"flow_accum": _flow_accum})


def _ruggedness(p: dict) -> Stage:
    """{"op": "ruggedness", "x": col, "y": col, "v": col} — Terrain
    Ruggedness Index per cell; emits (cx, cy, tri, n_nbr)."""
    from osmray import terrain

    return lambda ds: terrain.ruggedness(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"]))


STAGES.update({"ruggedness": _ruggedness})


def _lbp(p: dict) -> Stage:
    """{"op": "lbp", "x": col, "y": col, "v": col} — Local Binary
    Pattern texture histogram over the cell grid; emits
    (n_nbr, code, n_cells)."""
    from osmray import terrain

    return lambda ds: terrain.lbp_histogram(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"]))


def _laplacian_pyramid(p: dict) -> Stage:
    """{"op": "laplacian_pyramid", "x": col, "y": col, "v": col,
    "levels": 2?} — per-band detail energies; emits
    (level, n_cells, sum_abs_lap, sum_z)."""
    import ray.data

    from osmray import terrain

    return lambda ds: ray.data.from_arrow(terrain.laplacian_levels(
        terrain.elevation_partials(ds, p["x"], p["y"], p["v"]),
        n_levels=int(p.get("levels", 2))))


def _collocations(p: dict) -> Stage:
    """{"op": "collocations", "min_count": 5?} — bigram collocation
    mining over a dataset with a ``text`` column; emits
    (w1, w2, n_xy, n_x, n_y, lift2)."""
    from osmray.queries import _collocations as colloc

    return lambda ds: colloc(ds, min_count=int(p.get("min_count", 5)))


def _oov_rate(p: dict) -> Stage:
    """{"op": "oov_rate", "k": 20?} — per-doc UNK rate against the
    corpus top-k vocabulary; emits (doc_id, n_tokens, n_oov,
    oov_mil)."""
    from osmray.queries import oov_rate

    return lambda ds: oov_rate(ds, K=int(p.get("k", 20)))


def _kcenter(p: dict) -> Stage:
    """{"op": "kcenter", "k": 8?} — greedy farthest-point sampling
    over a dataset of distinct (cx, cy) cells; emits
    (rnk, cx, cy, d2min)."""
    import ray.data

    from osmray.queries import kcenter

    return lambda ds: ray.data.from_arrow(
        kcenter(ds, int(p.get("k", 8))))


STAGES.update({
    "lbp": _lbp,
    "laplacian_pyramid": _laplacian_pyramid,
    "collocations": _collocations,
    "oov_rate": _oov_rate,
    "kcenter": _kcenter,
})


def _read_json(p: dict) -> Stage:
    """{"op": "read_json", "path": glob} — JSON-lines source (the
    reference's Overpass-cache shape, lib/loaders.py:13-24, as a
    first-class input format)."""
    import glob as _g

    import ray.data

    def s(ds):
        assert ds is None, "read_json must be the first step"
        files = sorted(_g.glob(p["path"]))
        if not files:
            raise FileNotFoundError(f"no files match {p['path']}")
        return ray.data.read_json(files)

    return s


def _read_csv(p: dict) -> Stage:
    """{"op": "read_csv", "path": glob} — CSV source."""
    import glob as _g

    import ray.data

    def s(ds):
        assert ds is None, "read_csv must be the first step"
        files = sorted(_g.glob(p["path"]))
        if not files:
            raise FileNotFoundError(f"no files match {p['path']}")
        return ray.data.read_csv(files)

    return s


STAGES.update({"read_json": _read_json, "read_csv": _read_csv})


def _gopher_rules(p: dict) -> Stage:
    """{"op": "gopher_rules"} — within-doc repetition quality rules
    over a (doc_id, text) dataset; see queries.q_gopher_rules."""
    from osmray.text import gopher_repetition

    return lambda ds: gopher_repetition(ds)


def _boilerplate(p: dict) -> Stage:
    """{"op": "boilerplate", "n": 3?, "min_docs": 2?, "mode":
    "auto"?} — corpus-level boilerplate coverage."""
    from osmray.text import boilerplate_coverage

    return lambda ds: boilerplate_coverage(
        ds, n=int(p.get("n", 3)), min_docs=int(p.get("min_docs", 2)),
        mode=p.get("mode", "auto"))


def _cdc_chunks(p: dict) -> Stage:
    """{"op": "cdc_chunks", "window": 8?, "mask_mod": 64?} —
    content-defined-chunking dedup stats."""
    from osmray.dedup import cdc_chunk_dups

    return lambda ds: cdc_chunk_dups(
        ds, window=int(p.get("window", 8)),
        mask_mod=int(p.get("mask_mod", 64)))


def _label_prop(p: dict) -> Stage:
    """{"op": "label_prop", "rounds": 3?, "src": "u"?, "dst": "v"?,
    "mode": "auto"?} — LPA community detection."""
    from osmray.graph import label_propagation

    return lambda ds: label_propagation(
        ds, rounds=int(p.get("rounds", 3)), src_col=p.get("src", "u"),
        dst_col=p.get("dst", "v"), mode=p.get("mode", "auto"))


STAGES.update({
    "gopher_rules": _gopher_rules,
    "boilerplate": _boilerplate,
    "cdc_chunks": _cdc_chunks,
    "label_prop": _label_prop,
})


def _hits(p: dict) -> Stage:
    """{"op": "hits", "mode": "auto"?} — two-round integer HITS over
    a packed-edge (pk = u*65536 + v) dataset."""
    from osmray.queries import hits_scores

    return lambda ds: hits_scores(ds, mode=p.get("mode", "auto"))


def _ppr(p: dict) -> Stage:
    """{"op": "ppr", "rounds": 6?, "seed_mod": 1009?, "mode":
    "auto"?} — integer personalized-PageRank diffusion over a
    packed-edge dataset."""
    from osmray.queries import ppr_mass

    return lambda ds: ppr_mass(
        ds, rounds=int(p.get("rounds", 6)),
        seed_mod=int(p.get("seed_mod", 1009)),
        mode=p.get("mode", "auto"))


def _assortativity(p: dict) -> Stage:
    """{"op": "assortativity", "mode": "auto"?} — integer
    degree-assortativity components over packed undirected edges."""
    from osmray.queries import assortativity_sums

    return lambda ds: assortativity_sums(ds, mode=p.get("mode", "auto"))


STAGES.update({"hits": _hits, "ppr": _ppr,
               "assortativity": _assortativity})


def _cusum(p: dict) -> Stage:
    """{"op": "cusum", "k": 7500?, "h": 40000?, "key": "user_id"?,
    "ts": "ts"?, "val": "value"?, "id": "event_id"?}"""
    from osmray.windows import cusum_alarms

    return lambda ds: cusum_alarms(
        ds, k=int(p.get("k", 7500)), h=int(p.get("h", 40000)),
        key=p.get("key", "user_id"), ts_col=p.get("ts", "ts"),
        val_col=p.get("val", "value"), id_col=p.get("id", "event_id"))


def _stay_points(p: dict) -> Stage:
    """{"op": "stay_points", "d2": 25?, "t_min": 900?, ...cols}"""
    from osmray.windows import stay_points

    return lambda ds: stay_points(
        ds, d2=int(p.get("d2", 25)), t_min=int(p.get("t_min", 900)),
        key=p.get("key", "user_id"), ts_col=p.get("ts", "ts"),
        id_col=p.get("id", "event_id"))


def _geofence(p: dict) -> Stage:
    """{"op": "geofence", "box": 10?, ...cols}"""
    from osmray.windows import geofence_transitions

    return lambda ds: geofence_transitions(
        ds, box=int(p.get("box", 10)), key=p.get("key", "user_id"),
        ts_col=p.get("ts", "ts"), id_col=p.get("id", "event_id"))


STAGES.update({"cusum": _cusum, "stay_points": _stay_points,
               "geofence": _geofence})


def _mutual_nn(p: dict) -> Stage:
    """{"op": "mutual_nn", "id": "vec_id"?, "vec": "embedding"?}"""
    from osmray.ann import mutual_nn

    return lambda ds: mutual_nn(ds, id_col=p.get("id", "vec_id"),
                                vec_col=p.get("vec", "embedding"))


STAGES.update({"mutual_nn": _mutual_nn})


def _bpe_train(p: dict) -> Stage:
    """{"op": "bpe_train", "rounds": 4?} — BPE merge training over a
    ``text`` column; emits (merge_rank, lhs, rhs, n)."""
    import ray.data as _rd

    from osmray.text import bpe_train

    return lambda ds: _rd.from_arrow(
        bpe_train(ds, rounds=int(p.get("rounds", 4))))


def _url_canon(p: dict) -> Stage:
    """{"op": "url_canon", "col": "url"?} — canonicalize a URL column
    and count rows per canonical url; emits (url, n)."""
    from osmray.text import url_canon_counts

    return lambda ds: url_canon_counts(ds, url_col=p.get("col", "url"))


def _stump(p: dict) -> Stage:
    """{"op": "stump", "feat": "feat"?, "label": "pos"?} — exact
    best-threshold decision stump; emits one row
    (threshold, acc, n_left, pos_left)."""
    from osmray.tableops import best_split_stump

    return lambda ds: best_split_stump(
        ds, p.get("feat", "feat"), p.get("label", "pos"))


def _ktruss(p: dict) -> Stage:
    """{"op": "ktruss", "k": 4?, "rounds": 2?, "src": "u"?,
    "dst": "v"?} — bounded-round k-truss peeling; emits kept edges
    (u, v, support)."""
    from osmray.graph import ktruss

    return lambda ds: ktruss(
        ds, k=int(p.get("k", 4)), rounds=int(p.get("rounds", 2)),
        src_col=p.get("src", "u"), dst_col=p.get("dst", "v"))


STAGES.update({"bpe_train": _bpe_train, "url_canon": _url_canon,
               "stump": _stump, "ktruss": _ktruss})


def _stitch_chains(p: dict) -> Stage:
    """{"op": "stitch_chains", "id": "s"?, "p1": "p1"?, "p2": "p2"?,
    "len": "len"?} — degree-2 polyline stitching; emits
    (chain_id, n_segs, total_len)."""
    from osmray.graph import stitch_chains

    return lambda ds: stitch_chains(
        ds, id_col=p.get("id", "s"), p1_col=p.get("p1", "p1"),
        p2_col=p.get("p2", "p2"), len_col=p.get("len", "len"))


def _interleave(p: dict) -> Stage:
    """{"op": "interleave", "key": "source"?, "id": "doc_id"?} —
    proportional stride interleave; emits (id, key, rk, pos)."""
    from osmray.windows import interleave_positions

    return lambda ds: interleave_positions(
        ds, key=p.get("key", "source"), id_col=p.get("id", "doc_id"))


STAGES.update({"stitch_chains": _stitch_chains,
               "interleave": _interleave})


def _bpe_apply(p: dict) -> Stage:
    """{"op": "bpe_apply", "rounds": 4?} — train BPE merges on the
    corpus and tokenize each doc; emits
    (doc_id, n_tokens, n_subtokens)."""
    from osmray.text import bpe_apply

    return lambda ds: bpe_apply(ds, rounds=int(p.get("rounds", 4)))


def _hard_negatives(p: dict) -> Stage:
    """{"op": "hard_negatives", "id": "vec_id"?, "vec": "embedding"?,
    "label": "label"?} — nearest different-label neighbor per
    vector."""
    from osmray.ann import hard_negatives

    return lambda ds: hard_negatives(
        ds, id_col=p.get("id", "vec_id"), vec_col=p.get("vec", "embedding"),
        label_col=p.get("label", "label"))


def _od_flows(p: dict) -> Stage:
    """{"op": "od_flows", "key": "user_id"?, "ts": "ts"?,
    "id": "event_id"?, "cell_shift": 3?} — origin-destination cell
    transition counts."""
    from osmray.windows import od_flows

    return lambda ds: od_flows(
        ds, key=p.get("key", "user_id"), ts_col=p.get("ts", "ts"),
        id_col=p.get("id", "event_id"),
        cell_shift=int(p.get("cell_shift", 3)))


STAGES.update({"bpe_apply": _bpe_apply, "hard_negatives": _hard_negatives,
               "od_flows": _od_flows})


def _epoch_shuffle(p: dict) -> Stage:
    """{"op": "epoch_shuffle", "id": "doc_id"?, "seed": 17?,
    "shard_size": 1024?} — deterministic seeded epoch permutation
    into training shards."""
    from osmray.tableops import epoch_shuffle

    return lambda ds: epoch_shuffle(
        ds, id_col=p.get("id", "doc_id"), seed=int(p.get("seed", 17)),
        shard_size=int(p.get("shard_size", 1024)))


STAGES.update({"epoch_shuffle": _epoch_shuffle})


def _expectations(p: dict) -> Stage:
    """{"op": "expectations", "sf_dir": "..."} — the data-quality
    expectation suite over lineitem+orders under ``sf_dir``; source
    step (ignores upstream ds) for pipeline composition."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_expectations(p["sf_dir"])


STAGES.update({"expectations": _expectations})


def _star_revenue(p: dict) -> Stage:
    """{"op": "star_revenue", "sf_dir": "..."} — TPC-H-Q5-shape
    star join composition (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_star_revenue(p["sf_dir"])


STAGES.update({"star_revenue": _star_revenue})


def _confusion(p: dict) -> Stage:
    """{"op": "confusion", "sf_dir": "..."} — quality-classifier
    confusion matrix (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_confusion(p["sf_dir"])


def _ab_metrics(p: dict) -> Stage:
    """{"op": "ab_metrics", "sf_dir": "..."} — deterministic A/B
    bucketing + per-arm metric sums (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_ab_metrics(p["sf_dir"])


STAGES.update({"confusion": _confusion, "ab_metrics": _ab_metrics})


def _bipartite(p: dict) -> Stage:
    """{"op": "bipartite", "src": "u"?, "dst": "v"?, "mode":
    "auto"?} — per-component bipartiteness audit; emits
    (comp, n_nodes, n_conflicts)."""
    from osmray.graph import bipartite_audit

    return lambda ds: bipartite_audit(
        ds, src_col=p.get("src", "u"), dst_col=p.get("dst", "v"),
        mode=p.get("mode", "auto"))


STAGES.update({"bipartite": _bipartite})


def _hist_match(p: dict) -> Stage:
    """{"op": "hist_match", "n_total": N} — inverse-CDF histogram
    matching metrics over an images dataset with (bytes, idx)."""
    from osmray.multimodal import hist_match_metrics

    return lambda ds: hist_match_metrics(ds, n_total=int(p["n_total"]))


STAGES.update({"hist_match": _hist_match})


def _target_encode(p: dict) -> Stage:
    """{"op": "target_encode", "cat": "cat"?, "label": "pos"?,
    "prior_milli": 500?, "m": 20?} — smoothed integer target
    encoding per category."""
    from osmray.tableops import sorted_fold_sums

    cat, lbl = p.get("cat", "cat"), p.get("label", "pos")
    prior, m = int(p.get("prior_milli", 500)), int(p.get("m", 20))

    def run(ds):
        import numpy as np
        import pyarrow as pa

        def partials(batch):
            c = batch[cat].to_numpy(zero_copy_only=False).astype("int64")
            y = batch[lbl].to_numpy(zero_copy_only=False).astype("int64")
            u, inv = np.unique(c, return_inverse=True)
            return pa.table({
                "cat": pa.array(u),
                "n": pa.array(np.bincount(inv).astype("int64")),
                "pos": pa.array(np.bincount(
                    inv, weights=y).astype("int64"))})

        folded = sorted_fold_sums(
            ds.map_batches(partials, batch_format="pyarrow"),
            "cat", ["n", "pos"])
        return folded.map_batches(
            lambda t: t.append_column("enc_milli", pa.array(
                (t["pos"].to_numpy(zero_copy_only=False) * 1000
                 + prior * m)
                // (t["n"].to_numpy(zero_copy_only=False) + m))),
            batch_format="pyarrow")

    return run


STAGES.update({"target_encode": _target_encode})


def _lru_hits(p: dict) -> Stage:
    """{"op": "lru_hits", "sf_dir": "..."} — exact LRU(8) hit-rate
    simulation per user stream (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_lru_hits(p["sf_dir"])


STAGES.update({"lru_hits": _lru_hits})


def _triangles_per_vertex(p: dict) -> Stage:
    """{"op": "triangles_per_vertex", "src": "u"?, "dst": "v"?} —
    all-corner triangle counts (clustering-coefficient numerator)."""
    from osmray.graph import triangles_per_vertex

    return lambda ds: triangles_per_vertex(
        ds, src_col=p.get("src", "u"), dst_col=p.get("dst", "v"))


STAGES.update({"triangles_per_vertex": _triangles_per_vertex})


def _bootstrap(p: dict) -> Stage:
    """{"op": "bootstrap", "sf_dir": "..."} — 8 deterministic
    half-sample replicates of the per-type metric (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_bootstrap(p["sf_dir"])


STAGES.update({"bootstrap": _bootstrap})


def _attribution(p: dict) -> Stage:
    """{"op": "attribution", "sf_dir": "..."} — linear multi-touch
    attribution credits (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_attribution(p["sf_dir"])


STAGES.update({"attribution": _attribution})


def _diversity(p: dict) -> Stage:
    """{"op": "diversity", "key": "source"?, "cat": "lang"?} —
    exact integer Gini-Simpson diversity of ``cat`` per ``key``."""
    from osmray import queries as _Q
    from osmray.stages import hash_str
    from osmray.tableops import sorted_fold_sums

    key, cat = p.get("key", "source"), p.get("cat", "lang")

    def run(ds):
        import numpy as np
        import pyarrow as pa

        def partials(batch):
            kk = np.char.add(np.char.add(
                np.asarray(batch[key].to_pylist()), "\x1f"),
                np.asarray(batch[cat].to_pylist()))
            u, inv = np.unique(kk, return_inverse=True)
            return pa.table({
                "k": pa.array(u),
                "n": pa.array(np.bincount(inv).astype("int64")),
                "bk": pa.array(np.abs(hash_str(list(u), 9)) % 16)})

        cell = (ds.map_batches(partials, batch_format="pyarrow")
                .groupby("bk").map_groups(
                    lambda g: _Q._fold_str_sums(
                        g.drop_columns(["bk"]), ["n"]),
                    batch_format="pyarrow"))

        def per_key2(batch):
            ks = [k.split("\x1f") for k in batch["k"].to_pylist()]
            src = np.asarray([s for s, _ in ks])
            n = batch["n"].to_numpy(zero_copy_only=False).astype("int64")
            u, inv = np.unique(src, return_inverse=True)
            tot = np.bincount(inv, weights=n).astype("int64")
            sq = np.bincount(inv, weights=n * n).astype("int64")
            nl = np.bincount(inv).astype("int64")
            return pa.table({
                key: pa.array(u), "n_rows": pa.array(tot),
                "n_cats": pa.array(nl),
                "div_micro": pa.array(
                    1_000_000 * (tot * tot - sq) // (tot * tot))})

        return cell.repartition(1).map_batches(
            per_key2, batch_format="pyarrow", batch_size=None)

    return run


STAGES.update({"diversity": _diversity})


def _quantile_normalize(p: dict) -> Stage:
    """{"op": "quantile_normalize", "key": "event_type"?, "val":
    "value"?, "id": "event_id"?} — map each group's value
    distribution onto the pooled global distribution."""
    from osmray.windows import quantile_normalize

    return lambda ds: quantile_normalize(
        ds, key=p.get("key", "event_type"),
        val_col=p.get("val", "value"), id_col=p.get("id", "event_id"))


STAGES.update({"quantile_normalize": _quantile_normalize})


def _holt(p: dict) -> Stage:
    """{"op": "holt", "sf_dir": "..."} — Holt level+trend smoothing
    per user stream (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_holt(p["sf_dir"])


STAGES.update({"holt": _holt})


def _haar(p: dict) -> Stage:
    """{"op": "haar", "sf_dir": "..."} — Haar band energies per user
    stream (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_haar(p["sf_dir"])


STAGES.update({"haar": _haar})


def _hll_union(p: dict) -> Stage:
    """{"op": "hll_union", "group": "event_type"?, "value":
    "user_id"?} — merge per-group HLL sketches into one global
    register set (bucketwise max)."""
    from ray.data.aggregate import Max

    from osmray.sketch import hll_registers

    def run(ds):
        per = hll_registers(ds, p.get("group", "event_type"),
                            p.get("value", "user_id"))
        return (per.select_columns(["bucket", "rho_max"])
                .groupby("bucket").aggregate(
                    Max("rho_max", alias_name="rho_max")))

    return run


STAGES.update({"hll_union": _hll_union})


def _dissolve(p: dict) -> Stage:
    """{"op": "dissolve", "sf_dir": "..."} — per-attribute
    connected-region dissolve over the part cell grid (source
    step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_dissolve(p["sf_dir"])


STAGES.update({"dissolve": _dissolve})


def _kmv_union(p: dict) -> Stage:
    """{"op": "kmv_union", "sf_dir": "..."} — two-shard KMV sketch
    merge certified against the undivided input (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_kmv_union(p["sf_dir"])


STAGES.update({"kmv_union": _kmv_union})


def _cms_union(p: dict) -> Stage:
    """{"op": "cms_union", "sf_dir": "..."} — two-shard Count-Min
    merge certified against the undivided input (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_cms_union(p["sf_dir"])


STAGES.update({"cms_union": _cms_union})


def _str_pack(p: dict) -> Stage:
    """{"op": "str_pack", "sf_dir": "..."} — STR R-tree bulk-load
    leaf packing with per-node MBRs (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_str_pack(p["sf_dir"])


STAGES.update({"str_pack": _str_pack})


def _rtree_probe(p: dict) -> Stage:
    """{"op": "rtree_probe", "sf_dir": "..."} — STR-leaf selectivity
    probe for order-derived query boxes (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_rtree_probe(p["sf_dir"])


STAGES.update({"rtree_probe": _rtree_probe})


def _freq_spectrum(p: dict) -> Stage:
    """{"op": "freq_spectrum"} — quarter-log word frequency spectrum
    over a text column."""
    from osmray.queries import (_hashed_string_counts,
                                _token_block_partials)
    from osmray.tableops import sorted_fold_sums

    def run(ds):
        import numpy as np
        import pyarrow as pa

        counts = _hashed_string_counts(
            ds.map_batches(lambda b: _token_block_partials(b, False),
                           batch_format="pyarrow"), ["w"])

        def bins(batch):
            n = batch["n"].to_numpy(zero_copy_only=False).astype("int64")
            b = np.floor(4 * np.log2(n.astype("float64"))).astype("int64")
            u, inv = np.unique(b, return_inverse=True)
            return pa.table({
                "b": pa.array(u),
                "n_words": pa.array(np.bincount(inv).astype("int64")),
                "n_tokens": pa.array(np.bincount(
                    inv, weights=n).astype("int64"))})

        return sorted_fold_sums(
            counts.map_batches(bins, batch_format="pyarrow"),
            "b", ["n_words", "n_tokens"])

    return run


STAGES.update({"freq_spectrum": _freq_spectrum})


def _rfm(p: dict) -> Stage:
    """{"op": "rfm", "sf_dir": "..."} — RFM quintile segmentation per
    user (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_rfm(p["sf_dir"])


STAGES.update({"rfm": _rfm})


def _dwell(p: dict) -> Stage:
    """{"op": "dwell", "sf_dir": "..."} — time-weighted dwell per
    walk cell (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_dwell(p["sf_dir"])


STAGES.update({"dwell": _dwell})


def _slack(p: dict) -> Stage:
    """{"op": "slack", "sf_dir": "..."} — per-task critical-path
    slack (forward + backward longest paths; source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_slack(p["sf_dir"])


STAGES.update({"slack": _slack})


def _outliers(p: dict) -> Stage:
    """{"op": "outliers", "sf_dir": "..."} — MAD-rule outlier counts
    per event type (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_outliers(p["sf_dir"])


STAGES.update({"outliers": _outliers})


def _lorenz(p: dict) -> Stage:
    """{"op": "lorenz", "sf_dir": "..."} — Lorenz curve deciles
    (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_lorenz(p["sf_dir"])


def _vocab_growth(p: dict) -> Stage:
    """{"op": "vocab_growth", "sf_dir": "..."} — Heaps vocabulary
    growth checkpoints (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_vocab_growth(p["sf_dir"])


def _first_touch(p: dict) -> Stage:
    """{"op": "first_touch", "sf_dir": "..."} — first-touch
    attribution counts (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_first_touch(p["sf_dir"])


def _canonical_docs(p: dict) -> Stage:
    """{"op": "canonical_docs", "sf_dir": "..."} — quality-canonical
    exact-dup selection (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_canonical_docs(p["sf_dir"])


STAGES.update({"lorenz": _lorenz, "vocab_growth": _vocab_growth,
               "first_touch": _first_touch,
               "canonical_docs": _canonical_docs})


def _change_pyramid(p: dict) -> Stage:
    """{"op": "change_pyramid", "sf_dir": "..."} — per-zoom
    re-render workload after a change set (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_change_pyramid(p["sf_dir"])


STAGES.update({"change_pyramid": _change_pyramid})


def _merkle(p: dict) -> Stage:
    """{"op": "merkle", "sf_dir": "..."} — content-addressed
    partition digests + exact root (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_merkle(p["sf_dir"])


STAGES.update({"merkle": _merkle})


def _time_to_convert(p: dict) -> Stage:
    """{"op": "time_to_convert", "sf_dir": "..."} — survival
    quantiles of signup->purchase latency (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_time_to_convert(p["sf_dir"])


STAGES.update({"time_to_convert": _time_to_convert})


def _profile(p: dict) -> Stage:
    """{"op": "profile", "columns": [int64 cols]} — catalog profile
    (n, min, max, exact n_distinct) of the upstream dataset's integer
    columns, all columns in one packed-key fold."""
    from osmray.tableops import profile_columns

    return lambda ds: profile_columns(ds, list(p["columns"]))


def _assoc_rules(p: dict) -> Stage:
    """{"op": "assoc_rules", "key": col, "item": col, "min_count": 2?,
    "conf_num": 1?, "conf_den": 10?, "item_bits": 21?} — directed
    association rules lhs -> rhs over upstream (key, item) baskets
    with integer-exact confidence gate."""
    from osmray.tableops import assoc_rules

    return lambda ds: assoc_rules(
        ds, p["key"], p["item"], min_count=int(p.get("min_count", 2)),
        conf_num=int(p.get("conf_num", 1)),
        conf_den=int(p.get("conf_den", 10)),
        item_bits=int(p.get("item_bits", 21)))


def _substring_dups(p: dict) -> Stage:
    """{"op": "substring_dups", "id": "doc_id"?, "text": "text"?,
    "gram_len": 32?, "stride": 8?, "min_docs": 2?} — exact repeated
    substrings shared by >= min_docs upstream documents."""
    from osmray.text import substring_dups

    return lambda ds: substring_dups(
        ds, p.get("id", "doc_id"), p.get("text", "text"),
        gram_len=int(p.get("gram_len", 32)),
        stride=int(p.get("stride", 8)),
        min_docs=int(p.get("min_docs", 2)))


def _link_predict(p: dict) -> Stage:
    """{"op": "link_predict", "k": 50?, "src": "u"?, "dst": "v"?} —
    top-k common-neighbor link prediction over the upstream edge
    dataset (symmetrized internally)."""
    import pyarrow as _pa

    from osmray.queries import link_predict_topk

    def s(ds):
        src, dst = p.get("src", "u"), p.get("dst", "v")

        def sym(batch: _pa.Table) -> _pa.Table:
            import numpy as _np

            u = batch[src].to_numpy(zero_copy_only=False)
            v = batch[dst].to_numpy(zero_copy_only=False)
            return _pa.table({"via": _pa.array(_np.concatenate((u, v))),
                              "nb": _pa.array(_np.concatenate((v, u)))})

        return link_predict_topk(
            ds.map_batches(sym, batch_format="pyarrow"),
            k=int(p.get("k", 50)))

    return s


def _containment_join(p: dict) -> Stage:
    """{"op": "containment_join", "id": "doc_id"?, "toks": "toks"?,
    "t_num": 4?, "t_den": 5?} — directional containment self-join
    (quote / excerpt detection) over upstream (id, token-list)."""
    from osmray.simjoin import containment_join

    return lambda ds: containment_join(
        ds, p.get("id", "doc_id"), p.get("toks", "toks"),
        t_num=int(p.get("t_num", 4)), t_den=int(p.get("t_den", 5)))


STAGES.update({
    "profile": _profile,
    "assoc_rules": _assoc_rules,
    "substring_dups": _substring_dups,
    "link_predict": _link_predict,
    "containment_join": _containment_join,
})


def _pq_encode(p: dict) -> Stage:
    """{"op": "pq_encode", "id": "vec_id"?, "vec": "embedding"?} —
    product-quantization codes (4x16x16 hash-derived codebook, exact
    integer milli-space) for the upstream (id, vector) dataset."""
    from osmray.queries import pq_encode

    return lambda ds: pq_encode(ds, id_col=p.get("id", "vec_id"),
                                vec_col=p.get("vec", "embedding"))


def _record_linkage(p: dict) -> Stage:
    """{"op": "record_linkage", "sf_dir": "..."} — blocked entity
    resolution of the dirty customer clone (source step)."""
    from osmray import queries as _Q

    return lambda ds: _Q.q_record_linkage(p["sf_dir"])


STAGES.update({"pq_encode": _pq_encode, "record_linkage": _record_linkage})
