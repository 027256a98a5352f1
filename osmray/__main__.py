"""CLI entry point — the ``ray job submit`` surface of the engine.

    ray job submit -- python -m osmray label \
        --images '/data/images/*.parquet' --features /data/features.parquet \
        --out /data/labeled --bbox 27.4026,53.8306,27.7003,53.9739 \
        --z 19 --limit 5000

Subcommands: ``label`` (flagship make_original/make_buildings job),
``expand`` (train crops + valid tiles), ``roofshapes`` (per-way
mosaics), ``pipeline --spec job.json`` (declarative step list, the
§2.10 user-extension surface). Re-running with the same ``--out``
resumes: completed partitions are skipped (lancelike manifest).

This script OWNS its Ray session (guarded init — inside ``ray job
submit`` the cluster is already there).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--images", required=True, help="glob of images parquet files")
    p.add_argument("--features", required=True, help="features parquet file")
    p.add_argument("--bbox", required=True, help="W,S,E,N")
    p.add_argument("--z", type=int, default=None,
                   help="zoom; defaults to the selected base config's z "
                        "(19, or 18 with --buildings)")
    p.add_argument("--limit", type=int, default=5000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--edge", type=int, default=None,
                   help="edge margin; defaults to the base config's "
                        "(16, or 24 with --buildings)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU count (ignored on a cluster)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="osmray")
    sub = ap.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("pipeline", help="run a declarative step-list spec (JSON)")
    pp.add_argument("--spec", required=True, help="path to a JSON list of steps")
    pp.add_argument("--out", default=None, help="optional parquet output path")
    pp.add_argument("--num-cpus", type=int, default=None)
    cp = sub.add_parser("compact", help="merge a lancelike dataset's block "
                                        "fragments (one per part); old "
                                        "fragments stay until vacuum")
    cp.add_argument("--root", required=True)
    cp.add_argument("--sort-key", default=None)
    cp.add_argument("--min-blocks", type=int, default=2)
    cp.add_argument("--vacuum", action="store_true",
                    help="also drop old versions + unreferenced fragments")
    cp.add_argument("--num-cpus", type=int, default=None)
    for name in ("label", "expand", "roofshapes"):
        p = sub.add_parser(name)
        _common(p)
        if name == "label":
            p.add_argument("--out", required=True)
            p.add_argument("--buildings", action="store_true",
                           help="polygon positives / edge 24 / exclusion semantics")
            p.add_argument("--mask-attach", choices=["broadcast", "join"], default="broadcast")
        else:
            p.add_argument("--out", required=False, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # fine output blocks: the flagship's decode/re-encode chain is
    # straggler-bound on coarse per-file blocks (see pipeline.py)
    DataContext.get_current().target_max_block_size = 16 * 1024 * 1024

    import dataclasses

    import pyarrow.parquet as pq
    import ray.data

    from osmray import pipeline

    if args.cmd == "compact":
        from osmray import lancelike

        ldf = lancelike.compact(args.root, min_blocks=args.min_blocks,
                                sort_key=args.sort_key)
        summary = {"cmd": "compact",
                   "parts": int(len(ldf)),
                   "compacted": int(ldf["compacted"].sum()),
                   "blocks_before": int(ldf["n_blocks_before"].sum())}
        if args.vacuum:
            summary["vacuum"] = lancelike.vacuum(args.root)
        print(json.dumps(summary))
        return 0

    if args.cmd == "pipeline":
        from osmray.pipelines import run_pipeline

        with open(args.spec) as fh:
            steps = json.load(fh)
        res = run_pipeline(steps)
        if hasattr(res, "to_pandas"):
            df = res.to_pandas()
        else:
            df = res  # terminal write returned lineage
        if args.out:
            df.to_parquet(args.out)
        print(json.dumps({"cmd": "pipeline", "rows_out": int(len(df)),
                          "steps": len(steps)}))
        return 0

    bbox = tuple(float(v) for v in args.bbox.split(","))
    files = sorted(glob.glob(args.images))
    if not files:
        print(f"error: no files match {args.images}", file=sys.stderr)
        return 2
    images = ray.data.read_parquet(files, override_num_blocks=max(1, len(files)))
    feats = pq.read_table(args.features)
    base = pipeline.BUILDINGS if getattr(args, "buildings", False) else pipeline.LabelJobConfig()
    cfg = dataclasses.replace(
        base, bbox=bbox, limit=args.limit, seed=args.seed,
        z=args.z if args.z is not None else base.z,
        edge=args.edge if args.edge is not None else base.edge,
    )

    if args.cmd == "label":
        ds, lineage = pipeline.run_label_job(
            images, feats, cfg, out_dir=args.out, mask_attach=args.mask_attach,
            image_files=files,
        )
        summary = {
            "cmd": "label",
            "rows_out": int(lineage["rows_out"].sum()),
            "partitions": len(lineage),
            "skipped": int(lineage["skipped"].sum()),
            "out": args.out,
        }
    elif args.cmd == "expand":
        ds = pipeline.run_expand_job(images, feats, cfg)
        df = ds.to_pandas().sort_values("req_id").reset_index(drop=True)
        if args.out:
            df.to_parquet(args.out)
        summary = {"cmd": "expand", "rows_out": len(df)}
    else:
        ds, counts = pipeline.run_roofshapes_job(images, feats, cfg)
        df = ds.to_pandas().sort_values("req_id").reset_index(drop=True)
        if args.out:
            df.to_parquet(args.out)
        summary = {"cmd": "roofshapes", "rows_out": len(df),
                   "class_counts": counts.set_index("label")["n_ways"].to_dict()}
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
