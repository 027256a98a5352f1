"""Lance-style dataset layout: a directory of deterministic parquet
fragments + a JSON manifest, with per-partition lineage records and
skip-completed resume.

The reference's de-facto checkpoint layer was file-existence caches
(tile JPEGs at lib/layers.py:77-78, Overpass JSON at
lib/loaders.py:14-16): rerunning a script resumes where it left off.
The engine formalizes that for distributed output (north_rule:
"resumable from checkpoint with per-partition lineage + metrics"):

- each partition (``part_id``) is a directory ``<root>/part=<id>/``
  holding one or more BLOCK fragments ``block-<tag>.parquet``; a block
  is written ATOMICALLY (tmp file + rename) straight from the
  ``map_batches`` task that produced its rows — the sink performs NO
  shuffle: image payloads stream from the producing stage to storage
  without an all-to-all exchange (this was round 1's dominant scaling
  residual);
- the block tag is derived from the block's content checksum, so an
  identical rerun produces the identical file set and a task retry
  that finds its block already published skips the write (the
  distributed analogue of ``if not os.path.isfile(dst)``,
  make_buildings.py:45-46);
- resume is PART-granular: ``manifest.json`` (written by the driver
  after all blocks land) records each part's block list + rows +
  checksum; on rerun, parts whose manifest entry is intact on disk are
  filtered out of the pipeline by a broadcast keys-only filter
  (``completed_parts``/``pending_filter``), and stale blocks of
  incomplete parts are deleted before rewriting;
- every partition emits exactly one lineage record (part_id, rows,
  wall_ms, checksum, n_blocks, skipped); for skipped parts the record
  is taken from the manifest, i.e. it describes the bytes ON DISK,
  not a recomputation;
- writes are VERSIONED (Lance-style): a write whose file set differs
  from the newest snapshot commits ``_versions/manifest-<n>.json``
  (identical resumes commit nothing — block names are content-
  derived, so same files == same data); ``read_dataset(version=N)``
  time-travels, reads always resolve files through a manifest (never
  a glob), stale-block cleanup spares fragments any committed version
  still references, and ``vacuum(keep_last=k)`` is the only deleter
  of versioned data.

Layout is pyarrow-parquet behind a narrow adapter seam: on a cluster
with pylance installed, ``write_block``/``read_dataset`` are the only
functions to swap. On a multi-node cluster ``root`` must be shared
storage (NFS / object store URI) — same assumption as any file sink.
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST = "manifest.json"
VERSIONS_DIR = "_versions"
FORMAT = "osmray-lancelike-v2"


def part_dir(root: str, part_id: int) -> str:
    return os.path.join(root, f"part={part_id}")


def part_files(root: str, part_id: int) -> list[str]:
    """Block fragments currently on disk for one partition."""
    return sorted(glob.glob(os.path.join(part_dir(root, part_id), "block-*.parquet")))


def _checksum(table: pa.Table, sort_key: str | None) -> int:
    """Order- and partition-insensitive content checksum over the key
    column (or row count when keyless) — cheap lineage integrity, not
    cryptographic. XOR-reduced, so the checksum of a part equals the
    XOR of its blocks' checksums regardless of how rows were split."""
    if sort_key is None or sort_key not in table.schema.names or not table.num_rows:
        return table.num_rows
    col = table[sort_key]
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        import zlib

        # process-stable string hash (builtin hash() is randomized per
        # process, which would break cross-run checksum comparison)
        v = np.asarray(
            [zlib.crc32(str(s).encode()) for s in col.to_pylist()], dtype=np.int64
        )
    mixed = (v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(
        0xDEADBEEFCAFEF00D
    )
    return int(np.bitwise_xor.reduce(mixed).astype(np.int64))


def write_block(root: str, part_id: int, table: pa.Table, sort_key: str | None = None) -> dict:
    """Write one block fragment atomically; idempotent under task
    retry (a block whose deterministic name already exists is not
    rewritten). Rows are sorted by ``sort_key`` inside the block so
    output is deterministic under any parallelism."""
    t0 = time.perf_counter()
    if sort_key is not None and table.num_rows:
        table = table.sort_by(sort_key)
    csum = _checksum(table, sort_key)
    tag = f"{np.uint64(csum):016x}-{table.num_rows}"
    dst = os.path.join(part_dir(root, part_id), f"block-{tag}.parquet")
    if not os.path.exists(dst):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        tmp = dst + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, dst)  # atomic publish
    return {
        "part_id": part_id,
        "block": os.path.basename(dst),
        "rows": table.num_rows,
        "wall_ms": (time.perf_counter() - t0) * 1e3,
        "checksum": csum,
    }


def read_manifest(root: str, version: int | None = None) -> dict | None:
    """Latest manifest, or the snapshot at ``version`` (time travel)."""
    if version is None:
        p = os.path.join(root, MANIFEST)
    else:
        p = os.path.join(root, VERSIONS_DIR, f"manifest-{version:06d}.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def versions(root: str) -> list[int]:
    """Committed dataset versions, oldest first (Lance-style: every
    write that changes the partition set commits a numbered manifest
    snapshot; an identical rerun commits nothing)."""
    out = []
    for p in glob.glob(os.path.join(root, VERSIONS_DIR, "manifest-*.json")):
        try:
            out.append(int(os.path.basename(p)[len("manifest-"):-len(".json")]))
        except ValueError:
            continue
    return sorted(out)


def _referenced_blocks(root: str) -> set[str]:
    """part=<id>/block-... paths referenced by ANY committed version —
    these must survive stale-block cleanup so old versions stay
    readable (vacuum is the only deleter of versioned data)."""
    refs = set()
    for v in versions(root):
        m = read_manifest(root, v) or {}
        for rec in m.get("partitions", []):
            for b in rec.get("blocks", []):
                refs.add(os.path.join(f"part={int(rec['part_id'])}", b))
    return refs


def vacuum(root: str, keep_last: int = 1) -> dict:
    """Drop all but the newest ``keep_last`` version snapshots, then
    delete block fragments no surviving manifest (including the
    latest) references. Returns {"versions_dropped": n,
    "blocks_deleted": n}."""
    vs = versions(root)
    drop = vs[:-keep_last] if keep_last > 0 else vs
    for v in drop:
        os.remove(os.path.join(root, VERSIONS_DIR, f"manifest-{v:06d}.json"))
    keep = _referenced_blocks(root)
    for rec in _manifest_parts(root).values():
        for b in rec.get("blocks", []):
            keep.add(os.path.join(f"part={int(rec['part_id'])}", b))
    deleted = 0
    for f in glob.glob(os.path.join(root, "part=*", "block-*.parquet")):
        rel = os.path.relpath(f, root)
        if rel not in keep:
            os.remove(f)
            deleted += 1
    return {"versions_dropped": len(drop), "blocks_deleted": deleted}


def _manifest_parts(root: str) -> dict[int, dict]:
    m = read_manifest(root)
    if not m:
        return {}
    return {int(rec["part_id"]): rec for rec in m.get("partitions", [])}


def completed_parts(root: str) -> set[int]:
    """Parts whose manifest entry is intact on disk (every recorded
    block file present). A part with a missing/deleted block is NOT
    complete and will be rewritten on resume."""
    out = set()
    for pid, rec in _manifest_parts(root).items():
        blocks = rec.get("blocks", [])
        if blocks and all(
            os.path.exists(os.path.join(part_dir(root, pid), b)) for b in blocks
        ):
            out.add(pid)
    return out


def pending_filter(ds, root: str, part_col: str = "part_id"):
    """Drop rows belonging to already-completed partitions — a
    broadcast keys-only filter, applied as early as the partition key
    exists so resumed runs skip the downstream compute too."""
    done = completed_parts(root)
    if not done:
        return ds
    import ray

    ref = ray.put(np.sort(np.fromiter(done, dtype=np.int64)))

    def f(batch: pa.Table) -> pa.Table:
        k = batch[part_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(k, ray.get(ref))))

    return ds.map_batches(f, batch_format="pyarrow")


def write_dataset(ds, root: str, part_col: str = "part_id", sort_key: str | None = None,
                  batch_rows: int | None = 1024):
    """Distributed resumable sink with NO shuffle: every ``map_batches``
    task groups its batch by partition key (a local arrow sort over the
    batch, not an exchange) and writes one block fragment per group
    directly; the driver then compacts the small per-block lineage into
    ``manifest.json``. Completed parts (per the existing manifest) are
    filtered out up front and reported as ``skipped`` with their
    on-disk lineage. Returns the per-part lineage DataFrame.

    ``batch_rows`` coalesces upstream blocks into write batches of at
    least that many rows (zero-copy bundling by the streaming
    executor): without it, a write task runs per upstream BLOCK and a
    fine-blocked pipeline fragments every partition into dozens of
    tiny parquet files (observed: 2,590 fragments / ~14 rows each for
    a 23,872-row run). ``None`` restores block-per-task.

    ``ds`` is a ray.data.Dataset containing ``part_col``.
    """
    import pandas as pd

    os.makedirs(root, exist_ok=True)
    prior = _manifest_parts(root)
    done = completed_parts(root)

    # stale blocks of incomplete parts (crashed run / deleted file /
    # different parallelism) would duplicate rows — clear them first,
    # EXCEPT blocks a committed version still references (time travel;
    # vacuum() is the only deleter of versioned data)
    pinned = _referenced_blocks(root)
    for d in glob.glob(os.path.join(root, "part=*")):
        try:
            pid = int(d.rsplit("=", 1)[1])
        except ValueError:
            continue
        if pid not in done:
            for f in glob.glob(os.path.join(d, "block-*.parquet")):
                if os.path.relpath(f, root) not in pinned:
                    os.remove(f)

    ds = pending_filter(ds, root, part_col)

    def write_blocks(batch: pa.Table) -> pa.Table:
        order = np.argsort(batch[part_col].to_numpy(zero_copy_only=False), kind="stable")
        batch = batch.take(pa.array(order))
        parts = batch[part_col].to_numpy(zero_copy_only=False)
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(parts)) + 1, [len(parts)]))
        recs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            recs.append(
                write_block(root, int(parts[lo]), batch.slice(lo, hi - lo), sort_key)
            )
        return pa.Table.from_pylist(recs)

    bds = ds.map_batches(write_blocks, batch_format="pyarrow", batch_size=batch_rows)
    bdf = bds.to_pandas()
    if os.environ.get("OSMRAY_STATS"):
        import sys

        print(bds.stats(), file=sys.stderr, flush=True)

    partitions = []
    for pid in sorted(done):
        rec = dict(prior[pid])
        rec["skipped"] = True
        partitions.append(rec)
    if len(bdf):
        for pid, g in bdf.groupby("part_id"):
            partitions.append(
                {
                    "part_id": int(pid),
                    "rows_in": int(g["rows"].sum()),
                    "rows_out": int(g["rows"].sum()),
                    "wall_ms": float(g["wall_ms"].sum()),
                    "checksum": int(np.bitwise_xor.reduce(g["checksum"].to_numpy().astype(np.uint64)).astype(np.int64))
                    if sort_key is not None
                    else int(g["rows"].sum()),
                    "n_blocks": int(len(g)),
                    "blocks": sorted(g["block"].tolist()),
                    "skipped": False,
                }
            )
    partitions.sort(key=lambda r: r["part_id"])
    manifest = {"format": FORMAT, "part_col": part_col, "partitions": partitions}
    _commit_manifest(root, manifest)
    ldf = pd.DataFrame(
        [{k: v for k, v in rec.items() if k != "blocks"} for rec in partitions]
    )
    return ldf


def read_dataset(root: str, columns: list[str] | None = None,
                 version: int | None = None):
    """Read a lancelike dataset back as a ray.data.Dataset — the
    MANIFEST's file list, never a directory glob (stale or
    old-version fragments on disk must not leak into the read).
    ``version=N`` time-travels to that committed snapshot; default is
    the latest manifest (glob fallback only for manifest-less
    roots)."""
    import ray.data

    m = read_manifest(root, version)
    if m is None and version is not None:
        raise FileNotFoundError(f"no committed version {version} under {root}")
    if m is None:
        frags = sorted(glob.glob(os.path.join(root, "part=*", "block-*.parquet")))
    else:
        frags = sorted(
            os.path.join(root, f"part={int(rec['part_id'])}", b)
            for rec in m.get("partitions", []) for b in rec.get("blocks", []))
    # bulk read = metadata-SKIPPING: the manifest already is the file
    # list, so the default read_parquet's per-fragment footer fetch
    # (measured 1.9 s serial for ~1.5k fragments — a config-independent
    # cost that suppresses N->4N scaling) buys nothing here. One block
    # per fragment matches the sink's write granularity. Unlike the
    # default reader it does NOT invent a hive "part" column from the
    # part=<id> directory names — part_id is a real column.
    return ray.data.read_parquet_bulk(frags, columns=columns)


def _fileset(m: dict) -> list:
    return sorted((int(r["part_id"]), b)
                  for r in m.get("partitions", []) for b in r["blocks"])


def _commit_manifest(root: str, manifest: dict) -> None:
    """Atomically publish ``manifest.json`` and, Lance-style, snapshot
    it under a new version number iff the FILE SET changed (skipped
    flags don't count — an identical resume commits nothing). Block
    names are content-derived, so "same files" == "same data"."""
    tmp = os.path.join(root, MANIFEST + f".tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, default=int)
    os.replace(tmp, os.path.join(root, MANIFEST))

    vs = versions(root)
    latest = read_manifest(root, vs[-1]) if vs else None
    if latest is None or _fileset(latest) != _fileset(manifest):
        vdir = os.path.join(root, VERSIONS_DIR)
        os.makedirs(vdir, exist_ok=True)
        vnum = (vs[-1] + 1) if vs else 1
        vtmp = os.path.join(vdir, f".tmp.{os.getpid()}")
        with open(vtmp, "w") as fh:
            json.dump(manifest, fh, indent=1, default=int)
        os.replace(vtmp, os.path.join(vdir, f"manifest-{vnum:06d}.json"))


def compact(root: str, min_blocks: int = 2, sort_key: str | None = None):
    """Lance-style compaction: merge every partition holding >=
    ``min_blocks`` block fragments into ONE fragment, commit a new
    manifest version, and leave the old fragments for time travel
    (``vacuum`` reclaims them). The no-shuffle sink writes one
    fragment per (write batch x part) — a long-running 100-TB job
    accumulates many ~16-row files per part; compaction restores read
    granularity WITHOUT touching row content.

    Distributed: one Ray task per compacted part (each part's data is
    bounded by construction); serial fallback without a Ray session.
    Invariant checked: the merged block's content checksum must equal
    the XOR of the replaced blocks' checksums (``_checksum`` is
    order- and split-insensitive), so corruption in any fragment
    fails loudly instead of committing. ``sort_key`` defaults to the
    key recorded per-part usage in write_block (pass the same key the
    dataset was written with to keep merged blocks sorted).

    Returns a lineage DataFrame (part_id, n_blocks_before, rows,
    compacted)."""
    import pandas as pd

    m = read_manifest(root)
    if m is None:
        raise FileNotFoundError(f"no manifest under {root}; nothing to compact")

    def _merge_one(pid: int, blocks: list[str], want_csum: int) -> dict:
        paths = [os.path.join(part_dir(root, pid), b) for b in blocks]
        t = pa.concat_tables([pq.read_table(p) for p in paths])
        rec = write_block(root, pid, t, sort_key)
        if sort_key is not None and rec["checksum"] != want_csum:
            raise ValueError(
                f"compact: part {pid} merged checksum {rec['checksum']} != "
                f"manifest {want_csum} — a fragment is corrupt or was "
                f"written with a different sort_key; refusing to commit")
        return rec

    todo = [r for r in m["partitions"] if len(r["blocks"]) >= max(2, min_blocks)]
    results = {}
    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover - ray is a hard dep in practice
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        f = ray.remote(num_cpus=1)(_merge_one)
        refs = [f.remote(int(r["part_id"]), r["blocks"], int(r["checksum"]))
                for r in todo]
        for r, rec in zip(todo, ray.get(refs)):
            results[int(r["part_id"])] = rec
    else:
        for r in todo:
            results[int(r["part_id"])] = _merge_one(
                int(r["part_id"]), r["blocks"], int(r["checksum"]))

    out = []
    parts = []
    for r in m["partitions"]:
        pid = int(r["part_id"])
        rec = dict(r)
        if pid in results:
            nrec = results[pid]
            rec["blocks"] = [nrec["block"]]
            rec["n_blocks"] = 1
            rec["checksum"] = nrec["checksum"]
        parts.append(rec)
        out.append({"part_id": pid,
                    "n_blocks_before": len(r["blocks"]),
                    "rows": int(r.get("rows_out", r.get("rows", 0))),
                    "compacted": pid in results})
    _commit_manifest(root, dict(m, partitions=parts))
    return pd.DataFrame(out)
