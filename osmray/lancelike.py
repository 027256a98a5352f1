"""Lance-style dataset layout: a directory of deterministic parquet
fragments + a JSON manifest, with per-partition lineage records and
skip-completed resume.

The reference's de-facto checkpoint layer was file-existence caches
(tile JPEGs at lib/layers.py:77-78, Overpass JSON at
lib/loaders.py:14-16): rerunning a script resumes where it left off.
The engine formalizes that for distributed output (north_rule:
"resumable from checkpoint with per-partition lineage + metrics"):

- one fragment per partition key (``part_id``), written ATOMICALLY
  (tmp file + rename) to ``<root>/part=<id>/data.parquet``;
- a fragment that already exists is skipped on rerun (first writer
  wins — the distributed analogue of ``if not os.path.isfile(dst)``,
  make_buildings.py:45-46), recorded in lineage as ``skipped``;
- every partition emits exactly one lineage record (part_id, rows,
  wall_ms, checksum); the driver assembles ``manifest.json`` from the
  small lineage table after the run.

Layout is pyarrow-parquet behind a narrow adapter seam: on a cluster
with pylance installed, ``write_fragment``/``read_dataset`` are the
only functions to swap.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def fragment_path(root: str, part_id: int) -> str:
    return os.path.join(root, f"part={part_id}", "data.parquet")


def write_fragment(root: str, part_id: int, table: pa.Table, sort_key: str | None = None) -> dict:
    """Write one partition atomically; skip if the fragment exists.
    Returns the lineage record. Rows are sorted by ``sort_key`` inside
    the fragment so output is deterministic under any parallelism."""
    t0 = time.perf_counter()
    dst = fragment_path(root, part_id)
    rows_in = table.num_rows
    if sort_key is not None and rows_in:
        table = table.sort_by(sort_key)
    if os.path.exists(dst):
        return {
            "part_id": part_id,
            "fragment": dst,
            "rows_in": rows_in,
            "rows_out": pq.ParquetFile(dst).metadata.num_rows,
            "wall_ms": 0.0,
            "checksum": _checksum(table, sort_key),
            "skipped": True,
        }
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, dst)  # atomic publish
    return {
        "part_id": part_id,
        "fragment": dst,
        "rows_in": rows_in,
        "rows_out": rows_in,
        "wall_ms": (time.perf_counter() - t0) * 1e3,
        "checksum": _checksum(table, sort_key),
        "skipped": False,
    }


def _checksum(table: pa.Table, sort_key: str | None) -> int:
    """Order-insensitive content checksum over the key column (or row
    count when keyless) — cheap lineage integrity, not cryptographic."""
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


def write_dataset(ds, root: str, part_col: str = "part_id", sort_key: str | None = None):
    """Distributed resumable sink: shuffle by partition key, write one
    fragment per partition (atomically, skip-if-done), return the
    lineage table (small — one row per partition).

    ``ds`` is a ray.data.Dataset containing ``part_col``.
    """
    os.makedirs(root, exist_ok=True)

    def _write_group(table: pa.Table) -> pa.Table:
        # arrow-native group: no pandas round-trip of the binary payload
        part_id = int(table[part_col][0].as_py())
        rec = write_fragment(root, part_id, table, sort_key)
        return pa.Table.from_pylist([{k: v for k, v in rec.items()}])

    lineage = ds.groupby(part_col).map_groups(_write_group, batch_format="pyarrow")
    ldf = lineage.to_pandas()  # one row per partition: small by design
    manifest = {
        "format": "osmray-lancelike-v1",
        "part_col": part_col,
        "partitions": sorted(
            ldf.drop(columns=["fragment"]).to_dict("records"), key=lambda r: r["part_id"]
        ),
    }
    with open(os.path.join(root, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, default=int)
    return ldf


def read_dataset(root: str, columns: list[str] | None = None):
    """Read a lancelike dataset back as a ray.data.Dataset."""
    import glob

    import ray.data

    frags = sorted(glob.glob(os.path.join(root, "part=*", "data.parquet")))
    return ray.data.read_parquet(frags, columns=columns)


def read_manifest(root: str) -> dict | None:
    p = os.path.join(root, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def completed_parts(root: str) -> set[int]:
    import glob
    import re

    out = set()
    for d in glob.glob(os.path.join(root, "part=*")):
        if os.path.exists(os.path.join(d, "data.parquet")):
            m = re.search(r"part=(-?\d+)$", d)
            if m:
                out.add(int(m.group(1)))
    return out
