"""Declared Arrow schemas for every logical table (the reference had no
schemas — everything was positional tuples; the engine validates these
at the read boundary).

- ``IMAGES`` is the BASELINE.json input_hint shape: (image_id:string,
  bytes:binary, w:int32, h:int32, fmt:string, caption:string,
  phash:int64), plus the footprint sidecar (lat, lng) the tile
  assignment consumes (FIXTURES.md §1).
- ``FEATURES`` carries OSM-style vector features: geometry as parallel
  ``list<float64>`` lat/lng columns (vectorized access without struct
  unnesting) and tags as a map.
- ``LABELED`` is the output contract of the flagship pipeline:
  tile key + label + mask + round-tripped image + caption + lineage
  partition id.
"""

from __future__ import annotations

import pyarrow as pa

IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("lat", pa.float64()),
        ("lng", pa.float64()),
    ]
)

FEATURES = pa.schema(
    [
        ("feature_id", pa.int64()),
        ("kind", pa.string()),  # node | way | polygon | exclusion
        ("tags", pa.map_(pa.string(), pa.string())),
        ("geom_lat", pa.list_(pa.float64())),
        ("geom_lng", pa.list_(pa.float64())),
    ]
)

ASSIGNED_EXTRA = [
    ("z", pa.int8()),
    ("tx", pa.int64()),
    ("ty", pa.int64()),
    ("rx", pa.float64()),
    ("ry", pa.float64()),
    ("tile_key", pa.int64()),
    ("cell", pa.int64()),
    ("edge_ok", pa.bool_()),
]

LABELED = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_key", pa.int64()),
        ("z", pa.int8()),
        ("tx", pa.int64()),
        ("ty", pa.int64()),
        ("cell", pa.int64()),
        ("label", pa.string()),
        ("split", pa.string()),
        ("mask", pa.binary()),  # png-encoded 256x256 uint8 label mask
        ("mask_any", pa.bool_()),  # tile touched by any feature
        ("bytes", pa.binary()),  # round-tripped encoded pixels
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("psnr_ok", pa.bool_()),  # >=40 dB gate (inf for lossless)
        ("phash_ok", pa.bool_()),  # stored phash matches decoded pixels
        ("decode_ok", pa.bool_()),  # False = quarantined corrupt blob
        ("part_id", pa.int64()),
    ]
)

LINEAGE = pa.schema(
    [
        ("part_id", pa.int64()),
        ("fragment", pa.string()),
        ("rows_in", pa.int64()),
        ("rows_out", pa.int64()),
        ("wall_ms", pa.float64()),
        ("checksum", pa.int64()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, name: str) -> None:
    """Read-boundary check: every declared column present with the
    declared type (extra columns allowed — projections are the norm)."""
    for f in schema:
        if f.name not in table.schema.names:
            raise ValueError(f"{name}: missing column {f.name}")
        got = table.schema.field(f.name).type
        if got != f.type:
            raise TypeError(f"{name}.{f.name}: expected {f.type}, got {got}")
