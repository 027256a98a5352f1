"""osmray — a Ray-Data-native spatial-join + tiling engine.

Built from scratch against the capabilities of the reference repo
(shrddr/osmml, read-only at /root/reference): slippy-tile assignment of
image footprints, vector->raster spatial joins of OSM-style features,
complement (negative) sampling, per-tile label-mask rasterization, and
labeled training-set emission — re-expressed as Ray Data pipelines
(``read_parquet -> map_batches -> groupby -> write``) over zero-copy
Arrow batches, designed for multi-node 100 TB scale.

Nothing in here is a port: execution is Ray Data streaming, state lives
in actor pools or broadcast objects, sampling is seeded dataflow (no
mutable global canvas), and outputs are partitioned, resumable
fragment sets with per-partition lineage.
"""

__version__ = "0.1.0"

TILESIZE = 256  # pixels per slippy tile edge (all providers; lib/layers.py:13)
