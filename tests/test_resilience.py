"""Worker-loss resilience: a map_batches task that dies mid-flight
(process exit, i.e. a system failure) is retried by Ray and the
pipeline completes with byte-identical results — the single-node
stand-in for node loss on a real cluster."""

import os

import numpy as np
import pyarrow as pa


def test_map_batches_survives_worker_death(ray_session, tmp_path):
    import ray.data

    sentinel = str(tmp_path / "died_once")

    def kernel(batch: pa.Table) -> pa.Table:
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table({"v": batch["v"], "sq": pa.array(v * v)})

    def faulty(batch: pa.Table) -> pa.Table:
        # first task to arrive kills its whole worker process — a
        # SYSTEM failure (not an exception), which Ray retries
        if not os.path.exists(sentinel):
            try:
                fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)
            except FileExistsError:
                pass
        return kernel(batch)

    df = pa.table({"v": pa.array(np.arange(5000, dtype=np.int64))})
    ds = ray.data.from_arrow(df).repartition(8)
    clean = ds.map_batches(kernel, batch_format="pyarrow").to_pandas()
    got = ds.map_batches(faulty, batch_format="pyarrow").to_pandas()
    assert os.path.exists(sentinel)  # the crash really happened
    clean = clean.sort_values("v").reset_index(drop=True)
    got = got.sort_values("v").reset_index(drop=True)
    assert (got["sq"].to_numpy() == clean["sq"].to_numpy()).all()
    assert len(got) == 5000
