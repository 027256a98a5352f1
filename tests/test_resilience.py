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


def test_grace_join_survives_spill_worker_death(ray_session, tmp_path):
    """A build-side SPILL task that dies mid-flight must not
    duplicate build rows on retry: spill file names are deterministic
    per (task, call) — the retry overwrites its own files. uuid4
    names failed exactly this injection."""
    import pandas as pd
    import ray.data

    from osmray.joins import bucketed_join

    rng = np.random.default_rng(59)
    l = pa.table({"k": pa.array(rng.integers(0, 50, 2000).astype(np.int64)),
                  "lv": pa.array(np.arange(2000, dtype=np.int64))})
    r = pa.table({"k2": pa.array(rng.integers(0, 50, 800).astype(np.int64)),
                  "rv": pa.array(np.arange(800, dtype=np.int64))})

    sentinel = str(tmp_path / "spill_died_once")

    right = ray.data.from_arrow(r).repartition(6)
    left = ray.data.from_arrow(l).repartition(4)

    want = bucketed_join(left, right, on="k", right_on="k2",
                         num_buckets=5).to_pandas()
    # the seam kills the spill worker AFTER its first file is on
    # disk, exactly once; the retried task must overwrite its own
    # files (deterministic names), not write a second copy
    from osmray.joins import _FAULT_TRIGGER

    with open(_FAULT_TRIGGER, "w") as fh:
        fh.write(sentinel)
    try:
        got = bucketed_join(left, right, on="k", right_on="k2",
                            num_buckets=5).to_pandas()
    finally:
        os.remove(_FAULT_TRIGGER)
    assert os.path.exists(sentinel)
    cols = list(want.columns)
    want = want.sort_values(cols).reset_index(drop=True)
    got = got.sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
