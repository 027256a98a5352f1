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


def _guard_joins():
    import ray.data

    from osmray.joins import bucketed_join

    t = pa.table({"k": pa.array([1, 2], pa.int64())})
    bucketed_join(ray.data.from_arrow(t), ray.data.from_arrow(t), on="k")


def _guard_dedup():
    import ray.data

    from osmray import dedup

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa bb cc", "aa bb cc"])}))
    dedup.minhash_lsh_candidates(ds)


def _guard_ann():
    import ray.data

    from osmray.ann import ivf_partition

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1], pa.int64()),
        "embedding": pa.array([[0.1, 0.2]], pa.list_(pa.float64()))}))
    ivf_partition(ds, np.eye(2))


def _guard_simjoin():
    import ray.data

    from osmray.simjoin import jaccard_join

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "toks": pa.array([["a", "b"], ["a", "b"]],
                         pa.list_(pa.string()))}))
    jaccard_join(ds, "doc_id", "toks")


import pytest as _pytest


@_pytest.mark.parametrize("entry", [
    _guard_joins, _guard_dedup, _guard_ann, _guard_simjoin],
    ids=["joins", "dedup-lsh", "ann-ivf", "simjoin-jaccard"])
def test_spill_guard_fires_per_family(ray_session, monkeypatch, entry):
    """r4 verdict #4: EVERY spill-entry family (grace joins, LSH
    pair-gen, IVF layout, similarity join) must refuse a simulated
    multi-node cluster when no shared spill_root is given — the
    node-local tempdir default silently reads empty fragments on
    remote nodes otherwise."""
    import ray

    monkeypatch.setattr(
        ray, "nodes",
        lambda: [{"Alive": True, "NodeID": "a"},
                 {"Alive": True, "NodeID": "b"}])
    with _pytest.raises(ValueError, match="spill_root"):
        entry()


# ---------------------------------------------------------------------------
# Flagship chaos (r4 verdict #6): the 100-TB guarantee is that a job
# losing a WORKER mid-flight, or losing the DRIVER and being rerun over
# the same out_dir, still produces byte-identical output.

_CHAOS_FX = "/tmp/osmray_chaos_fx"


def _chaos_fixture():
    from osmray import synth

    synth.write_fixture(_CHAOS_FX, n_images=512, n_nodes=200,
                        n_ways=40, n_polygons=50)
    return _CHAOS_FX


def _flagship_hash(out_dir: str) -> tuple[str, int]:
    """Canonical content hash of a flagship output dataset: every
    manifest-referenced block, rows sorted by (image_id, tile_key),
    all columns hashed in name order."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    from osmray import lancelike

    m = lancelike.read_manifest(out_dir)
    assert m is not None
    files = [os.path.join(out_dir, f"part={r['part_id']}", b)
             for r in m["partitions"] for b in r["blocks"]]
    assert files and all(os.path.exists(f) for f in files)
    t = pa.concat_tables([pq.read_table(f) for f in files])
    df = t.to_pandas().sort_values(["image_id", "tile_key"]).reset_index(drop=True)
    h = hashlib.sha256()
    for col in sorted(df.columns):
        h.update(col.encode())
        for v in df[col]:
            h.update(repr(v).encode())
    return h.hexdigest(), len(df)


def _run_flagship(images, out_dir: str):
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from osmray import pipeline, synth
    from osmray.pipeline import LabelJobConfig

    cfg = LabelJobConfig(bbox=synth.fixture_bbox(_CHAOS_FX), limit=48,
                         mask_concurrency=2, mask_batch=32)
    feats = pq.read_table(os.path.join(_CHAOS_FX, "features.parquet"))
    return pipeline.run_label_job(images, feats, cfg, out_dir=out_dir)


def test_flagship_survives_worker_death(ray_session, tmp_path):
    """SIGKILL one worker process mid-job: Ray retries the dead task
    and the final dataset is byte-identical to an undisturbed run."""
    import glob

    import ray.data

    root = _chaos_fixture()
    files = sorted(glob.glob(os.path.join(root, "images", "*.parquet")))
    sentinel = str(tmp_path / "chaos_died_once")

    def faulty(batch: pa.Table) -> pa.Table:
        if not os.path.exists(sentinel):
            try:
                fd = os.open(sentinel, os.O_CREAT | os.O_EXCL)
                os.close(fd)
                os._exit(1)  # hard worker death, not an exception
            except FileExistsError:
                pass
        return batch

    _run_flagship(ray.data.read_parquet(files), str(tmp_path / "clean"))
    want, n_want = _flagship_hash(str(tmp_path / "clean"))

    images = ray.data.read_parquet(files).map_batches(
        faulty, batch_format="pyarrow")
    _run_flagship(images, str(tmp_path / "chaos"))
    assert os.path.exists(sentinel)  # a worker really died
    got, n_got = _flagship_hash(str(tmp_path / "chaos"))
    assert n_got == n_want > 0
    assert got == want


_DRIVER_SCRIPT = r"""
import glob, os, sys, time
import pyarrow as pa
import pyarrow.parquet as pq
import ray, ray.data
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from osmray import pipeline, synth
from osmray.pipeline import LabelJobConfig
root, out = sys.argv[1], sys.argv[2]
cfg = LabelJobConfig(bbox=synth.fixture_bbox(root), limit=48,
                     mask_concurrency=2, mask_batch=32)
files = sorted(glob.glob(os.path.join(root, "images", "*.parquet")))
def slow(b):
    time.sleep(0.05)  # stretch the job so blocks land before the kill
    return b
images = ray.data.read_parquet(files).map_batches(slow, batch_format="pyarrow")
feats = pq.read_table(os.path.join(root, "features.parquet"))
ds, lineage = pipeline.run_label_job(images, feats, cfg, out_dir=out)
print("DONE", int(lineage["rows_out"].sum()), flush=True)
ray.shutdown()
"""


def test_flagship_driver_kill_then_rerun(ray_session, tmp_path):
    """A run that dies after block fragments land but before the
    manifest commits leaves blocks-without-manifest (plus possibly
    partial tmp files). Rerunning over that dirty out_dir must clear
    the stale fragments and produce output byte-identical to an
    undisturbed run. Two layers:

    1. DETERMINISTIC: construct the exact crashed state (blocks on
       disk, no manifest, plus a corrupt stray fragment) and rerun.
    2. BEST-EFFORT REAL KILL: SIGKILL the driver process group inside
       the block->manifest window when timing allows (the window is
       ~100 ms for this small fixture, so missing it is tolerated —
       the run that completed is then itself verified identical)."""
    import glob
    import shutil
    import signal
    import subprocess
    import sys
    import time

    import ray.data

    root = _chaos_fixture()
    files = sorted(glob.glob(os.path.join(root, "images", "*.parquet")))
    _run_flagship(ray.data.read_parquet(files), str(tmp_path / "clean"))
    want, n_want = _flagship_hash(str(tmp_path / "clean"))

    # --- layer 1: deterministic crashed-state rerun -------------------
    dirty = str(tmp_path / "dirty")
    _run_flagship(ray.data.read_parquet(files), dirty)
    os.remove(os.path.join(dirty, "manifest.json"))
    shutil.rmtree(os.path.join(dirty, "_versions"))
    victims = glob.glob(os.path.join(dirty, "part=*", "block-*.parquet"))
    with open(victims[0], "r+b") as fh:  # truncate = simulated torn write
        fh.truncate(max(1, os.path.getsize(victims[0]) // 2))
    stray = os.path.join(os.path.dirname(victims[0]),
                         "block-deadbeefdeadbeef-7.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not parquet")
    _run_flagship(ray.data.read_parquet(files), dirty)
    got, n_got = _flagship_hash(dirty)
    assert not os.path.exists(stray)  # stale fragment cleared
    assert n_got == n_want > 0 and got == want

    # --- layer 2: best-effort real SIGKILL mid-window -----------------
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER_SCRIPT)
    out = str(tmp_path / "chaos_out")
    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="")

    def launch():
        return subprocess.Popen(
            [sys.executable, str(script), root, out],
            env=env, start_new_session=True,  # killpg reaps ray children
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)

    killed = False
    for _attempt in range(2):
        shutil.rmtree(out, ignore_errors=True)
        proc = launch()
        try:
            deadline = time.time() + 300
            while time.time() < deadline and proc.poll() is None:
                blocks = glob.glob(os.path.join(out, "part=*", "block-*.parquet"))
                if blocks and not os.path.exists(os.path.join(out, "manifest.json")):
                    os.killpg(proc.pid, signal.SIGKILL)
                    killed = True
                    break
                time.sleep(0.01)
        finally:
            if proc.poll() is None and not killed:
                os.killpg(proc.pid, signal.SIGKILL)
        if killed:
            assert not os.path.exists(os.path.join(out, "manifest.json"))
            break
        # job finished before the poller saw a block: its completed
        # output must itself be correct; try the kill once more
        got, n_got = _flagship_hash(out)
        assert n_got == n_want and got == want

    proc2 = launch()
    out2, _ = proc2.communicate(timeout=600)
    try:  # reap any ray daemons the finished driver left behind
        os.killpg(proc2.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    assert proc2.returncode == 0 and "DONE" in out2
    got, n_got = _flagship_hash(out)
    assert n_got == n_want > 0
    assert got == want
