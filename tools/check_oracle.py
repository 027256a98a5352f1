"""Local twin of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count,
column names/dtypes, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bool):
            df[c] = df[c].astype(bool)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    if len(df) == 0 or len(df.columns) == 0:
        return df.reset_index(drop=True)
    order = np.lexsort([df[c].astype(str).to_numpy() for c in reversed(df.columns)])
    return df.iloc[order].reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    h = pd.util.hash_pandas_object(df.astype(str), index=False).to_numpy()
    return int(np.bitwise_xor.reduce(h).astype(np.int64)) if len(h) else 0


def main() -> int:
    import duckdb
    import ray

    sys.path.insert(0, ".")
    from osmray import queries as Q

    import os

    argv = list(sys.argv[1:])
    resume_log = None
    if "--resume-log" in argv:
        i = argv.index("--resume-log")
        resume_log = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    done = set()
    if resume_log and os.path.exists(resume_log):
        for line in open(resume_log):
            if line.startswith(("PASS ", "ok   ")):
                done.add(line.split()[1].rstrip(":"))
        print(f"resume: skipping {len(done)} already-green queries")

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("OSMRAY_GATE_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    # bound DuckDB so a fat twin spills to disk instead of OOM-killing
    # the whole gate; optional per-twin timeout for twins that are
    # intractable at the larger scale factors (recorded, not fatal)
    con.sql(f"SET memory_limit='{os.environ.get('OSMRAY_GATE_SQL_MEM', '24GB')}'")
    con.sql(f"SET temp_directory='/tmp/osmray_gate_duck_tmp_{os.getpid()}'")  # per-process: concurrent gates must not share spill
    sql_timeout = float(os.environ.get("OSMRAY_GATE_SQL_TIMEOUT", "0"))
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    def run_sql(q: str):
        if not sql_timeout:
            return con.sql(q).to_df()
        import threading
        timer = threading.Timer(sql_timeout, con.interrupt)
        timer.start()
        try:
            return con.sql(q).to_df()
        finally:
            timer.cancel()

    failures = 0
    for name, (fn, sql) in Q.registry().items():
        if only and name not in only:
            continue
        if name in done:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            rdf = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        except Exception as e:
            print(f"FAIL {name}: ray error {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if sql is None:
            print(f"ok   {name}: rows={len(rdf)} (rows-only) [{dt:.1f}s]")
            if len(rdf) == 0 and name != "q_embedding_dups":
                print(f"WARN {name}: empty result")
            continue
        t1 = time.perf_counter()
        try:
            odf = run_sql(sql)
        except Exception as e:
            failures += 1
            print(f"SQLERR {name}: {type(e).__name__}: {str(e)[:200]} "
                  f"[{time.perf_counter() - t1:.0f}s]", flush=True)
            continue
        sql_dt = time.perf_counter() - t1
        a, b = normalize(rdf), normalize(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_dtypes = ok_cols and all(str(a[c].dtype) == str(b[c].dtype) for c in a.columns)
        ok_vals = ok_rows and ok_cols and value_hash(a) == value_hash(b)
        if ok_rows and ok_cols and ok_dtypes and ok_vals:
            print(f"PASS {name}: rows={len(a)} [{dt:.1f}s ray, {sql_dt:.1f}s sql]")
        else:
            failures += 1
            print(
                f"FAIL {name}: rows {len(a)}vs{len(b)} cols_ok={ok_cols} "
                f"dtypes_ok={ok_dtypes} vals_ok={ok_vals}"
            )
            if ok_cols and not ok_dtypes:
                print("  ray:", dict(a.dtypes.astype(str)))
                print("  sql:", dict(b.dtypes.astype(str)))
            elif not ok_cols:
                print("  ray cols:", list(a.columns))
                print("  sql cols:", list(b.columns))
            elif not ok_vals and len(a) == len(b):
                neq = (a.astype(str) != b.astype(str)).any(axis=0)
                print("  differing cols:", list(neq[neq].index))
                mask = (a.astype(str) != b.astype(str)).any(axis=1)
                print("  first diff rows (ray vs sql):")
                print(a[mask].head(3))
                print(b[mask].head(3))
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
