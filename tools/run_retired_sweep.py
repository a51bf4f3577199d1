#!/usr/bin/env python
"""Run the RETIRED-registry differentials at an arbitrary sf dir.

The pytest suite runs these at sf0.01 (tests/test_retired_queries.py);
this driver repeats the identical run_diff differential at scale, from a
vanilla session outside the repo cwd (the contract-sim discipline), so
the ledger's "retirement removes the gate, not the coverage" claim gets
at-scale evidence too.  Queries with a pinned golden_sf run at their pin.

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 \
  SPARK_GRAFT_SIM_SKIP=x4_neardup_pairs python run_retired_sweep.py
"""
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")
SKIP = set(filter(None, os.environ.get("SPARK_GRAFT_SIM_SKIP", "").split(",")))
ONLY = set(filter(None, os.environ.get("SPARK_GRAFT_SIM_ONLY", "").split(",")))
CPUS = os.environ.get("SPARK_GRAFT_SIM_CPUS", "24")
MEM = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM", "48g")


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.driver.memory", MEM)
        .config("spark.sql.shuffle.partitions", CPUS)
        .appName("retired-sweep")
        .getOrCreate()
    )
    from r_e_hive__spark.catalog import ensure_session_confs
    from r_e_hive__spark.oracle.diff import duckdb_connection, run_diff
    from r_e_hive__spark.queries import RETIRED, load_all

    ensure_session_confs(spark)
    load_all()
    cons = {}
    ok = fail = 0
    try:
        for q in RETIRED.values():
            if q.name in SKIP or (ONLY and q.name not in ONLY):
                print(f"{q.name}: SKIP", flush=True)
                continue
            sf = q.golden_sf or SF_DIR
            if sf not in cons:
                cons[sf] = duckdb_connection(sf)
            t0 = time.time()
            try:
                res = run_diff(spark, cons[sf], q, sf)
            except Exception as e:  # noqa: BLE001
                print(f"{q.name}: ERROR {type(e).__name__}: {e}", flush=True)
                traceback.print_exc()
                fail += 1
                continue
            dt = time.time() - t0
            tag = "OK" if res.ok else f"FAIL {res.detail}"
            pin = " [golden_sf]" if q.golden_sf else ""
            print(
                f"{q.name}: {tag} ({res.n_spark} rows, {dt:.1f}s){pin}",
                flush=True,
            )
            ok += res.ok
            fail += not res.ok
    finally:
        for con in cons.values():
            try:
                con.close()
            except Exception:  # noqa: BLE001
                pass
    print(f"TOTAL {ok} ok / {fail} fail", flush=True)
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
