#!/usr/bin/env python
"""Benchmark harness: runs the headline declared queries at the driver's
scale factor and prints ONE JSON line.

  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)

Metric: wall-clock seconds per query (result fully materialized via count()
+ collect of the bounded output), plus the geometric mean.  Compare against
the DuckDB oracle timings recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools.bench_common import (
    LLM_BENCH,
    bench_reps,
    bench_set_flags,
    geomean,
    parse_sf,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from r_e_hive__spark.queries import RETIRED, load_all
    from r_e_hive__spark.session import get_spark

    spark = get_spark(app_name="rehive-bench", master=f"local[{cpus}]")

    # bench set = declared ∪ retired with bench=True: driver-surface
    # rotation (the 50-query CORRECTNESS cap) must not change the bench
    # series — o3/j8_doubling stay measured after their round-7 retirement
    merged = {**load_all(), **RETIRED}
    # SPARK_GRAFT_BENCH_SETS: 'all' (default) | 'relational' | 'llm' —
    # scale sweeps can focus one set without changing methodology;
    # selection is shared with baseline_duckdb.py (bench_common)
    time_rel, time_llm = bench_set_flags()
    queries = (
        {name: q.spark_fn for name, q in merged.items() if q.bench}
        if time_rel
        else {}
    )
    # second headline set (round 7): the LLM-pipeline operators — recorded
    # as their own geomean so operator-level perf is a tracked number, not
    # BASELINE.md prose (VERDICT r6 item 4).  Includes the strategy="auto"
    # fast-path twins of the exact-decimal instrument rows so the BLAS /
    # Arrow production paths are tracked too (queries/fastpaths.py).
    if time_llm:
        from r_e_hive__spark.queries.fastpaths import FASTPATHS

        llm_queries = {name: merged[name].spark_fn for name in LLM_BENCH}
        llm_queries.update(FASTPATHS)
    else:
        llm_queries = {}

    # warm the JVM, parquet footers, and the catalog's in-memory table cache
    # once (not timed) — the same steady-state a long-running cluster has.
    from r_e_hive__spark.catalog import register_testdata

    for df in register_testdata(spark, sf_dir).values():
        df.count()
    for name, fn in {**queries, **llm_queries}.items():
        fn(spark, sf_dir).limit(1).collect()

    reps = bench_reps()

    def run_set(qset) -> tuple[dict[str, float], dict[str, list[float]]]:
        timings: dict[str, float] = {}
        rep_times: dict[str, list[float]] = {}
        for name, fn in qset.items():
            samples: list[float] = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # noop sink: materializes every output column (count() would
                # let Catalyst prune the whole projection for per-row queries)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 4))
            # best-of-N: the steady-state number a warm cluster delivers; the
            # single-shot numbers on this shared VM carry ±2× scheduler noise.
            # The full per-rep array ships in the JSON so a reader can
            # separate VM noise from plan regressions without re-running
            # (VERDICT r3 §7).
            rep_times[name] = samples
            timings[name] = min(samples)
        return timings, rep_times

    timings, rep_times = run_set(queries)
    llm_timings, llm_rep_times = run_set(llm_queries)

    # Environment calibration: a fixed, data-independent, plan-stable probe
    # (sum over a 200M-row range — pure JVM codegen, no IO, no shuffle read)
    # so a reader can normalize cross-round query times against the VM's
    # actual CPU availability at record time.  r2→r3's "regression" was
    # exactly this number moving (BASELINE.md, bench-variance section).
    calib = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id)").collect()
        calib.append(round(time.perf_counter() - t0, 4))

    gmean = geomean(timings)
    print(
        json.dumps(
            {
                "metric": "declared-query wall-clock (geomean)",
                "value": round(gmean, 4),
                "unit": "sec",
                "queries": timings,
                "reps": rep_times,
                "llm_geomean": round(geomean(llm_timings), 4),
                "llm_queries": llm_timings,
                "llm_reps": llm_rep_times,
                "calibration": {"range_sum_200m": calib},
                "sf": parse_sf(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
