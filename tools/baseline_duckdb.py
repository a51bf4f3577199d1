#!/usr/bin/env python
"""DuckDB baseline timings for the bench-flagged declared queries.

Runs each bench query's oracle SQL on DuckDB over the same parquet tables
bench.py uses, prints one JSON line with per-query seconds + geomean.
This is the BASELINE.md reference point (SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_common import (
    LLM_BENCH,
    bench_reps,
    bench_set_flags,
    geomean,
    parse_sf,
)

from r_e_hive__spark.oracle.diff import duckdb_connection
from r_e_hive__spark.queries import RETIRED, load_all


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb_connection(sf_dir)
    # Methodology parity with bench.py (which pins small tables in Spark's
    # in-memory columnar cache): materialize each parquet view as a native
    # DuckDB table so both engines measure warm in-memory compute, not
    # Spark-memory vs DuckDB-parquet-scan.  Opt out with
    # SPARK_GRAFT_DUCKDB_WARM=0 to time the cold parquet path.
    if os.environ.get("SPARK_GRAFT_DUCKDB_WARM", "1") != "0":
        for (name,) in con.execute(
            "SELECT view_name FROM duckdb_views() WHERE NOT internal"
        ).fetchall():
            con.execute(f'CREATE TABLE "t_{name}" AS SELECT * FROM "{name}"')
            con.execute(f'DROP VIEW "{name}"')
            con.execute(f'ALTER TABLE "t_{name}" RENAME TO "{name}"')
    merged = {**load_all(), **RETIRED}
    time_rel, time_llm = bench_set_flags()
    if time_rel:
        # same rule as the LLM set below: a bench=True query without an
        # oracle would be timed by bench.py but silently missing here,
        # desynchronizing the paired geomeans — fail loudly instead
        bench_no_oracle = [
            n for n, q in merged.items() if q.bench and q.oracle is None
        ]
        if bench_no_oracle:
            raise ValueError(
                f"bench queries without oracles: {bench_no_oracle}"
            )
        queries = {name: q for name, q in merged.items() if q.bench}
    else:
        queries = {}
    if time_llm:
        # every LLM_BENCH entry MUST carry an oracle: silently skipping an
        # oracle-less one here while bench.py still times it would
        # desynchronize the paired geomeans (round-7 code review)
        missing = [n for n in LLM_BENCH if merged[n].oracle is None]
        if missing:
            raise ValueError(f"LLM bench entries without oracles: {missing}")
        llm_queries = {name: merged[name] for name in LLM_BENCH}
        # fast-path twins time the SAME TASK as their exact twin — record
        # the twin's oracle under the fast name so the two engines' JSONs
        # align by key (bench_common.LLM_FAST)
        from tools.bench_common import LLM_FAST

        llm_queries.update(
            {fast: merged[src] for fast, src in LLM_FAST.items()}
        )
    else:
        llm_queries = {}
    # warm the OS page cache / parquet footers once
    for q in {**queries, **llm_queries}.values():
        con.execute(q.oracle).fetchall()
    reps = bench_reps()

    def run_set(qset) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, q in qset.items():
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                con.execute(q.oracle).fetchall()
                best = min(best, time.perf_counter() - t0)
            # best-of-N, same methodology as bench.py
            timings[name] = round(best, 4)
        return timings

    timings = run_set(queries)
    llm_timings = run_set(llm_queries)
    gmean = geomean(timings)
    print(
        json.dumps(
            {
                "metric": "duckdb-oracle wall-clock (geomean)",
                "value": round(gmean, 4),
                "unit": "sec",
                "queries": timings,
                "llm_geomean": round(geomean(llm_timings), 4),
                "llm_queries": llm_timings,
                "sf": parse_sf(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
