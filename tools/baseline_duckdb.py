#!/usr/bin/env python
"""DuckDB baseline timings for the bench-flagged declared queries.

Runs each bench query's oracle SQL on DuckDB over the same parquet tables
bench.py uses, prints one JSON line with per-query seconds + geomean.
This is the BASELINE.md reference point (SURVEY.md §6).  Set selection,
name filter, per-query sf caps, and null-for-skipped-set semantics are
shared with bench.py via tools/bench_common so the paired JSONs stay
comparable key-for-key.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_common import (
    LLM_BENCH,
    LLM_BENCH_SF_CAP,
    LLM_FAST,
    LLM_FAST_SYMMETRIC,
    bench_only,
    bench_reps,
    bench_set_flags,
    capped_sf_dir,
    geomean_or_null,
    parse_sf,
)

from r_e_hive__spark.oracle.diff import duckdb_connection
from r_e_hive__spark.queries import RETIRED, load_all


def _warm_connection(sf_dir: str):
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
    return con


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = _warm_connection(sf_dir)
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
        # align by key (bench_common.LLM_FAST).  x23's twin searches a
        # PREBUILT index on the Spark side, so its DuckDB pair searches a
        # prebuilt (untimed CREATE TABLE) postings index too — the r7
        # ADVICE asymmetry, closed; x17/x25 twins run the identical task
        # end-to-end on both sides (arithmetic mode is the only delta)
        # and stay paired to the full oracle, tagged via llm_fast_twins.
        llm_queries.update(
            {fast: merged[src] for fast, src in LLM_FAST.items()}
        )
    else:
        llm_queries = {}
    only = bench_only()
    if only is not None:
        queries = {n: q for n, q in queries.items() if n in only}
        llm_queries = {n: q for n, q in llm_queries.items() if n in only}

    # per-query sf caps (bench_common.LLM_BENCH_SF_CAP): the exact-decimal
    # instrument rows are timed at their capped scale on BOTH sides so the
    # paired ratio stays scale-matched; capped queries get their own warm
    # connection over the capped dir
    pinned: dict[str, float] = {}
    cons: dict[str, object] = {}
    for name, cap in LLM_BENCH_SF_CAP.items():
        if name in queries or name in llm_queries:
            capped = capped_sf_dir(sf_dir, cap)
            if capped is not None:
                pinned[name] = cap
                cons[name] = _warm_connection(capped)

    def con_for(name: str):
        return cons.get(name, con)

    # search-only oracles for twins whose Spark side searches a prebuilt
    # index: the prep SQL runs ONCE per connection (the untimed build +
    # COPY to an on-disk parquet artifact, in the warm phase) and the
    # timed statement is the search tail over read_parquet of that
    # artifact — both engines read a persisted index from disk (round-11,
    # VERDICT r10 item 6: the in-memory native table made the DuckDB side
    # a warm rescan, an asymmetric pair)
    search_only: dict[str, str] = {}
    if "x23_bm25_topk_fast" in llm_queries:
        import tempfile

        from r_e_hive__spark.queries.text import (
            x23_fast_duckdb_prep,
            x23_fast_duckdb_search,
        )

        idx_dir = tempfile.mkdtemp(prefix="rehive_bm25_duck_")
        for prep in x23_fast_duckdb_prep(idx_dir):
            con_for("x23_bm25_topk_fast").execute(prep)
        search_only["x23_bm25_topk_fast"] = x23_fast_duckdb_search(idx_dir)

    def sql_for(name: str, q) -> str:
        return search_only.get(name, q.oracle)

    # warm the OS page cache / parquet footers once
    for name, q in {**queries, **llm_queries}.items():
        con_for(name).execute(sql_for(name, q)).fetchall()
    reps = bench_reps()

    def run_set(qset) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name, q in qset.items():
            c = con_for(name)
            sql = sql_for(name, q)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                c.execute(sql).fetchall()
                best = min(best, time.perf_counter() - t0)
            # best-of-N, same methodology as bench.py
            timings[name] = round(best, 4)
        return timings

    timings = run_set(queries)
    llm_timings = run_set(llm_queries)

    print(
        json.dumps(
            {
                "metric": "duckdb-oracle wall-clock (geomean)",
                "value": geomean_or_null(timings, time_rel),
                "unit": "sec",
                "queries": timings if time_rel else None,
                "llm_geomean": geomean_or_null(llm_timings, time_llm),
                "llm_queries": llm_timings if time_llm else None,
                "llm_fast_twins": sorted(LLM_FAST),
                "llm_fast_symmetric": sorted(LLM_FAST_SYMMETRIC),
                "pinned_sf": pinned,
                "sf": parse_sf(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
