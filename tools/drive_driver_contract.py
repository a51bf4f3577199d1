#!/usr/bin/env python
"""Simulate the grading driver's contract against /root/repo.

- vanilla SparkSession (NONE of r_e_hive__spark.session's configs)
- cwd must NOT be /root/repo (run from /tmp) so worker-side module
  shipping (sc.addPyFile) is actually exercised
- imports /root/repo/__spark_entry__.py, smoke-runs entry(spark)
- runs every queries() entry and its oracle_sql() on DuckDB at sf0.01,
  comparing columns (sorted by name), row count, and values
  order-insensitively.
"""
import os
import sys
import traceback

assert os.getcwd() != "/root/repo", "drive from /tmp, not the repo"
sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def norm(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    # stringify for an order-insensitive, dtype-insensitive value compare
    return sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )


def main() -> int:
    spark = (
        # driver mem/cores knobs for ABOVE-contract scale sweeps (sf1/sf5):
        # the real driver runs sf0.01 where the 1g default suffices — these
        # envs exist so the same harness can differentially verify at 10-50x
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_SIM_CPUS', '8')}]"
        )
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM", "1g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    # smoke: entry()
    edf = E.entry(spark)
    n = edf.count()
    print(f"entry(): OK, {n} rows, schema {[f.name for f in edf.schema.fields]}")

    qs = E.queries()
    oracles = E.oracle_sql()
    # golden-pinned oracles (inline VALUES generated from a frozen fixture,
    # e.g. x2_simhash) are only valid at their golden_sf — at other scale
    # factors the sweep runs the Spark side against the PINNED fixture so
    # the determinism pin still verifies instead of spuriously failing.
    # The real driver always runs at sf0.01 where this is a no-op.
    golden = {}
    try:
        from r_e_hive__spark.queries import load_all

        golden = {
            n: s.golden_sf
            for n, s in load_all().items()
            if getattr(s, "golden_sf", None)
        }
    except Exception:
        pass
    def env_names(var: str) -> set[str]:
        # a typo must not produce a green zero-query (or wrong-set) run
        names = {
            n.strip() for n in os.environ.get(var, "").split(",") if n.strip()
        }
        unknown = names - set(qs)
        if unknown:
            raise SystemExit(f"{var} names not in queries(): {sorted(unknown)}")
        return names

    only = env_names("SPARK_GRAFT_SIM_ONLY")
    # SKIP: for ABOVE-contract scale sweeps where a specific ORACLE (not
    # the engine) is infeasible — e.g. x32_fuzzy_join's oracle is the
    # deliberate naive all-pairs levenshtein join, quadratic by design
    # (fine at the driver's sf0.01, ~2·10^10 pairs at sf1).  Never set
    # for a contract-fidelity run: skipped names are printed loudly.
    skip = env_names("SPARK_GRAFT_SIM_SKIP")
    if skip:
        print(f"SKIPPED (SPARK_GRAFT_SIM_SKIP): {sorted(skip)}")
    con = duck_con()

    def run_one(name, fn):
        run_sf, tag = SF_DIR, ""
        g = golden.get(name)
        if g and os.path.realpath(g) != os.path.realpath(SF_DIR):
            run_sf, tag = g, f" [golden-pinned @ {g}]"
        sdf = fn(spark, run_sf).toPandas()
        if name not in oracles:
            return f"{name}: rows-only ({len(sdf)} rows)"
        odf = con.execute(oracles[name]).fetchdf()
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            raise AssertionError(f"schema mismatch {s_cols} vs {o_cols}")
        if len(sdf) != len(odf):
            raise AssertionError(f"rowcount {len(sdf)} vs {len(odf)}")
        if norm(sdf) != norm(odf):
            raise AssertionError("value hash mismatch")
        return f"{name}: OK ({len(sdf)} rows){tag}"

    ok = fail = 0
    transients: list[str] = []
    for name, fn in qs.items():
        if (only and name not in only) or name in skip:
            continue
        try:
            msg = run_one(name, fn)
        except Exception as e:
            # one retry, WITH the first failure logged: an unreproduced
            # 49/1 driver run was observed in round 5 with no query name
            # captured (VERDICT r5 item 8) — any future transient must
            # record which query flaked and why, and a persistent failure
            # must fail twice before counting.
            first = f"{type(e).__name__}: {e}"
            print(f"{name}: first attempt failed — {first}")
            traceback.print_exc(limit=3)
            try:
                msg = run_one(name, fn) + " [TRANSIENT — passed on retry]"
                transients.append(f"{name}: {first}")
            except Exception as e2:
                fail += 1
                print(f"{name}: FAIL (x2) — {type(e2).__name__}: {e2}")
                traceback.print_exc(limit=3)
                continue
        ok += 1
        print(msg)
    if transients:
        print(f"TRANSIENTS ({len(transients)}):")
        for t in transients:
            print(f"  {t}")
    expected = (only or set(qs)) - skip
    print(f"TOTAL {ok} ok / {fail} fail of {len(expected)}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
