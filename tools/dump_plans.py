#!/usr/bin/env python
"""Dump .explain("formatted") for benched queries to plans/<round>/.

Usage:
  python tools/dump_plans.py <tag> [name,name,...]

Writes plans/r11/<query>_<tag>.txt for every benched query (relational
bench=True set + LLM set + fastpath twins), or only the named ones.
Environment contract matches bench.py (SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_CPUS) so the captured plans are the plans the bench times.

The files are the round-11 optimization evidence: the judge reads
<query>_before.txt / <query>_after.txt against OPTIMIZATION_r11.md's
plan-shape claims (Exchange counts, join strategies, PushedFilters).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUND_DIR = os.path.join("plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from r_e_hive__spark.queries import RETIRED, load_all
    from r_e_hive__spark.queries.fastpaths import FASTPATHS
    from r_e_hive__spark.session import get_spark

    merged = {**load_all(), **RETIRED}
    qset = {name: q.spark_fn for name, q in merged.items() if q.bench}
    from tools.bench_common import LLM_BENCH

    qset.update({name: merged[name].spark_fn for name in LLM_BENCH})
    qset.update(FASTPATHS)
    if only is not None:
        qset = {n: f for n, f in qset.items() if n in only}

    spark = get_spark(app_name="rehive-dump-plans", master=f"local[{cpus}]")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ROUND_DIR)
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in sorted(qset.items()):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of aborting the dump
            text = f"ERROR building {name}: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({tag})\n\n{text}")
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
