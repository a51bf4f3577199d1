#!/usr/bin/env python
"""Storage-layer A/B for the q1/st2 scan constant (round 9, VERDICT r8
item 7).

The compute-side A/Bs are exhausted (fixed-point arithmetic adopted round
4; st2's two-stage base-bucket form adopted round 8) — the residual gap to
DuckDB on q1/st2 is the SCAN path: decoding double money columns and
timestamps, then converting to integer units per row.  The lakehouse move
is to do that conversion ONCE at ingest: write the money columns as BIGINT
units and the timestamp as BIGINT epoch micros.  This script measures
exactly that delta, same machine, same query semantics, value-identical
results:

  q1  : lineitem(double money, timestamp)  vs  lineitem_u(qty_u, ep_u,
        dm=(100-disc_u), tp=(100+tax_u) BIGINT, ship_us BIGINT)
  st2 : events(timestamp, double value)    vs  events_u(ts_us BIGINT,
        value_u BIGINT)

Variant tables are written to /tmp/ab_storage/<basename(sf_dir)>/ and
reused across runs.  Output: one JSON line with per-query rep lists and
the variant/original ratio; results are asserted EQUAL (collected rows)
before any timing is trusted.

Usage: python tools/ab_storage.py [sf_dir]   (default /tmp/testdata/sf5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from r_e_hive__spark.functions import fixedpoint as fp  # noqa: E402
from r_e_hive__spark.session import get_spark  # noqa: E402

REPS = 5
_SHIP_CUT_US = 904694400 * 1_000_000  # 1998-09-02 00:00:00 UTC in micros


def _fence(spark):
    spark.sparkContext._jvm.System.gc()
    time.sleep(0.3)


def _time(spark, make_df) -> list[float]:
    """bench.py's rep methodology: a FRESH DataFrame per rep (stage/shuffle
    reuse across actions on one DataFrame would time only the final reduce)
    and the noop sink (materializes every output column)."""
    out = []
    for _ in range(REPS):
        _fence(spark)
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def build_variants(spark, sf_dir: str, out: str) -> None:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        li.select(
            "l_returnflag",
            "l_linestatus",
            fp.unscaled_fast("l_quantity").alias("qty_u"),
            fp.unscaled_fast("l_extendedprice").alias("ep_u"),
            (F.lit(100) - fp.unscaled_fast("l_discount")).alias("dm"),
            (F.lit(100) + fp.unscaled_fast("l_tax")).alias("tp"),
            (fp.unscaled_fast("l_discount")).alias("disc_u"),
            # raw parquet reads infer TIMESTAMP_NTZ; cast to LTZ (session
            # timezone is pinned UTC) before epoch conversion
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
        ).write.mode("overwrite").parquet(f"{out}/lineitem_u")
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (
        ev.select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_type",
            fp.unscaled_fast("value").alias("value_u"),
        ).write.mode("overwrite").parquet(f"{out}/events_u")
    )


def q1_variant(spark, out: str):
    t = spark.read.parquet(f"{out}/lineitem_u")
    t.createOrReplaceTempView("lineitem_u")
    return spark.sql(f"""
SELECT l_returnflag, l_linestatus,
  {fp.money_of_units_sql('SUM(qty_u)', 2)} AS sum_qty,
  {fp.money_of_units_sql('SUM(ep_u)', 2)} AS sum_base_price,
  {fp.money_of_units_sql('SUM(ep_u * dm)', 4)} AS sum_disc_price,
  {fp.money_of_units_sql('SUM(ep_u * dm * tp)', 6, round_to=4)} AS sum_charge,
  ROUND({fp.money_of_units_sql('SUM(qty_u)', 2)} / COUNT(*), 4) AS avg_qty,
  ROUND({fp.money_of_units_sql('SUM(ep_u)', 2)} / COUNT(*), 4) AS avg_price,
  ROUND({fp.money_of_units_sql('SUM(disc_u)', 2)} / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem_u
WHERE ship_us <= {_SHIP_CUT_US}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""")


def st2_variant(spark, out: str):
    ev = spark.read.parquet(f"{out}/events_u")
    base = (
        ev.select(
            (F.floor(F.col("ts_us") / 300_000_000) * 300).alias("_b"),
            "event_type",
            F.col("value_u").alias("_u"),
        )
        .groupBy("_b", "event_type")
        .agg(F.count("*").alias("_n"), F.sum("_u").alias("_su"))
    )
    expanded = base.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("tumbling").alias("kind"),
                    F.timestamp_seconds(
                        F.floor(F.col("_b") / 600) * 600
                    ).alias("window_start"),
                    F.col("event_type").alias("event_type"),
                ),
                F.struct(
                    F.lit("sliding").alias("kind"),
                    F.timestamp_seconds(F.col("_b")).alias("window_start"),
                    F.lit("(all)").alias("event_type"),
                ),
                F.struct(
                    F.lit("sliding").alias("kind"),
                    F.timestamp_seconds(F.col("_b") - 300).alias("window_start"),
                    F.lit("(all)").alias("event_type"),
                ),
            )
        ).alias("g"),
        "_n",
        "_su",
    )
    val = fp.money_of_units(F.sum("_su"), 2)
    return (
        expanded.groupBy("g.kind", "g.window_start", "g.event_type")
        .agg(F.sum("_n").alias("n_events"), val.alias("sum_value"))
        .orderBy("kind", "window_start", "event_type")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf5"
    import hashlib

    # key by the FULL path (two sf5 dirs under different parents must not
    # share variants) and gate reuse on Spark's _SUCCESS markers, not the
    # directory's existence — a killed first build must rebuild, not wedge
    key = (
        os.path.basename(sf_dir.rstrip("/"))
        + "_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    out = os.path.join("/tmp/ab_storage", key)
    spark = get_spark(app_name="ab-storage", master="local[32]")

    from r_e_hive__spark.queries import load_all

    reg = load_all()
    done = all(
        os.path.exists(os.path.join(out, t, "_SUCCESS"))
        for t in ("lineitem_u", "events_u")
    )
    if not done:
        build_variants(spark, sf_dir, out)

    q1_orig = reg["q1_pricing_summary"].spark_fn(spark, sf_dir)
    st2_orig = reg["st2_windows"].spark_fn(spark, sf_dir)
    q1_var = q1_variant(spark, out)
    st2_var = st2_variant(spark, out)

    # value identity BEFORE timing: the variant is only interesting if it
    # is the same query.  Explicit raise, not assert — asserts vanish
    # under python -O and a diverged variant would get timed and reported
    # as a valid ratio (r9 ADVICE).
    if [tuple(r) for r in q1_orig.collect()] != [
        tuple(r) for r in q1_var.collect()
    ]:
        raise SystemExit("q1 variant diverged; refusing to time it")
    if [tuple(r) for r in st2_orig.collect()] != [
        tuple(r) for r in st2_var.collect()
    ]:
        raise SystemExit("st2 variant diverged; refusing to time it")

    res = {
        "sf_dir": sf_dir,
        "q1_orig": _time(
            spark, lambda: reg["q1_pricing_summary"].spark_fn(spark, sf_dir)
        ),
        "q1_variant": _time(spark, lambda: q1_variant(spark, out)),
        "st2_orig": _time(
            spark, lambda: reg["st2_windows"].spark_fn(spark, sf_dir)
        ),
        "st2_variant": _time(spark, lambda: st2_variant(spark, out)),
    }
    res["q1_ratio"] = round(min(res["q1_variant"]) / min(res["q1_orig"]), 3)
    res["st2_ratio"] = round(min(res["st2_variant"]) / min(res["st2_orig"]), 3)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
