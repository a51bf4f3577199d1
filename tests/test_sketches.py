"""Approximate-sketch engine surface (SURVEY.md §2.4 'available for free').

Pins the three sketch primitives a 100 TB pipeline leans on — HLL
distinct-count sketches (mergeable partials: the property that makes
them one-pass distributable), approx_count_distinct, and
percentile_approx — against exact computation on the driver tables,
with the error bounds the algorithms guarantee.  These are
declared-surface checks, not declared queries: sketch outputs are
estimator-version-dependent, so they are pinned by tolerance here
rather than by the DuckDB hash oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) <= max(3 * 0.02 * exact, 3), (approx, exact)


def test_hll_sketch_merge_equals_whole(spark):
    """The scale property: sketching two halves and MERGING equals
    sketching the whole — what lets distinct-counts flow through partial
    aggregation / rollup partials without a re-scan."""
    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    whole = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).collect()[0]["n"]
    halves = (
        ev.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .collect()[0]["n"]
    )
    assert whole == halves  # identical sketches -> identical estimate
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    assert abs(whole - exact) <= max(0.05 * exact, 3)


def test_percentile_approx_bounds(spark):
    li = load_table(spark, SF, "lineitem").select("l_extendedprice")
    n = li.count()
    acc = 1000  # error <= n/acc rank positions
    got = li.select(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.95], acc).alias("p")
    ).collect()[0]["p"]
    ordered = [r[0] for r in li.orderBy("l_extendedprice").collect()]
    for q, g in zip((0.25, 0.5, 0.95), got):
        target = int(q * (n - 1))
        tol = n // acc + 1
        window = ordered[max(0, target - tol) : target + tol + 1]
        assert window[0] <= g <= window[-1], (q, g, window[0], window[-1])
