"""Hypertable rollup tests (operators/rollup.py): every derived level must
equal DIRECT aggregation of the facts at that granularity, and the
incremental merge must equal the one-shot aggregate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators.rollup import (
    aggregate_finest,
    merge_rollup,
    time_rollup,
)

SF = "/root/testdata/sf0.001"
GRANS = ("10 minutes", "1 hour", "1 day")


def _events(spark):
    return load_table(spark, SF, "events").select("event_id", "ts", "event_type", "value")


def _direct(spark, ev, width):
    """Independent formulation: one-shot groupBy at the target width."""
    return (
        ev.withColumn("bucket", (F.floor(F.unix_timestamp("ts") / width) * width).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("*").alias("n_rows"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def _rows(df):
    return sorted(
        (r["bucket"], r["event_type"], round(r["sum_value"], 6), r["n_rows"],
         r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_every_level_equals_direct_aggregation(spark):
    ev = _events(spark)
    levels = time_rollup(ev, "ts", "value", keys=["event_type"], granularities=GRANS)
    for g, width in (("10 minutes", 600), ("1 hour", 3600), ("1 day", 86400)):
        assert _rows(levels[g]) == _rows(_direct(spark, ev, width)), g


def test_hourly_sum_matches_duckdb_time_bucket(spark):
    ev = _events(spark)
    got = {
        (r["bucket"], r["event_type"]): (round(r["sum_value"], 4), r["n_rows"])
        for r in time_rollup(ev, "ts", "value", ["event_type"], GRANS)["1 hour"].collect()
    }
    con = duckdb.connect()
    con.register("ev", ev.toPandas())
    want = {
        (int(b), et): (round(s, 4), n)
        for b, et, s, n in con.execute(
            """
            SELECT epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket,
                   event_type, SUM(value), COUNT(*)
            FROM ev GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


def test_incremental_merge_equals_one_shot(spark):
    ev = _events(spark)
    one_shot = aggregate_finest(ev, "ts", "value", ["event_type"], "10 minutes")
    chunks = [ev.where(F.col("event_id") % 3 == k) for k in range(3)]
    state = None
    for c in chunks:
        batch = aggregate_finest(c, "ts", "value", ["event_type"], "10 minutes")
        state = merge_rollup(state, batch, ["event_type"])
    assert _rows(state) == _rows(one_shot)


def test_avg_at_read_and_bad_hierarchy(spark):
    ev = _events(spark)
    hourly = time_rollup(ev, "ts", "value", ["event_type"], GRANS)["1 hour"]
    avg_read = {
        (r["bucket"], r["event_type"]): round(r["sum_value"] / r["n_rows"], 6)
        for r in hourly.collect()
    }
    direct = {
        (r["bucket"], r["event_type"]): round(r["a"], 6)
        for r in (
            ev.withColumn("bucket", (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long"))
            .groupBy("bucket", "event_type").agg(F.avg("value").alias("a")).collect()
        )
    }
    assert avg_read == direct
    with pytest.raises(ValueError):
        time_rollup(ev, "ts", "value", granularities=("1 hour", "10 minutes"))
    with pytest.raises(ValueError):
        time_rollup(ev, "ts", "value", granularities=("1 hour", "1 fortnight"))


def test_merge_rollup_exact_bucket_equality(spark):
    """Round-4 ADVICE regression: merge_rollup must merge by EXACT bucket
    equality, not by re-bucketing at '1 minute' — partials at a sub-minute
    granularity (90 s buckets here) must come through unchanged.  The old
    form floored 90→60 and 270→240, silently corrupting the merge."""
    schema = (
        "bucket long, sum_value double, n_rows long, "
        "min_value double, max_value double"
    )
    existing = spark.createDataFrame(
        [(90, 1.0, 1, 1.0, 1.0), (180, 2.0, 1, 2.0, 2.0)], schema
    )
    batch = spark.createDataFrame(
        [(90, 3.0, 2, 0.5, 3.0), (270, 1.0, 1, 1.0, 1.0)], schema
    )
    got = {
        r["bucket"]: (r["sum_value"], r["n_rows"], r["min_value"], r["max_value"])
        for r in merge_rollup(existing, batch, []).collect()
    }
    assert got == {
        90: (4.0, 3, 0.5, 3.0),
        180: (2.0, 1, 2.0, 2.0),
        270: (1.0, 1, 1.0, 1.0),
    }
