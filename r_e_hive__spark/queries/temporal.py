"""Declared queries: temporal joins + hypertable rollup (SURVEY.md §2.11
X10-X12) — the event-analytics family a real user of the reference hits
first (round-5 VERDICT rotation item 1).

All three are FULL differentials against DuckDB's native temporal SQL:
X10 against ``ASOF LEFT JOIN``, X11 against the plain inequality join the
binned plan must reproduce exactly, X12 against a replay of the entire
partial/merge/coarsen pipeline (two half-corpus partial aggregations,
exact-bucket merge, hour-level coarsening) in SQL.  Money-typed decimal
casts keep every float aggregate order-independent (determinism rule 3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators.rollup import (
    aggregate_finest,
    merge_rollup,
    rollup_from_partials,
)
from r_e_hive__spark.operators.temporal import asof_join, range_join
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T

# Deterministic sparse "status stream" derived from events: every 7th
# event_id marks a status change; value is doubled through exact decimal so
# both engines produce the identical double.  Grouped on (user_id, ts) so
# the as-of right side has a unique axis per key (as-of contract).
_STATUS_SQL = """
      SELECT user_id, ts AS status_ts,
             CAST(MAX(CAST(value AS DECIMAL(12,2))) * 2 AS DOUBLE) AS status_value
      FROM events WHERE event_id % 7 = 0
      GROUP BY user_id, ts
"""


def _status_stream(events):
    return (
        events.where(F.col("event_id") % 7 == 0)
        .groupBy("user_id", "ts")
        .agg(
            (F.max(F.col("value").cast("decimal(12,2)")) * 2)
            .cast("double")
            .alias("status_value")
        )
        .withColumnRenamed("ts", "status_ts")
    )


@query(
    "x10_asof_join",
    f"""
    WITH r AS ({_STATUS_SQL}),
    l AS (SELECT event_id, user_id, ts AS ev_ts FROM events)
    SELECT l.event_id, l.user_id, l.ev_ts,
           r.status_ts AS m_status_ts, r.status_value AS m_status_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ev_ts >= r.status_ts
    ORDER BY l.event_id
    """,
    survey_rows=("X10",),
)
def x10_asof_join(spark, sf_dir):
    """Per-key as-of alignment (operators/temporal.asof_join): every event
    gains the user's nearest at-or-before status row — DuckDB native ASOF
    LEFT JOIN semantics, one shuffle + one window, no join operator (plan
    pinned in tests/test_temporal.py)."""
    (events,) = T(spark, sf_dir, "events")
    left = events.select("event_id", "user_id", F.col("ts").alias("ev_ts"))
    return (
        asof_join(
            left,
            _status_stream(events),
            on="ev_ts",
            by=["user_id"],
            right_on="status_ts",
            right_prefix="m_",
        )
        .select("event_id", "user_id", "ev_ts", "m_status_ts", "m_status_value")
        .orderBy("event_id")
    )


@query(
    "x11_range_join",
    f"""
    WITH iv AS (
      SELECT user_id, status_ts AS start_ts,
             status_ts + INTERVAL 2 HOUR AS end_ts, status_value
      FROM ({_STATUS_SQL})
    ),
    l AS (SELECT event_id, user_id, ts AS ev_ts FROM events)
    SELECT l.event_id, l.user_id, l.ev_ts, iv.start_ts, iv.end_ts,
           iv.status_value
    FROM l JOIN iv ON l.user_id = iv.user_id
     AND l.ev_ts BETWEEN iv.start_ts AND iv.end_ts
    ORDER BY l.event_id, iv.start_ts
    """,
    survey_rows=("X11",),
)
def x11_range_join(spark, sf_dir):
    """Point-in-interval range join (operators/temporal.range_join): each
    event against the 2-hour window opened by its user's status changes.
    Binned equi-join — never BroadcastNestedLoopJoin (plan pinned in
    tests/test_temporal.py); the oracle is the plain inequality join the
    binning must reproduce row-for-row."""
    (events,) = T(spark, sf_dir, "events")
    iv = _status_stream(events).select(
        "user_id",
        F.col("status_ts").alias("start_ts"),
        (F.col("status_ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        "status_value",
    )
    left = events.select("event_id", "user_id", F.col("ts").alias("ev_ts"))
    return range_join(
        left,
        iv,
        point_col="ev_ts",
        start_col="start_ts",
        end_col="end_ts",
        by=["user_id"],
        bin_width=7200,
    ).orderBy("event_id", "start_ts")


# Decomposable partials per half-corpus, exact-bucket merge, then coarsen —
# the TimescaleDB continuous-aggregate maintenance cycle, replayed whole.
_ROLLUP_HALF_SQL = """
      SELECT CAST(FLOOR(epoch(ts)/600)*600 AS BIGINT) AS bucket, event_type,
             SUM(CAST(value AS DECIMAL(12,2))) AS sum_value,
             COUNT(*) AS n_rows,
             MIN(CAST(value AS DECIMAL(12,2))) AS min_value,
             MAX(CAST(value AS DECIMAL(12,2))) AS max_value
      FROM events WHERE event_id % 2 = {par}
      GROUP BY 1, 2
"""


@query(
    "x12_rollup_merge",
    f"""
    WITH b0 AS ({_ROLLUP_HALF_SQL.format(par=0)}),
    b1 AS ({_ROLLUP_HALF_SQL.format(par=1)}),
    merged AS (
      SELECT bucket, event_type,
             SUM(sum_value) AS sum_value, SUM(CAST(n_rows AS BIGINT)) AS n_rows,
             MIN(min_value) AS min_value, MAX(max_value) AS max_value
      FROM (SELECT * FROM b0 UNION ALL SELECT * FROM b1)
      GROUP BY bucket, event_type
    ),
    hourly AS (
      SELECT CAST(FLOOR(bucket/3600)*3600 AS BIGINT) AS bucket, event_type,
             SUM(sum_value) AS sum_value, SUM(n_rows) AS n_rows,
             MIN(min_value) AS min_value, MAX(max_value) AS max_value
      FROM merged GROUP BY 1, 2
    )
    SELECT bucket, event_type,
           CAST(sum_value AS DOUBLE) AS sum_value,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(min_value AS DOUBLE) AS min_value,
           CAST(max_value AS DOUBLE) AS max_value
    FROM hourly ORDER BY bucket, event_type
    """,
    survey_rows=("X12",),
)
def x12_rollup_merge(spark, sf_dir):
    """Hypertable rollup / continuous aggregate (operators/rollup.py):
    10-minute decomposable partials computed per half-corpus "batch"
    (event_id parity), merged by EXACT (bucket, keys) equality
    (merge_rollup — the foreachBatch incremental-maintenance shape), then
    coarsened to the 1-hour level from partials alone
    (rollup_from_partials — facts scanned once).  Decimal-exact money sums
    make the hash order-independent."""
    (events,) = T(spark, sf_dir, "events")
    facts = events.withColumn("v", F.col("value").cast("decimal(12,2)"))
    halves = [
        aggregate_finest(
            facts.where(F.col("event_id") % 2 == p),
            "ts",
            "v",
            ["event_type"],
            "10 minutes",
        )
        for p in (0, 1)
    ]
    merged = merge_rollup(halves[0], halves[1], ["event_type"])
    hourly = rollup_from_partials(merged, ["event_type"], "1 hour")
    return hourly.select(
        "bucket",
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    ).orderBy("bucket", "event_type")
