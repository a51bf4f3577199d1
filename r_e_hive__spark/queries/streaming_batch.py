"""Declared queries: streaming surface in batch-equivalence mode
(SURVEY.md §2.9).

Every streaming query has a batch formulation over the same ``events``
table; the DuckDB oracle checks the batch result, and
tests/test_streaming.py asserts the actual ``readStream`` jobs produce the
same rows (batch-equivalence contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from r_e_hive__spark.functions import fixedpoint as fp
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T


@query(
    "st2_windows",
    """
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) AS t(k)),
    slid AS (
      SELECT time_bucket(INTERVAL '5 minutes', e.ts) - k * INTERVAL '5 minutes' AS window_start,
             e.value
      FROM events e CROSS JOIN offsets
    )
    SELECT 'tumbling' AS kind, time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start, '(all)' AS event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
    FROM slid GROUP BY window_start
    ORDER BY kind, window_start, event_type
    """,
    survey_rows=("ST1", "ST2"),
    bench=True,
)
def st2_windows(spark, sf_dir):
    """ST2 tumbling (10-minute) and sliding (10-minute width, 5-minute
    slide) window aggregations in one declared suite (driver 50-query
    budget).

    Batch formulation is TWO-STAGE (round 8, VERDICT r7 item 6): events
    aggregate ONCE at the 5-minute base-bucket × event_type grain — the
    only shuffle proportional to |events|, with NO row multiplication —
    then the tiny base frame expands 3× (its tumbling 10-minute parent
    bucket keeps event_type; each sliding window covering the bucket —
    starts b and b−300 — folds event_type to "(all)") and a second,
    bucket-count-sized groupBy re-sums.  Long-unit partial sums re-sum
    associatively, so the result is bit-identical to the previous
    explode-then-aggregate form (asserted at sf20; 1.04 s vs 1.38 s —
    the old form shuffled 3× the event rows).  Window starts are
    epoch-aligned arithmetic, identical to ``F.window``'s bucketing and
    DuckDB time_bucket — bucket boundaries are whole seconds, so
    second-truncated ``unix_timestamp`` buckets sub-second events
    identically.  Fixed-point money: values convert to integer cents
    once before any aggregation (fixedpoint A/B at sf20: decimal
    accumulators cost 1.91 s on the same query).  The canonical
    ``F.window`` groupBys still run unchanged under readStream +
    watermark (tests/test_streaming.py asserts batch-equivalence per
    kind)."""
    (events,) = T(spark, sf_dir, "events")
    u = F.unix_timestamp("ts")
    base = (
        events.select(
            (F.floor(u / 300) * 300).alias("_b"),
            "event_type",
            fp.unscaled_fast("value").alias("_u"),
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


@retired_query(
    "st3_session_window",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      -- event_id tiebreak matches the LAG window above: without it the
      -- ROWS-frame sum is nondeterministic for duplicate (user_id, ts)
      -- pairs at a session boundary (round-4 code review)
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    survey_rows=("ST3",),
)
def st3_session_window(spark, sf_dir):
    """Session windows (30-minute gap) — Spark ``session_window`` vs the
    oracle's gaps-and-islands SQL.  The same session_window groupBy runs
    under readStream with a watermark for true streaming sessionization."""
    (events,) = T(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@retired_query(
    "st5_stream_dedup",
    """
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    survey_rows=("ST5", "J6"),
)
def st5_stream_dedup(spark, sf_dir):
    """Streaming dedup (first event wins per key) — the unique-constraint
    semantics of the reference (render-complete-deploy.js:45, 50, 67)
    applied to a stream; batch formulation is deterministic first-by-
    timestamp (dropDuplicates keeps an arbitrary row, so the engine pins
    the survivor)."""
    (events,) = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "st6_running_state",
    """
    SELECT user_id, event_id,
      CAST(ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2))
                          WHEN event_type = 'error' THEN -CAST(value AS DECIMAL(12,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS balance_after
    FROM events ORDER BY user_id, event_id
    """,
    survey_rows=("ST6", "A1"),
)
def st6_running_state(spark, sf_dir):
    """Per-key running balance — the batch formulation of the stateful
    streaming operator (ledger semantics render-complete-deploy.js:228);
    the applyInPandasWithState streaming twin lives in streaming/jobs.py
    with equivalence asserted in tests/test_streaming.py.

    Fixed-point formulation (functions/fixedpoint.py): the signed amount is
    integer cents and the running window sum accumulates as a BIGINT — the
    window frame never touches BigDecimal; the per-row terminal conversion
    back to exact decimal is bit-identical to the decimal oracle (ROUND on
    a scale-2-exact total is a no-op)."""
    (events,) = T(spark, sf_dir, "events")
    units = (
        F.when(F.col("event_type") == "purchase", fp.unscaled_fast("value"))
        .when(F.col("event_type") == "error", -fp.unscaled_fast("value"))
        .otherwise(F.lit(0).cast("long"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select(
            "user_id",
            "event_id",
            fp.money_of_units(F.sum(units).over(w), 2).alias("balance_after"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------------------------------
# ST7 — stream-static + stream-stream joins (declared round 9; VERDICT r8
# item 2: the last SURVEY §2 family with no driver pin)
# ---------------------------------------------------------------------------


@query(
    "st7_stream_joins",
    """
    SELECT p.event_id AS p_event_id, e.event_id AS e_event_id,
           p.user_id AS user_id, c.c_name AS c_name,
           CAST(date_diff('microsecond', p.ts, e.ts) AS BIGINT) AS lag_micros
    FROM events p
    JOIN events e
      ON p.user_id = e.user_id
     AND p.event_type = 'purchase' AND e.event_type = 'error'
     AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
    LEFT JOIN customer c ON c.c_custkey = p.user_id
    ORDER BY p_event_id, e_event_id
    """,
    survey_rows=("ST7",),
)
def st7_stream_joins(spark, sf_dir):
    """ST7 composed: a watermarked stream-stream time-range join (each
    purchase correlated to the same user's errors within 1 hour AFTER it)
    whose output is then enriched stream-static with the customer
    dimension row — the reference's notification fan-out shape
    (render-complete-deploy.js:234-239) on top of the correlation join.

    Batch formulation (this query): two inner-join conjuncts — an equi
    key (user_id) plus the time-range bound — then a left join to the
    dim table.  The equi conjunct makes the stream-stream join a hash
    join, never BNLJ (the X11 range-join discipline); the dim join
    broadcasts (customer is the small side).  The streaming twin — both
    sides watermarked 2 hours, state evicted past watermark − range,
    followed by the per-micro-batch static join — produces the same rows:
    batch-equivalence asserted in
    tests/test_streaming.py::test_st7_composed_join_matches_declared_batch.
    lag is in exact integer MICROSECONDS (``unix_micros``) because every
    fixture timestamp carries sub-second parts — a seconds-granularity
    date_diff would truncate differently across engines (§2.12)."""
    (events, customer) = T(spark, sf_dir, "events", "customer")
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = events.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    dim = customer.select(F.col("c_custkey").alias("user_id"), "c_name")
    return (
        p.join(
            e,
            (p["user_id"] == e["e_user_id"])
            & (e["e_ts"] >= p["p_ts"])
            & (e["e_ts"] <= p["p_ts"] + F.expr("INTERVAL 1 HOUR")),
        )
        .join(dim, "user_id", "left")
        .select(
            "p_event_id",
            "e_event_id",
            "user_id",
            "c_name",
            (F.unix_micros("e_ts") - F.unix_micros("p_ts")).alias("lag_micros"),
        )
        .orderBy("p_event_id", "e_event_id")
    )
