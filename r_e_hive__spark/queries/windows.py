"""Declared queries: window functions (SURVEY.md §2.5).

W1 (latest-N per key) and W3 (latest-record-wins) are the two reference
query shapes that become windows in the batch reformulation; rank/lag/frames
are declared engine surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from r_e_hive__spark.operators.relational import latest_n_per_key, latest_record_wins
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T


@query(
    "w13_latest_per_key",
    """
    SELECT 'w1' AS part, user_id, rn, event_id, event_type
    FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 3
    UNION ALL
    SELECT 'w3' AS part, user_id, CAST(1 AS BIGINT) AS rn, event_id, event_type
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY part, user_id, rn, event_id
    """,
    survey_rows=("W1", "W3", "S5", "O1", "O3"),
)
def w13_latest_per_key(spark, sf_dir):
    """W1 latest-N history page per user (LIMIT-100 commissions / LIMIT-50
    notifications, render-complete-deploy.js:512-516, 664-668) computed for
    ALL users in one window pass, UNIONed with W3 latest-record-wins — the
    event-sourced replacement for UPDATE-in-place (:476-486).  Both operators
    (latest_n_per_key, latest_record_wins) run; merged for the driver's
    50-query budget; id tiebreak pins determinism."""
    (events,) = T(spark, sf_dir, "events")
    order = [F.desc("ts"), F.desc("event_id")]
    w1 = (
        latest_n_per_key(events, ["user_id"], order, 3)
        .select(
            F.lit("w1").alias("part"), "user_id", "rn", "event_id", "event_type"
        )
    )
    w3 = latest_record_wins(events, ["user_id"], order).select(
        F.lit("w3").alias("part"),
        "user_id",
        F.lit(1).cast("long").alias("rn"),
        "event_id",
        "event_type",
    )
    return w1.unionByName(w3).orderBy("part", "user_id", "rn", "event_id")


@query(
    "w2_rank_lag",
    """
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS price_rank,
           CAST(LAG(o_totalprice) OVER w AS DOUBLE) AS prev_price,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, price_rank, o_orderkey LIMIT 2000
    """,
    survey_rows=("W-rank",),
)
def w2_rank_lag(spark, sf_dir):
    """Ranking + lag analytic functions (declared engine surface,
    SURVEY.md §2.5)."""
    (orders,) = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("price_rank"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .orderBy("o_custkey", "price_rank", "o_orderkey")
        .limit(2000)
    )


@retired_query(
    "w4_running_frames",
    """
    SELECT user_id, event_id,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_value,
      CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS window3_value
    FROM events
    ORDER BY user_id, event_id
    """,
    survey_rows=("W-frames", "ST6"),
)
def w4_running_frames(spark, sf_dir):
    """Running/sliding frame aggregation — the batch formulation of the
    per-key running balance state (ST6; ledger semantics
    render-complete-deploy.js:228); decimal-exact so the oracle hash is
    order-stable.  RETIRED round 10 (50-cap, VERDICT r9 item 1): frames
    stay driver-pinned by w2_rank_lag (rank/lag over the same window) and
    st6_running_state (the running-sum state itself); this oracle keeps
    running in tests/test_retired_queries.py.  Freed the slot for
    x30_bpe_train."""
    (events,) = T(spark, sf_dir, "events")
    ob = [F.asc("ts"), F.asc("event_id")]
    w_all = Window.partitionBy("user_id").orderBy(*ob).rowsBetween(Window.unboundedPreceding, 0)
    w_3 = Window.partitionBy("user_id").orderBy(*ob).rowsBetween(-2, 0)
    val = F.col("value").cast("decimal(12,2)")
    return (
        events.select(
            "user_id",
            "event_id",
            F.round(F.sum(val).over(w_all), 2).cast("double").alias("running_value"),
            F.round(F.sum(val).over(w_3), 2).cast("double").alias("window3_value"),
        )
        .orderBy("user_id", "event_id")
    )
