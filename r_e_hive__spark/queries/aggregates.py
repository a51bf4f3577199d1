"""Declared queries: aggregations (SURVEY.md §2.4) + the flagship pricing
summary.

All money aggregates run in exact DecimalType (the engine's deliberate fix
of the reference's float money math, SURVEY.md §1.3) and terminate in
ROUND(x, n)::DOUBLE so the DuckDB oracle hash-matches bit-for-bit regardless
of distributed summation order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.catalog import _ctx_id
from r_e_hive__spark.functions import fixedpoint as fp
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (bench headline)
# ---------------------------------------------------------------------------

_Q1_SPARK = """
SELECT l_returnflag, l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 4) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 4) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(3,2)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM((CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(3,2)))) * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(3,2)))), 4) AS DOUBLE) AS sum_charge,
  CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_price,
  CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# Spark-side formulation of _Q1_SPARK: fixed-point money arithmetic
# (functions/fixedpoint.py).  Each money column converts to BIGINT units
# once; products and sums run in integer codegen; the six per-group totals
# convert back to exact decimal.  Bit-identical to the decimal oracle
# (asserted per shipped SF in tests/test_fixedpoint.py), ~3x faster at sf5.
_EP = fp.unscaled_fast_sql("l_extendedprice")          # cents
_QTY = fp.unscaled_fast_sql("l_quantity")              # hundredths
_DM = f"(100 - {fp.unscaled_fast_sql('l_discount')})"  # (1-d) in hundredths
_TP = f"(100 + {fp.unscaled_fast_sql('l_tax')})"       # (1+t) in hundredths
_Q1_SPARK_FIXED = f"""
SELECT l_returnflag, l_linestatus,
  {fp.money_of_units_sql(f'SUM({_QTY})', 2)} AS sum_qty,
  {fp.money_of_units_sql(f'SUM({_EP})', 2)} AS sum_base_price,
  {fp.money_of_units_sql(f'SUM({_EP} * {_DM})', 4)} AS sum_disc_price,
  {fp.money_of_units_sql(f'SUM({_EP} * {_DM} * {_TP})', 6, round_to=4)} AS sum_charge,
  ROUND({fp.money_of_units_sql(f'SUM({_QTY})', 2)} / COUNT(*), 4) AS avg_qty,
  ROUND({fp.money_of_units_sql(f'SUM({_EP})', 2)} / COUNT(*), 4) AS avg_price,
  ROUND({fp.money_of_units_sql(f"SUM({fp.unscaled_fast_sql('l_discount')})", 2)} / COUNT(*), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query(
    "q1_pricing_summary",
    _Q1_SPARK,  # identical dialect-neutral SQL runs on DuckDB
    survey_rows=("A1", "A2", "A3", "F1", "F2"),
    bench=True,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship aggregation: partial (map-side) + final hash aggregation over
    exact money math — the batch generalization of the reference's
    running-balance SUM fragments (render-complete-deploy.js:228, 287, 862).
    Fixed-point formulation (functions/fixedpoint.py): decimal-exact results
    from integer accumulation, bit-identical to the decimal oracle SQL."""
    T(spark, sf_dir, "lineitem")
    return spark.sql(_Q1_SPARK_FIXED)


# ---------------------------------------------------------------------------
# A1/A5 — per-entity balance + sufficiency filter (ledger analog over events)
# ---------------------------------------------------------------------------


@retired_query(
    "a1_user_balance",
    """
    SELECT user_id,
      CAST(ROUND(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2))
                          WHEN event_type = 'error' THEN -CAST(value AS DECIMAL(12,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS balance,
      COUNT(*) AS n_events
    FROM events GROUP BY user_id
    HAVING SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2))
                    WHEN event_type = 'error' THEN -CAST(value AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) >= CAST(0.5 AS DECIMAL(3,2))
    ORDER BY user_id
    """,
    survey_rows=("A1", "A5", "S5"),
)
def a1_user_balance(spark, sf_dir):
    """current balance = Σcredits − Σdebits, the engine's derived-view
    replacement for the reference's `balance = balance ± x` in-place updates
    (render-complete-deploy.js:228, 725); HAVING = the sufficiency check
    (:541-545).

    Fixed-point formulation (functions/fixedpoint.py): the signed amount is
    integer cents, the per-user total accumulates as a plain BIGINT inside
    whole-stage codegen, and the HAVING bound (0.50) compares as 50 cents —
    bit-identical to the decimal oracle (ROUND on a scale-2-exact total is a
    no-op) with zero BigDecimal allocation in the aggregate."""
    (events,) = T(spark, sf_dir, "events")
    units = (
        F.when(F.col("event_type") == "purchase", fp.unscaled_fast("value"))
        .when(F.col("event_type") == "error", -fp.unscaled_fast("value"))
        .otherwise(F.lit(0).cast("long"))
    )
    return (
        events.groupBy("user_id")
        .agg(
            F.sum(units).alias("_units"),
            F.count("*").alias("n_events"),
        )
        .where(F.col("_units") >= 50)
        .select(
            "user_id",
            fp.money_of_units(F.col("_units"), 2).alias("balance"),
            "n_events",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# A4 — per-entity profit with floor-at-zero
# ---------------------------------------------------------------------------


# (The standalone a4_order_profit pinning query was retired in round 3:
# A4's floored-profit semantic — `Math.max(0, ...)`,
# render-complete-deploy.js:303-311 — is pinned by rehive_company_profits,
# which computes the identical GREATEST(0, price − Σ commissions) over the
# actual fixture pipeline, and the driver's declared surface is capped at
# 50 queries.)


# ---------------------------------------------------------------------------
# Grouping sets / rollup / distinct aggregates (engine surface, SURVEY §2.4)
# ---------------------------------------------------------------------------


_ROLLUP_SQL = """
SELECT COALESCE(r.r_name, '(all)') AS region_name,
       COALESCE(n.n_name, '(all)') AS nation_name,
       CAST(GROUPING(r.r_name) + GROUPING(n.n_name) AS BIGINT) AS lvl,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c.c_mktsegment) AS n_segments,
       CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_balance
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
ORDER BY lvl, region_name, nation_name
"""


@query(
    "agg_rollup_distinct",
    _ROLLUP_SQL,
    survey_rows=("A-rollup", "A-distinct"),
)
def agg_rollup_distinct(spark, sf_dir):
    """ROLLUP hierarchy totals with a distinct aggregate per group — the
    declared engine surface for grouping sets AND distinct aggregation
    (expand + two-phase aggregation in the physical plan), pinned together
    for the driver's 50-query budget."""
    T(spark, sf_dir, "customer", "nation", "region")
    return spark.sql(_ROLLUP_SQL)


# ---------------------------------------------------------------------------
# Join-heavy bench queries (TPC-H Q3/Q5 shapes)
# ---------------------------------------------------------------------------

_Q3 = """
SELECT l.l_orderkey,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l.l_discount AS DECIMAL(3,2)))), 4) AS DOUBLE) AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


# revenue in fixed-point: SUM(cents * (1-d in hundredths)) -> scale-4 units
_REV_FIXED = fp.money_of_units_sql(
    f"SUM({fp.unscaled_fast_sql('l.l_extendedprice')}"
    f" * (100 - {fp.unscaled_fast_sql('l.l_discount')}))",
    4,
)

_Q3_SPARK = f"""
SELECT l.l_orderkey,
  {_REV_FIXED} AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1996-03-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""


# Broadcast variant: pre-join the segment-filtered customers into the
# date-filtered orders ("co"), broadcast it into the lineitem probe —
# lineitem is never shuffled before the final (pre-aggregated) top-k.
# Valid only while co is broadcast-sized; gated like q5 below.
_Q3_SPARK_BCAST = f"""
WITH co AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
)
SELECT /*+ BROADCAST(co) */ l.l_orderkey,
  {_REV_FIXED} AS revenue,
  co.o_orderdate, co.o_orderpriority
FROM lineitem l JOIN co ON l.l_orderkey = co.o_orderkey
WHERE l.l_shipdate > TIMESTAMP '1996-03-01 00:00:00'
GROUP BY l.l_orderkey, co.o_orderdate, co.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
"""

_Q3_GATE_CACHE: dict[tuple, bool] = {}


@query("q3_shipping_priority", _Q3, survey_rows=("J4", "A1", "O3"), bench=True)
def q3_shipping_priority(spark, sf_dir):
    """Join-heavy 3-table aggregation with selective filters — exercises
    filter pushdown on both fact scans, shuffle-join ordering, and top-k.
    Spark side runs the fixed-point revenue sum (functions/fixedpoint.py).

    Gated like q5: while the (filtered customer ⋈ filtered orders) build
    side is broadcast-sized, it broadcasts into the lineitem probe and
    lineitem never shuffles (2.2 s → 1.1 s at sf5, measured).  The probe
    estimate is ``date-filtered orders × building-customer fraction``
    (uniform FK fan-out — the NDV arithmetic a CBO performs); with only
    catalog rowCount stats and no date histogram the gate is CONSERVATIVE
    (no selectivity credit → whole-orders estimate), preferring the
    shuffle plan that is correct at any scale."""
    T(spark, sf_dir, "customer", "orders", "lineitem")

    def estimate():
        n_orders_stat = _analyzed_row_count(spark, "orders", sf_dir)
        if n_orders_stat is not None:
            # conservative: no date histogram -> no selectivity credit
            return n_orders_stat, "stats"
        # ONE probe job: segment fraction and the date-filtered order count
        # in a single action over the cached tables
        r = spark.sql(
            """SELECT
                 (SELECT COUNT(*) FROM orders
                  WHERE o_orderdate < TIMESTAMP '1996-06-01 00:00:00') AS n_dated,
                 SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS n_seg,
                 COUNT(*) AS n_cust
               FROM customer"""
        ).collect()[0]
        n_seg = int(r.n_seg or 0)
        return (int(r.n_dated) * n_seg) // max(int(r.n_cust), 1), "probe"

    broadcast_ok = _gated_broadcast(spark, sf_dir, _Q3_GATE_CACHE, estimate)
    return spark.sql(_Q3_SPARK_BCAST if broadcast_ok else _Q3_SPARK)


_Q5 = """
SELECT n.n_name AS nation_name,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l.l_discount AS DECIMAL(3,2)))), 4) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""


# Spark-side formulation of _Q5: selective-first join order.  Catalyst does
# not reorder joins without CBO table stats (temp views over cached
# DataFrames have none), so the region filter is routed through nation into
# a semi-join on customer BEFORE the fact joins — customer shrinks ~5x
# before orders/lineitem are touched, and the runtime bloom filter
# (spark.sql.optimizer.runtime.bloomFilter, on by default) then prunes the
# lineitem shuffle against the reduced orders side.  Same result, same
# oracle; 1.6-1.8x faster at sf1 (measured).  At 100 TB the ordering matters
# even more: the pruned build sides are what keep the one unavoidable
# fact-fact shuffle minimal.
_Q5_SPARK = f"""
WITH local_nation AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
)
SELECT n.n_name AS nation_name,
  {_REV_FIXED} AS revenue
FROM (SELECT c_custkey, c_nationkey FROM customer
      WHERE c_nationkey IN (SELECT n_nationkey FROM local_nation)) c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
JOIN local_nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""

# Broadcast variant: pre-join the selective customer side into orders once
# ("co"), then BROADCAST it into the lineitem probe — lineitem is never
# shuffled at all (the single remaining wide exchange in the shuffle plan).
# Only valid while co is broadcast-sized, hence the cardinality gate below.
_Q5_SPARK_BCAST = f"""
WITH local_nation AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
),
co AS (
  SELECT o.o_orderkey, c.c_nationkey
  FROM (SELECT c_custkey, c_nationkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM local_nation)) c
  JOIN orders o ON c.c_custkey = o.o_custkey
)
SELECT /*+ BROADCAST(co) */ n.n_name AS nation_name,
  {_REV_FIXED} AS revenue
FROM lineitem l
JOIN co ON l.l_orderkey = co.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = co.c_nationkey
JOIN local_nation n ON co.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, nation_name
"""

# Broadcast a gated build side (q3 AND q5) while its estimated row count
# stays under this bound: ~256 MB of HashedRelation at ~64 B/row — the
# classic executor-side broadcast ceiling.  Retuned in round 4 from 1 M
# after a measured cliff at sf5 (build ≈ 1.5 M rows): broadcast 1.9 s vs
# shuffle 16.5 s.  Above this size the fan-out cost (build × executor
# count) overtakes shuffling the fact side, which is the 100 TB regime the
# selective-first shuffle plan exists for.
_Q5_BCAST_MAX_BUILD_ROWS = 4_000_000
# strategy decision per (session, sf_dir): the cardinality probe is 3 tiny
# jobs on cached dims — cached so steady-state executions pay zero probes
_Q5_GATE_CACHE: dict[tuple, bool] = {}
# audit trail: which estimator decided — "stats" (catalog ANALYZE rowCounts,
# zero fact-table jobs) or "probe" (count jobs on the cached tables)
_Q5_GATE_SOURCE: dict[tuple, str] = {}


def _analyzed_row_count(spark, table: str, sf_dir: str | None = None) -> int | None:
    """rowCount from the persistent catalog's ANALYZE statistics — the CBO
    food metastore.analyze_tables computes.  The name is fully qualified so
    a temp view of the same name (the declared-query path) never shadows the
    catalog table.  None when the session has no such table or no stats —
    i.e. the driver's vanilla temp-view-only session.

    With ``sf_dir`` given, the catalog stat is trusted only when the
    catalog table's byte size is within 8× of the sf_dir parquet file's —
    a zero-job sanity band so a session whose catalog was ANALYZEd against
    a DIFFERENT scale factor cannot poison a broadcast decision for this
    one (both sides are parquet of the same rows, so genuine matches sit
    well inside the band while scale factors differ by orders of
    magnitude; code-review r4)."""
    import os as _os

    try:
        db = spark.catalog.currentDatabase  # property pre-Spark-4, method in 4.x
        if callable(db):
            db = db()
        # existence probe first: DESCRIBE on a missing table raises AND logs
        # an ERROR-level analyzer message — noisy on every stat-less session.
        # The db-qualified name can never match a temp view.
        if not spark.catalog.tableExists(f"{db}.{table}"):
            return None
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED spark_catalog.{db}.{table}").collect()
    except Exception:
        return None
    n_rows = stat_bytes = None
    for row in rows:
        if row["col_name"] == "Statistics":
            for part in row["data_type"].split(","):
                part = part.strip()
                if part.endswith("rows"):
                    n_rows = int(part.split()[0])
                elif part.endswith("bytes"):
                    stat_bytes = int(part.split()[0])
    if n_rows is not None and sf_dir is not None and stat_bytes:
        try:
            file_bytes = _os.path.getsize(_os.path.join(sf_dir, f"{table}.parquet"))
        except OSError:
            file_bytes = None
        if file_bytes and not (1 / 8 <= stat_bytes / file_bytes <= 8):
            return None  # stats describe different data than sf_dir
    return n_rows


def _gated_broadcast(
    spark,
    sf_dir: str,
    cache: dict,
    estimate,
    source: dict | None = None,
) -> bool:
    """Shared cardinality-gate machinery for the broadcast-vs-shuffle plan
    choice (q3/q5): one decision per (session, sf_dir), cached so
    steady-state executions pay zero probe jobs.  ``estimate`` returns
    (estimated_build_rows, source_label)."""
    key = (_ctx_id(spark), sf_dir)
    ok = cache.get(key)
    if ok is None:
        est_rows, src = estimate()
        ok = est_rows <= _Q5_BCAST_MAX_BUILD_ROWS
        cache[key] = ok
        if source is not None:
            source[key] = src
    return ok


@retired_query("q5_local_supplier", _Q5, survey_rows=("J2", "J4", "A1"), bench=True)
def q5_local_supplier(spark, sf_dir):
    """Six-table join (two broadcastable dims, one co-location predicate) —
    the plan-quality probe for join strategy selection at scale.

    RETIRED round 8 second wave (50-cap rotation for x13_zorder): every
    survey row stays driver-pinned elsewhere (J2 by j1_relation_load, J4
    by q3_shipping_priority, A1 by q1_pricing_summary /
    rehive_redemption_ledger / st6_running_state); the oracle keeps
    running in test_retired_queries.py, the cardinality-gate unit tests
    stay in tests/test_plans.py, and the query KEEPS its bench headline
    row (bench=True) — it is the tracked scan/shuffle-constant
    instrument in every BASELINE sweep.

    Join strategy is cardinality-gated at the orchestration layer (Catalyst
    without table stats estimates the (customer ⋈ orders) build side at
    ~10⁶× its true size, so a static hint cannot decide this).  Estimator
    precedence (VERDICT r3 item 4):

    1. **Catalog ANALYZE stats** — when the session's persistent catalog
       holds analyzed `orders`/`nation` tables (metastore.analyze_tables),
       the build estimate is ``rowCount(orders) × local_nations /
       total_nations`` — the customer term cancels under the CBO's
       NDV-uniformity assumption, so NO fact table is ever scanned to
       decide; only the ≤25-row dims are probed.
    2. **Probe fallback** — stat-less sessions (the driver's vanilla
       temp-view catalog) count the region's customers on the cached dims
       and scale by orders-per-customer; exact under uniform FK fan-out.

    Build side small ⇒ broadcast it into the lineitem probe and lineitem is
    NEVER shuffled (3× at sf1, measured); build side large (the 100 TB
    regime: one region's orders are still TBs) ⇒ selective-first shuffle
    plan with the runtime bloom filter pruning the lineitem exchange."""
    cust, orders, *_ = T(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )

    def estimate():
        row = spark.sql(
            """SELECT SUM(CASE WHEN r_name = 'AMERICA' THEN 1 ELSE 0 END) AS loc,
                      COUNT(*) AS tot
               FROM nation JOIN region ON n_regionkey = r_regionkey"""
        ).collect()[0]
        # SUM over zero rows is SQL NULL — treat as 0 local nations
        n_local_nations, n_nations = int(row.loc or 0), int(row.tot)
        n_orders_stat = _analyzed_row_count(spark, "orders", sf_dir)
        if n_orders_stat is not None:
            return (n_orders_stat * n_local_nations) // max(n_nations, 1), "stats"
        n_cust = cust.count()
        n_local = (
            spark.sql(
                """SELECT COUNT(*) AS n FROM customer
                   WHERE c_nationkey IN (
                     SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
                     WHERE r_name = 'AMERICA')"""
            ).collect()[0].n
        )
        return (orders.count() * n_local) // max(n_cust, 1), "probe"

    broadcast_ok = _gated_broadcast(
        spark, sf_dir, _Q5_GATE_CACHE, estimate, _Q5_GATE_SOURCE
    )
    return spark.sql(_Q5_SPARK_BCAST if broadcast_ok else _Q5_SPARK)
