"""Declared queries: iterative graph traversal (SURVEY.md §2.3 J8, §2.5 W2).

The reference's one genuinely non-relational operator: the ≤10-level
referral upline walk (render-complete-deploy.js:246-316, cap at :259).
Spark SQL has no recursive CTE, so the engine computes the bounded ancestor
closure with an iterative self-join (operators/graph.py); the DuckDB oracle
uses WITH RECURSIVE — a genuine cross-paradigm differential test.

The declared queries traverse an *implicit* tree over the testdata:
``parent(k) = floor(k/2)`` for customer keys ≥ 2 (keys 0 and 1 are roots) —
a deterministic binary forest with depth ≈ log2(|customer|), >10 at sf0.1,
so the level cap is genuinely exercised.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators.graph import (
    ancestor_closure,
    closure_from_parent_expr,
    pagerank,
)
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T

_ORACLE_CLOSURE = """
    WITH RECURSIVE up AS (
      SELECT c_custkey AS node, c_custkey // 2 AS ancestor, 1 AS level
      FROM customer WHERE c_custkey >= 2
      UNION ALL
      SELECT node, ancestor // 2, level + 1
      FROM up WHERE ancestor >= 2 AND level < 10
    )
"""


def _closure(spark, sf_dir):
    (customer,) = T(spark, sf_dir, "customer")
    # closed-form ancestors ⇒ unrolled-projection closure (no join, no
    # shuffle): level-i ancestor of the binary tree is k >> i, valid while
    # the level-(i-1) node is ≥ 2 (k ≥ 2^i) — exactly the oracle's
    # `WHERE ancestor >= 2` recursion guard
    return closure_from_parent_expr(
        customer.where(F.col("c_custkey") >= 2),
        "c_custkey",
        lambda k, i: F.when(k >= 2**i, F.shiftright(k, i)).cast("long"),
        max_levels=10,
    )


@query(
    "j8_ancestor_closure",
    _ORACLE_CLOSURE
    + """
    SELECT node, ancestor, level FROM up
    WHERE node <= (SELECT MIN(c_custkey) + 499 FROM customer)
    ORDER BY node, level
    """,
    survey_rows=("J8", "W2"),
    bench=True,
)
def j8_ancestor_closure(spark, sf_dir):
    """(node, ancestor, level≤10) upline closure — the set-at-a-time
    replacement for the reference's per-redemption N+1 walk
    (render-complete-deploy.js:262-301).  Output windowed to the first 500
    keys so the declared result stays hash-friendly; the full closure is
    what the bench measures."""
    closure = _closure(spark, sf_dir)
    (customer,) = T(spark, sf_dir, "customer")
    lo = customer.agg(F.min("c_custkey").alias("m"))
    return (
        closure.join(
            F.broadcast(lo), closure["node"] <= F.col("m") + 499, "left_semi"
        )
        .select("node", "ancestor", "level")
        .orderBy("node", "level")
    )


# Retired from the declared surface in round 7 (50-cap): the SAME oracle
# and closure stay driver-pinned by j8_ancestor_closure; the doubling
# path's differential keeps running in tests/test_retired_queries.py and
# the query stays in the bench headline set (bench=True — it is the
# deliberately forced-distributed instrument row, BASELINE.md).
@retired_query(
    "j8_doubling_closure",
    _ORACLE_CLOSURE
    + """
    SELECT node, ancestor, level FROM up
    WHERE node <= (SELECT MIN(c_custkey) + 499 FROM customer)
    ORDER BY node, level
    """,
    survey_rows=("J8", "W2"),
    bench=True,
)
def j8_doubling_closure(spark, sf_dir):
    """The SAME closure as j8_ancestor_closure, but forced through the
    distributed log-depth path-doubling joins over a MATERIALIZED edge
    table (operators/graph.py:ancestor_closure, strategy='doubling') — the
    100 TB strategy, differentially tested against the WITH RECURSIVE
    oracle.  The closed-form posexplode unrolling cannot kick in here: the
    edge set is a DataFrame, not a parent expression, exactly the shape a
    real referral table has (render-complete-deploy.js:263-267)."""
    (customer,) = T(spark, sf_dir, "customer")
    edges = customer.where(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 2").alias("parent"),
    )
    closure = ancestor_closure(
        edges, "child", "parent", max_levels=10, strategy="doubling"
    )
    lo = customer.agg(F.min("c_custkey").alias("m"))
    return (
        closure.join(
            F.broadcast(lo), closure["node"] <= F.col("m") + 499, "left_semi"
        )
        .select("node", "ancestor", "level")
        .orderBy("node", "level")
    )


# Retired from the declared surface in round 5 (50-query cap; ledger in
# queries/__init__.py): the aggregate-over-closure semantics stay pinned
# by rehive_redemption_ledger (per-level passive commissions over the SAME
# upline closure) and the closure itself by j8_ancestor_closure /
# j8_doubling_closure.  Differential kept green by
# tests/test_retired_queries.py.
@retired_query(
    "j8_upline_aggregate",
    _ORACLE_CLOSURE
    + """
    SELECT u.ancestor,
           COUNT(*) AS n_descendants,
           MAX(u.level) AS max_level,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(12,2)) * CAST(0.05 AS DECIMAL(3,2))), 2) AS DOUBLE) AS passive_commission
    FROM up u JOIN customer c ON c.c_custkey = u.node
    GROUP BY u.ancestor
    ORDER BY u.ancestor
    """,
    survey_rows=("J8", "A1", "F1"),
)
def j8_upline_aggregate(spark, sf_dir):
    """Passive-commission rollup over the closure: every ancestor earns a
    flat per-level rate on descendant activity — the batch generalization of
    processPassiveCommissions (flat rate per level,
    render-complete-deploy.js:275-283), computed for all uplines at once."""
    closure = _closure(spark, sf_dir)
    (customer,) = T(spark, sf_dir, "customer")
    rate = F.lit(0.05).cast("decimal(3,2)")
    return (
        closure.join(customer, closure["node"] == customer["c_custkey"])
        .groupBy("ancestor")
        .agg(
            F.count("*").alias("n_descendants"),
            F.max("level").alias("max_level"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(12,2)") * rate), 2
            )
            .cast("double")
            .alias("passive_commission"),
        )
        .orderBy("ancestor")
    )


# ---------------------------------------------------------------------------
# X33 — PageRank (declared round 7; VERDICT r6 item 6)
# ---------------------------------------------------------------------------

_PR_ITER = 5  # fixed iteration count: tol=0.0 on the Spark side forces
# exactly this many power-iteration rounds, and the oracle unrolls the
# SAME count as plain CTEs (aggregates over a recursive reference are not
# legal SQL, so the fixed-depth replay is the honest cross-engine form).
_PR_D = 0.85


def _pagerank_oracle(n_iter: int, d: float) -> str:
    """Unrolled power-iteration replay of operators/graph.py:pagerank —
    teleport, dangling-mass completion, multigraph (parallel-edge)
    semantics, all in plain DuckDB SQL.  Float literals are CAST to
    DOUBLE: a bare 0.85 parses as DECIMAL in DuckDB and its
    decimal→double value differs from the Python double in the last ulp;
    the 6-dp terminal rounding (the x28 avg_logp discipline) absorbs
    summation-order noise either way, but the literals should not add
    their own."""
    dd = f"CAST({d} AS DOUBLE)"
    parts = [
        f"""
    WITH ed AS (
      SELECT 'C' || o.o_custkey AS src, 'S' || l.l_suppkey AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), nodes AS (
      SELECT src AS node FROM ed UNION SELECT dst FROM ed
    ), nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM ed GROUP BY src),
    pr0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)
    """
    ]
    for i in range(n_iter):
        parts.append(
            f"""
    , dang{i} AS (
      SELECT COALESCE(SUM(p.rank), 0.0) AS dm
      FROM pr{i} p LEFT JOIN deg g ON p.node = g.src
      WHERE g.src IS NULL
    ), recv{i} AS (
      SELECT e.dst AS node, SUM(p.rank / g.deg) AS recv
      FROM ed e JOIN pr{i} p ON p.node = e.src JOIN deg g ON g.src = e.src
      GROUP BY e.dst
    ), pr{i + 1} AS (
      SELECT n.node,
             (1.0 - {dd}) / (SELECT n FROM nn)
               + ({dd} * (SELECT dm FROM dang{i})) / (SELECT n FROM nn)
               + {dd} * COALESCE(r.recv, 0.0) AS rank
      FROM nodes n LEFT JOIN recv{i} r ON r.node = n.node
    )"""
        )
    parts.append(
        f"""
    SELECT node, CAST(ROUND(rank, 6) AS DOUBLE) AS rank
    FROM pr{n_iter} ORDER BY node
    """
    )
    return "".join(parts)


@query(
    "x33_pagerank",
    _pagerank_oracle(_PR_ITER, _PR_D),
    survey_rows=("X33",),
)
def x33_pagerank(spark, sf_dir):
    """PageRank over the customer→supplier purchase link graph (every
    lineitem is one directed parallel edge from the ordering customer to
    the supplying supplier — multigraph semantics, exactly a raw link
    table's shape; node ids are prefixed 'C'/'S' because the key spaces
    overlap).  Suppliers have no out-edges, so the ENTIRE supplier-side
    rank is dangling mass every round — the stochastic-completion term is
    load-bearing here, not decorative.  Fixed 5 iterations (tol=0.0), so
    the unrolled DuckDB replay computes the identical vector; ranks round
    to 6 dp on both sides (distributed double sums commute to ~1e-12;
    SURVEY §2.12 rule 3)."""
    lineitem, orders = T(spark, sf_dir, "lineitem", "orders")
    edges = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
    )
    ranks = pagerank(
        edges, "src", "dst", damping=_PR_D, max_iter=_PR_ITER, tol=0.0
    )
    return ranks.select(
        "node", F.round("rank", 6).cast("double").alias("rank")
    ).orderBy("node")
