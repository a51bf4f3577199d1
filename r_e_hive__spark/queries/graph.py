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

from r_e_hive__spark.operators.graph import ancestor_closure, closure_from_parent_expr
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


@query(
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
