"""Iterative graph traversal operators (SURVEY.md §2.3 J8).

The reference walks referral uplines one row at a time, ≤10 levels, per
redemption (render-complete-deploy.js:246-316: loop at :262-301, cap at
:259).  Spark SQL (≤4.x) has no recursive CTE, so the engine computes the
*ancestor closure* for ALL start nodes at once — set-at-a-time instead of
the reference's N+1 per-row lookups.

The closure is built by **path doubling**, not one-hop-at-a-time: round k
holds every path of length ≤ 2^k, and the next round extends it with the
unique decomposition "prefix of length exactly 2^k + suffix of length
≤ 2^k".  Unique decomposition means no duplicate paths and no dedup pass.
Depth 10 therefore costs 4 joins (1→2→4→8→10) instead of 9, and the whole
closure is ONE lazy plan — no per-iteration isEmpty()/checkpoint actions.

Scale design (100 TB / power-law graphs):

- log₂(depth) shuffle rounds instead of depth rounds — at 1000 executors
  the shuffle-barrier count is the dominant latency term, so halving rounds
  roughly halves wall-clock for the deep-graph case.
- Each round is an equi-join on the frontier's ``ancestor`` key.  MLM-style
  graphs converge on early users (heavy-hitter keys); AQE's skew-join rule
  splits those partitions at runtime (enabled in session.get_spark).
- Lineage depth is O(log depth), so no checkpointing is needed even for
  depth caps in the hundreds; for a functional graph (≤1 parent per child,
  the reference's shape) round k's output is ≤ n·2^k rows, linear in n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_levels: int = 10,
) -> DataFrame:
    """Compute ``(node, ancestor, level)`` for every node, level ≤ max_levels.

    ``edges`` has one row per (child → parent) link.  At most one parent per
    child is the reference's shape (it walks a single inbound edge,
    render-complete-deploy.js:263-267); the operator itself tolerates DAGs —
    each distinct path contributes one row, exactly like the one-hop loop.

    level 1 = direct parent, level N = N hops up.
    """
    closure = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("ancestor"),
        F.lit(1).cast("int").alias("level"),
    )
    reach = 1  # closure currently holds all paths of length ≤ reach
    while reach < max_levels:
        # Paths of length in (reach, 2*reach] decompose uniquely as
        # (exactly-reach prefix) + (suffix of length ≤ reach): join the
        # exact-length frontier against the whole closure.
        prefix = (
            closure.where(F.col("level") == reach)
            .select(
                F.col("node").alias("_n"),
                F.col("ancestor").alias("_mid"),
                F.col("level").alias("_l"),
            )
            .alias("pfx")
        )
        suffix = closure.alias("sfx")
        ext = (
            prefix.join(suffix, F.col("pfx._mid") == F.col("sfx.node"), "inner")
            .select(
                F.col("pfx._n").alias("node"),
                F.col("sfx.ancestor").alias("ancestor"),
                (F.col("pfx._l") + F.col("sfx.level")).alias("level"),
            )
            .where(F.col("level") <= max_levels)
        )
        closure = closure.unionByName(ext)
        reach = min(reach * 2, max_levels)
        if reach < max_levels:
            # The closure appears TWICE in next round's plan (prefix and
            # suffix), so without materialization the lazy plan tree doubles
            # per round — 2^rounds leaf scans, and AQE re-executes each one.
            # An eager localCheckpoint pins this round's result (≤ depth·|E|
            # rows for a functional graph) to executor storage and truncates
            # lineage: each round is computed exactly once.
            closure = closure.localCheckpoint(eager=True)
    return closure


def closure_from_parent_expr(
    nodes: DataFrame,
    key_col: str,
    parent_expr,
    max_levels: int = 10,
    **kw,
) -> DataFrame:
    """Ancestor closure where the parent is a computed expression of the key
    (e.g. the implicit binary tree ``parent = floor(key/2)`` used by the
    declared-query suite over the testdata ``customer`` table)."""
    edges = nodes.select(
        F.col(key_col).alias("child"), parent_expr.alias("parent")
    ).where(F.col("parent").isNotNull())
    return ancestor_closure(edges, "child", "parent", max_levels=max_levels, **kw)
