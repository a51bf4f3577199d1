"""Iterative graph traversal operators (SURVEY.md §2.3 J8).

The reference walks referral uplines one row at a time, ≤10 levels, per
redemption (render-complete-deploy.js:246-316: loop at :262-301, cap at
:259).  Spark SQL (≤4.x) has no recursive CTE, so the engine computes the
*ancestor closure* for ALL start nodes at once with a bounded iterative
self-join — set-at-a-time instead of the reference's N+1 per-row lookups.

Scale design (100 TB / power-law graphs):

- Each iteration is ONE equi-join frontier⋈edges on the frontier's
  ``ancestor`` key.  With AQE enabled, skewed hub keys (early MLM users have
  huge sub-trees converging on them) are split by the adaptive skew-join
  rule; for static planning, `repartition` on the join key keeps both sides
  co-partitioned across iterations.
- ``localCheckpoint`` every ``checkpoint_every`` iterations truncates the
  lineage so the plan doesn't grow O(depth) and re-optimize cost stays flat.
- Early exit: when a frontier empties (forest shallower than the cap), the
  loop stops — checked with ``isEmpty()`` which runs a cheap limit-1 job.

For a fixed small depth cap this beats Pregel/GraphFrames: no external
dependency, no vertex-program overhead, and every step is whole-stage
codegen'd by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_levels: int = 10,
    checkpoint_every: int = 4,
    early_exit: bool = True,
) -> DataFrame:
    """Compute ``(node, ancestor, level)`` for every node, level ≤ max_levels.

    ``edges`` must have one row per (child → parent) link, at most one parent
    per child (the reference walks a single inbound edge per user,
    render-complete-deploy.js:263-267; the operator itself tolerates DAGs —
    rows just multiply).

    level 1 = direct parent, level N = N hops up.
    """
    base = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("ancestor"),
        F.lit(1).alias("level"),
    )
    closure = base
    frontier = base
    # Parent lookup table, re-keyed once; reused by every iteration.
    parents = edges.select(
        F.col(child_col).alias("_c"), F.col(parent_col).alias("_p")
    )
    for level in range(2, max_levels + 1):
        nxt = (
            frontier.join(parents, frontier["ancestor"] == parents["_c"], "inner")
            .select(
                frontier["node"],
                F.col("_p").alias("ancestor"),
                F.lit(level).alias("level"),
            )
        )
        if early_exit and nxt.isEmpty():
            break
        if level % checkpoint_every == 0:
            # truncate lineage: O(depth) plan growth would dominate at depth≫10
            nxt = nxt.localCheckpoint(eager=True)
        closure = closure.unionByName(nxt)
        frontier = nxt
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
