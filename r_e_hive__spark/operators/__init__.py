"""Operator library — reusable DataFrame-level operators.

One module per SURVEY.md §2 operator family.  Everything here is a plain
function ``DataFrame -> DataFrame`` (or a small builder class), declarative
where possible so Catalyst keeps optimizing through it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread a narrow input across the cluster before CPU-heavy work.

    Small single-row-group parquet files arrive as ONE partition, which would
    serialize shingling/hashing/vector math onto one core no matter how many
    executors exist.  Repartition only when the input has fewer partitions
    than the default parallelism — a well-partitioned 100 TB input passes
    through untouched (no extra shuffle), while a 1-partition input costs one
    tiny row-shuffle and unlocks full fan-out for everything downstream.
    """
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def plan_fits_broadcast(df: DataFrame) -> bool:
    """True iff Catalyst's size estimate for ``df``'s optimized plan is
    within the session's ``autoBroadcastJoinThreshold`` — the same gate
    Spark's planner applies to pick a broadcast join, reused one level up
    by every operator that chooses a gather-vs-distributed strategy
    (dedup verify joins, the graph closure, sequence ids, the packing
    prefix-sum).  ``max(thresh, 0)`` maps threshold=-1 (broadcast
    disabled) to "nothing fits"; unreadable stats/conf → False, the
    conservative (distributed) answer.  One implementation so a fix lands
    everywhere (round-4 code review)."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        thresh = int(df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
        return 0 <= size <= max(thresh, 0)
    except Exception:
        return False
