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


# Measured strategy crossovers (BASELINE.md round-5 A/Bs).  The Arrow/
# numpy strategies pay a fixed ~0.5 s Python-worker-startup + transfer tax
# that only amortizes past tens of thousands of rows; below it the pure-JVM
# expression path wins.  Calibration anchors (Catalyst sizeInBytes == parquet
# file size for scans): documents sf0.1 = 5 k docs ≈ 0.6 MB (expr wins the
# shingler A/B), sf1 = 50 k docs ≈ 6 MB (pandas wins); embeddings sf0.1 =
# 2 k × 64-dim ≈ 0.8 MB (BLAS top-k already ~11× there).  Module-level so
# tests can monkeypatch the gate both ways.
SHINGLE_PANDAS_MIN_BYTES = 4 << 20  # ~30-40 k docs at fixture density
BLAS_MIN_BYTES = 256 << 10  # ~600 × 64-dim vectors


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df``'s optimized plan, or None when
    stats are unreadable — the zero-job input to every strategy="auto"
    gate (same machinery as plan_fits_broadcast)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


# Catalyst returns spark.sql.defaultSizeInBytes (Long.MaxValue by default)
# for plans it cannot estimate (LogicalRDD — every createDataFrame /
# RDD-backed frame).  That is a SENTINEL, not an estimate: treating it as
# real would route tiny in-memory frames to the Python/Arrow path, the
# exact case the crossover gates exist to avoid (round-6 code review).
# Real data is orders of magnitude below 2^60 (100 TB ≈ 2^47).
_STATS_UNKNOWN = 1 << 60


def resolve_strategy(df: DataFrame, small: str, large: str, min_bytes: int) -> str:
    """Pick a strategy by estimated input size: ``large`` (the Arrow/numpy
    fast path, whose fixed Python tax amortizes with volume) at or above
    ``min_bytes``, else ``small`` (the pure-JVM path).  Unreadable or
    sentinel stats → ``small``: deterministic, and guessing big would
    ship data to Python blindly."""
    size = plan_size_bytes(df)
    if size is None or size >= _STATS_UNKNOWN:
        return small
    return large if size >= min_bytes else small


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
