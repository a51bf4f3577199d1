"""Corpus packing operators: weighted prefix-sums and token-budget sharding.

The training-data pipeline counterpart of ``io.sequence_ids``: given a
per-document weight (token count), assign each document a running offset and
a shard id so that consecutive documents fill fixed token-budget shards —
the step that turns a curated corpus into the fixed-size training shards a
loader consumes.  The reference has no analog (it pages with LIMIT/OFFSET,
render-complete-deploy.js:512-516); this is declared LLM-pipeline surface
(SURVEY.md §2.11 X9).

Scale design
------------
Packing is a prefix-sum over a total order — the classic "looks inherently
sequential" operator.  Two strategies, auto-gated by Catalyst's size
estimate exactly like ``io.sequence_ids``:

- **small** (group fits one task): one window per partition group —
  ``SUM(w) OVER (PARTITION BY pcols ORDER BY ocols)``.  One shuffle.
- **large**: two-phase distributed prefix-sum.  ``repartitionByRange`` on
  (pcols, ocols) splits every group across many range partitions; a
  per-(range-partition, group) weight total (one tiny row each) is
  prefix-summed on the driver-sized offsets table and broadcast back; the
  within-partition window then runs with the range-partition id in its key,
  so no single task ever holds a whole group.  The result is identical to
  the single-window plan and independent of partition boundaries.

Weights must be non-negative integers (token counts); sums stay in int64
codegen (no decimal, no Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _auto_distributed(df: DataFrame) -> bool:
    """True when Catalyst's size estimate exceeds the broadcast threshold
    (shared gate: operators.plan_fits_broadcast).  NOTE the asymmetry with
    the other call sites: unreadable stats gate to the SMALL-window path
    here (False), preserving the original smoke-scale behavior."""
    from r_e_hive__spark.operators import plan_fits_broadcast

    try:
        int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return False
    return not plan_fits_broadcast(df)


def weighted_prefix_sum(
    df: DataFrame,
    weight_col: str,
    order_cols: Sequence[Column | str],
    partition_cols: Sequence[str] = (),
    out_col: str = "_cum",
    distributed: bool | None = None,
) -> DataFrame:
    """Running total of ``weight_col`` over ``order_cols`` within each
    ``partition_cols`` group (inclusive of the current row), as int64."""
    pcols = list(partition_cols)
    ocols = list(order_cols)
    if distributed is None:
        distributed = _auto_distributed(df)
    w = F.col(weight_col).cast("long")

    if not distributed:
        spec = (
            Window.partitionBy(*pcols).orderBy(*ocols)
            if pcols
            else Window.orderBy(*ocols)
        ).rowsBetween(Window.unboundedPreceding, 0)
        return df.withColumn(out_col, F.sum(w).over(spec))

    # Two subtrees consume the ranged batch and repartitionByRange's sampled
    # bounds are not guaranteed identical across re-executions — pin one
    # materialization (same trick as io.sequence_ids / operators/graph).
    ranged = (
        df.repartitionByRange(*pcols, *ocols)
        .sortWithinPartitions(*pcols, *ocols)
        .localCheckpoint(eager=True)
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # one tiny row per (range partition, group): the cross-partition offsets
    w_off = Window.partitionBy(*pcols).orderBy("_pid") if pcols else Window.orderBy("_pid")
    offsets = (
        with_pid.groupBy("_pid", *pcols)
        .agg(F.sum(w).alias("_w"))
        .withColumn("_off", F.sum("_w").over(w_off) - F.col("_w"))
        .drop("_w")
    )
    # within-partition running total; _pid in the key bounds every task to
    # one range partition of one group
    w_local = Window.partitionBy("_pid", *pcols).orderBy(*ocols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # offsets is one row per (range partition, GROUP): tiny for the common
    # few-groups case, but a high-cardinality partition_cols (lang x domain
    # on a web corpus) makes it millions of rows — gate the broadcast hint
    # on the actual count instead of hinting unconditionally (round-4
    # review).  localCheckpoint (not persist) so the count does not
    # recompute the aggregation: checkpoint blocks are ContextCleaner-owned
    # and freed when the frame is garbage-collected, whereas df.persist()
    # registers a CacheManager entry that outlives the call and accumulates
    # across invocations in a long-lived session (round-4 ADVICE).  The
    # 4M-row cap is the same HashedRelation ceiling the q5 gate uses.
    offsets = offsets.localCheckpoint(eager=True)
    off_side = offsets if offsets.count() > 4_000_000 else F.broadcast(offsets)
    return (
        with_pid.join(off_side, ["_pid", *pcols])
        .withColumn(out_col, (F.col("_off") + F.sum(w).over(w_local)).cast("long"))
        .drop("_pid", "_off")
    )


def pack_shards(
    df: DataFrame,
    weight_col: str,
    order_cols: Sequence[Column | str],
    budget: int,
    partition_cols: Sequence[str] = (),
    shard_col: str = "shard_id",
    distributed: bool | None = None,
) -> DataFrame:
    """Assign consecutive documents (in ``order_cols`` order, per
    ``partition_cols`` group) to fixed token-budget shards.

    A document lands in the shard where it *starts*:
    ``shard_id = (running_total − weight) DIV budget``.  Shard boundaries
    therefore fall every ``budget`` tokens of the cumulative stream: a
    shard's documents all start inside one budget window, a single
    over-budget document spans windows without stalling the pipeline, and
    a shard can hold FEWER than ``budget`` tokens when an over-budget
    neighbor consumed most of its window (e.g. budget=10, weights
    [19, 2, 30] → shards 0, 1, 2 with shard 1 holding only the 2-token
    doc) — the guarantee is bounded per-shard START positions, not a
    per-shard token minimum.  Integer arithmetic end-to-end.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    cum = "_cum_w"
    out = weighted_prefix_sum(
        df,
        weight_col,
        order_cols,
        partition_cols=partition_cols,
        out_col=cum,
        distributed=distributed,
    )
    start = F.col(cum) - F.col(weight_col).cast("long")
    # start ≥ 0, so integer floor division = (start − start % budget) / budget,
    # all in int64 (the final `/` divides exact multiples; cast truncates the
    # ".0" — no float rounding can occur below 2^53 total tokens per group)
    shard = ((start - (start % F.lit(budget))) / F.lit(budget)).cast("long")
    return out.withColumn(shard_col, shard).drop(cum)
