"""Hypertable-style time rollups: hierarchical partials + incremental
maintenance (SURVEY.md §2.11 X12).

The north star names "hypertable rollup" (TimescaleDB continuous
aggregates) among the custom operators Spark lacks.  Two pieces:

- ``time_rollup``: aggregate the fact stream ONCE at the finest
  granularity, then derive every coarser granularity from those partials
  (sum-of-sums / sum-of-counts — any commutative-monoid aggregate).  At
  100 TB this is the only sane shape: the fact scan happens once, and the
  coarser levels aggregate partial tables that are orders of magnitude
  smaller than the facts.  (At single-node test scale the extra barrier
  can cost more than the row reduction saves — measured in BASELINE.md's
  st2 A/B — which is why the *declared* st2 query keeps its fused form;
  this operator is the scale shape, correctness-pinned against direct
  aggregation at every granularity.)
- ``merge_rollup``: incremental view maintenance — merge a micro-batch's
  partials into a stored rollup by (bucket, keys) addition.  Hooked to
  ``foreachBatch`` this maintains a queryable continuous aggregate whose
  merge cost is O(batch buckets), independent of history size.  Additive
  merge is idempotent-safe only per batch; replay protection comes from
  the checkpointed source (each file/offset delivered once per
  checkpoint), same contract as any additive streaming sink.

Avg derives from (sum, count) at read time; min/max merge by min/max.
Non-decomposable aggregates (exact median/distinct) need sketches and are
out of scope here (see dedup/similarity modules for sketch precedents).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: granularity name -> seconds (fixed-width buckets; month/year are NOT
#: fixed-width and would need date_trunc semantics instead)
_GRAN_SECONDS = {
    "1 minute": 60,
    "5 minutes": 300,
    "10 minutes": 600,
    "30 minutes": 1800,
    "1 hour": 3600,
    "6 hours": 21600,
    "1 day": 86400,
}


def _check_hierarchy(grans: Sequence[str]) -> list[int]:
    secs = []
    for g in grans:
        if g not in _GRAN_SECONDS:
            raise ValueError(f"unsupported granularity {g!r}; use {list(_GRAN_SECONDS)}")
        secs.append(_GRAN_SECONDS[g])
    for fine, coarse in zip(secs, secs[1:]):
        if coarse % fine != 0 or coarse <= fine:
            raise ValueError(
                f"granularities must be strictly coarsening multiples; "
                f"{coarse}s is not a multiple of {fine}s"
            )
    return secs


def aggregate_finest(
    facts: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str],
    granularity: str,
) -> DataFrame:
    """The single fact-table scan: decomposable partials (sum/count/min/max)
    at the finest bucket.  ``bucket`` is the epoch-second bucket start."""
    w = _GRAN_SECONDS[granularity]
    v = F.col(value_col)
    return (
        facts.withColumn(
            "bucket", (F.floor(F.unix_timestamp(F.col(ts_col)) / w) * w).cast("long")
        )
        .groupBy("bucket", *keys)
        .agg(
            F.sum(v).alias("sum_value"),
            F.count("*").alias("n_rows"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
    )


def _merge_aggs() -> list:
    """The partial-merge monoid: sum-of-sums, sum-of-counts, min-of-mins,
    max-of-maxes — shared by the coarsening rollup and the exact-bucket
    incremental merge."""
    return [
        F.sum("sum_value").alias("sum_value"),
        F.sum("n_rows").alias("n_rows"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]


def rollup_from_partials(
    partials: DataFrame, keys: Sequence[str], granularity: str
) -> DataFrame:
    """Derive a coarser level from finer partials: sum-of-sums,
    sum-of-counts, min-of-mins, max-of-maxes.  Input must be the schema
    ``aggregate_finest`` (or this function) produces."""
    w = _GRAN_SECONDS[granularity]
    return (
        partials.withColumn("bucket", (F.floor(F.col("bucket") / w) * w).cast("long"))
        .groupBy("bucket", *keys)
        .agg(*_merge_aggs())
    )


def time_rollup(
    facts: DataFrame,
    ts_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    granularities: Sequence[str] = ("10 minutes", "1 hour", "1 day"),
) -> dict[str, DataFrame]:
    """The full hierarchy: facts scanned once at ``granularities[0]``, every
    coarser level derived from the previous level's partials.  Returns
    {granularity: DataFrame}.  Each level's plan reads the finer level, so
    persisting the finest table gives TimescaleDB-style continuous
    aggregates for free."""
    _check_hierarchy(granularities)
    keys = list(keys)
    out: dict[str, DataFrame] = {}
    level = aggregate_finest(facts, ts_col, value_col, keys, granularities[0])
    out[granularities[0]] = level
    for g in granularities[1:]:
        level = rollup_from_partials(level, keys, g)
        out[g] = level
    return out


def merge_rollup(
    existing: DataFrame | None, batch_partials: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Incremental maintenance: existing ∪ batch, re-merged by EXACT
    (bucket, keys) equality — no re-bucketing, so the merge is correct for
    partials at ANY granularity (a round-4 review found the previous form
    re-bucketed at '1 minute' and was only correct because every
    ``_GRAN_SECONDS`` entry is a multiple of 60 s; a later sub-minute
    granularity would have silently re-bucketed and corrupted the merge).

    This function itself re-aggregates whatever ``existing`` frame it is
    given — pass the FULL rollup and the cost is O(history); pass only the
    partitions the batch touches (as
    ``streaming.jobs.stream_continuous_aggregate`` does: day-partitioned
    storage, partition-pruned read, dynamic-overwrite write) and the cost
    is O(touched days), independent of retained history."""
    unioned = (
        batch_partials
        if existing is None
        else existing.unionByName(batch_partials)
    )
    return unioned.groupBy("bucket", *keys).agg(*_merge_aggs())
