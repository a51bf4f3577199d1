"""Relational core operators (SURVEY.md §2.1-2.3, 2.6).

Thin, composable wrappers over the DataFrame API that pin the semantics the
reference exercises through Drizzle: point lookups, relation loads
(FK-equi-joins), existence/uniqueness (semi/anti joins), latest-N-per-key
and latest-record-wins (the event-sourced replacement for UPDATE,
SURVEY.md §2.1 S5).

Everything stays declarative — each helper returns an untriggered DataFrame
so Catalyst sees the whole plan (pushdown, broadcast selection, top-k
rewrites all still apply).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def point_lookup(df: DataFrame, key_col: str, value) -> DataFrame:
    """``findFirst(where eq(pk, v))`` (render-complete-deploy.js:210-212 et
    al.): equality predicate + LIMIT 1.  On a key-sorted/partitioned table
    the filter is pushed into the parquet scan (row-group skipping)."""
    return df.where(F.col(key_col) == F.lit(value)).limit(1)


def relation_load(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    how: str = "left",
    broadcast_parent: bool = True,
) -> DataFrame:
    """Drizzle ``with:`` relation load (render-complete-deploy.js:350-353):
    left equi-join child.fk = parent.pk.  Dimension parents (e.g. `packages`,
    which the UI enumerates whole — :403-413) are broadcast so the join is
    shuffle-free on the fact side."""
    p = F.broadcast(parent) if broadcast_parent else parent
    return child.join(p, child[fk] == p[pk], how)


def exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """Semi-join existence check (render-complete-deploy.js:464-470 shape)."""
    return df.join(other, list(on), "left_semi")


def not_exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """Anti-join — duplicate rejection at ingest, enforcing the reference's
    unique constraints (render-complete-deploy.js:45, 50, 67)."""
    return df.join(other, list(on), "left_anti")


def latest_n_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
    n: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Latest-N-per-key (history pages: LIMIT 100 commissions / 50
    notifications per user, render-complete-deploy.js:512-516, 664-668),
    batch-reformulated as one window pass for ALL keys at once.

    Partition-local sort + row_number: one shuffle on the key, no global
    sort.  ``order_cols`` must end in a unique tiebreaker (determinism rule,
    SURVEY.md §2.6 O1)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= n)
    )


def latest_record_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Event-sourced current state: the engine's replacement for the
    reference's UPDATE-in-place (render-complete-deploy.js:476-486, 722-737).
    Keep the newest event per key; ``order_cols`` descending with a unique
    tiebreaker."""
    return latest_n_per_key(df, key_cols, order_cols, 1).drop("rn")


def top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (render-complete-deploy.js:514-515 shape).  Spark plans
    this as TakeOrderedAndProject: per-partition heaps + driver merge — no
    full sort, no single-node shuffle even at 100 TB."""
    return df.orderBy(*order_cols).limit(k)
