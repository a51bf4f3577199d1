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
    if rank_col in df.columns:
        raise ValueError(
            f"rank_col {rank_col!r} already exists on the input frame; "
            f"pass a different rank_col to avoid clobbering it"
        )
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
    tiebreaker.  The internal rank uses a private name so a caller column
    called 'rn' survives untouched."""
    return latest_n_per_key(
        df, key_cols, order_cols, 1, rank_col="__lrw_rn"
    ).drop("__lrw_rn")


def top_k(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (render-complete-deploy.js:514-515 shape).  Spark plans
    this as TakeOrderedAndProject: per-partition heaps + driver merge — no
    full sort, no single-node shuffle even at 100 TB."""
    return df.orderBy(*order_cols).limit(k)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
    spray_cols: Sequence[str] | None = None,
    keep_salt: bool = False,
) -> DataFrame:
    """Skew-mitigating equi-join (SURVEY.md §4.2's salting fallback).

    AQE's skew-join rule only splits partitions inside sort-merge joins it
    can observe at runtime; when the skew sits under an operator AQE won't
    rewrite (or AQE is off), the classic fix is explicit: spray each fact
    row into one of ``salt`` sub-keys and replicate every dim row across
    all ``salt`` sub-keys, so a heavy-hitter key's rows land on ``salt``
    reducers instead of one.  Cost: dim side × ``salt`` (keep it the small
    side); result is identical to ``fact.join(dim, on, how)``.

    The spray uses ``xxhash64`` over ``spray_cols`` (default: all fact
    columns) — deterministic per row content; rows that are bytewise
    identical share a bucket, so pass a unique id column as ``spray_cols``
    when the fact table carries true duplicates.  Supported ``how``: inner
    / left (dim-preserving joins would need the mirrored construction).
    ``keep_salt=True`` retains the ``__salt`` column so tests/diagnostics
    can observe the operator's OWN spray distribution.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        # pmod(h, 0) is a DIVIDE_BY_ZERO under ANSI / silent NULLs without,
        # and sequence(0, -1) steps DOWN — fail loudly instead
        raise ValueError(f"salt must be >= 1, got {salt}")
    salt_col = "__salt"
    cols = [F.col(c) for c in (spray_cols or fact.columns)]
    f = fact.withColumn(salt_col, F.pmod(F.xxhash64(*cols), F.lit(salt)))
    d = dim.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = f.join(d, [on, salt_col], how)
    return joined if keep_salt else joined.drop(salt_col)
