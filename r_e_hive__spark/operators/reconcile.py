"""Snapshot reconciliation: order-insensitive table checksums and keyed
diffs (SURVEY.md §2.11 X24).

The operational backbone of every large-scale migration/backfill: after
rewriting 100 TB (compaction, z-ordering, a COW delete, an engine
migration), prove the data survived — WITHOUT sorting or collecting
either side.  ``table_checksum`` reduces a table to one row of
multiset-sensitive aggregates whose equality certifies (up to 2⁻⁶⁴ hash
collisions) that two tables hold the same rows in any order and any
partitioning; ``table_diff`` pinpoints the differing keys when they don't.

Scale shape:

- ``table_checksum`` is ONE aggregation with map-side partials — each
  task reduces its partition to (count, xor, sum) and a single final
  task merges the per-partition rows.  No shuffle of data, no sort, no
  collect: the cheapest possible full-table certificate.
- ``table_diff`` shuffles both sides by key once (or zero times over
  bucketed tables — the `persist_bucketed` layout) and compares row
  fingerprints; output size ∝ the difference, not the tables.

Row fingerprinting pre-hashes EVERY column to a non-null 64-bit lane
before combining.  This matters: Spark's multi-argument ``xxhash64``
*skips* NULL inputs (the seed passes through), so ``(NULL, 'x')`` and
``('x', NULL)`` would otherwise collide — the pre-hash keeps each
column's contribution in its position (a NULL lane becomes the seed
constant 42, colliding with a real value only at 2⁻⁶⁴).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_fingerprint(cols: Sequence[str]) -> Column:
    """64-bit row fingerprint over ``cols`` (order-significant, NULL-safe,
    never NULL itself).  Column list must be explicit so both sides of a
    comparison agree on order — pass sorted(df.columns) if unsure."""
    if not cols:
        raise ValueError("row_fingerprint: need at least one column")
    lanes = [F.xxhash64(F.col(c)) for c in cols]
    return F.xxhash64(*lanes)


def md5_fingerprint(cols: Sequence[str]) -> Column:
    """Cross-ENGINE-replayable 60-bit row fingerprint: the first 15 hex
    chars of md5 over per-column md5 LANES — md5 is bit-identical
    Spark↔DuckDB (the X15 sampling anchor), so a
    checksum built on it can be verified by a DIFFERENT engine, which is
    the whole point of a migration certificate (the default xxhash64
    fingerprint is Spark-only and ~3× cheaper: use it when both sides are
    Spark).  Same per-LANE discipline as row_fingerprint: each column is
    md5-hashed separately (NULL lane = the literal 'N' — no md5 hex is
    one char, so lanes stay unambiguous) and the fixed-width lanes join
    before the outer md5.  Hashing lanes first removes the cross-column
    boundary collisions a raw separator-join has — a value containing
    the separator would shift content between columns and two different
    rows could encode identically (round-6 code review; web text
    contains every control char).  Caveat:
    fingerprints STRING RENDERINGS — cast floats to decimal first (double
    → string formatting differs across engines; exact types render
    identically).  The DuckDB twin is ``du_md5_fingerprint``."""
    if not cols:
        raise ValueError("md5_fingerprint: need at least one column")
    lanes = [
        F.coalesce(F.md5(F.col(c).cast("string")), F.lit("N")) for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", *lanes)), 1, 15), 16, 10
    ).cast("long")


def du_md5_fingerprint(cols: Sequence[str]) -> str:
    """DuckDB SQL twin of ``md5_fingerprint`` (same lanes/join/slice)."""
    if not cols:
        raise ValueError("du_md5_fingerprint: need at least one column")
    enc = ", ".join(
        f"coalesce(md5(CAST({c} AS VARCHAR)), 'N')" for c in cols
    )
    return (
        "CAST(concat('0x', substr(md5(concat_ws(':', "
        + enc
        + ")), 1, 15)) AS BIGINT)"
    )


def table_checksum(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    fingerprint: Column | None = None,
) -> DataFrame:
    """One-row multiset certificate: ``(n_rows, xor_fp, sum_fp)``.

    - ``xor_fp`` — bit-XOR of row fingerprints: order-insensitive, but
      blind to rows duplicated an even number of times;
    - ``sum_fp`` — exact sum of fingerprints in decimal(38,0):
      duplication-sensitive (headroom ≈ 10¹⁹ rows before overflow — far
      past any real table);
    - ``n_rows`` — count.

    Together they certify multiset equality up to hash collisions.  Equal
    checksums with different column ORDER still differ (fingerprints are
    position-significant); pass the same ``cols`` list on both sides.
    """
    use = list(cols) if cols is not None else list(df.columns)
    fp = fingerprint if fingerprint is not None else row_fingerprint(use)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.bit_xor(fp), F.lit(0)).alias("xor_fp"),
        F.coalesce(F.sum(fp.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")).alias(
            "sum_fp"
        ),
    )


def checksums_equal(a: DataFrame, b: DataFrame, cols: Sequence[str] | None = None) -> bool:
    """Convenience: one boolean, two single-row jobs."""
    ra = table_checksum(a, cols).collect()[0]
    rb = table_checksum(b, cols).collect()[0]
    return tuple(ra) == tuple(rb)


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    fingerprint: Column | None = None,
) -> DataFrame:
    """Keyed difference of two snapshots: one row per key whose presence
    or content differs — ``(key_cols..., diff)`` with ``diff`` in
    ``{'only_left', 'only_right', 'changed'}``.  Equal keys produce
    NOTHING: output ∝ the difference.

    Keys need NOT be unique: each side is reduced to a per-key multiset
    certificate (row count + xor/sum of row fingerprints — the
    ``table_checksum`` triple, per key) BEFORE the join, so duplicate
    keys compare as multisets instead of fanning out a many-to-many
    join (e.g. a fact table keyed by a non-unique order id diffs
    correctly; a naive row join would emit spurious 'changed' pairs).
    NULL keys match NULL keys (null-safe join).  ``compare_cols``
    defaults to all shared non-key columns — pass a subset to ignore
    volatile columns (e.g. an updated_at).

    One shuffle per side on the key (the groupBy; the join reuses its
    partitioning — zero extra exchanges, and zero total over bucketed
    layouts); join width is keys + three fixed-width aggregates
    regardless of row width or duplication.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("table_diff: need at least one key column")
    if compare_cols is None:
        shared = [c for c in a.columns if c in set(b.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    comp = list(compare_cols)

    def _cert(df: DataFrame) -> DataFrame:
        if fingerprint is not None:
            fp = fingerprint
        else:
            fp = row_fingerprint(comp) if comp else F.lit(0)
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("_n"),
            F.bit_xor(fp).alias("_xor"),
            F.sum(fp.cast("decimal(38,0)")).alias("_sum"),
        )

    la, lb = _cert(a).alias("l"), _cert(b).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else cond & c
    # presence markers: _n is never NULL for a grouped key, so a NULL _n
    # after the outer join means the side had no such key
    j = la.join(lb, cond, "full_outer")
    status = (
        F.when(F.col("r._n").isNull(), F.lit("only_left"))
        .when(F.col("l._n").isNull(), F.lit("only_right"))
        .when(
            (F.col("l._n") != F.col("r._n"))
            | (F.col("l._xor") != F.col("r._xor"))
            | (F.col("l._sum") != F.col("r._sum")),
            F.lit("changed"),
        )
    )
    out_keys = [
        F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k) for k in keys
    ]
    return (
        j.select(*out_keys, status.alias("diff"))
        .where(F.col("diff").isNotNull())
    )
