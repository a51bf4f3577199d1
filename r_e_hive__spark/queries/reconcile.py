"""Declared queries: snapshot reconciliation (SURVEY.md §2.11 X24).

The migration/backfill certificate path (operators/reconcile.py) under the
CROSS-ENGINE md5 fingerprint: the checksums Spark computes are verified by
DuckDB running the twin SQL over the same parquet — exactly the story a
100 TB engine migration needs, where the verifying engine is by definition
not the one that wrote the data.  Declared round 7 (VERDICT r6 item 1);
the same differential has run in tests/test_reconcile.py since round 6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators.reconcile import (
    du_md5_fingerprint,
    md5_fingerprint,
    table_checksum,
)
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T

# Fingerprinted columns: exact types only.  The double `value` column
# enters as DECIMAL(12,2) — md5 hashes STRING RENDERINGS and double→string
# formatting differs across engines, while exact decimals render
# identically (operators/reconcile.py:md5_fingerprint caveat).
_CK_COLS = ["event_id", "event_type", "v"]
_DU_FP = du_md5_fingerprint(_CK_COLS)

_CK_ORACLE = f"""
    WITH ev AS (
      SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS v
      FROM events
    ), per AS (
      SELECT event_type AS scope,
             COUNT(*) AS n_rows,
             bit_xor({_DU_FP}) AS xor_fp,
             CAST(CAST(SUM(CAST({_DU_FP} AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS sum_fp
      FROM ev GROUP BY event_type
    ), tot AS (
      -- COALESCE mirrors table_checksum's empty-table certificate
      -- (0, 0, '0'): without it a zero-row table yields NULL aggregates
      -- here while the Spark side coalesces (round-7 code review; the
      -- per-type branch needs none — a group always has >= 1 row)
      SELECT '__ALL__' AS scope,
             COUNT(*) AS n_rows,
             COALESCE(bit_xor({_DU_FP}), 0) AS xor_fp,
             CAST(COALESCE(CAST(SUM(CAST({_DU_FP} AS DECIMAL(38,0))) AS DECIMAL(38,0)), 0) AS VARCHAR) AS sum_fp
      FROM ev
    )
    SELECT scope, n_rows, xor_fp, sum_fp FROM per
    UNION ALL
    SELECT scope, n_rows, xor_fp, sum_fp FROM tot
    ORDER BY scope
"""


@query(
    "x24_table_checksum",
    _CK_ORACLE,
    survey_rows=("X24",),
)
def x24_table_checksum(spark, sf_dir):
    """Order-insensitive multiset certificates over the events table —
    one per event_type plus the whole-table row ('__ALL__') — built on
    the cross-engine md5 row fingerprint.  Each certificate is the
    (n_rows, xor_fp, sum_fp) triple of operators/reconcile.py:
    table_checksum: xor catches any odd-multiplicity difference, the
    exact decimal sum catches even-multiplicity duplication, count pins
    cardinality.  Scale shape: ONE aggregation with map-side partials —
    no sort, no shuffle of data, no collect; the grouped form is the
    same aggregate keyed by event_type.  The oracle recomputes the
    fingerprints from scratch in DuckDB (du_md5_fingerprint — md5 is
    bit-identical across engines; per-column LANES, so values containing
    any separator cannot shift across column boundaries)."""
    (events,) = T(spark, sf_dir, "events")
    ev = events.select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    fp = md5_fingerprint(_CK_COLS)
    per_type = ev.groupBy(F.col("event_type").alias("scope")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(fp).alias("xor_fp"),
        F.sum(fp.cast("decimal(38,0)")).alias("sum_fp"),
    )
    total = table_checksum(ev, _CK_COLS, fingerprint=fp).select(
        F.lit("__ALL__").alias("scope"), "n_rows", "xor_fp", "sum_fp"
    )
    # sum_fp ships as STRING: pandas has no int128, so a DECIMAL(38,0)
    # coming out of DuckDB's fetchdf degrades to float64 and the digits
    # past 2^53 vanish — the exact certificate rides in its decimal
    # rendering instead (both engines print the same digits).
    return (
        per_type.unionByName(total)
        .withColumn("sum_fp", F.col("sum_fp").cast("string"))
        .orderBy("scope")
    )
