"""Shared helpers for declared-query modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from r_e_hive__spark.catalog import load_table


def T(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load driver tables (normalized schema) and register them as temp views
    so the same query can be phrased via DataFrame API or spark.sql."""
    out = []
    for n in names:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out.append(df)
    return out


# Decimal-cast macros for hash-stable aggregation over the testdata's double
# columns (values are 2-dp money / rates; see SURVEY.md §2.12 rule 3).
# Spark and DuckDB agree bit-for-bit on double→decimal rounding, on exact
# decimal arithmetic, and on decimal→double conversion — verified in
# tests/test_oracle_parity.py.
D2 = "DECIMAL(12,2)"  # money-ish doubles (prices, values, quantities)
D32 = "DECIMAL(3,2)"  # rate-ish doubles in [0,1) with 2 dp (discount, tax)


def dec(col: str, t: str = D2) -> str:
    return f"CAST({col} AS {t})"


def round_dbl(expr: str, nd: int = 4) -> str:
    """Round + cast to double — the canonical terminal form for any
    aggregate the oracle hashes."""
    return f"CAST(ROUND({expr}, {nd}) AS DOUBLE)"
