"""Differential harness: run a declared query on Spark AND DuckDB, compare.

Mirrors the driver's correctness gate (row-count + schema-width +
order-insensitive value comparison with columns sorted by name) so failures
surface locally before the driver runs at sf0.01.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from r_e_hive__spark.schemas import TESTDATA_SCHEMAS


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_SCHEMAS:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


@dataclass
class DiffResult:
    name: str
    ok: bool
    detail: str
    n_spark: int
    n_oracle: int


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exactness is the contract
    return str(a) == str(b)


def compare_frames(name: str, sp: pd.DataFrame, du: pd.DataFrame) -> DiffResult:
    if sorted(sp.columns) != sorted(du.columns):
        return DiffResult(
            name, False,
            f"column mismatch: spark={sorted(sp.columns)} oracle={sorted(du.columns)}",
            len(sp), len(du),
        )
    if len(sp) != len(du):
        return DiffResult(
            name, False, f"row count {len(sp)} vs {len(du)}", len(sp), len(du)
        )
    a, b = _canon(sp), _canon(du)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _values_equal(x, y):
                return DiffResult(
                    name, False,
                    f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}",
                    len(sp), len(du),
                )
    return DiffResult(name, True, "ok", len(sp), len(du))


def run_diff(spark, con, query, sf_dir: str) -> DiffResult:
    sp = query.spark_fn(spark, sf_dir).toPandas()
    if query.oracle is None:
        ok = True  # rows-only check: it ran and produced a stable frame
        return DiffResult(query.name, ok, f"rows-only ({len(sp)} rows)", len(sp), -1)
    du = con.execute(query.oracle).fetchdf()
    return compare_frames(query.name, sp, du)
