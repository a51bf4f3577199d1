"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()`` exposes every declared query from the operator inventory
(SURVEY.md §2) as (spark, sf_dir) -> DataFrame; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each SQL-expressible query (rows-only entries —
fixture pipelines, xxhash64-based sketches, binaryFile ingest — omit it).

Implementation lives in the ``r_e_hive__spark`` package; this module only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from r_e_hive__spark.queries import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = load_all()
    return reg["q1_pricing_summary"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per SQL-expressible query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
