"""SparkSession factory with scale-oriented defaults.

Tuned for correctness-critical determinism (UTC session timezone, exact
decimal arithmetic) and for large-scale execution (AQE on, skew-join
handling, partition coalescing).  On the test rig this runs ``local[N]``;
on a real cluster the same configs apply — nothing here assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of local cores the driver harness gives us (local[32] by default).
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "r_e_hive__spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config.

    Determinism rules (SURVEY.md §2.12) require UTC timestamps and exact
    decimal math; scale rules (SURVEY.md §4.2) want AQE with skew-join and
    partition coalescing enabled so the same plan survives a 100× scale-up.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{DEFAULT_CPUS}]")

    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    conf = {
        # -- determinism ---------------------------------------------------
        "spark.sql.session.timeZone": "UTC",
        # exact decimal semantics: fail loudly instead of silently widening
        # to double (the reference did float money math; we deliberately fix
        # that — SURVEY.md §1.3).
        "spark.sql.decimalOperations.allowPrecisionLoss": "false",
        # pin ANSI semantics (Spark 4 default) explicitly: error-vs-NULL for
        # div-by-zero/overflow/casts must not drift across Spark versions
        "spark.sql.ansi.enabled": "true",
        # -- scale / performance ------------------------------------------
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Arrow for every pandas_udf / applyInPandas / toPandas crossing.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Parquet vectorized reader + pushdown are on by default; pin them so
        # a misconfigured environment can't silently disable the fast path.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.enableVectorizedReader": "true",
        # The driver testdata stores TIMESTAMP(NANOS) which Spark has no
        # native type for; read as long and convert in catalog.load_table.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # local[N] hosts every executor thread inside the driver JVM: the
        # 1g default heap OOMs as soon as the cached tables + shuffle
        # buffers of an sf1+ run exceed it.  Only honored at JVM creation
        # (harmless no-op when attaching to a live session).
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        # local runs: keep the UI off and the JVM quiet
        "spark.ui.enabled": "false",
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/r_e_hive_warehouse"
        ),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
