"""Batch-equivalence tests for the streaming surface (SURVEY.md §2.9).

Each streaming job (readStream over the events parquet, availableNow
trigger) must produce exactly the rows of its batch twin in
queries/streaming_batch.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.queries import load_all
from r_e_hive__spark.streaming import jobs
from tests.conftest import SF_SMOKE

EVENTS_PATH = f"{SF_SMOKE}/events.parquet"


def _stream(spark):
    return jobs.read_event_stream(spark, EVENTS_PATH, max_files_per_trigger=1)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_equivalence(spark):
    got = jobs.run_stream_to_memory(
        jobs.tumbling_counts(_stream(spark)), "t_tumbling", "complete"
    )
    want = (
        load_all()["st2_windows"]
        .spark_fn(spark, SF_SMOKE)
        .where("kind = 'tumbling'")
        .withColumnRenamed("window_start", "bucket_start")
    )
    cols = ["bucket_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_equivalence(spark):
    got = jobs.run_stream_to_memory(
        jobs.session_aggregate(_stream(spark)), "t_session", "complete"
    )
    want = load_all()["st3_session_window"].spark_fn(spark, SF_SMOKE)
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_counts(spark):
    got = jobs.run_stream_to_memory(
        jobs.stream_dedup(_stream(spark)), "t_dedup", "append"
    )
    want = load_all()["st5_stream_dedup"].spark_fn(spark, SF_SMOKE)
    # dropDuplicates keeps an arbitrary survivor; the keyset must match the
    # deterministic batch formulation exactly
    assert _rows(got, ["user_id", "event_type"]) == _rows(
        want, ["user_id", "event_type"]
    )


def test_stateful_balance_equivalence(spark):
    got = jobs.run_stream_to_memory(
        jobs.running_balance_stateful(_stream(spark)), "t_balance", "update"
    )
    # final balance per user == last balance_after of the batch running state
    batch = load_all()["st6_running_state"].spark_fn(spark, SF_SMOKE)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    final_batch = (
        batch.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("balance_after").alias("balance"))
    )
    # memory sink in update mode may hold multiple snapshots per key: take last
    got_final = (
        got.groupBy("user_id").agg(F.last("balance").alias("balance"))
    )
    g = {r["user_id"]: round(r["balance"], 2) for r in got_final.collect()}
    w_ = {r["user_id"]: round(r["balance"], 2) for r in final_batch.collect()}
    assert g == w_
