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


def _pin_mtime(pq_dir, order):
    """FileStreamSource orders files by modification time; parquet dirs
    written back-to-back can collide at mtime granularity, reordering the
    intended micro-batches.  Pin strictly increasing mtimes per batch."""
    import os

    base = 1_700_000_000 + order * 100
    for root, _dirs, files in os.walk(pq_dir):
        for f in files:
            os.utime(os.path.join(root, f), (base, base))


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
    from r_e_hive__spark.queries import RETIRED

    load_all()  # populates RETIRED (st3 rotated out in round 9)
    want = RETIRED["st3_session_window"].spark_fn(spark, SF_SMOKE)
    cols = ["user_id", "session_start", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_dedup_counts(spark):
    got = jobs.run_stream_to_memory(
        jobs.stream_dedup(_stream(spark)), "t_dedup", "append"
    )
    from r_e_hive__spark.queries import RETIRED

    load_all()  # populates RETIRED (st5 rotated out in round 9)
    want = RETIRED["st5_stream_dedup"].spark_fn(spark, SF_SMOKE)
    # dropDuplicates keeps an arbitrary survivor; the keyset must match the
    # deterministic batch formulation exactly
    assert _rows(got, ["user_id", "event_type"]) == _rows(
        want, ["user_id", "event_type"]
    )


def test_stateful_balance_multibatch_with_late_drop(spark, tmp_path):
    """VERDICT r3 item 5: drive the applyInPandasWithState twin across ≥3
    REAL file-source micro-batches (maxFilesPerTrigger=1): state must carry
    across batches, a row arriving behind the watermark between batches
    must be dropped, and the final state must equal the batch query over
    the surviving rows."""
    import os
    from datetime import datetime

    src = tmp_path / "events"
    os.makedirs(src)

    def write_batch(fname, rows, order):
        df = spark.createDataFrame(
            [
                (i, datetime(2024, 1, 1, h, m), uid, et, v, None)
                for i, (h, m, uid, et, v) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / fname))
        _pin_mtime(src / fname, order)

    # batch 1: user 1 buys 1.00 + 2.00           -> balance 3.00
    write_batch("b1.parquet", [(10, 0, 1, "purchase", 1.0), (10, 5, 1, "purchase", 2.0)], 1)
    # batch 2: user 1 buys 4.00, user 2 appears  -> balances 7.00 / 5.00
    write_batch("b2.parquet", [(11, 0, 1, "purchase", 4.0), (11, 5, 2, "purchase", 5.0)], 2)
    # batch 3: a LATE user-1 row at 09:00 (watermark after batch 2 is
    # 11:05 - 30min = 10:35 -> dropped) + an on-time 8.00 purchase
    write_batch("b3.parquet", [(9, 0, 1, "purchase", 100.0), (11, 30, 1, "purchase", 8.0)], 3)

    # one parquet dir per micro-batch: glob the part files via subdirs
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    got = jobs.run_stream_to_memory(
        jobs.running_balance_stateful(stream, watermark="30 minutes"),
        "t_balance_multi",
        "update",
    )
    snaps = got.orderBy("user_id", "n_events").collect()
    by_user: dict[int, list] = {}
    for r in snaps:
        by_user.setdefault(r["user_id"], []).append(r)

    # state carried across ≥3 micro-batches for user 1, one snapshot each
    u1 = [round(r["balance"], 2) for r in by_user[1]]
    assert len(u1) == 3, snaps
    assert sorted(u1) == [3.0, 7.0, 15.0], snaps  # late 100.00 NOT applied
    assert [round(r["balance"], 2) for r in by_user[2]] == [5.0]
    # per-batch event counts prove the batch boundaries were real (and the
    # late row was dropped before reaching the state function: batch 3
    # delivered exactly 1 event to user 1)
    assert sorted(r["n_events"] for r in by_user[1]) == [1, 1, 2]


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


def test_stream_merge_to_snapshot_upsert(spark, tmp_path):
    """foreachBatch upsert sink: after N micro-batches the parquet snapshot
    equals the batch latest-record-wins over all events — the streaming
    replacement for the reference's UPDATE-in-place balance writes."""
    import os
    from datetime import datetime

    from r_e_hive__spark.operators.relational import latest_record_wins

    src = tmp_path / "ev"
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(fname, rows):
        spark.createDataFrame(
            [(i, datetime(2024, 1, 1, h, m), uid, et, v, None)
             for i, (h, m, uid, et, v) in enumerate(rows)],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / fname))

    write_file("b1.parquet", [(10, 0, 1, "purchase", 1.0), (10, 5, 2, "purchase", 9.0)])
    _pin_mtime(src / "b1.parquet", 1)
    write_file("b2.parquet", [(11, 0, 1, "purchase", 4.0)])
    _pin_mtime(src / "b2.parquet", 2)
    write_file("b3.parquet", [(12, 0, 2, "error", 2.0), (12, 5, 3, "purchase", 7.0)])
    _pin_mtime(src / "b3.parquet", 3)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    snap_path = str(tmp_path / "snapshot")
    q = jobs.stream_merge_to_snapshot(
        stream,
        snap_path,
        key_cols=["user_id"],
        order_cols=[F.desc("ts"), F.desc("event_id")],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = _rows(spark.read.parquet(snap_path), ["user_id", "ts", "value"])
    want_df = latest_record_wins(
        spark.read.parquet(str(src) + "/*.parquet"),
        ["user_id"],
        [F.desc("ts"), F.desc("event_id")],
    )
    assert got == _rows(want_df, ["user_id", "ts", "value"])
    assert len(got) == 3  # one current-state row per user
def test_windowed_agg_multibatch_append_watermark(spark, tmp_path):
    """ST4 across REAL micro-batches in APPEND mode: a 10-minute window is
    emitted only once the watermark (max event time - 30min) passes its
    end, and a row arriving behind the watermark never lands in an
    already-finalized window."""
    import os
    from datetime import datetime

    src = tmp_path / "ev4"
    os.makedirs(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

    def write_file(fname, rows):
        spark.createDataFrame(
            [(i, datetime(2024, 1, 1, h, m), uid, et, v, None)
             for i, (h, m, uid, et, v) in enumerate(rows)],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / fname))

    # batch 1: two events in the 10:00 window
    write_file("b1.parquet", [(10, 1, 1, "purchase", 1.0), (10, 8, 1, "purchase", 2.0)])
    _pin_mtime(src / "b1.parquet", 1)
    # batch 2: 11:00 -> commits watermark 10:30 (passes the 10:00 window)
    write_file("b2.parquet", [(11, 0, 1, "purchase", 4.0)])
    _pin_mtime(src / "b2.parquet", 2)
    # batch 3: 12:00 -> the 10:00 window is finalized and emitted here;
    # commits watermark 11:30
    write_file("b3.parquet", [(12, 0, 1, "purchase", 8.0)])
    _pin_mtime(src / "b3.parquet", 3)
    # batch 4: LATE row at 10:05 — the watermark in effect (>= 10:30; the
    # late-event filter applies the PREVIOUS batch's committed watermark,
    # one batch behind the newest data) is far past its [10:00,10:10)
    # window, so it must neither reopen nor re-emit the finalized window
    write_file("b4.parquet", [(10, 5, 1, "purchase", 100.0), (13, 0, 1, "purchase", 16.0)])
    _pin_mtime(src / "b4.parquet", 4)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    got = jobs.run_stream_to_memory(
        jobs.tumbling_counts(stream, watermark="30 minutes"), "t_append_wm", "append"
    )
    rows = {r["bucket_start"]: r for r in got.collect()}
    ten = rows[datetime(2024, 1, 1, 10, 0)]
    # the finalized 10:00 window holds ONLY the two on-time events — the
    # late 100.00 was dropped, not merged and not re-emitted
    assert (ten["n_events"], round(ten["sum_value"], 2)) == (2, 3.0)
    # 11:00 window emitted once the watermark passed 11:10
    assert rows[datetime(2024, 1, 1, 11, 0)]["n_events"] == 1
    # 13:00's window is still open at end-of-stream: not emitted in append
    assert datetime(2024, 1, 1, 13, 0) not in rows


def test_read_event_stream_starts_on_empty_dir(spark, tmp_path):
    """ADVICE r3: a stream may start against an existing-but-empty source
    directory (files arrive later) — the schema probe must fall back
    instead of raising AnalysisException."""
    import os

    d = tmp_path / "empty_src"
    os.makedirs(d)
    stream = jobs.read_event_stream(spark, str(d))
    assert stream.isStreaming
    got = jobs.run_stream_to_memory(
        jobs.tumbling_counts(stream), "t_empty_start", "append"
    )
    assert got.count() == 0


def test_stream_merge_to_snapshot_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch must re-derive the
    SAME snapshot.  Simulated the strong way — after the first run
    completes, every batch is replayed from scratch (fresh checkpoint over
    the same source, snapshot left in place); the snapshot must not change."""
    import os
    from datetime import datetime

    src = tmp_path / "ev"
    os.makedirs(src)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    rows = [
        (0, datetime(2024, 1, 1, 10, 0), 1, "purchase", 1.0, None),
        (1, datetime(2024, 1, 1, 11, 0), 1, "purchase", 4.0, None),
        (2, datetime(2024, 1, 1, 12, 0), 2, "error", 2.0, None),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1.parquet")
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        q = jobs.stream_merge_to_snapshot(
            stream,
            str(tmp_path / "snapshot"),
            key_cols=["user_id"],
            order_cols=[F.desc("ts"), F.desc("event_id")],
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination()
        return _rows(
            spark.read.parquet(str(tmp_path / "snapshot")),
            ["user_id", "ts", "value"],
        )

    first = run("ckpt1")
    replayed = run("ckpt2")  # fresh checkpoint: all batches replayed
    assert replayed == first
    assert len(first) == 2


def test_stream_continuous_aggregate_equals_batch_rollup(spark, tmp_path):
    """Hypertable continuous aggregate across REAL micro-batches: after the
    stream drains, the maintained rollup table equals the one-shot batch
    rollup of all events, and a coarser level derived from it matches too."""
    import os

    from r_e_hive__spark.operators.rollup import (
        aggregate_finest,
        rollup_from_partials,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = tmp_path / "ev"
    os.makedirs(src)
    for k in range(3):  # three files -> three micro-batches
        ev.where(F.col("event_id") % 3 == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{k}.parquet"))
        _pin_mtime(src / f"b{k}.parquet", k + 1)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    roll_path = str(tmp_path / "rollup")
    q = jobs.stream_continuous_aggregate(
        stream, roll_path, "ts", "value", ["event_type"], "10 minutes",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    def rows(df):
        return sorted(
            (r["bucket"], r["event_type"], round(r["sum_value"], 6), r["n_rows"],
             r["min_value"], r["max_value"])
            for r in df.collect()
        )

    maintained = spark.read.parquet(roll_path)
    want = aggregate_finest(ev, "ts", "value", ["event_type"], "10 minutes")
    assert rows(maintained) == rows(want)
    assert rows(rollup_from_partials(maintained, ["event_type"], "1 hour")) == rows(
        aggregate_finest(ev, "ts", "value", ["event_type"], "1 hour")
    )


def test_stream_static_enrichment_join(spark):
    """Stream-static join (the notification fan-out shape: each event
    enriched with its user's dimension row).  The static side is re-read
    per micro-batch by Spark; result must equal the batch join."""
    ev_stream = _stream(spark)
    users = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey")
    )
    enriched = ev_stream.join(users, "user_id", "left").select(
        "event_id", "user_id", "c_name", "c_nationkey"
    )
    got = jobs.run_stream_to_memory(enriched, "enriched_events")
    ev = load_table(spark, SF_SMOKE, "events")
    want = ev.join(users, "user_id", "left").select(
        "event_id", "user_id", "c_name", "c_nationkey"
    )
    cols = ["event_id", "user_id", "c_name", "c_nationkey"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stream_watermarked_join(spark, tmp_path):
    """Watermarked stream-stream inner join: purchases correlated to the
    same user's errors within 1 hour AFTER the purchase.  Both sides carry
    watermarks + a time-range condition, so state is bounded (Spark evicts
    rows older than watermark - range).  Result equals the batch
    formulation of the same predicate."""
    import os

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "ev"
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src / "all.parquet"))

    def side(filter_type, alias_prefix):
        s = (
            spark.readStream.schema(ev.schema)
            .parquet(str(src) + "/*.parquet")
            .where(F.col("event_type") == filter_type)
        )
        return s.select(
            *[F.col(c).alias(f"{alias_prefix}_{c}") for c in ev.columns]
        ).withWatermark(f"{alias_prefix}_ts", "2 hours")

    purchases, errors = side("purchase", "p"), side("error", "e")
    joined = purchases.join(
        errors,
        F.expr(
            "p_user_id = e_user_id AND "
            "e_ts >= p_ts AND e_ts <= p_ts + INTERVAL 1 HOUR"
        ),
    ).select("p_event_id", "e_event_id", "p_user_id")
    got = jobs.run_stream_to_memory(joined, "pe_pairs")

    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"), F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_event_id"), F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
    )
    want = p.join(
        e,
        (p["p_user_id"] == e["e_user_id"])
        & (e["e_ts"] >= p["p_ts"])
        & (e["e_ts"] <= p["p_ts"] + F.expr("INTERVAL 1 HOUR")),
    ).select("p_event_id", "e_event_id", "p_user_id")
    cols = ["p_event_id", "e_event_id", "p_user_id"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_continuous_aggregate_fence_and_partitioned_layout(spark, tmp_path):
    """Round-4 review: (a) the rollup table is day-partitioned so merges
    prune to touched days; (b) the batch-id fence skips replayed batches
    (a pre-seeded fence above every batch id ⇒ nothing is ever applied)."""
    import json
    import os

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "event_type", "value"
    )
    src = tmp_path / "ev"
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src / "b0.parquet"))

    def start(ckpt, roll):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*.parquet")
        )
        q = jobs.stream_continuous_aggregate(
            stream, str(tmp_path / roll), "ts", "value", ["event_type"],
            "10 minutes", checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination()

    # normal run: hive day-partition layout on disk
    start("ckpt_a", "roll_a")
    dirs = os.listdir(str(tmp_path / "roll_a"))
    assert any(d.startswith("bucket_day=") for d in dirs), dirs

    # round-4 ADVICE: the fence is written atomically (tmp + rename), so
    # after any run the fence is valid JSON and no .tmp residue remains
    fence = str(tmp_path / "ckpt_a" / "rollup_fence.json")
    with open(fence) as fh:
        assert isinstance(json.load(fh)["batch_id"], int)
    assert not os.path.exists(fence + ".tmp")

    # fenced run: pre-seed the fence above any batch id -> every batch is
    # treated as a replay and skipped; the rollup is never created
    os.makedirs(str(tmp_path / "ckpt_b"), exist_ok=True)
    with open(str(tmp_path / "ckpt_b" / "rollup_fence.json"), "w") as fh:
        json.dump({"batch_id": 10_000}, fh)
    start("ckpt_b", "roll_b")
    assert not os.path.exists(str(tmp_path / "roll_b"))


def test_tws_twin_matches_applyinpandas_twin(spark):
    """running_balance_tws (transformWithStateInPandas, the modern
    arbitrary-stateful API) must emit snapshot-identical results to
    running_balance_stateful (applyInPandasWithState) over the same
    multi-micro-batch stream — same keys, same per-batch event counts,
    same balances.

    transformWithState's driver<->worker state protocol is protobuf-based
    (pyspark.sql.streaming.proto); without any protobuf runtime the query
    cannot start, so the twin is skip-gated — but the gate now tries the
    pbshim first (round-7: the OS-vendored pure-Python runtime +
    version-gate relaxation, streaming/pbshim.py), so in this container
    the twin actually EXECUTES.  The applyInPandasWithState path (the
    default everywhere in this engine) never depends on any of this."""
    from r_e_hive__spark.streaming.pbshim import enable_protobuf_shim

    if not enable_protobuf_shim():
        pytest.skip("no protobuf runtime (wheel or vendored) available")
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        got_new = jobs.run_stream_to_memory(
            jobs.running_balance_tws(_stream(spark)), "t_balance_tws", "update"
        )
        rows_new = _rows(got_new, ["user_id", "n_events", "balance"])
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)
    got_old = jobs.run_stream_to_memory(
        jobs.running_balance_stateful(_stream(spark)), "t_balance_old", "update"
    )
    rows_old = _rows(got_old, ["user_id", "n_events", "balance"])
    assert rows_new == rows_old and len(rows_new) > 0


def test_stream_incremental_neardup_matches_batch_loop(spark, tmp_path):
    """X22's streaming twin: 3 real file-source micro-batches through
    stream_incremental_neardup must produce exactly the survivors and
    signature index a hand-driven incremental_neardup loop over the same
    batches produces — and a replayed batch_id must be fenced out."""
    import json
    import os

    from r_e_hive__spark.operators import dedup as D

    DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
    DOC_A2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    DOC_B = "completely different content about spark shuffle partitioning at scale"
    DOC_C = "yet another unrelated document concerning duckdb oracle differentials"

    batches = [
        [(1, DOC_A), (2, DOC_B)],
        [(11, DOC_A2), (12, DOC_C), (13, DOC_C)],  # 11~1 hist, 13~12 batch
        [(21, DOC_C)],                              # ~12 in history
    ]
    src = tmp_path / "docs"
    os.makedirs(src)
    for i, rows in enumerate(batches, 1):
        df = spark.createDataFrame(rows, "id INT, text STRING")
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}.parquet"))
        _pin_mtime(src / f"b{i}.parquet", i)

    idx_path = str(tmp_path / "sig_index")
    surv_path = str(tmp_path / "survivors")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("id INT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet")
    )
    q = jobs.stream_incremental_neardup(
        stream, "text", "id", idx_path, surv_path, ckpt
    )
    q.awaitTermination()

    got_surv = {r["id"] for r in spark.read.parquet(surv_path).collect()}
    got_idx = {
        r["id"] for r in spark.read.parquet(idx_path).select("id").distinct().collect()
    }

    # hand-driven batch loop, same parameters
    want_idx_df = None
    want = set()
    for rows in batches:
        df = spark.createDataFrame(rows, "id INT, text STRING")
        s, want_idx_df = D.incremental_neardup(
            df, "text", "id", index_sig=want_idx_df
        )
        want |= {r["id"] for r in s.collect()}
    assert got_surv == want == {1, 2, 12}
    assert got_idx == want
    # the persisted index is the banded layout the operator consumes
    cols = set(spark.read.parquet(idx_path).columns)
    assert {"id", "signature", "band_id", "band_hash"} <= cols

    # fence: re-applying an already-applied batch_id is a no-op
    fence = json.load(open(os.path.join(ckpt, "neardup_fence.json")))
    assert fence["batch_id"] == 2  # batches 0,1,2
    before = spark.read.parquet(surv_path).count()
    # fresh query restart over the SAME checkpoint: availableNow with no
    # new files fires nothing and the fence stays intact
    q2 = jobs.stream_incremental_neardup(
        spark.readStream.schema("id INT, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*.parquet"),
        "text",
        "id",
        idx_path,
        surv_path,
        ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(surv_path).count() == before


def test_st7_composed_join_matches_declared_batch(spark, tmp_path):
    """The st7_stream_joins driver pin's streaming twin (round 9): the
    SAME composed pipeline — watermarked stream-stream time-range inner
    join, then the per-micro-batch stream-static dim enrichment — run as
    an actual readStream job must produce exactly the declared batch
    query's rows."""
    import os

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = tmp_path / "ev"
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src / "all.parquet"))

    def side(filter_type, a):
        s = (
            spark.readStream.schema(ev.schema)
            .parquet(str(src) + "/*.parquet")
            .where(F.col("event_type") == filter_type)
        )
        return s.select(
            *[F.col(c).alias(f"{a}_{c}") for c in ev.columns]
        ).withWatermark(f"{a}_ts", "2 hours")

    purchases, errors = side("purchase", "p"), side("error", "e")
    dim = load_table(spark, SF_SMOKE, "customer").select(
        F.col("c_custkey").alias("p_user_id"), "c_name"
    )
    joined = (
        purchases.join(
            errors,
            F.expr(
                "p_user_id = e_user_id AND "
                "e_ts >= p_ts AND e_ts <= p_ts + INTERVAL 1 HOUR"
            ),
        )
        .join(dim, "p_user_id", "left")
        .select(
            "p_event_id",
            "e_event_id",
            F.col("p_user_id").alias("user_id"),
            "c_name",
            (F.unix_micros("e_ts") - F.unix_micros("p_ts")).alias("lag_micros"),
        )
    )
    got = jobs.run_stream_to_memory(joined, "st7_pairs")
    want = load_all()["st7_stream_joins"].spark_fn(spark, SF_SMOKE)
    cols = ["p_event_id", "e_event_id", "user_id", "c_name", "lag_micros"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0
