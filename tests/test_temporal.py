"""Differential tests for the temporal joins (operators/temporal.py).

asof_join is checked against DuckDB's NATIVE ``ASOF JOIN`` (same semantics
family the operator implements: nearest at-or-before per key, left join);
range_join against the plain inequality-join SQL the binned plan must
reproduce exactly.  Both run over deterministic frames derived from the
driver's sf0.001 events table, plus plan-shape assertions: the asof plan is
ONE shuffle + window (no join operator at all), and the binned range join
is an equi-hash/SMJ join, never BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators.temporal import asof_join, range_join

SF = "/root/testdata/sf0.001"


def _frames(spark):
    """left = all events; right = a sparse per-user 'status' stream (every
    7th event of each user becomes a status change) with unique (user, ts)."""
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts", "value")
    w_rn = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("user_id").orderBy("ts", "event_id")
    )
    right = (
        ev.withColumn("rn", w_rn)
        .where(F.col("rn") % 7 == 1)
        .select(
            "user_id",
            F.col("ts").alias("status_ts"),
            (F.col("value") * 2).alias("status_value"),
        )
        .dropDuplicates(["user_id", "status_ts"])
    )
    left = ev.select("event_id", "user_id", F.col("ts").alias("ev_ts"))
    return left, right


def _pdf(df):
    return df.toPandas()


def test_asof_backward_matches_duckdb_native_asof(spark):
    left, right = _frames(spark)
    got = (
        asof_join(
            left, right, on="ev_ts", by=["user_id"], right_on="status_ts",
            right_prefix="m_",
        )
        .select("event_id", "user_id", "ev_ts", "m_status_ts", "m_status_value")
        .orderBy("event_id")
    )
    # DuckDB native ASOF JOIN oracle over identical frames.  Our operator
    # keys the right side on its own `on`-axis column (status_ts renamed to
    # the shared axis); mirror that in SQL.
    con = duckdb.connect()
    con.register("l", _pdf(left))
    con.register("r", _pdf(right))
    want = con.execute(
        """
        SELECT l.event_id, l.user_id, l.ev_ts,
               r.status_ts AS m_status_ts, r.status_value AS m_status_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ev_ts >= r.status_ts
        ORDER BY l.event_id
        """
    ).fetchdf()
    g = _pdf(got)
    assert len(g) == len(want) == _pdf(left).shape[0]
    pd.testing.assert_frame_equal(
        g.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_asof_forward_and_tolerance(spark):
    left, right = _frames(spark)
    fwd = asof_join(
        left, right, on="ev_ts", by=["user_id"], right_on="status_ts",
        direction="forward",
    )
    g = _pdf(fwd)
    # forward: matched ts is never before the event
    matched = g[g["r_status_ts"].notna()]
    assert (matched["r_status_ts"] >= matched["ev_ts"]).all()
    # python-side oracle on one user: the nearest at-or-after status
    uid = int(g["user_id"].iloc[0])
    r_ts = sorted(
        _pdf(right[right["user_id"] == uid])["status_ts"].tolist()
    )
    for _, row in g[g["user_id"] == uid].iterrows():
        after = [t for t in r_ts if t >= row["ev_ts"]]
        want = after[0] if after else None
        assert (row["r_status_ts"] == want) or (want is None and pd.isna(row["r_status_ts"]))
    # tolerance: zero-interval keeps only exact-ts matches
    tol = asof_join(
        left, right, on="ev_ts", by=["user_id"], right_on="status_ts",
        tolerance=F.expr("INTERVAL 0 SECOND"),
    )
    t = _pdf(tol)
    hit = t[t["r_status_ts"].notna()]
    assert (hit["r_status_ts"] == hit["ev_ts"]).all()
    # every left row whose (user, ts) exactly matches a status row hits —
    # computed from the frames, not assumed equal to the right-row count
    # (duplicate (user_id, ts) left rows would all match one status row)
    n_exact = left.join(
        right,
        (left["user_id"] == right["user_id"])
        & (left["ev_ts"] == right["status_ts"]),
        "left_semi",
    ).count()
    assert len(hit) == n_exact


def test_asof_plan_is_single_window_no_join(spark):
    left, right = _frames(spark)
    plan = asof_join(
        left, right, on="ev_ts", by=["user_id"], right_on="status_ts"
    )._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan, plan  # union-tag: no join operator at all
    assert plan.count("Window") >= 1


def test_range_join_matches_inequality_oracle(spark):
    left, right = _frames(spark)
    # intervals: [status_ts, status_ts + 2h) per user, inclusive bounds
    iv = right.select(
        "user_id",
        F.col("status_ts").alias("start_ts"),
        (F.col("status_ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        "status_value",
    )
    for bin_width in (600, 7200, 100_000):
        got = range_join(
            left, iv, point_col="ev_ts", start_col="start_ts",
            end_col="end_ts", by=["user_id"], bin_width=bin_width,
        )
        g = _pdf(got).sort_values(["event_id", "start_ts"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("l", _pdf(left))
        con.register("iv", _pdf(iv))
        want = con.execute(
            """
            SELECT l.event_id, l.user_id, l.ev_ts, iv.start_ts, iv.end_ts,
                   iv.status_value
            FROM l JOIN iv ON l.user_id = iv.user_id
             AND l.ev_ts BETWEEN iv.start_ts AND iv.end_ts
            ORDER BY l.event_id, iv.start_ts
            """
        ).fetchdf().reset_index(drop=True)
        assert len(g) == len(want), (bin_width, len(g), len(want))
        pd.testing.assert_frame_equal(
            g[want.columns.tolist()], want, check_dtype=False
        )


def test_range_join_left_keeps_unmatched_points(spark):
    left, right = _frames(spark)
    iv = right.select(
        "user_id",
        F.col("status_ts").alias("start_ts"),
        (F.col("status_ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        "status_value",
    )
    inner = range_join(
        left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"], bin_width=900
    )
    lj = range_join(
        left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"],
        bin_width=900, how="left",
    )
    n_left, n_inner = left.count(), inner.count()
    n_matched_points = inner.select("event_id").distinct().count()
    assert lj.count() == n_inner + (n_left - n_matched_points)
    assert lj.where(F.col("start_ts").isNull()).count() == n_left - n_matched_points


def test_range_join_plan_is_equi_join_not_bnlj(spark):
    left, right = _frames(spark)
    iv = right.select(
        "user_id", F.col("status_ts").alias("start_ts"),
        (F.col("status_ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    plan = range_join(
        left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"], bin_width=3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_asof_null_payload_not_torn(spark):
    """Round-4 review regression: a NULL payload field in the NEAREST right
    row must surface as NULL — not be spliced with the value from an older
    right row (per-column ignorenulls would tear the row)."""
    left = spark.createDataFrame([(1, 10), (1, 30)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, None)], "k long, t long, v double"
    )
    got = {
        (r["k"], r["t"]): (r["r_t"], r["r_v"])
        for r in asof_join(left, right, on="t", by=["k"]).collect()
    }
    assert got[(1, 10)] == (5, 100.0)
    assert got[(1, 30)] == (20, None)  # nearest row wins ATOMICALLY


def test_asof_keyless_distributed_default(spark):
    """Round-4 ADVICE: keyless as-of (by=()) must not degrade to a
    single-partition global window.  The default keyless path is the
    two-phase range-partitioned carry plan; its results must be identical
    to the forced single-window path (distributed=False) and to DuckDB's
    native keyless ASOF, in both directions."""
    left, right = _frames(spark)
    # keyless: align every event against the GLOBAL status stream; unique
    # axis via a deterministic per-ts reduction.
    r = right.groupBy("status_ts").agg(F.max("status_value").alias("status_value"))
    frames = {}
    for direction in ("backward", "forward"):
        dist = asof_join(
            left, r, on="ev_ts", right_on="status_ts", direction=direction
        )
        single = asof_join(
            left, r, on="ev_ts", right_on="status_ts", direction=direction,
            distributed=False,
        )
        # the distributed plan carries via spark_partition_id; the single
        # plan must not (it is the plain global window)
        d_plan = dist._jdf.queryExecution().executedPlan().toString()
        s_plan = single._jdf.queryExecution().executedPlan().toString()
        assert "_pid" in d_plan
        assert "_pid" not in s_plan
        cols = ["event_id", "user_id", "ev_ts", "r_status_ts", "r_status_value"]
        d = _pdf(dist.select(*cols).orderBy("event_id"))
        s = _pdf(single.select(*cols).orderBy("event_id"))
        pd.testing.assert_frame_equal(
            d.reset_index(drop=True), s.reset_index(drop=True), check_dtype=False
        )
        frames[direction] = d
    con = duckdb.connect()
    con.register("l", _pdf(left))
    con.register("r", _pdf(r))
    want = con.execute(
        """
        SELECT l.event_id, l.user_id, l.ev_ts,
               r.status_ts AS r_status_ts, r.status_value AS r_status_value
        FROM l ASOF LEFT JOIN r ON l.ev_ts >= r.status_ts
        ORDER BY l.event_id
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(
        frames["backward"].reset_index(drop=True),
        want.reset_index(drop=True),
        check_dtype=False,
    )


def test_asof_distributed_flag_rejected_with_keys(spark):
    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError, match="keyless"):
        asof_join(
            left, right, on="ev_ts", by=["user_id"], right_on="status_ts",
            distributed=True,
        )


def test_range_join_left_null_payload_and_duplicate_intervals(spark):
    """Round-4 review regressions: (a) a matching interval whose payload is
    all-NULL still counts as a match in left mode; (b) duplicate interval
    rows keep the same multiplicity in left mode as in inner."""
    pts = spark.createDataFrame([(1, 50), (2, 500)], "k long, x long")
    iv = spark.createDataFrame(
        [(1, 40, 60, None), (1, 40, 60, None), (2, 0, 10, "m")],
        "k long, lo long, hi long, label string",
    )
    inner = range_join(pts, iv, "x", "lo", "hi", by=["k"], bin_width=100)
    lj = range_join(pts, iv, "x", "lo", "hi", by=["k"], bin_width=100, how="left")
    # point 1 matches the duplicated NULL-label interval twice in BOTH modes
    assert inner.where(F.col("x") == 50).count() == 2
    assert lj.where((F.col("x") == 50) & F.col("lo").isNotNull()).count() == 2
    # point 2 matches nothing: one all-null row in left mode only
    assert inner.where(F.col("x") == 500).count() == 0
    unmatched = lj.where(F.col("x") == 500).collect()
    assert len(unmatched) == 1 and unmatched[0]["lo"] is None


def test_range_join_auto_bin_width(spark):
    """bin_width is a pure performance knob: opt-in 'auto' (median
    interval length with a max/10k long-tail floor) must return the
    identical rows as every explicit width, on empty-intervals input too
    (falls back to 1)."""
    left, right = _frames(spark)
    iv = right.select(
        "user_id",
        F.col("status_ts").alias("start_ts"),
        (F.col("status_ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        "status_value",
    )
    want = _pdf(
        range_join(
            left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"],
            bin_width=7200,
        )
    ).sort_values(["event_id", "start_ts"]).reset_index(drop=True)
    got = _pdf(
        range_join(
            left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"],
            bin_width="auto",
        )
    ).sort_values(["event_id", "start_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # empty intervals: auto falls back without crashing, result empty
    empty = range_join(
        left, iv.where(F.lit(False)), "ev_ts", "start_ts", "end_ts",
        by=["user_id"], bin_width="auto",
    )
    assert empty.count() == 0
    # long-tail cap: a 1-second median with one huge interval must not
    # explode the outlier into millions of bins — auto floors the width
    # at max_len/10k, identical rows either way
    tiny = spark.createDataFrame(
        [(i, 0, 10 * i, 10 * i + 1) for i in range(50)]
        + [(99, 0, 0, 40_000_000)],
        "iv_id INT, user_id INT, s LONG, e LONG",
    )
    pts = spark.createDataFrame(
        [(1, 0, 21), (2, 0, 39_999_999)], "event_id INT, user_id INT, t LONG"
    )
    out = range_join(pts, tiny, "t", "s", "e", by=["user_id"], bin_width="auto")
    rows = {(r["event_id"], r["iv_id"]) for r in out.collect()}
    assert rows == {(1, 2), (1, 99), (2, 99)}
    import pytest as _pt

    with _pt.raises(ValueError, match="bin_width"):
        range_join(
            left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"],
            bin_width=0,
        )
    # bool is an int subclass: True would silently mean bin_width=1 and
    # False would raise with a misleading message (round-6 ADVICE) —
    # both must be rejected up front
    for bad in (True, False):
        with _pt.raises(ValueError, match="bin_width"):
            range_join(
                left, iv, "ev_ts", "start_ts", "end_ts", by=["user_id"],
                bin_width=bad,
            )
