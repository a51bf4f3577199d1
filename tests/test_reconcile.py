"""Snapshot reconciliation (X24): checksum multiset-certificate properties
and a randomized keyed-diff differential vs a Python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators import reconcile as X
from tests.conftest import SF_SMOKE


def _cs(df, cols=None):
    return tuple(X.table_checksum(df, cols).collect()[0])


def test_checksum_invariant_under_order_and_partitioning(spark):
    df = spark.createDataFrame(
        [(i, f"v{i % 7}", float(i) / 3.0) for i in range(500)],
        "id INT, s STRING, x DOUBLE",
    )
    base = _cs(df)
    assert _cs(df.repartition(13)) == base
    assert _cs(df.orderBy(F.desc("s"), "id")) == base
    assert _cs(df.repartition(1)) == base


def test_checksum_detects_single_cell_mutation(spark):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "id INT, s STRING"
    )
    mut = df.withColumn(
        "s", F.when(F.col("id") == 42, F.lit("V42")).otherwise(F.col("s"))
    )
    assert _cs(mut) != _cs(df)


def test_checksum_sum_catches_even_duplication(spark):
    """A row duplicated twice is invisible to XOR — the sum/count lanes
    are why the certificate is a triple."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    dup = df.unionAll(
        spark.createDataFrame([(1, "a"), (1, "a")], "id INT, s STRING")
    )
    a, b = _cs(df), _cs(dup)
    assert a[1] == b[1]  # xor blind to the even dup
    assert a != b        # count+sum are not


def test_checksum_null_semantics(spark):
    # NULL is not the string 'NULL', and NULL position matters
    a = spark.createDataFrame([(None, "x")], "a STRING, b STRING")
    b = spark.createDataFrame([("x", None)], "a STRING, b STRING")
    c = spark.createDataFrame([("NULL", "x")], "a STRING, b STRING")
    assert _cs(a) != _cs(b)
    assert _cs(a) != _cs(c)
    # empty table: stable zero certificate
    assert _cs(a.where(F.lit(False))) == (0, 0, 0)


def test_checksum_column_subset_and_order(spark):
    df = spark.createDataFrame([(1, "a", 9), (2, "b", 8)], "id INT, s STRING, n INT")
    assert _cs(df, ["id", "s"]) == _cs(df.drop("n"), ["id", "s"])
    assert _cs(df, ["id", "s"]) != _cs(df, ["s", "id"])  # position-significant


def test_checksums_equal_real_table_reread(spark):
    a = load_table(spark, SF_SMOKE, "documents")
    b = load_table(spark, SF_SMOKE, "documents").repartition(5)
    assert X.checksums_equal(a, b)
    assert not X.checksums_equal(a, b.where(F.col("doc_id") != 3))


def test_table_diff_statuses_and_null_keys(spark):
    a = spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (None, "n", 0.0)],
        "k INT, v STRING, w DOUBLE",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.0), (2, "Y", 2.0), (4, "q", 4.0), (None, "n", 0.0)],
        "k INT, v STRING, w DOUBLE",
    )
    got = {(r["k"], r["diff"]) for r in X.table_diff(a, b, ["k"]).collect()}
    assert got == {(2, "changed"), (3, "only_left"), (4, "only_right")}
    # ignoring the volatile column hides the change
    got_v = {
        (r["k"], r["diff"])
        for r in X.table_diff(a, b, ["k"], compare_cols=["w"]).collect()
    }
    assert got_v == {(3, "only_left"), (4, "only_right")}


def test_table_diff_randomized_python_differential(spark):
    rng = random.Random(19)
    left = {i: (f"s{rng.randrange(50)}", rng.randrange(1000)) for i in range(300)}
    right = dict(left)
    # mutate ~10%, delete ~5%, insert ~5%
    for i in rng.sample(sorted(right), 30):
        right[i] = (right[i][0] + "_m", right[i][1])
    for i in rng.sample(sorted(right), 15):
        del right[i]
    for i in range(1000, 1015):
        right[i] = ("new", i)
    a = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in left.items()], "k INT, s STRING, n INT"
    )
    b = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in right.items()], "k INT, s STRING, n INT"
    )
    want = {}
    for k in left.keys() | right.keys():
        if k not in right:
            want[k] = "only_left"
        elif k not in left:
            want[k] = "only_right"
        elif left[k] != right[k]:
            want[k] = "changed"
    got = {r["k"]: r["diff"] for r in X.table_diff(a, b, ["k"]).collect()}
    assert got == want
    assert not X.checksums_equal(a, b)


def test_checksum_plan_is_partial_aggregate(spark):
    """The certificate must reduce map-side: the plan's only exchange is
    the one-row-per-partition final merge."""
    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)], "id INT, s STRING")
    plan = X.table_checksum(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SinglePartition" in plan


def test_row_fingerprint_validation(spark):
    with pytest.raises(ValueError, match="at least one column"):
        X.row_fingerprint([])
    df = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ValueError, match="key column"):
        X.table_diff(df, df, [])


def test_table_diff_duplicate_keys_multiset_semantics(spark):
    """Non-unique keys compare as per-key multisets — no many-to-many
    fan-out, no spurious 'changed' for identical duplicate groups."""
    a = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "p"), (3, "q"), (3, "q")],
        "k INT, v STRING",
    )
    # same multiset for k=1 (order flipped), k=2 changed, k=3 lost a dup
    b = spark.createDataFrame(
        [(1, "y"), (1, "x"), (2, "P"), (3, "q")],
        "k INT, v STRING",
    )
    got = {(r["k"], r["diff"]) for r in X.table_diff(a, b, ["k"]).collect()}
    assert got == {(2, "changed"), (3, "changed")}
    # identical frames with dup keys: empty diff (the fan-out bug would
    # have emitted k=1 'changed' pairs)
    assert X.table_diff(a, a, ["k"]).count() == 0


def test_md5_checksum_full_duckdb_differential(spark):
    """Cross-ENGINE certificate (round 6): per-event_type checksums built
    on the md5 fingerprint must be reproduced EXACTLY by DuckDB running
    the twin SQL over the same parquet — the migration story where the
    verifying engine is not Spark.  Floats enter as decimal casts (double
    → string renders differently across engines; exact types don't)."""
    import duckdb

    cols = ["event_id", "event_type", "v"]
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "v", F.col("value").cast("decimal(12,2)")
    )
    fp = X.md5_fingerprint(cols)
    got = {
        r["event_type"]: (r["n_rows"], r["xor_fp"], str(r["sum_fp"]))
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor(fp).alias("xor_fp"),
            F.sum(fp.cast("decimal(38,0)")).alias("sum_fp"),
        )
        .collect()
    }
    du_fp = X.du_md5_fingerprint(cols)
    con = duckdb.connect()
    want = {
        r[0]: (r[1], r[2], str(r[3]))
        for r in con.execute(
            f"""
            WITH ev AS (
              SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS v
              FROM read_parquet('{SF_SMOKE}/events.parquet')
            )
            SELECT event_type, COUNT(*),
                   bit_xor({du_fp}),
                   CAST(SUM(CAST({du_fp} AS DECIMAL(38,0))) AS DECIMAL(38,0))
            FROM ev GROUP BY event_type
            """
        ).fetchall()
    }
    assert got == want and len(got) >= 3


def test_table_diff_md5_fingerprint_finds_mutations(spark):
    """table_diff with the cross-engine fingerprint pinpoints exactly the
    mutated keys (and nothing else) — the keyed-certificate path under
    the replayable fingerprint mode."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(12,2)").alias("v")
    )
    mutated = ev.withColumn(
        "v",
        F.when(F.col("event_id") % 997 == 0, F.col("v") + 1).otherwise(
            F.col("v")
        ),
    )
    fp = X.md5_fingerprint(["event_type", "v"])
    diff = X.table_diff(
        ev, mutated, ["event_id"], ["event_type", "v"], fingerprint=fp
    )
    got = {(r["event_id"], r["diff"]) for r in diff.collect()}
    want_ids = {
        r["event_id"]
        for r in ev.where(F.col("event_id") % 997 == 0).collect()
    }
    assert got == {(i, "changed") for i in want_ids} and len(got) > 0


def test_md5_fingerprint_no_cross_column_collisions(spark):
    """Per-lane hashing: values containing the old raw separator must not
    shift content across column boundaries (round-6 review: ('a\\x1fb','c')
    vs ('a','b\\x1fc') collided under a raw separator join), and a literal
    sentinel-looking string must not collide with NULL."""
    rows = [
        (1, "a\x1fb", "c"),
        (2, "a", "b\x1fc"),
        (3, "a:b", "c"),
        (4, "a", "b:c"),
        (5, None, "x"),
        (6, "x", None),
        (7, "\x00NULL\x00", "x"),
    ]
    df = spark.createDataFrame(rows, "id INT, c1 STRING, c2 STRING")
    fps = {
        r["id"]: r["fp"]
        for r in df.select(
            "id", X.md5_fingerprint(["c1", "c2"]).alias("fp")
        ).collect()
    }
    assert len(set(fps.values())) == 7, fps  # all distinct
