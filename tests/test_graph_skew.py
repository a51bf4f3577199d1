"""Skewed-graph J8 coverage (VERDICT r3 item 3).

The commission engine's real referral graph is power-law (SURVEY.md §4.2):
chains converge on early users, so the closure's equi-joins carry
heavy-hitter keys.  Three guarantees pinned here over the deterministic
``fixtures.power_law_edges`` graph (one ancestor, 10⁴ direct descendants):

1. row parity between the distributed path-doubling strategy and the
   single-task local strategy,
2. a CORRECTNESS-style differential against DuckDB's WITH RECURSIVE over
   the identical edge table,
3. AQE's skew-join rule actually SPLITS the heavy partition in the
   doubling plan (asserted on the executed final plan, with the skew
   thresholds lowered to make test-scale data legible to the rule — at
   100 TB the default 256 MB thresholds trigger on real skew).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from r_e_hive__spark.fixtures import power_law_edges
from r_e_hive__spark.operators.graph import ancestor_closure


def _edges_df(spark, n_hub: int = 10_000):
    return spark.createDataFrame(
        power_law_edges(n_hub), "child BIGINT, parent BIGINT"
    ).repartition(8)


def _duck_closure(edges: list[tuple[int, int]], max_levels: int = 10) -> set:
    con = duckdb.connect()
    try:
        con.register("edges", pd.DataFrame(edges, columns=["child", "parent"]))
        rows = con.execute(
            f"""
            WITH RECURSIVE up AS (
              SELECT child AS node, parent AS ancestor, 1 AS level FROM edges
              UNION ALL
              SELECT up.node, e.parent, up.level + 1
              FROM up JOIN edges e ON up.ancestor = e.child
              WHERE up.level < {max_levels}
            )
            SELECT node, ancestor, level FROM up
            """
        ).fetchall()
        return set(rows)
    finally:
        con.close()


def test_power_law_doubling_parity_and_oracle(spark):
    edges = power_law_edges(10_000)
    df = _edges_df(spark)
    doubling = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, strategy="doubling").collect()
    }
    local = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, strategy="local").collect()
    }
    oracle = _duck_closure(edges)
    assert doubling == local == oracle
    # the heavy key really is heavy, and its matches propagate: every hub
    # child reaches 7, 3 and 1
    assert (1000, 7, 1) in doubling and (1000, 1, 3) in doubling
    assert sum(1 for (_, a, _) in doubling if a == 7) >= 10_000
    # the deep chain hits the 10-level cap
    assert max(lvl for (_, _, lvl) in doubling) == 10


def test_doubling_plan_aqe_splits_skewed_join(spark):
    """The heavy-hitter join round must come back SortMergeJoin(skew=true):
    AQE's OptimizeSkewedJoin split the 10⁴-row key's partition instead of
    letting one task carry it.  max_levels=2 keeps that round as the FINAL
    (inspectable) plan — deeper caps checkpoint the early rounds away."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        closure = ancestor_closure(
            _edges_df(spark), strategy="doubling", max_levels=2
        )
        rows = closure.collect()  # execute THIS plan so AQE finalizes it
        assert len(rows) > 10_000
        from tests.test_plans import plan

        p = plan(closure, "simple")
        assert "isFinalPlan=true" in p, p
        assert "skew=true" in p, f"AQE did not split the skewed join\n{p}"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_salted_join_parity_and_balance(spark):
    """The explicit salting fallback (SURVEY.md §4.2): a 90%-hot-key fact
    joined to a small dim must (a) equal the plain join under every
    supported join type, and (b) actually spread the hot key across `salt`
    sub-keys so no reducer sees more than ~1/salt of it."""
    from pyspark.sql import functions as F

    from r_e_hive__spark.operators.relational import salted_join

    n, salt = 20_000, 8
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    for how in ("inner", "left"):
        got = salted_join(fact, dim, on="k", salt=salt, how=how)
        want = fact.join(dim, "k", how)
        assert sorted(got.columns) == sorted(want.columns)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    # balance: the hot key's rows split across all salt sub-keys, each
    # bucket within 3x of the ideal 1/salt share — observed from the
    # OPERATOR's own output (keep_salt), not a re-implementation of its
    # spray expression (round-4 test review)
    sprayed = salted_join(
        fact, dim, on="k", salt=salt, keep_salt=True
    ).where(F.col("k") == 7)
    buckets = {
        r["__salt"]: r["count"]
        for r in sprayed.groupBy("__salt").count().collect()
    }
    hot = sum(buckets.values())
    assert len(buckets) == salt
    assert max(buckets.values()) < 3 * hot / salt

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(fact, dim, on="k", how="right")


def test_salted_join_rejects_degenerate_salt(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from r_e_hive__spark.operators.relational import salted_join

    df = spark.range(4).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError):
        salted_join(df, df, on="k", salt=0)
