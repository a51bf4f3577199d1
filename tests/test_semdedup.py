"""SemDeDup (X17) unit tests: cluster confinement, survivor rule,
threshold behavior."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from r_e_hive__spark.operators.similarity import semantic_dedup

# two well-separated unit centroids on the first two axes
_CENTS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def test_exact_duplicates_keep_lowest_id(spark):
    v = _unit([0.9, 0.1, 0.0])
    w = _unit([0.1, 0.95, 0.0])
    rows = [(1, v), (2, v), (3, v), (10, w), (11, w)]
    out = semantic_dedup(_df(spark, rows), "vec_id", "embedding", _CENTS, 0.99)
    kept = sorted(r.vec_id for r in out.collect())
    assert kept == [1, 10]


def test_duplicates_in_different_clusters_both_survive(spark):
    # identical-looking cosine-1 pair but assigned to different clusters
    # never meet: the pairing is strictly within-cluster
    a = _unit([1.0, 0.2, 0.0])   # cluster 0
    b = _unit([0.2, 1.0, 0.0])   # cluster 1
    out = semantic_dedup(
        _df(spark, [(1, a), (2, a), (3, b)]), "vec_id", "embedding", _CENTS, 0.99
    )
    kept = {r.vec_id: r._sd_cluster for r in out.collect()}
    assert set(kept) == {1, 3} and kept[1] == 0 and kept[3] == 1


def test_threshold_one_keeps_near_but_not_exact(spark):
    a = _unit([1.0, 0.10, 0.0])
    b = _unit([1.0, 0.12, 0.0])  # near a but cosine < 0.9999
    out = semantic_dedup(
        _df(spark, [(1, a), (2, b)]), "vec_id", "embedding", _CENTS, 0.9999
    )
    assert sorted(r.vec_id for r in out.collect()) == [1, 2]
    out2 = semantic_dedup(
        _df(spark, [(1, a), (2, b)]), "vec_id", "embedding", _CENTS, 0.9
    )
    assert sorted(r.vec_id for r in out2.collect()) == [1]


def test_parallel_rule_drops_chain_members(spark):
    """b~a and c~b with a<b<c: the parallel keep-first rule drops c when
    c is near ANY lower id (here both), even though b itself is dropped —
    the documented deviation from sequential greedy."""
    a = _unit([1.0, 0.10, 0.0])
    b = _unit([1.0, 0.11, 0.0])
    c = _unit([1.0, 0.12, 0.0])
    out = semantic_dedup(
        _df(spark, [(1, a), (2, b), (3, c)]), "vec_id", "embedding", _CENTS, 0.999
    )
    assert sorted(r.vec_id for r in out.collect()) == [1]


def test_numpy_strategy_matches_expr(spark):
    """The BLAS applyInPandas strategy must keep exactly the rows the
    pure-expression strategy keeps (same clusters, same survivors) on the
    smoke embeddings."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    from r_e_hive__spark.queries._ivf_centroids import _IVF_CENTROIDS

    kw = dict(
        id_col="vec_id",
        vec_col="embedding",
        centroids=_IVF_CENTROIDS,
        cosine_threshold=0.25,
    )
    expr_rows = {
        (r.vec_id, r._sd_cluster)
        for r in semantic_dedup(emb, strategy="expr", **kw).collect()
    }
    np_rows = {
        (r.vec_id, r._sd_cluster)
        for r in semantic_dedup(emb, strategy="numpy", **kw).collect()
    }
    assert np_rows == expr_rows and len(np_rows) > 0


def test_numpy_strategy_rejects_exact_decimal(spark):
    import pytest as _pytest

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    with _pytest.raises(ValueError):
        semantic_dedup(
            emb, "vec_id", "embedding", _CENTS, 0.5,
            exact_decimal=True, strategy="numpy",
        )


def test_scaled_k_bench_row_runs_and_is_deterministic(spark):
    """x17_semdedup_scaled (bench-only, round 9): the k = N/target
    configuration must run on the fixture, keep survivors a subset of the
    input, and be deterministic run-over-run (strided seed centroids are a
    pure function of the data)."""
    from r_e_hive__spark.queries.fastpaths import x17_semdedup_scaled
    from tests.conftest import SF_SMOKE

    a = x17_semdedup_scaled(spark, SF_SMOKE).collect()
    b = x17_semdedup_scaled(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert 0 < len(a) <= n


def test_scaled_k_bench_row_survivors_match_expr_strategy(spark):
    """Survivor-identity anchor for the Spark-only bench row (VERDICT r9
    item 5): x17_semdedup_scaled's survivor set must equal
    semantic_dedup(strategy="expr") run with the SAME strided seed
    centroids and threshold — so the row's correctness doesn't ride
    solely on configuration discipline (whatever strategy auto picks,
    the result is pinned to the differentialed expr path)."""
    import math

    from r_e_hive__spark.queries.fastpaths import (
        _SCALED_TARGET_CLUSTER,
        x17_semdedup_scaled,
    )
    from r_e_hive__spark.queries.similarity import _SEMDEDUP_TAU
    from tests.conftest import SF_SMOKE

    got = {
        (r["vec_id"], r["cluster"])
        for r in x17_semdedup_scaled(spark, SF_SMOKE).collect()
    }

    # re-derive the strided seed centroids exactly as the bench row does
    emb = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("embedding").isNotNull())
    )
    n = emb.count()
    k = max(8, n // _SCALED_TARGET_CLUSTER)
    stride = max(1, n // k)
    seeds = (
        emb.where(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(k)
        .collect()
    )
    cents = []
    for r in seeds:
        v = [float(x) for x in r["embedding"]]
        nn = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / nn for x in v])

    want = {
        (r["vec_id"], r["_sd_cluster"])
        for r in semantic_dedup(
            emb, "vec_id", "embedding", cents, _SEMDEDUP_TAU, strategy="expr"
        ).collect()
    }
    assert got == want
