"""Bench-only fast-path twins of declared queries (round 7).

The declared x17/x25 queries deliberately force the ``expr`` strategy
with exact decimal arithmetic so their DuckDB oracles can replay them
value-for-value — that is the CORRECTNESS configuration, not the one a
pipeline user runs.  The production path is ``strategy="auto"`` (BLAS /
Arrow at scale, float64 with 6-dp rounding), whose equality to the expr
path is pinned by tests/test_auto_strategy.py.  These twins exist so the
LLM bench set tracks the FAST path too: a regression in the blocked
matmul or the Arrow batching moves a recorded number instead of hiding
behind the exact-decimal instrument row.

NOT registered as declared queries (no independent oracle — the task is
identical to the exact twin, so tools/baseline_duckdb.py pairs each fast
twin with its exact twin's oracle via bench_common.LLM_FAST).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators import similarity as S
from r_e_hive__spark.queries._util import T


def x17_semdedup_fast(spark, sf_dir):
    """x17_semdedup on the production path: strategy='auto' (BLAS per
    cluster at scale), float64 cosines rounded 6 dp."""
    from r_e_hive__spark.queries._ivf_centroids import _IVF_CENTROIDS
    from r_e_hive__spark.queries.similarity import _SEMDEDUP_TAU

    (embeddings,) = T(spark, sf_dir, "embeddings")
    return (
        S.semantic_dedup(
            embeddings.select("vec_id", "embedding"),
            "vec_id",
            "embedding",
            centroids=_IVF_CENTROIDS,
            cosine_threshold=_SEMDEDUP_TAU,
        )
        .select("vec_id", F.col("_sd_cluster").alias("cluster"))
        .orderBy("vec_id")
    )


def x25_quantized_topk_fast(spark, sf_dir):
    """x25_quantized_topk on the production path: strategy='auto'
    (vectorized integer shortlist + float re-rank at scale)."""
    (embeddings,) = T(spark, sf_dir, "embeddings")
    queries_df = embeddings.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.quantized_topk(
        queries_df,
        embeddings,
        "query_id",
        "vec_id",
        "embedding",
        k=10,
        shortlist_mult=4,
        rerank=True,
    )


FASTPATHS = {
    "x17_semdedup_fast": x17_semdedup_fast,
    "x25_quantized_topk_fast": x25_quantized_topk_fast,
}
