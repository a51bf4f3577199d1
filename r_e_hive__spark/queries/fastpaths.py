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


# (session identity, sf_dir) -> (postings, stats), both Spark-cached:
# the production BM25 shape is index-once/search-many — the declared
# query rebuilds the inverted index per run (the oracle-replay
# configuration), which at search time is pure overhead
_BM25_INDEX_CACHE: dict[tuple, tuple] = {}


def x23_bm25_topk_fast(spark, sf_dir):
    """x23_bm25_topk on the production path: search against a persisted
    (session-cached) postings index + precomputed corpus stats — a
    search is the pushed-down term filter → tiny df-count agg → per-doc
    sum → TakeOrderedAndProject, never an index rebuild.  At 100 TB the
    index lives as term-partitioned parquet and the IN-list
    partition-prunes it; the in-memory cache plays that role here."""
    from r_e_hive__spark.operators.ranking import corpus_stats, term_postings
    from r_e_hive__spark.queries.text import bm25_declared_topk

    (documents,) = T(spark, sf_dir, "documents")
    sc = spark.sparkContext
    ctx = (sc.applicationId, sc.startTime)
    key = (ctx, sf_dir)
    # evict entries from other sessions: (applicationId, startTime) never
    # repeats, so stale keys are unreachable forever and would pin
    # DataFrames bound to dead JVMs (round-7 second review)
    for k in [k for k in _BM25_INDEX_CACHE if k[0] != ctx]:
        old_p, old_s = _BM25_INDEX_CACHE.pop(k)
        for d in (old_p, old_s):
            try:
                d.unpersist()
            except Exception:
                pass
    idx = _BM25_INDEX_CACHE.get(key)
    if idx is None:
        p = term_postings(documents.select("doc_id", "text"), "text", "doc_id").cache()
        s = corpus_stats(p, "doc_id").cache()
        p.count(), s.count()  # materialize the index once, like a build job
        _BM25_INDEX_CACHE[key] = idx = (p, s)
    p, s = idx
    # the scoring tail is the declared query's own helper — the
    # determinism contract (rounding, tie-break, top-k) has ONE home
    return bm25_declared_topk(documents, postings=p, stats=s)


FASTPATHS = {
    "x17_semdedup_fast": x17_semdedup_fast,
    "x25_quantized_topk_fast": x25_quantized_topk_fast,
    "x23_bm25_topk_fast": x23_bm25_topk_fast,
}
