"""Similarity-search operator tests: exact correctness + LSH recall."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators import similarity as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    return dot / (na * nb)


def test_brute_force_topk_matches_numpy(spark, embeddings):
    sample = embeddings.where(F.col("vec_id") < 50).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in sample}
    queries = embeddings.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = embeddings.where(F.col("vec_id") < 50)
    got = S.brute_force_topk(queries, cands, k=5, exact_decimal=False).collect()
    for qid in (0, 1):
        expect = sorted(
            ((round(_cos(vecs[qid], v), 6), cid) for cid, v in vecs.items()),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        got_q = sorted(
            [(r["rank"], r["vec_id"]) for r in got if r["query_id"] == qid]
        )
        assert [cid for _, cid in got_q] == [cid for _, cid in expect]


def test_ivf_topk_subset_of_bucket(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    got = S.ivf_topk(queries, embeddings, "label", k=5).collect()
    labels = {r["vec_id"]: r["label"] for r in embeddings.collect()}
    qlabels = {r["query_id"]: r["label"] for r in queries.collect()}
    for r in got:
        assert labels[r["vec_id"]] == qlabels[r["query_id"]]


def test_lsh_pairs_verified_exact(spark, embeddings):
    """Every emitted pair must genuinely clear the cosine threshold (the
    exact-verification step removes LSH false positives)."""
    small = embeddings.where(F.col("vec_id") < 200)
    pairs = S.lsh_neighbor_pairs(
        small, cosine_threshold=0.25, n_planes=16, bands=4
    ).collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in small.collect()}
    for r in pairs:
        assert round(_cos(vecs[r["id_a"]], vecs[r["id_b"]]), 4) >= 0.25 - 1e-4
