"""Int8 embedding quantization (X25): reconstruction bounds, a Python
HALF_UP rounding differential, scale-cancellation property, recall vs the
exact scan on real embeddings, and strategy/rerank parity."""

from __future__ import annotations

import math
import random
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators import similarity as S
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def _rand_vecs(rng, n, dim):
    return [
        (i, [rng.uniform(-3, 3) for _ in range(dim)]) for i in range(n)
    ]


def _py_quantize(vec):
    """Independent reference: scale = max|v|/127, HALF_UP rounding (Spark's
    F.round contract for doubles — NOT Python's banker's round)."""
    amax = max(abs(x) for x in vec) if vec else 0.0
    scale = amax / 127.0
    if scale == 0.0:
        return [0] * len(vec), 0.0
    codes = [
        int(Decimal(x / scale).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
        for x in vec
    ]
    return codes, scale


def test_quantize_matches_python_reference_and_bounds(spark):
    rng = random.Random(5)
    rows = _rand_vecs(rng, 80, 16)
    rows.append((900, [0.0] * 16))  # zero vector
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    got = {
        r["vec_id"]: (list(r["q_codes"]), r["q_scale"], list(r["embedding"]))
        for r in S.quantize_embeddings(df).collect()
    }
    for i, _ in rows:
        codes, scale, vec_f32 = got[i]
        # reference computed from the FLOAT32-truncated values Spark saw
        want_codes, want_scale = _py_quantize(vec_f32)
        assert codes == want_codes, i
        assert scale == pytest.approx(want_scale, rel=1e-12)
        assert all(-127 <= c <= 127 for c in codes)
        # reconstruction error bound: |v - c*scale| <= scale/2 (+ eps)
        for x, c in zip(vec_f32, codes):
            assert abs(x - c * scale) <= scale / 2 + 1e-9
    assert got[900][0] == [0] * 16 and got[900][1] == 0.0


def test_quantize_null_vector_passthrough(spark):
    df = spark.createDataFrame(
        [(1, None)], "vec_id INT, embedding ARRAY<FLOAT>"
    )
    r = S.quantize_embeddings(df).collect()[0]
    assert r["q_codes"] is None and r["q_scale"] is None


def test_quantized_cosine_close_to_exact(spark):
    """Scale cancellation: the int8 code cosine approximates the float
    cosine within the SQ8 error envelope (loose 0.02 for 32-dim)."""
    rng = random.Random(13)
    rows = _rand_vecs(rng, 40, 32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    queries = df.where(F.col("vec_id") < 4).withColumnRenamed(
        "vec_id", "query_id"
    )
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in S.brute_force_topk(
            queries, df, k=40, exact_decimal=False
        ).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in S.quantized_topk(
            queries, df, k=40, rerank=False, strategy="numpy"
        ).collect()
    }
    assert set(approx) == set(exact)
    for key in exact:
        assert approx[key] == pytest.approx(exact[key], abs=0.02)


def test_quantized_topk_recall_and_rerank_scores(spark, embeddings):
    queries = (
        embeddings.where(F.col("vec_id") % 97 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .limit(4)
    )
    exact = S.brute_force_topk(
        queries, embeddings, k=10, exact_decimal=False
    )
    exact_sets = {}
    exact_scores = {}
    for r in exact.collect():
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        exact_scores[(r["query_id"], r["vec_id"])] = r["cosine"]
    got = S.quantized_topk(queries, embeddings, k=10, shortlist_mult=4)
    got_sets = {}
    for r in got.collect():
        got_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        # re-ranked scores are FULL precision: equal to the exact scan's
        if (r["query_id"], r["vec_id"]) in exact_scores:
            assert r["cosine"] == pytest.approx(
                exact_scores[(r["query_id"], r["vec_id"])], abs=2e-6
            )
    recalls = [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_quantized_strategies_agree(spark, embeddings):
    queries = (
        embeddings.where(F.col("vec_id") % 101 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .limit(3)
    )
    a = S.quantized_topk(
        queries, embeddings, k=8, rerank=False, strategy="numpy"
    ).collect()
    b = S.quantized_topk(
        queries, embeddings, k=8, rerank=False, strategy="expr"
    ).collect()
    assert [(r["query_id"], r["rank"], r["vec_id"]) for r in a] == [
        (r["query_id"], r["rank"], r["vec_id"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert ra["cosine"] == pytest.approx(rb["cosine"], abs=2e-6)


def test_quantized_topk_validation_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id INT, embedding ARRAY<FLOAT>"
    )
    q = df.withColumnRenamed("vec_id", "query_id")
    with pytest.raises(ValueError, match="shortlist_mult"):
        S.quantized_topk(q, df, shortlist_mult=0)
    with pytest.raises(ValueError, match="unknown strategy"):
        S.quantized_topk(q, df, strategy="blas3000")
    one = S.quantized_topk(q, df, k=2).collect()
    two = S.quantized_topk(q, df, k=2).collect()
    assert one == two


def test_dequantize_roundtrip_error(spark):
    rng = random.Random(23)
    rows = _rand_vecs(rng, 30, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    qdf = S.quantize_embeddings(df)
    out = qdf.select(
        "vec_id",
        "embedding",
        "q_scale",
        S.dequantize_embedding(F.col("q_codes"), F.col("q_scale")).alias("dq"),
    ).collect()
    for r in out:
        for x, d in zip(r["embedding"], r["dq"]):
            assert abs(x - d) <= r["q_scale"] / 2 + 1e-9
        # relative L2 error stays inside the SQ8 envelope
        num = math.sqrt(sum((x - d) ** 2 for x, d in zip(r["embedding"], r["dq"])))
        den = math.sqrt(sum(x * x for x in r["embedding"]))
        assert num / den < 0.01


def test_quantized_topk_precomputed_codes_identical(spark, embeddings):
    queries = (
        embeddings.where(F.col("vec_id") % 97 == 0)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .limit(3)
    )
    codes = S.quantize_embeddings(embeddings).select(
        "vec_id", "q_codes"
    ).localCheckpoint()
    a = S.quantized_topk(queries, embeddings, k=8).collect()
    b = S.quantized_topk(
        queries, embeddings, k=8, candidate_codes=codes
    ).collect()
    assert a == b


def test_quantized_numpy_null_embeddings_excluded_not_crash(spark):
    """NULL embeddings follow the expr paths' NULL contract on the numpy
    strategy too (round-5 code review: np.stack over None crashed the
    worker)."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None)],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    q = df.where(F.col("vec_id") == 1).withColumnRenamed("vec_id", "query_id")
    for strat in ("numpy", "expr"):
        got = {
            r["vec_id"]
            for r in S.quantized_topk(
                q, df, k=3, rerank=False, strategy=strat
            ).collect()
        }
        assert got == {1, 2}, strat
    # the float numpy scan inherits the same fix
    got = {
        r["vec_id"]
        for r in S.brute_force_topk(
            q, df, k=3, exact_decimal=False, strategy="numpy"
        ).collect()
    }
    assert got == {1, 2}
