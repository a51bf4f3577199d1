"""X29: distributed Lloyd's (spherical k-means) trainer — numpy reference
differential + contract pins (`operators/similarity.train_kmeans`)."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.operators import similarity as S


def _cluster_data(n_per=40, dim=8, seed=7):
    """Three well-separated unit-ish clusters (deterministic)."""
    rng = random.Random(seed)
    anchors = [
        [1.0] + [0.0] * (dim - 1),
        [0.0, 1.0] + [0.0] * (dim - 2),
        [0.0, 0.0, 1.0] + [0.0] * (dim - 3),
    ]
    rows = []
    i = 0
    for a in anchors:
        for _ in range(n_per):
            v = [x + rng.uniform(-0.05, 0.05) for x in a]
            rows.append((i, v))
            i += 1
    return rows


def _np_spherical_kmeans(X, init, n_iter, tol):
    """Independent reference.  Tie-break on assignment = LARGER centroid
    index (matching assign_centroid's struct-max semantics)."""
    C = np.array(init, dtype=np.float64)
    it = 0
    for it in range(1, n_iter + 1):
        scores = X @ C.T  # (n, k)
        # argmax with ties -> larger idx: reverse, argmax, map back
        b = (C.shape[0] - 1) - np.argmax(scores[:, ::-1], axis=1)
        nxt = C.copy()
        for j in range(C.shape[0]):
            pts = X[b == j]
            if len(pts):
                m = pts.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    nxt[j] = m / n
        shift = float(np.max(np.linalg.norm(C - nxt, axis=1)))
        C = nxt
        if shift < tol:
            break
    return C, it


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        _cluster_data(), "vec_id INT, embedding ARRAY<DOUBLE>"
    )


def test_null_vectors_ignored(spark, vecs):
    """NULL embedding rows must not crash the Lloyd's loop (round-5
    ADVICE: NULL bucket + NULL sums -> TypeError) and must not perturb
    the trained centroids — same result as pre-filtered input."""
    withnulls = vecs.unionByName(
        spark.createDataFrame(
            [(900, None), (901, None)], "vec_id INT, embedding ARRAY<DOUBLE>"
        )
    )
    init = S.kmeans_centroids(vecs, n_clusters=3, seed=11, sample_limit=64)
    c_clean, it_clean = S.train_kmeans(
        vecs, n_clusters=3, n_iter=4, init=init
    )
    c_null, it_null = S.train_kmeans(
        withnulls, n_clusters=3, n_iter=4, init=init
    )
    assert it_clean == it_null
    assert c_clean == c_null


def test_matches_numpy_reference(spark, vecs):
    # deliberately bad init: all three in the same octant corner
    init = [
        [1.0, 1.0, 0.0, 0, 0, 0, 0, 0],
        [1.0, 0.0, 1.0, 0, 0, 0, 0, 0],
        [0.0, 1.0, 1.0, 0, 0, 0, 0, 0],
    ]
    init = [[x / math.sqrt(2.0) for x in c] for c in init]
    got, it_got = S.train_kmeans(
        vecs, "embedding", "vec_id", init=init, n_iter=8, tol=1e-9
    )
    X = np.array([v for _, v in _cluster_data()], dtype=np.float64)
    want, it_want = _np_spherical_kmeans(X, init, n_iter=8, tol=1e-9)
    assert it_got == it_want
    assert np.allclose(np.array(got), want, atol=1e-9)


def test_converges_and_recovers_clusters(spark, vecs):
    init = [
        [1.0] + [0.0] * 7,
        [0.0, 1.0] + [0.0] * 6,
        [0.0, 0.0, 1.0] + [0.0] * 5,
    ]
    cents, it = S.train_kmeans(
        vecs, "embedding", "vec_id", init=init, n_iter=20, tol=1e-12
    )
    assert it < 20  # early convergence, not the cap
    # each learned centroid stays dominated by its anchor axis
    for j, c in enumerate(cents):
        assert max(range(8), key=lambda d: c[d]) == j
        assert sum(x * x for x in c) == pytest.approx(1.0, abs=1e-9)


def test_empty_cluster_keeps_previous_centroid(spark, vecs):
    # negative on EVERY dim: its dot with any data point is ~ -0.35,
    # strictly below whatever the best axis centroid offers -> wins nothing
    far = [-1.0 / math.sqrt(8.0)] * 8
    init = [
        [1.0] + [0.0] * 7,
        [0.0, 1.0] + [0.0] * 6,
        far,
    ]
    cents, _ = S.train_kmeans(
        vecs, "embedding", "vec_id", init=init, n_iter=3, tol=1e-12
    )
    assert cents[2] == pytest.approx(far, abs=0.0)


def test_sample_init_then_full_refinement(spark, vecs):
    """End-to-end: warm start from the capped-sample fitter, refine on all
    data, feed the result to IVF — full-probe IVF must equal brute force."""
    cents, _ = S.train_kmeans(
        vecs, "embedding", "vec_id", n_clusters=3, n_iter=5, sample_limit=30
    )
    queries = vecs.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf = S.ivf_kmeans_topk(
        queries, vecs, k=3, n_clusters=3, n_probe=3, centroids=cents
    )
    bf = S.brute_force_topk(queries, vecs, k=3)
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in ivf.collect()}
    want = {(r["query_id"], r["rank"]): r["vec_id"] for r in bf.collect()}
    assert got == want


def test_exact_decimal_mode_duckdb_replay(spark):
    """Cross-engine differential (round-9 rotation prep): two full Lloyd
    iterations in exact_decimal mode, replayed from scratch in DuckDB —
    decimal(12,6) dot-product assignment with ties to the LARGER bucket,
    exact decimal per-dim update sums, nearest-double mean, 6-dp
    HALF_UP centroid quantization, decimal-exact norm², double sqrt and
    divide.  Final centroids must match coordinate-for-coordinate (==,
    not approx): every step is order-free and engine-identical by
    construction, so any drift is a real semantics bug."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dim, k, iters = 64, 4, 2
    # init = the first k embeddings quantized to 6 dp (replayable from raw)
    init_rows = (
        emb.where(F.col("vec_id") < k)
        .orderBy("vec_id")
        .select(
            F.transform(
                "embedding",
                lambda x: x.cast("double").cast("decimal(12,6)").cast("double"),
            ).alias("e")
        )
        .collect()
    )
    init = [list(r["e"]) for r in init_rows]
    got, it = S.train_kmeans(
        emb, n_clusters=k, n_iter=iters, tol=0.0, init=init, exact_decimal=True
    )
    assert it == iters

    con = duckdb.connect()
    con.execute(
        f"""CREATE TABLE ed AS
            SELECT vec_id, d.d AS dim,
                   CAST(CAST(embedding[d.d] AS DOUBLE) AS DECIMAL(12,6)) AS xd
            FROM read_parquet('{sf}/embeddings.parquet'),
                 generate_series(1, {dim}) d(d)
            WHERE embedding IS NOT NULL"""
    )
    # c: (bucket, dim, v DOUBLE) — iteration-0 centroids from the raw data
    con.execute(
        f"""CREATE TABLE c AS
            SELECT vec_id AS bucket, dim,
                   CAST(xd AS DOUBLE) AS v
            FROM ed WHERE vec_id < {k}"""
    )
    for _ in range(iters):
        con.execute("DROP TABLE IF EXISTS assign")
        con.execute(
            """CREATE TABLE assign AS
               SELECT vec_id, bucket FROM (
                 SELECT ed.vec_id, c.bucket,
                        ROW_NUMBER() OVER (
                          PARTITION BY ed.vec_id
                          ORDER BY CAST(SUM(ed.xd * CAST(c.v AS DECIMAL(12,6))) AS DOUBLE) DESC,
                                   c.bucket DESC) AS rn
                 FROM ed JOIN c USING (dim)
                 GROUP BY ed.vec_id, c.bucket
               ) WHERE rn = 1"""
        )
        con.execute("DROP TABLE IF EXISTS cnext")
        con.execute(
            """CREATE TABLE cnext AS
               WITH mq AS (
                 SELECT a.bucket, ed.dim,
                        CAST(CAST(CAST(SUM(ed.xd) AS DOUBLE) / COUNT(*) AS DECIMAL(12,6)) AS DECIMAL(12,6)) AS m
                 FROM assign a JOIN ed USING (vec_id)
                 GROUP BY a.bucket, ed.dim
               ), nrm AS (
                 SELECT bucket, SQRT(CAST(SUM(m * m) AS DOUBLE)) AS nrm FROM mq GROUP BY bucket
               ), upd AS (
                 SELECT mq.bucket, mq.dim,
                        CAST(CAST(CAST(mq.m AS DOUBLE) / nrm.nrm AS DECIMAL(12,6)) AS DOUBLE) AS v
                 FROM mq JOIN nrm USING (bucket) WHERE nrm.nrm > 0
               )
               SELECT c.bucket, c.dim, COALESCE(upd.v, c.v) AS v
               FROM c LEFT JOIN upd ON upd.bucket = c.bucket AND upd.dim = c.dim"""
        )
        con.execute("DROP TABLE c")
        con.execute("ALTER TABLE cnext RENAME TO c")
    want = {}
    for b, d, v in con.execute("SELECT bucket, dim, v FROM c").fetchall():
        want.setdefault(int(b), [0.0] * dim)[int(d) - 1] = v
    for j in range(k):
        assert got[j] == want[j], f"centroid {j} drift"
