"""Similarity search over embedding columns (SURVEY.md §2.11 X3-X4).

Three strategies, correctness-first to scale-first:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set, crossJoin against candidates, window top-k per query.  The candidate
  scan is embarrassingly parallel; the only shuffle is the final per-query
  top-k (tiny).  This is the correctness baseline and is also the right
  answer whenever |queries| is small — at 100 TB the scan cost dominates
  and an index only helps if it prunes I/O.
- ``ivf_topk`` — IVF-style pruned search: candidates are pre-bucketed by a
  coarse centroid id (here: the ``label`` column or any supplied bucket
  expression); queries probe only their ``n_probe`` nearest buckets.
  Reading becomes partition-pruned (bucket = partition column at scale).
- ``lsh_neighbor_pairs`` — random-hyperplane (SimHash-for-vectors) LSH
  self-join for all-pairs search: sign-pattern buckets via fixed
  deterministic hyperplanes, candidates share a band, verified with exact
  cosine.

The exact variants use functions/vector.py's decimal-exact dot products so
declared queries hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from r_e_hive__spark.functions import vector as V
from r_e_hive__spark.operators import ensure_parallelism


def _paired_cosine(exact: bool, a: Column, b: Column) -> Column:
    return V.cosine_exact(a, b) if exact else V.cosine(a, b)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact_decimal: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Output: (query_id, rank, vec_id, cosine) — rank by (rounded cosine desc,
    vec_id asc); rounding-first ranking keeps the order reproducible across
    engines (determinism contract, SURVEY.md §2.12)."""
    # hoist each side's self-norm out of the pair loop: cosine(a,b) needs
    # 3 dot products, but ‖a‖² and ‖b‖² are per-ROW quantities — computing
    # them once per side instead of once per PAIR cuts the pairwise decimal
    # work 3× (bit-identical: the norm is cast to double before the multiply
    # exactly as in cosine_exact)
    _n2 = V.norm2_exact if exact_decimal else (lambda v: V.dot(v, v))
    _dot = V.dot_exact if exact_decimal else V.dot
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec_col).alias("_qvec"),
            _n2(F.col(vec_col)).cast("double").alias("_qn2"),
        )
    )
    c = ensure_parallelism(candidates).select(
        F.col(cand_id),
        F.col(vec_col).alias("_cvec"),
        _n2(F.col(vec_col)).cast("double").alias("_cn2"),
    )
    scored = q.crossJoin(c).select(
        query_id,
        cand_id,
        F.round(
            _dot(F.col("_qvec"), F.col("_cvec")).cast("double")
            / F.sqrt(F.col("_qn2") * F.col("_cn2")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", cand_id, "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    bucket_col: str,
    query_id: str = "query_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exact_decimal: bool = False,
) -> DataFrame:
    """IVF-pruned top-k: only candidates in the query's probe buckets are
    scored.  ``queries`` must carry ``bucket_col`` (possibly exploded over
    n_probe buckets).  At scale ``candidates`` is written partitioned by
    ``bucket_col`` so the probe is a partition-pruned scan, not a shuffle."""
    # per-side norm hoist, same reasoning (and bit-identity) as brute_force_topk
    _n2 = V.norm2_exact if exact_decimal else (lambda v: V.dot(v, v))
    _dot = V.dot_exact if exact_decimal else V.dot
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(bucket_col),
            F.col(vec_col).alias("_qvec"),
            _n2(F.col(vec_col)).cast("double").alias("_qn2"),
        )
    )
    c = ensure_parallelism(candidates).select(
        F.col(cand_id),
        F.col(bucket_col),
        F.col(vec_col).alias("_cvec"),
        _n2(F.col(vec_col)).cast("double").alias("_cn2"),
    )
    scored = q.join(c, bucket_col).select(
        query_id,
        cand_id,
        F.round(
            _dot(F.col("_qvec"), F.col("_cvec")).cast("double")
            / F.sqrt(F.col("_qn2") * F.col("_cn2")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc(cand_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", cand_id, "cosine")
    )


def hyperplane_bucket(vec: Column, dim: int = 64, n_planes: int = 16) -> Column:
    """Deterministic random-hyperplane sign bucket for a vector.

    Hyperplane h_p component i = sin(p·1009 + i·9973) — a fixed, engine-
    portable pseudo-random direction (no rand(): determinism contract).
    Bucket = integer whose bit p is sign(<v, h_p>)."""
    bits = []
    for p in range(n_planes):
        comps = F.array(*[F.lit(p * 1009 + i * 9973) for i in range(dim)])
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, s: x.cast("double") * F.sin(s)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_neighbor_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    cosine_threshold: float = 0.8,
    exact_decimal: bool = False,
) -> DataFrame:
    """All-pairs near-neighbor search via hyperplane-LSH banding.

    Bucket bits are split into ``bands`` chunks; pairs sharing any chunk are
    candidates, then verified with exact cosine ≥ threshold.  Join is equi on
    (band_id, chunk) — sub-quadratic as long as buckets stay balanced (the
    hyperplanes are fixed; at production scale use learned/orthogonal planes
    per dataset)."""
    r = n_planes // bands
    with_bucket = ensure_parallelism(df).select(
        F.col(id_col), F.col(vec_col), hyperplane_bucket(F.col(vec_col), dim, n_planes).alias("_bucket")
    )
    chunks = with_bucket.select(
        id_col,
        vec_col,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("_bucket"), r * i).bitwiseAND(F.lit((1 << r) - 1))
                    for i in range(bands)
                ]
            )
        ).alias("band_id", "chunk"),
    )
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "band_id", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "band_id", "chunk"
    )
    return (
        a.join(b, ["band_id", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn(
            "cosine",
            F.round(_paired_cosine(exact_decimal, F.col("_va"), F.col("_vb")), 6),
        )
        .where(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", "cosine")
    )
