"""Deterministic sampling & domain-mixture operators (SURVEY.md §2.11 X15).

Training-data pipelines constantly re-sample corpora: hold-out splits,
per-domain quality tiers, and — the big one — *mixture rebalancing* (give
the model 30% web, 20% code, … regardless of raw corpus skew).  At 100 TB
the only acceptable plan is a **stateless filter**: a pseudo-random but
deterministic keep/drop decision computed per row from a hash of a stable
key, so

- the sample is reproducible across runs, engines, and partitionings
  (unlike ``df.sample``, whose output depends on partition layout),
- no shuffle, no state, no driver coordination — it fuses into the scan
  and survives any scale-up,
- disjoint samples compose: ``u`` is a uniform in [0,1), so
  ``u < 0.1`` (train-holdout) and ``0.1 <= u < 0.2`` (validation) are
  disjoint by construction.

The uniform is the first 8 hex digits of ``md5(key || salt)`` read as a
32-bit integer — md5 is bit-identical in Spark and DuckDB, which is what
makes the full differential oracle possible (see queries/sampling.py).
The reference has no sampling surface (it is an OLTP app); this is a
north-star extension operator.

Mixture resampling is two-pass: one tiny aggregate (K domain counts — a
broadcastable dict, NOT a collect of data rows), then the same stateless
filter with a per-domain threshold.  The achievable corpus size is
maximized subject to (a) exact target proportions and (b) no upsampling:
``scale = min_d(count_d / weight_d)``, keep ``weight_d * scale`` rows of
domain ``d``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F

# 2^32 — the hash-uniform denominator.
_U_DENOM = 4294967296.0


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): first 8 hex digits of
    ``md5(key || salt)`` as a 32-bit int, divided by 2^32.

    Pure JVM expression chain (md5 → substring → conv → cast) — whole-stage
    codegen, no UDF, no rand().  DuckDB twin:
    ``CAST(concat('0x', substr(md5(key || salt), 1, 8)) AS BIGINT)
    / 4294967296.0`` (parity pinned in tests/test_sampling.py).
    """
    keyed = key.cast("string")
    if salt:
        keyed = F.concat(keyed, F.lit(salt))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("bigint").cast("double")
        / F.lit(_U_DENOM)
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a reproducible ~``fraction`` of rows: ``u(key) < fraction``.

    A pure filter — at 100 TB this pipelines into the parquet scan with
    zero shuffle.  ``salt`` decorrelates independent samples drawn from the
    same key space.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.where(hash_uniform(F.col(key_col), salt) < F.lit(float(fraction)))


def split_label(
    key: Column, fractions: Mapping[str, float], salt: str = ""
) -> Column:
    """Split name for each row — ONE CASE expression over one uniform,
    with prefix-sum bounds: split *i* is ``lo_i <= u < hi_i``.

    This is the single-pass form: labeling N splits costs one projection,
    not N filtered scans.  Rows beyond the last bound (when fractions sum
    to < 1) get NULL — drop them or treat NULL as "unassigned".
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("negative split fraction")
    u = hash_uniform(key, salt)
    label: Column = F.lit(None).cast("string")
    hi = 0.0
    bounds = []
    for name, frac in fractions.items():
        hi += frac
        bounds.append((name, hi))
    for name, bound in reversed(bounds):
        label = F.when(u < F.lit(bound), F.lit(name)).otherwise(label)
    return label


def split_corpus(
    df: DataFrame, key_col: str, fractions: Mapping[str, float], salt: str = ""
) -> dict[str, DataFrame]:
    """Disjoint deterministic splits (train/val/test) as one frame per
    split, derived from :func:`split_label` so both APIs share one
    boundary definition.  Fractions must sum to <= 1.

    Prefer :func:`split_label` + a partitioned write when all splits are
    consumed together — N filtered frames mean N scans if materialized
    independently.
    """
    label = split_label(F.col(key_col), fractions, salt)
    return {name: df.where(label == F.lit(name)) for name in fractions}


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ``u(key) < fractions[s]`` (strata not listed keep ``default_fraction``).

    The deterministic twin of ``df.sampleBy`` — same plan shape (filter on
    a CASE expression), but reproducible under repartitioning.
    """
    frac_expr: Column = F.lit(float(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum {stratum!r} out of [0,1]")
        frac_expr = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(float(frac))
        ).otherwise(frac_expr)
    return df.where(hash_uniform(F.col(key_col), salt) < frac_expr)


def mixture_fractions(
    counts: Mapping[str, int], target_weights: Mapping[str, float]
) -> dict[str, float]:
    """Per-domain keep fractions that hit ``target_weights`` exactly (in
    expectation) without upsampling, maximizing total kept rows.

    ``scale = min_d(count_d / weight_d)`` is the largest corpus size at
    which every domain can still supply its share from existing rows; the
    binding domain keeps fraction 1.0.  Domains absent from
    ``target_weights`` (or with weight 0) are dropped entirely.
    Driver-side math over K domain counts — K is small (domains, not rows).
    """
    weights = {d: w for d, w in target_weights.items() if w > 0}
    missing = [d for d in weights if counts.get(d, 0) <= 0]
    if missing:
        raise ValueError(f"target domains with no rows in corpus: {missing}")
    scale = min(counts[d] / w for d, w in weights.items())
    return {d: min(1.0, w * scale / counts[d]) for d, w in weights.items()}


def mixture_resample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_weights: Mapping[str, float],
    salt: str = "",
) -> DataFrame:
    """Rebalance a skewed corpus to ``target_weights`` over ``domain_col``.

    Fully in-plan (no driver round-trip): (1) one tiny map-side-combined
    groupBy produces K domain counts; (2) ``scale = min(count/weight)``
    is a one-row aggregate over those K rows; (3) per-domain keep
    fractions ``least(1, weight*scale/count)`` broadcast-join back onto
    the corpus, which is filtered by the stateless hash-uniform.  The
    only shuffle touches K rows; the keep/drop pass fuses into the scan.
    Same no-upsampling/exact-proportions contract as
    :func:`mixture_fractions`.
    """
    weights = {d: float(w) for d, w in target_weights.items() if w > 0}
    if not weights:
        raise ValueError("target_weights has no positive entries")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        sorted(weights.items()), f"{domain_col} string, _weight double"
    )
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    # OUTER-preserve every target domain so a weight with zero corpus
    # rows fails LOUDLY at execution (mixture_fractions' ValueError,
    # in-plan form) instead of being silently dropped — an inner join
    # would rescale the remaining domains to a wrong mixture.  counts is
    # the broadcast side (K rows; a left-outer can only broadcast right).
    per_domain = wdf.join(F.broadcast(counts), domain_col, "left").select(
        domain_col,
        "_weight",
        F.when(
            F.assert_true(
                F.col("_n").isNotNull(),
                F.concat(
                    F.lit("mixture_resample: target domain has no rows: "),
                    F.col(domain_col),
                ),
            ).isNull(),
            F.col("_n"),
        ).alias("_n"),
    )
    scale = per_domain.agg(
        F.min(F.col("_n") / F.col("_weight")).alias("_scale")
    )
    fracs = per_domain.crossJoin(F.broadcast(scale)).select(
        domain_col,
        F.least(
            F.lit(1.0), F.col("_weight") * F.col("_scale") / F.col("_n")
        ).alias("_keep_frac"),
    )
    u = hash_uniform(F.col(key_col), salt)
    return (
        df.join(F.broadcast(fracs), domain_col, "inner")
        .where(u < F.col("_keep_frac"))
        .drop("_keep_frac")
    )


def deterministic_fixed_sample(
    df: DataFrame, key_col: str, n: int, salt: str = ""
) -> DataFrame:
    """Exactly-``n``-row deterministic sample: the n rows with the
    SMALLEST hash-uniform — a reservoir sample with the randomness
    replaced by the md5 order, so it is reproducible and composes with
    :func:`deterministic_sample` (it is always a subset of any
    fraction-sample whose cutoff exceeds these rows' uniforms).

    Plan shape: TakeOrderedAndProject (per-partition partial top-n,
    merge n·partitions rows on one reducer) — no full sort, no full
    shuffle; at 100 TB the driver-side merge sees n rows per partition,
    so keep n modest (samples, not exports).

    Contract (same as every hash-keyed sampler here): ``key_col`` must be
    a unique key.  With duplicate keys the SET of selected key values is
    still deterministic, but which physical row represents a duplicated
    key at the cutoff is partitioning-dependent (equal uniform AND equal
    tie-break) — dedupe first if keys can repeat.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    ucol = "_u"
    while ucol in df.columns:  # never clobber a caller's column
        ucol += "_"
    return (
        df.withColumn(ucol, hash_uniform(F.col(key_col), salt))
        .orderBy(ucol, key_col)
        .limit(n)
        .drop(ucol)
    )


def weighted_sample_n(
    df: DataFrame,
    key_col: str,
    weight_col: str | Column,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``n`` rows
    where a row's inclusion probability scales with its weight — the
    quality-weighted subsample every curation pipeline draws ("keep 1 M
    documents, preferring high quality_score") once scores exist (X5/X26/
    X28 outputs plug straight in).

    Efraimidis–Spirakis 2006 (public): assign each row the key
    ``u^(1/w)`` with ``u`` uniform in (0,1) and take the n LARGEST — the
    selection distributes exactly as sequential weighted draws without
    replacement.  ``u`` here is the engine's md5 hash-uniform, so the
    sample is a pure deterministic expression: reproducible under any
    partitioning, replayable in DuckDB SQL (same construction as every
    X15 sampler; ln(u)/w in log space for numeric stability —
    monotone-equivalent to u^(1/w)).

    Rows with NULL, NaN, zero, or negative weight are excluded (they
    have no sampling mass; NaN must be explicit — NaN > 0 is TRUE in
    Spark's ordering and ln(u)/NaN sorts FIRST under desc, so without
    the isnan guard garbage-scored rows would monopolize every sample;
    round-6 code review, reproduced).  NULL keys are excluded too: the
    md5 uniform of a NULL key is NULL, the E-S key comes out NULL and
    sorts LAST under desc, so a NULL-key row would otherwise be silently
    padded into any under-full sample with an arbitrary tiebreak
    (round-6 ADVICE) — and ``key_col`` must be unique anyway (the X15
    sampler contract), which NULL cannot satisfy.  Ties at the cutoff
    break on the key.  Scale: one
    TakeOrderedAndProject over a map-side expression — no shuffle beyond
    the top-n merge.

    Replay caveat (unlike the other X15 samplers, which use only exact
    arithmetic): the E-S key goes through ``ln``, so cross-engine replay
    is exact on this platform (pinned by test) but a key pair within
    1 ulp of the rank-n cutoff could in principle flip across
    libm/JVM builds — the same last-ulp caveat class as the numpy
    strategies.  Spark-side determinism (same data ⇒ same sample) is
    unconditional.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_uniform(F.col(key_col), salt)
    # log-space E-S key: ln(u)/w, larger is better (ln(u) < 0); u is never
    # 0 exactly (md5 uniform hits 0 only on one 32-bit value — guard it)
    es = F.log(F.greatest(u, F.lit(2.0 ** -32))) / w.cast("double")
    kcol = "_es"
    while kcol in df.columns:
        kcol += "_"
    wd = w.cast("double")
    return (
        df.where(
            F.col(key_col).isNotNull()
            & w.isNotNull()
            & ~F.isnan(wd)
            & (wd > 0)
        )
        .withColumn(kcol, es)
        .orderBy(F.desc(kcol), key_col)
        .limit(n)
        .drop(kcol)
    )
