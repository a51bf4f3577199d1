"""Document-quality operators (SURVEY.md §2.11 X16).

The scalar repetition expressions in functions/text.py cost
O(distinct·total) per document for the mode count — perfect for typical
web documents, quadratic-ish for pathological monsters (machine-generated
logs, concatenated dumps).  This module provides the distributed twin:
explode n-grams, aggregate per (doc, gram) with map-side combine, then
per-doc — one shuffle keyed by (doc_id, gram), each reducer row O(1).
Same outputs, pinned equal to the scalar form in tests/test_sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from r_e_hive__spark.functions.text import word_ngrams


def repetition_stats_grouped(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document repetition stats via explode + two-level aggregation:

    returns (id_col, n_grams, n_distinct, dup_frac, top_frac) with the
    exact semantics of functions/text.py's scalar dup_ngram_fraction /
    top_ngram_fraction (documents with < n tokens report 0 grams and 0.0
    fractions).

    Scale shape: stage 1 groupBy(doc, gram) gets map-side partial counts
    (each input partition emits at most its distinct grams), stage 2
    reduces #distinct-gram rows per doc.  No row ever holds a whole
    document's gram array, so a 10⁷-token document costs memory O(1) per
    task instead of O(doc²) — this is the variant to use when documents
    are unbounded.
    """
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_gram")
    )
    per_gram = grams.groupBy(id_col, "_gram").agg(F.count("*").alias("_c"))
    per_doc = per_gram.groupBy(id_col).agg(
        F.sum("_c").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.max("_c").alias("_mode"),
    )
    stats = per_doc.select(
        id_col,
        "n_grams",
        "n_distinct",
        (1.0 - F.col("n_distinct").cast("double") / F.col("n_grams")).alias(
            "dup_frac"
        ),
        (F.col("_mode").cast("double") / F.col("n_grams")).alias("top_frac"),
    )
    # documents with < n tokens have no exploded rows: restore them with
    # the scalar form's zero stats
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce("dup_frac", F.lit(0.0)).alias("dup_frac"),
            F.coalesce("top_frac", F.lit(0.0)).alias("top_frac"),
        )
    )


def host_of(url) -> Column:
    """Registrable host of a URL column, lowercased — Spark's built-in
    ``try_parse_url`` (JVM, codegen'd; NULL for malformed URLs rather
    than an ANSI INVALID_URL error), no UDF.  A trailing root-label dot
    (``example.com.`` — the absolute-FQDN form, the classic blocklist
    evasion) is stripped so the host matches its blocklist entry."""
    return F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"\.+$", ""
    )


def filter_blocklist(
    df: DataFrame,
    url_col: str,
    blocked_domains,
    include_subdomains: bool = True,
) -> DataFrame:
    """Drop rows whose URL host is on a domain blocklist — the standard
    source-level curation gate (spam/adult/SEO domains) every web-corpus
    pipeline runs before content filters.

    The blocklist ships as a broadcast frame (it is a parameter-sized
    list, thousands to millions of domains — far under executor memory);
    matching is an equi-join on the host, plus, with
    ``include_subdomains``, on every parent suffix of the host (a host
    has ≤ label-count suffixes, so the explode is bounded and tiny).
    One broadcast anti-join, no shuffle of the corpus — at 100 TB this
    is a map-side filter like every other gate here.  Rows with
    unparseable/NULL hosts are KEPT (a blocklist removes known-bad, it
    does not require well-formedness — compose with a validity filter if
    malformed URLs should also go).
    """
    spark = df.sparkSession
    bl = spark.createDataFrame(
        [(d.lower().rstrip("."),) for d in blocked_domains], "_blocked string"
    )
    host = host_of(F.col(url_col))
    if not include_subdomains:
        # exact-host mode is ONE map-side broadcast anti-join — no probe,
        # no join-back (anti-join NULL semantics keep unparseable hosts)
        return df.join(
            F.broadcast(bl), host == bl["_blocked"], "left_anti"
        )
    # explode the host into its dot-suffixes: a.b.co -> [a.b.co, b.co, co];
    # the split-host array is let-bound so the URL parses once per row,
    # not once per suffix (interpreted-HOF re-evaluation — see bind_once)
    from r_e_hive__spark.functions.text import bind_once

    suffixes = bind_once(
        F.split(host, r"\."),
        lambda parts: F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
        ),
    )
    probe = df.select(
        F.col(url_col).alias("_u"), F.explode(suffixes).alias("_h")
    )
    # duplicate _u rows are harmless to the anti-join — no distinct needed.
    # bad_urls is the MATCHED slice (sparse in any real corpus); AQE's
    # runtime size check turns the anti-join into a broadcast-hash anti,
    # so the corpus itself still does not shuffle.
    bad_urls = probe.join(
        F.broadcast(bl), probe["_h"] == bl["_blocked"], "left_semi"
    ).select(F.col("_u").alias(url_col))
    return df.join(bad_urls, url_col, "left_anti")


def percentile_gate(
    df: DataFrame,
    score_col: str,
    keep_fraction: float,
    group_cols=(),
    strategy: str = "approx",
    accuracy: int = 10000,
    distributed: bool | None = None,
) -> DataFrame:
    """Keep the best ``keep_fraction`` of rows by ``score_col`` (higher is
    better), optionally per group — the percentile quality cut every
    curation pipeline applies after scoring (CCNet's perplexity terciles,
    "keep the top 30 % by quality_score per language").  NULL scores are
    always dropped (an unscorable document cannot be in any top fraction).

    Two strategies, same contract, different scale shapes:

    - ``"exact"`` — ``percent_rank`` over (score desc) per group: rows
      ranked strictly; ties at the boundary are kept together (they share
      a percent_rank), so the kept count can exceed the exact fraction by
      the tie-group size.  One shuffle + full sort PER GROUP.  The
      KEYLESS case no longer degrades to a single-partition global sort
      (round-5 VERDICT item 7): unless ``distributed=False``, it
      range-partitions on (score desc) — equal scores land in ONE
      partition by construction, so tie groups never split — ranks
      within each range partition, and adds the tiny per-partition
      offset (one row per partition, the weighted_prefix_sum /
      keyless-as-of two-phase shape); global rank = offset + local rank
      reproduces percent_rank's tie semantics exactly (parity-pinned).
      ``distributed=True`` on a grouped gate is invalid (per-group
      windows already parallelize).
    - ``"approx"`` — the 100 TB shape: per-group score thresholds from
      ``approx_percentile`` (one map-side-combined aggregation producing
      K tiny rows), broadcast back, then a MAP-SIDE ``score >= threshold``
      filter.  No sort, no per-row shuffle.  The boundary is as sharp as
      the sketch (``accuracy`` trades memory for error — at the default,
      ±1/10000 of rank): a few boundary rows may be kept or dropped
      relative to the exact gate, which is the standard, documented trade
      for corpus-scale percentile filters.

    Both strategies cut on a SCORE boundary (exact: the shared
    percent_rank of a tie group; approx: the sketch quantile), so
    equal-score ties are never split arbitrarily (determinism contract) —
    the kept set is a deterministic function of the data, not of
    partitioning or row order.

    Laziness caveat (round-6 ADVICE): the keyless exact DISTRIBUTED path
    materializes eagerly at call time — ``repartitionByRange`` samples
    the input to pick range bounds and the ``localCheckpoint(eager=True)``
    that pins those bounds for the two consuming subtrees runs a job
    immediately.  Callers composing the gate into a larger plan that must
    stay lazy (plan-construction purity, streaming foreachBatch bodies)
    should pass ``distributed=False`` to keep the single-partition lazy
    window form; every other path (grouped exact, approx) builds a lazy
    plan as usual.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(
            f"keep_fraction must be in (0, 1], got {keep_fraction}"
        )
    if strategy not in ("exact", "approx"):
        # validate BEFORE the fraction==1.0 early return: a config typo
        # must not survive the no-op sweep point (round-5 code review)
        raise ValueError(f"unknown strategy {strategy!r}")
    gcols = list(group_cols)
    if distributed and (gcols or strategy != "exact"):
        raise ValueError(
            "distributed=True applies only to the keyless exact case "
            "(per-group windows parallelize; approx is map-side already)"
        )
    scored = df.where(F.col(score_col).isNotNull())
    if keep_fraction == 1.0:
        return scored
    if strategy == "exact":
        from pyspark.sql.window import Window

        if gcols or distributed is False:
            w = Window.partitionBy(*gcols).orderBy(F.desc(score_col))
            return (
                scored.withColumn("_pr", F.percent_rank().over(w))
                .where(F.col("_pr") <= F.lit(keep_fraction))
                .drop("_pr")
            )
        # keyless distributed exact: range-partition on (score desc) —
        # the range partitioner puts EQUAL scores in one partition, so a
        # tie group never straddles a boundary — rank within partitions,
        # carry tiny per-partition offsets (one row each), and total n
        # rides on the same frame; percent_rank == (rank-1)/(n-1) with
        # tie-shared rank, reproduced exactly.  localCheckpoint pins the
        # sampled range bounds for the two consuming subtrees (the
        # keyless-as-of discipline, operators/temporal.py).  EXPLICIT
        # numPartitions: an argless repartitionByRange is AQE-coalesced
        # to 1 task on small shuffle bytes — the single-partition sort
        # this path exists to avoid (the recorded round-5 lesson).
        n_part = scored.sparkSession.sparkContext.defaultParallelism
        ranged = scored.repartitionByRange(
            n_part, F.col(score_col).desc()
        ).localCheckpoint(eager=True)
        with_pid = ranged.withColumn("_pg_pid", F.spark_partition_id())
        w_all = Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        w_off = Window.orderBy("_pg_pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = (
            with_pid.groupBy("_pg_pid")
            .agg(F.count("*").alias("_pg_c"))
            .withColumn(
                "_pg_off", F.coalesce(F.sum("_pg_c").over(w_off), F.lit(0))
            )
            .withColumn("_pg_n", F.sum("_pg_c").over(w_all))
            .drop("_pg_c")
        )
        w_local = Window.partitionBy("_pg_pid").orderBy(F.desc(score_col))
        rk = F.col("_pg_off") + F.rank().over(w_local)
        pr = F.when(
            F.col("_pg_n") > 1,
            (rk - 1).cast("double") / (F.col("_pg_n") - 1).cast("double"),
        ).otherwise(F.lit(0.0))
        return (
            with_pid.join(F.broadcast(offsets), "_pg_pid")
            .withColumn("_pg_pr", pr)
            .where(F.col("_pg_pr") <= F.lit(keep_fraction))
            .drop("_pg_pid", "_pg_off", "_pg_n", "_pg_pr")
        )
    q = F.lit(1.0 - keep_fraction)
    thr_expr = F.approx_percentile(F.col(score_col), q, F.lit(accuracy)).alias(
        "_thr"
    )
    if gcols:
        # NULL-SAFE group join: groupBy keeps a NULL-keyed group in `thr`,
        # but a plain equality join never matches NULL==NULL — rows with a
        # NULL group key (e.g. unknown language) would silently vanish
        # instead of being gated like the exact strategy gates them
        # (round-5 code review, verified divergence)
        thr = F.broadcast(
            scored.groupBy(*gcols).agg(thr_expr).select(
                *[F.col(g).alias(f"_g_{g}") for g in gcols], "_thr"
            )
        )
        cond = None
        for g in gcols:
            c = F.col(g).eqNullSafe(F.col(f"_g_{g}"))
            cond = c if cond is None else cond & c
        return (
            scored.join(thr, cond, "inner")
            .where(F.col(score_col) >= F.col("_thr"))
            .drop("_thr", *[f"_g_{g}" for g in gcols])
        )
    thr = scored.agg(thr_expr)
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def corpus_report(
    df: DataFrame,
    text_col: str,
    group_cols=("source", "lang"),
) -> DataFrame:
    """One-pass data card: the per-slice corpus statistics every dataset
    release publishes (and every curation run eyeballs before/after each
    gate).  Per group: document/token counts, token-length mean and
    exact p50/p90, mean quality score, and the exact-duplicate fraction
    (1 − distinct normalized fingerprints / docs — the X1 definition).

    ONE groupBy over one map-side projection: counts/sums/percentiles and
    the distinct-fingerprint count all aggregate in the same shuffle
    (count_distinct plans as a two-phase partial-distinct aggregate, no
    extra pass over the corpus).  Sorted by group for deterministic
    display; NULL group keys report as their own slice (groupBy keeps
    them — the percentile_gate lesson).

    At 100 TB this is exactly one corpus scan; swap ``F.percentile`` for
    ``F.percentile_approx`` if exact per-group sort-based percentiles
    ever dominate (they are per-group, not global, so group cardinality
    bounds the state).
    """
    from r_e_hive__spark.functions.text import fingerprint, n_tokens, quality_score

    gcols = list(group_cols)
    prepared = df.select(
        *gcols,
        n_tokens(F.col(text_col)).alias("_nt"),
        quality_score(F.col(text_col)).alias("_q"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    # Means via exact integer accumulators, rounded HALF_UP in integer
    # arithmetic: round(S/n, 4) == (2·S·10⁴ + n) intdiv (2·n) over exact
    # longs.  F.avg would sum doubles in partition order (4th decimal
    # partitioning-dependent), and ROUND(double, 4) itself is
    # engine-dependent ON ties — Spark rounds the shortest decimal
    # rendering (0.57505 → 0.5751) where DuckDB rounds the binary value
    # (0.57504999… → 0.575); measured on the sf0.01 fixture.  Integer
    # arithmetic sidesteps both (determinism contract §2.12 rule 3).
    # _q is an exact 4-dp value by quality_score's contract, so
    # decimal(14,4)·10⁴ → long is lossless.
    def _avg4(sum_col: str, cnt_col: str) -> Column:
        # PRECONDITION: S >= 0.  The HALF_UP identity round(S/n, 4) ==
        # (2·S·10⁴ + n) DIV (2·n) holds only for non-negative sums —
        # Spark's DIV truncates toward ZERO, so a negative S would round
        # toward zero instead of HALF_UP (ADVICE r8).  Fine here: token
        # counts and quality scores in [0,1] are non-negative by contract;
        # do NOT reuse on signed metrics without a sign-split.
        # (2·S·10⁴ + n) DIV (2·n), then /10⁴ — exact integer arithmetic
        # end to end: the accumulator is DECIMAL(38,0) (exact to 10^38,
        # i.e. ~10^33 tokens per group — int64 would cap the sum at
        # ~9·10^14 tokens/group, reachable for a PB-scale slice), and
        # Spark's DIV on decimals is exact integral division returning
        # BIGINT, which only needs to hold the QUOTIENT (avg·10⁴ ≤
        # max-per-doc·10⁴ — always fits).  NULL when the group has no
        # non-NULL inputs, matching F.avg.
        return F.when(
            F.col(cnt_col) > 0,
            F.expr(
                f"(2 * {sum_col} + {cnt_col}) DIV (2 * {cnt_col})"
            ).cast("double")
            / F.lit(10000.0),
        )

    return (
        prepared.groupBy(*gcols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").alias("n_tokens"),
            F.sum(F.col("_nt").cast("decimal(28,0)") * 10000).alias("_nt10k"),
            F.count("_nt").alias("_c_nt"),
            F.sum(
                (F.col("_q").cast("decimal(14,4)") * 10000).cast("decimal(28,0)")
            ).alias("_q10k"),
            F.count("_q").alias("_c_q"),
            F.percentile("_nt", 0.5).alias("p50_tokens"),
            F.percentile("_nt", 0.9).alias("p90_tokens"),
            # dup fraction among FINGERPRINTABLE docs: count_distinct
            # skips NULL fingerprints (NULL text), so dividing by count(*)
            # would report an all-NULL-text slice as 100% duplicates
            F.when(
                F.count("_fp") > 0,
                F.lit(1.0) - F.count_distinct(F.col("_fp")) / F.count("_fp"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
        .withColumn("avg_tokens", _avg4("_nt10k", "_c_nt"))
        .withColumn("avg_quality", _avg4("_q10k", "_c_q"))
        .select(
            *gcols,
            "n_docs",
            "n_tokens",
            "avg_tokens",
            "p50_tokens",
            "p90_tokens",
            "avg_quality",
            "dup_fraction",
        )
        .orderBy(*gcols)
    )
