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

from pyspark.sql import DataFrame, functions as F

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


def host_of(url):
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
    # explode the host into its dot-suffixes: a.b.co -> [a.b.co, b.co, co]
    parts = F.split(host, r"\.")
    n = F.size(parts)
    suffixes = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
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
