"""Declared queries: text analysis (SURVEY.md §2.11 X5-X6; north-star text
ops over the ``documents`` table).

The per-document scalar analyses (token stats, quality score, fingerprint,
subword count, language ID) are all narrow projections of ``documents`` at
doc_id grain, so they are declared as ONE suite query — each column is its
own operator from functions/text.py, each with its DuckDB twin, merged to
fit the driver's 50-query correctness budget.  The aggregate-grain routing
distribution stays separate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.functions import text as TX
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T

_STOP_SQL = "('the','a','of','and','to','in','is','on','for','with')"

_MARKER_SQL = {
    "en": "('the','a','of','and','to')",
    "de": "('der','die','und','das','ist')",
    "fr": "('le','la','et','les','des')",
    "es": "('el','la','de','y','que')",
}


def _du_count(lang: str) -> str:
    return (
        f"len(list_filter(string_split_regex(text, '\\s+'), t -> t IN {_MARKER_SQL[lang]}))"
    )


@query(
    "x5_x6_text_suite",
    rf"""
    WITH scored AS (
      SELECT doc_id, lang, text, n_chars,
        {_du_count('de')} AS c_de, {_du_count('en')} AS c_en,
        {_du_count('es')} AS c_es, {_du_count('fr')} AS c_fr
      FROM documents
    )
    SELECT doc_id, n_chars,
           len(string_split_regex(text, '\s+')) AS n_tokens,
           len(list_filter(string_split_regex(text, '\s+'), t -> t IN {_STOP_SQL})) AS n_stopwords,
           CAST(ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE) / len(string_split_regex(text, '\s+')), 4) AS DOUBLE) AS avg_token_len,
           CAST(ROUND(CAST(
             LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
             + LEAST((CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t IN {_STOP_SQL})) AS DOUBLE)
                      / len(string_split_regex(text, '\s+'))) * 5.0, 1.0) * 0.3
             + (1.0 - CAST(LENGTH(regexp_replace(text, '[^!-/:-@\[-`{{-~]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)) * 0.3
           AS DECIMAL(10,5)), 4) AS DOUBLE) AS quality,
           SHA256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
           len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+')) AS n_subwords,
           lang AS labeled_lang,
           CASE WHEN GREATEST(c_de, c_en, c_es, c_fr) = 0 THEN 'und'
                WHEN c_de >= GREATEST(c_en, c_es, c_fr) AND c_de > 0 THEN 'de'
                WHEN c_en >= GREATEST(c_es, c_fr) AND c_en > 0 THEN 'en'
                WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
                ELSE 'fr' END AS guessed_lang
    FROM scored ORDER BY doc_id
    """,
    survey_rows=("X5", "X6", "F7"),
)
def x5_x6_text_suite(spark, sf_dir):
    """Per-document text-analysis suite, one narrow whole-stage-codegen'd
    projection — all JVM expressions (regexp / split / higher-order
    functions), zero Python UDFs:

    - token counting (whitespace tokenizer) + stopword counts,
    - heuristic quality score (C4/Gopher-style length + stopword +
      punctuation signals),
    - sha256 fingerprint over normalized text (the exact-dedup key at scale),
    - BPE-ish subword pre-token count (GPT-2-shaped regex, no merges),
    - stopword-marker language ID: argmax of per-language marker counts with
      deterministic first-wins tie-break — the in-engine stand-in for a
      fastText-style classifier.

    At 100 TB this pipelines with the parquet scan: one pass, no shuffle."""
    (documents,) = T(spark, sf_dir, "documents")
    toks = TX.tokens(F.col("text"))
    return (
        documents.select(
            "doc_id",
            "n_chars",
            F.size(toks).alias("n_tokens"),
            TX.count_in_set(F.col("text"), TX.STOPWORDS).alias("n_stopwords"),
            F.round(
                F.length(F.regexp_replace("text", " ", "")).cast("double")
                / F.size(toks),
                4,
            ).alias("avg_token_len"),
            TX.quality_score(F.col("text")).alias("quality"),
            TX.fingerprint(F.col("text")).alias("fingerprint"),
            TX.n_subword_tokens(F.col("text")).alias("n_subwords"),
            F.col("lang").alias("labeled_lang"),
            TX.lang_guess(F.col("text")).alias("guessed_lang"),
        )
        .orderBy("doc_id")
    )


@query(
    "x6_lang_distribution",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS DOUBLE) AS avg_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
    survey_rows=("X6",),
)
def x6_lang_distribution(spark, sf_dir):
    """Language/source routing distribution — the partition-by-lang shape
    (at scale: write partitioned by lang, partition-pruned reads)."""
    (documents,) = T(spark, sf_dir, "documents")
    return (
        documents.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 2).alias(
                "avg_chars"
            ),
        )
        .orderBy("lang", "source")
    )
