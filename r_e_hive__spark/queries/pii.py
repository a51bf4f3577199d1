"""Declared query: PII detection & redaction (SURVEY.md §2.11 X18).

The fixture corpus is a synthetic word-soup with no PII, so the query
plants deterministic identifiers derived from ``doc_id`` (emails on
doc_id%3=0, phones on %5, IPv4 on %7, card numbers on %11 — several rows
get multiple kinds, most get none) with the SAME concat expression on both
engines, then detects and redacts.  What the differential pins is the
regex machinery: pattern semantics in the Java∩RE2 subset, counts on the
un-redacted text, and the full redaction chain output string.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.functions import pii as P
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T


def _spark_pii_text():
    d = F.col("doc_id")
    s = d.cast("string")
    return F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.concat(F.lit(" reach user"), s, F.lit("@example.com"))).otherwise(""),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" from 10."), (d % 256).cast("string"), F.lit(".0.1")),
        ).otherwise(""),
        F.when(
            d % 11 == 0,
            F.concat(F.lit(" card 4242 4242 4242 "), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(""),
    )


_DU_PII_TEXT = """concat(text,
  CASE WHEN doc_id % 3 = 0 THEN concat(' reach user', CAST(doc_id AS VARCHAR), '@example.com') ELSE '' END,
  CASE WHEN doc_id % 5 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END,
  CASE WHEN doc_id % 7 = 0 THEN concat(' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1') ELSE '' END,
  CASE WHEN doc_id % 11 = 0 THEN concat(' card 4242 4242 4242 ', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) ELSE '' END)"""


def _oracle() -> str:
    t = "pii_text"
    return f"""
    WITH planted AS (
      SELECT doc_id, {_DU_PII_TEXT} AS pii_text FROM documents
    )
    SELECT doc_id,
           {P.du_pii_count(t, 'email')} AS n_email,
           {P.du_pii_count(t, 'phone')} AS n_phone,
           {P.du_pii_count(t, 'ipv4')} AS n_ipv4,
           {P.du_pii_count(t, 'card')} AS n_card,
           {P.du_pii_count(t, 'email')} + {P.du_pii_count(t, 'card')}
             + {P.du_pii_count(t, 'phone')} + {P.du_pii_count(t, 'ipv4')} AS n_pii,
           {P.du_redact(t)} AS redacted
    FROM planted ORDER BY doc_id
    """


@query(
    "x18_pii_redaction",
    _oracle(),
    survey_rows=("X18",),
)
def x18_pii_redaction(spark, sf_dir):
    """PII scrub pass: per-kind match counts + total on the raw text, and
    the fully redacted text ([EMAIL]/[CARD]/[PHONE]/[IP] tokens, fixed
    chain order).  Pure regexp_extract_all / regexp_replace — one
    codegen'd projection, no shuffle; at 100 TB this is a map-only pass
    that pipelines with the scan, which is exactly what a pre-training
    scrub must be."""
    (documents,) = T(spark, sf_dir, "documents")
    planted = documents.select("doc_id", _spark_pii_text().alias("pii_text"))
    t = F.col("pii_text")
    return (
        planted.select(
            "doc_id",
            P.pii_count(t, "email").alias("n_email"),
            P.pii_count(t, "phone").alias("n_phone"),
            P.pii_count(t, "ipv4").alias("n_ipv4"),
            P.pii_count(t, "card").alias("n_card"),
            P.pii_total(t).alias("n_pii"),
            P.redact(t).alias("redacted"),
        )
        .orderBy("doc_id")
    )
