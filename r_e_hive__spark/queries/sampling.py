"""Declared query: deterministic sampling / domain mixture (SURVEY.md §2.11
X15).

One suite query pins the whole sampling surface: ``mixture_resample``
(counts → scale → per-domain keep fractions → stateless hash filter) and
``split_corpus`` (disjoint train/val/test from a salted second uniform).
The DuckDB oracle replays EVERY step — domain counts, the min-scale
aggregate, the keep-fraction arithmetic, the md5-hex uniform, and the
split bounds — so the statement checked is "the sampling decisions are
bit-identical", not "about the right number of rows survived".

md5 is the cross-engine anchor: Spark's ``conv(substr(md5(k),1,8),16,10)``
and DuckDB's ``CAST('0x' || substr(md5(k),1,8) AS BIGINT)`` agree exactly
(pinned in tests/test_sampling.py), and all fraction arithmetic is IEEE
double with identical expression trees on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators import sampling as SA
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T

# Target language mixture for the declared query (corpus is en-heavy;
# zh is deliberately under-weighted so several distinct keep fractions —
# including the binding domain's 1.0 — are exercised).
_WEIGHTS = {"de": 0.2, "en": 0.3, "es": 0.2, "fr": 0.2, "zh": 0.1}
_MIX_SALT = "x15mix"
_SPLIT_SALT = "x15split"
_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}

_W_VALUES = ", ".join(f"('{d}', {w})" for d, w in sorted(_WEIGHTS.items()))

_DU_U = (
    "(CAST(concat('0x', substr(md5(concat(CAST({key} AS VARCHAR), '{salt}')), 1, 8)) AS BIGINT)"
    " / 4294967296.0)"
)


def _split_case(u_expr: str) -> str:
    """CASE arms from the SAME Python prefix sums split_corpus uses —
    0.8 + 0.1 is 0.9000000000000001 in IEEE double, so hardcoding 0.9
    here would diverge at the boundary."""
    arms, lo = [], 0.0
    names = list(_SPLITS)
    for name in names[:-1]:
        lo += _SPLITS[name]
        arms.append(f"WHEN {u_expr} < {lo!r} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def _oracle() -> str:
    u_mix = _DU_U.format(key="d.doc_id", salt=_MIX_SALT)
    u_split = _DU_U.format(key="doc_id", salt=_SPLIT_SALT)
    return f"""
    WITH w(lang, weight) AS (VALUES {_W_VALUES}),
    counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    per AS (
      SELECT c.lang, c.n, CAST(w.weight AS DOUBLE) AS weight
      FROM counts c JOIN w ON w.lang = c.lang
    ),
    scl AS (SELECT MIN(CAST(n AS DOUBLE) / weight) AS scale FROM per),
    fr AS (
      SELECT lang,
             LEAST(CAST(1.0 AS DOUBLE), weight * scale / CAST(n AS DOUBLE)) AS keep_frac
      FROM per CROSS JOIN scl
    ),
    kept AS (
      SELECT d.doc_id, d.lang, d.source
      FROM documents d JOIN fr ON fr.lang = d.lang
      WHERE {u_mix} < fr.keep_frac
    )
    SELECT doc_id, lang, source,
           {_split_case(u_split)} AS split
    FROM kept ORDER BY doc_id
    """


@query(
    "x15_mixture_split_sample",
    _oracle(),
    survey_rows=("X15",),
)
def x15_mixture_split_sample(spark, sf_dir):
    """Domain-mixture resample to a target language mix, then disjoint
    train/val/test assignment — both decisions stateless per-row hash
    filters (no rand(), no shuffle on the data path; the only aggregate
    touches K=5 domain-count rows).  At 100 TB the keep/drop and split
    predicates fuse into the parquet scan; the sample is reproducible
    under any partitioning, which ``df.sample`` cannot promise."""
    (documents,) = T(spark, sf_dir, "documents")
    kept = SA.mixture_resample(
        documents, "lang", "doc_id", _WEIGHTS, salt=_MIX_SALT
    ).select("doc_id", "lang", "source")
    return kept.withColumn(
        "split", SA.split_label(F.col("doc_id"), _SPLITS, salt=_SPLIT_SALT)
    ).orderBy("doc_id")
