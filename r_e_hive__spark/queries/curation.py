"""Declared query: the end-to-end corpus-curation pipeline (flagship
composite over the §2.11 training-data operators).

A large-scale LLM-pretraining data pipeline is exactly this composition:
quality filter → language routing → exact dedup → near-dup removal →
per-shard accounting.  Each stage reuses the already-pinned operator
(x5_quality_score / x6 routing / x1_exact_dedup / x2_ngram_jaccard), so the
oracle SQL below is the same expressions composed — one differential check
that the stages compose correctly, not just work in isolation.

Scale notes (SURVEY.md §4.2): every stage is a narrow projection, one hash
shuffle (dedup groupBy), or the inverted-index shingle join; nothing
collects to the driver, and the final accounting is a partial+final
aggregation over (lang, source) — at 100 TB the output writes partitioned
by lang with the near-dup stage swapped to MinHash-LSH (same interface,
minhash_lsh_pairs) once the pair space outgrows the exact join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.functions import text as TX
from r_e_hive__spark.operators import dedup as D
from r_e_hive__spark.queries import query
from r_e_hive__spark.queries._util import T
from r_e_hive__spark.queries.dedup import _DU_SHINGLES
from r_e_hive__spark.queries.text import _STOP_SQL

_LANGS = ("en", "de", "fr", "es")
_QUALITY_MIN = 0.5
_NEARDUP_J = 0.8

# DuckDB twin of functions.text.quality_score (same expression as the
# x5_quality_score oracle, inlined so this query stays self-contained).
_DU_QUALITY = f"""CAST(ROUND(CAST(
        LEAST(LENGTH(text) / 500.0, 1.0) * 0.4
        + LEAST((CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split_regex(text, '\\s+'))) * 5.0, 1.0) * 0.3
        + (1.0 - CAST(LENGTH(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) / GREATEST(LENGTH(text), 1)) * 0.3
      AS DECIMAL(10,5)), 4) AS DOUBLE)"""

_ORACLE = f"""
WITH kept AS (
  SELECT * FROM documents
  WHERE lang IN {str(_LANGS)}
    AND {_DU_QUALITY} >= {_QUALITY_MIN}
),
winners AS (
  SELECT MIN(doc_id) AS doc_id
  FROM kept
  GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
),
surv AS (
  SELECT k.* FROM kept k JOIN winners w ON k.doc_id = w.doc_id
),
documents_surv AS (SELECT doc_id, text FROM surv),
{_DU_SHINGLES.replace("WITH toks", "toks").replace("FROM documents", "FROM documents_surv")}
, pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
dropped AS (
  SELECT DISTINCT p.id_b AS doc_id
  FROM pairs p
  JOIN sizes na ON na.doc_id = p.id_a
  JOIN sizes nb ON nb.doc_id = p.id_b
  WHERE ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) >= {_NEARDUP_J}
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM surv
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
GROUP BY lang, source
ORDER BY lang, source
"""


@query(
    "pipeline_corpus_curation",
    _ORACLE,
    survey_rows=("X8", "X1", "X2", "X5", "X6"),
    doc="Quality filter -> lang routing -> exact dedup -> near-dup removal -> accounting.",
)
def pipeline_corpus_curation(spark, sf_dir):
    """Composite curation pipeline over ``documents``: heuristic quality
    gate, language allow-list, exact dedup (min-doc_id survivor per
    normalized text), greedy near-dup removal (drop the higher id of every
    3-gram-Jaccard ≥ 0.8 pair), then per-(lang, source) accounting."""
    (documents,) = T(spark, sf_dir, "documents")
    kept = documents.where(
        F.col("lang").isin(*_LANGS)
        & (TX.quality_score(F.col("text")) >= F.lit(_QUALITY_MIN))
    )
    winners = kept.groupBy(TX.normalize(F.col("text")).alias("_norm")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # surv feeds TWO consumers (the pair join and the final accounting) and
    # itself re-evaluates kept's regex-heavy quality filter: materialize it
    # so the quality scoring runs once per corpus scan, not once per
    # consumer (round-4 code review).  localCheckpoint, not persist(): its
    # blocks are ContextCleaner-owned and freed once the result frame is
    # garbage-collected, whereas a persist() here leaks a CacheManager
    # entry per call in a long-lived session (bench loops run each query
    # 5+ times — round-4 ADVICE).  Storage is the post-filter corpus — the
    # same frame a production pipeline would materialize between stages.
    surv = kept.join(winners.select("doc_id"), "doc_id", "left_semi").localCheckpoint(
        eager=False
    )
    pairs = D.ngram_jaccard_pairs(surv, "text", "doc_id", k=3, threshold=_NEARDUP_J)
    dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = surv.join(dropped, "doc_id", "left_anti")
    return (
        final.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# X26 — percentile quality gate (declared round 8 second wave; VERDICT r7
# "What's missing" item 3)
# ---------------------------------------------------------------------------

_GATE_BY_LANG = 0.3  # keep the top 30 % per language
_GATE_GLOBAL = 0.25  # keep the top 25 % corpus-wide


@query(
    "x26_percentile_gate",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars AS score FROM documents
      WHERE n_chars IS NOT NULL
    ), by_lang AS (
      SELECT doc_id, lang, score FROM (
        SELECT doc_id, lang, score,
               percent_rank() OVER (PARTITION BY lang ORDER BY score DESC) AS pr
        FROM scored
      ) WHERE pr <= {_GATE_BY_LANG}
    ), corpuswide AS (
      SELECT doc_id, lang, score FROM (
        SELECT doc_id, lang, score,
               percent_rank() OVER (ORDER BY score DESC) AS pr
        FROM scored
      ) WHERE pr <= {_GATE_GLOBAL}
    )
    SELECT 'by_lang' AS gate, doc_id, lang, CAST(score AS BIGINT) AS score FROM by_lang
    UNION ALL
    SELECT 'global' AS gate, doc_id, lang, CAST(score AS BIGINT) AS score FROM corpuswide
    ORDER BY gate, doc_id
    """,
    survey_rows=("X26",),
)
def x26_percentile_gate(spark, sf_dir):
    """Percentile quality cut (CCNet-style "keep the best fraction by
    score") in BOTH exact shapes of operators/quality.percentile_gate:
    per-language top 30 % (per-group percent_rank window — per-group
    parallelism is free) and corpus-wide top 25 % via the keyless
    DISTRIBUTED path — range-partition on (score desc) so equal scores
    co-locate, rank locally, add tiny per-partition offsets; global
    percent_rank reproduced without a single-partition sort (the
    weighted-prefix-sum two-phase shape that survives 100 TB).  The
    oracle replays both gates as plain percent_rank windows, so the
    distributed rank/offset/tie machinery is value-pinned cross-engine,
    including boundary ties (tie groups share a percent_rank and are
    kept or cut together — the determinism contract)."""
    from r_e_hive__spark.operators.quality import percentile_gate

    (documents,) = T(spark, sf_dir, "documents")
    scored = documents.where(F.col("n_chars").isNotNull()).select(
        "doc_id", "lang", F.col("n_chars").alias("score")
    )
    by_lang = percentile_gate(
        scored, "score", _GATE_BY_LANG, group_cols=["lang"], strategy="exact"
    )
    glob = percentile_gate(scored, "score", _GATE_GLOBAL, strategy="exact")
    return (
        by_lang.select(F.lit("by_lang").alias("gate"), "doc_id", "lang", "score")
        .unionByName(
            glob.select(F.lit("global").alias("gate"), "doc_id", "lang", "score")
        )
        .orderBy("gate", "doc_id")
    )


# ---------------------------------------------------------------------------
# X27 — corpus data card (declared round 8 second wave; VERDICT r7
# "What's missing" item 3)
# ---------------------------------------------------------------------------

_X27_DATA_CARD = f"""
    WITH per_doc AS (
      SELECT source, lang,
             len(string_split_regex(text, '\\s+')) AS nt,
             {_DU_QUALITY} AS q,
             sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           -- HALF_UP mean at 4 dp in exact integer arithmetic — the same
           -- (2·S·10⁴ + n) // (2·n) form the engine computes; ROUND(double)
           -- diverges between engines exactly ON ties (see corpus_report)
           CASE WHEN COUNT(nt) > 0 THEN
             CAST((2 * SUM(CAST(nt AS BIGINT) * 10000) + COUNT(nt))
                  // (2 * COUNT(nt)) AS DOUBLE) / 10000.0
           END AS avg_tokens,
           CAST(quantile_cont(nt, 0.5) AS DOUBLE) AS p50_tokens,
           CAST(quantile_cont(nt, 0.9) AS DOUBLE) AS p90_tokens,
           CASE WHEN COUNT(q) > 0 THEN
             CAST((2 * SUM(CAST(CAST(q AS DECIMAL(14,4)) * 10000 AS BIGINT)) + COUNT(q))
                  // (2 * COUNT(q)) AS DOUBLE) / 10000.0
           END AS avg_quality,
           CASE WHEN COUNT(fp) > 0
                THEN 1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(fp)
                ELSE 0.0 END AS dup_fraction
    FROM per_doc
    GROUP BY source, lang
    ORDER BY source, lang
"""


@query(
    "x27_data_card",
    _X27_DATA_CARD,
    survey_rows=("X27",),
)
def x27_data_card(spark, sf_dir):
    """Corpus data card (operators/quality.corpus_report): the per-slice
    statistics every dataset release publishes — doc/token counts,
    token-length mean and EXACT interpolated p50/p90, mean quality score,
    exact-duplicate fraction — in ONE groupBy over one map-side
    projection (count_distinct plans as a two-phase partial-distinct
    aggregate; at 100 TB this is exactly one corpus scan).  The oracle
    recomputes every statistic from the raw text: token counts and the
    quality heuristic reuse the x5-pinned SQL twins, percentiles check
    that both engines share the (n−1)·p interpolation convention
    bit-for-bit, means go through exact accumulators (long / decimal
    sums, one terminal double division) so partition order can't move
    the 4th decimal, and the duplicate fraction compares
    sha256(normalized text) distinct counts — the X1 fingerprint
    definition, byte-identical across engines."""
    from r_e_hive__spark.operators.quality import corpus_report

    (documents,) = T(spark, sf_dir, "documents")
    return corpus_report(documents, "text", group_cols=("source", "lang"))


# ---------------------------------------------------------------------------
# X21 — URL/domain blocklist gate (declared round 9; VERDICT r8 item 3:
# the cross-engine differential landed in tests/test_sampling.py round 8,
# promoted to a driver pin this rotation)
# ---------------------------------------------------------------------------

# Normalized entries (the operator lowercases + strips trailing root-label
# dots at build time; the oracle's VALUES list carries the normal forms).
# 'es.example.com' exercises dot-boundary SUBDOMAIN suffix matching (every
# es-lang host is a subdomain of it); the other three are exact-host hits
# whose www./case/trailing-dot variants must still match.
_X21_BLOCKED = (
    "src3.en.example.com",
    "src7.de.example.com",
    "Src11.Fr.Example.Com.",  # operator normalizes; oracle uses normal form
    "es.example.com",
)

# Deterministic per-doc URL with the classic evasion forms layered on by
# doc_id residue: www. subdomains (%3), trailing root-label dot (%7),
# uppercase host (%5), userinfo (%11), explicit port (%13).  Both engines
# build the IDENTICAL string from (doc_id, source, lang), so the gate
# decision — not the synthesis — is what the differential pins.
_X21_ORACLE = r"""
    WITH built AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
             || source || '.' || lang || '.example.com'
             || (CASE WHEN doc_id % 7 = 0 THEN '.' ELSE '' END) AS h0
      FROM documents
    ),
    docs AS (
      SELECT doc_id,
             'https://'
             || (CASE WHEN doc_id % 11 = 0 THEN 'user@' ELSE '' END)
             || (CASE WHEN doc_id % 5 = 0 THEN upper(h0) ELSE h0 END)
             || (CASE WHEN doc_id % 13 = 0 THEN ':8443' ELSE '' END)
             || '/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM built
    ),
    hosts AS (
      SELECT doc_id, url,
             NULLIF(regexp_replace(lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)),
               '\.+$', ''), '') AS hh
      FROM docs
    ),
    bl(b) AS (VALUES ('src3.en.example.com'), ('src7.de.example.com'),
                     ('src11.fr.example.com'), ('es.example.com'))
    SELECT doc_id, url
    FROM hosts
    WHERE hh IS NULL
       OR NOT EXISTS (SELECT 1 FROM bl WHERE hh = b OR hh LIKE '%.' || b)
    ORDER BY doc_id
"""


@query(
    "x21_url_blocklist",
    _X21_ORACLE,
    survey_rows=("X21",),
)
def x21_url_blocklist(spark, sf_dir):
    """X21 URL/domain blocklist gate — operators/quality.filter_blocklist:
    host extraction via Spark's built-in ``try_parse_url`` (JVM, codegen,
    no UDF), lowercase + trailing-root-dot normalization, dot-boundary
    subdomain-suffix matching via a bounded suffix explode, and ONE
    broadcast anti-join (the corpus never shuffles — a map-side gate at
    100 TB).  URLs are synthesized deterministically from (doc_id,
    source, lang) with the standard evasion forms (www. subdomains,
    trailing-dot absolute FQDNs, uppercase hosts, userinfo, ports); the
    DuckDB oracle builds the identical strings and replays the keep
    decision as NOT EXISTS over (h = b OR h LIKE '%.'||b) — an
    independent formulation of the same rule (the
    tests/test_sampling.py::test_filter_blocklist_cross_engine_differential
    construction, promoted to the driver surface in the round-9
    rotation)."""
    from r_e_hive__spark.operators.quality import filter_blocklist

    (documents,) = T(spark, sf_dir, "documents")
    d = F.col("doc_id")
    h0 = F.concat(
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("."),
        F.col("lang"),
        F.lit(".example.com"),
        F.when(d % 7 == 0, F.lit(".")).otherwise(F.lit("")),
    )
    url = F.concat(
        F.lit("https://"),
        F.when(d % 11 == 0, F.lit("user@")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.upper(h0)).otherwise(h0),
        F.when(d % 13 == 0, F.lit(":8443")).otherwise(F.lit("")),
        F.lit("/doc/"),
        d.cast("string"),
    )
    docs = documents.select("doc_id", url.alias("url"))
    return filter_blocklist(docs, "url", list(_X21_BLOCKED)).orderBy("doc_id")
