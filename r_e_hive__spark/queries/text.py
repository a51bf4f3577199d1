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
from r_e_hive__spark.queries import query, retired_query
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
           len(regexp_extract_all(text, '{TX.SUBWORD_RE}')) AS n_subwords,
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


# DuckDB n-gram list machinery for the repetition oracle: range(i) slides a
# 1-based window, list_slice is end-inclusive, so (i, i+n-1) is an n-gram.
def _du_grams(n: int) -> str:
    return (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_transform(range(1, len(t) - {n - 2}), "
        f"i -> array_to_string(list_slice(t, i, i + {n - 1}), ' ')) "
        "ELSE [] END"
    )


def _du_dupfrac(g: str) -> str:
    return (
        f"CASE WHEN len({g}) > 0 THEN "
        f"1.0 - CAST(len(list_distinct({g})) AS DOUBLE) / len({g}) "
        "ELSE 0.0 END"
    )


def _du_topfrac(g: str) -> str:
    mode = (
        f"list_max(list_transform(list_distinct({g}), "
        f"d -> len(list_filter({g}, x -> x = d))))"
    )
    return (
        f"CASE WHEN len({g}) > 0 THEN CAST({mode} AS DOUBLE) / len({g}) "
        "ELSE 0.0 END"
    )


def _du_r6(x: str) -> str:
    # decimal-mediated 6-dp round — engine-independent at halfway points
    return f"CAST(ROUND(CAST({x} AS DECIMAL(10,7)), 6) AS DOUBLE)"


@query(
    "x16_repetition_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ),
    g AS (
      SELECT doc_id, {_du_grams(2)} AS g2, {_du_grams(3)} AS g3 FROM toks
    )
    SELECT doc_id,
           len(g2) AS n_2grams,
           len(list_distinct(g2)) AS n_distinct_2grams,
           {_du_r6(_du_dupfrac('g2'))} AS dup2_frac,
           {_du_r6(_du_topfrac('g2'))} AS top2_frac,
           {_du_r6(_du_dupfrac('g3'))} AS dup3_frac,
           ({_du_topfrac('g2')}) <= 0.2 AND ({_du_dupfrac('g3')}) <= 0.5
             AS passes_repetition
    FROM g ORDER BY doc_id
    """,
    survey_rows=("X16", "X5"),
)
def x16_repetition_stats(spark, sf_dir):
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
    duplicate-2-gram fraction, most-common-2-gram share, duplicate-3-gram
    fraction, and the pass/fail gate — all count-weighted, all pure JVM
    higher-order expressions over one token array (zero UDFs, zero
    shuffles; at 100 TB this fuses into the parquet scan exactly like the
    X5 suite).  The pass flag compares UNROUNDED doubles on both sides;
    the reported fractions are decimal-round-6 for hash stability."""
    (documents,) = T(spark, sf_dir, "documents")
    g2 = TX.word_ngrams(F.col("text"), 2)
    g3 = TX.word_ngrams(F.col("text"), 3)

    def r6(c):
        return F.round(c.cast("decimal(10,7)"), 6).cast("double")

    return (
        documents.select(
            "doc_id",
            F.size(g2).alias("n_2grams"),
            F.size(F.array_distinct(g2)).alias("n_distinct_2grams"),
            r6(TX.dup_ngram_fraction(g2)).alias("dup2_frac"),
            r6(TX.top_ngram_fraction(g2)).alias("top2_frac"),
            r6(TX.dup_ngram_fraction(g3)).alias("dup3_frac"),
            (
                (TX.top_ngram_fraction(g2) <= F.lit(0.2))
                & (TX.dup_ngram_fraction(g3) <= F.lit(0.5))
            ).alias("passes_repetition"),
        )
        .orderBy("doc_id")
    )


# Retired from the declared surface in round 5 (50-query cap; ledger in
# queries/__init__.py): X6 routing stays pinned by x5_x6_text_suite's
# language-ID columns, and the group-by shape by x15's mixture counts.
# Differential kept green by tests/test_retired_queries.py.
@retired_query(
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


_BM25_QUERY = "the data model training pipeline"
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 25


def _bm25_terms_values() -> str:
    """Oracle term list DERIVED from the same tokenizer the Spark side
    uses — hand-duplicating it would desync the two on any edit to
    _BM25_QUERY (review finding)."""
    from r_e_hive__spark.operators.ranking import tokenize_py

    return ", ".join(
        f"('{t}')" for t in sorted(set(tokenize_py(_BM25_QUERY)))
    )


@query(
    "x23_bm25_topk",
    f"""
    WITH toks AS (
        SELECT doc_id, t.term
        FROM documents,
             UNNEST(list_filter(
                regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                x -> x <> '')) AS t(term)
    ),
    tf AS (
        SELECT doc_id, term, count(*)::DOUBLE AS tf
        FROM toks GROUP BY doc_id, term
    ),
    dl AS (
        SELECT doc_id, count(*)::DOUBLE AS doc_len FROM toks GROUP BY doc_id
    ),
    stats AS (
        SELECT count(*)::DOUBLE AS n_docs, avg(doc_len) AS avgdl FROM dl
    ),
    q(term) AS (VALUES {_bm25_terms_values()}),
    dfreq AS (
        SELECT term, count(*)::DOUBLE AS df
        FROM tf WHERE term IN (SELECT term FROM q)
        GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id,
               ROUND(sum(
                 ln(1.0 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * dl.doc_len / stats.avgdl))
               ), 6) AS score
        FROM tf
        JOIN dfreq USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT {_BM25_TOPK}
    """,
    survey_rows=("X23",),
)
def x23_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval over the documents corpus (X23,
    operators/ranking.bm25_search): inverted-index postings build, Lucene
    idf, k1/b saturation + length norm, deterministic
    (rounded-score desc, doc_id asc) top-25.  The oracle recomputes the
    whole formula in DuckDB SQL over the same parquet — tokenizer class,
    idf, and normalization identical; scores rounded to 6 dp on BOTH
    sides before the ORDER/LIMIT so last-ulp libm differences can't flip
    the ranking hash (the x3 cosine discipline)."""
    (documents,) = T(spark, sf_dir, "documents")
    return bm25_declared_topk(documents)


# Search-only DuckDB pairing for the x23 fast twin (round-8; r7 ADVICE;
# round-11, VERDICT r10 item 6): the Spark twin searches a prebuilt
# ON-DISK term-bucket-partitioned parquet index, so its DuckDB pair must
# search a persisted artifact too — an in-memory native table made the
# DuckDB side a warm rescan (0.02 s at sf1) that single-handedly
# distorted any geomean it entered.  x23_fast_duckdb_prep(dir) builds the
# postings/stats ONCE (untimed, the warm phase) and COPYs them to parquet
# on disk, term-SORTED so DuckDB's own pruning mechanism (row-group
# zonemaps on `term`) plays the role Spark's md5 bucket partitioning
# plays; x23_fast_duckdb_search(dir) is the timed search-only tail over
# read_parquet of that artifact.  Output is the same task as the declared
# oracle (same formula/rounding/top-k), so the pairing stays
# value-aligned while the timed work is symmetric: both engines read a
# persisted index from disk and prune to the query's terms.
def x23_fast_duckdb_prep(index_dir: str) -> list[str]:
    return [
        """
    CREATE OR REPLACE TABLE bm25_postings AS
    WITH toks AS (
      SELECT doc_id, t.term
      FROM documents,
           UNNEST(list_filter(
              regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
              x -> x <> '')) AS t(term)
    ), dl AS (
      SELECT doc_id, count(*)::DOUBLE AS doc_len FROM toks GROUP BY doc_id
    )
    SELECT toks.doc_id, term, count(*)::DOUBLE AS tf, MIN(dl.doc_len) AS doc_len
    FROM toks JOIN dl USING (doc_id)
    GROUP BY toks.doc_id, term
    """,
        """
    CREATE OR REPLACE TABLE bm25_stats AS
    SELECT count(*)::DOUBLE AS n_docs, avg(doc_len) AS avgdl
    FROM (SELECT DISTINCT doc_id, doc_len FROM bm25_postings)
    """,
        f"""
    COPY (SELECT * FROM bm25_postings ORDER BY term)
    TO '{index_dir}/postings.parquet' (FORMAT PARQUET)
    """,
        f"""
    COPY bm25_stats TO '{index_dir}/stats.parquet' (FORMAT PARQUET)
    """,
        # drop the in-memory builds: the timed search must read the disk
        # artifact, not a warm native table
        "DROP TABLE bm25_postings",
        "DROP TABLE bm25_stats",
    ]


def x23_fast_duckdb_search(index_dir: str) -> str:
    postings = f"read_parquet('{index_dir}/postings.parquet')"
    stats = f"read_parquet('{index_dir}/stats.parquet')"
    return f"""
    WITH q(term) AS (VALUES {_bm25_terms_values()}),
    dfreq AS (
        SELECT term, count(*)::DOUBLE AS df
        FROM {postings} WHERE term IN (SELECT term FROM q)
        GROUP BY term
    ),
    scored AS (
        SELECT p.doc_id,
               ROUND(sum(
                 ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
                 * p.tf * ({_BM25_K1} + 1.0)
                 / (p.tf + {_BM25_K1}
                    * (1.0 - {_BM25_B} + {_BM25_B} * p.doc_len / s.avgdl))
               ), 6) AS score
        FROM {postings} p
        JOIN dfreq USING (term)
        CROSS JOIN {stats} s
        WHERE p.term IN (SELECT term FROM q)
        GROUP BY p.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id ASC
    LIMIT {_BM25_TOPK}
    """


def bm25_declared_topk(documents, postings=None, stats=None):
    """The declared X23 scoring tail, shared with the bench-only
    persisted-index fast twin (queries/fastpaths.py) so the determinism
    contract — 6-dp rounding, (score desc, doc_id asc) tie-break,
    _BM25_TOPK — has exactly one definition (round-7 code review)."""
    from r_e_hive__spark.operators.ranking import bm25_search

    # top_k large enough to cover every matching doc, then the
    # deterministic rounded re-rank picks the declared 25
    scored = bm25_search(
        documents.select("doc_id", "text"),
        "text",
        "doc_id",
        _BM25_QUERY,
        k1=_BM25_K1,
        b=_BM25_B,
        top_k=10**6,
        postings=postings,
        stats=stats,
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


_LM_ADD_K, _LM_MIN_COUNT = 0.5, 2


@query(
    "x28_perplexity",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text),
                    '[ \t\n\x0b\f\r]+'), x -> x <> '') AS tk
        FROM documents
    ),
    pairs AS (
        SELECT doc_id,
               CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS w1,
               tk[i] AS w2
        FROM toks, UNNEST(generate_series(1, len(tk))) AS g(i)
    ),
    raw AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2),
    uni AS (SELECT w2 AS term, sum(c) AS cnt FROM raw GROUP BY 1),
    vocab AS (SELECT term FROM uni WHERE cnt >= {_LM_MIN_COUNT}),
    folded AS (
        SELECT CASE WHEN w1 = '<s>' THEN w1
                    WHEN w1 IN (SELECT term FROM vocab) THEN w1
                    ELSE '<unk>' END AS w1,
               CASE WHEN w2 IN (SELECT term FROM vocab) THEN w2
                    ELSE '<unk>' END AS w2,
               c
        FROM raw
    ),
    big AS (SELECT w1, w2, sum(c) AS cnt FROM folded GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(cnt) AS ctx_cnt FROM big GROUP BY 1),
    v AS (SELECT count(*) + 1 AS v FROM vocab),
    spairs AS (
        SELECT doc_id,
               CASE WHEN w1 = '<s>' THEN w1
                    WHEN w1 IN (SELECT term FROM vocab) THEN w1
                    ELSE '<unk>' END AS w1,
               CASE WHEN w2 IN (SELECT term FROM vocab) THEN w2
                    ELSE '<unk>' END AS w2
        FROM pairs
    ),
    scored AS (
        SELECT doc_id,
               ln((coalesce(b.cnt, 0) + {_LM_ADD_K})
                  / (coalesce(ctx.ctx_cnt, 0) + {_LM_ADD_K} * v.v)) AS lp
        FROM spairs
        LEFT JOIN big b USING (w1, w2)
        LEFT JOIN ctx USING (w1)
        CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_tokens,
           ROUND(avg(lp), 6) AS avg_logp
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    survey_rows=("X28",),
)
def x28_perplexity(spark, sf_dir):
    """X28 — CCNet-style LM quality scoring (operators/lm.py): an add-k
    bigram LM trained IN-ENGINE on the documents corpus, then every
    document scored with its per-token average log-probability (ppl =
    exp(-avg_logp) is a bijection of it — the rounded avg_logp is the
    stable cross-engine value).  The oracle replays the ENTIRE
    construction — tokenizer class, BOS prefix, min_count vocabulary,
    UNK folding, add-k formula — in DuckDB SQL over the same parquet;
    avg_logp rounded to 6 dp on both sides (the x23 libm discipline).
    Training + scoring is one lazy composition over ONE materialized
    corpus pass (train_ngram_lm's localCheckpoint)."""
    from r_e_hive__spark.operators import lm as L

    (documents,) = T(spark, sf_dir, "documents")
    model = L.train_ngram_lm(
        documents, "text", min_count=_LM_MIN_COUNT, add_k=_LM_ADD_K
    )
    return (
        L.score_perplexity(documents, model, "text", "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round("avg_logp", 6).alias("avg_logp"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------- X30

_X30_MERGES = 12


def _x30_oracle(n_merges: int = _X30_MERGES) -> str:
    """X30 BPE training unrolled merge-for-merge into one WITH chain (the
    x29 Lloyd-flattening trick): w0 is the sentinel-delimited pre-token
    histogram (same RE2-safe SUBWORD_RE, code-point symbols via RE2 '.'),
    then per merge round b{i} takes the (count DESC, left, right) argmax
    over adjacent symbol pairs and w{i+1} applies it as a sentinel-string
    REPLACE, whose leftmost-non-overlapping semantics equal
    operators/bpe._merge_word (a fresh merge never re-merges in-pass
    because scanning resumes after the replacement — pinned by
    tests/test_bpe.py's per-round replay).  Every CTE is MATERIALIZED:
    each level is referenced 2-4× (b{i} three times as a scalar subquery)
    and DuckDB's default inlining would otherwise expand the chain
    exponentially.  U+001F is the symbol delimiter; both engines drop
    documents containing it with the same filter (none exist at
    sf0.001/0.01/0.1 — verified offline — but the filter makes the
    differential correct at ANY sf rather than assuming it)."""
    from r_e_hive__spark.functions.text import SUBWORD_RE

    s, ss = "chr(31)", "(chr(31) || chr(31))"
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT {s} || array_to_string(regexp_extract_all(piece, '.'), {ss}) || {s} AS w,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(regexp_extract_all(text, '{SUBWORD_RE}')) AS piece
            FROM documents
            WHERE text IS NOT NULL AND text NOT LIKE '%' || chr(31) || '%')
      GROUP BY 1)"""
    ]
    for i in range(n_merges):
        parts.append(
            f"""b{i} AS MATERIALIZED (
      SELECT l, r FROM (
        SELECT s[i] AS l, s[i + 1] AS r, cnt FROM (
          SELECT s, cnt, unnest(generate_series(1, len(s) - 1)) AS i
          FROM (SELECT string_split(trim(w, {s}), {ss}) AS s, cnt FROM w{i})
          WHERE len(s) > 1))
      GROUP BY l, r ORDER BY SUM(cnt) DESC, l, r LIMIT 1)"""
        )
        parts.append(
            f"""w{i + 1} AS MATERIALIZED (
      SELECT replace(w, {s} || (SELECT l FROM b{i}) || {ss} || (SELECT r FROM b{i}) || {s},
                     {s} || (SELECT l || r FROM b{i}) || {s}) AS w,
             CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM w{i} GROUP BY 1)"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS merge_rank,"
        f" l AS left_sym, r AS right_sym FROM b{i}"
        for i in range(n_merges)
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT * FROM ({union}) ORDER BY merge_rank"
    )


@query(
    "x30_bpe_train",
    _x30_oracle(),
    survey_rows=("X30",),
)
def x30_bpe_train(spark, sf_dir):
    """X30 BPE tokenizer training (operators/bpe.train_bpe) — the merge
    list IS the model, so the returned frame is the ordered merge table
    (parameter-sized, like x29's centroid matrix).  The engine's one
    corpus-sized pass is the pre-token histogram; merge learning runs on
    the histogram only (driver strategy when it broadcasts, distributed
    argmax+fold otherwise — the two are pinned merge-identical in
    tests/test_bpe.py, so `auto` is deterministic).  The oracle re-derives
    the full greedy loop from raw text, merge-for-merge (VERDICT r9 item
    1: the last SURVEY §2 row without a driver pin).  Determinism: the
    (count DESC, left, right) tie-break is total, symbols are whole code
    points on both engines (JVM split('') == RE2 '.'), and no floats
    exist anywhere in training."""
    from r_e_hive__spark.operators import bpe as B

    (documents,) = T(spark, sf_dir, "documents")
    docs = documents.where(
        F.col("text").isNotNull() & ~F.col("text").contains("\x1f")
    )
    merges = B.train_bpe(docs, "text", num_merges=_X30_MERGES)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank BIGINT, left_sym STRING, right_sym STRING",
    ).orderBy("merge_rank")
