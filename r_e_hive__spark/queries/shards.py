"""Declared queries: corpus packing + decontamination (SURVEY.md §2.11 X9).

The two curation steps that sit between the dedup/quality suite (X1-X6)
and a training run: deterministic stratified sampling + token-budget shard
packing (the corpus → fixed-size-shards step a data loader consumes), and
benchmark n-gram decontamination (the eval-leak guard).  Neither has a
reference analog (the reference pages with LIMIT/OFFSET,
render-complete-deploy.js:512-516); both are north-star LLM-pipeline
surface, fully differential against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.functions import text as TX
from r_e_hive__spark.operators.dedup import contamination_hits
from r_e_hive__spark.operators.packing import pack_shards
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T

# Stratified sampling rule: deterministic systematic sample by doc_id
# residue, per-language rates (downsample the dominant language, keep the
# long tail) — the SQL-expressible stand-in for hash-Bernoulli sampling
# (at 100 TB the residue comes from xxhash64(doc_id) instead of the id
# itself; same plan, same operator).
_SAMPLE_PRED = "(doc_id % 10) < (CASE WHEN lang = 'en' THEN 3 ELSE 7 END)"
_BUDGET = 2048  # tokens per shard


@retired_query(
    "x9_token_shards",
    f"""
    WITH sampled AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE {_SAMPLE_PRED}
    )
    SELECT lang, doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                // {_BUDGET} AS BIGINT) AS shard_id
    FROM sampled
    ORDER BY lang, doc_id
    """,
    survey_rows=("X9",),
)
def x9_token_shards(spark, sf_dir):
    """Stratified sample → token count → fixed-budget shard packing, the
    corpus-to-training-shards step: each selected document is assigned the
    shard (per language, in doc_id order) where its tokens start, budget
    2048 tokens/shard.  Packing is operators/packing.pack_shards — a
    weighted prefix-sum auto-gated between one window pass (group fits a
    task) and the two-phase distributed prefix-sum (range-partition local
    totals + broadcast offsets) that survives a 100 TB corpus; both
    strategies are bit-identical (tests/test_packing.py).  RETIRED round 8
    second wave (50-cap rotation for x26_percentile_gate): X9 stays
    driver-pinned by x9_chunk_documents, pack_shards keeps its strategy
    differential in test_packing.py, and this oracle keeps running in
    test_retired_queries.py."""
    (documents,) = T(spark, sf_dir, "documents")
    sampled = documents.where(F.expr(_SAMPLE_PRED)).select(
        "doc_id", "lang", TX.n_tokens(F.col("text")).cast("long").alias("n_tokens")
    )
    return (
        pack_shards(
            sampled,
            "n_tokens",
            order_cols=[F.asc("doc_id")],
            budget=_BUDGET,
            partition_cols=["lang"],
        )
        .select("lang", "doc_id", "n_tokens", "shard_id")
        .orderBy("lang", "doc_id")
    )


# Benchmark set: a deterministic ~1% slice of documents stands in for the
# held-out eval suite; the remaining 99% is the training corpus.
_BENCH_PRED = "doc_id % 97 = 0"
_K = 5  # word-shingle width for overlap detection


@retired_query(
    "x9_decontaminate",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= {_K}
        THEN list_transform(generate_series(1, len(t) - {_K - 1}),
                            i -> array_to_string(t[i:i+{_K - 1}], ' '))
        ELSE [array_to_string(t, ' ')] END)) AS shingle
      FROM toks
    )
    SELECT tr.doc_id AS train_id,
           COUNT(DISTINCT be.doc_id) AS n_bench_docs,
           COUNT(DISTINCT be.shingle) AS n_shared_shingles
    FROM sh tr JOIN sh be ON tr.shingle = be.shingle
    WHERE NOT (tr.{_BENCH_PRED}) AND be.{_BENCH_PRED}
    GROUP BY tr.doc_id
    ORDER BY train_id
    """,
    survey_rows=("X9", "X2"),
)
def x9_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination: training docs sharing any word
    5-shingle with the (deterministic 1%) benchmark slice, with hit counts.
    operators/dedup.contamination_hits broadcasts the benchmark's exploded
    shingle set, so the training corpus is scanned once and never
    shuffled — only the tiny hit stream aggregates.  The eval-leak guard
    every corpus freeze runs (GPT-3 appendix C shape, public method)."""
    (documents,) = T(spark, sf_dir, "documents")
    bench = documents.where(F.expr(_BENCH_PRED))
    train = documents.where(~F.expr(_BENCH_PRED))
    return (
        contamination_hits(train, bench, "text", "doc_id", k=_K)
        .select(
            F.col("train_id"),
            F.col("n_bench_docs"),
            F.col("n_shared_shingles"),
        )
        .orderBy("train_id")
    )


_CHUNK_SIZE, _CHUNK_OV, _CHUNK_STRIDE = 32, 8, 24


@query(
    "x9_chunk_documents",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(
                 regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                 x -> x <> '') AS t
        FROM documents
    ),
    starts AS (
        SELECT doc_id, t, s.start, (s.start // {_CHUNK_STRIDE})::INT AS chunk_id
        FROM toks,
             (SELECT UNNEST(generate_series(0, 100000, {_CHUNK_STRIDE})) AS start) s
        WHERE len(t) > 0 AND s.start <= len(t) - 1
    )
    SELECT doc_id, chunk_id, start::INT AS chunk_start,
           least({_CHUNK_SIZE}, len(t) - start)::INT AS n_chunk_tokens,
           array_to_string(t[start + 1 : start + {_CHUNK_SIZE}], ' ') AS chunk_text
    FROM starts
    WHERE chunk_id = 0 OR least({_CHUNK_SIZE}, len(t) - start) > {_CHUNK_OV}
    ORDER BY doc_id, chunk_id
    """,
    survey_rows=("X9",),
)
def x9_chunk_documents(spark, sf_dir):
    """Context-window chunking (X9, operators/packing.chunk_documents):
    fixed-size overlapping token windows per document — size 32, overlap
    8 — with contained-tail suppression; strictly map-only (tokens →
    sequence of starts → posexplode → slice).  The oracle replays the
    whole construction with DuckDB generate_series + list slicing;
    chunk_text equality is exact string compare, no float anywhere."""
    from r_e_hive__spark.operators.packing import chunk_documents

    (documents,) = T(spark, sf_dir, "documents")
    return chunk_documents(
        documents.select("doc_id", "text"), "text", "doc_id",
        _CHUNK_SIZE, _CHUNK_OV,
    ).orderBy("doc_id", "chunk_id")
