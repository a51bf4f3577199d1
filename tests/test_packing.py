"""operators/packing: the two prefix-sum strategies must be bit-identical.

The smoke-scale declared query (x9_token_shards) always takes the
one-window branch, so this file is the only CI coverage of the
scale-critical two-phase distributed prefix-sum (ADVICE r3) — mirroring
tests/test_io.py's sequence_ids parity suite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators import packing as P


def _fixture(spark):
    # multi-group, multi-partition, scrambled order with a non-id sort key:
    # 4 language groups x ~1250 docs, weights 0..512 incl. zero-weight docs
    return (
        spark.range(0, 5000)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("lang_"), (F.col("id") % 4).cast("string")).alias("lang"),
            ((F.col("id") * 2654435761) % 513).alias("n_tokens"),
        )
        .repartition(16)
    )


def test_weighted_prefix_sum_strategies_agree(spark):
    df = _fixture(spark)
    kwargs = dict(
        weight_col="n_tokens",
        order_cols=[F.asc("doc_id")],
        partition_cols=["lang"],
        out_col="cum",
    )
    small = P.weighted_prefix_sum(df, distributed=False, **kwargs)
    big = P.weighted_prefix_sum(df, distributed=True, **kwargs)
    a = {(r["doc_id"], r["cum"]) for r in small.collect()}
    b = {(r["doc_id"], r["cum"]) for r in big.collect()}
    assert a == b
    # and the running total really is the within-group inclusive prefix sum
    rows = sorted(small.collect(), key=lambda r: (r["lang"], r["doc_id"]))
    seen: dict[str, int] = {}
    for r in rows:
        seen[r["lang"]] = seen.get(r["lang"], 0) + r["n_tokens"]
        assert r["cum"] == seen[r["lang"]], r


def test_pack_shards_strategies_agree(spark):
    df = _fixture(spark)
    kwargs = dict(
        weight_col="n_tokens",
        order_cols=[F.asc("doc_id")],
        budget=2048,
        partition_cols=["lang"],
    )
    small = P.pack_shards(df, distributed=False, **kwargs)
    big = P.pack_shards(df, distributed=True, **kwargs)
    a = {(r["doc_id"], r["shard_id"]) for r in small.collect()}
    b = {(r["doc_id"], r["shard_id"]) for r in big.collect()}
    assert a == b
    # shard ids start at 0 and are non-decreasing in pack order (dense TOO,
    # but only because every fixture weight <= 512 < budget 2048; an
    # over-budget doc leaves a gap by design — see the boundary test below)
    rows = sorted(small.collect(), key=lambda r: (r["lang"], r["doc_id"]))
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["shard_id"])
    for lang, shards in by_lang.items():
        assert shards[0] == 0, lang
        assert all(b - a in (0, 1) for a, b in zip(shards, shards[1:])), lang


def test_pack_shards_distributed_no_global_window(spark):
    # every window over the DATA must be keyed by _pid; only the tiny
    # per-(partition, group) offsets table may window globally per group
    df = _fixture(spark)
    plan = (
        P.pack_shards(
            df,
            "n_tokens",
            order_cols=[F.asc("doc_id")],
            budget=2048,
            partition_cols=["lang"],
            distributed=True,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    data_windows = [
        m.group(0)
        for m in re.finditer(r"Window \[sum\(cast\(n_tokens[^\n]*", plan)
    ]
    assert all("_pid" in w for w in data_windows), data_windows


def test_pack_shards_empty_and_oversized(spark):
    empty = spark.range(0).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit(1).alias("n_tokens"),
    )
    assert (
        P.pack_shards(
            empty, "n_tokens", [F.asc("doc_id")], budget=10, distributed=True
        ).count()
        == 0
    )
    # an over-budget doc spans budget windows without stalling the stream:
    # it STARTS in shard 0 (with doc 1) and pushes doc 3 to shard 10 —
    # shard ids index budget-sized windows of the cumulative token stream,
    # so the intermediate ids stay empty (the documented start-offset rule,
    # operators/packing.py)
    rows = (
        P.pack_shards(
            spark.createDataFrame(
                [(1, 5), (2, 100), (3, 5)], "doc_id long, n_tokens long"
            ),
            "n_tokens",
            [F.asc("doc_id")],
            budget=10,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["shard_id"] for r in rows] == [0, 0, 10]


def test_distributed_prefix_sum_no_cache_entry(spark):
    """Round-4 ADVICE regression: the distributed offsets materialization
    must not go through df.persist() — a CacheManager entry leaks per call
    in a long-lived session.  The localCheckpoint replacement shows up as
    an RDD scan, never an InMemoryTableScan."""
    df = _fixture(spark)
    out = P.pack_shards(
        df,
        "n_tokens",
        order_cols=[F.asc("doc_id")],
        budget=2048,
        partition_cols=["lang"],
        distributed=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan, plan
    out.collect()  # still executes end-to-end


# ------------------------------------------------------------------ chunking


def _py_chunks(docs, chunk_size, overlap):
    """Pure-Python chunker reference (parity tokenizer)."""
    from r_e_hive__spark.operators.ranking import tokenize_py

    stride = chunk_size - overlap
    out = {}
    for i, text in docs.items():
        toks = tokenize_py(text or "")
        if not toks:
            continue
        for cid, start in enumerate(range(0, len(toks), stride)):
            win = toks[start : start + chunk_size]
            if cid > 0 and len(win) <= overlap:
                continue  # tail fully contained in previous chunk
            out[(i, cid)] = (start, len(win), " ".join(win))
    return out


def test_chunk_documents_matches_python_reference(spark):
    import random

    from r_e_hive__spark.operators.packing import chunk_documents

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 57)))
        for i in range(40)
    }
    docs[100] = ""        # empty: no chunks
    docs[101] = "  \t "    # whitespace only: no chunks
    df = spark.createDataFrame(list(docs.items()), "id INT, text STRING")
    for size, ov in [(16, 0), (16, 4), (10, 9), (64, 8)]:
        got = {
            (r["id"], r["chunk_id"]): (
                r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"]
            )
            for r in chunk_documents(df, "text", "id", size, ov).collect()
        }
        assert got == _py_chunks(docs, size, ov), (size, ov)


def test_chunk_documents_full_coverage_and_overlap(spark):
    """Every token appears in >=1 chunk; consecutive chunks share exactly
    `overlap` tokens except at the (possibly shorter) tail."""
    from r_e_hive__spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], "id INT, text STRING")
    rows = sorted(
        (r["chunk_id"], r["chunk_start"], r["chunk_text"].split())
        for r in chunk_documents(df, "text", "id", 8, 3).collect()
    )
    covered = set()
    for _, start, toks in rows:
        covered |= set(toks)
    assert covered == {f"t{i}" for i in range(23)}
    for (_, s1, t1), (_, s2, t2) in zip(rows, rows[1:]):
        assert s2 - s1 == 5  # stride
        assert t1[-3:] == t2[:3] or len(t2) < 8  # shared overlap window


def test_chunk_documents_validation_and_plan(spark):
    import pytest as _pytest

    from r_e_hive__spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "id INT, text STRING")
    with _pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(df, "text", "id", 0)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "id", 8, 8)
    # map-only: no exchange anywhere in the plan
    plan = (
        chunk_documents(df, "text", "id", 8, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_documents_duckdb_differential(spark):
    """Independent DuckDB replay of the chunker on the real documents
    table (generate_series + list slicing)."""
    import duckdb

    from r_e_hive__spark.catalog import load_table
    from r_e_hive__spark.operators.packing import chunk_documents
    from tests.conftest import SF_SMOKE

    size, ov, stride = 32, 8, 24
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"]
        )
        for r in chunk_documents(docs, "text", "doc_id", size, ov).collect()
    }
    con = duckdb.connect()
    try:
        want = {
            (r[0], r[1]): (r[2], r[3], r[4])
            for r in con.sql(
                f"""
                WITH toks AS (
                    SELECT doc_id,
                           list_filter(
                             regexp_split_to_array(lower(text), '[ \t\n\x0b\f\r]+'),
                             x -> x <> '') AS t
                    FROM read_parquet('{SF_SMOKE}/documents.parquet')
                ),
                starts AS (
                    SELECT doc_id, t, s.start, s.start // {stride} AS chunk_id
                    FROM toks,
                         (SELECT UNNEST(generate_series(0, 100000, {stride})) AS start) s
                    WHERE len(t) > 0 AND s.start <= len(t) - 1
                )
                SELECT doc_id, chunk_id, start,
                       least({size}, len(t) - start) AS n_chunk_tokens,
                       array_to_string(t[start + 1 : start + {size}], ' ') AS chunk_text
                FROM starts
                WHERE chunk_id = 0 OR least({size}, len(t) - start) > {ov}
                """
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want
    assert len(got) > 500  # the corpus actually chunks
