"""UDTF surface tests (functions/udtfs.py): lossless chunking, bound
respected, SQL LATERAL composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.functions.udtfs import register_udtfs

SF = "/root/testdata/sf0.001"


def test_chunk_document_lateral_is_lossless(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "n_chars")
    docs.createOrReplaceTempView("docs_for_udtf")
    chunks = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start, c.length, c.chunk
        FROM docs_for_udtf d, LATERAL chunk_document(d.text, 120) c
        """
    )
    # every chunk obeys the bound
    assert chunks.where(F.length("chunk") > 120).count() == 0
    assert chunks.where(F.length("chunk") != F.col("length")).count() == 0
    # chunks reassemble to the exact original text, in order
    rebuilt = chunks.groupBy("doc_id").agg(
        # collect_list order is not deterministic under shuffles: collect
        # (idx, chunk) structs and sort by idx explicitly
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            "",
        ).alias("rebuilt"),
        F.count("*").alias("n_chunks"),
    )
    joined = docs.join(rebuilt, "doc_id", "left")
    assert joined.where(F.col("rebuilt").isNull() & (F.length("text") > 0)).count() == 0
    assert joined.where(
        F.col("rebuilt").isNotNull() & (F.col("rebuilt") != F.col("text"))
    ).count() == 0
    # multi-chunk docs exist at this max_len (the fan-out is real)
    assert rebuilt.where(F.col("n_chunks") > 1).count() > 0


def test_chunk_document_python_semantics():
    # pure-Python check of the boundary rule: split prefers whitespace,
    # hard-splits only over-long tokens
    c = ChunkLocal("alpha beta gamma delta", 11)
    assert c == ["alpha beta ", "gamma delta"]
    c2 = ChunkLocal("x" * 25, 10)
    assert c2 == ["x" * 10, "x" * 10, "x" * 5]


def ChunkLocal(text, max_len):
    from r_e_hive__spark.functions.udtfs import ChunkDocument

    cls = getattr(ChunkDocument, "func", ChunkDocument)
    return [row[3] for row in cls().eval(text, max_len)]
