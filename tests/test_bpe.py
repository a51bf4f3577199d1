"""X30: BPE tokenizer — hand-computed merge pins, driver≡distributed
strategy differential, encode-replay property, losslessness."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.functions.text import SUBWORD_RE
from r_e_hive__spark.operators import bpe as B

# Sennrich-style classic: low×5 lower×2 newest×6 widest×3 (one word per
# row so pieces carry no leading space and stay hand-computable)
CLASSIC = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
# hand-derived (tie-breaks lexicographic asc on equal counts):
CLASSIC_MERGES = [
    ("e", "s"),
    ("es", "t"),
    ("l", "o"),
    ("lo", "w"),
    ("e", "w"),
]


@pytest.fixture(scope="module")
def classic_df(spark):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(CLASSIC)], "doc_id INT, text STRING"
    )


def test_hand_merges_driver(spark, classic_df):
    got = B.train_bpe(classic_df, "text", num_merges=5, strategy="driver")
    assert got == CLASSIC_MERGES


def test_distributed_equals_driver_classic(spark, classic_df):
    got = B.train_bpe(
        classic_df, "text", num_merges=5, strategy="distributed"
    )
    assert got == CLASSIC_MERGES


def test_distributed_equals_driver_randomized(spark):
    rng = random.Random(1234)
    syll = ["lo", "wer", "new", "est", "wi", "de", "st", "ing", "re", "un"]
    docs = [
        (i, " ".join(
            "".join(rng.choice(syll) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 6))
        ))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    d = B.train_bpe(df, "text", num_merges=12, strategy="driver")
    x = B.train_bpe(df, "text", num_merges=12, strategy="distributed")
    assert d == x
    assert len(d) == 12


def test_distributed_equals_driver_non_bmp(spark):
    """Astral (non-BMP) text: Spark's split(piece, '') is CODE-POINT
    aware on this JVM (a surrogate pair stays one symbol — verified, not
    assumed), so it matches the driver's tuple(piece) splitting; UTF8
    byte comparison and Python str comparison agree on code-point order
    for the tie-breaks.  Pins the driver≡distributed contract on emoji /
    astral-char pieces (round-5 ADVICE questioned exactly this)."""
    docs = [
        (1, "\U0001F600\U0001F600x \U0001F600x"),
        (2, "x\U0001F680 \U0001F680\U0001F600 a\U0001F600b"),
        (3, "\U0001F600\U0001F600x a\U0001F600b a\U0001F600b"),
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING")
    d = B.train_bpe(df, "text", num_merges=6, strategy="driver")
    x = B.train_bpe(df, "text", num_merges=6, strategy="distributed")
    assert d == x
    # the learned alphabet really contains whole astral code points
    assert any("\U0001F600" in a + b for a, b in d)


def test_merges_exhaust_early(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id INT, text STRING")
    got = B.train_bpe(df, "text", num_merges=10, strategy="driver")
    # "ab" and " ab": (a,b)=2 wins, then ( ,ab)=1, then nothing
    assert got == [("a", "b"), (" ", "ab")]


def test_encode_piece_classic():
    ranks = {p: i for i, p in enumerate(CLASSIC_MERGES)}
    assert B.encode_piece("lowest", ranks) == ["low", "est"]
    assert B.encode_piece("low", ranks) == ["low"]
    assert B.encode_piece("newest", ranks) == ["n", "ew", "est"]
    assert B.encode_piece("xyz", ranks) == ["x", "y", "z"]  # all-OOV pairs
    assert B.encode_piece("", ranks) == []


def test_encode_replays_training_segmentation(spark, classic_df):
    """Property: encoding a training piece with the merge ranks equals
    applying the merge list sequentially (the training end-state) — the
    two different algorithms must agree on every training word."""
    merges = B.train_bpe(classic_df, "text", num_merges=5, strategy="driver")
    ranks = {p: i for i, p in enumerate(merges)}
    for piece in set(CLASSIC):
        seq = tuple(piece)
        for m in merges:
            seq = B._merge_word(seq, m)
        assert B.encode_piece(piece, ranks) == list(seq), piece
    # overlap semantics: greedy left-to-right, no re-merge within a pass
    assert B._merge_word(tuple("aaa"), ("a", "a")) == ("aa", "a")


def test_bpe_encode_dataframe_lossless(spark, classic_df):
    import re

    merges = B.train_bpe(classic_df, "text", num_merges=5)
    docs = spark.createDataFrame(
        [
            (1, "the lowest newest widest thing"),
            (2, "low low lower"),
            (3, None),
            (4, ""),
        ],
        "doc_id INT, text STRING",
    )
    rows = {
        r["doc_id"]: r
        for r in B.bpe_encode(docs, "text", merges).collect()
    }
    pat = re.compile(SUBWORD_RE)
    for i, text in [(1, "the lowest newest widest thing"), (2, "low low lower"), (4, "")]:
        toks = rows[i]["bpe_tokens"]
        assert "".join(toks) == "".join(pat.findall(text))
        assert all(t for t in toks)
    assert rows[3]["bpe_tokens"] is None
    # merges actually compress: fewer tokens than characters
    assert len(rows[2]["bpe_tokens"]) < len("low low lower".replace(" ", "X"))


def test_real_corpus_token_budget(spark):
    """Smoke on the real documents table: a trained tokenizer's token
    count lands between merges-exhausted (= piece count) and char count,
    and strictly improves on the unmerged pre-token char budget."""
    from r_e_hive__spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    merges = B.train_bpe(docs, "text", num_merges=40, strategy="driver")
    assert len(merges) == 40
    out = B.bpe_encode(docs, "text", merges).select(
        F.size("bpe_tokens").alias("n_bpe"),
        F.size(F.regexp_extract_all("text", F.lit(SUBWORD_RE), 0)).alias(
            "n_pieces"
        ),
        F.length("text").alias("n_chars"),
    )
    agg = out.agg(
        F.sum("n_bpe").alias("b"),
        F.sum("n_pieces").alias("p"),
        F.sum("n_chars").alias("c"),
    ).head()
    assert agg["p"] <= agg["b"] <= agg["c"]


def test_save_load_bpe_roundtrip(spark, classic_df, tmp_path):
    """Model persistence: train once, store the merge list, encode later
    increments from the stored model — byte-identical tokens (rank order
    IS the model, so the round-trip must preserve it exactly)."""
    merges = B.train_bpe(classic_df, "text", num_merges=5)
    path = str(tmp_path / "bpe_model")
    B.save_bpe(spark, merges, path)
    assert B.load_bpe(spark, path) == merges
    docs = spark.createDataFrame(
        [(1, "the lowest newest thing"), (2, None)], "doc_id INT, text STRING"
    )
    a = {r["doc_id"]: r["bpe_tokens"] for r in B.bpe_encode(docs, "text", merges).collect()}
    b = {r["doc_id"]: r["bpe_tokens"] for r in B.bpe_encode(docs, "text", B.load_bpe(spark, path)).collect()}
    assert a == b
    # empty model round-trips too (merges exhausted / num_merges=0)
    B.save_bpe(spark, [], str(tmp_path / "empty"))
    assert B.load_bpe(spark, str(tmp_path / "empty")) == []


def test_train_bpe_duckdb_replay(spark):
    """X30 training replayed merge-for-merge in DuckDB (round-9 rotation
    prep — the last family without a cross-engine differential).  The
    oracle re-derives the whole greedy loop from raw text: pre-token
    histogram (same RE2-safe regex), code-point symbols (RE2 '.' = one
    rune, matching JVM split('') code-point semantics), adjacent-pair
    counting, (count DESC, left, right) argmax tie-break, and the
    greedy-left-no-remerge merge application — expressed as SQL REPLACE
    over sentinel-delimited symbol strings, whose leftmost-
    non-overlapping semantics are exactly `_merge_word`'s (a freshly
    merged symbol cannot re-merge within the pass because scanning
    resumes after the replacement).  Per-round assertion, so a drift
    names the first diverging merge."""
    import duckdb

    from tests.conftest import SF_SMOKE

    sf = SF_SMOKE  # shared testdata root (ADVICE r8: no hardcoded path)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    n_merges = 10
    merges = B.train_bpe(docs, "text", num_merges=n_merges, strategy="driver")
    assert len(merges) == n_merges

    con = duckdb.connect()
    sep = chr(31)  # U+001F, asserted absent from the corpus below
    assert (
        con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{sf}/documents.parquet')"
            f" WHERE text LIKE '%' || chr(31) || '%'"
        ).fetchone()[0]
        == 0
    )
    con.execute(
        f"""CREATE TABLE words AS
            SELECT '{sep}' || array_to_string(regexp_extract_all(piece, '.'),
                                              '{sep}{sep}') || '{sep}' AS w,
                   COUNT(*) AS cnt
            FROM (SELECT unnest(regexp_extract_all(text, '{SUBWORD_RE}')) AS piece
                  FROM read_parquet('{sf}/documents.parquet'))
            GROUP BY 1"""
    )
    for rnd, (a, b) in enumerate(merges):
        best = con.execute(
            f"""WITH syms AS (
                  SELECT string_split(trim(w, '{sep}'), '{sep}{sep}') AS s, cnt
                  FROM words
                ), idx AS (
                  SELECT s, cnt, unnest(generate_series(1, len(s) - 1)) AS i
                  FROM syms WHERE len(s) > 1
                ), pairs AS (
                  SELECT s[i] AS l, s[i + 1] AS r, cnt FROM idx
                )
                SELECT l, r FROM pairs
                GROUP BY l, r
                ORDER BY SUM(cnt) DESC, l, r
                LIMIT 1"""
        ).fetchone()
        assert best == (a, b), f"merge {rnd}: spark {(a, b)} vs duck {best}"
        con.execute(
            f"""CREATE OR REPLACE TABLE words AS
                SELECT replace(w, '{sep}' || ? || '{sep}{sep}' || ? || '{sep}',
                               '{sep}' || ? || '{sep}') AS w,
                       SUM(cnt) AS cnt
                FROM words GROUP BY 1""",
            [a, b, a + b],
        )
