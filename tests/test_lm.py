"""X28: n-gram LM perplexity — reference differentials + contract pins.

Layers (the repo's standard ladder):
- pure-Python reference (independent Counter-based bigram LM) on hand
  and randomized corpora,
- DuckDB SQL replay on the real sf0.001 documents corpus (the
  oracle-parity proof for a declared query),
- model/table invariants (normalization, vocab tie-breaks, UNK folding),
- composition (`perplexity_filter` + percentile_gate), persistence
  round-trip, and the amortized-scoring plan shape.
"""

from __future__ import annotations

import math
import random
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.operators import lm as L
from r_e_hive__spark.operators.ranking import tokenize_py
from tests.conftest import SF_SMOKE


# ------------------------------------------------------------------ reference


def _py_lm_scores(
    docs: dict[int, str],
    vocab_size: int | None = None,
    min_count: int = 1,
    k: float = 0.5,
) -> dict[int, tuple[int, float]]:
    """Independent bigram-LM reference: id -> (n_tokens, avg_logp)."""
    per_doc, raw = {}, Counter()
    for i, text in docs.items():
        toks = tokenize_py(text) if text is not None else []
        ps = list(zip(["<s>"] + toks[:-1], toks))
        per_doc[i] = ps
        raw.update(ps)
    uni = Counter()
    for (_, w2), c in raw.items():
        uni[w2] += c
    kept = sorted(
        ((t, c) for t, c in uni.items() if c >= min_count),
        key=lambda tc: (-tc[1], tc[0]),
    )
    if vocab_size is not None:
        kept = kept[:vocab_size]
    vocab = {t for t, _ in kept}

    def fold(w: str, is_w1: bool) -> str:
        if is_w1 and w == "<s>":
            return w
        return w if w in vocab else "<unk>"

    big, ctx = Counter(), Counter()
    for (w1, w2), c in raw.items():
        big[(fold(w1, True), fold(w2, False))] += c
    for (w1, _), c in big.items():
        ctx[w1] += c
    v = len(vocab) + 1
    out = {}
    for i, ps in per_doc.items():
        if not ps:
            continue
        lps = [
            math.log(
                (big.get((fold(a, True), fold(b, False)), 0) + k)
                / (ctx.get(fold(a, True), 0) + k * v)
            )
            for a, b in ps
        ]
        out[i] = (len(ps), sum(lps) / len(lps))
    return out


def _spark_scores(spark, docs: dict[int, str], **kw) -> dict:
    df = spark.createDataFrame(
        list(docs.items()), "doc_id INT, text STRING"
    )
    model = L.train_ngram_lm(
        df,
        "text",
        vocab_size=kw.get("vocab_size"),
        min_count=kw.get("min_count", 1),
        add_k=kw.get("k", 0.5),
    )
    rows = L.score_perplexity(df, model, "text", "doc_id").collect()
    return {r["doc_id"]: r for r in rows}


HAND = {
    1: "the cat sat on the mat",
    2: "the dog sat",
    3: "a cat a dog a cat",
    4: "",
    5: None,
    6: "   \t  ",
}


def test_hand_corpus_matches_python_reference(spark):
    want = _py_lm_scores(HAND)
    got = _spark_scores(spark, HAND)
    assert set(got) == set(want)  # 4/5/6 unscorable, absent from both
    for i, (n, lp) in want.items():
        assert got[i]["n_tokens"] == n
        assert got[i]["avg_logp"] == pytest.approx(lp, abs=1e-12)
        assert got[i]["ppl"] == pytest.approx(math.exp(-lp), rel=1e-12)


@pytest.mark.parametrize("vocab_size,min_count", [(None, 1), (5, 1), (None, 3), (4, 2)])
def test_randomized_differential(spark, vocab_size, min_count):
    rng = random.Random(20260815 + (vocab_size or 0) * 7 + min_count)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = {
        i: " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        for i in range(40)
    }
    want = _py_lm_scores(docs, vocab_size=vocab_size, min_count=min_count)
    got = _spark_scores(spark, docs, vocab_size=vocab_size, min_count=min_count)
    assert set(got) == set(want)
    for i, (n, lp) in want.items():
        assert got[i]["n_tokens"] == n
        assert got[i]["avg_logp"] == pytest.approx(lp, abs=1e-12)


def test_duckdb_differential_real_corpus(spark):
    """Full train+score replay in DuckDB SQL over the same parquet — the
    oracle-parity proof (tokenizer class, BOS/UNK folding, add-k formula
    all replayed; compared unrounded at 1e-9 like the BM25 differential)."""
    k, min_count = 0.5, 2
    con = duckdb.connect()
    try:
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                f"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text),
                            '[ \t\n\x0b\f\r]+'), x -> x <> '') AS tk
                FROM read_parquet('{SF_SMOKE}/documents.parquet')
            ),
            pairs AS (
                SELECT doc_id,
                       CASE WHEN i = 1 THEN '<s>' ELSE tk[i-1] END AS w1,
                       tk[i] AS w2
                FROM toks, UNNEST(generate_series(1, len(tk))) AS g(i)
            ),
            raw AS (SELECT w1, w2, count(*) AS c FROM pairs GROUP BY 1, 2),
            uni AS (SELECT w2 AS term, sum(c) AS cnt FROM raw GROUP BY 1),
            vocab AS (SELECT term FROM uni WHERE cnt >= {min_count}),
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
                       ln((coalesce(b.cnt, 0) + {k})
                          / (coalesce(ctx.ctx_cnt, 0) + {k} * v.v)) AS lp
                FROM spairs
                LEFT JOIN big b USING (w1, w2)
                LEFT JOIN ctx USING (w1)
                CROSS JOIN v
            )
            SELECT doc_id, count(*) AS n_tokens, avg(lp) AS avg_logp
            FROM scored GROUP BY doc_id ORDER BY doc_id
            """
            ).fetchall()
        }
    finally:
        con.close()
    docs = load_table(spark, SF_SMOKE, "documents")
    model = L.train_ngram_lm(docs, "text", min_count=min_count, add_k=k)
    got = L.score_perplexity(docs, model, "text", "doc_id").collect()
    assert len(got) == len(want)
    for r in got:
        n, lp = want[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["avg_logp"] == pytest.approx(lp, abs=1e-9)


# ------------------------------------------------------------- model invariants


def test_model_is_normalized(spark):
    """Σ_{w2 ∈ vocab ∪ unk} P(w2|w1) == 1 for every context — the add-k
    tables really are a probability model."""
    df = spark.createDataFrame(
        [(i, t) for i, t in HAND.items() if t], "doc_id INT, text STRING"
    )
    model = L.train_ngram_lm(df, "text", add_k=0.25)
    v = model.stats.head()["v"]
    vocab = [r["term"] for r in model.vocab.collect()]
    big = {(r["w1"], r["w2"]): r["cnt"] for r in model.bigrams.collect()}
    ctx = {r["w1"]: r["ctx_cnt"] for r in model.contexts.collect()}
    assert v == len(vocab) + 1
    events = vocab + ["<unk>"]
    for w1 in list(ctx) + ["never-seen-context"]:
        total = sum(
            (big.get((w1, w2), 0) + 0.25) / (ctx.get(w1, 0) + 0.25 * v)
            for w2 in events
        )
        assert total == pytest.approx(1.0, abs=1e-12)


def test_vocab_cut_deterministic_tiebreak(spark):
    # bb and aa both occur twice; vocab_size=2 must keep (top count) + aa
    df = spark.createDataFrame(
        [(1, "cc cc cc aa bb"), (2, "aa bb cc")], "doc_id INT, text STRING"
    )
    model = L.train_ngram_lm(df, "text", vocab_size=2)
    assert [r["term"] for r in model.vocab.orderBy("term").collect()] == [
        "aa",
        "cc",
    ]


def test_unseen_context_scores_uniform(spark):
    """A scoring-time context absent from training degrades to ln(1/V)
    via coalesce-to-zero, not a crash or NULL."""
    train = spark.createDataFrame([(1, "a b a b")], "doc_id INT, text STRING")
    model = L.train_ngram_lm(train, "text", add_k=0.5)
    v = model.stats.head()["v"]  # {a, b} + unk = 3
    assert v == 3
    test = spark.createDataFrame([(9, "zz zz")], "doc_id INT, text STRING")
    row = L.score_perplexity(test, model, "text", "doc_id").head()
    # transitions: (<s>,unk) seen? no — <s> context exists; (unk,unk) unseen
    lp_bos = math.log((0 + 0.5) / (1 + 0.5 * 3))  # ctx(<s>) = 1
    lp_unk = math.log((0 + 0.5) / (0 + 0.5 * 3))  # unseen context: 1/V
    assert row["avg_logp"] == pytest.approx((lp_bos + lp_unk) / 2, abs=1e-12)


# ------------------------------------------------------------------ composition


def test_perplexity_filter_keeps_lowest_ppl(spark):
    fluent = "the cat sat on the mat and the dog sat on the cat"
    docs = [(i, fluent, "en") for i in range(8)] + [
        (100, "zz qq ww rr tt yy uu ii", "en"),
        (101, "qq zz rr ww yy tt ii uu", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id INT, text STRING, lang STRING")
    model = L.train_ngram_lm(df, "text")
    kept = L.perplexity_filter(
        df, model, "text", "doc_id", keep_fraction=0.5, strategy="exact"
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == set(range(8))  # the gibberish pair gated out
    assert set(kept.columns) >= {"doc_id", "text", "lang", "ppl", "avg_logp"}


def test_perplexity_filter_drops_tokenless_docs(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, ""), (3, None)], "doc_id INT, text STRING"
    )
    model = L.train_ngram_lm(df, "text")
    kept = L.perplexity_filter(
        df, model, "text", "doc_id", keep_fraction=1.0
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_save_load_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in HAND.items() if t], "doc_id INT, text STRING"
    )
    model = L.train_ngram_lm(df, "text", vocab_size=6, add_k=0.3)
    path = str(tmp_path / "lm_model")
    L.save_ngram_lm(model, path)
    loaded = L.load_ngram_lm(spark, path)
    assert loaded.add_k == pytest.approx(0.3)
    base = {
        r["doc_id"]: r["avg_logp"]
        for r in L.score_perplexity(df, model, "text", "doc_id").collect()
    }
    re = {
        r["doc_id"]: r["avg_logp"]
        for r in L.score_perplexity(df, loaded, "text", "doc_id").collect()
    }
    assert base.keys() == re.keys()
    for i in base:
        assert re[i] == pytest.approx(base[i], abs=1e-12)


def test_amortized_scoring_plan_shape(spark, tmp_path):
    """Scoring against a persisted model (the production shape: train
    once, score increments) is map-side until the per-doc reduce — with
    broadcastable model tables the physical plan has exactly ONE
    shuffle Exchange and no Python evaluation."""
    df = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(50)],
        "doc_id INT, text STRING",
    )
    path = str(tmp_path / "m")
    L.save_ngram_lm(L.train_ngram_lm(df, "text"), path)
    scored = L.score_perplexity(df, L.load_ngram_lm(spark, path), "text", "doc_id")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan
    assert "BatchEvalPython" not in plan
    assert scored.count() == 50
