"""Deterministic sampling / mixture operators (X15) + repetition rules
(X16) + PII scrubbing (X18) unit tests."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from r_e_hive__spark.functions import pii as P
from r_e_hive__spark.functions import text as TX
from r_e_hive__spark.operators import sampling as SA
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


# ---------------------------------------------------------------- X15


def test_hash_uniform_matches_duckdb(spark):
    """The cross-engine anchor: Spark's conv(md5) uniform == DuckDB's
    hex-cast uniform, bit for bit, with and without salt."""
    got = {
        r.doc_id: r.u
        for r in _docs(spark)
        .select("doc_id", SA.hash_uniform(F.col("doc_id"), "s").alias("u"))
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.execute(
            "SELECT doc_id, CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 's')),1,8)) AS BIGINT)"
            f" / 4294967296.0 FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    )
    assert got == want


def test_sample_reproducible_under_repartition(spark):
    """df.sample's documented failure mode is exactly what this operator
    fixes: the kept set must be identical for any partitioning."""
    docs = _docs(spark)
    a = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r.doc_id
        for r in SA.deterministic_sample(docs.repartition(13), "doc_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_sample_nesting_and_salt(spark):
    docs = _docs(spark)
    s10 = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert s10 <= s30  # same uniform => monotone nesting
    salted = {
        r.doc_id
        for r in SA.deterministic_sample(docs, "doc_id", 0.1, salt="other").collect()
    }
    assert salted != s10  # salt decorrelates


def test_split_corpus_partitions_exactly(spark):
    docs = _docs(spark)
    splits = SA.split_corpus(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    ids = {k: {r.doc_id for r in v.collect()} for k, v in splits.items()}
    allids = {r.doc_id for r in docs.collect()}
    assert ids["train"] | ids["val"] | ids["test"] == allids
    assert not (ids["train"] & ids["val"]) and not (ids["val"] & ids["test"])
    with pytest.raises(ValueError):
        SA.split_corpus(docs, "doc_id", {"a": 0.8, "b": 0.4})


def test_mixture_fractions_math():
    counts = {"en": 60, "de": 20, "zh": 20}
    fr = SA.mixture_fractions(counts, {"en": 0.5, "de": 0.25, "zh": 0.25})
    # binding domain: de/zh (20/0.25=80 < en 60/0.5=120) keeps everything
    assert fr["de"] == 1.0 and fr["zh"] == 1.0
    assert fr["en"] == pytest.approx(0.5 * 80 / 60)
    with pytest.raises(ValueError):
        SA.mixture_fractions({"en": 10}, {"en": 0.5, "missing": 0.5})


def test_mixture_resample_hits_target_proportions(spark):
    docs = _docs(spark)
    target = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.2}
    out = SA.mixture_resample(docs, "lang", "doc_id", target)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= set(target)  # zh (weight absent) dropped entirely
    total = sum(got.values())
    for lang, w in target.items():
        # hash sampling is binomial around the target share; the smoke
        # corpus is small, so allow a generous tolerance
        assert got[lang] / total == pytest.approx(w, abs=0.15)


def test_mixture_resample_no_collect_in_plan(spark):
    """The operator must stay fully declarative (one lazy DataFrame)."""
    docs = _docs(spark)
    out = SA.mixture_resample(docs, "lang", "doc_id", {"en": 0.5, "de": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


# ---------------------------------------------------------------- X16


def test_word_ngrams_and_repetition_fractions(spark):
    rows = [
        Row(id=1, text="a b a b a"),  # 2-grams: ab ba ab ba -> 2 distinct of 4
        Row(id=2, text="x y"),  # one 2-gram
        Row(id=3, text="solo"),  # no 2-grams
        Row(id=4, text=""),
    ]
    df = spark.createDataFrame(rows)
    g2 = TX.word_ngrams(F.col("text"), 2)
    out = {
        r.id: r
        for r in df.select(
            "id",
            F.size(g2).alias("n"),
            TX.dup_ngram_fraction(g2).alias("dup"),
            TX.top_ngram_fraction(g2).alias("top"),
        ).collect()
    }
    assert out[1].n == 4 and out[1].dup == pytest.approx(0.5)
    assert out[1].top == pytest.approx(0.5)  # 'a b' twice of 4
    assert out[2].n == 1 and out[2].dup == 0.0 and out[2].top == 1.0
    assert out[3].n == 0 and out[3].dup == 0.0 and out[3].top == 0.0
    assert out[4].n == 0


def test_repetition_stats_no_python_udf(spark):
    from r_e_hive__spark.queries.text import x16_repetition_stats

    plan = (
        x16_repetition_stats(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- X18


def test_pii_counts_and_redaction(spark):
    text = (
        "mail bob.smith+x@corp.example.org now, call 555-123-4567 or "
        "800.555.0199, host 192.168.0.1, pay 4242 4242 4242 4242 thanks"
    )
    df = spark.createDataFrame([Row(t=text)])
    row = df.select(
        P.pii_count(F.col("t"), "email").alias("e"),
        P.pii_count(F.col("t"), "phone").alias("p"),
        P.pii_count(F.col("t"), "ipv4").alias("i"),
        P.pii_count(F.col("t"), "card").alias("c"),
        P.pii_total(F.col("t")).alias("n"),
        P.redact(F.col("t")).alias("r"),
    ).collect()[0]
    assert (row.e, row.p, row.i, row.c, row.n) == (1, 2, 1, 1, 5)
    assert row.r == (
        "mail [EMAIL] now, call [PHONE] or [PHONE], host [IP], "
        "pay [CARD] thanks"
    )


def test_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([Row(t="no identifiers here, just words")])
    row = df.select(
        P.pii_total(F.col("t")).alias("n"), P.redact(F.col("t")).alias("r")
    ).collect()[0]
    assert row.n == 0 and row.r == "no identifiers here, just words"


def test_pii_patterns_match_duckdb_re2(spark):
    """The Java∩RE2 contract: every pattern produces identical counts in
    both engines on a torture string."""
    text = (
        "a@b.co x 1.2.3.4 999-999-9999 12.34 v1.2.3.4.5 a@@b.com "
        "4000-1111-2222-3333 555.123.4567 u_n%x@sub.domain.io 256.1.1.1"
    )
    con = duckdb.connect()
    for kind in P.PII_PATTERNS:
        spark_n = (
            spark.createDataFrame([Row(t=text)])
            .select(P.pii_count(F.col("t"), kind).alias("n"))
            .collect()[0]
            .n
        )
        duck_n = con.execute(
            f"SELECT {P.du_pii_count('?', kind)}".replace("?", "'" + text.replace("'", "''") + "'")
        ).fetchone()[0]
        assert spark_n == duck_n, kind


def test_repetition_grouped_matches_scalar(spark):
    """The distributed explode+groupBy repetition twin (for unbounded
    documents) must equal the scalar higher-order-function form row for
    row on the smoke corpus."""
    from r_e_hive__spark.operators.quality import repetition_stats_grouped

    docs = _docs(spark)
    g2 = TX.word_ngrams(F.col("text"), 2)
    scalar = {
        r.doc_id: (
            r.n,
            r.d,
            round(r.dup, 9),
            round(r.top, 9),
        )
        for r in docs.select(
            "doc_id",
            F.size(g2).alias("n"),
            F.size(F.array_distinct(g2)).alias("d"),
            TX.dup_ngram_fraction(g2).alias("dup"),
            TX.top_ngram_fraction(g2).alias("top"),
        ).collect()
    }
    grouped = {
        r.doc_id: (r.n_grams, r.n_distinct, round(r.dup_frac, 9), round(r.top_frac, 9))
        for r in repetition_stats_grouped(docs, "doc_id", "text", 2).collect()
    }
    assert grouped == scalar


def test_mixture_resample_missing_domain_raises(spark):
    """A target domain with zero corpus rows must fail loudly at
    execution (in-plan assert), not silently rescale the mixture."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    docs = _docs(spark)
    bad = SA.mixture_resample(
        docs, "lang", "doc_id", {"en": 0.5, "klingon": 0.5}
    )
    # in-plan raise_error surfaces raw (Py4JJavaError) or converted
    # (SparkRuntimeException) depending on session state — expect both
    with pytest.raises((Py4JJavaError, PySparkException)):
        bad.count()


def test_fixed_sample_exact_size_and_nesting(spark):
    docs = _docs(spark)
    s20 = [r.doc_id for r in SA.deterministic_fixed_sample(docs, "doc_id", 20).collect()]
    assert len(s20) == len(set(s20)) == 20
    # reproducible under repartitioning
    s20b = [
        r.doc_id
        for r in SA.deterministic_fixed_sample(
            docs.repartition(7), "doc_id", 20
        ).collect()
    ]
    assert sorted(s20) == sorted(s20b)
    # nests inside the larger fixed sample and inside a fraction sample
    s50 = {r.doc_id for r in SA.deterministic_fixed_sample(docs, "doc_id", 50).collect()}
    assert set(s20) <= s50
    frac = {r.doc_id for r in SA.deterministic_sample(docs, "doc_id", 0.9).collect()}
    assert set(s20) <= frac or len(frac) < 20  # 0.9-cutoff dominates 20 smallest
    plan = (
        SA.deterministic_fixed_sample(docs, "doc_id", 20)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_curation_composition_of_new_ops(spark):
    """Integration: quality gate -> PII redact -> mixture rebalance ->
    split labels, composed as ONE lazy plan over documents — the round-5
    operator families working together as a curation pipeline."""
    from r_e_hive__spark.operators.quality import repetition_stats_grouped

    docs = _docs(spark)
    g2 = TX.word_ngrams(F.col("text"), 2)
    gated = docs.where(TX.top_ngram_fraction(g2) <= F.lit(0.5))
    redacted = gated.withColumn("text", P.redact(F.col("text")))
    mixed = SA.mixture_resample(
        redacted, "lang", "doc_id", {"en": 0.5, "de": 0.5}
    )
    labeled = mixed.withColumn(
        "split", SA.split_label(F.col("doc_id"), {"train": 0.9, "val": 0.1})
    )
    rows = labeled.select("doc_id", "lang", "split").collect()
    assert rows and {r.lang for r in rows} <= {"en", "de"}
    assert {r.split for r in rows} <= {"train", "val"}
    # and the grouped repetition stats join back onto the survivors
    stats = repetition_stats_grouped(labeled, "doc_id", "text", 2)
    assert stats.count() == len(rows)


def test_filter_blocklist_domains_and_subdomains(spark):
    from pyspark.sql import Row

    from r_e_hive__spark.operators.quality import filter_blocklist

    rows = [
        Row(doc_id=1, url="https://spam.example.com/page?q=1"),
        Row(doc_id=2, url="http://EXAMPLE.com/other"),        # case-folded
        Row(doc_id=3, url="https://sub.deep.example.com/x"),  # subdomain
        Row(doc_id=4, url="https://goodsite.org/a"),
        Row(doc_id=5, url="https://notexample.com/b"),        # NOT a suffix match
        Row(doc_id=6, url="not a url at all"),                # unparseable: kept
    ]
    df = spark.createDataFrame(rows)
    kept = sorted(
        r.doc_id
        for r in filter_blocklist(df, "url", ["example.com"]).collect()
    )
    assert kept == [4, 5, 6]
    # exact-host mode keeps subdomains
    kept_exact = sorted(
        r.doc_id
        for r in filter_blocklist(
            df, "url", ["example.com"], include_subdomains=False
        ).collect()
    )
    assert kept_exact == [1, 3, 4, 5, 6]


def test_filter_blocklist_trailing_dot_fqdn_no_bypass(spark):
    """The absolute-FQDN form (trailing root-label dot) must not evade the
    gate, in either matching mode and on either side of the comparison
    (round-5 code review)."""
    from pyspark.sql import Row

    from r_e_hive__spark.operators.quality import filter_blocklist

    rows = [
        Row(doc_id=1, url="https://example.com./x"),       # FQDN dot
        Row(doc_id=2, url="https://spam.example.com./y"),  # FQDN + subdomain
        Row(doc_id=3, url="https://goodsite.org./z"),      # FQDN, clean
    ]
    df = spark.createDataFrame(rows)
    kept = {
        r.doc_id
        for r in filter_blocklist(df, "url", ["example.com"]).collect()
    }
    assert kept == {3}
    kept_exact = {
        r.doc_id
        for r in filter_blocklist(
            df, "url", ["example.com"], include_subdomains=False
        ).collect()
    }
    assert kept_exact == {2, 3}
    # blocklist entries given in FQDN form are normalized too
    kept_bl = {
        r.doc_id
        for r in filter_blocklist(df, "url", ["example.com."]).collect()
    }
    assert kept_bl == {3}


# ------------------------------------------------------------ percentile gate


def test_percentile_gate_exact_python_differential(spark):
    import random

    from r_e_hive__spark.operators.quality import percentile_gate

    rng = random.Random(31)
    rows = [(i, f"g{i % 3}", rng.random()) for i in range(300)]
    # inject ties at a likely boundary
    rows += [(1000 + j, "g0", 0.5) for j in range(10)]
    df = spark.createDataFrame(rows, "id INT, grp STRING, score DOUBLE")
    for frac in (0.1, 0.3, 0.75, 1.0):
        got = {
            r["id"]
            for r in percentile_gate(
                df, "score", frac, ["grp"], strategy="exact"
            ).collect()
        }
        want = set()
        by_grp = {}
        for i, g, s in rows:
            by_grp.setdefault(g, []).append((s, i))
        for g, members in by_grp.items():
            members.sort(key=lambda t: -t[0])
            n = len(members)
            for rank, (s, i) in enumerate(members):
                # percent_rank semantics: ties share the FIRST index of
                # their run
                first = next(
                    idx for idx, (s2, _) in enumerate(members) if s2 == s
                )
                pr = 0.0 if n == 1 else first / (n - 1)
                if pr <= frac:
                    want.add(i)
        assert got == want, frac


def test_percentile_gate_keyless_exact_distributed(spark):
    """Round-5 VERDICT item 7: the keyless exact gate must not degrade to
    a single-partition global sort.  The default keyless path is the
    range-partition + offset-carry form; its kept set must be IDENTICAL
    to the forced single-window form (distributed=False) including tie
    groups at the boundary, and its plan must show the range exchange on
    the data (not one global sort partition)."""
    import random

    from r_e_hive__spark.operators.quality import percentile_gate

    rng = random.Random(41)
    rows = [(i, rng.random()) for i in range(5000)]
    rows += [(9000 + j, 0.75) for j in range(25)]  # boundary tie group
    df = spark.createDataFrame(rows, "id INT, score DOUBLE")
    for frac in (0.1, 0.25, 0.8):
        dist = percentile_gate(df, "score", frac, strategy="exact")
        single = percentile_gate(
            df, "score", frac, strategy="exact", distributed=False
        )
        got = {r["id"] for r in dist.collect()}
        want = {r["id"] for r in single.collect()}
        assert got == want, frac
    # the scale invariant: the rank window is partition-LOCAL (_pg_pid in
    # its spec) — distributed=False's keyless window has no partition
    # keys.  (The checkpointed range exchange itself is upstream of the
    # visible plan; at this row count AQE legitimately coalesces the tiny
    # byte-proportional shuffle, so partition COUNT is asserted under
    # coalescing disabled below.)
    final = percentile_gate(df, "score", 0.25, strategy="exact")
    plan = final._jdf.queryExecution().executedPlan().toString()
    win_lines = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "rank(" in ln
    ]
    assert win_lines and all("_pg_pid" in ln for ln in win_lines), plan
    conf = spark.conf
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = conf.get(key)
    try:
        conf.set(key, "false")
        np = percentile_gate(
            df, "score", 0.25, strategy="exact"
        ).rdd.getNumPartitions()
        assert np > 1, np
    finally:
        conf.set(key, old)
    # grouped + distributed=True is invalid (per-group windows parallelize)
    import pytest as _pt

    with _pt.raises(ValueError, match="keyless"):
        percentile_gate(
            df.withColumn("g", F.lit("a")), "score", 0.5, ["g"],
            strategy="exact", distributed=True,
        )


def test_percentile_gate_approx_close_to_exact_and_mapside(spark):
    import random

    from r_e_hive__spark.operators.quality import percentile_gate

    rng = random.Random(37)
    rows = [(i, f"g{i % 4}", rng.gauss(0, 1)) for i in range(4000)]
    rows += [(9000, "g0", None)]  # NULL score always dropped
    df = spark.createDataFrame(rows, "id INT, grp STRING, score DOUBLE")
    exact = {
        r["id"]
        for r in percentile_gate(df, "score", 0.3, ["grp"], strategy="exact").collect()
    }
    approx = {
        r["id"]
        for r in percentile_gate(df, "score", 0.3, ["grp"]).collect()
    }
    assert 9000 not in exact and 9000 not in approx
    # boundary divergence only: symmetric difference tiny, bulk identical
    assert len(exact ^ approx) <= 0.01 * len(exact)
    assert len(approx) == pytest.approx(0.3 * 4000, rel=0.05)
    # determinism: two runs identical
    again = {
        r["id"] for r in percentile_gate(df, "score", 0.3, ["grp"]).collect()
    }
    assert approx == again
    # global (no groups) form works and filters
    g = percentile_gate(df, "score", 0.5).count()
    assert g == pytest.approx(2000, rel=0.05)


def test_percentile_gate_validation(spark):
    from r_e_hive__spark.operators.quality import percentile_gate

    df = spark.createDataFrame([(1, 0.5)], "id INT, score DOUBLE")
    with pytest.raises(ValueError, match="keep_fraction"):
        percentile_gate(df, "score", 0.0)
    with pytest.raises(ValueError, match="keep_fraction"):
        percentile_gate(df, "score", 1.5)
    with pytest.raises(ValueError, match="unknown strategy"):
        percentile_gate(df, "score", 0.5, strategy="magic")


def test_percentile_gate_null_group_key_gated_not_dropped(spark):
    """Rows with a NULL group key must be percentile-gated like any other
    group in BOTH strategies, not silently dropped by a non-null-safe
    join (round-5 code review, verified divergence)."""
    from r_e_hive__spark.operators.quality import percentile_gate

    rows = [(i, None, float(i)) for i in range(10)] + [
        (100 + i, "g1", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id INT, grp STRING, score DOUBLE")
    exact = {
        r["id"]
        for r in percentile_gate(df, "score", 0.5, ["grp"], strategy="exact").collect()
    }
    approx = {
        r["id"]
        for r in percentile_gate(df, "score", 0.5, ["grp"]).collect()
    }
    assert {i for i in exact if i < 100}, "NULL group must survive exact"
    assert {i for i in approx if i < 100}, "NULL group must survive approx"
    # exact keeps the strict top half; approx's quantile lands ON a data
    # value here, keeping one extra boundary row per group (the documented
    # strategy difference) — both treat the NULL group exactly like g1
    assert exact == {5, 6, 7, 8, 9, 105, 106, 107, 108, 109}
    assert approx == {4, 5, 6, 7, 8, 9, 104, 105, 106, 107, 108, 109}


def test_percentile_gate_strategy_validated_before_noop(spark):
    from r_e_hive__spark.operators.quality import percentile_gate

    df = spark.createDataFrame([(1, 0.5)], "id INT, score DOUBLE")
    with pytest.raises(ValueError, match="unknown strategy"):
        percentile_gate(df, "score", 1.0, strategy="aprox")


# -------------------------------------------------------------- corpus report


def test_corpus_report_matches_python_aggregation(spark):
    """Data-card aggregation differential: per-doc columns come from the
    SAME text functions the declared x5 query oracle-pins; the report's
    aggregation logic is replayed in pure Python over them."""
    import math

    from r_e_hive__spark.functions.text import fingerprint, n_tokens, quality_score
    from r_e_hive__spark.operators.quality import corpus_report

    from r_e_hive__spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        n_tokens(F.col("text")).alias("nt"),
        quality_score(F.col("text")).alias("q"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    groups = {}
    for r in per_doc:
        groups.setdefault((r["source"], r["lang"]), []).append(r)

    def pct(sorted_vals, p):
        # Spark F.percentile: exact interpolated (1-based rank arithmetic)
        n = len(sorted_vals)
        pos = (n - 1) * p
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        frac = pos - lo
        return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac

    got = {
        (r["source"], r["lang"]): r
        for r in corpus_report(docs, "text").collect()
    }
    assert set(got) == set(groups)
    for key, members in groups.items():
        g = got[key]
        nts = sorted(m["nt"] for m in members)
        assert g["n_docs"] == len(members)
        assert g["n_tokens"] == sum(nts)
        assert g["avg_tokens"] == pytest.approx(
            round(sum(nts) / len(nts), 4), abs=1e-9
        )
        assert g["p50_tokens"] == pytest.approx(pct(nts, 0.5), abs=1e-9)
        assert g["p90_tokens"] == pytest.approx(pct(nts, 0.9), abs=1e-9)
        assert g["avg_quality"] == pytest.approx(
            round(sum(m["q"] for m in members) / len(members), 4), abs=2e-4
        )
        dup = 1.0 - len({m["fp"] for m in members}) / len(members)
        assert g["dup_fraction"] == pytest.approx(dup, abs=1e-9)
    # (dup_fraction > 0 cases are pinned by the null-slice test below —
    # the smoke corpus's exact dups happen to span slices, not share one)


def test_corpus_report_null_group_slice(spark):
    from r_e_hive__spark.operators.quality import corpus_report

    df = spark.createDataFrame(
        [
            (1, "src", None, "hello world abc"),
            (2, "src", "en", "the quick brown fox"),
            (3, "src", "en", "the quick brown fox"),
        ],
        "doc_id INT, source STRING, lang STRING, text STRING",
    )
    rows = {
        (r["source"], r["lang"]): r
        for r in corpus_report(df, "text").collect()
    }
    assert ("src", None) in rows  # NULL lang is its own slice
    assert rows[("src", "en")]["n_docs"] == 2
    assert rows[("src", "en")]["dup_fraction"] == pytest.approx(0.5)


def test_corpus_report_null_text_dup_accounting(spark):
    """NULL-text docs have no fingerprint: they must not inflate (or
    denominate) the duplicate fraction — an all-NULL slice is 0% dups,
    not 100%."""
    from r_e_hive__spark.operators.quality import corpus_report

    df = spark.createDataFrame(
        [
            (1, "s", "xx", None),
            (2, "s", "xx", None),
            (3, "s", "en", "same text"),
            (4, "s", "en", "same text"),
            (5, "s", "en", None),
        ],
        "doc_id INT, source STRING, lang STRING, text STRING",
    )
    rows = {
        (r["source"], r["lang"]): r
        for r in corpus_report(df, "text").collect()
    }
    assert rows[("s", "xx")]["dup_fraction"] == 0.0
    # en: 2 fingerprintable docs, 1 distinct -> 0.5; the NULL doc ignored
    assert rows[("s", "en")]["dup_fraction"] == pytest.approx(0.5)
    assert rows[("s", "en")]["n_docs"] == 3


def test_corpus_report_mean_half_up_on_exact_tie(spark):
    """The integer-arithmetic mean must round HALF_UP on an exact .xxxx5
    tie — the case where ROUND(double, 4) diverges between engines
    (Spark rounds the shortest decimal rendering 0.57505→0.5751, DuckDB
    rounds the binary value →0.575; measured on the sf0.01 fixture and
    the reason corpus_report avoids doubles entirely).

    Construction: 32 docs totalling 33 tokens → avg = 33/32 = 1.03125
    exactly (binary-terminating, so the tie is EXACT, not a
    representation artifact).  HALF_UP at 4 dp gives 1.0313; banker's
    rounding or binary-value ROUND would give 1.0312."""
    from r_e_hive__spark.operators.quality import corpus_report

    rows = [(i, "s", "en", "tok") for i in range(31)] + [
        (31, "s", "en", "tok tok")
    ]
    df = spark.createDataFrame(
        rows, "doc_id INT, source STRING, lang STRING, text STRING"
    )
    got = corpus_report(df, "text").collect()[0]
    assert got["n_docs"] == 32 and got["n_tokens"] == 33
    assert got["avg_tokens"] == 1.0313
    # and the same tie through the DuckDB oracle arithmetic form
    import duckdb

    du = duckdb.connect().execute(
        "SELECT CAST((2 * SUM(CAST(nt AS BIGINT) * 10000) + COUNT(nt))"
        "     // (2 * COUNT(nt)) AS DOUBLE) / 10000.0"
        " FROM (SELECT CASE WHEN i < 32 THEN 1 ELSE 2 END AS nt"
        "       FROM generate_series(1, 32) t(i))"
    ).fetchone()[0]
    assert du == got["avg_tokens"] == 1.0313


def test_normalize_ccnet_dedup_key(spark):
    """CCNet hashing normalization (functions/text.normalize_ccnet):
    accent strip, casefold (incl. one-to-many like German sharp s),
    digit bucketing, punctuation removal, whitespace collapse — so
    trivially re-rendered copies produce ONE dedup key; NULL passes
    through; composes with exact_dedup."""
    from r_e_hive__spark.functions.text import normalize_ccnet
    from r_e_hive__spark.operators.dedup import exact_dedup

    rows = [
        (1, "Héllo,   Wörld! 2024"),
        (2, "hello world 1999"),        # same key: accents/case/digits/punct
        (3, "HELLO — WORLD…0000"),      # same key again
        (4, "Straße"),
        (5, "strasse"),                 # casefold: ß -> ss
        (6, None),
        (7, "different entirely"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    keyed = df.withColumn("k", normalize_ccnet(F.col("text")))
    got = {r["id"]: r["k"] for r in keyed.collect()}
    assert got[1] == got[2] == got[3] == "hello world 0000"
    assert got[4] == got[5] == "strasse"
    assert got[6] is None
    survivors = {
        r["id"] for r in exact_dedup(keyed, ["k"], "id").collect()
    }
    assert survivors == {1, 4, 6, 7}


# ------------------------------------------------- weighted sampling (E-S)


def test_weighted_sample_matches_duckdb_replay(spark):
    """The E-S construction is a pure expression over the md5 uniform, so
    DuckDB replays the exact selected set (same log-space key, same
    tiebreak) — full cross-engine differential like every X15 sampler."""
    docs = _docs(spark).withColumn(
        "w", (F.col("n_chars") % 7 + 1).cast("double")
    )
    got = {
        r.doc_id
        for r in SA.weighted_sample_n(docs, "doc_id", "w", 200, salt="s").collect()
    }
    con = duckdb.connect()
    want = {
        r[0]
        for r in con.execute(
            f"""
            WITH d AS (
              SELECT doc_id, CAST(n_chars % 7 + 1 AS DOUBLE) AS w,
                     CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 's')),1,8)) AS BIGINT)
                     / 4294967296.0 AS u
              FROM read_parquet('{SF_SMOKE}/documents.parquet')
            )
            SELECT doc_id FROM d WHERE w > 0
            ORDER BY ln(greatest(u, pow(2.0, -32))) / w DESC, doc_id
            LIMIT 200
            """
        ).fetchall()
    }
    assert got == want and len(got) == 200


def test_weighted_sample_properties(spark):
    docs = _docs(spark)
    n_docs = docs.count()
    # extreme weights dominate: the 10 heavy rows always make the sample
    heavy = docs.withColumn(
        "w",
        F.when(F.col("doc_id") < 10, 1e9).otherwise(1e-9),
    )
    got = {
        r.doc_id for r in SA.weighted_sample_n(heavy, "doc_id", "w", 15).collect()
    }
    assert set(range(10)) <= got and len(got) == 15
    # deterministic under repartitioning
    uni = docs.withColumn("w", F.lit(1.0))
    a = {r.doc_id for r in SA.weighted_sample_n(uni, "doc_id", "w", 50).collect()}
    b = {
        r.doc_id
        for r in SA.weighted_sample_n(uni.repartition(17), "doc_id", "w", 50).collect()
    }
    assert a == b and len(a) == 50
    # raising one row's weight never evicts it (E-S key monotone in w)
    some = sorted(a)[0]
    bumped = uni.withColumn(
        "w", F.when(F.col("doc_id") == some, 100.0).otherwise(F.col("w"))
    )
    c = {r.doc_id for r in SA.weighted_sample_n(bumped, "doc_id", "w", 50).collect()}
    assert some in c
    # NULL/zero/negative weights carry no mass
    mixed = docs.withColumn(
        "w",
        F.when(F.col("doc_id") % 3 == 0, None)
        .when(F.col("doc_id") % 3 == 1, -1.0)
        .otherwise(1.0),
    )
    s = SA.weighted_sample_n(mixed, "doc_id", "w", n_docs)
    assert {r.doc_id % 3 for r in s.collect()} == {2}
    # NULL keys are excluded, never padded in: a NULL key's E-S key is
    # NULL (sorts last desc), so an under-full sample would otherwise
    # silently absorb NULL-key rows (round-6 ADVICE).  3 valid rows,
    # n=10 → exactly the 3 valid rows come back.
    nullkey = spark.createDataFrame(
        [(1, 1.0), (2, 1.0), (3, 1.0), (None, 1.0), (None, 5.0)],
        "doc_id INT, w DOUBLE",
    )
    got_nk = SA.weighted_sample_n(nullkey, "doc_id", "w", 10).collect()
    assert sorted(r.doc_id for r in got_nk) == [1, 2, 3]
    with pytest.raises(ValueError):
        SA.weighted_sample_n(docs.withColumn("w", F.lit(1.0)), "doc_id", "w", 0)


def test_filter_blocklist_cross_engine_differential(spark):
    """X21 gate decision replayed in DuckDB (round-9 rotation prep): host
    extraction (lowercase, strip trailing root-label dots), dot-boundary
    subdomain-suffix matching, exact-host mode, and the keep-NULL-host
    rule, pinned against an independent SQL formulation — NOT EXISTS over
    (h = b OR h LIKE '%.'||b) vs the engine's suffix-explode broadcast
    anti-join.  Domain note: the DuckDB twin extracts hosts with an
    RFC-shaped regex that agrees with Spark's try_parse_url on
    well-formed and clearly-malformed inputs (verified here); inputs in
    the gray zone (embedded spaces etc.) are out of the twin's domain
    and covered by the Spark-side unit tests above."""
    import duckdb
    import pandas as pd

    from r_e_hive__spark.operators.quality import filter_blocklist

    urls = [
        "https://example.com/a",
        "https://sub.example.com/b",
        "https://deep.sub.example.com/c?q=1",
        "http://examplE.com./trailing-dot-evasion",
        "https://notexample.com/keep",  # suffix needs a dot boundary
        "https://shady.net/x",
        "https://user@sub.shady.net:8080/auth-and-port",
        "https://notshady.net/keep",
        "ftp://files.example.org/f",
        "https://xn--caf-dma.fr/menu",
        "not a url at all",  # NULL host -> kept
        None,  # NULL url -> kept
    ]
    blocked = ["example.com", "shady.net"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id INT, url STRING")

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"id": range(len(urls)), "url": urls}))
    con.register("bl", pd.DataFrame({"b": [d.lower().rstrip(".") for d in blocked]}))
    host = (
        "NULLIF(regexp_replace(lower(regexp_extract(url,"
        " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)', 1)),"
        " '\\.+$', ''), '')"
    )
    for sub in (True, False):
        got = sorted(
            r["id"]
            for r in filter_blocklist(df, "url", blocked, include_subdomains=sub).collect()
        )
        match = "h = b OR h LIKE '%.' || b" if sub else "h = b"
        want = sorted(
            r[0]
            for r in con.execute(
                f"""WITH hosts AS (SELECT id, {host} AS h FROM t)
                    SELECT id FROM hosts
                    WHERE h IS NULL
                       OR NOT EXISTS (SELECT 1 FROM bl WHERE {match})
                    ORDER BY id"""
            ).fetchall()
        )
        assert got == want, f"include_subdomains={sub}: {got} vs {want}"
    # sanity on content, not just engine agreement: evasions blocked,
    # dot-boundary lookalikes kept
    kept = {r["id"] for r in filter_blocklist(df, "url", blocked).collect()}
    assert {3, 6} & kept == set()  # trailing-dot + userinfo/port evasions
    assert {4, 7, 10, 11} <= kept  # lookalikes and NULL hosts stay
