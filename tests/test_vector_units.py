"""Round-11 optimization pin: the integer-units formulation of the exact
decimal vector math (vector.dot_units / norm2_units / units_lit) must be
BIT-IDENTICAL to the decimal spec (dot_exact / norm2_exact) on adversarial
inputs — the declared x3/x17/x25/x4 oracles verify it end-to-end on the
fixture corpus; this test pins the equivalence on the edge classes the
corpus does not contain (NULL vectors, NULL elements, length mismatches,
empty arrays, zero vectors, half-ulp rounding boundaries, sign of zero,
large magnitudes near the documented bound)."""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.functions import vector as V

ADVERSARIAL = [
    # (id, vector)
    (0, [0.1, -0.2, 0.3]),
    (1, [1.0, 1.0, 1.0]),
    (2, [0.0, 0.0, 0.0]),                      # zero vector
    (3, None),                                  # NULL vector
    (4, [0.5, None, 0.25]),                     # NULL element
    (5, [0.0000005, -0.0000005, 0.00000049]),   # half-ulp-at-6dp boundary
    (6, [1 / 3, -2 / 3, 2 / 7]),                # non-terminating binary
    (7, [-0.0, 0.0, -0.0]),                     # signed zeros
    (8, [300.123456, -299.999999, 123.4567891]),  # large but in-bound
    (9, [1e-7, -1e-7, 9.9e-7]),                 # sub-quantum values
    (10, [0.5, 0.25]),                          # short (length mismatch)
    (11, []),                                   # empty
]


def _frame(spark):
    return spark.createDataFrame(
        ADVERSARIAL, "id BIGINT, v ARRAY<DOUBLE>"
    )


def test_dot_units_bit_identical_to_dot_exact(spark):
    df = _frame(spark)
    a = df.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = df.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).select(
        "ia",
        "ib",
        V.dot_exact(F.col("va"), F.col("vb")).alias("spec"),
        V.dot_units(
            V.units_arr(F.col("va")), V.units_arr(F.col("vb"))
        ).alias("units"),
        V.dot_exact(F.col("va"), F.col("vb")).cast("double").alias("spec_d"),
        V.dot_units(V.units_arr(F.col("va")), V.units_arr(F.col("vb")))
        .cast("double")
        .alias("units_d"),
    )
    rows = pairs.collect()
    assert len(rows) == len(ADVERSARIAL) ** 2
    for r in rows:
        assert r["spec"] == r["units"], (r["ia"], r["ib"], r["spec"], r["units"])
        # the terminal double must match BITWISE (repr distinguishes -0.0)
        assert repr(r["spec_d"]) == repr(r["units_d"]), (r["ia"], r["ib"])


def test_dot_units_type_matches_spec(spark):
    df = _frame(spark)
    out = df.select(
        V.dot_exact(F.col("v"), F.col("v")).alias("spec"),
        V.norm2_units(V.units_arr(F.col("v"))).alias("units"),
    )
    spec_t = dict(out.dtypes)["spec"]
    units_t = dict(out.dtypes)["units"]
    assert spec_t == "decimal(38,12)"
    assert units_t == "decimal(38,12)"


def test_units_lit_matches_data_side_quantization(spark):
    """units_lit (one parsed SQL literal per frozen vector) must quantize
    exactly like units_arr applied to the same values arriving as data —
    otherwise centroid assignment could diverge from the oracle's replay."""
    vals = [0.1, -0.2, 1 / 3, 0.0000005, -0.0000005, 1e-7, 300.1234565, -0.0]
    df = spark.range(1).select(
        V.units_lit(vals).alias("lit"),
        V.units_arr(F.array(*[F.lit(float(x)) for x in vals])).alias("data"),
    )
    r = df.collect()[0]
    assert list(r["lit"]) == list(r["data"])


def test_sql_renderers_match_column_spec(spark):
    """Round-11 build-time pin: the SQL-string renderers (vector.*_sql)
    must produce the SAME VALUES as their Column-API specs on the
    adversarial frame — they exist only to collapse hundreds of py4j
    round-trips per plan build into one F.expr parse, never to change a
    result."""
    df = _frame(spark).withColumn("w", F.reverse(F.col("v")))
    pairs = [
        (F.expr(V.units_arr_sql("v")), V.units_arr(F.col("v"))),
        (F.expr(V.dot_units_sql(V.units_arr_sql("v"), V.units_arr_sql("w"))),
         V.dot_units(V.units_arr(F.col("v")), V.units_arr(F.col("w")))),
        (F.expr(V.norm2_units_sql(V.units_arr_sql("v"))),
         V.norm2_units(V.units_arr(F.col("v")))),
        (F.expr(V.dot_sql("v", "w")), V.dot(F.col("v"), F.col("w"))),
        (F.expr(V.norm_sql("v")), V.norm(F.col("v"))),
        (F.expr(V.cosine_sql("v", "w")), V.cosine(F.col("v"), F.col("w"))),
    ]
    sel = []
    for i, (sql_col, spec_col) in enumerate(pairs):
        sel += [sql_col.alias(f"s{i}"), spec_col.alias(f"c{i}")]
    for row in df.select(*sel).collect():
        for i in range(len(pairs)):
            assert row[f"s{i}"] == row[f"c{i}"], (row["v"] if "v" in row else i, i)


def test_units_lit_sql_and_lit_vec_sql_match_lits(spark):
    vals = [0.1, -1 / 3, 0.0, 1e-7, -0.0, 300.123456]
    df = spark.range(1)
    row = df.select(
        F.expr(V.units_lit_sql(vals)).alias("u_sql"),
        V.units_lit(vals).alias("u_col"),
        F.expr(V.lit_vec_sql(vals)).alias("d_sql"),
        F.array(*[F.lit(float(x)) for x in vals]).alias("d_col"),
    ).collect()[0]
    assert row["u_sql"] == row["u_col"]
    assert row["d_sql"] == row["d_col"]


def test_centroid_scores_sql_path_matches_column_path(spark):
    """_centroid_scores(str) — the one-parse SQL fast path — must agree
    with _centroid_scores(Column) in both modes, including NULL vectors
    and zero vectors (the dimension guard is exercised separately)."""
    from r_e_hive__spark.operators.similarity import _centroid_scores

    cents = [[0.1, -0.2, 0.3], [1 / 3, 0.25, -0.5], [0.0, 0.0, 1.0]]
    ok = [r for r in ADVERSARIAL if r[1] is None or len(r[1]) == 3]
    df = spark.createDataFrame(ok, "id BIGINT, v ARRAY<DOUBLE>")
    for exact in (False, True):
        got = df.select(
            F.col("id"),
            _centroid_scores("v", cents, exact).alias("s"),
            _centroid_scores(F.col("v"), cents, exact).alias("c"),
        ).collect()
        for r in got:
            assert r["s"] == r["c"], (r["id"], exact)


def test_centroid_scores_sql_guard_still_raises(spark):
    from pyspark.sql.utils import AnalysisException

    from r_e_hive__spark.operators.similarity import _centroid_scores

    cents = [[0.1, -0.2, 0.3]]
    df = spark.createDataFrame([(10, [0.5, 0.25])], "id BIGINT, v ARRAY<DOUBLE>")
    for exact in (False, True):
        try:
            df.select(_centroid_scores("v", cents, exact).alias("s")).collect()
        except Exception as exc:  # SparkRuntimeException wraps assert_true
            assert "centroid dimension" in str(exc)
        else:
            raise AssertionError(f"dimension guard did not fire (exact={exact})")


def test_quantize_embeddings_sql_matches_spec(spark):
    """quantize_embeddings' parsed expressions vs the original Column
    construction, replayed inline."""
    from r_e_hive__spark.operators.similarity import quantize_embeddings

    df = _frame(spark)
    got = quantize_embeddings(df, "v").select("id", "q_scale", "q_codes")
    amax = F.array_max(F.transform(F.col("v"), lambda x: F.abs(x.cast("double"))))
    with_scale = df.withColumn("e_scale", (amax / F.lit(127.0)).cast("double"))
    codes = F.transform(
        F.col("v"),
        lambda x: F.when(
            F.col("e_scale") > 0, F.round(x.cast("double") / F.col("e_scale"), 0)
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    want = with_scale.withColumn("e_codes", codes).select("id", "e_scale", "e_codes")
    g = {r["id"]: (r["q_scale"], r["q_codes"]) for r in got.collect()}
    w = {r["id"]: (r["e_scale"], r["e_codes"]) for r in want.collect()}
    assert g == w
