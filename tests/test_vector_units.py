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
