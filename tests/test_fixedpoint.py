"""Fixed-point money arithmetic contract (functions/fixedpoint.py).

The engine's fast aggregation path converts money doubles to unscaled
integer units (``unscaled_fast``: pure double arithmetic, zero allocation)
instead of the per-row decimal cast (``unscaled``).  The contract is that
the two are EQUAL on every money column the engine aggregates — asserted
here per shipped scale factor — and that the round-trip back to decimal
(``money_of_units``) reproduces the decimal-cast value exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from r_e_hive__spark.catalog import load_table
from r_e_hive__spark.functions import fixedpoint as fp

_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# (table, column, scale) — every money/rate column the declared queries
# aggregate through the fixed-point path
_MONEY_COLS = [
    ("lineitem", "l_extendedprice", 2),
    ("lineitem", "l_quantity", 2),
    ("lineitem", "l_discount", 2),
    ("lineitem", "l_tax", 2),
    ("orders", "o_totalprice", 2),
    ("events", "value", 2),
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
def test_unscaled_fast_equals_decimal_cast_on_testdata(spark, sf_dir):
    """fast (double) and exact (decimal-cast) unit conversion agree on every
    money column at this SF — zero mismatching rows."""
    for table, col, scale in _MONEY_COLS:
        df = load_table(spark, sf_dir, table)
        n_bad = df.where(
            ~(fp.unscaled_fast(col, scale).eqNullSafe(fp.unscaled(col, 12, scale)))
        ).count()
        assert n_bad == 0, f"{table}.{col} @ {sf_dir}: {n_bad} mismatches"


def test_unscaled_fast_synthetic_edge_values(spark):
    """2-dp-exact doubles (incl. negatives, zero, large magnitudes) convert
    identically through both paths, and the decimal round-trip is exact."""
    cents = [0, 1, -1, 5, -5, 99, -99, 100, 12345678901, -12345678901, 50, 150, 250]
    vals = [c / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select(
        fp.unscaled_fast("x", 2).alias("fast"),
        fp.unscaled("x", 12, 2).alias("exact"),
        fp.money_of_units(fp.unscaled_fast("x", 2), 2).alias("back"),
        F.col("x").cast("decimal(12,2)").cast("double").alias("want"),
    ).collect()
    for r, c in zip(rows, cents):
        assert r.fast == r.exact == c
        assert r.back == r.want


def test_unscaled_fast_tolerates_float_noise(spark):
    """Values within 1e-6 of a 2-dp point (the documented exactness domain —
    e.g. money that was summed in doubles upstream) still land on the same
    cent as the decimal cast."""
    base = [(i * 7919 % 100000) / 100.0 for i in range(1, 500)]
    noisy = [v + e for v in base for e in (-9.9e-7, 0.0, 9.9e-7)]
    df = spark.createDataFrame([(v,) for v in noisy], "x double")
    n_bad = df.where(
        ~(fp.unscaled_fast("x", 2).eqNullSafe(fp.unscaled("x", 12, 2)))
    ).count()
    assert n_bad == 0


def test_fixed_point_sum_matches_decimal_sum(spark):
    """A grouped fixed-point sum equals the grouped decimal sum exactly —
    the substitution the hot aggregation queries (q1/q3/q5/st2) rely on."""
    df = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    got = (
        df.groupBy("l_returnflag")
        .agg(fp.money_of_units(F.sum(fp.unscaled_fast("l_extendedprice")), 2).alias("s"))
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        df.groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("s")
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [(r.l_returnflag, r.s) for r in got] == [(r.l_returnflag, r.s) for r in want]


def test_scale_zero_and_guards(spark):
    """Round-4 review: scale=0 converts whole units exactly (the string-
    multiplier construction would have built '0.1' and DECIMAL(0,0));
    negative scales raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from r_e_hive__spark.functions import fixedpoint as fp

    df = spark.createDataFrame([(7,), (42,)], "u long")
    got = sorted(
        str(r["d"]) for r in df.select(fp.decimal_of_units(F.col("u"), 0).alias("d")).collect()
    )
    assert got == ["42", "7"]
    assert "DECIMAL(37,0)" in fp.money_of_units_sql("u", 0)
    with _pytest.raises(ValueError):
        fp.decimal_of_units(F.col("u"), -1)
