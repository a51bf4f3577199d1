"""Fixed-point money arithmetic: exact decimal semantics at long-integer speed.

The engine's money contract (SURVEY.md §1.3, fixing the reference's float
money math at render-complete-deploy.js:228/303) is *exact decimal results*.
The straightforward implementation — ``CAST(x AS DECIMAL(12,2))`` per row and
``SUM`` over decimal — is exact but slow: every cast allocates a JVM
``BigDecimal`` (``Decimal.fromDecimal(BigDecimal.valueOf(x))``) and every
product above precision 18 (e.g. ``decimal(12,2) * (1±decimal(3,2)) *
(1±decimal(3,2))`` → ``decimal(20,6)``) plus every sum buffer
(input precision + 10 > 18) leaves Spark's long-backed Decimal fast path and
aggregates byte-array BigDecimals.  Measured at sf5 (30 M lineitem rows,
cached, local[32]): the decimal Q1 aggregation costs ~1.2 s; the fixed-point
formulation below ~0.39 s — identical results, bit-for-bit.

The fixed-point scheme: convert each money value to its *unscaled* integer
units (cents for scale 2) as a plain BIGINT once, do all multiplication and
summation in integer arithmetic inside whole-stage codegen, and convert the
final per-GROUP total — a handful of rows — back to an exact decimal.
Integer math is associative, so distributed summation order cannot change
the result (the same property the decimal path has, and doubles lack).

Overflow bound (the 100 TB question): a BIGINT accumulator holds ±9.2e18.
Scale-2 money units: a group total overflows at 9.2e16 dollars — four
orders of magnitude above world GDP.  Scale-6 units (a price × two ±1.xx
factors, as in Q1's ``sum_charge``): overflow at 9.2e12 dollars per group,
still ~60× US GDP.  Per-row products are bounded by 1.2e11 (a decimal(12,2)
price × 110 × 110), so ~7.6e7 rows/group/partition before a *partial* sum
could overflow — two orders of magnitude above a 128 MB scan partition's row
count.  Conclusion: for money semantics (the reference's domain) the long
path cannot overflow in practice; columns with unbounded magnitude should
keep the decimal path.

Conversion fidelity: ``unscaled`` (the default) goes through the decimal
cast itself (``CAST(x AS DECIMAL(p,s)) * 10^s → BIGINT``) — bit-identical
to the decimal path for every input, still long-backed per row.
``unscaled_fast`` is pure double arithmetic (``FLOOR(x*10^s + 0.5)``), no
per-row object allocation at all; it is exact whenever the double is within
1e-6 of an s-dp value (true for every money column the driver generates —
asserted in tests/test_fixedpoint.py — and for any data produced by writing
s-dp decimals as doubles), diverging from the decimal cast only on inputs
that need rounding at digit s+1, where no s-dp-exact double can sit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def unscaled(c: Column | str, precision: int = 12, scale: int = 2) -> Column:
    """``x → round(x * 10^scale)`` as BIGINT via the decimal cast (exact for
    every input; per-row cost = one long-backed decimal cast)."""
    d = _col(c).cast(f"decimal({precision},{scale})")
    return (d * (10**scale)).cast("long")


def unscaled_fast(c: Column | str, scale: int = 2) -> Column:
    """``x → round(x * 10^scale)`` as BIGINT in pure double arithmetic —
    zero allocation, full codegen.  Exact iff the input is scale-dp-exact
    (see module docstring); works for negative values (floor of +0.5-shifted
    value is round-half-up, and s-dp-exact data has no half ties)."""
    return F.floor(_col(c) * (10**scale) + F.lit(0.5)).cast("long")


def decimal_of_units(units: Column, scale: int) -> Column:
    """Exact DECIMAL from integer units: ``L * 10^-scale`` with no division
    (division would widen precision past 38).  ``L`` must fit
    decimal(38-scale-1, 0) — guaranteed by the overflow bound above.
    ``scale=0`` short-circuits (the string-multiplier construction below
    would build '0.1' and an invalid DECIMAL(0,0) — round-4 review)."""
    if scale < 0:
        raise ValueError(f"scale must be >= 0, got {scale}")
    if scale == 0:
        return units.cast("decimal(37,0)")
    tens = "0." + "0" * (scale - 1) + "1"
    return units.cast(f"decimal({38 - scale - 1},0)") * F.lit(tens).cast(
        f"decimal({scale},{scale})"
    )


def money_of_units(units: Column, scale: int, round_to: int | None = None) -> Column:
    """Final money output column: exact decimal from units, optionally
    ROUND(_, round_to) (HALF_UP, same as the oracle's ROUND on decimal),
    cast DOUBLE — the engine's standard hash-stable terminal form."""
    d = decimal_of_units(units, scale)
    if round_to is not None and round_to < scale:
        d = F.round(d, round_to)
    return d.cast("double")


# SQL-fragment twins for the engine's SQL-string query formulations --------

def unscaled_fast_sql(col: str, scale: int = 2) -> str:
    return f"CAST(FLOOR({col} * {10**scale} + 0.5) AS BIGINT)"


def money_of_units_sql(units_expr: str, scale: int, round_to: int | None = None) -> str:
    if scale < 1:
        # same guard as decimal_of_units: scale 0 would render '0.1' and
        # an invalid DECIMAL(0,0)
        if scale == 0:
            return f"CAST(CAST({units_expr} AS DECIMAL(37,0)) AS DOUBLE)"
        raise ValueError(f"scale must be >= 0, got {scale}")
    tens = "0." + "0" * (scale - 1) + "1"
    d = (
        f"(CAST({units_expr} AS DECIMAL({38 - scale - 1},0))"
        f" * CAST({tens} AS DECIMAL({scale},{scale})))"
    )
    if round_to is not None and round_to < scale:
        d = f"ROUND({d}, {round_to})"
    return f"CAST({d} AS DOUBLE)"
