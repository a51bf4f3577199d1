"""Vector math over ``array<float>`` embedding columns (SURVEY.md §2.11 X3).

Two precision modes:

- ``dot``/``cosine`` — plain double math via ``zip_with`` + ``aggregate``:
  fastest, fully codegen'd, what production similarity search uses.
- ``dot_exact``/``cosine_exact`` — elements are first rounded to decimal(12,6)
  (float → double → decimal, the only cast chain that is bit-identical across
  engines), then the dot product is an *exact* decimal sum, order-independent
  and therefore hash-stable against the DuckDB oracle.  Used by the declared
  correctness queries; ~2× slower than the double path.

All of these are built-in higher-order functions — JVM-side, no Python UDF,
no data movement to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,6)"
ACC = "decimal(38,12)"


def _el(c: Column) -> Column:
    # float → double → decimal: deterministic, engine-portable rounding
    return c.cast("double").cast(DEC)


def dot_exact(a: Column, b: Column) -> Column:
    """Exact decimal dot product (order-independent, oracle-stable)."""
    # The explicit cast inside the merge lambda keeps the accumulator type
    # fixed at decimal(38,12) under either decimal-promotion mode; the cast
    # is exact because catalog.ensure_session_confs pins
    # allowPrecisionLoss=false so the add never drops below scale 12.
    prods = F.zip_with(a, b, lambda x, y: _el(x) * _el(y))
    return F.aggregate(
        prods, F.lit(0).cast(ACC), lambda acc, v: (acc + v).cast(ACC)
    )


def norm2_exact(a: Column) -> Column:
    """Exact decimal sum of squares."""
    return dot_exact(a, a)


def cosine_exact(a: Column, b: Column) -> Column:
    """Cosine from exact decimal dots, finished in double (deterministic:
    the decimal → double conversions and the final double ops are IEEE-fixed
    given identical inputs).  A zero vector has no direction: cosine is
    NULL, not a divide-by-zero (hard error under Spark 4 default ANSI) or
    NaN — NULL sorts last under the desc top-k orderings downstream."""
    den = F.sqrt(norm2_exact(a).cast("double") * norm2_exact(b).cast("double"))
    return F.when(den > 0, dot_exact(a, b).cast("double") / den)


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product (production fast path)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not error/NaN) for zero vectors — see cosine_exact."""
    den = norm(a) * norm(b)
    return F.when(den > 0, dot(a, b) / den)
