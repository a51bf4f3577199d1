"""Scalar column functions mirroring the reference's expression surface
(SURVEY.md §2.8 F1-F17).

All are Column-in/Column-out builders over built-in ``pyspark.sql.functions``
— JVM-side, whole-stage-codegen'd; no Python UDFs in this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from r_e_hive__spark.schemas import MONEY

# ---------------------------------------------------------------------------
# Money (F1-F4, F6).  The reference does float money math then stringifies
# (parseFloat(price) * parseFloat(rate) — render-complete-deploy.js:216, 275,
# :221/:280); the engine instead computes in exact DecimalType and rounds
# HALF_UP to scale 2 at ledger-insert time (SURVEY.md §1.3, an intentional
# fidelity improvement pinned in the oracle).
# ---------------------------------------------------------------------------


def money(c: Column | str) -> Column:
    """Cast to the canonical decimal(10,2) money type."""
    return F.col(c).cast(MONEY) if isinstance(c, str) else c.cast(MONEY)


def commission_amount(price: Column, rate: Column) -> Column:
    """price × rate, rounded HALF_UP to 2 dp (ledger-insert rounding rule).

    Mirrors render-complete-deploy.js:216 (direct) and :275 (passive) with
    exact decimal semantics."""
    return F.round(price.cast("decimal(12,4)") * rate.cast("decimal(8,4)"), 2).cast(
        MONEY
    )


def floor_at_zero(c: Column) -> Column:
    """``Math.max(0, x)`` (render-complete-deploy.js:307) → greatest(0, x).

    NULL propagates: Spark's ``greatest`` skips NULLs, which would launder
    a missing amount into a valid $0.00 — a NULL input (dangling FK, failed
    join) must stay visibly NULL (round-4 review)."""
    money = c.cast(MONEY)
    return F.when(money.isNotNull(), F.greatest(F.lit(0).cast(MONEY), money))


# ---------------------------------------------------------------------------
# Codes & strings (F7-F9)
# ---------------------------------------------------------------------------


def gift_code(seed: Column) -> Column:
    """Deterministic 8-char A-Z/0-9 code.

    The reference draws 8 random chars (generateGiftCode,
    render-complete-deploy.js:198-205); rand() is banned from anything
    hash-checked (SURVEY.md §2.12), so the engine derives the code from a
    seed column via sha2.  Alphabet note: hex output covers [0-9A-F], a
    SUBSET of the reference's [A-Z0-9] — 16^8 ≈ 4.3e9 codes, collision-safe
    to ~65 k codes (birthday bound) and guarded by the J6 unique
    constraint either way; a production system issuing more should widen
    to base-36 (``conv(hex, 16, 36)``) — kept hex here because the DuckDB
    oracle must reproduce the construction byte-for-byte and base
    conversion differs across engines (round-4 review)."""
    return F.substring(F.upper(F.sha2(seed.cast("string"), 256)), 1, 8)


def capitalize(c: Column) -> Column:
    """``status.charAt(0).toUpperCase() + status.slice(1)``
    (render-complete-deploy.js:741)."""
    return F.concat(F.upper(F.substring(c, 1, 1)), F.substr(c, F.lit(2), F.length(c)))


# ---------------------------------------------------------------------------
# Time (F11-F13)
# ---------------------------------------------------------------------------


def subscription_active(expires_at: Column, as_of: str) -> Column:
    """``expires_at && expires_at > now`` (render-complete-deploy.js:598-599)
    with the engine's fixed ``as_of`` parameter instead of wall-clock."""
    return expires_at.isNotNull() & (expires_at > F.lit(as_of).cast("timestamp"))


def add_one_month(ts: Column) -> Column:
    """Subscription extension (+1 month on approval,
    render-complete-deploy.js:786-787) — TIMESTAMP-preserving: the target
    column ``subscription_expires_at`` carries a time of day, and the old
    ``add_months(cast-to-date)`` silently truncated it (round-4 review).
    End-of-month clamps like ``add_months``; the JS setMonth overflow
    divergence is documented in SURVEY.md §2.8 F12."""
    return F.timestamp_add("MONTH", F.lit(1), ts.cast("timestamp"))
