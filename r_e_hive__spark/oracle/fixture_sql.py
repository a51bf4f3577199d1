"""DuckDB oracle SQL for the fixture-driven domain queries.

The driver's DuckDB oracle only pre-registers the ten testdata parquet
tables, so the reference-schema fixtures (FIXTURES.md §B) are inlined here
as ``VALUES`` CTEs rendered from the same ``build_fixtures()`` rows the
Spark side uses — one deterministic source of truth, two engines.

The redemption pipeline itself (SURVEY.md §3.2; pipelines/redemption.py) is
re-expressed in portable SQL: guards as joins/filters, the ≤10-level upline
walk (render-complete-deploy.js:259-301) as a ``WITH RECURSIVE`` ancestor
closure — the recursive-CTE formulation SURVEY.md §2.12 (INV-J8) pins for
the oracle side.  This upgrades the four domain queries from rows-only
checks to full row-count + schema + value-hash differential checks.
"""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DecimalType,
    LongType,
    StringType,
    TimestampType,
)

from r_e_hive__spark.fixtures import build_fixtures
from r_e_hive__spark.schemas import REHIVE_SCHEMAS

# AS_OF mirrored from r_e_hive__spark.queries (importing it here would cycle).
_AS_OF = "2024-01-21 00:00:00"
MAX_LEVELS = 10  # render-complete-deploy.js:259


def _duck_type(t: DataType) -> str:
    if isinstance(t, DecimalType):
        return f"DECIMAL({t.precision},{t.scale})"
    if isinstance(t, LongType):
        return "BIGINT"
    if isinstance(t, StringType):
        return "VARCHAR"
    if isinstance(t, BooleanType):
        return "BOOLEAN"
    if isinstance(t, TimestampType):
        return "TIMESTAMP"
    raise TypeError(f"no DuckDB mapping for {t}")


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, datetime):
        # keep sub-second precision: silent truncation here would diverge
        # the oracle literal from the Spark-side fixture frame
        if v.microsecond:
            return f"TIMESTAMP '{v:%Y-%m-%d %H:%M:%S.%f}'"
        return f"TIMESTAMP '{v:%Y-%m-%d %H:%M:%S}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def _values_cte(name: str, tables: dict[str, list]) -> str:
    """``name AS (SELECT CAST(...) ... FROM (VALUES ...))`` — every column
    cast to its declared type so NULLs and decimals type identically to the
    Spark-side StructType frames."""
    schema = REHIVE_SCHEMAS[name]
    rows = tables[name]
    cols = [f.name for f in schema.fields]
    casts = ", ".join(
        f"CAST({c} AS {_duck_type(f.dataType)}) AS {c}"
        for c, f in zip(cols, schema.fields)
    )
    vals = ",\n    ".join(
        "(" + ", ".join(_lit(r[c]) for c in cols) + ")" for r in rows
    )
    return f"{name} AS (\n  SELECT {casts}\n  FROM (VALUES\n    {vals}) AS t({', '.join(cols)})\n)"


def _fixture_ctes(*names: str) -> str:
    tables = build_fixtures()
    return ",\n".join(_values_cte(n, tables) for n in names)


# ---------------------------------------------------------------------------
# The pipeline, as shared CTEs (mirrors pipelines/redemption.py stage by
# stage; money math = exact decimal, ROUND(price×rate, 2) at ledger insert).
# ---------------------------------------------------------------------------

_PIPELINE_CTES = f"""
joined AS (
  SELECT r.event_id, r.user_id, r.referral_code, r.event_ts,
         g.id AS gift_code_id, g.package_id, g.created_by, g.is_redeemed
  FROM redemption_events r
  LEFT JOIN gift_codes g ON r.code = g.code
),
accepted AS (
  -- null-tolerant guards (IS NOT TRUE / IS DISTINCT FROM) mirror the
  -- reference's falsy checks and the Spark when-chain exactly; the
  -- ROW_NUMBER implements the sequential engine's earliest-wins per code
  -- (second same-batch redemption hits already_redeemed) — both per the
  -- round-4 review, kept in lockstep with pipelines/redemption.py
  SELECT event_id, user_id, referral_code, event_ts,
         gift_code_id, package_id, created_by
  FROM (
    SELECT j.*, ROW_NUMBER() OVER (
             PARTITION BY gift_code_id ORDER BY event_ts, event_id
           ) AS code_rn
    FROM joined j
    WHERE gift_code_id IS NOT NULL
      AND is_redeemed IS NOT TRUE
      AND created_by IS DISTINCT FROM user_id
  )
  WHERE code_rn = 1
),
acc_pkg AS (
  -- ord = sequential processing order; edges inserted by event k are
  -- visible to events >= k only (mirrors the Spark pipeline's _ord)
  SELECT a.*, p.price, p.direct_commission_rate, p.passive_commission_rate,
         ROW_NUMBER() OVER (ORDER BY a.event_ts, a.event_id) AS ord
  FROM accepted a
  JOIN packages p ON a.package_id = p.id
),
new_referrals AS (
  -- from acc_pkg (post-package join), one edge per referred user, both
  -- mirroring the Spark pipeline stage-for-stage
  SELECT referrer_id, referred_id, ord AS edge_ord FROM (
    SELECT u.id AS referrer_id, a.user_id AS referred_id, a.ord,
           ROW_NUMBER() OVER (
             PARTITION BY a.user_id ORDER BY a.event_ts, a.event_id
           ) AS edge_rn
    FROM acc_pkg a
    JOIN users u ON a.referral_code = u.referral_code
    WHERE a.referral_code IS NOT NULL
      AND u.id <> a.user_id
      AND a.user_id NOT IN (SELECT referred_id FROM referrals)
  )
  WHERE edge_rn = 1
),
edges AS (
  SELECT referred_id AS child, referrer_id AS parent, 0 AS edge_ord
  FROM referrals
  UNION ALL
  SELECT referred_id, referrer_id, edge_ord FROM new_referrals
),
anc AS (
  -- max_ord = the earliest processing point at which the whole path exists
  SELECT child AS node, parent AS ancestor, 1 AS level, edge_ord AS max_ord
  FROM edges
  UNION ALL
  SELECT a.node, e.parent, a.level + 1, GREATEST(a.max_ord, e.edge_ord)
  FROM anc a JOIN edges e ON a.ancestor = e.child
  WHERE a.level < {MAX_LEVELS}
),
ledger AS (
  SELECT event_id, gift_code_id, created_by AS user_id,
         CAST(ROUND(CAST(price AS DECIMAL(12,4)) * CAST(direct_commission_rate AS DECIMAL(8,4)), 2) AS DECIMAL(10,2)) AS amount,
         'direct' AS type, user_id AS source_user_id, event_ts AS created_at,
         0 AS level
  FROM acc_pkg
  UNION ALL
  SELECT a.event_id, a.gift_code_id, c.ancestor AS user_id,
         CAST(ROUND(CAST(a.price AS DECIMAL(12,4)) * CAST(a.passive_commission_rate AS DECIMAL(8,4)), 2) AS DECIMAL(10,2)) AS amount,
         'passive' AS type, a.user_id AS source_user_id, a.event_ts AS created_at,
         c.level
  FROM acc_pkg a
  JOIN anc c ON a.user_id = c.node AND c.max_ord <= a.ord
)
"""


def ledger_oracle() -> str:
    return (
        "WITH RECURSIVE\n"
        + _fixture_ctes(
            "packages", "users", "referrals", "gift_codes", "redemption_events"
        )
        + ",\n"
        + _PIPELINE_CTES
        + """
SELECT event_id, user_id, level, type, CAST(amount AS DOUBLE) AS amount
FROM ledger
ORDER BY event_id, level, user_id
"""
    )


def company_profits_oracle() -> str:
    return (
        "WITH RECURSIVE\n"
        + _fixture_ctes(
            "packages", "users", "referrals", "gift_codes", "redemption_events"
        )
        + ",\n"
        + _PIPELINE_CTES
        + """,
paid AS (
  SELECT event_id, SUM(amount) AS commission_paid FROM ledger GROUP BY event_id
)
SELECT a.event_id,
       CAST(a.gift_code_id AS VARCHAR) AS source_id,
       CAST(GREATEST(CAST(0 AS DECIMAL(10,2)),
                     CAST(a.price - COALESCE(p.commission_paid, 0) AS DECIMAL(10,2))) AS DOUBLE) AS amount,
       CAST(CAST(COALESCE(p.commission_paid, 0) AS DECIMAL(10,2)) AS DOUBLE) AS commission_paid
FROM acc_pkg a
LEFT JOIN paid p ON a.event_id = p.event_id
ORDER BY a.event_id
"""
    )


def user_balances_oracle() -> str:
    return (
        "WITH RECURSIVE\n"
        + _fixture_ctes(
            "packages",
            "users",
            "referrals",
            "gift_codes",
            "redemption_events",
            "commissions",
            "commission_withdrawals",
        )
        + ",\n"
        + _PIPELINE_CTES
        + """,
credits AS (
  SELECT user_id, SUM(amount) AS credited FROM (
    SELECT user_id, amount FROM commissions
    UNION ALL
    SELECT user_id, amount FROM ledger
  ) GROUP BY user_id
),
debits AS (
  SELECT user_id, SUM(amount) AS debited
  FROM commission_withdrawals WHERE status = 'approved' GROUP BY user_id
)
SELECT user_id,
       CAST(CAST(COALESCE(credited, 0) - COALESCE(debited, 0) AS DECIMAL(10,2)) AS DOUBLE) AS commission_balance,
       CAST(CAST(COALESCE(credited, 0) AS DECIMAL(10,2)) AS DOUBLE) AS total_credited,
       CAST(CAST(COALESCE(debited, 0) AS DECIMAL(10,2)) AS DOUBLE) AS total_withdrawn
FROM credits FULL OUTER JOIN debits USING (user_id)
ORDER BY user_id
"""
    )


def subscription_status_oracle() -> str:
    return (
        "WITH\n"
        + _fixture_ctes("users", "commissions", "commission_withdrawals")
        + f""",
credits AS (
  SELECT user_id, SUM(amount) AS credited FROM commissions GROUP BY user_id
),
debits AS (
  SELECT user_id, SUM(amount) AS debited
  FROM commission_withdrawals WHERE status = 'approved' GROUP BY user_id
)
SELECT u.id,
       CAST(CAST(COALESCE(c.credited, 0) - COALESCE(d.debited, 0) AS DECIMAL(10,2)) AS DOUBLE) AS commission_balance,
       CASE WHEN u.subscription_expires_at IS NOT NULL
             AND u.subscription_expires_at > TIMESTAMP '{_AS_OF}'
            THEN 'active' ELSE 'expired' END AS subscription_status
FROM users u
LEFT JOIN credits c ON u.id = c.user_id
LEFT JOIN debits d ON u.id = d.user_id
ORDER BY u.id
"""
    )
