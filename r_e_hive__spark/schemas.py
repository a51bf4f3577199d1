"""Explicit StructType schemas — the engine never infers schemas.

Two schema families:

1. ``TESTDATA_SCHEMAS`` — the driver-generated TPC-H-ish tables plus
   ``events``/``documents``/``embeddings`` (/root/repo/TESTDATA.md,
   schemas verified against the parquet footers).
2. ``REHIVE_SCHEMAS`` — the reference system's nine-table relational model,
   re-typed for Spark per SURVEY.md §1.3 (Drizzle DDL at
   render-complete-deploy.js:31-136): decimals stay DecimalType (the
   reference's JS float money math is deliberately *not* reproduced),
   serial PKs become LongType, uuids become StringType.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType(
        [StructField(name, dtype, nullable) for name, dtype, nullable in fields]
    )


MONEY = DecimalType(10, 2)  # decimal(10,2) money columns (render-complete-deploy.js:34)

# ---------------------------------------------------------------------------
# Driver testdata (TESTDATA.md / FIXTURES.md §A)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _st(
        ("r_regionkey", IntegerType(), False),
        ("r_name", StringType(), False),
    ),
    "nation": _st(
        ("n_nationkey", IntegerType(), False),
        ("n_name", StringType(), False),
        ("n_regionkey", IntegerType(), False),
    ),
    "customer": _st(
        ("c_custkey", LongType(), False),
        ("c_name", StringType(), False),
        ("c_nationkey", IntegerType(), False),
        ("c_acctbal", DoubleType(), False),
        ("c_mktsegment", StringType(), False),
    ),
    "supplier": _st(
        ("s_suppkey", LongType(), False),
        ("s_name", StringType(), False),
        ("s_nationkey", IntegerType(), False),
        ("s_acctbal", DoubleType(), False),
    ),
    "part": _st(
        ("p_partkey", LongType(), False),
        ("p_name", StringType(), False),
        ("p_brand", StringType(), False),
        ("p_type", StringType(), False),
        ("p_size", IntegerType(), False),
        ("p_retailprice", DoubleType(), False),
    ),
    "orders": _st(
        ("o_orderkey", LongType(), False),
        ("o_custkey", LongType(), False),
        ("o_orderstatus", StringType(), False),
        ("o_totalprice", DoubleType(), False),
        ("o_orderdate", TimestampType(), False),
        ("o_orderpriority", StringType(), False),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType(), False),
        ("l_partkey", LongType(), False),
        ("l_suppkey", LongType(), False),
        ("l_linenumber", IntegerType(), False),
        ("l_quantity", DoubleType(), False),
        ("l_extendedprice", DoubleType(), False),
        ("l_discount", DoubleType(), False),
        ("l_tax", DoubleType(), False),
        ("l_returnflag", StringType(), False),
        ("l_linestatus", StringType(), False),
        ("l_shipdate", TimestampType(), False),
    ),
    "events": _st(
        ("event_id", LongType(), False),
        ("ts", TimestampType(), False),
        ("user_id", LongType(), False),
        ("event_type", StringType(), False),
        ("value", DoubleType(), False),
        ("props", StringType(), True),
    ),
    "documents": _st(
        ("doc_id", LongType(), False),
        ("text", StringType(), False),
        ("lang", StringType(), False),
        ("source", StringType(), False),
        ("n_chars", LongType(), False),
    ),
    "embeddings": _st(
        ("vec_id", LongType(), False),
        ("embedding", ArrayType(FloatType(), True), False),
        ("label", IntegerType(), False),
    ),
}

# ---------------------------------------------------------------------------
# Reference-system schemas (FIXTURES.md §B; Drizzle DDL provenance per table)
# ---------------------------------------------------------------------------

REHIVE_SCHEMAS: dict[str, StructType] = {
    # render-complete-deploy.js:31-41
    "packages": _st(
        ("id", LongType(), False),
        ("name", StringType(), False),
        ("price", MONEY, False),
        ("passive_commission_rate", DecimalType(5, 4), False),
        ("direct_commission_rate", DecimalType(3, 2), False),
        ("description", StringType(), True),
        ("monthly_subscription_fee", MONEY, False),
        ("video_url", StringType(), True),
        ("created_at", TimestampType(), False),
    ),
    # render-complete-deploy.js:43-63
    "users": _st(
        ("id", StringType(), False),
        ("email", StringType(), False),
        ("full_name", StringType(), False),
        ("phone_number", StringType(), True),
        ("country", StringType(), True),
        ("package_id", LongType(), True),
        ("referral_code", StringType(), False),
        ("kyc_status", StringType(), False),
        ("created_at", TimestampType(), False),
        ("commission_balance", MONEY, False),
        ("subscription_status", StringType(), False),
        ("subscription_expires_at", TimestampType(), True),
        ("last_subscription_payment", TimestampType(), True),
    ),
    # render-complete-deploy.js:86-91 (the referral graph edge table)
    "referrals": _st(
        ("id", LongType(), False),
        ("referrer_id", StringType(), False),
        ("referred_id", StringType(), False),
        ("created_at", TimestampType(), False),
    ),
    # render-complete-deploy.js:65-74
    "gift_codes": _st(
        ("id", LongType(), False),
        ("code", StringType(), False),
        ("package_id", LongType(), False),
        ("created_by", StringType(), False),
        ("is_redeemed", BooleanType(), False),
        ("redeemed_by", StringType(), True),
        ("redeemed_at", TimestampType(), True),
        ("created_at", TimestampType(), False),
    ),
    # rebuild-side event-sourced input (FIXTURES.md §B.5; endpoint body shape
    # at render-complete-deploy.js:458)
    "redemption_events": _st(
        ("event_id", LongType(), False),
        ("code", StringType(), False),
        ("user_id", StringType(), False),
        ("referral_code", StringType(), True),
        ("event_ts", TimestampType(), False),
    ),
    # render-complete-deploy.js:76-84 (append-only ledger)
    "commissions": _st(
        ("id", LongType(), False),
        ("user_id", StringType(), False),
        ("amount", MONEY, False),
        ("type", StringType(), False),  # 'direct' | 'passive'
        ("source_user_id", StringType(), True),
        ("gift_code_id", LongType(), True),
        ("created_at", TimestampType(), False),
    ),
    # render-complete-deploy.js:93-105
    "commission_withdrawals": _st(
        ("id", LongType(), False),
        ("user_id", StringType(), False),
        ("amount", MONEY, False),
        ("status", StringType(), False),  # pending | approved | rejected
        ("payment_method", StringType(), False),
        ("payment_details", StringType(), True),  # JSON-in-text
        ("admin_notes", StringType(), True),
        ("created_at", TimestampType(), False),
        ("processed_at", TimestampType(), True),
    ),
    # render-complete-deploy.js:107-116
    "subscription_payments": _st(
        ("id", LongType(), False),
        ("user_id", StringType(), False),
        ("amount", MONEY, False),
        ("payment_proof_url", StringType(), True),
        ("status", StringType(), False),
        ("admin_notes", StringType(), True),
        ("created_at", TimestampType(), False),
        ("processed_at", TimestampType(), True),
    ),
    # render-complete-deploy.js:118-126
    "notifications": _st(
        ("id", LongType(), False),
        ("user_id", StringType(), False),
        ("title", StringType(), False),
        ("message", StringType(), False),
        ("type", StringType(), False),
        ("is_read", BooleanType(), False),
        ("created_at", TimestampType(), False),
    ),
    # render-complete-deploy.js:128-136 (output of the redemption pipeline)
    "company_profits": _st(
        ("id", LongType(), False),
        ("amount", MONEY, False),
        ("source_type", StringType(), False),
        ("source_id", StringType(), False),
        ("commission_paid", MONEY, False),
        ("is_withdrawn", BooleanType(), False),
        ("created_at", TimestampType(), False),
    ),
    # JSON-in-text payment_details payload (render-complete-deploy.js:552)
}

# Schema for the JSON-in-text `payment_details` column (write-only in the
# reference; we parse it back with from_json — SURVEY.md §1.3).
PAYMENT_DETAILS_SCHEMA = StructType(
    [
        StructField("bank_name", StringType(), True),
        StructField("account_number", StringType(), True),
        StructField("account_holder", StringType(), True),
        StructField("wallet_address", StringType(), True),
    ]
)

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
REHIVE_TABLES = tuple(REHIVE_SCHEMAS)
