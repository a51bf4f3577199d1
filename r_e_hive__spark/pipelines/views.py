"""Event-sourced current-state views (SURVEY.md §1.4, §2.1 S5).

Every mutable field of the reference becomes a derived view over append-only
facts:

- ``commission_balance`` := Σ ledger credits − Σ approved withdrawals
  (replaces `balance = balance ± x` updates,
  render-complete-deploy.js:228, 287, 725, 862)
- ``gift_codes_current.is_redeemed`` := latest redemption event wins
  (replaces the UPDATE at :476-482)
- ``subscription_status`` := expires_at > :as_of computed column
  (replaces the app-side predicate at :598-599)

At scale these views are materialized incrementally (refresh job appends a
snapshot partition); the definitions below are the single source of truth
either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from r_e_hive__spark.functions.scalar import subscription_active
from r_e_hive__spark.operators.relational import latest_record_wins
from r_e_hive__spark.schemas import MONEY


def balances(commissions: DataFrame, withdrawals: DataFrame) -> DataFrame:
    """user_id → current commission balance (exact decimal).

    balance = Σ commissions.amount − Σ withdrawals.amount where approved.
    The reference maintains this denormalized per-row (SURVEY.md §0); here
    it is one aggregation per side + an outer merge — map-side partials make
    the shuffle carry one row per user."""
    credits = commissions.groupBy("user_id").agg(
        F.sum("amount").cast(MONEY).alias("credited")
    )
    debits = (
        withdrawals.where(F.col("status") == "approved")
        .groupBy("user_id")
        .agg(F.sum("amount").cast(MONEY).alias("debited"))
    )
    zero = F.lit(0).cast(MONEY)
    return (
        credits.join(debits, "user_id", "full_outer")
        .select(
            "user_id",
            (F.coalesce(F.col("credited"), zero) - F.coalesce(F.col("debited"), zero))
            .cast(MONEY)
            .alias("commission_balance"),
            F.coalesce(F.col("credited"), zero).alias("total_credited"),
            F.coalesce(F.col("debited"), zero).alias("total_withdrawn"),
        )
    )


def gift_codes_current(
    gift_codes: DataFrame, redemption_ledger: DataFrame
) -> DataFrame:
    """Latest-redemption-wins current state for gift codes.

    ``redemption_ledger``: accepted redemption facts (event_id, code,
    user_id, event_ts).  A code is redeemed iff it has ≥1 accepted event;
    the earliest accepted event wins (the reference's unredeemed-only lookup
    makes later attempts no-ops, render-complete-deploy.js:464-466)."""
    first_redemption = latest_record_wins(
        redemption_ledger.select(
            "code",
            F.col("user_id").alias("redeemed_by"),
            F.col("event_ts").alias("redeemed_at"),
            "event_id",
        ),
        ["code"],
        # order by the POST-projection names (the pre-alias event_ts no
        # longer exists here — latent bug surfaced by the round-5 API layer)
        [F.asc("redeemed_at"), F.asc("event_id")],
    ).drop("event_id")
    base = gift_codes.drop("is_redeemed", "redeemed_by", "redeemed_at")
    j = base.join(first_redemption, "code", "left")
    return j.select(
        *[c for c in base.columns],
        F.col("redeemed_by").isNotNull().alias("is_redeemed"),
        "redeemed_by",
        "redeemed_at",
    )


def users_current(
    users: DataFrame,
    commissions: DataFrame,
    withdrawals: DataFrame,
    as_of: str,
    accepted_redemptions: DataFrame | None = None,
) -> DataFrame:
    """users + derived balance + derived subscription status as of a fixed
    timestamp (never wall-clock — determinism contract).

    ``accepted_redemptions`` (user_id, package_id, event_ts, event_id):
    the redemption facts that drive the reference's mutate step 5 —
    ``UPDATE users SET package_id`` on every accepted redemption
    (render-complete-deploy.js:484-486).  When provided, the view derives
    the CURRENT package as latest-accepted-redemption-wins, falling back
    to the stored column for users with no redemption — closing the one
    mutable users field the event-sourced views previously dropped
    (round-4 review)."""
    bal = balances(commissions, withdrawals)
    if accepted_redemptions is not None:
        latest_pkg = latest_record_wins(
            accepted_redemptions.select(
                F.col("user_id").alias("_uid"),
                F.col("package_id").alias("_redeemed_pkg"),
                "event_ts",
                "event_id",
            ),
            ["_uid"],
            [F.desc("event_ts"), F.desc("event_id")],
        ).select("_uid", "_redeemed_pkg")
        users = (
            users.join(latest_pkg, users["id"] == F.col("_uid"), "left")
            .withColumn(
                "package_id",
                F.coalesce(F.col("_redeemed_pkg"), F.col("package_id")),
            )
            .drop("_uid", "_redeemed_pkg")
        )
    active: Column = subscription_active(F.col("subscription_expires_at"), as_of)
    return (
        users.drop("commission_balance", "subscription_status")
        .join(bal.select("user_id", "commission_balance"),
              users["id"] == F.col("user_id"), "left")
        .drop("user_id")
        .select(
            "*",
            F.when(active, F.lit("active")).otherwise(F.lit("expired")).alias(
                "subscription_status"
            ),
        )
        .withColumn(
            "commission_balance",
            F.coalesce(F.col("commission_balance"), F.lit(0).cast(MONEY)),
        )
    )
