"""The commission engine as one batch job (SURVEY.md §3.2).

The reference processes each redemption imperatively — ~6 + 5×levels
autocommitted statements per redemption (POST /api/redeem-gift-code,
render-complete-deploy.js:456-508 → processCommissions :208-244 →
processPassiveCommissions :246-316).  The engine replaces that N+1 pattern
with ONE set-at-a-time job over all redemptions:

  guards      → joins/filters over sets (valid code, not yet redeemed,
                no self-redemption)
  upline walk → one bounded iterative join (ancestor closure ≤10 levels)
                for ALL redeemers at once
  outputs     → four appended fact DataFrames (redemptions, commission
                ledger, notifications, company profits); balances stay
                derived views (pipelines/views.py)

Money math is exact DecimalType rounded HALF_UP to 2 dp at ledger-insert
time — the engine's pinned improvement over the reference's JS float math
(SURVEY.md §1.3).

Scale: guards are broadcast-joins against small dims (packages) and
semi/anti joins on code (shuffle on an 8-char key); the closure join is the
skew hotspot (MLM uplines converge on early users) — AQE skew-join splits
hot ancestor keys at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r_e_hive__spark.functions.scalar import commission_amount, floor_at_zero
from r_e_hive__spark.operators.graph import ancestor_closure
from r_e_hive__spark.schemas import MONEY

MAX_LEVELS = 10  # render-complete-deploy.js:259


@dataclass
class RedemptionOutputs:
    accepted: DataFrame          # redemption events that passed all guards
    rejected: DataFrame          # (event, reason) for the rest
    new_referrals: DataFrame     # edges inserted from referral codes
    commission_ledger: DataFrame # direct + passive ledger rows
    notifications: DataFrame     # fan-out messages
    company_profits: DataFrame   # per-redemption retained profit


def process_redemptions(
    redemptions: DataFrame,
    gift_codes: DataFrame,
    users: DataFrame,
    packages: DataFrame,
    referrals: DataFrame,
) -> RedemptionOutputs:
    """Run the full redemption pipeline set-at-a-time.

    Input ``redemptions``: (event_id, code, user_id, referral_code, event_ts).
    Semantics mirror the reference endpoint exactly (guards in the same
    precedence), but computed relationally.
    """
    # ---- guard 1: code exists and is unredeemed (semi-join shape,
    # render-complete-deploy.js:464-466)
    codes = F.broadcast(
        gift_codes.select(
            F.col("code"),
            F.col("id").alias("gift_code_id"),
            F.col("package_id"),
            F.col("created_by"),
            F.col("is_redeemed"),
        )
    )
    r = redemptions.join(codes, "code", "left")

    # ---- guard 2: no self-redemption (render-complete-deploy.js:472)
    reason = (
        F.when(F.col("gift_code_id").isNull(), "invalid_code")
        .when(F.col("is_redeemed"), "already_redeemed")
        .when(F.col("created_by") == F.col("user_id"), "self_redemption")
    )
    r = r.withColumn("reject_reason", reason)
    pre_rejected = r.where(F.col("reject_reason").isNotNull()).select(
        "event_id", "code", "user_id", "reject_reason"
    )
    # ---- guard 3: intra-batch earliest-wins per code.  The reference
    # processes requests sequentially, so the SECOND redemption of a code
    # hits the already_redeemed guard (render-complete-deploy.js:466); the
    # set-at-a-time equivalent is a deterministic rank per code — without
    # it two same-batch redemptions of one code would BOTH pay full
    # commissions (round-4 code review).
    from pyspark.sql.window import Window

    w_code = Window.partitionBy("code").orderBy("event_ts", "event_id")
    cand = r.where(F.col("reject_reason").isNull()).withColumn(
        "_code_rn", F.row_number().over(w_code)
    )
    dup_rejected = cand.where(F.col("_code_rn") > 1).select(
        "event_id",
        "code",
        "user_id",
        F.lit("already_redeemed").alias("reject_reason"),
    )
    rejected = pre_rejected.unionByName(dup_rejected)
    accepted = cand.where(F.col("_code_rn") == 1).drop(
        "_code_rn", "reject_reason", "is_redeemed"
    )

    # ---- package economics (render-complete-deploy.js:210-216)
    pkg = F.broadcast(
        packages.select(
            F.col("id").alias("package_id"),
            "price",
            "direct_commission_rate",
            "passive_commission_rate",
        )
    )
    accepted = accepted.join(pkg, "package_id", "inner")
    # processing ordinal = the sequential engine's autocommit order
    # (event_ts, event_id).  Edges inserted by event k are visible to
    # events >= k (the inserting request pays through its own new edge,
    # render-complete-deploy.js:494-501) but NOT to earlier events — the
    # third same-batch sequential rule (round-4 review).  Single-partition
    # window: the batch is request-batch-sized; a bulk backfill would use
    # io.sequence_ids' two-phase form.
    w_ord = Window.orderBy("event_ts", "event_id")
    accepted = accepted.withColumn("_ord", F.row_number().over(w_ord).cast("long"))

    # ---- optional referral-edge insert (render-complete-deploy.js:488-499):
    # resolve referral_code → referrer, guard self-referral, reject codes
    # that resolve to nobody, skip users that already have an inbound edge
    # (the reference walks exactly one inbound edge per user, :263-267).
    ref_lookup = users.select(
        F.col("referral_code"), F.col("id").alias("referrer_id")
    )
    with_ref = (
        accepted.where(F.col("referral_code").isNotNull())
        .join(ref_lookup, "referral_code", "inner")
        .where(F.col("referrer_id") != F.col("user_id"))
    )
    existing_child = referrals.select(F.col("referred_id").alias("user_id"))
    # at most ONE inbound edge per user (the reference walks exactly one,
    # :263-267): dedupe intra-batch too — a user redeeming two codes with
    # referral codes in one batch must not get duplicate edges, which would
    # double every passive row up their chain (round-4 code review)
    w_child = Window.partitionBy("user_id").orderBy("event_ts", "event_id")
    new_referrals = (
        with_ref.join(existing_child, "user_id", "left_anti")
        .withColumn("_edge_rn", F.row_number().over(w_child))
        .where(F.col("_edge_rn") == 1)
        .select(
            F.col("referrer_id"),
            F.col("user_id").alias("referred_id"),
            F.col("event_ts").alias("created_at"),
            F.col("_ord").alias("_edge_ord"),
        )
    )

    # ---- upline closure over the post-insert edge set ------------------
    # pre-batch edges carry ordinal 0 (visible to every event); new edges
    # carry their inserting event's ordinal.  The closure's max_ord is then
    # the earliest processing point at which the whole path exists.
    edges = referrals.select(
        F.col("referred_id").alias("child"),
        F.col("referrer_id").alias("parent"),
        F.lit(0).cast("long").alias("_edge_ord"),
    ).unionByName(
        new_referrals.select(
            F.col("referred_id").alias("child"),
            F.col("referrer_id").alias("parent"),
            F.col("_edge_ord"),
        )
    )
    closure = ancestor_closure(
        edges, "child", "parent", max_levels=MAX_LEVELS, ord_col="_edge_ord"
    )

    # ---- direct commission to the code creator
    # (render-complete-deploy.js:216-224: amount = price × direct_rate)
    direct = accepted.select(
        F.col("event_id"),
        F.col("gift_code_id"),
        F.col("created_by").alias("user_id"),
        commission_amount(F.col("price"), F.col("direct_commission_rate")).alias("amount"),
        F.lit("direct").alias("type"),
        F.col("user_id").alias("source_user_id"),
        F.col("event_ts").alias("created_at"),
    )

    # ---- passive commissions up the redeemer's chain, flat rate per level
    # (render-complete-deploy.js:275-283); one join instead of the loop
    passive = (
        accepted.join(
            closure,
            (accepted["user_id"] == closure["node"])
            # sequential visibility: every edge on the path existed when
            # this event was processed (its own new edge included)
            & (closure["max_ord"] <= accepted["_ord"]),
            "inner",
        )
        .select(
            F.col("event_id"),
            F.col("gift_code_id"),
            closure["ancestor"].alias("user_id"),
            commission_amount(
                F.col("price"), F.col("passive_commission_rate")
            ).alias("amount"),
            F.lit("passive").alias("type"),
            accepted["user_id"].alias("source_user_id"),
            F.col("event_ts").alias("created_at"),
            closure["level"].alias("level"),
        )
    )

    ledger = direct.withColumn("level", F.lit(0)).unionByName(passive)

    # ---- notifications (fan-out on every credit,
    # render-complete-deploy.js:234-239, 291-295)
    notifications = ledger.select(
        F.col("user_id"),
        F.lit("Commission Earned").alias("title"),
        F.format_string(
            "You earned $%s commission", F.format_number(F.col("amount"), 2)
        ).alias("message"),
        F.lit("commission").alias("type"),
        F.lit(False).alias("is_read"),
        F.col("created_at"),
    )

    # ---- company profit = price − Σ commissions, floored at 0
    # (render-complete-deploy.js:303-311)
    paid = ledger.groupBy("event_id").agg(F.sum("amount").alias("commission_paid"))
    company_profits = (
        accepted.join(paid, "event_id", "left")
        .select(
            F.col("event_id"),
            F.col("gift_code_id").cast("string").alias("source_id"),
            F.lit("gift_code").alias("source_type"),
            floor_at_zero(
                F.col("price")
                - F.coalesce(F.col("commission_paid"), F.lit(0).cast(MONEY))
            ).alias("amount"),
            F.coalesce(F.col("commission_paid"), F.lit(0).cast(MONEY)).alias(
                "commission_paid"
            ),
            F.lit(False).alias("is_withdrawn"),
            F.col("event_ts").alias("created_at"),
        )
    )

    return RedemptionOutputs(
        accepted=accepted.drop("_ord"),
        rejected=rejected,
        new_referrals=new_referrals.drop("_edge_ord"),
        commission_ledger=ledger,
        notifications=notifications,
        company_profits=company_profits,
    )
