"""Deterministic reference-schema fixtures (FIXTURES.md §B).

Pure-Python construction — fixed ids, fixed timestamps, no randomness
(determinism contract FIXTURES.md §C).  The graph has chains of depth 0, 1,
5, 9, 10, 11, 12 below the root plus a 20-direct hub (skew coverage), at
most one inbound edge per user — exactly the shapes the reference's
commission walk exercises (render-complete-deploy.js:259, 263-267).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from r_e_hive__spark.schemas import REHIVE_SCHEMAS

T0 = datetime(2024, 1, 1, 0, 0, 0)
AS_OF_DT = datetime(2024, 1, 21, 0, 0, 0)


def _ts(i: int) -> datetime:
    return T0 + timedelta(minutes=i)


def build_fixtures() -> dict[str, list]:
    """Row dicts per table, keyed by REHIVE_SCHEMAS names."""
    packages = [
        # id, name, price, passive_rate, direct_rate, desc, monthly_fee, video, created
        dict(id=1, name="starter", price=Decimal("100.00"),
             passive_commission_rate=Decimal("0.0500"), direct_commission_rate=Decimal("0.10"),
             description="entry", monthly_subscription_fee=Decimal("0.00"), video_url=None,
             created_at=_ts(0)),
        dict(id=2, name="silver", price=Decimal("249.99"),
             passive_commission_rate=Decimal("0.0333"), direct_commission_rate=Decimal("0.15"),
             description=None, monthly_subscription_fee=Decimal("10.00"), video_url=None,
             created_at=_ts(1)),
        dict(id=3, name="gold", price=Decimal("499.95"),
             passive_commission_rate=Decimal("0.0250"), direct_commission_rate=Decimal("0.20"),
             description="popular", monthly_subscription_fee=Decimal("25.00"), video_url="v3",
             created_at=_ts(2)),
        dict(id=4, name="platinum", price=Decimal("1000.01"),
             passive_commission_rate=Decimal("0.0125"), direct_commission_rate=Decimal("0.25"),
             description=None, monthly_subscription_fee=Decimal("50.00"), video_url=None,
             created_at=_ts(3)),
        dict(id=5, name="diamond", price=Decimal("2499.33"),
             passive_commission_rate=Decimal("0.0077"), direct_commission_rate=Decimal("0.33"),
             description="vip", monthly_subscription_fee=Decimal("99.99"), video_url="v5",
             created_at=_ts(4)),
    ]

    # --- referral forest -------------------------------------------------
    # root u0001; chains hang off it with depths 1, 5, 9, 10, 11, 12;
    # then the high-fanout hub (u0050, 20 directs u0051-u0070) and five
    # isolated users (u0071-u0075, depth 0) — ids run sequentially from
    # the chain construction, not from round numbers.
    users: list[dict] = []
    referrals: list[dict] = []
    rid = [0]

    def add_user(uid: str, pkg: int | None, sub_exp: datetime | None = None):
        users.append(
            dict(
                id=uid,
                email=f"{uid}@example.com",
                full_name=f"User {uid}",
                phone_number=None,
                country="US" if int(uid[1:]) % 3 == 0 else "DE",
                package_id=pkg,
                referral_code=f"REF{uid[1:]}",
                kyc_status="approved" if int(uid[1:]) % 2 == 0 else "pending",
                created_at=_ts(int(uid[1:])),
                commission_balance=Decimal("0.00"),
                subscription_status="inactive",
                subscription_expires_at=sub_exp,
                last_subscription_payment=None,
            )
        )

    def add_edge(referrer: str, referred: str):
        rid[0] += 1
        referrals.append(
            dict(
                id=rid[0],
                referrer_id=referrer,
                referred_id=referred,
                created_at=_ts(rid[0]),
            )
        )

    add_user("u0001", 5, sub_exp=AS_OF_DT + timedelta(days=30))  # root, active sub
    chain_tips: dict[int, str] = {}
    uid_counter = [1]

    def new_uid() -> str:
        uid_counter[0] += 1
        return f"u{uid_counter[0]:04d}"

    for depth in (1, 5, 9, 10, 11, 12):
        parent = "u0001"
        for d in range(depth):
            uid = new_uid()
            add_user(uid, (d % 5) + 1,
                     sub_exp=(AS_OF_DT + timedelta(days=5)) if d % 2 == 0 else (AS_OF_DT - timedelta(days=5)))
            add_edge(parent, uid)
            parent = uid
        chain_tips[depth] = parent

    hub = new_uid()  # high-fanout hub (skew coverage)
    add_user(hub, 3)
    add_edge("u0001", hub)
    hub_directs = []
    for _ in range(20):
        uid = new_uid()
        add_user(uid, 1)
        add_edge(hub, uid)
        hub_directs.append(uid)

    isolated = []
    for _ in range(5):
        uid = new_uid()
        add_user(uid, None)  # NULL package_id (left-join coverage)
        isolated.append(uid)

    # --- gift codes ------------------------------------------------------
    # code naming: G<id>; creator varies; one self-redemption trap (creator
    # == would-be redeemer, guard at render-complete-deploy.js:472).
    gift_codes = []

    def add_code(cid: int, pkg: int, creator: str, redeemed_by=None, redeemed_at=None):
        gift_codes.append(
            dict(
                id=cid,
                code=f"GCODE{cid:03d}",
                package_id=pkg,
                created_by=creator,
                is_redeemed=redeemed_by is not None,
                redeemed_by=redeemed_by,
                redeemed_at=redeemed_at,
                created_at=_ts(100 + cid),
            )
        )

    add_code(1, 1, "u0001")                        # valid, unredeemed
    add_code(2, 3, "u0001")                        # valid, unredeemed
    add_code(3, 2, "u0001", chain_tips[5], _ts(500))  # already redeemed
    add_code(4, 4, chain_tips[12])                 # deep-chain creator
    add_code(5, 5, hub)                            # hub creator
    add_code(6, 1, chain_tips[1])                  # self-redemption trap
    add_code(7, 2, "u0001")                        # for hub direct
    add_code(8, 3, "u0001")                        # for isolated user
    add_code(9, 2, "u0001")                        # new-edge insert (event 8)
    add_code(10, 1, "u0001")                       # retroactivity pair (event 9)
    add_code(11, 4, "u0001")                       # retroactivity pair (event 10)

    # --- redemption events (pipeline input, FIXTURES.md §B.5) -----------
    redemption_events = [
        # tip of depth-12 chain redeems → 10-level cap binds
        dict(event_id=1, code="GCODE001", user_id=chain_tips[12], referral_code=None, event_ts=_ts(1000)),
        # tip of depth-9 chain redeems → full 9-level upline
        dict(event_id=2, code="GCODE002", user_id=chain_tips[9], referral_code=None, event_ts=_ts(1001)),
        # invalid code
        dict(event_id=3, code="NOPE0000", user_id=hub, referral_code=None, event_ts=_ts(1002)),
        # already-redeemed code
        dict(event_id=4, code="GCODE003", user_id=hub, referral_code=None, event_ts=_ts(1003)),
        # self-redemption attempt (creator == redeemer)
        dict(event_id=5, code="GCODE006", user_id=chain_tips[1], referral_code=None, event_ts=_ts(1004)),
        # hub direct redeems with a referral_code — but already HAS an
        # inbound edge, so the anti-join suppresses the insert
        # (render-complete-deploy.js:263-267: one inbound edge per user)
        dict(event_id=6, code="GCODE007", user_id=hub_directs[0], referral_code=f"REF{hub[1:]}", event_ts=_ts(1005)),
        # isolated user redeems (depth-0: direct commission only)
        dict(event_id=7, code="GCODE008", user_id=isolated[0], referral_code=None, event_ts=_ts(1006)),
        # TRUE new-edge insert (round 4): isolated[1] has no inbound edge,
        # referral resolves to the hub → edge inserted, passive paid up the
        # hub's chain for THIS event (:488-501)
        dict(event_id=8, code="GCODE009", user_id=isolated[1], referral_code=f"REF{hub[1:]}", event_ts=_ts(1007)),
        # sequential retroactivity pair (round 4): isolated[2] redeems with
        # NO referral at t, then WITH one at t+1 — event 9 must pay zero
        # passive (its edge does not exist yet), event 10 pays through it
        dict(event_id=9, code="GCODE010", user_id=isolated[2], referral_code=None, event_ts=_ts(1008)),
        dict(event_id=10, code="GCODE011", user_id=isolated[2], referral_code="REF0001", event_ts=_ts(1009)),
    ]

    # --- ledgers / withdrawals (balance + W1 coverage) -------------------
    commissions = []
    for i in range(1, 121):
        uid = "u0001" if i <= 105 else chain_tips[5]  # >100 rows for one user (W1 LIMIT-100)
        commissions.append(
            dict(
                id=i,
                user_id=uid,
                amount=Decimal(i % 7 + 1) + Decimal("0.25"),
                type="direct" if i % 3 == 0 else "passive",
                source_user_id=None,
                gift_code_id=(i % 8) + 1,
                # deliberate created_at ties (same minute) with distinct ids:
                # pins the id tiebreak rule (SURVEY.md §2.6 O1)
                created_at=_ts(2000 + (i // 2)),
            )
        )

    commission_withdrawals = [
        dict(id=1, user_id="u0001", amount=Decimal("50.00"), status="approved",
             payment_method="bank_transfer", payment_details='{"bank_name":"B1","account_number":"1"}',
             admin_notes=None, created_at=_ts(3000), processed_at=_ts(3010)),
        dict(id=2, user_id="u0001", amount=Decimal("25.50"), status="pending",
             payment_method="crypto", payment_details='{"wallet_address":"0xabc"}',
             admin_notes=None, created_at=_ts(3001), processed_at=None),
        dict(id=3, user_id="u0001", amount=Decimal("10.00"), status="rejected",
             payment_method="bank_transfer", payment_details=None,
             admin_notes="insufficient docs", created_at=_ts(3002), processed_at=_ts(3012)),
        # over-balance request (sufficiency check render-complete-deploy.js:541-545)
        dict(id=4, user_id=chain_tips[5], amount=Decimal("99999.00"), status="pending",
             payment_method="bank_transfer", payment_details=None,
             admin_notes=None, created_at=_ts(3003), processed_at=None),
    ]

    subscription_payments = [
        dict(id=1, user_id="u0001", amount=Decimal("50.00"), payment_proof_url="/u/p1.png",
             status="approved", admin_notes=None, created_at=_ts(4000), processed_at=_ts(4010)),
        dict(id=2, user_id=hub, amount=Decimal("50.00"), payment_proof_url=None,
             status="pending", admin_notes=None, created_at=_ts(4001), processed_at=None),
    ]

    notifications = []
    for i in range(1, 61):  # >50 rows for one user (LIMIT-50, render-complete-deploy.js:667)
        notifications.append(
            dict(id=i, user_id="u0001", title=f"n{i}", message=f"msg {i}",
                 type=("commission", "payment", "info")[i % 3], is_read=i % 2 == 0,
                 created_at=_ts(5000 + (i // 3)))
        )

    return dict(
        packages=packages,
        users=users,
        referrals=referrals,
        gift_codes=gift_codes,
        redemption_events=redemption_events,
        commissions=commissions,
        commission_withdrawals=commission_withdrawals,
        subscription_payments=subscription_payments,
        notifications=notifications,
        company_profits=[],
    )


def fixture_frames(spark: SparkSession) -> dict[str, DataFrame]:
    """Fixtures as schema-typed DataFrames (and temp views ``rehive_<name>``)."""
    rows = build_fixtures()
    out = {}
    for name, data in rows.items():
        schema = REHIVE_SCHEMAS[name]
        df = spark.createDataFrame(
            [tuple(r[f.name] for f in schema.fields) for r in data], schema
        )
        df.createOrReplaceTempView(f"rehive_{name}")
        out[name] = df
    return out


def power_law_edges(n_hub: int = 10_000) -> list[tuple[int, int]]:
    """Deterministic heavy-hitter referral graph (VERDICT r3 item 3).

    The reference's real graph is power-law MLM — uplines converge on early
    users (SURVEY.md §4.2; the walk at render-complete-deploy.js:262-301
    hits the same few ancestor rows for most redemptions).  Shape:

    - node 7 is the mega-hub: ``n_hub`` direct children (ids 1000..)
      — one join key carrying ~10⁴× the median key's rows,
    - the hub chains upward 7 → 3 → 1 (so every hub child has 3 ancestors
      and the heavy key's matches propagate through rounds),
    - a geometric mid-tail: hubs of 100/10 children each,
    - one chain deeper than the 10-level cap (ids 50..64), so the cap and
      the skew interact in the same closure.

    At most one parent per child (the reference's shape).  Pure arithmetic,
    no randomness — the same edge set in every engine, so the DuckDB
    WITH RECURSIVE oracle can replay it bit-for-bit
    (tests/test_graph_skew.py).
    """
    edges: list[tuple[int, int]] = [(1000 + i, 7) for i in range(n_hub)]
    edges += [(7, 3), (3, 1)]
    edges += [(100_000 + i, 11) for i in range(100)]  # mid hub
    edges += [(200_000 + i, 13) for i in range(10)]   # small hub
    edges += [(11, 1), (13, 3)]
    edges += [(i, i - 1) for i in range(51, 65)]      # depth-14 chain
    return edges
