"""Golden + property tests for the batch redemption pipeline (SURVEY.md
§5.2.2, §5.2.4).

The oracle is an independent pure-Python Decimal reimplementation of the
reference's arithmetic (direct = price × direct_rate,
render-complete-deploy.js:216; passive = price × passive_rate flat per
level ≤ 10, :275/:259; profit = price − Σ commissions floored at 0,
:303-307) walked over the fixture graph.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from r_e_hive__spark.fixtures import build_fixtures, fixture_frames
from r_e_hive__spark.pipelines.redemption import MAX_LEVELS, process_redemptions
from r_e_hive__spark.pipelines.views import balances


def _round2(x: Decimal) -> Decimal:
    return x.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


def python_oracle(rows: dict) -> dict:
    """Independent sequential walk over the fixtures."""
    packages = {p["id"]: p for p in rows["packages"]}
    codes = {c["code"]: c for c in rows["gift_codes"]}
    users_by_ref = {u["referral_code"]: u["id"] for u in rows["users"]}
    parent = {r["referred_id"]: r["referrer_id"] for r in rows["referrals"]}
    has_parent = set(parent)

    ledger = []  # (event_id, user_id, level, type, amount)
    profits = {}  # event_id -> (profit, commission_paid)
    rejected = {}  # event_id -> reason
    redeemed_in_batch: set = set()  # sequential same-batch conflict rule

    for ev in rows["redemption_events"]:
        code = codes.get(ev["code"])
        if code is None:
            rejected[ev["event_id"]] = "invalid_code"
            continue
        if code["is_redeemed"] or ev["code"] in redeemed_in_batch:
            rejected[ev["event_id"]] = "already_redeemed"
            continue
        if code["created_by"] == ev["user_id"]:
            rejected[ev["event_id"]] = "self_redemption"
            continue
        pkg = packages[code["package_id"]]
        redeemed_in_batch.add(ev["code"])  # later same-batch events reject
        # optional referral edge insert
        if ev["referral_code"] is not None:
            referrer = users_by_ref.get(ev["referral_code"])
            if referrer and referrer != ev["user_id"] and ev["user_id"] not in has_parent:
                parent[ev["user_id"]] = referrer
                has_parent.add(ev["user_id"])
        direct = _round2(pkg["price"] * pkg["direct_commission_rate"])
        ledger.append((ev["event_id"], code["created_by"], 0, "direct", direct))
        total = direct
        node, level = ev["user_id"], 1
        while node in parent and level <= MAX_LEVELS:
            anc = parent[node]
            passive = _round2(pkg["price"] * pkg["passive_commission_rate"])
            ledger.append((ev["event_id"], anc, level, "passive", passive))
            total += passive
            node, level = anc, level + 1
        profit = max(Decimal("0.00"), pkg["price"] - total)
        profits[ev["event_id"]] = (profit, total)

    return dict(ledger=ledger, profits=profits, rejected=rejected)


@pytest.fixture(scope="module")
def outputs(spark):
    fx = fixture_frames(spark)
    out = process_redemptions(
        fx["redemption_events"], fx["gift_codes"], fx["users"],
        fx["packages"], fx["referrals"],
    )
    return fx, out


def test_ledger_matches_python_oracle(spark, outputs):
    _, out = outputs
    oracle = python_oracle(build_fixtures())
    got = {
        (r["event_id"], r["user_id"], r["level"], r["type"], str(r["amount"]))
        for r in out.commission_ledger.collect()
    }
    want = {
        (e, u, lvl, t, str(a)) for (e, u, lvl, t, a) in oracle["ledger"]
    }
    assert got == want


def test_rejections(outputs):
    _, out = outputs
    oracle = python_oracle(build_fixtures())
    got = {(r["event_id"], r["reject_reason"]) for r in out.rejected.collect()}
    assert got == set(oracle["rejected"].items())


def test_company_profits(outputs):
    _, out = outputs
    oracle = python_oracle(build_fixtures())
    got = {
        r["event_id"]: (str(r["amount"]), str(r["commission_paid"]))
        for r in out.company_profits.collect()
    }
    want = {e: (str(p), str(c)) for e, (p, c) in oracle["profits"].items()}
    assert got == want


def test_level_cap_and_counts(outputs):
    """commission count per accepted redemption == 1 + min(upline_depth, 10)
    (render-complete-deploy.js:259); no level exceeds the cap."""
    _, out = outputs
    rows = out.commission_ledger.collect()
    assert max(r["level"] for r in rows) <= MAX_LEVELS
    oracle = python_oracle(build_fixtures())
    from collections import Counter

    got = Counter(r["event_id"] for r in rows)
    want = Counter(e for (e, *_rest) in oracle["ledger"])
    assert got == want


def test_ledger_invariant_conservation(outputs):
    """Σ(commissions) + Σ(company profit) == Σ(redeemed package prices)
    (when no profit clamps at 0 — true for these fixtures)."""
    fx, out = outputs
    from pyspark.sql import functions as F

    total_comm = out.commission_ledger.agg(F.sum("amount")).collect()[0][0]
    total_profit = out.company_profits.agg(F.sum("amount")).collect()[0][0]
    accepted = out.accepted.select("price").collect()
    total_price = sum((r["price"] for r in accepted), Decimal("0.00"))
    assert total_comm + total_profit == total_price


def test_balances_view(spark, outputs):
    fx, out = outputs
    bal = balances(
        fx["commissions"].select("user_id", "amount"),
        fx["commission_withdrawals"],
    ).collect()
    by_user = {r["user_id"]: r for r in bal}
    # u0001: 105 fixture credit rows minus one approved 50.00 withdrawal
    rows = build_fixtures()["commissions"]
    u1_credit = sum((r["amount"] for r in rows if r["user_id"] == "u0001"), Decimal(0))
    assert str(by_user["u0001"]["commission_balance"]) == str(u1_credit - Decimal("50.00"))
    assert str(by_user["u0001"]["total_withdrawn"]) == "50.00"


def test_same_batch_code_conflict_and_referral_dedup(spark):
    """Round-4 review regressions, sequential-semantics edition:
    (a) two same-batch redemptions of one code: earliest (ts, event_id)
        wins, the other is rejected 'already_redeemed' and pays nothing;
    (b) one user redeeming two codes with referral codes in one batch
        inserts exactly ONE inbound edge and passive rows are not doubled.
    """
    from datetime import datetime
    from decimal import Decimal

    from pyspark.sql import functions as F

    from r_e_hive__spark.schemas import REHIVE_SCHEMAS

    TS = datetime(2024, 1, 5)
    mk = lambda name, rows: spark.createDataFrame(rows, REHIVE_SCHEMAS[name])
    users = mk("users", [
        (f"u{i}", f"{i}@x", f"U{i}", None, None, None, f"REF{i}", "pending",
         TS, Decimal("0.00"), "inactive", None, None)
        for i in range(3)
    ])
    packages = mk("packages", [
        (1, "p1", Decimal("100.00"), Decimal("0.0500"), Decimal("0.10"),
         None, Decimal("0.00"), None, TS),
    ])
    gift_codes = mk("gift_codes", [
        (1, "CODEA", 1, "u0", False, None, None, TS),
        (2, "CODEB", 1, "u0", False, None, None, TS),
    ])
    referrals = mk("referrals", [])
    events = mk("redemption_events", [
        # (a) CODEA redeemed twice: event 1 (earlier ts) wins over event 2
        (1, "CODEA", "u1", None, datetime(2024, 1, 6, 10)),
        (2, "CODEA", "u2", None, datetime(2024, 1, 6, 11)),
        # (b) u2 redeems CODEB twice... can't (same code) — use CODEB once
        # plus CODEA loser carrying a referral code: the loser inserts no
        # edge (it is rejected), CODEB's event carries REF0 -> one edge
        (3, "CODEB", "u2", "REF0", datetime(2024, 1, 6, 12)),
    ])
    out = process_redemptions(events, gift_codes, users, packages, referrals)

    rej = {r["event_id"]: r["reject_reason"] for r in out.rejected.collect()}
    assert rej == {2: "already_redeemed"}
    assert sorted(r["event_id"] for r in out.accepted.collect()) == [1, 3]
    # the rejected event pays nothing
    assert out.commission_ledger.where(F.col("event_id") == 2).count() == 0

    edges = out.new_referrals.collect()
    assert len(edges) == 1
    assert (edges[0]["referrer_id"], edges[0]["referred_id"]) == ("u0", "u2")
    # u2's accepted redemption pays exactly one passive row (one edge, level 1)
    passive = out.commission_ledger.where(
        (F.col("event_id") == 3) & (F.col("type") == "passive")
    ).collect()
    assert len(passive) == 1 and passive[0]["user_id"] == "u0"


def test_same_batch_double_referral_single_edge(spark):
    """(b) proper: one user's TWO accepted same-batch redemptions, both
    carrying a referral code — exactly one inbound edge, passive rows per
    event not duplicated."""
    from datetime import datetime
    from decimal import Decimal

    from pyspark.sql import functions as F

    from r_e_hive__spark.schemas import REHIVE_SCHEMAS

    TS = datetime(2024, 1, 5)
    mk = lambda name, rows: spark.createDataFrame(rows, REHIVE_SCHEMAS[name])
    users = mk("users", [
        (f"u{i}", f"{i}@x", f"U{i}", None, None, None, f"REF{i}", "pending",
         TS, Decimal("0.00"), "inactive", None, None)
        for i in range(2)
    ])
    packages = mk("packages", [
        (1, "p1", Decimal("100.00"), Decimal("0.0500"), Decimal("0.10"),
         None, Decimal("0.00"), None, TS),
    ])
    gift_codes = mk("gift_codes", [
        (1, "CODEA", 1, "u0", False, None, None, TS),
        (2, "CODEB", 1, "u0", False, None, None, TS),
    ])
    referrals = mk("referrals", [])
    events = mk("redemption_events", [
        (1, "CODEA", "u1", "REF0", datetime(2024, 1, 6, 10)),
        (2, "CODEB", "u1", "REF0", datetime(2024, 1, 6, 11)),
    ])
    out = process_redemptions(events, gift_codes, users, packages, referrals)
    assert out.rejected.count() == 0
    assert out.new_referrals.count() == 1  # ONE edge despite two carriers
    # each accepted event pays exactly 1 direct + 1 passive (no duplicated
    # closure paths from a duplicated edge)
    counts = {
        (r["event_id"], r["type"]): r["n"]
        for r in out.commission_ledger.groupBy("event_id", "type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {
        (1, "direct"): 1, (1, "passive"): 1,
        (2, "direct"): 1, (2, "passive"): 1,
    }


def test_same_batch_edge_not_retroactive(spark):
    """Third sequential rule (round-4 review): an edge inserted by a LATER
    same-batch event must not retroactively pay passive commissions for an
    EARLIER event — but the inserting event itself pays through its own
    new edge (the reference inserts the edge before processing commissions,
    render-complete-deploy.js:494-501)."""
    from datetime import datetime
    from decimal import Decimal

    from pyspark.sql import functions as F

    from r_e_hive__spark.schemas import REHIVE_SCHEMAS

    TS = datetime(2024, 1, 5)
    mk = lambda name, rows: spark.createDataFrame(rows, REHIVE_SCHEMAS[name])
    users = mk("users", [
        (f"u{i}", f"{i}@x", f"U{i}", None, None, None, f"REF{i}", "pending",
         TS, Decimal("0.00"), "inactive", None, None)
        for i in range(2)
    ])
    packages = mk("packages", [
        (1, "p1", Decimal("100.00"), Decimal("0.0500"), Decimal("0.10"),
         None, Decimal("0.00"), None, TS),
    ])
    gift_codes = mk("gift_codes", [
        (1, "CODEA", 1, "u0", False, None, None, TS),
        (2, "CODEB", 1, "u0", False, None, None, TS),
    ])
    referrals = mk("referrals", [])
    events = mk("redemption_events", [
        # event 1: u1 redeems with NO referral code (edge does not exist yet)
        (1, "CODEA", "u1", None, datetime(2024, 1, 6, 10)),
        # event 2: u1 redeems WITH a referral code -> edge (u0 -> u1) inserted
        (2, "CODEB", "u1", "REF0", datetime(2024, 1, 6, 11)),
    ])
    out = process_redemptions(events, gift_codes, users, packages, referrals)
    by_event = {
        (r["event_id"], r["type"]): r["n"]
        for r in out.commission_ledger.groupBy("event_id", "type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # event 1 pre-dates the edge: direct only; event 2 pays through its edge
    assert by_event == {(1, "direct"): 1, (2, "direct"): 1, (2, "passive"): 1}


def test_users_current_derives_package_id(spark, outputs):
    """Mutate step 5 (render-complete-deploy.js:484-486): an accepted
    redemption sets the redeemer's CURRENT package; latest accepted wins,
    users without redemptions keep their stored package_id."""
    from r_e_hive__spark.pipelines.views import users_current

    fx, out = outputs
    cur = users_current(
        fx["users"],
        fx["commissions"],
        fx["commission_withdrawals"],
        "2024-01-21 00:00:00",
        accepted_redemptions=out.accepted.select(
            "user_id", "package_id", "event_ts", "event_id"
        ),
    )
    pkg = {r["id"]: r["package_id"] for r in cur.collect()}
    stored = {r["id"]: r["package_id"] for r in fx["users"].collect()}
    acc = sorted(
        out.accepted.select("user_id", "package_id", "event_ts", "event_id").collect(),
        key=lambda r: (r["event_ts"], r["event_id"]),
    )
    want = dict(stored)
    for r in acc:  # latest accepted wins, applied in processing order
        want[r["user_id"]] = r["package_id"]
    assert pkg == want
    # at least one user actually changed (isolated users start with NULL)
    assert any(stored[u] != pkg[u] for u in pkg)
