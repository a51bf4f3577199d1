"""Retired declared queries stay differentially green.

The driver records correctness for at most 50 queries() entries, so some
queries were retired from the declared surface (ledger in
queries/__init__.py).  Retirement removes them from the driver's gate, not
from the engine: each keeps its DuckDB oracle in the RETIRED registry and
this test runs the same differential the driver would have.
"""

from __future__ import annotations

import pytest

from r_e_hive__spark.oracle.diff import run_diff
from r_e_hive__spark.queries import RETIRED, load_all
from tests.conftest import SF_SMOKE

load_all()
RETIRED_QUERIES = list(RETIRED.values())


def test_retired_registry_populated():
    # the round-5 ledger entries — if a retirement is ever made without a
    # RETIRED registration, the ledger's "still covered" claim goes stale
    assert {q.name for q in RETIRED_QUERIES} >= {
        "x6_lang_distribution",
        "rehive_user_balances",
        "j8_upline_aggregate",
        "x4_neardup_pairs",
        "p7_asof_timestamp",
        "rehive_company_profits",
    }


@pytest.mark.parametrize(
    "q", RETIRED_QUERIES, ids=[q.name for q in RETIRED_QUERIES]
)
def test_retired_query_matches_oracle(spark, oracle_smoke, q):
    res = run_diff(spark, oracle_smoke, q, q.golden_sf or SF_SMOKE)
    assert res.ok, f"{q.name}: {res.detail}"
