"""Differential test: every declared query vs the DuckDB oracle at sf0.001.

This mirrors the driver's t2 correctness gate (which runs at sf0.01) —
failures here predict failures there.
"""

from __future__ import annotations

import pytest

from r_e_hive__spark.oracle.diff import run_diff
from r_e_hive__spark.queries import load_all
from tests.conftest import SF_SMOKE

QUERIES = list(load_all().values())


@pytest.mark.parametrize("q", QUERIES, ids=[q.name for q in QUERIES])
def test_declared_query_matches_oracle(spark, oracle_smoke, q):
    # Golden-VALUES oracles are pinned to one SF (the driver's sf0.01);
    # run those at their pin SF — the VALUES literal reads no views, so the
    # smoke-SF DuckDB connection is still valid for them.
    res = run_diff(spark, oracle_smoke, q, q.golden_sf or SF_SMOKE)
    assert res.ok, f"{q.name}: {res.detail}"
    if q.oracle is not None:
        assert res.n_spark == res.n_oracle
    else:
        # rows-only queries still must produce SOMETHING: a silent
        # empty frame passing CI would mask a dead filter
        assert res.n_spark > 0


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30
