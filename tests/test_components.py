"""connected_components (dedup-group closure) unit tests, including a
randomized differential against a Python union-find reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from r_e_hive__spark.operators.graph import connected_components


def _edges(spark, pairs):
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])


def _got(spark, pairs, **kw):
    out = connected_components(_edges(spark, pairs), **kw)
    return {r.node: r.component for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # path graph 1-2-3-4-5: diameter 4 > 1 round, exercises iteration
    got = _got(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_groups_and_survivor_rule(spark):
    got = _got(spark, [(1, 2), (5, 6), (6, 7), (9, 9)])
    assert got == {1: 1, 2: 1, 5: 5, 6: 5, 7: 5, 9: 9}
    survivors = {n for n, c in got.items() if n == c}
    assert survivors == {1, 5, 9}


def test_max_iter_guard(spark):
    with pytest.raises(RuntimeError):
        _got(spark, [(i, i + 1) for i in range(1, 12)], max_iter=3)


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(20240814)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    assert _got(spark, pairs) == _union_find(pairs)
