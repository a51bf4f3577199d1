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


# --- large-star/small-star variant -----------------------------------------


def _got_star(spark, pairs, **kw):
    from r_e_hive__spark.operators.graph import connected_components_star

    out = connected_components_star(_edges(spark, pairs), **kw)
    return {r.node: r.component for r in out.collect()}


def test_star_matches_union_find_random(spark):
    rng = random.Random(99)
    nodes = list(range(120))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(90)]
    assert _got_star(spark, pairs) == _union_find(pairs)


def test_star_handles_long_path_in_few_rounds(spark):
    """A 60-edge path has diameter 60: min-label propagation would need
    ~60 rounds, the star contraction must finish well under its
    round guard — the O(log² n) claim, exercised."""
    pairs = [(i, i + 1) for i in range(60)]
    got = _got_star(spark, pairs, max_iter=12)
    assert got == {i: 0 for i in range(61)}


def test_star_star_and_singleton_groups(spark):
    got = _got_star(spark, [(5, 9), (9, 5), (2, 2), (7, 3)])
    assert got == {5: 5, 9: 5, 2: 2, 7: 3, 3: 3}


def test_dedup_survivors_transitive_chain(spark):
    """a~b, b~c (a!~c): pairwise keep-first would be order-dependent;
    the closed survivor set keeps exactly min(component)."""
    from pyspark.sql import Row

    from r_e_hive__spark.operators.dedup import dedup_survivors

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(1, 7)]
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=5, id_b=6)]
    )
    kept = sorted(
        r.doc_id for r in dedup_survivors(docs, pairs, "doc_id").collect()
    )
    assert kept == [1, 4, 5]
    kept_star = sorted(
        r.doc_id
        for r in dedup_survivors(
            docs, pairs, "doc_id", components="star"
        ).collect()
    )
    assert kept_star == kept
