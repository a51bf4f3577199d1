"""Unit tests for the iterative ancestor-closure operator (J8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators.graph import ancestor_closure


def _closure_py(edges: dict[int, int], max_levels: int = 10) -> set:
    out = set()
    for node in edges:
        cur, lvl = node, 0
        while cur in edges and lvl < max_levels:
            out.add((node, edges[cur], lvl + 1))
            cur, lvl = edges[cur], lvl + 1
    return out


def test_chain_with_cap(spark):
    # chain 15 → 14 → ... → 0 (depth 15 > cap 10)
    edges = {i: i - 1 for i in range(1, 16)}
    df = spark.createDataFrame(
        [(c, p) for c, p in edges.items()], "child INT, parent INT"
    )
    got = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, max_levels=10).collect()
    }
    assert got == _closure_py(edges, 10)
    assert max(lvl for (_, _, lvl) in got) == 10


def test_forest_and_early_exit(spark):
    # two shallow trees: closure loop must early-exit well before 10 iters
    edges = {2: 1, 3: 1, 4: 2, 10: 9}
    df = spark.createDataFrame(
        [(c, p) for c, p in edges.items()], "child INT, parent INT"
    )
    got = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, max_levels=10).collect()
    }
    assert got == _closure_py(edges, 10)


def test_hub_fanout(spark):
    # skew shape: one hub with many children, hub itself chained upward
    edges = {i: 100 for i in range(200, 260)}
    edges[100] = 99
    edges[99] = 98
    df = spark.createDataFrame(
        [(c, p) for c, p in edges.items()], "child INT, parent INT"
    )
    got = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, max_levels=10).collect()
    }
    assert got == _closure_py(edges, 10)
    # every hub child sees all three ancestors
    assert (200, 98, 3) in got


def test_empty_edges_local_strategy(spark):
    # zero Arrow batches reach the local closure's generator — must yield an
    # empty typed frame, not crash in pd.concat (ADVICE r1)
    df = spark.createDataFrame([], "child INT, parent INT")
    for strat in ("local", "doubling", "auto"):
        assert ancestor_closure(df, strategy=strat).count() == 0


def test_filtered_to_empty_local(spark):
    # non-empty scan whose runtime row count is zero after a filter: 'auto'
    # may pick 'local' off Catalyst's pre-filter size estimate
    df = spark.createDataFrame(
        [(2, 1), (3, 2)], "child INT, parent INT"
    ).where(F.col("child") > 100)
    assert ancestor_closure(df, strategy="local").count() == 0


def test_doubling_matches_local_on_skewed_graph(spark):
    # heavy-hitter shape: one ancestor with thousands of descendants (MLM
    # early-user convergence) — distributed doubling must agree with the
    # single-task local strategy row-for-row
    edges = {i: 7 for i in range(1000, 4000)}  # 3000 children of one hub
    edges.update({7: 3, 3: 1})                  # hub chained upward
    edges.update({i: i - 1 for i in range(50, 65)})  # a deep chain (>10)
    df = spark.createDataFrame(
        [(c, p) for c, p in edges.items()], "child INT, parent INT"
    )
    local = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, strategy="local").collect()
    }
    doubling = {
        (r["node"], r["ancestor"], r["level"])
        for r in ancestor_closure(df, strategy="doubling").collect()
    }
    assert doubling == local == _closure_py(edges, 10)
    assert (1000, 1, 3) in doubling  # hub child sees the chained ancestors


def test_doubling_plan_contains_joins(spark):
    # the doubling strategy must actually execute iterative equi-joins —
    # the closed-form unrolling has zero joins, so this distinguishes them
    from tests.test_plans import plan

    df = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 12)], "child INT, parent INT"
    )
    closure = ancestor_closure(df, strategy="doubling", max_levels=10)
    assert "Join" in plan(closure, "simple")


def test_declared_doubling_query_runs_distributed_path(spark):
    # the query must not silently fall back to the closed form (retired
    # from the driver surface in round 7; the plan pin stays)
    from r_e_hive__spark.queries import RETIRED, load_all
    from tests.test_plans import plan

    # load_all() first — it populates RETIRED (round-7 code review)
    q = {**load_all(), **RETIRED}["j8_doubling_closure"]
    df = q.spark_fn(spark, "/root/testdata/sf0.001")
    assert "Join" in plan(df, "simple")
    assert df.count() > 0


def test_null_parent_edges_match_recursive_sql(spark):
    """A NULL-parent edge terminates longer paths as a suffix — (A,B)+(B,NULL)
    yields (A,NULL,2) under WITH RECURSIVE, and both closure strategies must
    reproduce that exactly (round-4 review pinned this as intended, not a bug)."""
    import duckdb
    import pandas as pd

    from r_e_hive__spark.operators.graph import ancestor_closure

    edges = [(1, 2), (2, None), (3, 1)]
    df = spark.createDataFrame(edges, "child BIGINT, parent BIGINT")
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(edges, columns=["child", "parent"]))
    want = set(
        con.execute(
            """
            WITH RECURSIVE up AS (
              SELECT child AS node, parent AS ancestor, 1 AS level FROM edges
              UNION ALL
              SELECT up.node, e.parent, up.level + 1
              FROM up JOIN edges e ON up.ancestor = e.child
              WHERE up.level < 10
            )
            SELECT node, ancestor, level FROM up
            """
        ).fetchall()
    )
    assert (1, None, 2) in want  # the SQL oracle fabricates the NULL suffix
    for strategy in ("local", "doubling"):
        got = {
            (r["node"], r["ancestor"], r["level"])
            for r in ancestor_closure(df, strategy=strategy).collect()
        }
        assert got == want, strategy


# --------------------------------------------------------------- pagerank


def _np_pagerank(edges, d, n_iter, tol):
    """Independent numpy reference with the SAME semantics: uniform init,
    (1-d)/n teleport, dangling mass spread uniformly, L1 tol stop."""
    import numpy as np

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        recv = np.zeros(n)
        for u, v in edges:
            recv[idx[v]] += r[idx[u]] / deg[idx[u]]
        dangling = r[deg == 0].sum()
        nxt = (1 - d) / n + d * (recv + dangling / n)
        delta = np.abs(nxt - r).sum()
        r = nxt
        if delta < tol:
            break
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_reference(spark):
    import random

    from r_e_hive__spark.operators.graph import pagerank

    rng = random.Random(71)
    # random MULTIgraph: duplicate (src,dst) rows are parallel edges with
    # double weight (documented semantics — the reference iterates the
    # same duplicated list), plus dangling nodes (no out-edges)
    edges = [(rng.randrange(30), rng.randrange(40)) for _ in range(120)]
    edges += edges[:10]  # explicit duplicates
    df = spark.createDataFrame(edges, "src INT, dst INT")
    # NULL endpoints are dropped, never become nodes, never absorb mass
    withnull = df.unionByName(
        spark.createDataFrame(
            [(None, 5), (7, None), (None, None)], "src INT, dst INT"
        )
    )
    want = _np_pagerank(edges, 0.85, 25, 1e-12)
    for frame in (df, withnull):
        got = {
            r["node"]: r["rank"]
            for r in pagerank(frame, max_iter=25, tol=1e-12).collect()
        }
        assert set(got) == set(want)
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9, k


def test_pagerank_star_and_validation(spark):
    from r_e_hive__spark.operators.graph import pagerank

    import pytest as _pt

    # star: everyone links to node 0 -> node 0 dominates
    df = spark.createDataFrame(
        [(i, 0) for i in range(1, 8)], "src INT, dst INT"
    )
    r = {row["node"]: row["rank"] for row in pagerank(df).collect()}
    assert r[0] == max(r.values()) and r[0] > 0.4
    leaf = [v for k, v in r.items() if k != 0]
    assert max(leaf) - min(leaf) < 1e-12  # symmetric leaves tie
    with _pt.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
