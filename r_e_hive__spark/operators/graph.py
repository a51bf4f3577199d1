"""Iterative graph traversal operators (SURVEY.md §2.3 J8).

The reference walks referral uplines one row at a time, ≤10 levels, per
redemption (render-complete-deploy.js:246-316: loop at :262-301, cap at
:259).  Spark SQL (≤4.x) has no recursive CTE, so the engine computes the
*ancestor closure* for ALL start nodes at once — set-at-a-time instead of
the reference's N+1 per-row lookups.

The closure is built by **path doubling**, not one-hop-at-a-time: round k
holds every path of length ≤ 2^k, and the next round extends it with the
unique decomposition "prefix of length exactly 2^k + suffix of length
≤ 2^k".  Unique decomposition means no duplicate paths and no dedup pass.
Depth 10 therefore costs 4 joins (1→2→4→8→10) instead of 9, and the whole
closure is ONE lazy plan — no per-iteration isEmpty()/checkpoint actions.

Scale design (100 TB / power-law graphs):

- log₂(depth) shuffle rounds instead of depth rounds — at 1000 executors
  the shuffle-barrier count is the dominant latency term, so halving rounds
  roughly halves wall-clock for the deep-graph case.
- Each round is an equi-join on the frontier's ``ancestor`` key.  MLM-style
  graphs converge on early users (heavy-hitter keys); AQE's skew-join rule
  splits those partitions at runtime (enabled in session.get_spark).
- Lineage depth is O(log depth), so no checkpointing is needed even for
  depth caps in the hundreds; for a functional graph (≤1 parent per child,
  the reference's shape) round k's output is ≤ n·2^k rows, linear in n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _closure_local(
    edges: DataFrame,
    child_col: str,
    parent_col: str,
    max_levels: int,
    ord_col: str | None = None,
) -> DataFrame:
    """Closure for a graph small enough to fit in one executor's memory:
    gather the edge set into a single task and run the same path-doubling
    algorithm in vectorized pandas merges.

    This is the graph analog of a broadcast hash join's build side — when
    the dimension (here: the edge set) is broadcast-sized, shipping it to
    one place and computing locally beats 4 shuffle rounds + lineage
    checkpoints by an order of magnitude in job-scheduling overhead alone
    (1 Spark job vs ~8).  The caller gates entry by Catalyst's size
    estimate; the distributed path-doubling path below remains the 100 TB
    strategy for graphs that don't fit.
    """
    import pandas as pd

    from pyspark.sql.types import IntegerType, StructField, StructType

    from pyspark.sql.types import LongType

    in_types = {f.name: f.dataType for f in edges.schema.fields}
    fields = [
        StructField("node", in_types[child_col], True),
        StructField("ancestor", in_types[parent_col], True),
        StructField("level", IntegerType(), False),
    ]
    if ord_col is not None:
        fields.append(StructField("max_ord", LongType(), True))
    out_schema = StructType(fields)
    empty_cols = {f.name: [] for f in fields}

    def gen(batches):
        # An empty scan yields ZERO Arrow batches (not one empty batch), and
        # pd.concat([]) raises — guard before concatenating.
        chunks = list(batches)
        if not chunks:
            yield pd.DataFrame(empty_cols)
            return
        e = pd.concat(chunks, ignore_index=True)
        if e.empty:
            yield pd.DataFrame(empty_cols)
            return
        cl = pd.DataFrame(
            {"node": e[child_col], "ancestor": e[parent_col], "level": 1}
        )
        if ord_col is not None:
            cl["max_ord"] = e[ord_col].astype("int64")
        reach = 1
        while reach < max_levels:
            # same unique-decomposition invariant as the distributed path.
            # NULL-ancestor rows never act as a PREFIX (a null mid-node
            # can't be joined through — hence the notna() filter, since
            # pandas merge WOULD match NaN==NaN where Spark joins don't),
            # but they do terminate longer paths as a SUFFIX: prefix
            # (A,B,1) + suffix (B,NULL,1) → (A,NULL,2), exactly the row
            # WITH RECURSIVE produces for a NULL-parent edge (pinned
            # against DuckDB in tests/test_graph.py).
            pfx = cl[(cl["level"] == reach) & cl["ancestor"].notna()]
            sfx = cl[cl["node"].notna()]
            ext = pfx.merge(
                sfx, left_on="ancestor", right_on="node", suffixes=("", "_s")
            )
            ext_cols2 = {
                "node": ext["node"],
                "ancestor": ext["ancestor_s"],
                "level": ext["level"] + ext["level_s"],
            }
            if ord_col is not None:
                import numpy as np

                ext_cols2["max_ord"] = np.maximum(
                    ext["max_ord"], ext["max_ord_s"]
                )
            ext = pd.DataFrame(ext_cols2)
            ext = ext[ext["level"] <= max_levels]
            cl = pd.concat([cl, ext], ignore_index=True)
            reach = min(reach * 2, max_levels)
        yield cl

    sel = [child_col, parent_col] + ([ord_col] if ord_col is not None else [])
    return edges.select(*sel).repartition(1).mapInPandas(gen, out_schema)


def ancestor_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_levels: int = 10,
    strategy: str = "auto",
    ord_col: str | None = None,
) -> DataFrame:
    """Compute ``(node, ancestor, level)`` for every node, level ≤ max_levels.

    With ``ord_col`` (a long attribute on each edge), the output gains
    ``max_ord`` = the MAXIMUM ordinal over the path's edges — max is
    associative, so path doubling aggregates it exactly like ``level``.
    The redemption pipeline uses this for sequential edge visibility: an
    event only sees paths whose every edge existed when it was processed,
    i.e. ``max_ord <= event_ord`` (pipelines/redemption.py).

    ``edges`` has one row per (child → parent) link.  At most one parent per
    child is the reference's shape (it walks a single inbound edge,
    render-complete-deploy.js:263-267); the operator itself tolerates DAGs —
    each distinct path contributes one row, exactly like the one-hop loop.

    level 1 = direct parent, level N = N hops up.

    ``strategy``: ``'local'`` (gather the edge set into one task, closure
    via vectorized pandas path-doubling — for broadcast-sized graphs),
    ``'doubling'`` (log-depth distributed shuffle rounds, the 100 TB path),
    or ``'auto'`` — local iff Catalyst's size estimate for ``edges`` is
    under the session's autoBroadcastJoinThreshold.  This mirrors Spark's
    own BHJ-vs-SMJ choice, one level up: the small-graph case pays one job
    and zero wide shuffles, the huge-graph case pays log₂(depth) rounds.
    """
    if strategy == "auto":
        from r_e_hive__spark.operators import plan_fits_broadcast

        strategy = (
            "local" if plan_fits_broadcast(edges) else "doubling"
        )
    if strategy == "local":
        return _closure_local(edges, child_col, parent_col, max_levels, ord_col)
    base_cols = [
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("ancestor"),
        F.lit(1).cast("int").alias("level"),
    ]
    if ord_col is not None:
        base_cols.append(F.col(ord_col).cast("long").alias("max_ord"))
    closure = edges.select(*base_cols)
    reach = 1  # closure currently holds all paths of length ≤ reach
    rounds = 0
    while reach < max_levels:
        # Paths of length in (reach, 2*reach] decompose uniquely as
        # (exactly-reach prefix) + (suffix of length ≤ reach): join the
        # exact-length frontier against the whole closure.  The per-round
        # projections ride selectExpr/F.expr — one py4j round-trip per
        # select instead of one per Column op (round 11: the loop's
        # Column-API form was ~1.2 s of the benched j8_doubling rep; the
        # rendered expressions are name-for-name identical).
        pfx_cols = ["node AS _n", "ancestor AS _mid", "level AS _l"]
        ext_cols = [
            "pfx._n AS node",
            "sfx.ancestor AS ancestor",
            "(pfx._l + sfx.level) AS level",
        ]
        if ord_col is not None:
            pfx_cols.append("max_ord AS _o")
            ext_cols.append("greatest(pfx._o, sfx.max_ord) AS max_ord")
        prefix = (
            closure.where(F.col("level") == reach)
            .selectExpr(*pfx_cols)
            .alias("pfx")
        )
        suffix = closure.alias("sfx")
        ext = (
            prefix.join(suffix, F.expr("pfx._mid = sfx.node"), "inner")
            .selectExpr(*ext_cols)
            .where(f"level <= {int(max_levels)}")
        )
        closure = closure.unionByName(ext)
        reach = min(reach * 2, max_levels)
        rounds += 1
        if reach < max_levels and rounds % 2 == 0:
            # The closure appears TWICE in next round's plan (prefix and
            # suffix), so without materialization the lazy plan tree doubles
            # per round — 2^rounds leaf scans, and AQE re-executes each one.
            # An eager localCheckpoint pins the result (≤ depth·|E| rows for
            # a functional graph) to executor storage and truncates lineage.
            # Cadence: every OTHER round — lineage is then bounded at two
            # un-truncated doublings (4 leaf scans of the last checkpoint),
            # while the barrier count halves.  A/B at sf0.1 (BASELINE.md):
            # every round 1.04 s, every other 0.94 s, never 1.82 s.
            closure = closure.localCheckpoint(eager=True)
    return closure


def closure_from_parent_expr(
    nodes: DataFrame,
    key_col: str,
    parent_expr,
    max_levels: int = 10,
    **kw,
) -> DataFrame:
    """Ancestor closure where the parent is a computed expression of the key
    (e.g. the implicit binary tree ``parent = floor(key/2)`` used by the
    declared-query suite over the testdata ``customer`` table).

    ``parent_expr`` may be:

    - a ``Column`` — materialized into an edge table and closed with
      :func:`ancestor_closure` (join-based; works for any expression), or
    - a **callable** ``(key: Column, level: int) -> Column`` giving the
      level-``i`` ancestor *in closed form from the original key* (NULL
      where the path has already ended) — then the closure needs no graph
      operator at all: emit the ``max_levels`` ancestor expressions as an
      array and ``posexplode``.  One narrow whole-stage-codegen'd
      projection — zero shuffles, zero joins, embarrassingly parallel at
      any scale.  (Closed form is required rather than a self-application
      ``parent(parent(...))``: a lambda that references its argument more
      than once would nest the expression tree *exponentially* in
      ``max_levels``; with 2^10 leaf copies, codegen alone took seconds —
      measured, not hypothetical.)
    """
    if callable(parent_expr):
        key = F.col(key_col)
        chain = [parent_expr(key, i) for i in range(1, max_levels + 1)]
        return (
            nodes.select(
                key.alias("node"),
                F.posexplode(F.array(*chain)).alias("_i", "ancestor"),
            )
            .where(F.col("ancestor").isNotNull())
            .select(
                "node", "ancestor", (F.col("_i") + 1).cast("int").alias("level")
            )
        )
    edges = nodes.select(
        F.col(key_col).alias("child"), parent_expr.alias("parent")
    ).where(F.col("parent").isNotNull())
    return ancestor_closure(edges, "child", "parent", max_levels=max_levels, **kw)


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components over an undirected edge set: returns
    ``(node, component)`` where ``component`` is the MINIMUM node id
    reachable from ``node`` — the canonical representative.

    This is the missing step between pairwise near-dup detection and
    survivor selection: X2/X4/X17 emit PAIRS, but transitive chains
    (a~b, b~c, a!~c) must dedup as ONE group or the kept set depends on
    pair order.  ``components.where(node == component)`` is exactly the
    keep-min-per-group survivor rule, now transitively closed.

    Algorithm: min-label propagation to fixpoint — each round every node
    takes the min of its own label and its neighbors' labels (one
    shuffle join + one map-side-combined min-agg per round); converged
    when no label changes.  Rounds needed = graph diameter, which for
    near-dup clusters is small (dup groups are dense); the driver-side
    convergence check is one count per round (an O(changed) aggregate,
    not a collect of data).  ``localCheckpoint`` every ``checkpoint_every``
    rounds cuts the iterative-plan lineage exactly like the J8 closure
    (same measured rationale, BASELINE.md).  For web-scale power-law
    graphs with large diameters, the large-star/small-star formulation
    (Kiveris et al. 2014) halves rounds to O(log²) — out of scope until a
    real graph needs it; max_iter guards against it silently spinning.

    Raises after ``max_iter`` non-converged rounds rather than returning
    a partially-propagated labeling.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    sym = (
        edges.select(src.alias("_n"), dst.alias("_m"))
        .unionByName(edges.select(dst.alias("_n"), src.alias("_m")))
        # edge sets usually come out of expensive operators (LSH pair
        # joins, SemDeDup); without this cut the whole producing pipeline
        # re-executes twice per round (join + changed-count action)
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("_n").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("component"))
    for it in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["_m"] == labels["node"])
            .groupBy("_n")
            .agg(F.min("component").alias("_nbr"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["_n"], "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("_nbr", F.col("component"))
                ).alias("component"),
            )
        )
        if (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            # Lazy checkpoint of the RETURNED labeling (round 12): callers
            # consume it more than once (incremental_neardup derives both
            # history components and new labels from it), and each
            # consumer would otherwise replay the last un-checkpointed
            # propagation rounds — (node, component) is tiny, so pinning
            # it is metadata-scale.  No-op when the converged round
            # already checkpointed.
            if (it + 1) % checkpoint_every == 0:
                return labels
            return labels.localCheckpoint(eager=False)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter; raise max_iter or use a "
        "log-round formulation)"
    )


def _cc_star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star / small-star round (Kiveris et al. 2014).

    Neighborhoods are taken over the symmetrized edge set; for each
    center u with m = min(N(u) ∪ {u}):
    large-star  emits (v, m) for v ∈ N(u), v >  u  — strictly-larger
    neighbors re-link to the minimum (keeps (u,m) implicitly via the
    symmetric pass of m's own star);
    small-star emits (v, m) for v ∈ N(u) ∪ {u}, v <= u, v != m —
    smaller neighbors and u itself collapse onto the minimum.
    Output is canonical (big, small) pairs with self-loops dropped.
    """
    sym = edges.unionByName(
        edges.select(F.col("_m").alias("_n"), F.col("_n").alias("_m"))
    )
    m = sym.groupBy("_n").agg(
        F.least(F.min("_m"), F.col("_n")).alias("_min")
    )
    nb = sym.join(m, "_n")
    if large:
        out = nb.where(F.col("_m") > F.col("_n")).select(
            F.col("_m").alias("_n"), F.col("_min").alias("_m")
        )
    else:
        smaller = nb.where(F.col("_m") <= F.col("_n")).select(
            F.col("_m").alias("_n"), F.col("_min").alias("_m")
        )
        self_link = m.select(F.col("_n"), F.col("_min").alias("_m"))
        out = smaller.unionByName(self_link)
    return (
        out.where(F.col("_n") != F.col("_m"))
        .select(
            F.greatest("_n", "_m").alias("_n"), F.least("_n", "_m").alias("_m")
        )
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond") — O(log² n) rounds REGARDLESS of graph diameter, vs
    min-label propagation's O(diameter) (:func:`connected_components`).
    Same output contract: (node, component = min reachable id).

    Use this variant for long-chain / high-diameter graphs (lineage
    chains, web graphs); for dense near-dup clusters (tiny diameter) the
    simpler propagation converges in fewer, cheaper rounds.  Parity on
    random graphs + a 60-long path (where propagation's round count
    explodes) pinned in tests/test_components.py.
    """
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .unionByName(edges.select(dst.alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = (
        edges.select(
            F.greatest(src, dst).alias("_n"), F.least(src, dst).alias("_m")
        )
        .where(F.col("_n") != F.col("_m"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for it in range(max_iter):
        nxt = _cc_star_round(_cc_star_round(cur, large=True), large=False)
        # per-round checkpoint is load-bearing here (unlike the
        # propagation variant's every-3rd cadence): each round composes
        # TWO star operations over the previous round's plan, so an
        # uncut lineage grows exponentially.  The previous round's
        # blocks are released by Spark's ContextCleaner once `cur` is
        # rebound below and the old frame is garbage-collected — at most
        # a couple of edge-set snapshots are ever live (there is no
        # public API to free localCheckpoint blocks eagerly).
        nxt = nxt.localCheckpoint(eager=True)
        # converged when the canonical edge set is unchanged (both
        # directions of the set-difference, each a tiny anti-join count)
        changed = (
            nxt.exceptAll(cur).limit(1).count()
            + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            # stars: every non-root points directly at its component root
            labels = cur.select(
                F.col("_n").alias("node"), F.col("_m").alias("component")
            )
            return (
                nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias("component"),
                )
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-9,
) -> DataFrame:
    """PageRank over a directed edge list — the link-graph quality signal
    web-corpus curation pipelines attach to documents (Common Crawl's
    harmonic/centrality rankings are this op's family; public
    formulation: Page et al. 1999, the power-iteration form every Spark
    tutorial distributes the same way).

    Returns ``(node, rank)`` over every node appearing as src OR dst;
    ranks sum to 1.  Semantics (matched exactly by the numpy reference
    differential in tests/test_graph.py):

    - teleport ``(1-d)/n`` to every node,
    - dangling nodes (no out-edges) spread their whole rank uniformly —
      the standard stochastic-matrix completion, without which rank mass
      leaks and the vector no longer sums to 1,
    - stop when the L1 delta < ``tol`` or after ``max_iter`` rounds
      (power iteration converges geometrically at rate ``damping``;
      fixed-iteration cutoff is the standard practice, not an error),
    - NULL endpoints are dropped up front (a NULL link target is absent
      evidence, not a node — and routing mass to an unjoinable NULL
      would silently leak it; round-6 code review),
    - duplicate (src, dst) rows are PARALLEL edges: a page linking twice
      passes twice the weight — multigraph semantics, matching a raw
      link table; pre-``distinct()`` the edges for simple-graph ranks
      (the numpy differential covers both shapes).

    Scale shape: per round ONE edges⋈ranks shuffle + one map-side-
    combined sum per dst; out-degrees computed once and re-joined (they
    never change); the dangling mass and the convergence delta are
    1-row aggregates (driver reads parameters, never data).  Each
    round's ranks are eagerly localCheckpointed: the two per-round
    driver actions (dangling mass, delta) fully materialize the frame
    anyway, so pinning it costs nothing and stops rounds i+1/i+2 from
    re-executing round i's joins (unlike the lazy single-action J8 loop,
    where a sparser cadence wins).  Float caveat: distributed double
    sums commute to ~1e-12 relative — rank VALUES are reproducible to
    that tolerance, not bit-exact (same contract as train_kmeans).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    src, dst = F.col(src_col), F.col(dst_col)
    ed = (
        edges.select(src.alias("_s"), dst.alias("_d"))
        .where(F.col("_s").isNotNull() & F.col("_d").isNotNull())
        .localCheckpoint(eager=True)
    )
    nodes = (
        ed.select(F.col("_s").alias("node"))
        .unionByName(ed.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # static per-round inputs pinned once: out_deg feeds the dangling
    # anti-join every round, ed_w the contribution join
    out_deg = ed.groupBy("_s").agg(F.count("*").alias("_deg")).localCheckpoint(
        eager=True
    )
    ed_w = ed.join(out_deg, "_s").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    for it in range(max_iter):
        received = (
            ed_w.join(ranks, ed_w["_s"] == ranks["node"])
            .select("_d", (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_recv"))
        )
        # dangling mass: rank parked on nodes with no out-edges (1-row agg)
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["_s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        base = teleport + damping * dangling / n
        nxt = (
            ranks.join(received, ranks["node"] == received["_d"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("_recv", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # pin EVERY round: the dangling/delta driver actions materialize
        # nxt regardless, and an unpinned frame would re-run this round's
        # joins inside the next two rounds' plans (round-6 code review)
        nxt = nxt.localCheckpoint(eager=True)
        delta = (
            nxt.alias("n")
            .join(ranks.alias("o"), "node")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )
        ranks = nxt
        if delta is not None and delta < tol:
            break
    return ranks
