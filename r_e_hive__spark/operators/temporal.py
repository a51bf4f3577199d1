"""Temporal joins: as-of join and range (interval) join (SURVEY.md §2.11).

Two operators the north star names as canonical "Spark lacks it, build it
from compositions" cases.  Both are pure DataFrame compositions — no UDF,
no driver loop — with plans that survive a 100× scale-up:

- ``asof_join``: for every left row, the single most recent right row at or
  before the left timestamp (per key) — the P7 subscription-status lookup
  (render-complete-deploy.js:582-610 reads "the newest subscription row as
  of now") generalized to arbitrary event-to-dimension alignment.  Built as
  the union-tag trick: one shuffle + one sort per key (a single window),
  NOT a per-left-row subquery.  DuckDB's native ASOF JOIN is the
  differential oracle (tests/test_temporal.py).
- ``range_join``: left points joined to right intervals containing them.
  The naive formulation is an inequality theta-join — Spark plans that as
  BroadcastNestedLoopJoin (O(n·m), a 100 TB disaster).  The scale path
  bins: each interval explodes into the fixed-width bins it covers, each
  point hashes to exactly one bin, and the join becomes an equi-join on
  (key, bin) + a residual filter.  Expansion = interval_len/bin_width + 1
  per interval — pick bin_width near the median interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    right_on: str | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "r_",
    distributed: bool | None = None,
) -> DataFrame:
    """Per-key as-of alignment: each left row gains the right row whose
    ``on`` value is the nearest at-or-before it (``backward``, inclusive —
    DuckDB/QuestDB ASOF semantics) or at-or-after it (``forward``).

    Plan shape: union the two sides with a side tag, then ONE window per
    key ordered by (on, side) carrying ``last(value, ignorenulls=True)``
    (or ``first`` over the following frame for ``forward``) — a single
    shuffle on ``by`` and a single sort, independent of how many right
    rows precede each left row.  Rows with no candidate get nulls (left
    join semantics).  ``tolerance``: an INTERVAL (timestamp keys) or
    numeric bound; matches farther than it are nulled out.

    ``right_on`` names the right side's axis column when it differs from
    the left's (pandas ``merge_asof`` convention).  Right columns surface
    as ``{right_prefix}{name}``; the matched axis value as
    ``{right_prefix}{right_on}``.  If several right rows share one
    (key, on) value the latest in the window order wins — make ``on``
    unique per key for deterministic output, as with any as-of engine.

    **Keyless scale path** (``by=()``): a global ordered window would run
    in ONE partition (a round-4 review finding).  Unless
    ``distributed=False``, the keyless case instead range-partitions the
    tagged union on the axis, runs the window *within* each range
    partition, and propagates the last (``backward``) / first
    (``forward``) non-null candidate across partitions through a tiny
    per-partition carry frame (one row per range partition — the same
    two-phase shape as ``operators.packing.weighted_prefix_sum``).  Cost:
    one eager localCheckpoint of the union to pin the sampled range
    bounds for the two consuming subtrees.  ``distributed=True`` on a
    keyed join is invalid (per-key windows already parallelize).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if distributed and by:
        raise ValueError("distributed=True applies only to the keyless case")
    right_on = right_on or on
    r_payload = [c for c in right.columns if c not in (*by, right_on)]
    out_payload = [right_prefix + c for c in (right_on, *r_payload)]

    # The candidate right row travels as ONE struct so the window carries it
    # atomically: per-column last(ignorenulls) would splice a NULL payload
    # field with the value from an OLDER right row (torn rows — found in the
    # round-4 code review; a NULL field in the nearest right row must
    # surface as NULL, exactly as DuckDB ASOF returns it).
    r_struct = F.struct(
        F.col(right_on).alias(right_prefix + right_on),
        *[F.col(c).alias(right_prefix + c) for c in r_payload],
    )
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None)
        .cast(
            right.select(r_struct.alias("__r")).schema["__r"].dataType
        )
        .alias("__r"),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(c) if c in by else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        r_struct.alias("__r"),
        F.lit(0).alias("__side"),
    )
    # right's event position on the shared axis is its own `right_on` value
    r_tagged = r_tagged.withColumn(on, F.col(f"__r.{right_prefix}{right_on}"))

    unioned = l_tagged.unionByName(r_tagged)
    backward = direction == "backward"

    if not by and distributed is not False:
        picked_frame = _keyless_asof_pick(unioned, on, backward)
    else:
        if backward:
            # right(side=0) sorts before left(side=1) at equal `on`:
            # inclusive
            w = (
                Window.partitionBy(*by)
                .orderBy(F.col(on).asc(), F.col("__side").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            picked = F.last(F.col("__r"), ignorenulls=True).over(w)
        else:
            w = (
                Window.partitionBy(*by)
                .orderBy(F.col(on).asc(), F.col("__side").desc())
                .rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            picked = F.first(F.col("__r"), ignorenulls=True).over(w)
        picked_frame = unioned.select(
            *unioned.columns, picked.alias("__m")
        )

    matched = (
        picked_frame.where(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__m.{c}").alias(c) for c in out_payload],
        )
    )

    if tolerance is not None:
        m = F.col(right_prefix + right_on)
        in_range = (
            (F.col(on) - m <= tolerance)
            if direction == "backward"
            else (m - F.col(on) <= tolerance)
        )
        matched = matched.select(
            *[c for c in left.columns],
            *[
                F.when(in_range, F.col(c)).alias(c)
                for c in out_payload
            ],
        )
    return matched


def _keyless_asof_pick(unioned: DataFrame, on: str, backward: bool) -> DataFrame:
    """Distributed candidate pick for the keyless as-of: the tagged union
    range-partitioned on ``(on, __side)``, the running
    last/first-non-null window evaluated per range partition, and the
    candidate carried across partition boundaries via a one-row-per-
    partition offsets frame (broadcast back).  Mirrors the two-phase
    distributed prefix-sum in ``operators.packing`` — the carry frame has
    at most ``spark.sql.shuffle.partitions`` rows, so the only global
    (single-partition) step runs over that tiny frame, never the data.
    """
    side_asc = F.col("__side").asc() if backward else F.col("__side").desc()
    # Two subtrees consume the ranged frame and repartitionByRange's
    # sampled bounds are not guaranteed identical across re-executions —
    # pin one materialization (same trick as weighted_prefix_sum).
    ranged = (
        unioned.repartitionByRange(F.col(on).asc(), side_asc)
        .sortWithinPartitions(F.col(on).asc(), side_asc)
        .localCheckpoint(eager=True)
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    # one candidate row per range partition: the partition's last (backward)
    # / first (forward) right row in axis order.  Only right rows carry a
    # non-null __r, so ordering by the axis alone suffices.
    edge = F.max_by("__r", F.col(on)) if backward else F.min_by("__r", F.col(on))
    per_pid = (
        with_pid.where(F.col("__r").isNotNull())
        .groupBy("_pid")
        .agg(edge.alias("_cr"))
    )
    pids = with_pid.select("_pid").distinct()
    if backward:
        w_carry = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        carry_col = F.last("_cr", ignorenulls=True).over(w_carry)
    else:
        w_carry = Window.orderBy("_pid").rowsBetween(1, Window.unboundedFollowing)
        carry_col = F.first("_cr", ignorenulls=True).over(w_carry)
    carry = (
        pids.join(per_pid, "_pid", "left")
        .withColumn("_carry", carry_col)
        .select("_pid", "_carry")
    )
    if backward:
        w_local = (
            Window.partitionBy("_pid")
            .orderBy(F.col(on).asc(), side_asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = F.last("__r", ignorenulls=True).over(w_local)
    else:
        w_local = (
            Window.partitionBy("_pid")
            .orderBy(F.col(on).asc(), side_asc)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        local = F.first("__r", ignorenulls=True).over(w_local)
    return (
        with_pid.join(F.broadcast(carry), "_pid")
        .withColumn("__m", F.coalesce(local, F.col("_carry")))
        .drop("_pid", "_carry")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_width: int | str = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join via fixed-width binning (inclusive bounds).

    ``points[point_col]`` and ``intervals[start_col,end_col]`` must share a
    numeric axis (epoch seconds/micros, ids...); timestamp columns are
    converted to epoch seconds automatically.  Each interval is exploded
    into the bins ``[floor(start/w) .. floor(end/w)]``; each point maps to
    exactly one bin, so every qualifying (point, interval) pair meets in
    exactly one bucket — no dedup needed — and the join is a plain
    equi-join on (by…, bin) followed by the residual bound filter.

    ``how='left'`` keeps unmatched points (null interval columns; point
    rows are assumed distinct — carry a unique id column, as the driver
    tables do).  At
    100 TB the equi-join shuffles both sides once on (by…, bin); skew from
    a popular bin is AQE-splittable because the hot key is a real join key
    (compare ``salted_join`` when ``by`` alone is the hot axis).

    ``bin_width`` is purely a PERFORMANCE knob — any width returns the
    identical result (the residual filter is exact) — but a bad one is
    the op's classic footgun: too narrow explodes every interval into
    thousands of bins, too wide funnels unrelated points into shared
    buckets.  ``bin_width="auto"`` sizes bins from the intervals
    themselves: the MEDIAN interval length (a typical interval spans
    ~1-2 bins) floored at max_length/10_000 so one long-tail interval
    can never explode into more than ~10 k bin rows (an unbounded
    median-only rule would materialize length/median elements for the
    outlier — reviewed failure: a 1 s median with a 1-year interval is
    a 15.7 M-element sequence).  Auto costs ONE eager tiny agg on the
    intervals side at PLAN TIME (breaks laziness, double-executes an
    expensive uncached intervals lineage, and cannot run on streaming
    frames) — which is why it is opt-in, not the default (round-6 code
    review); the static default stays 3600 (epoch-seconds hour).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    by = list(by)

    def _axis(df: DataFrame, c: str) -> Column:
        from pyspark.sql.types import TimestampType

        if isinstance(df.schema[c].dataType, TimestampType):
            return F.unix_timestamp(F.col(c))
        return F.col(c).cast("long")

    if bin_width == "auto":
        med, mx = intervals.agg(
            F.approx_percentile(
                _axis(intervals, end_col) - _axis(intervals, start_col),
                F.lit(0.5),
                F.lit(10_000),
            ),
            F.max(_axis(intervals, end_col) - _axis(intervals, start_col)),
        ).first()
        bin_width = max(1, int(med or 0) + 1, -(-int(mx or 0) // 10_000))
    elif (
        isinstance(bin_width, bool)  # bool is an int subclass: True would
        # silently mean bin_width=1 and False would raise with a confusing
        # message (round-6 ADVICE) — reject both explicitly
        or not isinstance(bin_width, int)
        or bin_width < 1
    ):
        raise ValueError(f"bin_width must be 'auto' or a positive int, got {bin_width!r}")
    p = points.withColumn("__bin", F.floor(_axis(points, point_col) / bin_width))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_axis(intervals, start_col) / bin_width),
                F.floor(_axis(intervals, end_col) / bin_width),
            )
        ),
    )
    i = i.withColumn("__hit", F.lit(1))  # explicit join-match marker: a
    # matched interval whose payload columns are all NULL must still count
    # as a match (round-4 code review)
    cond = [p["__bin"] == i["__bin"]] + [p[c] == i[c] for c in by]
    joined = p.join(i, cond, "inner" if how == "inner" else "left_outer")
    in_bounds = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    out_cols = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c not in by
    ]
    if how == "inner":
        return joined.where(in_bounds).select(*out_cols)
    # left: a real match keeps its interval row (duplicate interval rows and
    # all-NULL payloads included — same multiplicity as `inner`); a point
    # with NO real match keeps exactly one all-null row.
    i_payload = [c for c in intervals.columns if c not in by]
    real = in_bounds & i["__hit"].isNotNull()
    flagged = joined.select(
        *[p[c] for c in points.columns],
        *[F.when(real, i[c]).alias(c) for c in i_payload],
        # unmatched left_outer rows have NULL in_bounds: coalesce to 0 so
        # the per-point max is 0, not NULL
        F.coalesce(real.cast("int"), F.lit(0)).alias("__real"),
    )
    pcols = [F.col(c) for c in points.columns]
    w = Window.partitionBy(*pcols)
    wo = w.orderBy(F.lit(1))
    return (
        flagged.withColumn("__n", F.max("__real").over(w))
        .withColumn("__rn", F.row_number().over(wo))
        .where((F.col("__real") == 1) | ((F.col("__n") == 0) & (F.col("__rn") == 1)))
        .drop("__real", "__n", "__rn")
    )
