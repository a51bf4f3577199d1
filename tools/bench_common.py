"""Shared bench methodology for bench.py and tools/baseline_duckdb.py.

Both harnesses MUST stay identical in geomean formula, clamp, rep policy,
and sf parsing for the BASELINE.md cross-engine comparisons to be valid —
one implementation, two callers (round-4 code review)."""

from __future__ import annotations

import math
import os


# LLM-pipeline operator headline set (round 7, VERDICT r6 item 4): the
# second recorded geomean, tracking the operators a training-data pipeline
# user actually runs — retrieval ranking, semantic dedup, quantized ANN,
# and chunking — so a regression in e.g. the BLAS top-k moves a tracked
# number.  Both bench.py and baseline_duckdb.py time THIS list; the
# relational headline set (bench=True) stays untouched for cross-round
# comparability.
LLM_BENCH = (
    "x23_bm25_topk",
    "x17_semdedup",
    "x25_quantized_topk",
    "x9_chunk_documents",
)

# Fast-path twins (r_e_hive__spark/queries/fastpaths.py): the production
# strategy="auto" form of the exact-decimal declared instrument rows.
# Value maps each twin to the declared query whose DuckDB oracle times the
# same TASK — baseline_duckdb.py records the pair under the twin's name so
# the Spark/DuckDB JSONs align by key.
LLM_FAST = {
    "x17_semdedup_fast": "x17_semdedup",
    "x25_quantized_topk_fast": "x25_quantized_topk",
    "x23_bm25_topk_fast": "x23_bm25_topk",
}

# Fast twins whose DuckDB pairing is SYMMETRIC: both engines search a
# prebuilt index, so the timed work matches (x23 since round 8; round 11
# closes the residual asymmetry — the DuckDB prep now COPYs its postings
# to an ON-DISK parquet artifact and the timed tail reads only that, so
# neither side gets a warm in-memory rescan; value alignment pinned in
# tests/test_ranking.py::test_x23_fast_duckdb_disk_pairing_value_aligned).
# The remaining twins (x17/x25) run the identical end-to-end task on both
# sides — arithmetic mode is the only delta — but the Spark side is the
# production float path while the oracle is the exact-decimal replay, so
# consumers may still want to flag them.  Shipped in both JSONs so a
# ratio reader can distinguish the two classes without this file.
LLM_FAST_SYMMETRIC = ("x23_bm25_topk_fast",)

# Spark-only bench rows (round 9, VERDICT r8 item 4): timed and recorded
# by bench.py but EXCLUDED from its llm geomean and absent from
# baseline_duckdb.py — they have no honest DuckDB pairing (the scaled-k
# semdedup would need a thousand-centroid literal replay).  Kept out of
# the geomean so the cross-engine/cross-round series stays comparable;
# readers get the raw per-query number under "llm_queries" plus this
# list under "llm_spark_only".
LLM_SPARK_ONLY = ("x17_semdedup_scaled",)

# Per-query scale cap for the bench harnesses (round-8, VERDICT r7 item 7).
# x17_semdedup is the exact-decimal *instrument* row: correct by contract
# but interpreted-arithmetic, ~290 s/rep at sf1 (220× its own production
# twin) — at sf≥1 it dominates an llm sweep without measuring anything the
# sf0.1 number doesn't.  Cap it: when the sweep's sf exceeds the cap, BOTH
# harnesses time the query at the capped scale instead and record the pin
# in the JSON's "pinned_sf" map so a reader never mistakes it for an
# at-scale number.  The production path (x17_semdedup_fast) stays uncapped
# and carries the sf≥1 signal.  The correctness gate (sf0.01) is untouched.
LLM_BENCH_SF_CAP = {"x17_semdedup": 0.1}


def capped_sf_dir(sf_dir: str, cap: float) -> str | None:
    """Directory to time a capped query at, or None when no cap applies.

    Prefers the sibling ``sf{cap}`` of the sweep dir (same generator
    lineage), falling back to the driver's /root/testdata tree."""
    sf = parse_sf(sf_dir)
    if not isinstance(sf, float) or sf <= cap:
        return None
    sib = os.path.join(os.path.dirname(sf_dir.rstrip("/")), f"sf{cap}")
    if os.path.isdir(sib):
        return sib
    fallback = f"/root/testdata/sf{cap}"
    return fallback if os.path.isdir(fallback) else None


def bench_only() -> set[str] | None:
    """Optional query-name filter (SPARK_GRAFT_BENCH_ONLY=a,b) applied by
    both harnesses AFTER set selection — a plain intersection, so a name
    matching nothing times nothing (the isolate driver uses that to run a
    calibration-only child).  None = no filter."""
    raw = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if raw is None:
        return None
    return {n.strip() for n in raw.split(",") if n.strip()}


def bench_set_flags() -> tuple[bool, bool]:
    """(time_relational, time_llm) from SPARK_GRAFT_BENCH_SETS — the ONE
    implementation both harnesses consult (the geomean/clamp rule above
    applies to set selection too: a typo that silently times nothing and
    records 0.0 is worse than an error)."""
    sets = os.environ.get("SPARK_GRAFT_BENCH_SETS", "all")
    if sets not in ("all", "relational", "llm"):
        raise ValueError(
            f"SPARK_GRAFT_BENCH_SETS must be all|relational|llm, got {sets!r}"
        )
    return sets != "llm", sets != "relational"


def bench_reps(default: int = 5) -> int:
    return int(os.environ.get("SPARK_GRAFT_BENCH_REPS", str(default)))


def geomean(timings: dict[str, float]) -> float:
    """Geometric mean with a 0.1 ms floor (a 0s timing would zero the
    product); 0.0 for an empty set instead of ZeroDivisionError."""
    if not timings:
        return 0.0
    return math.exp(
        sum(math.log(max(t, 1e-4)) for t in timings.values()) / len(timings)
    )


def geomean_or_null(timings: dict | None, enabled: bool):
    """The headline-number rule, ONE implementation for both harnesses
    (the module contract above): null for a skipped set AND for an
    enabled set that timed nothing (a name filter matching nothing, or
    every isolate child failing) — never a real-looking 0.0.  None
    entries (failed isolate children) are excluded; the 'failed' JSON
    key names them so a paired reading can exclude the same queries."""
    if not enabled:
        return None
    timed = {k: v for k, v in (timings or {}).items() if v is not None}
    return round(geomean(timed), 4) if timed else None


def parse_sf(sf_dir: str):
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return float(sf) if sf.replace(".", "").isdigit() else sf
