"""Declared queries: deduplication suite (SURVEY.md §2.11 X1-X2).

The testdata ``documents`` table contains genuine near-duplicates (pairs
with 3-gram Jaccard ≈ 0.99), so these operators have real signal.
The exact operators are oracle-matched; MinHash-LSH and SimHash use
Spark-native xxhash64 (no DuckDB equivalent) and are rows-only declared,
with their *recall against the exact operator* asserted in
tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from r_e_hive__spark.operators import dedup as D
from r_e_hive__spark.queries import query, retired_query
from r_e_hive__spark.queries._util import T

# DuckDB shingle CTE: distinct word-3-shingles per doc
_DU_SHINGLES = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
        THEN list_transform(generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' '))
        ELSE [array_to_string(t, ' ')] END)) AS shingle
      FROM toks
    ), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
"""


@query(
    "x1_exact_dedup",
    """
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
    ORDER BY doc_id
    """,
    survey_rows=("X1", "J6"),
)
def x1_exact_dedup(spark, sf_dir):
    """Exact dedup with deterministic survivor (min doc_id) per normalized
    text — hash-groupBy, one shuffle; at 100 TB the groupBy key is the
    sha256 fingerprint instead of the full text (fixed-width shuffle)."""
    (documents,) = T(spark, sf_dir, "documents")
    from r_e_hive__spark.functions.text import normalize

    return (
        documents.groupBy(normalize(F.col("text")).alias("_norm"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


@retired_query(
    "x2_ngram_jaccard_topk",
    _DU_SHINGLES
    + """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.id_a, p.id_b, p.n_common, na.n AS n_a, nb.n AS n_b,
           CAST(ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN sizes na ON na.doc_id = p.id_a
    JOIN sizes nb ON nb.doc_id = p.id_b
    WHERE ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) >= 0.5
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 100
    """,
    survey_rows=("X2", "X4"),
    bench=True,
)
def x2_ngram_jaccard_topk(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (J ≥ 0.5), top-100 by similarity:
    shingle-explode → equi-join on shingle → pair aggregation.  The exact
    baseline the probabilistic variants are measured against.  RETIRED
    round 8 second wave (50-cap rotation for x32_fuzzy_join): the SAME
    ngram_jaccard_pairs generator stays driver-pinned end-to-end inside
    x19_dedup_components, X2 keeps four driver pins
    (x19_dedup_components, x22_incremental_neardup, x17_semdedup,
    pipeline_corpus_curation — x2_minhash_lsh_neardup retired in the
    same wave), and this query keeps its oracle in
    test_retired_queries.py plus its bench headline row (bench=True)."""
    (documents,) = T(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(documents, "text", "doc_id", k=3, threshold=0.5)
    return pairs.orderBy(F.desc("jaccard"), "id_a", "id_b").limit(100)


@retired_query(
    "x2_minhash_lsh_neardup",
    _DU_SHINGLES
    + """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.id_a, p.id_b,
           CAST(ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) AS DOUBLE) AS jaccard
    FROM pairs p
    JOIN sizes na ON na.doc_id = p.id_a
    JOIN sizes nb ON nb.doc_id = p.id_b
    WHERE ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) >= 0.5
    ORDER BY jaccard DESC, id_a, id_b
    LIMIT 100
    """,
    survey_rows=("X2",),
    doc="MinHash+banded-LSH candidate pairs verified with exact Jaccard.",
)
def x2_minhash_lsh_neardup(spark, sf_dir):
    """Sub-quadratic near-dup path: 32 minhashes (xxhash64-seeded), 8 bands
    → candidate pairs → exact-Jaccard verification ≥ 0.5.

    The oracle is the *exact* shingle-Jaccard pair join: because verified
    LSH output = {candidate pairs} ∩ {exact pairs ≥ threshold}, equality
    with the exact result is precisely the statement "LSH recall is 1.0 on
    this corpus" — deterministic (fixed xxhash64 seeds, frozen fixture
    data), so it is a genuine differential check, not a snapshot.  Banding
    math: r=4 rows/band × 8 bands ⇒ P(candidate | J≈0.99) ≈ 1−(1−0.99⁴)⁸
    ≈ 1−4·10⁻¹¹; the fixture's true pairs all have J ≥ 0.9.  Estimated-
    signature agreement (est_jaccard, xxhash64-derived, no DuckDB twin)
    stays covered by tests/test_dedup.py.  RETIRED round 8 second wave
    (50-cap rotation for x27_data_card): the SAME minhash→band→verify
    decision pipeline stays driver-pinned — per increment and in its
    persisted banded layout — by x22_incremental_neardup (md5 signature
    mode, full value replay), X2 keeps three other driver pins
    (x19_dedup_components, x17_semdedup, pipeline_corpus_curation), and
    this recall=1.0 oracle keeps running in test_retired_queries.py."""
    (documents,) = T(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(
        documents, "text", "doc_id", k=3, num_hashes=32, bands=8, jaccard_threshold=0.5
    )
    return (
        pairs.select("id_a", "id_b", "jaccard")
        .orderBy(F.desc("jaccard"), "id_a", "id_b")
        .limit(100)
    )


# Golden pin for the SimHash query: SimHash Hamming distance has no
# closed-form relation to any DuckDB-computable similarity (the fingerprint
# is xxhash64-derived), so the oracle is an inline-VALUES literal generated
# ONCE from the frozen sf0.01 fixture (same pattern as the x7 oracle,
# queries/multimodal.py).  Regenerate with:
#   python -c "from r_e_hive__spark.queries import load_all; ...
#              load_all()['x2_simhash_neardup'].spark_fn(spark, sf001).show()"
# after any intentional change to simhash64 / banding.  The differential
# value: pins determinism of the whole path (tokenize → 64 vote aggregates
# → 16-bit banded join → bit_count) against silent drift.
_SIMHASH_GOLDEN = (
    (58, 293, 0), (61, 185, 0), (285, 301, 0), (393, 420, 0),
    (70, 447, 1), (107, 387, 1),
    (8, 245, 2), (76, 102, 2), (98, 290, 2), (267, 413, 2),
    (326, 457, 2), (458, 462, 2),
    (45, 413, 3), (120, 332, 3), (166, 323, 3), (251, 473, 3),
    (435, 486, 3),
)

_SIMHASH_GOLDEN_SQL = (
    "SELECT * FROM (VALUES\n    "
    + ",\n    ".join(
        f"(CAST({a} AS BIGINT), CAST({b} AS BIGINT), CAST({h} AS INT))"
        for a, b, h in _SIMHASH_GOLDEN
    )
    + ") AS t(id_a, id_b, hamming)\nORDER BY hamming, id_a, id_b"
)


@retired_query(
    "x2_simhash_neardup",
    _SIMHASH_GOLDEN_SQL,
    survey_rows=("X2",),
    doc="64-bit SimHash near-dup pairs within Hamming distance 3.",
    golden_sf="/root/testdata/sf0.01",
)
def x2_simhash_neardup(spark, sf_dir):
    """SimHash near-dup: 64-bit token-hash sign fingerprint, 16-bit banded
    candidate join, Hamming ≤ 3.  Oracle = golden VALUES from the frozen
    fixture (see _SIMHASH_GOLDEN above); semantic properties (symmetry,
    banding completeness for Hamming ≤ 3, agreement with near-dup ground
    truth) are asserted in tests/test_dedup.py."""
    (documents,) = T(spark, sf_dir, "documents")
    return (
        D.simhash_neardup_pairs(documents, "text", "doc_id", max_hamming=3)
        .orderBy("hamming", "id_a", "id_b")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# X19 — dedup-group closure (declared round 7; VERDICT r6 item 2)
# ---------------------------------------------------------------------------

# The oracle replays the WHOLE path in SQL: the exact shingle-Jaccard pair
# join (the same CTE chain the x2 queries replay), then the transitive
# closure as a recursive min-label reachability — reach(node, lbl) holds
# every (node, label) where lbl reaches node over the symmetrized edge
# set; MIN(lbl) per node is exactly connected_components' contract
# (component = minimum reachable id).  UNION (not ALL) dedups the
# frontier, so the recursion terminates on the finite pair set.
_DU_COMPONENTS = (
    _DU_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), good AS (
      SELECT p.id_a, p.id_b
      FROM pairs p
      JOIN sizes na ON na.doc_id = p.id_a
      JOIN sizes nb ON nb.doc_id = p.id_b
      WHERE ROUND(CAST(p.n_common AS DOUBLE) / (na.n + nb.n - p.n_common), 6) >= 0.5
    ), sym AS (
      SELECT id_a AS a, id_b AS b FROM good
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM good
    ), vnodes AS (
      SELECT DISTINCT a AS node FROM sym
    ), reach(node, lbl) AS (
      SELECT node, node FROM vnodes
      UNION
      SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node
    )
    SELECT node, MIN(lbl) AS component FROM reach
    GROUP BY node ORDER BY node
    """
)


# ---------------------------------------------------------------------------
# X20 — ExactSubstr span dedup (declared round 8; VERDICT r7 item 3)
# ---------------------------------------------------------------------------

# Spans depend only on window EQUALITY (BASELINE.md: hash choice is free),
# so the oracle needs no hash at all — it groups on the window STRING
# itself.  The Spark side's xxhash64 (or the Arrow pass's rolling
# polynomial) can only diverge from this via a 2⁻⁶⁴-rate collision, the
# same determinism trade every x2 differential already accepts.
_X20_WINDOW = 15
_X20_SPANS = f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ), wins AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - {_X20_WINDOW - 1}),
             i -> struct_pack(pos := i, w := array_to_string(t[i:i+{_X20_WINDOW - 1}], ' ')))) AS s
      FROM toks WHERE len(t) >= {_X20_WINDOW}
    ), w2 AS (
      SELECT doc_id, s.pos AS pos, s.w AS w FROM wins
    ), dup AS (
      SELECT w FROM w2 GROUP BY w HAVING COUNT(*) > 1
    ), dw AS (
      SELECT doc_id, pos FROM w2 WHERE w IN (SELECT w FROM dup)
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                  OR pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {_X20_WINDOW}
                  THEN 1 ELSE 0 END AS gap
      FROM dw
    ), isl2 AS (
      SELECT doc_id, pos,
             SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {_X20_WINDOW - 1} AS BIGINT) AS span_end,
           COUNT(*) AS n_windows
    FROM isl2 GROUP BY doc_id, island
    ORDER BY doc_id, span_start
"""


@query(
    "x20_duplicate_spans",
    _X20_SPANS,
    survey_rows=("X20",),
)
def x20_duplicate_spans(spark, sf_dir):
    """Span-level exact-substring dedup (Lee et al. 2021 ExactSubstr,
    windowed-hash form): maximal token spans whose every 15-token window
    occurs at >1 (doc, position) in the corpus, merged gaps-and-islands
    (operators/dedup.py duplicate_spans — two keyed shuffles, no
    all-pairs).  The oracle replays window extraction, the >1-occurrence
    rule, and the island merge from scratch on the window STRINGS —
    spans are a pure function of window equality, so the engine's
    xxhash64/rolling-hash choice is invisible to the result (the most
    cited pretraining-dedup operator, upgraded from Python-reference
    pytest pin to cross-engine driver differential)."""
    from r_e_hive__spark.operators.dedup import duplicate_spans

    (documents,) = T(spark, sf_dir, "documents")
    spans = duplicate_spans(documents, "text", "doc_id", window=_X20_WINDOW)
    return spans.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        "n_windows",
    ).orderBy("doc_id", "span_start")


# ---------------------------------------------------------------------------
# X22 — incremental cross-snapshot near-dup (declared round 8; VERDICT r7
# item 2)
# ---------------------------------------------------------------------------

# Full value replay of the incremental-dedup DECISION PIPELINE under the
# md5 cross-engine minhash mode (operators/dedup.minhash_signatures
# hash_fn="md5" — md5 hex strings order and compare identically in both
# engines, the X15/X24 anchor trick): per-slot min-md5 signatures →
# 8-band × 4-row banding (band equality on the actual slice values —
# band_hash is an engine-side join key for the same equivalence classes)
# → est_jaccard ≥ 0.5 (slot-match fraction k/32, exact in binary floats)
# → per-batch connected components (recursive-CTE min-label reachability,
# the x19 pattern) with the operator's pinned group semantics: history
# wins, keep-min within pure-new components, no tombstones (dropped docs
# never enter the index, so only survivor-vs-new edges exist in batch 2).
# The multiply-referenced CTEs are MATERIALIZED: DuckDB otherwise
# re-inlines the whole shingle→minhash pipeline per reference and the
# join tree OOMs at sf1 (measured: 89 GB RSS kill vs 29 s materialized).
_X22_INCREMENTAL = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
    ), sh AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
        THEN list_transform(generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' '))
        ELSE [array_to_string(t, ' ')] END)) AS shingle
      FROM toks
    ), seeds AS (
      SELECT unnest(generate_series(0, 31)) AS slot
    ), mh AS MATERIALIZED (
      SELECT s.doc_id, sd.slot,
             MIN(md5(CAST(sd.slot AS VARCHAR) || ':' || s.shingle)) AS h
      FROM sh s CROSS JOIN seeds sd
      GROUP BY s.doc_id, sd.slot
    ), bandkey AS (
      SELECT doc_id, slot // 4 AS band_id,
             string_agg(h, ',' ORDER BY slot) AS band_key
      FROM mh GROUP BY doc_id, slot // 4
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bandkey a JOIN bandkey b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ), good AS MATERIALIZED (
      SELECT c.id_a, c.id_b
      FROM cand c
      JOIN mh x ON x.doc_id = c.id_a
      JOIN mh y ON y.doc_id = c.id_b AND y.slot = x.slot
      GROUP BY c.id_a, c.id_b
      HAVING SUM(CASE WHEN x.h = y.h THEN 1 ELSE 0 END) / 32.0 >= 0.5
    ), b1 AS (
      SELECT doc_id FROM documents WHERE doc_id % 2 = 0
    ), b2 AS (
      SELECT doc_id FROM documents WHERE doc_id % 2 = 1
    ), p1 AS (
      SELECT g.id_a, g.id_b FROM good g
      JOIN b1 x ON x.doc_id = g.id_a
      JOIN b1 y ON y.doc_id = g.id_b
    ), sym1 AS (
      SELECT id_a AS a, id_b AS b FROM p1
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM p1
    ), reach1(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM sym1) v(a)
      UNION
      SELECT s.b, r.lbl FROM reach1 r JOIN sym1 s ON s.a = r.node
    ), comp1 AS (
      SELECT node, MIN(lbl) AS component FROM reach1 GROUP BY node
    ), surv1 AS MATERIALIZED (
      SELECT d.doc_id FROM b1 d
      LEFT JOIN comp1 c ON c.node = d.doc_id
      WHERE c.node IS NULL OR c.component = d.doc_id
    ), p2 AS (
      SELECT g.id_a, g.id_b FROM good g
      WHERE (g.id_a IN (SELECT doc_id FROM b2) OR g.id_a IN (SELECT doc_id FROM surv1))
        AND (g.id_b IN (SELECT doc_id FROM b2) OR g.id_b IN (SELECT doc_id FROM surv1))
        AND NOT (g.id_a IN (SELECT doc_id FROM surv1) AND g.id_b IN (SELECT doc_id FROM surv1))
    ), sym2 AS (
      SELECT id_a AS a, id_b AS b FROM p2
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM p2
    ), reach2(node, lbl) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM sym2) v(a)
      UNION
      SELECT s.b, r.lbl FROM reach2 r JOIN sym2 s ON s.a = r.node
    ), comp2 AS (
      SELECT node, MIN(lbl) AS component FROM reach2 GROUP BY node
    ), histcomp AS (
      SELECT DISTINCT c.component FROM comp2 c JOIN surv1 h ON h.doc_id = c.node
    ), surv2 AS (
      SELECT d.doc_id FROM b2 d
      LEFT JOIN comp2 c ON c.node = d.doc_id
      WHERE c.node IS NULL
         OR (c.component = d.doc_id
             AND c.component NOT IN (SELECT component FROM histcomp))
    )
    SELECT doc_id, 1 AS batch FROM surv1
    UNION ALL
    SELECT doc_id, 2 AS batch FROM surv2
    ORDER BY doc_id
"""


@query(
    "x22_incremental_neardup",
    _X22_INCREMENTAL,
    survey_rows=("X22", "X2", "X19"),
)
def x22_incremental_neardup(spark, sf_dir):
    """Incremental cross-snapshot near-dup: batch 1 (even doc_ids) dedups
    against nothing and seeds the signature index; batch 2 (odd doc_ids)
    probes that index in its persisted BANDED layout (band_signatures —
    the production partition-pruned form, zero per-increment hashing of
    history) with the md5 cross-engine minhash mode.  Output = survivors
    of both batches.  Pins the whole per-increment decision pipeline —
    signatures, banding, est-Jaccard verification, history-wins /
    keep-min / no-tombstone closure (operators/dedup.py
    incremental_neardup docstring) — against a from-scratch DuckDB
    replay.  Scale shape: the increment broadcasts, the index is probed
    map-side; the index store is ~signature bytes/doc, never text."""
    from r_e_hive__spark.operators.dedup import band_signatures, incremental_neardup

    (documents,) = T(spark, sf_dir, "documents")
    docs = documents.select("doc_id", "text")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    s1, idx1 = incremental_neardup(b1, "text", "doc_id", hash_fn="md5")
    banded_idx = band_signatures(idx1, "doc_id", 32, 8)
    s2, _ = incremental_neardup(
        b2, "text", "doc_id", index_sig=banded_idx, hash_fn="md5"
    )
    return (
        s1.select("doc_id", F.lit(1).alias("batch"))
        .unionByName(s2.select("doc_id", F.lit(2).alias("batch")))
        .orderBy("doc_id")
    )


@retired_query(
    "x19_dedup_components",
    _DU_COMPONENTS,
    survey_rows=("X19", "X2"),
)
def x19_dedup_components(spark, sf_dir):
    """Transitive dedup-group closure over the exact near-dup pair set:
    3-gram Jaccard pairs (J ≥ 0.5, the x2_ngram_jaccard_topk generator)
    → connected components (min-label propagation,
    operators/graph.py:263) → (node, component = min reachable doc_id).
    This is the hinge between pairwise detection and survivor selection
    (``node == component`` IS the keep-min survivor rule, transitively
    closed, so chains a~b~c dedup as ONE group regardless of pair
    order).  The oracle recomputes pairs AND closure from scratch —
    recursive-CTE reachability vs the engine's iterative label
    propagation, a genuine cross-paradigm differential (the J8
    discipline).  Scale shape: the pair join is the banded/blocked x2
    machinery; each closure round is one shuffle join + map-side-combined
    min, rounds = dup-cluster diameter (small for dense dup groups)."""
    from r_e_hive__spark.operators.graph import connected_components

    (documents,) = T(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        documents, "text", "doc_id", k=3, threshold=0.5
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.select("node", "component").orderBy("node")


# ---------------------------------------------------------------------------
# X32 — edit-distance fuzzy join (declared round 8 second wave; VERDICT r7
# "What's missing" item 3)
# ---------------------------------------------------------------------------


@query(
    "x32_fuzzy_join",
    """
    SELECT a.p_partkey AS id_l, b.p_partkey AS id_r,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
    FROM part a JOIN part b ON a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    ORDER BY id_l, id_r
    """,
    survey_rows=("X32",),
)
def x32_fuzzy_join(spark, sf_dir):
    """Edit-distance fuzzy self-join (entity resolution): every part-name
    pair within Levenshtein distance 1 — operators/fuzzy.fuzzy_pairs, the
    q-gram count-lemma + rare-token prefix-filter blocking (ED-Join
    family) whose candidate generation is an equi-join on (gram, occ)
    tokens, NEVER a cross join; a length-banded equi-join covers the
    below-gram-floor short strings, and candidates verify with Spark's
    banded early-exit ``levenshtein(l, r, d)``.  The blocking is provably
    lossless, so the DuckDB oracle can be the thing the operator refuses
    to run — the naive all-pairs Levenshtein join — and equality is exact
    (the tests/test_fuzzy.py differential, upgraded to a cross-engine
    driver pin).  Scale shape: the prefix index carries ≤ d·q+1 rare
    tokens per string, so posting lists stay skew-free and the pair space
    is O(candidates), not O(n²)."""
    from r_e_hive__spark.operators.fuzzy import fuzzy_pairs

    (part,) = T(spark, sf_dir, "part")
    return (
        fuzzy_pairs(part, "p_partkey", "p_name", max_dist=1)
        .select("id_l", "id_r", F.col("dist").cast("int").alias("dist"))
        .orderBy("id_l", "id_r")
    )
