"""Edit-distance similarity join (fuzzy entity matching) — X32.

The curation problem: near-identical *short strings* — author names,
titles, URLs after normalization, product names — are the entity-
resolution face of dedup.  X2's shingle Jaccard targets documents;
for strings of tens of characters the right metric is Levenshtein
distance, and the naive form is an O(n²) cross join.

Construction (the ED-Join / q-gram filtering family, Gravano et al.
2001, Xiao et al. 2008), exact — no candidate the metric accepts is
ever lost, which the DuckDB oracle verifies pair-for-pair:

1. **q-gram count lemma**: ed(s,t) ≤ d ⇒ the gram *bags* share ≥
   max(|Gs|,|Gt|) − d·q grams (an edit rewrites ≤ q overlapping gram
   values; bag semantics are shift-immune, unlike positional grams).
   Bags become sets by numbering occurrences: token = (gram, occ).
2. **Prefix filter**: order all tokens by global rarity; if two token
   sets overlap ≥ T, their (n−T+1)-smallest prefixes intersect.  With
   T = max(n_s,n_t) − d·q ≥ n_side − d·q, indexing each string's
   min(n, d·q+1) rarest tokens suffices — posting lists are built from
   *rare* tokens, so the hot-gram skew of a full inverted index never
   materializes.
3. Pairs where BOTH sides have ≤ d·q grams (len ≤ q−1+d·q) fall outside
   the lemma: they meet in a length-banded equi-join instead (each side
   is at most q·(d+1)−1 chars, and |len(s)−len(t)| ≤ d is necessary) —
   an explode of 2d+1 target lengths, never a nested-loop join.
4. Candidates verify with ``levenshtein(l, r, threshold=d)`` — Spark's
   banded O(len·d) early-exit form, not the full matrix.

At 100 TB: the index carries ≤ d·q+1 tokens per string, candidate
generation is an equi-join on rare tokens, and verification touches
candidates only.  Degenerate corpora (millions of copies of one string)
make the true output itself quadratic — that is X1's job to remove
first; documented, not defended against.

Output pairs (id_l < id_r, dist) feed ``operators.graph.
connected_components`` / ``operators.dedup.dedup_survivors`` exactly
like X2/X4/X17 pair emitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int,
    *,
    q: int = 3,
) -> DataFrame:
    """All unordered pairs with ``levenshtein(text_l, text_r) <= max_dist``.

    Returns ``(id_l, id_r, dist)`` with ``id_l < id_r``, exactly — the
    blocking is lossless by the lemmas above.  NULL texts never match
    (SQL equality discipline: a NULL name is absent evidence, not a
    wildcard).  ``max_dist == 0`` is exact dedup — use X1
    (``operators.dedup.exact_dedup``), which needs no verify pass.
    """
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1; exact matching is X1 exact_dedup")
    if q < 2:
        raise ValueError("q must be >= 2 (q=1 makes every string share tokens)")
    d, dq = max_dist, max_dist * q

    base = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt"))
        .where(F.col("txt").isNotNull())
        .withColumn("len", F.length("txt"))
        .withColumn("n", F.greatest(F.lit(0), F.col("len") - F.lit(q - 1)))
    )

    # ---- path A: prefix-token candidates (covers every pair whose longer
    # side has > d*q grams; T >= 1 there) -------------------------------
    grams = F.expr(
        f"transform(sequence(1, len - {q - 1}), i -> substring(txt, i, {q}))"
    )
    toks = (
        base.where(F.col("n") >= 1)
        .select("id", "n", F.posexplode(grams).alias("pos", "gram"))
        # k-th occurrence of a gram value within the string: (gram, occ)
        # tokens turn the bag lemma into a set lemma
        .withColumn(
            "occ", F.row_number().over(Window.partitionBy("id", "gram").orderBy("pos"))
        )
    )
    # global rarity per token (window count: same shuffle as a groupBy,
    # no join back)
    toks = toks.withColumn(
        "freq", F.count(F.lit(1)).over(Window.partitionBy("gram", "occ"))
    )
    prefix = toks.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("id").orderBy("freq", "gram", "occ")
        ),
    ).where(F.col("rk") <= F.least(F.col("n"), F.lit(dq + 1)))

    pl = prefix.select(F.col("id").alias("id_l"), "gram", "occ")
    pr = prefix.select(F.col("id").alias("id_r"), "gram", "occ")
    cand_a = (
        pl.join(pr, ["gram", "occ"])
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
    )

    # ---- path B: both sides short (n <= d*q): length-banded all-pairs --
    shorts = base.where(F.col("n") <= dq).select("id", "len")
    probe = shorts.select(
        F.col("id").alias("id_l"),
        F.explode(F.sequence(F.col("len") - d, F.col("len") + d)).alias("tlen"),
    )
    cand_b = (
        probe.join(
            shorts.select(F.col("id").alias("id_r"), F.col("len").alias("tlen")),
            "tlen",
        )
        .where(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r")
    )

    cands = cand_a.unionByName(cand_b).dropDuplicates(["id_l", "id_r"])

    # ---- verify: banded early-exit Levenshtein on candidates only ------
    tl = base.select(F.col("id").alias("id_l"), F.col("txt").alias("_tl"))
    tr = base.select(F.col("id").alias("id_r"), F.col("txt").alias("_tr"))
    return (
        cands.join(tl, "id_l")
        .join(tr, "id_r")
        # length filter before the edit distance: necessary condition,
        # prunes most length-banded false candidates for free
        .where(F.abs(F.length("_tl") - F.length("_tr")) <= d)
        .withColumn("dist", F.levenshtein("_tl", "_tr", d))
        .where(F.col("dist") >= 0)  # threshold form returns -1 past d
        .select("id_l", "id_r", "dist")
    )
