"""BPE subword tokenizer: in-engine training + Arrow-batched encoding
(SURVEY.md §2.11 X30).

`functions/text.subword_tokens` stops at the GPT-2-style *pre*-tokenizer
("merges themselves need a vocab, out of scope") — this module closes
that gap with the vocabulary learner and the encoder: byte-pair encoding
(Sennrich et al. 2016; the GPT-2 merge-ranks formulation, Radford et al.
2019).  The token counts an LLM-data pipeline budgets/packs/chunks with
(X9) become *real* tokenizer counts once a merge table exists.

Scale shape — the part that matters at 100 TB:

- **Training never iterates over the corpus.** The ONE corpus-sized pass
  is the pre-token histogram (`piece_histogram`: explode + map-side-
  combined groupBy — shuffle bytes ≈ distinct pieces, Zipf-bounded).
  Merge learning then runs on the histogram only, exactly like
  SentencePiece/HF trainers.  Two strategies, pinned merge-identical:

  - ``"driver"`` — when Catalyst's size estimate says the histogram
    broadcasts (`plan_fits_broadcast`): collect the (piece, count) pairs
    — model-space, not data — and run the classic greedy loop in Python.
    This is what every production BPE trainer does.
  - ``"distributed"`` — the histogram stays a DataFrame of symbol
    arrays; each round counts adjacent pairs (map-side explode of a
    transform/sequence expression), takes the global argmax with a
    deterministic tiebreak, and applies the merge as a pure JVM
    ``aggregate`` fold (greedy left-to-right, same semantics as the
    driver loop).  ``num_merges`` rounds × one histogram-sized shuffle —
    the honest fallback when the piece table itself outgrows memory.

- **Encoding is map-only.** The merge table is parameters (≤ num_merges
  rows); it ships in the `mapInPandas` closure.  Each Arrow batch
  memoizes encodings per distinct piece (Zipf again: the hit rate is the
  point), so per-row cost collapses to a dict lookup for frequent words.

Determinism: merge selection breaks count ties on (left, right)
lexicographic ascending — same data ⇒ same merge list under any
partitioning.  Unicode-char symbols (not bytes): the cross-engine-
friendly variant; a byte-level alphabet is a drop-in symbol-init swap.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from r_e_hive__spark.functions.text import subword_tokens
from r_e_hive__spark.operators import plan_fits_broadcast


def piece_histogram(df: DataFrame, text_col: str) -> DataFrame:
    """(piece, cnt) — the pre-token frequency table; the single
    corpus-sized pass of BPE training."""
    return (
        df.select(F.explode(subword_tokens(F.col(text_col))).alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").alias("cnt"))
    )


# ------------------------------------------------------------ driver trainer


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Apply one merge rule greedily left-to-right (aab + (a,a) -> [aa, b];
    aaa + (a,a) -> [aa, a] — a merged symbol never re-merges in the same
    pass).  Same semantics as the distributed fold and the encoder."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _train_driver(
    hist: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    words: dict[tuple[str, ...], int] = {}
    for piece, cnt in hist:
        k = tuple(piece)
        words[k] = words.get(k, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, cnt in words.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = _remerge(words, best)
    return merges


def _remerge(
    words: dict[tuple[str, ...], int], best: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    out: dict[tuple[str, ...], int] = {}
    for w, c in words.items():
        m = _merge_word(w, best)
        out[m] = out.get(m, 0) + c
    return out


# ------------------------------------------------------- distributed trainer


def _adjacent_pairs(syms):
    """array<struct<l,r>> of adjacent symbol pairs (map-side expression)."""
    idx = F.sequence(F.lit(1), F.size(syms) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(syms, i.cast("int")).alias("l"),
            F.element_at(syms, (i + 1).cast("int")).alias("r"),
        ),
    )
    return F.when(F.size(syms) > 1, pairs).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )


def _fold_merge(syms, left: str, right: str):
    """The JVM twin of `_merge_word`: one aggregate fold, greedy
    left-to-right, merged symbols never re-merge within the pass."""
    a, b, ab = F.lit(left), F.lit(right), F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == b)
            # a freshly-merged trailing `ab` must not act as a bare `a`
            # for an overlapping triple: the fold emits ab as ONE symbol,
            # so element_at(acc,-1) == a is only true for an unmerged a
            ,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _train_distributed(hist: DataFrame, num_merges: int) -> list[tuple[str, str]]:
    # split("") emits CODE POINTS on this JVM (a surrogate pair stays one
    # symbol — pinned by tests/test_bpe.py non-BMP differential), matching
    # the driver trainer's tuple(piece); UTF8 byte order == code-point
    # order keeps the tie-breaks aligned too.  Zero-width-match semantics
    # vary across Java versions on the edges — drop empty artifacts
    # defensively.
    words = hist.select(
        F.filter(
            F.split(F.col("piece"), ""), lambda s: s != ""
        ).alias("syms"),
        F.col("cnt"),
    )
    # localCheckpoint per round caps the re-applied-fold lineage (the J8
    # doubling discipline) — round k would otherwise replay k-1 folds.
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = (
            words.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt"
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((left, right))
        words = words.select(
            _fold_merge(F.col("syms"), left, right).alias("syms"), "cnt"
        ).localCheckpoint(eager=True)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int = 200,
    strategy: str = "auto",
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a corpus.  ``strategy``:
    ``"driver"`` (collect the histogram — the production shape),
    ``"distributed"`` (histogram stays distributed), or ``"auto"``
    (driver iff the histogram passes the broadcast gate)."""
    if num_merges < 0:
        raise ValueError(f"num_merges must be >= 0, got {num_merges}")
    hist = piece_histogram(df, text_col)
    if strategy == "auto":
        strategy = "driver" if plan_fits_broadcast(hist) else "distributed"
    if strategy == "driver":
        rows = hist.collect()
        return _train_driver([(r["piece"], r["cnt"]) for r in rows], num_merges)
    if strategy == "distributed":
        return _train_distributed(hist, num_merges)
    raise ValueError(f"unknown strategy {strategy!r}")


# ------------------------------------------------------------------ encoder


def encode_piece(
    piece: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Encode one pre-token by replaying merges in rank order (the GPT-2
    ``bpe()`` construction): repeatedly find the lowest-rank adjacent
    pair and merge ALL its occurrences left-to-right."""
    word: Sequence[str] = tuple(piece)
    while len(word) > 1:
        ranked = [
            (ranks.get((word[i], word[i + 1])), i)
            for i in range(len(word) - 1)
        ]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        best_rank = min(r for r, _ in ranked)
        i = min(i for r, i in ranked if r == best_rank)
        pair = (word[i], word[i + 1])
        word = _merge_word(word, pair)
    return list(word)


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col: array<string>`` — the BPE token sequence of
    ``text_col`` under ``merges``.  Map-only `mapInPandas` (Arrow
    batches); the merge table rides the closure (parameters), and a
    per-batch memo collapses repeated pieces to a dict hit.  NULL text →
    NULL tokens.  Concatenating the tokens reproduces the pre-token
    stream exactly (losslessness is pinned in tests)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    import re as _re

    from r_e_hive__spark.functions.text import SUBWORD_RE

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out_schema = StructType(
        [*df.schema.fields, StructField(out_col, ArrayType(StringType()))]
    )
    pat = _re.compile(SUBWORD_RE)
    cols = df.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def enc(text):
            if text is None:
                return None
            toks: list[str] = []
            for piece in pat.findall(text):
                got = memo.get(piece)
                if got is None:
                    got = encode_piece(piece, ranks)
                    memo[piece] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[text_col].map(enc)
            yield pdf[cols + [out_col]]

    return df.mapInPandas(run, schema=out_schema)


def save_bpe(spark, merges: Sequence[tuple[str, str]], path: str) -> None:
    """Persist the ordered merge list as ONE parquet table (rank, left,
    right) — the amortization layout every other trained model here uses
    (save_ngram_lm, band_signatures, save_ivf_index): train once on the
    corpus, encode every later increment from the stored model.  Rank
    carries the merge ORDER, which is the whole model."""
    spark.createDataFrame(
        [(i, left, right) for i, (left, right) in enumerate(merges)],
        "rank INT, left STRING, right STRING",
    ).write.mode("overwrite").parquet(path)


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Inverse of save_bpe: the ordered merge list, rank-sorted."""
    return [
        (r["left"], r["right"])
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]
