"""Byte-pair-encoding merge training as one lazy Spark DAG.

The classic BPE trainer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") operates on the corpus
word-frequency table: repeatedly count adjacent symbol pairs weighted
by word frequency, merge the most frequent pair everywhere, repeat.
Reference parity: the reference pipelines tokenize with externally
trained vocabularies; this operator closes the loop so the vocabulary
itself is trained *inside* the engine at corpus scale.

Scale split (the part that matters at 100 TB):

- **Word counting is the distributed pass** — one `split`/`explode`/
  `groupBy` over the full corpus, map-side partial aggregation, shuffle
  carries one row per DISTINCT word (vocab-sized, ~10^5-10^6 rows even
  for web-scale corpora — Heaps' law, not corpus-sized).
- **The merge loop runs on the vocab-sized table.** Each step is a
  pair-count aggregate + a 1-row argmax broadcast back into a fold
  expression — no driver-side loop over data, no collect of anything
  bigger than the single winning pair, and the whole k-step train is
  ONE action (each intermediate word table is persist-tracked so the
  chain evaluates once, not 2^k times).

Determinism (the oracle contract): pair counts are exact bigint sums;
the argmax tie-breaks (count DESC, pair_a ASC, pair_b ASC) via a
struct-min; the merge itself is a left-to-right non-overlapping fold —
`aggregate` in Spark, `list_reduce` in DuckDB — with an identical
step order, so the k-row merge table hash-matches across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from meerpipe_spark.cacheutil import persist_tracked

_EMPTY_SYMS = "CAST(array() AS ARRAY<STRING>)"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distributed word-frequency table: (word, cnt bigint, syms).

    The only corpus-sized pass in BPE training; everything after runs
    on this vocab-sized output."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("syms", F.split("word", ""))
    )


def _merge_fold(pa: Column, pb: Column) -> Column:
    """Left-to-right non-overlapping merge of pair (pa, pb) in `syms`."""
    return F.aggregate(
        F.col("syms"),
        F.expr(_EMPTY_SYMS),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == pa) & (s == pb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(pa, pb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _best_pair(words: DataFrame) -> DataFrame:
    """1-row frame (pair_a, pair_b, pair_count): the most frequent
    adjacent symbol pair, ties broken lexicographically."""
    pairs = (
        words.filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("a"),
                        F.element_at(F.col("syms"), i + 1).alias("b"),
                    ),
                )
            ).alias("pr"),
        )
        .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
        .agg(F.sum("cnt").alias("pc"))
    )
    # struct-min over (-count, a, b): max count, then lowest (a, b)
    best = pairs.agg(
        F.min(F.struct((-F.col("pc")).alias("neg"), "a", "b")).alias("w")
    )
    return best.select(
        F.col("w.a").alias("pair_a"),
        F.col("w.b").alias("pair_b"),
        (-F.col("w.neg")).alias("pair_count"),
    )


def bpe_train(docs: DataFrame, steps: int = 8, text_col: str = "text") -> DataFrame:
    """Train `steps` BPE merges; returns (step, pair_a, pair_b,
    pair_count) — the ordered merge table that IS the tokenizer.

    One action per merge step (the Lloyd's-iteration pattern,
    similarity.py::pq_train): each step aggregates the persist-tracked
    vocab-sized word table and collects exactly ONE row (the winning
    pair), which re-enters the next step's fold as literals — plan
    growth stays linear in k (a fully lazy chain doubles the plan per
    step: the argmax subtree appears on both sides of the join) and
    nothing bigger than the winner ever reaches the driver."""
    # r13: pin the cached vocab table at defaultParallelism partitions
    # (explicit fixed-N repartition — AQE's byte-based coalescing would
    # otherwise cache the tiny-but-CPU-dense table on ONE partition and
    # serialize every merge step's interpreted fold + pair count).
    # Vocabulary-sized at any corpus, and the winner argmax is a
    # struct-min over exact counts, so partitioning cannot change it.
    par = docs.sparkSession.sparkContext.defaultParallelism
    words = persist_tracked(word_counts(docs, text_col).repartition(par))
    rows: list[tuple[int, str, str, int]] = []
    for step in range(1, steps + 1):
        got = _best_pair(words).collect()
        if not got or got[0]["pair_a"] is None:
            break
        pa, pb = got[0]["pair_a"], got[0]["pair_b"]
        rows.append((step, pa, pb, int(got[0]["pair_count"])))
        if step < steps:
            words = persist_tracked(
                words.select(
                    "word",
                    "cnt",
                    _merge_fold(F.lit(pa), F.lit(pb)).alias("syms"),
                )
            )
    return docs.sparkSession.createDataFrame(
        rows, "step INT, pair_a STRING, pair_b STRING, pair_count BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to a corpus: per doc, per word, replay
    the merges in training order. Pure map (zero shuffle) — the merge
    table rides into the plan as fold literals, the 100 TB corpus is
    touched once."""
    word = F.explode(F.split(F.col(text_col), " ")).alias("word")
    enc = docs.select(id_col, word).filter(F.col("word") != "")
    syms = F.split("word", "")

    def _fold(arr: Column, pa: str, pb: str) -> Column:
        return F.aggregate(
            arr,
            F.expr(_EMPTY_SYMS),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(pa))
                & (s == F.lit(pb)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(pa + pb)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    for pa, pb in merges:
        syms = _fold(syms, pa, pb)
    return enc.select(id_col, "word", syms.alias("tokens"))
