"""Distributed suffix-array construction by prefix doubling
(Manber & Myers 1990/1993), word-level, on Spark DataFrames.

The suffix array is the index structure behind exact substring
dedup/search at corpus scale (the "find every repeated passage"
primitive). The sequential construction sorts suffix strings directly —
O(n log n) comparisons of O(n) strings, and unshardable. Prefix
doubling turns it into ⌈log₂ L⌉ RELATIONAL rounds, each built from
balanced shuffles only:

    round 0:  rank word at each position (dense rank of the vocabulary)
    round k:  rank_2k(pos) = dense rank of (rank_k(pos), rank_k(pos+k))
              with -1 when pos+k runs off the document

After the last round every suffix's rank equals its dense rank in the
lexicographic order of full suffixes — ties (identical suffixes in
different documents) share a rank, which is exactly what dense_rank
over the suffix strings gives, so the whole construction is
oracle-checkable against a direct ORDER BY in DuckDB.

Scale shape: each round is one self-equi-join on (doc, pos) plus one
dense-rank assignment over the DISTINCT pair table — all hash/range
exchanges on uniform keys, no single-partition stage anywhere (the
dense rank rides operators/ids.assign_dense_ids' range-exchange
pattern, with its sampled boundaries pinned by persist). Rounds are
logarithmic in document length, independent of corpus size.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from meerpipe_spark.operators.ids import assign_dense_ranks

#: serialized storage for token-position-sized lineage truncation
#: (see operators/graph.py::ckpt_ser)
_CKPT_SER = StorageLevel.MEMORY_AND_DISK


def suffix_array_ranks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, suffix_rank): the 0-based dense lexicographic rank of
    the word-level suffix starting at ``pos`` in each document, over
    ALL documents' suffixes jointly.

    The doubling loop is unrolled to ⌈log₂ max-doc-words⌉ rounds (the
    max is one scalar aggregate — the only driver-side value). Each
    round's frame is ``localCheckpoint``-ed (the graph-operator
    cadence): the next round consumes it twice (once as itself, once
    shifted by k) and the round-over-round lineage would otherwise
    both recompute exponentially AND grow a plan tree whose mere
    STRINGIFICATION overflows the heap by round ~6 (observed: the
    AQE plan-change logger OOMs before any task runs). Checkpoint
    blocks are released by the harnesses' ``release_checkpoints``.
    """
    words = F.split(F.col(text_col), " ")
    base = docs.select(F.col(id_col), F.posexplode(words).alias("pos", "w"))
    agg = docs.agg(
        F.max(F.size(words)).alias("maxlen"),
        F.sum(F.size(words)).cast("bigint").alias("n_suffixes"),
    ).first()
    maxlen, n_suffixes = agg[0] or 0, agg[1] or 0

    cur = (
        assign_dense_ranks(base, ["w"], "r")
        .select(id_col, "pos", "r")
        .localCheckpoint(True, _CKPT_SER)
    )
    k = 1
    prev_classes = -1
    while k < maxlen:
        # standard early exit (Manber-Myers): all ranks unique → later
        # rounds are identity; real corpora resolve in far fewer than
        # log2(maxlen) rounds. A STALLED class count is also converged
        # (if no pair separated this round, rank_k(pos) determines
        # rank_k(pos+k) for every pos, hence the whole suffix — the
        # remaining ties are identical suffixes, which dense ranks keep
        # tied by design). One scalar count per round, on the
        # checkpointed (already materialized) frame.
        classes = cur.agg(F.countDistinct("r")).first()[0]
        if classes == n_suffixes or classes == prev_classes:
            break
        prev_classes = classes
        shifted = cur.select(
            F.col(id_col), (F.col("pos") - k).alias("pos"), F.col("r").alias("r2")
        )
        paired = (
            cur.join(shifted, [id_col, "pos"], "left")
            .select(
                id_col,
                "pos",
                "r",
                F.coalesce("r2", F.lit(-1)).alias("r2"),
            )
        )
        cur = (
            assign_dense_ranks(paired, ["r", "r2"], "rn")
            .select(id_col, "pos", F.col("rn").alias("r"))
            .localCheckpoint(True, _CKPT_SER)
        )
        k *= 2
    return cur.select(id_col, "pos", F.col("r").cast("bigint").alias("suffix_rank"))


def repeated_passages(
    docs: DataFrame,
    min_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every maximal repeated word sequence of ≥ ``min_words`` words, as
    (suffix_rank, lcp, passage): the LCP of each pair of RANK-ADJACENT
    distinct suffixes in the suffix array — the classic use of the
    structure (a passage repeats somewhere in the corpus iff it is a
    common prefix of two suffixes that sort next to each other).

    The LCP is computed with the monotone-prefix trick shared with the
    SQL oracle: Σ_i [prefix_i(a) = prefix_i(b)] — prefix equality is
    monotone in i, so the sum of indicators IS the longest common
    prefix length, with identical expression shape on both engines.
    Rank-adjacency is an equi-join on rank+1 (no window); the
    representative suffix per rank is min_by (all suffixes of a rank
    are identical word sequences, so any representative is exact).
    """
    words = F.split(F.col(text_col), " ")
    sfx = docs.select(
        F.col(id_col),
        F.posexplode(words).alias("pos", "_w"),
    ).drop("_w")
    arrs = docs.select(
        F.col(id_col),
        words.alias("ws"),
    )
    suf = sfx.join(arrs, id_col).select(
        id_col,
        "pos",
        F.slice(F.col("ws"), F.col("pos") + 1, F.size("ws") - F.col("pos")).alias("suf"),
    )
    ranks = suffix_array_ranks(docs, text_col, id_col)
    rep = (
        ranks.join(suf, [id_col, "pos"])
        .groupBy("suffix_rank")
        .agg(F.min_by("suf", F.struct(id_col, "pos")).alias("suf"))
    )
    a = rep.alias("a")
    b = rep.select(
        (F.col("suffix_rank") - 1).alias("suffix_rank"),
        F.col("suf").alias("suf_b"),
    ).alias("b")
    adj = a.join(b, "suffix_rank")
    n = F.least(F.size("suf"), F.size("suf_b"))
    lcp = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(F.slice("suf", F.lit(1), i) == F.slice("suf_b", F.lit(1), i), 1).otherwise(0),
    )
    return (
        adj.select(
            F.col("suffix_rank").cast("bigint").alias("rank"),
            lcp.cast("bigint").alias("lcp"),
            "suf",
        )
        .filter(F.col("lcp") >= min_words)
        .select(
            "rank",
            "lcp",
            F.array_join(F.slice("suf", 1, F.col("lcp")), " ").alias("passage"),
        )
    )
