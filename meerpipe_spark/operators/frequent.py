"""Exact distributed frequent-items (heavy hitters) via Misra–Gries
candidate generation + one exact verification pass.

The 100 TB frequent-items problem: find every token whose corpus
frequency exceeds support 1/k. The naive plan shuffles the FULL
vocabulary (``explode → groupBy(token).count``) — at web scale that is
billions of distinct shingles/n-grams through one exchange. The
classic two-pass answer (Misra & Gries 1982; the distributed-union
form in Berinde et al. 2010) keeps the shuffle bounded by
``partitions × k`` instead:

Pass 1 (map-only, bounded memory): each partition maintains a k-counter
Misra–Gries summary across its Arrow batches (``mapInPandas`` with an
iterator-scoped dict; the trim runs after each merged batch, so live
counters peak at k + distinct(batch) — bounded by the Arrow batch size,
not the vocabulary — and return to ≤ k at every batch boundary).
Per-partition
guarantee: every item with local count > n_p/(k+1) survives. Emitted
rows per partition: ≤ k candidates + 1 sentinel carrying the partition
token count, so the pass-1 output is O(p·k) rows TOTAL regardless of
vocabulary size.

Union guarantee (pigeonhole): if a token's GLOBAL count exceeds
N/(k+1) ≥ N/k, at least one partition kept it — so the union of the
per-partition summaries is a provably complete candidate set for the
support-N/k query, for ANY distribution, partitioning, or batch size.

Pass 2 (exact): broadcast the candidate set (≤ p·k rows) as a semi-join
filter onto the token stream and hash-aggregate EXACT counts of the
candidates only, then keep ``cnt · k > N`` (pure-bigint comparison — no
fractional threshold to disagree about across engines). The result is
the exact answer to "all items with frequency > N/k", independent of
every Misra–Gries internal: summaries only ever OVER-approximate the
answer set, and the verification pass replaces their lossy counts with
exact ones.

This is the same sketch→exact-recheck discipline as the MinHash→Jaccard
and SimHash→Hamming lanes (`operators/dedup.py`): the approximate
structure bounds the work, the final answer is exact.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def _mg_partition(batches: Iterator[pd.DataFrame], k: int) -> Iterator[pd.DataFrame]:
    """Misra–Gries over one partition's Arrow batches: merge each
    batch's value_counts into the counter dict, and whenever more than
    ``k`` counters are live, subtract the (k+1)-th largest value from
    all and drop the non-positive ones (the batched decrement — each
    unit of decrement hits ≥ k+1 counters at once, so cumulative
    decrement ≤ n_p/(k+1), which is the survival guarantee).

    Memory bound: the dict is trimmed back to ≤ k entries after each
    merged batch, but DURING a merge it holds up to k + distinct(batch)
    entries — bounded by the Arrow batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch, default 10k), not by
    the vocabulary. The vectorized whole-batch merge is the point: a
    strict-k incremental trim would decrement per row in Python."""
    counters: dict[str, int] = {}
    n_part = 0
    for pdf in batches:
        col = pdf.iloc[:, 0].dropna()
        n_part += len(col)
        for token, c in col.value_counts().items():
            counters[token] = counters.get(token, 0) + int(c)
        if len(counters) > k:
            cut = sorted(counters.values(), reverse=True)[k]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    out = pd.DataFrame(
        {
            "token": list(counters.keys()) + [None],
            "lb": list(counters.values()) + [n_part],
        }
    )
    yield out.astype({"lb": "int64"})


def mg_summaries(tokens: DataFrame, k: int = 64, token_col: str = "token") -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries (≤ k candidate rows
    + 1 sentinel row per partition; sentinel has token NULL and ``lb``
    = the partition's token count)."""
    src = tokens.select(F.col(token_col).cast("string").alias("token"))
    return src.mapInPandas(
        lambda it: _mg_partition(it, k), schema="token string, lb long"
    )


def heavy_hitters(
    tokens: DataFrame, k: int = 64, token_col: str = "token"
) -> DataFrame:
    """EXACT support-1/k frequent items: every token with global count
    c satisfying ``c · k > N`` (N = total tokens), with its exact count
    and share. Two scans of ``tokens``, zero vocabulary-sized shuffles:
    the only exchange carries the ≤ p·k candidate keys.

    Persist ``tokens`` upstream if the scan is expensive — the operator
    deliberately does not cache (at 100 TB you re-scan; the shuffle,
    not the scan, is what this plan removes).
    """
    src = tokens.select(F.col(token_col).cast("string").alias("token"))
    summaries = mg_summaries(src, k=k)
    candidates = summaries.filter(F.col("token").isNotNull()).select("token").distinct()
    totals = summaries.filter(F.col("token").isNull()).agg(
        F.coalesce(F.sum("lb"), F.lit(0)).cast("bigint").alias("n_tokens")
    )
    exact = (
        src.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .filter(F.col("cnt") * F.lit(k) > F.col("n_tokens"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n_tokens"), 6).alias("share"),
            "n_tokens",
        )
        .orderBy(F.desc("cnt"), "token")
    )


def mg_merge(summaries: DataFrame, k: int = 64) -> DataFrame:
    """Merge Misra–Gries summaries (Berinde et al. 2010 / Agarwal et
    al. "Mergeable Summaries" 2012): sum per-token lower bounds, then
    apply one batched decrement — subtract the (k+1)-th largest total
    from every counter and drop the non-positive — yielding a VALID
    k-counter MG summary of the UNION stream. The error the merge adds
    is ≤ the subtracted cut, so the standard bound
    ``true − N/(k+1) ≤ lb ≤ true`` survives arbitrarily many merges:
    the streaming heavy-hitters state is a bounded table, never a
    vocabulary.

    Input rows: (token, lb) candidates plus NULL-token sentinels
    carrying stream-segment totals (the ``mg_summaries`` shape). The
    output keeps one merged sentinel so merges COMPOSE: the result is
    itself a valid ``mg_merge`` input. Relational throughout: one
    ≤(p·k)-row groupBy, the cut via a k+1 TakeOrdered (driver-side
    scalar — dimension-sized), no window.
    """
    totals = (
        summaries.filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.sum("lb").cast("bigint").alias("lb"))
    )
    top = [
        r.lb
        for r in totals.orderBy(F.desc("lb"), "token").limit(k + 1).collect()
    ]
    cut = int(top[k]) if len(top) > k else 0
    n = summaries.filter(F.col("token").isNull()).agg(
        F.coalesce(F.sum("lb"), F.lit(0)).cast("bigint").alias("lb")
    )
    kept = (
        totals.select("token", (F.col("lb") - F.lit(cut)).alias("lb"))
        .filter(F.col("lb") > 0)
    )
    return kept.unionByName(n.select(F.lit(None).cast("string").alias("token"), "lb"))
