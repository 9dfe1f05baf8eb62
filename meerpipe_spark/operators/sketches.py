"""Deterministic distributed sketches for corpus statistics.

At 100 TB you cannot afford exact countDistinct on every slice, but the
usual sketches (HLL++, GK quantiles) are engine- and merge-order-
dependent, so they can never be cross-checked against an external
oracle. These variants are built from md5 order statistics instead:
fully deterministic, identical in any engine with md5, and mergeable
(min-k of a union = min-k of the merged min-k sets — the same partial-
aggregation property HLL relies on).

- KMV (k minimum values) distinct-count estimator: keep the k smallest
  hash values; estimate N ≈ (k-1) / max(normalized kth value).
  Standard error ~ 1/sqrt(k-2). The agg is a bounded sort_array slice —
  map-side partial, shuffle carries ≤ k hashes per group.
- The same min-k array doubles as a bottom-k signature for set
  resemblance (one-permutation MinHash), which is why the operator
  returns the raw minima alongside the estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: 16^16 as a double — normalizes a 16-hex-digit md5 prefix to [0,1).
_HEX16_SPAN = float(16**16)


def kmv_distinct(
    exploded: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count sketch per group over ``value_col``.

    Returns (group_cols..., n_seen, kmv_est, exact via caller if they
    want it). ``n_seen`` is the number of (non-distinct) rows seen.
    When a group has fewer than ``k`` distinct values the sketch is
    exact (the minima set IS the value set).

    The aggregation keeps the k smallest 16-hex md5 prefixes:
    slice(sort_array(collect_set(...)), 1, k) — collect_set is fine
    because the hash universe per group is bounded by the group's
    distinct count, and Spark's partial aggregation caps the transferred
    set at each mapper; for adversarial cardinalities per group, cap
    upstream with a (group, hash) pre-distinct (one extra shuffle),
    which is still ≤ the exact countDistinct plan Spark runs anyway.
    """
    h = F.substring(F.md5(F.col(value_col)), 1, 16)
    mins = F.slice(F.sort_array(F.collect_set(h)), 1, k)
    return (
        exploded.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seen"),
            mins.alias("minima"),
        )
        .select(
            *group_cols,
            "n_seen",
            F.size("minima").cast("bigint").alias("n_minima"),
            F.when(
                F.size("minima") < k,
                F.size("minima").cast("double"),
            )
            .otherwise(
                (F.lit(float(k - 1)))
                / (
                    F.conv(F.element_at("minima", k), 16, 10).cast("double")
                    / F.lit(_HEX16_SPAN)
                )
            )
            .alias("kmv_est"),
            "minima",
        )
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-LM quality proxy (CCNet-style filtering without a model):
    score each document by the mean log10 corpus frequency of its word
    bigrams. Documents made of common constructions score high;
    gibberish and boilerplate-free noise score low. Two passes over the
    same exploded bigram frame:

    1. corpus pass: bigram -> count (one partial-aggregated shuffle);
    2. scoring pass: doc's bigrams equi-join the count table, mean log
       frequency per doc (second shuffle keyed by doc).

    The count table is Zipf-headed but the join key is the bigram
    itself, so AQE's skew split handles the head; no row ever carries
    text longer than one bigram.
    """
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - 1
    bigrams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = docs.select(F.col(id_col), F.explode(bigrams).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        bg.join(counts, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(F.log10("c")), 6).alias("lm_score"),
        )
    )


def kmv_pairwise_resemblance(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-resemblance (Jaccard) estimates between groups from
    their KMV sketches — the sketch-MERGE use case: once per-group
    bottom-k signatures exist (:func:`kmv_distinct`), every pairwise
    corpus-overlap question is answered from the sketches alone, never
    re-touching the data.

    Bottom-k resemblance estimator (Broder): with X = the k smallest
    hashes of A ∪ B (computable from the two minima arrays because
    min-k(A ∪ B) ⊆ min-k(A) ∪ min-k(B) — the mergeability property),
    J(A, B) ≈ |{x ∈ X : x ∈ min-k(A) ∧ x ∈ min-k(B)}| / |X|.

    Distributed shape: |groups| sketch rows self-join into
    |groups|²/2 pairs of ≤ k-element arrays — sketch-sized data, always
    broadcastable; all array ops are JVM-side. Deterministic (md5 order
    statistics), so the ESTIMATES themselves are oracle-checkable.
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("minima").alias("_ma")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("minima").alias("_mb")
    )
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    union_mink = F.slice(
        F.sort_array(F.array_distinct(F.concat(F.col("_ma"), F.col("_mb")))), 1, k
    )
    both = F.array_intersect(F.array_intersect(union_mink, F.col("_ma")), F.col("_mb"))
    return pairs.select(
        "group_a",
        "group_b",
        F.size(both).cast("bigint").alias("n_common"),
        (F.size(both) / F.size(union_mink)).alias("jaccard_est"),
    )
