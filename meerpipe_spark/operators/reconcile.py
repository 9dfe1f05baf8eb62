"""Snapshot reconciliation and blocked fuzzy entity resolution.

The data-engineering companions to the dedup family: `table_diff`
answers "what changed between two versions of a table" (the audit
primitive behind incremental loads, CDC validation, and backfill
verification), and `entity_match_candidates` finds probable same-entity
record pairs across noisy keys — the record-linkage step that runs
BEFORE a merge/dedup decision.

Scale design:

- `table_diff` is ONE full outer join on the primary key with null-safe
  column compares — no row ever leaves its hash partition twice, and
  AQE handles the (common) case where one side is much smaller because
  only a delta changed.
- `entity_match_candidates` never goes all-pairs: candidates come from
  an equi-join on a blocking key (here the natural nation block; at
  100 TB use several redundant blocking keys unioned), and a cheap
  length-difference prefilter runs BEFORE the O(len²) edit-distance
  kernel, so the expensive predicate only sees survivors. Both Spark
  and DuckDB implement classic Levenshtein (unit costs) — integer
  output, so the oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def table_diff(
    v1: DataFrame,
    v2: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two table versions keyed by `key`.

    Returns (key, status, changed_cols) with status in
    {'added', 'removed', 'changed'} — unchanged rows are dropped.
    `changed_cols` lists the differing columns in definition order.
    Null-safe (`eqNullSafe`) comparison: NULL→value and value→NULL both
    count as changes, NULL→NULL does not.
    """
    a = v1.select(key, *compare_cols)
    b = v2.select(key, *compare_cols)
    j = a.alias("a").join(b.alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer")
    changed = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")), F.lit(c)
                )
                for c in compare_cols
            ]
        )
    )
    status = (
        F.when(F.col(f"a.{key}").isNull(), "added")
        .when(F.col(f"b.{key}").isNull(), "removed")
        .when(F.size(changed) > 0, "changed")
    )
    return (
        j.select(
            F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
            status.alias("status"),
            F.when(status == "changed", changed)
            .otherwise(F.array().cast("array<string>"))
            .alias("changed_cols"),
        )
        .filter(F.col("status").isNotNull())
    )


def entity_match_candidates(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Blocked fuzzy-match candidate pairs: records sharing a blocking
    key whose names are within `max_distance` edits.

    Returns (id_a, id_b, name_a, name_b, distance) with id_a < id_b.
    The length prefilter (|len(a)-len(b)| ≤ d is a lower bound on edit
    distance) is a cheap conjunct evaluated before the Levenshtein
    kernel inside the same codegen stage; the equi-join on the block
    key is the only shuffle.
    """
    a = records.select(
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
        F.col(block_col).alias("_blk"),
    )
    b = records.select(
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
        F.col(block_col).alias("_blk"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_distance
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def entity_match_deletion_join(
    records: DataFrame,
    id_col: str,
    name_col: str,
) -> DataFrame:
    """EXACT Levenshtein-1 candidate pairs via the deletion-neighborhood
    join (FastSS, Bocek et al. 2007 / SymSpell — public algorithms):
    every record emits its name plus all L single-character-deletion
    variants; two strings within edit distance 1 MUST share a variant
    key (substitution at p → both minus p agree; indel → the shorter
    string is itself a variant of the longer), so one equi-join on the
    variant finds every pair, then a Levenshtein verify keeps exactness.

    Same output contract as entity_match_candidates(max_distance=1) —
    but LINEAR: the shuffle carries L+1 short keys per record and
    bucket sizes are bounded by true near-dup group sizes, not by any
    blocking key's population. This is the scale path: a nation-blocked
    quadratic join measured 25 s at sf0.1 and would be ~450 M
    Levenshtein calls at sf1.0; the deletion join's candidate count is
    proportional to the OUTPUT. Segment/prefix schemes (PassJoin)
    degenerate on sequential-ID keys (constant prefixes make the hot
    signature quadratic); deletion keys cannot, because a hot variant
    bucket IS a true near-dup cluster.
    """
    base = records.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    variants = base.select(
        "id",
        "name",
        F.explode(
            F.array_union(
                F.array(F.col("name")),
                F.transform(
                    F.sequence(F.lit(1), F.length("name")),
                    lambda i: F.concat(
                        F.substring(F.col("name"), 1, i - 1),
                        F.col("name").substr(i + 1, F.length("name")),
                    ),
                ),
            )
        ).alias("variant"),
    )
    # join on the variant's 8-byte hash, not the string: the shuffle
    # carries longs, and a (cosmically unlikely) collision only ADDS a
    # candidate pair that the Levenshtein verify removes — exactness is
    # unaffected
    variants = variants.select("id", "name", F.xxhash64("variant").alias("vh"))
    # r13: an unsplittable single-file scan leaves the whole candidate
    # chain on one task locally (the variant join is a broadcast probe,
    # so it inherits scan parallelism) — repartition ONLY when the scan
    # is under-parallel (guide §2.5 input-skew remedy; a no-op at scale
    # where the scan already has >= cluster-parallelism splits)
    par = records.sparkSession.sparkContext.defaultParallelism
    if variants.rdd.getNumPartitions() < par:
        variants = variants.repartition(par)
    a = variants.select(
        F.col("id").alias("id_a"), F.col("name").alias("name_a"), "vh"
    )
    b = variants.select(
        F.col("id").alias("id_b"), F.col("name").alias("name_b"), "vh"
    )
    # r13: Levenshtein-verify BEFORE the distinct — distance is a pure
    # function of the names, so filter-then-distinct is row-identical
    # to distinct-then-filter, but the dedup exchange now carries only
    # the true near-dup pairs instead of every variant-collision
    # candidate (956k candidate rows vs ~handfuls of survivors at
    # sf0.1).  threshold=1 makes each verify early-exit (-1 when the
    # distance exceeds it — same kept set, same kept values).
    return (
        a.join(b, "vh")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b", 1))
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
        .distinct()
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    id_col: str,
    sort_cols: list[str],
    block_col,
    payload_cols: list[str],
    window: int = 2,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernandez & Stolfo 1995,
    public algorithm): within each block, order records by `sort_cols`
    (+ id tiebreak) and pair every record with its next `window`
    neighbors — the LINEAR record-linkage blocking (exactly
    `window * n` pairs minus block boundaries), versus the quadratic
    all-pairs-within-block join.

    Returns (id_a, id_b, a_<payload>, b_<payload>) — one lead() window
    per offset over the same sort, so the physical plan is ONE
    shuffle+sort on (block, sort key). Block count is fixed here (value
    bands), so per-block sort volume grows linearly with data; at
    cluster scale swap the block column for repartitionByRange on the
    sort key — same operator contract, same output.
    """
    cols = [F.col(id_col).alias("id_a")] + [
        F.col(c).alias(f"a_{c}") for c in payload_cols
    ]
    w = W.partitionBy(F.col("_snm_blk")).orderBy(
        *[F.col(c) for c in sort_cols], F.col(id_col)
    )
    base = records.withColumn("_snm_blk", block_col)
    out = None
    for d in range(1, window + 1):
        lead = base.select(
            *cols,
            F.lead(F.col(id_col), d).over(w).alias("id_b"),
            *[F.lead(F.col(c), d).over(w).alias(f"b_{c}") for c in payload_cols],
        ).filter(F.col("id_b").isNotNull())
        out = lead if out is None else out.unionAll(lead)
    return out


def fellegi_sunter_em(
    pairs: DataFrame,
    agree_cols: list[str],
    iters: int = 4,
    p0: float = 0.1,
    m0: float = 0.8,
    u0: float = 0.2,
) -> DataFrame:
    """Fellegi-Sunter record-linkage weights by EM (Fellegi & Sunter
    1969; Winkler 1988 EM fitting — public algorithms): candidate pairs
    carry binary agreement fields a_k; the latent mixture
    (match M with P(a_k=1|M)=m_k, unmatch U with P(a_k=1|U)=u_k,
    P(M)=p) is fitted by `iters` closed-form EM rounds:

      E: w = p*prod_k m_k^a (1-m_k)^(1-a)
             / (that + (1-p)*prod_k u_k^a (1-u_k)^(1-a))
      M: p = sum w / n;  m_k = sum w*a_k / sum w;
         u_k = sum (1-w)*a_k / sum (1-w)     (all clamped to (1e-6, 1-1e-6))

    Scale shape mirrors operators/logreg.py: the E-step is a per-pair
    projection (parameters arrive via a broadcast 1-row crossJoin, never
    the driver), the M-step ONE map-side-combined aggregation of
    2k+2 doubles regardless of pair count. Returns the 1-row model
    frame (n_pairs, p, m_<k>..., u_<k>...).
    """
    from meerpipe_spark.cacheutil import persist_tracked

    k = len(agree_cols)
    model = None  # 1-row frame with p, m_i, u_i
    pairs = persist_tracked(pairs)
    for it in range(iters):
        if model is None:
            p = F.lit(float(p0))
            ms = [F.lit(float(m0))] * k
            us = [F.lit(float(u0))] * k
            df = pairs
        else:
            df = pairs.crossJoin(F.broadcast(model))
            p = F.col("p")
            ms = [F.col(f"m_{i}") for i in range(k)]
            us = [F.col(f"u_{i}") for i in range(k)]
        pm = p
        um = F.lit(1.0) - p
        for i, c in enumerate(agree_cols):
            a = F.col(c).cast("double")
            pm = pm * (a * ms[i] + (F.lit(1.0) - a) * (F.lit(1.0) - ms[i]))
            um = um * (a * us[i] + (F.lit(1.0) - a) * (F.lit(1.0) - us[i]))
        wexp = pm / (pm + um)
        scored = df.select(
            wexp.alias("w"), *[F.col(c).cast("double").alias(c) for c in agree_cols]
        )
        lo, hi = F.lit(1e-6), F.lit(1.0 - 1e-6)
        aggs = [
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.sum("w") / F.count(F.lit(1)).cast("double")).alias("p"),
        ]
        for i, c in enumerate(agree_cols):
            aggs.append(
                F.least(
                    hi,
                    F.greatest(lo, F.sum(F.col("w") * F.col(c)) / F.sum("w")),
                ).alias(f"m_{i}")
            )
            aggs.append(
                F.least(
                    hi,
                    F.greatest(
                        lo,
                        F.sum((F.lit(1.0) - F.col("w")) * F.col(c))
                        / F.sum(F.lit(1.0) - F.col("w")),
                    ),
                ).alias(f"u_{i}")
            )
        # materialize the 1-row model per round (r13): Spark does not
        # dedupe shared subtrees, so an un-truncated model made round t
        # re-run rounds 1..t-1 inside its broadcast build — O(iters²)
        # passes over the pair table instead of O(iters); the checkpoint
        # reads/writes one row, and the E-step float sequence per round
        # is unchanged (same agg over the same persisted pairs)
        model = scored.agg(*aggs).localCheckpoint(eager=True)
    return model


def fellegi_sunter_posteriors(
    pairs: DataFrame, agree_cols: list[str], model: DataFrame
) -> DataFrame:
    """Score pairs with a fitted FS model: appends the match posterior
    `w` under the model's (p, m_k, u_k) — the same E-step expression as
    the final EM round, parameters via broadcast crossJoin."""
    k = len(agree_cols)
    df = pairs.crossJoin(F.broadcast(model))
    pm = F.col("p")
    um = F.lit(1.0) - F.col("p")
    for i, c in enumerate(agree_cols):
        a = F.col(c).cast("double")
        pm = pm * (a * F.col(f"m_{i}") + (F.lit(1.0) - a) * (F.lit(1.0) - F.col(f"m_{i}")))
        um = um * (a * F.col(f"u_{i}") + (F.lit(1.0) - a) * (F.lit(1.0) - F.col(f"u_{i}")))
    return df.withColumn("w", pm / (pm + um))
