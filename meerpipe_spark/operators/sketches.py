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
    from meerpipe_spark.io import spread_small_scan

    docs = spread_small_scan(docs)  # bigram build + scoring join are CPU-dense
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


#: alpha_m bias constant for m = 1024 registers (Flajolet et al. 2007,
#: "HyperLogLog: the analysis of a near-optimal cardinality estimation
#: algorithm", §4): 0.7213 / (1 + 1.079/m).  Inlined as the SAME literal
#: in the DuckDB oracle so both engines run identical arithmetic.
HLL_ALPHA_1024 = 0.7205407583220416


def hll_distinct(
    exploded: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 10,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count per group — the fixed-
    state complement to :func:`kmv_distinct` (KMV state grows to k
    hashes; HLL state is EXACTLY m = 2**p 6-bit registers regardless of
    cardinality, the right trade when millions of groups are sketched
    at once).

    Engine-portable determinism (the reason not to use Spark's
    approx_count_distinct / DuckDB's approx HLL, whose register layouts
    and bias tables differ per engine):

    - register index j  = 12-bit md5 prefix mod m (md5 is the shared
      hash);
    - register payload  = rank of the NEXT 48 md5 bits (leading zeros
      + 1), computed via base-2 string length — no floating log2, so
      no last-ulp disagreement between Java and libm;
    - register value    = max(rank), a commutative/associative agg →
      merge-order independent, partial-aggregable (map-side combine),
      and mergeable across corpus shards exactly like production HLL;
    - the harmonic mean sum(2^-M_j) is computed EXACTLY as the bigint
      sum(2^(49-M_j)) / 2^49 — integer addition is order-independent,
      so the estimate is bit-identical on any partitioning/engine.

    Small-range (linear counting) correction applied below 2.5·m as in
    the paper.  Standard error ≈ 1.04/sqrt(m) ≈ 3.3% at p=10.

    Shuffle inventory at 100 TB: one partial-aggregated shuffle keyed
    (group, j) carrying a 1-byte rank, then a group-keyed rollup of ≤ m
    register rows; raw values never shuffle.
    """
    if p != 10:
        raise ValueError("p=10 is the oracle-pinned register count")
    m = 1 << p
    h = F.md5(F.col(value_col).cast("string"))
    j = F.conv(F.substring(h, 1, 3), 16, 10).cast("int") % m
    w = F.conv(F.substring(h, 4, 12), 16, 10).cast("bigint")
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.conv(w.cast("string"), 10, 2))
    )
    rank = (F.lit(49) - bitlen).alias("rank")
    regs = (
        exploded.select(*group_cols, j.alias("j"), rank)
        .groupBy(*group_cols, "j")
        .agg(F.max("rank").alias("M"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers"),
        # shiftleft's Python wrapper wants a literal shift; the SQL form
        # takes the per-register column
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - M)")).alias("S"),
    )
    zeros = (F.lit(m) - F.col("n_registers")).cast("bigint")
    two49 = float(1 << 49)
    raw = F.lit(HLL_ALPHA_1024 * m * m * two49) / (
        F.col("S") + zeros.cast("double") * F.lit(two49)
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        "n_registers",
        zeros.alias("n_zero_registers"),
        F.round(est, 4).alias("hll_est"),
    )


def bloom_positions(key: F.Column, m_bits: int = 2048, k: int = 4) -> F.Column:
    """k deterministic Bloom bit positions for a key: position_i =
    (32-bit slice of md5(key || ':' || i)) mod m_bits.  With m_bits a
    power of two the mod is EXACTLY uniform over the 2^32 slice space,
    and the md5 basis makes the whole filter engine-portable — the same
    positions fall out of any engine with md5, so membership decisions
    (including the false positives themselves) are oracle-checkable.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(key, F.lit(f":{i}"))), 1, 8), 16, 10
                ).cast("bigint")
                % m_bits
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_bitset(
    keys: DataFrame, key_col: str, m_bits: int = 2048, k: int = 4
) -> DataFrame:
    """Build-side of a Bloom join: one row holding the SORTED distinct
    bit positions set by every key — the whole filter is ≤ m_bits ints
    (8 KiB at the default), the definition of broadcastable.  At 100 TB
    this is the explicit, checkable form of the runtime Bloom pruning
    Spark's optimizer injects (spark.sql.optimizer.runtime.bloomFilter):
    build once over the small side (a benchmark/test set), broadcast,
    and prune the petabyte side map-side BEFORE any shuffle or join.

    The set-bits aggregation is a partial-aggregated collect_set over
    exploded positions — each mapper contributes ≤ m_bits ints no
    matter how many keys it saw.
    """
    return (
        keys.select(F.explode(bloom_positions(F.col(key_col), m_bits, k)).alias("p"))
        .agg(F.sort_array(F.collect_set("p")).alias("bloom_bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bits: DataFrame,
    m_bits: int = 2048,
    k: int = 4,
) -> DataFrame:
    """Probe-side: marks each row with ``bloom_hit`` = every one of its
    k positions is set.  The bitset arrives as a broadcast single-row
    cross join (no shuffle of the probe side — the pruning is map-only,
    which is the entire point of a Bloom prefilter at scale).

    The probe is an unrolled AND of k O(1) bitmap-word tests, all plain
    codegen expressions.  The earlier ``forall(pos, array_contains(...))``
    form was r13's pathology: higher-order functions are CodegenFallback
    (interpreted, per-row lambda binding) and each array_contains was a
    linear scan of the set-bit list (~m_bits comparisons), ~80 µs/row.
    The sorted position list is folded into m_bits/64 longs ONCE on the
    1-row build side; each probe is then element_at + bitwiseAND, and
    the conjunction short-circuits on the first clear bit.  Set
    membership is bit-for-bit the same decision, so results are
    unchanged.
    """
    from pyspark.sql.functions import broadcast

    # constant-foldable 64-entry mask table: pow2[i] = 1L << i (bit 63
    # as the negative long); avoids shiftleft-by-column, which the
    # python Column API does not expose
    _POW2 = F.array(
        *[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)]
    )
    nwords = max(1, m_bits // 64)
    # fold sorted bit positions into longs on the single build-side row
    words = bits.withColumn(
        "bloom_words",
        F.aggregate(
            F.col("bloom_bits"),
            F.array_repeat(F.lit(0).cast("long"), nwords),
            lambda acc, p: F.transform(
                acc,
                lambda w, i: F.when(
                    i == F.shiftright(p, 6),
                    w.bitwiseOR(F.element_at(_POW2, p.bitwiseAND(F.lit(63)) + 1)),
                ).otherwise(w),
            ),
        ),
    ).drop("bloom_bits")
    tests = []
    for i in range(k):
        p = (
            F.conv(
                F.substring(F.md5(F.concat(F.col(key_col), F.lit(f":{i}"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % m_bits
        ).cast("int")
        tests.append(
            F.element_at(F.col("bloom_words"), F.shiftright(p, 6) + 1)
            .bitwiseAND(F.element_at(_POW2, p.bitwiseAND(F.lit(63)) + 1))
            != 0
        )
    hit = tests[0]
    for t in tests[1:]:
        hit = hit & t
    return (
        df.crossJoin(broadcast(words))
        .withColumn("bloom_hit", hit)
        .drop("bloom_words")
    )


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_cols: list[str],
    qs: tuple = (0.25, 0.5, 0.75),
    sample_hex_lt: str = "10",
) -> DataFrame:
    """Deterministic-sample quantile estimation — the scale path for the
    profiler's percentile columns. Spark's percentile_approx (GK) and
    DuckDB's approx_quantile are engine-specific and merge-order
    dependent, so neither can be cross-checked; instead: take a
    DETERMINISTIC md5-threshold sample (first 2 hex of md5(key) <
    ``sample_hex_lt`` → rate = int(hex)/256, content-derived like
    stratified_sample, so the SAMPLE ITSELF is engine-portable), then
    run the EXACT interpolated percentile on the sample.

    With sample size m per group the rank error is O(1/sqrt(m)) in
    quantile space (DKW) — rate tunes precision against shuffle volume.
    At 100 TB the exact percentile shuffles every value; this shuffles
    rate × corpus, and the md5 filter is map-side (zero extra pass).

    Returns per group: n_rows, n_sampled, and q{p}_sampled for each p.
    Pair with the exact percentiles at validation scale to measure the
    realized error (the registered query carries both).
    """
    h = F.substring(F.md5(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])), 1, 2)
    samp = df.filter(h < F.lit(sample_hex_lt))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_sampled")]
    for q in qs:
        aggs.append(
            F.round(F.percentile(value_col, F.lit(q)), 6).alias(
                f"q{int(q * 100)}_sampled"
            )
        )
    est = samp.groupBy(*group_cols).agg(*aggs)
    totals = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return totals.join(est, list(group_cols))


# ---------------------------------------------------------------------------
# Count-Min sketch (round 5, wave 4)
# ---------------------------------------------------------------------------

#: Count-Min geometry: depth × width cells. Width 256 keeps the sketch at
#: 1024 cells (ε = e/256 ≈ 1.1% of the stream length, δ = e^-4 ≈ 1.8%);
#: at 100 TB you widen ``width``, not the algorithm.
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(value, j: int, width: int):
    """Row-j CMS bucket for ``value``: first 8 hex of md5("<j>:"||value)
    as an integer, mod width. md5 is bit-identical in Spark and DuckDB
    (unlike xxhash64), so the sketch is cross-engine verifiable; 8 hex
    digits (32 bits) stay exact through the string→bigint conversion.
    """
    h = F.md5(F.concat(F.lit(f"{j}:"), value))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build a Count-Min sketch over ``value_col`` occurrences.

    Returns the register table (j, bucket, cnt) — depth×width rows max.
    The posexplode multiplies rows ×depth BEFORE the shuffle, but the
    map-side partial aggregation collapses each mapper's output to at
    most depth×width cells, so the exchange carries O(depth·width ·
    n_partitions) rows regardless of stream length — the property that
    makes this the 100 TB path for frequency estimation. Registers are
    exact bigint counts: merging sketches of two corpus halves is a
    cell-wise sum (same partial-agg algebra Spark already runs), and
    the whole construction is deterministic, so an external engine
    builds the IDENTICAL sketch (oracle-checked including estimates).
    """
    buckets = F.array(*[_cms_bucket(F.col(value_col), j, width) for j in range(depth)])
    return (
        df.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_probe(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch: est(v) = min_j cnt[j, bucket_j(v)].

    The sketch (≤ depth×width rows) is broadcast; the probe stream maps
    through a hash join with zero shuffle of probe rows. Estimates are
    one-sided: est ≥ true count always (collisions only ADD), within
    ε·N with probability 1-δ.
    """
    p = probes.select(
        F.col(value_col),
        F.posexplode(
            F.array(*[_cms_bucket(F.col(value_col), j, width) for j in range(depth)])
        ).alias("j", "bucket"),
    )
    return (
        p.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Deterministic bootstrap (round 5, wave 4)
# ---------------------------------------------------------------------------

#: Poisson(1) CDF thresholds for the inverse-CDF draw (weights 0..5).
#: Inlined as exact double literals on BOTH engines, so the weight of
#: every (row, replicate) is a pure function of md5 — reproducible
#: anywhere, no RNG state.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
)

#: 2^48 — the proven exact-in-double uniform span (md5 first 12 hex).
_HEX12_SPAN = float(1 << 48)


def bootstrap_ci_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    replicates: int = 32,
    quantiles: tuple = (0.025, 0.975),
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean,
    fully deterministic and engine-portable.

    The classical bootstrap resamples n rows WITH replacement; the
    Poisson bootstrap replaces each row's multinomial count with an
    independent Poisson(1) weight — the standard single-pass
    streaming/distributed form (each row decides its own weight per
    replicate, no global coordination). Here the weight is the
    inverse-CDF of a 48-bit md5 uniform on (replicate ':' key), so the
    ENTIRE resampling plan is a pure function of the data: re-runs,
    re-partitionings, and other engines draw the identical replicates.

    Arithmetic is integer-exact: values quantize to micro-units
    (floor(x·1e6+0.5) — boundary-proof), replicate sums are exact
    bigints, and each replicate mean is two correctly-rounded
    divisions — so the interval hash-matches, which no RNG-based
    bootstrap can do. Cost: one shuffle of (group, replicate) partial
    sums — replicates× the GROUP table, not the data (map-side combine
    collapses each mapper to groups×replicates cells).

    Returns (group_cols..., n_rows, mean, ci_lo, ci_hi). Groups need
    n ≳ 30 rows for the interval to mean anything; a replicate whose
    total weight is zero (probability e^−n — dead for any real group)
    would divide by zero under ANSI, by design rather than silently
    skewing the interval.
    """
    q = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("b").cast("string"), F.lit(":"), F.col(key_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(_HEX12_SPAN)
    )
    w = F.lit(len(_POISSON1_CDF))
    for k in reversed(range(len(_POISSON1_CDF))):
        w = F.when(u < F.lit(_POISSON1_CDF[k]), F.lit(k)).otherwise(w)
    rep = (
        df.select(*group_cols, F.col(key_col), q.alias("q"), b)
        .withColumn("w", w.cast("bigint"))
        .groupBy(*group_cols, "b")
        .agg(
            F.sum("w").cast("bigint").alias("nw"),
            F.sum(F.col("w") * F.col("q")).cast("bigint").alias("sw"),
        )
        .withColumn("mean_b", (F.col("sw") / F.col("nw")) / F.lit(1e6))
    )
    ci = rep.groupBy(*group_cols).agg(
        F.percentile("mean_b", F.lit(quantiles[0])).alias("ci_lo"),
        F.percentile("mean_b", F.lit(quantiles[1])).alias("ci_hi"),
    )
    point = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ((F.sum(q) / F.count(F.lit(1))) / F.lit(1e6)).alias("mean"),
    )
    return point.join(ci, list(group_cols)).select(
        *group_cols, "n_rows", "mean", "ci_lo", "ci_hi"
    )
