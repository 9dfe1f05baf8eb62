"""Training-data curation operators: benchmark decontamination,
repetition-based quality filtering (Gopher-style), and deterministic
stratified sampling.

These are the corpus-hygiene passes a large-scale training-data pipeline
runs between ingest and tokenization. All are pure JVM expressions /
equi-joins — no Python in the hot path, no all-pairs work:

- contamination: train-side shingles semi-joined against the benchmark
  shingle set. The benchmark set is SMALL by construction (eval suites
  are ~10⁶ n-grams), so the join is an explicit broadcast: the 100 TB
  train side is scanned once, map-side only.
- repetition metrics: explode + two-level hash aggregation keyed by
  doc — partial aggregation map-side, shuffle carries one row per
  (doc, distinct bigram).
- stratified sampling: a deterministic per-row hash threshold — zero
  shuffle, reproducible across runs/engines (md5 is engine-portable),
  and stable under re-partitioning, unlike ``df.sample`` whose output
  depends on partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from meerpipe_spark.operators.dedup import shingles


def benchmark_contamination(
    train: DataFrame,
    bench: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per train doc: how many of its distinct word n-grams appear in
    ANY benchmark doc (decontamination scan).

    Returns (id, n_overlap, contam_frac) for docs with >= 1 overlap.
    The benchmark n-gram set is deduped and broadcast — train is
    scanned once with a map-side semi-join, no shuffle of train rows.
    """
    bench_sh = (
        bench.select(F.explode(shingles(F.col(text_col), shingle_n)).alias("s"))
        .distinct()
    )
    train_sh = train.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    hits = (
        train_sh.select(id_col, F.size("sh").cast("bigint").alias("n_shingles"),
                        F.explode("sh").alias("s"))
        .join(F.broadcast(bench_sh), "s")
        .groupBy(id_col, "n_shingles")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    return hits.select(
        id_col,
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias("contam_frac"),
    )


def repetition_metrics(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top_bigram_frac: float = 0.06,
    max_dup_word_frac: float = 0.65,
) -> DataFrame:
    """Gopher-style repetition signals per doc:

    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over total bigrams (boilerplate / template detector);
    - ``dup_word_frac``: 1 - distinct_words/total_words;
    - ``keep``: both under their thresholds.

    Docs with fewer than 2 words have no bigrams and are dropped (no
    repetition signal). Bigram counting is explode + two hash aggs keyed
    by doc — partial agg map-side; the scalar word stats are array
    intrinsics joined back on the doc key.
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

    bg_counts = (
        docs.select(F.col(id_col), F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = bg_counts.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
    )
    scalars = docs.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_words"),
        F.round(1.0 - F.size(F.array_distinct(words)) / F.size(words), 6).alias(
            "dup_word_frac"
        ),
    )
    return per_doc.join(scalars, id_col).select(
        id_col,
        "n_words",
        "top_bigram_frac",
        "dup_word_frac",
        (
            (F.col("top_bigram_frac") < max_top_bigram_frac)
            & (F.col("dup_word_frac") < max_dup_word_frac)
        ).alias("keep"),
    )


def quota_sample(
    docs: DataFrame,
    n_per_stratum: int,
    stratum_col: str = "source",
    hash_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-N-per-stratum sampling (data-mixture quotas): keep the
    ``n_per_stratum`` docs with the smallest (md5(content), id) rank in
    each stratum — a deterministic, engine-portable uniform draw, with
    the id tiebreak making equal-content rows ordered.

    One shuffle on the stratum key + per-partition top-N (rank window).
    Skew note: a mega-stratum concentrates one partition; for quotas
    ≤~10⁶ swap the window for a per-partition heap (groupBy + slice of
    sort_array(collect_list(...))) bounded by N, or pre-filter with
    :func:`stratified_sample` at a rate just above the quota so the
    window only ranks a small superset.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(stratum_col).orderBy(
        F.md5(F.col(hash_col)), F.col(id_col)
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def segment_boilerplate_filter(
    docs: DataFrame,
    segment_words: int = 8,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency boilerplate removal (RefinedWeb-style line
    dedup, generalized to fixed word-window segments for corpora whose
    documents carry no newline structure): drop every segment that
    occurs in >= ``min_docs`` DISTINCT documents, then reassemble each
    document from its surviving segments in order.

    Returns (id, n_segments, n_kept, text_clean). Documents whose every
    segment is boilerplate survive with text_clean = '' (the caller
    decides whether an emptied doc is dropped).

    Shuffle inventory at 100 TB: segment counting is one hash-agg keyed
    by the segment string — count(DISTINCT doc) is rewritten as two
    partial-aggregated stages (segment,doc → segment), so the shuffle
    carries one row per distinct (segment, doc), never raw text. The
    boilerplate set (segments above the threshold — tiny, by Zipf) joins
    back LEFT ANTI; AQE broadcasts it. Reassembly is one groupBy on the
    doc id carrying surviving segments only.
    """
    words = F.split(F.col(text_col), " ")
    nseg = F.ceil(F.size(words) / F.lit(segment_words)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * segment_words + 1, segment_words)),
    )
    seg_rows = docs.select(
        F.col(id_col), F.posexplode(segs).alias("seg_idx", "seg")
    )
    hot = (
        seg_rows.groupBy("seg")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg")
    )
    kept = seg_rows.join(hot, "seg", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.concat_ws(
            " ", F.transform(F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))), lambda s: s["seg"])
        ).alias("text_clean"),
    )
    totals = docs.select(F.col(id_col), F.ceil(F.size(words) / F.lit(segment_words)).cast("bigint").alias("n_segments"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_segments",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


#: PII patterns restricted to the regex subset Java (Spark) and RE2
#: (DuckDB) interpret identically: char classes, bounded repetition,
#: ASCII word boundaries. Order matters — emails are redacted before
#: bare digit runs so the local part survives as <EMAIL>, not <NUM>.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\b[0-9]{6,}\b", "<NUM>"),
)


def pii_redact(col: F.Column, patterns=PII_PATTERNS) -> F.Column:
    """Chain of regexp_replace redactions — pure JVM expression, whole-
    stage-codegen'd, zero shuffle: the 100 TB scrub pass is map-only.
    A real deployment extends PII_PATTERNS; the chain shape (and its
    oracle) don't change.
    """
    out = col
    for pat, repl in patterns:
        out = F.regexp_replace(out, pat, repl)
    return out


def mixture_rates(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture rebalancing: per-stratum token totals and the
    deterministic sampling rate that rebalances the corpus toward a
    UNIFORM token share per stratum, capped at 1.0 (never upsample):

        rate_s = min(1, (total_tokens / n_strata) / tokens_s)

    Feed the rates into :func:`stratified_sample` for the actual draw.
    Two hash-aggs (doc→stratum totals) plus a single-row broadcast of
    the grand total — scan-proportional, no per-doc shuffle of text.
    """
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    per = docs.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(toks).alias("n_tokens"),
    )
    # Grand total via a broadcast single-row cross join (not a global
    # window): the per-stratum frame is small but a partitionBy()-empty
    # window is a habit that does not survive scale-ups elsewhere.
    totals = per.agg(
        F.sum("n_tokens").alias("_tot"), F.count(F.lit(1)).alias("_nstrata")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        stratum_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("_tot") / F.col("_nstrata")) / F.col("n_tokens"),
            ),
            6,
        ).alias("rate"),
    )


def hash_split(
    docs: DataFrame,
    train: float = 0.8,
    val: float = 0.1,
    hash_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test assignment from a content hash:
    the first 8 hex digits of md5 order as a uniform [0,1) draw, so the
    split is reproducible across engines/runs/partitionings and
    dedup-stable (byte-equal docs land in the same split — the property
    that prevents train→test leakage through duplicates). Zero shuffle.
    """
    bucket = F.substring(F.md5(F.col(hash_col)), 1, 8)
    return docs.withColumn(
        "split",
        F.when(bucket < _hex_threshold(train), "train")
        .when(bucket < _hex_threshold(train + val), "val")
        .otherwise("test"),
    )


def _hex_threshold(p: float) -> str:
    """8-hex-digit threshold t such that a uniformly distributed
    lowercase hex prefix h satisfies h < t with probability ~p.
    p >= 1 maps to 'g' (> every hex digit, keeps everything)."""
    if p >= 1.0:
        return "g"
    return format(max(int(p * 16**8), 0), "08x")


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.1,
    stratum_col: str = "source",
    hash_col: str = "text",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff the first 8
    hex digits of md5(hash_col) are lexicographically below the
    stratum's threshold (hex digits order numerically, so this is a
    uniform [0,1) draw that is identical across engines, runs and
    partitionings).

    Hashing CONTENT (not id) makes the sample dedup-stable: byte-equal
    docs are kept or dropped together regardless of id assignment.
    Zero shuffle — a single map-side filter at any scale.

    Rows with NULL ``hash_col`` hash to NULL and are always dropped
    (filter predicates are null-rejecting) — filter them upstream if
    they must be retained.
    """
    bucket = F.substring(F.md5(F.col(hash_col)), 1, 8)
    thr = F.lit(_hex_threshold(default_rate))
    for stratum, p in rates.items():
        thr = F.when(F.col(stratum_col) == stratum, F.lit(_hex_threshold(p))).otherwise(thr)
    return docs.filter(bucket < thr)


def importance_resample(
    docs: DataFrame,
    is_target: F.Column,
    n: int = 500,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023): select the
    ``n`` raw documents whose word distribution looks most like the
    TARGET slice, via Gumbel top-k over add-1-smoothed unigram-LM
    log-ratios.

    Per document d with word multiset W(d):

        score(d) = Σ_{w∈W(d)} [ ln((t_w+1)/(T_t+V)) − ln((r_w+1)/(T_r+V)) ]

    with t_w/r_w the word's count in the target slice / full corpus,
    T_t/T_r the token totals and V the vocabulary size. Sampling
    without replacement ∝ exp(score) is the Gumbel top-k trick:
    key = score + Gumbel(0,1); the noise is DERIVED from content
    (md5 → uniform (0,1) → −ln(−ln u)), so the draw is reproducible
    across engines, runs and partitionings — the same determinism
    contract as :func:`stratified_sample` / :func:`hash_split`.

    Distributed shape: one partial-agg shuffle for the word table
    (t_w, r_w per word), a 1-row totals aggregate broadcast by cross
    join, one word-keyed join back (Zipf head → AQE skew split), one
    per-doc agg, then global top-n = TakeOrderedAndProject (per-
    partition heaps, no full sort). No row ever carries more than one
    word; the word table is vocabulary-sized, not corpus-sized.
    """
    words = docs.select(
        F.col(id_col),
        is_target.cast("int").alias("_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    counts = words.groupBy("w").agg(
        F.sum("_t").cast("bigint").alias("tc"),
        F.count(F.lit(1)).cast("bigint").alias("rc"),
    )
    totals = counts.agg(
        F.sum("tc").alias("Tt"),
        F.sum("rc").alias("Tr"),
        F.count(F.lit(1)).alias("V"),
    )
    term = F.log((F.col("tc") + 1) / (F.col("Tt") + F.col("V"))) - F.log(
        (F.col("rc") + 1) / (F.col("Tr") + F.col("V"))
    )
    scored = (
        words.join(counts, "w")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(F.sum(term).alias("score"))
    )
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10).cast(
        "double"
    ) + 0.5) / float(1 << 48)
    gumbel = -F.log(-F.log(u))
    keyed = scored.select(
        F.col(id_col),
        F.col("score"),
        (F.col("score") + gumbel).alias("gumbel_key"),
    )
    return (
        keyed.orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(n)
        .select(
            id_col,
            F.round("score", 6).alias("score"),
            F.round("gumbel_key", 6).alias("gumbel_key"),
        )
    )


def profile_table(df: DataFrame, columns: "list[str] | None" = None) -> DataFrame:
    """Data-quality column profile: one row per column with row count,
    null count, exact distinct count, and min/max rendered as strings —
    the pre-ingest sanity gate every curation pipeline runs before
    trusting a new table drop.

    Distributed shape: ONE wide aggregation over the table computes
    every column's stats in a single pass (each stat is a partial-agg
    expression, so the shuffle carries one row total); the per-column
    pivot to long form happens on that single row driver-side via
    stack — no second scan, no per-column jobs (the naive
    loop-over-columns issues |cols| full scans).

    ``count_distinct`` is exact (it adds one expand+agg pass per
    column inside the same job — acceptable for profiling; swap in
    approx_count_distinct at 10^12-row scale where 2% error is fine).
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).cast("bigint").alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


def temperature_resample(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture resampling (the XLM-R / multilingual-
    pretraining recipe at alpha = 1/2): target share of source s is
    p_s = sqrt(q_s) / sum_t sqrt(q_t) where q_s is its natural token
    share — up-weights the tail, damps the head. The realized token
    budget is B = min_s(n_s / p_s), the largest budget for which no
    source must be sampled past rate 1 (without-replacement limit), and
    each doc keeps iff its 48-bit md5 uniform < rate_s = B * p_s / n_s.

    alpha is pinned to 1/2 because sqrt is CORRECTLY ROUNDED by IEEE-754
    (pow is not): every per-source quantity is bit-identical across
    engines. The one order-sensitive float op — sum_t sqrt(n_t) — is
    forced into ascending order on both sides (fold over sort_array
    here, `ORDER BY` aggregate in the oracle), so the whole decision
    column is deterministic under any partitioning.

    Returns (id, source, rate, kept). Distributed shape: one per-source
    token agg (partial-aggregated), a ~|sources|-row stats rollup
    broadcast back as a single-row cross join, then a map-only keep
    decision — the corpus is never shuffled at all.
    """
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    per_doc = docs.select(
        F.col(id_col), F.col(source_col), n_tok.alias("n_tokens")
    )
    per_src = per_doc.groupBy(source_col).agg(
        F.sum("n_tokens").cast("double").alias("n_s")
    )
    stats = per_src.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.sqrt("n_s"))),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sum_sqrt")
    )
    rates = (
        per_src.crossJoin(F.broadcast(stats))
        .withColumn("p_s", F.sqrt("n_s") / F.col("sum_sqrt"))
        .withColumn("b_s", F.col("n_s") / F.col("p_s"))
    )
    budget = rates.agg(F.min("b_s").alias("B"))
    rates = rates.crossJoin(F.broadcast(budget)).select(
        source_col,
        (F.col("B") * F.col("p_s") / F.col("n_s")).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast("double")
        / F.lit(float(1 << 48))
    )
    return (
        docs.select(F.col(id_col), F.col(source_col), u.alias("u"))
        .join(F.broadcast(rates), source_col)
        .select(
            id_col,
            source_col,
            F.round("rate", 6).alias("rate"),
            (F.col("u") < F.col("rate")).alias("kept"),
        )
    )


def quality_gate(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_top_word_frac: float = 0.2,
    max_digit_word_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Composite document-quality gate — the Gopher-rules pass (Rae et
    al. 2021, Appendix A: word-count bounds, mean-word-length band,
    repetition and symbol ratios) as ONE zero-shuffle map: every signal
    is computed from the document's own word array with JVM expressions,
    so the gate runs at scan speed and the keep decision (plus a
    machine-readable list of failed checks) lands next to the row.

    The repetition signal (most-frequent-word share) is computed as the
    longest equal run of the SORTED word array via a sequential fold —
    O(n log n) per doc, integer-exact (the oracle recomputes it with a
    per-doc group-by; both are exact multiplicities, so they agree
    without op-sequence pinning).

    Returns (id, n_words, mean_word_len, top_word_frac, digit_word_frac,
    failed_checks, keep).
    """
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    mean_len = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    ) / n
    run = F.aggregate(
        F.array_sort(words),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )["best"]
    digit_words = F.size(F.filter(words, lambda w: w.rlike("[0-9]")))
    # floor-form rounding: engine round() implementations disagree on
    # exact .5 boundaries (see unit_conversions); small-int ratios CAN
    # land there, floor(x*1e6 + 0.5)/1e6 is the same IEEE ops both sides
    fr6 = lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    out = docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        fr6(mean_len).alias("mean_word_len"),
        fr6(run / n).alias("top_word_frac"),
        fr6(digit_words / n).alias("digit_word_frac"),
    )
    checks = [
        ("too_short", F.col("n_words") < min_words),
        ("too_long", F.col("n_words") > max_words),
        ("word_len", (F.col("mean_word_len") < min_mean_word_len)
                     | (F.col("mean_word_len") > max_mean_word_len)),
        ("repetition", F.col("top_word_frac") > max_top_word_frac),
        ("digits", F.col("digit_word_frac") > max_digit_word_frac),
    ]
    failed = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    return out.select(
        "*",
        F.concat_ws(",", failed).alias("failed_checks"),
        (F.size(failed) == 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Data-quality monitoring (round 5, wave 4): robust outliers + PSI drift
# ---------------------------------------------------------------------------

def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    keep_cols: list[str],
    k: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier detection via the modified z-score
    (Iglewicz-Hoaglin): M = 0.6745·(x - median) / MAD, flag |M| > k.

    Median and MAD are EXACT interpolated percentiles (F.median), so the
    statistics — unlike mean/stddev — are insensitive to the outliers
    they hunt, and are engine-portable (DuckDB's median interpolates
    identically). MAD needs the median first, so the fact table is
    scanned three times (median agg, MAD agg, final flagging); the two
    exact-median aggregations shuffle (group, value) PAIRS — the
    honest cost of exact order statistics — while the flagging pass
    joins the tiny broadcast stat tables and never shuffles full rows.
    At 100 TB swap the exact medians for sampled_quantiles
    (sketches.py) and the wide exchanges disappear; the flagging pass
    is unchanged. Low-cardinality group keys
    are exactly the case where a grouped shuffle WOULD skew, which the
    broadcast sidesteps.

    Returns flagged rows: keep_cols + group_cols + value, med, mad,
    robust_z (6dp, boundary-proof floor rounding).
    """
    med = df.groupBy(*group_cols).agg(F.median(value_col).alias("med"))
    dev = df.join(F.broadcast(med), list(group_cols)).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.median("absdev").alias("mad"), F.min("med").alias("med")
    )
    z = F.lit(0.6745) * (F.col(value_col) - F.col("med")) / F.col("mad")
    return (
        df.join(F.broadcast(mad), list(group_cols))
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > k)
        .select(
            *keep_cols,
            *group_cols,
            F.col(value_col),
            "med",
            "mad",
            (F.floor(F.col("robust_z") * 1e6 + F.lit(0.5)) / 1e6).alias("robust_z_r"),
        )
        .drop("robust_z")
        .withColumnRenamed("robust_z_r", "robust_z")
    )


def _psi_fold(terms: DataFrame) -> DataFrame:
    """Sum (feature, bin_key, term) rows into one PSI per feature with a
    DETERMINISTIC fold: collect the terms sorted by bin_key and add them
    sequentially, so Spark and an external oracle replay the identical
    IEEE addition sequence (partial-aggregation reorder can't move the
    last ulp). Rounded 6dp with the boundary-proof floor form.
    """
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("bin_key", "term"))),
        F.lit(0.0),
        lambda acc, x: acc + x["term"],
    )
    return terms.groupBy("feature").agg(
        (F.floor(folded * 1e6 + F.lit(0.5)) / 1e6).alias("psi"),
        F.sum("n_ref").cast("bigint").alias("n_ref"),
        F.sum("n_cur").cast("bigint").alias("n_cur"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    feature: str,
    bin_expr,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``bin_expr``'s distribution between
    a reference and a current snapshot: PSI = Σ_bins (p_cur - p_ref) ·
    ln(p_cur / p_ref), shares clamped at ``eps`` for empty bins.

    Bin edges are FIXED expressions (never data-derived quantiles), so
    the binning is deterministic and the two snapshots can be profiled
    independently — at 100 TB each side is one map-side-collapsing
    count per bin (the exchange carries O(bins) rows per mapper), the
    bin tables are sketch-sized, and the PSI join/fold is driver-scale.
    Shares are exact-count ratios (correctly-rounded divisions), so the
    only transcendental is ln() on identical doubles; the final sum is
    an ordered fold (see _psi_fold). PSI < 0.1 stable / 0.1-0.25
    moderate / > 0.25 major shift (the standard score card).
    """
    ca = ref.select(bin_expr.alias("bin_key")).groupBy("bin_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_ref")
    )
    cb = cur.select(bin_expr.alias("bin_key")).groupBy("bin_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_cur")
    )
    # r13 (guide §5): the side totals were two driver-side .count()
    # jobs over the fact-sized snapshots at build; each equals the sum
    # of its own bin table (every row lands in exactly one group, null
    # keys included), so they now ride the plan as broadcast 1-row
    # sums over the sketch-sized bin frames — zero extra passes.
    # coalesce(..., 0) + cast(double) reproduces the literal division
    # exactly (including the empty-side NaN/Inf edge).
    ta = ca.agg(F.coalesce(F.sum("cnt_ref"), F.lit(0)).cast("double").alias("_ta"))
    tb = cb.agg(F.coalesce(F.sum("cnt_cur"), F.lit(0)).cast("double").alias("_tb"))
    j = (
        ca.join(cb, "bin_key", "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            F.lit(feature).alias("feature"),
            F.col("bin_key").cast("string").alias("bin_key"),
            F.coalesce("cnt_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("cnt_cur", F.lit(0)).alias("n_cur"),
            "_ta",
            "_tb",
        )
        .withColumn("p_ref", F.greatest(F.col("n_ref") / F.col("_ta"), F.lit(eps)))
        .withColumn("p_cur", F.greatest(F.col("n_cur") / F.col("_tb"), F.lit(eps)))
        .withColumn("term", (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")))
    )
    return _psi_fold(j)


def fixed_width_bin(col, lo: float, hi: float, nbins: int):
    """Clipped fixed-width bin index for numeric PSI features."""
    w = (hi - lo) / nbins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(w)).cast("bigint")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))


def leakage_safe_split(
    docs: DataFrame,
    dup_edges: DataFrame,
    id_col: str = "doc_id",
    val_hex_lt: str = "1a",
) -> DataFrame:
    """Train/validation split that cannot leak through near-duplicates:
    assign WHOLE near-dup components to one side by hashing the
    component's canonical id, never the document's.

    A plain per-doc hash split puts ~2·rate·(1−rate) of every dup pair
    across the boundary — the val set then "verifies" memorization of
    its own training twins. Here: connected components over the
    candidate-pair graph (dedup.py::connected_components — min-id
    propagation, production edges from the LSH pipeline), singletons
    keep their own id as component, and the split decision is
    md5("split:"||component) thresholded on the first two hex digits
    (rate = int(val_hex_lt, 16)/256) — the same content-derived,
    engine-portable coin as stratified_sample. Properties: every doc in
    a component lands on the same side BY CONSTRUCTION (the hash input
    is identical), the decision is a zero-shuffle map after CC, and
    re-running over a grown corpus only moves docs whose component
    MERGED (the unavoidable case).

    Returns (id, component, split ∈ {train, val}).
    """
    from meerpipe_spark.operators.dedup import connected_components

    comp = connected_components(dup_edges)
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("component").cast("string"))), 1, 2
    )
    return (
        docs.select(F.col(id_col))
        .join(comp, docs[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).cast("bigint").alias("component"),
        )
        .withColumn(
            "split",
            F.when(h < F.lit(val_hex_lt), F.lit("val")).otherwise(F.lit("train")),
        )
    )


def weighted_sample_wor(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsamp",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement by the one-pass reservoir
    key of Efraimidis & Spirakis (2006): each row draws u ~ U(0,1) and
    competes with key u^(1/w); the k largest keys are exactly a
    weighted sample without replacement. One TakeOrdered over the
    corpus — no sequential reservoir, no multi-pass quota loop, and
    the same keys make the sample MERGEABLE (union two shards' top-k,
    re-take top-k — used by every distributed reservoir).

    Determinism contract (the house exactness rules): u is the dyadic
    (md5_48(salt:id) + 0.5) / 2^48 — exact in both engines; the key is
    rounded to the 6dp grid with ``id_col`` as tie-break, so libm pow
    ulp differences cannot reorder the sample. Returns the k sampled
    rows with their (rounded) keys.

    At 100 TB: TakeOrderedAndProject keeps per-partition top-k heaps
    and merges k rows per partition on the driver — no global sort, no
    shuffle of the corpus.
    """
    m = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("double")
    u = (m + F.lit(0.5)) / F.lit(float(2**48))
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 6
    )
    return (
        df.select(id_col, F.col(weight_col).cast("bigint").alias("w"), key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )
