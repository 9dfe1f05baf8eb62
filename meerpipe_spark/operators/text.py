"""Text-analysis operators for training-data pipelines: token stats,
quality scoring, language-ID heuristics, document fingerprinting.

All are pure JVM column expressions (split/transform/filter/aggregate) —
no Python UDFs — so they whole-stage-codegen and scan-prune at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count, char count, mean token length."""
    words = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_tokens"),
        F.length(text_col).cast("bigint").alias("n_chars_computed"),
        (
            F.aggregate(words, F.lit(0.0), lambda acc, w: acc + F.length(w))
            / F.size(words)
        ).alias("mean_token_len"),
    )


#: GPT-2-style pre-tokenizer, restricted to the regex subset that Java
#: (Spark) and RE2 (DuckDB) interpret identically: letter runs, digit
#: runs, punctuation runs. Real BPE merges happen downstream; the
#: pre-tokenizer is what determines token COUNTS to first order, which
#: is what a pipeline needs for budgeting/packing.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text_col: F.Column) -> F.Column:
    """array<string> of BPE-ish pre-tokens (letters / digits /
    punctuation runs — whitespace never tokenized). Pure JVM regex,
    whole-stage-codegen'd."""
    return F.regexp_extract_all(text_col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc BPE-ish token count and chars-per-token (the budgeting
    ratio: bytes of corpus per model token)."""
    toks = bpe_ish_tokens(F.col(text_col))
    n = F.size(toks)
    return docs.select(
        F.col(id_col),
        n.cast("bigint").alias("n_bpe_tokens"),
        F.when(n > 0, F.round(F.length(text_col) / n, 6)).alias("chars_per_token"),
    )


def stopword_ratio(text_col: F.Column, stopwords=EN_STOPWORDS) -> F.Column:
    words = F.split(text_col, " ")
    sw = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return sw / F.size(words)


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality score in [0,1]: blend of length band, stopword
    ratio band and mean-token-length band (Gopher-style rule scoring)."""
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    swr = stopword_ratio(F.col(text_col))
    mean_len = F.aggregate(words, F.lit(0.0), lambda a, w: a + F.length(w)) / n
    score = (
        F.when((n >= 10) & (n <= 100000), 0.4).otherwise(0.0)
        + F.when((swr >= 0.01) & (swr <= 0.6), 0.3).otherwise(0.0)
        + F.when((mean_len >= 2.0) & (mean_len <= 12.0), 0.3).otherwise(0.0)
    )
    return docs.select(F.col(id_col), F.round(score, 6).alias("quality"))


def lang_guess(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram/stopword language-ID heuristic: 'en' when the English
    stopword ratio clears a threshold, else 'other'. (A real model slots
    in as a pandas UDF without changing the plan shape.)"""
    return docs.select(
        F.col(id_col),
        F.when(stopword_ratio(F.col(text_col)) >= 0.05, "en").otherwise("other").alias("lang_guess"),
    )


def tfidf_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Mean TF-IDF per document — the classic informativeness score
    (low = the doc is made of corpus-ubiquitous tokens).

    score(d) = sum_t tf(t,d) * log10(N / df(t)) / |d|

    Three partial-aggregated shuffles, none carrying text longer than
    one token: (doc, tok) term counts; (tok) document frequencies; the
    scoring join keyed by the token (Zipf head → AQE skew-split), then
    a per-doc agg. N arrives as a broadcast single-row cross join.
    """
    tok = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_corpus"))
    return (
        tf.join(df_, "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * F.log10(F.col("n_corpus") / F.col("df")))
                / F.sum("tf"),
                6,
            ).alias("mean_tfidf"),
        )
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary rate per doc against a corpus-derived top-V
    vocabulary (frequency desc, token asc tiebreak — deterministic).

    The tokenizer-coverage check a pipeline runs before committing to a
    vocab: docs with high OOV under the candidate vocabulary are either
    noise or a domain the tokenizer will serve badly. The vocab is
    ≤ V rows by construction — broadcast; the per-doc pass is one
    explode + left-join(broadcast) + agg keyed by doc.
    """
    tok = docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok"))
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(vocab_size)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)) / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", hex_len: int = 16) -> DataFrame:
    """Deterministic document fingerprint: truncated md5 (hex) — the
    rolling-hash variant is in dedup.simhash; md5 here keeps the
    fingerprint engine-portable (oracle-checkable)."""
    return docs.select(
        F.col(id_col),
        F.substring(F.md5(F.col(text_col)), 1, hex_len).alias("fingerprint"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_words: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking — the context-window prep step
    of an LLM training pipeline: each document becomes ceil-stride
    chunks of ``chunk_words`` words whose starts advance by
    ``chunk_words - overlap`` (consecutive chunks share ``overlap``
    words, so no boundary context is lost). The final chunk may be
    short; a document shorter than one window yields exactly one chunk.

    Returns (id, chunk_idx, n_words, chunk_text, chunk_hash) — the hash
    is the downstream dedup/packing key, computed here so the text
    column can be dropped immediately after tokenization.

    Distributed shape: pure per-row explode of JVM array expressions —
    zero shuffle, whole-stage-codegen'd, perfectly parallel at 100 TB.
    Output partitioning inherits the scan; chunk_idx keeps provenance
    so spans can be re-assembled or de-overlapped later.
    """
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * stride + 1, chunk_words)),
    )
    out = docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("bigint").alias("n_words"),
        "chunk_text",
        F.substring(F.md5("chunk_text"), 1, 16).alias("chunk_hash"),
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 3,
    boundary_hex_lt: str = "08",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the rsync/LBFS/FastCDC boundary rule,
    over a word stream): a chunk boundary falls AFTER word i iff the
    hash of the trailing ``window``-word context clears a threshold
    (md5 first-2-hex < ``boundary_hex_lt``; at '08' the boundary
    probability is 8/256 → mean chunk ≈ 32 words). Because the boundary
    decision depends ONLY on a local content window, an insertion or
    deletion re-chunks just the neighborhood and every later chunk
    RE-SYNCS to identical boundaries — the property fixed-stride
    chunking (``chunk_documents``) lacks, and the reason CDC is the
    dedup-friendly segmentation for mutable/binary payloads (the same
    rule applied to a byte stream chunks the multimodal `binary`
    columns; words here keep it oracle-checkable).

    Returns (id, chunk_idx, start_word, n_words, chunk_hash) — chunk
    hashes feed exact/near dedup exactly like ``chunk_documents``'s.

    Distributed shape: entirely per-row array expressions (boundary
    scan, start/end zip, chunk slice) — zero shuffle, codegen'd; same
    scale anatomy as chunk_documents.
    """
    from meerpipe_spark.io import spread_small_scan

    docs = spread_small_scan(docs)  # md5-per-word scan is CPU-dense
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    ctx = lambda i: F.concat_ws(" ", F.slice(words, i - window + 1, window))  # noqa: E731
    bpos = F.when(
        n >= window,
        F.filter(
            F.sequence(F.lit(window), n),
            lambda i: F.substring(F.md5(ctx(i)), 1, 2) < boundary_hex_lt,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.array_compact(
        F.concat(
            F.array(F.lit(1)),
            F.transform(bpos, lambda b: F.when(b + 1 <= n, b + 1)),
        )
    )
    # let-binding via a 1-element array wrap: ``starts`` (and through it
    # the md5 boundary scan in ``bpos``) is evaluated ONCE per row, not
    # re-expanded in each of the three places the span math uses it —
    # Catalyst inlines duplicated subtrees across nested higher-order
    # lambdas, which re-ran the boundary scan ~4x (measured 4.5 s → the
    # binding cuts the query's dominant term)
    spans = F.element_at(
        F.transform(
            F.array(starts),
            lambda st: F.arrays_zip(
                st.alias("s"),
                F.concat(
                    F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
                    F.array(n + 1),
                ).alias("e"),
            ),
        ),
        1,
    )
    chunk_text = F.concat_ws(
        " ", F.slice(F.split(F.col(text_col), " "), F.col("sp.s"), F.col("sp.e") - F.col("sp.s"))
    )
    out = docs.select(
        F.col(id_col), F.col(text_col), F.posexplode(spans).alias("chunk_idx", "sp")
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("sp.s").cast("bigint").alias("start_word"),
        (F.col("sp.e") - F.col("sp.s")).cast("bigint").alias("n_words"),
        F.substring(F.md5(chunk_text), 1, 16).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# LM perplexity + character entropy (round 5, wave 4)
# ---------------------------------------------------------------------------

def bigram_perplexity(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-bigram perplexity per document — the kenlm/CCNet quality
    filter without the external model: P(w2|w1) = (C(w1 w2)+α) /
    (C(w1)+α·V) with add-α smoothing over the corpus's own counts,
    ppl = 10^(−mean log10 P).

    Distinct from bigram_lm_score (mean raw bigram frequency): this is
    a proper conditional LM, so a rare word followed by its usual
    continuation is NOT penalized, only improbable TRANSITIONS are —
    the signal CCNet actually thresholds on. C(w1) counts every corpus
    occurrence of w1 (documented simplification vs history-position
    counting; α absorbs the tail difference).

    Determinism: counts are exact bigints, each log10 runs on an
    identical correctly-rounded quotient, and the per-doc sum is an
    ordered fold over bigram POSITION — so the mean is engine-exact and
    only the final 10^x carries libm variance (rounded to 4dp, far
    above any pow ulp). Two corpus shuffles (bigram counts, unigram
    counts — both Zipf-headed equi-joins AQE skew-splits) + one doc-
    keyed fold shuffle.
    """
    from meerpipe_spark.io import spread_small_scan

    # r13 (guide §2.5 + §5): spread the unsplittable scan ONCE at the
    # source, so the c2/c1 count builds AND the probe all run their
    # CPU-dense explodes in parallel (an earlier probe-only spread left
    # the two count passes serialized on the 1-task scan), and fold the
    # vocabulary size into the plan as a broadcast 1-row aggregate —
    # `c1.count()` was a full extra corpus pass (word explode + agg)
    # executed driver-side at build. α·V is bit-identical either way:
    # alpha = 0.5 is a power of two, so lit(alpha)*col(v) rounds the
    # same as lit(alpha*v). Interleaved A/B at sf0.1: 2.61 -> 1.20 s,
    # values exactly equal.
    src = spread_small_scan(docs.select(id_col, text_col))
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - 1
    bigrams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = src.select(
        F.col(id_col), F.posexplode(bigrams).alias("pos", "bg")
    ).withColumn("w1", F.split(F.col("bg"), " ")[0])
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    uni = src.select(F.explode(words).alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    vf = c1.agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    scored = (
        bg.join(c2, "bg")
        .join(c1, F.col("w1") == F.col("w"))
        .crossJoin(F.broadcast(vf))
        .withColumn(
            "logp",
            F.log10(
                (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("_v"))
            ),
        )
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "logp"))),
        F.lit(0.0),
        lambda acc, x: acc + x["logp"],
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (F.floor(folded / F.count(F.lit(1)) * 1e6 + F.lit(0.5)) / 1e6).alias("mean_logp"),
        (
            F.floor(
                F.pow(F.lit(10.0), -(F.floor(folded / F.count(F.lit(1)) * 1e6 + F.lit(0.5)) / 1e6))
                * 1e4
                + F.lit(0.5)
            )
            / 1e4
        ).alias("ppl"),
    )


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Shannon entropy over characters, in bits: −Σ p·log2 p
    with p = char count / doc length. A zero-join quality/dedup signal:
    natural text sits ~4 bits, repeated boilerplate and padding collapse
    toward 0, base64/random blobs push toward log2(alphabet).

    Entirely per-document: explode chars, count per (doc, char) — a
    doc-keyed shuffle with map-side partials — then an ordered fold
    over the sorted character histogram so the sum is engine-exact.
    """
    chars = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
        F.explode(F.split(F.col(text_col), "")).alias("ch"),
    )
    hist = chars.groupBy(id_col, "n_chars", "ch").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    term = -(F.col("c") / F.col("n_chars")) * F.log2(F.col("c") / F.col("n_chars"))
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("ch"), term.alias("t")))),
        F.lit(0.0),
        lambda acc, x: acc + x["t"],
    )
    return hist.groupBy(id_col).agg(
        F.min("n_chars").alias("n_chars"),
        (F.floor(folded * 1e6 + F.lit(0.5)) / 1e6).alias("entropy_bits"),
    )


def ngram_udtf_class():
    """Python UDTF (Spark 4 user-defined TABLE function) emitting
    (pos, ngram) rows from a text column — the §2.10 API surface's
    table-function corner: a lateral-joinable generator whose schema is
    declared at the class, usable straight from SQL.

    This is deliberately the API-parity DEMO lane: UDTFs execute
    row-at-a-time in Python, so the production n-gram path remains the
    whole-stage-codegen explode (bigram_lm_score / text.py) — ~10-100×
    faster. What the registered query proves is that the UDTF lane
    produces EXACTLY the rows the codegen lane and an external engine
    produce (hash-checked), so a user porting a reference table
    function gets a correct, if slower, drop-in while they migrate to
    the vectorized form.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, ngram: string")
    class NgramUDTF:
        def eval(self, text: str, n: int):
            if text is None:
                return
            words = text.split(" ")
            for i in range(len(words) - n + 1):
                yield i, " ".join(words[i : i + n])

    return NgramUDTF


def nb_langid_confusion(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Train a word-level Naive Bayes language classifier on the
    labelled corpus and score it on itself; returns the confusion
    matrix (lang, pred_lang, n).

    The "train the model INSIDE the engine" companion to bpe_train:
    class-conditional word counts, class priors and the vocabulary are
    three exact-bigint aggregates (one corpus scan each, map-side
    partials); the model is vocab×langs-sized and broadcasts back into
    a pure-map scoring pass — at 100 TB nothing but the model ever
    leaves the corpus partitions except the final per-doc argmax rows.

    score(d, l) = log10(P(l)) + Σ_w log10((C(w,l)+1) / (tot_l + V))
    with add-1 smoothing. Determinism follows the bigram_perplexity
    conventions: every log10 argument is an identical exact rational,
    the per-(doc,lang) sum is an ordered fold over word POSITION, the
    total is floor-rounded at 1e6 before the argmax, and ties break on
    lang ascending via struct-min — so the argmax, and therefore the
    confusion matrix, is engine-exact.
    """
    # NOTE r13: spread_small_scan was tried here and REVERTED — ``wl``
    # has four consumers (cwl/totl/vocab/scored), each of which
    # re-executes the lineage, so the conditional repartition exchange
    # ran 4× and measured 2.8 → 3.4 s net slower.
    words = F.split(F.col(text_col), " ")
    wl = docs.select(
        F.col(id_col), F.col(lang_col), F.posexplode(words).alias("pos", "w")
    ).filter(F.col("w") != "")
    cwl = wl.groupBy(F.col(lang_col).alias("_l"), "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("cwl")
    )
    totl = wl.groupBy(F.col(lang_col).alias("_l")).agg(
        F.count(F.lit(1)).cast("bigint").alias("totl")
    )
    # r13 (guide §5): the vocabulary size was a driver-side
    # distinct().count() — a full corpus pass (word explode + dedup)
    # blocking at BUILD time — and n_docs a separate count job; both
    # now ride the plan as broadcast 1-row aggregates (n_docs is the
    # sum of the lang-sized priors frame — no extra fact pass at all),
    # so the vocab pass runs concurrently with the other model
    # aggregates inside the single job. bigint+bigint and the
    # double divisions round identically to the literal forms
    # (interleaved A/B 2.70 -> 2.30 s, confusion matrix equal).
    vf = wl.select("w").distinct().agg(F.count(F.lit(1)).cast("bigint").alias("_v"))
    priors = docs.groupBy(F.col(lang_col).alias("_l")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nl")
    )
    ndf = priors.agg(F.sum("nl").cast("bigint").alias("_nd"))
    langs = priors.select("_l")
    # the denominator (tot_l + V) joins in per lang so the quotient is
    # formed as ONE division of exact values, not a log difference
    scored = (
        wl.select(id_col, lang_col, "pos", "w")
        .crossJoin(F.broadcast(langs))
        .join(F.broadcast(cwl), ["_l", "w"], "left")
        .join(F.broadcast(totl), "_l")
        .crossJoin(F.broadcast(vf))
        .withColumn(
            "logp",
            F.log10(
                (F.coalesce(F.col("cwl"), F.lit(0)) + F.lit(1))
                / (F.col("totl") + F.col("_v"))
            ),
        )
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "logp"))),
        F.lit(0.0),
        lambda acc, x: acc + x["logp"],
    )
    per_lang = (
        scored.groupBy(id_col, lang_col, "_l")
        .agg(folded.alias("_s"))
        .join(F.broadcast(priors), "_l")
        .crossJoin(F.broadcast(ndf))
        .withColumn(
            "score",
            F.floor(
                (F.col("_s") + F.log10(F.col("nl") / F.col("_nd").cast("double")))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
    )
    pred = per_lang.groupBy(id_col, lang_col).agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("_l").alias("pl"))).alias(
            "w"
        )
    )
    return (
        pred.select(F.col(lang_col), F.col("w.pl").alias("pred_lang"))
        .groupBy(lang_col, "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM (round 7, wave 4)
# ---------------------------------------------------------------------------

def _bigram_pairs(docs: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
    """(w1, w2) per bigram POSITION (with doc id + position when
    ``id_col`` is given — needed for the ordered per-doc fold)."""
    from meerpipe_spark.io import spread_small_scan

    docs = spread_small_scan(docs)
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - 1
    pairs = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                F.element_at(words, i + 1).alias("w1"),
                F.element_at(words, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    if id_col is None:
        return docs.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    return docs.select(
        F.col(id_col), F.posexplode(pairs).alias("pos", "p")
    ).select(id_col, "pos", "p.w1", "p.w2")


def kneser_ney_tables(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
):
    """The four sufficient-statistic tables of an interpolated
    Kneser-Ney bigram model, all rollups of the bigram-TYPE table
    (vocabulary-sized, never corpus-sized after the one count shuffle):

    - ``c2``:   bigram counts c(w1 w2)
    - ``c1nf``: per-history totals c(w1) = Σ_w2 c(w1 w2) and fan-out
                N1+(w1 ·) (distinct continuations)
    - ``nbd``:  continuation counts N1+(· w2) (distinct histories —
                the Kneser-Ney insight: how many contexts a word
                FOLLOWS, not how often it occurs)
    - ``btot``: 1-row bigram-type total B (broadcast)

    Shuffle budget at any corpus size: ONE corpus-sized exchange (the
    bigram count, map-side partials) + two type-table rollups.
    """
    c2 = _bigram_pairs(docs, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    c1nf = c2.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("nf"),
    )
    nbd = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    btot = c2.agg(F.count(F.lit(1)).cast("bigint").alias("b_types"))
    return c2, c1nf, nbd, btot


def kneser_ney_bigram(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    Chen & Goodman 1999 eq. 4.25) for every OBSERVED bigram:

        P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1)
                      + (D·N1+(w1 ·)/c(w1)) · (N1+(· w2)/B)

    with fixed discount D. The absolute-discount mass freed from seen
    bigrams is routed to the continuation unigram N1+(· w2)/B — the
    distribution that asks "how many distinct contexts does w2 follow",
    which is what separates high-frequency-but-bound words (only ever
    after one history) from genuinely productive ones. The smoothing
    the n-gram LM quality filters (kenlm) actually ship.

    Everything after the one bigram-count shuffle is vocabulary-sized;
    the probability is computed from exact bigint counts in a fixed
    expression tree, so both engines round the same doubles.
    """
    c2, c1nf, nbd, btot = kneser_ney_tables(docs, text_col, discount)
    d = F.lit(float(discount))
    pkn = (
        F.greatest(F.col("c2") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("nf") / F.col("c1")) * (F.col("nb") / F.col("b_types"))
    )
    return (
        c2.join(c1nf, "w1")
        .join(nbd, "w2")
        .crossJoin(F.broadcast(btot))
        .select(
            "w1",
            "w2",
            "c2",
            "c1",
            "nf",
            "nb",
            F.round(pkn, 6).alias("p_kn"),
        )
    )


def kneser_ney_heldout_ppl(
    docs: DataFrame,
    train_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    floor: float = 1e-12,
) -> DataFrame:
    """Held-out per-document perplexity under a Kneser-Ney bigram model
    TRAINED on ``train_filter`` rows and SCORED on the rest — the
    train/evaluate lifecycle of a corpus LM filter, with the backoff
    chain a real held-out set exercises:

    - seen history:   interpolated KN (the c(w1 w2)=0 case degrades to
                      the backoff weight times the continuation prob
                      automatically via coalesce-to-0 counts);
    - unseen history: continuation unigram N1+(· w2)/B;
    - unseen word:    probability floor (1e-12), so OOV test tokens
                      cost ~12 digits instead of -inf.

    Per-doc mean log10 p is a position-ordered fold (engine-exact sum
    order); ppl = 10^(−mean) with the house pre-rounding discipline.
    """
    train = docs.filter(train_filter)
    test = docs.filter(~train_filter)
    c2, c1nf, nbd, btot = kneser_ney_tables(train, text_col, discount)
    bg = _bigram_pairs(test, text_col, id_col=id_col)
    d = F.lit(float(discount))
    joined = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1nf, "w1", "left")
        .join(nbd, "w2", "left")
        .crossJoin(F.broadcast(btot))
    )
    seen_hist = (
        F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("nf") / F.col("c1"))
        * (F.coalesce(F.col("nb"), F.lit(0)) / F.col("b_types"))
    )
    unseen_hist = F.coalesce(F.col("nb"), F.lit(0)) / F.col("b_types")
    p = F.greatest(
        F.when(F.col("c1").isNotNull(), seen_hist).otherwise(unseen_hist),
        F.lit(float(floor)),
    )
    scored = joined.select(id_col, "pos", F.log10(p).alias("logp"))
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "logp"))),
        F.lit(0.0),
        lambda acc, x: acc + x["logp"],
    )
    mean_logp = F.floor(folded / F.count(F.lit(1)) * 1e6 + F.lit(0.5)) / 1e6
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        mean_logp.alias("mean_logp"),
        (F.floor(F.pow(F.lit(10.0), -mean_logp) * 1e4 + F.lit(0.5)) / 1e4).alias("ppl"),
    )


def _trigram_triples(
    docs: DataFrame, text_col: str, id_col: str | None = None
) -> DataFrame:
    """(w1, w2, w3) per trigram POSITION (with doc id + position when
    ``id_col`` is given) — the order-3 twin of ``_bigram_pairs``."""
    from meerpipe_spark.io import spread_small_scan

    docs = spread_small_scan(docs)
    words = F.split(F.col(text_col), " ")
    k = F.size(words) - 2
    triples = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                F.element_at(words, i + 1).alias("w1"),
                F.element_at(words, i + 2).alias("w2"),
                F.element_at(words, i + 3).alias("w3"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
    )
    if id_col is None:
        return docs.select(F.explode(triples).alias("t")).select(
            "t.w1", "t.w2", "t.w3"
        )
    return docs.select(
        F.col(id_col), F.posexplode(triples).alias("pos", "t")
    ).select(id_col, "pos", "t.w1", "t.w2", "t.w3")


def kneser_ney_trigram(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """Interpolated TRIGRAM Kneser-Ney (Chen & Goodman 1999 §4.1.6) for
    every observed trigram — the full three-level backoff chain the
    kenlm-class corpus filters ship at order ≥3:

        P(w3|w1w2) = max(c(w1w2w3)−D,0)/c(w1w2)
                     + (D·N1+(w1w2·)/c(w1w2)) · P(w3|w2)
        P(w3|w2)   = max(N1+(·w2w3)−D,0)/N1+(·w2·)
                     + (D·N1+(w2··)/N1+(·w2·)) · P_cont(w3)
        P_cont(w3) = N1+(··w3)/T

    where the MID and BOTTOM levels use continuation (type) counts, not
    raw counts — the Kneser-Ney insight applied at each backoff level:
    N1+(·w2w3) = distinct left-contexts of the bigram (w2,w3),
    N1+(·w2·)  = trigram types with middle w2 (its normalizer),
    N1+(w2··)  = distinct w3 ever following w2 (the mid fan-out),
    N1+(··w3)  = distinct (w2) preceding w3 among mid-level types, and
    T = total mid-level types.

    Shuffle budget: ONE corpus-sized exchange (the trigram count,
    map-side partials); every other table — c12/nf12, the mid table n3,
    its rollups, the bottom table — is a rollup of the trigram-TYPE
    table, so the plan is type-table-bounded after the first exchange
    (the 100 TB shape: types grow sublinearly in tokens). Exact bigint
    counts through a fixed expression tree; rounded at 6dp so both
    engines land on the same doubles.
    """
    c3 = _trigram_triples(docs, text_col).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c3")
    )
    # top level: raw history totals + fan-out
    c12 = c3.groupBy("w1", "w2").agg(
        F.sum("c3").cast("bigint").alias("c12"),
        F.count(F.lit(1)).cast("bigint").alias("nf12"),
    )
    # mid level: continuation counts of the trigram-type table
    n3 = c3.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n3")
    )
    n2m = n3.groupBy("w2").agg(
        F.sum("n3").cast("bigint").alias("n2m"),
        F.count(F.lit(1)).cast("bigint").alias("f2"),
    )
    # bottom level: continuation counts of the MID-level type table
    nb3 = n3.groupBy("w3").agg(F.count(F.lit(1)).cast("bigint").alias("nb3"))
    ttot = n3.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    d = F.lit(float(discount))
    p_cont = F.col("nb3") / F.col("t_types")
    p_mid = (
        F.greatest(F.col("n3") - d, F.lit(0.0)) / F.col("n2m")
        + (d * F.col("f2") / F.col("n2m")) * p_cont
    )
    p_tri = (
        F.greatest(F.col("c3") - d, F.lit(0.0)) / F.col("c12")
        + (d * F.col("nf12") / F.col("c12")) * p_mid
    )
    return (
        c3.join(c12, ["w1", "w2"])
        .join(n3, ["w2", "w3"])
        .join(n2m, "w2")
        .join(nb3, "w3")
        .crossJoin(F.broadcast(ttot))
        .select(
            "w1",
            "w2",
            "w3",
            "c3",
            "c12",
            "n3",
            F.round(p_tri, 6).alias("p_kn3"),
        )
    )


def kneser_ney_trigram_tables(
    docs: DataFrame, text_col: str = "text"
):
    """The six sufficient-statistic tables of the interpolated trigram
    KN model (see :func:`kneser_ney_trigram`), all rollups of the
    trigram-TYPE table after one corpus-sized count exchange."""
    c3 = _trigram_triples(docs, text_col).groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("c3")
    )
    c12 = c3.groupBy("w1", "w2").agg(
        F.sum("c3").cast("bigint").alias("c12"),
        F.count(F.lit(1)).cast("bigint").alias("nf12"),
    )
    n3 = c3.groupBy("w2", "w3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n3")
    )
    n2m = n3.groupBy("w2").agg(
        F.sum("n3").cast("bigint").alias("n2m"),
        F.count(F.lit(1)).cast("bigint").alias("f2"),
    )
    nb3 = n3.groupBy("w3").agg(F.count(F.lit(1)).cast("bigint").alias("nb3"))
    ttot = n3.agg(F.count(F.lit(1)).cast("bigint").alias("t_types"))
    return c3, c12, n3, n2m, nb3, ttot


def kneser_ney_trigram_heldout_ppl(
    docs: DataFrame,
    train_filter,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    floor: float = 1e-12,
) -> DataFrame:
    """Held-out per-document perplexity under the TRIGRAM KN model —
    the order-3 twin of :func:`kneser_ney_heldout_ppl`, exercising the
    full backoff ladder a real held-out set hits:

    - seen history (w1,w2):   interpolated trigram KN (a seen history
                              implies the mid history w2 is seen too —
                              c12 comes from a trigram with middle w2);
    - unseen (w1,w2), seen w2: mid-level continuation model P(w3|w2);
    - unseen w2:              bottom continuation unigram N1+(··w3)/T;
    - unseen w3:              probability floor.

    Same engine-exactness discipline as the bigram lane: per-doc mean
    log10 p is a position-ordered fold; ppl = 10^(−mean) pre-rounded.
    """
    train = docs.filter(train_filter)
    test = docs.filter(~train_filter)
    c3, c12, n3, n2m, nb3, ttot = kneser_ney_trigram_tables(train, text_col)
    tg = _trigram_triples(test, text_col, id_col=id_col)
    d = F.lit(float(discount))
    joined = (
        tg.join(c3, ["w1", "w2", "w3"], "left")
        .join(c12, ["w1", "w2"], "left")
        .join(n3, ["w2", "w3"], "left")
        .join(n2m, "w2", "left")
        .join(nb3, "w3", "left")
        .crossJoin(F.broadcast(ttot))
    )
    p_cont = F.coalesce(F.col("nb3"), F.lit(0)) / F.col("t_types")
    p_mid_seen = (
        F.greatest(F.coalesce(F.col("n3"), F.lit(0)) - d, F.lit(0.0)) / F.col("n2m")
        + (d * F.col("f2") / F.col("n2m")) * p_cont
    )
    p_mid = F.when(F.col("n2m").isNotNull(), p_mid_seen).otherwise(p_cont)
    p_top = F.when(
        F.col("c12").isNotNull(),
        F.greatest(F.coalesce(F.col("c3"), F.lit(0)) - d, F.lit(0.0)) / F.col("c12")
        + (d * F.col("nf12") / F.col("c12")) * p_mid,
    ).otherwise(p_mid)
    p = F.greatest(p_top, F.lit(float(floor)))
    scored = joined.select(id_col, "pos", F.log10(p).alias("logp"))
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("pos", "logp"))),
        F.lit(0.0),
        lambda acc, x: acc + x["logp"],
    )
    mean_logp = F.floor(folded / F.count(F.lit(1)) * 1e6 + F.lit(0.5)) / 1e6
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
        mean_logp.alias("mean_logp"),
        (F.floor(F.pow(F.lit(10.0), -mean_logp) * 1e4 + F.lit(0.5)) / 1e4).alias("ppl"),
    )


def bm25_term_scores(
    docs: DataFrame,
    terms: "tuple[str, ...]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc, term, s): BM25 per-term contributions for the queried
    terms only (the postings actually touched), with the house
    cross-engine expression shapes (exact-int ratios into one IEEE
    chain). Shared by the naive ranking and the MaxScore top-k."""
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("w").isin(*terms))
        .groupBy(id_col, F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )


def _bm25_totals(scored: DataFrame, id_col: str = "doc_id") -> DataFrame:
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("term", "s"))),
        F.lit(0.0),
        lambda acc, x: acc + x["s"],
    )
    return scored.groupBy(id_col).agg(
        (F.floor(folded * 1e6 + F.lit(0.5)) / 1e6).alias("bm25")
    )


def bm25_topk_maxscore(
    docs: DataFrame,
    terms: "tuple[str, ...]",
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    _introspect: bool = False,
):
    """Exact disjunctive BM25 top-k with MaxScore pruning (Turtle &
    Flood 1995): provably LOSSLESS — the oracle is the naive top-k.

    1. per-term upper bounds UB(t) = max doc contribution (|Q| scalars);
    2. θ = the k-th best FULL score among docs containing the highest-UB
       term — a valid lower bound on the final k-th best, computed
       exactly on that subset;
    3. non-essential terms = the maximal UB-ascending prefix with
       ΣUB < θ − 1e-6 (the 1e-6 margin absorbs the output rounding,
       keeping the prune conservative); a document containing ONLY
       non-essential terms scores ≤ ΣUB < θ and can neither enter nor
       tie into the top-k;
    4. exact-score the surviving candidates (docs with ≥1 essential
       term, ALL their term rows), TakeOrdered k.

    At index scale the win is the candidate set: a query mixing one
    rare term with common ones scores only the rare term's postings
    (plus survivors), not the union. Driver-side values are |Q| bounds
    + k θ-rows — dimension-sized; the scored frame is persisted so the
    bound pass and the final pass share one execution (hash exchanges
    only — multi-action-safe per the plan audit's range-exchange rule).
    """
    from meerpipe_spark.cacheutil import persist_tracked

    scored = persist_tracked(bm25_term_scores(docs, terms, text_col, id_col))
    ubs = {
        r.term: r.ub
        for r in scored.groupBy("term").agg(F.max("s").alias("ub")).collect()
    }
    top_term = max(ubs, key=lambda t: (ubs[t], t))
    top_docs = scored.filter(F.col("term") == top_term).select(id_col)
    theta_rows = (
        _bm25_totals(scored.join(top_docs, id_col, "leftsemi"), id_col)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
        .collect()
    )
    essential = list(terms)
    if len(theta_rows) == k:
        theta = theta_rows[-1].bm25
        non_essential, cum = [], 0.0
        for t in sorted(ubs, key=lambda t: (ubs[t], t)):
            if cum + ubs[t] < theta - 1e-6:
                cum += ubs[t]
                non_essential.append(t)
            else:
                break
        essential = [t for t in terms if t not in non_essential]
    cand = scored.filter(F.col("term").isin(*essential)).select(id_col).distinct()
    survivors = scored.join(cand, id_col, "leftsemi")
    result = (
        _bm25_totals(survivors, id_col)
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )
    if _introspect:
        return result, essential, cand.count(), scored.select(id_col).distinct().count()
    return result


def texttiling_boundaries(
    docs: DataFrame,
    block_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextTiling-style topic segmentation (Hearst 1997, simplified):
    split each document into fixed ``block_words`` blocks, score every
    gap by the cosine of the adjacent blocks' term-frequency vectors,
    and mark a boundary where the gap similarity falls below
    mean − 0.5·stddev of the document's gap series — the valley rule.

    Cross-engine exactness: block TF vectors are integers, so each
    cosine is one IEEE chain over exact ints (dot / √(n2a·n2b)),
    rounded to a 1e4-scaled INTEGER. The per-doc mean and stddev then
    run on integer sums (Σx, Σx² — bounded: x ≤ 1e4, so Σx² ≤ n·1e8,
    far under bigint even at book-length docs), and the threshold is
    the identical arithmetic chain on both engines — no float
    accumulation order anywhere.

    Distributed shape: one (doc, block, term) count aggregate, one
    adjacent-block equi-join on (doc, term), two rollups. All keys are
    uniform; nothing is corpus-global except through partial aggs.
    """
    words = F.split(F.col(text_col), " ")
    toks = docs.select(
        F.col(id_col), F.posexplode(words).alias("pos", "w")
    ).select(
        id_col, (F.col("pos") / block_words).cast("int").alias("blk"), "w"
    )
    tf = toks.groupBy(id_col, "blk", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    n2 = tf.groupBy(id_col, "blk").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("n2")
    )
    b = tf.select(
        F.col(id_col),
        (F.col("blk") - 1).alias("blk"),
        F.col("w"),
        F.col("tf").alias("tf_b"),
    )
    dots = (
        tf.join(b, [id_col, "blk", "w"])
        .groupBy(id_col, "blk")
        .agg(F.sum(F.col("tf") * F.col("tf_b")).cast("bigint").alias("dot"))
    )
    n2b = n2.select(
        F.col(id_col), (F.col("blk") - 1).alias("blk"), F.col("n2").alias("n2b")
    )
    # every gap that has BOTH blocks; gaps with no shared term get dot 0
    gaps = (
        n2.join(n2b, [id_col, "blk"])
        .join(dots, [id_col, "blk"], "left")
        .select(
            id_col,
            F.col("blk").alias("gap"),
            F.floor(
                F.coalesce(F.col("dot"), F.lit(0))
                / F.sqrt(F.col("n2") * F.col("n2b"))
                * 1e4
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("sim_i"),
        )
    )
    stats = gaps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("sim_i").cast("bigint").alias("sx"),
        F.sum(F.col("sim_i") * F.col("sim_i")).cast("bigint").alias("sxx"),
    )
    thr = (
        F.col("sx") / (F.col("n") * F.lit(1e4))
        - F.lit(0.5)
        * (
            F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                / (F.col("n") * (F.col("n") - F.lit(1.0)))
            )
            / F.lit(1e4)
        )
    )
    return (
        gaps.join(stats, id_col)
        .select(
            id_col,
            "gap",
            (F.col("sim_i") / F.lit(1e4)).alias("sim"),
            F.when(
                (F.col("n") > 1) & (F.col("sim_i") / F.lit(1e4) < thr), True
            )
            .otherwise(False)
            .alias("is_boundary"),
        )
    )


def rake_keyphrases(
    docs: DataFrame,
    stopwords: list[str],
    top_per_doc: int = 2,
    score_scale: int = 1_000_000,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010, public algorithm),
    scored in EXACT scaled integers so rankings are engine-identical:

    - candidate phrases are maximal stopword-free token runs (the
      gaps-and-islands cumulative-stopword window; empty tokens from
      trailing separators act as boundaries);
    - word degree = Σ length of phrases containing each occurrence,
      word frequency = occurrence count — both exact bigints;
    - word score = (degree · scale) DIV frequency (integer floor
      division — the float deg/freq ratio on a fixed grid), phrase
      score = Σ member word scores (exact bigint, no float summation
      order anywhere), top phrases per doc by (score, phrase) with
      integer tiebreaks.

    Candidates are OCCURRENCE-level, not deduplicated (ADVICE r10):
    a phrase that appears twice in a doc occupies two top_per_doc
    slots and can crowd out distinct phrases — matching the original
    RAKE formulation, pinned by test_rake_segments_and_scores.
    Consumers wanting unique-phrase top-k should groupBy(doc, phrase)
    before the ranking window.

    Scale shape: one posexplode + one cumulative window per doc (the
    fact-sized pass), one corpus-wide word aggregation (vocabulary-
    sized), one broadcast-friendly join back, one per-doc top-k window.
    Returns (doc_id, phrase, n_words, score, rk).
    """
    w = W.partitionBy(doc_col).orderBy("pos")
    toks = docs.select(
        doc_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    ).withColumn(
        "is_stop",
        (F.col("tok").isin(*stopwords) | (F.col("tok") == "")).cast("int"),
    )
    marked = toks.withColumn(
        "phrase_id",
        F.sum("is_stop").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    ).filter(F.col("is_stop") == 0)
    phrases = marked.groupBy(doc_col, "phrase_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("phrase"),
    )
    words = marked.join(
        phrases.select(doc_col, "phrase_id", "n_words"), [doc_col, "phrase_id"]
    )
    wstats = words.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("n_words").cast("bigint").alias("deg"),
    )
    wscore = wstats.select(
        "tok",
        F.expr(f"deg * {score_scale} DIV freq").cast("bigint").alias("wscore"),
    )
    pscores = (
        words.join(wscore, "tok")
        .groupBy(doc_col, "phrase_id")
        .agg(F.sum("wscore").cast("bigint").alias("score"))
        .join(phrases, [doc_col, "phrase_id"])
    )
    rk = F.row_number().over(
        W.partitionBy(doc_col).orderBy(
            F.desc("score"), "phrase", "phrase_id"
        )
    )
    return (
        pscores.withColumn("rk", rk)
        .filter(F.col("rk") <= top_per_doc)
        .select(doc_col, "phrase", "n_words", "score", "rk")
    )
