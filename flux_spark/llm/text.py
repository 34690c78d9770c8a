"""Text analysis operators — all pure Catalyst expressions.

Every op here stays inside whole-stage codegen (split/filter/aggregate array
functions, no Python in the hot path), so a 100 TB documents scan runs at
parquet-read speed: one pass, no shuffle, column-pruned to (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic "stopword" marker sets for the lang-id heuristic
LANG_MARKERS = {
    "en": ("the", "a", "join", "group"),
    "fr": ("le", "la", "et", "merge"),
    "de": ("der", "die", "und", "hash"),
}

STOPWORDS = ("the", "a", "and", "of", "to")

FINGERPRINT_MOD = 1_000_000_007


def tokens(col: Column | str) -> Column:
    return F.split(col if isinstance(col, Column) else F.col(col), " ")


def with_text_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: token counts, lengths, stopword/unique
    ratios. Integer counts + single deterministic double divisions, so the
    result is bit-identical on any engine."""
    t = tokens(text_col)
    n_tok = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_uniq = F.size(F.array_distinct(t))
    n_chars = F.length(text_col)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            (n_chars - (n_tok - F.lit(1))).cast("double") / n_tok,
        )
        .withColumn("stopword_ratio", n_stop.cast("double") / n_tok)
        .withColumn("uniq_token_ratio", n_uniq.cast("double") / n_tok)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from the features (heuristic weights)."""
    q = with_text_quality(df, text_col)
    score = (
        F.least(F.col("n_tokens").cast("double") / 200.0, F.lit(1.0)) * 0.4
        + F.col("uniq_token_ratio") * 0.4
        + (1 - F.least(F.col("stopword_ratio") * 4, F.lit(1.0))) * 0.2
    )
    return q.withColumn("quality_score", F.round(score, 6))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/marker-frequency language heuristic.

    Counts marker-token hits per language and takes a deterministic argmax
    (ties break en > fr > de). Real corpora would use larger marker tables —
    the operator shape (per-row array ops, no shuffle) is the point.
    """
    t = tokens(text_col)

    def score(lang: str) -> Column:
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x)))

    s_en, s_fr, s_de = score("en"), score("fr"), score("de")
    pred = (
        F.when((s_en >= s_fr) & (s_en >= s_de), F.lit("en"))
        .when(s_fr >= s_de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return (
        df.withColumn("score_en", s_en)
        .withColumn("score_fr", s_fr)
        .withColumn("score_de", s_de)
        .withColumn("pred_lang", pred)
    )


def hash_sample(
    df: DataFrame,
    rate_pct: int,
    id_col: str = "doc_id",
    label: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sampling: keep a row iff its md5 bucket
    (0-99, salted by ``label``) falls below ``rate_pct``.

    Unlike ``df.sample()`` this is stable under repartitioning, retries,
    and engine versions — the property a reproducible training-data
    pipeline needs — and different ``label`` values give independent
    samples of the same corpus. Pure codegen, no shuffle; the companion
    of with_split's md5 train/val/test buckets.
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{label}:"), F.col(id_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return df.withColumn("sample_bucket", bucket).where(
        F.col("sample_bucket") < rate_pct
    )


def bigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram model: (w1, w2) -> count plus the w1 marginal.

    One explode + one groupBy (partial-aggregated map-side); the model
    table is vocabulary^2-bounded, tiny next to the corpus, and is the
    broadcastable artifact per-document scoring joins against.
    """
    toks = tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ex = df.where(F.size(toks) >= 2).select(
        F.explode(pairs).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    counts = ex.groupBy("w1", "w2").agg(F.count("*").alias("n_bigram"))
    marg = counts.groupBy("w1").agg(F.sum("n_bigram").alias("n_w1"))
    return counts.join(marg, "w1").select(
        "w1",
        "w2",
        "n_bigram",
        "n_w1",
        (F.col("n_bigram").cast("double") / F.col("n_w1")).alias("cond_prob"),
    )


def bigram_doc_score(
    df: DataFrame, model: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean conditional bigram probability under a corpus
    bigram LM — the division-free-perplexity proxy for fluency/quality
    scoring (log-space perplexity needs ln(), which is not bit-portable
    across engines; the mean probability ranks documents the same way
    for filtering).

    The model broadcasts (vocabulary-sized); each document explodes to
    its bigrams, joins the model, and averages deterministically: every
    cond_prob is one IEEE division, quantized per-row to an int64
    (floor(p * 1e15) — double->decimal casts drift 1 ulp across engines,
    integer quantization does not), summed order-free as integers, then
    unscaled with two more IEEE divisions — bit-identical cross-engine
    despite being floating-point.
    """
    toks = tokens(text_col)
    pairs = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    ex = df.where(F.size(toks) >= 2).select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    scored = ex.join(
        F.broadcast(model.select("w1", "w2", "cond_prob")), ["w1", "w2"]
    )
    quant = F.floor(F.col("cond_prob") * F.lit(1e15)).cast("long")
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        (
            F.sum(quant).cast("double")
            / F.count("*").cast("double")
            / F.lit(1e15)
        ).alias("mean_cond_prob"),
    )


def perplexity_buckets(
    df: DataFrame,
    model: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style (Wenzek et al. 2020) per-language quality bucketing:
    score every document under the corpus LM (:func:`bigram_doc_score`),
    then NTILE the scores *within each language* into ``n_buckets``
    quantile buckets — bucket 1 is the most-fluent "head", the last is
    the "tail" (CCNet trains on head/middle and drops tail). Per-language
    partitioning matters: absolute LM scores are not comparable across
    languages, ranks within one are.

    Scale shape: the model broadcasts, scoring is one corpus pass, and
    the NTILE window shuffles only (id, lang, score) rows — ~24 bytes per
    document, never the text. Ties break on ascending id so the bucket
    boundary is deterministic and oracle-checkable.
    """
    from pyspark.sql import Window

    scores = bigram_doc_score(df, model, text_col=text_col, id_col=id_col)
    # LEFT join: a doc with < 2 tokens (or nothing the LM matched) has no
    # score row, but it must still be bucketed — NULLS LAST puts exactly
    # those degenerate docs in the tail, where a curation split wants
    # them, instead of silently dropping them from the keep/drop decision
    scored = df.select(id_col, lang_col).join(scores, id_col, "left")
    w = Window.partitionBy(lang_col).orderBy(
        F.col("mean_cond_prob").desc_nulls_last(), F.asc(id_col)
    )
    return scored.withColumn("bucket", F.ntile(n_buckets).over(w))


# PII patterns shared by the Spark plan and the SQL oracle: the subset of
# regex syntax on which Java's engine and RE2 agree (char classes, bounded
# repetition, \b, non-capturing groups)
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b555-[0-9]{3,4}\b", "[PHONE]"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IP]"),
)


def with_pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction: per-row match counts for email / phone /
    IPv4 patterns and a ``clean_text`` column with matches replaced by
    typed placeholders (applied in fixed email -> phone -> ip order so the
    output is well-defined when patterns could overlap).

    Pure regexp expressions inside codegen — no UDF, no shuffle; at 100 TB
    this runs at scan speed column-pruned to (id, text). The pattern list
    deliberately sticks to the Java-regex/RE2 common subset so the same
    literals drive both the Spark plan and the DuckDB oracle.
    """
    out = df
    clean = F.col(text_col)
    for name, pat, rep in PII_PATTERNS:
        out = out.withColumn(f"n_{name}s", F.regexp_count(text_col, F.lit(pat)))
        clean = F.regexp_replace(clean, pat, rep)
    return out.withColumn("clean_text", clean)


def token_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token frequency: explode -> count. The one shuffle in this
    module; partial (map-side) aggregation keeps shuffle volume at
    O(distinct tokens per task), not O(total tokens)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic rolling polynomial hash over characters
    (acc*31 + ascii(ch) mod 1e9+7) — a content fingerprint for
    shift-tolerant exact-dup detection; pure JVM fold, no UDF."""
    fp = F.aggregate(
        F.transform(F.split(F.col(text_col), ""), lambda c: F.coalesce(F.ascii(c), F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit(FINGERPRINT_MOD)),
    )
    return df.withColumn("fingerprint", fp)


def token_count_bpe_ish(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Approximate LLM-token count: whitespace tokens plus a BPE-ish
    regex split on punctuation/digit boundaries (over-counts long words
    like real subword tokenizers do)."""
    pieces = F.split(
        F.regexp_replace(F.col(text_col), r"([0-9]+|[^\w\s]+)", r" $1 "), r"\s+"
    )
    nonempty = F.filter(pieces, lambda x: x != "")
    # long words count as ceil(len/6) subword pieces
    subword = F.aggregate(
        nonempty,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(6.0)).cast("long"),
    )
    return df.withColumn("n_ws_tokens", F.size(nonempty)).withColumn(
        "n_subword_tokens", subword
    )


def ngram_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Gopher-style repetition signals per document: total word k-grams,
    distinct k-grams, the most frequent k-gram's count, and the duplicate-
    gram fraction.

    Entirely per-row array expressions — ZERO shuffles: the top-gram count
    folds over the *sorted* gram array tracking (prev, run-length, best),
    O(n log n) per document inside whole-stage codegen, instead of the
    explode -> groupBy form whose shuffle volume is O(total grams) at
    100 TB. Documents scoring high dup_fraction are boilerplate/spam —
    the standard pre-training repetition filter."""
    toks = tokens(text_col)
    n = F.size(toks)
    grams = F.when(n < k, F.array(F.col(text_col))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    g = df.select(F.col(id_col), grams.alias("__g"))
    # max run length over the sorted grams == count of the most frequent gram
    top = F.expr(
        "aggregate(array_sort(__g), "
        "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', if(x <=> acc.prev, acc.run + 1, 1L), "
        "  'best', greatest(acc.best, if(x <=> acc.prev, acc.run + 1, 1L))), "
        "acc -> acc.best)"
    )
    return g.select(
        id_col,
        F.size("__g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("__g")).cast("long").alias("n_distinct"),
        top.alias("top_count"),
        (
            (F.size("__g") - F.size(F.array_distinct("__g"))).cast("double")
            / F.size("__g")
        ).alias("dup_fraction"),
    )


def with_split(
    df: DataFrame, id_col: str = "doc_id", train: int = 80, val: int = 10
) -> DataFrame:
    """Deterministic content-independent train/validation/test assignment:
    md5(id) -> 16-bit bucket -> percentile. Pure per-row expressions, so the
    split is stable under re-partitioning, re-ingestion, and engine version
    changes — the property that makes held-out sets trustworthy at 100 TB
    (sampling by rand() is not reproducible across runs/executors)."""
    b = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("bigint") % 100
    split = (
        F.when(b < train, F.lit("train"))
        .when(b < train + val, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def filter_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stopwords: int = 2,
    min_uniq_ratio: float = 0.2,
    max_top_token_frac: float = 0.1,
) -> DataFrame:
    """Gopher/C4-style rule-based filter audit: per-document signals, one
    boolean per rule, and the final keep decision — the "why was this doc
    dropped" report a curation pipeline ships next to its filtered output
    (Rae et al. 2021 §A1.1 quality heuristics, Raffel et al. 2020 §2.2).

    Every signal is a per-row array expression (tokens never explode, no
    shuffle — the report runs at parquet scan bandwidth at any corpus
    size). top_token_frac is computed O(n·distinct) per row via a nested
    higher-order function, trading per-row CPU for zero data movement —
    the right trade at 100 TB where the shuffle, not the core, is scarce.
    """
    tk = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(tk)
    sum_len = F.aggregate(
        F.transform(tk, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    mean_wl = sum_len.cast("double") / n.cast("double")
    stop_n = F.size(F.filter(tk, lambda x: F.array_contains(stop_arr, x)))
    uniq_ratio = F.size(F.array_distinct(tk)).cast("double") / n.cast("double")
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(tk),
                lambda t: F.size(F.filter(tk, lambda x: x == t)),
            )
        ).cast("double")
        / n.cast("double")
    )
    out = df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        stop_n.cast("bigint").alias("stopword_count"),
        uniq_ratio.alias("uniq_ratio"),
        top_frac.alias("top_token_frac"),
    )
    r_len = (F.col("n_tokens") < min_tokens) | (F.col("n_tokens") > max_tokens)
    r_wl = (F.col("mean_word_len") < min_mean_word_len) | (
        F.col("mean_word_len") > max_mean_word_len
    )
    r_stop = F.col("stopword_count") < min_stopwords
    r_uniq = F.col("uniq_ratio") < min_uniq_ratio
    r_rep = F.col("top_token_frac") > max_top_token_frac
    return out.select(
        "*",
        r_len.alias("r_length"),
        r_wl.alias("r_word_len"),
        r_stop.alias("r_stopword"),
        r_uniq.alias("r_uniq"),
        r_rep.alias("r_repetition"),
        (~(r_len | r_wl | r_stop | r_uniq | r_rep)).alias("keep"),
    )


def unigram_oov(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 20,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` unigram vocabulary (count desc, token asc ties).

    The tokenizer-coverage signal a curation pipeline tracks: documents
    full of tokens the target vocabulary lacks will fragment into long
    byte-level sequences. Plan: one count aggregation builds the
    vocabulary (vocabulary-bounded, tiny), which broadcasts back onto the
    exploded token stream — the corpus shuffles once for the per-doc
    re-aggregation, never for the join.
    """
    ex = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("w"))
    vocab = (
        ex.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(vocab_size)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    joined = ex.join(F.broadcast(vocab), "w", "left")
    n_oov = F.sum(
        F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    ).cast("bigint")
    return joined.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        n_oov.alias("n_oov"),
        (n_oov.cast("double") / F.count("*").cast("double")).alias("oov_rate"),
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, SIGMOD —
    the MOSS plagiarism-detection primitive): hash every k-token gram
    with the engine's rolling polynomial hash, slide a window of ``w``
    consecutive gram hashes, and select each window's minimum (leftmost
    on ties — first-occurrence semantics both engines share via
    array_position/list_position). The guarantee: any shared token run
    of length >= w + k - 1 contributes at least one COMMON selected
    fingerprint, at ~1/w the density of storing every gram — the
    shift-tolerant sketch for partial-copy detection at corpus scale.

    Pure Catalyst higher-order functions — no shuffle, no Python; one
    narrow pass per document. Documents shorter than k tokens fall back
    to a single whole-text gram (word_shingles convention). Returns
    (.., n_grams, n_windows, n_selected, fp_sum) where fp_sum is the
    int64 sum of the DISTINCT selected (position, hash) pairs' hashes —
    order-independent, so exactly oracle-checkable."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n = F.size(toks)
    gram_txts = F.when(
        n < k, F.array(F.col(text_col))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )
    )
    roll = lambda g: F.aggregate(  # noqa: E731
        F.transform(F.split(g, ""), lambda c: F.coalesce(F.ascii(c), F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit(FINGERPRINT_MOD)),
    )
    out = df.withColumn("__h", F.transform(gram_txts, roll))
    m = F.size(F.col("__h"))
    n_win = F.greatest(F.lit(1), m - w + 1)
    # (pos, hash) encoded as one int64 key = pos * MOD + hash (hash < MOD,
    # pos corpus-bounded, product far under 2^63) so the distinct runs on
    # plain longs — portable to engines without struct-list distinct
    sel = F.transform(
        F.sequence(F.lit(1), n_win),
        lambda j: (
            j
            + F.array_position(
                F.slice(F.col("__h"), j, w),
                F.array_min(F.slice(F.col("__h"), j, w)),
            )
            - 1
        ).cast("long")
        * F.lit(FINGERPRINT_MOD)
        + F.array_min(F.slice(F.col("__h"), j, w)),
    )
    distinct_sel = F.array_distinct(sel)
    return (
        out.withColumn("n_grams", m.cast("int"))
        .withColumn("n_windows", n_win.cast("int"))
        .withColumn("__sel", distinct_sel)
        .withColumn("n_selected", F.size("__sel").cast("int"))
        .withColumn(
            "fp_sum",
            F.aggregate(
                F.col("__sel"),
                F.lit(0).cast("long"),
                lambda acc, s: acc + F.pmod(s, F.lit(FINGERPRINT_MOD)),
            ),
        )
        # the sketch itself: sorted distinct selected hashes — the column
        # a partial-copy detector explodes and self-joins on (two docs
        # sharing a >= w+k-1 token run share at least one entry)
        .withColumn(
            "fps",
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.col("__sel"),
                        lambda s: F.pmod(s, F.lit(FINGERPRINT_MOD)),
                    )
                )
            ),
        )
        .drop("__h", "__sel")
    )


def chunk_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-ingestion chunking: sliding token windows of ``window``
    whitespace tokens every ``stride`` tokens (``window - stride`` tokens
    of overlap so no retrieval-relevant span straddles a chunk boundary
    unseen). Chunk count per doc is the standard sliding-window formula
    ``1 + ceil(max(0, n - window) / stride)`` — the final window is the
    only short one, and a doc at most ``window`` tokens long yields
    exactly one chunk. Zero-token docs yield no rows.

    Returns one row per chunk: (id, chunk_id, start_token,
    n_chunk_tokens, chunk_text, n_chunk_chars).

    Plan shape: pure Catalyst (split / sequence / posexplode / slice) —
    no shuffle, no Python; at 100 TB this is a scan-bandwidth map with
    output fan-out ~n_tokens/stride per document, the shape an embedding
    stage consumes partition-parallel.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    n = F.size(F.col("__toks"))
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1)
        + F.floor((n - window + stride - 1) / F.lit(stride)).cast("int")
    )
    chunk_toks = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, window
    )
    return (
        df.select(F.col(id_col), toks.alias("__toks"))
        .where(F.size("__toks") > 0)
        .select(
            id_col,
            "__toks",
            F.posexplode(
                F.sequence(F.lit(0), n_chunks - 1)
            ).alias("chunk_id", "__s"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            (F.col("chunk_id") * stride).cast("int").alias("start_token"),
            F.size(chunk_toks).cast("int").alias("n_chunk_tokens"),
            F.array_join(chunk_toks, " ").alias("chunk_text"),
        )
        .withColumn("n_chunk_chars", F.length("chunk_text").cast("int"))
    )


def markup_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Markup/boilerplate signals (the C4 'remove pages with code or
    markup' heuristics, Raffel et al. 2020 sec. 2.2): URL and HTML-tag
    counts, code-brace and table-pipe density, digit ratio, ALL-CAPS
    token ratio, and a composite ``looks_markup`` flag. Complements
    :func:`filter_report` (token-shape rules) with the source-cleanliness
    rules — together they are the full pre-training page filter.

    Pure per-row regexp/char expressions inside codegen — no UDF, no
    shuffle; at 100 TB this runs at parquet scan bandwidth.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    def char_count(c: str) -> Column:
        return (n_chars - F.length(F.replace(t, F.lit(c), F.lit("")))).cast(
            "int"
        )

    tk = F.filter(F.split(t, " "), lambda x: x != "")
    n_tokens = F.size(tk)
    n_caps = F.size(F.filter(tk, lambda x: x.rlike("^[A-Z]{2,}$")))
    n_urls = F.regexp_count(t, F.lit(r"https?://[^ ]+")).cast("int")
    n_tags = F.regexp_count(t, F.lit(r"<[a-zA-Z][^>]*>")).cast("int")
    n_digits = F.regexp_count(t, F.lit(r"[0-9]")).cast("int")
    digit_ratio = n_digits.cast("double") / n_chars.cast("double")
    caps_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        n_caps.cast("double") / n_tokens.cast("double")
    )
    n_braces = char_count("{") + char_count("}")
    n_pipes = char_count("|")
    return df.select(
        id_col,
        n_urls.alias("n_urls"),
        n_tags.alias("n_tags"),
        n_braces.cast("int").alias("n_braces"),
        n_pipes.alias("n_pipes"),
        n_digits.alias("n_digits"),
        digit_ratio.alias("digit_ratio"),
        n_caps.cast("int").alias("n_caps_tokens"),
        caps_ratio.alias("caps_ratio"),
        (
            (n_tags >= 2)
            | (n_urls >= 3)
            | (n_braces >= 4)
            | (digit_ratio > 0.3)
        ).alias("looks_markup"),
    )
