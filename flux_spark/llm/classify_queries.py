"""Trainable text classification + corpus statistics: nearest-centroid
language classifier, readability scoring, stratified k-fold assignment,
and PMI-style collocation mining.

These are the "model-in-the-loop" curation operators of an LLM data
pipeline: a cheap count-based classifier trained on one slice and scored
on another (the fastText-quality-filter shape), a readability score for
quality bucketing, reproducible cross-validation folds, and collocation
mining for tokenizer/vocab diagnostics.

Determinism contract (see ``analytics/registry.py``): no ``ln()`` in any
gated output — log-space scoring is replaced by integer-quantized
frequency weights (``floor(1e15 * n_wc / n_c)``: two IEEE double ops +
floor, bit-identical on both engines) summed exactly as BIGINT. Ratios
in outputs are single IEEE divisions of exact integers.

Every entry registers into ``LLM_QUERIES`` on import (same pattern as
``text_queries.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics.registry import _DEC, load_table, register
from . import text
from .queries import LLM_QUERIES
from .text_queries import _BIGRAM_CTES


def _hash_bucket(col, buckets: int = 10):
    """Deterministic md5-based bucket in [0, buckets) — the repo-standard
    split hash (same construction as the HLL register hash)."""
    hv = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return hv % buckets


_SPLIT_SQL = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 10"
)


@register(
    LLM_QUERIES,
    "doc_centroid_langid",
    f"""
    WITH split AS (
      SELECT doc_id, lang, text, {_SPLIT_SQL} AS h FROM documents),
    train AS (SELECT lang, text FROM split WHERE h >= 3),
    test AS (SELECT doc_id, lang AS true_lang, text FROM split WHERE h < 3),
    tok AS (SELECT lang, unnest(string_split(text, ' ')) AS token FROM train),
    cnt AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n_wc
            FROM tok GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(SUM(n_wc) AS BIGINT) AS n_c FROM cnt GROUP BY 1),
    vocab AS (SELECT DISTINCT token FROM cnt),
    w AS (
      SELECT v.token, t.lang,
             CAST(floor(1e15 * CAST(COALESCE(c.n_wc, 0) AS DOUBLE)
                        / CAST(t.n_c AS DOUBLE)) AS BIGINT) AS wt
      FROM vocab v CROSS JOIN tot t
      LEFT JOIN cnt c ON c.lang = t.lang AND c.token = v.token),
    ttok AS (SELECT doc_id, true_lang,
                    unnest(string_split(text, ' ')) AS token FROM test),
    scores AS (
      SELECT tt.doc_id, tt.true_lang, w.lang,
             CAST(SUM(w.wt) AS BIGINT) AS score
      FROM ttok tt JOIN w ON w.token = tt.token
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT doc_id, true_lang, lang AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM scores)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
    "TRAINED nearest-centroid (Rocchio) language classifier: per-class "
    "token relative frequencies learned on a 70% md5-hash split, held-out "
    "30% scored by exact integer sums of quantized weights "
    "(floor(1e15 * n_wc / n_c) — ln() is not bit-portable, quantized "
    "frequency weights are), argmax with lexicographic tie-break; output "
    "is the confusion matrix. Scale shape: the model is vocab x langs "
    "(broadcastable), test tokens map-side join against it, per-doc "
    "partial-agg groupBy — no all-pairs, no driver data.",
)
def doc_centroid_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based trainable classifier over the documents table — the
    fastText-style quality/language filter shape of a curation pipeline
    (train on a labeled slice, score the rest). Test docs whose tokens
    are all out-of-vocabulary drop from the confusion matrix on both
    engines identically (inner token join)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    d = d.withColumn("h", _hash_bucket(F.col("doc_id")))
    train = d.where(F.col("h") >= 3)
    test = d.where(F.col("h") < 3).select(
        "doc_id", F.col("lang").alias("true_lang"), "text"
    )
    tok = train.select(
        "lang", F.explode(F.split("text", " ")).alias("token")
    )
    # r13 (guide §2.4): cnt is (vocab x langs)-sized and feeds three
    # consumers (class totals, vocab, the weight grid's left join) —
    # checkpoint it once instead of re-running the corpus scan +
    # explode + groupBy per consumer (4 documents scans in the before
    # plan, 1 after).
    cnt = (
        tok.groupBy("lang", "token")
        .agg(F.count("*").cast("bigint").alias("n_wc"))
        .localCheckpoint(eager=True)
    )
    tot = cnt.groupBy("lang").agg(F.sum("n_wc").cast("bigint").alias("n_c"))
    vocab = cnt.select("token").distinct()
    # dense vocab x langs weight grid so every in-vocab token contributes a
    # row per class (a sparse model would silently skip zero-count classes
    # and mis-rank); broadcastable — vocab x |langs| rows
    w = (
        vocab.crossJoin(F.broadcast(tot))
        .join(cnt, ["lang", "token"], "left")
        .select(
            "token",
            "lang",
            F.floor(
                F.lit(1e15)
                * F.coalesce("n_wc", F.lit(0)).cast("double")
                / F.col("n_c").cast("double")
            )
            .cast("bigint")
            .alias("wt"),
        )
    )
    ttok = test.select(
        "doc_id", "true_lang", F.explode(F.split("text", " ")).alias("token")
    )
    scores = (
        ttok.join(F.broadcast(w), "token")
        .groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum("wt").cast("bigint").alias("score"))
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang")
    )
    pred = scores.select(
        "true_lang",
        F.col("lang").alias("pred_lang"),
        F.row_number().over(win).alias("rn"),
    ).where(F.col("rn") == 1)
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


@register(
    LLM_QUERIES,
    "doc_readability",
    """
    WITH m AS (
      SELECT source,
        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
          AS n_words,
        CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
          AS n_sents,
        CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
          AS n_syll
      FROM documents),
    per AS (
      SELECT source, n_words,
        206.835
          - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
          - 84.6 * (CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE))
          AS flesch
      FROM m WHERE n_words > 0)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CAST(flesch AS DECIMAL(25,6))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS avg_flesch,
      CAST(SUM(CASE WHEN flesch >= 60.0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_easy
    FROM per GROUP BY source
    """,
    "per-source Flesch reading-ease scoring (syllables = vowel groups, "
    "sentences = terminal-punctuation runs clamped to >= 1): per-row IEEE "
    "double arithmetic is bit-identical across engines, the per-source "
    "mean goes through the DECIMAL sum contract. Zero-shuffle per-row "
    "codegen + one tiny partial-agg groupBy; readability is a standard "
    "quality-bucketing signal in curation pipelines.",
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source", "text")
    n_words = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    ).cast("bigint")
    n_sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    ).cast("bigint")
    n_syll = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
    ).cast("bigint")
    m = d.select(
        "source",
        n_words.alias("n_words"),
        n_sents.alias("n_sents"),
        n_syll.alias("n_syll"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syll").cast("double") / F.col("n_words").cast("double"))
    )
    per = m.where(F.col("n_words") > 0).select(
        "source", flesch.alias("flesch")
    )
    return per.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("flesch").cast(_DEC)).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_flesch"),
        F.sum(F.when(F.col("flesch") >= 60.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_easy"),
    )


@register(
    LLM_QUERIES,
    "doc_kfold_assign",
    """
    WITH ranked AS (
      SELECT lang, source,
        ROW_NUMBER() OVER (PARTITION BY lang, source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
          AS rn
      FROM documents),
    folds AS (
      SELECT lang, source, CAST((rn - 1) % 5 AS BIGINT) AS fold FROM ranked),
    counts AS (
      SELECT lang, source, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM folds GROUP BY 1, 2, 3)
    SELECT lang, source, fold, n_docs,
      (MAX(n_docs) OVER (PARTITION BY lang, source)
       - MIN(n_docs) OVER (PARTITION BY lang, source)) <= 1 AS balanced
    FROM counts
    """,
    "stratified 5-fold cross-validation assignment: within each "
    "(lang, source) stratum docs are ranked by md5(doc_id) (deterministic "
    "pseudo-shuffle, doc_id tie-break) and dealt round-robin into folds, "
    "so every stratum's folds differ by at most one doc — the output "
    "carries that balance invariant as a gated boolean. Scale shape: one "
    "window per stratum (parallel across strata), counts-only output.",
)
def doc_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "doc_id"
    )
    win = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    folds = d.select(
        "lang",
        "source",
        ((F.row_number().over(win) - 1) % 5).cast("bigint").alias("fold"),
    )
    counts = folds.groupBy("lang", "source", "fold").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    stratum = Window.partitionBy("lang", "source")
    return counts.select(
        "lang",
        "source",
        "fold",
        "n_docs",
        (
            (F.max("n_docs").over(stratum) - F.min("n_docs").over(stratum))
            <= 1
        ).alias("balanced"),
    )


@register(
    LLM_QUERIES,
    "doc_pmi_collocations",
    _BIGRAM_CTES
    + """,
    tot AS (SELECT CAST(SUM(n_bigram) AS BIGINT) AS n_pairs FROM counts),
    m2 AS (SELECT w2, CAST(SUM(n_bigram) AS BIGINT) AS n_w2
           FROM counts GROUP BY 1),
    lift AS (
      SELECT c.w1, c.w2, c.n_bigram, m.n_w1, m2.n_w2,
        CAST(c.n_bigram AS DOUBLE) * CAST(t.n_pairs AS DOUBLE)
          / (CAST(m.n_w1 AS DOUBLE) * CAST(m2.n_w2 AS DOUBLE)) AS lift
      FROM counts c
      JOIN marg m USING (w1) JOIN m2 USING (w2) CROSS JOIN tot t
      WHERE c.n_bigram >= 20)
    SELECT w1, w2, n_bigram, n_w1, n_w2, lift
    FROM lift ORDER BY lift DESC, w1, w2 LIMIT 50
    """,
    "collocation mining: top-50 adjacent word pairs by pointwise lift "
    "(n_ab * N / (n_a * n_b) — the exp of PMI, kept as one IEEE "
    "expression over exact BIGINT counts because ln() is not "
    "bit-portable), min-count 20 support floor, deterministic "
    "(lift, w1, w2) ordering. Scale shape: bigram counts partial-agg "
    "map-side to O(vocab^2)-bounded rows; marginals and the total are "
    "tiny rollups of that; top-50 is driver-sized.",
)
def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer/vocab diagnostic: collocations that should survive as
    merged tokens rank highest. Support floor is an absolute count (20)
    tuned for the gate SF; at corpus scale make it relative
    (n_ab >= alpha * N) so the floor tracks data volume."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # r13 (guide §2.4): bigram-vocab-sized and read by three consumers
    # (grand total, right-word marginals, the lift projection) — one
    # checkpoint replaces three corpus scans + bigram explodes.
    counts = (
        text.bigram_counts(d)
        .select("w1", "w2", "n_bigram", "n_w1")
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(F.sum("n_bigram").cast("bigint").alias("n_pairs"))
    m2 = counts.groupBy("w2").agg(
        F.sum("n_bigram").cast("bigint").alias("n_w2")
    )
    lift = (
        counts.where(F.col("n_bigram") >= 20)
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_bigram",
            "n_w1",
            "n_w2",
            (
                F.col("n_bigram").cast("double")
                * F.col("n_pairs").cast("double")
                / (
                    F.col("n_w1").cast("double")
                    * F.col("n_w2").cast("double")
                )
            ).alias("lift"),
        )
    )
    return lift.orderBy(
        F.col("lift").desc(), F.col("w1"), F.col("w2")
    ).limit(50)


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (iterative merge learning) — r8 session 5
# ---------------------------------------------------------------------------

_N_MERGES = 8
_SEP = "\x1f"  # unit separator; never appears in whitespace-split tokens


def _bpe_train_sql(n_merges: int = _N_MERGES) -> str:
    """Unrolled-SQL twin of the Spark BPE training loop: one
    (pair-count -> argmax -> re-segment) CTE block per merge. The
    re-segmentation fold runs inside list_reduce with a chr(31)-joined
    string accumulator (DuckDB's reduce requires acc type = element
    type); greedy left-to-right non-overlap falls out of the
    last-symbol suffix check — a merged symbol a||b can never equal the
    left symbol a, so no explicit "just merged" flag is needed."""
    blocks = [
        """
    WITH words AS (
      SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> '' GROUP BY 1),
    seg0 AS (
      SELECT word, cnt,
        list_transform(range(1, length(word) + 1),
                       i -> substring(word, i, 1)) AS seg
      FROM words)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"seg{i - 1}"
        blocks.append(
            f"""
    pc{i} AS (
      SELECT p.l, p.r, CAST(SUM(s.cnt) AS BIGINT) AS n
      FROM {prev} s
      CROSS JOIN UNNEST(list_transform(range(1, len(s.seg)), j ->
          struct_pack(l := s.seg[j], r := s.seg[j + 1]))) AS t(p)
      GROUP BY 1, 2),
    best{i} AS (SELECT l, r, n FROM pc{i} ORDER BY n DESC, l, r LIMIT 1),
    seg{i} AS (
      SELECT s.word, s.cnt,
        string_split(
          list_reduce(s.seg, (acc, x) -> CASE
            WHEN length(acc) >= length(b.l)
             AND substring(acc, length(acc) - length(b.l) + 1) = b.l
             AND (length(acc) = length(b.l)
                  OR substring(acc, length(acc) - length(b.l), 1) = chr(31))
             AND x = b.r
            THEN substring(acc, 1, length(acc) - length(b.l)) || b.l || b.r
            ELSE acc || chr(31) || x END),
          chr(31)) AS seg
      FROM {prev} s CROSS JOIN best{i} b)"""
        )
    union = "\n    UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"n AS pair_count FROM best{i}"
        for i in range(1, n_merges + 1)
    )
    return ",".join(blocks) + f"\n    {union}\n    ORDER BY merge_rank"


@register(
    LLM_QUERIES,
    "doc_bpe_train",
    _bpe_train_sql(),
    "byte-pair-encoding tokenizer TRAINING (not just application): 8 "
    "merge rounds learned from scratch over the corpus word-frequency "
    "table — per round, count weighted adjacent symbol pairs, take the "
    "argmax (count desc, then lexicographic — fully deterministic), and "
    "re-segment every word by a greedy left-to-right fold; the gate "
    "hashes the learned merge table (rank, left, right, count). Scale "
    "shape: training state is the DISTINCT-word table (vocabulary-"
    "sized, not corpus-sized — the corpus is touched once for word "
    "counts); each round is one partial-agg pair count + a 1-row argmax "
    "collect + one vocabulary-pass fold, lineage truncated per round.",
)
def doc_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing half of the tokenizer stack next to
    doc_wordpiece_tokenize (application) and doc_bpe_pair_stats (one
    round of statistics): an actual iterated training loop, the same
    algorithm as Sennrich et al.'s subword-nmt learn_bpe, driver loop
    bounded at _N_MERGES with one metadata-sized collect per round."""
    d = load_table(spark, sf_dir, "documents").select("text")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # per-char segmentation: substring(word, i, 1) needs i as a column,
    # which F.substring doesn't accept — use the SQL expression form
    seg = words.select(
        "word",
        "cnt",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("seg"),
        # r13 (guide §1.2): lazy checkpoint — each round's argmax job
        # materializes the previous round's re-segmentation as a side
        # effect, halving the serial job count (the final round's
        # segmentation, which nothing reads, is never computed at all).
    ).localCheckpoint(eager=False)
    merges = []
    for rank in range(1, _N_MERGES + 1):
        pairs = seg.where(F.size("seg") >= 2).select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(seg) - 1), "
                    "j -> struct(element_at(seg, j) AS l, "
                    "element_at(seg, j + 1) AS r))"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .orderBy(F.col("n").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append((rank, a, b, n))
        la = F.lit(a)
        lb = F.lit(b)
        sep = F.lit(_SEP)

        def make_step(la, lb, sep):
            def step(acc, x):
                return _bpe_step(acc, x, la, lb, sep)

            return step

        def _bpe_step(acc, x, la, lb, sep):
            suffix_is_a = (
                (F.length(acc) >= F.length(la))
                & (
                    F.substring(
                        acc, (F.length(acc) - F.length(la) + 1).cast("int"), 1000000
                    )
                    == la
                )
                & (
                    (F.length(acc) == F.length(la))
                    | (
                        F.substring(
                            acc,
                            (F.length(acc) - F.length(la)).cast("int"),
                            1,
                        )
                        == sep
                    )
                )
            )
            merged = F.concat(
                F.substring(acc, 1, (F.length(acc) - F.length(la)).cast("int")),
                la,
                lb,
            )
            return F.when(suffix_is_a & (x == lb), merged).otherwise(
                F.concat(acc, sep, x)
            )

        seg = seg.select(
            "word",
            "cnt",
            F.split(
                F.aggregate(
                    F.slice("seg", 2, F.size("seg") - 1),
                    F.element_at("seg", 1),
                    make_step(la, lb, sep),
                ),
                _SEP,
            ).alias("seg"),
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_count bigint"
    ).orderBy("merge_rank")


# ---------------------------------------------------------------------------
# safety / blocklist screening — r8 session 5
# ---------------------------------------------------------------------------

# deterministic synthetic blocklist (the fixture's word-soup corpus has no
# real unsafe content; per the PII-scrub precedent the gate AUGMENTS the
# corpus with planted terms so the matcher arithmetic is value-checked)
_BLOCKLIST = ("gambleword", "exploitword", "malwareword")
_BL_SQL = "['" + "', '".join(_BLOCKLIST) + "']"


@register(
    LLM_QUERIES,
    "doc_safety_screen",
    f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents WHERE doc_id % 13 <> 0
      UNION ALL
      SELECT doc_id, source,
        text || ' ' || (['gambleword', 'exploitword',
                         'malwareword'])[1 + CAST(doc_id % 3 AS INTEGER)]
          || CASE WHEN doc_id % 26 = 0 THEN ' malwareword' ELSE '' END
      FROM documents WHERE doc_id % 13 = 0),
    scored AS (
      SELECT source,
        len(list_filter(string_split(text, ' '),
            x -> list_contains({_BL_SQL}, x))) AS n_hits,
        len(string_split(text, ' ')) AS n_tokens
      FROM corpus)
    SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_flagged,
      CAST(SUM(n_hits) AS BIGINT) AS total_hits,
      CAST(SUM(CASE WHEN CAST(n_hits AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE) > 0.05
               THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM scored GROUP BY source
    """,
    "safety/blocklist screening (the toxicity-filter shape of a curation "
    "pipeline): token-exact blocklist hits per document, per-source "
    "flag counts, and a density rule (> 5% blocklisted tokens = drop, "
    "not just flag — density separates a mention from saturation). The "
    "gate plants deterministic blocklist terms on every 13th doc (one "
    "term, doubled on every 26th) so hit counting, density division, "
    "and the drop threshold are all value-hashed. Zero-shuffle per-row "
    "array codegen + one counts-only rollup; the blocklist is a "
    "codegen literal (broadcast a table past ~10k terms).",
)
def doc_safety_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    clean = d.where(F.col("doc_id") % 13 != 0)
    planted_term = F.element_at(
        F.array(*[F.lit(t) for t in _BLOCKLIST]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    planted = d.where(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit(" "),
            planted_term,
            F.when(F.col("doc_id") % 26 == 0, F.lit(" malwareword"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    corpus = clean.unionByName(planted)
    bl = F.array(*[F.lit(t) for t in _BLOCKLIST])
    toks = F.split("text", " ")
    n_hits = F.size(
        F.filter(toks, lambda x: F.array_contains(bl, x))
    )
    scored = corpus.select(
        "source",
        n_hits.alias("n_hits"),
        F.size(toks).alias("n_tokens"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("n_hits").cast("bigint").alias("total_hits"),
        F.sum(
            F.when(
                F.col("n_hits").cast("double")
                / F.col("n_tokens").cast("double")
                > 0.05,
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    LLM_QUERIES,
    "doc_zipf_fit",
    """
    WITH freq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok),
    ranked AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rnk,
             c
      FROM freq),
    pts AS (
      SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
             CAST(length(bin(c)) - 1 AS BIGINT) AS y
      FROM ranked),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts)
    SELECT k AS n_tokens,
      CAST(k * sxy - sx * sy AS DOUBLE)
        / CAST(k * sxx - sx * sx AS DOUBLE) AS zipf_slope,
      (CAST(sy AS DOUBLE)
       - CAST(k * sxy - sx * sy AS DOUBLE)
         / CAST(k * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        / CAST(k AS DOUBLE) AS intercept
    FROM sums
    """,
    "Zipf power-law fit over the corpus token frequencies: OLS slope of "
    "floor(log2 count) on floor(log2 rank), where floor(log2 n) = "
    "bit_length - 1 (length(bin(n)) - 1 — an INTEGER log that sidesteps "
    "the non-portable ln entirely); all cross-products exact BIGINT, "
    "doubles only in the two final divisions. A healthy natural corpus "
    "fits slope ~ -1; synthetic or deduplicated-to-death corpora "
    "flatten — a cheap corpus-health diagnostic. One token partial-agg "
    "+ a vocabulary-sized window.",
)
def doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("text")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    from ..analytics.operators import attach_global_order

    # vocabulary rank via the two-pass range-partition pattern (r9):
    # web-scale vocabularies run to billions of rare tokens, so even
    # this "model-sized" window gets the no-single-partition form
    ranked = attach_global_order(
        freq, [F.col("c").desc(), F.col("tok").asc()], row_alias="__r"
    )
    pts = ranked.select(
        (F.length(F.bin(F.col("__r"))) - 1).cast("bigint").alias("x"),
        (F.length(F.bin(F.col("c"))) - 1).cast("bigint").alias("y"),
    )
    sums = pts.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return sums.select(
        F.col("k").alias("n_tokens"),
        slope.alias("zipf_slope"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("k").cast("double")
        ).alias("intercept"),
    )


@register(
    LLM_QUERIES,
    "doc_ngram_rank_langid",
    f"""
    WITH split AS (
      SELECT doc_id, lang, text, {_SPLIT_SQL} AS h FROM documents),
    tri_train AS (
      SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
        SELECT lang, substring(text, i, 3) AS g
        FROM split CROSS JOIN UNNEST(range(1, length(text) - 1)) AS u(i)
        WHERE h >= 3)
      GROUP BY 1, 2),
    prof AS (
      SELECT lang, g, CAST(rnk AS BIGINT) AS lang_rank FROM (
        SELECT lang, g,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rnk
        FROM tri_train)
      WHERE rnk <= 40),
    tri_doc AS (
      SELECT doc_id, lang AS true_lang, g, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        SELECT doc_id, lang, substring(text, i, 3) AS g
        FROM split CROSS JOIN UNNEST(range(1, length(text) - 1)) AS u(i)
        WHERE h < 3)
      GROUP BY 1, 2, 3),
    dprof AS (
      SELECT doc_id, true_lang, g, CAST(rnk AS BIGINT) AS doc_rank FROM (
        SELECT doc_id, true_lang, g,
          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rnk
        FROM tri_doc)
      WHERE rnk <= 20),
    langs AS (SELECT DISTINCT lang FROM prof),
    dist AS (
      SELECT d.doc_id, d.true_lang, l.lang,
        CAST(SUM(CASE WHEN p.lang_rank IS NULL THEN 40
                 ELSE abs(d.doc_rank - p.lang_rank) END) AS BIGINT) AS oop
      FROM dprof d CROSS JOIN langs l
      LEFT JOIN prof p ON p.lang = l.lang AND p.g = d.g
      GROUP BY 1, 2, 3),
    pred AS (
      SELECT doc_id, true_lang, lang AS pred_lang,
        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY oop, lang) AS rn
      FROM dist)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
    "Cavnar-Trenkle n-gram rank-profile language ID (the classic 1994 "
    "textcat algorithm, TRAINED on the 70% md5 split): per-language "
    "top-40 character-trigram rank profiles, per-doc top-20 profiles, "
    "out-of-place distance = sum of |rank differences| with a fixed "
    "miss penalty — ALL integer arithmetic (no ln, no floats anywhere), "
    "argmin with lexicographic ties; confusion-matrix gate. "
    "Complements doc_centroid_langid (frequency-weight scoring) with "
    "the rank-distance family. Scale shape: profiles are |langs| x 40 "
    "rows (broadcast); per-doc work is a 20-row x |langs| map-side "
    "join.",
)
def doc_ngram_rank_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    d = d.withColumn("h", _hash_bucket(F.col("doc_id")))
    tri = F.explode(
        F.expr(
            "transform(sequence(1, length(text) - 2),"
            " i -> substring(text, i, 3))"
        )
    )
    tri_train = (
        d.where(F.col("h") >= 3)
        .select("lang", tri.alias("g"))
        .groupBy("lang", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wl = Window.partitionBy("lang").orderBy(F.col("c").desc(), "g")
    prof = (
        tri_train.withColumn("rnk", F.row_number().over(wl))
        .where(F.col("rnk") <= 40)
        .select("lang", "g", F.col("rnk").cast("bigint").alias("lang_rank"))
    )
    tri_doc = (
        d.where(F.col("h") < 3)
        .select(
            "doc_id", F.col("lang").alias("true_lang"), tri.alias("g")
        )
        .groupBy("doc_id", "true_lang", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    wd = Window.partitionBy("doc_id").orderBy(F.col("c").desc(), "g")
    dprof = (
        tri_doc.withColumn("rnk", F.row_number().over(wd))
        .where(F.col("rnk") <= 20)
        .select(
            "doc_id",
            "true_lang",
            "g",
            F.col("rnk").cast("bigint").alias("doc_rank"),
        )
    )
    langs = prof.select("lang").distinct()
    dist = (
        dprof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(prof), ["lang", "g"], "left")
        .groupBy("doc_id", "true_lang", "lang")
        .agg(
            F.sum(
                F.when(F.col("lang_rank").isNull(), 40).otherwise(
                    F.abs(F.col("doc_rank") - F.col("lang_rank"))
                )
            )
            .cast("bigint")
            .alias("oop")
        )
    )
    wp = Window.partitionBy("doc_id").orderBy("oop", "lang")
    pred = dist.select(
        "true_lang",
        F.col("lang").alias("pred_lang"),
        F.row_number().over(wp).alias("rn"),
    ).where(F.col("rn") == 1)
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
