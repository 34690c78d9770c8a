"""Text-analysis queries: quality, PII, language-id, n-gram LMs, BPE stats, TF-IDF, token accounting, splits/sampling/packing, curation.

Split from ``llm/queries.py`` (registry hygiene, VERDICT r5 #6): shared
corpus augmentation (``dup_corpus`` / ``_CORPUS_CTE``) and ``_hexval``
stay in ``queries.py``; every entry here registers into the same
``LLM_QUERIES`` dict on import. See ``queries.py`` for the oracle-parity
contract all entries follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.registry import (
    PERSIST_MIN_INPUT_BYTES,
    input_bytes,
    load_table,
    register,
)
from . import dedup, text
from .dedup_queries import _minhash_lsh_sql
from .queries import LLM_QUERIES, _CORPUS_CTE, dup_corpus

# ---------------------------------------------------------------------------
# text-analysis queries
# ---------------------------------------------------------------------------

_STOP_LIST = "['" + "', '".join(text.STOPWORDS) + "']"


@register(
    LLM_QUERIES,
    "doc_quality_scores",
    f"""
    WITH feat AS (
      SELECT doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
          / len(string_split(text, ' ')) AS avg_token_len,
        CAST(len(list_filter(string_split(text, ' '),
                             x -> list_contains({_STOP_LIST}, x))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stopword_ratio,
        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / len(string_split(text, ' ')) AS uniq_token_ratio
      FROM documents)
    SELECT doc_id, n_tokens, avg_token_len, stopword_ratio, uniq_token_ratio,
      round(
        least(CAST(n_tokens AS DOUBLE) / CAST(200 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
        + uniq_token_ratio * CAST(0.4 AS DOUBLE)
        + (1 - least(stopword_ratio * 4, CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
      6) AS quality_score
    FROM feat
    """,
    "quality features + composite score (length/stopword/uniqueness ratios)",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_score(d).select(
        "doc_id",
        "n_tokens",
        "avg_token_len",
        "stopword_ratio",
        "uniq_token_ratio",
        "quality_score",
    )


# word-soup documents carry no natural PII, so the gate query appends
# deterministic synthetic PII (email/phone/ip derived from doc_id) in BOTH
# engines before scrubbing — the same augmentation trick as _EMB_AUG_CTE
_PII_AUG_CTE = """
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' today'
            ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
                 || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
    AS text
  FROM documents)
"""


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" call 555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"),
            F.lit(" today"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (did % 256).cast("string"),
            F.lit("."),
            ((did * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id", F.concat("text", email, phone, ip).alias("text")
    )


def _pii_sql() -> str:
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}s"
        for name, pat, _ in text.PII_PATTERNS
    )
    clean = "text"
    for _, pat, rep in text.PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{rep}', 'g')"
    return (
        _PII_AUG_CTE
        + f"SELECT doc_id, {counts}, {clean} AS clean_text FROM aug"
    )


@register(
    LLM_QUERIES,
    "doc_pii_scrub",
    _pii_sql(),
    "PII detection + redaction: email/phone/IPv4 match counts and typed-"
    "placeholder scrubbing over PII-augmented documents, pure codegen "
    "regexps on the Java-regex/RE2 common subset",
)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = text.with_pii_scrub(_pii_augmented(spark, sf_dir))
    return out.select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_phones").cast("long").alias("n_phones"),
        F.col("n_ips").cast("long").alias("n_ips"),
        "clean_text",
    )


@register(
    LLM_QUERIES,
    "doc_hash_sample",
    """
    SELECT * FROM (
      SELECT doc_id,
             CAST(('0x' || substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 100 AS sample_bucket
      FROM documents)
    WHERE sample_bucket < 10
    """,
    "deterministic ~10% Bernoulli sample via salted md5 buckets — stable "
    "under repartitioning/retries unlike rand()-based sampling",
)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return text.hash_sample(d, 10).select("doc_id", "sample_bucket")


def _curation_sql(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5,
                  max_bucket_size: int = 500) -> str:
    """Oracle for the full curation pipeline, near-dup stage included.

    The LSH CTEs mirror _minhash_lsh_sql but run over the quality+exact-dedup
    survivors AND apply the production bucket cap (QUALIFY count per
    (band, bhash) <= max_bucket_size) — the skew guard a 100 TB corpus needs
    against boilerplate mega-buckets. Deterministic on both engines, so the
    gate stays exact.
    """
    rows = num_hashes // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, m -> "
        f"(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) "
        f"+ {i} * CAST(('0x' || substring(m, 17, 8)) AS BIGINT)) % 4294967296))"
        for i in range(num_hashes)
    )
    return (
        _CORPUS_CTE
        + f"""
    , feat AS (
      SELECT doc_id, text,
        len(string_split(text, ' ')) AS n_tokens,
        CAST(len(list_filter(string_split(text, ' '),
                             x -> list_contains({_STOP_LIST}, x))) AS DOUBLE)
          / len(string_split(text, ' ')) AS stopword_ratio,
        CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
          / len(string_split(text, ' ')) AS uniq_token_ratio
      FROM corpus),
    scored AS (
      SELECT doc_id, text, n_tokens,
        round(
          least(CAST(n_tokens AS DOUBLE) / CAST(200 AS DOUBLE), CAST(1.0 AS DOUBLE)) * CAST(0.4 AS DOUBLE)
          + uniq_token_ratio * CAST(0.4 AS DOUBLE)
          + (1 - least(stopword_ratio * 4, CAST(1.0 AS DOUBLE))) * CAST(0.2 AS DOUBLE),
        6) AS quality_score
      FROM feat),
    keep AS (SELECT * FROM scored WHERE quality_score >= 0.5),
    canon AS (
      SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS m FROM keep),
    surv AS (
      SELECT doc_id, text, n_tokens, quality_score FROM canon WHERE doc_id = m),
    __toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM surv),
    __sh AS (
      SELECT doc_id,
        list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          ELSE list_transform(range(1, len(tk) - 1),
                              i -> array_to_string(tk[i:i+2], ' ')) END) AS sh
      FROM __toks),
    __sized AS (SELECT doc_id, sh, len(sh) AS n_sh FROM __sh),
    __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized),
    __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed),
    __bh AS (
      SELECT s.doc_id, r.band,
             md5(array_to_string(list_transform(
               s.sig[r.band*{rows}+1 : r.band*{rows}+{rows}],
               v -> CAST(v AS VARCHAR)), '|')) AS bhash
      FROM __sigs s CROSS JOIN (SELECT range AS band FROM range(0, {bands})) r
      QUALIFY COUNT(*) OVER (PARTITION BY r.band, bhash) <= {max_bucket_size}),
    __cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM __bh a JOIN __bh b
        ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id),
    __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized),
    __common AS (
      SELECT c.id_a, c.id_b, ea.n_sh AS na, eb.n_sh AS nb, COUNT(*) AS cc
      FROM __cand c
      JOIN __ex ea ON ea.doc_id = c.id_a
      JOIN __ex eb ON eb.doc_id = c.id_b AND eb.g = ea.g
      GROUP BY 1, 2, 3, 4),
    __dups AS (
      SELECT DISTINCT id_b FROM __common
      WHERE CAST(cc AS DOUBLE) / (na + nb - cc) >= {threshold})
    SELECT doc_id, n_tokens, quality_score,
      CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80 THEN 'train'
           WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'validation'
           ELSE 'test' END AS split
    FROM surv WHERE doc_id NOT IN (SELECT id_b FROM __dups)
    """
    )


@register(
    LLM_QUERIES,
    "doc_curation_pipeline",
    _curation_sql(),
    "end-to-end curation pipeline composition: quality filter -> exact "
    "dedup (canonical survivor per content) -> MinHash-LSH near-dup "
    "removal with the production bucket-size skew guard (500) -> "
    "deterministic split assignment, all pure DataFrame transforms over "
    "the duplicated corpus",
)
def doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = dup_corpus(spark, sf_dir)
    q = text.quality_score(d).where(F.col("quality_score") >= 0.5)
    w = Window.partitionBy("text")
    surv = (
        q.withColumn("__m", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("__m"))
        .select("doc_id", "text", "n_tokens", "quality_score")
    )
    # Near-dup removal with the skew guard ON — the production default:
    # a boilerplate (band, hash) bucket of k docs costs k^2 candidate
    # rows, quadratic at corpus scale; capping at 500 bounds any bucket's
    # contribution while leaving genuine near-dup buckets (tiny) intact.
    # Greedy survivor rule: drop every doc appearing as the larger id of
    # a verified pair (deterministic, engine-independent).
    pairs = dedup.minhash_lsh_pairs(surv, threshold=0.5, max_bucket_size=500)
    dup_ids = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = surv.join(dup_ids, "doc_id", "left_anti")
    return text.with_split(kept).select(
        "doc_id", "n_tokens", "quality_score", "split"
    )


# shared bigram CTEs over the documents table (SQL twin of text.bigram_*)
_BIGRAM_CTES = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
ex AS (
  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
  FROM toks CROSS JOIN UNNEST(range(1, len(tk))) AS u(i)
  WHERE len(tk) >= 2),
counts AS (SELECT w1, w2, COUNT(*) AS n_bigram FROM ex GROUP BY 1, 2),
marg AS (SELECT w1, CAST(SUM(n_bigram) AS BIGINT) AS n_w1 FROM counts GROUP BY 1),
model AS (
  SELECT c.w1, c.w2, c.n_bigram, m.n_w1,
         CAST(c.n_bigram AS DOUBLE) / CAST(m.n_w1 AS DOUBLE) AS cond_prob
  FROM counts c JOIN marg m USING (w1))
"""


@register(
    LLM_QUERIES,
    "doc_bigram_lm",
    _BIGRAM_CTES + "SELECT w1, w2, n_bigram, n_w1, cond_prob FROM model",
    "corpus bigram language model: (w1,w2) counts, w1 marginals, and "
    "conditional probabilities — the vocabulary^2-bounded broadcastable "
    "model table per-document scoring joins against",
)
def doc_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.bigram_counts(d)


@register(
    LLM_QUERIES,
    "doc_bigram_score",
    _BIGRAM_CTES
    + """
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(CAST(SUM(CAST(floor(cond_prob * 1e15) AS BIGINT)) AS BIGINT)
                AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 1e15 AS mean_cond_prob
    FROM ex JOIN model USING (w1, w2)
    GROUP BY doc_id
    """,
    "LM-based fluency scoring: per-document mean conditional bigram "
    "probability under the corpus bigram model (perplexity proxy; ln() "
    "is not bit-portable, the mean probability is — per-row IEEE "
    "divisions quantized to int64 and summed order-free)",
)
def doc_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.bigram_doc_score(d, text.bigram_counts(d))


def _lang_sql() -> str:
    scores = []
    for lang, markers in text.LANG_MARKERS.items():
        lst = "['" + "', '".join(markers) + "']"
        scores.append(
            f"len(list_filter(string_split(text, ' '), x -> list_contains({lst}, x))) AS score_{lang}"
        )
    return f"""
    WITH scored AS (SELECT doc_id, {", ".join(scores)} FROM documents)
    SELECT doc_id, score_en, score_fr, score_de,
      CASE WHEN score_en >= score_fr AND score_en >= score_de THEN 'en'
           WHEN score_fr >= score_de THEN 'fr'
           ELSE 'de' END AS pred_lang
    FROM scored
    """


@register(
    LLM_QUERIES,
    "doc_language_id",
    _lang_sql(),
    "marker-frequency language id heuristic (argmax with deterministic ties)",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.with_language_id(d).select(
        "doc_id", "score_en", "score_fr", "score_de", "pred_lang"
    )


@register(
    LLM_QUERIES,
    "doc_token_frequencies",
    """
    SELECT tok AS token, COUNT(*) AS n_occurrences
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    """,
    "corpus token frequency (explode + partial-agg groupBy)",
)
def doc_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.token_frequencies(load_table(spark, sf_dir, "documents"))


@register(
    LLM_QUERIES,
    "doc_fingerprint",
    f"""
    SELECT doc_id,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        (acc, x) -> (acc * 31 + x) % {text.FINGERPRINT_MOD}) AS fingerprint
    FROM documents
    """,
    "rolling polynomial content fingerprint (char fold mod 1e9+7)",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.with_fingerprint(d).select("doc_id", "fingerprint")


@register(
    LLM_QUERIES,
    "doc_token_counts",
    r"""
    WITH pieces AS (
      SELECT doc_id,
        list_filter(
          string_split_regex(regexp_replace(text, '([0-9]+|[^\w\s]+)', ' \1 ', 'g'), '\s+'),
          x -> x <> '') AS pc
      FROM documents)
    SELECT doc_id,
      len(pc) AS n_ws_tokens,
      list_reduce(
        list_prepend(CAST(0 AS BIGINT),
          list_transform(pc, w -> CAST(ceil(len(w) / CAST(6 AS DOUBLE)) AS BIGINT))),
        (acc, x) -> acc + x) AS n_subword_tokens
    FROM pieces
    """,
    "whitespace + BPE-ish subword token counting",
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.token_count_bpe_ish(d).select(
        "doc_id", "n_ws_tokens", "n_subword_tokens"
    )


@register(
    LLM_QUERIES,
    "doc_filter_report",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sig AS (
      SELECT doc_id,
        CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(tk, w -> CAST(len(w) AS BIGINT))),
               (acc, x) -> acc + x) AS DOUBLE)
          / CAST(len(tk) AS DOUBLE) AS mean_word_len,
        CAST(len(list_filter(tk, x -> list_contains({{stop}}, x))) AS BIGINT)
          AS stopword_count,
        CAST(len(list_distinct(tk)) AS DOUBLE)
          / CAST(len(tk) AS DOUBLE) AS uniq_ratio,
        CAST(list_max(list_transform(list_distinct(tk),
               t -> len(list_filter(tk, x -> x = t)))) AS DOUBLE)
          / CAST(len(tk) AS DOUBLE) AS top_token_frac
      FROM toks)
    SELECT doc_id, n_tokens, mean_word_len, stopword_count, uniq_ratio,
           top_token_frac,
      (n_tokens < 50 OR n_tokens > 100000) AS r_length,
      (mean_word_len < 3.0 OR mean_word_len > 10.0) AS r_word_len,
      (stopword_count < 2) AS r_stopword,
      (uniq_ratio < 0.2) AS r_uniq,
      (top_token_frac > 0.1) AS r_repetition,
      NOT ((n_tokens < 50 OR n_tokens > 100000)
           OR (mean_word_len < 3.0 OR mean_word_len > 10.0)
           OR (stopword_count < 2)
           OR (uniq_ratio < 0.2)
           OR (top_token_frac > 0.1)) AS keep
    FROM sig
    """.replace("{stop}", _STOP_LIST),
    "Gopher/C4-style rule-based filter audit: per-doc token/word-length/"
    "stopword/uniqueness/repetition signals, one boolean per rule, final "
    "keep flag — all per-row array expressions, zero shuffle",
)
def doc_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.filter_report(d)


@register(
    LLM_QUERIES,
    "doc_unigram_oov",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    ex AS (SELECT doc_id, unnest(tk) AS w FROM toks),
    cnt AS (SELECT w, COUNT(*) AS c FROM ex GROUP BY w),
    vocab AS (SELECT w, 1 AS in_vocab FROM cnt ORDER BY c DESC, w LIMIT 20)
    SELECT ex.doc_id,
      CAST(COUNT(*) AS BIGINT) AS n_tokens,
      CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_oov,
      CAST(CAST(SUM(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM ex LEFT JOIN vocab v ON v.w = ex.w
    GROUP BY ex.doc_id
    """,
    "tokenizer-coverage signal: per-doc OOV rate against the corpus's "
    "top-20 unigram vocabulary (count desc, token asc ties); the "
    "vocabulary is bounded and broadcasts, the corpus shuffles once",
)
def doc_unigram_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.unigram_oov(d)


# ---------------------------------------------------------------------------
# round-2 pipeline queries: repetition, deterministic split, contamination
# ---------------------------------------------------------------------------


@register(
    LLM_QUERIES,
    "doc_ngram_repetition",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id,
        CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
             ELSE list_transform(range(1, len(tk) - 1),
                                 i -> array_to_string(tk[i:i+2], ' ')) END AS gs
      FROM toks),
    ex AS (SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, unnest(gs) AS gram FROM g),
    cnt AS (SELECT doc_id, n_grams, gram, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3)
    SELECT doc_id, n_grams,
           COUNT(*) AS n_distinct,
           MAX(c) AS top_count,
           CAST(n_grams - COUNT(*) AS DOUBLE) / n_grams AS dup_fraction
    FROM cnt GROUP BY doc_id, n_grams
    """,
    "Gopher-style repetition filter signals: per-doc word-3-gram totals, "
    "distincts, top-gram count, duplicate-gram fraction",
)
def doc_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.ngram_repetition(d)


@register(
    LLM_QUERIES,
    "doc_train_split",
    """
    WITH s AS (
      SELECT n_chars,
        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
          % 100 AS b
      FROM documents)
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'validation'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1
    """,
    "deterministic md5-bucket train/validation/test split (80/10/10): "
    "reproducible under re-partitioning and re-ingestion, unlike rand()",
)
def doc_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        text.with_split(d)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    LLM_QUERIES,
    "doc_bpe_pair_stats",
    """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT w, COUNT(*) AS n FROM words GROUP BY w),
    pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 1) AS c1,
             substr(w, CAST(i AS INTEGER) + 1, 1) AS c2, n
      FROM wc CROSS JOIN UNNEST(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2),
    agg AS (
      SELECT c1, c2, CAST(SUM(n) AS BIGINT) AS pair_count
      FROM pairs GROUP BY 1, 2),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY pair_count DESC, c1, c2)
               AS merge_rank
      FROM agg)
    SELECT c1, c2, pair_count, CAST(merge_rank AS INT) AS merge_rank
    FROM ranked WHERE merge_rank <= 20
    """,
    "BPE tokenizer-training inner loop: adjacent-symbol pair frequencies "
    "weighted by word frequency, top-20 merge candidates. The pair count "
    "runs over the word-frequency DICT (vocabulary-bounded), not the raw "
    "corpus — the aggregation that makes BPE training feasible at 100 TB: "
    "one corpus pass builds the dict, every merge iteration after that "
    "touches only vocabulary-sized data",
)
def doc_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .where(F.length("w") >= 2)
    )
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.struct(
                    F.substr("w", i, F.lit(1)).alias("c1"),
                    F.substr("w", i + F.lit(1), F.lit(1)).alias("c2"),
                ),
            )
        ).alias("p"),
        "n",
    )
    agg = pairs.groupBy(F.col("p.c1").alias("c1"), F.col("p.c2").alias("c2")).agg(
        F.sum("n").cast("bigint").alias("pair_count")
    )
    w = Window.orderBy(F.col("pair_count").desc(), "c1", "c2")
    return (
        agg.withColumn("merge_rank", F.row_number().over(w).cast("int"))
        .where(F.col("merge_rank") <= 20)
    )


@register(
    LLM_QUERIES,
    "doc_tfidf_top_terms",
    """
    WITH tf AS (
      SELECT doc_id, tok AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT t.doc_id, t.term, t.tf, d.df,
             CAST(t.tf AS DOUBLE) / d.df AS score,
             ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC,
                                         t.term ASC) AS rnk
      FROM tf t JOIN df d ON d.term = t.term
    )
    SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
    "TF-IDF-style salient terms: per-doc term frequency joined against the "
    "(vocabulary-sized, broadcast) document-frequency table, top-3 per doc "
    "by tf/df with deterministic term tie-break — keyword extraction for "
    "corpus exploration; the tf table partial-aggregates and the rank "
    "window reuses the tf shuffle partitioning on doc_id",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tab = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tab), "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


@register(
    LLM_QUERIES,
    "doc_sampling_weights",
    """
    WITH shares AS (
      SELECT source, lang, COUNT(*) AS n_docs
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM shares)
    SELECT s.source, s.lang, s.n_docs,
           CAST(s.n_docs AS DOUBLE) / t.total AS actual_share,
           CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM shares) AS target_share,
           (CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM shares))
             / (CAST(s.n_docs AS DOUBLE) / t.total) AS sample_weight
    FROM shares s CROSS JOIN tot t
    """,
    "domain-mixing sampling weights: per (source, lang) actual corpus share "
    "vs a uniform target; weight = target/actual is the per-doc sampling "
    "multiplier a mixture-balanced training pipeline applies. One partial-"
    "aggregated pass; the domain table is tiny and stays on the driver "
    "side of any subsequent broadcast",
)
def doc_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    shares = d.groupBy("source", "lang").agg(F.count("*").alias("n_docs"))
    tot = shares.agg(
        F.sum("n_docs").alias("total"), F.count("*").alias("n_domains")
    )
    j = shares.crossJoin(F.broadcast(tot))
    actual = F.col("n_docs").cast("double") / F.col("total")
    target = F.lit(1.0) / F.col("n_domains")
    return j.select(
        "source",
        "lang",
        "n_docs",
        actual.alias("actual_share"),
        target.alias("target_share"),
        (target / actual).alias("sample_weight"),
    )


@register(
    LLM_QUERIES,
    "doc_pack_sequences",
    """
    WITH sized AS (
      SELECT doc_id, n_chars,
             COALESCE(CAST(SUM(n_chars) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS start_pos
      FROM documents
    )
    SELECT doc_id, n_chars, start_pos,
           start_pos // 8192 AS bin_id,
           start_pos % 8192 AS offset_in_bin
    FROM sized
    """,
    "sequence packing for training batches: docs laid out contiguously in "
    "doc_id order, each assigned the 8192-char bin its start position "
    "lands in (exclusive running sum -> floor-div). The global running "
    "sum is computed with the two-pass range-partition pattern "
    "(attach_global_order): range-shuffle on doc_id, per-partition "
    "partial sums to the driver (one row per partition), broadcast "
    "offsets + a PARTITIONED window — bit-identical to the global "
    "window, no single-partition sort anywhere in the plan",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flux_spark.analytics.operators import attach_global_order

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = attach_global_order(
        d,
        [F.col("doc_id").asc()],
        running_sum=("n_chars", "start_pos"),
    )
    start = F.col("start_pos")
    return packed.select(
        "doc_id",
        "n_chars",
        "start_pos",
        (start / 8192).cast("bigint").alias("bin_id"),
        F.pmod(start, F.lit(8192)).cast("bigint").alias("offset_in_bin"),
    )


@register(
    LLM_QUERIES,
    "doc_pack_sequences_sharded",
    """
    WITH sharded AS (
      SELECT doc_id, n_chars, CAST(doc_id % 8 AS BIGINT) AS shard
      FROM documents
    ),
    sized AS (
      SELECT doc_id, n_chars, shard,
             COALESCE(CAST(SUM(n_chars) OVER (PARTITION BY shard
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS BIGINT), 0) AS start_pos
      FROM sharded
    )
    SELECT doc_id, shard, n_chars, start_pos,
           shard * 1000000 + start_pos // 8192 AS bin_id,
           start_pos % 8192 AS offset_in_bin
    FROM sized
    """,
    "sequence packing, production form: docs hash into 8 shards, each "
    "shard packs independently (window partitioned by shard — the sort "
    "parallelizes across shards instead of one global ordering), bin ids "
    "namespaced per shard. This is the shape that scales: at 100 TB the "
    "shard count rises with the cluster and no single-partition sort "
    "exists; the per-row packing math is identical to doc_pack_sequences",
)
def doc_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sh = d.withColumn("shard", (F.col("doc_id") % 8).cast("bigint"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("bigint")
    return sh.select(
        "doc_id",
        "shard",
        "n_chars",
        start.alias("start_pos"),
        (F.col("shard") * 1000000 + (start / 8192).cast("bigint")).alias(
            "bin_id"
        ),
        F.pmod(start, F.lit(8192)).cast("bigint").alias("offset_in_bin"),
    )


@register(
    LLM_QUERIES,
    "doc_perplexity_buckets",
    _BIGRAM_CTES
    + """
    , scores AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(CAST(SUM(CAST(floor(cond_prob * 1e15) AS BIGINT)) AS BIGINT)
                  AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) / 1e15 AS mean_cond_prob
      FROM ex JOIN model USING (w1, w2)
      GROUP BY doc_id),
    bucketed AS (
      SELECT d.lang, s.mean_cond_prob,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY s.mean_cond_prob DESC NULLS LAST,
                                     d.doc_id ASC)
               AS bucket
      FROM documents d LEFT JOIN scores s USING (doc_id))
    SELECT lang, CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           MIN(mean_cond_prob) AS min_score,
           MAX(mean_cond_prob) AS max_score
    FROM bucketed GROUP BY lang, bucket
    """,
    "CCNet-style (Wenzek et al. 2020) per-language LM quality buckets: "
    "documents scored under the corpus bigram LM, NTILE(3)-split within "
    "each language into head/middle/tail — the standard keep-head/"
    "middle, drop-tail curation split; only (id, lang, score) rows reach "
    "the window shuffle, never the text",
)
def doc_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    buckets = text.perplexity_buckets(d, text.bigram_counts(d), n_buckets=3)
    return buckets.groupBy("lang", "bucket").agg(
        F.count("*").alias("n_docs"),
        F.min("mean_cond_prob").alias("min_score"),
        F.max("mean_cond_prob").alias("max_score"),
    )


@register(
    LLM_QUERIES,
    "doc_tokenizer_fertility",
    r"""
    WITH pieces AS (
      SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(
              list_filter(
                string_split_regex(
                  regexp_replace(text, '([0-9]+|[^\w\s]+)', ' \1 ', 'g'),
                  '\s+'),
                x -> x <> ''),
              w -> CAST(ceil(len(w) / CAST(6 AS DOUBLE)) AS BIGINT))),
          (acc, x) -> acc + x) AS n_subword
      FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_words,
           CAST(SUM(n_subword) AS BIGINT) AS n_subword_tokens,
           CAST(CAST(SUM(n_subword) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(n_words) AS BIGINT) AS DOUBLE) AS fertility
    FROM pieces GROUP BY lang
    """,
    "tokenizer fertility by language (subword tokens per whitespace "
    "word) — the standard metric for how well a tokenizer fits each "
    "language's data; integer sums then ONE exact double division per "
    "group keeps it bit-portable",
)
def doc_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    counted = text.token_count_bpe_ish(d)
    return (
        counted.withColumn(
            "n_words", F.size(F.split("text", " ")).cast("long")
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_subword_tokens").alias("n_subword_tokens"),
            (
                F.sum("n_subword_tokens").cast("double")
                / F.sum("n_words").cast("double")
            ).alias("fertility"),
        )
    )


@register(
    LLM_QUERIES,
    "doc_stratified_sample",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id)
               AS rnk
      FROM documents)
    SELECT doc_id, lang, CAST(rnk AS INTEGER) AS sample_rank
    FROM ranked WHERE rnk <= 10
    """,
    "deterministic stratified sampling: exactly 10 docs per language, "
    "chosen by ranking on a salted md5 of the id — the balanced-eval-set "
    "construction pattern; stable under repartitioning/retries unlike "
    "rand()-ordered sampling, and a different salt gives an independent "
    "draw; only (id, lang, hash) rows reach the per-stratum window",
)
def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    h = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, F.asc("doc_id"))
    return (
        d.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .where(F.col("sample_rank") <= 10)
    )


@register(
    LLM_QUERIES,
    "doc_source_mixture",
    """
    WITH per_doc AS (
      SELECT source, lang, len(string_split(text, ' ')) AS n_tok
      FROM documents),
    grp AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens
      FROM per_doc GROUP BY source, lang),
    tot AS (
      SELECT *, CAST(SUM(n_tokens) OVER () AS BIGINT) AS total_tokens,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_groups
      FROM grp)
    SELECT source, lang, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
             AS token_share,
           CAST(total_tokens AS DOUBLE) / CAST(n_groups AS DOUBLE)
             / CAST(n_tokens AS DOUBLE) AS upsample_to_uniform
    FROM tot
    """,
    "data-mixture report per (source, lang): document and token counts, "
    "the stratum's share of corpus tokens, and the replication factor "
    "that would equalize every stratum — the sampling-weight table a "
    "Pile/Dolma-style mixture step consumes. One scan, map-side partial "
    "agg to O(strata) rows, window over the tiny aggregate only",
)
def doc_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "source", "lang", F.size(text.tokens("text")).alias("n_tok")
    )
    grp = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    tot = grp.select(
        "*",
        F.sum("n_tokens").over(w).cast("bigint").alias("total_tokens"),
        F.count("*").over(w).cast("bigint").alias("n_groups"),
    )
    return tot.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.col("total_tokens").cast("double")
        ).alias("token_share"),
        (
            F.col("total_tokens").cast("double")
            / F.col("n_groups").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("upsample_to_uniform"),
    )


_WINNOW_ROLL = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({g}, ''), "
    "c -> CAST(ascii(c) AS BIGINT))), "
    f"(acc, x) -> (acc * 31 + x) % {text.FINGERPRINT_MOD})"
)


@register(
    LLM_QUERIES,
    "doc_winnowing",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(tk) < 3 THEN [text]
                  ELSE list_transform(range(1, len(tk) - 1),
                                      i -> array_to_string(tk[i:i+2], ' '))
             END AS grams
      FROM t),
    h AS (
      SELECT doc_id,
             list_transform(grams, g -> {_WINNOW_ROLL.format(g='g')}) AS hs
      FROM g),
    sel AS (
      SELECT doc_id, len(hs) AS n_grams,
             greatest(1, len(hs) - 3) AS n_windows,
             list_distinct(list_transform(
               range(1, greatest(1, len(hs) - 3) + 1),
               j -> CAST(j + list_position(hs[j:j+3], list_min(hs[j:j+3]))
                         - 1 AS BIGINT) * {text.FINGERPRINT_MOD}
                    + list_min(hs[j:j+3]))) AS s
      FROM h)
    SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
           CAST(n_windows AS INT) AS n_windows,
           CAST(len(s) AS INT) AS n_selected,
           CAST(list_sum(list_transform(s, x -> x % {text.FINGERPRINT_MOD}))
                AS BIGINT) AS fp_sum
    FROM sel
    """,
    "winnowing fingerprints (Schleimer et al. 2003 — the MOSS partial- "
    "copy sketch, r8): rolling-hash every 3-token gram, slide a window "
    "of 4 hashes, select each window's leftmost minimum; any shared run "
    "of >= 6 tokens contributes a common fingerprint at ~1/4 the density "
    "of storing every gram. Pure Catalyst higher-order functions, no "
    "shuffle; the oracle replays gram hashing, window minima, tie rule "
    "and the distinct-(pos,hash) sum symbolically",
)
def doc_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return text.winnow_fingerprints(d).select(
        "doc_id", "n_grams", "n_windows", "n_selected", "fp_sum"
    )


@register(
    LLM_QUERIES,
    "doc_langid_accuracy",
    _lang_sql().replace(
        """SELECT doc_id, score_en, score_fr, score_de,
      CASE WHEN score_en >= score_fr AND score_en >= score_de THEN 'en'
           WHEN score_fr >= score_de THEN 'fr'
           ELSE 'de' END AS pred_lang
    FROM scored""",
        """, pred AS (
      SELECT s.doc_id, d.lang AS true_lang,
        CASE WHEN score_en >= score_fr AND score_en >= score_de THEN 'en'
             WHEN score_fr >= score_de THEN 'fr'
             ELSE 'de' END AS pred_lang
      FROM scored s JOIN documents d ON d.doc_id = s.doc_id)
    SELECT true_lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           true_lang = pred_lang AS is_correct
    FROM pred GROUP BY true_lang, pred_lang""",
    ),
    "language-ID confusion matrix (r8): the detector's predictions "
    "against the corpus's labeled lang column, one row per (true, "
    "predicted) pair — the quality report that tells a curation "
    "pipeline WHERE the cheap n-gram detector is trustworthy (the "
    "fixture corpus includes zh/es docs the 3-language marker set "
    "cannot predict, so the matrix exposes the coverage gap, not just "
    "the error rate). The detector itself is the doc_language_id gate; "
    "this gates its measured accuracy",
)
def doc_langid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    pred = text.with_language_id(d.select("doc_id", "text"))
    return (
        pred.join(d.select("doc_id", F.col("lang").alias("true_lang")), "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .select(
            "true_lang",
            "pred_lang",
            "n_docs",
            (F.col("true_lang") == F.col("pred_lang")).alias("is_correct"),
        )
    )


_CHUNK_W, _CHUNK_S = 32, 24


@register(
    LLM_QUERIES,
    "doc_chunk_windows",
    f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents),
    sized AS (SELECT doc_id, toks, len(toks) AS n
              FROM base WHERE len(toks) > 0),
    cnt AS (
      SELECT doc_id, toks,
             CASE WHEN n <= {_CHUNK_W} THEN 1
                  ELSE 1 + (n - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S}
             END AS n_chunks
      FROM sized),
    ex AS (
      SELECT doc_id, toks,
             CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_id
      FROM cnt),
    sliced AS (
      SELECT doc_id, chunk_id,
             CAST(chunk_id * {_CHUNK_S} AS INT) AS start_token,
             list_slice(toks, chunk_id * {_CHUNK_S} + 1,
                        chunk_id * {_CHUNK_S} + {_CHUNK_W}) AS ct
      FROM ex)
    SELECT doc_id, chunk_id, start_token,
           CAST(len(ct) AS INT) AS n_chunk_tokens,
           array_to_string(ct, ' ') AS chunk_text,
           CAST(length(array_to_string(ct, ' ')) AS INT) AS n_chunk_chars
    FROM sliced
    """,
    "RAG chunking: sliding 32-token windows every 24 tokens (8-token "
    "overlap), one row per chunk with token/char offsets — the "
    "embedding-stage input shape; pure codegen, zero shuffle",
)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return text.chunk_windows(d, window=_CHUNK_W, stride=_CHUNK_S)


@register(
    LLM_QUERIES,
    "doc_mixture_temperature",
    """
    WITH shares AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM shares),
    q AS (
      SELECT s.source, s.lang, s.n_docs,
             CAST(s.n_docs AS DOUBLE) / t.total AS actual_share,
             CAST(floor(pow(CAST(s.n_docs AS DOUBLE) / t.total,
                            CAST(7 AS DOUBLE) / CAST(10 AS DOUBLE))
                        * 1e12) AS BIGINT) AS pq
      FROM shares s CROSS JOIN tot t
    ),
    z AS (SELECT CAST(SUM(pq) AS BIGINT) AS zq FROM q)
    SELECT q.source, q.lang, q.n_docs, q.actual_share,
           CAST(q.pq AS DOUBLE) / CAST(z.zq AS DOUBLE) AS temp_share,
           (CAST(q.pq AS DOUBLE) / CAST(z.zq AS DOUBLE)) / q.actual_share
             AS sample_weight
    FROM q CROSS JOIN z
    """,
    "temperature-scaled mixture weights (alpha = 0.7, the "
    "multilingual-LM upsampling rule, XLM-R sec. 3): p_i ~ share_i^alpha "
    "renormalized, weight = p_i/share_i — the sub-1 exponent lifts "
    "low-resource domains and shrinks head domains, less aggressively "
    "than uniform. The pow() terms are int64-quantized "
    "(floor(x*1e12)) before the normalizing SUM so the renormalization "
    "is order-free exact; the domain table stays model-sized",
)
def doc_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    shares = d.groupBy("source", "lang").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    tot = shares.agg(F.sum("n_docs").cast("bigint").alias("total"))
    q = shares.crossJoin(F.broadcast(tot))
    actual = F.col("n_docs").cast("double") / F.col("total").cast("double")
    pq = F.floor(
        F.pow(actual, F.lit(7.0) / F.lit(10.0)) * F.lit(1e12)
    ).cast("long")
    qtab = q.select("source", "lang", "n_docs", actual.alias("actual_share"),
                    pq.alias("__pq"))
    z = qtab.agg(F.sum("__pq").cast("bigint").alias("__zq"))
    j = qtab.crossJoin(F.broadcast(z))
    p = F.col("__pq").cast("double") / F.col("__zq").cast("double")
    return j.select(
        "source",
        "lang",
        "n_docs",
        "actual_share",
        p.alias("temp_share"),
        (p / F.col("actual_share")).alias("sample_weight"),
    )


_MARKUP_SUFFIX = (
    ' <div class="x"> <span id="y"> {a} {b} {c} {d} '
    "https://example.org/a https://example.org/b https://example.org/c "
    "| 12345 HTML TABLE"
)


@register(
    LLM_QUERIES,
    "doc_markup_stats",
    f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 4000000000 AS doc_id,
             text || '{_MARKUP_SUFFIX.replace("'", "''")}' AS text
      FROM documents WHERE doc_id % 31 = 0),
    feat AS (
      SELECT doc_id, text,
        CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER)
          AS n_urls,
        CAST(len(regexp_extract_all(text, '<[a-zA-Z][^>]*>')) AS INTEGER)
          AS n_tags,
        CAST((length(text) - length(replace(text, '{{', '')))
           + (length(text) - length(replace(text, '}}', ''))) AS INTEGER)
          AS n_braces,
        CAST(length(text) - length(replace(text, '|', '')) AS INTEGER)
          AS n_pipes,
        CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS n_digits,
        list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM corpus)
    SELECT doc_id, n_urls, n_tags, n_braces, n_pipes, n_digits,
      CAST(n_digits AS DOUBLE) / CAST(length(text) AS DOUBLE) AS digit_ratio,
      CAST(len(list_filter(toks,
        x -> regexp_full_match(x, '[A-Z]{{2,}}'))) AS INTEGER)
        AS n_caps_tokens,
      CASE WHEN len(toks) = 0 THEN 0.0
           ELSE CAST(len(list_filter(toks,
                  x -> regexp_full_match(x, '[A-Z]{{2,}}'))) AS DOUBLE)
                / CAST(len(toks) AS DOUBLE) END AS caps_ratio,
      (n_tags >= 2 OR n_urls >= 3 OR n_braces >= 4
       OR CAST(n_digits AS DOUBLE) / CAST(length(text) AS DOUBLE) > 0.3)
        AS looks_markup
    FROM feat
    """,
    "markup/boilerplate signals (C4 page-cleanliness rules): URL/tag "
    "counts, code-brace + table-pipe density, digit ratio, ALL-CAPS "
    "token ratio, composite looks_markup flag — gate corpus overlays a "
    "markup-heavy variant per 31st doc so the flag discriminates; pure "
    "per-row regexp/char codegen, zero shuffle",
)
def doc_markup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.where(F.col("doc_id") % 31 == 0).select(
        (F.col("doc_id") + 4000000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_MARKUP_SUFFIX)).alias("text"),
    )
    return text.markup_stats(d.unionByName(aug))


@register(
    LLM_QUERIES,
    "doc_epoch_shuffle",
    """
    WITH epochs AS (
      SELECT CAST(unnest([0, 1]) AS BIGINT) AS epoch
    ),
    shards AS (
      SELECT GREATEST(8, (COUNT(*) + 4095) // 4096) AS n_shards
      FROM documents
    ),
    keyed AS (
      SELECT e.epoch, d.doc_id,
        md5('epoch:' || CAST(e.epoch AS VARCHAR) || ':'
            || CAST(d.doc_id AS VARCHAR)) AS shuffle_key
      FROM documents d CROSS JOIN epochs e
    ),
    sharded AS (
      SELECT epoch, doc_id, shuffle_key,
        CAST(('0x' || substring(shuffle_key, 1, 15)) AS BIGINT)
          % (SELECT n_shards FROM shards) AS shard
      FROM keyed
    )
    SELECT epoch, doc_id, shard,
      CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
                              ORDER BY shuffle_key, doc_id) AS BIGINT) - 1
        AS pos
    FROM sharded
    """,
    "deterministic multi-epoch training shuffle: every doc gets, per "
    "epoch, a salted md5 shuffle key -> shard (key % n_shards) and an "
    "exact position within the shard (rank by key). Reproducible "
    "byte-for-byte across reruns, retries, and engines — the property "
    "rand()-based shuffles lack — and epochs are independent "
    "permutations (the salt includes the epoch). n_shards derives from "
    "COUNT(*) in pure integer arithmetic (max(8, ceil(n/4096)), the "
    "fixed-config law): target ~4096 docs per shard so every per-shard "
    "sort fits one task at ANY scale — 100 TB just means more shards, "
    "exactly how production sharded-shuffle writers (WebDataset/"
    "Megatron) lay out epochs. Shard assignment is per-row codegen; the "
    "only exchange is the (epoch, shard) hash partition. Deliberately "
    "NOT a single global row_number per epoch: that would funnel the "
    "corpus through one task.",
)
def doc_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").alias("epoch"))
    # fixed-config law: shard count derives from the corpus size in pure
    # integer arithmetic (identical on both engines); ~4096 docs/shard
    n_shards = d.agg(
        F.greatest(
            F.lit(8).cast("bigint"),
            ((F.count("*") + F.lit(4095)) / F.lit(4096)).cast("bigint"),
        ).alias("n_shards")
    )
    keyed = d.crossJoin(F.broadcast(epochs)).crossJoin(
        F.broadcast(n_shards)
    ).select(
        "n_shards",
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(
                ":",
                F.lit("epoch"),
                F.col("epoch").cast("string"),
                F.col("doc_id").cast("string"),
            )
        ).alias("shuffle_key"),
    )
    sharded = keyed.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring("shuffle_key", 1, 15), 16, 10).cast("bigint"),
            F.col("n_shards"),
        ),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return sharded.select(
        "epoch",
        "doc_id",
        "shard",
        (F.row_number().over(w).cast("bigint") - 1).alias("pos"),
    )


@register(
    LLM_QUERIES,
    "doc_pii_card_luhn",
    """
    WITH aug AS (
      SELECT doc_id,
        text
        || CASE WHEN doc_id % 11 = 0
                THEN ' pay 4111111111111111 now' ELSE '' END
        || CASE WHEN doc_id % 13 = 0
                THEN ' ref 4111111111111112 held' ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN ' acct ' || lpad(CAST((doc_id * 7919) % 10000000000000
                                           AS VARCHAR), 13, '0') || ' end'
                ELSE '' END AS text
      FROM documents),
    runs AS (
      SELECT doc_id,
        list_filter(regexp_extract_all(text, '[0-9]+'),
                    r -> length(r) BETWEEN 13 AND 19) AS cands
      FROM aug),
    judged AS (
      SELECT doc_id, cands,
        list_filter(cands, c ->
          list_reduce(list_prepend(0, list_transform(range(1, length(c)+1),
            i -> CASE WHEN i % 2 = 0 THEN
                   CASE WHEN CAST(substring(reverse(c), i, 1) AS INTEGER)*2 > 9
                        THEN CAST(substring(reverse(c), i, 1) AS INTEGER)*2 - 9
                        ELSE CAST(substring(reverse(c), i, 1) AS INTEGER)*2 END
                 ELSE CAST(substring(reverse(c), i, 1) AS INTEGER) END)),
            (a, x) -> a + x) % 10 = 0) AS valid_cands
      FROM runs)
    SELECT doc_id,
      CAST(len(cands) AS INTEGER) AS n_card_like,
      CAST(len(valid_cands) AS INTEGER) AS n_valid_cards,
      CAST(len(cands) - len(valid_cands) AS INTEGER) AS n_invalid_cards
    FROM judged
    WHERE len(cands) > 0
    """,
    "credit-card PII detection with Luhn verification: 13-19 digit runs "
    "are candidates, the Luhn mod-10 checksum separates real card "
    "numbers from random digit strings (the precision step naive "
    "regex-only scrubbers lack). Gate corpus plants a valid card "
    "(every 11th doc), a near-miss invalid (13th), and a VARYING "
    "13-digit account number (7th) whose validity differs per doc — so "
    "the checksum arithmetic itself is value-hashed, not just the "
    "regex. Pure per-row codegen (higher-order fold over <=19 digits), "
    "zero shuffle.",
)
def doc_pii_card_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                did % 11 == 0, F.lit(" pay 4111111111111111 now")
            ).otherwise(F.lit("")),
            F.when(
                did % 13 == 0, F.lit(" ref 4111111111111112 held")
            ).otherwise(F.lit("")),
            F.when(
                did % 7 == 0,
                F.concat(
                    F.lit(" acct "),
                    F.lpad(
                        ((did * 7919) % F.lit(10_000_000_000_000)).cast(
                            "string"
                        ),
                        13,
                        "0",
                    ),
                    F.lit(" end"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    cands = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0),
        lambda r: F.length(r).between(13, 19),
    )

    def luhn_valid(c):
        digits = F.filter(
            F.split(F.reverse(c), ""), lambda ch: ch != F.lit("")
        )
        terms = F.transform(
            digits,
            lambda ch, i: F.when(
                i % 2 == 1,
                F.when(
                    ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9
                ).otherwise(ch.cast("int") * 2),
            ).otherwise(ch.cast("int")),
        )
        return F.aggregate(terms, F.lit(0), lambda a, x: a + x) % 10 == 0

    judged = aug.select(
        "doc_id",
        cands.alias("cands"),
    ).select(
        "doc_id",
        "cands",
        F.filter(F.col("cands"), luhn_valid).alias("valid_cands"),
    )
    return judged.where(F.size("cands") > 0).select(
        "doc_id",
        F.size("cands").cast("int").alias("n_card_like"),
        F.size("valid_cands").cast("int").alias("n_valid_cards"),
        (F.size("cands") - F.size("valid_cands"))
        .cast("int")
        .alias("n_invalid_cards"),
    )


# ---------------------------------------------------------------------------
# code-vs-prose detection (r8 session 4)
# ---------------------------------------------------------------------------

# word-soup documents carry no code, so the gate appends a deterministic
# code snippet to every 4th doc in BOTH engines (the _PII_AUG_CTE trick) —
# the detector must flag exactly those docs and no others.
_CODE_SNIPPET = (
    " if (x > 0) { return f(x, y); } else { y[i] = a + b * c; } "
    "// fallback path"
)
_CODE_SYMS = "{}();=[]"  # the symbol alphabet the ratio counts

_CODE_AUG_CTE = f"""
WITH aug AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 4 = 0 THEN '{_CODE_SNIPPET}' ELSE '' END
      AS text
  FROM documents)
"""


def _sql_count_char(col: str, ch: str) -> str:
    lit = ch.replace("'", "''")
    return f"(length({col}) - length(replace({col}, '{lit}', '')))"


@register(
    LLM_QUERIES,
    "doc_code_detect",
    _CODE_AUG_CTE
    + f"""
    , feat AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST({" + ".join(_sql_count_char("text", c) for c in _CODE_SYMS)}
             AS BIGINT) AS n_code_syms
      FROM aug)
    SELECT doc_id, n_chars, n_code_syms,
           CAST(n_code_syms AS DOUBLE) / CAST(n_chars AS DOUBLE)
             AS code_sym_ratio,
           n_code_syms >= 8
             AND CAST(n_code_syms AS DOUBLE) / CAST(n_chars AS DOUBLE)
                 > 0.004
             AS is_code
    FROM feat
    """,
    "code-vs-prose detection by symbol-density heuristic: the ratio of "
    "code-alphabet characters ({{}}();=[]) to total characters plus an "
    "absolute floor — the cheap first-line classifier a mixture pipeline "
    "runs before routing documents to code vs natural-language buckets "
    "(natural prose sits near 0; source code is orders of magnitude "
    "higher). Char counts are exact length-difference arithmetic and the "
    "ratio is one double division, so the flags oracle-check exactly. "
    "Zero-shuffle: one whole-stage-codegen pass over the text scan",
)
def doc_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.select(
        "doc_id",
        F.concat(
            "text",
            F.when(F.col("doc_id") % 4 == 0, F.lit(_CODE_SNIPPET)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    n_syms = None
    for c in _CODE_SYMS:
        term = F.length("text") - F.length(F.replace(F.col("text"), F.lit(c)))
        n_syms = term if n_syms is None else n_syms + term
    feat = aug.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        n_syms.cast("bigint").alias("n_code_syms"),
    )
    ratio = F.col("n_code_syms").cast("double") / F.col("n_chars").cast(
        "double"
    )
    return feat.select(
        "doc_id",
        "n_chars",
        "n_code_syms",
        ratio.alias("code_sym_ratio"),
        ((F.col("n_code_syms") >= 8) & (ratio > 0.004)).alias("is_code"),
    )


# ---------------------------------------------------------------------------
# WordPiece-style tokenizer application via recursive CTE (r8 session 4)
# ---------------------------------------------------------------------------

# the shared recursive core: BOTH engines execute this identical SQL text
# (Spark 4 and DuckDB both speak WITH RECURSIVE) — vocab derivation, the
# longest-match table, and the greedy walk are engine-portable, so the
# tokenizer itself (not a re-implementation) is what the oracle checks.
_WP_BEST = """
positions AS (SELECT pos FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7))
              AS t(pos)),
wp AS (SELECT word, pos FROM words CROSS JOIN positions
       WHERE pos < length(word)),
chars AS (SELECT DISTINCT substr(word, pos + 1, 1) AS piece FROM wp),
tris AS (
  SELECT piece FROM (
    SELECT substr(word, pos + 1, 3) AS piece, COUNT(*) AS c
    FROM wp WHERE pos + 3 <= length(word)
    GROUP BY 1 ORDER BY c DESC, piece ASC LIMIT 10) t),
vocab AS (
  SELECT piece, CAST(1 AS INT) AS len FROM chars
  UNION ALL
  SELECT piece, CAST(3 AS INT) AS len FROM tris),
best AS (
  SELECT word, pos, piece, len FROM (
    SELECT wp.word, wp.pos, v.piece, v.len,
           ROW_NUMBER() OVER (PARTITION BY wp.word, wp.pos
                              ORDER BY v.len DESC, v.piece ASC) AS r
    FROM wp JOIN vocab v
      ON substr(wp.word, wp.pos + 1, v.len) = v.piece) q
  WHERE r = 1)"""

_WP_WALK = """
walk AS (
  SELECT word, CAST(0 AS INT) AS pos, CAST(0 AS INT) AS k,
         substr(word, 1, 0) AS piece
  FROM {words}
  UNION ALL
  SELECT w.word, CAST(w.pos + b.len AS INT), CAST(w.k + 1 AS INT), b.piece
  FROM walk w JOIN {best} b ON b.word = w.word AND b.pos = w.pos
  WHERE w.pos < length(w.word))
"""

# the composed core the DuckDB oracle executes — byte-identical to the
# pre-r13 text; Spark executes the same two fragments but materializes
# ``words``/``best`` ONCE each (guide §2.4): left inline, every
# UnionLoop iteration of the recursive walk re-executed the whole vocab
# derivation + longest-match join, scanning documents.parquet 4x per
# recursion step (up to 9 steps at word length <= 8).
_WP_CORE = _WP_BEST + ",\n" + _WP_WALK.format(words="words", best="best")


@register(
    LLM_QUERIES,
    "doc_wordpiece_tokenize",
    """
    WITH RECURSIVE
    dw AS (
      SELECT doc_id, i - 1 AS widx, l[i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
           unnest(generate_series(1, len(l))) AS t(i)),
    words AS (SELECT DISTINCT word FROM dw),
    """
    + _WP_CORE
    + """
    , wtok AS (
      SELECT word, string_agg(piece, ' ' ORDER BY k) AS toks,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM walk WHERE piece <> '' GROUP BY word)
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w.np) AS BIGINT) AS n_pieces,
           CAST(SUM(w.np) AS DOUBLE) / COUNT(*) AS wp_fertility,
           string_agg(w.toks, ' ' ORDER BY d.widx) AS tok_text
    FROM dw d JOIN wtok w USING (word)
    GROUP BY d.doc_id
    """,
    "WordPiece-style tokenizer APPLICATION, distributed: vocabulary "
    "derived from the corpus itself (all single characters + the top-10 "
    "trigrams by position frequency, ties lexicographic), then greedy "
    "longest-match tokenization of every word as a RECURSIVE CTE — the "
    "identical SQL text executes on Spark 4 (recursive CTEs landed in "
    "4.0) and DuckDB, so the oracle checks the very tokenizer walk, not "
    "a reimplementation. Per doc: word/piece counts, fertility, and the "
    "full byte-checked tokenized text. Scale shape: tokenization runs "
    "over DISTINCT words (vocabulary-sized, not corpus-sized — the "
    "classic tokenize-the-dictionary optimization); only the final "
    "occurrence join and per-doc reassembly touch corpus-scaled rows",
)
def doc_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dw = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("widx", "word")
    )
    # r13 (guide §2.4/§1.1): materialize the vocabulary and the
    # longest-match table ONCE each before entering the recursion —
    # inline, Spark's UnionLoop re-executed the whole `best` subtree
    # (4 documents scans + trigram top-10 sort + match join + window)
    # on EVERY recursion step. Both tables are vocabulary-sized;
    # localCheckpoint pins them and the walk loop body shrinks to
    # loop-ref JOIN best.
    wv, bv = "__wp_words_r13", "__wp_best_r13"
    words_df = spark.sql(
        "SELECT DISTINCT word FROM (SELECT explode(split(text, ' ')) "
        f"AS word FROM parquet.`{sf_dir}/documents.parquet`)"
    ).localCheckpoint(eager=True)
    words_df.createOrReplaceTempView(wv)
    best_df = spark.sql(
        f"WITH words AS (SELECT word FROM {wv}),\n"
        + _WP_BEST
        + "\nSELECT word, pos, piece, len FROM best"
    ).localCheckpoint(eager=True)
    best_df.createOrReplaceTempView(bv)
    pieces = spark.sql(
        "WITH RECURSIVE\n"
        + _WP_WALK.format(words=wv, best=bv)
        + "\nSELECT word, k, piece FROM walk WHERE piece <> ''"
    )
    wtok = pieces.groupBy("word").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "piece"))),
                lambda s: s["piece"],
            ),
            " ",
        ).alias("toks"),
        F.count("*").cast("bigint").alias("np"),
    )
    # SHUFFLE_HASH, never broadcast: the tokenized-vocabulary side is
    # "model-sized" only while the vocabulary is — a real web corpus
    # (and the sf30 ladder's perturbed replicas) grows it into the
    # multi-GB range, and Catalyst's size estimate for the recursive-CTE
    # aggregate is far too low, so AQE picks a broadcast that dies at
    # the 8 GiB cap (r9 ladder catch: bench crash at sf30). wtok is
    # already hash-partitioned by word from its groupBy, so the hint
    # shuffles only the occurrence stream.
    return (
        dw.join(wtok.hint("shuffle_hash"), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("np").cast("bigint").alias("n_pieces"),
            (F.sum("np").cast("double") / F.count("*")).alias(
                "wp_fertility"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("widx", "toks"))),
                    lambda s: s["toks"],
                ),
                " ",
            ).alias("tok_text"),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval + weighted Poisson sampling (r8 session 5)
# ---------------------------------------------------------------------------

_BM25_QS = (11, 23, 37)  # query doc ids (same fixture as doc_hybrid_retrieval)


def _bm25_sql() -> str:
    qs = ", ".join(str(q) for q in _BM25_QS)
    return f"""
    WITH tf AS (
      SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2),
    dfr AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    dl AS (SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
           FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    qterms AS (
      SELECT query_id, term FROM (
        SELECT t.doc_id AS query_id, t.term,
               ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                  ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC,
                                           t.term ASC) AS rnk
        FROM tf t JOIN dfr d ON d.term = t.term
        WHERE t.doc_id IN ({qs}))
      WHERE rnk <= 3),
    parts AS (
      SELECT q.query_id, t.doc_id,
        CAST(floor(
          ((1000000.0
            * (((CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE)) + 0.5)
               / (CAST(d.df AS DOUBLE) + 0.5)))
           * ((CAST(t.tf AS DOUBLE) * 2.2)
              / (CAST(t.tf AS DOUBLE)
                 + (1.2 * (0.25
                           + (0.75 * (CAST(l.dl AS DOUBLE)
                                      / (CAST(s.total_dl AS DOUBLE)
                                         / CAST(s.n_docs AS DOUBLE)))))))))
        ) AS BIGINT) AS part_q
      FROM qterms q
      JOIN tf t ON t.term = q.term AND t.doc_id <> q.query_id
      JOIN dfr d ON d.term = q.term
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN stats s),
    scores AS (
      SELECT query_id, doc_id, CAST(SUM(part_q) AS BIGINT) AS bm25_q
      FROM parts GROUP BY 1, 2)
    SELECT query_id, doc_id, bm25_q, CAST(rnk AS INT) AS bm25_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY bm25_q DESC, doc_id ASC) AS rnk
          FROM scores)
    WHERE rnk <= 10
    """


@register(
    LLM_QUERIES,
    "doc_bm25_retrieval",
    _bm25_sql(),
    "BM25 ranked retrieval (k1=1.2, b=0.75) with the rational "
    "Robertson-Sparck-Jones IDF (N-df+0.5)/(df+0.5) kept UN-logged — "
    "ln() is not bit-portable, and for ranking the monotone rational "
    "form preserves per-term ordering; per-(doc,term) contributions are "
    "1e6-quantized to int64 and summed exactly, top-10 per query with "
    "doc_id tie-break. Plan: tf/df/dl are broadcastable side tables, "
    "the only corpus-scaled work is the query-term postings join.",
)
def doc_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical ranked retrieval with document-length normalization — the
    missing half of the RAG stack next to doc_hybrid_retrieval's RRF
    (which fuses ranks, not scores). Unlogged IDF slightly compresses
    multi-term score gaps vs textbook BM25 but ranks identically per
    term; the quantized-int64 sum makes the gate engine-exact."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    qs = list(_BM25_QS)
    # r13 (guide §2.4): tf feeds dfr, the query-term ranking AND the
    # scoring join — persist the posting table once (the "materialize
    # the index" shape minhash_lsh_pairs already uses) instead of
    # re-running the corpus explode + groupBy per consumer. r14
    # (VERDICT r13 #2): size-gated — at bench SF the explode+groupBy is
    # milliseconds and the unconditional persist cost -39% (0.92 ->
    # 1.29 s in the driver's own runs); above PERSIST_MIN_INPUT_BYTES
    # the saved corpus passes dominate and the persist stays.
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    if input_bytes(sf_dir, "documents") >= PERSIST_MIN_INPUT_BYTES:
        tf = tf.persist()
    dfr = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_dl"),
    )
    w_q = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.asc("term")
    )
    qterms = (
        tf.join(F.broadcast(dfr), "term")
        .where(F.col("doc_id").isin(qs))
        .withColumn("__r", F.row_number().over(w_q))
        .where(F.col("__r") <= 3)
        .select(F.col("doc_id").alias("query_id"), "term")
    )
    idf = (
        (F.col("n_docs").cast("double") - F.col("df").cast("double"))
        + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tfnorm = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + (
            F.lit(1.2)
            * (
                F.lit(0.25)
                + (
                    F.lit(0.75)
                    * (
                        F.col("dl").cast("double")
                        / (
                            F.col("total_dl").cast("double")
                            / F.col("n_docs").cast("double")
                        )
                    )
                )
            )
        )
    )
    parts = (
        F.broadcast(qterms)
        .join(tf, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(dfr), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.floor((F.lit(1000000.0) * idf) * tfnorm)
            .cast("bigint")
            .alias("part_q"),
        )
    )
    scores = parts.groupBy("query_id", "doc_id").agg(
        F.sum("part_q").cast("bigint").alias("bm25_q")
    )
    w_r = Window.partitionBy("query_id").orderBy(
        F.col("bm25_q").desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w_r))
        .where(F.col("rnk") <= 10)
        .select(
            "query_id",
            "doc_id",
            "bm25_q",
            F.col("rnk").cast("int").alias("bm25_rank"),
        )
    )


@register(
    LLM_QUERIES,
    "doc_weighted_sample",
    """
    WITH w AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) & 9007199254740991 AS h53
      FROM documents),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w,
                   CAST(COUNT(*) AS BIGINT) AS n_docs FROM w),
    sel AS (
      SELECT w.doc_id, w.weight, t.total_w
      FROM w CROSS JOIN tot t
      WHERE CAST(w.h53 AS DOUBLE)
            < (((50.0 * CAST(w.weight AS DOUBLE))
                / CAST(t.total_w AS DOUBLE)) * 9007199254740992.0))
    SELECT doc_id, weight,
      abs(((CAST(COUNT(*) OVER () AS DOUBLE) * CAST(total_w AS DOUBLE))
           / 50.0) - CAST(total_w AS DOUBLE))
        <= 0.5 * CAST(total_w AS DOUBLE) AS ht_within_tol
    FROM sel
    """,
    "one-pass weighted Poisson sampling (expected k=50, probability "
    "proportional to n_chars): inclusion test compares a 53-bit md5 "
    "uniform against k*w/W scaled to 2^53 — one fixed IEEE expression, "
    "no random state, bit-identical membership across engines; the "
    "output carries a Horvitz-Thompson total-weight recovery boolean "
    "(|n_sel * W / k - W| <= 50%). Scale shape: one scan + a broadcast "
    "1-row total — the sampler for weighted data mixtures at 100 TB "
    "(no per-partition RNG coordination, deterministic replays).",
)
def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h53 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint").bitwiseAND(F.lit(9007199254740991))
    w = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        h53.alias("h53"),
    )
    tot = w.agg(
        F.sum("weight").cast("bigint").alias("total_w"),
        F.count("*").cast("bigint").alias("n_docs"),
    )
    sel = w.crossJoin(F.broadcast(tot)).where(
        F.col("h53").cast("double")
        < (
            (F.lit(50.0) * F.col("weight").cast("double"))
            / F.col("total_w").cast("double")
        )
        * F.lit(9007199254740992.0)
    )
    # COUNT(*) OVER () as a broadcast 1-row scalar, not an unpartitioned
    # window — no single-partition WindowExec, same value on every row.
    n_sel = sel.agg(F.count("*").cast("bigint").alias("__n_sel"))
    return sel.crossJoin(F.broadcast(n_sel)).select(
        "doc_id",
        "weight",
        (
            F.abs(
                (
                    F.col("__n_sel").cast("double")
                    * F.col("total_w").cast("double")
                )
                / F.lit(50.0)
                - F.col("total_w").cast("double")
            )
            <= F.lit(0.5) * F.col("total_w").cast("double")
        ).alias("ht_within_tol"),
    )
