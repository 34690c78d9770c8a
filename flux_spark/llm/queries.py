"""Oracle-gated queries for the LLM-pipeline layer.

Each entry pairs the Spark operator (dedup.py / similarity.py /
multimodal.py / text.py) with a DuckDB SQL twin computing the *same
algorithm* — same md5 hashing, same fold order for float sums, same
tie-breaks — so the driver's value-hash comparison is exact, even for
approximate ops like MinHash-LSH (approximation is deterministic, both
engines approximate identically).

Dedup queries run over an augmented corpus (documents + exact copies of
every 17th doc + suffix-perturbed copies of every 23rd doc) because the
synthetic tables contain no duplicates; the augmentation is pure SQL and
mirrored on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.registry import QuerySpec, load_table, register
from . import dedup, multimodal, similarity, text

LLM_QUERIES: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# shared corpus construction (Spark + SQL twins)
# ---------------------------------------------------------------------------

_NEAR_SUFFIX = " near dup suffix"

_CORPUS_CTE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 2000000000 AS doc_id, text || '{_NEAR_SUFFIX}' AS text
  FROM documents WHERE doc_id % 23 = 0
)
"""


def dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = d.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000000).alias("doc_id"), "text"
    )
    near = d.where(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 2000000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_NEAR_SUFFIX)).alias("text"),
    )
    return d.unionByName(exact).unionByName(near)


# SQL helpers -----------------------------------------------------------------


def _hexval(c: str) -> str:
    """SQL twin of dedup._hex_digit_val."""
    return f"(CASE WHEN ascii({c}) >= 97 THEN ascii({c}) - 87 ELSE ascii({c}) - 48 END)"


# distinct word-3-gram shingles, SQL twin of dedup.word_shingles(k=3)
_SHINGLE_CTES = """
, __toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus)
, __sh AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      ELSE list_transform(range(1, len(tk) - 1),
                          i -> array_to_string(tk[i:i+2], ' ')) END) AS sh
  FROM __toks)
, __sized AS (SELECT doc_id, sh, len(sh) AS n_sh FROM __sh)
"""


def _minhash_lsh_sql(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    rows = num_hashes // bands
    # same two-hash construction as dedup.minhash_signature: one md5 per
    # shingle, hash_i = (h1 + i*h2) mod 2^32 with h1/h2 = md5 words 1 and 3
    mins = ", ".join(
        f"list_min(list_transform(hs, m -> "
        f"(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) "
        f"+ {i} * CAST(('0x' || substring(m, 17, 8)) AS BIGINT)) % 4294967296))"
        for i in range(num_hashes)
    )
    return (
        _CORPUS_CTE
        + _SHINGLE_CTES
        + f"""
, __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized)
, __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed)
, __bh AS (
  SELECT s.doc_id, r.band,
         md5(array_to_string(list_transform(
           s.sig[r.band*{rows}+1 : r.band*{rows}+{rows}],
           v -> CAST(v AS VARCHAR)), '|')) AS bhash
  FROM __sigs s CROSS JOIN (SELECT range AS band FROM range(0, {bands})) r)
, __cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM __bh a JOIN __bh b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
, __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __common AS (
  SELECT c.id_a, c.id_b, ea.n_sh AS na, eb.n_sh AS nb, COUNT(*) AS cc
  FROM __cand c
  JOIN __ex ea ON ea.doc_id = c.id_a
  JOIN __ex eb ON eb.doc_id = c.id_b AND eb.g = ea.g
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, CAST(cc AS DOUBLE) / (na + nb - cc) AS jaccard
FROM __common
WHERE CAST(cc AS DOUBLE) / (na + nb - cc) >= {threshold}
"""
    )


def _ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return (
        _CORPUS_CTE
        + _SHINGLE_CTES
        + f"""
, __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS cc
  FROM __ex a JOIN __ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b, CAST(cc AS DOUBLE) / (na + nb - cc) AS jaccard
FROM __common
WHERE CAST(cc AS DOUBLE) / (na + nb - cc) >= {threshold}
"""
    )


def _simhash_cte(n_bits: int = 32) -> str:
    """CTEs computing __sims(doc_id, simhash) — twin of dedup.simhash."""
    n_digits = n_bits // 4
    digit_cols = ", ".join(
        f"{_hexval(f'substr(h, {d + 1}, 1)')} AS v{d}" for d in range(n_digits)
    )
    sum_cols = ", ".join(
        f"SUM(((v{j // 4} // {2 ** (j % 4)}) % 2) * 2 - 1) AS s{j}"
        for j in range(n_bits)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(n_bits)
    )
    return (
        _SHINGLE_CTES
        + f"""
, __feat AS (SELECT doc_id, md5(unnest(sh)) AS h FROM __sized)
, __digits AS (SELECT doc_id, {digit_cols} FROM __feat)
, __sums AS (SELECT doc_id, {sum_cols} FROM __digits GROUP BY doc_id)
, __sims AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM __sums)
"""
    )


def _simhash_sql(n_bits: int = 32) -> str:
    return _CORPUS_CTE + _simhash_cte(n_bits) + "SELECT doc_id, simhash FROM __sims"


def _simhash_pairs_sql(n_bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    width = n_bits // bands
    ham = " + ".join(
        f"(CASE WHEN (ha // {2 ** j}) % 2 <> (hb // {2 ** j}) % 2 THEN 1 ELSE 0 END)"
        for j in range(n_bits)
    )
    return (
        _CORPUS_CTE
        + _simhash_cte(n_bits)
        + f"""
, __banded AS (
  SELECT s.doc_id, s.simhash, r.band,
         (s.simhash // CAST(power(2, r.band * {width}) AS BIGINT)) % {2 ** width} AS sl
  FROM __sims s CROSS JOIN (SELECT range AS band FROM range(0, {bands})) r)
, __cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.simhash AS ha, b.simhash AS hb
  FROM __banded a JOIN __banded b
    ON a.band = b.band AND a.sl = b.sl AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST({ham} AS BIGINT) AS hamming
FROM __cand
WHERE {ham} <= {max_hamming}
"""
    )


# ---------------------------------------------------------------------------
# dedup queries
# ---------------------------------------------------------------------------


@register(
    LLM_QUERIES,
    "doc_dedup_exact",
    _CORPUS_CTE
    + "SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies FROM corpus GROUP BY text",
    "exact dedup: hash-groupBy on content digest, canonical id = min per group",
)
def doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(dup_corpus(spark, sf_dir))


@register(
    LLM_QUERIES,
    "doc_dedup_minhash_lsh",
    _minhash_lsh_sql(),
    "MinHash(16) + LSH(4x4 bands) near-dup pairs, Jaccard>=0.5 verified",
)
def doc_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(dup_corpus(spark, sf_dir), threshold=0.5)


def _minhash_est_sql(num_hashes: int = 16, bands: int = 4) -> str:
    rows = num_hashes // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, m -> "
        f"(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) "
        f"+ {i} * CAST(('0x' || substring(m, 17, 8)) AS BIGINT)) % 4294967296))"
        for i in range(num_hashes)
    )
    return (
        _CORPUS_CTE
        + _SHINGLE_CTES
        + f"""
, __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized)
, __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed)
, __bh AS (
  SELECT s.doc_id, r.band,
         md5(array_to_string(list_transform(
           s.sig[r.band*{rows}+1 : r.band*{rows}+{rows}],
           v -> CAST(v AS VARCHAR)), '|')) AS bhash
  FROM __sigs s CROSS JOIN (SELECT range AS band FROM range(0, {bands})) r)
, __cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM __bh a JOIN __bh b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id)
, __est AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_filter(range(1, {num_hashes + 1}),
                              i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)
           / {float(num_hashes)} AS est_jaccard
  FROM __cand c
  JOIN __sigs sa ON sa.doc_id = c.id_a
  JOIN __sigs sb ON sb.doc_id = c.id_b)
, __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __common AS (
  SELECT c.id_a, c.id_b, ea.n_sh AS na, eb.n_sh AS nb, COUNT(*) AS cc
  FROM __cand c
  JOIN __ex ea ON ea.doc_id = c.id_a
  JOIN __ex eb ON eb.doc_id = c.id_b AND eb.g = ea.g
  GROUP BY 1, 2, 3, 4)
SELECT e.id_a, e.id_b, e.est_jaccard,
       COALESCE(CAST(cc AS DOUBLE) / (na + nb - cc), 0.0) AS jaccard
FROM __est e
LEFT JOIN __common x ON x.id_a = e.id_a AND x.id_b = e.id_b
"""
    )


@register(
    LLM_QUERIES,
    "doc_minhash_jaccard_est",
    _minhash_est_sql(),
    "MinHash sketch calibration: estimated (agreeing signature positions / "
    "16) vs exact Jaccard for every LSH candidate pair — measures sketch "
    "error before trusting estimate-only dedup at scale",
)
def doc_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_jaccard_estimate(dup_corpus(spark, sf_dir))


@register(
    LLM_QUERIES,
    "doc_dedup_ngram_jaccard",
    _ngram_jaccard_sql(),
    "exact n-gram Jaccard pairs via inverted shingle index, >=0.5",
)
def doc_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(dup_corpus(spark, sf_dir), threshold=0.5)


@register(
    LLM_QUERIES,
    "doc_simhash",
    _simhash_sql(),
    "32-bit SimHash signature per document over shingle features",
)
def doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash(dup_corpus(spark, sf_dir))


@register(
    LLM_QUERIES,
    "doc_dedup_simhash",
    _simhash_pairs_sql(),
    "SimHash banded near-dup pairs, Hamming<=3 verified",
)
def doc_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(dup_corpus(spark, sf_dir))


@register(
    LLM_QUERIES,
    "doc_dedup_summary",
    f"""
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM (
         {_CORPUS_CTE} SELECT 1 FROM corpus GROUP BY text HAVING COUNT(*) >= 2
       ) tx) AS n_exact_groups,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_minhash_lsh_sql()}) tm)
        AS n_minhash_pairs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_simhash_pairs_sql()}) ts)
        AS n_simhash_pairs,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM ({_ngram_jaccard_sql()}) tn)
        AS n_ngram_pairs
    """,
    "dedup dashboard: the yield of every method over the same corpus in "
    "one row — exact duplicate groups, MinHash-LSH pairs, SimHash pairs, "
    "exact n-gram Jaccard pairs. The side-by-side a curation team reads "
    "to pick (and sanity-check) its dedup strategy: LSH missing pairs "
    "the exact inverted index finds means the banding is too strict",
)
def doc_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    exact = (
        dedup.exact_dedup_groups(corpus)
        .where(F.col("n_copies") >= 2)
        .agg(F.count("*").cast("bigint").alias("n_exact_groups"))
    )
    mh = dedup.minhash_lsh_pairs(corpus, threshold=0.5).agg(
        F.count("*").cast("bigint").alias("n_minhash_pairs")
    )
    sh = dedup.simhash_pairs(corpus).agg(
        F.count("*").cast("bigint").alias("n_simhash_pairs")
    )
    ng = dedup.ngram_jaccard_pairs(corpus, threshold=0.5).agg(
        F.count("*").cast("bigint").alias("n_ngram_pairs")
    )
    return exact.crossJoin(mh).crossJoin(sh).crossJoin(ng)


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
# similarity-search queries
# ---------------------------------------------------------------------------

_DIM = 64


def _brute_topk_sql(k: int = 5) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {similarity.sql_cosine("qv", "cv", _DIM)} AS cos_sim
      FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS "rank"
    FROM ranked WHERE rnk <= {k}
    """


@register(
    LLM_QUERIES,
    "ann_cosine_topk",
    _brute_topk_sql(),
    "brute-force exact cosine top-5 for 5 query vectors (broadcast queries)",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(e, e.where(F.col("vec_id") < 5), k=5)


_PLANES = similarity.hyperplanes(8, _DIM)

_EMB_AUG_CTE = f"""
WITH aug AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
  FROM embeddings WHERE vec_id % 29 = 0
  UNION ALL
  SELECT vec_id + 2000000000,
    list_prepend(CAST(embedding[1] AS DOUBLE) * CAST(1.5 AS DOUBLE),
                 list_transform(embedding[2:{_DIM}], x -> CAST(x AS DOUBLE)))
  FROM embeddings WHERE vec_id % 31 = 0
)
"""


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select(F.col("vec_id"), as_double.alias("v"))
    copies = e.where(F.col("vec_id") % 29 == 0).select(
        (F.col("vec_id") + 1000000000).alias("vec_id"), as_double.alias("v")
    )
    perturbed = e.where(F.col("vec_id") % 31 == 0).select(
        (F.col("vec_id") + 2000000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") * F.lit(1.5)),
            F.transform(
                F.slice("embedding", 2, _DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("v"),
    )
    return base.unionByName(copies).unionByName(perturbed)


@register(
    LLM_QUERIES,
    "emb_near_dup_lsh",
    _EMB_AUG_CTE
    + f"""
, sigs AS (SELECT vec_id, v, {similarity.sql_signature_bits("v", _PLANES, _DIM)} AS sig FROM aug)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {similarity.sql_cosine("a.v", "b.v", _DIM)} AS cos_sim
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98
""",
    "sign-LSH bucketed embedding near-dup pairs, cosine>=0.98 verified",
)
def emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_near_dup_pairs(
        _aug_embeddings(spark, sf_dir), vec_col="v", threshold=0.98
    )


_PLANES12 = similarity.hyperplanes(12, _DIM)


@register(
    LLM_QUERIES,
    "emb_near_dup_lsh_scaled",
    _EMB_AUG_CTE
    + f"""
, sigs AS (SELECT vec_id, v, {similarity.sql_signature_bits("v", _PLANES12, _DIM)} AS sig FROM aug)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {similarity.sql_cosine("a.v", "b.v", _DIM)} AS cos_sim
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98
""",
    "sign-LSH near-dup at 12 planes — the corpus-growth knob in action: "
    "candidate volume is ~n²/2^planes, so planes must track log2(n) as "
    "the corpus scales (8 planes for the sf0.1 gate, 12 here => 16× "
    "fewer pairs at the same corpus; recall trades against it). Same "
    "verify path, same exact-cosine oracle",
)
def emb_near_dup_lsh_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_near_dup_pairs(
        _aug_embeddings(spark, sf_dir),
        vec_col="v",
        n_planes=12,
        threshold=0.98,
    )


# auto-scaled LSH: plane count derived from the corpus COUNT at run time
# (auto_planes keeps expected bucket size ~constant as the corpus grows —
# the 100 TB knob). The oracle reproduces the derivation in SQL: it
# materializes sign bits for a 24-plane superset, derives np =
# auto_planes(COUNT(*)) as a scalar, and sums bits[i]*2^i over i < np.
_MAXP = 24
_PLANES_SUPER = similarity.hyperplanes(_MAXP, _DIM)

_AUTO_NP_SQL = """
SELECT CASE WHEN cnt <= 16 THEN 4
       ELSE GREATEST(4, CAST(CEIL(LOG2(cnt / 16.0)) AS INT)) END AS np
FROM (SELECT COUNT(*) AS cnt FROM aug)
"""


@register(
    LLM_QUERIES,
    "emb_near_dup_lsh_auto",
    _EMB_AUG_CTE
    + f"""
, params AS ({_AUTO_NP_SQL})
, bitsrc AS (
  SELECT vec_id, v,
         {similarity.sql_signature_bit_list("v", _PLANES_SUPER, _DIM)} AS bits
  FROM aug)
, sigs AS (
  SELECT vec_id, v,
         CAST(list_sum(list_transform(
           generate_series(0, (SELECT np FROM params) - 1),
           i -> CASE WHEN bits[CAST(i + 1 AS INT)]
                     THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                     ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
  FROM bitsrc)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {similarity.sql_cosine("a.v", "b.v", _DIM)} AS cos_sim
FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98
""",
    "sign-LSH near-dup with the plane count DERIVED from the corpus size "
    "(auto_planes: ceil(log2(n/16)), floored at 4) instead of pinned — "
    "the knob that keeps candidate volume linear as the corpus scales "
    "(sf0.01 -> 6 planes, sf10 -> 14). The oracle re-derives the same "
    "plane count from COUNT(*) in SQL and masks a 24-plane bit superset",
)
def emb_near_dup_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _aug_embeddings(spark, sf_dir)
    n_planes = similarity.auto_planes(corpus.count())
    return similarity.lsh_near_dup_pairs(
        corpus, vec_col="v", n_planes=n_planes, threshold=0.98
    )


@register(
    LLM_QUERIES,
    "emb_semantic_dedup_auto",
    _EMB_AUG_CTE
    + f"""
, params AS (
  SELECT GREATEST(1, CAST(CEIL(cnt / 256.0) AS INT)) AS k
  FROM (SELECT COUNT(*) AS cnt FROM aug)),
cen AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < (SELECT k FROM params)),
asg AS (
  SELECT vec_id, v, cid AS cluster_id FROM (
    SELECT a.vec_id, a.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {similarity.sql_cosine("a.v", "c.cv", _DIM)} DESC,
                                       c.cid ASC) AS rn
    FROM aug a CROSS JOIN cen c) WHERE rn = 1),
dups AS (
  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98
  GROUP BY b.vec_id)
SELECT g.vec_id, g.cluster_id, d.dup_of, d.dup_of IS NULL AS is_kept
FROM asg g LEFT JOIN dups d ON d.vec_id = g.vec_id
""",
    "SemDeDup with the centroid count DERIVED from the corpus size "
    "(auto_centroids: ceil(n/256), floored at 1) instead of pinned at 8 "
    "— K must track n to keep the sum(|cluster|^2) pair cost linear "
    "(sf0.01 -> 3 centroids, sf10 -> 834). The oracle re-derives K from "
    "COUNT(*) in SQL; same min-id survivor rule and 0.98 threshold",
)
def emb_semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _aug_embeddings(spark, sf_dir)
    k = similarity.auto_centroids(corpus.count(), target_cluster=256)
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    return similarity.semantic_dedup(
        corpus, centroids, vec_col="v", id_col="vec_id", threshold=0.98
    )


def _lsh_topk_sql(n_planes: int = 8, k: int = 5) -> str:
    sig = similarity.sql_signature_bits("embedding", _PLANES, _DIM)
    masks = ", ".join(f"CAST({2**i} AS BIGINT)" for i in range(n_planes))
    return f"""
    WITH c AS (
      SELECT vec_id AS neighbor_id, embedding AS cv,
             CAST({sig} AS BIGINT) AS sig
      FROM embeddings),
    qs AS (
      SELECT vec_id AS query_id, embedding AS qv,
             CAST({sig} AS BIGINT) AS qsig
      FROM embeddings WHERE vec_id < 5),
    probes AS (
      SELECT query_id, qv, qsig AS sig FROM qs
      UNION ALL
      SELECT query_id, qv, xor(qsig, m.m) AS sig
      FROM qs CROSS JOIN (SELECT unnest([{masks}]) AS m) m),
    scored AS (
      SELECT p.query_id, c.neighbor_id,
             {similarity.sql_cosine("p.qv", "c.cv", _DIM)} AS cos_sim
      FROM probes p JOIN c USING (sig)
      WHERE c.neighbor_id <> p.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS "rank"
    FROM ranked WHERE rnk <= {k}
    """


@register(
    LLM_QUERIES,
    "ann_cosine_lsh",
    _lsh_topk_sql(),
    "LSH-bucketed ANN: sign-signature bucket join with Hamming-1 "
    "multiprobe, exact-cosine top-5 rerank",
)
def ann_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(e, e.where(F.col("vec_id") < 5), k=5)


def _ivf_sql(n_centroids: int = 8, nprobe: int = 2, k: int = 5) -> str:
    cos_vc = similarity.sql_cosine("vv", "cv", _DIM)
    return f"""
    WITH cen AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {n_centroids}),
    corpus AS (SELECT vec_id, embedding AS vv FROM embeddings),
    assign_scored AS (
      SELECT c.vec_id, c.vv, n.cid, {cos_vc} AS ccos,
             ROW_NUMBER() OVER (PARTITION BY c.vec_id ORDER BY {cos_vc} DESC, n.cid ASC) AS r
      FROM corpus c CROSS JOIN cen n),
    assigned AS (SELECT vec_id AS neighbor_id, vv AS cv2, cid AS bucket FROM assign_scored WHERE r = 1),
    queries AS (SELECT vec_id, vv FROM corpus WHERE vec_id < 5),
    probe_scored AS (
      SELECT q.vec_id, q.vv, n.cid, {similarity.sql_cosine("q.vv", "cv", _DIM)} AS ccos,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {similarity.sql_cosine("q.vv", "cv", _DIM)} DESC, n.cid ASC) AS r
      FROM queries q CROSS JOIN cen n),
    probes AS (SELECT vec_id AS query_id, vv AS qv, cid AS bucket FROM probe_scored WHERE r <= {nprobe}),
    scored AS (
      SELECT p.query_id, a.neighbor_id,
             {similarity.sql_cosine("p.qv", "a.cv2", _DIM)} AS cos_sim
      FROM probes p JOIN assigned a USING (bucket)
      WHERE a.neighbor_id <> p.query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INT) AS "rank"
    FROM ranked WHERE rnk <= {k}
    """


@register(
    LLM_QUERIES,
    "ann_cosine_ivf",
    _ivf_sql(),
    "IVF ANN: 8 seed centroids, nprobe=2 bucket-pruned cosine top-5",
)
def ann_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.ivf_topk(
        e, e.where(F.col("vec_id") < 5), centroids, k=5, nprobe=2
    )


@register(
    LLM_QUERIES,
    "emb_pq_codes",
    similarity.sql_pq_encode(),
    "product quantization: 8 subspaces x 16 seed codes, per-vector code "
    "assignment (nearest L2, ties -> lowest code) + reconstruction error "
    "— the 256B->8B compression billion-vector search runs on; codebook "
    "broadcasts as one row, encoding is zero-shuffle. Output is one row "
    "per (vector, subspace): driver-sortable, no top-level arrays",
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    codebook = e.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("code_id"), "embedding"
    )
    return similarity.pq_encode(e, codebook).select(
        "vec_id", "recon_err", F.posexplode("codes").alias("sub_idx", "code")
    )


@register(
    LLM_QUERIES,
    "emb_pq_adc_topk",
    similarity.sql_pq_adc_topk(),
    "PQ asymmetric-distance top-5: per-query distance lookup tables "
    "(broadcast) summed over each candidate's 8 codes — n_sub lookups "
    "replace the 64-wide dot product, the query path that makes "
    "billion-vector search bandwidth-feasible",
)
def emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    codebook = e.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("code_id"), "embedding"
    )
    return similarity.pq_adc_topk(
        e, e.where(F.col("vec_id") < 5), codebook, k=5
    )


def _ivf_probe_sweep_sql(max_probe: int = 4, k: int = 5, n_q: int = 5) -> str:
    total = k * n_q
    probe_selects = "\n      UNION ALL\n".join(
        f"      SELECT {np} AS nprobe, query_id, neighbor_id "
        f"FROM ({_ivf_sql(nprobe=np)}) t{np}"
        for np in range(1, max_probe + 1)
    )
    return f"""
    WITH exact AS (SELECT query_id, neighbor_id FROM ({_brute_topk_sql()}) tx),
    probes AS (
{probe_selects}
    ),
    counts AS (
      SELECT pr.nprobe, COUNT(*) AS n_hit
      FROM probes pr JOIN exact e
        ON e.query_id = pr.query_id AND e.neighbor_id = pr.neighbor_id
      GROUP BY pr.nprobe)
    SELECT n.nprobe,
           CAST(COALESCE(c.n_hit, 0) AS BIGINT) AS n_hit,
           CAST(COALESCE(c.n_hit, 0) AS DOUBLE) / {total} AS recall_at_{k}
    FROM (SELECT CAST(unnest(range(1, {max_probe + 1})) AS INTEGER) AS nprobe) n
    LEFT JOIN counts c ON c.nprobe = n.nprobe
    """


@register(
    LLM_QUERIES,
    "emb_ivf_probe_sweep",
    _ivf_probe_sweep_sql(),
    "ANN tuning sweep: overall recall@5 vs nprobe (1..4 of 8 centroid "
    "buckets) — the cost/recall frontier an index owner walks before "
    "fixing nprobe for production; raising nprobe to K recovers exact "
    "search. (The sweep re-assigns per nprobe here for oracle clarity; "
    "a production sweep assigns once and varies only the probe list)",
)
def emb_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    centroids = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    exact = similarity.brute_force_topk(e, q, k=5).select(
        "query_id", "neighbor_id"
    )
    probes = None
    for np_ in range(1, 5):
        p = similarity.ivf_topk(e, q, centroids, k=5, nprobe=np_).select(
            F.lit(np_).cast("int").alias("nprobe"), "query_id", "neighbor_id"
        )
        probes = p if probes is None else probes.unionByName(p)
    counts = probes.join(exact, ["query_id", "neighbor_id"]).groupBy(
        "nprobe"
    ).agg(F.count("*").alias("n_hit"))
    grid = spark.range(1, 5).select(F.col("id").cast("int").alias("nprobe"))
    return grid.join(counts, "nprobe", "left").select(
        "nprobe",
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.lit(25)
        ).alias("recall_at_5"),
    )


def _hybrid_emb_aug_sql() -> str:
    """Embedding twin of _CORPUS_CTE's augmentation: same +1e9 exact /
    +2e9 perturbed id scheme, so text pairs and embedding pairs talk
    about the same documents."""
    return f"""
    eaug AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000000, list_transform(embedding, x -> CAST(x AS DOUBLE))
      FROM embeddings WHERE vec_id % 17 = 0
      UNION ALL
      SELECT vec_id + 2000000000,
        list_prepend(CAST(embedding[1] AS DOUBLE) * CAST(1.5 AS DOUBLE),
                     list_transform(embedding[2:{_DIM}], x -> CAST(x AS DOUBLE)))
      FROM embeddings WHERE vec_id % 23 = 0
    )"""


@register(
    LLM_QUERIES,
    "doc_dedup_hybrid",
    f"""
    WITH {_hybrid_emb_aug_sql().lstrip()},
    esigs AS (SELECT vec_id, v,
              {similarity.sql_signature_bits("v", _PLANES, _DIM)} AS sig
              FROM eaug),
    epairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {similarity.sql_cosine("a.v", "b.v", _DIM)} AS cos_sim
      FROM esigs a JOIN esigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
      WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98),
    tpairs AS (SELECT * FROM ({_minhash_lsh_sql()}) tsub)
    SELECT COALESCE(t.id_a, e.id_a) AS id_a,
           COALESCE(t.id_b, e.id_b) AS id_b,
           t.jaccard IS NOT NULL AS text_candidate,
           e.cos_sim IS NOT NULL AS emb_candidate,
           t.jaccard, e.cos_sim
    FROM tpairs t
    FULL JOIN epairs e ON e.id_a = t.id_a AND e.id_b = t.id_b
    """,
    "multi-signal near-dup ensemble: MinHash-LSH text pairs FULL OUTER "
    "JOINed with sign-LSH embedding pairs over the SAME augmented ids — "
    "per pair, which signal(s) fired plus both scores. The production "
    "curation pattern: text dedup misses paraphrases, embedding dedup "
    "misses short-text collisions; the union with per-signal evidence "
    "lets the pipeline set per-signal thresholds and audit disagreements",
)
def doc_dedup_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select(F.col("vec_id"), as_double.alias("v"))
    copies = e.where(F.col("vec_id") % 17 == 0).select(
        (F.col("vec_id") + 1000000000).alias("vec_id"), as_double.alias("v")
    )
    perturbed = e.where(F.col("vec_id") % 23 == 0).select(
        (F.col("vec_id") + 2000000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at("embedding", 1).cast("double") * F.lit(1.5)),
            F.transform(
                F.slice("embedding", 2, _DIM - 1), lambda x: x.cast("double")
            ),
        ).alias("v"),
    )
    eaug = base.unionByName(copies).unionByName(perturbed)
    epairs = similarity.lsh_near_dup_pairs(eaug, vec_col="v", threshold=0.98)
    tpairs = dedup.minhash_lsh_pairs(dup_corpus(spark, sf_dir), threshold=0.5)
    return (
        tpairs.join(epairs, ["id_a", "id_b"], "full")
        .select(
            "id_a",
            "id_b",
            F.col("jaccard").isNotNull().alias("text_candidate"),
            F.col("cos_sim").isNotNull().alias("emb_candidate"),
            "jaccard",
            "cos_sim",
        )
    )


@register(
    LLM_QUERIES,
    "emb_ivf_recall",
    f"""
    WITH exact AS (SELECT query_id, neighbor_id FROM ({_brute_topk_sql()}) t),
    ivf AS (SELECT query_id, neighbor_id, 1 AS hit FROM ({_ivf_sql()}) t)
    SELECT e.query_id,
           CAST(COUNT(i.hit) AS BIGINT) AS n_hit,
           CAST(COUNT(i.hit) AS DOUBLE) / 5 AS recall_at_5
    FROM exact e LEFT JOIN ivf i
      ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    "ANN calibration: recall@5 of the IVF index vs exact brute force per "
    "query — the measurement a pipeline runs on its own corpus before "
    "trusting approximate retrieval at scales where exact search is "
    "unaffordable (the companion of the MinHash est-vs-exact view)",
)
def emb_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(e, q, k=5).select(
        "query_id", "neighbor_id"
    )
    centroids = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    ivf = (
        similarity.ivf_topk(e, q, centroids, k=5, nprobe=2)
        .select("query_id", "neighbor_id")
        .withColumn("__hit", F.lit(1))
    )
    return (
        exact.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("__hit").cast("bigint").alias("n_hit"),
            (F.count("__hit").cast("double") / F.lit(5)).alias("recall_at_5"),
        )
    )


@register(
    LLM_QUERIES,
    "emb_kmeans_refine",
    f"""
    WITH cen AS (
      SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings WHERE vec_id < 8),
    corp AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    scored AS (
      SELECT c.vec_id, cen.cid, {similarity.sql_cosine("v", "cv", _DIM)} AS cc
      FROM corp c CROSS JOIN cen),
    best AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cc DESC, cid ASC) AS rn
        FROM scored) WHERE rn = 1),
    ex AS (
      SELECT b.cid AS bucket, i.i - 1 AS dim_idx, c.v[i.i] AS val
      FROM best b
      JOIN corp c USING (vec_id)
      CROSS JOIN (SELECT CAST(range AS INT) + 1 AS i FROM range(0, {_DIM})) i),
    per_dim AS (
      SELECT bucket, dim_idx,
             CAST(SUM(CAST(val AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS m
      FROM ex GROUP BY bucket, dim_idx)
    SELECT bucket AS centroid_id, CAST(dim_idx AS INT) AS dim_idx,
           m AS dim_value
    FROM per_dim
    """,
    "one Lloyd iteration of IVF centroid training: max-cosine assignment + "
    "exact per-dimension decimal means (iterate driver-side for full "
    "k-means). Output is one row per (centroid, dimension): "
    "driver-sortable, no top-level arrays",
)
def emb_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.kmeans_refine(e, centroids, dim=_DIM).select(
        "centroid_id", F.posexplode("centroid").alias("dim_idx", "dim_value")
    )


# ---------------------------------------------------------------------------
# multimodal query
# ---------------------------------------------------------------------------


def _media_sql() -> str:
    hv = _hexval
    byte_terms = " + ".join(
        f"({hv(f'substr(h, {2 * i + 1}, 1)')} * 16 + {hv(f'substr(h, {2 * i + 2}, 1)')})"
        for i in range(16)
    )
    hex_terms = " + ".join(hv(f"substr(h, {i + 1}, 1)") for i in range(32))
    first = f"({hv('substr(h, 1, 1)')} * 16 + {hv('substr(h, 2, 1)')})"
    last = f"({hv('substr(h, 31, 1)')} * 16 + {hv('substr(h, 32, 1)')})"
    return f"""
    WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)
    SELECT doc_id, 16 AS n_bytes, CAST({byte_terms} AS BIGINT) AS byte_sum,
           {first} AS first_byte, {last} AS last_byte,
           CAST({hex_terms} AS BIGINT) AS hex_digit_sum
    FROM m
    """


@register(
    LLM_QUERIES,
    "media_byte_features",
    _media_sql(),
    "binary media column -> Arrow-batched mapInPandas feature extraction",
)
def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return multimodal.byte_features(multimodal.with_fake_media(d))


def _media_chunks_sql(chunk_size: int = 4) -> str:
    hv = _hexval
    n_chunks = 16 // chunk_size  # fake payload is the 16-byte md5 digest
    parts = []
    for c in range(n_chunks):
        byte_terms = " + ".join(
            f"({hv(f'substr(h, {2 * (c * chunk_size + i) + 1}, 1)')} * 16 "
            f"+ {hv(f'substr(h, {2 * (c * chunk_size + i) + 2}, 1)')})"
            for i in range(chunk_size)
        )
        parts.append(
            f"SELECT doc_id, {c} AS chunk_idx, {chunk_size} AS n_bytes, "
            f"CAST({byte_terms} AS BIGINT) AS chunk_sum FROM m"
        )
    return (
        "WITH m AS (SELECT doc_id, md5(text) AS h FROM documents)\n"
        + "\nUNION ALL\n".join(parts)
    )


@register(
    LLM_QUERIES,
    "media_frame_chunks",
    _media_chunks_sql(),
    "payload -> fixed-size chunk rows via mapInPandas (frame-sampling shape: "
    "one row per sampled frame, fan-out inside the Arrow batch)",
)
def media_frame_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return multimodal.chunk_payloads(multimodal.with_fake_media(d), chunk_size=4)


@register(
    LLM_QUERIES,
    "media_type_sniff",
    """
    WITH signed AS (
      SELECT doc_id,
        from_hex(CASE CAST(doc_id % 6 AS INTEGER)
          WHEN 0 THEN '89504E470D0A1A0A'
          WHEN 1 THEN 'FFD8FFE0'
          WHEN 2 THEN 'FFD8FFE1'
          WHEN 3 THEN '52494646'
          WHEN 4 THEN '0000001866747970'
          ELSE '0000002066747970' END || md5(text)) AS media
      FROM documents)
    SELECT doc_id,
      CASE WHEN substring(hex(media), 1, 16) = '89504E470D0A1A0A' THEN 'png'
           WHEN substring(hex(media), 1, 6) = 'FFD8FF' THEN 'jpeg'
           WHEN substring(hex(media), 1, 8) = '52494646' THEN 'riff'
           WHEN substring(hex(media), 9, 8) = '66747970' THEN 'mp4'
           ELSE 'unknown' END AS detected,
      CAST(octet_length(media) AS INTEGER) AS n_bytes,
      substring(hex(media), 1, 16) AS header_hex
    FROM signed
    """,
    "container-format sniffing on binary payloads: PREFIX magic-number "
    "rules (PNG; any FFD8FF-prefixed JPEG incl. JFIF+EXIF; RIFF; 'ftyp' "
    "at bytes 5-8 for any MP4 box size) matched with pure byte/hex "
    "expressions — the codec-free pre-decode dispatch that routes each "
    "blob to the right decoder at scan bandwidth",
)
def media_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return multimodal.sniff_media_type(multimodal.with_signed_media(d))


@register(
    LLM_QUERIES,
    "media_decode_image",
    """
    SELECT doc_id,
           CAST(4 + doc_id % 5 AS INTEGER) AS width,
           CAST(3 + doc_id % 4 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(list_transform(
             generate_series(0, (4 + doc_id % 5) * (3 + doc_id % 4) * 3 - 1),
             i -> (doc_id * 7 + i) % 256)) AS BIGINT) AS pixel_sum
    FROM documents
    """,
    "REAL PNG decode (stdlib zlib/struct codec, codecs.py): per document "
    "a genuine PNG file is synthesized (signature, CRC'd IHDR/IDAT/IEND, "
    "DEFLATE scanlines) and decoded back through full chunk-walk + "
    "un-filtering; the oracle recomputes width/height/pixel_sum "
    "symbolically from the synthesis formula, so a single corrupted byte "
    "in either codec direction fails the gate. Container has no "
    "PIL/cv2/soundfile (probed r4+r5) — this is the no-external-deps "
    "real-codec path; JPEG/MP4 remain documented stubs",
)
def media_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.decode_image(multimodal.with_png_media(d))


@register(
    LLM_QUERIES,
    "media_decode_audio",
    """
    SELECT doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(1 AS INTEGER) AS n_channels,
           CAST(64 + doc_id % 64 AS INTEGER) AS n_frames,
           CAST((64 + doc_id % 64) * 1000 // 8000 AS INTEGER) AS duration_ms,
           CAST(list_sum(list_transform(
             generate_series(0, 64 + doc_id % 64 - 1),
             k -> abs((doc_id * 31 + k * 17) % 65536 - 32768))) AS BIGINT)
             AS abs_sum
    FROM documents
    """,
    "REAL RIFF/WAVE decode (stdlib `wave` chunk parser + PCM16 frame "
    "unpack): per document a genuine playable WAV is synthesized and "
    "decoded back; sample-rate/frames/duration/abs-amplitude-sum are "
    "recomputed symbolically by the oracle from the synthesis formula",
)
def media_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return multimodal.decode_audio(multimodal.with_wav_media(d))


# ---------------------------------------------------------------------------
# duplicate-cluster resolution
# ---------------------------------------------------------------------------


def _dedup_clusters_sql(threshold: float = 0.5) -> str:
    """Recursive-CTE twin of minhash pairs -> connected components: walk
    enumerates every (vertex, reachable-vertex) over the symmetric edge
    set; MIN over reachables = the component's canonical id."""
    body = _minhash_lsh_sql(threshold=threshold)
    # reuse the minhash CTE chain up to __common, then cluster recursively
    prefix = body[: body.index("SELECT id_a, id_b,")]
    return (
        prefix.replace("WITH corpus AS", "WITH RECURSIVE corpus AS")
        + f"""
, __pairs AS (
  SELECT id_a, id_b FROM __common
  WHERE CAST(cc AS DOUBLE) / (na + nb - cc) >= {threshold})
, __edges AS (
  SELECT id_a AS src, id_b AS dst FROM __pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM __pairs)
, walk(id, comp) AS (
  SELECT DISTINCT src, src FROM __edges
  UNION
  SELECT e.src, w.comp FROM walk w JOIN __edges e ON e.dst = w.id)
, comps AS (SELECT id, MIN(comp) AS cluster_id FROM walk GROUP BY id)
SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id) AS cluster_id
FROM corpus c LEFT JOIN comps k ON k.id = c.doc_id
"""
    )


@register(
    LLM_QUERIES,
    "doc_dedup_clusters",
    _dedup_clusters_sql(),
    "transitive duplicate clusters: MinHash-LSH pairs -> iterative "
    "min-label-propagation connected components (singletons keep own id)",
)
def doc_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(corpus, threshold=0.5)
    return dedup.connected_components(pairs, vertices=corpus.select("doc_id"))


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


# 5-gram shingles over corpus/benchmark halves; benchmark = every 97th doc
_CONTAM_SQL = """
WITH bt AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
            WHERE doc_id % 97 = 0),
bsh AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - 3),
                             i -> array_to_string(tk[i:i+4], ' ')) END) AS sh
  FROM bt),
ct AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
       WHERE doc_id % 97 <> 0),
csh AS (
  SELECT doc_id,
    list_distinct(
      CASE WHEN len(tk) < 5 THEN [array_to_string(tk, ' ')]
           ELSE list_transform(range(1, len(tk) - 3),
                               i -> array_to_string(tk[i:i+4], ' ')) END) AS shs
  FROM ct),
cex AS (SELECT doc_id, CAST(len(shs) AS BIGINT) AS n_shingles, unnest(shs) AS sh
        FROM csh)
SELECT c.doc_id, c.n_shingles,
       COUNT(*) AS n_contaminated,
       CAST(COUNT(*) AS DOUBLE) / c.n_shingles AS contamination_rate
FROM cex c JOIN bsh b ON b.sh = c.sh
GROUP BY c.doc_id, c.n_shingles
"""


@register(
    LLM_QUERIES,
    "doc_contamination",
    _CONTAM_SQL,
    "benchmark decontamination: corpus docs sharing word-5-grams with the "
    "benchmark subset (broadcast benchmark shingle set; corpus never shuffles)",
)
def doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.where(F.col("doc_id") % 97 == 0)
    corpus = d.where(F.col("doc_id") % 97 != 0)
    return dedup.contamination(corpus, bench, k=5)


@register(
    LLM_QUERIES,
    "lsh_tuning_curve",
    """
    WITH cfg AS (
      SELECT unnest([struct_pack(bands := 4, rows_per_band := 4),
                     struct_pack(bands := 8, rows_per_band := 2),
                     struct_pack(bands := 2, rows_per_band := 8),
                     struct_pack(bands := 8, rows_per_band := 4),
                     struct_pack(bands := 16, rows_per_band := 2)], recursive := true)),
    grid AS (SELECT CAST(i AS DOUBLE) / 20 AS jaccard
             FROM unnest(range(1, 20)) AS t(i)),
    curve AS (
      SELECT bands, rows_per_band, jaccard,
        list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
          list_transform(range(1, rows_per_band + 1), x -> jaccard)),
          (acc, v) -> acc * v) AS p_band
      FROM cfg CROSS JOIN grid)
    SELECT bands, rows_per_band, jaccard, p_band,
      1 - list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
            list_transform(range(1, bands + 1), x -> 1 - p_band)),
            (acc, v) -> acc * v) AS p_detect
    FROM curve
    """,
    "LSH design table: detection probability 1-(1-s^r)^b over a Jaccard "
    "grid for candidate (bands, rows) configs — how a pipeline picks its "
    "banding before a 100 TB dedup run. Powers are computed as ordered "
    "repeated multiplication (not pow()), so both engines agree "
    "bit-for-bit",
)
def lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfgs = [(4, 4), (8, 2), (2, 8), (8, 4), (16, 2)]
    cfg = spark.createDataFrame(cfgs, "bands int, rows_per_band int")
    grid = spark.range(1, 20).select(
        (F.col("id").cast("double") / 20).alias("jaccard")
    )

    def pown(base: F.Column, n: F.Column) -> F.Column:
        # ordered repeated multiplication: fold over [1..n]
        return F.aggregate(
            F.transform(F.sequence(F.lit(1), n), lambda _: base),
            F.lit(1.0),
            lambda acc, v: acc * v,
        )

    curve = cfg.crossJoin(grid).withColumn(
        "p_band", pown(F.col("jaccard"), F.col("rows_per_band"))
    )
    return curve.select(
        "bands",
        "rows_per_band",
        "jaccard",
        "p_band",
        (1 - pown(1 - F.col("p_band"), F.col("bands"))).alias("p_detect"),
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
    "lands in (exclusive running sum -> floor-div). The window is a "
    "single global ordering — at 100 TB replace with per-shard packing "
    "(partitionBy(shard) and the same expressions) to avoid the "
    "single-partition sort; the per-row math is unchanged",
)
def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_chars").over(w), F.lit(0)).cast("bigint")
    return d.select(
        "doc_id",
        "n_chars",
        start.alias("start_pos"),
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
    "doc_dup_span_removal",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), grams AS (
      SELECT doc_id, i - 1 AS gp, array_to_string(l[i:i+7], ' ') AS gram
      FROM toks, unnest(generate_series(1, len(l) - 7)) AS t(i)
    ), dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), covered AS (
      SELECT DISTINCT doc_id, gp + off AS pos
      FROM grams, unnest(generate_series(0, 7)) AS o(off)
      WHERE gram IN (SELECT gram FROM dup)
    ), tok_rows AS (
      SELECT doc_id, i - 1 AS pos, l[i] AS tok
      FROM toks, unnest(generate_series(1, len(l))) AS t(i)
    ), kept AS (
      SELECT t.doc_id, t.pos, t.tok FROM tok_rows t
      WHERE NOT EXISTS (
        SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.pos = t.pos
      )
    ), agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT m.doc_id,
           COALESCE(a.clean_text, '') AS clean_text,
           CAST(len(m.l) AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept_tokens
    FROM toks m LEFT JOIN agg a USING (doc_id)
    """,
    "exact duplicate-span removal (Lee et al. 2022 substring dedup, "
    "k-gram form): every token inside a token 8-gram occurring in >= 2 "
    "distinct documents is dropped, and the surviving tokens are "
    "reassembled in order — the oracle recomputes the identical span "
    "cover in SQL, so the cleaned text matches byte-for-byte",
)
def doc_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.dup_span_dedup(d, k=8, min_docs=2)


@register(
    LLM_QUERIES,
    "emb_semantic_dedup",
    _EMB_AUG_CTE
    + f"""
, cen AS (
  SELECT vec_id AS cid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
  FROM embeddings WHERE vec_id < 8),
asg AS (
  SELECT vec_id, v, cid AS cluster_id FROM (
    SELECT a.vec_id, a.v, c.cid,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {similarity.sql_cosine("a.v", "c.cv", _DIM)} DESC,
                                       c.cid ASC) AS rn
    FROM aug a CROSS JOIN cen c) WHERE rn = 1),
dups AS (
  SELECT b.vec_id, MIN(a.vec_id) AS dup_of
  FROM asg a JOIN asg b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
  WHERE {similarity.sql_cosine("a.v", "b.v", _DIM)} >= 0.98
  GROUP BY b.vec_id)
SELECT g.vec_id, g.cluster_id, d.dup_of, d.dup_of IS NULL AS is_kept
FROM asg g LEFT JOIN dups d ON d.vec_id = g.vec_id
""",
    "SemDeDup (Abbas et al. 2023) semantic dedup: max-cosine centroid "
    "assignment (8 broadcast centroids), within-cluster-only pairwise "
    "cosine, min-id survivor per >=0.98 group — pair cost is "
    "sum(|cluster|^2), kept linear at scale by growing K with the corpus "
    "(auto_centroids), never the n^2 all-pairs matrix",
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    return similarity.semantic_dedup(
        _aug_embeddings(spark, sf_dir),
        centroids,
        vec_col="v",
        id_col="vec_id",
        threshold=0.98,
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


def _dedup_keep_best_sql(threshold: float = 0.5) -> str:
    """Clusters + quality-aware retention: keep the LONGEST member of
    each duplicate cluster (tie-break min id) instead of the min-id one."""
    base = _dedup_clusters_sql(threshold)
    final = (
        "SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id) AS cluster_id\n"
        "FROM corpus c LEFT JOIN comps k ON k.id = c.doc_id"
    )
    assert final in base
    return base.replace(
        final,
        """
, clusters AS (
  SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id) AS cluster_id,
         CAST(length(c.text) AS BIGINT) AS doc_len
  FROM corpus c LEFT JOIN comps k ON k.id = c.doc_id)
SELECT doc_id, cluster_id, doc_len,
       ROW_NUMBER() OVER (PARTITION BY cluster_id
                          ORDER BY doc_len DESC, doc_id ASC) = 1 AS is_kept
FROM clusters
""",
    )


@register(
    LLM_QUERIES,
    "doc_dedup_keep_best",
    _dedup_keep_best_sql(),
    "quality-aware dedup retention: transitive MinHash-LSH duplicate "
    "clusters, but each cluster keeps its LONGEST member (tie-break min "
    "id) instead of the min-id one — the curation policy that preserves "
    "the most complete copy of near-duplicated content; one extra narrow "
    "window over (cluster_id, len, id) rows on top of the cluster plan",
)
def doc_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    corpus = dup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(corpus, threshold=0.5)
    comps = dedup.connected_components(pairs, vertices=corpus.select("doc_id"))
    scored = comps.join(
        corpus.select(
            "doc_id", F.length("text").cast("bigint").alias("doc_len")
        ),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("doc_len"), F.asc("doc_id")
    )
    return scored.select(
        "doc_id",
        "cluster_id",
        "doc_len",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


@register(
    LLM_QUERIES,
    "doc_dedup_minhash_scaled",
    _minhash_lsh_sql(num_hashes=32, bands=4),
    "MinHash(32) + LSH(4x8 bands) near-dup pairs — the text-dedup "
    "corpus-growth knob in action (twin of emb_near_dup_lsh_scaled): "
    "doubling rows-per-band from 4 to 8 squares down each band's "
    "collision probability, so candidate volume stays tractable as the "
    "corpus grows while the exact-Jaccard verify keeps precision; "
    "recall at the 0.5 threshold trades against it (s^8 band-match "
    "curve vs s^4). Same oracle machinery, 32-hash signatures "
    "(h1 + 31*h2 < 2^37, still exact int64)",
)
def doc_dedup_minhash_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        dup_corpus(spark, sf_dir), num_hashes=32, bands=4, threshold=0.5
    )


@register(
    LLM_QUERIES,
    "emb_mips_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id, {similarity.sql_dot("qv", "cv", _DIM)} AS ip
      FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY ip DESC, neighbor_id ASC) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, ip, CAST(rnk AS INT) AS "rank"
    FROM ranked WHERE rnk <= 5
    """,
    "exact maximum-inner-product top-5 (MIPS, the ANN objective when "
    "magnitudes carry signal — recommendation retrieval, unnormalized "
    "two-tower embeddings): broadcast queries, one corpus pass, raw "
    "float64-fold dot product scores bit-matched by the oracle",
)
def emb_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.mips_topk(e, e.where(F.col("vec_id") < 5), k=5)


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
