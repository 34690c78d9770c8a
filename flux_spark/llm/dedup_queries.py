"""Dedup-family queries: exact, MinHash-LSH, SimHash, n-gram Jaccard, duplicate clusters, contamination, span removal, LSH tuning.

Split from ``llm/queries.py`` (registry hygiene, VERDICT r5 #6): shared
corpus augmentation (``dup_corpus`` / ``_CORPUS_CTE``) and ``_hexval``
stay in ``queries.py``; every entry here registers into the same
``LLM_QUERIES`` dict on import. See ``queries.py`` for the oracle-parity
contract all entries follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics.registry import load_table, register
from . import dedup
from .queries import LLM_QUERIES, _CORPUS_CTE, _hexval, dup_corpus, dup_corpus_count

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


def _minhash_lsh_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    corpus_cte: str | None = None,
) -> str:
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
        (corpus_cte if corpus_cte is not None else _CORPUS_CTE)
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


def _minhash_lsh_auto_sql(num_hashes: int = 16, threshold: float = 0.5) -> str:
    """LSH pair SQL with rows-per-band DERIVED from COUNT(*) — the oracle
    twin of dedup.auto_band_rows: a 1-row params CTE computes (rows,
    bands) from the corpus count, band hashes slice the signature by the
    derived width, and the band range is filtered by the derived count."""
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
, params AS (
  SELECT CASE WHEN cnt <= 4096 THEN 4 ELSE 8 END AS rws,
         CASE WHEN cnt <= 4096 THEN 4 ELSE 2 END AS nb
  FROM (SELECT COUNT(*) AS cnt FROM corpus))
, __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized)
, __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed)
, __bh AS (
  SELECT s.doc_id, r.band,
         md5(array_to_string(list_transform(
           s.sig[r.band*p.rws+1 : r.band*p.rws+p.rws],
           v -> CAST(v AS VARCHAR)), '|')) AS bhash
  FROM __sigs s, params p, (SELECT range AS band FROM range(0, 4)) r
  WHERE r.band < p.nb)
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


@register(
    LLM_QUERIES,
    "doc_dedup_minhash_lsh_auto",
    _minhash_lsh_auto_sql(),
    "MinHash(16)-LSH near-dup pairs with rows-per-band DERIVED from the "
    "corpus size (auto_band_rows: 4-row/4-band bands up to 4096 docs — "
    "identical to the pinned gate — then 8-row/2-band beyond, which "
    "multiplies per-band candidate admission by s^4 and converts the "
    "measured 54 s sf10 fixed-knob tail to output-bound work; S-curve "
    "midpoint rises 0.71 -> 0.92, the documented trade on duplicate-"
    "heavy corpora). Oracle re-derives (rows, bands) from COUNT(*); "
    "same exact-Jaccard >= 0.5 verification",
)
def doc_dedup_minhash_lsh_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    rows = dedup.auto_band_rows(dup_corpus_count(spark, sf_dir))
    return dedup.minhash_lsh_pairs(
        corpus, threshold=0.5, num_hashes=16, bands=16 // rows
    )


def _minhash_collapse_sql(
    num_hashes: int = 16, threshold: float = 0.5, max_bucket_size: int = 500
) -> str:
    """Oracle of dedup.minhash_collapse: exact collapse onto the min-id
    canonical per text, auto-banded LSH (rows derived from the SURVIVOR
    count) with the production bucket cap over canonicals only, greedy
    min-id near-dup survivor rule, one row per input document."""
    mins = ", ".join(
        f"list_min(list_transform(hs, m -> "
        f"(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) "
        f"+ {i} * CAST(('0x' || substring(m, 17, 8)) AS BIGINT)) % 4294967296))"
        for i in range(num_hashes)
    )
    return (
        _CORPUS_CTE
        + """
, __can AS (SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY text) AS m
            FROM corpus)
, surv AS (SELECT doc_id, text FROM __can WHERE doc_id = m)
"""
        + _SHINGLE_CTES.replace("FROM corpus", "FROM surv")
        + f"""
, params AS (
  SELECT CASE WHEN cnt <= 4096 THEN 4 ELSE 8 END AS rws,
         CASE WHEN cnt <= 4096 THEN 4 ELSE 2 END AS nb
  FROM (SELECT COUNT(*) AS cnt FROM surv))
, __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized)
, __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed)
, __bh AS (
  SELECT s.doc_id, r.band,
         md5(array_to_string(list_transform(
           s.sig[r.band*p.rws+1 : r.band*p.rws+p.rws],
           v -> CAST(v AS VARCHAR)), '|')) AS bhash
  FROM __sigs s, params p, (SELECT range AS band FROM range(0, 4)) r
  WHERE r.band < p.nb
  QUALIFY COUNT(*) OVER (PARTITION BY r.band, bhash) <= {max_bucket_size})
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
, __dups AS (
  SELECT id_b AS doc_id, MIN(id_a) AS dup_of FROM __common
  WHERE CAST(cc AS DOUBLE) / (na + nb - cc) >= {threshold}
  GROUP BY id_b)
SELECT c.doc_id,
       CASE WHEN c.doc_id <> c.m THEN c.m ELSE d.dup_of END AS dup_of,
       CASE WHEN c.doc_id <> c.m THEN 'exact'
            WHEN d.dup_of IS NOT NULL THEN 'near' END AS reason,
       (c.doc_id = c.m AND d.dup_of IS NULL) AS is_kept
FROM __can c LEFT JOIN __dups d ON d.doc_id = c.doc_id
"""
    )


@register(
    LLM_QUERIES,
    "doc_dedup_minhash_collapse",
    _minhash_collapse_sql(),
    "per-document MinHash-LSH dedup verdicts — the SCALE form of the "
    "pair enumerators (r12, VERDICT r11 #4): pair output is inherently "
    "quadratic on duplicate-heavy corpora (d copies -> d(d-1)/2 pairs, "
    "the r9 output-bound law behind the three sf100 wall skips), while "
    "what a pipeline consumes is one verdict per doc. Exact dedup "
    "collapses identical texts first (digest groupBy — the duplicate "
    "mass never reaches the bucket join), auto-banded LSH with the "
    "production 500-doc bucket cap runs over canonicals only, and the "
    "greedy min-id rule labels every doc (dup_of, reason exact|near, "
    "is_kept). Linear output; replaces the pair forms in the bench "
    "headline (they stay correctness-gated here at sf0.01)",
)
def doc_dedup_minhash_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    # survivor count via the digest the collapse itself keys on (md5
    # equality IS the operator's text-equality), as ONE partial-aggregated
    # count-distinct — .distinct().count() on raw text shuffled full
    # document bytes to derive a scalar (r13, guide §2.3)
    n_surv = int(
        corpus.select(F.md5("text").alias("__d"))
        .agg(F.count_distinct("__d"))
        .first()[0]
    )
    rows = dedup.auto_band_rows(n_surv)
    return dedup.minhash_collapse(
        corpus, threshold=0.5, num_hashes=16, bands=16 // rows,
        max_bucket_size=500,
    )


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
    "doc_containment",
    _CORPUS_CTE
    + _SHINGLE_CTES
    + """
, __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         COUNT(*) AS cc
  FROM __ex a JOIN __ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       CAST(cc AS DOUBLE) / na AS containment_a_in_b,
       CAST(cc AS DOUBLE) / nb AS containment_b_in_a,
       CAST(cc AS DOUBLE) / (na + nb - cc) AS jaccard
FROM __common
WHERE greatest(CAST(cc AS DOUBLE) / na, CAST(cc AS DOUBLE) / nb) >= 0.8
""",
    "asymmetric shingle containment |A∩B|/|A| (r8): the subset/quote "
    "detector Jaccard structurally misses — a short doc embedded in a "
    "long one has tiny Jaccard but containment 1.0; curation drops the "
    "CONTAINED side, not either-of-the-pair. Exact intersections via the "
    "same inverted shingle index as doc_dedup_ngram_jaccard; both "
    "directions scored, pairs kept when either >= 0.8",
)
def doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.containment_pairs(dup_corpus(spark, sf_dir), threshold=0.8)


@register(
    LLM_QUERIES,
    "doc_containment_auto",
    _CORPUS_CTE
    + _SHINGLE_CTES
    + """
, params AS (
  SELECT GREATEST(16, 2 * CAST(CEIL(log2(CAST(cnt AS DOUBLE))) AS BIGINT))
         AS maxdf
  FROM (SELECT COUNT(*) AS cnt FROM corpus))
, __ex0 AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __rare AS (
  SELECT g FROM __ex0 GROUP BY g
  HAVING COUNT(*) <= (SELECT maxdf FROM params))
, __ex AS (SELECT e.doc_id, e.n_sh, e.g FROM __ex0 e JOIN __rare r USING (g))
, __common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         COUNT(*) AS cc
  FROM __ex a JOIN __ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
SELECT id_a, id_b,
       CAST(cc AS DOUBLE) / na AS containment_a_in_b,
       CAST(cc AS DOUBLE) / nb AS containment_b_in_a,
       CAST(cc AS DOUBLE) / (na + nb - cc) AS jaccard
FROM __common
WHERE greatest(CAST(cc AS DOUBLE) / na, CAST(cc AS DOUBLE) / nb) >= 0.8
""",
    "containment with the DERIVED shingle-df winnowing prefilter (r11, "
    "VERDICT r10 #6): max_doc_freq = max(16, 2*ceil(log2 n)) drops "
    "boilerplate shingles BEFORE the inverted-index self-join, bounding "
    "candidate volume at cap x corpus (linear) where the unfiltered "
    "enumeration is output-bound on duplicate-heavy corpora; containment "
    "denominators stay the FULL shingle counts. Oracle re-derives the "
    "cap from COUNT(*) and applies the identical df filter",
)
def doc_containment_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    return dedup.containment_pairs(
        corpus,
        threshold=0.8,
        max_doc_freq=dedup.auto_max_doc_freq(dup_corpus_count(spark, sf_dir)),
    )


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


# cross-source leakage corpus: originals keep their real source; the
# replicated copies (same offsets as _CORPUS_CTE) are stamped 'replica',
# so every detected near-dup pair spanning two sources is "leakage"
_LEAK_CORPUS_BODY = """
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000000 AS doc_id, text, 'replica' AS source
  FROM documents WHERE doc_id % 17 = 0
  UNION ALL
  SELECT doc_id + 2000000000 AS doc_id, text || ' near dup suffix' AS text,
         'replica' AS source
  FROM documents WHERE doc_id % 23 = 0
"""


def _cross_source_leakage_sql() -> str:
    inner = _minhash_lsh_sql(
        corpus_cte=f"WITH corpus AS ({_LEAK_CORPUS_BODY})\n"
    )
    return f"""
    WITH pairs AS ({inner}),
    c2 AS ({_LEAK_CORPUS_BODY}),
    x AS (
      SELECT LEAST(ca.source, cb.source) AS source_a,
             GREATEST(ca.source, cb.source) AS source_b
      FROM pairs p
      JOIN c2 ca ON ca.doc_id = p.id_a
      JOIN c2 cb ON cb.doc_id = p.id_b
      WHERE ca.source <> cb.source)
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM x GROUP BY source_a, source_b
    """


@register(
    LLM_QUERIES,
    "doc_cross_source_leakage",
    _cross_source_leakage_sql(),
    "cross-source contamination audit: near-dup pairs (MinHash-LSH, "
    "Jaccard>=0.5) whose two members come from DIFFERENT sources, "
    "aggregated per unordered source pair — the 'is corpus A leaked "
    "into corpus B' question every multi-source training set must "
    "answer before mixing; pair volume is bucket-bounded, the source "
    "lookup is two narrow (id, source) joins on the pair list",
)
def doc_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    rep_exact = d.where(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 1000000000).alias("doc_id"),
        "text",
        F.lit("replica").alias("source"),
    )
    rep_near = d.where(F.col("doc_id") % 23 == 0).select(
        (F.col("doc_id") + 2000000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup suffix")).alias("text"),
        F.lit("replica").alias("source"),
    )
    corpus = d.unionByName(rep_exact).unionByName(rep_near)
    pairs = dedup.minhash_lsh_pairs(
        corpus.select("doc_id", "text"), threshold=0.5
    )
    src = corpus.select("doc_id", "source")
    joined = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")
            ).hint("shuffle_hash"),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")
            ).hint("shuffle_hash"),
            "id_b",
        )
        .where(F.col("__sa") != F.col("__sb"))
    )
    return (
        joined.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def _incremental_dedup_sql(num_hashes: int = 16, bands: int = 4,
                           threshold: float = 0.5) -> str:
    """DuckDB twin of the two-batch MinHashDedupStore flow: batch 1 =
    documents, batch 2 = the augmented copies; batch-2 matches count only
    against batch-1 SURVIVORS (the store holds kept docs only) and
    lower-id batch-2 mates; dup_of = MIN over both, the greedy min-id
    rule. Verification is the signature-agreement estimate (the store
    never re-reads text), calibrated by doc_minhash_jaccard_est."""
    rows = num_hashes // bands
    mins = ", ".join(
        f"list_min(list_transform(hs, m -> "
        f"(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) "
        f"+ {i} * CAST(('0x' || substring(m, 17, 8)) AS BIGINT)) % 4294967296))"
        for i in range(num_hashes)
    )
    return f"""
    WITH corpus AS (
      SELECT 1 AS batch, doc_id, text FROM documents
      UNION ALL
      SELECT 2, doc_id + 1000000000, text FROM documents WHERE doc_id % 17 = 0
      UNION ALL
      SELECT 2, doc_id + 2000000000, text || ' near dup suffix'
      FROM documents WHERE doc_id % 23 = 0
    )
    {_SHINGLE_CTES}
    , __hashed AS (SELECT doc_id, list_transform(sh, s -> md5(s)) AS hs FROM __sized)
    , __sigs AS (SELECT doc_id, [{mins}] AS sig FROM __hashed)
    , __bh AS (
      SELECT s.doc_id, r.band,
             md5(array_to_string(list_transform(
               s.sig[r.band*{rows}+1 : r.band*{rows}+{rows}],
               v -> CAST(v AS VARCHAR)), '|')) AS bhash
      FROM __sigs s CROSS JOIN (SELECT range AS band FROM range(0, {bands})) r)
    , matches AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM __bh a JOIN __bh b
        ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
      WHERE (SELECT CAST(len(list_filter(range(1, {num_hashes + 1}),
                     i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / {num_hashes}
             FROM __sigs sa, __sigs sb
             WHERE sa.doc_id = a.doc_id AND sb.doc_id = b.doc_id)
            >= {threshold})
    , d1 AS (
      SELECT m.id_b AS doc_id, MIN(m.id_a) AS dup_of
      FROM matches m
      JOIN corpus ca ON ca.doc_id = m.id_a AND ca.batch = 1
      JOIN corpus cb ON cb.doc_id = m.id_b AND cb.batch = 1
      GROUP BY m.id_b)
    , kept1 AS (
      SELECT doc_id FROM corpus WHERE batch = 1
        AND doc_id NOT IN (SELECT doc_id FROM d1))
    , d2 AS (
      SELECT m.id_b AS doc_id, MIN(m.id_a) AS dup_of
      FROM matches m
      JOIN corpus cb ON cb.doc_id = m.id_b AND cb.batch = 2
      WHERE m.id_a IN (SELECT doc_id FROM kept1)
         OR m.id_a IN (SELECT doc_id FROM corpus WHERE batch = 2)
      GROUP BY m.id_b)
    SELECT CAST(1 AS INTEGER) AS batch, c.doc_id, d.dup_of,
           d.dup_of IS NULL AS is_kept
    FROM corpus c LEFT JOIN d1 d ON d.doc_id = c.doc_id WHERE c.batch = 1
    UNION ALL
    SELECT CAST(2 AS INTEGER), c.doc_id, d.dup_of, d.dup_of IS NULL
    FROM corpus c LEFT JOIN d2 d ON d.doc_id = c.doc_id WHERE c.batch = 2
    """


@register(
    LLM_QUERIES,
    "doc_dedup_incremental",
    _incremental_dedup_sql(),
    "incremental dedup against a persisted signature store (VERDICT r6 "
    "#4): batch 1 (documents) is ingested into a MinHash signature index "
    "(~200 B/doc — signatures + band hashes, no text); batch 2 (the "
    "augmented copies) then dedups against the STORE and within itself "
    "without re-shingling batch 1 — the 'dedup the new crawl without "
    "re-reading 100 TB' shape (ContinuousRollup applied to dedup). "
    "Output: per-doc verdicts for both batches, greedy min-id survivors",
)
def doc_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from .dedup_store import MinHashDedupStore

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b2 = (
        d.where(F.col("doc_id") % 17 == 0)
        .select((F.col("doc_id") + 1000000000).alias("doc_id"), "text")
        .unionByName(
            d.where(F.col("doc_id") % 23 == 0).select(
                (F.col("doc_id") + 2000000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" near dup suffix")).alias(
                    "text"
                ),
            )
        )
    )
    root = tempfile.mkdtemp(prefix="flux-dedupstore-")
    store = MinHashDedupStore(spark, root + "/idx", threshold=0.5)
    v1 = store.ingest(d).select(
        F.lit(1).cast("int").alias("batch"), "doc_id", "dup_of", "is_kept"
    )
    v2 = store.ingest(b2).select(
        F.lit(2).cast("int").alias("batch"), "doc_id", "dup_of", "is_kept"
    )
    # verdicts are localCheckpoint-materialized (no store-file lineage),
    # so the temp store can be removed eagerly instead of leaking one
    # parquet dir per invocation (ADVICE r7)
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return v1.unionByName(v2)


@register(
    LLM_QUERIES,
    "doc_duplication_density",
    _CORPUS_CTE
    + _SHINGLE_CTES
    + """
, __ex AS (SELECT doc_id, n_sh, unnest(sh) AS g FROM __sized)
, __df AS (SELECT g, COUNT(*) AS df FROM __ex GROUP BY g)
, __per AS (
  SELECT e.doc_id, e.n_sh,
         SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM __ex e JOIN __df d ON d.g = e.g
  GROUP BY e.doc_id, e.n_sh)
SELECT doc_id, CAST(n_sh AS INT) AS n_shingles,
       CAST(n_dup AS INT) AS n_duplicated,
       CAST(n_dup AS DOUBLE) / n_sh AS dup_density,
       CAST(n_dup AS DOUBLE) / n_sh >= 0.8 AS high_risk
FROM __per
""",
    "corpus-level duplication density (r8, the Lee et al. 2022 "
    "memorization-risk screen): per document, the fraction of its "
    "3-token shingles occurring >= 2 times corpus-wide — distinct "
    "from within-doc repetition (Gopher) "
    "and pairwise Jaccard: it flags docs assembled from corpus-common "
    "material even when no single near-dup partner exists. Plan: "
    "shingle DF table partial-aggregates, the join back keys on the "
    "shingle (both sides corpus-scaled), one groupBy per doc",
)
def doc_duplication_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import word_shingles

    d = dup_corpus(spark, sf_dir)
    ex = d.select(
        "doc_id", word_shingles("text", 3).alias("__sh")
    ).select(
        "doc_id", F.size("__sh").alias("__n"), F.explode("__sh").alias("__g")
    )
    df_tab = ex.groupBy("__g").agg(F.count("*").alias("__df"))
    per = (
        ex.join(df_tab.hint("shuffle_hash"), "__g")
        .groupBy("doc_id", "__n")
        .agg(
            F.sum(F.when(F.col("__df") >= 2, 1).otherwise(0)).alias("__nd")
        )
    )
    dens = F.col("__nd").cast("double") / F.col("__n")
    return per.select(
        "doc_id",
        F.col("__n").cast("int").alias("n_shingles"),
        F.col("__nd").cast("int").alias("n_duplicated"),
        dens.alias("dup_density"),
        (dens >= 0.8).alias("high_risk"),
    )


@register(
    LLM_QUERIES,
    "doc_dedup_edit_verify",
    f"""
    {_CORPUS_CTE}
    , pairs AS (SELECT * FROM ({{lsh}}) q)
    SELECT p.id_a, p.id_b, p.jaccard,
           CAST(levenshtein(a.text, b.text) AS INT) AS lev_dist,
           CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                ELSE 1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                     / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)
           END AS edit_sim,
           (CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                 ELSE 1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                      / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)
            END) >= 0.8 AS verified
    FROM pairs p
    JOIN corpus a ON a.doc_id = p.id_a
    JOIN corpus b ON b.doc_id = p.id_b
    """.replace("{lsh}", _minhash_lsh_sql()),
    "character-level verification of LSH candidates: true Levenshtein "
    "distance + edit similarity per near-dup pair — the O(m*n) kernel "
    "that is only affordable AFTER LSH pruning; the verify-before-delete "
    "stage of production dedup",
)
def doc_dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.edit_verified_pairs(dup_corpus(spark, sf_dir))


@register(
    LLM_QUERIES,
    "doc_dedup_edit_verify_auto",
    f"""
    {_CORPUS_CTE}
    , pairs AS (SELECT * FROM ({{lsh}}) q)
    SELECT p.id_a, p.id_b, p.jaccard,
           CAST(levenshtein(a.text, b.text) AS INT) AS lev_dist,
           CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                ELSE 1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                     / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)
           END AS edit_sim,
           (CASE WHEN greatest(length(a.text), length(b.text)) = 0 THEN 1.0
                 ELSE 1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                      / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE)
            END) >= 0.8 AS verified
    FROM pairs p
    JOIN corpus a ON a.doc_id = p.id_a
    JOIN corpus b ON b.doc_id = p.id_b
    """.replace("{lsh}", _minhash_lsh_auto_sql()),
    "edit verification over AUTO-banded LSH candidates (r11, VERDICT r10 "
    "#6): rows-per-band derived from COUNT(*) (auto_band_rows) shrinks "
    "per-band candidate admission by s^4 beyond 4096 docs, so the "
    "Levenshtein kernel — O(len_a*len_b) PER PAIR — runs over an "
    "output-bound candidate set instead of the fixed-band quadratic on "
    "duplicate-heavy corpora; same 0.8 edit threshold as the pinned gate",
)
def doc_dedup_edit_verify_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    rows = dedup.auto_band_rows(dup_corpus_count(spark, sf_dir))
    return dedup.edit_verified_pairs(corpus, bands=16 // rows)


@register(
    LLM_QUERIES,
    "doc_dedup_method_eval",
    f"""
    WITH mh AS ({_minhash_lsh_sql()}),
    sh AS ({_simhash_pairs_sql()}),
    ng AS ({_ngram_jaccard_sql()}),
    detected AS (
      SELECT 'minhash_lsh' AS method, id_a, id_b FROM mh
      UNION ALL SELECT 'simhash', id_a, id_b FROM sh
      UNION ALL SELECT 'ngram_jaccard', id_a, id_b FROM ng),
    truth AS (
      SELECT doc_id AS id_a, doc_id + 1000000000 AS id_b, 'exact' AS kind
      FROM documents WHERE doc_id % 17 = 0
      UNION ALL
      SELECT doc_id, doc_id + 2000000000, 'near'
      FROM documents WHERE doc_id % 23 = 0),
    methods AS (SELECT unnest(['minhash_lsh', 'simhash', 'ngram_jaccard'])
                AS method),
    hits AS (
      SELECT m.method, t.kind,
        CAST(COUNT(*) AS BIGINT) AS n_truth,
        CAST(SUM(CASE WHEN d.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_hit
      FROM methods m
      CROSS JOIN truth t
      LEFT JOIN detected d
        ON d.method = m.method AND d.id_a = t.id_a AND d.id_b = t.id_b
      GROUP BY m.method, t.kind),
    totals AS (
      SELECT method, CAST(COUNT(*) AS BIGINT) AS n_detected
      FROM detected GROUP BY method)
    SELECT h.method,
      COALESCE(t.n_detected, 0) AS n_detected,
      MAX(CASE WHEN kind = 'exact' THEN n_truth END) AS n_exact_truth,
      MAX(CASE WHEN kind = 'exact' THEN n_hit END) AS n_exact_hit,
      MAX(CASE WHEN kind = 'near' THEN n_truth END) AS n_near_truth,
      MAX(CASE WHEN kind = 'near' THEN n_hit END) AS n_near_hit,
      CAST(MAX(CASE WHEN kind = 'exact' THEN n_hit END) AS DOUBLE)
        / CAST(MAX(CASE WHEN kind = 'exact' THEN n_truth END) AS DOUBLE)
        AS recall_exact,
      CAST(MAX(CASE WHEN kind = 'near' THEN n_hit END) AS DOUBLE)
        / CAST(MAX(CASE WHEN kind = 'near' THEN n_truth END) AS DOUBLE)
        AS recall_near
    FROM hits h LEFT JOIN totals t USING (method)
    GROUP BY h.method, t.n_detected
    """,
    "dedup method scorecard against PLANTED ground truth: the gate "
    "corpus plants exact copies (every 17th doc) and suffix near-dups "
    "(every 23rd); each method's detected pairs join the truth set and "
    "report per-kind recall plus total detections (organic synthetic-"
    "vocabulary dups inflate n_detected, so planted recall — not "
    "precision — is the honest cross-method metric). Closes the dedup "
    "recall matrix the way emb_*_recall closes retrieval's: the "
    "approximation quality of every production dedup path is itself "
    "oracle-gated. Scale: sums three bucket-joined pair sets; the truth "
    "join is O(planted), model-sized.",
)
def doc_dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = dup_corpus(spark, sf_dir)
    detected = (
        dedup.minhash_lsh_pairs(corpus, threshold=0.5)
        .select(F.lit("minhash_lsh").alias("method"), "id_a", "id_b")
        .unionByName(
            dedup.simhash_pairs(corpus).select(
                F.lit("simhash").alias("method"), "id_a", "id_b"
            )
        )
        .unionByName(
            dedup.ngram_jaccard_pairs(corpus, threshold=0.5).select(
                F.lit("ngram_jaccard").alias("method"), "id_a", "id_b"
            )
        )
    )
    base = load_table(spark, sf_dir, "documents").select("doc_id")
    truth = (
        base.where(F.col("doc_id") % 17 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 1000000000).alias("id_b"),
            F.lit("exact").alias("kind"),
        )
        .unionByName(
            base.where(F.col("doc_id") % 23 == 0).select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 2000000000).alias("id_b"),
                F.lit("near").alias("kind"),
            )
        )
    )
    methods = spark.createDataFrame(
        [("minhash_lsh",), ("simhash",), ("ngram_jaccard",)], "method string"
    )
    d_hit = detected.select("method", "id_a", "id_b").withColumn(
        "hit", F.lit(1)
    )
    hits = (
        methods.crossJoin(truth)
        .join(F.broadcast(d_hit), ["method", "id_a", "id_b"], "left")
        .groupBy("method", "kind")
        .agg(
            F.count("*").cast("bigint").alias("n_truth"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
        )
    )
    totals = detected.groupBy("method").agg(
        F.count("*").cast("bigint").alias("n_detected")
    )
    ex = F.max(F.when(F.col("kind") == "exact", F.col("n_hit")))
    ext = F.max(F.when(F.col("kind") == "exact", F.col("n_truth")))
    nr = F.max(F.when(F.col("kind") == "near", F.col("n_hit")))
    nrt = F.max(F.when(F.col("kind") == "near", F.col("n_truth")))
    return (
        hits.groupBy("method")
        .agg(
            ext.alias("n_exact_truth"),
            ex.alias("n_exact_hit"),
            nrt.alias("n_near_truth"),
            nr.alias("n_near_hit"),
            (ex.cast("double") / ext.cast("double")).alias("recall_exact"),
            (nr.cast("double") / nrt.cast("double")).alias("recall_near"),
        )
        .join(totals, "method", "left")
        .select(
            "method",
            F.coalesce("n_detected", F.lit(0)).alias("n_detected"),
            "n_exact_truth",
            "n_exact_hit",
            "n_near_truth",
            "n_near_hit",
            "recall_exact",
            "recall_near",
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style boilerplate line removal (r8 session 4)
# ---------------------------------------------------------------------------

# word-soup documents are single-line, so the gate query appends
# deterministic boilerplate lines in BOTH engines (same trick as
# _PII_AUG_CTE): two high-frequency footers that MUST be removed (every
# 3rd / 5th doc) and one rare sponsor line (every 251st doc — 2 docs at
# sf0.01, under the min_docs=3 threshold) that MUST survive.
_LINE_B1 = "subscribe to our newsletter for weekly updates"
_LINE_B2 = "all rights reserved contact us for licensing"
_LINE_RARE = "rare sponsor note kept below the dedup threshold"

_LINE_AUG_CTE = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || '{_LINE_B1}' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{_LINE_B2}' ELSE '' END
    || CASE WHEN doc_id % 251 = 0 THEN chr(10) || '{_LINE_RARE}' ELSE '' END
    AS text
  FROM documents)
"""


def _line_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 3 == 0, F.lit("\n" + _LINE_B1)).otherwise(
                F.lit("")
            ),
            F.when(did % 5 == 0, F.lit("\n" + _LINE_B2)).otherwise(
                F.lit("")
            ),
            F.when(did % 251 == 0, F.lit("\n" + _LINE_RARE)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


@register(
    LLM_QUERIES,
    "doc_line_dedup",
    _LINE_AUG_CTE
    + """
    , lx AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM aug),
    lines AS (
      SELECT doc_id, i - 1 AS ln, l[i] AS line
      FROM lx, unnest(generate_series(1, len(l))) AS t(i)),
    boiler AS (
      SELECT line FROM lines GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= 3),
    kept AS (
      SELECT * FROM lines
      WHERE line NOT IN (SELECT line FROM boiler)),
    agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY ln) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_kept_lines
      FROM kept GROUP BY doc_id)
    SELECT x.doc_id, COALESCE(a.clean_text, '') AS clean_text,
           CAST(len(x.l) AS BIGINT) AS n_lines,
           CAST(COALESCE(a.n_kept_lines, 0) AS BIGINT) AS n_kept_lines
    FROM lx x LEFT JOIN agg a USING (doc_id)
    """,
    "CCNet-style boilerplate line removal (Wenzek et al. 2020): a line "
    "is dropped iff it occurs in >= 3 DISTINCT documents — the web-text "
    "filter that strips repeated footers/banners while keeping "
    "corpus-rare lines (the every-251st-doc sponsor line survives, the "
    "every-3rd/5th-doc footers do not). Complements doc_dup_span_removal "
    "(token k-grams, occurrence-counted): unit = natural line, threshold "
    "= document frequency, removal is line-aligned. The oracle rebuilds "
    "the identical line partition + document-frequency filter in SQL, so "
    "the cleaned text matches byte-for-byte. The engine groups on the "
    "md5 line fingerprint (32 B/line shuffle regardless of line length); "
    "the oracle groups on the raw line — identical partitions either way",
)
def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.line_dedup(
        _line_augmented(spark, sf_dir), min_docs=3
    )


# ---------------------------------------------------------------------------
# Bloom-filter dedup against a historical corpus (r8 session 4)
# ---------------------------------------------------------------------------

_BLOOM_M = 262144  # filter bits (2^18 for the gate; size ~1.2n*k at scale)
_BLOOM_K = 4  # probes per digest: 4 disjoint 5-hex-digit slices of md5
_BLOOM_WORD = 63  # bits per packed word (63 keeps 1<<bit positive in int64)


def _sql_hex_int(h_expr: str, start: int, n: int) -> str:
    """SQL int value of ``n`` hex digits of ``h_expr`` from 1-based
    ``start`` (DuckDB twin of Spark's conv(substring(...), 16, 10))."""
    return (
        "("
        + " + ".join(
            f"{_hexval(f'substr({h_expr}, {start + i}, 1)')} * {16 ** (n - 1 - i)}"
            for i in range(n)
        )
        + ")"
    )


def _bloom_pos_sql(digest: str) -> str:
    return ", ".join(
        f"({_sql_hex_int(digest, 1 + 5 * i, 5)} % {_BLOOM_M})"
        for i in range(_BLOOM_K)
    )


@register(
    LLM_QUERIES,
    "doc_dedup_bloom",
    f"""
    WITH hist AS (
      SELECT doc_id, text, md5(text) AS digest
      FROM documents WHERE doc_id % 2 = 0),
    batch AS (
      SELECT b.doc_id,
             md5(CASE WHEN b.doc_id % 7 = 0 AND h.text IS NOT NULL
                      THEN h.text ELSE b.text END) AS digest
      FROM documents b LEFT JOIN documents h ON h.doc_id = b.doc_id - 1
      WHERE b.doc_id % 2 = 1),
    hpos AS (
      SELECT p FROM hist, unnest([{_bloom_pos_sql("digest")}]) AS t(p)),
    words AS (
      SELECT p // {_BLOOM_WORD} AS w,
             CAST(bit_or(1::BIGINT << CAST(p % {_BLOOM_WORD} AS INT))
                  AS BIGINT) AS bits
      FROM hpos GROUP BY p // {_BLOOM_WORD}),
    bpos AS (
      SELECT doc_id, digest, p
      FROM batch, unnest([{_bloom_pos_sql("digest")}]) AS t(p)),
    probe AS (
      SELECT b.doc_id, b.digest,
             CASE WHEN w.bits IS NOT NULL
                       AND ((w.bits >> CAST(b.p % {_BLOOM_WORD} AS INT))
                            & 1) = 1
                  THEN 1 ELSE 0 END AS hit
      FROM bpos b LEFT JOIN words w ON w.w = b.p // {_BLOOM_WORD}),
    agg AS (
      SELECT doc_id, digest, CAST(SUM(hit) AS BIGINT) AS n_hits
      FROM probe GROUP BY 1, 2),
    truth AS (SELECT DISTINCT digest FROM hist)
    SELECT a.doc_id, a.n_hits,
           a.n_hits = {_BLOOM_K} AS may_contain,
           t.digest IS NOT NULL AS is_true_dup,
           a.n_hits = {_BLOOM_K} AND t.digest IS NULL AS false_positive
    FROM agg a LEFT JOIN truth t ON t.digest = a.digest
    """,
    "Bloom-filter dedup of an incoming batch against a HISTORICAL corpus "
    "— the ~1.2-byte/doc alternative to the 200 B/doc signature store "
    "(doc_dedup_incremental) when only exact-dup suppression is needed: "
    "history digests set k=4 md5-slice positions in a 2^18-bit filter "
    "packed as 63-bit words (a DataFrame of (word, bits) rows — the "
    "representation that shards by digest prefix when one executor's "
    "filter no longer fits); the batch probes via a broadcast word join. "
    "The gate plants true dups (every odd doc_id divisible by 7 copies "
    "its even predecessor's text) and oracle-checks the filter VERDICT "
    "per doc — may_contain, ground truth, and the false_positive flag — "
    "so a mis-set or mis-probed bit fails the gate, not just a stat. "
    "Scale shape: build is one explode + 4-per-doc shuffle into <= 4163 "
    "words; probes join the broadcast filter, never the history table; "
    "the truth join exists only for the audit columns",
)
def doc_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    hist = d.where(did % 2 == 0).select(
        "doc_id", F.md5("text").alias("digest")
    )
    donor = d.select(
        (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("__ht")
    )
    batch = (
        d.where(did % 2 == 1)
        .join(donor, "doc_id", "left")
        .select(
            "doc_id",
            F.md5(
                F.when(
                    (did % 7 == 0) & F.col("__ht").isNotNull(),
                    F.col("__ht"),
                ).otherwise(F.col("text"))
            ).alias("digest"),
        )
    )

    def positions(col: str) -> list:
        return [
            F.conv(F.substring(col, 1 + 5 * i, 5), 16, 10).cast("long")
            % _BLOOM_M
            for i in range(_BLOOM_K)
        ]

    hpos = hist.select(F.explode(F.array(*positions("digest"))).alias("p"))
    words = (
        hpos.select(
            F.expr(f"p div {_BLOOM_WORD}").alias("w"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(p % {_BLOOM_WORD} AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    bpos = batch.select(
        "doc_id",
        "digest",
        F.explode(F.array(*positions("digest"))).alias("p"),
    )
    probe = bpos.join(
        F.broadcast(words),
        F.expr(f"p div {_BLOOM_WORD}") == F.col("w"),
        "left",
    )
    hit = F.when(
        F.col("bits").isNotNull()
        & (
            F.expr(
                f"shiftright(bits, CAST(p % {_BLOOM_WORD} AS INT)) & 1"
            )
            == 1
        ),
        1,
    ).otherwise(0)
    agg = probe.groupBy("doc_id", "digest").agg(
        F.sum(hit).cast("bigint").alias("n_hits")
    )
    truth = hist.select("digest").distinct().withColumn(
        "__seen", F.lit(True)
    )
    may = F.col("n_hits") == _BLOOM_K
    return (
        agg.join(truth, "digest", "left")
        .select(
            "doc_id",
            "n_hits",
            may.alias("may_contain"),
            F.col("__seen").isNotNull().alias("is_true_dup"),
            (may & F.col("__seen").isNull()).alias("false_positive"),
        )
    )
