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

from ..analytics.registry import QuerySpec, load_table

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


def dup_corpus_count(spark: SparkSession, sf_dir: str) -> int:
    """COUNT(*) of :func:`dup_corpus` from ONE documents scan (r13): the
    union branches only replicate filtered base rows, so the corpus count
    is count + count_if(%17) + count_if(%23) — identical value, one scan
    and one job instead of three union legs (auto-derivation parameters
    are query-construction cost, inside every bench timing)."""
    row = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.count("*").alias("n"),
            F.count_if(F.col("doc_id") % 17 == 0).alias("n17"),
            F.count_if(F.col("doc_id") % 23 == 0).alias("n23"),
        )
        .first()
    )
    return int(row["n"] + row["n17"] + row["n23"])


# SQL helpers -----------------------------------------------------------------


def _hexval(c: str) -> str:
    """SQL twin of dedup._hex_digit_val."""
    return f"(CASE WHEN ascii({c}) >= 97 THEN ascii({c}) - 87 ELSE ascii({c}) - 48 END)"


# domain modules register their entries into the same LLM_QUERIES dict on
# import (kept at the bottom so `from .queries import LLM_QUERIES` always
# sees the full registry; the shared helpers above are imported back by
# the domain modules, so they must stay above these imports)
from . import dedup_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import media_queries  # noqa: E402,F401
from . import classify_queries  # noqa: E402,F401
from . import cluster_queries  # noqa: E402,F401
