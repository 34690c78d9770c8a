"""Incremental MinHash-LSH dedup against a persisted signature store.

The batch dedup family (``dedup.minhash_lsh_pairs``) re-shingles the whole
corpus every run; the production question at 100 TB is "dedup this new
crawl against the existing corpus WITHOUT re-reading the corpus text"
(VERDICT r6 #4). :class:`MinHashDedupStore` persists, per *kept* document,
its MinHash signature and LSH band hashes — ~200 B/doc regardless of
document size, so a 10^10-doc corpus indexes in ~2 TB of parquet — and
each ``ingest(new_docs)`` batch:

1. shingles + signs the NEW batch only (the same Arrow kernels as the
   batch path: ``word_shingles`` / ``minhash_signature_arrow``);
2. generates candidates by joining new band hashes against the stored
   band table (shuffle-hash on the band key — both sides corpus-scaled);
3. verifies candidates with the signature-agreement estimate
   (``est_jaccard`` = agreeing positions / num_hashes, the quantity the
   ``doc_minhash_jaccard_est`` gate calibrates against exact Jaccard) —
   the store holds no text, so verification never re-reads old bytes;
4. resolves within-batch duplicates with the same banded self-join +
   greedy min-id rule as the batch operator;
5. appends the survivors' (doc_id, sig, bands) rows to the store.

This is the ``ContinuousRollup`` pattern (rollup.py:32-133) applied to
dedup: refresh cost is O(new batch + matched buckets), never O(corpus),
and the persisted state is a mergeable summary (signatures), not data.

Crash safety / visibility follow the engine's commit-then-visible rule:
a batch is written to a dot-prefixed staging directory (invisible to
Spark's parquet reader) and atomically renamed into place; ingests are
serialized by a flock (greedy min-id semantics require a total batch
order anyway, like the rollup's single-maintainer rule).

``doc_id`` values must be unique across the store and every batch (the
same contract as ``minhash_lsh_pairs``).

The reference has no dedup surface at all (SURVEY.md §2.7); within this
engine the store is the incremental twin of the batch LSH operator.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import file_lock
from .dedup import lsh_band_hashes, minhash_signature_arrow, word_shingles


class MinHashDedupStore:
    """Persisted MinHash-LSH signature index for incremental dedup."""

    def __init__(
        self,
        spark: SparkSession,
        path: str | os.PathLike,
        k: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
        threshold: float = 0.5,
        max_bucket_size: int | None = 500,
    ) -> None:
        assert num_hashes % bands == 0
        self.spark = spark
        self.path = Path(path)
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        self.threshold = threshold
        # the batch LSH path's skew guard (dedup.py minhash_lsh_pairs):
        # a boilerplate mega-bucket in the STORE would otherwise grow
        # every future ingest's join cost forever (|bucket| x |new| rows
        # per ingest) — cap-500 drops degenerate buckets on BOTH sides of
        # both candidate joins, trading recall only on buckets that are
        # boilerplate by construction (VERDICT r7 #5)
        self.max_bucket_size = max_bucket_size
        self.path.mkdir(parents=True, exist_ok=True)

    # -- store access -----------------------------------------------------
    def _batch_dirs(self) -> list[Path]:
        return sorted(
            p for p in self.path.iterdir()
            if p.is_dir() and p.name.startswith("batch-")
        )

    def signatures(self) -> DataFrame | None:
        """The stored signature table (doc_id, sig, bands) — every KEPT
        document across all ingested batches; None when empty. The scan
        reads ~200 B/doc of signature state, never document text."""
        dirs = self._batch_dirs()
        if not dirs:
            return None
        return self.spark.read.parquet(*[str(d) for d in dirs])

    # -- ingest -----------------------------------------------------------
    def _sig_table(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        sig = minhash_signature_arrow(
            word_shingles(text_col, self.k), self.num_hashes
        )
        return docs.select(
            F.col(id_col).alias("doc_id"), sig.alias("sig")
        ).withColumn(
            "bands", lsh_band_hashes(F.col("sig"), self.bands, self.rows)
        )

    def _cap_buckets(self, banded: DataFrame) -> DataFrame:
        """Drop rows of degenerate (band, hash) buckets larger than
        ``max_bucket_size`` — same window-count guard as the batch path
        (dedup.py minhash_lsh_pairs step 3)."""
        if self.max_bucket_size is None:
            return banded
        from pyspark.sql import Window

        cnt = Window.partitionBy("__band", "__bhash")
        return (
            banded.withColumn("__bn", F.count("*").over(cnt))
            .where(F.col("__bn") <= self.max_bucket_size)
            .drop("__bn")
        )

    def _est_jaccard(self, sa, sb):
        # agreeing signature positions / num_hashes: multiples of 1/H,
        # exact in double, so the >= threshold cut is engine-independent
        agree = F.size(
            F.filter(F.zip_with(sa, sb, lambda x, y: x == y), lambda v: v)
        )
        return agree.cast("double") / F.lit(float(self.num_hashes))

    def ingest(
        self,
        docs: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Dedup ``docs`` against the store AND within the batch; append
        the survivors' signatures; return one verdict row per input doc:
        (doc_id, dup_of, is_kept) where ``dup_of`` is the smallest
        est-Jaccard >= threshold match among stored docs and lower-id
        batch-mates (NULL for kept docs — greedy min-id retention, the
        family's standard survivor rule)."""
        with file_lock(self.path / ".ingest.lock"):
            return self._ingest_locked(docs, text_col, id_col)

    def _ingest_locked(
        self, docs: DataFrame, text_col: str, id_col: str
    ) -> DataFrame:
        # persisted: feeds the self-join's two sides, the store join, the
        # verdict spine, and the survivor append — one signature pass
        sig = self._sig_table(docs, text_col, id_col).persist()
        # localCheckpoint (eager) materializes BEFORE appending — the
        # returned plan must never see the store state that includes this
        # very batch — AND cuts the lineage so the result holds no cached
        # relation or store-file reference (repeated ingests used to
        # accumulate never-unpersisted verdict caches, ADVICE r7)
        verdict = self._verdict(sig).localCheckpoint()

        survivors = sig.join(
            verdict.where("is_kept").select("doc_id"), "doc_id", "left_semi"
        )
        staging = self.path / f".staging-{uuid.uuid4().hex[:8]}"
        survivors.write.mode("overwrite").parquet(str(staging))
        # commit-then-visible: dot-dirs are invisible to the parquet
        # reader; the rename is the atomic commit point
        os.replace(staging, self.path / f"batch-{uuid.uuid4().hex[:8]}")
        sig.unpersist()
        return verdict

    # -- maintenance ------------------------------------------------------
    def compact(self) -> int:
        """Rewrite all ``batch-*`` dirs into one (the store otherwise
        accumulates one parquet dir per ingest forever — each adds file-
        listing overhead and a scan task floor to every future ingest,
        VERDICT r7 #5). Serialized with ingests by the same flock; commit
        is staging-rename like ingest. Reveal-first ordering makes every
        crash window safe: the compacted dir becomes visible BEFORE the
        old dirs are removed, so a crash mid-cleanup leaves duplicate
        signature rows — which the verdict path tolerates (candidates are
        ``.distinct()``-ed before scoring) and the next ``compact()``
        removes (``dropDuplicates`` on doc_id). Returns the number of
        batch dirs compacted away (0 = nothing to do)."""
        with file_lock(self.path / ".ingest.lock"):
            dirs = self._batch_dirs()
            if len(dirs) <= 1:
                return 0
            merged = self.spark.read.parquet(
                *[str(d) for d in dirs]
            ).dropDuplicates(["doc_id"])
            staging = self.path / f".staging-{uuid.uuid4().hex[:8]}"
            merged.write.mode("overwrite").parquet(str(staging))
            os.replace(staging, self.path / f"batch-{uuid.uuid4().hex[:8]}")
            import shutil

            for d in dirs:
                shutil.rmtree(d)
            return len(dirs)

    def _verdict(self, sig: DataFrame) -> DataFrame:
        """Lazy verdict plan for a new batch's signature table against the
        CURRENT store state (separated from ingest so plan tests can
        assert the store side reads signatures, never text)."""
        # r13 (guide §2.4): the candidate ``.distinct()`` both lanes used
        # to run is gone — the terminal MIN-aggregation already collapses
        # a pair that matches in several bands, and re-scoring the
        # duplicate is a 16-element zip, far cheaper than the extra
        # full-width exchange the distinct cost (the wide rows carried
        # both 16-int64 signatures). One exchange per join side + one for
        # the aggregation, nothing else.
        banded = self._cap_buckets(
            sig.select(
                "doc_id",
                "sig",
                F.posexplode("bands").alias("__band", "__bhash"),
            )
        )

        # within-batch candidates: banded self-join, greedy min-id.
        # SHUFFLE_HASH for the same reason as minhash_lsh_pairs: both
        # sides scale with the batch and broadcast picks off bogus
        # cached-relation stats don't survive 100x.
        a = banded.alias("a")
        b = banded.alias("b")
        batch_dups = (
            a.join(
                b.hint("shuffle_hash"),
                (F.col("a.__band") == F.col("b.__band"))
                & (F.col("a.__bhash") == F.col("b.__bhash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .where(
                self._est_jaccard(F.col("a.sig"), F.col("b.sig"))
                >= self.threshold
            )
            .groupBy(F.col("b.doc_id").alias("doc_id"))
            .agg(F.min(F.col("a.doc_id")).alias("__dup_batch"))
        )

        # cross-store candidates: new bands vs stored bands
        store = self.signatures()
        if store is not None:
            sb = self._cap_buckets(
                store.select(
                    F.col("doc_id").alias("__sid"),
                    F.col("sig").alias("__ssig"),
                    F.posexplode("bands").alias("__band", "__bhash"),
                )
            )
            store_dups = (
                banded.join(
                    sb.hint("shuffle_hash"), ["__band", "__bhash"]
                )
                .where(
                    self._est_jaccard(F.col("sig"), F.col("__ssig"))
                    >= self.threshold
                )
                .groupBy("doc_id")
                .agg(F.min("__sid").alias("__dup_store"))
            )
        else:
            store_dups = None

        verdict = sig.select("doc_id").join(batch_dups, "doc_id", "left")
        if store_dups is not None:
            verdict = verdict.join(store_dups, "doc_id", "left")
            dup_of = F.least(F.col("__dup_store"), F.col("__dup_batch"))
        else:
            dup_of = F.col("__dup_batch")
        return verdict.select(
            "doc_id",
            dup_of.alias("dup_of"),
            dup_of.isNull().alias("is_kept"),
        )
