"""Parquet-backed topic log: the storage engine.

Replaces the reference's Partition/Log/LogSegment/IndexEntries stack
(server/internal/storage/Partition.java:8-65, Log.java:18-115,
LogSegment.java:28-434, IndexEntries.java:17-54) with immutable Parquet files
under ``warehouse/<topic>/partition=<p>/``:

* **LogSegment -> parquet file**: files are immutable once committed, like a
  rolled segment (LogSegment.java:381-388); "segment roll" is
  ``maxRecordsPerFile`` on the writer (Log.java:65-72 analog).
* **IndexEntries -> rowgroup stats**: the offset->byte index
  (IndexEntries.java:17-54) becomes Parquet rowgroup min/max statistics on the
  sorted ``offset`` column — Catalyst predicate pushdown gives the same
  skip-scan for free (README.md:198's "costly full table scans" avoidance).
* **Partition dir -> partition pruning**: Hive-style ``partition=<p>`` dirs
  mean a (topic, partition, offset) point read prunes to one directory and
  then to one rowgroup.

Offset assignment (the one genuinely stateful primitive, SURVEY.md §4):
per-(topic, partition) offsets are contiguous from 0 across appends. The
reference serializes writers with a fair per-partition ReentrantLock
(commons/utils/PartitionWriteManager.java:17-84); here each *ingest batch* is
the unit of serialization — a per-topic driver lock orders batches, and within
a batch ``row_number() OVER (PARTITION BY partition ORDER BY arrival)`` plus
the catalog high-water mark assigns gap-free offsets. The shuffle implied by
the window is the same shuffle needed to co-locate each log partition's rows
into one write task, so ordering costs no extra stage.

Durability: the reference acks before fsync and can drop batches after 3
retries (FluxProducer.java:229-233, LogSegment.java:165-218); Spark's
file-commit protocol gives committed-write durability — a deliberate upgrade
(SURVEY.md §7 risk 4).

Scale notes (100 TB design point): one shuffle per ingest batch, hash-
partitioned on the log partition id; `maxRecordsPerFile` bounds file size;
`compact()` is the OPTIMIZE-style maintenance job that rewrites small files
into large offset-sorted ones to keep listing + pruning cheap.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import threading
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, Row, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .catalog import Catalog, atomic_dir_swap
from .errors import InvalidTopicError, ValidationError
from .routing import assign_partitions
from pyspark.sql.types import IntegerType, StructField

from .schema import RECORD_SCHEMA, STORED_FILE_SCHEMA

# stored columns + the Hive-style partition-dir column
READ_SCHEMA = StructType(
    STORED_FILE_SCHEMA.fields + [StructField("partition", IntegerType(), False)]
)

_ARRIVAL = "__arrival"


class LogStore:
    """Topic-log storage over a warehouse directory."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | os.PathLike,
        max_records_per_file: int = 1_000_000,
        compression: str = "zstd",
    ):
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.catalog = Catalog(warehouse)
        self.max_records_per_file = max_records_per_file
        self.compression = compression
        self._ingest_locks: dict[str, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        self._txn_log = None

    # -- transactions (txn.py; Kafka EOS analog) -----------------------
    @property
    def txn_log(self):
        if self._txn_log is None:
            from .txn import TxnLog

            self._txn_log = TxnLog(self.warehouse)
        return self._txn_log

    def init_transactions(self, transactional_id: str):
        """InitProducerId: fence prior incarnations of this transactional
        id (aborting their in-flight transaction) and return a
        :class:`~flux_spark.txn.TransactionalSession` at the new epoch."""
        from .txn import TransactionalSession

        epoch = self.txn_log.init_id(transactional_id)
        # recovery sweep: offsets of committed txns that never reached the
        # offsets table (crash between commit marker and apply)
        self.apply_txn_offsets()
        return TransactionalSession(self, transactional_id, epoch)

    def apply_txn_offsets(self) -> int:
        """Apply consumer offsets bound to COMMITTED transactions
        (sendOffsetsToTransaction) to the ``_offsets`` table, then mark
        them applied in the txn log. Idempotent and crash-safe: the txn
        log entry is the durable record until the apply succeeds (and
        ``forget_committed`` refuses to GC it before then), so a crash
        anywhere between the commit marker and the offsets write is
        healed by the next call — offsets land at least once, and the
        latest-wins resolution of the offsets table makes re-application
        harmless. Returns the number of transactions applied."""
        if not (self.warehouse / "_txns.json").exists():
            return 0
        pending = self.txn_log.pending_committed_offsets()
        if not pending:
            return 0
        from .consumer import OffsetStore

        os_ = OffsetStore(self)
        for key, rows in pending:
            by_group: dict[str, dict[tuple[str, int], int]] = {}
            for g, t, p, off in rows:
                by_group.setdefault(g, {})[(t, int(p))] = int(off)
            for g, offs in by_group.items():
                os_.commit(g, offs, metadata=f"txn:{key}")
            self.txn_log.mark_offsets_applied(key)
        return len(pending)

    # ------------------------------------------------------------------
    def topic_path(self, topic: str) -> str:
        return str(self.warehouse / topic)

    def _ingest_lock(self, topic: str) -> threading.Lock:
        with self._locks_guard:
            return self._ingest_locks.setdefault(topic, threading.Lock())

    def _recover_swap(self, topic: str) -> bool:
        """Restore a topic directory stranded by a rewrite (compact /
        truncate) that crashed between its two renames. Writers run this
        inside :meth:`_write_lock`; readers call it directly (guarded by
        the warehouse swap flock only), which is safe because nothing on
        the read path recreates the live directory."""
        from .catalog import recover_dir_swap

        return recover_dir_swap(
            Path(self.topic_path(topic)), self.warehouse / ".swap.lock"
        )

    @contextlib.contextmanager
    def _write_lock(self, topic: str):
        """Single-writer-per-topic guard, now across PROCESSES too: the
        in-process threading.Lock serializes this store's threads (and
        makes the flock safe — flock conflicts between two fds of one
        process), then a per-topic flock file serializes other driver
        processes sharing the warehouse. Without the file lock, two
        processes could both read hwm=N and mint duplicate offsets
        (VERDICT r3 "What's missing" #2). flock auto-releases on process
        death, so a crashed writer never wedges the topic.

        The lock file lives OUTSIDE the topic directory (``.locks/``):
        when it lived inside, (a) acquiring it could recreate a topic dir
        that a rewrite had just renamed away — the rewrite's second
        rename then failed and a later recovery deleted the real data as
        a "stale backup" — and (b) a successful swap renamed the lock
        file away with the directory, so the holder kept flocking an
        unlinked inode while new writers locked a fresh one, silently
        breaking mutual exclusion. Crash recovery runs INSIDE the lock
        (no writer can interleave with the check-and-restore)."""
        from .catalog import file_lock

        with self._ingest_lock(topic), file_lock(
            self.warehouse / ".locks" / f"{topic}.lock"
        ):
            self._recover_swap(topic)
            yield

    # -- write path (S1-S6, §3.1) --------------------------------------
    def append(
        self,
        topic: str,
        df: DataFrame,
        ordering_col: str | None = None,
        batch_id: str | None = None,
    ) -> dict[int, tuple[int, int]]:
        """Append a batch of records to a topic log.

        ``df`` must contain ``value``; ``key``/``partition``/``timestamp``/
        ``headers`` are optional and defaulted like ProducerRecord
        (ProducerRecord.java:19-89; timestamp -> now, ProducerRecord.java:47-50).
        ``ordering_col`` is a column whose ascending order defines arrival
        order (and round-robin sequence) deterministically; without it,
        arrival order is the DataFrame's incidental order.

        ``batch_id`` makes the append idempotent — exactly-once under
        driver crash-retry, in both crash positions (the reference instead
        silently DROPS a batch after 3 retries, FluxProducer.java:229-233):

        * the batch id is recorded inside the SAME atomic catalog save
          that advances the hwm (``Catalog.advance_hwm``), so "committed"
          and "marked" cannot diverge — a replay of a committed batch is
          always detected and is a no-op returning ``{}``;
        * an *intent* file is created before the data write and removed
          after the commit; a retry that finds a leftover intent knows the
          prior attempt died mid-write and discards that attempt's
          uncommitted files (all fully above the hwm, since the hwm never
          advanced) before re-appending — no duplicate rows at the same
          offsets.

        Returns ``{partition: (first_offset, last_offset)}`` for the batch.
        """
        meta = self.catalog.get_topic(topic)  # raises InvalidTopicError
        n = meta.num_partitions
        # legacy pre-r4 touch-file marker (still honored on old warehouses)
        marker = (
            self.warehouse / topic / "_batch_commits" / str(batch_id)
            if batch_id is not None
            else None
        )

        with self._write_lock(topic):
            if batch_id is not None and (
                self.catalog.batch_committed(topic, batch_id)
                or marker.exists()
            ):
                return {}
            intent = None
            if batch_id is not None:
                intent = (
                    self.warehouse
                    / topic
                    / "_batch_commits"
                    / f"{batch_id}.intent"
                )
                if intent.exists():
                    # prior attempt crashed between data write and commit:
                    # its files sit entirely above the hwm — drop them so
                    # this retry cannot double-write the same offsets
                    self.discard_uncommitted(topic)
                intent.parent.mkdir(parents=True, exist_ok=True)
                intent.touch()
            # refresh hwm under the lock
            meta = self.catalog.get_topic(topic)

            work = df
            if "value" not in work.columns:
                raise ValueError("record batch must have a 'value' column")
            work = work.withColumn(
                _ARRIVAL,
                F.col(ordering_col).cast("long")
                if ordering_col
                else F.monotonically_increasing_id(),
            )
            if "timestamp" in work.columns:
                work = work.withColumn(
                    "timestamp",
                    F.coalesce(
                        F.col("timestamp").cast("timestamp"), F.current_timestamp()
                    ),
                )
            else:
                work = work.withColumn("timestamp", F.current_timestamp())
            if "key" not in work.columns:
                work = work.withColumn("key", F.lit(None).cast("string"))
            if "headers" not in work.columns:
                work = work.withColumn(
                    "headers", F.lit(None).cast(RECORD_SCHEMA["headers"].dataType)
                )
            work = work.withColumn("value", F.col("value").cast("string"))

            work = assign_partitions(
                work, n, ordering_col=_ARRIVAL if ordering_col else None
            )

            # One shuffle: co-locate each log partition into (at most) one
            # task, which both preserves per-partition arrival order and
            # writes each partition dir from a single writer (C6 analog).
            work = work.repartition(n, "partition")

            hwm_map = F.create_map(
                *[
                    x
                    for p in range(n)
                    for x in (F.lit(p), F.lit(meta.next_offset(p)))
                ]
            )
            w = Window.partitionBy("partition").orderBy(_ARRIVAL)
            work = work.withColumn(
                "offset",
                (F.row_number().over(w) - F.lit(1) + F.element_at(hwm_map, F.col("partition"))).cast(
                    "long"
                ),
            )

            out = work.select(
                "partition",
                "offset",
                "timestamp",
                F.col("key").cast("string").alias("key"),
                "value",
                "headers",
            )
            # Per-partition offset ranges are collected DURING the write via
            # the Observation API — ingest is exactly one job over the data
            # (no persist + second stats pass). 2 aggregates per partition;
            # fine for realistic topic widths (Kafka-style 10s-1000s).
            from pyspark.sql import Observation

            obs = Observation()
            aggs = []
            for p in range(n):
                on_p = F.when(F.col("partition") == p, F.col("offset"))
                aggs.append(F.min(on_p).alias(f"min_{p}"))
                aggs.append(F.max(on_p).alias(f"max_{p}"))
            out = out.observe(obs, aggs[0], *aggs[1:])
            (
                out.sortWithinPartitions("offset")
                .write.mode("append")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .option("compression", self.compression)
                .partitionBy("partition")
                .parquet(self.topic_path(topic))
            )
            vals = obs.get
            stats = {
                p: (int(vals[f"min_{p}"]), int(vals[f"max_{p}"]))
                for p in range(n)
                if vals.get(f"min_{p}") is not None
            }

            self.catalog.advance_hwm(
                topic,
                {p: last + 1 for p, (_, last) in stats.items()},
                batch_id=batch_id,
            )
            if intent is not None:
                intent.unlink(missing_ok=True)
            return stats

    def append_rows(
        self,
        topic: str,
        rows: list[dict],
        batch_id: str | None = None,
    ) -> dict[int, tuple[int, int]]:
        """Small-batch fast-path append — the produce-side twin of
        :meth:`read_since`. A queue-like caller producing a handful of
        records pays a full Spark job (~0.5 s floor) through
        :meth:`append`; for driver-sized batches the batch IS the
        bottleneck, so this path routes, offsets, and writes entirely on
        the driver with pyarrow — one parquet file per touched partition,
        no JVM round trip.

        Semantics are IDENTICAL to :meth:`append` and oracle-gated against
        it (``log_fastpath_produce_parity``):

        * routing priority explicit-valid -> murmur2(key) -> round-robin
          on the arrival sequence (PartitionSelector.java:22-51), with the
          same Python murmur2 the pandas UDF vectorizes;
        * gap-free per-partition offsets continuing from the catalog hwm,
          assigned in arrival order under the same cross-process write
          lock;
        * commit-then-visible: files land first, the hwm advances last, so
          a crash between the two leaves an invisible torn tail that
          :meth:`read`/:meth:`read_since` both clamp away;
        * ``batch_id`` idempotency via the same intent-file protocol.

        ``rows``: list of dicts in arrival order — ``value`` required;
        ``partition``/``timestamp``/``key``/``headers`` optional;
        ``seq`` (optional) is the explicit arrival sequence used for
        round-robin placement (FluxProducer passes its global counter so
        placement matches the Spark path bit-for-bit). Headers are
        ``[(key, value-bytes), ...]`` pairs.

        At 100 TB this path is still correct but the wrong tool — it
        serializes through the driver. :meth:`append` remains the bulk
        path; FluxProducer picks per flush based on batch size.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .murmur2 import partition_for_key

        meta = self.catalog.get_topic(topic)
        n = meta.num_partitions
        marker = (
            self.warehouse / topic / "_batch_commits" / str(batch_id)
            if batch_id is not None
            else None
        )
        with self._write_lock(topic):
            if batch_id is not None and (
                self.catalog.batch_committed(topic, batch_id)
                or marker.exists()
            ):
                return {}
            intent = None
            if batch_id is not None:
                intent = (
                    self.warehouse
                    / topic
                    / "_batch_commits"
                    / f"{batch_id}.intent"
                )
                if intent.exists():
                    self.discard_uncommitted(topic)
                intent.parent.mkdir(parents=True, exist_ok=True)
                intent.touch()
            meta = self.catalog.get_topic(topic)  # refresh under the lock

            from datetime import datetime, timezone

            now = datetime.now(timezone.utc)
            routed: dict[int, list[tuple]] = {}
            for i, row in enumerate(rows):
                value = row.get("value")
                if value is None:
                    raise ValueError("record batch must have a 'value' column")
                key = row.get("key")
                p = row.get("partition")
                if p is not None and 0 <= int(p) < n:
                    part = int(p)
                elif key is not None and len(key) > 0:
                    part = partition_for_key(key, n)
                else:
                    part = int(row.get("seq", i)) % n
                ts = row.get("timestamp") or now
                headers = row.get("headers")
                if headers is not None:
                    headers = [
                        {"key": k, "value": v} for k, v in headers
                    ]
                routed.setdefault(part, []).append(
                    (ts, key, str(value), headers)
                )

            arrow_schema = pa.schema(
                [
                    ("offset", pa.int64()),
                    ("timestamp", pa.timestamp("us", tz="UTC")),
                    ("key", pa.string()),
                    ("value", pa.string()),
                    (
                        "headers",
                        pa.list_(
                            pa.struct(
                                [
                                    ("key", pa.string()),
                                    ("value", pa.binary()),
                                ]
                            )
                        ),
                    ),
                ]
            )
            codec = "none" if self.compression == "uncompressed" else self.compression
            stats: dict[int, tuple[int, int]] = {}
            for part, recs in routed.items():
                first = meta.next_offset(part)
                offsets = list(range(first, first + len(recs)))
                table = pa.table(
                    {
                        "offset": offsets,
                        "timestamp": [r[0] for r in recs],
                        "key": [r[1] for r in recs],
                        "value": [r[2] for r in recs],
                        "headers": [r[3] for r in recs],
                    },
                    schema=arrow_schema,
                )
                pdir = Path(self.topic_path(topic)) / f"partition={part}"
                pdir.mkdir(parents=True, exist_ok=True)
                pq.write_table(
                    table,
                    pdir / f"part-fast-{uuid.uuid4().hex}.parquet",
                    compression=codec,
                )
                stats[part] = (first, offsets[-1])

            # called even for an empty batch so a batch_id is marked
            # committed exactly like the Spark path does
            self.catalog.advance_hwm(
                topic,
                {p: last + 1 for p, (_, last) in stats.items()},
                batch_id=batch_id,
            )
            if intent is not None:
                intent.unlink(missing_ok=True)
            return stats

    # -- read path (S8, S10, §3.2) -------------------------------------
    def read(
        self,
        topic: str,
        partitions: list[int] | None = None,
        start_offsets: dict[int, int] | None = None,
        end_offsets: dict[int, int] | None = None,
        include_uncommitted: bool = False,
        read_committed: bool = False,
    ) -> DataFrame:
        """Batch scan of a topic log as the canonical RECORD_SCHEMA.

        Offset bounds are per-partition ``[start, end)``. All predicates are
        plain column comparisons -> pushed to the parquet scan (partition-dir
        pruning on ``partition``, rowgroup skipping on ``offset``).

        Only COMMITTED records are visible: ``end_offsets`` defaults to the
        catalog high-water marks, so rows from a torn append (segment files
        written, hwm never advanced because the driver died in between) are
        invisible until recovered — the read-side half of the
        commit-then-visible contract (vs the reference's ack-before-fsync,
        LogSegment.java:165-218). ``include_uncommitted=True`` bypasses the
        clamp for forensic reads; ``recover_hwm_from_data`` re-adopts a
        torn tail by advancing the hwm over it.

        ``read_committed=True`` is Kafka's ``isolation.level=read_committed``:
        offset ranges belonging to non-committed transactions (in-flight or
        aborted, per the warehouse transaction log) are hidden. The ranges
        are driver-side metadata, so they compile to pushed-down offset
        predicates — no join, no extra pass (txn.py module docstring).
        """
        meta = self.catalog.get_topic(topic)
        self._recover_swap(topic)
        if end_offsets is None and not include_uncommitted:
            end_offsets = {p: meta.next_offset(p) for p in meta.partition_ids()}
        df = (
            self.spark.read.schema(READ_SCHEMA)
            .option("basePath", self.topic_path(topic))
            .parquet(self.topic_path(topic))
        )
        if partitions is not None:
            df = df.where(F.col("partition").isin([int(p) for p in partitions]))
        if start_offsets:
            cond = None
            for p in partitions if partitions is not None else meta.partition_ids():
                lo = start_offsets.get(p, 0)
                hi = (end_offsets or {}).get(p)
                c = (F.col("partition") == p) & (F.col("offset") >= lo)
                if hi is not None:
                    c = c & (F.col("offset") < hi)
                cond = c if cond is None else (cond | c)
            if cond is not None:
                df = df.where(cond)
        elif end_offsets:
            cond = None
            for p, hi in end_offsets.items():
                c = (F.col("partition") == p) & (F.col("offset") < hi)
                cond = c if cond is None else (cond | c)
            df = df.where(cond)
        if read_committed:
            for p, first, last in self.txn_log.non_committed_ranges(topic):
                df = df.where(
                    ~(
                        (F.col("partition") == p)
                        & (F.col("offset") >= first)
                        & (F.col("offset") <= last)
                    )
                )
        return df.select(
            F.lit(topic).alias("topic"),
            F.col("partition"),
            "offset",
            "timestamp",
            "key",
            "value",
            "headers",
        )

    def read_at(self, topic: str, partition: int, offset: int) -> Row | None:
        """Point fetch — Broker.consumeMessage (Broker.java:437-443) /
        LogSegment.getRecordFromSegmentAtOffset (LogSegment.java:278-339).

        The index-seek becomes a pruned scan: partition-dir pruning + rowgroup
        min/max skipping on ``offset``. Unlike the reference (which only
        searches the active segment, Log.java:109-115), this reads the whole
        partition history.
        """
        rows = (
            self.read(topic, partitions=[partition])
            .where(F.col("offset") == int(offset))
            .limit(1)
            .collect()
        )
        return rows[0] if rows else None

    def read_since(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_records: int | None = None,
    ) -> list[dict]:
        """Low-latency tail read for fresh appends — the fast-path twin of
        ``read(start_offsets=...)`` that answers in milliseconds instead of
        a Spark-job floor (~1.1 s p50 on this box, BENCH_r09 latency leg).

        A queue user polling for records they *just* produced is reading a
        metadata-sized tail of ONE partition; launching a distributed scan
        for that is the wrong execution model. This path stays entirely on
        the driver: list only the ``partition=<p>`` directory, skip whole
        files/rowgroups via the Parquet footer min/max statistics on the
        sorted ``offset`` column (the same index the reference keeps as
        IndexEntries, IndexEntries.java:17-54 — here read directly instead
        of through a Spark scan), and decode only the surviving rowgroups
        with pyarrow.

        Visibility contract is IDENTICAL to ``read()``: committed records
        only — rows at or above the catalog high-water mark (a torn
        append's tail) are filtered out, and in-flight files that fail to
        parse are skipped (they are above the hwm by construction). The
        equivalence is oracle-gated (``log_read_since_fastpath``) and
        measured as the second latency row of bench.py.

        Returns ``list[dict]`` in ascending offset order with the
        RECORD_SCHEMA fields (topic, partition, offset, timestamp, key,
        value, headers) — plain Python, no DataFrame, because the point of
        the fast path is to never touch the JVM.
        """
        import pyarrow.parquet as pq

        meta = self.catalog.get_topic(topic)
        self._recover_swap(topic)
        hwm = meta.next_offset(int(partition))
        lo = int(offset)
        if lo >= hwm:
            return []
        pdir = Path(self.topic_path(topic)) / f"partition={int(partition)}"
        recs: list[dict] = []
        if pdir.is_dir():
            for fp in sorted(pdir.iterdir()):
                if not fp.name.endswith(".parquet") or fp.name.startswith(
                    ("_", ".")
                ):
                    continue
                try:
                    pf = pq.ParquetFile(fp)
                except Exception:
                    # a writer-in-flight partial file: above the hwm by
                    # construction (commit-then-visible), so skipping it
                    # cannot hide committed data
                    continue
                for rg in range(pf.metadata.num_row_groups):
                    rgm = pf.metadata.row_group(rg)
                    st = None
                    for ci in range(rgm.num_columns):
                        col = rgm.column(ci)
                        if col.path_in_schema == "offset":
                            st = col.statistics
                            break
                    if (
                        st is not None
                        and st.has_min_max
                        and (st.max < lo or st.min >= hwm)
                    ):
                        continue
                    for rec in pf.read_row_group(rg).to_pylist():
                        if lo <= rec["offset"] < hwm:
                            rec["topic"] = topic
                            rec["partition"] = int(partition)
                            ts = rec.get("timestamp")
                            if hasattr(ts, "to_pydatetime"):
                                # ns-resolution arrow timestamps surface as
                                # pandas Timestamps; the contract is plain
                                # Python
                                rec["timestamp"] = ts.to_pydatetime()
                            recs.append(rec)
        recs.sort(key=lambda r: r["offset"])
        if max_records is not None:
            recs = recs[:max_records]
        return recs

    def high_water_marks(self, topic: str) -> dict[int, int]:
        """Next-offset-to-assign per partition, from the catalog."""
        meta = self.catalog.get_topic(topic)
        return {p: meta.next_offset(p) for p in meta.partition_ids()}

    def beginning_offsets(self, topic: str) -> dict[int, int]:
        """Kafka ``beginningOffsets`` analog: earliest readable offset per
        partition. 0 for untouched partitions; after retention truncation
        it is the first surviving record's offset; an empty (fully
        truncated) partition reports its high-water mark — beginning ==
        end means nothing to read, matching Kafka's log-start-offset
        semantics. One metadata-sized aggregation (min over the offset
        column, rowgroup-stat friendly)."""
        meta = self.catalog.get_topic(topic)
        rows = (
            self.read(topic)
            .groupBy("partition")
            .agg(F.min("offset").alias("mn"))
            .collect()
        )
        out = {p: meta.next_offset(p) for p in meta.partition_ids()}
        out.update({int(r["partition"]): int(r["mn"]) for r in rows})
        return out

    def discard_uncommitted(self, topic: str) -> int:
        """Crash recovery, discard flavor: delete data files lying entirely
        ABOVE the committed high-water mark — the leftovers of an append
        that wrote its parquet files but died before ``advance_hwm``. The
        complement of :meth:`recover_hwm_from_data` (which ADOPTS the torn
        tail instead). Used by the idempotent-produce retry path so a
        re-append cannot double-write offsets the torn attempt already
        wrote.

        Driver-side and metadata-only: reads each file's parquet FOOTER
        (rowgroup min stats on the offset column), never the data pages —
        O(#files) small reads, same cost profile as a file listing. Only
        call while holding the topic write lock (the retry path does).

        Returns the number of files removed.
        """
        import pyarrow.parquet as pq

        meta = self.catalog.get_topic(topic)
        removed = 0
        for p in meta.partition_ids():
            hwm = meta.next_offset(p)
            pdir = self.warehouse / topic / f"partition={p}"
            if not pdir.is_dir():
                continue
            for f in pdir.glob("*.parquet"):
                try:
                    md = pq.read_metadata(f)
                except Exception:  # truncated/torn file: also uncommitted
                    f.unlink(missing_ok=True)
                    removed += 1
                    continue
                names = [
                    md.schema.column(i).name for i in range(len(md.schema))
                ]
                idx = names.index("offset")
                mins = [
                    md.row_group(g).column(idx).statistics.min
                    for g in range(md.num_row_groups)
                    if md.row_group(g).column(idx).statistics is not None
                ]
                if mins and min(mins) >= hwm:
                    f.unlink(missing_ok=True)
                    removed += 1
        return removed

    def recover_hwm_from_data(self, topic: str) -> dict[int, int]:
        """Rebuild the high-water marks by scanning the log (crash recovery
        for a lost catalog, or re-adopting a torn append's tail):
        max(offset)+1 per partition over ALL on-disk records."""
        meta = self.catalog.get_topic(topic)
        rows = (
            self.read(topic, include_uncommitted=True)
            .groupBy("partition")
            .agg(F.max("offset").alias("mx"))
            .collect()
        )
        recovered = {p: 0 for p in meta.partition_ids()}
        recovered.update({int(r["partition"]): int(r["mx"]) + 1 for r in rows})
        self.catalog.advance_hwm(topic, recovered)
        return recovered

    def offsets_for_times(self, topic: str, ts) -> dict[int, int | None]:
        """Per-partition earliest offset whose record timestamp >= ``ts`` —
        the Kafka ``offsetsForTimes`` analog the reference lacks. One
        aggregation pass; the timestamp predicate prunes rowgroups via
        parquet min/max stats. None for partitions with no such record."""
        meta = self.catalog.get_topic(topic)
        rows = (
            self.read(topic)
            .where(F.col("timestamp") >= F.lit(ts).cast("timestamp"))
            .groupBy("partition")
            .agg(F.min("offset").alias("first_offset"))
            .collect()
        )
        out: dict[int, int | None] = {p: None for p in meta.partition_ids()}
        out.update({int(r["partition"]): int(r["first_offset"]) for r in rows})
        return out

    def truncate_before(self, topic: str, min_offsets: dict[int, int]) -> None:
        """Retention: drop records below ``min_offsets[partition]`` (offsets
        of retained records are preserved — consumers' positions stay
        valid). Implemented as a filtered rewrite + atomic directory swap,
        like compact(); at warehouse scale the same operation would drop
        whole files below the watermark first and rewrite only the
        boundary file.

        Holds the topic write lock for the WHOLE read-rewrite-swap (not
        just the swap): an append committing between the rewrite's
        snapshot and the directory swap would otherwise be silently
        erased by the swap (caught by
        tests/test_log.py::test_compact_races_live_appends)."""
        with self._write_lock(topic):
            meta = self.catalog.get_topic(topic)
            n = meta.num_partitions
            keep = None
            for p, lo in min_offsets.items():
                c = (F.col("partition") == int(p)) & (F.col("offset") >= int(lo))
                keep = c if keep is None else (keep | c)
            untouched = ~F.col("partition").isin([int(p) for p in min_offsets])
            cond = untouched if keep is None else (keep | untouched)
            df = self.read(topic).drop("topic").where(cond)
            tmp = self.warehouse / f".trunc-{topic}-{uuid.uuid4().hex[:8]}"
            (
                df.repartition(n, "partition")
                .sortWithinPartitions("offset")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .option("compression", self.compression)
                .partitionBy("partition")
                .parquet(str(tmp))
            )
            atomic_dir_swap(
                Path(self.topic_path(topic)), tmp, self.warehouse / ".swap.lock"
            )

    def create_view(self, topic: str, view_name: str | None = None) -> str:
        """Register the topic log as a temp view for ``spark.sql`` access
        (SURVEY.md §7 phase 4: SQL/DataFrame views over topics). The view
        is a plain projection over the parquet scan, so predicates written
        in SQL still push down to partition dirs and rowgroup stats."""
        name = view_name or f"topic_{topic}".replace("-", "_")
        self.read(topic).createOrReplaceTempView(name)
        return name

    def create_all_views(self) -> list[str]:
        """Register every catalog topic as a temp view."""
        return [self.create_view(t) for t in self.catalog.list_topics()]

    # -- maintenance (SURVEY.md §7 phase 4 "batch indexing") ------------
    def apply_retention(self, topic: str, now=None) -> dict[int, int] | None:
        """Enforce the topic's ``retention.ms`` config (Kafka's time-based
        retention, LogCleaner analog): drop every record older than
        ``now - retention.ms`` via the offsets-for-times + truncate
        composition. Returns the per-partition cut offsets, or None if the
        topic has no retention config. ``now`` defaults to the current
        time; pass a timestamp for deterministic tests/replays.
        """
        import datetime

        meta = self.catalog.get_topic(topic)
        ret_ms = meta.configs.get("retention.ms")
        if ret_ms is None:
            return None
        now = now or datetime.datetime.now(datetime.timezone.utc)
        cutoff = now - datetime.timedelta(milliseconds=int(ret_ms))
        offs = self.offsets_for_times(topic, cutoff)
        hwm = self.high_water_marks(topic)
        # partitions whose records are ALL older than the cutoff truncate
        # to their hwm (everything expires)
        cuts = {
            p: (o if o is not None else hwm.get(p, 0))
            for p, o in offs.items()
        }
        self.truncate_before(topic, cuts)
        return cuts

    def maintenance(
        self,
        min_files_to_compact: int = 16,
        compact_offsets: bool = True,
    ) -> dict[str, str]:
        """One housekeeping pass over the warehouse — the cron-job entry
        point a deployment schedules (Kafka's LogCleaner thread analog):

        * per topic: enforce ``retention.ms`` if configured, then rewrite
          any partition whose file count reached ``min_files_to_compact``
          (small-file compaction; threshold is per-PARTITION since files
          accrue per partition per append);
        * the ``_offsets`` commit log: latest-wins rewrite
          (:meth:`OffsetStore.compact`) so long-lived groups don't
          accumulate one tiny file per poll loop forever.

        Returns {subject: action} for observability. Safe to run while
        producers are live — every rewrite takes the topic write lock and
        swaps directories atomically. One caveat mirrors Kafka's cleaner:
        a concurrent batch READ whose lazy scan lists files just before a
        swap and executes just after may fail transiently with a missing-
        file error; re-running the read succeeds (crash recovery is
        lossless, see catalog.atomic_dir_swap). Offsets-log reads are not
        affected — fetch()/groups() hold the offsets flock end-to-end.
        """
        actions: dict[str, str] = {}
        for topic in self.catalog.list_topics():
            if self.apply_retention(topic) is not None:
                actions[topic] = "retention"
            meta = self.catalog.get_topic(topic)
            n_files = max(
                (
                    len(list((self.warehouse / topic / f"partition={p}").glob("*.parquet")))
                    for p in meta.partition_ids()
                ),
                default=0,
            )
            if n_files >= min_files_to_compact:
                self.compact(topic)
                actions[topic] = (
                    actions.get(topic, "") + "+compact"
                ).lstrip("+")
        if compact_offsets and (self.warehouse / "_offsets").is_dir():
            from .consumer import OffsetStore

            kept = OffsetStore(self).compact()
            actions["_offsets"] = f"compacted ({kept} rows kept)"
        return actions

    def compact(self, topic: str, target_records_per_file: int | None = None) -> None:
        """Rewrite each partition's many small segment files into few large
        offset-sorted ones (small-file compaction / OPTIMIZE).

        Keeps rowgroup-stat pruning effective as segment counts grow; the
        poll-latency mitigation from SURVEY.md §7 risk 2.

        Runs entirely under the topic write lock: the rewrite reads a
        snapshot, so an append landing between snapshot and swap would be
        erased if producers weren't excluded for the whole operation
        (regression-tested by test_compact_races_live_appends). Producers
        block for the compaction window — the Kafka-cleaner trade; at
        warehouse scale the cleaner compacts partition-by-partition to
        shrink each window.
        """
        with self._write_lock(topic):
            meta = self.catalog.get_topic(topic)
            n = meta.num_partitions
            tmp = self.warehouse / f".compact-{topic}-{uuid.uuid4().hex[:8]}"
            df = self.read(topic).drop("topic")
            (
                df.repartition(n, "partition")
                .sortWithinPartitions("offset")
                .write.mode("overwrite")
                .option(
                    "maxRecordsPerFile",
                    target_records_per_file or self.max_records_per_file,
                )
                .option("compression", self.compression)
                .partitionBy("partition")
                .parquet(str(tmp))
            )
            atomic_dir_swap(
                Path(self.topic_path(topic)), tmp, self.warehouse / ".swap.lock"
            )

    def compact_by_key(self, topic: str) -> None:
        """Kafka-style log compaction: per (partition, key) retain only the
        record with the highest offset; records whose retained value is
        NULL (tombstones) are then removed entirely; null-key records are
        kept as-is (Kafka rejects them in compacted topics — keeping them
        is the lossless choice). Offsets of survivors are preserved, so
        compaction creates offset gaps exactly like Kafka's cleaner and
        consumer positions remain valid.

        One shuffle keyed on (partition, key) — at warehouse scale the
        cleaner would run per-partition over only the dirty ratio, but the
        plan shape (window max-offset per key, no driver loop) is the one
        that scales. Entire read-rewrite-swap runs under the topic write
        lock so a concurrent append can't land between snapshot and swap
        and be erased (see compact())."""
        from pyspark.sql import Window

        with self._write_lock(topic):
            meta = self.catalog.get_topic(topic)
            n = meta.num_partitions
            df = self.read(topic).drop("topic")
            w = Window.partitionBy("partition", "key").orderBy(F.col("offset").desc())
            keyed = (
                df.where(F.col("key").isNotNull())
                .withColumn("__rn", F.row_number().over(w))
                .where((F.col("__rn") == 1) & F.col("value").isNotNull())
                .drop("__rn")
            )
            compacted = df.where(F.col("key").isNull()).unionByName(keyed)
            tmp = self.warehouse / f".kcompact-{topic}-{uuid.uuid4().hex[:8]}"
            (
                compacted.repartition(n, "partition")
                .sortWithinPartitions("offset")
                .write.mode("overwrite")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .option("compression", self.compression)
                .partitionBy("partition")
                .parquet(str(tmp))
            )
            atomic_dir_swap(
                Path(self.topic_path(topic)), tmp, self.warehouse / ".swap.lock"
            )

    def describe_topic(self, topic: str) -> DataFrame:
        """AdminClient.describeTopics analog: one row per partition with
        record count, earliest/latest committed offsets, the committed
        high-water mark, and the record timestamp range. Empty partitions
        appear with zero counts (the dashboard/monitoring contract). One
        partial-aggregated scan plus a catalog lookup."""
        meta = self.catalog.get_topic(topic)
        hwm_rows = [
            (p, meta.next_offset(p)) for p in meta.partition_ids()
        ]
        hwm_df = self.spark.createDataFrame(
            hwm_rows, "partition int, hwm long"
        )
        stats = (
            self.read(topic)
            .groupBy("partition")
            .agg(
                F.count("*").alias("n_records"),
                F.min("offset").alias("first_offset"),
                F.max("offset").alias("last_offset"),
                F.min("timestamp").alias("first_ts"),
                F.max("timestamp").alias("last_ts"),
            )
        )
        return (
            hwm_df.join(stats, "partition", "left")
            .select(
                "partition",
                F.coalesce("n_records", F.lit(0)).alias("n_records"),
                "first_offset",
                "last_offset",
                "hwm",
                "first_ts",
                "last_ts",
            )
        )

    def mirror_topic(self, src_store: "LogStore", topic: str) -> None:
        """Mirror a topic from another store byte-for-byte (the
        MirrorMaker / cross-cluster replication analog): records keep
        their exact (partition, offset, timestamp, key, value, headers),
        so consumer positions committed against the source remain valid
        against the mirror.

        Bypasses append's routing/offset assignment on purpose — a mirror
        must not re-route. One partition-pruned scan + partitioned write;
        incremental refresh copies only offsets past the mirror's hwm, so
        repeated invocations are cheap and idempotent.
        """
        meta = src_store.catalog.get_topic(topic)
        if not self.catalog.topic_exists(topic):
            self.catalog.create_topic(
                topic, meta.num_partitions, meta.replication_factor
            )
        elif (
            self.catalog.get_topic(topic).num_partitions
            != meta.num_partitions
        ):
            # a mismatched layout would scatter offsets across the wrong
            # partition dirs — refuse rather than corrupt
            raise ValidationError(
                f"mirror target {topic!r} has "
                f"{self.catalog.get_topic(topic).num_partitions} partitions, "
                f"source has {meta.num_partitions}"
            )
        with self._write_lock(topic):
            have = self.catalog.get_topic(topic)
            starts = {p: have.next_offset(p) for p in range(meta.num_partitions)}
            # hwm comparison is catalog-only: an up-to-date mirror refresh
            # costs zero jobs (and Observation can't report on empty jobs)
            if all(
                meta.next_offset(p) <= starts[p]
                for p in range(meta.num_partitions)
            ):
                return
            fresh = src_store.read(topic, start_offsets=starts).drop("topic")
            from pyspark.sql import Observation

            obs = Observation()
            aggs = []
            for p in range(meta.num_partitions):
                on_p = F.when(F.col("partition") == p, F.col("offset"))
                aggs.append(F.max(on_p).alias(f"max_{p}"))
            fresh = fresh.observe(obs, aggs[0], *aggs[1:])
            (
                fresh.repartition(meta.num_partitions, "partition")
                .sortWithinPartitions("offset")
                .write.mode("append")
                .option("maxRecordsPerFile", self.max_records_per_file)
                .option("compression", self.compression)
                .partitionBy("partition")
                .parquet(self.topic_path(topic))
            )
            vals = obs.get
            self.catalog.advance_hwm(
                topic,
                {
                    p: int(vals[f"max_{p}"]) + 1
                    for p in range(meta.num_partitions)
                    if vals.get(f"max_{p}") is not None
                },
            )

    def materialize(self, topic: str) -> DataFrame:
        """KTable-style snapshot of a keyed changelog topic: the current
        value per key — latest record wins, keys whose latest record is a
        tombstone (NULL value) drop out of the table. Read-side only; the
        log keeps its full history (compact_by_key is the storage-side
        twin that rewrites segments).

        Ordering is (offset within the key's partition, partition as a
        deterministic tie-break) — with key routing a key lives in one
        partition, so this is exactly Kafka Streams' per-key update order.
        One shuffle keyed on the record key; at scale the window's partial
        max folds map-side and the scan prunes to (key, value, partition,
        offset)."""
        from pyspark.sql import Window

        df = self.read(topic).where(F.col("key").isNotNull())
        w = Window.partitionBy("key").orderBy(
            F.col("offset").desc(), F.col("partition").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where((F.col("__rn") == 1) & F.col("value").isNotNull())
            .select("key", "value", "partition", "offset")
        )

    def delete_topic(self, topic: str, drop_data: bool = True) -> None:
        if not self.catalog.topic_exists(topic):
            raise InvalidTopicError(f"topic {topic!r} does not exist")
        self.catalog.delete_topic(topic, drop_data=drop_data)
