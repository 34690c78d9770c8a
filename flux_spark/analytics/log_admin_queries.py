"""Admin / maintenance / group-lifecycle gate queries for the log engine.

Split from ``log_queries.py`` before it crossed the 2k-LoC registry bar
(VERDICT r6 #7, pure move): core produce/consume/stream/source gates stay
there; topic administration (describe/alter/delete/maintenance),
transactional reads, offset administration, and the consumer-group
rebalance lifecycle gates live here. Every entry registers into the same
``LOG_QUERIES`` dict on import (the tail of ``log_queries.py`` imports
this module, mirroring the ``llm/queries.py`` aggregator pattern).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .log_queries import LOG_QUERIES, _ROUTED_CTE, _ingest_events
from .registry import load_table, register

@register(
    LOG_QUERIES,
    "log_describe_topic",
    _ROUTED_CTE
    + """
    SELECT part_id AS partition,
           COUNT(*) AS n_records,
           MIN(record_offset) AS first_offset,
           MAX(record_offset) AS last_offset,
           COUNT(*) AS hwm,
           MIN(event_ts) AS first_ts,
           MAX(event_ts) AS last_ts
    FROM routed GROUP BY part_id
    """,
    "admin describeTopics analog: per-partition record counts, committed "
    "offset range, high-water mark, and timestamp range — the monitoring "
    "contract (empty partitions would report zero counts)",
)
def log_describe_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = _ingest_events(spark, sf_dir)
    return store.describe_topic("events")


@register(
    LOG_QUERIES,
    "log_txn_read_committed",
    """
    WITH committed AS (
      SELECT
        CAST(event_id % 3 AS INTEGER) AS part_id,
        ROW_NUMBER() OVER (PARTITION BY event_id % 3 ORDER BY event_id) - 1
          AS record_offset,
        CAST(user_id AS VARCHAR) AS rec_key,
        CAST(event_id AS VARCHAR) AS rec_value
      FROM events WHERE event_id % 2 = 0
    )
    SELECT part_id, record_offset, rec_key, rec_value FROM committed
    """,
    "transactional produce with read_committed isolation (Kafka EOS "
    "analog, absent from the reference): even events commit in one "
    "transaction, odd events abort in a second, a third stays in-flight "
    "from a fenced zombie producer — the read_committed scan must return "
    "exactly the committed rows at their real offsets (evens were "
    "appended first, so their offsets are contiguous from 0); the "
    "exclusion ranges compile to pushed-down offset predicates, no join",
)
def log_txn_read_committed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..log import LogStore
    from ..txn import ProducerFencedError

    wh = tempfile.mkdtemp(prefix="flux-txn-")
    store = LogStore(spark, wh)
    store.catalog.create_topic("orders", 3)
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(3)).cast("int").alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    s = store.init_transactions("loader")
    s.begin()
    s.send("orders", e.where(F.col("seq") % 2 == 0), ordering_col="seq")
    s.commit()
    s.begin()
    s.send("orders", e.where(F.col("seq") % 2 == 1), ordering_col="seq")
    s.abort()
    # zombie in-flight work: fenced by a newer incarnation, never commits
    s.begin()
    s.send("orders", e.limit(10), ordering_col="seq")
    zombie, s = s, store.init_transactions("loader")
    try:
        zombie.commit()
    except ProducerFencedError:
        pass
    return store.read("orders", read_committed=True).select(
        F.col("partition").alias("part_id"),
        F.col("offset").alias("record_offset"),
        F.col("key").alias("rec_key"),
        F.col("value").alias("rec_value"),
    )


@register(
    LOG_QUERIES,
    "log_admin_reset_offsets",
    _ROUTED_CTE
    + """
    , hw AS (
      SELECT part_id,
             MAX(record_offset) + 1 AS hwm,
             SUM(CASE WHEN event_ts < TIMESTAMP '2024-01-15 00:00:00'
                      THEN 1 ELSE 0 END) AS n_before_ts
      FROM routed GROUP BY part_id)
    SELECT part_id,
           CAST(hwm AS BIGINT) AS hwm,
           CAST(hwm AS BIGINT) AS after_latest,
           CAST(0 AS BIGINT) AS after_earliest,
           CAST(n_before_ts AS BIGINT) AS after_ts,
           CAST(0 AS BIGINT) AS lag_after_latest
    FROM hw
    """,
    "kafka-consumer-groups --reset-offsets parity: one group reset "
    "to-latest must commit exactly the high-water marks (lag 0), another "
    "reset to-earliest exactly the log-start offsets (0 here, no "
    "retention truncation), a third reset --to-datetime exactly the "
    "first offset at/after the timestamp — which the oracle recomputes "
    "as the per-partition count of records strictly before it (record "
    "time is monotone in arrival order here, mirroring Kafka time-index "
    "lookups); all read back from the durable _offsets log through the "
    "same latest-wins resolution the lag monitor uses",
)
def log_admin_reset_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import OffsetStore

    store = _ingest_events(spark, sf_dir)
    ostore = OffsetStore(store)
    ostore.reset_offsets("reset-latest-gate", "events", to="latest")
    ostore.reset_offsets("reset-earliest-gate", "events", to="earliest")
    ostore.reset_offsets("reset-ts-gate", "events", to="2024-01-15 00:00:00")

    def committed(group: str, alias: str) -> DataFrame:
        return (
            spark.read.parquet(ostore.path)
            .where((F.col("group_id") == group) & (F.col("topic") == "events"))
            .groupBy(F.col("partition").alias("part_id"))
            .agg(
                F.max_by(
                    "offset",
                    F.struct(F.col("commit_ts"), F.coalesce(F.col("seq"), F.lit(-1))),
                ).alias(alias)
            )
        )

    hw = (
        store.read("events")
        .groupBy(F.col("partition").alias("part_id"))
        .agg((F.max("offset") + 1).alias("hwm"))
    )
    return (
        hw.join(committed("reset-latest-gate", "after_latest"), "part_id")
        .join(committed("reset-earliest-gate", "after_earliest"), "part_id")
        .join(committed("reset-ts-gate", "after_ts"), "part_id")
        .select(
            "part_id",
            "hwm",
            "after_latest",
            "after_earliest",
            "after_ts",
            (F.col("hwm") - F.col("after_latest")).alias("lag_after_latest"),
        )
    )


@register(
    LOG_QUERIES,
    "log_delete_group",
    """
    SELECT group_id, CAST(n_parts AS BIGINT) AS n_parts
    FROM (VALUES ('dg-gate-b', 2)) AS t(group_id, n_parts)
    """,
    "Kafka AdminClient.deleteConsumerGroups parity: two groups commit "
    "offsets, one is deleted — the durable _offsets log must keep "
    "exactly the surviving group's rows (scoped to the dg-gate-* "
    "namespace so the shared gate store's other groups are untouched)",
)
def log_delete_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import OffsetStore

    store = _ingest_events(spark, sf_dir)
    ostore = OffsetStore(store)
    ostore.commit("dg-gate-a", {("events", 0): 10, ("events", 1): 20, ("events", 2): 30})
    ostore.commit("dg-gate-b", {("events", 0): 40, ("events", 1): 50})
    ostore.delete_group("dg-gate-a")
    return (
        spark.read.parquet(ostore.path)
        .where(F.col("group_id").startswith("dg-gate-"))
        .select("group_id", "topic", "partition")
        .distinct()
        .groupBy("group_id")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    LOG_QUERIES,
    "log_alter_partitions",
    """
    WITH r AS (
      SELECT event_id,
             CASE WHEN event_id % 5 < 2 THEN 'p1' ELSE 'p2' END AS rec_key,
             CASE WHEN event_id % 5 < 2 THEN CAST(event_id % 2 AS INTEGER)
                  ELSE CAST(event_id % 4 AS INTEGER) END AS part_id
      FROM events),
    o AS (
      SELECT part_id, rec_key,
             ROW_NUMBER() OVER (PARTITION BY part_id
                                ORDER BY (rec_key = 'p2'), event_id) - 1
               AS record_offset
      FROM r)
    SELECT part_id, rec_key,
           COUNT(*) AS n_records,
           CAST(MIN(record_offset) AS BIGINT) AS min_off,
           CAST(MAX(record_offset) AS BIGINT) AS max_off
    FROM o GROUP BY part_id, rec_key
    """,
    "Kafka AdminClient.createPartitions parity (catalog.create_partitions): "
    "a 2-partition topic takes an epoch of mod-2-routed records, grows to "
    "4 partitions, then takes a mod-4-routed epoch — pre-grow offsets are "
    "untouched, new partitions start at 0, and post-grow offsets continue "
    "contiguously from each partition's high-water mark; the oracle "
    "recomputes the full two-epoch (partition, offset) numbering",
)
def log_alter_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..log import LogStore

    wh = tempfile.mkdtemp(prefix="flux-grow-")
    store = LogStore(spark, wh)
    store.catalog.create_topic("grow", 2)
    e = load_table(spark, sf_dir, "events")
    phase1 = e.where(F.col("event_id") % 5 < 2).select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(2)).cast("int").alias("partition"),
        F.lit("p1").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    store.append("grow", phase1, ordering_col="seq")
    store.catalog.create_partitions("grow", 4)
    phase2 = e.where(F.col("event_id") % 5 >= 2).select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(4)).cast("int").alias("partition"),
        F.lit("p2").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    store.append("grow", phase2, ordering_col="seq")
    return (
        store.read("grow")
        .groupBy(F.col("partition").alias("part_id"), F.col("key").alias("rec_key"))
        .agg(
            F.count("*").alias("n_records"),
            F.min("offset").alias("min_off"),
            F.max("offset").alias("max_off"),
        )
    )


@register(
    LOG_QUERIES,
    "log_maintenance_pass",
    """
    WITH routed AS (
      SELECT
        CAST(event_id % 3 AS INTEGER) AS part_id,
        ROW_NUMBER() OVER (PARTITION BY event_id % 3
                           ORDER BY (event_id // 3) % 3, event_id) - 1
          AS record_offset,
        CAST(user_id AS VARCHAR) AS rec_key,
        CAST(event_id AS VARCHAR) AS rec_value
      FROM events
    )
    SELECT part_id, record_offset, rec_key, rec_value FROM routed
    """,
    "warehouse maintenance() housekeeping (the cron-job / Kafka LogCleaner "
    "entry point): the topic is ingested in three chunks so each partition "
    "holds several segment files, offsets are committed repeatedly, then "
    "one maintenance pass compacts both the topic and the _offsets log — "
    "and every record must read back at its exact (partition, offset) with "
    "key and value intact (the oracle is the full routed numbering, so any "
    "row lost, duplicated or re-offset by the rewrite fails rows+hash)",
)
def log_maintenance_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import OffsetStore
    from ..log import LogStore

    wh = tempfile.mkdtemp(prefix="flux-maint-")
    store = LogStore(spark, wh)
    store.catalog.create_topic("events", 3)
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(3)).cast("int").alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    # three appends -> >=3 segment files per partition, offsets contiguous
    # across the chunk boundaries (chunked by a deterministic mod rule)
    for chunk in range(3):
        store.append(
            "events",
            e.where(F.pmod(F.floor(F.col("seq") / 3), F.lit(3)) == chunk),
            ordering_col="seq",
        )
    ostore = OffsetStore(store)
    for i in range(4):
        ostore.commit("maint-gate", {("events", 0): i, ("events", 1): i})
    actions = store.maintenance(min_files_to_compact=2)
    # guard the scenario itself: the pass must actually have compacted
    # both the topic and the offsets log, or this gate proves nothing
    assert "compact" in actions.get("events", ""), actions
    assert "_offsets" in actions, actions
    return store.read("events").select(
        F.col("partition").alias("part_id"),
        F.col("offset").alias("record_offset"),
        F.col("key").alias("rec_key"),
        F.col("value").alias("rec_value"),
    )


@register(
    LOG_QUERIES,
    "log_rebalance_resume",
    """
    WITH routed AS (
      SELECT CAST(event_id % 6 AS INTEGER) AS part_id,
             ROW_NUMBER() OVER (PARTITION BY event_id % 6
                                ORDER BY event_id) - 1 AS record_offset
      FROM events),
    counts AS (SELECT part_id, CAST(COUNT(*) AS BIGINT) AS total
               FROM routed GROUP BY part_id),
    -- post-rebalance owners: sticky keeps m1 on {0,1} and m2 on {3,4},
    -- then the min-heap splits the departed m3's {2,5} by (load, member)
    owners(part_id, member) AS (
      VALUES (0, 'm1'), (1, 'm1'), (2, 'm1'),
             (3, 'm2'), (4, 'm2'), (5, 'm2'))
    SELECT o.member, c.part_id,
           CAST(LEAST(100, c.total) AS BIGINT) AS resumed_from,
           CAST(c.total - LEAST(100, c.total) AS BIGINT) AS n_consumed,
           CAST(c.total - 1 AS BIGINT) AS max_offset
    FROM counts c JOIN owners o USING (part_id)
    """,
    "end-to-end consumer-group lifecycle (the reference's core consumer "
    "story, FluxConsumer.java:52-133 + StickyAssignorTest.java): three "
    "members join/sync on a 6-partition topic under the sticky protocol "
    "(m1:[0,1] m2:[3,4] m3:[2,5]), each consumes 100 records/partition "
    "and commits; m3 leaves; the survivors' sticky rebalance keeps their "
    "own partitions and splits m3's; they resume FROM M3'S COMMITTED "
    "OFFSETS and drain — output is each survivor's per-partition resume "
    "point, consumed count, and final offset",
)
def log_rebalance_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import FluxConsumer
    from ..coordinator import GroupCoordinator
    from ..log import LogStore

    store = LogStore(spark, tempfile.mkdtemp(prefix="flux-rebal-"))
    store.catalog.create_topic("rb", 6)
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(6)).cast("int").alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    store.append("rb", e, ordering_col="seq")
    # oracle contract guard: the oracle emits a row for EVERY partition
    # (n_consumed = total - 100), but the engine side only produces rows
    # for partitions that still had records after phase 1 — so the fixture
    # must leave every partition with a non-empty tail (> 100 records)
    assert min(store.high_water_marks("rb").values()) > 100, (
        "fixture too small: every partition must hold > 100 records"
    )

    coord = GroupCoordinator()
    # session_timeout_s=300 (now also the coordinator default — r13 made
    # max.poll.interval.ms discipline the default after the old 9 s
    # evicted members whose Spark poll jobs outlived it on a loaded box);
    # kept explicit here so the gate doesn't drift with the default.
    # Liveness semantics are pinned by tests/test_consumer.py backdating.
    mk = lambda m: FluxConsumer(  # noqa: E731 - three identical members
        store, group_id="rebal-gate", coordinator=coord,
        protocols=("sticky",), member_id=m, session_timeout_s=300.0,
    )
    c1, c2, c3 = mk("m1"), mk("m2"), mk("m3")
    # join storm: each join bumps the generation; everyone re-syncs on
    # the final one (Kafka's rejoin-on-rebalance), landing the sticky
    # plan m1:[0,1] m2:[3,4] m3:[2,5]
    c1.subscribe(["rb"])
    c2.subscribe(["rb"])
    c3.subscribe(["rb"])
    a1, a2 = c1.subscribe(["rb"]), c2.subscribe(["rb"])
    assert a1 == {"rb": [0, 1]} and a2 == {"rb": [3, 4]}, (a1, a2)
    assert c3.assignment() == {"rb": [2, 5]}, c3.assignment()

    # phase 1: every member consumes up to 100/partition and commits
    for c in (c1, c2, c3):
        c.poll(max_records_per_partition=100)
        c.commit_offsets()

    # m3 leaves -> new generation; survivors rejoin: sticky keeps their
    # partitions and splits m3's {2,5} across them
    c3.unsubscribe()
    a1, a2 = c1.subscribe(["rb"]), c2.subscribe(["rb"])
    assert a1 == {"rb": [0, 1, 2]} and a2 == {"rb": [3, 4, 5]}, (a1, a2)

    # resume: positions install from the group's committed offsets —
    # including partition 2/5 commits written by the departed m3
    out = []
    for label, c in (("m1", c1), ("m2", c2)):
        recs = c.poll().records
        out.append(
            recs.groupBy(F.col("partition").alias("part_id"))
            .agg(
                F.min("offset").alias("resumed_from"),
                F.count("*").alias("n_consumed"),
                F.max("offset").alias("max_offset"),
            )
            .withColumn("member", F.lit(label))
        )
    return out[0].unionByName(out[1]).select(
        "member", "part_id", "resumed_from", "n_consumed", "max_offset"
    )


@register(
    LOG_QUERIES,
    "log_rebalance_cooperative",
    """
    WITH routed AS (
      SELECT CAST(event_id % 6 AS INTEGER) AS part_id,
             ROW_NUMBER() OVER (PARTITION BY event_id % 6
                                ORDER BY event_id) - 1 AS record_offset
      FROM events),
    counts AS (SELECT part_id, CAST(COUNT(*) AS BIGINT) AS total
               FROM routed GROUP BY part_id),
    -- survivors keep their own partitions SERVING (positions 150 = the
    -- committed 100 + 50 uncommitted, never rewound) and acquire the
    -- departed m3's {2,5} from m3's commits (100)
    owners(part_id, member, resume_base) AS (
      VALUES (0, 'm1', 150), (1, 'm1', 150), (2, 'm1', 100),
             (3, 'm2', 150), (4, 'm2', 150), (5, 'm2', 100))
    SELECT o.member, c.part_id,
           CAST(LEAST(o.resume_base, c.total) AS BIGINT) AS resumed_from,
           CAST(c.total - LEAST(o.resume_base, c.total) AS BIGINT) AS n_consumed,
           CAST(c.total - 1 AS BIGINT) AS max_offset
    FROM counts c JOIN owners o USING (part_id)
    """,
    "cooperative (incremental) rebalance lifecycle (VERDICT r6 #6, the "
    "KIP-429 variant of log_rebalance_resume): three cooperative-sticky "
    "members consume 100/partition and commit, then 50 more UNCOMMITTED; "
    "m3 leaves; the survivors' next poll() resyncs transparently — no "
    "RebalanceInProgressError round-trip — keeping their own partitions "
    "at their in-memory positions (resume 150: the uncommitted 50 are "
    "neither re-read nor paused) while m3's partitions install from m3's "
    "commits (resume 100, at-least-once). Eager semantics leaking in "
    "would rewind retained partitions to 100 and fail the value hash",
)
def log_rebalance_cooperative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import FluxConsumer
    from ..coordinator import GroupCoordinator
    from ..log import LogStore

    store = LogStore(spark, tempfile.mkdtemp(prefix="flux-corebal-"))
    store.catalog.create_topic("rbc", 6)
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(6)).cast("int").alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    store.append("rbc", e, ordering_col="seq")
    # the oracle's resume points assume every partition holds a tail past
    # the 150-record phase-1 window
    assert min(store.high_water_marks("rbc").values()) > 150, (
        "fixture too small: every partition must hold > 150 records"
    )

    coord = GroupCoordinator()
    mk = lambda m: FluxConsumer(  # noqa: E731 - three identical members
        store, group_id="corebal-gate", coordinator=coord,
        protocols=("sticky",), member_id=m, session_timeout_s=300.0,
        rebalance_protocol="cooperative",
    )
    c1, c2, c3 = mk("m1"), mk("m2"), mk("m3")
    c1.subscribe(["rbc"])
    c2.subscribe(["rbc"])
    c3.subscribe(["rbc"])
    assert c3.assignment() == {"rbc": [2, 5]}, c3.assignment()

    # phase 1: polls auto-resync the stale members (no exception, no
    # explicit re-subscribe — the cooperative difference), consume
    # 100/partition, commit, then 50 more UNCOMMITTED
    for c in (c1, c2, c3):
        c.poll(max_records_per_partition=100)
        c.commit_offsets()
        c.poll(max_records_per_partition=50)
    assert c1.assignment() == {"rbc": [0, 1]}, c1.assignment()
    assert c2.assignment() == {"rbc": [3, 4]}, c2.assignment()

    # m3 leaves; survivors just poll — the resync is transparent,
    # retained partitions resume at 150 (in-memory), acquired at 100
    c3.unsubscribe()
    out = []
    for label, c in (("m1", c1), ("m2", c2)):
        recs = c.poll().records
        out.append(
            recs.groupBy(F.col("partition").alias("part_id"))
            .agg(
                F.min("offset").alias("resumed_from"),
                F.count("*").alias("n_consumed"),
                F.max("offset").alias("max_offset"),
            )
            .withColumn("member", F.lit(label))
        )
    ev1, ev2 = c1.last_rebalance, c2.last_rebalance
    assert ev1.retained == [("rbc", 0), ("rbc", 1)], ev1
    assert ev1.added == [("rbc", 2)] and not ev1.lost_all, ev1
    assert ev2.retained == [("rbc", 3), ("rbc", 4)], ev2
    assert ev2.added == [("rbc", 5)], ev2
    return out[0].unionByName(out[1]).select(
        "member", "part_id", "resumed_from", "n_consumed", "max_offset"
    )


@register(
    LOG_QUERIES,
    "log_txn_exactly_once_pipeline",
    """
    WITH src AS (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS soff
      FROM events),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) // 2 AS BIGINT) AS n1 FROM src),
    recs AS (
      -- committed batch 1 at dst offsets [0, n1); the aborted attempt
      -- occupies [n1, n) invisibly; the committed retry lands at
      -- [n, n + (n - n1))
      SELECT 'record' AS kind, 0 AS part_id,
             CASE WHEN soff < t.n1 THEN soff
                  ELSE t.n + (soff - t.n1) END AS record_offset,
             CAST(user_id AS VARCHAR) AS rec_key,
             'etl:' || CAST(event_id AS VARCHAR) AS rec_value
      FROM src CROSS JOIN tot t)
    SELECT kind, CAST(part_id AS INT) AS part_id, record_offset,
           rec_key, rec_value
    FROM recs
    UNION ALL
    SELECT 'resume_after_abort', 0, n1, 'etl', CAST(n1 AS VARCHAR) FROM tot
    UNION ALL
    SELECT 'offset', 0, n, 'etl', CAST(n AS VARCHAR) FROM tot
    """,
    "EOS consume-transform-produce (Kafka sendOffsetsToTransaction): "
    "batch 1 commits records + input offsets atomically; the batch-2 "
    "attempt ABORTS after producing AND sending offsets — its records "
    "stay invisible to read_committed and the group's resume position "
    "stays at n1 (the 'resume_after_abort' row is read from the real "
    "offsets table); the retry re-reads from n1 and commits, so every "
    "source record appears EXACTLY once in dst (aborted ranges still "
    "burn offsets, hence the [n1, n) gap) and the final committed "
    "offset is n",
)
def log_txn_exactly_once_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..consumer import OffsetStore
    from ..log import LogStore

    wh = tempfile.mkdtemp(prefix="flux-eos-")
    store = LogStore(spark, wh)
    store.catalog.create_topic("src", 1)
    store.catalog.create_topic("dst", 1)
    e = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.lit(0).cast("int").alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    store.append("src", e, ordering_col="seq")
    n = store.read("src").count()
    n1 = n // 2

    def batch(lo, hi):
        return (
            store.read("src")
            .where((F.col("offset") >= lo) & (F.col("offset") < hi))
            .select(
                F.col("offset").alias("seq"),
                F.lit(0).cast("int").alias("partition"),
                "timestamp",
                "key",
                F.concat(F.lit("etl:"), F.col("value")).alias("value"),
            )
        )

    offsets = OffsetStore(store)
    s = store.init_transactions("etl")
    s.begin()
    s.send("dst", batch(0, n1), ordering_col="seq")
    s.send_offsets_to_transaction("etl", {("src", 0): n1})
    s.commit()

    resume = offsets.fetch("etl")[("src", 0)]  # n1 — batch 1 landed
    s.begin()
    s.send("dst", batch(resume, n), ordering_col="seq")
    s.send_offsets_to_transaction("etl", {("src", 0): n})
    s.abort()  # crash simulation: output AND progress must both vanish

    resume2 = offsets.fetch("etl")[("src", 0)]  # still n1, NOT n
    s.begin()
    s.send("dst", batch(resume2, n), ordering_col="seq")
    s.send_offsets_to_transaction("etl", {("src", 0): n})
    s.commit()
    final_off = offsets.fetch("etl")[("src", 0)]

    recs = store.read("dst", read_committed=True).select(
        F.lit("record").alias("kind"),
        F.col("partition").alias("part_id"),
        F.col("offset").alias("record_offset"),
        F.col("key").alias("rec_key"),
        F.col("value").alias("rec_value"),
    )
    marks = spark.createDataFrame(
        [
            ("resume_after_abort", 0, int(resume2), "etl", str(int(resume2))),
            ("offset", 0, int(final_off), "etl", str(int(final_off))),
        ],
        "kind string, part_id int, record_offset long, rec_key string, "
        "rec_value string",
    )
    return recs.unionByName(marks)
