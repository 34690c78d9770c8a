"""Streaming ladder rung on a real topic log (VERDICT r12 #6).

The RocksDB + changelog soak (tests/test_streaming.py) proves restart
recovery at 1M synthetic keys on local[4]. This drives the SAME stateful
operator the registry gates (``stateful_running_totals``, the
applyInPandasWithState custom operator behind ``stream_stateful_totals``)
over a REAL topic log at a ladder rung: sf10 events produced through the
engine's append path into a partitioned topic, drained incrementally with
``maxFilesPerTrigger`` under RocksDB + changelog checkpointing, STOPPED
mid-drain, and restarted from the checkpoint to finish.

Measures (one JSON line for SCALE.md):
  * produce leg: rows + wall (the engine append of the events table);
  * drain throughput: input rows / sum of batch wall across both legs;
  * state rows: stateOperators numRowsTotal at the final batch
    (= distinct user keys resident in RocksDB);
  * commit time: median/max stateOperators commitTimeMs per batch —
    the quantity changelog checkpointing bounds (delta-only commits);
  * stop + recover: wall for the mid-drain quiesced stop, and wall from
    restart ``start()`` to the first recovered batch completing (RocksDB
    replays base snapshot + changelogs for every partition's store).

Correctness: the merged update-mode emissions (latest per key across all
batches of BOTH legs) must equal the independent DuckDB aggregate over
the source parquet bit-for-bit — same discipline as the
``stream_stateful_totals`` oracle (integer sums below 2^53, so the
Arrow-batch float64 accumulation is order-independent and exact).

Usage: python scripts/stream_ladder_sf10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

N_TOPIC_PARTITIONS = 8
FILES_PER_TRIGGER = 8  # one file per topic partition per microbatch
# overridable so the script smoke-tests at sf0.1 with multiple batches
RECORDS_PER_FILE = int(os.environ.get("FLUX_LADDER_RPF", 250_000))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"

    from flux_spark.log import LogStore
    from flux_spark.session import get_spark
    from flux_spark.streaming import (
        _stop_quiesced,
        stateful_running_totals,
        stream_topic,
        use_rocksdb_state_store,
    )

    spark = get_spark(
        "stream-ladder",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = {"sf_dir": sf_dir}

    # ---- produce leg: events -> 8-partition topic through the engine ----
    wh = tempfile.mkdtemp(prefix="flux-ladder-")
    store = LogStore(spark, wh, max_records_per_file=RECORDS_PER_FILE)
    store.catalog.create_topic("events", N_TOPIC_PARTITIONS)
    src = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    e = src.select(
        F.col("event_id").alias("seq"),
        F.pmod(F.col("event_id"), F.lit(N_TOPIC_PARTITIONS))
        .cast("int")
        .alias("partition"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    t0 = time.monotonic()
    store.append("events", e, ordering_col="seq")
    produce_s = time.monotonic() - t0
    n_rows = sum(store.high_water_marks("events").values())
    out["produce"] = {
        "rows": n_rows,
        "sec": round(produce_s, 1),
        "rec_per_s": int(n_rows / produce_s),
    }
    print("produce:", out["produce"], flush=True)

    # ---- stateful drain under RocksDB + changelog, stop mid-way ----
    use_rocksdb_state_store(spark, changelog_checkpointing=True)
    ckpt = tempfile.mkdtemp(prefix="flux-ladder-ckpt-")
    totals: dict[str, tuple[float, int]] = {}

    def sink(df, _bid):
        for r in df.collect():
            totals[r["key"]] = (r["total"], r["n"])

    def start_drain():
        rec = stream_topic(
            store, "events", max_files_per_trigger=FILES_PER_TRIGGER
        )
        return (
            stateful_running_totals(rec, state_timeout_ms=3600 * 1000)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="500 milliseconds")
            .start()
        )

    def data_batches(q):
        return [p for p in q.recentProgress if p["numInputRows"] > 0]

    try:
        # leg 1: run ~half the microbatches, then a quiesced stop
        q = start_drain()
        n_files = -(-n_rows // RECORDS_PER_FILE)
        n_batches_total = -(-n_files // FILES_PER_TRIGGER)
        target = max(1, n_batches_total // 2)
        deadline = time.monotonic() + 1200
        while time.monotonic() < deadline:
            if len(data_batches(q)) >= target:
                break
            time.sleep(0.25)
        t0 = time.monotonic()
        _stop_quiesced(q)
        stop_s = time.monotonic() - t0
        # snapshot AFTER the stop: batches that complete during the
        # quiesce settle window belong to leg 1's input accounting
        leg1 = data_batches(q)

        # leg 2: restart from the checkpoint, drain the rest
        t0 = time.monotonic()
        q = start_drain()
        recover_s = None
        deadline = time.monotonic() + 1200
        while time.monotonic() < deadline:
            done = q.recentProgress
            if recover_s is None and done:
                recover_s = time.monotonic() - t0
            if len(done) >= 2 and all(
                p["numInputRows"] == 0 for p in done[-2:]
            ):
                break
            time.sleep(0.25)
        leg2 = data_batches(q)
        final = (leg2 or leg1)[-1]
        _stop_quiesced(q)
    finally:
        use_rocksdb_state_store(spark, enabled=False)

    batches = leg1 + leg2
    input_rows = sum(p["numInputRows"] for p in batches)
    batch_wall_s = sum(p["batchDuration"] for p in batches) / 1000.0
    commits = [
        so["commitTimeMs"]
        for p in batches
        for so in p.get("stateOperators", [])
        if so.get("commitTimeMs") is not None
    ]
    out["drain"] = {
        "batches_leg1": len(leg1),
        "batches_leg2": len(leg2),
        "input_rows": input_rows,
        "batch_wall_s": round(batch_wall_s, 1),
        "rows_per_s": int(input_rows / batch_wall_s),
        "state_rows": final["stateOperators"][0]["numRowsTotal"],
        "commit_ms_median": statistics.median(commits) if commits else None,
        "commit_ms_max": max(commits) if commits else None,
        "stop_s": round(stop_s, 2),
        "recover_s": round(recover_s, 2) if recover_s else None,
    }
    print("drain:", out["drain"], flush=True)
    # at-least-once across the restart: the last uncommitted leg-1 batch
    # may replay in leg 2, so input can exceed the log size, never trail it
    assert input_rows >= n_rows, (input_rows, n_rows)
    out["drain"]["replayed_rows"] = input_rows - n_rows

    # ---- bit-equal vs the independent DuckDB oracle ----
    con = duckdb.connect()
    oracle = {
        k: (t, n)
        for k, t, n in con.execute(
            f"""
            SELECT CAST(user_id AS VARCHAR) AS key,
                   CAST(SUM(event_id) AS DOUBLE) AS total,
                   COUNT(*) AS n
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1
            """
        ).fetchall()
    }
    assert len(totals) == len(oracle), (len(totals), len(oracle))
    mismatch = [
        k for k in oracle if totals.get(k) != (oracle[k][0], oracle[k][1])
    ]
    assert not mismatch, mismatch[:5]
    out["oracle"] = {"keys": len(oracle), "bit_equal": True}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
