"""Scale ladder for LogStore.maintenance — the housekeeping pass
(retention + small-file compaction + offsets compaction) measured on an
sf30-sized topic: 30M records spread over many small files, exactly the
listing + rewrite-amplification shape that degrades first on a huge
warehouse (VERDICT r10 #5).

Builds the topic with N appends of B rows each (every append lands >= 1
file per partition, so files ~= N * partitions), commits a consumer
offset per append batch (so the offsets log accrues small files too),
then times one maintenance() pass and a full-topic read before/after.

Usage: python scripts/maint_ladder.py [n_appends] [rows_per_append] [partitions]
       python scripts/maint_ladder.py            # 100 x 300k x 8 = 30M
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_appends = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flux_spark.consumer import OffsetStore
    from flux_spark.log import LogStore
    from flux_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "maint-ladder",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    warehouse = tempfile.mkdtemp(prefix="flux-maint-ladder-")
    try:
        store = LogStore(spark, warehouse)
        store.catalog.create_topic("big", parts)
        offsets = OffsetStore(store)

        t0 = time.time()
        for b in range(n_appends):
            df = spark.range(b * rows, (b + 1) * rows).select(
                F.col("id").alias("seq"),
                F.col("id").cast("string").alias("value"),
            )
            store.append("big", df, ordering_col="seq")
            # one committed offset per batch: the offsets log accrues a
            # small file per commit, the shape OffsetStore.compact exists for
            offsets.commit(
                "ladder-group", {("big", p): (b + 1) for p in range(parts)}
            )
        ingest_s = time.time() - t0

        def n_files() -> int:
            return len(
                glob.glob(os.path.join(warehouse, "big", "**", "*.parquet"),
                          recursive=True)
            )

        files_before = n_files()
        t0 = time.time()
        total_before = store.read("big").count()
        read_before_s = time.time() - t0

        t0 = time.time()
        actions = store.maintenance(min_files_to_compact=16)
        maint_s = time.time() - t0
        files_after = n_files()

        t0 = time.time()
        total_after = store.read("big").count()
        read_after_s = time.time() - t0
        assert total_after == total_before == n_appends * rows, (
            total_before,
            total_after,
        )

        print(
            f"ingest: {n_appends} appends x {rows} rows x {parts} partitions "
            f"= {total_before} records in {ingest_s:.0f}s"
        )
        print(f"files: {files_before} -> {files_after}")
        print(f"maintenance: {maint_s:.1f}s  actions={actions}")
        print(
            f"full read: {read_before_s:.1f}s before -> {read_after_s:.1f}s "
            f"after compaction (records identical: {total_after})"
        )
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
