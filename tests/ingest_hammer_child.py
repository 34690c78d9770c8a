"""Child process for the multi-driver ingest stress test.

Launched N times concurrently by ``test_log.py::
test_multiprocess_ingest_hammer`` against ONE shared warehouse — each
invocation is a genuinely separate driver process (own JVM, own catalog
object, own locks), so the only thing serializing appends is the
per-topic flock (`log.py` C6). Appends ``n_batches`` batches whose values
encode (producer, batch, row) so the parent can assert exactly-once
delivery and per-partition offset contiguity under contention.

Usage: python ingest_hammer_child.py <warehouse> <child_id> <n_batches> <rows>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    warehouse, child_id, n_batches, rows = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "1g")
    from flux_spark.log import LogStore
    from flux_spark.session import get_spark

    spark = get_spark(
        app_name=f"hammer-{child_id}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    store = LogStore(spark, warehouse)
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(r, f"p{child_id}-b{b}-r{r}") for r in range(rows)],
            "seq long, value string",
        )
        store.append("hammer", df, ordering_col="seq")
    spark.stop()
    print(f"child {child_id} done: {n_batches} batches x {rows} rows")


if __name__ == "__main__":
    main()
