"""Execute every registry query at a given SF dir (no oracle compare).

The crash-free-at-scale evidence: `tests/oracle_check.py` grades
correctness at sf0.01; this runs the SAME plans against a scaled dir
(.data/sf1, .data/sf3, ...) through the honest noop-sink write (all
result columns materialized, same forcing as bench.py) and reports
per-query wall time. Failures don't stop the sweep — they're the
point of running it.

Usage: python scripts/execute_sweep.py [sf_dir] [only...]
       SPARK_GRAFT_CPUS=32 python scripts/execute_sweep.py .data/sf1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".data/sf1"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from flux_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "execute-sweep",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    names = sorted(n for n in qs if not only or n in only)
    ok, failed = 0, []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ok += 1
            print(f"PASS {name}: {time.time() - t0:.2f}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(name)
            msg = str(exc).splitlines()[0][:200]
            print(f"FAIL {name}: {msg}", flush=True)
    print(
        f"\n{ok}/{len(names)} executed clean at {sf_dir} "
        f"in {time.time() - t_all:.0f}s; failures: {failed}"
    )


if __name__ == "__main__":
    main()
