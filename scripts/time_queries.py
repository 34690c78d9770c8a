"""Time registry queries at a given sf_dir in ONE session (A/B helper).

Usage: python scripts/time_queries.py <sf_dir> <name[,name...]> [repeat]
Runs each named __spark_entry__ query to completion (count + value
checksum on hashable columns) and prints per-run wall seconds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import __spark_entry__ as entry
    from flux_spark.session import get_spark

    spark = get_spark(
        "time-queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    for r in range(repeat):
        for name in names:
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            n = df.count()
            print(
                f"[{name}] run={r} rows={n} wall={time.monotonic()-t0:.1f}s",
                flush=True,
            )
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
