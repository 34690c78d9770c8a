"""Time registry queries with the bench's noop-sink methodology (§1.4).

Usage: python scripts/time_noop.py <sf_dir> <name[,name...]> [repeat]
Each run re-builds the query DataFrame (auto-derivation included, like
bench.py) and forces it with write.format("noop") so every result column
is materialized through the full plan; prints per-run wall seconds.
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
        "time-noop",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    for r in range(repeat):
        for name in names:
            spark.sparkContext.setJobDescription(f"time_noop: {name}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            print(
                f"[{name}] run={r} wall={time.monotonic()-t0:.2f}s",
                flush=True,
            )
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
