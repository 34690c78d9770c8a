"""Audit every bench-headline query: warm noop-sink seconds (min of N)
plus plan-shape stats (Exchanges, parquet scans, Python nodes, join
strategies) from the formatted physical plan. Output: one TSV line per
query for the r13 checklist."""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import __spark_entry__ as entry
    import bench

    from flux_spark.session import get_spark

    spark = get_spark(
        "audit-headline",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry.queries()
    names = [n for n in bench.ANALYTICS_HEADLINE if only is None or n in only]
    print("name\tbest_s\texchanges\tscans\tpy_nodes\tjoins")
    best: dict[str, float] = {}
    plans: dict[str, str] = {}
    for r in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"audit: {name}")
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, 1e9), dt)
            if r == 0:
                plans[name] = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    for name in names:
        p = plans[name]
        ex = len(re.findall(r"\(\d+\) Exchange", p))
        sc = len(re.findall(r"\(\d+\) Scan parquet", p))
        py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", p)
        )
        joins = ",".join(
            sorted(
                {
                    m
                    for m in re.findall(
                        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
                        p,
                    )
                }
            )
        )
        print(f"{name}\t{best[name]:.2f}\t{ex}\t{sc}\t{py}\t{joins}")
    spark.stop()


if __name__ == "__main__":
    main()
