#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a full count() so the measured time includes the
entire plan (scan -> shuffle -> agg), not just plan construction. The first
query absorbs JVM/session warmup; a tiny warmup count runs first so the
headline numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: log-engine roundtrip + scan-heavy agg + multi-join + windows
# + LLM-pipeline ops. Names must exist in __spark_entry__.queries().
HEADLINE = [
    "log_ingest_roundtrip",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "events_hourly",
    "events_sessionize",
    "doc_dedup_minhash_lsh",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    from flux_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="flux-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    registry = entry_mod.queries()
    names = [n for n in HEADLINE if n in registry]

    # warmup: touch the fact table so JVM/codegen startup isn't billed
    # to the first headline query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry[name](spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
