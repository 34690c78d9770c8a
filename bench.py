#!/usr/bin/env python
"""Benchmark harness (BASELINE.md plan): at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], measure

1. ingest throughput — events table produced into a 3-partition topic log
   through the full routing/offset/commit path (reference floor: ~2.5k
   rec/s, optimistic reading ~22.6k rec/s, ProducerBenchmark.java:65-72);
2. consume throughput — poll-everything round-trip via the offset-bounded
   reader (reference published none, ConsumerBenchmark.java:15-19);
3. analytics + LLM-pipeline headline queries (the layer the reference
   lacks; correctness gated by the DuckDB oracle at sf0.01).

Prints ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(name -> sec), "sf"} plus a supplementary "records_per_s" map for the
throughput items. Each query is forced with count() so timings cover the
full plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ANALYTICS_HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q9_product_profit",
    "q21_sole_returned_supplier",
    "events_hourly",
    "events_sessionize",
    "events_asof_purchase",
    "events_salted_user_stats",
    "doc_dedup_minhash_lsh",
    "doc_simhash",
    "ann_cosine_topk",
    "emb_near_dup_lsh",
    "events_funnel",
    "events_hll_registers",
    "orders_market_basket",
    "doc_ngram_repetition",
    "doc_contamination",
    "ann_cosine_lsh",
    "events_kmv_sketch",
    "events_rolling_1h",
    "doc_pii_scrub",
    "parts_triangles",
    "orders_bucketed_join",
    "doc_bigram_score",
    "events_bloom_filtered_join",
    # round-3 additions
    "doc_filter_report",
    "doc_unigram_oov",
    "doc_curation_pipeline",
    "emb_pq_codes",
    "emb_pq_adc_topk",
    "emb_ivf_recall",
    # round-4 additions
    "emb_semantic_dedup",
    "doc_perplexity_buckets",
    "events_grouping_sets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    import __spark_entry__ as entry_mod

    from pyspark.sql import functions as F

    from flux_spark import FluxConsumer, LogStore
    from flux_spark.analytics.registry import load_table
    from flux_spark.session import get_spark

    spark = get_spark(
        app_name="flux-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Spark job latency on a shared box is jittery; best-of-N absorbs it
    # (same spirit as the reference's JMH warmup+iterations,
    # ProducerBenchmark.java:14-16). Override with SPARK_GRAFT_BENCH_ROUNDS.
    rounds = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "2")))

    timings: dict[str, float] = {}
    rates: dict[str, float] = {}

    # -- 1. ingest: events -> 3-partition topic through the produce path --
    events = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("key"),
        F.col("event_id").cast("string").alias("value"),
    )
    n_events = events.count()  # warms the JVM + caches file listing
    store = LogStore(spark, tempfile.mkdtemp(prefix="flux-bench-"))
    best = None
    for r in range(rounds):
        topic = f"events_r{r}"
        store.catalog.create_topic(topic, 3)
        t0 = time.perf_counter()
        store.append(topic, events, ordering_col="seq")
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    timings["ingest_events"] = round(best, 4)
    rates["ingest_events"] = round(n_events / best)

    # -- 2. consume: poll everything back (offset-bounded scan) -----------
    best = None
    for r in range(rounds):
        consumer = FluxConsumer(store, group_id=f"bench{r}")
        consumer.assign({"events_r0": [0, 1, 2]})
        t0 = time.perf_counter()
        got = consumer.poll().records.count()
        dt = time.perf_counter() - t0
        assert got == n_events, (got, n_events)
        best = dt if best is None else min(best, dt)
    timings["consume_events"] = round(best, 4)
    rates["consume_events"] = round(n_events / best)

    # -- 3. analytics + LLM headline --------------------------------------
    registry = entry_mod.queries()
    for name in ANALYTICS_HEADLINE:
        if name not in registry:
            continue
        best = None
        for _ in range(rounds):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "ingest_consume_and_headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "records_per_s": rates,
                "n_events": n_events,
            }
        )
    )


if __name__ == "__main__":
    main()
