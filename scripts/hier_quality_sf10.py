"""Hier-routing quality at a scale rung (VERDICT r12 #5).

The 2-probe two-level routing behind the auto-K lanes is recall-gated at
sf0.01 only (emb_hier_vote_recall: 125/125 agreement). This measures the
same quality signals AT THE SCALE THE LANES ACTUALLY RUN (sf10):

1. label-vote agreement + accuracy, hier-routed IVF vs exact brute vote
   (the emb_hier_vote_recall statistic, recomputed at sf10);
2. SemDeDup duplicate-set overlap, hierarchical vs flat assignment at
   the same derived auto-K (Jaccard of the flagged-dup id sets + cluster
   balance ratio Σ|c|² hier / flat — the quantity the pair stage pays).

Prints one JSON line for SCALE.md. Runtime dominated by the brute vote
leg (1000 queries x 150k labeled Arrow-scored pairs) and the flat n*K
assignment it exists to audit.

Usage: python scripts/hier_quality_sf10.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"

    from flux_spark.llm import queries as _llm_queries  # noqa: F401
    # imported first: the llm query modules resolve their intra-package
    # imports through llm.queries' registration order (direct import of
    # similarity_queries alone is circular)
    from flux_spark.llm import similarity
    from flux_spark.llm.similarity_queries import (
        LLM_QUERIES,
        _aug_embeddings,
    )
    from flux_spark.session import get_spark

    spark = get_spark(
        "hier-quality",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = {"sf_dir": sf_dir}

    t0 = time.monotonic()
    row = LLM_QUERIES["emb_hier_vote_recall"].fn(spark, sf_dir).collect()[0]
    out["vote"] = {
        "n_queries": row["n_queries"],
        "n_agree": row["n_agree"],
        "agree_rate": row["agree_rate"],
        "n_correct_ivf": row["n_correct_ivf"],
        "n_correct_brute": row["n_correct_brute"],
        "sec": round(time.monotonic() - t0, 1),
    }
    print("vote (hier IVF vs brute):", out["vote"], flush=True)

    # hier-vs-FLAT control (the isolating comparison): both sides are IVF
    # at the same k/nprobe, so any disagreement here is attributable to
    # the 2-branch hierarchical ROUTING of the assignment stage alone —
    # the hier-vs-brute number above additionally folds in plain IVF
    # nprobe truncation, which flat pays identically.
    from flux_spark.analytics.registry import load_table as _lt

    e = _lt(spark, sf_dir, "embeddings")
    labeled = e.where(F.col("vec_id") % 4 != 0)
    unlabeled = e.where((F.col("vec_id") % 4 == 0) & (F.col("vec_id") < 4000))
    k_c = similarity.auto_centroids(labeled.count(), target_cluster=256)
    cents = e.where(F.col("vec_id") < k_c).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    t0 = time.monotonic()
    preds = {}
    for mode, hier in (("hier", True), ("flat", False)):
        preds[mode] = (
            similarity.knn_label_vote_ivf(
                labeled, unlabeled, cents, k=5, nprobe=2, hierarchical=hier
            )
            .select("query_id", F.col("predicted_label").alias(mode))
            .localCheckpoint()
        )
    both = preds["hier"].join(preds["flat"], "query_id")
    agg = both.agg(
        F.count("*").alias("n"),
        F.sum((F.col("hier") == F.col("flat")).cast("long")).alias("same"),
    ).collect()[0]
    out["vote_hier_vs_flat"] = {
        "n_queries": agg["n"],
        "n_agree": agg["same"],
        "agree_rate": agg["same"] / agg["n"] if agg["n"] else None,
        "sec": round(time.monotonic() - t0, 1),
    }
    print("vote (hier vs flat IVF):", out["vote_hier_vs_flat"], flush=True)

    corpus = _aug_embeddings(spark, sf_dir).localCheckpoint()
    n = corpus.count()
    k = similarity.auto_centroids(n, target_cluster=256)
    from flux_spark.analytics.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    centroids = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    dup_sets = {}
    balance = {}
    for mode, hier in (("hier", True), ("flat", False)):
        t0 = time.monotonic()
        res = similarity.semantic_dedup(
            corpus,
            centroids,
            vec_col="v",
            id_col="vec_id",
            threshold=0.98,
            hierarchical=hier,
        ).localCheckpoint()
        dups = {
            r["vec_id"]
            for r in res.where(~F.col("is_kept")).select("vec_id").collect()
        }
        ssq = (
            res.groupBy("cluster_id")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .collect()[0][0]
        )
        dup_sets[mode] = dups
        balance[mode] = int(ssq)
        out[f"dedup_{mode}"] = {
            "n_dups": len(dups),
            "sum_sq_cluster": int(ssq),
            "sec": round(time.monotonic() - t0, 1),
        }
        print(f"dedup_{mode}:", out[f"dedup_{mode}"], flush=True)

    inter = len(dup_sets["hier"] & dup_sets["flat"])
    union = len(dup_sets["hier"] | dup_sets["flat"])
    out["dedup_overlap"] = {
        "n_corpus": n,
        "k": k,
        "intersection": inter,
        "union": union,
        "jaccard": (inter / union) if union else None,
        "balance_ratio_hier_over_flat": balance["hier"] / balance["flat"],
    }
    print("overlap:", out["dedup_overlap"], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
