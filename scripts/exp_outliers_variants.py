"""Same-session A/B of emb_knn_distance_outliers score-stage variants
(VERDICT r12 #1). Each variant runs the FULL lane (count -> sig ->
occupancy -> cap -> score -> kth -> global rank) and prints wall + a
value checksum; checksums must be identical across variants.

V0 base   : r12 shape (query-side sig recompute, 3-fold cosine, window)
V1 reuse  : query probes from the checkpointed signature frame (mask
            explode), cosine still 3 interpreted folds
V2 norms  : V1 + per-vector norms precomputed on both sides (1 fold/pair)
V3 codegen: V2 + the remaining dot unrolled to a left-fold chain of
            element_at products (whole-stage codegen, no interpreter)
V4 aggkth : V3 + kth via sort_array(collect_list(...))[k] aggregate
            instead of the per-query rank window

Usage: python scripts/exp_outliers_variants.py [sf_dir] [variants csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 10


def dot_unrolled(a, b, dim=64):
    """((0.0 + a1*b1) + a2*b2) + ... — the exact left-fold association of
    similarity.dot, as a codegen-able expression chain."""
    acc = F.lit(0.0)
    for j in range(1, dim + 1):
        acc = acc + F.element_at(a, j).cast("double") * F.element_at(
            b, j
        ).cast("double")
    return acc


def run(spark, sf_dir, variant):
    from flux_spark.analytics.operators import attach_global_order
    from flux_spark.analytics.registry import load_table
    from flux_spark.llm import similarity

    e = load_table(spark, sf_dir, "embeddings")
    t_start = time.monotonic()
    n = e.count()
    n_planes = similarity.auto_planes(n, target_bucket=16)
    planes = similarity.hyperplanes(n_planes, 64)

    base_cols = [
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        similarity.signature_bits(F.col("embedding"), planes).alias("__sig"),
    ]
    if variant in ("norms", "codegen", "aggkth"):
        base_cols.append(similarity.norm(F.col("embedding")).alias("__cnorm"))
    sigs = e.select(*base_cols).localCheckpoint()
    c = sigs
    p99, max_occ = similarity.occupancy_stats(c.groupBy("__sig").count())
    cap = max(4 * K, min(p99, 4 * 16))
    if max_occ > cap:
        wcap = Window.partitionBy("__sig").orderBy(
            F.md5(F.col("neighbor_id").cast("string")).asc(),
            F.col("neighbor_id").asc(),
        )
        c = (
            c.withColumn("__slot", F.row_number().over(wcap))
            .where(F.col("__slot") <= int(cap))
            .drop("__slot")
        )

    if variant == "base":
        qsig = similarity.signature_bits(F.col("embedding"), planes)
        probe_arr = [qsig] + [
            qsig.bitwiseXOR(F.lit(2**i)) for i in range(n_planes)
        ]
        q = e.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            F.explode(F.array(*probe_arr)).alias("__sig"),
        )
    else:
        qcols = [
            F.col("neighbor_id").alias("query_id"),
            F.col("__cv").alias("__qv"),
            F.col("__sig").alias("__qsig"),
        ]
        if variant in ("norms", "codegen", "aggkth"):
            qcols.append(F.col("__cnorm").alias("__qnorm"))
        masks = F.array(F.lit(0), *[F.lit(2**i) for i in range(n_planes)])
        keep = ["query_id", "__qv"] + (
            ["__qnorm"] if variant != "reuse" else []
        )
        q = (
            sigs.select(*qcols)
            .select("*", F.explode(masks).alias("__mask"))
            .select(
                *keep,
                F.col("__qsig").bitwiseXOR(F.col("__mask")).alias("__sig"),
            )
        )

    joined = q.join(c, "__sig").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    if variant in ("base", "reuse"):
        scored = joined.withColumn(
            "cos_sim", similarity.cosine(F.col("__qv"), F.col("__cv"))
        )
    elif variant in ("norms", "aggkth"):
        scored = joined.withColumn(
            "cos_sim",
            similarity.dot(F.col("__qv"), F.col("__cv"))
            / (F.col("__qnorm") * F.col("__cnorm")),
        )
    else:
        scored = joined.withColumn(
            "cos_sim",
            dot_unrolled(F.col("__qv"), F.col("__cv"))
            / (F.col("__qnorm") * F.col("__cnorm")),
        )
    scored = scored.select("query_id", "neighbor_id", "cos_sim")

    if variant == "aggkth":
        kth_rows = (
            scored.groupBy("query_id")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("cos_sim"), (-F.col("neighbor_id")).alias("__nn")
                        )
                    ),
                    asc=False,
                ).alias("__cands")
            )
            .where(F.size("__cands") >= K)
            .select(
                F.col("query_id").alias("vec_id"),
                F.element_at("__cands", K)["cos_sim"].alias("kth_cos_sim"),
            )
        )
    else:
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        kth_rows = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") == K)
            .select(
                F.col("query_id").alias("vec_id"),
                F.col("cos_sim").alias("kth_cos_sim"),
            )
        )

    kth = e.select("vec_id").join(kth_rows, "vec_id", "left").select(
        "vec_id",
        F.coalesce("kth_cos_sim", F.lit(-1.0)).alias("kth_cos_sim"),
    )
    flagged = attach_global_order(
        kth,
        [F.col("kth_cos_sim").asc(), F.col("vec_id").asc()],
        row_alias="r",
        total_alias="n",
    )
    out = flagged.select(
        "vec_id",
        "kth_cos_sim",
        (
            F.col("r")
            <= F.ceil(F.lit(0.05) * F.col("n").cast("double")).cast("bigint")
        ).alias("is_outlier"),
    )
    cs = out.agg(
        F.sum(F.hash("vec_id", "kth_cos_sim", "is_outlier").cast("bigint"))
    ).collect()[0][0]
    wall = time.monotonic() - t_start
    print(f"[{variant}] wall={wall:.1f}s checksum={cs}", flush=True)
    return cs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    variants = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["base", "reuse", "norms", "codegen", "aggkth"]
    )
    from flux_spark.session import get_spark

    spark = get_spark(
        "exp-outliers",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    sums = [run(spark, sf_dir, v) for v in variants]
    assert len(set(sums)) == 1, f"checksum mismatch: {dict(zip(variants, sums))}"
    print("all checksums equal")
    spark.stop()


if __name__ == "__main__":
    main()
