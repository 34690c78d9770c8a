"""Stage breakdown of emb_knn_distance_outliers (VERDICT r12 #1).

Replays the lane's exact plan piecewise with an action per stage so the
740 s sf100 wall entry decomposes into: corpus signature build+checkpoint,
occupancy aggregate, cap window, probe/score/rank (the bucket join), and
the two-pass global rank. Recompute between stages is bounded because the
signature frame is localCheckpointed exactly as in the lane.

Usage: python scripts/profile_outliers.py [sf_dir] [--variant base|fused]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    variant = sys.argv[2] if len(sys.argv) > 2 else "base"

    from flux_spark.analytics.registry import load_table
    from flux_spark.llm import similarity
    from flux_spark.session import get_spark

    spark = get_spark(
        "profile-outliers",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    e = load_table(spark, sf_dir, "embeddings")

    K = 10
    t0 = time.monotonic()
    n = e.count()
    print(f"[count] n={n} {time.monotonic()-t0:.1f}s", flush=True)

    n_planes = similarity.auto_planes(n, target_bucket=16)
    planes = similarity.hyperplanes(n_planes, 64)
    print(f"planes={n_planes}")

    t0 = time.monotonic()
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("__cv"),
        similarity.signature_bits(F.col("embedding"), planes).alias("__sig"),
    ).localCheckpoint()
    sigs = c  # pre-cap signatures: the query side must cover ALL vectors
    print(f"[sig+checkpoint] {time.monotonic()-t0:.1f}s", flush=True)

    t0 = time.monotonic()
    p99, max_occ = similarity.occupancy_stats(c.groupBy("__sig").count())
    cap = max(4 * K, min(p99, 4 * 16))
    engaged = max_occ > cap
    print(
        f"[occupancy] p99={p99} max={max_occ} cap={cap} engaged={engaged} "
        f"{time.monotonic()-t0:.1f}s",
        flush=True,
    )

    if engaged:
        from pyspark.sql import Window

        wcap = Window.partitionBy("__sig").orderBy(
            F.md5(F.col("neighbor_id").cast("string")).asc(),
            F.col("neighbor_id").asc(),
        )
        t0 = time.monotonic()
        c = (
            c.withColumn("__slot", F.row_number().over(wcap))
            .where(F.col("__slot") <= int(cap))
            .drop("__slot")
            .localCheckpoint()
        )
        print(f"[cap window] kept={c.count()} {time.monotonic()-t0:.1f}s", flush=True)

    # query side
    t0 = time.monotonic()
    if variant == "fused":
        # reuse the checkpointed signatures for the query side (self-ANN:
        # queries == corpus) + mask-explode so the per-row signature is
        # computed zero extra times
        masks = F.array(
            F.lit(0), *[F.lit(2**i) for i in range(n_planes)]
        )
        q = (
            sigs.select(
                F.col("neighbor_id").alias("query_id"),
                F.col("__cv").alias("__qv"),
                F.col("__sig").alias("__qsig"),
            )
            .select(
                "query_id",
                "__qv",
                F.explode(masks).alias("__mask"),
                "__qsig",
            )
            .select(
                "query_id",
                "__qv",
                F.col("__qsig").bitwiseXOR(F.col("__mask")).alias("__sig"),
            )
        )
    else:
        qsig = similarity.signature_bits(F.col("embedding"), planes)
        probe_arr = [qsig] + [
            qsig.bitwiseXOR(F.lit(2**i)) for i in range(n_planes)
        ]
        q = e.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            F.explode(F.array(*probe_arr)).alias("__sig"),
        )
    nq = q.count()
    print(f"[probe expand] rows={nq} {time.monotonic()-t0:.1f}s", flush=True)

    from pyspark.sql import Window

    t0 = time.monotonic()
    scored = (
        q.join(c, "__sig")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", similarity.cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    kth = (
        e.select("vec_id")
        .join(
            topk.where(F.col("rank") == K).select(
                F.col("query_id").alias("vec_id"),
                F.col("cos_sim").alias("kth_cos_sim"),
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("kth_cos_sim", F.lit(-1.0)).alias("kth_cos_sim"),
        )
        .localCheckpoint()
    )
    print(f"[score+rank+kth] rows={kth.count()} {time.monotonic()-t0:.1f}s", flush=True)

    from flux_spark.analytics.operators import attach_global_order

    t0 = time.monotonic()
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
    n_out = out.where(F.col("is_outlier")).count()
    print(f"[global rank] outliers={n_out} {time.monotonic()-t0:.1f}s", flush=True)
    cs = out.agg(
        F.sum(F.hash("vec_id", "kth_cos_sim", "is_outlier").cast("bigint"))
    ).collect()[0][0]
    print(f"[checksum] {cs}")
    spark.stop()


if __name__ == "__main__":
    main()
