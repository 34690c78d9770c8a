"""Same-session A/B for the r13 emb_top2_components fusion (VERDICT r12
#3): OLD r12 shape (per-component posexplode + 64-group aggregate per
pass, second corpus scan + second full-width residual cache for u2) vs
NEW library shape (one cached projection, scalar 64-sum passes, residual
folded into u2's aggregate). Checksums must match bit-exactly.

Usage: python scripts/exp_top2_ab.py [sf_dir] [order csv e.g. old,new,old]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DIM = 64
ITERS = 4


def old_top_component(df, vec_col):
    proj = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__xd")
    ).persist()
    try:
        v = [1.0] * DIM
        last = None
        for _ in range(ITERS):
            varr = F.array(*[F.lit(float(x)) for x in v])
            s = F.aggregate(
                F.zip_with(F.col("__xd"), varr, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            contrib = F.transform(
                F.col("__xd"),
                lambda x: F.floor(x * s * F.lit(1e6)).cast("long"),
            )
            sums = (
                proj.select(F.posexplode(contrib).alias("dim_idx", "__q"))
                .groupBy("dim_idx")
                .agg(F.sum("__q").cast("bigint").alias("__sq"))
                .collect()
            )
            last = {int(r["dim_idx"]): int(r["__sq"]) for r in sums}
            m = max(abs(x) for x in last.values())
            v = [last[j] / m if m else 0.0 for j in range(DIM)]
    finally:
        proj.unpersist()
    return last, v


def old_top2(spark, df):
    from flux_spark.llm.similarity import remove_top_component

    last1, u1 = old_top_component(df, "embedding")
    res = remove_top_component(df, u1, vec_col="embedding", out_col="__res")
    last2, u2 = old_top_component(res, "__res")
    rows = [(1, j, last1[j], u1[j]) for j in range(DIM)] + [
        (2, j, last2[j], u2[j]) for j in range(DIM)
    ]
    return spark.createDataFrame(
        rows, "component int, dim_idx int, u_q long, u_val double"
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.data/sf10"
    order = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else ["old", "new", "old", "new"]
    )
    from flux_spark.analytics.registry import load_table
    from flux_spark.llm.similarity import power_iteration_top2
    from flux_spark.session import get_spark

    spark = get_spark(
        "exp-top2", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    e = load_table(spark, sf_dir, "embeddings")
    sums = set()
    for which in order:
        t0 = time.monotonic()
        out = old_top2(spark, e) if which == "old" else power_iteration_top2(e)
        cs = out.agg(
            F.sum(
                F.hash("component", "dim_idx", "u_q", "u_val").cast("bigint")
            )
        ).collect()[0][0]
        print(
            f"[{which}] wall={time.monotonic()-t0:.1f}s checksum={cs}",
            flush=True,
        )
        sums.add(cs)
        spark.catalog.clearCache()
    assert len(sums) == 1, sums
    print("all checksums equal")
    spark.stop()


if __name__ == "__main__":
    main()
