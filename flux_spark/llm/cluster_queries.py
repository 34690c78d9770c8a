"""Density clustering + density outliers over the embeddings table:
grid-cell DBSCAN and k-NN-distance outlier flagging.

Two data-curation operators a training pipeline runs before sampling:
density clustering to find (and optionally down-weight) dense semantic
regions, and density outlier detection to quarantine off-manifold
vectors. Both are built the way they survive 100 TB — DBSCAN via
grid-cell counting (each point touches only its own cell and 8
neighbors; never all-pairs), outliers via the shared brute/IVF top-k
machinery.

Every entry registers into ``LLM_QUERIES`` on import (same pattern as
``text_queries.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics.registry import load_table, register
from . import dedup, similarity
from .queries import LLM_QUERIES

_EPS = 0.1
_MIN_PTS = 5
# offsets of a cell's 3x3 Chebyshev-1 neighborhood (self included)
_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def _dbscan_sql() -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx, dy in _OFFSETS)
    return f"""
    WITH pts AS (
      SELECT vec_id,
        CAST(floor(CAST(embedding[1] AS DOUBLE) / {_EPS}) AS BIGINT) AS cx,
        CAST(floor(CAST(embedding[2] AS DOUBLE) / {_EPS}) AS BIGINT) AS cy
      FROM embeddings),
    cells AS (
      SELECT cx, cy, cx * 100000 + cy AS cell,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
    core AS (SELECT * FROM cells WHERE n >= {_MIN_PTS}),
    offs(dx, dy) AS (VALUES {offs}),
    edges AS (
      SELECT a.cell AS src, b.cell AS dst
      FROM core a CROSS JOIN offs o
      JOIN core b ON b.cell = (a.cx + o.dx) * 100000 + (a.cy + o.dy)),
    comp AS (
      WITH RECURSIVE reach(cell, lab) AS (
        SELECT cell, cell FROM core
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.cell)
      SELECT cell, MIN(lab) AS cluster FROM reach GROUP BY cell),
    corec AS (
      SELECT c.cell, m.cluster FROM core c JOIN comp m ON c.cell = m.cell),
    probes AS (
      SELECT p.vec_id, p.cx * 100000 + p.cy AS own_cell,
             (p.cx + o.dx) * 100000 + (p.cy + o.dy) AS probe_cell
      FROM pts p CROSS JOIN offs o),
    hits AS (
      SELECT pr.vec_id,
        CAST(MIN(c.cluster) AS BIGINT) AS nb_cluster,
        CAST(MAX(CASE WHEN pr.probe_cell = pr.own_cell THEN 1 ELSE 0 END)
             AS BIGINT) AS own_core
      FROM probes pr JOIN corec c ON c.cell = pr.probe_cell
      GROUP BY pr.vec_id)
    SELECT p.vec_id,
      CAST(COALESCE(h.nb_cluster, -1) AS BIGINT) AS cluster,
      COALESCE(h.own_core, 0) = 1 AS is_core
    FROM pts p LEFT JOIN hits h ON p.vec_id = h.vec_id
    """


@register(
    LLM_QUERIES,
    "emb_dbscan_grid",
    _dbscan_sql(),
    "grid-cell DBSCAN over the first two embedding dims (eps-sized cells, "
    "core cell = >= min_pts points): core cells connect across the 3x3 "
    "neighborhood into components (cluster id = min cell key), points in "
    "or adjacent to a core cell join that component, the rest are noise "
    "(-1). All integer arithmetic — bit-exact across engines. Scale "
    "shape: counting is one partial-agg groupBy on cell keys; adjacency "
    "and probe lookups are 9-way equi-joins against the (tiny, "
    "broadcastable) core-cell table — never point-to-point distances; "
    "component resolution runs on cells, not points.",
)
def emb_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN (cell-approximate, cf. Gunawan's grid DBSCAN): density
    is measured per eps-cell, so the quadratic eps-neighborhood join of
    classic DBSCAN becomes a groupBy + 9 equi-probes. On 64-dim
    embeddings the grid uses the first two dims (at production scale,
    project first — e.g. the JL/top-2-component operators in this
    repo — then grid the projection)."""
    e = load_table(spark, sf_dir, "embeddings")
    # r13 (guide §2.3/§6): pts was inlined 3x (cell counts, probes,
    # final join), re-reading the full 64-dim embedding column each
    # time for a 2-dim projection (array columns can't be
    # element-pruned at the scan). Checkpoint the narrow (vec_id, cx,
    # cy) projection once — one wide scan, three narrow reuses.
    pts = e.select(
        "vec_id",
        F.floor(F.element_at("embedding", 1).cast("double") / _EPS)
        .cast("bigint")
        .alias("cx"),
        F.floor(F.element_at("embedding", 2).cast("double") / _EPS)
        .cast("bigint")
        .alias("cy"),
    ).localCheckpoint(eager=True)
    cells = pts.groupBy("cx", "cy").agg(
        F.count("*").cast("bigint").alias("n")
    )
    core = cells.where(F.col("n") >= _MIN_PTS).select(
        "cx", "cy", (F.col("cx") * 100000 + F.col("cy")).alias("cell")
    )
    # the 3x3 neighborhood expansion is an exploded literal array — pure
    # codegen (a 9-row crossJoin would compile to a BroadcastNestedLoopJoin)
    off_arr = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _OFFSETS
        ]
    )
    probe_b = core.select(
        "cell", "cx", "cy", F.explode(off_arr).alias("o")
    ).select(
        F.col("cell").alias("src"),
        (
            (F.col("cx") + F.col("o.dx")) * 100000
            + (F.col("cy") + F.col("o.dy"))
        ).alias("probe"),
    )
    edges = probe_b.join(
        F.broadcast(core.select(F.col("cell").alias("dst"))),
        F.col("probe") == F.col("dst"),
    ).select("src", "dst")
    comp = dedup.connected_components(
        edges,
        vertices=core.select("cell"),
        id_a="src",
        id_b="dst",
    ).select(F.col("doc_id").alias("cell"), F.col("cluster_id").alias("cluster"))
    corec = core.select("cell").join(comp, "cell")
    probes = pts.select(
        "vec_id", "cx", "cy", F.explode(off_arr).alias("o")
    ).select(
        "vec_id",
        (F.col("cx") * 100000 + F.col("cy")).alias("own_cell"),
        (
            (F.col("cx") + F.col("o.dx")) * 100000
            + (F.col("cy") + F.col("o.dy"))
        ).alias("probe_cell"),
    )
    # r13 (guide §2.4): LEFT broadcast join keeps every point in the
    # probe stream, so the per-point verdict falls out of the ONE
    # groupBy(vec_id) — the old inner join + separate pts LEFT JOIN
    # hits re-shuffled the full point set a second time just to
    # reattach the misses. min/max ignore nulls; a probe row with no
    # core match contributes nothing, exactly like the inner join.
    hits = (
        probes.join(
            F.broadcast(corec.withColumnRenamed("cell", "probe_cell")),
            "probe_cell",
            "left",
        )
        .groupBy("vec_id")
        .agg(
            F.min("cluster").cast("bigint").alias("nb_cluster"),
            F.max(
                F.when(
                    (F.col("probe_cell") == F.col("own_cell"))
                    & F.col("cluster").isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("own_core"),
        )
    )
    return hits.select(
        "vec_id",
        F.coalesce("nb_cluster", F.lit(-1)).cast("bigint").alias("cluster"),
        (F.coalesce("own_core", F.lit(0)) == 1).alias("is_core"),
    )


_K_OUT = 10
_DIM = 64


@register(
    LLM_QUERIES,
    "emb_knn_distance_outliers",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             {similarity.sql_cosine("qv", "cv", _DIM)} AS cos_sim
      FROM q CROSS JOIN c WHERE neighbor_id <> query_id),
    kth AS (
      SELECT query_id AS vec_id, cos_sim AS kth_cos_sim
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id) AS rnk FROM scored)
      WHERE rnk = {_K_OUT}),
    flagged AS (
      SELECT vec_id, kth_cos_sim,
        ROW_NUMBER() OVER (ORDER BY kth_cos_sim ASC, vec_id) AS r,
        CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM kth)
    SELECT vec_id, kth_cos_sim,
           r <= CAST(ceil(0.05 * CAST(n AS DOUBLE)) AS BIGINT) AS is_outlier
    FROM flagged
    """,
    "k-NN-distance density outliers: each vector's similarity to its "
    "10th nearest neighbor (exact cosine, Arrow-scored, deterministic "
    "ties), lowest 5% flagged as off-manifold outliers (rank-based "
    "threshold with vec_id tie-break — no float percentile cut). Scale "
    "shape: auto-switches the candidate generator at 1,000 vectors from "
    "brute all-pairs (the gate branch — oracle stays exact) to "
    "Arrow-scored sign-LSH multiprobe buckets with auto_planes and the "
    "occupancy-derived auto_bucket_cap (r11); probed buckets with < k "
    "candidates flag as kth_cos_sim = -1 (no near k-th neighbor IS the "
    "outlier signal).",
)
def emb_knn_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-training quarantine filter: vectors whose k-th neighbor is
    far are isolated points (mislabeled, corrupted, or out-of-domain) and
    get down-sampled or dropped. Rank-based flagging keeps the gate
    integer-deterministic.

    Auto-scale switch (fixed-config law, SCALE.md): brute all-pairs is
    O(n^2) and only run up to 1,000 vectors (measured: the Arrow pair transfer is the bound — 4M brute pairs cost 16.8 s where the 6-probe LSH path scores the same corpus in ~3 s) (the gate SF takes this
    branch, so the brute oracle stays exact); past that, candidates come
    from sign-LSH buckets + Hamming-1 multiprobe (auto_planes keeps
    EXPECTED bucket volume ~constant as n grows, and the
    occupancy-derived auto_bucket_cap bounds ACTUAL per-bucket candidate
    mass where duplicated vectors defeat plane scaling — the sf100
    ladder catch, its hand-tuned 64 now derived from p99). A vector
    whose probed buckets hold fewer than k candidates has no k-th
    neighbor NEARBY — exactly the outlier signal — and is flagged with
    kth_cos_sim = -1.

    The 5% flag is a global rank over (vec_id, kth_cos) pairs, computed
    with the two-pass range-partition pattern (attach_global_order) —
    the sort parallelizes across range partitions and only the
    per-partition counts (one row per partition) reach the driver, so
    the rank survives arbitrary corpus sizes with no single-partition
    window."""
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()  # metadata-sized driver scalar (same switch as *_auto)
    if n <= 1000:
        topk = similarity.brute_force_topk(e, e, k=_K_OUT, use_arrow=True)
    else:
        # target_bucket=16: candidate volume is n x bucket x (1+planes)
        # and EVERY candidate ships 2 x 64 float64s to the scorer — at
        # 200k vectors bucket=64 meant ~65 GB of traffic (402 s, sf10
        # ladder); bucket=16 cuts the pair volume 4x for a small recall
        # cost that the -1 sparse-bucket rule absorbs (fewer candidates
        # => MORE conservative outlier flags, never fewer).
        # use_arrow=False: post-JOIN scoring inverts the Arrow win — the
        # joined pairs must cross the Python boundary per row, where the
        # JVM fold stays in codegen (measured sf10: fold 133 s vs Arrow
        # 188 s; the brute branch keeps Arrow because its broadcast
        # crossJoin amortizes the query batch)
        # auto_bucket_cap (r11, was hand-picked 64): auto_planes holds
        # EXPECTED occupancy at 16, but duplicated vectors share a bucket
        # at any plane count, so duplicate-heavy corpora grow buckets
        # linearly with the dup factor and the occupancy² bucket join
        # goes quadratic (sf100 ladder catch: 2M replica vectors ->
        # median occupancy 182, 2,593 s uncapped). One occupancy pass
        # derives cap = max(4k, min(p99, 64)): healthy corpora keep
        # their full buckets (sf0.1: p99 34 -> cap 40 >= max occupancy
        # 40, never engages), duplicated ones clamp to the rail (sf100:
        # p99 909 -> cap 64, exactly the r10 hand-tuned value) — and a
        # vector whose capped candidates are all far away is exactly
        # the outlier the -1 rule flags conservatively.
        topk = similarity.lsh_topk(
            e,
            e,
            k=_K_OUT,
            n_planes=similarity.auto_planes(n, target_bucket=16),
            use_arrow=False,
            bucket_cap="auto",
            target_bucket=16,
        )
    kth = (
        e.select("vec_id")
        .join(
            topk.where(F.col("rank") == _K_OUT).select(
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
    )
    from flux_spark.analytics.operators import attach_global_order

    # Global 5% rank via the two-pass range-partition pattern (no
    # single-partition WindowExec): range-shuffle on (kth_cos, vec_id),
    # broadcast per-partition count offsets, partitioned local window.
    # Bit-identical to ROW_NUMBER() OVER (ORDER BY ...) / COUNT(*) OVER ().
    flagged = attach_global_order(
        kth,
        [F.col("kth_cos_sim").asc(), F.col("vec_id").asc()],
        row_alias="r",
        total_alias="n",
    )
    return flagged.select(
        "vec_id",
        "kth_cos_sim",
        (
            F.col("r")
            <= F.ceil(F.lit(0.05) * F.col("n").cast("double")).cast("bigint")
        ).alias("is_outlier"),
    )


_SKEW_PLANES = similarity.hyperplanes(8, _DIM)


@register(
    LLM_QUERIES,
    "emb_index_skew_report",
    f"""
    WITH sig AS (
      SELECT {similarity.sql_signature_bits("embedding", _SKEW_PLANES, _DIM)}
               AS bucket
      FROM embeddings),
    sizes AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS sz FROM sig GROUP BY 1),
    ranked AS (
      SELECT sz,
        ROW_NUMBER() OVER (ORDER BY sz, bucket) AS r,
        CAST(COUNT(*) OVER () AS BIGINT) AS nb,
        CAST(SUM(sz) OVER () AS BIGINT) AS total
      FROM sizes)
    SELECT
      CAST(MAX(total) AS BIGINT) AS n_vectors,
      CAST(MAX(nb) AS BIGINT) AS n_buckets,
      CAST(MAX(sz) AS BIGINT) AS max_bucket,
      CAST(MIN(CASE WHEN r >= CAST(ceil(0.5 * CAST(nb AS DOUBLE)) AS BIGINT)
               THEN sz END) AS BIGINT) AS p50_bucket,
      CAST(MIN(CASE WHEN r >= CAST(ceil(0.99 * CAST(nb AS DOUBLE)) AS BIGINT)
               THEN sz END) AS BIGINT) AS p99_bucket,
      CAST(MAX(sz) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
        AS top_bucket_share,
      CAST(SUM(CASE WHEN sz > 500 THEN sz ELSE 0 END) AS BIGINT)
        AS n_in_oversized
    FROM ranked
    """,
    "ANN index skew report over the pinned 8-plane sign-LSH bucketing: "
    "bucket-count, max/p50/p99 bucket sizes (rank-located integers), "
    "top-bucket share, and the vector count sitting in buckets past the "
    "cap-500 skew guard — the diagnostic that says whether the LSH "
    "plane count (or the salting cap) needs retuning BEFORE a "
    "mega-bucket makes the candidate join quadratic. The index-side "
    "twin of events_skew_profile (join-key skew). One signature pass + "
    "an O(buckets) window.",
)
def emb_index_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    sig = e.select(
        similarity.signature_bits(F.col("embedding"), _SKEW_PLANES).alias(
            "bucket"
        )
    )
    sizes = sig.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("sz")
    )
    wr = Window.orderBy("sz", "bucket")
    wall = Window.partitionBy()
    ranked = sizes.select(
        "sz",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wall).cast("bigint").alias("nb"),
        F.sum("sz").over(wall).cast("bigint").alias("total"),
    )

    def pq(p: float, alias: str):
        thresh = F.ceil(F.lit(p) * F.col("nb").cast("double")).cast("bigint")
        return (
            F.min(F.when(F.col("r") >= thresh, F.col("sz")))
            .cast("bigint")
            .alias(alias)
        )

    return ranked.agg(
        F.max("total").cast("bigint").alias("n_vectors"),
        F.max("nb").cast("bigint").alias("n_buckets"),
        F.max("sz").cast("bigint").alias("max_bucket"),
        pq(0.5, "p50_bucket"),
        pq(0.99, "p99_bucket"),
        (
            F.max("sz").cast("double") / F.max("total").cast("double")
        ).alias("top_bucket_share"),
        F.sum(F.when(F.col("sz") > 500, F.col("sz")).otherwise(0))
        .cast("bigint")
        .alias("n_in_oversized"),
    )
