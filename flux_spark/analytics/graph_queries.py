"""Graph analytics over part co-purchase edges: PageRank, triangle counting, bounded reachability -- iterative plans that cache the edge set once.

Float determinism, registry plumbing, and the shared ``_DEC``/``_dec_sum``
helpers live in ``registry.py``; every entry here follows the same
contract (see ``queries.py`` module docstring for the 100 TB themes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, _DEC, _dec_sum, load_table, register


def _pagerank_iter_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT e.dst AS node,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM n)
               + CAST(0.85 AS DOUBLE)
                 * (CAST(CAST(SUM(CAST(floor(r.rank / d.deg * 1e18) AS BIGINT))
                          AS BIGINT) AS DOUBLE) / 1e18)
               AS rank
      FROM edges e
      JOIN {prev} r ON r.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst)"""


@register(
    ANALYTICS_QUERIES,
    "parts_pagerank",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) / (SELECT n FROM n) AS rank
           FROM deg),
    """
    + _pagerank_iter_sql("r0", "r1")
    + ","
    + _pagerank_iter_sql("r1", "r2")
    + ","
    + _pagerank_iter_sql("r2", "r3")
    + """
    SELECT node AS part, rank FROM r3
    """,
    "iterative graph algorithm with a BIT-EXACT oracle: 3 PageRank "
    "iterations (damping 0.85) over the part co-occurrence graph. Per-edge "
    "contributions are computed in double, quantized to 1e-18 integer "
    "units (floor -> int64), and SUMMED as exact integers, making the "
    "reduction order-independent — the trick that lets a shuffled "
    "distributed fold match single-threaded DuckDB to the last bit "
    "(a DECIMAL(38,20) sum is also order-free but its ->double cast "
    "rounds differently across engines). Edges cache once; each "
    "iteration is the canonical two-shuffle join-contrib-reduce",
)
def parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("__w"))
        .where(F.col("__w") >= 2)
        .select("src", "dst")
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src")
    n_nodes = deg.count()  # one tiny action over the cached edge set
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("rank")
    )
    base = 0.15 / n_nodes
    for _ in range(3):
        contrib = ed.join(ranks, ed.src == ranks.node).select(
            F.col("dst").alias("node"),
            F.floor(F.col("rank") / F.col("deg") * F.lit(1e18))
            .cast("long")
            .alias("__c"),
        )
        ranks = contrib.groupBy("node").agg(
            (
                F.lit(base)
                + F.lit(0.85) * (F.sum("__c").cast("double") / F.lit(1e18))
            ).alias("rank")
        )
    out = ranks.select(F.col("node").alias("part"), "rank")
    return out


@register(
    ANALYTICS_QUERIES,
    "parts_triangles",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e1.dst = e2.src
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
    "triangle counting on the part co-purchase graph (edges: part pairs "
    "sharing >= 2 orders): canonical low->high edges + the ordering trick "
    "find each triangle exactly once with two co-partitioned equi-joins — "
    "the second graph algorithm next to parts_pagerank",
)
def parts_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import co_occurrence_pairs, triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    # cap=None (TPC-H k <= 7); a pathological hot order would be dropped
    # by max_items_per_key before the k² self-join (skew guard)
    edges = (
        co_occurrence_pairs(li, "l_orderkey", "l_partkey")
        .where(F.col("n_keys") >= 2)
        .select(F.col("item_a").alias("src"), F.col("item_b").alias("dst"))
    )
    return triangle_count(edges)


_REACH_SQL = """
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges0 AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
edges AS (
  SELECT src, dst FROM edges0 UNION ALL SELECT dst AS src, src AS dst FROM edges0),
seed AS (SELECT MIN(src) AS s FROM edges),
reach(part, depth) AS (
  SELECT s AS part, 0 AS depth FROM seed
  UNION ALL
  SELECT e.dst AS part, r.depth + 1 AS depth
  FROM reach r JOIN edges e ON e.src = r.part
  WHERE r.depth < 3)
SELECT part, CAST(MIN(depth) AS BIGINT) AS min_depth
FROM reach GROUP BY part
"""


@register(
    ANALYTICS_QUERIES,
    "parts_reachability",
    _REACH_SQL,
    "recursive CTE (WITH RECURSIVE, new in Spark 4): 3-hop BFS over the "
    "undirected co-purchase graph from the smallest part, min depth per "
    "reached node — the iterative frontier expansion runs as one SQL "
    "statement in both engines",
)
def parts_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build + cache the edge list OUTSIDE the recursion: the recursive
    # step re-reads its non-recursive inputs every iteration, so without
    # this the O(fact-join) edge derivation runs once per BFS hop.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    op = li.distinct()
    a, b = op.alias("a"), op.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .select("src", "dst")
    )
    edges = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    edges.createOrReplaceTempView("reach_edges")
    return spark.sql(
        """
        WITH RECURSIVE seed AS (SELECT MIN(src) AS s FROM reach_edges),
        reach(part, depth) AS (
          SELECT s AS part, 0 AS depth FROM seed
          UNION ALL
          SELECT e.dst AS part, r.depth + 1 AS depth
          FROM reach r JOIN reach_edges e ON e.src = r.part
          WHERE r.depth < 3)
        SELECT part, CAST(MIN(depth) AS BIGINT) AS min_depth
        FROM reach GROUP BY part
        """
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """Weighted co-purchase edge set (both directions, HAVING w >= 2),
    built from ONE ordered half (a.partkey < b.partkey) and mirrored
    after the count filter. Bit-identical to the bidirectional
    self-join build — co-purchase counts are symmetric — but the
    dominant shuffle (the (src, dst) pair groupBy, mostly-unique keys so
    map-side combine can't shrink it) carries HALF the rows; the mirror
    is two scans of the persisted half. r9 ladder: sf30 measured the
    bidirectional build superlinear (85 s sf10 -> 428 s sf30, spill on
    the pair exchange); the halved build is the fix, measured on both
    rungs (see SCALE.md).

    The half is built through the shared basket machinery
    (operators.basket_group + pairs_from_basket, the market-basket /
    association-rules build): ONE shuffle of the raw (order, part)
    stream keyed by order (collect_set dedupes map-side — no separate
    DISTINCT shuffle, no self-join), pairs expanded JVM-side from the
    sorted array (a < b for free), then the pair count. r9 sf30
    measurements: bidirectional self-join 428 s -> ordered-half
    self-join 217 s -> basket build (this form) — see SCALE.md.

    Returns (edges, half): ``edges`` is the bidirectional view over the
    persisted half — callers must ``half.unpersist()`` when done or
    rely on clearCache."""
    from .operators import basket_group, pairs_from_basket

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    half = (
        pairs_from_basket(basket_group(li, "l_orderkey", "l_partkey"))
        .select(
            F.col("item_a").alias("src"),
            F.col("item_b").alias("dst"),
            F.col("n_keys").cast("bigint").alias("w"),
        )
        .where(F.col("w") >= 2)
        .persist()
    )
    mirrored = half.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("w")
    )
    return half.unionByName(mirrored), half


def _lp_round_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS (
      SELECT node, lab FROM (
        SELECT e.dst AS node, l.lab,
               ROW_NUMBER() OVER (PARTITION BY e.dst
                   ORDER BY CAST(SUM(e.w) AS BIGINT) DESC, l.lab) AS rn
        FROM edges e JOIN {prev} l ON l.node = e.src
        GROUP BY e.dst, l.lab)
      WHERE rn = 1)"""


@register(
    ANALYTICS_QUERIES,
    "parts_label_propagation",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2),
    l0 AS (SELECT DISTINCT src AS node, src AS lab FROM edges),
    """
    + _lp_round_sql("l0", "l1")
    + ","
    + _lp_round_sql("l1", "l2")
    + ","
    + _lp_round_sql("l2", "l3")
    + """
    SELECT node AS part, CAST(lab AS BIGINT) AS community,
      CAST(COUNT(*) OVER (PARTITION BY lab) AS BIGINT) AS community_size
    FROM l3
    """,
    "community detection by synchronous weighted label propagation "
    "(Raghavan et al. 2007): 3 rounds over the co-purchase graph, each "
    "node adopts the label with the highest incident edge-weight sum "
    "(exact BIGINT, ties to the smaller label — fully deterministic, "
    "where textbook LPA breaks ties randomly). Distinct from "
    "connected-components (density communities, not mere connectivity). "
    "Scale shape: each round is one edges-x-labels co-partitioned join + "
    "a groupBy argmax; edges cache once; no driver-side data.",
)
def parts_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, half = _copurchase_edges(spark, sf_dir)
    # Round 1 specialization (r13, guide §2.4): l0 assigns every node
    # its own id as label, so edges JOIN l0 ON l0.node = src yields
    # exactly (dst, lab=src, w) — and edges are already unique per
    # (src, dst), making the (node, lab) pre-aggregation an identity
    # too. Round 1 is therefore ONE groupBy(dst) argmax over the cached
    # edge set: no l0 checkpoint, no join, no pre-aggregation shuffle.
    labels = (
        edges.groupBy(F.col("dst").alias("node"))
        .agg(
            F.min(
                F.struct((-F.col("w")).alias("nw"), F.col("src").alias("lab"))
            ).alias("__s")
        )
        .select("node", F.col("__s.lab").alias("lab"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(2):
            # localCheckpoint per round (connected_components pattern):
            # without it round N's plan CONTAINS rounds 1..N-1 and
            # re-executes them. Argmax via min(struct(-wsum, lab))
            # instead of a row_number window (r13, guide §2.4): same
            # "highest weight, ties to the smaller label" rule, but the
            # second-level aggregate partial-combines map-side (at most
            # one row per node per partition crosses the wire) where
            # the window had to sort and co-locate EVERY (node, lab)
            # row. wsum >= 1 and lab is a partkey, so -wsum is safe.
            labels = (
                edges.join(
                    labels.select(F.col("node").alias("src"), "lab"), "src"
                )
                .groupBy(F.col("dst").alias("node"), "lab")
                .agg(F.sum("w").cast("bigint").alias("wsum"))
                .groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("wsum")).alias("nw"), F.col("lab")
                        )
                    ).alias("__s")
                )
                .select("node", F.col("__s.lab").alias("lab"))
                .localCheckpoint(eager=True)
            )
    finally:
        # the final projection reads only the checkpointed labels, so the
        # cached edge half is dead weight in a long-lived session
        half.unpersist()
    comm = Window.partitionBy("lab")
    return labels.select(
        F.col("node").alias("part"),
        F.col("lab").cast("bigint").alias("community"),
        F.count("*").over(comm).cast("bigint").alias("community_size"),
    )


@register(
    ANALYTICS_QUERIES,
    "parts_degree_assortativity",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    pairs AS (
      SELECT da.d AS x, db.d AS y
      FROM edges e
      JOIN deg da ON da.src = e.src
      JOIN deg db ON db.src = e.dst),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
        CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
        CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM pairs)
    SELECT k AS n_edges,
      CAST(k * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        / (sqrt(CAST(k * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE))
           * sqrt(CAST(k * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DOUBLE)))
        AS assortativity
    FROM sums
    """,
    "degree assortativity of the co-purchase graph (Newman 2002): "
    "Pearson correlation of endpoint degrees across directed edges — "
    "positive = hubs link hubs (dense-core catalogs), negative = "
    "hub-and-spoke; every cross-product in DECIMAL(38,0) integer "
    "arithmetic, doubles only in the final sqrt/division (IEEE sqrt is "
    "correctly rounded, so the gate is bit-exact). Degrees broadcast "
    "onto the edge stream; 1-row output.",
)
def parts_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    bidir, half = _copurchase_edges(spark, sf_dir)
    edges = bidir.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count("*").cast("bigint").alias("d"))
    dec = "decimal(38,0)"
    # r13 (guide §2.3/§3): exploit edge-list symmetry — every directed
    # edge is a half edge or its mirror, so with x = d(src), y = d(dst)
    # on the HALF edges the directed-edge sums are
    #   k = 2*COUNT,  sx = sy = SUM(x+y),  sxy = 2*SUM(x*y),
    #   sxx = syy = SUM(x^2+y^2)
    # — all integer-identical to aggregating the mirrored union, from
    # ONE pass over half the rows with the same two broadcast degree
    # joins (the old form joined degrees onto both directions of every
    # edge and read the persisted half twice).
    dsrc = deg.select(F.col("src").alias("__s"), F.col("d").alias("x"))
    ddst = deg.select(F.col("src").alias("__d"), F.col("d").alias("y"))
    xd, yd = F.col("x").cast(dec), F.col("y").cast(dec)
    sums = (
        half.select("src", "dst")
        .join(F.broadcast(dsrc), F.col("src") == F.col("__s"))
        .join(F.broadcast(ddst), F.col("dst") == F.col("__d"))
        .agg(
            (F.lit(2) * F.count("*")).cast("bigint").alias("k"),
            F.sum(F.col("x") + F.col("y")).cast("bigint").alias("sx"),
            (F.lit(2).cast(dec) * F.sum(xd * yd)).cast(dec).alias("sxy"),
            F.sum(xd * xd + yd * yd).cast(dec).alias("sxx"),
        )
        .select(
            "k",
            "sx",
            F.col("sx").alias("sy"),
            "sxy",
            "sxx",
            F.col("sxx").alias("syy"),
        )
    )
    try:
        # pin the 1-row reduction so the edge cache can be released
        # before the caller materializes the final projection
        sums = sums.localCheckpoint(eager=True)
    finally:
        half.unpersist()
    num = F.col("k") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    denx = F.col("k") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    deny = F.col("k") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")
    return sums.select(
        F.col("k").alias("n_edges"),
        (
            num.cast("double")
            / (F.sqrt(denx.cast("double")) * F.sqrt(deny.cast("double")))
        ).alias("assortativity"),
    )
