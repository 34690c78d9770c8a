"""Relational analytics over the warehouse tables.

This is the layer the reference lacks entirely (SURVEY.md §2.7: no joins,
aggregations, windows, sorts, or set ops anywhere in tferdous17/flux) and that
BASELINE.json's north star adds on top of the log engine. Everything is stock
DataFrame API so Catalyst gets full freedom: predicate pushdown to parquet,
column pruning, broadcast joins for the small dimension tables, AQE for
runtime shuffle sizing.

Scale notes per query are inline; the common themes at 100 TB:
* dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle of the fact table for those joins;
* aggregations are partial (map-side combine) by construction via groupBy;
* top-k uses sort+limit which Spark executes as a per-partition
  TakeOrdered — no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, load_table, register

_DEC = "decimal(25,6)"


def _dec_sum(col, alias):
    """Exact, order-independent sum of a double expression (see registry)."""
    return F.sum(col.cast(_DEC)).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# TPC-H-flavored queries over the star schema
# ---------------------------------------------------------------------------


@register(
    ANALYTICS_QUERIES,
    "q1_pricing_summary",
    """
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "TPC-H Q1 pricing summary: scan-heavy agg; map-side partial agg, 6-group output",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), "sum_base_price"),
        _dec_sum(disc_price, "sum_disc_price"),
        _dec_sum(charge, "sum_charge"),
        (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.count("*")).alias("avg_price"),
        (F.sum(F.col("l_discount").cast(_DEC)).cast("double") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    ANALYTICS_QUERIES,
    "q3_shipping_priority",
    """
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    "TPC-H Q3: selective dim filter, two joins, top-10 by revenue",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-30 00:00:00").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    # customer is tiny relative to orders/lineitem -> broadcast it so the
    # fact tables shuffle only on the orders<->lineitem key.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    ANALYTICS_QUERIES,
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
    """,
    "TPC-H Q4 analog: EXISTS semi-join then count per priority",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    matched_orders = o.join(
        l.select("l_orderkey", "l_shipdate"),
        (o.o_orderkey == F.col("l_orderkey"))
        & (F.col("l_shipdate") > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return matched_orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    ANALYTICS_QUERIES,
    "q5_local_supplier",
    """
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
    "TPC-H Q5: 6-table join; all dims broadcast, facts shuffle once on orderkey",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    ANALYTICS_QUERIES,
    "top_revenue_customers",
    """
    SELECT
      c.c_custkey,
      c.c_name,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_spent,
      COUNT(*) AS n_orders
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_spent DESC, c_custkey ASC
    LIMIT 10
    """,
    "join + agg + top-k (TakeOrdered, no global sort)",
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            _dec_sum(F.col("o_totalprice"), "total_spent"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    ANALYTICS_QUERIES,
    "nation_order_stats",
    """
    SELECT
      n.n_name,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "two broadcast joins + agg rollup per nation",
)
def nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    tp = F.sum(F.col("o_totalprice").cast(_DEC)).cast("double")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            tp.alias("total_price"),
            (tp / F.count("*")).alias("avg_price"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "brand_revenue",
    """
    SELECT
      p.p_brand,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    "fact x broadcast-dim join, agg on dim attribute",
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "customers_without_orders",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "anti-join (NOT EXISTS)",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    ANALYTICS_QUERIES,
    "customer_nation_rank",
    """
    SELECT
      n.n_name,
      c.c_custkey,
      c.c_acctbal,
      DENSE_RANK() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS bal_rank
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    QUALIFY bal_rank <= 3
    """,
    "window function (dense_rank) per group, top-3 filter",
)
def customer_nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("bal_rank", F.dense_rank().over(w))
        .where(F.col("bal_rank") <= 3)
    )


@register(
    ANALYTICS_QUERIES,
    "supplier_fill_rate",
    """
    WITH lines AS (
      SELECT l.l_suppkey,
             CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                  THEN 1 ELSE 0 END AS on_time
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    agg AS (
      SELECT l_suppkey, COUNT(*) AS n_lines,
             CAST(SUM(on_time) AS BIGINT) AS n_on_time
      FROM lines GROUP BY l_suppkey)
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(a.n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(a.n_on_time) AS BIGINT) AS n_on_time,
           CAST(CAST(SUM(a.n_on_time) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(a.n_lines) AS BIGINT) AS DOUBLE) AS fill_rate
    FROM agg a
    JOIN supplier s ON s.s_suppkey = a.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
    "supplier on-time fill rate (shipped within 30 days of the order) "
    "rolled up to nation: the operational metric behind TPC-H Q21 as a "
    "ratio report. One co-partitioned fact-fact join on the order key, "
    "then partial-aggregation to per-supplier counts BEFORE the "
    "(broadcast) supplier and nation dims — the final shuffle carries "
    "supplier-cardinality rows, never lineitems",
)
def supplier_fill_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .select(
            "l_suppkey",
            F.when(
                F.datediff("l_shipdate", "o_orderdate") <= 30, 1
            )
            .otherwise(0)
            .alias("on_time"),
        )
    )
    agg = li.groupBy("l_suppkey").agg(
        F.count("*").alias("n_lines"),
        F.sum("on_time").cast("bigint").alias("n_on_time"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = agg.join(
        F.broadcast(s), agg["l_suppkey"] == s["s_suppkey"]
    ).join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    nl = F.sum("n_lines").cast("bigint")
    no = F.sum("n_on_time").cast("bigint")
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        nl.alias("n_lines"),
        no.alias("n_on_time"),
        (no.cast("double") / nl.cast("double")).alias("fill_rate"),
    )


@register(
    ANALYTICS_QUERIES,
    "orders_ship_latency_sla",
    """
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days,
           CAST(CAST(SUM(days) AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_days,
           quantile_cont(days, 0.5) AS p50_days,
           quantile_cont(days, 0.9) AS p90_days
    FROM lat GROUP BY o_orderpriority
    """,
    "order-to-ship latency SLA per priority class: integer day diffs "
    "aggregate exactly; p50/p90 are exact linear-interpolation "
    "percentiles (bit-identical to quantile_cont). The operational "
    "question behind TPC-H Q4, answered as a latency distribution",
)
def orders_ship_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        (
            F.sum("days").cast("bigint").cast("double")
            / F.count("*").cast("double")
        ).alias("mean_days"),
        F.expr("percentile(days, 0.5)").alias("p50_days"),
        F.expr("percentile(days, 0.9)").alias("p90_days"),
    )


@register(
    ANALYTICS_QUERIES,
    "customer_rfm_scores",
    """
    WITH r AS (
      SELECT o_custkey AS c_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
               AS total_spend
      FROM orders GROUP BY 1),
    s AS (
      SELECT *,
        NTILE(5) OVER (ORDER BY last_order DESC, c_custkey) AS r_score,
        NTILE(5) OVER (ORDER BY n_orders DESC, c_custkey) AS f_score,
        NTILE(5) OVER (ORDER BY total_spend DESC, c_custkey) AS m_score
      FROM r)
    SELECT c_custkey, last_order, CAST(n_orders AS BIGINT) AS n_orders,
           total_spend,
           CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS rfm_code
    FROM s
    """,
    "RFM segmentation: recency/frequency/monetary quintiles per customer "
    "(1 = best), composed into the classic 3-digit RFM code — one "
    "aggregation then three rank windows with deterministic custkey "
    "tie-breaks. The global NTILEs are the test-scale form; at warehouse "
    "scale the same scores come from broadcast percentile cutoffs "
    "(the customer_balance_deciles note applies)",
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    r = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)"))
        .cast("double")
        .alias("total_spend"),
    )
    wr = Window.orderBy(F.desc("last_order"), F.asc("c_custkey"))
    wf = Window.orderBy(F.desc("n_orders"), F.asc("c_custkey"))
    wm = Window.orderBy(F.desc("total_spend"), F.asc("c_custkey"))
    s = r.select(
        "*",
        F.ntile(5).over(wr).cast("int").alias("r_score"),
        F.ntile(5).over(wf).cast("int").alias("f_score"),
        F.ntile(5).over(wm).cast("int").alias("m_score"),
    )
    return s.select(
        "c_custkey",
        "last_order",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        "total_spend",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        )
        .cast("int")
        .alias("rfm_code"),
    )




@register(
    ANALYTICS_QUERIES,
    "customer_balance_deciles",
    """
    WITH d AS (
      SELECT c_custkey, c_acctbal,
             NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS decile
      FROM customer)
    SELECT CAST(decile AS INTEGER) AS decile,
           COUNT(*) AS n_customers,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_bal
    FROM d GROUP BY decile
    """,
    "NTILE bucketing: balance deciles under a deterministic total order "
    "(balance desc, key asc) with per-decile exact-decimal totals. NTILE "
    "needs one global sort — fine for dimension-sized inputs; for a fact "
    "table at scale the percentile-cut form (events_value_percentiles) is "
    "the scalable variant",
)
def customer_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    d = c.select(
        "c_custkey", "c_acctbal", F.ntile(10).over(w).alias("decile")
    )
    return d.groupBy(F.col("decile").cast("int").alias("decile")).agg(
        F.count("*").alias("n_customers"),
        F.min("c_acctbal").cast("double").alias("min_bal"),
        F.max("c_acctbal").cast("double").alias("max_bal"),
        F.sum(F.col("c_acctbal").cast("decimal(25,2)"))
        .cast("double")
        .alias("total_bal"),
    )


# Bucketed-table cache: (session id, sf_dir) -> (orders tbl, lineitem tbl).
# Bucketing is a *write-time* layout choice; the tables are written once per
# session and every bucketed query after that joins shuffle-free.
_BUCKET_CACHE: dict[tuple[int, str], tuple[str, str]] = {}


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write orders + lineitem as bucketed catalog tables (8 buckets on the
    order key, sorted within buckets) rooted in a temp location.

    This is the co-located-join storage strategy for the biggest recurring
    join in the schema: both sides hash into the same bucket files at write
    time, so every subsequent orderkey join is Exchange-free (asserted in
    tests/test_plans.py) — at 100 TB that converts the nightly fact-fact
    shuffle into a per-bucket merge join.
    """
    import tempfile

    ck = (id(spark), sf_dir)
    if ck in _BUCKET_CACHE:
        return _BUCKET_CACHE[ck]
    tag = abs(hash(sf_dir)) % 10**8
    names = (f"b_orders_{tag}", f"b_lineitem_{tag}")
    base = tempfile.mkdtemp(prefix="flux-bucketed-")
    for name, table, key in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        (
            # repartition on the bucket key FIRST: without it every input
            # task sorts and writes all 8 buckets (N*8 files and N
            # concurrent sorts — the sf10 ladder run exhausted execution
            # memory exactly here); with it each bucket is one task's one
            # spill-friendly sort and exactly one file
            load_table(spark, sf_dir, table)
            .repartition(8, F.col(key))
            .write.mode("overwrite")
            .option("path", f"{base}/{name}")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    _BUCKET_CACHE[ck] = names
    return names


@register(
    ANALYTICS_QUERIES,
    "orders_bucketed_join",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,2))) AS DOUBLE)
             AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    "co-located fact-fact join over write-time-bucketed tables: orders and "
    "lineitem bucketed (8, orderkey) + sorted, so the join runs with ZERO "
    "exchanges on either side — the bucketing answer to the one join "
    "broadcast can't fix at 100 TB",
)
def orders_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, lt = bucketed_tables(spark, sf_dir)
    o = spark.table(ot)
    li = spark.table(lt)
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(25,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Event-stream analytics (the `events` table plays the topic-log role)
# ---------------------------------------------------------------------------


@register(
    ANALYTICS_QUERIES,
    "events_hourly",
    """
    SELECT
      date_trunc('hour', ts) AS window_start,
      event_type,
      COUNT(*) AS n_events,
      COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    "tumbling 1h window aggregation (batch form of the streaming windowed agg)",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        _dec_sum(F.col("value"), "total_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_watermark_planning",
    """
    WITH arr AS (
      SELECT event_id, ts,
        MAX(ts) OVER (PARTITION BY event_id % 3 ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
      FROM events),
    d AS (SELECT CAST(unnest([0, 5, 30, 120]) AS INTEGER) AS delay_minutes)
    SELECT d.delay_minutes,
      CAST(SUM(CASE WHEN mx IS NOT NULL
                     AND epoch_us(ts) < epoch_us(mx)
                         - CAST(delay_minutes AS BIGINT) * 60000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(CAST(SUM(CASE WHEN mx IS NOT NULL
                          AND epoch_us(ts) < epoch_us(mx)
                              - CAST(delay_minutes AS BIGINT) * 60000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS late_rate
    FROM arr CROSS JOIN d
    GROUP BY d.delay_minutes
    """,
    "watermark planning: per candidate delay (0/5/30/120 min), how many "
    "events arrive later than the running max event time minus the delay "
    "— i.e. WOULD BE DROPPED by a streaming aggregation with that "
    "watermark. Arrival order is tracked per log partition (event_id%3), "
    "mirroring how Structured Streaming advances watermarks from "
    "per-partition maxima; the report is what an operator consults "
    "before fixing withWatermark() for a new source",
)
def events_watermark_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "ts")
    w = (
        Window.partitionBy(F.pmod(F.col("event_id"), F.lit(3)))
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = e.select("event_id", "ts", F.max("ts").over(w).alias("mx"))
    delays = spark.createDataFrame(
        [(0,), (5,), (30,), (120,)], "delay_minutes int"
    )
    late = F.when(
        F.col("mx").isNotNull()
        & (
            F.unix_micros("ts")
            < F.unix_micros("mx")
            - F.col("delay_minutes").cast("bigint") * F.lit(60000000)
        ),
        1,
    ).otherwise(0)
    n_late = F.sum(late).cast("bigint")
    return (
        arr.crossJoin(F.broadcast(delays))
        .groupBy("delay_minutes")
        .agg(
            n_late.alias("n_late"),
            F.count("*").cast("bigint").alias("n_events"),
            (n_late.cast("double") / F.count("*").cast("double")).alias(
                "late_rate"
            ),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_sessionize",
    """
    WITH ordered AS (
      SELECT
        user_id, event_id, ts,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT
        user_id, event_id, ts,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered
    )
    SELECT
      user_id,
      session_id,
      COUNT(*) AS n_events,
      MIN(event_id) AS first_event_id,
      MAX(event_id) AS last_event_id,
      epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM sessions
    GROUP BY user_id, session_id
    """,
    "sessionization via 30-min gaps: lag + cumulative sum (session_window analog in batch)",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > gap_us
        ),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.select("user_id", "event_id", "ts")
        .withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event_id"),
            F.max("event_id").alias("last_event_id"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_us"
            ),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_running_total",
    """
    SELECT
      user_id,
      event_id,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS DOUBLE) AS running_value
    FROM events
    """,
    "running per-user totals (window sum, exact via decimal)",
)
def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("running_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_top3_per_user",
    """
    SELECT user_id, event_id, event_type, value
    FROM (
      SELECT *,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    )
    WHERE rn <= 3
    """,
    "top-N per key via row_number window",
)
def events_top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "event_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# custom operators & wider relational coverage
# ---------------------------------------------------------------------------


@register(
    ANALYTICS_QUERIES,
    "events_asof_purchase",
    """
    WITH r AS (
      SELECT user_id, ts, 0 AS side, event_id AS prior_event_id,
             CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS value
      FROM events WHERE event_type = 'click'),
    l AS (
      SELECT user_id, ts, 1 AS side, CAST(NULL AS BIGINT) AS prior_event_id,
             event_id, value
      FROM events WHERE event_type = 'purchase'),
    u AS (SELECT * FROM r UNION ALL SELECT * FROM l),
    c AS (
      SELECT *, last_value(prior_event_id IGNORE NULLS) OVER (
        PARTITION BY user_id
        ORDER BY ts ASC, side ASC, prior_event_id ASC NULLS FIRST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
      FROM u)
    SELECT user_id, ts, event_id, value, carry AS prior_event_id
    FROM c WHERE side = 1
    """,
    "as-of join: each purchase gets the latest prior-or-same-time click "
    "(merge-scan union+window form — one shuffle, no inequality join)",
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        time_col="ts",
        right_value_cols=["event_id"],
        prefix="prior_",
        tiebreak="event_id",
    )


@register(
    ANALYTICS_QUERIES,
    "orders_priority_rollup",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
    "hierarchical rollup (grouping sets): per (priority,status), per priority, grand total",
)
def orders_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "total_price"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_type_day_cube",
    """
    SELECT event_type, date_trunc('day', ts) AS day,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CUBE(event_type, date_trunc('day', ts))
    """,
    "full CUBE (all four grouping sets: (type,day), (type), (day), ()) in "
    "one pass — the expand-then-aggregate plan partial-aggregates each "
    "grouping map-side, completing the rollup/cube/grouping-sets family",
)
def events_type_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.cube(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), "total_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_salted_user_join",
    """
    WITH dim AS (
      SELECT DISTINCT user_id, 'seg' || CAST(user_id % 4 AS VARCHAR) AS segment
      FROM events)
    SELECT d.segment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events e JOIN dim d USING (user_id)
    GROUP BY d.segment
    """,
    "skew-safe salted join (operators.salted_join): the fact side is "
    "salted and the dim replicated per salt so a celebrity key spreads "
    "over n_salts reducers — results provably identical to the plain "
    "join, which is exactly what the oracle checks",
)
def events_salted_user_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import salted_join

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("user_id")
        .distinct()
        .withColumn(
            "segment",
            F.concat(F.lit("seg"), (F.col("user_id") % 4).cast("string")),
        )
    )
    joined = salted_join(
        e, dim, "user_id",
        n_salts=8,
        salt_col=F.pmod(F.xxhash64("event_id"), F.lit(8)),
    )
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), "total_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_bloom_filtered_join",
    """
    WITH dim AS (
      SELECT DISTINCT user_id,
             'vip' || CAST(user_id % 3 AS VARCHAR) AS tier
      FROM events WHERE user_id % 10 = 0)
    SELECT d.tier, COUNT(*) AS n_events,
           CAST(MIN(e.event_id) AS BIGINT) AS first_event
    FROM events e JOIN dim d USING (user_id)
    GROUP BY d.tier
    """,
    "Bloom-prefiltered join (operators.bloom_prefilter_join): the sparse "
    "dim builds a deterministic md5 Bloom bit set that drops non-matching "
    "fact rows BEFORE the shuffle; results provably identical to the "
    "plain join, which is what the oracle checks",
)
def events_bloom_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import bloom_prefilter_join

    e = load_table(spark, sf_dir, "events")
    dim = (
        e.select("user_id")
        .where(F.col("user_id") % 10 == 0)
        .distinct()
        .withColumn(
            "tier",
            F.concat(F.lit("vip"), (F.col("user_id") % 3).cast("string")),
        )
    )
    joined = bloom_prefilter_join(e, dim, "user_id")
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").cast("bigint").alias("first_event"),
    )


def _zorder_sql(bits: int = 10) -> str:
    terms = " + ".join(
        f"(((user_id >> {j}) & 1) * {2 ** (2 * j)}"
        f" + ((CAST(event_id % 1024 AS BIGINT) >> {j}) & 1) * {2 ** (2 * j + 1)})"
        for j in range(bits)
    )
    return f"""
    SELECT event_id, user_id, CAST({terms} AS BIGINT) AS zorder
    FROM events
    """


@register(
    ANALYTICS_QUERIES,
    "events_zorder_layout",
    _zorder_sql(),
    "Z-order (Morton) layout key: bit-interleave of (user_id, event "
    "bucket) — sorting files by this clusters rows close in BOTH "
    "dimensions so rowgroup stats prune scans filtered on either column "
    "(the OPTIMIZE ZORDER technique); pure codegen bit arithmetic",
)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import zorder_value

    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        zorder_value(
            F.col("user_id"), F.col("event_id") % 1024, bits=10
        ).alias("zorder"),
    )


@register(
    ANALYTICS_QUERIES,
    "customer_segments_setops",
    """
    WITH high_bal AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
    buyers97 AS (
      SELECT DISTINCT o_custkey AS c_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'active_high_bal' AS segment, c_custkey
    FROM (SELECT c_custkey FROM high_bal INTERSECT SELECT c_custkey FROM buyers97)
    UNION ALL
    SELECT 'dormant_high_bal' AS segment, c_custkey
    FROM (SELECT c_custkey FROM high_bal EXCEPT SELECT c_custkey FROM buyers97)
    """,
    "set operations: INTERSECT / EXCEPT customer segments with labels",
)
def customer_segments_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    high_bal = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    buyers97 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    active = high_bal.intersect(buyers97).select(
        F.lit("active_high_bal").alias("segment"), "c_custkey"
    )
    dormant = high_bal.subtract(buyers97).select(
        F.lit("dormant_high_bal").alias("segment"), "c_custkey"
    )
    return active.unionByName(dormant)


@register(
    ANALYTICS_QUERIES,
    "orders_scalar_funcs",
    """
    SELECT o_orderkey,
      upper(o_orderstatus) AS status_upper,
      substr(o_orderpriority, 1, 1) AS prio_code,
      lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded_key,
      year(o_orderdate) AS order_year,
      month(o_orderdate) AS order_month,
      day(o_orderdate) AS order_day,
      o_orderdate + INTERVAL 30 DAY AS due_ts,
      sqrt(o_totalprice) AS price_sqrt,
      CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      o_orderkey % 7 AS key_mod7
    FROM orders
    """,
    "per-row scalar function coverage: string / date-part / interval / math "
    "(IEEE-exact ops only, all inside whole-stage codegen)",
)
def orders_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded_key"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_json_props",
    """
    SELECT event_type,
      CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      COUNT(*) AS n_events,
      MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type, CAST(json_extract(props, '$.k') AS BIGINT) % 10
    """,
    "semi-structured JSON extraction (from_json) + bucketed aggregation",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_salted_user_stats",
    """
    SELECT user_id,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
      MIN(event_id) AS first_event,
      MAX(event_id) AS last_event
    FROM events
    GROUP BY user_id
    """,
    "skew-safe salted two-phase aggregation (identical result to direct "
    "groupBy; spreads hot keys over n_salts reducers)",
)
def events_salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import salted_agg

    e = load_table(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["user_id"],
        aggs={
            "n_events": ("count", F.lit(1)),
            "total_value": ("sum", F.col("value").cast(_DEC)),
            "first_event": ("min", F.col("event_id")),
            "last_event": ("max", F.col("event_id")),
        },
        salt_col=F.pmod(F.col("event_id"), F.lit(16)),
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@register(
    ANALYTICS_QUERIES,
    "events_distinct_users_sketch",
    None,  # HLL/KLL sketches are engine-specific; exactness asserted in-query
    "approximate sketches at scale: approx_count_distinct (HLL) and "
    "approx_percentile (KLL-style) vs their exact counterparts, with "
    "relative-error columns the rows-only gate pins down",
)
def events_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch operators are THE tool for distinct/quantile at 100 TB (fixed
    memory, one pass, mergeable partials) but their estimates are
    engine-implementation-specific, so instead of a DuckDB twin the query
    emits both the sketch and the exact value plus the observed relative
    error — downstream assertions (and readers) can see the sketch is
    within its documented accuracy (HLL rsd default 5%)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_median_value"),
        F.expr("percentile(value, 0.5)").alias("exact_median_value"),
    )
    return agg.select(
        "event_type",
        "approx_users",
        "exact_users",
        F.round(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users"),
            4,
        ).alias("users_rel_err"),
        "approx_median_value",
        "exact_median_value",
    )


@register(
    ANALYTICS_QUERIES,
    "orders_above_customer_avg",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
    "correlated scalar subquery (each order vs its customer's average) — "
    "Catalyst decorrelates to an aggregate+join; expressed as a window to "
    "shuffle the fact table once",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg = F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double") / F.count(
        "*"
    ).over(w)
    return (
        o.withColumn("__avg", avg)
        .where(F.col("o_totalprice") > F.col("__avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    ANALYTICS_QUERIES,
    "q6_forecast_revenue",
    """
    SELECT
      CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    "TPC-H Q6 forecast-revenue: pure filter+agg — every predicate reaches the "
    "parquet scan (PushedFilters), zero shuffles beyond the final 1-row agg",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "q10_returned_items",
    """
    SELECT
      c.c_custkey,
      c.c_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        AS revenue,
      n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    "TPC-H Q10 returned items: fact-fact join on orderkey + two broadcast "
    "dims, top-20 as TakeOrdered (no global sort)",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    # lineitem<->orders shuffle on orderkey; customer and nation broadcast so
    # the aggregated fact stream never reshuffles for the dimensions.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    ANALYTICS_QUERIES,
    "q14_promo_revenue",
    """
    SELECT
      100.0 * CAST(SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                     THEN l.l_extendedprice * (1 - l.l_discount)
                     ELSE 0 END AS DECIMAL(25,6))) AS DOUBLE)
            / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,6))) AS DOUBLE) AS promo_revenue_pct,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    "TPC-H Q14 promo revenue share: conditional aggregation over a "
    "broadcast part join — one scan, one 1-row agg",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast(_DEC)).cast("double")
            / F.sum(disc.cast(_DEC)).cast("double")
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


@register(
    ANALYTICS_QUERIES,
    "customer_order_gaps",
    """
    WITH gaps AS (
      SELECT
        o_custkey,
        date_diff('day',
                  LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
      FROM orders
    )
    SELECT
      o_custkey,
      COUNT(gap_days) AS n_gaps,
      CAST(SUM(CAST(gap_days AS DECIMAL(25,6))) AS DOUBLE) / COUNT(gap_days)
        AS avg_gap_days,
      MAX(gap_days) AS max_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    """,
    "inter-order gap stats per customer: LAG window then re-aggregate — "
    "window and groupBy share the o_custkey shuffle (one exchange total)",
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        ),
    ).where(F.col("gap_days").isNotNull())
    return gaps.groupBy("o_custkey").agg(
        F.count("gap_days").alias("n_gaps"),
        (
            F.sum(F.col("gap_days").cast(_DEC)).cast("double")
            / F.count("gap_days")
        ).alias("avg_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_user_retention",
    """
    WITH cohorts AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT
      c.cohort_day,
      date_trunc('day', e.ts) AS active_day,
      COUNT(DISTINCT e.user_id) AS n_users
    FROM events e
    JOIN cohorts c ON e.user_id = c.user_id
    GROUP BY c.cohort_day, date_trunc('day', e.ts)
    """,
    "cohort retention matrix: first-activity day per user joined back to "
    "activity days (testdata spans 30 days) — both the cohort agg and the join key on user_id, so "
    "AQE coalesces to one user_id exchange; at 100 TB the cohort side is "
    "orders-of-magnitude smaller and broadcast",
)
def events_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        e.join(cohorts, "user_id")
        .groupBy("cohort_day", F.date_trunc("day", F.col("ts")).alias("active_day"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    ANALYTICS_QUERIES,
    "q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 55
    )
    SELECT
      c.c_custkey,
      c.c_name,
      o.o_orderkey,
      o.o_orderdate,
      o.o_totalprice,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big b      ON b.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    "TPC-H Q18 large-volume orders: HAVING-filtered agg semi-joined back to "
    "the facts — the big-order key set is tiny after the HAVING, so it "
    "broadcasts and the second lineitem pass never shuffles",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .where(F.col("__q") > 55)
        .select("l_orderkey")
    )
    return (
        l.join(F.broadcast(big), "l_orderkey")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dec_sum(F.col("l_quantity"), "total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    ANALYTICS_QUERIES,
    "orders_with_bulk_lines",
    """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_quantity >= 45
        AND l.l_discount < 0.02
    )
    """,
    "EXISTS correlated predicate -> left-semi join; the lineitem side is "
    "filtered before the join so the semi-join probe set is small",
)
def orders_with_bulk_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= 45) & (F.col("l_discount") < 0.02)
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    ANALYTICS_QUERIES,
    "events_sliding_windows",
    """
    SELECT
      ws AS window_start,
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM (
      SELECT
        time_bucket(INTERVAL '15 minutes', ts)
          - (k.k * INTERVAL '15 minutes') AS ws,
        event_type, value
      FROM events CROSS JOIN (SELECT range AS k FROM range(0, 4)) k)
    GROUP BY ws, event_type
    """,
    "sliding 1h windows every 15 min (each event lands in exactly 4 hops); "
    "the batch twin of a hop-window streaming aggregation — Spark expands "
    "the 4 window instances per row before one partial-agg shuffle",
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_clicks_before_purchase",
    """
    SELECT
      p.event_id AS purchase_id,
      p.user_id,
      COUNT(*) AS n_clicks
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    "bounded time-range join: clicks within the hour before each purchase "
    "(operators.range_join_keyed — equi-key hash join + residual range "
    "filter, never a nested loop)",
)
def events_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import range_join_keyed

    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join_keyed(
        purchases,
        clicks,
        key="user_id",
        left_time="ts",
        right_time="ts",
        lower=F.expr("INTERVAL -1 HOUR"),
        upper=F.expr("INTERVAL 0 SECONDS"),
    )
    return joined.groupBy(
        F.col("l.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
    ).agg(F.count("*").alias("n_clicks"))


@register(
    ANALYTICS_QUERIES,
    "events_time_rollup",
    """
    SELECT
      event_type,
      date_trunc('day', ts) AS day,
      date_trunc('hour', ts) AS hour,
      CAST(GROUPING(event_type, date_trunc('day', ts), date_trunc('hour', ts)) AS INT) AS gid,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY ROLLUP(event_type, date_trunc('day', ts), date_trunc('hour', ts))
    """,
    "hypertable-style continuous-aggregate rollup: one pass produces the "
    "hour, day, per-type, and grand-total granularities (ROLLUP expands "
    "before a single partial-agg shuffle; a materialized cascade at scale)",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    return e.rollup("event_type", "day", "hour").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), "total_value"),
    ).select("event_type", "day", "hour", "gid", "n_events", "total_value")


@register(
    ANALYTICS_QUERIES,
    "events_value_percentiles",
    """
    SELECT
      event_type,
      quantile_cont(value, 0.25) AS p25,
      quantile_cont(value, 0.5)  AS p50,
      quantile_cont(value, 0.9)  AS p90,
      quantile_cont(value, 0.99) AS p99
    FROM events
    GROUP BY event_type
    """,
    "exact linear-interpolation percentiles per event type (Spark "
    "percentile == DuckDB quantile_cont bit-for-bit; at 100 TB swap in "
    "approx_percentile and drop the per-group sort)",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )


@register(
    ANALYTICS_QUERIES,
    "doc_lang_pivot",
    """
    SELECT
      source,
      COUNT(CASE WHEN lang = 'de' THEN 1 END) AS de,
      COUNT(CASE WHEN lang = 'en' THEN 1 END) AS en,
      COUNT(CASE WHEN lang = 'es' THEN 1 END) AS es,
      COUNT(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
      COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS zh
    FROM documents
    GROUP BY source
    """,
    "pivot: per-source document counts pivoted by language (explicit value "
    "list keeps it one pass, no distinct-values pre-query)",
)
def doc_lang_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    pivoted = d.groupBy("source").pivot("lang", langs).agg(F.count(F.lit(1)))
    # empty cells come back NULL from pivot; the SQL COUNT form yields 0
    return pivoted.select(
        "source", *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in langs]
    )


@register(
    ANALYTICS_QUERIES,
    "events_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    clicks AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN per_user u ON e.user_id = u.user_id
      WHERE e.event_type = 'click' AND e.ts > u.t_view
      GROUP BY e.user_id
    ),
    purch AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN clicks c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT
      CAST((SELECT COUNT(t_view) FROM per_user) AS BIGINT) AS n_view,
      CAST((SELECT COUNT(*) FROM clicks) AS BIGINT) AS n_view_click,
      CAST((SELECT COUNT(*) FROM purch) AS BIGINT) AS n_view_click_purchase
    """,
    "ordered conversion funnel view -> click -> purchase: chained min-over-"
    "window stages share ONE hash partitioning on user_id (no re-shuffle "
    "between stages), then a partial-aggregated global count",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    # Stage timestamps chained per user: each stage's min() only admits
    # events strictly after the previous stage. Same window partitioning
    # throughout -> Catalyst plans a single exchange for all three passes.
    s1 = e.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_view_click"),
        F.count("t_purchase").alias("n_view_click_purchase"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_hll_registers",
    """
    WITH h AS (
      SELECT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    reg AS (
      SELECT event_type,
             hv >> 52 AS bucket,
             strpos(lpad(bin(hv & 4503599627370495), 52, '0'), '1') AS pos
      FROM h
    )
    SELECT event_type,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(MAX(CASE WHEN pos = 0 THEN 53 ELSE pos END) AS BIGINT) AS max_rho
    FROM reg
    GROUP BY event_type, bucket
    """,
    "deterministic HyperLogLog register construction per event_type: md5 -> "
    "60-bit hash, top 8 bits pick one of 256 registers, max leading-zero "
    "rank over the low 52 bits. Registers merge with MAX (commutative / "
    "associative), so shards combine map-side and sketches union across "
    "topics at 100 TB without re-reading data; the estimate is a driver-"
    "side formula over these 256 rows. Exact-oracle twin of the "
    "approx_count_distinct gate query",
)
def events_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    reg = e.select(
        "event_type",
        F.shiftright(hv, 52).cast("bigint").alias("bucket"),
        F.instr(
            F.lpad(F.bin(hv.bitwiseAND(F.lit(4503599627370495))), 52, "0"), "1"
        ).alias("pos"),
    )
    rho = F.when(F.col("pos") == 0, 53).otherwise(F.col("pos"))
    return reg.groupBy("event_type", "bucket").agg(
        F.max(rho).cast("bigint").alias("max_rho")
    )


@register(
    ANALYTICS_QUERIES,
    "orders_market_basket",
    """
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    "market-basket co-occurrence: distinct (order, part) self-joined on "
    "orderkey — the join key is the ORDER (bounded fan-out: ~4 parts/order "
    "-> ~6 pairs), so the self-join co-partitions on l_orderkey and never "
    "builds a parts-x-parts product; pair counts partial-aggregate before "
    "the final shuffle",
)
def orders_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import co_occurrence_pairs

    li = load_table(spark, sf_dir, "lineitem")
    # cap=None: TPC-H orders hold <= 7 lineitems; real baskets would pass
    # max_items_per_key to guard the per-key k² (see co_occurrence_pairs)
    return (
        co_occurrence_pairs(li, "l_orderkey", "l_partkey")
        .select(
            F.col("item_a").alias("part_a"),
            F.col("item_b").alias("part_b"),
            F.col("n_keys").alias("n_orders"),
        )
        .where(F.col("n_orders") >= 2)
    )


@register(
    ANALYTICS_QUERIES,
    "events_value_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS median FROM events GROUP BY 1
    ),
    j AS (
      SELECT e.event_type, e.value, m.median
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs(value - median), 0.5) AS mad
      FROM j GROUP BY 1
    )
    SELECT j.event_type,
           MIN(j.median) AS median,
           MIN(d.mad) AS mad,
           COUNT(CASE WHEN abs(j.value - j.median) > 3 * d.mad THEN 1 END)
             AS n_outliers
    FROM j JOIN mad d ON d.event_type = j.event_type
    GROUP BY j.event_type
    """,
    "robust anomaly stats per event type: median + median-absolute-"
    "deviation (exact linear-interpolation percentiles, bit-identical to "
    "quantile_cont), outliers = |v - med| > 3*MAD. The per-type medians "
    "and MADs broadcast back onto the fact scan — the events table "
    "shuffles only for the percentile groupings, never for the joins",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("median")
    )
    j = e.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type").agg(
        F.expr("percentile(abs(value - median), 0.5)").alias("mad")
    )
    j2 = j.join(F.broadcast(mad), "event_type")
    return j2.groupBy("event_type").agg(
        F.min("median").alias("median"),
        F.min("mad").alias("mad"),
        F.count(
            F.when(
                F.abs(F.col("value") - F.col("median")) > 3 * F.col("mad"), 1
            )
        ).alias("n_outliers"),
    )


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
    "events_cms_registers",
    """
    WITH rows_ AS (
      SELECT user_id, r FROM events
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS r FROM range(0, 4))
    )
    SELECT r AS sketch_row,
           CAST(CAST(('0x' || substring(
                  md5(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
                  1, 15)) AS BIGINT) % 64 AS BIGINT) AS sketch_col,
           COUNT(*) AS n
    FROM rows_
    GROUP BY 1, 2
    """,
    "deterministic Count-Min sketch registers (depth 4 x width 64, salted "
    "md5 rows): the SUM-mergeable frequency twin of the MAX-mergeable HLL "
    "registers — shards partial-aggregate map-side, sketches union by "
    "adding registers, and a key's frequency estimate is the MIN over its "
    "4 cells, all reproducible bit-for-bit in the oracle",
)
def events_cms_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id")
    rows = e.crossJoin(
        spark.range(4).select(F.col("id").cast("int").alias("sketch_row"))
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("sketch_row").cast("string"),
                    F.col("user_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        rows.select("sketch_row", F.pmod(h, F.lit(64)).alias("sketch_col"))
        .groupBy("sketch_row", "sketch_col")
        .agg(F.count("*").alias("n"))
    )


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


@register(
    ANALYTICS_QUERIES,
    "events_quality_checks",
    """
    WITH agg AS (
      SELECT
        SUM(CASE WHEN value IS NOT NULL AND value >= 0 THEN 0 ELSE 1 END) AS v0,
        SUM(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS v1,
        SUM(CASE WHEN event_type IN ('view','click','purchase','signup','error')
                 THEN 0 ELSE 1 END) AS v2,
        SUM(CASE WHEN ts >= TIMESTAMP '2020-01-01 00:00:00' THEN 0 ELSE 1 END) AS v3,
        COUNT(*) AS n
      FROM events)
    SELECT 'value_non_negative' AS rule, CAST(v0 AS BIGINT) AS n_violations, n AS n_checked FROM agg
    UNION ALL
    SELECT 'user_id_not_null', CAST(v1 AS BIGINT), n FROM agg
    UNION ALL
    SELECT 'event_type_in_domain', CAST(v2 AS BIGINT), n FROM agg
    UNION ALL
    SELECT 'ts_after_2020', CAST(v3 AS BIGINT), n FROM agg
    """,
    "declarative data-quality expectations (Deequ shape): four rules "
    "evaluated as conditional aggregates in ONE scan — adding a rule "
    "costs an expression, not a pass; NULL rule results count as "
    "violations",
)
def events_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import expectation_report

    e = load_table(spark, sf_dir, "events")
    return expectation_report(
        e,
        {
            "value_non_negative": F.col("value") >= 0,
            "user_id_not_null": F.col("user_id").isNotNull(),
            "event_type_in_domain": F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            ),
            "ts_after_2020": F.col("ts") >= F.lit("2020-01-01").cast("timestamp"),
        },
    )


_UNPIVOT_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2)
SELECT window_start, event_type, metric, val
FROM hourly UNPIVOT (val FOR metric IN (n_events, total_value))
"""


@register(
    ANALYTICS_QUERIES,
    "events_hourly_unpivot",
    _UNPIVOT_SQL,
    "unpivot/melt: the hourly wide aggregate reshaped to long "
    "(metric, value) form — the operator family for feeding generic "
    "metric sinks; identical SQL-standard UNPIVOT in both engines",
)
def events_hourly_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_UNPIVOT_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
WHERE c.c_custkey < 100
"""


@register(
    ANALYTICS_QUERIES,
    "customer_lateral_top_orders",
    _LATERAL_SQL,
    "correlated LATERAL subquery join: per-customer top-2 orders by "
    "price with deterministic ties — Catalyst decorrelates it to a "
    "ranked join rather than re-executing per row (the window top-k "
    "form, operators.top_k_per_group, is the same plan written by hand)",
)
def customer_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_SQL)


@register(
    ANALYTICS_QUERIES,
    "events_value_moments",
    """
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sh,
             CAST(SUM(CAST(hour(ts) * hour(ts) AS BIGINT)) AS BIGINT) AS shh,
             CAST(SUM(CAST(value * hour(ts) AS DECIMAL(30,6))) AS DOUBLE) AS sxh
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           sx / n AS mean_value,
           sqrt(sxx / n - (sx / n) * (sx / n)) AS std_value,
           (sxh / n - (sx / n) * (CAST(sh AS DOUBLE) / n))
             / (sqrt(sxx / n - (sx / n) * (sx / n))
                * sqrt(CAST(shh AS DOUBLE) / n
                       - (CAST(sh AS DOUBLE) / n) * (CAST(sh AS DOUBLE) / n)))
             AS corr_value_hour
    FROM s
    """,
    "statistics family (stddev / correlation) made order-free: the five "
    "raw sums aggregate exactly (decimal for doubles, int for ints), and "
    "mean/variance/correlation derive from them with a fixed sequence of "
    "IEEE ops — built-in stddev/corr fold floats in partition order and "
    "are not reproducible across engines; this form is",
)
def events_value_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    h = F.hour("ts").cast("long")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("sx"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(30,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(h).cast("bigint").alias("sh"),
        F.sum(h * h).cast("bigint").alias("shh"),
        F.sum((F.col("value") * h.cast("double")).cast("decimal(30,6)"))
        .cast("double")
        .alias("sxh"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    mh = F.col("sh").cast("double") / F.col("n")
    varh = F.col("shh").cast("double") / F.col("n") - mh * mh
    return s.select(
        "event_type",
        "n",
        mean.alias("mean_value"),
        F.sqrt(var).alias("std_value"),
        (
            (F.col("sxh") / F.col("n") - mean * mh)
            / (F.sqrt(var) * F.sqrt(varh))
        ).alias("corr_value_hour"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_user_ewma",
    """
    SELECT user_id,
           COUNT(*) AS n,
           list_reduce(list(value ORDER BY ts, event_id),
                       (s, x) -> 0.5 * x + 0.5 * s) AS ewma
    FROM events GROUP BY user_id
    """,
    "per-user EWMA of event values via applyInPandas (grouped-map Pandas "
    "UDF): the s_i = a*x_i + (1-a)*s_{i-1} recursion depends on previous "
    "OUTPUTS, which window frames can't express — the canonical drop-to-"
    "pandas case, still bit-reproducible (fixed IEEE op sequence in "
    "deterministic order)",
)
def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import grouped_ewma

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return grouped_ewma(
        e, "user_id", ["ts", "event_id"], "value", alpha=0.5
    )


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


@register(
    ANALYTICS_QUERIES,
    "events_click_purchase_reconcile",
    """
    WITH clicks AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_clicks
      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    buys AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_buys
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           COALESCE(c.day, b.day) AS day,
           COALESCE(n_clicks, 0) AS n_clicks,
           COALESCE(n_buys, 0) AS n_buys
    FROM clicks c FULL OUTER JOIN buys b
      ON c.user_id = b.user_id AND c.day = b.day
    """,
    "full outer join reconciliation: per (user, day) click vs purchase "
    "counts where either side may be absent — the audit/anti-drift shape; "
    "both sides pre-aggregate so the outer join is small-small",
)
def events_click_purchase_reconcile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")

    def daily(kind: str, out: str) -> DataFrame:
        return (
            e.where(F.col("event_type") == kind)
            .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
            .agg(F.count("*").alias(out))
        )

    c, b = daily("click", "n_clicks"), daily("purchase", "n_buys")
    return (
        c.join(b, ["user_id", "day"], "full_outer")
        .select(
            "user_id",
            "day",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            F.coalesce("n_buys", F.lit(0)).alias("n_buys"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_kmv_sketch",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM events
    ),
    ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv ASC) AS rn
      FROM h
    )
    SELECT event_type,
           COUNT(*) AS sketch_size,
           MAX(hv) AS kth_min_hash,
           CASE WHEN COUNT(*) >= 32
                THEN CAST(31 AS DOUBLE) * 1152921504606846976.0
                     / CAST(MAX(hv) AS DOUBLE)
                ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
    FROM ranked WHERE rn <= 32
    GROUP BY event_type
    """,
    "KMV (bottom-k minimum values) distinct sketch per event_type: the 32 "
    "smallest 60-bit md5 hashes of user_id. MIN-mergeable (union the hash "
    "sets, keep the 32 smallest), the third mergeable-sketch family next "
    "to MAX-merge HLL and SUM-merge CMS; estimate (k-1)*2^60/kth is one "
    "division of two correctly-rounded doubles, bit-identical cross-engine",
)
def events_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k = 32
    e = load_table(spark, sf_dir, "events")
    hv = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    # distinct first so the window ranks unique hashes; both steps hash-
    # partition on event_type, so AQE coalesces them into one exchange
    dist = e.select("event_type", hv.alias("hv")).distinct()
    w = Window.partitionBy("event_type").orderBy(F.asc("hv"))
    bottom = dist.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return bottom.groupBy("event_type").agg(
        F.count("*").alias("sketch_size"),
        F.max("hv").alias("kth_min_hash"),
        F.when(
            F.count("*") >= k,
            F.lit(float(k - 1))
            * F.lit(float(2**60))
            / F.max("hv").cast("double"),
        )
        .otherwise(F.count("*").cast("double"))
        .alias("est_distinct"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_rolling_1h",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    "range-interval rolling window (time-based frame, not row-based): "
    "per-user trailing-1h event count and exact decimal sum at every "
    "event — the frame is defined by event-time distance so ties and "
    "irregular gaps behave identically across engines; one shuffle on "
    "user_id",
)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_value_histogram",
    """
    WITH b AS (
      SELECT event_type,
             CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bin_id,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, bin_id, n,
           CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
           bin_id * 50.0 AS bin_lo,
           (bin_id + 1) * 50.0 AS bin_hi
    FROM b
    """,
    "mergeable equi-width histogram sketch of event values (10 bins of "
    "width 50, top bin open): bin counts SUM-merge across shards/topics, "
    "and the running cum_n gives rank/quantile estimates without a global "
    "sort. floor() and the integer-valued bin edges are exact in both "
    "engines, so even this approximate structure oracle-checks bit-for-bit",
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    bin_id = F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9)).cast(
        "bigint"
    )
    b = e.groupBy("event_type", bin_id.alias("bin_id")).agg(
        F.count("*").alias("n")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("bin_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return b.select(
        "event_type",
        "bin_id",
        "n",
        F.sum("n").over(w).cast("bigint").alias("cum_n"),
        (F.col("bin_id") * F.lit(50.0)).alias("bin_lo"),
        ((F.col("bin_id") + 1) * F.lit(50.0)).alias("bin_hi"),
    )


@register(
    ANALYTICS_QUERIES,
    "nation_top_customer_list",
    """
    WITH ranked AS (
      SELECT n.n_name AS nation, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_name ASC) AS rn
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT nation,
           COUNT(*) AS n_top,
           string_agg(c_name, ',' ORDER BY rn) AS top_customers
    FROM ranked WHERE rn <= 5
    GROUP BY nation
    """,
    "ordered string aggregation (listagg): top-5 customers by balance per "
    "nation concatenated in rank order — collect_list is unordered in a "
    "distributed fold, so the deterministic form sorts (rank, name) structs "
    "in the array before joining; the nation dim broadcasts",
)
def nation_top_customer_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(
        F.col("c_acctbal").desc(), F.col("c_name").asc()
    )
    ranked = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_name", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )
    # collect_list gives no ordering guarantee across a distributed fold;
    # sort (rn, name) structs inside the array, then project the names.
    return ranked.groupBy("nation").agg(
        F.count("*").alias("n_top"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "c_name"))
                ),
                lambda s: s["c_name"],
            ),
            ",",
        ).alias("top_customers"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_cms_heavy_hitters",
    """
    WITH regs AS (
      SELECT r AS sketch_row,
             CAST(CAST(('0x' || substring(
                    md5(CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 64 AS BIGINT) AS sketch_col,
             COUNT(*) AS n
      FROM events
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS r FROM range(0, 4))
      GROUP BY 1, 2
    ), cells AS (
      SELECT u.user_id, r AS sketch_row,
             CAST(CAST(('0x' || substring(
                    md5(CAST(r AS VARCHAR) || ':' || CAST(u.user_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 64 AS BIGINT) AS sketch_col
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT CAST(range AS INTEGER) AS r FROM range(0, 4))
    ), est AS (
      SELECT c.user_id, MIN(g.n) AS est_count
      FROM cells c JOIN regs g
        ON c.sketch_row = g.sketch_row AND c.sketch_col = g.sketch_col
      GROUP BY c.user_id
    ), exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    )
    SELECT e.user_id, CAST(e.est_count AS BIGINT) AS est_count,
           x.exact_count
    FROM est e JOIN exact x ON e.user_id = x.user_id
    ORDER BY e.est_count DESC, e.user_id
    LIMIT 20
    """,
    "heavy hitters from the Count-Min sketch: per-key estimate = MIN over "
    "the key's 4 register cells (the classic CMS point query, always >= "
    "exact), top-20 by estimate with deterministic ties — estimates come "
    "from the registers alone, the exact count rides along to expose the "
    "overestimate; registers and probes are salted-md5, so the oracle "
    "recomputes the identical sketch",
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id")

    def cell(row_col, user_col):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col(row_col).cast("string"),
                        F.col(user_col).cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return F.pmod(h, F.lit(64))

    r4 = spark.range(4).select(F.col("id").cast("int").alias("sketch_row"))
    regs = (
        e.crossJoin(r4)
        .select("sketch_row", cell("sketch_row", "user_id").alias("sketch_col"))
        .groupBy("sketch_row", "sketch_col")
        .agg(F.count("*").alias("n"))
    )
    cells = (
        e.distinct()
        .crossJoin(r4)
        .select(
            "user_id", "sketch_row", cell("sketch_row", "user_id").alias("sketch_col")
        )
    )
    est = (
        cells.join(regs, ["sketch_row", "sketch_col"])
        .groupBy("user_id")
        .agg(F.min("n").cast("bigint").alias("est_count"))
    )
    exact = e.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    return (
        est.join(exact, "user_id")
        .orderBy(F.col("est_count").desc(), "user_id")
        .limit(20)
    )


@register(
    ANALYTICS_QUERIES,
    "events_kmv_set_ops",
    """
    WITH elems AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS elem
      FROM events WHERE event_type IN ('click', 'purchase')
    ), hashed AS (
      SELECT event_type, elem,
             CAST(('0x' || substring(md5(elem), 1, 15)) AS BIGINT) AS h
      FROM elems
    ), kmv AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM hashed
      QUALIFY rk <= 32
    ), union_sketch AS (
      SELECT * FROM (
        SELECT h, COUNT(DISTINCT event_type) AS sides,
               ROW_NUMBER() OVER (ORDER BY h) AS rk
        FROM kmv GROUP BY h
      ) WHERE rk <= 32
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
           CAST(CASE WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS DOUBLE)
                ELSE (COUNT(*) - 1) / (MAX(h) / 1152921504606846976.0)
                END AS DOUBLE) AS union_est,
           CAST(CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS jaccard_est,
           CAST((CAST(CAST(SUM(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                * (CASE WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS DOUBLE)
                   ELSE (COUNT(*) - 1) / (MAX(h) / 1152921504606846976.0) END)
                AS DOUBLE) AS intersection_est
    FROM union_sketch
    """,
    "KMV sketch set operations (Theta-sketch style): click user-days vs "
    "purchase user-days each keep their bottom-32 md5 hashes; the union "
    "sketch is the bottom-32 of the merged sketches, distinct-union is "
    "the (k-1)/h_k KMV estimator, and the intersection/Jaccard estimates "
    "come from how many union-sketch entries appear in BOTH input "
    "sketches — the mergeable set-algebra pattern sketch warehouses use; "
    "every step is deterministic md5, so the oracle is exact",
)
def events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.concat_ws(
                ":",
                F.col("user_id").cast("string"),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("elem"),
        )
        .distinct()
    )
    hashed = e.select(
        "event_type",
        F.conv(F.substring(F.md5("elem"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    wk = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        hashed.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") <= 32)
    )
    wu = Window.orderBy("h")
    union_sketch = (
        kmv.groupBy("h")
        # DISTINCT bounds sides by the number of input sketches even under
        # a (negligible, ~2^-60) cross-type 60-bit hash collision
        .agg(F.count_distinct("event_type").alias("sides"))
        .withColumn("rk", F.row_number().over(wu))
        .where(F.col("rk") <= 32)
    )
    both = F.sum(F.when(F.col("sides") == 2, 1).otherwise(0)).cast("bigint")
    # m = actual union-sketch size: when the merged sketch holds fewer
    # than k=32 hashes every element was seen, so the count is exact and
    # the (k-1)/h_k estimator would overestimate — fall back to m itself.
    m = F.count("*")
    union_est = F.when(m < 32, m.cast("double")).otherwise(
        (m - F.lit(1)) / (F.max("h") / F.lit(1152921504606846976.0))
    )
    return union_sketch.agg(
        m.cast("bigint").alias("k_used"),
        union_est.cast("double").alias("union_est"),
        (both.cast("double") / m.cast("double")).alias("jaccard_est"),
        ((both.cast("double") / m.cast("double")) * union_est)
        .cast("double")
        .alias("intersection_est"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_grouping_sets",
    """
    WITH base AS (
      SELECT event_type, date_trunc('day', ts) AS day, value FROM events)
    SELECT event_type, day,
           CAST(GROUPING(event_type, day) AS INTEGER) AS gid,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM base
    GROUP BY GROUPING SETS ((event_type), (day), ())
    """,
    "explicit GROUPING SETS with a non-cube subset — the two marginals "
    "plus the grand total, WITHOUT the (type, day) cross — something "
    "neither CUBE nor ROLLUP can express; grouping_id disambiguates "
    "aggregated-away columns from genuine NULLs, and the expand-then-"
    "aggregate plan still partial-aggregates each set map-side",
)
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # pre-project the day expression: groupingSets set-matching works on
    # plain attributes (an expression object used in both the sets list
    # and the grouping columns is treated as two distinct columns,
    # silently aggregating both away -> gid 3 everywhere)
    base = e.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
    )
    return (
        base.groupingSets(
            [[F.col("event_type")], [F.col("day")], []],
            F.col("event_type"),
            F.col("day"),
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count("*").alias("n_events"),
            _dec_sum(F.col("value"), "total_value"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_histogram_quantiles",
    """
    WITH b AS (
      SELECT event_type,
             CAST(least(floor(value / 50.0), 9) AS BIGINT) AS bin_id,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), c AS (
      SELECT event_type, bin_id, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum_n,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM b
    ), qs AS (
      SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE),
                     CAST(0.99 AS DOUBLE)]) AS q
    ), hit AS (
      SELECT c.event_type, qs.q, c.bin_id, c.n, c.cum_n, c.total,
             ROW_NUMBER() OVER (PARTITION BY c.event_type, qs.q
                                ORDER BY c.bin_id ASC) AS rn
      FROM c CROSS JOIN qs
      WHERE CAST(c.cum_n AS DOUBLE) >= qs.q * CAST(c.total AS DOUBLE)
    )
    SELECT event_type, q,
           CAST(bin_id AS DOUBLE) * 50.0
             + (q * CAST(total AS DOUBLE) - CAST(cum_n - n AS DOUBLE))
               / CAST(n AS DOUBLE) * 50.0 AS est_value
    FROM hit WHERE rn = 1
    """,
    "quantile estimation (p50/p90/p99) from the mergeable equi-width "
    "histogram registers — the sketch-family member that answers "
    "percentile queries without a global sort: registers SUM-merge "
    "across shards, the quantile is located by cumulative rank and "
    "linearly interpolated inside its bin; every arithmetic step is the "
    "same IEEE double expression in both engines, so the approximate "
    "estimator still oracle-checks bit-for-bit (exact counterpart: "
    "events_value_percentiles)",
)
def events_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    bin_id = F.least(F.floor(F.col("value") / F.lit(50.0)), F.lit(9)).cast(
        "bigint"
    )
    b = e.groupBy("event_type", bin_id.alias("bin_id")).agg(
        F.count("*").alias("n")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("bin_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    c = b.select(
        "event_type",
        "bin_id",
        "n",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n").over(w_tot).alias("total"),
    )
    hit = (
        c.crossJoin(
            F.broadcast(
                c.sparkSession.range(1).select(
                    F.explode(
                        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
                    ).alias("q")
                )
            )
        )
        .where(
            F.col("cum_n").cast("double")
            >= F.col("q") * F.col("total").cast("double")
        )
    )
    w_first = Window.partitionBy("event_type", "q").orderBy(F.asc("bin_id"))
    return (
        hit.withColumn("rn", F.row_number().over(w_first))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            "q",
            (
                F.col("bin_id").cast("double") * F.lit(50.0)
                + (
                    F.col("q") * F.col("total").cast("double")
                    - (F.col("cum_n") - F.col("n")).cast("double")
                )
                / F.col("n").cast("double")
                * F.lit(50.0)
            ).alias("est_value"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_scd2_user_state",
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    scd AS (
      SELECT user_id, event_type AS state, ts AS valid_from, event_id
      FROM changes WHERE prev IS DISTINCT FROM event_type)
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL
             AS is_current
    FROM scd
    """,
    "SCD type-2 dimension reconstruction from a change stream: collapse "
    "consecutive identical states per user (null-safe change detection), "
    "then derive [valid_from, valid_to) intervals with LEAD — the "
    "warehouse history-table pattern; one window shuffle keyed on the "
    "dimension key, deterministic (ts, event_id) ordering",
)
def events_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    scd = changes.where(
        ~F.col("prev").eqNullSafe(F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    nxt = F.lead("valid_from").over(w2)
    return scd.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_missing_hours",
    """
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events),
    spine AS (
      SELECT t.h AS expected_hour FROM bounds,
             LATERAL unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS t(h)),
    types AS (SELECT DISTINCT event_type FROM events),
    observed AS (
      SELECT DISTINCT event_type, date_trunc('hour', ts) AS h FROM events)
    SELECT ty.event_type, s.expected_hour
    FROM types ty CROSS JOIN spine s
    LEFT JOIN observed o
      ON o.event_type = ty.event_type AND o.h = s.expected_hour
    WHERE o.h IS NULL
    """,
    "time-series completeness audit via a calendar spine: generate the "
    "full hour range between the stream's bounds, cross with the type "
    "dimension, anti-join the observed hours — the standard backfill "
    "gap-detection pattern; the spine is generated (never scanned) and "
    "broadcasts against the aggregated observed set",
)
def events_missing_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("expected_hour")
    )
    types = e.select("event_type").distinct()
    observed = e.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).distinct()
    return (
        types.crossJoin(spine)
        .join(
            observed,
            (observed["event_type"] == types["event_type"])
            & (observed["h"] == F.col("expected_hour")),
            "left_anti",
        )
        .select(types["event_type"], "expected_hour")
    )


@register(
    ANALYTICS_QUERIES,
    "customer_percent_rank",
    """
    SELECT c_custkey,
           n_name AS nation,
           c_acctbal,
           percent_rank() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal, c_custkey) AS pr,
           cume_dist() OVER (PARTITION BY n_name
                             ORDER BY c_acctbal, c_custkey) AS cd
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
    "relative-standing windows: percent_rank and cume_dist of customer "
    "balances within each nation (deterministic (balance, key) ordering; "
    "both are rank arithmetic over identical orderings, so the doubles "
    "are bit-identical cross-engine) — completes the ranking-window "
    "family next to NTILE deciles and row_number top-k",
)
def customer_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("nation"), "c_acctbal")
    w = Window.partitionBy("nation").orderBy("c_acctbal", "c_custkey")
    return j.select(
        "c_custkey",
        "nation",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    ANALYTICS_QUERIES,
    "supplier_pareto_revenue",
    """
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) * 1000000 AS BIGINT) AS rev_i
      FROM lineitem GROUP BY 1),
    ranked AS (
      SELECT s_suppkey, rev_i,
             CAST(SUM(rev_i) OVER (ORDER BY rev_i DESC, s_suppkey
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_i,
             CAST(SUM(rev_i) OVER () AS BIGINT) AS tot_i,
             ROW_NUMBER() OVER (ORDER BY rev_i DESC, s_suppkey) AS rnk
      FROM rev)
    SELECT s_suppkey,
           CAST(rev_i AS DOUBLE) / 1000000 AS revenue,
           CAST(rnk AS INTEGER) AS revenue_rank,
           CAST(cum_i AS DOUBLE) / CAST(tot_i AS DOUBLE) AS cum_share,
           cum_i * 10 <= tot_i * 8 AS in_top80
    FROM ranked
    """,
    "Pareto (80/20) analysis of supplier revenue: rank by exact decimal "
    "revenue, cumulative share via integer-quantized running sums (the "
    "80% membership test is pure int64 arithmetic — no float boundary "
    "ambiguity), one IEEE division per row for the reported share",
)
def supplier_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        (
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    _DEC
                )
            )
            * F.lit(1000000)
        )
        .cast("long")
        .alias("rev_i")
    )
    w_cum = (
        Window.orderBy(F.desc("rev_i"), F.asc("s_suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    w_rnk = Window.orderBy(F.desc("rev_i"), F.asc("s_suppkey"))
    ranked = rev.select(
        "s_suppkey",
        "rev_i",
        F.sum("rev_i").over(w_cum).cast("long").alias("cum_i"),
        F.sum("rev_i").over(w_all).cast("long").alias("tot_i"),
        F.row_number().over(w_rnk).alias("rnk"),
    )
    return ranked.select(
        "s_suppkey",
        (F.col("rev_i").cast("double") / F.lit(1000000)).alias("revenue"),
        F.col("rnk").cast("int").alias("revenue_rank"),
        (F.col("cum_i").cast("double") / F.col("tot_i").cast("double")).alias(
            "cum_share"
        ),
        (F.col("cum_i") * 10 <= F.col("tot_i") * 8).alias("in_top80"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_ab_test_report",
    """
    WITH assigned AS (
      SELECT CASE WHEN CAST(('0x' || substring(
                     md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant,
             user_id, value
      FROM events WHERE event_type = 'purchase')
    SELECT variant,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
           CAST(CAST(SUM(CAST(value * 1000000 AS DECIMAL(25,6))) AS BIGINT)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000
             AS mean_value
    FROM assigned GROUP BY variant
    """,
    "A/B experiment readout: deterministic salted-md5 user-level variant "
    "assignment (the identical user always lands in the same arm — the "
    "experimentation-platform invariant), purchase-value totals and "
    "means per arm with integer-quantized exact averaging",
)
def events_ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    assigned = e.select(
        F.when(bucket == 0, "control").otherwise("treatment").alias("variant"),
        "user_id",
        "value",
    )
    return assigned.groupBy("variant").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value"), "total_value"),
        (
            F.sum((F.col("value") * 1000000).cast(_DEC))
            .cast("long")
            .cast("double")
            / F.count("*").cast("double")
            / F.lit(1000000)
        ).alias("mean_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type FROM seq
      WHERE prev_type IS NOT NULL),
    counts AS (
      SELECT prev_type, next_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
    totals AS (
      SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_from
      FROM counts GROUP BY 1)
    SELECT c.prev_type, c.next_type, c.n, t.n_from,
           CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p_transition
    FROM counts c JOIN totals t USING (prev_type)
    """,
    "first-order Markov transition matrix of user event sequences: LAG "
    "per user for consecutive pairs, then transition probabilities by "
    "row-normalized counts — behavioral-modeling staple; one user-keyed "
    "window shuffle plus a 5x5-bounded aggregate",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    totals = counts.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return counts.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        "n_from",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias(
            "p_transition"
        ),
    )


@register(
    ANALYTICS_QUERIES,
    "customer_cohort_ltv",
    """
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY 1),
    joined AS (
      SELECT f.cohort_month,
             date_diff('month', f.cohort_month,
                       date_trunc('month', o.o_orderdate)) AS months_since,
             o.o_totalprice
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey)
    SELECT cohort_month,
           CAST(months_since AS INTEGER) AS months_since,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS revenue
    FROM joined GROUP BY 1, 2
    """,
    "cohort lifetime-value matrix: customers bucketed by first-order "
    "month, revenue accumulated by months-since-acquisition — the "
    "retention/LTV triangle every growth dashboard draws; the firsts "
    "dimension partial-aggregates to customer cardinality and joins "
    "back broadcastable",
)
def customer_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "cohort_month"
        )
    )
    joined = o.join(firsts, "o_custkey").select(
        "cohort_month",
        (
            (F.year(F.date_trunc("month", F.col("o_orderdate")))
             - F.year("cohort_month")) * 12
            + (F.month(F.date_trunc("month", F.col("o_orderdate")))
               - F.month("cohort_month"))
        ).cast("int").alias("months_since"),
        "o_totalprice",
    )
    return joined.groupBy("cohort_month", "months_since").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice"), "revenue"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_dau_wau_mau",
    """
    WITH days AS (
      SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
    acts AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)
    SELECT d.day,
           COUNT(DISTINCT CASE WHEN a.day = d.day
                               THEN a.user_id END) AS dau,
           COUNT(DISTINCT CASE WHEN a.day > d.day - INTERVAL 7 DAY
                               THEN a.user_id END) AS wau,
           COUNT(DISTINCT a.user_id) AS mau,
           CAST(COUNT(DISTINCT CASE WHEN a.day = d.day
                                    THEN a.user_id END) AS DOUBLE)
             / CAST(COUNT(DISTINCT a.user_id) AS DOUBLE) AS stickiness
    FROM days d JOIN acts a
      ON a.day <= d.day AND a.day > d.day - INTERVAL 30 DAY
    GROUP BY d.day
    """,
    "activity metrics: DAU / trailing-7-day WAU / trailing-30-day MAU "
    "and DAU-over-MAU stickiness per day — computed from the (day, user) "
    "DISTINCT activity set (cardinality bounded by days x users, far "
    "smaller than the event stream) range-joined against the day spine",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    acts = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = acts.select("day").distinct().select(F.col("day").alias("d"))
    j = days.join(
        acts,
        (F.col("day") <= F.col("d"))
        & (F.col("day") > F.col("d") - F.expr("INTERVAL 30 DAY")),
    )
    dau_user = F.when(F.col("day") == F.col("d"), F.col("user_id"))
    wau_user = F.when(
        F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAY"), F.col("user_id")
    )
    return j.groupBy(F.col("d").alias("day")).agg(
        F.count_distinct(dau_user).alias("dau"),
        F.count_distinct(wau_user).alias("wau"),
        F.count_distinct("user_id").alias("mau"),
        (
            F.count_distinct(dau_user).cast("double")
            / F.count_distinct("user_id").cast("double")
        ).alias("stickiness"),
    )
