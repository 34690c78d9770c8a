"""Remaining TPC-H analog queries (Q2, Q7-Q9, Q11-Q13, Q15-Q17, Q19-Q22).

The warehouse schema is a TPC-H subset (FIXTURES.md): there is no partsupp
table and several columns (l_shipmode, l_commitdate, c_phone, p_container,
o_comment) are absent, so each query is an *analog* preserving the original's
operator shape — the join graph, subquery style (correlated EXISTS, scalar
subquery, HAVING over aggregate), and aggregation pattern — re-targeted at
available columns. partsupp-based supply costs are derived from lineitem
(min unit price per part-supplier pair), which keeps Q2/Q11/Q20's
"supplier inventory" semantics without inventing data.

All follow the registry's float-determinism contract: double arithmetic per
row, DECIMAL(25,6) accumulation for sums, cast back to double. Scale notes:
dimension tables (customer 150k rows/SF at most) broadcast; the only big
shuffles are fact-fact joins on l_orderkey and groupBys on high-cardinality
keys, both of which AQE sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, load_table, register

_DEC = "decimal(25,6)"


def _dec_sum(col, alias):
    return F.sum(col.cast(_DEC)).cast("double").alias(alias)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# ---------------------------------------------------------------------------


@register(
    ANALYTICS_QUERIES,
    "q2_min_cost_supplier",
    """
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, sp.cost
    FROM supply sp
    JOIN part p     ON p.p_partkey = sp.l_partkey
    JOIN supplier s ON s.s_suppkey = sp.l_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size <= 25 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND sp.cost = (
        SELECT MIN(sp2.cost) FROM supply sp2
        JOIN supplier s2 ON s2.s_suppkey = sp2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE sp2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    "TPC-H Q2 analog: min-cost supplier per part (supply cost from lineitem "
    "unit prices, partsupp being absent); correlated-min via window",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # supply cost per (part, supplier): one shuffle on (l_partkey, l_suppkey);
    # MIN of identically-computed doubles is exact and order-independent.
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        supply.join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    # the correlated scalar MIN becomes a window over the part key — no
    # second scan of lineitem, unlike the naive self-join translation.
    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    ANALYTICS_QUERIES,
    "q7_volume_shipping",
    """
    SELECT
      n1.n_name AS supp_nation,
      n2.n_name AS cust_nation,
      YEAR(l.l_shipdate) AS l_year,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """,
    "TPC-H Q7: bilateral nation-pair trade volume by year; both nation dims broadcast",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))


@register(
    ANALYTICS_QUERIES,
    "q8_market_share",
    """
    SELECT
      o_year,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_dec ELSE 0 END) AS DOUBLE)
           / CAST(SUM(volume_dec) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT
        YEAR(o.o_orderdate) AS o_year,
        CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6)) AS volume_dec,
        n2.n_name AS nation
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    "TPC-H Q8: market share of one supplier nation within a region, per year; "
    "conditional aggregation over a 7-table join",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast(_DEC).alias("volume_dec"),
            "nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume_dec")).otherwise(F.lit(0).cast(_DEC))).cast("double")
            / F.sum("volume_dec").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@register(
    ANALYTICS_QUERIES,
    "q9_product_profit",
    """
    SELECT
      n.n_name AS nation,
      YEAR(o.o_orderdate) AS o_year,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
    "TPC-H Q9 analog: profit by supplier nation and year for a part family "
    "(no ps_supplycost column -> revenue stands in for profit)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_profit"))
    )


@register(
    ANALYTICS_QUERIES,
    "q11_important_parts",
    """
    WITH natl AS (
      SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(25,6)) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
    )
    SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
    FROM natl
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE)
         > (SELECT CAST(SUM(val) AS DOUBLE) FROM natl) * 0.001
    """,
    "TPC-H Q11 analog: parts representing an outsized value share of one "
    "nation's supply (lineitem value for ps_supplycost*availqty); scalar "
    "subquery -> broadcast total",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_5")
    natl = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("l_partkey", F.col("l_extendedprice").cast(_DEC).alias("val"))
    )
    per_part = natl.groupBy("l_partkey").agg(
        F.sum("val").cast("double").alias("part_value")
    )
    total = natl.agg(F.sum("val").cast("double").alias("tot"))
    # scalar subquery -> 1-row broadcast cross join; no second lineitem scan
    # is saved here (natl is re-derived), but at scale natl would be cached.
    return per_part.join(F.broadcast(total)).where(
        F.col("part_value") > F.col("tot") * 0.001
    ).select("l_partkey", "part_value")


@register(
    ANALYTICS_QUERIES,
    "q12_priority_class",
    """
    SELECT
      l.l_linestatus,
      COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    "TPC-H Q12 analog: priority-class counts per line status (l_shipmode "
    "being absent, l_linestatus is the partitioning attribute)",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    "TPC-H Q13 analog: customer distribution by order count; left join keeps "
    "zero-order customers (filter on priority instead of absent o_comment)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    ANALYTICS_QUERIES,
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT
        l_suppkey AS supplier_no,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "TPC-H Q15: top supplier by quarterly revenue; scalar-max subquery -> "
    "1-row broadcast join (equality on identically-derived doubles is exact)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    ANALYTICS_QUERIES,
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#15'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 15, 23, 31, 40)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    "TPC-H Q16 analog: distinct supplier counts per part group (supplier-part "
    "pairs from lineitem, partsupp being absent)",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 15, 23, 31, 40)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    ANALYTICS_QUERIES,
    "q17_small_quantity_revenue",
    """
    WITH part_avg AS (
      SELECT
        l_partkey,
        0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < a.qty_threshold
    """,
    "TPC-H Q17: small-quantity order revenue below 20% of per-part average; "
    "correlated AVG -> pre-aggregated join (threshold derived via exact "
    "decimal sum / count so both engines compare identical doubles)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    part_avg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast(_DEC)).cast("double") / F.count("*"))
        ).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    ANALYTICS_QUERIES,
    "q19_discounted_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
    """,
    "TPC-H Q19: disjunctive multi-attribute predicate over a broadcast join "
    "(Catalyst extracts the common join key; OR branches stay in codegen)",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(cond)
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    ANALYTICS_QUERIES,
    "q20_part_promotion",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(25,6))) > 50
      )
    """,
    "TPC-H Q20 analog: suppliers who moved volume of a part family in a year "
    "(shipped quantity for ps_availqty); IN-subquery -> left-semi join",
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    movers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(movers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    ANALYTICS_QUERIES,
    "q21_sole_returned_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND n.n_name = 'NATION_2'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    "TPC-H Q21 analog: suppliers solely responsible for returns in "
    "multi-supplier finished orders (l_returnflag='R' standing in for the "
    "absent receipt/commit-date lateness); EXISTS/NOT EXISTS -> aggregated "
    "per-order supplier stats joined back (one lineitem shuffle, no "
    "correlated re-scans)",
)
def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    # Both EXISTS subqueries only ask about the set of (supplier, returnflag)
    # per order — precompute per-order distinct supplier counts once instead
    # of two correlated scans (classic decorrelation). Two-level aggregation
    # rather than countDistinct: the (order, supplier) pre-agg map-side
    # combines, and the plan avoids the Expand a multi-countDistinct needs.
    order_stats = (
        l.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("__has_r"))
        .groupBy(F.col("l_orderkey").alias("os_orderkey"))
        .agg(
            F.count("*").alias("n_supps"),
            F.sum("__has_r").alias("n_ret_supps"),
        )
    )
    l1 = l.where(F.col("l_returnflag") == "R")
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(order_stats, l1.l_orderkey == F.col("os_orderkey"))
        .where((F.col("n_supps") > 1) & (F.col("n_ret_supps") == 1))
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    ANALYTICS_QUERIES,
    "q22_dormant_customers",
    """
    SELECT
      n.n_name AS cntry,
      COUNT(*) AS numcust,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY n.n_name
    """,
    "TPC-H Q22 analog: wealthy-but-dormant customers per nation (no orders "
    "since 2000; nation for the absent phone country code); scalar-avg "
    "subquery + NOT EXISTS -> broadcast threshold + left-anti join",
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("2000-01-01 00:00:00")
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(_DEC)).cast("double") / F.count("*")).alias(
                "avg_bal"
            )
        )
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count("*").alias("numcust"),
            _dec_sum(F.col("c_acctbal"), "totacctbal"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "part_name_fuzzy_pairs",
    """
    WITH names AS (
      SELECT p_name, string_split(p_name, ' ')[-1] AS noun,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    "blocked fuzzy record linkage over the part catalog: collapse to "
    "DISTINCT names first (the entity-resolution move that keeps pairing "
    "off the fact table — billions of rows reduce to the distinct-name "
    "table before any quadratic work), block on the head noun, pair "
    "within blocks at edit distance <= 2 with per-name support counts. "
    "Scale shape: groupBy dedupe partial-aggregates map-side; the "
    "self-join runs on the tiny name table (broadcastable), never on "
    "parts; blocking bounds candidate pairs like the LSH band buckets.",
)
def part_name_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = (
        p.groupBy(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
        )
        .agg(F.count("*").cast("bigint").alias("n_parts"))
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            F.broadcast(b),
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("bigint")
            .alias("edit_dist"),
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "parts_skyline",
    """
    WITH lvl AS (
      SELECT p_retailprice AS price, CAST(MAX(p_size) AS BIGINT) AS pmax
      FROM part GROUP BY 1),
    run AS (
      SELECT price, pmax,
        MAX(pmax) OVER (ORDER BY price
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM lvl)
    SELECT p.p_partkey, p.p_name, p.p_retailprice, CAST(p.p_size AS BIGINT)
             AS p_size
    FROM part p JOIN run r ON p.p_retailprice = r.price
    WHERE CAST(p.p_size AS BIGINT) = r.pmax
      AND (r.prev_max IS NULL OR CAST(p.p_size AS BIGINT) > r.prev_max)
    """,
    "skyline (Pareto-front) query — parts not dominated on (cheaper "
    "price, larger size): collapse to per-price max-size levels, running "
    "max over strictly-cheaper levels, keep points beating it (ties at "
    "the same (price, size) all survive — no strict dominator). The "
    "classic multi-objective shortlist operator; O(n) after one "
    "O(distinct prices) window instead of the naive O(n^2) dominance "
    "self-join.",
)
def parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    lvl = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").cast("bigint").alias("pmax")
    )
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    run = lvl.select(
        "price", "pmax", F.max("pmax").over(w).alias("prev_max")
    )
    return (
        p.join(F.broadcast(run), p.p_retailprice == run.price)
        .where(
            (F.col("p_size").cast("bigint") == F.col("pmax"))
            & (
                F.col("prev_max").isNull()
                | (F.col("p_size").cast("bigint") > F.col("prev_max"))
            )
        )
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.col("p_size").cast("bigint").alias("p_size"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "orders_repeat_purchase_curve",
    """
    WITH seq AS (
      SELECT o_custkey,
        CAST(o_orderdate AS DATE) AS d,
        ROW_NUMBER() OVER w AS n,
        CAST(LEAD(o_orderdate) OVER w AS DATE) AS next_d
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    lvl AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS n_customers FROM seq
      WHERE n <= 6 GROUP BY n),
    gaps AS (
      SELECT n, date_diff('day', d, next_d) AS gap,
        ROW_NUMBER() OVER (PARTITION BY n
            ORDER BY date_diff('day', d, next_d), o_custkey) AS r,
        CAST(COUNT(*) OVER (PARTITION BY n) AS BIGINT) AS k
      FROM seq WHERE next_d IS NOT NULL AND n <= 5),
    med AS (
      SELECT n, CAST(MIN(CASE WHEN r = (k + 1) // 2 THEN gap END) AS BIGINT)
               AS median_gap_days
      FROM gaps GROUP BY n)
    SELECT a.n AS order_n, a.n_customers,
      COALESCE(b.n_customers, 0) AS n_converted,
      CAST(COALESCE(b.n_customers, 0) AS DOUBLE)
        / CAST(a.n_customers AS DOUBLE) AS conversion,
      m.median_gap_days
    FROM lvl a
    LEFT JOIN lvl b ON b.n = a.n + 1
    LEFT JOIN med m ON m.n = a.n
    WHERE a.n <= 5
    """,
    "repeat-purchase curve (the growth-analytics retention staircase): "
    "customers reaching their n-th order, n -> n+1 conversion rate, and "
    "the LOWER-median days between consecutive orders (rank-located "
    "integer median — no interpolation, engine-exact). One per-customer "
    "window + O(5)-row rollups; the fact table shuffles once on "
    "o_custkey.",
)
def orders_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w).alias("n"),
        F.lead("o_orderdate").over(w).cast("date").alias("next_d"),
    )
    lvl = (
        seq.where(F.col("n") <= 6)
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )
    gap = F.datediff("next_d", "d")
    wg = Window.partitionBy("n").orderBy(gap, "o_custkey")
    wk = Window.partitionBy("n")
    gaps = seq.where(F.col("next_d").isNotNull() & (F.col("n") <= 5)).select(
        "n",
        gap.alias("gap"),
        F.row_number().over(wg).alias("r"),
        F.count("*").over(wk).cast("bigint").alias("k"),
    )
    med = gaps.groupBy("n").agg(
        F.min(
            F.when(
                F.col("r") == F.floor((F.col("k") + 1) / 2), F.col("gap")
            )
        )
        .cast("bigint")
        .alias("median_gap_days")
    )
    a = lvl.alias("a")
    b = lvl.select(
        (F.col("n") - 1).alias("n"), F.col("n_customers").alias("nc_next")
    ).alias("b")
    return (
        a.where(F.col("a.n") <= 5)
        .join(b, "n", "left")
        .join(med, "n", "left")
        .select(
            F.col("n").alias("order_n"),
            "n_customers",
            F.coalesce("nc_next", F.lit(0)).alias("n_converted"),
            (
                F.coalesce("nc_next", F.lit(0)).cast("double")
                / F.col("n_customers").cast("double")
            ).alias("conversion"),
            "median_gap_days",
        )
    )
