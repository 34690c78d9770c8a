"""Event-stream analytics over the `events` table (the topic-log role): windows, sessionization, funnels, as-of joins, skew-salting, SCD2, cohort/AB reporting.

Float determinism, registry plumbing, and the shared ``_DEC``/``_dec_sum``
helpers live in ``registry.py``; every entry here follows the same
contract (see ``queries.py`` module docstring for the 100 TB themes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, _DEC, _dec_sum, load_table, register


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
    "and DAU-over-MAU stickiness per day — each (day, user) DISTINCT "
    "activity row EXPLODES into the <= 30 spine days it contributes to "
    "(a bounded-constant fan-out equi-join, never an inequality join) "
    "and membership flags pre-aggregate per (day, user) before the "
    "day-level counts",
)
def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape (sf100 ladder catch): the natural range-join form
    ``days JOIN acts ON day <= d AND day > d - 30`` has no equi-key, so
    Spark runs it as BroadcastNestedLoopJoin — O(spine_days × acts)
    comparisons, which walled at 1000× bench data (~25k spine days ×
    30M activity rows). Instead each activity row generates its 30
    target days (``sequence`` + ``explode``, constant fan-out), the
    day spine filters via a broadcast equi-join, and DAU/WAU membership
    collapses to per-(day, user) flags map-side before the day-level
    sum — one linear shuffle on (day, user), one model-sized one on
    day. Bit-identical to the range-join form (d ∈ [day, day+29] ⟺
    day <= d < day+30) with NO data assumption: NULL-user activity rows
    stay in the candidate set (the oracle's range join matches them, so
    a NULL-only window still emits a dau=0 row) and are skipped only in
    the counts, mirroring COUNT(DISTINCT ...)'s NULL-skip; the
    stickiness division is NULL-guarded to match DuckDB's 0/0 = NULL."""
    e = load_table(spark, sf_dir, "events")
    # acts keeps NULL-user activity rows (advisor r10 catch): the oracle's
    # range join matches them, so a spine day whose trailing window holds
    # ONLY NULL-user activity still emits a dau=0/mau=0 row — the NULL-skip
    # happens in the COUNTS (the when-guards below), not in the candidate
    # set. Bit-identical to the oracle with no data assumption.
    acts = e.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = acts.select("day").distinct().select(F.col("day").alias("d"))
    contrib = acts.select(
        "user_id",
        "day",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 29 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d"),
    )
    j = contrib.join(F.broadcast(days), "d")
    per_user = j.groupBy("d", "user_id").agg(
        F.max(
            F.when(F.col("day") == F.col("d"), F.lit(1)).otherwise(F.lit(0))
        ).alias("is_dau"),
        F.max(
            F.when(
                F.col("day") > F.col("d") - F.expr("INTERVAL 7 DAY"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("is_wau"),
    )
    notnull = F.col("user_id").isNotNull()
    agg = per_user.groupBy(F.col("d").alias("day")).agg(
        F.sum(F.when(notnull, F.col("is_dau")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dau"),
        F.sum(F.when(notnull, F.col("is_wau")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("wau"),
        F.sum(F.when(notnull, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("mau"),
    )
    # mau=0 (NULL-only window) -> NULL, matching DuckDB's 0/0 double = NULL
    # (Spark's unguarded double division would give NaN there)
    return agg.select(
        "day",
        "dau",
        "wau",
        "mau",
        F.when(
            F.col("mau") > 0,
            F.col("dau").cast("double") / F.col("mau").cast("double"),
        ).alias("stickiness"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_point_in_time_join",
    """
    WITH changes AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    states AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM changes WHERE prev IS DISTINCT FROM event_type),
    merged AS (
      SELECT user_id, ts, event_id, 1 AS side, state, NULL AS q_id
      FROM states
      UNION ALL
      SELECT user_id, ts, event_id, 0 AS side, NULL, event_id
      FROM events WHERE event_type = 'purchase'),
    filled AS (
      SELECT user_id, ts, q_id,
             LAST_VALUE(state IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS state_at_event
      FROM merged)
    SELECT CAST(q_id AS BIGINT) AS event_id, user_id, ts, state_at_event
    FROM filled WHERE q_id IS NOT NULL
    """,
    "point-in-time (feature-store) join (r8): each purchase event is "
    "joined to the user's SCD2 state STRICTLY BEFORE the event "
    "timestamp — the temporal-correctness primitive that prevents label "
    "leakage when assembling training examples (a feature computed at "
    "or after the label's timestamp must never be visible). Merge-scan "
    "form: states and query events union into one frame and a single "
    "last_value-ignore-nulls window over (ts, side, event_id) resolves "
    "the as-of lookup — one shuffle keyed on user_id, NO inequality "
    "join, no per-row subquery (the plan a range join would need "
    "degenerates to broadcast-nested-loop at scale)",
)
def events_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    states = changes.where(
        ~F.col("prev").eqNullSafe(F.col("event_type"))
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("q_id"),
    )
    queries = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(0).alias("side"),
        F.lit(None).cast("string").alias("state"),
        F.col("event_id").alias("q_id"),
    )
    merged = states.unionByName(queries)
    w_fill = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        merged.withColumn(
            "state_at_event",
            F.last("state", ignorenulls=True).over(w_fill),
        )
        .where(F.col("q_id").isNotNull())
        .select(
            F.col("q_id").alias("event_id"),
            "user_id",
            "ts",
            "state_at_event",
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_skew_profile",
    """
    WITH counts AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1),
    ranked AS (
      SELECT k, c,
             ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS i,
             ROW_NUMBER() OVER (ORDER BY c DESC, k ASC) AS rd
      FROM counts),
    agg AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(c) AS BIGINT) AS max_count,
             MIN(CASE WHEN rd = 1 THEN CAST(k AS VARCHAR) END) AS hottest_key,
             CAST(SUM(CASE WHEN rd <= 10 THEN c ELSE 0 END) AS BIGINT) AS top10,
             CAST(SUM(i * c) AS BIGINT) AS ic,
             quantile_cont(CAST(c AS DOUBLE), 0.5) AS p50_count,
             quantile_cont(CAST(c AS DOUBLE), 0.9) AS p90_count,
             quantile_cont(CAST(c AS DOUBLE), 0.99) AS p99_count
      FROM ranked)
    SELECT n_rows, n_keys, max_count, hottest_key,
           CAST(top10 AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top10_share,
           CAST(max_count AS DOUBLE) / CAST(n_rows AS DOUBLE) AS max_share,
           CAST(2 * ic - (n_keys + 1) * n_rows AS DOUBLE)
             / CAST(n_keys * n_rows AS DOUBLE) AS gini,
           CAST(max_count AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(n_rows AS DOUBLE) AS skew_ratio,
           CAST(least(32, greatest(1,
             ceil(CAST(max_count AS DOUBLE) * CAST(n_keys AS DOUBLE)
                  / CAST(n_rows AS DOUBLE)))) AS INTEGER) AS suggested_salt,
           p50_count, p90_count, p99_count
    FROM agg
    """,
    "key-skew diagnostics for the user_id grouping key: hottest key, "
    "top-10 share, exact integer-identity Gini, count percentiles, and a "
    "suggested salt factor — the read-before-you-shuffle report that "
    "decides plain groupBy vs salted_agg vs broadcast; fact table "
    "scanned once, everything after is O(distinct keys)",
)
def events_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import skew_profile

    e = load_table(spark, sf_dir, "events")
    return skew_profile(e, "user_id")


@register(
    ANALYTICS_QUERIES,
    "events_seasonal_anomaly",
    """
    WITH c AS (
      SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2, 3),
    spine AS (
      SELECT t.event_type, d.day, h.hr
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events) d
      CROSS JOIN (SELECT CAST(range AS BIGINT) AS hr FROM range(0, 24)) h),
    full_c AS (
      SELECT s.event_type, s.day, s.hr,
             COALESCE(c.n_events, 0) AS n_events
      FROM spine s LEFT JOIN c
        ON c.event_type = s.event_type AND c.day = s.day AND c.hr = s.hr),
    stats AS (
      SELECT event_type, hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_events) AS BIGINT) AS s,
             CAST(SUM(n_events * n_events) AS BIGINT) AS q
      FROM full_c GROUP BY 1, 2)
    SELECT f.event_type, f.day, CAST(f.hr AS INT) AS hr, f.n_events,
           CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE) AS baseline_mean,
           CASE WHEN t.n * t.q - t.s * t.s = 0 THEN NULL
                ELSE CAST(f.n_events * t.n - t.s AS DOUBLE)
                     / sqrt(CAST(t.n * t.q - t.s * t.s AS DOUBLE)) END
             AS zscore,
           (f.n_events * t.n - t.s) * (f.n_events * t.n - t.s)
             > 9 * (t.n * t.q - t.s * t.s) AS is_anomaly
    FROM full_c f JOIN stats t
      ON t.event_type = f.event_type AND t.hr = f.hr
    """,
    "seasonal (hour-of-day) anomaly detection: per (event_type, hour) "
    "baseline over a full day-spine (absent hours count as zero, not "
    "dropped), anomaly iff (c*n - S)^2 > 9*(n*Q - S^2) — the 3-sigma "
    "rule in EXACT integer arithmetic so the boolean is engine-exact "
    "even at variance boundaries; zero-variance buckets flag any "
    "deviation and carry NULL zscore. One map-side count agg + an "
    "O(types x 24) stats table; the fact stream is never re-shuffled",
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # r13 (guide §2.4): one corpus scan instead of three — the
    # (type, day, hr) count table is grid-sized, so checkpoint it once
    # and derive the spine's distinct types/days FROM it (an observed
    # (type,day) pair always has a counted row, so the distinct sets
    # are identical to scanning events again). `full` (spine-sized) is
    # checkpointed too: it feeds both the per-(type,hr) baseline stats
    # and the final z-score join.
    c = (
        e.groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").alias("hr"),
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .localCheckpoint(eager=True)
    )
    spine = (
        c.select("event_type").distinct()
        .crossJoin(c.select("day").distinct())
        .crossJoin(spark.range(24).select(F.col("id").alias("hr")))
    )
    full = (
        spine.join(c, ["event_type", "day", "hr"], "left")
        .fillna(0, subset=["n_events"])
        .localCheckpoint(eager=True)
    )
    stats = full.groupBy("event_type", "hr").agg(
        F.count("*").cast("bigint").alias("__n"),
        F.sum("n_events").cast("bigint").alias("__s"),
        F.sum(F.col("n_events") * F.col("n_events"))
        .cast("bigint")
        .alias("__q"),
    )
    j = full.join(stats, ["event_type", "hr"])
    dev = F.col("n_events") * F.col("__n") - F.col("__s")
    varn = F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    return j.select(
        "event_type",
        "day",
        F.col("hr").cast("int").alias("hr"),
        "n_events",
        (F.col("__s").cast("double") / F.col("__n").cast("double")).alias(
            "baseline_mean"
        ),
        F.when(varn == 0, F.lit(None).cast("double"))
        .otherwise(dev.cast("double") / F.sqrt(varn.cast("double")))
        .alias("zscore"),
        (dev * dev > F.lit(9) * varn).alias("is_anomaly"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_bot_regularity",
    """
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events),
    gaps AS (
      SELECT user_id, us - prev_us AS g
      FROM ordered WHERE prev_us IS NOT NULL),
    agg AS (
      SELECT user_id,
        CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(CAST(g AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg,
        CAST(SUM(CAST(g AS DECIMAL(38,0)) * g) AS DECIMAL(38,0)) AS sg2
      FROM gaps GROUP BY user_id)
    SELECT user_id, k AS n_gaps,
      CAST(sg AS DOUBLE) / CAST(k AS DOUBLE) AS mean_gap_us,
      CAST(k * sg2 - sg * sg AS DOUBLE) / CAST(sg * sg AS DOUBLE) AS cv2,
      k >= 5 AND sg > 0
        AND CAST(k * sg2 - sg * sg AS DOUBLE) / CAST(sg * sg AS DOUBLE)
            < 0.1
        AS is_bot_like
    FROM agg
    WHERE sg > 0
    """,
    "bot/automation detection by inter-event cadence regularity: per "
    "user, the squared coefficient of variation of inter-event gaps — "
    "cv² = (k·Σg² − (Σg)²)/(Σg)², the scale-free regularity measure "
    "(humans are bursty, cv² ≳ 1; schedulers fire near-constant gaps, "
    "cv² ≈ 0). The numerator/denominator are exact DECIMAL(38,0) "
    "integer cross-products of microsecond gaps, so the statistic is "
    "ONE double division and oracle-checks exactly. Scale shape: the "
    "lag window sorts inside the per-user hash partition (one shuffle "
    "of (user, ts) pairs), then the moment sums partial-aggregate "
    "map-side — no join, state is 3 numbers per user",
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = "decimal(38,0)"
    gaps = (
        e.select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
        )
        .where(F.col("prev_us").isNotNull())
        .select("user_id", (F.col("us") - F.col("prev_us")).alias("g"))
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum(F.col("g").cast(dec)).cast(dec).alias("sg"),
        F.sum(F.col("g").cast(dec) * F.col("g")).cast(dec).alias("sg2"),
    )
    num = F.col("k") * F.col("sg2") - F.col("sg") * F.col("sg")
    den = F.col("sg") * F.col("sg")
    cv2 = num.cast("double") / den.cast("double")
    return agg.where(F.col("sg") > 0).select(
        "user_id",
        F.col("k").alias("n_gaps"),
        (F.col("sg").cast("double") / F.col("k").cast("double")).alias(
            "mean_gap_us"
        ),
        cv2.alias("cv2"),
        ((F.col("k") >= 5) & (F.col("sg") > 0) & (cv2 < 0.1)).alias(
            "is_bot_like"
        ),
    )


def _hilbert_sql(n_bits: int = 10) -> str:
    from .operators import hilbert_stage_exprs

    ctes = [
        "h0 AS (SELECT event_id,"
        " CAST(user_id % 1024 AS BIGINT) AS x0,"
        " CAST(event_id % 1024 AS BIGINT) AS y0,"
        " CAST(user_id % 1024 AS BIGINT) AS x,"
        " CAST(event_id % 1024 AS BIGINT) AS y,"
        " CAST(0 AS BIGINT) AS d FROM events)"
    ]
    for i, (d_e, x_e, y_e) in enumerate(hilbert_stage_exprs(n_bits, "//")):
        ctes.append(
            f"h{i + 1} AS (SELECT event_id, x0, y0,"
            f" CAST({d_e} AS BIGINT) AS d,"
            f" CAST({x_e} AS BIGINT) AS x,"
            f" CAST({y_e} AS BIGINT) AS y FROM h{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT event_id, x0 AS x, y0 AS y, d AS hilbert"
        f" FROM h{n_bits}"
    )


@register(
    ANALYTICS_QUERIES,
    "events_hilbert_layout",
    _hilbert_sql(),
    "Hilbert-curve layout key for (user bucket, event bucket) on the "
    "1024x1024 grid — the locality-preserving upgrade of "
    "events_zorder_layout: consecutive Hilbert ranks are always grid-"
    "ADJACENT (no Morton quadrant jumps), so files sorted by this key "
    "hold tighter rowgroup min/max ranges on BOTH dimensions (the "
    "OPTIMIZE ... HILBERT option in modern lakehouses). The iterative "
    "xy2d bit fold unrolls into 10 chained integer-CASE projections — "
    "pure whole-stage codegen, no UDF/shuffle/join; the oracle runs the "
    "SAME generated stage expressions as chained CTEs",
)
def events_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators import hilbert_value

    e = load_table(spark, sf_dir, "events").selectExpr(
        "event_id",
        "CAST(user_id % 1024 AS BIGINT) AS ux",
        "CAST(event_id % 1024 AS BIGINT) AS uy",
    )
    return hilbert_value(e, "ux", "uy", n_bits=10).select(
        "event_id",
        F.col("ux").alias("x"),
        F.col("uy").alias("y"),
        F.col("hilbert"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_json_schema_infer",
    r"""
    WITH base AS (
      SELECT event_type, json_extract_string(props, '$.k') AS kv, props
      FROM events),
    aug AS (
      SELECT event_type,
        CASE WHEN event_type = 'purchase'
             THEN '{"k": ' || kv || ', "amount": ' || kv
                  || '.5, "currency": "usd"}'
             WHEN event_type = 'error'
             THEN '{"k": ' || kv || ', "code": "E'
                  || CAST(CAST(kv AS BIGINT) % 7 AS VARCHAR) || '"}'
             ELSE props END AS j
      FROM base),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM aug GROUP BY 1),
    kvs AS (
      SELECT a.event_type, t.pk,
             json_extract_string(a.j, '$.' || t.pk) AS v
      FROM aug a, unnest(json_keys(a.j)) AS t(pk)),
    agg AS (
      SELECT event_type, pk,
        CAST(COUNT(*) AS BIGINT) AS n_present,
        CAST(SUM(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
        CAST(SUM(CASE WHEN regexp_matches(v, '^-?[0-9]+(\.[0-9]+)?$')
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_num
      FROM kvs GROUP BY 1, 2)
    SELECT a.event_type, a.pk AS prop_key, a.n_present,
      CAST(a.n_present AS DOUBLE) / CAST(t.n_rows AS DOUBLE)
        AS frac_present,
      CASE WHEN a.n_int = a.n_present THEN 'bigint'
           WHEN a.n_num = a.n_present THEN 'double'
           ELSE 'varchar' END AS inferred_type
    FROM agg a JOIN tot t USING (event_type)
    """,
    "semi-structured schema inference over the JSON props column — the "
    "discovery pass every ingestion pipeline runs on a new event feed: "
    "per (event_type, key), presence count, presence fraction, and the "
    "inferred column type by unanimous type vote (bigint if every value "
    "is integral, double if every value is numeric, else varchar). The "
    "gate widens the feed deterministically in BOTH engines (purchase "
    "rows gain amount/currency, error rows gain a code) so the inferred "
    "schema is non-trivial and value-exact. Scale shape: the key "
    "explode partial-aggregates map-side to O(types x keys) rows — "
    "state is four counters per (type, key), never per row",
)
def events_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "props")
    kv = F.get_json_object("props", "$.k")
    aug = e.select(
        "event_type",
        F.when(
            F.col("event_type") == "purchase",
            F.concat(
                F.lit('{"k": '),
                kv,
                F.lit(', "amount": '),
                kv,
                F.lit('.5, "currency": "usd"}'),
            ),
        )
        .when(
            F.col("event_type") == "error",
            F.concat(
                F.lit('{"k": '),
                kv,
                F.lit(', "code": "E'),
                (kv.cast("bigint") % 7).cast("string"),
                F.lit('"}'),
            ),
        )
        .otherwise(F.col("props"))
        .alias("j"),
    )
    tot = aug.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    kvs = aug.select(
        "event_type",
        F.explode(F.from_json("j", "map<string,string>")).alias("pk", "v"),
    )
    is_int = F.when(F.col("v").rlike("^-?[0-9]+$"), 1).otherwise(0)
    is_num = F.when(
        F.col("v").rlike(r"^-?[0-9]+(\.[0-9]+)?$"), 1
    ).otherwise(0)
    agg = kvs.groupBy("event_type", "pk").agg(
        F.count("*").cast("bigint").alias("n_present"),
        F.sum(is_int).cast("bigint").alias("n_int"),
        F.sum(is_num).cast("bigint").alias("n_num"),
    )
    return agg.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("pk").alias("prop_key"),
        "n_present",
        (
            F.col("n_present").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("frac_present"),
        F.when(F.col("n_int") == F.col("n_present"), F.lit("bigint"))
        .when(F.col("n_num") == F.col("n_present"), F.lit("double"))
        .otherwise(F.lit("varchar"))
        .alias("inferred_type"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_ab_srm_check",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    assigned AS (
      SELECT CASE WHEN CAST(('0x' || substring(
                     md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 = 0
                  THEN 1 ELSE 0 END AS is_control
      FROM users),
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(is_control) AS BIGINT) AS n_control,
        CAST(COUNT(*) - SUM(is_control) AS BIGINT) AS n_treatment
      FROM assigned)
    SELECT n_users, n_control, n_treatment,
      CAST((n_control - n_treatment) * (n_control - n_treatment) AS DOUBLE)
        / CAST(n_users AS DOUBLE) AS chi_square,
      CAST((n_control - n_treatment) * (n_control - n_treatment) AS DOUBLE)
        / CAST(n_users AS DOUBLE) > 3.841 AS srm_detected
    FROM counts
    """,
    "sample-ratio-mismatch guardrail for the exp1 assignment: chi-square "
    "goodness-of-fit vs the expected 50/50 split — for two equal-"
    "expected cells it reduces to (n_c - n_t)^2 / n, one IEEE division "
    "of exact integers; srm_detected compares against the df=1 95% "
    "critical value 3.841. The experimentation-platform health check "
    "that must pass before any readout is trusted. One distinct-users "
    "pass, 1-row output.",
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id").distinct()
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
        F.when(bucket == 0, 1).otherwise(0).alias("is_control")
    )
    counts = assigned.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("is_control").cast("bigint").alias("n_control"),
        (F.count("*") - F.sum("is_control")).cast("bigint").alias(
            "n_treatment"
        ),
    )
    diff = F.col("n_control") - F.col("n_treatment")
    chi = (diff * diff).cast("double") / F.col("n_users").cast("double")
    return counts.select(
        "n_users",
        "n_control",
        "n_treatment",
        chi.alias("chi_square"),
        (chi > 3.841).alias("srm_detected"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_window_funnel",
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    l1 AS (SELECT DISTINCT user_id FROM v),
    l2 AS (
      SELECT DISTINCT v.user_id
      FROM v JOIN c ON c.user_id = v.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR),
    l3 AS (
      SELECT DISTINCT v.user_id
      FROM v
      JOIN c ON c.user_id = v.user_id
       AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
      JOIN p ON p.user_id = v.user_id
       AND p.ts > c.ts AND p.ts <= v.ts + INTERVAL 24 HOUR),
    lvl AS (
      SELECT u.user_id,
        CASE WHEN l3.user_id IS NOT NULL THEN 3
             WHEN l2.user_id IS NOT NULL THEN 2
             WHEN l1.user_id IS NOT NULL THEN 1
             ELSE 0 END AS level
      FROM users u
      LEFT JOIN l1 ON l1.user_id = u.user_id
      LEFT JOIN l2 ON l2.user_id = u.user_id
      LEFT JOIN l3 ON l3.user_id = u.user_id)
    SELECT CAST(level AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM lvl GROUP BY level
    """,
    "strict windowed funnel (ClickHouse windowFunnel semantics, distinct "
    "from events_funnel's unbounded min-chase): the max view -> click -> "
    "purchase chain ANCHORED inside a 24 h window of the first step, any "
    "anchor view counts; per-user level histogram. Scale shape: the "
    "chain joins are per-user equi-joins (user event counts are bounded, "
    "so the within-user time cross-check never goes quadratic in the "
    "corpus); output is O(steps) rows.",
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    w24 = F.expr("INTERVAL 24 HOURS")

    def typed(t):
        return e.where(F.col("event_type") == t).select("user_id", "ts")

    v, c, p = typed("view"), typed("click"), typed("purchase")
    va, ca, pa = v.alias("v"), c.alias("c"), p.alias("p")
    l1 = v.select("user_id").distinct().withColumn("l1", F.lit(1))
    l2 = (
        va.join(
            ca,
            (F.col("c.user_id") == F.col("v.user_id"))
            & (F.col("c.ts") > F.col("v.ts"))
            & (F.col("c.ts") <= F.col("v.ts") + w24),
        )
        .select(F.col("v.user_id").alias("user_id"))
        .distinct()
        .withColumn("l2", F.lit(1))
    )
    l3 = (
        va.join(
            ca,
            (F.col("c.user_id") == F.col("v.user_id"))
            & (F.col("c.ts") > F.col("v.ts"))
            & (F.col("c.ts") <= F.col("v.ts") + w24),
        )
        .join(
            pa,
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("p.ts") > F.col("c.ts"))
            & (F.col("p.ts") <= F.col("v.ts") + w24),
        )
        .select(F.col("v.user_id").alias("user_id"))
        .distinct()
        .withColumn("l3", F.lit(1))
    )
    lvl = (
        users.join(l1, "user_id", "left")
        .join(l2, "user_id", "left")
        .join(l3, "user_id", "left")
        .select(
            F.when(F.col("l3").isNotNull(), 3)
            .when(F.col("l2").isNotNull(), 2)
            .when(F.col("l1").isNotNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("level")
        )
    )
    return lvl.groupBy("level").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
