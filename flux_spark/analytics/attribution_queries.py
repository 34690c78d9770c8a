"""Marketing-analytics attribution: multi-touch revenue attribution over
the event stream.

The classic "which touchpoints caused this conversion" query family:
every purchase distributes its value across the user's preceding
view/click touch events inside a lookback window, under three standard
models computed in one pass — first-touch, last-touch, linear.
Purchases with no preceding touches are credited to a synthetic
``(direct)`` channel so revenue totals reconcile exactly across models
(each model's attributed_revenue sums to total purchase revenue — a
conservation invariant the gate hashes).

Scale shape: one equi-join on user_id (fact-fact, AQE-sized; per-user
touch history is bounded, so no skew blow-up), two window ranks + a
count over per-purchase groups, then a counts-only rollup. The linear
share is one IEEE division per row (bit-identical across engines); all
revenue sums go through the DECIMAL contract (``registry.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, _DEC, load_table, register

_MODELS = ("first_touch", "last_touch", "linear")


@register(
    ANALYTICS_QUERIES,
    "events_attribution",
    """
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts, value
      FROM events WHERE event_type = 'purchase'),
    touches AS (
      SELECT user_id, event_id AS t_id, ts AS t_ts, event_type AS touch_type
      FROM events WHERE event_type IN ('view', 'click')),
    joined AS (
      SELECT p.p_id, p.value, t.t_id, t.t_ts, t.touch_type
      FROM purchases p JOIN touches t ON p.user_id = t.user_id
      WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 3 DAY),
    ranked AS (
      SELECT p_id, value, touch_type,
        ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rf,
        ROW_NUMBER() OVER (PARTITION BY p_id
                           ORDER BY t_ts DESC, t_id DESC) AS rl,
        COUNT(*) OVER (PARTITION BY p_id) AS n_t
      FROM joined),
    shares AS (
      SELECT touch_type, 'first_touch' AS model,
             CASE WHEN rf = 1 THEN value ELSE 0.0 END AS share FROM ranked
      UNION ALL
      SELECT touch_type, 'last_touch',
             CASE WHEN rl = 1 THEN value ELSE 0.0 END FROM ranked
      UNION ALL
      SELECT touch_type, 'linear',
             value / CAST(n_t AS DOUBLE) FROM ranked
      UNION ALL
      SELECT '(direct)', m.model, p.value
      FROM purchases p
      LEFT JOIN (SELECT DISTINCT p_id FROM joined) j ON p.p_id = j.p_id
      CROSS JOIN (SELECT unnest(
        ['first_touch', 'last_touch', 'linear']) AS model) m
      WHERE j.p_id IS NULL)
    SELECT touch_type, model,
      CAST(SUM(CAST(share AS DECIMAL(25,6))) AS DOUBLE)
        AS attributed_revenue,
      CAST(SUM(CASE WHEN share > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_credits
    FROM shares GROUP BY 1, 2
    """,
    "multi-touch revenue attribution: each purchase's value is credited "
    "to the user's view/click touches in the preceding 3 days under "
    "first-touch / last-touch / linear models (deterministic ts,event_id "
    "tie-breaks); touchless purchases land in a '(direct)' channel so "
    "every model's total reconciles to total purchase revenue. One "
    "user_id equi-join + per-purchase windows + counts-only rollup.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
    )
    touches = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purchases.join(touches, "user_id").where(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
    )
    wf = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    wl = Window.partitionBy("p_id").orderBy(
        F.col("t_ts").desc(), F.col("t_id").desc()
    )
    wc = Window.partitionBy("p_id")
    ranked = joined.select(
        "p_id",
        "value",
        "touch_type",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
        F.count("*").over(wc).alias("n_t"),
    )
    # r13 (guide §2.4): the three models were a UNION of three
    # projections of `ranked`, re-executing the purchase-touch join +
    # windows once per model (plus once more for the direct anti-join:
    # 4 executions of the join subtree). One explode of the per-model
    # structs computes every share in a single pass — same rows, same
    # values, and groupBy makes union order irrelevant.
    touch_models = ranked.select(
        "touch_type",
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.when(F.col("rf") == 1, F.col("value"))
                    .otherwise(F.lit(0.0))
                    .alias("share"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.when(F.col("rl") == 1, F.col("value"))
                    .otherwise(F.lit(0.0))
                    .alias("share"),
                ),
                F.struct(
                    F.lit("linear").alias("model"),
                    (F.col("value") / F.col("n_t").cast("double")).alias(
                        "share"
                    ),
                ),
            )
        ).alias("__ms"),
    ).select("touch_type", F.col("__ms.model"), F.col("__ms.share"))
    direct = (
        purchases.join(
            joined.select("p_id").distinct(), "p_id", "left_anti"
        )
        .select(
            F.lit("(direct)").alias("touch_type"),
            F.explode(F.array(*[F.lit(m) for m in _MODELS])).alias("model"),
            F.col("value").alias("share"),
        )
    )
    shares = touch_models.unionByName(direct)
    return shares.groupBy("touch_type", "model").agg(
        F.sum(F.col("share").cast(_DEC)).cast("double").alias(
            "attributed_revenue"
        ),
        F.sum(F.when(F.col("share") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_credits"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_markov_prediction",
    """
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
        LEAD(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS next_type,
        LEAD(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS next_ts
      FROM events),
    pairs AS (
      SELECT event_type AS prev_type, next_type, next_ts
      FROM seq WHERE next_type IS NOT NULL),
    train AS (
      SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs WHERE next_ts < TIMESTAMP '2024-01-16 00:00:00'
      GROUP BY 1, 2),
    model AS (
      SELECT prev_type, next_type AS predicted_next FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY prev_type
                     ORDER BY n DESC, next_type ASC) AS rnk
        FROM train)
      WHERE rnk = 1),
    eval_ AS (
      SELECT p.prev_type, p.next_type, m.predicted_next
      FROM pairs p JOIN model m ON m.prev_type = p.prev_type
      WHERE p.next_ts >= TIMESTAMP '2024-01-16 00:00:00')
    SELECT prev_type, predicted_next,
      CAST(COUNT(*) AS BIGINT) AS n_eval,
      CAST(SUM(CASE WHEN next_type = predicted_next THEN 1 ELSE 0 END)
           AS BIGINT) AS n_correct,
      CAST(SUM(CASE WHEN next_type = predicted_next THEN 1 ELSE 0 END)
           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
    FROM eval_ GROUP BY 1, 2
    """,
    "first-order Markov next-event prediction with temporal holdout: "
    "transition counts learned on the first half of the timeline "
    "(argmax next-type per prev-type, deterministic ties), top-1 "
    "accuracy evaluated on the second half — the train-then-eval "
    "pattern of a behavioral model, all integer counts plus one IEEE "
    "division. Scale shape: per-user LEAD windows (parallel across "
    "users), the model is |types|^2 rows (broadcast), eval is one "
    "map-side join + counts-only rollup. Split timestamp is fixture-"
    "pinned (2024-01-16, the fixture midpoint); parameterize per "
    "deployment.",
)
def events_markov_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    pairs = seq.where(F.col("next_type").isNotNull()).select(
        F.col("event_type").alias("prev_type"), "next_type", "next_ts"
    )
    split = F.lit("2024-01-16 00:00:00").cast("timestamp")
    train = (
        pairs.where(F.col("next_ts") < split)
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w_m = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type").asc()
    )
    model = (
        train.withColumn("rnk", F.row_number().over(w_m))
        .where(F.col("rnk") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    ev = pairs.where(F.col("next_ts") >= split).join(
        F.broadcast(model), "prev_type"
    )
    correct = F.when(
        F.col("next_type") == F.col("predicted_next"), 1
    ).otherwise(0)
    return ev.groupBy("prev_type", "predicted_next").agg(
        F.count("*").cast("bigint").alias("n_eval"),
        F.sum(correct).cast("bigint").alias("n_correct"),
        (
            F.sum(correct).cast("double") / F.count("*").cast("double")
        ).alias("accuracy"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_path_analysis",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT user_id, event_id, ts, event_type,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts,
               event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM ordered),
    steps AS (
      SELECT user_id, session_id, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                           ORDER BY ts, event_id) AS step
      FROM sessions),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY step) AS path
      FROM steps WHERE step <= 4 GROUP BY 1, 2),
    counts AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS total FROM counts)
    SELECT path, n_sessions,
      CAST(n_sessions AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM counts CROSS JOIN tot
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    "user-journey path analysis: sessionize (30-min inactivity gaps, "
    "same windows as events_sessionize), take each session's first four "
    "event types as an ordered '>' path, rank the top-20 paths with "
    "session share. Scale shape: per-user windows (parallel across "
    "users), path rollup partial-aggregates map-side to O(|types|^4) "
    "distinct paths, top-20 is driver-sized.",
)
def events_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ordered = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            gap_us > 1800000000, 1
        )
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = ordered.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.sum("new_session").over(ws).cast("bigint").alias("session_id"),
    )
    wstep = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    steps = sessions.select(
        "user_id",
        "session_id",
        "event_type",
        F.row_number().over(wstep).alias("step"),
    ).where(F.col("step") <= 4)
    paths = steps.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("step", "event_type"))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )
    tot = counts.agg(F.sum("n_sessions").cast("bigint").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_sessions",
            (
                F.col("n_sessions").cast("double")
                / F.col("total").cast("double")
            ).alias("share"),
        )
        .orderBy(F.col("n_sessions").desc(), F.col("path"))
        .limit(20)
    )
