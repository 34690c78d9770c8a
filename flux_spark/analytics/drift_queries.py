"""Distribution-drift detection and interval-overlap joins over `events`.

Two late-round-8 operators a production data pipeline runs continuously:

* ``events_distribution_drift`` — exact two-sample drift report (KS
  statistic + total-variation distance) between the early and late half
  of the stream, per event_type. This is the batch form of the "did my
  feature distribution move?" check that gates model retraining.
* ``events_interval_overlap_join`` — a range/interval join (events whose
  timestamp falls inside another user's session window) executed as a
  bucketed EQUI-join, the strategy that survives 100 TB where a naive
  range predicate degenerates into BroadcastNestedLoopJoin.

Both follow the registry float-determinism contract (``registry.py``):
integer counts and IEEE double division only — no transcendental
functions, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import ANALYTICS_QUERIES, load_table, register


@register(
    ANALYTICS_QUERIES,
    "events_distribution_drift",
    """
    WITH bounds AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us
      FROM events
    ),
    flagged AS (
      SELECT event_type, value,
             CASE WHEN epoch_us(ts) > (SELECT mid_us FROM bounds)
                  THEN 1 ELSE 0 END AS is_late
      FROM events
    ),
    per_value AS (
      SELECT event_type, value,
             CAST(SUM(1 - is_late) AS BIGINT) AS cnt_a,
             CAST(SUM(is_late) AS BIGINT) AS cnt_b
      FROM flagged
      GROUP BY event_type, value
    ),
    cum AS (
      SELECT event_type, value, cnt_a, cnt_b,
        CAST(SUM(cnt_a) OVER w AS BIGINT) AS cum_a,
        CAST(SUM(cnt_b) OVER w AS BIGINT) AS cum_b,
        CAST(SUM(cnt_a) OVER t AS BIGINT) AS n_a,
        CAST(SUM(cnt_b) OVER t AS BIGINT) AS n_b
      FROM per_value
      WINDOW
        w AS (PARTITION BY event_type ORDER BY value
              ROWS UNBOUNDED PRECEDING),
        t AS (PARTITION BY event_type)
    )
    SELECT
      event_type,
      MAX(n_a) AS n_a,
      MAX(n_b) AS n_b,
      CAST(MAX(ABS(CAST(cum_a AS DECIMAL(38,0)) * n_b
                   - CAST(cum_b AS DECIMAL(38,0)) * n_a)) AS DOUBLE)
        / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)) AS ks_stat,
      0.5 * CAST(SUM(ABS(CAST(cnt_a AS DECIMAL(38,0)) * n_b
                         - CAST(cnt_b AS DECIMAL(38,0)) * n_a)) AS DOUBLE)
        / (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE)) AS tvd
    FROM cum
    GROUP BY event_type
    """,
    "exact two-sample drift per event_type: split the stream at the "
    "midpoint timestamp, then Kolmogorov-Smirnov statistic "
    "(max |CDF_early - CDF_late|) and total-variation distance over the "
    "`value` distribution. Scale shape: one groupBy(event_type, value) "
    "map-side-combines the raw stream down to distinct values; the "
    "window sort then ranks only O(distinct values) rows per type — the "
    "same partial-aggregate-then-rank shape as the skew profiler. No "
    "transcendentals (KS/TVD are counts + IEEE division), so the gate "
    "is value-hash exact, unlike PSI whose ln() would diverge in ULPs "
    "between engines.",
)
def events_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value", "ts")
    # midpoint of the observed time range: two scalar aggregates, broadcast
    # back as a literal-sized 1-row frame (integer floor-div is exact)
    mid = e.agg(
        (
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
            / F.lit(2)
        )
        .cast("bigint")
        .alias("mid_us")
    )
    flagged = e.crossJoin(F.broadcast(mid)).select(
        "event_type",
        "value",
        F.when(F.unix_micros("ts") > F.col("mid_us"), 1)
        .otherwise(0)
        .alias("is_late"),
    )
    per_value = flagged.groupBy("event_type", "value").agg(
        F.sum(F.lit(1) - F.col("is_late")).cast("bigint").alias("cnt_a"),
        F.sum("is_late").cast("bigint").alias("cnt_b"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = Window.partitionBy("event_type")
    cum = per_value.select(
        "event_type",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w).cast("bigint").alias("cum_a"),
        F.sum("cnt_b").over(w).cast("bigint").alias("cum_b"),
        F.sum("cnt_a").over(t).cast("bigint").alias("n_a"),
        F.sum("cnt_b").over(t).cast("bigint").alias("n_b"),
    )
    # float-determinism: the numerators are EXACT integer cross-products
    # (|cum_a*n_b - cum_b*n_a| in DECIMAL(38,0) so 1e13-row halves can't
    # overflow); max/sum over integers is order-independent, and the one
    # double division at the end rounds identically in both engines. A
    # naive SUM(ABS(p_a - p_b)) of doubles would be summation-order
    # nondeterministic and fail the value hash.
    dec = "decimal(38,0)"
    ks_num = F.abs(
        F.col("cum_a").cast(dec) * F.col("n_b")
        - F.col("cum_b").cast(dec) * F.col("n_a")
    )
    tvd_num = F.abs(
        F.col("cnt_a").cast(dec) * F.col("n_b")
        - F.col("cnt_b").cast(dec) * F.col("n_a")
    )
    denom = F.max("n_a").cast("double") * F.max("n_b").cast("double")
    return cum.groupBy("event_type").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        (F.max(ks_num).cast("double") / denom).alias("ks_stat"),
        (F.lit(0.5) * F.sum(tvd_num).cast("double") / denom).alias("tvd"),
    )


# interval-join bucket width: 1 hour. Sessions are gap-30-min so they are
# short; a session spans ~1-3 buckets and each probe event lives in
# exactly ONE bucket, so the equi-join on bucket produces each
# (session, event) candidate exactly once — no post-join dedup needed.
_BUCKET_US = 3_600_000_000


@register(
    ANALYTICS_QUERIES,
    "events_interval_overlap_join",
    """
    WITH ordered AS (
      SELECT user_id, event_id, ts,
        CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
               OR LAG(ts) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, event_id, ts,
        CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS session_id
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, session_id,
        COUNT(*) AS n_events,
        epoch_us(MIN(ts)) AS start_us,
        epoch_us(MAX(ts)) AS end_us
      FROM tagged
      GROUP BY user_id, session_id
      HAVING COUNT(*) >= 3
    ),
    hits AS (
      SELECT s.user_id, s.session_id,
        COUNT(*) AS n_overlap,
        COUNT(DISTINCT e.user_id) AS n_other_users
      FROM sessions s
      JOIN events e
        ON epoch_us(e.ts) BETWEEN s.start_us AND s.end_us
       AND e.user_id <> s.user_id
      GROUP BY s.user_id, s.session_id
    )
    SELECT
      s.user_id, s.session_id, s.n_events,
      s.end_us - s.start_us AS duration_us,
      COALESCE(h.n_overlap, 0) AS n_overlap,
      COALESCE(h.n_other_users, 0) AS n_other_users
    FROM sessions s
    LEFT JOIN hits h
      ON s.user_id = h.user_id AND s.session_id = h.session_id
    """,
    "interval-overlap join: for every heavy session (>=3 events), count "
    "how many events from OTHER users fall inside its [start, end] time "
    "window (concurrency audit / interference detection). The oracle "
    "states it as the natural range-predicate join (DuckDB IEJoin); the "
    "engine refuses that plan — a ts-range theta-join in Spark "
    "degenerates to BroadcastNestedLoopJoin, O(sessions x events) at "
    "scale — and instead buckets time into 1 h cells: sessions explode "
    "to the few cells they span (sequence + explode), probes map to "
    "exactly one cell, and the join becomes a shuffle EQUI-join on the "
    "cell key followed by the exact range filter. Each candidate pair "
    "appears once (probe cell is unique), so no dedup pass. "
    "Plan-asserted: tests/test_plans.py rejects nested-loop joins here.",
)
def events_interval_overlap_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 30 * 60 * 1_000_000
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > gap_us
        ),
        1,
    ).otherwise(0)
    sessions = (
        e.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
        )
        .where(F.col("n_events") >= 3)
    )
    # sessions fan out to the hour-cells they span (short sessions -> 1-3
    # rows each); probe events land in exactly one cell
    s_cells = sessions.select(
        F.col("user_id").alias("s_user"),
        "session_id",
        "start_us",
        "end_us",
        F.explode(
            F.sequence(
                (F.col("start_us") / F.lit(_BUCKET_US)).cast("bigint"),
                (F.col("end_us") / F.lit(_BUCKET_US)).cast("bigint"),
            )
        ).alias("cell"),
    )
    probes = e.select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") / F.lit(_BUCKET_US)).cast("bigint").alias(
            "cell"
        ),
    )
    hits = (
        s_cells.join(probes, "cell")
        .where(
            (F.col("e_user") != F.col("s_user"))
            & F.col("ts_us").between(F.col("start_us"), F.col("end_us"))
        )
        .groupBy(
            "s_user", F.col("session_id").alias("h_session_id")
        )
        .agg(
            F.count("*").alias("n_overlap"),
            F.countDistinct("e_user").alias("n_other_users"),
        )
    )
    return (
        sessions.join(
            hits,
            (sessions.user_id == hits.s_user)
            & (sessions.session_id == hits.h_session_id),
            "left",
        )
        .select(
            sessions.user_id,
            sessions.session_id,
            "n_events",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce("n_other_users", F.lit(0)).alias("n_other_users"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_cdc_merge",
    """
    WITH bounds AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid_us
      FROM events
    ),
    base AS (
      SELECT user_id, value AS base_value, n_base FROM (
        SELECT user_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS r,
          COUNT(*) OVER (PARTITION BY user_id) AS n_base
        FROM events
        WHERE epoch_us(ts) <= (SELECT mid_us FROM bounds))
      WHERE r = 1
    ),
    chg AS (
      SELECT user_id,
        CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        value AS new_value, n_late
      FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS r,
          COUNT(*) OVER (PARTITION BY user_id) AS n_late
        FROM events
        WHERE epoch_us(ts) > (SELECT mid_us FROM bounds))
      WHERE r = 1
    )
    SELECT
      COALESCE(b.user_id, c.user_id) AS user_id,
      CASE WHEN c.user_id IS NULL THEN 'kept'
           WHEN b.user_id IS NULL THEN 'inserted'
           ELSE 'updated' END AS action,
      CASE WHEN c.user_id IS NULL THEN b.base_value
           ELSE c.new_value END AS value,
      COALESCE(b.n_base, 0) + COALESCE(c.n_late, 0) AS version
    FROM base b
    FULL OUTER JOIN chg c ON b.user_id = c.user_id
    WHERE COALESCE(c.op, '') <> 'D'
    """,
    "lakehouse MERGE (upsert + delete): the early half of the stream "
    "snapshots per-user state (latest value + version count); the late "
    "half becomes a CDC changeset (latest late event per user; "
    "event_type = 'error' interpreted as DELETE, anything else UPSERT). "
    "One full-outer join on the key applies inserts, updates, deletes "
    "and keeps untouched rows, tagging each with its action. Scale "
    "shape: both sides reduce to one row per key via window-rank "
    "(map-side partial for the counts), then a single key-hash shuffle "
    "join — the exact MERGE INTO plan Delta/Iceberg run; skewed keys "
    "fall to AQE skew-join handling.",
)
def events_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    mid = e.agg(
        (
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts")))
            / F.lit(2)
        )
        .cast("bigint")
        .alias("mid_us")
    )
    tagged = e.crossJoin(F.broadcast(mid))
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    t = Window.partitionBy("user_id")

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("r", F.row_number().over(w))
            .withColumn("n", F.count("*").over(t))
            .where(F.col("r") == 1)
        )

    base = latest(
        tagged.where(F.unix_micros("ts") <= F.col("mid_us"))
    ).select(
        F.col("user_id").alias("b_user"),
        F.col("value").alias("base_value"),
        F.col("n").alias("n_base"),
    )
    chg = latest(tagged.where(F.unix_micros("ts") > F.col("mid_us"))).select(
        F.col("user_id").alias("c_user"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("value").alias("new_value"),
        F.col("n").alias("n_late"),
    )
    merged = base.join(
        chg, base.b_user == chg.c_user, "full_outer"
    ).where(F.coalesce(F.col("op"), F.lit("")) != F.lit("D"))
    return merged.select(
        F.coalesce("b_user", "c_user").alias("user_id"),
        F.when(F.col("c_user").isNull(), F.lit("kept"))
        .when(F.col("b_user").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
        F.when(F.col("c_user").isNull(), F.col("base_value"))
        .otherwise(F.col("new_value"))
        .alias("value"),
        (
            F.coalesce("n_base", F.lit(0)) + F.coalesce("n_late", F.lit(0))
        ).alias("version"),
    )


@register(
    ANALYTICS_QUERIES,
    "stream_cdc_apply",
    """
    WITH ranked AS (
      SELECT user_id, event_id, value,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS r,
        COUNT(*) OVER (PARTITION BY user_id) AS version
      FROM events)
    SELECT user_id, value, version, event_id AS last_event_id
    FROM ranked WHERE r = 1
    """,
    "streaming upsert sink (the Delta/Iceberg `foreachBatch` MERGE "
    "pattern): the stream arrives as two file-source microbatches "
    "(maxFilesPerTrigger=1 over the time-split halves); each batch "
    "reduces to one row per key, then merges into the running state "
    "table with a LAST-WRITER-BY-EVENT-TIME rule — max (ts, event_id) "
    "wins, version counts accumulate — so the final state is "
    "independent of microbatch boundaries and replay order (the "
    "idempotence a crash-recovering sink needs; the oracle states it as "
    "the batch latest-per-key, which sequential application must equal "
    "exactly). State localCheckpoints per batch: lineage stays one "
    "batch deep, never the whole stream's.",
)
def stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    mid = e.agg(
        ((F.min("ts_us") + F.max("ts_us")) / F.lit(2))
        .cast("bigint")
        .alias("m")
    ).collect()[0]["m"]
    root = tempfile.mkdtemp(prefix="flux-cdcstream-")
    indir, ck = f"{root}/in", f"{root}/ck"
    os.makedirs(indir)
    try:
        # two deterministic microbatches: one file per time half, mtimes
        # forced so the file source's oldest-first order is stable (the
        # merge rule makes the RESULT order-independent anyway)
        for i, half in enumerate(
            (e.where(F.col("ts_us") <= mid), e.where(F.col("ts_us") > mid))
        ):
            stage = f"{root}/stage{i}"
            half.coalesce(1).write.mode("overwrite").parquet(stage)
            part = next(
                f for f in os.listdir(stage) if f.endswith(".parquet")
            )
            dst = f"{indir}/batch-{i}.parquet"
            shutil.move(f"{stage}/{part}", dst)
            os.utime(dst, (1000 + i, 1000 + i))
        state = {"df": None}
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        t = Window.partitionBy("user_id")

        def apply_batch(batch_df, batch_id):
            inc = (
                batch_df.withColumn("r", F.row_number().over(w))
                .withColumn("n", F.count("*").over(t))
                .where(F.col("r") == 1)
                .select(
                    F.col("user_id").alias("i_user"),
                    F.col("value").alias("i_value"),
                    F.col("n").alias("i_version"),
                    F.col("event_id").alias("i_eid"),
                    F.col("ts_us").alias("i_ts"),
                )
            )
            if state["df"] is None:
                merged = inc.select(
                    F.col("i_user").alias("user_id"),
                    F.col("i_value").alias("value"),
                    F.col("i_version").alias("version"),
                    F.col("i_eid").alias("last_event_id"),
                    F.col("i_ts").alias("last_ts"),
                )
            else:
                s = state["df"]
                newer = (F.col("i_ts") > F.col("last_ts")) | (
                    (F.col("i_ts") == F.col("last_ts"))
                    & (F.col("i_eid") > F.col("last_event_id"))
                )
                merged = s.join(
                    inc, s.user_id == inc.i_user, "full_outer"
                ).select(
                    F.coalesce("user_id", "i_user").alias("user_id"),
                    F.when(
                        F.col("user_id").isNull()
                        | (F.col("i_user").isNotNull() & newer),
                        F.col("i_value"),
                    )
                    .otherwise(F.col("value"))
                    .alias("value"),
                    (
                        F.coalesce("version", F.lit(0))
                        + F.coalesce("i_version", F.lit(0))
                    ).alias("version"),
                    F.when(
                        F.col("user_id").isNull()
                        | (F.col("i_user").isNotNull() & newer),
                        F.col("i_eid"),
                    )
                    .otherwise(F.col("last_event_id"))
                    .alias("last_event_id"),
                    F.greatest(
                        F.coalesce("last_ts", F.lit(-1)),
                        F.coalesce("i_ts", F.lit(-1)),
                    ).alias("last_ts"),
                )
            # lineage stays one batch deep; at scale this is a MERGE INTO
            # a keyed table instead of an in-memory frame
            state["df"] = merged.localCheckpoint()

        src = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        q = (
            src.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return state["df"].select(
            "user_id", "value", "version", "last_event_id"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    ANALYTICS_QUERIES,
    "events_gapfill_interpolate",
    """
    WITH hourly AS (
      SELECT event_type,
        date_trunc('hour', ts) AS hr,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS avg_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly
    ),
    spine AS (
      SELECT t.event_type, s.hr
      FROM (SELECT DISTINCT event_type FROM hourly) t
      CROSS JOIN (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        FROM bounds) s
    ),
    joined AS (
      SELECT s.event_type, s.hr,
        COALESCE(h.n_events, 0) AS n_events,
        h.avg_value,
        h.avg_value IS NULL AS is_gap
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hr = h.hr
    ),
    bracketed AS (
      SELECT event_type, hr, n_events, avg_value, is_gap,
        LAST_VALUE(avg_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY hr
          ROWS UNBOUNDED PRECEDING) AS prev_v,
        LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN hr END
                   IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY hr
          ROWS UNBOUNDED PRECEDING) AS prev_h,
        FIRST_VALUE(avg_value IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN hr END
                    IGNORE NULLS) OVER (
          PARTITION BY event_type ORDER BY hr
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
      FROM joined
    )
    SELECT event_type, hr, n_events, is_gap,
      CASE
        WHEN NOT is_gap THEN avg_value
        WHEN prev_v IS NULL THEN next_v
        WHEN next_v IS NULL THEN prev_v
        ELSE prev_v + (next_v - prev_v)
          * (CAST(epoch_us(hr) - epoch_us(prev_h) AS DOUBLE)
             / CAST(epoch_us(next_h) - epoch_us(prev_h) AS DOUBLE))
      END AS filled_value
    FROM bracketed
    """,
    "time-series gap fill with linear interpolation (TimescaleDB "
    "time_bucket_gapfill + interpolate): the hourly per-type series is "
    "densified onto the full hour spine; missing hours get "
    "prev + (next - prev) * dt-fraction between the bracketing observed "
    "hours (nearest-value fill at the edges), observed hours pass "
    "through. Exactness: hourly means are DECIMAL-sum / count, the "
    "interpolation is one double expression both engines evaluate "
    "identically. Scale shape: the raw stream reduces map-side to "
    "O(types x hours) rows; the spine join and the two bracketing "
    "window passes run on the tiny densified series, never the facts.",
)
def events_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import _DEC

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value"
    )
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        (
            F.sum(F.col("value").cast(_DEC)).cast("double")
            / F.count("*").cast("double")
        ).alias("avg_value"),
    )
    bounds = hourly.agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        F.col("avg_value").isNull().alias("is_gap"),
    )
    back = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the forward bracket is a RUNNING frame over the reversed order, not
    # first(...) over [current, unbounded following]: Spark evaluates
    # unbounded-FOLLOWING frames by rescanning to the partition end for
    # every row — O(n^2) per partition, measured 64 s on a 21.6k-hour
    # spine at sf3; the reversed running frame is O(n) (1.5 s)
    fwd = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hr = F.when(F.col("avg_value").isNotNull(), F.col("hr"))
    b = joined.select(
        "event_type",
        "hr",
        "n_events",
        "avg_value",
        "is_gap",
        F.last("avg_value", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_hr, ignorenulls=True).over(back).alias("prev_h"),
        F.last("avg_value", ignorenulls=True).over(fwd).alias("next_v"),
        F.last(obs_hr, ignorenulls=True).over(fwd).alias("next_h"),
    )
    frac = F.unix_micros("hr") - F.unix_micros("prev_h")
    span = F.unix_micros("next_h") - F.unix_micros("prev_h")
    return b.select(
        "event_type",
        "hr",
        "n_events",
        "is_gap",
        F.when(~F.col("is_gap"), F.col("avg_value"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (F.col("next_v") - F.col("prev_v"))
            * (frac.cast("double") / span.cast("double"))
        )
        .alias("filled_value"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_trend_ols",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    bounds AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
    ),
    spine AS (
      SELECT t.event_type, s.day,
        CAST(s.day - (SELECT d0 FROM bounds) AS BIGINT) AS x
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds) s
    ),
    series AS (
      SELECT s.event_type, s.x, COALESCE(d.n, 0) AS y
      FROM spine s LEFT JOIN daily d
        ON s.event_type = d.event_type AND s.day = d.day
    ),
    sums AS (
      SELECT event_type,
        CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(y) AS BIGINT) AS sy,
        CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy,
        CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx
      FROM series GROUP BY event_type
    )
    SELECT event_type, k AS n_days,
      CAST(k * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        / CAST(k * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS slope,
      (CAST(sy AS DOUBLE)
       - CAST(k * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
         / CAST(k * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
         * CAST(sx AS DOUBLE))
        / CAST(k AS DOUBLE) AS intercept
    FROM sums
    """,
    "per-type traffic trend by exact closed-form OLS over ZERO-FILLED "
    "daily counts (absent days are real zeros, not holes — a trend over "
    "only-observed days flatters decay): slope/intercept from the "
    "classic normal equations with every cross-product in DECIMAL(38,0) "
    "integer arithmetic, so the only doubles are the two final "
    "divisions — bit-exact on both engines. Scale shape: the fact "
    "stream reduces map-side to O(types x days) rows; everything after "
    "is model-sized.",
)
def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
            F.col("d0"),
        )
        .select(
            "event_type",
            "day",
            F.datediff("day", "d0").cast("bigint").alias("x"),
        )
    )
    series = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "x", F.coalesce("n", F.lit(0)).alias("y")
    )
    dec = "decimal(38,0)"
    sums = series.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).cast(dec).alias("sxx"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return sums.select(
        "event_type",
        F.col("k").alias("n_days"),
        slope.alias("slope"),
        (
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("k").cast("double")
        ).alias("intercept"),
    )


@register(
    ANALYTICS_QUERIES,
    "events_cusum_changepoint",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    acc AS (
      SELECT event_type, day,
        CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
        CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        CAST(COUNT(*) OVER p AS BIGINT) AS n,
        CAST(SUM(x) OVER p AS BIGINT) AS tot
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day),
             p AS (PARTITION BY event_type)),
    s AS (
      SELECT event_type, day, n, tot, n * cum - t * tot AS s_t
      FROM acc),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY abs(s_t) DESC, day ASC) AS rnk
      FROM s)
    SELECT event_type, n AS n_days, tot AS total_events, day AS cp_day,
           CAST(abs(s_t) AS BIGINT) AS cusum_stat,
           CAST(abs(s_t) AS DOUBLE) / CAST(n * tot AS DOUBLE) AS cusum_norm
    FROM ranked WHERE rnk = 1
    """,
    "offline CUSUM mean-change detection over per-type daily counts "
    "(Page 1954 / the standard at-most-one-changepoint scan statistic): "
    "the classic statistic max_t |cumsum_t(x - mean)| is rescaled by n "
    "to the all-integer form |n*cumsum_t(x) - t*total|, so the argmax "
    "day and the statistic itself are exact BIGINT arithmetic — the "
    "only double is the final normalization division. This is the 'did "
    "traffic shift, and WHEN?' companion to events_distribution_drift "
    "(which answers 'did the value distribution move?'). Scale shape: "
    "the fact stream reduces map-side to O(types x days) rows before "
    "any window; the three windows then run inside one partition-sorted "
    "pass per type.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("x"))
    wo = Window.partitionBy("event_type").orderBy("day")
    wp = Window.partitionBy("event_type")
    acc = daily.select(
        "event_type",
        "day",
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum("x")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
        F.count("*").over(wp).cast("bigint").alias("n"),
        F.sum("x").over(wp).cast("bigint").alias("tot"),
    )
    s = acc.withColumn(
        "s_t", F.col("n") * F.col("cum") - F.col("t") * F.col("tot")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_t")).desc(), F.asc("day")
    )
    return (
        s.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("n").alias("n_days"),
            F.col("tot").alias("total_events"),
            F.col("day").alias("cp_day"),
            F.abs(F.col("s_t")).cast("bigint").alias("cusum_stat"),
            (
                F.abs(F.col("s_t")).cast("double")
                / (F.col("n") * F.col("tot")).cast("double")
            ).alias("cusum_norm"),
        )
    )


@register(
    ANALYTICS_QUERIES,
    "events_forecast_backtest",
    """
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        FROM bounds) s),
    series AS (
      SELECT s.event_type, s.day, COALESCE(d.n, 0) AS y
      FROM spine s LEFT JOIN daily d
        ON s.event_type = d.event_type AND s.day = d.day),
    feat AS (
      SELECT event_type, day, y,
        CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s7,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM series)
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_eval_days,
      CAST(SUM(y) AS BIGINT) AS total_actual,
      CAST(SUM(abs(s7 - 7 * y)) AS BIGINT) AS total_abs_err_x7,
      CAST(SUM(abs(s7 - 7 * y)) AS DOUBLE)
        / (7.0 * CAST(SUM(y) AS DOUBLE)) AS wape
    FROM feat WHERE t > 7 GROUP BY event_type
    """,
    "forecast backtest: 7-day trailing-mean prediction of daily event "
    "volume per type over the ZERO-FILLED spine, scored by WAPE on every "
    "day with a full history window. The error sum stays integer "
    "(|s7 - 7y| avoids the division until the final ratio), so the gate "
    "is exact except one IEEE division. Scale shape: the fact stream "
    "reduces map-side to O(types x days) rows; windows and the rollup "
    "run on that tiny series.",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "ts")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    series = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).alias("y")
    )
    w7 = (
        Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    feat = series.select(
        "event_type",
        "y",
        F.sum("y").over(w7).cast("bigint").alias("s7"),
        F.row_number().over(wt).alias("t"),
    ).where(F.col("t") > 7)
    abs_err = F.abs(F.col("s7") - 7 * F.col("y"))
    return feat.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_eval_days"),
        F.sum("y").cast("bigint").alias("total_actual"),
        F.sum(abs_err).cast("bigint").alias("total_abs_err_x7"),
        (
            F.sum(abs_err).cast("double")
            / (F.lit(7.0) * F.sum("y").cast("double"))
        ).alias("wape"),
    )
