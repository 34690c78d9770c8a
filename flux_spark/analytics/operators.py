"""Custom relational operators Spark lacks as built-ins.

The reference has no relational operators at all (SURVEY.md §2.7); these are
the engine-level additions a log-analytics user expects, each expressed as a
composition of existing DataFrame ops (option (a) of the custom-operator
ladder — no UDFs, no mapInPandas), so Catalyst/AQE still optimize them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_value_cols: list[str],
    prefix: str = "asof_",
    strict: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the most recent right row with
    the same key and right.time <= left.time (or < when ``strict``).

    Implementation is the merge-scan form, NOT a join: union both sides
    with a side marker, then one window per key ordered by (time, side)
    carries the latest right-side values forward with
    ``last(..., ignorenulls=True)``. This shuffles each row exactly once
    (hash by key) and never materializes the O(|L| x |R|) inequality-join
    intermediate — the property that makes it survive 100 TB, where a
    naive ``left.join(right, time <= time)`` degrades to a per-key cross
    product. Ties on time resolve right-before-left (so "<=") unless
    ``strict``; ``tiebreak`` (a member of ``right_value_cols``) makes the
    choice among equal-time right rows deterministic (highest wins).
    """
    lcols = left.columns
    # ties on time: right rows sort before left (included, "<=") unless
    # strict, where they sort after left (excluded, "<")
    right_side = 0 if not strict else 2
    r = right.select(
        F.col(key),
        F.col(time_col),
        F.lit(right_side).alias("__side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, time_col)],
    )
    l = left.select(
        F.col(key),
        F.col(time_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in right_value_cols],
        *[F.col(c) for c in lcols if c not in (key, time_col)],
    )
    unioned = r.unionByName(l)
    order = [F.col(time_col).asc(), F.col("__side").asc()]
    if tiebreak is not None:
        # explicit NULLS FIRST: left rows carry NULL here and must not
        # outrank real right rows (also matches the SQL oracles verbatim)
        order.append(F.col(f"{prefix}{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in right_value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        F.col(key),
        F.col(time_col),
        *[F.col(c) for c in lcols if c not in (key, time_col)],
        *[F.col(f"__carry_{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )


def range_join_keyed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower: Column,
    upper: Column,
) -> DataFrame:
    """Keyed interval join: right rows with ``left_time + lower <= right_time
    <= left_time + upper`` per key. The equi-key keeps this a hash join with
    a residual range filter (NOT a nested-loop); at scale, bucketing both
    sides on the key pre-shuffles it away entirely."""
    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (rt >= lt + lower)
            & (rt <= lt + upper),
        )
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """Deterministic top-k rows per group (row_number window + filter);
    Spark executes the per-partition rank before the shuffle when the
    window partitions align, keeping shuffled volume ~k per group."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


_COMBINE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation with explicit key salting for skewed keys.

    ``aggs`` maps output alias -> ("count"|"sum"|"min"|"max", column).
    Phase 1 groups by (keys, salt) so a hot key's rows spread over
    ``n_salts`` reducers; phase 2 combines the partials per key (sum of
    counts/sums, min of mins, ...). Results are identical to a direct
    groupBy — this is the manual form of what AQE's skew handling does for
    joins, needed when one grouping key dominates (the classic null-key /
    celebrity-user problem). ``salt_col`` defaults to a deterministic
    spread (hash of all columns is overkill; spark_partition_id mixes
    enough) — pass an explicit column for reproducible tests.

    Spark already does map-side partial aggregation, so salting groupBy is
    only needed when phase-2 combiners themselves skew (billions of rows
    per key after partials) — the operator exists for that regime and as
    the documented pattern.
    """
    salt = salt_col if salt_col is not None else (F.spark_partition_id() % n_salts)
    partials = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_PARTIAL[kind](col).alias(f"__p_{alias}") for alias, (kind, col) in aggs.items()])
    )
    return partials.groupBy(*keys).agg(
        *[
            _COMBINE[kind](f"__p_{alias}").alias(alias)
            for alias, (kind, _) in aggs.items()
        ]
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Count triangles in an undirected graph given canonical edges
    (src < dst, one row per edge).

    The classic two-join form with the degeneracy-style ordering trick:
    because every edge is stored low->high, a triangle a<b<c is found
    exactly once as edges (a,b)+(b,c) closed by (a,c) — no candidate is
    generated twice, so no distinct pass. Both joins are equi-joins that
    co-partition on a vertex, and the wedge fan-out is bounded by the
    max out-degree under the ordering (the reason this survives power-law
    graphs at scale where naive all-orientations joins explode).
    """
    # The edge list is referenced THREE times below with different
    # projections, so Catalyst cannot reuse one exchange across them and
    # would re-execute the (often expensive) edge-building subplan three
    # times — measured 3× wall time on the co-purchase graph at sf1.
    # Materialize it once; edge lists are tiny next to the input that
    # produced them (same localCheckpoint discipline as the connected-
    # components iteration state in llm/dedup.py). eager=False: the
    # checkpoint fills on the FIRST action, so merely composing or
    # explaining the plan doesn't launch the edge-build job.
    edges = edges.select(src, dst).localCheckpoint(eager=False)
    e1 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e2 = edges.select(F.col(src).alias("b"), F.col(dst).alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = edges.select(F.col(src).alias("a"), F.col(dst).alias("c"))
    tri = wedges.join(closing, ["a", "c"])
    return tri.agg(F.count("*").alias("n_triangles"))


def co_occurrence_pairs(
    df: DataFrame,
    key_col: str,
    item_col: str,
    max_items_per_key: int | None = None,
) -> DataFrame:
    """Distinct item pairs co-occurring under a key (market baskets, part
    co-purchase edges): dedup to (key, item), self-join on the KEY with
    ``item_a < item_b`` so each unordered pair appears once, count
    supporting keys. Per-key cost is k² in the key's item count.

    ``max_items_per_key`` is the skew guard for that k² (the analog of
    ``max_bucket_size`` in llm/dedup.py LSH): keys holding more distinct
    items than the cap are DROPPED before the self-join — one hot key with
    10⁴ items would otherwise contribute 10⁸ pairs and wedge the stage at
    100× scale, while contributing only degenerate co-occurrence signal
    (everything co-occurs with everything under it). TPC-H orders hold
    ≤ 7 lineitems, so the registry queries run uncapped (cap=None) and
    stay oracle-exact; real baskets should set a cap.

    Returns (item_a, item_b, n_keys).
    """
    # One shuffle to gather each key's distinct items (collect_set dedups,
    # sort_array fixes pair orientation), pairs expanded map-side by TWO
    # chained generates, one partial-aggregated shuffle for the counts.
    # The previous distinct + self-join form shuffled the (key, item) set
    # three times and dominated the sf1 graph queries (10.7 s -> the
    # joins were cheap, the edge build was not). The two-level explode
    # (posexplode each anchor, then explode its tail slice) streams the
    # k² pairs with O(k) peak memory per row — a single flatten/transform
    # comprehension would materialize all k² structs in one task row,
    # which is an OOM on an uncapped hot key (10⁵ items -> billions of
    # structs) where the generate form just takes time.
    return pairs_from_basket(
        basket_group(df, key_col, item_col, max_items_per_key)
    )


def basket_group(
    df: DataFrame,
    key_col: str,
    item_col: str,
    max_items_per_key: int | None = None,
) -> DataFrame:
    """The shared basket build behind :func:`co_occurrence_pairs`: one
    shuffle gathering each key's sorted distinct items as ``(__k,
    __items)``. Exposed separately so consumers needing pairs AND
    per-item supports AND the basket count (association rules) can
    persist ONE build instead of shuffling the raw (key, item) set once
    per derived quantity."""
    grouped = (
        df.select(F.col(key_col).alias("__k"), F.col(item_col).alias("__i"))
        .groupBy("__k")
        .agg(F.sort_array(F.collect_set("__i")).alias("__items"))
    )
    if max_items_per_key is not None:
        grouped = grouped.where(F.size("__items") <= int(max_items_per_key))
    return grouped


def pairs_from_basket(grouped: DataFrame) -> DataFrame:
    """Pair expansion + count over a :func:`basket_group` result — the
    two chained generates documented in :func:`co_occurrence_pairs`.
    (An explicit repartition-before-aggregate was trialed here and
    reverted: pair keys are mostly unique, so the partial aggregate
    reduces little — but at honest parallelism the A/B was a wash and
    the extra exchange of the raw pair stream is pure cost; the
    apparent 3x win reproduced only on a 4-core session reading a
    4-partition cached input.)"""
    anchors = grouped.select(
        "__items", F.posexplode("__items").alias("__pos", "item_a")
    )
    pairs = anchors.select(
        "item_a",
        F.explode(
            F.expr("slice(__items, __pos + 2, size(__items) - __pos - 1)")
        ).alias("item_b"),
    )
    return pairs.groupBy("item_a", "item_b").agg(F.count("*").alias("n_keys"))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_col: Column | None = None,
) -> DataFrame:
    """Skew-safe equi-join: manual salting for when one join key dominates
    and the small side is still too big to broadcast.

    The large side gets a salt in [0, n_salts); the small side is
    replicated once per salt value; the join runs on (key, salt) so a hot
    key's rows spread over ``n_salts`` reducers instead of one straggler
    task. Shuffle volume grows by n_salts on the SMALL side only — the
    deliberate trade against a single reducer processing a celebrity
    key's entire volume. Results are identical to ``large.join(small,
    key)``; AQE's skew-join split covers most cases at runtime, and this
    is the explicit form for when it can't (e.g. the skew is inside one
    huge partition-local key, or AQE is off in a streaming microbatch).

    ``salt_col`` defaults to a cheap deterministic spread; pass an
    explicit column (e.g. ``F.pmod(F.xxhash64("event_id"), 8)``) for
    reproducible placement in tests.
    """
    salt = (
        salt_col if salt_col is not None else (F.spark_partition_id() % n_salts)
    )
    lg = large.withColumn("__salt", salt.cast("int"))
    sm = small.crossJoin(
        small.sparkSession.range(n_salts).select(
            F.col("id").cast("int").alias("__salt")
        )
    )
    return lg.join(sm, [key, "__salt"]).drop("__salt")


def bloom_prefilter_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_bits: int = 4096,
    n_hashes: int = 3,
) -> DataFrame:
    """Equi-join with an explicit Bloom-filter runtime pre-filter.

    The small side's keys build a deterministic Bloom bit set (k md5-salted
    positions per key, collected as one array of set bits — a few KB, like
    a sketch); the large side drops rows whose key misses any bit BEFORE
    the shuffle, then the surviving rows run the exact join. False
    positives only cost a little extra shuffle; results are identical to
    ``large.join(small, key)`` by construction. This is the manual form of
    Spark's injected runtime filters, useful when the build side is known
    tiny but the optimizer can't see it (e.g. computed dims) — at 100 TB
    the win is shuffling 1% of the fact table instead of all of it.
    """
    def positions(col):
        return [
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"b{h}:"), col.cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.lit(n_bits),
            )
            for h in range(n_hashes)
        ]

    bits_df = (
        small.select(F.explode(F.array(*positions(F.col(key)))).alias("__bit"))
        .distinct()
        .agg(F.sort_array(F.collect_list("__bit")).alias("__bits"))
    )
    pre = large.crossJoin(F.broadcast(bits_df))
    cond = None
    for p in positions(F.col(key)):
        c = F.array_contains(F.col("__bits"), p)
        cond = c if cond is None else (cond & c)
    filtered = pre.where(cond).drop("__bits")
    return filtered.join(small, key)


def zorder_value(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns:
    bit j of ``a`` lands at position 2j, bit j of ``b`` at 2j+1.

    Sorting/range-partitioning by this value before writing clusters rows
    that are close in BOTH dimensions into the same files, so parquet
    rowgroup min/max stats prune scans filtered on either column — the
    data-layout technique (Delta/Iceberg OPTIMIZE ZORDER) for the
    two-filter-column access pattern a single sort key can't serve.
    Pure bit arithmetic in codegen; deterministic, so oracle-checkable.
    """
    z = None
    for j in range(bits):
        t = F.shiftleft(
            F.shiftright(a.cast("bigint"), j).bitwiseAND(F.lit(1)), 2 * j
        ) + F.shiftleft(
            F.shiftright(b.cast("bigint"), j).bitwiseAND(F.lit(1)), 2 * j + 1
        )
        z = t if z is None else z + t
    return z


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Return ``df`` sorted by the Z-order interleave of two columns —
    the write-side half of the layout optimization (range-partition +
    sort happens in one orderBy; follow with a partitioned write)."""
    return df.orderBy(zorder_value(F.col(col_a), F.col(col_b), bits))


def grouped_ewma(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group exponentially-weighted moving average (final value) via
    ``applyInPandas`` — the grouped-map Pandas UDF shape.

    EWMA's recursion s_i = a*x_i + (1-a)*s_{i-1} depends on the previous
    OUTPUT, which standard window frames cannot express (they aggregate
    inputs, not running results) — exactly the case for dropping to the
    Arrow-batched grouped map: one shuffle on the key, each group's fold
    runs vectorized-adjacent in pandas, state never leaves the group.
    The fold is a fixed sequence of IEEE float64 ops in deterministic
    (order_cols) order, so results remain bit-reproducible and
    oracle-checkable despite leaving Catalyst.
    """
    import pandas as pd

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols)
        s = None
        for x in pdf[value_col].astype("float64"):
            s = float(x) if s is None else alpha * float(x) + (1 - alpha) * s
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n": [len(pdf)], "ewma": [s]}
        )

    out_schema = f"{key} {dict(df.dtypes)[key]}, n long, ewma double"
    return df.groupBy(key).applyInPandas(fold, schema=out_schema)


def expectation_report(
    df: DataFrame, rules: dict[str, Column]
) -> DataFrame:
    """Data-quality expectation checks (the Deequ/Great Expectations
    shape): ``rules`` maps a rule name to a boolean Column (True = row
    passes). Returns one row per rule with violation and row counts.

    All rules evaluate in ONE pass over the data as conditional
    aggregates — adding a rule costs an expression, not a scan — and the
    wide result is melted to long form driver-side (the rule list is
    metadata-sized). NULL rule results count as violations: an
    expectation that cannot be evaluated is not satisfied.
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(c, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, (_, c) in enumerate(rules.items())
    ]
    wide = df.agg(*aggs, F.count("*").alias("__n"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v_{i}").cast("long").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return wide.select(
        F.explode(pairs).alias("r"), F.col("__n").alias("n_checked")
    ).select("r.rule", "r.n_violations", "n_checked")


def profile_table(df: DataFrame) -> DataFrame:
    """Dataset-card profiler: one row per column with row/null/distinct
    counts and a numeric min/max (doubles; dates as epoch days,
    timestamps as epoch micros; strings/binary get NULL — cross-engine
    string formatting of floats is not bit-portable, numeric min/max
    is).

    Plan shape for 100 TB: one independent column-pruned scan + partial
    aggregate per column, unioned — total I/O equals reading the table
    once (parquet is columnar), each leg parallelizes independently, and
    no EXPAND multiplication ever materializes rows x columns the way a
    single multi-count-distinct aggregate would. The exact
    COUNT(DISTINCT) is the gate knob; at warehouse scale swap in
    approx_count_distinct per leg (same plan shape).
    """
    from functools import reduce

    from pyspark.sql import types as T

    parts = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.NumericType):
            num = c.cast("double")
        elif isinstance(f.dataType, T.DateType):
            num = F.datediff(c, F.lit("1970-01-01").cast("date")).cast(
                "double"
            )
        elif isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            # NTZ first casts to an instant (session tz is pinned UTC,
            # session.py:50, so the cast is identity on the wall clock)
            num = F.unix_micros(c.cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        parts.append(
            df.select(f.name)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.when(c.isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.countDistinct(c).cast("bigint").alias("n_distinct"),
                F.min(num).alias("min_num"),
                F.max(num).alias("max_num"),
            )
            .select(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                "n_rows",
                "n_nulls",
                "n_distinct",
                "min_num",
                "max_num",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def skew_profile(
    df: DataFrame,
    key_col: str,
    suggested_salt_cap: int = 32,
) -> DataFrame:
    """Key-skew diagnostics for a prospective groupBy/join key — the
    numbers you read BEFORE choosing between a plain shuffle,
    :func:`salted_agg`, or a broadcast: per-key counts reduced to one
    row of distribution stats (max/hottest key, top-10 share, Gini
    coefficient, exact count percentiles) plus a suggested salt factor
    ``min(cap, ceil(max_count / mean_count))`` — the fan-out that would
    level the hottest key to roughly the mean (heuristic, capped).

    Exactness: Gini comes from the integer identity
    ``(2 * sum(i * c_i) - (n + 1) * sum(c)) / (n * sum(c))`` over counts
    sorted ascending — all-int64 numerator/denominator, one final double
    division, engine-exact. Ties in the sort don't affect the sum (equal
    counts commute). Percentiles use the exact interpolating
    ``percentile``, bit-compatible with DuckDB's ``quantile_cont``.

    Plan shape at 100 TB: the raw table reduces map-side to one row per
    key; every later step is O(distinct keys). The exact-Gini rank is
    computed with the two-pass range-partition pattern
    (:func:`attach_global_order`), so even a high-cardinality key (URLs,
    user ids — the keys most worth profiling) never funnels through a
    single-partition window; the hottest key is a TakeOrderedAndProject
    (per-partition top-1, driver merge). The raw fact table is scanned
    once and never re-shuffled.

    top-10 share note: the sum of the 10 largest counts depends only on
    the count MULTISET (boundary ties contribute equal values), so
    ``rank-from-bottom > n_keys - 10`` over the ascending order sums the
    same value as ``ROW_NUMBER() OVER (count DESC) <= 10`` — one global
    order serves both the Gini and the top-10 leg.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count("*").alias("__c")
    )
    ranked = attach_global_order(
        counts,
        [F.asc("__c"), F.asc("__k")],
        row_alias="__i",
        total_alias="__nk",
    )
    hot = (
        counts.orderBy(F.desc("__c"), F.asc("__k"))
        .limit(1)
        .select(F.col("__k").cast("string").alias("hottest_key"))
    )
    agg = ranked.agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("__c").cast("bigint").alias("max_count"),
        F.sum(
            F.when(F.col("__i") > F.col("__nk") - 10, F.col("__c")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("__top10"),
        F.sum(F.col("__i").cast("bigint") * F.col("__c").cast("bigint"))
        .cast("bigint")
        .alias("__ic"),
        F.percentile(F.col("__c").cast("double"), F.lit(0.5)).alias(
            "p50_count"
        ),
        F.percentile(F.col("__c").cast("double"), F.lit(0.9)).alias(
            "p90_count"
        ),
        F.percentile(F.col("__c").cast("double"), F.lit(0.99)).alias(
            "p99_count"
        ),
    )
    agg = agg.crossJoin(F.broadcast(hot))
    n = F.col("n_keys")
    tot = F.col("n_rows")
    gini = (
        (F.lit(2) * F.col("__ic") - (n + 1) * tot).cast("double")
        / (n * tot).cast("double")
    )
    skew_ratio = F.col("max_count").cast("double") * n.cast("double") / tot.cast(
        "double"
    )
    return agg.select(
        "n_rows",
        "n_keys",
        "max_count",
        "hottest_key",
        (F.col("__top10").cast("double") / tot.cast("double")).alias(
            "top10_share"
        ),
        (F.col("max_count").cast("double") / tot.cast("double")).alias(
            "max_share"
        ),
        gini.alias("gini"),
        skew_ratio.alias("skew_ratio"),
        F.least(
            F.lit(suggested_salt_cap),
            F.greatest(F.lit(1), F.ceil(skew_ratio)),
        )
        .cast("int")
        .alias("suggested_salt"),
        "p50_count",
        "p90_count",
        "p99_count",
    )


def hilbert_stage_exprs(n_bits: int, idiv: str) -> list[tuple[str, str, str]]:
    """SQL expression triples (d, x, y) for each fold of the iterative
    Hilbert xy2d transform (the canonical bit-fold: quadrant digit
    (3*rx) XOR ry — spelled as a CASE so no engine-specific XOR — then
    reflect+swap when ry=0). ``idiv`` is the engine's integer-division
    token ('div' for Spark SQL, '//' for DuckDB); everything else is
    shared text, so both engines execute the identical arithmetic.
    Stage inputs/outputs are columns named d, x, y."""
    n = 2 ** n_bits
    stages = []
    for b in range(n_bits - 1, -1, -1):
        s = 2 ** b
        rx = f"((x {idiv} {s}) % 2)"
        ry = f"((y {idiv} {s}) % 2)"
        quad = (
            f"CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
            f"WHEN {rx} = 1 THEN 3 "
            f"WHEN {ry} = 1 THEN 1 ELSE 0 END"
        )
        newx = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - y ELSE y END) "
            f"ELSE x END"
        )
        newy = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {n - 1} - x ELSE x END) "
            f"ELSE y END"
        )
        stages.append((f"d + {s * s} * ({quad})", newx, newy))
    return stages


def hilbert_value(
    df: DataFrame, x_expr: str, y_expr: str, n_bits: int = 10
) -> DataFrame:
    """Append a ``hilbert`` column: the Hilbert-curve index of integer
    cell (x, y) on the 2^n_bits x 2^n_bits grid — the locality-
    preserving alternative to :func:`zorder_value` (Morton): a Hilbert
    sort's consecutive rows are always GRID-ADJACENT, so rowgroup
    min/max ranges on both dimensions stay tighter than under Z-order's
    quadrant jumps (the OPTIMIZE ... HILBERT option in modern
    lakehouses). Pure codegen integer CASE arithmetic unrolled over
    ``n_bits`` chained projections — no UDF, no shuffle, no join.
    """
    out = df.selectExpr(
        "*",
        f"CAST({x_expr} AS BIGINT) AS x",
        f"CAST({y_expr} AS BIGINT) AS y",
        "CAST(0 AS BIGINT) AS d",
    )
    keep = [c for c in df.columns]
    for d_e, x_e, y_e in hilbert_stage_exprs(n_bits, "div"):
        out = out.selectExpr(
            *keep,
            f"CAST({d_e} AS BIGINT) AS d",
            f"CAST({x_e} AS BIGINT) AS x",
            f"CAST({y_e} AS BIGINT) AS y",
        )
    return out.selectExpr(*keep, "d AS hilbert")


def attach_global_order(
    df: DataFrame,
    order_exprs: list[Column],
    *,
    row_alias: str | None = None,
    total_alias: str | None = None,
    running_sum: tuple[str, str] | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """Attach global-order columns (row_number / total count / exclusive
    running sum under a TOTAL order given by ``order_exprs``) without a
    single-partition window.

    This is the two-pass pattern that replaces ``Window.orderBy(...)``
    with no ``partitionBy`` — the one plan shape that cannot survive
    100 TB (every row funnels through one task):

      pass 0  range-repartition on the order expressions, then pin the
              partitioning with ``localCheckpoint`` so the partition ids
              seen by both passes are the SAME materialized blocks (no
              recompute, no sampling drift);
      pass 1  per-partition counts/sums -> driver (one row per
              partition, model-sized), cumulated in exact Python ints;
      pass 2  a PARTITIONED window per range-partition plus the
              broadcast partition offsets.

    Bit-exact vs the global window: range partitions are contiguous in
    the total order, within-partition ordering is the same total order,
    and the offsets are exact integer sums — so ``offset + local`` is
    identical to the global value row by row.

    ``running_sum`` is ``(input_col, alias)``: the EXCLUSIVE prefix sum
    (bigint) of ``input_col``, 0 for the global first row. ``row_alias``
    is the global 1-based row number; ``total_alias`` the global count.
    """
    spark = df.sparkSession
    if n_partitions is None:
        # spark.sql.shuffle.partitions may be "auto" on AQE-managed
        # deployments (e.g. Databricks) — fall back to the cluster's
        # default parallelism rather than ValueError-ing every caller.
        try:
            n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (ValueError, TypeError):
            n_partitions = spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n_partitions, *order_exprs).withColumn(
        "__pid", F.spark_partition_id()
    )
    # Pin partition ids: both passes must read the SAME physical layout.
    parted = parted.localCheckpoint()
    aggs = [F.count("*").cast("bigint").alias("__cnt")]
    if running_sum is not None:
        aggs.append(
            F.sum(running_sum[0]).cast("bigint").alias("__psum")
        )
    stats = sorted(
        parted.groupBy("__pid").agg(*aggs).collect(),
        key=lambda r: r["__pid"],
    )
    total = sum(r["__cnt"] for r in stats)
    rows, cnt_off, sum_off = [], 0, 0
    for r in stats:
        rows.append((r["__pid"], cnt_off, sum_off))
        cnt_off += r["__cnt"]
        if running_sum is not None:
            sum_off += r["__psum"] or 0
    off = spark.createDataFrame(
        rows, "__pid int, __cnt_off bigint, __sum_off bigint"
    )
    joined = parted.join(F.broadcast(off), "__pid")
    wloc = Window.partitionBy("__pid").orderBy(*order_exprs)
    out_cols = [F.col(c) for c in df.columns]
    if row_alias is not None:
        out_cols.append(
            (F.col("__cnt_off") + F.row_number().over(wloc))
            .cast("bigint")
            .alias(row_alias)
        )
    if total_alias is not None:
        out_cols.append(F.lit(total).cast("bigint").alias(total_alias))
    if running_sum is not None:
        local = F.coalesce(
            F.sum(running_sum[0]).over(
                wloc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint")
        out_cols.append(
            (F.col("__sum_off") + local).cast("bigint").alias(running_sum[1])
        )
    return joined.select(*out_cols)


def ntile_from_rank(r: Column, n: Column, k: int) -> Column:
    """Closed-form NTILE(k) from a global 1-based rank ``r`` and total
    count ``n`` — the distributed replacement for ``F.ntile(k).over(an
    unpartitioned window)``. Standard SQL NTILE semantics (what Spark
    and DuckDB both implement): with ``n = k*q + rem``, the first
    ``rem`` buckets get ``q+1`` rows, the rest ``q``. All arithmetic on
    exact bigints (the one double division is of an exact multiple,
    lossless below 2^53 rows).
    """
    kk = F.lit(k).cast("bigint")
    q = ((n - F.pmod(n, kk)) / kk).cast("bigint")
    rem = F.pmod(n, kk)
    threshold = rem * (q + 1)
    in_big = r <= threshold
    big_bucket = (((r - 1) - F.pmod(r - 1, q + 1)) / (q + 1)).cast("bigint") + 1
    small_off = r - threshold - 1
    small_bucket = (
        rem + ((small_off - F.pmod(small_off, q)) / q).cast("bigint") + 1
    )
    return F.when(in_big, big_bucket).otherwise(small_bucket).cast("int")
