"""Semantics tests for custom relational operators (asof/range/top-k)."""

import pytest
from pyspark.sql import functions as F

from flux_spark.analytics.operators import asof_join, range_join_keyed, top_k_per_group


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100), ("A", 20, 200), ("B", 15, 300), ("A", 5, 400)],
        "sym string, t long, qty long",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 1.0), ("A", 10, 2.0), ("A", 18, 3.0), ("B", 20, 9.0)],
        "sym string, t long, px double",
    )
    return trades, quotes


def test_asof_join_inclusive(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.t): r.q_px
        for r in asof_join(
            trades, quotes, key="sym", time_col="t",
            right_value_cols=["px"], prefix="q_", tiebreak="px",
        ).collect()
    }
    assert out[("A", 5)] is None      # no quote yet
    assert out[("A", 10)] == 2.0      # equal time included
    assert out[("A", 20)] == 3.0      # latest earlier quote
    assert out[("B", 15)] is None     # B's only quote is later


def test_asof_join_strict(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = {
        (r.sym, r.t): r.q_px
        for r in asof_join(
            trades, quotes, key="sym", time_col="t",
            right_value_cols=["px"], prefix="q_", strict=True, tiebreak="px",
        ).collect()
    }
    assert out[("A", 10)] == 1.0      # equal time excluded under strict


def test_range_join_keyed(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = range_join_keyed(
        trades, quotes, key="sym", left_time="t", right_time="t",
        lower=F.lit(-2), upper=F.lit(2),
    ).select(F.col("l.sym"), F.col("l.t").alias("lt"), F.col("r.t").alias("rt"))
    got = {(r.sym, r.lt, r.rt) for r in out.collect()}
    assert got == {("A", 10, 8), ("A", 10, 10), ("A", 20, 18)}


def test_top_k_per_group(spark, quotes_trades):
    trades, _ = quotes_trades
    out = top_k_per_group(trades, ["sym"], [F.desc("qty")], 1).collect()
    got = {(r.sym, r.qty) for r in out}
    assert got == {("A", 400), ("B", 300)}


def test_triangle_count(spark):
    from flux_spark.analytics.operators import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge 4-5 (no new ones)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    assert triangle_count(edges).collect()[0].n_triangles == 4

    no_tri = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(no_tri).collect()[0].n_triangles == 0


def test_salted_join_matches_plain_join(spark):
    from flux_spark.analytics.operators import salted_join

    large = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "row_id long, key string",
    )
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"v{i}") for i in range(0, 1000, 10)],
        "key string, tag string",
    )
    got = salted_join(
        large, small, "key", n_salts=4,
        salt_col=(F.pmod(F.xxhash64("row_id"), F.lit(4))),
    )
    plain = large.join(small, "key")
    assert got.count() == plain.count()
    assert sorted(got.select("row_id", "tag").collect()) == sorted(
        plain.select("row_id", "tag").collect()
    )


def test_bloom_prefilter_join_matches_plain_join(spark):
    from flux_spark.analytics.operators import bloom_prefilter_join

    large = spark.createDataFrame(
        [(i, f"k{i % 100}") for i in range(2000)], "row_id long, key string"
    )
    small = spark.createDataFrame(
        [(f"k{i}", f"v{i}") for i in range(0, 100, 7)], "key string, tag string"
    )
    got = bloom_prefilter_join(large, small, "key")
    plain = large.join(small, "key")
    assert sorted(got.select("row_id", "tag").collect()) == sorted(
        plain.select("row_id", "tag").collect()
    )


def test_zorder_value_interleaves_bits(spark):
    from flux_spark.analytics.operators import zorder_value

    df = spark.createDataFrame(
        [(0b101, 0b011)], "a long, b long"
    ).select(zorder_value(F.col("a"), F.col("b"), bits=4).alias("z"))
    a, b = 0b101, 0b011
    expect = sum(
        (((a >> j) & 1) << (2 * j)) + (((b >> j) & 1) << (2 * j + 1))
        for j in range(4)
    )
    assert df.collect()[0].z == expect
    # interleave is a bijection on the bit range: distinct inputs stay distinct
    many = spark.createDataFrame(
        [(i, j) for i in range(8) for j in range(8)], "a long, b long"
    ).select(zorder_value(F.col("a"), F.col("b"), bits=3).alias("z"))
    zs = [r.z for r in many.collect()]
    assert len(set(zs)) == 64 and min(zs) == 0 and max(zs) == 63


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_variants_match_plain_join_randomized(spark, seed):
    """Seeded randomized model check: salted and bloom joins must be
    row-for-row identical to the plain join on skewed random data."""
    import random

    from flux_spark.analytics.operators import (
        bloom_prefilter_join,
        salted_join,
    )

    rnd = random.Random(seed)
    keys = [f"k{i}" for i in range(40)]
    # zipf-ish skew: low indices dominate
    large_rows = [
        (i, keys[min(int(rnd.expovariate(0.15)), 39)]) for i in range(1500)
    ]
    small_rows = [(k, f"v-{k}") for k in rnd.sample(keys, 17)]
    large = spark.createDataFrame(large_rows, "row_id long, key string")
    small = spark.createDataFrame(small_rows, "key string, tag string")
    want = sorted(large.join(small, "key").select("row_id", "tag").collect())
    got_salted = sorted(
        salted_join(large, small, "key", n_salts=4,
                    salt_col=F.pmod(F.xxhash64("row_id"), F.lit(4)))
        .select("row_id", "tag").collect()
    )
    got_bloom = sorted(
        bloom_prefilter_join(large, small, "key", n_bits=256)
        .select("row_id", "tag").collect()
    )
    assert got_salted == want
    assert got_bloom == want


def test_co_occurrence_pairs_skew_cap(spark):
    """Per-key skew guard: a hot key with more items than the cap is
    dropped before the k-squared self-join; normal keys are untouched, and
    with cap=None results equal the uncapped hand computation."""
    from flux_spark.analytics.operators import co_occurrence_pairs

    rows = [("o1", "a"), ("o1", "b"), ("o2", "a"), ("o2", "b"), ("o2", "c")]
    # hot key: 50 items -> 1225 pairs if not guarded
    rows += [("hot", f"i{j:02d}") for j in range(50)]
    df = spark.createDataFrame(rows, "k string, item string")

    uncapped = {
        (r["item_a"], r["item_b"]): r["n_keys"]
        for r in co_occurrence_pairs(df, "k", "item").collect()
    }
    assert uncapped[("a", "b")] == 2
    assert uncapped[("a", "c")] == 1
    assert sum(v for kk, v in uncapped.items() if kk[0].startswith("i")) == 1225

    capped = {
        (r["item_a"], r["item_b"]): r["n_keys"]
        for r in co_occurrence_pairs(
            df, "k", "item", max_items_per_key=10
        ).collect()
    }
    # hot key gone, normal keys' pairs identical
    assert capped == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}

    # duplicates dedup before pairing (distinct (key, item))
    dup = spark.createDataFrame(
        [("o", "x"), ("o", "x"), ("o", "y")], "k string, item string"
    )
    assert co_occurrence_pairs(dup, "k", "item").collect()[0]["n_keys"] == 1


def test_co_occurrence_pairs_matches_bruteforce(spark):
    """The gather+comprehension edge builder must equal the obvious
    brute force on inputs with duplicates, singleton keys, shared items
    and a hot key — guarding the rewrite of the old self-join form."""
    import itertools

    from flux_spark.analytics.operators import co_occurrence_pairs

    rows = []
    data = {
        "k1": [3, 1, 2, 1],        # duplicate item within key
        "k2": [2, 3],
        "k3": [7],                 # singleton -> no pairs
        "k4": [1, 2, 3, 4, 5, 6],  # hot key
        "k5": [2, 3],              # repeats the (2,3) pair
    }
    for k, items in data.items():
        rows += [(k, i) for i in items]
    df = spark.createDataFrame(rows, "k string, item long")

    expected = {}
    for items in data.values():
        for a, b in itertools.combinations(sorted(set(items)), 2):
            expected[(a, b)] = expected.get((a, b), 0) + 1

    got = {
        (r.item_a, r.item_b): r.n_keys
        for r in co_occurrence_pairs(df, "k", "item").collect()
    }
    assert got == expected

    # cap drops the hot key entirely, nothing else
    expected_capped = {}
    for items in data.values():
        if len(set(items)) > 4:
            continue
        for a, b in itertools.combinations(sorted(set(items)), 2):
            expected_capped[(a, b)] = expected_capped.get((a, b), 0) + 1
    got_capped = {
        (r.item_a, r.item_b): r.n_keys
        for r in co_occurrence_pairs(
            df, "k", "item", max_items_per_key=4
        ).collect()
    }
    assert got_capped == expected_capped


def test_skew_profile_hand_checked(spark):
    """9 rows over 3 keys: a=6, b=2, c=1. Gini over sorted counts
    [1,2,6]: (2*(1*1+2*2+3*6) - 4*9) / (3*9) = (46-36)/27."""
    from flux_spark.analytics.operators import skew_profile

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    r = skew_profile(df, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (9, 3, 6)
    assert r["hottest_key"] == "a"
    assert abs(r["gini"] - 10 / 27) < 1e-12
    assert abs(r["max_share"] - 6 / 9) < 1e-12
    assert abs(r["skew_ratio"] - 2.0) < 1e-12
    assert r["suggested_salt"] == 2
    assert r["p50_count"] == 2.0


def test_seasonal_anomaly_integer_three_sigma(spark):
    """Controlled seasonality: hour 10 is 4/day for 20 days plus one
    40-spike — the spike must flag (note: with the outlier inside its own
    baseline, max attainable z is sqrt(n-1), so 3-sigma needs n >= ~10
    days; 4 days can never flag — the masking property this fixture
    documents); hour 11 constant (zero variance, NULL z, no flag); hours
    with no events appear on the spine as zeros."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    rows = []
    eid = 0
    for d in range(1, 22):
        n10 = 40 if d == 4 else 4
        for i in range(n10):
            rows.append((eid, datetime.datetime(2024, 6, d, 10, 5 + i % 50),
                         1, "click", 1.0, "{}")); eid += 1
        for i in range(3):
            rows.append((eid, datetime.datetime(2024, 6, d, 11, i + 1),
                         1, "click", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = ANALYTICS_QUERIES["events_seasonal_anomaly"].fn(spark, d)
    rows10 = {r["day"].day: r for r in out.where("hr = 10").collect()}
    assert rows10[4]["is_anomaly"] and rows10[4]["n_events"] == 40
    assert not rows10[1]["is_anomaly"]
    rows11 = out.where("hr = 11").collect()
    assert all(r["zscore"] is None and not r["is_anomaly"] for r in rows11)
    # spine: hour 9 exists for every day with zero events, zero variance
    rows9 = out.where("hr = 9").collect()
    assert len(rows9) == 21 and all(r["n_events"] == 0 for r in rows9)


def test_distribution_drift_ks_tvd_extremes(spark):
    """Type 'a' swaps its whole distribution between halves (KS = TVD = 1);
    type 'b' keeps it identical (KS = TVD = 0). The midpoint split is
    global, so both types share the same early/late boundary."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    base = datetime.datetime(2024, 6, 1)
    rows, eid = [], 0
    for i in range(20):
        late = i >= 10
        # type a: all 1.0 early, all 2.0 late
        rows.append((eid, base + datetime.timedelta(hours=i), 1, "a",
                     2.0 if late else 1.0, "{}")); eid += 1
        # type b: same 1.0/2.0 mix in both halves
        rows.append((eid, base + datetime.timedelta(hours=i), 1, "b",
                     2.0 if i % 2 else 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["event_type"]: r
        for r in ANALYTICS_QUERIES["events_distribution_drift"]
        .fn(spark, d)
        .collect()
    }
    assert out["a"]["n_a"] == 10 and out["a"]["n_b"] == 10
    assert out["a"]["ks_stat"] == 1.0 and out["a"]["tvd"] == 1.0
    assert out["b"]["ks_stat"] == 0.0 and out["b"]["tvd"] == 0.0


def test_interval_overlap_join_counts_other_users_inside_window(spark):
    """One heavy session (user 1, 3 events over 20 min); user 2 has two
    events inside the window and one far outside, user 3 one inside —
    n_overlap = 3 from 2 distinct other users. Light sessions drop."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    t0 = datetime.datetime(2024, 6, 1, 12, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (0, at(0), 1, "click", 1.0, "{}"),
        (1, at(10), 1, "click", 1.0, "{}"),
        (2, at(20), 1, "click", 1.0, "{}"),
        (3, at(5), 2, "view", 1.0, "{}"),
        (4, at(19), 2, "view", 1.0, "{}"),
        (5, at(600), 2, "view", 1.0, "{}"),   # outside
        (6, at(20), 3, "view", 1.0, "{}"),    # boundary-inclusive
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = (
        ANALYTICS_QUERIES["events_interval_overlap_join"]
        .fn(spark, d)
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1 and r["n_events"] == 3
    assert r["duration_us"] == 20 * 60 * 1_000_000
    assert r["n_overlap"] == 3 and r["n_other_users"] == 2


def test_epoch_shuffle_reproducible_independent_permutations(spark):
    """Every (epoch, shard) position range is contiguous from 0; the two
    epochs order the corpus differently (independent permutations); a
    second invocation reproduces the assignment byte-for-byte."""
    import os
    import tempfile

    from flux_spark.llm.queries import LLM_QUERIES

    df = spark.range(1, 65).selectExpr("id AS doc_id", "'x' AS text")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    fn = LLM_QUERIES["doc_epoch_shuffle"].fn
    rows = fn(spark, d).collect()
    assert len(rows) == 128
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r["epoch"], r["shard"]), []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    order = {
        ep: [
            r["doc_id"]
            for r in sorted(rows, key=lambda r: (r["shard"], r["pos"]))
            if r["epoch"] == ep
        ]
        for ep in (0, 1)
    }
    assert order[0] != order[1]
    again = {(r["epoch"], r["doc_id"]): (r["shard"], r["pos"])
             for r in fn(spark, d).collect()}
    assert again == {(r["epoch"], r["doc_id"]): (r["shard"], r["pos"])
                     for r in rows}


def test_cdc_merge_upsert_delete_semantics(spark):
    """u1 early-only -> kept; u2 early+late click -> updated with the
    late value; u3 early + late 'error' -> deleted (absent); u4 late-only
    click -> inserted; u5 late-only error -> absent; version counts both
    halves' events."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    t = lambda h: datetime.datetime(2024, 6, 1, h)  # noqa: E731
    rows = [
        (0, t(0), 1, "click", 10.0, "{}"),
        (1, t(1), 1, "view", 11.0, "{}"),    # u1 base value 11.0, n=2
        (2, t(0), 2, "click", 20.0, "{}"),
        (3, t(20), 2, "click", 21.0, "{}"),  # u2 updated -> 21.0
        (4, t(0), 3, "click", 30.0, "{}"),
        (5, t(20), 3, "error", 31.0, "{}"),  # u3 deleted
        (6, t(20), 4, "click", 40.0, "{}"),  # u4 inserted
        (7, t(20), 5, "error", 50.0, "{}"),  # u5 never lands
        (8, t(23), 9, "view", 0.0, "{}"),    # stretch the range late
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["user_id"]: r
        for r in ANALYTICS_QUERIES["events_cdc_merge"].fn(spark, d).collect()
    }
    assert set(out) == {1, 2, 4, 9}
    assert out[1]["action"] == "kept" and out[1]["value"] == 11.0
    assert out[1]["version"] == 2
    assert out[2]["action"] == "updated" and out[2]["value"] == 21.0
    assert out[2]["version"] == 2
    assert out[4]["action"] == "inserted" and out[4]["value"] == 40.0
    assert out[4]["version"] == 1


def test_ivf_index_persist_matches_in_memory_ivf(spark, sf_dir):
    """The persisted-index query path must return exactly what the
    in-memory ivf_topk returns on the same centroids."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from flux_spark.analytics.registry import load_table
    from flux_spark.llm import similarity

    e = load_table(spark, sf_dir, "embeddings")
    cen = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    mem = similarity.ivf_topk(
        e, e.where("vec_id < 5"), cen, k=5, nprobe=2
    ).collect()
    root = tempfile.mkdtemp()
    try:
        similarity.build_ivf_index(e, cen, root)
        disk = similarity.ivf_index_topk(
            spark, root, e.where("vec_id < 5"), k=5, nprobe=2
        ).collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"]) for r in mem]
    ) == sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"]) for r in disk]
    )


def test_top2_components_deflation_orthogonal(spark, sf_dir):
    """Component 1 equals the single-component op bit-for-bit; component
    2 is (near-)orthogonal to it — the deflation guarantee, up to the
    int64 quantization of the per-dim sums."""
    from flux_spark.llm.queries import LLM_QUERIES

    out = LLM_QUERIES["emb_top2_components"].fn(spark, sf_dir).collect()
    u = {}
    for c in (1, 2):
        rows = sorted(
            (r for r in out if r["component"] == c),
            key=lambda r: r["dim_idx"],
        )
        u[c] = [r["u_val"] for r in rows]
        assert len(u[c]) == 64
    one = {
        r["dim_idx"]: r["u_val"]
        for r in LLM_QUERIES["emb_top_component"].fn(spark, sf_dir).collect()
    }
    assert u[1] == [one[j] for j in range(64)]
    dot = sum(a * b for a, b in zip(u[1], u[2]))
    n1 = sum(a * a for a in u[1]) ** 0.5
    n2 = sum(b * b for b in u[2]) ** 0.5
    assert abs(dot) / (n1 * n2) < 1e-3


def test_stream_cdc_apply_last_writer_wins_and_versions_accumulate(spark):
    """The streaming upsert's final state: per key, the latest event's
    value with version = total events across ALL microbatches — keys
    seen only in the late batch insert, keys in both batches carry the
    late value with the accumulated count."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    t = lambda h: datetime.datetime(2024, 6, 1, h)  # noqa: E731
    rows = [
        (0, t(0), 1, "click", 10.0, "{}"),
        (1, t(1), 1, "view", 11.0, "{}"),
        (2, t(0), 2, "click", 20.0, "{}"),
        (3, t(20), 2, "click", 21.0, "{}"),
        (4, t(20), 4, "click", 40.0, "{}"),
        (5, t(23), 9, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["user_id"]: r
        for r in ANALYTICS_QUERIES["stream_cdc_apply"].fn(spark, d).collect()
    }
    assert set(out) == {1, 2, 4, 9}
    assert out[1]["value"] == 11.0 and out[1]["version"] == 2
    assert out[2]["value"] == 21.0 and out[2]["version"] == 2
    assert out[2]["last_event_id"] == 3
    assert out[4]["value"] == 40.0 and out[4]["version"] == 1


def test_gapfill_linear_interpolation_and_edge_fill(spark):
    """Type 'a' observed at hours 0 (1.0) and 4 (5.0): interior gaps fill
    2.0/3.0/4.0 (linear); hours 5-6 (past the last observation, on the
    spine stretched by type 'b') fill with the nearest value 5.0."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    t = lambda h: datetime.datetime(2024, 6, 1, h)  # noqa: E731
    rows = [
        (0, t(0), 1, "a", 1.0, "{}"),
        (1, t(4), 1, "a", 5.0, "{}"),
        (2, t(0), 1, "b", 7.0, "{}"),
        (3, t(6), 1, "b", 9.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        (r["event_type"], r["hr"].hour): r
        for r in ANALYTICS_QUERIES["events_gapfill_interpolate"]
        .fn(spark, d)
        .collect()
    }
    assert len(out) == 14  # 2 types x 7 spine hours
    a = [out[("a", h)]["filled_value"] for h in range(7)]
    assert a == [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 5.0]
    assert out[("a", 2)]["is_gap"] and not out[("a", 0)]["is_gap"]
    assert out[("b", 3)]["filled_value"] == 8.0


def test_uncertainty_margin_ranks_boundary_points_first(spark):
    """A point between the two label clusters has the smallest top-two
    vote margin and gets priority 1; a point deep inside a cluster has a
    decisive margin and ranks after it."""
    from flux_spark.llm import similarity

    lab_rows = [
        (i, [1.0, 0.01 * i, 0.0], "a") for i in range(1, 5)
    ] + [(10 + i, [0.01 * i, 1.0, 0.0], "b") for i in range(1, 5)]
    labeled = spark.createDataFrame(
        lab_rows, "vec_id long, embedding array<double>, label string"
    )
    unlabeled = spark.createDataFrame(
        [(100, [0.7, 0.7, 0.0]), (101, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["query_id"]: r
        for r in similarity.uncertainty_margin(
            labeled, unlabeled, k=5, select_n=2
        ).collect()
    }
    assert out[100]["priority"] == 1  # boundary point: 3-2 vote, margin 1
    assert out[100]["margin"] == 1
    assert out[101]["priority"] == 2 and out[101]["margin"] == 3
    assert out[101]["predicted_label"] == "a"


def test_trend_ols_recovers_exact_line_and_zero_fills(spark):
    """y = 2x + 3 daily counts recover slope 2 / intercept 3 exactly;
    a type observed only on the first and last day (zeros between, on
    the shared spine) gets the zero-filled trend, not a 2-point line."""
    import datetime
    import os
    import tempfile

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    rows, eid = [], 0
    for d in range(5):
        for _ in range(2 * d + 3):  # type a: exactly 2d+3 events on day d
            rows.append((eid, datetime.datetime(2024, 6, 1 + d, 12),
                         1, "a", 1.0, "{}")); eid += 1
    for d in (0, 4):  # type b: 5 events on day 0 and day 4 only
        for _ in range(5):
            rows.append((eid, datetime.datetime(2024, 6, 1 + d, 12),
                         1, "b", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["event_type"]: r
        for r in ANALYTICS_QUERIES["events_trend_ols"].fn(spark, d).collect()
    }
    assert out["a"]["n_days"] == 5
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 3.0
    # type b zero-filled: sums over y=(5,0,0,0,5) -> slope 0, mean 2
    assert out["b"]["slope"] == 0.0 and out["b"]["intercept"] == 2.0


def test_pii_card_luhn_separates_valid_from_near_miss(spark):
    """A doc carrying a Luhn-valid card, a near-miss (last digit off by
    one), and a short digit run: 2 candidates, exactly 1 valid; leading
    zeros don't change the checksum (zero terms)."""
    import os
    import tempfile

    from flux_spark.llm.queries import LLM_QUERIES

    rows = [
        # doc 1: %7/%11/%13 all miss -> only the inline numbers below
        (1, "pay 4111111111111111 or 4111111111111112 ref 555 12"),
        (2, "padded 0000079927398713 run"),  # classic 79927398713, padded
        (3, "no cards here 123456789012"),   # 12 digits: below threshold
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in LLM_QUERIES["doc_pii_card_luhn"].fn(spark, d).collect()
    }
    assert out[1]["n_card_like"] == 2
    assert out[1]["n_valid_cards"] == 1 and out[1]["n_invalid_cards"] == 1
    assert out[2]["n_valid_cards"] == 1  # leading zeros preserve validity
    assert 3 not in out


def test_hilbert_value_is_a_true_hilbert_curve(spark):
    """Bijection over the full 8x8 grid AND every consecutive rank pair
    is grid-adjacent (Manhattan distance exactly 1) — the property that
    distinguishes Hilbert from Morton/Z-order, which jumps quadrants."""
    from flux_spark.analytics.operators import hilbert_value

    cells = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(cells, "cx LONG, cy LONG")
    rows = hilbert_value(df, "cx", "cy", n_bits=3).collect()
    assert len(rows) == 64
    ranks = {r["hilbert"]: (r["cx"], r["cy"]) for r in rows}
    assert sorted(ranks) == list(range(64))  # bijection onto 0..63
    for i in range(63):
        (x1, y1), (x2, y2) = ranks[i], ranks[i + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (i, ranks[i], ranks[i + 1])


def test_hilbert_locality_beats_zorder_on_worst_jump(spark):
    """The worst consecutive-rank jump under Z-order on an 8x8 grid is
    far (crossing the main quadrant seam); under Hilbert it is 1."""
    from flux_spark.analytics.operators import hilbert_value, zorder_value
    from pyspark.sql import functions as F

    cells = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(cells, "cx LONG, cy LONG")
    h = {r["hilbert"]: (r["cx"], r["cy"])
         for r in hilbert_value(df, "cx", "cy", n_bits=3).collect()}
    z = {r["z"]: (r["cx"], r["cy"])
         for r in df.select(
             "cx", "cy",
             zorder_value(F.col("cx"), F.col("cy"), bits=3).alias("z")
         ).collect()}
    worst = lambda m: max(
        abs(m[i][0] - m[i + 1][0]) + abs(m[i][1] - m[i + 1][1])
        for i in range(len(m) - 1)
    )
    assert worst(h) == 1
    assert worst(z) > 1


def test_cms_join_estimate_upper_bounds_exact(spark, sf_dir):
    """CMS inner products can only OVER-estimate the true join size."""
    import flux_spark.analytics.sketch_queries  # noqa: F401 — registration
    from flux_spark.analytics.registry import ANALYTICS_QUERIES

    r = ANALYTICS_QUERIES["events_cms_join_estimate"].fn(
        spark, sf_dir
    ).first()
    assert r["est_join_size"] >= r["exact_join_size"] > 0
    assert r["overestimate_ratio"] >= 1.0


def test_retrieval_ndcg_bounds(spark, sf_dir):
    """MRR and NDCG live in [0, 1]; a query whose top hit is relevant
    has MRR exactly 1.0."""
    from flux_spark.llm.queries import LLM_QUERIES  # registers all domains

    rows = LLM_QUERIES["emb_retrieval_ndcg"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r["mrr"] <= 1.0
        if r["ndcg"] is not None:
            assert 0.0 <= r["ndcg"] <= 1.0 + 1e-12


class TestAttachGlobalOrder:
    """Two-pass global window (r9): equivalence vs the single-partition
    window it replaces, on adversarial shapes (ties, skew, empty)."""

    def _mk(self, spark, n=997, seed=7):
        from pyspark.sql import functions as F

        # deterministic pseudo-random weights + heavy duplicate keys
        return spark.range(n).select(
            F.col("id").alias("k"),
            F.pmod(F.col("id") * 2654435761, F.lit(1000003)).alias("w"),
            F.pmod(F.col("id"), F.lit(13)).alias("dup"),
        )

    def test_running_sum_matches_global_window(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from flux_spark.analytics.operators import attach_global_order

        df = self._mk(spark)
        got = attach_global_order(
            df, [F.col("k").asc()], running_sum=("w", "rs")
        )
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
        want = df.select(
            "k",
            F.coalesce(F.sum("w").over(w), F.lit(0))
            .cast("bigint")
            .alias("rs"),
        )
        assert (
            got.select("k", "rs").exceptAll(want).count() == 0
            and want.exceptAll(got.select("k", "rs")).count() == 0
        )

    def test_rank_and_total_with_ties(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from flux_spark.analytics.operators import attach_global_order

        df = self._mk(spark, n=500)
        # order by the 13-value dup column, tie-break on k (total order)
        got = attach_global_order(
            df,
            [F.col("dup").asc(), F.col("k").asc()],
            row_alias="r",
            total_alias="n",
        )
        w = Window.orderBy(F.col("dup").asc(), F.col("k").asc())
        want = df.select(
            "k",
            F.row_number().over(w).cast("bigint").alias("r"),
            F.count("*").over(Window.partitionBy()).cast("bigint").alias("n"),
        )
        assert (
            got.select("k", "r", "n").exceptAll(want).count() == 0
            and want.exceptAll(got.select("k", "r", "n")).count() == 0
        )

    def test_ntile_from_rank_matches_builtin(self, spark):
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from flux_spark.analytics.operators import (
            attach_global_order,
            ntile_from_rank,
        )

        for n, k in [(997, 5), (1000, 10), (7, 10), (13, 4)]:
            df = self._mk(spark, n=n)
            got = attach_global_order(
                df,
                [F.desc("w"), F.asc("k")],
                row_alias="r",
                total_alias="nn",
            ).select(
                "k", ntile_from_rank(F.col("r"), F.col("nn"), k).alias("t")
            )
            w = Window.orderBy(F.desc("w"), F.asc("k"))
            want = df.select("k", F.ntile(k).over(w).cast("int").alias("t"))
            assert (
                got.exceptAll(want).count() == 0
                and want.exceptAll(got).count() == 0
            ), f"n={n} k={k}"

    def test_empty_input(self, spark):
        from pyspark.sql import functions as F

        from flux_spark.analytics.operators import attach_global_order

        df = self._mk(spark).where(F.lit(False))
        out = attach_global_order(
            df, [F.col("k").asc()], row_alias="r", running_sum=("w", "rs")
        )
        assert out.count() == 0


def test_attach_global_order_tolerates_auto_shuffle_partitions(
    spark, monkeypatch
):
    """AQE-managed deployments report spark.sql.shuffle.partitions='auto'
    (a managed-platform extension OSS Spark won't even let a test SET, so
    the read is patched); the two-pass helper must fall back to
    defaultParallelism instead of raising ValueError (r10 advisor fix)."""
    from flux_spark.analytics.operators import attach_global_order

    df = spark.createDataFrame([(i,) for i in range(20)], "v int")
    real_get = spark.conf.get

    def fake_get(key, *args, **kwargs):
        if key == "spark.sql.shuffle.partitions":
            return "auto"
        return real_get(key, *args, **kwargs)

    monkeypatch.setattr(spark.conf, "get", fake_get)
    from pyspark.sql import functions as F

    got = attach_global_order(
        df, [F.asc("v")], row_alias="r", total_alias="n"
    ).collect()
    rows = sorted((x["v"], x["r"], x["n"]) for x in got)
    assert rows == [(i, i + 1, 20) for i in range(20)]


def test_dau_wau_mau_null_user_days_match_oracle(spark, tmp_path):
    """A day whose events ALL carry NULL user_id must still emit a
    dau=0/mau=0 row (the oracle's range join matches NULL-user activity;
    only the COUNTs skip NULLs), and its stickiness must be NULL, matching
    DuckDB's 0/0 double = NULL (advisor r10 catch — previously the NULL
    rows were filtered before the join and the day vanished)."""
    import datetime

    import duckdb

    from flux_spark.analytics.queries import ANALYTICS_QUERIES

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # day 0-1: real users; day 2: ONLY NULL-user events; day 40: isolated
    # NULL-only day whose whole trailing window is empty of real users
    for d, uid in [(0, 1), (0, 2), (1, 1), (2, None), (40, None)]:
        rows.append(
            (
                len(rows),
                base + datetime.timedelta(days=d, hours=3),
                uid,
                "click",
                1.0,
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf_dir}/events.parquet")

    def daykey(d):
        return d.date() if hasattr(d, "date") else d

    q = ANALYTICS_QUERIES["events_dau_wau_mau"]
    got = {
        daykey(r["day"]): (r["dau"], r["wau"], r["mau"], r["stickiness"])
        for r in q.fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    want = {
        daykey(r[0]): (r[1], r[2], r[3], r[4])
        for r in con.execute(q.oracle).fetchall()
    }
    assert set(got) == set(want) and len(got) == 4
    for day in want:
        assert got[day] == want[day], (day, got[day], want[day])
    # the NULL-only isolated day emits with NULL stickiness
    d40 = (base + datetime.timedelta(days=40)).date()
    assert got[d40] == (0, 0, 0, None)
