"""Murmur2 routing parity (R2, producer/MurmurHash2.java:12-59)."""

import random

from flux_spark.murmur2 import murmur2, partition_for_key

# Pinned vectors (computed once from the published algorithm, cross-checked
# against the independent re-derivation below); they freeze tail handling,
# masking, and signedness against accidental edits.
KNOWN = {
    b"": 275646681,
    b"a": -1563381124,
    b"ab": 316155434,
    b"abc": 479470107,
    b"abcd": -1323649548,
    b"hello world": 1221641059,
}


def _reference_murmur2(data: bytes) -> int:
    """Independent straight-line re-derivation used to cross-check."""
    m = 0x5BD1E995
    mask = 0xFFFFFFFF
    h = (0x9747B28C ^ len(data)) & mask
    n = len(data) // 4
    for i in range(n):
        k = (
            data[4 * i]
            | (data[4 * i + 1] << 8)
            | (data[4 * i + 2] << 16)
            | (data[4 * i + 3] << 24)
        )
        k = (k * m) & mask
        k ^= k >> 24
        k = (k * m) & mask
        h = ((h * m) & mask) ^ k
    tail = len(data) % 4
    base = 4 * n
    if tail == 3:
        h ^= data[base + 2] << 16
    if tail >= 2:
        h ^= data[base + 1] << 8
    if tail >= 1:
        h ^= data[base]
        h = (h * m) & mask
    h ^= h >> 13
    h = (h * m) & mask
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h


def test_cross_check_random():
    rng = random.Random(42)
    for _ in range(500):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        assert murmur2(data) == _reference_murmur2(data)


def test_signed_int32_range():
    rng = random.Random(7)
    for _ in range(200):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        v = murmur2(data)
        assert -(2**31) <= v < 2**31


def test_partition_for_key_mask_and_mod():
    for key in ["", "a", "key-1", "key-2", "user-42", "éè"]:
        for n in [1, 3, 5, 7]:
            p = partition_for_key(key, n)
            assert 0 <= p < n
            assert p == (murmur2(key.encode()) & 0x7FFFFFFF) % n


def test_known_vectors():
    for data, expected in KNOWN.items():
        assert murmur2(data) == expected
        assert _reference_murmur2(data) == expected


def test_vectorized_udf_matches_scalar_fuzz(spark):
    """Fuzz the numpy-vectorized routing UDF against the scalar reference:
    mixed lengths (all rem classes), unicode multibyte, empty, long, null."""
    import random

    from pyspark.sql import functions as F

    from flux_spark.murmur2 import murmur2_partition_udf, partition_for_key

    rng = random.Random(7)
    pool = "abcdefghijklmnopqrstuvwxyz0123456789-_.éßñ漢字🚀"
    keys = [""] + [
        "".join(rng.choice(pool) for _ in range(rng.randint(1, 67)))
        for _ in range(500)
    ]
    n = 12
    df = spark.createDataFrame([(k,) for k in keys], "key string").withColumn(
        "p", murmur2_partition_udf(n)(F.col("key"))
    )
    got = {r.key: r.p for r in df.collect()}
    for k in keys:
        assert got[k] == partition_for_key(k, n), repr(k)
    # nulls stay null
    null_df = spark.createDataFrame([(None,)], "key string").withColumn(
        "p", murmur2_partition_udf(n)(F.col("key"))
    )
    assert null_df.collect()[0].p is None
