"""Kafka-compatible 32-bit MurmurHash2 for key -> partition routing.

The reference routes keyed records with MurmurHash2 seeded 0x9747b28c and a
positive mask before the modulo (producer/MurmurHash2.java:12-59,
commons/utils/PartitionSelector.java:79-101). Spark's built-in ``hash()`` is
Murmur**3**, so byte-compatible placement needs this implementation. The
algorithm itself is the public-domain MurmurHash2 (Austin Appleby), identical
to Apache Kafka's ``Utils.murmur2``.

Two forms are provided:

* :func:`murmur2` — pure-Python scalar, used driver-side and in tests.
* :func:`murmur2_partition_udf` — an Arrow-batched pandas UDF for routing a
  whole DataFrame column. Routing is only needed once per ingested record, and
  the per-batch Python cost is tiny relative to the shuffle + parquet write it
  feeds, so a pandas UDF (not a row-at-a-time UDF) is the right scale
  trade-off.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

_SEED = 0x9747B28C
_M = 0x5BD1E995
_MASK32 = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """32-bit MurmurHash2 of ``data``; returns a *signed* int32 like Java."""
    length = len(data)
    h = (_SEED ^ length) & _MASK32
    end = length - (length % 4)
    for i in range(0, end, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * _M) & _MASK32
        k ^= k >> 24
        k = (k * _M) & _MASK32
        h = (h * _M) & _MASK32
        h ^= k
    rem = length % 4
    if rem == 3:
        h ^= (data[end + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[end + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[end] & 0xFF
        h = (h * _M) & _MASK32
    h ^= h >> 13
    h = (h * _M) & _MASK32
    h ^= h >> 15
    # to signed int32
    return h - (1 << 32) if h >= (1 << 31) else h


def partition_for_key(key: str, num_partitions: int) -> int:
    """``(murmur2(key) & 0x7fffffff) % n`` — PartitionSelector.java:79-101."""
    return (murmur2(key.encode("utf-8")) & 0x7FFFFFFF) % num_partitions


def murmur2_partition_udf(num_partitions: int):
    """Pandas UDF: string key column -> partition id in [0, num_partitions).

    The closure is deliberately self-contained (no references to module-level
    names) so cloudpickle ships it by value and executors never need
    ``flux_spark`` on their PYTHONPATH — it works on a bare cluster without
    ``--py-files``.
    """
    n = num_partitions

    @pandas_udf("int")
    def _route(keys: pd.Series) -> pd.Series:
        seed, m, mask = 0x9747B28C, 0x5BD1E995, 0xFFFFFFFF

        def _mm2_partition(key):
            if key is None:
                return None
            data = key.encode("utf-8")
            length = len(data)
            h = (seed ^ length) & mask
            end = length - (length % 4)
            for i in range(0, end, 4):
                k = int.from_bytes(data[i : i + 4], "little")
                k = (k * m) & mask
                k ^= k >> 24
                k = (k * m) & mask
                h = (h * m) & mask
                h ^= k
            rem = length % 4
            if rem == 3:
                h ^= (data[end + 2] & 0xFF) << 16
            if rem >= 2:
                h ^= (data[end + 1] & 0xFF) << 8
            if rem >= 1:
                h ^= data[end] & 0xFF
                h = (h * m) & mask
            h ^= h >> 13
            h = (h * m) & mask
            h ^= h >> 15
            return (h & 0x7FFFFFFF) % n

        return keys.map(_mm2_partition).astype("Int32")

    return _route
