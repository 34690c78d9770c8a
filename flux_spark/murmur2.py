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

    The hash arithmetic is fully numpy-vectorized: keys are packed into one
    padded uint8 matrix, the 4-byte mixing loop runs over *block columns*
    (so its trip count is max_key_len/4, not row count), and tail/avalanche
    steps are masked array ops. Python-per-row work is limited to utf-8
    encode + one C-level row copy — this keeps key routing off the critical
    path even for billion-row keyed ingest.

    The closure is deliberately self-contained (no references to module-level
    names) so cloudpickle ships it by value and executors never need
    ``flux_spark`` on their PYTHONPATH — it works on a bare cluster without
    ``--py-files``.
    """
    n = num_partitions

    @pandas_udf("int")
    def _route(keys: pd.Series) -> pd.Series:
        import numpy as np

        SEED, M, MASK = 0x9747B28C, 0x5BD1E995, 0xFFFFFFFF
        vals = keys.to_numpy(dtype=object)
        rows = len(vals)
        if rows == 0:
            return pd.Series([], dtype="Int32")
        null = np.array([v is None for v in vals])
        bs = [b"" if v is None else str(v).encode("utf-8") for v in vals]
        lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=rows)
        width = max(4, int(-(-max(lens.max(), 1) // 4) * 4))
        buf = np.zeros((rows, width), dtype=np.uint8)
        for i, b in enumerate(bs):
            if b:
                buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        blocks = buf.view("<u4").astype(np.uint64)  # (rows, width//4)
        nblocks = lens // 4

        h = (np.uint64(SEED) ^ lens.astype(np.uint64)) & MASK
        for j in range(blocks.shape[1]):
            active = nblocks > j
            if not active.any():
                break
            k = blocks[:, j]
            k = (k * M) & MASK
            k ^= k >> np.uint64(24)
            k = (k * M) & MASK
            h2 = (((h * M) & MASK) ^ k) & MASK
            h = np.where(active, h2, h)

        rem = lens % 4
        end = nblocks * 4
        idx = np.arange(rows)
        b0 = buf[idx, np.minimum(end, width - 1)].astype(np.uint64)
        b1 = buf[idx, np.minimum(end + 1, width - 1)].astype(np.uint64)
        b2 = buf[idx, np.minimum(end + 2, width - 1)].astype(np.uint64)
        h = np.where(rem == 3, h ^ (b2 << np.uint64(16)), h)
        h = np.where(rem >= 2, h ^ (b1 << np.uint64(8)), h)
        h = np.where(rem >= 1, ((h ^ b0) * M) & MASK, h)

        h ^= h >> np.uint64(13)
        h = (h * M) & MASK
        h ^= h >> np.uint64(15)
        part = ((h & np.uint64(0x7FFFFFFF)) % np.uint64(n)).astype("int64")
        out = pd.array(part, dtype="Int32")
        out[null] = pd.NA
        return pd.Series(out)

    return _route
