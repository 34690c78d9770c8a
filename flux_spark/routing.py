"""Partition routing — the only row-level computation in the reference.

Mirrors commons/utils/PartitionSelector.java:22-51 priority routing:

1. explicit partition, if within the topic's valid range;
2. else MurmurHash2(key) masked positive, mod num_partitions;
3. else round-robin across the topic's partitions.

Expressed as a single Catalyst ``coalesce`` so routing fuses into the ingest
plan (one projection, no extra pass). Only the keyed branch leaves the JVM
(pandas UDF, see murmur2.py); unkeyed and explicit routing stay in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .murmur2 import murmur2_partition_udf


def round_robin_expr(num_partitions: int, ordering: Column | None = None) -> Column:
    """Round-robin partition assignment (PartitionSelector.java:20,50).

    With an explicit ``ordering`` column (a dense arrival sequence) this is a
    true round-robin. Without one it spreads via
    ``monotonically_increasing_id``: ids are dense *within* each input split,
    so the distribution is still near-uniform, without requiring a global
    counter (which would serialize the pipeline at scale).
    """
    seq = ordering if ordering is not None else F.monotonically_increasing_id()
    return F.pmod(seq, F.lit(num_partitions)).cast("int")


def assign_partitions(
    df: DataFrame,
    num_partitions: int,
    partition_col: str = "partition",
    key_col: str = "key",
    ordering_col: str | None = None,
) -> DataFrame:
    """Resolve the final partition id for every record."""
    n = num_partitions
    has_partition = partition_col in df.columns
    has_key = key_col in df.columns

    branches: list[Column] = []
    if has_partition:
        p = F.col(partition_col).cast("int")
        # invalid (out-of-range) explicit partitions fall through to key
        # hashing, like PartitionSelector.java:28-35.
        branches.append(F.when((p >= 0) & (p < n), p))
    if has_key:
        # Empty-string keys fall through to round-robin like missing keys
        # (PartitionSelector.java:43-50,79-101 treats "" as absent).
        branches.append(
            F.when(
                F.col(key_col).isNotNull() & (F.length(key_col) > 0),
                murmur2_partition_udf(n)(F.col(key_col)),
            )
        )
    branches.append(
        round_robin_expr(n, F.col(ordering_col) if ordering_col else None)
    )
    return df.withColumn(partition_col, F.coalesce(*branches).cast("int"))
