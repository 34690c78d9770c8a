"""External source/sink connectors for the analytics layer.

The reference's storage surface is its own .log/.index segment files
(server/internal/storage/LogSegment.java) — mapped to Parquet topic logs in
``log.py``. This module is the *interchange* surface a Spark-native engine
adds on top: reading and writing the formats data actually arrives in
(CSV, JSON lines, Parquet, ORC) with one consistent API, so external feeds
can be routed into topic logs and topic/query results exported back out.

Scale notes:

* Readers hand Catalyst a declarative scan — column pruning and (for
  columnar formats) predicate pushdown stay available; ``.explain`` shows
  PushedFilters for parquet/orc sources.
* For text formats a schema should be supplied (or inferred once and
  reused): schema inference re-reads the input, which at 100 TB is a full
  extra pass.
* Writers default to snappy/zstd-compressed columnar output and accept
  ``partition_by`` so big exports lay out as partition-pruned directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc")

# per-format reader defaults chosen for lossless round-trips
_READ_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {
        "header": "true",
        # preserve full microsecond precision on timestamp columns
        # (timestampFormat covers TIMESTAMP; NTZ columns use the separate
        # timestampNTZFormat option, whose default truncates to millis)
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    },
    "json": {
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    },
}

_WRITE_DEFAULTS: dict[str, dict[str, str]] = {
    "csv": {
        "header": "true",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    },
    "json": {
        "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
        "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    },
}


def _check_format(fmt: str) -> str:
    fmt = fmt.lower()
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported format {fmt!r}; expected one of {SUPPORTED_FORMATS}"
        )
    return fmt


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read an external dataset as a DataFrame.

    ``schema`` is strongly recommended for csv/json (skips the inference
    pass and pins types for lossless round-trips). Extra ``options`` pass
    through to the underlying Spark reader.
    """
    fmt = _check_format(fmt)
    reader = spark.read.format(fmt)
    for k, v in {**_READ_DEFAULTS.get(fmt, {}), **options}.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Write a DataFrame to an external dataset.

    ``partition_by`` produces Hive-style partition directories (the layout
    partition pruning needs); text formats get round-trip-safe timestamp
    defaults. The write inherits Spark's commit protocol, so output is
    all-or-nothing per job like topic-log appends.
    """
    fmt = _check_format(fmt)
    writer = df.write.format(fmt).mode(mode)
    for k, v in {**_WRITE_DEFAULTS.get(fmt, {}), **options}.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    **options: str,
) -> None:
    """Backfill primitive: overwrite ONLY the partition directories present
    in ``df``, leaving every other partition untouched (dynamic partition
    overwrite — plain ``mode("overwrite")`` would truncate the whole
    dataset). This is how a 100 TB date-partitioned table reprocesses one
    bad day: the job writes that day's partitions and nothing else is
    touched, atomically per partition via the file-commit protocol.
    """
    fmt = _check_format(fmt)
    writer = (
        df.write.format(fmt)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
    )
    for k, v in {**_WRITE_DEFAULTS.get(fmt, {}), **options}.items():
        writer = writer.option(k, v)
    writer.partitionBy(*partition_by).save(path)


def roundtrip(
    df: DataFrame, path: str, fmt: str, schema: StructType | str | None = None
) -> DataFrame:
    """Write ``df`` to ``path`` in ``fmt`` and read it back with the same
    (or given) schema — the correctness harness for connector losslessness."""
    write_sink(df, path, fmt, mode="overwrite")
    return read_source(
        df.sparkSession, path, fmt, schema=schema or df.schema
    )
