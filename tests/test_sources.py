"""External source/sink connector tests (flux_spark.sources)."""

import datetime

import pytest
from pyspark.sql import functions as F

from flux_spark import sources


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, datetime.datetime(2025, 1, 1, 12, 0, 0, 123456), "click", 0.07),
        (2, datetime.datetime(2025, 1, 1, 12, 30, 0, 999999), "view", 490.02),
        (3, datetime.datetime(2025, 1, 2, 0, 0, 0), "click", 1e-3),
    ]
    return spark.createDataFrame(
        rows, "id long, ts timestamp, kind string, value double"
    )


@pytest.mark.parametrize("fmt", sources.SUPPORTED_FORMATS)
def test_roundtrip_lossless(spark, sample, tmp_path, fmt):
    back = sources.roundtrip(sample, str(tmp_path / fmt), fmt)
    assert sorted(back.collect()) == sorted(sample.collect())
    assert back.schema == sample.schema


def test_unsupported_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        sources.read_source(spark, str(tmp_path), "avro")
    with pytest.raises(ValueError, match="unsupported format"):
        sources.write_sink(sample, str(tmp_path), "xml")


def test_partitioned_sink_layout(spark, sample, tmp_path):
    out = tmp_path / "part"
    sources.write_sink(sample, str(out), "parquet", partition_by=["kind"])
    # Hive-style partition dirs -> partition pruning at read time
    assert (out / "kind=click").is_dir() and (out / "kind=view").is_dir()
    back = sources.read_source(spark, str(out), "parquet")
    assert back.where(F.col("kind") == "click").count() == 2


def test_overwrite_partitions_touches_only_written_ones(spark, sample, tmp_path):
    out = str(tmp_path / "dyn")
    sources.write_sink(sample, out, "parquet", partition_by=["kind"])
    # reprocess only kind=click with corrected values
    fixed = sample.where(F.col("kind") == "click").withColumn(
        "value", F.col("value") * 2
    )
    sources.overwrite_partitions(fixed, out, ["kind"])
    back = sources.read_source(spark, out, "parquet")
    # click rows replaced (doubled), view rows untouched
    assert back.where(F.col("kind") == "click").count() == 2
    assert {r.value for r in back.where(F.col("kind") == "view").collect()} == {490.02}
    assert {round(r.value, 4) for r in back.where(F.col("kind") == "click").collect()} == {0.14, 0.002}
