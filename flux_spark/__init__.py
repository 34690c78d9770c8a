"""flux_spark — a PySpark-native event-log engine with the capabilities of
tferdous17/flux (Kafka-style topic/partition/offset logs) plus an analytics
and LLM-data-pipeline layer designed for 100 TB scale.

Storage: Parquet topic logs (`warehouse/<topic>/partition=<p>/`), gap-free
per-partition offsets, rowgroup-stat point reads.
APIs: Admin (catalog), FluxProducer, FluxConsumer (+ consumer groups),
Structured Streaming readers/writers, DataFrame analytics.
"""

from . import rollup, sources, streaming
from .catalog import Catalog, TopicMetadata
from .consumer import (
    FluxConsumer,
    OffsetStore,
    PollResult,
    consumer_from_properties,
)
from .coordinator import GroupCoordinator
from .errors import (
    FluxError,
    InvalidTopicError,
    TopicExistsError,
    ValidationError,
)
from .log import LogStore
from .murmur2 import murmur2, partition_for_key
from .producer import FluxProducer, producer_from_properties
from .session import get_spark

__all__ = [
    "Catalog",
    "TopicMetadata",
    "FluxConsumer",
    "OffsetStore",
    "PollResult",
    "GroupCoordinator",
    "FluxError",
    "InvalidTopicError",
    "TopicExistsError",
    "ValidationError",
    "LogStore",
    "murmur2",
    "partition_for_key",
    "FluxProducer",
    "producer_from_properties",
    "consumer_from_properties",
    "get_spark",
    "rollup",
    "sources",
    "streaming",
]

__version__ = "0.1.0"
