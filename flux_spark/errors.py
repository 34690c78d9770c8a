"""Error types mirroring the reference's validation semantics.

Reference: server/internal/Broker.java:340-353 (topic validation),
commons/utils/PartitionSelector.java:26 (InvalidTopicException).
"""


class FluxError(Exception):
    """Base error for the flux_spark engine."""


class InvalidTopicError(FluxError):
    """Topic does not exist or has an invalid name.

    Mirrors InvalidTopicException (PartitionSelector.java:26).
    """


class TopicExistsError(FluxError):
    """Topic already exists (Broker.java:344-346)."""


class ValidationError(FluxError):
    """Invalid topic spec: partitions < 1 or replication factor out of
    [0, 3] (Broker.java:347-352)."""


class OffsetOutOfRangeError(FluxError):
    """Requested offset is beyond the partition's high-water mark."""


class RebalanceInProgressError(FluxError):
    """Consumer group is mid-rebalance; caller should rejoin
    (GroupCoordinatorServiceImpl.java:46-148 REBALANCING status)."""


class UnknownMemberError(FluxError):
    """Member id not registered with the group coordinator."""


class IncompatibleWarehouseError(FluxError):
    """The warehouse on disk was written under a different storage format
    (e.g. a different writer-lock layout) — mixed-version writers cannot
    safely share it."""
