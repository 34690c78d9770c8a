"""Topic catalog: the engine's metadata plane.

Replaces the reference's broker/controller metadata stack
(metadata/InMemoryTopicMetadataRepository.java:24-79,
metadata/snapshots/ClusterSnapshot.java) with a driver-side catalog persisted
as JSON in the warehouse. Topic validation mirrors Broker.java:340-353:
non-empty unique name, partitions >= 1, 0 <= replication_factor <= 3.

Scale note: catalog state is O(#topics) — a few KB even with thousands of
topics — so a JSON file with atomic replace is appropriate; on a real cluster
this would live in a metastore / Delta commit log, and the high-water-mark map
would be updated by the same transaction that commits data files. Writes are
serialized by a per-process RLock AND a warehouse-level ``flock`` file lock,
so two DRIVER PROCESSES sharing one warehouse cannot interleave the
read-modify-write of the hwm (the lock auto-releases on process death —
no stale-lock recovery needed). Ingest is additionally single-writer per
topic (PartitionWriteManager.java:17-84 analog) via LogStore's per-topic
thread + file locks.
"""

from __future__ import annotations

import contextlib
import json
import os
import re
import tempfile
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path

from .errors import (
    IncompatibleWarehouseError,
    InvalidTopicError,
    TopicExistsError,
    ValidationError,
)

_CATALOG_FILE = "_catalog.json"
_CATALOG_LOCK_FILE = ".catalog.lock"
# Warehouse storage-format generation. Bumped to 2 when the per-topic
# writer lock moved from <topic>/.ingest.lock to .locks/<topic>.lock (the
# atomic-swap fix): a writer running the format-1 code locks the OLD path,
# so format-1 and format-2 writers sharing a warehouse would not exclude
# each other and could mint duplicate offsets during a rolling upgrade.
# The marker makes that mix loud: format-2 code refuses any warehouse
# whose catalog declares a different format. Catalogs written before the
# marker existed carry no "format" key and are AMBIGUOUS — the marker
# shipped at least one release after the lock move, so a keyless
# warehouse may be either layout. _load backfills heuristically: a
# format-1 writer leaves its lock at <topic>/.ingest.lock, so any such
# file marks the warehouse format 1 (refused); otherwise it is accepted
# as format 2 and stamped on next save.
_WAREHOUSE_FORMAT = 2
_TOPIC_NAME_RE = re.compile(r"^[A-Za-z0-9._-]+$")
# committed-batch ids retained per topic for idempotent-produce replay
# detection; FIFO-pruned so the catalog file stays O(KB). 4096 in-flight
# retried batches per topic is far beyond any real producer's replay window.
_MAX_COMMITTED_BATCHES = 4096


@contextlib.contextmanager
def file_lock(path: Path):
    """Advisory inter-process exclusive lock (``flock``). Blocks until
    acquired; the kernel releases it automatically if the holder dies, so
    there is no stale-lock state to recover. Reentrant per-process usage is
    prevented by the callers' threading locks, which are always taken
    first."""
    import fcntl

    path.parent.mkdir(parents=True, exist_ok=True)
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        # closing the fd releases the flock
        os.close(fd)


_SWAP_BACKUP_SUFFIX = ".swap-backup"


def _swap_backup_path(live: Path) -> Path:
    return live.parent / (live.name + _SWAP_BACKUP_SUFFIX)


def atomic_dir_swap(live: Path, tmp: Path, guard: Path) -> None:
    """Replace directory ``live`` with freshly-written ``tmp``.

    POSIX rename cannot atomically replace a non-empty directory, so every
    rewrite (compact / truncate / offsets compaction / rollup refresh) is
    two renames — and a process dying between them used to leave NO live
    directory, with the data stranded in a uuid-named backup nothing could
    find: readers silently saw an empty store, and a subsequent append
    would resurrect the path empty, turning the crash into data loss.

    Fix: the backup name is DETERMINISTIC (``<name>.swap-backup`` beside
    ``live``), and both renames happen under the warehouse-level ``guard``
    flock that :func:`recover_dir_swap` also takes — so a reader either
    waits out an in-flight swap or finds the marker and restores it.
    Callers must additionally hold whatever lock serializes writers of
    ``live`` (the topic write lock / offsets lock), as before.
    """
    import shutil

    live, tmp = Path(live), Path(tmp)
    backup = _swap_backup_path(live)
    with file_lock(guard):
        if backup.exists():
            # previous swap completed its second rename but died before
            # cleanup; the backup is stale
            shutil.rmtree(backup)
        os.replace(live, backup)
        os.replace(tmp, live)
        shutil.rmtree(backup, ignore_errors=True)


def recover_dir_swap(live: Path, guard: Path) -> bool:
    """Finish a :func:`atomic_dir_swap` interrupted between its renames:
    if ``live`` is missing but its deterministic backup exists, restore
    the backup (the interrupted rewrite's effect is lost — maintenance
    rewrites are idempotent and simply run again). If both exist, the
    swap completed and only cleanup was lost — drop the stale backup.
    Cheap when nothing is wrong (one ``exists`` check, no lock). Returns
    True iff a restore happened."""
    import shutil

    live = Path(live)
    backup = _swap_backup_path(live)
    if not backup.exists():
        return False
    with file_lock(guard):
        # re-check under the lock: an in-flight swap holds `guard` across
        # both renames, so by the time we get here it either finished
        # (live exists, backup gone or stale) or died mid-way
        if not backup.exists():
            return False
        if live.exists():
            shutil.rmtree(backup, ignore_errors=True)
            return False
        os.replace(backup, live)
        return True


@dataclass
class TopicMetadata:
    """FluxTopic + PartitionMetadata analog (commons/FluxTopic.java:7-16)."""

    name: str
    num_partitions: int
    replication_factor: int = 1
    created_at: float = 0.0
    # next offset to assign, per partition id (the high-water mark).
    hwm: dict[int, int] = field(default_factory=dict)
    # Kafka-style per-topic configs (e.g. "retention.ms"); free-form strings
    configs: dict[str, str] = field(default_factory=dict)

    def partition_ids(self) -> list[int]:
        # Partitions are 0-indexed per topic (Broker.java:105-110).
        return list(range(self.num_partitions))

    def next_offset(self, partition: int) -> int:
        return self.hwm.get(partition, 0)


class Catalog:
    def __init__(self, warehouse: str | os.PathLike):
        self.warehouse = Path(warehouse)
        self.warehouse.mkdir(parents=True, exist_ok=True)
        self._lock = threading.RLock()

    @contextlib.contextmanager
    def _xlock(self):
        """Mutation guard: in-process RLock (serializes threads, and makes
        the flock below safe — flock conflicts between two fds of ONE
        process too) + warehouse flock (serializes processes)."""
        with self._lock, file_lock(self.warehouse / _CATALOG_LOCK_FILE):
            yield

    # -- persistence -------------------------------------------------------
    @property
    def _path(self) -> Path:
        return self.warehouse / _CATALOG_FILE

    def _load(self) -> dict:
        if not self._path.exists():
            return {"topics": {}, "format": _WAREHOUSE_FORMAT}
        with open(self._path) as f:
            state = json.load(f)
        fmt = state.get("format")
        if fmt is None:
            # keyless = pre-marker catalog: format 1 or 2 (see module
            # comment). A format-1 writer's per-topic lock lives at
            # <topic>/.ingest.lock; its presence means old-layout writers
            # have used this warehouse -> refuse rather than risk the
            # duplicate-offset hazard the marker exists to close.
            old_locks = any(
                (self.warehouse / t / ".ingest.lock").exists()
                for t in state.get("topics", {})
            )
            fmt = 1 if old_locks else _WAREHOUSE_FORMAT
        if fmt != _WAREHOUSE_FORMAT:
            raise IncompatibleWarehouseError(
                f"warehouse {self.warehouse} declares storage format {fmt}; "
                f"this engine writes format {_WAREHOUSE_FORMAT} (writer-lock "
                f"layout changed — mixed-version writers cannot safely share "
                f"a warehouse; migrate or upgrade all writers)"
            )
        return state

    def _save(self, state: dict) -> None:
        # Atomic replace so readers never see a torn file.
        state["format"] = _WAREHOUSE_FORMAT
        fd, tmp = tempfile.mkstemp(dir=self.warehouse, prefix=".catalog-")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=1, sort_keys=True)
            os.replace(tmp, self._path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    @staticmethod
    def _to_meta(name: str, raw: dict) -> TopicMetadata:
        return TopicMetadata(
            name=name,
            num_partitions=raw["num_partitions"],
            replication_factor=raw.get("replication_factor", 1),
            created_at=raw.get("created_at", 0.0),
            hwm={int(k): v for k, v in raw.get("hwm", {}).items()},
            configs=dict(raw.get("configs", {})),
        )

    # -- DDL (A1-A3) -------------------------------------------------------
    def create_topic(
        self,
        name: str,
        num_partitions: int,
        replication_factor: int = 1,
        configs: dict[str, str] | None = None,
    ) -> TopicMetadata:
        """Validated create — Broker.createTopics (Broker.java:87-116)."""
        if not name or not name.strip():
            raise ValidationError("topic name must be non-empty")
        if not _TOPIC_NAME_RE.match(name):
            raise ValidationError(f"invalid topic name {name!r}")
        if name.endswith(_SWAP_BACKUP_SUFFIX):
            raise ValidationError(
                f"topic name {name!r} collides with the reserved "
                f"'{_SWAP_BACKUP_SUFFIX}' crash-recovery suffix"
            )
        if num_partitions < 1:
            raise ValidationError("num_partitions must be >= 1")
        if not (0 <= replication_factor <= 3):
            raise ValidationError("replication_factor must be in [0, 3]")
        with self._xlock():
            state = self._load()
            if name in state["topics"]:
                raise TopicExistsError(f"topic {name!r} already exists")
            state["topics"][name] = {
                "num_partitions": num_partitions,
                "replication_factor": replication_factor,
                "created_at": time.time(),
                "hwm": {},
                "configs": {str(k): str(v) for k, v in (configs or {}).items()},
            }
            self._save(state)
            # Eagerly create partition dirs like Partition.java:14-19 does
            # for log/index files.
            for p in range(num_partitions):
                (self.warehouse / name / f"partition={p}").mkdir(
                    parents=True, exist_ok=True
                )
            return self._to_meta(name, state["topics"][name])

    def delete_topic(self, name: str, drop_data: bool = False) -> None:
        """InMemoryTopicMetadataRepository.deleteTopic (44-49); the reference
        does no disk GC — data drop is opt-in here."""
        with self._xlock():
            state = self._load()
            if name not in state["topics"]:
                raise InvalidTopicError(f"topic {name!r} does not exist")
            del state["topics"][name]
            self._save(state)
        if drop_data:
            import shutil

            # serialize against an in-flight rewrite of this topic: take
            # the topic write lock (so no compactor is mid-swap) and the
            # swap guard (so no recovery interleaves). Without these, the
            # rmtree could delete a compactor's mid-swap backup out from
            # under it — or the compactor's second rename could resurrect
            # the "deleted" topic from its tmp directory.
            with file_lock(self.warehouse / ".locks" / f"{name}.lock"), file_lock(
                self.warehouse / ".swap.lock"
            ):
                shutil.rmtree(self.warehouse / name, ignore_errors=True)
                # a crash-recovery backup for this topic is now orphaned
                # data from a deleted namespace — drop it too, or a
                # re-created topic of the same name could "recover" the
                # old contents
                shutil.rmtree(
                    _swap_backup_path(self.warehouse / name),
                    ignore_errors=True,
                )

    def topic_exists(self, name: str) -> bool:
        return name in self._load()["topics"]

    def get_topic(self, name: str) -> TopicMetadata:
        state = self._load()
        if name not in state["topics"]:
            raise InvalidTopicError(f"topic {name!r} does not exist")
        return self._to_meta(name, state["topics"][name])

    def list_topics(self) -> list[str]:
        """getActiveTopics (InMemoryTopicMetadataRepository.java:57-63)."""
        return sorted(self._load()["topics"].keys())

    def partitions_for(self, name: str) -> list[int]:
        return self.get_topic(name).partition_ids()

    def create_partitions(self, name: str, new_total: int) -> TopicMetadata:
        """Kafka AdminClient.createPartitions analog: grow a topic to
        ``new_total`` partitions. Only increases are allowed (like Kafka —
        shrinking would orphan data). Existing partitions and their
        offsets are untouched; new partitions start empty at offset 0.

        Same caveat as Kafka: key->partition placement is hash(key) %
        num_partitions, so records keyed AFTER the grow may land on a
        different partition than records with the same key produced
        before it. Per-key ordering is only guaranteed within each epoch;
        compaction/materialization handle cross-partition keys by design
        (latest-wins is offset+partition based, not placement based).
        """
        if new_total < 1:
            raise ValidationError("new_total must be >= 1")
        with self._xlock():
            state = self._load()
            if name not in state["topics"]:
                raise InvalidTopicError(f"topic {name!r} does not exist")
            cur = state["topics"][name]["num_partitions"]
            if new_total <= cur:
                raise ValidationError(
                    f"new_total ({new_total}) must exceed current partition "
                    f"count ({cur}); Kafka topics cannot shrink"
                )
            state["topics"][name]["num_partitions"] = new_total
            self._save(state)
            for p in range(cur, new_total):
                (self.warehouse / name / f"partition={p}").mkdir(
                    parents=True, exist_ok=True
                )
            return self._to_meta(name, state["topics"][name])

    def set_topic_config(self, name: str, key: str, value: str) -> None:
        """Kafka alterConfigs analog: set one per-topic config entry
        (e.g. ``retention.ms``). Consumed by maintenance jobs like
        ``LogStore.apply_retention``."""
        with self._xlock():
            state = self._load()
            if name not in state["topics"]:
                raise InvalidTopicError(f"topic {name!r} does not exist")
            state["topics"][name].setdefault("configs", {})[str(key)] = str(
                value
            )
            self._save(state)

    # -- hwm maintenance (called by LogStore under the ingest lock) --------
    def advance_hwm(
        self,
        name: str,
        new_next_offsets: dict[int, int],
        batch_id: str | None = None,
    ) -> None:
        """Advance the high-water marks; with ``batch_id``, record the
        batch as committed IN THE SAME atomic catalog save — this is the
        commit point of the idempotent-produce protocol (LogStore.append).
        A crash before this save leaves neither the hwm advance nor the
        batch marker; a crash after leaves both. There is no intermediate
        state, so a same-batch_id retry can never re-append a batch whose
        hwm already advanced (ADVICE r3: the old touch-file marker was
        written after the hwm save, leaving a duplicate-visible window)."""
        with self._xlock():
            state = self._load()
            if name not in state["topics"]:
                raise InvalidTopicError(f"topic {name!r} does not exist")
            topic = state["topics"][name]
            hwm = topic.setdefault("hwm", {})
            for p, nxt in new_next_offsets.items():
                hwm[str(p)] = max(int(hwm.get(str(p), 0)), int(nxt))
            if batch_id is not None:
                batches = topic.setdefault("committed_batches", {})
                batches[str(batch_id)] = {
                    str(p): int(nxt) for p, nxt in new_next_offsets.items()
                }
                while len(batches) > _MAX_COMMITTED_BATCHES:
                    batches.pop(next(iter(batches)))  # FIFO prune (json
                    # object order == insertion order)
            self._save(state)

    def batch_committed(self, name: str, batch_id: str) -> bool:
        """True iff ``batch_id`` was committed to ``name`` by a prior
        :meth:`advance_hwm` (the replay-detection read of the idempotent
        produce protocol)."""
        state = self._load()
        if name not in state["topics"]:
            raise InvalidTopicError(f"topic {name!r} does not exist")
        return str(batch_id) in state["topics"][name].get(
            "committed_batches", {}
        )
