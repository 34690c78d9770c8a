"""Consumer-group partition assignors — pure functions.

Re-implements (from the behavioral spec in SURVEY.md §2.5/FIXTURES.md F5, not
the Java source) the three assignors:

* range       — consumer/assignors/RangeAssignor.java:14-77
* roundrobin  — consumer/assignors/RoundRobinAssignor.java:15-75
* sticky      — consumer/assignors/StickyAssignor.java:41-145

Inputs: sorted member ids and a ``topic -> partition_count`` map; sticky also
takes the previous ``member -> topic -> [partition]`` assignment. Outputs a
``member -> topic -> sorted [partition]`` map. These run driver-side on
O(members × partitions) data — no Spark involvement needed or wanted.
"""

from __future__ import annotations

import heapq
import math

Assignment = dict[str, dict[str, list[int]]]


def _empty(members: list[str]) -> Assignment:
    return {m: {} for m in members}


def range_assign(members: list[str], topic_partitions: dict[str, int]) -> Assignment:
    """Per topic: contiguous blocks of floor(P/M); first P%M members get +1."""
    out = _empty(members)
    ms = sorted(members)
    if not ms:
        return out
    for topic in sorted(topic_partitions):
        p = topic_partitions[topic]
        if p <= 0:
            continue
        q, r = divmod(p, len(ms))
        start = 0
        for i, m in enumerate(ms):
            count = q + (1 if i < r else 0)
            if count:
                out[m][topic] = list(range(start, start + count))
            start += count
    return out


def round_robin_assign(
    members: list[str], topic_partitions: dict[str, int]
) -> Assignment:
    """Flatten the sorted (topic, partition) universe, deal cyclically to
    sorted members."""
    out = _empty(members)
    ms = sorted(members)
    if not ms:
        return out
    universe = [
        (t, p)
        for t in sorted(topic_partitions)
        for p in range(topic_partitions[t])
    ]
    for i, (t, p) in enumerate(universe):
        m = ms[i % len(ms)]
        out[m].setdefault(t, []).append(p)
    for m in out:
        for t in out[m]:
            out[m][t].sort()
    return out


def sticky_assign(
    members: list[str],
    topic_partitions: dict[str, int],
    previous: Assignment | None = None,
) -> Assignment:
    """Phase 1: preserve each member's previous partitions (that still exist)
    up to ceil(P/M); phase 2: distribute the rest via a min-heap keyed by
    (load, member_id)."""
    out = _empty(members)
    ms = sorted(members)
    if not ms:
        return out
    previous = previous or {}
    universe = {
        (t, p)
        for t in topic_partitions
        for p in range(topic_partitions[t])
    }
    total = len(universe)
    cap = math.ceil(total / len(ms)) if total else 0

    unassigned = set(universe)
    load: dict[str, int] = {m: 0 for m in ms}
    for m in ms:
        for t, parts in sorted(previous.get(m, {}).items()):
            for p in sorted(parts):
                if load[m] >= cap:
                    break
                if (t, p) in unassigned:
                    out[m].setdefault(t, []).append(p)
                    unassigned.discard((t, p))
                    load[m] += 1

    heap = [(load[m], m) for m in ms]
    heapq.heapify(heap)
    for t, p in sorted(unassigned):
        l, m = heapq.heappop(heap)
        out[m].setdefault(t, []).append(p)
        heapq.heappush(heap, (l + 1, m))
    for m in out:
        for t in out[m]:
            out[m][t].sort()
    return out


ASSIGNORS = {
    "range": lambda members, tps, prev=None: range_assign(members, tps),
    "roundrobin": lambda members, tps, prev=None: round_robin_assign(members, tps),
    "sticky": sticky_assign,
}


def get_assignor(name: str):
    """Negotiated protocol name -> assignor; default range
    (FluxConsumer.java:186-193)."""
    return ASSIGNORS.get(name, ASSIGNORS["range"])
