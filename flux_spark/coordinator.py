"""Driver-side consumer-group coordinator.

Re-implements the JoinGroup/SyncGroup state machine
(grpc/services/GroupCoordinatorServiceImpl.java:46-148, GroupState.java:6-19,
MemberRecord.java:8-17) as an in-process planner — the gRPC hops disappear
because the "cluster" is the Spark driver (SURVEY.md §3.3 rewrite). Implements
what the reference stubbed: SyncGroup distribution (ProtocolCodec stubs,
ProtocolCodec.java:31-36), heartbeats (GroupCoordinator.java:83-85 empty), and
leave/eviction.

Protocol negotiation: the chosen protocol is the leader's preference
intersected with every member's supported list; leader = first joiner; each
join starts a new generation (rebalance round).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from .assignors import Assignment, get_assignor
from .errors import UnknownMemberError


@dataclass
class MemberRecord:
    member_id: str
    protocols: list[str]
    subscriptions: list[str]
    last_heartbeat: float = field(default_factory=time.monotonic)
    # per-member session timeout, carried in the join request like Kafka's
    # JoinGroup session_timeout_ms; None -> coordinator default
    session_timeout_s: float | None = None


@dataclass
class GroupState:
    group_id: str
    generation: int = 0
    leader: str | None = None
    protocol: str | None = None
    members: dict[str, MemberRecord] = field(default_factory=dict)
    # member -> topic -> [partition], installed at sync time
    assignment: Assignment = field(default_factory=dict)
    previous_assignment: Assignment = field(default_factory=dict)


@dataclass
class JoinResult:
    member_id: str
    generation: int
    leader: str
    protocol: str
    members: list[str]  # full membership (leader uses this to plan)
    is_leader: bool


class GroupCoordinator:
    """One instance per engine; coordinates all groups."""

    def __init__(self, session_timeout_s: float = 300.0):
        # Heartbeats ride poll()/commit_offsets() (no background heartbeat
        # thread), so this bounds the allowed gap BETWEEN polls — the
        # semantic of Kafka's max.poll.interval.ms (default 300 s), which
        # is exactly what consumer_from_properties maps onto it. The
        # reference's 9 s (interval*threshold, BrokerConfig.java:17-22)
        # models a broker-side heartbeat thread we deliberately don't
        # have; defaulting 9 s here evicted any consumer whose Spark poll
        # job outlived it on a loaded cluster (r13: a contended local[32]
        # stretched one poll stage past 9 s and the NEXT poll was fenced).
        # Liveness/eviction tests inject short timeouts explicitly.
        self.session_timeout_s = session_timeout_s
        self._groups: dict[str, GroupState] = {}

    def _group(self, group_id: str) -> GroupState:
        return self._groups.setdefault(group_id, GroupState(group_id))

    # -- G1/G2: join -----------------------------------------------------
    def join_group(
        self,
        group_id: str,
        member_id: str | None,
        protocols: list[str],
        subscriptions: list[str],
        session_timeout_s: float | None = None,
    ) -> JoinResult:
        g = self._group(group_id)
        self._evict_expired(g)
        if member_id is None:
            member_id = f"member-{uuid.uuid4().hex[:12]}"
        rejoining = member_id in g.members
        g.members[member_id] = MemberRecord(
            member_id,
            list(protocols),
            list(subscriptions),
            session_timeout_s=session_timeout_s,
        )
        if not rejoining or g.leader is None:
            # new member (or first) -> new rebalance round. Only a
            # MATERIALIZED plan becomes sticky history: back-to-back
            # rebalances with no intervening sync (join storms, eviction
            # cascades) must not overwrite the last real assignment with
            # the cleared {} and wipe what StickyAssignor keys on.
            g.generation += 1
            if g.assignment:
                g.previous_assignment = g.assignment
            g.assignment = {}
        if g.leader is None or g.leader not in g.members:
            g.leader = sorted(g.members)[0] if rejoining else member_id
        # negotiated protocol: leader preference order ∩ all members' lists
        leader_prefs = g.members[g.leader].protocols
        common = [
            p
            for p in leader_prefs
            if all(p in m.protocols for m in g.members.values())
        ]
        g.protocol = common[0] if common else "range"
        return JoinResult(
            member_id=member_id,
            generation=g.generation,
            leader=g.leader,
            protocol=g.protocol,
            members=sorted(g.members),
            is_leader=member_id == g.leader,
        )

    # -- G3: sync --------------------------------------------------------
    def sync_group(
        self,
        group_id: str,
        member_id: str,
        topic_partitions: dict[str, int],
    ) -> dict[str, list[int]]:
        """Compute/install the group assignment and return this member's
        slice (``topic -> [partition]``). In the reference only the leader
        computes (LeaderAssignmentPlanner.java:23-40); in-process, the first
        syncer plans for the generation."""
        g = self._group(group_id)
        if member_id not in g.members:
            raise UnknownMemberError(member_id)
        if not g.assignment:
            assignor = get_assignor(g.protocol or "range")
            g.assignment = assignor(
                sorted(g.members), topic_partitions, g.previous_assignment
            )
        return g.assignment.get(member_id, {})

    # -- G9: heartbeat / liveness ---------------------------------------
    def heartbeat(self, group_id: str, member_id: str) -> None:
        g = self._group(group_id)
        # Broker-sweep semantics: a member stalled past its session timeout
        # is evicted on ANY group interaction, so it cannot self-resurrect
        # by heartbeating late — it gets UnknownMemberError and must rejoin.
        self._evict_expired(g)
        if member_id not in g.members:
            raise UnknownMemberError(member_id)
        g.members[member_id].last_heartbeat = time.monotonic()

    def leave_group(self, group_id: str, member_id: str) -> None:
        g = self._group(group_id)
        if member_id in g.members:
            del g.members[member_id]
            g.generation += 1
            if g.assignment:  # same guard as join_group: keep real history
                g.previous_assignment = g.assignment
            g.assignment = {}
            g.leader = sorted(g.members)[0] if g.members else None

    def _evict_expired(self, g: GroupState) -> None:
        now = time.monotonic()
        dead = [
            m
            for m, rec in g.members.items()
            if now - rec.last_heartbeat
            > (
                rec.session_timeout_s
                if rec.session_timeout_s is not None
                else self.session_timeout_s
            )
        ]
        for m in dead:
            self.leave_group(g.group_id, m)

    def describe(self, group_id: str) -> GroupState:
        g = self._group(group_id)
        self._evict_expired(g)
        return g

    def list_groups(self) -> list[str]:
        """Kafka AdminClient.listConsumerGroups analog: every group id this
        coordinator has seen (expired members are evicted lazily on the
        group's next interaction, like the broker's heartbeat sweep)."""
        return sorted(self._groups)
