"""Assignor + coordinator specs, modeled on the reference's test suites
(RangeAssignorTest 167 LoC / RoundRobinAssignorTest 132 / StickyAssignorTest
216, src/test/java/consumer/assignors/) — determinism, floor/ceil balance,
full coverage without overlap, stickiness across rebalances — plus the
join/sync/generation state machine (GroupCoordinatorServiceImpl.java:46-148).
No Spark session needed: these are pure driver-side functions."""

import itertools

from flux_spark.assignors import (
    range_assign,
    round_robin_assign,
    sticky_assign,
    get_assignor,
)
from flux_spark.coordinator import GroupCoordinator

TOPICS = {"Bob": 3, "TestTopic": 5, "Topic": 3, "test-topic": 3}  # FIXTURES F2
MEMBERS = ["m1", "m2", "m3"]


def flatten(assignment):
    return [
        (m, t, p)
        for m, tps in assignment.items()
        for t, ps in tps.items()
        for p in ps
    ]


def check_partition_coverage(assignment, topics):
    """Every partition assigned exactly once."""
    got = sorted((t, p) for _, t, p in flatten(assignment))
    want = sorted((t, p) for t, n in topics.items() for p in range(n))
    assert got == want


# -- range ------------------------------------------------------------------


def test_range_contiguous_blocks_and_balance():
    a = range_assign(MEMBERS, TOPICS)
    check_partition_coverage(a, TOPICS)
    for t, n in TOPICS.items():
        q, r = divmod(n, 3)
        per_member = [a[m].get(t, []) for m in MEMBERS]
        # contiguous ranges in member order; first r members get +1
        sizes = [len(ps) for ps in per_member]
        assert sizes == [q + (1 if i < r else 0) for i in range(3)]
        joined = list(itertools.chain.from_iterable(per_member))
        assert joined == list(range(n))


def test_range_single_member_gets_everything():
    a = range_assign(["only"], TOPICS)
    assert {t: len(ps) for t, ps in a["only"].items()} == TOPICS


def test_range_more_members_than_partitions():
    a = range_assign(["a", "b", "c", "d", "e"], {"t": 3})
    check_partition_coverage(a, {"t": 3})
    assert a["d"] == {} and a["e"] == {}


def test_range_deterministic_under_member_order():
    assert range_assign(["z", "a", "m"], TOPICS) == range_assign(
        ["m", "z", "a"], TOPICS
    )


# -- round robin ------------------------------------------------------------


def test_roundrobin_deals_cyclically():
    a = round_robin_assign(MEMBERS, TOPICS)
    check_partition_coverage(a, TOPICS)
    # universe is sorted (topic, partition); member i gets every 3rd
    universe = [(t, p) for t in sorted(TOPICS) for p in range(TOPICS[t])]
    for i, m in enumerate(sorted(MEMBERS)):
        expected = sorted(universe[i::3])
        got = sorted((t, p) for t, ps in a[m].items() for p in ps)
        assert got == expected


def test_roundrobin_balance_within_one():
    a = round_robin_assign(["c1", "c2", "c3", "c4"], TOPICS)
    sizes = sorted(len(flatten({m: a[m]})) for m in a)
    assert max(sizes) - min(sizes) <= 1


# -- sticky -----------------------------------------------------------------


def test_sticky_initial_is_balanced():
    a = sticky_assign(MEMBERS, TOPICS)
    check_partition_coverage(a, TOPICS)
    sizes = [len(flatten({m: a[m]})) for m in MEMBERS]
    assert max(sizes) - min(sizes) <= 1


def test_sticky_preserves_assignment_on_member_leave():
    before = sticky_assign(MEMBERS, TOPICS)
    survivors = ["m1", "m3"]
    after = sticky_assign(survivors, TOPICS, previous=before)
    check_partition_coverage(after, TOPICS)
    # every partition a survivor had before (within the new cap) stays put
    total = sum(TOPICS.values())
    cap = -(-total // len(survivors))
    for m in survivors:
        kept = set(flatten({m: after[m]})) & set(flatten({m: before[m]}))
        assert len(kept) >= min(len(flatten({m: before[m]})), cap) - 1


def test_sticky_respects_ceiling_cap_on_join():
    before = sticky_assign(["m1"], TOPICS)  # m1 owns all 14
    after = sticky_assign(["m1", "m2"], TOPICS, previous=before)
    check_partition_coverage(after, TOPICS)
    assert len(flatten({"m1": after["m1"]})) == 7  # ceil(14/2)
    assert len(flatten({"m2": after["m2"]})) == 7


def test_sticky_ignores_previous_partitions_that_no_longer_exist():
    before = {"m1": {"gone": [0, 1], "Bob": [0]}, "m2": {"Bob": [1, 2]}}
    after = sticky_assign(["m1", "m2"], {"Bob": 3}, previous=before)
    check_partition_coverage(after, {"Bob": 3})
    assert after["m1"].get("Bob") == [0]
    assert after["m2"].get("Bob") == [1, 2]


def test_assignor_registry_dispatch_and_default():
    assert get_assignor("roundrobin")(MEMBERS, TOPICS) == round_robin_assign(
        MEMBERS, TOPICS
    )
    # unknown protocol falls back to range (FluxConsumer.java:186-193)
    assert get_assignor("nope")(MEMBERS, TOPICS) == range_assign(MEMBERS, TOPICS)


# -- coordinator state machine ---------------------------------------------


def test_join_group_leader_election_and_generation():
    c = GroupCoordinator()
    j1 = c.join_group("g", None, ["range"], ["t"])
    assert j1.is_leader and j1.generation == 1
    j2 = c.join_group("g", None, ["range"], ["t"])
    assert not j2.is_leader and j2.generation == 2
    assert j2.leader == j1.member_id
    assert sorted(j2.members) == sorted([j1.member_id, j2.member_id])


def test_protocol_negotiation_leader_preference_intersection():
    c = GroupCoordinator()
    j1 = c.join_group("g", None, ["sticky", "range"], ["t"])
    c.join_group("g", None, ["range", "roundrobin"], ["t"])
    g = c.describe("g")
    # leader prefers sticky but member 2 lacks it -> range wins
    assert g.protocol == "range"
    assert j1.is_leader


def test_sync_group_installs_and_slices():
    c = GroupCoordinator()
    j1 = c.join_group("g", None, ["roundrobin"], ["t"])
    j2 = c.join_group("g", None, ["roundrobin"], ["t"])
    s1 = c.sync_group("g", j1.member_id, {"t": 4})
    s2 = c.sync_group("g", j2.member_id, {"t": 4})
    all_parts = sorted(s1.get("t", []) + s2.get("t", []))
    assert all_parts == [0, 1, 2, 3]
    assert not (set(s1.get("t", [])) & set(s2.get("t", [])))


def test_leave_group_triggers_rebalance_and_leader_handoff():
    c = GroupCoordinator()
    j1 = c.join_group("g", None, ["range"], ["t"])
    j2 = c.join_group("g", None, ["range"], ["t"])
    gen_before = c.describe("g").generation
    c.leave_group("g", j1.member_id)
    g = c.describe("g")
    assert g.generation == gen_before + 1
    assert g.leader == j2.member_id
    s2 = c.sync_group("g", j2.member_id, {"t": 4})
    assert s2 == {"t": [0, 1, 2, 3]}


def test_unknown_member_rejected():
    import pytest

    from flux_spark.errors import UnknownMemberError

    c = GroupCoordinator()
    c.join_group("g", None, ["range"], ["t"])
    with pytest.raises(UnknownMemberError):
        c.sync_group("g", "ghost", {"t": 1})
    with pytest.raises(UnknownMemberError):
        c.heartbeat("g", "ghost")
