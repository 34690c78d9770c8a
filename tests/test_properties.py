"""Property-based tests (hypothesis) for the pure driver-side functions —
assignor invariants over arbitrary group shapes and murmur2 routing ranges.
No Spark session involved, so hundreds of examples run in seconds."""

from hypothesis import given, settings
from hypothesis import strategies as st

from flux_spark.assignors import range_assign, round_robin_assign, sticky_assign
from flux_spark.murmur2 import murmur2, partition_for_key

members_st = st.lists(
    st.text(alphabet="abcdefghij0123456789-", min_size=1, max_size=12),
    min_size=1,
    max_size=8,
    unique=True,
)
topics_st = st.dictionaries(
    st.text(alphabet="xyz123", min_size=1, max_size=8),
    st.integers(min_value=1, max_value=12),
    min_size=1,
    max_size=5,
)


def flatten(assignment):
    return [
        (m, t, p)
        for m, tps in assignment.items()
        for t, ps in tps.items()
        for p in ps
    ]


def assert_exact_coverage(assignment, topics):
    got = sorted((t, p) for _, t, p in flatten(assignment))
    want = sorted((t, p) for t, n in topics.items() for p in range(n))
    assert got == want


@settings(max_examples=200, deadline=None)
@given(members=members_st, topics=topics_st)
def test_range_covers_exactly_once_and_is_deterministic(members, topics):
    a = range_assign(members, topics)
    assert_exact_coverage(a, topics)
    assert a == range_assign(list(reversed(members)), topics)
    # per-topic balance within 1
    for t, n in topics.items():
        sizes = [len(a[m].get(t, [])) for m in members]
        assert max(sizes) - min(sizes) <= 1


@settings(max_examples=200, deadline=None)
@given(members=members_st, topics=topics_st)
def test_roundrobin_covers_exactly_once_global_balance(members, topics):
    a = round_robin_assign(members, topics)
    assert_exact_coverage(a, topics)
    sizes = [len(flatten({m: a[m]})) for m in members]
    assert max(sizes) - min(sizes) <= 1


@settings(max_examples=150, deadline=None)
@given(members=members_st, topics=topics_st, data=st.data())
def test_sticky_covers_and_caps_after_rebalance(members, topics, data):
    before = sticky_assign(members, topics)
    assert_exact_coverage(before, topics)
    # drop a random subset of members (keep at least one)
    keep = data.draw(
        st.lists(st.sampled_from(members), min_size=1, unique=True)
    )
    after = sticky_assign(keep, topics, previous=before)
    assert_exact_coverage(after, topics)
    total = sum(topics.values())
    cap = -(-total // len(keep))
    for m in keep:
        assert len(flatten({m: after[m]})) <= cap


@settings(max_examples=300, deadline=None)
@given(key=st.text(min_size=0, max_size=64), n=st.integers(min_value=1, max_value=1024))
def test_partition_for_key_in_range_and_stable(key, n):
    p = partition_for_key(key, n)
    assert 0 <= p < n
    assert p == partition_for_key(key, n)
    assert p == (murmur2(key.encode("utf-8")) & 0x7FFFFFFF) % n


def test_murmur2_kafka_reference_vectors():
    # values produced by Kafka's org.apache.kafka.common.utils.Utils.murmur2
    # (public knowledge; the reference copies the same algorithm,
    # producer/MurmurHash2.java:12-59, seed 0x9747b28c)
    vectors = {
        b"21": -973932308,
        b"foobar": -790332482,
        b"a-little-bit-long-string": -985981536,
        b"a-little-bit-longer-string": -1486304829,
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8": -58897971,
    }
    for data, expected in vectors.items():
        got = murmur2(data)
        signed = got - (1 << 32) if got >= (1 << 31) else got
        assert signed == expected, (data, signed, expected)
