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


# -- JPEG codec properties (r8) ----------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    q=st.sampled_from([1, 4, 16, 32]),
    ri=st.sampled_from([0, 2, 5]),
)
def test_jpeg_roundtrip_error_bounded(seed, w, h, q, ri):
    """decode(encode(img)) error is bounded by the quantization step:
    each of the 64 coefficients moves at most q/2, and the orthonormal
    IDCT maps that into at most sum(|dC|)/8 per pixel -> 4q. Holds for
    every size (including non-multiples of 8), any flat table, with or
    without restart markers."""
    import numpy as np

    from flux_spark.llm.codecs import decode_jpeg_bytes, encode_jpeg_bytes, jpeg_pixels

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w)).astype(np.float64)
    payload = encode_jpeg_bytes(
        [img.reshape(-1).tolist()], w, h, qtable=[q] * 64, restart_interval=ri
    )
    gw, gh, ch, pix = jpeg_pixels(payload)
    assert (gw, gh, ch) == (w, h, 1)
    got = np.frombuffer(pix, dtype=np.uint8).reshape(h, w).astype(np.float64)
    assert np.abs(got - img).max() <= 4 * q + 1
    # stats wrapper agrees with the pixel contract
    assert decode_jpeg_bytes(payload)["pixel_sum"] == int(got.sum())


@settings(max_examples=20, deadline=None)
@given(
    tokens=st.lists(
        st.sampled_from("aa bb cc dd ee ff gg hh".split()),
        min_size=1,
        max_size=40,
    ),
    prefix=st.lists(
        st.sampled_from("xx yy zz ww".split()), min_size=0, max_size=8
    ),
)
def test_winnowing_shift_invariant_guarantee(tokens, prefix):
    """Property form of the winnowing guarantee: prefixing a document
    with arbitrary junk never erases all common fingerprints as long as
    the original is >= w + k - 1 = 6 tokens long (the selected minima
    inside the shared run survive any shift)."""
    from flux_spark.llm.text import FINGERPRINT_MOD

    if len(tokens) < 6:
        return
    base = " ".join(tokens)
    shifted = " ".join(prefix + tokens)

    # Spark-free replay of the operator's exact algorithm
    def fps(text, k=3, w=4):
        tk = [t for t in text.split(" ") if t]
        grams = (
            [text]
            if len(tk) < k
            else [" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)]
        )
        def roll(g):
            acc = 0
            for c in g:
                acc = (acc * 31 + ord(c)) % FINGERPRINT_MOD
            return acc
        hs = [roll(g) for g in grams]
        n_win = max(1, len(hs) - w + 1)
        out = set()
        for j in range(n_win):
            win = hs[j : j + w]
            m = min(win)
            out.add(m)
        return out

    assert fps(base) & fps(shifted)
