"""Transactions: commit/abort visibility, zombie fencing, atomicity.

The reference has no transactions; these verify the Kafka-EOS analog
(flux_spark/txn.py) — InitProducerId epoch fencing, read_committed
isolation, cross-topic atomicity, and idempotent finishing.
"""

import pytest
from pyspark.sql import functions as F

from flux_spark.txn import (
    InvalidTransactionStateError,
    ProducerFencedError,
)


def _df(spark, values, part=0):
    return spark.createDataFrame(
        [(int(i), part, str(v)) for i, v in enumerate(values)],
        "seq long, partition int, value string",
    )


def _values(df):
    return sorted(r["value"] for r in df.select("value").collect())


def test_committed_txn_visible_read_committed(spark, store):
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t", _df(spark, ["a", "b"]), ordering_col="seq")
    s.commit()
    assert _values(store.read("t", read_committed=True)) == ["a", "b"]


def test_aborted_txn_hidden_but_occupies_offsets(spark, store):
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t", _df(spark, ["a", "b"]), ordering_col="seq")
    s.abort()
    s.begin()
    s.send("t", _df(spark, ["c"]), ordering_col="seq")
    s.commit()
    # read_committed: aborted rows hidden, committed row keeps its real
    # offset AFTER the aborted range (Kafka: aborted records consume offsets)
    rows = store.read("t", read_committed=True).collect()
    assert [(r["offset"], r["value"]) for r in rows] == [(2, "c")]
    # default (read_uncommitted) sees everything
    assert _values(store.read("t")) == ["a", "b", "c"]


def test_inflight_txn_hidden_until_commit(spark, store):
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t", _df(spark, ["a"]), ordering_col="seq")
    assert store.read("t", read_committed=True).count() == 0
    s.commit()
    assert _values(store.read("t", read_committed=True)) == ["a"]


def test_cross_topic_atomicity(spark, store):
    store.catalog.create_topic("t1", 1)
    store.catalog.create_topic("t2", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t1", _df(spark, ["x"]), ordering_col="seq")
    s.send("t2", _df(spark, ["y"]), ordering_col="seq")
    s.abort()
    assert store.read("t1", read_committed=True).count() == 0
    assert store.read("t2", read_committed=True).count() == 0


def test_zombie_fencing(spark, store):
    store.catalog.create_topic("t", 1)
    old = store.init_transactions("p1")
    old.begin()
    old.send("t", _df(spark, ["zombie"]), ordering_col="seq")
    # new incarnation fences the old one and aborts its in-flight txn
    new = store.init_transactions("p1")
    with pytest.raises(ProducerFencedError):
        old.send("t", _df(spark, ["late"]), ordering_col="seq")
    with pytest.raises(ProducerFencedError):
        old.commit()
    new.begin()
    new.send("t", _df(spark, ["fresh"]), ordering_col="seq")
    new.commit()
    assert _values(store.read("t", read_committed=True)) == ["fresh"]


def test_state_machine_guards(spark, store):
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    with pytest.raises(InvalidTransactionStateError):
        s.send("t", _df(spark, ["a"]), ordering_col="seq")
    with pytest.raises(InvalidTransactionStateError):
        s.commit()
    s.begin()
    with pytest.raises(InvalidTransactionStateError):
        s.begin()  # one ongoing txn per id
    s.abort()
    with pytest.raises(InvalidTransactionStateError):
        s.abort()  # already finished


def test_forget_committed_gc(spark, store):
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t", _df(spark, ["a"]), ordering_col="seq")
    s.commit()
    s.begin()
    s.send("t", _df(spark, ["b"]), ordering_col="seq")
    s.abort()
    assert store.txn_log.forget_committed() == 1
    # aborted entry survives GC — readers still need its exclusion range
    assert _values(store.read("t", read_committed=True)) == ["a"]


def test_read_committed_pushes_offset_predicates(spark, store):
    """The exclusion compiles to scan-level filters, not a join."""
    store.catalog.create_topic("t", 1)
    s = store.init_transactions("p1")
    s.begin()
    s.send("t", _df(spark, ["a", "b"]), ordering_col="seq")
    s.abort()
    plan = store.read("t", read_committed=True)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# -- sendOffsetsToTransaction (r8) -------------------------------------------


def test_offsets_follow_transaction_fate(spark, store):
    from flux_spark.consumer import OffsetStore

    store.catalog.create_topic("t2", 1)
    offsets = OffsetStore(store)
    s = store.init_transactions("eos")
    s.begin()
    s.send("t2", _df(spark, ["a", "b"]))
    s.send_offsets_to_transaction("g", {("src", 0): 2})
    s.abort()
    assert offsets.fetch("g") == {}, "aborted txn must not move the group"

    s.begin()
    s.send("t2", _df(spark, ["a", "b"]))
    s.send_offsets_to_transaction("g", {("src", 0): 1})
    s.send_offsets_to_transaction("g", {("src", 0): 2})  # last wins
    s.commit()
    assert offsets.fetch("g") == {("src", 0): 2}


def test_offsets_crash_between_marker_and_apply_recovers(spark, store):
    """Commit marker durable, offsets not yet applied (crash window):
    the txn log keeps the entry (forget_committed refuses to GC it) and
    the next recovery sweep applies it."""
    from flux_spark.consumer import OffsetStore

    store.catalog.create_topic("t3", 1)
    s = store.init_transactions("eos2")
    s.begin()
    s.send("t3", _df(spark, ["x"]))
    s.send_offsets_to_transaction("g2", {("src", 0): 7})
    # crash simulation: write only the commit marker, skip the apply
    store.txn_log.finish(s.transactional_id, s.epoch, s._current, "committed")
    assert OffsetStore(store).fetch("g2") == {}
    assert store.txn_log.forget_committed() == 0, "recovery record retained"
    assert store.apply_txn_offsets() == 1
    assert OffsetStore(store).fetch("g2") == {("src", 0): 7}
    # applied entry is now GC-able, and re-running the sweep is a no-op
    assert store.apply_txn_offsets() == 0
    assert store.txn_log.forget_committed() == 1
