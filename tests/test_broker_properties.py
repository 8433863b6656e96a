"""Property tests for the broker's delivery invariants.

The lease bookkeeping was rewritten for O(n) drains (grouped leases +
a delivery cursor that rewinds on expiry), so these tests drive random
interleavings of pull / ack / nack / expiry and check the semantics
the connector is built on:

  1. at-least-once: every published message is eventually delivered;
  2. no double-lease: a message is never handed out twice while its
     lease is active;
  3. acked is final: an acked message is never redelivered;
  4. backlog accounting matches the unacked set exactly.
"""

from __future__ import annotations

import time

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sql_pubsub_connector_spark.sources.broker import FileBroker, PubsubMessage


def _mk(tmp_path, n, deadline):
    b = FileBroker(str(tmp_path / "b"))
    b.create_topic("t")
    b.create_subscription("s", "t", ack_deadline_s=deadline)
    b.publish(
        "t",
        [PubsubMessage(data=f"m{i}".encode(), publish_ts_us=1) for i in range(n)],
    )
    return b


# op stream: (kind, arg) — pull size, ack a sampled prefix, or nack it
_OPS = st.lists(
    st.tuples(st.sampled_from(["pull", "ack", "nack"]), st.integers(1, 7)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 30), ops=_OPS)
def test_random_interleavings_preserve_delivery_invariants(tmp_path_factory, n, ops):
    tmp = tmp_path_factory.mktemp("prop")
    b = _mk(tmp, n, deadline=600)  # long deadline: no surprise expiry
    outstanding: dict[str, str] = {}  # ack_id -> message_id (active leases)
    acked_ids: set[str] = set()
    delivered_ids: set[str] = set()

    for kind, k in ops:
        if kind == "pull":
            got = b.pull("s", k)
            for rm in got:
                mid = rm.message.message_id
                # acked is final + no double-lease while active
                assert mid not in acked_ids, "redelivered an acked message"
                assert mid not in outstanding.values(), "double-leased"
                outstanding[rm.ack_id] = mid
                delivered_ids.add(mid)
        elif kind == "ack" and outstanding:
            batch = list(outstanding)[:k]
            n_acked = b.acknowledge("s", batch)
            assert n_acked == len(batch)
            for aid in batch:
                acked_ids.add(outstanding.pop(aid))
        elif kind == "nack" and outstanding:
            batch = list(outstanding)[:k]
            b.modify_ack_deadline("s", batch, 0.0)  # immediate redelivery
            for aid in batch:
                outstanding.pop(aid)

    # backlog = everything not acked (leased still counts, like the metric)
    assert b.backlog("s") == n - len(acked_ids)

    # drain the rest: everything unacked must still be deliverable
    while True:
        got = b.pull("s", 10)
        if not got:
            break
        for rm in got:
            assert rm.message.message_id not in acked_ids
            delivered_ids.add(rm.message.message_id)
    assert delivered_ids | acked_ids == {str(i) for i in range(n)}


@settings(max_examples=10, deadline=None)
@given(n=st.integers(2, 20), first=st.integers(1, 10))
def test_expiry_redelivers_exactly_the_unacked(tmp_path_factory, n, first):
    tmp = tmp_path_factory.mktemp("exp")
    b = _mk(tmp, n, deadline=0.05)
    got = b.pull("s", min(first, n))
    # ack half of what we pulled before the lease lapses
    keep = [rm.ack_id for rm in got[: len(got) // 2]]
    b.acknowledge("s", keep)
    acked = {rm.message.message_id for rm in got[: len(got) // 2]}
    time.sleep(0.08)  # every remaining lease expires
    seen: set[str] = set()
    while True:
        more = b.pull("s", 10)
        if not more:
            break
        seen |= {rm.message.message_id for rm in more}
    assert seen == {str(i) for i in range(n)} - acked


def test_concurrent_consumers_partition_the_stream(tmp_path_factory):
    """TRUE multi-threaded contention (the single-JVM analog of 32
    partition readers pulling one subscription): 8 threads pull and ack
    concurrently under long leases. The file lock must make leases
    mutually exclusive — every message delivered to exactly one thread,
    no double-lease, zero backlog after the drain."""
    import threading

    tmp_path = tmp_path_factory.mktemp("conc")
    n = 400
    b = _mk(tmp_path, n, deadline=600)

    delivered: list[list[bytes]] = [[] for _ in range(8)]
    errors: list[BaseException] = []

    def worker(slot: int) -> None:
        # each thread uses its own FileBroker handle (its own fds),
        # like separate executor processes sharing the broker dir
        wb = FileBroker(str(tmp_path / "b"))
        try:
            while True:
                got = wb.pull("s", 17)
                if not got:
                    # exit gate is NOT racy: backlog counts
                    # leased-but-unacked messages too (the metric
                    # semantics pinned by test_broker.py), and every
                    # worker acks each pulled batch before its next
                    # pull — so backlog 0 implies every delivery was
                    # already acknowledged, never that another thread
                    # still holds a lease that could expire later
                    if wb.backlog("s") == 0:
                        return
                    time.sleep(0.01)
                    continue
                delivered[slot].extend(m.message.data for m in got)
                wb.acknowledge("s", [m.ack_id for m in got])
        except BaseException as exc:  # surface failures to the main thread
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert all(not t.is_alive() for t in threads)

    flat = [d for ds in delivered for d in ds]
    assert len(flat) == n, f"{len(flat)} deliveries for {n} messages"
    assert len(set(flat)) == n  # exactly-one delivery per message
    assert b.backlog("s") == 0
    assert b.pull("s", 1) == []  # direct re-drain: nothing left to lease
    # real contention happened: no single thread drained everything
    assert sum(1 for ds in delivered if ds) >= 2


# op stream with compaction mixed in: compact_topic may run between any
# pull/ack/nack and must never change delivery semantics (r15 retention)
_OPS_C = st.lists(
    st.tuples(
        st.sampled_from(["pull", "ack", "nack", "compact"]), st.integers(1, 7)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=25, deadline=None)
@given(n=st.integers(1, 30), ops=_OPS_C)
def test_compaction_is_invisible_to_delivery_invariants(
    tmp_path_factory, n, ops
):
    """Randomly interleaved compaction passes (which cut the acked log
    prefix and invalidate every byte cursor) must preserve the same
    four invariants as the plain machine: at-least-once, no
    double-lease, acked-is-final, exact backlog accounting."""
    tmp = tmp_path_factory.mktemp("propc")
    b = _mk(tmp, n, deadline=600)
    outstanding: dict[str, str] = {}
    acked_ids: set[str] = set()
    delivered_ids: set[str] = set()

    for kind, k in ops:
        if kind == "pull":
            got = b.pull("s", k)
            for rm in got:
                mid = rm.message.message_id
                assert mid not in acked_ids, "redelivered an acked message"
                assert mid not in outstanding.values(), "double-leased"
                outstanding[rm.ack_id] = mid
                delivered_ids.add(mid)
        elif kind == "ack" and outstanding:
            batch = list(outstanding)[:k]
            assert b.acknowledge("s", batch) == len(batch)
            for aid in batch:
                acked_ids.add(outstanding.pop(aid))
        elif kind == "nack" and outstanding:
            batch = list(outstanding)[:k]
            b.modify_ack_deadline("s", batch, 0.0)
            for aid in batch:
                outstanding.pop(aid)
        elif kind == "compact":
            stats = b.compact_topic("t")
            # never cuts anything unacked: retained log must still
            # hold every message not yet acked
            retained = {m.message_id for m in b.topic_messages("t")}
            missing = ({str(i) for i in range(n)} - acked_ids) - retained
            assert not missing, f"compaction lost unacked {missing}"
            assert stats["cut_messages"] >= 0

    assert b.backlog("s") == n - len(acked_ids)
    while True:
        got = b.pull("s", 10)
        if not got:
            break
        for rm in got:
            assert rm.message.message_id not in acked_ids
            delivered_ids.add(rm.message.message_id)
    assert delivered_ids | acked_ids == {str(i) for i in range(n)}


def test_concurrent_consumers_with_auto_compacting_publisher(
    tmp_path_factory,
):
    """The retention stack under true contention: a publisher thread
    feeds 10 rounds of 40 messages through a broker with a small
    auto_compact_bytes (so compaction fires mid-drain, under the same
    lock the 8 consumer threads contend on), and every message must
    still be delivered to exactly one consumer."""
    import threading

    tmp_path = tmp_path_factory.mktemp("concc")
    total = 400
    b = FileBroker(str(tmp_path / "b"), auto_compact_bytes=2048)
    b.create_topic("t")
    b.create_subscription("s", "t", ack_deadline_s=600)

    delivered: list[list[bytes]] = [[] for _ in range(8)]
    errors: list[BaseException] = []
    done_publishing = threading.Event()

    def publisher() -> None:
        pb = FileBroker(str(tmp_path / "b"), auto_compact_bytes=2048)
        try:
            for r in range(10):
                pb.publish(
                    "t",
                    [
                        PubsubMessage(
                            data=f"m{r * 40 + i}".encode(), publish_ts_us=1
                        )
                        for i in range(40)
                    ],
                )
                time.sleep(0.005)
        except BaseException as exc:
            errors.append(exc)
        finally:
            done_publishing.set()

    def worker(slot: int) -> None:
        wb = FileBroker(str(tmp_path / "b"))
        try:
            while True:
                got = wb.pull("s", 17)
                if not got:
                    if done_publishing.is_set() and wb.backlog("s") == 0:
                        return
                    time.sleep(0.01)
                    continue
                delivered[slot].extend(m.message.data for m in got)
                wb.acknowledge("s", [m.ack_id for m in got])
        except BaseException as exc:
            errors.append(exc)

    threads = [threading.Thread(target=publisher)] + [
        threading.Thread(target=worker, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert all(not t.is_alive() for t in threads)

    flat = [d for ds in delivered for d in ds]
    assert len(flat) == total, f"{len(flat)} deliveries for {total}"
    assert len(set(flat)) == total  # exactly-one delivery per message
    assert b.backlog("s") == 0
    # retention actually engaged: the log is a fraction of the ~28 KB
    # a grow-forever topic would hold. The bound here is deliberately
    # loose: the LAST acks can land after the final publish, and with
    # no further append nothing re-triggers auto-compaction, so the
    # tail's size depends on ack timing (observed 14 KB under a
    # loaded host vs ~6 KB solo — r15 flake).
    import os

    log = os.path.join(str(tmp_path / "b"), "topics", "t", "log.jsonl")
    assert os.path.getsize(log) < 24 * 1024
    # after an explicit compaction at quiescence (backlog 0, all
    # acked) the bound is deterministic
    b.compact_topic("t")
    assert os.path.getsize(log) < 2 * 1024
