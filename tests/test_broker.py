"""FileBroker semantics: publish/pull/ack, lease redelivery, backlog."""

from __future__ import annotations

import pytest

from spark_sql_pubsub_connector_spark.sources.broker import FileBroker, PubsubMessage


@pytest.fixture()
def broker(tmp_path):
    b = FileBroker(str(tmp_path))
    b.create_topic("t")
    b.create_subscription("s", "t", ack_deadline_s=60)
    return b


def _msgs(n, region="global"):
    return [
        PubsubMessage(
            data=f"Test Message: {i}".encode(),
            attributes={"key": f"value: {i}"},
            publish_ts_us=1_700_000_000_000_000 + i,
            region=region,
        )
        for i in range(n)
    ]


def test_publish_assigns_monotonic_ids(broker):
    ids = broker.publish("t", _msgs(5))
    assert ids == ["0", "1", "2", "3", "4"]
    assert broker.publish("t", _msgs(2)) == ["5", "6"]


def test_pull_leases_and_ack_removes(broker):
    broker.publish("t", _msgs(10))
    got = broker.pull("s", 4)
    assert len(got) == 4
    assert got[0].message.data == b"Test Message: 0"
    assert got[0].message.attributes == {"key": "value: 0"}
    # leased messages are not re-pulled
    got2 = broker.pull("s", 100)
    assert len(got2) == 6
    assert broker.backlog("s") == 10  # leased-but-unacked still backlog
    broker.acknowledge("s", [r.ack_id for r in got] + [r.ack_id for r in got2])
    assert broker.backlog("s") == 0
    assert broker.pull("s", 100) == []


def test_lease_expiry_redelivers(broker, tmp_path):
    b = FileBroker(str(tmp_path))
    b.create_subscription("fast", "t", ack_deadline_s=0.0)  # instant expiry
    b.publish("t", _msgs(3))
    first = b.pull("fast", 3)
    assert len(first) == 3
    # deadline 0 → lease expired immediately → redelivery (at-least-once)
    again = b.pull("fast", 3)
    assert len(again) == 3
    assert {r.message.message_id for r in again} == {"0", "1", "2"}


def test_nack_via_modify_ack_deadline(broker):
    broker.publish("t", _msgs(2))
    got = broker.pull("s", 2)
    broker.modify_ack_deadline("s", [got[0].ack_id], 0)
    redelivered = broker.pull("s", 2)
    assert len(redelivered) == 1
    assert redelivered[0].message.message_id == got[0].message.message_id


def test_backlog_by_region(broker):
    broker.publish("t", _msgs(7, region="us-east1"))
    broker.publish("t", _msgs(3, region="eu-west1"))
    assert broker.backlog_by_region("s") == {"us-east1": 7, "eu-west1": 3}
    # region-pinned pull only returns that region's messages
    got = broker.pull("s", 100, region="eu-west1")
    assert len(got) == 3
    assert all(r.message.region == "eu-west1" for r in got)


def test_ack_unknown_ids_is_idempotent(broker):
    broker.publish("t", _msgs(1))
    got = broker.pull("s", 1)
    assert broker.acknowledge("s", [got[0].ack_id]) == 1
    assert broker.acknowledge("s", [got[0].ack_id, "ack-bogus-1"]) == 0


class TestRealClientParity:
    """RealBrokerClient must be drop-in for FileBroker: same consumed
    surface (names + signatures), correct option plumbing, and a
    descriptive ImportError when google-cloud-pubsub is absent — all
    verifiable without the dependency installed (VERDICT r2 #6)."""

    # every method the connector / monitor / pipelines call on a broker
    CONSUMED = (
        "create_topic",
        "create_subscription",
        "publish",
        "commit_staged",
        "pull",
        "pull_raw",
        "acknowledge",
        "modify_ack_deadline",
        "backlog",
        "backlog_by_region",
        "topic_messages",
        "delete_all",
    )

    def test_dependency_absent_in_container(self):
        # these tests only prove offline parity when the lib is missing
        with pytest.raises(ImportError):
            import google.cloud.pubsub_v1  # noqa: F401

    def test_interface_parity_signatures(self):
        import inspect

        from spark_sql_pubsub_connector_spark.sources.broker import (
            RealBrokerClient,
        )

        for name in self.CONSUMED:
            fb = inspect.signature(getattr(FileBroker, name))
            rc = inspect.signature(getattr(RealBrokerClient, name))
            assert fb == rc, f"{name}: {fb} != {rc}"

    def test_constructor_raises_descriptive_import_error(self):
        from spark_sql_pubsub_connector_spark.sources.broker import (
            RealBrokerClient,
        )

        with pytest.raises(ImportError, match="google-cloud-pubsub"):
            RealBrokerClient("proj")

    def test_endpoint_option_plumbing(self):
        from spark_sql_pubsub_connector_spark.sources.broker import (
            RealBrokerClient,
        )

        r = RealBrokerClient.resolve_endpoint
        # no region -> global endpoint (Subscriber.scala:16)
        assert r() == "pubsub.googleapis.com:443"
        assert r("global") == "pubsub.googleapis.com:443"
        # region-pinned -> regional endpoint (package.scala:87-97)
        assert r("us-east1") == "us-east1-pubsub.googleapis.com:443"
        # explicit endpoint overrides region (Subscriber.scala:64-70),
        # lowercased like the reference
        assert r("us-east1", "Localhost:8085") == "localhost:8085"


def test_commit_staged_malformed_line_leaves_log_untouched(broker, tmp_path):
    """A malformed staged line must fail the WHOLE commit atomically:
    no partial append (which would desync .seq and mint duplicate seq
    numbers on the next publish) and the topic stays usable."""
    broker.publish("t", _msgs(2))
    good = tmp_path / "good.jsonl"
    good.write_text('{"data_b64": "YQ==", "attributes": {}, "ordering_key": ""}\n')
    bad = tmp_path / "bad.jsonl"
    bad.write_text(
        '{"data_b64": "Yg==", "attributes": {}, "ordering_key": ""}\n'
        "not-json-at-all\n"
    )
    with pytest.raises(ValueError, match="JSON object"):
        broker.commit_staged("t", [str(good), str(bad)])
    # nothing appended — not even the valid lines before the bad one
    assert len(broker.topic_messages("t")) == 2
    # the topic still works, with contiguous seqs
    broker.publish("t", _msgs(1))
    msgs = broker.topic_messages("t")
    assert [m.message_id for m in msgs] == ["0", "1", "2"]


def test_publish_seq_recovers_from_stale_counter(broker, tmp_path):
    """r14 self-review (the publish twin of the r13 sink find): both
    appenders write log.jsonl FIRST and .seq AFTER, so a crash between
    the two leaves committed lines the counter doesn't cover. Minting
    from the stale counter would duplicate live seq numbers — acks
    conflate distinct messages, the dense-seq cursor under-delivers.
    _next_seq recovers from the log tail: max(counter, last_seq + 1)."""
    import os

    broker.publish("t", _msgs(3))
    seq_path = os.path.join(str(tmp_path), "topics", "t", ".seq")
    with open(seq_path, "w") as fh:
        fh.write("1")  # simulate the crash window: counter lags the log
    ids = broker.publish("t", _msgs(2))
    assert ids == ["3", "4"]  # NOT "1","2" — no re-minted live seqs
    got = broker.pull("s", 10)
    assert sorted(int(m.message.message_id) for m in got) == [0, 1, 2, 3, 4]
    assert len({m.message.message_id for m in got}) == 5


def test_commit_staged_seq_recovers_from_stale_counter(broker, tmp_path):
    """Same crash window through the sink's commit_staged path."""
    import json
    import os

    broker.publish("t", _msgs(4))
    seq_path = os.path.join(str(tmp_path), "topics", "t", ".seq")
    with open(seq_path, "w") as fh:
        fh.write("0")
    staged = tmp_path / "chunk.jsonl"
    staged.write_text(
        json.dumps(
            {
                "ordering_key": "",
                "data_b64": "aGk=",
                "attributes": {},
                "publish_ts_us": 1,
                "region": "global",
            }
        )
        + "\n"
    )
    assert broker.commit_staged("t", [str(staged)]) == 1
    seqs = [int(m.message_id) for m in broker.topic_messages("t")]
    assert seqs == [0, 1, 2, 3, 4]  # dense, no duplicates


def test_torn_tail_line_truncated_before_next_append(broker, tmp_path):
    """A crashed append's partial final write (no trailing newline)
    would poison every later consumer's json.loads; the next publish
    truncates it — safe, because a torn line's publish/commit never
    returned success, so the caller retries (at-least-once)."""
    import os

    broker.publish("t", _msgs(3))
    log = os.path.join(str(tmp_path), "topics", "t", "log.jsonl")
    with open(log, "ab") as fh:
        fh.write(b'{"seq": 3, "message_id": "3", "orde')  # torn
    ids = broker.publish("t", _msgs(1))
    assert ids == ["3"]  # the torn line was cut; its seq re-minted
    msgs = broker.topic_messages("t")  # full parse — no poison left
    assert [int(m.message_id) for m in msgs] == [0, 1, 2, 3]
    got = broker.pull("s", 10)
    assert sorted(int(m.message.message_id) for m in got) == [0, 1, 2, 3]


def test_seq_recovery_with_line_longer_than_scan_window(broker, tmp_path):
    """A single log line is one message — real payloads can exceed the
    64 KB back-scan window (Pub/Sub allows 10 MB). Recovery must walk
    back until the FINAL line is complete, not parse a mid-line
    fragment."""
    import os

    big = PubsubMessage(
        data=b"x" * 200_000,  # ~267 KB base64 — several windows
        attributes={},
        publish_ts_us=1,
        region="global",
    )
    broker.publish("t", _msgs(2))
    broker.publish("t", [big])
    seq_path = os.path.join(str(tmp_path), "topics", "t", ".seq")
    with open(seq_path, "w") as fh:
        fh.write("0")
    ids = broker.publish("t", _msgs(1))
    assert ids == ["3"]
    assert [int(m.message_id) for m in broker.topic_messages("t")] == [
        0,
        1,
        2,
        3,
    ]


def test_torn_tail_invisible_to_readers_without_an_append(broker, tmp_path):
    """r14 review: _next_seq repairs a torn tail only on the NEXT
    append — but a drained producer may never append again. Readers
    must treat a final line without its newline as nonexistent (its
    publish never returned success): no json.loads poison in
    pull/backlog, no phantom lease, and no cursor advanced past it,
    so the eventual repair (truncate + rewrite at the same byte) is
    seamless."""
    import os

    broker.publish("t", _msgs(2))
    log = os.path.join(str(tmp_path), "topics", "t", "log.jsonl")
    with open(log, "ab") as fh:
        fh.write(b'{"seq": 2, "message_id": "2", "orde')  # torn, no \n
    # every read API stays functional and blind to the torn line
    assert broker.backlog("s") == 2
    got = broker.pull("s", 10)
    assert sorted(m.message.message_id for m in got) == ["0", "1"]
    broker.acknowledge("s", [m.ack_id for m in got])
    assert broker.backlog("s") == 0
    assert broker.pull("s", 10) == []  # no phantom lease on seq 2
    # producer retry: the torn line is truncated and seq 2 re-minted;
    # the reader's cursors (parked at the torn line's start) pick the
    # rewritten line up seamlessly
    ids = broker.publish("t", _msgs(1))
    assert ids == ["2"]
    got2 = broker.pull("s", 10)
    assert [m.message.message_id for m in got2] == ["2"]


def test_topic_messages_blind_to_torn_tail(broker, tmp_path):
    """ADVICE r14: torn-tail invisibility covered _scan_unacked only;
    _read_log (behind topic_messages, which bench.py and the streaming
    differential twin call) still json.loads'd every line and raised
    JSONDecodeError on a torn final line until the next append repaired
    it. _read_log now mirrors the _scan_unacked rule: a final line
    without its trailing newline is nonexistent."""
    import os

    broker.publish("t", _msgs(2))
    log = os.path.join(str(tmp_path), "topics", "t", "log.jsonl")
    with open(log, "ab") as fh:
        fh.write(b'{"seq": 2, "message_id": "2", "orde')  # torn, no \n
    msgs = broker.topic_messages("t")  # must not raise
    assert [m.data for m in msgs] == [
        b"Test Message: 0",
        b"Test Message: 1",
    ]
    # repair path: the next publish truncates + re-mints seq 2, and
    # topic_messages sees exactly the three intact lines
    broker.publish("t", _msgs(1))
    assert len(broker.topic_messages("t")) == 3


# -- topic-log retention (VERDICT r14 #4) -----------------------------------


def _log_path(tmp_path, topic="t"):
    import os

    return os.path.join(str(tmp_path), "topics", topic, "log.jsonl")


def test_compact_topic_cuts_fully_acked_prefix(broker, tmp_path):
    """compact_topic removes exactly the prefix every subscription has
    acked; everything at or above the floor — leased-unacked and
    undelivered alike — survives and is still delivered."""
    import os

    broker.publish("t", _msgs(10))
    got = broker.pull("s", 5)  # lease 0-4
    # ack 0,1,2 → acked_below=3; 3,4 stay leased-unacked
    broker.acknowledge("s", [m.ack_id for m in got[:3]])
    stats = broker.compact_topic("t")
    assert stats["floor_seq"] == 3
    assert stats["cut_messages"] == 3
    assert stats["cut_bytes"] > 0
    # retained log starts at seq 3
    msgs = broker.topic_messages("t")
    assert [m.message_id for m in msgs] == [str(i) for i in range(3, 10)]
    # undelivered 5-9 deliverable; 3,4 redeliver after nack
    got2 = broker.pull("s", 10)
    assert sorted(int(m.message.message_id) for m in got2) == [5, 6, 7, 8, 9]
    broker.modify_ack_deadline("s", [m.ack_id for m in got], 0)  # nack 3,4
    got3 = broker.pull("s", 10)
    assert sorted(int(m.message.message_id) for m in got3) == [3, 4]
    broker.acknowledge(
        "s", [m.ack_id for m in got2] + [m.ack_id for m in got3]
    )
    assert broker.backlog("s") == 0
    # second pass cuts the rest; an empty log still accepts publishes
    # with seq continuity (.seq counter is authoritative)
    broker.compact_topic("t")
    assert os.path.getsize(_log_path(tmp_path)) == 0
    assert broker.publish("t", _msgs(1)) == ["10"]


def test_compact_topic_floor_is_slowest_subscription(broker, tmp_path):
    """Two subscriptions: the floor is the SLOWER one's acked_below, and
    the slow subscription still drains everything after the cut (its
    byte cursors reset against the new layout and rescan)."""
    broker.create_subscription("s2", "t", ack_deadline_s=60)
    broker.publish("t", _msgs(8))
    fast = broker.pull("s", 8)
    broker.acknowledge("s", [m.ack_id for m in fast])  # s: acked_below=8
    slow = broker.pull("s2", 3)
    broker.acknowledge("s2", [m.ack_id for m in slow])  # s2: acked_below=3
    stats = broker.compact_topic("t")
    assert stats["floor_seq"] == 3
    assert stats["cut_messages"] == 3
    rest = broker.pull("s2", 10)
    assert sorted(int(m.message.message_id) for m in rest) == [3, 4, 5, 6, 7]
    broker.acknowledge("s2", [m.ack_id for m in rest])
    assert broker.backlog("s2") == 0
    assert broker.backlog("s") == 0


def test_compact_topic_no_subscription_retains_everything(broker, tmp_path):
    broker.create_topic("lone")
    broker.publish("lone", _msgs(4))
    stats = broker.compact_topic("lone")
    assert stats == {"floor_seq": 0, "cut_bytes": 0, "cut_messages": 0}
    assert len(broker.topic_messages("lone")) == 4


def test_crash_between_writeahead_and_cut_resolves(broker, tmp_path):
    """Crash window 1→2: meta.json says 'pending' but the log is uncut.
    The next lock holder (any pull) finishes the idempotent cut and
    resets cursors — no loss, no duplicate."""
    import json
    import os

    broker.publish("t", _msgs(6))
    got = broker.pull("s", 3)
    broker.acknowledge("s", [m.ack_id for m in got])  # acked_below=3
    d = broker._topic_dir("t")
    size_before = os.path.getsize(_log_path(tmp_path))
    # simulate the crash: step 1 only (write-ahead), no cut, no done
    broker._store_topic_meta(
        d,
        {
            "token": "deadbeef",
            "cut_below_seq": 3,
            "state": "pending",
            "compacted_below_seq": 0,
        },
    )
    got2 = broker.pull("s", 10)  # resolves the pending compaction
    assert sorted(int(m.message.message_id) for m in got2) == [3, 4, 5]
    assert os.path.getsize(_log_path(tmp_path)) < size_before  # cut ran
    with open(os.path.join(d, "meta.json")) as fh:
        assert json.load(fh)["state"] == "done"
    broker.acknowledge("s", [m.ack_id for m in got2])
    assert broker.backlog("s") == 0


def test_crash_between_cut_and_done_resolves(broker, tmp_path):
    """Crash window 2→3: the log is already cut but meta still says
    'pending'. Resolution re-runs the cut (a no-op below the floor)
    and marks done; stale byte cursors are never trusted because the
    token changed with the write-ahead."""
    import json
    import os

    broker.publish("t", _msgs(6))
    got = broker.pull("s", 6)  # advances deliver_pos/scan_pos to EOF bytes
    broker.acknowledge("s", [m.ack_id for m in got[:4]])  # acked_below=4
    d = broker._topic_dir("t")
    broker._store_topic_meta(
        d,
        {
            "token": "cafebabe",
            "cut_below_seq": 4,
            "state": "pending",
            "compacted_below_seq": 0,
        },
    )
    broker._cut_log_below(d, 4)  # step 2 ran, step 3 (done) did not
    # leases on 4,5 still outstanding; nack and re-pull through the
    # resolved layout
    broker.modify_ack_deadline("s", [m.ack_id for m in got[4:]], 0)
    got2 = broker.pull("s", 10)
    assert sorted(int(m.message.message_id) for m in got2) == [4, 5]
    with open(os.path.join(d, "meta.json")) as fh:
        assert json.load(fh)["state"] == "done"


def test_auto_compaction_bounds_long_lived_topic(tmp_path):
    """The bounded-disk guarantee: a publish/drain/ack loop with
    auto_compact_bytes keeps log.jsonl near the threshold instead of
    growing with topic lifetime, and delivers every message exactly
    once along the way."""
    import os

    b = FileBroker(str(tmp_path), auto_compact_bytes=8 * 1024)
    b.create_topic("t")
    b.create_subscription("s", "t", ack_deadline_s=60)
    delivered = []
    max_size = 0
    for _ in range(40):
        b.publish("t", _msgs(25))  # ~170 bytes/line → ~4.2 KB/round
        got = b.pull("s", 100)
        delivered.extend(m.message.data for m in got)
        b.acknowledge("s", [m.ack_id for m in got])
        max_size = max(max_size, os.path.getsize(_log_path(tmp_path)))
    # 40 rounds * 4.2 KB ≈ 170 KB unbounded; bounded ≈ threshold + one
    # round's worth
    assert max_size < 3 * 8 * 1024, max_size
    assert len(delivered) == 40 * 25
    assert b.backlog("s") == 0


def test_compaction_preserves_torn_tail_repair(broker, tmp_path):
    """A torn tail rides through the cut untouched: still invisible to
    readers, still truncated and re-minted by the next publish."""
    broker.publish("t", _msgs(3))
    got = broker.pull("s", 2)
    broker.acknowledge("s", [m.ack_id for m in got])  # acked_below=2
    with open(_log_path(tmp_path), "ab") as fh:
        fh.write(b'{"seq": 3, "message_id": "3", "orde')  # torn, no \n
    stats = broker.compact_topic("t")
    assert stats["cut_messages"] == 2
    assert [m.message_id for m in broker.topic_messages("t")] == ["2"]
    assert broker.publish("t", _msgs(1)) == ["3"]  # seq 3 re-minted
    got2 = broker.pull("s", 10)
    assert sorted(m.message.message_id for m in got2) == ["2", "3"]


def test_subscription_created_after_compaction_starts_at_floor(
    broker, tmp_path
):
    """r15 review: a sub created after a compaction used to start at
    acked_below=0 with seqs <floor nonexistent — its dense-prefix ack
    advance could never leave 0, so its sparse acked list grew forever
    AND pinned the topic's retention floor at 0, permanently disabling
    compaction. It now starts at the floor: sees every retained
    message, acks compact densely, and the topic keeps compacting."""
    broker.publish("t", _msgs(6))
    got = broker.pull("s", 6)
    broker.acknowledge("s", [m.ack_id for m in got])
    assert broker.compact_topic("t")["cut_messages"] == 6  # floor 6
    broker.create_subscription("s2", "t", ack_deadline_s=60)
    broker.publish("t", _msgs(2))  # seqs 6, 7
    got1 = broker.pull("s", 10)
    got2 = broker.pull("s2", 10)
    assert sorted(m.message.message_id for m in got2) == ["6", "7"]
    broker.acknowledge("s", [m.ack_id for m in got1])
    broker.acknowledge("s2", [m.ack_id for m in got2])
    # dense advance from the floor: no sparse residue in either state
    s2 = broker._load_sub("s2")
    assert s2["acked_below"] == 8
    assert s2["acked"] == []
    # and the topic still compacts (floor would have stuck at 0 before)
    assert broker.compact_topic("t")["cut_messages"] == 2
