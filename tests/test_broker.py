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
