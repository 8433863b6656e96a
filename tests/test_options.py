"""Option validation unit tests — mirrors the reference's
PubsubOptionsTest.scala:8-113 case for case (FIXTURES.md A.2)."""

from __future__ import annotations

import pytest

from spark_sql_pubsub_connector_spark.sources.options import (
    calculate_partitions,
    plan_partitioning,
    validate_read_options,
    validate_write_options,
)

BASE_READ = {"project_id": "p", "subscription": "s", "broker_dir": "/tmp/b"}
BASE_WRITE = {"project_id": "p", "topic": "t", "broker_dir": "/tmp/b"}


def test_missing_project_id_throws():
    with pytest.raises(ValueError, match="project_id"):
        validate_read_options({"subscription": "s", "broker_dir": "/tmp/b"})


def test_missing_subscription_throws():
    with pytest.raises(ValueError, match="subscription"):
        validate_read_options({"project_id": "p", "broker_dir": "/tmp/b"})


def test_missing_topic_throws():
    with pytest.raises(ValueError, match="topic"):
        validate_write_options({"project_id": "p", "broker_dir": "/tmp/b"})


def test_read_defaults():
    o = validate_read_options(BASE_READ)
    assert o.num_partitions == 4  # package.scala:36
    assert o.max_messages_per_partition == 1000  # package.scala:33
    assert o.dynamic_partitioning is False
    assert o.subscription_path == "projects/p/subscriptions/s"


def test_read_full_parse():
    o = validate_read_options(
        {
            **BASE_READ,
            "num_partitions": "8",
            "max_messages_per_partition": "250",
            "dynamic_partitioning": "true",
        }
    )
    assert (o.num_partitions, o.max_messages_per_partition) == (8, 250)
    assert o.dynamic_partitioning is True


@pytest.mark.parametrize("key", ["num_partitions", "max_messages_per_partition"])
@pytest.mark.parametrize("bad", ["0", "-1", "abc"])
def test_read_range_violations_throw(key, bad):
    with pytest.raises(ValueError, match=key):
        validate_read_options({**BASE_READ, key: bad})


def test_write_parse_and_ordering_key():
    o = validate_write_options({**BASE_WRITE, "ordering_key": "my_key"})
    assert o.ordering_key == "my_key"
    assert o.topic_path == "projects/p/topics/t"
    assert validate_write_options(BASE_WRITE).ordering_key is None


# -- partition arithmetic (PubsubSubscriptionMonitor.scala:136-141) --------


def test_calculate_partitions_clamps():
    assert calculate_partitions(0) == 1
    assert calculate_partitions(1) == 1
    assert calculate_partitions(10_000) == 1
    assert calculate_partitions(10_001) == 2
    assert calculate_partitions(10_000_000) == 256  # ceiling
    assert calculate_partitions(25_000, threshold=10_000) == 3


def test_plan_partitioning_uniform():
    info = plan_partitioning({"us-east1": 30_000, "eu-west1": 25_000})
    assert not info.split_by_region  # no region dominates (max 55%)
    assert info.total_partitions == 6


def test_plan_partitioning_region_split():
    # one region holds >70% of backlog → per-region planning
    # (package.scala:116-129)
    info = plan_partitioning({"us-east1": 80_000, "eu-west1": 10_000})
    assert info.split_by_region
    regions = {r.region: r for r in info.by_region}
    assert regions["us-east1"].num_partitions == 8
    # minor region still gets >= total//n_regions partitions
    assert regions["eu-west1"].num_partitions >= info.total_partitions // 2


def test_batches_to_drain_formula(tmp_path):
    """S5: availableNow batch estimate = max(ceil(backlog/capacity), 1)
    (PubsubSubscriptionMonitor.scala:96-113 semantics)."""
    from spark_sql_pubsub_connector_spark.sources.broker import (
        FileBroker,
        PubsubMessage,
    )
    from spark_sql_pubsub_connector_spark.sources.monitor import BacklogMonitor

    b = FileBroker(str(tmp_path / "broker"))
    b.create_topic("t")
    b.create_subscription("s", "t")
    opts = validate_read_options(
        {
            "project_id": "p",
            "subscription": "s",
            "broker_dir": str(tmp_path / "broker"),
            "num_partitions": "4",
            "max_messages_per_partition": "10",
        }
    )
    mon = BacklogMonitor(b, "s", opts)
    mon.refresh()
    assert mon.batches_to_drain(40) == 1  # empty backlog -> 1 batch
    b.publish("t", [PubsubMessage(data=b"x", publish_ts_us=1) for _ in range(95)])
    mon.refresh()
    assert mon.batches_to_drain(40) == 3  # ceil(95/40)
    assert mon.batches_to_drain(100) == 1


def test_region_endpoint_mapping():
    """Region → endpoint derivation (package.scala:87-97): a region pins
    the pull to its regional endpoint; none/global uses the default."""
    from spark_sql_pubsub_connector_spark.sources.options import (
        DEFAULT_ENDPOINT,
        region_endpoint,
    )

    assert region_endpoint() == DEFAULT_ENDPOINT
    assert region_endpoint(None) == DEFAULT_ENDPOINT
    assert region_endpoint("") == DEFAULT_ENDPOINT
    assert region_endpoint("global") == DEFAULT_ENDPOINT
    assert region_endpoint("us-east1") == "us-east1-pubsub.googleapis.com:443"
    assert region_endpoint("europe-west4") == (
        "europe-west4-pubsub.googleapis.com:443"
    )


def test_stream_and_sink_identity_options():
    from spark_sql_pubsub_connector_spark.sources.options import (
        validate_write_options,
    )

    r = validate_read_options(
        {"project_id": "p", "subscription": "s", "broker_dir": "/b"}
    )
    assert r.stream_id is None
    r2 = validate_read_options(
        {"project_id": "p", "subscription": "s", "broker_dir": "/b", "stream_id": "ck"}
    )
    assert r2.stream_id == "ck"
    w = validate_write_options({"project_id": "p", "topic": "t", "broker_dir": "/b"})
    assert w.sink_id is None
    w2 = validate_write_options(
        {"project_id": "p", "topic": "t", "broker_dir": "/b", "sink_id": "/ck/x"}
    )
    assert w2.sink_id == "/ck/x"


def test_log_retention_bytes_option():
    from spark_sql_pubsub_connector_spark.sources.options import (
        validate_write_options,
    )

    base = {"project_id": "p", "topic": "t", "broker_dir": "/b"}
    assert validate_write_options(dict(base)).log_retention_bytes is None
    assert (
        validate_write_options(
            dict(base, log_retention_bytes="65536")
        ).log_retention_bytes
        == 65536
    )
    with pytest.raises(ValueError, match="log_retention_bytes"):
        validate_write_options(dict(base, log_retention_bytes="0"))
    with pytest.raises(ValueError, match="log_retention_bytes"):
        validate_write_options(dict(base, log_retention_bytes="nope"))


def test_monitor_stop_during_inflight_tick_is_final():
    """r15 review: Timer.cancel() is a no-op once the timer has fired,
    so a stop() landing while _tick executes used to be undone by the
    tick's unconditional finally-reschedule — the monitor refreshed
    forever after stop. The reschedule now checks the stopped flag
    under the lock. Modeled deterministically: stop() first, then the
    in-flight tick completes — no new timer may appear."""
    import tempfile

    from spark_sql_pubsub_connector_spark.sources.broker import FileBroker
    from spark_sql_pubsub_connector_spark.sources.monitor import (
        BacklogMonitor,
    )

    root = tempfile.mkdtemp()
    b = FileBroker(root)
    b.create_topic("t")
    b.create_subscription("s", "t")
    opts = validate_read_options(
        {"project_id": "p", "subscription": "s", "broker_dir": root}
    )
    mon = BacklogMonitor(b, "s", opts, auto_refresh=True)
    assert mon._timer is not None
    mon.stop()  # cancels the pending timer
    assert mon._timer is None
    mon._tick()  # the tick that had already fired before cancel()
    assert mon._timer is None, "stopped monitor was rescheduled"
