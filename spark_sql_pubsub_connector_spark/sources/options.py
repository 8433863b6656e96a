"""Option models + validation for the pubsub source/sink.

Mirrors the reference's option surface and eager validation
(package.scala:8-38 keys/defaults, :49-80 case classes, :138-171
validators; PartitioningInfo region-split decision :106-129), raising
``ValueError`` from the DataSource constructor like the reference's
``IllegalArgumentException`` from ``validateAndInit*``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# option keys (reference package.scala:8-38)
PROJECT_ID = "project_id"
SUBSCRIPTION = "subscription"
TOPIC = "topic"
NUM_PARTITIONS = "num_partitions"
MAX_MESSAGES_PER_PARTITION = "max_messages_per_partition"
DYNAMIC_PARTITIONING = "dynamic_partitioning"
ORDERING_KEY = "ordering_key"
BROKER_DIR = "broker_dir"  # fake-broker root (stands in for endPoint;
# a real-client endpoint would come from region_endpoint() below)
ACK_DEADLINE_SECONDS = "ack_deadline_seconds"
BACKLOG_THRESHOLD = "backlog_threshold"
MAX_DYNAMIC_PARTITIONS = "max_dynamic_partitions"
REGION_SPLIT_THRESHOLD = "region_split_threshold"
PUBLISH_BATCH_SIZE = "publish_batch_size"
STREAM_ID = "stream_id"  # stable consumer identity (crash recovery)
SINK_ID = "sink_id"  # stable writer identity (cross-restart idempotence)
# Topic-log retention trigger (the file-broker analog of real Pub/Sub's
# topic message_retention_duration, which is likewise a topic-level
# admin property): when the log exceeds this many bytes at a sink
# commit, the broker cuts the prefix every subscription has acked.
# Unset = grow-forever (historical behavior).
LOG_RETENTION_BYTES = "log_retention_bytes"
REPLAY_CACHE_REPLICAS = "replay_cache_replicas"  # replay-block copies (S9)
# Explicit replica cache roots (comma-separated absolute paths), one per
# replica beyond the primary. Replaces the derived
# `broker_dir/.read_cache_rep{r}` siblings so each copy can live on a
# genuinely independent failure domain (a second disk/mount or DFS path)
# — the deployment analog of MEMORY_AND_DISK_SER_2's distinct-executor
# placement (PubsubPartitionReader.scala:57).
REPLAY_CACHE_REPLICA_DIRS = "replay_cache_replica_dirs"

DEFAULT_NUM_PARTITIONS = 4  # package.scala:36
DEFAULT_MAX_MESSAGES_PER_PARTITION = 1000  # package.scala:33
DEFAULT_BACKLOG_THRESHOLD = 10_000  # PubsubSubscriptionMonitor.scala:33-35
DEFAULT_MAX_DYNAMIC_PARTITIONS = 256  # PubsubSubscriptionMonitor.scala:26-31
DEFAULT_REGION_SPLIT_THRESHOLD = 0.7  # package.scala:118
DEFAULT_ACK_DEADLINE_SECONDS = 60.0
DEFAULT_PUBLISH_BATCH_SIZE = 100
# The reference persists each pulled batch at MEMORY_AND_DISK_SER_2 —
# two copies on distinct executors (PubsubPartitionReader.scala:57) —
# so an executor loss between pull and commit replays from the replica
# instead of re-pulling. The file-cache analog defaults to one copy
# (this harness is single-node); set 2 to mirror the reference.
DEFAULT_REPLAY_CACHE_REPLICAS = 1
MAX_REPLAY_CACHE_REPLICAS = 4

DEFAULT_ENDPOINT = "pubsub.googleapis.com:443"


def region_endpoint(region: str | None = None) -> str:
    """Region → service endpoint mapping (package.scala:87-97): a
    region-pinned pull targets ``$region-pubsub.googleapis.com:443``;
    no region means the global endpoint. Pure function — consumed by
    ``RealBrokerClient`` when a real client library is present; the
    FileBroker models the same routing as a pull-side region filter."""
    if region is None or str(region).strip() == "" or region == "global":
        return DEFAULT_ENDPOINT
    return f"{region}-pubsub.googleapis.com:443"


def _require(options: dict, key: str) -> str:
    v = options.get(key)
    if v is None or str(v).strip() == "":
        raise ValueError(f"Missing required option: '{key}'")
    return str(v)


def _pos_int(
    options: dict,
    key: str,
    default: int,
    minimum: int = 1,
    maximum: int | None = None,
) -> int:
    raw = options.get(key)
    if raw is None:
        return default
    try:
        v = int(raw)
    except (TypeError, ValueError):
        raise ValueError(f"Option '{key}' must be an integer, got {raw!r}") from None
    if v < minimum:
        raise ValueError(f"Option '{key}' must be >= {minimum}, got {v}")
    if maximum is not None and v > maximum:
        raise ValueError(f"Option '{key}' must be <= {maximum}, got {v}")
    return v


def _bool(options: dict, key: str, default: bool = False) -> bool:
    raw = options.get(key)
    if raw is None:
        return default
    return str(raw).strip().lower() in ("true", "1", "yes")


@dataclass(frozen=True)
class PubsubReadOptions:
    """package.scala:49-57 equivalent."""

    project_id: str
    subscription: str
    broker_dir: str
    num_partitions: int = DEFAULT_NUM_PARTITIONS
    max_messages_per_partition: int = DEFAULT_MAX_MESSAGES_PER_PARTITION
    dynamic_partitioning: bool = False
    backlog_threshold: int = DEFAULT_BACKLOG_THRESHOLD
    max_dynamic_partitions: int = DEFAULT_MAX_DYNAMIC_PARTITIONS
    region_split_threshold: float = DEFAULT_REGION_SPLIT_THRESHOLD
    ack_deadline_seconds: float = DEFAULT_ACK_DEADLINE_SECONDS
    # Stable consumer identity: a restarted query passing the same
    # stream_id (e.g. its checkpoint path) re-claims the subscription
    # immediately instead of waiting out the registry's crash TTL.
    stream_id: str | None = None
    # Replay-cache copies per partition file (reference: 2× executor
    # replication via MEMORY_AND_DISK_SER_2, PubsubPartitionReader.scala:57).
    replay_cache_replicas: int = DEFAULT_REPLAY_CACHE_REPLICAS
    # Explicit replica roots, one per replica beyond the primary; empty
    # means the derived `.read_cache_rep{r}` siblings under broker_dir.
    replay_cache_replica_dirs: tuple = ()

    @property
    def subscription_path(self) -> str:
        # fully-qualified path, as surfaced in the `subscription` column
        # (PubsubPartitionReader.scala:87)
        return f"projects/{self.project_id}/subscriptions/{self.subscription}"

    @property
    def capacity_per_batch(self) -> int:
        return self.num_partitions * self.max_messages_per_partition


@dataclass(frozen=True)
class PubsubWriteOptions:
    """package.scala:67-80 equivalent."""

    project_id: str
    topic: str
    broker_dir: str
    ordering_key: str | None = None
    publish_batch_size: int = DEFAULT_PUBLISH_BATCH_SIZE
    # Stable writer identity: explicit sink_id, else derived from the
    # query's checkpointLocation (see _resolve_sink_id). When set,
    # committed batch ids persist under (topic, sink_id) and
    # re-delivered batches are suppressed across restarts
    # (effectively-once), and staged-file orphan GC can claim this
    # query's files. When neither is available, redelivery after a
    # restart republishes — the reference's documented at-least-once
    # (PubsubSink.scala:17-18 keeps latestBatchId per JVM instance; the
    # Python API constructs a fresh writer per commit, so only
    # persisted, query-scoped state can survive).
    sink_id: str | None = None
    # Ack-based topic-log retention, applied at commit: None retains
    # everything; a positive byte threshold compacts the fully-acked
    # prefix whenever the log outgrows it (FileBroker.compact_topic).
    log_retention_bytes: int | None = None
    # The query's checkpointLocation verbatim (when Spark forwarded it
    # or the caller passed it), kept SEPARATELY from sink_id: the
    # batch-id idempotence record is additionally scoped to the
    # checkpoint *instance* (the query id Spark mints into
    # <checkpoint>/metadata at creation), so a wiped-and-recreated
    # checkpoint — whose batch ids restart at 0 — can never be
    # swallowed by a stale record keyed to the same path or sink_id
    # (see datasource._checkpoint_instance_id).
    checkpoint_location: str | None = None

    @property
    def topic_path(self) -> str:
        return f"projects/{self.project_id}/topics/{self.topic}"


def _replica_dirs(options: dict, replicas: int) -> tuple:
    """Parse + validate explicit replica roots: count must equal
    ``replay_cache_replicas - 1`` (one root per copy beyond the
    primary), every path absolute — so the option cannot silently map
    two copies onto one failure domain or leave a copy unplaced."""
    raw = options.get(REPLAY_CACHE_REPLICA_DIRS)
    if raw is None or str(raw).strip() == "":
        return ()
    dirs = tuple(p.strip() for p in str(raw).split(",") if p.strip())
    if len(dirs) != replicas - 1:
        raise ValueError(
            f"Option '{REPLAY_CACHE_REPLICA_DIRS}' must list exactly "
            f"replay_cache_replicas-1 = {replicas - 1} paths, got {len(dirs)}"
        )
    for p in dirs:
        if not p.startswith("/"):
            raise ValueError(
                f"Option '{REPLAY_CACHE_REPLICA_DIRS}' paths must be "
                f"absolute, got {p!r}"
            )
    if len(set(dirs)) != len(dirs):
        raise ValueError(
            f"Option '{REPLAY_CACHE_REPLICA_DIRS}' paths must be distinct"
        )
    return dirs


def validate_read_options(options: dict) -> PubsubReadOptions:
    """validateAndInitReadOptions (package.scala:138-155)."""
    replicas = _pos_int(
        options,
        REPLAY_CACHE_REPLICAS,
        DEFAULT_REPLAY_CACHE_REPLICAS,
        minimum=1,
        maximum=MAX_REPLAY_CACHE_REPLICAS,
    )
    return PubsubReadOptions(
        project_id=_require(options, PROJECT_ID),
        subscription=_require(options, SUBSCRIPTION),
        broker_dir=_require(options, BROKER_DIR),
        num_partitions=_pos_int(options, NUM_PARTITIONS, DEFAULT_NUM_PARTITIONS),
        max_messages_per_partition=_pos_int(
            options, MAX_MESSAGES_PER_PARTITION, DEFAULT_MAX_MESSAGES_PER_PARTITION
        ),
        dynamic_partitioning=_bool(options, DYNAMIC_PARTITIONING, False),
        backlog_threshold=_pos_int(
            options, BACKLOG_THRESHOLD, DEFAULT_BACKLOG_THRESHOLD, minimum=1000
        ),
        max_dynamic_partitions=_pos_int(
            options, MAX_DYNAMIC_PARTITIONS, DEFAULT_MAX_DYNAMIC_PARTITIONS, minimum=32
        ),
        region_split_threshold=max(
            0.5, float(options.get(REGION_SPLIT_THRESHOLD, DEFAULT_REGION_SPLIT_THRESHOLD))
        ),
        ack_deadline_seconds=float(
            options.get(ACK_DEADLINE_SECONDS, DEFAULT_ACK_DEADLINE_SECONDS)
        ),
        stream_id=(
            str(options[STREAM_ID])
            if options.get(STREAM_ID) not in (None, "")
            else None
        ),
        replay_cache_replicas=replicas,
        replay_cache_replica_dirs=_replica_dirs(options, replicas),
    )


def _resolve_sink_id(options: dict) -> str | None:
    """Stable writer identity. Explicit ``sink_id`` wins; otherwise the
    query's checkpoint location stands in (r15 review: pyspark 4.1.2
    constructs a SEPARATE writer instance per worker process — one for
    executor write(), a fresh one for every driver commit() — so a
    per-instance token cannot link the two; the options dict is the
    one thing every construction sees identically, and Spark forwards
    ``checkpointLocation`` in it, lower-cased). The checkpoint IS the
    query identity Spark itself scopes batch ids to, so deriving both
    the stage-file owner token and batch idempotence from it is sound:
    concurrent queries cannot share a checkpoint, and a restart
    continues its numbering. None only when the query has neither —
    e.g. a session-default checkpoint dir, which Spark resolves
    without putting it in the options."""
    raw = options.get(SINK_ID)
    if raw not in (None, ""):
        return str(raw)
    ck = _checkpoint_of(options)
    if ck is not None:
        return "ck:" + ck
    return None


def _checkpoint_of(options: dict) -> str | None:
    """The query's checkpointLocation from the options map (Spark
    lower-cases option keys; direct callers may pass either casing)."""
    ck = options.get("checkpointlocation") or options.get("checkpointLocation")
    return str(ck) if ck not in (None, "") else None


def validate_write_options(options: dict) -> PubsubWriteOptions:
    """validateAndInitWriteOption (package.scala:164-171)."""
    key = options.get(ORDERING_KEY)
    return PubsubWriteOptions(
        project_id=_require(options, PROJECT_ID),
        topic=_require(options, TOPIC),
        broker_dir=_require(options, BROKER_DIR),
        ordering_key=str(key) if key not in (None, "") else None,
        publish_batch_size=_pos_int(
            options, PUBLISH_BATCH_SIZE, DEFAULT_PUBLISH_BATCH_SIZE
        ),
        sink_id=_resolve_sink_id(options),
        log_retention_bytes=(
            _pos_int(options, LOG_RETENTION_BYTES, default=0, minimum=1)
            if options.get(LOG_RETENTION_BYTES) not in (None, "")
            else None
        ),
        checkpoint_location=_checkpoint_of(options),
    )


@dataclass(frozen=True)
class PartitioningInfoForRegion:
    """package.scala:106-108 equivalent."""

    region: str
    num_partitions: int
    num_undelivered_messages: int


@dataclass(frozen=True)
class PartitioningInfo:
    """Region-split decision (package.scala:116-129): split partition
    planning by region when any single region holds more than
    ``split_threshold`` of the total backlog."""

    total_partitions: int
    by_region: tuple[PartitioningInfoForRegion, ...] = field(default_factory=tuple)

    @property
    def split_by_region(self) -> bool:
        return len(self.by_region) > 0


def calculate_partitions(
    backlog: int,
    threshold: int = DEFAULT_BACKLOG_THRESHOLD,
    max_partitions: int = DEFAULT_MAX_DYNAMIC_PARTITIONS,
    min_partitions: int = 1,
) -> int:
    """clamp(ceil(backlog / threshold), min, max)
    (PubsubSubscriptionMonitor.scala:136-141)."""
    if backlog <= 0:
        return min_partitions
    return max(min_partitions, min(max_partitions, math.ceil(backlog / threshold)))


def plan_partitioning(
    backlog_by_region: dict[str, int],
    threshold: int = DEFAULT_BACKLOG_THRESHOLD,
    max_partitions: int = DEFAULT_MAX_DYNAMIC_PARTITIONS,
    split_threshold: float = DEFAULT_REGION_SPLIT_THRESHOLD,
) -> PartitioningInfo:
    """Full planning decision (PubsubSubscriptionMonitor.scala:155-210 +
    package.scala:116-129): per-region partition counts when one region
    dominates, a single uniform count otherwise. Each region gets at
    least ``total // n_regions`` partitions, like the reference."""
    total_backlog = sum(backlog_by_region.values())
    total = calculate_partitions(total_backlog, threshold, max_partitions)
    if total_backlog > 0 and len(backlog_by_region) > 1:
        dominant = max(backlog_by_region.values()) / total_backlog
        if dominant > split_threshold:
            floor_per_region = max(1, total // len(backlog_by_region))
            by_region = tuple(
                PartitioningInfoForRegion(
                    region=r,
                    num_partitions=max(
                        floor_per_region,
                        calculate_partitions(b, threshold, max_partitions),
                    ),
                    num_undelivered_messages=b,
                )
                for r, b in sorted(backlog_by_region.items())
            )
            return PartitioningInfo(total_partitions=total, by_region=by_region)
    return PartitioningInfo(total_partitions=total)
