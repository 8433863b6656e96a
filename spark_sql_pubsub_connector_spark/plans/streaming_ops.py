"""Stateful streaming operators run end-to-end through the pubsub
connector (SURVEY.md §2.3 'streaming dedup' / §2.2 streaming surface).

Each query seeds the file-backed fake broker from the ``events`` table
(streaming/pipelines.py), reads it back with
``spark.readStream.format("pubsub")`` under ``Trigger.AvailableNow``
(the reference's bounded-drain mode, S5), applies the stateful
operator, drains into a memory sink, and returns the materialized
result. That exercises the connector's full lifecycle — synthetic
offsets (S4), partitioned pull (S7), replay cache (S9), ack-on-commit
(S11) — inside the driver's correctness harness.

These are the genuinely non-SQL-expressible entries (``oracle=None``):
watermark advancement depends on micro-batch boundaries, so only the
rows-only check applies (SURVEY.md §2.3 table: 'rows-only (stateful)').

Scale notes: state is keyed (event_type / window or user_id), so it
shards across executors with the shuffle; watermarks bound state size;
``availableNow`` drains unbounded backlogs in bounded batches.
"""

from __future__ import annotations

import json
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query

_N_EVENTS = 1_000


def _payload_schema() -> str:
    return "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"


def _streamed_events(spark: SparkSession, sf_dir: str, tag: str):
    """Seed a fresh broker+subscription and return the decoded event
    stream (unique names per call — the stream registry enforces the
    reference's one-subscription-one-stream rule, S12)."""
    # imported lazily: streaming.pipelines imports plans.tables, so a
    # module-level import would be circular through plans/__init__
    from ..streaming.pipelines import read_stream, seed_topic_from_events

    run = f"{tag}-{uuid.uuid4().hex[:8]}"
    broker_dir = tempfile.mkdtemp(prefix=f"pubsub-{run}-")
    topic, sub = f"t-{run}", f"s-{run}"
    seed_topic_from_events(
        spark, sf_dir, broker_dir, topic, sub, limit=_N_EVENTS, ack_deadline_s=600
    )
    raw = read_stream(
        spark,
        broker_dir,
        sub,
        num_partitions=4,
        max_messages_per_partition=200,
    )
    ev = raw.select(
        F.col("publish_timestamp").alias("ts"),
        F.from_json(F.col("data").cast("string"), _payload_schema()).alias("j"),
    ).select("ts", "j.*")
    return ev, run


def _drain_to_memory(df: DataFrame, name: str, output_mode: str) -> DataFrame:
    ckpt = tempfile.mkdtemp(prefix=f"ckpt-{name}-")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return df.sparkSession.table(name)


@query(
    "q30_stream_window_agg",
    oracle=None,  # stateful: result shape depends on micro-batch cuts
    tags=("streaming", "window", "watermark"),
)
def q30_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark, fed by
    the pubsub source under availableNow — the streaming twin of
    q14_window_tumbling. Complete output mode materializes every
    window after the bounded drain."""
    ev, run = _streamed_events(spark, sf_dir, "winagg")
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return _drain_to_memory(agg, f"winagg_{run.replace('-', '_')}", "complete")


@query(
    "q31_stream_dedup_watermark",
    oracle=None,  # dropDuplicatesWithinWatermark state spans batches
    tags=("streaming", "dedup", "watermark"),
)
def q31_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicatesWithinWatermark on
    (user_id, event_type) — at-least-once input (the connector's
    delivery guarantee, S11) collapsed to effectively-once rows, the
    canonical pairing for a Pub/Sub-style source. Keyed state shards
    with the shuffle; the watermark expires it."""
    ev, run = _streamed_events(spark, sf_dir, "dedup")
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    out = deduped.select("event_id", "user_id", "event_type", "value")
    return _drain_to_memory(out, f"dedup_{run.replace('-', '_')}", "append")


@query(
    "q33_stream_stateful_counts",
    oracle=None,  # arbitrary-stateful: per-batch emission is not SQL
    tags=("streaming", "stateful", "applyInPandasWithState"),
)
def q33_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (the
    PySpark surface for operators Structured Streaming lacks,
    SURVEY.md §2.3): per-user running (n_events, sum_value) maintained
    in keyed GroupState across micro-batches, emitting the updated
    totals each batch. State shards with the groupBy shuffle and is
    O(distinct users) — the scale-safe shape for arbitrary stateful
    logic."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    ev, run = _streamed_events(spark, sf_dir, "stateful")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value_q2", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("sv_q2", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, sv = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact integer cents, like functions/exact.py; dropna =
            # SQL sum semantics (null values don't crash the cast,
            # they're skipped — matching the batch twin's F.sum)
            sv += int((pdf["value"].dropna() * 100).round().astype("int64").sum())
        state.update((n, sv))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value_q2": [sv]}
        )

    counts = (
        ev.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _drain_to_memory(counts, f"stateful_{run.replace('-', '_')}", "update")


@query(
    "q48_stream_transform_with_state",
    oracle=None,  # arbitrary-stateful: per-batch emission is not SQL
    tags=("streaming", "stateful", "transformWithState"),
)
def q48_stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful processing on Spark 4's transformWithState
    API (the successor to applyInPandasWithState, q33): a
    ``StatefulProcessor`` with a typed ``ValueState`` keeps per-
    event_type running (n_events, sum_value_q2) across micro-batches
    and emits the updated totals each batch. Requires the RocksDB
    state-store provider — the production provider anyway.

    transformWithState's state protocol speaks protobuf between the
    JVM and the Python worker; this container ships no
    ``google.protobuf``, so when that import is missing the SAME
    processor logic runs through applyInPandasWithState instead
    (identical keying, state contents, and per-batch emission —
    sanctioned import-try gating, like the multimodal codecs)."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev, run = _streamed_events(spark, sf_dir, "tws")

    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n_events", LongType()),
            StructField("sum_value_q2", LongType()),
        ]
    )

    def fold(n: int, sv: int, pdfs) -> tuple[int, int]:
        for pdf in pdfs:
            n += len(pdf)
            # exact integer cents, like functions/exact.py; dropna =
            # SQL sum semantics (null values don't crash the cast,
            # they're skipped — matching the batch twin's F.sum)
            sv += int((pdf["value"].dropna() * 100).round().astype("int64").sum())
        return n, sv

    keyed = ev.select("event_type", "value").groupBy("event_type")

    try:
        import google.protobuf  # noqa: F401  (TWS state protocol dep)

        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        _has_tws = True
    except ImportError:
        _has_tws = False

    if _has_tws:
        # transformWithState requires the RocksDB provider, but the conf
        # is session-wide: set it only for this query's start and restore
        # the prior value afterwards so later streaming queries on the
        # shared session keep their own provider (ADVICE r2)
        _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
        try:
            prev_provider = spark.conf.get(_PROVIDER_KEY)
        except Exception:
            prev_provider = None
        spark.conf.set(
            _PROVIDER_KEY,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

        class RunningTotals(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._agg = handle.getValueState("agg", "n LONG, sv LONG")

            def handleInputRows(self, key, rows, timerValues):
                n, sv = self._agg.get() if self._agg.exists() else (0, 0)
                n, sv = fold(n, sv, rows)
                self._agg.update((n, sv))
                yield pd.DataFrame(
                    {
                        "event_type": [key[0]],
                        "n_events": [n],
                        "sum_value_q2": [sv],
                    }
                )

            def close(self) -> None:
                pass

        counts = keyed.transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
        try:
            # the provider is read at query start, so it must stay set
            # through the drain; restore once the query has terminated
            return _drain_to_memory(
                counts, f"tws_{run.replace('-', '_')}", "update"
            )
        finally:
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        state_schema = StructType(
            [StructField("n", LongType()), StructField("sv", LongType())]
        )

        def update(key, pdfs, state: GroupState):
            n, sv = state.get if state.exists else (0, 0)
            n, sv = fold(n, sv, pdfs)
            state.update((n, sv))
            yield pd.DataFrame(
                {"event_type": [key[0]], "n_events": [n], "sum_value_q2": [sv]}
            )

        counts = keyed.applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return _drain_to_memory(counts, f"tws_{run.replace('-', '_')}", "update")


@query(
    "q50_stream_session_window",
    oracle=None,  # session boundaries depend on micro-batch watermarks
    tags=("streaming", "session", "watermark"),
)
def q50_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization via ``session_window`` — the streaming
    twin of batch q15 (lag + running sum): per-user sessions close
    after 30 minutes of event-time inactivity, emitted once the
    watermark passes the session end. Session state is keyed by
    (user_id, session) and bounded by the watermark — the merge-on-
    overlap implementation Spark ships that the batch form emulates."""
    ev, run = _streamed_events(spark, sf_dir, "sess")
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(
            F.session_window("ts", "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
    return _drain_to_memory(agg, f"sess_{run.replace('-', '_')}", "complete")


@query(
    "q32_stream_sink_roundtrip",
    oracle=None,  # connector lifecycle check, not a relational result
    tags=("streaming", "sink"),
)
def q32_stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source→sink round-trip: read the seeded subscription, republish
    to a second topic through the pubsub *sink* (schema-validated,
    batch-idempotent, S14-S16), then pull the second subscription raw
    and return its messages as a batch DataFrame. Exercises both
    connector halves in one driver-checkable query."""
    from ..sources.broker import FileBroker
    from ..streaming.pipelines import (
        read_stream,
        seed_topic_from_events,
        write_stream,
    )

    ev_run = f"rt-{uuid.uuid4().hex[:8]}"
    broker_dir = tempfile.mkdtemp(prefix=f"pubsub-{ev_run}-")
    topic, sub = f"t-{ev_run}", f"s-{ev_run}"
    seed_topic_from_events(
        spark, sf_dir, broker_dir, topic, sub, limit=200, ack_deadline_s=600
    )
    broker = FileBroker(broker_dir)
    broker.create_topic(f"{topic}-out")
    broker.create_subscription(f"{sub}-out", f"{topic}-out", ack_deadline_s=600)

    src = read_stream(
        spark, broker_dir, sub, num_partitions=2, max_messages_per_partition=100
    )
    out = src.select("data", "attributes", F.col("ordering_key").alias("okey"))
    ckpt = tempfile.mkdtemp(prefix=f"ckpt-{ev_run}-")
    q = write_stream(
        out,
        broker_dir,
        f"{topic}-out",
        ckpt,
        ordering_key="okey",
        trigger_available_now=True,
    )
    q.awaitTermination(240)

    msgs = broker.topic_messages(f"{topic}-out")
    rows = [
        (
            m.data.decode(),
            json.loads(m.data.decode())["event_id"],
            m.ordering_key,
        )
        for m in msgs
    ]
    return spark.createDataFrame(rows, "data string, event_id long, ordering_key string")


@query(
    "q63_stream_stream_join",
    oracle=None,  # join-state emission depends on micro-batch cuts
    tags=("streaming", "join", "interval"),
)
def q63_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join — the last core Structured Streaming
    capability next to aggregation/dedup/session/arbitrary-state:
    purchases joined to same-user errors from the preceding 6 hours
    (wide enough that the synthetic traffic actually produces matches
    at every SF — 30 minutes yields zero pairs on the seeded slice),
    both sides watermarked, keyed state evicted by the time bound. Both
    sides derive from ONE connector stream (a streaming self-join);
    the source's replay cache (S9) guarantees the two scans of each
    micro-batch see identical rows, which is exactly the deterministic
    re-evaluation contract the reference built its RDD-block cache for.

    The 30-day watermark makes the bounded drain lossless (no join
    state is evicted while the seeded window is in flight), so the
    inner-join result equals the batch range join on the same events —
    asserted by its differential test. At scale the watermark is the
    state bound: join state is O(events within the watermark window),
    sharded by user_id."""
    ev, run = _streamed_events(spark, sf_dir, "ssj")
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "30 days")
    )
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", "30 days")
    )
    j = pur.join(
        err,
        (F.col("user_id") == F.col("e_user"))
        & (F.col("e_ts") <= F.col("p_ts"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 6 HOURS")),
        "inner",
    )
    out = j.select(
        "purchase_id",
        "error_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("e_ts")).alias("lag_us"),
    )
    return _drain_to_memory(out, f"ssj_{run.replace('-', '_')}", "append")
