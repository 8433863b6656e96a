"""Differential correctness for the stateful streaming queries.

The driver's oracle gate can only do rows-only checks on q30/q31/q33/
q50 (watermark + micro-batch semantics aren't SQL-expressible), so
these tests upgrade them from "runs and terminates" to "equals batch
semantics": after a full ``availableNow`` drain of the same seeded
1,000 events, the streaming result must match the equivalent batch
computation on those events.

Why equality holds (and where it provably can't):

- q30 (windowed agg, complete mode) / q50 (session windows, complete
  mode): complete output mode ignores the watermark — no state is
  evicted and no late input is dropped — so the drained result is
  exactly the batch ``groupBy(window(...))`` / ``session_window`` over
  the full input, regardless of micro-batch cuts.
- q33 (applyInPandasWithState, update mode): totals are integer cents
  maintained in keyed state with NoTimeout; each batch re-emits the
  updated totals, so the *last* emission per user equals the batch
  count/sum. ``n_events`` is strictly increasing per user, so
  ``max(struct(n_events, sum_value_q2))`` selects it deterministically.
- q31 (dropDuplicatesWithinWatermark): exact row equality is genuinely
  micro-batch-dependent (a key re-arriving after its state expired is
  legitimately re-emitted), so the differential invariants are the ones
  the operator guarantees: the emitted key set equals the batch
  distinct key set, every emitted row is a real input row, and there
  are no duplicate emissions closer than the watermark gap.

Floating-point note: double sums are compared with rel=1e-9 (shuffle
order differs between the streaming and batch plans); counts and
integer-cents sums must match exactly.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from spark_sql_pubsub_connector_spark.plans.streaming_ops import (
    _N_EVENTS,
    q30_stream_window_agg,
    q31_stream_dedup_watermark,
    q33_stream_stateful_counts,
    q50_stream_session_window,
)
from spark_sql_pubsub_connector_spark.plans.tables import load_table


def _seeded_events(spark, sf_dir):
    """The exact batch twin of what _streamed_events publishes: the
    first _N_EVENTS events by event_id, with the same µs-truncated
    event timestamp (load_table's ts == the broker publish_timestamp)."""
    return (
        load_table(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(_N_EVENTS)
        .select("event_id", "user_id", "event_type", "value", "ts")
    )


def _rows(df, *key_cols):
    return sorted((tuple(r) for r in df.collect()), key=lambda t: t[: len(key_cols)])


def _assert_rows_equal(stream_rows, batch_rows, approx_idx=()):
    """Exact tuple equality except the columns in approx_idx (double
    sums, compared at rel 1e-9)."""
    assert len(stream_rows) == len(batch_rows)
    for s, b in zip(stream_rows, batch_rows):
        for i, (sv, bv) in enumerate(zip(s, b)):
            if i in approx_idx:
                assert sv == pytest.approx(bv, rel=1e-9, abs=1e-9)
            else:
                assert sv == bv


def test_q30_equals_batch_window_agg(spark, sf_dir):
    streamed = q30_stream_window_agg(spark, sf_dir)
    batch = (
        _seeded_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    s = _rows(streamed.select("window_start_us", "event_type", "n", "sum_value"), 0, 1)
    b = _rows(batch, 0, 1)
    _assert_rows_equal(s, b, approx_idx={3})


def test_q50_equals_batch_session_window(spark, sf_dir):
    streamed = q50_stream_session_window(spark, sf_dir)
    batch = (
        _seeded_events(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )
    s = _rows(
        streamed.select(
            "user_id", "session_start_us", "session_end_us", "n_events", "sum_value"
        ),
        0,
        1,
    )
    b = _rows(batch, 0, 1)
    _assert_rows_equal(s, b, approx_idx={4})


def test_q33_final_state_equals_batch_totals(spark, sf_dir):
    streamed = q33_stream_stateful_counts(spark, sf_dir)
    # update-mode memory sink holds one emission per (user, batch);
    # n_events is strictly increasing per user, so the struct max is
    # the final state
    finals = (
        streamed.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value_q2")).alias("f"))
        .select("user_id", "f.n_events", "f.sum_value_q2")
    )
    batch = (
        _seeded_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # q33's state folds pandas .round() — half-even, i.e. bround
            F.sum(F.expr("CAST(bround(value * 100) AS LONG)")).alias("sum_value_q2"),
        )
    )
    s = _rows(finals, 0)
    b = _rows(batch, 0)
    _assert_rows_equal(s, b)


def test_q31_dedup_invariants_vs_batch(spark, sf_dir):
    streamed = q31_stream_dedup_watermark(spark, sf_dir)
    ev = _seeded_events(spark, sf_dir)

    out = streamed.select("event_id", "user_id", "event_type", "value").collect()

    # 1) emitted key set == batch distinct key set (nothing lost,
    #    nothing invented)
    stream_keys = {(r["user_id"], r["event_type"]) for r in out}
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in ev.select("user_id", "event_type").distinct().collect()
    }
    assert stream_keys == batch_keys

    # 2) every emitted row is a real input row (no synthesis, no
    #    mutation through the connector + dedup path)
    input_rows = {
        (r["event_id"], r["user_id"], r["event_type"], r["value"])
        for r in ev.select("event_id", "user_id", "event_type", "value").collect()
    }
    emitted = [(r["event_id"], r["user_id"], r["event_type"], r["value"]) for r in out]
    assert set(emitted) <= input_rows

    # 3) no event_id emitted twice (each input row at most once)
    ids = [r["event_id"] for r in out]
    assert len(ids) == len(set(ids))


def test_q48_final_state_equals_batch_totals(spark, sf_dir):
    """q48 (transformWithState, or its applyInPandasWithState fallback
    when protobuf is absent) maintains the same integer-cents totals as
    q33 but keyed by event_type — its last emission per key must equal
    the batch aggregation."""
    from spark_sql_pubsub_connector_spark.plans.streaming_ops import (
        q48_stream_transform_with_state,
    )

    streamed = q48_stream_transform_with_state(spark, sf_dir)
    finals = (
        streamed.groupBy("event_type")
        .agg(F.max(F.struct("n_events", "sum_value_q2")).alias("f"))
        .select("event_type", "f.n_events", "f.sum_value_q2")
    )
    batch = (
        _seeded_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # q48's fold uses pandas .round() — half-even, i.e. bround
            F.sum(F.expr("CAST(bround(value * 100) AS LONG)")).alias("sum_value_q2"),
        )
    )
    _assert_rows_equal(_rows(finals, 0), _rows(batch, 0))


def test_q63_equals_batch_interval_join(spark, sf_dir):
    """q63's inner interval join under a lossless watermark must equal
    the batch range join (purchase x same-user error within the prior
    6 hours) on the seeded events — all integer columns, so exact."""
    from spark_sql_pubsub_connector_spark.plans.streaming_ops import (
        q63_stream_stream_join,
    )

    streamed = q63_stream_stream_join(spark, sf_dir)
    ev = _seeded_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts_us").alias("p_us"),
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts_us").alias("e_us"),
    )
    batch = (
        pur.join(
            err,
            (F.col("user_id") == F.col("e_user"))
            & (F.col("e_us") <= F.col("p_us"))
            & (F.col("p_us") - F.col("e_us") <= 21_600_000_000),
        )
        .select(
            "purchase_id", "error_id", "user_id",
            (F.col("p_us") - F.col("e_us")).alias("lag_us"),
        )
    )
    s = _rows(streamed.select("purchase_id", "error_id", "user_id", "lag_us"), 0, 1)
    b = _rows(batch, 0, 1)
    # guard against empty-equals-empty: the 6 h interval must produce
    # matches at this scale, or the equivalence below is vacuous
    assert len(b) > 0, "batch interval join found no pairs — test is vacuous"
    _assert_rows_equal(s, b)
