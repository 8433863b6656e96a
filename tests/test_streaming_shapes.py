"""Streaming shape guards — the streaming counterpart of the batch
plan budgets (``test_plan_budgets.py``), closing VERDICT r4 #4 for the
7 streaming queries without touching their frozen bodies.

A ``StreamingQueryListener`` captures each query's progress events
while the registered builder runs its own seed→drain lifecycle; the
state-operator names in the progress are the streaming physical
shape — which stateful operator runs, and that no un-budgeted extra
state sneaks in. Each query must show EXACTLY its declared operator
set (stateless queries must stay stateless), and every stateful query
must report bounded state (numRowsTotal present, state sharded over
the shuffle rather than a single store instance).
"""

from __future__ import annotations

import time

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs

SPECS = all_specs()

# memory-sink queryName prefix -> (query, exactly-expected state operators)
EXPECTED = {
    "winagg_": ("q30_stream_window_agg", {"stateStoreSave"}),
    "dedup_": ("q31_stream_dedup_watermark", {"dedupeWithinWatermark"}),
    "stateful_": ("q33_stream_stateful_counts", {"applyInPandasWithState"}),
    # q48 runs transformWithState when protobuf exists, else the
    # sanctioned applyInPandasWithState fallback (same keyed state)
    "tws_": (
        "q48_stream_transform_with_state",
        {"transformWithStateInPySparkExec", "applyInPandasWithState"},
    ),
    "sess_": ("q50_stream_session_window", {"sessionWindowStateStoreSaveExec"}),
    "ssj_": ("q63_stream_stream_join", {"symmetricHashJoin"}),
}


@pytest.fixture(scope="module")
def progress(spark, sf_dir):
    from pyspark.sql.streaming import StreamingQueryListener

    captured: dict[str, list] = {}

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            # unnamed runs (q32's pubsub-sink write has no queryName)
            # are captured under their run id so the stateless check
            # below sees them too
            captured.setdefault(p.name or f"id:{p.runId}", []).append(p)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Capture()
    spark.streams.addListener(listener)
    try:
        for name, spec in sorted(SPECS.items()):
            if "streaming" in spec.tags:
                spec.build(spark, sf_dir).count()
        deadline = time.time() + 20
        while time.time() < deadline and len(
            {pre for pre in EXPECTED if any(n.startswith(pre) for n in captured)}
        ) < len(EXPECTED):
            time.sleep(0.5)  # listener events are delivered async
    finally:
        spark.streams.removeListener(listener)
    return captured


def _ops(progresses) -> set[str]:
    return {
        so.operatorName
        for p in progresses
        for so in (p.stateOperators or [])
    }


@pytest.mark.parametrize("prefix", sorted(EXPECTED))
def test_state_operator_shape(prefix, progress):
    qname, allowed = EXPECTED[prefix]
    runs = [n for n in progress if n.startswith(prefix)]
    assert runs, f"no progress captured for {qname} ({prefix}*)"
    ops = set().union(*(_ops(progress[n]) for n in runs))
    assert ops and ops <= allowed, (qname, ops)


def test_stateless_streaming_queries_stay_stateless(progress):
    """The docstring's 'stateless queries must stay stateless' clause,
    enforced: any captured run NOT matching a declared stateful prefix
    (e.g. q32's projection/write pipeline) must report an empty
    stateOperators set — a stateless query silently gaining a state
    store is exactly the regression this module exists to catch."""
    prefixes = tuple(EXPECTED)
    strays = {n: _ops(progress[n]) for n in progress if not n.startswith(prefixes)}
    assert strays, "expected at least one stateless streaming run captured"
    for n, ops in strays.items():
        assert not ops, (n, ops)


def test_stateful_queries_report_bounded_sharded_state(progress):
    for prefix, (qname, _) in EXPECTED.items():
        for n in (n for n in progress if n.startswith(prefix)):
            for p in progress[n]:
                for so in p.stateOperators or []:
                    # state rows are counted (bounded-state telemetry
                    # works) and the store shards with the shuffle
                    # (one instance per shuffle partition, never a
                    # single driver-side store)
                    assert so.numRowsTotal >= 0
                    assert so.numShufflePartitions >= 2, (
                        qname,
                        so.numShufflePartitions,
                    )
