"""Driver-independent logic of tools/scale_probe.py: the --compare
regression gate (VERDICT r5 #4) must fail exactly when a query's
scale ratio grew more than GATE_GROWTH× round-over-round, tolerate
coverage changes (queries present in only one artifact), and read
both artifact shapes (this tool's --out layout and the hand-rolled
SCALE_r05.json layout)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from scale_probe import GATE_GROWTH, compare  # noqa: E402


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_gate_passes_on_flat_ratios(tmp_path, capsys):
    prev = _write(
        tmp_path, "prev.json",
        {"time_ratios_vs_x1": {"25": {"q1": 2.0, "q2": 5.0}}},
    )
    cur = _write(
        tmp_path, "cur.json",
        {"time_ratios_vs_x1": {"25": {"q1": 2.2, "q2": 4.0}}},
    )
    assert compare(prev, cur) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["failures"] == []


def test_gate_fails_on_superlinear_growth(tmp_path, capsys):
    prev = _write(
        tmp_path, "prev.json", {"time_ratios_vs_x1": {"25": {"q1": 2.0}}}
    )
    cur = _write(
        tmp_path, "cur.json",
        {"time_ratios_vs_x1": {"25": {"q1": 2.0 * GATE_GROWTH + 0.1}}},
    )
    assert compare(prev, cur) == 1
    out = json.loads(capsys.readouterr().out)
    assert len(out["failures"]) == 1
    assert out["failures"][0]["query"] == "q1"


def test_new_queries_reported_not_failed(tmp_path, capsys):
    prev = _write(
        tmp_path, "prev.json", {"time_ratios_vs_x1": {"25": {"q1": 2.0}}}
    )
    cur = _write(
        tmp_path, "cur.json",
        {"time_ratios_vs_x1": {"25": {"q1": 2.0, "q_new": 99.0}}},
    )
    assert compare(prev, cur) == 0  # coverage change, not a regression
    out = json.loads(capsys.readouterr().out)
    assert out["coverage_changes"] == {"25x:q_new": {"new_only": 99.0}}


def test_reads_r5_hand_rolled_artifact_shape(tmp_path, capsys):
    prev = _write(tmp_path, "prev.json", {"time_ratios_vs_1x": {"q1": 2.0}})
    cur = _write(
        tmp_path, "cur.json", {"time_ratios_vs_x1": {"25": {"q1": 10.0}}}
    )
    assert compare(prev, cur) == 1
    out = json.loads(capsys.readouterr().out)
    assert out["failures"][0]["growth"] == 5.0


def test_validate_only_rejects_unknown_names():
    """ADVICE r6: a misspelled --only name must be a hard error, never
    a silently-empty spec set that writes an empty artifact and lets a
    later --compare pass vacuously."""
    import pytest

    from scale_probe import validate_only

    known = {"q01_pricing_summary", "q22_embedding_neardup"}
    assert validate_only(["q22_embedding_neardup"], known) == [
        "q22_embedding_neardup"
    ]
    with pytest.raises(SystemExit, match="q22_embeding_neardup"):
        validate_only(["q22_embeding_neardup"], known)  # typo
    with pytest.raises(SystemExit):
        validate_only([""], known)  # "--only ''" → [''] → unknown
    with pytest.raises(SystemExit, match="empty"):
        validate_only([], known)
