"""Driver-independent bench.py logic: the previous-round selection
that ``deltas_vs_prev`` compares against (ADVICE r4 — must never diff
a re-run against the round's own just-recorded file)."""

from __future__ import annotations

import json

from bench import latest_prior_bench


def _mk(tmp_path, *, verdict_round=None, bench_rounds=()):
    if verdict_round is not None:
        (tmp_path / "VERDICT.md").write_text(
            f"# VERDICT — round {verdict_round}\n\nbody\n"
        )
    for r in bench_rounds:
        (tmp_path / f"BENCH_r{r:02d}.json").write_text(json.dumps({"round": r}))
    return str(tmp_path)


def test_picks_highest_round_below_current(tmp_path):
    # round being recorded = verdict 4 + 1 = 5 → compare against r04
    repo = _mk(tmp_path, verdict_round=4, bench_rounds=(1, 2, 3, 4))
    assert latest_prior_bench(repo).endswith("BENCH_r04.json")


def test_ignores_current_rounds_own_file(tmp_path):
    # the driver already recorded BENCH_r05 within round 5: a bench
    # re-run must still diff against r04, not itself
    repo = _mk(tmp_path, verdict_round=4, bench_rounds=(1, 2, 3, 4, 5))
    assert latest_prior_bench(repo).endswith("BENCH_r04.json")


def test_round_one_no_verdict_no_benches(tmp_path):
    repo = _mk(tmp_path)
    assert latest_prior_bench(repo) is None


def test_no_verdict_falls_back_to_latest(tmp_path):
    # no VERDICT yet (round 1): any existing file predates this run
    repo = _mk(tmp_path, bench_rounds=(1, 2))
    assert latest_prior_bench(repo).endswith("BENCH_r02.json")


def test_unparseable_verdict_header_falls_back(tmp_path):
    repo = _mk(tmp_path, bench_rounds=(1, 2))
    (tmp_path / "VERDICT.md").write_text("no number here\n")
    assert latest_prior_bench(repo).endswith("BENCH_r02.json")


def test_calibration_drift_normalization_math():
    """The normalized delta must divide this round's time by the mean
    probe drift before diffing (r6): a query that moved exactly with
    the machine normalizes to ~0%, one that moved against it keeps a
    real delta."""
    calibration = {"cpu_probe_s": 0.6, "shuffle_probe_s": 0.8}
    prev_cal = {"cpu_probe_s": 0.3, "shuffle_probe_s": 0.4}  # machine 2x slower now
    drift = (
        calibration["cpu_probe_s"] / prev_cal["cpu_probe_s"]
        + calibration["shuffle_probe_s"] / prev_cal["shuffle_probe_s"]
    ) / 2.0
    assert drift == 2.0
    prev_q, now_uniform, now_regressed = 1.0, 2.0, 4.0
    norm_uniform = 100.0 * (now_uniform / drift - prev_q) / prev_q
    norm_regressed = 100.0 * (now_regressed / drift - prev_q) / prev_q
    assert norm_uniform == 0.0  # pure machine drift reads as flat
    assert norm_regressed == 100.0  # real regression survives normalization
