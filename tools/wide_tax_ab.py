"""Same-session interleaved A/B for the exact-agg wide-accumulator tax
(VERDICT r13 #7).

Separate-session wide-vs-narrow bench runs cannot pin the knob's cost
on this drift-prone host: two r14 attempts produced +291% / +663%
readings on queries whose physical plans are BYTE-IDENTICAL under the
knob (proven by id-normalized executedPlan comparison) — pure host
windows. The knob rewrites esum/eavg expressions at driver-side plan
construction, so one session can alternate modes per run:
``set_accumulator_mode('wide')`` → build → run → flip back — the
classic interleaved protocol (q22's guard A/B, bench_ab) that cancels
drift by pairing.

Subjects are the three esum-bearing headline queries (the only
mode-dependent plans in the bench set): q01 (pure agg — pays the full
DECIMAL(38,0) sum-buffer cost), q08 (agg behind a shuffle join), q14
(agg inside tumbling windows).

Usage:
    python tools/wide_tax_ab.py --out WIDETAX_r14.json [--rounds 6]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import calib  # noqa: E402  (shared probe protocol)

SUBJECTS = [
    "q01_pricing_summary",
    "q08_join_shuffle_agg",
    "q14_window_tumbling",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from spark_sql_pubsub_connector_spark.functions import exact
    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="wide_tax_ab")
    sf_dir = args.sf_dir
    calib.warmup(spark, sf_dir)


    def run_once(name: str, mode: str) -> float:
        prev = exact.set_accumulator_mode(mode)
        try:
            spec = all_specs()[name]
            t0 = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
        finally:
            exact.set_accumulator_mode(prev)
        spark.catalog.clearCache()
        return round(wall, 4)

    result: dict = {
        "tool": "wide_tax_ab",
        "sf_dir": sf_dir,
        "rounds": args.rounds,
        "subjects": SUBJECTS,
        "session": {
            "driver_memory": spark.conf.get("spark.driver.memory", "unset"),
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions"
            ),
        },
    }
    result["calibration_start"] = calib.calib3(spark)
    runs: dict[str, dict[str, list[float]]] = {
        n: {"bigint": [], "wide": []} for n in SUBJECTS
    }
    # one discarded cold per (subject, mode)
    for n in SUBJECTS:
        run_once(n, "bigint")
        run_once(n, "wide")
    for r in range(args.rounds):
        for n in SUBJECTS:
            order = ["bigint", "wide"] if r % 2 == 0 else ["wide", "bigint"]
            for mode in order:
                runs[n][mode].append(run_once(n, mode))
    result["calibration_end"] = calib.calib3(spark)
    result["warm_runs"] = runs
    taxes = {}
    for n in SUBJECTS:
        mb = statistics.median(runs[n]["bigint"])
        mw = statistics.median(runs[n]["wide"])
        taxes[n] = {
            "bigint_warm_median": round(mb, 4),
            "wide_warm_median": round(mw, 4),
            "wide_tax_pct": round(100.0 * (mw - mb) / mb, 1),
            "spread_pct_bigint": round(
                100.0
                * (max(runs[n]["bigint"]) - min(runs[n]["bigint"]))
                / min(runs[n]["bigint"]),
                1,
            ),
            "spread_pct_wide": round(
                100.0
                * (max(runs[n]["wide"]) - min(runs[n]["wide"]))
                / min(runs[n]["wide"]),
                1,
            ),
        }
    result["wide_tax"] = taxes
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(taxes, indent=1))


if __name__ == "__main__":
    main()
