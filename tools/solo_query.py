"""Solo calibration-normal re-measure of one or more bench queries.

VERDICT r14 "What's wrong" #1 / next-round #1: the r14 driver bench
showed unadjudicated same-direction normalized movement on the four
cheapest headline queries (q06 +46%, q08 +25%, q14 +22%, q01 +13%
cold vs r13) with bodies byte-unchanged while every heavy query
improved. The prescribed first rung of the drift ladder is a SOLO
measure — a fresh session running ONLY the watched query, stamped
with the shared calibration probes (tools/calib.py), so nothing else
in a 3-run shared bench session can contaminate it.

Usage:
    python tools/solo_query.py q06_topk_per_group [more...] \
        [--out SOLO_r15_q06.json] [--warm-runs 6]

Discipline: warmup + calib3, then per query 1 cold + N warm runs to
the noop sink (bench.py's run_once shape), median/min/spread of warm.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.calib import calib3, warmup  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--out", default=None)
    ap.add_argument("--warm-runs", type=int, default=6)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="solo_query")
    specs = all_specs()
    warmup(spark, args.sf_dir)
    calibration = calib3(spark)

    def run_once(spec) -> float:
        t0 = time.perf_counter()
        spec.build(spark, args.sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    out: dict = {
        "tool": "tools/solo_query.py",
        "sf_dir": args.sf_dir,
        "calibration": calibration,
        "discipline": {
            "solo_session": True,
            "cold_runs": 1,
            "warm_runs": args.warm_runs,
        },
        "session": {
            "driver_memory": spark.conf.get("spark.driver.memory", "unset"),
            "shuffle_partitions": spark.conf.get(
                "spark.sql.shuffle.partitions"
            ),
            "master": spark.conf.get("spark.master", "unset"),
        },
        "queries": {},
    }
    for name in args.queries:
        spec = specs[name]
        cold = run_once(spec)
        warm = [run_once(spec) for _ in range(args.warm_runs)]
        out["queries"][name] = {
            "cold_s": round(cold, 4),
            "warm_runs_s": [round(w, 4) for w in warm],
            "warm_median_s": round(statistics.median(warm), 4),
            "warm_min_s": round(min(warm), 4),
            "warm_spread_pct": round(
                100.0 * (max(warm) - min(warm)) / min(warm), 1
            ),
        }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
