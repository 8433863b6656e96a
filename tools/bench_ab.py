"""Controlled same-session A/B for bench anomalies (VERDICT r8 #1/#3).

Round 8 left two unexplained bench-session numbers:

  - q08's warm median regressed +37.2% normalized vs r7 (0.786 ->
    1.122 s) while its cold time moved only +5.4% and its body is
    byte-frozen — outside its own ±11.7% spread band.
  - q22's warm median EXCEEDED its cold time (12.47 s cold vs 13.97 s
    warm-median) — an inversion suggesting the default-8g bench
    session accumulates heap/GC pressure across q22's three runs.

This tool reruns the r6-q20 / r8-q54 adjudication playbook: one
session, interleaved measurement, then the whole protocol repeated
under a different heap so session-sizing effects separate from host
noise. Within ONE session (heap fixed at JVM launch) it measures:

  1. calibration probes (host speed at protocol start),
  2. q08 warm ALONE (n warm runs after one discarded cold),
  3. the FULL bench headline pass in sorted order (cold + warm runs
     per query, exactly bench.py's discipline incl. clearCache),
     recording every query but keeping q08/q22 as the subjects,
  4. q08 warm AGAIN after the headline pass (same session — any
     delta vs step 2 is session aging, q22's three ~14 s runs and
     the other heavies having come and gone in between),
  5. calibration probes again (host speed at protocol end).

Run it once per heap size (the heap must be set before JVM launch):

    python tools/bench_ab.py --mem 8g  --out Q08AB_8g.json
    python tools/bench_ab.py --mem 13g --out Q08AB_13g.json

Round 12 generalized the subject list (``--subjects a,b,c``): the
alone-before / alone-after blocks run for EVERY named subject, so one
session adjudicates all of a round's above-band warm deltas (r11
flagged q20/q01/q08) under the same interleaved protocol. The default
subject set stays q08+q22 so the r8/r9 artifacts remain comparable.

Interpretation guide (written before the data, so the call is not
post-hoc): q08-alone ≈ q08-after-headline ≈ r7's 0.786 s at BOTH
heaps → r8's 1.122 s was host noise. q08-after-headline elevated vs
q08-alone at 8 g but not 13 g → session pressure from the widened
10-query headline (q22 joined in r8), and the bench session needs the
probe-style derived heap. Elevated everywhere → a real regression in
a byte-frozen body, i.e. environment/dependency drift to bisect.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SUBJECTS = ("q08_join_shuffle_agg", "q22_embedding_neardup")


def run_protocol(out_file: str | None, subjects: tuple[str, ...] = SUBJECTS) -> dict:
    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_alone = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "5"))
    n_headline = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    spark = get_spark(app_name="bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = {n: s for n, s in sorted(all_specs().items()) if s.bench}

    spark.range(1000).selectExpr("sum(id)").collect()
    warm = (
        spark.read.parquet(f"{sf_dir}/region.parquet")
        .groupBy("r_name")
        .count()
    )
    warm.write.format("noop").mode("overwrite").save()

    def calibrate() -> dict[str, float]:
        cpu, shuf = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(2_000_000_000).selectExpr("sum(id * 2 + 1)").collect()
            cpu.append(time.perf_counter() - t0)
            t1 = time.perf_counter()
            (
                spark.range(60_000_000)
                .selectExpr("id % 1024 AS k", "id AS v")
                .groupBy("k")
                .agg({"v": "sum"})
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            shuf.append(time.perf_counter() - t1)
        return {
            "cpu_probe_s": round(min(cpu), 4),
            "shuffle_probe_s": round(min(shuf), 4),
        }

    def run_once(spec) -> float:
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def alone_block(subject: str) -> dict:
        spec = specs[subject]
        runs = [round(run_once(spec), 4) for _ in range(n_alone + 1)]
        spark.catalog.clearCache()
        warm_runs = runs[1:]  # discard the block's cold first run
        return {
            "cold_s": runs[0],
            "warm_runs_s": warm_runs,
            "warm_median_s": round(statistics.median(warm_runs), 4),
            "warm_min_s": round(min(warm_runs), 4),
        }

    missing = [s for s in subjects if s not in specs]
    if missing:
        raise SystemExit(f"--subjects: not bench-tagged specs: {missing}")
    result: dict = {
        "driver_memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "sf_dir": sf_dir,
        "subjects": list(subjects),
        "n_alone_warm_runs": n_alone,
        "n_headline_runs": n_headline,
        "calibration_start": calibrate(),
        "alone_before": {s: alone_block(s) for s in subjects},
    }
    # legacy key so the r8/r9 Q08AB artifacts stay diffable
    if "q08_join_shuffle_agg" in subjects:
        result["q08_alone_before"] = result["alone_before"][
            "q08_join_shuffle_agg"
        ]

    headline: dict[str, dict] = {}
    for name, spec in specs.items():
        runs = [round(run_once(spec), 4) for _ in range(n_headline)]
        headline[name] = {
            "cold_s": runs[0],
            "warm_median_s": round(statistics.median(runs[1:]), 4)
            if len(runs) > 1
            else None,
            "runs_s": runs,
        }
        spark.catalog.clearCache()
    result["headline_pass"] = headline
    result["alone_after"] = {s: alone_block(s) for s in subjects}
    if "q08_join_shuffle_agg" in subjects:
        result["q08_alone_after"] = result["alone_after"][
            "q08_join_shuffle_agg"
        ]
    result["calibration_end"] = calibrate()
    # the r8 inversion subject, extracted for the note
    q22 = headline.get("q22_embedding_neardup", {})
    result["q22_inversion"] = {
        "cold_s": q22.get("cold_s"),
        "warm_median_s": q22.get("warm_median_s"),
        "inverted": bool(
            q22.get("warm_median_s")
            and q22.get("cold_s")
            and q22["warm_median_s"] > q22["cold_s"]
        ),
    }
    spark.stop()
    if out_file:
        with open(out_file, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    return result


def main() -> None:
    args = sys.argv[1:]
    subjects = SUBJECTS
    if "--subjects" in args:
        i = args.index("--subjects")
        subjects = tuple(args[i + 1].split(","))
        args = args[:i] + args[i + 2 :]
    if "--child" in args:
        i = args.index("--out") if "--out" in args else None
        run_protocol(args[i + 1] if i is not None else None, subjects)
        return
    # parent: re-exec with the requested heap so get_spark launches the
    # JVM under it (driver memory is launch-time-only in local mode)
    mem = "8g"
    if "--mem" in args:
        i = args.index("--mem")
        mem = args[i + 1]
        args = args[:i] + args[i + 2 :]
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    sys.exit(
        subprocess.call(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                "--subjects",
                ",".join(subjects),
                *args,
            ],
            env=env,
        )
    )


if __name__ == "__main__":
    main()
