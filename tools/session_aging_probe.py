"""Fresh-vs-aged-JVM discriminator for the q08/q22 bench anomalies
(VERDICT r8 #1/#3, second experiment).

The first A/B (tools/bench_ab.py) left an identification problem: its
calibration probes run IN the session under test, so "host got slower"
and "session got slower" are indistinguishable from inside (the 8 g
leg's q08-after elevation tracked the in-session shuffle probe 1:1).
This probe breaks the circularity by comparing an AGED session's
reading against a FRESH JVM's reading taken seconds later on the same
host window:

  E1 (q08): JVM A — q08 warm block, then the aging load (q22 x3, the
     headline's heavy tail), then q08 warm block again (aged).
     JVM A stops; JVM B starts immediately — q08 warm block (fresh).
     aged >> fresh (same minutes, same host) → session aging is real.
     aged ≈ fresh → the first A/B's elevation was host drift.

  E2 (q22 trend): JVM C — q22 x N plain, recording the run sequence.
     JVM D — q22 x N with a forced JVM System.gc() + Python
     gc.collect() between runs. Monotone growth in C that flattens in
     D → inter-run garbage accumulation (heap entropy) is the
     inversion mechanism; growth surviving D → something else
     accumulates (shuffle files, broadcast blocks, UI status store).

Each JVM phase is a subprocess (heap fixed at launch); one heap size
per invocation:

    python tools/session_aging_probe.py --mem 8g --out AGING_8g.json
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _spark():
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="aging-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    return spark


def _run_once(spark, spec, sf_dir) -> float:
    t0 = time.perf_counter()
    spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 4)


def _warm_block(spark, spec, sf_dir, n=5) -> dict:
    runs = [_run_once(spark, spec, sf_dir) for _ in range(n + 1)]
    spark.catalog.clearCache()
    return {
        "cold_s": runs[0],
        "warm_runs_s": runs[1:],
        "warm_median_s": round(statistics.median(runs[1:]), 4),
        "warm_min_s": round(min(runs[1:]), 4),
    }


def phase(name: str) -> dict:
    from spark_sql_pubsub_connector_spark.plans import all_specs

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = all_specs()
    q08, q22 = specs["q08_join_shuffle_agg"], specs["q22_embedding_neardup"]
    spark = _spark()
    out: dict = {"phase": name, "t_wall": round(time.time(), 1)}
    if name == "aged":
        out["q08_before"] = _warm_block(spark, q08, sf_dir)
        out["aging_load_q22_runs_s"] = [
            _run_once(spark, q22, sf_dir) for _ in range(3)
        ]
        spark.catalog.clearCache()
        out["q08_aged"] = _warm_block(spark, q08, sf_dir)
    elif name == "fresh":
        out["q08_fresh"] = _warm_block(spark, q08, sf_dir)
    elif name == "q22_plain":
        out["q22_runs_s"] = [_run_once(spark, q22, sf_dir) for _ in range(6)]
    elif name == "q22_plain3":
        out["q22_runs_s"] = [_run_once(spark, q22, sf_dir) for _ in range(3)]
    elif name == "q22_prelude":
        # reproduce the bench session's state at the moment q22 runs:
        # the two calibration probes (x3) plus the headline queries
        # that precede q22 in sorted order, each with clearCache —
        # then q22 x3. If q22 is slower here than in an adjacent
        # plain JVM, the residue of that prelude is the inversion's
        # mechanism; if not, the bench-session readings were host
        # windows.
        for _ in range(3):
            spark.range(2_000_000_000).selectExpr("sum(id * 2 + 1)").collect()
            (
                spark.range(60_000_000)
                .selectExpr("id % 1024 AS k", "id AS v")
                .groupBy("k")
                .agg({"v": "sum"})
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        for qn in (
            "q01_pricing_summary",
            "q06_topk_per_group",
            "q08_join_shuffle_agg",
            "q14_window_tumbling",
            "q17_dedup_minhash_lsh",
            "q20_knn_bruteforce",
        ):
            for _ in range(3):
                _run_once(spark, specs[qn], sf_dir)
            spark.catalog.clearCache()
        out["q22_runs_s"] = [_run_once(spark, q22, sf_dir) for _ in range(3)]
    elif name == "q22_gc":
        runs = []
        for _ in range(6):
            runs.append(_run_once(spark, q22, sf_dir))
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(1)
        out["q22_runs_s"] = runs
    spark.stop()
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    args = sys.argv[1:]
    if "--phase" in args:
        phase(args[args.index("--phase") + 1])
        return
    mem = args[args.index("--mem") + 1] if "--mem" in args else "8g"
    out_file = args[args.index("--out") + 1] if "--out" in args else None
    phases = (
        args[args.index("--phases") + 1].split(",")
        if "--phases" in args
        else ["aged", "fresh", "q22_plain", "q22_gc"]
    )
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=mem)
    results: dict = {"driver_memory": mem, "phase_order": phases}
    for idx, ph in enumerate(phases):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", ph],
            env=env,
            capture_output=True,
            text=True,
        )
        # ADVICE r9: a crashed phase must surface its own stderr, not
        # die as an IndexError on the empty stdout parse below.
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not lines:
            sys.stderr.write(p.stderr)
            raise RuntimeError(
                f"phase {ph!r} failed (returncode={p.returncode}, "
                f"{len(lines)} JSON lines) — stderr above"
            )
        results[f"{idx}:{ph}"] = json.loads(lines[-1])
    if out_file:
        with open(out_file, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
