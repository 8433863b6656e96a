"""Interleaved same-session A/B for the r15 q17 changes (widen +
band-aligned persist, commit 4b77e69).

The round-15 clean baseline read q17 warm 1.13 s at drift 1.025 vs
0.87 s in the pre-change committed diag at drift 1.054 (+30 %, above
q17's 6.9 % within-run spread) — the classic one-round-of-movement
signal that earns the interleaved protocol, not an assumption (r12–r14
drift ladder). Three variants, built from the SAME session with the
production downstream copied verbatim from q17's body:

  cur    — widen + repartition("band","h") before persist (HEAD)
  widen  — widen only, plain persist (the 4b77e69 midpoint)
  none   — no widen, plain persist (pre-4b77e69, byte-faithful)

Per leg: build → cold noop write (materializes the persist) → N warm
noop writes → unpersist + clearCache. Legs interleave round-robin so
host drift hits all variants equally; calibration probes bracket the
protocol.

Usage: python tools/q17_align_ab.py [--rounds 4] [--warm 2] [--out F]
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


def q17_from_bands(bands, F):
    """q17's body downstream of the persisted bands frame, copied
    verbatim (minus the observe(), which does not change the plan
    shape and keeps the variants comparable)."""
    from spark_sql_pubsub_connector_spark.plans.dedup import _LSH_BUCKET_CAP

    hot = (
        bands.groupBy("band", "h")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > _LSH_BUCKET_CAP)
    )
    capped = (
        bands.join(F.broadcast(hot), ["band", "h"], "left")
        .filter(F.col("bucket_n").isNull())
        .drop("bucket_n")
    )
    buckets = (
        capped.groupBy("band", "h")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pair_expr = (
        "filter(flatten(transform(ds, a -> transform(ds, b -> "
        "struct(a AS doc_a, b AS doc_b)))), p -> p.doc_a < p.doc_b)"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import spark_sql_pubsub_connector_spark.plans.dedup as D
    import spark_sql_pubsub_connector_spark.plans.tables as T
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="q17_align_ab")
    warmup(spark, args.sf_dir)
    cal_start = calib3(spark)

    def build(variant: str):
        orig = T.widen_scan
        if variant == "none":
            T.widen_scan = lambda df, name, sf_dir="": df
        try:
            bands = D._minhash_bands(spark, args.sf_dir)
        finally:
            T.widen_scan = orig
        if variant == "cur":
            bands = bands.repartition("band", "h")
        bands = bands.persist()
        return bands, q17_from_bands(bands, F)

    def leg(variant: str) -> dict:
        spark.sparkContext.setJobDescription(f"q17ab:{variant}")
        bands, df = build(variant)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(args.warm):
            # rebuild like bench.py does: cache manager dedupes the
            # persist entry across builds, so this measures the warm
            # build+exec cycle the bench times
            _, dfw = build(variant)
            t0 = time.perf_counter()
            dfw.write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - t0)
        bands.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return {"cold": round(cold, 4), "warms": [round(w, 4) for w in warms]}

    variants = ["cur", "widen", "none"]
    legs: dict[str, list] = {v: [] for v in variants}
    for r in range(args.rounds):
        for v in variants:
            legs[v].append(leg(v))
    cal_end = calib3(spark)

    def summary(v: str) -> dict:
        colds = [leg["cold"] for leg in legs[v]]
        warms = [w for leg in legs[v] for w in leg["warms"]]
        return {
            "cold_median": round(statistics.median(colds), 4),
            "warm_median": round(statistics.median(warms), 4),
            "warm_min": round(min(warms), 4),
            "warm_spread_pct": round(
                100.0 * (max(warms) - min(warms)) / min(warms), 1
            ),
        }

    out = {
        "tool": "q17_align_ab",
        "sf_dir": args.sf_dir,
        "rounds": args.rounds,
        "warm_per_leg": args.warm,
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "legs": legs,
        "summary": {v: summary(v) for v in variants},
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
