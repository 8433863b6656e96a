"""Interleaved same-session A/B for the r16 optimization subjects
(VERDICT r15 "Next round" #2/#3/#4/#5/#6).

Protocol: tools/r15_ab.py's clean interleaved discipline — variants
alternate round-robin within ONE session so host drift hits both arms
equally; calibration probes bracket the run; each leg is 1 first run +
N warm repeats to the noop sink with clearCache after the leg (the
bench's run_once shape, rebuild each run).

Subjects and variants (pass --subjects to pick a subset):
  q49: cur (widen at HEAD) | none (widen_scan → identity)
  q44: cur (parquet stage at HEAD) | lck (localCheckpoint) |
       persist (plain persist)
  q39: cur (HEAD) | old (pre-r16 percentile() aggregate)
  q17: cur (HEAD) | distinct (array_distinct before the per-shingle
       md5 in _minhash_sigs)
  q91: cur (HEAD) | <variants added as the round iterates>

Usage: python tools/r16_ab.py [--rounds 4] [--warm 2] [--out F]
       [--subjects q49,q44,...]
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


def q39_old_variant(spark, sf_dir):
    """Pre-r16 q39: the exact percentile() aggregate (3-reducer funnel)."""
    from pyspark.sql import functions as F

    from spark_sql_pubsub_connector_spark.plans.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return li.groupBy("l_returnflag").agg(
        (F.percentile(qty_c, F.lit(0.5)).cast("double") / 100).alias("median_qty"),
        (F.percentile(price_c, F.lit(0.9)).cast("double") / 100).alias("p90_price"),
        (F.min(qty_c).cast("double") / 100).alias("min_qty"),
        (F.max(price_c).cast("double") / 100).alias("max_price"),
    )


def q49_variant(spark, sf_dir, widen: bool, guarded: bool):
    """Reconstructed q49 bodies: the r15 shape (widen=True,
    guarded=False), the widen-kept/hoist-added hybrid, and the r14
    shape (widen=False, guarded=False)."""
    from pyspark.sql import functions as F

    import spark_sql_pubsub_connector_spark.plans.similarity as S
    from spark_sql_pubsub_connector_spark.functions.vecops import quant_arr_expr
    from spark_sql_pubsub_connector_spark.plans.tables import load_table

    e = load_table(spark, sf_dir, "embeddings", widen=widen).select(
        "vec_id", F.expr(quant_arr_expr("embedding")).alias("q")
    )
    ds = S._ivf_dists_arr_guarded() if guarded else S._ivf_dists_arr_expr()
    d = e.select("vec_id", F.expr(ds).alias("ds"))
    return d.select(
        "vec_id",
        F.expr("CAST(array_position(ds, array_min(ds)) - 1 AS BIGINT)").alias(
            "cell"
        ),
        F.expr("CAST(array_min(ds) AS BIGINT)").alias("dist_q"),
    )


def q44_stage_variant(spark, sf_dir, mode: str):
    """q44 with the kt stage swapped: parquet (HEAD) vs localCheckpoint
    vs persist — VERDICT r15 #4's prescribed three-way A/B."""
    import spark_sql_pubsub_connector_spark.plans.pipeline as P

    import os
    import tempfile

    def parquet_stage(spark, df, name):
        root = os.path.join(
            tempfile.gettempdir(),
            "pubsub_spark_stage_ab",
            spark.sparkContext.applicationId,
        )
        path = os.path.join(root, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    orig = P._materialize
    if mode == "lck":
        P._materialize = lambda spark, df, name: df.localCheckpoint(eager=True)
    elif mode == "persist":
        P._materialize = lambda spark, df, name: df.persist()
    elif mode == "parquet":
        P._materialize = parquet_stage
    try:
        # @query registers and returns the function unchanged
        return P.q44_decontaminate(spark, sf_dir)
    finally:
        P._materialize = orig


def build(spark, sf_dir, specs, subject: str, variant: str):
    name = {
        "q49": "q49_ivf_assign",
        "q44": "q44_decontaminate",
        "q39": "q39_percentiles",
        "q17": "q17_dedup_minhash_lsh",
        "q91": "q91_blocking_eval",
    }[subject]
    if variant == "cur":
        return specs[name].build(spark, sf_dir)
    if subject == "q49":
        widen, guarded = {
            "r15": (True, False),   # widen, unhoisted (r15 HEAD)
            "widenguard": (True, True),
            "r14": (False, False),  # plain (pre-widen r14 shape)
        }[variant]
        return q49_variant(spark, sf_dir, widen, guarded)
    if subject == "q44":
        return q44_stage_variant(spark, sf_dir, variant)
    if subject == "q39" and variant == "old":
        return q39_old_variant(spark, sf_dir)
    raise ValueError(f"unknown variant {subject}:{variant}")


# q39 was A/B'd (flat-histogram rewrite vs percentile()) in
# R16AB_q49_q44_q39.json and the rewrite REVERTED as measured-slower;
# HEAD q39 is the percentile() form again, so the subject is retired.
VARIANTS = {
    "q49": ("cur", "r15", "widenguard", "r14"),
    "q44": ("cur", "parquet", "persist"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--subjects", default="q49,q44")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="r16_ab")
    specs = all_specs()
    warmup(spark, args.sf_dir)
    cal_start = calib3(spark)

    def leg(subject: str, variant: str) -> dict:
        spark.sparkContext.setJobDescription(f"r16ab:{subject}:{variant}")
        runs = []
        for _ in range(1 + args.warm):
            # time build+write, bench.py's run_once shape — builders
            # that materialize eagerly (q44's stage, q54's loop) do
            # real work at build time and excluding it would compare
            # variants on different portions of the query
            t0 = time.perf_counter()
            df = build(spark, args.sf_dir, specs, subject, variant)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return {"first": runs[0], "warms": runs[1:]}

    subjects = args.subjects.split(",")
    pairs = [(s, v) for s in subjects for v in VARIANTS[s]]
    legs: dict[str, list] = {f"{s}:{v}": [] for s, v in pairs}
    for _ in range(args.rounds):
        for s, v in pairs:
            legs[f"{s}:{v}"].append(leg(s, v))
    cal_end = calib3(spark)

    def summary(key: str) -> dict:
        firsts = [lg["first"] for lg in legs[key]]
        warms = [w for lg in legs[key] for w in lg["warms"]]
        return {
            "first_median": round(statistics.median(firsts), 4),
            "warm_median": round(statistics.median(warms), 4),
            "warm_min": round(min(warms), 4),
            "warm_spread_pct": round(
                100.0 * (max(warms) - min(warms)) / min(warms), 1
            ),
        }

    out = {
        "tool": "r16_ab",
        "sf_dir": args.sf_dir,
        "rounds": args.rounds,
        "warm_per_leg": args.warm,
        "calibration_start": cal_start,
        "calibration_end": cal_end,
        "legs": legs,
        "summary": {k: summary(k) for k in legs},
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
