"""Interleaved same-session A/B for the r15 q08/q49 widens and the q78
window rewrite.

The interrupted r15 session measured all three on a host whose
baseline bench leg was later shown contaminated (calibration drift
1.296 with two pytest suites running concurrently), so each change is
re-adjudicated here under the clean interleaved protocol: variants
alternate round-robin within ONE session so host drift hits both arms
equally, calibration probes bracket the run.

Variants:
  q08/q49: cur (widen=True, HEAD) vs none (widen_scan monkeypatched to
           identity — byte-faithful pre-r15 plan)
  q78:     cur (window c_head, HEAD) vs join (pre-r15
           aggregate-then-self-join, reconstructed from the removal
           diff)

Per leg: 1 first run + N repeat runs to the noop sink (bench.py's
run_once shape, rebuild each run), clearCache after the leg.

Usage: python tools/r15_ab.py [--rounds 4] [--warm 2] [--out F]
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


def q78_join_variant(spark, sf_dir):
    """Pre-r15 q78: c_head via aggregate + self-join (the shape the
    window rewrite replaced)."""
    from pyspark.sql import functions as F

    from spark_sql_pubsub_connector_spark.functions.textops import tokens
    from spark_sql_pubsub_connector_spark.plans.tables import load_table
    from spark_sql_pubsub_connector_spark.plans.text import _NLL_CAP

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("w")).filter(F.size("w") >= 2)
    bi = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2), "
                "i -> struct(w[i] AS head, w[i + 1] AS tail))"
            )
        ).alias("b"),
    ).select("doc_id", "b.head", "b.tail")
    bi = bi.persist()
    pc = bi.groupBy("head", "tail").agg(
        F.count(F.lit(1)).cast("long").alias("c_pair")
    )
    hc = pc.groupBy("head").agg(F.sum("c_pair").cast("long").alias("c_head"))
    lm = pc.join(hc, "head").select(
        "head",
        "tail",
        F.expr("greatest((c_pair * 1000000) DIV c_head, 1L)").alias("p_q6"),
    )
    scored = bi.join(lm, ["head", "tail"]).select(
        "doc_id",
        (F.lit(_NLL_CAP) - (F.length(F.bin("p_q6")) - F.lit(1))).alias("nll"),
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll").cast("long").alias("sum_nll"),
        F.expr("(sum(nll) * 1000) DIV count(*)").cast("long").alias("avg_nll_q3"),
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

    import spark_sql_pubsub_connector_spark.plans.tables as T
    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="r15_ab")
    specs = all_specs()
    warmup(spark, args.sf_dir)
    # q78 has no Python stage, but warm the pool anyway so the protocol
    # stays valid if a subject gains one
    cal_start = calib3(spark)

    def build(subject: str, variant: str):
        if subject == "q78":
            if variant == "cur":
                return specs["q78_lm_doc_score"].build(spark, args.sf_dir)
            return q78_join_variant(spark, args.sf_dir)
        name = {
            "q08": "q08_join_shuffle_agg",
            "q49": "q49_ivf_assign",
        }[subject]
        if variant == "cur":
            return specs[name].build(spark, args.sf_dir)
        orig = T.widen_scan
        T.widen_scan = lambda df, tname, sf_dir="": df
        try:
            return specs[name].build(spark, args.sf_dir)
        finally:
            T.widen_scan = orig

    def leg(subject: str, variant: str) -> dict:
        spark.sparkContext.setJobDescription(f"r15ab:{subject}:{variant}")
        runs = []
        for i in range(1 + args.warm):
            df = build(subject, variant)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        return {"first": runs[0], "warms": runs[1:]}

    pairs = [
        ("q08", "cur"), ("q08", "none"),
        ("q49", "cur"), ("q49", "none"),
        ("q78", "cur"), ("q78", "join"),
    ]
    legs: dict[str, list] = {f"{s}:{v}": [] for s, v in pairs}
    for r in range(args.rounds):
        for s, v in pairs:
            legs[f"{s}:{v}"].append(leg(s, v))
    cal_end = calib3(spark)

    def summary(key: str) -> dict:
        firsts = [leg["first"] for leg in legs[key]]
        warms = [w for leg in legs[key] for w in leg["warms"]]
        return {
            "first_median": round(statistics.median(firsts), 4),
            "warm_median": round(statistics.median(warms), 4),
            "warm_min": round(min(warms), 4),
            "warm_spread_pct": round(
                100.0 * (max(warms) - min(warms)) / min(warms), 1
            ),
        }

    out = {
        "tool": "r15_ab",
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
