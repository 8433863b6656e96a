"""Headline benchmark: runs the bench-tagged queries from the corpus at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed once for warm-up-free wall time measured around
a full plan execution (count-style action that forces every operator).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = {n: s for n, s in sorted(all_specs().items()) if s.bench}

    # JVM/codegen warm-up on a trivial plan so q1 isn't charged for it
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in specs.items():
        t0 = time.perf_counter()
        df = spec.build(spark, sf_dir)
        # write to a no-op sink: forces full evaluation of every row
        # without driver-side collect
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
