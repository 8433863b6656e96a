"""Capture `.explain("formatted")` for registered queries into
plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (default r16) — the judge-facing plan evidence
(optimization guide §1.3). Usage:

    python tools/capture_plans.py <suffix> [query ...]

With no query names, captures all registered batch queries. Builds
each query against $SPARK_GRAFT_SF_DIR (default sf0.1) in the same
get_spark session bench.py uses, so plan shapes match the bench.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from spark_sql_pubsub_connector_spark.plans import all_specs
    from spark_sql_pubsub_connector_spark.session import get_spark

    spark = get_spark(app_name=f"capture-plans-{suffix}", master=f"local[{cpus}]")
    specs = all_specs()
    if not names:
        names = sorted(specs)
    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    out_dir = os.path.join(REPO, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = specs[name].build(spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
