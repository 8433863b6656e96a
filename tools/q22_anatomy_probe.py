"""q22 scale-cost anatomy: time the ASSIGNMENT stage separately from
the full query at a chosen replica scale, and decompose the wall into
the linear assignment and the within-cell pair stage.

Why this exists (r10): `SCALE1000_r10_q22.json` measured the full
vectorized q22 at 547 s warm for 1000× — far below the flat form's
predicted ≈6,500 s, but 27.6× over the 100× point for 10× the data.
This tool verified the mechanism: the assignment was strictly linear
and the growth came from the then-frozen k ≤ 4096 codebook cap, which
made expected cell size grow as n/k_max once n > k_max·target_cell ≈
1.05 M vectors — within-cell pair volume n²·nprobe²/(2k_max),
quadratic past the cap by definition (81% of the 547 s wall,
`SCALE1000_r10_q22_anatomy.json`).

r11 (VERDICT r10 #1): the cap is GONE — k = ⌈n/256⌉ at every n, both
engines — so expected cell size is the constant knob and pair volume
is n·target_cell·nprobe²/2, linear. This probe now verifies THAT:
`avg_cell` should stay ≈ target_cell·nprobe regardless of R, and
`pair_dots` should grow linearly with R.

Usage:
    python tools/q22_anatomy_probe.py [R] [--out FILE]

Replicates ONLY the embeddings table (q22 reads nothing else) with the
scale probe's exact shift+perturb recipe, then times (min-of-2 warm,
noop sink): (a) `_nd_assigned` — the mapInPandas assignment alone;
(b) the registered full query; and counts the realized pair-dot volume
Σ_cell B·(B−1)/2 for the model check.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_probe import COL_STRIDE, SHIFT, probe_driver_memory  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    r_total = int(args[0]) if args else 1000
    out_file = None
    if "--out" in sys.argv:
        out_file = sys.argv[sys.argv.index("--out") + 1]

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", probe_driver_memory(r_total))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_parts = max(32, min(4096, (cpus * r_total) // 12))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spark_sql_pubsub_connector_spark.plans.similarity import (
        _nd_assigned,
        embedding_neardup_ivf,
    )
    from spark_sql_pubsub_connector_spark.plans.tables import load_table

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = tempfile.mkdtemp(prefix=f"q22anat-x{r_total}-")
    try:
        # embeddings-only replica — byte-identical recipe to
        # scale_probe.build_corpus for this one table
        cols, stride = SHIFT["embeddings"]
        df = load_table(spark, base, "embeddings")
        reps = []
        for r in range(r_total):
            rep = df
            for c in cols:
                rep = rep.withColumn(
                    c, F.col(c) + F.lit(r * COL_STRIDE.get(c, stride))
                )
            if r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, i) -> "
                        f"CAST(x + (({r} * (i + 1)) % 7) * 0.001 AS FLOAT))"
                    ),
                )
            reps.append(rep)
        u = reps[0]
        for rep in reps[1:]:
            u = u.unionByName(rep)
        u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

        def timed(build):
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            return min(runs)

        assign_s = timed(lambda: _nd_assigned(spark, out))
        full_s = timed(lambda: embedding_neardup_ivf(spark, out))

        cells = (
            _nd_assigned(spark, out)
            .groupBy("cell")
            .count()
            .agg(
                F.sum(F.expr("count * (count - 1) / 2")).alias("pair_dots"),
                F.count(F.lit(1)).alias("n_cells"),
                F.max("count").alias("max_cell"),
                F.avg("count").alias("avg_cell"),
            )
            .first()
        )
        result = {
            "scale": r_total,
            "base_dir": base,
            "discipline": {"n_runs": 2, "timing": "min-of-2-warm"},
            "session": {
                "driver_memory": os.environ["SPARK_GRAFT_DRIVER_MEM"],
                "cpus": cpus,
                "shuffle_partitions": shuffle_parts,
            },
            "assignment_warm_s": round(assign_s, 3),
            "full_warm_s": round(full_s, 3),
            "pair_stage_share": round(1 - assign_s / full_s, 3),
            # coalesce: SUM/MAX/AVG over zero assignment rows are NULL
            # (ADVICE r10) — report a zero-pair anatomy, don't crash
            "pair_dots": int(cells["pair_dots"] or 0),
            "n_cells": int(cells["n_cells"] or 0),
            "max_cell": int(cells["max_cell"] or 0),
            "avg_cell": round(float(cells["avg_cell"] or 0.0), 1),
        }
        print(json.dumps(result))
        if out_file:
            with open(out_file, "w") as f:
                json.dump(result, f, indent=1)
            print(json.dumps({"wrote": out_file}))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
