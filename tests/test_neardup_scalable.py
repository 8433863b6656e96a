"""Proofs for the staged q22 scale fix (``plans/neardup_scalable.py``).

The registered q22 is frozen (VERDICT r4 #1); the IVF-blocked twin is
its staged post-freeze replacement after the measured scale probe
caught q22's fixed 16-bucket blocking growing 100× in wall time for
25× data. These tests pin the twin's contract:

  1. precision 1.0 — every emitted pair is a true brute-force pair
     (same cosine values on the exact 1e9 grid);
  2. recall measured against brute force on the fixture and floored;
  3. linearity mechanism — the cell count scales with n, expected
     cell size is the constant ``TARGET_CELL`` knob;
  4. determinism — two runs emit identical pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_sql_pubsub_connector_spark.plans.neardup_scalable import (
    brute_force_neardup,
    embedding_neardup_ivf,
)


def _pairs(df) -> set[tuple]:
    return {(r["vec_a"], r["vec_b"], r["sim_q9"]) for r in df.collect()}


def test_precision_is_one_and_recall_floored(spark, sf_dir):
    truth = _pairs(brute_force_neardup(spark, sf_dir))
    # small fixture → small target_cell so blocking actually engages
    got = _pairs(embedding_neardup_ivf(spark, sf_dir, target_cell=64))
    assert truth, "fixture must contain near-dup pairs for this test"
    assert got <= truth  # precision 1.0: blocking never invents a pair
    recall = len(got) / len(truth)
    # blocking recall < 1 by design (the registered q22's 16-bucket
    # blocking measures 0.11 on this fixture; the twin at the default
    # nprobe=2 measures 0.85 with the hash-sampled centroids). The
    # floor pins against silent collapse.
    assert recall >= 0.60, f"recall {recall:.2f} below floor ({len(got)}/{len(truth)})"


def test_cells_scale_with_corpus_and_stay_bounded(spark, sf_dir):
    import pyspark.sql.functions as F

    from spark_sql_pubsub_connector_spark.plans.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    target = 64
    stride = max(2, n // max(1, -(-n // target)))
    k = e.filter(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0).count()
    # the map-side hash sample (no global sort — the anti-pattern the
    # twin exists to remove) lands within 2x of the expected n/stride,
    # so expected cell size tracks the knob as the corpus grows
    assert n / (2 * stride) <= k <= 2 * n / stride, (n, stride, k)
    assert k >= 2, "fixture too small for the blocking to engage"


def test_twin_is_deterministic(spark, sf_dir):
    a = _pairs(embedding_neardup_ivf(spark, sf_dir, target_cell=64))
    b = _pairs(embedding_neardup_ivf(spark, sf_dir, target_cell=64))
    assert a == b and len(a) > 0


def test_twin_handles_degenerate_embeddings(spark, tmp_path):
    """Zero-norm and truncated vectors must not crash the twin (the
    round-5 helper guards apply to it too)."""
    base = "/root/testdata/sf0.001"
    out = str(tmp_path / "emb")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{base}/{t}.parquet")
        if t == "embeddings":
            df = df.withColumn(
                "embedding",
                F.when(F.col("vec_id") % 7 == 0, F.array().cast("array<float>"))
                .when(F.col("vec_id") % 7 == 1, F.slice("embedding", 1, 3))
                .otherwise(F.col("embedding")),
            )
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    assert embedding_neardup_ivf(spark, out, target_cell=64).count() >= 0
