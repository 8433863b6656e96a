"""Staged scale fix for q22: IVF-blocked embedding near-dup pairs.

NOT in the frozen registry (round-5 freeze, VERDICT r4 #1) — this is
the post-freeze replacement staged the same way ``lsh_count_cap``
stages the q17 cap swap, with its equivalence/scale proofs in
``tests/test_neardup_scalable.py``.

Why: the round-5 measured scale probe (``tools/scale_probe.py --all``)
caught the registered q22 growing **100× in wall time for 25× data** —
the one superlinear operator in the corpus. Its blocking key is a
4-bit sign-LSH bucket (``bucket_exprs(NEARDUP_BITS=4)``), a FIXED
16-bucket space: candidate volume is Σ|bucket|² with |bucket| ∝ n/16,
i.e. Θ(n²/16). A fixed bucket count is all-pairs with a constant
divisor, not a scalable blocking scheme.

The scalable shape (what SemDeDup-style embedding dedup runs at
corpus scale) blocks by **IVF cell with the cell count scaling in n**:
k = min(⌈n / TARGET_CELL⌉, k_max) deterministic centroids, every
vector assigned to its nearest centroid (broadcast join + argmax
cosine — the dynamic-k generalization of q49's literal-expression
assign), pairs formed only within a cell. Expected cell size is the
constant ``TARGET_CELL``, so candidate volume is Θ(n · TARGET_CELL):
linear.

Cost honesty: the assign stage is a dense n×k dot-product sweep, so
an UNCAPPED k ∝ n would make assignment itself Θ(n²/TARGET_CELL) —
quadratic with a better constant, not linear. ``k_max`` caps it:
below n = k_max·TARGET_CELL vectors everything is linear; beyond,
cells grow past the knob and the operator stays n·k_max-linear in
assignment while pair volume grows with cell size. Production IVF
carries the same knob (a capped codebook, with the n×k sweep as the
BLAS/GPU-shaped stage); size k_max to the cluster — k_max·TARGET_CELL
of 4096·256 ≈ 1M vectors per (executor-count-scaled) shard here,
10⁶-cell codebooks at warehouse scale.
Like every LSH/IVF blocking (including the registered q22's), recall
is defined by the blocking: a pair is emitted iff the two vectors
land in the same cell AND cosine ≥ the threshold. The tests pin
precision = 1.0 (every emitted pair is a true brute-force pair) and
measure recall against brute force on the fixtures.

Centroids are deterministic — the vectors whose rank (dense row
number by vec_id) is a multiple of the sampling stride — so reruns
and both engines of any future oracle agree without RNG state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.vecops import cosine_q_expr, dot_q_expr
from .similarity import NEARDUP_SIM_Q, _SQL_NORM  # noqa: F401  (cited contract)
from .tables import load_table

TARGET_CELL = 256  # expected vectors per IVF cell — the linearity knob


def embedding_neardup_ivf(
    spark: SparkSession,
    sf_dir: str,
    target_cell: int = TARGET_CELL,
    sim_threshold: int = NEARDUP_SIM_Q,
    nprobe: int = 2,
    k_max: int = 4096,
) -> DataFrame:
    """Near-duplicate pairs (cosine ≥ threshold on the 1e9 grid)
    blocked by IVF cell, k scaling with the corpus; each vector probes
    its ``nprobe`` nearest cells (multi-probe — the standard recall
    lever; candidate volume scales by nprobe², still linear in n)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("nrm", F.expr(dot_q_expr("embedding", "embedding")))
        .select("vec_id", "embedding", "nrm")
    )
    n = e.count()  # one scalar job; at 100 TB this is table metadata
    k = min(max(1, -(-n // target_cell)), k_max)  # capped codebook size
    stride = max(2, n // k)

    # deterministic centroid sample, fully map-side: vectors whose id
    # hash lands on the stride grid. Expected k = n/stride, so the
    # expected cell size is the constant ``target_cell`` knob — no
    # global sort, no single-task window (the anti-pattern this module
    # exists to remove). At real scale the centroid set would come
    # from a stored index build (q49/q66); the probe stays
    # self-contained and deterministic.
    cents = e.filter(
        F.pmod(F.xxhash64(F.col("vec_id")), F.lit(stride)) == 0
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent"),
        F.col("nrm").alias("cent_nrm"),
    )

    # assign: broadcast the k centroids, argmax of cosine against the
    # centroid (the vector's own norm is constant per vec_id, so
    # ordering by dot/sqrt(cent_nrm) is the cosine argmax; cent_id
    # breaks ties deterministically). Zero-norm vectors/centroids sort
    # by the tie-break — still a valid deterministic cell.
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("dot_c", F.expr(dot_q_expr("embedding", "cent")))
        .withColumn(
            "cos_c",
            F.when(
                F.col("cent_nrm") > 0,
                F.col("dot_c") / F.sqrt(F.col("cent_nrm").cast("double")),
            ),
        )
        .withColumn(
            "pick",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.col("cos_c").desc_nulls_last(), F.col("cent_id")
                )
            ),
        )
        .filter(F.col("pick") <= nprobe)
        .select("vec_id", "embedding", "nrm", F.col("cent_id").alias("cell"))
    )

    a = assigned.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
        "cell",
    )
    b = assigned.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
        F.col("cell").alias("cell_b"),
    )
    return (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("dot", F.expr(dot_q_expr("ea", "eb")))
        .select(
            "vec_a",
            "vec_b",
            F.expr(cosine_q_expr("dot", "na", "nb")).alias("sim_q9"),
        )
        .filter(F.col("sim_q9") >= sim_threshold)
        .distinct()  # multi-probe can surface a pair in >1 shared cell
    )


def brute_force_neardup(
    spark: SparkSession, sf_dir: str, sim_threshold: int = NEARDUP_SIM_Q
) -> DataFrame:
    """Unblocked ground truth for the recall measurement (test-scale
    only — this is the all-pairs shape the blocked forms exist to
    avoid)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("nrm", F.expr(dot_q_expr("embedding", "embedding")))
        .select("vec_id", "embedding", "nrm")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", F.expr(dot_q_expr("ea", "eb")))
        .select(
            "vec_a",
            "vec_b",
            F.expr(cosine_q_expr("dot", "na", "nb")).alias("sim_q9"),
        )
        .filter(F.col("sim_q9") >= sim_threshold)
    )
