"""Staged (NOT registered) count-capped variant of q17's LSH pairing.

The r4 verdict (nit #3) asks for q17's hot-bucket discipline to move
from the row_number form — which makes a pathological million-member
(band, h) bucket a single-task external sort — to the count-based
routing already applied to q109. q17 sits in the driver's LIVE
correctness sample, so its registered body is byte-frozen until the
sampler rotates (r4 verdict #1); this module stages the replacement
WITHOUT touching `dedup.py`, and
`tests/test_lsh_count_cap_twin.py` proves it output-identical to the
registered q17 at oracle-checked scale plus correctly routing on the
pathological fixture. When the freeze lifts, the swap is: move this
body into `q17_dedup_minhash_lsh`, update the q17 rows in
`test_plans.py` / `test_bucket_caps.py` to the q109-style assertions,
and delete this module + its twin test.

Semantics delta vs the registered q17 (same as q109's r5 form): an
oversize bucket contributes NO pairs instead of C(cap, 2) — it is
exact-dup residue by contract (q16/q88 run upstream), so routing it
out whole is the honest answer AND removes the per-bucket sort. At
every oracle-checked scale no bucket exceeds the cap, so the two
forms are byte-identical there.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .dedup import _LSH_BUCKET_CAP, _minhash_bands


def lsh_pairs_count_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17's band-bucket pairing with the count-based hot-bucket cap:
    bucket sizes partial-aggregate map-side, the oversize key set
    (tiny by contract) broadcasts into a left join, oversize buckets
    route out whole, and the surviving buckets expand to pairs exactly
    as the registered q17 does. Overflow is reported via the
    ``q17_bucket_cap`` observed metric (same name, so monitoring is
    unchanged by the eventual swap)."""
    bands = _minhash_bands(spark, sf_dir)
    hot = (
        bands.groupBy("band", "h")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > _LSH_BUCKET_CAP)
    )
    capped = (
        bands.join(F.broadcast(hot), ["band", "h"], "left")
        .observe(
            "q17_bucket_cap",
            F.sum(F.col("bucket_n").isNotNull().cast("long")).alias(
                "dropped_members"
            ),
        )
        .filter(F.col("bucket_n").isNull())
        .drop("bucket_n")
    )
    buckets = (
        capped.groupBy("band", "h")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pair_expr = (
        "filter(flatten(transform(ds, a -> transform(ds, b -> struct(a AS doc_a, b AS doc_b)))), "
        "p -> p.doc_a < p.doc_b)"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )
