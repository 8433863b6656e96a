"""The staged count-capped q17 twin (`plans/lsh_count_cap.py`) must be
output-identical to the frozen registered q17 wherever the cap has
headroom, and must route oversize buckets out whole on the
pathological fixture — proving the post-freeze swap is safe before it
happens."""

from __future__ import annotations

from spark_sql_pubsub_connector_spark.plans import all_specs
from spark_sql_pubsub_connector_spark.plans.lsh_count_cap import (
    lsh_pairs_count_capped,
)
from spark_sql_pubsub_connector_spark.plans.registry import observed_metrics

from .test_bucket_caps import N_DUPES, hot_sf_dir  # noqa: F401  (fixture)


def test_twin_matches_registered_q17_at_oracle_scale(spark, sf_dir):
    reg = sorted(
        tuple(r)
        for r in all_specs()["q17_dedup_minhash_lsh"].build(spark, sf_dir).collect()
    )
    twin = sorted(tuple(r) for r in lsh_pairs_count_capped(spark, sf_dir).collect())
    assert reg == twin and len(twin) > 0


def test_twin_routes_out_oversize_buckets(spark, hot_sf_dir):  # noqa: F811
    pairs = lsh_pairs_count_capped(spark, hot_sf_dir)
    fam = pairs.filter("doc_a < 1000 AND doc_b < 1000").count()
    assert fam == 0  # the 100-dup family is routed out whole
    assert pairs.filter("doc_a = 1000 AND doc_b = 1001").count() == 1
    pairs.collect()
    drops = observed_metrics(pairs)["q17_bucket_cap"]["dropped_members"]
    assert drops == 4 * N_DUPES  # all 100 members x 4 oversize band buckets


def test_twin_plan_has_no_bucket_sort(spark, sf_dir):
    import contextlib
    import io

    df = lsh_pairs_count_capped(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "row_number" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CollectMetrics" in plan and "q17_bucket_cap" in plan
