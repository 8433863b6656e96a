"""Behavioral proof that the q17/q109 defensive bucket caps engage:
point the real operators at a synthetic ``documents`` table containing
a pathological exact-duplicate family (100 identical docs — the
license-header / mirrored-page case exact dedup would normally remove
upstream) and check the oversize bucket is routed out WHOLE
(count-based pre-filter — both operators use the q109-style routing
since the r6 q17 swap), while docs in ordinary below-cap buckets are
untouched.

The plan guards in test_plans.py pin that the cap expression exists;
this pins what it does."""

from __future__ import annotations

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs
from spark_sql_pubsub_connector_spark.plans.dedup import _LSH_BUCKET_CAP

SPECS = all_specs()

N_DUPES = 100  # > _LSH_BUCKET_CAP (64)


@pytest.fixture(scope="module")
def hot_sf_dir(spark, tmp_path_factory):
    """A documents.parquet whose rows are one 100-copy duplicate family
    plus two distinct docs that pair only with each other."""
    d = str(tmp_path_factory.mktemp("hotdocs"))
    # 32 DISTINCT tokens: two distinct 16-token chunks, so identical
    # docs verify as full containment (a repeated phrase would collapse
    # under array_intersect's set semantics and read as partial overlap)
    dupe_text = " ".join(f"tok{i}" for i in range(32))
    pair_a = "one two three four five six seven eight nine ten " * 3
    pair_b = pair_a + "eleven"
    rows = [(i, dupe_text) for i in range(N_DUPES)]
    rows += [(1000, pair_a), (1001, pair_b)]
    (
        spark.createDataFrame(rows, "doc_id long, text string")
        .selectExpr(
            "doc_id",
            "text",
            "'en' AS lang",
            "'synthetic' AS source",
            "CAST(length(text) AS LONG) AS n_chars",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{d}/documents.parquet")
    )
    return d


def test_q17_cap_routes_out_pathological_bucket_whole(spark, hot_sf_dir):
    """r6 swap (r4 verdict #3): q17's cap is count-based routing — an
    oversize (band, h) bucket (exact-dup residue by contract) is
    removed WHOLE before the collect_list, so the pathological family
    contributes zero pairs instead of C(cap, 2) — and, crucially,
    never becomes a single-task per-bucket sort."""
    assert N_DUPES > _LSH_BUCKET_CAP
    pairs = SPECS["q17_dedup_minhash_lsh"].build(spark, hot_sf_dir)
    fam = pairs.filter("doc_a < 1000 AND doc_b < 1000").count()
    # identical docs agree on every band; uncapped this would be
    # C(100,2)=4950 pairs — count-based routing removes the bucket whole
    assert fam == 0, fam


def test_q17_cap_spares_below_cap_buckets(spark, hot_sf_dir):
    pairs = SPECS["q17_dedup_minhash_lsh"].build(spark, hot_sf_dir)
    # the distinct near-dup pair lives in its own tiny bucket and must
    # survive capping untouched
    assert pairs.filter("doc_a = 1000 AND doc_b = 1001").count() == 1


def test_q109_cap_routes_out_oversize_fp0_bucket(spark, hot_sf_dir):
    """r4 verdict #3: q109's cap is count-based routing — an oversize
    fp0 bucket (exact-dup residue by contract) is removed WHOLE before
    the self-join, so the pathological family contributes zero pairs
    instead of C(cap, 2); below-cap buckets are untouched."""
    out = SPECS["q109_containment_dedup"].build(spark, hot_sf_dir)
    fam = out.filter("doc_a < 1000 AND doc_b < 1000")
    assert fam.count() == 0
    # the below-cap shared-prefix pair still verifies containment
    assert out.filter("doc_a = 1000 AND doc_b = 1001").count() == 1


def test_cap_overflow_is_reported_not_silent(spark, hot_sf_dir):
    """The observe() counters must carry the exact number of dropped
    bucket members: ALL 100 members of each of the 4 oversize band
    buckets for q17 (count-based routing removes the bucket whole);
    ALL 100 members of the oversize fp0 bucket for q109 (same routing,
    counted on both self-join branches)."""
    from spark_sql_pubsub_connector_spark.plans.registry import observed_metrics

    q17 = SPECS["q17_dedup_minhash_lsh"].build(spark, hot_sf_dir)
    q17.collect()
    assert observed_metrics(q17)["q17_bucket_cap"]["routed_members"] == 4 * N_DUPES

    q109 = SPECS["q109_containment_dedup"].build(spark, hot_sf_dir)
    q109.collect()
    drops = observed_metrics(q109)["q109_bucket_cap"]["routed_members"]
    # the capped subtree appears under both join branches; Spark may
    # dedup the metric or report one branch — either way the per-branch
    # drop count is exact
    assert drops in (N_DUPES, 2 * N_DUPES)


def test_cap_headroom_at_oracle_scale(spark, sf_dir):
    """The registered oracles are the UNCAPPED self-joins, so the cap
    must never bite at any oracle-checked scale — this canary fails
    loudly (drops > 0) before the hash comparison could fail
    cryptically. If it ever trips, raise _LSH_BUCKET_CAP above the new
    max bucket or fix the fixture's duplication."""
    from spark_sql_pubsub_connector_spark.plans.registry import observed_metrics

    for name, metric in (
        ("q17_dedup_minhash_lsh", "q17_bucket_cap"),
        ("q109_containment_dedup", "q109_bucket_cap"),
    ):
        df = SPECS[name].build(spark, sf_dir)
        df.collect()
        assert observed_metrics(df)[metric]["routed_members"] == 0, name
