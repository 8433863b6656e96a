"""Bucketed co-located joins — the pre-shuffle strategy BASELINE.md's
scale notes call for on repeated fact-fact joins (orders ⋈ lineitem).

Writing both sides bucketed by the join key into the warehouse lets
every subsequent join run WITHOUT a shuffle exchange: each task reads
matching buckets from both tables. At 100 TB this converts the
recurring multi-TB shuffle into a one-time layout cost.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from spark_sql_pubsub_connector_spark.plans.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Bucketed copies of orders/lineitem (8 buckets on the join key)."""
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"b_{name}")
        )
    yield spark
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def _plan(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    # force the shuffle-based strategy (at test scale orders would
    # auto-broadcast, which hides the property under test: at 100 TB
    # neither fact side broadcasts)
    joined = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = _plan(joined)
    # the join itself must not exchange either side — bucket layout
    # satisfies the distribution requirement; only the final 5-group
    # aggregate shuffles
    join_section = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in join_section, plan


def test_bucketed_join_matches_unbucketed(warehouse, sf_dir):
    spark = warehouse
    bucketed = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
