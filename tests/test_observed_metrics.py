"""observed_metrics() conversion contract (ADVICE r4): values convert
by the metric column's DECLARED dataType, never by parse-guessing —
a string-typed metric that happens to look numeric must stay a
string."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_sql_pubsub_connector_spark.plans.registry import observed_metrics


def test_numeric_looking_string_metric_stays_string(spark):
    df = spark.createDataFrame(
        [("123", 1.5, 7)], "s string, d double, i long"
    ).observe(
        "m",
        F.min("s").alias("min_s"),
        F.sum("d").alias("sum_d"),
        F.sum("i").alias("sum_i"),
        F.count(F.when(F.col("i") < 0, 1)).alias("none_like"),
    )
    df.collect()
    m = observed_metrics(df)["m"]
    assert m["min_s"] == "123" and isinstance(m["min_s"], str)
    assert m["sum_d"] == 1.5 and isinstance(m["sum_d"], float)
    assert m["sum_i"] == 7 and isinstance(m["sum_i"], int)
    assert m["none_like"] == 0 and isinstance(m["none_like"], int)
