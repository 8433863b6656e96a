"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong``
we read it as a raw ns bigint (kept as ``ts_ns``) and derive the
µs-truncated timestamp ``ts`` — exactly what DuckDB produces when it
coerces ns → µs, so oracle comparisons line up.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # integer DIV keeps full precision (a double division of an
        # ~1.7e18 ns value would round in the last µs digit)
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts_ns DIV 1000 AS LONG))")
        )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
