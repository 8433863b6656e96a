"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

``events.ts`` has shipped in two physical layouts across driver
rounds: TIMESTAMP(NANOS) — which Spark's vectorized reader rejects,
so ``spark.sql.legacy.parquet.nanosAsLong`` reads it as a raw ns
bigint — and plain TIMESTAMP(MICROS) (isAdjustedToUTC=false → Spark
TIMESTAMP_NTZ). Both normalize to the same two columns here:
``ts`` (session-TZ TimestampType, µs precision — matching what DuckDB
produces when it coerces ns → µs, so oracle comparisons line up) and
``ts_ns`` (raw ns bigint, used by the event→broker seeder).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

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
        if isinstance(df.schema["ts"].dataType, LongType):
            # ns-bigint layout: integer DIV keeps full precision (a
            # double division of an ~1.7e18 ns value would round in
            # the last µs digit)
            df = df.withColumnRenamed("ts", "ts_ns").withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts_ns DIV 1000 AS LONG))")
            )
        else:
            # µs layout (TIMESTAMP or TIMESTAMP_NTZ): with the session
            # TZ pinned to UTC the NTZ→TZ cast is an exact relabel
            df = df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
                "ts_ns", F.expr("unix_micros(ts) * CAST(1000 AS LONG)")
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
