from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

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


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_VANILLA=1: build the session the way the grading
    # driver does — default confs, none of get_spark's build-time
    # tuning — so any query silently depending on a conf the driver
    # won't have fails HERE first. Queries must self-heal the
    # correctness-critical runtime confs via ensure_confs/load_table.
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("pytest-vanilla")
            .master("local[4]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        yield spark
        spark.stop()
        return
    from spark_sql_pubsub_connector_spark.session import get_spark

    # small-but-parallel local session: enough cores to catch
    # partitioning bugs, few enough shuffle partitions to stay fast
    spark = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="module", autouse=True)
def _clear_spark_cache_between_modules():
    """ADVICE r6: q17/q109 persist per-sf_dir frames and the suite's
    session-scoped SparkSession sees MANY tmp corpora, pinning one
    MEMORY_AND_DISK entry per corpus for the session lifetime. Cache
    is semantically transparent, so clearing between modules bounds
    the accumulation without touching any result. getActiveSession
    (not the ``spark`` fixture) so spark-free modules don't pay a
    session spin-up."""
    yield
    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            s.catalog.clearCache()
    except Exception:
        pass


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
