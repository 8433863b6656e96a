"""Degenerate-input sweep: every registered batch query must execute
cleanly on a ZERO-ROW corpus and a SINGLE-ROW corpus.

The driver's fixtures are always populous, so the oracle mirror never
exercises the empty-group / empty-join / null-aggregate paths a real
deployment hits constantly (a fresh partition, a filter that matches
nothing, a source whose day's data is one document). Spark semantics
make most of these safe by construction — empty aggregates yield null,
empty joins yield empty — but driver-side derivations (collected
thresholds, convergence loops, broadcast build sides, percentile
literals) can raise on ``None``/empty instead. This sweep pins that
every query degrades to an empty-or-small result, never an exception.

Single-row fixtures also break referential integrity on purpose (one
customer, one order that likely doesn't reference it): joins must
produce empty output, not errors.

Runs against schema-faithful fixtures derived from the sf0.001 parquet
(``limit 0`` / ``limit 1`` per table), so column names, types, and
nullability match production exactly. Streaming queries are excluded:
their builders seed brokers from the events table and are covered by
the dedicated streaming/differential suites.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs

from .conftest import SF_DIR, TABLES

SPECS = all_specs()
BATCH = sorted(n for n, s in SPECS.items() if "streaming" not in s.tags)


def _make_fixture(spark, n_rows: int) -> str:
    out = tempfile.mkdtemp(prefix=f"edge-sf{n_rows}-")
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(n_rows)
        df.coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.fixture(scope="module")
def empty_dir(spark):
    out = _make_fixture(spark, 0)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="module")
def one_row_dir(spark):
    out = _make_fixture(spark, 1)
    yield out
    shutil.rmtree(out, ignore_errors=True)


@pytest.mark.parametrize("name", BATCH)
def test_zero_row_corpus(name, spark, empty_dir):
    df = SPECS[name].build(spark, empty_dir)
    assert df.count() >= 0  # must plan and execute, not raise


@pytest.mark.parametrize("name", BATCH)
def test_single_row_corpus(name, spark, one_row_dir):
    df = SPECS[name].build(spark, one_row_dir)
    assert df.count() >= 0
