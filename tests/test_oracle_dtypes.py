"""Mirror of the driver's *pandas-path* canonicalization.

The grading driver does NOT compare Python row objects: it pulls
``spark_df.toPandas()`` and DuckDB ``.df()``, sorts columns by name,
and hashes values with zero tolerance.  That path has a failure class
the row-level oracle test cannot see: a dtype-representation drift,
e.g. DuckDB ``sum(BIGINT)`` returning HUGEINT which pandas renders as
float64 (``3.0``) while Spark returns int64 (``3``) — identical values,
different hash (round-1 q23/q25 regression).  The fix rule lives in
``plans/registry.py``: wrap every integer aggregate exported from an
oracle in ``CAST(... AS BIGINT)``.

This test enforces the rule corpus-wide: for every oracle-checked
query, the pandas dtype *kind* of every exported column must agree
between the Spark result and the DuckDB result.
"""

from __future__ import annotations

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs

SPECS = {n: s for n, s in all_specs().items() if s.oracle is not None}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_pandas_dtype_kinds_match(name, spark, duck, sf_dir):
    spec = SPECS[name]
    spd = spec.build(spark, sf_dir).toPandas()
    dpd = duck.execute(spec.oracle).df()
    assert sorted(spd.columns) == sorted(dpd.columns), (
        f"{name}: columns {sorted(spd.columns)} vs {sorted(dpd.columns)}"
    )
    for c in sorted(spd.columns):
        sk = spd[c].dtype.kind
        dk = dpd[c].dtype.kind
        assert sk == dk, (
            f"{name}.{c}: spark pandas dtype {spd[c].dtype} (kind {sk!r}) != "
            f"duckdb pandas dtype {dpd[c].dtype} (kind {dk!r}) — the driver "
            f"hashes these differently even when values are identical"
        )
