"""Cross-engine differential test for the exact-aggregation helpers.

``esum``/``eavg`` (and their ``sql_`` twins) are the foundation of
every money-typed oracle hash: both engines must snap each term to the
same BIGINT grid, sum exactly, and perform the identical IEEE-754
division — bit-equal, no tolerance. This pins that on adversarial
fixed-decimal data the populous fixtures never stress: negatives,
values at the 2-decimal grid edge, large magnitudes near the
documented per-group headroom, high-cardinality repeats that force
different partial-aggregation orders, and groups of size 1 and 8
(the ``avg`` boundary the module docstring calls out: n=8 averages
end in ...25 at 4 decimals — exactly where ``round(sum(x), k)``
strategies flip).
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_pubsub_connector_spark.functions.exact import (
    eavg,
    esum,
    sql_eavg,
    sql_esum,
)


def _rows() -> list[tuple[int, float]]:
    rows: list[tuple[int, float]] = []
    # group 0: the docstring's n=8 boundary — avg ends in ...25
    rows += [(0, 0.01)] * 2 + [(0, 0.02)] * 6
    # group 1: sign cancellation at the grid edge
    rows += [(1, -0.01), (1, 0.01), (1, -0.03), (1, 0.02)]
    # group 2: large magnitudes (money-typed, far under the 9.2e14
    # per-group headroom at scale 2)
    rows += [(2, 12_345_678.99), (2, -9_999_999.99), (2, 987_654_321.07)]
    # group 3: single row
    rows += [(3, -0.07)]
    # group 4: many repeats across partitions — forces partial-agg
    # order differences between engines/partitions
    rows += [(4, 0.03 if i % 3 else -0.01) for i in range(1000)]
    # group 5: values whose *100 float image is near .5 below the grid
    # (fixed-decimal contract: 2 decimals, so the snap is unambiguous,
    # but 0.29/0.58/1.005-style doubles are the classic repr traps)
    rows += [(5, 0.29), (5, 0.58), (5, 8.2), (5, 4.35), (5, -4.35)]
    return rows


@pytest.fixture(scope="module")
def spark_vals(spark):
    df = spark.createDataFrame(_rows(), "g INT, v DOUBLE").repartition(8)
    out = (
        df.groupBy("g")
        .agg(esum("v").alias("s"), eavg("v").alias("a"))
        .collect()
    )
    return {r["g"]: (r["s"], r["a"]) for r in out}


def test_exact_aggs_bit_equal_across_engines(spark_vals):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", _rows())
    rows = con.execute(
        f"SELECT g, {sql_esum('v', alias='s')}, {sql_eavg('v', alias='a')} "
        "FROM t GROUP BY g"
    ).fetchall()
    duck = {g: (s, a) for g, s, a in rows}
    assert set(duck) == set(spark_vals)
    for g in duck:
        # bit-equality, not approx: repr captures every bit of a double
        assert repr(spark_vals[g]) == repr(duck[g]), (g, spark_vals[g], duck[g])


def test_exact_aggs_match_integer_ground_truth(spark_vals):
    import collections

    sums: dict[int, int] = collections.defaultdict(int)
    counts: dict[int, int] = collections.defaultdict(int)
    for g, v in _rows():
        sums[g] += round(v * 100)
        counts[g] += 1
    for g, (s, a) in spark_vals.items():
        true_s = (sums[g] / 100.0)
        assert s == true_s, (g, s, true_s)
        assert a == true_s / counts[g], (g, a)


def test_exact_aggs_survive_past_int64(spark):
    """The WIDE variants accumulate in DECIMAL(38,0)/HUGEINT: a group
    whose scaled sum crosses 2^63 — the true-100 TB q01-class case the
    r12 probe caught as ARITHMETIC_OVERFLOW in q98's int64 arithmetic —
    must aggregate without error and bit-match DuckDB's HUGEINT path.
    Each term is 9e14 (exact in a double); 20,000 of them sum to
    1.8e19 scaled units at scale 2 > 2^63 ≈ 9.2e18 (the narrow BIGINT
    form raises here under ANSI — loud, never corrupt)."""
    from spark_sql_pubsub_connector_spark.functions.exact import (
        eavg_wide,
        esum_wide,
        sql_eavg_wide,
        sql_esum_wide,
    )

    big = 9_000_000_000_000.00  # *100 → 9e14 per row, exact in double
    n = 20_000
    df = spark.createDataFrame([(0, big)] * n, "g INT, v DOUBLE").repartition(8)
    [r] = (
        df.groupBy("g")
        .agg(esum_wide("v").alias("s"), eavg_wide("v").alias("a"))
        .collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, v DOUBLE)")
    con.execute(f"INSERT INTO t SELECT 0, {big!r} FROM range({n})")
    [(s_d, a_d)] = con.execute(
        f"SELECT {sql_esum_wide('v', alias='s')}, "
        f"{sql_eavg_wide('v', alias='a')} FROM t"
    ).fetchall()
    assert repr(r["s"]) == repr(s_d), (r["s"], s_d)
    assert repr(r["a"]) == repr(a_d), (r["a"], a_d)
    # the double division of the exact 128-bit integer is the contract
    assert r["s"] == float(n * 9_000_000_000_000_00) / 100.0


def test_wide_and_narrow_bit_identical_under_int64(spark):
    """Below 2^63 the wide accumulator must be bit-identical to the
    narrow default — the guarantee that lets a deployment switch to
    the wide form without changing any historical result."""
    from spark_sql_pubsub_connector_spark.functions.exact import (
        eavg_wide,
        esum_wide,
    )

    df = spark.createDataFrame(_rows(), "g INT, v DOUBLE").repartition(8)
    narrow = {
        r["g"]: (r["s"], r["a"])
        for r in df.groupBy("g")
        .agg(esum("v").alias("s"), eavg("v").alias("a"))
        .collect()
    }
    wide = {
        r["g"]: (r["s"], r["a"])
        for r in df.groupBy("g")
        .agg(esum_wide("v").alias("s"), eavg_wide("v").alias("a"))
        .collect()
    }
    assert set(narrow) == set(wide)
    for g in narrow:
        assert repr(narrow[g]) == repr(wide[g]), (g, narrow[g], wide[g])


def test_exact_agg_mode_knob(spark, duck, sf_dir):
    """VERDICT r12 #5: one knob (SPARK_GRAFT_EXACT_ACC env /
    set_accumulator_mode) flips esum/eavg AND their SQL oracle twins to
    the DECIMAL(38,0)/HUGEINT accumulator in lockstep — a true-100 TB
    deployment is a config change, not a per-call-site hand edit.
    Pinned here by running the registered q01 oracle-green under BOTH
    modes (bit-identical below 2^63, so the hashes agree with history
    either way)."""
    from spark_sql_pubsub_connector_spark.functions import exact
    from spark_sql_pubsub_connector_spark.plans import all_specs

    from .oracle_util import assert_oracle_match

    assert exact.accumulator_mode() == "bigint"
    # dispatch sanity: the knob swaps the accumulator type in both the
    # Spark expression and the SQL text
    assert "DECIMAL" not in str(esum("v")).upper()
    assert "AS BIGINT" in sql_esum("v") and "HUGEINT" not in sql_esum("v")
    prev = exact.set_accumulator_mode("wide")
    try:
        assert prev == "bigint"
        assert "decimal(38,0)" in str(esum("v")).lower()
        assert "HUGEINT" in sql_esum("v") and "HUGEINT" in sql_eavg("v")
        spec = all_specs()["q01_pricing_summary"]  # re-resolves the oracle
        assert "HUGEINT" in spec.oracle and "BIGINT" not in spec.oracle
        assert_oracle_match(
            spec.build(spark, sf_dir), duck, spec.oracle, name="q01-wide"
        )
    finally:
        exact.set_accumulator_mode("bigint")
    # narrow restored: the default-mode oracle text is byte-identical
    # to the pre-knob corpus (driver hash history unaffected)
    spec = all_specs()["q01_pricing_summary"]
    assert "HUGEINT" not in spec.oracle
    assert_oracle_match(
        spec.build(spark, sf_dir), duck, spec.oracle, name="q01-narrow"
    )


# The narrow-accumulator fingerprint sql_esum/sql_eavg emit: a BIGINT
# accumulator cast straight to DOUBLE. No hand-written oracle text may
# contain it (they must compose via sql_esum/sql_eavg so the knob can
# flip them), and no oracle may still carry it in wide mode.
_NARROW_FP = "AS BIGINT)) AS DOUBLE"


def test_mode_knob_flips_every_registered_oracle():
    """ADVICE r13 (medium): set_accumulator_mode('wide') must flip EVERY
    sql_esum/sql_eavg-bearing oracle, not just q01 — a baked f-string
    oracle keeps the BIGINT text while the Spark plan moves to
    DECIMAL(38,0), and the divergence appears exactly in the >2^63
    regime wide mode targets. All esum-bearing oracles are now zero-arg
    factories (lambdas), so the registry re-composes them per access;
    this pins that corpus-wide and guards new queries against baking."""
    from spark_sql_pubsub_connector_spark.functions import exact
    from spark_sql_pubsub_connector_spark.plans.registry import oracle_sql

    assert exact.accumulator_mode() == "bigint"
    default = dict(oracle_sql())
    bearing = sorted(n for n, s in default.items() if _NARROW_FP in s)
    # the esum foundation underpins a large slice of the money-typed
    # corpus; if this count drops unexpectedly, a query stopped
    # composing via sql_esum/sql_eavg
    assert len(bearing) >= 18, bearing
    prev = exact.set_accumulator_mode("wide")
    try:
        assert prev == "bigint"
        wide = oracle_sql()
        stuck = [n for n in bearing if _NARROW_FP in wide[n]]
        assert stuck == [], f"oracles still narrow in wide mode: {stuck}"
        missing = [n for n in bearing if "HUGEINT" not in wide[n]]
        assert missing == [], f"oracles without a HUGEINT acc in wide mode: {missing}"
    finally:
        exact.set_accumulator_mode("bigint")
    # narrow restored byte-identically: the driver's oracle hash
    # history is untouched by the knob machinery
    assert dict(oracle_sql()) == default


def test_mode_knob_q100_oracle_green_both_modes(spark, duck, sf_dir):
    """q100's HAVING used to hand-write the narrow expression (the one
    site the corpus-wide factory conversion had to rewrite, not just
    re-wrap); run it oracle-green under both modes to pin the rewrite
    AND a second, join-shaped query through the wide path (q01 covers
    the pure-agg shape)."""
    from spark_sql_pubsub_connector_spark.functions import exact
    from spark_sql_pubsub_connector_spark.plans import all_specs

    from .oracle_util import assert_oracle_match

    for mode in ("bigint", "wide"):
        prev = exact.set_accumulator_mode(mode)
        try:
            spec = all_specs()["q100_large_orders"]
            assert (_NARROW_FP in spec.oracle) == (mode == "bigint")
            assert ("HUGEINT" in spec.oracle) == (mode == "wide")
            assert_oracle_match(
                spec.build(spark, sf_dir), duck, spec.oracle, name=f"q100-{mode}"
            )
        finally:
            exact.set_accumulator_mode(prev)
