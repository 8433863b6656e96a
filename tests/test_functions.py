"""Cross-engine primitive tests (no Spark needed): the DuckDB SQL
twins in functions/ must agree with plain-Python reference
implementations on adversarial inputs — these primitives carry the
whole oracle gate, so they get their own property tests.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sql_pubsub_connector_spark.functions.textops import (
    sql_hex_prefix_int,
    sql_quantize,
)
from spark_sql_pubsub_connector_spark.functions.vecops import (
    DIM,
    bucket_exprs,
    hyperplanes,
    sql_dot_q,
)
from spark_sql_pubsub_connector_spark.plans.dedup import _MH_A, _MH_B, _MH_P


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@given(st.text(min_size=0, max_size=50))
@settings(max_examples=50, deadline=None)
def test_hex_prefix_int_matches_python(s):
    con = duckdb.connect()
    for n in (7, 8, 15):
        expected = int(hashlib.md5(s.encode()).hexdigest()[:n], 16)
        got = con.execute(
            f"SELECT {sql_hex_prefix_int('md5(s)', n)} FROM (SELECT ? AS s)", [s]
        ).fetchone()[0]
        assert got == expected, (s, n)


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_sql_quantize_is_floor_half_up(x):
    scale = 10_000
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql_quantize('v', scale)} FROM (SELECT CAST(? AS DOUBLE) AS v)", [x]
    ).fetchone()[0]
    assert got == math.floor(x * scale + 0.5)


def test_hyperplanes_deterministic_and_pm1():
    a = hyperplanes(8)
    b = hyperplanes(8)
    assert a == b
    assert len(a) == 8 and all(len(r) == DIM for r in a)
    assert {c for r in a for c in r} == {1, -1}
    # not degenerate: each plane mixes signs
    for r in a:
        assert 10 < sum(1 for c in r if c == 1) < DIM - 10


def test_bucket_exprs_spark_duck_agree_on_literals(duck):
    """Evaluate the generated bucket expressions on a literal vector in
    DuckDB twice — 0-based (Spark text, shifted) vs 1-based — by
    translating the Spark form's indices; both must give one bucket."""
    spark_e, duck_e = bucket_exprs(4, qarr="q")
    vec = [((i * 37) % 19) - 9 for i in range(DIM)]
    got = duck.execute(
        f"SELECT {duck_e} FROM (SELECT ? AS q)", [vec]
    ).fetchone()[0]
    # python reference
    planes = hyperplanes(4)
    expected = sum(
        (1 << j)
        for j, row in enumerate(planes)
        if sum(c * v for c, v in zip(row, vec)) > 0
    )
    assert got == expected
    # the Spark side reads via get(q, i) (NULL out-of-range, matching
    # DuckDB's q[i] semantics on short arrays); same term count
    assert spark_e.count("get(q, ") == duck_e.count("q[") == 4 * DIM


def test_minhash_coefficients_are_valid_universal_hash_params():
    assert len(_MH_A) == len(_MH_B) == 8
    assert all(1 <= a < _MH_P for a in _MH_A)
    assert all(0 <= b < _MH_P for b in _MH_B)
    assert len(set(zip(_MH_A, _MH_B))) == 8  # all distinct
    # overflow safety: a*v + b < 2^63 for v < p
    assert max(_MH_A) * (_MH_P - 1) + max(_MH_B) < 2**63


def test_sql_dot_q_exact_on_known_vectors(duck):
    a = [0.5] * DIM
    b = [0.25] * DIM
    got = duck.execute(
        f"SELECT {sql_dot_q('a', 'b')} FROM (SELECT CAST(? AS FLOAT[]) a, CAST(? AS FLOAT[]) b)",
        [a, b],
    ).fetchone()[0]
    assert got == DIM * int(0.125 * 1_000_000_000_000)
