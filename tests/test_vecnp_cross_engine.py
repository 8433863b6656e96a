"""Differential pin: the numpy kernels (``functions.vecnp``) against
the JVM expression chain (``functions.vecops``) they replace in q22's
vectorized path.

``test_vecops_cross_engine.py`` already pins JVM == DuckDB; this file
pins numpy == JVM on the same class of adversarial values, closing the
triangle. The vecnp kernels only ever see EQUAL-length, non-NULL
vectors (the similarity callers implement the NULL-on-length-mismatch
and zero-norm CASE rules by bucketing/masking), so the contract pinned
here is:

  - ``dots_q``/``nrm_q``: exact int64 equality with ``dot_q_expr`` for
    every equal-length pair — pseudo-random, zero, empty, tiny
    (quantizes to all-zero), float32-subnormal, near-overflow-huge,
    and over-length (70-element) vectors;
  - ``sim_q9``: exact equality with ``cosine_q_expr`` wherever both
    norms are positive (the only inputs the kernel receives);
  - ``top_ids_stable``: equal to the SQL window
    ``row_number() OVER (ORDER BY cos DESC NULLS LAST, id ASC)`` the
    q22 oracle ranks with — including NULL scores (encoded -inf) and
    exact score ties, both resolved to the lower id.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from spark_sql_pubsub_connector_spark.functions import vecnp
from spark_sql_pubsub_connector_spark.functions.vecops import (
    DIM,
    cosine_q_expr,
    dot_q_expr,
)


def _vectors() -> list[tuple[int, list[float]]]:
    vecs: list[list[float]] = []
    for k in range(8):  # deterministic pseudo-random full-length
        vecs.append(
            [(((i * 2654435761 + k * 40503) % 2000) - 1000) / 997.0 for i in range(DIM)]
        )
    vecs.append([0.0] * DIM)  # 8: zero vector — zero norm
    vecs.append([])  # 9: empty array (dot 0 with itself)
    vecs.append([1.0, -2.0, 3.0])  # 10: truncated (pairs with itself)
    vecs.append([1e-9] * DIM)  # 11: quantizes to all-zero — zero norm
    vecs.append([10.0] * DIM)  # 12: huge, still inside the BIGINT grid
    vecs.append([0.5] * (DIM + 6))  # 13: over-length, 70 defined terms
    vecs.append([2**-149] * DIM)  # 14: float32 subnormal — zero norm
    vecs.append([0.1] * DIM)  # 15: repeating-fraction rounding
    # 16: NULL ELEMENT inside a full-length array (ADVICE r10): the
    # JVM/DuckDB chain makes every dot against it NULL; numpy sees it
    # as NaN and the similarity callers must mask it out BEFORE the
    # kernels (floor/int64 on NaN is platform-defined)
    vecs.append([1.0, None] + [0.25] * (DIM - 2))
    return list(enumerate(vecs))


def _np_vec(v: list[float]) -> np.ndarray:
    # mirror the production data path: parquet float32 → float64 widen
    # (a NULL element arrives as NaN, exactly as Arrow delivers it)
    return np.asarray(
        [np.nan if x is None else x for x in v], dtype=np.float32
    ).astype(np.float64)


@pytest.fixture(scope="module")
def jvm_rows(spark):
    rows = [
        (i, [None if x is None else float(x) for x in v]) for i, v in _vectors()
    ]
    df = spark.createDataFrame(rows, "vid INT, embedding ARRAY<FLOAT>")
    df.createOrReplaceTempView("xvecnp")
    out = spark.sql(
        f"""
        WITH e AS (
          SELECT vid, embedding,
                 {dot_q_expr('embedding', 'embedding')} AS nrm
          FROM xvecnp
        )
        SELECT a.vid AS va, b.vid AS vb,
               {dot_q_expr('a.embedding', 'b.embedding')} AS dot,
               {cosine_q_expr(dot_q_expr('a.embedding', 'b.embedding'), 'a.nrm', 'b.nrm')} AS sim
        FROM e a JOIN e b
          ON a.vid <= b.vid AND size(a.embedding) = size(b.embedding)
        """
    ).collect()
    return {(r["va"], r["vb"]): (r["dot"], r["sim"]) for r in out}


def test_dots_and_norms_match_jvm_exactly(jvm_rows):
    vecs = dict(_vectors())
    checked = nulls = 0
    for (va, vb), (dot, _) in sorted(jvm_rows.items()):
        A = _np_vec(vecs[va])[None, :]
        B = _np_vec(vecs[vb])[None, :]
        if dot is None:
            # the JVM chain NULLs every dot touching a NULL element —
            # numpy sees NaN there, and the kernel contract is that
            # callers mask such rows BEFORE dots_q/nrm_q
            assert np.isnan(A).any() or np.isnan(B).any(), (va, vb)
            nulls += 1
            continue
        got = int(vecnp.dots_q(A, B)[0, 0])
        assert got == int(dot), (va, vb, got, dot)
        if va == vb:
            assert int(vecnp.nrm_q(A)[0]) == int(dot), (va, got, dot)
        checked += 1
    # every equal-length pair of the battery, including empty×empty
    # and the NULL-element vector's pairs (all NULL dots)
    assert checked > 60 and (9, 9) in jvm_rows and (13, 13) in jvm_rows
    assert nulls >= 12 and (16, 16) in jvm_rows


def test_sim_q9_matches_jvm_on_positive_norms(jvm_rows):
    vecs = dict(_vectors())
    # caller-style masking: a NULL-element (NaN) vector gets norm 0,
    # never reaching nrm_q — mirrors _nd_cand_set / _assign
    nrm = {
        i: (
            0
            if np.isnan(_np_vec(v)).any()
            else int(vecnp.nrm_q(_np_vec(v)[None, :])[0])
        )
        for i, v in _vectors()
        if v is not None
    }
    checked = 0
    for (va, vb), (dot, sim) in sorted(jvm_rows.items()):
        if nrm[va] <= 0 or nrm[vb] <= 0:
            assert sim is None, (va, vb, sim)  # CASE guard on both sides
            continue
        A = _np_vec(vecs[va])[None, :]
        B = _np_vec(vecs[vb])[None, :]
        got = int(
            vecnp.sim_q9(
                vecnp.dots_q(A, B),
                np.array([[nrm[va]]], dtype=np.int64),
                np.array([[nrm[vb]]], dtype=np.int64),
            )[0, 0]
        )
        assert got == int(sim), (va, vb, got, sim)
        checked += 1
    assert checked > 40


def test_top_ids_stable_matches_sql_window():
    """NULL scores last, exact ties to the lower id — the oracle's
    ``ORDER BY cos DESC NULLS LAST, cent_id ASC`` on a crafted score
    set with a duplicated top score, a NULL block, and -0.0 absent
    (cos can never be -0.0: an integer dot casts to +0.0)."""
    ids = np.array([3, 7, 11, 20, 21, 40], dtype=np.int64)
    scores = np.array(
        [
            [0.5, 0.9, 0.9, -np.inf, 0.1, -np.inf],
            [-np.inf, -np.inf, -np.inf, -np.inf, -np.inf, -np.inf],
            [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        ]
    )
    got = vecnp.top_ids_stable(scores, ids, 3)
    con = duckdb.connect()
    for r in range(scores.shape[0]):
        vals = [
            (int(ids[j]), None if scores[r, j] == -np.inf else float(scores[r, j]))
            for j in range(ids.size)
        ]
        con.execute("CREATE OR REPLACE TABLE t(id BIGINT, cos DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?, ?)", vals)
        want = [
            x[0]
            for x in con.execute(
                "SELECT id FROM t ORDER BY cos DESC NULLS LAST, id LIMIT 3"
            ).fetchall()
        ]
        assert got[r].tolist() == want, (r, got[r].tolist(), want)
