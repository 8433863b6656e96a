"""Cross-engine differential test for the shared vector helpers.

One batch of vectors — random, zero, empty, truncated, tiny-magnitude,
huge-magnitude — is evaluated through the SAME generated SQL on both
engines: ``dot_q_expr``/``cosine_q_expr``/``bucket_exprs`` (Spark side)
vs ``sql_dot_q``/``cosine_q_expr``/``bucket_exprs`` (DuckDB side). The
helpers are the only place vector math is defined, so agreement here is
what keeps every similarity oracle hash-stable.

Contract pinned:
  - full-length (DIM) vectors: dot, cosine, and LSH bucket agree
    EXACTLY across engines — including the zero vector and the
    tiny-magnitude vector that quantizes to all zeros, where the
    round-5 zero-norm guard must return NULL cosine on both sides;
  - short/empty arrays (out of the fixture contract, in every real
    corpus): since r6 the dot ALSO agrees exactly — ``sql_dot_q``
    mirrors Spark's ``zip_with`` fold (mismatched lengths → NULL,
    equal lengths including both-empty → the exact sum), closing the
    divergence the r5 version of this file documented as acceptable
    (the q22 degenerate-corpus differential proved it leaked into
    query-level results: a truncated vector paired on one engine
    only). The LSH bucket agrees as before, and neither engine
    raises.
"""

from __future__ import annotations

import duckdb
import pytest

from spark_sql_pubsub_connector_spark.functions.vecops import (
    DIM,
    bucket_exprs,
    cosine_q_expr,
    dot_q_expr,
    quant_arr_expr,
    sql_dot_q,
    sql_quant_arr,
)


def _vectors() -> list[tuple[int, list[float]]]:
    vecs: list[list[float]] = []
    for k in range(8):  # deterministic pseudo-random full-length
        vecs.append(
            [(((i * 2654435761 + k * 40503) % 2000) - 1000) / 997.0 for i in range(DIM)]
        )
    vecs.append([0.0] * DIM)  # 8: zero vector — zero norm
    vecs.append([])  # 9: empty array
    vecs.append([1.0, -2.0, 3.0])  # 10: truncated
    vecs.append([1e-9] * DIM)  # 11: quantizes to all-zero — zero norm
    # 12: large magnitude, still inside the PROD_SCALE grid's overflow
    # bound (64 * (10*10) * 1e12 = 6.4e15 « 2^63). Magnitudes ≳ 1.2e2
    # overflow the exact-BIGINT grid and raise loudly on both engines —
    # embeddings are unit-scale by contract (vecops module docstring),
    # so that loud failure is correct, not guarded.
    vecs.append([10.0] * DIM)
    # 13: OVER-length (70 elements) — ADVICE r6: Spark's unsliced
    # zip_with spans all 70 terms, and sql_dot_q's old least(len, 64)
    # clamp silently summed only 64 of them — the one degenerate class
    # the r6 fix missed. The full-width default now clamps nothing.
    vecs.append([0.5] * (DIM + 6))
    return list(enumerate(vecs))


_SHORT_IDS = {i for i, v in _vectors() if len(v) != DIM}
_OVER_IDS = {i for i, v in _vectors() if len(v) > DIM}
_ZERO_NORM_IDS = {8, 11}


def _spark_rows(spark):
    rows = [(i, [float(x) for x in v]) for i, v in _vectors()]
    df = spark.createDataFrame(rows, "vid INT, embedding ARRAY<FLOAT>")
    df.createOrReplaceTempView("xveca")
    spark_bucket, _ = bucket_exprs(4, qarr="q")
    bucket_on_a = spark_bucket.replace("get(q, ", "get(a.q, ")
    return spark.sql(
        f"""
        WITH e AS (
          SELECT vid, embedding,
                 {dot_q_expr('embedding', 'embedding')} AS nrm,
                 {quant_arr_expr('embedding')} AS q
          FROM xveca
        )
        SELECT a.vid AS va, b.vid AS vb,
               {dot_q_expr('a.embedding', 'b.embedding')} AS dot,
               {cosine_q_expr(dot_q_expr('a.embedding', 'b.embedding'), 'a.nrm', 'b.nrm')} AS sim,
               {bucket_on_a} AS bucket_a
        FROM e a JOIN e b ON a.vid <= b.vid
        """
    ).collect()


def _duck_rows():
    con = duckdb.connect()
    con.execute("CREATE TABLE xveca(vid INT, embedding FLOAT[])")
    for i, v in _vectors():
        con.execute("INSERT INTO xveca VALUES (?, ?)", [i, v])
    _, duck_bucket = bucket_exprs(4, qarr="q")
    bucket_on_a = duck_bucket.replace("q[", "a.q[")
    return con.execute(
        f"""
        WITH e AS (
          SELECT vid, embedding,
                 {sql_dot_q('embedding', 'embedding')} AS nrm,
                 {sql_quant_arr('embedding')} AS q
          FROM xveca
        )
        SELECT a.vid AS va, b.vid AS vb,
               {sql_dot_q('a.embedding', 'b.embedding')} AS dot,
               {cosine_q_expr(sql_dot_q('a.embedding', 'b.embedding'), 'a.nrm', 'b.nrm')} AS sim,
               {bucket_on_a} AS bucket_a
        FROM e a JOIN e b ON a.vid <= b.vid
        """
    ).fetchall()


@pytest.fixture(scope="module")
def engines(spark):
    s = {
        (r["va"], r["vb"]): (r["dot"], r["sim"], r["bucket_a"])
        for r in _spark_rows(spark)
    }
    d = {(va, vb): (dot, sim, b) for va, vb, dot, sim, b in _duck_rows()}
    assert set(s) == set(d) and len(s) == 14 * 15 // 2
    return s, d


def _ints(t):
    return tuple(None if x is None else int(x) for x in t)


def test_full_length_vectors_agree_exactly(engines):
    s, d = engines
    checked = 0
    for k in s:
        if k[0] in _SHORT_IDS or k[1] in _SHORT_IDS:
            continue
        assert _ints(s[k]) == _ints(d[k]), (k, s[k], d[k])
        checked += 1
    assert checked == 11 * 12 // 2


def test_every_pair_agrees_including_short_arrays(engines):
    """r6: the whole matrix — short×short, short×full, empty×empty —
    must agree exactly across engines now that sql_dot_q mirrors the
    zip_with fold. Spot-pin the semantics: mismatched lengths → NULL
    dot; equal-length-short → exact sum; empty×empty → 0."""
    s, d = engines
    for k in sorted(s):
        assert _ints(s[k]) == _ints(d[k]), (k, s[k], d[k])
    assert s[(9, 9)][0] == 0  # empty × empty: dot 0, both engines
    assert s[(9, 10)][0] is None  # empty × truncated: mismatched → NULL
    assert s[(10, 10)][0] is not None  # truncated × itself: exact sum
    # over-length (r7): 70×70 sums ALL 70 terms on both engines —
    # 70 · floor(0.25·1e12 + 0.5) — not the old silently-clamped 64;
    # over×full(64) is mismatched-length → NULL on both.
    assert s[(13, 13)][0] == 70 * 250_000_000_000
    assert s[(0, 13)][0] is None and d[(0, 13)][0] is None


def test_zero_norm_cosine_is_null_on_both_engines(engines):
    s, d = engines
    for rows in (s, d):
        for (va, vb), (_, sim, _) in rows.items():
            degenerate = bool(
                {va, vb} & (_ZERO_NORM_IDS | _SHORT_IDS)
            )
            if degenerate:
                assert sim is None or va in _SHORT_IDS or vb in _SHORT_IDS, (
                    (va, vb),
                    sim,
                )
            else:
                assert sim is not None, ((va, vb), sim)
    # zero-norm pairs specifically: NULL on both engines, no exception
    for rows in (s, d):
        for (va, vb), (_, sim, _) in rows.items():
            if {va, vb} & _ZERO_NORM_IDS and not ({va, vb} & _SHORT_IDS):
                assert sim is None, ((va, vb), sim)


def test_short_arrays_bucket_to_zero_bits_on_both_engines(engines):
    s, d = engines
    for rows in (s, d):
        for (va, vb), (_, _, bucket) in rows.items():
            if va in _SHORT_IDS - _OVER_IDS:  # bucket_a is from vector va
                # truncated/empty: some plane term is NULL → all bits 0
                assert bucket == 0, ((va, vb), bucket)
            else:
                # full and OVER-length: the planes read exactly DIM
                # elements (get()/[] over 0..63), so an over-length
                # vector buckets like its 64-prefix — defined, non-NULL
                assert bucket is not None, ((va, vb), bucket)
    # buckets agree pairwise everywhere
    for k in s:
        assert s[k][2] == d[k][2], (k, s[k], d[k])
