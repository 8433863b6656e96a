"""Cross-engine vector primitives for the similarity operators.

The driver hash-compares Spark against DuckDB with zero tolerance, and
floating-point summation order differs between engines, so every
vector reduction is done on an exact integer grid:

  - each elementwise product/square is quantized independently with
    ``floor(x + 0.5)`` (identical single IEEE-754 multiply-add-floor in
    both engines — ``round`` is avoided because half-up vs half-even
    could differ on negatives);
  - the quantized BIGINTs are summed exactly (order-independent);
  - the final cosine is ONE double division/sqrt on identical integers,
    hence bit-equal across engines.

Dims are fixed at 64 (FIXTURES.md `embeddings.embedding`); the DuckDB
side indexes lists 1-based, Spark arrays 0-based.

Scale note: everything here is whole-stage-codegen JVM arithmetic on
array columns — no UDFs, no Python in the hot path. At 100 TB the
brute-force form is quadratic and exists only as the rerank step after
LSH bucketing (see plans/similarity.py).
"""

from __future__ import annotations

import hashlib

DIM = 64
# quantization grids: element products at 1e12 (64 * 0.25e12 ≈ 1.6e13
# per norm — far inside BIGINT), final cosine reported at 1e9
PROD_SCALE = 1_000_000_000_000
SIM_SCALE = 1_000_000_000


def dot_q_expr(a: str, b: str) -> str:
    """Spark SQL expression: exact quantized dot product of two
    float-array columns as BIGINT."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(floor(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * {PROD_SCALE} + 0.5d) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def sql_dot_q(a: str, b: str, dim: int | None = None) -> str:
    """DuckDB twin of :func:`dot_q_expr` (1-based list indexing).
    An explicit ``dim`` reduces over the array prefix only — the
    DuckDB twin of a Spark-side ``slice(arr, 1, dim)`` dot product
    (q90's Matryoshka prefix), where the clamp mirrors ``slice``
    returning min(len, dim) elements.

    Mirrors Spark's ``zip_with`` fold EXACTLY on degenerate arrays
    (r6; found by the q22 degenerate-corpus differential): the term
    list spans max of the two lengths, and ANY NULL term nulls the
    whole dot — so a truncated×full pair is NULL on both engines
    instead of DuckDB's old ``list_sum`` silently skipping the missing
    elements and producing a partial dot that let corrupt vectors pair
    on one engine only. The full-width default clamps NOTHING (r7,
    ADVICE r6): Spark's unsliced ``zip_with`` spans over-length arrays
    too, and the old ``least(len, 64)`` clamp silently summed only 64
    terms of a 70-element pair — the one degenerate class that still
    diverged. Equal-length well-formed arrays produce the identical
    exact sum as before, so every oracle value on well-formed corpora
    is byte-unchanged."""
    if dim is None:
        span = f"greatest(len({a}), len({b}))"
    else:
        span = f"greatest(least(len({a}), {dim}), least(len({b}), {dim}))"
    terms = (
        f"list_transform(range(1, {span} + 1), i -> "
        f"CAST(floor(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * {PROD_SCALE} + 0.5) AS BIGINT))"
    )
    return (
        f"(CASE WHEN len(list_filter({terms}, x -> x IS NULL)) > 0 THEN NULL "
        f"ELSE CAST(COALESCE(list_sum({terms}), 0) AS BIGINT) END)"
    )


def cosine_q_expr(dot: str, na: str, nb: str) -> str:
    """Quantized cosine (grid 1e9) from exact dot/norm BIGINT columns.

    The norm product is widened to DOUBLE before multiplying (BIGINT ×
    BIGINT would overflow at ~1.6e13 each); both engines then perform
    the identical divide/sqrt/floor chain. Engine-agnostic SQL text —
    valid for Spark and DuckDB; this helper builds BOTH sides, so the
    guard below changes them symmetrically.

    Zero-norm vectors (an empty or all-zero embedding — real corpora
    contain them) make cosine undefined; the CASE guard returns SQL
    NULL instead of tripping Spark's ANSI DIVIDE_BY_ZERO and killing
    the whole stage. Non-degenerate rows are untouched — the exact
    divide/sqrt/floor chain is byte-identical to the unguarded form.
    """
    return (
        f"CASE WHEN {na} = 0 OR {nb} = 0 THEN NULL ELSE "
        f"CAST(floor(CAST({dot} AS DOUBLE) / "
        f"sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)) * {SIM_SCALE} + 0.5) AS BIGINT) END"
    )


def hyperplanes(n_planes: int, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane coefficients for sign-LSH.

    Derived from md5 of ``"plane:{j}:{i}"`` (high bit of the first
    digest byte) so both engines receive them as identical literals —
    no RNG, no seed state, reproducible across rounds.
    """
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{j}:{i}".encode()).digest()[0]
            row.append(1 if h >= 128 else -1)
        planes.append(row)
    return planes


def bucket_exprs(n_planes: int, qarr: str = "q") -> tuple[str, str]:
    """(spark_expr, duckdb_expr) computing the sign-LSH bucket id from a
    quantized BIGINT array column ``qarr``.

    bit_j = (Σ_i coeff[j][i] * q[i]) > 0   (exact integer sum, so the
    sign is unambiguous and identical across engines);
    bucket = Σ_j bit_j · 2^j  ∈ [0, 2^n_planes).

    The Spark side reads elements with ``get()`` (0-based, NULL on an
    out-of-range index) rather than ``[]``, which under ANSI mode
    throws INVALID_ARRAY_INDEX and kills the stage on a truncated or
    empty embedding. DuckDB's ``[]`` already yields NULL out-of-range,
    so both engines agree on degenerate vectors too: any NULL term
    nulls the sum, ``NULL > 0`` is not true, the bit is 0. Values on
    well-formed DIM-length arrays are identical to direct indexing.
    """
    planes = hyperplanes(n_planes)

    def side(one_based: bool) -> str:
        bits = []
        for j, row in enumerate(planes):
            terms = " + ".join(
                (
                    f"{c}*{qarr}[{i + 1}]"
                    if one_based
                    else f"{c}*get({qarr}, {i})"
                )
                for i, c in enumerate(row)
            )
            bits.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END)")
        return "(" + " + ".join(bits) + ")"

    return side(False), side(True)


def quant_arr_expr(col: str = "embedding", scale: int = 1_000_000) -> str:
    """Spark SQL: float array → exact BIGINT array at ``scale``."""
    return (
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5d) AS BIGINT))"
    )


def sql_quant_arr(col: str = "embedding", scale: int = 1_000_000) -> str:
    return (
        f"list_transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT))"
    )
