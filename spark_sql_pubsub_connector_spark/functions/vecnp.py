"""numpy twins of the :mod:`vecops` quantized-vector chain.

The similarity operators' arithmetic is defined on an exact integer
grid (see ``vecops``: per-element ``floor(x*y*1e12 + 0.5)`` quantized
products, exact BIGINT sums, one final double divide/sqrt) so Spark
and the DuckDB oracle hash-match with zero tolerance. r9/r10 measured
all JVM *expression* encodings of that chain — fold, windowed argmax,
map-lookup — at the same ~1e8 mult-adds/s aggregate ceiling: Spark's
higher-order functions (``transform``/``aggregate``/``zip_with``) are
interpreted per element and never enter whole-stage codegen, so the
encoding didn't matter. These helpers run the IDENTICAL IEEE-754
float64 operation sequence through numpy instead (Arrow-batched,
C-loop vectorized — the multimodal family's sanctioned pattern), which
is bit-equal by construction:

  - float32 → float64 widening is exact;
  - a float32×float32 product carries ≤48 significant bits, so the
    float64 multiply is EXACT (same value the JVM / DuckDB DOUBLE
    multiply produces);
  - ``* 1e12`` and ``+ 0.5`` each perform one identically-rounded
    float64 op in the same order as the SQL text
    ``CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12 + 0.5d``;
  - ``floor`` and the int64 cast are exact (terms ≤ ~1e13 ≪ 2^53);
  - the int64 term sum is exact, hence order-independent — the one
    property the whole grid exists for;
  - the final ``dot / sqrt(nrm)`` (ranking) and
    ``floor(dot / sqrt(na*nb) * 1e9 + 0.5)`` (reported similarity)
    are the same correctly-rounded float64 divide/sqrt chain on
    identical integers everywhere.

``tests/test_vecnp_cross_engine.py`` pins numpy == JVM == DuckDB on
adversarial values (subnormals, huge/tiny magnitudes, exact .5
boundaries) the same way ``test_vecops_cross_engine.py`` pins the
JVM/DuckDB pair.
"""

from __future__ import annotations

import numpy as np

from .vecops import PROD_SCALE, SIM_SCALE

# Cap on elements materialized per quantized-product block:
# rows_per_chunk * n_candidates * dim ≤ _CHUNK_ELEMS. 4e6 f64 elements
# ≈ 32 MB — small enough that 32 concurrent Python workers stay far
# from executor memory, large enough to amortize numpy dispatch.
_CHUNK_ELEMS = 4_000_000


def dots_q(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact quantized dot products of every row of ``X`` (b×d float64)
    against every row of ``C`` (c×d float64) → (b×c) int64.

    Twin of ``vecops.dot_q_expr`` / ``sql_dot_q`` for EQUAL-length
    well-formed pairs (callers handle the NULL-on-length-mismatch rule
    by bucketing — a mismatched pair never reaches this kernel).
    Chunked over rows so peak scratch stays ≤ ``_CHUNK_ELEMS`` floats.
    """
    b, d = X.shape
    c = C.shape[0]
    out = np.empty((b, c), dtype=np.int64)
    if d == 0:
        # zip_with over two empty arrays folds to the zero element
        out[:] = 0
        return out
    step = max(1, _CHUNK_ELEMS // max(1, c * d))
    for i in range(0, b, step):
        # (chunk, c, d): x*y exact, *1e12 and +0.5 rounded identically
        # to the SQL chain, floor, exact int64 cast + sum
        p = X[i : i + step, None, :] * C[None, :, :]
        p *= float(PROD_SCALE)
        p += 0.5
        np.floor(p, out=p)
        out[i : i + step] = p.astype(np.int64).sum(axis=2)
    return out


def nrm_q(X: np.ndarray) -> np.ndarray:
    """Exact quantized self-dot (norm) per row of ``X`` (b×d float64)
    → int64 vector. Twin of ``dot_q_expr(e, e)``."""
    b, d = X.shape
    if d == 0:
        return np.zeros(b, dtype=np.int64)
    p = X * X
    p *= float(PROD_SCALE)
    p += 0.5
    np.floor(p, out=p)
    return p.astype(np.int64).sum(axis=1)


def cos_scores(dots: np.ndarray, cnrm: np.ndarray) -> np.ndarray:
    """Assignment-ranking cosine: ``CAST(dot AS DOUBLE) /
    sqrt(CAST(cnrm AS DOUBLE))`` for a (b×c) int64 dot matrix and a
    length-c positive int64 norm vector. Callers guarantee cnrm > 0
    (the ``cnrm > 0`` CASE guard lives in the candidate masking)."""
    return dots.astype(np.float64) / np.sqrt(cnrm.astype(np.float64))


def sim_q9(dots: np.ndarray, na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Reported pair similarity on the 1e9 grid: twin of
    ``vecops.cosine_q_expr`` for positive norms — ``floor(
    CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
    * 1e9 + 0.5)`` as int64. ``na``/``nb`` broadcast against ``dots``
    (callers pass ``na[:, None]`` / ``nb[None, :]`` for a pair block);
    zero/NULL norms never reach this kernel (masked by callers, as the
    SQL CASE guard returns NULL for them)."""
    s = dots.astype(np.float64) / np.sqrt(
        na.astype(np.float64) * nb.astype(np.float64)
    )
    s *= float(SIM_SCALE)
    s += 0.5
    np.floor(s, out=s)
    return s.astype(np.int64)


def top_ids_stable(scores: np.ndarray, ids: np.ndarray, top: int) -> np.ndarray:
    """Per-row top-``top`` candidate ids under the similarity family's
    total order (cos DESC NULLS LAST, id ASC) → (b × min(top, c))
    int64.

    ``scores`` is (b×c) float64 with NULL encoded as ``-inf`` (cos is
    never a real -inf: it is int/sqrt(positive int), finite; and never
    -0.0: a zero dot casts to +0.0). ``ids`` must be sorted ascending —
    a STABLE argsort on ``-scores`` then resolves every tie (including
    NULL-vs-NULL) to the lower id, exactly the SQL window's
    ``ORDER BY cos DESC NULLS LAST, id ASC``.
    """
    order = np.argsort(-scores, axis=1, kind="stable")[:, :top]
    return ids[order]
