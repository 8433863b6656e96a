"""Unit pins for the ``functions.vecnp`` kernel internals that the
cross-engine differential can't isolate: row-chunking must be
invisible (the q22 assignment batches are far larger than the scratch
cap, so production always crosses chunk boundaries), zero-dim inputs
fold to the zip_with zero element, and the top-k picker's width
contract (min(top, c)) is what the assignment's emit loop relies on.
"""

from __future__ import annotations

import numpy as np

from spark_sql_pubsub_connector_spark.functions import vecnp


def _toy(b: int, c: int, d: int, seed_mul: int = 1) -> tuple:
    # deterministic float32-representable values in the unit-scale
    # contract range, widened exactly as the production path does
    X = (
        ((np.arange(b * d, dtype=np.int64) * 2654435761 * seed_mul) % 2000 - 1000)
        / 997.0
    ).reshape(b, d).astype(np.float32).astype(np.float64)
    C = (
        ((np.arange(c * d, dtype=np.int64) * 40503 * seed_mul) % 2000 - 1000)
        / 997.0
    ).reshape(c, d).astype(np.float32).astype(np.float64)
    return X, C


def test_dots_q_chunking_is_invisible(monkeypatch):
    """Force a tiny chunk cap so a 64-row batch crosses many chunk
    boundaries; the result must equal the unchunked computation."""
    X, C = _toy(64, 7, 16)
    want = vecnp.dots_q(X, C)
    monkeypatch.setattr(vecnp, "_CHUNK_ELEMS", 7 * 16 * 3)  # 3 rows/chunk
    got = vecnp.dots_q(X, C)
    assert got.dtype == np.int64 and np.array_equal(got, want)
    # chunk size that does NOT divide b evenly (tail chunk) too
    monkeypatch.setattr(vecnp, "_CHUNK_ELEMS", 7 * 16 * 5)  # 5 rows/chunk, 64 % 5 != 0
    assert np.array_equal(vecnp.dots_q(X, C), want)


def test_dots_q_and_nrm_q_zero_dim():
    """d=0 (empty embeddings bucket): zip_with over empties folds to
    the zero element on both engines — the kernels must return 0, not
    raise on the empty reduction axis."""
    X = np.empty((3, 0))
    C = np.empty((2, 0))
    assert vecnp.dots_q(X, C).tolist() == [[0, 0], [0, 0], [0, 0]]
    assert vecnp.nrm_q(X).tolist() == [0, 0, 0]


def test_top_ids_stable_width_is_min_top_c():
    """The assignment emit loop sizes np.repeat by picks.shape[1] —
    pin the width contract for top < c, top == c, and top > c."""
    ids = np.array([5, 9], dtype=np.int64)
    scores = np.array([[0.2, 0.8]])
    assert vecnp.top_ids_stable(scores, ids, 1).tolist() == [[9]]
    assert vecnp.top_ids_stable(scores, ids, 2).tolist() == [[9, 5]]
    assert vecnp.top_ids_stable(scores, ids, 4).tolist() == [[9, 5]]  # clamped


def test_sim_q9_broadcasts_pair_block():
    """The pair stage passes na[:, None] against nb[None, :] — the
    kernel must broadcast and keep exact integer grid values."""
    X, _ = _toy(4, 1, 8)
    nr = vecnp.nrm_q(X)
    dots = vecnp.dots_q(X, X)
    sims = vecnp.sim_q9(dots, nr[:, None], nr[None, :])
    assert sims.shape == (4, 4)
    # self-similarity on the 1e9 grid is exactly 1.0 → 1_000_000_000
    # (dot == nrm, floor(nrm/sqrt(nrm*nrm)*1e9 + 0.5) == 1e9)
    assert np.array_equal(np.diag(sims), np.full(4, 1_000_000_000))
    assert np.array_equal(sims, sims.T)  # symmetric inputs, exact grid


def test_cand_set_masks_null_element_vectors():
    """ADVICE r10: a NULL element inside an embedding arrives at the
    numpy layer as NaN, where floor/astype(int64) is platform-defined
    and the int64 term sum can wrap to a bogus positive norm. q22's
    candidate builder must treat such rows exactly like zero-norm
    ones: norm 0, excluded from every per-length score matrix, so
    they can never be picked as a cell or emit a pair."""
    from spark_sql_pubsub_connector_spark.plans.similarity import _nd_cand_set

    good = np.array([1.0, 2.0, 3.0])
    bad = np.array([1.0, np.nan, 3.0])  # NULL slot → NaN
    cs = _nd_cand_set([5, 9], [bad, good])
    pos5 = cs["ids"].tolist().index(5)
    assert cs["nrms"][pos5] == 0  # never reached nrm_q
    idx, M, nr = cs["by_len"][3]
    assert cs["ids"][idx].tolist() == [9]  # only the clean row scores
    assert (nr > 0).all() and not np.isnan(M).any()
