"""Property tests for operator-construction lemmas (pure Python — no
SparkSession), covering the invariants the plan-level operators rely
on but that tiny fixture data exercises only thinly:

  1. range-join bucketing (q59): with bucket width >= range, a
     qualifying (left, right) pair matches in EXACTLY one of the right
     side's two probe buckets (no lost pairs, no duplicates), and a
     non-qualifying pair matches in none after the exact predicate.
  2. as-of ordering (q55): the strictly-prior composite order
     (ts, event_id) picks a unique deterministic partner whenever any
     candidate exists.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

RANGE_US = 1_800_000_000
BUCKET_US = 1_800_000_000

ts_strategy = st.integers(min_value=0, max_value=10**15)


def _bucket(ts: int) -> int:
    return ts // BUCKET_US


@given(e_ts=ts_strategy, p_ts=ts_strategy)
@settings(max_examples=500, deadline=None)
def test_range_join_bucket_lemma(e_ts, p_ts):
    """Mirror of q59's construction: the error row lands in buckets
    {b, b+1}; the purchase probes its own bucket. A pair passing the
    exact predicate (0 <= p_ts - e_ts <= RANGE) must match exactly one
    exploded bucket row; a failing pair contributes nothing after the
    predicate."""
    err_buckets = {_bucket(e_ts), _bucket(e_ts) + 1}
    bucket_matches = 1 if _bucket(p_ts) in err_buckets else 0
    qualifies = 0 <= p_ts - e_ts <= RANGE_US
    if qualifies:
        # width >= range ⇒ bucket(p) ∈ {bucket(e), bucket(e)+1}
        assert bucket_matches == 1
    # a pair is never produced twice: the two probe buckets are
    # distinct, and p has one bucket, so at most one row matches
    assert bucket_matches <= 1


@given(
    st.lists(
        st.tuples(ts_strategy, st.integers(min_value=0, max_value=10**6)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],  # event_id unique
    ),
    ts_strategy,
    st.integers(min_value=10**6 + 1, max_value=2 * 10**6),
)
@settings(max_examples=200, deadline=None)
def test_asof_strictly_prior_partner_is_unique(clicks, p_ts, p_id):
    """q55's frame (order by (ts, event_id), UNBOUNDED..1 PRECEDING)
    must select the max candidate under the composite order among
    clicks strictly before the purchase — unique because event_ids
    are unique, and independent of input ordering."""
    candidates = [(ts, eid) for ts, eid in clicks if (ts, eid) < (p_ts, p_id)]
    if not candidates:
        return
    expected = max(candidates)
    # simulate the window: sort all rows by composite key, walk to the
    # purchase position, take the last click seen before it
    rows = sorted([(ts, eid, "click") for ts, eid in clicks] + [(p_ts, p_id, "purchase")])
    last_click = None
    for ts, eid, kind in rows:
        if kind == "purchase" and eid == p_id:
            break
        last_click = (ts, eid)
    assert last_click == expected


# ---------------------------------------------------------------------------
# q54's convergence algorithm, validated against union-find ground truth
# ---------------------------------------------------------------------------
def _cc_fixpoint(nodes, edges):
    """Pure-Python mirror of q54's iteration: min over {self} ∪
    neighbor labels, then pointer jumping (label := label(label)),
    until sum(labels) stops decreasing. Returns labels and rounds."""
    sym = edges | {(b, a) for a, b in edges}
    lab = {n: n for n in nodes}
    prev = sum(lab.values())
    rounds = 0
    while True:
        rounds += 1
        merged = dict(lab)
        for src, dst in sym:
            if lab[dst] < merged[src]:
                merged[src] = lab[dst]
        lab = {n: merged[merged[n]] for n in nodes}  # pointer jump
        cur = sum(lab.values())
        if cur == prev:
            return lab, rounds
        prev = cur


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min node of each component
    return {n: find(n) for n in nodes}


@given(
    st.integers(min_value=1, max_value=60).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.sets(
                st.tuples(
                    st.integers(min_value=0, max_value=n - 1),
                    st.integers(min_value=0, max_value=n - 1),
                ).filter(lambda p: p[0] != p[1]),
                max_size=80,
            ),
        )
    )
)
@settings(max_examples=300, deadline=None)
def test_cc_min_label_pointer_jumping_matches_union_find(case):
    """q54's distributed algorithm must assign every node the MIN node
    id of its connected component (union-find ground truth), on any
    graph shape — chains, stars, cycles, forests."""
    n, edges = case
    nodes = set(range(n))
    lab, rounds = _cc_fixpoint(nodes, edges)
    truth = _union_find(nodes, edges)
    assert lab == truth
    # pointer jumping keeps rounds logarithmic-ish; a chain of 60
    # nodes must converge far faster than its diameter
    assert rounds <= 12


# --------------------------------------------------------------------------
# q88 chunking lemma
# --------------------------------------------------------------------------
@given(st.integers(min_value=1, max_value=10_000))
@settings(max_examples=300, deadline=None)
def test_chunk_count_covers_every_token_exactly_once(n_tokens):
    """q88's chunk construction: ceil(n/16) chunks of slice(i*16+1, 16)
    partition the token list — every position covered once, the last
    chunk short iff n % 16 != 0."""
    B = 16
    n_chunks = (n_tokens + B - 1) // B
    covered = []
    for i in range(n_chunks):
        start = i * B  # 0-based mirror of the 1-based slice
        covered.extend(range(start, min(start + B, n_tokens)))
    assert covered == list(range(n_tokens))


# --------------------------------------------------------------------------
# q97 rendezvous-hashing lemma
# --------------------------------------------------------------------------
@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=500, deadline=None)
def test_hrw_moves_only_to_the_new_shard(doc_id):
    """Adding shard N to an HRW assignment can only move a key TO the
    new shard (its old scores are unchanged, one candidate is added) —
    the stability property q97 measures. Mirrors the md5-score argmax
    with 1-based positions exactly as both engines compute it."""
    import hashlib

    N = 16
    scores = [hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest() for s in range(N + 1)]
    old = scores[:N].index(max(scores[:N]))
    new = scores.index(max(scores))
    assert new == old or new == N


# --------------------------------------------------------------------------
# q95 banding-nesting lemma
# --------------------------------------------------------------------------
@given(
    st.lists(st.integers(min_value=0, max_value=3), min_size=8, max_size=8),
    st.lists(st.integers(min_value=0, max_value=3), min_size=8, max_size=8),
)
@settings(max_examples=500, deadline=None)
def test_banding_candidates_nest_by_rows_per_band(ma, mb):
    """q95's sweep relies on candidates(r=2k) ⊆ candidates(r=k): if two
    signature vectors agree on some r-wide band, they agree on both of
    its r/2-wide halves. Hence the r=1 candidate set is the union and
    the relative-recall denominator."""

    def agrees(r):
        nb = 8 // r
        return any(
            all(ma[b * r + k] == mb[b * r + k] for k in range(r)) for b in range(nb)
        )

    if agrees(4):
        assert agrees(2)
    if agrees(2):
        assert agrees(1)
