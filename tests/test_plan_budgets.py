"""Bulk plan-shape budgets for the whole batch corpus (VERDICT r4
next-round item #4): every registered non-streaming query gets a frozen
ceiling on shuffle exchanges and Arrow/pandas stages, plus corpus-wide
bans on the pathological physical operators. The ~50 hand-written
guards in test_plans.py pin specific shapes (which join broadcasts,
where rank pushdown lands); this file pins the BUDGET, so any future
edit that adds a shuffle, drops to row-at-a-time Python, or goes
quadratic fails loudly for all 107 oracle-checkable queries, not just
the hand-audited ones.

Budgets were measured from the current plans at BOTH sf0.001 and
sf0.01 — identical at both scales, so they are static-plan
properties, not statistics artifacts. Iterative operators (connected
components q54, PageRank q69, k-means q66) legitimately repeat their
per-round exchanges in one explain string, hence the
large-but-frozen ceilings. The r6 q17 swap (count-based hot-bucket
routing over a persisted bands frame) adds one count-aggregate
exchange to q17's subtree and makes its InMemoryRelation block print
inner-plan exchanges in every consumer's explain text
(q19/q54/q68/q69/q77/q91/q101) — their ceilings were re-measured and
re-frozen then (plan-TEXT counts; the cached subtree executes once).

The r15 minhash-scan widen + band-alignment was tried and REVERTED
(clean interleaved A/B, Q17ALIGN_AB_r15.json: the widen shuffles the
text payload to parallelize a cheap md5 pass and the alignment moves
more bytes than the partial-aggregated hot-bucket exchange it elides);
the family ceilings below are the pre-widen values, re-verified.

Streaming-tagged specs are excluded: their build() executes a bounded
drain and returns a memory-table result, so the interesting plan is
the streaming one — pinned by tests/test_streaming_differential.py.
"""

from __future__ import annotations

import re

import pytest

from spark_sql_pubsub_connector_spark.plans import all_specs

from .test_plans import plan_of

SPECS = all_specs()

# name -> (max shuffle exchanges, max Arrow/pandas stages)
BUDGETS = {
    "q01_pricing_summary": (1, 0),
    "q02_projection_cast": (0, 0),
    "q03_filter_predicate": (0, 0),
    "q04_union_streams": (1, 0),
    "q05_distinct": (1, 0),
    "q06_topk_per_group": (1, 0),
    "q07_join_broadcast": (1, 0),
    "q08_join_shuffle_agg": (2, 0),
    "q09_semi_join": (1, 0),
    "q100_large_orders": (1, 0),
    "q101_minhash_calibration": (3, 0),
    "q102_clean_corpus_report": (2, 0),
    "q103_mixture_rebalance": (4, 0),
    "q104_ngram_diversity": (0, 0),
    "q105_conversion_latency": (12, 0),  # r15 persist text-count, see q72 note
    "q106_grouping_sets": (1, 0),
    "q107_longest_run": (1, 0),
    "q108_hll_by_source": (5, 0),  # r15 persist text-count, see q72 note
    "q109_containment_dedup": (2, 0),
    "q10_anti_join": (1, 0),
    "q110_langid_eval": (10, 0),
    "q111_ivf_recall": (5, 0),
    "q112_mm_arrow_hist": (1, 1),
    "q113_robust_length_stats": (2, 0),
    "q114_context_windows": (0, 0),
    "q11_rollup": (1, 0),
    "q12_scalar_funcs": (0, 0),
    "q13_from_json": (1, 0),
    "q14_window_tumbling": (1, 0),
    "q15_sessionize": (1, 0),
    "q16_dedup_exact": (1, 0),
    "q17_dedup_minhash_lsh": (3, 0),
    "q18_dedup_simhash": (1, 0),
    "q19_dedup_ngram_jaccard": (3, 0),
    "q20_knn_bruteforce": (1, 0),
    "q21_ann_lsh": (1, 0),
    # r10 vectorized two-level form (r11: codebook UNCAPPED at
    # k = ⌈n/256⌉): the ≈k-row codebook is a driver-side collect
    # (never in this plan), the mapInPandas assignment is map-only,
    # and the only exchanges are the groupBy(cell) feeding
    # applyInPandas pair scoring + the final distinct = 2. Python
    # stages: exactly the two Arrow ones.
    "q22_embedding_neardup": (2, 2),
    "q23_text_stats": (1, 0),
    "q24_langid": (3, 0),
    "q25_token_counts": (1, 0),
    "q26_fingerprint_rolling": (0, 0),
    "q27_mm_decode_meta": (0, 1),
    "q28_mm_image_meta": (0, 1),
    "q29_mm_frame_sample": (0, 1),
    "q34_collection_funcs": (0, 0),
    "q35_cube": (1, 0),
    "q36_above_cust_avg": (1, 0),
    "q37_date_funcs": (0, 0),
    "q38_pivot_status": (2, 0),
    "q39_percentiles": (1, 0),
    "q40_skewed_agg_salted": (2, 0),
    "q41_set_ops": (4, 0),
    "q42_global_topk": (0, 0),
    "q43_fuzzy_type_match": (2, 0),
    "q44_decontaminate": (5, 0),
    "q45_stratified_sample": (0, 0),
    "q46_sequence_packing": (4, 0),
    "q47_dedup_canonical_map": (1, 0),
    "q49_ivf_assign": (1, 0),
    "q51_term_scrub": (0, 0),
    "q52_quality_filter": (0, 0),
    "q53_repetition_ngrams": (2, 0),
    "q54_dedup_clusters": (2, 0),
    "q55_asof_join": (1, 0),
    "q56_boilerplate_coverage": (2, 0),
    "q57_int8_quantize": (0, 0),
    "q58_tfidf_rarity": (4, 0),
    "q59_range_join_bucketed": (0, 0),
    "q60_window_sliding": (1, 0),
    "q61_ivf_probe_search": (1, 0),
    "q62_mm_resize": (0, 1),
    "q64_class_balanced_cap": (1, 0),
    "q65_skew_join_salted": (3, 0),
    "q66_kmeans_update": (1, 0),
    "q67_bigram_lm": (3, 0),
    "q68_dedup_savings": (5, 0),
    "q69_pagerank_centrality": (56, 0),
    "q70_session_funnel": (1, 0),
    "q71_retention_cohorts": (3, 0),
    # r15 persists (shared vocab/gram frames): InMemoryRelation blocks
    # re-list their inner exchanges in plan TEXT; executed exchanges
    # went DOWN (the duplicated corpus pass is gone) — see plans/r15
    "q72_cms_token_freq": (4, 0),
    "q73_hll_distinct": (4, 0),
    # 18 in TEXT since r15: keys/probe/ppos persist (each was executed
    # 3-4x before), and each InMemoryRelation block re-lists its inner
    # exchanges; executed exchanges dropped ~3x (see plans/r15)
    "q74_bloom_semijoin": (18, 0),
    "q75_gapfill_ffill": (2, 0),
    "q76_random_projection": (0, 0),
    "q77_triangle_clustering": (64, 0),
    "q78_lm_doc_score": (4, 0),
    "q79_source_mixture": (3, 0),
    "q80_bpe_merge_candidates": (2, 0),
    "q81_histogram_quantiles": (6, 0),
    "q82_pq_codes": (0, 0),
    "q83_pq_adc_search": (2, 0),
    "q84_source_overlap_matrix": (6, 0),
    "q85_hourly_anomalies": (2, 0),
    "q86_session_paths": (2, 0),
    "q87_dedup_delta_index": (6, 0),
    "q88_chunk_dedup": (2, 0),
    "q89_zorder_layout": (4, 0),
    "q90_matryoshka_recall": (1, 0),
    # 7 standalone; 9 once a sibling (q95/q101) has persisted the
    # shared shingle-sets frame in the same session — the cache
    # manager swaps q91's identical subtree for the InMemoryRelation,
    # whose printed block re-lists its inner exchanges (plan-TEXT
    # count; the cached subtree executes once — the r6 q17 precedent)
    "q91_blocking_eval": (9, 0),
    "q92_shipping_priority": (1, 0),
    "q93_regional_revenue": (3, 0),
    "q94_source_drift": (8, 0),
    "q95_lsh_tuning": (10, 0),
    "q96_mm_audio_features": (0, 1),
    "q97_reshard_advisor": (2, 0),
    "q98_skew_profile": (6, 0),
    "q99_novelty_curve": (5, 0),  # r15 persist text-count, see q72 note
}

# Queries where a BroadcastNestedLoopJoin is the intended plan: a
# metadata-sized side (corpus totals, a literal parameter grid, a
# one-row threshold) cross-joined onto every row — constant fan-out,
# never data x data.
BNLJ_OK = {
    "q103_mixture_rebalance",
    "q111_ivf_recall",
    "q20_knn_bruteforce",
    "q73_hll_distinct",
    "q74_bloom_semijoin",
    "q79_source_mixture",
    "q81_histogram_quantiles",
    "q83_pq_adc_search",
    "q87_dedup_delta_index",
    "q89_zorder_layout",
    "q90_matryoshka_recall",
    "q94_source_drift",
    "q95_lsh_tuning",
    "q98_skew_profile",
}

_PY_STAGES = ("MapInPandas", "MapInArrow", "FlatMapGroupsInPandas", "ArrowEvalPython")


def _batch_specs():
    return sorted(n for n, s in SPECS.items() if "streaming" not in s.tags)


def test_budget_table_covers_exactly_the_batch_corpus():
    assert sorted(BUDGETS) == _batch_specs()


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_plan_within_budget(spark, sf_dir, name):
    sx_max, py_max = BUDGETS[name]
    plan = plan_of(spark, sf_dir, name, mode="simple")
    assert "CartesianProduct" not in plan, f"{name}: quadratic pair space"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
        raise AssertionError(f"{name}: unplanned BroadcastNestedLoopJoin")
    sx = len(
        re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )
    assert sx <= sx_max, f"{name}: {sx} shuffle exchanges > budget {sx_max}"
    py = sum(plan.count(t) for t in _PY_STAGES)
    assert py <= py_max, f"{name}: {py} Python stages > budget {py_max}"
