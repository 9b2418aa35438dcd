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
# Round-14 head: no new queries (the §2 surface has been complete
# since r11; round 14 is the first OPTIMIZATION round).  The window
# takes the 11 plan-changed rechecks (4 broadcast-discipline + 7
# IVF/PQ-family materialization, all value-identical and locally
# re-verified), then the full 6-query r7-age band (the 4 queries the
# r13 RECHECKs displaced plus the 2 sketch queries the r13 head
# comment under-counted), then the 21 alphabetically-first r8-age
# queries — 11 + 27 + 12 CONTROLS = 50.  The 25 remaining r8-age
# queries rotate in r15; their r8 greens stand and test_oracle_parity
# re-verifies them every run.
ROUND14_NEW: list[str] = []

#: Queries edited this round (new plan shape or new result dtype) —
#: locally re-verified vs DuckDB, re-queued for driver evidence at the
#: head of the window.
RECHECK_CHANGED: list[str] = [
    # r14 broadcast-discipline sweep (r13 verdict item 6 + nit): the
    # LM scoring join now carries an explicit F.broadcast on the
    # model side (the planner's stats-based choice could flip to
    # sort-merge past the size threshold — see the textops module
    # note), and the three single-row-aggregate crossJoins that
    # leaned on AQE (dq_k_anonymity's total, graph_triangle_count's
    # node counts, sim_ivf_recall_curve's candidate count) are
    # broadcast-hinted like every other total-attach.  Results are
    # value-identical (join semantics unchanged) — locally
    # re-verified vs DuckDB — but the static plan shape changed, so
    # all four re-queue; test_plan_quality.py pins the new shapes.
    "text_bigram_logprob",
    "dq_k_anonymity",
    "graph_triangle_count",
    "sim_ivf_recall_curve",
    # r14 optimization sweep (guide §5): the IVF/PQ family now
    # materializes its fit/serving intermediates (localCheckpoint
    # barriers on the train slice, full-corpus assignment, unit
    # corpus, and subspace explodes), each Lloyd round aggregates in
    # ONE exchange instead of posexplode + two, and the serving tiers
    # derive the query's unit vector driver-side from the coarse
    # qrow; sim_semdedup_prune materializes its assignment stage.
    # Row-identical at sf0.001/0.01/0.1 vs DuckDB (verified this
    # round, plus a vanilla-session driver-contract sweep), but every
    # serving plan changed shape (parquet scans → ExistingRDD
    # barriers), so all seven re-queue; the displaced r8-age rotation
    # names move to r15 (see RECONFIRM_ROTATION).
    "sim_pq_topk",
    "sim_ivf_topk",
    "sim_ivf_multiprobe_topk",
    "sim_ivf_int_topk",
    "sim_ivf_pq_topk",
    "sim_ivfpq_residual_topk",
    "sim_semdedup_prune",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

#: r14: the full 6-query r7-age band (newest driver green r7), then
#: the 28 alphabetically-first r8-age queries — alphabetical within
#: each age band so the drain order is auditable (dq_k_anonymity is
#: r8-age but rides in RECHECK_CHANGED above).  All unchanged since
#: their last green and locally re-verified every run by
#: test_oracle_parity.
RECONFIRM_ROTATION: list[str] = [
    # r7-age: the 4 queries the r13 RECHECKs displaced plus
    # sketch_daily_merge_total / sketch_users_per_type (newest
    # evidence r7 — the r13 head comment's "29 r7-age" under-count
    # missed them; computed from the CORRECTNESS_r*.json union).
    "sketch_daily_merge_total",
    "sketch_users_per_type",
    "text_novelty_rate",
    "w4_daily_event_rollup",
    "w5_value_delta_per_user",
    "w6_customer_rank_in_segment",
    # r8-age (21 of 46; the remaining 25 — the 7 displaced below plus
    # sim_knn_top1 … w3_moving_avg_events — rotate in r15.  The 7
    # r14-optimization RECHECKs displaced the alphabetically-last 7
    # of the original 28: pipeline_split_contamination,
    # rfm_customer_segments, sim_centroid_outliers,
    # sim_cosine_dup_pairs, sim_cosine_topk, sim_dim_variance_profile,
    # sim_kmeans_lloyd_step — all unchanged since their r8 green and
    # re-verified locally every run by test_oracle_parity.)
    "a13_global_totals",
    "a14_year_avg_price",
    "a8_word_count_stats",
    "dedup_cluster_assign_star",
    "dedup_semantic_fused_pairs",
    "dq_source_quality_drift",
    "f1_date_parts",
    "f2_string_funcs",
    "funnel_user_conversion",
    "graph_clustering_coeff",
    "mm_audio_meta",
    "p4_user_value_mad",
    "p5_lineitem_profile",
    "p7_winsorized_value",
    "pipeline_clean_corpus",
    "pipeline_corpus_emit",
    "pipeline_epoch_shuffle",
    "pipeline_leakage_safe_split",
    "pipeline_mixture_reweight",
    "pipeline_pack_attention_spans",
    "pipeline_source_cards",
]

CONTROLS = [
    "tpch_q1_pricing_summary", "tpch_q3_top_revenue_orders",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "a1_word_revenue", "a4_price_bin_acctbal",
    "w1_pareto_supplier_share", "j1_region_revenue",
    "sql_word_price_stats", "mart_supplier_summary",
    "ga2_cube_segment_priority", "p3_latest_event_per_user",
]

PRIORITY = (
    ROUND14_NEW + RECHECK_CHANGED + RECONFIRM_STALE
    + RECONFIRM_ROTATION + CONTROLS
)


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
