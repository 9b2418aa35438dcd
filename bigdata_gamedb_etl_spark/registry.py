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
# Round-13 head (r12 verdict item 2): no new queries this round — the
# §2 surface has been complete since r11 and round 13's mandate is
# perf evidence (the quiet bench) — so the whole window goes to
# draining the evidence-age tail: the last 9 r6-age queries (the r12
# rotation's declared remainder) plus all 29 r7-age queries, which
# exactly fills the 50-slot window alongside the 12 CONTROLS and
# brings every registered query's newest driver evidence to r8+.
ROUND13_NEW: list[str] = []

#: Queries edited this round (new plan shape or new result dtype) —
#: locally re-verified vs DuckDB, re-queued for driver evidence at the
#: head of the window.  (The other r13 edits — assert → ValueError,
#: two bench-harness fixes, the nprobe parameterization with an
#: unchanged default — change no query plan or dtype.)
RECHECK_CHANGED: list[str] = [
    # r13: the linear-counting lookup flipped from the r12 broadcast
    # join to element_at over the same literal array — verified
    # row-identical locally, but the plan shape changed (the broadcast
    # exchange is gone), so it re-queues; w6_customer_rank_in_segment
    # moved out to the r14 rotation to keep the window at 50.
    "sketch_hll_mulmod_merge",
    # r13 PQ resolution bump (PQ_M 16 → 32, 2-dim sub-codes): the
    # nprobe + Lloyd-budget ladders localized the sf0.1 recall
    # ceiling to code resolution, and halving the subspace width
    # raised recall at every (SF, tier) point (matrix in the PQ_M
    # note).  Results of all three PQ-backed queries change; their
    # DuckDB chains read the same constants so parity re-derives —
    # locally re-verified, re-queued here.  text_novelty_rate, w4,
    # and w5 moved out to the r14 rotation to keep the window at 50.
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_ivfpq_residual_topk",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

#: r13: the 9 remaining r6-age queries (newest driver green r6),
#: then all 29 r7-age queries — alphabetical within each age band so
#: the drain order is auditable.  All unchanged since their last green
#: and locally re-verified every run by test_oracle_parity.
RECONFIRM_ROTATION: list[str] = [
    # r6-age (the r12 verdict's named tail)
    "tpch_q16_supplier_cardinality",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume",
    "tpch_q19_disjunctive",
    "tpch_q21_sole_returned",
    "tpch_q22_dormant_rich",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "w2_top_customers_per_nation",
    # r7-age
    "asof_purchase_click",
    "behavior_conversion_lag",
    "dedup_bloom_prefilter",
    "dedup_cluster_assign",
    "dedup_exact_keeper",
    "dedup_exact_md5",
    "dedup_ngram_jaccard_pairs",
    "dedup_semantic_decontaminate",
    "dedup_shingle_docfreq_hist",
    "dq_duplicate_rate_by_source",
    "dq_event_conformity",
    "events_user_gini",
    "graph_component_sizes",
    "graph_degree_distribution",
    "graph_neighbor_jaccard",
    "interval_error_click_burst",
    "mart_nation_customer_map",
    "mm_payload_meta",
    "mm_resize",
    "p6_statistical_moments",
    "pipeline_dataset_card",
    "rollup_event_time_grain",
    "seq_markov_entropy",
    "sess2_session_window",
    "text_hapax_profile",
    # text_novelty_rate, w4_daily_event_rollup, w5_value_delta_per_
    # user, w6_customer_rank_in_segment: displaced to r14 by the four
    # r13 RECHECKs (window capped at 50); their r7 greens stand and
    # test_oracle_parity re-verifies them every run.
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
    ROUND13_NEW + RECHECK_CHANGED + RECONFIRM_STALE
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
