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
# Round-12 head (r11 verdict items 2/4 + the five ADVICE fixes): one
# new ANN tier (residual IVFPQ — the full Jégou IVFADC shape, the
# documented next knob), five RECHECKs from the ADVICE robustness
# fixes (all semantics-visible: the temperature mixture now LEFT-joins
# so zero-kept languages surface as n_kept=0; k-core re-applies the
# degree>=k gate on emit; the HLL linear-counting branch reads a
# shared Python-literal integer lookup instead of engine log(); the
# substring-span gram key widened to the full md5 as two BIGINTs —
# spans + the cut emit both re-queued), and the rotation drains 32 of
# the 41 r6-age queries, leaving 9 in the tail (goal was ≤20).  All
# 12 CONTROLS keep window slots, as always.
ROUND12_NEW: list[str] = [
    # residual-encoding IVF+PQ (the full Jégou IVFADC shape, r11
    # verdict item 4): per-cell sub-codebooks quantize u − cunit(cell)
    # and the ADC score adds a per-cell offset — oracle-checked
    # end-to-end by widening every key of the proven PQ chain with the
    # cell; recall vs the no-residual tier recorded in the docstring
    "sim_ivfpq_residual_topk",
]

#: Queries edited this round (new plan shape or new result dtype) —
#: locally re-verified vs DuckDB, re-queued for driver evidence at the
#: head of the window.
RECHECK_CHANGED: list[str] = [
    # ADVICE r12: zero-kept languages now emitted with n_kept=0
    # (LEFT join + coalesce in both engines)
    "pipeline_temperature_mixture",
    # ADVICE r12: final aggregate re-applies degree >= k so a
    # non-converged peel drops rather than mis-reports
    "graph_kcore_membership",
    # ADVICE r12: linear-counting branch flipped onto the
    # _HLL_LC_USERS Python-literal lookup — no engine libm
    "sketch_hll_mulmod_merge",
    # ADVICE r12: gram key widened to the full md5 as two 60-bit
    # BIGINTs (collision-safe at 10^9+ grams); both the span listing
    # and its cut-applied consumer re-queued
    "dedup_substring_spans",
    "dedup_cut_spans_emit",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

#: r12 (r11 verdict item 2): 32 of the 41 queries whose newest driver
#: green is r6 — alphabetical order; the remaining 9 (tpch_q16 through
#: w2, alphabetically last) drain in r13.  All unchanged since their
#: last green and locally re-verified every run by test_oracle_parity.
RECONFIRM_ROTATION: list[str] = [
    "dedup_survivorship_funnel",
    "dq_completeness_profile",
    "dq_contamination_scorecard",
    "dq_distribution_drift",
    "dq_quarantine_mart",
    "events_audience_overlap",
    "graph_pagerank",
    "j2_customers_with_orders",
    "j3_customers_without_orders",
    "j4_customer_order_counts",
    "j5_nations_with_both",
    "j6_nations_customers_only",
    "j7_union_acctbal_ledger",
    "j8_brand_supplier_revenue",
    "mart_scd2_user_state",
    "mm_feature_extract",
    "mm_frame_sample",
    "pipeline_curriculum_order",
    "pipeline_weighted_sample",
    "text_bigram_logprob",
    "text_bigram_topk",
    "text_char_entropy",
    "text_fingerprint",
    "text_langid",
    "text_langid_confusion",
    "text_quality",
    "text_regex_token_stats",
    "text_stats",
    "tpch_q10_returned_revenue",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
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
    ROUND12_NEW + RECHECK_CHANGED + RECONFIRM_STALE
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
