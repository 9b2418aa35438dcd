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
# Round-10 head (r9 verdict items 1/4/6): zero reds and an all-green
# fleet make this round an EVIDENCE-FRESHNESS round — NEW + RECHECK
# landed at the 8-slot budget ceiling (3 new + 5 rechecks from the
# minhash/ANN oracle-backing), leaving 30 rotation slots: the entire
# r4-age tail plus the oldest 21 of the 40 r5-age queries (the
# remaining 19 queue for round 11).  All 12 CONTROLS keep window
# slots, as always.
ROUND10_NEW: list[str] = [
    # label-propagation communities over the near-dup graph: splits
    # weakly-bridged components into dense cores; fixed synchronous
    # rounds + min tie-break make it deterministic and its oracle an
    # unrolled-CTE mode-per-neighborhood (r9 verdict item 6)
    "graph_lpa_communities",
    # per (bands, jaccard-decile) LSH recall vs the exact pair set —
    # the measured S-curve behind the band ladder's aggregate recall
    # (r9 verdict item 6: "recall against ground truth makes the
    # ladder decision-grade")
    "dedup_lsh_recall_by_jaccard",
    # IVF ANN with an exact-integer Lloyd codebook — the first ANN
    # tier whose FIT is oracle-checked, not just its scoring; proves
    # the machinery for flipping the MLlib family in a later round
    "sim_ivf_int_topk",
]

#: Queries edited this round (new plan shape or new result dtype) —
#: locally re-verified vs DuckDB, re-queued for driver evidence at the
#: head of the window.
RECHECK_CHANGED: list[str] = [
    # r9 verdict item 4 — the whole minhash surface moved from the
    # Spark-native xxhash64 permutations to the cross-engine md5
    # mulmod family and from lossy 32-bit band hashes to lossless
    # band keys; all three now carry full oracles (previously
    # rows-only)
    "dedup_minhash_lsh_pairs",
    "dedup_lsh_band_ladder",
    "dedup_lsh_cluster_assign",
    # r9 ADVICE — recall denominator is now min(TOP_K, corpus size)
    # via the exact result's own row count
    "sim_ivf_recall_curve",
    # r10 — hyperplane LSH rebased on ±1 planes over quantized-integer
    # embeddings; the bucket index is engine-exact and the op moves
    # from rows-only to oracle-backed
    "sim_ann_lsh_topk",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

#: r10: spare window capacity refreshes the OLDEST driver evidence —
#: the full r4-age tail (9, including the three rotations r9's late
#: additions displaced) plus the alphabetically-first 21 of the 40
#: r5-age queries.  All unchanged since their last green and locally
#: re-verified every run by test_oracle_parity.
RECONFIRM_ROTATION: list[str] = [
    # r4-age tail
    "sess1_user_sessions",
    "sketch_approx_topk_tokens",
    "sketch_cm_heavy_hitters",
    "tpch_q12_priority_by_status",
    "tpch_q20_excess_shippers",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "w8_range_frame_hourly",
    "w9_sliding_active_users",
    # oldest 21 of the r5-age batch (rest queue for r11)
    "a10_retailprice_histogram",
    "a11_size_histogram",
    "a12_brand_type_revenue",
    "a17_percentiles",
    "a17b_approx_aggregates",
    "a2_supplier_metrics",
    "a3_year_trend",
    "a5_top_supplier",
    "a9_month_distribution",
    "attribution_last_touch",
    "churn_activity_flags",
    "dedup_normalized_keeper",
    "dedup_repeated_ngram_share",
    "dq_freshness_lag",
    "dq_key_skew_profile",
    "ga1_rollup_region_nation",
    "ga3_grouping_sets_margins",
    "graph_2hop_reach",
    "graph_triangle_count",
    "j11_acctbal_band_join",
    "mart_customer_profile",
    # (mart_incremental_refresh and mart_nation_customer_index
    # displaced by sim_ann_lsh_topk's recheck slot and
    # sim_ivf_int_topk's new slot; they queue for round 11 with the
    # rest of the r5 batch)
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
    ROUND10_NEW + RECHECK_CHANGED + RECONFIRM_STALE
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
