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
# Round-5 head: the round-5 additions, then the 5 round-4 queries that
# were never rotated in (r4's miss — w10/rfm also carry r5 determinism
# and scale fixes), then the 36 queries whose only driver evidence is
# round 1 — the testdata regenerated in r4, so r1 green deserves
# re-confirmation against the new files — then the standing controls.
# Names pushed past position 50 already have green rows and rotate
# back in later rounds (r2-checked queries are next in line).
# Appended in the same commit a query lands (enforced by
# test_every_query_has_driver_evidence_or_is_queued).
ROUND5_NEW: list[str] = [
    "graph_2hop_reach",
    "graph_triangle_count",
    "w11_mom_revenue_growth",
    "dq_freshness_lag",
    "j11_acctbal_band_join",
    "pipeline_feature_hash_profile",
    "attribution_last_touch",
    "w12_cumulative_distinct_users",
    "dedup_repeated_ngram_share",
    "stat_corr_matrix",
    "pipeline_length_buckets",
    "dedup_normalized_keeper",
    "mart_incremental_refresh",
    "dq_key_skew_profile",
    "text_pmi_collocations",
    "sql_window_top_suppliers",
    "graph_pagerank",
    "ts_ohlc_hourly",
    "ga3_grouping_sets_margins",
    "churn_activity_flags",
    "sim_pq_topk",
]

ROUND4_NEW = [
    "ts_gapfill_locf",
    "w10_ewma_monthly_revenue",
    "rfm_customer_segments",
    "text_tfidf_top_terms",
    "pipeline_per_group_sample",
]

# r1-only driver evidence (computed from CORRECTNESS_r01..r04): rotate
# through the window for re-confirmation against the r4+ testdata.
RECONFIRM_R1 = [
    "o6_seeded_sample", "ga1_rollup_region_nation", "w7_ntile_quartiles",
    "f1_date_parts", "f2_string_funcs", "p1_pivot_event_counts",
    "p2_unpivot_charges", "mart_customer_profile",
    "mart_nation_customer_index", "a2_supplier_metrics", "a3_year_trend",
    "a5_top_supplier", "a8_word_count_stats", "a9_month_distribution",
    "a10_retailprice_histogram", "a11_size_histogram",
    "a12_brand_type_revenue", "a13_global_totals", "a14_year_avg_price",
    "a17_percentiles", "a17b_approx_aggregates",
    "sql_supplier_distribution", "sql_json_props_stats",
    "sql_from_json_struct", "w2_top_customers_per_nation",
    "w3_moving_avg_events", "w4_daily_event_rollup",
    "w5_value_delta_per_user", "w6_customer_rank_in_segment",
    "j2_customers_with_orders", "j3_customers_without_orders",
    "j4_customer_order_counts", "j5_nations_with_both",
    "j6_nations_customers_only", "j7_union_acctbal_ledger",
    "j8_brand_supplier_revenue",
]

CONTROLS = [
    "tpch_q1_pricing_summary", "tpch_q3_top_revenue_orders",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "a1_word_revenue", "a4_price_bin_acctbal",
    "w1_pareto_supplier_share", "j1_region_revenue",
    "sql_word_price_stats", "mart_supplier_summary",
    "ga2_cube_segment_priority", "p3_latest_event_per_user",
]

PRIORITY = ROUND5_NEW + ROUND4_NEW + RECONFIRM_R1 + CONTROLS


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
