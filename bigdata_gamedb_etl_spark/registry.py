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
    pipeline, behavior, core, sqlqueries, windows, joins,
]

# Order matters: the driver's correctness gate checks a bounded prefix
# (50 entries) of this registry.  Round-3 head: the 24 queries that have
# never had a driver row in r1 or r2 (the window covered 98 of 122),
# then the 3 queries whose r2 row was red and is fixed this round
# (HUGEINT oracle casts for sess1/q12; array-column serialization for
# mm_feature_extract), then every round-3 addition (never checked by
# definition), then r1/r2-green controls to fill the window.  Controls
# pushed past position 50 by new additions simply rotate back later —
# they already have green rows.
NEVER_CHECKED_R2 = [
    "text_gopher_quality", "text_pii_scrub", "text_vocab_coverage",
    "text_unigram_logprob", "mart_put_script", "w8_range_frame_hourly",
    "dedup_decontaminate", "dedup_incremental_pairs",
    "dedup_boilerplate_lines", "dq_orders_profile",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q11_important_stock", "tpch_q20_excess_shippers",
    "sql_variant_props_stats", "funnel_user_conversion",
    "cohort_weekly_retention", "anomaly_daily_zscore",
    "j9_salted_segment_revenue",
    "pipeline_training_examples", "pipeline_stratified_sample",
    "pipeline_pack_sequences", "pipeline_domain_mixture",
    "sim_sq8_topk",
]

REFIXED_R3 = [
    "sess1_user_sessions", "tpch_q12_priority_by_status",
    "mm_feature_extract",
]

# New queries added in round 3 — inserted ahead of controls so they get
# a driver row the same round they land.
ROUND3_NEW: list[str] = [
    "text_chunk_udtf",
    "dq_referential_integrity",
    "sketch_cm_heavy_hitters",
    "pipeline_train_val_test",
    "seq_markov_transitions",
    "sess3_top_paths",
    "p7_winsorized_value",
    "w9_sliding_active_users",
    "j10_basket_part_pairs",
    "dedup_editdist_names",
    "sketch_approx_topk_tokens",
]

CONTROLS = [
    "tpch_q1_pricing_summary", "tpch_q3_top_revenue_orders",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "a1_word_revenue", "a4_price_bin_acctbal",
    "w1_pareto_supplier_share", "j1_region_revenue",
    "sql_word_price_stats", "mart_supplier_summary",
    "ga2_cube_segment_priority", "p3_latest_event_per_user",
    "o6_seeded_sample",
]

PRIORITY = NEVER_CHECKED_R2 + REFIXED_R3 + ROUND3_NEW + CONTROLS


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
