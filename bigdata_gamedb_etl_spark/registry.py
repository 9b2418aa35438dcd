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

# Order matters: the driver's correctness gate checks a bounded prefix of
# this registry (r1 stopped at 50 entries).  PRIORITY pins the exact head:
# queries with no r1 row (the whole LLM-pipeline surface, p4-p6, and every
# round-2 addition), queries whose r1 row failed and were fixed this round
# (sess1 rounding, mart map canonicalization), and queries whose physical
# plan changed this round (broadcast-hint removal in q3/q5/a4/ga2, plus q1
# as the headline control).  Everything else — already proven green in
# CORRECTNESS_r01.json — follows in module order and rotates back into the
# window in later rounds.
PRIORITY = [
    # r1-unchecked LLM-pipeline surface
    "dedup_exact_keeper", "dedup_exact_md5", "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs", "dedup_shingle_docfreq_hist",
    "dedup_simhash_signatures", "dedup_cluster_assign",
    "sim_cosine_topk", "sim_label_centroid_norms", "sim_ann_lsh_topk",
    "sim_knn_top1", "sim_ivf_topk", "sim_cosine_dup_pairs",
    "text_stats", "text_lang_rollup", "text_quality", "text_langid",
    "text_fingerprint", "text_bigram_topk", "text_regex_token_stats",
    "mm_payload_meta", "mm_feature_extract", "mm_resize", "mm_frame_sample",
    # r1 fail→fixed, and r1-unchecked extended/marts
    "sess1_user_sessions", "sess2_session_window",
    "p4_user_value_mad", "p5_lineitem_profile", "p6_statistical_moments",
    "mart_nation_customer_map",
    # round-2 additions
    "asof_purchase_click", "interval_error_click_burst",
    "rollup_event_time_grain",
    "tpch_q4_order_priority", "tpch_q10_returned_revenue",
    "tpch_q14_promo_revenue", "tpch_q18_large_volume", "tpch_q19_disjunctive",
    "tpch_q2_min_cost_supplier", "tpch_q15_top_supplier",
    "tpch_q16_supplier_cardinality", "tpch_q22_dormant_rich",
    "sketch_users_per_type", "sketch_daily_merge_total",
    "pipeline_clean_corpus",
    "tpch_q7_volume_shipping", "tpch_q12_priority_by_status",
    "tpch_q13_customer_distribution", "tpch_q17_small_quantity",
    "tpch_q21_sole_returned",
]


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
