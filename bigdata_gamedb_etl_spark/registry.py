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
# Round-9 head: r8's late additions pushed CONTROLS out of the window,
# which is exactly where the round's one driver-red hid (the swept
# control sql_word_price_stats' r4 green described code that no longer
# existed).  Round 9 restores the invariant: NEW + RECHECK budgeted
# ≤ 38 so all 12 CONTROLS hold window slots.  New queries are appended
# to ROUND9_NEW in the same commit that registers them (enforced by
# test_every_query_has_driver_evidence_or_is_queued).
ROUND9_NEW: list[str] = [
    # cluster-emit simhash dedup (r8 verdict item 4): output linear in
    # corpus size where pair-emit's replica pair-mass is quadratic
    "dedup_simhash_clusters",
    # incremental-corpus CC: merge batch edges into prior components
    # by contraction; oracle = full-graph recompute (must be identical)
    "dedup_incremental_cc",
    # packing-strategy decision table: no-split padding waste vs
    # concat-then-chunk boundary crossings, per doc-length bin
    "pipeline_packing_efficiency",
    # per-dimension train-vs-val centroid shift over the split hash —
    # one conditional-agg scan, no joins
    "sim_split_embedding_drift",
    # quality-floored two-round waterfill mixture solve: fair shares
    # then proportional redistribution of the unused budget
    "pipeline_mixture_waterfill",
    # val-split cross-entropy under the train-split unigram LM (add-1
    # smoothed) — the distribution-shift/contamination gauge
    "text_split_xentropy",
    # cross-modality referential DQ: per-source embedding coverage,
    # zero-norm vectors, dimensionality drift
    "dq_embedding_coverage",
    # per-rule filter attribution: failing / only-this / token mass —
    # the marginal-contribution audit before re-tuning any rule
    "pipeline_filter_attribution",
    # watermark-lateness histogram over (user, ingestion-order): the
    # batch audit that sizes a streaming watermark delay
    "ts_watermark_lateness",
    # recall@k vs nprobe ladder over ONE fitted IVF codebook — the ANN
    # recall/compute tuning table (rows-only; invariants in pytest)
    "sim_ivf_recall_curve",
    # (bands, rows) ladder over ONE minhash signature table vs the
    # exact-Jaccard ground truth — the dedup banding tuning table
    # (rows-only; nested-band monotonicity pinned in pytest)
    "dedup_lsh_band_ladder",
    # Jaccard-threshold sensitivity: pair/doc dup mass per candidate
    # threshold from one pair-generation pass (oracle-backed)
    "dedup_threshold_sweep",
    # Lorenz activity deciles from count-of-counts interval arithmetic
    # (no user-grain sort) — the distribution behind the gini scalar
    "behavior_event_lorenz",
]

#: Queries edited this round (new plan shape or new result dtype) —
#: locally re-verified vs DuckDB, re-queued for driver evidence at the
#: head of the window.
RECHECK_CHANGED: list[str] = [
    # r8 verdict item 1 — DECIMAL-vs-DOUBLE floor-recipe drift: the
    # Spark-side SQL texts' floor(...)/100.0 divisions now CAST the
    # floor to DOUBLE so the result column is double on both engines
    # (values were already numerically equal; the driver's exact value
    # hash failed on the type).  sql_word_price_stats carries the same
    # fix and re-greens from the CONTROLS block, which IS in-window
    # this round.  tests/test_oracle_parity.py now asserts result-type
    # FAMILIES match before value normalization, so this class of
    # drift fails locally instead of at the driver.
    "sql_supplier_distribution",
    "sql_window_top_suppliers",
    # r8 verdict item 4 — simhash pair-emit rewritten to collapse
    # identical signatures before the band join (band join, candidate
    # distinct, and Hamming verify now run at signature-pair cost;
    # output provably unchanged — one signature per doc).  Re-queued
    # because the logical plan was rewritten, not merely hinted.
    "dedup_simhash_band_pairs",
]

#: Drained in r7; refills only after a real testdata regeneration
#: (the staleness guard goes red and names land here).
RECONFIRM_STALE: list[str] = []

#: r9: spare window capacity refreshes the OLDEST driver evidence.
#: These queries are unchanged since their last green (and locally
#: re-verified every run by test_oracle_parity); their newest driver
#: row is from round 4, the oldest in the fleet — rotating them
#: through keeps every green row's age bounded.  Sized so the full
#: window stays ≤ 50 with all 12 CONTROLS in.
RECONFIRM_ROTATION: list[str] = [
    "anomaly_daily_zscore",
    "cohort_weekly_retention",
    "dedup_boilerplate_lines",
    "dedup_decontaminate",
    "dedup_editdist_names",
    "dedup_incremental_pairs",
    "dq_orders_profile",
    "dq_referential_integrity",
    "j10_basket_part_pairs",
    "j9_salted_segment_revenue",
    "mart_put_script",
    "pipeline_domain_mixture",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "pipeline_train_val_test",
    "pipeline_training_examples",
    "seq_markov_transitions",
    "sess3_top_paths",
    "text_chunk_udtf",
    "text_pii_scrub",
    "text_vocab_coverage",
    "tpch_q11_important_stock",
    # (w8_range_frame_hourly, tpch_q20_excess_shippers, and
    # tpch_q12_priority_by_status rotated out as late ROUND9_NEW ops
    # took the last slots; they re-queue in round 10's rotation)
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
    ROUND9_NEW + RECHECK_CHANGED + RECONFIRM_STALE
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
