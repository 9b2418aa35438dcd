"""Mergeable sketch aggregates — the approximate-distinct machinery a
100 TB pipeline uses instead of exact COUNT(DISTINCT) re-shuffles.

Two shapes, both rows-only checked (sketch estimates are
implementation-defined; DuckDB's approx_count_distinct uses a
different HLL construction, so a value-hash oracle is impossible by
design).  Accuracy is asserted against exact distinct counts with the
sketch's error bound in tests/test_llm_pipeline.py.

Why sketches and not approx_count_distinct: the Datasketches HLL
column (`hll_sketch_agg`) is a MERGEABLE binary — partials built per
partition / per day / per source can be stored, shipped, and
`hll_union_agg`-ed later without touching raw data again.  That
two-level shape (sketch once, merge many) is the hypertable /
incremental-rollup pattern; a plain approx_count_distinct forces a
full rescan per question.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table

HLL_LGK = 14  # 2^14 buckets → ~1% relative standard error


def sketch_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type from an HLL sketch
    column (one pass, partials combine map-side like any aggregate)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(HLL_LGK))
            ).alias("approx_users"),
            F.count("*").alias("event_count"),
        )
        .orderBy("event_type")
    )


def sketch_daily_merge_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sketch merge: per-day HLL partials (what an
    incremental pipeline would persist alongside each day's partition),
    then hll_union_agg merges them into the whole-corpus distinct-user
    estimate WITHOUT rescanning events.  The merged estimate must agree
    with a direct one-pass sketch — asserted in tests."""
    e = table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("DAY", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("day_sketch")
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("day_sketch")).alias(
            "approx_total_users"
        ),
        F.count("*").alias("days_merged"),
    )


# --------------------------------------------------------------------------
# Count-min sketch over the token stream — the mergeable heavy-hitter
# structure a 100 TB pipeline uses instead of an exact token-grain
# groupBy.  Entirely built-in DataFrame ops: the sketch IS a
# (row, bucket) -> count table of CM_DEPTH × CM_WIDTH cells, built with
# ONE shuffle whose key cardinality is d×w (map-side combine collapses
# each partition to ≤ d×w partial cells regardless of corpus size), and
# merged across corpora/days by element-wise sum — the same
# partial/merge shape as the HLL rollup above.
CM_DEPTH = 4
CM_WIDTH = 8192
#: candidate generation: deterministic 5% sample of token OCCURRENCES
#: (hash-gated on (doc_id, position) — no RNG).  With a fixed hash this
#: is not a probabilistic guarantee (a token whose every (doc_id, pos)
#: occurrence hashed to a nonzero residue would be missed), but a token
#: frequent enough to matter has so many occurrences that missing all
#: of them is vanishingly unlikely in practice — coverage of the exact
#: top-K is asserted empirically in tests/test_llm_pipeline.py, not
#: proved.
CM_SAMPLE_MOD = 20
CM_TOP_K = 20

_CM_TOKS = "filter(split(text, ' '), t -> t <> '')"


def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K heavy-hitter tokens with count-min-estimated counts.

    Three stages, none of which shuffles at token grain:
      1. build: explode tokens × CM_DEPTH hash rows, groupBy the d×w
         cell id — bounded-cardinality hash-agg (the sketch);
      2. candidates: hash-gated occurrence sample → distinct tokens;
      3. probe: candidates × depth joined against the broadcast-sized
         sketch, min across rows = the CM estimate (always ≥ truth,
         overcount ≤ ~2N/w with d independent rows).
    Deterministic end-to-end (xxhash64 everywhere, no RNG), but not
    SQL-expressible in DuckDB (no xxhash64) — rows-only checked, with
    the CM guarantee est ≥ exact and the overcount bound asserted
    against exact counts in tests/test_llm_pipeline.py."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(F.expr(_CM_TOKS)).alias("pos", "token")
    )
    depth = F.explode(F.expr(f"sequence(0, {CM_DEPTH - 1})")).alias("j")
    cell = F.pmod(F.xxhash64("token", "j"), F.lit(CM_WIDTH)).alias("bucket")

    counters = (
        tok.select("token", depth)
        .select("j", cell)
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    candidates = (
        tok.where(F.pmod(F.xxhash64("doc_id", "pos"), F.lit(CM_SAMPLE_MOD)) == 0)
        .select("token")
        .distinct()
    )
    probe = candidates.select("token", depth).select("token", "j", cell)
    return (
        probe.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("token")
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.col("est_count").desc(), "token")
        .limit(CM_TOP_K)
    )


# --------------------------------------------------------------------------
# Built-in sketch top-k: per-language top tokens via approx_top_k
# (Spark 4's native frequent-items aggregate).  Complements the
# hand-rolled count-min above: same heavy-hitter question, answered by
# the engine-provided mergeable sketch — partial aggregation per
# partition, sketch merge at the reducer, so the shuffle carries
# ≤ maxItemsTracked entries per partition regardless of token volume.
# Rows-only checked (tie-breaks inside the sketch are unspecified);
# tests/test_temporal_sketches.py asserts every reported count equals
# the exact count whenever per-lang vocabulary fits maxItemsTracked
# (the sketch is exact below that cardinality).
APPROX_TOPK_K = 5


def sketch_approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(F.expr(_CM_TOKS)).alias("token"))
    topk = tok.groupBy("lang").agg(
        F.expr(f"approx_top_k(token, {APPROX_TOPK_K})").alias("tk")
    )
    return (
        topk.select("lang", F.posexplode("tk").alias("rank", "entry"))
        .select(
            "lang",
            (F.col("rank") + 1).cast("int").alias("rank"),
            F.col("entry.item").alias("token"),
            F.col("entry.count").alias("est_count"),
        )
        .orderBy("lang", "rank")
    )


QUERIES = {
    "sketch_users_per_type": sketch_users_per_type,
    "sketch_daily_merge_total": sketch_daily_merge_total,
    "sketch_cm_heavy_hitters": sketch_cm_heavy_hitters,
    "sketch_approx_topk_tokens": sketch_approx_topk_tokens,
}

ORACLE: dict[str, str] = {
    # both rows-only: Datasketches HLL estimates are not reproducible in
    # DuckDB's HLL; accuracy asserted vs exact counts in tests instead.
}
