"""End-to-end training-corpus cleaning: the composition the individual
dedup/text operators exist for, as ONE declarative query —
quality filter → exact dedup → near-dup cluster dedup → per-language
report.  Demonstrates that the pieces compose without materialization
barriers: Catalyst plans the whole chain (the iterative cluster
assignment is the only pre-computed input).

Keep rules (single-pass declarative approximation of a staged
pipeline; a production run would re-run stages in sequence):
  1. quality: token_count >= 50 (the medium+ bucket of
     textops.text_quality)
  2. exact: keep the min doc_id per md5(text)
  3. near-dup: drop docs that sit in a Jaccard cluster and are not the
     cluster keeper (cluster_id == doc_id); docs in no pair pass
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import table
from .dedup import DEDUP_CLUSTER_ORACLE, dedup_cluster_assign
from .textops import _TOKS, _TOKS_DUCK

MIN_TOKENS = 50


def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language report over the cleaned corpus (kept docs, average
    tokens, kept ratio vs raw)."""
    d = table(spark, sf_dir, "documents")
    toks = F.expr(f"size({_TOKS})")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    clusters = dedup_cluster_assign(spark, sf_dir)
    kept = (
        d.withColumn("token_count", toks)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("token_count") >= MIN_TOKENS))
        .join(clusters, "doc_id", "left")
        .where(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
    )
    raw = d.groupBy("lang").agg(F.count("*").alias("raw_docs"))
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("kept_docs"),
            F.round(F.avg("token_count"), 2).alias("avg_tokens"),
        )
        .join(raw, "lang")
        .select(
            "lang",
            "kept_docs",
            "raw_docs",
            "avg_tokens",
            F.round(F.col("kept_docs") / F.col("raw_docs"), 4).alias("kept_ratio"),
        )
        .orderBy("lang")
    )


PIPELINE_ORACLE = f"""
WITH
clusters AS ({DEDUP_CLUSTER_ORACLE}),
kept AS (
  SELECT doc_id, lang, len({_TOKS_DUCK}) AS token_count
  FROM documents
  QUALIFY ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
),
survivors AS (
  SELECT k.lang, k.token_count
  FROM kept k LEFT JOIN clusters c USING (doc_id)
  WHERE k.token_count >= {MIN_TOKENS}
    AND (c.cluster_id IS NULL OR c.cluster_id = k.doc_id)
),
raw AS (
  SELECT lang, COUNT(*) AS raw_docs FROM documents GROUP BY lang
)
SELECT s.lang,
       COUNT(*) AS kept_docs,
       raw.raw_docs,
       ROUND(AVG(s.token_count), 2) AS avg_tokens,
       ROUND(COUNT(*) * 1.0 / raw.raw_docs, 4) AS kept_ratio
FROM survivors s JOIN raw ON s.lang = raw.lang
GROUP BY s.lang, raw.raw_docs
ORDER BY s.lang
"""

QUERIES = {"pipeline_clean_corpus": pipeline_clean_corpus}
ORACLE = {"pipeline_clean_corpus": PIPELINE_ORACLE}
