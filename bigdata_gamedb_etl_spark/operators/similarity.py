"""Similarity search over the `embeddings` table (array<float>, dim 64).

Two tiers:
  1. brute-force cosine top-k against a query vector — exact baseline,
     oracle-checked.  All vector math is built-in higher-order
     functions (zip_with + aggregate), JVM-side, codegen-friendly.
  2. random-hyperplane LSH bucketed search — the scale path: bucket
     assignment is a narrow map, the query probes only matching
     buckets.  Rows-only checked (approximate recall by design).

At 100 TB the brute-force variant is still a legitimate *distributed*
scan (score+top-k is TakeOrderedAndProject, no shuffle of the corpus);
LSH cuts the scan to a bucket subset.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import table

QUERY_VEC_ID = 0
TOP_K = 20
LSH_PLANES = 12


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _emb_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("emb"),
    )


# --------------------------------------------------------------------------
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the embedding of vec_id=0."""
    emb = _emb_double(spark, sf_dir)
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("emb").alias("qv"))
    scored = emb.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            _dot(F.col("emb"), F.col("qv"))
            / (F.sqrt(_dot(F.col("emb"), F.col("emb"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))),
            4,
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(TOP_K)


SIM_TOPK_ORACLE = f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id,
       ROUND(
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM embeddings, q
ORDER BY cosine DESC, vec_id
LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
def sim_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid via posexplode + per-dimension mean (the
    shuffle-friendly way to average vectors: (label, dim) grid, no
    driver collect), reporting centroid L2 norm and member count."""
    emb = _emb_double(spark, sf_dir)
    per_dim = (
        emb.select("label", F.posexplode("emb").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("mean_v"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))), 4).alias(
                "centroid_norm"
            ),
            F.count("*").alias("n_dims"),
        )
        .orderBy("label")
    )


SIM_CENTROID_ORACLE = """
WITH per_dim AS (
  SELECT label, dim - 1 AS dim, AVG(v) AS mean_v
  FROM (
    SELECT label,
           UNNEST(CAST(embedding AS DOUBLE[])) AS v,
           UNNEST(range(1, len(embedding) + 1)) AS dim
    FROM embeddings
  )
  GROUP BY label, dim
)
SELECT label,
       ROUND(sqrt(SUM(mean_v * mean_v)), 4) AS centroid_norm,
       COUNT(*) AS n_dims
FROM per_dim
GROUP BY label
ORDER BY label
"""


# --------------------------------------------------------------------------
def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG dependency —
    derived from a fixed integer hash so every run and both test
    processes agree)."""
    planes = []
    for p in range(LSH_PLANES):
        row = []
        for d in range(64):
            # xorshift-ish integer scramble → (-1, 1) uniform-ish
            x = (p * 2654435761 + d * 40503 + 12345) & 0xFFFFFFFF
            x ^= x >> 13
            x = (x * 1274126177) & 0xFFFFFFFF
            row.append(((x / 0xFFFFFFFF) * 2.0 - 1.0))
        planes.append(row)
    return planes


def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: random-hyperplane LSH signature bucketing, then exact cosine
    only within the query's bucket.  Rows-only checked."""
    emb = _emb_double(spark, sf_dir)
    planes = _hyperplanes()
    sig_bits = [
        (_dot(F.col("emb"), F.array(*[F.lit(v) for v in plane])) >= 0).cast("int")
        for plane in planes
    ]
    bucketed = emb.withColumn("bucket", F.concat_ws("", *sig_bits))
    qrow = bucketed.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qv"), F.col("bucket").alias("qbucket")
    )
    scored = (
        bucketed.join(
            F.broadcast(qrow), F.col("bucket") == F.col("qbucket")
        )
        .select(
            "vec_id",
            "bucket",
            F.round(
                _dot(F.col("emb"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("emb"), F.col("emb")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(TOP_K)



# --------------------------------------------------------------------------
def sim_knn_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-NN self-join: every vector's nearest neighbor by cosine
    (pairwise scores → per-vector top-1 window).  The exact tier of
    similarity search; at 100 TB the same output comes from LSH/IVF
    candidate generation feeding the identical verification/rank stage.

    Pairwise compute is O(n²·d) but embarrassingly parallel: the right
    side broadcasts in chunks (here whole, dimension-table-sized) and
    nothing shuffles except the final per-vector top-1."""
    emb = _emb_double(spark, sf_dir)
    n = emb.select(
        "vec_id",
        "emb",
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
    )
    a = n.select(
        F.col("vec_id").alias("a_id"), F.col("emb").alias("a_emb"), F.col("nrm").alias("a_nrm")
    )
    b = n.select(
        F.col("vec_id").alias("b_id"), F.col("emb").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )
    from pyspark.sql import Window

    pairs = (
        a.join(F.broadcast(b), F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (
                _dot(F.col("a_emb"), F.col("b_emb"))
                / (F.col("a_nrm") * F.col("b_nrm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("a_id").alias("vec_id"),
            F.col("b_id").alias("nn_id"),
            F.round("cos", 4).alias("nn_cosine"),
        )
        .orderBy("vec_id")
    )


SIM_KNN_ORACLE = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) AS cos
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT a_id, b_id, cos,
         ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id) AS rn
  FROM pairs
)
SELECT a_id AS vec_id, b_id AS nn_id, ROUND(cos, 4) AS nn_cosine
FROM ranked WHERE rn = 1
ORDER BY vec_id
"""

QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_label_centroid_norms": sim_label_centroid_norms,
    "sim_ann_lsh_topk": sim_ann_lsh_topk,
    "sim_knn_top1": sim_knn_top1,
}

ORACLE = {
    "sim_cosine_topk": SIM_TOPK_ORACLE,
    "sim_label_centroid_norms": SIM_CENTROID_ORACLE,
    "sim_knn_top1": SIM_KNN_ORACLE,
    # sim_ann_lsh_topk: rows-only (approximate recall by design)
}
