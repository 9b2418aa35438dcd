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
IVF_CELLS = 16
IVF_NPROBE = 4
DUP_COSINE_THRESHOLD = 0.42


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

    Engineering: the corpus matrix is dimension-table-sized, so it
    broadcasts whole (at larger corpora: chunk the broadcast or switch
    to the LSH/IVF candidate path); each Arrow batch of query rows then
    runs one BLAS GEMM against it inside mapInPandas.  A pure
    zip_with/aggregate pairwise join computes the same thing ~30×
    slower: higher-order-function lambdas evaluate interpreted
    per-element and projection collapse recomputes norms per pair."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = _emb_double(spark, sf_dir)
    corpus = sorted(
        ((r["vec_id"], r["emb"]) for r in emb.select("vec_id", "emb").collect()),
        key=lambda t: t[0],
    )
    if not corpus:  # empty corpus → empty result, not a numpy shape error
        from pyspark.sql.types import DoubleType, LongType, StructField, StructType as _S
        return spark.createDataFrame(
            [],
            _S([
                StructField("vec_id", LongType()),
                StructField("nn_id", LongType()),
                StructField("nn_cosine", DoubleType()),
            ]),
        )
    ids = np.array([t[0] for t in corpus], dtype=np.int64)
    M = np.array([t[1] for t in corpus], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sc = spark.sparkContext
    b_ids, b_m = sc.broadcast(ids), sc.broadcast(Mn)

    def _round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
        # numpy rounds half-to-even; SQL ROUND is half-away-from-zero
        p = 10.0**nd
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("nn_id", LongType()),
            StructField("nn_cosine", DoubleType()),
        ]
    )

    def nn_batches(batches):
        ids_, Mn_ = b_ids.value, b_m.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["emb"]), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = An @ Mn_.T
            aid = pdf["vec_id"].to_numpy()
            for i, v in enumerate(aid):
                S[i, ids_ == v] = -np.inf  # exclude self
            # ids_ ascending ⇒ argmax's first-occurrence tie-break
            # matches ORDER BY cos DESC, nn_id
            best = S.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": aid,
                    "nn_id": ids_[best],
                    "nn_cosine": _round_half_away(S[np.arange(len(aid)), best], 4),
                }
            )

    return emb.select("vec_id", "emb").mapInPandas(nn_batches, out_schema).orderBy("vec_id")


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


# --------------------------------------------------------------------------
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer (Spark ML, fixed seed)
    partitions the corpus into cells; the query scores exact cosine only
    inside the `IVF_NPROBE` cells nearest its own centroid.  Rows-only
    checked (approximate recall; KMeans assignment is not
    SQL-expressible in the oracle).

    Scale: train on a sample, assign with one narrow map (the model
    broadcasts), then the search scans |corpus| * nprobe/k rows.  Cell
    ids can also become a partition column for physical pruning."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = _emb_double(spark, sf_dir)
    vecs = emb.withColumn("features", array_to_vector("emb"))
    model = KMeans(k=IVF_CELLS, seed=42, maxIter=20, featuresCol="features").fit(vecs)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cell")

    centers = model.clusterCenters()
    qrow = assigned.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("emb").alias("qv"), F.col("cell").alias("qcell")
    )
    qcell, qv = qrow.first()["qcell"], qrow.first()["qv"]
    # nprobe nearest cells to the query vector (tiny driver-side math on
    # k centroids — the model itself, not data)
    import math as _math

    def _cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        nu = _math.sqrt(sum(a * a for a in u)) or 1.0
        nv = _math.sqrt(sum(a * a for a in v)) or 1.0
        return d / (nu * nv)

    probe = sorted(range(len(centers)), key=lambda c: -_cos(qv, centers[c]))[:IVF_NPROBE]

    scored = (
        assigned.where(F.col("cell").isin(probe))
        .crossJoin(F.broadcast(qrow.select("qv")))
        .select(
            "vec_id",
            "cell",
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
def sim_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (i<j) with cosine ≥
    threshold — the embedding-space twin of the n-gram Jaccard dedup.
    Exact tier (broadcast-corpus GEMM like sim_knn_top1); the LSH/IVF
    variants are the candidate generators at corpus scales where the
    broadcast no longer fits."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = _emb_double(spark, sf_dir)
    corpus = sorted(
        ((r["vec_id"], r["emb"]) for r in emb.select("vec_id", "emb").collect()),
        key=lambda t: t[0],
    )
    out_schema = StructType(
        [
            StructField("v1", LongType()),
            StructField("v2", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )
    if not corpus:
        return spark.createDataFrame([], out_schema)
    ids = np.array([t[0] for t in corpus], dtype=np.int64)
    M = np.array([t[1] for t in corpus], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sc = spark.sparkContext
    b_ids, b_m = sc.broadcast(ids), sc.broadcast(Mn)

    def pair_batches(batches):
        ids_, Mn_ = b_ids.value, b_m.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(list(pdf["emb"]), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = An @ Mn_.T
            aid = pdf["v"].to_numpy() if "v" in pdf else pdf["vec_id"].to_numpy()
            rows = {"v1": [], "v2": [], "cosine": []}
            for i, v in enumerate(aid):
                # keep only j with id > v (each unordered pair once)
                mask = (ids_ > v) & (S[i] >= DUP_COSINE_THRESHOLD)
                for j in np.nonzero(mask)[0]:
                    c = S[i, j]
                    rows["v1"].append(v)
                    rows["v2"].append(ids_[j])
                    rows["cosine"].append(
                        np.sign(c) * np.floor(abs(c) * 1e4 + 0.5) / 1e4
                    )
            yield pd.DataFrame(rows)

    return (
        emb.select("vec_id", "emb")
        .mapInPandas(pair_batches, out_schema)
        .orderBy("v1", "v2")
    )


SIM_DUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
n AS (
  SELECT vec_id, emb, sqrt(list_dot_product(emb, emb)) AS nrm FROM e
)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       ROUND(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm) >= {DUP_COSINE_THRESHOLD}
ORDER BY v1, v2
"""

QUERIES = {
    "sim_cosine_topk": sim_cosine_topk,
    "sim_label_centroid_norms": sim_label_centroid_norms,
    "sim_ann_lsh_topk": sim_ann_lsh_topk,
    "sim_knn_top1": sim_knn_top1,
    "sim_ivf_topk": sim_ivf_topk,
    "sim_cosine_dup_pairs": sim_cosine_dup_pairs,
}

ORACLE = {
    "sim_cosine_topk": SIM_TOPK_ORACLE,
    "sim_label_centroid_norms": SIM_CENTROID_ORACLE,
    "sim_knn_top1": SIM_KNN_ORACLE,
    "sim_cosine_dup_pairs": SIM_DUP_ORACLE,
    # sim_ann_lsh_topk: rows-only (approximate recall by design)
}
