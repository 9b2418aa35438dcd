"""Multimodal column plumbing — image/audio/video as opaque binary.

The container has no image/audio codecs, so the decode step is stubbed
(`decode_image` raises NotImplementedError; `fake_decode_features` is
the deterministic stand-in) — but the Spark-side plumbing is real:
binary payload column, typed metadata, Arrow-batched `mapInPandas`
feature extraction with an explicit output schema, partition-preserving.

At 100 TB: payloads stay in executor memory as Arrow batches; the UDF
processes `spark.sql.execution.arrow.maxRecordsPerBatch` rows per
batch, and nothing is ever collected to the driver.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.catalog import table

# The mapInPandas fns below reference module-level helpers
# (fake_decode_features, fake_resize).  Functions in an importable
# module are cloudpickled BY REFERENCE (module + qualname), so an
# executor Python worker that doesn't have this repo on sys.path dies
# with ModuleNotFoundError the moment it unpickles the UDF — exactly
# the situation when a driver harness imports __spark_entry__ by path
# from a different cwd.  Registering the module for by-value pickling
# ships the function bodies inside the serialized task instead; their
# only foreign deps (hashlib, pandas) exist on every worker.
cloudpickle.register_pickle_by_value(sys.modules[__name__])

FEATURE_DIM = 4

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode path — requires an image codec not present in this
    container.  Swap in PIL/opencv in a full deployment."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_features"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decoder: derives (width, height, features)
    from the md5 digest of the payload, so tests are stable and the
    full mapInPandas pipeline (schema, batching, partitioning) is
    exercised for real."""
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 64
    height = 64 + digest[1] % 64
    feats = [round(b / 255.0, 6) for b in digest[2 : 2 + FEATURE_DIM]]
    return width, height, feats


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            width, height, feats = fake_decode_features(raw)
            rows.append((doc_id, len(raw), width, height, feats))
        yield pd.DataFrame(
            rows, columns=["doc_id", "payload_bytes", "width", "height", "features"]
        )


def with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with an opaque binary payload column (stands in for an
    image/audio blob; real pipelines read these from parquet binary
    columns or object-store paths)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.col("text").cast("binary").alias("payload"))


# --------------------------------------------------------------------------
def mm_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque payload — byte length + md5, no
    decode needed (the always-available tier of multimodal handling)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.octet_length("text").alias("payload_bytes"),
            F.md5("text").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


MM_META_ORACLE = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    mapInPandas (decode stubbed deterministically).  Rows-only checked:
    the stub decoder is not SQL-expressible."""
    payloads = with_payload(spark, sf_dir)
    return (
        payloads.mapInPandas(_extract_batches, schema=FEATURE_SCHEMA)
        .orderBy("doc_id")
    )


def mm_feature_extract_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harness-safe registered twin of mm_feature_extract: the
    `features array<double>` column crashes the driver's row
    canonicalizer (pandas sort on list cells → 'unhashable type:
    list'), so the registered form serializes it to a JSON string.
    Library callers use mm_feature_extract for the typed array."""
    return (
        mm_feature_extract(spark, sf_dir)
        .withColumn("features", F.to_json("features"))
        .orderBy("doc_id")
    )



# --------------------------------------------------------------------------
def fake_resize(payload: bytes, target: tuple[int, int]) -> tuple[int, int, bytes]:
    """Deterministic stand-in for an image resize: real deployments swap
    in PIL/opencv; the output contract (dims + recompressed bytes) and
    the Arrow batch plumbing are what this exercises."""
    w, h = target
    digest = hashlib.md5(payload + f"{w}x{h}".encode()).digest()
    return w, h, digest


def mm_resize(spark: SparkSession, sf_dir: str, width: int = 224, height: int = 224) -> DataFrame:
    """Batch 'image' resize over binary payloads (mapInPandas).
    Rows-only checked (stubbed codec)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("out_width", IntegerType()),
            StructField("out_height", IntegerType()),
            StructField("out_bytes", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, data = fake_resize(bytes(payload), (width, height))
                rows.append((doc_id, w, h, len(data)))
            yield pd.DataFrame(rows, columns=["doc_id", "out_width", "out_height", "out_bytes"])

    return with_payload(spark, sf_dir).mapInPandas(batches, schema).orderBy("doc_id")


def mm_frame_sample(spark: SparkSession, sf_dir: str, every_n: int = 4) -> DataFrame:
    """'Video' frame sampling: treat the payload as a frame sequence
    (16-byte fake frames) and keep every n-th — one output row per kept
    frame, the exploding-output shape a real video pipeline has.
    Rows-only checked (stubbed codec)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_md5", StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                frames = [raw[i : i + 16] for i in range(0, len(raw), 16)]
                for idx in range(0, len(frames), every_n):
                    rows.append(
                        (doc_id, idx, hashlib.md5(frames[idx]).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return with_payload(spark, sf_dir).mapInPandas(batches, schema).orderBy("doc_id", "frame_idx")

QUERIES = {
    "mm_payload_meta": mm_payload_meta,
    "mm_feature_extract": mm_feature_extract_json,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
}

ORACLE = {
    "mm_payload_meta": MM_META_ORACLE,
    # mm_feature_extract: rows-only (stubbed decoder, not SQL-expressible)
}
