"""Multimodal column plumbing — image/audio/video as opaque binary.

The decode tier is REAL for the codec-free formats a pure-Python
parser can handle — binary PPM (P6) and uncompressed 24/32-bit BMP —
and falls back to the deterministic stand-in (`fake_decode_features`)
for anything else: the container has no JPEG/PNG/audio codecs, so
those formats keep a clearly-marked NotImplementedError inside
`decode_image` (swap in PIL/opencv in a full deployment).  Either
way the Spark-side plumbing is identical and real: binary payload
column, typed metadata, Arrow-batched `mapInPandas` feature
extraction with an explicit output schema, partition-preserving.

At 100 TB: payloads stay in executor memory as Arrow batches; the UDF
processes `spark.sql.execution.arrow.maxRecordsPerBatch` rows per
batch, and nothing is ever collected to the driver.
"""

from __future__ import annotations

import hashlib
import struct
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


def _channel_features(
    rsum: int, gsum: int, bsum: int, n: int
) -> list[float]:
    """FEATURE_DIM pixel statistics from exact integer channel sums:
    mean R/G/B (0-1) and Rec.601 mean luminance — integer sums make the
    result independent of pixel iteration order."""
    mr, mg, mb = rsum / n / 255.0, gsum / n / 255.0, bsum / n / 255.0
    luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
    return [round(v, 6) for v in (mr, mg, mb, luma)]


def _ppm_decode(data: bytes) -> tuple[int, int, list[float]]:
    """Binary PPM (P6, maxval 255): header tokens separated by
    whitespace with '#' comments, then packed RGB triplets."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(data):
            if data[pos : pos + 1].isspace():
                pos += 1
            elif data[pos : pos + 1] == b"#":
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
            else:
                break
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        return data[start:pos]

    magic = token()
    if magic != b"P6":
        raise NotImplementedError(f"PPM variant {magic!r} unsupported (P6 only)")
    width, height, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise NotImplementedError("16-bit PPM unsupported")
    pos += 1  # exactly one whitespace byte after maxval, then raster
    n = width * height
    px = data[pos : pos + 3 * n]
    if len(px) < 3 * n:
        raise ValueError("truncated PPM raster")
    return width, height, _channel_features(
        sum(px[0::3]), sum(px[1::3]), sum(px[2::3]), n
    )


def _bmp_decode(data: bytes) -> tuple[int, int, list[float]]:
    """Uncompressed (BI_RGB) 24/32-bit BMP with a BITMAPINFOHEADER;
    rows are bottom-up (or top-down when height < 0) and padded to
    4-byte strides — irrelevant to channel means, so rows are summed
    in storage order."""
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", data, 10)[0]
    width = struct.unpack_from("<i", data, 18)[0]
    height = abs(struct.unpack_from("<i", data, 22)[0])
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP compression={comp} bpp={bpp} unsupported (BI_RGB 24/32 only)"
        )
    # sanity-bound BEFORE looping: a text payload that merely starts
    # with 'BM' yields garbage dims, and an unchecked height would
    # spin a ~2^31 row loop instead of falling back to the stub
    if not (0 < width <= 1 << 14 and 0 < height <= 1 << 14):
        raise ValueError(f"implausible BMP dims {width}x{height}")
    bytespp = bpp // 8
    stride = (width * bytespp + 3) // 4 * 4
    if off + stride * height > len(data) + 3:  # final row may skip padding
        raise ValueError("BMP raster exceeds payload")
    rsum = gsum = bsum = 0
    for row in range(height):
        base = off + row * stride
        rowdata = data[base : base + width * bytespp]
        if len(rowdata) < width * bytespp:
            raise ValueError("truncated BMP raster")
        # BGR(A) storage order
        bsum += sum(rowdata[0::bytespp])
        gsum += sum(rowdata[1::bytespp])
        rsum += sum(rowdata[2::bytespp])
    return width, height, _channel_features(rsum, gsum, bsum, width * height)


def decode_image(payload: bytes) -> tuple[int, int, list[float]]:
    """Real decode path for codec-free formats (pure Python, no deps):
    binary PPM (P6) and uncompressed BMP.  Codec formats (JPEG/PNG/…)
    raise NotImplementedError — this container has no image codecs;
    swap in PIL/opencv in a full deployment."""
    if payload[:2] == b"P6":
        return _ppm_decode(payload)
    if payload[:2] == b"BM":
        return _bmp_decode(payload)
    raise NotImplementedError(
        "codec image formats unavailable in this environment "
        "(PPM/BMP decode natively; use fake_decode_features otherwise)"
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
            # real decode for codec-free formats (PPM/BMP), the
            # deterministic stand-in for everything else — the corpus
            # payloads here are text blobs, so they take the fallback,
            # while fixture images exercise the real tier end-to-end
            # (tests/test_llm_pipeline.py)
            try:
                width, height, feats = decode_image(raw)
            except (NotImplementedError, ValueError):
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
    """Harness-safe twin of mm_feature_extract: the `features
    array<double>` column crashes the driver's row canonicalizer
    (pandas sort on list cells → 'unhashable type: list'), so this
    form serializes it to a JSON string.  Library callers use
    mm_feature_extract for the typed array."""
    return (
        mm_feature_extract(spark, sf_dir)
        .withColumn("features", F.to_json("features"))
        .orderBy("doc_id")
    )


def mm_feature_extract_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered (and now ORACLE-BACKED) form: FEATURE_DIM scalar
    double columns instead of the array.

    Oracle-ability argument: corpus payloads here are text blobs, so
    every row takes the deterministic md5-derived fallback, which is
    pure arithmetic over the md5 hex digest — expressible in DuckDB
    (hex-nibble parsing; see MM_FEATURES_ORACLE).  The real PPM/BMP
    tier cannot fire on these payloads (a text would need to be a
    byte-exact image header + raster to parse — the guards reject
    near-misses), and is pinned separately by fixture-image tests.
    round(b/255, 6) has NO halfway cases (b·10⁶/255 is integer only
    for b ∈ {0,51,...,255}, where the 6dp value is exact), so
    Python/Spark/DuckDB rounding modes agree on every byte value."""
    base = mm_feature_extract(spark, sf_dir)
    return base.select(
        "doc_id",
        "payload_bytes",
        "width",
        "height",
        *[
            F.col("features").getItem(i).alias(f"f{i}")
            for i in range(FEATURE_DIM)
        ],
    ).orderBy("doc_id")


def _mm_features_oracle() -> str:
    """DuckDB twin of the md5-derived fallback decoder: parse digest
    bytes out of the md5 hex string with nibble arithmetic."""

    def byte(i: int) -> str:  # 0-based digest byte from hex chars
        hi = f"strpos('0123456789abcdef', substr(h, {2 * i + 1}, 1)) - 1"
        lo = f"strpos('0123456789abcdef', substr(h, {2 * i + 2}, 1)) - 1"
        return f"(({hi}) * 16 + ({lo}))"

    feats = ",\n       ".join(
        f"round({byte(2 + i)} / 255.0, 6) AS f{i}"
        for i in range(FEATURE_DIM)
    )
    return f"""
WITH hx AS (
  SELECT doc_id,
         CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS payload_bytes,
         md5(text) AS h
  FROM documents
)
SELECT doc_id, payload_bytes,
       CAST(64 + {byte(0)} % 64 AS INTEGER) AS width,
       CAST(64 + {byte(1)} % 64 AS INTEGER) AS height,
       {feats}
FROM hx
ORDER BY doc_id
"""


MM_FEATURES_ORACLE = _mm_features_oracle()



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


# Oracle twin of the frame sampler: 16-byte frames via substring + md5.
# DuckDB's md5/substring are VARCHAR(character)-based while the UDF
# slices BYTES — identical on this corpus, whose documents are pure
# ASCII at every SF (verified: octet_length == length for all rows).
# A non-ASCII corpus would demote this back to rows-only; the UDF's
# byte semantics are the contract.
MM_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, text,
         UNNEST(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT), 4))
           AS frame_idx
  FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(substring(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16))
         AS frame_md5
FROM f
ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "mm_payload_meta": mm_payload_meta,
    "mm_feature_extract": mm_feature_extract_flat,
    "mm_resize": mm_resize,
    "mm_frame_sample": mm_frame_sample,
}

ORACLE = {
    "mm_payload_meta": MM_META_ORACLE,
    # fallback-tier arithmetic is SQL-expressible (hex-nibble parsing
    # of the md5 digest); the real PPM/BMP tier is pinned by fixture
    # tests instead (tests/test_llm_pipeline.py)
    "mm_feature_extract": MM_FEATURES_ORACLE,
    "mm_frame_sample": MM_FRAMES_ORACLE,
    # mm_resize stays rows-only: the stub's output is target-constant,
    # so an oracle row would verify nothing real
}
