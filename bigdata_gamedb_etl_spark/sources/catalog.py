"""Table catalog: explicit schemas + readers for the driver testdata.

The reference relies on ``inferSchema=True`` and then patches types with
casts (reference: spark_eda.py:42-46).  The engine declares explicit
``StructType`` schemas instead — deterministic, oracle-friendly, and the
precondition for real scan-level column pruning and predicate pushdown
on Parquet (SURVEY.md §4).

Parquet is the primary format (the reference's own data had a parquet
twin — reference: .MISSING_LARGE_BLOBS:2); CSV/JSON readers are provided
for source parity (reference: spark_eda.py:42, stage3.ipynb cell 2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: Small dimension tables that should always broadcast in joins.
DIMENSION_TABLES = {"region", "nation", "supplier", "part"}


def _s(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


TABLE_SCHEMAS: dict[str, StructType] = {
    "region": _s(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _s(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _s(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _s(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _s(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _s(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _s(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _s(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _s(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (Parquet scan).

    Parquet carries its own schema; Catalyst prunes columns and pushes
    predicates into the scan for anything expressed declaratively on
    top of this.

    Timestamp encodings vary across testdata generations: `events.ts`
    has been written as TIMESTAMP(NANOS) (which Spark's reader rejects
    outright) and, since round 4, all timestamp columns are
    TIMESTAMP(MICROS, isAdjustedToUTC=false) — which Spark 4 infers as
    TIMESTAMP_NTZ by default.  The engine (and rounds 1-3 of driver
    evidence) is built on session-tz TIMESTAMP: `unix_micros`,
    `session_window`, and the DuckDB oracles all assume it.  Normalize
    at this single load point:

    - `inferTimestampNTZ.enabled=false`: naive parquet timestamps read
      natively as TIMESTAMP (no cast wrapper, so scan-level predicate
      pushdown on date columns is preserved — a cast-on-top would
      defeat PushedFilters for every TPC-H date range).
    - legacy NANOS files: read as nano-longs and truncate to
      microseconds (identical to DuckDB/Arrow ns → µs downcasting).
    """
    # Pin the session timezone: naive parquet timestamps must yield the
    # same date parts here as in DuckDB regardless of the host JVM's TZ.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Expose all tables to the SQL surface (reference: spark_eda.py:243,271)."""
    for n in TABLE_NAMES:
        table(spark, sf_dir, n).createOrReplaceTempView(n + suffix)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, escape: str = '"'
) -> DataFrame:
    """CSV source with explicit schema (reference: spark_eda.py:42 uses
    header+inferSchema+escape; engine requires the schema up front)."""
    return spark.read.csv(path, header=True, schema=schema, escape=escape)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.json(path, schema=schema)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (schema self-describing, predicate pushdown like
    parquet) — for interop with Hive-era warehouses."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet written under an EVOLVING schema (columns added over
    time): mergeSchema unions the file schemas and older files surface
    the newer columns as nulls.

    At 100 TB a dataset is never rewritten when a column is added — new
    partitions just carry the wider schema.  mergeSchema pays a footer
    read per file at planning time, so production pins the merged schema
    in a catalog; this helper is the discovery path."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text source (one `value` column) — raw-corpus
    ingestion; pair with functions in operators/textops.py."""
    return spark.read.text(path)


def write_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Parquet sink; partitioned layout enables partition pruning at read
    time (SURVEY.md §4 'partition pruning')."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
