"""Upsert and SCD2 merge semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from bigdata_gamedb_etl_spark.functions.merge import scd2_apply, scd2_init, upsert_latest

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("attr", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _t(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def test_upsert_latest_wins(spark):
    current = spark.createDataFrame(
        [(1, "old", _t(1)), (2, "keep", _t(2))], SCHEMA
    )
    updates = spark.createDataFrame(
        [(1, "new", _t(3)), (3, "insert", _t(3))], SCHEMA
    )
    out = {r["id"]: r["attr"] for r in upsert_latest(current, updates, ["id"], "ts").collect()}
    assert out == {1: "new", 2: "keep", 3: "insert"}


def test_upsert_tie_prefers_update(spark):
    current = spark.createDataFrame([(1, "old", _t(1))], SCHEMA)
    updates = spark.createDataFrame([(1, "new", _t(1))], SCHEMA)
    out = upsert_latest(current, updates, ["id"], "ts").collect()
    assert len(out) == 1 and out[0]["attr"] == "new"


def test_scd2_versions_and_current_flag(spark):
    hist = scd2_init(spark.createDataFrame([(1, "v1", _t(1)), (2, "x1", _t(1))], SCHEMA))
    upd = spark.createDataFrame([(1, "v2", _t(5)), (1, "v3", _t(9))], SCHEMA)
    out = scd2_apply(hist, upd, ["id"], "ts")
    rows = sorted(
        ((r["id"], r["attr"], r["ts"], r["valid_to"], r["is_current"]) for r in out.collect())
    )
    assert rows == [
        (1, "v1", _t(1), _t(5), False),
        (1, "v2", _t(5), _t(9), False),
        (1, "v3", _t(9), None, True),
        (2, "x1", _t(1), None, True),
    ]
