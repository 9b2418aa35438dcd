"""Local mirror of the driver's correctness gate: every oracle-backed
query must match its DuckDB twin on row count, column names, and values
(order-insensitive).  Rows-only queries must at least execute and
return a stable schema.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import pytest

from bigdata_gamedb_etl_spark.registry import all_oracle, all_queries

QUERIES = all_queries()
ORACLE = all_oracle()
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


def _norm_value(v):
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # queries round explicitly; this guard only collapses residual
        # representation noise (e.g. -0.0).
        return round(v + 0.0, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [columns[i] for i in order], out


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    s_cols, s_vals = _normalize(spark_cols, spark_rows)
    d_cols, d_vals = _normalize(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_vals) == len(d_vals), (
        f"{name}: row count {len(s_vals)} vs {len(d_vals)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_vals, d_vals) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0
