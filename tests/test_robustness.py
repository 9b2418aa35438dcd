"""Robustness: every query must handle empty inputs without crashing,
and the engine must be safe under concurrent query execution in one
SparkSession (shared temp views, shared catalog)."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.sources.catalog import TABLE_NAMES, TABLE_SCHEMAS

#: IVF trains a KMeans model — undefined on an empty corpus by design.
EMPTY_EXEMPT = {"sim_ivf_topk"}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for name in TABLE_NAMES:
        df = spark.createDataFrame([], TABLE_SCHEMAS[name])
        df.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in sorted(all_queries().items()):
        if name in EMPTY_EXEMPT:
            continue
        try:
            n = fn(spark, empty_sf_dir).count()
            # global aggregates legitimately return one row of
            # null/zero aggregates on empty input; everything else: 0
            assert n <= 1, f"{name}: {n} rows from empty input"
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"))
    assert not failures, failures


def test_concurrent_queries_one_session(spark, sf_dir):
    queries = all_queries()
    names = [
        "a1_word_revenue",
        "sql_word_price_stats",
        "sql_json_props_stats",
        "w2_top_customers_per_nation",
        "j1_region_revenue",
        "dedup_exact_md5",
        "text_stats",
        "sql_supplier_distribution",
    ]
    sequential = {n: queries[n](spark, sf_dir).count() for n in names}
    with ThreadPoolExecutor(max_workers=8) as pool:
        concurrent = dict(
            zip(
                names,
                pool.map(lambda n: queries[n](spark, sf_dir).count(), names),
            )
        )
    assert concurrent == sequential
