"""Robustness: every query must handle empty inputs without crashing,
and the engine must be safe under concurrent query execution in one
SparkSession (shared temp views, shared catalog)."""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import pytest

from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.sources.catalog import TABLE_NAMES, TABLE_SCHEMAS

#: r11: the set is empty — the IVF/PQ family's MLlib fits (which
#: crashed on an empty corpus by design) were replaced by the
#: integer-Lloyd machinery, which degrades to an empty result like
#: every other query.
EMPTY_EXEMPT: set[str] = set()

#: fixed-row-count reports: one row per audited relationship, even on
#: empty input (a DQ report that vanishes when the data does is a bug).
FIXED_ROWS = {
    "dq_referential_integrity": 4,
    # one row per audited join key (null metrics on empty input)
    "dq_key_skew_profile": 4,
    # one row per column pair (null corr on empty input)
    "stat_corr_matrix": 6,
    # 4 skew keys + 4 FK edges keep their rows; the freshness legs are
    # per-OBSERVED event type, so they vanish with the data
    "dq_quarantine_mart": 8,
    # one row per audited (table, column) pair, null_pct NULL on empty
    "dq_completeness_profile": 18,
    # one row per dedup rung, null metrics on an empty corpus
    "dedup_survivorship_funnel": 4,
    # one row per (bands, rows) ladder setting, zero counts on empty
    "dedup_lsh_band_ladder": 4,
    # one row per filter rule, zero counts on empty
    "pipeline_filter_attribution": 4,
    # one row per candidate threshold, zero counts on empty
    "dedup_threshold_sweep": 6,
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for name in TABLE_NAMES:
        df = spark.createDataFrame([], TABLE_SCHEMAS[name])
        df.write.mode("overwrite").parquet(str(d / f"{name}.parquet"))
    return str(d)


@pytest.mark.fullsweep
def test_all_queries_survive_empty_tables(spark, empty_sf_dir):
    failures = []
    for name, fn in sorted(all_queries().items()):
        if name in EMPTY_EXEMPT:
            continue
        try:
            n = fn(spark, empty_sf_dir).count()
            # global aggregates legitimately return one row of
            # null/zero aggregates on empty input; fixed-row reports
            # keep their per-relationship rows; everything else: 0
            assert n <= FIXED_ROWS.get(name, 1), (
                f"{name}: {n} rows from empty input"
            )
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


def test_python_udfs_unpickle_without_repo_on_path(tmp_path):
    """Executor Python workers don't necessarily have this repo on
    sys.path (a driver harness can import __spark_entry__ by file path
    from any cwd).  Every Python UDF the engine ships must therefore
    cloudpickle BY VALUE: this pickles them with pyspark's cloudpickle
    and unpickles + runs them in a subprocess whose sys.path excludes
    the repo — the exact failure mode is ModuleNotFoundError at
    unpickle time."""
    import subprocess
    import sys as _sys

    from pyspark import cloudpickle

    from bigdata_gamedb_etl_spark.operators import multimodal
    from bigdata_gamedb_etl_spark.streaming import windowed

    blobs = {
        "mm_extract": multimodal._extract_batches,
        "stream_running_totals": windowed._running_totals,
    }
    for name, fn in blobs.items():
        p = tmp_path / f"{name}.pkl"
        p.write_bytes(cloudpickle.dumps(fn))
    driver = tmp_path / "drive.py"
    driver.write_text(
        """
import pickle, sys, pandas as pd
assert not any("repo" in p for p in sys.path if p), sys.path
fn = pickle.loads(open(sys.argv[1], "rb").read())
if "mm_extract" in sys.argv[1]:
    out = list(fn(iter([pd.DataFrame({"doc_id": [1], "payload": [b"xyz"]})])))
    assert out[0]["payload_bytes"].iloc[0] == 3
print("OK")
"""
    )
    for name in blobs:
        r = subprocess.run(
            [_sys.executable, str(driver), str(tmp_path / f"{name}.pkl")],
            capture_output=True,
            text=True,
            cwd="/",
            env={"PATH": os.environ["PATH"], "PYTHONPATH": ""},
        )
        assert r.returncode == 0 and "OK" in r.stdout, (name, r.stderr[-2000:])


def test_cluster_assign_reliable_checkpoint_path(spark, sf_dir):
    """The fault-tolerant materialization (reliable checkpoint() files
    instead of executor-local blocks) must produce exactly the same
    components as the default path — it only changes where the
    truncated lineage's data lives."""
    from bigdata_gamedb_etl_spark.operators.dedup import (
        RELIABLE_CKPT_CONF,
        dedup_cluster_assign,
    )

    baseline = sorted(
        tuple(r) for r in dedup_cluster_assign(spark, sf_dir).collect()
    )
    spark.conf.set(RELIABLE_CKPT_CONF, "true")
    try:
        reliable = sorted(
            tuple(r) for r in dedup_cluster_assign(spark, sf_dir).collect()
        )
    finally:
        spark.conf.unset(RELIABLE_CKPT_CONF)
    from bigdata_gamedb_etl_spark.operators.dedup import _ckpt_local_dir

    assert spark.sparkContext.getCheckpointDir() is not None
    assert reliable == baseline
    # superseded per-iteration label checkpoints must be deleted as the
    # loop advances (Spark's own cleaner is GC-driven and off by
    # default) — only the edge list, the final labels, and at most the
    # in-flight iteration's files may remain, not one per iteration.
    local = _ckpt_local_dir(spark)
    assert local is not None
    remaining = [e for e in os.listdir(local) if e.startswith("rdd-")]
    assert len(remaining) <= 3, (
        f"checkpoint dir leaks superseded iterations: {sorted(remaining)}"
    )


def test_graph_queries_reliable_checkpoint_path(spark, sf_dir):
    """The graph family's materialize-once edge lists honor the same
    fault-tolerant checkpoint switch as the CC loop: identical results
    on both paths, including PageRank's per-iteration checkpoint
    rotation (exact-ownership cleanup) under the reliable conf."""
    from bigdata_gamedb_etl_spark.operators.dedup import RELIABLE_CKPT_CONF
    from bigdata_gamedb_etl_spark.operators.graph import (
        graph_2hop_reach,
        graph_pagerank,
    )

    base_2hop = sorted(tuple(r) for r in graph_2hop_reach(spark, sf_dir).collect())
    base_pr = sorted(tuple(r) for r in graph_pagerank(spark, sf_dir).collect())
    spark.conf.set(RELIABLE_CKPT_CONF, "true")
    try:
        rel_2hop = sorted(
            tuple(r) for r in graph_2hop_reach(spark, sf_dir).collect()
        )
        rel_pr = sorted(
            tuple(r) for r in graph_pagerank(spark, sf_dir).collect()
        )
    finally:
        spark.conf.unset(RELIABLE_CKPT_CONF)
    assert rel_2hop == base_2hop
    assert rel_pr == base_pr
