#!/usr/bin/env python
"""Benchmark harness: times the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Execution is forced with a `noop` sink (full computation, no
driver-side result transfer), so timings measure scan+shuffle+agg —
the things that matter at 100 TB — not Py4J serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline mix: scan-agg (q1, a1), star join (j1), aggregate-then-join
#: (q18), the hardest TPC-H subquery shape (q21), window (w4), SQL
#: surface (a6), near-dup exact + LSH + iterative connected components,
#: vector search (exact scan + blocked-GEMM 1-NN), sessionization,
#: as-of and banded interval joins, text scan, sequence packing,
#: Arrow-batched Python path (mm).
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q18_large_volume",
    "tpch_q21_sole_returned",
    "a1_word_revenue",
    "j1_region_revenue",
    "w4_daily_event_rollup",
    "sql_word_price_stats",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_cluster_assign",
    "sim_cosine_topk",
    "sim_knn_top1",
    "sess1_user_sessions",
    "asof_purchase_click",
    "interval_error_click_burst",
    "text_stats",
    "pipeline_pack_sequences",
    "mm_feature_extract",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    queries = all_queries()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path once so per-query timings aren't
    # dominated by first-action startup cost.
    _force(queries["tpch_q1_pricing_summary"](spark, SF_DIR))

    # best-of-2 per query: the first run is dominated by single-threaded
    # driver work (Catalyst optimization + Janino codegen compilation,
    # measured ~90% idle CPU locally) that amortizes to nothing over a
    # real 100 TB execution; the second run measures the steady-state
    # scan+shuffle+agg cost that actually scales with data.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": f"headline-query wall clock (noop sink, best of 2 runs), sum of {len(HEADLINE)} queries",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
