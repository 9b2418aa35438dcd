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

from bigdata_gamedb_etl_spark.operators import multimodal
from bigdata_gamedb_etl_spark.registry import all_queries
from bigdata_gamedb_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: SHARED12 is the round-1 headline set, pinned forever as the
#: round-over-round comparable — its sum must never regress and stays
#: attributable because the membership is frozen.  New rounds add hard
#: shapes to EXTRAS instead of growing the comparable set.
SHARED12 = [
    "tpch_q1_pricing_summary",
    "a1_word_revenue",
    "j1_region_revenue",
    "w4_daily_event_rollup",
    "sql_word_price_stats",
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "sim_cosine_topk",
    "sim_knn_top1",
    "sess1_user_sessions",
    "text_stats",
    "mm_feature_extract",
]

#: the hard shapes added after round 1: aggregate-then-join (q18), the
#: hardest TPC-H subquery shape (q21), iterative connected components,
#: as-of and banded interval joins, sequence packing.
EXTRAS = [
    "tpch_q18_large_volume",
    "tpch_q21_sole_returned",
    "dedup_cluster_assign",
    "asof_purchase_click",
    "interval_error_click_burst",
    "pipeline_pack_sequences",
]

HEADLINE = SHARED12 + EXTRAS


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    queries = dict(all_queries())
    # SHARED12 comparability pin: the registry's "mm_feature_extract"
    # was re-pointed (round 3) to the harness-safe JSON twin, which adds
    # to_json + a global orderBy the r1/r2 numbers never measured.
    # Bench keeps timing the typed-array variant so the pinned series
    # stays one implementation.
    queries["mm_feature_extract"] = multimodal.mm_feature_extract
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
                "shared12_sec": round(
                    sum(timings[n] for n in SHARED12), 3
                ),
                "extras_sec": round(sum(timings[n] for n in EXTRAS), 3),
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
