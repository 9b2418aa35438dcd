"""Empirical scale check (opt-in: SPARK_GRAFT_SCALE_TEST=1): the
dedup/ANN/graph family must stay ~linear on a 10x replica slice.
bench.py records the same ratios per round; this test makes the bound
assertable on demand without slowing the default suite.
"""

from __future__ import annotations

import os
import time

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="opt-in scale probe (SPARK_GRAFT_SCALE_TEST=1); bench.py "
    "records the same ratios every round",
)

#: sub-quadratic bound: at factor 10 a linear family lands well under
#: 10 (fixed overheads amortize); a quadratic one lands near 100.
#: 8.0 leaves headroom for noise while still failing hard on any
#: accidentally-quadratic regression.
MAX_RATIO = 8.0
FACTOR = 10
PROBE = [
    "dedup_ngram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_repeated_ngram_share",
    "graph_2hop_reach",
    "sim_cosine_topk",
]


def test_family_scales_sublinearly(spark):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import _ensure_scale_slice, _testdata_fingerprint

    from bigdata_gamedb_etl_spark.registry import all_queries

    sf_dir = "/root/testdata/sf0.1"
    fp = _testdata_fingerprint(sf_dir)["hash"]
    probe_dir = _ensure_scale_slice(sf_dir, FACTOR, fp)
    queries = all_queries()

    def run(name, d):
        df = queries[name](spark, d)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    bad = []
    for name in PROBE:
        base = run(name, sf_dir)
        scaled = run(name, probe_dir)
        ratio = scaled / base if base else 0.0
        if ratio > MAX_RATIO:
            bad.append((name, round(base, 2), round(scaled, 2), round(ratio, 2)))
    assert not bad, f"super-linear scaling at {FACTOR}x: {bad}"
