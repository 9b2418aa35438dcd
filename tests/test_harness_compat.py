"""Harness-compatibility audit.

Two failure classes have produced red driver CORRECTNESS rows despite
value-identical results: (a) DuckDB returning HUGEINT (int128) for
integer SUMs — the driver's value-hash canonicalizes int128 differently
from Spark's bigint (burned sess1_user_sessions and tpch_q12 in rounds
1-2) — and (b) complex-typed output columns (array/map), which crash
the driver's pandas row canonicalizer with "unhashable type"
(burned the map-mart in r1 and mm_feature_extract in r2).

These tests bind every oracle (DuckDB DESCRIBE — no execution) and
every registered query's schema (plan only — no execution) and reject
both classes up front, so a new query can't reintroduce either.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from bigdata_gamedb_etl_spark.registry import all_oracle, all_queries

QUERIES = all_queries()
ORACLE = all_oracle()

#: DECIMAL is banned in oracle *output* too: every oracle in this repo
#: computes in DECIMAL where order-free exactness matters, then casts
#: the result to DOUBLE — a DECIMAL that leaks to the output means the
#: cast was forgotten and the driver-vs-Spark dtype differs.
BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "INT128", "DECIMAL")


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_output_types_hash_safe(name, duck):
    rows = duck.execute("DESCRIBE " + ORACLE[name]).fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in BANNED_DUCK_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle output columns {bad} are HUGEINT/DECIMAL-class; "
        "CAST(... AS BIGINT/DOUBLE) in the oracle SQL or the driver's "
        "value-hash will mismatch Spark's dtype"
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_registered_query_schema_flat(name, spark, sf_dir):
    schema = QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: complex-typed output columns {bad} crash the driver's "
        "row canonicalizer; serialize with to_json or flatten to scalars "
        "in the registered form (keep the typed variant unregistered)"
    )


def test_every_query_has_driver_evidence_or_is_queued():
    """Structural rotation guard (r4 verdict item 3): a registered
    query with no row in ANY historical CORRECTNESS_r*.json must sit
    inside the driver's 50-entry PRIORITY window, so it gets driver
    evidence the round it lands.  Round 4 registered 5 queries without
    rotating the window; one of them was red and nobody could tell."""
    import glob
    import json
    import os

    from bigdata_gamedb_etl_spark.registry import PRIORITY

    root = os.path.join(os.path.dirname(__file__), "..")
    checked: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        checked.update(json.load(open(f)).keys())
    window = set(PRIORITY[:50])
    unqueued = [n for n in QUERIES if n not in checked and n not in window]
    assert not unqueued, (
        f"queries with no driver evidence and not in the head-50 window: "
        f"{unqueued} — append them to the current round's *_NEW list in "
        "registry.py in the same commit that registers them"
    )


def test_readme_counts_match_registry():
    """README's 'N named queries (M oracle-backed)' claim is asserted
    against the registry so the docs can't drift from the gate again."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(__file__), "..", "README.md")
    ).read()
    m = re.search(r"exposes (\d+) named queries \((\d+) oracle-backed\)", readme)
    assert m, "README correctness-contract sentence not found"
    assert int(m.group(1)) == len(QUERIES)
    assert int(m.group(2)) == len(ORACLE)
