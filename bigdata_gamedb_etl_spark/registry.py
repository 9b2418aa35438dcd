"""Central query registry — merges every operator module's QUERIES and
ORACLE dicts into the driver contract surface (__spark_entry__.py).

Each operator module exports:
  QUERIES: dict[name, (spark, sf_dir) -> DataFrame]
  ORACLE:  dict[name, ANSI SQL string runnable by DuckDB]
A name present in QUERIES but absent from ORACLE is a declared
rows-only check (non-SQL-expressible or approximate by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    core,
    dedup,
    extended,
    joins,
    marts,
    multimodal,
    pipeline,
    similarity,
    sketches,
    sqlqueries,
    temporal,
    textops,
    tpch,
    tpch2,
    windows,
)

# Order matters: the driver's correctness gate checks a bounded prefix of
# this registry (r1 stopped at 50 entries), so the modules whose queries
# most need fresh hard evidence come first — the LLM-pipeline surface
# (dedup/similarity/textops/multimodal, unchecked in r1), then extended
# (sess1 rounding fix, p4-p6 unchecked), marts (MapType fix), tpch
# (broadcast-hint change) and the round-2 additions (temporal, tpch2,
# sketches) — ahead of the star-schema families already proven green in
# CORRECTNESS_r01.json, which rotate back into the window in later
# rounds.
MODULES = [
    dedup, similarity, textops, multimodal,
    extended, marts, temporal, tpch2, sketches, tpch,
    pipeline, core, sqlqueries, windows, joins,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names from {m.__name__}: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in MODULES:
        out.update(m.ORACLE)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    return out
