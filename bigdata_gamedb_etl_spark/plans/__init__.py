"""Physical-plan introspection helpers.

The scale contract (SURVEY.md §4) is enforced here: tests assert that
dimension joins broadcast, predicates reach the parquet scan, scans
prune columns, and hot paths stay inside whole-stage codegen — so a
regression that silently degrades the 100 TB plan fails CI, not the
cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string `df.explain(mode)` would print."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def physical(df: DataFrame) -> str:
    return explain_str(df, "simple")


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical(df)


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters lines from the formatted plan."""
    return "\n".join(
        line
        for line in explain_str(df, "formatted").splitlines()
        if "PushedFilters" in line
    )


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema lines — what each parquet scan actually reads
    (column pruning evidence)."""
    return [
        line.strip()
        for line in explain_str(df, "formatted").splitlines()
        if "ReadSchema" in line
    ]


def num_exchanges(df: DataFrame) -> int:
    """Shuffle count in the physical plan (AQE may collapse further at
    runtime; this is the static upper bound)."""
    return physical(df).count("Exchange")


def num_broadcast_hints(df: DataFrame) -> int:
    """Explicit broadcast hints in the analyzed logical plan.  A hint
    overrides AQE's size check, so the scale contract allows them ONLY
    on fixed-cardinality dimensions (sources.catalog.DIMENSION_TABLES:
    region, nation) — every SF-scaling table (customer, orders, part,
    supplier) must be AQE-decided."""
    return df._jdf.queryExecution().analyzed().toString().count("ResolvedHint")


def optimized(df: DataFrame) -> str:
    """Catalyst-optimized logical plan — where injected runtime filters
    (bloom_filter_agg / might_contain) are visible before physical
    planning."""
    return df._jdf.queryExecution().optimizedPlan().toString()


def subtree(plan: str, op: str) -> str:
    """The pre-order subtree rooted at the first plan line containing
    `op`: that line plus every following line with strictly greater
    tree indentation.  Substring offsets alone can't prove ancestry
    (a later SIBLING subtree also prints after the anchor); indentation
    depth can."""
    import re

    def _depth(line: str) -> int:
        return len(re.match(r"^[\s:+\-]*", line).group(0))

    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if op in ln:
            d = _depth(ln)
            out = [ln]
            for nxt in lines[i + 1 :]:
                if nxt.strip() and _depth(nxt) <= d:
                    break
                out.append(nxt)
            return "\n".join(out)
    return ""


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # under AQE the pre-execution simple plan hides codegen spans; the
    # codegen explain mode reports generated subtrees directly.
    return "WholeStageCodegen subtree" in explain_str(df, "codegen")


def num_explodes(df: DataFrame) -> int:
    """Generate-explode count in the OPTIMIZED logical plan — the
    duplicate-subtree detector: branching an exploded relation into
    differently-filtered consumers re-executes the explode per branch
    (Catalyst pushes grouping-key predicates below aggregates, so
    exchange reuse can't recover it).  Count here, not in the physical
    string, so materialized-RDD barriers (CC loops) don't hide or
    inflate the number."""
    return (
        df._jdf.queryExecution().optimizedPlan().toString()
        .count("Generate explode")
    )


def finalized(df: DataFrame) -> str:
    """The post-execution adaptive physical plan.  AQE only inserts
    ReusedExchange (and its final join strategies) after the run, so
    reuse contracts must execute the query first — `df.first()` plans
    a SEPARATE limited query, hence the collect."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()
