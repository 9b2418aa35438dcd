"""Skew mitigation: salted joins.

AQE's skew-join handles most runtime skew (enabled in session.py), but
a pathologically hot key in a shuffle join still needs salting: the
fact side scatters each hot key across N salt buckets, the dimension
side replicates N ways, and the join key becomes (key, salt).  The
shuffle then spreads one hot key over N reducers.

Determinism: the fact-side salt derives from xxhash64 of a per-row
distinguishing column — stable across runs (no rand())."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_facts(facts: DataFrame, distinct_col: str, n_salts: int = 8) -> DataFrame:
    """Attach a deterministic salt in [0, n_salts) derived from a
    per-row column (any column with per-row variety works)."""
    return facts.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts)).cast("int")
    )


def explode_dim(dim: DataFrame, n_salts: int = 8) -> DataFrame:
    """Replicate the dimension n_salts times, one row per salt value."""
    return dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Column,
    distinct_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: semantically identical to
    facts.join(dim, on, how) for how in {inner, left} — the shuffle
    spreads each key over n_salts partitions.  `on` is the original join
    condition; the salt equality is added on top.

    Only inner/left are supported: explode_dim replicates every dim row
    n_salts times, so a right/full outer join would emit n_salts
    null-extended duplicates for each unmatched dim row."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "the replicated dimension would duplicate unmatched rows "
            "under right/full outer semantics"
        )
    f = salt_facts(facts, distinct_col, n_salts)
    d = explode_dim(dim, n_salts)
    joined = f.join(
        d, on & (f[SALT_COL] == d[SALT_COL]), how
    )
    return joined.drop(SALT_COL)
