"""Engine-agreed rounding helpers shared across operator modules.

Lives in its own leaf module (no intra-package imports) so any
operator module can use it without import-order coupling: round 7
found that `textops` importing the helper FROM `dedup` made
`import textops` crash when it ran before `dedup` (dedup's module
body imports back from textops to build its keeper oracle) — the
registry's import order masked the cycle, a direct import hit it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _fr4(x):
    """floor(x*1e4+0.5)/1e4 — identical to HALF_UP for the non-negative
    ratios it rounds, but engine-agreed at exact dyadic halfway values
    (e.g. common/union = 68/128 = 0.53125) where Spark's ROUND rounds
    up and DuckDB's rounds to even.  Oracle twins carry the same form.

    SIGNED inputs (dq_distribution_drift.drift_pp, w11 mom_pct, and any
    future delta column reusing this recipe): the semantics are
    round-half-toward-POSITIVE-INFINITY, not half-away-from-zero —
    floor(-0.00125*1e4+0.5) = floor(-12.0) = -12, i.e. -0.00125 rounds
    to -0.0012 where HALF_UP would give -0.0013.  Cross-engine parity
    is unaffected (both twins share the formula); downstream consumers
    reading exact dyadic negative halfway values should expect the
    +inf direction."""
    return F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def _fr(x, digits: int):
    """The floor recipe at an arbitrary decimal scale — same semantics
    as _fr4 (half-toward-+inf on exact halves, engine-agreed given
    identical double inputs).  Used by the r8 round-on-average sweep:
    every per-group average of a double column now goes through an
    exact DECIMAL sum divided by the count, then this recipe — ROUND
    on the double average was the w10 hazard class (Spark half-up vs
    DuckDB half-even on representable halves, on top of
    partition-order fp sums feeding the two engines different
    doubles)."""
    s = float(10 ** digits)
    return F.floor(x * F.lit(s) + F.lit(0.5)) / F.lit(s)


def _avg_q(col, digits: int):
    """Engine-agreed average of a FIXED-POINT double column (values
    exact at ≤ `digits` decimal places, non-negative): quantize each
    row to a scaled BIGINT (round(col·10^digits) — exact, the input is
    never near a rounding boundary because it IS a digits-dp value up
    to ~1e-9 of fp noise), long-sum (integer sums are order-free, so
    both engines see the identical total), scale back, floor-round.

    This is the cheap twin of _avg_dec for the hot path: a decimal
    aggregation runs the 128-bit sum loop per row, ~2× the whole-stage
    cost of a long sum on the q1 shape (measured 2.16 s → 1.09 s at
    sf0.1).  Only valid where the column is certified fixed-point
    (TPC-H money/quantity/rate columns — pinned by
    tests/test_properties.py::test_money_columns_are_fixed_point);
    free-form doubles (events.value) stay on _avg_dec.

    Overflow bound: the scaled sum must fit BIGINT.  Worst case
    l_extendedprice ≈ 1.05e7 cents/row → ~8e11 rows (the ~100 TB
    TPC-H lineitem) sums to ~3e18 of the 9.2e18 BIGINT range — ~3×
    headroom at target scale; the all-scales-safe fallback is
    _avg_dec.  Oracle twin (op-for-op identical double arithmetic):
    floor(SUM(CAST(round(col * 10^d) AS BIGINT)) / 10^d.0
          / COUNT(col) * 10^d.0 + 0.5) / 10^d.0"""
    s = float(10 ** digits)
    q = F.round(col * F.lit(s)).cast("long")
    return _fr(F.sum(q) / F.lit(s) / F.count(col), digits)


def _avg_dec(col, digits: int, decimal_type: str = "decimal(18,6)"):
    """Engine-agreed average of a double column: exact DECIMAL sum
    (order-free) cast back to double, divided by the non-null count,
    floor-rounded at `digits`.  Oracle twin:
    floor(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c)
          * 10^digits + 0.5) / 10^digits."""
    return _fr(
        F.sum(col.cast(decimal_type)).cast("double") / F.count(col),
        digits,
    )
