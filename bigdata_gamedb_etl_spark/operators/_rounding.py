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
