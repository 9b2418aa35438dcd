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
