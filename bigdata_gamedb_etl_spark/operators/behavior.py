"""User-behavior analytics over the events stream: funnel conversion
and cohort retention — the two queries every game-analytics deployment
of the reference's domain (game telemetry) runs daily.

Scale notes: both queries shuffle events exactly once on user_id and
reuse that grain for every later aggregate (AQE coalesces the
co-partitioned joins); cohort output cardinality is weeks², funnel
output is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import table
from ._rounding import _fr, _fr4

_HOURS_US = 3_600_000_000.0  # microseconds per hour


def funnel_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged funnel view → click → purchase: a user converts a stage
    only with an event strictly AFTER their previous stage's first
    event (ordered funnel, not mere event presence).  Returns one row
    of stage counts plus the mean view→purchase latency in hours.

    The latency mean follows the engine's decimal recipe (sum as
    DECIMAL(18,6), divide, round) — float-sum order would otherwise
    flip the rounded value between runs."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_view = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    first_click = (
        e.where(F.col("event_type") == "click")
        .join(first_view, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    first_purchase = (
        e.where(F.col("event_type") == "purchase")
        .join(first_click, "user_id")
        .where(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    funnel = (
        first_view.join(first_click, "user_id", "left")
        .join(first_purchase, "user_id", "left")
    )
    hours = (
        (F.unix_micros("first_purchase") - F.unix_micros("first_view")) / _HOURS_US
    ).cast("decimal(18,6)")
    return funnel.agg(
        F.count("*").alias("viewers"),
        F.count("first_click").alias("clickers"),
        F.count("first_purchase").alias("purchasers"),
        # decimal-exact sum, then one double ratio through the floor
        # recipe — ROUND on the decimal/int division had engine-specific
        # scale semantics (r8 sweep)
        _fr(
            F.sum(hours).cast("double") / F.count("first_purchase"), 2
        ).alias("avg_hours_to_purchase"),
    )


FUNNEL_ORACLE = """
WITH fv AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
fc AS (
  SELECT e.user_id, MIN(e.ts) AS first_click
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'click' AND e.ts > fv.first_view
  GROUP BY e.user_id
),
fp AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN fc ON e.user_id = fc.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fc.first_click
  GROUP BY e.user_id
)
SELECT COUNT(*) AS viewers,
       COUNT(fc.first_click) AS clickers,
       COUNT(fp.first_purchase) AS purchasers,
       floor(CAST(SUM(CAST((epoch_us(fp.first_purchase) - epoch_us(fv.first_view))
                            / 3600000000.0 AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(fp.first_purchase) * 100.0 + 0.5) / 100.0
         AS avg_hours_to_purchase
FROM fv
LEFT JOIN fc ON fv.user_id = fc.user_id
LEFT JOIN fp ON fv.user_id = fp.user_id
"""


def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the Monday-truncated
    week of their first event; each later active week counts toward
    (cohort_week, week_offset).  Week offsets are exact day-diffs / 7
    since both ends are week-truncated."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    act = (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_ORACLE = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_week,
         CAST(datediff('day', f.cohort_week,
                       CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT)
           AS week_offset
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT cohort_week, week_offset, COUNT(*) AS active_users
FROM act
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-event-type volume anomalies: each day's count scored
    against its trailing 7 observed days (ROWS window, so calendar gaps
    simply shorten history — only full windows score).  Flags |z| >= 1.5.

    Determinism across engines: the window aggregates are EXACT integer
    sums (n, n²); mean/variance/z are then derived with one explicit
    arithmetic expression evaluated identically by both engines —
    no engine-specific stddev implementation (Welford vs two-pass) in
    the path.  Scale: one shuffle to (event_type, day) grain — output
    cardinality types×days — then a tiny partitioned window."""
    e = table(spark, sf_dir, "events")
    daily = (
        e.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    mean = F.col("s") / F.lit(7.0)
    var = (F.col("ss") - F.lit(7.0) * mean * mean) / F.lit(6.0)
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        daily.select(
            "event_type",
            "day",
            "n",
            F.count("*").over(w).alias("w_days"),
            F.sum("n").over(w).alias("s"),
            F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
        )
        .where(F.col("w_days") == 7)
        .select(
            "event_type",
            "day",
            "n",
            (
                F.floor(mean * F.lit(10000.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("trailing_mean"),
            F.round(z, 4).alias("z"),
        )
        .where(var > 0)
        .where(F.abs(z) >= 1.5)
        .orderBy("event_type", "day")
    )


ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
win AS (
  SELECT event_type, day, n,
         COUNT(*) OVER w AS w_days,
         CAST(SUM(n) OVER w AS BIGINT) AS s,
         CAST(SUM(n * n) OVER w AS BIGINT) AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, n,
       floor(s / 7.0 * 10000.0 + 0.5) / 10000.0 AS trailing_mean,
       ROUND((n - s / 7.0) / sqrt((ss - 7.0 * (s / 7.0) * (s / 7.0)) / 6.0), 4) AS z
FROM win
WHERE w_days = 7
  AND (ss - 7.0 * (s / 7.0) * (s / 7.0)) / 6.0 > 0
  AND abs((n - s / 7.0) / sqrt((ss - 7.0 * (s / 7.0) * (s / 7.0)) / 6.0)) >= 1.5
ORDER BY event_type, day
"""


# --------------------------------------------------------------------------
# RFM segmentation — the classic customer-value grid.  One hash-agg to
# customer grain (the only corpus-sized shuffle), then QUINTILE CUT
# POINTS from a single global aggregate broadcast back over the
# customer grain — NOT global ntile windows.  The r4 ntile form moved
# the entire customer-grain table to a single partition three times
# (WindowExec "No Partition Defined"); at 100 TB of orders the
# customer dimension is billions of rows, so a single-task sort is a
# hard scale-killer.  The cut-point form is: hash-agg → one-row
# aggregate (partial+final, no sort) → broadcast → CASE bucket — every
# stage parallel, nothing ever on one task (VERDICT r4 item 4).
RFM_BUCKETS = 5
_RFM_PS = [0.2, 0.4, 0.6, 0.8]


def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/Frequency/Monetary quintile grid over orders: per-cell
    customer count and average spend.

    Scores are assigned by comparing each metric against the four
    percentile_disc quintile cuts (score 1 = best: most recent / most
    frequent / highest spend).  Unlike ntile, equal metric values
    always get equal scores (ties are not split across buckets), which
    is both the analytically-honest grid and the reason no global sort
    is needed.

    Determinism across engines: percentile_disc SELECTS an actual data
    value (no interpolation — Spark and DuckDB agree on 'smallest
    value with cdf ≥ p'), metrics are exact (ints / DECIMAL sums cast
    once to double), so every comparison sees identical bits."""
    o = table(spark, sf_dir, "orders")
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count("*").alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(ref))
        .withColumn("recency_days", F.datediff("ref_day", "last_day"))
        .withColumn("monetary_d", F.col("monetary").cast("double"))
    )
    cuts = per_cust.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m})"
            ).alias(f"{m}_c{int(p * 100)}")
            for m in ("recency_days", "freq", "monetary_d")
            for p in _RFM_PS
        ]
    )

    def _above(metric: str) -> F.Column:
        # how many quintile cuts the value exceeds: 0..4
        s = F.lit(0)
        for p in _RFM_PS:
            s = s + F.when(
                F.col(metric) > F.col(f"{metric}_c{int(p * 100)}"), 1
            ).otherwise(0)
        return s

    scored = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "monetary",
        # low recency = recent = best → score 1 + cuts-exceeded
        (F.lit(1) + _above("recency_days")).alias("r_score"),
        # high freq/monetary = best → score 5 - cuts-exceeded
        (F.lit(5) - _above("freq")).alias("f_score"),
        (F.lit(5) - _above("monetary_d")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score")
        .agg(
            F.count("*").alias("customers"),
            (
                F.floor(F.avg("m_score") * F.lit(10000.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("avg_m_score"),
            # exact decimal total, then one double division+round done
            # identically by both engines (decimal÷int rounding rules
            # differ between Spark and DuckDB; double division doesn't)
            _fr(
                F.sum("monetary").cast("double") / F.count("*"), 2
            ).alias("avg_spend"),
        )
        .orderBy("r_score", "f_score")
    )


def _rfm_cut_cols() -> str:
    return ",\n         ".join(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY {m}) AS {m}_c{int(p * 100)}"
        for m in ("recency_days", "freq", "monetary_d")
        for p in _RFM_PS
    )


def _rfm_above(metric: str) -> str:
    return " + ".join(
        f"(CASE WHEN {metric} > {metric}_c{int(p * 100)} THEN 1 ELSE 0 END)"
        for p in _RFM_PS
    )


RFM_ORACLE = f"""
WITH per_cust0 AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         COUNT(*) AS freq,
         SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
  FROM orders GROUP BY o_custkey
),
ref AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
per_cust AS (
  SELECT o_custkey, freq, monetary,
         datediff('day', last_day, ref_day) AS recency_days,
         CAST(monetary AS DOUBLE) AS monetary_d
  FROM per_cust0 CROSS JOIN ref
),
cuts AS (
  SELECT {_rfm_cut_cols()}
  FROM per_cust
),
scored AS (
  SELECT o_custkey, monetary,
         1 + {_rfm_above("recency_days")} AS r_score,
         5 - ({_rfm_above("freq")}) AS f_score,
         5 - ({_rfm_above("monetary_d")}) AS m_score
  FROM per_cust CROSS JOIN cuts
)
SELECT r_score, f_score,
       COUNT(*) AS customers,
       floor(AVG(m_score) * 10000.0 + 0.5) / 10000.0 AS avg_m_score,
       floor(CAST(SUM(monetary) AS DOUBLE) / COUNT(*) * 100.0 + 0.5) / 100.0
         AS avg_spend
FROM scored
GROUP BY r_score, f_score
ORDER BY r_score, f_score
"""


# --------------------------------------------------------------------------
# Last-touch attribution: credit each purchase to the user's most
# recent strictly-preceding marketing touch (view or click).  The
# canonical shape everywhere event pipelines meet revenue reporting.
#
# Scale plan: ONE window partitioned by user_id — the scan shuffles
# events once on the user key and every user's timeline sorts
# independently in parallel (contrast a global sort: none here).  The
# frame is ROWS UNBOUNDED PRECEDING..1 PRECEDING with ignorenulls
# last(), so Spark keeps a single running value per partition rather
# than buffering the frame.  Output cardinality is |touch types| + 1.
_TOUCH_TYPES = ("view", "click")


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases and revenue by last preceding touch type per user;
    purchases with no preceding touch land in the '(none)' row.

    Ordering ties: (ts, event_id) — event_id is unique, so the running
    last-touch value is deterministic even if two events of one user
    share a timestamp (both engines sort the identical key)."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin(*_TOUCH_TYPES), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("touch", touch)
        .where(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("(none)")).alias("touch"))
        .agg(
            F.count("*").alias("purchases"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")), 2
            ).cast("double").alias("revenue"),
        )
        .orderBy("touch")
    )


ATTRIBUTION_ORACLE = """
WITH touched AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT COALESCE(touch, '(none)') AS touch,
       COUNT(*) AS purchases,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM touched
WHERE event_type = 'purchase'
GROUP BY COALESCE(touch, '(none)')
ORDER BY touch
"""


# --------------------------------------------------------------------------
# Churn-risk flags: the retention dashboard's per-user row — recency
# vs the corpus clock, short-window activity trend, and a churn flag.
# One scan of events (the reference window conditions are evaluated
# inside a single user-grain hash-agg after a broadcast of the one-row
# corpus max — no second pass, no window function).
CHURN_INACTIVE_DAYS = 14
_WEEK_US = 7 * 86_400_000_000


def churn_activity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: last-active day, days inactive vs the corpus max,
    events in the trailing week and the week before it, the
    week-over-week activity ratio, and a churned flag."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    ref = e.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    us = F.unix_micros("ts")
    per_user = (
        e.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.to_date(F.max(F.date_trunc("day", "ts"))).alias("last_day"),
            F.first(
                F.to_date(
                    F.date_trunc("day", F.timestamp_micros(F.col("ref_us")))
                )
            ).alias("ref_day"),
            F.sum(
                F.when(us > F.col("ref_us") - _WEEK_US, 1).otherwise(0)
            ).alias("events_last_wk"),
            F.sum(
                F.when(
                    (us > F.col("ref_us") - 2 * _WEEK_US)
                    & (us <= F.col("ref_us") - _WEEK_US),
                    1,
                ).otherwise(0)
            ).alias("events_prior_wk"),
        )
    )
    return per_user.select(
        "user_id",
        "last_day",
        F.datediff("ref_day", "last_day").alias("days_inactive"),
        "events_last_wk",
        "events_prior_wk",
        # integer/integer → one double division, NULL when no prior.
        # 4dp via floor(x·1e4 + 0.5)/1e4, NOT ROUND: Spark and DuckDB
        # disagree on exact-halfway doubles (e.g. prior=32 with odd
        # last-week counts yields x.xxxx5 exactly) — stat_corr_matrix's
        # recipe, applied to every double-ratio rounding in this repo.
        (
            F.floor(
                F.col("events_last_wk")
                / F.when(F.col("events_prior_wk") > 0, F.col("events_prior_wk"))
                * F.lit(10000.0)
                + F.lit(0.5)
            )
            / F.lit(10000.0)
        ).alias("wow_activity_ratio"),
        (
            F.datediff("ref_day", "last_day") > CHURN_INACTIVE_DAYS
        ).alias("churned"),
    ).orderBy("user_id")


CHURN_ORACLE = f"""
WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
per_user AS (
  SELECT user_id,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS last_day,
         CAST(date_trunc('day', make_timestamp(ANY_VALUE(ref_us))) AS DATE)
           AS ref_day,
         SUM(CASE WHEN epoch_us(ts) > ref_us - {_WEEK_US}
                  THEN 1 ELSE 0 END) AS events_last_wk,
         SUM(CASE WHEN epoch_us(ts) > ref_us - {2 * _WEEK_US}
                   AND epoch_us(ts) <= ref_us - {_WEEK_US}
                  THEN 1 ELSE 0 END) AS events_prior_wk
  FROM events CROSS JOIN ref
  GROUP BY user_id
)
SELECT user_id,
       last_day,
       CAST(datediff('day', last_day, ref_day) AS INTEGER) AS days_inactive,
       CAST(events_last_wk AS BIGINT) AS events_last_wk,
       CAST(events_prior_wk AS BIGINT) AS events_prior_wk,
       floor(events_last_wk / (CASE WHEN events_prior_wk > 0
                                    THEN events_prior_wk END)
             * 10000.0 + 0.5) / 10000.0
         AS wow_activity_ratio,
       datediff('day', last_day, ref_day) > {CHURN_INACTIVE_DAYS} AS churned
FROM per_user
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Audience-overlap matrix: |users(A) ∩ users(B)| and audience Jaccard
# for every event-type pair — the cross-feature engagement view (which
# behaviors share an audience) that sits between the funnel (ordered)
# and the cohort (temporal) analyses.
#
# Scale shape: collapse to the DISTINCT (user, type) grain first (one
# shuffle; the fact table's duplicate mass dies there), then a
# per-user self-join — bounded at C(|event types|, 2) rows per user,
# so the "self-join" is a narrow per-user expansion, never quadratic
# in users — and a hash-agg to the (t1, t2) grain.  Audience sizes
# join back from a broadcast-sized per-type aggregate.
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t1, t2, users_both, users_t1, users_t2, audience_jaccard) for
    every unordered event-type pair with at least one shared user."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type")
    ut = e.distinct()
    sizes = ut.groupBy("event_type").agg(
        F.count("*").alias("audience")
    )
    a, b = ut.alias("a"), ut.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"),
            F.col("b.event_type").alias("t2"),
        )
        .agg(F.count("*").alias("users_both"))
    )
    s1 = sizes.select(
        F.col("event_type").alias("t1"), F.col("audience").alias("users_t1")
    )
    s2 = sizes.select(
        F.col("event_type").alias("t2"), F.col("audience").alias("users_t2")
    )
    jac = F.col("users_both") / (
        F.col("users_t1") + F.col("users_t2") - F.col("users_both")
    )
    return (
        both.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1",
            "t2",
            "users_both",
            "users_t1",
            "users_t2",
            (
                F.floor(jac * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
            ).alias("audience_jaccard"),
        )
        .orderBy("t1", "t2")
    )


AUDIENCE_OVERLAP_ORACLE = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
sizes AS (
  SELECT event_type, COUNT(*) AS audience FROM ut GROUP BY event_type
),
both_t AS (
  SELECT a.event_type AS t1, b.event_type AS t2, COUNT(*) AS users_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT t1, t2, CAST(users_both AS BIGINT) AS users_both,
       CAST(s1.audience AS BIGINT) AS users_t1,
       CAST(s2.audience AS BIGINT) AS users_t2,
       floor(users_both * 1.0
             / (s1.audience + s2.audience - users_both)
             * 10000.0 + 0.5) / 10000.0 AS audience_jaccard
FROM both_t
JOIN sizes s1 ON s1.event_type = t1
JOIN sizes s2 ON s2.event_type = t2
ORDER BY t1, t2
"""


# --------------------------------------------------------------------------
# Activity-concentration (Gini) audit — how unequally events are
# distributed across users, the whale-detection number a telemetry
# pipeline tracks per release (Gini 0 = uniform, → 1 = a few users
# generate everything).
#
# Exact Gini needs ranks over a GLOBAL sort of per-user counts — a
# single-task window at the user grain, which does not scale.  This
# formulation groups users BY their event count first: the window then
# runs over DISTINCT COUNT VALUES (bounded by max events per user —
# hundreds, not the user cardinality), and the rank-sum of a block of
# m tied users is recovered in closed form (m·cum_before + m(m+1)/2).
# All terms stay integer until the final ratio, so both engines agree
# exactly.
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: users, events, and the Gini coefficient of per-user
    event counts (4dp, floor recipe)."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("c"))
    by_c = counts.groupBy("c").agg(F.count("*").alias("m"))
    w = (
        Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = by_c.select(
        "c",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("cum_before"),
    )
    # rank-sum terms widen to DECIMAL(38,0) BEFORE summing: c·m·cum is
    # ~(events/user)·users² and overflows int64 at production scale
    # (ANSI would crash Spark; DuckDB would error) — 38 digits cover it
    agg = staged.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("c") * F.col("m")).alias("s1"),
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(38,0)) * (CAST(m AS DECIMAL(38,0))"
                " * cum_before + m * (m + 1) DIV 2)"
            )
        ).alias("s2"),
    )
    # ratio arithmetic in double on identical inputs both engines (the
    # exact DECIMAL/BIGINT sums), denominator as double×double so n·s1
    # can't overflow int64 at scale
    gini = (F.lit(2.0) * F.col("s2").cast("double")) / (
        F.col("n").cast("double") * F.col("s1").cast("double")
    ) - (F.col("n") + F.lit(1.0)) / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("s1").cast("long").alias("n_events"),
        (
            F.floor(gini * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)
        ).alias("gini"),
    )


GINI_ORACLE = """
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
by_c AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM counts GROUP BY c),
staged AS (
  SELECT c, m,
         COALESCE(SUM(m) OVER (ORDER BY c
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
  FROM by_c
),
agg AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(c * m) AS BIGINT) AS s1,
         SUM(CAST(c AS DECIMAL(38,0)) * (CAST(m AS DECIMAL(38,0))
             * cum_before + m * (m + 1) // 2)) AS s2
  FROM staged
)
SELECT n AS n_users, s1 AS n_events,
       floor((2.0 * CAST(s2 AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(s1 AS DOUBLE))
              - (n + 1.0) / n) * 10000.0 + 0.5) / 10000.0 AS gini
FROM agg
"""


# --------------------------------------------------------------------------
# Lorenz decile table (r9) — the distribution detail behind the gini
# scalar above: per user-activity decile (poorest first), the user and
# event mass and the cumulative event share.  Computed WITHOUT ranking
# users: deciles are rank intervals (b_{k-1}, b_k], b_k = (k·n) DIV 10,
# and each count-of-counts group (c, m, cum_before) — whose users
# occupy the contiguous rank range (cum_before, cum_before + m] under
# any order sorted by c — is split across the ≤10 deciles it overlaps
# by pure interval arithmetic.  The only sort is over by_c (distinct
# activity levels), not users: the same trick the gini rank-sum uses,
# so the op stays a tiny-relation job at any corpus size.
LORENZ_DECILES = 10


def behavior_event_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per activity decile (1 = least active users): user count, event
    count, event share, and cumulative event share — the Lorenz curve
    the gini above integrates."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("c"))
    by_c = counts.groupBy("c").agg(F.count("*").alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    staged = by_c.select(
        "c",
        "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).alias("cb"),
    )
    tot = staged.agg(
        F.sum("m").alias("n"),
        F.sum(F.col("c") * F.col("m")).alias("tot_events"),
    )
    D = LORENZ_DECILES
    g = (
        staged.crossJoin(F.broadcast(tot))
        .select(
            "c",
            "m",
            "cb",
            "n",
            "tot_events",
            F.explode(F.sequence(F.lit(1), F.lit(D))).alias("decile"),
        )
        .select(
            "decile",
            "tot_events",
            # overlap of this group's rank range (cb, cb+m] with the
            # decile's (b_{k-1}, b_k]
            F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    F.col("cb") + F.col("m"),
                    F.expr(f"(decile * n) DIV {D}"),
                )
                - F.greatest(
                    F.col("cb"), F.expr(f"((decile - 1) * n) DIV {D}")
                ),
            ).alias("u"),
            F.col("c"),
        )
        .select("decile", "tot_events", "u", (F.col("u") * F.col("c")).alias("ev"))
    )
    dec = g.groupBy("decile").agg(
        F.sum("u").alias("n_users"),
        F.sum("ev").alias("n_events"),
        F.first("tot_events").alias("tot_events"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    share = F.when(
        F.col("tot_events") > 0,
        _fr4(F.col("n_events") * 100.0 / F.col("tot_events")),
    )
    cum = F.when(
        F.col("tot_events") > 0,
        _fr4(
            F.sum("n_events").over(wcum) * 100.0 / F.col("tot_events")
        ),
    )
    return (
        dec.select(
            "decile",
            "n_users",
            "n_events",
            share.alias("event_share_pct"),
            cum.alias("cum_share_pct"),
        )
        .orderBy("decile")
    )


LORENZ_ORACLE = f"""
WITH counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY user_id
),
by_c AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM counts GROUP BY c),
staged AS (
  SELECT c, m,
         COALESCE(SUM(m) OVER (ORDER BY c
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cb
  FROM by_c
),
tot AS (
  SELECT CAST(SUM(m) AS BIGINT) AS n,
         CAST(SUM(c * m) AS BIGINT) AS tot_events
  FROM staged
),
g AS (
  SELECT k.decile, t.tot_events,
         GREATEST(CAST(0 AS BIGINT),
                  LEAST(s.cb + s.m, (k.decile * t.n) // {LORENZ_DECILES})
                  - GREATEST(s.cb,
                             ((k.decile - 1) * t.n) // {LORENZ_DECILES}))
           AS u,
         s.c
  FROM staged s, tot t,
       (SELECT UNNEST(range(1, {LORENZ_DECILES} + 1)) AS decile) k
),
dec AS (
  SELECT decile,
         CAST(SUM(u) AS BIGINT) AS n_users,
         CAST(SUM(u * c) AS BIGINT) AS n_events,
         ANY_VALUE(tot_events) AS tot_events
  FROM g
  GROUP BY decile
)
SELECT decile, n_users, n_events,
       CASE WHEN tot_events > 0
            THEN floor(n_events * 100.0 / tot_events * 10000.0 + 0.5)
                 / 10000.0
       END AS event_share_pct,
       CASE WHEN tot_events > 0
            THEN floor(SUM(n_events) OVER (ORDER BY decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       * 100.0 / tot_events * 10000.0 + 0.5) / 10000.0
       END AS cum_share_pct
FROM dec
ORDER BY decile
"""


# --------------------------------------------------------------------------
def behavior_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of the first-view → first-strictly-later-purchase
    lag: converter count and exact p50/p90 lag in hours — the funnel's
    latency percentile twin (the mean hides the long tail the p90
    exists to expose).

    Scale: two user-grain hash-aggs sharing one user_id exchange, then
    a single exact-percentile aggregate over one bigint per converter.
    Percentile interpolation parity (Spark `percentile` ≡ DuckDB
    `quantile_cont`) is the a17 pattern; the microsecond lag stays
    integer until the final hours division, floor-recipe rounded."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"), F.first("first_view").alias("first_view"))
    )
    lag_us = F.unix_micros("first_purchase") - F.unix_micros("first_view")
    fr4 = lambda c: F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)  # noqa: E731
    return fp.select(lag_us.alias("lag_us")).agg(
        F.count("*").alias("n_converters"),
        fr4(F.expr("percentile(lag_us, 0.5)") / F.lit(_HOURS_US)).alias(
            "p50_hours"
        ),
        fr4(F.expr("percentile(lag_us, 0.9)") / F.lit(_HOURS_US)).alias(
            "p90_hours"
        ),
    )


CONVERSION_LAG_ORACLE = """
WITH fv AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
fp AS (
  SELECT e.user_id,
         epoch_us(MIN(e.ts)) - epoch_us(ANY_VALUE(fv.first_view)) AS lag_us
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND e.ts > fv.first_view
  GROUP BY e.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
       floor(quantile_cont(lag_us, 0.5) / 3600000000.0 * 10000.0 + 0.5)
         / 10000.0 AS p50_hours,
       floor(quantile_cont(lag_us, 0.9) / 3600000000.0 * 10000.0 + 0.5)
         / 10000.0 AS p90_hours
FROM fp
"""


QUERIES = {
    "funnel_user_conversion": funnel_user_conversion,
    "events_user_gini": events_user_gini,
    "behavior_conversion_lag": behavior_conversion_lag,
    "behavior_event_lorenz": behavior_event_lorenz,
    "cohort_weekly_retention": cohort_weekly_retention,
    "anomaly_daily_zscore": anomaly_daily_zscore,
    "rfm_customer_segments": rfm_customer_segments,
    "events_audience_overlap": events_audience_overlap,
    "attribution_last_touch": attribution_last_touch,
    "churn_activity_flags": churn_activity_flags,
}
ORACLE = {
    "funnel_user_conversion": FUNNEL_ORACLE,
    "events_user_gini": GINI_ORACLE,
    "behavior_conversion_lag": CONVERSION_LAG_ORACLE,
    "behavior_event_lorenz": LORENZ_ORACLE,
    "cohort_weekly_retention": COHORT_ORACLE,
    "anomaly_daily_zscore": ANOMALY_ORACLE,
    "rfm_customer_segments": RFM_ORACLE,
    "events_audience_overlap": AUDIENCE_OVERLAP_ORACLE,
    "attribution_last_touch": ATTRIBUTION_ORACLE,
    "churn_activity_flags": CHURN_ORACLE,
}
