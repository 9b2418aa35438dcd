"""Golden micro-fixture for the round-5 event analytics — hand-computed
expectations on an 8-event timeline.  The DuckDB oracles prove Spark
and DuckDB agree; these fixtures prove they agree on the RIGHT answer
(a shared misreading of the semantics would pass parity and fail here).
"""

from __future__ import annotations

import datetime as dt

import pytest

from bigdata_gamedb_etl_spark.operators.behavior import (
    attribution_last_touch,
    churn_activity_flags,
)
from bigdata_gamedb_etl_spark.operators.temporal import ts_ohlc_hourly
from bigdata_gamedb_etl_spark.operators.windows import (
    w12_cumulative_distinct_users,
)
from bigdata_gamedb_etl_spark.sources.catalog import TABLE_SCHEMAS


def _ts(h, m):
    return dt.datetime(2024, 1, 1, h, m, 0)


EVENTS = [
    # user 1: view → click → two purchases (both credit the click)
    (0, _ts(10, 0), 1, "view", 1.0, "{}"),
    (1, _ts(10, 5), 1, "click", 2.0, "{}"),
    (2, _ts(10, 30), 1, "purchase", 10.0, "{}"),
    (3, _ts(10, 45), 1, "purchase", 5.0, "{}"),
    # user 2: purchase BEFORE any touch → (none); later view → purchase
    (4, _ts(9, 0), 2, "purchase", 7.0, "{}"),
    (5, _ts(11, 0), 2, "view", 1.5, "{}"),
    (6, _ts(11, 30), 2, "error", 0.5, "{}"),
    (7, _ts(11, 59), 2, "purchase", 3.0, "{}"),
]


@pytest.fixture(scope="module")
def golden_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_events")
    spark.createDataFrame(EVENTS, TABLE_SCHEMAS["events"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_attribution_golden(spark, golden_dir):
    rows = {r["touch"]: r for r in attribution_last_touch(spark, golden_dir).collect()}
    assert rows["click"]["purchases"] == 2
    assert rows["click"]["revenue"] == 15.0
    assert rows["view"]["purchases"] == 1
    assert rows["view"]["revenue"] == 3.0
    assert rows["(none)"]["purchases"] == 1
    assert rows["(none)"]["revenue"] == 7.0


def test_ohlc_golden(spark, golden_dir):
    bars = {r["hour"]: r for r in ts_ohlc_hourly(spark, golden_dir).collect()}
    assert set(bars) == {9, 10, 11}
    assert (bars[9]["open"], bars[9]["close"], bars[9]["volume"]) == (7.0, 7.0, 1)
    b10 = bars[10]
    assert (b10["open"], b10["high"], b10["low"], b10["close"], b10["volume"]) == (
        1.0, 10.0, 1.0, 5.0, 4,
    )
    b11 = bars[11]
    assert (b11["open"], b11["high"], b11["low"], b11["close"], b11["volume"]) == (
        1.5, 3.0, 0.5, 3.0, 3,
    )


def test_churn_golden(spark, golden_dir):
    rows = {r["user_id"]: r for r in churn_activity_flags(spark, golden_dir).collect()}
    for uid, n_events in ((1, 4), (2, 4)):
        r = rows[uid]
        assert r["last_day"] == dt.date(2024, 1, 1)
        assert r["days_inactive"] == 0
        assert r["events_last_wk"] == n_events
        assert r["events_prior_wk"] == 0
        assert r["wow_activity_ratio"] is None
        assert r["churned"] is False


def test_cumulative_users_golden(spark, golden_dir):
    rows = w12_cumulative_distinct_users(spark, golden_dir).collect()
    assert [(r["day"], r["new_users"], r["cum_users"]) for r in rows] == [
        (dt.date(2024, 1, 1), 2, 2)
    ]


def test_user_gini_golden(spark, tmp_path_factory):
    """Counts (1, 1, 2, 4) sorted asc: Σi·x_i = 1·1 + 2·1 + 3·2 + 4·4
    = 25, n = 4, Σx = 8 → G = 2·25/(4·8) − 5/4 = 0.3125 exactly, and
    the tied block (two users at count 1) exercises the closed-form
    tied-rank sum."""
    from bigdata_gamedb_etl_spark.operators.behavior import events_user_gini

    events = []
    eid = 0
    for uid, n in ((1, 1), (2, 1), (3, 2), (4, 4)):
        for k in range(n):
            events.append((eid, _ts(10, eid % 60), uid, "view", 1.0, "{}"))
            eid += 1
    d = tmp_path_factory.mktemp("golden_gini")
    spark.createDataFrame(events, TABLE_SCHEMAS["events"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    row = events_user_gini(spark, str(d)).collect()[0]
    assert (row["n_users"], row["n_events"]) == (4, 8)
    assert row["gini"] == 0.3125


def test_conversion_lag_golden(spark, golden_dir):
    """User 1: view 10:00 → first later purchase 10:30 (0.5 h).
    User 2: view 11:00 → purchase 11:59 (59/60 h); the 09:00 purchase
    predates the view and must NOT count.  Exact percentiles over two
    lags interpolate linearly: p50 = midpoint, p90 = 0.9 of the way."""
    from bigdata_gamedb_etl_spark.operators.behavior import (
        behavior_conversion_lag,
    )

    row = behavior_conversion_lag(spark, golden_dir).collect()[0]
    assert row["n_converters"] == 2
    lo, hi = 0.5, 59 / 60
    import math

    assert row["p50_hours"] == math.floor((lo + hi) / 2 * 1e4 + 0.5) / 1e4
    assert row["p90_hours"] == math.floor(
        (lo + 0.9 * (hi - lo)) * 1e4 + 0.5
    ) / 1e4


def test_markov_entropy_golden(spark, golden_dir):
    """User 1 chain: view→click→purchase→purchase; user 2 chain:
    purchase→view→error→purchase.  'click' is deterministic
    (always → purchase, H = 0); 'view' splits {click:1, error:1} and
    'purchase' splits {purchase:1, view:1}, both H = ln 2."""
    import math

    from bigdata_gamedb_etl_spark.operators.extended import (
        seq_markov_entropy,
    )

    rows = {
        r["from_type"]: r for r in seq_markov_entropy(spark, golden_dir).collect()
    }
    ln2 = math.floor(math.log(2) * 1e4 + 0.5) / 1e4
    assert rows["click"]["entropy"] == 0.0
    assert rows["view"]["entropy"] == ln2
    p = rows["purchase"]
    assert p["n_transitions"] == 2 and p["n_successors"] == 2
    assert p["entropy"] == ln2


def test_audience_overlap_golden(spark, tmp_path_factory):
    """u1 ∈ {A,B}, u2 ∈ {A}, u3 ∈ {B,C}: (A,B) share u1 (J = 1/3),
    (B,C) share u3 (J = 1/2), (A,C) share nobody and is absent."""
    from bigdata_gamedb_etl_spark.operators.behavior import (
        events_audience_overlap,
    )

    events = [
        (0, _ts(10, 0), 1, "A", 1.0, "{}"),
        (1, _ts(10, 1), 1, "B", 1.0, "{}"),
        (2, _ts(10, 2), 1, "A", 1.0, "{}"),   # duplicate membership
        (3, _ts(10, 3), 2, "A", 1.0, "{}"),
        (4, _ts(10, 4), 3, "B", 1.0, "{}"),
        (5, _ts(10, 5), 3, "C", 1.0, "{}"),
    ]
    d = tmp_path_factory.mktemp("golden_overlap")
    spark.createDataFrame(events, TABLE_SCHEMAS["events"]).coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))

    rows = {
        (r["t1"], r["t2"]): r
        for r in events_audience_overlap(spark, str(d)).collect()
    }
    assert set(rows) == {("A", "B"), ("B", "C")}
    ab = rows[("A", "B")]
    assert (ab["users_both"], ab["users_t1"], ab["users_t2"]) == (1, 2, 2)
    assert ab["audience_jaccard"] == 0.3333
    bc = rows[("B", "C")]
    assert (bc["users_both"], bc["users_t1"], bc["users_t2"]) == (1, 2, 1)
    assert bc["audience_jaccard"] == 0.5
