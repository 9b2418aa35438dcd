"""Temporal-join plan contracts and sketch accuracy bounds (the
correctness of oracle-backed temporal queries is covered by
test_oracle_parity; these assert the SHAPE and the approximation
quality that the oracle can't see)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_gamedb_etl_spark import plans
from bigdata_gamedb_etl_spark.operators import sketches, temporal
from bigdata_gamedb_etl_spark.sources.catalog import table


def test_asof_join_is_single_shuffle_no_range_explosion(spark, sf_dir):
    df = temporal.asof_purchase_click(spark, sf_dir)
    plan = plans.physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union-merge as-of: exactly one hash shuffle (user_id for the
    # window); the final orderBy adds only a range exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_interval_join_is_banded_equi_join(spark, sf_dir):
    df = temporal.interval_error_click_burst(spark, sf_dir)
    plan = plans.physical(df)
    # the (user, bucket) band turns the range join into an equi-join —
    # a naive inequality join plans as BNLJ/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_boundary_semantics(spark, sf_dir):
    # a click exactly at error_ts is included; at error_ts + window it
    # is not (half-open interval) — checked via the oracle at SF too,
    # but the banded path must not lose boundary rows to bucket math
    rows = temporal.interval_error_click_burst(spark, sf_dir).collect()
    assert all(r["clicks_10m"] >= 1 for r in rows)


def test_tpch2_plan_shapes(spark, sf_dir):
    from bigdata_gamedb_etl_spark.operators import tpch2

    # Q4: EXISTS compiles to left-semi, one fact shuffle
    p4 = plans.physical(tpch2.q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in p4
    assert p4.count("Exchange hashpartitioning") <= 1
    # Q10: final top-k is TakeOrderedAndProject, not global sort
    assert "TakeOrderedAndProject" in plans.physical(
        tpch2.q10_returned_revenue(spark, sf_dir)
    )
    # Q14/Q19: broadcast dim + global agg — zero hash shuffles
    for q in (tpch2.q14_promo_revenue, tpch2.q19_disjunctive_revenue):
        assert plans.physical(q(spark, sf_dir)).count("Exchange hashpartitioning") == 0
    # Q19 pushes parts of the disjunction into both scans
    assert "p_brand" in plans.pushed_filters(tpch2.q19_disjunctive_revenue(spark, sf_dir))
    # Q18: aggregate-then-join — exactly the one aggregation shuffle
    assert plans.physical(
        tpch2.q18_large_volume_customers(spark, sf_dir)
    ).count("Exchange hashpartitioning") <= 1


def test_rollup_single_shuffle(spark, sf_dir):
    p = plans.physical(temporal.rollup_event_time_grain(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p


def test_hll_sketch_accuracy_vs_exact(spark, sf_dir):
    got = {
        r["event_type"]: r["approx_users"]
        for r in sketches.sketch_users_per_type(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in (
            table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        )
    }
    assert set(got) == set(exact)
    for t, n in exact.items():
        assert got[t] == pytest.approx(n, rel=0.05), (t, got[t], n)


def test_hll_two_level_merge_matches_direct_sketch(spark, sf_dir):
    merged = sketches.sketch_daily_merge_total(spark, sf_dir).first()
    direct = (
        table(spark, sf_dir, "events")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(sketches.HLL_LGK))
            ).alias("n")
        )
        .first()["n"]
    )
    # union of same-lgK partials merges registers losslessly: the
    # two-level estimate must EQUAL the one-pass estimate
    assert merged["approx_total_users"] == direct
    assert merged["days_merged"] >= 1


def test_approx_topk_exact_below_tracked_cardinality(spark, sf_dir):
    """approx_top_k tracks up to 10k items exactly; our corpora's
    per-lang vocabulary is far below that, so every reported count must
    EQUAL the exact count and the count profile must match the true
    top-K (tie-breaks between equal counts may pick different tokens —
    that freedom is why the query is rows-only checked)."""
    from bigdata_gamedb_etl_spark.operators.sketches import (
        _CM_TOKS,
        APPROX_TOPK_K,
        sketch_approx_topk_tokens,
    )
    from bigdata_gamedb_etl_spark.sources.catalog import table

    tok = table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.expr(_CM_TOKS)).alias("token")
    )
    exact = {}
    for r in tok.groupBy("lang", "token").agg(F.count("*").alias("c")).collect():
        exact.setdefault(r["lang"], {})[r["token"]] = r["c"]
    for counts in exact.values():
        assert len(counts) < 10_000, "vocab too large for exactness claim"

    rows = sketch_approx_topk_tokens(spark, sf_dir).collect()
    assert rows
    per_lang = {}
    for r in rows:
        assert r["est_count"] == exact[r["lang"]][r["token"]], (
            f"approx_top_k count off for {r['lang']}/{r['token']}"
        )
        per_lang.setdefault(r["lang"], []).append(r["est_count"])
    for lang, got in per_lang.items():
        want = sorted(exact[lang].values(), reverse=True)[: APPROX_TOPK_K]
        assert sorted(got, reverse=True) == want, f"count profile off for {lang}"


def test_watermark_lateness_buckets_on_disordered_fixture(spark):
    """The lateness histogram's bucket edges, the per-key (not global)
    watermark semantics, and the first-event/NULL-ts in-order rule —
    pinned on a constructed out-of-order feed, since the shipped corpus
    is fully time-sorted and only ever exercises '1_in_order'."""
    import datetime

    from bigdata_gamedb_etl_spark.operators import temporal

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # user 1: second event 30 s late, third 400 s late, fourth 2000 s
        (1, ts(1000), 1), (2, ts(970), 1), (3, ts(600), 1), (4, ts(-1000), 1),
        # user 2: in order; last event EQUALS prior max (<=0 is in-order)
        (5, ts(0), 2), (6, ts(10), 2), (7, ts(10), 2),
        # user 3: NULL ts then a real one (both in-order)
        (8, None, 3), (9, ts(5), 3),
        # user 4: 59 s late (strictly under the 1-minute edge)
        (10, ts(100), 4), (11, ts(41), 4),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )
    got = {
        r["late_bucket"]: (r["n_events"], r["max_lateness_sec"])
        for r in temporal._lateness_histogram(e).collect()
    }
    # empty buckets simply don't appear (no 3_lt_5m row in this fixture)
    assert got == {
        "1_in_order": (7, 0.0),
        "2_lt_1m": (2, 59.0),     # user1 +30s, user4 +59s
        "4_lt_30m": (1, 400.0),   # user1 third event
        "5_gte_30m": (1, 2000.0),
    }


def test_logbin_quantile_brackets_exact(spark, sf_dir):
    """The decimal-log quantile sketch's guarantee: the exact
    q-quantile of the column lies INSIDE the reported bin for every
    q, and the estimate (bin midpoint) is within the bin's ≤10%
    relative width of the truth."""
    from pyspark.sql import functions as F

    from bigdata_gamedb_etl_spark.operators.sketches import (
        QUANTILE_QS,
        sketch_logbin_quantiles,
    )
    from bigdata_gamedb_etl_spark.sources.catalog import table

    exact = (
        table(spark, sf_dir, "lineitem")
        .agg(
            *[
                F.expr(
                    f"percentile(l_extendedprice, {q / 100.0})"
                ).alias(f"p{q}")
                for q in QUANTILE_QS
            ]
        )
        .first()
    )
    rows = {r["q_pct"]: r for r in sketch_logbin_quantiles(spark, sf_dir).collect()}
    assert set(rows) == set(QUANTILE_QS)
    for q in QUANTILE_QS:
        r = rows[q]
        cents = exact[f"p{q}"] * 100.0
        assert r["bin_lo_cents"] <= cents <= r["bin_hi_cents"] + 1, (q, cents, r)
        rel = abs(r["est_value"] - exact[f"p{q}"]) / exact[f"p{q}"]
        assert rel <= 0.10, (q, rel)
