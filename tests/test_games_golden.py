"""Golden fixture tests for the reference-fidelity games workload.

The ~13-row fixture exercises every edge case from FIXTURES.md §1:
stringified lists, comma-in-developer names, bin-edge prices,
malformed/empty/null dates, zero owners, null genres, and the
reversed-rowkey pattern.  Expectations are hand-computed.
"""

from __future__ import annotations

import pytest

from bigdata_gamedb_etl_spark.functions.cleaning import GAMES_SCHEMA
from bigdata_gamedb_etl_spark.operators import games as G

ROWS = [
    (1, "Alpha", "2001-03-15", 0.0, 20_000, "'Solo Dev'", "'Action'"),
    (2, "Beta", "2010-07-01", 4.99, 10_000, "'Dev A', 'Dev B'", "'Action', 'Indie'"),
    (3, "Gamma: Redux", "2015-11-20", 5.0, 0, "'Foo, Ltd.'", "'RPG'"),
    (4, "Delta", "1999-01-01", 9.99, 100_000, "'Dev A'", "'Action', 'RPG'"),
    (5, "Art of 'War'", "2024-12-31", 10.0, 50_000, "'Big Corp'", "'Strategy'"),
    (6, "Epsilon", "2020-05-05", 19.99, 150_000, "'Big Corp'", "'Action', 'Strategy', 'Indie'"),
    (7, "Zeta", "2025-01-01", 20.0, 5_000, "'Solo Dev'", "'Indie'"),
    (8, "Wukong-like", "2024-08-20", 39.99, 75_000_000, "'Ace Studio'", "'Action', 'RPG'"),
    (9, "Eta", "2022-02-02", 40.0, 2_000_000, "'Ace Studio'", "'Action'"),
    (10, "Theta", "", 1.0, 10, "'Dev A'", None),
    (11, "Iota", None, None, 500, "[]", "'Indie'"),
    (12, "Kappa", "2010-13-40", 2.5, 100, None, "'Casual', 'Indie'"),
    (20200, "KeyGame", "2018-06-01", 5.0, 100, "'Solo Dev'", "'Action'"),
]


@pytest.fixture(scope="module")
def games_df(spark):
    return spark.createDataFrame(ROWS, schema=GAMES_SCHEMA)


def test_genre_revenue_explode_semantics(games_df):
    rows = {r["Genre"]: r for r in G.genre_revenue(games_df).collect()}
    # double-counting across genres is intended: 13 rows → 21 genre rows
    assert {g: r["game_count"] for g, r in rows.items()} == {
        "Action": 7, "Indie": 5, "RPG": 3, "Strategy": 2, "Casual": 1,
    }
    # null revenue rows still count (Iota has null price → null revenue)
    assert rows["Action"]["total_revenue"] == pytest.approx(3_083_297_900, rel=1e-5)
    assert rows["RPG"]["total_revenue"] == pytest.approx(3_000_249_000, rel=1e-5)


def test_developer_not_comma_split(games_df):
    rows = {r["developer"]: r for r in G.developer_metrics(games_df).collect()}
    # "Dev A, Dev B" is ONE key; "Foo, Ltd." keeps its comma;
    # null and "[]" developers are filtered out
    assert set(rows) == {
        "Solo Dev", "Dev A, Dev B", "Foo, Ltd.", "Dev A", "Big Corp", "Ace Studio",
    }
    assert rows["Dev A, Dev B"]["game_count"] == 1
    assert rows["Solo Dev"]["game_count"] == 3
    assert rows["Solo Dev"]["total_owners"] == 25_100
    assert rows["Ace Studio"]["total_revenue"] == pytest.approx(3_079_250_000, rel=1e-5)


def test_year_trend_string_range_filter(games_df):
    rows = {r["Year"]: r for r in G.year_trend(games_df).collect()}
    # 1999 and 2025 excluded by the STRING range compare; ""/null dates dropped
    assert sorted(rows) == [2001, 2010, 2015, 2018, 2020, 2022, 2024]
    assert rows[2010]["game_count"] == 2  # Beta + malformed "2010-13-40"
    assert rows[2024]["total_revenue"] == pytest.approx(2_999_750_000, rel=1e-5)


def test_price_bins_lexicographic_order(games_df):
    rows = G.price_bin_owner_stats(games_df).collect()
    # the reference's output order is lexicographic, not numeric
    assert [r["price_category"] for r in rows] == [
        "$0-5", "$10-20", "$20-40", "$40+", "$5-10", "免费",
    ]
    by_bin = {r["price_category"]: r for r in rows}
    assert by_bin["免费"]["game_count"] == 1
    assert by_bin["免费"]["avg_owners"] == pytest.approx(20_000)
    # bin edges: 4.99 → $0-5 but 5.0 → $5-10
    assert by_bin["$0-5"]["game_count"] == 3
    assert by_bin["$0-5"]["avg_owners"] == pytest.approx(3370.0)
    assert by_bin["$5-10"]["game_count"] == 3
    assert by_bin["$5-10"]["avg_owners"] == pytest.approx(33_366.6667, rel=1e-6)


def test_top_developer_top_game_window(games_df):
    top = G.top_developer_top_game(games_df).first()
    # Black-Myth pattern: one blockbuster dominates its studio
    assert top["developer"] == "Ace Studio"
    assert top["top_game"] == "Wukong-like"
    assert top["top_game_revenue"] == pytest.approx(2_999_250_000, rel=1e-5)


def test_multi_genre_stats(games_df):
    rows = {r["genre_count"]: r["game_count"] for r in G.multi_genre_stats(games_df).collect()}
    assert rows == {1: 7, 2: 4, 3: 1}


def test_month_distribution_keeps_malformed(games_df):
    rows = {r["Month"]: r["game_count"] for r in G.month_distribution(games_df).collect()}
    # string-prefix month: malformed "2010-13-40" yields month "13"
    assert rows["13"] == 1
    assert rows["01"] == 2  # 1999 and 2025 rows are NOT year-filtered here


def test_month_distribution_drops_short_dates(spark):
    # reference filters the DERIVED Month != '' (spark_eda.py:467): a
    # non-empty date shorter than 6 chars has Month='' and is excluded
    short = spark.createDataFrame(
        [(1, "G1", "2020", 1.0, 10, "'D'", "'Action'"),
         (2, "G2", "2020-05-05", 1.0, 10, "'D'", "'Action'")],
        schema=GAMES_SCHEMA,
    )
    rows = {r["Month"]: r["game_count"] for r in G.month_distribution(short).collect()}
    assert rows == {"05": 1}


def test_owners_histogram_bins(games_df):
    rows = {r["owners_range"]: r["game_count"] for r in G.owners_histogram(games_df).collect()}
    assert rows == {
        "0-1万": 6, "1-5万": 2, "5-15万": 2, "15-50万": 1, "200万+": 2,
    }


def test_genre_combo_unexploded(games_df):
    rows = {r["genres_clean"]: r for r in G.genre_combo_revenue(games_df).collect()}
    assert rows["Action, RPG"]["game_count"] == 2  # Delta + Wukong-like
    top = G.genre_combo_revenue(games_df).first()
    assert top["genres_clean"] == "Action, RPG"


def test_pareto_share(games_df):
    rows = G.pareto_dev_share(games_df).collect()
    assert rows[0]["developer"] == "Ace Studio"
    assert rows[0]["cum_share"] == pytest.approx(0.99849, abs=1e-4)
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-9)


def test_sql_genre_price_stats(spark, games_df):
    rows = {r["Genre"]: r for r in G.genre_price_stats_sql(spark, games_df, min_games=2).collect()}
    assert set(rows) == {"Action", "Indie", "RPG", "Strategy"}
    assert rows["Action"]["game_count"] == 7
    assert rows["Action"]["median_price"] == pytest.approx(9.99, rel=1e-6)


def test_sql_dev_distribution(spark, games_df):
    rows = {r["developer"]: r for r in G.dev_distribution_sql(spark, games_df, min_games=2).collect()}
    assert set(rows) == {"Solo Dev", "Dev A", "Big Corp", "Ace Studio"}


def test_game_profile_reverse_rowkey(games_df):
    rows = {r["AppID"]: r["row_key"] for r in G.game_profile_mart(games_df).collect()}
    # stage3.md:47 example: 20200 → "00202"
    assert rows[20200] == "00202"
    assert rows[1] == "1"


def test_dev_analytics_inverted_index(games_df):
    rows = {r["developer"]: r for r in G.dev_analytics_mart(games_df).collect()}
    assert rows["Dev A"]["product_list"] == {"10": "Theta", "4": "Delta"}
    assert rows["Ace Studio"]["row_key"] == "Ace_Studio"
    assert rows["Ace Studio"]["total_owners"] == 77_000_000
    # top-by-owners ordering (stage3.ipynb:212)
    assert G.dev_analytics_mart(games_df).first()["developer"] == "Ace Studio"
