"""The complete reference user journey, end-to-end: games CSV on disk →
explicit-schema ingest → full stage-2 workload → stage-3 marts written
as parquet → scan-back verification.  This is what a user of the
reference would run after switching engines.
"""

from __future__ import annotations

import csv as csvmod

from bigdata_gamedb_etl_spark.functions.cleaning import GAMES_SCHEMA
from bigdata_gamedb_etl_spark.operators.games import run_reference_workload
from bigdata_gamedb_etl_spark.sources.catalog import read_csv, write_parquet
from tests.test_games_golden import ROWS


def test_csv_to_marts_end_to_end(spark, tmp_path):
    # 1. land the fixture as a real CSV file (quotes and all)
    csv_path = tmp_path / "games.csv"
    with open(csv_path, "w", newline="") as f:
        w = csvmod.writer(f, quoting=csvmod.QUOTE_MINIMAL, doublequote=True)
        w.writerow([c.name for c in GAMES_SCHEMA.fields])
        for row in ROWS:
            w.writerow(["" if v is None else v for v in row])

    # 2. ingest with the explicit schema (reference: spark_eda.py:42)
    games = read_csv(spark, str(csv_path), GAMES_SCHEMA)
    assert games.count() == len(ROWS)

    # 3. run the whole stage-2+3 workload
    out = run_reference_workload(spark, games)
    assert len(out) == 14

    # 4. key semantics survive the CSV round-trip
    genre = {r["Genre"]: r["game_count"] for r in out["genre_revenue"].collect()}
    assert genre["Action"] == 7
    devs = {r["developer"] for r in out["developer_metrics"].collect()}
    assert "Foo, Ltd." in devs and "Dev A, Dev B" in devs

    # 5. write the serving marts and scan back (stage-3 verification)
    profile_path = str(tmp_path / "mart_profile")
    analytics_path = str(tmp_path / "mart_dev_analytics")
    write_parquet(out["game_profile"], profile_path)
    write_parquet(out["dev_analytics"], analytics_path)

    profile = spark.read.parquet(profile_path)
    assert profile.count() == len(ROWS)
    key = {r["AppID"]: r["row_key"] for r in profile.collect()}
    assert key[20200] == "00202"

    analytics = spark.read.parquet(analytics_path)
    row = {r["developer"]: r for r in analytics.collect()}
    assert row["Dev A"]["product_list"] == {"4": "Delta", "10": "Theta"}
