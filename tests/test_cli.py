"""CLI surface smoke: list / run / explain / figures drive the same
registry the driver consumes, so a registry or session regression
surfaces here without a harness run."""

from __future__ import annotations

import pytest

from bigdata_gamedb_etl_spark.__main__ import main


def test_cli_list_prints_every_registered_query(capsys):
    from bigdata_gamedb_etl_spark.registry import all_oracle, all_queries

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    lines = dict(
        line.split("\t") for line in out.strip().splitlines()
    )
    assert set(lines) == set(all_queries())
    oracle = set(all_oracle())
    for name, kind in lines.items():
        assert kind == ("oracle" if name in oracle else "rows-only")


def test_cli_run_and_explain(spark, sf_dir, capsys):
    # `run` shows rows; `explain` prints a formatted plan; both reuse
    # the active test session via getOrCreate inside get_spark
    assert main(["run", "tpch_q1_pricing_summary", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out
    assert (
        main(["explain", "tpch_q1_pricing_summary", "--sf-dir", sf_dir]) == 0
    )
    out = capsys.readouterr().out
    assert "AdaptiveSparkPlan" in out or "Physical Plan" in out


def test_cli_unknown_query_is_a_clean_error(capsys):
    assert main(["run", "definitely_not_registered"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_rejects_missing_subcommand():
    with pytest.raises(SystemExit):
        main([])
