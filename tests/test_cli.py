"""CLI smoke tests — main() drives the real registry/operators in-process
(the headless mirror of the reference's GUI flow)."""

from __future__ import annotations

from datapipeline_omnichanneltobigquery_spark.cli import main

from tests.conftest import SF_DIR


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_monthly_revenue  [gated]" in out
    assert "q1_pricing_summary" in out  # rotated out r10: listed, ungated
    assert "q6_forecast_revenue" in out


def test_cli_query_writes_parquet(spark, tmp_path, capsys):
    out = str(tmp_path / "q1")
    assert main(["query", "q1_pricing_summary", "--sf-dir", SF_DIR, "--out", out, "--show", "2"]) == 0
    assert spark.read.parquet(out).count() == 6
    assert "l_returnflag" in capsys.readouterr().out


def test_cli_unknown_query_fails(capsys):
    assert main(["query", "nope", "--sf-dir", SF_DIR]) == 2


def test_cli_profile(capsys):
    assert main(["profile", "region", "--sf-dir", SF_DIR, "--show", "10"]) == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "n_distinct" in out
