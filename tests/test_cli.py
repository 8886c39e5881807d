"""CLI parity: the reference's script workflows end-to-end.

ingest (scan.py replacement) then export (toexcel.py replacement) over
a small registry fixture, via the argparse entry point in-process (the
SparkSession is shared with the test session; a subprocess would spin a
second JVM for no extra coverage).
"""

from __future__ import annotations

import csv
import glob

from eurovision_spark.cli import main

REGISTRY = """\
### PAGE 1 ####
EudraCT Number: 2004-000001-11
Trial Status: Ongoing
A.3 Full title of the trial: Alpha Study
D.8.1 Is a Placebo used in this Trial? Yes
National Competent Authority: Austria - competent authority
D.IMP: 1
D.2.1.1.1 Trade name: Wonderdrug
EudraCT Number: 2004-000002-22
Trial Status: Completed
A.3 Full title of the trial: Beta Study
D.8.1 Is a Placebo used in this Trial? No
National Competent Authority: Belgium - competent authority
B.1.1 Name of Sponsor: acme pharma
"""


def test_cli_ingest_then_export(spark, tmp_path):
    src = tmp_path / "dump.txt"
    src.write_text(REGISTRY)
    tables_dir = tmp_path / "tables"

    rc = main(["ingest", str(src), str(tables_dir)])
    assert rc == 0
    trial = spark.read.parquet(str(tables_dir / "trial"))
    assert trial.count() == 2

    out = tmp_path / "out_csv"
    rc = main(
        [
            "export",
            str(tables_dir),
            str(out),
            "--trial-where",
            "placebo = 1",
        ]
    )
    assert rc == 0
    rows = []
    for f in glob.glob(str(out / "*.csv")):
        with open(f) as fh:
            rows += list(csv.DictReader(fh))
    assert [r["eudract_id"] for r in rows] == ["2004-000001-11"]
    # captured values casefold (scan.py:322-325; official_title exempt)
    assert rows[0]["imp"] == "trade:wonderdrug"
    assert rows[0]["location"] == "Austria"


def test_cli_query_runs_catalog_entry(spark, tmp_path, capsys):
    out = tmp_path / "trend.csv"
    rc = main(
        [
            "query",
            "user_value_trend",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--out",
            str(out),
        ]
    )
    assert rc == 0
    files = glob.glob(str(out / "*.csv")) or [str(out)]
    rows = sum(len(list(csv.reader(open(f)))) for f in files)
    assert rows > 1  # header + data


def test_cli_query_unknown_name_lists_catalog(capsys):
    rc = main(["query", "no_such_query", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 2
    assert "flagship_denorm" in capsys.readouterr().out


def test_cli_sql_over_registered_views(spark, capsys):
    rc = main(
        [
            "sql",
            "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--limit",
            "10",
        ]
    )
    assert rc == 0
    got = capsys.readouterr().out
    assert "click" in got and "rows" in got


def test_cli_list_enumerates_catalog(capsys):
    from eurovision_spark.catalog import registry
    from eurovision_spark.cli import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    for name in registry():
        assert name in out
    # r05: the sketch queries gained deterministic-bound oracles, so
    # NOTHING in the catalog is rows-only anymore (the CLI tag logic
    # stays, for any future un-oracled entry)
    assert "[rows-only]" not in out

    assert main(["list", "--filter", "pii"]) == 0
    out = capsys.readouterr().out
    assert "pii_redact" in out and "dedup_exact" not in out


def test_cli_explain_prints_physical_plan(spark, capsys):
    rc = main(["explain", "token_stats", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
    # the shuffle-free claim is visible right in the CLI output
    assert "Exchange" not in out


def test_cli_explain_unknown_name(capsys):
    rc = main(["explain", "nope", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 2
