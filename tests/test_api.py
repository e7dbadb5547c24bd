"""Engine facade tests — the public entry surface from SURVEY.md §3.4."""

from __future__ import annotations

import pytest

from data_etl_sh_lianjia_spark.api import Engine


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(sf_dir=sf_dir, spark=spark)


def test_table_lookup_and_listing(eng):
    assert "lineitem" in eng.tables()
    assert eng.table("region").count() == 5
    with pytest.raises(KeyError):
        eng.table("nope")


def test_sql_over_registered_views_matches_dataframe(eng):
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_sql == eng.table("orders").count()


def test_declared_query_runs_through_facade(eng):
    rows = eng.query("q1_scan_agg").collect()
    assert len(rows) > 0
    assert "sum_qty" in rows[0].asDict()


def test_json_roundtrip_sink(eng, tmp_path):
    out = str(tmp_path / "region_feed")
    eng.write_json(eng.table("region"), out)
    back = eng.spark.read.json(out)
    assert back.count() == 5
    assert set(back.columns) == {"r_regionkey", "r_name"}


def test_explain_returns_formatted_plan(eng):
    plan = eng.explain("q1_scan_agg")
    assert "== Physical Plan ==" in plan
    assert "Scan parquet" in plan


def test_cli_run_writes_json(spark, sf_dir, tmp_path):
    """In-process smoke of the `python -m data_etl_sh_lianjia_spark run`
    surface (the reference's `scrapy crawl lianjia -o out.json` analog)."""
    from data_etl_sh_lianjia_spark.__main__ import main

    out = str(tmp_path / "out.json")
    rc = main(["run", "q1_scan_agg", "-o", out, "--sf-dir", sf_dir])
    assert rc == 0
    import glob
    import json

    lines = []
    for f in glob.glob(out + "/*.json"):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert lines and "l_returnflag" in lines[0]


def test_cli_unknown_query_exit_code(spark, sf_dir):
    from data_etl_sh_lianjia_spark.__main__ import main

    assert main(["run", "no_such_query", "--sf-dir", sf_dir]) == 2
