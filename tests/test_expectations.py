"""Declarative data-quality expectations (operators/quality.py).

- SQL CHECK semantics: a rule fails a row only when it evaluates FALSE;
  NULL passes (pair with IS NOT NULL to reject nulls).
- All row-local rules evaluate in ONE scan (plan-asserted).
- split_quarantine is an exact partition of the input.
"""

from __future__ import annotations

import pytest

from data_etl_sh_lianjia_spark.operators.quality import (
    expectations_report,
    split_quarantine,
)


@pytest.fixture()
def dirty(spark):
    rows = [
        (1, 10.0, "F", "1-URGENT"),    # clean
        (None, 5.0, "O", "2-HIGH"),    # null key -> fails not_null
        (3, -2.0, "P", "3-MEDIUM"),    # negative price
        (4, None, "F", "4-LOW"),       # NULL price: rule UNKNOWN -> passes
        (5, 7.0, "X", "5-LOW"),        # bad status domain
        (6, 8.0, "O", "urgent"),       # bad priority format
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderstatus string,"
        " o_orderpriority string"
    )


RULES = {
    "orderkey_not_null": "o_orderkey IS NOT NULL",
    "totalprice_positive": "o_totalprice > 0",
    "status_domain": "o_orderstatus IN ('F', 'O', 'P')",
    "priority_format": "o_orderpriority RLIKE '^[1-5]-'",
}


def test_report_check_semantics_null_passes(spark, dirty):
    rep = {
        r["rule"]: (r["n_violations"], r["n_unknown"])
        for r in expectations_report(dirty, RULES).collect()
    }
    assert rep == {
        "orderkey_not_null": (1, 0),
        # the NULL price row is UNKNOWN, not a violation (SQL CHECK)
        "totalprice_positive": (1, 1),
        "status_domain": (1, 0),
        "priority_format": (1, 0),
    }


def test_report_is_single_scan(spark, dirty):
    plan = (
        expectations_report(dirty, RULES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # four rules, one source scan: the flags ride one pass, the rule count
    # must never multiply the I/O
    assert plan.count("ExistingRDD") + plan.count("Scan parquet") == 1


def test_quarantine_is_exact_partition(spark, dirty):
    valid, quarantined = split_quarantine(dirty, RULES)
    v = {r["o_orderkey"] for r in valid.collect()}
    q = {r["o_orderkey"] for r in quarantined.collect()}
    assert v == {1, 4}, "clean row + NULL-price row (unknown passes)"
    assert q == {None, 3, 5, 6}
    assert valid.count() + quarantined.count() == dirty.count()
    assert valid.columns == dirty.columns, "flag columns must not leak"


def test_empty_rule_suite_quarantines_nothing(spark, dirty):
    valid, quarantined = split_quarantine(dirty, {})
    assert valid.count() == dirty.count()
    assert quarantined.count() == 0
