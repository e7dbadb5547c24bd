"""Property-based tests (hypothesis) for the scalar parser library —
SURVEY.md §5.4: round-trip parse/format and null-safety f(NULL) = NULL.

Each hypothesis example generates a *batch* of inputs evaluated in one Spark
job to keep run time sane.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.functions import text as X

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(st.lists(st.integers(1, 99_999), min_size=1, max_size=30))
def test_cny_wan_roundtrip(spark, vals):
    rows = [(f"{v}万",) for v in vals] + [(f"{v}",) for v in vals]
    df = spark.createDataFrame(rows, "s string")
    out = [r[0] for r in df.select(X.parse_cny_wan("s")).collect()]
    expect = [v * 10_000.0 for v in vals] * 2
    assert out == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.floats(0.1, 9999.9).map(lambda x: round(x, 1)), min_size=1, max_size=30
    )
)
def test_area_sqm_roundtrip(spark, vals):
    df = spark.createDataFrame([(f"{v}㎡",) for v in vals], "s string")
    out = [r[0] for r in df.select(X.parse_area_sqm("s")).collect()]
    assert out == [float(str(v)) for v in vals]


@settings(**_SETTINGS)
@given(st.lists(st.integers(1, 10**14), min_size=1, max_size=30))
def test_village_id_from_url_forms(spark, ids):
    rows = [(f"https://sh.lianjia.com/xiaoqu/{i}/",) for i in ids] + [
        (f"/xiaoqu/{i}.html",) for i in ids
    ]
    df = spark.createDataFrame(rows, "u string")
    out = [r[0] for r in df.select(X.id_from_village_url("u")).collect()]
    assert out == [str(i) for i in ids] * 2


@settings(**_SETTINGS)
@given(
    st.lists(
        st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                 max_value=__import__("datetime").date(2030, 12, 28)),
        min_size=1,
        max_size=30,
    )
)
def test_deal_date_roundtrip(spark, dates):
    rows = [(d.strftime("%Y.%m.%d") + " 成交",) for d in dates]
    df = spark.createDataFrame(rows, "s string")
    out = [r[0] for r in df.select(X.reformat_deal_date("s")).collect()]
    assert out == dates


def test_null_safety_all_parsers(spark):
    """f(NULL) = NULL and f(sentinel) = NULL for every parser (SURVEY §5.4)."""
    df = spark.createDataFrame([(None,), ("暂无数据",), ("未知",)], "s string")
    level, total = X.parse_floor("s")
    rooms, halls = X.parse_layout("s")
    cols = {
        "wan": X.parse_cny_wan("s"),
        "sqm": X.parse_area_sqm("s"),
        "intp": X.parse_int_prefix("s"),
        "lvl": level,
        "tot": total,
        "rooms": rooms,
        "halls": halls,
        "deal": X.reformat_deal_date("s"),
        "sent": X.null_sentinel("s"),
    }
    out = df.select([c.alias(k) for k, c in cols.items()]).collect()
    for row in out:
        for k in cols:
            assert row[k] is None, f"{k} not null-safe: {row[k]!r}"


@settings(deadline=None, max_examples=30, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.decimals(
            min_value=-99_999_999, max_value=99_999_999, places=4, allow_nan=False
        ),
        min_size=1,
        max_size=40,
    )
)
def test_scaled_long_sum_is_exact_and_order_independent(spark, vals):
    """dsum's floor(x*10^s + 0.5) scaled-long path must equal the exact
    decimal sum for any 4-decimal inputs (positive AND negative — the
    floor-vs-round half-up difference must never bite off-tie values), and
    must not depend on row order."""
    from decimal import Decimal

    from data_etl_sh_lianjia_spark.functions.deterministic import dsum

    rows = [(float(v),) for v in vals]
    expected = float(sum(Decimal(str(float(v))) for v in vals))
    for ordering in (rows, rows[::-1]):
        df = spark.createDataFrame(ordering, "x double")
        got = df.agg(dsum("x", "s", scale=4)).collect()[0]["s"]
        assert abs(got - expected) < 1e-9, (got, expected, ordering)
