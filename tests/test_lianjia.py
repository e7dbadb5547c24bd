"""Reference-parity tests for the Lianjia domain pipeline.

The synthesized fixtures are parquet, so the normalization + dedup + join +
aggregate pipeline gets its own DuckDB differential oracle here (the driver
gate can't see these tables; this is the equivalent check run locally).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.canon import compare_results
from data_etl_sh_lianjia_spark.functions import text as X
from data_etl_sh_lianjia_spark.sources import lianjia as L


@pytest.fixture(scope="module")
def fixture_paths(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lianjia"))
    return L.synthesize_fixtures(spark, out)


def test_unit_parsers(spark):
    rows = [
        ("https://sh.lianjia.com/xiaoqu/5011000018381/", "resblockPosition:'121.506,31.112',resblockName:'x'"),
        ("/xiaoqu/123.html", "no coords here"),
    ]
    df = spark.createDataFrame(rows, "url string, js string")
    lon, lat = X.latlong_from_js("js")
    out = df.select(
        X.id_from_village_url("url").alias("vid"),
        lon.alias("lon"),
        lat.alias("lat"),
        X.parse_cny_wan(F.lit("500")).alias("wan"),
        X.parse_area_sqm(F.lit("89.5㎡")).alias("sqm"),
        X.parse_area_sqm(F.lit("暂无数据")).alias("sqm_null"),
        X.reformat_deal_date(F.lit("2026.05.20 成交")).alias("deal"),
        X.parse_int_prefix(F.lit("2005年建成")).alias("yr"),
    ).collect()
    assert out[0]["vid"] == "5011000018381"
    assert out[0]["lon"] == "121.506" and out[0]["lat"] == "31.112"
    assert out[1]["vid"] == "123"
    assert out[1]["lon"] == "0" and out[1]["lat"] == "0"  # lianjia.py:64-73 default
    assert out[0]["wan"] == 5_000_000.0
    assert out[0]["sqm"] == 89.5 and out[0]["sqm_null"] is None
    assert str(out[0]["deal"]) == "2026-05-20"
    assert out[0]["yr"] == 2005


def test_floor_and_layout_parsers(spark):
    df = spark.createDataFrame([("低楼层 (共18层)", "2室1厅1厨1卫")], "f string, l string")
    level, total = X.parse_floor("f")
    rooms, halls = X.parse_layout("l")
    r = df.select(level.alias("lv"), total.alias("tf"), rooms.alias("r"), halls.alias("h")).first()
    assert (r["lv"], r["tf"], r["r"], r["h"]) == ("低楼层", 18, 2, 1)


def test_snapshot_dedup_removes_duplicate_house_ids(spark, fixture_paths):
    _, hpath = fixture_paths
    houses = L.normalize_houses(spark.read.parquet(hpath))
    deduped = L.snapshot_dedup(houses)
    assert houses.count() > deduped.count()  # fixture plants exact-dup snapshots
    assert deduped.groupBy("house_id").count().filter("count > 1").count() == 0


def test_childless_villages_exist(spark, fixture_paths):
    vpath, hpath = fixture_paths
    villages = L.normalize_villages(spark.read.parquet(vpath))
    houses = L.normalize_houses(spark.read.parquet(hpath))
    childless = L.childless_villages(houses, villages)
    ids = {r["village_id"] for r in childless.select("village_id").collect()}
    assert "5011000018000" in ids  # the fixture's forced zero-listing village


def test_dangling_fk_houses_survive_left_join(spark, fixture_paths):
    vpath, hpath = fixture_paths
    villages = L.normalize_villages(spark.read.parquet(vpath))
    houses = L.snapshot_dedup(L.normalize_houses(spark.read.parquet(hpath)))
    joined = L.houses_with_villages(houses, villages)
    assert joined.count() == houses.count()  # left join keeps dangling FKs
    assert joined.filter(F.col("district").isNull()).count() > 0


_NORM_PRICE = """
try_cast(regexp_extract(nullif(nullif(trim({col}), '暂无数据'), ''),
                        '([0-9]+(\\.[0-9]+)?)', 1) AS DOUBLE) * 10000
"""


def test_zone_summary_matches_duckdb(spark, fixture_paths):
    """Full-pipeline differential test: normalize -> dedup -> join -> agg
    mirrored in DuckDB SQL over the same fixture parquet."""
    vpath, hpath = fixture_paths
    villages = L.normalize_villages(spark.read.parquet(vpath))
    houses = L.snapshot_dedup(L.normalize_houses(spark.read.parquet(hpath)))
    got = L.zone_price_summary(L.houses_with_villages(houses, villages))
    spark_rows = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    asking = _NORM_PRICE.format(col='"售价"')
    deal = _NORM_PRICE.format(col='"成交价"')
    cur = con.execute(
        f"""
WITH houses_n AS (
  SELECT "房屋Id" AS house_id, "小区ID" AS village_id, "状态" AS status,
         {asking} AS asking_price_cny,
         {deal} AS deal_price_cny,
         try_cast(regexp_extract(nullif(nullif(trim("建筑面积"), '暂无数据'), ''),
                                 '([0-9]+(\\.[0-9]+)?)', 1) AS DOUBLE) AS area_sqm,
         "采集时间" AS collected_at
  FROM read_parquet('{hpath}')
  QUALIFY row_number() OVER (PARTITION BY "房屋Id" ORDER BY "采集时间" DESC) = 1
), villages_n AS (
  SELECT id AS village_id, string_split(zone, ',')[1] AS district
  FROM read_parquet('{vpath}')
), joined AS (
  SELECT h.*, v.district,
         COALESCE(h.deal_price_cny, h.asking_price_cny) AS price
  FROM houses_n h LEFT JOIN villages_n v USING (village_id)
)
SELECT district, status,
       COUNT(*) AS n_listings,
       COUNT(price) AS n_priced,
       round(CAST(SUM(CAST(price / area_sqm AS DECIMAL(30,2))) AS DOUBLE)
             / COUNT(price), 2) AS avg_price_per_sqm
FROM joined
WHERE district IS NOT NULL
GROUP BY district, status
"""
    )
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    res = compare_results(spark_rows, got.columns, duck_rows, duck_cols)
    assert res.ok, f"zone summary: {res.reason}\nsample: {res.sample_diff}"
