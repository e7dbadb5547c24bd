"""Lianjia domain pipeline — reference-parity end to end (SURVEY.md §7 step 5).

The reference (`/root/reference/house_spider/`) extracts two entities:
villages (`items.py:16-32`, 14 string fields) and houses (`items.py:34-70`,
35 string fields, Chinese names) linked by 小区ID → village.id
(`lianjia.py:76,130,191`), emitted as JSON-lines (`README.md:7`). This module
re-expresses the crawler's *semantics* on DataFrames:

- fixture synthesis replicating the crawler's raw string output conventions
  (FIXTURES.md §B: all-string schemas, '暂无数据' sentinels, '0' lat/long
  defaults, two-branch 状态 discriminator, duplicate snapshots);
- normalization (§2.3 F12): unit-string parsers → typed columns;
- snapshot dedup (O5: the RFPDupeFilter analogue, row_number over 采集时间);
- FK join J1 (houses ⋈ villages, villages broadcast — they are 100× smaller,
  same as production) and J2 left/anti variants;
- the 在售/成交 union O2 is already materialized in the fixture (状态 tag);
  per-zone/status price aggregation mirrors what the crawl's consumers do.

Chinese column names are first-class: DataFrame API needs no quoting;
SQL strings must backtick them (SURVEY.md §7 hard parts (b)).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_etl_sh_lianjia_spark.functions import text as X
from data_etl_sh_lianjia_spark.plans.registry import register

_ZONES = ["浦东,张江", "浦东,金桥", "徐汇,徐家汇", "静安,静安寺", "闵行,莘庄"]
_BUILD_TYPES = ["板楼", "塔楼", "板楼/塔楼"]
_DECOR = ["精装", "简装", "毛坯"]
_LAYOUTS = ["1室1厅1厨1卫", "2室1厅1厨1卫", "2室2厅1厨1卫", "3室2厅1厨2卫"]
_FLOORS = ["低楼层 (共{n}层)", "中楼层 (共{n}层)", "高楼层 (共{n}层)"]
_COLLECT_TS = "2026-08-13 10:00:00"


def synthesize_fixtures(
    spark: SparkSession | None,
    out_dir: str,
    n_villages: int = 200,
    n_houses: int = 2000,
    seed: int = 42,
) -> tuple[str, str]:
    """Deterministic raw-string fixtures per FIXTURES.md §B. Returns
    (villages_path, houses_path); idempotent per (out_dir, params).

    Written driver-side with pyarrow (no SparkSession needed — ``spark`` is
    accepted for signature compatibility and ignored): the DuckDB oracle of
    ``lianjia_zone_summary`` reads the same files by absolute path, so the
    fixtures must exist before EITHER engine runs, independent of which the
    correctness harness happens to execute first.
    """
    vpath = os.path.join(out_dir, "villages.parquet")
    hpath = os.path.join(out_dir, "houses.parquet")
    if os.path.exists(vpath) and os.path.exists(hpath):
        return vpath, hpath
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)

    villages = []
    for i in range(n_villages):
        vid = str(5011000018000 + i)
        bad_pos = rng.random() < 0.03
        villages.append(
            {
                "id": vid,
                "name": f"小区{i}号",
                "zone": rng.choice(_ZONES),
                "address": f"某路{rng.randint(1, 2000)}弄",
                "latitude": "0" if bad_pos else f"{31 + rng.random():.3f}",
                "longitude": "0" if bad_pos else f"{121 + rng.random():.3f}",
                "year": (
                    "暂无数据" if rng.random() < 0.1 else f"{rng.randint(1985, 2020)}年建成"
                ),
                "build_type": rng.choice(_BUILD_TYPES),
                "property_costs": (
                    "暂无数据" if rng.random() < 0.15 else f"{rng.randint(5, 60) / 10}元/平米/月"
                ),
                "property_company": f"物业公司{rng.randint(1, 30)}",
                "developers": "暂无数据" if rng.random() < 0.2 else f"开发商{rng.randint(1, 20)}",
                "buildings": f"{rng.randint(1, 40)}栋",
                "total_house": f"{rng.randint(20, 4000)}户",
                "采集时间": _COLLECT_TS,
            }
        )

    houses = []
    # ~10% dangling FKs (J2) + a skew village with many listings + one
    # village guaranteed childless (the total==0 branch, lianjia.py:107,167).
    childless = villages[0]["id"]
    hot = villages[1]["id"]
    for i in range(n_houses):
        hid = str(107104190000 + i)
        if rng.random() < 0.10:
            vid = str(5011000099000 + rng.randint(0, 50))  # dangling FK
            vname = "未知小区"
        elif rng.random() < 0.05:
            vid, vname = hot, "小区1号"
        else:
            k = rng.randint(1, n_villages - 1)
            vid, vname = villages[k]["id"], villages[k]["name"]
        sold = rng.random() < 0.4
        price_wan = rng.randint(100, 2000)
        row = {
            "房屋Id": hid,
            "标题": rng.choice(["满五唯一 南北通透", "近地铁 采光好", "学区房 诚意出售"]),
            "售价": None if sold else str(price_wan),
            "成交价": str(int(price_wan * (0.9 + 0.15 * rng.random()))) if sold else None,
            "小区": vname,
            "小区ID": vid,
            "房屋户型": rng.choice(_LAYOUTS),
            "所在楼层": rng.choice(_FLOORS).format(n=rng.randint(6, 33)),
            "建筑面积": "暂无数据" if rng.random() < 0.05 else f"{rng.randint(300, 2000) / 10}㎡",
            "户型结构": "平层",
            "套内面积": "暂无数据" if rng.random() < 0.3 else f"{rng.randint(250, 1800) / 10}㎡",
            "建筑类型": rng.choice(_BUILD_TYPES),
            "房屋朝向": rng.choice(["南 北", "南", "东南", "西南"]),
            "建成年代": "未知" if rng.random() < 0.1 else str(rng.randint(1985, 2020)),
            "装修情况": rng.choice(_DECOR),
            "建筑结构": "钢混结构",
            "供暖方式": "暂无数据" if rng.random() < 0.5 else "自采暖",
            "梯户比例": rng.choice(["一梯两户", "两梯四户", "一梯四户"]),
            "配备电梯": rng.choice(["有", "无", "暂无数据"]),
            "挂牌时间": f"{rng.randint(2024, 2026)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
            "交易权属": "商品房",
            "上次交易": "暂无数据" if rng.random() < 0.4 else f"{rng.randint(2010, 2023)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
            "房屋用途": "普通住宅",
            "房屋年限": rng.choice(["满五年", "满两年", "未满两年"]),
            "产权所属": "非共有",
            "房权所属": None if not sold else "非共有",
            "抵押信息": rng.choice(["无抵押", "有抵押 银行按揭"]),
            "房源核验码": None if rng.random() < 0.05 else f"HC{rng.randint(10**9, 10**10 - 1)}",
            "房本备件": "已上传房本照片",
            "链家编号": hid if not sold else None,
            "关注人数": None if sold else str(rng.randint(0, 400)),
            "状态": "成交" if sold else "在售",
            # raw site format 'yyyy.MM.dd' before the reformat at lianjia.py:216
            "成交时间": f"{rng.randint(2024, 2026)}.{rng.randint(1, 12):02d}.{rng.randint(1, 28):02d}" if sold else None,
            "采集时间": _COLLECT_TS,
        }
        houses.append(row)
        if rng.random() < 0.03:  # duplicate snapshot rows (O5 fixture)
            houses.append(dict(row))
    # every village except 'childless' got houses only by chance; force none
    houses = [h for h in houses if h["小区ID"] != childless]

    import pyarrow as pa
    import pyarrow.parquet as pq

    def _write(rows: list[dict], path: str) -> None:
        schema = pa.schema([(k, pa.string()) for k in rows[0]])
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, path)  # atomic publish: concurrent builders race safely

    _write(villages, vpath)
    _write(houses, hpath)
    return vpath, hpath


def normalize_villages(raw: DataFrame) -> DataFrame:
    """F12 typed projection of the all-string village feed."""
    return raw.select(
        F.col("id").alias("village_id"),
        F.col("name"),
        F.col("zone"),
        F.split("zone", ",").getItem(0).alias("district"),
        (F.nullif(F.col("latitude"), F.lit("0"))).try_cast("double").alias("latitude"),
        (F.nullif(F.col("longitude"), F.lit("0"))).try_cast("double").alias("longitude"),
        X.parse_int_prefix("year").alias("build_year"),
        X.null_sentinel("build_type").alias("build_type"),
        X.parse_area_sqm("property_costs").alias("property_cost_per_sqm"),
        X.parse_int_prefix("buildings").alias("n_buildings"),
        X.parse_int_prefix("total_house").alias("n_units"),
    )


def normalize_houses(raw: DataFrame) -> DataFrame:
    """F12 typed projection of the all-string house feed (both branches)."""
    level, total_floors = X.parse_floor(F.col("所在楼层"))
    rooms, halls = X.parse_layout(F.col("房屋户型"))
    return raw.select(
        F.col("房屋Id").alias("house_id"),
        F.col("小区ID").alias("village_id"),
        F.col("小区").alias("village_name"),
        F.col("状态").alias("status"),
        X.parse_cny_wan(F.col("售价")).alias("asking_price_cny"),
        X.parse_cny_wan(F.col("成交价")).alias("deal_price_cny"),
        X.parse_area_sqm(F.col("建筑面积")).alias("area_sqm"),
        rooms.alias("n_rooms"),
        halls.alias("n_halls"),
        level.alias("floor_level"),
        total_floors.alias("total_floors"),
        X.parse_int_prefix(F.col("建成年代")).alias("build_year"),
        X.null_sentinel(F.col("装修情况")).alias("decoration"),
        (F.col("关注人数")).try_cast("int").alias("n_followers"),
        (F.col("挂牌时间")).try_cast("date").alias("listed_date"),
        X.reformat_deal_date(F.col("成交时间")).alias("deal_date"),
        F.col("采集时间").alias("collected_at"),
    )


def snapshot_dedup(houses: DataFrame) -> DataFrame:
    """O5: keep one row per house_id per collection snapshot (deterministic
    row_number, the engine's dedup idiom — never dropDuplicates)."""
    w = Window.partitionBy("house_id").orderBy(
        F.desc("collected_at"), F.asc("status"), F.asc_nulls_last("deal_date")
    )
    return houses.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def houses_with_villages(houses: DataFrame, villages: DataFrame) -> DataFrame:
    """J1: FK equi-join, village side broadcast (it is the 100×-smaller dim)."""
    return houses.join(F.broadcast(villages), "village_id", "left")


def childless_villages(houses: DataFrame, villages: DataFrame) -> DataFrame:
    """J2: villages with zero listings (the total==0 branch of the crawl)."""
    return villages.join(houses, "village_id", "left_anti")


def zone_price_summary(joined: DataFrame) -> DataFrame:
    """Per-district / status price aggregates (the O2 union's consumer view)."""
    price = F.coalesce("deal_price_cny", "asking_price_cny")
    return (
        joined.filter(F.col("district").isNotNull())
        .groupBy("district", "status")
        .agg(
            F.count(F.lit(1)).alias("n_listings"),
            F.sum((price / F.col("area_sqm")).cast("decimal(30,2)"))
            .cast("double")
            .alias("sum_price_per_sqm"),
            F.count(price).alias("n_priced"),
        )
        .withColumn(
            "avg_price_per_sqm",
            F.round(F.col("sum_price_per_sqm") / F.col("n_priced"), 2),
        )
        .drop("sum_price_per_sqm")
    )


# v2: pyarrow-written single-file fixtures (v1 dirs were Spark-written and
# needed a live session; the oracle below reads these paths directly).
_FIXTURE_DIR = "/tmp/spark-graft-lianjia-fixtures-v2"

# Generated eagerly at import: the registry (and therefore this module) is
# imported before the correctness harness runs either engine, so the oracle's
# read_parquet() paths are guaranteed to exist no matter which side runs
# first. Deterministic (seed=42) and idempotent, ~2k rows — negligible cost.
_FIXTURE_PATHS = synthesize_fixtures(None, _FIXTURE_DIR)

_NORM_PRICE_SQL = """
try_cast(regexp_extract(nullif(nullif(trim({col}), '暂无数据'), ''),
                        '([0-9]+(\\.[0-9]+)?)', 1) AS DOUBLE) * 10000
"""


@register(
    "lianjia_zone_summary",
    # Full-pipeline DuckDB mirror over the same fixture parquet files
    # (normalize → snapshot-dedup → FK left join → per-district/status
    # aggregate). Ties in the dedup window are exact duplicate snapshots,
    # so row_number's pick is value-identical either way.
    oracle=f"""
WITH houses_n AS (
  SELECT "房屋Id" AS house_id, "小区ID" AS village_id, "状态" AS status,
         {_NORM_PRICE_SQL.format(col='"售价"')} AS asking_price_cny,
         {_NORM_PRICE_SQL.format(col='"成交价"')} AS deal_price_cny,
         try_cast(regexp_extract(nullif(nullif(trim("建筑面积"), '暂无数据'), ''),
                                 '([0-9]+(\\.[0-9]+)?)', 1) AS DOUBLE) AS area_sqm,
         "采集时间" AS collected_at
  FROM read_parquet('{_FIXTURE_PATHS[1]}')
  QUALIFY row_number() OVER (PARTITION BY "房屋Id" ORDER BY "采集时间" DESC) = 1
), villages_n AS (
  SELECT id AS village_id, string_split(zone, ',')[1] AS district
  FROM read_parquet('{_FIXTURE_PATHS[0]}')
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
""",
    survey_ref="J1,J2,O2,O5,F12,S9,P2,P4,P7,P8",
    doc="end-to-end reference-parity pipeline: ingest raw strings -> normalize -> dedup -> FK join -> zone aggregates",
)
def lianjia_zone_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    vpath, hpath = synthesize_fixtures(spark, _FIXTURE_DIR)
    villages = normalize_villages(spark.read.parquet(vpath))
    houses = snapshot_dedup(normalize_houses(spark.read.parquet(hpath)))
    return zone_price_summary(houses_with_villages(houses, villages))
