"""HTML document source with selector decode — SURVEY.md §2.1 S4.

The reference's core extraction is CSS/XPath selectors over fetched HTML
(`/root/reference/house_spider/spiders/lianjia.py:62-88` village detail:
breadcrumb `.l-txt a::text`, header `.detailTitle::text`, positional
`.xiaoquInfoItem:nth-child(N) .xiaoquInfoContent::text`, plus a regex over
embedded JS for `resblockPosition`; `lianjia.py:127-153` house detail: the
label-cell pivot `li[span="房屋户型"]/text()`). This module re-expresses that
decode Spark-first:

- pages land as a parquet table of (url, html) — the batch analogue of the
  crawler's response stream; at scale this is exactly how warehouses stage
  crawl output (WARC/HTML blobs in columnar files).
- extraction is pure JVM column expressions: Spark SQL's ``xpath`` /
  ``xpath_string`` for structural selectors (the XHTML fixture is
  well-formed, which java XPath requires) and ``regexp_extract`` for the
  embedded-JS window — no Python in the row path, so the decode
  parallelizes like any other projection and pushes column pruning into
  the scan.
- the DuckDB oracle decodes the same pages with RE2 regexes over the same
  single-line markup, so every selector has a value-verified twin.

Fixtures are deterministic (seed), written driver-side with pyarrow at
import (same contract as sources/lianjia.py: the oracle reads them by
absolute path, so they must exist before either engine runs).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.functions import text as X
from data_etl_sh_lianjia_spark.plans.registry import register

_ZONES = [
    ("上海", "浦东", "张江"),
    ("上海", "浦东", "金桥"),
    ("上海", "徐汇", "徐家汇"),
    ("上海", "静安", "静安寺"),
    ("上海", "闵行", "莘庄"),
]
_BUILD_TYPES = ["板楼", "塔楼", "板楼/塔楼"]
_LAYOUTS = ["1室1厅1厨1卫", "2室1厅1厨1卫", "2室2厅1厨1卫", "3室2厅1厨2卫"]


def _page_html(rng: random.Random, i: int) -> tuple[str, str]:
    """One well-formed XHTML village/house detail page. Every extractable
    element sits on its own line so the oracle's RE2 patterns stay exact."""
    vid = 5011000018000 + i
    url = f"https://sh.lianjia.com/xiaoqu/{vid}/"
    zone = rng.choice(_ZONES)
    has_pos = rng.random() >= 0.1
    lon = f"{121 + rng.random():.3f}"
    lat = f"{31 + rng.random():.3f}"
    year = "暂无数据" if rng.random() < 0.1 else f"{rng.randint(1985, 2020)}年建成"
    btype = rng.choice(_BUILD_TYPES)
    layout = rng.choice(_LAYOUTS)
    floors = f"{['低', '中', '高'][rng.randint(0, 2)]}楼层 (共{rng.randint(6, 33)}层)"
    crumbs = "".join(f"<a>{z}</a>" for z in zone)
    script = (
        f"resblockPosition:'{lon},{lat}',resblockName:'小区{i}号'"
        if has_pos
        else f"resblockName:'小区{i}号'"
    )
    html = f"""<html>
<head><script>{script}</script></head>
<body>
<div class="xiaoquDetailbreadCrumbs"><div class="l-txt">{crumbs}</div></div>
<div class="detailHeader"><h1 class="detailTitle">小区{i}号</h1>
<div class="detailDesc">某路{rng.randint(1, 2000)}弄</div></div>
<div class="xiaoquInfo">
<div class="xiaoquInfoItem"><span class="xiaoquInfoLabel">建筑年代</span><span class="xiaoquInfoContent">{year}</span></div>
<div class="xiaoquInfoItem"><span class="xiaoquInfoLabel">建筑类型</span><span class="xiaoquInfoContent">{btype}</span></div>
<div class="xiaoquInfoItem"><span class="xiaoquInfoLabel">物业费用</span><span class="xiaoquInfoContent">{rng.randint(5, 60) / 10}元/平米/月</span></div>
</div>
<div class="base"><div class="content"><ul>
<li><span>房屋户型</span>{layout}</li>
<li><span>所在楼层</span>{floors}</li>
<li><span>建筑面积</span>{rng.randint(300, 2000) / 10}㎡</li>
</ul></div></div>
</body>
</html>"""
    return url, html


def synthesize_html_fixtures(
    out_dir: str, n_pages: int = 150, seed: int = 7
) -> str:
    """Deterministic (url, html) page corpus; idempotent, atomic publish."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    rows = [_page_html(rng, i) for i in range(n_pages)]
    table = pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "html": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


# Versioned dir: generation is skip-if-exists, so any change to the page
# generator MUST bump the suffix or a stale corpus silently survives in /tmp.
_HTML_FIXTURE_DIR = "/tmp/spark-graft-html-fixtures-v2"
_HTML_FIXTURE_PATH = synthesize_html_fixtures(_HTML_FIXTURE_DIR)

# Spark-side selector expressions (reference parity, lianjia.py line cites):
_XP = {
    # .detailTitle::text (lianjia.py:79)
    "name": "xpath_string(html, '//h1[@class=\"detailTitle\"]/text()')",
    # .detailDesc::text (lianjia.py:80)
    "address": "xpath_string(html, '//div[@class=\"detailDesc\"]/text()')",
    # ','.join(.l-txt a::text) (lianjia.py:63,81)
    "zone": (
        "array_join(xpath(html,"
        " '//div[@class=\"xiaoquDetailbreadCrumbs\"]/div/a/text()'), ',')"
    ),
    # positional .xiaoquInfoItem:nth-child(N) .xiaoquInfoContent::text
    # (lianjia.py:82-88) — XPath positional predicate, SURVEY P4
    "year_raw": (
        "xpath_string(html, '//div[@class=\"xiaoquInfo\"]/div[1]/"
        "span[@class=\"xiaoquInfoContent\"]/text()')"
    ),
    "build_type": (
        "xpath_string(html, '//div[@class=\"xiaoquInfo\"]/div[2]/"
        "span[@class=\"xiaoquInfoContent\"]/text()')"
    ),
    # label-cell pivot li[span=...]/text() (lianjia.py:132-153) — SURVEY P3
    "layout": "xpath_string(html, '//div[@class=\"base\"]//li[span=\"房屋户型\"]/text()')",
    "floor_raw": "xpath_string(html, '//div[@class=\"base\"]//li[span=\"所在楼层\"]/text()')",
    "area_raw": "xpath_string(html, '//div[@class=\"base\"]//li[span=\"建筑面积\"]/text()')",
}


@register(
    "html_selector_extract",
    # RE2 decode of the same single-line markup: each selector has an exact
    # regex twin because the fixture emits one element per line.
    oracle=f"""
WITH pages AS (SELECT url, html FROM read_parquet('{_HTML_FIXTURE_PATH}')),
raw AS (
  SELECT
    regexp_replace(regexp_replace(url, 'https?://[^/]+/xiaoqu/', ''), '/', '')
      AS village_id,
    regexp_extract(html, '<h1 class="detailTitle">([^<]*)</h1>', 1) AS name,
    regexp_extract(html, '<div class="detailDesc">([^<]*)</div>', 1) AS address,
    array_to_string(
      regexp_extract_all(
        regexp_extract(html, '<div class="l-txt">(.*?)</div>', 1),
        '<a>([^<]*)</a>', 1),
      ',') AS zone,
    COALESCE(NULLIF(regexp_extract(html,
      'resblockPosition:''([0-9.]+),([0-9.]+)''', 1), ''), '0') AS longitude,
    COALESCE(NULLIF(regexp_extract(html,
      'resblockPosition:''([0-9.]+),([0-9.]+)''', 2), ''), '0') AS latitude,
    regexp_extract(html,
      '<span class="xiaoquInfoLabel">建筑年代</span><span class="xiaoquInfoContent">([^<]*)</span>',
      1) AS year_raw,
    regexp_extract(html,
      '<span class="xiaoquInfoLabel">建筑类型</span><span class="xiaoquInfoContent">([^<]*)</span>',
      1) AS build_type,
    regexp_extract(html, '<li><span>房屋户型</span>([^<]*)</li>', 1) AS layout,
    regexp_extract(html, '<li><span>所在楼层</span>([^<]*)</li>', 1) AS floor_raw,
    regexp_extract(html, '<li><span>建筑面积</span>([^<]*)</li>', 1) AS area_raw
  FROM pages
)
SELECT village_id, name, address, zone, longitude, latitude,
       try_cast(regexp_extract(nullif(nullif(trim(year_raw), '暂无数据'), ''),
                               '([0-9]+)', 1) AS INTEGER) AS build_year,
       build_type, layout,
       try_cast(regexp_extract(layout, '([0-9]+)室', 1) AS INTEGER) AS n_rooms,
       try_cast(regexp_extract(floor_raw, '共([0-9]+)层', 1) AS INTEGER) AS total_floors,
       try_cast(regexp_extract(nullif(nullif(trim(area_raw), '暂无数据'), ''),
                               '([0-9]+(\\.[0-9]+)?)', 1) AS DOUBLE) AS area_sqm
FROM raw
""",
    survey_ref="S4,P3,P4,F2,F12",
    doc="HTML selector decode: xpath/regex extraction of village+house fields from raw pages",
)
def html_selector_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 end-to-end: raw HTML pages → typed columns via XPath selectors
    (structural fields), the embedded-JS regex window (coordinates,
    lianjia.py:67-73 semantics incl. the '0' defaults), and the F12 unit
    parsers — all JVM-side expressions inside one projection."""
    path = synthesize_html_fixtures(_HTML_FIXTURE_DIR)
    pages = spark.read.parquet(path)
    raw = pages.select(
        X.id_from_village_url("url").alias("village_id"),
        *[F.expr(e).alias(k) for k, e in _XP.items()],
        "html",
    )
    lon, lat = X.latlong_from_js("html")
    rooms, _halls = X.parse_layout(F.col("layout"))
    _level, total = X.parse_floor(F.col("floor_raw"))
    return raw.select(
        "village_id",
        "name",
        "address",
        "zone",
        lon.alias("longitude"),
        lat.alias("latitude"),
        X.parse_int_prefix("year_raw").alias("build_year"),
        "build_type",
        "layout",
        rooms.alias("n_rooms"),
        total.alias("total_floors"),
        X.parse_area_sqm("area_raw").alias("area_sqm"),
    )
