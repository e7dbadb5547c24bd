"""Scalar expression library — SURVEY.md §2.3 F1-F13.

Re-expresses the reference crawler's per-record string transforms as
vectorized Spark Column expressions (JVM-side, codegen'd — never Python).
Each function cites the reference behavior it reproduces
(``/root/reference/house_spider/...``).

All parsers are null-tolerant the way the crawler is: ``extract_first()``
returning None and the '暂无数据'/'未知' sentinels (FIXTURES.md) become SQL
NULL (``lianjia.py:66-73`` swallows parse failures the same way).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Sentinel strings the site emits for "no data" (SURVEY.md §1.2).
NO_DATA_SENTINELS = ("暂无数据", "未知", "")


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def null_sentinel(c: Column | str) -> Column:
    """Map the crawler's no-data sentinels to NULL (F12)."""
    col = F.trim(_c(c))
    out = col
    for s in NO_DATA_SENTINELS:
        out = F.nullif(out, F.lit(s))
    return out


def parse_cny_wan(c: Column | str) -> Column:
    """'500' / '500万' (万元 = 1e4 CNY, e.g. 售价 at lianjia.py:128) → CNY double."""
    num = F.regexp_extract(null_sentinel(c), r"([0-9]+(?:\.[0-9]+)?)", 1)
    return ((F.nullif(num, F.lit(""))).try_cast("double") * 10_000).alias("price_cny")


def parse_area_sqm(c: Column | str) -> Column:
    """'89.5㎡' (建筑面积 at lianjia.py:132-ish) → square-metre double."""
    num = F.regexp_extract(null_sentinel(c), r"([0-9]+(?:\.[0-9]+)?)", 1)
    return (F.nullif(num, F.lit(""))).try_cast("double")


def parse_int_prefix(c: Column | str) -> Column:
    """'12栋' / '1024户' / '2005年建成' → leading integer (village attrs)."""
    num = F.regexp_extract(null_sentinel(c), r"([0-9]+)", 1)
    return (F.nullif(num, F.lit(""))).try_cast("int")


def parse_floor(c: Column | str) -> tuple[Column, Column]:
    """'低楼层 (共18层)' (所在楼层) → (level_label, total_floors)."""
    label = F.regexp_extract(null_sentinel(c), r"^([^\s(]+)", 1)
    total = (F.nullif(F.regexp_extract(_c(c), r"共([0-9]+)层", 1), F.lit(""))).try_cast("int")
    return F.nullif(label, F.lit("")), total


def parse_layout(c: Column | str) -> tuple[Column, Column]:
    """'2室1厅1厨1卫' (房屋户型) → (rooms, halls)."""
    rooms = (F.nullif(F.regexp_extract(null_sentinel(c), r"([0-9]+)室", 1), F.lit(""))).try_cast("int")
    halls = (F.nullif(F.regexp_extract(_c(c), r"([0-9]+)厅", 1), F.lit(""))).try_cast("int")
    return rooms, halls


def id_from_village_url(c: Column | str) -> Column:
    """Reproduce lianjia.py:76: url.replace('/xiaoqu/','').replace('.html','')
    .replace('/','') — chained literal strips via one regexp per token (F1)."""
    out = _c(c)
    out = F.regexp_replace(out, r"https?://[^/]+", "")
    out = F.regexp_replace(out, "/xiaoqu/", "")
    out = F.regexp_replace(out, r"\.html", "")
    return F.regexp_replace(out, "/", "")


def latlong_from_js(c: Column | str) -> tuple[Column, Column]:
    """Reproduce lianjia.py:67-73: substring-window on 'resblockPosition:'
    then regex '(\\d.*\\d),(\\d.*\\d)' with '0' defaults (F2/F3/P7)."""
    window = F.regexp_extract(
        _c(c), r"resblockPosition:'([0-9.]+),([0-9.]+)'", 0
    )
    lon = F.regexp_extract(window, r"([0-9.]+),", 1)
    lat = F.regexp_extract(window, r",([0-9.]+)", 1)
    return (
        F.coalesce(F.nullif(lon, F.lit("")), F.lit("0")),
        F.coalesce(F.nullif(lat, F.lit("")), F.lit("0")),
    )


def reformat_deal_date(c: Column | str) -> Column:
    """Reproduce lianjia.py:216: '2026.05.20 成交' → date (strip marker,
    '%Y.%m.%d' parse) (F6/F8)."""
    cleaned = F.trim(F.regexp_replace(_c(c), " ?成交", ""))
    return F.try_to_timestamp(
        F.nullif(cleaned, F.lit("")), F.lit("yyyy.MM.dd")
    ).cast("date")


def join_zone(parts: Column) -> Column:
    """Reproduce lianjia.py:63,81: ','.join(breadcrumb array) (F5)."""
    return F.array_join(parts, ",")
