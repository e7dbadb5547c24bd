"""Generic materialized-query surface (session.materialize_query /
query_materialized, Engine.materialize / query_cached).

- Materializing any declared query pins its result; query_cached serves
  the artifact while EVERY landed table is unchanged, values identical
  to running the query.
- ANY table mutation invalidates (conservative whole-catalog
  components); query_cached falls back to the live query — never stale.
- Re-materializing after the change refreshes; a fresh artifact is not
  rebuilt (idempotent). Mutation-suite queries are refused.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.compute as pc
import pytest

from data_etl_sh_lianjia_spark import session as sess
from data_etl_sh_lianjia_spark.canon import canon_rows
from data_etl_sh_lianjia_spark.plans.registry import all_queries

SRC = "/root/testdata/sf0.001"


@pytest.fixture()
def restore_catalog(spark):
    saved = (
        dict(getattr(spark, "_lianjia_ingest_map", {}) or {}),
        dict(getattr(spark, "_lianjia_table_cache", {}) or {}),
        dict(getattr(spark, "_lianjia_keydict_views", {}) or {}),
    )
    yield
    spark._lianjia_ingest_map = saved[0]
    spark._lianjia_table_cache = saved[1]
    spark._lianjia_keydict_views = saved[2]
    spark._lianjia_views_dir = None


def _canon(df):
    return canon_rows([tuple(r) for r in df.collect()], df.columns)


def test_materialize_serves_invalidate_on_mutation_refresh(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = tmp_path / "sfmat"
    sf.mkdir()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region"):
        shutil.copy(f"{SRC}/{t}.parquet", str(sf / f"{t}.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    sf = str(sf)

    path = sess.materialize_query(spark, sf, "q5_join5")
    assert os.path.isdir(path)
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))

    live = _canon(all_queries()["q5_join5"].spark_fn(spark, sf))
    mat = sess.query_materialized(spark, sf, "q5_join5")
    assert mat is not None
    assert _canon(mat) == live, "materialized values must match the query"

    # idempotent: a fresh artifact is not rebuilt
    assert sess.materialize_query(spark, sf, "q5_join5") == path
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime

    # ANY table mutation invalidates — even one q5 doesn't read from
    sess.delete_where(
        spark, sf, "orders", pc.field("o_orderstatus") == "F"
    )
    assert sess.query_materialized(spark, sf, "q5_join5") is None, (
        "a mutated catalog must refuse the artifact"
    )
    # refresh pins the post-mutation result
    sess.materialize_query(spark, sf, "q5_join5")
    live2 = _canon(all_queries()["q5_join5"].spark_fn(spark, sf))
    mat2 = sess.query_materialized(spark, sf, "q5_join5")
    assert mat2 is not None and _canon(mat2) == live2

    with pytest.raises(ValueError, match="mutation-suite"):
        sess.materialize_query(spark, sf, "delete_where_orders")


def _star_sf(tmp_path, monkeypatch, sub, tables):
    sf = tmp_path / sub
    sf.mkdir()
    for t in tables:
        shutil.copy(f"{SRC}/{t}.parquet", str(sf / f"{t}.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    return str(sf)


def _sorted_canon(df):
    cols = sorted(df.columns)
    return _canon(df.select(*cols))


def test_builtin_coarse_cuts_unified_engine(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """The three built-in coarse serves (q1cut aggproj cut, q5asia and
    q3top star cuts) on the unified `_derive_cut` spec: each artifact's
    contents equal the full-plan SQL with the cut's constants, both after
    a fresh ingest and after a row-level mutation re-derives them."""
    sf = _star_sf(
        tmp_path, monkeypatch, "sfcuts",
        ("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region"):
        spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")) \
            .createOrReplaceTempView(f"_tm_{t}")

    def q1cut_expected():
        spec = sess._AGG_PROJECTIONS["lineitem"]
        msel = ", ".join(
            f"{expr} AS {name}" for name, expr in spec["measures"].items()
        )
        return spark.sql(f"""
SELECT l_returnflag, l_linestatus, {msel}
FROM _tm_lineitem
WHERE l_shipdate <= TIMESTAMP_NTZ '{sess.Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus""")

    def q5asia_expected():
        return spark.sql("""
SELECT n_name,
       SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000
           + 0.5) AS BIGINT)) AS s_rev,
       COUNT(*) AS cnt
FROM _tm_lineitem l
JOIN _tm_orders o   ON l.l_orderkey = o.o_orderkey
JOIN _tm_customer c ON c.c_custkey  = o.o_custkey
JOIN _tm_supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
JOIN _tm_nation n   ON s.s_nationkey = n.n_nationkey
JOIN _tm_region r   ON n.n_regionkey = r.r_regionkey
WHERE r_name = 'ASIA' AND YEAR(o_orderdate) IN (1996, 1997)
GROUP BY n_name""")

    def q3top_expected():
        return spark.sql("""
SELECT l_orderkey,
       SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000
           + 0.5) AS BIGINT)) AS s_rev,
       CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
FROM _tm_lineitem l
JOIN _tm_orders o   ON l.l_orderkey = o.o_orderkey
JOIN _tm_customer c ON c.c_custkey  = o.o_custkey
WHERE o.o_orderdate < TIMESTAMP_NTZ '1998-03-15 00:00:00'
  AND l.l_shipdate  > TIMESTAMP_NTZ '1996-03-15 00:00:00'
  AND c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY CAST(SUM(CAST(FLOOR((l_extendedprice * (1 - l_discount)) * 10000
           + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0D DESC, l_orderkey
LIMIT 10""")

    def assert_all_serve():
        v1 = sess.aggproj_coarse_view(spark, sf, "lineitem")
        assert v1, "q1cut artifact must be fresh"
        assert _sorted_canon(spark.table(v1)) == _sorted_canon(
            q1cut_expected()
        )
        v5 = sess.joinproj_coarse_view(spark, sf, "sales_geo_year")
        assert v5, "q5asia artifact must be fresh"
        assert _sorted_canon(spark.table(v5)) == _sorted_canon(
            q5asia_expected()
        )
        v3 = sess.joinproj_coarse_view(spark, sf, "q3_orderrev")
        assert v3, "q3top artifact must be fresh"
        assert _sorted_canon(spark.table(v3)) == _sorted_canon(
            q3top_expected()
        )

    assert_all_serve()
    # a row-level mutation must re-derive all three cuts in lockstep
    sess.delete_where(
        spark, sf, "lineitem", pc.field("l_linenumber") == 3
    )
    for t in ("lineitem",):
        spark.read.parquet(os.path.join(out_dir, f"{t}.parquet")) \
            .createOrReplaceTempView(f"_tm_{t}")
    assert_all_serve()


def test_pin_rollup_cut_maintained_across_mutations(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """A USER-pinned rollup cut (same declarative spec as the built-ins)
    is derived now, served in fingerprint lockstep, auto-refreshed by the
    mutation that invalidates it, and dropped from serving on unpin."""
    sf = _star_sf(tmp_path, monkeypatch, "sfpin", ("lineitem", "orders"))
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]

    dst = sess.pin_rollup_cut(
        spark, sf, "flagcnt", "aggproj", "lineitem",
        "SELECT l_returnflag, SUM(cnt) AS cnt, SUM(s_qty) AS s_qty "
        "FROM {src} GROUP BY l_returnflag",
    )
    assert os.path.isdir(dst)

    def expected():
        spark.read.parquet(os.path.join(out_dir, "lineitem.parquet")) \
            .createOrReplaceTempView("_tm_li")
        return spark.sql("""
SELECT l_returnflag, COUNT(*) AS cnt,
       SUM(CAST(FLOOR(l_quantity * 10000 + 0.5) AS BIGINT)) AS s_qty
FROM _tm_li GROUP BY l_returnflag""")

    v = sess.pinned_view(spark, sf, "flagcnt")
    assert v is not None
    assert _sorted_canon(spark.table(v)) == _sorted_canon(expected())

    # the mutation itself refreshes the pin — no explicit rebuild call
    sess.delete_where(spark, sf, "lineitem", pc.field("l_linenumber") == 1)
    v2 = sess.pinned_view(spark, sf, "flagcnt")
    assert v2 is not None, "mutation tail must re-derive the pinned cut"
    assert _sorted_canon(spark.table(v2)) == _sorted_canon(expected())

    # unknown parent kind and missing parent artifact are refused
    with pytest.raises(ValueError, match="parent_kind"):
        sess.pin_rollup_cut(spark, sf, "x", "nope", "lineitem", "SELECT 1")
    with pytest.raises(ValueError, match="does not exist"):
        sess.pin_rollup_cut(
            spark, sf, "x", "aggproj", "no_such_table", "SELECT 1"
        )

    assert sess.unpin(spark, sf, "flagcnt") is True
    assert sess.pinned_view(spark, sf, "flagcnt") is None
    assert sess.unpin(spark, sf, "flagcnt") is False


def test_pin_query_auto_refreshes_after_mutation(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """pin_query = materialize_query + maintenance: unlike the bare
    materialize (first test: None after a mutation until re-called), a
    PINNED query re-materializes inside the mutation itself."""
    sf = _star_sf(
        tmp_path, monkeypatch, "sfpinq",
        ("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )
    sess.pin_query(spark, sf, "q5_join5")
    assert sess.query_materialized(spark, sf, "q5_join5") is not None

    sess.delete_where(spark, sf, "orders", pc.field("o_orderstatus") == "F")
    mat = sess.query_materialized(spark, sf, "q5_join5")
    assert mat is not None, "pinned query must auto-refresh on mutation"
    live = _canon(all_queries()["q5_join5"].spark_fn(spark, sf))
    assert _canon(mat) == live


def test_engine_query_cached_and_cli(spark, tmp_path, monkeypatch,
                                     restore_catalog):
    from data_etl_sh_lianjia_spark.__main__ import main

    sf = tmp_path / "sfmat2"
    sf.mkdir()
    for t in ("documents",):
        shutil.copy(f"{SRC}/{t}.parquet", str(sf / f"{t}.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))

    rc = main(["materialize", "text_stats", "--sf-dir", str(sf)])
    assert rc == 0
    assert main(["materialize", "no_such_query", "--sf-dir", str(sf)]) == 2
    from data_etl_sh_lianjia_spark.api import Engine

    # simulate a FRESH process: the session's managed-catalog map is empty,
    # so serving must re-resolve it (query_materialized ingests first)
    spark._lianjia_ingest_map = {}
    spark._lianjia_keydict_views = {}
    eng = Engine(sf_dir=str(sf), spark=spark)
    cached = eng.query_cached("text_stats")
    assert "lj_qm_text_stats" in cached._jdf.queryExecution().toString(), (
        "query_cached must serve from the pinned artifact's view"
    )
    assert _canon(cached) == _canon(eng.query("text_stats"))
