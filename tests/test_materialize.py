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
