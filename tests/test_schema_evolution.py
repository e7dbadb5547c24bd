"""Additive schema evolution on directory landings.

Contract under test (session._read_landed / _delta_schema_ok /
_conform_to_schema):

- A landed part that ADDS a column is the evolution event: the managed
  copy rebuilds under the UNIFIED schema — old rows null-fill, nothing
  is silently dropped (pyarrow's first-fragment read would lose the
  column), and later same-schema appends are O(batch) again.
- A part that DROPS a column also rebuilds (unified: batch rows
  null-fill the column) — the O(batch) path never produces a
  mixed-schema managed dir the projection mergers can't resolve.
- Column-ORDER differences alone stay on the O(batch) append path
  (parquet is name-addressed).
- A genuine TYPE conflict raises a clear error instead of guessing.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_etl_sh_lianjia_spark import session as sess

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


def _mk_dir_sf(tmp_path, monkeypatch, n_rows=None):
    sf = tmp_path / "sfev"
    (sf / "orders.parquet").mkdir(parents=True)
    orders = pq.read_table(f"{SRC}/orders.parquet")
    if n_rows:
        orders = orders.slice(0, n_rows)
    pq.write_table(orders, str(sf / "orders.parquet" / "b0.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    return str(sf), orders


def test_added_column_rebuilds_unified_then_appends_resume(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf, orders = _mk_dir_sf(tmp_path, monkeypatch)
    out = sess.ingest_tables(spark, sf)

    evolved = orders.slice(0, 50).append_column(
        "o_channel", pa.array(["web"] * 50)
    )
    pq.write_table(evolved, os.path.join(sf, "orders.parquet", "b1.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_appended == 0, (
        "an added column is the evolution event: must NOT take the delta path"
    )
    assert spark._lianjia_ingest_rebuilt == 1

    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert "o_channel" in post.columns, "new column must survive the rebuild"
    assert post.count() == orders.num_rows + 50
    assert post.filter("o_channel = 'web'").count() == 50
    assert post.filter("o_channel IS NULL").count() == orders.num_rows

    # appends under the evolved schema are O(batch) again
    more = orders.slice(50, 30).append_column(
        "o_channel", pa.array(["app"] * 30)
    )
    # unify: b0 lacks o_channel, so the managed schema is the unified one;
    # the batch matches it exactly -> delta path
    pq.write_table(more, os.path.join(sf, "orders.parquet", "b2.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_rebuilt == 1, (
        "b2 matches b0's schema? no — b0 lacks o_channel, so the source "
        "parts disagree and the delta gate rebuilds again (source parts "
        "are the schema reference, not the managed copy)"
    )
    post2 = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post2.filter("o_channel = 'app'").count() == 30
    assert post2.count() == orders.num_rows + 80


def test_dropped_column_batch_rebuilds_with_nulls(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf, orders = _mk_dir_sf(tmp_path, monkeypatch)
    out = sess.ingest_tables(spark, sf)

    subset = orders.slice(0, 40).drop_columns(["o_orderpriority"])
    pq.write_table(subset, os.path.join(sf, "orders.parquet", "b1.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_appended == 0
    assert spark._lianjia_ingest_rebuilt == 1
    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post.count() == orders.num_rows + 40
    assert post.filter("o_orderpriority IS NULL").count() == 40


def test_column_order_difference_stays_on_delta_path(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf, orders = _mk_dir_sf(tmp_path, monkeypatch)
    out = sess.ingest_tables(spark, sf)

    reordered = orders.slice(0, 25).select(
        list(reversed(orders.schema.names))
    )
    pq.write_table(reordered, os.path.join(sf, "orders.parquet", "b1.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_appended == 1, (
        "column order alone must not cancel the O(batch) append"
    )
    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post.count() == orders.num_rows + 25
    # appended managed parts carry the managed column order (conformed)
    schemas = {
        tuple(pq.read_schema(os.path.join(out, "orders.parquet", f)).names)
        for f in os.listdir(os.path.join(out, "orders.parquet"))
        if f.endswith(".parquet")
    }
    assert len(schemas) == 1, "managed parts must stay schema-identical"


def test_type_conflict_raises_clearly(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf, orders = _mk_dir_sf(tmp_path, monkeypatch)
    sess.ingest_tables(spark, sf)

    bad = orders.slice(0, 10).set_column(
        orders.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        pa.array(["oops"] * 10, pa.string()),
    )
    pq.write_table(bad, os.path.join(sf, "orders.parquet", "b1.parquet"))
    with pytest.raises(ValueError, match="incompatible schemas"):
        sess.ingest_tables(spark, sf)


# ------------------------------------------------------------ type widening
# r11: INT→BIGINT / FLOAT→DOUBLE type widening maps through the unified
# rebuild (session._unify_schemas_widening) instead of the type-conflict
# error; cross-family changes (numeric↔string, int↔float) still reject.


def _mk_narrow_sf(tmp_path, monkeypatch):
    """Landed orders whose base part carries o_custkey as INT32 (the
    narrow historical schema a years-old corpus starts from)."""
    sf = tmp_path / "sfwide"
    (sf / "orders.parquet").mkdir(parents=True)
    orders = pq.read_table(f"{SRC}/orders.parquet")
    narrow = orders.set_column(
        orders.schema.get_field_index("o_custkey"),
        "o_custkey",
        orders["o_custkey"].cast(pa.int32()),
    )
    pq.write_table(narrow, str(sf / "orders.parquet" / "b0.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    return str(sf), orders, narrow


def test_int_widening_rebuilds_then_appends_resume(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """A batch that WIDENS a column (INT32 base, INT64 batch) is the
    evolution event: full rebuild under the widened schema, old rows
    losslessly upcast — then BOTH narrow and wide later batches resume the
    O(batch) append path against the widened managed copy."""
    sf, orders, narrow = _mk_narrow_sf(tmp_path, monkeypatch)
    out = sess.ingest_tables(spark, sf)
    base_schema = {
        f.name: f.dataType.simpleString()
        for f in spark.read.parquet(
            os.path.join(out, "orders.parquet")
        ).schema
    }
    assert base_schema["o_custkey"] == "int", "narrow base must ingest as-is"

    wide = orders.slice(0, 40)  # original int64 o_custkey
    pq.write_table(wide, os.path.join(sf, "orders.parquet", "b1.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_appended == 0, (
        "a widened column is the evolution event: must NOT take the delta "
        "path (the managed copy still holds the narrow type)"
    )
    assert spark._lianjia_ingest_rebuilt == 1

    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert dict(
        (f.name, f.dataType.simpleString()) for f in post.schema
    )["o_custkey"] == "bigint", "managed copy must carry the WIDE type"
    assert post.count() == orders.num_rows + 40
    # old rows upcast losslessly: the base generation's key sum survives
    import pyarrow.compute as pc

    want = pc.sum(narrow["o_custkey"]).as_py() + pc.sum(
        wide["o_custkey"]
    ).as_py()
    got = post.groupBy().sum("o_custkey").collect()[0][0]
    assert got == want

    # a NARROW batch after the widening stays O(batch): it upcasts into
    # the managed wide schema (no rebuild-per-append regression)
    nar2 = narrow.slice(40, 30)
    pq.write_table(nar2, os.path.join(sf, "orders.parquet", "b2.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_appended == 1, (
        "post-widening narrow append must take the O(batch) delta path"
    )
    assert spark._lianjia_ingest_rebuilt == 0
    post2 = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post2.count() == orders.num_rows + 70
    assert dict(
        (f.name, f.dataType.simpleString()) for f in post2.schema
    )["o_custkey"] == "bigint"

    # managed parts stay schema-identical after the cast-up append
    schemas = {
        str(pq.read_schema(os.path.join(out, "orders.parquet", f)))
        for f in os.listdir(os.path.join(out, "orders.parquet"))
        if f.endswith(".parquet")
    }
    assert len(schemas) == 1, "managed parts must stay schema-identical"


def test_float_widening_unifies_to_double(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = tmp_path / "sffw"
    (sf / "orders.parquet").mkdir(parents=True)
    orders = pq.read_table(f"{SRC}/orders.parquet")
    f32 = orders.set_column(
        orders.schema.get_field_index("o_totalprice"),
        "o_totalprice",
        orders["o_totalprice"].cast(pa.float32()),
    )
    pq.write_table(f32, str(sf / "orders.parquet" / "b0.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    out = sess.ingest_tables(spark, sf)
    pq.write_table(
        orders.slice(0, 20), os.path.join(sf, "orders.parquet", "b1.parquet")
    )
    sess.ingest_tables(spark, sf)
    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert dict(
        (f.name, f.dataType.simpleString()) for f in post.schema
    )["o_totalprice"] == "double"
    assert post.count() == orders.num_rows + 20


def test_cross_family_change_still_rejects(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """INT64→DOUBLE is NOT widening (loses integer precision past 2^53):
    the unified rebuild must raise the clear conflict error, exactly like
    numeric→string."""
    sf, orders = _mk_dir_sf(tmp_path, monkeypatch)
    sess.ingest_tables(spark, sf)
    bad = orders.slice(0, 10).set_column(
        orders.schema.get_field_index("o_custkey"),
        "o_custkey",
        orders.slice(0, 10)["o_custkey"].cast(pa.float64()),
    )
    pq.write_table(bad, os.path.join(sf, "orders.parquet", "b1.parquet"))
    with pytest.raises(ValueError, match="incompatible schemas"):
        sess.ingest_tables(spark, sf)
