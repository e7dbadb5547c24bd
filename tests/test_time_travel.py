"""Snapshot time travel (session.table_history / read_table_version /
restore_table_version).

Contract under test:

- Every mutating publish (append, whole-batch delete, predicate delete,
  update) first retains the current generation under ``<table>.snaps/``
  as a HARDLINK copy — disk cost only for the files the mutation rewrote.
- ``read_table_version`` returns the retained generation bit-identically.
- ``restore_table_version`` rolls the managed table back, snapshots the
  pre-restore state first (undoable), and rebuilds every projection to
  the restored generation — stale projections are never served.
- Retention prunes oldest past SNAP_RETAIN; a FULL rebuild (source
  rewrite) clears the history (new state lineage).
- Source-landed appends re-apply after a restore on the next ingest (the
  landing dir still holds their files) — the documented scope boundary.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
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
        set(getattr(spark, "_lianjia_cached_views", set()) or set()),
        dict(getattr(spark, "_lianjia_keydict_views", {}) or {}),
        set(getattr(spark, "_lianjia_dim_pool", {}) or {}),
        set(getattr(spark, "_lianjia_flat_pool", {}) or {}),
        dict(getattr(spark, "_lianjia_bucket_tables", {}) or {}),
    )
    yield
    dim_pool = getattr(spark, "_lianjia_dim_pool", {})
    for key in set(dim_pool) - saved[4]:
        try:
            dim_pool.pop(key)[1].unpersist()
        except Exception:
            pass
    flat_pool = getattr(spark, "_lianjia_flat_pool", {})
    for key in set(flat_pool) - saved[5]:
        try:
            flat_pool.pop(key)[1].unpersist()
        except Exception:
            pass
    spark._lianjia_ingest_map = saved[0]
    spark._lianjia_table_cache = saved[1]
    spark._lianjia_cached_views = saved[2]
    spark._lianjia_keydict_views = saved[3]
    spark._lianjia_bucket_tables = saved[6]
    spark._lianjia_views_dir = None


def _run(spark, sf_dir, name):
    df = all_queries()[name].spark_fn(spark, sf_dir)
    return canon_rows([tuple(r) for r in df.collect()], df.columns)


def _mk_sf(tmp_path, monkeypatch, tables, sub="sftt"):
    sf = tmp_path / sub
    sf.mkdir()
    for t in tables:
        shutil.copy(f"{SRC}/{t}.parquet", str(sf / f"{t}.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    return str(sf)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_mutations_snapshot_and_version_reads_are_bit_identical(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",))
    out = sess.ingest_tables(spark, sf)
    orig = _rows(spark.read.parquet(os.path.join(out, "orders.parquet")))

    sess.delete_where(spark, sf, "orders", pc.field("o_orderstatus") == "F")
    after_delete = _rows(
        spark.read.parquet(os.path.join(out, "orders.parquet"))
    )
    sess.update_where(
        spark, sf, "orders", pc.field("o_orderstatus") == "O",
        {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1.0)},
    )

    hist = sess.table_history(spark, sf, "orders")
    versions = [h["version"] for h in hist if h.get("version") is not None]
    assert versions == [1, 2]
    ops = [h["superseded_by"] for h in hist if h.get("version") is not None]
    assert ops == ["delete", "update"]
    assert hist[-1].get("current") is True

    assert _rows(sess.read_table_version(spark, sf, "orders", 1)) == orig
    assert (
        _rows(sess.read_table_version(spark, sf, "orders", 2)) == after_delete
    )
    with pytest.raises(ValueError, match="no snapshot"):
        sess.read_table_version(spark, sf, "orders", 9)


def test_snapshots_are_hardlinks_not_copies(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """A snapshot shares inodes with the generation it retains — disk cost
    is only the mutation's rewritten files, the Delta/Iceberg economics."""
    sf = _mk_sf(tmp_path, monkeypatch, tables=("lineitem",))
    out = sess.ingest_tables(spark, sf, parts=4, min_rows_to_split=1000)
    dst = os.path.join(out, "lineitem.parquet")
    pre = {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(os.path.join(dst, "*.parquet"))
    }

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    cutoff = sorted(li.column("l_shipdate").to_pylist())[600]
    sess.delete_where(spark, sf, "lineitem", pc.field("l_shipdate") < cutoff)

    snap = os.path.join(dst + ".snaps", "00001")
    snap_inodes = {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(os.path.join(snap, "*.parquet"))
    }
    assert snap_inodes == pre, "snapshot must hardlink the prior generation"
    # and the current generation still hardlinks the 3 unaffected files
    cur = {
        os.path.basename(p): os.stat(p).st_ino
        for p in glob.glob(os.path.join(dst, "*.parquet"))
    }
    assert sum(1 for f, i in cur.items() if pre.get(f) == i) == 3


def test_restore_rolls_back_rebuilds_projections_and_is_undoable(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = _mk_sf(
        tmp_path, monkeypatch,
        tables=("lineitem", "orders", "customer", "supplier", "nation",
                "region"),
    )
    out = sess.ingest_tables(spark, sf)
    q1_orig = _run(spark, sf, "q1_scan_agg")

    n = sess.delete_where(
        spark, sf, "lineitem", pc.field("l_quantity") >= 30
    )
    assert n > 0
    assert _run(spark, sf, "q1_scan_agg") != q1_orig

    sess.restore_table_version(spark, sf, "lineitem", 1)
    assert _run(spark, sf, "q1_scan_agg") == q1_orig, (
        "restore must roll the projection-served aggregate back"
    )
    # projection == full scan after restore (nothing stale served)
    for proj, full in (
        ("q1_scan_agg", "q1_scan_agg_df"),
        ("q3_join3", "q3_join3_df"),
        ("distinct_count", "distinct_count_df"),
        ("topk_sort", "topk_sort_df"),
    ):
        assert _run(spark, sf, proj) == _run(spark, sf, full)

    # the restore itself was snapshotted: v2 is the pre-restore (deleted)
    hist = sess.table_history(spark, sf, "lineitem")
    ops = [h["superseded_by"] for h in hist if h.get("version") is not None]
    assert ops == ["delete", "restore-to-1"]
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    v2 = sess.read_table_version(spark, sf, "lineitem", 2)
    assert v2.count() == li.num_rows - n, "v2 must be the post-delete state"


def test_retention_prunes_and_full_rebuild_clears(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",))
    sess.ingest_tables(spark, sf)
    monkeypatch.setattr(sess, "SNAP_RETAIN", 3)
    for i in range(5):
        sess.update_where(
            spark, sf, "orders", pc.field("o_orderkey") >= 0,
            {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1.0)},
        )
    hist = sess.table_history(spark, sf, "orders")
    versions = [h["version"] for h in hist if h.get("version") is not None]
    assert versions == [3, 4, 5], "oldest snapshots must prune past retention"

    # full rebuild (source rewrite) clears the history: new lineage
    orders = pq.read_table(f"{SRC}/orders.parquet")
    pq.write_table(orders.slice(0, 100), os.path.join(sf, "orders.parquet"))
    sess.ingest_tables(spark, sf)
    assert spark._lianjia_ingest_rebuilt == 1
    hist2 = sess.table_history(spark, sf, "orders")
    assert [h for h in hist2 if h.get("version") is not None] == []


def test_restore_scope_source_appends_reapply(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Documented boundary: restore rolls back MANAGED mutations; a
    source-landed append re-applies on the next ingest because its file
    still sits in the landing directory."""
    sf = tmp_path / "sfappend"
    (sf / "orders.parquet").mkdir(parents=True)
    orders = pq.read_table(f"{SRC}/orders.parquet")
    half = orders.num_rows // 2
    pq.write_table(
        orders.slice(0, half), str(sf / "orders.parquet" / "b0.parquet")
    )
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    out = sess.ingest_tables(spark, str(sf))

    pq.write_table(
        orders.slice(half), str(sf / "orders.parquet" / "b1.parquet")
    )
    sess.ingest_tables(spark, str(sf))
    assert spark._lianjia_ingest_appended == 1
    hist = sess.table_history(spark, str(sf), "orders")
    assert [h["superseded_by"] for h in hist if h.get("version")] == ["append"]
    assert (
        sess.read_table_version(spark, str(sf), "orders", 1).count() == half
    )

    sess.restore_table_version(spark, str(sf), "orders", 1)
    # the restore's trailing re-ingest sees b1 as a fresh delta: re-applied
    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post.count() == orders.num_rows


def test_vacuum_drops_snapshots_cli_included(
    spark, tmp_path, monkeypatch, restore_catalog
):
    from data_etl_sh_lianjia_spark.__main__ import main

    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",), sub="sfvac")
    sess.ingest_tables(spark, sf)
    for _ in range(3):
        sess.update_where(
            spark, sf, "orders", pc.field("o_orderkey") >= 0,
            {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1.0)},
        )
    hist = sess.table_history(spark, sf, "orders")
    assert len([h for h in hist if h.get("version")]) == 3

    assert sess.vacuum_table(spark, sf, "orders", keep=1) == 2
    hist2 = sess.table_history(spark, sf, "orders")
    assert [h["version"] for h in hist2 if h.get("version")] == [3]

    rc = main(["vacuum", "orders", "--keep", "0", "--sf-dir", sf])
    assert rc == 0
    hist3 = sess.table_history(spark, sf, "orders")
    assert [h for h in hist3 if h.get("version")] == []


def test_transaction_rolls_back_all_mutated_tables(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """An exception inside the transaction block rolls EVERY mutated table
    back to its entry state (all-or-nothing across tables); a clean block
    commits; exhausted retention raises instead of silently part-rolling."""
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders", "lineitem"),
                sub="sftxn")
    out = sess.ingest_tables(spark, sf)
    orders_pre = _rows(spark.read.parquet(os.path.join(out, "orders.parquet")))
    li_pre = _rows(spark.read.parquet(os.path.join(out, "lineitem.parquet")))

    class Boom(RuntimeError):
        pass

    with pytest.raises(Boom):
        with sess.transaction(spark, sf, "orders", "lineitem"):
            sess.delete_where(
                spark, sf, "orders", pc.field("o_orderstatus") == "F"
            )
            sess.update_where(
                spark, sf, "lineitem", pc.field("l_quantity") >= 45,
                {"l_quantity": lambda t: pc.add(t["l_quantity"], 5.0)},
            )
            raise Boom("second step failed")

    assert _rows(
        spark.read.parquet(os.path.join(out, "orders.parquet"))
    ) == orders_pre, "orders must roll back"
    assert _rows(
        spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    ) == li_pre, "lineitem must roll back"
    # rolled-back catalog still serves consistently
    assert _run(spark, sf, "q1_scan_agg") == _run(spark, sf, "q1_scan_agg_df")

    # clean block commits (no rollback)
    with sess.transaction(spark, sf, "orders"):
        n = sess.delete_where(
            spark, sf, "orders", pc.field("o_orderstatus") == "F"
        )
    assert n > 0
    post = spark.read.parquet(os.path.join(out, "orders.parquet"))
    assert post.filter("o_orderstatus = 'F'").count() == 0

    # a table untouched by the failing block is not restored
    li_now = _rows(spark.read.parquet(os.path.join(out, "lineitem.parquet")))
    with pytest.raises(Boom):
        with sess.transaction(spark, sf, "orders", "lineitem"):
            raise Boom("nothing mutated")
    assert _rows(
        spark.read.parquet(os.path.join(out, "lineitem.parquet"))
    ) == li_now


def test_transaction_rollback_refuses_when_retention_exhausted(
    spark, tmp_path, monkeypatch, restore_catalog
):
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",), sub="sftxn2")
    sess.ingest_tables(spark, sf)
    monkeypatch.setattr(sess, "SNAP_RETAIN", 2)

    class Boom(RuntimeError):
        pass

    with pytest.raises(RuntimeError, match="no longer retained"):
        with sess.transaction(spark, sf, "orders"):
            for _ in range(3):  # ages the entry generation out of retention
                sess.update_where(
                    spark, sf, "orders", pc.field("o_orderkey") >= 0,
                    {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1.0)},
                )
            raise Boom("too late to roll back")


def test_table_changes_feed_between_versions(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """CDF semantics: deletes surface removed rows, updates surface their
    delete(old)/insert(new) pair, unchanged rows are absent, and
    version-to-version reads compose (v1->v2 + v2->current == v1->current
    as multisets)."""
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",), sub="sfcdf")
    sess.ingest_tables(spark, sf)
    orders = pq.read_table(f"{SRC}/orders.parquet")
    n_f = orders.filter(pc.field("o_orderstatus") == "F").num_rows
    n_o = orders.filter(pc.field("o_orderstatus") == "O").num_rows

    sess.delete_where(spark, sf, "orders", pc.field("o_orderstatus") == "F")
    sess.update_where(
        spark, sf, "orders", pc.field("o_orderstatus") == "O",
        {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1.0)},
    )

    feed = sess.table_changes(spark, sf, "orders", 1).collect()
    by_type: dict = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert len(by_type["delete"]) == n_f + n_o
    assert len(by_type["insert"]) == n_o
    assert all(
        r["o_orderstatus"] in ("F", "O") for r in by_type["delete"]
    )
    assert all(r["o_orderstatus"] == "O" for r in by_type["insert"])

    # stepwise feeds compose: v1->v2 (the delete) then v2->current (the
    # update) equals v1->current as a multiset
    step1 = sess.table_changes(spark, sf, "orders", 1, 2).collect()
    step2 = sess.table_changes(spark, sf, "orders", 2).collect()
    assert sorted(map(tuple, step1 + step2)) == sorted(map(tuple, feed))
    # and the delete-only step carries no inserts
    assert all(r["_change_type"] == "delete" for r in step1)


def test_vacuum_sweeps_orphaned_mutation_scratch_dirs(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """A crash mid-mutation leaves uuid-suffixed hold/stage dirs next to
    the managed table; vacuum reclaims them — but only once they age past
    SCRATCH_SWEEP_AGE_S, so a vacuum racing a LIVE mutation from another
    process never deletes its in-flight staging. pid-keyed _publish_dir
    dirs (.tmp-*/.old-*) are NOT swept — a concurrent publish may own
    one."""
    sf = _mk_sf(tmp_path, monkeypatch, tables=("orders",))
    out = sess.ingest_tables(spark, sf)
    dst = os.path.join(out, "orders.parquet")
    orphans = [
        dst + ".dropped-123-deadbeef",
        dst + ".updold-123-deadbeef",
        dst + ".updnew-123-deadbeef",
        dst + ".stage-123-deadbeef",
    ]
    keep_tmp = dst + ".tmp-99999"
    fresh = dst + ".stage-456-cafecafe"
    for d in orphans + [keep_tmp, fresh]:
        os.makedirs(d)
    old = time.time() - 7200
    for d in orphans:
        os.utime(d, (old, old))  # crash orphans are hours old
    sess.vacuum_table(spark, sf, "orders")
    for d in orphans:
        assert not os.path.exists(d), f"orphan not swept: {d}"
    assert os.path.exists(keep_tmp), ".tmp-* must survive (publisher-owned)"
    assert os.path.exists(fresh), (
        "a FRESH scratch dir (possible live mutation) must survive the sweep"
    )
    os.rmdir(keep_tmp)
    os.rmdir(fresh)
