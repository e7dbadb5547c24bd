"""reuse_checkpoint durability routing (VERDICT r11 #3 / guide §5).

The multiply-consumed-subtree materialization in the dedup/TF-IDF family
must stay a cheap block-manager localCheckpoint at local scales but switch
to a RELIABLE checkpoint dir once the source table's bytes clear
SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES — localCheckpoint is not fault-tolerant,
and at deployment scale an executor loss must cost a re-read, not the
query. Both routes must truncate the plan (LogicalRDD) and return
identical rows. The Dataset API does not surface which checkpoint flavor
backs the returned frame, so the tests distinguish the routes by the one
observable difference: reliable checkpoints write files under the
checkpoint dir, local ones never touch disk paths.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.session import load_tables, reuse_checkpoint


def _docs_head(spark, sf_dir):
    docs = load_tables(spark, sf_dir, names=("documents",))["documents"]
    return docs.select("doc_id", "source").limit(50)


def _ckdir_files(ckdir: str) -> list[str]:
    return [f for _r, _d, fs in os.walk(ckdir) for f in fs]


def _is_rdd_scan(df) -> bool:
    return "LogicalRDD" in df._jdf.queryExecution().optimizedPlan().toString()


def test_local_route_below_threshold(spark, sf_dir, monkeypatch, tmp_path):
    ckdir = str(tmp_path / "reliable-ckpt")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", str(1 << 40))
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = reuse_checkpoint(_docs_head(spark, sf_dir), spark, sf_dir, "documents")
    assert _is_rdd_scan(df)
    assert df.count() == 50
    assert not _ckdir_files(ckdir), "local route must not write checkpoint files"


def test_reliable_route_above_threshold(spark, sf_dir, monkeypatch, tmp_path):
    ckdir = str(tmp_path / "reliable-ckpt")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    had_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    df = reuse_checkpoint(_docs_head(spark, sf_dir), spark, sf_dir, "documents")
    assert _is_rdd_scan(df)
    assert df.count() == 50
    if not had_dir:
        # the helper set the dir from the env override: files must be there
        assert _ckdir_files(ckdir), "reliable checkpoint wrote nothing"
    else:
        # a dir fixed earlier in the session wins; files land there instead
        jdir = spark.sparkContext._jsc.sc().getCheckpointDir().get()
        assert _ckdir_files(jdir.replace("file:", "")), (
            "reliable checkpoint wrote nothing under the session dir"
        )


def test_unknown_source_stays_local(spark, monkeypatch, tmp_path):
    # missing table path → size unknown → conservative local route
    ckdir = str(tmp_path / "reliable-ckpt")
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_CKPT_MAX_BYTES", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    out = reuse_checkpoint(spark.range(10), spark, "/nonexistent-sf", "documents")
    assert out.count() == 10
    assert not _ckdir_files(ckdir)
