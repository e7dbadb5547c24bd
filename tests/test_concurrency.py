"""Optimistic concurrency control for the DML kernels (commit-log CAS).

Contract under test (session.py `_commit_try` / `_commit_await` /
`_commit_lost`): every row-level mutation CAS-appends a manifest under
``<table>.commits/<seq>.json`` before publishing its generation — exactly
one writer owns each sequence number (EXCL hardlink), the loser discards
its staged work, waits for the winner's publish, and re-applies against
the new snapshot (bounded retries; strict mode surfaces file-overlap
conflicts instead). Covers: CAS mechanics, dangling-commit healing,
unlogged-publish supersession, a deterministic loser re-apply through the
real delete kernel, strict-mode conflict, a same-process two-thread race,
and the genuine two-process race (separate JVMs) the 100 TB multi-writer
contract is about.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import threading
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from data_etl_sh_lianjia_spark import session as sess

SRC = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def restore_catalog(spark):
    saved = (
        dict(getattr(spark, "_lianjia_ingest_map", {}) or {}),
        dict(getattr(spark, "_lianjia_table_cache", {}) or {}),
        set(getattr(spark, "_lianjia_cached_views", set()) or set()),
        dict(getattr(spark, "_lianjia_keydict_views", {}) or {}),
        dict(getattr(spark, "_lianjia_bucket_tables", {}) or {}),
    )
    yield
    spark._lianjia_ingest_map = saved[0]
    spark._lianjia_table_cache = saved[1]
    spark._lianjia_cached_views = saved[2]
    spark._lianjia_keydict_views = saved[3]
    spark._lianjia_bucket_tables = saved[4]
    spark._lianjia_views_dir = None


def _mk_sf(tmp_path, monkeypatch, sub, tables=("customer",)):
    sf = tmp_path / sub
    sf.mkdir()
    for t in tables:
        shutil.copy(f"{SRC}/{t}.parquet", str(sf / f"{t}.parquet"))
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))
    return str(sf)


def _mk_tbl(tmp_path, fp="fp0"):
    dst = tmp_path / "t.parquet"
    dst.mkdir()
    sess._write_marker(str(dst / "_SUCCESS"), fp)
    return str(dst)


def _manifests(dst):
    cdir = sess._commit_log_dir(dst)
    out = []
    for f in sorted(os.listdir(cdir)):
        if f.endswith(".json") and f[:-5].isdigit():
            with open(os.path.join(cdir, f)) as fh:
                out.append(json.load(fh))
    return out


def _no_scratch(dst):
    """No staged/held scratch dirs survive next to the managed table."""
    parent = os.path.dirname(dst)
    base = os.path.basename(dst)
    return [
        d
        for d in os.listdir(parent)
        if d.startswith(base + ".")
        and any(
            tag in d
            for tag in (".stage-", ".dropped-", ".updold-", ".updnew-")
        )
    ]


# ------------------------------------------------------------------ CAS unit


def test_cas_winner_then_stale_reader_loses(tmp_path):
    dst = _mk_tbl(tmp_path)
    outcome, m = sess._commit_try(dst, "delete", "fp0", "fp1", ["a"], ["a"])
    assert outcome == "won" and m["seq"] == 1
    # winner publishes (marker advances); a reader still on fp0 loses
    sess._write_marker(os.path.join(dst, "_SUCCESS"), "fp1")
    outcome2, other = sess._commit_try(
        dst, "delete", "fp0", "fp1x", ["b"], ["b"]
    )
    assert outcome2 == "lost"
    assert other is not None and other["fp_after"] == "fp1"


def test_cas_inflight_commit_reads_as_pending(tmp_path):
    dst = _mk_tbl(tmp_path)
    outcome, m = sess._commit_try(dst, "delete", "fp0", "fp1", ["a"], ["a"])
    assert outcome == "won"
    # the winner has NOT published yet: a second committer from the same
    # snapshot must not claim seq 2 — it sees the in-flight head
    outcome2, other = sess._commit_try(
        dst, "update", "fp0", "fp2", ["b"], ["b"]
    )
    assert outcome2 == "pending" and other["seq"] == 1


def test_await_heals_dangling_commit_of_dead_writer(tmp_path):
    dst = _mk_tbl(tmp_path)
    p = subprocess.Popen(["sleep", "0"])
    p.wait()
    cdir = sess._commit_log_dir(dst)
    os.makedirs(cdir)
    mpath = os.path.join(cdir, "000001.json")
    manifest = {
        "seq": 1, "op": "delete", "fp_before": "fp0", "fp_after": "fp1",
        "reads": [], "writes": [], "pid": p.pid, "ts": time.time() - 30,
    }
    with open(mpath, "w") as fh:
        json.dump(manifest, fh)
    sess._commit_await(dst, manifest, timeout=5.0)
    assert not os.path.exists(mpath)  # healed: writer died before publish


def test_await_raises_when_live_writer_never_publishes(tmp_path):
    dst = _mk_tbl(tmp_path)
    manifest = {
        "seq": 1, "op": "delete", "fp_before": "fp0", "fp_after": "fp1",
        "reads": [], "writes": [], "pid": os.getpid(), "ts": time.time(),
    }
    cdir = sess._commit_log_dir(dst)
    os.makedirs(cdir)
    with open(os.path.join(cdir, "000001.json"), "w") as fh:
        json.dump(manifest, fh)
    with pytest.raises(sess.ConcurrentWriteConflictError):
        sess._commit_await(dst, manifest, timeout=0.3)


def test_unlogged_publish_supersedes_stale_log(tmp_path):
    """A compact/restore/rebuild publishes outside the log: a head whose
    fingerprints match neither marker side must not wedge the CAS."""
    dst = _mk_tbl(tmp_path, fp="fpR")
    cdir = sess._commit_log_dir(dst)
    os.makedirs(cdir)
    with open(os.path.join(cdir, "000007.json"), "w") as fh:
        json.dump(
            {"seq": 7, "op": "delete", "fp_before": "fpX",
             "fp_after": "fpY", "reads": [], "writes": [],
             "pid": os.getpid(), "ts": time.time()},
            fh,
        )
    outcome, m = sess._commit_try(dst, "delete", "fpR", "fpR2", ["a"], ["a"])
    assert outcome == "won" and m["seq"] == 8


def test_commit_lost_strict_mode_raises_on_overlap(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_CONFLICT", "fail")
    other = {"seq": 3, "op": "update", "pid": 1, "ts": time.time(),
             "fp_before": "a", "fp_after": "b",
             "writes": ["part-00001.parquet"]}
    with pytest.raises(sess.ConcurrentWriteConflictError):
        sess._commit_lost(
            str(tmp_path / "t.parquet"), "t", "delete", other,
            reads=["part-00001.parquet", "part-00002.parquet"], retries=3,
        )


def test_commit_lost_retries_exhausted_raises(tmp_path):
    with pytest.raises(sess.ConcurrentWriteConflictError):
        sess._commit_lost(
            str(tmp_path / "t.parquet"), "t", "delete", None, reads=[],
            retries=0,
        )


# ------------------------------------------------- loser re-apply (kernel)


def test_loser_reapplies_after_interleaved_winner(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Deterministic race: a competing DELETE lands between this DELETE's
    match computation and its CAS. The loser must discard its staged work
    and re-apply against the winner's snapshot — final state identical to
    the serial order (winner, then loser), one commit per generation."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfra")
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    src = pq.read_table(f"{SRC}/customer.parquet")
    n_building = len(
        src.filter(pc.equal(src["c_mktsegment"], "BUILDING"))
    )
    n_machinery = len(
        src.filter(pc.equal(src["c_mktsegment"], "MACHINERY"))
    )
    assert n_building and n_machinery

    orig = sess._commit_try
    state = {"fired": False}

    def hijack(d, op, fp_before, fp_after, reads, writes):
        if not state["fired"]:
            state["fired"] = True
            # the competing writer wins the generation first
            won = sess.delete_where(
                spark, sf, "customer",
                pc.field("c_mktsegment") == "MACHINERY",
            )
            assert won == n_machinery
        return orig(d, op, fp_before, fp_after, reads, writes)

    monkeypatch.setattr(sess, "_commit_try", hijack)
    n = sess.delete_where(
        spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING"
    )
    assert n == n_building
    left = pq.read_table(dst)
    segs = set(pc.unique(left["c_mktsegment"]).to_pylist())
    assert "BUILDING" not in segs and "MACHINERY" not in segs
    assert len(left) == len(src) - n_building - n_machinery
    ms = _manifests(dst)
    assert [m["seq"] for m in ms] == [1, 2]
    assert ms[1]["fp_before"] == ms[0]["fp_after"]
    fp_now, _ = sess._read_marker(os.path.join(dst, "_SUCCESS"))
    assert fp_now == ms[1]["fp_after"]
    assert _no_scratch(dst) == []


def test_torn_read_during_compute_reapplies(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Deterministic torn-read race: a competing DELETE publishes while this
    DELETE is mid-split, and the split surfaces a parquet read error (the
    pyarrow metadata/data double-open straddled the winner's generation
    swap). The reader must treat that failure as a CAS loss — settle the
    winner, re-apply — never propagate the OSError (the r11-inherited
    four-writer-stress flake)."""
    sf = _mk_sf(tmp_path, monkeypatch, "sftorn")
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    src = pq.read_table(f"{SRC}/customer.parquet")
    n_building = len(src.filter(pc.equal(src["c_mktsegment"], "BUILDING")))
    n_machinery = len(src.filter(pc.equal(src["c_mktsegment"], "MACHINERY")))
    assert n_building and n_machinery

    orig = sess._split_file_by_predicate
    state = {"fired": False, "inner": False}

    def hijack(path, predicate):
        if not state["fired"] and not state["inner"]:
            state["fired"] = True
            state["inner"] = True
            try:
                won = sess.delete_where(
                    spark, sf, "customer",
                    pc.field("c_mktsegment") == "MACHINERY",
                )
            finally:
                state["inner"] = False
            assert won == n_machinery
            raise OSError(
                "Couldn't deserialize thrift: TProtocolException: "
                "Invalid data\nDeserializing page header failed.\n"
            )
        return orig(path, predicate)

    monkeypatch.setattr(sess, "_split_file_by_predicate", hijack)
    n = sess.delete_where(
        spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING"
    )
    assert n == n_building
    left = pq.read_table(dst)
    segs = set(pc.unique(left["c_mktsegment"]).to_pylist())
    assert "BUILDING" not in segs and "MACHINERY" not in segs
    assert len(left) == len(src) - n_building - n_machinery
    ms = _manifests(dst)
    assert [m["seq"] for m in ms] == [1, 2]
    assert ms[1]["fp_before"] == ms[0]["fp_after"]
    assert _no_scratch(dst) == []


def test_read_raced_classification(tmp_path):
    """_read_raced: unchanged fingerprint re-raises (real corruption);
    moved fingerprint returns (conflict -> caller re-applies); exhausted
    retry budget raises ConcurrentWriteConflictError."""
    dst = str(tmp_path / "t.parquet")
    os.makedirs(dst)
    sess._write_marker(os.path.join(dst, "_SUCCESS"), "fp0")
    with pytest.raises(OSError, match="boom"):
        sess._read_raced(OSError("boom"), dst, "t", "delete", "fp0", 3)
    sess._write_marker(os.path.join(dst, "_SUCCESS"), "fp1")
    sess._read_raced(OSError("boom"), dst, "t", "delete", "fp0", 3)
    with pytest.raises(sess.ConcurrentWriteConflictError):
        sess._read_raced(OSError("boom"), dst, "t", "delete", "fp0", 0)


def test_loser_strict_mode_surfaces_conflict(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Same interleaving, same files touched, strict mode: the loser must
    raise instead of re-applying — and leave no staged scratch behind."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfstrict")
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    orig = sess._commit_try
    state = {"fired": False}

    def hijack(d, op, fp_before, fp_after, reads, writes):
        if not state["fired"]:
            state["fired"] = True
            sess.delete_where(
                spark, sf, "customer",
                pc.field("c_mktsegment") == "MACHINERY",
            )
        return orig(d, op, fp_before, fp_after, reads, writes)

    monkeypatch.setattr(sess, "_commit_try", hijack)
    monkeypatch.setenv("SPARK_GRAFT_COMMIT_CONFLICT", "fail")
    with pytest.raises(sess.ConcurrentWriteConflictError):
        sess.delete_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING"
        )
    assert _no_scratch(dst) == []
    # the winner's commit stands alone; BUILDING rows survive untouched
    left = pq.read_table(dst)
    assert "BUILDING" in set(pc.unique(left["c_mktsegment"]).to_pylist())


# ------------------------------------------------------- two-thread race


def test_two_thread_race_serializes(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Two driver threads race a DELETE and an UPDATE on one table: both
    must succeed (disjoint rows), the generations serialize through the
    commit log, and the final state equals the serial application."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfthr")
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    src = pq.read_table(f"{SRC}/customer.parquet")
    n_building = len(src.filter(pc.equal(src["c_mktsegment"], "BUILDING")))
    n_auto = len(src.filter(pc.equal(src["c_mktsegment"], "AUTOMOBILE")))

    barrier = threading.Barrier(2)
    results: dict = {}

    def do_delete():
        barrier.wait()
        results["delete"] = sess.delete_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING"
        )

    def do_update():
        barrier.wait()
        results["update"] = sess.update_where(
            spark, sf, "customer",
            pc.field("c_mktsegment") == "AUTOMOBILE",
            {"c_acctbal": lambda t: pc.add(t["c_acctbal"], 1000.0)},
        )

    ts = [threading.Thread(target=do_delete),
          threading.Thread(target=do_update)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert results["delete"] == n_building
    assert results["update"] == n_auto
    left = pq.read_table(dst)
    assert len(left) == len(src) - n_building
    # updated rows carry the +1000; every other surviving row is unchanged
    want = src.filter(pc.not_equal(src["c_mktsegment"], "BUILDING"))
    bump = pc.if_else(
        pc.equal(want["c_mktsegment"], "AUTOMOBILE"),
        pc.add(want["c_acctbal"], 1000.0),
        want["c_acctbal"],
    )
    assert sorted(
        zip(left["c_custkey"].to_pylist(), left["c_acctbal"].to_pylist())
    ) == sorted(zip(want["c_custkey"].to_pylist(), bump.to_pylist()))
    ms = _manifests(dst)
    assert len(ms) == 2 and [m["seq"] for m in ms] == [1, 2]
    assert ms[1]["fp_before"] == ms[0]["fp_after"]
    assert _no_scratch(dst) == []


# ------------------------------------------------------ two-process race


def test_two_process_race_exactly_one_winner_per_generation(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """THE multi-writer contract: two separate OS processes (own JVMs, own
    SparkSessions) race a DELETE and an UPDATE on one managed table. Both
    must land; exactly one commit owns each generation; no staged file is
    lost; the final state equals the serial application of both."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfproc")
    sess.ingest_tables(spark, sf)  # pre-ingest so children fingerprint-hit
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    rv = tmp_path / "rv"
    rv.mkdir()
    env = {
        **os.environ,
        "SPARK_GRAFT_INGEST_ROOT": str(tmp_path / "ingest"),
    }
    child = os.path.join(REPO, "tests", "_cc_child.py")
    procs = {
        role: subprocess.Popen(
            [sys.executable, child, sf, role, str(rv)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO,
        )
        for role in ("delete", "update")
    }
    deadline = time.monotonic() + 180
    while not all(
        os.path.exists(str(rv / f"ready-{r}")) for r in procs
    ):
        assert time.monotonic() < deadline, "children never became ready"
        for p in procs.values():
            assert p.poll() is None or p.returncode == 0, (
                p.communicate()[1][-2000:]
            )
        time.sleep(0.05)
    with open(str(rv / "go"), "w") as fh:
        fh.write("go")
    outs = {}
    for role, p in procs.items():
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"{role} failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        outs[role] = int(line.split()[2])

    src = pq.read_table(f"{SRC}/customer.parquet")
    n_building = len(src.filter(pc.equal(src["c_mktsegment"], "BUILDING")))
    n_auto = len(src.filter(pc.equal(src["c_mktsegment"], "AUTOMOBILE")))
    assert outs["delete"] == n_building
    assert outs["update"] == n_auto

    left = pq.read_table(dst)
    want = src.filter(pc.not_equal(src["c_mktsegment"], "BUILDING"))
    bump = pc.if_else(
        pc.equal(want["c_mktsegment"], "AUTOMOBILE"),
        pc.add(want["c_acctbal"], 1000.0),
        want["c_acctbal"],
    )
    assert sorted(
        zip(left["c_custkey"].to_pylist(), left["c_acctbal"].to_pylist())
    ) == sorted(zip(want["c_custkey"].to_pylist(), bump.to_pylist()))

    ms = _manifests(dst)
    assert [m["seq"] for m in ms] == [1, 2], ms
    assert {ms[0]["op"], ms[1]["op"]} == {"delete", "update"}
    assert ms[1]["fp_before"] == ms[0]["fp_after"]
    fp_now, _ = sess._read_marker(os.path.join(dst, "_SUCCESS"))
    assert fp_now == ms[1]["fp_after"]
    assert ms[0]["pid"] != ms[1]["pid"]
    assert _no_scratch(dst) == []


def test_four_writer_stress_serializes(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Four threads race two DELETEs and two UPDATEs with row-disjoint
    predicates: all four must land, the log must hold exactly four
    commits with a consistent chain, and the final state must equal the
    serial application (disjoint predicates make it order-independent)."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfstress")
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    dst = os.path.join(out_dir, "customer.parquet")
    src = pq.read_table(f"{SRC}/customer.parquet")
    segs = {
        s: len(src.filter(pc.equal(src["c_mktsegment"], s)))
        for s in ("BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD")
    }
    assert all(segs.values())

    barrier = threading.Barrier(4)
    results: dict = {}
    errors: list = []

    def run(name, fn):
        def go():
            barrier.wait()
            try:
                results[name] = fn()
            except Exception as e:  # surfaced below
                errors.append((name, e))

        return go

    ops = [
        ("del_b", lambda: sess.delete_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING")),
        ("del_m", lambda: sess.delete_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "MACHINERY")),
        ("upd_a", lambda: sess.update_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "AUTOMOBILE",
            {"c_acctbal": lambda t: pc.add(t["c_acctbal"], 100.0)})),
        ("upd_h", lambda: sess.update_where(
            spark, sf, "customer", pc.field("c_mktsegment") == "HOUSEHOLD",
            {"c_acctbal": lambda t: pc.add(t["c_acctbal"], 200.0)})),
    ]
    ts = [threading.Thread(target=run(n, f)) for n, f in ops]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=600)
    assert not errors, errors
    assert results["del_b"] == segs["BUILDING"]
    assert results["del_m"] == segs["MACHINERY"]
    assert results["upd_a"] == segs["AUTOMOBILE"]
    assert results["upd_h"] == segs["HOUSEHOLD"]

    import pyarrow as pa

    left = pq.read_table(dst)
    want = src.filter(
        pc.invert(
            pc.is_in(
                src["c_mktsegment"],
                value_set=pa.array(["BUILDING", "MACHINERY"]),
            )
        )
    )
    bump = pc.case_when(
        pc.make_struct(
            pc.equal(want["c_mktsegment"], "AUTOMOBILE"),
            pc.equal(want["c_mktsegment"], "HOUSEHOLD"),
        ),
        pc.add(want["c_acctbal"], 100.0),
        pc.add(want["c_acctbal"], 200.0),
        want["c_acctbal"],
    )
    assert sorted(
        zip(left["c_custkey"].to_pylist(), left["c_acctbal"].to_pylist())
    ) == sorted(zip(want["c_custkey"].to_pylist(), bump.to_pylist()))
    ms = _manifests(dst)
    assert [m["seq"] for m in ms] == [1, 2, 3, 4], ms
    for a, b in zip(ms, ms[1:]):
        assert b["fp_before"] == a["fp_after"], (a, b)
    fp_now, _ = sess._read_marker(os.path.join(dst, "_SUCCESS"))
    assert fp_now == ms[-1]["fp_after"]
    assert _no_scratch(dst) == []


def test_commit_history_surface(spark, tmp_path, monkeypatch, restore_catalog):
    """commit_history exposes the CAS ledger: one entry per DML commit,
    chained fingerprints, completed flags, empty before any mutation."""
    sf = _mk_sf(tmp_path, monkeypatch, "sfhist")
    assert sess.commit_history(spark, sf, "customer") == []
    sess.delete_where(
        spark, sf, "customer", pc.field("c_mktsegment") == "BUILDING"
    )
    sess.update_where(
        spark, sf, "customer", pc.field("c_mktsegment") == "AUTOMOBILE",
        {"c_acctbal": lambda t: pc.add(t["c_acctbal"], 1.0)},
    )
    hist = sess.commit_history(spark, sf, "customer")
    assert [h["seq"] for h in hist] == [1, 2]
    assert [h["op"] for h in hist] == ["delete", "update"]
    assert hist[1]["fp_before"] == hist[0]["fp_after"]
    assert all(h["completed"] for h in hist)
    assert all(h["writes"] for h in hist)


# ----------------------------------------------- transaction-scope OCC (M10×M13)
# A multi-table `transaction` composes with the per-table commit CAS through
# canonical-order table locks: single-op writers block while a foreign
# transaction holds the table, the ledger brackets each table's log with
# txn-begin/txn-commit manifests, and the final state always equals some
# serial order of {transaction, writer}.


def _dead_pid():
    p = subprocess.run(
        [sys.executable, "-c", "import os; print(os.getpid())"],
        capture_output=True, text=True,
    )
    return int(p.stdout)


def test_txn_lock_excl_release_and_dead_holder_heal(tmp_path):
    dst = _mk_tbl(tmp_path)
    ok, holder = sess._txn_lock_try(dst, "txnA", ["t"])
    assert ok and holder is None
    ok2, holder2 = sess._txn_lock_try(dst, "txnB", ["t"])
    assert not ok2 and holder2["txn"] == "txnA"
    sess._txn_lock_release(dst, "txnB")  # wrong id: must NOT release
    assert sess._txn_lock_read(dst)["txn"] == "txnA"
    sess._txn_lock_release(dst, "txnA")
    assert sess._txn_lock_read(dst) is None
    # a lock whose holder died heals (age-gated) instead of wedging writers
    with open(sess._txn_lock_path(dst), "w") as fh:
        json.dump(
            {"txn": "ghost", "pid": _dead_pid(), "ts": time.time() - 10}, fh
        )
    t0 = time.monotonic()
    sess._txn_lock_wait(dst)
    assert time.monotonic() - t0 < 5, "heal, not timeout"
    assert sess._txn_lock_read(dst) is None


def test_commit_try_blocks_on_foreign_txn_lock(tmp_path):
    """A single-op commit must WAIT at the CAS while a foreign transaction
    holds the table, then proceed once the lock releases."""
    dst = _mk_tbl(tmp_path)
    ok, _h = sess._txn_lock_try(dst, "txnA", ["t"])
    assert ok

    def rel():
        time.sleep(0.4)
        sess._txn_lock_release(dst, "txnA")

    th = threading.Thread(target=rel)
    th.start()
    t0 = time.monotonic()
    outcome, m = sess._commit_try(dst, "delete", "fp0", "fp1", ["a"], ["a"])
    elapsed = time.monotonic() - t0
    th.join()
    assert outcome == "won" and m["seq"] == 1
    assert elapsed >= 0.3, "must have blocked on the foreign lock"


def test_commit_settle_waits_for_inflight_maintenance(tmp_path):
    """_commit_settle (transaction entry) holds until the in-flight
    commit's .done marker lands — published-but-unmaintained is NOT
    settled."""
    dst = _mk_tbl(tmp_path)
    outcome, m = sess._commit_try(dst, "delete", "fp0", "fp1", ["a"], ["a"])
    assert outcome == "won"
    sess._write_marker(os.path.join(dst, "_SUCCESS"), "fp1")

    def done():
        time.sleep(0.4)
        sess._commit_done(dst, m)

    th = threading.Thread(target=done)
    th.start()
    t0 = time.monotonic()
    sess._commit_settle(dst, timeout=30)
    elapsed = time.monotonic() - t0
    th.join()
    assert elapsed >= 0.3, "must have waited for the .done marker"


def test_two_table_txn_races_single_table_writer(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """THE transaction-scope contract: a two-table transaction (DELETE on
    orders + UPDATE on customer) races an independent single-table writer
    (UPDATE on orders) that starts while the transaction holds its locks.
    The final state must equal a serial order (row-disjoint predicates make
    it unique), and the commit ledger must show the foreign commit entirely
    OUTSIDE the txn-begin..txn-commit bracket on both tables."""
    sf = _mk_sf(
        tmp_path, monkeypatch, "sftxnocc", tables=("customer", "orders")
    )
    sess.ingest_tables(spark, sf)
    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    o_dst = os.path.join(out_dir, "orders.parquet")
    c_dst = os.path.join(out_dir, "customer.parquet")

    in_txn = threading.Event()
    errors: list = []

    def writer():
        in_txn.wait(timeout=120)
        try:
            sess.update_where(
                spark, sf, "orders",
                pc.field("o_orderstatus") == "O",
                {"o_totalprice": lambda t: pc.add(t["o_totalprice"], 1000.0)},
            )
        except Exception as e:  # surfaced below
            errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    with sess.transaction(spark, sf, "orders", "customer"):
        sess.delete_where(
            spark, sf, "orders", pc.field("o_orderstatus") == "F"
        )
        in_txn.set()
        time.sleep(1.0)  # let the writer reach the lock wait mid-block
        sess.update_where(
            spark, sf, "customer",
            pc.field("c_mktsegment") == "BUILDING",
            {"c_acctbal": lambda t: pc.add(t["c_acctbal"], 50.0)},
        )
    th.join(timeout=300)
    assert not th.is_alive(), "writer wedged on the transaction lock"
    assert not errors, errors

    # final state == serial application (unique: row-disjoint predicates)
    src_o = pq.read_table(f"{SRC}/orders.parquet")
    want = src_o.filter(pc.not_equal(src_o["o_orderstatus"], "F"))
    bump = pc.if_else(
        pc.equal(want["o_orderstatus"], "O"),
        pc.add(want["o_totalprice"], 1000.0),
        want["o_totalprice"],
    )
    left = pq.read_table(o_dst)
    assert sorted(
        zip(left["o_orderkey"].to_pylist(), left["o_totalprice"].to_pylist())
    ) == sorted(zip(want["o_orderkey"].to_pylist(), bump.to_pylist()))
    src_c = pq.read_table(f"{SRC}/customer.parquet")
    cleft = pq.read_table(c_dst)
    cbump = pc.if_else(
        pc.equal(src_c["c_mktsegment"], "BUILDING"),
        pc.add(src_c["c_acctbal"], 50.0),
        src_c["c_acctbal"],
    )
    assert sorted(
        zip(cleft["c_custkey"].to_pylist(), cleft["c_acctbal"].to_pylist())
    ) == sorted(zip(src_c["c_custkey"].to_pylist(), cbump.to_pylist()))

    # ledger bracket on orders: begin < delete(txn-stamped) < commit, and
    # the foreign update sits entirely outside the bracket
    ms = _manifests(o_dst)
    by_op = {m["op"]: m for m in ms}
    tid = by_op["txn-begin"]["txn"]
    b, e = by_op["txn-begin"]["seq"], by_op["txn-commit"]["seq"]
    assert by_op["txn-commit"]["txn"] == tid and b < e
    for m in ms:
        if b < m["seq"] < e:
            assert m.get("txn") == tid, m
    upd = [m for m in ms if m["op"] == "update"]
    assert upd and all(m["seq"] > e or m["seq"] < b for m in upd), ms
    dele = [m for m in ms if m["op"] == "delete"]
    assert dele and all(b < m["seq"] < e for m in dele), ms
    # customer bracket committed too, fp chain consistent with the marker
    cms = _manifests(c_dst)
    cops = [m["op"] for m in cms]
    assert "txn-begin" in cops and "txn-commit" in cops
    fp_now, _m = sess._read_marker(os.path.join(c_dst, "_SUCCESS"))
    assert [m for m in cms if m["op"] == "txn-commit"][0]["fp_after"] == fp_now
    assert _no_scratch(o_dst) == [] and _no_scratch(c_dst) == []


def test_txn_vs_txn_canonical_order_no_deadlock(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """Two transactions over the same two tables, LISTED in opposite
    orders, race from two threads: canonical (sorted) acquisition keeps the
    wait-for graph acyclic, so both must complete (no deadlock) and their
    ledger brackets must not interleave on any table."""
    sf = _mk_sf(
        tmp_path, monkeypatch, "sftxn2x", tables=("customer", "orders")
    )
    sess.ingest_tables(spark, sf)
    barrier = threading.Barrier(2)
    errors: list = []

    def mk(tables, seg, bump):
        def go():
            barrier.wait()
            try:
                with sess.transaction(spark, sf, *tables):
                    sess.update_where(
                        spark, sf, "customer",
                        pc.field("c_mktsegment") == seg,
                        {"c_acctbal": lambda t: pc.add(t["c_acctbal"], bump)},
                    )
            except Exception as e:  # surfaced below
                errors.append(e)

        return go

    ts = [
        threading.Thread(
            target=mk(("customer", "orders"), "BUILDING", 10.0)
        ),
        threading.Thread(
            target=mk(("orders", "customer"), "AUTOMOBILE", 20.0)
        ),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not any(t.is_alive() for t in ts), "transaction deadlock"
    assert not errors, errors

    out_dir = spark._lianjia_ingest_map[os.path.normpath(sf)]
    src = pq.read_table(f"{SRC}/customer.parquet")
    left = pq.read_table(os.path.join(out_dir, "customer.parquet"))
    bump = pc.if_else(
        pc.equal(src["c_mktsegment"], "BUILDING"),
        pc.add(src["c_acctbal"], 10.0),
        pc.if_else(
            pc.equal(src["c_mktsegment"], "AUTOMOBILE"),
            pc.add(src["c_acctbal"], 20.0),
            src["c_acctbal"],
        ),
    )
    assert sorted(
        zip(left["c_custkey"].to_pylist(), left["c_acctbal"].to_pylist())
    ) == sorted(zip(src["c_custkey"].to_pylist(), bump.to_pylist()))

    ms = _manifests(os.path.join(out_dir, "customer.parquet"))
    spans: dict = {}
    for m in ms:
        if m["op"] == "txn-begin":
            spans[m["txn"]] = [m["seq"], None]
        if m["op"] == "txn-commit":
            spans[m["txn"]][1] = m["seq"]
    assert len(spans) == 2 and all(e is not None for _s, e in spans.values())
    (s1, e1), (s2, e2) = sorted(spans.values())
    assert e1 < s2, f"transaction brackets interleaved: {ms}"
