"""Model-based property test of merge-tombstone replay (pure pyarrow — no
Spark session): a landed directory undergoing an arbitrary interleaving of
MERGE (replace keys + land batch + sidecar), APPEND (new part), and
REWRITE-IN-PLACE (a part re-landed with fresh content) must, on a full
rebuild read (session._read_landed), reproduce exactly the reference
model's net state:

- a merge deletes every key-matched row that existed at merge time across
  ALL parts, then inserts its batch;
- an append's rows are never touched by EARLIER merges (but are fair game
  for later ones);
- a rewritten part is a fresh landing — earlier tombstones no longer apply
  to it ('a source rewrite resets the chain'), later merges cover it.

The deterministic scenario tests live in tests/test_update_where.py; this
pins the combinatorics (multi-merge over overlapping key sets, merges of
merge batches, rewrites between merges)."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_sh_lianjia_spark import session as sess
from data_etl_sh_lianjia_spark.session import _read_landed

_KEYS = st.integers(0, 7)
_ROWS = st.lists(
    st.tuples(_KEYS, st.integers(0, 10_000)), min_size=1, max_size=8
)

# an op is ("merge", rows) | ("append", rows) | ("rewrite", rows)
_OPS = st.lists(
    st.tuples(st.sampled_from(["merge", "append", "rewrite"]), _ROWS),
    min_size=1,
    max_size=5,
)


def _write(path: str, rows: list[tuple[int, int]]) -> None:
    pq.write_table(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "v": pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        path,
    )


def _sidecar(src: str, tag: str, batch_name: str, keys: list[int]) -> None:
    # the CURRENT manifest format: content identity per part (the legacy
    # size-only and name-only shapes are pinned by the deterministic
    # fallback tests below)
    tomb = {
        "key": "k",
        "batch": batch_name,
        "files": {
            f: sess._part_identity(os.path.join(src, f))
            for f in sorted(os.listdir(src))
            if f.endswith(".parquet") and f != batch_name
        },
        "t_ns": time.time_ns(),
        "values": keys,
    }
    with open(os.path.join(src, f"_merge-{tag}.tombstones.json"), "w") as fh:
        json.dump(tomb, fh)


@settings(max_examples=40, deadline=None)
@given(init=_ROWS, ops=_OPS)
def test_replay_reproduces_model_under_any_op_interleaving(
    tmp_path_factory, init, ops
):
    src = str(tmp_path_factory.mktemp("tomb") / "t.parquet")
    os.makedirs(src)
    model: dict[str, list[tuple[int, int]]] = {}

    _write(os.path.join(src, "part-00000.parquet"), init)
    model["part-00000.parquet"] = list(init)
    seq = 0

    for kind, rows in ops:
        seq += 1
        if kind == "merge":
            keys = sorted({k for k, _v in rows})
            batch = f"merge-{seq:03d}.parquet"
            # the delete half: every key-matched row present NOW goes
            for f in model:
                model[f] = [r for r in model[f] if r[0] not in keys]
            # dedupe the batch on key like merge_into's upsert batch would
            # be (one row per key: last wins deterministically)
            by_key = {}
            for r in rows:
                by_key[r[0]] = r
            brows = [by_key[k] for k in sorted(by_key)]
            _write(os.path.join(src, batch), brows)
            _sidecar(src, f"{seq:03d}", batch, keys)
            model[batch] = brows
        elif kind == "append":
            name = f"part-a{seq:03d}.parquet"
            _write(os.path.join(src, name), rows)
            model[name] = list(rows)
        else:  # rewrite an existing part in place with fresh content
            target = sorted(model)[seq % len(model)]
            old_ident = sess._part_identity(os.path.join(src, target))
            _write(os.path.join(src, target), rows)
            if sess._part_identity(os.path.join(src, target)) == old_ident:
                # identical-CONTENT rewrite is indistinguishable from no
                # rewrite (and semantically equivalent to a restore from
                # backup); nudge with an extra row so the model's "rewrite
                # resets the chain" stays observable. Same-SIZE rewrites
                # with different content no longer need this — the
                # identity manifest catches them.
                _write(os.path.join(src, target), rows + [(0, 424242)])
                rows = rows + [(0, 424242)]
                assert (
                    sess._part_identity(os.path.join(src, target)) != old_ident
                )
            model[target] = list(rows)

    got = sorted(
        zip(
            _read_landed(src).column("k").to_pylist(),
            _read_landed(src).column("v").to_pylist(),
        )
    )
    want = sorted(r for rows_ in model.values() for r in rows_)
    assert got == want, f"replay diverged from the model: {got} != {want}"


def test_same_size_rewrite_exempts_part_under_identity_manifest(tmp_path):
    """The r8 caveat, now closed: a part rewritten in place to DIFFERENT
    content but the SAME byte size must not count as still covered by a
    pre-rewrite tombstone. The legacy size-only record stays pinned as
    the (weaker) documented fallback."""
    p = str(tmp_path / "part-00000.parquet")
    _write(p, [(1, 1), (2, 2)])
    ident = sess._part_identity(p)
    tb = {
        "key": "k",
        "batch": "merge-x.parquet",
        "files": {"part-00000.parquet": ident},
        "t_ns": 0,
        "values": [1],
    }
    assert sess._tombstone_applies(tb, "part-00000.parquet", p)

    # rewrite: same shape (2 int64 rows -> same uncompressed sizes),
    # different values
    _write(p, [(3, 3), (4, 4)])
    same_size_rec = [os.path.getsize(p), ident[1], ident[2]]
    tb_rewritten = {**tb, "files": {"part-00000.parquet": same_size_rec}}
    assert not sess._tombstone_applies(tb_rewritten, "part-00000.parquet", p), (
        "identity manifest must catch a same-size different-content rewrite"
    )
    # legacy size-only manifest: size matches -> still applies (fallback)
    tb_legacy = {**tb, "files": {"part-00000.parquet": os.path.getsize(p)}}
    assert sess._tombstone_applies(tb_legacy, "part-00000.parquet", p)

    # cross-ENCODING manifest (hash written under a different identity
    # version): must degrade to the (size, num_rows) compare — fail-safe,
    # never "no tombstone applies anywhere"
    cur = sess._part_identity(p)
    old_enc = [cur[0], cur[1], "v1:deadbeefdeadbeef"]
    tb_xver = {**tb, "files": {"part-00000.parquet": old_enc}}
    assert sess._tombstone_applies(tb_xver, "part-00000.parquet", p), (
        "an identity-encoding bump must not exempt every part"
    )
    wrong_rows = [cur[0], cur[1] + 1, "v1:deadbeefdeadbeef"]
    tb_xver2 = {**tb, "files": {"part-00000.parquet": wrong_rows}}
    assert not sess._tombstone_applies(tb_xver2, "part-00000.parquet", p)


def test_large_merge_spills_keys_and_replays_on_both_paths(
    spark, tmp_path, monkeypatch, restore_catalog
):
    """A merge whose replaced-key set exceeds TOMBSTONE_INLINE_MAX must
    spill the keys to a parquet sidecar (JSON carries values_file, no
    inline list) and still replay exactly on BOTH rebuild paths: the
    pyarrow _read_landed path and the Spark branch's broadcast anti-join
    (_replay_tombstones_spark)."""
    import glob as _glob

    import pyarrow.compute as pc
    import pyarrow.parquet as _pq

    monkeypatch.setattr(sess, "TOMBSTONE_INLINE_MAX", 2)
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path / "ingest"))

    sf = tmp_path / "sfspill"
    (sf / "orders.parquet").mkdir(parents=True)
    orders = _pq.read_table("/root/testdata/sf0.001/orders.parquet")
    _pq.write_table(
        orders, str(sf / "orders.parquet" / "part-00000.parquet")
    )
    out = sess.ingest_tables(spark, str(sf))

    hit = sorted(set(orders.column("o_orderkey").to_pylist()))[:5]
    base = orders.filter(pc.field("o_orderkey").isin(hit))
    batch = base.set_column(
        base.schema.get_field_index("o_totalprice"),
        base.schema.field("o_totalprice"),
        pc.add(base["o_totalprice"], 11.0).combine_chunks(),
    )
    sess.merge_into(spark, str(sf), "orders", batch, "o_orderkey")

    src = str(sf / "orders.parquet")
    sidecars = _glob.glob(os.path.join(src, "_merge-*.tombstones.json"))
    assert len(sidecars) == 1
    with open(sidecars[0]) as fh:
        tomb = json.load(fh)
    assert "values" not in tomb, "spilled sidecar must not inline keys"
    keys_path = os.path.join(src, tomb["values_file"])
    assert os.path.exists(keys_path)
    assert sorted(
        _pq.read_table(keys_path).column("key").to_pylist()
    ) == [int(k) for k in hit]

    # pyarrow rebuild path: exactly one survivor per merged key, batch wins
    tbl = _read_landed(src)
    want = dict(
        zip(hit, pc.add(base["o_totalprice"], 11.0).to_pylist())
    )
    got = {
        k: v
        for k, v in zip(
            tbl.column("o_orderkey").to_pylist(),
            tbl.column("o_totalprice").to_pylist(),
        )
        if k in want
    }
    assert tbl.num_rows == orders.num_rows
    assert {k: round(v, 2) for k, v in got.items()} == {
        k: round(v, 2) for k, v in want.items()
    }

    # Spark branch: broadcast anti-join replay over the same landing
    df = sess._replay_tombstones_spark(src, spark.read.parquet(src))
    assert df.count() == orders.num_rows
    rows = df.filter(df.o_orderkey.isin([int(k) for k in hit])).collect()
    assert len(rows) == len(hit)
    for r in rows:
        assert abs(r["o_totalprice"] - want[r["o_orderkey"]]) < 1e-6
    assert out  # silence unused warning


import pytest  # noqa: E402


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
