"""Property tests for the UPDATE/top-k primitives (pure pyarrow — no
Spark session):

- ``_apply_assignments`` preserves schema and row count exactly, touches
  ONLY assigned columns, and applies constants / None / callables.
- ``_topk_unaffected`` is SOUND: whenever it answers True for a set of
  candidate rows, removing those rows from (or adding them to) the base
  set provably leaves the top-n unchanged under the spec's total order.
- ``_referenced_cols`` finds exactly the identifiers present in a text.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_sh_lianjia_spark.session import (
    _apply_assignments,
    _referenced_cols,
    _topk_unaffected,
)

_rows = st.lists(
    st.tuples(
        st.integers(-50, 50),              # a: order key (desc)
        st.integers(0, 9),                 # b: tiebreaker
        st.one_of(st.none(), st.integers(-5, 5)),  # c: payload, nullable
    ),
    min_size=0,
    max_size=50,
)


def _mk(data):
    return pa.table(
        {
            "a": pa.array([r[0] for r in data], pa.int64()),
            "b": pa.array([r[1] for r in data], pa.int64()),
            "c": pa.array([r[2] for r in data], pa.int64()),
        }
    )


@settings(max_examples=80, deadline=None)
@given(data=_rows, const=st.one_of(st.none(), st.integers(-9, 9)))
def test_apply_assignments_touches_only_assigned_columns(data, const):
    tbl = _mk(data)
    out = _apply_assignments(
        tbl, {"c": const, "b": lambda t: pc.add(t["b"], 1)}
    )
    assert out.schema == tbl.schema
    assert out.num_rows == tbl.num_rows
    assert out.column("a").to_pylist() == tbl.column("a").to_pylist(), (
        "unassigned columns must be untouched"
    )
    assert out.column("c").to_pylist() == [const] * len(data)
    assert out.column("b").to_pylist() == [r[1] + 1 for r in data]


_SPEC = {
    "name": "t",
    "cols": ("a", "b", "c"),
    "order_sql": "a DESC, b",
    "n": 10,
}


def _topn(rows, n=10):
    """The spec's top-n under (a DESC, b ASC) over full rows."""
    return sorted(rows, key=lambda r: (-r[0], r[1]))[:n]


@settings(max_examples=80, deadline=None)
@given(base=_rows, cands=_rows)
def test_topk_unaffected_is_sound(tmp_path_factory, base, cands):
    tmp = tmp_path_factory.mktemp("tk")
    proj = _topn(base)
    pdir = str(tmp / "proj.parquet")
    os.makedirs(pdir)
    pq.write_table(_mk(proj), os.path.join(pdir, "part-0.parquet"))
    cpath = str(tmp / "cand.parquet")
    pq.write_table(_mk(cands), cpath)

    if _topk_unaffected(pdir, _SPEC, [cpath]):
        # soundness: removal of candidate-keyed rows AND insertion of the
        # candidates must both leave the top-n unchanged
        cand_keys = {(r[0], r[1]) for r in cands}
        removed = [r for r in base if (r[0], r[1]) not in cand_keys]
        assert _topn(removed) == proj, "claimed-unaffected removal changed top-n"
        assert _topn(base + cands) == proj, (
            "claimed-unaffected insertion changed top-n"
        )


def test_referenced_cols_matches_identifiers():
    cols = {"a", "b", "total", "ts_ns"}
    assert _referenced_cols("SELECT a, SUM(total) FROM t", cols) == {
        "a", "total",
    }
    # substrings do not count as references; quoted strings (conservative:
    # any identifier-shaped token) do
    assert _referenced_cols("totals + a2", cols) == set()
    assert _referenced_cols("ts_ns DIV 86400000000000", cols) == {"ts_ns"}


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1000)),  # (key, cluster)
        min_size=1,
        max_size=80,
    ),
    target=st.integers(0, 20),
)
def test_point_prune_candidates_is_sound(tmp_path_factory, rows, target):
    """Every main file that CONTAINS a predicate match must be admitted by
    the two-hop prune (no false skips), and the expected count must equal
    the true match count — under any key/cluster distribution, including
    keys spread across every cluster range."""
    import pyarrow.compute as pc

    from data_etl_sh_lianjia_spark import session as sess

    tmp = tmp_path_factory.mktemp("pp")
    out_dir = str(tmp)
    name = "lineitem"  # has both a bucket layout and a cluster key
    bk_col = sess._BUCKET_LAYOUT[name]
    cluster_key = sess._INGEST_LAYOUT[name][0]

    # main table: cluster-sorted rows split across 3 files
    srt = sorted(rows, key=lambda r: r[1])
    dst = os.path.join(out_dir, f"{name}.parquet")
    os.makedirs(dst)
    step = -(-len(srt) // 3)
    parts = []
    for i in range(3):
        chunk = srt[i * step:(i + 1) * step]
        if not chunk:
            continue
        f = f"part-{i:05d}.parquet"
        pq.write_table(
            pa.table(
                {
                    bk_col: pa.array([r[0] for r in chunk], pa.int64()),
                    cluster_key: pa.array([r[1] for r in chunk], pa.int64()),
                }
            ),
            os.path.join(dst, f),
        )
        parts.append(f)
    sess._write_marker(os.path.join(dst, "_SUCCESS"), "fpX")

    # bucketed copy: same rows, key-sorted, 2 bucket files
    bk_dst = os.path.join(out_dir, f"{name}.bucketed.parquet")
    os.makedirs(bk_dst)
    ksort = sorted(rows, key=lambda r: r[0])
    half = len(ksort) // 2 or 1
    for i, chunk in enumerate((ksort[:half], ksort[half:])):
        if not chunk:
            continue
        pq.write_table(
            pa.table(
                {
                    bk_col: pa.array([r[0] for r in chunk], pa.int64()),
                    cluster_key: pa.array([r[1] for r in chunk], pa.int64()),
                }
            ),
            os.path.join(bk_dst, f"b{i}_0000{i}.parquet"),
        )
    sess._write_marker(
        os.path.join(bk_dst, "_SUCCESS"), "fpX:bk2", {"n_buckets": 2}
    )

    predicate = pc.field(bk_col) == target
    candidates, expected = sess._point_prune_candidates(
        out_dir, name, dst, parts, predicate, "fpX"
    )
    true_n = sum(1 for r in rows if r[0] == target)
    if candidates is None:
        return  # fast path declined: always sound
    assert expected == true_n
    for f in parts:
        t = pq.read_table(os.path.join(dst, f))
        has = target in t.column(bk_col).to_pylist()
        if has:
            assert f in candidates, (
                f"file {f} holds a match but was pruned"
            )
