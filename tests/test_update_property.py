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
