"""Property tests for the predicate-delete primitives (pure pyarrow — no
Spark session): the per-file split must PARTITION the file under any
predicate (NULL-predicate rows always survive, nothing is lost or
duplicated), and the fingerprint chain must accept exactly the
source-fingerprint-modulo-deletes forms.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_sh_lianjia_spark.session import (
    _effective_fingerprint,
    _split_file_by_predicate,
    _write_marker,
)

_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),  # k: nullable int
        st.integers(0, 3),  # g: group
    ),
    min_size=0,
    max_size=60,
)


@settings(max_examples=60, deadline=None)
@given(data=_rows, threshold=st.integers(-5, 5))
def test_split_partitions_file_under_any_predicate(tmp_path_factory, data, threshold):
    tmp = tmp_path_factory.mktemp("split")
    path = str(tmp / "f.parquet")
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in data], pa.int64()),
            "g": pa.array([r[1] for r in data], pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    predicate = pc.field("k") >= threshold

    matched, survivors = _split_file_by_predicate(path, predicate)
    want_matched = [r for r in data if r[0] is not None and r[0] >= threshold]
    if not want_matched:
        # no-match contract: (None, None), caller hardlinks
        assert matched is None and survivors is None
        return
    # exact partition: matched ∪ survivors == file, disjoint, order-free
    def _key(t):
        return (t[0] is None, t[0] if t[0] is not None else 0, t[1])

    got_m = sorted(
        zip(matched.column("k").to_pylist(), matched.column("g").to_pylist()),
        key=_key,
    )
    got_s = sorted(
        zip(survivors.column("k").to_pylist(), survivors.column("g").to_pylist()),
        key=_key,
    )
    assert got_m == sorted(want_matched, key=_key)
    assert got_s == sorted(
        (r for r in data if r[0] is None or r[0] < threshold), key=_key
    )
    assert matched.num_rows + survivors.num_rows == tbl.num_rows
    # SQL DELETE semantics: NULL-predicate rows are never deleted
    assert None not in matched.column("k").to_pylist()


_seg = st.text(alphabet="0123456789abcdef", min_size=8, max_size=8)


@settings(max_examples=60, deadline=None)
@given(
    base=st.sampled_from(["123:456:parts=4:split=1000:v7", "9:9:parts=32:split=50000:v7"]),
    chain=st.lists(_seg, min_size=0, max_size=3),
    marker_matches=st.booleans(),
)
def test_effective_fingerprint_accepts_exactly_the_delete_chain(
    tmp_path_factory, base, chain, marker_matches
):
    tmp = tmp_path_factory.mktemp("fp")
    marker = str(tmp / "_SUCCESS")
    have = (base if marker_matches else base + "X") + "".join(
        f"~del{h}" for h in chain
    )
    _write_marker(marker, have, {"layout": "parts=4:split=1000:v7"})

    got = _effective_fingerprint(marker, base)
    if marker_matches:
        assert got == have  # fresh: plain or any-length chain
    else:
        # a different base fingerprint is NEVER fresh, chain or not —
        # "X~del..." must not be confused with a chained match ("X" is not
        # a chain separator)
        assert got is None


def test_effective_fingerprint_rejects_prefix_confusion(tmp_path):
    """A marker whose fingerprint merely STARTS WITH the source fingerprint
    (e.g. a longer layout string) must not read as fresh — only the exact
    value or an explicit ~del chain qualifies."""
    marker = str(tmp_path / "_SUCCESS")
    _write_marker(marker, "1:2:parts=4:split=1000:v70")
    assert _effective_fingerprint(marker, "1:2:parts=4:split=1000:v7") is None
    _write_marker(marker, "1:2:parts=4:split=1000:v7~delabc12345")
    assert (
        _effective_fingerprint(marker, "1:2:parts=4:split=1000:v7")
        == "1:2:parts=4:split=1000:v7~delabc12345"
    )
    assert os.path.exists(marker)
