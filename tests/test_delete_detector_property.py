"""Property tests for the whole-batch-delete detector
(session._removed_batches): it must accept EXACTLY the pure
whole-batch-delete shape and refuse everything else — a false accept would
drop managed rows that other source files still own; a false refuse only
costs a rebuild.

Pure-Python (marker files on disk, no SparkSession), so the search is
cheap enough for hypothesis to sweep the mutation space.
"""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from data_etl_sh_lianjia_spark import session as sess

LAYOUT = "parts=8:split=50000:v7"


def _marker(tmp_path, parts: dict[str, str], batches: dict[str, str]) -> str:
    marker = os.path.join(str(tmp_path), "_SUCCESS")
    sess._write_marker(
        marker, "fp", {"layout": LAYOUT, "parts": parts, "batches": batches}
    )
    return marker


@st.composite
def table_state(draw):
    """A manifest of base files plus zero or more appended batches (each
    batch = 1-3 files sharing one tag)."""
    n_base = draw(st.integers(0, 3))
    parts = {f"base-{i}.parquet": f"b{i}" for i in range(n_base)}
    batches: dict[str, str] = {}
    n_batches = draw(st.integers(0, 4))
    for b in range(n_batches):
        for j in range(draw(st.integers(1, 3))):
            name = f"batch{b}-{j}.parquet"
            parts[name] = f"a{b}.{j}"
            batches[name] = f"tag{b}"
    return parts, batches


@settings(max_examples=200, deadline=None)
@given(table_state(), st.data())
def test_accepts_exactly_whole_batch_deletes(tmp_path_factory, state, data):
    parts, batches = state
    tmp = tmp_path_factory.mktemp("m")
    marker = _marker(tmp, parts, batches)

    tags = sorted(set(batches.values()))
    if not tags:
        # no appended batches: ANY removal is a base removal -> refuse
        if parts:
            victim = data.draw(st.sampled_from(sorted(parts)))
            manifest = {k: v for k, v in parts.items() if k != victim}
            assert sess._removed_batches(marker, LAYOUT, manifest) is None
        return

    drop_tags = set(
        data.draw(
            st.lists(st.sampled_from(tags), min_size=1, unique=True)
        )
    )
    removed = sorted(f for f, t in batches.items() if t in drop_tags)
    manifest = {k: v for k, v in parts.items() if k not in removed}
    got = sess._removed_batches(marker, LAYOUT, manifest)
    assert got == removed


@settings(max_examples=200, deadline=None)
@given(table_state(), st.data())
def test_refuses_every_impure_mutation(tmp_path_factory, state, data):
    parts, batches = state
    tmp = tmp_path_factory.mktemp("m")
    marker = _marker(tmp, parts, batches)
    tags = sorted(set(batches.values()))

    mutations = ["add", "layout", "noop"]
    if parts:
        mutations.append("rewrite")
    multi = [t for t in tags if sum(1 for x in batches.values() if x == t) > 1]
    if multi:
        mutations.append("partial_batch")
    if any(f not in batches for f in parts):
        mutations.append("base_removal")
    kind = data.draw(st.sampled_from(mutations))

    manifest = dict(parts)
    layout = LAYOUT
    if kind == "add":
        manifest["new-file.parquet"] = "n0"
        # an addition alongside a legitimate batch drop is still impure
        if tags and data.draw(st.booleans()):
            t = data.draw(st.sampled_from(tags))
            for f in [f for f, tt in batches.items() if tt == t]:
                manifest.pop(f)
    elif kind == "rewrite":
        victim = data.draw(st.sampled_from(sorted(parts)))
        manifest[victim] = "rewritten"
        if victim in batches:
            pass  # rewritten, not removed — still impure
    elif kind == "partial_batch":
        t = data.draw(st.sampled_from(multi))
        files = sorted(f for f, tt in batches.items() if tt == t)
        manifest.pop(files[0])  # remove only PART of the batch
    elif kind == "base_removal":
        victim = data.draw(
            st.sampled_from(sorted(f for f in parts if f not in batches))
        )
        manifest.pop(victim)
    elif kind == "layout":
        layout = LAYOUT + ":changed"
        if parts:
            manifest.pop(data.draw(st.sampled_from(sorted(parts))))
    # "noop": nothing removed

    assert sess._removed_batches(marker, layout, manifest) is None


def test_missing_marker_or_manifest_refuses(tmp_path):
    marker = os.path.join(str(tmp_path), "_SUCCESS")
    assert sess._removed_batches(marker, LAYOUT, {"a": "1"}) is None
    m = _marker(tmp_path, {"a.parquet": "1"}, {})
    assert sess._removed_batches(m, LAYOUT, None) is None
