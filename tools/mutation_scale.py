"""Mutation cost vs data scale: measured evidence that the DML paths are
O(affected files + projection sizes), never O(history).

Protocol: ingest the 10x replica of sf0.1 (lineitem ~6M rows) cold — that
ingest IS the O(history) yardstick (a full rebuild pays it again) — then
time, on the live catalog:

- ``delete range``: predicate DELETE on the range-CLUSTER key
  (l_shipdate window) — row-group stats prune unaffected files to a
  metadata check, the best case.
- ``delete point`` / ``update point``: single-orderkey mutations — the
  predicate column is uncorrelated with the cluster key, so match
  detection pays one decode of that column per file (still a tiny
  fraction of a rebuild), and only the files with matches rewrite.
- ``compact``: the O(table) re-cluster, for contrast with the O(1)
  projection restamps it performs.
- ``restore``: snapshot rollback (hardlink publish + projection rebuild).

Writes MUTATION_SCALE.json: per-op wall ms + the ratio to the rebuild
yardstick. Run: python tools/mutation_scale.py [out.json]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc
import pyarrow.parquet as pq

from data_etl_sh_lianjia_spark import session as sess
from tools.scale_curve import SCALE_ROOT, build_replica


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MUTATION_SCALE.json"
    # MUTATION_SCALE_REPLICAS=100 measures the 100x point (lineitem 60M
    # rows) — the corpus dir is shared with tools/scale_curve.py
    replicas = int(os.environ.get("MUTATION_SCALE_REPLICAS", "10"))
    tag = {10: "sf1.0x", 100: "sf10x"}.get(replicas, f"sf{replicas}x")
    sf = os.path.join(SCALE_ROOT, tag)
    build_replica(sf, replicas)
    spark = sess.get_spark(app_name="mutation-scale")
    sess.tune_for_sf(spark, sf)

    # cold ingest = the O(history) yardstick
    norm = os.path.normpath(sf)
    import hashlib

    managed = os.path.join(
        sess.INGEST_ROOT,
        f"{os.path.basename(norm)}-{hashlib.md5(norm.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(managed, ignore_errors=True)
    t0 = time.perf_counter()
    out_dir = sess.ingest_tables(spark, sf)
    ingest_ms = (time.perf_counter() - t0) * 1000

    li_dir = os.path.join(out_dir, "lineitem.parquet")
    n_files = sum(1 for f in os.listdir(li_dir) if f.endswith(".parquet"))

    li_meta = pq.read_table(
        os.path.join(sf, "lineitem.parquet")
        if not os.path.isdir(os.path.join(sf, "lineitem.parquet"))
        else sorted(
            os.path.join(sf, "lineitem.parquet", f)
            for f in os.listdir(os.path.join(sf, "lineitem.parquet"))
        )[0],
        columns=["l_orderkey", "l_shipdate"],
    )
    dates = sorted(li_meta.column("l_shipdate").to_pylist())
    cut_lo, cut_hi = dates[100], dates[2000]
    # point-mutation keys must survive the preceding range delete, or the
    # point timings would measure a 0-row no-op instead of a file rewrite
    survivors = li_meta.filter(pc.field("l_shipdate") >= cut_hi)
    point_key = survivors.column("l_orderkey").to_pylist()[0]
    point_key2 = survivors.column("l_orderkey").to_pylist()[-1]

    results: dict[str, float] = {"ingest_rebuild_ms": round(ingest_ms, 1)}

    t0 = time.perf_counter()
    n = sess.delete_where(
        spark, sf, "lineitem",
        (pc.field("l_shipdate") >= cut_lo) & (pc.field("l_shipdate") < cut_hi),
    )
    results["delete_range_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    results["delete_range_rows"] = n

    t0 = time.perf_counter()
    n = sess.delete_where(
        spark, sf, "lineitem", pc.field("l_orderkey") == point_key
    )
    results["delete_point_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    results["delete_point_rows"] = n

    t0 = time.perf_counter()
    n = sess.update_where(
        spark, sf, "lineitem", pc.field("l_orderkey") == point_key2,
        {"l_quantity": lambda t: pc.add(t["l_quantity"], 1.0)},
    )
    results["update_point_ms"] = round((time.perf_counter() - t0) * 1000, 1)
    results["update_point_rows"] = n

    t0 = time.perf_counter()
    sess.compact_table(spark, sf, "lineitem")
    results["compact_ms"] = round((time.perf_counter() - t0) * 1000, 1)

    hist = sess.table_history(spark, sf, "lineitem")
    v = min(h["version"] for h in hist if h.get("version") is not None)
    t0 = time.perf_counter()
    sess.restore_table_version(spark, sf, "lineitem", v)
    results["restore_ms"] = round((time.perf_counter() - t0) * 1000, 1)

    for op in (
        "delete_range_ms", "delete_point_ms", "update_point_ms",
        "compact_ms", "restore_ms",
    ):
        results[op.replace("_ms", "_vs_rebuild")] = round(
            results[op] / ingest_ms, 3
        )
    payload = {
        "scale": f"{tag} ({replicas}x replica of sf0.1)",
        "lineitem_files": n_files,
        **results,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
