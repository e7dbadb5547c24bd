"""Time EVERY declared registry query and capture its physical plan.

Guide §1 (measure first): one warm session, each query timed end-to-end
(build + plan + execute + toArrow materialization, the bench protocol),
RUNS samples with the median reported, and `.explain("formatted")` dumped
to --plans-dir/<name>.txt. Prints one JSON line per query (so a partial
run still yields data) plus a final summary sorted slowest-first.

Usage::

    python tools/profile_registry.py [--sf-dir DIR] [--runs N]
        [--plans-dir plans/r11/cap] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_etl_sh_lianjia_spark.plans.registry import all_queries  # noqa: E402
from data_etl_sh_lianjia_spark.session import get_spark, ingest_tables  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--out", default=None, help="write JSON summary here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="profile-registry")
    ingest_tables(spark, args.sf_dir)
    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    queries = all_queries()
    names = args.names or list(queries)
    rows = {}
    for name in names:
        dq = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        ts, err, nrows = [], None, None
        for i in range(args.runs):
            t0 = time.perf_counter()
            try:
                df = dq.spark_fn(spark, args.sf_dir)
                tbl = df.toArrow()
                nrows = tbl.num_rows
            except Exception as e:  # keep sweeping
                err = f"{type(e).__name__}: {e}"[:200]
                break
            ts.append(time.perf_counter() - t0)
            if i == 0 and args.plans_dir:
                try:
                    plan = df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    )
                except Exception:
                    try:
                        plan = df._jdf.queryExecution().explainString(
                            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                                "formatted"
                            )
                        )
                    except Exception as e:
                        plan = f"(explain failed: {e})"
                with open(os.path.join(args.plans_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
        rec = {
            "median_s": round(statistics.median(ts), 4) if ts else None,
            "min_s": round(min(ts), 4) if ts else None,
            "first_s": round(ts[0], 4) if ts else None,
            "rows": nrows,
            "err": err,
        }
        rows[name] = rec
        print(json.dumps({"name": name, **rec}), flush=True)
    ordered = dict(
        sorted(rows.items(), key=lambda kv: -(kv[1]["median_s"] or 1e9))
    )
    total = sum(r["median_s"] or 0 for r in rows.values())
    summary = {"sf_dir": args.sf_dir, "total_median_s": round(total, 2), "queries": ordered}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    print("TOTAL_MEDIAN_S", round(total, 2))
    for n, r in list(ordered.items())[:30]:
        print(f"{r['median_s']}\t{n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
