"""Phase-level timing of stream_lakehouse_ingest (guide §1).

Times each ingest_tables call (base + per-epoch) and the maintenance
builders inside them, plus the final sessionize read-back.
"""
import functools, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from data_etl_sh_lianjia_spark import session as S
from data_etl_sh_lianjia_spark.operators import relational as R
from data_etl_sh_lianjia_spark.plans.registry import all_queries

events = []

def wrap(mod, name):
    fn = getattr(mod, name)
    @functools.wraps(fn)
    def inner(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            events.append((name, time.perf_counter() - t0))
    setattr(mod, name, inner)

for n in [
    "ingest_tables", "_ingest_local", "_ingest_local_append",
    "_build_aggproj", "_build_coarse_aggproj", "_build_keydict_local",
    "_maintain_join_projections", "_maintain_result_projections",
    "_refresh_pins", "_publish_dir",
]:
    wrap(S, n)
for n in ["_merge_sessions", "_build_sessions"]:
    wrap(R, n)
R.PROJECTION_BUILDERS["sessions"] = R._build_sessions
R.PROJECTION_MERGERS["sessions"] = R._merge_sessions
R.PROJECTION_DELETE_MERGERS["sessions"] = R._merge_sessions

spark = S.get_spark(app_name="profile-slh")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
q = all_queries()["stream_lakehouse_ingest"]
for rnd in range(int(sys.argv[2]) if len(sys.argv) > 2 else 2):
    events.clear()
    t0 = time.perf_counter()
    out = q.spark_fn(spark, sf)
    out.toArrow()
    total = time.perf_counter() - t0
    print(f"== stream_lakehouse_ingest run {rnd}: total {total:.3f}s")
    for name, dt in events:
        if dt > 0.02:
            print(f"   {dt:7.3f}s {name}")
