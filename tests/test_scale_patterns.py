"""Plan-shape tests: assert the physical properties the 100 TB design relies
on (SURVEY.md §4) — filter pushdown into the parquet scan, broadcast joins
for dimensions, bucketed co-located joins without a shuffle, and salting as
a skew-mitigation identity."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.plans.registry import all_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_q1_filter_pushed_to_parquet_scan(spark, sf_dir):
    df = all_queries()["q1_scan_agg"].spark_fn(spark, sf_dir)
    plan = _optimized(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(all_queries()["q1_scan_agg"].spark_fn(spark, sf_dir))
    # partial (map-side) agg must appear below the exchange
    assert plan.index("partial_sum") > plan.index("Exchange") or "partial_sum" in plan


def test_q5_star_join_all_broadcast(spark, sf_dir):
    plan = _plan(all_queries()["q5_join5"].spark_fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # the supplier->nation->region chain is served from the session's
    # materialized flattened dim (a persisted, path-pooled join), not
    # re-joined per query: the only nation/region work left is inside the
    # cached relation's displayed build plan
    assert "InMemoryTableScan" in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(all_queries()["topk_sort"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reads_only_needed_columns(spark, sf_dir):
    df = all_queries()["distinct_count"].spark_fn(spark, sf_dir)
    plan = _optimized(df)
    # split-distinct form: each branch scan prunes to exactly its own key
    # column; no branch reads both, and no Expand triples the input rows
    assert "ReadSchema: struct<l_partkey:bigint>" in plan
    assert "ReadSchema: struct<l_suppkey:bigint>" in plan
    assert "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>" not in plan
    # and no Expand-based multi-distinct row multiplication anywhere
    assert "Expand" not in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both sides on the join key co-locates matching rows at write
    time: the later join plans as SortMergeJoin with ZERO Exchange operators."""
    from data_etl_sh_lianjia_spark.session import load_tables

    import shutil

    t = load_tables(spark, sf_dir, names=("orders", "lineitem"))
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # the in-memory catalog forgets tables between sessions but the managed
    # location survives; clear it or saveAsTable hits LOCATION_ALREADY_EXISTS
    for name in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"/tmp/spark-graft-warehouse/{name}", ignore_errors=True)
    t["orders"].select("o_orderkey", "o_totalprice").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
    t["lineitem"].select("l_orderkey", "l_quantity").write.bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").mode("overwrite").saveAsTable("lineitem_b")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == t["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_salted_aggregation_equals_plain(spark, sf_dir):
    """Skew mitigation: two-phase salted aggregation must be a semantic no-op
    (the identity that makes salting safe to apply under AQE-resistant skew)."""
    from data_etl_sh_lianjia_spark.session import load_tables

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    salted = (
        li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .groupBy("l_returnflag")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    a = {r["l_returnflag"]: (r["s"], r["n"]) for r in plain.collect()}
    b = {r["l_returnflag"]: (r["s"], r["n"]) for r in salted.collect()}
    assert a == b


def test_partition_pruned_scan_reads_one_partition(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout + a literal predicate on the partition
    column prunes at PLANNING time: the scan lists only the matching
    directory. At 100 TB this is the difference between scanning one day
    and scanning three years (SCALE.md §1)."""
    from data_etl_sh_lianjia_spark.session import load_tables

    orders = load_tables(spark, sf_dir, names=("orders",))["orders"]
    path = str(tmp_path / "orders_part")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)

    pruned = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = _plan(pruned)
    # physical scan carries the partition filter, and the count matches an
    # unpartitioned filter exactly
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    assert (
        pruned.count()
        == orders.filter(F.col("o_orderstatus") == "F").count()
    )
    # the executed scan reports exactly one selected partition directory
    pruned.count()
    scan_line = next(
        l for l in plan.splitlines() if "FileScan" in l or "Scan parquet" in l
    )
    assert "PartitionFilters" in plan, scan_line


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime row-group pruning for selective shuffle joins: when the build
    side is filtered and small, Spark injects a bloom-filter aggregate on it
    and a `bloom_filter_might_contain` predicate on the probe side — the
    100 TB analog of semi-join pushdown (probe rows are dropped at the scan
    instead of surviving to the shuffle)."""
    from data_etl_sh_lianjia_spark.session import load_tables

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        t = load_tables(spark, sf_dir, names=("lineitem", "orders"))
        build = t["orders"].filter(F.col("o_totalprice") > 500000).select("o_orderkey")
        joined = t["lineitem"].join(
            build, t["lineitem"].l_orderkey == build.o_orderkey
        )
        plan = _plan(joined)
        assert "bloom_filter" in plan or "BloomFilter" in plan, (
            f"no runtime bloom filter injected:\n{plan}"
        )
        # sanity: result equals the same join without the rewrite
        n = joined.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        assert n == t["lineitem"].join(
            build, t["lineitem"].l_orderkey == build.o_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_q3_sql_path_join_strategies(spark, sf_dir):
    """q3 carries NO join hints: selection is size-based end-to-end. At
    test scale every side sits under the 64 MB broadcast threshold, so
    the whole star broadcasts (the right plan at THIS size); emulating
    the at-scale regime (threshold -1 = nothing broadcastable) must
    degrade to a shuffle-partitioned join (hash when the build side
    qualifies for a local map, Spark's spill-safe sort-merge otherwise;
    both AQE-optimizable) and never a cartesian. A hint would instead
    pin one strategy at every size — the old SHUFFLE_HASH(o) hint was
    blocking a 2.7 MB orders side from broadcasting at bench scale."""
    plan = _plan(all_queries()["q3_join3"].spark_fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(all_queries()["q3_join3"].spark_fn(spark, sf_dir))
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan
        assert "CartesianProduct" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q21_exists_shapes_are_semi_and_anti(spark, sf_dir):
    """EXISTS/NOT EXISTS must plan as semi/anti joins with the non-equi
    residual attached — never a cartesian product."""
    plan = _plan(all_queries()["q21_waiting_supplier"].spark_fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q16_not_in_plans_null_aware_anti_join(spark, sf_dir):
    """NOT IN (subquery) must plan as the null-aware anti join variant
    (`BroadcastHashJoin ... LeftAnti, BuildRight, true`), not a plain
    left anti — three-valued NOT IN semantics depend on the null check."""
    plan = _plan(all_queries()["q16_notin_distinct"].spark_fn(spark, sf_dir))
    assert "LeftAnti, BuildRight, true" in plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    """Q6 is scan-bound by design: every predicate (date band, discount
    band, quantity cap) must reach the parquet scan as a pushed filter,
    and the plan must contain no join and no shuffle other than the
    single-partition final aggregate exchange."""
    df = all_queries()["q6_forecast_revenue"].spark_fn(spark, sf_dir)
    plan = _optimized(df)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in plan, f"{col} filter not pushed"
    phys = _plan(df)
    assert "Join" not in phys


def test_q8_q9_dims_broadcast_no_sort_merge(spark, sf_dir):
    """The Q8/Q9 star shapes broadcast every dimension explicitly; the
    lineitem-orders fact join is optimizer-selected, which below
    autoBroadcastJoinThreshold (this scale) also resolves to broadcast —
    so the whole star is broadcast-hash with no sort-merge fallback and
    the only shuffle is the final aggregate's."""
    for name, n_joins in (("q8_market_share", 7), ("q9_product_profit", 4)):
        plan = _plan(all_queries()[name].spark_fn(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= n_joins, name
        assert "SortMergeJoin" not in plan, name


def test_q10_top20_is_take_ordered(spark, sf_dir):
    plan = _plan(all_queries()["q10_returned_items"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q20_plans_semi_join(spark, sf_dir):
    plan = _plan(all_queries()["q20_excess_supply"].spark_fn(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_fk_audit_uses_anti_joins(spark, sf_dir):
    """Every orphan probe must stay a hash-based anti join — the 1-row
    count crossJoins legitimately plan as BroadcastNestedLoopJoin, but no
    LeftAnti may degrade to a nested-loop/cartesian scan."""
    plan = _plan(all_queries()["fk_integrity_audit"].spark_fn(spark, sf_dir))
    assert plan.count("LeftAnti") >= 6
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "LeftAnti" in line:
            assert "NestedLoopJoin" not in line, line


def test_recursive_cte_plans_union_loop(spark, sf_dir):
    """Spark 4.1 plans WITH RECURSIVE as a UnionLoop iteration — assert the
    recursive structure actually reached the physical plan (a rewrite to a
    static union would silently cap the depth)."""
    df = all_queries()["recursive_page_walk"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Loop" in plan or "CTERelation" in plan or "Recursion" in plan


def test_zorder_stays_in_codegen_no_python(spark, sf_dir):
    """The Morton interleave must be a pure JVM expression tree: no Python
    eval nodes, exactly one aggregation exchange."""
    plan = _plan(all_queries()["zorder_cluster"].spark_fn(spark, sf_dir))
    assert "Python" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange") == 1
    assert "HashAggregate" in plan


def test_boilerplate_join_is_hash_partitioned_with_partial_agg(spark, sf_dir):
    """Boilerplate detection must shuffle on the shingle value (hash join /
    hash aggregate), never plan a nested-loop over doc pairs."""
    plan = _plan(all_queries()["boilerplate_ngram_flags"].spark_fn(spark, sf_dir))
    assert "NestedLoop" not in plan
    assert "partial_count" in plan  # map-side combine on the frequency agg


def test_tiled_cosine_plans_one_scan_per_tile(spark, sf_dir):
    """Forcing tile_size < corpus must produce a union of per-tile candidate
    scans (one MapInPandas per tile), not a single full-corpus broadcast."""
    from data_etl_sh_lianjia_spark.operators.similarity import _cosine_topk_impl

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    df = _cosine_topk_impl(spark, sf_dir, tile_size=max(1, n // 3))
    plan = _plan(df)
    assert plan.count("MapInPandas") >= 3


def test_fuzzy_match_blocking_is_equi_join(spark, sf_dir):
    """The levenshtein length-band blocking must plan as a hash join on the
    bucket key — the all-pairs BroadcastNestedLoopJoin is the anti-pattern
    this blocking removes."""
    plan = _plan(all_queries()["fuzzy_match_levenshtein"].spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


def test_string_regex_cheap_predicate_first(spark, sf_dir):
    """Conjunct order is preserved into codegen and Catalyst does not
    cost-reorder it, so the 3-way IN-list must sit LEFT of the regex in
    the Filter condition (short-circuits the expensive RLIKE for
    non-matching langs — measured -12%, tools/profile_q5_regex.py)."""
    plan = _plan(all_queries()["string_regex"].spark_fn(spark, sf_dir))
    cond = next(l for l in plan.splitlines() if "RLIKE" in l)
    assert cond.index(" IN (") < cond.index("RLIKE"), cond


def test_chunk_embed_topk_broadcasts_queries_no_corpus_shuffle(spark, sf_dir):
    """The composed chunk->embed->retrieve pipeline must broadcast the
    sampled query side; the corpus side may not hit an Exchange below the
    scoring join (retrieval is a map-side pass over the scan)."""
    plan = _plan(all_queries()["chunk_embed_topk"].spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    join_pos = plan.find("BroadcastNestedLoopJoin")
    if join_pos == -1:
        join_pos = plan.find("BroadcastHashJoin")
    # below (after, in toString order) the join: only the broadcast
    # exchange for the query side, never a shuffle Exchange on the corpus
    below = plan[join_pos:]
    import re

    shuffles = [
        l for l in below.splitlines()
        if re.search(r"\bExchange (hash|range|Single)", l)
    ]
    assert not shuffles, shuffles


def test_bm25_plans_take_ordered_and_single_stats_row(spark, sf_dir):
    """BM25: the global top-10 must compile to TakeOrderedAndProject (no
    full sort), and the corpus-stats side must reduce before the cross
    join (a broadcast of ONE row, never a corpus x corpus product)."""
    from data_etl_sh_lianjia_spark.operators.text_analysis import bm25_topk

    plan = _plan(bm25_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_gapfill_scans_events_once(spark, sf_dir):
    """gapfill_locf derives its type dimension and hour bounds from the
    rollup, so the fact table must appear in the plan exactly once."""
    from data_etl_sh_lianjia_spark.operators.analytics import gapfill_locf

    plan = _plan(gapfill_locf(spark, sf_dir))
    # The single fact scan happens inside the rollup's localCheckpoint job;
    # the final plan must consume ONLY the materialized rollup (ExistingRDD)
    # — zero parquet scans means no branch re-reads the fact table (without
    # the checkpoint, Catalyst plans THREE events scans here).
    scans = plan.count("Scan parquet")
    assert scans == 0, f"expected no fact re-scan, plan has {scans}"
    assert "ExistingRDD" in plan


def test_source_cap_pushes_window_group_limit(spark, sf_dir):
    """The per-source document cap must plan with WindowGroupLimit pushed
    below the exchange: each map task keeps only its local top-K per
    source, so shuffle volume is bounded by K x #sources per task, not
    the corpus."""
    plan = _plan(all_queries()["source_cap"].spark_fn(spark, sf_dir))
    assert "WindowGroupLimit" in plan, f"no WindowGroupLimit pushdown:\n{plan}"
    assert plan.count("WindowGroupLimit") >= 2, (
        "WindowGroupLimit not pushed to the map side (partial+final expected)"
    )


def test_point_lookup_prunes_to_one_bucket(spark, sf_dir, tmp_path, monkeypatch):
    """A literal orderkey predicate on the co-bucketed copies must prune
    each fact scan to a single bucket (SelectedBucketsCount: 1 out of N)."""
    import re

    from data_etl_sh_lianjia_spark import session as sess

    saved = (
        dict(getattr(spark, "_lianjia_ingest_map", {}) or {}),
        dict(getattr(spark, "_lianjia_bucket_tables", {}) or {}),
    )
    monkeypatch.setattr(sess, "INGEST_ROOT", str(tmp_path))
    try:
        sess.ingest_tables(spark, sf_dir)
        df = all_queries()["point_lookup_order"].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "lj_bkt_orders" in plan and "lj_bkt_lineitem" in plan
        picks = re.findall(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert len(picks) == 2, plan
        assert all(sel == "1" for sel, _tot in picks), picks
        assert df.count() >= 1
    finally:
        spark._lianjia_ingest_map = saved[0]
        spark._lianjia_bucket_tables = saved[1]
        spark._lianjia_table_cache = {}
        spark._lianjia_views_dir = None
