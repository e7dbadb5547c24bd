"""Approximate-ANN recall checks (SURVEY.md §5.2: approx operators are
tolerance-checked against exact recompute, never hash-matched)."""

from __future__ import annotations

from data_etl_sh_lianjia_spark.plans.registry import all_queries


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    qs = all_queries()
    brute = _topk_sets(qs["ann_brute_topk"].spark_fn(spark, sf_dir).collect())
    ivf = _topk_sets(qs["ann_ivf_topk"].spark_fn(spark, sf_dir).collect())
    assert set(ivf) == set(brute), "every query vector must get IVF results"
    recalls = [len(ivf[q] & brute[q]) / len(brute[q]) for q in brute]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe=4 over ~14 coarse cells at sf0.01 — expect high but not perfect
    assert mean_recall >= 0.5, f"IVF mean recall@5 too low: {mean_recall:.2f} ({recalls})"


def test_approx_count_distinct_tolerance(spark, sf_dir):
    from data_etl_sh_lianjia_spark.operators.aggregates import _approx_distinct_raw

    df = _approx_distinct_raw(spark, sf_dir)
    for r in df.collect():
        rel_err = abs(r["approx_parts"] - r["exact_parts"]) / r["exact_parts"]
        assert rel_err < 0.1, f"HLL estimate off by {rel_err:.1%} for {r}"
    # the registered (hash-checked) surface folds the same bound into a flag
    flagged = all_queries()["approx_distinct"].spark_fn(spark, sf_dir).collect()
    assert flagged and all(r["within_tol"] for r in flagged)


def test_hll_sketch_estimates_within_tolerance(spark, sf_dir):
    """Per-group and union-merged HLL estimates must land within 5% of the
    exact distinct counts (HLL lgK default gives ~1.6% rse; 5% is lax
    enough to be seed-stable)."""
    from data_etl_sh_lianjia_spark.plans.registry import all_queries
    from data_etl_sh_lianjia_spark.session import load_tables

    from data_etl_sh_lianjia_spark.operators.aggregates import _hll_sketch_raw

    rows = {
        r["o_orderstatus"]: r["approx_customers"]
        for r in _hll_sketch_raw(spark, sf_dir).collect()
    }
    o = load_tables(spark, sf_dir, names=("orders",))["orders"]
    from pyspark.sql import functions as F

    exact = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    exact["ALL"] = o.select("o_custkey").distinct().count()
    for k, est in rows.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
    flagged = all_queries()["hll_mergeable_sketch"].spark_fn(spark, sf_dir).collect()
    assert flagged and all(r["within_tol"] for r in flagged)


def test_approx_percentile_tolerance(spark, sf_dir):
    """percentile_approx (GK sketch, mergeable across partitions) must land
    within 1% relative error of the exact interpolated percentile that the
    `percentile_stats` declared query hash-matches against DuckDB."""
    from data_etl_sh_lianjia_spark.session import load_tables

    import pyspark.sql.functions as F

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    row = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("approx"),
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95))).alias("exact"),
    ).collect()[0]
    for a, e in zip(row["approx"], row["exact"]):
        assert abs(a - e) / e < 0.01, (a, e)


def test_bh_quantile_sketch_tolerance(spark, sf_dir):
    """The mergeable Ben-Haim/Tom-Tov histogram sketch (map-side partial
    summaries -> per-group closest-pair merge) must land within 2%
    relative error of the exact interpolated percentile per group — far
    inside the 5% bound the registered query's flag asserts."""
    from data_etl_sh_lianjia_spark.operators.aggregates import (
        _quantile_sketch_raw,
    )
    from data_etl_sh_lianjia_spark.session import load_tables

    import pyspark.sql.functions as F

    approx = {
        r["l_returnflag"]: (r["p50_approx"], r["p95_approx"])
        for r in _quantile_sketch_raw(spark, sf_dir).collect()
    }
    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    exact = {
        r["l_returnflag"]: (r["p50"], r["p95"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for flag in exact:
        for a, e in zip(approx[flag], exact[flag]):
            assert abs(a - e) / abs(e) < 0.02, (flag, a, e)
    flagged = (
        all_queries()["quantile_sketch_mergeable"].spark_fn(spark, sf_dir)
    ).collect()
    assert flagged and all(r["within_tol"] for r in flagged)


def test_pq_recall_vs_brute_force(spark, sf_dir):
    """PQ with m=8 x 16 centroids on near-uniform unit vectors is a coarse
    code (quantization distortion dominates), but the ADC ordering plus
    exact rerank of 32 candidates must still recover a solid share of the
    true top-5 and return every query."""
    from data_etl_sh_lianjia_spark.operators.similarity import _pq_approx_topk

    qs = all_queries()
    brute = _topk_sets(qs["ann_brute_topk"].spark_fn(spark, sf_dir).collect())
    pq = _topk_sets(_pq_approx_topk(spark, sf_dir).collect())
    assert set(pq) == set(brute), "every query vector must get PQ results"
    recalls = [len(pq[q] & brute[q]) / len(brute[q]) for q in brute]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.3, f"PQ mean recall@5 too low: {mean_recall:.2f} ({recalls})"
    # registered surface: exact baseline rows + the same bound as a flag
    flagged = qs["ann_pq_topk"].spark_fn(spark, sf_dir).collect()
    assert _topk_sets(flagged) == brute
    assert all(r["recall_ok"] for r in flagged)


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS one-sided error bound: estimate >= exact always, and
    estimate <= exact + eps*N with probability >= confidence (eps=0.001,
    N = |lineitem| — at sf0.01 that is a slack of ~60 counts)."""
    from data_etl_sh_lianjia_spark.session import load_tables

    from data_etl_sh_lianjia_spark.operators.aggregates import _cms_raw

    rows = _cms_raw(spark, sf_dir).collect()
    assert len(rows) == 10
    n = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"].count()
    for r in rows:
        assert r["est"] >= r["exact"], f"CMS underestimated: {r}"
        assert r["est"] <= r["exact"] + 0.001 * n, f"CMS above eps bound: {r}"
    flagged = all_queries()["count_min_heavy_hitters"].spark_fn(spark, sf_dir).collect()
    assert len(flagged) == 10 and all(r["bound_ok"] for r in flagged)


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    """BucketedRandomProjectionLSH with 8 hash tables over unit vectors:
    every query must come back, and bucket collisions must retain most of
    the true top-5 (union-of-tables OR-amplification keeps recall high)."""
    from data_etl_sh_lianjia_spark.operators.similarity import _lsh_approx_topk

    qs = all_queries()
    brute = _topk_sets(qs["ann_brute_topk"].spark_fn(spark, sf_dir).collect())
    lsh = _topk_sets(_lsh_approx_topk(spark, sf_dir).collect())
    assert set(lsh) == set(brute), "every query vector must get LSH results"
    recalls = [len(lsh[q] & brute[q]) / len(brute[q]) for q in brute]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"LSH mean recall@5 too low: {mean_recall:.2f} ({recalls})"
    flagged = qs["ann_lsh_topk"].spark_fn(spark, sf_dir).collect()
    assert _topk_sets(flagged) == brute
    assert all(r["recall_ok"] for r in flagged)


def test_cosine_topk_tiled_matches_untiled(spark, sf_dir):
    """Force tile_size < corpus so the exact-pair kernel takes the
    multi-tile broadcast path; the result must hash-match the single-tile
    (untiled) run row for row."""
    from data_etl_sh_lianjia_spark.canon import compare_results
    from data_etl_sh_lianjia_spark.operators.similarity import _cosine_topk_impl

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    small = max(1, n // 4)  # >= 4 tiles
    tiled = _cosine_topk_impl(spark, sf_dir, tile_size=small)
    untiled = _cosine_topk_impl(spark, sf_dir, tile_size=n + 1)
    t_rows = [tuple(r) for r in tiled.collect()]
    u_rows = [tuple(r) for r in untiled.collect()]
    res = compare_results(t_rows, tiled.columns, u_rows, untiled.columns)
    assert res.ok, f"tiled != untiled: {res.reason}\n{res.sample_diff}"


def test_dedup_embedding_cosine_tiled_matches_untiled(spark, sf_dir):
    from data_etl_sh_lianjia_spark.canon import compare_results
    from data_etl_sh_lianjia_spark.operators.dedup import dedup_embedding_cosine

    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    small = max(1, n // 4)
    tiled = dedup_embedding_cosine(spark, sf_dir, tile_size=small)
    untiled = dedup_embedding_cosine(spark, sf_dir, tile_size=n + 1)
    t_rows = [tuple(r) for r in tiled.collect()]
    u_rows = [tuple(r) for r in untiled.collect()]
    assert len(t_rows) > 0
    res = compare_results(t_rows, tiled.columns, u_rows, untiled.columns)
    assert res.ok, f"tiled != untiled: {res.reason}\n{res.sample_diff}"


def test_cosine_topk_f32_path_matches_f64(spark, sf_dir, monkeypatch):
    """Force the large-cell f32 scoring path (normally >16M-entry cells
    only) and require it to match the exact-f64 selection row for row —
    the f32 pass only *selects* candidates; emitted sims are re-scored in
    float64, so the results must be identical at any corpus the margin
    argument holds for."""
    from data_etl_sh_lianjia_spark.canon import compare_results
    from data_etl_sh_lianjia_spark.operators import similarity

    f64 = [tuple(r) for r in similarity._cosine_topk_impl(spark, sf_dir).collect()]
    monkeypatch.setattr(similarity, "_TOPK_F32_CELL", 1)
    f32 = [tuple(r) for r in similarity._cosine_topk_impl(spark, sf_dir).collect()]
    cols = ["vec_id_a", "vec_id_b", "sim"]
    res = compare_results(f32, cols, f64, cols)
    assert res.ok, f"f32 path != f64 path: {res.reason}\n{res.sample_diff}"


def test_cosine_topk_chunked_matches_unchunked(spark, sf_dir, monkeypatch):
    """Force the column-chunked tile walk (normally only corpora whose
    score matrix exceeds the per-chunk budget) and require identical
    results: per-(batch, chunk) threshold selection is a superset of
    per-batch selection, and the final per-batch top-keep restores the
    same candidate contract."""
    from data_etl_sh_lianjia_spark.canon import compare_results
    from data_etl_sh_lianjia_spark.operators import similarity

    whole = [tuple(r) for r in similarity._cosine_topk_impl(spark, sf_dir).collect()]
    monkeypatch.setattr(similarity, "_TOPK_CHUNK_ENTRIES", 10_000)
    chunked = [tuple(r) for r in similarity._cosine_topk_impl(spark, sf_dir).collect()]
    cols = ["vec_id_a", "vec_id_b", "sim"]
    res = compare_results(chunked, cols, whole, cols)
    assert res.ok, f"chunked != whole-tile: {res.reason}\n{res.sample_diff}"


def test_cosine_topk_grid_chunked_matches_unchunked(spark, sf_dir, monkeypatch):
    """Same contract for the block-grid kernel: forcing the column-chunked
    cell walk (diagonal cells re-sort the block by id; off-diagonal cells
    chunk the b-side) must reproduce the whole-cell selection exactly."""
    from data_etl_sh_lianjia_spark.canon import compare_results
    from data_etl_sh_lianjia_spark.operators import similarity

    whole = [tuple(r) for r in similarity.cosine_topk_grid(spark, sf_dir).collect()]
    monkeypatch.setattr(similarity, "_TOPK_CHUNK_ENTRIES", 10_000)
    chunked = [tuple(r) for r in similarity.cosine_topk_grid(spark, sf_dir).collect()]
    cols = ["vec_id_a", "vec_id_b", "sim"]
    res = compare_results(chunked, cols, whole, cols)
    assert res.ok, f"grid chunked != whole-cell: {res.reason}\n{res.sample_diff}"


def test_vector_index_invalidates_on_source_rewrite(spark, tmp_path):
    """The broadcast-index staleness contract: memo keys fold in the served
    storage's (size, mtime) fingerprint, so an in-place rewrite of the
    embeddings parquet must produce fresh results — never a stale index."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from data_etl_sh_lianjia_spark.operators.similarity import ann_brute_topk

    sf = tmp_path / "sfidx"
    sf.mkdir()
    src = "/root/testdata/sf0.001"
    for t in ("embeddings",):
        shutil.copy(f"{src}/{t}.parquet", str(sf / f"{t}.parquet"))

    first = sorted(tuple(r) for r in ann_brute_topk(spark, str(sf)).collect())

    # in-place rewrite: shift every vec_id so the top-k ids must change
    tab = pq.read_table(str(sf / "embeddings.parquet"))
    shifted = tab.set_column(
        tab.column_names.index("vec_id"),
        "vec_id",
        pc.add(tab["vec_id"], pa.scalar(1_000_000, type=tab["vec_id"].type)),
    )
    pq.write_table(shifted, str(sf / "embeddings.parquet"))
    # drop the memoized DataFrame handle (tracked separately from the vector
    # index; this test pins the INDEX invalidation)
    spark._lianjia_table_cache = {}

    second = sorted(tuple(r) for r in ann_brute_topk(spark, str(sf)).collect())
    first_ids = {r[0] for r in first}
    second_ids = {r[0] for r in second}
    assert second_ids and all(i >= 1_000_000 for i in second_ids), (
        "stale broadcast index served old vec_ids after an in-place rewrite"
    )
    assert first_ids != second_ids


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    """The composed IVF-PQ path (probe cells -> ADC over stored codes ->
    exact rerank): cell misses and quantization distortion compound, so
    the pin is lower than either component alone (registry flag >= 0.25;
    measured ~0.72 at sf0.01)."""
    from data_etl_sh_lianjia_spark.operators.similarity import _ivfpq_approx_topk

    qs = all_queries()
    brute = _topk_sets(qs["ann_brute_topk"].spark_fn(spark, sf_dir).collect())
    appr = _topk_sets(_ivfpq_approx_topk(spark, sf_dir).collect())
    recalls = [
        len(appr.get(q, set()) & brute[q]) / len(brute[q]) for q in brute
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.25, f"IVF-PQ mean recall@5 too low: {mean_recall:.2f}"
    flagged = qs["ann_ivfpq_topk"].spark_fn(spark, sf_dir).collect()
    assert flagged and all(r["recall_ok"] for r in flagged)
