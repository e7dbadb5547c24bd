"""Edge-case semantics of the training-pipeline generators.

These guard cross-engine divergences that are latent in the fixed testdata
(which never contains the edge value) but would break hash parity the day
the corpus does — e.g. Spark's descending sequence(0, -1) vs DuckDB's empty
range(0, 0) for zero-length documents.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.operators.training_pipeline import (
    _CE_CHUNK,
    chunk_array_expr,
)


def test_chunk_generator_empty_text_yields_no_chunks(spark):
    df = spark.createDataFrame(
        [
            (1, ""),  # zero-length: must chunk to nothing (not [0, -1])
            (2, None),  # NULL text: no chunks
            (3, "x" * _CE_CHUNK),  # exactly one chunk, no phantom second
            (4, "y" * (_CE_CHUNK + 1)),  # spills into a second chunk
        ],
        "doc_id long, text string",
    )
    rows = (
        df.select("doc_id", F.explode(F.expr(chunk_array_expr("text"))).alias("c"))
        .select("doc_id", "c.chunk_idx", F.length("c.chunk").alias("n"))
        .collect()
    )
    got = sorted((r.doc_id, r.chunk_idx, r.n) for r in rows)
    assert got == [(3, 0, _CE_CHUNK), (4, 0, _CE_CHUNK), (4, 1, 1)]

    # The DuckDB oracle's range(0, ceil(len/chunk)) must agree row-for-row.
    duck = duckdb.sql(
        f"""
        WITH docs(doc_id, text) AS (VALUES
            (1, ''), (2, NULL),
            (3, repeat('x', {_CE_CHUNK})), (4, repeat('y', {_CE_CHUNK + 1})))
        SELECT doc_id, k AS chunk_idx,
               length(substr(text, k * {_CE_CHUNK} + 1, {_CE_CHUNK})) AS n
        FROM docs,
             unnest(range(0, CAST(ceil(length(text) / {_CE_CHUNK}.0) AS BIGINT))) AS t(k)
        ORDER BY doc_id, chunk_idx
        """
    ).fetchall()
    assert [tuple(r) for r in duck] == got


def test_connected_components_chain_converges_logarithmically(spark):
    """Pointer jumping must collapse a 64-node chain in O(log d) rounds —
    plain min-label propagation would need 63 (and blow the 30-round cap).
    Labels must all reach the chain minimum."""
    from data_etl_sh_lianjia_spark.operators.dedup import min_label_components

    n = 64
    nodes = spark.createDataFrame([(i,) for i in range(n)], "u long")
    chain = [(i, i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        chain + [(b, a) for a, b in chain], "u long, v long"
    )
    labels, rounds = min_label_components(nodes, edges)
    got = {r.u: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 10, f"chain of 64 took {rounds} rounds"


def test_connected_components_isolated_and_multi_component(spark):
    from data_etl_sh_lianjia_spark.operators.dedup import min_label_components

    nodes = spark.createDataFrame([(i,) for i in range(7)], "u long")
    pairs = [(1, 2), (2, 3), (5, 6)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "u long, v long"
    )
    labels, _ = min_label_components(nodes, edges)
    got = {r.u: r.label for r in labels.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}
