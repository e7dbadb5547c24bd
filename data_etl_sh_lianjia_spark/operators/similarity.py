"""Similarity search over embeddings — SURVEY.md §2.4 J5 / §2.9 L3.

Three tiers, trading exactness for scale:

1. ``cosine_topk`` — exact all-pairs top-k. Physical shape: broadcast one
   side, nested-loop join with ``a.vec_id < b.vec_id``, per-pair codegen'd
   dot product, TakeOrderedAndProject for the global top-k. At 100 TB this
   is the *verification* path, not the serving path (quadratic).
2. ``ann_cosine_topk_per_query`` — brute-force top-k *per query vector*
   (linear scan per query; the baseline every ANN variant is recall-checked
   against).
3. LSH-bucketed variant in ``operators.dedup`` (MinHash) and the
   random-hyperplane SimHash bucketing here — candidates only join within a
   bucket: the 100 TB path (shuffle is bucket-partitioned, no cross join).

Determinism: similarity values are rounded to 4 decimals on both engines and
ranking always carries (vec_id_a, vec_id_b) tiebreakers, so the oracle
hash-match is stable (double error ~1e-13 « 5e-5 rounding boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_sh_lianjia_spark.functions.vectors import cosine, norm2, to_double_array
from data_etl_sh_lianjia_spark.plans.registry import register
from data_etl_sh_lianjia_spark.session import load_tables


def _embeddings_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    return emb.select(
        "vec_id",
        "label",
        to_double_array("embedding").alias("vec"),
    ).withColumn("n2", norm2(F.col("vec")))


@register(
    "cosine_topk",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         round(list_cosine_similarity(a.vec, b.vec), 4) AS sim
  FROM v a JOIN v b ON a.vec_id < b.vec_id
)
SELECT vec_id_a, vec_id_b, sim
FROM pairs
ORDER BY sim DESC, vec_id_a, vec_id_b
LIMIT 10
""",
    survey_ref="J5,L3",
    bench=True,
    doc="global top-10 cosine pairs over all embeddings (exact, quadratic)",
)
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _embeddings_with_norm(spark, sf_dir)
    a = v.select(
        F.col("vec_id").alias("vec_id_a"), F.col("vec").alias("vec_a"), F.col("n2").alias("n2_a")
    )
    b = v.select(
        F.col("vec_id").alias("vec_id_b"), F.col("vec").alias("vec_b"), F.col("n2").alias("n2_b")
    )
    pairs = a.join(F.broadcast(b), F.col("vec_id_a") < F.col("vec_id_b"))
    sim = F.round(
        cosine(F.col("vec_a"), F.col("vec_b"), F.col("n2_a"), F.col("n2_b")), 4
    ).alias("sim")
    return (
        pairs.select("vec_id_a", "vec_id_b", sim)
        .orderBy(F.desc("sim"), "vec_id_a", "vec_id_b")
        .limit(10)
    )


@register(
    "ann_brute_topk",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
), q AS (
  SELECT vec_id AS q_id, vec AS q_vec FROM v WHERE vec_id % 100 = 0
), scored AS (
  SELECT q_id, vec_id AS neighbor_id,
         round(list_cosine_similarity(q_vec, vec), 4) AS sim
  FROM q JOIN v ON q_id <> vec_id
)
SELECT q_id, neighbor_id, sim
FROM scored
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) <= 5
""",
    survey_ref="L3,W4",
    doc="brute-force top-5 cosine neighbors for every 100th vector (ANN baseline)",
)
def ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query exact k-NN: broadcast the (small) query set against the
    full collection — the linear-scan baseline that ANN variants are
    recall-checked against. At scale the collection side stays partitioned;
    only queries broadcast."""
    from pyspark.sql.window import Window

    v = _embeddings_with_norm(spark, sf_dir)
    q = v.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec"), F.col("n2").alias("q_n2")
    )
    scored = v.join(F.broadcast(q), F.col("q_id") != F.col("vec_id")).select(
        "q_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("q_vec"), F.col("vec"), F.col("q_n2"), F.col("n2")), 4).alias("sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")
