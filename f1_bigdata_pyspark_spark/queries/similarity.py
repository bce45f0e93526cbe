"""Similarity-search queries over the embeddings table (LLM-pipeline scope).

The query vector is a fixed deterministic probe (vec_id 0's embedding,
fetched driver-side — a tiny lookup, not a distributed collect). Threshold
and top-k variants carry DuckDB oracles (list_cosine_similarity over
double-cast lists — identical arithmetic to the Spark zip_with/aggregate
expression); the ANN variants (LSH buckets, IVF cells) are engine-hash-based
→ rows-only checks with recall asserted against the exact baseline in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.functions.vectors import norm2
from f1_bigdata_pyspark_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    lsh_topk,
    similarity_threshold,
)
from f1_bigdata_pyspark_spark.queries.registry import query

_QUERY_VEC_ID = 0


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == _QUERY_VEC_ID).select("embedding").head()
    return [float(x) for x in row["embedding"]]


# --------------------------------------------------------------------------
# Q: cosine_above_threshold — all vectors with cos >= 0.3 vs the probe.
# --------------------------------------------------------------------------
@query(
    "cosine_above_threshold",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cos_sim
FROM embeddings, q
WHERE round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) >= 0.3
ORDER BY vec_id
""",
    bench=True,
)
def cosine_above_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return similarity_threshold(emb, qv, threshold=0.3).orderBy("vec_id")


# --------------------------------------------------------------------------
# Q: knn_topk — exact top-20 by cosine (deterministic id tie-break).
# --------------------------------------------------------------------------
@query(
    "knn_topk",
    oracle=f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {_QUERY_VEC_ID}
)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cos_sim
FROM embeddings, q
ORDER BY cos_sim DESC, vec_id ASC
LIMIT 20
""",
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return brute_force_topk(emb, qv, k=20)


# --------------------------------------------------------------------------
# Q: embedding_norms_by_label — per-label vector statistics (array math
# entirely in higher-order functions).
# --------------------------------------------------------------------------
@query(
    "embedding_norms_by_label",
    oracle="""
SELECT label,
       count(*) AS n_vecs,
       round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x)))), 6) AS avg_norm
FROM embeddings
GROUP BY label
ORDER BY label
""",
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", norm2(F.col("embedding")).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# Q: ann_lsh_topk — LSH-bucketed ANN top-k (scale path; rows-only check).
# --------------------------------------------------------------------------
@query("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    return lsh_topk(emb, qv, k=20, n_planes=6)


# --------------------------------------------------------------------------
# Q: ann_ivf_cells — IVF coarse assignment: cell sizes for k=16 fixed
# centroids (first 16 vectors by id — deterministic stand-in for sampled
# k-means centroids). Rows-only check.
# --------------------------------------------------------------------------
@query("ann_ivf_cells", oracle=None)
def ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = (
        emb.filter(F.col("vec_id") < 16)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
    )
    assigned = ivf_assign(emb, centroids)
    return (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("centroid_id")
    )


# --------------------------------------------------------------------------
# Q: label_centroid_cohesion — per-label embedding cluster cohesion via the
# applyInPandas grouped-map operator (engine-side numpy; verified against a
# driver-side numpy recomputation in tests, no SQL twin).
# --------------------------------------------------------------------------
@query("label_centroid_cohesion", oracle=None)
def label_centroid_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.operators.grouped_map import label_cohesion

    emb = load_table(spark, sf_dir, "embeddings")
    return label_cohesion(emb).orderBy("label")
