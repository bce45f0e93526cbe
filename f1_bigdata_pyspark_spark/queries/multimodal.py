"""Multimodal-pipeline query: binary payload metadata extraction.

The Spark side goes through the real multimodal plumbing — binary column +
Arrow-batched ``mapInPandas`` extraction (``multimodal/binary_ops.py``) —
and the DuckDB oracle recomputes the same metadata with SQL functions
(sha256/octet_length), proving the Pandas-UDF path value-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.multimodal.binary_ops import (
    extract_features,
    media_from_documents,
)
from f1_bigdata_pyspark_spark.queries.registry import query
from f1_bigdata_pyspark_spark.operators.join_policy import broadcast_if_small


# --------------------------------------------------------------------------
# Q: multimodal_meta — per-source payload statistics via mapInPandas.
# (source is re-joined from documents since the media table carries only
# media metadata — exercises extraction + broadcast joinback.)
# --------------------------------------------------------------------------
@query(
    "multimodal_meta",
    oracle="""
SELECT
  source,
  count(*) AS n_media,
  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  count(DISTINCT sha256(text)) AS n_distinct_payloads
FROM documents
GROUP BY source
ORDER BY source
""",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = media_from_documents(docs)
    feats = extract_features(media)
    src = docs.select(F.col("doc_id").alias("media_id"), "source")
    return (
        feats.join(broadcast_if_small(src), "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256").alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Q: crossmodal_retrieval_topk — the multimodal feature path COMPOSED with
# vector retrieval: media features come out of the Arrow-batched
# mapInPandas extractor (sha256-derived fake dimensions standing in for a
# real decode→measure), join the embeddings table on id, and rank by a
# blended score (0.8 · cosine-to-query + 0.2 · normalized width). This is
# the shape of a CLIP-style retrieval pipeline — decode features on one
# side, embedding similarity on the other, late fusion — with every stage
# deterministic, so the oracle rebuilds the whole thing in SQL (DuckDB
# sha256 == hashlib sha256 over the same utf-8 bytes).
# Scale: the feature pass is a narrow map; the id join is co-keyed; only
# the final top-k pays an ordering, and it's TakeOrdered on k rows.
# --------------------------------------------------------------------------
@query(
    "crossmodal_retrieval_topk",
    oracle="""
WITH feats AS (
  SELECT doc_id AS media_id,
         CAST('0x' || substr(sha256(text), 1, 4) AS INTEGER) % 1920 AS fake_width
  FROM documents
),
q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT vec_id,
         round(0.8 * list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv)
               + 0.2 * (fake_width / 1920.0), 6) AS score,
         fake_width
  FROM embeddings
  JOIN feats ON media_id = vec_id
  CROSS JOIN q
)
SELECT vec_id, score, fake_width
FROM scored
ORDER BY score DESC, vec_id ASC
LIMIT 10
""",
)
def crossmodal_retrieval_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from f1_bigdata_pyspark_spark.functions.vectors import cosine

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(media_from_documents(docs)).select(
        "media_id", "fake_width"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    qv_row = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    qv = F.array(*[F.lit(float(x)) for x in qv_row["embedding"]])
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        emb.join(feats, feats.media_id == emb.vec_id)
        .select(
            "vec_id",
            F.round(
                0.8 * cosine(v, qv) + 0.2 * (F.col("fake_width") / F.lit(1920.0)),
                6,
            ).alias("score"),
            "fake_width",
        )
        .orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(10)
    )
