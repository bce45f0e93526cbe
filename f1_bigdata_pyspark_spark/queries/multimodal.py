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
        feats.join(F.broadcast(src), "media_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("sha256").alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )
