"""Dedup queries over the documents table (LLM-pipeline scope).

Exact and n-gram-Jaccard dedup carry DuckDB oracles; MinHash+LSH and SimHash
use engine-specific hashing (xxhash64 is not in DuckDB), so they are declared
without oracles → the driver records rows-only checks, and the Jaccard query
serves as their semantic ground truth (tests assert LSH candidates ⊇
high-Jaccard pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.functions.text import fingerprint
from f1_bigdata_pyspark_spark.operators.dedup import (
    exact_dedup_keep_first,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash_table,
)
from f1_bigdata_pyspark_spark.queries.registry import query


# --------------------------------------------------------------------------
# Q: exact_dedup_docs — keep-first per fingerprint (hash-groupBy dedup;
# reference analog deduplicate_laps.py:37-47). Returns the surviving doc ids
# + per-fingerprint duplicate count.
# --------------------------------------------------------------------------
@query(
    "exact_dedup_docs",
    oracle="""
WITH fp AS (
  SELECT doc_id, lang, md5(lower(trim(text))) AS f FROM documents
), keep AS (
  SELECT doc_id, lang, f,
         row_number() OVER (PARTITION BY f ORDER BY doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY f) AS n_copies
  FROM fp
)
SELECT doc_id, lang, n_copies
FROM keep WHERE rn = 1
ORDER BY doc_id
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", fingerprint(F.col("text")).alias("f")
    )
    w = Window.partitionBy("f")
    docs = docs.withColumn("n_copies", F.count(F.lit(1)).over(w))
    kept = exact_dedup_keep_first(docs, ["f"], [F.col("doc_id").asc()])
    return kept.select("doc_id", "lang", "n_copies").orderBy("doc_id")


# --------------------------------------------------------------------------
# Q: ngram_jaccard_dups — exact word-3-gram Jaccard near-dup pairs. This is
# the oracle-checkable ground truth for MinHash LSH.
# --------------------------------------------------------------------------
@query(
    "ngram_jaccard_dups",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2, round(c * 1.0 / (ca.n + cb.n - c), 6) AS jaccard
FROM inter
JOIN cnt ca ON ca.doc_id = d1
JOIN cnt cb ON cb.doc_id = d2
WHERE c * 1.0 / (ca.n + cb.n - c) >= 0.2
ORDER BY d1, d2
""",
)
def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.2).orderBy("d1", "d2")


# --------------------------------------------------------------------------
# Q: minhash_lsh_candidates — MinHash(32)+LSH(8 bands) near-dup candidate
# pairs with estimated Jaccard >= 0.2. No oracle (engine hash); rows-only.
# --------------------------------------------------------------------------
@query("minhash_lsh_candidates", oracle=None, bench=True)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        minhash_candidates(docs, num_hashes=32, n_bands=8, shingle_n=3)
        .filter(F.col("est_jaccard") >= 0.2)
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# Q: simhash_buckets — 64-bit SimHash per doc, aggregated by 16-bit prefix
# band (candidate buckets for hamming-distance near-dup). No oracle.
# --------------------------------------------------------------------------
@query("simhash_buckets", oracle=None)
def simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = simhash_table(docs)
    band = F.shiftrightunsigned(F.col("simhash"), 48)
    return (
        sh.groupBy(band.alias("band16"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .orderBy("band16")
    )
