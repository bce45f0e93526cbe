"""f1_bigdata_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``fanislym/f1-bigdata-pyspark`` (a PySpark
F1 lap-analytics pipeline over MongoDB), re-hosted on parquet + the Spark
DataFrame/SQL stack, and extended with the large-scale training-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``session``   — SparkSession factory tuned for local[NCPU] testing but
  configured the way a 1000-executor cluster job would be (AQE, Arrow,
  sane shuffle partitioning).
- ``catalog``   — declared schemas + loaders for the synthetic test tables.
- ``operators`` — relational/dataflow operator library (aggregates, windows,
  joins, dedup, similarity, time-series).
- ``functions`` — scalar/array expression helpers (text, vectors, stats).
- ``sources``   — readers/writers incl. idempotent-upsert semantics.
- ``plans``     — plan-inspection helpers (pushdown/broadcast assertions).
- ``streaming`` — Structured Streaming equivalents of the batch operators.
- ``queries``   — the declared query registry consumed by ``__spark_entry__``.

Every operator cites the reference file:line it draws its semantics from; no
reference code is copied (the reference itself is plain PySpark over Mongo —
this engine is an independent parquet-native design).
"""

__version__ = "0.1.0"
