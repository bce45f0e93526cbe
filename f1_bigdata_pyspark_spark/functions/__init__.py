"""Scalar/array expression helpers (JVM-side, codegen-friendly).

Everything here returns pyspark Columns built from ``pyspark.sql.functions``
— no Python row-at-a-time UDFs. The reference's only custom per-row logic is
ingest-side pandas (SURVEY.md §2.10); analytics stay on built-ins, and so do
we.
"""

from f1_bigdata_pyspark_spark.functions import stats, text, vectors  # noqa: F401
