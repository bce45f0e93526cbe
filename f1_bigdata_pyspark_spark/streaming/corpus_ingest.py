"""Streaming corpus ingestion with cross-batch content dedup —
insert-if-absent by document fingerprint.

The keep-latest upsert sink (``upsert_sink.py``) answers "newest row per
key wins" — the reference's lap-upsert semantics. Corpus ingestion needs
the OTHER idempotence: a document re-arriving in a later crawl drop (same
content, any key) must NOT be appended again. That is insert-if-absent on
a CONTENT fingerprint (md5 of the text, ``functions.text.fingerprint``),
the streaming face of ``exact_dedup_docs``.

Mechanics per micro-batch: intra-batch dedup first (keep lowest doc_id per
fingerprint — deterministic under replay), then a left-anti join against
the fingerprints already in the target, then APPEND (never overwrite — the
accumulated corpus is immutable history, so each micro-batch writes only
its new files, unlike the read-merge-overwrite of keep-latest).

Scale notes: only the fingerprint COLUMN of the target is read back
(column-pruned scan of one narrow column); at 100 TB the anti join runs
against a bucketed fingerprint index (or a bloom prefilter —
``queries/extended.bloom_prefilter_revenue`` is the same trick) rather
than the corpus itself, and appends land as date-partitioned files. The
anti join is the batch-side guarantee; it holds even when a duplicate
arrives many drops later, which watermark-bounded ``dropDuplicates``
state cannot promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.text import fingerprint
from f1_bigdata_pyspark_spark.operators.dedup import exact_dedup_keep_first
from f1_bigdata_pyspark_spark.utils import fs_path_exists


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the content fingerprint column (md5 hex of the raw text)."""
    return docs.withColumn("fp", fingerprint(F.col(text_col)))


def foreach_batch_dedup_append(target_dir: str, id_col: str = "doc_id"):
    """Build a ``foreachBatch`` function appending only never-seen-before
    documents (by content fingerprint) to the parquet corpus at
    ``target_dir``. Input batches must already carry the ``fp`` column
    (``with_fingerprint``)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = exact_dedup_keep_first(batch_df, ["fp"], [F.col(id_col)])
        # EXPLICIT existence probe through the Hadoop FS API (scheme-aware;
        # an os.path probe never sees a remote target, silently disabling
        # cross-batch dedup) — a bare except would be wrong the other way:
        # transient read errors must propagate and fail the epoch
        if fs_path_exists(spark, target_dir):
            seen = spark.read.parquet(target_dir).select("fp")
            batch = batch.join(seen, "fp", "left_anti")
        batch.write.mode("append").parquet(target_dir)

    return apply
