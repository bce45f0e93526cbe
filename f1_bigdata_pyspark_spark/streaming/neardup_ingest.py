"""Streaming NEAR-dup corpus ingestion — an incremental MinHash/LSH index
maintained across micro-batches.

``corpus_ingest.py`` rejects exact re-arrivals (same bytes). A crawl also
re-delivers *edited* copies — boilerplate swapped, a sentence dropped —
which only near-dup detection catches. This sink keeps the banded-LSH
index AS the persisted state and extends it incrementally:

per micro-batch
  1. signatures of the NEW docs only (``minhash_signature_arrays`` —
     signatures are per-doc, so they never need recomputation for old
     docs; the doc-disjoint merge property is pinned in
     ``tests/test_operators.py::test_minhash_signatures_incremental_union``),
  2. band them (``band_table``) and join against the PERSISTED band index
     → candidate (new, existing) pairs,
  3. verify candidates by estimated Jaccard over the two signature arrays;
     new docs that match an existing doc at >= threshold are dropped,
  4. survivors (also near-deduped within the batch, keep-lowest-id) append
     their rows to the corpus and their signatures + bands to the index.

Scale notes: state grows as O(docs x n_bands) band rows + O(docs)
signature rows — hashed summaries, never text; the candidate join touches
only bucket-colliding pairs (the LSH contract), so a micro-batch costs
|batch| signature builds + one bucket join against the index, independent
of corpus text size. At 100 TB the index lives bucketed-by-(band, bucket)
so the join is co-partitioned; here it is plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.functions.text import md5_long
from f1_bigdata_pyspark_spark.operators.dedup import (
    _P,
    _raw_shingles,
    band_table,
    minhash_signature_arrays,
)
from f1_bigdata_pyspark_spark.utils import materialize

NUM_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = NUM_HASHES // N_BANDS


def signatures_of(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc, sig) MinHash signatures of a document batch."""
    raw = _raw_shingles(docs, "doc_id", "text", shingle_n).select(
        "doc", (md5_long(F.col("s")) % _P).alias("xm")
    )
    return minhash_signature_arrays(raw, NUM_HASHES)


def _est_jaccard() -> "F.Column":
    match = F.zip_with("sig", "sig_idx", lambda a, b: (a == b).cast("int"))
    n_match = F.aggregate(match, F.lit(0), lambda acc, x: acc + x)
    return n_match.cast("double") / F.lit(float(NUM_HASHES))


def foreach_batch_neardup_append(
    corpus_dir: str, index_dir: str, threshold: float = 0.5
):
    """Build a ``foreachBatch`` function that appends only documents with
    no near-duplicate (estimated Jaccard >= ``threshold``) among either
    the already-ingested corpus or the lower-doc_id docs of the same
    batch. The LSH index (signatures + bands) is appended alongside."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = materialize(batch_df)
        sig = materialize(signatures_of(batch))
        bands = band_table(sig, N_BANDS, ROWS_PER_BAND)

        # EXPLICIT existence probe through the Hadoop FS API (the same
        # fix corpus_ingest/upsert_sink got): a bare except here would
        # treat ANY transient read failure as "first batch" and silently
        # disable near-dup detection for the epoch — and an os.path
        # probe never sees a remote target. Real read errors propagate
        # and fail the epoch; only genuine absence means "no index yet".
        from f1_bigdata_pyspark_spark.utils import fs_path_exists

        if fs_path_exists(spark, f"{index_dir}/sig") and fs_path_exists(
            spark, f"{index_dir}/bands"
        ):
            idx_sig = spark.read.parquet(f"{index_dir}/sig")
            idx_bands = spark.read.parquet(f"{index_dir}/bands")
        else:
            idx_sig, idx_bands = None, None

        # candidates vs the persisted index: bucket-colliding (new, old)
        # pairs, verified on signature agreement
        dup_vs_index = None
        if idx_sig is not None:
            cand = (
                bands.join(
                    idx_bands.withColumnRenamed("doc", "doc_idx"),
                    ["band", "bucket"],
                )
                .select("doc", "doc_idx")
                .dropDuplicates()
            )
            verified = (
                cand.join(sig, "doc")
                .join(
                    idx_sig.select(
                        F.col("doc").alias("doc_idx"),
                        F.col("sig").alias("sig_idx"),
                    ),
                    "doc_idx",
                )
                .filter(_est_jaccard() >= threshold)
            )
            dup_vs_index = verified.select("doc").distinct()

        # near-dups INSIDE the batch: keep the lowest doc id of each
        # candidate pair (survivor set = docs never appearing as the
        # higher id of a verified pair)
        b2 = bands.select(
            F.col("doc").alias("doc_idx"),
            "band",
            "bucket",
        )
        intra = (
            bands.join(b2, ["band", "bucket"])
            .filter(F.col("doc") > F.col("doc_idx"))
            .select("doc", "doc_idx")
            .dropDuplicates()
            .join(sig, "doc")
            .join(
                sig.select(
                    F.col("doc").alias("doc_idx"),
                    F.col("sig").alias("sig_idx"),
                ),
                "doc_idx",
            )
            .filter(_est_jaccard() >= threshold)
            .select("doc")
            .distinct()
        )

        drop = intra if dup_vs_index is None else dup_vs_index.union(intra)
        keep_ids = materialize(
            batch.select(F.col("doc_id").alias("doc"))
            .join(drop, "doc", "left_anti")
        )

        batch.join(
            keep_ids.withColumnRenamed("doc", "doc_id"), "doc_id", "left_semi"
        ).write.mode("append").parquet(corpus_dir)
        kept_sig = materialize(sig.join(keep_ids, "doc", "left_semi"))
        kept_sig.write.mode("append").parquet(f"{index_dir}/sig")
        band_table(kept_sig, N_BANDS, ROWS_PER_BAND).write.mode(
            "append"
        ).parquet(f"{index_dir}/bands")

    return apply


def consume_snapshot_changes(
    spark,
    table,
    corpus_dir: str,
    index_dir: str,
    last_version: int | None,
    threshold: float = 0.5,
) -> int:
    """Tail a snapshot-versioned table's CHANGE FEED into the near-dup
    index: every append version committed after ``last_version`` is read
    as one delta (``sources/snapshots.read_changes_since`` plans a scan
    of exactly the new files) and pushed through the same near-dup body a
    streaming micro-batch uses. Returns the new cursor; the caller
    persists it — a real pipeline tails a TABLE, not a directory, and
    this is that composition.

    Exactly-once contract, stated precisely: delivery is (cursor,
    immutable-file-list) based, so nothing is re-read once the cursor
    advances; and a replay after a COMPLETED apply (crash before the
    cursor persisted) appends nothing, because every re-delivered doc
    verifies as a near-duplicate of the copy the index already holds
    (Jaccard 1.0 with itself) — the insert-if-absent property, pinned in
    tests/test_streaming.py. Known crash WINDOWS inside one apply (three
    plain-parquet appends are not one transaction): dying after the
    corpus append but before the sig/bands appends makes the replay
    re-append those docs (duplicates — the index copy that would have
    flagged them doesn't exist yet); dying between the sig and bands
    appends leaves signatures the candidate join (bands-keyed) can never
    reach. A deployment needing atomicity across the three tables should
    sink each through a SnapshotTable with a shared txn stamp
    (``foreach_batch_snapshot_append``) instead of raw parquet appends."""
    from f1_bigdata_pyspark_spark.sources.snapshots import read_changes_since

    delta, cursor = read_changes_since(spark, table, last_version)
    if delta is not None:
        foreach_batch_neardup_append(corpus_dir, index_dir, threshold)(
            delta, cursor
        )
    return cursor
