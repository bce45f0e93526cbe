#!/usr/bin/env python
"""Phase-profile the bench faces VERDICT r11 flagged (guide §1): the
Python-DataSource serving face, the fused CDF fold, and the minhash
signature build. Run with the bench env (SPARK_GRAFT_SF_DIR, _CPUS)."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.catalog import load_table
from f1_bigdata_pyspark_spark.session import env_sf_dir, get_spark

sf_dir = env_sf_dir()
spark = get_spark(app_name="profile-faces")
spark.sparkContext.setLogLevel("ERROR")


def t(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return out


# ---- snapshot_served_dv_scan phases ---------------------------------------
from f1_bigdata_pyspark_spark.queries.extended import _served_dv_table
from f1_bigdata_pyspark_spark.sources.snapshot_source import register
from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

print("== snapshot_served_dv_scan ==", flush=True)
root, q1 = t("table build (cached after 1st)", lambda: _served_dv_table(spark, sf_dir), n=1)
t("register(spark)", lambda: register(spark))
t("scan_stats", lambda: SnapshotTable(root).scan_stats(where=[("k", "<=", q1)]))
t("load() alone", lambda: spark.read.format("snapshot").option("root", root).load())


def _served_full():
    df = (
        spark.read.format("snapshot")
        .option("root", root)
        .load()
        .filter(F.col("k") <= q1)
        .groupBy("pr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    return df.collect()


t("load+filter+agg+collect", _served_full, n=5)

# raw-parquet twin for the fixed-cost comparison
files = SnapshotTable(root)._read_manifest(
    SnapshotTable(root).latest_version()
)["files"]


def _twin():
    df = (
        spark.read.parquet(*files)
        .filter(F.col("k") <= q1)
        .groupBy("pr")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    )
    return df.collect()


t("raw-parquet twin (no DV mask)", _twin, n=5)

# ---- snapshot_cdf_fold_serving phases --------------------------------------
from f1_bigdata_pyspark_spark.queries.extended import _cdf_fold_table
from f1_bigdata_pyspark_spark.sources.snapshots import read_row_changes_since

print("== snapshot_cdf_fold_serving ==", flush=True)
croot = t("table build (cached after 1st)", lambda: _cdf_fold_table(spark, sf_dir), n=1)
ct = SnapshotTable(croot)


def _feed_build():
    feed, _ = read_row_changes_since(spark, ct, None)
    return feed


t("feed plan build (driver only)", _feed_build, n=5)


def _fused():
    feed, _ = read_row_changes_since(spark, ct, None)
    return (
        feed.select("pr", "cents", "_change_type")
        .groupBy("pr", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("cents").cast("long"), F.lit(0)))
            .cast("long")
            .alias("s"),
        )
        .collect()
    )


t("feed build + fused agg + collect", _fused, n=5)

# ---- minhash signature build phases ----------------------------------------
from f1_bigdata_pyspark_spark.operators.dedup import (
    _P,
    _raw_shingles,
    band_table,
    minhash_signature_arrays,
)
from f1_bigdata_pyspark_spark.functions.text import md5_long
from f1_bigdata_pyspark_spark.utils import materialize

print("== minhash_lsh_candidates ==", flush=True)
docs = load_table(spark, sf_dir, "documents")
print(f"docs: {docs.count()}", flush=True)


def _shingle_hashes():
    raw = _raw_shingles(docs, "doc_id", "text", 3).select(
        "doc", (md5_long(F.col("s")) % _P).alias("xm")
    )
    raw.write.format("noop").mode("overwrite").save()


t("shingle+hash stream (noop)", _shingle_hashes, n=3)


def _sig_build():
    raw = _raw_shingles(docs, "doc_id", "text", 3).select(
        "doc", (md5_long(F.col("s")) % _P).alias("xm")
    )
    sig = minhash_signature_arrays(raw, 32)
    sig.write.format("noop").mode("overwrite").save()


t("signature build (noop)", _sig_build, n=3)


def _full_minhash():
    from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY

    return _REGISTRY["minhash_lsh_candidates"].fn(spark, sf_dir).collect()


t("full minhash query + collect", _full_minhash, n=3)
spark.stop()
