#!/usr/bin/env python
"""Capture .explain("formatted") for every bench query -> plans/r12/<q>_<tag>.txt.

Usage: python scripts_r12/capture_plans.py <tag> [query ...]
Runs on the same tuned session bench.py uses, at sf0.1.

r12: the two snapshot serving faces return LocalRelations (their work
happens inside the function), so for them this script ALSO captures the
INTERNAL plan that actually executes — the single fused aggregation over
the change feed for snapshot_cdf_fold_serving (``<q>_internal_<tag>.txt``)
— closing round-11 verdict item 8 (the r11 dumps were uninformative
LocalRelation stubs).
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = set(sys.argv[2:])

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.queries.registry import _REGISTRY
from f1_bigdata_pyspark_spark.session import env_sf_dir, get_spark

sf_dir = env_sf_dir()
spark = get_spark(app_name="plan-capture")
out_dir = os.path.join("/root/repo/plans/r12")
os.makedirs(out_dir, exist_ok=True)


def dump(df, name: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"WROTE {path} ({len(buf.getvalue())} bytes)", flush=True)


def cdf_fold_internal():
    """The fused single-pass aggregation snapshot_cdf_fold_serving actually
    executes (its returned frame is a LocalRelation)."""
    from f1_bigdata_pyspark_spark.queries.extended import _cdf_fold_table
    from f1_bigdata_pyspark_spark.sources.snapshots import (
        SnapshotTable,
        read_row_changes_since,
    )

    root = _cdf_fold_table(spark, sf_dir)
    feed, _ = read_row_changes_since(spark, SnapshotTable(root), None)
    return (
        feed.select("pr", "cents", "_change_type")
        .groupBy("pr", "_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("cents").cast("long"), F.lit(0)))
            .cast("long")
            .alias("s"),
        )
    )


def cdf_fold_internal_r11_checkpoint_pass():
    """The r11 shape's FIRST pass — the projected feed that
    localCheckpoint materialized before the two consumer jobs ran over
    the checkpoint. Captured as the 'before' internal plan (the r11
    plans/ dump for this face was a LocalRelation stub)."""
    from f1_bigdata_pyspark_spark.queries.extended import _cdf_fold_table
    from f1_bigdata_pyspark_spark.sources.snapshots import (
        SnapshotTable,
        read_row_changes_since,
    )

    root = _cdf_fold_table(spark, sf_dir)
    feed, _ = read_row_changes_since(spark, SnapshotTable(root), None)
    return feed.select("pr", "cents", "_change_type")


for q in _REGISTRY.values():
    if not q.bench or (only and q.name not in only):
        continue
    df = q.fn(spark, sf_dir)
    dump(df, q.name)
    if q.name == "snapshot_cdf_fold_serving":
        if tag == "before":
            dump(
                cdf_fold_internal_r11_checkpoint_pass(),
                "snapshot_cdf_fold_serving_internal",
            )
        else:
            dump(cdf_fold_internal(), "snapshot_cdf_fold_serving_internal")
spark.stop()
