"""Round-10 ADVICE fixes, each pinned by the repro from the review:

1. fresh-stream baseline partitions carry tombstones/deletion vectors
   (a compacted log's earliest retained manifest may hold live masks);
2. merge-on-read DML under URI-hostile partition values ("a b", "c%d",
   "a+b"): ``__dv_file`` now decodes ``_metadata.file_path``'s percent
   encoding back to the manifest's disk spelling, and update_where_mor
   gained the same stray-address guard delete_where_mor had;
3. ``load_manifest`` retries the top manifest once when a concurrent
   compact_log/vacuum severs a delta chain mid-resolution;
4. ``served_read`` keeps columns referenced only inside subquery
   expressions (and falls back to the full-width plan on analysis
   failure rather than breaking a pure caller).
"""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.sources.snapshots import (
    SnapshotTable,
    load_manifest,
    vacuum,
)


def _mk(spark, tmp_path, n=60, parts=3, name="tbl"):
    t = SnapshotTable(str(tmp_path / name))
    df = spark.createDataFrame(
        [(i, i % 5, f"u{i}") for i in range(n)], "k long, g long, name string"
    )
    t.commit(df.repartition(parts), mode="append")
    return t


# -- 1: fresh-stream baseline masking ---------------------------------------


def _fresh_stream_rows(spark, root, **opts):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_added_partitions,
        _read_partition_batches,
    )
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(
        json.loads(
            load_manifest(root, max(
                int(f[1:-5])
                for f in os.listdir(os.path.join(root, "_manifests"))
                if f.startswith("v") and f.endswith(".json")
            ))["schema"]
        )
    )
    rows = []
    vs = [
        int(f[1:-5])
        for f in os.listdir(os.path.join(root, "_manifests"))
        if f.startswith("v") and f.endswith(".json")
    ]
    for p in _plan_added_partitions(root, -1, max(vs), **opts):
        for batch in _read_partition_batches(schema, p):
            rows.extend(zip(*(c.to_pylist() for c in batch.columns)))
    return rows


def test_fresh_stream_baseline_applies_deletion_vectors(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_where_mor(spark, [("g", "=", 2)])
    # vacuum away v0 so the EARLIEST RETAINED manifest carries live dvs
    t.commit(
        spark.createDataFrame(
            [(1000, 7, "x")], "k long, g long, name string"
        ).repartition(1),
        mode="append",
    )
    vacuum(t, keep_versions=2, grace_seconds=1e9)  # manifests only
    want = sorted([i for i in range(60) if i % 5 != 2] + [1000])
    got = sorted(r[0] for r in _fresh_stream_rows(spark, t.root))
    assert got == want  # deleted rows must NOT surface as live


def test_fresh_stream_baseline_applies_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.delete_keys(
        spark,
        spark.createDataFrame([(k,) for k in range(0, 60, 7)], "k long"),
        ["k"],
    )
    t.commit(
        spark.createDataFrame(
            [(2000, 1, "y")], "k long, g long, name string"
        ).repartition(1),
        mode="append",
    )
    vacuum(t, keep_versions=2, grace_seconds=1e9)  # manifests only
    want = sorted([i for i in range(60) if i % 7 != 0] + [2000])
    got = sorted(r[0] for r in _fresh_stream_rows(spark, t.root))
    assert got == want


def test_mid_stream_dv_delete_passes_under_ignore_deletes(spark, tmp_path):
    # incremental consumption across a delete-dv version with
    # ignoreDeletes: already-delivered rows may be stale (documented),
    # but the planner must not raise and must deliver the new append
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_added_partitions,
    )

    t = _mk(spark, tmp_path)
    t.delete_where_mor(spark, [("g", "=", 1)])
    t.commit(
        spark.createDataFrame(
            [(3000, 0, "z")], "k long, g long, name string"
        ).repartition(1),
        mode="append",
    )
    parts = _plan_added_partitions(t.root, 0, 2, ignore_deletes=True)
    assert len(parts) == 1  # only the appended file


# -- 2: MoR DML under URI-hostile partition values ---------------------------


@pytest.mark.parametrize("val", ["a b", "c%d", "a+b", "é x"])
def test_mor_delete_under_encoded_partition_values(spark, tmp_path, val):
    t = SnapshotTable(str(tmp_path / "enc"))
    df = spark.createDataFrame(
        [(i, val if i % 2 == 0 else "plain") for i in range(20)],
        "k long, g string",
    )
    t.commit(df.repartition(1), mode="append", partition_by=["g"])
    rep = t.delete_where_mor(spark, [("k", "<", 6)])
    assert rep["rows_deleted"] == 6 and rep["files_rewritten"] == 0
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(6, 20))
    # the DataSource serving path applies the same vector
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    ds = spark.read.format("snapshot").option("root", t.root).load()
    assert sorted(r.k for r in ds.collect()) == list(range(6, 20))


def test_mor_update_under_encoded_partition_values(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "encu"))
    df = spark.createDataFrame(
        [(i, "a b" if i % 2 == 0 else "plain", i * 10) for i in range(20)],
        "k long, g string, v long",
    )
    t.commit(df.repartition(1), mode="append", partition_by=["g"])
    rep = t.update_where_mor(spark, {"v": "v + 1"}, [("k", "<", 4)])
    assert rep["rows_updated"] == 4
    got = {r.k: r.v for r in t.read(spark).collect()}
    assert len(got) == 20  # no duplication: old images masked
    for k, v in got.items():
        assert v == k * 10 + (1 if k < 4 else 0)


def test_update_where_mor_stray_guard(spark, tmp_path, monkeypatch):
    # force the address mismatch the guard exists for: corrupt the
    # normalization so every __dv_file misses the manifest spelling
    t = _mk(spark, tmp_path)
    base = t.latest_version()
    orig = SnapshotTable._plan_scan

    def broken(self, spark_, manifest, files, **kw):
        df = orig(self, spark_, manifest, files, **kw)
        if "__dv_file" in df.columns:
            df = df.withColumn(
                "__dv_file", F.concat(F.lit("/bogus"), F.col("__dv_file"))
            )
        return df

    monkeypatch.setattr(SnapshotTable, "_plan_scan", broken)
    with pytest.raises(RuntimeError, match="non-snapshot files"):
        t.update_where_mor(spark, {"name": "'z'"}, [("g", "=", 2)])
    monkeypatch.setattr(SnapshotTable, "_plan_scan", orig)
    # nothing published, no new images serve: reads are unchanged
    assert t.latest_version() == base
    assert t.read(spark).count() == 60


# -- 3: load_manifest race retry ---------------------------------------------


def test_load_manifest_retries_after_concurrent_checkpoint(
    spark, tmp_path, monkeypatch
):
    import f1_bigdata_pyspark_spark.sources.snapshots as snaps

    t = _mk(spark, tmp_path)
    for i in range(3):  # v1..v3 are delta records (checkpoint every 10)
        t.commit(
            spark.createDataFrame(
                [(100 + i, 0, "a")], "k long, g long, name string"
            ).repartition(1),
            mode="append",
        )
    raw = json.load(open(t._manifest_path(3)))
    assert "delta_of" in raw
    expect = t._read_manifest(3)

    # simulate the race: the resolver hits a severed base AFTER the
    # compactor checkpointed the top — one retry must succeed
    calls = {"n": 0}
    orig = snaps._load_manifest_resolved

    def flaky(root, version, fs):
        if calls["n"] == 0:
            calls["n"] += 1
            t._checkpoint_manifest(3)  # the concurrent compactor
            raise FileNotFoundError("base unlinked mid-resolution")
        return orig(root, version, fs)

    monkeypatch.setattr(snaps, "_load_manifest_resolved", flaky)
    got = load_manifest(t.root, 3)
    assert got["files"] == expect["files"]
    assert calls["n"] == 1


def test_load_manifest_still_fails_on_true_severed_chain(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit(
        spark.createDataFrame(
            [(500, 0, "a")], "k long, g long, name string"
        ).repartition(1),
        mode="append",
    )
    os.unlink(t._manifest_path(0))  # sever WITHOUT checkpointing the top
    with pytest.raises(FileNotFoundError):
        load_manifest(t.root, 1)


# -- 4: served_read subquery references --------------------------------------


def test_served_read_keeps_subquery_only_columns(spark, tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        register,
        served_read,
    )

    register(spark)
    t = SnapshotTable(str(tmp_path / "sub"))
    t.commit(
        spark.createDataFrame(
            [(i, float(i % 7), i * 2) for i in range(40)],
            "a long, b double, c long",
        ).repartition(2),
        mode="append",
    )

    def build(scan):
        scan.createOrReplaceTempView("served_sub_t")
        # b is referenced ONLY inside the scalar subquery
        return spark.sql(
            "SELECT a FROM served_sub_t "
            "WHERE b > (SELECT avg(b) FROM served_sub_t)"
        )

    got = sorted(r.a for r in served_read(spark, t.root, build).collect())
    want = sorted(
        i for i in range(40) if (i % 7) > sum(i % 7 for i in range(40)) / 40
    )
    assert got == want


def test_plain_stream_refuses_delete_hidden_in_compacted_gap(
    spark, tmp_path
):
    """A delete-dv dropped by compact_log leaves retained manifests
    whose MASKS changed under an 'append' mode — the strict stream must
    refuse (silently serving rows the consumer believes live violates
    the append-only contract); ignoreDeletes accepts it (that IS the
    relaxed contract) and delivers only the appended files."""
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_added_partitions,
    )

    t = _mk(spark, tmp_path, n=20)  # v0
    t.delete_where_mor(spark, [("k", "<", 3)])  # v1 -> dropped
    for i in range(2):  # v2, v3
        t.commit(
            spark.createDataFrame(
                [(600 + i, 1, "z")], "k long, g long, name string"
            ).repartition(1),
            mode="append",
        )
    dropped = t.compact_log(every=10, keep_recent=2)
    assert dropped == [1]
    with pytest.raises(ValueError, match="compacted away"):
        _plan_added_partitions(t.root, 0, 3)
    parts = _plan_added_partitions(t.root, 0, 3, ignore_deletes=True)
    assert len(parts) == 2
