"""Round-9 incremental manifest wire format: non-checkpoint versions
publish O(changes) DELTA records (Delta Lake's log economics), every
``_CHECKPOINT_EVERY``-th version is a self-contained checkpoint, and
``load_manifest`` resolves either form to the identical complete dict.
The ops that unlink manifests (compact_log / vacuum) materialize every
retained delta as a checkpoint first, so no surviving version's base
chain can be severed.
"""

from __future__ import annotations

import json
import os

import pytest

from f1_bigdata_pyspark_spark.sources.snapshots import (
    _CHECKPOINT_EVERY,
    SnapshotTable,
    load_manifest,
    vacuum,
)


def _raw(t: SnapshotTable, v: int) -> dict:
    with open(t._manifest_path(v)) as f:
        return json.load(f)


def _synthetic_table(tmp_path, n_files: int) -> SnapshotTable:
    """A table of ``n_files`` registered (never-opened) paths with
    realistic per-file stats — publish_files is the Iceberg add_files
    face, so metadata scaling is testable without writing data."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    schema = (
        '{"type":"struct","fields":[{"name":"k","type":"long",'
        '"nullable":true,"metadata":{}}]}'
    )
    files = [str(tmp_path / f"ext/part-{i:05d}.parquet") for i in range(n_files)]
    stats = {
        f: {
            "k": {"min": ["num", i], "max": ["num", i + 1], "nc": 0, "nr": 10},
        }
        for i, f in enumerate(files)
    }
    t.publish_files(files, stats, mode="overwrite", schema_json=schema)
    return t


def test_append_commit_metadata_is_o_changeset(tmp_path):
    t = _synthetic_table(tmp_path, 2000)
    v0_bytes = os.path.getsize(t._manifest_path(0))
    add = [str(tmp_path / "ext/extra-0.parquet")]
    t.publish_files(
        add,
        {add[0]: {"k": {"min": ["num", 0], "max": ["num", 1]}}},
        mode="append",
    )
    v1_bytes = os.path.getsize(t._manifest_path(1))
    # the round-8 format rewrote all 2000 entries; the delta record
    # carries one file + small keys
    assert v1_bytes < v0_bytes * 0.05, (v0_bytes, v1_bytes)
    raw = _raw(t, 1)
    assert raw["delta_of"] == 0 and raw["files_add"] == add
    # resolution reproduces the complete manifest
    m = t._read_manifest(1)
    assert len(m["files"]) == 2001
    assert m["files"][-1] == add[0]
    assert len(m["stats"]) == 2001
    assert m["schema"]  # small keys carried verbatim


def test_checkpoint_cadence_and_resolution(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(5).withColumnRenamed("id", "k").repartition(1)
    for v in range(_CHECKPOINT_EVERY + 2):
        t.commit(df, mode="append")
    for v in t.versions():
        raw = _raw(t, v)
        if v % _CHECKPOINT_EVERY == 0:
            assert "delta_of" not in raw, v
        else:
            assert raw.get("delta_of") == v - 1, v
        m = t._read_manifest(v)
        assert len(m["files"]) == v + 1
        assert set(m["stats"]) == set(m["files"])
        assert m["version"] == v
    # every version stays readable end-to-end
    assert t.read(spark, version=3).count() == 20
    assert t.read(spark).count() == 5 * (_CHECKPOINT_EVERY + 2)


def test_dml_and_overwrite_resolve_through_deltas(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "k long, g long"
    ).repartition(3, "g")
    t.commit(df, mode="append")
    t.delete_where(spark, [("k", "<", 10)])  # v1: CoW delta
    assert sorted(r.k for r in t.read(spark).collect()) == list(range(10, 30))
    t.commit(
        spark.createDataFrame([(99, 9)], "k long, g long").repartition(1),
        mode="append",
    )  # v2
    assert t.read(spark).count() == 21
    t.commit(df.limit(5).repartition(1), mode="overwrite")  # v3
    assert t.read(spark).count() == 5
    # time travel across the delta chain
    assert t.read(spark, version=0).count() == 30
    assert t.read(spark, version=2).count() == 21
    # raw wire: v1..v3 are deltas (none is a checkpoint index)
    for v in (1, 2, 3):
        assert _raw(t, v).get("delta_of") == v - 1


def test_compact_log_materializes_retained_deltas(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(3).withColumnRenamed("id", "k").repartition(1)
    for _ in range(6):
        t.commit(df, mode="append")  # v0..v5; v1..v5 deltas
    dropped = t.compact_log(every=3, keep_recent=2)
    assert dropped == [1, 2]
    # every retained version resolves even though its base chain was cut
    for v in t.versions():
        m = t._read_manifest(v)
        assert len(m["files"]) == v + 1
        assert "delta_of" not in _raw(t, v)  # materialized as checkpoint
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=1)
    assert t.read(spark).count() == 18


def test_vacuum_materializes_kept_deltas(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.range(4).withColumnRenamed("id", "k").repartition(1)
    for _ in range(5):
        t.commit(df, mode="overwrite")  # v0..v4, each 1 live file
    rep = vacuum(t, keep_versions=2, grace_seconds=0.0)
    assert rep["removed_manifests"] == 3
    vs = t.versions()
    assert vs == [3, 4]
    for v in vs:
        assert "delta_of" not in _raw(t, v)
        assert t.read(spark, version=v).count() == 4
    # overwritten files physically gone, live ones intact
    assert rep["removed_files"] >= 3


def test_clone_and_stream_survive_delta_head(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "src"))
    df = spark.range(7).withColumnRenamed("id", "k").repartition(1)
    t.commit(df, mode="append")
    t.commit(df, mode="append")  # head v1 is a delta record
    clone = SnapshotTable(str(tmp_path / "clone"))
    clone.clone_from(t)
    assert clone.read(spark).count() == 14
    assert "delta_of" not in _raw(clone, 0)  # clone v0 is a checkpoint
    # the DataSource batch face plans from the resolved head too
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    got = (
        spark.read.format("snapshot")
        .option("root", t.root)
        .load()
        .count()
    )
    assert got == 14


def test_delta_encoder_declines_exotic_shapes(tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshots import (
        _encode_manifest_delta,
    )

    base = {"version": 0, "files": ["a", "b"], "stats": {}}
    # reordered carried files are not delta-expressible
    assert (
        _encode_manifest_delta(
            {"version": 1, "files": ["b", "a"], "stats": {}}, base
        )
        is None
    )
    # a stats key outside the file set is not delta-expressible
    assert (
        _encode_manifest_delta(
            {"version": 1, "files": ["a", "b"], "stats": {"zz": {}}}, base
        )
        is None
    )
    # the plain append shape is
    d = _encode_manifest_delta(
        {"version": 1, "files": ["a", "b", "c"], "stats": {"c": {"k": {}}}},
        base,
    )
    assert d["files_add"] == ["c"] and d["files_remove"] == []
    assert d["stats_set"] == {"c": {"k": {}}}
