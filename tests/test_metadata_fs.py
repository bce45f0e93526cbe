"""Round 10: the snapshot METADATA plane behind the filesystem seam
(sources/metadata_fs.py) — the full table lifecycle must round-trip with
``HadoopMetadataFS``, i.e. every manifest read/write/list/unlink, clone
ref and vacuum walk going through ``org.apache.hadoop.fs.FileSystem``
(the in-tree ``file:`` implementation here; scheme'd stores resolve
through the same API). Commit atomicity maps to Hadoop's exclusive
``create(path, overwrite=false)``; the per-store contract (HDFS atomic,
S3A needs conditional writes) is documented in the module.
"""

from __future__ import annotations

import json
import os

import pytest

from f1_bigdata_pyspark_spark.sources.metadata_fs import (
    HadoopMetadataFS,
    LocalMetadataFS,
)
from f1_bigdata_pyspark_spark.sources.snapshots import (
    SnapshotConflictError,
    SnapshotTable,
    load_manifest,
    read_row_changes_since,
    vacuum,
)

SCHEMA = "k long, g long, v long"


def _mk(spark, tmp_path, fs, name="tbl", n=40):
    t = SnapshotTable(str(tmp_path / name), fs=fs)
    t.commit(
        spark.createDataFrame(
            [(i, i % 5, i * 10) for i in range(n)], SCHEMA
        ).repartition(2),
        mode="append",
    )
    return t


def test_hadoop_fs_primitives(spark, tmp_path):
    fs = HadoopMetadataFS(spark)
    p = str(tmp_path / "d" / "x.json")
    fs.makedirs(str(tmp_path / "d"))
    fs.put_if_absent(p, '{"a": 1}')
    assert json.loads(fs.read_text(p)) == {"a": 1}
    with pytest.raises(FileExistsError):
        fs.put_if_absent(p, "{}")
    fs.replace_atomic(p, '{"a": 2}')
    assert json.loads(fs.read_text(p)) == {"a": 2}
    assert fs.listdir(str(tmp_path / "d")) == ["x.json"]
    assert fs.exists(p) and fs.isdir(str(tmp_path / "d"))
    assert fs.getmtime(p) > 0
    walked = {
        os.path.join(d, f)
        for d, files in fs.walk_files(str(tmp_path / "d"))
        for f in files
    }
    assert walked == {p}
    fs.unlink(p)
    assert not fs.exists(p)
    with pytest.raises(FileNotFoundError):
        fs.read_text(p)


def test_snapshot_lifecycle_through_hadoop_fs(spark, tmp_path):
    fs = HadoopMetadataFS(spark)
    t = _mk(spark, tmp_path, fs)
    t.commit(
        spark.createDataFrame([(100, 0, 1)], SCHEMA).repartition(1),
        mode="append",
    )
    # the manifests on disk are readable by the POSIX implementation
    # too (same wire format, different transport)
    assert (
        load_manifest(t.root, 1, LocalMetadataFS())["files"]
        == t._read_manifest(1)["files"]
    )
    # merge-on-read DML + row feed, all metadata via the Hadoop API
    t.delete_where_mor(spark, [("g", "=", 2)])
    t.update_where_mor(spark, {"v": "v + 1"}, [("g", "=", 3)])
    want = sorted(
        [
            (i, i % 5, i * 10 + (1 if i % 5 == 3 else 0))
            for i in range(40)
            if i % 5 != 2
        ]
        + [(100, 0, 1)]
    )
    assert sorted(tuple(r) for r in t.read(spark).collect()) == want
    feed, cur = read_row_changes_since(spark, t, 1)
    assert cur == 3 and feed.count() == 8 + 2 * 8  # deletes + pre/post
    # optimistic-concurrency conflict surfaces through put_if_absent
    m = t._read_manifest(t.latest_version())
    with pytest.raises(SnapshotConflictError):
        t._publish(t.latest_version(), dict(m))
    # time travel intact
    assert t.read(spark, version=0).count() == 40


def test_compaction_and_vacuum_through_hadoop_fs(spark, tmp_path):
    fs = HadoopMetadataFS(spark)
    t = _mk(spark, tmp_path, fs)
    for i in range(4):
        t.commit(
            spark.createDataFrame([(200 + i, 0, 1)], SCHEMA).repartition(1),
            mode="append",
        )
    t.delete_where_mor(spark, [("k", "=", 0)])
    dropped = t.compact_log(every=10, keep_recent=2)
    assert dropped
    rep = vacuum(t, keep_versions=2, grace_seconds=0)
    assert rep["removed_manifests"] >= 1
    want = sorted([(i, i % 5, i * 10) for i in range(1, 40)] +
                  [(200 + i, 0, 1) for i in range(4)])
    assert sorted(tuple(r) for r in t.read(spark).collect()) == want
    # orphan walk through the seam
    assert t.orphan_files() == []


def test_clone_refs_through_hadoop_fs(spark, tmp_path):
    fs = HadoopMetadataFS(spark)
    src = _mk(spark, tmp_path, fs, name="src")
    clone = SnapshotTable(str(tmp_path / "clone"), fs=fs)
    clone.clone_from(src)
    assert clone.read(spark).count() == 40
    # the source's vacuum sees the clone's references via the seam
    src.commit(
        spark.createDataFrame([(300, 0, 1)], SCHEMA).repartition(1),
        mode="overwrite",
    )
    vacuum(src, keep_versions=1, grace_seconds=0)
    assert clone.read(spark).count() == 40  # clone still serves
