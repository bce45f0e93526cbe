"""Streaming change data feed (round 10) — ``readChangeFeed`` on the
snapshot DataSource: version-offset micro-batches of row-level changes
across the merge-on-read DML family, consumed live by Structured
Streaming. The batch feed (``read_row_changes_since``) is the semantic
reference: a full streaming drain must deliver the identical multiset.
"""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.sources.snapshots import (
    SnapshotTable,
    read_row_changes_since,
)

SCHEMA = "k long, g long, v long"


def _mk(spark, tmp_path, n=40, parts=2, name="tbl"):
    t = SnapshotTable(str(tmp_path / name))
    t.commit(
        spark.createDataFrame(
            [(i, i % 5, i * 10) for i in range(n)], SCHEMA
        ).repartition(parts),
        mode="append",
    )
    return t


def _drain(spark, root, ckpt, collector):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)

    def sink(batch_df, _bid):
        collector.extend(tuple(r) for r in batch_df.collect())

    q = (
        spark.readStream.format("snapshot")
        .option("root", root)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_streaming_cdf_matches_batch_feed(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.commit(
        spark.createDataFrame([(100, 0, 7)], SCHEMA).repartition(1),
        mode="append",
    )
    t.delete_where_mor(spark, [("g", "=", 2)])
    t.update_where_mor(spark, {"v": "v + 1"}, [("g", "=", 3)])
    t.delete_keys(
        spark,
        spark.createDataFrame([(k,) for k in (0, 5, 100)], "k long"),
        ["k"],
    )
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    batch, _ = read_row_changes_since(spark, t, None)
    want = Counter(tuple(r) for r in batch.collect())
    assert Counter(got) == want
    # spot-check the semantics: key 0 was live (g=0, not yet deleted) —
    # the tombstone delete emits it exactly once; key 10 (g=0) survives
    dels = [r for r in got if r[3] == "delete"]
    assert sum(1 for r in dels if r[0] == 0) == 1
    assert all(r[0] != 10 for r in dels)


def test_streaming_cdf_resumes_from_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20)
    got: list = []
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, t.root, ckpt, got)
    n_first = len(got)
    assert n_first == 20 and all(r[3] == "insert" for r in got)
    # more DML, same checkpoint: only the NEW changes arrive
    t.delete_where_mor(spark, [("k", "<", 3)])
    t.commit(
        spark.createDataFrame([(200, 1, 1)], SCHEMA).repartition(1),
        mode="append",
    )
    _drain(spark, t.root, ckpt, got)
    new = got[n_first:]
    assert Counter((r[0], r[3]) for r in new) == Counter(
        [(0, "delete"), (1, "delete"), (2, "delete"), (200, "insert")]
    )
    assert {r[4] for r in new} == {1, 2}  # commit versions ride along


def test_streaming_cdf_update_images_pair_up(spark, tmp_path):
    t = _mk(spark, tmp_path, n=30)
    t.update_where_mor(spark, {"v": "v * 2"}, [("g", "=", 4)])
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    pre = {r[0]: r[2] for r in got if r[3] == "update_preimage"}
    post = {r[0]: r[2] for r in got if r[3] == "update_postimage"}
    assert set(pre) == set(post) == {i for i in range(30) if i % 5 == 4}
    for k in pre:
        assert post[k] == pre[k] * 2


def test_streaming_cdf_skips_maintenance_and_refuses_rewrites(
    spark, tmp_path
):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    t = _mk(spark, tmp_path, n=60, parts=3)
    for i in range(10):
        t.delete_where_mor(spark, [("k", "=", i)])
    t.consolidate_deletion_vectors(spark, max_records=4)
    t.refresh_stats(spark)
    # maintenance versions plan ZERO partitions beyond the deletes
    parts = _plan_cdf_partitions(t.root, 10, t.latest_version())
    assert parts == []
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    state = Counter()
    for r in got:
        key = r[:3]
        if r[3] in ("insert", "update_postimage"):
            state[key] += 1
        else:
            state[key] -= 1
    live = Counter(
        tuple(x) for x in t.read(spark).select("k", "g", "v").collect()
    )
    assert Counter({k: n for k, n in state.items() if n}) == live
    # round 11: a CoW rewrite now STREAMS (its commit wrote change-data
    # files) — the refusal survives only for rewrites WITHOUT recorded
    # images: plain OPTIMIZE republishes mode 'overwrite' with no
    # change_data (row-preserving, but the stream can't prove that by
    # diffing) — explicit error, not silence
    t.delete_where(spark, [("k", ">=", 50)])
    parts = _plan_cdf_partitions(
        t.root, t.latest_version() - 1, t.latest_version()
    )
    assert parts, "CoW delete must plan its change-data partitions"
    t.optimize(spark, ["k"], target_files=1)
    with pytest.raises(ValueError, match="no change-data files"):
        _plan_cdf_partitions(t.root, t.latest_version() - 1, t.latest_version())


def test_batch_cdf_read_matches_feed_function(spark, tmp_path):
    """Round 11 (Delta table_changes parity): a BATCH read with
    readChangeFeed delivers the same multiset as
    read_row_changes_since, over both the full history and a bounded
    [startingVersion, endingVersion] window."""
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=30)
    t.delete_where_mor(spark, [("g", "=", 2)])  # v1
    t.delete_where(spark, [("k", ">=", 25)])  # v2 (CoW: image files)
    t.update_where_mor(spark, {"v": "v + 1"}, [("g", "=", 0)])  # v3
    full = (
        spark.read.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .load()
        .collect()
    )
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(tuple(r) for r in full) == Counter(
        tuple(r) for r in batch.collect()
    )
    window = (
        spark.read.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "2")
        .option("endingVersion", "2")
        .load()
        .collect()
    )
    assert {r["_commit_version"] for r in window} == {2}
    # k=27 (g=2) was already dead at v1 — the CoW delete's images name
    # only the rows it actually removed
    assert Counter(r["_change_type"] for r in window) == Counter(
        {"delete": 4}
    )
    assert {r["k"] for r in window} == {25, 26, 28, 29}


def test_batch_cdf_projection_pushdown(spark, tmp_path):
    """``columns`` narrows the CDF schema (round 11 projection
    pushdown); values still agree with the full-width feed, and the
    masks/selections keep working on the dropped columns."""
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=20)
    t.delete_keys(
        spark,
        spark.createDataFrame([(k,) for k in (0, 5)], "k long"),
        ["k"],
    )
    t.update_where(spark, {"v": "v + 3"}, [("g", "=", 1)])
    narrow = (
        spark.read.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("columns", "v")
        .load()
    )
    assert narrow.columns == ["v", "_change_type", "_commit_version"]
    full, _ = read_row_changes_since(spark, t, None)
    want = Counter(
        (r["v"], r["_change_type"], r["_commit_version"])
        for r in full.collect()
    )
    assert Counter(tuple(r) for r in narrow.collect()) == want


def test_batch_cdf_bounds_validated(spark, tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=10, parts=1)
    t.delete_where_mor(spark, [("k", "=", 1)])
    with pytest.raises(Exception, match="endingVersion"):
        spark.read.format("snapshot").option("root", t.root).option(
            "readChangeFeed", "true"
        ).option("endingVersion", "99").load().collect()


def test_streaming_cdf_starting_version(spark, tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=20)  # v0
    t.delete_where_mor(spark, [("k", "<", 3)])  # v1
    t.commit(
        spark.createDataFrame([(300, 1, 1)], SCHEMA).repartition(1),
        mode="append",
    )  # v2
    got: list = []

    def sink(batch_df, _bid):
        got.extend(tuple(r) for r in batch_df.collect())

    q = (
        spark.readStream.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # NO initial snapshot: only v1's deletes and v2's insert
    assert Counter((r[0], r[3]) for r in got) == Counter(
        [(0, "delete"), (1, "delete"), (2, "delete"), (300, "insert")]
    )


def test_streaming_cdf_on_hive_partitioned_table(spark, tmp_path):
    """Streaming CDF over a Hive-partitioned table with a URI-hostile
    partition value: directory-recovered values ride the feed rows, and
    the DV position selection matches the manifest's disk spelling."""
    t = SnapshotTable(str(tmp_path / "ptbl"))
    df = spark.createDataFrame(
        [(i, "a b" if i % 2 == 0 else "plain", i * 10) for i in range(20)],
        "k long, g string, v long",
    )
    t.commit(df.repartition(1), mode="append", partition_by=["g"])
    t.delete_where_mor(spark, [("k", "<", 4)])
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(got) == Counter(tuple(r) for r in batch.collect())
    dels = {(r[0], r[1]) for r in got if r[3] == "delete"}
    assert dels == {(0, "a b"), (1, "plain"), (2, "a b"), (3, "plain")}


def test_streaming_cdf_additive_evolution_across_restarts(spark, tmp_path):
    """Additive schema evolution between RUNS of a checkpointed feed:
    each run's fresh load() re-resolves the table schema, so the second
    run reports the widened row (extra column included) while the
    planner's prefix guard still rejects renames/drops. Within one run
    the schema is fixed (availableNow plans once)."""
    t = _mk(spark, tmp_path, n=10)
    got: list = []
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, t.root, ckpt, got)
    assert all(len(r) == 5 for r in got)  # k,g,v + the 2 CDF cols
    t.commit(
        spark.createDataFrame(
            [(500, 1, 2, "x")], SCHEMA + ", extra string"
        ).repartition(1),
        mode="append",
        merge_schema=True,
    )
    _drain(spark, t.root, ckpt, got)
    new = [r for r in got if r[0] == 500]
    assert len(new) == 1 and len(new[0]) == 6  # + extra
    assert new[0][3] == "x" and new[0][4] == "insert"


def test_streaming_cdf_reinserted_tombstoned_key(spark, tmp_path):
    """delete_keys then re-insert of the same key: the re-insert's file
    POSTDATES the tombstone (seq scoping), so the feed emits delete(k)
    then insert(k) and a folded state keeps the new row live."""
    t = _mk(spark, tmp_path, n=10)
    t.delete_keys(
        spark, spark.createDataFrame([(0,)], "k long"), ["k"]
    )
    t.commit(
        spark.createDataFrame([(0, 0, 999)], SCHEMA).repartition(1),
        mode="append",
    )
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    k0 = {(r[2], r[3], r[4]) for r in got if r[0] == 0}
    assert k0 == {(0, "insert", 0), (0, "delete", 1), (999, "insert", 2)}


def _gapped_table(spark, tmp_path):
    """v0 commit, v1 delete-dv (dropped by compact_log), v2+v3 appends
    retained — the surviving manifests show masks that appeared inside
    the compacted gap."""
    t = _mk(spark, tmp_path, n=20)  # v0 (retained: checkpoint)
    t.delete_where_mor(spark, [("k", "<", 3)])  # v1 -> dropped
    t.commit(
        spark.createDataFrame([(400, 1, 1)], SCHEMA).repartition(1),
        mode="append",
    )  # v2
    t.commit(
        spark.createDataFrame([(401, 1, 1)], SCHEMA).repartition(1),
        mode="append",
    )  # v3
    dropped = t.compact_log(every=10, keep_recent=2)
    assert dropped == [1]
    return t


def test_streaming_cdf_refuses_delete_hidden_in_compacted_gap(
    spark, tmp_path
):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    t = _gapped_table(spark, tmp_path)
    with pytest.raises(ValueError, match="cannot attribute"):
        _plan_cdf_partitions(t.root, 0, 3)
    # the BATCH feed diffs states instead of trusting modes: a replay
    # from the same cursor stays exact across the same gap
    from collections import Counter as C

    feed, _ = read_row_changes_since(spark, t, 0)
    state = C()
    for r in feed.collect():
        state[(r.k, r.g, r.v)] += (
            1 if r["_change_type"] in ("insert", "update_postimage") else -1
        )
    base = C((r.k, r.g, r.v) for r in t.read(spark, version=0).collect())
    base.update({k: n for k, n in state.items() if n > 0})
    for k, n in list(state.items()):
        if n < 0:
            base[k] += n
    live = C((r.k, r.g, r.v) for r in t.read(spark).collect())
    assert C({k: n for k, n in base.items() if n}) == live


def test_streaming_cdf_accepts_append_only_gap(spark, tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    t = _mk(spark, tmp_path, n=10)  # v0
    for i in range(3):  # v1..v3 appends; v1 dropped by compact_log
        t.commit(
            spark.createDataFrame([(500 + i, 1, 1)], SCHEMA).repartition(1),
            mode="append",
        )
    t.compact_log(every=10, keep_recent=2)
    parts = _plan_cdf_partitions(t.root, 0, 3)
    # all three appended files surface as inserts despite the gap
    assert len(parts) == 3
    assert {p.partition_values["_change_type"] for p in parts} == {"insert"}


def test_batch_cdf_filter_pushdown_prunes_partitions(spark, tmp_path):
    """Round 11 stretch: a pushed predicate reaches the CDF planner —
    files the owning manifest proves empty for the conjunction plan NO
    partition, and the filtered result still matches the feed."""
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
        register,
    )

    register(spark)
    t = SnapshotTable(str(tmp_path / "tbl"))
    # three key-range files (disjoint min/max evidence)
    for lo in (0, 100, 200):
        t.commit(
            spark.createDataFrame(
                [(k, k % 5, k * 10) for k in range(lo, lo + 50)], SCHEMA
            ).repartition(1),
            mode="append",
        )
    t.delete_where(spark, [("k", ">=", 240)])  # CoW delete: image file
    # planner-level: k <= 50 proves the 100- and 200-range files (and
    # the delete's images, all k >= 240) empty
    all_parts = _plan_cdf_partitions(t.root, -1, t.latest_version())
    pruned = _plan_cdf_partitions(
        t.root, -1, t.latest_version(), where=[("k", "<=", 50)]
    )
    assert len(pruned) < len(all_parts)
    assert len(pruned) == 1  # only the 0-49 file survives
    # end-to-end through the engine's pushdown hook
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("snapshot")
            .option("root", t.root)
            .option("readChangeFeed", "true")
            .load()
            .filter(F.col("k") <= 50)
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    batch, _ = read_row_changes_since(spark, t, None)
    want = Counter(
        tuple(r) for r in batch.filter(F.col("k") <= 50).collect()
    )
    assert Counter(tuple(r) for r in got) == want
    assert len(got) == 50  # k in [0, 49]: inserts only


def test_cdf_admission_walk_version_granular(spark, tmp_path):
    """maxVersionsPerTrigger (round 11): the Simple CDF reader admits at
    most K versions past the GIVEN start — a consumer far behind drains
    in bounded, version-atomic epochs; restart capping is exact."""
    from pyspark.sql.types import StructType

    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        SnapshotCDFSimpleStreamReader,
    )

    t = _mk(spark, tmp_path, n=10, parts=1)  # v0
    t.delete_where_mor(spark, [("k", "<", 2)])  # v1
    t.delete_where(spark, [("k", "=", 5)])  # v2 (CoW images)
    t.commit(
        spark.createDataFrame([(100, 0, 1)], SCHEMA).repartition(1),
        mode="append",
    )  # v3
    schema = StructType.fromDDL(
        "k long, g long, v long, _change_type string, _commit_version long"
    )
    r = SnapshotCDFSimpleStreamReader(t.root, schema, max_versions=2)
    assert r.initialOffset() == {"version": -1}
    it, end = r.read({"version": -1})
    rows1 = list(it)
    assert end == {"version": 1}  # baseline (v0) + v1 = 2 versions
    assert {r_[4] for r_ in rows1} == {0, 1}
    it, end = r.read(end)
    rows2 = list(it)
    assert end == {"version": 3}
    assert {r_[4] for r_ in rows2} == {2, 3}
    # caught up
    it, end2 = r.read(end)
    assert end2 == end and list(it) == []
    # restart from a checkpointed mid-position caps exactly
    r2 = SnapshotCDFSimpleStreamReader(t.root, schema, max_versions=1)
    it, end = r2.read({"version": 1})
    assert end == {"version": 2}
    assert {(x[0], x[3]) for x in it} == {(5, "delete")}
    # the full multiset equals the uncapped feed
    everything = rows1 + rows2
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(tuple(x) for x in everything) == Counter(
        tuple(x) for x in batch.collect()
    )


def test_cdf_admission_through_engine(spark, tmp_path):
    """End-to-end: readStream + readChangeFeed + maxVersionsPerTrigger
    routes through the Simple reader and drains the same multiset."""
    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=12, parts=1)
    t.delete_where(spark, [("g", "=", 1)])
    t.update_where_mor(spark, {"v": "v + 2"}, [("g", "=", 2)])
    got: list = []

    def sink(batch_df, _bid):
        got.extend(tuple(r) for r in batch_df.collect())

    batches: list[int] = []

    def sink2(batch_df, _bid):
        rows = [tuple(r) for r in batch_df.collect()]
        if rows:
            batches.append(len({r[4] for r in rows}))
        got.extend(rows)

    q = (
        spark.readStream.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(sink2)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(got) == Counter(tuple(r) for r in batch.collect())
    # version-granular: every non-empty micro-batch held exactly 1 version
    assert batches and all(b == 1 for b in batches)
    assert len(batches) == 3  # baseline + CoW delete + MoR update


def test_cdf_admission_option_validation(spark, tmp_path):
    from pyspark.sql.types import StructType

    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        SnapshotDataSource,
    )

    t = _mk(spark, tmp_path, n=5, parts=1)
    schema = StructType.fromDDL("k long, g long, v long")
    # file/byte budgets are refused for the CDF (no byte meta on images)
    ds = SnapshotDataSource(
        {
            "root": t.root,
            "readChangeFeed": "true",
            "maxFilesPerTrigger": "2",
        }
    )
    with pytest.raises(ValueError, match="maxVersionsPerTrigger"):
        ds.streamReader(schema)
    # version budget on a PLAIN stream is a spelling error, not a no-op
    ds2 = SnapshotDataSource(
        {"root": t.root, "maxVersionsPerTrigger": "2"}
    )
    with pytest.raises(ValueError, match="maxVersionsPerTrigger applies"):
        ds2.streamReader(schema)


def test_batch_cdf_timestamp_bounds(spark, tmp_path):
    """startingTimestamp / endingTimestamp resolve to versions by commit
    time (Delta parity): first-at-or-after for the start, last-at-or-
    before for the end."""
    import time as _time

    from f1_bigdata_pyspark_spark.sources.snapshot_source import register

    register(spark)
    t = _mk(spark, tmp_path, n=6, parts=1)  # v0
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    t.delete_where(spark, [("k", "=", 1)])  # v1
    _time.sleep(0.05)
    after_v1 = _time.time()
    _time.sleep(0.05)
    t.commit(
        spark.createDataFrame([(100, 0, 1)], SCHEMA).repartition(1),
        mode="append",
    )  # v2
    rows = (
        spark.read.format("snapshot")
        .option("root", t.root)
        .option("readChangeFeed", "true")
        .option("startingTimestamp", str(mid))
        .option("endingTimestamp", str(after_v1))
        .load()
        .collect()
    )
    assert {r["_commit_version"] for r in rows} == {1}
    assert [(r["k"], r["_change_type"]) for r in rows] == [(1, "delete")]
    with pytest.raises(Exception, match="startingVersion OR startingTimestamp"):
        spark.read.format("snapshot").option("root", t.root).option(
            "readChangeFeed", "true"
        ).option("startingVersion", "1").option(
            "startingTimestamp", str(mid)
        ).load().collect()
    import time as _t

    with pytest.raises(Exception, match="after the latest commit"):
        spark.read.format("snapshot").option("root", t.root).option(
            "readChangeFeed", "true"
        ).option("startingTimestamp", str(_t.time() + 3600)).load().collect()
