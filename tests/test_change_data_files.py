"""Round 11 — CHANGE DATA FILES at commit time (Delta's ``_change_data``
mechanism): every copy-on-write DML (delete_where / update_where / merge /
replace_where) records its exact row images as parquet beside the commit,
overwrite and rollback do so on opt-in, and BOTH change feeds consume the
recorded images:

- the STREAMING feed (``readChangeFeed``) stops refusing CoW versions —
  it is now total over the DML matrix this codebase's writers produce,
- the BATCH feed (``read_row_changes_since``) reads the images instead of
  re-deriving them with a two-sided multiset diff.

The master property stays the round-10 one: a full streaming drain of a
MIXED MoR+CoW history delivers the identical multiset to the batch feed,
and replaying either reproduces ``table.read`` exactly.
"""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from f1_bigdata_pyspark_spark.sources.snapshots import (
    SnapshotTable,
    read_row_changes_since,
    vacuum,
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


def _fold(rows):
    """Fold CDF rows (k, g, v, _change_type, _commit_version) into the
    live multiset, asserting no negative multiplicities."""
    state: Counter = Counter()
    for r in sorted(rows, key=lambda x: x[4]):
        key = r[:3]
        if r[3] in ("insert", "update_postimage"):
            state[key] += 1
        else:
            state[key] -= 1
    assert all(n >= 0 for n in state.values()), "negative multiplicity"
    return Counter({k: n for k, n in state.items() if n})


def test_streaming_total_over_mixed_mor_cow_gauntlet(spark, tmp_path):
    """The round-10 verdict's 'done' bar: a 12-step history mixing MoR
    and CoW DML drains through the STREAMING feed to the same multiset
    as the batch feed, and both replay to ``table.read``."""
    t = _mk(spark, tmp_path)
    steps = [
        lambda: t.commit(  # 1 append
            spark.createDataFrame(
                [(i, i % 5, i * 10) for i in range(40, 60)], SCHEMA
            ).repartition(1),
            mode="append",
        ),
        lambda: t.delete_where_mor(spark, [("g", "=", 2)]),  # 2 MoR delete
        lambda: t.update_where_mor(  # 3 MoR update
            spark, {"v": "v + 1"}, [("g", "=", 3)]
        ),
        lambda: t.delete_where(spark, [("k", ">=", 55)]),  # 4 CoW delete
        lambda: t.update_where(  # 5 CoW update
            spark, {"v": "v * 2"}, [("g", "=", 0)]
        ),
        lambda: t.merge(  # 6 merge: update k=1, delete k=6, insert k=100
            spark,
            spark.createDataFrame(
                [(1, "U", 999), (6, "D", None), (100, "I", 111)],
                "k long, op string, nv long",
            ),
            ["k"],
            matched_delete=F.col("op") == "D",
            matched_update={"v": F.col("nv")},
            update_condition=F.col("op") == "U",
            not_matched_insert={"g": F.lit(9), "v": F.col("nv")},
        ),
        lambda: t.delete_keys(  # 7 key tombstone
            spark,
            spark.createDataFrame([(k,) for k in range(0, 50, 7)], "k long"),
            ["k"],
        ),
        lambda: t.commit(  # 8 overwrite WITH change data
            spark.createDataFrame(
                [(i, i % 5, i) for i in range(10)], SCHEMA
            ).repartition(1),
            mode="overwrite",
            change_data=True,
        ),
        lambda: t.delete_where_mor(spark, [("k", "<", 3)]),  # 9 MoR again
        lambda: t.update_where(  # 10 CoW update post-overwrite
            spark, {"v": "v + 1000"}, [("g", "=", 1)]
        ),
        lambda: t.rollback(  # 11 rollback WITH change data
            t.latest_version() - 1, spark=spark
        ),
        lambda: t.consolidate_deletion_vectors(spark),  # 12 maintenance
    ]
    for step in steps:
        step()
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    batch, _ = read_row_changes_since(spark, t, None)
    want = Counter(tuple(r) for r in batch.collect())
    assert Counter(got) == want
    live = Counter(
        tuple(r) for r in t.read(spark).select("k", "g", "v").collect()
    )
    assert _fold(got) == live


def test_streaming_checkpoint_resumes_across_cow(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20)
    got: list = []
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, t.root, ckpt, got)
    n_first = len(got)
    t.delete_where(spark, [("k", "<", 3)])  # CoW delete
    t.update_where(spark, {"v": "v + 5"}, [("k", "=", 10)])  # CoW update
    _drain(spark, t.root, ckpt, got)
    new = got[n_first:]
    assert Counter((r[0], r[3]) for r in new) == Counter(
        [
            (0, "delete"),
            (1, "delete"),
            (2, "delete"),
            (10, "update_preimage"),
            (10, "update_postimage"),
        ]
    )
    assert {r[4] for r in new} == {1, 2}


def test_batch_fast_path_reads_images_not_tables(spark, tmp_path, monkeypatch):
    """After a CoW delete, consuming JUST that version's changes must not
    rescan any table file — the recorded images carry everything."""
    t = _mk(spark, tmp_path, n=30)
    cursor = t.latest_version()
    t.delete_where(spark, [("g", "=", 1)])

    def boom(*a, **k):
        raise AssertionError("fast path must not scan table files")

    monkeypatch.setattr(SnapshotTable, "_scan_with_tombstones", boom)
    feed, cur = read_row_changes_since(spark, t, cursor)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert {r["k"] for r in rows} == {i for i in range(30) if i % 5 == 1}
    assert cur == t.latest_version()


def test_noop_update_records_empty_entry_and_emits_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path, n=10)
    cursor = t.latest_version()
    t.update_where(spark, {"v": "v"}, [("g", "=", 1)])  # SET to itself
    m = t._read_manifest(t.latest_version())
    assert m["mode"] == "update-where"
    assert m["change_data"]["types"] == {}  # positive no-change proof
    feed, _ = read_row_changes_since(spark, t, cursor)
    assert feed is None
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    assert _plan_cdf_partitions(t.root, cursor, t.latest_version()) == []


def test_update_images_diff_exactly_not_all_matched(spark, tmp_path):
    """A predicate matching 10 rows where the SET changes only 4 emits 4
    image pairs — the writer diffs, it does not dump intents."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(i, 0, min(i, 3) * 10) for i in range(10)], SCHEMA
        ).repartition(1),
        mode="append",
    )
    cursor = t.latest_version()
    # v = min(k,3)*10: rows k>=3 all have v=30; SET v=30 changes k<3 only
    t.update_where(spark, {"v": "30"}, [("g", "=", 0)])
    feed, _ = read_row_changes_since(spark, t, cursor)
    by = Counter(r["_change_type"] for r in feed.collect())
    assert by == {"update_preimage": 3, "update_postimage": 3}


def test_replace_where_streams_its_region_diff(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, p string, v long"
    )
    t.commit(df.repartition(1), mode="append", partition_by=["p"])
    repl = spark.createDataFrame(
        [(20, "b", 200), (21, "b", 210)], "k long, p string, v long"
    )
    t.replace_where(spark, repl.coalesce(1), [("p", "=", "b")])
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    # columns: k, p, v, _change_type, _commit_version
    changes = [(r[0], r[3]) for r in got if r[4] == 1]
    assert Counter(changes) == Counter(
        [(2, "delete"), (20, "insert"), (21, "insert")]
    )
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(tuple(r) for r in batch.collect()) == Counter(got)


def test_change_files_tracked_by_vacuum_and_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, parts=1)
    t.delete_where(spark, [("k", "<", 5)])
    m = t._read_manifest(t.latest_version())
    cd_files = [f for fl in m["change_data"]["types"].values() for f in fl]
    assert cd_files
    # referenced: not orphans
    assert not set(cd_files) & set(t.orphan_files())
    # both versions retained: change files survive a graceless vacuum
    t.commit(
        spark.createDataFrame([(99, 0, 0)], SCHEMA).repartition(1),
        mode="append",
    )
    vacuum(t, keep_versions=2, grace_seconds=0.0)
    import os

    assert all(os.path.exists(f) for f in cd_files)
    # drop the delete version from retention: its images are reclaimed
    t.commit(
        spark.createDataFrame([(98, 0, 0)], SCHEMA).repartition(1),
        mode="append",
    )
    vacuum(t, keep_versions=2, grace_seconds=0.0)
    assert not any(os.path.exists(f) for f in cd_files)


def test_change_entry_survives_delta_encoded_manifests(spark, tmp_path):
    """CoW versions publish as O(changes) delta records (non-checkpoint
    versions); the change_data entry must round-trip the resolve."""
    t = _mk(spark, tmp_path, n=20, parts=1)
    t.delete_where(spark, [("k", "<", 4)])  # v1: delta-encoded
    import json
    import os

    raw = json.loads(
        open(os.path.join(t.root, "_manifests", "v1.json")).read()
    )
    assert "delta_of" in raw, "v1 should be a delta record"
    t2 = SnapshotTable(t.root)  # fresh resolve
    m = t2._read_manifest(1)
    assert m["change_data"]["types"].keys() == {"delete"}
    feed, _ = read_row_changes_since(spark, t2, 0)
    assert Counter(r["_change_type"] for r in feed.collect()) == Counter(
        {"delete": 4}
    )


def test_overwrite_without_optin_still_refuses_streaming(spark, tmp_path):
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    t = _mk(spark, tmp_path, n=10, parts=1)
    t.commit(
        spark.createDataFrame([(1, 1, 1)], SCHEMA).repartition(1),
        mode="overwrite",
    )
    with pytest.raises(ValueError, match="no change-data files"):
        _plan_cdf_partitions(t.root, 0, 1)
    # batch feed still covers it by state diff
    feed, _ = read_row_changes_since(spark, t, 0)
    assert feed is not None


def test_overwrite_optin_identical_data_emits_nothing(spark, tmp_path):
    """exceptAll semantics preserved: overwriting with the same rows
    records empty images (the batch diff would also prove emptiness)."""
    t = _mk(spark, tmp_path, n=10, parts=1)
    same = spark.createDataFrame(
        [(i, i % 5, i * 10) for i in range(10)], SCHEMA
    )
    t.commit(same.repartition(1), mode="overwrite", change_data=True)
    m = t._read_manifest(t.latest_version())
    assert m["change_data"]["types"] == {}
    feed, _ = read_row_changes_since(spark, t, 0)
    assert feed is None


def test_change_data_on_hive_partitioned_table(spark, tmp_path):
    """Partition columns are directory-only in DATA files but ride
    full-width inside change-data files — the stream reader reads them
    back without partition_values plumbing."""
    t = SnapshotTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, "a" if i < 5 else "b", i) for i in range(10)],
        "k long, p string, v long",
    )
    t.commit(df.repartition(1), mode="append", partition_by=["p"])
    t.update_where(spark, {"v": "v + 100"}, [("p", "=", "a")])
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    pre = {r[0]: (r[1], r[2]) for r in got if r[3] == "update_preimage"}
    post = {r[0]: (r[1], r[2]) for r in got if r[3] == "update_postimage"}
    assert set(pre) == set(post) == set(range(5))
    for k in pre:
        assert pre[k][0] == post[k][0] == "a"
        assert post[k][1] == pre[k][1] + 100
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(tuple(r) for r in batch.collect()) == Counter(got)


def test_merge_images_classification(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame(
            [(k, 0, k * 10) for k in range(5)], SCHEMA
        ).repartition(1),
        mode="append",
    )
    cursor = t.latest_version()
    t.merge(
        spark,
        spark.createDataFrame(
            [(1, "U", 999), (3, "D", None), (100, "I", 7)],
            "k long, op string, nv long",
        ),
        ["k"],
        matched_delete=F.col("op") == "D",
        matched_update={"v": F.col("nv")},
        update_condition=F.col("op") == "U",
        not_matched_insert={"g": F.lit(0), "v": F.col("nv")},
    )
    feed, _ = read_row_changes_since(spark, t, cursor)
    by = Counter((r["k"], r["_change_type"]) for r in feed.collect())
    # merge classifies delete/insert (Delta CDF does the same for the
    # generic path): k=1's update appears as delete+insert pair
    assert by == Counter(
        [
            (1, "delete"),
            (1, "insert"),
            (3, "delete"),
            (100, "insert"),
        ]
    )


def test_vacuum_compliance_erasure_strips_images_feeds_fall_back(
    spark, tmp_path
):
    """``keep_change_data=False``: the CoW delete's images (which hold
    the erased rows' bytes) are reclaimed and the manifest entry is
    stripped — the batch feed re-derives the same changes by state diff,
    the streaming feed refuses the version again (re-sync contract)."""
    import os

    t = _mk(spark, tmp_path, n=20, parts=1)
    t.delete_where(spark, [("k", "<", 4)])
    m = t._read_manifest(t.latest_version())
    cd_files = [f for fl in m["change_data"]["types"].values() for f in fl]
    before, _ = read_row_changes_since(spark, t, 0)
    want = Counter(tuple(r) for r in before.collect())
    vacuum(t, keep_versions=2, grace_seconds=0.0, keep_change_data=False)
    assert not any(os.path.exists(f) for f in cd_files)
    m2 = t._read_manifest(t.latest_version())
    assert "change_data" not in m2
    after, _ = read_row_changes_since(spark, t, 0)
    assert Counter(tuple(r) for r in after.collect()) == want  # state diff
    from f1_bigdata_pyspark_spark.sources.snapshot_source import (
        _plan_cdf_partitions,
    )

    with pytest.raises(ValueError, match="no change-data files"):
        _plan_cdf_partitions(t.root, 0, t.latest_version())


def test_change_images_across_additive_schema_evolution(spark, tmp_path):
    """Images written AFTER an additive evolution carry the wide schema;
    the batch feed unions by name (old versions NULL-fill), and a
    streaming consumer that started under the old schema keeps its
    start-time width (round-10 contract, now covering image files)."""
    t = _mk(spark, tmp_path, n=10, parts=1)
    t.commit(
        spark.createDataFrame(
            [(100, 0, 1, "x")], "k long, g long, v long, tag string"
        ).repartition(1),
        mode="append",
        merge_schema=True,
    )
    t.update_where(spark, {"v": "v + 50"}, [("k", "=", 100)])  # wide images
    feed, _ = read_row_changes_since(spark, t, None)
    rows = {
        (r["k"], r["_change_type"]): (r["v"], r["tag"])
        for r in feed.collect()
        if r["k"] == 100
    }
    assert rows[(100, "insert")] == (1, "x")
    assert rows[(100, "update_preimage")] == (1, "x")
    assert rows[(100, "update_postimage")] == (51, "x")
    # pre-evolution rows read tag as NULL in the unioned feed
    assert all(
        r["tag"] is None for r in feed.collect() if r["k"] < 100
    )
    # streaming from scratch reports the start-time (wide) schema and
    # drains to the same multiset
    got: list = []
    _drain(spark, t.root, str(tmp_path / "ckpt"), got)
    assert Counter(tuple(r) for r in got) == Counter(
        tuple(r)
        for r in feed.select(
            "k", "g", "v", "tag", "_change_type", "_commit_version"
        ).collect()
    )


def test_describe_history_reports_change_rows(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20, parts=1)
    t.delete_where(spark, [("k", "<", 4)])
    t.update_where(spark, {"v": "v + 1"}, [("k", "=", 10)])
    hist = {h["version"]: h for h in t.describe_history()}
    assert "change_rows" not in hist[0]  # plain append
    assert hist[1]["change_rows"] == {"delete": 4}
    assert hist[2]["change_rows"] == {
        "update_preimage": 1,
        "update_postimage": 1,
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_dml_history_stream_equals_batch(spark, tmp_path, seed):
    """Property form of the gauntlet: a seeded random walk over the DML
    palette (MoR/CoW delete+update, merge, tombstone, append, overwrite
    and rollback with images, DV consolidation) must always satisfy
    streaming drain ≡ batch feed ≡ fold-to-live-table."""
    import random

    rng = random.Random(seed)
    t = _mk(spark, tmp_path, n=30, parts=2, name=f"tbl{seed}")
    next_k = [1000]

    def _append():
        k0 = next_k[0]
        next_k[0] += 5
        t.commit(
            spark.createDataFrame(
                [(k, k % 5, k) for k in range(k0, k0 + 5)], SCHEMA
            ).repartition(1),
            mode="append",
        )

    def _merge():
        pivot = rng.randrange(0, 30)
        t.merge(
            spark,
            spark.createDataFrame(
                [(pivot, "U", 7777), (next_k[0], "I", 8888)],
                "k long, op string, nv long",
            ),
            ["k"],
            matched_delete=F.col("op") == "X",
            matched_update={"v": F.col("nv")},
            update_condition=F.col("op") == "U",
            not_matched_insert={"g": F.lit(3), "v": F.col("nv")},
        )
        next_k[0] += 1

    ops = [
        lambda: t.delete_where_mor(spark, [("g", "=", rng.randrange(5))]),
        lambda: t.update_where_mor(
            spark, {"v": "v + 13"}, [("g", "=", rng.randrange(5))]
        ),
        lambda: t.delete_where(spark, [("k", "<", rng.randrange(5, 20))]),
        lambda: t.update_where(
            spark, {"v": "v * 3"}, [("g", "=", rng.randrange(5))]
        ),
        _append,
        _merge,
        lambda: t.delete_keys(
            spark,
            spark.createDataFrame(
                [(rng.randrange(40),), (rng.randrange(40),)], "k long"
            ),
            ["k"],
        ),
        lambda: t.commit(
            spark.createDataFrame(
                [(i, i % 5, i) for i in range(rng.randrange(5, 15))], SCHEMA
            ).repartition(1),
            mode="overwrite",
            change_data=True,
        ),
        lambda: t.rollback(
            rng.randrange(max(1, t.latest_version())), spark=spark
        ),
        lambda: t.consolidate_deletion_vectors(spark, max_records=2),
    ]
    for _ in range(8):
        rng.choice(ops)()
    got: list = []
    _drain(spark, t.root, str(tmp_path / f"ckpt{seed}"), got)
    batch, _ = read_row_changes_since(spark, t, None)
    assert Counter(got) == Counter(tuple(r) for r in batch.collect())
    live = Counter(
        tuple(r) for r in t.read(spark).select("k", "g", "v").collect()
    )
    assert _fold(got) == live
