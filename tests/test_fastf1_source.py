"""Custom Python DataSource (``fastf1_laps``) — partition-per-race reads,
file-granular GrandPrix pushdown, and composition with the normalization
pipeline (the reference's ingest boundary re-expressed on the Spark 4
Python Data Source API; reference loop: ingest_season_laps.py:44-67)."""

from __future__ import annotations

import json
import math
import os

import pytest

from f1_bigdata_pyspark_spark.sources.fastf1_source import (
    FASTF1_LAPS_SCHEMA_DDL,
    FastF1LapsDataSource,
    race_file_name,
)
from tests.laps_fixture import COLUMNS, EVENTS, SPARK_SCHEMA, build_laps_rows


def _jsonable(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and math.isnan(v):
        return float("nan")  # json module round-trips NaN (non-strict mode)
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


@pytest.fixture(scope="module")
def race_dir(tmp_path_factory):
    """One JSON-lines file per race, the fixture stand-in for the per-race
    FastF1 fetch."""
    root = tmp_path_factory.mktemp("fastf1_races")
    rows = build_laps_rows()
    by_race: dict[str, list] = {}
    for row in rows:
        rec = dict(zip(COLUMNS, row))
        by_race.setdefault(rec["GrandPrix"], []).append(rec)
    for gp, recs in by_race.items():
        with open(root / race_file_name(gp), "w", encoding="utf-8") as fh:
            for rec in recs:
                fh.write(
                    json.dumps({k: _jsonable(v) for k, v in rec.items()})
                    + "\n"
                )
    return str(root)


@pytest.fixture(scope="module")
def registered(spark):
    # a reader implementing pushFilters() requires the conf at PLAN time —
    # Spark refuses the scan outright when it's off, rather than silently
    # skipping pushdown
    spark.dataSource.register(FastF1LapsDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def _load(spark, race_dir):
    return (
        spark.read.format("fastf1_laps").option("path", race_dir).load()
    )


def test_schema_matches_declared(registered, race_dir):
    df = _load(registered, race_dir)
    expected = registered.createDataFrame([], FASTF1_LAPS_SCHEMA_DDL).schema
    assert df.schema == expected


def test_reads_all_races_one_partition_each(registered, race_dir):
    df = _load(registered, race_dir)
    # unit of parallelism is the race: one input partition per race file
    assert df.rdd.getNumPartitions() == len(EVENTS)
    assert df.count() == len(build_laps_rows())


def test_contents_match_direct_dataframe(registered, race_dir):
    df = _load(registered, race_dir)
    expected = registered.createDataFrame(build_laps_rows(), SPARK_SCHEMA)
    key = ["Year", "GrandPrix", "Session", "Driver", "LapNumber"]
    got = {tuple(r[k] for k in key): r for r in df.collect()}
    want = {tuple(r[k] for k in key): r for r in expected.collect()}
    assert set(got) == set(want)
    probe = next(iter(want))
    for col in ("Team", "Compound", "LapTime", "IsAccurate"):
        gv, wv = got[probe][col], want[probe][col]
        if isinstance(wv, float) and math.isnan(wv):
            assert math.isnan(gv)
        else:
            assert gv == wv


def test_grandprix_filter_prunes_files(registered, race_dir):
    """EqualTo/In on GrandPrix prunes whole race files at planning time —
    observable as the scan's partition count (the custom-source analog of
    partition pruning)."""
    one = _load(registered, race_dir).filter(f"GrandPrix = '{EVENTS[3]}'")
    assert one.rdd.getNumPartitions() == 1
    assert one.select("GrandPrix").distinct().collect()[0][0] == EVENTS[3]

    two = _load(registered, race_dir).filter(
        f"GrandPrix IN ('{EVENTS[0]}', '{EVENTS[7]}')"
    )
    assert two.rdd.getNumPartitions() == 2
    assert two.count() > 0


def test_unsupported_filter_still_correct(registered, race_dir):
    """Filters the source can't serve are returned to Spark and applied
    post-scan — rows must match the plain-DataFrame evaluation."""
    df = _load(registered, race_dir).filter("IsAccurate AND LapNumber <= 3")
    expected = (
        registered.createDataFrame(build_laps_rows(), SPARK_SCHEMA)
        .filter("IsAccurate AND LapNumber <= 3")
        .count()
    )
    assert df.count() == expected


def test_composes_with_normalization(registered, race_dir):
    """The custom source feeds the same normalization layer the parquet
    path uses (sources/laps_ingest.py) — NaNs become NULLs downstream."""
    from pyspark.sql import functions as F

    from f1_bigdata_pyspark_spark.sources.laps_ingest import nan_to_null

    df = _load(registered, race_dir).withColumn(
        "LapTime", nan_to_null(F.col("LapTime"))
    )
    assert df.filter(F.isnan("LapTime")).count() == 0
    assert df.filter(F.col("LapTime").isNull()).count() > 0


def test_writer_roundtrip(registered, tmp_path):
    """Write side: df.write.format('fastf1_laps') stages per-task JSONL
    files, commit publishes them with a _SUCCESS manifest, and the reader
    round-trips the rows."""
    out = tmp_path / "published"
    out.mkdir()
    df = registered.createDataFrame(build_laps_rows(), SPARK_SCHEMA)
    df.repartition(4).write.format("fastf1_laps").option(
        "path", str(out)
    ).mode("append").save()

    manifest = json.loads((out / "_SUCCESS").read_text())
    files = sorted(p.name for p in out.glob("*.jsonl"))
    assert manifest["files"] == files
    assert manifest["rows"] == len(build_laps_rows())
    assert not (out / "_staging").exists()  # stage cleaned after publish

    back = _load(registered, str(out))
    assert back.count() == len(build_laps_rows())
    assert back.rdd.getNumPartitions() == len(files)


def test_writer_overwrite_replaces(registered, tmp_path):
    out = tmp_path / "published"
    out.mkdir()
    df = registered.createDataFrame(build_laps_rows(), SPARK_SCHEMA)
    df.write.format("fastf1_laps").option("path", str(out)).mode(
        "append"
    ).save()
    first = sorted(p.name for p in out.glob("*.jsonl"))

    half = df.filter("LapNumber <= 2")
    half.write.format("fastf1_laps").option("path", str(out)).mode(
        "overwrite"
    ).save()
    assert _load(registered, str(out)).count() == half.count()
    # the first publication's files are gone, not merely shadowed
    assert not (set(first) & {p.name for p in out.glob("*.jsonl")})


def test_writer_abort_publishes_nothing(registered, tmp_path):
    """Two-phase commit, failure path: if any task fails, abort() runs and
    NO file is published — the reader never sees a half-written season."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    out = tmp_path / "published"
    out.mkdir()

    @F.udf(DoubleType())
    def poison(lap_number):
        if lap_number is not None and lap_number >= 3:
            raise RuntimeError("synthetic task failure")
        return lap_number

    df = registered.createDataFrame(build_laps_rows(), SPARK_SCHEMA)
    bad = df.withColumn("LapNumber", poison("LapNumber"))
    with pytest.raises(Exception):
        bad.repartition(4).write.format("fastf1_laps").option(
            "path", str(out)
        ).mode("append").save()
    assert list(out.glob("*.jsonl")) == []
    assert not (out / "_SUCCESS").exists()


def test_stream_reader_ingests_race_drops(registered, tmp_path):
    """Streaming half of the custom source: races appearing in the
    directory are picked up as offset ranges over the sorted file list —
    drop 1 lands in micro-batch 1, a later race in micro-batch 2, and a
    RESTARTED query resumes from the checkpointed offset instead of
    re-ingesting the season."""
    rows = build_laps_rows()
    by_race: dict[str, list] = {}
    for row in rows:
        rec = dict(zip(COLUMNS, row))
        by_race.setdefault(rec["GrandPrix"], []).append(rec)
    races = sorted(by_race)

    live = tmp_path / "live"
    live.mkdir()
    sink = tmp_path / "sink"

    def publish(gp):
        with open(live / race_file_name(gp), "w", encoding="utf-8") as fh:
            for rec in by_race[gp]:
                fh.write(
                    json.dumps({k: _jsonable(v) for k, v in rec.items()})
                    + "\n"
                )

    def start_query():
        stream = (
            registered.readStream.format("fastf1_laps")
            .option("path", str(live))
            .load()
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(str(sink))
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )

    publish(races[0])
    q = start_query()
    try:
        q.processAllAvailable()
        got = registered.read.parquet(str(sink))
        assert got.count() == len(by_race[races[0]])

        publish(races[1])
        q.processAllAvailable()
        got = registered.read.parquet(str(sink))
        assert sorted(
            r["GrandPrix"]
            for r in got.select("GrandPrix").distinct().collect()
        ) == races[:2]
    finally:
        q.stop()

    # restart: a new race arrives while the query is down; on resume only
    # that race is ingested (offset came from the checkpoint)
    publish(races[2])
    q = start_query()
    try:
        q.processAllAvailable()
        got = registered.read.parquet(str(sink))
        assert got.count() == sum(len(by_race[r]) for r in races[:3])
        per_race = {
            r["GrandPrix"]: r["n"]
            for r in got.groupBy("GrandPrix").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        # no race was double-ingested across the restart
        assert per_race == {r: len(by_race[r]) for r in races[:3]}
    finally:
        q.stop()


def test_stream_writer_per_epoch_manifests(registered, tmp_path):
    """Streaming-sink half of the custom source (writeStream.format):
    each micro-batch publishes via two-phase commit — staged files
    promoted + an epoch manifest _batch-{id}.json written atomically.
    Every row lands exactly once and every epoch is manifest-covered."""
    rows = build_laps_rows()
    by_race: dict[str, list] = {}
    for row in rows:
        rec = dict(zip(COLUMNS, row))
        by_race.setdefault(rec["GrandPrix"], []).append(rec)
    races = sorted(by_race)

    live = tmp_path / "live"
    live.mkdir()
    out = tmp_path / "out"
    out.mkdir()

    def publish(gp):
        with open(live / race_file_name(gp), "w", encoding="utf-8") as fh:
            for rec in by_race[gp]:
                fh.write(
                    json.dumps({k: _jsonable(v) for k, v in rec.items()})
                    + "\n"
                )

    publish(races[0])
    stream = (
        registered.readStream.format("fastf1_laps")
        .option("path", str(live))
        .load()
    )
    q = (
        stream.writeStream.format("fastf1_laps")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        publish(races[1])
        q.processAllAvailable()
    finally:
        q.stop()

    manifests = sorted(out.glob("_batch-*.json"))
    assert manifests, "no epoch manifests published"
    listed, total = set(), 0
    for mp in manifests:
        m = json.loads(mp.read_text())
        listed.update(m["files"])
        total += m["rows"]
    on_disk = {p.name for p in out.glob("*.jsonl")}
    assert listed == on_disk  # every live file manifest-covered
    assert total == len(by_race[races[0]]) + len(by_race[races[1]])
    # no staging leftovers
    assert not list((out / "_staging").glob("*")) if (out / "_staging").exists() else True


def test_stream_writer_replayed_epoch_is_idempotent(registered, tmp_path):
    """Checkpoint-recovery contract: commit() for an ALREADY-MANIFESTED
    batchId discards the re-staged files instead of double-publishing."""
    import os

    from f1_bigdata_pyspark_spark.sources.fastf1_source import (
        FastF1LapsStreamWriter,
        _StagedFile,
    )

    out = tmp_path / "out"
    out.mkdir()
    w = FastF1LapsStreamWriter({"path": str(out)})

    def stage(content):
        staging = out / "_staging"
        staging.mkdir(exist_ok=True)
        p = staging / f"epoch-{content}.jsonl.tmp"
        p.write_text('{"x": 1}\n')
        return _StagedFile(
            staged_path=str(p), final_name=f"part-{content}.jsonl", n_rows=1
        )

    w.commit([stage("aaa")], batchId=0)
    assert (out / "part-aaa.jsonl").exists()
    # replay of epoch 0 with re-staged (different-token) files
    w.commit([stage("bbb")], batchId=0)
    assert not (out / "part-bbb.jsonl").exists()  # not double-published
    assert not (out / "_staging" / "epoch-bbb.jsonl.tmp").exists()  # cleaned
    assert json.loads((out / "_batch-0.json").read_text())["rows"] == 1


def test_stream_writer_sweeps_unmanifested_part_files(tmp_path):
    """Crash-recovery gap: a commit() that died between promoting part
    files and writing its _batch manifest leaves final-named files no
    manifest references (the replay restages under FRESH tokens, so they
    are permanent garbage). The next successful commit must reclaim them
    while leaving every manifested file alone."""
    import os

    from f1_bigdata_pyspark_spark.sources.fastf1_source import (
        FastF1LapsStreamWriter,
        _StagedFile,
    )

    out = tmp_path / "out"
    out.mkdir()
    w = FastF1LapsStreamWriter({"path": str(out)})

    def stage(token):
        staging = out / "_staging"
        staging.mkdir(exist_ok=True)
        p = staging / f"epoch-{token}.jsonl.tmp"
        p.write_text('{"x": 1}\n')
        return _StagedFile(
            staged_path=str(p), final_name=f"part-{token}.jsonl", n_rows=1
        )

    # epoch 0 commits cleanly
    w.commit([stage("aaa")], batchId=0)
    assert (out / "part-aaa.jsonl").exists()
    # epoch 1 "crashes" post-promotion, pre-manifest: simulate by placing
    # a final-named part file with no manifest entry
    (out / "part-dead.jsonl").write_text('{"x": 2}\n')
    # epoch 1 replays with a fresh token and commits
    w.commit([stage("bbb")], batchId=1)
    assert not (out / "part-dead.jsonl").exists(), "orphan not swept"
    assert (out / "part-aaa.jsonl").exists()
    assert (out / "part-bbb.jsonl").exists()
    listed = set()
    for mp in out.glob("_batch-*.json"):
        listed.update(json.loads(mp.read_text())["files"])
    assert listed == {p.name for p in out.glob("part-*.jsonl")}


def test_stream_offsets_decode_every_checkpoint_generation(race_dir):
    """ADVICE r8: live checkpoints can hold THREE offset shapes — legacy
    {"index": N}, legacy comma-joined {"seen": "a,b"}, and the current
    JSON-list {"seen": [...]}. A replayed in-flight batch whose END is
    still legacy index-form must re-plan the same files, not an empty
    target (which would permanently skip them)."""
    from pyspark.sql.types import StructType

    from f1_bigdata_pyspark_spark.sources.fastf1_source import (
        FastF1LapsStreamReader,
    )

    schema = StructType.fromDDL(FASTF1_LAPS_SCHEMA_DDL)
    r = FastF1LapsStreamReader({"path": race_dir}, schema)
    files = r._files()
    assert len(files) >= 2
    want = files[1:]

    def names(parts):
        return sorted(os.path.basename(p.path) for p in parts)

    # legacy index START **and END** both map
    assert names(r.partitions({"index": 1}, {"index": len(files)})) == want
    # legacy comma-join START and END
    assert (
        names(r.partitions({"seen": files[0]}, {"seen": ",".join(files)}))
        == want
    )
    # current JSON-list form (comma-safe for any file name)
    assert names(r.partitions({"seen": [files[0]]}, {"seen": files})) == want
    # mixed generations (upgrade mid-batch)
    assert names(r.partitions({"index": 1}, {"seen": files})) == want
    assert r.latestOffset() == {"seen": files}
    assert r.initialOffset() == {"seen": []}
