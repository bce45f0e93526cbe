"""The snapshot table as a first-class Spark Python DataSource with
Catalyst FILTER PUSHDOWN driving the manifest pruning.

``SnapshotTable.read(where=)`` proves the skipping mechanism but carries
the predicate through a side channel; this source closes the loop with
the engine: a plain

    spark.read.format("snapshot").option("root", path).load()
         .filter("k >= 10")

hands the filter to ``pushFilters`` (the Spark 4.1 Python DataSource
pushdown API), which prunes the FILE LIST through the exact same
``prune_files`` planner (footer min/max stats + Hive partition point
stats + IN-lists), and ``partitions()`` then plans one input partition
per surviving file — the scan never opens a skipped file. Pruning is
file-coarse, so every filter is also returned to Spark for row-level
evaluation (skipping stays an I/O optimization that cannot change the
answer, the same soundness contract as ``read(where=)``).

Executor-side reads go through pyarrow straight to Arrow record batches
(the DataSource fast path — no per-row Python), with Hive partition
values re-attached as constant columns and absent (pre-evolution)
columns null-filled, mirroring ``_plan_scan``.

Scope: tables with live TOMBSTONES refuse (the anti-join belongs to the
relational layer — use ``SnapshotTable.read``); run OPTIMIZE to
materialize deletes before serving through this source.

Engine caveat (pinned in tests/test_snapshot_source.py, observed on
Spark 4.1's experimental ``spark.sql.python.filterPushdown.enabled``
path): after executing a FILTERED action on a ``load()`` DataFrame,
Spark reuses that pushed-down scan for a later UNFILTERED action on the
SAME DataFrame object without re-consulting the reader (traced: no
``reader()``/``partitions()`` call on the second action) — so issue a
fresh ``load()`` per logical query, which is how sources are normally
used (``spark.read...load().filter(...)`` in one chain). The reader
itself is defensive: it consumes its pushed filters per ``partitions()``
call, so repeated filtered plannings never accumulate stale predicates.

Reference analog: none (the reference reads its store through pymongo);
this is the Spark-native serving face of sources/snapshots.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from f1_bigdata_pyspark_spark.sources.snapshots import prune_files

_OP_BY_FILTER = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
    In: "in",
    # value-less null tests (round 7): prune via the manifest's per-file
    # null counts — IS NULL skips no-null files, IS NOT NULL all-null ones
    IsNull: "is_null",
    IsNotNull: "is_not_null",
}


class SnapshotFilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict, where=None):
        self.path = path
        self.partition_values = partition_values  # col -> python value
        # the pushed conjunction rides INTO the partition so the executor
        # can skip ROW GROUPS the manifest's file granularity cannot
        self.where = where or []


def _read_partition_batches(schema: StructType, partition):
    """Executor-side read of one snapshot file partition to Arrow
    batches: project to the committed schema, re-attach Hive partition
    values as constants, NULL-fill pre-evolution columns. Shared by the
    batch reader and the stream reader.

    ROW-GROUP SKIPPING (round 7): when the partition carries a pushed
    conjunction, each row group's own footer stats are tested through
    the SAME ``_file_may_match`` planner before any data is read — the
    reader-granularity tier below manifest file pruning (a 1 GB file
    with 8 sorted row groups serves a point probe from ~1/8 of its
    bytes). Sound by the same argument: skipping only removes row
    groups PROVEN empty for the conjunction; Spark re-applies every
    filter row-level."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    from f1_bigdata_pyspark_spark.sources.snapshots import (
        _file_may_match,
        row_group_stats,
    )

    target = to_arrow_schema(schema)
    pf = pq.ParquetFile(partition.path)
    if partition.where and pf.metadata.num_row_groups > 1:
        keep = [
            rg
            for rg in range(pf.metadata.num_row_groups)
            if all(
                _file_may_match(
                    row_group_stats(pf.metadata, rg), col, op, lit
                )
                for col, op, lit in partition.where
            )
        ]
        if not keep:
            return
        tbl = pf.read_row_groups(keep)
    else:
        tbl = pf.read()
    n = tbl.num_rows
    cols = []
    for field in target:
        if field.name in tbl.column_names:
            cols.append(tbl[field.name].cast(field.type))
        elif field.name in partition.partition_values:
            v = partition.partition_values[field.name]
            cols.append(
                pa.nulls(n, field.type)
                if v is None
                else pa.array([v] * n).cast(field.type)
            )
        else:  # pre-evolution file: the committed column reads NULL
            cols.append(pa.nulls(n, field.type))
    yield from pa.Table.from_arrays(cols, schema=target).to_batches()


class SnapshotReader(DataSourceReader):
    def __init__(self, manifest: dict, schema: StructType):
        self.manifest = manifest
        self.schema = schema
        self.where: list[tuple] = []

    def pushFilters(self, filters):
        for f in filters:
            op = _OP_BY_FILTER.get(type(f))
            # only simple single-column comparisons prune; everything
            # else is left entirely to Spark
            if op is not None and len(f.attribute) == 1:
                if op in ("is_null", "is_not_null"):
                    val = None  # value-less ops
                elif op == "in":
                    val = list(f.value)
                else:
                    val = f.value
                self.where.append((f.attribute[0], op, val))
            # coarse file-level pruning can never fully satisfy a
            # row-level predicate: return EVERY filter for Spark to
            # re-apply (sound by construction)
            yield f

    def partitions(self):
        # CONSUME the pushed filters: Spark can reuse one reader instance
        # across plannings of the same DataFrame, and an unfiltered query
        # planned after a filtered one skips the pushFilters phase — a
        # reader that kept yesterday's filters would then silently prune
        # files the new query needs (observed: df.filter(...).collect()
        # then df.collect() returned 10 of 30 rows). Filters apply to
        # exactly ONE partitions() call.
        where, self.where = self.where, []
        files = (
            prune_files(self.manifest, where)
            if where
            else self.manifest["files"]
        )
        from f1_bigdata_pyspark_spark.sources.snapshots import _stat_to_py

        parts = self.manifest.get("partitions", {})
        out = []
        for f in files:
            pv = {
                col: (None if tv is None else _stat_to_py(tv))
                for col, tv in parts.get(f, {}).items()
            }
            out.append(SnapshotFilePartition(f, pv, where))
        return out

    def read(self, partition):
        yield from _read_partition_batches(self.schema, partition)


class SnapshotStreamReader(DataSourceStreamReader):
    """The snapshot table as a STREAMING source —
    ``spark.readStream.format("snapshot").option("root", …)`` tails the
    commit log exactly like Delta's streaming source: offsets are
    VERSION NUMBERS (checkpointable primitives), each micro-batch plans
    one input partition per file ADDED in (start, end] (set difference
    of consecutive manifests — appends never rewrite, so file-level
    deltas are row-level appends), and executors read those files
    straight to Arrow. Non-append versions (overwrite, delete, merge,
    rollback…) break the append contract and raise — the consumer must
    re-sync from a snapshot read, the same explicit contract as
    ``read_changes_since``. Replays are deterministic: a checkpointed
    (start, end] names immutable manifests, so failure recovery re-reads
    the identical file set."""

    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.schema = schema

    def _versions(self) -> list[int]:
        mdir = os.path.join(self.root, "_manifests")
        out = []
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                try:  # same junk-file tolerance as SnapshotTable.versions
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _manifest(self, v: int) -> dict:
        with open(
            os.path.join(self.root, "_manifests", f"v{v}.json")
        ) as fh:
            return json.load(fh)

    def initialOffset(self) -> dict:
        return {"version": -1}  # fresh stream: nothing consumed yet

    def latestOffset(self) -> dict:
        vs = self._versions()
        return {"version": vs[-1] if vs else -1}

    def partitions(self, start: dict, end: dict):
        from f1_bigdata_pyspark_spark.sources.snapshots import _stat_to_py

        lo, hi = start["version"], end["version"]
        if hi <= lo:
            return []
        available = set(self._versions())
        seen: set[str] = set()
        if lo >= 0:
            if lo not in available:
                # vacuum removed the manifest that proves what this
                # checkpoint already delivered — continuing would either
                # duplicate or drop rows
                raise ValueError(
                    f"checkpointed version v{lo} has been vacuumed away — "
                    "the stream cannot prove which rows it already "
                    "delivered; re-sync from a fresh checkpoint"
                )
            seen = set(self._manifest(lo)["files"])
            first = lo + 1
            baseline = None
        else:
            # FRESH stream on a possibly-vacuumed table: the earliest
            # RETAINED manifest is the baseline snapshot — its CUMULATIVE
            # file set carries all surviving history, whatever the mode
            # that produced it (Delta's initial-snapshot semantics)
            first = min(available)
            baseline = first
        out = []
        for v in range(first, hi + 1):
            m = self._manifest(v)
            if v != baseline and m["mode"] != "append":
                raise ValueError(
                    f"v{v} is {m['mode']!r}, not append — the change "
                    "feed is broken; re-sync from a snapshot read"
                )
            parts = m.get("partitions", {})
            for f in m["files"]:
                if f in seen:
                    continue
                seen.add(f)
                pv = {
                    col: (None if tv is None else _stat_to_py(tv))
                    for col, tv in parts.get(f, {}).items()
                }
                out.append(SnapshotFilePartition(f, pv))
        return out

    def read(self, partition):
        yield from _read_partition_batches(self.schema, partition)

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to clean up per epoch


class SnapshotWriteMessage(WriterCommitMessage):
    def __init__(self, path: str | None, stats: dict, n_rows: int):
        self.path = path
        self.stats = stats
        self.n_rows = n_rows


class SnapshotWriter(DataSourceArrowWriter):
    """Two-phase snapshot write through Spark's own writer protocol —
    the executor/driver split the rest of sources/snapshots.py only
    simulates: each task streams its Arrow batches into ONE immutable
    parquet file under a shared commit dir and collects that file's
    footer stats LOCALLY (the driver never reads a footer); the driver's
    ``commit()`` then publishes the manifest atomically via
    ``publish_files`` (rebase-on-conflict, so concurrent jobs writing
    the same table all land). A failed job reaches ``abort()`` — the
    written files are unlinked, and even without that they are invisible
    orphans (no manifest references them) that vacuum reclaims: exactly
    the Delta commit protocol, driven by Spark's DataSource V2 write
    lifecycle instead of a bespoke sink."""

    def __init__(self, root: str, schema: StructType, overwrite: bool):
        self.root = root
        self.schema_json = schema.json()
        self.overwrite = overwrite
        import uuid as _uuid

        self.commit_id = _uuid.uuid4().hex[:12]  # one dir for all tasks

    def write(self, iterator):
        import os
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        from f1_bigdata_pyspark_spark.sources.snapshots import (
            _file_column_stats,
        )

        batches = [b for b in iterator if b.num_rows > 0]
        if not batches:
            return SnapshotWriteMessage(None, {}, 0)
        out_dir = os.path.join(self.root, "data", f"commit-{self.commit_id}")
        os.makedirs(out_dir, exist_ok=True)
        pid = TaskContext.get().partitionId()
        path = os.path.join(
            out_dir, f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.parquet"
        )
        tbl = pa.Table.from_batches(batches)
        pq.write_table(tbl, path)
        # executor-side stats collection (min/max + null counts) — the
        # scale-correct half of the manifest, shipped in the commit message
        return SnapshotWriteMessage(path, _file_column_stats(path), tbl.num_rows)

    def commit(self, messages):
        from f1_bigdata_pyspark_spark.sources.snapshots import SnapshotTable

        table = SnapshotTable(self.root)
        files = sorted(m.path for m in messages if m is not None and m.path)
        stats = {
            m.path: m.stats for m in messages if m is not None and m.path
        }
        table.publish_files(
            files,
            stats,
            mode="overwrite" if self.overwrite else "append",
            schema_json=self.schema_json,
        )

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and m.path:
                try:
                    os.unlink(m.path)
                except OSError:
                    pass  # unreferenced orphan either way — vacuum's job


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot").option("root", path)`` — options:
    ``root`` (required), ``version`` (optional int, default latest).
    Also writable: ``df.write.format("snapshot").option("root", path)
    .mode("append"|"overwrite").save()`` runs the two-phase commit in
    ``SnapshotWriter``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def _manifest(self) -> dict:
        # resolved ONCE per load() (memoized): schema() and reader() both
        # need it, and resolving twice is not just a double JSON read — a
        # commit landing between the two calls would pair version N+1's
        # schema with version N's file list inside one query plan
        cached = getattr(self, "_manifest_cache", None)
        if cached is not None:
            return cached
        self._manifest_cache = self._load_manifest()
        return self._manifest_cache

    def _load_manifest(self) -> dict:
        root = self.options.get("root")
        if not root:
            raise ValueError("snapshot source requires option 'root'")
        mdir = os.path.join(root, "_manifests")
        version = self.options.get("version")
        if version is None:
            versions = sorted(
                int(f[1:-5])
                for f in os.listdir(mdir)
                if f.startswith("v") and f.endswith(".json")
            )
            if not versions:
                raise FileNotFoundError(f"no commits at {root}")
            version = versions[-1]
        with open(os.path.join(mdir, f"v{int(version)}.json")) as fh:
            m = json.load(fh)
        if m.get("tombstones"):
            raise ValueError(
                "table has live tombstones — OPTIMIZE to materialize "
                "deletes, or read through SnapshotTable.read"
            )
        return m

    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._manifest()["schema"]))

    def reader(self, schema: StructType) -> SnapshotReader:
        return SnapshotReader(self._manifest(), schema)

    def writer(self, schema: StructType, overwrite: bool) -> SnapshotWriter:
        root = self.options.get("root")
        if not root:
            raise ValueError("snapshot source requires option 'root'")
        return SnapshotWriter(root, schema, overwrite)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        root = self.options.get("root")
        if not root:
            raise ValueError("snapshot source requires option 'root'")
        return SnapshotStreamReader(root, schema)


def register(spark) -> None:
    """Register the source AND enable the Python-DataSource filter
    pushdown conf (off by default in Spark 4.1; runtime-settable) —
    without it Spark refuses a reader that implements pushFilters."""
    spark.dataSource.register(SnapshotDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
