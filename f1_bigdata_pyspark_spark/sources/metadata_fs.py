"""Filesystem seam for the snapshot table's METADATA plane (round 10).

Every manifest read/write/list/unlink, clone back-reference, and vacuum
walk in ``sources/snapshots.py`` goes through one of these two
implementations; the DATA plane (parquet files) keeps riding Spark and
pyarrow, which speak Hadoop schemes natively. This is the same split
Delta's LogStore makes: the log needs three primitives a plain
filesystem API does not promise —

- ``put_if_absent`` (commit atomicity): exactly one of N concurrent
  writers of the same path may win, and losers must see a failure.
- ``replace_atomic`` (checkpoint rewrite): readers see the old or the
  new content, never a torn file.
- consistent ``listdir`` (version discovery).

``LocalMetadataFS`` is the POSIX fast path and the default — zero
behavior change for local tables: put_if_absent is the hard-link
fail-if-exists trick (rename() overwrites on POSIX, link() cannot),
replace_atomic is tmp + ``os.replace``.

``HadoopMetadataFS`` routes the same primitives through the JVM's
``org.apache.hadoop.fs.FileSystem`` (reached over the active
SparkSession's gateway), so the manifest log can live on any scheme the
cluster's Hadoop config resolves. Per-store commit-atomicity contract,
documented rather than hidden:

- **HDFS / local ``file:`` through Hadoop**: ``create(path,
  overwrite=false)`` is an atomic exclusive create — full Delta-grade
  commit safety.
- **S3A**: plain ``create(overwrite=false)`` is check-then-put (a HEAD
  probe before the PUT at close) — NOT atomic under concurrency. Run
  single-writer, front the log with a coordination service (the
  DynamoDB LogStore pattern), or enable S3 conditional writes
  (``fs.s3a.create.conditional.enabled``, Hadoop 3.4.1+ over S3's
  If-None-Match support) to restore atomicity.
- ``replace_atomic`` maps to ``create(overwrite=true)`` where rename-
  over-existing is unsupported; the checkpoint rewrite it serves is
  content-equivalent by construction and ``load_manifest`` retries the
  top manifest once on a severed chain, which covers the non-atomic
  window.

Reference analog: none (the reference's storage layer is a Mongo
connection string); this is lakehouse-standard log plumbing.
"""

from __future__ import annotations

import os
import uuid


class LocalMetadataFS:
    """POSIX metadata I/O — the default; byte-for-byte the behavior the
    snapshot store had before the seam existed."""

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def put_if_absent(self, path: str, data: str) -> None:
        """Atomic exclusive publish: raises FileExistsError if ``path``
        exists — via hard-link fail-if-exists (POSIX rename overwrites,
        link cannot), closing the check-then-rename race two concurrent
        committers would otherwise slip through."""
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        try:
            os.link(tmp, path)
        finally:
            os.unlink(tmp)

    def replace_atomic(self, path: str, data: str) -> None:
        tmp = path + f".rpl-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        os.replace(tmp, path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def unlink(self, path: str) -> None:
        os.unlink(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def walk_files(self, root: str, topdown: bool = True):
        """Yield (dirpath, filenames) bottom-up or top-down, mirroring
        os.walk's shape for the vacuum/orphan walks."""
        for dirpath, _, files in os.walk(root, topdown=topdown):
            yield dirpath, files

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def rmdir_if_empty(self, path: str) -> None:
        try:
            os.rmdir(path)
        except OSError:
            pass  # non-empty or already gone


class HadoopMetadataFS:
    """The same primitives through ``org.apache.hadoop.fs.FileSystem``
    via the active SparkSession's JVM gateway — paths may carry any
    scheme the Hadoop configuration resolves (``hdfs://``, ``s3a://``,
    ``file:`` …). See the module docstring for the per-store
    commit-atomicity contract."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    def read_text(self, path: str) -> str:
        p = self._path(path)
        fs = self._fs(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        stream = fs.open(p)
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def _write(self, path: str, data: str, overwrite: bool) -> None:
        from py4j.protocol import Py4JJavaError

        p = self._path(path)
        fs = self._fs(path)
        try:
            out = fs.create(p, overwrite)
        except Py4JJavaError as e:
            cls = e.java_exception.getClass().getName()
            if "FileAlreadyExists" in cls or "AlreadyBeingCreated" in cls:
                raise FileExistsError(path) from None
            raise
        try:
            out.write(bytearray(data.encode("utf-8")))
        finally:
            out.close()

    def put_if_absent(self, path: str, data: str) -> None:
        # exists() pre-probe narrows the window on stores whose
        # create(overwrite=false) is check-then-put (S3A without
        # conditional writes); on HDFS/file: the create IS atomic
        if self.exists(path):
            raise FileExistsError(path)
        self._write(path, data, overwrite=False)

    def replace_atomic(self, path: str, data: str) -> None:
        # overwrite-create: atomic on stores with atomic object PUT
        # (S3), truncate-then-write on HDFS — the one caller
        # (checkpoint rewrite) is content-equivalent and retried by
        # load_manifest, see the module docstring
        self._write(path, data, overwrite=True)

    def listdir(self, path: str) -> list[str]:
        p = self._path(path)
        fs = self._fs(path)
        if not fs.exists(p):
            raise FileNotFoundError(path)
        return [s.getPath().getName() for s in fs.listStatus(p)]

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._path(path))

    def isdir(self, path: str) -> bool:
        fs = self._fs(path)
        p = self._path(path)
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def unlink(self, path: str) -> None:
        self._fs(path).delete(self._path(path), False)

    def makedirs(self, path: str) -> None:
        self._fs(path).mkdirs(self._path(path))

    def walk_files(self, root: str, topdown: bool = True):
        """(dirpath, filenames) via one recursive listFiles scan,
        regrouped per directory — object stores list flat, so this is
        ONE round-trip per page instead of one per directory."""
        fs = self._fs(root)
        rp = self._path(root)
        if not fs.exists(rp):
            return
        by_dir: dict[str, list[str]] = {}
        it = fs.listFiles(rp, True)
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            by_dir.setdefault(
                p.getParent().toUri().getPath(), []
            ).append(p.getName())
        dirs = sorted(by_dir, reverse=not topdown)
        for d in dirs:
            yield d, by_dir[d]

    def getmtime(self, path: str) -> float:
        return (
            self._fs(path).getFileStatus(self._path(path)).getModificationTime()
            / 1000.0
        )

    def rmdir_if_empty(self, path: str) -> None:
        fs = self._fs(path)
        p = self._path(path)
        try:
            if fs.exists(p) and not fs.listStatus(p):
                fs.delete(p, False)
        except Exception:
            pass  # best-effort, matching the POSIX behavior
