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
  probe before the PUT at close) — NOT atomic under concurrency. Three
  exits, in preference order: (1) enable S3 conditional writes —
  ``HadoopMetadataFS(spark, conditional_create=True)`` sets
  ``fs.s3a.create.conditional.enabled`` (Hadoop 3.4.1+ over S3's
  If-None-Match), making the exclusive create atomic at the store;
  (2) front the log with a coordination store (round 11):
  ``CoordinatedMetadataFS(HadoopMetadataFS(spark),
  FileClaimCoordinator(claims_dir))`` — the DynamoDB-LogStore pattern,
  arbitration on the claim store's atomic ``put_if_absent``, proven by
  the two-racing-committers tests in
  ``tests/test_commit_coordination.py``; (3) run single-writer.
- ``replace_atomic`` maps to ``create(overwrite=true)`` where rename-
  over-existing is unsupported; the checkpoint rewrite it serves is
  content-equivalent by construction and ``load_manifest`` retries the
  top manifest once on a severed chain, which covers the non-atomic
  window.

Reference analog: none (the reference's storage layer is a Mongo
connection string); this is lakehouse-standard log plumbing.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
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


def _stream_dir_batches(it):
    """Group a Hadoop ``listFiles`` RemoteIterator's entries into
    (dirpath, [names]) batches, yielding on every parent-directory
    change — O(one directory's names) buffered, never O(subtree).
    Factored out of ``HadoopMetadataFS.walk_files`` so the bounded-
    memory property is unit-testable without a JVM (the iterator is
    duck-typed: ``hasNext()/next()`` with Hadoop's Path shape)."""
    cur_dir: str | None = None
    names: list[str] = []
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        d = p.getParent().toUri().getPath()
        if d != cur_dir:
            if cur_dir is not None:
                yield cur_dir, names
            cur_dir, names = d, []
        names.append(p.getName())
    if cur_dir is not None:
        yield cur_dir, names


class FileClaimCoordinator:
    """Commit coordination for stores whose ``put_if_absent`` is
    check-then-put (S3A without Hadoop 3.4.1 conditional writes) — the
    DynamoDB-LogStore pattern (round 11): arbitration moves to a claim
    log in a SEPARATE store whose own ``put_if_absent`` IS atomic (a
    POSIX/NFS directory, HDFS, or any service wrapped in the MetadataFS
    interface), and the data store's write happens only after the claim
    is won.

    Protocol (all arbitration rides on the claim store's atomic
    ``put_if_absent`` — no check-then-act anywhere):

    1. A committer claims ``<md5(path)>.g0.json`` with state=pending.
       Exactly one wins; losers read the current claim.
    2. state=complete → the version is durably committed: raise
       FileExistsError (the snapshot layer maps it to a conflict).
    3. state=pending and younger than ``takeover_seconds`` → a commit is
       in flight: raise (the caller retries later; the snapshot layer's
       rebase/retry loops already do).
    4. state=pending and EXPIRED → the old winner may have died. If the
       destination file exists, its write did land: mark the claim
       complete (idempotent — any concurrent marker writes the same
       content) and raise. If not, the old winner never durably
       published, so contend for generation g+1 via another atomic
       ``put_if_absent`` — the takeover itself is raced through the
       claim store, never through replace.

    ``takeover_seconds`` trades liveness for safety margin: it must
    exceed the slowest real manifest write (seconds), and recovery
    contention is operator-scale (a crashed driver), not hot-path."""

    def __init__(self, claim_dir: str, fs=None, takeover_seconds: float = 600.0):
        self._fs = fs if fs is not None else LocalMetadataFS()
        self.claim_dir = claim_dir
        self.takeover_seconds = takeover_seconds
        self._fs.makedirs(claim_dir)

    def _gen_path(self, path: str, gen: int) -> str:
        h = hashlib.md5(path.encode()).hexdigest()
        return os.path.join(self.claim_dir, f"{h}.g{gen}.json")

    def _latest_gen(self, path: str) -> int | None:
        h = hashlib.md5(path.encode()).hexdigest()
        best = None
        for name in self._fs.listdir(self.claim_dir):
            if name.startswith(h + ".g") and name.endswith(".json"):
                try:
                    g = int(name[len(h) + 2 : -5])
                except ValueError:
                    continue
                best = g if best is None else max(best, g)
        return best

    def put_if_absent(self, path: str, write, exists) -> None:
        """Run ``write()`` iff this committer wins the claim for
        ``path``; ``exists()`` probes the destination (used only during
        crash recovery of an expired claim). Raises FileExistsError when
        another committer holds or completed the claim."""
        cur = self._latest_gen(path)
        gen = 0 if cur is None else cur
        rec = {"path": path, "state": "pending", "ts": time.time()}
        if cur is not None:
            prev = json.loads(self._fs.read_text(self._gen_path(path, cur)))
            if prev.get("state") == "complete":
                raise FileExistsError(path)
            if time.time() - prev.get("ts", 0.0) < self.takeover_seconds:
                raise FileExistsError(f"{path} (commit in flight)")
            if exists():
                # the expired winner's write DID land; finish its
                # bookkeeping (idempotent content) and report the loss
                self._fs.replace_atomic(
                    self._gen_path(path, cur),
                    json.dumps({**prev, "state": "complete"}),
                )
                raise FileExistsError(path)
            gen = cur + 1  # dead claim, no durable write: contend g+1
        self._fs.put_if_absent(self._gen_path(path, gen), json.dumps(rec))
        write()
        self._fs.replace_atomic(
            self._gen_path(path, gen), json.dumps({**rec, "state": "complete"})
        )


class CoordinatedMetadataFS:
    """Wrap a MetadataFS whose ``put_if_absent`` is NOT atomic with a
    coordinator that is (round 11): the commit-exclusivity decision
    rides on the coordinator, the bytes still live in the wrapped
    store. Drop-in for ``SnapshotTable(root, fs=...)``:

        fs = CoordinatedMetadataFS(
            HadoopMetadataFS(spark),
            FileClaimCoordinator("/shared/claims"),
        )

    Only ``put_if_absent`` changes behavior — the winner writes through
    ``replace_atomic`` (exclusivity already decided, and an S3 object
    PUT is atomic per object); every other primitive delegates."""

    def __init__(self, inner, coordinator):
        self._inner = inner
        self._coordinator = coordinator

    def put_if_absent(self, path: str, data: str) -> None:
        self._coordinator.put_if_absent(
            path,
            write=lambda: self._inner.replace_atomic(path, data),
            exists=lambda: self._inner.exists(path),
        )

    def __getattr__(self, name):
        return getattr(self._inner, name)


class HadoopMetadataFS:
    """The same primitives through ``org.apache.hadoop.fs.FileSystem``
    via the active SparkSession's JVM gateway — paths may carry any
    scheme the Hadoop configuration resolves (``hdfs://``, ``s3a://``,
    ``file:`` …). See the module docstring for the per-store
    commit-atomicity contract."""

    def __init__(self, spark, conditional_create: bool = False):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        if conditional_create:
            # Hadoop 3.4.1+ over S3 If-None-Match: create(overwrite=
            # false) becomes an atomic conditional PUT, restoring full
            # commit atomicity on S3A without a coordination store. On
            # older Hadoop the flag is unknown config (ignored) and the
            # store stays check-then-put — pair with
            # CoordinatedMetadataFS there instead.
            self._conf.set("fs.s3a.create.conditional.enabled", "true")

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
        """(dirpath, filenames) batches from one recursive listFiles
        scan — STREAMING (round 11): entries are grouped per CONSECUTIVE
        parent run and each batch yields as soon as the parent changes,
        so driver memory holds one directory's names at a time instead
        of the whole subtree (the round-10 form buffered every file
        under the root before yielding — fine at 1M manifests, wrong
        for an object store also holding the data plane). Object-store
        listings are lexicographic by key and HDFS walks per directory,
        so in practice each directory still surfaces as one batch; the
        CONTRACT is merely "a directory may appear in more than one
        batch", which every caller (vacuum unlink loop, orphan scan)
        already tolerates. ``topdown`` kept for signature parity: with
        streaming there is no global ordering to honor, and the one
        order-sensitive caller (vacuum's ``rmdir_if_empty``) is
        best-effort by design."""
        fs = self._fs(root)
        rp = self._path(root)
        if not fs.exists(rp):
            return
        yield from _stream_dir_batches(fs.listFiles(rp, True))

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
