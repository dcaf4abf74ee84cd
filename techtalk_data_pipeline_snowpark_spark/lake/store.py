"""TableStore — the driver-side storage protocol behind LakeTable.

LakeTable's correctness rests on exactly four storage guarantees:

1. **Conditional put** of a metadata object (the optimistic-concurrency
   commit: version N is written by exactly one winner).
2. **Finalize** of staged data files into their final names (files become
   *eligible* to be referenced; visibility still comes only from the log
   entry, so finalize itself needs no atomicity).
3. **Listing** of metadata/staging prefixes.
4. **Delete** of unreferenced objects (vacuum).

Everything else — Spark writing staged parquet, Spark/pyarrow reading data
files, footer-stats collection — goes through file URIs that the execution
engine resolves natively (local paths here; ``s3a://`` / ``abfss://`` on a
cluster), exactly as Iceberg and Delta do. This module therefore abstracts
only the four driver-side operations, with two implementations:

- :class:`PosixStore` — the default. Conditional put = write-temp +
  ``os.link`` (atomic, EEXIST on race); finalize = same-volume ``rename``.
- :class:`FakeObjectStore` — object-store semantics on local disk, for
  tests: **no link, no rename, no fsync, no directories**. Conditional put
  = single-request atomic create (``open(..., "xb")``, the moral twin of
  HTTP ``PUT`` + ``If-None-Match: *``); finalize = server-side COPY then
  DELETE of the staged object. A test can monkeypatch ``os.link`` /
  ``os.rename`` / ``os.replace`` to raise and the whole LakeTable driver
  path still runs green against this store.

Real-service mapping (what a production impl of each method calls):

===================  ============================  =========================
method               S3                             ADLS Gen2 / GCS
===================  ============================  =========================
put_if_absent        PUT + ``If-None-Match: *``    ADLS: Create(conflict=fail)
                     (S3 conditional writes)       GCS: ``ifGenerationMatch=0``
finalize             COPY (CopyObject) + DELETE,   ADLS: atomic Rename
                     or write direct-to-final      GCS: Rewrite + Delete
list_dir             ListObjectsV2 (prefix+delim)  ListPaths / Objects.list
walk_files           ListObjectsV2 (prefix)        same, no delimiter
delete / delete_dir  DeleteObject(s)               DeletePath(recursive)
ensure_dir           no-op (keys, not dirs)        no-op
===================  ============================  =========================

Reference parity note: the reference's tables live in Snowflake, which owns
this problem entirely (FDN files on S3 behind a metadata service) — the
reference has no analogous seam to copy. This design follows the public
Iceberg catalog/FileIO split instead.
"""

from __future__ import annotations

import os
import shutil
import time


class TableStore:
    """Abstract driver-side storage for one table root.

    All paths are RELATIVE to the table root. Implementations must be safe
    under concurrent writers for :meth:`put_if_absent` (the commit race);
    other methods are single-writer per staged object by construction
    (UUID-named staging).
    """

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        """Atomically create ``rel`` with ``data`` iff it does not exist.
        Returns True on win, False if the object already existed. This is
        the ONLY primitive the commit protocol needs."""
        raise NotImplementedError

    def read_bytes(self, rel: str) -> bytes:
        raise NotImplementedError

    def exists(self, rel: str) -> bool:
        """Does the object exist? (S3: HEAD Object; ADLS/GCS: GetProperties /
        Objects.get.) Used by time travel to verify a resolved snapshot's
        data files survived vacuum before handing the version to a reader."""
        raise NotImplementedError

    def size(self, rel: str) -> int:
        """Object size in bytes (the HEAD Content-Length). Used to decide
        whether a commit's stats/bloom pass is worth a distributed job
        (lake/diststats.py) — missing objects report 0, never raise."""
        raise NotImplementedError

    def list_dir(self, rel: str) -> list[str]:
        """Immediate child names under ``rel`` (one path segment, no
        separators) — missing prefix lists as empty, like an object store."""
        raise NotImplementedError

    def walk_files(self, rel: str) -> list[str]:
        """All file paths under ``rel`` recursively, as root-relative
        paths. Missing prefix → []."""
        raise NotImplementedError

    def finalize(self, moves: list[tuple[str, str]]) -> None:
        """Move each staged object to its final name. Finalized-but-never-
        committed objects are orphans vacuum reclaims — no atomicity needed
        across the batch."""
        raise NotImplementedError

    def delete(self, rel: str) -> None:
        """Delete one object (missing → no-op: deletes must be idempotent,
        vacuum can race a concurrent vacuum)."""
        raise NotImplementedError

    def delete_dir(self, rel: str) -> None:
        """Delete everything under the prefix (missing → no-op)."""
        raise NotImplementedError

    def ensure_dir(self, rel: str) -> None:
        """Make the prefix writable for the execution engine. No-op on key-
        value object stores; mkdir -p on filesystems."""
        raise NotImplementedError

    def is_dir(self, rel: str) -> bool:
        raise NotImplementedError

    def newest_mtime(self, rel: str) -> float:
        """Newest modification time of any object under the prefix (the
        prefix's own mtime if empty). Object stores expose LastModified per
        object; used only for vacuum's staging grace window."""
        raise NotImplementedError


class PosixStore(TableStore):
    """Default store: a POSIX filesystem shared between driver and
    executors (local runs, NFS, HDFS-via-fuse). Conditional put uses the
    write-temp + ``os.link`` trick — ``link`` is atomic and raises EEXIST
    when another writer won the version."""

    def __init__(self, root: str):
        self.root = root

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        import uuid

        final = self._abs(rel)
        tmp = os.path.join(os.path.dirname(final), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic; EEXIST on race
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read_bytes(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as f:
            return f.read()

    def exists(self, rel: str) -> bool:
        return os.path.isfile(self._abs(rel))

    def size(self, rel: str) -> int:
        try:
            return os.path.getsize(self._abs(rel))
        except OSError:
            return 0

    def list_dir(self, rel: str) -> list[str]:
        d = self._abs(rel)
        if not os.path.isdir(d):
            return []
        return os.listdir(d)

    def walk_files(self, rel: str) -> list[str]:
        base = self._abs(rel)
        out = []
        for dirpath, _, files in os.walk(base):
            for fn in files:
                out.append(
                    os.path.relpath(os.path.join(dirpath, fn), self.root)
                )
        return out

    def finalize(self, moves: list[tuple[str, str]]) -> None:
        for src, dst in moves:
            dst_abs = self._abs(dst)
            os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
            os.rename(self._abs(src), dst_abs)

    def delete(self, rel: str) -> None:
        try:
            os.unlink(self._abs(rel))
        except FileNotFoundError:
            pass

    def delete_dir(self, rel: str) -> None:
        shutil.rmtree(self._abs(rel), ignore_errors=True)

    def ensure_dir(self, rel: str) -> None:
        os.makedirs(self._abs(rel), exist_ok=True)

    def is_dir(self, rel: str) -> bool:
        return os.path.isdir(self._abs(rel))

    def newest_mtime(self, rel: str) -> float:
        base = self._abs(rel)
        return max(
            (
                os.path.getmtime(os.path.join(r, f))
                for r, _, fs in os.walk(base)
                for f in fs
            ),
            default=os.path.getmtime(base),
        )


class FakeObjectStore(TableStore):
    """Object-store semantics emulated on local disk (tests only).

    Honors the constraints a real S3/GCS/ADLS driver lives under:

    - **No rename, no link.** Staged objects are finalized by server-side
      COPY + DELETE (``CopyObject`` in S3 terms). A monkeypatch that makes
      ``os.rename``/``os.link``/``os.replace`` raise proves the table never
      needs them when running on this store (tests/test_store.py).
    - **Conditional put is one atomic request**, not write-then-move:
      ``open(path, "xb")`` creates-if-absent in a single syscall, the exact
      semantics of ``PUT`` + ``If-None-Match: *`` (and GCS
      ``ifGenerationMatch=0``). A lost race raises ``FileExistsError``
      before any byte lands, like the HTTP 412.
    - **Directories are an illusion**: ``ensure_dir`` only exists so local
      Spark can write under the prefix; a real object store needs nothing.

    Op counters (``puts``, ``copies``, ``deletes``, ``lists``) let tests
    assert request-amplification properties — e.g. finalize of K files is
    exactly K copies + K deletes, one commit is one conditional put.
    """

    def __init__(self, root: str):
        self.root = root
        self.puts = 0
        self.copies = 0
        self.deletes = 0
        self.lists = 0

    def _abs(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def put_if_absent(self, rel: str, data: bytes) -> bool:
        self.puts += 1
        path = self._abs(rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        return True

    def read_bytes(self, rel: str) -> bytes:
        with open(self._abs(rel), "rb") as f:
            return f.read()

    def exists(self, rel: str) -> bool:
        self.lists += 1  # HEAD Object counts as a (metadata) request
        return os.path.isfile(self._abs(rel))

    def size(self, rel: str) -> int:
        self.lists += 1  # HEAD Object
        try:
            return os.path.getsize(self._abs(rel))
        except OSError:
            return 0

    def list_dir(self, rel: str) -> list[str]:
        self.lists += 1
        d = self._abs(rel)
        if not os.path.isdir(d):
            return []
        return os.listdir(d)

    def walk_files(self, rel: str) -> list[str]:
        self.lists += 1
        base = self._abs(rel)
        out = []
        for dirpath, _, files in os.walk(base):
            for fn in files:
                out.append(
                    os.path.relpath(os.path.join(dirpath, fn), self.root)
                )
        return out

    def finalize(self, moves: list[tuple[str, str]]) -> None:
        # server-side copy + delete — the S3 mapping (no rename exists)
        for src, dst in moves:
            src_abs, dst_abs = self._abs(src), self._abs(dst)
            os.makedirs(os.path.dirname(dst_abs), exist_ok=True)
            with open(src_abs, "rb") as fi, open(dst_abs, "wb") as fo:
                shutil.copyfileobj(fi, fo)
            self.copies += 1
            os.unlink(src_abs)
            self.deletes += 1

    def delete(self, rel: str) -> None:
        self.deletes += 1
        try:
            os.unlink(self._abs(rel))
        except FileNotFoundError:
            pass

    def delete_dir(self, rel: str) -> None:
        # object stores delete a "dir" by listing the prefix and deleting
        # each object — emulate exactly that (then drop the empty local
        # dirs, which a real store wouldn't have)
        for rel_f in self.walk_files(rel):
            self.delete(rel_f)
        shutil.rmtree(self._abs(rel), ignore_errors=True)

    def ensure_dir(self, rel: str) -> None:
        # a real object store needs nothing here; local Spark needs the dir
        os.makedirs(self._abs(rel), exist_ok=True)

    def is_dir(self, rel: str) -> bool:
        return os.path.isdir(self._abs(rel))

    def newest_mtime(self, rel: str) -> float:
        base = self._abs(rel)
        if not os.path.exists(base):
            return time.time()
        return max(
            (
                os.path.getmtime(os.path.join(r, f))
                for r, _, fs in os.walk(base)
                for f in fs
            ),
            default=os.path.getmtime(base),
        )
