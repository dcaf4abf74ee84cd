"""LakeTable — a minimal versioned-parquet table format with atomic commits.

Plays the role that Snowflake tables + multi-statement transactions play in
the reference (SnowflakeUtils.scala:36-45,68-81 `executeInTransaction`;
stream offsets advance atomically with the DML at commit). Here a *single
atomic commit* carries data-file adds/removes, the current schema, arbitrary
properties (the CDC commit-epoch manifest lives here), and merge metrics —
so "stream consume + MERGE commit together" becomes "one log-entry link".

Layout (local FS or any FS with atomic same-dir rename/link)::

    <root>/
      _log/00000000000000000001.json     # one JSON entry per version
      data/b=<bucket>/<uuid>.parquet     # bucketed tables
      data/<uuid>.parquet                # unbucketed tables

Commit protocol: write ``.tmp-<uuid>`` then ``os.link`` to the final
version-numbered name. ``link`` is atomic and fails with EEXIST on a
concurrent writer → optimistic concurrency, single winner per version.
Data files written before a failed commit are unreferenced orphans (cleaned
by ``vacuum``), never visible — readers only see files listed in the log.

Scale posture:
- Buckets = hash(key) % N assigned with Spark's Murmur3 ``F.hash`` (stable,
  JVM-side). MERGE rewrites only buckets containing source keys
  (copy-on-write at bucket granularity), so a small epoch over a huge table
  touches a bounded file set. N is chosen at create time for the target
  table size (100 TB / N buckets ≈ executor-digestible units).
- The log is O(versions) small JSON; snapshot reconstruction replays from
  the newest *checkpoint* (written every CHECKPOINT_EVERY commits, same
  atomic link protocol), so ``snapshot()`` is O(CHECKPOINT_EVERY) log reads
  regardless of table age — a long-running CDC tail (10^2–10^4 epochs) has
  flat per-epoch driver cost instead of O(versions²) replay. This mirrors
  Iceberg/Delta metadata checkpointing.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_DIR = "_log"
DATA_DIR = "data"
# Snapshot checkpoint cadence: every K commits the full table state is
# written alongside the log. K bounds both the replay work per snapshot()
# and the wasted work when a checkpoint write loses a race (it's an
# optimization — losing it never loses data).
CHECKPOINT_EVERY = 16


def bucket_expr(key_cols: list[str], num_buckets: int):
    """Deterministic bucket id: pmod(murmur3(keys), N) — matches what any
    executor computes, so bucket pruning in MERGE is exact."""
    return F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(num_buckets))


@dataclass
class Snapshot:
    version: int
    schema: T.StructType
    files: dict[str, dict]  # rel_path -> {"rows": int, "bucket": int|None}
    key_cols: list[str]
    num_buckets: int | None
    properties: dict

    def files_in_buckets(self, buckets: set[int]) -> list[str]:
        return [p for p, m in self.files.items() if m.get("bucket") in buckets]


@dataclass
class CommitResult:
    version: int
    summary: dict = field(default_factory=dict)


class ConcurrentCommitError(RuntimeError):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------------------------------------------------------------- DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str] | None = None,
        num_buckets: int | None = None,
        if_not_exists: bool = False,
        properties: dict | None = None,
    ) -> "LakeTable":
        t = cls(spark, root)
        if t.exists():
            if if_not_exists:
                return t
            raise FileExistsError(f"lake table already exists at {root}")
        os.makedirs(os.path.join(root, LOG_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, DATA_DIR), exist_ok=True)
        t._commit(
            {
                "operation": "create",
                "schema": schema.json(),
                "key_cols": key_cols or [],
                "num_buckets": num_buckets,
                "add": [],
                "remove": [],
                "properties": properties or {},
                "summary": {},
            },
            expected_version=1,
        )
        return t

    def exists(self) -> bool:
        """True iff at least one COMMITTED log entry exists — in-flight
        ``.tmp-*`` files from a concurrent creator don't count (they made
        exists() true while snapshot() still raised, crashing racers
        outside their creation-race handler)."""
        d = os.path.join(self.root, LOG_DIR)
        if not os.path.isdir(d):
            return False
        return any(
            e.endswith(".json") and not e.startswith(".") and ".checkpoint." not in e
            for e in os.listdir(d)
        )

    # ---------------------------------------------------------------- log
    def _log_path(self, version: int) -> str:
        return os.path.join(self.root, LOG_DIR, f"{version:020d}.json")

    def latest_version(self) -> int:
        entries = os.listdir(os.path.join(self.root, LOG_DIR))
        versions = [
            int(e.split(".")[0])
            for e in entries
            if e.endswith(".json") and ".checkpoint." not in e and not e.startswith(".")
        ]
        if not versions:
            raise FileNotFoundError(f"no commits in {self.root}")
        return max(versions)

    def log_entries(self, start: int = 1, end: int | None = None) -> list[dict]:
        end = end if end is not None else self.latest_version()
        out = []
        for v in range(start, end + 1):
            with open(self._log_path(v)) as f:
                e = json.load(f)
            e["version"] = v
            out.append(e)
        return out

    def _commit(self, entry: dict, expected_version: int | None = None) -> CommitResult:
        version = expected_version or self.latest_version() + 1
        entry = dict(entry)
        entry["version"] = version
        entry["timestamp"] = time.time()
        tmp = os.path.join(self.root, LOG_DIR, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._log_path(version))  # atomic; EEXIST on race
        except FileExistsError as e:
            raise ConcurrentCommitError(
                f"version {version} already committed at {self.root}"
            ) from e
        finally:
            os.unlink(tmp)
        if version % CHECKPOINT_EVERY == 0:
            try:
                self._write_checkpoint(version)
            except Exception:
                # a checkpoint is a pure optimization — never fail or roll
                # back an already-durable commit because of it.
                pass
        return CommitResult(version=version, summary=entry.get("summary", {}))

    # ---------------------------------------------------------- checkpoints
    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.root, LOG_DIR, f"{version:020d}.checkpoint.json")

    def _available_checkpoints(self) -> list[int]:
        d = os.path.join(self.root, LOG_DIR)
        return sorted(
            int(e.split(".")[0])
            for e in os.listdir(d)
            if e.endswith(".checkpoint.json") and not e.startswith(".")
        )

    def _write_checkpoint(self, version: int) -> None:
        snap = self.snapshot(version)  # itself replays from the prior checkpoint
        payload = {
            "version": version,
            "schema": snap.schema.json(),
            "key_cols": snap.key_cols,
            "num_buckets": snap.num_buckets,
            "files": snap.files,
            "properties": snap.properties,
        }
        tmp = os.path.join(self.root, LOG_DIR, f".tmp-cp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, self._checkpoint_path(version))
        except FileExistsError:
            pass  # concurrent reader already checkpointed this version
        finally:
            os.unlink(tmp)

    # ------------------------------------------------------------ snapshot
    def snapshot(self, version: int | None = None) -> Snapshot:
        version = version if version is not None else self.latest_version()
        files: dict[str, dict] = {}
        schema_json = None
        key_cols: list[str] = []
        num_buckets = None
        props: dict = {}
        start = 1
        cps = [v for v in self._available_checkpoints() if v <= version]
        if cps:
            with open(self._checkpoint_path(max(cps))) as f:
                cp = json.load(f)
            files = {p: dict(m) for p, m in cp["files"].items()}
            schema_json = cp["schema"]
            key_cols = cp["key_cols"]
            num_buckets = cp["num_buckets"]
            props = dict(cp["properties"])
            start = cp["version"] + 1
        for e in self.log_entries(start, version):
            if e.get("schema"):
                schema_json = e["schema"]
            if e.get("key_cols"):
                key_cols = e["key_cols"]
            if e.get("num_buckets") is not None:
                num_buckets = e["num_buckets"]
            for rm in e.get("remove", []):
                files.pop(rm, None)
            for add in e.get("add", []):
                meta = {"rows": add.get("rows"), "bucket": add.get("bucket")}
                if add.get("stats"):
                    meta["stats"] = add["stats"]
                files[add["path"]] = meta
            props.update(e.get("properties", {}))
        schema = T.StructType.fromJson(json.loads(schema_json))
        return Snapshot(version, schema, files, key_cols, num_buckets, props)

    # ---------------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        snap = self.snapshot(version)
        return self._read_files(list(snap.files), snap.schema)

    def _read_files(self, rel_paths: list[str], schema: T.StructType) -> DataFrame:
        if not rel_paths:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, p) for p in rel_paths]
        # Explicit schema → old files missing newly-added columns read as
        # null; int32 files under a widened long column are upcast by the
        # parquet vectorized reader (verified in tests).
        return self.spark.read.schema(schema).parquet(*paths)

    def read_where(self, condition, version: int | None = None) -> DataFrame:
        """Zone-map-pruned scan: files whose min/max stats cannot satisfy
        ``condition`` are dropped driver-side before the parquet read plan
        is even built; the predicate still filters every surviving row
        (pruning is a pure optimization). At 100 TB a selective predicate
        turns a full-table scan into a handful of file reads — the Spark
        equivalent of Snowflake micro-partition pruning."""
        from .stats import prune_files

        snap = self.snapshot(version)
        cand = prune_files(snap.files, condition)
        df = self._read_files(cand, snap.schema)
        return df if condition is None else df.where(condition)

    def read_incremental(
        self,
        start_version: int,
        end_version: int | None = None,
        on_rewrite: str = "error",
    ) -> DataFrame:
        """Changelog scan: new/changed rows in (start_version, end_version].

        This is the Spark-side equivalent of a Snowflake stream read
        (SnowflakeUtils.scala:46-66): only changes since the last consumed
        offset. Append commits contribute their added files directly (a
        file-list scan, no diff work). For merge/update/delete/overwrite
        commits, ``on_rewrite`` picks the behavior:

        - ``"error"`` (default): raise — the conservative contract for
          consumers that assume append-only upstreams.
        - ``"diff"``: snapshot-diff fallback — emit the commit's inserted +
          updated (post-image) rows via ``read_changelog``; deletes are not
          emitted (a row stream has nowhere to put them — consume
          ``read_changelog`` directly if delete visibility is needed).
        """
        end_version = end_version if end_version is not None else self.latest_version()
        snap = self.snapshot(end_version)
        added: list[str] = []
        rewrite_versions: list[int] = []
        for e in self.log_entries(start_version + 1, end_version):
            if e.get("operation") in ("append", "create"):
                added.extend(a["path"] for a in e.get("add", []))
            elif e.get("operation") == "compact":
                continue  # row-set-invariant by construction — no changes
            elif on_rewrite == "diff":
                rewrite_versions.append(e["version"])
            else:
                raise ValueError(
                    f"incremental scan over non-append commit v{e['version']} "
                    f"({e.get('operation')}); pass on_rewrite='diff' or use "
                    f"read_changelog"
                )
        out = self._read_files(added, snap.schema)
        for v in rewrite_versions:
            ch = self.read_changelog(v - 1, v).where(
                F.col("_change_type") != "delete"
            )
            out = out.unionByName(
                ch.drop("_change_type", "_commit_version"), allowMissingColumns=True
            )
        return out

    def read_changelog(
        self, start_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed for (start_version, end_version]: table
        columns + ``_change_type`` (insert | update_postimage | delete) +
        ``_commit_version``.

        Append commits are insert rows straight from their added files. For
        rewrite commits (merge/update/delete/overwrite) the changes are
        recovered by a snapshot diff scoped to the commit's own add/remove
        file sets — at 100 TB that is the touched buckets only, never the
        whole table. ``exceptAll`` gives exact multiset semantics; when the
        table has key columns, changed rows are split into updates (key
        existed before) vs inserts, and pre-image rows whose key survives
        are suppressed so an update emits exactly one post-image row.
        """
        end_version = end_version if end_version is not None else self.latest_version()
        snap = self.snapshot(end_version)
        schema = snap.schema
        keys = snap.key_cols
        spark = self.spark
        pieces: list[DataFrame] = []

        def _tag(df: DataFrame, change: str, version: int) -> DataFrame:
            return df.select(
                *[F.col(f.name) for f in schema.fields],
                F.lit(change).alias("_change_type"),
                F.lit(version).cast("long").alias("_commit_version"),
            )

        for e in self.log_entries(start_version + 1, end_version):
            v = e["version"]
            adds = [a["path"] for a in e.get("add", [])]
            removes = e.get("remove", [])
            op = e.get("operation")
            if op in ("append", "create"):
                if adds:
                    pieces.append(_tag(self._read_files(adds, schema), "insert", v))
                continue
            if op == "compact" or (not adds and not removes):
                # compact is row-set-invariant (its diff is empty by
                # construction — don't pay the exceptAll to prove it);
                # evolve-schema / empty epochs are metadata-only
                continue
            new_rows = self._read_files(adds, schema)
            old_rows = self._read_files(removes, schema)
            changed = new_rows.exceptAll(old_rows)
            removed = old_rows.exceptAll(new_rows)
            if keys:
                old_keys = old_rows.select(*keys).distinct()
                new_keys = new_rows.select(*keys).distinct()
                pieces.append(
                    _tag(changed.join(old_keys, on=keys, how="leftsemi"),
                         "update_postimage", v)
                )
                pieces.append(
                    _tag(changed.join(old_keys, on=keys, how="left_anti"), "insert", v)
                )
                pieces.append(
                    _tag(removed.join(new_keys, on=keys, how="left_anti"), "delete", v)
                )
            else:
                pieces.append(_tag(changed, "insert", v))
                pieces.append(_tag(removed, "delete", v))
        if not pieces:
            empty_schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField("_change_type", T.StringType()),
                    T.StructField("_commit_version", T.LongType()),
                ]
            )
            return spark.createDataFrame([], empty_schema)
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    # --------------------------------------------------------------- write
    def _stage_dataframe(
        self,
        df: DataFrame,
        schema: T.StructType,
        num_buckets: int | None,
        key_cols: list[str],
        files_per_bucket: int | None = None,
    ) -> list[dict]:
        """Write df into data/ and return add-entries (not yet committed)."""
        staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex}")
        adds: list[dict] = []
        # INT96 (Spark's legacy default) carries no parquet column stats, so
        # timestamp zone maps would be empty; TIMESTAMP_MICROS is the
        # deprecation-path encoding and every modern reader (incl. DuckDB,
        # pyarrow) reads it natively.
        self.spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        ordered = [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        if num_buckets:
            out = df.select(*ordered, bucket_expr(key_cols, num_buckets).alias("_b"))
            # One shuffle keyed by (bucket, salt). Write parallelism is NOT
            # capped at num_buckets: when the session has more task slots
            # than buckets, a per-key salt splits each bucket into
            # files_per_bucket files so every slot writes (r1 finding: the
            # staging write was the serial tail whenever cores > buckets).
            if files_per_bucket is None:
                # actual task slots, not spark.sql.shuffle.partitions: the
                # conf default (200) would fragment every bucket into
                # 200/N files on an untuned session. Cap the fan-out — the
                # point is busy write slots, not unbounded small files.
                slots = self.spark.sparkContext.defaultParallelism
                par = min(
                    int(
                        self.spark.conf.get(
                            "spark.sql.shuffle.partitions", str(slots)
                        )
                    ),
                    slots,
                )
                files_per_bucket = max(1, min(par // num_buckets, 8))
            if files_per_bucket > 1:
                salt = F.pmod(
                    F.xxhash64(*[F.col(c) for c in key_cols]),
                    F.lit(files_per_bucket),
                )
                out.repartition(
                    num_buckets * files_per_bucket, F.col("_b"), salt
                ).write.partitionBy("_b").mode("overwrite").parquet(staging)
            else:
                out.repartition(num_buckets, "_b").write.partitionBy("_b").mode(
                    "overwrite"
                ).parquet(staging)
            for bdir in os.listdir(staging):
                if not bdir.startswith("_b="):
                    continue
                b = int(bdir.split("=")[1])
                os.makedirs(os.path.join(self.root, DATA_DIR, f"b={b}"), exist_ok=True)
                for fn in os.listdir(os.path.join(staging, bdir)):
                    if not fn.endswith(".parquet"):
                        continue
                    rel = f"{DATA_DIR}/b={b}/{uuid.uuid4().hex}.parquet"
                    os.rename(
                        os.path.join(staging, bdir, fn),
                        os.path.join(self.root, rel),
                    )
                    adds.append({"path": rel, "bucket": b})
        else:
            df.select(*ordered).write.mode("overwrite").parquet(staging)
            for fn in os.listdir(staging):
                if fn.endswith(".parquet"):
                    rel = f"{DATA_DIR}/{uuid.uuid4().hex}.parquet"
                    os.rename(os.path.join(staging, fn), os.path.join(self.root, rel))
                    adds.append({"path": rel, "bucket": None})
        shutil.rmtree(staging, ignore_errors=True)
        # zone maps: per-file min/max/null-count from the parquet footers the
        # write just produced (no data pages read) — ride the add-entries so
        # every snapshot can prune mutations/scans driver-side (lake/stats.py)
        from .stats import enrich_adds_with_stats

        enrich_adds_with_stats(self.root, adds, schema)
        return adds

    def append(self, df: DataFrame, properties: dict | None = None) -> CommitResult:
        snap = self.snapshot()
        adds = self._stage_dataframe(df, snap.schema, snap.num_buckets, snap.key_cols)
        return self._commit(
            {
                "operation": "append",
                "add": adds,
                "remove": [],
                "properties": properties or {},
                "summary": {},
            },
            expected_version=snap.version + 1,
        )

    def overwrite(
        self, df: DataFrame, schema: T.StructType | None = None, properties: dict | None = None
    ) -> CommitResult:
        snap = self.snapshot()
        schema = schema or df.schema
        adds = self._stage_dataframe(df, schema, snap.num_buckets, snap.key_cols)
        return self._commit(
            {
                "operation": "overwrite",
                "schema": schema.json(),
                "add": adds,
                "remove": list(snap.files),
                "properties": properties or {},
                "summary": {},
            },
            expected_version=snap.version + 1,
        )

    def commit_rewrite(
        self,
        adds: list[dict],
        removes: list[str],
        operation: str,
        schema: T.StructType | None = None,
        properties: dict | None = None,
        summary: dict | None = None,
        expected_version: int | None = None,
    ) -> CommitResult:
        entry = {
            "operation": operation,
            "add": adds,
            "remove": removes,
            "properties": properties or {},
            "summary": summary or {},
        }
        if schema is not None:
            entry["schema"] = schema.json()
        return self._commit(entry, expected_version=expected_version)

    # ------------------------------------------------------------- utility
    def compact(self, max_files_per_bucket: int = 1) -> CommitResult:
        """OPTIMIZE: rewrite buckets whose file count exceeds the target
        into consolidated files (1 file per compacted bucket). The row set
        is unchanged — read_changelog emits NOTHING for a compact commit
        (the snapshot diff cancels exactly), so stream consumers are
        unaffected. A long CDC tail runs this periodically; at 100 TB it
        is the same touched-bucket-scoped rewrite a merge does, minus the
        join."""
        snap = self.snapshot()
        if snap.num_buckets:
            by_bucket: dict[int, list[str]] = {}
            for p, m in snap.files.items():
                by_bucket.setdefault(m.get("bucket"), []).append(p)
            victims = [
                p
                for b, paths in by_bucket.items()
                if len(paths) > max_files_per_bucket
                for p in paths
            ]
            if not victims:
                return CommitResult(version=snap.version, summary={"files_compacted": 0})
            df = self._read_files(victims, snap.schema)
            adds = self._stage_dataframe(
                df, snap.schema, snap.num_buckets, snap.key_cols, files_per_bucket=1
            )
        else:
            victims = list(snap.files)
            if len(victims) <= max_files_per_bucket:
                return CommitResult(version=snap.version, summary={"files_compacted": 0})
            df = self._read_files(victims, snap.schema).coalesce(1)
            adds = self._stage_dataframe(df, snap.schema, None, [])
        return self.commit_rewrite(
            adds=adds,
            removes=victims,
            operation="compact",
            summary={"files_compacted": len(victims), "files_written": len(adds)},
            expected_version=snap.version + 1,
        )

    def vacuum(self, retain_versions: int = 0) -> int:
        """Delete data files not referenced by the retained snapshots
        (orphans from failed commits / rewritten buckets).

        ``retain_versions=K`` keeps files referenced by the last K+1
        snapshots, so time-travel reads within that horizon stay valid
        (Iceberg expire-snapshots semantics). Returns count removed."""
        latest = self.latest_version()
        live: set[str] = set()
        for v in range(max(1, latest - retain_versions), latest + 1):
            live.update(
                os.path.join(self.root, p) for p in self.snapshot(v).files
            )
        removed = 0
        for dirpath, _, files in os.walk(os.path.join(self.root, DATA_DIR)):
            for fn in files:
                p = os.path.join(dirpath, fn)
                if p not in live:
                    os.unlink(p)
                    removed += 1
        return removed

    def history(self) -> list[dict]:
        return self.log_entries()
