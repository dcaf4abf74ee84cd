"""Timestamp-based time travel + time-based snapshot expiry — Snowflake
``AT(TIMESTAMP => ...)`` / Iceberg expireSnapshots(olderThan) parity on the
lake log's own commit timestamps."""

import time

import pytest
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable

SCHEMA = T.StructType(
    [T.StructField("k", T.StringType()), T.StructField("v", T.LongType())]
)


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    marks = {}
    for i in range(3):
        t.append(spark.createDataFrame([(f"k{i}", i)], SCHEMA))
        marks[t.latest_version()] = time.time()
        time.sleep(0.02)  # commit timestamps must be distinguishable
    return t, marks


def test_read_as_of_timestamp(spark, tmp_path):
    t, marks = _mk(spark, str(tmp_path / "t"))
    for version, ts in marks.items():
        assert t.version_as_of(ts) == version
        got = {r["k"] for r in t.read(timestamp=ts).collect()}
        want = {f"k{i}" for i in range(version - 1)}  # create is version 1
        assert got == want
    with pytest.raises(ValueError):
        t.version_as_of(marks[2] - 1e6)  # before the table existed
    with pytest.raises(ValueError):
        t.read(version=2, timestamp=marks[2])  # mutually exclusive


def test_expire_snapshots_by_time(spark, tmp_path, monkeypatch):
    # checkpoint every commit so the metadata prune has a replay base at
    # the retention horizon (otherwise it conservatively keeps everything)
    import techtalk_data_pipeline_snowpark_spark.lake.table as table_mod

    monkeypatch.setattr(table_mod, "CHECKPOINT_EVERY", 1)
    t, marks = _mk(spark, str(tmp_path / "t"))
    cutoff = marks[3]  # keep version 3 (the as-of base) and version 4
    time.sleep(0.02)
    t.append(spark.createDataFrame([("k3", 3)], SCHEMA))  # version 5
    res = t.expire_snapshots(older_than=cutoff + 1e-4)
    assert res["retained_from"] == 3
    # retained versions still read; expired ones raise
    assert t.read(version=3).count() == 2
    assert t.read().count() == 4
    assert t.oldest_version() == 3  # metadata beyond the horizon pruned
    with pytest.raises(Exception):
        t.snapshot(2)
    # as-of at the cutoff still answers (the base was kept)
    assert t.version_as_of(cutoff) == 3


def test_expired_files_are_reclaimed(spark, tmp_path):
    t, _ = _mk(spark, str(tmp_path / "t"))
    # rewrite everything so old files become expirable
    t.compact()
    before = set(t.store.walk_files("data"))
    res = t.expire_snapshots(older_than=time.time())
    after = set(t.store.walk_files("data"))
    assert res["data_files_removed"] > 0
    assert after < before
    assert t.read().count() == 3  # state intact


def test_metadata_only_tail_raises_not_missing_files(spark, tmp_path, monkeypatch):
    """ADVICE r5: after vacuum with a checkpoint gap, log entries survive
    back to the newest checkpoint <= the horizon while those versions' DATA
    files were reclaimed. version_as_of must raise the documented retention
    ValueError, not let read() fail on missing files."""
    import techtalk_data_pipeline_snowpark_spark.lake.table as table_mod

    monkeypatch.setattr(table_mod, "CHECKPOINT_EVERY", 2)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2
    )  # v1
    marks = {}
    for i in range(3):  # v2..v4
        t.append(spark.createDataFrame([(f"k{i}", i)], SCHEMA))
        marks[t.latest_version()] = time.time()
        time.sleep(0.02)
    t.compact()  # v5: rewrites every data file — v<=4 files become dead
    marks[5] = time.time()
    time.sleep(0.02)
    t.append(spark.createDataFrame([("k9", 9)], SCHEMA))  # v6
    marks[6] = time.time()
    t.vacuum(retain_versions=1, staging_grace_sec=0)  # data back to v5 only
    t.vacuum_metadata(retain_versions=1)  # metadata back to checkpoint v4
    assert t.oldest_version() == 4  # the metadata-only tail exists
    # v4 resolves in the log but its data is gone → documented ValueError
    with pytest.raises(ValueError, match="retention"):
        t.version_as_of(marks[4])
    with pytest.raises(ValueError, match="retention"):
        t.read(timestamp=marks[4])
    # within the data horizon both paths still answer
    assert t.version_as_of(marks[5]) == 5
    assert t.read(timestamp=marks[5]).count() == 3
    assert t.version_as_of(marks[6]) == 6
