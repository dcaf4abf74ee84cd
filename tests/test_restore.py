"""Tests for LakeTable.restore — metadata-only rollback to a snapshot."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
from techtalk_data_pipeline_snowpark_spark.lake.merge import delete as lake_delete
from techtalk_data_pipeline_snowpark_spark.lake.merge import update as lake_update

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _rows(t, version=None):
    return sorted(
        (r["id"], r["v"]) for r in t.read(version=version).select("id", "v").collect()
    )


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _mk(spark, tmp_path, n=3):
    """Table with n append versions: ids 0..9, then +10..19, ..."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["id"], num_buckets=4
    )
    for i in range(n):
        t.append(_batch(spark, i * 10, (i + 1) * 10))
    return t


def test_restore_undoes_appends_and_preserves_history(spark, tmp_path):
    t = _mk(spark, tmp_path, n=3)
    v_bad = t.latest_version()
    v_good = v_bad - 1  # after the second append (ids 0..19)
    assert len(_rows(t)) == 30
    res = t.restore(v_good)
    assert res.summary["restored_to"] == v_good
    # live state == target state, exactly
    assert _rows(t) == _rows(t, version=v_good)
    assert len(_rows(t)) == 20
    # history preserved: the rolled-back version is still time-travelable
    assert len(_rows(t, version=v_bad)) == 30
    # the restore itself is a new version, not a log rewrite
    assert t.latest_version() == v_bad + 1
    # metadata-only minimal entry: v_bad's files removed, nothing re-added
    # (v_good's files were never touched by the bad append)
    assert res.summary["files_readded"] == 0
    assert res.summary["files_removed"] > 0


def test_restore_after_update_delete_round_trips(spark, tmp_path):
    t = _mk(spark, tmp_path, n=2)
    v0 = t.latest_version()
    before = _rows(t)
    lake_update(t, {"v": F.lit(0)}, F.col("id") < 5)
    lake_delete(t, F.col("id") >= 15)
    v_mutated = t.latest_version()
    assert _rows(t) != before
    t.restore(v0)
    assert _rows(t) == before
    # restore FORWARD: roll back the restore itself (any version works)
    t.restore(v_mutated)
    assert len(_rows(t)) == 15
    assert all(v == 0 for i, v in _rows(t) if i < 5)


def test_restore_resets_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path, n=1)
    v0 = t.latest_version()
    evolved = spark.range(100, 105).select(
        F.col("id"),
        (F.col("id") * 2).alias("v"),
        F.lit("x").alias("extra"),
    )
    t.overwrite(evolved)  # schema evolution rides the overwrite entry
    assert "extra" in t.read().columns
    t.restore(v0)
    assert "extra" not in t.read().columns
    assert _rows(t) == _rows(t, version=v0)


def test_restore_validations(spark, tmp_path):
    t = _mk(spark, tmp_path, n=2)
    with pytest.raises(ValueError, match="already the live version"):
        t.restore(t.latest_version())
    with pytest.raises(ValueError, match="outside the retained log"):
        t.restore(99)
    with pytest.raises(ValueError, match="outside the retained log"):
        t.restore(0)


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    t = _mk(spark, tmp_path, n=2)
    v0 = 2  # first append
    # rewrite everything so the appends' files become dead, then reclaim
    t.overwrite(_batch(spark, 0, 5))
    t.vacuum(retain_versions=0, staging_grace_sec=0.0)
    with pytest.raises(ValueError, match="retention"):
        t.restore(v0)


def test_restore_rolls_back_cdc_lsn_for_replay(spark, tmp_path):
    """The ops loop the feature exists for: a bad epoch lands, restore
    undoes it, and a re-replay re-applies it (PROP_LAST_LSN rides the
    restored properties, so exactly-once resumes from the target)."""
    from techtalk_data_pipeline_snowpark_spark.cdc import CdcEngine
    from techtalk_data_pipeline_snowpark_spark.fixtures.generators import (
        change_events,
    )

    ev = change_events(spark, 600, n_repos=5, seed=7).localCheckpoint()
    eng = CdcEngine(spark, str(tmp_path / "cdc"), num_buckets=4)
    eng.replay(ev, max_lsn=300)
    t = eng.table()
    v_good = t.latest_version()
    good = sorted(
        map(tuple, t.read().select("repo", "path", "lsn").collect())
    )
    eng.replay(ev)  # the "bad" tail epoch(s)
    assert t.latest_version() > v_good
    t.restore(v_good)
    assert (
        sorted(map(tuple, t.read().select("repo", "path", "lsn").collect()))
        == good
    )
    # re-replay converges to the same final state as a never-rolled-back
    # lineage (exactly-once resumes from the restored LSN watermark)
    eng.replay(ev)
    eng2 = CdcEngine(spark, str(tmp_path / "cdc2"), num_buckets=4)
    eng2.replay(ev)
    a = sorted(map(tuple, t.read().select("repo", "path", "lsn").collect()))
    b = sorted(
        map(tuple, eng2.table().read().select("repo", "path", "lsn").collect())
    )
    assert a == b


def test_restore_cli_flag(spark, tmp_path, capsys):
    """spark-submit ops surface: --restore-to rolls back and exits 0
    without touching the replay path (no --events required)."""
    import json

    from spark_submit_main import main

    t = _mk(spark, tmp_path, n=3)
    v_good = t.latest_version() - 1
    rc = main(["--table", str(tmp_path / "t"), "--restore-to", str(v_good)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["restored_to"] == v_good
    assert out["rows"] == 20
    assert out["new_version"] == t.latest_version()
    assert _rows(t) == _rows(t, version=v_good)


def test_history_and_restore_to_timestamp(spark, tmp_path):
    import time

    t = _mk(spark, tmp_path, n=2)
    ts_after_v3 = time.time()
    t.append(_batch(spark, 20, 30))
    h = t.history()
    assert [e["version"] for e in h] == [4, 3, 2, 1]
    assert h[0]["operation"] == "append" and h[0]["files_added"] > 0
    assert t.history(limit=2)[0]["version"] == 4
    res = t.restore_to_timestamp(ts_after_v3)
    assert res.summary["restored_to"] == 3
    assert len(_rows(t)) == 20
    # the restore itself shows up in history with its provenance
    top = t.history(limit=1)[0]
    assert top["operation"] == "restore"
    assert top["summary"]["restored_to"] == 3


def test_history_cli_flag(spark, tmp_path, capsys):
    import json

    from spark_submit_main import main

    t = _mk(spark, tmp_path, n=3)
    rc = main(["--table", str(tmp_path / "t"), "--history", "2"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [e["version"] for e in out["history"]] == [4, 3]
    assert out["history"][0]["operation"] == "append"
