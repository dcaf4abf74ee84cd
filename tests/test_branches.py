"""Branches, tags, and write-audit-publish.

A branch is a metadata-only fork of the main lineage (shared data/ dir, its
own log); publish squashes the branch's net delta into ONE atomic commit on
main, with snapshot-isolation rebase validation when main moved. Tags pin a
main version against vacuum. Reference parity: the reference audits stream
contents before INSERT (DataLoader.scala:21-38); WAP is the lake-format
equivalent with the audit between merge and visibility.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import (
    ConcurrentCommitError,
    FakeObjectStore,
    LakeTable,
    merge_into,
    mor_delete_keys,
    update,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, root, n=20, num_buckets=4, store=None):
    t = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=num_buckets, store=store
    )
    t.append(
        spark.range(n).withColumnRenamed("id", "k").withColumn("v", F.lit("base"))
    )
    return t


def _rows(t, version=None):
    return sorted((r.k, r.v) for r in t.read(version).collect())


def _src(spark, pairs):
    return spark.createDataFrame([Row(k=k, v=v) for k, v in pairs], SCHEMA)


def test_wap_branch_merge_publish(spark, tmp_table_root):
    """The WAP loop: merge on a branch, main unseen until publish; publish
    lands the branch's exact state as ONE commit; the branch is dropped."""
    t = _mk(spark, tmp_table_root)
    before = _rows(t)
    v_before = t.latest_version()

    br = t.create_branch("audit")
    merge_into(
        br,
        _src(spark, [(1, "upd"), (99, "new")]),
        on=["k"],
        when_matched_update="all",
        when_not_matched_insert=True,
    )
    # audit phase: branch sees the merge, main does not
    want = sorted([(k, "base") for k in range(20) if k != 1] + [(1, "upd"), (99, "new")])
    assert _rows(br) == want
    assert _rows(t) == before

    res = t.publish_branch("audit")
    assert res.version == v_before + 1  # ONE commit on main
    assert _rows(t) == want
    assert t.list_branches() == []
    # changelog consumers see the squashed publish at a single version
    ch = t.read_changelog(v_before).collect()
    assert {r._commit_version for r in ch} == {v_before + 1}
    by_type = sorted(
        (r.k, r._change_type) for r in ch if r._change_type != "update_preimage"
    )
    assert (1, "update_postimage") in by_type and (99, "insert") in by_type


def test_branch_audit_fail_drop_then_vacuum(spark, tmp_table_root):
    """Failed audit: drop the branch — main never saw the rows, and vacuum
    reclaims the branch-only files once the ref is gone (not before)."""
    t = _mk(spark, tmp_table_root)
    before = _rows(t)
    br = t.create_branch("bad")
    br.append(_src(spark, [(1000, "garbage")]))
    n_files_branch = len(br.snapshot().files)
    assert _rows(t) == before

    # ref still live: vacuum must NOT touch the branch's files
    assert t.vacuum(retain_versions=0, staging_grace_sec=0.0) == 0
    assert _rows(br)[-1] == (1000, "garbage")

    t.drop_branch("bad")
    assert t.vacuum(retain_versions=0, staging_grace_sec=0.0) > 0
    assert _rows(t) == before
    assert len(t.snapshot().files) < n_files_branch


def test_publish_rebase_over_disjoint_main_commit(spark, tmp_table_root):
    """Main advances with an append while the branch merges other keys:
    publish rebases and BOTH effects land."""
    t = _mk(spark, tmp_table_root)
    br = t.create_branch("wap")
    merge_into(
        br, _src(spark, [(2, "upd")]), on=["k"], when_matched_update="all"
    )
    t.append(_src(spark, [(500, "main-side")]))
    t.publish_branch("wap")
    got = dict(_rows(t))
    assert got[2] == "upd" and got[500] == "main-side" and got[3] == "base"


def test_publish_conflict_when_main_rewrote_same_files(spark, tmp_table_root):
    """Both sides rewrite the same bucket's files → snapshot-isolation
    validation refuses the publish and leaves the branch intact."""
    t = _mk(spark, tmp_table_root)
    br = t.create_branch("wap")
    merge_into(br, _src(spark, [(2, "branch")]), on=["k"], when_matched_update="all")
    merge_into(t, _src(spark, [(2, "main")]), on=["k"], when_matched_update="all")
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("wap")
    assert dict(_rows(t))[2] == "main"
    assert dict(_rows(br))[2] == "branch"  # intact for inspection/re-fork


def test_publish_carries_dv_refs_and_properties(spark, tmp_table_root):
    """Merge-on-read deletes staged on the branch attach to main's files at
    publish, and branch-set properties (the engine's watermark/manifest
    channel) land on main."""
    t = _mk(spark, tmp_table_root)
    br = t.create_branch("wap")
    mor_delete_keys(br, spark.createDataFrame([Row(k=3)]), ["k"])
    br.append(_src(spark, [(700, "new")]), properties={"cdc.last_lsn": "42"})
    t.publish_branch("wap")
    got = dict(_rows(t))
    assert 3 not in got and got[700] == "new"
    assert t.snapshot().properties["cdc.last_lsn"] == "42"


def test_publish_conflict_on_both_sides_property_change(spark, tmp_table_root):
    """The same property advanced on main and branch (two engines racing a
    watermark) must conflict, not silently regress main's value."""
    t = _mk(spark, tmp_table_root)
    br = t.create_branch("wap")
    br.append(_src(spark, [(701, "b")]), properties={"cdc.last_lsn": "7"})
    t.append(_src(spark, [(702, "m")]), properties={"cdc.last_lsn": "9"})
    with pytest.raises(ConcurrentCommitError):
        t.publish_branch("wap")


def test_branch_update_and_time_travel_inside_branch(spark, tmp_table_root):
    """A branch handle is a full table: UPDATE works, and time travel
    within the branch lineage (>= fork) resolves against the seed
    checkpoint even after main prunes its own metadata."""
    t = _mk(spark, tmp_table_root)
    fork_v = t.latest_version()
    br = t.create_branch("dev")
    update(br, {"v": F.lit("dev")}, F.col("k") < 3)
    assert dict(_rows(br))[0] == "dev"
    assert _rows(br, fork_v) == _rows(t)  # branch view of the fork snapshot
    # main-side metadata vacuum must not break the branch (seed checkpoint
    # lives in the branch's own log dir)
    for _ in range(20):
        t.append(_src(spark, [(9000, "x")]))
    t.vacuum_metadata(retain_versions=0)
    assert dict(_rows(br))[1] == "dev"


def test_tags_pin_snapshots_against_vacuum(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    frozen = _rows(t)
    t.create_tag("release-1")
    update(t, {"v": F.lit("after")}, F.col("k") >= 0)
    for _ in range(18):  # push a checkpoint past the tag
        t.append(_src(spark, [(800, "x")]))
    t.vacuum_metadata(retain_versions=0)
    t.vacuum(retain_versions=0, staging_grace_sec=0.0)
    assert sorted((r.k, r.v) for r in t.read_at_tag("release-1").collect()) == frozen
    assert t.list_tags() == {"release-1": 2}
    with pytest.raises(FileExistsError):
        t.create_tag("release-1")
    t.drop_tag("release-1")
    removed = t.vacuum(retain_versions=0, staging_grace_sec=0.0)
    assert removed > 0  # the tag-pinned files are reclaimable now


def test_branch_on_object_store(spark, tmp_table_root):
    """The whole WAP loop runs against object-store semantics (no rename,
    no link) — branch metadata is plain conditional-put objects."""
    store = FakeObjectStore(tmp_table_root)
    t = _mk(spark, tmp_table_root, store=store)
    br = t.create_branch("wap")
    merge_into(
        br,
        _src(spark, [(0, "upd"), (321, "new")]),
        on=["k"],
        when_matched_update="all",
        when_not_matched_insert=True,
    )
    t.publish_branch("wap")
    got = dict(_rows(t))
    assert got[0] == "upd" and got[321] == "new"


def test_create_branch_twice_and_bad_names(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=5)
    t.create_branch("a")
    with pytest.raises(FileExistsError):
        t.create_branch("a")
    assert t.create_branch("a", if_not_exists=True).log_dir.endswith("/a")
    with pytest.raises(ValueError):
        t.create_branch("../escape")
    with pytest.raises(ValueError):
        t.branch("a").create_branch("nested")
    with pytest.raises(ValueError):
        t.branch("a").vacuum()
    assert t.list_branches() == ["a"]
