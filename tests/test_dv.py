"""Merge-on-read deletes (deletion vectors).

``delete(mode="mor")`` commits (file, row-position) deletion vectors instead
of rewriting files (Iceberg v2 positional-delete shape). Every reader —
read(), merge target, UPDATE/DELETE discovery, changelog — must apply them;
compact() absorbs them back into clean files; vacuum retains referenced DV
parquet.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
from techtalk_data_pipeline_snowpark_spark.lake.merge import delete, merge_into, update

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame([Row(k=int(k), v=v) for k, v in rows], SCHEMA)


def _mk(spark, root, n=20, buckets=4):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=buckets)
    t.append(_df(spark, [(i, f"v{i}") for i in range(n)]))
    return t


def test_mor_delete_is_metadata_only(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    files_before = set(t.snapshot().files)
    res = delete(t, F.col("k") < 5, mode="mor")
    assert res.summary["rows_affected"] == 5
    assert res.summary["mode"] == "mor"
    snap = t.snapshot()
    # no data file added or removed — the commit is DVs + metadata only
    assert set(snap.files) == files_before
    assert any(m.get("dv") for m in snap.files.values())
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(5, 20))


def test_mor_delete_accumulates(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete(t, F.col("k") < 3, mode="mor")
    res2 = delete(t, F.col("k") < 6, mode="mor")
    # second pass only kills the still-live rows 3..5
    assert res2.summary["rows_affected"] == 3
    assert sorted(r.k for r in t.read().collect()) == list(range(6, 20))


def test_mor_delete_all_rows(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=9)
    res = delete(t, F.lit(True), mode="mor")
    assert res.summary["rows_affected"] == 9
    assert t.read().count() == 0
    # table still writable after a full MOR wipe
    t.append(_df(spark, [(100, "x")]))
    assert [r.k for r in t.read().collect()] == [100]


def test_mor_delete_no_match_is_noop(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=5)
    v = t.latest_version()
    res = delete(t, F.col("k") > 999, mode="mor")
    assert res.summary["rows_affected"] == 0
    assert not any(m.get("dv") for m in t.snapshot().files.values())
    assert t.read().count() == 5
    assert t.latest_version() == v + 1  # still a (no-op) commit


def test_time_travel_before_mor_delete(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=8)
    v = t.latest_version()
    delete(t, F.col("k") % 2 == 0, mode="mor")
    assert t.read(version=v).count() == 8
    assert t.read().count() == 4


def test_merge_after_mor_delete_does_not_resurrect(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete(t, F.col("k") < 10, mode="mor")
    # upsert keys 0..2 (dead) and 15 (live) — dead rows must not reappear
    src = _df(spark, [(0, "new0"), (1, "new1"), (2, "new2"), (15, "new15")])
    merge_into(t, src, on=["k"])
    got = {r.k: r.v for r in t.read().collect()}
    assert got[0] == "new0" and got[15] == "new15"
    # keys 3..9 stay dead (merge didn't touch them, DVs still apply)
    assert 3 not in got and 9 not in got
    assert set(got) == {0, 1, 2, 15} | set(range(10, 15)) | set(range(16, 20))


def test_update_after_mor_delete(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=10)
    delete(t, F.col("k") < 5, mode="mor")
    res = update(t, {"v": F.lit("upd")}, F.col("k") < 8)
    # only live rows 5..7 match
    assert res.summary["rows_affected"] == 3
    got = {r.k: r.v for r in t.read().collect()}
    assert set(got) == set(range(5, 10))
    assert got[5] == "upd" and got[8] == "v8"


def test_cow_delete_on_dv_file(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=10)
    delete(t, F.col("k") < 4, mode="mor")
    res = delete(t, F.col("k") < 6, mode="cow")  # rewrites hit files
    assert res.summary["rows_affected"] == 2  # only 4,5 still live
    assert sorted(r.k for r in t.read().collect()) == list(range(6, 10))


def test_changelog_emits_mor_deletes(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root, n=10)
    v0 = t.latest_version()
    delete(t, F.col("k") < 3, mode="mor")
    ch = t.read_changelog(v0).collect()
    assert {r._change_type for r in ch} == {"delete"}
    assert sorted(r.k for r in ch) == [0, 1, 2]
    # second MOR delete emits only the newly-killed rows
    v1 = t.latest_version()
    delete(t, F.col("k") < 5, mode="mor")
    ch2 = t.read_changelog(v1).collect()
    assert sorted(r.k for r in ch2) == [3, 4]


def test_changelog_rewrite_of_dv_file_no_spurious_deletes(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete(t, F.col("k") < 10, mode="mor")
    v = t.latest_version()
    # merge rewrites touched buckets; rows MOR-killed earlier must not show
    # up as deletes of THIS commit (they died in the previous one)
    merge_into(t, _df(spark, [(0, "back")]), on=["k"])
    ch = t.read_changelog(v).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append(r.k)
    assert by_type.get("insert") == [0]
    assert "delete" not in by_type


def test_compact_absorbs_dvs(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    delete(t, F.col("k") % 3 == 0, mode="mor")
    live_before = sorted(r.k for r in t.read().collect())
    v = t.latest_version()
    t.compact()
    snap = t.snapshot()
    assert not any(m.get("dv") for m in snap.files.values())
    assert sorted(r.k for r in t.read().collect()) == live_before
    # compact stays invisible to changelog consumers
    assert t.read_changelog(v).count() == 0


def test_vacuum_retains_then_drops_dv_files(spark, tmp_table_root):
    import glob
    import os

    t = _mk(spark, tmp_table_root, n=10)
    delete(t, F.col("k") < 4, mode="mor")
    t.vacuum(retain_versions=0)
    assert sorted(r.k for r in t.read().collect()) == list(range(4, 10))
    dv_files = glob.glob(os.path.join(tmp_table_root, "data", "_dv", "*.parquet"))
    assert dv_files  # referenced DVs survive vacuum
    t.compact()  # absorbs DVs — refs dropped
    t.vacuum(retain_versions=0)
    assert glob.glob(os.path.join(tmp_table_root, "data", "_dv", "*.parquet")) == []
    assert sorted(r.k for r in t.read().collect()) == list(range(4, 10))


def test_mor_unbucketed_table(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA)
    t.append(_df(spark, [(i, f"v{i}") for i in range(12)]))
    res = delete(t, F.col("k") >= 6, mode="mor")
    assert res.summary["rows_affected"] == 6
    assert sorted(r.k for r in t.read().collect()) == list(range(6))
    t.compact()
    assert sorted(r.k for r in t.read().collect()) == list(range(6))


# --------------------------------------------------------- equality deletes


def test_equality_delete_is_scan_free_metadata(spark, tmp_table_root):
    """equality_delete_keys commits the KEY SET — no data file added or
    removed, no positions computed; readers anti-join it out."""
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root)
    files_before = set(t.snapshot().files)
    res = equality_delete_keys(
        t, spark.createDataFrame([Row(k=i) for i in range(5)]), ["k"]
    )
    assert res.summary["mode"] == "equality"
    assert res.summary["keys_deleted"] == 5
    assert res.summary["rows_affected"] == -1  # unknown by design
    snap = t.snapshot()
    assert set(snap.files) == files_before
    assert any(m.get("edv") for m in snap.files.values())
    assert sorted(r.k for r in t.read().collect()) == list(range(5, 20))


def test_equality_delete_bucket_scoped_refs(spark, tmp_table_root):
    """Key-column deletes attach refs only to the touched buckets' files —
    untouched buckets never pay the read-side anti-join."""
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=40, buckets=4)
    equality_delete_keys(t, spark.createDataFrame([Row(k=1)]), ["k"])
    snap = t.snapshot()
    tagged_buckets = {m["bucket"] for m in snap.files.values() if m.get("edv")}
    assert len(tagged_buckets) == 1
    assert sorted(r.k for r in t.read().collect()) == [i for i in range(40) if i != 1]


def test_equality_delete_reinserted_key_survives(spark, tmp_table_root):
    """Files appended AFTER the equality delete never carry its ref: a
    re-inserted key must NOT be killed by the older delete (the Iceberg
    sequence-number semantics)."""
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=10)
    equality_delete_keys(t, spark.createDataFrame([Row(k=3), Row(k=7)]), ["k"])
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 4, 5, 6, 8, 9]
    t.append(_df(spark, [(3, "reborn")]))
    got = {(r.k, r.v) for r in t.read().collect()}
    assert (3, "reborn") in got and not any(k == 7 for k, _ in got)
    # merge-based reinsert too (merge rewrites the touched bucket clean)
    merge_into(t, _df(spark, [(7, "back")]), on=["k"], when_matched_update="all")
    assert (7, "back") in {(r.k, r.v) for r in t.read().collect()}


def test_equality_delete_stacks_with_positional_dv(spark, tmp_table_root):
    """A file can carry BOTH a positional DV and an equality ref; both
    apply."""
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=12, buckets=1)
    delete(t, F.col("k") < 3, mode="mor")
    equality_delete_keys(t, spark.createDataFrame([Row(k=5), Row(k=6)]), ["k"])
    assert sorted(r.k for r in t.read().collect()) == [3, 4, 7, 8, 9, 10, 11]


def test_equality_delete_changelog_and_compact(spark, tmp_table_root):
    """Changelog emits exactly the LIVE rows the key set killed (an
    already-dead key emits nothing); compact absorbs the refs; vacuum then
    drops the edv parquet."""
    import os

    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=10)
    delete(t, F.col("k") == 4, mode="mor")
    v0 = t.latest_version()
    equality_delete_keys(
        t, spark.createDataFrame([Row(k=4), Row(k=5), Row(k=99)]), ["k"]
    )
    ch = t.read_changelog(v0).collect()
    assert {(r.k, r._change_type) for r in ch} == {(5, "delete")}
    t.compact()
    snap = t.snapshot()
    assert not any(m.get("edv") or m.get("dv") for m in snap.files.values())
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 6, 7, 8, 9]
    t.vacuum(retain_versions=0)
    edv_dir = os.path.join(tmp_table_root, "data", "_edv")
    assert not os.path.isdir(edv_dir) or not os.listdir(edv_dir)


def test_equality_delete_empty_keyset_noop(spark, tmp_table_root):
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=5)
    res = equality_delete_keys(
        t, spark.createDataFrame([], "k long"), ["k"]
    )
    assert res.summary["keys_deleted"] == 0
    assert res.summary["files_affected"] == 0
    assert t.read().count() == 5


def test_equality_delete_survives_key_widening(spark, tmp_table_root):
    """An edv parquet written against an int key keeps filtering after the
    key column widens to long (the anti-join coerces); re-inserted long
    keys still survive the old delete."""
    schema_int = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
    )
    schema_long = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = LakeTable.create(spark, tmp_table_root, schema_int, key_cols=["k"], num_buckets=2)
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(8)], schema_int))
    equality_delete_keys(
        t, spark.createDataFrame([(3,)], "k int"), ["k"]
    )
    t.commit_rewrite([], [], "evolve-schema", schema=schema_long)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 4, 5, 6, 7]
    # re-insert the deleted key under the WIDENED type: must survive, and
    # bucket-hash normalization keeps it in the same bucket as the int era
    t.append(spark.createDataFrame([(3, "reborn")], schema_long))
    got = {(r.k, r.v) for r in t.read().collect()}
    assert (3, "reborn") in got
    assert len(got) == 8


def test_changelog_spans_equality_delete_then_merge(spark, tmp_table_root):
    """A changelog range containing an equality-delete commit FOLLOWED by a
    normal rewrite commit must classify the later commit's updates/inserts
    correctly (review finding: the edv branch shadowed the key-name list
    and crashed every later iteration)."""
    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=10)
    v0 = t.latest_version()
    equality_delete_keys(t, spark.createDataFrame([Row(k=1)]), ["k"])
    merge_into(
        t, _df(spark, [(2, "updated"), (99, "new")]),
        on=["k"], when_matched_update="all",
    )
    rows = t.read_changelog(v0).collect()
    ch = sorted((r.k, r._change_type, r._commit_version) for r in rows)
    # MULTISET assertion including version: a set of (k, type) tuples would
    # collapse the spurious duplicate (1, 'delete') that the un-narrowed
    # pre-image bug emitted at the merge's rewrite version (rows already
    # killed by the equality delete resurrecting as deletes again).
    assert ch == [
        (1, "delete", v0 + 1),
        (2, "update_postimage", v0 + 2),
        (99, "insert", v0 + 2),
    ]
    assert sum(1 for k, typ, _ in ch if k == 1 and typ == "delete") == 1


def test_dv_edv_refs_survive_checkpoint(spark, tmp_table_root):
    """Snapshot checkpoints must carry positional-DV and equality-delete
    refs: a snapshot rebuilt FROM a checkpoint (log replay skipped) has to
    keep filtering the dead rows."""
    import glob
    import os

    from techtalk_data_pipeline_snowpark_spark.lake import equality_delete_keys

    t = _mk(spark, tmp_table_root, n=12, buckets=2)
    delete(t, F.col("k") == 2, mode="mor")
    equality_delete_keys(t, spark.createDataFrame([Row(k=5)]), ["k"])
    # push past the checkpoint cadence (every 16 commits)
    for i in range(16):
        t.append(_df(spark, [(100 + i, f"x{i}")]))
    assert t._available_checkpoints(), "expected a checkpoint to exist"
    snap_cp = t.snapshot()
    assert any(m.get("dv") for m in snap_cp.files.values())
    assert any(m.get("edv") for m in snap_cp.files.values())
    live = sorted(r.k for r in t.read().collect())
    assert 2 not in live and 5 not in live and 100 in live
    # force a full log replay (checkpoints hidden) — must agree exactly
    hidden = []
    for p in glob.glob(os.path.join(tmp_table_root, "_log", "*.checkpoint.json")):
        os.rename(p, p + ".hidden")
        hidden.append(p)
    try:
        snap_full = t.snapshot()
        assert snap_cp.files == snap_full.files
    finally:
        for p in hidden:
            os.rename(p + ".hidden", p)
