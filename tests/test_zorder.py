"""Z-order multi-column clustering: after compact(zorder=True) the zone
maps prune point/range predicates on EITHER clustered column to a fraction
of the files per bucket, while a 1-D sort only prunes its lead column —
and every pruned read stays exactly correct."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
from techtalk_data_pipeline_snowpark_spark.lake.stats import prune_files
from techtalk_data_pipeline_snowpark_spark.lake.zorder import zorder_expr

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ]
)


def _grid_table(spark, root, sort_by, zorder):
    """64x64 grid of (a, b), 2 hash buckets, compacted to 4 files/bucket."""
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    df = (
        spark.range(64 * 64)
        .withColumnRenamed("id", "k")
        .withColumn("a", F.col("k") % 64)
        .withColumn("b", (F.col("k") / F.lit(64)).cast("long"))
    )
    t.append(df)
    res = t.compact(max_files_per_bucket=4, sort_by=sort_by, zorder=zorder)
    assert res.summary.get("clustered_by") == sort_by
    return t


def _files_per_bucket_matching(snap, cond):
    kept = prune_files(snap.files, cond)
    per_bucket: dict = {}
    for p in kept:
        bkt = snap.files[p].get("bucket")
        per_bucket[bkt] = per_bucket.get(bkt, 0) + 1
    return per_bucket


def test_zorder_prunes_on_either_column(spark, tmp_table_root):
    t = _grid_table(spark, tmp_table_root, ["a", "b"], zorder=True)
    snap = t.snapshot()
    by_bucket: dict = {}
    for m in snap.files.values():
        by_bucket[m["bucket"]] = by_bucket.get(m["bucket"], 0) + 1
    assert all(n <= 4 for n in by_bucket.values())
    # each file covers a quadrant-ish hyper-rectangle: a point predicate on
    # EITHER column intersects at most half the files in every bucket
    for col in ("a", "b"):
        per_bucket = _files_per_bucket_matching(snap, F.col(col) == 7)
        assert per_bucket, f"predicate on {col} pruned everything"
        assert all(n <= 2 for n in per_bucket.values()), (col, per_bucket)


def test_one_dim_sort_does_not_prune_second_column(spark, tmp_table_root):
    """The control: 1-D clustering on `a` leaves every file with the full
    `b` range — z-order is what buys multi-column pruning."""
    t = _grid_table(spark, tmp_table_root, ["a"], zorder=False)
    snap = t.snapshot()
    pruned_a = _files_per_bucket_matching(snap, F.col("a") == 7)
    assert all(n <= 2 for n in pruned_a.values())
    pruned_b = _files_per_bucket_matching(snap, F.col("b") == 7)
    total: dict = {}
    for m in snap.files.values():
        total[m["bucket"]] = total.get(m["bucket"], 0) + 1
    assert pruned_b == total  # nothing skipped on b


def test_zorder_reads_stay_exact(spark, tmp_table_root):
    t = _grid_table(spark, tmp_table_root, ["a", "b"], zorder=True)
    for cond in (
        F.col("a") == 7,
        F.col("b") == 7,
        (F.col("a") >= 10) & (F.col("a") < 20),
        (F.col("b") >= 48) & (F.col("a") < 4),
    ):
        got = {r.k for r in t.read_where(cond).collect()}
        want = {r.k for r in t.read().filter(cond).collect()}
        assert got == want and got


def test_zorder_range_predicates_prune(spark, tmp_table_root):
    t = _grid_table(spark, tmp_table_root, ["a", "b"], zorder=True)
    snap = t.snapshot()
    # a narrow range on each column also skips files, not just points
    for cond in (F.col("a") < 8, F.col("b") >= 56):
        per_bucket = _files_per_bucket_matching(snap, cond)
        assert all(n <= 2 for n in per_bucket.values()), per_bucket


def test_zorder_handles_skew_and_nulls(spark, tmp_table_root):
    """A zipfian column (90% one value) plus NULLs must not crash the cut
    computation or lose rows — heavy values share a cell, NULLs cluster at
    the curve's end."""
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key_cols=["k"], num_buckets=2)
    df = (
        spark.range(4000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "a", F.when(F.col("k") % 10 < 9, F.lit(5)).otherwise(F.col("k") % 64)
        )
        .withColumn(
            "b", F.when(F.col("k") % 7 == 0, F.lit(None).cast("long")).otherwise(F.col("k") % 64)
        )
    )
    t.append(df)
    t.compact(max_files_per_bucket=4, sort_by=["a", "b"], zorder=True)
    assert t.read().count() == 4000
    got = {r.k for r in t.read_where(F.col("b") == 3).collect()}
    want = {r.k for r in t.read().filter(F.col("b") == 3).collect()}
    assert got == want


def test_zorder_rejects_unorderable_and_single_column(spark):
    df = spark.range(10).withColumn("s", F.lit("x")).withColumn("a", F.col("id"))
    with pytest.raises(ValueError):
        zorder_expr(df, ["a"])
    with pytest.raises(ValueError):
        zorder_expr(df, ["a", "s"])


def test_zorder_unbucketed_table(spark, tmp_table_root):
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_root, schema)
    df = (
        spark.range(64 * 64)
        .withColumn("a", F.col("id") % 64)
        .withColumn("b", (F.col("id") / F.lit(64)).cast("long"))
        .drop("id")
    )
    t.append(df)
    t.compact(max_files_per_bucket=4, sort_by=["a", "b"], zorder=True)
    snap = t.snapshot()
    assert len(snap.files) <= 4
    for col in ("a", "b"):
        kept = prune_files(snap.files, F.col(col) == 7)
        assert 0 < len(kept) <= 2, (col, len(kept))
    got = {(r.a, r.b) for r in t.read_where(F.col("a") == 7).collect()}
    assert got == {(7, b) for b in range(64)}


def test_clustering_survives_merge(spark, tmp_table_root):
    """The lake.cluster_by stamp makes MERGE rewrites preserve the z-order
    layout: after an upsert into every bucket, predicates on EITHER
    clustered column still prune to a fraction of each rewritten bucket's
    files, file counts stay at the compact's target, and reads are exact."""
    from techtalk_data_pipeline_snowpark_spark.lake import merge_into

    t = _grid_table(spark, tmp_table_root, ["a", "b"], zorder=True)
    import json as _json
    from techtalk_data_pipeline_snowpark_spark.lake.table import PROP_CLUSTER_BY

    spec = _json.loads(t.snapshot().properties[PROP_CLUSTER_BY])
    assert spec["zorder"] and spec["cols"] == ["a", "b"] and spec["cuts"]

    # upsert rows spread across the whole key range — every bucket rewrites
    src = (
        spark.range(0, 64 * 64, 7)
        .withColumnRenamed("id", "k")
        .withColumn("a", F.col("k") % 64)
        .withColumn("b", (F.col("k") / F.lit(64)).cast("long"))
    )
    merge_into(
        t, src, on=["k"],
        when_matched_update={"a": F.col("s.a"), "b": F.col("s.b")},
        when_not_matched_insert=True,
    )
    snap = t.snapshot()
    by_bucket: dict = {}
    for m in snap.files.values():
        by_bucket[m["bucket"]] = by_bucket.get(m["bucket"], 0) + 1
    assert all(n <= 4 for n in by_bucket.values()), by_bucket
    for col in ("a", "b"):
        per_bucket = _files_per_bucket_matching(snap, F.col(col) == 7)
        assert per_bucket, f"predicate on {col} pruned everything"
        assert all(n <= 2 for n in per_bucket.values()), (col, per_bucket)
    assert t.read().count() == 64 * 64
    got = {(r.k, r.a, r.b) for r in t.read_where(F.col("a") == 7).collect()}
    assert got == {(7 + 64 * i, 7, i) for i in range(64)}


def test_clustering_survives_update_delete_1d(spark, tmp_table_root):
    """1-D stamps survive DML too: an UPDATE rewrite keeps range-disjoint
    files per bucket at the compact's file target."""
    from techtalk_data_pipeline_snowpark_spark.lake.merge import update

    t = _grid_table(spark, tmp_table_root, ["a"], zorder=False)
    snap0 = t.snapshot()
    assert all(
        n <= 4 for n in
        __import__("collections").Counter(
            m["bucket"] for m in snap0.files.values()
        ).values()
    )
    update(t, {"b": F.col("b") + 1000}, F.col("a") == 3)
    snap = t.snapshot()
    per_bucket = _files_per_bucket_matching(snap, F.col("a") == 9)
    assert per_bucket and all(n <= 1 for n in per_bucket.values()), per_bucket
    assert t.read().count() == 64 * 64
    assert t.read_where(F.col("a") == 3).agg(F.min("b")).first()[0] >= 1000


def test_plain_compact_preserves_stamp(spark, tmp_table_root):
    """A maintenance compact() with no sort_by must keep the persisted
    z-order layout: fragmenting appends then a plain compact leaves every
    bucket at the stamp's file target with multi-column pruning intact —
    and a second compact() is a no-op (the stamp's range-disjoint slices
    are layout, not fragmentation)."""
    t = _grid_table(spark, tmp_table_root, ["a", "b"], zorder=True)
    # fragment: a few small appends land unclustered files in each bucket
    for i in range(3):
        extra = (
            spark.range(64 * 64 + i * 100, 64 * 64 + (i + 1) * 100)
            .withColumnRenamed("id", "k")
            .withColumn("a", F.col("k") % 64)
            .withColumn("b", (F.col("k") / F.lit(64)).cast("long"))
        )
        t.append(extra)
    res = t.compact()  # no sort_by: must follow the stamp, not unsort
    assert res.summary.get("clustering_preserved") is True
    snap = t.snapshot()
    by_bucket: dict = {}
    for m in snap.files.values():
        by_bucket[m["bucket"]] = by_bucket.get(m["bucket"], 0) + 1
    assert all(n <= 4 for n in by_bucket.values()), by_bucket
    for col in ("a", "b"):
        per_bucket = _files_per_bucket_matching(snap, F.col(col) == 7)
        assert per_bucket, f"predicate on {col} pruned everything"
        assert all(n <= 2 for n in per_bucket.values()), (col, per_bucket)
    assert t.read().count() == 64 * 64 + 300
    got = {r.k for r in t.read_where(F.col("a") == 7).collect()}
    want = {r.k for r in t.read().filter(F.col("a") == 7).collect()}
    assert got == want and got
    # idempotence: the stamped layout is already at target — no rewrite
    res2 = t.compact()
    assert res2.summary == {"files_compacted": 0}


def test_plain_compact_preserves_stamp_unbucketed(spark, tmp_table_root):
    """Same guarantee on an unbucketed table: plain compact() keeps the
    stamped multi-column layout instead of coalescing to one file."""
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.LongType())]
    )
    t = LakeTable.create(spark, tmp_table_root, schema)
    df = (
        spark.range(64 * 64)
        .withColumn("a", F.col("id") % 64)
        .withColumn("b", (F.col("id") / F.lit(64)).cast("long"))
        .drop("id")
    )
    t.append(df)
    t.compact(max_files_per_bucket=4, sort_by=["a", "b"], zorder=True)
    t.append(spark.range(5).withColumn("a", F.lit(1)).withColumn("b", F.lit(2)).drop("id"))
    res = t.compact()
    assert res.summary.get("clustering_preserved") is True
    snap = t.snapshot()
    assert len(snap.files) <= 4
    for col in ("a", "b"):
        kept = prune_files(snap.files, F.col(col) == 9)
        assert 0 < len(kept) <= 2, (col, len(kept))
    assert t.read().count() == 64 * 64 + 5
    assert t.compact().summary == {"files_compacted": 0}


def test_unstamped_table_merges_unchanged(spark, tmp_table_root):
    """No stamp → cluster_write_args is {} and DML behaves exactly as
    before (regression guard for the default path)."""
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.append(spark.range(100).withColumnRenamed("id", "k")
             .withColumn("a", F.col("k")).withColumn("b", F.col("k")))
    assert t.cluster_write_args(t.snapshot()) == {}
    from techtalk_data_pipeline_snowpark_spark.lake import merge_into
    src = (spark.range(5).withColumnRenamed("id", "k")
           .withColumn("a", F.lit(1)).withColumn("b", F.lit(2)))
    merge_into(t, src, on=["k"], when_matched_update={"a": F.col("s.a")},
               when_not_matched_insert=True)
    assert t.read().count() == 100
