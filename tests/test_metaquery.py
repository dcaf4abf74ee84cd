"""Metadata-only COUNT/MIN/MAX (`lake/metaquery.py`) — the Snowflake
micro-partition-metadata answer path, with every degrade-to-scan guard."""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable, delete, update
from techtalk_data_pipeline_snowpark_spark.lake.metaquery import metadata_aggregate

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("d", T.DateType()),
    ]
)


def _table(spark, root, appends=3, rows_per=100):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    for i in range(appends):
        df = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.5).alias("v"),
            F.concat(F.lit(f"n{i}_"), F.col("id")).alias("name"),
            F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
            F.date_add(F.lit(datetime.date(2020, 1, 1)), F.col("id").cast("int")).alias("d"),
        )
        t.append(df)
    return t


def test_matches_full_scan_all_types(spark, tmp_table_root):
    t = _table(spark, tmp_table_root)
    cols = ["k", "v", "name", "ts", "d"]
    r = metadata_aggregate(t, min_of=cols, max_of=cols)
    scan = (
        t.read()
        .agg(
            F.count("*").alias("c"),
            *[F.min(c).alias(f"mn_{c}") for c in cols],
            *[F.max(c).alias(f"mx_{c}") for c in cols],
        )
        .collect()[0]
    )
    assert r["count"] == scan["c"]
    for c in cols:
        assert r["min"][c] == scan[f"mn_{c}"], c
        assert r["max"][c] == scan[f"mx_{c}"], c


def test_zero_data_io(spark, tmp_table_root, monkeypatch):
    """The answer folds from the snapshot manifest — the table's scan
    entry points are never invoked."""
    t = _table(spark, tmp_table_root)

    def _boom(*a, **k):
        raise AssertionError("metadata_aggregate must not scan")

    monkeypatch.setattr(LakeTable, "read", _boom)
    monkeypatch.setattr(LakeTable, "_read_files", _boom)
    monkeypatch.setattr(LakeTable, "read_where", _boom)
    r = metadata_aggregate(t, min_of=["k"], max_of=["k"])
    assert r == {"count": 300, "min": {"k": 0}, "max": {"k": 299}}


def test_all_null_column_answers_sql_null(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.append(
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.lit(None).cast("double").alias("v"),
            F.lit("x").alias("name"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("date").alias("d"),
        )
    )
    r = metadata_aggregate(t, min_of=["v"], max_of=["v"])
    assert r == {"count": 10, "min": {"v": None}, "max": {"v": None}}


def test_mor_delete_falls_back(spark, tmp_table_root):
    t = _table(spark, tmp_table_root, appends=1)
    delete(t, F.col("k") == 5, mode="mor")
    assert metadata_aggregate(t) is None
    # but the pre-delete version still answers
    assert metadata_aggregate(t, version=t.latest_version() - 1)["count"] == 100


def test_cow_delete_stays_metadata_answerable(spark, tmp_table_root):
    t = _table(spark, tmp_table_root, appends=1)
    delete(t, F.col("k") < 10, mode="cow")
    r = metadata_aggregate(t, min_of=["k"], max_of=["k"])
    assert r == {"count": 90, "min": {"k": 10}, "max": {"k": 99}}


def test_update_reflects_new_extrema(spark, tmp_table_root):
    t = _table(spark, tmp_table_root, appends=1)
    update(t, {"v": F.lit(1e9)}, F.col("k") == 99)
    r = metadata_aggregate(t, max_of=["v"])
    assert r is not None and r["max"]["v"] == 1e9


def test_truncated_string_falls_back_only_for_that_column(spark, tmp_table_root):
    t = LakeTable.create(
        spark,
        tmp_table_root,
        T.StructType([T.StructField("k", T.LongType()), T.StructField("s", T.StringType())]),
        key_cols=["k"],
        num_buckets=2,
    )
    t.append(
        spark.range(0, 10).select(
            F.col("id").alias("k"), F.concat(F.lit("x" * 100), F.col("id")).alias("s")
        )
    )
    assert metadata_aggregate(t, min_of=["s"]) is None
    assert metadata_aggregate(t, max_of=["s"]) is None
    assert metadata_aggregate(t, min_of=["k"]) == {"count": 10, "min": {"k": 0}}


def test_nan_float_falls_back(spark, tmp_table_root):
    t = LakeTable.create(
        spark,
        tmp_table_root,
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]),
        key_cols=["k"],
        num_buckets=2,
    )
    t.append(
        spark.range(0, 10).select(
            F.col("id").alias("k"),
            F.when(F.col("id") == 3, F.lit(float("nan"))).otherwise(F.col("id") * 1.0).alias("v"),
        )
    )
    # NaN poisons the file's v stats at collect time -> not provable
    assert metadata_aggregate(t, min_of=["v"]) is None
    assert metadata_aggregate(t, min_of=["k"]) is not None


def test_missing_stats_falls_back(spark, tmp_table_root):
    t = _table(spark, tmp_table_root, appends=1)
    snap = t.snapshot()
    meta = next(iter(snap.files.values()))
    meta.pop("stats", None)  # simulate a stat-less add (collection failure)
    # operate on the tampered in-memory snapshot via a stub table
    class _Stub:
        def snapshot(self, version=None):
            return snap

    assert metadata_aggregate(_Stub(), min_of=["k"]) is None
    assert metadata_aggregate(_Stub())["count"] == 100


def test_unknown_column_raises(spark, tmp_table_root):
    t = _table(spark, tmp_table_root, appends=1)
    with pytest.raises(ValueError, match="nope"):
        metadata_aggregate(t, min_of=["nope"])
