"""LakeTable.count_rows — metadata answer with scan fallback."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable, delete

SCHEMA = T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.LongType())])


def _t(spark, root, n=100):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.append(spark.range(0, n).select(F.col("id").alias("k"), F.col("id").alias("v")))
    return t


def test_count_rows_metadata_path(spark, tmp_table_root, monkeypatch):
    t = _t(spark, tmp_table_root)
    monkeypatch.setattr(
        LakeTable, "read", lambda *a, **k: (_ for _ in ()).throw(AssertionError("scanned"))
    )
    assert t.count_rows() == 100


def test_count_rows_scan_fallback_after_mor_delete(spark, tmp_table_root):
    t = _t(spark, tmp_table_root)
    delete(t, F.col("k") < 10, mode="mor")
    # metadata is unprovable (DV refs) -> scan path must still be exact
    assert t.count_rows() == 90
    # and the pre-delete version still answers from metadata
    assert t.count_rows(version=t.latest_version() - 1) == 100
