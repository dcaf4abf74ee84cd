"""Tests for operators/decontaminate.py — benchmark n-gram overlap."""

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.decontaminate import (
    contaminated_ids,
    decontaminate,
    flag_contaminated,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about distributed query engines"),
            (3, "alpha beta gamma delta epsilon zeta eta theta"),
            (4, "short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [
            (100, "benchmark question: the quick brown fox jumps today"),
            (101, "alpha beta gamma delta are greek letters"),
        ],
        ["doc_id", "text"],
    )
    return train, bench


def test_planted_overlap_flagged(spark):
    train, bench = _corpus(spark)
    # 4-grams: doc 1 shares "the quick brown fox" (and more); doc 3 shares
    # "alpha beta gamma delta"; docs 2 and 4 share nothing.
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in flag_contaminated(train, bench, "doc_id", "text", n=4).collect()
    }
    assert flags == {1: True, 2: False, 3: True, 4: False}


def test_decontaminate_drops_exactly_the_hits(spark):
    train, bench = _corpus(spark)
    kept = sorted(
        r["doc_id"] for r in decontaminate(train, bench, "doc_id", "text", n=4).collect()
    )
    assert kept == [2, 4]


def test_ngram_size_controls_sensitivity(spark):
    train, bench = _corpus(spark)
    # With a large n no planted overlap is long enough.
    hits = contaminated_ids(train, bench, "doc_id", "text", n=8).count()
    assert hits == 0


def test_bench_side_is_broadcast(spark):
    train, bench = _corpus(spark)
    plan = (
        contaminated_ids(train, bench, "doc_id", "text", n=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_no_broadcast_falls_back_to_shuffled_join(spark):
    train, bench = _corpus(spark)
    out = contaminated_ids(
        train, bench, "doc_id", "text", n=4, broadcast_bench=False
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]


def test_flag_preserves_all_train_columns_and_rows(spark):
    train, bench = _corpus(spark)
    out = flag_contaminated(
        train.withColumn("extra", F.lit(7)), bench, "doc_id", "text", n=4
    )
    assert out.count() == 4
    assert set(out.columns) == {"doc_id", "text", "extra", "contaminated"}
