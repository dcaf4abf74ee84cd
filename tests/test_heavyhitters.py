"""Exact distributed heavy hitters (`operators/heavyhitters.py`)."""

import collections
import random

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.heavyhitters import frequent_values


def _corpus(rng, n=20000):
    return [f"tok{int(rng.paretovariate(1.1))}" for _ in range(n)]


def test_matches_brute_force_zipf(spark):
    vals = _corpus(random.Random(7)) + [None] * 50
    df = spark.createDataFrame([(v,) for v in vals], ["w"]).repartition(13)
    got = {r["w"]: r["cnt"] for r in frequent_values(df, "w", 0.01).collect()}
    c = collections.Counter(v for v in vals if v is not None)
    n = sum(c.values())
    assert got == {k: v for k, v in c.items() if v > 0.01 * n}


def test_partitioning_invariance(spark):
    vals = _corpus(random.Random(11), 5000)
    a = spark.createDataFrame([(v,) for v in vals], ["w"]).repartition(17)
    b = spark.createDataFrame([(v,) for v in vals], ["w"]).coalesce(1)
    ra = {r["w"]: r["cnt"] for r in frequent_values(a, "w", 0.02).collect()}
    rb = {r["w"]: r["cnt"] for r in frequent_values(b, "w", 0.02).collect()}
    assert ra == rb and ra


def test_spread_hitter_found(spark):
    """A value frequent globally but spread thin across partitions must
    still be caught (the pigeonhole guarantee: it is over-threshold in at
    least one partition)."""
    # 40 partitions, 'hot' is ~6% of every partition (> f in each),
    # plus per-partition-unique noise values
    rows = []
    for p in range(40):
        rows += [("hot",)] * 6 + [(f"noise{p}_{i}",) for i in range(94)]
    df = spark.createDataFrame(rows, ["w"]).repartition(40)
    got = {r["w"]: r["cnt"] for r in frequent_values(df, "w", 0.05).collect()}
    assert got == {"hot": 240}


def test_threshold_is_strict_greater(spark):
    df = spark.createDataFrame([("a",)] * 25 + [("b",)] * 75, ["w"])
    got = {r["w"]: r["cnt"] for r in frequent_values(df, "w", 0.25).collect()}
    assert got == {"b": 75}  # a == 25% exactly -> excluded (strict >)


def test_edge_cases(spark):
    one = spark.createDataFrame([("x",)] * 100, ["w"])
    assert frequent_values(one, "w", 0.99).collect()[0]["cnt"] == 100
    empty = spark.createDataFrame([], "w: string")
    assert frequent_values(empty, "w", 0.5).collect() == []
    nulls = spark.createDataFrame([(None,), (None,), ("a",)], "w: string")
    got = {r["w"]: r["cnt"] for r in frequent_values(nulls, "w", 0.5).collect()}
    assert got == {"a": 1}  # n counts non-null only: n=1, 1 > 0.5


def test_validation(spark):
    df = spark.createDataFrame([("x",)], ["w"])
    with pytest.raises(ValueError):
        frequent_values(df, "w", 0.0)
    with pytest.raises(ValueError):
        frequent_values(df, "w", 1.5)


def test_plan_shape(spark):
    """The exact-count exchange must be candidate-filtered (broadcast
    left-semi before the aggregation), and phase 1 must NOT re-run inside
    the phase-2 job — candidates were collected eagerly, so the returned
    plan carries no Python stage at all."""
    vals = _corpus(random.Random(3), 3000)
    df = spark.createDataFrame([(v,) for v in vals], ["w"]).repartition(7)
    out = frequent_values(df, "w", 0.02)
    out.collect()  # AQE finalizes the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_nan_float_excluded_like_null(spark):
    """NaN cannot ride the Arrow candidate channel (pandas NaN -> null),
    so it is excluded EXPLICITLY, and n shrinks with it — a NaN flood
    must neither appear as a hitter nor inflate the denominator."""
    rows = [(float("nan"),)] * 60 + [(1.0,)] * 30 + [(2.0,)] * 10
    df = spark.createDataFrame(rows, "v: double").repartition(4)
    got = {r["v"]: r["cnt"] for r in frequent_values(df, "v", 0.5).collect()}
    assert got == {1.0: 30}  # n = 40 non-NaN; 30 > 20, 10 <= 20


def test_no_candidates_returns_empty_with_schema(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(200)], ["w"]).coalesce(1)
    out = frequent_values(df, "w", 0.5)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["w", "cnt"]
