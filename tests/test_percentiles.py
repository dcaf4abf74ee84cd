"""Exact distributed percentiles (`operators/percentiles.py`)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.percentiles import (
    exact_percentiles,
    exact_percentiles_by_group,
)


def _disc(sorted_vals, p):
    """Reference: percentile_disc = value at 1-based rank ceil(p*n)."""
    return sorted_vals[math.ceil(p * len(sorted_vals)) - 1]


def _check(spark, vals, fractions, num_partitions=None):
    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(7)
    got = {
        r["p"]: r["value"]
        for r in exact_percentiles(df, "x", fractions, num_partitions).collect()
    }
    clean = sorted(v for v in vals if v is not None)
    want = {float(p): _disc(clean, p) for p in fractions}
    assert got == want


def test_matches_rank_definition_with_dups_and_nulls(spark):
    rng = random.Random(3)
    vals = [rng.randint(0, 50) for _ in range(5000)] + [None] * 40
    _check(spark, vals, [0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0])


def test_floats_and_more_partitions_than_values(spark):
    rng = random.Random(9)
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(300)]
    _check(spark, vals, [0.5, 0.95], num_partitions=64)


def test_single_value_and_single_row(spark):
    _check(spark, [42] * 100, [0.1, 0.5, 1.0])
    _check(spark, [7], [0.5, 1.0])


def test_empty_and_all_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x: int")
    assert exact_percentiles(df, "x", [0.5]).count() == 0
    assert exact_percentiles(df.where(F.lit(False)), "x", [0.5]).count() == 0


def test_bad_fractions_rejected(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError):
        exact_percentiles(df, "x", [])
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            exact_percentiles(df, "x", [bad])


def test_nan_rejected_loudly(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),)], "x: double")
    with pytest.raises(Exception, match="NaN"):
        exact_percentiles(df, "x", [0.5]).collect()


def test_by_group_matches_rank_definition(spark):
    rng = random.Random(21)
    rows = [
        (f"g{rng.randint(0, 4)}", rng.randint(0, 30)) for _ in range(3000)
    ] + [("g0", None), ("gnull", None)]
    df = spark.createDataFrame(rows, ["g", "x"]).repartition(9)
    fr = [0.25, 0.5, 0.99, 1.0]
    got = {
        (r["g"], r["p"]): r["value"]
        for r in exact_percentiles_by_group(df, ["g"], "x", fr).collect()
    }
    by_g = {}
    for g, x in rows:
        if x is not None:
            by_g.setdefault(g, []).append(x)
    want = {
        (g, float(p)): _disc(sorted(vs), p) for g, vs in by_g.items() for p in fr
    }
    assert got == want  # gnull (all-null group) absent from both


def test_by_group_single_window_pass(spark):
    """All fractions must share ONE window + ONE aggregation — no
    per-fraction re-execution (no Union of repeated windows)."""
    df = spark.createDataFrame([("a", i) for i in range(50)], ["g", "x"])
    out = exact_percentiles_by_group(df, ["g"], "x", [0.1, 0.5, 0.9])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    # exactly two Window nodes (running cum + group total) sharing one
    # partitioning, REGARDLESS of how many fractions were asked for
    assert plan.count("Window") == 2
    out5 = exact_percentiles_by_group(df, ["g"], "x", [0.1, 0.3, 0.5, 0.7, 0.9])
    assert out5._jdf.queryExecution().executedPlan().toString().count("Window") == 2


def test_by_group_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["g", "x"])
    with pytest.raises(ValueError):
        exact_percentiles_by_group(df, ["g"], "x", [])
    with pytest.raises(ValueError):
        exact_percentiles_by_group(df, ["g"], "x", [2.0])


def test_no_global_sort_partition(spark):
    """The plan past the checkpoint must not funnel through a single
    ordered partition: the only Sort is the partition-LOCAL window sort
    (prints `false`), never a global one (prints `true`)."""
    vals = [(i % 997,) for i in range(4000)]
    df = spark.createDataFrame(vals, ["x"]).repartition(11)
    out = exact_percentiles(df, "x", [0.5, 0.9], num_partitions=13)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" in plan  # the window sort is there...
    assert "], true, 0" not in plan  # ...and no Sort is global
    got = {r["p"]: r["value"] for r in out.collect()}
    clean = sorted(v for (v,) in vals)
    assert got == {0.5: _disc(clean, 0.5), 0.9: _disc(clean, 0.9)}
