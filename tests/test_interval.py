"""Grid-bucketed range (interval) join vs brute-force inequality join."""

import pytest
from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.operators.interval import interval_join


@pytest.fixture()
def shifts(spark):
    # (key, shift_id, start_s, end_s) — inclusive both ends
    rows = [
        ("a", 1, 100, 200),
        ("a", 2, 300, 400),
        ("b", 1, 0, 1_000_000),  # huge interval spanning many cells
    ]
    return spark.createDataFrame(rows, "k string, shift_id int, start_s long, end_s long")


@pytest.fixture()
def pings(spark):
    rows = [
        ("p1", "a", 100),   # inclusive start
        ("p2", "a", 200),   # inclusive end
        ("p3", "a", 250),   # gap -> dropped
        ("p4", "a", 399),
        ("p5", "b", 512_345),
        ("p6", "c", 150),   # no intervals for key -> dropped
    ]
    return spark.createDataFrame(rows, "pid string, k string, ts_s long")


def test_containment_semantics(shifts, pings):
    out = {
        (r.pid, r.shift_id)
        for r in interval_join(pings, shifts, on="k", granularity=50).collect()
    }
    assert out == {("p1", 1), ("p2", 1), ("p4", 2), ("p5", 1)}


@pytest.mark.parametrize("g", [1, 7, 100, 10_000_000])
def test_granularity_invariance(shifts, pings, g):
    out = {
        (r.pid, r.shift_id)
        for r in interval_join(pings, shifts, on="k", granularity=g).collect()
    }
    assert out == {("p1", 1), ("p2", 1), ("p4", 2), ("p5", 1)}


def test_overlapping_intervals_match_all(spark):
    iv = spark.createDataFrame(
        [("a", 1, 0, 100), ("a", 2, 50, 150)],
        "k string, iid int, start_s long, end_s long",
    )
    pt = spark.createDataFrame([("p", "a", 75)], "pid string, k string, ts_s long")
    out = {r.iid for r in interval_join(pt, iv, on="k", granularity=60).collect()}
    assert out == {1, 2}


def test_matches_brute_force_on_real_events(spark, sf_dir):
    from techtalk_data_pipeline_snowpark_spark.operators.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sess = session_stats(
        ev.where(F.col("event_type") == "click"), gap_seconds=14 * 86400
    ).select(
        "user_id", "session_idx", "start_s", "end_s"
    )
    # fresh scan: same-lineage self-joins resolve both sides of
    # e.user_id == s.user_id to ONE attribute (trivially true)
    ev2 = spark.read.parquet(f"{sf_dir}/events.parquet")
    errs = ev2.where(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_s"),
    )
    got = {
        (r.event_id, r.session_idx)
        for r in interval_join(errs, sess, on="user_id", granularity=3600).collect()
    }
    brute = {
        (r.event_id, r.session_idx)
        for r in errs.alias("e")
        .join(
            sess.alias("s"),
            (F.col("e.user_id") == F.col("s.user_id"))
            & (F.col("e.ts_s") >= F.col("s.start_s"))
            & (F.col("e.ts_s") <= F.col("s.end_s")),
        )
        .collect()
    }
    assert got == brute and len(got) > 0


def test_no_nested_loop_plan(shifts, pings):
    plan = (
        interval_join(pings, shifts, on="k", granularity=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bad_granularity(shifts, pings):
    with pytest.raises(ValueError):
        interval_join(pings, shifts, on="k", granularity=0)


# ------------------------------------------------------- auto-granularity
def test_auto_granularity_matches_explicit(shifts, pings):
    base = {
        (r.pid, r.shift_id)
        for r in interval_join(pings, shifts, on="k", granularity=50).collect()
    }
    auto = {
        (r.pid, r.shift_id)
        for r in interval_join(pings, shifts, on="k").collect()  # default auto
    }
    assert base == auto and len(auto) > 0


def test_auto_granularity_bounds_explosion(spark):
    """r4 verdict ask #5: a corpus where a naive g (=typical span) would
    explode the long-tail intervals 1000x. Auto-g must bound
    cells-per-interval at ~target_cells while a naive g=100 would cut the
    p99 interval into 1,001 cells."""
    from techtalk_data_pipeline_snowpark_spark.operators.interval import (
        derive_granularity,
    )

    rows = [("k", i, i * 1000, i * 1000 + 100) for i in range(99)]
    rows += [("k", 1000, 0, 100_000)]  # one 1000x-span straggler
    iv = spark.createDataFrame(rows, "k string, iid int, start_s long, end_s long")
    g = derive_granularity(iv, "start_s", "end_s", target_cells=4)
    # p99 span ~100k -> g >= 25_000: straggler covers <= 5 cells
    assert g >= 20_000
    worst = (
        iv.select(
            (F.floor(F.col("end_s") / g) - F.floor(F.col("start_s") / g) + 1).alias(
                "cells"
            )
        )
        .agg(F.max("cells"))
        .collect()[0][0]
    )
    assert worst <= 5  # naive g=100 would be 1_001 cells for the straggler
    # and the join is still exact
    pt = spark.createDataFrame(
        [("p1", "k", 50), ("p2", "k", 99_999), ("p3", "k", 5_050)],
        "pid string, k string, ts_s long",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(pt, iv, on="k").collect()
    }
    assert got == {("p1", 0), ("p1", 1000), ("p2", 1000), ("p3", 5), ("p3", 1000)}


def test_explosion_guard_raises_loudly(spark):
    iv = spark.createDataFrame(
        [("k", 1, 0, 1_000_000)], "k string, iid int, start_s long, end_s long"
    )
    pt = spark.createDataFrame([("p", "k", 5)], "pid string, k string, ts_s long")
    with pytest.raises(ValueError, match="explode"):
        interval_join(
            pt, iv, on="k", granularity=100, max_cells_per_interval=64
        )
    # same guard passes for a sane g
    assert (
        interval_join(
            pt, iv, on="k", granularity=500_000, max_cells_per_interval=64
        ).count()
        == 1
    )


def test_auto_granularity_empty_intervals(spark):
    iv = spark.createDataFrame([], "k string, iid int, start_s long, end_s long")
    pt = spark.createDataFrame([("p", "k", 5)], "pid string, k string, ts_s long")
    assert interval_join(pt, iv, on="k").count() == 0
