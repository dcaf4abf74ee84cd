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
