"""Structured-Streaming CDC front-end + SamplePipeline DAG wiring
(SURVEY.md §2.11, §3 entry point 1)."""

import os

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.cdc import CdcEngine
from techtalk_data_pipeline_snowpark_spark.fixtures.generators import change_events
from techtalk_data_pipeline_snowpark_spark.pipeline.sample import build_sample_pipeline
from techtalk_data_pipeline_snowpark_spark.streaming.cdc_stream import stream_replay


def test_stream_replay_matches_batch(spark, tmp_path):
    """Land the log as 3 ordered chunk files; availableNow drain through
    the engine must converge to the batch-replay state, and a restart with
    the same checkpoint must be a no-op (exactly-once effects)."""
    ev = change_events(spark, 1200, n_repos=6, paths_per_repo=8, seed=21)
    events_dir = str(tmp_path / "events")
    for lo, hi in ((1, 400), (401, 800), (801, 1200)):
        (
            ev.where((F.col("lsn") >= lo) & (F.col("lsn") <= hi))
            .coalesce(1).write.mode("append").parquet(events_dir)
        )

    stream_eng = CdcEngine(spark, str(tmp_path / "stream_state"), num_buckets=4)
    q = stream_replay(
        spark, events_dir, str(tmp_path / "ckpt"), stream_eng, available_now=True
    )
    q.awaitTermination(240)

    batch_eng = CdcEngine(spark, str(tmp_path / "batch_state"), num_buckets=4)
    batch_eng.replay(ev, epoch_size=10**9)

    a = stream_eng.read_state().orderBy("repo", "path").toPandas()
    b = batch_eng.read_state().orderBy("repo", "path").toPandas()
    assert list(a["content_sha256"]) == list(b["content_sha256"])
    assert len(a) == len(b) and len(a) > 0

    # restart with same checkpoint: nothing new → state unchanged
    v_before = stream_eng.table().latest_version()
    q2 = stream_replay(
        spark, events_dir, str(tmp_path / "ckpt"), stream_eng, available_now=True
    )
    q2.awaitTermination(120)
    assert stream_eng.table().latest_version() == v_before


def test_sample_pipeline_dag(spark, tmp_path):
    """SamplePipeline parity: 4 ingests fan into 3 analytics; depth order
    puts every analytics node after every ingest it depends on."""
    pipe, results = build_sample_pipeline(spark, str(tmp_path / "lakes"), n_records=120)
    order = [node.name for _, node in pipe.dag.ordered()]
    for ing in ("ingest_orders", "ingest_payments", "ingest_ratings", "ingest_restaurants"):
        for an in ("dq_overpaid", "amex_gt50", "top_restaurants"):
            if an in order and ing in order:
                assert order.index(ing) < order.index(an)
    pipe.evaluate()
    assert results["ingest_orders"]["rows_inserted"] > 0
    assert "dq" in results and "amex" in results and "top" in results
    assert results["top"] > 0  # top-restaurants view materialized
    assert spark.table("top_restaurants_last_30_days").count() == results["top"]


def test_out_of_order_file_landing_fails_loudly(spark, tmp_path):
    """Ordering-contract violation detection (review finding): the file
    source lists by mtime, so if a LATER LSN range lands with an earlier
    mtime (coarse-granularity tie broken wrong / parallel bulk write), the
    engine watermark advances past the earlier range and its events would
    be dropped silently. stream_replay must raise instead."""
    import glob
    import time as _time

    import pytest

    from techtalk_data_pipeline_snowpark_spark.streaming.cdc_stream import (
        OrderingViolationError,
    )

    ev = change_events(spark, 400, n_repos=4, paths_per_repo=6, seed=7)
    events_dir = str(tmp_path / "events")
    # land range (201,400] FIRST (older mtime), (1,200] second — the
    # inverse of LSN order
    (ev.where(F.col("lsn") > 200).coalesce(1)
       .write.mode("append").parquet(events_dir))
    _time.sleep(1.1)  # defeat mtime-granularity ties deterministically
    (ev.where(F.col("lsn") <= 200).coalesce(1)
       .write.mode("append").parquet(events_dir))
    # pin mtimes explicitly: later-range files strictly older
    parts = sorted(glob.glob(os.path.join(events_dir, "part-*")),
                   key=os.path.getmtime)
    now = _time.time()
    os.utime(parts[0], (now - 100, now - 100))
    os.utime(parts[1], (now - 50, now - 50))

    eng = CdcEngine(spark, str(tmp_path / "state"), num_buckets=4)
    q = stream_replay(
        spark, events_dir, str(tmp_path / "ckpt"), eng,
        available_now=True, max_files_per_trigger=1,
    )
    with pytest.raises(Exception) as exc:
        q.awaitTermination(240)
    assert "OrderingViolationError" in str(exc.value) or isinstance(
        exc.value, OrderingViolationError
    )
