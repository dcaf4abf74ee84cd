"""Plan-shape tests: lock in that Catalyst actually applies the
optimizations the engine's scale story depends on (SURVEY.md §4).

Results being right is necessary; these assert the PLAN is right — a
regression that silently drops pushdown/broadcast/partial-agg would pass
value tests and still be 100× slower at 100 TB.
"""

from pyspark.sql import functions as F

from techtalk_data_pipeline_snowpark_spark.cdc.dedup import dedup_latest
from techtalk_data_pipeline_snowpark_spark.plans import (
    has_broadcast_hash_join,
    has_partial_aggregation,
    hash_aggregate_count,
    pushed_filters,
    scan_read_columns,
    shuffle_exchange_count,
)


def test_epoch_slice_filter_is_pushed_to_parquet(spark, sf_dir):
    """The CDC epoch slice (lsn > a AND lsn <= b ≅ event_id range) must
    reach the parquet reader as PushedFilters — at 10^10 events this is
    the difference between scanning one epoch and scanning the log."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sliced = ev.where((F.col("event_id") > 100) & (F.col("event_id") <= 200))
    pf = " ".join(pushed_filters(sliced))
    assert "GreaterThan(event_id" in pf and "LessThanOrEqual(event_id" in pf, pf


def test_aggregation_prunes_scan_columns(spark, sf_dir):
    """A 2-column aggregate must read 2 columns, not the whole table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    cols = scan_read_columns(q)
    assert cols and set(cols[0]) == {"l_returnflag", "l_quantity"}, cols


def test_max_lsn_dedup_has_partial_aggregation(spark, sf_dir):
    """dedup_latest must plan as partial+final aggregation (map-side
    combine) — the core skew defense; a window row_number plan has none."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").alias("lsn"), F.lit("upsert").alias("op"),
        "user_id", "ts", "value",
    )
    out = dedup_latest(ev, ["user_id"])
    assert hash_aggregate_count(out) >= 2
    assert has_partial_aggregation(out)
    assert shuffle_exchange_count(out) == 1  # exactly one shuffle, on the key


def test_small_dim_join_broadcasts(spark, sf_dir):
    """Dim joins must broadcast (no shuffle of the fact side)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    assert has_broadcast_hash_join(j)
    assert shuffle_exchange_count(j) == 0


def test_filter_pushdown_through_projection(spark, sf_dir):
    """Filter written after select still reaches the scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity", "l_returnflag").where(
        F.col("l_returnflag") == "R"
    )
    pf = " ".join(pushed_filters(q))
    assert "EqualTo(l_returnflag" in pf, pf
