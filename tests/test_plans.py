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


def test_cosine_topk_is_two_stage(spark, sf_dir):
    """The brute top-k must pre-reduce per (query, input partition) BEFORE
    the per-query window — a single-stage window puts all N scored rows of
    a query on one task (r1 'weak' finding). The plan must contain an
    aggregate (the local top-k) upstream of the Window, and the window
    input must come from exploding the k-sized local lists."""
    from techtalk_data_pipeline_snowpark_spark.operators.similarity import (
        cosine_topk_brute,
    )
    from techtalk_data_pipeline_snowpark_spark.plans.inspect import simple_plan

    # repartition: the two-stage shape is required exactly when the scored
    # input spans multiple partitions (single-partition inputs take the
    # window-only bypass — asserted separately below)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(8)
    q = emb.where(F.col("vec_id") < 5)
    out = cosine_topk_brute(emb, q, k=3)
    plan = simple_plan(out)
    agg_pos = plan.find("Aggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # physical plans print top-down: Window (downstream) appears BEFORE the
    # aggregate feeding it
    assert win_pos < agg_pos, plan
    assert "Generate explode" in plan, plan
    # correctness unchanged vs the single-stage reference computation
    from pyspark.sql import Window as W

    scored = out.select("query_id", "neighbor_id", "cosine", "rank").collect()
    got = {(r.query_id, r.rank): r.neighbor_id for r in scored}
    qq = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cc = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    from techtalk_data_pipeline_snowpark_spark.operators.dedup import cosine as _cos

    ref_scored = cc.join(F.broadcast(qq), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", _cos(F.col("qv"), F.col("cv")).alias("c")
    )
    w = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id").asc())
    ref = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ref_scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3).collect()
    }
    assert got == ref


def test_cosine_topk_single_partition_bypass(spark, sf_dir):
    """A single-partition scored input skips the local pre-top-k stage
    (window-only plan — safe because all rows already sit on one task) and
    produces identical results to the two-stage path."""
    from techtalk_data_pipeline_snowpark_spark.operators.similarity import (
        cosine_topk_brute,
    )
    from techtalk_data_pipeline_snowpark_spark.plans.inspect import simple_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")  # 1 file → 1 part
    assert emb.rdd.getNumPartitions() == 1
    q = emb.where(F.col("vec_id") < 5)
    out = cosine_topk_brute(emb, q, k=3)
    plan = simple_plan(out)
    assert "Window" in plan
    assert "Generate explode" not in plan, plan  # no stage-1 list machinery
    got = {(r.query_id, r.rank): r.neighbor_id for r in out.collect()}
    two_stage = cosine_topk_brute(emb.repartition(8), q, k=3)
    ref = {(r.query_id, r.rank): r.neighbor_id for r in two_stage.collect()}
    assert got == ref


def test_payload_crosses_exactly_one_shuffle(spark):
    """The CDC payload path (winner semi-join broadcast → max_by dedup):
    content bytes must cross exactly ONE hash shuffle — the dedup groupBy,
    whose key partitioning the MERGE join then reuses. The winner-key agg
    shuffles too, but that frame is key/lsn/op only (no content)."""
    from techtalk_data_pipeline_snowpark_spark.cdc.dedup import (
        dedup_latest_via_winners,
        winner_keys,
    )
    from techtalk_data_pipeline_snowpark_spark.fixtures.generators import change_events
    from techtalk_data_pipeline_snowpark_spark.plans import column_shuffle_count

    ev = change_events(spark, 3000, n_repos=10, paths_per_repo=20, seed=5)
    winners = winner_keys(ev, ["repo", "path"])
    dedup = dedup_latest_via_winners(ev, ["repo", "path"], winners, broadcast=True)
    assert column_shuffle_count(dedup, "content") == 1


def test_payload_single_shuffle_in_non_broadcast_mode(spark):
    """broadcast=False must not double-shuffle content: it falls through to
    plain dedup_latest (map-side max_by partial agg + ONE key shuffle) —
    the (keys, lsn) semi-join partitioning could not be reused by the
    groupBy and cost a second payload shuffle (r2 finding)."""
    from techtalk_data_pipeline_snowpark_spark.cdc.dedup import (
        dedup_latest_via_winners,
        winner_keys,
    )
    from techtalk_data_pipeline_snowpark_spark.fixtures.generators import change_events
    from techtalk_data_pipeline_snowpark_spark.plans import column_shuffle_count

    ev = change_events(spark, 3000, n_repos=10, paths_per_repo=20, seed=5)
    winners = winner_keys(ev, ["repo", "path"])
    dedup = dedup_latest_via_winners(ev, ["repo", "path"], winners, broadcast=False)
    assert column_shuffle_count(dedup, "content") == 1


def test_ivm_delta_has_partial_aggregation(spark, tmp_path):
    """The IVM delta (changelog → signed groupBy) must carry map-side
    partial aggregation: at scale the changed-row set collapses per group
    BEFORE the shuffle, so a refresh costs the delta, not the group count."""
    from pyspark.sql import Row, types as T

    from techtalk_data_pipeline_snowpark_spark.lake import (
        IncrementalAggView,
        LakeTable,
    )

    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("size", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "src"), schema, key_cols=["repo", "path"], num_buckets=2
    )
    t.append(
        spark.createDataFrame(
            [Row(repo=f"r{i % 3}", path=f"p{i}", size=i) for i in range(12)], schema
        )
    )
    view = IncrementalAggView(
        spark, t, str(tmp_path / "view"), group_cols=["repo"], sum_cols={"total": "size"}
    )
    delta = view._delta(0, t.latest_version())
    assert has_partial_aggregation(delta)


def test_simhash_candidates_join_is_hash_not_nested_loop(spark):
    """The refined block self-join keys on four equi columns
    (blk, bits, sblk, sbits) plus an id inequality — Catalyst must plan a
    shuffled/broadcast HASH join with the inequality as a post-filter,
    never a nested-loop/cartesian (which would be O(n²) over the whole
    corpus at 100 TB)."""
    from techtalk_data_pipeline_snowpark_spark.operators.dedup import (
        simhash_candidates,
    )

    from techtalk_data_pipeline_snowpark_spark.plans import formatted_plan

    sim = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 2654435761).cast("long").alias("simhash"),
    )
    # localCheckpoint at the tail hides the join plan from the returned DF;
    # intercept the checkpoint call on the CONCRETE DataFrame class (Spark 4
    # instances are pyspark.sql.classic.dataframe.DataFrame, not the base
    # class) and explain the pre-checkpoint pipeline there.
    cls = type(sim)
    captured = {}
    orig = cls.localCheckpoint

    def capture(self, eager=True):
        captured["plan"] = formatted_plan(self)
        return orig(self, eager=eager)

    cls.localCheckpoint = capture
    try:
        simhash_candidates(sim, "doc_id", max_bucket_size=8).count()
    finally:
        cls.localCheckpoint = orig
    plan = captured["plan"]
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    assert "HashJoin" in plan, plan
