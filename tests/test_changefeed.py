"""Change-feed cursors (CDC-out): a named durable position on the lake
table's changelog, with at-least-once delivery, exactly-once (conditional
put) cursor advance, chunked catch-up, and conflict detection between
competing consumers. Reference parity: the Snowflake stream offset that
advances with the consuming DML (SnowflakeUtils.scala:46-66), made an
explicit named cursor so many independent downstreams can each tail the
same table."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import (
    ChangelogCursor,
    CursorConflict,
    FakeObjectStore,
    LakeTable,
    merge_into,
)

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("size", T.LongType()),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(repo=r, path=p, size=int(s)) for r, p, s in rows], SCHEMA
    )


def _mk(spark, root, store=None):
    return LakeTable.create(
        spark, root, SCHEMA, key_cols=["repo", "path"], num_buckets=2, store=store
    )


def _keys(df):
    return {(r.repo, r.path, r.size, r._change_type) for r in df.collect()}


def test_poll_ack_advance(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10), ("b", "2", 20)]))
    cur = ChangelogCursor(t, "indexer")
    batch = cur.poll()
    assert batch is not None and batch.from_version == 0
    assert _keys(batch.df) == {
        ("a", "1", 10, "insert"),
        ("b", "2", 20, "insert"),
    }
    batch.ack()
    assert cur.poll() is None  # caught up
    t.append(_df(spark, [("c", "3", 30)]))
    nxt = cur.poll()
    assert _keys(nxt.df) == {("c", "3", 30, "insert")}
    assert nxt.from_version == batch.to_version


def test_redelivery_before_ack(spark, tmp_table_root):
    """Crash between processing and ack → the same range redelivers
    (at-least-once), including to a fresh cursor handle on the same name."""
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10)]))
    first = ChangelogCursor(t, "c").poll()
    again = ChangelogCursor(t, "c").poll()  # restarted consumer
    assert (again.from_version, again.to_version) == (
        first.from_version,
        first.to_version,
    )
    assert _keys(again.df) == _keys(first.df)


def test_chunked_catchup_covers_everything_in_order(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    for i in range(3):
        t.append(_df(spark, [("r", str(i), i)]))
    cur = ChangelogCursor(t, "c")
    seen = []
    spans = []
    while True:
        b = cur.poll(max_versions=1)
        if b is None:
            break
        spans.append((b.from_version, b.to_version))
        seen.extend(sorted(_keys(b.df)))
        b.ack()
    # contiguous, single-version chunks
    assert all(hi == lo + 1 for lo, hi in spans)
    assert [hi for _, hi in spans] == sorted(hi for _, hi in spans)
    assert seen == [("r", str(i), i, "insert") for i in range(3)]


def test_competing_ack_conflicts(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10)]))
    c1 = ChangelogCursor(t, "c")
    c2 = ChangelogCursor(t, "c")
    b1, b2 = c1.poll(), c2.poll()
    b1.ack()
    with pytest.raises(CursorConflict):
        b2.ack()
    assert c2.poll() is None  # loser re-polls and finds the frontier moved


def test_cdf_types_flow_and_idempotent_sink_survives_redelivery(
    spark, tmp_table_root
):
    """End-to-end exactly-once with an idempotent sink: a keyed replica
    consumed through the cursor equals the table even when a batch is
    processed twice (crash before ack, reprocess, then ack)."""
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10), ("b", "2", 20), ("c", "3", 30)]))
    cur = ChangelogCursor(t, "replica")
    replica: dict[tuple, int] = {}

    def apply(df):  # keyed upsert/delete — idempotent over redelivery
        for r in df.orderBy("_commit_version").collect():
            k = (r.repo, r.path)
            if r._change_type == "delete":
                replica.pop(k, None)
            else:
                replica[k] = r.size

    b = cur.poll()
    apply(b.df)
    b.ack()
    src = _df(spark, [("a", "1", 11), ("c", "3", 30), ("d", "4", 40)]).withColumn(
        "op",
        F.when(F.col("repo") == "c", F.lit("delete")).otherwise(F.lit("upsert")),
    )
    merge_into(
        t,
        src,
        on=["repo", "path"],
        when_matched_update="all",
        when_matched_delete=F.col("s.op") == "delete",
    )
    b = cur.poll()
    apply(b.df)  # first processing: consumer crashes before ack...
    b2 = ChangelogCursor(t, "replica").poll()
    apply(b2.df)  # ...and reprocesses the same range after restart
    b2.ack()
    assert replica == {("a", "1"): 11, ("b", "2"): 20, ("d", "4"): 40}
    table_state = {(r.repo, r.path): r.size for r in t.read().collect()}
    assert replica == table_state


def test_prune_keeps_directory_small(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    cur = ChangelogCursor(t, "c")
    for i in range(5):
        t.append(_df(spark, [("r", str(i), i)]))
        b = cur.poll()
        b.ack()
    files = [
        f
        for f in t.store.list_dir("_cursors/c")
        if f.startswith("ack-") and f.endswith(".json")
    ]
    assert len(files) == 1  # tip only


def test_independent_cursors_do_not_interfere(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10)]))
    fast, slow = ChangelogCursor(t, "fast"), ChangelogCursor(t, "slow")
    fast.poll().ack()
    assert fast.poll() is None
    b = slow.poll()  # unaffected by fast's advance
    assert b is not None and b.from_version == 0


def test_branch_handle_rejected(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10)]))
    t.create_branch("wap")
    with pytest.raises(ValueError, match="main lineage"):
        ChangelogCursor(t.branch("wap"), "c")


def test_drop_resets_position(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root)
    t.append(_df(spark, [("a", "1", 10)]))
    cur = ChangelogCursor(t, "c")
    cur.poll().ack()
    cur.drop()
    cur2 = ChangelogCursor(t, "c")
    assert cur2.position() == 0
    assert cur2.poll() is not None


def test_cursor_on_object_store_semantics(spark, tmp_table_root):
    """The advance protocol only needs the TableStore contract — the whole
    poll/ack/conflict flow must hold on S3-style conditional-put stores."""
    store = FakeObjectStore(tmp_table_root)
    t = _mk(spark, tmp_table_root, store=store)
    t.append(_df(spark, [("a", "1", 10)]))
    c1, c2 = ChangelogCursor(t, "c"), ChangelogCursor(t, "c")
    b1, b2 = c1.poll(), c2.poll()
    b1.ack()
    with pytest.raises(CursorConflict):
        b2.ack()
    t.append(_df(spark, [("b", "2", 20)]))
    nxt = c1.poll()
    assert _keys(nxt.df) == {("b", "2", 20, "insert")}
    nxt.ack()
    assert c1.poll() is None


# -------------------------------------------------- run() / replicate_to()
def _mutate_source(spark, t):
    """Three commits: append, update, delete — every CDF row type."""
    from techtalk_data_pipeline_snowpark_spark.lake import delete, update

    t.append(_df(spark, [("a", "1", 10), ("a", "2", 20), ("b", "3", 30)]))
    update(t, {"size": F.col("size") + 1}, F.col("repo") == "a")
    delete(t, F.col("path") == "3")


def test_run_drives_bounded_batches_to_catchup(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root + "/src")
    _mutate_source(spark, t)
    cur = ChangelogCursor(t, "runner")
    seen = []
    res = cur.run(
        lambda df, frm, to: seen.append((frm, to, df.count())),
        max_versions=1,
    )
    # one slice per commit (incl. the empty create commit), in order
    assert res["batches"] == t.latest_version() and res["conflicts"] == 0
    assert [s[:2] for s in seen] == [(v, v + 1) for v in range(t.latest_version())]
    assert res["position"] == t.latest_version()
    assert cur.poll() is None


def test_replicate_to_exact_parity(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root + "/src")
    _mutate_source(spark, t)
    rep = _mk(spark, tmp_table_root + "/rep")
    cur = ChangelogCursor(t, "replica")
    res = cur.replicate_to(rep, max_versions=1)
    assert res["batches"] == t.latest_version()
    assert t.read().exceptAll(rep.read()).count() == 0
    assert rep.read().exceptAll(t.read()).count() == 0
    # further source mutations flow through a later catch-up (multi-commit
    # slice exercises the net-change collapse: update then delete same key)
    from techtalk_data_pipeline_snowpark_spark.lake import delete, update

    update(t, {"size": F.lit(99)}, F.col("path") == "1")
    delete(t, F.col("path") == "1")
    t.append(_df(spark, [("c", "4", 40)]))
    cur.replicate_to(rep)  # one slice spanning all three commits
    assert t.read().exceptAll(rep.read()).count() == 0
    assert rep.read().exceptAll(t.read()).count() == 0


def test_replicate_killed_consumer_resumes_to_parity(spark, tmp_table_root):
    """r4 verdict ask #7's crash test: the consumer dies AFTER the sink
    merge but BEFORE the ack — the range redelivers on restart and the
    idempotent MERGE absorbs the duplicate, converging to exact parity."""
    t = _mk(spark, tmp_table_root + "/src")
    _mutate_source(spark, t)
    rep = _mk(spark, tmp_table_root + "/rep")
    cur = ChangelogCursor(t, "crashy")

    class Killed(RuntimeError):
        pass

    applied = []

    def dying_sink(df, frm, to):
        from techtalk_data_pipeline_snowpark_spark.lake.changefeed import net_changes
        from techtalk_data_pipeline_snowpark_spark.lake import merge_into as mi

        mi(
            rep,
            net_changes(df, ["repo", "path"]),
            on=["repo", "path"],
            when_matched_update="all",
            when_matched_delete=F.col("s._change_type") == "delete",
            when_not_matched_insert=True,
        )
        applied.append((frm, to))
        if len(applied) == 2:
            raise Killed()  # crash mid-run: batch 2 sunk but NOT acked

    with pytest.raises(Killed):
        cur.run(dying_sink, max_versions=1)
    pos_after_crash = cur.position()
    # a fresh consumer process resumes from the durable cursor...
    cur2 = ChangelogCursor(t, "crashy")
    assert cur2.position() == pos_after_crash
    res = cur2.replicate_to(rep, max_versions=1)
    # ...re-receives the unacked batch (redelivery) plus the rest
    assert res["batches"] == t.latest_version() - pos_after_crash
    assert t.read().exceptAll(rep.read()).count() == 0
    assert rep.read().exceptAll(t.read()).count() == 0


def test_replicate_rejects_mismatched_keys(spark, tmp_table_root):
    t = _mk(spark, tmp_table_root + "/src")
    t.append(_df(spark, [("a", "1", 10)]))
    rep = LakeTable.create(
        spark, tmp_table_root + "/rep", SCHEMA, key_cols=["repo"], num_buckets=2
    )
    with pytest.raises(ValueError, match="key"):
        ChangelogCursor(t, "bad").replicate_to(rep)


def test_run_conflict_repolls_from_new_frontier(spark, tmp_table_root):
    """A rival consumer acks the same range mid-batch: run() must count
    the conflict and continue from the rival's frontier, not fail."""
    t = _mk(spark, tmp_table_root + "/src")
    _mutate_source(spark, t)
    cur = ChangelogCursor(t, "shared")
    rival = ChangelogCursor(t, "shared")
    fired = []

    def sink(df, frm, to):
        df.count()
        if not fired:
            fired.append(1)
            rival.poll(max_versions=1).ack()  # rival wins the first range

    res = cur.run(sink, max_versions=1)
    assert res["conflicts"] == 1
    assert res["position"] == t.latest_version()
