"""MERGE (insert-only, upsert, delete branch), UPDATE, DELETE parity with
the reference semantics (SURVEY.md §2.9)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable, delete, merge_into, update

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("tag", T.StringType()),
    ]
)


def _t(spark, root, rows, buckets=4):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=buckets)
    if rows:
        t.append(spark.createDataFrame(rows, SCHEMA))
    return t


def test_merge_insert_only(spark, tmp_table_root):
    """WHEN NOT MATCHED INSERT only — IngestOrdersFromRawToFlat.scala:74-89."""
    t = _t(spark, tmp_table_root, [("a", 1, "old"), ("b", 2, "old")])
    src = spark.createDataFrame([("a", 99, "new"), ("c", 3, "new")], SCHEMA)
    res = merge_into(t, src, on=["k"], when_matched_update=None)
    assert res.summary == {
        "rows_inserted": 1,
        "rows_updated": 0,
        "rows_deleted": 0,
    } | {
        k: res.summary[k]
        for k in ("buckets_rewritten", "files_carried", "files_skipped_by_bloom")
    }
    got = {(r.k, r.v, r.tag) for r in t.read().collect()}
    assert got == {("a", 1, "old"), ("b", 2, "old"), ("c", 3, "new")}


def test_merge_upsert_all(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [("a", 1, "old"), ("b", 2, "old")])
    src = spark.createDataFrame([("a", 99, "upd"), ("c", 3, "ins")], SCHEMA)
    res = merge_into(t, src, on=["k"])
    assert res.summary["rows_updated"] == 1 and res.summary["rows_inserted"] == 1
    got = {(r.k, r.v, r.tag) for r in t.read().collect()}
    assert got == {("a", 99, "upd"), ("b", 2, "old"), ("c", 3, "ins")}


def test_merge_update_expressions(spark, tmp_table_root):
    """WHEN MATCHED UPDATE with expressions — SampleCrud.scala:46-65
    (update uses size*100, upper(code))."""
    t = _t(spark, tmp_table_root, [("a", 5, "x")])
    src = spark.createDataFrame([("a", 7, "y")], SCHEMA)
    merge_into(
        t,
        src,
        on=["k"],
        when_matched_update={"v": F.col("s.v") * 100, "tag": F.upper(F.col("t.tag"))},
    )
    r = t.read().collect()[0]
    assert (r.v, r.tag) == (700, "X")


def test_merge_cdc_delete_branch(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [("a", 1, "x"), ("b", 2, "y")])
    src_schema = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
    src = spark.createDataFrame(
        [("a", None, None, "delete"), ("b", 22, "u", "update"), ("c", 3, "i", "insert")],
        src_schema,
    )
    res = merge_into(
        t,
        src,
        on=["k"],
        when_matched_delete=F.col("s.op") == "delete",
        when_not_matched_insert=True,
    )
    assert res.summary["rows_deleted"] == 1
    got = {(r.k, r.v) for r in t.read().collect()}
    assert got == {("b", 22), ("c", 3)}


def test_merge_delete_for_absent_key_is_noop(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [("a", 1, "x")])
    src_schema = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
    src = spark.createDataFrame([("zzz", None, None, "delete")], src_schema)
    merge_into(t, src, on=["k"], when_matched_delete=F.col("s.op") == "delete")
    # a delete for a key that doesn't exist must not insert
    got = {(r.k,) for r in t.read().collect()}
    assert got == {("a",)}


def test_merge_bucket_pruning(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [(f"k{i}", i, "x") for i in range(200)], buckets=16)
    snap0 = t.snapshot()
    src = spark.createDataFrame([("k0", 999, "upd")], SCHEMA)
    res = merge_into(t, src, on=["k"])
    assert res.summary["buckets_rewritten"] == 1
    snap1 = t.snapshot()
    # every untouched file object survives identically
    carried = set(snap0.files) & set(snap1.files)
    assert len(carried) == len(snap0.files) - len(
        snap0.files_in_buckets({list(snap1.files.values())[0]["bucket"]})
    ) or res.summary["files_carried"] == len(carried)
    assert t.read().where(F.col("k") == "k0").collect()[0].v == 999
    assert t.read().count() == 200


def test_update_with_condition(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [("a", 1, "x"), ("b", 200, "y")])
    res = update(t, {"tag": F.lit("BIG")}, F.col("v") > 100)
    assert res.summary["rows_affected"] == 1
    got = {(r.k, r.tag) for r in t.read().collect()}
    assert got == {("a", "x"), ("b", "BIG")}


def test_delete_with_condition(spark, tmp_table_root):
    t = _t(spark, tmp_table_root, [("a", 1, "x"), ("b", 200, "y"), ("c", 300, "z")])
    res = delete(t, F.col("v") > 100)
    assert res.summary["rows_affected"] == 2
    assert {r.k for r in t.read().collect()} == {"a"}


def test_merge_delete_wipes_table(spark, tmp_table_root):
    """Regression: a merge whose delete branch empties EVERY touched bucket
    used to crash at Observation.get — Spark 4.1.2 never delivers observed
    metrics for an empty dynamic-partition write. Metrics must still be the
    true counts (deleted=n), not zeros."""
    t = _t(spark, tmp_table_root, [("a", 1, "x"), ("b", 2, "y")], buckets=4)
    src = spark.createDataFrame([("a", 0, "del"), ("b", 0, "del")], SCHEMA)
    res = merge_into(
        t,
        src,
        on=["k"],
        when_matched_update="all",
        when_matched_delete=F.col("s.tag") == "del",
        when_not_matched_insert=False,
    )
    assert res.summary["rows_deleted"] == 2
    assert res.summary["rows_updated"] == 0
    assert res.summary["rows_inserted"] == 0
    assert t.read().count() == 0
    # table stays usable after the wipe
    t.append(spark.createDataFrame([("z", 9, "new")], SCHEMA))
    assert {r.k for r in t.read().collect()} == {"z"}


def test_merge_single_row_delete(spark, tmp_table_root):
    """Hypothesis's minimal crash case: 1-row table, 1 delete op."""
    t = _t(spark, tmp_table_root, [("a", 1, "x")], buckets=2)
    src_schema = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
    sdf = spark.createDataFrame([("a", 5, "s", "delete")], src_schema)
    res = merge_into(
        t, sdf, on=["k"],
        when_matched_update="all",
        when_matched_delete=F.col("s.op") == "delete",
    )
    assert res.summary["rows_deleted"] == 1
    assert t.read().count() == 0


def test_delete_all_rows(spark, tmp_table_root):
    """Regression: delete(t, lit(True)) wipes every hit file → empty
    partitionBy write → metrics must be recomputed, not lost."""
    t = _t(spark, tmp_table_root, [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")])
    res = delete(t, F.lit(True))
    assert res.summary["rows_affected"] == 3
    assert t.read().count() == 0


def test_merge_expression_on_substring_both_sides(spark, tmp_table_root):
    """Expression ON parity (SampleCrud.scala:38-65): merge on
    substring(code,0,4) of BOTH sides, update size*100 + upper(code) on
    match, insert the source row otherwise."""
    from techtalk_data_pipeline_snowpark_spark.functions.shims import substring1

    t = _t(spark, tmp_table_root, [("dist0001", 10, "old"), ("area0002", 20, "old")])
    src = spark.createDataFrame(
        [("DIST9999", 7, "src"), ("zone0003", 5, "src")], SCHEMA
    )
    res = merge_into(
        t,
        src,
        on=substring1(F.lower(F.col("t.k")), 0, 4)
        == substring1(F.lower(F.col("s.k")), 0, 4),
        when_matched_update={
            "v": F.col("s.v") * 100,
            "k": F.upper(F.col("s.k")),
        },
    )
    assert res.summary["rows_updated"] == 1 and res.summary["rows_inserted"] == 1
    # expression ON cannot bucket-prune
    assert res.summary["buckets_rewritten"] is None
    got = {(r.k, r.v, r.tag) for r in t.read().collect()}
    assert got == {
        ("DIST9999", 700, "old"),   # matched dist0001 via 4-char prefix
        ("area0002", 20, "old"),    # untouched
        ("zone0003", 5, "src"),     # not matched → inserted
    }


def test_merge_expression_on_delete_branch(spark, tmp_table_root):
    """Expression ON with a matched-delete branch (join-delete parity,
    SnowflakeUtilsOld.scala:84-109 arbitrary joinCriteria)."""
    t = _t(spark, tmp_table_root, [("aa-1", 1, "x"), ("bb-2", 2, "x"), ("cc-3", 3, "x")])
    src = spark.createDataFrame([("AA-9", 0, "del"), ("BB-9", 99, "upd")], SCHEMA)
    res = merge_into(
        t,
        src,
        on=F.substring(F.lower(F.col("t.k")), 1, 2)
        == F.substring(F.lower(F.col("s.k")), 1, 2),
        when_matched_update="all",
        when_matched_delete=F.col("s.tag") == "del",
        when_not_matched_insert=False,
    )
    assert res.summary["rows_deleted"] == 1 and res.summary["rows_updated"] == 1
    got = {(r.k, r.v, r.tag) for r in t.read().collect()}
    assert got == {("BB-9", 99, "upd"), ("cc-3", 3, "x")}


def test_merge_arbitration_property(spark, tmp_path):
    """Property-based MERGE semantics: for random target/source key sets
    with upsert/delete ops, the table converges to the dict-oracle state
    (matched+delete → gone; matched+upsert → source row; unmatched upsert →
    insert; delete for absent key → no-op)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keyspace = [f"k{i}" for i in range(6)]
    tgt_strategy = st.dictionaries(
        st.sampled_from(keyspace), st.integers(-100, 100), max_size=6
    )
    src_strategy = st.dictionaries(
        st.sampled_from(keyspace),
        st.tuples(st.integers(-100, 100), st.sampled_from(["upsert", "delete"])),
        max_size=6,
    )
    counter = {"n": 0}

    @settings(
        max_examples=12, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(tgt=tgt_strategy, src=src_strategy)
    def run(tgt, src):
        counter["n"] += 1
        root = str(tmp_path / f"prop{counter['n']}")
        t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
        if tgt:
            t.append(spark.createDataFrame([(k, v, "t") for k, v in tgt.items()], SCHEMA))
        src_schema = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
        if src:
            sdf = spark.createDataFrame(
                [(k, v, "s", op) for k, (v, op) in src.items()], src_schema
            )
            merge_into(
                t, sdf, on=["k"],
                when_matched_update="all",
                when_matched_delete=F.col("s.op") == "delete",
            )
        # dict oracle
        state = {k: (v, "t") for k, v in tgt.items()}
        for k, (v, op) in src.items():
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = (v, "s")
        got = {r.k: (r.v, r.tag) for r in t.read().collect()}
        assert got == state, (got, state, tgt, src)

    run()
