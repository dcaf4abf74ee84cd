"""IncrementalJoinView: maintained equi-join must equal a full recompute
through mutation episodes on BOTH sources — including join-column moves,
duplicate join values, deletes, and both-sides-dirty pairs."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable, merge_into
from techtalk_data_pipeline_snowpark_spark.lake.ivm_join import IncrementalJoinView
from techtalk_data_pipeline_snowpark_spark.lake.merge import delete as lake_delete

A_SCHEMA = T.StructType(
    [
        T.StructField("oid", T.LongType()),
        T.StructField("cust", T.LongType()),
        T.StructField("amt", T.LongType()),
    ]
)
B_SCHEMA = T.StructType(
    [
        T.StructField("cid", T.LongType()),
        T.StructField("cust", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


def _mk_sources(spark, tmp_path):
    a = LakeTable.create(
        spark, str(tmp_path / "a"), A_SCHEMA, key_cols=["oid"], num_buckets=4
    )
    # b's join column `cust` is NOT its key → duplicate join values allowed
    b = LakeTable.create(
        spark, str(tmp_path / "b"), B_SCHEMA, key_cols=["cid"], num_buckets=4
    )
    a.append(
        spark.createDataFrame(
            [(i, i % 5, i * 10) for i in range(20)], A_SCHEMA
        )
    )
    b.append(
        spark.createDataFrame(
            [(100 + j, j % 5, f"c{j % 5}-{j}") for j in range(8)], B_SCHEMA
        )
    )
    return a, b


def _mk_view(spark, a, b, tmp_path):
    return IncrementalJoinView(
        spark,
        a,
        b,
        str(tmp_path / "view"),
        on=["cust"],
        select={"amt": ("a", "amt"), "name": ("b", "name"), "cust": ("a", "cust")},
        num_buckets=4,
    )


def _recompute(a, b):
    j = a.read().alias("a").join(
        b.read().alias("b"), on=[F.col("a.cust") == F.col("b.cust")], how="inner"
    )
    return sorted(
        (r["a_oid"], r["b_cid"], r["amt"], r["name"], r["cust"])
        for r in j.select(
            F.col("a.oid").alias("a_oid"),
            F.col("b.cid").alias("b_cid"),
            F.col("a.amt").alias("amt"),
            F.col("b.name").alias("name"),
            F.col("a.cust").alias("cust"),
        ).collect()
    )


def _view_rows(view):
    return sorted(
        (r["a_oid"], r["b_cid"], r["amt"], r["name"], r["cust"])
        for r in view.read().collect()
    )


def test_initial_materialization_and_incremental_parity(spark, tmp_path):
    a, b = _mk_sources(spark, tmp_path)
    view = _mk_view(spark, a, b, tmp_path)
    res = view.refresh()
    assert res["refreshed"] and res.get("initial")
    assert _view_rows(view) == _recompute(a, b)

    # episode 1: left-side updates incl. a JOIN-COLUMN MOVE (oid 3: cust
    # 3→0 must drop its old pairs and create pairs with cust-0 rows),
    # an amount update, a delete, and a brand-new row
    merge_into(
        a,
        spark.createDataFrame([(3, 0, 999), (7, 2, 777), (50, 1, 500)], A_SCHEMA),
        on=["oid"],
    )
    lake_delete(a, F.col("oid") == 4)
    r1 = view.refresh()
    assert r1["refreshed"]
    assert _view_rows(view) == _recompute(a, b)

    # episode 2: right-side changes — a customer row moves join groups,
    # one deleted, one added (with a DUPLICATE join value)
    merge_into(
        b,
        spark.createDataFrame(
            [(101, 4, "moved"), (200, 0, "dup-zero")], B_SCHEMA
        ),
        on=["cid"],
    )
    lake_delete(b, F.col("cid") == 102)
    r2 = view.refresh()
    assert r2["refreshed"]
    assert _view_rows(view) == _recompute(a, b)

    # episode 3: BOTH sides dirty in one refresh, touching the same pairs
    merge_into(
        a, spark.createDataFrame([(0, 1, 111)], A_SCHEMA), on=["oid"]
    )
    merge_into(
        b, spark.createDataFrame([(100, 1, "both-dirty")], B_SCHEMA), on=["cid"]
    )
    r3 = view.refresh()
    assert r3["refreshed"]
    assert _view_rows(view) == _recompute(a, b)

    # idempotence: nothing changed → no-op, state intact
    r4 = view.refresh()
    assert not r4["refreshed"]
    assert _view_rows(view) == _recompute(a, b)


def test_group_emptying_and_refill(spark, tmp_path):
    a, b = _mk_sources(spark, tmp_path)
    view = _mk_view(spark, a, b, tmp_path)
    view.refresh()
    # delete EVERY b row of cust group 2 → all its pairs vanish
    lake_delete(b, F.col("cust") == 2)
    view.refresh()
    assert _view_rows(view) == _recompute(a, b)
    assert all(r[4] != 2 for r in _view_rows(view))
    # refill the group → pairs come back
    b.append(spark.createDataFrame([(300, 2, "back")], B_SCHEMA))
    view.refresh()
    assert _view_rows(view) == _recompute(a, b)
    assert any(r[4] == 2 for r in _view_rows(view))


def test_semi_join_path_over_inlist_cap(spark, tmp_path):
    a, b = _mk_sources(spark, tmp_path)
    view = IncrementalJoinView(
        spark,
        a,
        b,
        str(tmp_path / "view"),
        on=["cust"],
        select={"amt": ("a", "amt"), "name": ("b", "name"), "cust": ("a", "cust")},
        dirty_inlist_cap=2,  # force the big-dirty semi-join path
    )
    view.refresh()
    merge_into(
        a,
        spark.createDataFrame(
            [(i, (i + 1) % 5, i * 1000) for i in range(10)], A_SCHEMA
        ),
        on=["oid"],
    )
    view.refresh()
    assert _view_rows(view) == _recompute(a, b)


def test_competing_refreshers_exactly_once(spark, tmp_path):
    a, b = _mk_sources(spark, tmp_path)
    v1 = _mk_view(spark, a, b, tmp_path)
    v2 = _mk_view(spark, a, b, tmp_path)
    v1.refresh()
    merge_into(a, spark.createDataFrame([(0, 0, 42)], A_SCHEMA), on=["oid"])
    r1 = v1.refresh()
    r2 = v2.refresh()  # rival sees the stamp already covers the range
    assert r1["refreshed"] and not r2["refreshed"]
    assert _view_rows(v1) == _recompute(a, b)
    assert v1.applied_source_versions() == v2.applied_source_versions()


def test_view_requires_keyed_sources(spark, tmp_path):
    a = LakeTable.create(spark, str(tmp_path / "x"), A_SCHEMA)
    b = LakeTable.create(
        spark, str(tmp_path / "y"), B_SCHEMA, key_cols=["cid"], num_buckets=2
    )
    with pytest.raises(ValueError):
        IncrementalJoinView(
            spark, a, b, str(tmp_path / "v"), on=["cust"], select={}
        )


def test_agg_view_over_join_view_chain(spark, tmp_path):
    """Composition: the join view is itself a LakeTable with a changelog,
    so an IncrementalAggView maintained OVER it forms a two-stage DAG of
    materialized views — each stage exactly-once — with zero extra code."""
    from techtalk_data_pipeline_snowpark_spark.lake.ivm import IncrementalAggView

    a, b = _mk_sources(spark, tmp_path)
    view = _mk_view(spark, a, b, tmp_path)
    view.refresh()
    agg = IncrementalAggView(
        spark,
        view.table(),
        str(tmp_path / "agg"),
        group_cols=["cust"],
        sum_cols={"total": "amt"},
        num_buckets=4,
    )
    agg.refresh()

    def recompute():
        return sorted(
            (r["cust"], r["cnt"], r["total"])
            for r in view.read()
            .groupBy("cust")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("amt").alias("total"))
            .collect()
        )

    def aggrows():
        return sorted(
            (r["cust"], r["cnt"], r["total"])
            for r in agg.read().select("cust", "cnt", "total").collect()
        )

    assert aggrows() == recompute()
    # mutate both sources; refresh the chain stage by stage
    merge_into(
        a, spark.createDataFrame([(3, 0, 999), (50, 1, 500)], A_SCHEMA), on=["oid"]
    )
    lake_delete(a, F.col("oid") == 4)
    merge_into(
        b,
        spark.createDataFrame([(101, 4, "moved"), (200, 0, "dup")], B_SCHEMA),
        on=["cid"],
    )
    view.refresh()
    agg.refresh()
    assert aggrows() == recompute()
    # empty a whole join group through the chain
    lake_delete(b, F.col("cust") == 2)
    view.refresh()
    agg.refresh()
    assert aggrows() == recompute()
    assert all(r[0] != 2 for r in aggrows())


def _recompute_left(a, b):
    j = a.read().alias("a").join(
        b.read().alias("b"), on=[F.col("a.cust") == F.col("b.cust")], how="left"
    )
    return sorted(
        (r["a_oid"], r["b_cid"], r["amt"], r["name"], r["cust"])
        for r in j.select(
            F.col("a.oid").alias("a_oid"),
            F.col("b.cid").alias("b_cid"),
            F.col("a.amt").alias("amt"),
            F.col("b.name").alias("name"),
            F.col("a.cust").alias("cust"),
        ).collect()
    )


def test_left_join_view_null_extension_lifecycle(spark, tmp_path):
    """LEFT join maintenance: unmatched left rows materialize with a null-
    extended right side; gaining a first match replaces the extension,
    losing the last match restores it — all through incremental refreshes."""
    a = LakeTable.create(
        spark, str(tmp_path / "a"), A_SCHEMA, key_cols=["oid"], num_buckets=4
    )
    b = LakeTable.create(
        spark, str(tmp_path / "b"), B_SCHEMA, key_cols=["cid"], num_buckets=4
    )
    # cust groups 0..6 on the left; only 0..2 matched on the right
    a.append(spark.createDataFrame([(i, i % 7, i * 10) for i in range(21)], A_SCHEMA))
    b.append(spark.createDataFrame([(100 + j, j % 3, f"n{j}") for j in range(6)], B_SCHEMA))
    view = IncrementalJoinView(
        spark,
        a,
        b,
        str(tmp_path / "view"),
        on=["cust"],
        select={"amt": ("a", "amt"), "name": ("b", "name"), "cust": ("a", "cust")},
        num_buckets=4,
        how="left",
    )
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)
    # null-extensions exist for the unmatched groups
    assert any(r[1] is None for r in _view_rows(view))

    # a previously-unmatched group gains its first match → extension dies
    b.append(spark.createDataFrame([(300, 5, "late")], B_SCHEMA))
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)
    assert all(not (r[4] == 5 and r[1] is None) for r in _view_rows(view))

    # the group loses its only match again → extension returns
    lake_delete(b, F.col("cid") == 300)
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)
    assert any(r[4] == 5 and r[1] is None for r in _view_rows(view))

    # a b row MOVES join groups (old value only in the update preimage):
    # group 1 may lose matches, group 6 gains its first
    merge_into(b, spark.createDataFrame([(101, 6, "moved")], B_SCHEMA), on=["cid"])
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)

    # payload-only right change must propagate to CLEAN left rows' pairs
    merge_into(b, spark.createDataFrame([(100, 0, "renamed")], B_SCHEMA), on=["cid"])
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)
    assert any(r[3] == "renamed" for r in _view_rows(view))

    # left-side episode: jk move + delete + insert into an unmatched group
    merge_into(a, spark.createDataFrame([(0, 6, 111), (50, 4, 500)], A_SCHEMA), on=["oid"])
    lake_delete(a, F.col("oid") == 1)
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)

    # idempotence
    r = view.refresh()
    assert not r["refreshed"]
    assert _view_rows(view) == _recompute_left(a, b)


def test_left_join_view_both_sides_dirty(spark, tmp_path):
    a, b = _mk_sources(spark, tmp_path)
    view = IncrementalJoinView(
        spark,
        a,
        b,
        str(tmp_path / "view"),
        on=["cust"],
        select={"amt": ("a", "amt"), "name": ("b", "name"), "cust": ("a", "cust")},
        num_buckets=4,
        how="left",
    )
    view.refresh()
    merge_into(a, spark.createDataFrame([(0, 9, 42)], A_SCHEMA), on=["oid"])  # → unmatched group
    lake_delete(b, F.col("cust") == 3)  # empties group 3's matches
    merge_into(b, spark.createDataFrame([(400, 9, "nine")], B_SCHEMA), on=["cid"])  # matches the moved row
    view.refresh()
    assert _view_rows(view) == _recompute_left(a, b)


def test_null_keyed_left_row_survives_clean_side_filter(spark, tmp_path):
    """ADVICE r5: the single-column dirty predicate used a plain ``isin``,
    whose NULL result (and NULL negation) silently dropped a null-keyed row
    from BOTH the dirty and clean sets. A null-oid A row joining a b-dirty
    group would lose its refreshed pair. Null-safe ``isNotNull & isin``
    keeps it on the clean side, like the composite path's eqNullSafe."""
    def _nkey(t):
        return tuple((x is None, x) for x in t)

    def _vrows(view):
        return sorted(
            (
                (r["a_oid"], r["b_cid"], r["amt"], r["name"], r["cust"])
                for r in view.read().collect()
            ),
            key=_nkey,
        )

    def _rec(a, b):
        j = a.read().alias("a").join(
            b.read().alias("b"),
            on=[F.col("a.cust") == F.col("b.cust")],
            how="inner",
        )
        return sorted(
            (
                (r["a_oid"], r["b_cid"], r["amt"], r["name"], r["cust"])
                for r in j.select(
                    F.col("a.oid").alias("a_oid"),
                    F.col("b.cid").alias("b_cid"),
                    F.col("a.amt").alias("amt"),
                    F.col("b.name").alias("name"),
                    F.col("a.cust").alias("cust"),
                ).collect()
            ),
            key=_nkey,
        )

    a, b = _mk_sources(spark, tmp_path)
    # a NULL-keyed left row in join group 1 (the engine convention forbids
    # null keys, but the view must not corrupt state when one appears)
    a.append(spark.createDataFrame([(None, 1, 12345)], A_SCHEMA))
    view = _mk_view(spark, a, b, tmp_path)
    view.refresh()
    assert _vrows(view) == _rec(a, b)
    # b-side-only episode dirties group 1: the null-oid row is CLEAN on the
    # A side and must still contribute refreshed pairs with the dirty b rows
    merge_into(
        b, spark.createDataFrame([(101, 1, "renamed")], B_SCHEMA), on=["cid"]
    )
    r = view.refresh()
    assert r["refreshed"]
    assert _vrows(view) == _rec(a, b)
    assert any(r_[0] is None and r_[3] == "renamed" for r_ in _vrows(view))
    # A-side episode too (dirty oids exercise keep=True/False on _ka)
    merge_into(a, spark.createDataFrame([(2, 1, 222)], A_SCHEMA), on=["oid"])
    view.refresh()
    assert _vrows(view) == _rec(a, b)
