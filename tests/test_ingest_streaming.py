"""Raw→flat ingest (stream-on-table parity) and file-arrival ingest
(stage/stream-on-stage parity) — SURVEY.md §3 entry points 2 and 3."""

import json

from pyspark.sql import types as T

from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
from techtalk_data_pipeline_snowpark_spark.operators import ingest_raw_to_flat, land_raw, overwrite_from_files
from techtalk_data_pipeline_snowpark_spark.streaming import (
    batch_ingest_with_manifest,
    create_stage,
    land_file,
    stream_ingest,
)

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("orderCode", T.StringType()),
        T.StructField("customerEmail", T.StringType()),
        T.StructField("totPrice", T.DoubleType()),
        T.StructField("restaurantCode", T.StringType()),
        T.StructField("dateOfOrder", T.StringType()),
    ]
)


def _payload(records):
    return json.dumps(records)


def test_ingest_orders_raw_to_flat_insert_only(spark, tmp_path):
    """IngestOrdersFromRawToFlat parity: land raw → consume stream →
    flatten (mixed-case fields) → insert-only merge; second tick with an
    overlapping payload inserts only the new key."""
    raw_root = str(tmp_path / "raw")
    flat_root = str(tmp_path / "flat")
    land_raw(spark, raw_root, _payload([
        {"ORDERCODE": "A1", "customerEmail": "x@y.com", "TOTPRICE": 10.5,
         "restaurantCode": "AA100", "dateOfOrder": "2024-01-05"},
        {"orderCode": "B2", "CUSTOMEREMAIL": "z@w.com", "totPrice": 20.0,
         "restaurantCode": "AB200", "dateOfOrder": "2024-01-06"},
    ]))
    r1 = ingest_raw_to_flat(spark, raw_root, flat_root, ORDER_SCHEMA, ["orderCode"])
    assert r1.get("bootstrap") and r1["rows_inserted"] == 2

    land_raw(spark, raw_root, _payload([
        {"orderCode": "B2", "customerEmail": "CHANGED", "totPrice": 99.0,
         "restaurantCode": "AB200", "dateOfOrder": "2024-01-06"},
        {"orderCode": "C3", "customerEmail": "c@c.com", "totPrice": 5.0,
         "restaurantCode": "AD150", "dateOfOrder": "2024-01-07"},
    ]))
    r2 = ingest_raw_to_flat(spark, raw_root, flat_root, ORDER_SCHEMA, ["orderCode"])
    assert r2["rows_inserted"] == 1 and r2["rows_updated"] == 0
    flat = LakeTable(spark, flat_root).read()
    rows = {r.orderCode: r for r in flat.collect()}
    assert set(rows) == {"A1", "B2", "C3"}
    assert rows["B2"].customerEmail == "z@w.com"  # insert-only: no update

    # third tick, nothing new → skipped (stream offset already consumed)
    r3 = ingest_raw_to_flat(spark, raw_root, flat_root, ORDER_SCHEMA, ["orderCode"])
    assert r3.get("skipped")


def test_ingest_ratings_upsert(spark, tmp_path):
    """IngestRatingsFromRawToFlat parity: composite key upsert."""
    schema = T.StructType(
        [
            T.StructField("restaurantCode", T.StringType()),
            T.StructField("ratingInPercentage", T.IntegerType()),
            T.StructField("dateOfRate", T.StringType()),
            T.StructField("customerEmail", T.StringType()),
        ]
    )
    raw_root = str(tmp_path / "raw")
    flat_root = str(tmp_path / "flat")
    land_raw(spark, raw_root, _payload([
        {"restaurantCode": "AA100", "ratingInPercentage": 40,
         "dateOfRate": "2024-01-05", "customerEmail": "x@y.com"},
    ]))
    ingest_raw_to_flat(spark, raw_root, flat_root, schema,
                       ["restaurantCode", "customerEmail"], update_on_match=True)
    land_raw(spark, raw_root, _payload([
        {"restaurantCode": "AA100", "ratingInPercentage": 90,
         "dateOfRate": "2024-02-01", "customerEmail": "x@y.com"},
    ]))
    r = ingest_raw_to_flat(spark, raw_root, flat_root, schema,
                           ["restaurantCode", "customerEmail"], update_on_match=True)
    assert r["rows_updated"] == 1
    row = LakeTable(spark, flat_root).read().collect()[0]
    assert row.ratingInPercentage == 90


def test_overwrite_from_staged_files(spark, tmp_path):
    """IngestAndOverwriteRestaurantWithStage parity."""
    stage = create_stage(str(tmp_path / "stage"))
    schema = T.StructType(
        [
            T.StructField("restaurantCode", T.StringType()),
            T.StructField("restaurantName", T.StringType()),
            T.StructField("peopleCapacity", T.IntegerType()),
        ]
    )
    f = land_file(stage, _payload([
        {"restaurantCode": "AA100", "restaurantName": "R1", "peopleCapacity": 50}
    ]))
    overwrite_from_files(spark, [f], str(tmp_path / "dim"), schema)
    t = LakeTable(spark, str(tmp_path / "dim"))
    assert t.read().count() == 1
    f2 = land_file(stage, _payload([
        {"restaurantCode": "BB200", "restaurantName": "R2", "peopleCapacity": 70},
        {"restaurantCode": "BD250", "restaurantName": "R3", "peopleCapacity": 90},
    ]))
    overwrite_from_files(spark, [f2], str(tmp_path / "dim"), schema)
    assert {r.restaurantCode for r in t.read().collect()} == {"BB200", "BD250"}


PAYMENT_SCHEMA = T.StructType(
    [
        T.StructField("paymentCode", T.StringType()),
        T.StructField("paymentType", T.StringType()),
        T.StructField("paymentDate", T.StringType()),
        T.StructField("orderCode", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _pay(code, amt):
    return {"paymentCode": code, "PAYMENTTYPE": "AMEX", "paymentDate": "2024-01-05",
            "orderCode": "A1", "amount": amt}


def test_stream_ingest_exactly_once(spark, tmp_path):
    """Structured Streaming file source: each landed file processed exactly
    once across restarts (checkpoint manifest) —
    IngestPaymentsStreamFromStage parity."""
    stage = create_stage(str(tmp_path / "stage"))
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "pay")
    land_file(stage, _payload([_pay("p1", 10.0), _pay("p2", 20.0)]))
    q = stream_ingest(spark, stage, ckpt, target, PAYMENT_SCHEMA, ["paymentCode"])
    q.awaitTermination(120)
    t = LakeTable(spark, target)
    assert t.read().count() == 2
    # second drain with one new file → only the new one processed
    land_file(stage, _payload([_pay("p3", 30.0)]))
    q2 = stream_ingest(spark, stage, ckpt, target, PAYMENT_SCHEMA, ["paymentCode"])
    q2.awaitTermination(120)
    rows = {r.paymentCode for r in t.read().collect()}
    assert rows == {"p1", "p2", "p3"}
    # re-run with nothing new → state unchanged
    q3 = stream_ingest(spark, stage, ckpt, target, PAYMENT_SCHEMA, ["paymentCode"])
    q3.awaitTermination(120)
    assert t.read().count() == 3


def test_batch_ingest_with_manifest(spark, tmp_path):
    stage = create_stage(str(tmp_path / "stage"))
    land_file(stage, _payload([_pay("p1", 10.0)]))
    land_file(stage, _payload([_pay("p2", 20.0)]))
    args = (spark, stage, str(tmp_path / "man"), str(tmp_path / "pay"),
            PAYMENT_SCHEMA, ["paymentCode"])
    r1 = batch_ingest_with_manifest(*args)
    assert r1["files"] == 2
    r2 = batch_ingest_with_manifest(*args)
    assert r2["files"] == 0
    land_file(stage, _payload([_pay("p3", 30.0)]))
    r3 = batch_ingest_with_manifest(*args)
    assert r3["files"] == 1
    from techtalk_data_pipeline_snowpark_spark.lake import LakeTable as LT

    assert LT(spark, str(tmp_path / "pay")).read().count() == 3


def test_cloud_event_auto_ingest(spark, tmp_path):
    """S13 parity: ingest is driven by BlobCreated notifications, not
    directory listing — a landed file WITHOUT a notification is never read;
    re-running the drained stream is a no-op (checkpointed)."""
    from pyspark.sql import types as T

    from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
    from techtalk_data_pipeline_snowpark_spark.streaming.file_ingest import (
        cloud_event_ingest,
        create_stage,
        land_cloud_event,
        land_file,
    )

    stage = create_stage(str(tmp_path / "stage"))
    notif_dir = str(tmp_path / "notifications")
    schema = T.StructType(
        [T.StructField("code", T.StringType()), T.StructField("amount", T.DoubleType())]
    )
    f1 = land_file(stage, '[{"code": "a", "amount": 1.0}, {"code": "b", "amount": 2.0}]')
    f2 = land_file(stage, '[{"code": "c", "amount": 3.0}]')
    land_file(stage, '[{"code": "GHOST", "amount": 9.9}]')  # NO notification
    land_cloud_event(notif_dir, f1)
    land_cloud_event(notif_dir, f2)

    target = str(tmp_path / "flat")
    q = cloud_event_ingest(
        spark, notif_dir, str(tmp_path / "ckpt"), target, schema, ["code"]
    )
    q.awaitTermination(240)
    got = {(r.code, r.amount) for r in LakeTable(spark, target).read().collect()}
    assert got == {("a", 1.0), ("b", 2.0), ("c", 3.0)}  # GHOST not ingested

    # drain again: checkpoint makes it a no-op
    v = LakeTable(spark, target).latest_version()
    q2 = cloud_event_ingest(
        spark, notif_dir, str(tmp_path / "ckpt"), target, schema, ["code"]
    )
    q2.awaitTermination(240)
    assert LakeTable(spark, target).latest_version() == v


# ---------------------------------------------------- stream_dedup_ingest

def test_stream_dedup_ingest_first_seen_wins_across_waves(spark, tmp_path):
    import hashlib
    import json as _json

    from pyspark.sql import types as T

    from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
    from techtalk_data_pipeline_snowpark_spark.streaming.file_ingest import (
        create_stage,
        land_file,
        stream_dedup_ingest,
    )

    stage = create_stage(str(tmp_path / "stage"))
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "t")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    waves = [
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],  # 2 dups 0
        [(10, "alpha beta"), (11, "epsilon zeta")],  # 10 dups wave 0
        [(20, "epsilon zeta"), (21, "eta theta")],
    ]
    for wave in waves:
        land_file(
            stage,
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in wave),
        )
        q = stream_dedup_ingest(spark, stage, ckpt, root, schema)
        q.awaitTermination()
    got = {(r["doc_id"], r["text"]) for r in LakeTable(spark, root).read().collect()}
    assert got == {(0, "alpha beta"), (1, "gamma delta"), (11, "epsilon zeta"), (21, "eta theta")}
    for r in LakeTable(spark, root).read().collect():
        assert r["content_hash"] == hashlib.sha256(r["text"].encode()).hexdigest()


def test_stream_dedup_ingest_redelivery_is_noop(spark, tmp_path):
    import json as _json

    from pyspark.sql import types as T

    from techtalk_data_pipeline_snowpark_spark.lake import LakeTable
    from techtalk_data_pipeline_snowpark_spark.streaming.file_ingest import (
        create_stage,
        land_file,
        stream_dedup_ingest,
    )

    stage = create_stage(str(tmp_path / "stage"))
    root = str(tmp_path / "t")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    land_file(
        stage,
        "\n".join(_json.dumps({"doc_id": i, "text": f"text {i % 3}"}) for i in range(9)),
    )
    q = stream_dedup_ingest(spark, stage, str(tmp_path / "ckpt1"), root, schema)
    q.awaitTermination()
    before = {tuple(r) for r in LakeTable(spark, root).read().collect()}
    assert len(before) == 3  # 9 docs, 3 distinct contents, min ids win
    # a consumer that LOST its checkpoint re-reads every file: the
    # insert-only hash merge makes the redelivery an exact no-op
    q2 = stream_dedup_ingest(spark, stage, str(tmp_path / "ckpt2"), root, schema)
    q2.awaitTermination()
    after = {tuple(r) for r in LakeTable(spark, root).read().collect()}
    assert after == before
