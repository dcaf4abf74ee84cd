"""File-arrival ingest — parity with the reference's stage + stream-on-stage
(IngestPaymentsStreamFromStage.scala:32-71; stage DDL SnowflakeUtils.scala:
83-115).

Two equivalent implementations of "process each landed file exactly once":

1. ``stream_ingest``  — Structured Streaming file source. The checkpoint's
   file manifest IS the exactly-once guarantee (same role as Snowflake's
   stream-on-stage offset). foreachBatch merges each micro-batch into a
   LakeTable.
2. ``batch_ingest_with_manifest`` — batch discovery + ingested-files
   manifest table + left_anti join: the explicit version of the same thing,
   usable without a streaming runtime. (SURVEY.md §3 entry point 3.)

A "stage" here is just a watched directory — `land_file` copies a payload
in (PUT parity); no REFRESH needed since listing is native.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.shims import json_array_to_exploded_fields
from ..lake import LakeTable, merge_into


def create_stage(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def land_file(stage_dir: str, content: str, suffix: str = ".json") -> str:
    """PUT parity (SnowflakeUtils.scala:100-115): atomic move into the
    watched dir so the file source never sees a partial file."""
    tmp = os.path.join(stage_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(content)
    final = os.path.join(stage_dir, f"{uuid.uuid4().hex}{suffix}")
    os.rename(tmp, final)
    return final


def stream_ingest(
    spark: SparkSession,
    stage_dir: str,
    checkpoint_dir: str,
    target_root: str,
    schema: T.StructType,
    merge_keys: list[str],
    num_buckets: int = 8,
):
    """Structured Streaming file source → flatten → merge per micro-batch.

    Returns the StreamingQuery; call with trigger availableNow to drain the
    backlog exactly once (Trigger.AvailableNow parity with the reference's
    per-tick consumption).
    """
    raw = (
        spark.readStream.format("text")
        .schema(T.StructType([T.StructField("value", T.StringType())]))
        .load(stage_dir)
        .withColumnRenamed("value", "response")
    )

    target = LakeTable.create(
        spark, target_root, schema, key_cols=merge_keys,
        num_buckets=num_buckets, if_not_exists=True,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int):
        flat = json_array_to_exploded_fields(batch_df, schema, "response")
        dedup = flat.dropDuplicates(merge_keys)
        merge_into(
            LakeTable(batch_df.sparkSession, target_root),
            dedup,
            on=merge_keys,
            when_matched_update="all",
            properties={"stream.batch_id": batch_id},
        )

    return (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    spark: SparkSession,
    stage_dir: str,
    checkpoint_dir: str,
    target_root: str,
    schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 8,
):
    """Streaming dedup-on-ingest: JSON-lines document files land in a
    watched stage dir; every micro-batch admits only corpus-NEW content
    via ``operators/dedup.dedup_ingest`` (insert-only MERGE keyed on
    sha256(text)) into a content-hash-keyed LakeTable.

    Exactly-once composition, twice over: the streaming checkpoint's file
    manifest delivers each landed file to exactly one micro-batch, AND the
    insert-only hash merge makes redelivery (a fresh consumer re-reading
    the same files after losing its checkpoint) an exact no-op — the
    final corpus is identical either way. First-seen content wins across
    batches; min id wins within a batch.

    ``schema`` is the DOCUMENT schema (``id_col`` + ``text_col`` + any
    extra columns); the target table's schema is content_hash + those.
    Returns the StreamingQuery (trigger availableNow — one call drains
    the current backlog and stops, the reference's per-tick consumption
    shape, IngestPaymentsStreamFromStage.scala:32-71)."""
    from ..operators.dedup import dedup_ingest

    table_schema = T.StructType(
        [T.StructField("content_hash", T.StringType()), *schema.fields]
    )
    LakeTable.create(
        spark, target_root, table_schema, key_cols=["content_hash"],
        num_buckets=num_buckets, if_not_exists=True,
    )
    raw = spark.readStream.format("json").schema(schema).load(stage_dir)

    def apply_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        dedup_ingest(
            LakeTable(batch_df.sparkSession, target_root), batch_df, text_col, id_col
        )

    return (
        raw.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


CLOUD_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("eventType", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("eventTime", T.StringType()),
        T.StructField("data", T.StructType([T.StructField("url", T.StringType())])),
    ]
)


def cloud_event_ingest(
    spark: SparkSession,
    notifications_dir: str,
    checkpoint_dir: str,
    target_root: str,
    schema: T.StructType,
    merge_keys: list[str],
    num_buckets: int = 8,
):
    """S13 parity (Event-grid-template/template.json): auto-ingest driven
    by cloud-event NOTIFICATIONS instead of directory listing.

    The reference wires Azure Event Grid BlobCreated events to Snowpipe;
    here the notification stream is a Structured Streaming JSON source
    whose events carry the landed blob URL (Event Grid event shape). Each
    micro-batch reads EXACTLY the notified files and merges them — at
    cloud scale this avoids listing a million-object stage on every tick,
    which is the entire point of notification-driven ingest. Files landed
    WITHOUT a notification are never read (verified by test). Exactly-once
    composition is the same as stream_ingest: the notification-source
    checkpoint de-duplicates deliveries, and the key-idempotent MERGE
    absorbs any at-least-once replay of a batch.
    """
    notif = (
        spark.readStream.schema(CLOUD_EVENT_SCHEMA).json(notifications_dir)
        .where(F.col("eventType") == "Microsoft.Storage.BlobCreated")
    )

    LakeTable.create(
        spark, target_root, schema, key_cols=merge_keys,
        num_buckets=num_buckets, if_not_exists=True,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int):
        urls = [r.url for r in batch_df.select("data.url").where(
            F.col("data.url").isNotNull()).distinct().collect()]
        if not urls:
            return
        sess = batch_df.sparkSession
        raw = sess.read.text(urls).withColumnRenamed("value", "response")
        flat = json_array_to_exploded_fields(raw, schema, "response")
        dedup = flat.dropDuplicates(merge_keys)
        merge_into(
            LakeTable(sess, target_root),
            dedup,
            on=merge_keys,
            when_matched_update="all",
            properties={"autoingest.batch_id": batch_id, "autoingest.files": len(urls)},
        )

    return (
        notif.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def land_cloud_event(notifications_dir: str, blob_url: str) -> str:
    """Emit a BlobCreated notification (what Event Grid would deliver)."""
    import json as _json

    os.makedirs(notifications_dir, exist_ok=True)
    payload = _json.dumps(
        {
            "eventType": "Microsoft.Storage.BlobCreated",
            "subject": blob_url,
            "eventTime": "1970-01-01T00:00:00Z",
            "data": {"url": blob_url},
        }
    )
    return land_file(notifications_dir, payload, suffix=".json")


def batch_ingest_with_manifest(
    spark: SparkSession,
    stage_dir: str,
    manifest_root: str,
    target_root: str,
    schema: T.StructType,
    merge_keys: list[str],
    num_buckets: int = 8,
) -> dict:
    """Batch variant: discover files, anti-join against the ingested-files
    manifest, process the new ones, record them. The manifest append and
    the data merge are two commits on two tables — crash between them
    re-processes a file, which the key-idempotent MERGE absorbs (same
    at-least-once-delivery + idempotent-apply = exactly-once-effect
    argument as the CDC engine)."""
    man_schema = T.StructType([T.StructField("file", T.StringType())])
    manifest = LakeTable.create(spark, manifest_root, man_schema, if_not_exists=True)
    files = [
        os.path.join(stage_dir, f)
        for f in os.listdir(stage_dir)
        if not f.startswith(".")
    ]
    if not files:
        return {"files": 0}
    fdf = spark.createDataFrame([(f,) for f in files], man_schema)
    new_files = [r.file for r in fdf.join(manifest.read(), "file", "left_anti").collect()]
    if not new_files:
        return {"files": 0}
    raw = spark.read.text(new_files).withColumnRenamed("value", "response")
    flat = json_array_to_exploded_fields(raw, schema, "response").dropDuplicates(merge_keys)
    target = LakeTable.create(
        spark, target_root, schema, key_cols=merge_keys,
        num_buckets=num_buckets, if_not_exists=True,
    )
    res = merge_into(target, flat, on=merge_keys, when_matched_update="all")
    manifest.append(spark.createDataFrame([(f,) for f in new_files], man_schema))
    return {"files": len(new_files), **res.summary}
