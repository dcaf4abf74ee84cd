"""Raw→flat ingest pipelines — parity with the reference's Ingest* ops.

Pattern (IngestOrdersFromRawToFlat.scala:36-98):
  land raw JSON payload (one string column) → stream the raw table's new
  rows → flatten the JSON array case-insensitively → MERGE into the flat
  table — stream offset advancing atomically with the merge.

Spark-first: the raw table is a LakeTable with a single ``response`` string
column; "stream" = incremental scan from the last consumed version, with
the consumed version recorded in the *flat* table's merge commit (same
atomicity shape as the reference's transaction). Flattening uses
``from_json`` + explode with lower-cased map keys (functions/shims.py),
matching `get_ignore_case` (Implicits.scala:18-23).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.shims import json_array_to_exploded_fields
from ..lake import LakeTable, merge_into

RAW_SCHEMA = T.StructType([T.StructField("response", T.StringType())])


def land_raw(spark: SparkSession, raw_root: str, payload_json: str) -> LakeTable:
    """Land one REST payload (a JSON array string) into the raw table —
    IngestOrdersFromRawToFlat.scala:39-53."""
    raw = LakeTable.create(spark, raw_root, RAW_SCHEMA, if_not_exists=True)
    raw.append(spark.createDataFrame([(payload_json,)], RAW_SCHEMA))
    return raw


def _consumed_version(flat: LakeTable, raw_root: str) -> int:
    if not flat.exists():
        return 0
    return int(flat.snapshot().properties.get(f"stream.consumed.{raw_root}", 0))


def ingest_raw_to_flat(
    spark: SparkSession,
    raw_root: str,
    flat_root: str,
    schema: T.StructType,
    merge_keys: list[str],
    update_on_match: bool = False,
    num_buckets: int = 8,
) -> dict:
    """One micro-batch tick: consume raw-stream rows → flatten → MERGE.

    ``update_on_match=False`` = insert-only merge (orders,
    IngestOrdersFromRawToFlat.scala:74-89); True = upsert (ratings,
    IngestRatingsFromRawToFlat.scala:75-103).
    Exactly-once: the consumed raw version rides in the same commit as the
    merge; re-running a tick re-reads nothing.
    """
    raw = LakeTable(spark, raw_root)
    flat = LakeTable(spark, flat_root)
    start_v = _consumed_version(flat, raw_root)
    end_v = raw.latest_version()
    if end_v <= start_v:
        return {"rows_inserted": 0, "rows_updated": 0, "skipped": True}
    new_raw = raw.read_incremental(start_v, end_v)
    flattened = json_array_to_exploded_fields(new_raw, schema, "response")
    # MERGE requires key-unique source: keep one row per key per tick
    deduped = flattened.dropDuplicates(merge_keys)
    props = {f"stream.consumed.{raw_root}": end_v}
    if not flat.exists():
        # bootstrap: first tick creates the table (Overwrite saveAsTable
        # fallback — IngestOrdersFromRawToFlat.scala:93-96)
        flat = LakeTable.create(
            spark, flat_root, schema, key_cols=merge_keys, num_buckets=num_buckets
        )
        res = flat.append(deduped, properties=props)
        n = flat.read().count()
        return {"rows_inserted": n, "rows_updated": 0, "bootstrap": True}
    res = merge_into(
        flat,
        deduped,
        on=merge_keys,
        when_matched_update="all" if update_on_match else None,
        when_not_matched_insert=True,
        properties=props,
    )
    return res.summary


def overwrite_from_files(
    spark: SparkSession,
    file_paths: list[str],
    flat_root: str,
    schema: T.StructType,
) -> dict:
    """IngestAndOverwriteRestaurantWithStage.scala:39-43: read staged JSON
    files, flatten, overwrite the dimension table."""
    raw = spark.read.text(file_paths).withColumnRenamed("value", "response")
    flattened = json_array_to_exploded_fields(raw, schema, "response")
    flat = LakeTable.create(spark, flat_root, schema, if_not_exists=True)
    res = flat.overwrite(flattened, schema=schema)
    return {"version": res.version}
