"""SamplePipeline parity — the reference's demo DAG wired onto this engine.

Reference (tt-dps-pipeline-rest SamplePipeline.scala:10-35): four ingest
operations fan into three analytics operations, evaluated depth-ordered,
optionally continuously. Here each node is a real engine operation over a
LakeTable landscape rooted at ``root``:

    ingest_orders ─┐
    ingest_ratings ─┼─> dq_overpaid ─┐
    ingest_payments ┤                ├─ (depth-ordered evaluation)
    ingest_restaurants ┴─> amex_gt50 ┴─> top_restaurants

Returns the Pipeline plus accessors so tests/demos can read the tables.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from .. import fixtures
from ..lake import LakeTable
from ..operators.analytics import (
    dq_order_paid_more_than_price,
    paid_with_amex_rating_gt_50,
    top_restaurants_last_30_days,
)
from ..operators.ingest import ingest_raw_to_flat, land_raw
from .dag import DAG, Operation, Pipeline

ORDER_SCHEMA = T.StructType(
    [
        T.StructField("orderCode", T.StringType()),
        T.StructField("customerEmail", T.StringType()),
        T.StructField("totPrice", T.DoubleType()),
        T.StructField("restaurantCode", T.StringType()),
        T.StructField("dateOfOrder", T.StringType()),
    ]
)
PAYMENT_SCHEMA = T.StructType(
    [
        T.StructField("paymentCode", T.StringType()),
        T.StructField("paymentType", T.StringType()),
        T.StructField("paymentDate", T.StringType()),
        T.StructField("orderCode", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)
RATING_SCHEMA = T.StructType(
    [
        T.StructField("restaurantCode", T.StringType()),
        T.StructField("ratingInPercentage", T.IntegerType()),
        T.StructField("dateOfRate", T.StringType()),
        T.StructField("customerEmail", T.StringType()),
    ]
)
RESTAURANT_SCHEMA = T.StructType(
    [
        T.StructField("restaurantCode", T.StringType()),
        T.StructField("restaurantName", T.StringType()),
        T.StructField("peopleCapacity", T.IntegerType()),
    ]
)

_ENTITIES = {
    "orders": (ORDER_SCHEMA, ["orderCode"], fixtures.orders),
    "payments": (PAYMENT_SCHEMA, ["paymentCode"], fixtures.payments),
    "ratings": (RATING_SCHEMA, ["restaurantCode", "customerEmail"], fixtures.ratings),
    "restaurants": (RESTAURANT_SCHEMA, ["restaurantCode"], fixtures.restaurants),
}


def build_sample_pipeline(
    spark: SparkSession, root: str, n_records: int = 200, seed: int = 42,
    as_of: str | None = "2024-03-01T00:00:00",
) -> tuple[Pipeline, dict]:
    """Wire the reference demo DAG (SamplePipeline.scala:20-32)."""
    results: dict = {}

    def make_ingest(entity: str):
        schema, keys, gen = _ENTITIES[entity]

        def run():
            payload = "[" + ",".join(gen(spark, n_records, seed=seed).toJSON().collect()) + "]"
            land_raw(spark, os.path.join(root, f"raw_{entity}"), payload)
            res = ingest_raw_to_flat(
                spark,
                os.path.join(root, f"raw_{entity}"),
                os.path.join(root, f"flat_{entity}"),
                schema,
                merge_keys=keys,
                update_on_match=(entity == "ratings"),
            )
            results[f"ingest_{entity}"] = res
            return res

        return Operation(f"ingest_{entity}", run)

    def flat(entity: str):
        return LakeTable(spark, os.path.join(root, f"flat_{entity}")).read()

    def run_dq():
        out = dq_order_paid_more_than_price(flat("orders"), flat("payments"))
        out.write.mode("overwrite").parquet(os.path.join(root, "dq_overpaid"))
        results["dq"] = out.count()
        return results["dq"]

    def run_amex():
        out = paid_with_amex_rating_gt_50(flat("orders"), flat("payments"), flat("ratings"))
        out.write.mode("overwrite").parquet(os.path.join(root, "amex_gt50"))
        results["amex"] = out.count()
        return results["amex"]

    def run_top():
        out = top_restaurants_last_30_days(flat("ratings"), flat("restaurants"), as_of=as_of)
        out.createOrReplaceTempView("top_restaurants_last_30_days")
        out.write.mode("overwrite").parquet(os.path.join(root, "top_restaurants"))
        results["top"] = out.count()
        return results["top"]

    ing = {e: make_ingest(e) for e in _ENTITIES}
    dq = Operation("dq_overpaid", run_dq)
    amex = Operation("amex_gt50", run_amex)
    top = Operation("top_restaurants", run_top)

    # fan-in edges (SamplePipeline.scala:20-32): analytics depend on ingests
    ing["orders"] >> dq
    ing["payments"] >> [dq, amex]
    ing["ratings"] >> [amex, top]
    ing["restaurants"] >> top
    ing["orders"] >> amex

    dag = DAG(list(ing.values()))
    return Pipeline(dag), results
