"""Reference-parity analytics pipelines (SURVEY.md §2, FIXTURES.md §4).

Each function is the Spark-first expression of one derived pipeline from
the reference; filters are written before joins exactly as the reference
does (PaidWithAmexRatingGt50.scala:25-31) — Catalyst pushdown makes the
placement moot, but keeping the shape makes parity auditable.

Numeric note: money aggregates go through DECIMAL(18,2) so sums are exact
and engine-independent (the reference stores money as double rounded to
2dp client-side — Generator.scala:29-34; summing doubles is
order-dependent, decimal isn't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shims import dateadd, sysdate


def dq_order_paid_more_than_price(orders: DataFrame, payments: DataFrame) -> DataFrame:
    """DQOrderPaidMoreThanPrice.scala:42-52: per-order sum of payments
    joined to orders, keep orders paid MORE than their price."""
    tot_paid = payments.groupBy("orderCode").agg(
        F.sum(F.col("amount").cast("decimal(18,2)")).alias("totPaid")
    )
    return (
        orders.join(tot_paid, on="orderCode", how="inner")
        .where(F.col("totPaid") > F.col("totPrice").cast("decimal(18,2)"))
        .select(
            "orderCode",
            "customerEmail",
            F.col("totPrice"),
            F.col("totPaid").cast("double").alias("totPaid"),
            "restaurantCode",
            "dateOfOrder",
        )
    )


def paid_with_amex_rating_gt_50(
    orders: DataFrame, payments: DataFrame, ratings: DataFrame
) -> DataFrame:
    """PaidWithAmexRatingGt50.scala:24-52: pre-filter payments to AMEX and
    ratings to >50, then 3-way inner join through orders."""
    amex = payments.where(F.col("paymentType") == F.lit("AMEX")).select(
        "orderCode", "paymentType", "amount", "paymentDate"
    )
    good = ratings.where(F.col("ratingInPercentage") > F.lit(50)).select(
        "restaurantCode", "ratingInPercentage", "customerEmail"
    )
    joined = (
        orders.join(amex, on="orderCode", how="inner")
        .join(good, on=["restaurantCode", "customerEmail"], how="inner")
    )
    return joined.select(
        "orderCode",
        "restaurantCode",
        "customerEmail",
        "totPrice",
        "amount",
        "paymentType",
        "ratingInPercentage",
        "dateOfOrder",
    )


def top_restaurants_last_30_days(
    ratings: DataFrame, restaurants: DataFrame, as_of: str | None = None
) -> DataFrame:
    """TopRestaurantsLast30Days.scala:19-38: ratings in the trailing 30-day
    window (BETWEEN dateadd(day,-30,sysdate()) AND sysdate()), avg per
    restaurant rounded to 2, join names, sort desc.

    ``as_of`` injects a deterministic "now" (SURVEY.md §6 hard part e).
    Broadcast note: the restaurant dim is small → broadcast join, no
    shuffle of the ratings side beyond the aggregation.
    """
    now = sysdate(as_of)
    windowed = ratings.where(
        F.to_date(F.col("dateOfRate")).between(
            F.to_date(dateadd("day", -30, now)), F.to_date(now)
        )
    )
    avg_r = windowed.groupBy("restaurantCode").agg(
        F.round(F.avg(F.col("ratingInPercentage")), 2).alias("avgRating")
    )
    return (
        avg_r.join(F.broadcast(restaurants), on="restaurantCode", how="inner")
        .select("restaurantCode", "restaurantName", "peopleCapacity", "avgRating")
        .orderBy(F.col("avgRating").desc())
    )
