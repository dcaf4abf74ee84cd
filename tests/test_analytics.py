"""Reference-parity analytics pipelines vs DuckDB oracle on the
restaurant-domain fixtures (FIXTURES.md §4, SURVEY.md §5 item 5)."""

import duckdb
import pytest

from techtalk_data_pipeline_snowpark_spark.fixtures import (
    orders,
    payments,
    ratings,
    restaurants,
)
from techtalk_data_pipeline_snowpark_spark.operators import (
    dq_order_paid_more_than_price,
    paid_with_amex_rating_gt_50,
    top_restaurants_last_30_days,
)

AS_OF = "2024-03-01 00:00:00"


@pytest.fixture(scope="module")
def domain(spark):
    o = orders(spark, 800, seed=42).cache()
    p = payments(spark, 1500, seed=42).cache()
    r = ratings(spark, 1200, seed=42).cache()
    rest = restaurants(spark, 200, seed=42).cache()
    con = duckdb.connect()
    con.register("orders_d", o.toPandas())
    con.register("payments_d", p.toPandas())
    con.register("ratings_d", r.toPandas())
    con.register("restaurants_d", rest.toPandas())
    return o, p, r, rest, con


def _rows(df, cols):
    return sorted(tuple(row[c] for c in cols) for row in df.collect())


def _sql_rows(con, sql, ncols):
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def test_dq_order_paid_more_than_price(spark, domain):
    o, p, _, _, con = domain
    got = _rows(
        dq_order_paid_more_than_price(o, p),
        ["orderCode", "totPrice", "totPaid"],
    )
    want = _sql_rows(
        con,
        """
        SELECT o.orderCode, o.totPrice,
               CAST(tp.totPaid AS DOUBLE) AS totPaid
        FROM orders_d o
        JOIN (SELECT orderCode, SUM(CAST(amount AS DECIMAL(18,2))) AS totPaid
              FROM payments_d GROUP BY orderCode) tp USING (orderCode)
        WHERE tp.totPaid > CAST(o.totPrice AS DECIMAL(18,2))
        """,
        3,
    )
    assert got == want and len(got) > 0


def test_paid_with_amex_rating_gt_50(spark, domain):
    o, p, r, _, con = domain
    got = _rows(
        paid_with_amex_rating_gt_50(o, p, r),
        ["orderCode", "restaurantCode", "customerEmail", "amount", "ratingInPercentage"],
    )
    want = _sql_rows(
        con,
        """
        SELECT o.orderCode, o.restaurantCode, o.customerEmail,
               p.amount, r.ratingInPercentage
        FROM orders_d o
        JOIN (SELECT * FROM payments_d WHERE paymentType='AMEX') p USING (orderCode)
        JOIN (SELECT * FROM ratings_d WHERE ratingInPercentage > 50) r
          ON o.restaurantCode = r.restaurantCode AND o.customerEmail = r.customerEmail
        """,
        5,
    )
    assert got == want


def test_top_restaurants_last_30_days(spark, domain):
    _, _, r, rest, con = domain
    df = top_restaurants_last_30_days(r, rest, as_of=AS_OF)
    got = _rows(df, ["restaurantCode", "restaurantName", "avgRating"])
    want = _sql_rows(
        con,
        f"""
        SELECT a.restaurantCode, b.restaurantName,
               ROUND(AVG(CAST(a.ratingInPercentage AS DOUBLE)), 2) AS avgRating
        FROM ratings_d a JOIN restaurants_d b USING (restaurantCode)
        WHERE CAST(a.dateOfRate AS DATE)
              BETWEEN CAST(TIMESTAMP '{AS_OF}' - INTERVAL 30 DAY AS DATE)
                  AND CAST(TIMESTAMP '{AS_OF}' AS DATE)
        GROUP BY a.restaurantCode, b.restaurantName
        """,
        3,
    )
    assert len(got) > 0
    assert got == want
    # sorted desc by avgRating
    vals = [row.avgRating for row in df.collect()]
    assert vals == sorted(vals, reverse=True)


def test_top_restaurants_plan_broadcasts_dim(spark, domain):
    _, _, r, rest, _ = domain
    plan = top_restaurants_last_30_days(r, rest, as_of=AS_OF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_session_window_matches_manual_sessionization(spark, sf_dir):
    """The built-in F.session_window path must agree with the manual
    lag/cumsum sessionizer (boundary conventions aligned: builtin splits
    on >= gap, manual on > gap → compare g vs g-1)."""
    from techtalk_data_pipeline_snowpark_spark.operators.sessions import (
        session_stats,
        session_window_stats,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    native = {
        (r.user_id, r.start_s): (r.end_s, r.n_events, round(r.sum_value, 4))
        for r in session_window_stats(ev, gap_seconds=1800).collect()
    }
    manual = {
        (r.user_id, r.start_s): (r.end_s, r.n_events, round(r.sum_value, 4))
        for r in session_stats(ev, gap_seconds=1799).collect()
    }
    assert native == manual and native
