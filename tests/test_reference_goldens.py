"""Golden tests mirroring the reference's e2e scenarios (SURVEY.md §5).

Reference tests: dsl/PriceAlertsAppTest.java:57-110 and
processor/PriceAlertsAppTest.java:58-115 — two scenarios each, plus
the implicit no-alert case. Batch DataFrame semantics here; the
streaming twins live in test_streaming.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_streams_homework_spark.operators import relational as R
from tests.conftest import ts

MAX_SUM_PER_MINUTE = 3000.0  # dsl/PriceAlertsApp.java:29


def _pipeline(spark, purchases, products):
    """The reference pipeline: join → 1-min window → sum(q×p) → filter."""
    enriched = R.join_stream_table(
        purchases, products, purchases["productid"] == products["id"], "inner"
    )
    agg = R.windowed_sum(
        enriched,
        ["productid"],
        "ts",
        F.col("quantity") * F.col("price"),
        "1 minute",
    )
    alerts = R.filter_threshold(agg, "total_sum_per_minute", MAX_SUM_PER_MINUTE)
    return R.project_alert(alerts, "productid")


def _purchases(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def _products(spark, schema, price):
    # createTestProduct: id=1, name="TV", description="TV set"
    # — dsl/PriceAlertsAppTest.java:120-127
    return spark.createDataFrame([(1, "TV", "TV set", price)], schema)


def test_many_small_purchases_aggregate_over_threshold(
    spark, purchases_schema, products_schema
):
    """6 purchases × qty 2 × price 300 = 3600 > 3000 → ONE alert with
    the epoch-minute window start (dsl test:57-83)."""
    rows = [(i, 2, 1, ts(5, 10 * i % 60)) for i in range(6)]
    out = _pipeline(
        spark,
        _purchases(spark, purchases_schema, rows),
        _products(spark, products_schema, 300.0),
    ).collect()
    assert len(out) == 1
    alert = out[0]
    assert alert.alert_key == "1"
    assert alert.total_sum_per_minute == 3600.0
    # window start truncated to the minute (dsl test:80)
    assert alert.window_start == dt.datetime(2024, 1, 1, 0, 5, 0)


def test_one_big_purchase_crosses_threshold(
    spark, purchases_schema, products_schema
):
    """1 purchase × qty 100 × price 31 = 3100 > 3000 → one alert
    (dsl test:85-110)."""
    rows = [(7, 100, 1, ts(9, 30))]
    out = _pipeline(
        spark,
        _purchases(spark, purchases_schema, rows),
        _products(spark, products_schema, 31.0),
    ).collect()
    assert len(out) == 1
    assert out[0].alert_key == "1"
    assert out[0].total_sum_per_minute == 3100.0
    assert out[0].window_start == dt.datetime(2024, 1, 1, 0, 9, 0)


def test_below_threshold_produces_no_alert(
    spark, purchases_schema, products_schema
):
    """Implicit negative case: sum ≤ threshold ⇒ no output (dsl:115)."""
    rows = [(1, 2, 1, ts(3))]  # 2 × 300 = 600 ≤ 3000
    out = _pipeline(
        spark,
        _purchases(spark, purchases_schema, rows),
        _products(spark, products_schema, 300.0),
    ).collect()
    assert out == []


def test_purchases_in_different_minutes_do_not_merge(
    spark, purchases_schema, products_schema
):
    """Tumbling (not sliding) windows: same sums split across minute
    boundaries stay separate (TimeWindows.of(1m).advanceBy(1m))."""
    rows = [(1, 6, 1, ts(1, 59)), (2, 6, 1, ts(2, 0))]
    out = _pipeline(
        spark,
        _purchases(spark, purchases_schema, rows),
        _products(spark, products_schema, 300.0),
    ).collect()
    # each minute sums to 1800 ≤ 3000 → no alerts; merged they would be 3600
    assert out == []


def test_left_join_preserves_unmatched_purchases(
    spark, purchases_schema, products_schema
):
    """The reference DECLARES leftJoin (dsl:99) but NPEs on a missing
    product (dsl:154-155). Engine contract: left join yields the
    purchase with null product columns instead of crashing."""
    purchases = _purchases(spark, purchases_schema, [(1, 2, 99, ts(1))])
    products = _products(spark, products_schema, 300.0)  # only id=1
    joined = R.join_stream_table(
        purchases, products, purchases["productid"] == products["id"], "left"
    ).collect()
    assert len(joined) == 1
    assert joined[0]["name"] is None
