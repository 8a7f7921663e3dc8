"""Serving-edge formatting — the reference's DynamoDB boundary
(transform.py:374-402) as declarative casts.

The reference collects KPI rows to the driver and rewrites them
item-by-item: ``strftime('%Y-%m-%d')`` on dates (P4), ``Decimal(str(x))``
on numerics because DynamoDB rejects float (P5), ``int(x) if x is not
None else 0`` on counts (P6). Here the same shaping is a projection —
distributed, no collect — and the output lands in keyed serving tables
(gold) instead of a KV store; any real KV sink plugs in via
``foreachBatch`` over these rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import coalesce_zero, to_serving_decimal


def serving_category_kpis(cat: DataFrame) -> DataFrame:
    """category_kpis → serving shape (keys: category, order_date string;
    reference transform.py:134-145, 376-388)."""
    return cat.select(
        F.col("category"),
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
        to_serving_decimal("daily_revenue").alias("daily_revenue"),
        to_serving_decimal("avg_order_value").alias("avg_order_value"),
        to_serving_decimal("avg_return_rate").alias("avg_return_rate"),
    )


def serving_order_kpis(daily: DataFrame) -> DataFrame:
    """order_kpis_daily → serving shape (key: order_date string;
    reference transform.py:164-173, 390-402)."""
    return daily.select(
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
        coalesce_zero("total_orders", "int").alias("total_orders"),
        to_serving_decimal("total_revenue").alias("total_revenue"),
        coalesce_zero("total_items_sold", "int").alias("total_items_sold"),
        to_serving_decimal("return_rate").alias("return_rate"),
        coalesce_zero("unique_customers", "int").alias("unique_customers"),
    )
