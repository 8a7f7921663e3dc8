"""Stream-stream joins — the watermark-bounded alternative for
referential completeness (SURVEY.md §7 step 10: "start with
stream-stream inner joins + watermark on created_at").

The medallion pipeline keeps the reference's *unbounded-wait* contract
via staging tables (streaming/pipeline.py). This module provides the
bounded-lateness variant: when a business SLA says "items and their
order arrive within δ of each other", a genuine stream-stream inner
join with watermarks does the buffering in Spark state, releasing
matches incrementally and GC-ing state past the watermark — no staging
tables at all. Pick per deployment:

- unbounded wait, arbitrary lateness  → MedallionPipeline (staging joins)
- bounded lateness δ, lower latency   → joined_orders_items (this module)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def joined_orders_items(
    orders_stream: DataFrame,
    items_stream: DataFrame,
    max_lateness: str = "1 hour",
    join_window: str = "1 hour",
) -> DataFrame:
    """Streaming orders ⋈ order_items on order_id, both sides
    watermarked; the time-range predicate bounds join state so Spark
    can GC buffered rows past ``watermark + window``.

    Output columns follow the enriched projection's order/items parts
    (products enrichment happens downstream — a static dim join is
    stateless and can be applied per-batch)."""
    o = (
        orders_stream.withWatermark("created_at", max_lateness)
        .select(
            F.col("order_id").alias("o_order_id"),
            "user_id",
            "status",
            F.col("created_at").alias("o_created_at"),
        )
    )
    i = items_stream.withWatermark("created_at", max_lateness).select(
        F.col("order_id").alias("i_order_id"),
        F.col("product_id"),
        F.col("sale_price"),
        F.col("returned_at"),
        F.col("created_at").alias("i_created_at"),
    )
    cond = (
        (F.col("o_order_id") == F.col("i_order_id"))
        & (F.col("i_created_at") >= F.col("o_created_at") - F.expr(f"INTERVAL {join_window}"))
        & (F.col("i_created_at") <= F.col("o_created_at") + F.expr(f"INTERVAL {join_window}"))
    )
    joined = o.join(i, cond, "inner")
    return joined.select(
        F.col("o_order_id").alias("order_id"),
        "user_id",
        "status",
        F.to_date("o_created_at").alias("order_date"),
        "sale_price",
        "product_id",
        "returned_at",
    )
