"""Enrichment: the 3-way join producing the ``transformed_orders`` table.

Reference semantics (transform.py:305-323):

    orders o JOIN order_items oi ON o.order_id = oi.order_id
             JOIN products p     ON oi.product_id = p.id
    + derived order_date = to_date(created_at)
    + 8-column projection

Spark-first deviations (the HOW, not the WHAT):
- ``products`` is a dimension table ⇒ **broadcast hash join** (the
  reference never hints this; Catalyst would usually catch it via AQE,
  but at 100 TB the fact side must never shuffle for a dim join, so we
  hint explicitly).
- The big orders⋈order_items join is a shuffle on ``order_id`` —
  both sides are facts, so a shuffle (sort-merge or shuffled-hash,
  Catalyst's choice with AQE skew splitting) is the correct physical
  plan; bucketing both tables by order_id removes it entirely for
  repeated pipelines (see ``bucketize`` helper).
- Projection is applied immediately after the join so Catalyst prunes
  the parquet scans down to the 8 needed columns (verify with
  ``.explain``: ReadSchema must not contain unused columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_orders(
    orders: DataFrame,
    order_items: DataFrame,
    products: DataFrame,
    broadcast_products: bool = True,
) -> DataFrame:
    """orders ⋈ order_items ⋈ products → enriched (reference transform.py:311-323).

    Output columns (FIXTURES.md §2): order_id, user_id, status,
    order_date, sale_price, product_id, category, returned_at.
    """
    o = orders.alias("o")
    oi = order_items.alias("oi")
    p = F.broadcast(products) if broadcast_products else products
    p = p.alias("p")

    joined = o.join(oi, F.col("o.order_id") == F.col("oi.order_id"), "inner").join(
        p, F.col("oi.product_id") == F.col("p.id"), "inner"
    )
    return joined.select(
        F.col("o.order_id").alias("order_id"),
        F.col("o.user_id").alias("user_id"),
        F.col("o.status").alias("status"),
        F.to_date(F.col("o.created_at")).alias("order_date"),
        F.col("oi.sale_price").alias("sale_price"),
        F.col("oi.product_id").alias("product_id"),
        F.col("p.category").alias("category"),
        F.col("oi.returned_at").alias("returned_at"),
    )


def bucketize(df: DataFrame, table_name: str, keys: list[str], num_buckets: int = 64) -> None:
    """Persist ``df`` bucketed by join keys so repeated fact⋈fact joins
    skip the shuffle entirely (co-located scan → sort-merge without
    exchange). At 100 TB this is the difference between a one-time
    write cost and a per-query multi-TB shuffle."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table_name)
    )
