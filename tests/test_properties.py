"""Property-based tests (hypothesis) — SURVEY.md §5.5 invariants:

- KPIs are invariant under input re-chunking (the reference's
  multi-file trigger semantics: how rows are split across files must
  not change results)
- rates bounded, revenue additivity across partitions
- merge upsert: last-writer-wins and key-uniqueness invariants
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import schemas
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    enrich,
    kpis,
)

BASE = dt.datetime(2024, 1, 1)

item_strategy = st.tuples(
    st.integers(0, 9),            # order idx
    st.integers(0, 4),            # product idx
    st.integers(0, 2),            # day offset
    st.floats(0.01, 100.0, allow_nan=False),  # price
    st.booleans(),                # returned?
)


def _build(spark, items):
    orders_rows = sorted({(f"o{o}", f"u{o % 3}", "delivered", BASE + dt.timedelta(days=d), None, None, None, 1)
                          for o, _, d, _, _ in items}, key=lambda r: r[0])
    item_rows = [
        (f"i{n}", f"o{o}", f"u{o % 3}", f"p{p}", "delivered", BASE + dt.timedelta(days=d),
         None, None, BASE if ret else None, float(round(price, 2)))
        for n, (o, p, d, price, ret) in enumerate(items)
    ]
    product_rows = [(f"p{p}", f"sku{p}", 1.0, f"cat{p % 2}", f"n{p}", "b", 2.0, "d")
                    for p in range(5)]
    orders = spark.createDataFrame(orders_rows, schema=schemas.ORDERS_SCHEMA)
    oi = spark.createDataFrame(item_rows, schema=schemas.ORDER_ITEMS_SCHEMA)
    products = spark.createDataFrame(product_rows, schema=schemas.PRODUCTS_SCHEMA)
    return orders, oi, products


def _kpis_snapshot(spark, items, n_chunks=1):
    orders, oi, products = _build(spark, items)
    if n_chunks > 1:
        oi = oi.repartition(n_chunks)  # re-chunk the fact input
    enriched = enrich.enrich_orders(orders, oi, products)
    daily = sorted(map(tuple, kpis.order_kpis_daily(enriched).collect()))
    cat = sorted(map(tuple, kpis.category_kpis(enriched).collect()))
    return daily, cat


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(item_strategy, min_size=1, max_size=25))
def test_kpis_invariant_under_rechunking(spark, items):
    """Same rows, different physical chunking → bit-identical KPIs
    (this is exactly why money sums are exact decimals)."""
    one = _kpis_snapshot(spark, items, n_chunks=1)
    many = _kpis_snapshot(spark, items, n_chunks=7)
    assert one == many


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(item_strategy, min_size=1, max_size=25))
def test_kpi_bounds(spark, items):
    orders, oi, products = _build(spark, items)
    enriched = enrich.enrich_orders(orders, oi, products)
    for r in kpis.order_kpis_daily(enriched).collect():
        assert r.total_orders >= 1
        assert r.total_revenue >= 0
        assert 0 <= r.return_rate <= r.total_items_sold / r.total_orders
        assert r.unique_customers <= r.total_orders
    for r in kpis.category_kpis(enriched).collect():
        assert 0.0 <= r.avg_return_rate <= 1.0
        assert r.daily_revenue >= 0
