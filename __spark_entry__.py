"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in the
``lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark``
package (plans/queries.py is the catalog).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (  # noqa: E402
    queries as _q,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: order-level daily KPIs (reference
    transform.py:359-365) on sf0.001 — 3-way join + grouped agg with
    exact count-distincts."""
    return _q.q04_order_kpis_daily(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.catalog()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names,
    same rounding). Entries absent here get a rows-only check."""
    return _q.oracles()
