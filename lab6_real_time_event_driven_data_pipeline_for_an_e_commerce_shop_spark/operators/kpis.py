"""KPI aggregations — the analytical heart of the reference.

Exact semantics from reference transform.py:346-368, including the
deliberate quirks (SURVEY.md §2.5 fine print) that tests pin down so
nobody "fixes" them into divergence:

- ``avg_order_value`` is the mean **item** sale price, not mean order
  total (transform.py:350).
- category ``avg_return_rate`` divides by row count; order-level
  ``return_rate`` divides by **distinct orders** (transform.py:351 vs 363).
- ``returned`` means ``returned_at IS NOT NULL`` on the **item**
  (transform.py:351, 363 — item-level returns).

Physical notes for 100 TB:
- Both KPIs are hash aggregations with map-side partial aggregation —
  the shuffle carries only (group key → partial state), never raw rows.
- ``countDistinct`` expands to a two-phase exact distinct; it is the
  most expensive piece. At serving scale, swap for
  ``approx_count_distinct`` when ±2% is acceptable (kept exact here to
  match the reference and the oracle).
- When both KPI tables are derived from one enriched DataFrame, cache
  the input (the reference recomputes the 3-way join for every action —
  SURVEY.md §4 "common-subplan reuse" defect; ``compute_all`` fixes it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import cents, cents_sum, returned_flag

# Money sums accumulate exact integer cents (functions.expressions.
# cents_sum), never raw doubles: double addition is not associative, so
# a double SUM changes with partitioning — at 1000 executors the same
# query would return run-dependent low bits. Exact accumulation makes
# every KPI bit-reproducible across cluster sizes (and hash-comparable
# to any oracle); sale prices are 2-decimal by schema contract. For
# unknown-scale money use functions.expressions.exact_sum (decimal).


def category_kpis(enriched: DataFrame) -> DataFrame:
    """Category-level daily KPIs (reference transform.py:348-352)."""
    return enriched.groupBy("category", "order_date").agg(
        cents_sum("sale_price").alias("daily_revenue"),
        (cents_sum("sale_price") / F.count("sale_price"))
        .alias("avg_order_value"),
        (F.sum(returned_flag()).cast("double") / F.count("order_id"))
        .alias("avg_return_rate"),
    )


def order_kpis_daily(enriched: DataFrame) -> DataFrame:
    """Order-level daily KPIs (reference transform.py:359-365).

    Two-level aggregation: pre-aggregate per (order_date, order_id,
    user_id) — one row per order — then finish per order_date. After
    the pre-agg, each row IS one distinct order, so COUNT(DISTINCT
    order_id) degenerates to COUNT(*) (exactly equal — an order has one
    date and one user) and only ONE true distinct remains (user_id):
    Catalyst then plans a plain two-phase distinct-agg with NO Expand,
    instead of multiplying every row per distinct column. The
    item-level sums compose exactly because the partials are exact
    integer cents. Identical results, cheaper plan (A4)."""
    per_order = enriched.groupBy("order_date", "order_id", "user_id").agg(
        F.sum(cents("sale_price")).alias("_rev"),
        F.count("product_id").alias("_items"),
        F.sum(returned_flag()).alias("_returned"),
    )
    n_orders = F.count("*")  # rows are per-order ⇒ COUNT(DISTINCT order_id)
    return per_order.groupBy("order_date").agg(
        n_orders.alias("total_orders"),
        (F.sum("_rev") / 100.0).alias("total_revenue"),
        F.sum("_items").cast("long").alias("total_items_sold"),
        (F.sum("_returned").cast("double") / n_orders).alias("return_rate"),
        F.countDistinct("user_id").alias("unique_customers"),
    )


def compute_all(enriched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Both KPI tables off ONE cached enriched DataFrame.

    Fixes the reference's recompute defect (transform.py:331-339 + 376 +
    390 run the join three times; SURVEY.md §4): cache once, derive both
    aggregates, let the caller unpersist after materializing.
    """
    enriched = enriched.cache()
    return category_kpis(enriched), order_kpis_daily(enriched)


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    within_us: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Fixed-anchor conversion funnel (the e-commerce classic:
    view → click → purchase): per user, t1 = the EARLIEST stage-1
    event; each later stage k is the earliest stage-k event at or
    after t(k-1) — optionally within ``within_us`` of the t1 anchor —
    and ``reached`` is the deepest stage attained. Timestamps are
    epoch-µs int64 end-to-end (route events through the layout-
    adaptive reader first), so every comparison is integer-exact and
    timezone-proof.

    Fixed-anchor semantics on purpose: the chain is anchored at the
    user's FIRST stage-1 event (the standard product-analytics
    definition, and a pure composition of MINs, so it is relational
    and engine-portable). A later anchor could complete a window the
    first one misses; that variant is sequence matching with
    backtracking — a different, join-explosive operator.

    Scale shape: one aggregate + (len(stages)−1) equi-joins, ALL keyed
    on ``user_col`` — co-partitioned shuffles that AQE coalesces, with
    the range predicates IN the join condition (outer-join rule).
    Funnel state per user is one row of k integers; no arrays, no
    per-user event collection."""
    if len(stages) < 2:
        raise ValueError("funnel_stages needs at least two stages")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("long").alias("_t"),
        F.col(type_col).alias("_s"),
    )
    out = (
        ev.filter(F.col("_s") == stages[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("t1"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        cand = ev.filter(F.col("_s") == stage).select(
            F.col("_u").alias("_cu"), F.col("_t").alias("_ct")
        )
        cond = (F.col("_cu") == F.col("_u")) & (
            F.col("_ct") >= F.col(f"t{i - 1}")
        )
        if within_us is not None:
            cond = cond & (F.col("_ct") <= F.col("t1") + F.lit(int(within_us)))
        prev_cols = ["_u"] + [f"t{j}" for j in range(1, i)]
        out = (
            out.join(cand, cond, "left")
            .groupBy(*prev_cols)
            .agg(F.min("_ct").alias(f"t{i}"))
        )
    reached = F.lit(1)
    for i in range(2, len(stages) + 1):
        reached = reached + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        F.col("_u").alias(user_col),
        *[F.col(f"t{i}").cast("long") for i in range(1, len(stages) + 1)],
        reached.cast("long").alias("reached"),
    )


def cohort_retention(
    events: DataFrame,
    period_us: int = 7 * 86400 * 1_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Cohort retention matrix (the product-analytics classic next to
    :func:`funnel_stages`): users are cohorted by the PERIOD of their
    first event — integer epoch-µs DIV ``period_us``, calendar-free
    and timezone-proof — and cell (cohort_period, period_offset)
    counts the DISTINCT cohort users active ``period_offset`` periods
    later. Pure integer arithmetic end-to-end, so the matrix is
    relational, engine-portable, and hash-exact; ``retention_ppm`` is
    integer parts-per-million (n_active·10⁶ DIV n_cohort — never a
    float division; offset 0 is 10⁶ by construction since every
    user's first event lies in their cohort period).

    Scale shape: one user-grain MIN (shuffle on user), one
    co-partitioned user-keyed join back, then a DISTINCT at
    (user, cohort, offset) grain BEFORE the cell count — the
    two-level exact-countDistinct shape (no Expand); the cell table is
    ~periods²/2 rows. The cohort-size join is on the tiny cell table
    (broadcast)."""
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).cast("long").alias("_t"),
    ).filter(F.col("_u").isNotNull() & F.col("_t").isNotNull())
    # integer DIV, never `/`: epoch µs sit at ~1.7e18 where double
    # division corrupts the low digits (CLAUDE.md float rules)
    # r18 (VERDICT r17 #4): hash-by-_u at adaptive width — a SUBSET of
    # the distinct's clustering columns satisfies its distribution, so
    # this ONE sized exchange serves the distinct, the per-user MIN
    # groupBy AND the cohort join below (all inside the cells cache
    # body, which a vanilla session materializes WITHOUT AQE).
    from .dedup import _substrate_partitions

    per = ev.select(
        "_u", F.expr(f"_t div {int(period_us)}").alias("_p")
    ).repartition(_substrate_partitions(ev), "_u").distinct()
    first = per.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    from ..functions.cache import bounded_cache

    # the size branch below re-reads cells — Spark does not CSE
    # identical subtrees across join branches (the r12/r13 lesson), so
    # uncached the whole scan→distinct→MIN-join→agg chain would run
    # twice per evaluation
    cells = bounded_cache(
        "kpis.cohort_cells",
        per.join(first, "_u")
        .select("_u", "_cohort", (F.col("_p") - F.col("_cohort")).alias("_off"))
        .groupBy("_cohort", "_off")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active")),
    )
    size = cells.filter(F.col("_off") == 0).select(
        "_cohort", F.col("n_active").alias("n_cohort")
    )
    return cells.join(F.broadcast(size), "_cohort").select(
        F.col("_cohort").cast("long").alias("cohort_period"),
        F.col("_off").cast("long").alias("period_offset"),
        "n_active",
        "n_cohort",
        F.expr("n_active * 1000000 div n_cohort").alias("retention_ppm"),
    )
