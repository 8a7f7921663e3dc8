"""Interval (range) join — |left.ts − right.ts| ≤ gap within a key.

Another join type absent from the reference (SURVEY.md §2.4). The
naive formulation is an inequality join, which Spark plans as a
broadcast-nested-loop / cartesian per key — quadratic. The scale-safe
pattern implemented here is **time bucketing**: bucket both sides by
``gap``-width windows, explode one side into its bucket and the two
adjacent buckets, equi-join on (key, bucket), then apply the exact
|Δt| ≤ gap filter as a residual. Any qualifying pair is at most one
bucket apart, so the equi-join finds every match; work is
O(matches + bucket collisions), fully shuffle-partitionable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: int,
    how: str = "inner",
) -> DataFrame:
    """Pairs (left row, right row) sharing ``key`` with
    ``|left_ts − right_ts| ≤ max_gap`` (integer timestamp units).
    Right-side columns keep their names; callers should pre-alias
    collisions."""
    # integer floor-div for bucketing: `/` is double division and loses
    # precision on large epoch values
    lb = left.withColumn("_bkt", F.expr(f"{left_ts} DIV {max_gap}"))
    rb = (
        right.withColumn("_bkt0", F.expr(f"{right_ts} DIV {max_gap}"))
        .withColumn(
            "_bkt",
            F.explode(F.array(F.col("_bkt0") - 1, F.col("_bkt0"), F.col("_bkt0") + 1)),
        )
        .drop("_bkt0")
        .withColumnRenamed(key, "_rkey")
        .withColumnRenamed("_bkt", "_rbkt")
    )
    # the |Δt| ≤ gap residual must live IN the join condition (not a
    # post-filter): for outer joins a post-filter would drop the
    # unmatched null rows, changing semantics
    cond = (
        (lb[key] == rb["_rkey"])
        & (lb["_bkt"] == rb["_rbkt"])
        & (F.abs(lb[left_ts] - rb[right_ts]) <= max_gap)
    )
    return lb.join(rb, cond, how).drop("_bkt", "_rbkt", "_rkey")
