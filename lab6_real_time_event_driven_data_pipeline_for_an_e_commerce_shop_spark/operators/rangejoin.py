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


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval-OVERLAP join: pairs whose [start, end) ranges intersect
    (``l.start < r.end AND r.start < l.end``) within a key — the
    validity-interval / feature-window workhorse the point-gap
    ``interval_join`` can't express.

    Scale shape: each side explodes into the fixed-width buckets its
    interval spans (an interval of length L lands in ~L/width
    buckets), the join is an equi-join on (key, bucket), the exact
    overlap predicate is a residual IN the join condition, and
    duplicate hits from a pair sharing several buckets are eliminated
    by keeping only the FIRST shared bucket (max of the two start
    buckets) — a pure predicate, no post-dedup shuffle. ``how='left'``
    runs inner + left-anti union (the exploded left can't null-extend
    once per bucket). Coordinates must be non-negative integers
    (DIV truncates toward zero); empty intervals (start >= end) match
    nothing. Pick ``bucket_width`` near the typical interval length:
    work is O(matches + span/width).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"overlap_join supports inner/left, got {how!r}")

    def _bucketed(df, start, end, b0, bkt):
        lo = F.expr(f"{start} DIV {bucket_width}")
        hi = F.expr(f"({end} - 1) DIV {bucket_width}")
        spans = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
            F.array().cast("array<bigint>")  # empty interval: no buckets
        )
        return df.withColumn(b0, lo).withColumn(bkt, F.explode(spans))

    # how='left' carries a synthetic unique row id through the bucketed
    # explode and anti-joins on IT, not on left.columns: column-equality
    # anti-joins are not null-safe, so a matched left row containing a
    # NULL attribute would never match itself and be emitted twice
    # (joined AND null-extended).
    #
    # The id-stamped frame MUST be persisted: monotonically_increasing_id
    # is nondeterministic (partition-layout-dependent) and this plan
    # references `left` in two branches (inner join + anti-join). If
    # `left` sits downstream of a shuffle, re-evaluation could assign
    # different ids per branch — duplicating matched rows or dropping
    # unmatched ones. Persist pins one materialization both branches
    # read (MEMORY_AND_DISK: spills, never recomputes; callers running
    # at scale may .unpersist() the result's lineage after their action).
    if how == "left":
        from pyspark.storagelevel import StorageLevel

        left = left.withColumn("_lrow_id", F.monotonically_increasing_id()).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    lb = _bucketed(left, left_start, left_end, "_lb0", "_bkt")
    rb = _bucketed(right, right_start, right_end, "_rb0", "_rbkt").withColumnRenamed(
        key, "_rkey"
    )
    cond = (
        (lb[key] == rb["_rkey"])
        & (lb["_bkt"] == rb["_rbkt"])
        # each overlapping pair shares every bucket in the overlap; emit
        # it only from the first one (the later of the two start buckets)
        & (lb["_bkt"] == F.greatest(lb["_lb0"], rb["_rb0"]))
        & (lb[left_start] < rb[right_end])
        & (rb[right_start] < lb[left_end])
    )
    inner = lb.join(rb, cond, "inner").drop("_bkt", "_rbkt", "_rkey", "_lb0", "_rb0")
    if how == "inner":
        return inner
    matched_ids = inner.select("_lrow_id").distinct()
    unmatched = left.join(matched_ids, "_lrow_id", "left_anti")
    return inner.unionByName(unmatched, allowMissingColumns=True).drop("_lrow_id")


def scd2_intervals(
    df: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    end_col: str = "valid_to",
    start_col: str = "valid_from",
    open_end: int | None = None,
) -> DataFrame:
    """Build slowly-changing-dimension (SCD type 2) validity intervals
    from a change-event log: one row per (key, state run) with
    [valid_from, valid_to) — the dimension-history shape that
    ``overlap_join`` / ``interval_join`` then join facts against
    (as-of enrichment over a time range instead of a point).

    Consecutive events with IDENTICAL attrs collapse into one run
    (change-detection via lag over (key, ts)); valid_to is the next
    CHANGE's timestamp, ``open_end`` (default: null) for the current
    state. One window pass + one filter — no self-join, partitioned by
    key, so it scales as a single shuffle on the dimension key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts)
    changed = F.lit(False)
    for a in attrs:
        prev = F.lag(F.col(a)).over(w)
        # null-safe inequality: a change to/from NULL is still a change
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    runs = df.withColumn("_chg", first | changed).filter(F.col("_chg"))
    w2 = Window.partitionBy(key).orderBy("_vf")
    out = (
        runs.select(key, F.col(ts).alias("_vf"), *attrs)
        .withColumn("_vt", F.lead("_vf").over(w2))
    )
    end_val = (
        F.coalesce(F.col("_vt"), F.lit(open_end))
        if open_end is not None
        else F.col("_vt")
    )
    return out.select(
        key,
        F.col("_vf").alias(start_col),
        end_val.alias(end_col),
        *attrs,
    )
