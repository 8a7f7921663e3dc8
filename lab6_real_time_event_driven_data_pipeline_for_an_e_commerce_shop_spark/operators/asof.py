"""As-of (nearest-preceding) join — a join type the reference lacks
entirely (SURVEY.md §2.4 "Absent join types"), built as a composition
of existing DataFrame ops per the engine's custom-operator policy:
no cross join, no per-key Python.

Implementation: UNION the two sides tagged, sort within each key
partition by (ts, tag), and carry the left side's latest value forward
with ``last(ignorenulls=True)`` over an unbounded-preceding window.
One shuffle on the key, linear work — the plan a native engine's as-of
operator would produce, expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    strict: bool = False,
    right_order_col: str | None = None,
) -> DataFrame:
    """For every LEFT row, attach the RIGHT row with the greatest
    ``right_ts`` ≤ ``left_ts`` (< when ``strict``) within the same
    ``on`` key. Right columns come back null when no prior row exists.

    Tag ordering inside equal timestamps: right rows sort BEFORE left
    rows for the inclusive variant (so an equal-ts right row is
    visible), AFTER for the strict variant.

    ``right_order_col``: deterministic tie-break among right rows that
    share the same (key, ts) — the row with the GREATEST value wins.
    Without it, ``last(ignorenulls)`` carries whichever duplicate the
    sort happened to place last (partitioning-dependent).
    """
    rcols = right_value_cols or [c for c in right.columns if c not in (on, right_ts)]

    ord_expr = (
        F.col(right_order_col) if right_order_col is not None else F.lit(0)
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0 if not strict else 2).alias("_tag"),
        ord_expr.cast("long").alias("_ord"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn("_tag", F.lit(1))
    l_aug = l.select(
        *[F.col(c) for c in left.columns],
        "_ts",
        "_tag",
        F.lit(0).cast("long").alias("_ord"),
        F.lit(None).cast(r.schema["_r_ts"].dataType).alias("_r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    merged = l_aug.unionByName(r, allowMissingColumns=True)

    # _ord last: among right rows tied on (_ts, _tag) the greatest
    # right_order_col sorts last and is the one last(ignorenulls) carries.
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag", "_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.select(
        *[c for c in merged.columns if not c.startswith("_r_")],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in rcols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return carried.filter(F.col("_tag") == 1).drop("_ts", "_tag", "_ord")
