"""Incremental sketch maintenance for streaming gold tables.

The HLL register table (operators/sketches.hll_registers) is mergeable
state: registers combine by MAX, losslessly. A streaming pipeline
therefore never recomputes a distinct-count over history — each
micro-batch contributes its register partial, the store keeps the
running MAX per (group, register), and estimates are finished on read.
Store size is bounded by groups × 2^p rows FOREVER, regardless of how
many events have streamed through — the constant-state answer to
"distinct users per day over an unbounded stream".

Reference parity: the reference recomputes nunique over full history
every cycle (containers/transformation/transform.py); this is the
scale path that replaces it. Exactness contract: merged registers are
IDENTICAL to registers computed over the concatenated history (MAX is
associative/commutative/idempotent — replays and overlapping batches
are absorbed), so the streamed estimate equals the batch estimate
bit-for-bit. Pinned by tests/test_streaming_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import sketches, upsert

REG_KEYS = ["_hll_reg"]


def merge_hll_registers(
    spark: SparkSession,
    store_path: str,
    batch_df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
) -> None:
    """Fold one micro-batch into the persisted register store.

    MERGE shape: the batch's register partial (≤ groups × 2^p rows)
    left-joins the store restricted to ITS OWN keys, takes
    greatest(old, new), and upserts — rows for untouched registers are
    never rewritten (partitioned stores rewrite only touched
    partitions via upsert.merge's dynamic partition overwrite)."""
    keys = group_cols + REG_KEYS
    from pyspark.sql import functions as F

    batch_regs = sketches.hll_registers(batch_df, group_cols, value_col, p)
    import os

    if os.path.exists(store_path):
        old = (
            spark.read.parquet(store_path)
            .join(batch_regs.select(keys), keys, "left_semi")
        )
        source = (
            batch_regs.unionByName(old)
            .groupBy(keys)
            .agg(F.max("_hll_r").alias("_hll_r"))
        )
    else:
        source = batch_regs
    upsert.merge(spark, store_path, source, keys=keys)


def read_hll_estimates(
    spark: SparkSession,
    store_path: str,
    group_cols: list[str],
    p: int = 8,
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Finish estimates from the persisted register store."""
    return sketches.hll_estimate_from_registers(
        spark.read.parquet(store_path), group_cols, p, estimate_col
    )
