"""Table maintenance: small-file compaction and statistics collection.

At 100 TB the silent killers are (a) millions of small files from
incremental appends — every scan pays per-file open cost and the
driver pays listing cost — and (b) missing statistics, which starve
the cost-based optimizer and AQE of cardinality signals.

- :func:`compact` rewrites a parquet directory into size-targeted
  files (sortWithinPartitions optionally restores clustering for
  min/max pruning).
- :func:`column_stats` computes per-column (count, nulls, approx NDV,
  min, max) in ONE distributed pass — the engine-side equivalent of
  ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ceil(total_bytes / target) files; returns
    the new file count. Atomic-ish: writes to a temp dir, then swaps."""
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column stats in one pass: (column_name, n_rows, n_nulls,
    approx_ndv, min_value, max_value) — min/max stringified so mixed
    types share a schema."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__ndv`, `{c}__min`, `{c}__max`" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) as "
        "(column_name, n_rows, n_nulls, approx_ndv, min_value, max_value)"
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8
) -> F.Column:
    """Morton (Z-order) interleave key over ``cols`` for multi-column
    file clustering — the engine-side equivalent of Delta's
    ``OPTIMIZE ... ZORDER BY``.

    Sorting a table by ONE column gives tight parquet min/max footers
    (→ row-group/file skipping) for that column only; range predicates
    on any OTHER column still scan every file. Interleaving the high
    bits of each column's normalized position makes every file cover a
    small hyper-rectangle, so scans filtered on ANY zordered column
    skip most files.

    Normalization is linear min/max scaling to ``bits`` bits (one
    distributed agg; no window/rank pass over the data — at 100 TB a
    percent_rank would itself be a full sort). Skewed columns get
    proportionally skewed cells, which degrades gracefully: clustering
    quality drops, correctness never does. Numeric, date and timestamp
    columns are supported (dates/timestamps via their numeric epoch).

    Pure column expression (shift/mask arithmetic, whole-stage codegen;
    no UDF anywhere).
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    ).collect()[0]

    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        span = (hi - lo) if (hi is not None and lo is not None and hi > lo) else 1.0
        u = F.floor(
            (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(top))
        ).cast("long")
        # clamp (fp edge at max) and null → cell 0 so nulls cluster together
        u = F.least(F.greatest(F.coalesce(u, F.lit(0)), F.lit(0)), F.lit(top))
        scaled.append(u)

    n = len(cols)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for ci, u in enumerate(scaled):
            bit = F.shiftright(u, j).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, j * n + ci)
    return z


def zorder_compact(
    spark: SparkSession,
    path: str,
    cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 8,
) -> int:
    """``compact`` with Z-order clustering: range-partition by the
    Morton key (size-targeted file count), sort within partitions, and
    swap the rewrite in. Returns the new file count."""
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    z = zorder_key(df, cols, bits).alias("_zkey")
    out = (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
    tmp = f"{path}__zorder_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a BUCKETED table (hash-partitioned files +
    catalog metadata): ``spark.table(table)`` then exposes the bucket
    spec to the planner, so an equi-join or aggregation on the bucket
    columns between co-bucketed tables runs with NO shuffle exchange —
    the join every micro-batch repeats (orders ⋈ order_items on
    order_id) stops paying its dominant cost.

    This is the parquet-native stand-in for what Delta/Iceberg call
    storage-partitioned joins; bucket counts must match on both sides.
    (saveAsTable is required: bucket metadata lives in the catalog,
    plain .parquet(path) cannot carry it.)
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
