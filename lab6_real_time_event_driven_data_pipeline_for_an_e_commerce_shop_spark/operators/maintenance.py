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
