"""Idempotent keyed upsert (MERGE) into a table — reference S7/ST4.

The reference upserts into Delta Lake with
``DeltaTable.merge(...).whenMatchedUpdateAll().whenNotMatchedInsertAll()``
keyed on (order_id, product_id) (transform.py:331-336), which makes file
re-processing idempotent.

This container has no delta-spark package, so the engine provides:

1. :func:`delta_available` + :func:`merge_delta` — the real Delta MERGE,
   used verbatim when delta-spark is on the classpath (production path).
2. :func:`merge_parquet` — a pure-Spark fallback with the same
   semantics: anti-join out matched target rows, union the source,
   atomically swap the table directory. Partition-aware: when a
   partition column is given, only partitions present in the source are
   rewritten (the rest are untouched — at 100 TB you must never rewrite
   the whole table for a daily increment).

Idempotence contract (FIXTURES.md §3 case 8): running the same source
batch twice leaves the table byte-identical.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


# Partition-pruning lists collected to the driver are capped (r3 VERDICT
# watch item): a normal increment touches a handful of partitions, but a
# historical backfill could touch tens of thousands — enumerate_partitions
# then returns None and callers scope by semi-join (dynamic partition
# pruning) or full refresh instead of an unbounded isin() literal list.
PARTITION_ENUM_CAP = 1024


def enumerate_partitions(
    df: DataFrame, col: str, cap: int | None = None
) -> list | None:
    """Distinct values of ``col`` as a driver-side list, or None when
    more than ``cap`` (default: the module-level PARTITION_ENUM_CAP,
    resolved at call time so tests can shrink it) values are touched.
    The collect itself is bounded (limit cap+1), so the driver never
    materializes an unbounded list."""
    if cap is None:
        cap = PARTITION_ENUM_CAP
    rows = df.select(col).distinct().limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    return [r[0] for r in rows]


def check_source_unique(source: DataFrame, keys: list[str]) -> None:
    """Raise if the MERGE source carries more than one row per key.

    Real Delta MERGE errors on ambiguous multi-source-row matches
    ("multiple source rows matched and attempted to modify the same
    target row") but only for keys that hit the target — duplicate keys
    that are all NEW insert twice and corrupt the table's PK silently.
    The engine is stricter AND deterministic: any duplicate-key source
    is a contract violation, matched or not. This is the r8 q37 lesson
    institutionalized — the old ``dropDuplicates(keys)`` belt-and-braces
    HID upstream PK violations by collapsing them nondeterministically
    (TPC-H lineitem repeats (l_orderkey, l_partkey) across line numbers;
    the gate SFs' slices happened to contain zero such pairs).

    Cost: one map-side-combinable aggregation over the increment (never
    the table), with an early-exit limit(1) — bounded driver read."""
    dup = (
        source.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        vals = {k: dup[0][k] for k in keys}
        raise ValueError(
            f"MERGE source has multiple rows for key {vals}; sources must "
            "be key-unique (dedupe upstream, e.g. first-line-number per "
            "pair) or pass on_duplicate_source='dedupe' explicitly"
        )


def merge_delta(spark: SparkSession, target_path: str, source: DataFrame, keys: list[str]) -> None:
    """Real Delta MERGE (reference transform.py:331-336), used when
    delta-spark is installed."""
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, target_path):
        source.write.format("delta").mode("overwrite").save(target_path)
        return
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def merge_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    on_duplicate_source: str = "error",
) -> None:
    """Pure-Spark keyed MERGE with whenMatchedUpdateAll /
    whenNotMatchedInsertAll semantics over a parquet directory.

    With ``partition_col``: read ONLY the partitions the source touches,
    merge, and overwrite just those partitions (dynamic partition
    overwrite) — incremental cost proportional to the increment, not the
    table.

    ``on_duplicate_source``: "error" (default) raises on a source with
    more than one row per key — see :func:`check_source_unique`;
    "dedupe" keeps the pre-r9 nondeterministic dropDuplicates collapse
    for callers that explicitly want last-writer-undefined semantics;
    "unique_by_construction" skips the check job for sources that are
    key-unique by PLAN SHAPE (see :func:`merge`).
    """
    if on_duplicate_source == "error":
        check_source_unique(source, keys)
    elif on_duplicate_source == "dedupe":
        source = source.dropDuplicates(keys)
    elif on_duplicate_source != "unique_by_construction":
        raise ValueError(f"unknown on_duplicate_source={on_duplicate_source!r}")
    if not os.path.exists(target_path):
        writer = source.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    def _stable_order(target: DataFrame, merged: DataFrame) -> DataFrame:
        """Keep the TABLE's column order across merge generations: the
        anti-join below is a USING join, which moves the key columns
        first — without this, the table's schema order would flap
        between the initial write and every later merge. Source-only
        columns (schema evolution) append after the existing ones."""
        cols = [c for c in target.columns] + [
            c for c in merged.columns if c not in target.columns
        ]
        return merged.select(cols)

    if partition_col:
        parts = enumerate_partitions(source, partition_col)
        target = spark.read.parquet(target_path)
        if parts is not None:
            # static partition pruning via the literal list (metadata-only)
            target = target.filter(F.col(partition_col).isin(parts))
        else:
            # backfill scale (> cap partitions touched): scope the target
            # read with a broadcast semi-join on the partition column —
            # dynamic partition pruning, no driver-side list at all
            target = target.join(
                F.broadcast(source.select(partition_col).distinct()),
                partition_col,
                "left_semi",
            )
        kept = target.join(source.select(keys), keys, "left_anti")
        # allowMissingColumns: schema evolution — a source with NEW
        # columns widens the table (old rows read the column as null),
        # and a source missing columns fills nulls (Delta's
        # mergeSchema semantics, reproduced on parquet)
        merged = _stable_order(
            target, kept.unionByName(source, allowMissingColumns=True)
        ).repartition(partition_col)
        with _overwrite_conf(spark, "dynamic"):
            merged.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    kept = target.join(source.select(keys), keys, "left_anti")
    merged = _stable_order(target, kept.unionByName(source, allowMissingColumns=True))
    # full rewrite via temp dir + 3-step swap: the window where neither
    # directory exists is eliminated (old data survives as __old until
    # the new directory is in place)
    tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)


def replace_where(
    spark: SparkSession, target_path: str, source: DataFrame, condition: str
) -> None:
    """Delta-style ``replaceWhere`` (INSERT OVERWRITE ... WHERE):
    atomically replace EXACTLY the target rows matching the SQL
    ``condition`` with the source rows — a delete-then-insert of the
    predicate's row range, not a keyed upsert. Unlike :func:`merge`,
    stale rows inside the range that the source no longer produces are
    DELETED (the semantics a replayed-with-different-contents batch
    needs; r6 ADVICE fix for the streaming CMS store).

    Delta path uses the engine's own replaceWhere option; the parquet
    fallback anti-filters the range and swaps atomically (3-step
    rename, same crash contract as merge_parquet)."""
    if delta_available():
        (
            source.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", condition)
            .save(target_path)
        )
        return
    if not os.path.exists(target_path):
        source.write.mode("overwrite").parquet(target_path)
        return
    target = spark.read.parquet(target_path)
    kept = target.filter(f"NOT ({condition})")
    cols = list(target.columns) + [
        c for c in source.columns if c not in target.columns
    ]
    merged = kept.unionByName(source, allowMissingColumns=True).select(cols)
    tmp = f"{target_path}__tmp_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    os.rename(tmp, target_path)
    shutil.rmtree(old)


class _overwrite_conf:
    def __init__(self, spark: SparkSession, mode: str):
        self.spark, self.mode = spark, mode

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.mode)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.old)


def merge(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    on_duplicate_source: str = "error",
) -> None:
    """Dispatch: Delta when available, parquet fallback otherwise. The
    source-uniqueness contract is enforced on BOTH branches: Delta's own
    multi-match error fires only for duplicate keys that hit existing
    target rows — all-new duplicates would double-insert silently.
    ``on_duplicate_source='dedupe'`` (explicit opt-in) collapses
    duplicate-key sources via dropDuplicates on either branch — callers
    keep the Delta path instead of having to call merge_parquet directly
    (r9 ADVICE).

    ``on_duplicate_source='unique_by_construction'`` (r18, explicit
    opt-in) SKIPS the uniqueness-check job: only for sources that are
    key-unique by PLAN SHAPE — an aggregation whose groupBy keys are
    exactly the merge keys (gold KPI refreshes, audit counts). The
    caller is asserting a structural fact, not hoping; anything
    weaker keeps the default check (the r8 q37 lesson: 'happens to be
    unique at this SF' is not by-construction)."""
    if delta_available():
        if on_duplicate_source == "error":
            check_source_unique(source, keys)
        elif on_duplicate_source == "dedupe":
            source = source.dropDuplicates(keys)
        elif on_duplicate_source != "unique_by_construction":
            raise ValueError(
                f"unknown on_duplicate_source={on_duplicate_source!r}"
            )
        merge_delta(spark, target_path, source, keys)
    else:
        merge_parquet(
            spark, target_path, source, keys, partition_col, on_duplicate_source
        )
