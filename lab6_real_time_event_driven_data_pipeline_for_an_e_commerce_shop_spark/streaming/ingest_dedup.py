"""Exact dedup ON INGEST: a checkpointed file-source stream that admits
only the first-arrival copy of each distinct (normalized) document text
into the curated corpus — the streaming twin of
``operators.dedup.exact_duplicates`` (reference has no equivalent; this
is the training-pipeline ingest gate pattern: dedup as data LANDS, so
downstream stages never see the duplicates at all).

Layout under ``root``:

    landing/        input files (the stream source)
    kept/           first-arrival copy of each distinct text (MERGE by id)
    fingerprints/   seen-set store: one row per distinct text hash
    _checkpoints/   exactly-once file tracking

Exactly-once convergence (same discipline as MedallionPipeline): the
per-batch work is [compute fresh docs] → [MERGE kept] → [MERGE
fingerprints], with the batch's fresh frame materialized to a temp
parquet first (a lazy frame whose lineage reads the fingerprint store
would race the store's own swap — the r6 late-release lesson). A crash
at ANY point replays the batch: fingerprints not yet merged ⇒ the same
rows are fresh again and the kept MERGE is idempotent; fingerprints
merged ⇒ fresh is empty and the batch is a no-op. Kept is merged BEFORE
fingerprints — the reverse order could mark a row seen and then lose it.

State is bounded: the fingerprint store holds one 32-char row per
DISTINCT text ever seen (the minimum any exact dedup must remember),
never the texts. A doc id re-sent with EDITED text hashes fresh and
UPDATES its kept row (last-writer-wins per id); the superseded text
stays in the seen set — re-sending the old bytes still dedups.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import upsert


class DedupIngest:
    """Checkpointed exact-dedup ingest over ``root``/landing."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        text_col: str = "text",
        id_col: str = "doc_id",
        fmt: str = "json",
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.text_col = text_col
        self.id_col = id_col
        self.fmt = fmt
        os.makedirs(self.landing(), exist_ok=True)

    def landing(self) -> str:
        return os.path.join(self.root, "landing")

    def _path(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    # -- per-batch gate ----------------------------------------------------
    def _process(self, batch: DataFrame, batch_id: int) -> None:
        fp = F.md5(
            F.lower(
                F.regexp_replace(F.trim(F.col(self.text_col)), r"\s+", " ")
            )
        )
        # in-batch first arrival: lowest id per fingerprint (makes the
        # kept MERGE source key-unique per fp AND per id)
        w = Window.partitionBy("_fp").orderBy(self.id_col)
        firsts = (
            batch.withColumn("_fp", fp)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        store_path = self._path("fingerprints")
        if os.path.isdir(store_path):
            seen = self.spark.read.parquet(store_path).select("_fp")
            firsts = firsts.join(seen, "_fp", "left_anti")
        # materialize BEFORE the merges: the frame's lineage reads the
        # fingerprint store, which the store MERGE below swaps out
        tmp = self._path("_fresh__tmp")
        firsts.write.mode("overwrite").parquet(tmp)
        has_rows = bool(glob.glob(os.path.join(tmp, "part-*")))
        fresh = self.spark.read.parquet(tmp) if has_rows else None
        if fresh is not None and fresh.limit(1).count() > 0:
            # kept FIRST, fingerprints second (crash between the two
            # replays the batch with the rows still fresh — idempotent;
            # the reverse order would mark rows seen and lose them)
            upsert.merge(
                self.spark,
                self._path("kept"),
                fresh.drop("_fp"),
                keys=[self.id_col],
            )
            upsert.merge(
                self.spark,
                self._path("fingerprints"),
                fresh.select("_fp", F.col(self.id_col).alias("keep_id")),
                keys=["_fp"],
            )
        shutil.rmtree(tmp, ignore_errors=True)

    # -- drive -------------------------------------------------------------
    def run_available(self) -> None:
        """Drain everything currently in landing/ (Trigger.AvailableNow),
        applying the dedup gate batch-by-batch, exactly once per file."""
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", 16)
            .format(self.fmt)
            .option("header", True)  # ignored by json; enables csv
            .load(self.landing())
        )
        q = (
            stream.writeStream.foreachBatch(self._process)
            .option("checkpointLocation", self._path("_checkpoints"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # -- readers -----------------------------------------------------------
    def kept(self) -> DataFrame:
        return self.spark.read.parquet(self._path("kept"))

    def fingerprints(self) -> DataFrame:
        return self.spark.read.parquet(self._path("fingerprints"))
