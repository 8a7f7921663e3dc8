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
stays in the seen set — re-sending the old bytes still dedups — until
:meth:`DedupIngest.compact` rebuilds the store from the live corpus
(r13: the between-waves GC that keeps a years-long landing service's
state proportional to kept docs, not ingest history).
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
        # a doc id landing TWICE in one micro-batch with different text
        # would put two rows with the same id into the kept MERGE source
        # — check_source_unique would raise and the checkpointed stream
        # would replay the poison batch forever. Dedup per id FIRST with
        # a deterministic winner (highest text hash, the QualityIngest
        # rule), THEN pick the first arrival per fingerprint.
        batch = _one_row_per_id(batch, self.id_col, self.text_col)
        fp = _exact_fp(F.col(self.text_col))
        # in-batch first arrival: lowest id per fingerprint (with the
        # per-id dedup above, the kept MERGE source is key-unique per
        # fp AND per id)
        w = Window.partitionBy("_fp").orderBy(self.id_col)
        firsts = (
            batch.withColumn("_fp", fp)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        store_path = self._path("fingerprints")
        _finish_store_compaction(store_path)
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
        _finish_store_compaction(self._path("fingerprints"))
        return self.spark.read.parquet(self._path("fingerprints"))

    # -- maintenance ---------------------------------------------------------
    def compact(self) -> None:
        """Rebuild the fingerprint store from the CURRENT kept texts —
        store size tracks the live corpus, not ingest history (VERDICT
        r12 #3: the additive store keeps one row per distinct text EVER
        seen, so superseded doc versions' fingerprints linger forever
        in a long-lived landing service).

        Contract change, by design: after compaction, re-sending a
        SUPERSEDED version's bytes is no longer deduped against history
        (its fingerprint was dropped) — "remember what the corpus now
        contains" replaces "remember everything ever seen". Current
        kept texts still dedup exactly.

        Safe to run BETWEEN waves only (never concurrent with
        run_available). Crash-recoverable at every step via the fixed
        sibling-dir swap; a compaction run right after a crash BETWEEN
        the kept and fingerprint merges absorbs the missing fingerprint
        rows (kept is merged first), and the replayed batch then
        no-ops. Kept texts carry pairwise-distinct fingerprints by the
        admission invariant (a text is only merged when its fingerprint
        was absent from the store), so the rebuilt store is key-unique.
        """
        store_path = self._path("fingerprints")
        _finish_store_compaction(store_path)
        if not os.path.isdir(store_path):
            return
        compacted = self.kept().select(
            _exact_fp(F.col(self.text_col)).alias("_fp"),
            F.col(self.id_col).alias("keep_id"),
        )
        _swap_store(compacted, store_path)


def _exact_fp(text: F.Column) -> F.Column:
    """The exact-dedup fingerprint: md5 of the whitespace-normalized,
    lowercased text — shared by the per-batch gate and compaction (the
    rebuilt store must hash EXACTLY like the additive one)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def _finish_store_compaction(store_path: str) -> None:
    """Recover a store from a crash inside :func:`_swap_store`. The
    swap uses FIXED sibling names so recovery is decidable from the
    directory state alone:

      store missing + __compact_new present  → the old store was moved
        aside but the new one not yet moved in: finish the swap.
      store missing + only __compact_old     → cannot happen (the new
        dir is written before the old is moved) — restore the old
        store defensively anyway.
      store present                          → any leftover __compact_*
        dirs are orphans from a crash before/after the swap: drop them.
    """
    new, old = store_path + "__compact_new", store_path + "__compact_old"
    if not os.path.isdir(store_path):
        if os.path.isdir(new):
            os.rename(new, store_path)
        elif os.path.isdir(old):
            os.rename(old, store_path)
    for p in (new, old):
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)


def _swap_store(compacted: DataFrame, store_path: str) -> None:
    """Replace ``store_path`` with ``compacted``, crash-recoverable at
    every step (finish with :func:`_finish_store_compaction`):
    write the new generation to a sibling dir first, then two renames.
    The only window where ``store_path`` itself is absent is between
    the renames, and recovery completes the swap from the fixed
    sibling names."""
    new, old = store_path + "__compact_new", store_path + "__compact_old"
    compacted.write.mode("overwrite").parquet(new)
    os.rename(store_path, old)
    os.rename(new, store_path)
    shutil.rmtree(old, ignore_errors=True)


def _one_row_per_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One deterministic row per id: highest md5(text) wins (the same
    rule QualityIngest uses), ties broken by the md5 of the full
    non-id payload serialized to JSON (the merge_versioned dedupe
    rule) — two rows with identical id AND text but differing in any
    other column would otherwise get a partitioning-dependent winner.
    Guards every ingest gate against a doc id arriving twice in ONE
    micro-batch with different text — without it the kept MERGE source
    has duplicate ids, check_source_unique raises, and the checkpointed
    stream replays the poison batch forever."""
    payload = [c for c in df.columns if c != id_col]
    w = Window.partitionBy(id_col).orderBy(
        F.md5(F.col(text_col)).desc(),
        F.md5(F.to_json(F.struct(*[F.col(c) for c in payload]))).desc(),
    )
    return (
        df.withColumn("_idrn", F.row_number().over(w))
        .filter(F.col("_idrn") == 1)
        .drop("_idrn")
    )


def _banded(sig: DataFrame, k: int, bands: int, id_col: str) -> DataFrame:
    """(id, mh_0..mh_{k-1}) → (id, band, sig): the LSH band relation,
    derived from a signature frame (same banding as
    dedup.minhash_lsh_candidates — bands of k/bands contiguous rows,
    band signature = '_'-joined component values)."""
    rows = k // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"mh_{bi * rows + r}") for r in range(rows)]
            ).alias("sig"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("_b")
    ).select(id_col, F.col("_b.band").alias("band"), F.col("_b.sig").alias("sig"))


class NearDupIngest:
    """NEAR-dup dedup on ingest — the MinHash-LSH twin of
    :class:`DedupIngest` (exact hashes can't catch lightly-edited
    re-crawls; this gate drops them as they land).

    Admission contract (deterministic, pinned by a naive-reference
    test): a new doc is REJECTED iff it shares ≥1 LSH band with an
    already-KEPT doc AND their MinHash signatures agree on ≥
    ``min_agree`` of ``k`` components (the integer form of the Jaccard
    threshold — never a float compare); among the survivors of that
    cross-corpus filter, each micro-batch is canonicalized in-batch
    (verified pairs → connected components → min-id keep). First
    arrival wins across batches; min doc id wins within a batch.
    Rejections are LSH-mediated: a true near-dup pair that collides in
    no band is admitted — the standard LSH false-negative envelope,
    identical to the batch pipeline's (tune bands/k against τ exactly
    as there). A doc too short to produce a single shingle has no
    signature — it is uncomparable, always admitted, and contributes
    no state.

    State: one k-component signature row per KEPT doc (ints, never
    text) — the minimum a near-dup gate must remember; band rows are
    derived on read. Crash convergence: kept is MERGEd BEFORE the
    signature store (same argument as DedupIngest — the reverse order
    could register a doc's signature and then lose the doc, after
    which the replayed doc would be rejected AGAINST ITSELF)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        k: int = 16,
        bands: int = 4,
        min_agree: int = 8,
        shingle_k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
        fmt: str = "json",
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.k, self.bands, self.min_agree = k, bands, min_agree
        self.shingle_k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self.fmt = fmt
        os.makedirs(self.landing(), exist_ok=True)

    landing = DedupIngest.landing
    _path = DedupIngest._path
    run_available = DedupIngest.run_available
    kept = DedupIngest.kept

    def signatures(self) -> DataFrame:
        _finish_store_compaction(self._path("signatures"))
        return self.spark.read.parquet(self._path("signatures"))

    def compact(self) -> None:
        """Rebuild the signature store from the CURRENT kept texts
        (VERDICT r13 #3 — the same "supersede = live-corpus rebuild"
        contract the exact/span gates got in r12/r13): recompute
        MinHash signatures over kept() with the gate's own parameters,
        so store size tracks live kept docs, not ingest history. Docs
        too short to shingle produce no signature — exactly the
        admission invariant (uncomparable docs carry no state). Rows
        for docs externally removed from kept (downstream GC /
        takedown) are dropped, so the gate stops rejecting new docs
        against a corpus that no longer contains them.

        Safe BETWEEN waves only (never concurrent with run_available).
        Crash-recoverable via the fixed sibling-dir swap, healed at
        every store read. A compaction right after a crash between the
        kept and signature merges ABSORBS the missing signature rows
        (kept merges first); the replayed batch then re-rejects those
        docs against their own stored signatures — harmless, they are
        already kept (the EmbeddingDedupIngest replay argument)."""
        store_path = self._path("signatures")
        _finish_store_compaction(store_path)
        if not os.path.isdir(store_path):
            return
        from ..functions import cache as _cache
        from ..operators import dedup

        # minhash_signatures bounded_cache's its substrate by SEMANTIC
        # plan hash — and two compact() calls read kept through the
        # SAME plan (same path), so a second compaction after the kept
        # FILES changed underneath (merge swap, external GC) would be
        # served the stale cached substrate. Release the slot around
        # the rebuild (found by the r14 external-GC test).
        _cache.release("dedup.minhash_signatures")
        compacted = dedup.minhash_signatures(
            self.kept(), self.k, self.shingle_k, self.text_col, self.id_col
        ).select(self.id_col, *[f"mh_{i}" for i in range(self.k)])
        _swap_store(compacted, store_path)
        _cache.release("dedup.minhash_signatures")

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators import dedup

        # duplicate ids in one micro-batch → duplicate kept MERGE source
        # rows → poison replay loop (see _one_row_per_id)
        batch = _one_row_per_id(batch, self.id_col, self.text_col)
        mh_cols = [f"mh_{i}" for i in range(self.k)]
        sigs_all = dedup.minhash_signatures(
            batch, self.k, self.shingle_k, self.text_col, self.id_col
        )
        sigs_new = sigs_all
        # cross-corpus rejection: band equi-join against the kept
        # store, verified by integer signature agreement
        store_path = self._path("signatures")
        _finish_store_compaction(store_path)
        if os.path.isdir(store_path):
            store_sigs = self.spark.read.parquet(store_path)
            cands = (
                _banded(sigs_new, self.k, self.bands, self.id_col)
                .withColumnRenamed(self.id_col, "id_a")
                .join(
                    _banded(store_sigs, self.k, self.bands, self.id_col)
                    .withColumnRenamed(self.id_col, "id_b"),
                    ["band", "sig"],
                )
                .select("id_a", "id_b")
                .distinct()
            )
            rejected = self._agreement(cands, sigs_new, store_sigs)
            sigs_new = sigs_new.join(
                rejected.select(F.col("id_a").alias(self.id_col)).distinct(),
                self.id_col,
                "left_anti",
            )
        # in-batch canonicalization among the survivors: verified band
        # pairs → connected components → min-id keep
        pairs = (
            _banded(sigs_new, self.k, self.bands, self.id_col)
            .withColumnRenamed(self.id_col, "id_a")
            .join(
                _banded(sigs_new, self.k, self.bands, self.id_col)
                .withColumnRenamed(self.id_col, "id_b"),
                ["band", "sig"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        verified = self._agreement(pairs, sigs_new, sigs_new)
        clusters = dedup.duplicate_clusters(verified)
        losers = clusters.filter(
            F.col("cluster_id") != F.col("node_id")
        ).select(F.col("node_id").alias(self.id_col))
        admitted_sigs = sigs_new.join(losers, self.id_col, "left_anti")
        # admitted = [docs with no signature at all: too short to
        # shingle, uncomparable, always admitted, no state] ∪ [docs
        # whose signature survived both the cross-corpus rejection and
        # the in-batch canonicalization]. The no-signature test uses
        # sigs_ALL (pre-rejection) — testing against the filtered
        # frame would re-admit every cross-corpus rejection.
        admitted = batch.join(
            sigs_all.select(self.id_col), self.id_col, "left_anti"
        ).unionByName(
            batch.join(
                admitted_sigs.select(self.id_col), self.id_col, "left_semi"
            )
        )

        # materialize before the merges (lineage reads the sig store)
        tmp_rows = self._path("_admitted__tmp")
        tmp_sigs = self._path("_admitted_sigs__tmp")
        admitted.write.mode("overwrite").parquet(tmp_rows)
        admitted_sigs.select(self.id_col, *mh_cols).write.mode(
            "overwrite"
        ).parquet(tmp_sigs)
        if glob.glob(os.path.join(tmp_rows, "part-*")):
            fresh = self.spark.read.parquet(tmp_rows)
            if fresh.limit(1).count() > 0:
                # kept FIRST, signatures second (see class docstring)
                upsert.merge(
                    self.spark, self._path("kept"), fresh, keys=[self.id_col]
                )
                upsert.merge(
                    self.spark,
                    self._path("signatures"),
                    self.spark.read.parquet(tmp_sigs),
                    keys=[self.id_col],
                )
        shutil.rmtree(tmp_rows, ignore_errors=True)
        shutil.rmtree(tmp_sigs, ignore_errors=True)

    def _agreement(
        self, pairs: DataFrame, sigs_a: DataFrame, sigs_b: DataFrame
    ) -> DataFrame:
        """Pairs whose signatures agree on ≥ min_agree components —
        dedup.signature_agreement generalized to two signature tables
        (id_a from sigs_a, id_b from sigs_b), integer threshold only."""
        sa = sigs_a.select(
            F.col(self.id_col).alias("id_a"),
            *[F.col(f"mh_{i}").alias(f"_a{i}") for i in range(self.k)],
        )
        sb = sigs_b.select(
            F.col(self.id_col).alias("id_b"),
            *[F.col(f"mh_{i}").alias(f"_b{i}") for i in range(self.k)],
        )
        agree = F.lit(0)
        for i in range(self.k):
            agree = agree + F.when(
                F.col(f"_a{i}") == F.col(f"_b{i}"), 1
            ).otherwise(0)
        return (
            pairs.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(agree >= F.lit(int(self.min_agree)))
            .select("id_a", "id_b")
        )


class QualityIngest:
    """Quality gate ON INGEST — the third member of the ingest-gate
    family (exact-dedup, near-dup, quality): every landed document is
    scored by the Gopher-style composed gate
    (:func:`operators.text.quality_filter`) as it arrives, and the
    verdict ships WITH evidence (qc_pass + qc_fail_reasons CSV) into
    one MERGE-by-id ``verdicts`` table; ``kept()``/``quarantined()``
    are filters over it.

    Simpler convergence story than the dedup gates BY DESIGN: the
    verdict is a PURE per-row function of the batch (no cross-batch
    state, no store to race), so exactly-once needs only the one
    idempotent MERGE — any crash window replays the batch into the
    same rows. A doc RESENT with edited text gets a fresh verdict that
    OVERWRITES its row (last-verdict-wins), so a fixed doc moves from
    quarantine to kept atomically — the single-table shape is what
    makes that move race-free (two tables would need a cross-table
    delete).

    Layout under ``root``: landing/ (stream source), verdicts/
    (MERGE-by-id), _checkpoints/ (exactly-once file tracking)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        text_col: str = "text",
        id_col: str = "doc_id",
        fmt: str = "json",
        **rules,
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.text_col = text_col
        self.id_col = id_col
        self.fmt = fmt
        self.rules = rules
        os.makedirs(self.landing(), exist_ok=True)

    def landing(self) -> str:
        return os.path.join(self.root, "landing")

    def _path(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators import text as text_ops

        if batch.isEmpty():
            return
        # a file resent inside one batch: deterministic winner per id so
        # the MERGE source is key-unique (shared rule with the dedup gates)
        uniq = _one_row_per_id(batch, self.id_col, self.text_col)
        verdict = text_ops.quality_filter(
            uniq, text_col=self.text_col, id_col=self.id_col, **self.rules
        ).select(self.id_col, "qc_pass", "qc_fail_reasons")
        scored = uniq.select(self.id_col, self.text_col).join(
            verdict, self.id_col
        )
        # heal a crashed compact BEFORE merging — a merge while the real
        # table sits in __compact_new would fork a second store
        _finish_store_compaction(self._path("verdicts"))
        upsert.merge(
            self.spark, self._path("verdicts"), scored, keys=[self.id_col]
        )

    def compact(self, live_ids: DataFrame) -> None:
        """Scope the verdicts table to a LIVE id set (VERDICT r13 #3 —
        the verdicts table is the one store in the family that grows
        with ingest HISTORY by design: it is the quarantine ledger, one
        row per id ever scored, and in a chained pipeline that includes
        ids upstream gates later superseded). ``live_ids`` is a frame
        carrying ``id_col`` — typically the upstream gate's kept()
        (chain shape) or this gate's own kept() if quarantine evidence
        can be dropped; rows for ids NOT in it are garbage-collected.

        Contract (differs from the dedup gates BECAUSE the verdict is
        a pure per-row function): dropping a row loses only a cached
        verdict — a dropped id re-sent later is simply re-scored, and
        the re-scored verdict is identical for identical text. kept()/
        quarantined() shrink to the live set, which is the point.

        Safe BETWEEN waves only; crash-recoverable via the fixed
        sibling-dir swap, healed at every read and before every
        merge."""
        store_path = self._path("verdicts")
        _finish_store_compaction(store_path)
        if not os.path.isdir(store_path):
            return
        compacted = self.spark.read.parquet(store_path).join(
            live_ids.select(self.id_col).distinct(), self.id_col, "left_semi"
        )
        _swap_store(compacted, store_path)

    def run_available(self) -> None:
        stream = (
            self.spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", 16)
            .format(self.fmt)
            .option("header", True)
            .load(self.landing())
        )
        q = (
            stream.writeStream.foreachBatch(self._process)
            .option("checkpointLocation", self._path("_checkpoints"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def verdicts(self) -> DataFrame:
        # before any batch has landed (e.g. an empty landing dir drained
        # by run_available) there is no verdicts table — return an empty
        # frame with the verdict schema instead of a raw AnalysisException
        _finish_store_compaction(self._path("verdicts"))
        if not os.path.isdir(self._path("verdicts")):
            from pyspark.sql import types as T

            landing = (
                self.schema
                if isinstance(self.schema, T.StructType)
                else T.StructType.fromDDL(self.schema)
            )
            empty = T.StructType(
                [
                    landing[self.id_col],
                    landing[self.text_col],
                    T.StructField("qc_pass", T.BooleanType()),
                    T.StructField("qc_fail_reasons", T.StringType()),
                ]
            )
            return self.spark.createDataFrame([], empty)
        return self.spark.read.parquet(self._path("verdicts"))

    def kept(self) -> DataFrame:
        return self.verdicts().filter(F.col("qc_pass"))

    def quarantined(self) -> DataFrame:
        return self.verdicts().filter(~F.col("qc_pass"))


class SpanDedupIngest:
    """ExactSubstr-class SPAN dedup ON INGEST — the fourth gate of the
    family (exact / near-dup / quality / spans): duplicated passages
    are CUT OUT of documents as they land (dedup.duplicate_spans /
    remove_spans semantics), so the curated corpus never contains a
    min_len-token run twice — the boilerplate/license-header class of
    duplication document-level gates cannot touch.

    Admission contract (deterministic, naive-reference-pinned): for
    each micro-batch, a window is COVERED iff it occurs ≥2 times
    within the batch (total over (doc, pos) — within-doc repetition
    counts, the duplicate_spans batch semantics; a batch on an empty
    store therefore equals remove_duplicate_spans of that batch
    exactly) OR its hash is in the store from a DIFFERENT document.
    Covered islands are removed; EVERY document is kept (possibly with
    empty text), at remove_spans grain (id, text, n_tokens,
    n_tokens_dropped). Kept text carries remove_spans' WHITESPACE
    contract (documented there): it is the single-space join of
    surviving tokens, so tabs/newlines/space-runs are normalized even
    in documents with zero removed spans — cleaned text is a canonical
    function of the token survivors, which is what makes replay and
    the store's "windows of what the corpus contains" invariant exact.
    Re-sent ids update their kept row (last-writer-wins per id) and
    are deduped against the REST of the corpus only.

    State: winhashes/ = (_h, src_id) — one row per (cleaned-text
    window, contributing doc). Storing CLEANED-text windows keeps the
    store equal to "what the corpus now contains"; carrying src_id and
    excluding src_id == current doc from coverage makes replay exact:
    after a crash ANYWHERE the batch reruns against either the
    pre-batch store (identical inputs ⇒ identical cleaned rows, both
    merges idempotent) or the post-batch store (own hashes
    self-excluded, other batch docs' shared passages were removed from
    their cleaned texts too ⇒ identical again). The store is ADDITIVE
    between compactions (a superseded version's windows linger — the
    DedupIngest fingerprints contract); :meth:`compact` (r13) rebuilds
    it from the live kept texts between waves.

    Scale: window hashing is corpus-linear (the duplicate_spans
    substrate); the store probe is an equi-join on the 48-bit hash
    with the src exclusion as a residual; islands are per-doc windows.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        min_len: int = 5,
        text_col: str = "text",
        id_col: str = "doc_id",
        fmt: str = "json",
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.min_len = int(min_len)
        self.text_col = text_col
        self.id_col = id_col
        self.fmt = fmt
        os.makedirs(self.landing(), exist_ok=True)

    landing = DedupIngest.landing
    _path = DedupIngest._path
    run_available = DedupIngest.run_available
    kept = DedupIngest.kept

    def winhashes(self) -> DataFrame:
        _finish_store_compaction(self._path("winhashes"))
        return self.spark.read.parquet(self._path("winhashes"))

    def compact(self) -> None:
        """Rebuild the winhashes store from the CURRENT kept CLEANED
        texts (VERDICT r12 #3) — drops superseded doc versions' window
        rows, so store size tracks the live corpus. Because the store's
        contract is already "windows of what the corpus now contains"
        (cleaned-text windows, src_id-excluded on probe), compaction
        here is a pure garbage collection: coverage decisions against
        the rebuilt store are identical to the additive store for every
        text currently kept. Safe BETWEEN waves only; crash-recoverable
        via the fixed sibling-dir swap; a compaction right after a
        crash between the kept and store merges absorbs the missing
        window rows (kept merges first), and the replayed batch then
        recomputes identical cleaned rows (src_id self-exclusion)."""
        store_path = self._path("winhashes")
        _finish_store_compaction(store_path)
        if not os.path.isdir(store_path):
            return
        from ..operators import dedup

        compacted = dedup._window_hashes(
            self.kept(), self.min_len, self.text_col, self.id_col
        ).select("_h", F.col("_id").alias("src_id")).distinct()
        _swap_store(compacted, store_path)

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators import dedup

        batch = _one_row_per_id(batch, self.id_col, self.text_col)
        k = self.min_len
        w = dedup._window_hashes(batch, k, self.text_col, self.id_col)
        dup_in_batch = (
            w.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= 2)
            .select("_h")
        )
        covered = w.join(dup_in_batch, "_h", "left_semi")
        store_path = self._path("winhashes")
        _finish_store_compaction(store_path)
        if os.path.isdir(store_path):
            store = self.spark.read.parquet(store_path)
            hit = w.join(
                store,
                (w["_h"] == store["_h"])
                & (store["src_id"] != w["_id"]),
                "left_semi",
            )
            covered = covered.unionByName(hit).distinct()
        spans = dedup._spans_from_covered(covered, k, self.id_col)
        cleaned = dedup.remove_spans(
            batch.select(self.id_col, self.text_col),
            spans,
            self.text_col,
            self.id_col,
        )

        # materialize BEFORE the merges (cleaned lineage reads the
        # winhashes store, which the store MERGE swaps out). new_hashes
        # is derived from the MATERIALIZED rows, not the lazy `cleaned`
        # frame — deriving from the lazy frame re-executed the whole
        # window-hash + store-probe + span + removal pipeline a second
        # time per micro-batch (ADVICE r12: correct but ~2x batch work).
        tmp_rows = self._path("_cleaned__tmp")
        tmp_hashes = self._path("_winhashes__tmp")
        cleaned.write.mode("overwrite").parquet(tmp_rows)
        if glob.glob(os.path.join(tmp_rows, "part-*")):
            new_hashes = dedup._window_hashes(
                self.spark.read.parquet(tmp_rows), k, self.text_col,
                self.id_col,
            ).select(
                "_h", F.col("_id").alias("src_id")
            ).distinct()
            new_hashes.write.mode("overwrite").parquet(tmp_hashes)
            fresh = self.spark.read.parquet(tmp_rows)
            if fresh.limit(1).count() > 0:
                # kept FIRST, hash store second (a crash between the
                # two replays the batch against the pre-batch store —
                # identical cleaned rows, both merges idempotent)
                upsert.merge(
                    self.spark,
                    self._path("kept"),
                    fresh,
                    keys=[self.id_col],
                )
                if glob.glob(os.path.join(tmp_hashes, "part-*")):
                    hashes_fresh = self.spark.read.parquet(tmp_hashes)
                    if hashes_fresh.limit(1).count() > 0:
                        upsert.merge(
                            self.spark,
                            self._path("winhashes"),
                            hashes_fresh,
                            keys=["_h", "src_id"],
                        )
        shutil.rmtree(tmp_rows, ignore_errors=True)
        shutil.rmtree(tmp_hashes, ignore_errors=True)


class ChainedIngest:
    """The composed landing pipeline: exact-dedup → near-dup → quality
    over ONE checkpointed stream — the production shape of the ingest-
    gate family (each gate alone is pinned separately; this class is
    the reference's whole thesis, choreographed multi-stage ingest
    (glue_job.py:146-278's validate→transform→load chain), re-expressed
    as one foreachBatch over three stateful gates).

    Replay-stable stage handoff — the load-bearing design point: each
    downstream stage's input is (this batch's ids) ∩ (the upstream
    gate's kept TABLE), taking the kept table's authoritative rows —
    NEVER the upstream stage's per-batch "fresh" delta. A crash between
    gates replays the batch; the upstream gate no-ops (its state
    already has the rows) and its per-batch delta would be EMPTY — rows
    would silently vanish from the chain. The kept-table join recomputes
    the identical stage input on every replay because the kept MERGEs
    are idempotent.

    Self-handoff semantics under re-sends (documented, test-pinned): a
    doc re-sent with edited text advances through the exact gate
    (last-writer-wins per id) but the near gate compares the edit
    against its OWN stored signature — a light edit is a near-dup of
    the doc's prior version, so the near gate keeps the ORIGINAL
    admitted text and the chain's output is stable under light edits;
    a heavy edit clears the threshold and updates normally.

    MIXED-MODALITY landing (r14, VERDICT r13 #6): ``vec_col`` inserts
    :class:`EmbeddingDedupIngest` as a stage — rows carry BOTH text and
    a precomputed embedding, and the vector gate rejects SEMANTIC
    near-dups whose text the lexical gates cannot catch (a paraphrase
    shares no shingles). Ordering rule, enforced at construction: the
    embedding stage must run BEFORE the span rewriter. Twice over:
    (a) semantically — the landing embedding describes the RAW bytes;
    a verdict or verify pass over text some later stage rewrites is
    the exact judges-after-rewriters leak the chain-order study pinned,
    and no stage can re-embed cleaned text (embedding is an input
    artifact here, not a computable column); (b) mechanically — the
    span stage's kept grain is (id, cleaned text, token counts): the
    vector column does not survive it, so an embedding stage placed
    after spans would read a column that no longer exists. Hence the
    default order exact → embedding → spans → near → quality, and any
    explicit ``order`` placing "embedding" after "spans" raises.
    The stored vectors keep describing the raw admitted bytes — which
    is the right substrate for "did we already ingest something
    semantically equivalent", independent of later text cleanup.

    Layout under ``root``: landing/ + _checkpoints/ (the chain's one
    stream), exact/ embedding/ spans/ near/ quality/ (each enabled
    gate's own state, readable individually for audit)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        text_col: str = "text",
        id_col: str = "doc_id",
        fmt: str = "json",
        k: int = 16,
        bands: int = 4,
        min_agree: int = 8,
        shingle_k: int = 3,
        span_min_len: int | None = None,
        vec_col: str | None = None,
        embed_threshold: float = 0.9,
        embed_planes: int = 6,
        embed_dim: int = 64,
        embed_probe_hamming: int = 1,
        order: tuple[str, ...] | None = None,
        **quality_rules,
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.text_col = text_col
        self.id_col = id_col
        self.fmt = fmt
        self.exact = DedupIngest(
            spark, os.path.join(root, "exact"), schema,
            text_col=text_col, id_col=id_col, fmt=fmt,
        )
        # optional TRANSFORM stage between exact and near (r12):
        # span_min_len inserts SpanDedupIngest — duplicated passages are
        # cut out BEFORE near-dup comparison, the production landing
        # order (exact → spans → near → quality). Downstream stages see
        # the span gate's kept (CLEANED) rows via the same kept-table
        # handoff; a fully-duplicated doc arrives at quality with empty
        # text and is quarantined there (min_tokens), not silently
        # dropped. Note the documented interplay: span removal can
        # PREEMPT near-dup detection (two docs whose whole overlap was
        # an exact passage are no longer near once it is cut) — that is
        # the intended semantics of running spans first.
        self.span = (
            SpanDedupIngest(
                spark, os.path.join(root, "spans"), schema,
                min_len=span_min_len, text_col=text_col, id_col=id_col,
                fmt=fmt,
            )
            if span_min_len is not None
            else None
        )
        # optional VECTOR stage (r14): semantic near-dup rejection on
        # the landing embedding — must precede the span rewriter (class
        # docstring), validated below
        self.embedding = (
            EmbeddingDedupIngest(
                spark, os.path.join(root, "embedding"), schema,
                threshold=embed_threshold, n_planes=embed_planes,
                dim=embed_dim, probe_hamming=embed_probe_hamming,
                vec_col=vec_col, id_col=id_col, fmt=fmt,
            )
            if vec_col is not None
            else None
        )
        self.near = NearDupIngest(
            spark, os.path.join(root, "near"), schema,
            k=k, bands=bands, min_agree=min_agree, shingle_k=shingle_k,
            text_col=text_col, id_col=id_col, fmt=fmt,
        )
        self.quality = QualityIngest(
            spark, os.path.join(root, "quality"), schema,
            text_col=text_col, id_col=id_col, fmt=fmt, **quality_rules,
        )
        # r13 (VERDICT r12 #5, chain-order study): the stage ORDER is a
        # parameter. Default = the production order (exact → spans →
        # near → quality: each stage cheapens the next's input, and
        # quality LAST judges the text the corpus will actually
        # contain). Any permutation of the enabled stages is accepted
        # so orderings can be measured; the measured + e2e-pinned
        # hazard of non-default orders: a stage that judges text
        # (quality) placed BEFORE a stage that REWRITES text (spans)
        # issues verdicts on text the corpus will never contain — a
        # fully-duplicated doc passes quality on its raw bytes, is
        # emptied at the span stage afterwards, and the emptied doc
        # ends up kept (the default order quarantines it at min_tokens).
        enabled = [
            "exact",
            *(("embedding",) if self.embedding is not None else ()),
            *(("spans",) if self.span is not None else ()),
            "near", "quality",
        ]
        self.order = tuple(order) if order is not None else tuple(enabled)
        if sorted(self.order) != sorted(enabled):
            raise ValueError(
                f"order must be a permutation of {enabled}, got {self.order}"
            )
        # the embedding stage must precede EVERY stage whose kept-table
        # handoff drops the vector column: spans (kept grain = id,
        # cleaned text, token counts) AND quality (kept projects to
        # id + text). An order placing embedding after either would
        # hand it a vec_col-less frame — AnalysisException inside
        # foreachBatch, i.e. a poison batch the checkpointed stream
        # replays forever. Semantically it is also the judges-after-
        # rewriters hazard: the landing vector describes the RAW bytes.
        if "embedding" in self.order:
            for dropper in ("spans", "quality"):
                if (
                    dropper in self.order
                    and self.order.index("embedding")
                    > self.order.index(dropper)
                ):
                    raise ValueError(
                        "the embedding stage must precede"
                        f" '{dropper}': the landing vector describes the"
                        " RAW bytes, and that stage's kept handoff drops"
                        " the vector column"
                    )
        os.makedirs(self.landing(), exist_ok=True)

    landing = DedupIngest.landing
    _path = DedupIngest._path
    run_available = DedupIngest.run_available

    def _gate(self, name: str):
        return {
            "exact": self.exact, "embedding": self.embedding,
            "spans": self.span,
            "near": self.near, "quality": self.quality,
        }[name]

    def _stage_kept(self, name: str) -> DataFrame | None:
        """The stage's authoritative admitted rows (None before its
        first batch). For the quality gate 'admitted' = qc_pass
        verdicts, projected back to (id, text) so downstream gates see
        landing-schema rows."""
        g = self._gate(name)
        if name == "quality":
            if not os.path.isdir(g._path("verdicts")):
                return None
            return g.kept().select(self.id_col, self.text_col)
        if not os.path.isdir(g._path("kept")):
            return None
        return self.spark.read.parquet(g._path("kept"))

    def _stage_input(self, batch: DataFrame, kept_path: str) -> DataFrame | None:
        """(this batch's ids) ∩ (upstream kept table), upstream rows
        authoritative. None when the upstream gate has admitted nothing
        yet (its kept table does not exist)."""
        if not os.path.isdir(kept_path):
            return None
        kept = self.spark.read.parquet(kept_path)
        return kept.join(
            batch.select(self.id_col).distinct(), self.id_col, "left_semi"
        )

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        cur = batch
        for name in self.order:
            self._gate(name)._process(cur, batch_id)
            kept = self._stage_kept(name)
            if kept is None:
                return
            cur = kept.join(
                batch.select(self.id_col).distinct(),
                self.id_col,
                "left_semi",
            )

    # -- readers: the chain's curated output is the quality verdicts
    # over the stages that ran before it; when quality is not LAST, the
    # chain's kept set is the final stage's admitted rows restricted to
    # qc_pass ids (and the verdicts were issued on pre-rewrite text —
    # the documented ordering hazard) -----------------------------------
    def verdicts(self) -> DataFrame:
        return self.quality.verdicts()

    def kept(self) -> DataFrame:
        if self.order[-1] == "quality":
            return self.quality.kept()
        last = self._stage_kept(self.order[-1])
        if last is None:  # nothing reached the final stage yet
            return self.quality.kept().select(
                self.id_col, self.text_col
            ).limit(0)
        ok = self.quality.kept().select(self.id_col)
        return last.join(ok, self.id_col, "left_semi")

    def quarantined(self) -> DataFrame:
        return self.quality.quarantined()

    # -- maintenance -----------------------------------------------------
    def compact(self) -> None:
        """Compact every stage store BETWEEN waves (r14, VERDICT r13
        #3): each dedup gate rebuilds its store from its own kept
        corpus; the quality ledger is scoped to the ids its upstream
        stage currently keeps (verdict ids are always a subset of
        upstream kept ids — the stage input is upstream-kept ∩ batch —
        so this drops only rows upstream GC has already orphaned).
        Quality placed FIRST sees every landing id, so there is no
        upstream live set to scope by — its ledger is then left as-is
        (the measured cost of that ordering, SCALING.md chain-order
        study). Never run concurrently with run_available."""
        for i, name in enumerate(self.order):
            g = self._gate(name)
            if name == "quality":
                if i == 0:
                    continue
                up = self._stage_kept(self.order[i - 1])
                if up is not None and os.path.isdir(g._path("verdicts")):
                    g.compact(up.select(self.id_col))
            else:
                g.compact()


class EmbeddingDedupIngest:
    """EMBEDDING near-dup dedup on ingest — the vector-side member of
    the ingest-gate family (exact text, text spans, MinHash near-text,
    quality; this gate is SemDeDup at the landing edge): a new vector
    is REJECTED iff a kept vector within its SRP probe ring has
    round-6 cosine ≥ ``threshold``; survivors are canonicalized
    in-batch (verified pairs → connected components → min-id keep).

    Blocking is the integer-exact SRP recipe shared with the batch
    twin :func:`operators.similarity.embedding_near_dups` (±1 planes
    over floor-quantized vectors, Hamming-≤``probe_hamming`` mask
    ring), so candidacy is deterministic and the admission trace is
    reproducible engine-independently. Rejections are LSH-mediated: a
    true near-dup colliding in no probed bucket is admitted — the same
    false-negative envelope as the batch path (tune n_planes/ring
    against τ there). Cosine rounds to 6 dp BEFORE the threshold (the
    q27/q28/q29 ulp rule).

    State: one (id, vector, bucket) row per KEPT vector — the minimum
    a verifying vector gate must remember. Kept is MERGEd BEFORE the
    vector store (the NearDupIngest order argument: the reverse could
    register a vector and then lose its row, after which the replayed
    batch would reject the vector against itself). A FULLY replayed
    batch re-rejects its own vectors against their stored copies —
    harmless, they are already kept (and a vector re-sent under its
    id with a lightly-EDITED embedding is rejected against its own
    prior version, keeping the chain output stable — the NearDupIngest
    self-handoff semantics, documented there).

    Zero-norm / NULL vectors (r13 ADVICE): cosine is undefined for a
    directionless vector — the batch twin's round-6 division yields
    NULL, which fails every threshold, so the batch path can never
    call one a near-dup. This gate takes the SAME policy explicitly:
    zero-norm vectors are UNCOMPARABLE ⇒ ADMITTED (the NearDupIngest
    short-doc precedent), but they are EXCLUDED from the vector store
    — a stored zero vector could never reject anything (NULL cosine),
    so storing copies would only grow every future probe join. They
    land in kept() like any admitted row."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema,
        threshold: float = 0.9,
        n_planes: int = 6,
        dim: int = 64,
        probe_hamming: int = 1,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        fmt: str = "json",
    ):
        self.spark = spark
        self.root = root
        self.schema = schema
        self.threshold = float(threshold)
        self.n_planes, self.dim = int(n_planes), int(dim)
        self.probe_hamming = int(probe_hamming)
        self.vec_col = vec_col
        self.id_col = id_col
        self.fmt = fmt
        os.makedirs(self.landing(), exist_ok=True)

    landing = DedupIngest.landing
    _path = DedupIngest._path
    run_available = DedupIngest.run_available
    kept = DedupIngest.kept

    def vectors(self) -> DataFrame:
        _finish_store_compaction(self._path("vectors"))
        return self.spark.read.parquet(self._path("vectors"))

    def compact(self) -> None:
        """Rebuild the vector store from the CURRENT kept rows (VERDICT
        r13 #3 — the "supersede = live-corpus rebuild" contract): one
        (vec_id, vector) row per kept COMPARABLE vector (zero-norm rows
        stay out, per the class policy), so store size tracks the live
        corpus and vectors externally removed from kept (downstream GC)
        stop rejecting newcomers. Safe BETWEEN waves only;
        crash-recoverable via the fixed sibling-dir swap, healed at
        every store read. A compaction right after a crash between the
        kept and vector merges ABSORBS the missing vectors; the
        replayed batch then re-rejects those vectors against their own
        stored copies — harmless, they are already kept (the class
        docstring's replay argument)."""
        from ..operators.similarity import norm as _norm

        store_path = self._path("vectors")
        _finish_store_compaction(store_path)
        if not os.path.isdir(store_path):
            return
        compacted = self.kept().select(
            F.col(self.id_col).alias("vec_id"),
            F.col(self.vec_col).alias(self.vec_col),
        ).filter(F.coalesce(_norm(F.col(self.vec_col)) > 0, F.lit(False)))
        _swap_store(compacted, store_path)

    def _tagged(self, df: DataFrame) -> DataFrame:
        from ..operators import similarity
        from ..operators.similarity import lsh_bucket_int_expr, norm

        planes = similarity.hyperplanes_int(self.n_planes, self.dim)
        return df.select(
            F.col(self.id_col).alias("_id"),
            F.col(self.vec_col).alias("_v"),
            norm(F.col(self.vec_col)).alias("_nrm"),
            lsh_bucket_int_expr(planes, self.vec_col).alias("_bkt"),
        )

    def _verified_pairs(
        self, probing: DataFrame, stored: DataFrame, undirected: bool = False
    ) -> DataFrame:
        """Candidate pairs (probing id_a → stored id_b) within the
        probe ring with round-6 cosine ≥ threshold. ``undirected``
        (the in-batch self-join case) filters id_a < id_b BEFORE the
        cosine projection, so each unordered pair is dot-scored once
        instead of twice."""
        from ..operators import similarity
        from ..operators.similarity import dot

        masks = similarity.probe_masks(self.n_planes, self.probe_hamming)
        a = probing.select(
            F.col("_id").alias("id_a"),
            F.col("_v").alias("_va"),
            F.col("_nrm").alias("_na"),
            F.explode(
                F.array(*[F.col("_bkt").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("_pbkt"),
        )
        b = stored.select(
            F.col("_id").alias("id_b"),
            F.col("_v").alias("_vb"),
            F.col("_nrm").alias("_nb"),
            F.col("_bkt").alias("_pbkt"),
        )
        joined = a.join(b, "_pbkt")
        if undirected:
            joined = joined.filter(F.col("id_a") < F.col("id_b"))
        return (
            joined
            .select(
                "id_a",
                "id_b",
                F.round(
                    dot(F.col("_va"), F.col("_vb"))
                    / (F.col("_na") * F.col("_nb")),
                    6,
                ).alias("_cos6"),
            )
            .filter(F.col("_cos6") >= F.lit(self.threshold))
            .select("id_a", "id_b")
            .distinct()
        )

    def _process(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators import dedup

        batch = batch.withColumn(
            "_pay", F.to_json(F.struct(F.col(self.vec_col)))
        )
        batch = _one_row_per_id(batch, self.id_col, "_pay").drop("_pay")
        tagged = self._tagged(batch)
        # zero-norm / NULL vectors are UNCOMPARABLE: admitted outright
        # (class docstring — the batch twin's NULL cosine can never
        # reject them either) and kept out of every pair join below
        _cmp = F.col("_nrm") > 0
        uncomparable_ids = tagged.filter(_cmp.isNull() | ~_cmp).select("_id")
        tagged = tagged.filter(_cmp)
        survivors = tagged
        store_path = self._path("vectors")
        _finish_store_compaction(store_path)
        if os.path.isdir(store_path):
            stored = self._tagged(
                self.spark.read.parquet(store_path).withColumnRenamed(
                    "vec_id", self.id_col
                )
            ).filter(_cmp)  # pre-fix stores may hold zero vectors
            rejected = self._verified_pairs(tagged, stored)
            survivors = tagged.join(
                rejected.select(F.col("id_a").alias("_id")).distinct(),
                "_id",
                "left_anti",
            )
        # in-batch canonicalization: verified undirected pairs among
        # survivors → connected components → min-id keep
        pairs = self._verified_pairs(survivors, survivors, undirected=True)
        clusters = dedup.duplicate_clusters(pairs)
        losers = clusters.filter(
            F.col("cluster_id") != F.col("node_id")
        ).select(F.col("node_id").alias("_id"))
        admitted_ids = (
            survivors.join(losers, "_id", "left_anti")
            .select("_id")
            .unionAll(uncomparable_ids)
        )
        admitted = batch.join(
            admitted_ids.withColumnRenamed("_id", self.id_col),
            self.id_col,
            "left_semi",
        )
        # materialize before the merges (lineage reads the vector store)
        tmp_rows = self._path("_admitted__tmp")
        admitted.write.mode("overwrite").parquet(tmp_rows)
        if glob.glob(os.path.join(tmp_rows, "part-*")):
            from ..operators.similarity import norm as _norm

            fresh = self.spark.read.parquet(tmp_rows)
            if fresh.limit(1).count() > 0:
                # kept FIRST, vectors second (see class docstring)
                upsert.merge(
                    self.spark, self._path("kept"), fresh, keys=[self.id_col]
                )
                # the store holds only COMPARABLE vectors — a zero
                # vector can never reject anything (class docstring)
                vec_rows = fresh.select(
                    F.col(self.id_col).alias("vec_id"),
                    F.col(self.vec_col).alias(self.vec_col),
                ).filter(
                    F.coalesce(_norm(F.col(self.vec_col)) > 0, F.lit(False))
                )
                if vec_rows.limit(1).count() > 0:
                    upsert.merge(
                        self.spark,
                        self._path("vectors"),
                        vec_rows,
                        keys=["vec_id"],
                    )
        shutil.rmtree(tmp_rows, ignore_errors=True)
