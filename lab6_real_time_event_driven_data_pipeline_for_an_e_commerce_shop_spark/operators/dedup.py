"""Deduplication operators over the ``documents`` table — exact,
MinHash+LSH, SimHash, and n-gram-Jaccard near-dup detection.

Design for 100 TB:
- **Exact**: hash-groupBy on a normalized fingerprint. One shuffle on
  the 16-byte hash; never on the document text.
- **n-gram Jaccard**: shingle → explode → self-join on shingle →
  count shared → Jaccard. The join carries (doc_id, shingle-hash)
  pairs only. A blocking key (same language) bounds the candidate
  space; at larger scale swap blocking for MinHash-LSH below.
- **MinHash + LSH**: k min-hashes from ONE pass (k affine transforms of
  one base hash — no k rescans), banded into b buckets; candidate
  pairs are generated per-bucket (equi-join on band signature), so the
  quadratic blow-up is limited to same-bucket groups.
- **SimHash**: 32-bit sign-aggregated token hashes; near-dups share
  bands of bits.

Hashing is md5-based (``conv(substr(md5(x),1,12),16,10)``) — portable
(DuckDB can reproduce it exactly), deterministic across engines,
runs, and cluster sizes. Spark's murmur ``hash()`` is faster but
engine-private; swap in production if oracle parity isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cache import bounded_cache
from ..functions.expressions import MERSENNE, affine_minhash
from ..functions.expressions import portable_hash as _portable_hash
from .text import shingles
# Affine coefficients for the k hash functions h_i(x) = (a_i*x + b_i) % P.
# Fixed constants (NOT runtime-random): reproducible signatures.
MINHASH_COEF = [
    (1_203_077, 12_345),
    (2_038_075, 98_765),
    (3_014_107, 55_555),
    (4_000_037, 77_777),
    (5_014_013, 11_111),
    (6_029_003, 22_222),
    (7_036_097, 33_333),
    (8_038_013, 44_444),
    (9_043_049, 66_666),
    (10_061_029, 88_888),
    (11_071_019, 13_579),
    (12_082_015, 24_680),
    (13_093_007, 97_531),
    (14_104_003, 86_420),
    (15_115_001, 19_283),
    (16_126_001, 74_655),
]


portable_hash = _portable_hash  # re-export (oracle SQL mirrors this)


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: normalized-text hash → (hash, keep id, copies).
    Shuffles 16-byte hashes, not documents.

    r18 (VERDICT r17 #4): the hash-keyed exchange is an explicit
    ADAPTIVE repartition, not the session-static groupBy shuffle —
    this op runs inside q53's exact_kept cache body, where a vanilla
    session applies NO AQE coalescing (cached plans skip AQE when
    canChangeCachedPlanOutputPartitioning=false, the default), so the
    static 200 was a real 200-task stage at the gate. Map-side combine
    loses nothing here: text hashes are near-unique (duplicates are
    the exception), so partial counts compress ~nothing anyway."""
    normalized = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.md5(normalized).alias("text_hash"), F.col(id_col))
        .repartition(_substrate_partitions(df), "text_hash")
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def _substrate_partitions(df: DataFrame) -> int:
    """Scale-adaptive shuffle width for shingle-substrate builds
    (r17, guide §2): derived from the INPUT's optimizer size estimate
    (parquet footer bytes — no job), floored at the cluster's default
    parallelism — never the session's static ``shuffle.partitions``,
    which is a constant tuned for neither this corpus nor local mode.
    Substrates are cached, and a cached plan's shuffles bypass AQE
    coalescing (its output partitioning is frozen), so an oversized
    static width pays its full task count — and one task-deser of the
    large shingle expression tree per task — on EVERY materialization
    (measured: 200-task window/distinct stages at 60 ms/task on a
    500-doc corpus)."""
    sc = df.sparkSession.sparkContext
    floor = sc.defaultParallelism
    try:
        # Sum the LEAF relations' sizes, not the plan root's estimate:
        # Catalyst's join-output estimates MULTIPLY cardinalities, so a
        # join-derived corpus frame can report petabytes for kilobytes
        # of input (observed: a 32k-task repartition from one such
        # estimate). Leaf stats are file/local-relation bytes — exact.
        plan = df._jdf.queryExecution().optimizedPlan()
        leaves = plan.collectLeaves()
        sizes = []
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            name = leaf.getClass().getSimpleName()
            # Trust only leaves whose size statistic is REAL bytes:
            # file scans (LogicalRelation over parquet/orc/...) and
            # literal LocalRelations. Everything else lies: a
            # parallelized LogicalRDD reports the Long.MaxValue
            # "unknown" sentinel, and an InMemoryRelation that is not
            # yet materialized reports its CHILD PLAN's estimate —
            # join estimates multiply cardinalities (observed: a
            # candidate-pair cache leaf priced a 2 MB corpus at 20 GB
            # → a 655-partition substrate whose cache scans then paid
            # 655 tasks on every warm read).
            if name not in ("LogicalRelation", "LocalRelation"):
                return floor
            sizes.append(int(leaf.stats().sizeInBytes()))
        size = sum(sizes)
    except Exception:  # py4j surface moved — fall back to the floor
        return floor
    # ~32 MB of scanned bytes per task (the exploded hash substrate is
    # a small multiple of the text it came from)
    return max(floor, min(size // (32 << 20), 1 << 15))


def loop_width(n_rows: int, floor: int = 16) -> int:
    """Shuffle width for a bounded ITERATIVE loop (connected
    components, pagerank, k-core peeling): derived from the MEASURED
    cardinality of the loop's result-bounded state frame (edge list /
    label table) — never a constant tuned to gate-SF facts and never
    the session's static width (r18, VERDICT r17 #3; generalizes the
    r15/r16 state-store and checkpoint-loop lessons). Loop rows are a
    few tens of bytes (two ids + a long), so ~2M rows per partition
    keeps each round's shuffles in the 100 MB class; the floor keeps
    tiny gate-SF graphs at the r17-measured width, and the cap bounds
    the per-round task count."""
    n = max(0, int(n_rows))
    return max(int(floor), min(-(-n // 2_000_000), 1 << 15))


def _doc_shingle_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, shingle_hash) distinct pairs — the common substrate for
    Jaccard, MinHash and SimHash.

    The explicit repartition by ``_id`` does double duty (r17): its
    scale-adaptive width replaces the session-static shuffle the
    ``distinct`` would otherwise insert, and hash-by-_id satisfies
    BOTH the distinct's clustering requirement and the doc-grain
    groupBy every consumer (MinHash signatures, SimHash folds, winnow)
    applies next — one exchange where there were two."""
    return (
        df.repartition(_substrate_partitions(df), F.col(id_col))
        .select(F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), k)).alias("_sh"))
        .select("_id", portable_hash(F.col("_sh")).alias("_h"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    max_df_pct: int | None = None,
    cache_slot: str = "dedup",
) -> DataFrame:
    """Near-duplicate pairs by k-word-shingle Jaccard ≥ threshold.

    ``cache_slot`` names the substrate-cache slots (r17): two
    CONCURRENT consumers with different corpora (q24 over raw
    documents, curate over its quality-filtered subset) previously
    shared one slot and evicted each other's substrate AND n_docs memo
    on every alternation — each q24/q53 build re-paid the corpus count
    job twice (measured: 2 Spark jobs per warm rebuild). Distinct
    slots let both substrates stay live; each slot still holds at most
    one cache (the bounded contract).

    explode → (optionally blocked) self-equi-join on shingle hash →
    shared count → |A∪B| = |A|+|B|−shared. Output: (id_a, id_b,
    jaccard) with id_a < id_b.

    ``max_df_pct`` bounds the worst-case skew (r3 VERDICT watch item):
    a stop-word shingle appearing in nearly every document turns the
    shingle equi-join quadratic on that one hot key. With the cut, any
    shingle held by more than ``max_df_pct``% of documents is dropped
    BEFORE the self-join (standard near-dup practice), and Jaccard is
    computed over the RETAINED shingle sets — a deterministic,
    engine-portable definition (the comparison ``df·100 > pct·n_docs``
    is pure integer arithmetic, so an oracle derives the identical
    cut). Per-key join work is thereby bounded by
    (max_df_pct · n_docs / 100)², independent of the corpus's token
    distribution. None (default) disables the cut.

    Cost shape of the cut: n_docs comes from the parquet-metadata
    count; the per-shingle document frequency is ONE window over _h
    applied before the cache, so the cut adds a single shuffle to the
    substrate build and the three downstream consumers (sizes + both
    join sides) ride the already-cut cache.
    """
    # The explicit repartition by ``_h`` (scale-adaptive width, r17)
    # replaces the session-static shuffle the ``distinct`` would insert
    # AND pre-satisfies the df-cut window's partitionBy(_h) and the
    # self-join's _h clustering: hash-by-_h colocates every (_id, _h)
    # duplicate and every _h window group, so distinct + window ride
    # this single exchange instead of adding their own.
    pairs_src = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col).alias("_blk")] if block_col else [] ),
        F.explode(shingles(F.col(text_col), k)).alias("_sh"),
    ).select("_id", *(["_blk"] if block_col else []), portable_hash(F.col("_sh")).alias("_h")).repartition(
        _substrate_partitions(df), "_h"
    ).distinct()
    if max_df_pct is not None:
        from pyspark.sql import Window

        from ..functions.cache import bounded_scalar

        # the corpus count is a PLAN-CONSTRUCTION constant (it folds
        # into the df-cut threshold literal); r17: memoized per input
        # plan so repeated builds of the same corpus's pair relation
        # (bench re-runs, multi-consumer pipelines) don't pay a Spark
        # job each — same session-scoped slot semantics as the shingle
        # substrate cache right below
        n_docs = bounded_scalar(
            f"{cache_slot}.ngram_n_docs", df, lambda: df.count()
        )
        pairs_src = (
            pairs_src.withColumn(
                "_df", F.count("*").over(Window.partitionBy("_h"))
            )
            .filter(F.col("_df") * 100 <= F.lit(int(max_df_pct) * n_docs))
            .drop("_df")
        )
    # cache: this substrate feeds THREE subplans (sizes + both join
    # sides); without it the explode+md5 work runs 3x (measured 5s -> 1s
    # on the 500-doc corpus). Bounded, not leaked (r1 ADVICE): see
    # functions/cache.bounded_cache — identical re-invocations stay
    # warm, a different input releases the previous blocks.
    pairs_src = bounded_cache(f"{cache_slot}.shingle_substrate", pairs_src)

    # r18 (VERDICT r17 #4): the two aggregations below run inside the
    # CALLERS' pair-relation caches (q24.pairs / curation.near_pairs),
    # whose materialization gets NO AQE coalescing in a vanilla
    # session — their groupBy exchanges were real 200-task stages at
    # the gate. Explicit adaptive repartitions replace them. Map-side
    # combine loses ~nothing in either: the substrate is _h-clustered,
    # so one doc's shingles (sizes) and one pair's shared shingles
    # (shared) are SPREAD across partitions — partial aggregation over
    # _h-partitioned input barely compresses by construction.
    width = _substrate_partitions(df)
    sizes = (
        pairs_src.repartition(width, "_id")
        .groupBy("_id")
        .agg(F.count("*").alias("_n"))
    )

    a = pairs_src.select(F.col("_id").alias("id_a"), *( [F.col("_blk")] if block_col else [] ), "_h")
    b = pairs_src.select(F.col("_id").alias("id_b"), *( [F.col("_blk").alias("_blk_b")] if block_col else [] ), "_h")
    join_cond = (a["_h"] == b["_h"]) & (a["id_a"] < b["id_b"])
    if block_col:
        join_cond = join_cond & (a["_blk"] == b["_blk_b"])
    shared = (
        a.join(b, join_cond)
        .repartition(width, "id_a", "id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("_shared"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("_shared").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, k: int = 16, shingle_k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """k-wide MinHash signature per document, computed in ONE aggregation
    pass: min over k affine transforms of the shingle hash. Output:
    (id, mh_0..mh_{k-1})."""
    assert k <= len(MINHASH_COEF)
    sh = _doc_shingle_hashes(df, text_col, id_col, shingle_k)
    aggs = [
        F.min(affine_minhash(F.col("_h"), a, b)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_COEF[:k])
    ]
    # One doc-grain row with k ints — tiny vs the exploded shingle
    # table, and the natural share point: the LSH banding pass and the
    # signature-agreement verify stage both re-invoke this function on
    # the identical input, so a semantically-equal plan lands in the
    # same slot and the shingle explode + k-way min agg run ONCE.
    return bounded_cache(
        "dedup.minhash_signatures",
        sh.groupBy(F.col("_id").alias(id_col)).agg(*aggs),
    )


def minhash_lsh_candidates(
    df: DataFrame, bands: int = 4, k: int = 16, shingle_k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs: signature split into ``bands`` bands of
    k/bands rows; docs sharing ANY band signature are candidates.
    The band join is an equi-join on (band_idx, band_sig) — fully
    shuffle-partitionable, no cross join anywhere."""
    rows = k // bands
    sig = minhash_signatures(df, k, shingle_k, text_col, id_col)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws("_", *[F.col(f"mh_{bi * rows + r}") for r in range(rows)]).alias("sig"),
        )
        for bi in range(bands)
    ]
    banded = sig.select(F.col(id_col).alias("_id"), F.explode(F.array(*band_cols)).alias("b")).select(
        "_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig")
    )
    a = banded.select(F.col("_id").alias("id_a"), "band", "sig")
    b = banded.select(F.col("_id").alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def signature_agreement(
    pairs: DataFrame,
    sig: DataFrame,
    k: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pair MinHash signature agreement: joins a candidate-pair
    relation (id_a, id_b, …) to a signature relation (id, mh_0..mh_{k-1})
    on both sides and appends

    - ``n_sig_agree`` (int)   — matching components (the unbiased
      Jaccard estimator's numerator; ≥ rows-per-band for LSH pairs,
      since candidates share at least one full band), and
    - ``est_jaccard`` (double) — n_sig_agree / k, the classic MinHash
      estimate (E[est] = J; k=16 ⇒ σ ≈ 0.125 at J=0.5). n/k is an
      exact binary fraction for power-of-two k — engine-portable.

    This is the cheap verify step between LSH candidate generation and
    exact-Jaccard scoring: signatures are already materialized by the
    LSH pass, so the estimate costs two joins of the (small) pair set
    against the signature table — no shingle re-scan, no text touched."""
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"_a{i}") for i in range(k)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"_b{i}") for i in range(k)],
    )
    agree: Column = F.lit(0)
    for i in range(k):
        agree = agree + F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1).otherwise(0)
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_sig_agree", agree.cast("int"))
        .withColumn(
            "est_jaccard", F.col("n_sig_agree").cast("double") / F.lit(float(k))
        )
        .drop(*[f"_a{i}" for i in range(k)], *[f"_b{i}" for i in range(k)])
    )


def simhash(df: DataFrame, bits: int = 32, shingle_k: int = 1,
            text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash: per-bit sign aggregation of token hashes. bit_j(doc) = 1
    iff Σ_tokens (bit_j(h) ? +1 : −1) > 0. One explode + one groupBy."""
    sh = _doc_shingle_hashes(df, text_col, id_col, shingle_k)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{j}")
        for j in range(bits)
    ]
    agg = sh.groupBy(F.col("_id").alias(id_col)).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for j in range(bits):
        sim = sim + F.when(F.col(f"_b{j}") > 0, F.lit(2**j).cast("long")).otherwise(0)
    return agg.select(id_col, sim.alias("simhash"))


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair edge list:
    (node_id, cluster_id) where cluster_id = MIN node id in the
    component. The missing step between pair generation (LSH/Jaccard/
    SimHash emit PAIRS) and corpus dedup (keep ONE doc per duplicate
    CLUSTER): A~B and B~C must collapse to one cluster even when (A,C)
    was never emitted as a candidate.

    Algorithm: min-label propagation FUSED with pointer jumping.
    Each round does
        label(v) <- min(label(v), min_{u in N(v)} label(u))   [1 hop]
        label(v) <- min(label(v), label(label(v)))            [shortcut]
    The shortcut halves pointer-chain depth each round, so convergence
    is O(log diameter) rounds, not O(diameter) — the same guarantee
    class as large-star/small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) but with a fixed
    2-join round body. Labels decrease monotonically and always name a
    node inside the same component, so the fixpoint is exactly the
    component minimum.

    Scale notes (100 TB): every round is two shuffles keyed on node id
    (no neighborhood materialized anywhere — worst skew per round is a
    hot LABEL key, which AQE skew handling splits); lineage is cut per
    round with an EAGER localCheckpoint so the plan stays O(1) deep
    (swap for reliable checkpoint() on a real cluster — executor loss
    invalidates localCheckpoint blocks). The driver sees ONE scalar per
    round (the changed-label count); data never leaves the executors.

    The reference has no graph operator at all — this generalizes its
    exact-match dedup (glue_job.py-style manifest grouping) to
    transitive near-dup clusters.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
    )
    # Eager-cache edges: reused every round (bounded — edge lists are
    # candidate pairs, orders of magnitude smaller than the corpus).
    edges = edges.persist()
    # r18 (VERDICT r17 #3): the loop's shuffle width is derived from
    # the MEASURED edge cardinality — the list is result-bounded and
    # this count materializes the persist the first round would pay
    # anyway — replacing the caller-side constant-16 override that was
    # sized to gate-SF facts. Scoped to the eager loop below, restored
    # in finally; the returned frame executes at the caller's width.
    spark = pairs.sparkSession
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(loop_width(edges.count()))
    )
    try:
        return _duplicate_clusters_loop(edges, max_rounds)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)


def _duplicate_clusters_loop(edges: DataFrame, max_rounds: int) -> DataFrame:
    labels = edges.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        # 1-hop: min over own label and neighbors' labels
        nbr_min = (
            edges.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("label").alias("_nmin"))
        )
        hop = (
            labels.join(nbr_min, "id", "left")
            .select("id", F.least("label", "_nmin").alias("label"))
        )
        # shortcut: follow the label pointer once (label of my label)
        ptr = hop.select(F.col("id").alias("_pid"), F.col("label").alias("_plabel"))
        # r17: the changed-count used to be a SEPARATE job re-joining
        # the checkpointed frame against the previous labels — one full
        # join stage per round spent on a scalar. The flag now rides
        # the checkpointed round frame itself (labels decrease
        # monotonically, so "new < old" IS "changed"), and the count is
        # a scan of already-materialized local blocks. Counting the
        # CHECKPOINTED frame, never the lazy one, is the r16 kcore rule.
        jumped = (
            hop.join(ptr, hop.label == ptr._pid, "left")
            .join(labels.select("id", F.col("label").alias("_old")), "id")
            .select(
                "id",
                F.least("label", "_plabel").alias("label"),
                (F.least("label", "_plabel") < F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("_chg")).count()
        labels = jumped.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_rounds} rounds"
        )
    edges.unpersist()
    return labels.select(F.col("id").alias("node_id"), F.col("label").alias("cluster_id"))


def canonical_docs(
    clusters: DataFrame,
    df: DataFrame,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-cluster KEEP selection — the final step of the dedup
    pipeline (pairs → clusters → pick one document per cluster):
    canonical = the member with the highest ``quality_col``, ties
    broken by lowest id. Returns (cluster_id, canonical_id).

    Deterministic ranking rule: rank on an exact-comparable column
    (integer length, integer-cents score, …) — float quality scores
    must be integerized first (the repo-wide exact-ranking rule), or
    cross-engine/partitioning ties can flip the keeper.

    Shape: clusters ⋈ quality (node-keyed) → one window per cluster
    (ROW_NUMBER over (quality DESC, id ASC)). The window partitions on
    cluster_id, whose cardinality is the number of duplicate groups —
    result-bounded, orders of magnitude under the corpus."""
    from pyspark.sql import Window

    q = df.select(F.col(id_col).alias("node_id"), F.col(quality_col).alias("_q"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_q").desc(), F.col("node_id").asc()
    )
    return (
        clusters.join(q, "node_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("cluster_id", F.col("node_id").alias("canonical_id"))
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS-style winnowing fingerprints — the LOCAL-overlap member of
    the dedup family (shingle Jaccard measures global set similarity;
    winnowing catches a copied PASSAGE inside otherwise-different
    documents, the plagiarism/substring-dedup case).

    Text is normalized (lowercased, non-alphanumerics dropped — so
    formatting/whitespace edits can't break a match), hashed as
    character k-grams (portable_hash: engine-portable), and each
    sliding window of ``window`` gram hashes contributes its minimum.
    The winnowing guarantee: any shared normalized substring of length
    ≥ k + window − 1 produces at least one shared fingerprint, while
    only ~2/(window+1) of all gram hashes are kept.

    Output: distinct (id_col, fp bigint) — the substrate for
    :func:`winnow_overlap_pairs`.

    Shape: the gram hashes are built ONCE per document (one transform,
    one md5 per gram) and then posexploded to (doc, pos, hash) rows;
    window selection is a single analytic MIN over
    (doc ⇒ pos, ROWS CURRENT..window−1 FOLLOWING) — the same relation
    the DuckDB oracle writes. A nested array formulation
    (transform over array_min(slice(hashes, …))) is a trap: Catalyst
    inlines the whole hash-array expression into every window lambda,
    turning O(G·w) into O(G²·w) md5 calls — measured 300× slower."""
    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    n = F.length("_t")
    # Scale-adaptive pre-partition by doc id (r17, guide §2): one
    # exchange of the NARROW text rows, taken before the gram explode,
    # satisfies the window's partitionBy(id) AND the final distinct's
    # clustering — replacing two session-static shuffles of the ~w×
    # larger exploded gram relation — and spreads the per-gram md5
    # work across the adaptive width.
    base = (
        df.repartition(_substrate_partitions(df), F.col(id_col))
        .select(F.col(id_col), norm.alias("_t"))
        .filter(n >= k)
    )
    hashes = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: portable_hash(F.col("_t").substr(i, F.lit(k))),
    )
    g = base.select(
        F.col(id_col), F.posexplode(hashes).alias("_i", "_h")
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.currentRow, window - 1)
    )
    cnt = Window.partitionBy(id_col)
    return (
        g.select(
            F.col(id_col),
            F.col("_i"),
            F.min("_h").over(win).alias("fp"),
            F.count(F.lit(1)).over(cnt).alias("_g"),
        )
        .filter(
            F.col("_i") <= F.greatest(F.col("_g") - window, F.lit(0))
        )
        .select(id_col, "fp")
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    min_shared: int = 2,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    local-passage overlap candidates. Same equi-join shape as the
    shingle family (cost ∝ fingerprint collisions, never n²), but over
    the ~2/(window+1)-density winnowed substrate, so the join input is
    a fraction of the full gram relation. Output: (id_a, id_b,
    shared_fps) with id_a < id_b."""
    fps = winnow_fingerprints(df, k, window, text_col, id_col)
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def paragraph_dedup(
    df: DataFrame,
    sep: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus PARAGRAPH-level exact dedup (the RefinedWeb /
    FineWeb pipeline stage): split every document on ``sep``, keep only
    the FIRST corpus-wide occurrence of each distinct paragraph (first
    = lowest (doc id, position) — deterministic), and reassemble each
    document from its surviving paragraphs in original order. The
    document-grain result keeps EVERY input document (a fully-duplicate
    document comes back with empty text), so the op composes with
    downstream doc-grain stages:

        doc_id, text (cleaned), n_paras, n_paras_dropped

    Boilerplate paragraphs repeated across a crawl (nav bars, cookie
    banners, license headers) are exactly what this removes — document-
    level dedup (exact_duplicates / MinHash) never catches them because
    the HOST documents differ.

    Shape, and why it scales: paragraphs shuffle once keyed on their
    md5 (128-bit — collision-free in practice; the window partitions by
    hash so a hot boilerplate paragraph lands on ONE reducer but only
    with (id, pos, hash) rows, text rides separately), then once more
    on doc id for reassembly. No UDFs, no driver state; both shuffles
    are key-balanced except genuine boilerplate pile-ups, which are
    rank-1-per-group windows — cheap even when hot. The dedup KEY is
    the raw paragraph string (no normalization): exactness keeps the
    op oracle-checkable; compose with text normalization upstream when
    whitespace-insensitive matching is wanted."""
    from pyspark.sql import Window

    # split()'s pattern is a Java REGEX — quote the separator the way
    # java.util.regex.Pattern.quote does: \Q..\E, with any literal "\E"
    # inside the separator broken out as \E\\E\Q (a bare "\Q"+sep+"\E"
    # wrap would let a separator CONTAINING "\E" terminate the quote
    # early and run the remainder as live regex). limit -1 (default)
    # keeps trailing empties, the same contract as Python str.split /
    # DuckDB string_split.
    quoted = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(quoted))
        ).alias("_pos", "_para"),
    )
    w = Window.partitionBy("_h").orderBy(id_col, "_pos")
    flagged = paras.withColumn("_h", F.md5("_para")).withColumn(
        "_keep", (F.row_number().over(w) == 1).cast("int")
    )
    kept_structs = F.filter(
        F.array_sort(F.collect_list(F.struct("_pos", "_keep", "_para"))),
        lambda s: s["_keep"] == 1,
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(kept_structs, lambda s: s["_para"]), sep
        ).alias(text_col),
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(1 - F.col("_keep")).cast("long").alias("n_paras_dropped"),
    )


def duplicate_spans(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_provenance: bool = False,
) -> DataFrame:
    """ExactSubstr-class duplicate-passage detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): every
    MAXIMAL token run of length ≥ ``min_len`` whose every
    ``min_len``-token window occurs MORE THAN ONCE in the corpus
    (another document, or another position in the same document — both
    count, as in the paper's suffix-array formulation). The reference
    implementation builds a corpus-wide suffix array — inherently
    sequential; this is the relational equivalent at token-window
    granularity: a duplicated substring of length L ≥ min_len is
    exactly L−min_len+1 consecutive duplicated windows, so maximal
    covered-window islands ARE the maximal duplicated runs (overlapping
    duplicates from different sources merge into one island — the same
    union-of-spans the paper removes).

    Output: (id_col, span_start, span_end, span_tokens) — 0-based
    INCLUSIVE token offsets, one row per maximal span.

    Shape: token arrays built once per doc (the array column stays an
    attribute — CollapseProject will not re-inline a non-cheap split
    into the lambda; the r6 winnowing trap was nesting the ARRAY
    EXPRESSION itself), window hashes posexploded to (doc, pos, h)
    rows, ONE corpus groupBy on the 48-bit portable hash for
    occurrence counts, a semi-join back, and the textbook
    gaps-and-islands window (pos − row_number) per doc. Everything
    shuffles on hash or doc id; the hot-hash skew ceiling is the same
    rank-window shape q24 bounds with its df cut. Hash grain is
    md5-48bit (collision-free in practice, oracle-portable).

    ``with_provenance`` (r13) adds ``n_sharing_docs``: the number of
    DISTINCT documents (including this one) carrying any of the span's
    covered-window hashes — 1 ⇒ purely within-doc repetition, ≥2 ⇒
    cross-document duplication (the boilerplate/license-header class).
    Cost: one extra window-grain equi-join on the hash (covered rows ×
    all windows) + a per-island distinct count — corpus-linear, and
    only the COVERED windows (already ≥2 occurrences) join."""
    from pyspark.sql import Window

    k = int(min_len)
    w = _window_hashes(df, k, text_col, id_col)
    if with_provenance:
        # three consumers below (occurrence counts, the covered semi-
        # join, the sharing join) — Spark does not CSE identical
        # subtrees across join branches (the r12 maxscore lesson), so
        # uncached the corpus would be tokenized+hashed once per branch.
        # r18 (VERDICT r17 #4): the keyed ADAPTIVE repartition before
        # the cache — a cached plan's body runs WITHOUT AQE in a
        # vanilla session (canChangeCachedPlanOutputPartitioning is
        # false by default), so the occurrence groupBy and semi-join
        # exchanges inside the materialization ran at the session
        # static 200 (four real 200-task stages measured at the gate).
        # Hash-by-_h at substrate width satisfies the groupBy's AND
        # both _h joins' clustering, so ONE sized exchange replaces
        # them all — the r17 shingle-family pattern.
        from ..functions.cache import bounded_cache

        w = bounded_cache(
            "dedup.duplicate_spans_w",
            w.repartition(_substrate_partitions(df), "_h"),
        )
    dup = (
        w.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("_h")
    )
    cov = w.join(dup, "_h", "left_semi")
    if not with_provenance:
        return _spans_from_covered(cov, k, id_col)
    # r18: same rule for the island cache — its window exchange ran at
    # the static 200 inside the no-AQE cached body; hash-by-_id at
    # substrate width pre-satisfies partitionBy(_id)
    isl = bounded_cache(
        "dedup.duplicate_spans_isl",
        cov.repartition(_substrate_partitions(df), "_id").withColumn(
            "_grp",
            F.col("_pos")
            - F.row_number().over(Window.partitionBy("_id").orderBy("_pos")),
        ),
    )
    sharing = (
        isl.select("_id", "_grp", "_h")
        .join(w.select(F.col("_id").alias("_id2"), "_h"), "_h")
        .groupBy("_id", "_grp")
        .agg(F.countDistinct("_id2").cast("long").alias("n_sharing_docs"))
    )
    spans = isl.groupBy("_id", "_grp").agg(
        F.min("_pos").cast("long").alias("span_start"),
        (F.max("_pos") + (k - 1)).cast("long").alias("span_end"),
    )
    return (
        spans.join(sharing, ["_id", "_grp"])
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            "n_sharing_docs",
        )
    )


def _window_hashes(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(_id, _pos, _h): the portable 48-bit hash of the k-token window
    starting at each 0-based token position — the shared substrate of
    :func:`duplicate_spans` and the span-dedup ingest gate. The token
    array stays an attribute (non-cheap split is not re-inlined into
    the lambda by CollapseProject — the r6 winnowing trap)."""
    from .text import tokens

    arr = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_t")
    )
    hashes = F.when(
        F.size("_t") >= k,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - (k - 1)),
            lambda i: portable_hash(F.concat_ws(" ", F.slice("_t", i, k))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return arr.select("_id", F.posexplode(hashes).alias("_pos", "_h"))


def _spans_from_covered(cov: DataFrame, k: int, id_col: str) -> DataFrame:
    """Covered window starts (_id, _pos) → maximal spans via the
    textbook gaps-and-islands window (pos − row_number)."""
    from pyspark.sql import Window

    isl = cov.withColumn(
        "_grp",
        F.col("_pos")
        - F.row_number().over(Window.partitionBy("_id").orderBy("_pos")),
    )
    return (
        isl.groupBy("_id", "_grp")
        .agg(
            F.min("_pos").cast("long").alias("span_start"),
            (F.max("_pos") + (k - 1)).cast("long").alias("span_end"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut an arbitrary (id, span_start, span_end) relation out of the
    corpus: tokens inside any span are dropped, survivors reassemble in
    original order, every input document survives. The join is an
    EQUI-join on the doc id with the range as a residual condition (the
    engine's outer-join rule), at tokens × spans-per-doc grain.

    Whitespace contract (ADVICE r12, documented deliberately): output
    text is rebuilt by joining surviving TOKENS with single spaces, so
    ALL original whitespace (tabs, newlines, runs of spaces) is
    normalized — including in documents with zero removed spans. This
    diverges from ExactSubstr's in-place byte-span removal by design:
    the span relation is defined over the whitespace-token sequence
    (that is what the window hashes cover), and emitting the canonical
    token join keeps cleaned text == f(token survivors) — replay- and
    engine-portable, and idempotent under re-cleaning. Callers that
    must preserve raw bytes for untouched docs should anti-join the
    span relation and only route SPANNED docs through here.

    Empty/whitespace-only input (ADVICE r12): reported as n_tokens=0
    (Spark's split('') yields [''] — one phantom empty token — which
    previously counted as 1)."""
    from .text import tokens

    def _nonempty_tokens(col: F.Column) -> F.Column:
        # split(trim('')) is [''] — a phantom token; an empty or
        # whitespace-only doc has ZERO tokens. NB Spark's trim() strips
        # SPACES only, so emptiness is tested by deleting every \s run.
        return F.when(
            F.regexp_replace(col, r"\s", "") == "",
            F.array().cast("array<string>"),
        ).otherwise(tokens(col))

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_nonempty_tokens(F.col(text_col))).alias("_pos", "_tok"),
    )
    sp = spans.select(
        F.col(id_col).alias("_sid"), "span_start", "span_end"
    )
    kept = toks.join(
        sp,
        (F.col("_id") == F.col("_sid"))
        & (F.col("_pos") >= F.col("span_start"))
        & (F.col("_pos") <= F.col("span_end")),
        "left_anti",
    )
    kept_structs = F.array_sort(F.collect_list(F.struct("_pos", "_tok")))
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(kept_structs, lambda s: s["_tok"]), " "
        ).alias("_cleaned"),
        F.count(F.lit(1)).cast("long").alias("_nk"),
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.size(_nonempty_tokens(F.col(text_col))).cast("long").alias("_n"),
    )
    return (
        base.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_cleaned", F.lit("")).alias(text_col),
            F.col("_n").alias("n_tokens"),
            (F.col("_n") - F.coalesce("_nk", F.lit(0)))
            .cast("long")
            .alias("n_tokens_dropped"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut every :func:`duplicate_spans` passage out of the corpus —
    the removal half of ExactSubstr dedup: tokens inside any duplicated
    span are dropped, survivors reassemble in original order (the
    paragraph_dedup reassembly shape). Every input document survives
    (a fully-duplicated document comes back with empty text).

    Output: (id_col, text cleaned, n_tokens, n_tokens_dropped).

    Shape: the token relation left-anti-joins the span relation on
    (doc id, span_start ≤ pos ≤ span_end) — an EQUI-join on the doc id
    with the range as a residual condition (the engine's outer-join
    rule: residual range predicates belong IN the join condition), at
    tokens × spans-per-doc grain, never tokens × corpus-spans."""
    return remove_spans(
        df, duplicate_spans(df, min_len, text_col, id_col),
        text_col, id_col,
    )


def fuzzy_matches(
    df: DataFrame,
    max_dist: int = 2,
    text_col: str = "text",
    max_df_ppm: int | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy matching (record linkage / merge-purge):
    every DISTINCT-value pair within Levenshtein distance ``max_dist``,
    with per-value row counts — the approximate-equality join exact
    dedup cannot express ("cold plate" ≈ "old plate"). Output
    (text_a, text_b, dist, n_rows_a, n_rows_b) at distinct-VALUE
    grain, text_a < text_b; callers fan back to row ids with two
    equi-joins.

    Scale shape (q-gram blocking, complete by construction):
    1. collapse to DISTINCT values FIRST — verify cost is per value
       pair, never per row pair;
    2. LONG pairs (both values > 2·max_dist+1 chars): candidates share
       ≥1 character bigram AND |len_a − len_b| ≤ max_dist. Both are
       true Levenshtein bounds: one edit destroys ≤2 bigrams, so d
       edits leave ≥ min_len−1−2d bigrams of the shorter string intact
       inside the longer one (>0 in this band), and edit distance is
       ≥ the length difference. A bigram equi-join — never a cross
       join. Hot bigrams behave like the dedup family's shingle skew:
       a gram in f of the long-band values contributes f² candidate
       pairs, so one ubiquitous bigram ("th") makes the self-join
       quadratic in its bucket. ``max_df_ppm`` bounds it (the q24/bm25
       pattern): bigrams whose long-band document frequency exceeds
       df·10⁶ > max_df_ppm·n_long are dropped from BLOCKING — one
       window over the cached gram substrate, integer-exact and
       oracle-replicable (QUALIFY). HONEST-LOSSY: a pair whose every
       shared bigram is hot is missed; pairs within the edit budget
       share many grams, so a generous cut (say 300000 = 30%) is
       lossless on natural corpora — verify on yours before tightening
       (q76 pins cut == no-cut on the driver corpus). None = no cut
       (blocking complete by construction);
    3. SHORT pairs (shorter side ≤ 2·max_dist+1 chars, where the
       bigram bound is vacuous): shared-UNIGRAM equi-join against
       values ≤ 3·max_dist+1 chars — complete because d edits touch
       ≤ d characters, so a value longer than d keeps one intact
       character that must appear in its partner. Still an equi-join,
       never a cross join;
    4. verify levenshtein(a, b) ≤ max_dist on the candidate union —
       both engines implement the identical classic DP, so the pair
       set is oracle-exact.

    CONTRACT: values with len ≤ max_dist are EXCLUDED from matching
    (a key shorter than the edit budget matches essentially anything —
    "ab" is within 2 edits of every 2-gram and of "" — which is
    record-linkage noise, and the only band whose complete blocking
    would need a cross join). NULL values are dropped."""
    d = int(max_dist)
    # vals feeds SIX plan branches (a, b, both gram self-join sides,
    # both char self-join sides) and Spark does not CSE identical
    # subtrees across branches — cache the distinct-value substrate so
    # the corpus scan + groupBy runs once (the r12/r13 lesson)
    vals = bounded_cache(
        "dedup.fuzzy_vals",
        df.filter(F.col(text_col).isNotNull() & (F.length(text_col) > d))
        .groupBy(F.col(text_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .withColumn("_len", F.length("_v")),
    )
    a = vals.select(
        F.col("_v").alias("text_a"), F.col("_c").alias("n_rows_a")
    )
    b = vals.select(
        F.col("_v").alias("text_b"), F.col("_c").alias("n_rows_b")
    )
    grams = bounded_cache(
        "dedup.fuzzy_grams",
        vals.select(
            "_v",
            F.explode(
                F.array_distinct(
                    F.expr("transform(sequence(1, greatest(_len - 1, 1)), i -> substring(_v, i, 2))")
                )
            ).alias("_g"),
        ),
    )
    from pyspark.sql import Window

    long_grams = grams.filter(F.length("_v") > 2 * d + 1)
    if max_df_ppm is not None:
        # hot-gram cut (docstring): ONE window over the long-band gram
        # substrate; n_long is a bounded scalar (plan literal on both
        # engines). Cast-to-long products — two INT32 literals overflow
        # under ANSI (the r11 bm25 lesson).
        n_long = vals.filter(F.length("_v") > 2 * d + 1).count()
        long_grams = bounded_cache(
            "dedup.fuzzy_long_grams_cut",
            long_grams.withColumn(
                "_df",
                F.count(F.lit(1)).over(Window.partitionBy("_g")).cast("long"),
            )
            .filter(
                F.col("_df") * F.lit(1_000_000).cast("long")
                <= F.lit(int(max_df_ppm)).cast("long")
                * F.lit(int(n_long)).cast("long")
            )
            .drop("_df"),
        )
    long_pairs = (
        long_grams.select(F.col("_v").alias("text_a"), "_g")
        .join(
            long_grams.select(F.col("_v").alias("text_b"), "_g"),
            "_g",
        )
        .filter(F.col("text_a") < F.col("text_b"))
        .select("text_a", "text_b")
        .distinct()
    )
    chars = bounded_cache(
        "dedup.fuzzy_chars",
        vals.select(
            "_v",
            F.explode(
                F.array_distinct(
                    F.expr("transform(sequence(1, _len), i -> substring(_v, i, 1))")
                )
            ).alias("_g"),
        ),
    )
    short_pairs = (
        chars.filter(F.length("_v") <= 2 * d + 1)
        .select(F.col("_v").alias("_sa"), "_g")
        .join(
            chars.filter(F.length("_v") <= 3 * d + 1)
            .select(F.col("_v").alias("_sb"), "_g"),
            "_g",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least("_sa", "_sb").alias("text_a"),
            F.greatest("_sa", "_sb").alias("text_b"),
        )
        .distinct()
    )
    cand = (
        long_pairs.unionByName(short_pairs)
        .distinct()
        # length-difference prefilter (a true lower bound on edit
        # distance) — prunes the DP verify, never the answer
        .filter(F.abs(F.length("text_a") - F.length("text_b")) <= d)
    )
    verified = cand.withColumn(
        "dist", F.levenshtein("text_a", "text_b").cast("long")
    ).filter(F.col("dist") <= d)
    return (
        verified.join(a, "text_a")
        .join(b, "text_b")
        .select("text_a", "text_b", "dist", "n_rows_a", "n_rows_b")
    )
