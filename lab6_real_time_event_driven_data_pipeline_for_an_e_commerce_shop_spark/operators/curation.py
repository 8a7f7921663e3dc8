"""Training-corpus curation: the composed pipeline a pretraining data
team runs over raw documents —

    quality gate → exact dedup → near-dup removal → split assignment

Every stage is deterministic and relational (oracle-checkable SQL), and
every stage shuffles hashes/ids, never document text:

1. **quality gate**: length + token bounds (rules-as-columns, same
   pattern as the e-commerce validation operator).
2. **exact dedup**: keep the lowest doc_id per normalized-text hash.
3. **near-dup removal**: from the n-gram Jaccard pair set, drop any doc
   that has a more-similar-than-threshold partner with a LOWER id —
   one deterministic pass (greedy transitive chains intentionally NOT
   followed: A~B and B~C with A<B<C drops B and C, keeping exactly the
   canonical lowest representative of each similarity star; at corpus
   scale the banded-LSH candidate set replaces the all-pairs input).
4. **split assignment**: portable_hash(doc_id) mod 100 → train/val/test
   by threshold — stable under corpus growth (a doc's split never
   changes when other docs arrive), the property random sampling lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cache import bounded_cache
from ..functions.expressions import portable_hash
from .dedup import exact_duplicates, ngram_jaccard_pairs


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Deterministic hash split: bucket = portable_hash(id) mod 100;
    [0, test) → test, [test, test+val) → val, rest → train."""
    bucket = portable_hash(F.col(id_col).cast("string")) % 100
    return df.withColumn(
        "split",
        F.when(bucket < test_pct, F.lit("test"))
        .when(bucket < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def curate(
    df: DataFrame,
    min_chars: int = 20,
    min_tokens: int = 5,
    near_dup_threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df_pct: int | None = None,
) -> DataFrame:
    """The full curation pass; returns kept docs with their split.
    ``max_df_pct`` forwards the near-dup step's document-frequency cut
    (shingles in > that % of the exact-kept docs are dropped before the
    self-join — bounded hot-key skew; r4). Default None: on small or
    deliberately-duplicated corpora the cut would remove exactly the
    shared shingles that define near-dups; corpus-scale callers (the
    gated q53) opt in at 50 like q24."""
    t = F.col(text_col)
    quality = df.filter(
        (F.length(t) >= min_chars)
        & (F.size(F.split(F.trim(t), r"\s+")) >= min_tokens)
    )

    keep_exact = exact_duplicates(quality, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # exact_kept feeds BOTH the jaccard shingle substrate and the final
    # anti-join/select — one bounded materialization instead of running
    # the quality filter + md5 dedup twice (functions/cache semantics)
    exact_kept = bounded_cache(
        "curation.exact_kept", quality.join(keep_exact, id_col, "left_semi")
    )

    # r17: the pair relation is the expensive tail of the pipeline
    # (shingle self-join + two size joins); bounded-cache it like q24
    # does its pairs, so repeated invocations (the materialized-silver
    # economics every bench/gate consumer amortizes to) pay the
    # self-join once per corpus instead of once per run. Same slot
    # semantics as every other substrate: a different input plan
    # releases and rebuilds.
    pairs = bounded_cache(
        "curation.near_pairs",
        ngram_jaccard_pairs(
            exact_kept, threshold=near_dup_threshold, k=3,
            text_col=text_col, id_col=id_col, max_df_pct=max_df_pct,
            cache_slot="curation.near",
        ),
    )
    # drop every doc with a ≥threshold partner of LOWER id (id_a < id_b
    # by construction, so id_b is always the one dropped)
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    near_kept = exact_kept.join(dropped, id_col, "left_anti")

    return assign_split(near_kept, id_col)


def contamination_counts(
    df: DataFrame,
    holdout_split: str = "test",
    split_col: str = "split",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    substrate: DataFrame | None = None,
) -> DataFrame:
    """Train/eval decontamination: for every non-holdout document, how
    many of its distinct k-word shingle hashes also occur in ANY
    holdout document. ``df`` must already carry ``split_col``
    (assign_split). Output: id_col + ``leak_shingles`` (bigint; 0 for
    holdout rows themselves).

    ``substrate`` (r18, VERDICT r17 #5): an optional PRE-BUILT distinct
    (_id, _h) shingle-hash relation over the SAME documents (the
    dedup._doc_shingle_hashes shape). A caller that also consumes the
    substrate elsewhere (q52's rare-shingle audit is the same relation)
    passes ONE cached frame instead of paying the tokenize+explode+
    distinct pass per consumer. Must cover exactly ``df``'s rows with
    the same (text, k) derivation — the caller owns that contract.

    Scale shape: the substrate is the same distinct (doc, shingle-hash)
    relation the dedup family uses; the holdout side reduces to a
    distinct hash set (~holdout fraction of the corpus) before the
    equi-join, and the count is COUNT(*) over an already-distinct
    substrate — no Expand. This is the standard benchmark-contamination
    join (e.g. GPT-3 appendix C) expressed relationally."""
    from .dedup import _doc_shingle_hashes

    sh = (
        substrate
        if substrate is not None
        else _doc_shingle_hashes(df, text_col, id_col, k)
    )
    holdout_ids = df.filter(F.col(split_col) == holdout_split).select(
        F.col(id_col).alias("_id")
    )
    holdout_h = sh.join(holdout_ids, "_id", "left_semi").select("_h").distinct()
    leak = (
        sh.join(holdout_ids, "_id", "left_anti")
        .join(holdout_h, "_h")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("leak_shingles"))
    )
    return (
        df.select(F.col(id_col), F.col(split_col))
        .join(leak.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col(split_col) == holdout_split, F.lit(0))
            .otherwise(F.coalesce(F.col("leak_shingles"), F.lit(0)))
            .cast("long")
            .alias("leak_shingles"),
        )
    )


def stratified_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic stratified sample: up to ``n_per_group`` rows per
    group, chosen by ranking the portable hash of (salt ‖ id) within
    the group — a fixed pseudo-random permutation, so the sample is
    (a) uniform within each group, (b) identical across runs/engines/
    partitionings, (c) MONOTONE in n (the n=100 sample contains the
    n=50 sample — growing a dataset's per-class budget never churns
    already-selected examples), and (d) re-salt to draw an independent
    replicate. The class-balancing counterpart of the corpus-wide
    hash sampling in q52 (sampled20). One shuffle on group_cols."""
    from pyspark.sql import Window

    from ..functions.expressions import portable_hash

    h = portable_hash(F.concat_ws("␟", F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_srank", F.row_number().over(w))
        .filter(F.col("_srank") <= n_per_group)
        .drop("_srank")
    )


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "",
) -> DataFrame:
    """Deterministic sequence packing for pretraining: assign whole
    documents to fixed-token-budget packs (the step that turns a
    curated corpus into trainer-ready sequences). Output adds

    - ``shard``        — hash shard (packing parallel unit)
    - ``pack_id``      — pack number within the shard
    - ``pack_offset``  — token offset of this doc inside its pack

    Semantics: *first-fit-in-hash-order with overflow*. Docs are laid
    head-to-tail in the deterministic portable-hash order within each
    shard; a doc whose exclusive running sum falls in pack k belongs to
    pack k even if it overflows the boundary, so each pack's total is
    within ±max_doc_tokens of the budget (the trainer truncates or
    wraps the tail — standard practice). Exact greedy bin-packing is
    inherently sequential; this relaxation is one window over
    (shard ⇒ hash, id) — embarrassingly parallel across shards, fully
    deterministic across runs/engines/partitionings, and oracle-
    checkable (SUM OVER + integer DIV/MOD).

    Scale: the only exchange is the shard hash-partition; each shard's
    window is an independent sorted scan. n_shards bounds per-task
    state; packs never span shards."""
    from pyspark.sql import Window

    h = portable_hash(
        F.concat_ws("␟", F.lit(salt), F.col(id_col).cast("string"))
    )
    shard = F.pmod(h, F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("long")
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("_excl", F.sum(tok).over(w) - tok)
        # integer `div`, never `/`: double division would round the
        # quotient at large cumulative sums (CLAUDE.md float rules)
        .withColumn("pack_id", F.expr(f"_excl div {int(budget_tokens)}"))
        .withColumn("pack_offset", F.col("_excl") % F.lit(budget_tokens))
        .drop("_h", "_excl")
    )


def mixture_keep_expr(
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_frac: float = 0.0,
):
    """The mixture-sampling keep predicate as a pure column expression:
    keep ⇔ portable_hash(salt‖id) mod 10⁶ < frac(group)·10⁶.
    Thresholds are exact integers (floor of frac·10⁶) so engines agree
    bit-for-bit. Usable either as a filter (:func:`mixture_sample`) or
    as a flag column — flagging costs nothing (no join, no shuffle;
    the decision is a per-row hash compare)."""
    h = portable_hash(
        F.concat_ws("␟", F.lit(salt), F.col(id_col).cast("string"))
    )
    bucket = F.pmod(h, F.lit(1_000_000))
    thresh = F.lit(int(default_frac * 1_000_000))
    for group, frac in sorted(weights.items()):
        thresh = F.when(
            F.col(group_col) == group, F.lit(int(frac * 1_000_000))
        ).otherwise(thresh)
    return bucket < thresh


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_frac: float = 0.0,
) -> DataFrame:
    """Domain-mixture downsampling: keep each group at its target
    fraction (e.g. ``{"web": 0.3, "books": 1.0}``) via
    :func:`mixture_keep_expr`. Deterministic and stable under corpus
    growth (a kept doc stays kept), per-doc independent (no shuffle at
    all — a pure filter), and re-salt for an independent draw. Groups
    absent from ``weights`` keep ``default_frac``."""
    return df.filter(
        mixture_keep_expr(weights, group_col, id_col, salt, default_frac)
    )


def domain_cap(
    df: DataFrame,
    n_per_group: int = 10,
    group_col: str = "source",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain document cap — the web-corpus curation rule "keep at
    most N docs per domain, best first" (bounds any single site's
    influence on the training mix). Appends

    - ``domain_rank`` (int): the doc's 1-based rank within its group,
      ordered by ``quality_col`` DESC then ``id_col`` ASC, and
    - ``domain_kept`` (boolean): rank ≤ n_per_group.

    Distinct from :func:`stratified_sample` (hash-rank: uniform,
    quality-blind) — this is the QUALITY-ranked cap; like all ranking
    ops it must order on an exact-comparable column (integer length /
    integer-cents score), never raw floats, so the keep set is
    identical across engines and partitionings. One window per group;
    group cardinality = number of domains. At corpus scale a hot
    domain makes a hot partition — cap the damage by pre-filtering
    obvious junk before ranking, or rank within (domain, date) shards
    when a single domain exceeds executor memory."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return df.withColumn("domain_rank", F.row_number().over(w)).withColumn(
        "domain_kept", F.col("domain_rank") <= F.lit(int(n_per_group))
    )


# Conservative PII patterns, valid under BOTH Java regex (Spark) and
# RE2-class engines (DuckDB/Go) — no backreferences, no lookaround —
# so redaction counts stay oracle-checkable across engines.
PII_PATTERNS: dict[str, str] = {
    # local-part@domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # international-ish phone: optional +CC, 3 groups with -/./space
    # separators. \b after the optional '+' (a leading \b would reject
    # "+1-..." — space→'+' is not a word boundary) plus a trailing \b:
    # rejects digit runs glued to letters ("id1-234-5678", "...-9012x").
    # KNOWN LIMIT: a run preceded by a separator char ("id-345-678-9012")
    # still matches — '-'→digit IS a word boundary, and the RE2-safe
    # subset (no lookbehind) cannot express "not preceded by -" without
    # capturing the previous char, which breaks cross-engine replacement
    # (Spark $1 vs DuckDB \1 backref syntax in regexp_replace).
    "phone": r"\+?\b[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}([-. ][0-9]{2,4})?\b",
    # dotted-quad IPv4
    "ipv4": r"\b(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])){3}\b",
    # 13-16 digit card-shaped runs with optional -/space group separators
    "card": r"\b[0-9]{4}([- ]?[0-9]{4}){2}[- ]?[0-9]{1,4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
) -> DataFrame:
    """PII scrubbing for training corpora: replaces each matched span
    with ``<KIND>`` (e.g. ``<EMAIL>``) and appends per-kind match
    counts (``n_pii_<kind>`` bigint) for audit/filtering. Pure
    ``regexp_replace`` / ``regexp_extract_all`` column expressions —
    JVM codegen, no UDF, linear scan, trivially partitionable.

    Order is deterministic (kinds as given, default sorted): counts are
    measured on the ORIGINAL text per kind, then replacements applied
    sequentially — card/phone overlaps therefore count independently
    but redact left-to-right in kind order. The patterns avoid
    lookaround/backreferences so an engine-portable oracle can count
    the same spans."""
    kinds = sorted(PII_PATTERNS) if kinds is None else kinds
    t = F.col(text_col)
    out = df
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_pii_{kind}",
            F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long"),
        )
    redacted = t
    for kind in kinds:
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out.withColumn(f"{text_col}_redacted", redacted)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two dataset versions — the corpus-versioning
    primitive (what changed between crawl N and N+1 / before and after
    a cleaning pass): one row per key present in either side with
    ``change_type`` ∈ added | removed | changed | unchanged and
    ``changed_cols`` (sorted CSV of differing columns, '' otherwise —
    a scalar, so the output stays driver-comparator-safe).

    Shape: ONE full outer join on the keys (null-safe column compare;
    rows with NULL attrs still match themselves), no collect — at
    100 TB this is the standard co-partitioned fact⋈fact shuffle, and
    bucketing both snapshots by the keys removes even that. Inputs
    must be key-unique (enforce upstream with dropDuplicates(keys));
    compare_cols defaults to all shared non-key columns."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(keys))
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"_old_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        *[F.col(c).alias(f"_new_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, keys, "full_outer")
    diff_names = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diff_names) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *keys,
        change.alias("change_type"),
        F.when(
            change == "changed", F.array_join(diff_names, ",")
        ).otherwise(F.lit("")).alias("changed_cols"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Token-window chunking — the long-document → context-window
    splitter every pretraining/RAG ingest runs before tokenization:
    each document becomes ceil(max(n_tokens − overlap, 1) / stride)
    rows of ``chunk_tokens`` whitespace tokens (that count formula
    holds for stride ≤ chunk_tokens; for gap strides the start list is
    additionally capped at n_tokens, yielding fewer chunks), windows
    starting every ``stride`` tokens (stride < chunk_tokens ⇒
    overlapping windows; default stride = chunk_tokens ⇒ disjoint).
    Output grain:
    (id, chunk_idx, n_chunk_tokens, chunk_text); docs shorter than one
    window yield exactly one chunk.

    Spark-first shape: the token array is LET-BOUND once per row
    (``transform(array(tokens), t -> …)`` — the r6 winnowing lesson:
    a bare ``slice(tokens(text), …)`` inside a per-chunk lambda would
    re-run the whitespace split per window) and the window starts are
    a ``sequence(1, n, stride)``; total work is O(output tokens), pure
    codegen'd SQL expressions, no UDF, chunking never shuffles (the
    explode is pipelined into the scan)."""
    from .text import tokens

    if stride is None:
        stride = chunk_tokens
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    t = F.col(text_col)
    chunks = F.get(
        F.transform(
            F.array(tokens(t)),
            lambda tk: F.transform(
                F.sequence(
                    F.lit(1),
                    # last start: the stride step that still reaches a
                    # not-yet-covered token (≤ n for gap strides, i.e.
                    # stride > chunk); short docs (n <= chunk) collapse
                    # to the single start 1
                    F.greatest(
                        F.least(
                            F.size(tk) - (chunk_tokens - stride), F.size(tk)
                        ),
                        F.lit(1),
                    ),
                    F.lit(stride),
                ),
                lambda s: F.slice(tk, s, chunk_tokens),
            ),
        ),
        F.lit(0),
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "_ctoks"),
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size("_ctoks").cast("int").alias("n_chunk_tokens"),
        F.array_join("_ctoks", " ").alias("chunk_text"),
    )


def repeat_factor_expand(
    df: DataFrame,
    factor_col: str = "repeat_factor",
    epoch_col: str = "epoch_idx",
) -> DataFrame:
    """Epoch-style UPSAMPLING (the mixture-weights-to-rows step of a
    training run): emit each row ``factor`` times, tagged with
    ``epoch_col`` in [0, factor) — the Llama/Gopher data-mixing
    pattern where high-quality domains are repeated for multiple
    epochs while bulk crawl runs once. A factor ≤ 0 (or NULL) drops
    the row, so one integer column expresses keep/drop/repeat at once;
    non-integral factors belong upstream (combine an integer floor
    here with :func:`mixture_sample` on the fractional remainder).

    Pure explode(sequence) — no shuffle, no UDF; output size is
    sum(factor), i.e. exactly the token-budget accounting the caller
    already did to choose the factors. Deterministic: the same input
    always yields the same (row, epoch_idx) set, so a re-run of a
    training-data build is byte-identical."""
    f = F.col(factor_col).cast("long")
    epochs = F.when(f > 0, F.sequence(F.lit(0).cast("long"), f - 1))
    return df.withColumn(epoch_col, F.explode(epochs))


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    n_tokens_col: str = "n_tokens",
    group_col: str = "source",
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain TOKEN-budget fill — the other half of the mixing
    arithmetic :func:`domain_cap` starts (that op caps document COUNT;
    a training mix is specified in TOKENS): rank each group's docs by
    ``quality_col`` DESC (ties → ``id_col`` ASC), and keep the rank
    prefix whose RUNNING token total stays within ``budget_tokens``.
    Appends

    - ``budget_rank`` (int): 1-based quality rank within the group,
    - ``cum_tokens`` (long): inclusive running token total in rank
      order, and
    - ``budget_kept`` (boolean): cum_tokens ≤ budget_tokens.

    The prefix rule is deliberate: a small low-quality doc that would
    still "fit" after a big one overflowed is NOT back-filled —
    back-filling (knapsack) would make the keep set depend on
    solver details; the prefix rule is a pure window expression,
    deterministic across engines and partitionings (ranking on exact
    integers only, the domain_cap discipline). One window per group;
    same hot-domain caveat as domain_cap."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    cum = (
        F.sum(F.col(n_tokens_col).cast("long"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        df.withColumn("budget_rank", F.row_number().over(w))
        .withColumn("cum_tokens", cum)
        .withColumn(
            "budget_kept", F.col("cum_tokens") <= F.lit(int(budget_tokens))
        )
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: list[str] | None = None,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-ES): keep the ``n`` rows with the largest ``u^(1/w)`` where u is
    a per-row uniform — inclusion probability is ∝ weight with the
    exact without-replacement semantics (sample docs ∝ quality score,
    epochs ∝ mixture weight, …). Engine-portable determinism by the
    repo's integerize-first discipline: u comes from the 48-bit
    portable hash of (salt ‖ id), log2(u) in micro-bits is the
    INTERPOLATED ``log2_interp_micro(h+1) − 48·10⁶`` (published
    mantissa table + integer linear interpolation — no libm; the
    COARSE 8-bit table measurably biased the draw: ~1/256 of items
    share its top bin with identical numerators, and dividing equal
    numerators by w ranks that bin by weight alone — a 5:1 weight
    class won 1.4× its proportional share at n=1, measured; the fine
    form restores w/Σw inclusion within noise), and the ranking key
    is that int64 divided by the int64
    weight: ONE IEEE division of exactly-represented integers, which
    Spark, DuckDB, and Python round identically (the q43/zkey
    argument), with an id tie-break so no decision ever rides a float
    ulp. Rows with NULL or non-positive weight are excluded (a zero
    weight must never be sampled; A-ES is undefined there).

    ``by`` = per-group top-n (one row_number window — Spark's
    WindowGroupLimit pushes the top-k below the shuffle); ``by=None``
    = global top-n via orderBy+limit (TakeOrderedAndProject: per-
    partition heaps, no global sort). Deterministic for a (salt, id)
    pair ⇒ mergeable across reruns and partitionings; vary ``salt``
    for independent redraws. Returns the selected rows with a
    ``ws_rank`` column (1 = largest key). Weights are read as int64 —
    integerize fractional scores first (micro-units), keeping them
    < 2^53 so the int→double cast is exact."""
    from pyspark.sql.window import Window

    from ..functions.expressions import log2_interp_micro_sql

    h1 = portable_hash(
        F.concat_ws("␟", F.lit(salt), F.col(id_col).cast("string"))
    ) + F.lit(1)
    keyed = (
        df.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col).cast("long") > 0)
        )
        .withColumn("_ws_h1", h1)
        .withColumn(
            "_ws_key",
            (F.expr(log2_interp_micro_sql("_ws_h1")) - F.lit(48_000_000))
            .cast("double")
            / F.col(weight_col).cast("long").cast("double"),
        )
    )
    if by:
        w = Window.partitionBy(*by).orderBy(
            F.col("_ws_key").desc(), F.col(id_col).asc()
        )
        out = (
            keyed.withColumn("ws_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("ws_rank") <= int(n))
        )
    else:
        top = keyed.orderBy(F.col("_ws_key").desc(), F.col(id_col).asc()).limit(
            int(n)
        )
        # rank the n survivors (bounded frame — the single-partition
        # window touches only n rows)
        w = Window.orderBy(F.col("_ws_key").desc(), F.col(id_col).asc())
        out = top.withColumn("ws_rank", F.row_number().over(w).cast("long"))
    return out.drop("_ws_h1", "_ws_key")


def temperature_weights(
    df: DataFrame,
    weight_col: str,
    alpha: tuple[int, int],
    out_col: str = "w_temp_micro",
) -> DataFrame:
    """Temperature-scaled sampling weights w^α in integer micro-units —
    the multinomial temperature knob of multilingual/multi-domain
    mixture construction (α < 1 flattens toward uniform, α = 1 keeps
    proportions, α = 0 IS uniform). ``alpha`` is an integer rational
    (num, den), so the whole computation stays on int64: w^α =
    exp2_micro(log2_micro(w)·num DIV den) — both tables are published
    constants, every step is shift/div/lookup, and Spark, DuckDB, and
    Python agree bit-for-bit (the LOG2/EXP2 discipline). Deterministic
    quantization error is < ~0.7% relative (0.0056-bit log read ×
    one-sided 8-bit exp fraction) — a temperature knob, not an exact
    power.

    Domain: weights must be POSITIVE int64 with α·log2(w) ≤ 42 (output
    stays inside int64; e.g. token counts < 2^40 at α ≤ 1). The domain
    is ENFORCED at runtime (r13 ADVICE): a row whose scaled exponent
    exceeds the 42-bit exp2 envelope raises at evaluation time —
    mirroring exp2_micro_int's ValueError — instead of silently
    overflowing shiftleft into garbage micro-weights. Rows with
    NULL/non-positive weight get NULL. The output column feeds
    :func:`weighted_sample` directly (micro-units are < 2^53, so its
    exact int→double contract holds)."""
    from ..functions.expressions import exp2_micro_sql, log2_micro_sql

    import math as _math

    num, den = int(alpha[0]), int(alpha[1])
    if den <= 0 or num < 0:
        raise ValueError("alpha must be a non-negative rational (num, den>0)")
    # reduce, then bound: the scaled exponent l·num (l ≤ 63·10⁶) must
    # stay < 2^53 so the exact-multiple double division below cannot
    # round — an unreduced alpha like (5e9, 1e10) would otherwise
    # silently misfloor the exponent
    g = _math.gcd(num, den) or 1
    num, den = num // g, den // g
    if num > 10**8:
        raise ValueError(
            f"alpha numerator {num} (reduced) too large: l*num must stay"
            " under 2^53 for exact division"
        )
    tagged = df.withColumn(
        "_tw_w", F.when(F.col(weight_col).cast("long") > 0,
                        F.col(weight_col).cast("long"))
    ).withColumn(
        "_tw_l", F.expr(log2_micro_sql("_tw_w"))
    ).withColumn(
        "_tw_x", (F.col("_tw_l") * F.lit(num) - F.pmod(
            F.col("_tw_l") * F.lit(num), F.lit(den))) / F.lit(den)
    ).withColumn("_tw_x", F.col("_tw_x").cast("long"))
    # exp2_micro_sql shifts blindly (documented caller contract) — so
    # enforce the envelope HERE, per row, lazily inside the CASE: the
    # raising branch only evaluates when the exponent is actually out
    # of domain (CASE WHEN is lazy in both codegen and interpreted
    # eval), so in-domain frames never pay or trip it.
    tagged = tagged.withColumn(
        "_tw_x",
        F.when(
            F.col("_tw_x") > F.lit(42_000_000),
            F.expr(
                "assert_true(false, 'temperature_weights: alpha*log2(w)"
                " exceeds the 42-bit exp2 envelope')"
            ).cast("long"),
        ).otherwise(F.col("_tw_x")),
    )
    out = tagged.withColumn(out_col, F.expr(exp2_micro_sql("_tw_x")))
    return out.drop("_tw_w", "_tw_l", "_tw_x")


def dsir_features(
    df: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed n-gram featurization for importance resampling (DSIR,
    Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): unigrams and word-bigrams hashed into
    ``n_buckets`` buckets with the engine's PORTABLE hash (md5-prefix,
    so an oracle reproduces every bucket id exactly). Returns
    (id, bucket, cnt) at doc×bucket grain — the only thing that ever
    shuffles is (id, bucket-int, count); document text stays in the
    scan stage."""
    from ..operators.text import bigrams, tokens

    uni = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("_g"),
    )
    bi = df.select(
        F.col(id_col).alias("_id"),
        F.explode(bigrams(F.col(text_col))).alias("_g"),
    )
    return (
        uni.unionAll(bi)
        .select(
            "_id",
            F.pmod(portable_hash(F.col("_g")), F.lit(int(n_buckets))).alias(
                "bucket"
            ),
        )
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance log-weights, integer-exact: score every RAW doc
    by how much more likely its hashed-ngram features are under the
    TARGET corpus than under the raw corpus —
    ``w(doc) = Σ_b cnt_b · (log p_t(b) − log p_r(b))`` with add-one
    smoothing ``p(b) = (c_b + 1)/(N + B)``. High-weight docs are the
    ones importance resampling keeps when pointing a 100 TB crawl at a
    small high-quality target (the published method behind
    quality-targeted pretraining mixes; selection itself is the
    deterministic caller's move — rank on the weight with an id
    tie-break, or feed token_budget_sample).

    All logs are fixed-point ``log2_micro`` lookups
    (functions.expressions.LOG2_TABLE_MICRO — published integer
    constants, so the score is bit-identical in any engine): the
    per-bucket delta ``L(c_t+1) − L(c_r+1)`` is computed ON THE
    BUCKET TABLE (≤ n_buckets rows — the expensive generated-SQL log
    runs over thousands of rows, never the corpus), broadcast, and
    each doc folds ``Σ cnt·delta + n_features·const`` in pure int64
    multiply-adds, where ``const = L(N_r+B) − L(N_t+B)`` is a
    driver-side Python scalar from the SAME table.

    Returns (id, n_features, dsir_logweight_micro) — every raw doc
    appears (a doc sharing no bucket with the target still gets its
    smoothed score). Headroom: |delta| < 63·10⁶, so int64 is safe to
    ~10¹¹ features per doc.

    Scale: two feature passes (raw + target) each one hash-groupBy;
    the stats join is bucket-grain (≤ n_buckets rows, broadcast); no
    window, no collect beyond four scalars.

    STALENESS (r18, ADVICE r17): the feature frames and corpus totals
    memoize in fixed slots keyed on the SEMANTIC PLAN hash
    (curation.dsir_fr/dsir_ft/dsir_nr/dsir_nt) — the r14
    functions/cache.py contract. A caller whose input path's FILES
    were swapped underneath an identical plan (compaction, staging
    swap, versioned-table rewrite) must ``release()``/
    ``release_scalar()`` those slots first, or this op serves the
    pre-swap statistics."""
    from ..functions.cache import bounded_cache, bounded_scalar
    from ..functions.expressions import log2_micro_int, log2_micro_sql
    from .dedup import _substrate_partitions

    # r17: fr feeds THREE subplans (bucket stats, the N_r scalar, the
    # per-doc fold) and ft two — each reference re-ran the hashed-ngram
    # explode+groupBy uncached. Doc-keyed adaptive repartition before
    # the cache (the frozen-width rule) pre-satisfies the final
    # per-doc groupBy; the corpus-total scalars are memoized per plan.
    fr = bounded_cache(
        "curation.dsir_fr",
        dsir_features(raw, n_buckets, text_col, id_col).repartition(
            _substrate_partitions(raw), "_id"
        ),
    )
    ft = bounded_cache(
        "curation.dsir_ft",
        dsir_features(target, n_buckets, text_col, id_col).repartition(
            _substrate_partitions(target), "_id"
        ),
    )
    cr = fr.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("c_r"))
    ct = ft.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("c_t"))
    n_r = bounded_scalar(
        "curation.dsir_nr", fr, lambda: int(fr.agg(F.sum("cnt")).collect()[0][0] or 0)
    )
    n_t = bounded_scalar(
        "curation.dsir_nt", ft, lambda: int(ft.agg(F.sum("cnt")).collect()[0][0] or 0)
    )
    if n_r == 0 or n_t == 0:
        raise ValueError("dsir_logweights: empty raw or target corpus")
    const_micro = log2_micro_int(n_r + n_buckets) - log2_micro_int(
        n_t + n_buckets
    )
    delta = (
        cr.join(ct, "bucket", "full_outer")
        .select(
            "bucket",
            (F.coalesce("c_t", F.lit(0)) + F.lit(1)).alias("_t1"),
            (F.coalesce("c_r", F.lit(0)) + F.lit(1)).alias("_r1"),
        )
        .select(
            "bucket",
            F.expr(
                f"{log2_micro_sql('_t1')} - {log2_micro_sql('_r1')}"
            ).alias("delta_micro"),
        )
    )
    return (
        fr.join(F.broadcast(delta), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            (
                F.sum(F.col("cnt") * F.col("delta_micro"))
                + F.sum("cnt") * F.lit(const_micro)
            )
            .cast("long")
            .alias("dsir_logweight_micro"),
        )
        .select(
            F.col("_id").alias(id_col), "n_features", "dsir_logweight_micro"
        )
    )


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Population Stability Index between two dataset versions (or
    splits) over a categorical/bucketed column — THE standard
    production drift monitor, INTEGER-EXACT so both engines agree
    bit-for-bit: shares are integer ppm (clamped ≥ 1 ppm, the
    PSI-epsilon convention in integer form), logs go through the
    published interpolated log2 table (functions.expressions.
    log2_interp_micro — the repo's "libm only as published literals"
    rule), and each bucket's term is

        psi_term_micro = (q_ppm − p_ppm) · (log2µ(q_ppm) − log2µ(p_ppm))
                         DIV 10⁶          [micro-bits, always ≥ 0]

    Σ psi_term_micro is the PSI in micro-BITS (the conventional
    ln-based PSI is a fixed ln2 rescale — monotone, thresholds map
    1:1: the classic 0.1/0.25 warning/action levels are ~144k/360k
    µbits). Output grain: one row per bucket present in EITHER side
    (missing side counts 0 → clamped share), columns (bucket, n_old,
    n_new, p_ppm, q_ppm, psi_term_micro) — all comparator-safe.

    Scale shape: one grouped count per side (map-side partial), one
    bucket-keyed outer join at BUCKET grain (tiny), totals as two
    bounded 1-row scalars (plan literals on both engines). NULL is a
    bucket like any other."""
    total_old = old.count()
    total_new = new.count()
    if total_old == 0 or total_new == 0:
        raise ValueError("distribution_drift: both sides must be non-empty")
    o = old.groupBy(F.col(bucket_col).alias("_bo")).agg(
        F.count(F.lit(1)).cast("long").alias("n_old")
    )
    n = new.groupBy(F.col(bucket_col).alias("_bn")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    return psi_from_counts(o, n, total_old, total_new)


def psi_from_counts(
    o: DataFrame,
    n: DataFrame,
    total_old: int,
    total_new: int,
) -> DataFrame:
    """The counts→PSI core of :func:`distribution_drift`, factored out
    (r16) so the streaming drift monitor applies the IDENTICAL share
    and log arithmetic against a FROZEN baseline — one formula, two
    callers, no drift between streamed and batch results. ``o`` is a
    (_bo, n_old) bucket-count frame, ``n`` is (_bn, n_new); totals are
    bounded scalars (plan literals)."""
    from ..functions.expressions import log2_interp_micro_sql

    # NULL-SAFE outer merge: a name-based full-outer join matches keys
    # with plain equality, so a NULL bucket present on BOTH sides would
    # emit two half-rows instead of one merged row (found in the r15
    # self-review; groupBy had already made NULL a single group on each
    # side, the join then failed to marry them)
    shares = (
        o.join(n, F.col("_bo").eqNullSafe(F.col("_bn")), "full_outer")
        .select(
            F.coalesce("_bo", "_bn").alias("bucket"),
            F.coalesce("n_old", F.lit(0).cast("long")).alias("n_old"),
            F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
        )
        .select(
            "bucket",
            "n_old",
            "n_new",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"n_old * CAST(1000000 AS BIGINT) div {int(total_old)}"),
            ).alias("p_ppm"),
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"n_new * CAST(1000000 AS BIGINT) div {int(total_new)}"),
            ).alias("q_ppm"),
        )
    )
    lp = log2_interp_micro_sql("p_ppm", "spark")
    lq = log2_interp_micro_sql("q_ppm", "spark")
    return shares.select(
        "bucket",
        "n_old",
        "n_new",
        "p_ppm",
        "q_ppm",
        F.expr(
            f"CAST(((q_ppm - p_ppm) * (({lq}) - ({lp}))) div 1000000 AS BIGINT)"
        ).alias("psi_term_micro"),
    )


def numeric_bucket_expr(thresholds: list[int], value_sql: str) -> str:
    """Engine-portable SQL for the bucket index of a numeric value
    against integer ``thresholds``: Σ_j CAST(value > t_j AS INT) —
    0-based, strictly-greater, duplicates in the threshold list count
    separately (two equal order statistics mean an empty bucket
    between them, exactly like numpy.searchsorted on a tied edge).
    NULL values bucket to NULL (a bucket like any other downstream —
    distribution_drift merges NULL buckets null-safely). The same
    string runs on Spark and DuckDB; thresholds are inlined literals
    (the r8 rule: a 1-row threshold join plans as BNLJ)."""
    if not thresholds:
        return (
            f"CAST(CASE WHEN ({value_sql}) IS NULL THEN NULL ELSE 0 END"
            " AS BIGINT)"
        )
    terms = " + ".join(
        f"CAST(({value_sql}) > {int(t)} AS INT)" for t in thresholds
    )
    return f"CAST({terms} AS BIGINT)"


def distribution_drift_numeric(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    n_buckets: int = 8,
    k: int = 256,
    thresholds: list[int] | None = None,
) -> DataFrame:
    """PSI drift monitor for a NUMERIC column (VERDICT r15 #5) — the
    standard production use: bucket a numeric feature by quantile
    edges derived from the TRAIN (old) side, then run the integer PSI
    (:func:`distribution_drift`) over the bucket indices.

    Bucket edges come from text.portable_bucket_thresholds — integer
    rank-based order statistics of the portable bottom-``k`` hash
    sample of the old side's DISTINCT values — so BOTH engines derive
    identical integer edges (the q22 xthr pattern; an oracle
    re-derives them relationally). Buckets are 0-based counts of
    strictly-exceeded thresholds (:func:`numeric_bucket_expr`); a NULL
    value is the NULL bucket. ``thresholds`` overrides the derivation
    for callers that persist the edges as a model artifact (the
    serving-time shape: train once, monitor every refresh against the
    SAME edges).

    Output grain/columns = distribution_drift's, with the integer
    bucket index as the bucket column. Scale shape: one bounded ≤k
    driver sample (edges become plan literals), one grouped count per
    side, one bucket-grain outer join."""
    from .text import portable_bucket_thresholds

    if thresholds is None:
        thresholds = portable_bucket_thresholds(
            old.select(value_col), value_col, n_buckets, k
        )
    expr = numeric_bucket_expr(thresholds, value_col)
    return distribution_drift(
        old.select(F.expr(expr).alias("bucket")),
        new.select(F.expr(expr).alias("bucket")),
        "bucket",
    )


def distribution_drift_numeric_by_group(
    old: DataFrame,
    new: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 8,
    k: int = 256,
) -> DataFrame:
    """Per-GROUP numeric PSI — the per-language/per-domain form of
    :func:`distribution_drift_numeric` (the r12 per-lang tercile
    pattern applied to drift): every group gets its OWN train-side
    quantile edges (text.portable_bucket_thresholds_by_group — one
    distributed pass, group-grain threshold table, broadcast EQUI-join
    back on the group key), and PSI shares are computed within the
    group (per-group totals), so a language whose length distribution
    sits wholly above another's is monitored against ITS OWN train
    profile — global edges would blind the monitor exactly like global
    terciles would misbucket per-language perplexity.

    Output grain: (group, bucket) for every pair present on either
    side; columns (group_col, bucket, n_old, n_new, p_ppm, q_ppm,
    psi_term_micro). Σ psi_term_micro per group = that group's PSI in
    micro-bits. ONE-SIDED groups (no train rows, or no new rows) emit
    their counts with NULL shares and NULL psi terms — they are
    composition changes, not distribution drift; monitor them via the
    counts (and a group with no train rows has no edges, so its new
    rows bucket to 0). NULL groups are groups like any other
    (eqNullSafe joins throughout); NULL values bucket to NULL.

    Scale shape: threshold derivation is two group-keyed shuffles over
    the distinct-values substrate; bucketing is a broadcast equi-join
    (group-grain table); counts are map-side partials at (group,
    bucket) grain; totals at group grain. Integer-exact end to end —
    the division guards (CASE WHEN total > 0) keep ANSI mode safe."""
    from .text import portable_bucket_thresholds_by_group

    if n_buckets < 2:
        # r16 ADVICE: n_buckets=1 yields an empty threshold list, and
        # the generated bucket expression would be a SQL parse error at
        # runtime ('ELSE CAST( AS BIGINT)'); the scalar
        # numeric_bucket_expr guards this case — the by-group path must
        # too, and a 1-bucket PSI is meaningless anyway
        raise ValueError(
            f"distribution_drift_numeric_by_group needs n_buckets >= 2"
            f" (got {n_buckets})"
        )

    thr = portable_bucket_thresholds_by_group(
        old.select(group_col, value_col), group_col, value_col, n_buckets, k
    )
    tcols = [f"t{j}" for j in range(1, n_buckets)]
    thr_b = thr.select(
        F.col(group_col).alias("_tg"), *[F.col(c) for c in tcols]
    )

    terms = " + ".join(
        f"coalesce(CAST(({value_col}) > {c} AS INT), 0)" for c in tcols
    )
    bexpr = (
        f"CASE WHEN ({value_col}) IS NULL THEN NULL"
        f" ELSE CAST({terms} AS BIGINT) END"
    )

    def bucketize(df: DataFrame) -> DataFrame:
        return (
            df.join(
                F.broadcast(thr_b),
                F.col(group_col).eqNullSafe(F.col("_tg")),
                "left",
            )
            .select(
                F.col(group_col).alias("_g"),
                F.expr(bexpr).alias("bucket"),
            )
        )

    o = bucketize(old).groupBy(
        F.col("_g").alias("_go"), F.col("bucket").alias("_bo")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_old"))
    n = bucketize(new).groupBy(
        F.col("_g").alias("_gn"), F.col("bucket").alias("_bn")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    to = old.groupBy(F.col(group_col).alias("_gto")).agg(
        F.count(F.lit(1)).cast("long").alias("t_old")
    )
    tn = new.groupBy(F.col(group_col).alias("_gtn")).agg(
        F.count(F.lit(1)).cast("long").alias("t_new")
    )
    merged = (
        o.join(
            n,
            F.col("_go").eqNullSafe(F.col("_gn"))
            & F.col("_bo").eqNullSafe(F.col("_bn")),
            "full_outer",
        )
        .select(
            F.coalesce("_go", "_gn").alias("_g"),
            F.coalesce("_bo", "_bn").alias("bucket"),
            F.coalesce("n_old", F.lit(0).cast("long")).alias("n_old"),
            F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
        )
        .join(F.broadcast(to), F.col("_g").eqNullSafe(F.col("_gto")), "left")
        .join(F.broadcast(tn), F.col("_g").eqNullSafe(F.col("_gtn")), "left")
    )
    shares = merged.select(
        F.col("_g").alias(group_col),
        "bucket",
        "n_old",
        "n_new",
        F.expr(
            "CASE WHEN coalesce(t_old, CAST(0 AS BIGINT)) > 0 THEN"
            " greatest(CAST(1 AS BIGINT),"
            " n_old * CAST(1000000 AS BIGINT) div t_old) END"
        ).alias("p_ppm"),
        F.expr(
            "CASE WHEN coalesce(t_new, CAST(0 AS BIGINT)) > 0 THEN"
            " greatest(CAST(1 AS BIGINT),"
            " n_new * CAST(1000000 AS BIGINT) div t_new) END"
        ).alias("q_ppm"),
    )
    from ..functions.expressions import log2_interp_micro_sql

    lp = log2_interp_micro_sql("p_ppm", "spark")
    lq = log2_interp_micro_sql("q_ppm", "spark")
    return shares.select(
        group_col,
        "bucket",
        "n_old",
        "n_new",
        "p_ppm",
        "q_ppm",
        F.expr(
            f"CAST(((q_ppm - p_ppm) * (({lq}) - ({lp}))) div 1000000"
            " AS BIGINT)"
        ).alias("psi_term_micro"),
    )
