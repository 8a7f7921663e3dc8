"""Portable cardinality sketches.

`portable_hll` is a HyperLogLog (Flajolet et al. 2007, with the
small-range linear-counting correction) built ONLY from operations that
are bit-identical across engines: the md5-based 48-bit
``portable_hash``, integer register/rank extraction via binary-string
length, reciprocal powers of two from integer shifts, and a
precomputed ``ln(m/V)`` lookup table embedded as literals. The same
algorithm is expressible in DuckDB SQL (`hll_oracle_sql`), so an
approximate-distinct query can be oracle-verified value-for-value —
unlike engine-private HLL++ sketches (Spark `approx_count_distinct`),
whose estimates are not reproducible outside the engine.

Reference parity: the reference has no sketches (its distinct counts
are exact pandas `nunique` — containers/transformation/transform.py);
this is a scale-path extension (SURVEY.md §2.5 "beyond ref"). At
100 TB an exact COUNT(DISTINCT) shuffles every key; the HLL register
table is at most 2^p rows per group, partial-aggregated map-side (MAX
per register is commutative), so the shuffle stays bounded regardless
of input size.

Determinism (why every step is exact and order-independent):
- register rank rho ∈ [1, 48-p+1]: integer arithmetic on the hash.
- each harmonic-sum term is 1 / 2^rho — a power of two, exactly
  representable; a sum of ≤ 2^p such terms spans < 53 mantissa bits,
  so the double sum is EXACT, hence partition-order independent.
- the alpha constant and the multiply/divide chain use the same
  literal expression tree on both engines; IEEE basic ops are
  correctly rounded, hence bit-identical.
- the linear-counting branch needs ln(m/V): libm `ln` is NOT
  portable, so all 2^p possible values are precomputed in Python and
  embedded on both sides (Spark: `lit` doubles; DuckDB: exponent-form
  literals, which parse as DOUBLE and round-trip exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import portable_hash

__all__ = [
    "portable_hll", "hll_registers", "hll_estimate_from_registers",
    "hll_oracle_sql", "kmv_sketch", "kmv_jaccard", "kmv_merge",
    "kmv_estimate_from_sketch", "bloom_build", "bloom_probe", "HASH_BITS",
    "bottom_k_sample", "bottom_k_sample_merge", "sample_quantile",
    "cms_sketch", "cms_merge", "cms_estimate", "cms_oracle_sql",
]

HASH_BITS = 48  # portable_hash emits 12 hex chars


def _alpha(m: int) -> float:
    """Flajolet's bias correction (m >= 128 constant form)."""
    return 0.7213 / (1.0 + 1.079 / m)


def _ln_table(m: int) -> list[float]:
    """ln(m / V) for V = 1..m (V = zero-register count)."""
    return [math.log(m / v) for v in range(1, m + 1)]


def portable_hll(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 8,
    estimate_col: str = "approx_distinct",
    zeros_col: str = "n_zero_registers",
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate with linear-counting
    small-range correction. m = 2^p registers; standard error
    ~1.04/sqrt(m) (6.5% at p=8). Output: group_cols + estimate
    (double) + zero-register count (bigint).

    Physical plan: hash projection → groupBy(group, register)
    MAX(rank) (map-side partial; ≤ m rows per group reach the final
    shuffle) → groupBy(group) exact-double harmonic sum → literal
    arithmetic. No UDFs — fully codegen'd.
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_estimate_from_registers(
        regs, group_cols, p, estimate_col, zeros_col
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 8
) -> DataFrame:
    """The sketch STATE: (group..., _hll_reg, _hll_r) — one row per
    non-empty register. Registers merge by MAX, so two register tables
    (e.g. successive micro-batches, or per-partition partials) combine
    with union → groupBy MAX and lose nothing; this is what a
    streaming gold table persists (streaming/sketches.py)."""
    m = 1 << p
    rank_cap = HASH_BITS - p + 1  # rank when the suffix is all zeros
    h = portable_hash(F.col(value_col).cast("string"))
    # register = low p bits; rank = 1 + leading zeros of the (48-p)-bit
    # suffix, via binary-string length (bin() emits no leading zeros in
    # either engine; suffix == 0 → length 0 → rank_cap, also portable)
    return (
        df.select(
            *group_cols,
            (h % m).alias("_hll_reg"),
            (
                F.lit(rank_cap)
                - F.length(F.ltrim(F.bin(F.shiftright(h, p)), F.lit("0")))
            ).alias("_hll_rank"),
        )
        .groupBy(*group_cols, "_hll_reg")
        .agg(F.max("_hll_rank").alias("_hll_r"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    group_cols: list[str],
    p: int = 8,
    estimate_col: str = "approx_distinct",
    zeros_col: str = "n_zero_registers",
) -> DataFrame:
    """Estimate finishing pass over a register table (same math as
    portable_hll; split out so persisted/streamed registers can be
    read back and finished on demand)."""
    m = 1 << p
    per_group = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_hll_present"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), _hll_r)").cast("double")
        ).alias("_hll_hsum"),
    )
    zeros = (F.lit(m) - F.col("_hll_present")).cast("long")
    raw = F.lit(_alpha(m) * m * m) / (zeros.cast("double") + F.col("_hll_hsum"))
    # greatest(...,1): the zeros==0 branch never SELECTS this value,
    # but ANSI element_at must not even see an index of 0
    ln_lookup = F.element_at(
        F.array(*[F.lit(v) for v in _ln_table(m)]),
        F.greatest(zeros, F.lit(1)).cast("int"),
    )
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), F.lit(float(m)) * ln_lookup
    ).otherwise(raw)
    return per_group.select(
        *group_cols,
        corrected.alias(estimate_col),
        zeros.alias(zeros_col),
    )


def hll_oracle_sql(
    source_sql: str,
    group_exprs: dict[str, str],
    value_sql: str,
    p: int = 8,
    estimate_col: str = "approx_distinct",
    zeros_col: str = "n_zero_registers",
) -> str:
    """DuckDB SQL computing the SAME estimate bit-for-bit.

    source_sql: a table or subquery; group_exprs: output alias → SQL
    expression over the source; value_sql: the counted expression.
    """
    m = 1 << p
    rank_cap = HASH_BITS - p + 1
    g_out = ", ".join(group_exprs)
    g_def = ",\n               ".join(f"{sql} AS {alias}" for alias, sql in group_exprs.items())
    # exponent-form literals parse as DOUBLE (bare decimals would be
    # DECIMAL and lose the exact bit pattern via a second rounding)
    table = ", ".join(f"{v:.17e}" for v in _ln_table(m))
    alpha_m2 = f"{_alpha(m) * m * m:.17e}"
    return f"""
    WITH hll_h AS (
        SELECT {g_def},
               CAST(concat('0x', substr(md5(CAST({value_sql} AS VARCHAR)), 1, 12)) AS BIGINT) AS h
        FROM {source_sql}
    ),
    hll_regs AS (
        SELECT {g_out}, h % {m} AS reg,
               MAX({rank_cap} - length(ltrim(bin(h // {m}), '0'))) AS r
        FROM hll_h
        GROUP BY {g_out}, reg
    ),
    hll_g AS (
        SELECT {g_out},
               COUNT(*) AS present,
               SUM(1.0e0 / CAST((CAST(1 AS BIGINT) << r) AS DOUBLE)) AS hsum
        FROM hll_regs
        GROUP BY {g_out}
    )
    SELECT {g_out},
           CASE WHEN ({alpha_m2} / (CAST({m} - present AS DOUBLE) + hsum)) <= {2.5 * m:.17e}
                     AND {m} - present > 0
                THEN {float(m):.17e} * ([{table}])[greatest({m} - present, 1)]
                ELSE {alpha_m2} / (CAST({m} - present AS DOUBLE) + hsum)
           END AS {estimate_col},
           CAST({m} - present AS BIGINT) AS {zeros_col}
    FROM hll_g
    """


def _reject_float_value_col(df: DataFrame, value_col: str, op: str) -> None:
    """Hash-based sketches hash CAST(value AS STRING); float/double
    rendering DIFFERS between engines (Spark '1.0E-4' vs DuckDB
    '0.0001'), which would silently break the cross-engine determinism
    these sketches promise. Integer/string/date/decimal render
    identically; callers with float columns must integerize first
    (cents / quantize — the repo-wide float discipline)."""
    dt = dict(df.dtypes).get(value_col, "")
    if dt in ("float", "double"):
        raise ValueError(
            f"{op}: value column {value_col!r} is {dt}; float-to-string "
            "rendering is engine-specific, so the sketch would not be "
            "portable. Integerize first (e.g. cents: CAST(round(x*100) "
            "AS BIGINT), or a fixed-point quantization)."
        )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    estimate_col: str = "kmv_distinct",
    sketch_col: str = "kmv_hashes",
) -> DataFrame:
    """Per-group KMV (bottom-k / k-minimum-values) distinct sketch
    (Bar-Yossef et al. 2002): keep the k smallest 48-bit portable
    hashes; if fewer than k distinct values exist the count is exact,
    otherwise estimate (k-1) · 2^48 / h_k. Relative error
    ~1/sqrt(k-2). Unlike HLL the sketch supports set INTERSECTION
    estimates (Jaccard of two sketches' bottom-k unions), which is why
    both live in this module.

    Deterministic everywhere: hashes are distinct within a group, so
    the bottom-k set and h_k are order/partition independent; the
    estimate is a single int→double division (exact inputs, correctly
    rounded IEEE divide). Scale shape: distinct substrate → per-group
    TOP-K by hash (window over the group's hash order, rows capped at
    k per group post-filter) + one exact distinct count for the
    small-set fallback; the sketch that leaves the shuffle is ≤ k
    hashes per group.
    """
    from pyspark.sql import Window

    _reject_float_value_col(df, value_col, "kmv_sketch")
    h = portable_hash(F.col(value_col).cast("string"))
    sub = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    bottom = (
        sub.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.sort_array(F.collect_list("_h")).alias(sketch_col),
            F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_hk"),
        )
    )
    # < k distinct: the bottom-k IS the full distinct set, so
    # size(sketch) is the exact count -- no second full aggregation
    # over the substrate is needed for the small-set fallback.
    est = F.when(
        F.col("_hk").isNull(), F.size(F.col(sketch_col)).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * (1 << HASH_BITS))) / F.col("_hk").cast("double")
    )
    return bottom.select(*group_cols, est.alias(estimate_col), F.col(sketch_col))


def kmv_jaccard(sketch_a, sketch_b, k: int = 64):
    """Jaccard estimate from two KMV hash arrays (same k): take the k
    smallest of the union, count how many appear in both. Plain column
    expressions — usable after joining two sketch tables."""
    union_k = F.slice(F.array_sort(F.array_union(sketch_a, sketch_b)), 1, k)
    inter = F.size(F.array_intersect(union_k, F.array_intersect(sketch_a, sketch_b)))
    return inter.cast("double") / F.size(union_k).cast("double")


def kmv_merge(sketch_a, sketch_b, k: int = 64):
    """Merged KMV sketch: bottom-k of the union of two sketches' hash
    arrays. LOSSLESS for union cardinality: each input sketch holds its
    set's true bottom-k distinct hashes, so the union's true bottom-k
    is a subset of the concatenation — merge(sketch(A), sketch(B)) ==
    sketch(A ∪ B) exactly (the property the scale probe pins). Plain
    column expression; associative and commutative, so sketches merge
    across batches/streams/partitions in any order."""
    return F.slice(F.array_sort(F.array_union(sketch_a, sketch_b)), 1, k)


def kmv_estimate_from_sketch(sketch, k: int = 64):
    """Distinct estimate from a (possibly merged) KMV hash array: exact
    size(sketch) when the set had < k distinct values, else
    (k-1)·2^48 / h_k — the same formula kmv_sketch emits, usable on
    kmv_merge output."""
    hk = F.element_at(sketch, k)
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(
        F.lit(float((k - 1) * (1 << HASH_BITS))) / hk.cast("double")
    )


# --- Bloom filter (membership; the bloom-join pre-filter) -------------

BLOOM_K = 4  # hash functions per key (affine transforms of one md5)

# odd multipliers/offsets for the k affine re-hashes (splitmix-style
# constants; any fixed odd values work — these stay engine-portable
# because the arithmetic is pure int64 with an explicit mod)
_BLOOM_COEF = [
    (0x9E3779B97F4A7C15 & 0x7FFFFFFF, 0x7F4A7C15),
    (0xBF58476D1CE4E5B9 & 0x7FFFFFFF, 0x1CE4E5B9),
    (0x94D049BB133111EB & 0x7FFFFFFF, 0x133111EB),
    (0xD6E8FEB86659FD93 & 0x7FFFFFFF, 0x6659FD93),
]


def _bloom_positions(value, m_bits: int):
    """k bit positions for a value: affine transforms of the 48-bit
    portable hash, reduced mod a Mersenne prime BEFORE the multiply so
    every product stays inside int64 (ANSI-overflow safe) — the same
    discipline as the MinHash transforms."""
    p = (1 << 31) - 1  # h%p (31 bits) x a (31 bits) stays inside int64
    h = portable_hash(value.cast("string"))
    return [
        (((h % p) * a + b) % p) % m_bits for a, b in _BLOOM_COEF[:BLOOM_K]
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """Build a SPARSE Bloom filter over a column: rows (word_idx,
    bits) where bits is the int64 OR of all hash bits landing in that
    64-bit word. bit_or is commutative/idempotent, so the filter is
    deterministic under any partitioning and mergeable across
    batches/streams (union then re-OR). Size: ≤ m_bits/64 rows — a
    broadcastable build side regardless of input cardinality.

    This is the portable twin of the engine's runtime bloom join
    pruning (spark.sql.optimizer.runtime.bloomFilter.*): build on the
    small/filtering side, semi-join probe on the big side BEFORE the
    real join, false-positive rate (1-e^{-kn/m})^k.
    """
    pos = _bloom_positions(F.col(value_col), m_bits)
    exploded = df.select(
        F.explode(F.array(*[p.cast("long") for p in pos])).alias("_pos")
    )
    return (
        exploded.select(
            F.shiftright(F.col("_pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias("_m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    flag_col: str = "bloom_maybe",
) -> DataFrame:
    """Membership probe: a row passes iff ALL k of its bits are set.
    The sparse filter is broadcast and probed via k word lookups
    (explode on the PROBE key's k positions → join on word_idx →
    count matched bits) — no full-bitmap materialization per row."""
    # Row multiplicity is preserved: each probe row is tagged with a
    # unique id before the explode and regrouped on that id, so
    # duplicate probe rows each get their own flag (grouping on the
    # value columns alone would collapse n identical rows into one
    # group whose bit-hit sum is n*k, flagging a present key as
    # absent - and would silently drop rows in the bloom-join
    # pre-filter use where the probe side legitimately repeats keys).
    pos = _bloom_positions(F.col(value_col), m_bits)
    with_pos = (
        df.withColumn("_row_id", F.monotonically_increasing_id())
        .withColumn("_pos", F.explode(F.array(*[p.cast("long") for p in pos])))
        .select(
            "*",
            F.shiftright(F.col("_pos"), 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))").alias("_m"),
        )
    )
    hits = (
        with_pos.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "_hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m")) != 0)
            .cast("int"),
        )
        .groupBy("_row_id", *df.columns)
        .agg((F.sum("_hit") == BLOOM_K).alias(flag_col))
        .drop("_row_id")
    )
    return hits


# --- Bottom-k value sample (deterministic mergeable uniform sample) ---


def bottom_k_sample(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
    sample_col: str = "sample_values",
) -> DataFrame:
    """Per-group deterministic uniform sample: the k DISTINCT values
    whose portable hashes are smallest. The hash order is a fixed
    pseudo-random permutation of the value domain, so the bottom-k is
    (a) a uniform sample of the distinct values, (b) identical under
    any partitioning/engine (same md5 arithmetic as every other
    sketch here), and (c) MERGEABLE: the bottom-k of a union is
    contained in the union of the two bottom-k sets — merge via
    ``bottom_k_sample_merge`` is lossless, the same property as
    kmv_merge (the two sketches differ only in carrying the value
    next to its hash). The KMV distinct estimate comes free from the
    same rows; this is the VALUE-carrying twin for quantile/profile
    estimation over groups too large to sort.

    Output: group_cols + sample_col = array<struct<h,v>> sorted by
    hash (the canonical mergeable form); use ``sample_quantile`` for
    estimates. Scale shape: distinct substrate → per-group top-k by
    hash — ≤ k (hash, value) pairs per group leave the shuffle.
    """
    from pyspark.sql import Window

    _reject_float_value_col(df, value_col, "bottom_k_sample")
    sub = df.select(*group_cols, F.col(value_col).alias("_v")).distinct().withColumn(
        "_h", portable_hash(F.col("_v").cast("string"))
    )
    # value tie-break: two DISTINCT values can (rarely) share a 48-bit
    # hash; rank on (hash, value) so the bottom-k is deterministic and
    # oracle-reproducible even through a collision
    w = Window.partitionBy(*group_cols).orderBy("_h", "_v")
    return (
        sub.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_h").alias("h"), F.col("_v").alias("v")))
            ).alias(sample_col)
        )
    )


def bottom_k_sample_merge(sample_a, sample_b, k: int = 256):
    """Merged bottom-k sample: k hash-smallest entries of the union of
    two sample arrays. Lossless for the union's bottom-k (each input
    holds its set's true bottom-k), associative, commutative — batches
    and streams merge in any order."""
    return F.slice(F.array_sort(F.array_union(sample_a, sample_b)), 1, k)


def sample_quantile(sample, q: float):
    """Quantile estimate from a bottom-k sample array: the value at
    rank ceil(q·n) of the sample's VALUES (the hash order is unrelated
    to the value order, so the sample is uniform over distinct values
    and the estimate converges at ~1/sqrt(k)). Deterministic: exact
    rank selection on the deterministic sample — no interpolation, so
    the result is always an actual data value, hashable cross-engine."""
    vals = F.array_sort(F.transform(sample, lambda s: s["v"]))
    idx = F.greatest(
        F.lit(1), F.ceil(F.size(vals).cast("double") * F.lit(float(q))).cast("int")
    )
    return F.element_at(vals, idx)


# --- Count-Min sketch (frequency estimation / heavy hitters) ----------

CMS_DEPTH = 4  # reuses the Bloom affine family — one md5, d re-hashes


def _cms_cols(value, width: int):
    """Column index per depth row: the same reduce-mod-P-then-affine
    discipline as _bloom_positions (int64-safe under ANSI)."""
    p = (1 << 31) - 1
    h = portable_hash(value.cast("string"))
    return [
        (((h % p) * a + b) % p) % width for a, b in _BLOOM_COEF[:CMS_DEPTH]
    ]


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: int = 256,
) -> DataFrame:
    """Per-group Count-Min sketch (Cormode & Muthukrishnan 2005) in
    SPARSE relational form: rows (group_cols..., cms_d, cms_w, cms_cnt)
    — only touched cells exist, and a group's state is bounded by
    depth × width rows no matter how many events flowed. Point
    frequency estimate = MIN over the d cells a value hashes to; always
    an OVERestimate, within εN (ε = e/width) with prob 1 − e^−depth.

    Mergeable: cells are counts, so two sketches merge by summing
    matching (d, w) cells (``cms_merge``) — associative, commutative,
    streamable (the same contract as the HLL register store). Portable:
    hashing is the md5 affine family shared with bloom_build, so an
    engine-independent oracle can reproduce the cells bit-for-bit.
    Scale shape: one wide aggregation, map-side partial (SUM), shuffle
    bounded by groups × depth × width."""
    _reject_float_value_col(df, value_col, "cms_sketch")
    # NULL values are NOT counted: md5(NULL) null-propagates into null
    # cell coordinates whose join semantics then diverge between
    # engines — drop them here so the contract is explicit (same rule
    # as the Bloom/KMV hashing, made visible)
    df = df.filter(F.col(value_col).isNotNull())
    cols = _cms_cols(F.col(value_col), width)
    exploded = df.select(
        *group_cols,
        F.posexplode(F.array(*[c.cast("long") for c in cols])).alias("cms_d", "cms_w"),
    )
    return (
        exploded.groupBy(*group_cols, "cms_d", "cms_w")
        .agg(F.count("*").alias("cms_cnt"))
    )


def cms_merge(sketch_a: DataFrame, sketch_b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merged CMS: element-wise sum of matching cells (missing cell =
    0). Exact: count(A ∪ B) per cell == count(A) + count(B)."""
    return (
        sketch_a.unionByName(sketch_b)
        .groupBy(*group_cols, "cms_d", "cms_w")
        .agg(F.sum("cms_cnt").alias("cms_cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    group_cols: list[str],
    value_col: str,
    width: int = 256,
    estimate_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for (group, value) query rows: each
    query explodes to its depth cells (tiny side), equi-joins the
    sparse sketch on (group, d, w) — broadcastable when the query set
    is small — and takes MIN across depths; a missing cell means no
    colliding value ever hashed there, so the true count is 0 and the
    min short-circuits via coalesce. Estimates are integers (exact
    cell sums), so ranking heavy hitters on them is deterministic."""
    _reject_float_value_col(queries, value_col, "cms_estimate")
    cols = _cms_cols(F.col(value_col), width)
    q = queries.select(
        *group_cols,
        F.col(value_col),
        F.posexplode(F.array(*[c.cast("long") for c in cols])).alias("cms_d", "cms_w"),
    )
    # the sketch side is ≤ depth×width rows per group BY CONTRACT —
    # broadcast it so the probe never plans a sort-merge shuffle
    joined = q.join(
        F.broadcast(sketch), [*group_cols, "cms_d", "cms_w"], "left"
    ).withColumn("_cell", F.coalesce(F.col("cms_cnt"), F.lit(0)))
    return (
        joined.groupBy(*group_cols, value_col)
        .agg(F.min("_cell").cast("long").alias(estimate_col))
    )


def cms_oracle_sql(
    source_sql: str,
    value_sql: str,
    width: int = 256,
    estimate_col: str = "cms_est",
) -> str:
    """DuckDB CTE fragment reproducing the global (group-less) CMS
    cells AND per-distinct-value estimates BIT-FOR-BIT: the hash is the
    shared md5 affine family (reduce mod P=2^31−1 BEFORE the multiply,
    products ≤ 2^62 — the int64-safe discipline every sketch here
    uses), cells are exact integer counts, the estimate is an integer
    MIN. Emits CTEs ``cms_h / cms_cells / cms_q / cms_est``; the caller
    composes them into its WITH chain and selects from ``cms_est``
    (columns: v = the value expression, {estimate_col})."""
    p = (1 << 31) - 1
    coef = ", ".join(
        f"({d}, {a}, {b})" for d, (a, b) in enumerate(_BLOOM_COEF[:CMS_DEPTH])
    )
    h_expr = (
        f"CAST(concat('0x', substr(md5(CAST({value_sql} AS VARCHAR)), 1, 12)) AS BIGINT)"
    )
    return f"""
    cms_h AS (SELECT {h_expr} AS h FROM {source_sql}
              WHERE {value_sql} IS NOT NULL),
    cms_cells AS (
        SELECT d, ((h % {p}) * a + b) % {p} % {width} AS w,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cms_h CROSS JOIN (VALUES {coef}) AS coef(d, a, b)
        GROUP BY 1, 2
    ),
    cms_q AS (
        SELECT v, d, ((h % {p}) * a + b) % {p} % {width} AS w
        FROM (SELECT DISTINCT {value_sql} AS v, {h_expr} AS h FROM {source_sql}
              WHERE {value_sql} IS NOT NULL)
        CROSS JOIN (VALUES {coef}) AS coef(d, a, b)
    ),
    cms_est AS (
        SELECT v, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS {estimate_col}
        FROM cms_q LEFT JOIN cms_cells USING (d, w)
        GROUP BY v
    )"""
