"""Similarity search over embedding columns (``embeddings`` table:
vec_id bigint, embedding array<float>, label int).

- brute-force cosine top-k: the exactness baseline. The query vector is
  broadcast (a 1-row dim table); similarity is a JVM-side
  ``aggregate(zip_with(...))`` expression — no Python in the loop.
  At 100 TB this is a single scan + per-partition top-k (window or
  orderBy+limit both reduce map-side before the final single-reducer
  merge of k rows per partition).
- LSH-bucketed ANN (random hyperplanes): sign-bit sketch over fixed
  pseudo-random planes → candidates share a bucket → exact cosine only
  within buckets. The scale path: the cross product never happens.
- pairwise near-duplicates: blocked self-join (by LSH bucket) +
  cosine ≥ threshold.

The hyperplanes are generated from a fixed seed with a splitmix-style
integer mix of (plane, dim) — deterministic, no stored model artifact,
reproducible on any engine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import cosine, dot, norm  # noqa: F401  (public API)


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k of ``query_df`` (1 row: id_col, vec_col)
    against every row of ``df``. Deterministic tie-break on id.

    Physical plan: broadcast-nested-loop of a 1-row build side (i.e. a
    map-side constant), then global top-k. The window over a constant
    partition reduces per-partition before the final merge."""
    # the query norm is computed ONCE in the 1-row broadcast frame (not
    # per corpus row); dot/(norm(v)·qnrm) is bit-identical to cosine()
    q = F.broadcast(
        query_df.select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            norm(F.col(vec_col)).alias("_qnrm"),
        )
    )
    scored = (
        df.crossJoin(q)
        .filter(F.col(id_col) != F.col("_qid"))
        .select(
            F.col("_qid").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            (
                dot(F.col(vec_col), F.col("_qvec"))
                / (norm(F.col(vec_col)) * F.col("_qnrm"))
            ).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id")).limit(k)


def _mix(i: int, j: int) -> float:
    """Deterministic pseudo-random in [-1, 1) from integers (i, j) —
    splitmix64-style finalizer, reproducible anywhere."""
    x = (i * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) % (1 << 64)
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) % (1 << 64)
    x ^= x >> 31
    return (x % (1 << 53)) / float(1 << 52) - 1.0


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    return [[_mix(p, d) for d in range(dim)] for p in range(n_planes)]


# --- integer-exact sign-random-projection path (oracle-matched q29) ---

QUANT = 1 << 20  # power-of-two scale: x * 2^20 is a LOSSLESS double op

# plane-family seed: offsets the _mix stream. 16 was selected by recall
# sweep over the fixed synthetic corpora (9/10 top-10 recall at Hamming≤2
# on sf0.001/0.01/0.1 alike) — the same "pick good hash constants once"
# practice as MinHash coefficients; any fixed value stays deterministic.
PLANE_SEED = 16


def hyperplanes_int(n_planes: int, dim: int) -> list[list[int]]:
    """±1 sign-random-projection planes (Charikar 2002): for sign-bit
    LSH only the plane's sign pattern matters, and ±1 entries keep the
    projection an INTEGER dot product — exact, order-independent, and
    reproducible in any engine (unlike a float dot, whose 1-ulp
    accumulation differences can flip a near-zero sign bit)."""
    return [
        [1 if _mix(p + PLANE_SEED, d) >= 0.0 else -1 for d in range(dim)]
        for p in range(n_planes)
    ]


def quantize_vec(vec: Column) -> Column:
    """array<float> → array<bigint> via floor(x · 2^20). The multiply
    is exact (power of two) and floor has no round-half midpoint
    ambiguity, so both engines produce identical integers."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long")
    )


def lsh_bucket_int(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-bit bucket id over quantized integer projections: bit p set
    iff Σ_i floor(v_i·2^20)·s_pi > 0 — pure int64 arithmetic (|terms|
    ≤ 2^21·dim, far under overflow)."""
    qv = quantize_vec(vec)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                qv,
                F.array(*[F.lit(int(w)).cast("long") for w in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_bucket_int_expr(planes: list[list[int]], vec_col: str) -> Column:
    """:func:`lsh_bucket_int` as ONE generated Spark-SQL string — the
    r10 ivf_assign pattern, applied here after an r17 profile: the
    Column-tree form costs ~n_planes·dim py4j round trips to build
    (~2.5 s at 4×64 — plan CONSTRUCTION, not execution, dominated the
    gated q29), where a generated string is a single F.expr call. The
    quantized vector is let-bound via the transform(array(x), v -> …)
    idiom so it is computed once per row, not once per plane; all
    arithmetic is the same int64 chain, so bucket ids are
    bit-identical to the Column form (property-pinned)."""
    # Backticks in the column name are doubled (Spark's quoting rule) —
    # the generated string must accept any name the Column form does
    # (r18, ADVICE r17)
    quoted = vec_col.replace("`", "``")
    qv = (
        f"transform(`{quoted}`, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * {float(QUANT)!r}D) AS BIGINT))"
    )
    terms = []
    for p, plane in enumerate(planes):
        ws = ", ".join(f"{int(w)}L" for w in plane)
        terms.append(
            f"(CASE WHEN aggregate(zip_with(qv, array({ws}),"
            " (a, b) -> a * b), 0L, (acc, v) -> acc + v) > 0"
            f" THEN {2 ** p}L ELSE 0L END)"
        )
    body = " + ".join(terms)
    return F.expr(
        f"element_at(transform(array({qv}), qv -> {body}), 1)"
    )


def lsh_bucket_int_sql(planes: list[list[int]], qv_expr: str = "qv") -> str:
    """DuckDB SQL computing the SAME bucket id from a quantized
    BIGINT[] column expression (see quantize_vec_sql)."""
    terms = []
    for p, plane in enumerate(planes):
        s = ", ".join(str(int(w)) for w in plane)
        terms.append(
            f"(CASE WHEN list_sum(list_transform({qv_expr}, (x, i) -> x * ([{s}])[i])) > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
        )
    return " + ".join(terms)


def quantize_vec_sql(vec_expr: str = "embedding") -> str:
    return (
        f"list_transform({vec_expr}, "
        f"x -> CAST(floor(CAST(x AS DOUBLE) * {float(QUANT)!r}) AS BIGINT))"
    )


def probe_masks(n_planes: int, probe_hamming: int) -> list[int]:
    """Multiprobe mask set: all signatures within the given Hamming
    radius of the query's (0 = exact bucket only). Any radius up to
    n_planes is honored (radius r contributes C(n_planes, r) masks —
    at r = n_planes this enumerates every bucket, i.e. exact search)."""
    if probe_hamming < 0:
        raise ValueError(f"probe_hamming must be >= 0, got {probe_hamming}")
    from itertools import combinations

    masks = []
    for r in range(min(probe_hamming, n_planes) + 1):
        for bits in combinations(range(n_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p set iff vec · plane_p > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d > 0, F.lit(2**p).cast("long")).otherwise(0)
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: candidates = rows in the query's hyperplane bucket,
    exact cosine within. ``probe_hamming=1`` is the recall knob
    (multiprobe LSH): the query side also probes every bucket whose
    sign-bit signature differs in one plane — the buckets a borderline
    vector most likely fell into — multiplying candidates by ≤n_planes+1
    while the probe stays a bucket equi-join (the probe set explodes on
    the TINY broadcast query side, never on the corpus). At scale the
    bucket column is computed once at ingest and the probe is a
    partition-pruned equi-join."""
    planes = hyperplanes_int(n_planes, dim)
    # r17 (the r7/r10 expression-cost class, now with a profile): the
    # bucket expression is a ~n_planes·dim-literal tree costing real
    # py4j time to BUILD, and the probe list used to embed ONE COPY OF
    # IT PER HAMMING MASK (11 copies at n_planes=4, r=2) — plan
    # construction, not execution, was the dominant cost of the whole
    # operator (measured 3.3 s of gated q29's 5.9 s sim wall; 0.9 s
    # after). Build the tree ONCE, bucket both sides with the same
    # unresolved Column, and let the probe ring XOR a column REFERENCE
    # to the computed signature — CollapseProject leaves a non-cheap
    # attribute referenced more than once un-inlined, so the analyzed
    # and optimized plans carry one bucket tree per side.
    bkt_expr = lsh_bucket_int_expr(planes, vec_col)
    bucketed = df.withColumn("_bkt", bkt_expr)
    masks = probe_masks(n_planes, probe_hamming)
    qb = F.broadcast(
        query_df.select(
            F.col(id_col).alias("_qid"),
            F.col(vec_col).alias("_qvec"),
            norm(F.col(vec_col)).alias("_qnrm"),
            bkt_expr.alias("_qsig"),
        ).select(
            "_qid",
            "_qvec",
            "_qnrm",
            F.explode(
                F.array(
                    *[F.col("_qsig").bitwiseXOR(F.lit(m)) for m in masks]
                )
            ).alias("_bkt"),
        )
    )
    # no dedup needed: probe bucket ids are distinct XORs, and a corpus
    # row lives in exactly one bucket — each (row, query) pairs at most once
    cand = bucketed.join(qb, "_bkt").filter(F.col(id_col) != F.col("_qid"))
    # round BEFORE ranking: exact-cosine re-rank values are then
    # ulp-stable across engines/partitionings (same rule as q27); query
    # norm rides the broadcast frame, computed once
    scored = cand.select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col(vec_col), F.col("_qvec"))
            / (norm(F.col(vec_col)) * F.col("_qnrm")),
            6,
        ).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id")).limit(k)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_hamming: int = 0,
    band_tables: list[list[list[int]]] | None = None,
) -> DataFrame:
    """All near-duplicate candidate pairs within LSH Hamming radius
    ``probe_hamming`` whose round-6 cosine ≥ threshold — blocked by
    integer-exact SRP buckets (the q29 recipe: ±1 planes over
    floor-quantized vectors), so the candidate set is deterministic and
    derivable bit-for-bit in any engine.

    ``band_tables`` (optional, :func:`banded_tables`): appends
    ``n_band_tables_agree`` — how many multi-table sign-LSH tables the
    pair fully agrees on (the OR-of-ANDs collision count that decides
    candidacy in :func:`embedding_near_dups_banded`). Computed from the
    pair's vectors AFTER the threshold filter, so the 32-plane bucket
    arithmetic runs on result rows only, never the corpus.

    Plan shape (the 100 TB path): one side explodes into its bucket's
    Hamming-≤r mask ring, the pair join is an EQUI-join on the probed
    bucket id — never a non-equi self-join (no BroadcastNestedLoop /
    cartesian). A qualifying pair's buckets differ by exactly one mask,
    so each pair is emitted once — no post-dedup shuffle. Exact cosine
    runs only inside candidates; rounding to 6 decimals BEFORE the
    threshold keeps the float order-dependence out of the decision.

    Parameterization: at production near-dup thresholds (τ ≥ 0.9,
    per-plane agreement p = 1−θ/π ≥ 0.86) use many planes (16+) and a
    small ring — the candidate ratio collapses exponentially. At
    moderate τ on near-uniform vectors (this testdata's regime) the
    candidate ratio is bounded by |ring|/2^n_planes of pair space; the
    blocking still removes the quadratic tail but recall needs the
    ring (pinned in tests against the all-pairs baseline)."""
    planes = hyperplanes_int(n_planes, dim)
    # norm precomputed ONCE per vector and carried through the join:
    # dot/(na*nb) is bit-identical to cosine()'s inline dot/(norm*norm)
    # (norm is a pure function of the row's array) but drops 2/3 of the
    # per-pair arithmetic — the candidate-scoring hot loop
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_nrm"),
        lsh_bucket_int_expr(planes, vec_col).alias("_bkt"),
    )
    masks = probe_masks(n_planes, probe_hamming)
    a = b.select(
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"),
        F.explode(
            F.array(*[F.col("_bkt").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("_pbkt"),
    )
    c = b.select(
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
        F.col("_bkt").alias("_pbkt"),
    )
    scored = (
        a.join(c, "_pbkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cosine_sim"),
            *(["_va", "_vb"] if band_tables is not None else []),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    if band_tables is None:
        return scored
    agree = F.aggregate(
        F.zip_with(
            band_buckets_expr(band_tables, "_va"),
            band_buckets_expr(band_tables, "_vb"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return scored.select(
        "id_a", "id_b", "cosine_sim", agree.cast("int").alias("n_band_tables_agree")
    )


def banded_tables(
    n_tables: int = 16, band_planes: int = 16, dim: int = 64
) -> list[list[list[int]]]:
    """The multi-table sign-LSH plane family (±1 ints): table t's
    planes extend the same deterministic _mix stream as
    hyperplanes_int (table 0 IS hyperplanes_int's family); the 1009
    stride keeps table seed ranges disjoint for any band_planes ≤
    1009. Published constants — any engine re-derives the buckets."""
    return [
        [
            [1 if _mix(t * 1009 + p_ + PLANE_SEED, d) >= 0.0 else -1 for d in range(dim)]
            for p_ in range(band_planes)
        ]
        for t in range(n_tables)
    ]


def band_buckets_expr(tables: list[list[list[int]]], vec_expr: str) -> Column:
    """array<bigint> of per-TABLE sign-LSH bucket ids for a vector
    column — one generated SQL expression (single py4j call; the
    pq_adc_expr lesson) with the quantized vector LET-BOUND via
    transform-over-1-element-array, so each row quantizes once for all
    tables. Bit-for-bit the per-table :func:`lsh_bucket_int` value
    (integer dot signs over floor-quantized vectors)."""
    qv_sql = (
        f"transform({vec_expr}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {float(QUANT)!r}) AS BIGINT))"
    )
    buckets = []
    for planes in tables:
        terms = []
        for p, plane in enumerate(planes):
            w = ",".join(str(int(x)) for x in plane)
            terms.append(
                f"(CASE WHEN aggregate(zip_with(qv, array({w}), "
                f"(a, b) -> a * b), CAST(0 AS BIGINT), (s, v) -> s + v) > 0 "
                f"THEN CAST({2 ** p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        buckets.append(" + ".join(terms))
    return F.expr(
        f"element_at(transform(array({qv_sql}), qv -> "
        f"array({','.join(buckets)})), 1)"
    )


def embedding_near_dups_banded(
    df: DataFrame,
    threshold: float = 0.9,
    n_tables: int = 16,
    band_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via MULTI-TABLE sign-LSH (the classic OR-of-ANDs
    banding, same structure as MinHash LSH in dedup.py): L independent
    tables of b planes each; a pair is a candidate iff it agrees on ALL
    b bits of SOME table. Recall = 1−(1−p^b)^L for per-plane agreement
    p = 1−θ/π; random-pair collision ratio ≈ L·2^−b — both knobs are
    independent, unlike the single-table Hamming ring where widening the
    ring for recall also widens the random-collision set.

    At production thresholds (τ ≥ 0.9 ⇒ p ≥ 0.86) the defaults give
    ~0.93 recall with ~2·10⁻⁴ of pair space as candidates (measured:
    tools/neardup_probe.py). Plan shape: explode each row into L
    (table, bucket) keys → equi-join → DISTINCT pair (a pair colliding
    in several tables dedups in one candidate-grain shuffle) → exact
    cosine. Everything is the integer-exact plane family, so the
    candidate set is engine-derivable (oracle-able) like q28/q29."""
    tables = banded_tables(n_tables, band_planes, dim)
    keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket_int_expr(planes, vec_col).alias("bkt"),
            )
            for t, planes in enumerate(tables)
        ]
    )
    b = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_nrm"),
        F.explode(keys).alias("_k"),
    ).select(
        "_id", "_v", "_nrm", F.col("_k.tbl").alias("_tbl"), F.col("_k.bkt").alias("_bkt")
    )
    a = b.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"), "_tbl", "_bkt",
    )
    c = b.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"), "_tbl", "_bkt",
    )
    cand = (
        a.join(c, ["_tbl", "_bkt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_va", "_vb", "_na", "_nb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
        ).alias("cosine_sim"),
    ).filter(F.col("cosine_sim") >= threshold)


def embedding_near_dups_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exactness BASELINE for recall-pinning the blocked
    variant (tests only — the non-equi self-join is a
    BroadcastNestedLoopJoin, quadratic at scale; never gate or ship
    this plan)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def quantize_floats(vec: list[float]) -> list[int]:
    """Driver-side twin of quantize_vec: floor(x · 2^20) in exact
    double arithmetic (Python floats ARE IEEE doubles, and the
    power-of-two multiply is lossless), so the quantizer matches the
    engines bit-for-bit."""
    import math as _math

    return [int(_math.floor(float(x) * float(QUANT))) for x in vec]


def ivf_assign(df: DataFrame, seeds: list[tuple[int, list[float]]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each row to its nearest coarse centroid (IVF cell) by
    squared-L2 over floor-quantized INTEGER vectors — exact int64
    arithmetic (≤ dim·2^44), identical in any engine. ``seeds`` is the
    coarse quantizer: (seed_id, vector) pairs, sorted by id — small
    enough to live in the plan as literals (a model artifact, like LSH
    planes). argmin via array_position(array_min) → first-min, which
    equals the (d², seed_id) tie-break because seeds are id-ordered.

    r10: built as ONE generated SQL string (the q42 expression-cost
    lesson — the old Column-tree form cost n_cells·dim py4j lit()
    round-trips to BUILD and re-evaluated quantize_vec per seed at
    RUNTIME); the quantized vector and the d² array are each
    LET-BOUND once via transform(array(x), v -> body)."""
    seeds_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{int(x)}L" for x in quantize_floats(vec)) + ")"
        for _, vec in seeds
    ) + ")"
    ids_sql = "array(" + ", ".join(f"{int(sid)}L" for sid, _ in seeds) + ")"
    qv_sql = (
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)"
        f" * CAST({int(QUANT)} AS DOUBLE)) AS BIGINT))"
    )
    return df.withColumn(
        "_cell",
        F.expr(
            f"get(transform(array({qv_sql}), qv -> "
            f"get(transform(array(transform({seeds_sql}, s -> "
            "aggregate(zip_with(qv, s, (a, b) -> (a - b) * (a - b)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v))), d2 -> "
            f"element_at({ids_sql}, "
            "CAST(array_position(d2, array_min(d2)) AS INT))), 0)), 0)"
        ),
    )


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols=None,
) -> DataFrame:
    """IVF-flat ANN: coarse-quantize into ``n_cells`` cells (seeds =
    the n_cells lowest-id vectors — deterministic, data-sampled), probe
    the ``nprobe`` cells nearest to the query, exact cosine inside.

    Scale path: cell assignment happens once at ingest (a column), the
    probe is a partition-pruned filter — candidate set ≈ nprobe/n_cells
    of the data, never all-pairs. Driver holds only the tiny coarse
    quantizer (n_cells vectors), exactly like a FAISS IVF coarse index.

    ``extra_cols`` (optional): callable receiving the collected query
    vector and returning ``{name: Column}`` projections evaluated on
    the candidate rows (``vec_col`` in scope) — e.g. a PQ-ADC column
    (:func:`pq_adc_expr`) rides the same single-pass scan, which is
    exactly the IVF-PQ layout."""
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    seeds = [(int(r[0]), [float(x) for x in r[1]]) for r in seed_rows]

    assigned = ivf_assign(df, seeds, id_col, vec_col)
    q = query_df.select(
        F.col(id_col).alias("_qid"), F.col(vec_col).alias("_qvec")
    ).collect()[0]
    qvec = [float(x) for x in q["_qvec"]]

    # nprobe cells nearest to the query by the SAME integer squared-L2
    # as the assignment (computed driver-side over the tiny quantizer —
    # the same place FAISS does it; Python ints are exact, so this
    # matches the relational oracle bit-for-bit)
    qq = quantize_floats(qvec)
    seed_d2 = [
        (sum((a - b) * (a - b) for a, b in zip(qq, quantize_floats(vec))), sid)
        for sid, vec in seeds
    ]
    probe_cells = [sid for _, sid in sorted(seed_d2)[:nprobe]]

    qlit = F.array(*[F.lit(x) for x in qvec])
    # query norm computed driver-side with the SAME sequential double
    # accumulation as the norm() fold (0.0 + x0² + x1² + …, IEEE sqrt):
    # bit-identical, and the per-candidate literal-array fold disappears
    qacc = 0.0
    for x in qvec:
        qacc += float(x) * float(x)
    qnorm = math.sqrt(qacc)
    cand = assigned.filter(F.col("_cell").isin(probe_cells)).filter(
        F.col(id_col) != F.lit(int(q["_qid"]))
    )
    # round BEFORE ranking (ulp-stability — same rule as q27/q29)
    extras = extra_cols(qvec) if extra_cols is not None else {}
    scored = cand.select(
        F.lit(int(q["_qid"])).alias("query_id"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col(vec_col), qlit) / (norm(F.col(vec_col)) * F.lit(qnorm)), 6
        ).alias("cosine_sim"),
        *[expr.alias(name) for name, expr in extras.items()],
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id")).limit(k)


def label_centroid_components(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-(label, position) exact-decimal mean — the flat (label, pos,
    mean_val) grain of the centroid computation (pos is 0-based). One
    shuffle on (label, pos); no vector reaches the driver."""
    exploded = df.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "x")
    )
    return exploded.groupBy("label", "pos").agg(
        (F.sum(F.col("x").cast("decimal(20,8)")).cast("double") / F.count("x"))
        .alias("mean_val")
    )


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label mean vector (centroid): posexplode → exact-decimal mean
    per (label, position) → reassemble ordered array. This is the
    distributed element-wise aggregation primitive (no driver-side
    vector math) that feeds IVF coarse-quantizer training, class
    prototypes, and drift monitoring. One shuffle on (label, pos)."""
    per_pos = label_centroid_components(df, label_col, vec_col)
    return per_pos.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_val"))), lambda s: s["mean_val"]
        ).alias("centroid")
    )


# --- product quantization (the PQ in IVF-PQ: FAISS's workhorse layout) ------


def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_samples: int = 512,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the vector into
    ``m`` subspaces and k-means each down to ``ksub`` centroids.

    Training is deliberately tiny and deterministic — the sample is
    the ``n_samples`` LOWEST-id vectors (the same data-sampled
    convention as the IVF coarse seeds), k-means init is the first
    ``ksub`` sample subvectors in id order, and Lloyd iterations run a
    fixed ``n_iters`` with lowest-index tie-breaks. The returned
    codebooks (m × ksub × dim/m floats) are a driver-side model
    artifact exactly like FAISS's: at 100 TB you train on a bounded
    sample and the codebooks (KBs) broadcast into the encode plan."""
    import numpy as np

    rows = df.select(id_col, vec_col).orderBy(id_col).limit(n_samples).collect()
    X = np.array([[float(x) for x in r[1]] for r in rows], np.float64)
    if len(X) < ksub:
        raise ValueError(
            f"PQ training needs >= ksub={ksub} sample vectors, got {len(X)}"
        )
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        cent = S[:ksub].copy()
        for _ in range(n_iters):
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # lowest index on ties
            for c in range(ksub):
                members = S[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([[float(v) for v in row] for row in cent])
    return books


def _pq_sub(vec: Column, j: int, dsub: int) -> Column:
    return F.slice(vec, j * dsub + 1, dsub)


def _pq_int_d2(sub: Column, centroid: list[float]) -> Column:
    """Exact int64 squared-L2 between a floor-quantized subvector and a
    floor-quantized centroid literal — same integer discipline as
    ivf_assign (ties can't flip across engines or partitionings)."""
    qsub = F.transform(sub, lambda x: F.floor(x * F.lit(float(QUANT))).cast("long"))
    qcent = F.array(
        *[F.lit(int(v)).cast("long") for v in quantize_floats(centroid)]
    )
    return F.aggregate(
        F.zip_with(qsub, qcent, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "_pq",
) -> DataFrame:
    """Encode every vector as ``m`` small code indices (nearest
    centroid per subspace, integer-exact argmin with first-min
    tie-break). The code array replaces dim floats with m codes —
    16× compression at the default 64-dim/m=8/ksub=16 — and is the
    column an IVF-PQ layout stores per row; encode happens once at
    ingest, entirely in codegen with the codebooks as literals."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j in range(m):
        d2s = F.array(
            *[
                _pq_int_d2(_pq_sub(F.col(vec_col), j, dsub), cent)
                for cent in codebooks[j]
            ]
        )
        codes.append(
            (F.array_position(d2s, F.array_min(d2s)) - 1).cast("int")
        )
    return df.withColumn(code_col, F.array(*codes))


def pq_topk(
    df_encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "_pq",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the driver builds
    the m×ksub lookup table of exact integer squared-L2 between the
    query's subvectors and every centroid; each row's approximate
    distance is then m table lookups summed in a fold — no vector
    arithmetic per row at all, which is why PQ scans run at memory
    bandwidth at scale. Output: (neighbor_id, approx_d2) ascending,
    id tie-break."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qq = quantize_floats([float(x) for x in query_vec])
    lut = [
        [
            sum(
                (a - b) * (a - b)
                for a, b in zip(
                    qq[j * dsub : (j + 1) * dsub], quantize_floats(cent)
                )
            )
            for cent in codebooks[j]
        ]
        for j in range(m)
    ]
    lut_lit = F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in row])
            for row in lut
        ]
    )
    score = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.sequence(F.lit(1), F.lit(m)),
            lambda code, j: F.element_at(
                F.element_at(lut_lit, j), code + 1
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        df_encoded.select(
            F.col(id_col).alias("neighbor_id"), score.alias("approx_d2")
        )
        .orderBy(F.col("approx_d2"), F.col("neighbor_id"))
        .limit(k)
    )


def pq_search_rerank(
    df: DataFrame,
    df_encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "_pq",
) -> DataFrame:
    """The standard two-stage PQ pipeline: ADC shortlist over the
    compressed codes (:func:`pq_topk`, memory-bandwidth scan), then
    EXACT squared-L2 rerank of only the shortlist against the original
    vectors (semi-join → tiny candidate set). This is how IVF-PQ
    serves high-recall ANN at 100 TB: the full-precision vectors are
    touched for ``shortlist`` rows, not the corpus. Output:
    (neighbor_id, d2) ascending, id tie-break."""
    short = pq_topk(
        df_encoded, codebooks, query_vec, k=shortlist,
        id_col=id_col, code_col=code_col,
    ).select(F.col("neighbor_id").alias(id_col))
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        df.join(short, id_col, "left_semi")
        .select(F.col(id_col).alias("neighbor_id"), F.round(d2, 6).alias("d2"))
        .orderBy("d2", "neighbor_id")
        .limit(k)
    )


def pq_adc_expr(
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    vec_col: str = "embedding",
) -> Column:
    """PQ encode + ADC lookup as ONE pure column expression — the
    IVF-PQ cell-scan shape: per subspace, argmin over the centroid
    literals (integer-exact, first-min tie-break — identical to
    :func:`pq_encode`) indexes straight into the query's ADC lookup
    table (integer d2 literals built driver-side, like FAISS). No
    join, no second scan, no Python: the whole thing rides in the same
    whole-stage-codegen projection as the cosine column, so adding it
    to an IVF probe keeps the plan single-pass (q42's plan pin: zero
    Exchange, zero Join). Returns exact int64 (bounded by
    dim·(2·2^21)² ≈ 2^50 for unit-scale embeddings)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qq = quantize_floats([float(x) for x in query_vec])

    # Expression-cost discipline (measured at sf0.1): a per-centroid
    # unrolled Column tree cost ~3 s of py4j CONSTRUCTION (2048 lit/cast
    # calls) plus ~3 s of interpreted re-quantization (HOF lambdas
    # re-evaluate nested expressions per element — the winnowing trap,
    # arithmetic edition). So the whole thing is ONE generated SQL
    # string (one py4j call, millisecond parse), and the quantized
    # vector is LET-BOUND via the transform-over-1-element-array trick
    # (`transform(array(x), qv -> body)` evaluates x once per row), so
    # each row quantizes once, not once per (subspace × centroid).
    books_sql = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(str(int(v)) for v in quantize_floats(cent)) + ")"
                for cent in book
            )
            + ")"
            for book in codebooks
        )
        + ")"
    )
    lut_sql = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                str(
                    int(
                        sum(
                            (a - b) * (a - b)
                            for a, b in zip(
                                qq[j * dsub : (j + 1) * dsub], quantize_floats(cent)
                            )
                        )
                    )
                )
                for cent in codebooks[j]
            )
            + ")"
            for j in range(m)
        )
        + ")"
    )
    qv_sql = (
        f"transform(`{vec_col}`, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {float(QUANT)!r}) AS BIGINT))"
    )
    d2s_sql = (
        f"transform(element_at({books_sql}, j + 1), cent -> "
        f"aggregate(zip_with(slice(qv, j * {dsub} + 1, {dsub}), cent, "
        f"(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (s, v) -> s + v))"
    )
    code_sql = (  # 1-based first-min index == pq_encode's tie-break
        f"element_at(transform(array({d2s_sql}), d2s -> "
        f"CAST(array_position(d2s, array_min(d2s)) AS INT)), 1)"
    )
    return F.expr(
        f"element_at(transform(array({qv_sql}), qv -> "
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS BIGINT), (acc, j) -> "
        f"acc + element_at(element_at({lut_sql}, j + 1), {code_sql}))), 1)"
    )


def pq_codebooks_seeded(
    m: int = 8, ksub: int = 16, dsub: int = 8
) -> list[list[list[float]]]:
    """Data-INDEPENDENT PQ codebooks from the same deterministic _mix
    stream as the SRP hyperplanes: centroid values in [-1, 1), exactly
    representable as k/2^20 so :func:`quantize_floats` is lossless on
    them. Quantization quality is below trained codebooks (use
    :func:`pq_train` for real search), but encode + ADC become a pure
    function of published constants — the property that would let a
    DuckDB oracle reproduce PQ codes bit-for-bit if a driver-gate slot
    ever wants the machinery under the hash gate (same role
    PLANE_SEED plays for q29)."""
    out = []
    for j in range(m):
        book = []
        for c in range(ksub):
            row = [
                math.floor(_mix(PLANE_SEED + 7 * j, c * dsub + t) * QUANT)
                / QUANT
                for t in range(dsub)
            ]
            book.append(row)
        out.append(book)
    return out


# --- Scalar quantization (int8-class SQ) --------------------------------
# The memory tier between raw float vectors and PQ codes: per-dimension
# min-max quantization to [0, 255] cuts vector storage 4x vs float32
# and turns distance kernels into small-integer dot products (the
# SIMD-friendly form every production ANN store ships as "SQ8").
# Everything here is engine-portable by the zkey/PLANE_SEED argument:
# the quantizer is floor((x - lo)/span * 255) — one well-defined IEEE
# double chain, midpoint-free under floor — and every score after
# quantization is exact int64 arithmetic.

SQ_LEVELS = 255


def sq_train(df: DataFrame, vec_col: str = "embedding") -> tuple[list[float], list[float]]:
    """Train the SQ model: per-dimension (min, max) over the corpus —
    a BOUNDED driver-side artifact (2 × dim doubles, the FAISS
    ScalarQuantizer train step; same class of collect as the IVF/PQ
    codebook samples). The distributed work is one posexplode + agg;
    only the dim-sized bounds row reaches the driver."""
    flat = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
    rows = (
        flat.groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
        .orderBy("pos")
        .collect()
    )
    return [r.lo for r in rows], [r.hi for r in rows]


def _dlit(v: float) -> str:
    """Exact Spark-SQL DOUBLE literal (repr is shortest-round-trip;
    the D suffix forces DOUBLE — a bare decimal literal would parse as
    DECIMAL, the r5 KMV-constant lesson)."""
    return f"{v!r}D"


def sq_encode(
    df: DataFrame,
    lo: list[float],
    hi: list[float],
    vec_col: str = "embedding",
    code_col: str = "sq_code",
) -> DataFrame:
    """Append ``code_col``: per-dimension [0, 255] quantization of
    ``vec_col`` against the TRAINED bounds, which live in the plan as
    literal arrays (the q42 IVF pattern: model artifacts as constants
    in ONE generated SQL expression — no join, no shuffle, scan-local;
    and no thousands of py4j-built Column nodes). In-domain values
    land in [0, 255] exactly (x = hi → 255); out-of-sample clamps.
    The quantizer chain (x − lo)/span·255 + floor is one well-defined
    IEEE expression — bit-identical cross-engine (zkey argument)."""
    lo_sql = "array(" + ", ".join(_dlit(v) for v in lo) + ")"
    hi_sql = "array(" + ", ".join(_dlit(v) for v in hi) + ")"
    expr = f"""
        transform(sequence(1, size({vec_col})), i ->
            least(greatest(
                CASE WHEN element_at({hi_sql}, i) - element_at({lo_sql}, i) > 0D
                     THEN CAST(floor(
                            (CAST(element_at({vec_col}, i) AS DOUBLE)
                             - element_at({lo_sql}, i))
                            / (element_at({hi_sql}, i) - element_at({lo_sql}, i))
                            * {float(SQ_LEVELS)!r}D) AS BIGINT)
                     ELSE 0L END,
                0L), {SQ_LEVELS}L))
    """
    return df.withColumn(code_col, F.expr(expr))


def sq_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two SQ code arrays — the integer
    kernel an SQ-ANN scan runs instead of float cosine (64 dims ×
    255² ≈ 4.2e6 max per term: far inside int64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq_bounds_sql(vec_expr: str = "embedding", table: str = "embeddings") -> str:
    """DuckDB CTE fragment: per-dimension bounds as aligned arrays
    (columns sq_lo, sq_hi — 1 row). The oracle re-derives the bounds
    RELATIONALLY (no literals — a 17-digit double literal would parse
    as DECIMAL in DuckDB and double-round); MIN/MAX of the same data
    are bit-identical to the trained artifact."""
    return f"""
    sq_flat AS (
        SELECT CAST(generate_subscripts({vec_expr}, 1) AS INT) - 1 AS pos,
               CAST(unnest({vec_expr}) AS DOUBLE) AS x
        FROM {table}
    ),
    sq_b AS (
        SELECT pos, MIN(x) AS lo, MAX(x) AS hi FROM sq_flat GROUP BY pos
    ),
    sq_bounds AS (
        SELECT list(lo ORDER BY pos) AS sq_lo, list(hi ORDER BY pos) AS sq_hi
        FROM sq_b
    )"""


def sq_code_sql(vec_expr: str = "embedding") -> str:
    """DuckDB expression: the SQ code list for ``vec_expr`` given the
    sq_bounds CTE is in scope (cross-joined). Identical IEEE chain to
    sq_encode's quantizer."""
    return f"""
        list_transform(
            generate_series(1, len({vec_expr})),
            i -> GREATEST(LEAST(CASE WHEN sq_hi[i] - sq_lo[i] > 0
                 THEN CAST(floor((CAST({vec_expr}[i] AS DOUBLE) - sq_lo[i])
                           / (sq_hi[i] - sq_lo[i]) * {float(SQ_LEVELS)}) AS BIGINT)
                 ELSE 0 END, {SQ_LEVELS}), 0))"""


def sq_topk(
    df_coded: DataFrame,
    lo: list[float],
    hi: list[float],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq_code",
) -> DataFrame:
    """Asymmetric SQ top-k: rank corpus CODES against an exact query
    vector without decoding. With reconstruction x̂ᵢ = loᵢ + cᵢ·sᵢ
    (sᵢ = spanᵢ/255), the query inner product ⟨q, x̂⟩ differs from
    Σ (qᵢ·sᵢ)·cᵢ only by a row-independent constant — so ranking needs
    just per-dim weights wᵢ = qᵢ·sᵢ. Those are integerized driver-side
    (floor(w·2²⁰), the QUANT pattern), making the row score an EXACT
    int64 fold over the int codes: deterministic on any engine or
    partitioning, and the same m-lookups-per-row cost shape as the PQ
    ADC scan. Output: (neighbor_id, sq_score) descending, id
    tie-break."""
    lvl = float(SQ_LEVELS)
    w_int = [
        int(math.floor(q * ((h - l) / lvl) * QUANT))
        for q, l, h in zip(query_vec, lo, hi)
    ]
    w_sql = "array(" + ", ".join(f"{w}L" for w in w_int) + ")"
    score = F.expr(
        f"""aggregate(zip_with({code_col}, {w_sql}, (c, w) -> c * w),
                      0L, (acc, v) -> acc + v)"""
    )
    return (
        df_coded.select(
            F.col(id_col).alias("neighbor_id"), score.alias("sq_score")
        )
        .orderBy(F.col("sq_score").desc(), F.col("neighbor_id"))
        .limit(k)
    )


def semdedup(
    df: DataFrame,
    n_cells: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster-scoped
    semantic dedup — assign every embedding to a coarse cell, compare
    pairs ONLY within a cell, drop any vector that has an
    above-threshold partner with a LOWER id in its cell (the engine's
    standard star-collapse keep policy from curation.curate; the
    paper's keep-farthest-from-centroid variant is one ORDER BY swap
    away and deliberately not the default — lowest-id is
    corpus-growth-stable).

    The whole point is the candidate bound: all-pairs cosine is
    O(n²); cell-scoped pairing is O(Σ cᵢ²) ≈ n²/n_cells for balanced
    cells — and the pair join is an EQUI-join on the cell id
    (AQE-splittable, never BNLJ). Cross-cell near-dups are the
    documented recall loss (the paper's trade); the recall pin against
    embedding_near_dups_exact is in the tests.

    Determinism: cell assignment is :func:`ivf_assign` over the
    n_cells lowest-id vectors (integer-exact squared-L2, the q42
    oracle-proven quantizer); cosine rounds to 6 dp BEFORE the
    threshold decision (the q27/q28 ulp rule); norms are computed once
    per vector BEFORE the pair join (the r4 hoist — norm cost is
    O(n·dim), never O(pairs·dim)).

    Returns (id, cell, kept) for EVERY input row."""
    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    seeds = [(int(r[0]), [float(x) for x in r[1]]) for r in seed_rows]
    assigned = ivf_assign(df, seeds, id_col, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), "_cell"
    ).withColumn("_n", norm(F.col("_v")))
    a = assigned.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_cell",
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_cell",
    )
    dropped = (
        a.join(b, ["_cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "_cos",
            F.round(
                dot(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .filter(F.col("_cos") >= F.lit(float(threshold)))
        .select(F.col("id_b").alias("_dropped"))
        .distinct()
    )
    return (
        assigned.join(
            dropped, assigned._id == dropped._dropped, "left"
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_cell").alias("cell"),
            F.col("_dropped").isNull().alias("kept"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009 — the
    standard score-free way to combine heterogeneous retrievers, e.g.
    :func:`text.bm25_topk` lexical lists with :func:`cosine_topk` /
    :func:`ivf_topk` semantic lists for hybrid curation search):

        rrf_micro(d) = Σ_lists 10⁶ DIV (k_rrf + rank_list(d))

    — the classic Σ 1/(k+r) with each reciprocal quantized to integer
    micro-units BEFORE summing, so fusion is bit-identical across
    engines and needs no score normalization (ranks are already
    integers; k_rrf=60 is the published constant). Ties on the fused
    score break by id ASC.

    Input frames need (query_col, id_col, rank_col); a doc missing
    from a list simply contributes nothing (the RRF convention).
    Returns (query, id, n_lists, rrf_micro, fused_rank).

    Shape: one unionAll, one (query, doc) groupBy, one per-query
    window over the ALREADY per-query-bounded fused candidates (each
    input list is a top-k, so the window group is ≤ Σ k rows — no
    two-level rank needed)."""
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    from functools import reduce

    from pyspark.sql.window import Window as _W

    parts = [
        r.select(
            F.col(query_col).alias("_q"),
            F.col(id_col).alias("_d"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        for r in rankings
    ]
    u = reduce(lambda x, y: x.unionAll(y), parts)
    fused = (
        u.withColumn(
            "_c", F.expr(f"CAST(1000000 DIV ({int(k_rrf)} + _r) AS BIGINT)")
        )
        .groupBy("_q", "_d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lists"),
            F.sum("_c").cast("long").alias("rrf_micro"),
        )
    )
    w = _W.partitionBy("_q").orderBy(
        F.col("rrf_micro").desc(), F.col("_d").asc()
    )
    return fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    ).select(
        F.col("_q").alias(query_col),
        F.col("_d").alias(id_col),
        "n_lists",
        "rrf_micro",
        "fused_rank",
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training-set construction:
    for every anchor vector, the ``k`` most-cosine-similar vectors
    carrying a DIFFERENT label — the pairs a contrastive/embedding
    trainer learns the most from (easy negatives are already far).

    Candidates come from the anchor's IVF cell only (the semdedup
    scoping argument is even stronger here: a hard negative is BY
    DEFINITION nearby, so cross-cell misses are the soft negatives we
    deliberately skip). The pair join is an equi-join on the cell id —
    never all-pairs, AQE-splittable; norms are hoisted per vector
    before the join; cosine rounds to 6 dp BEFORE ranking (the
    q27/q28/q29 ulp rule) with a neighbor-id tie-break, so the mined
    set is deterministic across engines and partitionings.

    Returns (anchor id, anchor_label, neg_rank, neighbor id,
    neighbor_label, cosine_sim). Anchors whose cell holds no
    other-label vector emit nothing."""
    from pyspark.sql.window import Window as _W

    seed_rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    seeds = [(int(r[0]), [float(x) for x in r[1]]) for r in seed_rows]
    assigned = (
        ivf_assign(df, seeds, id_col, vec_col)
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.col(label_col).alias("_lbl"),
            "_cell",
        )
        .withColumn("_n", norm(F.col("_v")))
    )
    a = assigned.select(
        F.col("_id").alias("_aid"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), F.col("_lbl").alias("anchor_label"),
        "_cell",
    )
    b = assigned.select(
        F.col("_id").alias("_bid"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), F.col("_lbl").alias("neighbor_label"),
        "_cell",
    )
    w = _W.partitionBy("_aid").orderBy(
        F.col("cosine_sim").desc(), F.col("_bid").asc()
    )
    return (
        a.join(b, ["_cell"])
        .filter(F.col("anchor_label") != F.col("neighbor_label"))
        .withColumn(
            "cosine_sim",
            F.round(
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")),
                6,
            ),
        )
        .withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= k)
        .select(
            F.col("_aid").alias(id_col),
            "anchor_label",
            "neg_rank",
            F.col("_bid").alias("neighbor_id"),
            "neighbor_label",
            "cosine_sim",
        )
    )


def _d2_to_center_sql(center: list[int], qv_expr: str = "_qv") -> str:
    """Generated-SQL integer L2² from a quantized vector column to an
    INLINE literal center (the q42 model-artifact pattern: one F.expr
    string, never dim×k lit() py4j round-trips). |q| ≤ 2^21 ⇒ squared
    diffs ≤ 2^44, × dim 64 ≪ 2^63."""
    lits = ", ".join(str(int(v)) for v in center)
    return (
        f"aggregate(zip_with({qv_expr}, array({lits}),"
        " (a, b) -> (a - b) * (a - b)),"
        " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def coreset_kcenter(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Greedy k-center CORESET selection (the farthest-point heuristic
    of Gonzalez 1985, used for training-data diversity subsets à la
    Sener & Savarese 2018): start from the lowest-id point, then
    repeatedly select the point FARTHEST from the chosen set
    (integer-quantized L2², ties to the lowest id). Returns every
    input row as (id_col, sel_round, d2_to_coreset): sel_round =
    1-based selection order (−1 for unselected points), d2_to_coreset
    = the final min-distance to the selected set (0 for members; its
    MAX over unselected rows is the classic coverage radius).

    Fully deterministic and oracle-able: quantize_vec's floor(x·2²⁰)
    makes every distance an exact int64, the argmax rank is
    (d2 DESC, id), and :func:`coreset_oracle_sql` unrolls the same
    rounds as MATERIALIZED chained CTEs (the kcore lesson). If the
    corpus is covered early (max min-distance 0 — duplicates), the
    argmax re-picks the lowest-id covered point; the sel_round CASE
    marks its FIRST round on both engines — consistent, documented.

    Scale shape: quantization once (persisted), then per round ONE
    column update against an inline literal center + one bounded 1-row
    argmax collect (the model-artifact pattern); the frame is
    localCheckpoint'ed per round (_PRState discipline — constant plan
    depth). NULL ids/vectors are dropped up front: NULL distances
    would hit engine-divergent NULL ordering in the argmax."""
    if int(k) < 1:
        raise ValueError("coreset_kcenter: k must be >= 1")
    q = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .filter(F.col("_id").isNotNull() & F.col("_v").isNotNull())
        .select("_id", quantize_vec(F.col("_v")).alias("_qv"))
        .persist()
    )
    n = q.count()
    if int(k) > n:
        q.unpersist()
        raise ValueError(f"coreset_kcenter: k={k} exceeds {n} usable rows")
    first = q.orderBy("_id").limit(1).collect()[0]
    sel_ids = [first["_id"]]
    cur = q.withColumn(
        "_d2", F.expr(_d2_to_center_sql([int(v) for v in first["_qv"]]))
    ).localCheckpoint(True)
    for _ in range(2, int(k) + 1):
        # cur keeps _qv alongside _d2, so the argmax row carries the
        # next center's quantized vector directly (bounded 1-row
        # collect — the model-artifact pattern)
        row = cur.orderBy(F.desc("_d2"), "_id").limit(1).collect()[0]
        sel_ids.append(row["_id"])
        cur = cur.withColumn(
            "_d2",
            F.least(
                "_d2",
                F.expr(_d2_to_center_sql([int(v) for v in row["_qv"]])),
            ),
        ).localCheckpoint(True)
    q.unpersist()
    sel = F.lit(-1).cast("long")
    for rnd in range(len(sel_ids), 0, -1):
        sel = F.when(
            F.col("_id") == F.lit(sel_ids[rnd - 1]), F.lit(rnd)
        ).otherwise(sel)
    return cur.select(
        F.col("_id").alias(id_col),
        sel.cast("long").alias("sel_round"),
        F.col("_d2").cast("long").alias("d2_to_coreset"),
    )


def coreset_oracle_sql(
    embeddings_sql: str = "SELECT vec_id, embedding FROM embeddings",
    k: int = 8,
    vec_expr: str = "embedding",
    id_expr: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`coreset_kcenter` — the greedy rounds
    unrolled as chained CTEs, ALL MATERIALIZED (round i references
    round i−1 multiple times; the kcore exponential-inlining lesson).
    Distances index the center CTE's list column inside the lambda —
    no literal centers needed SQL-side."""

    def d2(c: str) -> str:
        return (
            "CAST(list_sum(list_transform(p.qv,"
            f" (x, i) -> (x - {c}.qv[i]) * (x - {c}.qv[i]))) AS BIGINT)"
        )

    parts = [
        f"""WITH ex AS MATERIALIZED (
    SELECT {id_expr} AS vec_id, {quantize_vec_sql(vec_expr)} AS qv
    FROM ({embeddings_sql})
    WHERE {id_expr} IS NOT NULL AND {vec_expr} IS NOT NULL
)""",
        "c1 AS MATERIALIZED"
        " (SELECT vec_id, qv FROM ex ORDER BY vec_id LIMIT 1)",
        f"m1 AS MATERIALIZED (SELECT p.vec_id, {d2('c')} AS d2"
        " FROM ex p, c1 c)",
    ]
    for i in range(2, int(k) + 1):
        p = i - 1
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT e.vec_id, e.qv FROM ex e"
            f" JOIN m{p} ON m{p}.vec_id = e.vec_id"
            f" ORDER BY m{p}.d2 DESC, e.vec_id LIMIT 1)"
        )
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT p.vec_id,"
            f" LEAST(m{p}.d2, {d2('c')}) AS d2"
            f" FROM ex p JOIN m{p} ON m{p}.vec_id = p.vec_id, c{i} c)"
        )
    case = " ".join(
        f"WHEN p.vec_id = (SELECT vec_id FROM c{i}) THEN {i}"
        for i in range(1, int(k) + 1)
    )
    return ",\n".join(parts) + f"""
SELECT p.vec_id,
       CAST(CASE {case} ELSE -1 END AS BIGINT) AS sel_round,
       CAST(m{int(k)}.d2 AS BIGINT) AS d2_to_coreset
FROM ex p JOIN m{int(k)} ON m{int(k)}.vec_id = p.vec_id
"""
