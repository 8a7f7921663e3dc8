"""Shared column-expression library — every reusable scalar/aggregate
expression in the engine, all JVM-side (whole-stage-codegen'd), no
Python UDFs.

Determinism contract (see plans/queries.py docstring): float sums run
on DECIMAL so results are exact — identical across engines, runs, AND
cluster sizes (double addition is not associative; a plain double SUM
changes with partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-money accumulator type: 22 integer digits, 8 fractional.
MONEY = "decimal(30,8)"

# 2^31-1 (Mersenne prime) — MinHash modulus.
MERSENNE = 2_147_483_647


def exact_sum(col: Column | str, out_type: str = "double") -> Column:
    """Order-independent SUM of a float column via exact decimal
    accumulation, emitted as ``out_type``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast(out_type)


def exact_avg(col: Column | str) -> Column:
    """AVG as exact-decimal-sum ÷ count — one deterministic IEEE
    division instead of an engine-private mean."""
    c = F.col(col) if isinstance(col, str) else col
    return exact_sum(c) / F.count(c)


def cents(col: Column | str, decimals: int = 2) -> Column:
    """Exact integer minor units (cents) of a money double with a KNOWN
    decimal scale — the engine's per-row integerizer (r17).

    Implementation: ``trunc(x·scale ± 0.5)`` via a long cast instead of
    ``F.round`` or a decimal cast. All three produce the identical
    integer under the money contract, but Spark's ``round`` on doubles
    allocates a ``java.math.BigDecimal`` PER VALUE and the decimal cast
    allocates a ``Decimal`` per value — measured 2× the whole-stage
    time on a 600k-row scan-agg (q01 962→495 ms; guide §1.2 "per-task
    work"). The branch-and-truncate form is pure primitive codegen.

    Exactness argument (why this equals HALF_UP round bit-for-bit):
    a true ``decimals``-decimal value k/scale stored as double makes
    x·scale land within a few ulps of the integer k, and for
    |x·scale| < 2^52 the ±0.5 addition is EXACT in IEEE double, so the
    truncation-toward-zero returns exactly k for either sign (negative
    values mirror: HALF_UP rounds away from zero, and trunc(v − 0.5)
    does too). Out-of-contract inputs (|x·scale| ≥ 2^52, or data with
    more fractional digits than declared) are where the forms could
    diverge — both are outside every caller's data contract.
    """
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * (10**decimals)
    return (
        F.when(scaled >= 0, scaled + 0.5).otherwise(scaled - 0.5).cast("long")
    )


def cents_sum(col: Column | str, decimals: int = 2) -> Column:
    """Fast exact SUM for money columns with a KNOWN decimal scale:
    scale to integer minor units (:func:`cents`), accumulate as LONG,
    divide once at the end. Emits the identical double ``exact_sum``
    would (both are the nearest-double of the same exact rational).

    Overflow bound: |Σ| < 2^63 minor units — at 2 decimals that is
    ~9.2e16 currency units PER GROUP, far beyond any daily/category
    aggregate. For ungrouped planet-scale totals or unknown-scale data
    use :func:`exact_sum` (decimal accumulator, no practical bound).
    """
    return F.sum(cents(col, decimals)) / float(10**decimals)


def portable_hash(col: Column, hex_chars: int = 12) -> Column:
    """Integer hash of a string via md5 — engine-portable (DuckDB:
    ``CAST('0x'||substr(md5(x),1,N) AS BIGINT)``), deterministic
    everywhere. 12 hex chars = 48 bits (safe headroom under int64)."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


def affine_minhash(h: Column, a: int, b: int, p: int = MERSENNE) -> Column:
    """One MinHash transform h_i(x) = (a·(x mod p) + b) mod p. The inner
    mod keeps a·x inside int64 (ANSI overflow-safe)."""
    return ((h % p) * a + b) % p


def dot(a: Column, b: Column) -> Column:
    """Dot product over two array<float/double> columns — a codegen'd
    fold, accumulation strictly in array order (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def returned_flag(col: str = "returned_at") -> Column:
    """Item-return indicator (reference transform.py:351, 363):
    ``returned_at IS NOT NULL`` → 1 else 0."""
    return F.when(F.col(col).isNotNull(), 1).otherwise(0)


def coalesce_zero(col: Column | str, out_type: str = "int") -> Column:
    """Null→0 serving-edge coalesce (reference P6, transform.py:395-399)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0)).cast(out_type)


def to_serving_decimal(col: Column | str, precision: int = 38, scale: int = 6) -> Column:
    """Numeric→Decimal at the serving boundary (reference P5,
    transform.py:382-399: DynamoDB rejects float; kept as the generic
    serving-edge cast)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0)).cast(f"decimal({precision},{scale})")


# Fixed-point base-2 log for POSITIVE int64 values, exact-portable
# across engines: log2_micro(c) = ilog2(c)·10⁶ + TABLE[mantissa],
# where ilog2 comes from the engine's exact integer bin()-length and
# the 256-entry mantissa table holds round(log2(1 + i/256)·10⁶) as
# INTEGER LITERALS shared by every implementation (the PLANE_SEED /
# quality-logit pattern: libm values enter the computation only as
# pre-published constants, so Spark, DuckDB, and Python agree
# bit-for-bit). Truncating the mantissa to 8 bits quantizes the log —
# deterministically, max error < log2(257/256) ≈ 0.0056 — which is
# the same "quantize first, then all decisions on integers" move as
# cents/SRP/zkey. Exact at powers of two (mantissa index 0 → 0).
LOG2_TABLE_MICRO: tuple[int, ...] = tuple(
    round(__import__("math").log2(1 + i / 256) * 1_000_000) for i in range(256)
)


def log2_micro_int(c: int) -> int:
    """Python twin of :data:`LOG2_TABLE_MICRO` lookup (driver-side
    scalars: corpus totals, smoothing denominators)."""
    if c <= 0:
        raise ValueError("log2_micro_int requires a positive integer")
    il = c.bit_length() - 1
    m = (c << (8 - il)) if il <= 8 else (c >> (il - 8))
    return il * 1_000_000 + LOG2_TABLE_MICRO[m - 256]


def log2_micro_sql(expr: str, engine: str = "spark") -> str:
    """Generated-SQL form of log2_micro over a positive BIGINT
    expression — ONE string (the q42 expression-cost lesson), emitted
    for either engine. ``expr`` is re-referenced five times, so pass a
    simple column reference (evaluate complex inputs into a column
    first); intended for SMALL frames (bucket/stat tables), where the
    corpus side consumes only the resulting integers."""
    table = ", ".join(str(v) for v in LOG2_TABLE_MICRO)
    il = f"(length(bin({expr})) - 1)"
    if engine == "spark":
        m = (
            f"CASE WHEN {il} <= 8 THEN {expr} * shiftleft(1, 8 - {il})"
            f" ELSE shiftright({expr}, {il} - 8) END"
        )
        return (
            f"(CAST({il} AS BIGINT) * 1000000"
            f" + element_at(array({table}), CAST({m} - 255 AS INT)))"
        )
    if engine == "duckdb":
        m = (
            f"CASE WHEN {il} <= 8 THEN {expr} * (1 << CAST(8 - {il} AS INT))"
            f" ELSE {expr} >> CAST({il} - 8 AS INT) END"
        )
        return f"(CAST({il} AS BIGINT) * 1000000 + ([{table}])[CAST({m} - 255 AS INT)])"
    raise ValueError(f"unknown engine: {engine}")


# Fixed-point base-2 EXP for micro-bit exponents — the inverse of
# LOG2_TABLE_MICRO, same published-constant discipline: 2^x where
# x = x_micro/10⁶ is computed as TABLE[frac·256 DIV 10⁶] shifted by
# floor(x) bits, with TABLE[i] = round(2^(i/256)·10⁶) as integer
# literals. All decisions are shifts, integer div/mod, and a lookup —
# Spark, DuckDB, and Python agree bit-for-bit. Truncating the fraction
# to 8 bits under-reads 2^x by < 2^(1/256)−1 ≈ 0.27% (one-sided,
# deterministic); exact at integer exponents (frac 0 → TABLE[0]=10⁶).
EXP2_TABLE_MICRO: tuple[int, ...] = tuple(
    round(2 ** (i / 256) * 1_000_000) for i in range(256)
)

# |floor(x)| beyond these puts 2^x·10⁶ outside int64 (positive side)
# or below one micro-unit (negative side)
_EXP2_MAX_IL = 42
_EXP2_MIN_IL = -40


def exp2_micro_int(x_micro: int) -> int:
    """Python twin of the EXP2_TABLE_MICRO lookup: 2^(x_micro/10⁶) in
    micro-units. Domain: floor exponent in [-40, 42] (raises outside —
    the int64 / one-micro-unit envelope)."""
    il, frac = divmod(int(x_micro), 1_000_000)
    if not (_EXP2_MIN_IL <= il <= _EXP2_MAX_IL):
        raise ValueError(f"exp2_micro exponent {x_micro} outside envelope")
    v = EXP2_TABLE_MICRO[frac * 256 // 1_000_000]
    return v << il if il >= 0 else v >> (-il)


def exp2_micro_sql(expr: str, engine: str = "spark") -> str:
    """Generated-SQL form of exp2_micro over a BIGINT micro-bit
    exponent expression. ``expr`` is re-referenced (pass a simple
    column reference); out-of-envelope exponents are the CALLER's
    contract (the SQL form shifts blindly — validate upstream or keep
    inputs in-domain by construction, e.g. temperature weights over
    positive int64 counts at alpha <= 1 stay below 2^48·10⁶ / 10⁶…
    see curation.temperature_weights)."""
    table = ", ".join(str(v) for v in EXP2_TABLE_MICRO)
    if engine == "spark":
        il = f"((({expr}) - pmod({expr}, 1000000)) DIV 1000000)"
        frac = f"pmod({expr}, 1000000)"
        v = f"element_at(array({table}), CAST({frac} * 256 DIV 1000000 AS INT) + 1)"
        return (
            f"(CASE WHEN {il} >= 0 THEN {v} * shiftleft(CAST(1 AS BIGINT), CAST({il} AS INT))"
            f" ELSE {v} DIV shiftleft(CAST(1 AS BIGINT), CAST(-({il}) AS INT)) END)"
        )
    if engine == "duckdb":
        il = f"CAST((({expr}) - (((({expr}) % 1000000) + 1000000) % 1000000)) / 1000000 AS BIGINT)"
        frac = f"(((({expr}) % 1000000) + 1000000) % 1000000)"
        v = f"([{table}])[CAST({frac} * 256 // 1000000 AS INT) + 1]"
        return (
            f"(CASE WHEN {il} >= 0 THEN {v} * (CAST(1 AS BIGINT) << CAST({il} AS INT))"
            f" ELSE {v} >> CAST(-({il}) AS INT) END)"
        )
    raise ValueError(f"unknown engine: {engine}")


def log2_interp_micro_int(c: int) -> int:
    """FINE fixed-point log2: the 8-bit mantissa table linearly
    interpolated through the remaining mantissa bits — granularity
    ~1 micro-bit instead of the table's ~5600 (curvature error within
    a 1/256 bin ≤ ~6 µbits, systematic and engine-identical). Built
    for :func:`operators.curation.weighted_sample`'s A-ES keys, where
    the COARSE table measurably distorts the draw: ~1/256 of items
    share the top log bin with IDENTICAL key numerators, and the
    division by w then ranks that bin by weight alone (measured: a
    5:1 weight class won 1.4× its proportional share at n=1). All
    integer shifts/div/lookups — Spark, DuckDB, Python agree
    bit-for-bit; exact at powers of two (interpolation term 0)."""
    if c <= 0:
        raise ValueError("log2_interp_micro requires a positive integer")
    il = c.bit_length() - 1
    if il <= 8:
        m = c << (8 - il)
        r, span = 0, 1
    else:
        m = c >> (il - 8)
        r = c - (m << (il - 8))
        span = 1 << (il - 8)
        # cap the fraction at 20 bits: delta*r stays < 5625*2^20 for
        # ANY int64 input (granularity ~0.005 µbit — far below the
        # 1-µbit output unit), instead of overflowing past il ~ 60
        if il - 8 > 20:
            r >>= il - 28
            span = 1 << 20
    base = il * 1_000_000 + LOG2_TABLE_MICRO[m - 256]
    nxt = 1_000_000 if m == 511 else LOG2_TABLE_MICRO[m - 255]
    return base + (nxt - LOG2_TABLE_MICRO[m - 256]) * r // span


def log2_interp_micro_sql(expr: str, engine: str = "spark") -> str:
    """Generated-SQL form of :func:`log2_interp_micro_int` — same
    contract as log2_micro_sql (pass a simple column reference)."""
    table = ", ".join(str(v) for v in LOG2_TABLE_MICRO)
    il = f"(length(bin({expr})) - 1)"
    if engine == "spark":
        m = (
            f"CASE WHEN {il} <= 8 THEN {expr} * shiftleft(1, 8 - {il})"
            f" ELSE shiftright({expr}, {il} - 8) END"
        )
        cur = f"element_at(array({table}), CAST(({m}) - 255 AS INT))"
        nxt = (
            f"CASE WHEN ({m}) = 511 THEN 1000000"
            f" ELSE element_at(array({table}), CAST(({m}) - 254 AS INT)) END"
        )
        r_raw = f"({expr} - shiftleft(CAST({m} AS BIGINT), {il} - 8))"
        r = (
            f"CASE WHEN {il} <= 8 THEN CAST(0 AS BIGINT)"
            f" WHEN {il} - 8 > 20 THEN shiftright({r_raw}, {il} - 28)"
            f" ELSE {r_raw} END"
        )
        span = (
            f"CASE WHEN {il} <= 8 THEN CAST(1 AS BIGINT)"
            f" WHEN {il} - 8 > 20 THEN CAST(1048576 AS BIGINT)"
            f" ELSE shiftleft(CAST(1 AS BIGINT), {il} - 8) END"
        )
        return (
            f"(CAST({il} AS BIGINT) * 1000000 + {cur}"
            f" + (({nxt}) - ({cur})) * ({r}) DIV ({span}))"
        )
    if engine == "duckdb":
        m = (
            f"CASE WHEN {il} <= 8 THEN {expr} * (1 << CAST(8 - {il} AS INT))"
            f" ELSE {expr} >> CAST({il} - 8 AS INT) END"
        )
        cur = f"([{table}])[CAST(({m}) - 255 AS INT)]"
        nxt = (
            f"CASE WHEN ({m}) = 511 THEN 1000000"
            f" ELSE ([{table}])[CAST(({m}) - 254 AS INT)] END"
        )
        r_raw = f"({expr} - (CAST({m} AS BIGINT) << CAST({il} - 8 AS INT)))"
        r = (
            f"CASE WHEN {il} <= 8 THEN CAST(0 AS BIGINT)"
            f" WHEN {il} - 8 > 20 THEN ({r_raw} >> CAST({il} - 28 AS INT))"
            f" ELSE {r_raw} END"
        )
        span = (
            f"CASE WHEN {il} <= 8 THEN CAST(1 AS BIGINT)"
            f" WHEN {il} - 8 > 20 THEN CAST(1048576 AS BIGINT)"
            f" ELSE (CAST(1 AS BIGINT) << CAST({il} - 8 AS INT)) END"
        )
        return (
            f"(CAST({il} AS BIGINT) * 1000000 + {cur}"
            f" + (({nxt}) - ({cur})) * ({r}) // ({span}))"
        )
    raise ValueError(f"unknown engine: {engine}")
