"""Data layout optimization for scan pruning at rest — Z-ORDER writes.

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group/file min-max stats prune scans, but they only help
if the data layout CLUSTERS the filtered columns. A plain sort
clusters one column perfectly and leaves the others uniform; Z-order
(Morton) interleaving clusters N columns simultaneously — every file
covers a small hyper-rectangle of the key space, so predicates on ANY
of the z-columns skip most files (the same technique Delta/Iceberg
expose as OPTIMIZE ZORDER BY; here as a plain-parquet write helper).

Spark-first shape: the Morton key is a pure JVM expression tree
(bit shifts/masks — whole-stage codegen, no UDF), the normalization
bounds come from ONE bounded agg row, and the clustered write is
``repartitionByRange(z) + sortWithinPartitions(z)`` — one shuffle,
after which the layout pays back on every future scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i*n + j.
    n*bits must stay ≤ 63 (signed long)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Returns (df+bounds, morton_key_column) where each input column is
    min-max normalized to [0, 2^bits) using bounds from one bounded
    aggregation (a single broadcast row — the only driver-side data).
    Works for any numeric/date/timestamp-integer column; constant
    columns normalize to 0."""
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_zmin_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_zmax_{c}") for c in cols],
    )
    with_b = df.join(F.broadcast(bounds))
    scale = float((1 << bits) - 1)
    quantized = []
    for c in cols:
        lo, hi = F.col(f"_zmin_{c}"), F.col(f"_zmax_{c}")
        span = hi - lo
        q = F.when(
            span > 0,
            F.floor((F.col(c).cast("double") - lo) / span * F.lit(scale)),
        ).otherwise(F.lit(0)).cast("long")
        quantized.append(q)
    return with_b, _interleave(quantized, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton key (→ n_files files covering
    disjoint key ranges) and sort within each — row-group stats then
    bound every file to a small hyper-rectangle over ALL z-columns.
    The helper drops the transient key/bounds columns before writing."""
    with_b, z = zorder_key(df, cols, bits)
    drop = [f"_zmin_{c}" for c in cols] + [f"_zmax_{c}" for c in cols]
    (
        with_b.withColumn("_zkey", z)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", *drop)
        .write.mode("overwrite")
        .parquet(path)
    )


def _stat_to_float(v) -> float:
    """Coerce a parquet footer statistic to a comparable float by
    physical type (r6 ADVICE fix): datetimes → epoch seconds, dates →
    ordinal days, Decimal → float, bool → 0/1. Strings/bytes have no
    meaningful numeric span — rejected explicitly rather than silently
    mis-ranked by float() of a repr."""
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, bool):
        return float(v)
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.timestamp() if v.tzinfo else v.replace(
            tzinfo=_dt.timezone.utc
        ).timestamp()
    if isinstance(v, _dt.date):
        return float(v.toordinal())
    if isinstance(v, _dec.Decimal):
        return float(v)
    raise TypeError(
        f"file_span_profile: non-numeric footer statistic {type(v).__name__}"
        " — span is only meaningful for numeric/temporal/decimal columns"
    )


def file_span_profile(path: str, cols: list[str]) -> dict[str, float]:
    """Layout quality metric from parquet FOOTERS only (no data read):
    for each column, the mean over files of (file max − file min) /
    (global max − global min) — 1.0 ≈ every file spans the whole
    domain (no pruning possible), → 0 ≈ perfectly clustered. The
    pruning win of a predicate on that column is ~1/span.

    Accepts numeric, temporal (date/timestamp, matching zorder_key's
    domain), and decimal columns; raises TypeError for string/binary
    stats rather than mis-ranking byte-string mins."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    spans: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for f in files:
        md = pq.read_metadata(f)
        per_col: dict[str, tuple[float, float]] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for i in range(g.num_columns):
                col = g.column(i)
                name = col.path_in_schema
                if name not in spans:
                    continue
                try:
                    st = col.statistics
                    raw = None if st is None else (st.min, st.max)
                except TypeError:
                    raise
                except Exception as e:  # pyarrow can't decode some
                    # logical types' stats (e.g. DECIMAL min/max) —
                    # name the column instead of leaking an Arrow
                    # internal
                    raise TypeError(
                        f"file_span_profile: unreadable footer "
                        f"statistics for column {name!r}: {e}"
                    ) from e
                if raw is not None:
                    lo, hi = _stat_to_float(raw[0]), _stat_to_float(raw[1])
                    cur = per_col.get(name)
                    per_col[name] = (
                        (min(cur[0], lo), max(cur[1], hi)) if cur else (lo, hi)
                    )
        for name, lohi in per_col.items():
            spans[name].append(lohi)
    out = {}
    for c, lohis in spans.items():
        glo = min(lo for lo, _ in lohis)
        ghi = max(hi for _, hi in lohis)
        width = (ghi - glo) or 1.0
        out[c] = sum((hi - lo) / width for lo, hi in lohis) / max(len(lohis), 1)
    return out
