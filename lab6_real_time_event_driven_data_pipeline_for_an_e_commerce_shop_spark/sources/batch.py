"""Batch sources: schema-enforced CSV / Parquet / JSON readers.

Replaces the reference's hand-rolled ingest (S1-S5, S10-S12 in
SURVEY.md §2.1): ``pd.read_csv`` over S3 bodies (reference
glue_job.py:169-170), pyarrow footer reads (validate.py:184-187) and
boto3 listings (transform.py:86-97) all collapse into Spark's native
readers, which are distributed, columnar, and predicate-pushdown-aware.

Scale notes:
- Readers always take an explicit ``StructType`` — dynamic inference
  reads the data twice and can silently drift (SURVEY.md §1.4).
- Corrupt CSV rows are quarantined via ``columnNameOfCorruptRecord``
  (PERMISSIVE mode) instead of failing the job.
- ``load_table`` for parquet relies on footer metadata for schema; no
  full scan happens until an action.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    header: bool = True,
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Schema-enforced CSV scan (reference S1, glue_job.py:169-170).

    Extra columns in the file are tolerated (the reference's subset
    check, glue_job.py:172-174) because the explicit schema simply
    ignores them. Corrupt rows land in ``_corrupt_record`` instead of
    aborting.
    """
    # Subset semantics (reference glue_job.py:172-174): extra columns in
    # the file are tolerated. PERMISSIVE would flag rows with surplus
    # tokens as corrupt under the narrow schema, so peek the header and
    # widen the read schema with string-typed extras, then project them
    # away. The peek reads one line, not the data.
    declared = {f.name: f for f in schema.fields}
    actual_cols = spark.read.option("header", header).csv(path).columns
    extras = [c for c in actual_cols if c not in declared]
    fields = [
        declared[c] if c in declared else T.StructField(c, T.StringType(), True)
        for c in actual_cols
        if c in declared or c in extras
    ]
    # expected columns missing from the file still need schema slots so
    # downstream code sees the full declared shape (they read as null)
    fields += [f for name, f in declared.items() if name not in actual_cols]
    read_schema = T.StructType(fields)
    if quarantine_corrupt and CORRUPT_COL not in read_schema.fieldNames():
        read_schema = T.StructType(
            list(read_schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    out = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(read_schema)
        .csv(path)
    )
    keep = [f.name for f in schema.fields] + (
        [CORRUPT_COL] if CORRUPT_COL in read_schema.fieldNames() else []
    )
    return out.select(*keep)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean, corrupt) DataFrames.

    The input is cached first: Spark refuses to filter a lazy CSV scan
    on the internal corrupt-record column alone (SPARK-28058), and the
    cache also guarantees both halves observe the same parse."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, corrupt


def read_parquet(
    spark: SparkSession, path: str | list[str], schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan (reference S4/S5, transform.py:286-290).

    Multi-file scans pass a list, mirroring
    ``spark.read.parquet(*paths)`` in the reference — already idiomatic
    there; kept identical here.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(path, (list, tuple)):
        return reader.parquet(*path)
    return reader.parquet(path)


def read_orc(
    spark: SparkSession, path: str | list[str], schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan — beyond the reference's format surface (CSV/parquet/
    JSON), but free in Spark (built-in vectorized reader with the same
    predicate-pushdown/column-pruning machinery as parquet) and common
    in Hive-lineage lakes an engine user migrates from. Same signature
    contract as read_parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(path, (list, tuple)):
        return reader.orc(*path)
    return reader.orc(path)


def read_json(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON document scan (S11): schema-on-read unless a schema is
    pinned (pin one in production — inference is an extra pass).
    ``multiline`` for whole-file documents vs JSON-lines."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    if isinstance(path, (list, tuple)):
        return reader.json(*path)
    return reader.json(path)


def write_json(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """JSON-lines write (S12), partition-aware."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.json(path)


def read_text(
    spark: SparkSession, path: str | list[str], whole_file: bool = False
) -> DataFrame:
    """Raw text scan: one row per line (``value`` string), or one row
    per FILE with ``wholetext`` — the raw-corpus entry point for the
    documents pipeline (each crawl file becomes one document row).
    NB: wholetext must go through the reader kwarg — the bare
    ``option("wholetext", ...)`` spelling is ignored by the text
    source (verified against Spark 4.1)."""
    if isinstance(path, (list, tuple)):
        return spark.read.text(list(path), wholetext=whole_file)
    return spark.read.text(path, wholetext=whole_file)


def write_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """ORC write (snappy), partition-aware — the S2 twin for ORC lakes."""
    writer = df.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.orc(path)


def parquet_schema(spark: SparkSession, path: str) -> T.StructType:
    """Metadata-only schema resolution (reference S3, validate.py:184-187).

    Spark resolves parquet schema from footers without scanning row
    groups, so this is the same cheap footer read the reference does
    with pyarrow — minus the driver-side byte shuffling.
    """
    return spark.read.parquet(path).schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def classify_path(path: str) -> str | None:
    """Path→file-type routing (reference P7, glue_job.py:69-81).

    Substring match on the directory component, exactly the reference's
    semantics (``orders/`` vs ``order_items/`` vs ``products/``), with
    the same subtlety that ``order_items`` must be tested before
    ``orders`` would match as a substring — the reference dodges this by
    matching ``/orders/`` with slashes; we do the same.
    """
    for table in ("order_items", "orders", "products"):
        if f"/{table}/" in path or path.startswith(f"{table}/"):
            return table
    return None


def classify_path_col(path_col: F.Column) -> F.Column:
    """Columnar version of :func:`classify_path` for use with
    ``input_file_name()`` in distributed scans."""
    return (
        F.when(path_col.contains("/order_items/"), F.lit("order_items"))
        .when(path_col.contains("/orders/"), F.lit("orders"))
        .when(path_col.contains("/products/"), F.lit("products"))
        .otherwise(F.lit(None).cast("string"))
    )


def to_parquet_key(key: str) -> str:
    """P8 (reference glue_job.py:176): landing CSV key → converted
    parquet object name (basename swap)."""
    base = os.path.basename(key)
    return base[: -len(".csv")] + ".parquet" if base.endswith(".csv") else base + ".parquet"


def normalize_s3_scheme(path: str) -> str:
    """P8 (reference transform.py:289): ``s3://`` → ``s3a://`` so Spark's
    Hadoop S3A connector handles the URI."""
    return "s3a://" + path[len("s3://"):] if path.startswith("s3://") else path


def to_parquet_key_col(key_col: F.Column) -> F.Column:
    """Columnar :func:`to_parquet_key` for distributed file inventories:
    basename via element_at(split(...), -1), extension swap via
    regexp_replace — no UDF."""
    base = F.element_at(F.split(key_col, "/"), -1)
    return F.concat(F.regexp_replace(base, r"\.csv$", ""), F.lit(".parquet"))
