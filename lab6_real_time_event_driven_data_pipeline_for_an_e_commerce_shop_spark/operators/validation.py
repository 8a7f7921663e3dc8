"""Data-quality validation: rules-as-data compiled to Column predicates.

The reference validates row-at-a-time in pandas on a single node
(validate.py:199-247). Here every rule becomes a declarative ``Column``
expression, so validation is a distributed scan with predicate pushdown
— one pass over the data computes every rule via conditional aggregates
(no per-rule rescans), and the valid/quarantine split is a filter.

Rule classes (SURVEY.md §2.3, reference citations):
- F2  domain:        status ∈ VALID_ORDER_STATUSES     (validate.py:226-230)
- F3  range:         price columns ≥ 0                 (validate.py:231-238)
- N1  null-check:    key columns non-null              (validate.py:218-222)
- U2  uniqueness:    each key column unique PER-COLUMN (validate.py:223-224 —
      the composite PK of order_items is deliberately checked as two
      independent constraints; preserved quirk)
- T1  dtype:         num_of_item integer               (validate.py:241-243)
- header checks: missing / duplicate columns           (validate.py:187-193)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schemas


@dataclass(frozen=True)
class Rule:
    """One data-quality rule: ``violation`` is a boolean Column expression
    that is True for BAD rows."""

    name: str
    kind: str  # domain | range | not_null | unique | dtype
    columns: tuple[str, ...]
    params: dict = field(default_factory=dict)

    def violation(self) -> F.Column:
        col = F.col(self.columns[0])
        if self.kind == "domain":
            return ~col.isin(list(self.params["valid"])) & col.isNotNull()
        if self.kind == "range":
            return col < F.lit(self.params.get("min", 0))
        if self.kind == "not_null":
            return col.isNull()
        raise ValueError(f"{self.kind} rules are not row-local")


def rules_for(table: str) -> list[Rule]:
    """Standard rule set for an e-commerce table, straight from the
    constraint metadata in :mod:`schemas` (single source of truth)."""
    rules: list[Rule] = []
    for c in schemas.UNIQUE_KEYS.get(table, []):
        rules.append(Rule(f"{table}.{c}.not_null", "not_null", (c,)))
        rules.append(Rule(f"{table}.{c}.unique", "unique", (c,)))
    if table == "orders":
        rules.append(
            Rule("orders.status.domain", "domain", ("status",),
                 {"valid": schemas.VALID_ORDER_STATUSES})
        )
    for c in schemas.NON_NEGATIVE_COLUMNS.get(table, []):
        rules.append(Rule(f"{table}.{c}.non_negative", "range", (c,), {"min": 0}))
    return rules


def violation_counts(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """ONE distributed pass computing every row-local rule's violation
    count (the reference does one pandas scan per rule). Uniqueness
    rules (not row-local) are appended via per-key groupBy counts.

    Returns (rule_name string, violations bigint).
    """
    row_local = [r for r in rules if r.kind in ("domain", "range", "not_null")]
    uniques = [r for r in rules if r.kind == "unique"]

    parts: list[DataFrame] = []
    if row_local:
        aggs = [
            F.sum(F.when(r.violation(), 1).otherwise(0)).cast("long").alias(r.name)
            for r in row_local
        ]
        wide = df.agg(*aggs)
        # unpivot to (rule_name, violations)
        stack_expr = ", ".join(f"'{r.name}', `{r.name}`" for r in row_local)
        parts.append(
            wide.selectExpr(
                f"stack({len(row_local)}, {stack_expr}) as (rule_name, violations)"
            )
        )
    for r in uniques:
        c = r.columns[0]
        dup = (
            df.groupBy(c)
            .count()
            .filter(F.col("count") > 1)
            .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("long")
                 .alias("violations"))
            .select(F.lit(r.name).alias("rule_name"), "violations")
        )
        parts.append(dup)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def split_valid(df: DataFrame, rules: list[Rule]) -> tuple[DataFrame, DataFrame]:
    """Valid / quarantine split on row-local rules (the streaming
    quality gate, SURVEY.md §2.6 ST8). Quarantine keeps every column
    plus a ``_violated_rules`` array naming the failed rules."""
    row_local = [r for r in rules if r.kind in ("domain", "range", "not_null")]
    if not row_local:
        return df, df.limit(0).withColumn("_violated_rules", F.array().cast("array<string>"))
    flags = F.array_compact(
        F.array(*[F.when(r.violation(), F.lit(r.name)) for r in row_local])
    )
    tagged = df.withColumn("_violated_rules", flags)
    valid = tagged.filter(F.size("_violated_rules") == 0).drop("_violated_rules")
    quarantine = tagged.filter(F.size("_violated_rules") > 0)
    return valid, quarantine


def check_header(actual_columns: list[str], expected_columns: list[str]) -> list[str]:
    """Header validation (reference validate.py:187-193 +
    glue_job.py:172-174): missing expected columns AND duplicated actual
    columns are both fatal. Returns a list of issues (empty = ok)."""
    issues = []
    missing = [c for c in expected_columns if c not in actual_columns]
    if missing:
        issues.append(f"missing columns: {sorted(missing)}")
    seen: set[str] = set()
    dupes = sorted({c for c in actual_columns if c in seen or seen.add(c)})
    if dupes:
        issues.append(f"duplicate columns: {dupes}")
    return issues


def integer_dtype_check(df: DataFrame, column: str) -> bool:
    """T1 (reference validate.py:241-243): schema-level integer assertion."""
    dtype = dict(df.dtypes).get(column)
    return dtype in ("int", "bigint", "smallint", "tinyint")


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column completeness/cardinality profile — the dataset-level
    companion of the row-level checks above (the reference's
    validate.py walks columns for nulls/dtypes; this is that idea as
    ONE relational pass): a row per column with n_rows, n_nulls,
    n_distinct (exact, NULL-excluded). Values are rendered to STRING
    for the melt (both engines' numeric→string renderings are
    injective, so distinct counts are rendering-independent).

    Scale shape: melt (stack, a zero-shuffle projection) multiplies
    rows by the profiled column count, then ONE two-level aggregate —
    groupBy(col, value) partial-combines before the (col) rollup, so
    the shuffle carries at most Σ per-column distinct values, not
    rows×cols. Exactness is the point here; for a cheaper approximate
    profile at extreme cardinalities, feed the same melt through the
    portable HLL sketch (operators/sketches) instead."""
    cols = columns or df.columns
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, value)")
    )
    per_val = melted.groupBy("col_name", "value").agg(F.count("*").alias("cnt"))
    prof = per_val.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("_n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("_n_nulls"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("_n_distinct"),
    )
    # one row per profiled column even when df is EMPTY (the melt of an
    # empty frame aggregates to nothing; an all-zero profile row is the
    # correct answer — and what a per-column COUNT oracle returns)
    skeleton = df.sparkSession.createDataFrame(
        [(c,) for c in cols], "col_name string"
    )
    return skeleton.join(F.broadcast(prof), "col_name", "left").select(
        "col_name",
        F.coalesce("_n_rows", F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce("_n_nulls", F.lit(0)).cast("long").alias("n_nulls"),
        F.coalesce("_n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
    )
