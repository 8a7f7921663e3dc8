"""DuckDB-oracle parity harness — a local replica of the driver's
correctness gate (row-count + order-insensitive value comparison at
sf0.01). Every catalog query with an oracle must match EXACTLY.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float64 repr — matches the real driver's exact-value
        # hash (r7 ADVICE removed the 9dp rounding)
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    qfn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)

    sdf = qfn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    if oracle is None:
        assert len(spark_rows) >= 0  # rows-only check, mirroring the driver
        return

    con = _duck(SF_DIR)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _normalize(spark_rows, spark_cols)
    d = _normalize(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


# DuckDB logical types whose pandas .df() rendering is dtype-safe,
# keyed by the Spark-side type class they must pair with. Anything
# outside these sets (HUGEINT, DECIMAL, UHUGEINT, INTERVAL, ...) is
# comparator-unsafe: e.g. HUGEINT -> float64 in .df() while Spark
# emits int64 -> the driver's value hash mismatches (r6's q20).
_DUCK_OK = {
    "integral": {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"},
    "floating": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_gated_output_types_are_comparator_safe(spark, name):
    """The driver canonicalizes both sides through pandas: array/map/
    struct columns crash its sort (unhashable), and DECIMAL columns
    hash differently per engine (DuckDB .df() → float64, Spark
    toPandas() → Decimal objects — r1's q43 mismatch). Gated queries
    therefore emit only scalar, non-decimal columns; rows-only queries
    are exempt (the driver only counts their rows).

    r7: the ORACLE side is swept too (planning-only, `con.sql().types`)
    — DuckDB must type every column dtype-compatibly with Spark after
    pandas conversion. r6's q20 shipped a window-SUM HUGEINT (→ float64
    in .df() vs Spark int64) that fetchall()-based checks cannot see;
    this closes the whole comparator-dtype class at the source."""
    from pyspark.sql import types as T

    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        return
    schema = entrymod.queries()[name](spark, SF_DIR).schema
    banned = (T.DecimalType, T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    for field in schema.fields:
        assert not isinstance(field.dataType, banned), (
            f"{name}.{field.name}: {field.dataType} is unsafe for the "
            "driver's pandas-based cross-engine comparator"
        )

    con = _duck(SF_DIR)
    rel = con.sql(oracle)
    duck_types = dict(zip(rel.columns, (str(t) for t in rel.types)))
    spark_kind = {
        f.name: (
            "integral" if isinstance(
                f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
            )
            else "floating" if isinstance(f.dataType, (T.DoubleType, T.FloatType))
            else "string" if isinstance(f.dataType, T.StringType)
            else "boolean" if isinstance(f.dataType, T.BooleanType)
            else "date" if isinstance(f.dataType, T.DateType)
            else "timestamp" if isinstance(
                f.dataType, (T.TimestampType, T.TimestampNTZType)
            )
            else "other"
        )
        for f in schema.fields
    }
    for col, kind in spark_kind.items():
        dt = duck_types.get(col)
        assert dt is not None, f"{name}.{col}: missing from oracle output"
        if kind == "timestamp":
            assert dt.startswith("TIMESTAMP"), (
                f"{name}.{col}: Spark timestamp vs DuckDB {dt}"
            )
        elif kind != "other":
            assert dt in _DUCK_OK[kind], (
                f"{name}.{col}: Spark {kind} vs DuckDB {dt} — .df() will "
                "coerce to a different pandas dtype than Spark toPandas() "
                "(the r6 q20 HUGEINT class)"
            )


def test_catalog_fits_driver_gate():
    """The driver verifies at most 50 queries per round (r1 recorded
    exactly q01-q50 of 61 declared). Everything declared must fit."""
    assert len(entrymod.queries()) <= 50


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "order_date", "total_orders", "total_revenue",
        "total_items_sold", "return_rate", "unique_customers",
    ]


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_PARITY"),
    reason="slow 10x-scale parity sweep; enable with SPARK_GRAFT_FULL_PARITY=1",
)
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_sf01(spark, name):
    """Same oracle gate at sf0.1 (10x the driver's scale) — catches
    magnitude-dependent float hazards (e.g. the DuckDB decimal→double
    double-rounding that only appears once scaled sums pass 2^53)."""
    qfn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        pytest.skip("no oracle for this query (rows-only at the gate)")
    sf_dir = "/root/testdata/sf0.1"
    sdf = qfn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_PARITY"),
    reason="off-gate-SF parity sweep; enable with SPARK_GRAFT_FULL_PARITY=1",
)
@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle_sf0001(spark, name):
    """Same oracle gate at sf0.001 (a DIFFERENT slice of the key space,
    not just a smaller one) — r8 found a real latent bug this way:
    sf0.001's 40-orderkey q37 slice contains duplicate
    (l_orderkey, l_partkey) pairs that sf0.01/sf0.1's slices happen to
    lack, which silently collapsed in the (order_id, product_id)-keyed
    silver MERGE. Every query must match its oracle on every testdata
    SF, not only the driver's gate SF."""
    qfn = entrymod.queries()[name]
    oracle = entrymod.oracle_sql().get(name)
    if oracle is None:
        pytest.skip("no oracle for this query (rows-only at the gate)")
    sf_dir = "/root/testdata/sf0.001"
    sdf = qfn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    con = _duck(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)


def test_q37_merge_pk_contract_with_synthesized_duplicate_pairs(spark, tmp_path):
    """r8 VERDICT ask: pin the silver-MERGE PK contract INDEPENDENT of
    testdata luck. The r8 q37 bug (feed rows violating the reference's
    (order_id, product_id) MERGE key, transform.py:331-336) was latent
    because the gate SFs' 40-orderkey slices happened to contain zero
    duplicate (l_orderkey, l_partkey) pairs. Here the duplicates are
    INJECTED directly: a copy of sf0.001 whose lineitem gains two extra
    line numbers for an existing pair inside the q37 slice, with
    different prices and a flipped return flag. The test fails two ways
    if the first-line-number QUALIFY is removed:
      - from the feed builder: the duplicate-pair source now trips the
        strict merge (upsert.check_source_unique raises), and
      - from the oracle only: values diverge (the extra rows carry
        different sale prices).
    """
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf_dup")
    os.makedirs(sf_dir)
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{sf_dir}/{t}.parquet")

    li = pq.read_table(f"{sf_dir}/lineitem.parquet")
    orders = pq.read_table(f"{src}/orders.parquet", columns=["o_orderkey"])
    k = min(orders.column("o_orderkey").to_pylist())  # guaranteed in the 40-key slice
    df = li.to_pandas()
    rows = df[df.l_orderkey == k]
    assert len(rows) > 0
    base = rows.iloc[0].copy()
    maxln = int(rows.l_linenumber.max())
    extra1, extra2 = base.copy(), base.copy()
    extra1.l_linenumber, extra1.l_extendedprice = maxln + 1, 111.11
    extra1.l_returnflag = "R" if base.l_returnflag != "R" else "N"
    extra2.l_linenumber, extra2.l_extendedprice = maxln + 2, 222.22
    import pandas as pd

    out = pd.concat([df, extra1.to_frame().T, extra2.to_frame().T], ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=li.schema, preserve_index=False),
        f"{sf_dir}/lineitem.parquet",
    )

    name = "q37_stream_medallion_gold"
    sdf = entrymod.queries()[name](spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = _duck(sf_dir).execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows) > 0
    assert _normalize(spark_rows, sdf.columns) == _normalize(duck_rows, duck_cols)


# ---------------------------------------------------------------------------
# Parked (gate-ready, unslotted) queries — r12
# ---------------------------------------------------------------------------


def _duck_one(path: str, table: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM '{path}'")
    return con


def _run_parked(spark, name, sf_dir, con):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        queries as q,
    )

    pq = q.parked()[name]
    sdf = pq.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(pq.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    s = _normalize(spark_rows, sdf.columns)
    d = _normalize(duck_rows, duck_cols)
    assert s == d, f"{name}: value mismatch, first diffs: "\
        f"{[(a, b) for a, b in zip(s, d) if a != b][:5]}"
    return spark_rows, sdf.columns


def test_parked_semdedup_flags_planted_structure(spark, tmp_path):
    """r12 (VERDICT r11 #6): the parked q62 SemDeDup flags are
    GATE-READY — on a synthetic embeddings corpus WITH planted
    near-dup structure (the real corpus has exactly one ≥0.5-cos pair,
    measured r11), the Spark plan and the DuckDB oracle must agree
    value-for-value under the driver-faithful comparator, and the
    structure must actually engage (drops happen, multiple cells)."""
    import pyspark.sql.types as T

    dim = 16
    # each cluster has ONE dominant coordinate (argmin cell unique and
    # perturbation-stable: gap 0.4 ≫ eps) and cosine ≤ 0.395 to every
    # axis seed — inside its cell but below τ vs the seed vector
    base_a = [1.0 if i == 0 else 0.6 for i in range(dim)]
    base_b = [1.0 if i == 8 else 0.6 for i in range(dim)]

    def perturb(v, eps):
        return [float(x + eps * ((j % 5) - 2)) for j, x in enumerate(v)]

    rows = []
    # 16 scaled one-hot vectors (ids 0-15 — exactly the IVF seeds):
    # mutually orthogonal, and cos(one-hot, base_a) ≤ 0.39 < τ=0.5,
    # cos(one-hot, base_b) ≤ 0.33 — no accidental cross-cluster drops
    for i in range(16):
        rows.append(
            (i, [9.0 if j == i else 0.0 for j in range(dim)], 0)
        )
    # planted cluster A: ids 20-23 near-identical
    for j, eps in enumerate((0.0, 0.001, 0.002, 0.003)):
        rows.append((20 + j, perturb(base_a, eps), 1))
    # planted cluster B: ids 30-31
    for j, eps in enumerate((0.0, 0.002)):
        rows.append((30 + j, perturb(base_b, eps), 2))
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    path = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(path)

    # Spark writes a directory of part files — glob it for DuckDB
    con = _duck_one(f"{path}/*.parquet", "embeddings")
    got, cols = _run_parked(
        spark, "q62_semdedup_flags", str(tmp_path), con
    )
    by_id = {r[cols.index("vec_id")]: r for r in got}
    kept_i = cols.index("kept")
    cell_i = cols.index("cell")
    # planted near-dups collapse to the lowest id in each cluster
    assert by_id[20][kept_i] == 1
    assert all(by_id[i][kept_i] == 0 for i in (21, 22, 23))
    assert by_id[30][kept_i] == 1 and by_id[31][kept_i] == 0
    # the seed sharing each cluster's cell survives (cos ≈ 0.395 < τ)
    assert by_id[0][kept_i] == 1 and by_id[8][kept_i] == 1
    # clusters are cell-coherent and the corpus spans multiple cells
    assert len({by_id[i][cell_i] for i in (20, 21, 22, 23)}) == 1
    assert len({r[cell_i] for r in got}) > 1
    # every vector gets a verdict
    assert len(got) == len(rows)


def test_parked_semdedup_flags_real_corpus(spark):
    """The parked query must ALSO match its oracle on the real (near-
    degenerate) corpus — exactness does not depend on the corpus having
    structure."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q62_semdedup_flags", SF_DIR, con)
    assert len(got) > 0


def test_parked_hard_negatives_real_corpus(spark):
    """The parked q65 hard-negative miner matches its relational oracle
    on the REAL corpus (10 balanced labels make it informative today,
    unlike q62/q63): IVF-cell scoping, the other-label filter, round-6
    cosine ranking and the id tie-break all agree value-for-value, and
    every anchor whose cell holds another label emits exactly k rows or
    fewer."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q65_hard_negatives", SF_DIR, con)
    assert len(got) > 0
    i_rank = cols.index("neg_rank")
    i_id = cols.index("vec_id")
    per_anchor = {}
    for r in got:
        per_anchor.setdefault(r[i_id], []).append(r[i_rank])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 3
               for v in per_anchor.values())


def test_parked_weighted_sample_real_corpus(spark):
    """The parked q66 A-ES weighted sample matches its oracle on the
    real corpus: per-source selection AND ranks agree (the draw is a
    pure function of published constants), every source emits at most
    10 rows with ranks 1..k."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q66_weighted_sample", SF_DIR, con)
    assert len(got) > 0
    i_src = cols.index("source")
    i_rank = cols.index("ws_rank")
    per_src = {}
    for r in got:
        per_src.setdefault(r[i_src], []).append(r[i_rank])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 10
               for v in per_src.values())


def test_parked_funnel_real_corpus(spark):
    """The parked q67 fixed-anchor funnel matches its MIN-chain oracle
    on the real corpus, with a non-degenerate reached distribution."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q67_funnel", SF_DIR, con)
    i = cols.index("reached")
    assert {r[i] for r in got} == {1, 2, 3}


def test_parked_table_profile_real_corpus(spark):
    """The parked q68 per-column profile matches the native-distinct
    oracle exactly (string-rendered melt vs native COUNT(DISTINCT) —
    injective renderings make them equal)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q68_table_profile", SF_DIR, con)
    assert len(got) == 5


def test_parked_temperature_sample_real_corpus(spark):
    """The parked q69 temperature-flattened draw matches its oracle
    (both published constant tables re-derived in SQL) and actually
    DIFFERS from q66's raw-weight draw somewhere — flattening changes
    the ranking, not just the weights."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q69_temperature_sample", SF_DIR, con)
    assert len(got) > 0
    i_id, i_rank = cols.index("doc_id"), cols.index("ws_rank")
    q69_pick = {(r[i_id], r[i_rank]) for r in got}
    got66, cols66 = _run_parked(spark, "q66_weighted_sample", SF_DIR, con)
    j_id, j_rank = cols66.index("doc_id"), cols66.index("ws_rank")
    q66_pick = {(r[j_id], r[j_rank]) for r in got66}
    assert q69_pick != q66_pick


def test_parked_value_outliers_real_corpus(spark):
    """The parked q70 median/MAD outlier detector matches its oracle
    exactly (cents-integerized medians are exact halves; every step of
    the chain is exact IEEE), with non-degenerate outlier counts."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q70_value_outliers", SF_DIR, con)
    i = cols.index("n_outliers")
    assert len(got) == 5 and all(r[i] > 0 for r in got)


def test_gated_bm25_retrieval_structure(spark):
    """q71 BM25 retrieval (GATED r14 — oracle parity is swept by the
    QUERY_NAMES parametrized gate) returns the right SHAPE: 5 hits per
    query, ranks 1..5, for all three literal queries."""
    sdf = entrymod.queries()["q71_bm25_retrieval"](spark, SF_DIR)
    got = [tuple(r) for r in sdf.collect()]
    cols = sdf.columns
    i_q, i_r = cols.index("query_id"), cols.index("rank")
    per_q = {}
    for r in got:
        per_q.setdefault(r[i_q], []).append(r[i_r])
    assert set(per_q) == {1, 2, 3}
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_parked_rrf_fusion_real_corpus(spark):
    """The parked q72 RRF fusion matches its oracle; the two retrievers
    are genuinely heterogeneous (some docs surfaced by only one list,
    some by both), and fused ranks are a permutation per query."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q72_rrf_fusion", SF_DIR, con)
    i_q, i_n, i_r = cols.index("query_id"), cols.index("n_lists"), cols.index("fused_rank")
    assert {r[i_n] for r in got} == {1, 2}
    per_q = {}
    for r in got:
        per_q.setdefault(r[i_q], []).append(r[i_r])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_gated_streamed_sessions_structure(spark):
    """q73 (GATED r15 — the q32 swap; oracle parity is swept by the
    QUERY_NAMES parametrized gate) runs the CHECKPOINTED GroupState
    session tracker over the real events table (one data batch +
    sentinel flush); the session structure is non-degenerate
    (multi-event sessions exist)."""
    sdf = entrymod.queries()["q73_streamed_sessions"](spark, SF_DIR)
    got = [tuple(r) for r in sdf.collect()]
    i_n = sdf.columns.index("n_events")
    assert len(got) > 100
    assert max(r[i_n] for r in got) >= 3


def test_parked_ingest_dedup_real_corpus(spark):
    """The parked q74 drains a three-wave derived feed through the
    checkpointed DedupIngest gate: originals admitted, whitespace
    variants rejected against the fingerprint STORE (cross-batch),
    suffixed new texts admitted — end state matches the relational
    first-arrival oracle exactly."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q74_ingest_dedup", SF_DIR, con)
    i_id = cols.index("doc_id")
    ids = {r[i_id] for r in got}
    n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]
    # nothing from the +1e6 variant band; the +2e6 band fully admitted
    # (its per-id suffixes make every text unique). Originals kept =
    # n_docs MINUS any exact-dup collapses — sf0.01 currently has none
    # but sf0.1 has 8, so compare against n_docs, not band-vs-band
    # (the r8 latent-at-gate-SF test-brittleness class).
    assert not {i for i in ids if 1_000_000 <= i < 2_000_000}
    assert len({i for i in ids if i >= 2_000_000}) == n_docs
    assert 0 < len({i for i in ids if i < 1_000_000}) <= n_docs


def test_parked_cohort_retention_real_corpus(spark):
    """The parked q75 customer cohort-retention matrix (28-day
    first-order cohorts) matches its relational oracle exactly on the
    real orders table, with non-degenerate structure: many cohorts,
    offset-0 rows at exactly 10⁶ ppm, and at least one cell strictly
    between 0 and 10⁶ ppm (real decay, not all-or-nothing)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q75_cohort_retention", SF_DIR, con)
    i_c, i_o, i_p = (cols.index("cohort_period"), cols.index("period_offset"),
                     cols.index("retention_ppm"))
    assert len({r[i_c] for r in got}) >= 5
    assert all(r[i_p] == 1_000_000 for r in got if r[i_o] == 0)
    assert any(0 < r[i_p] < 1_000_000 for r in got)


def test_parked_fuzzy_matches_real_corpus(spark):
    """The parked q76 fuzzy entity matches equal its oracle (which
    since r15 replicates the max_df_ppm hot-gram cut via QUALIFY), AND
    the cut is LOSSLESS on the real vocabulary: with-cut == no-cut ==
    the semantic all-pairs spec — so blocking completeness is still
    proven, now alongside the knob. Non-degenerate: pairs exist at
    distance 1 AND 2."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q76_fuzzy_matches", SF_DIR, con)
    i_d = cols.index("dist")
    assert {r[i_d] for r in got} == {1, 2}
    assert len(got) >= 10
    # cut-losslessness + semantic completeness on this corpus
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_name")
    no_cut = {
        tuple(r)
        for r in dedup.fuzzy_matches(
            part, max_dist=2, text_col="p_name"
        ).collect()
    }
    i_a, i_b = cols.index("text_a"), cols.index("text_b")
    with_cut = {
        (r[i_a], r[i_b], r[i_d], r[cols.index("n_rows_a")],
         r[cols.index("n_rows_b")])
        for r in got
    }
    semantic = {
        tuple(r)
        for r in con.execute(
            """
            WITH n AS (SELECT p_name AS v, CAST(COUNT(*) AS BIGINT) AS c
                       FROM part WHERE p_name IS NOT NULL
                         AND len(p_name) > 2 GROUP BY 1)
            SELECT a.v, b.v, CAST(levenshtein(a.v, b.v) AS BIGINT),
                   a.c, b.c
            FROM n a JOIN n b ON a.v < b.v
            WHERE levenshtein(a.v, b.v) <= 2
            """
        ).fetchall()
    }
    assert no_cut == semantic
    assert with_cut == semantic


def test_fuzzy_matches_blocking_semantics(spark):
    """dedup.fuzzy_matches unit pins: short values (where the bigram
    bound is vacuous) still pair via the unigram short band;
    transpositions cost 2; cross-length pairs at d = len diff; counts
    carry per-value multiplicity; NULLs and len ≤ max_dist values drop
    (the documented degenerate-key contract); completeness vs a naive
    all-pairs reference over the in-contract vocabulary."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rows = [("abc",), ("acb",), ("abc",), ("abcd",), ("abce",), ("zzzzzz",),
            (None,), ("ab",), ("abcdxx",)]
    df = spark.createDataFrame(rows, "text string")
    got = {
        (r.text_a, r.text_b): (r.dist, r.n_rows_a, r.n_rows_b)
        for r in dedup.fuzzy_matches(df, max_dist=2).collect()
    }
    assert got[("abc", "acb")] == (2, 2, 1)        # short band, transposition
    assert got[("abcd", "abce")] == (1, 1, 1)
    assert got[("abcd", "abcdxx")] == (2, 1, 1)    # cross-length, d = len diff
    assert all("zzzzzz" not in k for k in got)     # no partner within 2
    assert all("ab" != k[0] and "ab" != k[1] for k in got)  # len<=d excluded
    # naive reference over the same in-contract vocabulary (completeness)
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    vals = sorted({r[0] for r in rows if r[0] is not None and len(r[0]) > 2})
    want = {
        (x, y) for x, y in itertools.combinations(vals, 2) if lev(x, y) <= 2
    }
    assert set(got) == want


def test_fuzzy_matches_randomized_naive_sweep(spark):
    """Blocking completeness under adversarial density: seeded random
    vocabularies over a 4-letter alphabet (near pairs everywhere, every
    length band populated) — fuzzy_matches == the naive all-pairs
    reference for d ∈ {1, 2}, five seeds."""
    import itertools
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    for seed in range(5):
        rng = random.Random(seed)
        vals = sorted({
            "".join(rng.choice("abcd") for _ in range(rng.randint(2, 9)))
            for _ in range(40)
        })
        df = spark.createDataFrame([(v,) for v in vals], "text string")
        for d in (1, 2):
            got = {
                (r.text_a, r.text_b)
                for r in dedup.fuzzy_matches(df, max_dist=d).collect()
            }
            want = {
                (x, y)
                for x, y in itertools.combinations(
                    [v for v in vals if len(v) > d], 2
                )
                if lev(x, y) <= d
            }
            assert got == want, (seed, d)


def test_fuzzy_matches_hot_gram_cut_planted(spark):
    """max_df_ppm on a PLANTED hot-gram corpus: every value shares the
    bigrams ab/bc/cd/de (df == n_long ⇒ hot at any ppm < 10⁶), so with
    the cut the long-band join has NO candidates — the documented
    honest-lossy miss (the pair abcdef/abcdeg at lev 1 survives only
    without the cut) — and the Spark cut output equals the DuckDB
    QUALIFY replica of the identical integer formula (oracle parity
    for the knob itself)."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    vals = ["abcdef", "abcdeg"] + [
        f"abcde{c}{i:02d}" for i, c in enumerate("hijklmnopqrst")
    ]
    df = spark.createDataFrame([(v,) for v in vals], "text string")
    no_cut = {
        (r.text_a, r.text_b)
        for r in dedup.fuzzy_matches(df, max_dist=2).collect()
    }
    cut = {
        (r.text_a, r.text_b)
        for r in dedup.fuzzy_matches(
            df, max_dist=2, max_df_ppm=300_000
        ).collect()
    }
    assert ("abcdef", "abcdeg") in no_cut
    assert ("abcdef", "abcdeg") not in cut  # its every shared gram is hot
    assert cut <= no_cut
    # DuckDB replica of the identical cut formula (the q76 oracle shape)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"('{v}')" for v in vals)
        + ") AS t(v)"
    )
    duck_cut = {
        tuple(r)
        for r in con.execute(
            """
            WITH n AS (SELECT DISTINCT v FROM t WHERE len(v) > 2),
            lg0 AS (
                SELECT DISTINCT v, g FROM (
                    SELECT v, unnest(list_transform(
                        generate_series(1, len(v) - 1),
                        i -> substr(v, i, 2))) AS g
                    FROM n WHERE len(v) > 5)
            ),
            lg AS (
                SELECT v, g FROM lg0
                QUALIFY COUNT(*) OVER (PARTITION BY g) * 1000000
                        <= 300000 * (SELECT COUNT(DISTINCT v) FROM lg0)
            ),
            lc AS (SELECT DISTINCT a.v AS va, b.v AS vb
                   FROM lg a JOIN lg b USING (g) WHERE a.v < b.v),
            sc AS (
                SELECT DISTINCT v, g FROM (
                    SELECT v, unnest(list_transform(
                        generate_series(1, len(v)),
                        i -> substr(v, i, 1))) AS g FROM n)
            ),
            shc AS (SELECT DISTINCT least(a.v, b.v) AS va,
                           greatest(a.v, b.v) AS vb
                    FROM (SELECT * FROM sc WHERE len(v) <= 5) a
                    JOIN (SELECT * FROM sc WHERE len(v) <= 7) b USING (g)
                    WHERE a.v <> b.v)
            SELECT va, vb
            FROM (SELECT DISTINCT va, vb
                  FROM (SELECT * FROM lc UNION ALL SELECT * FROM shc))
            WHERE levenshtein(va, vb) <= 2
            """
        ).fetchall()
    }
    assert cut == duck_cut


def test_parked_entity_clusters_real_corpus(spark):
    """The parked q79 closes the q76 fuzzy pairs into connected
    components (duplicate_clusters) and matches the RECURSIVE-CTE
    oracle exactly — the iterative CC loop vs the engine-native
    fixpoint. Structure: transitivity exercised (components larger
    than any single pair), every canonical is a member of its own
    cluster, sizes consistent."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q79_entity_clusters", SF_DIR, con)
    i_t, i_c, i_n = (cols.index("text"), cols.index("canonical"),
                     cols.index("n_members"))
    by_c: dict = {}
    for r in got:
        by_c.setdefault(r[i_c], []).append(r)
    assert max(r[i_n] for r in got) >= 3  # transitive chains exist
    for c, members in by_c.items():
        assert c in {m[i_t] for m in members}  # canonical is a member
        assert all(m[i_n] == len(members) for m in members)
        assert c == min(m[i_t] for m in members)  # min-label contract


def test_entity_resolution_composition(spark):
    """The full merge-purge pipeline composes from existing parts:
    fuzzy_matches (typo pairs) → duplicate_clusters (transitive
    closure: A~B, B~C collapse even when A~C exceeds the distance) →
    one canonical id per entity cluster."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rows = [(1, "acme corp"), (2, "acme korp"), (3, "acme korpx"),
            (4, "zenith ltd"), (5, "zenith ltd"), (6, "orthogonal inc")]
    df = spark.createDataFrame(rows, "rid long, name string")
    pairs = dedup.fuzzy_matches(df, max_dist=1, text_col="name")
    # chain: corp~korp (1) and korp~korpx (1), but corp~korpx is 2 —
    # transitive closure must still collapse all three
    got_pairs = {(r.text_a, r.text_b) for r in pairs.collect()}
    assert ("acme corp", "acme korp") in got_pairs
    assert ("acme korp", "acme korpx") in got_pairs
    assert ("acme corp", "acme korpx") not in got_pairs  # d=2 > 1
    from pyspark.sql import functions as F

    clusters = dedup.duplicate_clusters(
        pairs.select(F.col("text_a").alias("id_a"), F.col("text_b").alias("id_b"))
    )
    canon = {r.node_id: r.cluster_id for r in clusters.collect()}
    assert (
        canon["acme corp"] == canon["acme korp"] == canon["acme korpx"]
        == "acme corp"
    )
    # identical names never reach fuzzy_matches (distinct-value grain);
    # the exact-dup rows 4/5 share a VALUE, not a fuzzy pair
    assert all("zenith" not in a and "zenith" not in b for a, b in got_pairs)


def test_pagerank_matches_reference_any_partitioning(spark):
    """operators/graph.pagerank == the pure-Python integer reference on
    a handcrafted graph with a cycle, a hub, AND a dangling node, at 1
    and 7 input partitions (integer arithmetic ⇒ partitioning-
    invariant, the repo-wide discipline)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 3), (3, 5),
             (1, 2)]  # duplicate edge collapses
    want = graph.pagerank_reference(edges, n_iter=4)
    for parts in (1, 7):
        df = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
        got = {r.node: r.mass for r in graph.pagerank(df, n_iter=4).collect()}
        assert got == want
    # structure sanity: node 3 (three in-links incl. the hub) outranks
    # the dangling sink 5; total mass stays within truncation loss
    assert want[3] > want[5]
    assert 0 <= 10**12 - sum(want.values()) < 10**12 // 100
    # an empty / all-NULL edge list raises, never divides by zero
    import pytest as _pytest

    empty = spark.createDataFrame([], "src long, dst long")
    with _pytest.raises(ValueError, match="empty edge list"):
        graph.pagerank(empty, n_iter=1)


def test_pagerank_personalized_matches_reference(spark):
    """Personalized PageRank (seeds=) == the Python reference on the
    handcrafted graph: teleport + dangling land only on seeds, a seed
    outside the graph is ignored, zero-intersection raises, and the
    uniform call equals seeds=all-nodes (one formula)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 3), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,), (4,), (99,)], "node long")
    want = graph.pagerank_reference(edges, n_iter=4, seeds=[1, 4, 99])
    got = {r.node: r.mass for r in graph.pagerank(df, n_iter=4, seeds=seeds).collect()}
    assert got == want
    # node 2 (non-seed, fed only by seed 1) carries contribution-only
    # mass; the dangling sink 5 gets only what 3 sends it
    assert got[2] > 0 and got[5] > 0
    # uniform == seeds-of-all-nodes (the shared-formula reduction)
    allseeds = spark.createDataFrame([(v,) for v in (1, 2, 3, 4, 5)], "node long")
    uni = {r.node: r.mass for r in graph.pagerank(df, n_iter=4).collect()}
    red = {r.node: r.mass for r in graph.pagerank(df, n_iter=4, seeds=allseeds).collect()}
    assert uni == red
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no seed intersects"):
        graph.pagerank(
            df, n_iter=1,
            seeds=spark.createDataFrame([(42,)], "node long"),
        )


def test_pagerank_weighted_matches_reference(spark):
    """Weighted PageRank (weight_col=, r15) == the Python reference on
    a handcrafted weighted graph at 1 and 7 partitions: duplicate
    (src,dst) pairs SUM weights, contributions split mass·w DIV W_u,
    w ≡ 1 reduces exactly to the unweighted call, non-positive weights
    and scale·max_weight int64 overflow both raise loudly."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    # hub 1 splits 9:1 between 2 and 3; duplicate (4,1) edges sum to 5;
    # 5 dangles
    wedges = [(1, 2, 9), (1, 3, 1), (2, 3, 4), (3, 1, 2), (4, 1, 3),
              (4, 1, 2), (3, 5, 1)]
    want = graph.pagerank_reference(wedges, n_iter=4, weighted=True)
    for parts in (1, 7):
        df = spark.createDataFrame(
            wedges, "src long, dst long, w long"
        ).repartition(parts)
        got = {
            r.node: r.mass
            for r in graph.pagerank(df, n_iter=4, weight_col="w").collect()
        }
        assert got == want
    # the 9:1 split must actually bias: 2 outranks 3's direct share
    # from node 1 — compare against the unweighted run where 1 splits
    # evenly and 3 gets MORE (it also collects from 2)
    assert want[2] > graph.pagerank_reference(
        [(s, d) for s, d, _ in wedges], n_iter=4
    )[2]
    # w == 1 everywhere reduces to the unweighted formula exactly
    ones = [(s, d, 1) for s, d in {(s, d) for s, d, _ in wedges}]
    df1 = spark.createDataFrame(ones, "src long, dst long, w long")
    got1 = {
        r.node: r.mass
        for r in graph.pagerank(df1, n_iter=4, weight_col="w").collect()
    }
    got_unw = {
        r.node: r.mass
        for r in graph.pagerank(
            df1.select("src", "dst"), n_iter=4
        ).collect()
    }
    assert got1 == got_unw
    with _pytest.raises(ValueError, match="must be positive"):
        graph.pagerank(
            spark.createDataFrame([(1, 2, 0)], "src long, dst long, w long"),
            n_iter=1,
            weight_col="w",
        )
    # ADVICE r15: positivity is checked on RAW weights BEFORE the
    # per-pair sum — duplicate edges (+5, -2) must raise even though
    # they sum to a positive 3 (both the Spark op and the reference)
    with _pytest.raises(ValueError, match="must be positive"):
        graph.pagerank(
            spark.createDataFrame(
                [(1, 2, 5), (1, 2, -2)], "src long, dst long, w long"
            ),
            n_iter=1,
            weight_col="w",
        )
    with _pytest.raises(ValueError, match="must be positive"):
        graph.pagerank_reference(
            [(1, 2, 5), (1, 2, -2)], n_iter=1, weighted=True
        )
    with _pytest.raises(ValueError, match="overflows int64"):
        graph.pagerank(
            spark.createDataFrame(
                [(1, 2, 2**60)], "src long, dst long, w long"
            ),
            n_iter=1,
            weight_col="w",
        )


def test_pagerank_converged_equals_fixed_iteration(spark):
    """pagerank_converged (r15): the early-stopped frame is
    BIT-IDENTICAL to pagerank(n_iter=k) for the k it reports (same
    _PRState.step), at 1 and 7 partitions; the reported L1 delta is
    the true Σ|Δ| of the last step (re-derived from k−1 vs k); a huge
    tolerance stops after one iteration; tol_units=0 still terminates
    (exact fixed point is reachable in integer arithmetic) within
    max_iter."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (4, 3), (3, 5)]
    for parts in (1, 7):
        df = spark.createDataFrame(
            edges, "src long, dst long"
        ).repartition(parts)
        m, k, delta = graph.pagerank_converged(df, tol_units=10**6)
        got = {r.node: r.mass for r in m.collect()}
        assert 1 <= k < 50 and delta <= 10**6
        fixed = {
            r.node: r.mass for r in graph.pagerank(df, n_iter=k).collect()
        }
        assert got == fixed
        prev = graph.pagerank_reference(edges, n_iter=k - 1) if k > 1 else None
        if prev is not None:
            want_delta = sum(
                abs(got[v] - prev[v]) for v in got
            )
            assert delta == want_delta
    df = spark.createDataFrame(edges, "src long, dst long")
    _, k1, _ = graph.pagerank_converged(df, tol_units=10**13)
    assert k1 == 1
    m0, k0, d0 = graph.pagerank_converged(df, tol_units=0, max_iter=200)
    assert d0 == 0 and k0 < 200
    # converged-at-zero really is a fixed point: one more step is a no-op
    again = {
        r.node: r.mass for r in graph.pagerank(df, n_iter=k0 + 1).collect()
    }
    assert {r.node: r.mass for r in m0.collect()} == again


def test_parked_ppr_segment_real_corpus(spark):
    """The parked q78 personalized PageRank equals its chained-CTE
    oracle bit-for-bit on the real trade graph with BUILDING-segment
    seeds. Pinned structure: every non-seed customer has exactly zero
    mass (no in-edges, no teleport), seeds carry mass, and the
    supplier ranking DIFFERS from uniform q77's (personalization
    actually reorders)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q78_ppr_segment", SF_DIR, con)
    i_n, i_m = cols.index("node"), cols.index("mass")
    seed_ids = {
        r[0] for r in con.execute(
            "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
        ).fetchall()
    }
    cust = {r[i_n]: r[i_m] for r in got if r[i_n] < 10_000_000}
    assert all(m == 0 for n, m in cust.items() if n not in seed_ids)
    assert all(m > 0 for n, m in cust.items() if n in seed_ids)
    sup78 = sorted(
        (r[i_n] for r in got if 10_000_000 <= r[i_n] < 20_000_000),
        key=lambda n: next(r[i_m] for r in got if r[i_n] == n),
    )
    got77, cols77 = _gated_rows(spark, "q77_pagerank", SF_DIR)
    j_n, j_m = cols77.index("node"), cols77.index("mass")
    sup77 = sorted(
        (r[j_n] for r in got77 if 10_000_000 <= r[j_n] < 20_000_000),
        key=lambda n: next(r[j_m] for r in got77 if r[j_n] == n),
    )
    assert sup78 != sup77


def _gated_rows(spark, name, sf_dir):
    """Run a GATED query and return (rows, columns) — the parity itself
    is swept by the QUERY_NAMES parametrized gate; structure tests that
    previously ran a parked slot through _run_parked use this after a
    promotion (the q71/q73 precedent)."""
    sdf = entrymod.queries()[name](spark, sf_dir)
    return [tuple(r) for r in sdf.collect()], sdf.columns


def test_gated_pagerank_structure(spark):
    """q77 (GATED r16 — the q33 swap; oracle parity is swept by the
    QUERY_NAMES parametrized gate): fixed-point PageRank on the real
    customer→supplier→nation graph. Structure is non-degenerate:
    nations (25 dangling sinks fed by all suppliers) carry the top
    masses, and supplier masses differ from one another (real in-link
    variation)."""
    got, cols = _gated_rows(spark, "q77_pagerank", SF_DIR)
    i_n, i_m = cols.index("node"), cols.index("mass")
    nations = [r[i_m] for r in got if r[i_n] >= 20_000_000]
    suppliers = [r[i_m] for r in got if 10_000_000 <= r[i_n] < 20_000_000]
    customers = [r[i_m] for r in got if r[i_n] < 10_000_000]
    assert len(nations) == 25 and len(suppliers) >= 10 and len(customers) >= 100
    assert min(nations) > max(customers)
    assert len(set(suppliers)) > 1


def test_parked_weighted_pagerank_real_corpus(spark):
    """The parked q80 weighted PageRank equals the generalized
    chained-CTE oracle (weighted=True) bit-for-bit on the trade graph
    with edge weight = purchase multiplicity. Structure: same node
    bands as q77, but the SUPPLIER MASS VECTOR differs from q77's —
    duplicate collapse vs weight sum is a real semantic difference on
    this corpus."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q80_weighted_pagerank", SF_DIR, con)
    i_n, i_m = cols.index("node"), cols.index("mass")
    sup80 = {
        r[i_n]: r[i_m] for r in got if 10_000_000 <= r[i_n] < 20_000_000
    }
    got77, cols77 = _gated_rows(spark, "q77_pagerank", SF_DIR)
    j_n, j_m = cols77.index("node"), cols77.index("mass")
    sup77 = {
        r[j_n]: r[j_m] for r in got77 if 10_000_000 <= r[j_n] < 20_000_000
    }
    assert set(sup80) == set(sup77)  # same supplier node set
    assert sup80 != sup77  # multiplicity weighting actually moves mass


def test_bfs_hops_matches_naive_reference(spark):
    """graph.bfs_hops == a naive Python BFS on a handcrafted graph with
    a cycle, a diamond (two paths of different length — MIN wins), an
    unreachable island, and a node beyond the hop cap; at 1 and 7
    partitions; directed AND undirected; no-seed raises."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    #   1→2→3→4→5→6 (chain beyond cap), 1→3 (diamond shortcut),
    #   3→1 (cycle), 8→9 (island)
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 3), (3, 1), (8, 9)]

    def naive(edge_list, seed_set, max_hops, directed):
        adj: dict = {}
        for s, d in edge_list:
            adj.setdefault(s, set()).add(d)
            if not directed:
                adj.setdefault(d, set()).add(s)
        dist = {v: 0 for v in seed_set}
        frontier = set(seed_set)
        for h in range(1, max_hops + 1):
            frontier = {
                d for v in frontier for d in adj.get(v, ())
            } - dist.keys()
            for v in frontier:
                dist[v] = h
            if not frontier:
                break
        return dist

    for directed in (True, False):
        want = naive(edges, {1}, 3, directed)
        for parts in (1, 7):
            df = spark.createDataFrame(
                edges, "src long, dst long"
            ).repartition(parts)
            seeds = spark.createDataFrame([(1,)], "node long")
            got = {
                r.node: r.hops
                for r in graph.bfs_hops(
                    df, seeds, max_hops=3, directed=directed
                ).collect()
            }
            assert got == want, (directed, parts)
    # cap semantics: node 6 is 4 hops out (1→3 shortcut, then 3→4→5→6)
    # — absent at cap 3, present at 8
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    far = {
        r.node: r.hops
        for r in graph.bfs_hops(df, seeds, max_hops=8).collect()
    }
    assert far[6] == 4 and 8 not in far and 9 not in far  # island unreached
    assert 6 not in {
        r.node
        for r in graph.bfs_hops(df, seeds, max_hops=3).collect()
    }
    # diamond: 3 is MIN(2 via 1→3, 2 via 1→2→3) = 1 hop
    assert far[3] == 1
    with _pytest.raises(ValueError, match="no seed intersects"):
        graph.bfs_hops(
            df, spark.createDataFrame([(42,)], "node long"), max_hops=2
        )


def test_shortest_paths_matches_naive_and_duckdb(spark):
    """graph.shortest_paths == a naive hop-capped Bellman-Ford AND the
    recursive-CTE oracle run in DuckDB, on a handcrafted weighted
    graph where the light path needs MORE hops than the heavy one —
    so the hop cap genuinely changes the answer (dist(2) = 10 direct
    at cap 2, 3 via the light 3-hop path at cap 3); w ≡ 1 equals
    bfs_hops exactly; duplicate edges keep MIN weight; non-positive
    weight and overflow both raise."""
    import duckdb

    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    wedges = [(1, 2, 10), (1, 3, 1), (3, 4, 1), (4, 2, 1), (2, 1, 1),
              (8, 9, 2), (1, 3, 7)]  # dup (1,3) keeps MIN=1

    def naive(edge_list, seed_set, max_hops):
        best: dict = {}
        for s, d, w in edge_list:
            k = (s, d)
            best[k] = min(best.get(k, w), w)
        dist = {v: 0 for v in seed_set}
        for _ in range(max_hops):
            nxt = dict(dist)
            for (s, d), w in best.items():
                if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                    nxt[d] = dist[s] + w
            dist = nxt
        return dist

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE we AS SELECT * FROM (VALUES "
        + ", ".join(f"({s}, {d}, {w})" for s, d, w in wedges)
        + ") AS t(src, dst, w)"
    )
    for cap in (2, 3, 8):
        want = naive(wedges, {1}, cap)
        duck = dict(
            con.execute(
                graph.shortest_paths_oracle_sql(
                    "SELECT src, dst, w FROM we",
                    "SELECT 1 AS node",
                    max_hops=cap,
                    weighted=True,
                )
            ).fetchall()
        )
        assert duck == want, cap
        for parts in (1, 7):
            df = spark.createDataFrame(
                wedges, "src long, dst long, w long"
            ).repartition(parts)
            seeds = spark.createDataFrame([(1,)], "node long")
            got = {
                r.node: r.dist
                for r in graph.shortest_paths(
                    df, seeds, max_hops=cap, weight_col="w"
                ).collect()
            }
            assert got == want, (cap, parts)
    assert naive(wedges, {1}, 2)[2] == 10 and naive(wedges, {1}, 3)[2] == 3
    # w ≡ 1 IS hop distance: shortest_paths == bfs_hops
    df = spark.createDataFrame(
        [(s, d) for s, d, _ in wedges], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    sp = {
        r.node: r.dist
        for r in graph.shortest_paths(df, seeds, max_hops=4).collect()
    }
    bf = {
        r.node: r.hops
        for r in graph.bfs_hops(df, seeds, max_hops=4).collect()
    }
    assert sp == bf
    with _pytest.raises(ValueError, match="must be positive"):
        graph.shortest_paths(
            spark.createDataFrame([(1, 2, -1)], "src long, dst long, w long"),
            seeds,
            max_hops=2,
            weight_col="w",
        )
    with _pytest.raises(ValueError, match="overflows int64"):
        graph.shortest_paths(
            spark.createDataFrame(
                [(1, 2, 2**62)], "src long, dst long, w long"
            ),
            seeds,
            max_hops=4,
            weight_col="w",
        )


def test_parked_bfs_reach_real_corpus(spark):
    """The parked q81 BFS reach equals its recursive-CTE oracle on the
    undirected trade graph from 3 sparse seeds; structure: all five
    hop levels 0..4 populated (the measured 3/60/1519/40/3 shape —
    asserted loosely as presence, not counts)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q81_bfs_reach", SF_DIR, con)
    i_h = cols.index("hops")
    levels = {r[i_h] for r in got}
    assert levels == {0, 1, 2, 3, 4}
    assert len(got) > 1000


def test_parked_output_types_are_comparator_safe(spark):
    """Parked queries hold themselves to the same comparator-dtype bar
    as gated ones — promotion must never reopen the r6 q20 class."""
    from pyspark.sql import types as T

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        queries as q,
    )

    banned = (T.DecimalType, T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    con = _duck(SF_DIR)
    for name, pq in q.parked().items():
        schema = pq.fn(spark, SF_DIR).schema
        for field in schema.fields:
            assert not isinstance(field.dataType, banned), (
                f"{name}.{field.name}: {field.dataType} comparator-unsafe"
            )
        if pq.oracle is not None:
            rel = con.sql(pq.oracle)
            for c, t in zip(rel.columns, rel.types):
                assert str(t) in {
                    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
                    "USMALLINT", "UINTEGER", "FLOAT", "DOUBLE", "VARCHAR",
                    "BOOLEAN", "DATE",
                }, f"{name}.{c}: DuckDB {t} comparator-unsafe"


def test_parked_paragraph_dedup_planted_boilerplate(spark, tmp_path):
    """r12: the parked q63 paragraph dedup on a synthetic corpus WITH
    separators (the real corpus has none — checked every round): shared
    boilerplate paragraphs survive only in the lowest-(doc,pos) host,
    unique paragraphs all survive, a fully-duplicate doc comes back
    empty, and the Spark plan matches the DuckDB oracle
    value-for-value."""
    rows = [
        (1, "COOKIE BANNER\n\nalpha unique content\n\nFOOTER NAV"),
        (2, "COOKIE BANNER\n\nbeta different words\n\nFOOTER NAV"),
        (3, "gamma standalone paragraph"),
        (4, "COOKIE BANNER\n\nFOOTER NAV"),       # fully boilerplate
        (5, "alpha unique content"),              # dup of doc 1's middle
        # empty-paragraph edges: doc 6 has a mid empty (first empty
        # corpus-wide → kept), doc 7 a trailing separator (trailing
        # empty must survive the split in BOTH engines, then dedup
        # against doc 6's)
        (6, "delta text\n\n\n\nepsilon text"),
        (7, "zeta text\n\n"),
    ]
    path = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)
    con = _duck_one(f"{path}/*.parquet", "documents")
    got, cols = _run_parked(spark, "q63_paragraph_dedup", str(tmp_path), con)
    by_id = {r[cols.index("doc_id")]: r for r in got}
    t, np, nd = (cols.index(c) for c in ("text", "n_paras", "n_paras_dropped"))
    assert by_id[1][t] == "COOKIE BANNER\n\nalpha unique content\n\nFOOTER NAV"
    assert by_id[2][t] == "beta different words"
    assert by_id[2][np] == 3 and by_id[2][nd] == 2
    assert by_id[3][t] == "gamma standalone paragraph"
    assert by_id[4][t] == "" and by_id[4][nd] == 2
    assert by_id[5][t] == "" and by_id[5][nd] == 1
    # doc 6 keeps its mid empty (first '' in the corpus); doc 7's
    # trailing empty dedups against it
    assert by_id[6][t] == "delta text\n\n\n\nepsilon text"
    assert by_id[6][np] == 3 and by_id[6][nd] == 0
    assert by_id[7][t] == "zeta text"
    assert by_id[7][np] == 2 and by_id[7][nd] == 1


def test_parked_paragraph_dedup_real_corpus(spark):
    """On the separator-free real corpus q63 degenerates to exact
    full-text dedup (one paragraph per doc) — still oracle-exact."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q63_paragraph_dedup", SF_DIR, con)
    np = cols.index("n_paras")
    assert got and all(r[np] == 1 for r in got)


def test_distribution_drift_psi_semantics(spark):
    """Integer PSI unit pins: identical distributions → every term 0;
    a planted shift is positive and grows with the shift; a bucket
    missing on one side clamps to 1 ppm instead of dividing by zero;
    an empty side raises; the integer µbit total tracks the float
    PSI-in-bits within the table's documented error envelope."""
    import math

    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        distribution_drift,
    )

    def mk(counts):
        rows = [(b,) for b, c in counts.items() for _ in range(c)]
        return spark.createDataFrame(rows, "lang string")

    same = {"en": 70, "fr": 20, "de": 10}
    z = distribution_drift(mk(same), mk(same), "lang").collect()
    assert all(r.psi_term_micro == 0 for r in z)

    shifted_small = {"en": 65, "fr": 25, "de": 10}
    shifted_big = {"en": 40, "fr": 50, "de": 10}
    psi_small = sum(
        r.psi_term_micro
        for r in distribution_drift(mk(same), mk(shifted_small), "lang").collect()
    )
    psi_big = sum(
        r.psi_term_micro
        for r in distribution_drift(mk(same), mk(shifted_big), "lang").collect()
    )
    assert 0 < psi_small < psi_big

    # float twin (PSI in bits): |integer − float| small relative scale
    def psi_bits(p, q):
        tot_p, tot_q = sum(p.values()), sum(q.values())
        out = 0.0
        for b in set(p) | set(q):
            pp = max(p.get(b, 0) / tot_p, 1e-6)
            qq = max(q.get(b, 0) / tot_q, 1e-6)
            out += (qq - pp) * (math.log2(qq) - math.log2(pp))
        return out
    assert abs(psi_big / 1e6 - psi_bits(same, shifted_big)) < 0.01

    # one-sided bucket: clamped, positive, no crash
    gone = distribution_drift(
        mk({"en": 50, "zz": 50}), mk({"en": 100}), "lang"
    ).collect()
    by_b = {r.lang if hasattr(r, "lang") else r.bucket: r for r in gone}
    assert by_b["zz"].q_ppm == 1 and by_b["zz"].psi_term_micro > 0

    with _pytest.raises(ValueError, match="non-empty"):
        distribution_drift(mk(same), mk({}), "lang")

    # NULL is ONE bucket: present on both sides it must merge to a
    # single row (a name-join full-outer would emit two half-rows —
    # the r15 self-review find), and identical NULL shares give 0
    def mkn(counts):
        rows = [(b,) for b, c in counts.items() for _ in range(c)]
        return spark.createDataFrame(rows, "lang string")

    withnull = distribution_drift(
        mkn({"en": 60, None: 40}), mkn({"en": 30, None: 20}), "lang"
    ).collect()
    assert len(withnull) == 2
    nullrow = next(r for r in withnull if r.bucket is None)
    assert (nullrow.n_old, nullrow.n_new) == (40, 20)
    assert nullrow.psi_term_micro == 0  # same 40% share on both sides


def test_distribution_drift_is_symmetric(spark):
    """PSI's defining algebraic property: each term
    (q−p)(log q − log p) is invariant under swapping the sides, so
    drift(old, new) and drift(new, old) carry IDENTICAL per-bucket
    terms with n_old/n_new (and p/q) transposed — pinned on a skewed
    pair including a one-sided bucket."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        distribution_drift,
    )

    def mk(counts):
        rows = [(b,) for b, c in counts.items() for _ in range(c)]
        return spark.createDataFrame(rows, "lang string")

    a = {"en": 70, "fr": 20, "de": 10}
    b = {"en": 40, "fr": 55, "zz": 5}
    fwd = {
        r.bucket: (r.n_old, r.n_new, r.p_ppm, r.q_ppm, r.psi_term_micro)
        for r in distribution_drift(mk(a), mk(b), "lang").collect()
    }
    rev = {
        r.bucket: (r.n_old, r.n_new, r.p_ppm, r.q_ppm, r.psi_term_micro)
        for r in distribution_drift(mk(b), mk(a), "lang").collect()
    }
    assert set(fwd) == set(rev)
    for k, (no, nn, p, q, t) in fwd.items():
        assert rev[k] == (nn, no, q, p, t), k


def test_parked_split_drift_real_corpus(spark):
    """The parked q82 integer PSI over train-vs-val language shares
    matches its oracle; structure: every corpus language appears, all
    terms ≥ 0, and the total is far below the 0.1-PSI warning level
    (~144k µbits) — the hash split IS representative."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q82_split_drift", SF_DIR, con)
    i_t = cols.index("psi_term_micro")
    assert len(got) >= 3
    assert all(r[i_t] >= 0 for r in got)
    assert sum(r[i_t] for r in got) < 144_000


def test_parked_numeric_drift_real_corpus(spark):
    """The parked q83 numeric PSI (distribution_drift_numeric over
    train-quantile-bucketed document lengths) matches its fully
    relational oracle — thresholds, buckets, shares, and log table all
    re-derived in SQL. Structure: all 8 buckets populated on the real
    corpus and at least one nonzero drift term (the splits are
    hash-disjoint samples, so small drift exists)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q83_numeric_drift", SF_DIR, con)
    i_b = cols.index("bucket")
    i_t = cols.index("psi_term_micro")
    assert len({r[i_b] for r in got}) >= 6  # near-uniform quantile buckets
    assert all(r[i_t] >= 0 for r in got)


def test_distribution_drift_numeric_semantics(spark):
    """distribution_drift_numeric (r16, VERDICT r15 #5): identical
    distributions read zero PSI; a location shift reads positive;
    bucket indices are the strictly-greater threshold counts (0-based,
    tied thresholds leave empty buckets between them); NULL values
    land in the NULL bucket (merged null-safely); explicit
    ``thresholds=`` bypasses the train-side derivation; the Spark
    bucket expression equals DuckDB's evaluation of the SAME string."""
    import duckdb as _duck_mod

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        distribution_drift_numeric,
        numeric_bucket_expr,
    )

    def mk(vals):
        return spark.createDataFrame([(v,) for v in vals], "v long")

    base = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] * 20
    z = distribution_drift_numeric(mk(base), mk(base), "v", n_buckets=4)
    assert all(r.psi_term_micro == 0 for r in z.collect())
    shifted = [v + 6 for v in base]
    d = distribution_drift_numeric(mk(base), mk(shifted), "v", n_buckets=4)
    assert sum(r.psi_term_micro for r in d.collect()) > 0
    # explicit thresholds: buckets are strictly-greater counts, and a
    # DUPLICATED threshold skips an index (empty bucket between ties)
    expr = numeric_bucket_expr([5, 5, 8], "v")
    got = {
        r.v: r.b
        for r in mk([3, 5, 6, 8, 9])
        .selectExpr("v", f"{expr} AS b")
        .collect()
    }
    assert got == {3: 0, 5: 0, 6: 2, 8: 2, 9: 3}
    duck = {
        v: b
        for v, b in _duck_mod.connect()
        .execute(
            "SELECT v, " + expr.replace("div", "//")
            + " FROM (VALUES (3),(5),(6),(8),(9)) AS t(v)"
        )
        .fetchall()
    }
    assert duck == got
    # NULL values: NULL bucket on the new side only — merged as ONE row
    wn = distribution_drift_numeric(
        mk(base),
        spark.createDataFrame([(None,), (2,)], "v long"),
        "v",
        thresholds=[5],
    ).collect()
    nulls = [r for r in wn if r.bucket is None]
    assert len(nulls) == 1 and nulls[0].n_new == 1 and nulls[0].n_old == 0


def test_distribution_drift_numeric_by_group_rejects_one_bucket(spark):
    """r16 ADVICE: n_buckets=1 yields an empty threshold list and the
    generated bucket expression would be a runtime SQL parse error —
    the by-group path must refuse loudly like the scalar path guards."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        distribution_drift_numeric_by_group,
    )

    df = spark.createDataFrame([("en", 1)], "g string, v long")
    with _pytest.raises(ValueError, match="n_buckets"):
        distribution_drift_numeric_by_group(df, df, "g", "v", n_buckets=1)


def test_distribution_drift_numeric_by_group_composition(spark):
    """distribution_drift_numeric_by_group == the scalar
    distribution_drift_numeric applied per filtered group (each group
    against its OWN train edges) for every two-sided group — including
    the NULL group (eqNullSafe throughout); one-sided groups emit
    their counts with NULL shares and NULL psi terms; a group with no
    train rows buckets its new rows to 0 (no edges)."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.curation import (
        distribution_drift_numeric,
        distribution_drift_numeric_by_group,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "g string, v long")

    # en: shifted distribution; fr: identical; NULL group: two-sided;
    # old_only: train-only; new_only: no train rows
    old = mk(
        [("en", v) for v in range(1, 41)]
        + [("fr", v) for v in [5, 10, 15, 20] * 5]
        + [(None, v) for v in [1, 2, 3, 4, 5, 6]]
        + [("old_only", v) for v in [7, 8, 9]]
    )
    new = mk(
        [("en", v + 25) for v in range(1, 41)]
        + [("fr", v) for v in [5, 10, 15, 20] * 5]
        + [(None, v) for v in [1, 2, 3, 4, 5, 6]]
        + [("new_only", v) for v in [100, 200]]
    )
    got = distribution_drift_numeric_by_group(old, new, "g", "v", n_buckets=4)
    rows = got.collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)

    # two-sided groups equal the scalar per-group run
    for g in ("en", "fr", None):
        if g is None:
            fo, fn = old.filter(F.col("g").isNull()), new.filter(
                F.col("g").isNull()
            )
        else:
            fo, fn = old.filter(F.col("g") == g), new.filter(F.col("g") == g)
        want = sorted(
            (r.bucket, r.n_old, r.n_new, r.p_ppm, r.q_ppm, r.psi_term_micro)
            for r in distribution_drift_numeric(
                fo.select("v"), fn.select("v"), "v", n_buckets=4
            ).collect()
        )
        have = sorted(
            (r.bucket, r.n_old, r.n_new, r.p_ppm, r.q_ppm, r.psi_term_micro)
            for r in by_g[g]
        )
        assert have == want, f"group {g!r} diverges from the scalar run"

    # en drifted, fr did not
    assert sum(r.psi_term_micro for r in by_g["en"]) > 0
    assert all(r.psi_term_micro == 0 for r in by_g["fr"])
    # one-sided groups: counts present, shares/terms NULL
    oo = by_g["old_only"]
    assert all(r.n_new == 0 and r.q_ppm is None and r.psi_term_micro is None
               for r in oo)
    assert sum(r.n_old for r in oo) == 3
    no = by_g["new_only"]
    # no train rows -> no edges -> every new value buckets to 0
    assert len(no) == 1 and no[0].bucket == 0 and no[0].n_new == 2
    assert no[0].p_ppm is None and no[0].psi_term_micro is None


def test_parked_lang_numeric_drift_real_corpus(spark):
    """The parked q84 per-language numeric PSI matches its fully
    relational oracle (per-lang edges, buckets, shares, log table all
    re-derived in SQL). Structure: every language present, each with
    multiple buckets, and each language's edges are its OWN (bucket
    populations differ across languages)."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q84_lang_numeric_drift", SF_DIR, con)
    i_g, i_b = cols.index("lang"), cols.index("bucket")
    langs = {r[i_g] for r in got}
    assert len(langs) >= 3
    per_lang_buckets = {}
    for r in got:
        per_lang_buckets.setdefault(r[i_g], set()).add(r[i_b])
    assert all(len(b) >= 4 for b in per_lang_buckets.values())


def _naive_cooc_edges(texts, window=2):
    """Independent TextRank edge derivation: distinct-word pairs within
    ``window`` positions, both directions."""
    pairs = set()
    for text in texts:
        t = text.strip().split()
        for i, a in enumerate(t):
            for g in range(1, window):
                if i + g < len(t):
                    b = t[i + g]
                    if a != b:
                        pairs.add((a, b))
                        pairs.add((b, a))
    return sorted(pairs)


def test_textrank_matches_reference_planted(spark):
    """text.textrank_scores == pagerank_reference over an independently
    derived co-occurrence edge set, on a planted corpus covering
    repeated adjacent words (self-pairs dropped), single-token and
    whitespace-only docs (no pairs), and window=3 (two gap lengths) —
    at 1 and 7 partitions."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph, text as text_ops,
    )

    texts = [
        "alpha beta gamma alpha",
        "beta beta delta",      # adjacent repeat: no self-edge
        "gamma delta alpha",
        "solo",                  # single token: no pairs
        "   ",                   # whitespace-only: no pairs
    ]
    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    for window in (2, 3):
        want = graph.pagerank_reference(
            _naive_cooc_edges(texts, window), n_iter=4
        )
        for parts in (1, 7):
            df = spark.createDataFrame(rows, "doc_id string, text string") \
                .repartition(parts)
            got = {
                r.node: r.mass
                for r in text_ops.textrank_scores(
                    df, window=window
                ).collect()
            }
            assert got == want, (window, parts)
    with pytest.raises(ValueError, match="window"):
        text_ops.textrank_edges(
            spark.createDataFrame(rows, "doc_id string, text string"),
            window=1,
        )


def test_parked_textrank_keywords_real_corpus(spark):
    """The parked q85 TextRank keywords match the composed oracle
    (textrank_edges_sql fed through pagerank_oracle_sql's chained
    CTEs) on the real corpus — string word nodes under the same
    bit-exact integer contract as q77. Structure: the full 31-word
    generator vocabulary ranks, every word carries positive mass."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q85_textrank_keywords", SF_DIR, con)
    i_n, i_m = cols.index("node"), cols.index("mass")
    assert len(got) == 31  # the documents generator's fixed vocabulary
    assert all(isinstance(r[i_n], str) for r in got)
    assert all(r[i_m] > 0 for r in got)


def _naive_triangles(pairs):
    """Independent per-node triangle counter: adjacency sets, count
    closed wedges per unordered node triple."""
    adj = {}
    for s, d in pairs:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    tri = {v: 0 for v in nodes}
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if y not in adj[x]:
                continue
            for z in nodes:
                if z > y and z in adj[x] and z in adj[y]:
                    tri[x] += 1
                    tri[y] += 1
                    tri[z] += 1
    return {
        v: (
            tri[v],
            len(adj[v]),
            (2 * tri[v] * 1_000_000) // (len(adj[v]) * (len(adj[v]) - 1))
            if len(adj[v]) >= 2
            else 0,
        )
        for v in nodes
    }


def test_triangle_counts_matches_naive_reference(spark):
    """graph.triangle_counts == the adjacency-set reference on K4
    (clust exactly 10⁶), a triangle-free path, a diamond, and 5 seeded
    random graphs — duplicate/reversed/self-loop edges dropped, at 1
    and 7 partitions."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    cases = [
        [(a, b) for a in range(4) for b in range(4) if a != b],  # K4
        [(0, 1), (1, 2), (2, 3)],                                # path
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)],                # diamond
        [(0, 1), (1, 0), (0, 0), (0, 1)],  # dup + reverse + self-loop
    ]
    for seed in range(5):
        rng = random.Random(seed)
        n = 12
        cases.append(
            [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(40)
            ]
        )
    for pairs in cases:
        clean = [(s, d) for s, d in pairs if s != d]
        if not clean:
            continue
        want = _naive_triangles(clean)
        for parts in (1, 7):
            df = spark.createDataFrame(
                clean, "src long, dst long"
            ).repartition(parts)
            got = {
                r.node: (r.n_triangles, r.degree, r.clust_micro)
                for r in graph.triangle_counts(df).collect()
            }
            assert got == want, (pairs, parts)


def test_parked_word_triangles_real_corpus(spark):
    """The parked q86 per-word triangle counts match the composed
    oracle (degree-ordered orientation replicated via (degree, node)
    tuple comparisons in SQL) on the real co-occurrence graph.
    Structure: triangles genuinely exist (dense 31-word vocabulary)
    and every clustering coefficient sits in [0, 10⁶]."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q86_word_triangles", SF_DIR, con)
    i_t, i_c = cols.index("n_triangles"), cols.index("clust_micro")
    assert len(got) == 31
    assert all(r[i_t] > 0 for r in got)  # informative, not degenerate
    assert all(0 <= r[i_c] <= 1_000_000 for r in got)


def _naive_adamic_adar(pairs, max_degree=None):
    """Independent AA reference: adjacency sets + the shared integer
    log weights, degree-1 and over-cut pivots dropped."""
    import itertools

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (  # noqa: E501
        log2_interp_micro_int,
    )

    adj = {}
    for s, d in pairs:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for z, nbrs in adj.items():
        if len(nbrs) < 2:
            continue
        if max_degree is not None and len(nbrs) > max_degree:
            continue
        w = 10**12 // log2_interp_micro_int(len(nbrs))
        for x, y in itertools.combinations(sorted(nbrs), 2):
            if y in adj.get(x, set()):
                continue
            c, s2 = out.get((x, y), (0, 0))
            out[(x, y)] = (c + 1, s2 + w)
    return out


def test_link_scores_matches_naive_reference(spark):
    """graph.link_scores == the adjacency-set AA reference on 5 seeded
    random graphs (with degree-1 nodes — the zero-log pivot path) ×
    {no cut, max_degree=3} × {1, 7} partitions; adjacent pairs are
    excluded, canonical a < b."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    for seed in range(5):
        rng = random.Random(seed)
        clean = [
            (s, d)
            for s, d in (
                (rng.randrange(14), rng.randrange(14)) for _ in range(30)
            )
            if s != d
        ] + [(100, 101)]  # guaranteed degree-1 pivot pair
        for md in (None, 3):
            want = _naive_adamic_adar(clean, md)
            for parts in (1, 7):
                df = spark.createDataFrame(
                    clean, "src long, dst long"
                ).repartition(parts)
                got = {
                    (r.a, r.b): (r.n_common, r.aa_micro)
                    for r in graph.link_scores(df, max_degree=md).collect()
                }
                assert got == want, (seed, md, parts)


def test_parked_link_prediction_real_corpus(spark):
    """The parked q87 top-100 AA supplier–supplier predictions match
    the composed oracle (hub cut + integer log weights + exact-rank
    QUALIFY). Structure: bipartite ⇒ every pair is supplier-band on
    both sides, common-neighbor counts positive, and the emitted list
    is ordered by the exact (aa_micro DESC, a, b) rank."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q87_link_prediction", SF_DIR, con)
    i_a, i_b = cols.index("a"), cols.index("b")
    i_c, i_m = cols.index("n_common"), cols.index("aa_micro")
    assert 1 <= len(got) <= 100
    assert all(
        r[i_a] >= 10_000_000 and r[i_b] >= 10_000_000 for r in got
    )
    assert all(r[i_c] > 0 and r[i_m] > 0 for r in got)
    ranked = sorted(got, key=lambda r: (-r[i_m], r[i_a], r[i_b]))
    assert got == ranked


def _naive_kcore(pairs, k, n_rounds=8):
    """Independent k-core peeler: adjacency sets, remove active nodes
    with active degree < k per round."""
    adj = {}
    for s, d in pairs:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    removed: dict = {}
    for rnd in range(1, n_rounds + 1):
        active = set(adj) - set(removed)
        newly = [v for v in active if len(adj[v] & active) < k]
        if not newly:
            break
        for v in newly:
            removed[v] = rnd
    return {
        v: (removed.get(v, -1), 0 if v in removed else 1) for v in adj
    }


def test_kcore_matches_naive_reference_and_oracle(spark):
    """graph.kcore == the adjacency-set peeler on seeded random graphs
    (k ∈ {2, 3} — cascades included), and kcore_oracle_sql's unrolled
    CTEs agree on the same cases; the cascade case (a chain hanging
    off a clique peels one node per round) pins multi-round removal
    and the zero-active-degree COALESCE path."""
    import random

    import duckdb as _duck_mod

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        graph,
    )

    # chain off a K4: peels outermost-first, one per round
    chain = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (4, 5), (5, 6)]
    want = _naive_kcore(chain, 2)
    assert want[6][0] == 1 and want[5][0] == 2 and want[4][0] == 3
    got = {
        r.node: (r.removed_round, r.in_core)
        for r in graph.kcore(
            spark.createDataFrame(chain, "src long, dst long"), 2
        ).collect()
    }
    assert got == want
    rng = random.Random(3)
    clean = [
        (s, d)
        for s, d in ((rng.randrange(16), rng.randrange(16))
                     for _ in range(40))
        if s != d
    ]
    for k in (2, 3):
        want = _naive_kcore(clean, k)
        got = {
            r.node: (r.removed_round, r.in_core)
            for r in graph.kcore(
                spark.createDataFrame(clean, "src long, dst long"), k
            ).collect()
        }
        assert got == want, k
        con = _duck_mod.connect()
        con.sql("CREATE TABLE e (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?)", clean)
        orc = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                graph.kcore_oracle_sql("SELECT src, dst FROM e", k)
            ).fetchall()
        }
        assert orc == want, ("oracle", k)
    with pytest.raises(ValueError, match="k must be"):
        graph.kcore(
            spark.createDataFrame(chain, "src long, dst long"), 0
        )


def test_parked_trade_kcore_real_corpus(spark):
    """The parked q88 k-core peeling matches its unrolled-CTE oracle on
    the trade graph. Structure: a genuinely mixed outcome — some
    customers peel (single-order customers have ≤4 distinct suppliers
    < k=5), suppliers all survive (degree ≫ 5), and at least one
    node carries removed_round ≥ 1."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q88_trade_kcore", SF_DIR, con)
    i_n, i_r, i_c = (
        cols.index("node"), cols.index("removed_round"), cols.index("in_core")
    )
    peeled = [r for r in got if r[i_c] == 0]
    kept = [r for r in got if r[i_c] == 1]
    assert peeled and kept
    assert all(r[i_r] >= 1 for r in peeled)
    assert all(r[i_r] == -1 for r in kept)
    # every supplier-band node survives at k=5
    assert all(r[i_c] == 1 for r in got if r[i_n] >= 10_000_000)


def _naive_kcenter(vec_rows, k):
    """Independent greedy k-center: integer-quantized L2², lowest-id
    start, (max d2, lowest id) selection, duplicate re-pick allowed."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.similarity import (  # noqa: E501
        quantize_floats,
    )

    pts = {i: quantize_floats(v) for i, v in vec_rows}
    first = min(pts)
    sel = [first]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    dist = {i: d2(q, pts[first]) for i, q in pts.items()}
    for _ in range(k - 1):
        nxt = min(pts, key=lambda i: (-dist[i], i))
        sel.append(nxt)
        for i, q in pts.items():
            dist[i] = min(dist[i], d2(q, pts[nxt]))
    rounds = {}
    for rnd, i in enumerate(sel, 1):
        rounds.setdefault(i, rnd)
    return {i: (rounds.get(i, -1), dist[i]) for i in pts}


def test_coreset_kcenter_matches_naive_reference(spark):
    """similarity.coreset_kcenter == the pure-Python greedy on seeded
    random float vectors INCLUDING exact duplicates (covered-corpus
    re-pick path: k exceeds the distinct count, so a selected point
    repeats and keeps its FIRST round — pinned on both engines), at 1
    and 7 partitions; k > n raises."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as S,
    )

    rng = random.Random(7)
    vecs = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(4)])
        for i in range(10)
    ]
    vecs.append((10, list(vecs[3][1])))  # exact duplicate
    want = _naive_kcenter(vecs, 6)
    for parts in (1, 7):
        df = spark.createDataFrame(
            vecs, "vec_id long, embedding array<float>"
        ).repartition(parts)
        got = {
            r.vec_id: (r.sel_round, r.d2_to_coreset)
            for r in S.coreset_kcenter(df, 6).collect()
        }
        assert got == want, parts
    # duplicate-only corpus: every point covered after round 1; the
    # argmax re-picks the lowest id and sel_round keeps its first round
    dup = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    res = {r.vec_id: r.sel_round for r in S.coreset_kcenter(dup, 3).collect()}
    # every round's argmax sees all-zero distances and re-picks the
    # LOWEST id (the already-selected first point) — the documented
    # covered-corpus behavior; later ids are never selected
    assert res[0] == 1 and res[1] == -1 and res[2] == -1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds"):
        S.coreset_kcenter(dup, 99)


def test_parked_coreset_selection_real_corpus(spark):
    """The parked q89 greedy k-center coreset matches its unrolled
    MATERIALIZED-CTE oracle on the real embeddings. Structure: exactly
    8 distinct selection rounds, members at distance 0, and a positive
    coverage radius over unselected rows."""
    con = _duck(SF_DIR)
    got, cols = _run_parked(spark, "q89_coreset_selection", SF_DIR, con)
    i_r, i_d = cols.index("sel_round"), cols.index("d2_to_coreset")
    sel = sorted(r[i_r] for r in got if r[i_r] > 0)
    assert sel == list(range(1, 9))
    assert all(r[i_d] == 0 for r in got if r[i_r] > 0)
    assert max(r[i_d] for r in got if r[i_r] < 0) > 0
