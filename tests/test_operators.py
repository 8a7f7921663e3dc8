"""Operator unit tests on e-commerce-shaped fixtures — the adversarial
cases from FIXTURES.md §3 (the reference's validation rules are its
de-facto correctness spec; SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark import schemas
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    enrich,
    kpis,
    setops,
    validation,
)

TS = dt.datetime(2024, 3, 1, 10, 0, 0)


def _orders(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.ORDERS_SCHEMA)


def _items(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.ORDER_ITEMS_SCHEMA)


def _products(spark, rows):
    return spark.createDataFrame(rows, schema=schemas.PRODUCTS_SCHEMA)


@pytest.fixture(scope="module")
def fixture_tables(spark):
    orders = _orders(
        spark,
        [
            ("o1", "u1", "delivered", TS, None, TS, TS, 2),
            ("o2", "u2", "returned", TS + dt.timedelta(days=1), TS, None, None, 1),
            ("o3", "u1", "pending", TS + dt.timedelta(days=1), None, None, None, 1),
        ],
    )
    items = _items(
        spark,
        [
            # (id, order_id, user_id, product_id, status, created_at, shipped, delivered, returned, price)
            ("i1", "o1", "u1", "p1", "delivered", TS, TS, TS, None, 10.0),
            ("i2", "o1", "u1", "p2", "delivered", TS, TS, TS, None, 30.0),
            ("i3", "o2", "u2", "p1", "returned", TS, None, None, TS, 20.0),
            # o3's item references a product that never arrives (p_missing)
            ("i4", "o3", "u1", "p_missing", "pending", TS, None, None, None, 5.0),
        ],
    )
    products = _products(
        spark,
        [
            ("p1", "sku1", 5.0, "cat_a", "widget", "acme", 12.0, "dept1"),
            ("p2", "sku2", 9.0, "cat_b", "gadget", "acme", 35.0, "dept1"),
        ],
    )
    return orders, items, products


# ---------------------------------------------------------------------------
# enrichment + KPI semantics (SURVEY.md §2.5 fine print, hand-computed goldens)
# ---------------------------------------------------------------------------


def test_enrich_join_and_projection(fixture_tables):
    orders, items, products = fixture_tables
    out = enrich.enrich_orders(orders, items, products)
    rows = {(r.order_id, r.product_id): r for r in out.collect()}
    # o3's item drops out (inner join: p_missing not in products)
    assert set(rows) == {("o1", "p1"), ("o1", "p2"), ("o2", "p1")}
    assert rows[("o1", "p1")].category == "cat_a"
    assert rows[("o1", "p1")].order_date == TS.date()
    assert rows[("o2", "p1")].returned_at is not None


def test_category_kpis_quirky_semantics(fixture_tables):
    """avg_order_value = mean ITEM price; avg_return_rate denominator =
    row count (reference transform.py:350-351)."""
    orders, items, products = fixture_tables
    out = kpis.category_kpis(enrich.enrich_orders(orders, items, products))
    by_key = {(r.category, r.order_date): r for r in out.collect()}
    a = by_key[("cat_a", TS.date())]
    # cat_a on day1: items i1 (10.0, kept) — one row
    assert a.daily_revenue == pytest.approx(10.0)
    assert a.avg_order_value == pytest.approx(10.0)
    assert a.avg_return_rate == pytest.approx(0.0)
    b = by_key[("cat_a", (TS + dt.timedelta(days=1)).date())]
    # cat_a on day2: i3 returned (20.0) — return rate 1/1
    assert b.daily_revenue == pytest.approx(20.0)
    assert b.avg_return_rate == pytest.approx(1.0)


def test_order_kpis_distinct_denominator(fixture_tables):
    """return_rate divides by DISTINCT orders (reference transform.py:363),
    NOT by rows — pinned so nobody 'fixes' it."""
    orders, items, products = fixture_tables
    out = kpis.order_kpis_daily(enrich.enrich_orders(orders, items, products))
    by_date = {r.order_date: r for r in out.collect()}
    d1 = by_date[TS.date()]
    assert d1.total_orders == 1  # o1 only
    assert d1.total_revenue == pytest.approx(40.0)
    assert d1.total_items_sold == 2
    assert d1.return_rate == pytest.approx(0.0)
    assert d1.unique_customers == 1
    d2 = by_date[(TS + dt.timedelta(days=1)).date()]
    assert d2.total_orders == 1  # o2 (o3 dropped by join)
    assert d2.return_rate == pytest.approx(1.0)  # 1 returned item / 1 distinct order


# ---------------------------------------------------------------------------
# validation rules (FIXTURES.md §3 cases 1-5)
# ---------------------------------------------------------------------------


def test_validation_catches_all_violations(spark):
    from pyspark.sql import types as T

    # bad data arrives with nulls, so read it under an all-nullable schema
    # (exactly what a PERMISSIVE ingest would produce)
    nullable = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in schemas.ORDERS_SCHEMA.fields]
    )
    bad_orders = spark.createDataFrame(
        [
            (None, "u1", "delivered", TS, None, None, None, 1),      # null PK
            ("o1", "u1", "delivered", TS, None, None, None, 1),
            ("o1", "u2", "bogus_status", TS, None, None, None, 2),   # dup PK + bad domain
        ],
        schema=nullable,
    )
    rules = validation.rules_for("orders")
    counts = {r.rule_name: r.violations for r in validation.violation_counts(bad_orders, rules).collect()}
    assert counts["orders.order_id.not_null"] == 1
    assert counts["orders.order_id.unique"] == 1  # one extra copy of o1
    assert counts["orders.status.domain"] == 1


def test_validation_split_quarantine(spark):
    items = _items(
        spark,
        [
            ("i1", "o1", "u1", "p1", "delivered", TS, None, None, None, 10.0),
            ("i2", "o1", "u1", "p2", "delivered", TS, None, None, None, -4.0),  # negative
        ],
    )
    rules = validation.rules_for("order_items")
    valid, quarantine = validation.split_valid(items, rules)
    assert valid.count() == 1
    q = quarantine.collect()
    assert len(q) == 1
    assert q[0]["_violated_rules"] == ["order_items.sale_price.non_negative"]


def test_header_check():
    issues = validation.check_header(
        ["order_id", "user_id", "user_id"], ["order_id", "user_id", "status"]
    )
    assert any("missing" in i for i in issues)
    assert any("duplicate" in i for i in issues)
    assert validation.check_header(["a", "b", "extra"], ["a", "b"]) == []


def test_integer_dtype_check(spark):
    df = _orders(spark, [("o1", "u1", "pending", TS, None, None, None, 3)])
    assert validation.integer_dtype_check(df, "num_of_item")
    assert not validation.integer_dtype_check(df.withColumn("num_of_item", F.col("num_of_item").cast("double")), "num_of_item")


# ---------------------------------------------------------------------------
# referential completeness (FIXTURES.md §3 case 7)
# ---------------------------------------------------------------------------


def test_complete_groups_hold_back_partial(fixture_tables):
    orders, items, products = fixture_tables
    complete = {r.order_id for r in setops.complete_order_groups(orders, items, products).collect()}
    assert complete == {"o1", "o2"}  # o3 waits: p_missing hasn't arrived
    incomplete = {r.order_id for r in setops.incomplete_order_groups(orders, items, products).collect()}
    assert incomplete == {"o3"}


def test_group_released_when_product_arrives(spark, fixture_tables):
    orders, items, products = fixture_tables
    late_product = _products(spark, [("p_missing", "sku3", 1.0, "cat_c", "late", "acme", 2.0, "d")])
    complete = {
        r.order_id
        for r in setops.complete_order_groups(
            orders, items, products.unionByName(late_product)
        ).collect()
    }
    assert complete == {"o1", "o2", "o3"}


def test_order_without_items_not_complete(spark, fixture_tables):
    orders, items, products = fixture_tables
    lonely = _orders(spark, [("o9", "u9", "pending", TS, None, None, None, 1)])
    complete = {
        r.order_id
        for r in setops.complete_order_groups(
            orders.unionByName(lonely), items, products
        ).collect()
    }
    assert "o9" not in complete


def test_files_for_groups(spark):
    file_ids = spark.createDataFrame(
        [("f1.parquet", ["o1", "o2"]), ("f2.parquet", ["o3"]), ("f3.parquet", ["o1"])],
        "path string, order_ids array<string>",
    )
    groups = spark.createDataFrame([("o1",)], "order_id string")
    paths = {r.path for r in setops.files_for_groups(file_ids, groups).collect()}
    assert paths == {"f1.parquet", "f3.parquet"}


def test_except_and_union(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "cust_key bigint")
    b = spark.createDataFrame([(2,), (3,), (4,)], "cust_key bigint")
    assert {r.cust_key for r in setops.except_keys(a, b, "cust_key").collect()} == {1}
    assert setops.union_distinct([a, b]).count() == 4


# ---------------------------------------------------------------------------
# control-plane helpers: retry/backoff (ST6), JSON state docs (S11/S12)
# ---------------------------------------------------------------------------


def test_retry_on_failure_backoff_and_raise():
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.retry import (
        retry_on_failure,
    )

    delays = []
    calls = {"n": 0}

    @retry_on_failure(max_attempts=3, base_delay=1.0, sleep=delays.append)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok"
    assert delays == [1.0, 2.0]  # reference policy: 1s, 2s (validate.py:99)

    @retry_on_failure(max_attempts=2, base_delay=0.1, sleep=delays.append)
    def always_fails():
        raise ValueError("permanent")

    with pytest.raises(ValueError, match="permanent"):
        always_fails()


def test_json_state_document_roundtrip(spark, tmp_path):
    """S11/S12 (reference control plane: manifest/trigger/state JSON in
    S3): kept as data via spark.read/write.json when an engine user
    wants document state, though the pipeline itself uses checkpoints."""
    import pyspark.sql.functions as F

    state = spark.createDataFrame(
        [("batch-1", ["f1.csv", "f2.csv"], {"orders": "2"})],
        "batch_id string, files array<string>, counts map<string,string>",
    ).withColumn("written_at", F.current_timestamp())
    path = str(tmp_path / "state")
    state.write.mode("overwrite").json(path)
    back = spark.read.json(path)
    row = back.collect()[0]
    assert row.batch_id == "batch-1"
    assert sorted(row.files) == ["f1.csv", "f2.csv"]


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=half the cells must recover most of the true
    top-10 (statistical bound pinned on the fixed testdata)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.join(
        F.broadcast(emb.agg(F.min("vec_id").alias("vec_id"))), "vec_id", "left_semi"
    )
    brute = {r.neighbor_id for r in similarity.cosine_topk(emb, qrow, k=10).collect()}
    ivf = {r.neighbor_id for r in similarity.ivf_topk(emb, qrow, k=10, n_cells=16, nprobe=8).collect()}
    assert len(brute & ivf) >= 5  # ≥50% recall at nprobe=8/16 on random data
    # determinism
    again = {r.neighbor_id for r in similarity.ivf_topk(emb, qrow, k=10, n_cells=16, nprobe=8).collect()}
    assert ivf == again


def test_lsh_multiprobe_recall_vs_brute_force(spark, sf_dir):
    """Hamming-1 multiprobe must (a) never lose candidates vs the
    single-bucket probe, (b) recover a meaningful share of the true
    top-10, (c) stay deterministic."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.join(
        F.broadcast(emb.agg(F.min("vec_id").alias("vec_id"))), "vec_id", "left_semi"
    )
    brute = {r.neighbor_id for r in similarity.cosine_topk(emb, qrow, k=10).collect()}
    h0 = {r.neighbor_id for r in similarity.ann_lsh_topk(
        emb, qrow, k=10, n_planes=4, dim=64, probe_hamming=0).collect()}
    h1 = {r.neighbor_id for r in similarity.ann_lsh_topk(
        emb, qrow, k=10, n_planes=4, dim=64, probe_hamming=1).collect()}
    h2 = {r.neighbor_id for r in similarity.ann_lsh_topk(
        emb, qrow, k=10, n_planes=4, dim=64, probe_hamming=2).collect()}
    # monotone recall in the probe radius; fixed-seed corpus pins the
    # actual values (h0=0, h1=3, h2=9 at sf0.01 with the integer-exact
    # PLANE_SEED=16 family — chosen for 9/10 at h2 across all SFs)
    assert len(brute & h0) <= len(brute & h1) <= len(brute & h2)
    assert len(brute & h1) >= 2
    assert len(brute & h2) >= 8
    again = {r.neighbor_id for r in similarity.ann_lsh_topk(
        emb, qrow, k=10, n_planes=4, dim=64, probe_hamming=2).collect()}
    assert h2 == again


def test_probe_masks_any_radius(spark, sf_dir):
    """probe_masks honors ANY Hamming radius (r4 ADVICE: radius 3+ was
    silently truncated to 2): mask counts follow sum of C(n, r), and at
    radius == n_planes the probe enumerates every bucket, so ANN
    becomes exact — identical top-k to brute-force cosine."""
    from math import comb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    for n in (4, 8):
        for r in range(n + 1):
            masks = similarity.probe_masks(n, r)
            assert len(masks) == sum(comb(n, rr) for rr in range(r + 1))
            assert len(set(masks)) == len(masks)
            assert all(bin(m).count("1") <= r for m in masks)
    assert len(similarity.probe_masks(4, 4)) == 16  # full enumeration
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.probe_masks(4, -1)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.join(
        F.broadcast(emb.agg(F.min("vec_id").alias("vec_id"))), "vec_id", "left_semi"
    )
    brute = {r.neighbor_id for r in similarity.cosine_topk(emb, qrow, k=10).collect()}
    full = {r.neighbor_id for r in similarity.ann_lsh_topk(
        emb, qrow, k=10, n_planes=4, dim=64, probe_hamming=4).collect()}
    assert full == brute


def test_asof_join_semantics(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (1, 50), (2, 10)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 100, "b"), (1, 150, "c"), (3, 1, "z")], "k long, ts long, v string"
    )
    out = {(r.k, r.ts): (r.asof_v, r.asof_ts)
           for r in asof_join(left, right, "k", "ts", "ts").collect()}
    assert out[(1, 100)] == ("b", 100)   # inclusive: equal ts visible
    assert out[(1, 200)] == ("c", 150)
    assert out[(1, 50)] == (None, None)  # nothing at-or-before
    assert out[(2, 10)] == (None, None)  # key absent on right
    strict = {(r.k, r.ts): r.asof_v
              for r in asof_join(left, right, "k", "ts", "ts", strict=True).collect()}
    assert strict[(1, 100)] == "a"       # strict: equal ts NOT visible


def test_salted_join_equals_plain_join(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.skew import (
        salted_join,
    )

    # skewed fact: 90% of rows hit key 7
    fact = spark.range(0, 1000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 7 ELSE id % 100 END AS k", "id AS payload"
    )
    dim = spark.range(0, 100).selectExpr("id AS k", "concat('d', id) AS label")
    plain = sorted(map(tuple, fact.join(dim, "k").select("k", "payload", "label").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, "k", n_salts=8)
                        .select("k", "payload", "label").collect()))
    assert plain == salted and len(plain) == 1000


def test_salted_join_spreads_hot_key(spark):
    """The salt must derive from ROW identity: all rows of the hot key
    may NOT collapse onto a single salt value (ADVICE r1: a key-derived
    salt is a no-op for skew)."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.skew import (
        salted_join,  # noqa: F401  (import proves the API)
    )

    fact = spark.range(0, 1000).selectExpr("CAST(7 AS LONG) AS k", "id AS payload")
    salted = fact.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("k"), F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    n_distinct_salts = salted.select("_salt").distinct().count()
    assert n_distinct_salts >= 4  # hot key spreads over several reducers


def test_asof_join_tie_break_deterministic(spark):
    """Duplicate right rows at the same (key, ts): the row with the
    greatest right_order_col must win, under any input ordering."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.asof import (
        asof_join,
    )

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    rows = [(1, 90, 1, "first"), (1, 90, 3, "third"), (1, 90, 2, "second")]
    for perm in (rows, rows[::-1], [rows[1], rows[0], rows[2]]):
        right = spark.createDataFrame(perm, "k long, ts long, rid long, v string")
        out = asof_join(
            left, right, "k", "ts", "ts", right_value_cols=["v"], right_order_col="rid"
        ).collect()
        assert out[0].asof_v == "third"


def test_interval_join_bucketing_exact(spark):
    """Bucketed interval join must equal the naive inequality join."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        interval_join,
    )

    left = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 250), (2, 500)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 99), (1, 101), (1, 199), (1, 400), (2, 450), (3, 500)], "k long, rts long"
    )
    got = sorted(
        (r.k, r.lts, r.rts)
        for r in interval_join(left, right, "k", "lts", "rts", max_gap=100).collect()
    )
    naive = sorted(
        (r.k, r.lts, r.rts)
        for r in left.join(right, "k").filter(F.abs(F.col("lts") - F.col("rts")) <= 100).collect()
    )
    assert got == naive
    assert (1, 0, 99) in got and (1, 250, 199) in got and (2, 500, 450) in got


def test_pandas_udf_twin_matches_codegen(spark, sf_dir):
    """The Arrow pandas_udf path (the sanctioned slow path) must agree
    with the JVM expression twin — pins the UDF infrastructure without
    putting Python in any shipped hot path."""
    from pyspark.sql.functions import pandas_udf

    # explicit-returnType form: `from __future__ import annotations`
    # stringifies hints, which pyspark's hint inspector can't resolve
    def _digit_ratio(text):
        n = text.str.len()
        digits = text.str.count(r"[0-9]")
        return (digits / n.where(n > 0, 1)).astype("float64")

    digit_ratio_udf = pandas_udf(_digit_ratio, "double")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        text as text_ops,
    )

    both = (
        text_ops.quality_features(docs)
        .withColumn("udf_ratio", digit_ratio_udf(F.col("text")))
        .select("doc_id", "digit_ratio", "udf_ratio")
        .collect()
    )
    for r in both:
        assert abs(r.digit_ratio - r.udf_ratio) < 1e-12


def test_compact_small_files(spark, tmp_path):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        maintenance,
    )
    import os

    path = str(tmp_path / "t")
    spark.range(0, 10000).repartition(40).write.parquet(path)  # 40 small files
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 40
    maintenance.compact(spark, path, target_file_bytes=10**9)
    after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert after == 1
    assert spark.read.parquet(path).count() == 10000


def test_column_stats_single_pass(spark, sf_dir):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        maintenance,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    stats = {r.column_name: r for r in maintenance.column_stats(
        orders, ["o_orderkey", "o_orderstatus"]).collect()}
    assert stats["o_orderkey"].n_rows == orders.count()
    assert stats["o_orderkey"].n_nulls == 0
    assert stats["o_orderstatus"].approx_ndv == 3
    assert stats["o_orderstatus"].min_value == "F"


# ---------------------------------------------------------------------------
# dedup semantics on a corpus with KNOWN near-duplicates
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nearly_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    variant = base.replace("today", "tonight")          # 1-word edit
    unrelated = "completely different words appear in this other document about spark engines"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, variant), (4, unrelated)], "doc_id long, text string"
    )


def test_exact_dedup_groups(nearly_dup_docs):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    groups = {r.keep_id: r.n_copies for r in dedup.exact_duplicates(nearly_dup_docs).collect()}
    assert groups[1] == 2          # docs 1+2 identical → one group, keep min id
    assert groups[3] == 1 and groups[4] == 1


def test_jaccard_finds_near_dup_not_unrelated(nearly_dup_docs):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(nearly_dup_docs, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0                      # identical
    assert 0.5 < pairs[(1, 3)] < 1.0                 # 1-word edit → high jaccard
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_bands_collide_for_near_dups(nearly_dup_docs):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    cand = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_candidates(nearly_dup_docs).collect()}
    assert (1, 2) in cand            # identical docs always share every band
    assert (1, 4) not in cand        # unrelated docs share no band
    # signatures of identical docs are identical
    sigs = {r.doc_id: tuple(r)[1:] for r in dedup.minhash_signatures(nearly_dup_docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_domain_cap_quality_ranked_per_group(spark):
    """Per-domain cap: quality-ranked keep set, id tie-break, exact
    rank values, and groups smaller than the cap keep everything."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    docs = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 90), (3, "a", 90), (4, "a", 10), (5, "b", 7)],
        "doc_id long, source string, n_chars long",
    )
    out = {r.doc_id: (r.domain_rank, r.domain_kept)
           for r in curation.domain_cap(docs, n_per_group=2).collect()}
    assert out == {2: (1, True),   # 90, id 2 < 3
                   3: (2, True),
                   1: (3, False),
                   4: (4, False),
                   5: (1, True)}   # small group: all kept


def test_canonical_docs_keeps_highest_quality_with_id_tiebreak(spark):
    """Keeper selection: max quality wins; equal quality falls back to
    the lowest id; singleton clusters keep their only member."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "node_id long, cluster_id long",
    )
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4), (20, 7)],
        "doc_id long, n_chars long",
    )
    out = {r.cluster_id: r.canonical_id
           for r in dedup.canonical_docs(clusters, docs).collect()}
    assert out == {1: 2,    # 9 beats 5; id 2 < id 3 at equal quality
                   10: 10,  # tie on quality -> min id
                   20: 20}  # singleton


def test_signature_agreement_estimates_jaccard(nearly_dup_docs):
    """n_sig_agree must equal the hand-counted component matches of the
    already-materialized signatures; identical docs estimate 1.0, and
    every LSH candidate agrees on at least one full band (>= k/bands)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    pairs = dedup.minhash_lsh_candidates(nearly_dup_docs, bands=4, k=16)
    sig = dedup.minhash_signatures(nearly_dup_docs, k=16)
    out = {
        (r.id_a, r.id_b): (r.n_sig_agree, r.est_jaccard)
        for r in dedup.signature_agreement(pairs, sig, k=16).collect()
    }
    sigs = {r.doc_id: [r[f"mh_{i}"] for i in range(16)] for r in sig.collect()}
    for (a, b), (n, est) in out.items():
        expect = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        assert n == expect
        assert est == n / 16.0
        assert n >= 4  # candidates share >= 1 full band of 4 rows
    assert out[(1, 2)] == (16, 1.0)  # identical docs


def test_simhash_hamming_close_for_near_dups(nearly_dup_docs):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    sh = {r.doc_id: r.simhash for r in dedup.simhash(nearly_dup_docs).collect()}
    assert sh[1] == sh[2]
    ham_near = bin(sh[1] ^ sh[3]).count("1")
    ham_far = bin(sh[1] ^ sh[4]).count("1")
    assert ham_near < ham_far


def _uf_min_labels(edges):
    """Reference union-find: node -> min id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, set[int]] = {}
    for n in parent:
        comps.setdefault(find(n), set()).add(n)
    return {n: min(ms) for ms in comps.values() for n in ms}


def test_duplicate_clusters_transitive_chain(spark):
    """A~B, B~C (no A~C pair) must land in ONE cluster — the property
    pair-based dedup lacks and clustering exists to provide."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    # 40-link chain: worst case for naive propagation (diameter 40);
    # the pointer-jumping fixpoint must still converge inside the
    # operator's round budget.
    edges = [(i, i + 1) for i in range(1, 41)] + [(500, 900)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node_id: r.cluster_id for r in dedup.duplicate_clusters(df).collect()}
    assert got == _uf_min_labels(edges)
    assert {got[i] for i in range(1, 42)} == {1}
    assert got[900] == 500


def test_duplicate_clusters_matches_union_find_on_random_graph(spark):
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rng = random.Random(11)
    edges = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randint(1, 200), rng.randint(1, 200)) for _ in range(150))
        if a != b
    })
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node_id: r.cluster_id for r in dedup.duplicate_clusters(df).collect()}
    assert got == _uf_min_labels(edges)


def test_compute_all_single_cache(fixture_tables):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        enrich as enrich_op,
        kpis as kpis_op,
    )

    orders, items, products = fixture_tables
    enriched = enrich_op.enrich_orders(orders, items, products)
    cat, daily = kpis_op.compute_all(enriched)
    assert cat.count() == 3 and daily.count() == 2  # both derived fine off the cache


def test_curation_pipeline_stages(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                                  # exact dup → dropped (keep 1)
            (3, base.replace("today", "tonight")),      # near dup of 1 → dropped
            (4, "completely different words appear in this other document about spark"),
            (5, "too short"),                           # quality-gated
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.split for r in curation.curate(docs).collect()}
    assert set(out) == {1, 4}
    assert all(s in ("train", "val", "test") for s in out.values())
    # split stability: adding docs never changes an existing doc's split
    more = docs.union(spark.createDataFrame([(6, base + " extra words here")],
                                            "doc_id long, text string"))
    out2 = {r.doc_id: r.split for r in curation.curate(more).collect()}
    assert out2[1] == out[1] and out2[4] == out[4]


def test_serving_casts_shapes(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        serving,
    )
    import datetime as _dt
    import decimal

    daily = spark.createDataFrame(
        [( _dt.date(2024, 3, 1), 3, 123.456, 7, 0.5, None)],
        "order_date date, total_orders long, total_revenue double, "
        "total_items_sold long, return_rate double, unique_customers long",
    )
    out = serving.serving_order_kpis(daily).collect()[0]
    assert out.order_date == "2024-03-01"
    assert isinstance(out.total_revenue, decimal.Decimal)
    assert out.unique_customers == 0  # null→0 coalesce (reference P6)
    assert dict(serving.serving_order_kpis(daily).dtypes)["total_revenue"] == "decimal(38,6)"


def test_compact_with_sort_restores_clustering(spark, tmp_path):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        maintenance,
    )
    import pyspark.sql.functions as _F

    path = str(tmp_path / "t")
    spark.range(0, 1000).select((_F.col("id") % 100).alias("k"), "id") \
        .repartition(10).write.parquet(path)
    maintenance.compact(spark, path, target_file_bytes=10**9, sort_by=["k"])
    df = spark.read.parquet(path)
    assert df.count() == 1000
    # single sorted file → min/max row-group stats usable for pruning
    rows = [r.k for r in df.collect()]
    assert rows == sorted(rows)


def test_curation_threshold_sensitivity(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base.replace("kappa", "lambda"))], "doc_id long, text string"
    )
    strict = {r.doc_id for r in curation.curate(docs, near_dup_threshold=0.5).collect()}
    lax = {r.doc_id for r in curation.curate(docs, near_dup_threshold=0.99).collect()}
    assert strict == {1}       # high overlap → 2 dropped at 0.5
    assert lax == {1, 2}       # 0.99 keeps both (not identical)


def test_intersect_keys(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.setops import (
        intersect_keys,
    )

    left = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(2,), (3,), (3,), (4,)], "kk long")
    got = sorted(r.k for r in intersect_keys(left, right, "k", "kk").collect())
    assert got == [2, 3]


def test_write_bucketed_join_has_no_shuffle(spark):
    """Co-bucketed tables joined on the bucket key must plan WITHOUT a
    shuffle exchange on either side — the property bucketing exists
    for (repeated fact⋈fact joins stop re-shuffling every run)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        maintenance,
    )
    import pyspark.sql.functions as _F

    left = spark.range(0, 5000).select(
        _F.col("id").alias("order_id"), (_F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 5000).select(
        _F.col("id").alias("order_id"), (_F.col("id") % 3).alias("w")
    )
    maintenance.write_bucketed(left, "bkt_orders", ["order_id"], 8, sort_cols=["order_id"])
    maintenance.write_bucketed(right, "bkt_items", ["order_id"], 8, sort_cols=["order_id"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_orders").join(spark.table("bkt_items"), "order_id")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() == 5000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_items")


def test_zorder_compact_bounds_both_columns(spark, tmp_path):
    """After Z-ordering on (a, b), EVERY file's bounding box must be
    tight on BOTH columns — the multi-column pruning property a
    single-column sort cannot give. Verified against the actual
    parquet footer min/max (what a scan's file-skipping reads)."""
    import os as _os

    import pyarrow.parquet as _pq

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        maintenance,
    )
    import pyspark.sql.functions as _F

    path = str(tmp_path / "zt")
    # 64x64 grid (8 rows per cell), written row-major so a naive
    # layout clusters `a` only
    n = 64
    grid = spark.range(0, n * n * 8).select(
        ((_F.col("id") / 8).cast("long") % n).alias("a"),
        _F.floor(_F.col("id") / (8 * n)).alias("b"),
    )
    grid.repartition(4).write.parquet(path)

    total = sum(
        f.stat().st_size for f in (tmp_path / "zt").iterdir() if f.name.endswith(".parquet")
    )
    n_files = maintenance.zorder_compact(
        spark, path, ["a", "b"], target_file_bytes=max(1, total // 16), bits=6
    )
    assert n_files >= 8  # the clustering claim is vacuous with 1-2 files

    spans_a, spans_b = [], []
    for f in _os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = _pq.ParquetFile(_os.path.join(path, f)).metadata
        mins = {"a": [], "b": []}
        maxs = {"a": [], "b": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        spans_a.append(max(maxs["a"]) - min(mins["a"]))
        spans_b.append(max(maxs["b"]) - min(mins["b"]))

    # Files cover sub-rectangles on BOTH axes ON AVERAGE (a file that
    # straddles a Morton quadrant boundary can legitimately span wide —
    # range cuts don't align with quadrant cuts). Row-major input gives
    # mean span(a) == 63; a single-column sort gives mean span(b) == 63;
    # z-order must beat both on BOTH axes simultaneously.
    assert sum(spans_a) / len(spans_a) <= n / 2, spans_a
    assert sum(spans_b) / len(spans_b) <= n / 2, spans_b


def test_overlap_join_matches_naive(spark):
    """Bucketed interval-overlap join == the naive cross-join filter,
    across bucket-spanning, bucket-straddling, empty, and unmatched
    intervals; left-outer keeps unmatched LEFT rows exactly once."""
    import itertools

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        overlap_join,
    )

    left_rows = [
        ("k1", 0, 25, "L0"),      # spans 3 buckets at width 10
        ("k1", 40, 41, "L1"),     # single point-ish
        ("k1", 90, 90, "Lempty"), # empty: matches nothing
        ("k2", 5, 15, "L2"),
        ("k3", 0, 100, "Lsolo"),  # no right partner
    ]
    right_rows = [
        ("k1", 20, 30, "R0"),     # overlaps L0 tail
        ("k1", 24, 26, "R1"),     # inside L0
        ("k1", 41, 50, "R2"),     # touches L1 end: NO overlap ([ , ) )
        ("k2", 0, 6, "R3"),       # overlaps L2 head
        ("k2", 15, 20, "R4"),     # touches L2 end: no
    ]
    L = spark.createDataFrame(left_rows, "key string, ls long, le long, lname string")
    R = spark.createDataFrame(right_rows, "key string, rs long, re long, rname string")

    got = {
        (r["lname"], r["rname"])
        for r in overlap_join(L, R, "key", "ls", "le", "rs", "re", bucket_width=10).collect()
    }
    naive = {
        (ln, rn)
        for (lk, ls, le, ln), (rk, rs, re, rn) in itertools.product(left_rows, right_rows)
        if lk == rk and ls < re and rs < le
    }
    assert got == naive

    outer = overlap_join(
        L, R, "key", "ls", "le", "rs", "re", bucket_width=10, how="left"
    ).collect()
    pairs = [(r["lname"], r["rname"]) for r in outer]
    assert set(pairs) == naive | {("L1", None), ("Lempty", None), ("Lsolo", None)}
    assert len(pairs) == len(naive) + 3  # unmatched rows exactly once


def test_scd2_intervals_runs_and_open_end(spark):
    """Change-event log -> SCD2 history: identical consecutive states
    collapse, attribute flips cut intervals, the live state stays open
    (or gets the sentinel), and intervals tile the timeline."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        scd2_intervals,
    )

    rows = [
        ("u1", 10, "bronze", "eu"),
        ("u1", 20, "bronze", "eu"),   # no change: collapses into run 1
        ("u1", 30, "silver", "eu"),   # tier change
        ("u1", 40, "silver", None),   # region -> NULL is a change
        ("u2", 15, "gold", "us"),
    ]
    df = spark.createDataFrame(rows, "k string, ts long, tier string, region string")
    hist = {
        (r["k"], r["valid_from"]): (r["valid_to"], r["tier"], r["region"])
        for r in scd2_intervals(df, "k", "ts", ["tier", "region"]).collect()
    }
    assert hist == {
        ("u1", 10): (30, "bronze", "eu"),
        ("u1", 30): (40, "silver", "eu"),
        ("u1", 40): (None, "silver", None),
        ("u2", 15): (None, "gold", "us"),
    }
    closed = scd2_intervals(df, "k", "ts", ["tier", "region"], open_end=10**9).collect()
    assert {r["valid_to"] for r in closed if r["k"] == "u2"} == {10**9}


def test_scd2_feeds_overlap_join(spark):
    """The intended composition: fact windows x SCD2 dim history."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        overlap_join,
        scd2_intervals,
    )

    events = spark.createDataFrame(
        [("u1", 10, "bronze"), ("u1", 30, "silver")], "k string, ts long, tier string"
    )
    dim = scd2_intervals(events, "k", "ts", ["tier"], open_end=1000)
    facts = spark.createDataFrame(
        [("u1", 25, 35, "f1")], "k string, fs long, fe long, fname string"
    )
    got = {
        (r["fname"], r["tier"])
        for r in overlap_join(
            facts, dim, "k", "fs", "fe", "valid_from", "valid_to", bucket_width=20
        ).collect()
    }
    assert got == {("f1", "bronze"), ("f1", "silver")}  # window straddles the change


def test_overlap_join_left_null_attr_emitted_once(spark):
    """A matched left row containing a NULL attribute must appear
    exactly once (ADVICE r3: the left-anti on left.columns used
    non-null-safe equality, so NULL-bearing matched rows were ALSO
    null-extended — emitted twice)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.rangejoin import (
        overlap_join,
    )

    L = spark.createDataFrame(
        [("k1", 0, 10, None), ("k1", 50, 60, "named")],
        "key string, ls long, le long, lattr string",
    )
    R = spark.createDataFrame([("k1", 5, 7, "R0")], "key string, rs long, re long, rname string")
    rows = overlap_join(
        L, R, "key", "ls", "le", "rs", "re", bucket_width=10, how="left"
    ).collect()
    assert len(rows) == 2
    assert ({(r["lattr"], r["rname"]) for r in rows}
            == {(None, "R0"), ("named", None)})
    assert "_lrow_id" not in rows[0].asDict()


def test_near_dup_blocking_recall_vs_all_pairs(spark, sf_dir):
    """The gated q28 plan is the BLOCKED near-dup join (mask-ring
    equi-join over integer-exact SRP buckets). Pin (a) its recall vs
    the all-pairs exactness baseline on the fixed corpus, (b) that the
    blocked result is EXACTLY the baseline restricted to Hamming<=2
    candidates (no pair is ever emitted twice or with a different
    cosine), (c) determinism across runs."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.embedding_near_dups_exact(emb, threshold=0.5).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in similarity.embedding_near_dups(
            emb, threshold=0.5, n_planes=4, dim=64, probe_hamming=2
        ).collect()
    }
    # subset with identical cosines, each pair once
    assert set(blocked) <= set(exact)
    assert all(exact[p] == c for p, c in blocked.items())
    # recall pinned on the fixed corpus: 1/1 at sf0.01 (12/14 at sf0.1)
    assert len(blocked) >= len(exact) - max(2, len(exact) // 7)
    assert len(blocked) >= 1
    again = {
        (r.id_a, r.id_b)
        for r in similarity.embedding_near_dups(
            emb, threshold=0.5, n_planes=4, dim=64, probe_hamming=2
        ).collect()
    }
    assert set(blocked) == again


def test_jaccard_max_df_cut_drops_hot_shingles(spark):
    """The document-frequency cut (r4): a stop-shingle present in every
    document is dropped before the self-join, so (a) pairs related ONLY
    through it disappear, (b) Jaccard is computed over the retained
    shingle sets, (c) max_df_pct=None keeps the old behavior exactly."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    stop = "the quick brown fox"  # shared 4-gram -> two 3-shingles in ALL docs
    docs = spark.createDataFrame(
        [
            (1, stop + " alpha beta gamma delta"),
            (2, stop + " alpha beta gamma delta"),
            (3, stop + " epsilon zeta eta theta"),
            (4, stop + " iota kappa lambda mu"),
        ],
        "doc_id long, text string",
    )
    uncut = {(r.id_a, r.id_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.01).collect()}
    cut = {(r.id_a, r.id_b): r.jaccard
           for r in dedup.ngram_jaccard_pairs(docs, threshold=0.01, max_df_pct=50).collect()}
    # without the cut every pair shares the stop shingles
    assert (3, 4) in uncut
    # with it, docs related only through stop shingles no longer pair
    assert (3, 4) not in cut
    # identical docs still pair at jaccard 1.0 over their retained sets
    assert cut[(1, 2)] == 1.0
    # doc-specific shingles are untouched: (1,3) shares nothing retained
    assert (1, 3) not in cut


def test_banded_near_dup_high_threshold(spark):
    """Multi-table banded sign-LSH (r4): planted near-identical pairs
    are found at tau=0.9, pairs colliding in several tables emit ONCE,
    results are a subset of the all-pairs baseline with identical
    cosines, and unrelated vectors don't pair."""
    import numpy as np
    import pandas as pd

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    rng = np.random.RandomState(3)
    base = rng.normal(size=(20, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + rng.normal(size=(20, 64)).astype(np.float32) * 0.02
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    vecs = np.vstack([base, dup])
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                      "embedding": list(map(list, vecs))})
    )
    got = similarity.embedding_near_dups_banded(
        df, threshold=0.9, n_tables=8, band_planes=12
    ).collect()
    pairs = {(r.id_a, r.id_b): r.cosine_sim for r in got}
    assert len(pairs) == len(got)  # no duplicate emissions
    planted = {(i, i + 20) for i in range(20)}
    assert len(set(pairs) & planted) >= 18  # ~1-(1-.94^12)^8 recall on 20
    exact = {(r.id_a, r.id_b): r.cosine_sim
             for r in similarity.embedding_near_dups_exact(df, threshold=0.9).collect()}
    assert set(pairs) <= set(exact)
    assert all(exact[p] == c for p, c in pairs.items())


def test_stratified_sample_deterministic_monotone(spark):
    """Per-group deterministic sampling (r5): exact per-group budgets,
    run-to-run identical, n=5 sample ⊂ n=10 sample (monotone growth),
    different salt → different draw."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    df = spark.range(0, 300).select(
        (F.col("id") % 3).cast("string").alias("cls"), F.col("id").alias("doc_id")
    )
    s10 = curation.stratified_sample(df, ["cls"], "doc_id", 10)
    counts = {r["cls"]: r["n"] for r in s10.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10}

    ids10 = {r["doc_id"] for r in s10.collect()}
    again = {r["doc_id"] for r in curation.stratified_sample(df, ["cls"], "doc_id", 10).collect()}
    assert ids10 == again  # deterministic

    ids5 = {r["doc_id"] for r in curation.stratified_sample(df, ["cls"], "doc_id", 5).collect()}
    assert ids5 < ids10  # monotone: smaller budget is a subset

    salted = {r["doc_id"] for r in curation.stratified_sample(df, ["cls"], "doc_id", 10, salt="x").collect()}
    assert salted != ids10  # independent replicate

    # small groups: budget larger than the group returns the whole group
    tiny = spark.createDataFrame([("a", 1), ("a", 2)], "cls string, doc_id long")
    assert curation.stratified_sample(tiny, ["cls"], "doc_id", 10).count() == 2


def test_snapshot_diff_classifies_all_change_types(spark):
    """Keyed dataset-version diff (r5): added/removed/changed/unchanged
    with null-safe attribute compare and sorted changed_cols CSV."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "C", 31.0), (4, None, 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in curation.snapshot_diff(old, new, ["k"]).collect()}
    assert out[1].change_type == "removed"
    assert out[2].change_type == "unchanged"   # NULL == NULL (null-safe)
    assert out[3].change_type == "changed"
    assert out[3].changed_cols == "s,v"        # sorted CSV
    assert out[4].change_type == "unchanged"   # NULL attr matches itself
    assert out[5].change_type == "added"
    assert all(r.changed_cols == "" for k, r in out.items() if k != 3)

    # compare_cols restriction: v-only diff sees k=3 changed, s ignored
    vonly = {r["k"]: r for r in curation.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert vonly[3].change_type == "changed" and vonly[3].changed_cols == "v"


def test_redact_pii_counts_and_replacement(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [
        (1, "mail me at jo.doe+x@example.co.uk or call +1 555 867-5309 now"),
        (2, "server 192.168.0.1 billed card 4111 1111 1111 1111 twice"),
        (3, "nothing sensitive here, order #12 qty 3"),
        (4, "two mails: a@b.io c@d.org; ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r.id: r for r in curation.redact_pii(df).collect()}

    assert out[1].n_pii_email == 1 and out[1].n_pii_phone == 1
    assert "<EMAIL>" in out[1].text_redacted
    assert "<PHONE>" in out[1].text_redacted
    assert "jo.doe" not in out[1].text_redacted
    assert "5309" not in out[1].text_redacted

    assert out[2].n_pii_ipv4 == 1 and out[2].n_pii_card == 1
    assert "<IPV4>" in out[2].text_redacted and "<CARD>" in out[2].text_redacted
    assert "4111" not in out[2].text_redacted

    assert (
        out[3].n_pii_email
        == out[3].n_pii_phone
        == out[3].n_pii_ipv4
        == out[3].n_pii_card
        == 0
    )
    assert out[3].text_redacted == rows[2][1]  # untouched

    assert out[4].n_pii_email == 2 and out[4].n_pii_ipv4 == 1
    assert out[4].text_redacted.count("<EMAIL>") == 2


def test_redact_pii_counts_match_duckdb_oracle(spark):
    """Patterns are RE2-safe by design: DuckDB must count the same
    spans (the property that would make a gated slot oracle-able if
    the corpus ever carries PII)."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [
        (1, "a@b.io and c.d-e@f.gh.ij plus 10.0.0.255 and +44-020-7946-0958"),
        (2, "cards 4111-1111-1111-1111 and 5500 0000 0000 0004; ip 1.2.3.4"),
        (3, "plain text, no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    spark_counts = {
        r.id: (r.n_pii_email, r.n_pii_phone, r.n_pii_ipv4, r.n_pii_card)
        for r in curation.redact_pii(df).collect()
    }
    con = duckdb.connect()
    for rid, text in rows:
        got = tuple(
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))",
                [text, curation.PII_PATTERNS[k]],
            ).fetchone()[0]
            for k in ("email", "phone", "ipv4", "card")
        )
        assert got == spark_counts[rid], (rid, got, spark_counts[rid])


def test_pack_sequences_invariants(spark):
    """First-fit-in-hash-order packing: offsets are exclusive running
    sums mod budget, pack totals stay within budget + max_doc, the
    layout is deterministic, and packs never span shards."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(i, 10 + (i * 37) % 90) for i in range(200)]  # tokens 10..99
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = curation.pack_sequences(
        df, budget_tokens=256, n_shards=4
    ).collect()
    assert len(out) == 200
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4)) and len(by_shard) == 4
    max_doc = max(t for _i, t in rows)
    for shard, docs in by_shard.items():
        # reconstruct the within-shard order from offsets: exclusive
        # cumsum = pack_id*256 + pack_offset must be strictly increasing
        # in steps of each doc's tokens
        docs = sorted(docs, key=lambda r: (r.pack_id, r.pack_offset))
        cum = 0
        for r in docs:
            assert r.pack_id * 256 + r.pack_offset == cum
            cum += r.n_tokens
        # every pack's first doc starts within the budget (overflow
        # bounded by one doc)
        totals: dict[int, int] = {}
        for r in docs:
            totals[r.pack_id] = totals.get(r.pack_id, 0) + r.n_tokens
        for pid, tot in totals.items():
            if pid < max(totals):  # last pack may be underfull
                assert tot <= 256 + max_doc

    # determinism across repartitionings
    again = curation.pack_sequences(
        df.repartition(13), budget_tokens=256, n_shards=4
    ).collect()
    assert {(r.doc_id, r.shard, r.pack_id, r.pack_offset) for r in out} == {
        (r.doc_id, r.shard, r.pack_id, r.pack_offset) for r in again
    }


def test_pack_sequences_matches_duckdb_oracle(spark):
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(i, 5 + (i * 13) % 50) for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r.doc_id: (r.shard, r.pack_id, r.pack_offset)
        for r in curation.pack_sequences(df, 128, n_shards=8).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i},{t})" for i, t in rows)
        + ") v(doc_id, n_tokens)"
    )
    sql = """
    SELECT doc_id, shard,
           (cum - n_tokens) // 128 AS pack_id,
           (cum - n_tokens) % 128 AS pack_offset
    FROM (
        SELECT doc_id, n_tokens, shard,
               SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM (
            SELECT doc_id, n_tokens,
                   CAST(concat('0x', substr(md5('␟' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) AS h,
                   ((CAST(concat('0x', substr(md5('␟' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 8) + 8) % 8 AS shard
            FROM docs
        )
    )
    """
    for doc_id, shard, pack_id, pack_offset in con.execute(sql).fetchall():
        assert got[doc_id] == (shard, pack_id, pack_offset), doc_id


def test_mixture_sample_fractions_and_stability(spark):
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = curation.mixture_sample(
        df, {"web": 0.25, "books": 1.0}, default_frac=0.5
    )
    counts = {
        r.source: r.cnt
        for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts["books"] == 1000                       # frac 1.0: all kept
    assert abs(counts["web"] - 250) < 80                 # ~25%
    assert abs(counts.get("code", 0) - 500) < 100        # default 50%

    # stability: kept set of a PREFIX corpus is a subset of the full run
    prefix = curation.mixture_sample(
        df.filter("doc_id < 1500"), {"web": 0.25, "books": 1.0},
        default_frac=0.5,
    )
    full_ids = {r.doc_id for r in kept.collect()}
    assert {r.doc_id for r in prefix.collect()} == {
        i for i in full_ids if i < 1500
    }


def test_winnowing_guarantee_and_density(spark):
    """The winnowing guarantee: documents sharing a normalized
    substring of length >= k + window - 1 share at least one
    fingerprint; density stays well below the full gram count; the
    normalization makes case/whitespace edits invisible."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    rows = [
        (1, "intro text alpha. " + shared + " closing words one"),
        (2, "completely different opening! " + shared.upper() + " ending two"),
        (3, "unrelated content about databases and query optimizers only"),
        (4, "zzz qqq vvv www kkk jjj hhh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    k, w = 5, 4
    fps = dedup.winnow_fingerprints(df, k=k, window=w)
    by_doc: dict[int, set] = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    # guarantee: 1 and 2 share the long passage (case-normalized)
    assert by_doc[1] & by_doc[2]
    # density: far fewer fingerprints than grams
    n_norm = len("".join(c for c in rows[0][1].lower() if c.isalnum()))
    assert len(by_doc[1]) < (n_norm - k + 1) / 2

    pairs = {
        (r.id_a, r.id_b): r.shared_fps
        for r in dedup.winnow_overlap_pairs(df, min_shared=2, k=k, window=w).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all({a, b} == {1, 2} for a, b in pairs), pairs

    # whitespace/case edits leave the fingerprint set unchanged
    df_edit = spark.createDataFrame(
        [(1, rows[0][1].upper().replace(" ", "\n  "))], ["doc_id", "text"]
    )
    fps_edit = {r.fp for r in dedup.winnow_fingerprints(df_edit, k=k, window=w).collect()}
    assert fps_edit == by_doc[1]


def test_pq_encode_compression_and_determinism(spark):
    """PQ codes: m small ints replace dim floats (16x+ compression),
    encoding is integer-exact (partition-invariant), and every code is
    a valid centroid index."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = sim.pq_train(emb, m=8, ksub=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    enc = sim.pq_encode(emb, books)
    rows = enc.select("vec_id", "_pq").collect()
    assert all(len(r._pq) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r._pq)
    again = {
        (r.vec_id, tuple(r._pq))
        for r in sim.pq_encode(emb.repartition(13), books)
        .select("vec_id", "_pq")
        .collect()
    }
    assert {(r.vec_id, tuple(r._pq)) for r in rows} == again


def test_pq_adc_recall_with_rerank(spark):
    """Pinned recall on the sf0.01 embeddings (uniform synthetic — the
    HARD case for quantized ANN): the ADC shortlist alone reaches 8/10
    at the cheap m=8/ksub=16 config, and the standard
    shortlist→exact-rerank stage reaches 10/10 at m=16/ksub=64. The
    exact top-1 must survive every configuration."""
    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in q.embedding]
    qlit = F.array(*[F.lit(x) for x in qvec])
    d2e = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    rest = emb.filter(F.col("vec_id") != q.vec_id)
    exact = [
        r.vec_id
        for r in rest.select("vec_id", d2e.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    ]

    books = sim.pq_train(emb, m=8, ksub=16)
    enc = sim.pq_encode(rest, books)
    short = [
        r.neighbor_id
        for r in sim.pq_topk(enc, books, qvec, k=50).collect()
    ]
    assert len(set(exact) & set(short)) >= 8
    assert exact[0] in short

    books2 = sim.pq_train(emb, m=16, ksub=64)
    enc2 = sim.pq_encode(rest, books2)
    rer = [
        r.neighbor_id
        for r in sim.pq_search_rerank(
            rest, enc2, books2, qvec, k=10, shortlist=50
        ).collect()
    ]
    assert rer == exact  # exact rerank of a 10/10 shortlist IS the truth


def test_pq_seeded_codebooks_machinery(spark):
    """Seeded (data-independent) PQ codebooks: quantize-lossless
    constants, deterministic encode, and ADC ranking that still finds
    the exact nearest neighbor inside a modest shortlist — the
    oracle-able twin of the trained path."""
    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    books = sim.pq_codebooks_seeded(m=8, ksub=16, dsub=8)
    # constants must be exactly representable under the quantizer
    for book in books:
        for cent in book:
            assert sim.quantize_floats(cent) == [
                int(v * sim.QUANT) for v in cent
            ]
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in q.embedding]
    rest = emb.filter(F.col("vec_id") != q.vec_id)
    enc = sim.pq_encode(rest, books)
    a = {(r.vec_id, tuple(r._pq)) for r in enc.select("vec_id", "_pq").collect()}
    b = {
        (r.vec_id, tuple(r._pq))
        for r in sim.pq_encode(rest.repartition(11), books)
        .select("vec_id", "_pq")
        .collect()
    }
    assert a == b
    qlit = F.array(*[F.lit(x) for x in qvec])
    d2e = F.aggregate(
        F.zip_with(F.col("embedding"), qlit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nn1 = (
        rest.select("vec_id", d2e.alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(1)
        .collect()[0]
        .vec_id
    )
    short = [
        r.neighbor_id for r in sim.pq_topk(enc, books, qvec, k=100).collect()
    ]
    assert nn1 in short


def test_band_buckets_expr_matches_per_table_lsh_bucket(spark):
    """The single-expression band-bucket array (gated in q28's
    n_band_tables_agree) must equal lsh_bucket_int applied per table —
    the two code paths share only the published plane constants."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )
    import pyspark.sql.functions as F

    tables = sim.banded_tables(n_tables=4, band_planes=8, dim=64)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    combined = {
        r.vec_id: list(r.tb)
        for r in emb.select(
            "vec_id", sim.band_buckets_expr(tables, "embedding").alias("tb")
        ).collect()
    }
    per_table = {
        r.vec_id: [r[f"b{t}"] for t in range(4)]
        for r in emb.select(
            "vec_id",
            *[
                sim.lsh_bucket_int(F.col("embedding"), tables[t]).alias(f"b{t}")
                for t in range(4)
            ],
        ).collect()
    }
    assert combined == per_table and len(combined) > 0


def test_lsh_bucket_int_expr_matches_column_form(spark):
    """r17: lsh_bucket_int_expr (ONE generated SQL string — the
    ivf_assign expression-cost pattern, adopted after plan BUILD time
    was measured dominating gated q29) must equal the Column-tree
    lsh_bucket_int bit-for-bit on real vectors, across plane counts —
    bucket ids are part of the declared results (candidate sets), so
    the two forms may never drift."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for n_planes in (4, 6, 16):
        planes = sim.hyperplanes_int(n_planes, 64)
        mism = (
            emb.select(
                "vec_id",
                sim.lsh_bucket_int(F.col("embedding"), planes).alias("old"),
                sim.lsh_bucket_int_expr(planes, "embedding").alias("new"),
            )
            .filter(F.col("old") != F.col("new"))
            .count()
        )
        assert mism == 0, f"n_planes={n_planes}: {mism} bucket mismatches"

    # r18 (ADVICE r17): a backtick in the column name must be escaped
    # in the generated SQL exactly as the Column form handles it
    planes = sim.hyperplanes_int(4, 64)
    weird = emb.select(
        "vec_id", F.col("embedding").alias("ve`c"),
    )
    mism = (
        weird.select(
            # F.col parses backticks: escape by doubling inside quotes
            sim.lsh_bucket_int(F.col("`ve``c`"), planes).alias("old"),
            # lsh_bucket_int_expr takes the RAW name and quotes it itself
            sim.lsh_bucket_int_expr(planes, "ve`c").alias("new"),
        )
        .filter(F.col("old") != F.col("new"))
        .count()
    )
    assert mism == 0


def test_pq_adc_expr_equals_encode_plus_topk(spark):
    """pq_adc_expr (the single-projection IVF-PQ cell-scan shape gated
    in q42) must produce the identical integer ADC distance as the
    two-stage pq_encode → pq_topk API for every row."""
    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    books = sim.pq_codebooks_seeded(m=8, ksub=16, dsub=8)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in q.embedding]
    rest = emb.filter(F.col("vec_id") != q.vec_id)
    n = rest.count()
    two_stage = {
        r.neighbor_id: r.approx_d2
        for r in sim.pq_topk(sim.pq_encode(rest, books), books, qvec, k=n).collect()
    }
    one_proj = {
        r.vec_id: r.adc
        for r in rest.select(
            "vec_id", sim.pq_adc_expr(books, qvec).alias("adc")
        ).collect()
    }
    assert two_stage == one_proj and len(one_proj) == n


def test_chunk_documents_parity_and_invariants(spark):
    """Token-window chunking (r8): disjoint, overlapping, and gap
    strides match a DuckDB re-derivation row-for-row, disjoint chunks
    reassemble the document exactly, and no chunk exceeds the window."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [
        (1, ""),                                    # degenerate
        (2, "one"),                                 # single token
        (3, " ".join(f"t{i}" for i in range(7))),   # < chunk
        (4, " ".join(f"t{i}" for i in range(8))),   # == chunk
        (5, " ".join(f"t{i}" for i in range(9))),   # chunk + 1
        (6, " ".join(f"t{i}" for i in range(45))),  # long
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )

    for chunk, stride in [(8, 8), (8, 4), (8, 12)]:
        got = sorted(
            tuple(r)
            for r in curation.chunk_documents(
                df, chunk_tokens=chunk, stride=stride
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.execute(f"""
                WITH tok AS (
                  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM docs
                ),
                st AS (
                  SELECT doc_id, t,
                         unnest(generate_series(
                             1,
                             GREATEST(LEAST(len(t) - ({chunk} - {stride}), len(t)), 1),
                             {stride})) AS s
                  FROM tok
                )
                SELECT doc_id,
                       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INT),
                       CAST(len(t[s:s+{chunk}-1]) AS INT),
                       array_to_string(t[s:s+{chunk}-1], ' ')
                FROM st
            """).fetchall()
        )
        assert got == want, (chunk, stride)
        assert all(r[2] <= chunk for r in got)

    # disjoint chunks reassemble the exact token stream
    disjoint = curation.chunk_documents(df, chunk_tokens=8, stride=8).collect()
    doc6 = sorted((r.chunk_idx, r.chunk_text) for r in disjoint if r.doc_id == 6)
    assert " ".join(t for _, t in doc6) == rows[5][1]
    assert [n for n in (r.n_chunk_tokens for r in disjoint if r.doc_id == 6)] \
        and sum(r.n_chunk_tokens for r in disjoint if r.doc_id == 6) == 45
    # overlap: stride 4 with chunk 8 duplicates interior tokens
    overlap = curation.chunk_documents(df, chunk_tokens=8, stride=4).collect()
    assert sum(r.n_chunk_tokens for r in overlap if r.doc_id == 6) > 45


def test_chunk_documents_property_coverage(spark):
    """Property sweep: for arbitrary doc lengths and (chunk, stride)
    combos, every token lands in ≥1 chunk, chunk widths never exceed
    the window, disjoint strides reassemble exactly, and chunk 0
    always starts at token 0."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        n=st.integers(min_value=0, max_value=60),
        chunk=st.integers(min_value=1, max_value=12),
        stride=st.integers(min_value=1, max_value=16),
    )
    def run(n, chunk, stride):
        text = " ".join(f"w{i}" for i in range(n))
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        out = sorted(
            curation.chunk_documents(
                df, chunk_tokens=chunk, stride=stride
            ).collect(),
            key=lambda r: r.chunk_idx,
        )
        assert out, (n, chunk, stride)  # never zero chunks
        toks = text.split(" ") if n else [""]
        seen = set()
        for r in out:
            ct = r.chunk_text.split(" ") if r.chunk_text else [""]
            assert len(ct) == r.n_chunk_tokens <= chunk
            start = r.chunk_idx * stride
            assert ct == toks[start : start + chunk], (n, chunk, stride)
            seen.update(range(start, start + len(ct)))
        if stride <= chunk:
            assert seen == set(range(len(toks)))  # full coverage
        if stride == chunk:
            joined = " ".join(r.chunk_text for r in out)
            assert joined == (text if n else "")

    run()


def test_sq_quantization_duckdb_parity(spark):
    """int8-class scalar quantization (r8): codes and integer dot
    products must match a DuckDB re-derivation exactly (the zkey
    argument: floor of an identical IEEE chain + pure int64 after),
    and in-domain codes span [0, 255] with hi mapping to 255."""
    import duckdb

    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lo, hi = similarity.sq_train(emb)
    assert len(lo) == len(hi) == 64
    coded = similarity.sq_encode(emb, lo, hi)
    got = {
        r.vec_id: list(r.sq_code)
        for r in coded.select("vec_id", "sq_code").collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "'/root/testdata/sf0.001/embeddings.parquet'"
    )
    want = dict(
        con.execute(f"""
        WITH {similarity.sq_bounds_sql()}
        SELECT vec_id, {similarity.sq_code_sql()} AS code
        FROM embeddings, sq_bounds
        """).fetchall()
    )
    assert set(got) == set(want)
    for vid in got:
        assert got[vid] == list(want[vid]), vid
    flat = [c for v in got.values() for c in v]
    assert min(flat) == 0 and max(flat) == 255

    # integer dot product parity on a few pairs
    ids = sorted(got)[:4]
    a = coded.filter(F.col("vec_id") == ids[0]).select(
        F.col("sq_code").alias("ca")
    )
    for other in ids[1:]:
        b = coded.filter(F.col("vec_id") == other).select(
            F.col("sq_code").alias("cb")
        )
        spark_dot = a.crossJoin(b).select(
            similarity.sq_dot(F.col("ca"), F.col("cb")).alias("d")
        ).collect()[0].d
        py_dot = sum(x * y for x, y in zip(got[ids[0]], got[other]))
        assert spark_dot == py_dot, other


def test_sq_topk_recall_vs_exact_cosine(spark):
    """Asymmetric SQ search (r8): the integer-weight SQ scan's top-10
    must recover most of the exact-cosine top-10 (8-bit quantization
    loses little), deterministically. Pinned recall on the fixed
    corpus; also checks the score is exactly the integer fold it
    claims to be."""
    import math as _math

    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lo, hi = similarity.sq_train(emb)
    coded = similarity.sq_encode(emb, lo, hi)

    qrow = emb.orderBy("vec_id").limit(1).collect()[0]
    qvec = [float(x) for x in qrow.embedding]

    exact = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == qrow.vec_id)
    )
    exact_ids = {r.neighbor_id for r in exact.collect()}

    got = similarity.sq_topk(
        coded.filter(F.col("vec_id") != qrow.vec_id), lo, hi, qvec, k=10
    ).collect()
    got_ids = [r.neighbor_id for r in got]
    recall = len(exact_ids & set(got_ids))
    assert recall >= 7, (recall, got_ids, sorted(exact_ids))

    # score is the exact integer fold of codes x integerized weights
    codes = {
        r.vec_id: list(r.sq_code)
        for r in coded.filter(F.col("vec_id").isin(got_ids)).collect()
    }
    lvl = 255.0
    w_int = [
        int(_math.floor(q * ((h - l) / lvl) * similarity.QUANT))
        for q, l, h in zip(qvec, lo, hi)
    ]
    for r in got:
        assert r.sq_score == sum(
            c * w for c, w in zip(codes[r.neighbor_id], w_int)
        ), r.neighbor_id


def test_chunk_then_dedup_subdocument_composition(spark):
    """Composition: chunk_documents -> fingerprint -> exact dedup at
    CHUNK grain finds sub-document duplication that doc-level exact
    dedup misses (two docs sharing a plagiarized window dedupe at the
    window, not the doc)."""
    import pyspark.sql.functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation, dedup,
    )

    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(8))),
        (2, shared + " " + " ".join(f"b{i}" for i in range(8))),
        (3, " ".join(f"c{i}" for i in range(16))),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # doc-level exact dedup: all three distinct
    kept = dedup.exact_duplicates(docs).select("keep_id").collect()
    assert len(kept) == 3

    # chunk grain (disjoint 8-token windows): docs 1 and 2 share their
    # first chunk exactly
    chunks = curation.chunk_documents(docs, chunk_tokens=8, stride=8)
    chunk_docs = chunks.select(
        F.concat_ws("#", "doc_id", "chunk_idx").alias("cid"),
        F.col("chunk_text"),
    )
    groups = (
        dedup.exact_duplicates(chunk_docs, text_col="chunk_text", id_col="cid")
        .select("keep_id")
        .collect()
    )
    # 6 chunks total, one duplicated pair -> 5 kept
    assert len(groups) == 5
    dup_pair = (
        chunks.filter(F.col("chunk_idx") == 0)
        .filter(F.col("doc_id").isin(1, 2))
        .select("chunk_text")
        .distinct()
        .count()
    )
    assert dup_pair == 1


def test_paragraph_dedup_exact_semantics(spark):
    """Cross-corpus paragraph dedup (r10): boilerplate shared across
    documents is dropped everywhere but its first (doc, pos)
    occurrence; in-document repeats drop too; a fully-duplicate
    document survives at doc grain with empty text; reassembly
    preserves original paragraph order."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rows = [
        (1, "intro A\n\nBOILER\n\nbody one"),
        (2, "BOILER\n\nbody two\n\nbody two"),  # cross-doc + in-doc dup
        (3, "intro A\n\nBOILER\n\nbody one"),   # fully duplicate doc
        (4, ""),                                  # degenerate: one empty para
        (5, "body one\n\nfresh tail"),           # leading dup, unique tail
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.paragraph_dedup(df).collect()}

    assert set(out) == {1, 2, 3, 4, 5}  # doc grain preserved
    assert out[1].text == "intro A\n\nBOILER\n\nbody one"
    assert (out[1].n_paras, out[1].n_paras_dropped) == (3, 0)
    assert out[2].text == "body two"
    assert (out[2].n_paras, out[2].n_paras_dropped) == (3, 2)
    assert out[3].text == ""
    assert (out[3].n_paras, out[3].n_paras_dropped) == (3, 3)
    assert out[4].text == ""            # its single empty para is FIRST
    assert (out[4].n_paras, out[4].n_paras_dropped) == (1, 0)
    assert out[5].text == "fresh tail"
    assert (out[5].n_paras, out[5].n_paras_dropped) == (2, 1)

    # conservation: paragraphs kept + dropped == paragraphs in
    total = sum(r.n_paras for r in out.values())
    assert total == sum(len(t.split("\n\n")) for _, t in rows)

    # regex-metachar separator is treated literally (the \Q\E quote)
    df2 = spark.createDataFrame([(1, "a.b.a"), (2, "b.c")], ["doc_id", "text"])
    out2 = {r.doc_id: r for r in dedup.paragraph_dedup(df2, sep=".").collect()}
    assert out2[1].text == "a.b"       # second 'a' is an in-doc dup
    assert out2[2].text == "c"         # 'b' already seen in doc 1

    # ADVICE r10: a separator CONTAINING the two-char sequence "\E" must
    # not terminate the \Q..\E quote early (Pattern.quote-style escape).
    # "x\Ey" as a bare "\Qx\Ey\E" would run "y\E" as live regex.
    sep = "x\\Ey"
    df3 = spark.createDataFrame(
        [(1, f"one{sep}two{sep}one"), (2, f"two{sep}three")],
        ["doc_id", "text"],
    )
    out3 = {
        r.doc_id: r for r in dedup.paragraph_dedup(df3, sep=sep).collect()
    }
    assert out3[1].text == f"one{sep}two"
    assert (out3[1].n_paras, out3[1].n_paras_dropped) == (3, 1)
    assert out3[2].text == "three"


def test_paragraph_dedup_matches_naive_reference(spark):
    """paragraph_dedup ≡ the obvious sequential algorithm (global seen-
    set walked in (doc_id, pos) order) on a seeded pseudo-random corpus
    with heavy paragraph reuse, including empty paragraphs."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    rng = random.Random(42)
    alphabet = [f"para {i} text" for i in range(12)] + [""]
    rows = [
        (d, "\n\n".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 8))))
        for d in range(40)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.text, r.n_paras, r.n_paras_dropped)
           for r in dedup.paragraph_dedup(df).collect()}

    seen: set[str] = set()
    want = {}
    for d, text in rows:           # rows are already in doc_id order
        paras = text.split("\n\n")
        kept = []
        for p in paras:
            if p in seen:
                continue
            seen.add(p)
            kept.append(p)
        want[d] = ("\n\n".join(kept), len(paras), len(paras) - len(kept))
    assert got == want


def test_repeat_factor_expand_counts_and_duckdb_parity(spark):
    """Epoch upsampling (r10): each row repeats factor times with
    epoch_idx 0..factor-1; factor <= 0 or NULL drops the row; the
    expansion matches DuckDB's range()-unnest re-derivation exactly."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(1, 3), (2, 1), (3, 0), (4, -2), (5, None), (6, 5)]
    df = spark.createDataFrame(rows, "doc_id int, repeat_factor int")
    got = sorted(
        (r.doc_id, r.epoch_idx)
        for r in curation.repeat_factor_expand(df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, {f if f is not None else 'NULL'})" for d, f in rows)
        + ") v(doc_id, repeat_factor)"
    )
    want = sorted(
        (d, e)
        for d, e in con.execute(
            "SELECT doc_id, unnest(range(0, repeat_factor)) FROM t"
        ).fetchall()
    )
    assert got == want
    assert len(got) == 3 + 1 + 5   # sum of positive factors
    # deterministic: a second run is identical (no randomness anywhere)
    again = sorted(
        (r.doc_id, r.epoch_idx)
        for r in curation.repeat_factor_expand(df).collect()
    )
    assert again == got


def test_token_budget_sample_prefix_rule_and_duckdb_parity(spark):
    """Per-domain token-budget fill (r10): quality-ranked inclusive
    prefix sums, no back-filling past the first overflow; matches a
    DuckDB window re-derivation column-for-column."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [
        # (doc_id, source, n_tokens, quality)
        (1, "a", 40, 9),
        (2, "a", 50, 8),
        (3, "a", 20, 7),   # cum 110 > 100 → first overflow, dropped
        (4, "a", 5, 7),    # would fit after 1+2 (95) — prefix rule says NO;
                           # quality tie with 3 → id breaks it (3 ranks first)
        (5, "b", 200, 5),  # single doc over budget alone → dropped
        (6, "b", 30, 4),
        (7, "c", 100, 1),  # exactly == budget → kept
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, n_tokens int, q int")
    got = sorted(
        (r.doc_id, r.budget_rank, r.cum_tokens, r.budget_kept)
        for r in curation.token_budget_sample(
            df, budget_tokens=100, quality_col="q"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{s}', {n}, {q})" for d, s, n, q in rows)
        + ") v(doc_id, source, n_tokens, q)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute("""
            SELECT doc_id,
                   CAST(row_number() OVER w AS INT) AS budget_rank,
                   SUM(CAST(n_tokens AS BIGINT)) OVER
                       (w ROWS UNBOUNDED PRECEDING) AS cum_tokens,
                   SUM(CAST(n_tokens AS BIGINT)) OVER
                       (w ROWS UNBOUNDED PRECEDING) <= 100 AS budget_kept
            FROM t WINDOW w AS (PARTITION BY source
                                ORDER BY q DESC, doc_id ASC)
        """).fetchall()
    )
    assert got == want
    by_id = {g[0]: g for g in got}
    assert by_id[1][3] and by_id[2][3]          # 40 + 50 = 90 kept
    assert not by_id[3][3] and not by_id[4][3]  # prefix rule: no back-fill
    assert not by_id[5][3] and not by_id[6][3]  # 200 alone overflows; 6 behind it
    assert by_id[7][3]                          # cum == budget is kept
    assert by_id[3][1] < by_id[4][1]            # tie broken by id


def test_training_corpus_build_composition_end_to_end(spark):
    """The full r10 training-corpus build, composed from the shipped
    operators in pipeline order over a multi-paragraph corpus with
    planted boilerplate, exact dups, near-dups, and junk:

        paragraph_dedup → curate (quality → exact → near-dup → split)
        → token_budget_sample → pack_sequences → repeat_factor_expand

    Pins the INTERFACES compose (column contracts survive each stage)
    and the end-state invariants: boilerplate gone, dups collapsed,
    junk filtered, budgets respected, every kept doc packed, epoch
    expansion exact."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
        dedup,
    )

    boiler = "subscribe to our newsletter for updates and offers today"
    body = [
        f"document body {i} with several informative words about topic {i % 3} and details"
        for i in range(12)
    ]
    rows = (
        # 12 docs from 2 domains, each with boilerplate + unique body
        [(i, f"d{i % 2}", boiler + "\n\n" + body[i]) for i in range(12)]
        # exact duplicate of doc 0 (post-paragraph-dedup text differs,
        # so plant it as a duplicate of the deduped form: body only)
        + [(20, "d0", body[0])]
        # junk: too short to survive the quality gate
        + [(21, "d1", "tiny")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # 1) paragraph dedup: boilerplate survives only in doc 0
    paras = dedup.paragraph_dedup(df)
    cleaned = df.select("doc_id", "source").join(paras, "doc_id")
    kept_text = {r.doc_id: r.text for r in cleaned.collect()}
    assert kept_text[0].startswith(boiler)
    assert all(boiler not in kept_text[i] for i in range(1, 12))
    # doc 20 is now an EXACT duplicate of doc 0's body? no — doc 0 kept
    # its boilerplate; doc 20 duplicates doc 1..11's SHAPE: its single
    # para 'body[0]' was already seen inside doc 0 → doc 20 empties out
    assert kept_text[20] == ""

    # 2) curate: quality gate drops the emptied doc 20 and junk doc 21;
    # remaining docs are all distinct
    curated = curation.curate(cleaned, min_chars=20, min_tokens=5)
    kept_ids = {r.doc_id for r in curated.collect()}
    assert kept_ids == set(range(12))

    # 3) token budget per domain over the curated set
    with_tok = (
        cleaned.join(curated.select("doc_id", "split"), "doc_id")
        .withColumn("n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+")))
    )
    budgeted = curation.token_budget_sample(
        with_tok, budget_tokens=40, quality_col="n_tokens"
    )
    kept_budget = budgeted.filter("budget_kept")
    for r in kept_budget.groupBy("source").agg(
        F.max("cum_tokens").alias("m")
    ).collect():
        assert r.m <= 40

    # 4) pack the surviving docs into 16-token packs
    packed = curation.pack_sequences(
        kept_budget.select("doc_id", "n_tokens"), budget_tokens=16
    )
    assert packed.count() == kept_budget.count()      # every doc packed
    assert packed.filter("pack_offset < 0").count() == 0

    # 5) epoch expansion: domain d0 twice, d1 once
    mix = kept_budget.withColumn(
        "repeat_factor", F.when(F.col("source") == "d0", 2).otherwise(1)
    )
    expanded = curation.repeat_factor_expand(mix)
    n_d0 = kept_budget.filter("source = 'd0'").count()
    n_d1 = kept_budget.filter("source = 'd1'").count()
    assert expanded.count() == 2 * n_d0 + n_d1
    assert expanded.filter("epoch_idx = 1").count() == n_d0


def test_log2_micro_three_way_agreement(spark):
    """Fixed-point log2 (r10): the Spark generated SQL, the DuckDB
    generated SQL, and the Python twin agree on every probe value;
    exact at powers of two; monotone non-decreasing."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_micro_int,
        log2_micro_sql,
    )

    vals = (
        list(range(1, 600))
        + [2**k for k in range(63)]
        + [2**k - 1 for k in range(2, 63)]
        + [2**k + 1 for k in range(2, 62)]
        + [10**j for j in range(1, 19)]
    )
    want = [log2_micro_int(v) for v in vals]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {log2_micro_sql('c', 'duckdb')} FROM (SELECT "
            "unnest(?::BIGINT[]) AS c)",
            [vals],
        ).fetchall()
    ]
    assert got_duck == want
    sdf = spark.createDataFrame([(v,) for v in vals], "c long")
    got_spark = [
        r[0]
        for r in sdf.select(
            __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                log2_micro_sql("c", "spark")
            ).alias("l")
        ).collect()
    ]
    assert got_spark == want
    # exact at powers of two, monotone overall
    for k in range(63):
        assert log2_micro_int(2**k) == k * 1_000_000
    ordered = sorted(set(vals))
    lm = [log2_micro_int(v) for v in ordered]
    assert all(a <= b for a, b in zip(lm, lm[1:]))


def test_log2_micro_hypothesis_portability():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_micro_int,
        log2_micro_sql,
    )

    con = duckdb.connect()
    sql = f"SELECT {log2_micro_sql('c', 'duckdb')} FROM (SELECT ?::BIGINT AS c)"

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=2**62))
    def check(c):
        assert con.execute(sql, [c]).fetchone()[0] == log2_micro_int(c)

    check()


def test_dsir_logweights_duckdb_parity_and_semantics(spark):
    """DSIR importance weights (r10): the full pipeline — portable
    hashed ngram buckets, add-one smoothed counts, fixed-point log
    deltas — matches a DuckDB re-derivation integer-for-integer, and
    target-like raw docs outscore off-target ones."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_micro_sql,
    )

    raw_rows = [
        (1, "spark shuffle join broadcast plan"),
        (2, "spark window rank partition plan"),
        (3, "cheap viagra casino bonus click now"),
        (4, "click here casino bonus win big"),
        (5, "the spark plan shuffles a join"),
        (6, "alpha beta gamma delta epsilon"),
    ]
    tgt_rows = [
        (101, "spark join plan shuffle broadcast"),
        (102, "partition plan spark window"),
    ]
    B = 64
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    out = curation.dsir_logweights(raw, tgt, n_buckets=B)
    got = {
        r.doc_id: (r.n_features, r.dsir_logweight_micro) for r in out.collect()
    }

    con = duckdb.connect()
    for name, rows in (("raw_docs", raw_rows), ("tgt_docs", tgt_rows)):
        con.execute(
            f"CREATE TABLE {name} AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in rows)
            + ") v(doc_id, text)"
        )
    feat = r"""
      SELECT doc_id,
             CAST('0x' || substr(md5(g), 1, 12) AS BIGINT) % {B} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (
        SELECT doc_id, unnest(t) AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM {tbl})
        UNION ALL
        SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM {tbl}),
             LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) gg
        WHERE len(t) >= 2
      ) GROUP BY 1, 2
    """
    want = {
        d: (nf, w)
        for d, nf, w in con.execute(f"""
        WITH fr AS ({feat.format(B=B, tbl='raw_docs')}),
        ft AS ({feat.format(B=B, tbl='tgt_docs')}),
        cr AS (SELECT bucket, SUM(cnt) AS c_r FROM fr GROUP BY 1),
        ct AS (SELECT bucket, SUM(cnt) AS c_t FROM ft GROUP BY 1),
        nn AS (SELECT (SELECT SUM(cnt) FROM fr) + {B} AS _r1,
                      (SELECT SUM(cnt) FROM ft) + {B} AS _t1),
        konst AS (SELECT {log2_micro_sql('_r1', 'duckdb')}
                       - {log2_micro_sql('_t1', 'duckdb')} AS c FROM nn),
        delta AS (
          SELECT bucket, {log2_micro_sql('_t1', 'duckdb')}
                       - {log2_micro_sql('_r1', 'duckdb')} AS d
          FROM (SELECT bucket,
                       COALESCE(c_t, 0) + 1 AS _t1,
                       COALESCE(c_r, 0) + 1 AS _r1
                FROM cr FULL OUTER JOIN ct USING (bucket))
        )
        SELECT fr.doc_id, CAST(SUM(cnt) AS BIGINT),
               CAST(SUM(cnt * d) + SUM(cnt) * (SELECT c FROM konst)
                    AS BIGINT)
        FROM fr JOIN delta USING (bucket) GROUP BY 1
        """).fetchall()
    }
    assert got == want
    # semantics: spark-plan docs (1, 2, 5) all outscore spam (3, 4)
    spam_max = max(got[3][1], got[4][1])
    assert min(got[1][1], got[2][1], got[5][1]) > spam_max
    # partitioning invariance
    again = {
        r.doc_id: (r.n_features, r.dsir_logweight_micro)
        for r in curation.dsir_logweights(
            raw.repartition(5), tgt.repartition(3), n_buckets=B
        ).collect()
    }
    assert again == got


def test_semdedup_cluster_scoped_semantics_and_identity(spark):
    """SemDeDup (r10): planted near-dup groups collapse to their
    lowest id, singletons survive, the result equals the same policy
    applied to exact all-pairs RESTRICTED to same-cell pairs, and the
    pair join is an equi-join (no BNLJ/cartesian)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    # ids 1-4 are FAR-apart singletons (they become the data-sampled
    # seeds — semdedup takes the n_cells lowest ids as the coarse
    # quantizer); each planted group sits near one seed (same cell
    # guaranteed) but below-threshold vs the seed itself (0.3 offset
    # -> cos ~0.958 < 0.99), while group members are ~identical
    # (0.001 nudges -> cos > 0.999).
    def seed(base):
        v = [0.0] * 8
        v[base] = 1.0
        return v

    def member(base, nudge):
        v = seed(base)
        v[base + 1] = 0.3 + 0.001 * nudge
        return v

    rows = (
        [(i, seed(2 * (i - 1))) for i in range(1, 5)]      # seeds 1-4
        + [(i, member(0, i)) for i in range(10, 13)]       # group A
        + [(i, member(2, i)) for i in range(20, 24)]       # group B
        + [(i, member(4, i)) for i in range(30, 32)]       # group C
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semdedup(df, n_cells=4, threshold=0.99)
    kept = {r.vec_id for r in out.collect() if r.kept}
    assert {1, 2, 3, 4, 10, 20, 30} <= kept       # seeds + group minima
    assert kept.isdisjoint({11, 12, 21, 22, 23, 31})
    assert out.count() == len(rows)  # every input row appears

    # compositional identity: kept == lowest-id star-collapse over the
    # exact pair set restricted to same-cell pairs
    from pyspark.sql import functions as F

    seeds_rows = (
        df.orderBy("vec_id").limit(4).collect()
    )
    seeds = [(int(r.vec_id), [float(x) for x in r.embedding])
             for r in seeds_rows]
    cells = {
        r.vec_id: r._cell
        for r in sim.ivf_assign(df, seeds).select("vec_id", "_cell").collect()
    }
    exact = sim.embedding_near_dups_exact(df, threshold=0.99).collect()
    dropped_ref = {
        p.id_b for p in exact if cells[p.id_a] == cells[p.id_b]
    }
    assert kept == {i for i, _ in rows} - dropped_ref

    # plan: cell equi-join, never BNLJ/cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semdedup_real_corpus_identity(spark, sf_dir):
    """On the real embeddings table (plus three planted exact
    duplicates, so the drop path is guaranteed non-vacuous) the
    same-cell star-collapse identity holds at tau=0.5."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    max_id = base.agg(F.max("vec_id")).collect()[0][0]
    planted = base.orderBy("vec_id").limit(3).select(
        (F.col("vec_id") + F.lit(int(max_id) + 1)).alias("vec_id"),
        "embedding",
    )
    emb = base.unionAll(planted)
    out = {r.vec_id: r.kept for r in sim.semdedup(
        emb, n_cells=8, threshold=0.5).collect()}
    seeds_rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    seeds = [(int(r.vec_id), [float(x) for x in r.embedding])
             for r in seeds_rows]
    cells = {
        r.vec_id: r._cell
        for r in sim.ivf_assign(emb, seeds).select("vec_id", "_cell").collect()
    }
    exact = sim.embedding_near_dups_exact(emb, threshold=0.5).collect()
    same_cell_dropped = {
        p.id_b for p in exact if cells[p.id_a] == cells[p.id_b]
    }
    assert len(out) == len(cells)
    for vid, kept in out.items():
        assert kept == (vid not in same_cell_dropped)
    # each planted duplicate shares its original's cell -> dropped
    assert len(same_cell_dropped) >= 3


def test_rrf_fuse_hand_checked_and_hybrid(spark):
    """RRF fusion (r10): hand-computable integer scores, the RRF
    convention for docs missing from a list, id tie-break — and an
    end-to-end hybrid fuse of a real bm25_topk lexical list with a
    same-shape second list."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
        text as text_ops,
    )

    lex = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2), (1, 102, 3)],
        "query_id long, doc_id long, rank long",
    )
    sem = spark.createDataFrame(
        [(1, 101, 1), (1, 103, 2), (1, 100, 3)],
        "query_id long, doc_id long, rank long",
    )
    got = {
        r.doc_id: (r.n_lists, r.rrf_micro, r.fused_rank)
        for r in sim.rrf_fuse([lex, sem]).collect()
    }
    c = lambda r: 1_000_000 // (60 + r)
    want = {
        100: (2, c(1) + c(3)),
        101: (2, c(2) + c(1)),
        102: (1, c(3)),
        103: (1, c(2)),
    }
    assert {d: v[:2] for d, v in got.items()} == want
    # 101 (ranks 2+1) beats 100 (ranks 1+3); singles trail; 103 (rank
    # 2) beats 102 (rank 3)
    order = sorted(got, key=lambda d: got[d][2])
    assert order == [101, 100, 103, 102]

    # hybrid: fuse two real bm25 lists (different query phrasings act
    # as two retrievers); fused ranks are deterministic and complete
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    l1 = text_ops.bm25_topk(docs, [(1, "scan filter pushdown")], k=5)
    l2 = text_ops.bm25_topk(docs, [(1, "filter scan predicate")], k=5)
    fused = sim.rrf_fuse([l1, l2]).orderBy("fused_rank").collect()
    assert 5 <= len(fused) <= 10
    assert [r.fused_rank for r in fused] == list(range(1, len(fused) + 1))
    again = sim.rrf_fuse([l2, l1]).orderBy("fused_rank").collect()
    assert [(r.doc_id, r.rrf_micro) for r in again] == [
        (r.doc_id, r.rrf_micro) for r in fused
    ]


def test_model_informed_curation_composition_end_to_end(spark):
    """The r10 MODEL-INFORMED selection loop, composed from shipped
    ops only: score the raw corpus with corpus statistics (LM
    cross-entropy + entropy), weight every doc toward a target
    distribution (DSIR), spend a token budget on the best-weighted
    docs per source, pack the survivors — all deterministic, so the
    whole pipeline re-runs bit-identically on any partitioning."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
        text as text_ops,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    ).select("doc_id", "source", "text")
    # target = the docs most fluent under the corpus LM (a stand-in
    # for "my high-quality seed set"), picked deterministically
    xent = text_ops.bigram_cross_entropy(docs)
    target_ids = [
        r.doc_id
        for r in xent.filter("n_bigrams > 0")
        .orderBy("xent_micro_bits", "doc_id").limit(50).collect()
    ]
    target = docs.filter(F.col("doc_id").isin(target_ids))

    weighted = (
        docs.join(curation.dsir_logweights(docs, target, n_buckets=128),
                  "doc_id")
        .join(text_ops.token_entropy(docs), "doc_id")
        .withColumn(
            "n_tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
        )
    )
    picked = curation.token_budget_sample(
        weighted, budget_tokens=600, quality_col="dsir_logweight_micro"
    )
    kept = picked.filter("budget_kept")
    # budget respected per source, and the kept set is the weight-
    # ranked prefix (no kept doc outranked by a dropped one in-group)
    per_src = kept.groupBy("source").agg(
        F.sum("n_tokens").alias("tot"), F.max("budget_rank").alias("mr"),
        F.count(F.lit(1)).alias("n")
    ).collect()
    assert per_src and all(r.tot <= 600 for r in per_src)
    assert all(r.mr == r.n for r in per_src)  # contiguous rank prefix
    # the target stand-ins are target-LIKE by construction, so kept
    # docs must outweigh the per-source median of dropped ones
    med = picked.filter(~F.col("budget_kept")).agg(
        F.expr("percentile_approx(dsir_logweight_micro, 0.5)")
    ).collect()[0][0]
    kmin = kept.agg(F.min("dsir_logweight_micro")).collect()[0][0]
    # kept mins can dip below the global dropped median only via small
    # sources; the MEAN kept weight must clearly beat the dropped median
    kmean = kept.agg(F.avg("dsir_logweight_micro")).collect()[0][0]
    assert kmean > med
    packed = curation.pack_sequences(
        kept.select("doc_id", "n_tokens"), budget_tokens=256
    )
    assert packed.count() == kept.count()  # every kept doc packed
    # pack contract: first-fit-with-overflow — every doc STARTS inside
    # its pack (offset < budget) and a pack exceeds the budget by at
    # most its largest (tail) doc
    assert packed.filter(F.col("pack_offset") >= 256).count() == 0
    max_doc = kept.agg(F.max("n_tokens")).collect()[0][0]
    assert packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("s")
    ).filter(F.col("s") > 256 + max_doc).count() == 0
    # determinism across partitionings: identical kept set
    again_ids = {
        r.doc_id
        for r in curation.token_budget_sample(
            weighted.repartition(11), budget_tokens=600,
            quality_col="dsir_logweight_micro",
        ).filter("budget_kept").collect()
    }
    assert again_ids == {r.doc_id for r in kept.select("doc_id").collect()}
    assert kmin is not None


def test_hard_negatives_semantics_and_identity(spark, sf_dir):
    """Hard-negative mining (r10): same-label neighbors are never
    mined however close; the nearest other-label vector in the cell
    ranks first; the result equals the exact same-cell computation on
    the real corpus; plan is equi-join only."""
    from pyspark.sql import functions as F

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        similarity as sim,
    )

    # planted: ids 1-2 far seeds; anchors 10 (label 0) with a nearly
    # identical SAME-label twin 11 and a slightly-farther OTHER-label
    # vector 12, all in seed 1's cell.
    def v(base, second):
        x = [0.0] * 8
        x[base] = 1.0
        x[base + 1] = second
        return x

    rows = [
        (1, v(0, 0.0), 9), (2, v(4, 0.0), 9),
        (10, v(0, 0.30), 0), (11, v(0, 0.301), 0), (12, v(0, 0.34), 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = sim.hard_negatives(df, k=2, n_cells=2)
    mined = {
        r.vec_id: [(r.neg_rank, r.neighbor_id, r.neighbor_label)]
        for r in out.collect() if r.vec_id == 10
    }
    got10 = sorted(
        (r.neg_rank, r.neighbor_id) for r in out.collect() if r.vec_id == 10
    )
    # anchor 10's top negative is 12 (other label), NEVER 11 (same
    # label, closer); seed 1 (label 9) trails 12
    assert got10[0] == (1, 12)
    assert all(nid != 11 for _, nid in got10)
    assert mined

    # real-corpus identity vs exact same-cell other-label top-k
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out_real = sim.hard_negatives(emb, k=3, n_cells=8)
    got = {
        (r.vec_id, r.neg_rank): (r.neighbor_id, r.cosine_sim)
        for r in out_real.collect()
    }
    seeds_rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    seeds = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in seeds_rows]
    cells = sim.ivf_assign(emb, seeds).select("vec_id", "label", "embedding", "_cell")
    a = cells.select(
        F.col("vec_id").alias("aid"), F.col("label").alias("la"),
        F.col("embedding").alias("va"), "_cell",
    )
    b = cells.select(
        F.col("vec_id").alias("bid"), F.col("label").alias("lb"),
        F.col("embedding").alias("vb"), "_cell",
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        cosine,
    )

    ref_pairs = (
        a.join(b, "_cell")
        .filter(F.col("la") != F.col("lb"))
        .select(
            "aid", "bid",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("c"),
        )
        .collect()
    )
    by_anchor = {}
    for p in ref_pairs:
        by_anchor.setdefault(p.aid, []).append((-p.c, p.bid))
    want = {}
    for aid, cands in by_anchor.items():
        for rank, (negc, bid) in enumerate(sorted(cands)[:3], start=1):
            want[(aid, rank)] = (bid, -negc)
    assert got == want
    plan = out_real._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_spans_planted_passages(spark):
    """r12: ExactSubstr-class duplicate spans — hand-verifiable corpus:
    a 6-token passage shared by two docs (cross-doc), an exact full-doc
    copy (whole-doc span), within-doc repetition (the paper counts
    same-doc recurrences), and a unique doc (no spans). Partitioning-
    invariant at 1 and 7 partitions."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    shared = "alpha beta gamma delta epsilon zeta"          # 6 tokens
    rows = [
        (1, f"one two {shared} three four"),                 # span 2..7
        (2, f"{shared} nine ten eleven twelve"),             # span 0..5
        (3, "unique words only here nothing repeats ever"),
        (4, "unique words only here nothing repeats ever"),  # copy of 3
        (5, "rep one rep one rep one rep one rep one"),      # self-rep
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for parts in (1, 7):
        spans = {
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in dedup.duplicate_spans(
                df.repartition(parts), min_len=5
            ).collect()
        }
        assert (1, 2, 7, 6) in spans
        assert (2, 0, 5, 6) in spans
        # docs 3 and 4 are full 7-token duplicates
        assert (3, 0, 6, 7) in spans and (4, 0, 6, 7) in spans
        # doc 5: every 5-token window recurs within the doc → full span
        assert (5, 0, 9, 10) in spans
        assert all(s[0] != 3 or s == (3, 0, 6, 7) for s in spans)
        assert len(spans) == 5

    cleaned = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_dropped)
        for r in dedup.remove_duplicate_spans(df, min_len=5).collect()
    }
    assert cleaned[1] == ("one two three four", 10, 6)
    assert cleaned[2] == ("nine ten eleven twelve", 10, 6)
    assert cleaned[3] == ("", 7, 7)
    assert cleaned[4] == ("", 7, 7)
    assert cleaned[5] == ("", 10, 10)
    # every doc survives removal (doc grain preserved)
    assert set(cleaned) == {1, 2, 3, 4, 5}


def test_duplicate_spans_duckdb_parity(spark, sf_smoke):
    """The span relation is pure relational algebra — DuckDB replicates
    it exactly (same portable hash, same gaps-and-islands) on the REAL
    corpus; k=5 so the 31-word vocabulary actually produces spans."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in dedup.duplicate_spans(docs, min_len=5).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(r"""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
            FROM documents
        ), w AS (
            SELECT doc_id, i - 1 AS pos,
                   CAST(concat('0x', substr(md5(
                       array_to_string(tk[i:i+4], ' ')), 1, 12)) AS BIGINT) AS h
            FROM t, LATERAL (
                SELECT unnest(generate_series(1, len(tk) - 4)) AS i) g
            WHERE len(tk) >= 5
        ), dup AS (
            SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2
        ), cov AS (
            SELECT doc_id, pos FROM w WHERE h IN (SELECT h FROM dup)
        ), isl AS (
            SELECT doc_id, pos,
                   pos - row_number() OVER (
                       PARTITION BY doc_id ORDER BY pos) AS grp
            FROM cov
        )
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
               CAST(MAX(pos) - MIN(pos) + 5 AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_id, grp
        """).fetchall()
    )
    assert got == want
    assert got, "expected real duplicated 5-grams on this corpus"


def test_duplicate_spans_matches_naive_reference_randomized(spark):
    """r12: duplicate_spans == a brute-force Python reference on seeded
    random corpora over a tiny alphabet (dense natural duplicates), and
    remove_duplicate_spans reconstructs exactly the tokens outside the
    reference spans, in order. 5 seeds × k=3."""
    import random

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    K = 3
    alphabet = ["a", "b", "c", "d"]
    for seed in range(5):
        rng = random.Random(seed)
        docs = {
            d: [rng.choice(alphabet) for _ in range(rng.randint(1, 14))]
            for d in range(rng.randint(3, 8))
        }
        df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()],
            "doc_id long, text string",
        )
        # naive: window multiset over the whole corpus
        from collections import Counter

        wins = Counter()
        for t in docs.values():
            for i in range(len(t) - K + 1):
                wins[tuple(t[i:i + K])] += 1
        want_spans = set()
        drop_pos = {}
        for d, t in docs.items():
            covered = [
                i for i in range(len(t) - K + 1)
                if wins[tuple(t[i:i + K])] >= 2
            ]
            drop = set()
            runs = []
            for i in covered:
                if runs and i == runs[-1][1] + 1:
                    runs[-1][1] = i
                else:
                    runs.append([i, i])
            for s, e in runs:
                want_spans.add((d, s, e + K - 1, e + K - s))
                drop.update(range(s, e + K))
            drop_pos[d] = drop
        got_spans = {
            tuple(r)
            for r in dedup.duplicate_spans(df, min_len=K).collect()
        }
        assert got_spans == want_spans, f"seed={seed}"
        got_clean = {
            r.doc_id: (r.text, r.n_tokens, r.n_tokens_dropped)
            for r in dedup.remove_duplicate_spans(df, min_len=K).collect()
        }
        want_clean = {
            d: (
                " ".join(
                    tok for i, tok in enumerate(t) if i not in drop_pos[d]
                ),
                len(t),
                len(drop_pos[d]),
            )
            for d, t in docs.items()
        }
        assert got_clean == want_clean, f"seed={seed}"


def test_remove_spans_empty_and_whitespace_docs(spark):
    """r13 (ADVICE r12): an empty or whitespace-only document reports
    n_tokens=0 (Spark's split('') yields [''] — one phantom token that
    previously counted as 1) and n_tokens_dropped=0; normal docs are
    unchanged. The single-space whitespace normalization of untouched
    docs is the DOCUMENTED contract (see remove_spans docstring)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   \t \n "), (3, "alpha  beta\tgamma")],
        "doc_id long, text string",
    )
    no_spans = spark.createDataFrame(
        [], "doc_id long, span_start long, span_end long",
    )
    got = {
        r.doc_id: (r.text, r.n_tokens, r.n_tokens_dropped)
        for r in dedup.remove_spans(df, no_spans).collect()
    }
    assert got[1] == ("", 0, 0)
    assert got[2] == ("", 0, 0)
    # documented normalization: runs of whitespace become single spaces
    assert got[3] == ("alpha beta gamma", 3, 0)


def test_duplicate_spans_provenance_counts(spark):
    """r13: with_provenance=True adds n_sharing_docs — distinct docs
    (incl. self) carrying any of the span's covered-window hashes.
    Planted: a passage shared by docs 1 and 2 (n_sharing_docs=2 on
    both hosts), a within-doc repetition in doc 3 (n_sharing_docs=1),
    and the default output is unchanged when the flag is off."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    passage = "p1 p2 p3 p4 p5"
    df = spark.createDataFrame(
        [
            (1, f"a1 a2 {passage} a3 a4"),
            (2, f"{passage} b1 b2 b3 b4"),
            (3, "rep one two can rep one two can rep one two can"),
            (4, "novel words that appear nowhere else at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end): (r.span_tokens, r.n_sharing_docs)
        for r in dedup.duplicate_spans(
            df, min_len=4, with_provenance=True
        ).collect()
    }
    # docs 1/2: the shared 5-token passage -> 2 sharing docs
    assert got[(1, 2, 6)] == (5, 2)
    assert got[(2, 0, 4)] == (5, 2)
    # doc 3: "rep one two can" repeats 3x within ONE doc -> full-doc
    # span, 1 sharing doc
    (k3,) = [k for k in got if k[0] == 3]
    assert got[k3][1] == 1
    assert 4 not in {k[0] for k in got}
    # flag off: identical rows minus the provenance column
    plain = sorted(
        tuple(r)
        for r in dedup.duplicate_spans(df, min_len=4).collect()
    )
    assert plain == sorted(
        (d, s, e, t) for (d, s, e), (t, _) in got.items()
    )


def test_weighted_sample_aes_parity_and_semantics(spark):
    """curation.weighted_sample (Efraimidis–Spirakis A-ES, r13):
    DuckDB reproduces the exact selection from the same published
    constants (global AND per-group), the draw is partitioning-
    invariant, prefix-monotone in n, excludes non-positive/NULL
    weights, and inclusion tracks weight (a 1000:1 weight ratio wins
    n=1 draws almost always across independent salts)."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_interp_micro_sql,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(i, "g%d" % (i % 3), (i * 7919) % 97 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")

    got = sorted(
        (r.doc_id, r.ws_rank)
        for r in curation.weighted_sample(df, 20, "w", "doc_id").collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES %s) v(doc_id, grp, w)"
                % ",".join("(%d,'%s',%d)" % r for r in rows))
    lg = log2_interp_micro_sql("h1", engine="duckdb")
    oracle = f"""
    WITH h AS (
        SELECT *, CAST(concat('0x', substr(md5('␟' || CAST(doc_id AS VARCHAR)), 1, 12))
                       AS BIGINT) + 1 AS h1
        FROM t WHERE w > 0
    ), k AS (
        SELECT doc_id, grp,
               CAST({lg} - 48000000 AS DOUBLE) / CAST(w AS DOUBLE) AS key
        FROM h
    )
    SELECT doc_id, CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS r
    FROM k QUALIFY r <= 20
    """
    want = sorted(tuple(r) for r in con.execute(oracle).fetchall())
    assert got == want

    # per-group: same key formula ranked within grp
    got_g = sorted(
        (r.doc_id, r.grp, r.ws_rank)
        for r in curation.weighted_sample(df, 5, "w", "doc_id", by=["grp"]).collect()
    )
    oracle_g = f"""
    WITH h AS (
        SELECT *, CAST(concat('0x', substr(md5('␟' || CAST(doc_id AS VARCHAR)), 1, 12))
                       AS BIGINT) + 1 AS h1
        FROM t WHERE w > 0
    ), k AS (
        SELECT doc_id, grp,
               CAST({lg} - 48000000 AS DOUBLE) / CAST(w AS DOUBLE) AS key
        FROM h
    )
    SELECT doc_id, grp,
           CAST(row_number() OVER (PARTITION BY grp ORDER BY key DESC, doc_id) AS BIGINT) AS r
    FROM k QUALIFY r <= 5
    """
    want_g = sorted(tuple(r) for r in con.execute(oracle_g).fetchall())
    assert got_g == want_g
    assert len(got_g) == 15

    # partitioning invariance
    for parts in (1, 7):
        again = sorted(
            (r.doc_id, r.ws_rank)
            for r in curation.weighted_sample(
                df.repartition(parts), 20, "w", "doc_id"
            ).collect()
        )
        assert again == got

    # prefix-monotone: top-10 is exactly the first 10 of top-20
    top10 = sorted(
        (r.doc_id, r.ws_rank)
        for r in curation.weighted_sample(df, 10, "w", "doc_id").collect()
    )
    assert top10 == [x for x in got if x[1] <= 10]

    # n >= rows: everything selected once, ranks are a permutation
    small = spark.createDataFrame(rows[:7], "doc_id long, grp string, w long")
    all_rows = curation.weighted_sample(small, 100, "w", "doc_id").collect()
    assert sorted(r.ws_rank for r in all_rows) == list(range(1, 8))

    # zero/NULL weights never sampled
    bad = spark.createDataFrame(
        [(1, "a", 0), (2, "a", -5), (3, "a", None), (4, "a", 10)],
        "doc_id long, grp string, w long",
    )
    assert [r.doc_id for r in curation.weighted_sample(bad, 10, "w", "doc_id").collect()] == [4]

    # weight bias: w=1000 vs w=1, n=1, 12 independent salts — the
    # heavy row wins each draw w.p. ~999/1000 (deterministic given the
    # salt list; 10 is a very safe floor)
    pair = spark.createDataFrame([(1, "a", 1000), (2, "a", 1)],
                                 "doc_id long, grp string, w long")
    wins = sum(
        curation.weighted_sample(pair, 1, "w", "doc_id", salt=f"s{i}")
        .collect()[0].doc_id == 1
        for i in range(12)
    )
    assert wins >= 10


def test_cohort_retention_semantics(spark):
    """kpis.cohort_retention: cohort = period of the user's FIRST
    event; a cell counts DISTINCT users (multiple events in one period
    collapse); offset 0 is the cohort size at exactly 10⁶ ppm;
    retention is integer ppm (floor)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        kpis,
    )

    P = 100  # tiny period for readable literals
    rows = [
        # cohort 0: users 1, 2, 3 (first events in [0, 100))
        (1, 10), (1, 20),          # two events, ONE offset-0 credit
        (1, 150),                  # active offset 1
        (2, 50), (2, 250),         # active offset 2 (skips 1)
        (3, 99),                   # never returns
        # cohort 2: user 4
        (4, 230), (4, 460),        # offsets 0 and 2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {
        (r.cohort_period, r.period_offset): (r.n_active, r.n_cohort, r.retention_ppm)
        for r in kpis.cohort_retention(ev, period_us=P).collect()
    }
    assert got == {
        (0, 0): (3, 3, 1_000_000),
        (0, 1): (1, 3, 333_333),   # floor(1e6/3)
        (0, 2): (1, 3, 333_333),
        (2, 0): (1, 1, 1_000_000),
        (2, 2): (1, 1, 1_000_000),
    }


def test_funnel_stages_fixed_anchor_semantics(spark):
    """kpis.funnel_stages: order constraints (a purchase BEFORE the
    click doesn't count), the within-window is anchored at t1 (a later
    view that would complete the chain is deliberately NOT re-anchored
    — fixed-anchor semantics), equal timestamps chain (>= compares),
    and users without the first stage emit nothing."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        kpis,
    )

    rows = [
        # user 1: purchase@5 precedes click@10 → t3 comes from @20
        (1, 0, "view"), (1, 10, "click"), (1, 5, "purchase"), (1, 20, "purchase"),
        # user 2: click only → no anchor, absent from output
        (2, 0, "click"),
        # user 3: anchor view@0; click@200 violates within=150 even
        # though re-anchoring at view@100 would admit it
        (3, 0, "view"), (3, 100, "view"), (3, 200, "click"),
        # user 4: all three at the same instant → reached 3
        (4, 5, "view"), (4, 5, "click"), (4, 5, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long, event_type string")
    got = {
        r.user_id: (r.t1, r.t2, r.t3, r.reached)
        for r in kpis.funnel_stages(
            ev, ["view", "click", "purchase"], within_us=150
        ).collect()
    }
    assert got == {
        1: (0, 10, 20, 3),
        3: (0, None, None, 1),
        4: (5, 5, 5, 3),
    }

    # no window: user 3's click@200 now counts
    got_nw = {
        r.user_id: r.reached
        for r in kpis.funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    assert got_nw == {1: 3, 3: 2, 4: 3}


def test_exp2_micro_three_way_agreement(spark):
    """Fixed-point exp2 (r13, the LOG2 table's inverse): Spark SQL,
    DuckDB SQL, and the Python twin agree on every probe exponent
    (both signs); exact at integer exponents; monotone; and the
    exp2∘log2 round trip stays inside the documented ~0.7% one-sided
    envelope."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        exp2_micro_int,
        exp2_micro_sql,
        log2_micro_int,
    )

    vals = (
        list(range(0, 3_000_000, 73_561))
        + [k * 1_000_000 for k in range(-40, 43)]
        + [k * 1_000_000 + f for k in (-3, -1, 0, 5, 17, 41)
           for f in (1, 499_999, 999_999)]
    )
    vals = [v for v in vals if -40_000_000 <= v <= 42_999_999]
    want = [exp2_micro_int(v) for v in vals]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {exp2_micro_sql('c', 'duckdb')} FROM (SELECT "
            "unnest(?::BIGINT[]) AS c)",
            [vals],
        ).fetchall()
    ]
    assert got_duck == want
    sdf = spark.createDataFrame([(v,) for v in vals], "c long")
    got_spark = [
        r[0]
        for r in sdf.select(F.expr(exp2_micro_sql("c", "spark")).alias("e")).collect()
    ]
    assert got_spark == want
    for k in range(-40, 43):
        assert exp2_micro_int(k * 1_000_000) == (
            1_000_000 << k if k >= 0 else 1_000_000 >> -k
        )
    ordered = sorted(set(vals))
    em = [exp2_micro_int(v) for v in ordered]
    assert all(a <= b for a, b in zip(em, em[1:]))
    # round trip: exp2(log2(w)) ∈ [w·10⁶·(1-0.007), w·10⁶]
    for w in [1, 2, 3, 7, 100, 12345, 2**20 + 17, 2**39 + 5]:
        rt = exp2_micro_int(log2_micro_int(w))
        assert w * 1_000_000 * 993 // 1000 <= rt <= w * 1_000_000


def test_temperature_weights_semantics_and_sampling(spark):
    """curation.temperature_weights: α=0 is uniform, α=1 tracks w
    within the quantization envelope, α=1/2 preserves order while
    compressing ratios, NULL/non-positive weights stay NULL, DuckDB
    reproduces the column, and the output feeds weighted_sample (the
    flattened draw still favors heavy rows, less sharply)."""
    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        exp2_micro_sql,
        log2_micro_sql,
    )
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
    )

    rows = [(1, 16), (2, 256), (3, 65536), (4, 0), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    t0 = {r.doc_id: r.w_temp_micro
          for r in curation.temperature_weights(df, "w", (0, 1)).collect()}
    assert t0 == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000, 4: None, 5: None}

    t1 = {r.doc_id: r.w_temp_micro
          for r in curation.temperature_weights(df, "w", (1, 1)).collect()}
    # powers of two are EXACT through both tables
    assert t1 == {1: 16_000_000, 2: 256_000_000, 3: 65_536_000_000,
                  4: None, 5: None}

    th = {r.doc_id: r.w_temp_micro
          for r in curation.temperature_weights(df, "w", (1, 2)).collect()}
    assert th[1] == 4_000_000 and th[2] == 16_000_000 and th[3] == 256_000_000
    # order preserved, ratios compressed (65536:16 → 64:1)
    assert th[1] < th[2] < th[3]
    assert th[3] * t1[1] < t1[3] * th[1]

    # DuckDB parity on the same formula
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1,16),(2,256),(3,65536)) v(doc_id, w)"
    )
    lg = log2_micro_sql("w", engine="duckdb")
    duck = con.execute(
        f"SELECT doc_id, {exp2_micro_sql('x', 'duckdb')} FROM ("
        f"SELECT doc_id, CAST(({lg} * 1 - (((({lg} * 1) % 2) + 2) % 2)) / 2 AS BIGINT) AS x FROM t)"
    ).fetchall()
    assert {d: v for d, v in duck} == {1: th[1], 2: th[2], 3: th[3]}

    # composition: flattened weights still bias the A-ES draw
    flat = curation.temperature_weights(
        df.filter(F.col("w") > 0), "w", (1, 2)
    )
    wins = sum(
        curation.weighted_sample(flat, 1, "w_temp_micro", "doc_id", salt=f"z{i}")
        .collect()[0].doc_id == 3
        for i in range(8)
    )
    assert wins >= 5


def test_profile_columns_nulls_and_subset(spark):
    """validation.profile_columns: NULLs counted per column and
    excluded from distincts; a column subset profiles only those;
    mixed dtypes (string/long/double/date) all render."""
    import datetime as _dt

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        validation,
    )

    rows = [
        (1, "a", 1.5, _dt.date(2024, 1, 1)),
        (2, None, 1.5, None),
        (3, "a", None, _dt.date(2024, 1, 2)),
        (None, "b", 2.5, _dt.date(2024, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "k long, s string, x double, d date")
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in validation.profile_columns(df).collect()
    }
    assert got == {
        "k": (4, 1, 3),
        "s": (4, 1, 2),
        "x": (4, 1, 2),
        "d": (4, 1, 2),
    }
    sub = validation.profile_columns(df, ["s"]).collect()
    assert len(sub) == 1 and sub[0].col_name == "s"


def test_profile_columns_empty_table_and_alpha_guard(spark):
    """r13 review fixes: profile_columns of an EMPTY table emits one
    all-zero row per column (matching a per-column COUNT oracle, not
    zero rows); temperature_weights reduces alpha and rejects reduced
    numerators that could misfloor the exponent through the double
    division."""
    import pytest as _pytest

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        curation,
        validation,
    )

    empty = spark.createDataFrame([], "k long, s string")
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in validation.profile_columns(empty).collect()
    }
    assert got == {"k": (0, 0, 0), "s": (0, 0, 0)}

    df = spark.createDataFrame([(1, 16)], "doc_id long, w long")
    # unreduced (5e9, 1e10) reduces to (1, 2): fine
    ok = curation.temperature_weights(df, "w", (5_000_000_000, 10_000_000_000))
    assert ok.collect()[0].w_temp_micro == 4_000_000
    # an irreducible huge numerator is refused, not silently misfloored
    with _pytest.raises(ValueError, match="numerator"):
        curation.temperature_weights(df, "w", (10**9 + 7, 3))

    # r13 ADVICE: an OUT-OF-ENVELOPE exponent (alpha*log2(w) > 42)
    # raises at evaluation time instead of silently overflowing the
    # blind shiftleft — 2^43 at alpha=1 is one bit past the domain
    big = spark.createDataFrame([(1, 2**43)], "doc_id long, w long")
    with _pytest.raises(Exception, match="42-bit exp2 envelope"):
        curation.temperature_weights(big, "w", (1, 1)).collect()
    # the boundary itself (2^42 at alpha=1 -> exponent exactly 42e6)
    # is IN domain and exact
    edge = spark.createDataFrame([(1, 2**42)], "doc_id long, w long")
    got_edge = curation.temperature_weights(edge, "w", (1, 1)).collect()
    assert got_edge[0].w_temp_micro == (2**42) * 1_000_000
    # NULL / non-positive weights still pass through as NULL (never
    # routed into the raising branch)
    mixed = spark.createDataFrame(
        [(1, None), (2, 0), (3, 16)], "doc_id long, w long"
    )
    vals = {
        r.doc_id: r.w_temp_micro
        for r in curation.temperature_weights(mixed, "w", (1, 1)).collect()
    }
    assert vals == {1: None, 2: None, 3: 16_000_000}


def test_log2_interp_micro_three_way_and_aes_proportionality(spark):
    """The INTERPOLATED fixed-point log2 (r13): Spark SQL, DuckDB SQL,
    and the Python twin agree on every probe value; exact at powers of
    two; monotone; within 10 µbits of true log2. And the reason it
    exists: A-ES inclusion probabilities are proportional to weight
    again (the coarse table's shared top bin ranked by weight alone —
    a 5:1 class measured 1.4× its share; with interpolation every
    weight class's n=1 win rate sits within 25% of w/Σw over 600
    deterministic salts — the coarse table read 1.4× / 0.125× at the
    extremes, far outside)."""
    import hashlib
    import math

    import duckdb

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (
        log2_interp_micro_int,
        log2_interp_micro_sql,
    )

    vals = (
        list(range(1, 600))
        + [2**k for k in range(63)]
        + [2**k - 1 for k in range(2, 63)]
        + [2**k + 1 for k in range(2, 62)]
        + [10**j for j in range(1, 19)]
        + [(1 << 48) - 7, (1 << 48) + 12345]
    )
    want = [log2_interp_micro_int(v) for v in vals]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {log2_interp_micro_sql('c', 'duckdb')} FROM (SELECT "
            "unnest(?::BIGINT[]) AS c)",
            [vals],
        ).fetchall()
    ]
    assert got_duck == want
    sdf = spark.createDataFrame([(v,) for v in vals], "c long")
    got_spark = [
        r[0]
        for r in sdf.select(
            F.expr(log2_interp_micro_sql("c", "spark")).alias("l")
        ).collect()
    ]
    assert got_spark == want
    for k in range(63):
        assert log2_interp_micro_int(2**k) == k * 1_000_000
    ordered = sorted(set(vals))
    lm = [log2_interp_micro_int(v) for v in ordered]
    assert all(a <= b for a, b in zip(lm, lm[1:]))
    assert all(
        abs(log2_interp_micro_int(v) - math.log2(v) * 1e6) <= 10 for v in vals
    )

    # proportionality (pure-Python twin of the weighted_sample key;
    # deterministic given the salt list — not a flaky statistical test)
    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    items = [(i, (i % 5) + 1) for i in range(400)]
    W = sum(w for _, w in items)
    wins = {w: 0 for w in range(1, 6)}
    trials = 600
    for t in range(trials):
        best = max(
            items,
            key=lambda iw: (
                (log2_interp_micro_int(h48(f"p{t}␟{iw[0]}") + 1) - 48_000_000)
                / iw[1],
                -iw[0],
            ),
        )
        wins[best[1]] += 1
    for w in range(1, 6):
        theo = 80 * w / W
        assert 0.75 * theo <= wins[w] / trials <= 1.25 * theo, (w, wins)


def test_substrate_partitions_scale_adaptive_and_estimate_safe(spark, sf_dir):
    """r17: the shingle-substrate shuffle width derives from LEAF scan
    bytes (~32 MB/task) floored at defaultParallelism — never from the
    plan-root estimate (join estimates multiply cardinalities) and
    never from an unknown-size leaf (parallelized LogicalRDDs report
    the Long.MaxValue sentinel; one such leaf sent a test corpus to a
    32k-task repartition before the guard)."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.dedup import (
        _substrate_partitions,
    )

    floor = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert _substrate_partitions(docs) == floor  # ~100 KB << 32 MB/task

    local = spark.createDataFrame([(i, "x" * 50) for i in range(500)], ["doc_id", "text"])
    assert _substrate_partitions(local) == floor  # unknown-size leaf -> floor

    # a join-derived frame must price by its LEAVES, not the join output
    j = docs.alias("a").join(
        docs.selectExpr("doc_id").alias("b"), "doc_id"
    )
    assert _substrate_partitions(j) == floor

    # an InMemoryRelation leaf reports its CHILD PLAN's (join-
    # multiplied) estimate, not real bytes — must fall to the floor
    # (observed: a candidate-pair cache leaf priced a 2 MB corpus at
    # 20 GB -> 655-partition substrate caches)
    cached = docs.select("doc_id", "text").persist()
    try:
        cached.count()
        semi = docs.join(cached.select("doc_id"), "doc_id", "left_semi")
        assert _substrate_partitions(semi) == floor
    finally:
        cached.unpersist()


def test_loop_width_derivation_pinned():
    """r18 (VERDICT r17 #3): the iterative-loop shuffle width derives
    from the MEASURED bounded state cardinality — floor 16 keeps tiny
    gate-SF graphs at the r17-measured width, ~2M rows/partition in
    the scaling regime, hard cap 2^15 — no constant tied to gate-SF
    facts anywhere in the loop family."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators.dedup import (
        loop_width,
    )

    assert loop_width(0) == 16
    assert loop_width(25) == 16  # q26's gate-SF candidate-pair set
    assert loop_width(32_000_000) == 16  # exactly 16 partitions' worth
    assert loop_width(64_000_000) == 32  # scales with measured rows
    assert loop_width(65_000_000) == 33  # ceil, not floor
    assert loop_width(10**12) == 1 << 15  # capped
    assert loop_width(100, floor=4) == 4  # floor is a parameter


def test_iterative_loops_scope_and_restore_session_width(spark):
    """r18: duplicate_clusters / pagerank / kcore derive their loop
    width internally (from the measured edge cardinality) and RESTORE
    the session width afterwards — callers no longer carry a
    constant-16 override."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
        graph,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    clusters = {
        (r.node_id, r.cluster_id)
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert clusters == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    assert spark.conf.get("spark.sql.shuffle.partitions") == old

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    assert graph.pagerank(edges, n_iter=2).count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == old

    assert graph.kcore(edges, k=1, n_rounds=2).count() == 3
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
