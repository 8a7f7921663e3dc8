"""Portable HyperLogLog (operators/sketches.py): accuracy bounds,
partition invariance, and cross-engine bit-exactness (the property that
lets q35 be oracle-gated at all)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    sketches,
)


def _estimate(spark, n_distinct: int, partitions: int = 4) -> tuple[float, int]:
    df = (
        spark.range(0, n_distinct * 3)
        .select((F.col("id") % n_distinct).alias("k"), F.lit("g").alias("g"))
        .repartition(partitions)
    )
    row = sketches.portable_hll(df, ["g"], "k", p=8).collect()[0]
    return row["approx_distinct"], row["n_zero_registers"]


def test_hll_large_range_accuracy(spark):
    # p=8 → standard error 1.04/sqrt(256) ≈ 6.5%; 3σ ≈ 19.5%
    est, zeros = _estimate(spark, 10_000)
    assert abs(est / 10_000 - 1.0) < 0.2, (est, zeros)


def test_hll_small_range_linear_counting(spark):
    # 40 distinct over 256 registers → linear-counting branch, which is
    # far tighter than the raw estimator at low load factors
    est, zeros = _estimate(spark, 40)
    assert zeros > 0
    assert abs(est / 40 - 1.0) < 0.10, (est, zeros)


def test_hll_partition_invariance(spark):
    # register MAX is commutative and the harmonic sum is exact in
    # double, so the estimate must be IDENTICAL however rows are split
    a, _ = _estimate(spark, 5_000, partitions=1)
    b, _ = _estimate(spark, 5_000, partitions=13)
    assert a == b


def test_hll_duplicates_do_not_move_estimate(spark):
    df1 = spark.range(0, 1_000).select(F.col("id").alias("k"), F.lit("g").alias("g"))
    df5 = (
        spark.range(0, 5_000)
        .select((F.col("id") % 1_000).alias("k"), F.lit("g").alias("g"))
    )
    e1 = sketches.portable_hll(df1, ["g"], "k").collect()[0]["approx_distinct"]
    e5 = sketches.portable_hll(df5, ["g"], "k").collect()[0]["approx_distinct"]
    assert e1 == e5


def test_hll_oracle_sql_is_bit_exact(spark, tmp_path):
    # same rows through Spark and DuckDB → identical doubles, no
    # rounding slack (the driver gate hashes raw values)
    p = str(tmp_path / "vals.parquet")
    (
        spark.range(0, 3_000)
        .select(
            (F.col("id") % 7).cast("string").alias("grp"),
            (F.col("id") % 911).alias("v"),
        )
        .write.mode("overwrite").parquet(p)
    )
    sdf = sketches.portable_hll(
        spark.read.parquet(p), ["grp"], "v", p=8
    ).toPandas().sort_values("grp").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{p}/*.parquet'")
    odf = (
        con.execute(
            sketches.hll_oracle_sql("src", {"grp": "grp"}, "v", p=8)
        )
        .df()
        .sort_values("grp")
        .reset_index(drop=True)
    )
    assert list(sdf["approx_distinct"]) == list(odf["approx_distinct"])
    assert list(sdf["n_zero_registers"]) == list(odf["n_zero_registers"])


def test_hll_error_distribution_on_real_groups(spark):
    """Quality, not just determinism: across the ~2.4k daily groups of
    the sf0.01 orders table, the estimate must track exact distinct
    counts (these groups are tiny, so the linear-counting branch does
    the work; median relative error well under the raw-HLL bound)."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        F.to_date("o_orderdate").alias("d"), "o_custkey"
    )
    est = sketches.portable_hll(orders, ["d"], "o_custkey", p=8,
                                estimate_col="est", zeros_col="z")
    exact = orders.groupBy("d").agg(F.countDistinct("o_custkey").alias("n"))
    joined = est.join(exact, "d").select(
        (F.abs(F.col("est") - F.col("n")) / F.col("n")).alias("rel_err")
    )
    errs = sorted(r["rel_err"] for r in joined.collect())
    median = errs[len(errs) // 2]
    p95 = errs[int(len(errs) * 0.95)]
    assert median < 0.05, median
    assert p95 < 0.20, p95


def test_kmv_accuracy_and_exact_small_sets(spark):
    from pyspark.sql import functions as F

    big = spark.range(0, 20_000).select(
        F.lit("g").alias("g"), (F.col("id") % 8_000).alias("k")
    )
    row = sketches.kmv_sketch(big, ["g"], "k", k=256).collect()[0]
    assert abs(row["kmv_distinct"] / 8_000 - 1.0) < 0.25, row["kmv_distinct"]
    small = spark.range(0, 40).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    srow = sketches.kmv_sketch(small, ["g"], "k", k=64).collect()[0]
    assert srow["kmv_distinct"] == 40.0  # < k distinct -> exact
    assert len(srow["kmv_hashes"]) == 40


def test_kmv_partition_invariance(spark):
    from pyspark.sql import functions as F

    def est(parts):
        df = spark.range(0, 5_000).select(
            F.lit("g").alias("g"), F.col("id").alias("k")
        ).repartition(parts)
        r = sketches.kmv_sketch(df, ["g"], "k", k=64).collect()[0]
        return r["kmv_distinct"], list(r["kmv_hashes"])

    assert est(1) == est(17)


def test_kmv_jaccard_estimate(spark):
    from pyspark.sql import functions as F

    # two sets with true Jaccard 1/3 (overlap 2000 of 4000-each)
    a = spark.range(0, 4_000).select(F.lit("a").alias("g"), F.col("id").alias("k"))
    b = spark.range(2_000, 6_000).select(F.lit("b").alias("g"), F.col("id").alias("k"))
    sk = sketches.kmv_sketch(a.union(b), ["g"], "k", k=256)
    wide = (
        sk.filter(F.col("g") == "a").select(F.col("kmv_hashes").alias("ha"))
        .crossJoin(sk.filter(F.col("g") == "b").select(F.col("kmv_hashes").alias("hb")))
        .select(sketches.kmv_jaccard(F.col("ha"), F.col("hb"), k=256).alias("j"))
    )
    j = wide.collect()[0]["j"]
    assert abs(j - 1 / 3) < 0.15, j


def test_bloom_no_false_negatives_and_low_fp(spark):
    from pyspark.sql import functions as F

    members = spark.range(0, 2_000).select(F.col("id").alias("k"))
    bloom = sketches.bloom_build(members, "k", m_bits=1 << 16)
    assert bloom.count() <= (1 << 16) // 64  # sparse, broadcastable

    probes = spark.range(0, 6_000).select(F.col("id").alias("k"))
    flags = {r["k"]: r["bloom_maybe"]
             for r in sketches.bloom_probe(probes, bloom, "k", m_bits=1 << 16).collect()}
    # zero false negatives (the Bloom contract)
    assert all(flags[i] for i in range(2_000))
    # false positives bounded: k=4, n=2000, m=65536 -> (1-e^-kn/m)^4 ~ 1.1e-4
    fp = sum(flags[i] for i in range(2_000, 6_000))
    assert fp <= 20, fp


def test_bloom_partition_invariance_and_merge(spark):
    from pyspark.sql import functions as F

    def build(parts):
        df = spark.range(0, 1_000).select(F.col("id").alias("k")).repartition(parts)
        return {(r["word_idx"], r["bits"])
                for r in sketches.bloom_build(df, "k").collect()}

    assert build(1) == build(13)
    # mergeable: OR of two halves == filter of the union
    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(500, 1_000).select(F.col("id").alias("k"))
    merged = {
        (r["word_idx"], r["bits"])
        for r in (
            sketches.bloom_build(a, "k").union(sketches.bloom_build(b, "k"))
            .groupBy("word_idx").agg(F.bit_or("bits").alias("bits")).collect()
        )
    }
    assert merged == build(1)


def test_bloom_probe_preserves_duplicate_probe_rows(spark):
    """Duplicate probe rows must each get their own flag (ADVICE r3:
    grouping on value columns collapsed n identical rows into one group
    whose hit-sum n*k != k, flagging a PRESENT key as absent — and
    silently changing row multiplicity in the bloom-join pre-filter)."""
    from pyspark.sql import functions as F

    members = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = sketches.bloom_build(members, "k", m_bits=1 << 16)
    probes = spark.createDataFrame([(5,), (5,), (500,)], "k long")
    rows = sketches.bloom_probe(probes, bloom, "k", m_bits=1 << 16).collect()
    assert len(rows) == 3  # multiplicity preserved
    flags = sorted((r["k"], r["bloom_maybe"]) for r in rows)
    assert flags[0] == (5, True) and flags[1] == (5, True)  # no false negative
    assert flags[2] == (500, False)  # fp odds ~1e-4 at n=100, m=2^16


def test_kmv_small_set_exact_without_totals_join(spark):
    """< k distinct stays exact via size(sketch) — the plan has exactly
    one aggregation over the distinct substrate (ADVICE r3: the extra
    per-group totals COUNT undercut the bounded-sketch scale story)."""
    from pyspark.sql import functions as F

    small = spark.range(0, 7).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    out = sketches.kmv_sketch(small, ["g"], "k", k=64)
    got = {r["g"]: (r["kmv_distinct"], len(r["kmv_hashes"])) for r in out.collect()}
    assert got == {"0": (4.0, 4), "1": (3.0, 3)}
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") <= 2  # distinct + bottom-k, no totals


def test_kmv_merge_is_lossless(spark):
    """kmv_merge(sketch(A), sketch(B)) == sketch(A ∪ B) element-for-
    element, and kmv_estimate_from_sketch on the merged array equals the
    single-pass estimate — the mergeability contract the scale probe
    (tools/sketch_probe.py) verifies at 10^4..10^7 cardinality."""
    from pyspark.sql import functions as F

    k = 64
    a = spark.range(0, 3_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(2_000, 6_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    single = sketches.kmv_sketch(a.union(b), ["g"], "v", k=k).collect()[0]
    sa = sketches.kmv_sketch(a, ["g"], "v", k=k).select("g", F.col("kmv_hashes").alias("ha"))
    sb = sketches.kmv_sketch(b, ["g"], "v", k=k).select("g", F.col("kmv_hashes").alias("hb"))
    merged = sa.join(sb, "g").select(
        sketches.kmv_merge(F.col("ha"), F.col("hb"), k=k).alias("hm")
    ).select(
        "hm", sketches.kmv_estimate_from_sketch(F.col("hm"), k=k).alias("est")
    ).collect()[0]
    assert list(merged["hm"]) == list(single["kmv_hashes"])
    assert merged["est"] == single["kmv_distinct"]
    # small-set branch of the from-sketch estimator: exact
    tiny = sketches.kmv_sketch(
        spark.range(0, 10).select(F.lit("g").alias("g"), F.col("id").alias("v")),
        ["g"], "v", k=k,
    ).select(
        sketches.kmv_estimate_from_sketch(F.col("kmv_hashes"), k=k).alias("est")
    ).collect()[0]
    assert tiny["est"] == 10.0


def test_bottom_k_sample_deterministic_mergeable_quantiles(spark):
    """The value-carrying bottom-k sample (r4): partition-invariant,
    merge(sample(A), sample(B)) == sample(A ∪ B) element-for-element,
    and rank-based quantile estimates land within ~3/sqrt(k) of truth
    on a uniform domain."""
    from pyspark.sql import functions as F

    k = 128

    def sample(parts):
        df = spark.range(0, 10_000).select(
            F.lit("g").alias("g"), F.col("id").alias("v")
        ).repartition(parts)
        row = sketches.bottom_k_sample(df, ["g"], "v", k=k).collect()[0]
        return [(r["h"], r["v"]) for r in row["sample_values"]]

    assert sample(1) == sample(13)  # partition-invariant

    a = spark.range(0, 6_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(4_000, 10_000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    single = sketches.bottom_k_sample(a.union(b), ["g"], "v", k=k).collect()[0]
    sa = sketches.bottom_k_sample(a, ["g"], "v", k=k).select(
        "g", F.col("sample_values").alias("xa")
    )
    sb = sketches.bottom_k_sample(b, ["g"], "v", k=k).select(
        "g", F.col("sample_values").alias("xb")
    )
    merged = sa.join(sb, "g").select(
        sketches.bottom_k_sample_merge(F.col("xa"), F.col("xb"), k=k).alias("xm")
    ).collect()[0]
    assert [tuple(x) for x in merged["xm"]] == [tuple(x) for x in single["sample_values"]]

    # quantiles: uniform 0..9999 -> median ~5000, p90 ~9000; 3/sqrt(128) ~ 0.27
    qdf = sketches.bottom_k_sample(
        a.union(b), ["g"], "v", k=k
    ).select(
        sketches.sample_quantile(F.col("sample_values"), 0.5).alias("p50"),
        sketches.sample_quantile(F.col("sample_values"), 0.9).alias("p90"),
    ).collect()[0]
    assert abs(qdf["p50"] / 10_000 - 0.5) < 0.27
    assert abs(qdf["p90"] / 10_000 - 0.9) < 0.27
    # the estimate is an actual data value (rank selection, no interpolation)
    assert 0 <= qdf["p50"] < 10_000


def test_hash_sketches_reject_float_value_columns(spark):
    """r4 ADVICE: the hash sketches hash CAST(value AS STRING), and
    float/double-to-string rendering is engine-specific (Spark 1.0E-4
    vs DuckDB 0.0001) — so float value columns must be rejected, not
    silently non-portable. Integer/string columns stay accepted."""
    import pytest

    fdf = spark.range(0, 10).select(
        F.lit("g").alias("g"), (F.col("id") * 0.0001).alias("v")
    )
    with pytest.raises(ValueError, match="integerize|Integerize"):
        sketches.kmv_sketch(fdf, ["g"], "v")
    with pytest.raises(ValueError, match="integerize|Integerize"):
        sketches.bottom_k_sample(fdf, ["g"], "v")

    # the documented remedy — integer cents — is accepted and portable
    cents = fdf.select("g", F.expr("CAST(round(v * 10000) AS BIGINT)").alias("v"))
    assert sketches.kmv_sketch(cents, ["g"], "v", k=8).count() == 1
    assert sketches.bottom_k_sample(cents, ["g"], "v", k=8).count() == 1


def test_cms_sketch_overestimate_merge_and_bounds(spark):
    """Count-Min (r5): (a) estimates are NEVER below true counts and a
    clear heavy hitter is exact or near-exact, (b) state is bounded by
    depth x width regardless of input size, (c) merge(sketch(A),
    sketch(B)) == sketch(A ∪ B) cell-for-cell, (d) partition-invariant,
    (e) float value columns rejected like the other hash sketches."""
    import pytest
    from pyspark.sql import functions as F

    # skewed stream: value v appears v+1 times, v in 0..99 (+ a 5000x
    # heavy hitter id 7)
    base = spark.range(0, 100).selectExpr("id AS v").selectExpr(
        "v", "explode(sequence(0, CAST(v AS INT))) AS _r"
    ).drop("_r")
    heavy = spark.range(0, 5000).select(F.lit(7).alias("v"))
    df = base.union(heavy).select(F.lit("g").alias("g"), "v")

    W = 256
    sk = sketches.cms_sketch(df, ["g"], "v", width=W).cache()
    # (b) bounded, sparse state
    assert sk.count() <= 4 * W
    assert sk.select("cms_d").distinct().count() == 4

    truth = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    est = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(
            sk, df.select("g", "v").distinct(), ["g"], "v", width=W
        ).collect()
    }
    # (a) one-sided error + εN bound with comfortable slack (εN = e/W·N)
    n_total = sum(truth.values())
    for v, t in truth.items():
        assert est[v] >= t
        assert est[v] - t <= max(64, int(0.05 * n_total))
    assert est[7] >= 5008  # heavy hitter: exact count is 5000 + 8 base rows
    # never-seen value → all cells may still collide, but with 4 depths
    # over this load the min cell must stay small
    ghost = spark.createDataFrame([("g", 12345)], "g string, v long")
    gst = sketches.cms_estimate(sk, ghost, ["g"], "v", width=W).collect()[0]["cms_est"]
    assert gst <= max(64, int(0.05 * n_total))

    # (d) partition invariance
    sk13 = sketches.cms_sketch(df.repartition(13), ["g"], "v", width=W)
    assert sorted(map(tuple, sk13.collect())) == sorted(map(tuple, sk.collect()))

    # (c) lossless merge
    a = df.filter(F.col("v") < 50)
    b = df.filter(F.col("v") >= 50)
    merged = sketches.cms_merge(
        sketches.cms_sketch(a, ["g"], "v", width=W),
        sketches.cms_sketch(b, ["g"], "v", width=W),
        ["g"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))
    sk.unpersist()

    # (e) float guard
    fdf = spark.range(5).select(F.lit("g").alias("g"), (F.col("id") * 0.1).alias("v"))
    with pytest.raises(ValueError, match="[Ii]ntegerize"):
        sketches.cms_sketch(fdf, ["g"], "v")
