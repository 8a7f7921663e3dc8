"""Incremental HLL register store (streaming/sketches.py): streamed
merge must equal the batch sketch bit-for-bit, replays must be no-ops,
and the store must stay register-bounded."""

from __future__ import annotations

from pyspark.sql import functions as F

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
    sketches,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming import (
    sketches as ssk,
)


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") % 4_000).alias("v"),
    )


def test_streamed_merge_equals_batch_estimate(spark, tmp_path):
    store = str(tmp_path / "hll_store")
    cuts = [(0, 3_000), (3_000, 9_000), (9_000, 20_000)]
    for lo, hi in cuts:
        ssk.merge_hll_registers(spark, store, _batch(spark, lo, hi), ["g"], "v")

    streamed = {
        r["g"]: (r["approx_distinct"], r["n_zero_registers"])
        for r in ssk.read_hll_estimates(spark, store, ["g"]).collect()
    }
    batch = {
        r["g"]: (r["approx_distinct"], r["n_zero_registers"])
        for r in sketches.portable_hll(_batch(spark, 0, 20_000), ["g"], "v").collect()
    }
    assert streamed == batch  # bit-for-bit, not approximately

    # store stays register-bounded: <= groups x 2^p rows
    assert spark.read.parquet(store).count() <= 7 * 256


def test_replayed_batch_is_a_noop(spark, tmp_path):
    store = str(tmp_path / "hll_store")
    ssk.merge_hll_registers(spark, store, _batch(spark, 0, 5_000), ["g"], "v")
    before = {
        (r["g"], r["_hll_reg"], r["_hll_r"])
        for r in spark.read.parquet(store).collect()
    }
    # at-least-once delivery: the same batch arrives again
    ssk.merge_hll_registers(spark, store, _batch(spark, 0, 5_000), ["g"], "v")
    after = {
        (r["g"], r["_hll_reg"], r["_hll_r"])
        for r in spark.read.parquet(store).collect()
    }
    assert before == after


def test_streamed_cms_equals_batch_replay_safe_and_compact(spark, tmp_path):
    """Streaming CMS store (r5): summed cells across batches must equal
    the single-pass sketch cell-for-cell; a REPLAYED batch id must be a
    no-op (per-batch keying replaces, never double-counts — the SUM
    twin of HLL's idempotent MAX); compaction folds to one bounded
    generation without changing a single cell."""
    W = 64
    store = str(tmp_path / "cms_store")
    cuts = [(0, 3_000), (3_000, 9_000), (9_000, 20_000)]
    for bid, (lo, hi) in enumerate(cuts):
        ssk.merge_cms_cells(spark, store, _batch(spark, lo, hi), ["g"], "v",
                            batch_id=bid, width=W)

    single = sorted(map(tuple, sketches.cms_sketch(
        _batch(spark, 0, 20_000), ["g"], "v", width=W).collect()))
    streamed = sorted(map(tuple, ssk.read_cms_cells(spark, store, ["g"]).collect()))
    assert streamed == single  # cell-for-cell

    # replay batch 1: identical store afterwards
    ssk.merge_cms_cells(spark, store, _batch(spark, 3_000, 9_000), ["g"], "v",
                        batch_id=1, width=W)
    assert sorted(map(tuple, ssk.read_cms_cells(spark, store, ["g"]).collect())) == single

    # estimates finish on read and stay one-sided vs exact history
    q = _batch(spark, 0, 20_000).distinct().limit(50)
    truth = {
        (r["g"], r["v"]): r["n"]
        for r in _batch(spark, 0, 20_000).groupBy("g", "v").agg(
            F.count("*").alias("n")).collect()
    }
    est = ssk.read_cms_estimates(spark, store, q, ["g"], "v", width=W)
    for r in est.collect():
        assert r["cms_est"] >= truth[(r["g"], r["v"])]

    # compaction: bounded single generation, cells unchanged
    ssk.compact_cms_store(spark, store, ["g"])
    after = spark.read.parquet(store)
    assert after.select("_cms_batch").distinct().collect()[0][0] == -1
    assert after.count() <= 7 * sketches.CMS_DEPTH * W
    assert sorted(map(tuple, ssk.read_cms_cells(spark, store, ["g"]).collect())) == single

    # post-compaction batches keep folding in correctly
    ssk.merge_cms_cells(spark, store, _batch(spark, 20_000, 25_000), ["g"], "v",
                        batch_id=3, width=W)
    full = sorted(map(tuple, sketches.cms_sketch(
        _batch(spark, 0, 25_000), ["g"], "v", width=W).collect()))
    assert sorted(map(tuple, ssk.read_cms_cells(spark, store, ["g"]).collect())) == full


def test_replayed_batch_with_different_contents_leaves_no_stale_cells(
    spark, tmp_path
):
    """r6 ADVICE fix: a batch re-delivered with DIFFERENT contents (e.g.
    an upstream fix re-emitted the batch) must fully replace its prior
    row range — delete-then-insert via upsert.replace_where, not a
    keyed upsert that leaves orphan cells from the first attempt."""
    W = 64
    store = str(tmp_path / "cms_store")
    ssk.merge_cms_cells(spark, store, _batch(spark, 0, 3_000), ["g"], "v",
                        batch_id=0, width=W)
    # first attempt of batch 1: wide slice touching many cells
    ssk.merge_cms_cells(spark, store, _batch(spark, 3_000, 9_000), ["g"], "v",
                        batch_id=1, width=W)
    # re-delivery of batch 1 with a SMALLER corrected payload: the cells
    # only the first attempt touched must disappear
    ssk.merge_cms_cells(spark, store, _batch(spark, 3_000, 3_100), ["g"], "v",
                        batch_id=1, width=W)

    want = sorted(map(tuple, sketches.cms_sketch(
        spark.range(0, 3_000).union(spark.range(3_000, 3_100)).select(
            (F.col("id") % 7).cast("string").alias("g"),
            (F.col("id") % 4_000).alias("v"),
        ),
        ["g"], "v", width=W).collect()))
    got = sorted(map(tuple, ssk.read_cms_cells(spark, store, ["g"]).collect()))
    assert got == want  # cell-for-cell equal to the corrected history


def test_replace_where_range_swap(spark, tmp_path):
    """upsert.replace_where: Delta-style INSERT OVERWRITE WHERE on a
    parquet table — rows matching the predicate are replaced wholesale
    (stale rows deleted), rows outside it are untouched, and column
    order is stable across generations."""
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        upsert,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "c", 30)], "part int, k string, v int"
    )
    upsert.replace_where(spark, path, df, "part = 1")  # initial write
    # replace part=1 with a single different row; (1,'b') must vanish
    repl = spark.createDataFrame([(1, "z", 99)], "part int, k string, v int")
    upsert.replace_where(spark, path, repl, "part = 1")
    rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert rows == [(1, "z", 99), (2, "c", 30)]
    assert spark.read.parquet(path).columns == ["part", "k", "v"]
    # idempotent: same call again -> byte-identical contents
    upsert.replace_where(spark, path, repl, "part = 1")
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == rows
