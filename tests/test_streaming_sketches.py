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
