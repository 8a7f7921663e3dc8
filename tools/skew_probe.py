"""Skew-extreme probe (r8/r9 VERDICT carry-over): AQE skew-join vs the
static salted_join at a 10^6:1 hot key.

Workload: a fact table where ONE key holds `hot` rows (default 10^6)
and `cold` further keys hold one row each, equi-joined to a key-unique
dim too large to broadcast (broadcast disabled outright so the probe
measures the shuffle-join regime — the regime salted_join exists for).
The join output is folded to a checksum so every matched row is
materialized but nothing is collected.

Three contenders, fresh SparkSession each (AQE flags are plan-time):

  aqe_off   — plain SMJ, AQE disabled: the unmitigated baseline; the
              hot key's entire row set lands on ONE reducer.
  aqe_skew  — plain SMJ, AQE + skew-join split enabled (thresholds
              lowered so the optimization actually triggers at probe
              scale; at production scale the defaults trigger).
  salted    — operators.skew.salted_join with AQE disabled: row-salted
              fact, dim exploded n_salts ways — the static fallback
              for when AQE can't help (e.g. the skewed side feeds a
              downstream op that forbids plan reshaping, or the join
              is produced by a non-AQE engine stage).

All three must return the SAME checksum (salt only routes rows); the
probe prints per-contender wall seconds (min over `reps` runs inside
one JVM after a warm-up) plus the max-task-row spread that explains
them. Usage:

    python tools/skew_probe.py [hot] [cold] [n_salts] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    skew,
)


def _session(aqe: bool, skew_split: bool) -> SparkSession:
    b = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        # the probe targets the shuffle-join regime: never broadcast
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", str(aqe).lower())
        .config(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_split).lower()
        )
        # shrink the skew thresholds so the split triggers at probe
        # scale (defaults: 256MB/5x — correct at production scale,
        # inert on a few-hundred-MB local shuffle)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "1m",
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        # keep AQE from folding the probe's 32 partitions back together
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.ui.enabled", "false")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def _frames(spark: SparkSession, hot: int, cold: int):
    # fact: key 0 repeats `hot` times; keys 1..cold appear once each.
    fact = spark.range(0, hot + cold).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.col("id") - hot + 1)
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    # dim: key-unique payload over every key (too big to broadcast by
    # config anyway; realistic column so the join moves real bytes)
    dim = spark.range(0, cold + 1).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload_"), F.col("id")).alias("p"),
        (F.col("id") * 13 % 1009).alias("w"),
    )
    return fact, dim


def _checksum(df) -> tuple:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v") * F.col("w")).alias("s"),
        F.sum(F.length("p")).alias("lp"),
    ).collect()[0]
    return (row["n"], row["s"], row["lp"])


def _run(mode: str, hot: int, cold: int, n_salts: int, reps: int) -> dict:
    spark = _session(
        aqe=(mode == "aqe_skew"), skew_split=(mode == "aqe_skew")
    )
    try:
        fact, dim = _frames(spark, hot, cold)
        if mode == "salted":
            joined = skew.salted_join(fact, dim, "k", n_salts=n_salts)
        else:
            joined = fact.join(dim, "k")
        checksum, best = None, float("inf")
        for _ in range(reps + 1):  # first run is the warm-up
            t0 = time.perf_counter()
            checksum = _checksum(joined)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        return {"mode": mode, "secs": round(best, 3), "checksum": checksum}
    finally:
        spark.stop()


def main() -> None:
    hot = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cold = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_salts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    print(
        json.dumps(
            {"probe": "skew", "hot": hot, "cold": cold, "n_salts": n_salts}
        ),
        flush=True,
    )
    results = {}
    for mode in ("aqe_off", "aqe_skew", "salted"):
        r = _run(mode, hot, cold, n_salts, reps)
        results[mode] = r
        print(json.dumps(r), flush=True)
    sums = {tuple(r["checksum"]) for r in results.values()}
    verdict = {
        "checksums_equal": len(sums) == 1,
        "aqe_speedup_vs_off": round(
            results["aqe_off"]["secs"] / results["aqe_skew"]["secs"], 2
        ),
        "salted_speedup_vs_off": round(
            results["aqe_off"]["secs"] / results["salted"]["secs"], 2
        ),
    }
    print(json.dumps(verdict), flush=True)
    if len(sums) != 1:
        raise SystemExit("FAIL: contenders disagree on the join result")


if __name__ == "__main__":
    main()
