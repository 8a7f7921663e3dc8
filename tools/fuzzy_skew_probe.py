"""fuzzy_matches hot-gram skew probe (r15, VERDICT r14 #4).

A gram appearing in f of the long-band values contributes f·(f−1)/2
candidate pairs to the bigram self-join — one ubiquitous bigram makes
blocking quadratic regardless of how rare true matches are. The
max_df_ppm knob drops such grams from BLOCKING (honest-lossy,
docstring). This probe PLANTS that worst case and measures it:

Corpus: n values, EVERY one containing the hot bigram "th" (planted as
a shared prefix "the") plus an otherwise-unique random tail over a
16-letter alphabet — so the hot gram's bucket is the whole corpus while
true near-pairs are a handful of planted typo twins (one per 100
values, one substitution each: always within d=2, never lost by the
cut because the twins share their entire rare tail).

Measured per n: candidate-pair count entering the DP verify (the
quadratic blowup the knob exists to kill) and wall seconds to collect
the verified pairs, with the cut OFF vs ON (max_df_ppm=300000). The
planted twin pairs must be found by BOTH runs — the cut must cost zero
recall here (twins share rare tail grams).

Usage: python tools/fuzzy_skew_probe.py [sizes_csv]   (default
2000,8000,32000). Prints one JSON line per (n, mode).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _corpus(n: int, seed: int = 7) -> tuple[list[str], set[tuple[str, str]]]:
    rng = random.Random(seed)
    alpha = "abcdefghijklmnop"
    vals: set[str] = set()
    while len(vals) < n:
        vals.add("the" + "".join(rng.choice(alpha) for _ in range(9)))
    out = sorted(vals)
    twins: set[tuple[str, str]] = set()
    for i in range(0, n, 100):
        v = out[i]
        pos = rng.randrange(3, len(v))
        repl = rng.choice([c for c in alpha if c != v[pos]])
        t = v[:pos] + repl + v[pos + 1 :]
        if t not in vals:
            vals.add(t)
            a, b = sorted((v, t))
            twins.add((a, b))
    return sorted(vals), twins


def _candidate_count(vals_df, d: int, ppm: int | None, spark) -> int:
    """Replicates fuzzy_matches' long-band blocking to COUNT candidates
    entering the DP verify (the op itself doesn't expose the
    intermediate; the formula here mirrors dedup.fuzzy_matches)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    vals = (
        vals_df.filter(F.col("text").isNotNull() & (F.length("text") > d))
        .select(F.col("text").alias("_v"))
        .distinct()
        .withColumn("_len", F.length("_v"))
    )
    grams = vals.select(
        "_v",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(_len - 1, 1)),"
                    " i -> substring(_v, i, 2))"
                )
            )
        ).alias("_g"),
    ).filter(F.length("_v") > 2 * d + 1)
    if ppm is not None:
        n_long = vals.filter(F.length("_v") > 2 * d + 1).count()
        grams = (
            grams.withColumn(
                "_df",
                F.count(F.lit(1)).over(Window.partitionBy("_g")).cast("long"),
            )
            .filter(
                F.col("_df") * F.lit(1_000_000).cast("long")
                <= F.lit(int(ppm)).cast("long") * F.lit(int(n_long)).cast("long")
            )
            .drop("_df")
        )
    return (
        grams.select(F.col("_v").alias("a"), "_g")
        .join(grams.select(F.col("_v").alias("b"), "_g"), "_g")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )


def main() -> None:
    sizes = [
        int(x)
        for x in (sys.argv[1] if len(sys.argv) > 1 else "2000,8000,32000").split(",")
    ]
    from pyspark.sql import SparkSession

    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (
        dedup,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        vals, twins = _corpus(n)
        df = spark.createDataFrame([(v,) for v in vals], "text string").cache()
        df.count()
        for mode, ppm in (("no_cut", None), ("cut_300k", 300_000)):
            t0 = time.perf_counter()
            got = {
                (r.text_a, r.text_b)
                for r in dedup.fuzzy_matches(
                    df, max_dist=2, max_df_ppm=ppm
                ).collect()
            }
            wall = time.perf_counter() - t0
            cand = _candidate_count(df, 2, ppm, spark)
            missed = twins - got
            print(
                json.dumps(
                    {
                        "n": n,
                        "mode": mode,
                        "candidates": cand,
                        "pairs_found": len(got),
                        "planted_twins": len(twins),
                        "twins_missed": len(missed),
                        "secs": round(wall, 2),
                    }
                ),
                flush=True,
            )
        df.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
