"""Sketch-family scale probe (r3 VERDICT #8): drive HLL / KMV / Bloom
across growing cardinality (default 10^4 → 10^6, pass a higher max
exponent for 100×+ sweeps) and verify the three properties the 100 TB
story rests on:

1. **Error bounds hold** as cardinality grows: HLL relative error stays
   within ~3σ of 1.04/sqrt(2^p); KMV within ~3σ of 1/sqrt(k-2); Bloom
   false-positive rate within 3× of (1-e^{-kn/m})^k.
2. **State stays bounded** regardless of input size: HLL ≤ 2^p register
   rows per group, KMV ≤ k hashes, Bloom ≤ m/64 sparse words. This is
   the difference between a sketch and an exact aggregate — the shuffle
   payload is CONSTANT in the input.
3. **Merge is lossless**: registers merged by MAX across disjoint
   halves estimate EXACTLY what a single-pass build estimates
   (bit-equal doubles); KMV bottom-k merged via kmv_merge equals the
   single-pass sketch element-for-element.

Usage: python tools/sketch_probe.py [max_exp] [p] [k]
Prints one JSON line per (sketch, N) probe.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    sketches,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)


def probe_hll(spark, n: int, p: int) -> dict:
    m = 1 << p
    df = spark.range(0, n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    t0 = time.perf_counter()
    est = sketches.portable_hll(df, ["g"], "v", p=p).collect()[0]["approx_distinct"]
    elapsed = time.perf_counter() - t0
    regs = sketches.hll_registers(df, ["g"], "v", p=p)
    state_rows = regs.count()

    # merge: two disjoint halves, registers unioned + MAX-merged, must
    # estimate EXACTLY the single-pass value (register tables identical)
    a = spark.range(0, n // 2).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(n // 2, n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    merged_regs = (
        sketches.hll_registers(a, ["g"], "v", p=p)
        .unionByName(sketches.hll_registers(b, ["g"], "v", p=p))
        .groupBy("g", "_hll_reg")
        .agg(F.max("_hll_r").alias("_hll_r"))
    )
    est_merged = sketches.hll_estimate_from_registers(merged_regs, ["g"], p=p).collect()[0][
        "approx_distinct"
    ]
    rel_err = abs(est - n) / n
    sigma = 1.04 / math.sqrt(m)
    return {
        "sketch": f"hll_p{p}",
        "n": n,
        "estimate": round(est, 1),
        "rel_err": round(rel_err, 4),
        "bound_3sigma": round(3 * sigma, 4),
        "within_bound": rel_err <= 3 * sigma,
        "state_rows": state_rows,
        "state_bound": m,
        "state_bounded": state_rows <= m,
        "merge_exact": est_merged == est,
        "sec": round(elapsed, 2),
    }


def probe_kmv(spark, n: int, k: int) -> dict:
    df = spark.range(0, n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    t0 = time.perf_counter()
    row = sketches.kmv_sketch(df, ["g"], "v", k=k).collect()[0]
    elapsed = time.perf_counter() - t0
    est, sketch = row["kmv_distinct"], list(row["kmv_hashes"])

    a = spark.range(0, n // 2).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(n // 2, n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    sa = sketches.kmv_sketch(a, ["g"], "v", k=k).select(
        "g", F.col("kmv_hashes").alias("ha")
    )
    sb = sketches.kmv_sketch(b, ["g"], "v", k=k).select(
        "g", F.col("kmv_hashes").alias("hb")
    )
    merged = sa.join(sb, "g").select(
        sketches.kmv_merge(F.col("ha"), F.col("hb"), k=k).alias("hm")
    )
    mrow = merged.select(
        F.col("hm"), sketches.kmv_estimate_from_sketch(F.col("hm"), k=k).alias("est")
    ).collect()[0]
    rel_err = abs(est - n) / n
    sigma = 1.0 / math.sqrt(k - 2)
    return {
        "sketch": f"kmv_k{k}",
        "n": n,
        "estimate": round(est, 1),
        "rel_err": round(rel_err, 4),
        "bound_3sigma": round(3 * sigma, 4),
        "within_bound": rel_err <= 3 * sigma,
        "state_rows": len(sketch),
        "state_bound": k,
        "state_bounded": len(sketch) <= k,
        "merge_exact": list(mrow["hm"]) == sketch and mrow["est"] == est,
        "sec": round(elapsed, 2),
    }


def probe_bloom(spark, n: int, m_bits: int) -> dict:
    members = spark.range(0, n).select(F.col("id").alias("v"))
    t0 = time.perf_counter()
    bloom = sketches.bloom_build(members, "v", m_bits=m_bits).cache()
    words = bloom.count()
    elapsed = time.perf_counter() - t0
    n_probe = 100_000
    probes = spark.range(n, n + n_probe).select(F.col("id").alias("v"))
    fp = (
        sketches.bloom_probe(probes, bloom, "v", m_bits=m_bits)
        .filter(F.col("bloom_maybe"))
        .count()
    )
    bloom.unpersist()
    k = sketches.BLOOM_K
    expected_fp = (1 - math.exp(-k * n / m_bits)) ** k
    fp_rate = fp / n_probe
    return {
        "sketch": f"bloom_m{m_bits}",
        "n": n,
        "fp_rate": round(fp_rate, 6),
        "expected_fp": round(expected_fp, 6),
        "within_bound": fp_rate <= max(3 * expected_fp, 3 / n_probe),
        "state_rows": words,
        "state_bound": m_bits // 64,
        "state_bounded": words <= m_bits // 64,
        "sec": round(elapsed, 2),
    }


def probe_cms(spark, n: int, width: int) -> dict:
    """CMS at cardinality n/10 (each value appears 10×) + one 1000×
    heavy hitter: one-sided error always, εN (ε = e/width) holds for
    ≥90% of sampled values (per-value guarantee is 1 − e^−depth ≈
    98%), state bounded by depth·width, merge of halves cell-exact."""
    d_vals = max(n // 10, 1)
    df = spark.range(0, n).select(
        F.lit("g").alias("g"), (F.col("id") % d_vals).alias("v")
    )
    heavy = spark.range(0, 1000).select(F.lit("g").alias("g"), F.lit(0).cast("long").alias("v"))
    df = df.union(heavy)
    t0 = time.perf_counter()
    sk = sketches.cms_sketch(df, ["g"], "v", width=width).cache()
    state_rows = sk.count()
    elapsed = time.perf_counter() - t0

    n_total = n + 1000
    eps_n = math.e / width * n_total
    sample = spark.range(0, min(200, d_vals)).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = {
        r["v"]: r["cms_est"]
        for r in sketches.cms_estimate(sk, sample, ["g"], "v", width=width).collect()
    }
    true = {v: (n // d_vals + (1000 if v == 0 else 0)) + (1 if v < n % d_vals else 0) for v in est}
    one_sided = all(est[v] >= true[v] for v in est)
    viol = sum(1 for v in est if est[v] - true[v] > eps_n)

    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    merged = sketches.cms_merge(
        sketches.cms_sketch(a, ["g"], "v", width=width),
        sketches.cms_sketch(b, ["g"], "v", width=width),
        ["g"],
    )
    merge_exact = sorted(map(tuple, merged.collect())) == sorted(map(tuple, sk.collect()))
    sk.unpersist()
    return {
        "sketch": f"cms_w{width}",
        "n": n_total,
        "distinct": d_vals,
        "one_sided": one_sided,
        "eps_n": round(eps_n, 1),
        "viol_frac": round(viol / max(len(est), 1), 4),
        "within_bound": one_sided and viol <= 0.1 * len(est),
        "state_rows": state_rows,
        "state_bound": sketches.CMS_DEPTH * width,
        "state_bounded": state_rows <= sketches.CMS_DEPTH * width,
        "merge_exact": merge_exact,
        "sec": round(elapsed, 2),
    }


def main() -> None:
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    spark = build_session(
        app_name="sketch-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for exp in range(4, max_exp + 1):
        n = 10**exp
        for rec in (
            probe_hll(spark, n, p),
            probe_kmv(spark, n, k),
            probe_bloom(spark, n, 1 << 24),
            probe_cms(spark, n, 4096),
        ):
            ok = ok and rec.get("within_bound", True) and rec.get(
                "state_bounded", True
            ) and rec.get("merge_exact", True)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"verdict": "PASS" if ok else "FAIL"}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
