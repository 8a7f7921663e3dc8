"""Statistical distribution audit of the hash-threshold sampling ops
(r14, VERDICT r13 #4 — the A-ES lesson generalized): determinism and
oracle-parity tests prove a draw is REPRODUCIBLE, but cannot see a
BIASED one (r13 found weighted_sample's coarse-log2 draw gave a 5:1
weight class 1.40x its proportional share while every exactness test
stayed green). This probe measures each remaining sampling op's
EMPIRICAL distribution against its theoretical one with explicit
chi-square / binomial-z bounds:

1. assign_split      — bucket = portable_hash(id) mod 100 must be
                       uniform over buckets (chi-square, df=99) for
                       integer-string AND prefixed id populations, and
                       split fractions must hit (test, val, train)
                       percentages within binomial bounds.
2. mixture_sample    — per-(salt, frac) keep counts ~ Binomial(N, p):
                       max |z| over salts bounded, and the POOLED
                       count over salts unbiased (the pooled z is the
                       sensitive aggregate — a systematic +0.5% bias
                       invisible per-salt shows up at sqrt(S·N)).
3. stratified_sample — per-id inclusion frequency across S independent
                       salts ~ Binomial(S, n/N): chi-square over ids
                       (exactly the statistic that caught the A-ES bin
                       artifact: a systematically-favored id class
                       inflates it), plus max per-id count.
4. bottom_k_sample   — the bottom-k by value-hash must be a UNIFORM
                       subset of each block's distinct values: the
                       sampled values' within-block positions pooled
                       over B disjoint blocks must be ~U(0,1)
                       (per-block mean z, pooled bias z, and a
                       20-bin chi-square over pooled positions).

Every draw here is deterministic (fixed salt lists, fixed value
domains), so a run is exactly reproducible; thresholds sit at the
~1e-6 tail of the null so a pass is stable and a real bias of the
size r13 found (tens of percent) fails by orders of magnitude.

Usage: python tools/sample_probe.py
Prints one JSON line per check; exits nonzero on any bound violation.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    curation,
    sketches,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

FAILURES: list[str] = []


def _emit(d: dict) -> None:
    print(json.dumps(d), flush=True)
    if not d.get("ok", True):
        FAILURES.append(d.get("check", "?"))


def chi2_bound(df_: int) -> float:
    """~1e-6 upper quantile of chi-square_{df} via the Wilson–Hilferty
    normal approximation (z = 4.75): deterministic, library-free."""
    z = 4.75
    return df_ * (1 - 2 / (9 * df_) + z * math.sqrt(2 / (9 * df_))) ** 3


def probe_assign_split(spark, n: int = 200_000) -> None:
    for label, id_expr in [
        ("int_ids", F.col("id").cast("string")),
        ("prefixed_ids", F.concat(F.lit("doc-"), F.col("id").cast("string"))),
    ]:
        df = spark.range(n).select(id_expr.alias("doc_id"))
        out = curation.assign_split(df, id_col="doc_id", val_pct=10, test_pct=10)
        from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.functions.expressions import (  # noqa: E501
            portable_hash,
        )

        buckets = (
            df.select(F.pmod(portable_hash(F.col("doc_id")), F.lit(100)).alias("b"))
            .groupBy("b").count().collect()
        )
        counts = {r.b: r["count"] for r in buckets}
        e = n / 100
        chi2 = sum((counts.get(b, 0) - e) ** 2 / e for b in range(100))
        splits = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        zs = {}
        for name, p in [("test", 0.10), ("val", 0.10), ("train", 0.80)]:
            obs = splits.get(name, 0)
            zs[name] = round((obs - n * p) / math.sqrt(n * p * (1 - p)), 2)
        bound = chi2_bound(99)
        ok = chi2 < bound and all(abs(z) < 4.75 for z in zs.values())
        _emit({
            "check": f"assign_split/{label}", "n": n,
            "chi2_buckets": round(chi2, 1), "chi2_bound": round(bound, 1),
            "split_z": zs, "ok": ok,
        })


def probe_mixture_sample(spark, n: int = 50_000, n_salts: int = 40) -> None:
    salts = [f"s{i}" for i in range(n_salts)]
    fracs = [0.05, 0.30, 0.75]
    ids = spark.range(n).select(F.col("id").alias("doc_id"),
                                F.lit("web").alias("source"))
    for frac in fracs:
        p = int(frac * 1_000_000) / 1_000_000
        counts = []
        for s in salts:
            kept = curation.mixture_sample(
                ids, {"web": frac}, id_col="doc_id", salt=s
            ).count()
            counts.append(kept)
        sd = math.sqrt(n * p * (1 - p))
        z_per = [(c - n * p) / sd for c in counts]
        pooled = sum(counts)
        z_pool = (pooled - n_salts * n * p) / math.sqrt(n_salts * n * p * (1 - p))
        ok = max(abs(z) for z in z_per) < 4.75 and abs(z_pool) < 4.75
        _emit({
            "check": f"mixture_sample/frac={frac}", "n": n, "salts": n_salts,
            "max_abs_z_per_salt": round(max(abs(z) for z in z_per), 2),
            "pooled_z": round(z_pool, 3), "ok": ok,
        })


def probe_stratified_sample(spark, n: int = 2_000, k: int = 100,
                            n_salts: int = 60) -> None:
    ids = spark.range(n).select(F.col("id").alias("doc_id"),
                                F.lit("g").alias("grp"))
    incl: dict[int, int] = {i: 0 for i in range(n)}
    for s in range(n_salts):
        rows = curation.stratified_sample(
            ids, ["grp"], "doc_id", k, salt=f"salt{s}"
        ).select("doc_id").collect()
        for r in rows:
            incl[r.doc_id] += 1
    p = k / n
    e = n_salts * p
    chi2 = sum((c - e) ** 2 / e for c in incl.values())
    # inclusion counts are mildly negatively correlated (exactly k per
    # salt), which only SHRINKS the statistic — the upper bound stays
    # conservative
    bound = chi2_bound(n - 1)
    mx = max(incl.values())
    # per-id max: Binomial(S, p) 1e-6-ish tail via normal + slack
    mx_bound = e + 4.75 * math.sqrt(n_salts * p * (1 - p)) + 1
    ok = chi2 < bound and mx <= mx_bound
    _emit({
        "check": "stratified_sample", "n": n, "k": k, "salts": n_salts,
        "chi2_ids": round(chi2, 1), "chi2_bound": round(bound, 1),
        "max_inclusions": mx, "max_bound": round(mx_bound, 1),
        "expected_mean": e, "ok": ok,
    })


def probe_bottom_k_sample(spark, blocks: int = 200, m: int = 2_000,
                          k: int = 100) -> None:
    # disjoint value blocks [b*m, (b+1)*m) — each block is an
    # independent draw of "which k of m distinct values hash lowest"
    vals = spark.range(blocks * m).select(
        (F.col("id") / m).cast("long").alias("g"), F.col("id").alias("v")
    )
    samp = sketches.bottom_k_sample(vals, ["g"], "v", k=k)
    u = samp.select(
        "g", F.explode(F.col("sample_values")).alias("s")
    ).select(
        "g",
        ((F.col("s.v") - F.col("g") * m) / F.lit(float(m))).alias("u"),
    )
    stats = u.groupBy("g").agg(
        F.avg("u").alias("mean_u"), F.count(F.lit(1)).alias("cnt")
    ).collect()
    assert all(r.cnt == k for r in stats)
    # per-block mean of k uniforms: sd = 1/sqrt(12k)
    zs = [(r.mean_u - 0.5) * math.sqrt(12 * k) for r in stats]
    z_pool = sum(zs) / math.sqrt(len(zs))
    # pooled 20-bin chi-square over all block positions
    bins = u.select(
        F.least(F.lit(19), (F.col("u") * 20).cast("int")).alias("bin")
    ).groupBy("bin").count().collect()
    counts = {r.bin: r["count"] for r in bins}
    e = blocks * k / 20
    chi2 = sum((counts.get(b, 0) - e) ** 2 / e for b in range(20))
    bound = chi2_bound(19)
    ok = (max(abs(z) for z in zs) < 4.75 and abs(z_pool) < 4.75
          and chi2 < bound)
    _emit({
        "check": "bottom_k_sample", "blocks": blocks, "m": m, "k": k,
        "max_abs_block_z": round(max(abs(z) for z in zs), 2),
        "pooled_z": round(z_pool, 3),
        "chi2_positions": round(chi2, 1), "chi2_bound": round(bound, 1),
        "ok": ok,
    })


def main() -> None:
    spark = build_session(app_name="sample-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    _emit({"probe": "sample_distributions"})
    probe_assign_split(spark)
    probe_mixture_sample(spark)
    probe_stratified_sample(spark)
    probe_bottom_k_sample(spark)
    if FAILURES:
        raise SystemExit(f"FAIL: biased draw in {FAILURES}")
    print(json.dumps({"verdict": "PASS"}), flush=True)


if __name__ == "__main__":
    main()
