"""Scale probe: re-run selected catalog queries on key-shifted N×
replicas of the sf0.1 tables and report timing ratios (the SCALING.md
"Measured" evidence). Replication preserves workload character:

- orders/lineitem/events: ids shifted per replica (distinct keys).
- documents: every TOKEN gets a replica suffix, so shingle sets are
  disjoint across replicas — near-dup structure is preserved within a
  replica instead of exploding into cross-replica duplicate pairs.
- embeddings: vec_id shifted; vectors kept (timing is id-agnostic).

Usage: python tools/scale_probe.py [N] [q35_approx_distinct_daily ...]
Writes the N× dataset under /tmp/scale_probe_sfX and prints one JSON
line per query: {"q": ..., "base_s": ..., "scaled_s": ..., "ratio": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (  # noqa: E402
    queries as q,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

BASE = "/root/testdata/sf0.1"
ID_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    # customer replicates WITH orders (ADVICE r15): o_custkey shifts by
    # 1e5 per replica, so c_custkey must shift identically or replica
    # orders reference custkeys absent from customer and any probed
    # query joining orders⋈customer (q75 cohorts, q78/q81 seeds)
    # silently loses replica rows and under-measures scaling
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHIFT = 100_000_000
# Per-column overrides (r15): o_custkey must stay below the q77-family
# node-band boundary (1e7) or the graph probes' edge builder raises its
# band-overflow assertion (and r14's q77 probe, run before the
# assertion existed, silently aliased replica customers into the
# supplier band). 1e5 spacing keeps up to 99 replicas of sf0.1's 15k
# customers distinct AND inside the band (shift only needs to exceed
# the max base custkey). c_custkey mirrors o_custkey (FK integrity).
COLUMN_SHIFT = {"o_custkey": 100_000, "c_custkey": 100_000}


def replicate(spark, n: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in ["region", "nation", "supplier", "part"]:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, ids in ID_COLS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for k in range(n):
            rep = df
            for c in ids:
                rep = rep.withColumn(
                    c, F.col(c) + F.lit(k * COLUMN_SHIFT.get(c, SHIFT))
                )
            if t == "documents":
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.trim("text"), r"\s+"),
                            lambda x: F.concat(x, F.lit(str(k))),
                        ),
                        " ",
                    ),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def time_query(fn, spark, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or [
        "q35_approx_distinct_daily",
        "q29_ann_lsh_topk",
        "q42_ann_ivf_topk",
        "q27_cosine_topk",
        "q24_ngram_jaccard_pairs",
        "q52_train_val_test_split",
        "q17_events_hourly",
        "q18_user_sessions",
    ]
    out_dir = f"/tmp/scale_probe_sf{n}"
    spark = build_session(
        app_name="scale-probe", master="local[32]", shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{out_dir}/embeddings.parquet"):
        replicate(spark, n, out_dir)
    catalog = q.catalog()
    catalog.update({pname: pq.fn for pname, pq in q.parked().items()})
    for name in names:
        base_s = time_query(catalog[name], spark, BASE)
        scaled_s = time_query(catalog[name], spark, out_dir)
        print(json.dumps({
            "q": name, "n": n, "base_s": base_s, "scaled_s": scaled_s,
            "ratio": round(scaled_s / base_s, 2) if base_s else None,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
