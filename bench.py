"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Each query is materialized through the `noop` sink so the full plan
executes (collect() would add driver-ser/deser; count() lets Catalyst
prune columns and under-reports scan work).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (  # noqa: E402
    queries as q,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

HEADLINE = [
    # reference surface
    "q01_pricing_summary",
    "q02_enriched_orders",
    "q03_category_kpis",
    "q04_order_kpis_daily",
    "q13_order_completeness",
    "q16_top_brands_by_revenue",
    # event analytics
    "q17_events_hourly",
    "q18_user_sessions",
    # training-data extension ops
    "q24_ngram_jaccard_pairs",
    "q27_cosine_topk",
    "q39_nation_revenue",
    "q53_curated_corpus",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    # Bench tables are single ~1-10 MB parquet files; the default 128 MB
    # split would give 1-3 tasks per scan. Small maxPartitionBytes restores
    # parallelism at this SF (a real cluster with many files keeps 128 MB).
    spark = build_session(
        app_name="engine-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", str(1024 * 1024)
            ),
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    catalog = q.catalog()

    # JVM/codegen warmup on the smallest SF so the measured numbers are
    # steady-state, not JIT noise.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE[:3]:
            catalog[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in catalog:
            continue
        # min of 3 runs: the first run of a plan pays codegen/broadcast
        # warmup, and this machine shows ±30% per-run scheduling noise —
        # the min is the steady-state number a pipeline amortizes to
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            catalog[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
