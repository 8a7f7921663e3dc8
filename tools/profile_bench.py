"""Profile the bench headline queries under the EXACT bench session.

For each headline query:
  - dump .explain("formatted") to plans/r17/<name>_<tag>.txt
  - time DataFrame construction (py4j/analysis) vs noop execution,
    3 runs each, and print per-query rows.

Usage: python tools/profile_bench.py [tag]   (tag defaults to "before")
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (  # noqa: E402
    queries as q,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)

import bench  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(
        app_name="engine-bench-profile",
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

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in bench.HEADLINE[:3]:
            catalog[name](spark, warm_dir).write.format("noop").mode("overwrite").save()

    print(f"{'query':<28} {'build_ms':>9} {'exec1_ms':>9} {'exec2_ms':>9} {'exec3_ms':>9}")
    for name in names:
        if name not in catalog:
            continue
        builds, execs = [], []
        for i in range(3):
            t0 = time.perf_counter()
            df = catalog[name](spark, sf_dir)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append((t1 - t0) * 1000)
            execs.append((t2 - t1) * 1000)
            if i == 0:
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:<28} {min(builds):>9.0f} {execs[0]:>9.0f} {execs[1]:>9.0f} {execs[2]:>9.0f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
