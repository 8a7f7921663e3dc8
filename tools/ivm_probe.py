"""IVM change-set-size probe (r16, VERDICT r15 #3 done-criterion):
measure refresh_served_agg — the read_changes → incremental_agg_refresh
→ publish composition — against a FULL recompute at a fixed base size
while the change-set size sweeps orders of magnitude.

What it demonstrates (two cells per change size):
- "snapshot" = refresh_served_agg as shipped: the change set is found
  by a keyed full-outer diff of the two generations — two base scans +
  one base-sized join, so cost is FLAT in change size and the diff
  dominates; a full recompute is one scan, so at LOCAL scale with a
  cheap aggregate the full path wins. The snapshot path's 100-TB case
  is scan pruning: changed keys clustered in few files turn both
  semi-join scans into partial reads while the full path reads
  everything.
- "log" = incremental_agg_refresh fed changed_keys directly (the CDC
  regime — a merge source or Delta/Kafka change log already IS the
  key set): no diff, broadcast semi-joins, and the delta AGGREGATION
  shuffles 2·|changes| rows instead of |base| — at high group
  cardinality (the expensive-agg regime) this is where incremental
  beats full even locally.

Run:  python tools/ivm_probe.py [base_rows] [out_dir]
Emits one JSON line per (mode, change-set size):
  {"mode": ..., "base": N, "groups": G, "changes": C,
   "incr_sec": ..., "full_sec": ..., "match": true}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.operators import (  # noqa: E402
    versioned,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivm_probe"
    shutil.rmtree(out, ignore_errors=True)
    spark = build_session(app_name="ivm-probe", master="local[16]",
                          shuffle_partitions=16)
    ks, gs, ss = ["id"], ["grp"], ["cents"]
    n_groups = 200_000  # high cardinality: the expensive-agg regime

    def mk_base(tag: int):
        return spark.range(base_rows).select(
            F.col("id"),
            F.concat(F.lit("g"), (F.col("id") % n_groups)).alias("grp"),
            ((F.col("id") * 37 + tag) % 100_000).cast("long").alias("cents"),
        )

    # warm the JVM so the first cell doesn't carry JIT/codegen cost
    mk_base(0).groupBy("grp").count().write.format("noop").mode(
        "overwrite"
    ).save()

    for changes in (1_000, 10_000, 100_000):
        broot = os.path.join(out, f"base_{changes}")
        aroot = os.path.join(out, f"agg_{changes}")
        versioned.publish(spark, broot, mk_base(0))
        t = versioned.refresh_served_agg(spark, broot, aroot, ks, gs, ss)
        assert t == 0
        # change set: updates on the first `changes` ids (some move
        # group), plus `changes//10` deletes and inserts
        upd = spark.range(changes).select(
            F.col("id"),
            F.concat(F.lit("g"), ((F.col("id") + 7) % n_groups)).alias("grp"),
            F.lit(123).cast("long").alias("cents"),
            F.lit(False).alias("_del"),
        )
        dele = spark.range(changes // 10).select(
            (F.col("id") + base_rows // 2).alias("id"),
            F.lit("x").alias("grp"),
            F.lit(0).cast("long").alias("cents"),
            F.lit(True).alias("_del"),
        )
        ins = spark.range(changes // 10).select(
            (F.col("id") + base_rows + 10).alias("id"),
            F.lit("gnew").alias("grp"),
            F.lit(55).cast("long").alias("cents"),
            F.lit(False).alias("_del"),
        )
        src = upd.unionByName(dele).unionByName(ins)
        prev_agg_gen = versioned.current_version(aroot)  # the SERVED agg
        versioned.merge_versioned(spark, broot, src, ks, delete_col="_del")

        # cell 1: snapshot-diff composition as shipped
        t0 = time.time()
        versioned.refresh_served_agg(spark, broot, aroot, ks, gs, ss)
        incr_snap = time.time() - t0

        # cell 2: log-fed — the change keys are KNOWN (they are the
        # merge source); no diff, just semi-joins + ± delta agg. The
        # old aggregate is the already-SERVED generation (materialized
        # parquet, exactly the production shape).
        old_gen = versioned.current_version(broot) - 1
        t0 = time.time()
        log_fed = versioned.incremental_agg_refresh(
            versioned.read_version(spark, aroot, prev_agg_gen),
            versioned.read_version(spark, broot, old_gen),
            versioned.read_latest(spark, broot),
            ks, gs, ss,
            changed_keys=src.select(*ks),
        )
        log_rows = sorted(tuple(r) for r in log_fed.collect())
        incr_log = time.time() - t0

        t0 = time.time()
        full = versioned.full_agg(versioned.read_latest(spark, broot), gs, ss)
        full_rows = sorted(tuple(r) for r in full.collect())
        full_sec = time.time() - t0
        got = sorted(
            tuple(r)
            for r in versioned.read_latest(spark, aroot).collect()
        )
        print(json.dumps({
            "base": base_rows,
            "groups": n_groups,
            "changes": changes,
            "incr_snapshot_sec": round(incr_snap, 2),
            "incr_logfed_sec": round(incr_log, 2),
            "full_sec": round(full_sec, 2),
            "snapshot_match": got == full_rows,
            "logfed_match": log_rows == full_rows,
        }), flush=True)
    # join-view cells (r16): refresh_served_join with a changing fact
    # side against a full re-join — the view is FACT-sized, so the
    # incremental path's win is never re-joining (or re-WRITING)
    # unchanged pairs; the full path rewrites the whole view every
    # generation. Dim side also changes (both change feeds exercised).
    dim_rows = 100_000
    for changes in (1_000, 10_000, 100_000):
        ra = os.path.join(out, f"jfact_{changes}")
        rb = os.path.join(out, f"jdim_{changes}")
        rv = os.path.join(out, f"jview_{changes}")
        fact = spark.range(base_rows).select(
            F.col("id"),
            (F.col("id") % dim_rows).alias("cust"),
            ((F.col("id") * 13) % 100_000).cast("long").alias("amt"),
        )
        dim = spark.range(dim_rows).select(
            F.col("id").alias("cust"),
            F.concat(F.lit("s"), (F.col("id") % 7)).alias("seg"),
        )
        versioned.publish(spark, ra, fact)
        versioned.publish(spark, rb, dim)
        assert versioned.refresh_served_join(
            spark, ra, rb, rv, ["id"], ["cust"], ["cust"]
        ) == 0
        fupd = spark.range(changes).select(
            F.col("id"),
            ((F.col("id") + 3) % dim_rows).alias("cust"),  # key moves
            F.lit(999).cast("long").alias("amt"),
        )
        dupd = spark.range(changes // 10).select(
            F.col("id").alias("cust"), F.lit("sX").alias("seg")
        )
        versioned.merge_versioned(spark, ra, fupd, ["id"])
        versioned.merge_versioned(spark, rb, dupd, ["cust"])
        t0 = time.time()
        versioned.refresh_served_join(
            spark, ra, rb, rv, ["id"], ["cust"], ["cust"]
        )
        incr_sec = time.time() - t0
        # the full path PUBLISHES too — both cells pay the view write,
        # so the delta is purely join-work avoided
        rf = os.path.join(out, f"jfull_{changes}")
        t0 = time.time()
        versioned.publish(
            spark,
            rf,
            versioned.full_join_view(
                versioned.read_latest(spark, ra),
                versioned.read_latest(spark, rb),
                ["cust"],
            ),
        )
        full_sec = time.time() - t0
        full_cnt, full_sum = versioned.read_latest(spark, rf).agg(
            F.count(F.lit(1)), F.sum(F.col("amt") * F.length("seg"))
        ).collect()[0]
        got_cnt, got_sum = versioned.read_latest(spark, rv).agg(
            F.count(F.lit(1)), F.sum(F.col("amt") * F.length("seg"))
        ).collect()[0]
        print(json.dumps({
            "mode": "join_view",
            "base": base_rows,
            "dim": dim_rows,
            "changes": changes,
            "incr_sec": round(incr_sec, 2),
            "full_sec": round(full_sec, 2),
            "match": (got_cnt, got_sum) == (full_cnt, full_sum),
        }), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
