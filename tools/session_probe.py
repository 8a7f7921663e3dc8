"""GroupState session-tracker scale probe (r14, VERDICT r13 #5):
measure ``tracked_sessions_gs`` — both the eager default and the
watermark-correct ``exact_close=True`` fold — at 1x and 10x event
volume with many concurrent users, and verify EXACTNESS against the
batch lag/gap twin at every scale (a probe that only times an
operator can't tell "fast" from "fast and wrong").

Scale axes and what they exercise:

- Users scale 10x at fixed events-per-user: state rows scale with
  ACTIVE users (the realistic growth axis — the per-key fold cost is
  constant); the Arrow fold's Python cost is ~(rows + groups) per
  batch, shuffled only on user_id.
- STATE BOUNDS, stated: the eager fold keeps ONE fixed-width tuple
  (start, last, n) per active user — O(active users), independent of
  history. exact_close keeps a PENDING list per user: sessions whose
  horizon (last + gap) the watermark has not yet passed. With
  time-ordered arrivals the watermark trails the max event time by
  the watermark delay, so the bound is (sessions per user whose
  horizon is within [wm, wm + delay + gap]) — for this workload's
  ~80-minute session cycle and 1h delay, <= 2-3 pending sessions per
  user; the probe REPORTS the batch-derived max open+pending count
  per wave so the bound is measured, not asserted from theory.

Each run: W time-ordered waves (cross-batch state carry, no
below-watermark drops by construction) + a far-future sentinel wave
that flushes every real session by timeout. Exactness: streamed
closed sessions == batch lag/gap sessionization at full (user, start,
end, n) grain, for BOTH folds (time-ordered arrivals are the regime
where eager == watermark-correct; the disorder regimes are pinned by
the unit/property tests).

Usage: python tools/session_probe.py [users_1x] [events_per_user]
Prints one JSON line per (fold, scale); exits nonzero on mismatch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.session import (  # noqa: E402
    build_session,
)
from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.streaming.state import (  # noqa: E402
    tracked_sessions_gs,
)

GAP_MIN = 30
GAP_US = GAP_MIN * 60 * 1_000_000
B_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
SCHEMA = "event_id long, ts_us long, user_id long"


def _events(spark, n_users: int, per_user: int):
    """Deterministic workload: per user, events advance ~10 min with a
    per-(user, i) hash jitter < 5 min; every 8th event jumps 90 min —
    beyond the 30-min gap, so each user cycles through sessions of ~7
    events. All users share the timeline (time-ordered wave splits)."""
    base_step = 10 * 60 * 1_000_000
    jump = 90 * 60 * 1_000_000
    df = spark.range(n_users * per_user).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        (F.col("id") / n_users).cast("long").alias("i"),
    )
    cum = (
        F.col("i") * base_step
        + (F.col("i") / 8).cast("long") * jump
        + F.pmod(F.xxhash64("user_id", "i"), F.lit(300_000_000))
    )
    return df.select(
        "event_id", (F.lit(B_US) + cum).alias("ts_us"), "user_id"
    )


def _batch_sessions(ev_df):
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = (
        ev_df.withColumn("_prev", F.lag("ts_us").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull()
                | (F.col("ts_us") - F.col("_prev") > GAP_US),
                1,
            ).otherwise(0),
        )
        .withColumn("_sid", F.sum("_new").over(w))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in s.collect()
    )


def probe(spark, n_users: int, per_user: int, exact_close: bool,
          n_waves: int = 3) -> dict:
    ev = _events(spark, n_users, per_user).cache()
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).collect()[0]
    cuts = [lo + (hi - lo + 1) * (i + 1) // n_waves for i in range(n_waves)]
    sentinel = [(10**9, hi + 6 * 3600 * 1_000_000, -1)]

    root = tempfile.mkdtemp(prefix="session_probe_")
    src = os.path.join(root, "ev")
    ck = os.path.join(root, "ck")
    os.makedirs(src)
    out_rows = []
    wave_secs, open_bounds = [], []
    prev = lo
    waves = []
    for c in cuts:
        waves.append(ev.filter((F.col("ts_us") >= prev) & (F.col("ts_us") < c)))
        prev = c
    for i, wdf in enumerate(waves + [None]):
        if wdf is None:
            spark.createDataFrame(sentinel, SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, "sentinel"))
        else:
            wdf.write.mode("overwrite").parquet(os.path.join(src, f"w{i}"))
            # batch-derived state bound at this wave's end: watermark =
            # max_ts - 1h delay; open/pending = sessions with horizon
            # (end + gap) > wm among events so far
            so_far = ev.filter(F.col("ts_us") < cuts[i])
            wm = cuts[i] - 3600 * 1_000_000
            n_open = sum(
                1 for (_, _s, e, _n) in _batch_sessions(so_far)
                if e + GAP_US > wm
            )
            open_bounds.append(n_open)
        t0 = time.perf_counter()
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .parquet(src + "/*")
            .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        )
        q = (
            tracked_sessions_gs(
                stream, gap_minutes=GAP_MIN, watermark="1 hour",
                exact_close=exact_close,
            )
            .writeStream.foreachBatch(
                lambda b, _bid: out_rows.extend(b.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wave_secs.append(round(time.perf_counter() - t0, 2))

    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in out_rows
        if r.user_id != -1
    )
    want = _batch_sessions(ev)
    ev.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "fold": "exact_close" if exact_close else "eager",
        "users": n_users, "events": n_users * per_user,
        "sessions": len(want), "streamed_matches_batch": got == want,
        "wave_secs": wave_secs, "total_secs": round(sum(wave_secs), 2),
        "max_open_sessions_at_wave_end": max(open_bounds),
        "open_per_user": round(max(open_bounds) / n_users, 3),
    }


def main() -> None:
    users_1x = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = build_session(app_name="session-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"probe": "session_tracker", "users_1x": users_1x,
                      "per_user": per_user}), flush=True)
    fails = []
    for exact in (False, True):
        r1 = probe(spark, users_1x, per_user, exact)
        print(json.dumps({**r1, "scale": "1x"}), flush=True)
        r10 = probe(spark, users_1x * 10, per_user, exact)
        r10["ratio_10x"] = round(r10["total_secs"] / max(r1["total_secs"], 1e-9), 2)
        print(json.dumps({**r10, "scale": "10x"}), flush=True)
        for r in (r1, r10):
            if not r["streamed_matches_batch"]:
                fails.append(r["fold"])
    if fails:
        raise SystemExit(f"FAIL: streamed != batch for {fails}")
    print(json.dumps({"verdict": "PASS"}), flush=True)


if __name__ == "__main__":
    main()
