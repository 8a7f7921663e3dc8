"""Fresh-process driver simulation: run EVERY catalog query through the
__spark_entry__ contract the way the driver does — vanilla SparkSession
(hostile non-UTC timezone), sf0.01, DuckDB oracle side-by-side, pandas-
canonicalized order-insensitive value compare — and print one JSON
summary per query plus a final verdict line.

Usage:  python tools/driver_sim.py [sf_dir]      (default sf0.01)

This is the pre-flight for a round close: tests/test_parity.py covers
the same ground inside the repo's tuned session; THIS script covers it
under the driver's conditions (default configs, fresh JVM, unknown tz).

r7: comparison goes through PANDAS on both sides — Spark `toPandas()`
vs DuckDB `.df()` — exactly like the real driver. The r6 fetchall()
comparator was dtype-blind: DuckDB returns a HUGEINT (window SUM of
BIGINT) as a Python int via fetchall() but as float64 via .df(), so
the q20 oracle-dtype bug passed three local sims while failing the
round gate. Integer cells normalize to `repr(int)` and floats to
`repr(float)` — "1" vs "1.0" — so any int-vs-float dtype divergence
between the engines now mismatches here too.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import numpy as np
    import pandas as pd

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT repr (shortest round-trip == bit-exact for float64):
        # the real driver's pandas value hash compares exact float64s,
        # so the sim must too (r7 ADVICE — the old repr(round(v, 9))
        # was blind to sub-9dp drift). The repo's exact-sum /
        # integerize-before-rank rules are what make values
        # bit-identical across engines; this now verifies them.
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # faithful to the driver: Decimal objects (Spark toPandas) vs
        # float64 (DuckDB .df) MUST mismatch — don't coerce.
        return f"Decimal({v})"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # Spark toPandas() gives datetime.date for DateType while DuckDB
        # .df() gives a midnight Timestamp — the real driver matched
        # DATE columns across engines every round (q02/q04/q36/... all
        # green in r1-r6), so canonicalize date == midnight datetime.
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return repr(v)


def _pandas_rows(pdf):
    """pandas DataFrame -> list of row tuples (the driver's view)."""
    return [tuple(rec) for rec in pdf.itertuples(index=False, name=None)]


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark_builder = (
        SparkSession.builder.master(
            # SPARK_GRAFT_SIM_MASTER sweeps parallelism: exact-integer/
            # decimal aggregation discipline means results must be
            # IDENTICAL at any partitioning (a raw double sum would
            # differ in the last ulp between local[2] and local[32])
            os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
        )
        # hostile probe: driver session tz is unknown; results must be
        # tz-invariant (testdata timestamps are NTZ). Override with
        # SPARK_GRAFT_SIM_TZ to sweep nastier offsets (e.g.
        # Asia/Kathmandu's +05:45).
        .config(
            "spark.sql.session.timeZone",
            os.environ.get("SPARK_GRAFT_SIM_TZ", "America/New_York"),
        )
    )
    # SPARK_GRAFT_SIM_EXTRA_CONF="k=v;k=v" sweeps engine-mode axes the
    # results must be invariant to: ANSI on/off, whole-stage codegen
    # off (interpreted expression eval must agree with generated code),
    # AQE off (plan reshaping must not change values).
    for kv in os.environ.get("SPARK_GRAFT_SIM_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, _, v = kv.partition("=")
            spark_builder = spark_builder.config(k.strip(), v.strip())
    spark = (
        spark_builder
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import time

    qs = entry.queries()
    oracles = entry.oracle_sql()
    # SPARK_GRAFT_SIM_PARKED=1 also sweeps the PARKED (gate-ready,
    # unslotted) queries under the identical comparator — they hold
    # themselves to the gate's bar even while holding no slot (r12).
    if os.environ.get("SPARK_GRAFT_SIM_PARKED"):
        from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
            queries as _plans_q,
        )

        for pname, pq in _plans_q.parked().items():
            qs[pname] = pq.fn
            if pq.oracle is not None:
                oracles[pname] = pq.oracle
    # SPARK_GRAFT_SIM_ONLY="q73,q77" — comma-separated name prefixes to
    # spot-check a change's blast radius fast; full sweeps (no filter)
    # remain the closeout bar.
    only = [
        p.strip()
        for p in os.environ.get("SPARK_GRAFT_SIM_ONLY", "").split(",")
        if p.strip()
    ]
    if only:
        qs = {
            n: f for n, f in qs.items() if any(n.startswith(p) for p in only)
        }
    n_match = n_rows_only = n_fail = 0
    for name in sorted(qs):
        rec = {"q": name}
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
            srows = _pandas_rows(spdf)
            oracle = oracles.get(name)
            if oracle is None:
                rec["status"] = f"rows_only({len(srows)})"
                n_rows_only += 1
            else:
                opdf = con.execute(oracle).df()
                ocols = list(opdf.columns)
                orows = _pandas_rows(opdf)
                if sorted(sdf.columns) != sorted(ocols):
                    rec["status"] = "SCHEMA_MISMATCH"
                    rec["spark_cols"] = sorted(sdf.columns)
                    rec["oracle_cols"] = sorted(ocols)
                    n_fail += 1
                elif len(srows) != len(orows):
                    rec["status"] = f"ROWS_MISMATCH({len(srows)} vs {len(orows)})"
                    n_fail += 1
                else:
                    a = _normalize(srows, sdf.columns)
                    b = _normalize(orows, ocols)
                    if a == b:
                        rec["status"] = f"MATCH({len(srows)})"
                        n_match += 1
                    else:
                        rec["status"] = "VALUE_MISMATCH"
                        rec["first_diffs"] = [
                            [x, y] for x, y in zip(a, b) if x != y
                        ][:3]
                        n_fail += 1
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            rec["status"] = "ERROR"
            rec["err"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        rec["secs"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "verdict": "PASS" if n_fail == 0 else "FAIL",
                "oracle_match": n_match,
                "rows_only": n_rows_only,
                "failures": n_fail,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
