"""CLI surface (python -m <pkg> ...): the operational entry points work
end-to-end as real subprocesses (arg parsing, catalog wiring, exit
codes) — previously only driven manually."""

from __future__ import annotations

import subprocess
import sys

PKG = "lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark"


def _run(*args: str, timeout: int = 300):
    return subprocess.run(
        [sys.executable, "-m", PKG, *args],
        capture_output=True, text=True, timeout=timeout, cwd="/root/repo",
    )


def test_cli_list_shows_full_catalog():
    r = _run("list")
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert len(lines) == 50
    assert sum("[oracle]" in l for l in lines) == 50
    assert sum("[rows-only]" in l for l in lines) == 0


def test_cli_query_runs_and_rejects_unknown():
    r = _run("query", "q01_pricing_summary", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "l_returnflag" in r.stdout  # .show() header reached stdout
    bad = _run("query", "no_such_query")
    assert bad.returncode == 2
    assert "unknown query" in bad.stderr


def test_cli_sql_adhoc_over_registered_views():
    """The sql subcommand registers every parquet table in --sf-dir as
    a temp view and hands the statement to Catalyst — the ad-hoc
    surface for anything the catalog doesn't pre-package."""
    r = _run(
        "sql",
        "SELECT r_name, COUNT(*) AS n FROM region "
        "JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name",
        "--sf-dir", "/root/testdata/sf0.001",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "r_name" in r.stdout and "AFRICA" in r.stdout


def test_bench_headline_queries_exist():
    """r2 lost its recorded bench number to a query that raised at plan
    time — pin that every HEADLINE name resolves in the catalog (the
    full run is the driver's job, not the suite's)."""
    import bench
    from lab6_real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.plans import (
        queries as q,
    )

    catalog = q.catalog()
    missing = [n for n in bench.HEADLINE if n not in catalog]
    assert not missing, missing


def test_driver_contract_shape():
    """__spark_entry__ exports: every oracle key is a query key, and
    the catalog is exactly the 50 the driver gates."""
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert len(qs) == 50
    assert set(os_) <= set(qs)
    assert len(os_) == 50  # r4: q37's end state gained an exact oracle


def test_driver_sim_comparator_dtype_semantics():
    """tools/driver_sim._norm_cell is the local twin of the driver's
    pandas value hash. Pin the r7 semantics that caught/closed the q20
    class: int and float cells DIFFER even at equal value (int64 1 vs
    HUGEINT->float64 1.0), numpy widths collapse to value (int32 5 ==
    int64 5), dates equal midnight datetimes (Spark date vs DuckDB
    datetime64 — matched by the real gate in r1-r6), and Decimal stays
    distinct from float (the r1 q43 class must keep mismatching)."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    sys.path.insert(0, "/root/repo/tools")
    from driver_sim import _norm_cell

    assert _norm_cell(1) != _norm_cell(1.0)
    assert _norm_cell(np.int64(1)) != _norm_cell(np.float64(1.0))
    assert _norm_cell(np.int32(5)) == _norm_cell(np.int64(5)) == _norm_cell(5)
    assert _norm_cell(datetime.date(1995, 1, 1)) == _norm_cell(
        pd.Timestamp("1995-01-01 00:00:00")
    )
    assert _norm_cell(datetime.date(1995, 1, 1)) != _norm_cell(
        pd.Timestamp("1995-01-01 00:00:01")
    )
    assert _norm_cell(decimal.Decimal("1.5")) != _norm_cell(1.5)
    assert _norm_cell(None) == _norm_cell(pd.NaT) == "NULL"
    assert _norm_cell(float("nan")) == "NaN"
    assert _norm_cell(np.bool_(True)) == _norm_cell(True)
    # floats compare EXACT (r8): the real driver hashes exact float64s,
    # so 0.30000000000000004 must NOT collapse to 0.3, and even a
    # single-ulp divergence must be detected (the sim's whole job is
    # matching the real gate's sensitivity)
    assert _norm_cell(0.1 + 0.2) != _norm_cell(0.3)
    assert _norm_cell(0.25) == _norm_cell(np.float64(0.25))
    import math as _math

    assert _norm_cell(1.0) != _norm_cell(_math.nextafter(1.0, 2.0))
