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
    assert sum("[oracle]" in l for l in lines) == 49
    assert sum("[rows-only]" in l for l in lines) == 1


def test_cli_query_runs_and_rejects_unknown():
    r = _run("query", "q01_pricing_summary", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "l_returnflag" in r.stdout  # .show() header reached stdout
    bad = _run("query", "no_such_query")
    assert bad.returncode == 2
    assert "unknown query" in bad.stderr
