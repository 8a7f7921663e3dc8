#!/bin/bash
# The 8-cell hostile-matrix sweep (r8 ritual, scripted r11): every cell
# must end "verdict": "PASS" with oracle_match 50. Run from the repo
# root on an otherwise-idle machine (load skews per-query secs, not
# correctness). Takes ~40-50 min; run under tmux/nohup — each cell is a
# fresh JVM.
set -u
cd "$(dirname "$0")/.."
run() { echo "=== $1"; shift; timeout 900 "$@" 2>&1 | tail -1; }
run "sf0.001"            python tools/driver_sim.py /root/testdata/sf0.001
run "sf0.1"              python tools/driver_sim.py /root/testdata/sf0.1
run "tz=Asia/Kathmandu"  env SPARK_GRAFT_SIM_TZ=Asia/Kathmandu python tools/driver_sim.py /root/testdata/sf0.01
run "local[2]"           env SPARK_GRAFT_SIM_MASTER='local[2]' python tools/driver_sim.py /root/testdata/sf0.01
run "codegen off"        env SPARK_GRAFT_SIM_EXTRA_CONF='spark.sql.codegen.wholeStage=false' python tools/driver_sim.py /root/testdata/sf0.01
run "ansi off"           env SPARK_GRAFT_SIM_EXTRA_CONF='spark.sql.ansi.enabled=false' python tools/driver_sim.py /root/testdata/sf0.01
run "aqe off"            env SPARK_GRAFT_SIM_EXTRA_CONF='spark.sql.adaptive.enabled=false' python tools/driver_sim.py /root/testdata/sf0.01
run "vectorized off"     env SPARK_GRAFT_SIM_EXTRA_CONF='spark.sql.parquet.enableVectorizedReader=false' python tools/driver_sim.py /root/testdata/sf0.01
