#!/bin/bash
# Sequential TPU measurement queue (one python/jax process at a time —
# 1-core box; see .claude/skills/verify/SKILL.md).  Each stage logs to
# /tmp/tpuq/<stage>.log and appends a STATUS line to /tmp/tpuq/queue.log.
set -u
mkdir -p /tmp/tpuq
Q=/tmp/tpuq/queue.log
cd /root/repo

stage() {
  name=$1; budget=$2; shift 2
  echo "[$(date +%H:%M:%S)] START $name" >> "$Q"
  timeout "$budget" "$@" > "/tmp/tpuq/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] END $name rc=$?" >> "$Q"
}

stage dissect      3600 python scripts/msm_dissect.py
stage bench        3600 env BENCH_BUDGET_S=3000 python bench.py
stage prover17t    5400 python tools/prover_bench.py 17 turbo
stage prover17u    5400 python tools/prover_bench.py 17 ultra
stage perf_probe   3600 python tools/perf_probe.py
stage tower        10000 python tools/rollup_tower.py 1
echo "[$(date +%H:%M:%S)] QUEUE DONE" >> "$Q"
