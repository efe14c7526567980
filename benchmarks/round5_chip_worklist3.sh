#!/bin/bash
# Round-5 TPU worklist, PHASE 3: re-drive after the SVM-memory /
# jit-extract-constant fixes, then re-run the two configs those crashes
# blocked (3_pipeline worker crash, 4_pipeline HTTP 413).
set -u
cd /root/repo
A=/root/repo/artifacts/round5
LOG="$A/chip_worklist3.log"

step() {
  local name=$1 to=$2; shift 2
  echo "$(date -u +%FT%TZ) [$name] start" >> "$LOG"
  timeout "$to" "$@" >> "$A/$name.out" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) [$name] rc=$rc" >> "$LOG"
  return $rc
}

step drive_postfix 3600 python benchmarks/drive_pipeline.py
step config3_pipeline_r05b 10800 python benchmarks/run_configs.py --round 5 --only 3_pipeline
step config4_pipeline_r05b 7200 python benchmarks/run_configs.py --round 5 --only 4_pipeline
echo "$(date -u +%FT%TZ) phase-3 worklist complete" >> "$LOG"
