#!/bin/bash
# Round-5 TPU worklist, PHASE 5: verify drive for the segmented-NN /
# host-extraction diff, then the config-3 full-pipeline retry (SVM
# gathered folds + NN segmented dispatches + host extraction in place).
set -u
cd /root/repo
A=/root/repo/artifacts/round5
LOG="$A/chip_worklist5.log"

step() {
  local name=$1 to=$2; shift 2
  echo "$(date -u +%FT%TZ) [$name] start" >> "$LOG"
  timeout "$to" "$@" >> "$A/$name.out" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) [$name] rc=$rc" >> "$LOG"
  return $rc
}

step drive_postfix3 3600 python benchmarks/drive_pipeline.py
step config3_pipeline_r05d 10800 python benchmarks/run_configs.py --round 5 --only 3_pipeline
echo "$(date -u +%FT%TZ) phase-5 worklist complete" >> "$LOG"
