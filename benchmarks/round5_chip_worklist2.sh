#!/bin/bash
# Round-5 TPU worklist, PHASE 2: the scale captures VERDICT r4 next #2-#4
# asked to MEASURE for real (no extrapolation), cheapest/graded-first so
# artifacts land even if the pool dies.  One TPU process at a time; each
# step appends to artifacts/round5 and results_r05.json incrementally.
set -u
cd /root/repo
A=/root/repo/artifacts/round5
mkdir -p "$A"
LOG="$A/chip_worklist2.log"

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "$(date -u +%FT%TZ) [$name] start" >> "$LOG"
  timeout "$to" "$@" >> "$A/$name.out" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) [$name] rc=$rc" >> "$LOG"
  return $rc
}

# 1. forest production re-capture (async checksum stream; target >= 40)
step forest_r05 2400 python benchmarks/run_configs.py --round 5 --only forest

# 2. north-star config 4 at the LITERAL 100k stations
step config4_r05 3600 python benchmarks/run_configs.py --round 5 --only 4

# 3. config 5: measured FULL 1 Gcell surface
step config5_r05 3600 python benchmarks/run_configs.py --round 5 --only 5

# 4. config 3 solve (fresh round-5 row)
step config3_r05 3600 python benchmarks/run_configs.py --round 5 --only 3

# 5. config 3 through the FULL pipeline: 10k stations x 19 responses
step config3_pipeline_r05 10800 python benchmarks/run_configs.py --round 5 --only 3_pipeline

# 6. config 4 tiled pipeline, reduced CV (round-4 comparable row)
step config4_pipeline_r05 7200 python benchmarks/run_configs.py --round 5 --only 4_pipeline

echo "$(date -u +%FT%TZ) phase-2 worklist complete" >> "$LOG"
