#!/bin/bash
# Round-5 TPU worklist, PHASE 1: the baseline captures that must land before
# (and independently of) the round's optimization work, ordered so graded
# artifacts come first if the pool dies again.  Run by the pool watcher on
# the first successful probe; safe to re-run (steps skip on existing
# artifacts — delete the artifact to force).
set -u
cd /root/repo
A=/root/repo/artifacts/round5
mkdir -p "$A"
LOG="$A/chip_worklist.log"
touch /tmp/tpu_busy   # advisory flag: one TPU process at a time
trap 'rm -f /tmp/tpu_busy' EXIT

step() {  # step <name> <artifact-to-skip-on> <timeout-s> <cmd...>
  local name=$1 skip=$2 to=$3; shift 3
  if [ -n "$skip" ] && [ -e "$skip" ]; then
    echo "$(date -u +%FT%TZ) [$name] SKIP (exists: $skip)" >> "$LOG"; return 0
  fi
  echo "$(date -u +%FT%TZ) [$name] start" >> "$LOG"
  timeout "$to" "$@" >> "$A/$name.out" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) [$name] rc=$rc" >> "$LOG"
  return $rc
}

# 1. graded metric rehearsal (also warms the tunnel compile cache)
step bench "$A/bench_capture.txt" 3600 python bench.py \
  && cp "$A/bench.out" "$A/bench_capture.txt"

# 2. CV per-letter re-attribution AT ROUND-4 STATE (VERDICT r4 next #1)
step cv_letters "$A/CV_LETTERS_r05.json" 5400 \
  python benchmarks/cv_letter_bench.py

# 3. baseline end-to-end TIMING at round-4 state (warm: run twice)
if [ ! -e "$A/TIMING_r4state.txt" ]; then
  step timing_warmup "" 7200 python examples/downscale_sampling.py \
      --downsample 1 --out "$A/run_r4state_warmup"
  step timing "" 7200 python examples/downscale_sampling.py \
      --downsample 1 --out "$A/run_r4state" \
    && cp "$A/run_r4state/TIMING.txt" "$A/TIMING_r4state.txt"
fi

echo "$(date -u +%FT%TZ) phase-1 worklist complete" >> "$LOG"
