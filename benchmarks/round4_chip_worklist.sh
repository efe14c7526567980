#!/bin/bash
# Round-4 TPU worklist: everything that needs the real chip, ordered so the
# graded artifacts land first if the pool dies again mid-run.  Run by the
# pool watcher as soon as a probe succeeds; safe to re-run (steps skip when
# their artifact already exists — delete the artifact to force a re-run).
set -u
cd /root/repo
A=/root/repo/artifacts/round4
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

# 1. graded metric rehearsal
step bench "$A/bench_capture.txt" 3600 python bench.py \
  && cp "$A/bench.out" "$A/bench_capture.txt"

# 2. end-to-end TIMING (run twice: first warms the persistent cache)
if [ ! -e "$A/TIMING.txt" ]; then
  step timing_warmup "" 7200 python examples/downscale_sampling.py \
      --downsample 1 --out "$A/run1"
  step timing "" 7200 python examples/downscale_sampling.py \
      --downsample 1 --out "$A/run2" \
    && cp "$A/run2/TIMING.txt" "$A/TIMING.txt"
fi

# 3. forest kernel sweep (dtype x tiling)
step forest_sweep "/root/repo/benchmarks/forest_kernel_sweep.json" 5400 \
  python benchmarks/forest_kernel_sweep.py

# 4. BASELINE config suite -> benchmarks/results_r04.json
step configs "/root/repo/benchmarks/results_r04.json.done" 14400 \
  python benchmarks/run_configs.py --round 4 \
  && touch /root/repo/benchmarks/results_r04.json.done

# 5. config-4 pipeline at REFERENCE hyperparams (longest; one tile + arithmetic)
step config4_full "$A/config4_full.done" 21600 \
  python benchmarks/run_configs.py --round 4 --only 4_pipeline_full \
  && touch "$A/config4_full.done"

echo "$(date -u +%FT%TZ) worklist complete" >> "$LOG"
