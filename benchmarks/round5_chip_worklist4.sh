#!/bin/bash
# Round-5 TPU worklist, PHASE 4: verify drive for the scale-fix diff, the
# config-3 pipeline retry (now with per-letter INFO logs + bag-draw memory
# bound), the graded captures (forest best-of-3, final warm TIMING, bench
# rehearsal), then the long reference-hyperparameter 4-tile run.
set -u
cd /root/repo
A=/root/repo/artifacts/round5
LOG="$A/chip_worklist4.log"

step() {
  local name=$1 to=$2; shift 2
  echo "$(date -u +%FT%TZ) [$name] start" >> "$LOG"
  timeout "$to" "$@" >> "$A/$name.out" 2>&1
  local rc=$?
  echo "$(date -u +%FT%TZ) [$name] rc=$rc" >> "$LOG"
  return $rc
}

step drive_postfix2 3600 python benchmarks/drive_pipeline.py
step config3_pipeline_r05c 10800 python benchmarks/run_configs.py --round 5 --only 3_pipeline
step forest_r05b 2400 python benchmarks/run_configs.py --round 5 --only forest
step timing_final_warmup 7200 python examples/downscale_sampling.py --downsample 1 --out "$A/run_final_warmup"
step timing_final 7200 python examples/downscale_sampling.py --downsample 1 --out "$A/run_final" \
  && cp "$A/run_final/TIMING.txt" "$A/TIMING_FINAL_r05.txt"
# ADVICE r4: repeat timing runs keep only the small text outputs — the
# representative raster pair is already in artifacts/round4
rm -f "$A"/run_final_warmup/*.tif "$A"/run_final/*.tif

step bench_rehearsal 3600 python bench.py
step config4_pipeline_full_r05 14400 python benchmarks/run_configs.py --round 5 --only 4_pipeline_full
echo "$(date -u +%FT%TZ) phase-4 worklist complete" >> "$LOG"
