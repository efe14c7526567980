#!/bin/bash
# Round-5 pool watcher: probe the axon TPU pool every ~7 min; on the first
# successful probe, run the phase-1 chip worklist.  (Round-3/4 pattern: the
# pool has whole-outage windows of an hour or more where even `import jax`
# plus one eager op hangs.)
set -u
cd /root/repo
A=/root/repo/artifacts/round5
mkdir -p "$A"
LOG="$A/pool_watch.log"
echo "$(date -u +%FT%TZ) watcher start" >> "$LOG"
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
print('probe ok', float(jnp.nansum(jnp.ones((8,128)))), jax.default_backend())
" >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) pool UP — running phase-1 worklist" >> "$LOG"
    bash benchmarks/round5_chip_worklist.sh
    echo "$(date -u +%FT%TZ) phase-1 worklist done" >> "$LOG"
    break
  fi
  echo "$(date -u +%FT%TZ) pool still down" >> "$LOG"
  sleep 180
done
