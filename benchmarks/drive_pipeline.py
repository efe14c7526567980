import sys, time, json, os
sys.path.insert(0, "/root/repo")
import machisplin_tpu as mt
from machisplin_tpu.data import load_sampling, synthetic_covariates
from machisplin_tpu.utils.timing import PhaseTimer

timer = PhaseTimer()
t0 = time.time()
out = mt.mltps(load_sampling(), synthetic_covariates(downsample=1), tps=True,
               timer=timer)
wall = time.time() - t0
for lay in out:
    print({k: lay.summary[k] for k in lay.summary})
print(f"WALL {wall:.1f}s")
tot = 0.0
for name, secs in timer.items() if hasattr(timer, "items") else timer.phases.items():
    print(f"  {name:<36s} {secs:7.2f}")
    tot += secs
print(f"  TOTAL {tot:.2f}")
