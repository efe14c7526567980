"""Where does the graded bench's 59 ms TPS solve go?

BENCH_r02: solve 0.0591 s + kernel 0.0278 s over 8.08 Mcells -> 91.1
Mcells/s headline.  The solve is 2/3 of the wall, so this profiles its
pieces on the real chip (813 stations x 2 responses, the bundled shape):

  a. pairwise phi kernel assembly            (n^2 VPU work)
  b. complete QR of the (n, 3) null space    (Householder, n x n Q)
  c. the two projection matmuls Q2' K Q2     (2 x n^3 HIGHEST matmuls)
  d. eigh of the (n-3) projected kernel      (XLA QDWH spectral D&C)
  e. GCV grid + 40-step golden refine        (tiny, but 40 sequential steps)
  f. coefficient solve at fixed lambda       (back-substitution + matmuls)

Each piece is timed as its own jitted program taking its inputs as real
arguments (NOT baked-in constants) with one scalar readback; slope timing
(k=1 vs k=5 async applications) cancels the axon tunnel's fixed readback
cost.  Run on the real TPU:  python benchmarks/profile_solve.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def slope_time(run, k_lo=1, k_hi=5):
    """Best-of-3 slope timing: run(k) does k async applications + 1 readback."""
    run(k_lo)  # compile
    run(k_hi)

    def best(k):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max((best(k_hi) - best(k_lo)) / (k_hi - k_lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from machisplin_tpu.ops.tps import (
        _gcv_search, _pairwise_r2, _phi, tps_factor, tps_fit, tps_solve,
    )

    data = np.genfromtxt(
        os.path.join(os.path.dirname(__file__), "..",
                     "machisplin_tpu", "data", "sampling.csv"),
        delimiter=",", names=True)
    coords = jnp.asarray(np.stack([data["long"], data["lat"]], 1), jnp.float32)
    ys = jnp.asarray(np.stack([data["bio_1"], data["bio_12"]], 1), jnp.float32)
    n = coords.shape[0]

    # precomputed stage inputs (device arrays, passed as jit ARGUMENTS)
    with jax.default_matmul_precision("highest"):
        factor = tps_factor(coords)
        x = factor.knots
        k_mat = _phi(_pairwise_r2(x, x), jnp.float32)
        t_mat = jnp.concatenate([jnp.ones((n, 1), jnp.float32), x], axis=1)
        q_full, _ = jnp.linalg.qr(t_mat, mode="complete")
        q2 = q_full[:, 3:]
        m_proj = q2.T @ k_mat @ q2
        m_proj = 0.5 * (m_proj + m_proj.T)
    float(jnp.nansum(m_proj))  # settle

    def timed(jf, *args):
        def run(k):
            s = None
            for _ in range(k):
                t = jnp.nansum(jf(*args))
                s = t if s is None else s + t
            return float(s)
        return slope_time(run)

    hi = {"precision": "highest"}

    def _hp(f):
        def g(*a):
            with jax.default_matmul_precision("highest"):
                return f(*a)
        return jax.jit(g)

    pieces = {}
    pieces["full_tps_fit"] = timed(jax.jit(lambda c, y: tps_fit(c, y).c), coords, ys)
    pieces["a_kernel_assembly"] = timed(
        _hp(lambda c: _phi(_pairwise_r2(c, c), jnp.float32)), x)
    pieces["b_complete_qr"] = timed(
        _hp(lambda t: jnp.linalg.qr(t, mode="complete")[0]), t_mat)
    pieces["c_projection_matmuls"] = timed(
        _hp(lambda k, q: q.T @ (k @ q)), k_mat, q2)
    pieces["d_eigh"] = timed(
        _hp(lambda m: jnp.linalg.eigh(m)[1]), m_proj)
    pieces["e_gcv_search"] = timed(
        _hp(lambda f, y: _gcv_search(f, (f.q2u.T @ y).T, 200, 40)), factor, ys)
    pieces["f_solve_fixed_lam"] = timed(
        jax.jit(lambda f, y: tps_solve(f, y, lam=1e-6).c), factor, ys)

    out = {k: round(v * 1e3, 3) for k, v in pieces.items()}
    out["n"] = int(n)
    out["backend"] = jax.default_backend()
    out.update(hi)
    print(json.dumps(out))
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts", "round3")
    os.makedirs(art, exist_ok=True)
    with open(os.path.join(art, "SOLVE_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
