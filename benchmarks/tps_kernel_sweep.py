"""Sweep the TPS grid kernel's tile parameters on the real chip.

Exposes what bench.py's single configuration can't: how kernel throughput
scales with knot count, cell-block size, knot-chunk size, response count,
and the phi@c contraction style (MXU dot vs VPU multiply-reduce for R=1).
Run (axon TPU env):  python benchmarks/tps_kernel_sweep.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from machisplin_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    print("backend:", jax.default_backend(), flush=True)

    def make_kernel(block, chunk, n_pad, n_resp, ncols, vpu_contract):
        def kern(geo_ref, ktab_ref, c_ref, d_ref, out_ref):
            xmin, dx, ymax, dy = 0.0, 1e-3, 1.0, 1e-3
            sx0, sx1 = geo_ref[0, 0], geo_ref[1, 0]
            sy0, sy1 = geo_ref[2, 0], geo_ref[3, 0]
            i = pl.program_id(0)
            flat = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
            row = flat // ncols
            col = flat - row * ncols
            gx = xmin + (col.astype(jnp.float32) + 0.5) * dx
            gy = ymax - (row.astype(jnp.float32) + 0.5) * dy
            px = (gx - sx0) / sx1
            py = (gy - sy0) / sy1
            ones = jnp.ones_like(px)
            zeros = jnp.zeros_like(px)
            a = jnp.concatenate([px, py, ones] + [zeros] * 5, axis=1)
            acc = jnp.zeros((block, n_resp), jnp.float32)

            def body(k, acc):
                kx = ktab_ref[0:1, pl.ds(k * chunk, chunk)]
                ky = ktab_ref[1:2, pl.ds(k * chunk, chunk)]
                ddx = px - kx
                ddy = py - ky
                r2 = ddx * ddx + ddy * ddy
                phi = 0.5 * r2 * jnp.log(jnp.maximum(r2, 1e-37))
                cc = c_ref[pl.ds(k * chunk, chunk), :]
                if vpu_contract:
                    s = jnp.sum(phi * cc[:, 0][None, :], axis=1, keepdims=True)
                    return acc + s
                return acc + jnp.dot(
                    phi, cc, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            acc = jax.lax.fori_loop(0, n_pad // chunk, body, acc)
            out_ref[:] = acc + jnp.dot(
                a, d_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return kern

    @functools.partial(jax.jit, static_argnames=("block", "chunk", "n_pad", "n_resp", "cells", "vpu"))
    def run(ktab, c, d, *, block, chunk, n_pad, n_resp, cells, vpu):
        ncols = 3264
        geo = jnp.asarray([[0.0], [1.0], [0.0], [1.0]], jnp.float32)
        kern = make_kernel(block, chunk, n_pad, n_resp, ncols, vpu)
        out = pl.pallas_call(
            kern,
            grid=(cells // block,),
            in_specs=[
                pl.BlockSpec((4, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((8, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_pad, n_resp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, n_resp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block, n_resp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cells, n_resp), jnp.float32),
        )(geo, ktab, c, d)
        return jnp.nansum(out)

    cells = 4 * 1024 * 1024
    rng = np.random.default_rng(0)
    for n_pad in (896, 2048):
        ktab = jnp.asarray(np.pad(rng.uniform(0, 1, (2, n_pad)), ((0, 6), (0, 0))), jnp.float32)
        for n_resp in (1, 2):
            c = jnp.asarray(rng.standard_normal((n_pad, n_resp)) * 10, jnp.float32)
            d = jnp.asarray(rng.standard_normal((8, n_resp)), jnp.float32)
            for block in (1024, 2048):
                for chunk in (128, 256, 512):
                    if chunk > n_pad or n_pad % chunk:
                        continue
                    for vpu in ((False, True) if n_resp == 1 else (False,)):
                        kw = dict(block=block, chunk=chunk, n_pad=n_pad,
                                  n_resp=n_resp, cells=cells, vpu=vpu)
                        try:
                            float(run(ktab, c, d, **kw))  # compile
                            t0 = time.time(); float(run(ktab, c, d, **kw)); dt1 = time.time() - t0
                            t0 = time.time()
                            s = None
                            for _ in range(5):
                                t = run(ktab, c, d, **kw)
                                s = t if s is None else s + t
                            float(s)
                            dt5 = time.time() - t0
                            dt = max((dt5 - dt1) / 4, 1e-9)
                            print(f"n_pad {n_pad:5d} R {n_resp} block {block:5d} chunk {chunk:4d} "
                                  f"vpu {int(vpu)}: {cells/dt/1e6:8.1f} Mcells/s "
                                  f"({cells*n_pad/dt:.3g} logs/s)", flush=True)
                        except Exception as e:
                            print(f"n_pad {n_pad} R {n_resp} block {block} chunk {chunk} vpu {int(vpu)}: "
                                  f"FAIL {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
