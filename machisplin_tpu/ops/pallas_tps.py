"""Pallas TPU kernel for TPS grid prediction (knots-by-cells matvec).

Replaces the reference's ``terra::interpolate(raster, Tps-model)`` full-grid
prediction (V73:726/753) with a fused kernel: cell coordinates are generated
on the fly from the grid's affine transform (never materialised in HBM),
squared distances come from explicit coordinate differences on the VPU
(exact f32 — see _kernel's numerics note), phi(r) = 0.5 r^2 log r^2 runs on
the VPU, and the phi-coefficient contraction is an f32 MXU matmul.  HBM
traffic is exactly the output surface plus the (tiny) knot/coefficient
tables.

Layout discipline (Mosaic rejects shape casts inside kernels, and TPU
T(8,128) tiling pads the trailing axis to 128 lanes):

* the grid is processed as FLAT cell blocks — row/col are recovered from
  the flat index with an integer div/mod — oriented with CELLS ON THE LANE
  AXIS: distances/phi are (knot_chunk, block) and the contraction
  c (R, chunk) @ phi (chunk, block) lands as (R, block);
* each response writes its own (1, cells_pad) flat output, one (1, block)
  lane tile per program — only the 8-sublane tile padding (8x) instead of
  the 128x lane padding of a (cells, R) output, which for a
  single-response model meant a 64M-cell panel "needing" 33 GB and 512 KB
  of padded writes per program, throttling the kernel far below its VPU
  log roofline.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid import GridSpec

__all__ = ["tps_grid_pallas"]

_BLOCK = 2048  # swept on-chip: 2048-cell blocks beat 1024 by ~25-50%
# knot-chunk width: fine chunks (128) cut zero-coefficient padding waste for
# small knot sets (813 pads to 896, not 1024); wide chunks (256) win once the
# knot count amortises the padding (swept: 2048 knots run ~20% faster at 256)
_KNOT_CHUNK = 128
_KNOT_CHUNK_LARGE = 256
_LARGE_KNOTS = 1536


def _chunk_for(n: int) -> int:
    return _KNOT_CHUNK_LARGE if n >= _LARGE_KNOTS else _KNOT_CHUNK


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(geo_ref, ktab_ref, c_ref, d_ref, *out_refs, n_chunks, ncols, chunk):
    """One cell block: phi-matvec against all knot chunks.

    geo:  (8, 1) SMEM  [sx0, sx1, sy0, sy1, xmin, dx, ymax, dy] — the
          coordinate shift/scale AND the grid affine are runtime scalars,
          so ONE compiled program serves every model and every panel of a
          streamed grid (only ncols/shapes are baked in; per-panel
          geometry as constants forced a fresh multi-minute remote
          compile per panel)
    ktab: (n_pad, 8)   scaled knot coordinates, columns [kx, ky, 0...]
    c:    (R, n_pad)   radial coefficients (0 at padding)
    d:    (R, 8)       polynomial coefficients [x, y, 1, 0...] ordering
    out:  R refs of (1, BLOCK) — one surface row block per response

    Numerics: r^2 comes from explicit coordinate differences on the VPU —
    NOT the |p|^2+|k|^2-2pk matmul expansion, which cancels catastrophically
    near r=0 and (worse) runs with bfloat16 inputs at TPU default matmul
    precision; with a near-interpolating spline's large oscillating c this
    produced the round-1 "correction made R^2 worse" regression.  The
    c @ phi contraction is an f32 MXU matmul at HIGHEST precision; its cost
    is dwarfed by the per-(cell, knot) log evaluation.
    """
    sx0, sx1, sy0, sy1 = geo_ref[0, 0], geo_ref[1, 0], geo_ref[2, 0], geo_ref[3, 0]
    xmin, dx, ymax, dy = geo_ref[4, 0], geo_ref[5, 0], geo_ref[6, 0], geo_ref[7, 0]
    i = pl.program_id(0)
    flat = i * _BLOCK + jax.lax.broadcasted_iota(jnp.int32, (1, _BLOCK), 1)
    row = flat // ncols
    col = flat - row * ncols
    gx = xmin + (col.astype(jnp.float32) + 0.5) * dx
    gy = ymax - (row.astype(jnp.float32) + 0.5) * dy
    px = (gx - sx0) / sx1                                  # (1, BLOCK)
    py = (gy - sy0) / sy1
    ones = jnp.ones_like(px)
    zeros = jnp.zeros_like(px)
    # (8, BLOCK): rows [x, y, 1, 0...] for the polynomial term
    a = jnp.concatenate([px, py, ones, zeros, zeros, zeros, zeros, zeros], axis=0)

    n_resp = len(out_refs)
    acc = jnp.zeros((n_resp, _BLOCK), jnp.float32)

    def chunk_body(k, acc):
        kt = ktab_ref[pl.ds(k * chunk, chunk), :]                     # (chunk, 8)
        ddx = kt[:, 0:1] - px                                         # (chunk, BLOCK)
        ddy = kt[:, 1:2] - py
        r2 = ddx * ddx + ddy * ddy
        # r2 * log(max(r2, tiny)) is exact at r2=0 (0 * log(tiny) == 0), so
        # no select is needed; phi's 0.5 factor is pre-folded into c_ref
        # (one fewer VPU op in the log-bound inner loop)
        phi = r2 * jnp.log(jnp.maximum(r2, jnp.finfo(jnp.float32).tiny))
        cc = c_ref[:, pl.ds(k * chunk, chunk)]                        # (R, chunk)
        return acc + jnp.dot(
            cc, phi,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, n_chunks, chunk_body, acc)
    res = acc + jnp.dot(
        d_ref[:], a,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    for r in range(n_resp):
        out_refs[r][:] = res[r : r + 1, :]


@functools.lru_cache(maxsize=64)
def _compiled_grid_eval(nrows: int, ncols: int, n: int, n_resp: int):
    """One jitted program per (grid SHAPE, knot count, response count):
    padding, table construction, and the pallas_call all trace once.  Under
    the axon remote-compile tunnel every *eager* op costs a compile round
    trip, so the whole path must live in a single jit.  The coordinate
    shift/scale AND the grid affine enter through SMEM as runtime data, so
    one compile serves every model and every same-shape panel/tile."""
    chunk = _chunk_for(n)
    n_pad = _round_up(max(n, chunk), chunk)
    n_cells = nrows * ncols
    n_blocks = _round_up(n_cells, _BLOCK) // _BLOCK

    def run(knots, ccols, dcols, shift, scale, affine):
        geo = jnp.concatenate(
            [
                jnp.stack([shift[0], scale[0], shift[1], scale[1]]),
                affine,
            ]
        ).astype(jnp.float32)[:, None]
        knots = knots.astype(jnp.float32)
        ccols = ccols.astype(jnp.float32)
        dcols = dcols.astype(jnp.float32)
        ktab = jnp.pad(
            knots, ((0, n_pad - n), (0, 8 - 2)), constant_values=0.5
        )                                                            # (n_pad, 8)
        ktab = ktab * jnp.asarray([1.0, 1.0] + [0.0] * 6, jnp.float32)[None, :]
        # phi's 0.5 lives here, not in the kernel's inner loop
        ct = jnp.pad(0.5 * ccols.T, ((0, 0), (0, n_pad - n)))        # (R, n_pad)
        # model.d is ordered [1, x, y]; the kernel basis rows are [x, y, 1, 0...]
        dperm = jnp.concatenate([dcols[1:3], dcols[0:1]], axis=0)    # (3, R)
        dt = jnp.pad(dperm.T, ((0, 0), (0, 8 - 3)))                  # (R, 8)

        kernel = functools.partial(
            _kernel, n_chunks=n_pad // chunk, ncols=ncols, chunk=chunk
        )
        outs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((n_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_resp, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_resp, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)
                for _ in range(n_resp)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, n_blocks * _BLOCK), jnp.float32)
                for _ in range(n_resp)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n_blocks * _BLOCK * n_pad * n_resp,
                bytes_accessed=4 * n_blocks * _BLOCK * n_resp,
                transcendentals=n_blocks * _BLOCK * n_pad,
            ),
        )(geo, ktab, ct, dt)
        flat = [o[0, :n_cells] for o in outs]
        return jnp.stack(flat, axis=-1).reshape(nrows, ncols, n_resp)

    return jax.jit(run)


def tps_grid_pallas(model, grid: GridSpec, block_rows: int = 256, dtype=None):
    """Evaluate a TPSModel at every cell of ``grid`` on TPU.

    Returns (H, W) for a single-response model, (H, W, R) for multi-response.
    ``block_rows`` is accepted for API parity with the jnp path; the kernel
    tiles internally at 1024 flat cells.
    """
    del block_rows
    c = model.c
    single = c.ndim == 1
    ccols = c[:, None] if single else c
    dcols = model.d[:, None] if single else model.d
    n, n_resp = ccols.shape
    fn = _compiled_grid_eval(grid.nrows, grid.ncols, n, n_resp)
    affine = jnp.asarray([grid.xmin, grid.dx, grid.ymax, grid.dy], jnp.float32)
    out = fn(model.knots, ccols, dcols, model.shift, model.scale, affine)
    if dtype is not None:
        out = out.astype(dtype)
    return out[..., 0] if single else out
