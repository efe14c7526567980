"""Seam feathering: linear crossfade of overlapping tile rasters.

Reference semantics (mltps part 4, V73:756-896; tiles.merge, V73:1392-1548):
for each adjacent tile pair, crop both to their overlap strip, build linear
1->0 / 0->1 ramps across the strip from cell-center coordinates (x for
vertical seams between horizontal neighbours, y for horizontal seams), blend
as a weighted sum, then mosaic all feathered strips (mean) and lay them over
the plain tile mosaic (mean) with 'first' precedence.

Implemented here as pure raster algebra on the grid substrate; the blend is a
single fused elementwise expression per strip, so XLA maps it straight onto
the VPU, and strips are independent → trivially shardable across devices.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from ..grid import GridSpec, Raster, crop, mosaic

__all__ = ["crossfade", "feather_blend"]


def _intersection(a: GridSpec, b: GridSpec):
    xmin = max(a.xmin, b.xmin)
    xmax = min(a.xmax, b.xmax)
    ymin = max(a.ymin, b.ymin)
    ymax = min(a.ymax, b.ymax)
    if xmax - xmin <= a.dx / 2 or ymax - ymin <= a.dy / 2:
        return None
    return (xmin, xmax, ymin, ymax)


def crossfade(r1: Raster, r2: Raster, axis: str) -> Raster | None:
    """Linear blend of two overlapping rasters over their overlap strip.

    axis='x': ramp along longitude (vertical seam, V73:787-798);
    axis='y': ramp along latitude (horizontal seam, V73:855-865).
    r1 gets weight 1 at the strip edge nearest its own interior (the ramp is
    1->0 left-to-right / top-to-bottom exactly as the reference builds stD1).
    Returns None when the tiles do not overlap.
    """
    ext = _intersection(r1.grid, r2.grid)
    if ext is None:
        return None
    b1 = crop(r1, ext)
    b2 = crop(r2, ext)
    g = b1.grid
    dtype = b1.data.dtype
    if axis == "x":
        coord = g.x_coords(dtype)[None, :]
    elif axis == "y":
        # the reference ramps on yFromCell values, which DECREASE with row
        # index; stD1 = 1 - (y - ymin)/dy ramps 1 at the bottom row... and its
        # vertical-pass twin ramps 1 at the left column.  Keep the exact form.
        coord = g.y_coords(dtype)[:, None]
    else:
        raise ValueError(axis)
    cmin = jnp.min(coord)
    cmax = jnp.max(coord)
    t = (coord - cmin) / jnp.maximum(cmax - cmin, 1e-30)
    w1 = 1.0 - t
    blended = b1.data * w1 + b2.data * t
    return Raster(blended, g, r1.names)


def feather_blend(
    tiles: Sequence[Raster], n_rows: int, n_cols: int, target: GridSpec
) -> Raster:
    """Feathered mosaic of a row-major (bottom-up) grid of overlapping tiles.

    Mirrors mltps part 4 / tiles.merge: vertical seams first (columns h,h+1),
    then horizontal seams (rows j,j+1); feathered strips mosaic with 'mean'
    and take precedence over the mean tile mosaic (V73:880-895).
    """
    if len(tiles) != n_rows * n_cols:
        raise ValueError("tile count does not match layout")
    if len(tiles) == 1:
        return mosaic(tiles, target, fun="mean")
    strips = []
    for j in range(n_rows):
        for h in range(n_cols - 1):
            v = j * n_cols + h
            # left tile weighted 1 at the strip's left edge, fading rightward
            s = crossfade(tiles[v], tiles[v + 1], "x")
            if s is not None:
                strips.append(s)
    for j in range(n_rows - 1):
        for h in range(n_cols):
            v = j * n_cols + h
            # tiles are ordered bottom-up: v + n_cols sits ABOVE v; the lower
            # tile keeps weight 1 at the strip's bottom edge (stD1, V73:857)
            s = crossfade(tiles[v], tiles[v + n_cols], "y")
            if s is not None:
                strips.append(s)
    base = mosaic(tiles, target, fun="mean")
    if not strips:
        return base
    blended = mosaic(strips, target, fun="mean")
    out = jnp.where(jnp.isfinite(blended.data), blended.data, base.data)
    return Raster(out, target, base.names)
