"""Raster/grid substrate: geo-referenced grids as JAX arrays + affine metadata.

TPU-native replacement for the terra (GDAL) raster operations the reference uses
(reference call sites: V73:123-164 stack assembly / LAT-LONG rasters, V73:145
point extraction, V73:699/718-719 crop/extend, V73:739-747 mosaic, V73:781
nearest resample; V73 = /root/reference/R/ensemble.machine.learning.thin.plate.splines.V73.R).

Design: grid *metadata* (`GridSpec`) is static Python held out of jit; grid
*values* are jnp arrays shaped (H, W) (or (C, H, W) for stacks).  All value ops
are pure functions so they fuse under jit and batch under vmap.  Coordinates
are cell centers; the grid is north-up (row 0 = ymax edge), matching GeoTIFF
and terra conventions.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "GridSpec",
    "Raster",
    "crop",
    "extend",
    "extract",
    "lonlat_rasters",
    "mosaic",
    "resample_near",
]

_EPS = 1e-9

WGS84 = "+proj=longlat +datum=WGS84 +ellps=WGS84"


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Affine metadata of a north-up rectilinear grid.

    ``xmin``/``ymax`` are *edge* coordinates of the top-left corner (like a
    GeoTIFF tiepoint), ``dx``/``dy`` positive cell sizes.  Cell centers are at
    ``xmin + (col + 0.5) * dx`` and ``ymax - (row + 0.5) * dy``.
    """

    nrows: int
    ncols: int
    xmin: float
    ymax: float
    dx: float
    dy: float
    crs: str = WGS84

    # -- derived ---------------------------------------------------------
    @property
    def xmax(self) -> float:
        return self.xmin + self.ncols * self.dx

    @property
    def ymin(self) -> float:
        return self.ymax - self.nrows * self.dy

    @property
    def extent(self) -> tuple[float, float, float, float]:
        """(xmin, xmax, ymin, ymax) — the terra ``ext()`` ordering."""
        return (self.xmin, self.xmax, self.ymin, self.ymax)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    @property
    def ncell(self) -> int:
        return self.nrows * self.ncols

    # -- coordinate math -------------------------------------------------
    def x_coords(self, dtype=jnp.float32) -> jax.Array:
        """Cell-center x coordinate per column, shape (ncols,)."""
        return self.xmin + (jnp.arange(self.ncols, dtype=dtype) + 0.5) * jnp.asarray(
            self.dx, dtype
        )

    def y_coords(self, dtype=jnp.float32) -> jax.Array:
        """Cell-center y coordinate per row, shape (nrows,)."""
        return self.ymax - (jnp.arange(self.nrows, dtype=dtype) + 0.5) * jnp.asarray(
            self.dy, dtype
        )

    def cell_centers(self, dtype=jnp.float32) -> tuple[jax.Array, jax.Array]:
        """Broadcastable (x[1, W], y[H, 1]) center coordinates."""
        return self.x_coords(dtype)[None, :], self.y_coords(dtype)[:, None]

    def rowcol_from_xy(self, x, y):
        """Containing cell of points; may be out of range (caller clips/masks)."""
        col = jnp.floor((jnp.asarray(x) - self.xmin) / self.dx).astype(jnp.int32)
        row = jnp.floor((self.ymax - jnp.asarray(y)) / self.dy).astype(jnp.int32)
        return row, col

    # -- window math (host side, static) ---------------------------------
    def window_from_extent(
        self, ext: tuple[float, float, float, float], clip: bool = True
    ) -> tuple[int, int, int, int]:
        """(row0, row1, col0, col1) half-open window whose cell edges are the
        nearest grid lines to ``ext`` (terra ``crop(..., snap='near')``)."""
        exmin, exmax, eymin, eymax = ext
        col0 = int(round((exmin - self.xmin) / self.dx))
        col1 = int(round((exmax - self.xmin) / self.dx))
        row0 = int(round((self.ymax - eymax) / self.dy))
        row1 = int(round((self.ymax - eymin) / self.dy))
        if clip:
            col0, col1 = max(col0, 0), min(col1, self.ncols)
            row0, row1 = max(row0, 0), min(row1, self.nrows)
        return row0, row1, col0, col1

    def subgrid(self, row0: int, row1: int, col0: int, col1: int) -> "GridSpec":
        return GridSpec(
            nrows=row1 - row0,
            ncols=col1 - col0,
            xmin=self.xmin + col0 * self.dx,
            ymax=self.ymax - row0 * self.dy,
            dx=self.dx,
            dy=self.dy,
            crs=self.crs,
        )

    def aligned_with(self, other: "GridSpec") -> bool:
        """True if self's cell lattice is a sub-lattice of other's."""
        if not (
            math.isclose(self.dx, other.dx, rel_tol=1e-9)
            and math.isclose(self.dy, other.dy, rel_tol=1e-9)
        ):
            return False
        fx = (self.xmin - other.xmin) / other.dx
        fy = (other.ymax - self.ymax) / other.dy
        return abs(fx - round(fx)) < 1e-6 and abs(fy - round(fy)) < 1e-6

    def offsets_in(self, other: "GridSpec") -> tuple[int, int]:
        """(row_off, col_off) of self's top-left cell inside other."""
        col = int(round((self.xmin - other.xmin) / other.dx))
        row = int(round((other.ymax - self.ymax) / other.dy))
        return row, col


@jax.tree_util.register_pytree_node_class
class Raster:
    """A (possibly multi-band) geo-referenced grid: jnp values + GridSpec.

    ``data`` is (H, W) for a single band or (C, H, W) for a stack.  Registered
    as a pytree so Rasters pass through jit/vmap; the GridSpec and names ride
    in the aux data (static).
    """

    def __init__(self, data, grid: GridSpec, names: tuple[str, ...] | None = None):
        data = jnp.asarray(data)
        if data.ndim not in (2, 3):
            raise ValueError(f"Raster data must be 2-D or 3-D, got {data.shape}")
        if data.shape[-2:] != grid.shape:
            raise ValueError(
                f"data shape {data.shape[-2:]} != grid shape {grid.shape}"
            )
        self.data = data
        self.grid = grid
        if names is None:
            names = tuple(
                f"band_{i}" for i in range(1 if data.ndim == 2 else data.shape[0])
            )
        self.names = tuple(names)

    @classmethod
    def host(cls, data, grid: GridSpec, names: tuple[str, ...] | None = None) -> "Raster":
        """Host-backed raster: keeps ``data`` as the numpy array it was given
        (no device transfer).  Used for rasters straight off disk — this
        jax build's CPU host->device copy degrades nonlinearly past 2^31
        elements (~95 s for a 4 GB array), so BigTIFF-scale reads must stay
        on the host; jnp ops convert lazily, block by block.

        READ-ONLY contract: ``data`` may be a zero-copy view over a
        memory-mapped file (io/geotiff.read_geotiff's mmap fast path when
        the on-disk dtype is already float32 and no nodata substitution is
        needed); in-place numpy mutation of ``raster.data`` then raises
        ``ValueError: assignment destination is read-only``.  Copy first
        (``np.array(raster.data)``) if you must mutate; the mapping itself
        is released when the array is garbage-collected."""
        arr = np.asarray(data)
        obj = cls.__new__(cls)
        if arr.ndim not in (2, 3):
            raise ValueError(f"Raster data must be 2-D or 3-D, got {arr.shape}")
        if arr.shape[-2:] != grid.shape:
            raise ValueError(f"data shape {arr.shape[-2:]} != grid shape {grid.shape}")
        obj.data = arr
        obj.grid = grid
        obj.names = tuple(
            names
            if names is not None
            else (f"band_{i}" for i in range(1 if arr.ndim == 2 else arr.shape[0]))
        )
        return obj

    # pytree protocol
    def tree_flatten(self):
        return (self.data,), (self.grid, self.names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        grid, names = aux
        obj = cls.__new__(cls)
        obj.data = children[0]
        obj.grid = grid
        obj.names = names
        return obj

    # conveniences
    @property
    def nbands(self) -> int:
        return 1 if self.data.ndim == 2 else self.data.shape[0]

    def band(self, i: int) -> "Raster":
        if self.data.ndim == 2:
            if i != 0:
                raise IndexError(i)
            return self
        return Raster(self.data[i], self.grid, (self.names[i],))

    def as_stack(self) -> "Raster":
        if self.data.ndim == 3:
            return self
        return Raster(self.data[None], self.grid, self.names)

    def with_data(self, data) -> "Raster":
        return Raster(data, self.grid, self.names)

    def rename(self, names: Sequence[str]) -> "Raster":
        return Raster(self.data, self.grid, tuple(names))

    def __repr__(self):
        return (
            f"Raster(bands={self.nbands}, shape={self.grid.shape}, "
            f"extent={self.grid.extent}, names={self.names})"
        )


def stack(rasters: Sequence[Raster], names: Sequence[str] | None = None) -> Raster:
    """Concatenate single/multi-band rasters on one grid (terra ``c()``)."""
    g = rasters[0].grid
    arrs, nm = [], []
    for r in rasters:
        if r.grid.shape != g.shape or not r.grid.aligned_with(g):
            raise ValueError("stack: rasters must share one grid")
        arrs.append(r.as_stack().data)
        nm.extend(r.names)
    return Raster(jnp.concatenate(arrs, axis=0), g, tuple(names or nm))


def lonlat_rasters(grid: GridSpec, dtype=jnp.float32) -> Raster:
    """LONG/LAT covariate bands from cell centers.

    Mirrors the reference's construction of LONG/LAT rasters that are appended
    to the covariate stack (V73:127-133).
    """
    x, y = grid.cell_centers(dtype)
    lon = jnp.broadcast_to(x, grid.shape)
    lat = jnp.broadcast_to(y, grid.shape)
    return Raster(jnp.stack([lon, lat]), grid, ("LONG", "LAT"))


def crop(r: Raster, ext: tuple[float, float, float, float]) -> Raster:
    """Crop to the grid window nearest ``ext`` (terra ``crop``, V73:699)."""
    row0, row1, col0, col1 = r.grid.window_from_extent(ext)
    if row1 <= row0 or col1 <= col0:
        raise ValueError(f"crop: extent {ext} does not overlap raster")
    data = r.data[..., row0:row1, col0:col1]
    return Raster(data, r.grid.subgrid(row0, row1, col0, col1), r.names)


def extend(r: Raster, target: GridSpec, fill=jnp.nan) -> Raster:
    """Pad ``r`` with ``fill`` out to ``target`` (terra ``extend``, V73:719)."""
    if not r.grid.aligned_with(target):
        raise ValueError("extend: grids are not aligned")
    row_off, col_off = r.grid.offsets_in(target)
    pad_top = row_off
    pad_bottom = target.nrows - (row_off + r.grid.nrows)
    pad_left = col_off
    pad_right = target.ncols - (col_off + r.grid.ncols)
    if min(pad_top, pad_bottom, pad_left, pad_right) < 0:
        raise ValueError("extend: raster does not fit inside target grid")
    pads = [(0, 0)] * (r.data.ndim - 2) + [(pad_top, pad_bottom), (pad_left, pad_right)]
    data = jnp.pad(r.data, pads, constant_values=fill)
    return Raster(data, target, r.names)


def resample_near(r: Raster, target: GridSpec) -> Raster:
    """Nearest-neighbour resample onto ``target`` (terra ``resample(method=
    'near')``, V73:781)."""
    tx = target.x_coords(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    ty = target.y_coords(tx.dtype)
    col = jnp.clip(
        jnp.floor((tx - r.grid.xmin) / r.grid.dx).astype(jnp.int32), 0, r.grid.ncols - 1
    )
    row = jnp.clip(
        jnp.floor((r.grid.ymax - ty) / r.grid.dy).astype(jnp.int32), 0, r.grid.nrows - 1
    )
    data = r.data[..., row[:, None], col[None, :]]
    return Raster(data, target, r.names)


def mosaic(rasters: Sequence[Raster], target: GridSpec, fun: str = "mean") -> Raster:
    """Mosaic aligned rasters onto ``target``; NaN marks no-data.

    ``fun='mean'`` averages overlapping valid cells (terra ``mosaic(fun='mean')``,
    V73:746); ``fun='first'`` keeps the first raster's value where valid
    (V73:889 overlay of feathered strips onto the tile mosaic).
    """
    nb = rasters[0].nbands
    shape = (nb, target.nrows, target.ncols) if rasters[0].data.ndim == 3 else target.shape
    if fun == "mean":
        acc = jnp.zeros(shape, rasters[0].data.dtype)
        cnt = jnp.zeros(shape, rasters[0].data.dtype)
        for r in rasters:
            e = extend(r, target)
            valid = jnp.isfinite(e.data)
            acc = acc + jnp.where(valid, e.data, 0)
            cnt = cnt + valid.astype(acc.dtype)
        out = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1), jnp.nan)
    elif fun == "first":
        out = jnp.full(shape, jnp.nan, rasters[0].data.dtype)
        for r in rasters:
            e = extend(r, target)
            out = jnp.where(jnp.isfinite(out), out, e.data)
    else:
        raise ValueError(f"mosaic: unknown fun {fun!r}")
    return Raster(out, target, rasters[0].names)


def extract(r: Raster, x, y, fill=jnp.nan) -> jax.Array:
    """Values of the cells containing points (terra ``extract``, V73:145).

    Returns shape (n,) for a single band or (n, C) for a stack; out-of-grid
    points yield ``fill``.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    row, col = r.grid.rowcol_from_xy(x, y)
    inside = (row >= 0) & (row < r.grid.nrows) & (col >= 0) & (col < r.grid.ncols)
    rs = jnp.clip(row, 0, r.grid.nrows - 1)
    cs = jnp.clip(col, 0, r.grid.ncols - 1)
    vals = r.data[..., rs, cs]  # (n,) or (C, n)
    vals = jnp.where(inside, vals, fill)
    if vals.ndim == 2:
        vals = vals.T  # (n, C)
    return vals


def map_blocks(fn, r: Raster, block: tuple[int, int]) -> Raster:
    """Apply ``fn(data_block, subgrid) -> block`` over non-overlapping tiles.

    Host-side loop (static tiling) used for streaming huge grids through HBM.
    """
    out = np.zeros(r.data.shape, np.asarray(r.data[..., :1, :1]).dtype)
    for r0 in range(0, r.grid.nrows, block[0]):
        r1 = min(r0 + block[0], r.grid.nrows)
        for c0 in range(0, r.grid.ncols, block[1]):
            c1 = min(c0 + block[1], r.grid.ncols)
            sub = r.grid.subgrid(r0, r1, c0, c1)
            out[..., r0:r1, c0:c1] = np.asarray(fn(r.data[..., r0:r1, c0:c1], sub))
    return Raster(jnp.asarray(out), r.grid, r.names)
