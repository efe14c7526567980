"""Bundled datasets — the reference's ``data(sampling)`` fixture.

``load_sampling()`` returns the 813-station table (long, lat, bio_1 annual
mean temperature, bio_12 annual precipitation; northern Peru) that drives
every example in the reference (data-raw/sampling.csv, R/data.R:7).
``example_grid()`` returns the bundled covariate rasters' grid geometry
(inst/extdata/alt.tfw: 3264 x 2476 cells at 0.0008333333 deg); the actual
GeoTIFF payloads are not redistributable here, so ``synthetic_covariates``
builds a plausible alt/slope/TWI stack on that geometry for examples/tests.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["load_sampling", "load_example_dat", "example_grid", "synthetic_covariates"]

_HERE = os.path.dirname(os.path.abspath(__file__))


def load_sampling(source: str = "csv") -> np.ndarray:
    """Structured array with fields long, lat, bio_1, bio_12 (813 rows).

    ``source="rdata"`` decodes the bundled R serialization
    (data/sampling.RData, the object ``data(sampling)`` loads) through the
    native reader in io/rdata.py instead of the CSV twin — the two agree
    exactly (tested)."""
    if source == "rdata":
        from ..io.rdata import read_rdata

        return read_rdata(os.path.join(_HERE, "sampling.RData"))["sampling"]
    return np.genfromtxt(os.path.join(_HERE, "sampling.csv"), delimiter=",", names=True)


def load_example_dat() -> np.ndarray:
    """The reference's second bundled fixture, ``data(example.dat)``
    (/root/reference/data/example.dat.Rdata; documented in R/data.R:20-38) —
    the same 813-station table as ``sampling`` under the name the README's
    Example 1 uses.  Decoded natively (io/rdata.py); no R runtime needed."""
    from ..io.rdata import read_rdata

    return read_rdata(os.path.join(_HERE, "example.dat.Rdata"))["example.dat"]


def example_grid(downsample: int = 1):
    from ..grid import GridSpec

    d = 0.0008333333 * downsample
    return GridSpec(
        nrows=2476 // downsample, ncols=3264 // downsample,
        xmin=-77.7435765934, ymax=-5.8094167820, dx=d, dy=d,
    )


def synthetic_covariates(downsample: int = 8, seed: int = 0):
    """alt/slope/TWI-like stack on the bundled grid geometry (the real .tif
    payloads are stripped from the mounted reference)."""
    import jax.numpy as jnp

    from ..grid import Raster

    g = example_grid(downsample)
    rng = np.random.default_rng(seed)
    xs = np.asarray(g.x_coords(jnp.float32))[None, :]
    ys = np.asarray(g.y_coords(jnp.float32))[:, None]
    # Andes-like ridge running NW-SE with valley dissection
    ridge = 3800 * np.exp(-((xs + 77.3 + 0.35 * (ys + 6.8)) ** 2) / 0.18)
    valleys = 400 * np.sin(40 * xs) * np.cos(35 * ys)
    alt = 300 + ridge + valleys + 30 * rng.standard_normal(g.shape).astype(np.float32)
    alt = alt.astype(np.float32)
    gy, gx = np.gradient(alt)
    slope = np.sqrt(gx**2 + gy**2).astype(np.float32)
    twi = (10 - 2.5 * np.log1p(slope) + rng.normal(0, 0.5, g.shape)).astype(np.float32)
    return Raster(jnp.asarray(np.stack([alt, slope, twi])), g, ("alt", "slope", "TWI"))
