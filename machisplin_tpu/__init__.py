"""machisplin_tpu — TPU-native spatial interpolation / statistical downscaling.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the R
package MACHISPLIN (jasonleebrown/machisplin): an ensemble of six regression
algorithms cross-validated and optimally weighted, a thin-plate-smoothing-
spline correction of the ensemble's residual surface, and an overlapping-tile
/ feathered-mosaic pipeline for grids far larger than device memory.

Public API (mirrors the reference's seven exported functions, NAMESPACE:3-9):

    mltps                 — machisplin.mltps equivalent (pipeline/mltps.py)
    write_geotiff         — machisplin.write.geotiff  (io/writers.py)
    write_residuals       — machisplin.write.residuals
    write_loadings        — machisplin.write.loadings
    tiles_create/id/merge — machisplin.tiles.*        (pipeline/tiles.py)

plus the TPU-first layers underneath: grid substrate (grid.py), TPS solver
(ops/tps.py), model zoo (models/), ensemble CV + weighting (ensemble/), and
device-mesh sharding (parallel/).
"""

from .grid import GridSpec, Raster, WGS84, crop, extend, extract, lonlat_rasters, mosaic, resample_near, stack
from .io.geotiff import read_geotiff, write_geotiff_file
from .io.checkpoint import load_layer, mltps_resumable, save_layer
from .io.writers import write_geotiff, write_loadings, write_residuals
from .pipeline.mltps import LayerResult, MLTPSConfig, mltps
from .pipeline.tiles import tiles_create, tiles_id, tiles_merge

__version__ = "0.1.0"

__all__ = [
    "GridSpec",
    "LayerResult",
    "MLTPSConfig",
    "Raster",
    "WGS84",
    "crop",
    "extend",
    "extract",
    "load_layer",
    "lonlat_rasters",
    "mltps",
    "mltps_resumable",
    "mosaic",
    "read_geotiff",
    "resample_near",
    "save_layer",
    "stack",
    "tiles_create",
    "tiles_id",
    "tiles_merge",
    "write_geotiff",
    "write_geotiff_file",
    "write_loadings",
    "write_residuals",
    "__version__",
]
