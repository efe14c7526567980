from .checkpoint import load_layer, mltps_resumable, save_layer
from .geotiff import read_geotiff, write_geotiff_file
from .writers import write_geotiff, write_loadings, write_residuals

__all__ = [
    "load_layer",
    "mltps_resumable",
    "save_layer",
    "read_geotiff",
    "write_geotiff",
    "write_geotiff_file",
    "write_loadings",
    "write_residuals",
]
