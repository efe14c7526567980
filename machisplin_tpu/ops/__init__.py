from .host_tps import tps_fit_host
from .nystrom import nystrom_tps_fit, select_landmarks
from .tps import (
    TPSFactor,
    TPSModel,
    gcv_curve,
    tps_factor,
    tps_fit,
    tps_fit_auto,
    tps_predict,
    tps_predict_grid,
    tps_solve,
)

__all__ = [
    "tps_fit_host",
    "nystrom_tps_fit",
    "select_landmarks",
    "TPSFactor",
    "TPSModel",
    "gcv_curve",
    "tps_factor",
    "tps_fit",
    "tps_fit_auto",
    "tps_predict",
    "tps_predict_grid",
    "tps_solve",
]
