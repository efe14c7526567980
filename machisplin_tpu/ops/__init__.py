from .tps import (
    TPSFactor,
    TPSModel,
    gcv_curve,
    tps_factor,
    tps_fit,
    tps_predict,
    tps_predict_grid,
    tps_solve,
)

__all__ = [
    "TPSFactor",
    "TPSModel",
    "gcv_curve",
    "tps_factor",
    "tps_fit",
    "tps_predict",
    "tps_predict_grid",
    "tps_solve",
]
