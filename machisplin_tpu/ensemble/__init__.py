from .cv import CVConfig, residual_matrix, run_cv
from .kfold import fold_masks, kfold
from .weights import (
    WeightResult,
    optimize_weights_aicc,
    ensemble_objective,
    optimize_weights_lbfgsb,
    optimize_weights_sweep,
)

__all__ = [
    "CVConfig",
    "WeightResult",
    "ensemble_objective",
    "fold_masks",
    "kfold",
    "optimize_weights_aicc",
    "optimize_weights_lbfgsb",
    "optimize_weights_sweep",
    "residual_matrix",
    "run_cv",
]
