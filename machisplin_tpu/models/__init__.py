from . import base, brt, deviance, gam, gbm_step, mars, nn, rf, svm, trees
from .base import ALGORITHM_LETTERS, LETTER_ORDER, LETTER_TO_NAME

__all__ = [
    "ALGORITHM_LETTERS",
    "LETTER_ORDER",
    "LETTER_TO_NAME",
    "base",
    "brt",
    "deviance",
    "gam",
    "gbm_step",
    "mars",
    "nn",
    "rf",
    "svm",
    "trees",
]
