from pinnfc_tpu.uq.identifiability import (
    GroupIdentifiability,
    gauss_newton_ci,
    lambda_identifiability,
)
from pinnfc_tpu.uq.mc_dropout import MCSamples, mc_dropout_samples, mc_dropout_samples_loop

__all__ = [
    "GroupIdentifiability",
    "MCSamples",
    "gauss_newton_ci",
    "lambda_identifiability",
    "mc_dropout_samples",
    "mc_dropout_samples_loop",
]
