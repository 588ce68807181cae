from pinnfc_tpu.uq.identifiability import (
    GroupIdentifiability,
    gauss_newton_ci,
    lambda_identifiability,
)
from pinnfc_tpu.uq.saliency import (
    SaliencyReport,
    class_mean_saliency,
    coarse_class_saliency,
    input_saliency,
)
from pinnfc_tpu.uq.mc_dropout import MCSamples, mc_dropout_samples, mc_dropout_samples_loop

__all__ = [
    "GroupIdentifiability",
    "SaliencyReport",
    "class_mean_saliency",
    "coarse_class_saliency",
    "input_saliency",
    "MCSamples",
    "gauss_newton_ci",
    "lambda_identifiability",
    "mc_dropout_samples",
    "mc_dropout_samples_loop",
]
