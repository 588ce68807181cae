from pinnfc_tpu.models.mlp import (
    MLPParams,
    init_mlp,
    mlp_forward,
    aleatoric_loss,
)
from pinnfc_tpu.models.pinn import (
    PinnParams,
    init_pinn,
    LAMBDA_INIT,
    LAMBDA_BOUNDS,
)

__all__ = [
    "MLPParams",
    "init_mlp",
    "mlp_forward",
    "aleatoric_loss",
    "PinnParams",
    "init_pinn",
    "LAMBDA_INIT",
    "LAMBDA_BOUNDS",
]
