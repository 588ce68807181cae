from pinnfc_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
from pinnfc_tpu.parallel.data_parallel import (
    DPTrainState,
    full_train_step,
    init_dp_state,
    make_dp_optimizers,
)
from pinnfc_tpu.parallel.diagnosis import (
    gmm_fit_dp,
    logreg_fit_dp,
)
from pinnfc_tpu.parallel.ensemble import (
    ensemble_predict,
    init_ensemble,
    mc_dropout_sharded,
    train_dnn_ensemble,
    train_dnn_ensemble_2d,
    train_pinn_ensemble,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "pad_to_multiple",
    "replicate",
    "replicated",
    "shard_batch",
    "DPTrainState",
    "full_train_step",
    "init_dp_state",
    "make_dp_optimizers",
    "gmm_fit_dp",
    "logreg_fit_dp",
    "ensemble_predict",
    "init_ensemble",
    "mc_dropout_sharded",
    "train_dnn_ensemble",
    "train_dnn_ensemble_2d",
    "train_pinn_ensemble",
]
