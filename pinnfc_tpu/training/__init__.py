from pinnfc_tpu.training.stages import (
    StageResult,
    TrainLog,
    train_dnn_stage,
    train_lambda_v_stage,
    train_residual_stage,
    run_schedule,
)

__all__ = [
    "StageResult",
    "TrainLog",
    "train_dnn_stage",
    "train_lambda_v_stage",
    "train_residual_stage",
    "run_schedule",
]
